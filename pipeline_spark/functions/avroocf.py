"""Avro Object Container File (OCF) reader — stdlib + the wire decoder.

The public OCF layout (Avro spec "Object Container Files"): magic
``Obj\\x01``, a file-metadata map (``avro.schema`` JSON, ``avro.codec``),
a 16-byte sync marker, then blocks of ``(row_count, byte_size, payload,
sync)`` with payload optionally deflate-compressed (raw zlib, no header).

Built on functions/avrodec.py's datum decoder, continuing the
zero-dependency fallback family.  Primary consumer: the native Iceberg
metadata path (sources/iceberg_native.py reads manifest lists and
manifests, which Iceberg stores as OCF avro).
"""

from __future__ import annotations

import json
import zlib
from typing import Any, Iterator

from pipeline_spark.functions.avrodec import _Reader, _decode, parse_schema

_MAGIC = b"Obj\x01"


def read_ocf(data: bytes) -> tuple[dict, Iterator[dict[str, Any]]]:
    """Parse OCF bytes → (parsed avro schema json, iterator of records)."""
    if data[:4] != _MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    r = _Reader(data[4:])
    # file metadata: map<bytes> written as blocks
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:  # negative count form: abs(count) then byte size
            n = -n
            r.read_long()
        for _ in range(n):
            klen = r.read_long()
            key = r.read(klen).decode("utf-8")
            vlen = r.read_long()
            meta[key] = r.read(vlen)
    schema_json = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro OCF codec '{codec}' (null/deflate only)")
    sync = r.read(16)
    schema, reg = parse_schema(schema_json)

    def records() -> Iterator[dict[str, Any]]:
        while r.pos < len(r.buf):
            count = r.read_long()
            size = r.read_long()
            payload = r.read(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            br = _Reader(payload)
            for _ in range(count):
                yield _decode(br, schema, reg)
            block_sync = r.read(16)
            if block_sync != sync:
                raise ValueError("avro OCF: sync marker mismatch (corrupt block)")

    return schema_json, records()


def read_ocf_file(path: str) -> tuple[dict, Iterator[dict[str, Any]]]:
    with open(path, "rb") as fh:
        return read_ocf(fh.read())
