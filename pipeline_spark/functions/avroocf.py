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
    schema_json, _meta, records = read_ocf_with_meta(data)
    return schema_json, records


def read_ocf_with_meta(
    data: bytes,
) -> tuple[dict, dict[str, bytes], Iterator[dict[str, Any]]]:
    """Like read_ocf but also returns the OCF file-metadata map — Iceberg
    manifests carry the write-time table ``schema`` there (spec:
    Manifests), which schema-evolution reads need."""
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

    return schema_json, meta, records()


def read_ocf_file(path: str) -> tuple[dict, Iterator[dict[str, Any]]]:
    with open(path, "rb") as fh:
        return read_ocf(fh.read())


def read_ocf_file_with_meta(
    path: str,
) -> tuple[dict, dict[str, bytes], Iterator[dict[str, Any]]]:
    with open(path, "rb") as fh:
        return read_ocf_with_meta(fh.read())


# ------------------------------------------------------------- encoder

def _zz(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        out.append(b | (0x80 if u else 0))
        if not u:
            return bytes(out)


def encode_datum(value: Any, schema: Any, reg: dict[str, Any]) -> bytes:
    """Binary-encode one datum per the Avro spec — the write twin of
    avrodec._decode, covering the same type subset."""
    import datetime as dt
    import struct

    if isinstance(schema, str):
        if schema in reg:
            return encode_datum(value, reg[schema], reg)
        t = schema
    elif isinstance(schema, list):  # union: branch index + value
        for idx, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return _zz(idx)
            if value is not None and bt != "null":
                return _zz(idx) + encode_datum(value, branch, reg)
        raise ValueError(f"no union branch for {type(value).__name__} in {schema}")
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            return encode_datum(value, t, reg)

    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        lt = schema.get("logicalType") if isinstance(schema, dict) else None
        if lt in ("timestamp-millis", "timestamp-micros") and isinstance(
            value, dt.datetime
        ):
            epoch = dt.datetime(1970, 1, 1, tzinfo=value.tzinfo)
            micros = round((value - epoch).total_seconds() * 1_000_000)
            return _zz(micros // 1000 if lt == "timestamp-millis" else micros)
        if lt == "date" and isinstance(value, dt.date):
            return _zz((value - dt.date(1970, 1, 1)).days)
        return _zz(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "bytes":
        b = bytes(value)
        return _zz(len(b)) + b
    if t == "string":
        b = str(value).encode("utf-8")
        return _zz(len(b)) + b
    if t == "record":
        return b"".join(
            encode_datum((value or {}).get(f["name"]), f["type"], reg)
            for f in schema["fields"]
        )
    if t == "enum":
        return _zz(schema["symbols"].index(value))
    if t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(b)} != {schema['size']}")
        return b
    if t == "array":
        # explicit None check: numpy arrays reject bool coercion
        items = [] if value is None else list(value)
        if not items:
            return _zz(0)
        body = b"".join(encode_datum(x, schema["items"], reg) for x in items)
        return _zz(len(items)) + body + _zz(0)
    if t == "map":
        entries = {} if value is None else dict(value)
        if not entries:
            return _zz(0)
        body = b""
        for k, v in entries.items():
            kb = str(k).encode("utf-8")
            body += _zz(len(kb)) + kb + encode_datum(v, schema["values"], reg)
        return _zz(len(entries)) + body + _zz(0)
    raise ValueError(f"unsupported avro type {t!r}")


def write_ocf_bytes(
    schema_json: dict,
    records: list[dict],
    codec: str = "deflate",
    extra_meta: dict[str, str] | None = None,
) -> bytes:
    """Serialize records into one OCF blob (single block).

    ``extra_meta`` adds file-metadata entries beyond avro.schema/avro.codec
    (Iceberg manifests carry schema/partition-spec/format-version keys)."""
    schema, reg = parse_schema(schema_json)
    payload = b"".join(encode_datum(r, schema, reg) for r in records)
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    elif codec != "null":
        raise NotImplementedError(f"avro OCF codec '{codec}'")
    sync = bytes(
        (hash((len(records), len(payload), json.dumps(schema_json))) >> s) & 0xFF
        for s in range(0, 128, 8)
    )
    meta_entries = {
        "avro.schema": json.dumps(schema_json).encode(),
        "avro.codec": codec.encode(),
        **{k: v.encode() for k, v in (extra_meta or {}).items()},
    }
    meta = _zz(len(meta_entries))
    for k, v in meta_entries.items():
        kb = k.encode()
        meta += _zz(len(kb)) + kb + _zz(len(v)) + v
    meta += _zz(0)
    return (
        _MAGIC + meta + sync
        + _zz(len(records)) + _zz(len(payload)) + payload + sync
    )


_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "integer": "int", "short": "int", "byte": "int",
    "long": "long",
    "float": "float", "double": "double",
    "string": "string", "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamp_ntz": {"type": "long", "logicalType": "timestamp-micros"},
}


def spark_schema_to_avro(schema, name: str = "row") -> dict:
    """Spark StructType → avro record schema (nullable → [null, T])."""
    from pyspark.sql import types as T

    def conv(dtype, fname):
        if isinstance(dtype, T.StructType):
            return spark_schema_to_avro(dtype, fname)
        if isinstance(dtype, T.ArrayType):
            return {"type": "array", "items": conv(dtype.elementType, fname + "_item")}
        if isinstance(dtype, T.MapType):
            return {"type": "map", "values": conv(dtype.valueType, fname + "_val")}
        if isinstance(dtype, T.DecimalType):
            return "double"  # documented narrowing in the native writer
        mapped = _SPARK_TO_AVRO.get(dtype.typeName())
        if mapped is None:
            raise ValueError(f"avro native writer: unsupported type {dtype}")
        return mapped

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": [
                "null", conv(f.dataType, f.name)
            ] if f.nullable else conv(f.dataType, f.name)}
            for f in schema.fields
        ],
    }
