"""WARC (ISO 28500 / WARC/1.0-1.1) record codec, stdlib-only.

Common Crawl — the canonical 100 TB training-data source — ships as
WARC: a sequence of records, each a header block (``WARC/1.0`` version
line + MIME-style named fields, CRLF-terminated, blank-line ended)
followed by exactly ``Content-Length`` payload octets and a CRLF CRLF
record separator.  Crawl archives gzip EACH RECORD as its own member
(per the spec's annex), so a ``.warc.gz`` is a concatenation of gzip
members — decodable member-by-member without decompressing the whole
file, which is also what makes per-record streaming possible.

This module implements encode/decode of that public format from the
spec; no archive library is involved.  HTTP response records
(``Content-Type: application/http``) carry an HTTP message as payload;
``split_http`` separates status line/headers from the entity body.
"""

from __future__ import annotations

import zlib

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def encode_record(headers: dict[str, str], payload: bytes) -> bytes:
    """One WARC/1.0 record; Content-Length is computed, not caller-set."""
    lines = [b"WARC/1.0"]
    for k, v in headers.items():
        if k.lower() == "content-length":
            continue
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(f"Content-Length: {len(payload)}".encode("ascii"))
    return _CRLF.join(lines) + _SEP + payload + _SEP


def encode_gzip_member(
    headers: dict[str, str], payload: bytes, level: int = 6
) -> bytes:
    """One record as its own gzip member (the crawl-archive convention).

    mtime is pinned to 0 so output bytes are deterministic for a given
    ``level``.  Default level 6 (the gzip CLI default) — Python's
    GzipFile default of 9 costs ~2× the CPU of 6 for ~1 % ratio on
    text, and this encoder IS the write path's hot loop.

    r16: raw zlib.compressobj(wbits=31) replaces the GzipFile wrapper —
    one object construction less per record in the hot loop.  The only
    byte zlib writes differently is the header OS field (0x03 unix vs
    GzipFile's 0xff unknown), patched back so archives stay
    byte-identical with every earlier round (pinned in
    tests/test_warc.py)."""
    co = zlib.compressobj(level, zlib.DEFLATED, 31)
    out = co.compress(encode_record(headers, payload)) + co.flush()
    return out[:9] + b"\xff" + out[10:]


def _ungzip_members(data: bytes):
    """Yield the decompressed bytes of each gzip member in sequence."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        chunk = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        yield chunk
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("warc: gzip member consumed no input")
        pos += consumed


def decode_records(data: bytes):
    """Yield (headers: dict lower-cased keys, payload: bytes) per record.

    Accepts plain WARC bytes or a multi-member ``.warc.gz``."""
    if data[:2] == b"\x1f\x8b":
        for member in _ungzip_members(data):
            yield from _decode_plain(member)
    else:
        yield from _decode_plain(data)


def _decode_plain(data: bytes):
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding / extra CRLFs
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError(f"warc: expected version line at offset {pos}")
        head_end = data.find(_SEP, pos)
        if head_end < 0:
            raise ValueError("warc: unterminated header block")
        headers: dict[str, str] = {}
        lines = data[pos:head_end].split(_CRLF)
        for raw in lines[1:]:
            # continuation lines (obs-fold) append to the previous field
            if raw[:1] in (b" ", b"\t") and headers:
                headers[last] += " " + raw.strip().decode("utf-8", "replace")
                continue
            k, _, v = raw.partition(b":")
            last = k.strip().decode("utf-8", "replace").lower()
            headers[last] = v.strip().decode("utf-8", "replace")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("warc: record missing a valid Content-Length")
        body_start = head_end + len(_SEP)
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("warc: truncated record payload")
        yield headers, payload
        pos = body_start + length


def split_http(payload: bytes) -> tuple[int | None, dict[str, str], bytes]:
    """(status, headers, body) from an application/http response payload.

    Returns (None, {}, payload) when no HTTP message is present."""
    sep = payload.find(_SEP)
    if sep < 0 or not payload[:5] in (b"HTTP/", b"http/"):
        return None, {}, payload
    head = payload[:sep].split(_CRLF)
    parts = head[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, payload
    headers: dict[str, str] = {}
    for raw in head[1:]:
        k, _, v = raw.partition(b":")
        headers[k.strip().decode("utf-8", "replace").lower()] = v.strip().decode(
            "utf-8", "replace"
        )
    return status, headers, payload[sep + len(_SEP) :]
