"""Minimal stdlib PDF text extractor (ISO 32000 subset, zlib only).

pypdf is not installed in this container, so ``pdfextract`` falls back to
this extractor — the same zero-dependency story as the avro/protobuf wire
decoders.  Supports the classic PDF layout that covers simple generated
documents (reports, invoices, exports):

  * body objects located by ``N G obj … endobj`` scanning (no xref
    required — tolerant of linearized/appended files)
  * content streams: uncompressed or /FlateDecode (zlib)
  * text operators inside BT…ET: Tj, ', ", and TJ arrays; Td/TD/T*
    start new lines; literal () strings with escapes and octal, and
    <hex> strings (UTF-16BE when BOM'd, else Latin-1)

Out of scope (raise/skip gracefully, the module dead-letters): encrypted
PDFs, cross-reference/object streams (compressed object containers),
CID/Type0 fonts with custom CMaps.  Real layout-aware extraction remains
pypdf's job when it is installed; this keeps the common path running
without it.  Reference analogue: PDFExtractTransform.java (PDFBox).
"""

from __future__ import annotations

import re
import zlib


class PdfError(ValueError):
    pass


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n")


def _objects(data: bytes) -> dict[int, bytes]:
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(3)
    if not objs:
        raise PdfError("no PDF objects found")
    return objs


def _stream_data(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    end = body.rfind(b"endstream")
    if end < 0:
        raise PdfError("unterminated stream")
    raw = body[m.end() : end]
    # trailing EOL before endstream is not stream content
    raw = raw.rstrip(b"\r\n")
    head = body[: m.start()]
    if b"/FlateDecode" in head:
        try:
            return zlib.decompress(raw)
        except zlib.error as exc:
            raise PdfError(f"bad FlateDecode stream: {exc}") from None
    if b"/Filter" in head:
        raise PdfError("unsupported stream filter")
    return raw


_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _literal_string(buf: bytes, i: int) -> tuple[str, int]:
    """Parse a ( … ) string starting at buf[i] == '('; returns (text, next)."""
    out: list[str] = []
    depth = 1
    i += 1
    while i < len(buf) and depth:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= len(buf):
                break
            e = buf[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = ""
                while i < len(buf) and len(oct_digits) < 3 and 0x30 <= buf[i] <= 0x37:
                    oct_digits += chr(buf[i])
                    i += 1
                out.append(chr(int(oct_digits, 8)))
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _hex_string(buf: bytes, i: int) -> tuple[str, int]:
    end = buf.find(b">", i)
    if end < 0:
        end = len(buf)
    hx = re.sub(rb"\s", b"", buf[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    try:
        raw = bytes.fromhex(hx.decode("ascii"))
    except ValueError:
        return "", end + 1
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace"), end + 1
    return raw.decode("latin-1"), end + 1


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")


def _content_text(stream: bytes) -> str:
    """Walk the content stream, collecting show-text operator output."""
    parts: list[str] = []
    i = 0
    pending: list[str] = []  # strings seen since the last operator token
    n = len(stream)
    while i < n:
        c = stream[i]
        if c == 0x28:  # (
            s, i = _literal_string(stream, i)
            pending.append(s)
        elif c == 0x3C and not stream.startswith(b"<<", i):  # < hex string
            s, i = _hex_string(stream, i)
            pending.append(s)
        elif c in (0x54, 0x27, 0x22):  # T*, ' , "
            op2 = stream[i : i + 2]
            if op2 in (b"Tj", b"TJ"):
                parts.extend(pending)
                pending = []
                i += 2
            elif op2 in (b"Td", b"TD", b"T*"):
                if parts and not parts[-1].endswith("\n"):
                    parts.append("\n")
                pending = []
                i += 2
            elif c in (0x27, 0x22):  # ' and " show-with-newline ops
                parts.append("\n")
                parts.extend(pending)
                pending = []
                i += 1
            else:
                i += 1
        elif c == 0x45 and stream.startswith(b"ET", i):
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
            pending = []
            i += 2
        else:
            i += 1
    return "".join(parts)


def _content_refs(page_body: bytes) -> list[int]:
    m = re.search(rb"/Contents\s*\[(.*?)\]", page_body, re.S)
    if m:
        return [int(r) for r in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", page_body)
    return [int(m.group(1))] if m else []


def extract_pdf_text(data: bytes) -> tuple[str, int]:
    """(full text, page count) for a classic-layout PDF."""
    if not data.startswith(b"%PDF"):
        raise PdfError("not a PDF (missing %PDF header)")
    if b"/Encrypt" in data[-2048:] or b"/Encrypt" in data[:2048]:
        raise PdfError("encrypted PDF not supported")
    objs = _objects(data)
    pages = [
        body
        for body in objs.values()
        if re.search(rb"/Type\s*/Page\b", body) and b"/Pages" not in body[:200]
    ]
    texts: list[str] = []
    for body in pages:
        page_text: list[str] = []
        for ref in _content_refs(body):
            stream = _stream_data(objs.get(ref, b""))
            if stream:
                page_text.append(_content_text(stream))
        texts.append("".join(page_text).strip("\n"))
    return "\n".join(texts), len(pages)
