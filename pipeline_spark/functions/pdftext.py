"""Stdlib PDF text extractor (ISO 32000 subset, zlib only).

pypdf is not installed in this container, so ``pdfextract`` falls back to
this extractor — the same zero-dependency story as the avro/protobuf wire
decoders.  Coverage:

  * body objects located by ``N G obj`` scanning with a consumed-offset
    guard and direct-``/Length`` stream skipping (tolerant of linearized
    and incrementally-updated files; no xref table needed — xref streams
    are simply skipped as data)
  * a real object parser (dicts, arrays, names, numbers, strings,
    references), so page trees and filter parameters are read
    structurally instead of by substring probes
  * stream filters: ``/FlateDecode`` (zlib), ``/LZWDecode`` (PDF MSB
    packing + EarlyChange), ``/ASCIIHexDecode``, ``/ASCII85Decode``,
    ``/RunLengthDecode``, chained in ``/Filter`` array order, with PNG
    predictors 10-15 and TIFF predictor 2 from ``/DecodeParms``
  * **object streams** (``/Type /ObjStm``, PDF 1.5+): compressed object
    containers are decoded and their contained objects (page dicts,
    resources) joined into the object table — the modern layout pdftk /
    Ghostscript / Chrome print-to-PDF emit
  * **encrypted PDFs** (standard security handler, empty user password —
    the ubiquitous "owner-locked" case): RC4 (V1/V2, R2-R4) and
    AES-128-CBC (V4 /AESV2) per-object keys, AES-256 (V5, R5/R6) with
    the ISO 32000-2 2.B iterated hash; AES primitives from
    ``functions/purecrypto`` (FIPS-197 vector-pinned)
  * text operators inside BT…ET: Tj, ', ", and TJ arrays; Td/TD/T*
    start new lines; literal () strings with escapes and octal, and
    <hex> strings (UTF-16BE when BOM'd, else Latin-1)

Out of scope (raise/skip gracefully, the module dead-letters):
password-protected files (non-empty user password), CID/Type0 fonts
with custom CMaps, JBIG2/DCT image-only pages.  Real layout-aware
extraction remains pypdf's job when it is installed; this keeps the
common path running without it.  Reference analogue:
PDFExtractTransform.java (PDFBox).
"""

from __future__ import annotations

import base64
import hashlib
import re
import struct
import zlib

from pipeline_spark.functions.purecrypto import (
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    rc4,
)


class PdfError(ValueError):
    pass


# ---------------------------------------------------------------------------
# object parser
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"


def _skip_ws(buf: bytes, i: int) -> int:
    n = len(buf)
    while i < n:
        c = buf[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to end of line
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            break
    return i


_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R(?![A-Za-z0-9])")
_NUM_TOKEN_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")


def _parse_value(buf: bytes, i: int):
    """Parse one PDF object value at buf[i]; returns (value, next_i).

    Strings come back as bytes (callers needing text decode explicitly);
    names as str; dicts as {str: value}; refs as _Ref."""
    i = _skip_ws(buf, i)
    if i >= len(buf):
        raise PdfError("unexpected end of data in object")
    c = buf[i]
    if buf.startswith(b"<<", i):
        return _parse_dict(buf, i)
    if c == 0x5B:  # [
        i += 1
        out = []
        while True:
            i = _skip_ws(buf, i)
            if i >= len(buf):
                raise PdfError("unterminated array")
            if buf[i] == 0x5D:  # ]
                return out, i + 1
            v, i = _parse_value(buf, i)
            out.append(v)
    if c == 0x2F:  # /Name
        j = i + 1
        n = len(buf)
        while j < n and buf[j] not in _WS and buf[j] not in _DELIM:
            j += 1
        name = buf[i + 1 : j]
        # #xx hex escapes in names
        if b"#" in name:
            name = re.sub(
                rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), name
            )
        return name.decode("latin-1"), j
    if c == 0x28:  # ( literal string
        return _literal_string_bytes(buf, i)
    if c == 0x3C:  # < hex string
        return _hex_string_bytes(buf, i)
    m = _REF_RE.match(buf, i)
    if m:
        return _Ref(int(m.group(1)), int(m.group(2))), m.end()
    m = _NUM_TOKEN_RE.match(buf, i)
    if m:
        tok = m.group(0)
        return (float(tok) if b"." in tok else int(tok)), m.end()
    for kw, val in ((b"true", True), (b"false", False), (b"null", None)):
        if buf.startswith(kw, i):
            return val, i + len(kw)
    raise PdfError(f"unparseable object at byte {i}")


def _parse_dict(buf: bytes, i: int):
    i += 2  # <<
    d: dict[str, object] = {}
    while True:
        i = _skip_ws(buf, i)
        if buf.startswith(b">>", i):
            return d, i + 2
        if i >= len(buf) or buf[i] != 0x2F:
            raise PdfError("malformed dictionary (expected /name key)")
        key, i = _parse_value(buf, i)
        val, i = _parse_value(buf, i)
        d[key] = val


_ESCAPES = {
    ord("n"): 0x0A, ord("r"): 0x0D, ord("t"): 0x09, ord("b"): 0x08,
    ord("f"): 0x0C, ord("("): 0x28, ord(")"): 0x29, ord("\\"): 0x5C,
}


def _literal_string_bytes(buf: bytes, i: int) -> tuple[bytes, int]:
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                v = 0
                k = 0
                while i < n and k < 3 and 0x30 <= buf[i] <= 0x37:
                    v = v * 8 + (buf[i] - 0x30)
                    i += 1
                    k += 1
                out.append(v & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _hex_string_bytes(buf: bytes, i: int) -> tuple[bytes, int]:
    end = buf.find(b">", i)
    if end < 0:
        end = len(buf)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", buf[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")), end + 1
    except ValueError:
        return b"", end + 1


def _to_text(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")


# ---------------------------------------------------------------------------
# stream filters
# ---------------------------------------------------------------------------


def _png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    n = len(data)
    while i + 1 <= n:
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        i += 1 + rowlen
        if ft == 1:  # Sub
            for x in range(bpp, len(row)):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            for x in range(len(row)):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(len(row)):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        elif ft != 0:
            raise PdfError(f"bad PNG predictor filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def _apply_predictor(data: bytes, parms: dict) -> bytes:
    pred = parms.get("Predictor", 1)
    if not isinstance(pred, int) or pred <= 1:
        return data
    colors = int(parms.get("Colors", 1))
    bpc = int(parms.get("BitsPerComponent", 8))
    columns = int(parms.get("Columns", 1))
    if pred == 2:  # TIFF horizontal differencing (8-bit components only)
        if bpc != 8:
            raise PdfError("TIFF predictor with BitsPerComponent != 8")
        stride = colors
        rowlen = columns * colors
        out = bytearray(data)
        for r0 in range(0, len(out) - rowlen + 1, rowlen):
            for x in range(stride, rowlen):
                out[r0 + x] = (out[r0 + x] + out[r0 + x - stride]) & 0xFF
        return bytes(out)
    if 10 <= pred <= 15:
        return _png_predictor(data, colors, bpc, columns)
    raise PdfError(f"unsupported predictor {pred}")


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode: MSB-first bit packing, 9-bit start, 256=Clear 257=EOD."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == 256:  # Clear
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PdfError("corrupt LZW stream")
            out += entry
            prev = entry
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:
            break
        if ln < 128:
            out += data[i : i + ln + 1]
            i += ln + 1
        else:
            if i < n:
                out += bytes([data[i]]) * (257 - ln)
                i += 1
    return bytes(out)


def _decode_stream(raw: bytes, sdict: dict) -> bytes:
    filters = sdict.get("Filter")
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = sdict.get("DecodeParms") or sdict.get("DP")
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = raw
    for filt, pm in zip(filters, parms):
        pm = pm if isinstance(pm, dict) else {}
        if filt == "FlateDecode":
            try:
                data = zlib.decompress(data)
            except zlib.error as exc:
                raise PdfError(f"bad FlateDecode stream: {exc}") from None
            data = _apply_predictor(data, pm)
        elif filt == "LZWDecode":
            data = _lzw_decode(data, int(pm.get("EarlyChange", 1)))
            data = _apply_predictor(data, pm)
        elif filt == "ASCIIHexDecode":
            hx = re.sub(rb"[^0-9A-Fa-f>]", b"", data)
            hx = hx.split(b">", 1)[0]
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("ascii"))
        elif filt == "ASCII85Decode":
            body = re.sub(rb"\s", b"", data)
            body = body.split(b"~>", 1)[0]
            try:
                data = base64.a85decode(b"<~" + body + b"~>", adobe=True)
            except ValueError as exc:
                raise PdfError(f"bad ASCII85 stream: {exc}") from None
        elif filt == "RunLengthDecode":
            data = _run_length_decode(data)
        elif filt == "Crypt":
            # /Crypt filter with /Identity means "already handled"; named
            # crypt filters would need the document decryptor (applied
            # before filters by the caller), so Identity is the only form
            # reaching here
            continue
        else:
            raise PdfError(f"unsupported stream filter /{filt}")
    return data


# ---------------------------------------------------------------------------
# standard security handler (ISO 32000 §7.6, empty user password)
# ---------------------------------------------------------------------------

_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 algorithm 2.B (R6 iterated password hash)."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


class _StdDecryptor:
    """Standard-security decryption with the empty user password."""

    def __init__(self, enc: dict, file_id: bytes):
        filt = enc.get("Filter")
        if filt not in (None, "Standard"):
            raise PdfError(f"unsupported security handler /{filt}")
        self.v = int(enc.get("V", 0))
        self.r = int(enc.get("R", 2))
        o = enc.get("O")
        u = enc.get("U")
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfError("encrypted PDF missing /O and /U entries")
        p = int(enc.get("P", -1)) & 0xFFFFFFFF
        self.aes = False

        if self.v in (1, 2, 4):
            length = int(enc.get("Length", 40)) // 8
            if self.v == 1:
                length = 5
            if self.v == 4:
                # crypt-filter indirection: resolve the filter StmF names
                cf = enc.get("CF", {})
                stmf = enc.get("StmF", "Identity")
                cfm = "Identity"
                if stmf != "Identity" and isinstance(cf, dict):
                    cfd = cf.get(stmf, {})
                    cfm = cfd.get("CFM", "Identity") if isinstance(cfd, dict) else "Identity"
                    if isinstance(cfd, dict) and "Length" in cfd:
                        # /CF lengths are spec'd in bytes but some writers
                        # emit bits; >16 can only mean bits
                        cl = int(cfd["Length"])
                        length = cl // 8 if cl > 16 else cl
                if cfm == "AESV2":
                    self.aes = True
                    length = 16
                elif cfm == "V2":
                    pass
                elif cfm == "Identity":
                    self.key = b""
                    self.identity = True
                    return
                else:
                    raise PdfError(f"unsupported crypt filter /{cfm}")
            self.identity = False
            h = hashlib.md5()
            h.update(_PAD)
            h.update(o[:32])
            h.update(struct.pack("<I", p))
            h.update(file_id)
            if self.r >= 4 and enc.get("EncryptMetadata") is False:
                h.update(b"\xff\xff\xff\xff")
            key = h.digest()
            if self.r >= 3:
                for _ in range(50):
                    key = hashlib.md5(key[:length]).digest()
            self.key = key[:length]
            # verify the empty user password against /U (algorithm 6)
            if self.r == 2:
                expect = rc4(self.key, _PAD)
                ok = expect == u[:32]
            else:
                h2 = hashlib.md5(_PAD + file_id).digest()
                step = rc4(self.key, h2)
                for i in range(1, 20):
                    step = rc4(bytes(b ^ i for b in self.key), step)
                ok = step == u[:16]
            if not ok:
                raise PdfError("password-protected PDF (user password required)")
        elif self.v == 5:
            self.identity = False
            self.aes = True
            if len(u) < 48:
                raise PdfError("malformed /U for V5 encryption")
            vsalt, ksalt = u[32:40], u[40:48]
            if self.r == 6:
                if _hash_2b(b"", vsalt) != u[:32]:
                    raise PdfError("password-protected PDF (user password required)")
                ikey = _hash_2b(b"", ksalt)
            elif self.r == 5:
                if hashlib.sha256(vsalt).digest() != u[:32]:
                    raise PdfError("password-protected PDF (user password required)")
                ikey = hashlib.sha256(ksalt).digest()
            else:
                raise PdfError(f"unsupported revision {self.r} for V5")
            ue = enc.get("UE")
            if not isinstance(ue, bytes) or len(ue) < 32:
                raise PdfError("encrypted PDF missing /UE")
            self.key = aes_cbc_decrypt(ikey, bytes(16), ue[:32])
        else:
            raise PdfError(f"unsupported encryption version V={self.v}")

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        if self.identity:
            return data
        if self.v == 5:
            key = self.key  # AES-256: single file key, no per-object step
        else:
            h = hashlib.md5()
            h.update(self.key)
            h.update(struct.pack("<I", num)[:3])
            h.update(struct.pack("<I", gen)[:2])
            if self.aes:
                h.update(b"sAlT")
            key = h.digest()[: min(len(self.key) + 5, 16)]
        if self.aes:
            if len(data) < 16:
                return b""
            iv, body = data[:16], data[16:]
            body = body[: len(body) - len(body) % 16]
            plain = aes_cbc_decrypt(key, iv, body)
            pad = plain[-1] if plain else 0
            if 1 <= pad <= 16:
                plain = plain[:-pad]
            return plain
        return rc4(key, data)


# ---------------------------------------------------------------------------
# document scan
# ---------------------------------------------------------------------------

_OBJHDR_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class _PdfObj:
    __slots__ = ("gen", "value", "raw", "stream_start", "decoded")

    def __init__(self, gen, value, raw=None, stream_start=None):
        self.gen = gen
        self.value = value
        self.raw = raw          # raw (possibly encrypted/compressed) stream
        self.stream_start = stream_start  # set when /Length was indirect
        self.decoded = None


def _scan_objects(data: bytes) -> dict[int, _PdfObj]:
    objs: dict[int, _PdfObj] = {}
    consumed = 0
    for m in _OBJHDR_RE.finditer(data):
        if m.start() < consumed:
            continue  # header bytes inside a previous object's stream
        num, gen = int(m.group(1)), int(m.group(2))
        try:
            value, i = _parse_value(data, m.end())
        except PdfError:
            continue
        raw = None
        stream_start = None
        i = _skip_ws(data, i)
        if data.startswith(b"stream", i):
            i += 6
            if data.startswith(b"\r\n", i):
                i += 2
            elif i < len(data) and data[i : i + 1] in (b"\n", b"\r"):
                i += 1
            length = value.get("Length") if isinstance(value, dict) else None
            if isinstance(length, int) and data.startswith(
                b"endstream", _skip_ws(data, i + length)
            ):
                raw = data[i : i + length]
                i = _skip_ws(data, i + length) + len(b"endstream")
            elif isinstance(length, _Ref):
                stream_start = i  # resolve after the full scan
                end = data.find(b"endstream", i)
                if end < 0:
                    continue
                raw = data[i:end].rstrip(b"\r\n")
                i = end + len(b"endstream")
            else:
                end = data.find(b"endstream", i)
                if end < 0:
                    continue
                raw = data[i:end].rstrip(b"\r\n")
                i = end + len(b"endstream")
        j = data.find(b"endobj", i)
        consumed = (j + 6) if j >= 0 else i
        # later definitions win (incremental updates append to the file)
        objs[num] = _PdfObj(gen, value, raw, stream_start)
    if not objs:
        raise PdfError("no PDF objects found")
    # second pass: re-slice streams whose /Length was an indirect reference
    for obj in objs.values():
        if obj.stream_start is not None and isinstance(obj.value, dict):
            ln = obj.value.get("Length")
            if isinstance(ln, _Ref):
                lo = objs.get(ln.num)
                if lo is not None and isinstance(lo.value, int):
                    obj.raw = data[obj.stream_start : obj.stream_start + lo.value]
    return objs


def _trailer_dicts(data: bytes, objs: dict[int, _PdfObj]):
    """All trailer-level dictionaries: classic ``trailer << … >>`` blocks
    plus xref-STREAM dicts (/Type /XRef carries the trailer entries in
    the 1.5+ layout).  Scanning only these — not the whole byte stream —
    keeps '/Encrypt' bytes inside content streams from being mistaken
    for an encryption declaration."""
    out: list[dict] = []
    for m in re.finditer(rb"trailer\b", data):
        try:
            d, _ = _parse_value(data, m.end())
        except PdfError:
            continue
        if isinstance(d, dict):
            out.append(d)
    for obj in objs.values():
        if isinstance(obj.value, dict) and obj.value.get("Type") == "XRef":
            out.append(obj.value)
    return out


def _find_encryption(data: bytes, objs: dict[int, _PdfObj]):
    enc_ref = None
    file_id = b""
    for d in _trailer_dicts(data, objs):
        enc = d.get("Encrypt")
        if isinstance(enc, _Ref):
            enc_ref = enc.num  # later trailers win (incremental updates)
        ids = d.get("ID")
        if (
            isinstance(ids, list)
            and ids
            and isinstance(ids[0], bytes)
        ):
            file_id = ids[0]
    if enc_ref is None:
        return None
    enc_obj = objs.get(enc_ref)
    if enc_obj is None or not isinstance(enc_obj.value, dict):
        raise PdfError("encrypted PDF with unresolvable /Encrypt entry")
    return _StdDecryptor(enc_obj.value, file_id), enc_ref


def _decoded_stream(obj: _PdfObj, decryptor, num: int) -> bytes | None:
    if obj.raw is None:
        return None
    if obj.decoded is None:
        raw = obj.raw
        sdict = obj.value if isinstance(obj.value, dict) else {}
        # XRef streams are never encrypted (ISO 32000 §7.5.8.2)
        if decryptor is not None and sdict.get("Type") != "XRef":
            raw = decryptor.decrypt(num, obj.gen, raw)
        obj.decoded = _decode_stream(raw, sdict)
    return obj.decoded


def _expand_object_streams(objs: dict[int, _PdfObj], decryptor) -> None:
    for num in list(objs):
        obj = objs[num]
        v = obj.value
        if not (isinstance(v, dict) and v.get("Type") == "ObjStm"):
            continue
        try:
            data = _decoded_stream(obj, decryptor, num)
        except PdfError:
            continue
        if data is None:
            continue
        try:
            n = int(v["N"])
            first = int(v["First"])
        except (KeyError, TypeError, ValueError):
            continue
        header = data[:first].split()
        for k in range(min(n, len(header) // 2)):
            try:
                inner_num = int(header[2 * k])
                off = int(header[2 * k + 1])
                val, _ = _parse_value(data, first + off)
            except (ValueError, PdfError):
                continue
            # a top-level (possibly newer) definition wins over the
            # compressed one; otherwise join the table
            objs.setdefault(inner_num, _PdfObj(0, val))


# ---------------------------------------------------------------------------
# content-stream text walk
# ---------------------------------------------------------------------------


def _content_text(stream: bytes) -> str:
    """Walk the content stream, collecting show-text operator output."""
    parts: list[str] = []
    i = 0
    pending: list[str] = []  # strings seen since the last operator token
    n = len(stream)
    while i < n:
        c = stream[i]
        if c == 0x28:  # (
            raw, i = _literal_string_bytes(stream, i)
            pending.append(raw.decode("latin-1"))
        elif c == 0x3C and not stream.startswith(b"<<", i):  # < hex string
            raw, i = _hex_string_bytes(stream, i)
            pending.append(_to_text(raw))
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


def _content_refs(page: dict) -> list[int]:
    contents = page.get("Contents")
    if isinstance(contents, _Ref):
        return [contents.num]
    if isinstance(contents, list):
        return [r.num for r in contents if isinstance(r, _Ref)]
    return []


def extract_pdf_text(data: bytes) -> tuple[str, int]:
    """(full text, page count) for a classic- or modern-layout PDF."""
    if not data.startswith(b"%PDF"):
        raise PdfError("not a PDF (missing %PDF header)")
    objs = _scan_objects(data)
    found = _find_encryption(data, objs)
    decryptor = found[0] if found else None
    _expand_object_streams(objs, decryptor)
    pages = [
        (num, obj.value)
        for num, obj in sorted(objs.items())
        if isinstance(obj.value, dict) and obj.value.get("Type") == "Page"
    ]
    texts: list[str] = []
    for _, page in pages:
        page_text: list[str] = []
        for ref in _content_refs(page):
            obj = objs.get(ref)
            if obj is None:
                continue
            stream = _decoded_stream(obj, decryptor, ref)
            if stream:
                page_text.append(_content_text(stream))
        texts.append("".join(page_text).strip("\n"))
    return "\n".join(texts), len(pages)
