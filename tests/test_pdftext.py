"""Stdlib PDF text extractor: hand-built classic-layout PDF fixtures."""

import zlib

import pytest
from pyspark.sql import Row

from pipeline_spark.functions.pdftext import PdfError, extract_pdf_text


def build_pdf(page_streams: list[bytes], compress: bool = False) -> bytes:
    """Assemble a minimal classic-layout PDF: catalog, pages, one content
    stream per page.  Object numbers: 1 catalog, 2 pages, then per page
    (page obj, content obj)."""
    objs: list[bytes] = []
    page_ids = []
    next_id = 3
    for stream in page_streams:
        page_id, content_id = next_id, next_id + 1
        next_id += 2
        page_ids.append(page_id)
        objs.append(
            f"{page_id} 0 obj\n<< /Type /Page /Parent 2 0 R "
            f"/Contents {content_id} 0 R >>\nendobj\n".encode()
        )
        data = zlib.compress(stream) if compress else stream
        filt = b" /Filter /FlateDecode" if compress else b""
        objs.append(
            b"%d 0 obj\n<< /Length %d%s >>\nstream\n" % (content_id, len(data), filt)
            + data
            + b"\nendstream\nendobj\n"
        )
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    header = b"%PDF-1.4\n"
    cat = b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    pages = (
        f"2 0 obj\n<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>\nendobj\n"
    ).encode()
    return header + cat + pages + b"".join(objs) + b"%%EOF\n"


def test_single_page_uncompressed():
    stream = b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET"
    text, n = extract_pdf_text(build_pdf([stream]))
    assert n == 1
    assert text == "Hello World"


def test_flate_multiline_and_escapes():
    stream = (
        b"BT (Line one) Tj 0 -14 Td (paren \\(x\\) and \\\\slash) Tj "
        b"0 -14 Td (octal \\101\\102) Tj ET"
    )
    text, n = extract_pdf_text(build_pdf([stream], compress=True))
    assert n == 1
    lines = text.split("\n")
    assert lines[0] == "Line one"
    assert "paren (x) and \\slash" in lines
    assert "octal AB" in lines


def test_tj_arrays_hex_strings_multipage():
    p1 = b"BT [(Kerned ) -120 (pairs)] TJ ET"
    p2 = b"BT <FEFF00480069> Tj ET"  # UTF-16BE "Hi"
    text, n = extract_pdf_text(build_pdf([p1, p2], compress=True))
    assert n == 2
    assert text.split("\n")[0] == "Kerned pairs"
    assert text.split("\n")[1] == "Hi"


def test_rejects_non_pdf_and_encrypted():
    with pytest.raises(PdfError, match="%PDF"):
        extract_pdf_text(b"GIF89a not a pdf")
    enc = build_pdf([b"BT (x) Tj ET"]) + b"\ntrailer\n<< /Encrypt 9 0 R >>\n"
    with pytest.raises(PdfError, match="ncrypt"):
        extract_pdf_text(enc)


def test_stray_encrypt_bytes_do_not_dead_letter():
    """'/Encrypt' inside page CONTENT (e.g. a PDF about PDF internals)
    must not be mistaken for an encryption declaration."""
    pdf = build_pdf([b"BT (the /Encrypt 9 0 R entry is documented here) Tj ET"])
    text, n = extract_pdf_text(pdf)
    assert n == 1 and "documented here" in text


def test_pdfextract_module_fallback(spark):
    from pipeline_spark.operators.ml import pdfextract_transform
    from pipeline_spark.registry import ModuleContext

    good = build_pdf([b"BT (From Spark) Tj ET"], compress=True)
    df = spark.createDataFrame(
        [Row(doc=1, content=bytearray(good)), Row(doc=2, content=bytearray(b"junk"))]
    )
    out = pdfextract_transform(
        ModuleContext(
            spark=spark,
            name="p",
            params={"field": "content"},
            inputs=[df],
            input_names=["in"],
            side_inputs={},
        )
    )[""]
    rows = {r["doc"]: r for r in out.collect()}
    assert rows[1]["text"] == "From Spark" and rows[1]["page_count"] == 1
    assert rows[2]["text"] is None and rows[2]["page_count"] is None


# ---------------------------------------------------------------------------
# modern-layout fixtures: object streams, filters, encryption
# ---------------------------------------------------------------------------

import hashlib
import struct

from pipeline_spark.functions.pdftext import _hash_2b
from pipeline_spark.functions.purecrypto import aes_cbc_encrypt, rc4


def assemble(objs: dict[int, bytes], trailer: bytes = b"") -> bytes:
    """Concatenate numbered object bodies into a scan-parseable PDF."""
    out = [b"%PDF-1.6\n"]
    for num in sorted(objs):
        out.append(b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n")
    out.append(trailer)
    out.append(b"%%EOF\n")
    return b"".join(out)


def stream_obj(sdict: bytes, data: bytes) -> bytes:
    return sdict + b"\nstream\n" + data + b"\nendstream"


def test_object_stream_layout():
    """Page tree lives inside a /Type /ObjStm container (PDF 1.5+)."""
    content = b"BT (Inside ObjStm) Tj ET"
    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
    }
    parts, header = [], []
    off = 0
    for num, body in inner.items():
        header.append(b"%d %d" % (num, off))
        parts.append(body)
        off += len(body) + 1
    payload = b" ".join(header) + b"\n" + b"\n".join(parts) + b"\n"
    first = len(b" ".join(header)) + 1
    objstm = zlib.compress(payload)
    pdf = assemble(
        {
            4: stream_obj(b"<< /Length %d >>" % len(content), content),
            5: stream_obj(
                b"<< /Type /ObjStm /N 3 /First %d /Length %d /Filter /FlateDecode >>"
                % (first, len(objstm)),
                objstm,
            ),
        }
    )
    text, n = extract_pdf_text(pdf)
    assert n == 1 and text == "Inside ObjStm"


def _page_scaffold(content_body: bytes) -> dict[int, bytes]:
    return {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: content_body,
    }


def _lzw_encode(data: bytes) -> bytes:
    """Literal-only LZW (clear, one code per byte, EOD) — valid per spec
    because the decoder's table grows identically regardless of whether the
    encoder chose longer matches."""
    codes = [256] + list(data) + [257]
    out = bytearray()
    acc = bits = 0
    width = 9
    table_len = 258
    for code in codes:
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8
        if code != 256 and code != 257:
            table_len += 1  # decoder adds an entry per emitted code
            if table_len + 1 >= (1 << width) and width < 12:
                width += 1
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def test_lzw_and_ascii85_filter_chain():
    content = b"BT (Filter chain works) Tj ET"
    lzw = _lzw_encode(content)
    pdf = assemble(
        _page_scaffold(
            stream_obj(
                b"<< /Length %d /Filter /LZWDecode >>" % len(lzw), lzw
            )
        )
    )
    assert extract_pdf_text(pdf)[0] == "Filter chain works"

    import base64 as b64

    # /Filter [/ASCII85Decode /FlateDecode]: a85 undone first, then flate
    body = b64.a85encode(zlib.compress(content)) + b"~>"
    pdf = assemble(
        _page_scaffold(
            stream_obj(
                b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >>"
                % len(body),
                body,
            )
        )
    )
    assert extract_pdf_text(pdf)[0] == "Filter chain works"


def test_asciihex_and_runlength():
    content = b"BT (AAAA hex) Tj ET"
    hx = content.hex().encode() + b">"
    pdf = assemble(
        _page_scaffold(
            stream_obj(b"<< /Length %d /Filter /ASCIIHexDecode >>" % len(hx), hx)
        )
    )
    assert extract_pdf_text(pdf)[0] == "AAAA hex"

    # RunLength: literal run (len-1) + repeat run (257-n copies) + EOD
    rl = bytes([11]) + b"BT (XXXXXXX " + bytes([257 - 4, ord("Y")]) + bytes([9]) + b") Tj ET\x80"
    pdf = assemble(
        _page_scaffold(
            stream_obj(b"<< /Length %d /Filter /RunLengthDecode >>" % len(rl), rl)
        )
    )
    assert extract_pdf_text(pdf)[0] == "XXXXXXX YYYY"


def test_png_predictor_flate():
    content = b"BT (Predicted row data here ok) Tj ET"
    columns = 10
    pad = (-len(content)) % columns
    padded = content + b" " * pad
    # encode with PNG Up predictor (filter type 2): row minus previous row
    rows = [padded[i : i + columns] for i in range(0, len(padded), columns)]
    enc = bytearray()
    prev = bytes(columns)
    for row in rows:
        enc.append(2)
        enc += bytes((a - b) & 0xFF for a, b in zip(row, prev))
        prev = row
    flate = zlib.compress(bytes(enc))
    pdf = assemble(
        _page_scaffold(
            stream_obj(
                b"<< /Length %d /Filter /FlateDecode "
                b"/DecodeParms << /Predictor 12 /Columns %d >> >>"
                % (len(flate), columns),
                flate,
            )
        )
    )
    assert extract_pdf_text(pdf)[0].startswith("Predicted row data here ok")


def test_indirect_length_and_binary_safety():
    # stream bytes deliberately contain "endobj"/"endstream"-like noise and
    # the /Length is an indirect ref
    content = b"BT (Direct scan survives) Tj ET"
    noisy = zlib.compress(content)
    objs = _page_scaffold(
        stream_obj(
            b"<< /Length 9 0 R /Filter /FlateDecode >>", noisy
        )
    )
    objs[9] = b"%d" % len(noisy)
    pdf = assemble(objs)
    assert extract_pdf_text(pdf)[0] == "Direct scan survives"


# --- encryption fixtures ----------------------------------------------------

_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)
_FILE_ID = bytes(range(16))


def _r3_key(o: bytes, p: int, length: int) -> bytes:
    h = hashlib.md5(_PAD + o[:32] + struct.pack("<i", p) + _FILE_ID).digest()
    for _ in range(50):
        h = hashlib.md5(h[:length]).digest()
    return h[:length]


def _r3_u(key: bytes) -> bytes:
    step = rc4(key, hashlib.md5(_PAD + _FILE_ID).digest())
    for i in range(1, 20):
        step = rc4(bytes(b ^ i for b in key), step)
    return step + bytes(16)


def _obj_key(key: bytes, num: int, aes: bool) -> bytes:
    h = hashlib.md5(key + struct.pack("<I", num)[:3] + b"\x00\x00")
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(key) + 5, 16)]


def _enc_trailer(enc_num: int) -> bytes:
    return (
        b"trailer\n<< /Root 1 0 R /Encrypt %d 0 R /ID [<%s> <%s>] >>\n"
        % (enc_num, _FILE_ID.hex().encode(), _FILE_ID.hex().encode())
    )


def test_rc4_128_encrypted_pdf():
    o = bytes(range(32))  # owner hash: opaque input to the user-key derivation
    p = -44
    key = _r3_key(o, p, 16)
    content = b"BT (RC4 secret text) Tj ET"
    ct = rc4(_obj_key(key, 4, aes=False), content)
    objs = _page_scaffold(stream_obj(b"<< /Length %d >>" % len(ct), ct))
    objs[8] = (
        b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P %d\n/O <%s> /U <%s> >>"
        % (p, o.hex().encode(), _r3_u(key).hex().encode())
    )
    pdf = assemble(objs, trailer=_enc_trailer(8))
    text, n = extract_pdf_text(pdf)
    assert n == 1 and text == "RC4 secret text"


def test_aesv2_encrypted_pdf():
    o = bytes(range(100, 132))
    p = -44
    key = _r3_key(o, p, 16)
    content = b"BT (AES-128 secret) Tj ET"
    padlen = 16 - len(content) % 16
    iv = bytes(range(50, 66))
    ct = iv + aes_cbc_encrypt(
        _obj_key(key, 4, aes=True), iv, content + bytes([padlen]) * padlen
    )
    objs = _page_scaffold(stream_obj(b"<< /Length %d >>" % len(ct), ct))
    objs[8] = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d\n"
        b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF\n"
        b"/O <%s> /U <%s> >>" % (p, o.hex().encode(), _r3_u(key).hex().encode())
    )
    pdf = assemble(objs, trailer=_enc_trailer(8))
    text, n = extract_pdf_text(pdf)
    assert n == 1 and text == "AES-128 secret"


def test_aes256_r6_encrypted_pdf():
    file_key = bytes(range(200, 232))
    vsalt, ksalt = bytes(range(8)), bytes(range(8, 16))
    u = _hash_2b(b"", vsalt) + vsalt + ksalt
    ue = aes_cbc_encrypt(_hash_2b(b"", ksalt), bytes(16), file_key)
    content = b"BT (AES-256 secret) Tj ET"
    padlen = 16 - len(content) % 16
    iv = bytes(range(66, 82))
    ct = iv + aes_cbc_encrypt(file_key, iv, content + bytes([padlen]) * padlen)
    objs = _page_scaffold(stream_obj(b"<< /Length %d >>" % len(ct), ct))
    objs[8] = (
        b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -44\n"
        b"/CF << /StdCF << /CFM /AESV3 >> >> /StmF /StdCF\n"
        b"/O <%s> /U <%s> /UE <%s> /OE <%s> >>"
        % (
            bytes(48).hex().encode(),
            u.hex().encode(),
            ue.hex().encode(),
            bytes(32).hex().encode(),
        )
    )
    pdf = assemble(objs, trailer=_enc_trailer(8))
    text, n = extract_pdf_text(pdf)
    assert n == 1 and text == "AES-256 secret"


def test_wrong_password_raises():
    o = bytes(range(32))
    key = _r3_key(o, -44, 16)
    objs = _page_scaffold(stream_obj(b"<< /Length 4 >>", b"\0\0\0\0"))
    # /U deliberately does not match the empty-password derivation
    objs[8] = (
        b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 /O <%s> /U <%s> >>"
        % (o.hex().encode(), bytes(32).hex().encode())
    )
    pdf = assemble(objs, trailer=_enc_trailer(8))
    with pytest.raises(PdfError, match="password"):
        extract_pdf_text(pdf)
    del key
