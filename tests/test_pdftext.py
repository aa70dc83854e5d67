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
    enc = build_pdf([b"BT (x) Tj ET"]) + b"\n/Encrypt 9 0 R\n"
    with pytest.raises(PdfError, match="ncrypt"):
        extract_pdf_text(enc)


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
