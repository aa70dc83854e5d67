"""WARC codec + source/sink: spec-shaped fixtures, gzip members, e2e."""

import gzip

import pytest
from pyspark.sql import Row

from pipeline_spark.functions import warcrec
from pipeline_spark.registry import ModuleContext
from pipeline_spark.sinks.warc import warc_sink
from pipeline_spark.sources.warc import read_warc, warc_source


def _response_record(uri: str, body: bytes, status: int = 200) -> bytes:
    http = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    return warcrec.encode_record(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000001>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "WARC-Target-URI": uri,
            "Content-Type": "application/http; msgtype=response",
        },
        http,
    )


def test_encode_decode_roundtrip_plain():
    rec = warcrec.encode_record(
        {"WARC-Type": "resource", "WARC-Target-URI": "doc://1"}, b"hello"
    )
    ((headers, payload),) = list(warcrec.decode_records(rec))
    assert headers["warc-type"] == "resource"
    assert headers["content-length"] == "5"
    assert payload == b"hello"


def test_decode_multi_record_and_padding():
    data = (
        _response_record("http://a", b"<html>A</html>")
        + b"\r\n\r\n"  # extra inter-record padding
        + warcrec.encode_record({"WARC-Type": "warcinfo"}, b"robots: classic\r\n")
    )
    recs = list(warcrec.decode_records(data))
    assert [h["warc-type"] for h, _ in recs] == ["response", "warcinfo"]


def test_decode_gzip_members():
    data = warcrec.encode_gzip_member(
        {"WARC-Type": "resource", "WARC-Target-URI": "doc://1"}, b"one"
    ) + warcrec.encode_gzip_member(
        {"WARC-Type": "resource", "WARC-Target-URI": "doc://2"}, b"two"
    )
    recs = list(warcrec.decode_records(data))
    assert [p for _, p in recs] == [b"one", b"two"]
    # deterministic bytes: mtime pinned
    again = warcrec.encode_gzip_member(
        {"WARC-Type": "resource", "WARC-Target-URI": "doc://1"}, b"one"
    )
    assert data.startswith(again)


def test_header_continuation_obs_fold():
    raw = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\nX-Long: first\r\n"
        b" second\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    )
    ((headers, payload),) = list(warcrec.decode_records(raw))
    assert headers["x-long"] == "first second"
    assert payload == b"ok"


def test_truncated_payload_raises():
    rec = warcrec.encode_record({"WARC-Type": "resource"}, b"full payload")
    with pytest.raises(ValueError, match="truncated"):
        list(warcrec.decode_records(rec[:-10]))


def test_split_http():
    body = b"<html>hi</html>"
    status, headers, entity = warcrec.split_http(
        b"HTTP/1.1 301 Moved\r\nLocation: /x\r\n\r\n" + body
    )
    assert status == 301 and headers["location"] == "/x" and entity == body
    # non-http payload passes through untouched
    s, h, e = warcrec.split_http(b"plain bytes")
    assert s is None and e == b"plain bytes"


def test_source_reads_cc_shaped_file(spark, tmp_path):
    f = tmp_path / "crawl.warc.gz"
    body_a = b"<html>alpha</html>"
    data = gzip.compress(
        warcrec.encode_record({"WARC-Type": "warcinfo"}, b"format: WARC\r\n")
    , mtime=0)
    data += gzip.compress(_response_record("http://a.example/", body_a), mtime=0)
    data += gzip.compress(_response_record("http://b.example/", b"<p>b</p>", 404), mtime=0)
    f.write_bytes(data)

    df = read_warc(spark, str(f))
    rows = {r["target_uri"]: r for r in df.collect()}
    assert len(rows) == 3
    a = rows["http://a.example/"]
    assert a["warc_type"] == "response" and a["http_status"] == 200
    assert bytes(a["payload"]) == body_a  # HTTP headers stripped
    assert rows["http://b.example/"]["http_status"] == 404

    only_resp = read_warc(spark, str(f), record_types=["response"]).collect()
    assert len(only_resp) == 2
    raw = read_warc(spark, str(f), http_payload=False).collect()
    assert any(bytes(r["payload"]).startswith(b"HTTP/1.1") for r in raw)


def test_sink_source_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out")
    docs = spark.createDataFrame(
        [Row(uri=f"doc://{i}", payload=f"text body {i}") for i in range(20)]
    ).repartition(3)
    warc_sink(
        ModuleContext(
            spark=spark, name="w", params={"output": out},
            inputs=[docs], input_names=["in"], side_inputs={},
        )
    )
    back = warc_source(
        ModuleContext(
            spark=spark, name="r", params={"input": out + "/*.warc.gz"},
            inputs=[], input_names=[], side_inputs={},
        )
    )[""]
    rows = {r["target_uri"]: bytes(r["payload"]).decode() for r in back.collect()}
    assert rows == {f"doc://{i}": f"text body {i}" for i in range(20)}
    assert all(r["warc_type"] == "resource" for r in back.collect())


def test_codec_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    header_text = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters=":"),
        min_size=1, max_size=20,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(header_text, st.binary(max_size=500)),
            min_size=1, max_size=5,
        ),
        st.booleans(),
    )
    def roundtrip(records, use_gzip):
        blob = b""
        for uri, payload in records:
            headers = {"WARC-Type": "resource", "WARC-Target-URI": uri}
            blob += (
                warcrec.encode_gzip_member(headers, payload)
                if use_gzip
                else warcrec.encode_record(headers, payload)
            )
        decoded = list(warcrec.decode_records(blob))
        assert [(h["warc-target-uri"], p) for h, p in decoded] == records

    roundtrip()


def test_decoder_rejects_junk_without_hanging():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=1, max_size=300))
    def junk(data):
        if data[:2] == b"\x1f\x8b" or data[:5] == b"WARC/":
            return  # may parse; only the error contract is under test here
        try:
            list(warcrec.decode_records(data))
        except ValueError:
            pass

    junk()


def test_source_on_error_skip_drops_corrupt_file(spark, tmp_path):
    good = tmp_path / "good.warc"
    good.write_bytes(
        warcrec.encode_record(
            {"WARC-Type": "resource", "WARC-Target-URI": "doc://ok"}, b"fine"
        )
    )
    bad = tmp_path / "bad.warc"
    bad.write_bytes(b"WARC/1.0\r\nContent-Length: 9999\r\n\r\ntruncated")
    with pytest.raises(Exception):
        read_warc(spark, str(tmp_path / "*.warc")).collect()
    rows = read_warc(spark, str(tmp_path / "*.warc"), on_error="skip").collect()
    assert [r["target_uri"] for r in rows] == ["doc://ok"]
    with pytest.raises(ValueError, match="onError"):
        read_warc(spark, str(good), on_error="nope")


def test_sink_atomic_rename_and_null_uri(spark, tmp_path):
    """ADVICE r4: final files appear via task-attempt-unique tmp + rename
    (no partial/interleaved archives from retries); a null uri renders as
    an empty WARC-Target-URI, not the literal 'None'."""
    import os

    out = str(tmp_path / "warc_out")
    docs = spark.createDataFrame(
        [Row(uri=None, payload="no uri body"), Row(uri="doc://1", payload="x")]
    ).coalesce(1)
    warc_sink(
        ModuleContext(
            spark=spark, name="w", params={"output": out},
            inputs=[docs], input_names=["in"], side_inputs={},
        )
    )
    names = sorted(os.listdir(out))
    assert names == ["part-00000.warc.gz"], names  # no .tmp leftovers
    back = warc_source(
        ModuleContext(
            spark=spark, name="r", params={"input": out + "/*.warc.gz"},
            inputs=[], input_names=[], side_inputs={},
        )
    )[""]
    uris = sorted(r["target_uri"] or "" for r in back.collect())
    assert uris == ["", "doc://1"]
    assert "None" not in uris


def test_gzip_member_byte_identical_to_gzipfile_reference():
    """r16 pin: the zlib.compressobj encoder (hot loop) must produce the
    exact bytes the GzipFile-based encoder wrote in every earlier round
    (OS header byte patched to 0xff)."""
    import gzip
    import io

    from pipeline_spark.functions import warcrec

    def reference(headers, payload, level=6):
        buf = io.BytesIO()
        with gzip.GzipFile(
            fileobj=buf, mode="wb", mtime=0, compresslevel=level
        ) as gz:
            gz.write(warcrec.encode_record(headers, payload))
        return buf.getvalue()

    hdrs = {
        "WARC-Type": "resource",
        "WARC-Record-ID": "<urn:uuid:x>",
        "WARC-Date": "2026-01-01T00:00:00Z",
        "WARC-Target-URI": "doc://42",
        "Content-Type": "text/plain",
    }
    for level in (1, 6, 9):
        for payload in (b"", b"x", "日本語テキスト".encode() * 64,
                        b"the quick brown fox " * 200):
            assert warcrec.encode_gzip_member(
                hdrs, payload, level=level
            ) == reference(hdrs, payload, level=level)
