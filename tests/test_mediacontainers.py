"""Matroska/EBML, Ogg, and MP3 container parsers: spec-shaped fixtures."""

import struct

import pytest
from pyspark.sql import Row

from pipeline_spark.functions.mediacontainers import (
    MediaError,
    build_matroska,
    build_mp3,
    build_ogg_opus,
    build_ogg_page,
    build_ogg_vorbis,
    parse_audio_meta,
    parse_matroska,
    parse_mp3,
    parse_ogg,
)


# ---------------------------------------------------------------- matroska


def test_matroska_webm_video_and_audio():
    data = build_matroska(
        doctype="webm",
        duration_s=2.0,
        video={"codec": "V_VP9", "width": 1280, "height": 720},
        audio={"codec": "A_OPUS", "sample_rate": 48000, "channels": 2},
        cluster_blocks=[(1, True), (1, False), (1, False), (2, False)],
    )
    meta = parse_matroska(data)
    assert meta["doctype"] == "webm"
    assert meta["duration_s"] == pytest.approx(2.0)
    vid = next(t for t in meta["tracks"] if t["type"] == "video")
    aud = next(t for t in meta["tracks"] if t["type"] == "audio")
    assert (vid["codec"], vid["width"], vid["height"]) == ("V_VP9", 1280, 720)
    assert vid["n_blocks"] == 3 and vid["n_keyframes"] == 1
    assert vid["fps"] == pytest.approx(1.5)
    assert (aud["codec"], aud["sample_rate"], aud["channels"]) == (
        "A_OPUS", 48000, 2,
    )


def test_matroska_hand_built_bytes():
    """Byte-level check: an EBML header with DocType 'matroska' parsed from
    explicitly hand-written bytes (not the builder)."""
    # 1A45DFA3 [size 0x8C=12... actually 0x88+4] — header containing
    # 4282 88 'matroska' (DocType, size 8)
    doc = b"\x42\x82\x88matroska"
    data = b"\x1a\x45\xdf\xa3" + bytes([0x80 | len(doc)]) + doc
    meta = parse_matroska(data)
    assert meta["doctype"] == "matroska"
    assert meta["tracks"] == [] and meta["duration_s"] is None


def test_matroska_rejects_non_ebml():
    with pytest.raises(MediaError, match="EBML"):
        parse_matroska(b"RIFF....WAVE")


# --------------------------------------------------------------------- ogg


def test_ogg_opus_duration_and_ident():
    data = build_ogg_opus(duration_s=1.5, channels=2, pre_skip=312)
    meta = parse_ogg(data)
    assert meta["n_pages"] == 3
    (st,) = meta["streams"]
    assert st["codec"] == "opus" and st["channels"] == 2
    assert st["sample_rate"] == 48000
    assert st["duration_s"] == pytest.approx(1.5)


def test_ogg_vorbis_duration():
    data = build_ogg_vorbis(duration_s=2.0, channels=1, sample_rate=22050)
    (st,) = parse_ogg(data)["streams"]
    assert st["codec"] == "vorbis"
    assert st["sample_rate"] == 22050 and st["channels"] == 1
    assert st["duration_s"] == pytest.approx(2.0)


def test_ogg_crc_is_verified():
    data = bytearray(build_ogg_opus())
    data[40] ^= 0xFF  # flip a payload byte without fixing the CRC
    with pytest.raises(MediaError, match="CRC"):
        parse_ogg(bytes(data))


def test_ogg_multiplexed_streams():
    a = build_ogg_page(1, 0, 0, b"OpusHead\x01\x02" + struct.pack("<H", 0)
                       + struct.pack("<I", 48000) + b"\x00\x00\x00", htype=0x02)
    b = build_ogg_page(2, 0, 0, b"\x01vorbis" + struct.pack("<I", 0)
                       + bytes([2]) + struct.pack("<I", 44100)
                       + b"\x00" * 14, htype=0x02)
    end_a = build_ogg_page(1, 1, 48000, b"x", htype=0x04)
    end_b = build_ogg_page(2, 1, 88200, b"y", htype=0x04)
    meta = parse_ogg(a + b + end_a + end_b)
    codecs = sorted(s["codec"] for s in meta["streams"])
    assert codecs == ["opus", "vorbis"]
    durs = {s["codec"]: s["duration_s"] for s in meta["streams"]}
    assert durs["opus"] == pytest.approx(1.0)
    assert durs["vorbis"] == pytest.approx(2.0)


# --------------------------------------------------------------------- mp3


def test_mp3_cbr_frame_walk():
    data = build_mp3(n_frames=38, kbps=128, rate=44100)
    meta = parse_mp3(data)
    assert meta["sample_rate"] == 44100
    assert meta["bitrate_kbps"] == 128
    assert meta["n_frames"] == 38
    assert not meta["vbr"]
    assert meta["duration_s"] == pytest.approx(38 * 1152 / 44100)


def test_mp3_id3_skip_and_resync():
    # ID3 tag bytes deliberately contain a fake 0xFFE sync pattern; the
    # syncsafe size skip must jump straight over it
    data = build_mp3(n_frames=5, kbps=64, rate=32000, id3=b"\xff\xfb junk tag ")
    meta = parse_mp3(data)
    assert meta["n_frames"] == 5 and meta["sample_rate"] == 32000
    assert meta["duration_s"] == pytest.approx(5 * 1152 / 32000)


def test_mp3_xing_vbr_header():
    base = build_mp3(n_frames=3, kbps=128, rate=44100)
    frame_len = 144_000 * 128 // 44100
    # inject a Xing header (flags=1: frames field present, claiming 100)
    first = bytearray(base[:frame_len])
    xing = b"Xing" + struct.pack(">II", 1, 100)
    first[36 : 36 + len(xing)] = xing
    meta = parse_mp3(bytes(first) + base[frame_len:])
    assert meta["vbr"] and meta["n_frames"] == 100
    assert meta["duration_s"] == pytest.approx(100 * 1152 / 44100)


def test_mp3_rejects_garbage():
    with pytest.raises(MediaError, match="frame"):
        parse_mp3(b"\x00" * 64)


# ------------------------------------------------------------- audio_meta


def test_parse_audio_meta_dispatch():
    from pipeline_spark.functions.audiocodec import encode_wav
    import numpy as np

    wav = encode_wav(np.zeros((4410, 1), dtype=np.float64), 44100)
    m = parse_audio_meta(wav)
    assert m["container"] == "wav" and m["sample_rate"] == 44100
    assert m["duration_s"] == pytest.approx(0.1)

    m = parse_audio_meta(build_mp3(n_frames=10))
    assert m["container"] == "mp3" and m["n_frames"] == 10

    m = parse_audio_meta(build_ogg_opus(duration_s=0.5))
    assert m["container"] == "ogg" and m["codec"] == "opus"

    m = parse_audio_meta(
        build_matroska(audio={"codec": "A_VORBIS", "sample_rate": 44100,
                              "channels": 2},
                       cluster_blocks=[(2, False)] * 4)
    )
    assert m["container"] == "webm" and m["codec"] == "A_VORBIS"
    assert m["n_frames"] == 4

    with pytest.raises(MediaError):
        parse_audio_meta(b"\x89PNG\r\n\x1a\n")


def test_flac_streaminfo_meta():
    from pipeline_spark.functions.flaccodec import encode_flac
    import numpy as np

    pcm = (np.sin(np.linspace(0, 20, 8000))[:, None] * 2000).astype(np.int32)
    flac = encode_flac(pcm, 8000)
    m = parse_audio_meta(flac)
    assert m["container"] == "flac"
    assert m["sample_rate"] == 8000 and m["channels"] == 1
    assert m["duration_s"] == pytest.approx(1.0)


# ------------------------------------------------------------ spark ops


def test_video_meta_op_webm(spark):
    from pipeline_spark.operators.multimodal import multimodal_transform
    from pipeline_spark.registry import ModuleContext

    webm = build_matroska(
        video={"codec": "V_AV1", "width": 320, "height": 240},
        cluster_blocks=[(1, True), (1, False)],
        duration_s=1.0,
    )
    df = spark.createDataFrame(
        [Row(vid=1, content=bytearray(webm)), Row(vid=2, content=bytearray(b"xx"))]
    )
    out = multimodal_transform(
        ModuleContext(
            spark=spark, name="m",
            params={"op": "video_meta", "field": "content", "onError": "null"},
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )[""]
    rows = {r["vid"]: r for r in out.collect()}
    assert rows[1]["video_codec"] == "V_AV1"
    assert rows[1]["video_width"] == 320 and rows[1]["video_height"] == 240
    assert rows[1]["n_samples"] == 2 and rows[1]["n_keyframes"] == 1
    assert rows[2]["video_codec"] is None


def test_audio_meta_op(spark):
    from pipeline_spark.operators.multimodal import multimodal_transform
    from pipeline_spark.registry import ModuleContext

    df = spark.createDataFrame(
        [
            Row(aid=1, content=bytearray(build_mp3(n_frames=20))),
            Row(aid=2, content=bytearray(build_ogg_vorbis(duration_s=3.0))),
            Row(aid=3, content=bytearray(b"junk")),
        ]
    )
    out = multimodal_transform(
        ModuleContext(
            spark=spark, name="m",
            params={"op": "audio_meta", "field": "content", "onError": "null"},
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )[""]
    rows = {r["aid"]: r for r in out.collect()}
    assert rows[1]["container"] == "mp3" and rows[1]["n_frames"] == 20
    assert rows[2]["audio_codec"] == "vorbis"
    assert rows[2]["duration_s"] == pytest.approx(3.0)
    assert rows[3]["container"] is None


# ----------------------------------------------------- review regressions


def test_ebml_127_byte_element_not_unknown_size():
    """A definite size of 127 encoded as 2 bytes (0x40 0x7F) must NOT be
    treated as the reserved all-ones unknown-size pattern — that would
    swallow every following sibling (here: the Tracks element)."""
    from pipeline_spark.functions.mediacontainers import ebml_elem, ebml_uint

    # Info body padded to exactly 127 bytes
    info_body = ebml_uint(0x2AD7B1, 1_000_000)
    info_body += ebml_elem(0xEC, b"\x00" * (127 - len(info_body) - 2))  # Void
    assert len(info_body) == 127
    info = b"\x15\x49\xa6\x66" + b"\x40\x7f" + info_body
    tracks = ebml_elem(
        0x1654AE6B,
        ebml_elem(
            0xAE,
            ebml_uint(0xD7, 1) + ebml_uint(0x83, 2)
            + ebml_elem(0x86, b"A_OPUS")
            + ebml_elem(0xE1, ebml_uint(0x9F, 2)),
        ),
    )
    data = (
        ebml_elem(0x1A45DFA3, ebml_elem(0x4282, b"webm"))
        + ebml_elem(0x18538067, info + tracks)
    )
    meta = parse_matroska(data)
    assert len(meta["tracks"]) == 1
    assert meta["tracks"][0]["codec"] == "A_OPUS"


def test_blockgroup_keyframes_via_reference_block():
    """BlockGroup keyframe-ness = absence of ReferenceBlock."""
    from pipeline_spark.functions.mediacontainers import ebml_elem, ebml_uint

    def group(tn, referenced):
        body = ebml_elem(0xA1, bytes([0x80 | tn]) + b"\x00\x00\x00dd")
        if referenced:
            body += ebml_elem(0xFB, b"\x01")
        return ebml_elem(0xA0, body)

    cluster = ebml_elem(
        0x1F43B675,
        ebml_uint(0xE7, 0) + group(1, False) + group(1, True) + group(1, True),
    )
    tracks = ebml_elem(
        0x1654AE6B,
        ebml_elem(
            0xAE,
            ebml_uint(0xD7, 1) + ebml_uint(0x83, 1)
            + ebml_elem(0x86, b"V_VP9")
            + ebml_elem(0xE0, ebml_uint(0xB0, 64) + ebml_uint(0xBA, 48)),
        ),
    )
    data = (
        ebml_elem(0x1A45DFA3, ebml_elem(0x4282, b"matroska"))
        + ebml_elem(0x18538067, tracks + cluster)
    )
    (tr,) = parse_matroska(data)["tracks"]
    assert tr["n_blocks"] == 3 and tr["n_keyframes"] == 1


def test_mp3_header_at_exact_tail():
    """A stream truncated to end exactly at a final frame header must
    still count that frame."""
    full = build_mp3(n_frames=3)
    frame_len = len(full) // 3
    truncated = full[: 2 * frame_len + 4]  # third frame = header only
    meta = parse_mp3(truncated)
    assert meta["n_frames"] == 3
