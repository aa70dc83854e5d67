"""ISO-BMFF parser: hand-assembled MP4s (via the module's box builder)
checked field-by-field, sample-table resolution, and the Spark
multimodal video_meta / frame_sample(emit: raw) ops end-to-end."""

import numpy as np
import pytest
from pyspark.sql import Row

from pipeline_spark.functions.mp4box import (
    Mp4Error,
    build_mp4,
    parse_mp4,
    resolve_samples,
)


def _samples(n=10):
    return [bytes([i]) * (10 + i) for i in range(n)]


def test_parse_metadata_fields():
    data = build_mp4(_samples(10), width=320, height=240, timescale=1000,
                     sample_delta=40, sync_samples=[1, 5, 9])
    meta = parse_mp4(data)
    assert meta["brand"] == "isom"
    assert abs(meta["duration_s"] - 0.4) < 1e-9
    assert not meta["fragmented"]
    (tr,) = meta["tracks"]
    assert tr["type"] == "vide" and tr["codec"] == "avc1"
    assert tr["width"] == 320.0 and tr["height"] == 240.0
    assert tr["n_samples"] == 10 and tr["n_keyframes"] == 3
    assert abs(tr["fps"] - 25.0) < 1e-9


def test_no_stss_means_all_sync():
    meta = parse_mp4(build_mp4(_samples(4)))
    assert meta["tracks"][0]["n_keyframes"] == 4


def test_resolve_samples_offsets_and_times():
    payloads = _samples(6)
    data = build_mp4(payloads, timescale=100, sample_delta=10,
                     sync_samples=[1, 4])
    meta = parse_mp4(data)
    samples = resolve_samples(data, meta["tracks"][0])
    assert len(samples) == 6
    for i, s in enumerate(samples):
        assert data[s["offset"] : s["offset"] + s["size"]] == payloads[i]
        assert abs(s["ts_s"] - i * 0.1) < 1e-9
    assert [s["sync"] for s in samples] == [True, False, False, True,
                                            False, False]


def test_rejects_non_mp4():
    with pytest.raises(Mp4Error):
        parse_mp4(b"not an mp4 at all....")


def test_video_meta_and_raw_keyframes_ops(spark):
    from pipeline_spark.operators.multimodal import multimodal_transform
    from pipeline_spark.registry import ModuleContext

    payloads = _samples(8)
    mp4 = build_mp4(payloads, width=128, height=96, timescale=1000,
                    sample_delta=50, sync_samples=[1, 3, 5, 7])
    df = spark.createDataFrame([Row(mm_id=1, payload=bytearray(mp4))])

    meta = multimodal_transform(ModuleContext(
        spark=spark, name="v",
        params={"op": "video_meta", "field": "payload", "idField": "mm_id"},
        inputs=[df], input_names=["in"], side_inputs={},
    ))[""].collect()[0]
    assert meta["video_width"] == 128 and meta["video_height"] == 96
    assert meta["video_codec"] == "avc1"
    assert meta["n_samples"] == 8 and meta["n_keyframes"] == 4
    assert abs(meta["duration_s"] - 0.4) < 1e-9

    frames = multimodal_transform(ModuleContext(
        spark=spark, name="f",
        params={"op": "frame_sample", "field": "payload",
                "idField": "mm_id", "frames": 2, "emit": "raw"},
        inputs=[df], input_names=["in"], side_inputs={},
    ))[""].collect()
    # 4 keyframes, 2 requested → stride 2 → samples 1 and 5 (1-indexed)
    got = sorted((r["frame_idx"], bytes(r["frame"])) for r in frames)
    assert got == [(0, payloads[0]), (1, payloads[4])]
    # pixel decode still gates without emit: raw
    with pytest.raises(Exception, match="ffmpeg|emit"):
        multimodal_transform(ModuleContext(
            spark=spark, name="f2",
            params={"op": "frame_sample", "field": "payload",
                    "idField": "mm_id"},
            inputs=[df], input_names=["in"], side_inputs={},
        ))[""].collect()
