"""GIF codec: LZW + frame composition validated against hand-built
GIF89a structures and encoder round-trips; frame_sample e2e on Spark."""

import struct

import numpy as np
import pytest

from pipeline_spark.functions.gifcodec import (
    GifError,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


class TestLzw:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        for ncolors, mcs in ((4, 2), (16, 4), (200, 8)):
            idx = [int(x) for x in rng.integers(0, ncolors, 1000)]
            assert lzw_decode(lzw_encode(idx, mcs), mcs) == idx

    def test_known_stream(self):
        """Hand-decoded example: min_code_size=2, clear=4, eoi=5.
        Stream: CLEAR(100), 0(000), EOI(101) packed LSB-first, 3-bit codes:
        bits = 100 000 101 -> byte0 = 0b00000100 | (0<<3)... compute:
        c0=4 (100), c1=0 (000), c2=5 (101):
        acc = 4 | 0<<3 | 5<<6 = 0b101_000_100 = 0x144 -> bytes 44 01"""
        assert lzw_decode(bytes([0x44, 0x01]), 2) == [0]


class TestGifStructure:
    def test_header_and_trailer(self):
        img = np.zeros((4, 5, 3), dtype=np.uint8)
        data = encode_gif(img)
        assert data[:6] == b"GIF89a"
        w, h = struct.unpack("<HH", data[6:10])
        assert (w, h) == (5, 4)
        assert data[-1:] == b"\x3b"

    def test_bad_signature(self):
        with pytest.raises(GifError, match="signature"):
            decode_gif(b"NOTGIF" + b"\x00" * 20)


class TestRoundtrip:
    def _img(self):
        img = np.zeros((20, 30, 3), dtype=np.uint8)
        img[5:10, 4:20] = [255, 0, 0]
        img[12:18, 10:25] = [0, 128, 255]
        return img

    def test_still_lossless(self):
        img = self._img()
        assert np.array_equal(decode_gif(encode_gif(img)), img)

    def test_interlaced(self):
        img = self._img()
        data = encode_gif(img, interlace=True)
        # interlace flag set on the image descriptor
        i = data.index(b"\x2c")
        assert data[i + 9] & 0x40
        assert np.array_equal(decode_gif(data), img)

    def test_animation_frames_and_delays(self):
        f1 = self._img()
        f2 = np.roll(f1, 3, axis=0)
        f3 = np.roll(f1, 7, axis=1)
        frames = decode_gif_frames(encode_gif([f1, f2, f3], delays_ms=[50, 100, 200]))
        assert [d for d, _ in frames] == [50, 100, 200]
        for got, want in zip(frames, (f1, f2, f3)):
            assert np.array_equal(got[1], want)

    def test_dispatch_from_decode_image(self):
        from pipeline_spark.functions.imagecodec import decode_image

        img = self._img()
        assert np.array_equal(decode_image(encode_gif(img)), img)

    def test_too_many_colors_raises(self):
        rng = np.random.default_rng(0)
        noise = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
        with pytest.raises(GifError, match="256"):
            encode_gif(noise)


class TestFrameSampleReal:
    def test_gif_frame_sample_e2e(self, spark):
        from pyspark.sql import Row

        from pipeline_spark.functions.imagecodec import decode_png
        from pipeline_spark.operators.multimodal import multimodal_transform
        from pipeline_spark.registry import ModuleContext

        base = np.zeros((10, 12, 3), dtype=np.uint8)
        frames = []
        for i in range(4):
            f = base.copy()
            f[:, i * 3 : i * 3 + 3] = [255, 0, 0]
            frames.append(f)
        gif = encode_gif(frames, delays_ms=[100, 100, 100, 100])
        df = spark.createDataFrame(
            [Row(mm_id=1, payload=bytearray(gif)),
             Row(mm_id=2, payload=bytearray(b"not a video"))]
        )
        out = multimodal_transform(ModuleContext(
            spark=spark, name="m",
            params={"op": "frame_sample", "field": "payload", "idField": "mm_id",
                    "frames": 4, "onError": "null"},
            inputs=[df], input_names=["in"], config={},
        ))[""]
        rows = out.collect()
        good = sorted(
            (r["frame_idx"], r["ts_sec"]) for r in rows if r["mm_id"] == 1
        )
        assert [i for i, _ in good] == [0, 1, 2, 3]
        assert [t for _, t in good] == [0.0, pytest.approx(0.1), pytest.approx(0.2), pytest.approx(0.3)]
        first = next(r for r in rows if r["mm_id"] == 1 and r["frame_idx"] == 0)
        assert np.array_equal(decode_png(bytes(first["frame"])), frames[0])
        bad = [r for r in rows if r["mm_id"] == 2]
        assert len(bad) == 1 and bad[0]["frame"] is None
