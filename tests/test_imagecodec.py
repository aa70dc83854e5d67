"""Stdlib image codec: decode checked against hand-built PNG/BMP bytes
(spec-based fixtures, independent of the encoder), resize and the real
multimodal decode/resize paths end-to-end."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import Row

from pipeline_spark.functions.imagecodec import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_png,
    image_features,
    resize_bilinear,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(width, height, color_type, channels, rows) -> bytes:
    """Hand-build a PNG from (filter_type, raw_row_bytes) pairs."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(r) for f, r in rows)
    return (
        PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )


class TestPngDecode:
    def test_filter_none_rgb(self):
        # 2x2 RGB: red green / blue white
        img = _png(2, 2, 2, 3, [
            (0, [255, 0, 0, 0, 255, 0]),
            (0, [0, 0, 255, 255, 255, 255]),
        ])
        arr = decode_png(img)
        assert arr.shape == (2, 2, 3)
        assert arr[0, 0].tolist() == [255, 0, 0]
        assert arr[0, 1].tolist() == [0, 255, 0]
        assert arr[1, 0].tolist() == [0, 0, 255]
        assert arr[1, 1].tolist() == [255, 255, 255]

    def test_filter_sub_up_gray(self):
        # row0 Sub: raw deltas [10, 5, 5] → pixels 10, 15, 20
        # row1 Up:  raw deltas [1, 1, 1]  → pixels 11, 16, 21
        img = _png(3, 2, 0, 1, [(1, [10, 5, 5]), (2, [1, 1, 1])])
        arr = decode_png(img)
        assert arr[:, :, 0].tolist() == [[10, 15, 20], [11, 16, 21]]

    def test_filter_average_paeth(self):
        # average: pixel = raw + floor((left+up)/2); paeth per spec
        img = _png(2, 2, 0, 1, [(3, [10, 20]), (4, [5, 5])])
        arr = decode_png(img)
        # row0: [10+0, 20+floor(10/2)=25]; row1 paeth: a/b/c predictors
        assert arr[0, :, 0].tolist() == [10, 25]
        # row1 x0: a=0 b=10 c=0 → p=10 → pred=b=10 → 15
        # row1 x1: a=15 b=25 c=10 → p=30: pa=15 pb=5 pc=20 → pred=25 → 30
        assert arr[1, :, 0].tolist() == [15, 30]

    def test_palette(self):
        plte = bytes([255, 0, 0, 0, 255, 0])  # idx0=red idx1=green
        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
        raw = b"\x00" + bytes([0, 1])
        img = (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
               + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
        arr = decode_png(img)
        assert arr[0, 0].tolist() == [255, 0, 0]
        assert arr[0, 1].tolist() == [0, 255, 0]

    def test_roundtrip_random(self):
        rng = np.random.default_rng(7)
        for ch in (1, 3, 4):
            arr = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(arr)), arr)

    def test_unsupported_depth(self):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
        img = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError, match="bit depth"):
            decode_png(img)


class TestBmpDecode:
    def _bmp24(self, width, height, pixel_rows_bottom_up):
        row_bytes = ((width * 3 + 3) // 4) * 4
        px = b""
        for row in pixel_rows_bottom_up:  # BGR order, bottom row first
            flat = b"".join(bytes(p) for p in row)
            px += flat + b"\x00" * (row_bytes - len(flat))
        header = (
            b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                          len(px), 2835, 2835, 0, 0)
        )
        return header + px

    def test_bottom_up_bgr(self):
        # logical image: top row = red,green; bottom row = blue,white
        data = self._bmp24(2, 2, [
            [(255, 0, 0), (255, 255, 255)],   # bottom row first, BGR
            [(0, 0, 255), (0, 255, 0)],       # top row: red, green in BGR
        ])
        arr = decode_bmp(data)
        assert arr.shape == (2, 2, 3)
        assert arr[0, 0].tolist() == [255, 0, 0]
        assert arr[0, 1].tolist() == [0, 255, 0]
        assert arr[1, 0].tolist() == [0, 0, 255]
        assert arr[1, 1].tolist() == [255, 255, 255]

    def test_dispatch(self):
        data = self._bmp24(1, 1, [[(1, 2, 3)]])
        assert decode_image(data)[0, 0].tolist() == [3, 2, 1]
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 not-decodable")
        # malformed JPEG fails with a decode error, not a Pillow gate
        from pipeline_spark.functions.jpegcodec import JpegError

        with pytest.raises((JpegError, Exception)):
            decode_image(b"\xff\xd8\xff not-actually-jpeg")


class TestResize:
    def test_solid_stays_solid(self):
        arr = np.full((5, 7, 3), 123, dtype=np.uint8)
        out = resize_bilinear(arr, 224, 112)
        assert out.shape == (112, 224, 3)
        assert (out == 123).all()

    def test_upscale_2x2(self):
        arr = np.array([[[0], [100]], [[200], [60]]], dtype=np.uint8)
        out = resize_bilinear(arr, 4, 4)
        assert out.shape == (4, 4, 1)
        # corners stay within the source value range, no overshoot
        assert out.min() >= 0 and out.max() <= 200

    def test_identity(self):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
        assert np.array_equal(resize_bilinear(arr, 8, 6), arr)


class TestFeatures:
    def test_shape_and_determinism(self):
        rng = np.random.default_rng(11)
        arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        f1, f2 = image_features(arr), image_features(arr)
        assert f1.shape == (8,) and f1.dtype == np.float32
        assert np.array_equal(f1, f2)
        assert f1[2] == 3.0  # channels

    def test_pil_path(self):
        PIL = pytest.importorskip("PIL")
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (4, 3), (10, 20, 30)).save(buf, format="JPEG")
        arr = decode_image(buf.getvalue())
        assert arr.shape[0] == 3 and arr.shape[1] == 4


class TestMultimodalRealPath:
    def test_decode_and_resize_end_to_end(self, spark):
        from pipeline_spark.operators.multimodal import multimodal_transform
        from pipeline_spark.registry import ModuleContext

        def ctx(params, dfs):
            return ModuleContext(spark=spark, name="t", params=params,
                                 inputs=dfs, input_names=["in"], config={})

        rng = np.random.default_rng(5)
        imgs = {
            1: rng.integers(0, 256, size=(10, 20, 3), dtype=np.uint8),
            2: rng.integers(0, 256, size=(6, 4, 1), dtype=np.uint8),
        }
        df = spark.createDataFrame(
            [Row(mm_id=k, payload=encode_png(v)) for k, v in imgs.items()]
        )
        dec = multimodal_transform(
            ctx({"op": "decode", "field": "payload", "idField": "mm_id"}, [df])
        )[""]
        got = {r["mm_id"]: r for r in dec.collect()}
        assert got[1]["width"] == 20 and got[1]["height"] == 10
        assert got[2]["width"] == 4 and got[2]["height"] == 6
        assert got[1]["features"] == [pytest.approx(x) for x in image_features(imgs[1])]

        resized = multimodal_transform(
            ctx({"op": "resize", "field": "payload", "width": 8, "height": 5}, [df])
        )[""]
        r = {x["mm_id"]: x for x in resized.collect()}
        for k in imgs:
            out = decode_png(bytes(r[k]["resized"]))
            assert out.shape[:2] == (5, 8)
            assert r[k]["width"] == 8 and r[k]["height"] == 5


class TestJpegCodec:
    """Baseline JPEG from the T.81 spec: structural golden checks on the
    encoder's marker stream + round-trips through the independent decoder
    (DCT quantization loss bounded, not bit-exact)."""

    def _img(self, h=40, w=56):
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack(
            [xx * 255 // w, yy * 255 // h, (xx + yy) * 255 // (h + w)], axis=2
        ).astype(np.uint8)

    def test_marker_stream_structure(self):
        from pipeline_spark.functions.jpegcodec import encode_jpeg

        data = encode_jpeg(self._img(), quality=90)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        # APP0/JFIF, two DQT, SOF0, four DHT, SOS all present
        assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert marker in data
        # SOF0 carries dimensions big-endian
        i = data.index(b"\xff\xc0")
        h, w = struct.unpack(">HH", data[i + 5 : i + 9])
        assert (h, w) == (40, 56)

    def test_roundtrip_rgb_and_gray(self):
        from pipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

        img = self._img()
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < 1.0
        gray = img[:, :, 0]
        dg = decode_jpeg(encode_jpeg(gray, quality=95))
        assert dg.shape == gray.shape
        assert np.abs(dg.astype(int) - gray.astype(int)).mean() < 1.5

    def test_subsampled_and_odd_dims(self):
        from pipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

        img = self._img(h=37, w=51)  # forces edge padding + 4:2:0 upsample
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < 4.0

    def test_restart_markers_equivalent(self):
        from pipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

        img = self._img(h=64, w=80)
        plain = decode_jpeg(encode_jpeg(img, quality=85))
        for ri in (1, 3):
            data = encode_jpeg(img, quality=85, restart_interval=ri)
            assert b"\xff\xdd" in data  # DRI segment
            assert b"\xff\xd0" in data  # at least one RST0
            assert np.array_equal(decode_jpeg(data), plain)

    def test_arithmetic_coding_gated(self):
        """Progressive (SOF2) now decodes natively; the remaining honest
        gate is arithmetic coding (SOF9+), which still raises."""
        from pipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

        data = bytearray(encode_jpeg(self._img(), quality=90))
        i = data.index(b"\xff\xc0")
        data[i + 1] = 0xC9  # flip SOF0 -> SOF9 (arithmetic sequential)
        with pytest.raises(NotImplementedError, match="arithmetic"):
            decode_jpeg(bytes(data))

    def test_dispatch_from_decode_image(self):
        from pipeline_spark.functions.jpegcodec import encode_jpeg

        img = self._img()
        out = decode_image(encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 1.0


class TestProgressiveJpeg:
    """Progressive (SOF2) decode: full successive-approximation pipeline —
    DC first/refine, AC spectral-selection first passes, AC refinement
    with EOB runs (T.81 G.1/G.2).  Fixture: the Apache-2.0 grayscale
    sample shipped with Spark (data/mllib/images), whose scan script is
    the full 6-pass successive-approximation shape; decode verified
    pixel-exact (max |diff| = 1) against javax.imageio during
    development, pinned here by checksum."""

    FIXTURE = __file__.rsplit("/", 1)[0] + "/data/progressive_gray.jpg"

    def test_decodes_pixel_pinned(self):
        import hashlib

        from pipeline_spark.functions.jpegcodec import decode_jpeg

        img = decode_jpeg(open(self.FIXTURE, "rb").read())
        assert img.shape == (215, 300)
        assert abs(float(img.mean()) - 142.1361) < 1e-3
        assert abs(float(img.std()) - 64.6208) < 1e-3
        assert hashlib.sha256(img.tobytes()).hexdigest().startswith("cadb16e7b0e2b902")

    def test_roundtrip_through_baseline_encoder(self):
        """Progressive decode → our baseline re-encode → decode again:
        the images must stay close (lossy but same content)."""
        import numpy as np

        from pipeline_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

        img = decode_jpeg(open(self.FIXTURE, "rb").read())
        back = decode_jpeg(encode_jpeg(np.stack([img] * 3, axis=2), quality=95))
        assert back.shape == (215, 300, 3)
        mad = float(np.abs(back[..., 0].astype(int) - img.astype(int)).mean())
        assert mad < 3.0, mad
