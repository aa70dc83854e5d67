"""Pure-stdlib image codec: real PNG/BMP decode, PNG encode, resize.

Gives the multimodal operator a REAL decode path in containers without
image libraries: PNG needs only ``zlib`` (inflate + per-row unfilter per
the public PNG spec) and BMP 24/32-bit is raw pixels.  Anything else
(JPEG, GIF, WebP…) dispatches to Pillow when importable and raises
``NotImplementedError`` naming the missing dependency otherwise.

All arrays are ``numpy`` uint8 with shape (height, width, channels),
channels ∈ {1, 3, 4}.

Reference scope: the reference engine has no image codec of its own —
this supports the training-data multimodal extension (BASELINE north
star), not a reference module.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG per-row filters (types 0-4) → flat pixel bytes."""
    out = np.empty((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[y] = row
        prev = row
    return out


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("png: bad signature")
    pos = len(_PNG_SIG)
    idat = bytearray()
    palette = None
    width = height = None
    channels = 0
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"png: bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("png: interlaced (Adam7) not supported")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"png: unknown color type {color}")
            color_type = color
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("png: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    px = _unfilter(raw, height, stride, channels)
    arr = px.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("png: palette image without PLTE")
        arr = palette[arr[:, :, 0]]
    return arr


def encode_png(arr: np.ndarray) -> bytes:
    """Encode (H, W, C) uint8 → PNG (filter 0 rows, single IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"png: cannot encode {channels} channels")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride = width * channels
    flat = arr.reshape(height, stride)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(height))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("bmp: bad signature")
    (pixel_offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("bmp: core-header variant not supported")
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"bmp: bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = ((width * nch + 3) // 4) * 4
    arr = np.empty((height, width, nch), dtype=np.uint8)
    for y in range(height):
        off = pixel_offset + y * row_bytes
        row = np.frombuffer(data, dtype=np.uint8, count=width * nch, offset=off)
        arr[y if top_down else height - 1 - y] = row.reshape(width, nch)
    # BGR(A) → RGB(A)
    if nch >= 3:
        arr = arr[:, :, [2, 1, 0] + ([3] if nch == 4 else [])]
    return arr


def resize_bilinear(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Vectorized bilinear resample of (H, W, C) uint8 to (height, width, C)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    src_h, src_w, _ = arr.shape
    ys = np.clip((np.arange(height) + 0.5) * src_h / height - 0.5, 0, src_h - 1)
    xs = np.clip((np.arange(width) + 0.5) * src_w / width - 0.5, 0, src_w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, src_h - 1)
    x1 = np.minimum(x0 + 1, src_w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    a = arr[y0][:, x0].astype(np.float64)
    b = arr[y0][:, x1].astype(np.float64)
    c = arr[y1][:, x0].astype(np.float64)
    d = arr[y1][:, x1].astype(np.float64)
    out = (
        a * (1 - wy) * (1 - wx)
        + b * (1 - wy) * wx
        + c * wy * (1 - wx)
        + d * wy * wx
    )
    return np.rint(out).clip(0, 255).astype(np.uint8)


def _pil_decode(data: bytes) -> np.ndarray:
    try:
        import io

        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "decoding this image format needs Pillow (pip install Pillow); "
            "only PNG and uncompressed BMP decode without it"
        ) from None
    img = Image.open(io.BytesIO(data))
    if img.mode == "P":
        img = img.convert("RGB")
    return np.asarray(img)


def decode_image(data: bytes) -> np.ndarray:
    """Magic-byte dispatch: PNG/BMP/JPEG (baseline + progressive)/GIF/
    lossless-WebP natively; the remainder (lossy VP8, arithmetic-coded
    JPEG, TIFF…) via Pillow when installed."""
    if data.startswith(_PNG_SIG):
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"\xff\xd8":
        from pipeline_spark.functions.jpegcodec import JpegError, decode_jpeg

        try:
            return decode_jpeg(data)
        except NotImplementedError:
            return _pil_decode(data)  # arithmetic/CMYK/12-bit
        except JpegError as native_err:
            # malformed-but-Pillow-tolerable streams keep their fallback;
            # without Pillow re-raise the native error (more specific)
            try:
                return _pil_decode(data)
            except NotImplementedError:
                raise native_err from None
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from pipeline_spark.functions.gifcodec import decode_gif

        return decode_gif(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from pipeline_spark.functions.vp8lcodec import decode_webp

        try:
            return decode_webp(data)
        except NotImplementedError:
            return _pil_decode(data)  # lossy VP8 / animations
    return _pil_decode(data)


def image_features(arr: np.ndarray, dim: int = 8) -> np.ndarray:
    """Deterministic global feature vector of a decoded image:
    [log1p(w), log1p(h), channels, mean, std, quadrant-gray means (TL, BR),
    mean |horizontal gradient|] — all intensity terms normalized to [0,1].
    A stand-in for a learned embedding with the identical Spark contract."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    gray = arr.mean(axis=2) / 255.0
    half_h, half_w = max(h // 2, 1), max(w // 2, 1)
    grad = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
    feats = np.array(
        [
            np.log1p(w),
            np.log1p(h),
            float(c),
            gray.mean(),
            gray.std(),
            gray[:half_h, :half_w].mean(),
            gray[h - half_h :, w - half_w :].mean(),
            grad,
        ],
        dtype=np.float32,
    )
    return feats[:dim]
