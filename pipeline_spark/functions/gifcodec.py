"""GIF codec — stdlib + numpy, written from the public GIF89a specification.

Completes the native image family (PNG/BMP/JPEG) and gives the
multimodal ``frame_sample`` op its first REAL path: GIF is the one
animation format decodable without ffmpeg/pyav.  Implements LZW
decompression (variable code width, clear/EOI codes), global/local
color tables, interlacing, transparency, and frame composition with
disposal methods 0-3, plus an LZW encoder so round-trip tests need no
external fixture generator.

Scale posture: per-clip decode inside Arrow-batched mapInPandas; LZW is
a Python loop over codes (fine for thumbnail/preview scale — the
contract point is the Spark plumbing, identical if a C codec lands).
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


# ---------------------------------------------------------------- LZW


def lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable width codes LSB-first, CLEAR/EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width, next_code
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        next_code = eoi + 1

    width = 0
    next_code = 0
    reset()
    acc = 0
    nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]
            else:
                raise GifError(f"gif: LZW code {code} out of range")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + [entry[0]])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    buf: tuple[int, ...] = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        buf = (idx,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decoder

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """GIF bytes → [(delay_ms, RGB uint8 array)] composed frames."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("gif: bad signature")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            n = data[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            chunks.append(data[p : p + n])
            p += n

    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 4:  # graphics control
                gflags, delay_cs, tidx = struct.unpack("<BHB", body[:4])
                disposal = (gflags >> 2) & 0x07
                transparent = tidx if gflags & 0x01 else None
                delay_ms = delay_cs * 10
            continue
        if b != 0x2C:
            raise GifError(f"gif: unexpected block 0x{b:02x}")
        # image descriptor
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise GifError("gif: no color table")
        min_code = data[pos]
        pos += 1
        blob, pos = read_subblocks(pos)
        idx = np.array(lzw_decode(blob, min_code), dtype=np.int32)[: iw * ih]
        if len(idx) < iw * ih:
            idx = np.pad(idx, (0, iw * ih - len(idx)))
        grid = np.empty((ih, iw), dtype=np.int32)
        if iflags & 0x40:  # interlaced
            rows = iter(idx.reshape(ih, iw))
            for start, step in _INTERLACE_PASSES:
                for y in range(start, ih, step):
                    grid[y] = next(rows)
        else:
            grid = idx.reshape(ih, iw)

        before = canvas.copy()
        region = canvas[iy : iy + ih, ix : ix + iw]
        colors = table[np.clip(grid, 0, len(table) - 1)]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = colors[mask]
        else:
            region[:, :] = colors
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore region to background color
            fill = table[bg] if bg < len(table) else np.zeros(3, dtype=np.uint8)
            canvas[iy : iy + ih, ix : ix + iw] = fill
        elif disposal == 3:  # restore canvas to the pre-draw state
            canvas = before
        # disposal 0/1: leave the composed frame in place
        transparent = None
        disposal = 0
    if not frames:
        raise GifError("gif: no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First composed frame as RGB — the still-image entry point."""
    return decode_gif_frames(data)[0][1]


# ------------------------------------------------------------- encoder


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    delays_ms: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """RGB frame(s) → GIF89a with a per-image adaptive palette (≤256
    distinct colors per frame; raises beyond — this is a fixture/test
    encoder, not a quantizer)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    delays_ms = delays_ms or [100] * len(frames)
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x00, 0, 0)  # no GCT
    for frame, delay in zip(frames, delays_ms):
        frame = np.asarray(frame, dtype=np.uint8)
        if frame.shape[:2] != (h, w):
            raise GifError("gif: all frames must share dimensions")
        flat = frame.reshape(-1, 3)
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise GifError("gif encoder: >256 distinct colors (no quantizer)")
        bits = max(1, int(len(palette) - 1).bit_length())
        size_field = bits - 1
        padded = np.zeros((2 << size_field, 3), dtype=np.uint8)
        padded[: len(palette)] = palette
        # graphics control (delay)
        out += b"\x21\xf9" + bytes([4]) + struct.pack("<BHB", 0, delay // 10, 0) + b"\x00"
        iflags = 0x80 | size_field | (0x40 if interlace else 0)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        out += padded.tobytes()
        grid = inverse.reshape(h, w)
        if interlace:
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(grid[y] for y in range(start, h, step))
            grid = np.stack(rows)
        min_code = max(2, bits)
        blob = lzw_encode([int(v) for v in grid.reshape(-1)], min_code)
        out += bytes([min_code])
        for i in range(0, len(blob), 255):
            chunk = blob[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
