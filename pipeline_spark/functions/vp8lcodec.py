"""Native WebP-lossless (VP8L) codec — stdlib + numpy, written against
the PUBLIC spec (WebP Lossless Bitstream Specification / RFC 9649).

Decoder: RIFF/VP8X container walk, LSB-first bit reading, canonical
prefix codes (simple 1-2 symbol and normal forms, code-length codes with
16/17/18 repeats and the max_symbol short-circuit), meta prefix images,
color cache, LZ77 backward references with the 2D distance mapping, and
all four transforms inverted in reverse order: PREDICTOR (14 modes),
COLOR (signed 3.5 fixed-point cross-channel deltas), SUBTRACT_GREEN,
COLOR_INDEXING (palette + sub-byte pixel packing).

Encoder: a real spec-shaped VP8L writer — per-channel canonical prefix
codes (Huffman with a balanced complete-code fallback, single/double
symbol channels collapse to the 0-/1-bit simple form), literal-only
entropy image, correct RIFF framing — so the decoder round-trips
arbitrary RGBA images fixture-free (the jpegcodec/flaccodec pattern).

Scale posture: runs clip-at-a-time inside Arrow-batched mapInPandas via
the multimodal transform; the entropy loop is per-pixel Python, sized
for thumbnail/feature extraction, with transform inversion vectorized.

Lossy VP8 (arithmetic-coded) still gates on Pillow with an actionable
error — see imagecodec.decode_image.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    pass


# code-length code symbol order (spec section "Decoding the Code Lengths")
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _distance_map() -> list[tuple[int, int]]:
    """The spec's 120-entry (dx, dy) neighborhood for distance codes
    1..120: dy 0..7 (dx 1..8 on the current row, -7..8 above), ordered
    by squared distance, then larger dy, then positive dx first."""
    cand = [(dx, 0) for dx in range(1, 9)]
    cand += [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0] if p[0] > 0 else -p[0] + 0.5))
    return cand


_DIST_MAP = _distance_map()


class _BitReader:
    """LSB-first bit reader (VP8L convention, same as DEFLATE)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0        # absolute bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise WebpError("vp8l: truncated stream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _PrefixCode:
    """Canonical prefix code: DEFLATE-style canonical assignment, codes
    transmitted MSB-first (one tree step per bit read)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        used = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise WebpError("vp8l: empty prefix code")
        if len(used) == 1:
            self.single = used[0][0]
            self.table = {}
            return
        self.single = None
        # Kraft check: the code must be complete
        if sum(1 << (15 - l) for _, l in used) != 1 << 15:
            raise WebpError("vp8l: prefix code lengths not complete")
        bl_count: dict[int, int] = {}
        for _, l in used:
            bl_count[l] = bl_count.get(l, 0) + 1
        code = 0
        next_code = {}
        for l in range(1, max(bl_count) + 1):
            code = (code + bl_count.get(l - 1, 0)) << 1
            next_code[l] = code
        self.table = {}
        for s, l in used:
            self.table[(l, next_code[l])] = s
            next_code[l] += 1

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((l, code))
            if sym is not None:
                return sym
        raise WebpError("vp8l: invalid prefix code word")


def _simple_code(br: _BitReader) -> _PrefixCode:
    num_symbols = br.read(1) + 1
    first_8bits = br.read(1)
    sym0 = br.read(8 if first_8bits else 1)
    lengths_map = {sym0: 1}
    if num_symbols == 2:
        sym1 = br.read(8)
        lengths_map[sym1] = 1
    size = max(lengths_map) + 1
    lengths = [lengths_map.get(i, 0) for i in range(size)]
    if num_symbols == 1:
        pc = _PrefixCode.__new__(_PrefixCode)
        pc.single = sym0
        pc.table = {}
        return pc
    return _PrefixCode(lengths)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):
        return _simple_code(br)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # max_symbol short-circuit
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = min(3 + br.read(2), alphabet_size - sym)
            lengths[sym : sym + rep] = [prev] * rep
            sym += rep
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _PrefixCode(lengths)


def _lz77_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (spec: 1..4 direct, then
    (2 + code&1) << extra + extra bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, top_level: bool
) -> np.ndarray:
    """Spatially-coded ARGB image → uint32 array [h*w] (scanline order)."""
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError(f"vp8l: invalid color cache bits {cache_bits}")
        cache = [0] * (1 << cache_bits)
    meta = None
    meta_bits = 0
    n_groups = 1
    if top_level and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_entropy_image(br, mw, mh, False)
        meta = ((meta_px >> 8) & 0xFFFF).astype(np.int64)  # (red<<8)|green
        n_groups = int(meta.max()) + 1
    cache_syms = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, 256 + 24 + cache_syms),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        ))
    out = np.zeros(w * h, dtype=np.uint32)
    n = w * h
    i = 0
    mw = (w + (1 << meta_bits) - 1) >> meta_bits if meta is not None else 0
    while i < n:
        if meta is not None:
            x, y = i % w, i // w
            g = groups[int(meta[(y >> meta_bits) * mw + (x >> meta_bits)])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[i] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            i += 1
        elif s < 280:
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(g[4].read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > i or i + length > n:
                raise WebpError("vp8l: backward reference out of range")
            for _ in range(length):
                px = int(out[i - dist])
                out[i] = px
                if cache is not None:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                i += 1
        else:
            if cache is None:
                raise WebpError("vp8l: cache symbol without color cache")
            out[i] = cache[s - 280]
            i += 1
    return out


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _apply_predictor_inverse(
    px: np.ndarray, w: int, h: int, modes: np.ndarray, bits: int
) -> np.ndarray:
    """Inverse predictor transform, pixel-sequential (rows depend on the
    previous row).  px: int32 [h, w, 4] residuals (a, r, g, b)."""
    mw = (w + (1 << bits) - 1) >> bits
    out = np.zeros((h, w, 4), dtype=np.int32)

    def clamp(v):
        return np.clip(v, 0, 255)

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # rightmost column: top-right wraps to the leftmost pixel
                # of the current row (spec boundary rule)
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                m = int(modes[(y >> bits) * mw + (x >> bits)])
                if m == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int32)
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif m == 6:
                    pred = _avg2(L, TL)
                elif m == 7:
                    pred = _avg2(L, T)
                elif m == 8:
                    pred = _avg2(TL, T)
                elif m == 9:
                    pred = _avg2(T, TR)
                elif m == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif m == 11:  # Select
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = L if pl < pt else T
                elif m == 12:  # ClampAddSubtractFull
                    pred = clamp(L + T - TL)
                elif m == 13:  # ClampAddSubtractHalf
                    ave = _avg2(L, T)
                    d = ave - TL
                    # C-style truncating division (the spec's `/ 2`)
                    pred = clamp(ave + np.sign(d) * (np.abs(d) // 2))
                else:
                    raise WebpError(f"vp8l: predictor mode {m}")
            out[y, x] = (px[y, x] + pred) & 0xFF
    return out


def _apply_color_inverse(
    px: np.ndarray, w: int, h: int, elems: np.ndarray, bits: int
) -> np.ndarray:
    """Inverse color transform: per-block signed 3.5 fixed-point deltas
    (green_to_red in blue channel, green_to_blue in green, red_to_blue
    in red of the transform element pixel)."""
    mw = (w + (1 << bits) - 1) >> bits
    ys, xs = np.mgrid[0:h, 0:w]
    idx = (ys >> bits) * mw + (xs >> bits)
    te = elems[idx]                       # uint32 per pixel
    g2r = ((te >> 0) & 0xFF).astype(np.int8).astype(np.int32)
    g2b = ((te >> 8) & 0xFF).astype(np.int8).astype(np.int32)
    r2b = ((te >> 16) & 0xFF).astype(np.int8).astype(np.int32)
    a, r, g, b = (px[..., i].astype(np.int32) for i in range(4))
    gs = g.astype(np.int8).astype(np.int32)
    r = (r + ((g2r * gs) >> 5)) & 0xFF
    rs = r.astype(np.int8).astype(np.int32)
    b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return np.stack([a, r, g, b], axis=-1)


def _to_argb_array(flat: np.ndarray, w: int, h: int) -> np.ndarray:
    """uint32 pixels → int32 [h, w, 4] as (a, r, g, b)."""
    a = (flat >> 24) & 0xFF
    r = (flat >> 16) & 0xFF
    g = (flat >> 8) & 0xFF
    b = flat & 0xFF
    return np.stack([a, r, g, b], axis=-1).astype(np.int32).reshape(h, w, 4)


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload → uint8 RGBA array [h, w, 4]."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise WebpError("vp8l: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise WebpError("vp8l: unsupported version")

    transforms = []
    seen = set()
    palette = None
    packed_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise WebpError("vp8l: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            bits = br.read(3) + 2
            mw = (packed_w + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, mw, mh, False)
            transforms.append(("predictor", bits, (sub >> 8) & 0xFF))
        elif ttype == 1:  # COLOR
            bits = br.read(3) + 2
            mw = (packed_w + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, mw, mh, False)
            transforms.append(("color", bits, sub))
        elif ttype == 2:
            transforms.append(("subtract_green",))
        else:  # COLOR_INDEXING
            pal_size = br.read(8) + 1
            pal_px = _decode_entropy_image(br, pal_size, 1, False)
            # palette entries are component-wise delta-coded
            pal = np.zeros(pal_size, dtype=np.uint32)
            prev = 0
            for i in range(pal_size):
                cur = 0
                for shift in (0, 8, 16, 24):
                    c = ((int(pal_px[i]) >> shift) + (prev >> shift)) & 0xFF
                    cur |= c << shift
                pal[i] = cur
                prev = cur
            palette = pal
            if pal_size <= 2:
                idx_bits = 3
            elif pal_size <= 4:
                idx_bits = 2
            elif pal_size <= 16:
                idx_bits = 1
            else:
                idx_bits = 0
            packed_w = (w + (1 << idx_bits) - 1) >> idx_bits
            transforms.append(("color_indexing", idx_bits))

    flat = _decode_entropy_image(br, packed_w, h, True)
    px = _to_argb_array(flat, packed_w, h)

    for t in reversed(transforms):
        if t[0] == "color_indexing":
            idx_bits = t[1]
            if idx_bits:
                per = 1 << idx_bits           # packed pixels per byte
                bitw = 8 >> idx_bits          # bits per index
                greens = px[..., 2]
                idx = np.zeros((h, w), dtype=np.int64)
                for k in range(per):
                    cols = np.arange(k, w, per)
                    src = greens[:, (cols // per)]
                    idx[:, cols] = (src >> (k * bitw)) & ((1 << bitw) - 1)
            else:
                idx = px[..., 2].astype(np.int64)
            if int(idx.max()) >= len(palette):
                raise WebpError("vp8l: palette index out of range")
            flat2 = palette[idx.reshape(-1)]
            px = _to_argb_array(flat2, w, h)
        elif t[0] == "subtract_green":
            g = px[..., 2]
            px[..., 1] = (px[..., 1] + g) & 0xFF
            px[..., 3] = (px[..., 3] + g) & 0xFF
        elif t[0] == "color":
            px = _apply_color_inverse(px, px.shape[1], h, t[2], t[1])
        else:  # predictor
            px = _apply_predictor_inverse(px, px.shape[1], h, t[2], t[1])

    a, r, g, b = (px[..., i] for i in range(4))
    return np.stack([r, g, b, a], axis=-1).astype(np.uint8)


def decode_webp(data: bytes) -> np.ndarray:
    """WebP container bytes → uint8 RGBA [h, w, 4] for lossless files;
    lossy VP8 and animations gate with actionable errors."""
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        pos = 12
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + size]
            if cid == b"VP8L":
                return decode_vp8l(body)
            if cid == b"VP8 ":
                raise NotImplementedError(
                    "webp: lossy VP8 needs Pillow (arithmetic-coded); "
                    "only lossless VP8L decodes natively"
                )
            if cid == b"ANIM":
                raise NotImplementedError(
                    "webp: animations need Pillow/ffmpeg"
                )
            pos += 8 + size + (size & 1)
        raise WebpError("webp: no VP8L/VP8 chunk found")
    if data[:1] == b"\x2f":
        return decode_vp8l(data)  # bare VP8L stream
    raise WebpError("webp: not a RIFF/WEBP container")


# ----------------------------------------------------------------- encoder


class _BitWriter:
    """LSB-first bit writer."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.cur |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix code words transmit MSB-first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append(self.cur & 0xFF)
        return bytes(out)


def _huff_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Huffman code lengths; falls back to a balanced complete code if
    the tree exceeds max_len (valid, slightly suboptimal)."""
    import heapq

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    i = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, s1 + s2))
        i += 1
    if max(depth.values()) <= max_len:
        return depth
    # balanced complete code: n1 symbols at L-1, rest at L
    k = len(syms)
    L = max(1, (k - 1).bit_length())
    n1 = (1 << L) - k
    ordered = sorted(syms, key=lambda s: -freqs[s])
    return {
        s: (L - 1 if i < n1 else L) for i, s in enumerate(ordered)
    }


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    bl_count: dict[int, int] = {}
    for l in lengths.values():
        bl_count[l] = bl_count.get(l, 0) + 1
    code = 0
    next_code = {}
    for l in range(1, max(bl_count) + 1):
        code = (code + bl_count.get(l - 1, 0)) << 1
        next_code[l] = code
    out = {}
    for s in sorted(lengths):
        l = lengths[s]
        out[s] = (next_code[l], l)
        next_code[l] += 1
    return out


def _write_prefix_code(bw: _BitWriter, lengths: dict[int, int], alphabet: int):
    """Emit one prefix code: the 0-/1-/2-symbol simple form when
    possible, else the normal code-length-coded form."""
    syms = sorted(lengths)
    if len(syms) <= 2 and max(syms) < 256:
        bw.write(1, 1)                     # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] >= 2 or len(syms) == 2:
            bw.write(1, 1)                 # first symbol in 8 bits
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)                         # normal
    full = [lengths.get(s, 0) for s in range(alphabet)]
    # trim trailing zeros; transmit the tail via an 18-repeat implicitly
    cl_freq: dict[int, int] = {}
    for l in full:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths = _huff_lengths(cl_freq, 7)
    # num_code_lengths must cover every used code-length symbol's slot
    # in the fixed transmission order
    used_pos = [i for i, s in enumerate(_CL_ORDER) if s in cl_lengths]
    num_cl = max(4, max(used_pos) + 1)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(0, 1)                         # no max_symbol shortcut
    for l in full:
        c, n = cl_codes[l]
        bw.write_code(c, n)


def encode_vp8l(img: np.ndarray) -> bytes:
    """uint8 RGBA [h, w, 4] → VP8L payload (literal-only entropy image,
    per-channel canonical prefix codes, no transforms)."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.stack([img] * 3 + [np.full_like(img, 255)], axis=-1)
    if img.shape[2] == 3:
        img = np.concatenate(
            [img, np.full((h, w, 1), 255, dtype=img.dtype)], axis=2
        )
    r = img[..., 0].astype(np.int64).ravel()
    g = img[..., 1].astype(np.int64).ravel()
    b = img[..., 2].astype(np.int64).ravel()
    a = img[..., 3].astype(np.int64).ravel()

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int(bool((a != 255).any())), 1)
    bw.write(0, 3)        # version
    bw.write(0, 1)        # no transforms
    bw.write(0, 1)        # no color cache
    bw.write(0, 1)        # no meta prefix image

    channels = []
    for vals, alphabet in ((g, 256 + 24), (r, 256), (b, 256), (a, 256)):
        freqs: dict[int, int] = {}
        for v in vals.tolist():
            freqs[v] = freqs.get(v, 0) + 1
        lengths = _huff_lengths(freqs, 15)
        _write_prefix_code(bw, lengths, alphabet)
        channels.append(
            _canonical_codes(lengths) if len(lengths) > 1
            else {next(iter(lengths)): (0, 0)}
        )
    _write_prefix_code(bw, {0: 1}, 40)  # distance code: unused single sym

    gc, rc, bc, ac = channels
    for i in range(len(g)):
        for codes, v in ((gc, g[i]), (rc, r[i]), (bc, b[i]), (ac, a[i])):
            c, n = codes[int(v)]
            if n:
                bw.write_code(c, n)
    return bw.bytes()


def encode_webp(img: np.ndarray) -> bytes:
    """uint8 RGBA/RGB/gray array → lossless WebP container bytes."""
    payload = encode_vp8l(img)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
