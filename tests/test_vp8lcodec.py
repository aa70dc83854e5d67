"""WebP VP8L codec: encoder round-trips plus hand-built streams (via the
codec's LSB-first bit writer) exercising the decode paths the encoder
never emits — LZ77 backward references, the 2D distance map, color
cache, subtract-green, predictor and color-indexing transforms, meta
prefix images — with expected pixels computed independently."""

import numpy as np
import pytest

from pipeline_spark.functions.vp8lcodec import (
    _BitWriter,
    WebpError,
    decode_vp8l,
    decode_webp,
    encode_webp,
)


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _single_symbol_code(bw, sym):
    """Simple prefix code with one symbol → zero bits per read."""
    bw.write(1, 1)          # simple
    bw.write(0, 1)          # 1 symbol
    if sym < 2:
        bw.write(0, 1)
        bw.write(sym, 1)
    else:
        bw.write(1, 1)
        bw.write(sym, 8)


def _two_symbol_code(bw, s0, s1):
    """Simple 2-symbol code: canonically the smaller symbol reads as bit
    0, the larger as bit 1."""
    bw.write(1, 1)
    bw.write(1, 1)          # 2 symbols
    bw.write(1, 1)          # first in 8 bits
    bw.write(s0, 8)
    bw.write(s1, 8)


def test_lz77_backward_reference_1d():
    """Two literal pixels then two length-3 copies at distance 2
    (distance code 122 → the >120 literal-distance path)."""
    w, h = 4, 2
    # green alphabet {10, 20, 258}: 258 → length code 2 → length 3;
    # lengths 10→1, 20→2, 258→2; code-length code covers cl syms {0,1,2}
    lengths = {10: 1, 20: 2, 258: 2}
    # canonical cl codes (cl lengths 0→1, 1→2, 2→2): 0→"0", 1→"10", 2→"11"
    CL = {0: (0, 1), 1: (2, 2), 2: (3, 2)}
    bw2 = _BitWriter()
    _header(bw2, w, h)
    bw2.write(0, 1); bw2.write(0, 1); bw2.write(0, 1)
    bw2.write(0, 1)            # normal code
    num_cl = 8                 # order [17,18,0,1,2,3,4,5] covers 0,1,2
    bw2.write(num_cl - 4, 4)
    for sym_cl in [17, 18, 0, 1, 2, 3, 4, 5]:
        bw2.write({0: 1, 1: 2, 2: 2}.get(sym_cl, 0), 3)
    bw2.write(0, 1)            # no max_symbol
    for sym in range(280):
        c, n = CL[lengths.get(sym, 0)]
        bw2.write_code(c, n)
    _single_symbol_code(bw2, 0)
    _single_symbol_code(bw2, 0)
    _single_symbol_code(bw2, 255)
    # distance SYMBOL 13 expands like a length code: offset (3<<5)=96,
    # 5 extra bits → value 97+extra; extra 25 → distance_code 122 →
    # literal distance 2
    _single_symbol_code(bw2, 13)
    # canonical literal codes: 10→"0", 20→"10", 258→"11"
    G = {10: (0, 1), 20: (2, 2), 258: (3, 2)}
    bw2.write_code(*G[10])          # literal green 10
    bw2.write_code(*G[20])          # literal green 20
    bw2.write_code(*G[258])         # copy: length code 2 → length 3
    bw2.write(25, 5)                # distance extra bits
    bw2.write_code(*G[258])         # copy again → length 3
    bw2.write(25, 5)
    img = decode_vp8l(bw2.bytes())
    greens = img[..., 1].ravel().tolist()
    assert greens == [10, 20, 10, 20, 10, 20, 10, 20]
    assert np.all(img[..., 3] == 255)


def test_distance_map_neighborhood():
    """Distance code 1 maps to the pixel directly ABOVE (dx=0, dy=1)."""
    w, h = 3, 2
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    # green alphabet {5, 6, 7, 257}: 257 → length code 1 → length 2
    lengths = {5: 2, 6: 2, 7: 2, 257: 2}
    # cl symbols used: {0, 2}: lengths 1 and 1 → codes 0, 1
    bw.write(0, 1)
    bw.write(8 - 4, 4)
    for sym_cl in [17, 18, 0, 1, 2, 3, 4, 5]:
        bw.write({0: 1, 2: 1}.get(sym_cl, 0), 3)
    bw.write(0, 1)
    CL = {0: (0, 1), 2: (1, 1)}
    for sym in range(280):
        c, n = CL[2 if sym in lengths else 0]
        bw.write_code(c, n)
    _single_symbol_code(bw, 0)
    _single_symbol_code(bw, 0)
    _single_symbol_code(bw, 255)
    _single_symbol_code(bw, 0)      # dist sym 0 → code 1 → map (0,1) → w
    G = {5: (0, 2), 6: (1, 2), 7: (2, 2), 257: (3, 2)}
    for s in (5, 6, 7):             # first row literals
        bw.write_code(*G[s])
    bw.write_code(*G[5])            # (0,1) literal
    bw.write_code(*G[257])          # copy len 2 from distance w → above
    img = decode_vp8l(bw.bytes())
    assert img[..., 1].tolist() == [[5, 6, 7], [5, 6, 7]]


def test_color_cache_hit():
    """A literal inserts into the cache; the cache symbol replays it."""
    w, h = 3, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(1, 1)          # color cache present
    bw.write(1, 4)          # cache_bits = 1 (2 entries)
    bw.write(0, 1)          # no meta
    # pixel = a=255 r=0 g=9 b=0 → argb 0xFF000900
    px = 0xFF000900
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> 31
    # green alphabet 256+24+2: symbols {9, 280+idx}
    cache_sym = 280 + idx
    _two_symbol_code_large(bw, 9, cache_sym, 256 + 24 + 2)
    _single_symbol_code(bw, 0)
    _single_symbol_code(bw, 0)
    _single_symbol_code(bw, 255)
    _single_symbol_code(bw, 0)      # distance (unused)
    # canonical: 9 < cache_sym → 9 reads as 0, cache as 1
    bw.write(0, 1)                  # literal green 9
    bw.write(1, 1)                  # cache hit
    bw.write(1, 1)                  # cache hit again
    img = decode_vp8l(bw.bytes())
    assert img[..., 1].ravel().tolist() == [9, 9, 9]


def _two_symbol_code_large(bw, s0, s1, alphabet):
    """Normal-form prefix code for two symbols when one exceeds 255
    (simple form caps symbols at 8 bits); every alphabet slot's length
    is transmitted (no max_symbol shortcut)."""
    lengths = {s0: 1, s1: 1}
    bw.write(0, 1)
    bw.write(8 - 4, 4)
    for sym_cl in [17, 18, 0, 1, 2, 3, 4, 5]:
        bw.write({0: 1, 1: 1}.get(sym_cl, 0), 3)
    bw.write(0, 1)
    CL = {0: (0, 1), 1: (1, 1)}
    for sym in range(alphabet):
        c, n = CL[lengths.get(sym, 0)]
        bw.write_code(c, n)


def test_subtract_green_transform():
    w, h = 2, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)          # transform present
    bw.write(2, 2)          # SUBTRACT_GREEN
    bw.write(0, 1)          # no more transforms
    bw.write(0, 1); bw.write(0, 1)  # no cache, no meta
    _single_symbol_code(bw, 50)     # green = 50
    _single_symbol_code(bw, 10)     # red residual = 10
    _single_symbol_code(bw, 250)    # blue residual = 250 (wraps)
    _single_symbol_code(bw, 255)
    _single_symbol_code(bw, 1)
    img = decode_vp8l(bw.bytes())
    # red = 10+50 = 60; blue = (250+50) & 255 = 44
    assert img[0, 0].tolist() == [60, 50, 44, 255]


def test_predictor_transform_left_mode():
    """Predictor mode 1 (= left): residuals accumulate across the row.
    Pixel (0,0) predicts black (a=255), first row then uses left."""
    w, h = 4, 1
    bw2 = _BitWriter()
    _header(bw2, w, h)
    bw2.write(1, 1)
    bw2.write(0, 2)
    bw2.write(2, 3)
    bw2.write(0, 1)                  # sub-image: no color cache
    _single_symbol_code(bw2, 1)      # green = mode 1
    _single_symbol_code(bw2, 0)
    _single_symbol_code(bw2, 0)
    _single_symbol_code(bw2, 0)
    _single_symbol_code(bw2, 1)
    bw2.write(0, 1)                  # end of transforms
    bw2.write(0, 1); bw2.write(0, 1)  # main: no cache, no meta
    _two_symbol_code(bw2, 3, 10)     # greens: residuals
    _single_symbol_code(bw2, 0)
    _single_symbol_code(bw2, 0)
    _single_symbol_code(bw2, 0)      # alpha residual 0
    _single_symbol_code(bw2, 1)
    # residual greens: 10, 3, 3, 3 → canonical: 3→bit0, 10→bit1
    bw2.write(1, 1)
    bw2.write(0, 1)
    bw2.write(0, 1)
    bw2.write(0, 1)
    img = decode_vp8l(bw2.bytes())
    # (0,0): pred black → g = 10, a = 0+255 = 255
    # then left: g accumulates 10,13,16,19
    assert img[..., 1].ravel().tolist() == [10, 13, 16, 19]
    assert np.all(img[..., 3] == 255)


def test_color_indexing_packed():
    """4-color palette → 2 packed indices per green byte (1<<1 pixels)."""
    w, h = 6, 1
    palette = [0xFF000000, 0xFF00FF00, 0xFFFF0000, 0xFF0000FF]
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)          # COLOR_INDEXING
    bw.write(len(palette) - 1, 8)
    # palette image (4x1), delta-coded: entries as literals
    deltas = []
    prev = 0
    for p in palette:
        d = 0
        for sh in (0, 8, 16, 24):
            d |= (((p >> sh) - (prev >> sh)) & 0xFF) << sh
        deltas.append(d)
        prev = p
    bw.write(0, 1)          # palette sub-image: no cache
    # greens of deltas
    gs = [(d >> 8) & 0xFF for d in deltas]
    rs = [(d >> 16) & 0xFF for d in deltas]
    bs = [d & 0xFF for d in deltas]
    as_ = [(d >> 24) & 0xFF for d in deltas]
    _write_literal_channels(bw, gs, rs, bs, as_)
    bw.write(0, 1)          # end transforms
    # 4-color palette → idx_bits 2: FOUR 2-bit indices per green byte,
    # packed width ceil(6/4)=2; pixels 0,1,2,3,0,1 → greens
    # 0|1<<2|2<<4|3<<6 = 228, 0|1<<2 = 4
    bw.write(0, 1); bw.write(0, 1)
    _write_literal_channels(bw, [228, 4], [0, 0], [0, 0], [255, 255])
    img = decode_vp8l(bw.bytes())
    expect = [palette[i] for i in (0, 1, 2, 3, 0, 1)]
    got = [
        (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for r, g, b, a in img.reshape(-1, 4)
    ]
    assert got == expect


def _canonical(lengths):
    """DEFLATE canonical codes for a {symbol: length>0} map."""
    bl = {}
    for l in lengths.values():
        bl[l] = bl.get(l, 0) + 1
    code = 0
    nxt = {}
    for l in range(1, max(bl) + 1):
        code = (code + bl.get(l - 1, 0)) << 1
        nxt[l] = code
    out = {}
    for s in sorted(lengths):
        out[s] = (nxt[lengths[s]], lengths[s])
        nxt[lengths[s]] += 1
    return out


def _write_literal_channels(bw, gs, rs, bs, as_):
    """Write 4 channel prefix codes + per-pixel literals for tiny
    hand-built images (any distinct-count per channel)."""
    plans = []
    for vals, alphabet in ((gs, 280), (rs, 256), (bs, 256), (as_, 256)):
        uniq = sorted(set(vals))
        if len(uniq) == 1:
            _single_symbol_code(bw, uniq[0])
            plans.append({uniq[0]: (0, 0)})
        elif len(uniq) == 2:
            _two_symbol_code(bw, uniq[0], uniq[1])
            plans.append({uniq[0]: (0, 1), uniq[1]: (1, 1)})
        else:
            # normal code: all uniq at equal depth L (complete via
            # balanced split)
            k = len(uniq)
            L = max(1, (k - 1).bit_length())
            n1 = (1 << L) - k
            lengths = {
                s: (L - 1 if i < n1 else L) for i, s in enumerate(uniq)
            }
            bw.write(0, 1)
            used = sorted(set(lengths.values()) | {0})
            ku = len(used)
            Lc = max(1, (ku - 1).bit_length())
            n1c = (1 << Lc) - ku
            cl_lengths = {
                s: (Lc - 1 if i < n1c else Lc) for i, s in enumerate(used)
            }
            order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
                     12, 13, 14, 15]
            num_cl = max(
                4, max(i for i, s in enumerate(order) if s in cl_lengths) + 1
            )
            bw.write(num_cl - 4, 4)
            for i in range(num_cl):
                bw.write(cl_lengths.get(order[i], 0), 3)
            bw.write(0, 1)
            cl_codes = _canonical(cl_lengths)
            for sym in range(alphabet):
                c, n = cl_codes[lengths.get(sym, 0)]
                bw.write_code(c, n)
            plans.append(_canonical(lengths))
    _single_symbol_code(bw, 0)      # distance code (unused, 0 bits)
    for i in range(len(gs)):
        for plan, vals in zip(plans, (gs, rs, bs, as_)):
            c, n = plan[vals[i]]
            if n:
                bw.write_code(c, n)


def test_encoder_roundtrips():
    rng = np.random.RandomState(3)
    for shape in [(1, 1, 4), (7, 13, 4), (16, 16, 4)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(decode_webp(encode_webp(img)), img)


def test_container_and_gates():
    with pytest.raises(WebpError, match="RIFF"):
        decode_webp(b"nonsense")
    img = np.zeros((2, 2, 4), dtype=np.uint8)
    enc = bytearray(encode_webp(img))
    enc[12:16] = b"VP8 "  # pretend lossy
    with pytest.raises(NotImplementedError, match="VP8L|Pillow|lossless"):
        decode_webp(bytes(enc))


def test_imagecodec_dispatch():
    from pipeline_spark.functions.imagecodec import decode_image

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (9, 11, 4)).astype(np.uint8)
    out = decode_image(encode_webp(img))
    assert np.array_equal(out, img)


def test_meta_prefix_image_two_groups():
    """A meta prefix image splits the canvas into blocks with separate
    prefix-code groups: left block decodes green 11, right green 22."""
    w, h = 8, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)          # no transforms
    bw.write(0, 1)          # no color cache
    bw.write(1, 1)          # meta prefix present
    bw.write(0, 3)          # meta_bits = 2 → blocks of 4 → 2 blocks
    # meta sub-image 2x1: green = group index (0, 1), red = 0
    bw.write(0, 1)          # sub-image: no cache
    _two_symbol_code(bw, 0, 1)      # greens 0/1
    _single_symbol_code(bw, 0)
    _single_symbol_code(bw, 0)
    _single_symbol_code(bw, 255)
    _single_symbol_code(bw, 0)
    bw.write(0, 1)                  # meta pixel 0: group 0
    bw.write(1, 1)                  # meta pixel 1: group 1
    # group 0 codes: green 11 only
    _single_symbol_code(bw, 11)
    _single_symbol_code(bw, 0)
    _single_symbol_code(bw, 0)
    _single_symbol_code(bw, 255)
    _single_symbol_code(bw, 0)
    # group 1 codes: green 22 only
    _single_symbol_code(bw, 22)
    _single_symbol_code(bw, 0)
    _single_symbol_code(bw, 0)
    _single_symbol_code(bw, 255)
    _single_symbol_code(bw, 0)
    # all pixel reads consume zero bits (single-symbol codes everywhere)
    img = decode_vp8l(bw.bytes())
    assert img[..., 1].ravel().tolist() == [11, 11, 11, 11, 22, 22, 22, 22]
