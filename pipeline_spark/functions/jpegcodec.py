"""Baseline JPEG codec — pure numpy, written from the public ITU T.81 spec.

Extends the zero-dependency image family (imagecodec.py: PNG/BMP) with
the dominant interchange formats: baseline sequential DCT (SOF0) AND
progressive DCT (SOF2, full successive approximation - T.81 G.1/G.2), Huffman
entropy coding, 8-bit YCbCr/grayscale, chroma subsampling (1x1/2x1/
1x2/2x2), restart markers.  The encoder writes JFIF baseline with the
T.81 Annex K quantization + Huffman tables (libjpeg quality scaling),
optionally 4:2:0 subsampled, so the decoder's subsampling/upsampling
path is exercised without any external fixture generator.

Honest gates: arithmetic coding, 12-bit precision
and CMYK raise with actionable messages (decode falls back to Pillow
when installed — imagecodec._pil_decode).

Scale posture: runs inside Arrow-batched Pandas UDFs (multimodal
decode), one image per call; decode's dequant+IDCT+color path is ONE
einsum over all blocks (shared by baseline and progressive), leaving
only the bit-level Huffman layer in Python — fine for metadata/feature
extraction at pipeline scale, and the contract point (schema,
batching, partitioning) is identical if a C codec replaces it.
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Figure A.6 zigzag order: zz index -> (row, col) flat index
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 luminance / K.2 chrominance quantization tables (zigzag order)
_QUANT_LUMA = np.array([
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101, 103, 99,
])
_QUANT_CHROMA = np.array([
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal DCT-II basis: block_dct = T @ B @ T.T
_T = np.array([
    [np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8) * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])


class JpegError(ValueError):
    pass


# ------------------------------------------------------------- Huffman


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, canonical per T.81 Annex C."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code_length, code)."""
    return {v: k for k, v in _build_decode_table(bits, huffval).items()}


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing and
    RSTn awareness (T.81 B.1.1.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # EOI or next segment while bits still requested: pad (spec
                # allows 1-bits padding at scan end)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume the pending RSTn marker and byte-align."""
        self.acc = 0
        self.nbits = 0
        self.pos += 2

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("jpeg: invalid huffman code")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ------------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise JpegError("jpeg: missing SOI marker")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0x0F
                s += 1
                if pq:
                    raise JpegError("jpeg: 16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(seg[s : s + 64], dtype=np.uint8).astype(np.int32)
                s += 64
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0x0F
                bits = list(seg[s + 1 : s + 17])
                n = sum(bits)
                huffval = list(seg[s + 17 : s + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, huffval)
                s += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext sequential / progressive
            precision, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise JpegError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
            if frame["progressive"]:
                prog_coef = _prog_coef_init(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: arithmetic/lossless/hierarchical modes unsupported by the "
                "native decoder (install Pillow for these)"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0x0F))
            if not frame["progressive"]:
                return _decode_scan(
                    data, pos + seglen, frame, scan, qtables, htables, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_prog_scan(
                data, pos + seglen, frame, scan, htables, restart_interval,
                prog_coef, ss, se, ahal >> 4, ahal & 0x0F,
            )
            continue
        pos += seglen
    if frame is not None and frame.get("progressive"):
        return _render_coefs(frame, prog_coef, qtables)
    raise JpegError("jpeg: no scan data found")


def _prog_coef_init(frame) -> dict[int, "np.ndarray"]:
    """Full-frame DCT coefficient accumulators, one (blocks_y, blocks_x,
    64) array per component — progressive scans write into these and the
    image renders once at EOI (T.81 G.1)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _find_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker after entropy-coded data (skips
    FF00 stuffing and RSTn)."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return len(data)


def _decode_prog_scan(
    data, pos, frame, scan, htables, restart_interval, coef, ss, se, ah, al
):
    """One progressive scan (T.81 G.2): DC first/refine over interleaved
    MCUs; AC first/refine over a single component's blocks in raster
    order with EOB runs.  Returns the position of the next marker."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    reader = _BitReader(data, pos)
    p1, m1 = 1 << al, -1 << al

    def handle_restart(unit_no, reset):
        if restart_interval and unit_no and unit_no % restart_interval == 0:
            try:
                # pad bits before an RSTn are < 8; a bounded skip turns a
                # MISSING restart marker (truncated/corrupt stream, where
                # _fill pads 0xFF forever without advancing) into an error
                # instead of an infinite loop
                for _ in range(64):
                    reader.bit()
                raise JpegError("jpeg: expected restart marker in scan")
            except _RestartMarker:
                reader.align_restart()
            reset()

    if ss == 0:  # DC scan
        if se != 0:
            raise JpegError("jpeg: DC progressive scan must have Se=0")
        pred = {comp["id"]: 0 for comp, _, _ in scan}

        def reset_dc():
            for k in pred:
                pred[k] = 0

        def dc_block(comp, tdc, y, x):
            cblk = coef[comp["id"]]
            if ah == 0:
                s = reader.huff(htables[(0, tdc)])
                pred[comp["id"]] += _extend(reader.bits(s), s)
                cblk[y, x, 0] = pred[comp["id"]] << al
            elif reader.bit():
                cblk[y, x, 0] |= p1

        unit = 0
        if len(scan) > 1:  # interleaved MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    handle_restart(unit, reset_dc)
                    unit += 1
                    for comp, tdc, _ in scan:
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                dc_block(
                                    comp, tdc,
                                    my * comp["v"] + by, mx * comp["h"] + bx,
                                )
        else:
            # single-component DC scans use the component's OWN
            # (non-interleaved) block geometry — its block count differs
            # from the MCU grid whenever dimensions aren't MCU-aligned
            comp, tdc, _ = scan[0]
            cw = -(-(frame["w"] * comp["h"]) // hmax)
            chh = -(-(frame["h"] * comp["v"]) // vmax)
            for y in range(-(-chh // 8)):
                for x in range(-(-cw // 8)):
                    handle_restart(unit, reset_dc)
                    unit += 1
                    dc_block(comp, tdc, y, x)
        return _find_marker(data, reader.pos)

    # AC scan — exactly one component, non-interleaved raster order
    if len(scan) != 1:
        raise JpegError("jpeg: AC progressive scan must be single-component")
    comp, _, tac = scan[0]
    cblk = coef[comp["id"]]
    cw = -(-(frame["w"] * comp["h"]) // hmax)
    chh = -(-(frame["h"] * comp["v"]) // vmax)
    nbw, nbh = -(-cw // 8), -(-chh // 8)
    table = htables[(1, tac)]
    state = {"eobrun": 0}

    def reset_ac():
        state["eobrun"] = 0

    unit = 0
    for by in range(nbh):
        for bx in range(nbw):
            handle_restart(unit, reset_ac)
            unit += 1
            block = cblk[by, bx]
            if ah == 0:  # first pass (G.1.2.2)
                if state["eobrun"] > 0:
                    state["eobrun"] -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.huff(table)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        state["eobrun"] = (1 << r) - 1 + reader.bits(r)
                        break
                    k += r
                    if k > se:
                        raise JpegError("jpeg: AC index overflow in progressive scan")
                    block[k] = _extend(reader.bits(s), s) << al
                    k += 1
            else:  # refinement pass (G.1.2.3, libjpeg decode_mcu_AC_refine shape)

                def refine(v: int) -> int:
                    if reader.bit() and not (abs(v) & p1):
                        return v + (p1 if v >= 0 else m1)
                    return v

                k = ss
                if state["eobrun"] == 0:
                    while k <= se:
                        rs = reader.huff(table)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:
                                state["eobrun"] = (1 << r) + reader.bits(r)
                                break
                            # r == 15: skip 16 zero-history coefficients
                        else:
                            if s != 1:
                                raise JpegError("jpeg: bad refinement magnitude")
                            newval = p1 if reader.bit() else m1
                        while k <= se:
                            if block[k] != 0:
                                block[k] = refine(int(block[k]))
                            else:
                                if r == 0:
                                    if newval:
                                        block[k] = newval
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if state["eobrun"] > 0:
                    for kk in range(k, se + 1):
                        if block[kk] != 0:
                            block[kk] = refine(int(block[kk]))
                    state["eobrun"] -= 1
    return _find_marker(data, reader.pos)


def _render_coefs(frame, coef, qtables) -> np.ndarray:
    """Dequantize + IDCT the accumulated progressive coefficients and
    color-convert — same output contract as the baseline path.  The IDCT
    runs as ONE einsum over all blocks (the coefficients are already a
    dense (nbh, nbw, 64) array here, unlike the baseline path where
    blocks materialize one at a time during Huffman decode)."""
    planes = {}
    for comp in frame["comps"]:
        q = qtables[comp["tq"]]
        blocks = coef[comp["id"]]
        nbh, nbw = blocks.shape[0], blocks.shape[1]
        zz = np.zeros((nbh, nbw, 64), dtype=np.float64)
        zz[:, :, _ZIGZAG] = blocks.astype(np.float64) * q[None, None, :]
        px = (
            np.einsum(
                "ij,xyjk,kl->xyil", _T.T, zz.reshape(nbh, nbw, 8, 8), _T
            )
            + 128.0
        )
        # (nbh, nbw, 8, 8) -> (nbh*8, nbw*8)
        planes[comp["id"]] = px.transpose(0, 2, 1, 3).reshape(nbh * 8, nbw * 8)
    return _planes_to_image(frame, planes)


def _planes_to_image(frame, planes: dict) -> np.ndarray:
    """Upsample subsampled chroma and color-convert to the output array —
    shared by the baseline and progressive paths."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    comps = frame["comps"]
    if len(comps) == 1:
        return np.rint(planes[comps[0]["id"]][:h, :w]).clip(0, 255).astype(np.uint8)
    if len(comps) != 3:
        raise NotImplementedError("jpeg: CMYK/4-component images unsupported")
    out = []
    for comp in comps:
        plane = planes[comp["id"]]
        if comp["h"] < hmax or comp["v"] < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1
            )
        out.append(plane[:h, :w])
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.rint(np.stack([r, g, b], axis=2)).clip(0, 255).astype(np.uint8)


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # raw zigzag coefficients per component; dequant + IDCT run batched
    # afterwards (one einsum over all blocks — _render_coefs)
    coef = {
        comp["id"]: np.zeros(
            (mcuy * comp["v"], mcux * comp["h"], 64), dtype=np.int32
        )
        for comp, _, _ in scan
    }

    reader = _BitReader(data, pos)
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align to the RSTn between restart intervals; the
                # bounded skip errors on a MISSING marker instead of
                # spinning on _fill's end-of-scan 0xFF padding
                try:
                    for _ in range(64):
                        reader.bit()
                    raise JpegError("jpeg: expected restart marker in scan")
                except _RestartMarker:
                    reader.align_restart()
                    pred = dict.fromkeys(pred, 0)
            mcu_count += 1
            for comp, tdc, tac in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = coef[comp["id"]][
                            my * comp["v"] + by, mx * comp["h"] + bx
                        ]
                        s = reader.huff(htables[(0, tdc)])
                        diff = _extend(reader.bits(s), s)
                        pred[comp["id"]] += diff
                        coeffs[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.huff(htables[(1, tac)])
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("jpeg: AC index overflow")
                            coeffs[k] = _extend(reader.bits(size), size)
                            k += 1

    return _render_coefs(frame, coef, qtables)


# ------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder (Annex K tables).  ``subsample`` writes 4:2:0
    chroma, exercising the decoder's upsampling path; ``restart_interval``
    writes DRI + RSTn markers every N MCUs, exercising its restart path."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise JpegError("jpeg encoder expects uint8")
    gray = arr.ndim == 2 or (arr.ndim == 3 and arr.shape[2] == 1)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    h, w = arr.shape[:2]
    ql = _quality_scale(_QUANT_LUMA, quality)
    qc = _quality_scale(_QUANT_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = arr[:, :, :3].astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 4:2:0: average 2x2 neighborhoods (pad to even first)
            def down(p):
                pp = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
                return (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0

            planes = [y - 128.0, down(cb) - 128.0, down(cr) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for plane, (sh, sv) in zip(planes, samp):
        pw, ph = mcux * 8 * sh, mcuy * 8 * sv
        padded.append(
            np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")
        )

    dc_enc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    ac_enc = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]
    qz = [np.empty(64, dtype=np.int32) for _ in range(2)]
    for i, q in enumerate((ql, qc)):
        qz[i][:] = q  # stored zigzag order

    writer = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, (plane, (sh, sv)) in enumerate(zip(padded, samp)):
                tsel = qsel[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        coef = _T @ block @ _T.T
                        zig = coef.reshape(64)[_ZIGZAG]
                        quant = np.rint(zig / qz[tsel]).astype(np.int32)
                        # DC
                        diff = int(quant[0]) - pred[ci]
                        pred[ci] = int(quant[0])
                        s = _size_cat(diff)
                        ln, code = dc_enc[tsel][s]
                        writer.write(code, ln)
                        if s:
                            writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
                        # AC
                        run = 0
                        last_nz = max((k for k in range(1, 64) if quant[k]), default=0)
                        for k in range(1, last_nz + 1):
                            v = int(quant[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_enc[tsel][0xF0]
                                writer.write(code, ln)
                                run -= 16
                            s = _size_cat(v)
                            ln, code = ac_enc[tsel][(run << 4) | s]
                            writer.write(code, ln)
                            writer.write(v if v > 0 else v + (1 << s) - 1, s)
                            run = 0
                        if last_nz < 63:
                            ln, code = ac_enc[tsel][0x00]
                            writer.write(code, ln)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql.astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i in range(ncomp):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, qsel[i]])
    out += seg(0xC0, sof)

    def dht(tc: int, th: int, table: tuple) -> bytes:
        bits, huffval = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval))

    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
