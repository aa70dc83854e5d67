"""Native FLAC codec — stdlib + numpy, written against the PUBLIC spec
(RFC 9639 / xiph.org FLAC format documentation).

Decoder: STREAMINFO parsing, frame sync + header (UTF-8 coded frame/
sample numbers, CRC-8), all four subframe types (CONSTANT, VERBATIM,
FIXED orders 0-4, LPC up to order 32), partitioned Rice residuals
(4- and 5-bit parameter forms incl. the raw-bits escape), wasted bits,
and the four channel assignments (independent, left/side, right/side,
mid/side), with frame CRC-16 verification.

Encoder: a real spec-shaped encoder (fixed blocksize, independent
channels, per-frame choice of FIXED order-2 + single-partition Rice or
VERBATIM, correct CRC-8/CRC-16) so the decoder is exercised
fixture-free — the same pattern as jpegcodec's JFIF encoder.

Scale posture: runs clip-at-a-time inside Arrow-batched mapInPandas via
the multimodal transform; the Rice loops are pure Python over one
clip's residuals, fine for feature extraction, not a realtime player.

Reference integration point: the reference pipelines treat audio as
opaque binary columns; this codec backs the `audio_features` /
`audio_resample` multimodal ops for FLAC payloads.
"""

from __future__ import annotations

import struct

import numpy as np


class FlacError(ValueError):
    pass


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384,
    15: 32768,
}

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.byte >= len(self.data):
                raise FlacError("flac: truncated stream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(br: _BitReader, max_bytes: int) -> int:
    """The frame header's UTF-8-style variable-length number (up to 7
    bytes for sample numbers — beyond standard UTF-8's 4)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > max_bytes - 1:
        raise FlacError("flac: invalid UTF-8 coded number")
    v = first & (mask - 1)
    for _ in range(n):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise FlacError("flac: invalid UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise FlacError(f"flac: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = br.read(4)
    parts = 1 << part_order
    if blocksize % parts:
        raise FlacError("flac: partition order does not divide block size")
    out: list[int] = []
    for p in range(parts):
        n = blocksize >> part_order
        if p == 0:
            n -= order
        param = br.read(plen)
        if param == escape:
            bits = br.read(5)
            if bits == 0:
                out.extend([0] * n)
            else:
                out.extend(br.read_signed(bits) for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _read_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise FlacError("flac: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps -= wasted
    if stype == 0:  # CONSTANT
        samples = [br.read_signed(bps)] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        samples = [br.read_signed(bps) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(resid):
            pred = sum(
                c * samples[order + i - 1 - j] for j, c in enumerate(coefs)
            )
            samples.append(r + pred)
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        samples = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise FlacError("flac: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("flac: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        for i, r in enumerate(resid):
            pred = sum(
                c * samples[order + i - 1 - j] for j, c in enumerate(coefs)
            ) >> shift
            samples.append(r + pred)
    else:
        raise FlacError(f"flac: reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (float64 samples in [-1, 1] shaped
    [n_frames, n_channels], sample_rate)."""
    if data[:4] != b"fLaC":
        raise FlacError("flac: missing fLaC marker")
    pos = 4
    rate = channels = bits = 0
    total = -1
    last = False
    while not last:
        if pos + 4 > len(data):
            raise FlacError("flac: truncated metadata")
        head = data[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16); br.read(16)  # min/max blocksize
            br.read(24); br.read(24)  # min/max framesize
            rate = br.read(20)
            channels = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36)
        pos += 4 + size
    if not rate:
        raise FlacError("flac: no STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(data) - 1:
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise FlacError("flac: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br, 7)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODES:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        else:
            raise FlacError(f"flac: reserved block size code {bs_code}")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise FlacError("flac: invalid sample rate code")
        bps = _SIZE_CODES.get(ss_code, bits) if ss_code else bits
        br.align()
        header_crc = br.read(8)
        if _crc8(data[frame_start : br.byte - 1]) != header_crc:
            raise FlacError("flac: frame header CRC mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise FlacError("flac: channel count mismatch")
            subs = [
                _read_subframe(br, blocksize, bps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise FlacError("flac: stereo decorrelation on non-stereo")
            # the side channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _read_subframe(br, blocksize, bps)
                side = _read_subframe(br, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _read_subframe(br, blocksize, bps + 1)
                right = _read_subframe(br, blocksize, bps)
                subs = [[s + r for s, r in zip(side, right)], right]
            else:  # mid/side
                mid = _read_subframe(br, blocksize, bps)
                side = _read_subframe(br, blocksize, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    subs[0].append((m + s) >> 1)
                    subs[1].append((m - s) >> 1)
        else:
            raise FlacError(f"flac: reserved channel assignment {ch_code}")
        br.align()
        frame_crc = br.read(16)
        if _crc16(data[frame_start : br.byte - 2]) != frame_crc:
            raise FlacError("flac: frame CRC mismatch")
        for c in range(channels):
            chans[c].extend(subs[c])
        pos = br.byte

    arr = np.array(chans, dtype=np.int64).T
    if total >= 0 and len(arr) > total > 0:
        arr = arr[:total]
    return arr.astype(np.float64) / float(1 << (bits - 1)), rate


# ----------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        return bytes(self.buf)


def _write_rice(bw: _BitWriter, resid: list[int], param: int) -> None:
    for r in resid:
        v = (abs(r) << 1) - 1 if r < 0 else r << 1  # zigzag
        q, rem = v >> param, v & ((1 << param) - 1)
        bw.write(0, q)
        bw.write(1, 1)
        bw.write(rem, param)


def _rice_param(resid: list[int]) -> int:
    mean = sum(abs(r) for r in resid) / max(len(resid), 1)
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def encode_flac(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """float samples in [-1, 1] shaped [n, channels] (or [n]) → FLAC
    bytes: fixed 4096-sample blocks, independent channels, per-channel
    FIXED order-2 + single-partition Rice when it wins, else VERBATIM."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    scale = float(1 << (bits - 1))
    pcm = np.clip(np.round(samples * scale), -scale, scale - 1).astype(np.int64)
    blocksize = 4096

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(channels - 1, 3); si.write(bits - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, blocksize):
        block = pcm[start : start + blocksize]
        bs = len(block)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # 16-bit blocksize-1 follows
        bw.write(0, 4)  # rate from STREAMINFO
        bw.write(channels - 1, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits], 3)
        bw.write(0, 1)
        # UTF-8 coded frame number
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        else:
            bw.write(0xC0 | (frame_no >> 6), 8)
            bw.write(0x80 | (frame_no & 0x3F), 8)
        bw.write(bs - 1, 16)
        bw.align()
        bw.write(_crc8(bw.bytes()), 8)
        for c in range(channels):
            ch = block[:, c].tolist()
            use_fixed = bs > 2
            if use_fixed:
                resid = [
                    ch[i] - 2 * ch[i - 1] + ch[i - 2] for i in range(2, bs)
                ]
                param = _rice_param(resid)
                # verbatim costs bs*bits; fixed ~ warmup + residual bits
                rice_bits = sum(
                    ((abs(r) << 1) >> param) + 1 + param for r in resid
                )
                use_fixed = 2 * bits + rice_bits + 10 < bs * bits
            bw.write(0, 1)
            if use_fixed:
                bw.write(10, 6)  # FIXED order 2
                bw.write(0, 1)   # no wasted bits
                bw.write(ch[0], bits)
                bw.write(ch[1], bits)
                bw.write(0, 2)   # rice method 0 (4-bit params)
                bw.write(0, 4)   # partition order 0
                bw.write(param, 4)
                _write_rice(bw, resid, param)
            else:
                bw.write(1, 6)   # VERBATIM
                bw.write(0, 1)
                for s in ch:
                    bw.write(s, bits)
        bw.align()
        frame = bw.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)
