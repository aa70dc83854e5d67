"""G.711 (µ-law / A-law) and ADPCM (IMA, MS) WAV payload codecs.

Telephony and legacy speech corpora overwhelmingly ship as 8 kHz µ-law/
A-law WAV (format codes 7/6) or 4-bit ADPCM (IMA/DVI code 0x11, MS
code 2); without these the audio ops dead-letter exactly the datasets a
speech pipeline most wants.  All four are small public specs: G.711
companding segments (ITU-T G.711, the classic public-domain g711.c
layout), IMA ADPCM step/index tables (IMA Digital Audio Focus Group
algorithm, as carried in the Microsoft WAVE registry), MS ADPCM
coefficient/adaptation tables (RIFF WAVE format registry).

Decoders are numpy-vectorized (G.711 is a 256-entry table lookup; ADPCM
is per-block sequential but block-parallel).  Encoders exist for
fixture-free round-trip tests: G.711 encodes by nearest-codeword search
against the decode table (equivalent to the segment algorithm up to
interval-boundary ties), ADPCM encoders run the standard forward
quantizer.  Round-trip accuracy bounds are asserted in
tests/test_g711adpcm.py.
"""

from __future__ import annotations

import struct

import numpy as np


class AdpcmError(ValueError):
    pass


# ---------------------------------------------------------------------------
# G.711 µ-law / A-law (g711.c layout: sign bit 0x80, 3 segment bits, 4
# quantization bits; µ-law bytes are transmitted complemented)
# ---------------------------------------------------------------------------


def _build_ulaw_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int16)
    for byte in range(256):
        u = ~byte & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        out[byte] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _build_alaw_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int16)
    for byte in range(256):
        a = byte ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[byte] = t if (a & 0x80) else -t
    return out


ULAW_DECODE = _build_ulaw_table()
ALAW_DECODE = _build_alaw_table()


def ulaw_decode(data: bytes) -> np.ndarray:
    """µ-law bytes → int16 linear samples."""
    return ULAW_DECODE[np.frombuffer(data, dtype=np.uint8)]


def alaw_decode(data: bytes) -> np.ndarray:
    return ALAW_DECODE[np.frombuffer(data, dtype=np.uint8)]


def _nearest_codeword_encoder(table: np.ndarray):
    order = np.argsort(table, kind="stable")
    sorted_vals = table[order].astype(np.int32)

    def encode(samples: np.ndarray) -> bytes:
        s = np.clip(np.asarray(samples, dtype=np.int32), -32768, 32767)
        idx = np.searchsorted(sorted_vals, s)
        idx = np.clip(idx, 1, len(sorted_vals) - 1)
        left = sorted_vals[idx - 1]
        right = sorted_vals[idx]
        pick = np.where(s - left <= right - s, idx - 1, idx)
        return order[pick].astype(np.uint8).tobytes()

    return encode


ulaw_encode = _nearest_codeword_encoder(ULAW_DECODE)
alaw_encode = _nearest_codeword_encoder(ALAW_DECODE)


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM (WAV format 0x11)
# ---------------------------------------------------------------------------

IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(nibble: int, pred: int, index: int) -> tuple[int, int]:
    step = int(IMA_STEP_TABLE[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + int(IMA_INDEX_TABLE[nibble & 7])))
    return pred, index


def ima_adpcm_decode(
    payload: bytes, channels: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM WAV data chunk → int16 [n_frames, channels].

    Block layout (Microsoft dvi/ima registry): per channel a 4-byte
    header (int16 predictor, uint8 step index, uint8 reserved), then the
    nibble stream in 4-byte-per-channel interleave, low nibble first."""
    if channels < 1 or block_align < 4 * channels:
        raise AdpcmError("ima adpcm: bad channels/block_align")
    frames_out: list[np.ndarray] = []
    for b0 in range(0, len(payload) - (4 * channels) + 1, block_align):
        block = payload[b0 : b0 + block_align]
        preds = []
        idxs = []
        for ch in range(channels):
            (pred,) = struct.unpack_from("<h", block, 4 * ch)
            idx = min(block[4 * ch + 2], 88)
            preds.append(pred)
            idxs.append(idx)
        # header predictor IS the first output sample of the block
        chans: list[list[int]] = [[preds[ch]] for ch in range(channels)]
        data = block[4 * channels :]
        # nibbles come in groups of 4 bytes (8 samples) per channel
        for g0 in range(0, len(data) - (4 * channels) + 1, 4 * channels):
            for ch in range(channels):
                for byte in data[g0 + 4 * ch : g0 + 4 * ch + 4]:
                    for nib in (byte & 0x0F, byte >> 4):
                        preds[ch], idxs[ch] = _ima_step(
                            nib, preds[ch], idxs[ch]
                        )
                        chans[ch].append(preds[ch])
        n = min(len(c) for c in chans)
        frames_out.append(
            np.stack([np.array(c[:n], dtype=np.int16) for c in chans], axis=1)
        )
    if not frames_out:
        return np.zeros((0, channels), dtype=np.int16)
    return np.concatenate(frames_out, axis=0)


def ima_adpcm_encode(
    samples: np.ndarray, block_frames: int = 505
) -> tuple[bytes, int]:
    """int16 [n, ch] → (IMA ADPCM payload, block_align) — fixture twin.

    ``block_frames`` is samples-per-block (header sample + 8·k nibble
    samples; 505 with the standard 4-byte groups → block_align
    4·ch + 252·ch)."""
    s = np.asarray(samples, dtype=np.int32)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    if (block_frames - 1) % 8:
        raise AdpcmError("ima adpcm: block_frames must be 1 + multiple of 8")
    group_bytes = (block_frames - 1) // 2  # per channel
    block_align = channels * (4 + group_bytes)
    out = bytearray()
    idxs = [0] * channels
    for f0 in range(0, n, block_frames):
        frame = s[f0 : f0 + block_frames]
        if len(frame) < block_frames:  # zero-pad the tail block
            pad = np.zeros((block_frames - len(frame), channels), np.int32)
            frame = np.concatenate([frame, pad], axis=0)
        preds = [int(frame[0, ch]) for ch in range(channels)]
        for ch in range(channels):
            out += struct.pack("<hBB", preds[ch], idxs[ch], 0)
        nibbles: list[list[int]] = [[] for _ in range(channels)]
        for t in range(1, block_frames):
            for ch in range(channels):
                step = int(IMA_STEP_TABLE[idxs[ch]])
                delta = int(frame[t, ch]) - preds[ch]
                nib = 0
                if delta < 0:
                    nib = 8
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                preds[ch], idxs[ch] = _ima_step(nib, preds[ch], idxs[ch])
                nibbles[ch].append(nib)
        for g in range(0, block_frames - 1, 8):
            for ch in range(channels):
                chunk = nibbles[ch][g : g + 8]
                for k in range(0, 8, 2):
                    out.append(chunk[k] | (chunk[k + 1] << 4))
    return bytes(out), block_align


# ---------------------------------------------------------------------------
# MS ADPCM (WAV format 2)
# ---------------------------------------------------------------------------

MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
            (460, -208), (392, -232)]
MS_ADAPT = np.array([230, 230, 230, 230, 307, 409, 512, 614,
                     768, 614, 512, 409, 307, 230, 230, 230], dtype=np.int32)


def _ms_clamp16(v: int) -> int:
    return max(-32768, min(32767, v))


def _ms_pred(s1: int, s2: int, c1: int, c2: int) -> int:
    """(s1*c1 + s2*c2) / 256 with C truncation toward zero — reference
    decoders (ACM, ffmpeg) truncate; Python's >> 8 floors, which is one
    LSB low for negative products and compounds through the state."""
    acc = s1 * c1 + s2 * c2
    return acc // 256 if acc >= 0 else -((-acc) // 256)


def ms_adpcm_decode(
    payload: bytes, channels: int, block_align: int
) -> np.ndarray:
    """MS ADPCM WAV data chunk → int16 [n_frames, channels].

    Block: uint8 predictor index per channel, int16 idelta per channel,
    int16 sample1 per channel, int16 sample2 per channel, then packed
    4-bit codes high nibble first, channels interleaved per nibble."""
    hdr = 7 * channels
    if channels < 1 or block_align <= hdr:
        raise AdpcmError("ms adpcm: bad channels/block_align")
    blocks: list[np.ndarray] = []
    for b0 in range(0, len(payload) - hdr + 1, block_align):
        block = payload[b0 : b0 + block_align]
        pred_idx = [min(block[ch], len(MS_COEFS) - 1) for ch in range(channels)]
        off = channels
        deltas = [
            struct.unpack_from("<h", block, off + 2 * ch)[0]
            for ch in range(channels)
        ]
        off += 2 * channels
        s1 = [
            struct.unpack_from("<h", block, off + 2 * ch)[0]
            for ch in range(channels)
        ]
        off += 2 * channels
        s2 = [
            struct.unpack_from("<h", block, off + 2 * ch)[0]
            for ch in range(channels)
        ]
        off += 2 * channels
        chans: list[list[int]] = [
            [s2[ch], s1[ch]] for ch in range(channels)
        ]
        nibs: list[int] = []
        for byte in block[off:]:
            nibs.append(byte >> 4)
            nibs.append(byte & 0x0F)
        ch = 0
        for nib in nibs:
            c1, c2 = MS_COEFS[pred_idx[ch]]
            pred = _ms_pred(s1[ch], s2[ch], c1, c2)
            signed = nib - 16 if nib >= 8 else nib
            sample = _ms_clamp16(pred + signed * deltas[ch])
            s2[ch], s1[ch] = s1[ch], sample
            deltas[ch] = max(16, (int(MS_ADAPT[nib]) * deltas[ch]) >> 8)
            chans[ch].append(sample)
            ch = (ch + 1) % channels
        n = min(len(c) for c in chans)
        blocks.append(
            np.stack([np.array(c[:n], dtype=np.int16) for c in chans], axis=1)
        )
    if not blocks:
        return np.zeros((0, channels), dtype=np.int16)
    return np.concatenate(blocks, axis=0)


def ms_adpcm_encode(
    samples: np.ndarray, block_frames: int = 500
) -> tuple[bytes, int]:
    """int16 [n, ch] → (MS ADPCM payload, block_align) — fixture twin.
    Uses predictor 0 (c1=256, c2=0) and the standard adaptive quantizer."""
    s = np.asarray(samples, dtype=np.int32)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    if block_frames < 2:
        raise AdpcmError("ms adpcm: block_frames must be >= 2")
    codes_per_block = (block_frames - 2) * channels
    block_align = 7 * channels + (codes_per_block + 1) // 2
    out = bytearray()
    for f0 in range(0, n, block_frames):
        frame = s[f0 : f0 + block_frames]
        if len(frame) < block_frames:
            pad = np.zeros((block_frames - len(frame), channels), np.int32)
            frame = np.concatenate([frame, pad], axis=0)
        deltas = [
            max(16, int(np.mean(np.abs(np.diff(frame[:, ch])))) or 16)
            for ch in range(channels)
        ]
        s2 = [int(frame[0, ch]) for ch in range(channels)]
        s1 = [int(frame[1, ch]) for ch in range(channels)]
        out += bytes([0] * channels)
        for d in deltas:
            out += struct.pack("<h", d)
        for v in s1:
            out += struct.pack("<h", v)
        for v in s2:
            out += struct.pack("<h", v)
        nibs: list[int] = []
        for t in range(2, block_frames):
            for ch in range(channels):
                pred = _ms_pred(s1[ch], s2[ch], 256, 0)
                err = int(frame[t, ch]) - pred
                code = max(-8, min(7, int(round(err / deltas[ch]))))
                nib = code + 16 if code < 0 else code
                sample = _ms_clamp16(pred + code * deltas[ch])
                s2[ch], s1[ch] = s1[ch], sample
                deltas[ch] = max(16, (int(MS_ADAPT[nib]) * deltas[ch]) >> 8)
                nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)
        for k in range(0, len(nibs), 2):
            out.append((nibs[k] << 4) | nibs[k + 1])
    return bytes(out), block_align
