"""G.711 µ-law/A-law + IMA/MS ADPCM: spec tables, round trips, WAV e2e."""

import struct

import numpy as np
import pytest

from pipeline_spark.functions.audiocodec import decode_audio, decode_wav
from pipeline_spark.functions.g711adpcm import (
    ALAW_DECODE,
    ULAW_DECODE,
    alaw_decode,
    alaw_encode,
    ima_adpcm_decode,
    ima_adpcm_encode,
    ms_adpcm_decode,
    ms_adpcm_encode,
    ulaw_decode,
    ulaw_encode,
)


def wav_bytes(
    fmt_code: int, channels: int, rate: int, bits: int, block_align: int,
    payload: bytes, extra: bytes = b"",
) -> bytes:
    byte_rate = rate * block_align if fmt_code in (1, 3) else rate // 2
    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, rate, byte_rate, block_align, bits
    ) + extra
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ------------------------------------------------------------------ G.711


def test_ulaw_known_values():
    # closed-form spec points: byte 0xFF (complement 0x00) → seg 0,
    # quant 0, positive → (0x84 << 0) - 0x84 = 0
    assert ULAW_DECODE[0xFF] == 0
    assert ULAW_DECODE[0x7F] == 0  # negative zero maps to 0
    # max magnitude codeword: byte 0x00 → complement 0xFF (negative,
    # seg 7, quant 15) → -(((15<<3)+0x84)<<7 - 0x84) = -8031 * 4 ... =
    assert ULAW_DECODE[0x00] == -(((0x0F << 3) + 0x84) << 7) + 0x84 == -32124
    assert ULAW_DECODE[0x80] == 32124


def test_alaw_known_values():
    # byte 0xD5 → xor 0x55 = 0x80: positive, seg 0, quant 0 → +8
    assert ALAW_DECODE[0xD5] == 8
    assert ALAW_DECODE[0x55] == -8
    # max: byte 0xAA → xor 0x55 = 0xFF: positive, seg 7, quant 15
    assert ALAW_DECODE[0xAA] == ((0x0F << 4) + 0x108) << 6 == 32256
    assert ALAW_DECODE[0x2A] == -32256


def test_g711_roundtrip_bounds():
    rng = np.random.RandomState(7)
    pcm = (rng.randn(5000) * 8000).astype(np.int16)
    for enc, dec in ((ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)):
        rec = dec(enc(pcm)).astype(np.int32)
        err = np.abs(rec - pcm)
        # logarithmic companding: error bounded by half the local step
        # (segment 7 step is 256 for µ-law / 128·2 for A-law)
        assert err.max() <= 512
        # near zero the steps are tiny
        small = np.abs(pcm) < 100
        assert err[small].max() <= 8


def test_g711_encode_is_identity_on_codewords():
    # every decodable level must encode back to a byte that decodes to it
    for dec_table, enc in ((ULAW_DECODE, ulaw_encode), (ALAW_DECODE, alaw_encode)):
        levels = np.unique(dec_table)
        rec = np.frombuffer(enc(levels.astype(np.int16)), dtype=np.uint8)
        np.testing.assert_array_equal(dec_table[rec], levels)


# ------------------------------------------------------------------ ADPCM


def _reference_ima_decode(payload, channels, block_align):
    """Straight-line per-sample reference implementation (independent of
    the library's block/loop structure)."""
    step_t = [int(v) for v in __import__(
        "pipeline_spark.functions.g711adpcm", fromlist=["IMA_STEP_TABLE"]
    ).IMA_STEP_TABLE]
    idx_t = [-1, -1, -1, -1, 2, 4, 6, 8]
    out = [[] for _ in range(channels)]
    for b0 in range(0, len(payload), block_align):
        block = payload[b0 : b0 + block_align]
        preds, idxs = [], []
        for ch in range(channels):
            (p,) = struct.unpack_from("<h", block, 4 * ch)
            preds.append(p)
            idxs.append(block[4 * ch + 2])
            out[ch].append(p)
        data = block[4 * channels :]
        for g0 in range(0, len(data), 4 * channels):
            for ch in range(channels):
                for byte in data[g0 + 4 * ch : g0 + 4 * ch + 4]:
                    for nib in (byte & 15, byte >> 4):
                        step = step_t[idxs[ch]]
                        d = step >> 3
                        if nib & 1:
                            d += step >> 2
                        if nib & 2:
                            d += step >> 1
                        if nib & 4:
                            d += step
                        if nib & 8:
                            d = -d
                        preds[ch] = max(-32768, min(32767, preds[ch] + d))
                        idxs[ch] = max(0, min(88, idxs[ch] + idx_t[nib & 7]))
                        out[ch].append(preds[ch])
    n = min(len(c) for c in out)
    return np.stack([np.array(c[:n], dtype=np.int16) for c in out], axis=1)


def test_ima_adpcm_decode_matches_reference():
    rng = np.random.RandomState(11)
    pcm = (np.cumsum(rng.randn(1011)) * 500).astype(np.int16)
    payload, ba = ima_adpcm_encode(pcm, block_frames=505)
    mine = ima_adpcm_decode(payload, 1, ba)
    ref = _reference_ima_decode(payload, 1, ba)
    np.testing.assert_array_equal(mine, ref)


def test_ima_adpcm_roundtrip_quality():
    t = np.arange(2020)
    pcm = (np.sin(t * 0.03) * 12000).astype(np.int16)
    payload, ba = ima_adpcm_encode(pcm, block_frames=505)
    rec = ima_adpcm_decode(payload, 1, ba)[: len(pcm), 0].astype(np.float64)
    err = np.sqrt(np.mean((rec - pcm) ** 2))
    assert err < 200  # ~ -36 dB on a 12k amplitude tone


def test_ima_adpcm_stereo_interleave():
    t = np.arange(1010)
    left = (np.sin(t * 0.05) * 9000).astype(np.int16)
    right = (np.sin(t * 0.011) * 5000).astype(np.int16)
    pcm = np.stack([left, right], axis=1)
    payload, ba = ima_adpcm_encode(pcm, block_frames=505)
    rec = ima_adpcm_decode(payload, 2, ba)[: len(pcm)]
    for ch, src in ((0, left), (1, right)):
        err = np.sqrt(np.mean((rec[:, ch].astype(float) - src) ** 2))
        assert err < 200, f"channel {ch}"


def test_ms_adpcm_roundtrip_quality():
    t = np.arange(3000)
    pcm = (np.sin(t * 0.02) * 10000 + np.sin(t * 0.007) * 3000).astype(np.int16)
    payload, ba = ms_adpcm_encode(pcm, block_frames=500)
    rec = ms_adpcm_decode(payload, 1, ba)[: len(pcm), 0].astype(np.float64)
    err = np.sqrt(np.mean((rec - pcm) ** 2))
    assert err < 400


# ------------------------------------------------------------- WAV e2e


def test_wav_ulaw_and_alaw_decode():
    pcm = (np.sin(np.arange(800) * 0.02) * 20000).astype(np.int16)
    for code, enc in ((7, ulaw_encode), (6, alaw_encode)):
        wav = wav_bytes(code, 1, 8000, 8, 1, enc(pcm))
        x, rate = decode_wav(wav)
        assert rate == 8000 and x.shape == (800, 1)
        err = np.sqrt(np.mean((x[:, 0] * 32768.0 - pcm) ** 2))
        # top-segment steps are 256 (µ) / 1024 (A): a 20k-amplitude tone
        # spends most time in the coarse segments, so ~200 RMS is the
        # correct companding noise floor, not a defect
        assert err < 300


def test_wav_ima_adpcm_decode_via_decode_audio():
    pcm = (np.sin(np.arange(1010) * 0.04) * 11000).astype(np.int16)
    payload, ba = ima_adpcm_encode(pcm, block_frames=505)
    extra = struct.pack("<HH", 2, 505)  # cbSize + samples-per-block
    wav = wav_bytes(0x11, 1, 8000, 4, ba, payload, extra=extra)
    x, rate = decode_audio(wav)
    assert rate == 8000
    err = np.sqrt(np.mean((x[: len(pcm), 0] * 32768.0 - pcm) ** 2))
    assert err < 200


def test_wav_ms_adpcm_decode():
    pcm = (np.sin(np.arange(1000) * 0.015) * 9000).astype(np.int16)
    payload, ba = ms_adpcm_encode(pcm, block_frames=500)
    wav = wav_bytes(2, 1, 11025, 4, ba, payload)
    x, rate = decode_wav(wav)
    assert rate == 11025
    err = np.sqrt(np.mean((x[: len(pcm), 0] * 32768.0 - pcm) ** 2))
    assert err < 400


def test_audio_meta_names_legacy_codecs():
    from pipeline_spark.functions.mediacontainers import parse_audio_meta

    pcm = (np.zeros(160)).astype(np.int16)
    wav = wav_bytes(7, 1, 8000, 8, 1, ulaw_encode(pcm))
    m = parse_audio_meta(wav)
    assert m["codec"] == "pcm_mulaw" and m["sample_rate"] == 8000
    payload, ba = ima_adpcm_encode(pcm, block_frames=505)
    m = parse_audio_meta(wav_bytes(0x11, 1, 8000, 4, ba, payload))
    assert m["codec"] == "adpcm_ima"


def test_ms_adpcm_negative_prediction_truncates_toward_zero():
    """Reference decoders (ACM/ffmpeg) compute (s1*c1+s2*c2)/256 with C
    truncation; flooring decodes one LSB low for negative predictions."""
    # predictor 1: c1=512, c2=-256 → with s1=-3, s2=1: acc=-1792,
    # trunc(-1792/256)=-7 exactly (divisible); use s1=-3, s2=2 → acc=-2048?
    # pick s1=-1, s2=1: acc=-768 → -3 (divisible). Need non-divisible:
    # s1=-1, s2=0: acc=-512 → -2. s1=0, s2=-1: acc=256*... use coef 3:
    # c1=192, c2=64, s1=-1, s2=0 → acc=-192 → trunc 0, floor -1.
    block = bytearray()
    block.append(3)                      # predictor index 3 (192, 64)
    block += struct.pack("<h", 16)       # idelta
    block += struct.pack("<h", -1)       # sample1
    block += struct.pack("<h", 0)        # sample2
    block += bytes([0x00])               # one code nibble = 0 (+ pad 0)
    out = ms_adpcm_decode(bytes(block), 1, len(block))
    # pred = trunc(-192/256) = 0; sample = 0 + 0*16 = 0 (floor would give -1)
    assert out[2, 0] == 0
