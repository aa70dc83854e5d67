"""FLAC codec: the decoder is validated against hand-built frames from
the public spec (RFC 9639) — CONSTANT/LPC subframes, mid/side and
left/side stereo, Rice escape partitions, wasted bits — with expected
sample values computed by independent naive loops, plus encoder
round-trips and the Spark multimodal integration."""

import numpy as np
import pytest

from pipeline_spark.functions.flaccodec import (
    FlacError,
    _BitWriter,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def _streaminfo(rate, channels, bits, total, blocksize=4096):
    si = _BitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(channels - 1, 3); si.write(bits - 1, 5)
    si.write(total, 36)
    body = si.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(bw, blocksize, channels, bits, ch_code=None):
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)           # 16-bit blocksize-1 follows
    bw.write(0, 4)           # rate from STREAMINFO
    bw.write(ch_code if ch_code is not None else channels - 1, 4)
    bw.write({8: 1, 12: 2, 16: 4}[bits], 3)
    bw.write(0, 1)
    bw.write(0, 8)           # frame number 0
    bw.write(blocksize - 1, 16)
    bw.align()
    bw.write(_crc8(bw.bytes()), 8)


def _finish_frame(bw):
    bw.align()
    frame = bw.bytes()
    return frame + _crc16(frame).to_bytes(2, "big")


def test_constant_subframe_hand_built():
    bs, bits = 16, 16
    bw = _BitWriter()
    _frame_header(bw, bs, 1, bits)
    bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)  # CONSTANT, no wasted
    bw.write(-1234, bits)
    data = _streaminfo(8000, 1, bits, bs) + _finish_frame(bw)
    dec, rate = decode_flac(data)
    assert rate == 8000
    np.testing.assert_allclose(dec[:, 0], np.full(bs, -1234 / 32768.0))


def test_lpc_subframe_hand_built():
    """LPC order 2: prediction (c0*prev + c1*prev2) >> shift, residuals
    in one Rice partition; expectation computed by a naive loop."""
    bs, bits = 12, 16
    warmup = [100, -50]
    coefs = [3, -2]
    shift = 1
    resid = [5, -3, 0, 7, -8, 2, 1, -1, 4, 0]
    expect = list(warmup)
    for r in resid:
        pred = (coefs[0] * expect[-1] + coefs[1] * expect[-2]) >> shift
        expect.append(r + pred)

    bw = _BitWriter()
    _frame_header(bw, bs, 1, bits)
    bw.write(0, 1)
    bw.write(32 | 1, 6)      # LPC, order 2
    bw.write(0, 1)
    for s in warmup:
        bw.write(s, bits)
    bw.write(4, 4)           # precision 5 bits
    bw.write(shift, 5)
    for c in coefs:
        bw.write(c, 5)
    bw.write(0, 2)           # rice method 0
    bw.write(0, 4)           # partition order 0
    bw.write(2, 4)           # rice param 2
    for r in resid:
        v = (abs(r) << 1) - 1 if r < 0 else r << 1
        bw.write(0, v >> 2); bw.write(1, 1); bw.write(v, 2)
    data = _streaminfo(16000, 1, bits, bs) + _finish_frame(bw)
    dec, _ = decode_flac(data)
    np.testing.assert_allclose(dec[:, 0] * 32768.0, expect)


def _verbatim_subframe(bw, samples, bits):
    bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
    for s in samples:
        bw.write(s, bits)


def test_mid_side_stereo_hand_built():
    bs, bits = 8, 16
    L = [100, -200, 300, -400, 500, -600, 700, -800]
    R = [90, -190, 310, -390, 510, -590, 690, -790]
    mid = [(l + r) >> 1 for l, r in zip(L, R)]
    side = [l - r for l, r in zip(L, R)]
    bw = _BitWriter()
    _frame_header(bw, bs, 2, bits, ch_code=10)  # mid/side
    _verbatim_subframe(bw, mid, bits)
    _verbatim_subframe(bw, side, bits + 1)  # side gets one extra bit
    data = _streaminfo(8000, 2, bits, bs) + _finish_frame(bw)
    dec, _ = decode_flac(data)
    np.testing.assert_allclose(dec[:, 0] * 32768.0, L)
    np.testing.assert_allclose(dec[:, 1] * 32768.0, R)


def test_left_side_and_right_side_hand_built():
    bs, bits = 4, 16
    L = [1000, -2000, 3000, -4000]
    R = [999, -2001, 3003, -3997]
    side = [l - r for l, r in zip(L, R)]
    for ch_code in (8, 9):
        bw = _BitWriter()
        _frame_header(bw, bs, 2, bits, ch_code=ch_code)
        if ch_code == 8:   # left/side
            _verbatim_subframe(bw, L, bits)
            _verbatim_subframe(bw, side, bits + 1)
        else:              # right/side
            _verbatim_subframe(bw, side, bits + 1)
            _verbatim_subframe(bw, R, bits)
        data = _streaminfo(8000, 2, bits, bs) + _finish_frame(bw)
        dec, _ = decode_flac(data)
        np.testing.assert_allclose(dec[:, 0] * 32768.0, L)
        np.testing.assert_allclose(dec[:, 1] * 32768.0, R)


def test_rice_escape_partition_and_wasted_bits():
    """Escape code 15 → raw n-bit residuals; wasted bits shift samples."""
    bs, bits = 8, 16
    resid = [-20, 15, 0, -31, 7, 1]  # order-2 fixed, 6 residuals
    warmup = [10, 20]
    expect = list(warmup)
    for r in resid:
        expect.append(r + 2 * expect[-1] - expect[-2])
    bw = _BitWriter()
    _frame_header(bw, bs, 1, bits)
    bw.write(0, 1)
    bw.write(10, 6)          # FIXED order 2
    bw.write(1, 1)           # wasted bits flag
    bw.write(1, 1)           # unary 0 + terminator → wasted = 1
    eff = bits - 1
    for s in warmup:
        bw.write(s, eff)
    bw.write(0, 2)           # method 0
    bw.write(0, 4)           # partition order 0
    bw.write(15, 4)          # ESCAPE
    bw.write(6, 5)           # 6 raw bits per residual
    for r in resid:
        bw.write(r, 6)
    data = _streaminfo(8000, 1, bits, bs) + _finish_frame(bw)
    dec, _ = decode_flac(data)
    np.testing.assert_allclose(dec[:, 0] * 32768.0, [e << 1 for e in expect])


def test_crc_mismatch_raises():
    enc = bytearray(encode_flac(np.linspace(-0.5, 0.5, 600), 8000))
    enc[-1] ^= 0xFF  # corrupt the final frame CRC
    with pytest.raises(FlacError, match="CRC"):
        decode_flac(bytes(enc))


def test_encoder_roundtrip_exact():
    rng = np.random.RandomState(5)
    t = np.arange(10000) / 44100.0
    stereo = np.stack(
        [0.6 * np.sin(2 * np.pi * 330 * t) + 0.05 * rng.randn(len(t)),
         0.4 * np.sin(2 * np.pi * 550 * t)], axis=1
    )
    enc = encode_flac(stereo, 44100, bits=16)
    dec, rate = decode_flac(enc)
    assert rate == 44100 and dec.shape == stereo.shape
    quant = np.clip(np.round(stereo * 32768), -32768, 32767) / 32768.0
    np.testing.assert_allclose(dec, quant, atol=1e-12)
    assert len(enc) < stereo.size * 2  # actually compresses


def test_multimodal_audio_features_on_flac(spark):
    from pyspark.sql import Row

    from pipeline_spark.operators.multimodal import multimodal_transform
    from pipeline_spark.registry import ModuleContext

    t = np.arange(4000) / 8000.0
    wavish = 0.5 * np.sin(2 * np.pi * 440 * t)
    flac = encode_flac(wavish, 8000)
    df = spark.createDataFrame([Row(mm_id=1, payload=bytearray(flac))])
    out = multimodal_transform(
        ModuleContext(
            spark=spark, name="a",
            params={"op": "audio_features", "field": "payload",
                    "idField": "mm_id"},
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )[""]
    r = out.collect()[0]
    assert r["sample_rate"] == 8000
    assert abs(r["duration_s"] - 0.5) < 1e-6
    assert r["channels"] == 1
    assert len(r["audio_features"]) > 0
