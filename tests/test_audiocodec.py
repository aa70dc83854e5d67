"""WAV codec: decode is validated against hand-built RIFF bytes from the
public spec (not just the sibling encoder), plus encoder round-trips and
the Spark multimodal ops end-to-end."""

import struct

import numpy as np
import pytest

from pipeline_spark.functions.audiocodec import (
    AudioError,
    audio_features,
    decode_wav,
    encode_wav,
    resample_linear,
)


def _wav_bytes(fmt_code, channels, rate, bits, payload, extra=b""):
    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    ) + extra
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


class TestDecodeAgainstSpecBytes:
    def test_pcm16_stereo_hand_built(self):
        # frames: L=16384 (0.5), R=-16384 (-0.5), then L=0, R=32767
        payload = struct.pack("<4h", 16384, -16384, 0, 32767)
        samples, rate = decode_wav(_wav_bytes(1, 2, 44100, 16, payload))
        assert rate == 44100 and samples.shape == (2, 2)
        assert samples[0, 0] == pytest.approx(0.5)
        assert samples[0, 1] == pytest.approx(-0.5)
        assert samples[1, 1] == pytest.approx(32767 / 32768)

    def test_pcm8_and_pcm24_and_float32(self):
        s8, _ = decode_wav(_wav_bytes(1, 1, 8000, 8, bytes([128, 255, 0])))
        assert s8[:, 0] == pytest.approx([0.0, 127 / 128, -1.0])
        # 24-bit: 0x400000 = +0.5, 0xC00000 = -0.5 (two's complement)
        p24 = bytes([0x00, 0x00, 0x40]) + bytes([0x00, 0x00, 0xC0])
        s24, _ = decode_wav(_wav_bytes(1, 1, 8000, 24, p24))
        assert s24[:, 0] == pytest.approx([0.5, -0.5])
        pf = struct.pack("<2f", 0.25, -1.0)
        sf, _ = decode_wav(_wav_bytes(3, 1, 8000, 32, pf))
        assert sf[:, 0] == pytest.approx([0.25, -1.0])

    def test_odd_sized_chunk_padding(self):
        # a 3-byte LIST chunk before fmt must be skipped with word alignment
        inner = _wav_bytes(1, 1, 8000, 16, struct.pack("<h", 1000))
        padded = (
            inner[:12]
            + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
            + inner[12:]
        )
        fixed = padded[:4] + struct.pack("<I", len(padded) - 8) + padded[8:]
        samples, rate = decode_wav(fixed)
        assert rate == 8000 and len(samples) == 1

    def test_gates(self):
        with pytest.raises(NotImplementedError, match="MP3"):
            decode_wav(b"ID3\x04rest-of-mp3")
        with pytest.raises(NotImplementedError, match="FLAC"):
            decode_wav(b"fLaC0000")
        with pytest.raises(AudioError):
            decode_wav(b"not audio at all")
        with pytest.raises(NotImplementedError, match="format code"):
            decode_wav(_wav_bytes(85, 1, 8000, 16, b"\x00\x00"))  # MPEG layer 3


class TestEncodeRoundtrip:
    def test_roundtrip_16_and_32(self):
        t = np.linspace(0, 1, 800, endpoint=False)
        sig = np.stack([np.sin(2 * np.pi * 440 * t), np.cos(2 * np.pi * 220 * t)], axis=1)
        for bits, tol in ((16, 1e-4), (32, 1e-9)):
            dec, rate = decode_wav(encode_wav(sig, 8000, bits=bits))
            assert rate == 8000
            assert np.abs(dec - sig).max() < tol

    def test_resample_preserves_duration(self):
        sig = np.sin(np.linspace(0, 20 * np.pi, 1600))[:, None]
        out = resample_linear(sig, 16000, 8000)
        assert abs(len(out) - 800) <= 1
        # constant signal stays constant under interpolation
        const = np.full((100, 1), 0.5)
        assert resample_linear(const, 1000, 777) == pytest.approx(0.5)


class TestFeatures:
    def test_deterministic_and_sane(self):
        t = np.linspace(0, 1, 8000, endpoint=False)
        sig = 0.5 * np.sin(2 * np.pi * 1000 * t)[:, None]
        f1 = audio_features(sig, 8000)
        f2 = audio_features(sig, 8000)
        assert np.array_equal(f1, f2) and f1.shape == (8,)
        assert f1[3] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)  # rms
        # 1 kHz tone at 8 kHz rate → centroid ≈ 1000/4000
        assert f1[5] == pytest.approx(0.25, abs=0.01)


class TestMultimodalAudioOps:
    def test_audio_features_and_resample_e2e(self, spark):
        from pyspark.sql import Row

        from pipeline_spark.operators.multimodal import multimodal_transform
        from pipeline_spark.registry import ModuleContext

        def ctx(params, inputs):
            return ModuleContext(
                spark=spark, name="m", params=params, inputs=inputs,
                input_names=["in"], config={},
            )

        t = np.linspace(0, 0.5, 4000, endpoint=False)
        wav = encode_wav(np.sin(2 * np.pi * 440 * t)[:, None], 8000)
        df = spark.createDataFrame(
            [Row(mm_id=1, payload=bytearray(wav)),
             Row(mm_id=2, payload=bytearray(b"ID3\x04not-decodable"))]
        )
        out = multimodal_transform(
            ctx({"op": "audio_features", "field": "payload", "onError": "null"}, [df])
        )[""]
        rows = {r["mm_id"]: r for r in out.collect()}
        assert rows[1]["sample_rate"] == 8000
        assert rows[1]["duration_s"] == pytest.approx(0.5)
        assert rows[1]["channels"] == 1
        assert len(rows[1]["audio_features"]) == 8
        assert rows[2]["sample_rate"] is None  # dead-lettered to nulls

        res = multimodal_transform(
            ctx({"op": "audio_resample", "field": "payload", "sampleRate": 4000,
                 "onError": "null"}, [df])
        )[""]
        rrows = {r["mm_id"]: r for r in res.collect()}
        dec, rate = decode_wav(bytes(rrows[1]["resampled"]))
        assert rate == 4000 and abs(len(dec) - 2000) <= 1
        assert rrows[2]["resampled"] is None
