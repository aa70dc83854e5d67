"""WAV audio codec + deterministic feature extraction — stdlib + numpy.

Extends the multimodal family (imagecodec/jpegcodec) to audio columns:
RIFF/WAVE decode for PCM (8/16/24/32-bit int + 32/64-bit float, any
channel count) plus the telephony/legacy payloads — G.711 µ-law/A-law
(format codes 7/6) and IMA/MS ADPCM (0x11/2) via
``functions/g711adpcm.py`` — written against the public RIFF spec, plus
a fixed-dimension feature vector (duration, rate, channels, RMS,
zero-crossing rate, spectral centroid/rolloff/flatness) standing in for
a learned audio embedding with the identical Spark contract.  FLAC
decodes natively (flaccodec); MP3/OGG/AAC raise with an actionable gate
— their codecs are absent from this sandbox (container *metadata* for
them is handled by ``functions/mediacontainers.py``).

Scale posture: runs inside Arrow-batched mapInPandas, one clip per call;
decode is a numpy frombuffer + reshape, features one rFFT.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioError(ValueError):
    pass


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (float64 samples in [-1, 1] shaped
    [n_frames, n_channels], sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xf3"):
            raise NotImplementedError(
                "audio: MP3 needs a codec library (absent from this sandbox)"
            )
        if data[:4] == b"fLaC":
            raise NotImplementedError(
                "audio: FLAC payload reached the WAV decoder — use "
                "decode_audio(), which dispatches to the native FLAC codec"
            )
        if data[:4] == b"OggS":
            raise NotImplementedError(
                "audio: Ogg needs a codec library (absent from this sandbox)"
            )
        raise AudioError("audio: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, channels, rate = struct.unpack("<HHI", body[:8])
            block_align = struct.unpack("<H", body[12:14])[0]
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_format == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                audio_format = struct.unpack("<H", body[24:26])[0]
            fmt = (audio_format, channels, rate, bits, block_align)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise AudioError("audio: WAV missing fmt/data chunk")
    audio_format, channels, rate, bits, block_align = fmt
    if channels < 1:
        raise AudioError("audio: zero channels")
    if audio_format in (6, 7):  # G.711 A-law / µ-law (telephony)
        from pipeline_spark.functions.g711adpcm import alaw_decode, ulaw_decode

        dec = ulaw_decode if audio_format == 7 else alaw_decode
        x = dec(payload).astype(np.float64) / 32768.0
        x = x[: len(x) - len(x) % channels]
        return x.reshape(-1, channels), rate
    if audio_format == 0x11:  # IMA/DVI ADPCM
        from pipeline_spark.functions.g711adpcm import ima_adpcm_decode

        x = ima_adpcm_decode(payload, channels, block_align)
        return x.astype(np.float64) / 32768.0, rate
    if audio_format == 2:  # MS ADPCM
        from pipeline_spark.functions.g711adpcm import ms_adpcm_decode

        x = ms_adpcm_decode(payload, channels, block_align)
        return x.astype(np.float64) / 32768.0, rate
    if audio_format == 1:  # PCM
        if bits == 8:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
            x = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise AudioError(f"audio: PCM bit depth {bits} unsupported")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(payload, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(payload, dtype="<f8").astype(np.float64)
        else:
            raise AudioError(f"audio: float bit depth {bits} unsupported")
    else:
        raise NotImplementedError(
            f"audio: WAV format code {audio_format} (non-PCM) needs a codec library"
        )
    if channels < 1:
        raise AudioError("audio: zero channels")
    x = x[: len(x) - len(x) % channels]
    return x.reshape(-1, channels), rate


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Format-sniffing audio decode: FLAC → the native flaccodec,
    RIFF/WAVE → decode_wav; MP3/OGG still gate with actionable errors."""
    if data[:4] == b"fLaC":
        from pipeline_spark.functions.flaccodec import decode_flac

        return decode_flac(data)
    return decode_wav(data)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """float samples in [-1, 1] ([n] or [n, ch]) → PCM WAV bytes — the
    fixture twin of decode_wav (and the multimodal resample re-encoder)."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    clipped = np.clip(samples, -1.0, 1.0)
    if bits == 16:
        pcm = np.rint(clipped * 32767.0).astype("<i2").tobytes()
    elif bits == 8:
        pcm = (np.rint(clipped * 127.0) + 128).astype(np.uint8).tobytes()
    elif bits == 32:
        pcm = np.rint(clipped * float((1 << 31) - 1)).astype("<i4").tobytes()
    else:
        raise AudioError(f"audio: encode bit depth {bits} unsupported")
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def resample_linear(samples: np.ndarray, rate: int, target_rate: int) -> np.ndarray:
    """Linear-interpolation resample ([n, ch] → [m, ch])."""
    if rate == target_rate or len(samples) == 0:
        return samples
    n = len(samples)
    m = max(1, int(round(n * target_rate / rate)))
    src = np.linspace(0.0, n - 1, m)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, n - 1)
    w = (src - i0)[:, None]
    return samples[i0] * (1 - w) + samples[i1] * w


def audio_features(samples: np.ndarray, rate: int, dim: int = 8) -> np.ndarray:
    """Deterministic clip-level features: [log1p(duration_s), rate/48k,
    channels, rms, zero-crossing rate, spectral centroid (norm), 85%%
    rolloff (norm), spectral flatness].  A stand-in for a learned audio
    embedding with the identical Spark contract."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    mono = samples.mean(axis=1)
    dur = n / float(rate) if rate else 0.0
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0
    if n > 1:
        spec = np.abs(np.fft.rfft(mono))
        power = spec**2
        freqs = np.fft.rfftfreq(n, d=1.0 / rate) if rate else np.arange(len(spec))
        total = power.sum()
        if total > 0:
            centroid = float((freqs * power).sum() / total) / (rate / 2.0 or 1.0)
            cum = np.cumsum(power)
            rolloff = float(freqs[np.searchsorted(cum, 0.85 * total)]) / (rate / 2.0 or 1.0)
            flatness = float(
                np.exp(np.mean(np.log(power + 1e-12))) / (power.mean() + 1e-12)
            )
        else:
            centroid = rolloff = flatness = 0.0
    else:
        centroid = rolloff = flatness = 0.0
    feats = np.array(
        [np.log1p(dur), rate / 48000.0, float(ch), rms, zcr, centroid, rolloff, flatness],
        dtype=np.float32,
    )
    return feats[:dim]
