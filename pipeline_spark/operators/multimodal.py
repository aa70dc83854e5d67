"""`multimodal` transform: image/audio/video columns as opaque binary.

Training-data-pipeline extension.  The data model is a ``binary`` payload
column plus typed metadata (mime, width/height/duration…), processed with
Arrow-batched ``mapInPandas``.

``decode`` and ``resize`` are REAL for images: PNG and uncompressed BMP
decode with the stdlib codec (functions/imagecodec.py — zlib inflate +
unfilter per the public PNG spec), other formats (JPEG, GIF, WebP…)
dispatch to Pillow when importable and fail with an actionable
NotImplementedError otherwise.  ``fake: true`` still selects the
deterministic hash-derived stub (identical execution path/schema) for
corpora whose payloads aren't real images, and ``onError: null`` routes
undecodable payloads to null columns instead of failing the task.
``frame_sample`` remains stubbed: video decode needs ffmpeg/pyav, which
no stdlib fallback can replace.

Ops:
  extract_meta   mime sniff from magic bytes + payload size (pure Column)
  decode         image → features/width/height via mapInPandas
  resize         image resize → re-encoded PNG payload + new dims
  audio_features WAV → duration/rate/channels + feature vector (REAL
                 PCM decode, functions/audiocodec.py; MP3/FLAC gated)
  audio_resample WAV → linear-resampled re-encoded WAV payload
  frame_sample   video → N frame rows per input (exploding mapInPandas;
                 REAL pixels for GIF, REAL keyframe access units for MP4
                 via ``emit: raw``; ffmpeg stub otherwise)
  video_meta     MP4 → duration/dimensions/codec/sample counts/fps via
                 the native ISO-BMFF parser (functions/mp4box.py)
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module

_MAGIC = [
    ("ffd8ff", "image/jpeg"),
    ("89504e47", "image/png"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),  # RIFF (also webp/avi; refined by later bytes)
    ("494433", "audio/mpeg"),
    ("664c6143", "audio/flac"),
    ("4f676753", "audio/ogg"),
    ("1a45dfa3", "video/webm"),  # EBML (webm/mkv; refined by DocType)
    ("000000", "video/mp4"),
]

FEATURE_DIM = 8

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("mm_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def sniff_mime(col):
    hexhead = F.lower(F.hex(F.substring(col, 1, 4)))
    out = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        out = F.when(hexhead.startswith(magic), F.lit(mime)).otherwise(out)
    return out


def _fake_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder: features derived from payload bytes.

    Real implementation would call PIL/librosa/ffmpeg here; the batch
    shape, Arrow transfer, and output schema are identical.
    """
    import numpy as np

    for pdf in batches:
        ids = pdf["mm_id"].to_numpy()
        feats = []
        widths = []
        heights = []
        for payload in pdf["payload"]:
            b = bytes(payload or b"")
            h = int.from_bytes(__import__("hashlib").md5(b).digest()[:8], "big")
            rng = np.random.default_rng(h % (2**63))
            feats.append(rng.standard_normal(FEATURE_DIM).astype("float32"))
            widths.append(int(h % 1920) + 1)
            heights.append(int((h >> 16) % 1080) + 1)
        yield pd.DataFrame(
            {"mm_id": ids, "features": feats, "width": widths, "height": heights}
        )


@module("multimodal", kind=KIND_TRANSFORM)
def multimodal_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    df = ctx.input
    op = str(p.get("op", "extract_meta")).lower()
    payload_field = p.get("field", "payload")
    id_field = p.get("idField", "mm_id")

    if op == "extract_meta":
        out = df.withColumn("mime", sniff_mime(F.col(payload_field))).withColumn(
            "payload_size", F.length(F.col(payload_field))
        )
        return {"": out}

    if op in ("decode", "feature_extract"):
        narrowed = df.select(
            F.col(id_field).cast("long").alias("mm_id"),
            F.col(payload_field).alias("payload"),
        )
        if p.get("fake", False):
            decode_fn = _fake_decode_batches
        else:
            null_on_error = str(p.get("onError", "fail")).lower() == "null"

            def real_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                from pipeline_spark.functions.imagecodec import (
                    decode_image,
                    image_features,
                )

                for pdf in batches:
                    recs = []
                    for mm_id, payload in zip(pdf["mm_id"], pdf["payload"]):
                        try:
                            arr = decode_image(bytes(payload or b""))
                            recs.append(
                                {
                                    "mm_id": mm_id,
                                    "features": image_features(arr, FEATURE_DIM),
                                    "width": int(arr.shape[1]),
                                    "height": int(arr.shape[0]),
                                }
                            )
                        except Exception:
                            if not null_on_error:
                                raise
                            recs.append(
                                {"mm_id": mm_id, "features": None,
                                 "width": None, "height": None}
                            )
                    yield pd.DataFrame(recs, columns=["mm_id", "features", "width", "height"])

            decode_fn = real_decode
        decoded = narrowed.mapInPandas(decode_fn, schema=_DECODE_SCHEMA)
        decoded = decoded.withColumnRenamed("mm_id", "__decoded_id__")
        joined = df.join(
            decoded, df[id_field] == decoded["__decoded_id__"], "left"
        ).drop("__decoded_id__")
        return {"": joined}

    if op == "resize":
        # image resize: payload in → payload out + new dims.  Real path:
        # decode (stdlib PNG/BMP, else Pillow) → bilinear resample →
        # re-encode PNG.  ``fake: true`` passes bytes through with the
        # target dims stamped — identical schema/batch shape.
        width = int(p.get("width", 224))
        height = int(p.get("height", 224))
        schema = T.StructType(
            [
                *df.schema.fields,
                T.StructField("resized", T.BinaryType()),
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
            ]
        )

        if p.get("fake", False):

            def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    out = pdf.copy()
                    out["resized"] = [bytes(b or b"") for b in pdf[payload_field]]
                    out["width"] = width
                    out["height"] = height
                    yield out

        else:
            null_on_error = str(p.get("onError", "fail")).lower() == "null"

            def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                from pipeline_spark.functions.imagecodec import (
                    decode_image,
                    encode_png,
                    resize_bilinear,
                )

                for pdf in batches:
                    out = pdf.copy()
                    resized, ws, hs = [], [], []
                    for b in pdf[payload_field]:
                        try:
                            arr = resize_bilinear(
                                decode_image(bytes(b or b"")), width, height
                            )
                            resized.append(encode_png(arr))
                            ws.append(width)
                            hs.append(height)
                        except Exception:
                            if not null_on_error:
                                raise
                            resized.append(None)
                            ws.append(None)
                            hs.append(None)
                    out["resized"] = resized
                    out["width"] = ws
                    out["height"] = hs
                    yield out

        return {"": df.mapInPandas(resize, schema=schema)}

    if op == "audio_features":
        null_on_error = str(p.get("onError", "fail")).lower() == "null"
        schema = T.StructType(
            [
                *df.schema.fields,
                T.StructField("duration_s", T.DoubleType()),
                T.StructField("sample_rate", T.IntegerType()),
                T.StructField("channels", T.IntegerType()),
                T.StructField("audio_features", T.ArrayType(T.FloatType())),
            ]
        )

        def afeat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pipeline_spark.functions.audiocodec import audio_features, decode_audio

            for pdf in batches:
                out = pdf.copy()
                durs, rates, chans, feats = [], [], [], []
                for b in pdf[payload_field]:
                    try:
                        samples, rate = decode_audio(bytes(b or b""))
                        durs.append(len(samples) / float(rate))
                        rates.append(rate)
                        chans.append(samples.shape[1])
                        feats.append(audio_features(samples, rate, FEATURE_DIM))
                    except Exception:
                        if not null_on_error:
                            raise
                        durs.append(None)
                        rates.append(None)
                        chans.append(None)
                        feats.append(None)
                out["duration_s"] = durs
                out["sample_rate"] = rates
                out["channels"] = chans
                out["audio_features"] = feats
                yield out

        return {"": df.mapInPandas(afeat, schema=schema)}

    if op == "audio_resample":
        target_rate = int(p.get("sampleRate", 16000))
        null_on_error = str(p.get("onError", "fail")).lower() == "null"
        schema = T.StructType(
            [
                *df.schema.fields,
                T.StructField("resampled", T.BinaryType()),
                T.StructField("sample_rate", T.IntegerType()),
            ]
        )

        def aresample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pipeline_spark.functions.audiocodec import (
                decode_audio,
                encode_wav,
                resample_linear,
            )

            for pdf in batches:
                out = pdf.copy()
                blobs, rates = [], []
                for b in pdf[payload_field]:
                    try:
                        samples, rate = decode_audio(bytes(b or b""))
                        blobs.append(
                            encode_wav(
                                resample_linear(samples, rate, target_rate),
                                target_rate,
                            )
                        )
                        rates.append(target_rate)
                    except Exception:
                        if not null_on_error:
                            raise
                        blobs.append(None)
                        rates.append(None)
                out["resampled"] = blobs
                out["sample_rate"] = rates
                yield out

        return {"": df.mapInPandas(aresample, schema=schema)}

    if op == "frame_sample":
        # video frame sampling: ONE input row → N output rows
        # (mm_id, frame_idx, frame payload, ts_sec).  REAL for GIF
        # animations (stdlib LZW decode → PNG frames); mp4/webm need
        # ffmpeg/pyav (absent) and raise actionably.  ``fake: true``
        # emits deterministic hash-derived frames through the identical
        # exploding mapInPandas shape.
        n_frames = int(p.get("frames", 8))
        fake = bool(p.get("fake", False))
        null_on_error = str(p.get("onError", "fail")).lower() == "null"
        frame_schema = T.StructType(
            [
                T.StructField("mm_id", T.LongType()),
                T.StructField("frame_idx", T.IntegerType()),
                T.StructField("ts_sec", T.FloatType()),
                T.StructField("frame", T.BinaryType()),
            ]
        )
        narrowed = df.select(
            F.col(id_field).cast("long").alias("mm_id"),
            F.col(payload_field).alias("payload"),
        )

        emit_raw = str(p.get("emit", "image")).lower() == "raw"

        def _real_frames(b: bytes) -> list[tuple[float, bytes]]:
            """REAL for GIF animations (stdlib LZW decoder, uniform frame
            sampling, PNG re-encode) and — with ``emit: raw`` — for MP4:
            the sample table resolves keyframe ACCESS UNITS, emitted as
            raw payloads with their timestamps (the shard-for-GPU-decode
            pattern); decoding those to pixels needs ffmpeg/pyav."""
            if b[:6] in (b"GIF87a", b"GIF89a"):
                from pipeline_spark.functions.gifcodec import decode_gif_frames
                from pipeline_spark.functions.imagecodec import encode_png

                decoded = decode_gif_frames(b)
                step = max(1, len(decoded) // n_frames)
                picked = decoded[::step][:n_frames]
                ts = 0.0
                out = []
                starts = []
                for delay, _ in decoded:
                    starts.append(ts)
                    ts += delay / 1000.0
                for j, (_, frame) in enumerate(picked):
                    out.append((starts[j * step], encode_png(frame)))
                return out
            if len(b) > 8 and b[4:8] in (b"ftyp", b"moov", b"mdat"):
                if not emit_raw:
                    raise NotImplementedError(
                        "mp4 frame decode needs ffmpeg/pyav; pass "
                        "emit: raw to extract keyframe access units "
                        "natively, or fake: true for the stub"
                    )
                from pipeline_spark.functions.mp4box import (
                    parse_mp4,
                    resolve_samples,
                )

                meta = parse_mp4(b)
                vids = [t for t in meta["tracks"] if t["type"] == "vide"]
                if not vids:
                    raise ValueError("mp4: no video track")
                keys = [
                    s for s in resolve_samples(b, vids[0]) if s["sync"]
                ]
                step = max(1, len(keys) // n_frames)
                picked = keys[::step][:n_frames]
                return [
                    (s["ts_s"], b[s["offset"] : s["offset"] + s["size"]])
                    for s in picked
                ]
            raise NotImplementedError(
                "video frame sampling is real for GIF (pixels) and MP4 "
                "(emit: raw keyframe access units); other containers need "
                "ffmpeg (not in container) — pass fake: true for the stub"
            )

        def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import hashlib

            for pdf in batches:
                ids, idxs, tss, frames = [], [], [], []
                for mm_id, payload in zip(pdf["mm_id"], pdf["payload"]):
                    b = bytes(payload or b"")
                    if fake:
                        digest = hashlib.md5(b).digest()
                        for i in range(n_frames):
                            ids.append(mm_id)
                            idxs.append(i)
                            tss.append(float(i))
                            # real impl: container.decode(video=0) keyframes
                            frames.append(digest + i.to_bytes(4, "big"))
                        continue
                    try:
                        picked = _real_frames(b)
                    except Exception:
                        if not null_on_error:
                            raise
                        ids.append(mm_id)
                        idxs.append(None)
                        tss.append(None)
                        frames.append(None)
                        continue
                    for i, (ts_sec, blob) in enumerate(picked):
                        ids.append(mm_id)
                        idxs.append(i)
                        tss.append(float(ts_sec))
                        frames.append(blob)
                yield pd.DataFrame(
                    {"mm_id": ids, "frame_idx": idxs, "ts_sec": tss, "frame": frames}
                )

        return {"": narrowed.mapInPandas(sample, schema=frame_schema)}

    if op == "video_meta":
        # REAL container-level video metadata: ISO-BMFF via the box parser
        # (functions/mp4box.py: mvhd/tkhd/mdhd/hdlr/stsd/stsz/stss) and
        # Matroska/WebM via the EBML parser (functions/mediacontainers.py)
        # — duration, dimensions, codec, sample/keyframe counts, fps —
        # no ffmpeg needed (pixel decode stays gated).
        null_on_error = str(p.get("onError", "fail")).lower() == "null"
        schema = T.StructType(
            [
                *df.schema.fields,
                T.StructField("duration_s", T.DoubleType()),
                T.StructField("video_width", T.IntegerType()),
                T.StructField("video_height", T.IntegerType()),
                T.StructField("video_codec", T.StringType()),
                T.StructField("n_samples", T.IntegerType()),
                T.StructField("n_keyframes", T.IntegerType()),
                T.StructField("fps", T.DoubleType()),
            ]
        )

        def vmeta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pipeline_spark.functions.mediacontainers import parse_matroska
            from pipeline_spark.functions.mp4box import parse_mp4

            cols = (
                "duration_s", "video_width", "video_height", "video_codec",
                "n_samples", "n_keyframes", "fps",
            )
            for pdf in batches:
                out = pdf.copy()
                vals: dict[str, list] = {c: [] for c in cols}
                for b in pdf[payload_field]:
                    try:
                        raw = bytes(b or b"")
                        if raw[:4] == b"\x1a\x45\xdf\xa3":
                            meta = parse_matroska(raw)
                            vids = [
                                t for t in meta["tracks"] if t["type"] == "video"
                            ]
                            v = vids[0] if vids else {}
                            vals["duration_s"].append(meta["duration_s"])
                            vals["video_width"].append(v.get("width"))
                            vals["video_height"].append(v.get("height"))
                            vals["video_codec"].append(v.get("codec"))
                            vals["n_samples"].append(v.get("n_blocks"))
                            vals["n_keyframes"].append(v.get("n_keyframes"))
                            vals["fps"].append(v.get("fps"))
                            continue
                        meta = parse_mp4(raw)
                        vids = [
                            t for t in meta["tracks"] if t["type"] == "vide"
                        ]
                        v = vids[0] if vids else {}
                        vals["duration_s"].append(meta["duration_s"])
                        vals["video_width"].append(
                            int(v["width"]) if v.get("width") else None
                        )
                        vals["video_height"].append(
                            int(v["height"]) if v.get("height") else None
                        )
                        vals["video_codec"].append(v.get("codec"))
                        vals["n_samples"].append(v.get("n_samples"))
                        vals["n_keyframes"].append(v.get("n_keyframes"))
                        vals["fps"].append(v.get("fps"))
                    except Exception:
                        if not null_on_error:
                            raise
                        for c in cols:
                            vals[c].append(None)
                for c in cols:
                    out[c] = vals[c]
                yield out

        return {"": df.mapInPandas(vmeta, schema=schema)}

    if op == "audio_meta":
        # header-only audio metadata across containers (WAV/FLAC/MP3/
        # Ogg-Vorbis/Opus/Matroska/MP4) — no PCM decode, so it works for
        # codecs whose payload decode is gated (mp3/vorbis/opus/aac)
        null_on_error = str(p.get("onError", "fail")).lower() == "null"
        schema = T.StructType(
            [
                *df.schema.fields,
                T.StructField("container", T.StringType()),
                T.StructField("audio_codec", T.StringType()),
                T.StructField("duration_s", T.DoubleType()),
                T.StructField("sample_rate", T.IntegerType()),
                T.StructField("channels", T.IntegerType()),
                T.StructField("n_frames", T.IntegerType()),
            ]
        )

        def ameta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pipeline_spark.functions.mediacontainers import parse_audio_meta

            cols = (
                "container", "audio_codec", "duration_s", "sample_rate",
                "channels", "n_frames",
            )
            for pdf in batches:
                out = pdf.copy()
                vals: dict[str, list] = {c: [] for c in cols}
                for b in pdf[payload_field]:
                    try:
                        m = parse_audio_meta(bytes(b or b""))
                        vals["container"].append(m["container"])
                        vals["audio_codec"].append(m["codec"])
                        vals["duration_s"].append(m["duration_s"])
                        vals["sample_rate"].append(m["sample_rate"])
                        vals["channels"].append(m["channels"])
                        vals["n_frames"].append(m["n_frames"])
                    except Exception:
                        if not null_on_error:
                            raise
                        for c in cols:
                            vals[c].append(None)
                for c in cols:
                    out[c] = vals[c]
                yield out

        return {"": df.mapInPandas(ameta, schema=schema)}

    raise ValueError(f"multimodal: unknown op '{op}'")
