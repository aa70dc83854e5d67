"""Distributed Bloom filter: membership sketch for incremental dedup.

The 100 TB use-case: a training-data pipeline re-crawls continuously and
must drop documents already ingested in previous runs WITHOUT joining
each new batch against the full history (a 100 TB shuffle).  A Bloom
filter over the history's content hashes is a few hundred MB at
billions of items, broadcasts to every executor, and answers "definitely
new" / "maybe seen" per row with k bit probes — no exchange at all on
the probe side.

Shape:
  build  one column of 64-bit content hashes (computed JVM-side with
         ``xxhash64``) → ``coalesce(max_build_partitions)`` (map-only,
         bounds the driver merge) → per-partition numpy bitmaps via
         ``mapInPandas`` (Arrow-vectorized set) → driver ORs ≤ 64
         bitmaps.  Comm cost = partitions × m/8 bytes, independent of
         row count.
  probe  broadcast the bitmap bytes; an Arrow-batched pandas UDF tests
         all k positions vectorized (k numpy gathers per batch).

Double hashing (Kirsch–Mitzenmacher): position_i = h1 + i·h2 (mod m)
with h1 = xxhash64(content) and h2 = splitmix64(h1) forced odd — two
independent-enough streams from one stored hash, so the exchange/broadcast
carries only 8 bytes per item.

False positives are possible (rate set by ``fpp``); false negatives are
not — "new" verdicts are always safe to ingest.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U64 = np.uint64


def size_for(expected_items: int, fpp: float) -> tuple[int, int]:
    """Classic sizing: m bits and k hashes for an expected n at target fpp.

    m rounds up to a multiple of 64 (whole words); k >= 1.
    """
    if expected_items <= 0:
        raise ValueError(f"bloom: expected_items must be > 0, got {expected_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"bloom: fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _splitmix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64."""
    z = (h + _U64(0x9E3779B97F4A7C15)).astype(_U64)
    z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
    z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)).astype(_U64)
    return (z ^ (z >> _U64(31))).astype(_U64)


def _positions(h: np.ndarray, i: int, m: int) -> np.ndarray:
    h1 = h.astype(np.int64).view(_U64)
    h2 = _splitmix64(h1) | _U64(1)  # odd → full-period stride
    return ((h1 + _U64(i) * h2) % _U64(m)).astype(np.int64)


def set_bits(bits: np.ndarray, h: np.ndarray, k: int, m: int) -> None:
    """Set all k positions for each hash in-place on a uint8 bitmap."""
    for i in range(k):
        pos = _positions(h, i, m)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))


def test_bits(bits: np.ndarray, h: np.ndarray, k: int, m: int) -> np.ndarray:
    """Boolean "maybe present" per hash (all k bits set)."""
    out = np.ones(len(h), dtype=bool)
    for i in range(k):
        pos = _positions(h, i, m)
        out &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    return out


def content_hash(fields: list[str]) -> Column:
    return F.xxhash64(*[F.col(f) for f in fields])


def build_bloom(
    df: DataFrame,
    fields: list[str],
    *,
    expected_items: int,
    fpp: float = 1e-6,
    max_build_partitions: int = 64,
) -> tuple[bytes, int, int]:
    """Build a filter over ``xxhash64(fields)``; returns (bitmap, m, k).

    The hash column is the ONLY thing that leaves the scan — 8 bytes per
    row, map-only.  ``coalesce`` (no shuffle) caps the number of partial
    bitmaps the driver merges, so driver memory is
    ``max_build_partitions * m/8`` bytes regardless of cluster size.
    """
    m, k = size_for(expected_items, fpp)
    nbytes = m // 8
    hashed = df.select(content_hash(fields).alias("h")).coalesce(max_build_partitions)

    def part_bitmap(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                set_bits(bits, pdf["h"].to_numpy(np.int64), k, m)
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = hashed.mapInPandas(part_bitmap, schema="bits binary").collect()
    merged = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row["bits"], dtype=np.uint8)
    return merged.tobytes(), m, k


_MAGIC = b"PSBLOOM1"


def save_filter(path: str, bitmap: bytes, m: int, k: int) -> None:
    """Persist a filter: 8-byte magic, m and k as 8-byte big-endian, bitmap.

    The file is what makes the dedup INCREMENTAL across runs: today's
    build is tomorrow's history."""
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(m.to_bytes(8, "big"))
        f.write(k.to_bytes(8, "big"))
        f.write(bitmap)


def load_filter(path: str) -> tuple[bytes, int, int]:
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"{path} is not a pipeline_spark bloom filter")
        m = int.from_bytes(f.read(8), "big")
        k = int.from_bytes(f.read(8), "big")
        bitmap = f.read()
    if len(bitmap) != m // 8:
        raise ValueError(
            f"{path}: bitmap is {len(bitmap)} bytes, header says {m // 8}"
        )
    return bitmap, m, k


def merge_filters(a: bytes, b: bytes) -> bytes:
    """Union two same-geometry filters (bitwise OR) — e.g. fold a new
    batch's build into the rolling history filter."""
    if len(a) != len(b):
        raise ValueError("bloom merge: filters must share m (byte length)")
    return (
        np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)
    ).tobytes()


def probe_bloom(
    df: DataFrame,
    fields: list[str],
    bitmap: bytes,
    m: int,
    k: int,
    *,
    flag: str = "__seen__",
) -> DataFrame:
    """Append a boolean "maybe seen" column; no exchange, no join."""
    spark = df.sparkSession
    bits_bc = spark.sparkContext.broadcast(np.frombuffer(bitmap, dtype=np.uint8))

    @F.pandas_udf("boolean")
    def seen(h: pd.Series) -> pd.Series:
        return pd.Series(test_bits(bits_bc.value, h.to_numpy(np.int64), k, m))

    return df.withColumn(flag, seen(content_hash(fields)))
