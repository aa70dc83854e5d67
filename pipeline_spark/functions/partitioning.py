"""Parallelism helpers for compute-heavy per-row operators.

A small parquet file is one row-group → one Spark task → 31 of 32 cores
idle under expression-heavy ops (minhash/simhash signatures, tokenize).
``spread`` repartitions ONLY when the plan's partition count is below the
cluster's default parallelism — at 100 TB the scan already yields thousands
of partitions and this is a no-op (no extra shuffle); on small inputs it
buys full-core fan-out for one cheap round-robin exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    try:
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current < target * min_factor:
        return df.repartition(target)
    return df
