"""Single-partition driver-side frames for metadata-scale lookup inputs
(file -> fill values, row-id bases, per-file sequence numbers, decoded
DV positions).

``spark.createDataFrame(list)`` slices the list across
``defaultParallelism`` partitions — on ``local[32]`` a 5-row lookup
frame becomes a 32-task stage inside EVERY broadcast-exchange build that
consumes it, and DML paths consume several per commit.  One partition
makes each broadcast build a single task (guide §5: driver/job overhead
dominates metadata-scale work)."""
from __future__ import annotations


def local_frame(spark, rows, schema: str):
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
