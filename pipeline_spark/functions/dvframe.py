"""Deletion-vector / position-delete frame with a deliberate join
strategy (guide §3: pick the build side from what the driver already
knows).

A merge-on-read scan subtracts deleted ``(file, position)`` pairs with a
left-anti join.  The positions frame used to be built unconditionally
from an RDD (executor-side bitmap decode) — correct at any scale, but an
RDD-backed frame has no Catalyst stats, so the anti-join planned as a
SortMergeJoin: an extra Exchange + Sort ON THE DATA PATH even when the
table holds a handful of deleted rows.  The table metadata already
records the exact deleted-row count (manifest ``record_count`` = DV
cardinality for Iceberg, the descriptor's ``cardinality`` for Delta), so
the driver picks the strategy the way a cost-based planner would:

- cardinality known and small (``<= SPARK_GRAFT_DV_DRIVER_MAX`` rows,
  default 131072): decode the bitmaps on the driver (KB-scale blobs,
  local reads — no Spark job, no Python-worker round trip) and broadcast
  the positions frame; the anti-join becomes a BroadcastHashJoin with
  zero added exchanges.
- large or unknown: the original executor-side decode; positions never
  materialize on the driver (a DV set can carry billions of rows at
  100 TB).
"""
from __future__ import annotations

import os


def _driver_max() -> int:
    return int(os.environ.get("SPARK_GRAFT_DV_DRIVER_MAX", "131072"))


def total_rows_of(counts) -> int | None:
    """Sum per-file deleted-row counts; None if any is unknown."""
    total = 0
    for c in counts:
        if c is None:
            return None
        total += int(c)
    return total


def positions_frame(spark, entries: list, decode, schema: str,
                    total_rows: int | None):
    """Build the deleted-positions frame.

    ``entries`` is the per-file descriptor list, ``decode`` an
    iterator-of-entries -> iterator-of-row-tuples function that runs
    identically on the driver or inside ``mapPartitions``.  Returns
    ``(frame, small)``; the caller broadcast-hints the anti-join input
    when ``small`` (hinting here could be lost under a later
    projection).
    """
    if total_rows is not None and int(total_rows) <= _driver_max():
        from pipeline_spark.functions.localframe import local_frame

        return local_frame(spark, decode(iter(entries)), schema), True
    n = max(1, min(len(entries), 64))
    return (
        spark.createDataFrame(
            spark.sparkContext.parallelize(entries, n).mapPartitions(decode),
            schema,
        ),
        False,
    )
