"""`sessionize` transform: assign session ids to events by inactivity gap.

Event-pipeline extension (no reference analogue; the reference's session
windows AGGREGATE per session — `strategy.window: session` — while this
LABELS each event so downstream per-event features can reference their
session).  Classic shape: within each key, an event starts a new session
when the gap to the previous event exceeds ``gapSeconds``; the session
id is the running count of session starts.

Cost: ONE shuffle on the keys + a per-partition sort — the same bill as
any keyed window.  A key's history must fit one task's window partition
(the standard Spark window contract; same posture as asof/matchrec).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def sessionize(
    df: DataFrame,
    keys: list[str],
    *,
    timestamp: str,
    gap_seconds: float,
    session_field: str = "session_id",
) -> DataFrame:
    """Append ``session_field``: 1-based per-key session ordinal.

    Events with a NULL timestamp cannot be placed in a session and keep
    a NULL session id.
    """
    if not keys:
        raise ValueError("sessionize: requires at least one key")
    if gap_seconds <= 0:
        raise ValueError(f"sessionize: gapSeconds must be > 0, got {gap_seconds}")
    ts = F.col(timestamp).cast("timestamp")
    w = Window.partitionBy(*keys).orderBy(ts.asc())
    gap_us = int(gap_seconds * 1_000_000)
    prev = F.lag(F.unix_micros(ts)).over(w)
    # NULL-timestamp rows sort first under asc ordering — they must not
    # consume a session ordinal (their own id is NULLed in the output)
    new_session = (
        F.when(ts.isNull(), 0)
        .when(prev.isNull() | ((F.unix_micros(ts) - prev) > F.lit(gap_us)), 1)
        .otherwise(0)
    )
    sid = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        session_field, F.when(ts.isNotNull(), sid).cast("long")
    )


@module("sessionize", kind=KIND_TRANSFORM)
def sessionize_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    gap = p.get("gapSeconds") or p.get("gap")
    if gap is None:
        raise ValueError("sessionize requires gapSeconds")
    return {
        "": sessionize(
            ctx.input,
            p.get("keys") or p.get("groupFields") or [],
            timestamp=p.get("timestampField")
            or ctx.config.get("timestampAttribute")
            or "ts",
            gap_seconds=float(gap),
            session_field=p.get("sessionField", "session_id"),
        )
    }
