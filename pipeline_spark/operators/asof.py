"""`asof` transform: as-of (temporal nearest-event) join.

Training-data / event-pipeline extension (no reference analogue; the
public semantics are pandas ``merge_asof`` / DuckDB & QuestDB ASOF
JOIN): for every left row, attach the single right row with the same
equality keys whose timestamp is the latest at-or-before the left
timestamp (``backward``, default), the earliest at-or-after
(``forward``), or the closer of the two (``nearest``), optionally
bounded by ``toleranceSeconds``.

The Spark-first shape is NOT a join: both sides union into one frame
tagged by side, ONE shuffle partitions by the equality keys, and a
running ``last(..., ignorenulls)`` window ordered by (timestamp, side)
carries each right row's payload forward onto the left rows that follow
it — right rows sort before left rows at equal timestamps, so "at or
before" includes ties.  Cost: one exchange + per-partition sort,
identical to the sort-merge join Spark would plan, but with no
row-multiplication and no range-condition fallback to broadcast-nested-
loop (what a naive ``ts_r <= ts_l`` theta-join degenerates to).

Equal-key-equal-timestamp right duplicates resolve by ``tieBreaker``
(a right column; highest wins for backward) when given, else
arbitrarily — the same contract DuckDB's ASOF JOIN has.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
    tie_breaker: str | None = None,
) -> DataFrame:
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof: unknown direction '{direction}'")
    if not on:
        raise ValueError("asof: requires at least one equality key in 'on'")
    if tolerance_seconds is not None and tolerance_seconds < 0:
        raise ValueError(
            f"asof: toleranceSeconds must be >= 0, got {tolerance_seconds}"
        )
    rts = right_ts or left_ts
    for k in on:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"asof: key '{k}' must exist on both sides")

    # right payload columns, renamed on collision with the left schema
    payload = [c for c in right.columns if c not in on and c != rts]
    renames = {c: (c + suffix if c in left.columns else c) for c in payload}
    matched_ts = rts + suffix if rts in left.columns else rts
    if tie_breaker is not None and tie_breaker not in right.columns:
        raise ValueError(f"asof: tieBreaker '{tie_breaker}' not a right column")

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast("double").alias("__tie__"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(renames[c]) for c in payload],
        F.lit(None).cast(right.schema[rts].dataType).alias(matched_ts),
    )
    rhs = right.select(
        *[F.col(k) for k in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        F.col(rts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        (F.col(tie_breaker).cast("double") if tie_breaker else F.lit(0.0)).alias("__tie__"),
        *[F.col(c).alias(renames[c]) for c in payload],
        F.col(rts).alias(matched_ts),
    ).filter(F.col("__ts__").isNotNull())
    unioned = lhs.unionByName(rhs)

    carried = [renames[c] for c in payload] + [matched_ts]

    def carry(df: DataFrame, ascending: bool, tag: str) -> DataFrame:
        # right rows must sort on the "already seen" side of left rows at
        # equal timestamps: ts asc + side asc for backward, ts desc + side
        # asc for forward.  tieBreaker orders equal-ts right duplicates so
        # the winner is deterministic.
        order = [
            F.col("__ts__").asc() if ascending else F.col("__ts__").desc(),
            F.col("__side__").asc(),
            F.col("__tie__").asc() if ascending else F.col("__tie__").desc(),
        ]
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = df
        for c in carried:
            src = F.when(F.col("__side__") == 0, F.col(c))
            out = out.withColumn(tag + c, F.last(src, ignorenulls=True).over(w))
        return out

    if direction == "backward":
        result = carry(unioned, True, "__b_")
        pick = {c: F.col("__b_" + c) for c in carried}
        b_ts = F.col("__b_" + matched_ts)
        within = _within(b_ts, tolerance_seconds, backward=True)
    elif direction == "forward":
        result = carry(unioned, False, "__f_")
        pick = {c: F.col("__f_" + c) for c in carried}
        f_ts = F.col("__f_" + matched_ts)
        within = _within(f_ts, tolerance_seconds, backward=False)
    else:  # nearest: run both carries, choose the closer matched ts
        result = carry(carry(unioned, True, "__b_"), False, "__f_")
        b_ts, f_ts = F.col("__b_" + matched_ts), F.col("__f_" + matched_ts)
        b_ok = _within(b_ts, tolerance_seconds, backward=True)
        f_ok = _within(f_ts, tolerance_seconds, backward=False)
        b_gap = F.unix_micros(F.col("__ts__").cast("timestamp")) - F.unix_micros(
            b_ts.cast("timestamp")
        )
        f_gap = F.unix_micros(f_ts.cast("timestamp")) - F.unix_micros(
            F.col("__ts__").cast("timestamp")
        )
        # prefer backward on exact-distance ties (pandas contract)
        use_b = b_ok & (~f_ok | (b_gap <= f_gap))
        pick = {
            c: F.when(use_b, F.col("__b_" + c)).otherwise(
                F.when(f_ok, F.col("__f_" + c))
            )
            for c in carried
        }
        within = b_ok | f_ok

    out = result.filter(F.col("__side__") == 1)
    for c in carried:
        out = out.withColumn(c, F.when(within, pick[c]))
    drop = [x for x in out.columns if x.startswith(("__b_", "__f_"))]
    return out.drop("__ts__", "__side__", "__tie__", *drop)


def _within(matched_ts, tolerance_seconds: float | None, *, backward: bool):
    """Tolerance gate as a Column; True when no tolerance configured."""
    if tolerance_seconds is None:
        return matched_ts.isNotNull()
    gap = F.unix_micros(F.col("__ts__").cast("timestamp")) - F.unix_micros(
        matched_ts.cast("timestamp")
    )
    gap = gap if backward else -gap
    return matched_ts.isNotNull() & (gap <= F.lit(int(tolerance_seconds * 1_000_000)))


@module("asof", kind=KIND_TRANSFORM)
def asof_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    if not ctx.side_inputs:
        raise ValueError("asof requires the right side as a sideInput")
    right = next(iter(ctx.side_inputs.values()))
    tol = p.get("toleranceSeconds")
    return {
        "": asof_join(
            ctx.input,
            right,
            # "keys" preferred: a bare `on` key is YAML-1.1 boolean True
            p.get("keys") or p.get("on") or p.get(True) or [],
            left_ts=p.get("leftTimestamp", "ts"),
            right_ts=p.get("rightTimestamp"),
            direction=str(p.get("direction", "backward")).lower(),
            tolerance_seconds=float(tol) if tol is not None else None,
            suffix=p.get("suffix", "_right"),
            tie_breaker=p.get("tieBreaker"),
        )
    }
