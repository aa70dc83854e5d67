"""`profile` transform: one-pass column profiling (data-quality summary).

Training-data-pipeline extension (no reference analogue): before
committing 100 TB to a training mix, you profile it — null rates,
cardinalities, ranges, means — and alert on drift.  The whole profile is
ONE aggregation pass: every column's statistics compute as parallel
aggregate expressions over a single scan (Catalyst plans multi-distinct
via expand), then the one result row explodes into a row per column.
Nothing but the final 1×C row ever leaves the executors.

``approxDistinct: true`` swaps exact ``count(DISTINCT)`` for HyperLogLog
``approx_count_distinct`` (2.5 % default rsd) — the scale path when a
column is URL-like and the exact distinct's expand would multiply scan
rows by the column count.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def _pname(p: float) -> str:
    s = f"{p * 100:g}".replace(".", "_")
    return f"p{s}"


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx_distinct: bool = False,
    percentiles: list[float] | None = None,
    decimal_stats: bool = False,
    integer_stats: bool = False,
) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, n_distinct, min_value, max_value,
    mean[, pNN...]) — min/max compare on the NATIVE type and cast the
    result, so numeric ranges are numeric, not lexicographic.
    ``percentiles`` adds one exact linear-interpolated quantile column
    per requested fraction (null for non-numeric columns); at URL scale
    prefer few fractions — each is a full-sort aggregate per column.

    ``decimal_stats=True`` makes the float statistics hash-stable across
    engines and partitionings: integral means accumulate as an EXACT
    decimal(38,0) sum (``F.avg`` over integers sums in double, so the
    6th decimal of the mean can flip with partition order at scale)
    followed by one double division, and mean/percentiles emit as
    DECIMAL(38,6) so rendering is fixed-width on every engine.

    ``integer_stats=True`` goes further: the float statistics emit as
    scaled BIGINT micro-units (``mean_micros = round(mean * 1e6)``,
    same for each percentile) — integers admit exactly one
    representation on every engine, ending any decimal/float rendering
    divergence entirely.  Uses the same exact-decimal-sum pathway for
    integral means."""
    if decimal_stats and integer_stats:
        raise ValueError("profile: decimalStats and integerStats are exclusive")
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile: unknown columns {missing}")
    for p in percentiles or []:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"profile: percentile {p} outside [0, 1]")
    stat_type = (
        "bigint" if integer_stats
        else "decimal(38,6)" if decimal_stats
        else "double"
    )
    suffix = "_micros" if integer_stats else ""

    def _stat(col_expr):
        if integer_stats:
            return F.round(col_expr * F.lit(1e6), 0).cast("long")
        rounded = F.round(col_expr, 6)
        return rounded.cast(stat_type) if decimal_stats else rounded

    structs = []
    for c in cols:
        dt = df.schema[c].dataType
        numeric = isinstance(dt, T.NumericType)
        integral = isinstance(dt, T.IntegralType)
        distinct = (
            F.approx_count_distinct(c) if approx_distinct else F.countDistinct(c)
        )
        if not numeric:
            mean = F.lit(None).cast(stat_type)
        elif integral and (decimal_stats or integer_stats):
            # exact decimal sum, ONE double division: partition-order-proof
            mean = _stat(
                F.sum(F.col(c).cast("decimal(38,0)")).cast("double")
                / F.count(F.col(c))
            )
        else:
            mean = _stat(F.avg(F.col(c)))
        fields = [
            F.lit(c).alias("column"),
            F.lit(dt.simpleString()).alias("dtype"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            distinct.alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
            mean.alias(f"mean{suffix}"),
        ]
        for p in percentiles or []:
            fields.append(
                (
                    _stat(F.percentile(F.col(c), F.lit(p)))
                    if numeric
                    else F.lit(None).cast(stat_type)
                ).alias(_pname(p) + suffix)
            )
        structs.append(F.struct(*fields))
    one_row = df.agg(F.array(*structs).alias("p"))
    return one_row.select(F.explode("p").alias("p")).select("p.*")


@module("profile", kind=KIND_TRANSFORM)
def profile_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    return {
        "": profile(
            ctx.input,
            p.get("columns") or p.get("fields"),
            approx_distinct=bool(p.get("approxDistinct", False)),
            percentiles=[float(x) for x in p.get("percentiles", [])] or None,
            decimal_stats=bool(p.get("decimalStats", False)),
            integer_stats=bool(p.get("integerStats", False)),
        )
    }
