"""`rangejoin` transform: point-in-interval join via interval binning.

Training-data / event-pipeline extension (no reference analogue; the
binning technique is the public "range join optimization" every engine
documents): match each left row's point value to the right intervals
containing it (``lo <= p <= hi``, bounds inclusive), with optional extra
equality keys.

A naive ``p BETWEEN lo AND hi`` condition gives Catalyst nothing to
hash on — it plans a broadcast-nested-loop (quadratic work, and a
broadcast that dies at scale).  The binned shape restores an equi-join:
each interval explodes into the fixed-width bins it covers, each point
computes its single bin, both sides hash-join on (keys, bin), and the
exact BETWEEN filter runs only on same-bin candidates.  Cost scales
with true match density plus interval_span/binSize fan-out — pick
``binSize`` near the typical interval width so most intervals explode
into O(1) bins.  ``maxBinsPerInterval`` (default 10k) fails fast on a
binSize/interval mismatch that would explode the build side.

Numeric and timestamp domains both work: timestamps bin on epoch
microseconds.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def _to_num(col, dtype):
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    return col.cast("double")


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    point: str,
    lo: str,
    hi: str,
    bin_size: float,
    keys: list[str] | None = None,
    how: str = "inner",
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    if bin_size <= 0:
        raise ValueError(f"rangejoin: binSize must be > 0, got {bin_size}")
    if how not in ("inner", "left"):
        raise ValueError(f"rangejoin: how must be inner or left, got '{how}'")
    keys = keys or []
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"rangejoin: key '{k}' must exist on both sides")

    pnum = _to_num(F.col(point), left.schema[point].dataType)
    lonum = _to_num(F.col(lo), right.schema[lo].dataType)
    hinum = _to_num(F.col(hi), right.schema[hi].dataType)

    lbin = F.floor(pnum / F.lit(bin_size))
    lo_bin = F.floor(lonum / F.lit(bin_size))
    hi_bin = F.floor(hinum / F.lit(bin_size))
    nbins = (hi_bin - lo_bin + 1).cast("long")

    guard = F.when(
        nbins > max_bins_per_interval,
        F.raise_error(
            F.concat(
                F.lit(
                    f"rangejoin: an interval spans more than "
                    f"maxBinsPerInterval={max_bins_per_interval} bins of "
                    f"binSize={bin_size}; raise binSize toward the typical "
                    f"interval width (interval: "
                ),
                F.col(lo).cast("string"), F.lit(" .. "),
                F.col(hi).cast("string"), F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(nbins)

    exploded = right.filter(lonum <= hinum).withColumn(
        "__bin__",
        F.explode(F.sequence(lo_bin, lo_bin + guard - 1)),
    )
    binned_left = left.withColumn("__bin__", lbin)
    cond = [binned_left["__bin__"] == exploded["__bin__"]] + [
        binned_left[k].eqNullSafe(exploded[k]) for k in keys
    ]
    joined = binned_left.join(exploded, cond, "inner").where(
        (pnum >= lonum) & (pnum <= hinum)
    )
    # resolve duplicate columns: keep left's copies of the keys
    out_cols = [binned_left[c] for c in left.columns] + [
        exploded[c] for c in right.columns if c not in keys
    ]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    # left outer: append the never-matched left rows with null right cols.
    # The anti-join must be NULL-SAFE on every column — a left row whose
    # payload holds nulls (e.g. an upstream outer join) compares unequal
    # to its own matched copy under plain equality and would duplicate.
    import functools
    import operator

    msel = matched.select(*[F.col(c) for c in left.columns]).distinct()
    cond2 = functools.reduce(
        operator.and_, [left[c].eqNullSafe(msel[c]) for c in left.columns]
    )
    unmatched = left.join(msel, cond2, "left_anti")
    for c in right.columns:
        if c not in keys:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(right.schema[c].dataType)
            )
    return matched.unionByName(unmatched)


@module("rangejoin", kind=KIND_TRANSFORM)
def rangejoin_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    if not ctx.side_inputs:
        raise ValueError("rangejoin requires the intervals side as a sideInput")
    right = next(iter(ctx.side_inputs.values()))
    for req in ("point", "lo", "hi", "binSize"):
        if p.get(req) is None:
            raise ValueError(f"rangejoin requires '{req}'")
    return {
        "": range_join(
            ctx.input,
            right,
            point=p["point"],
            lo=p["lo"],
            hi=p["hi"],
            bin_size=float(p["binSize"]),
            keys=p.get("keys"),
            how=str(p.get("how", "inner")).lower(),
            max_bins_per_interval=int(p.get("maxBinsPerInterval", 10_000)),
        )
    }
