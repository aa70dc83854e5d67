"""`topk` transform: heavy hitters over a high-cardinality value column.

Training-data-pipeline extension (no reference analogue).  Use cases:
stop-gram / boilerplate discovery, hot-domain and hot-key diagnosis,
vocabulary heads — anywhere "what are the most frequent values" must run
over 100 TB where most values are unique.

Two strategies:

  exact   groupBy(value).count → top-k.  One shuffle whose map-side
          partial aggregate emits each partition's DISTINCT values — fine
          when per-partition distinct cardinality is modest, ruinous for
          URL-like columns where nearly every row is distinct (the
          exchange approaches corpus size).
  sketch  (default) the classic two-pass candidate/recount shape:
          1. per-partition Misra–Gries summaries with ``counters``
             entries (Arrow-batched; MG merge per batch is the standard
             mergeable form — add, then subtract the (counters+1)-th
             largest and drop non-positives).  Any value with global
             weight > total/counters is locally heavy in at least one
             partition (pigeonhole), so it SURVIVES into the candidate
             union, which is bounded by counters × partitions rows.
          2. exact recount of candidates only: broadcast the candidate
             set, semi-filter the scan, aggregate.  The final counts are
             EXACT — the sketch only prunes who gets counted — so
             results are deterministic and oracle-checkable whenever the
             true top-k clears the total/counters support floor.

Ties break on value ascending, making top-k selection total-ordered and
engine-reproducible.  ``weightField`` sums a weight (e.g. bytes per
domain) instead of counting rows.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def _mg_fold(summary: dict, vals, weights, counters: int) -> dict:
    """Mergeable Misra–Gries: fold a batch's value weights into a summary."""
    batch = pd.Series(weights).groupby(pd.Series(vals)).sum()
    for v, c in batch.items():
        summary[v] = summary.get(v, 0) + c
    if len(summary) > counters:
        cut = sorted(summary.values(), reverse=True)[counters]
        summary = {v: c - cut for v, c in summary.items() if c - cut > 0}
    return summary


def heavy_hitters(
    df: DataFrame,
    field: str,
    *,
    k: int = 100,
    counters: int = 4096,
    weight_field: str | None = None,
    strategy: str = "sketch",
) -> DataFrame:
    """(value, weight) rows for the top-k heaviest values, exact weights.

    Support guarantee: with the sketch strategy, every value whose global
    weight exceeds total_weight/``counters`` is guaranteed present; rarer
    values may be pruned.  Raise ``counters`` to lower the floor.
    """
    if k < 1:
        raise ValueError(f"topk: k must be >= 1, got {k}")
    if counters < k:
        raise ValueError(f"topk: counters ({counters}) must be >= k ({k})")
    if strategy not in ("sketch", "exact"):
        raise ValueError(f"topk: unknown strategy '{strategy}'")
    w = F.col(weight_field).cast("double") if weight_field else F.lit(1.0)
    vals = df.select(
        F.col(field).cast("string").alias("value"), w.alias("__w__")
    ).filter(F.col("value").isNotNull())

    agg = F.sum("__w__").alias("weight")
    if strategy == "exact":
        counted = vals.groupBy("value").agg(agg)
    else:
        def part_candidates(batches):
            summary: dict = {}
            for pdf in batches:
                if len(pdf):
                    summary = _mg_fold(
                        summary, pdf["value"], pdf["__w__"].to_numpy(), counters
                    )
            if summary:
                yield pd.DataFrame({"value": list(summary.keys())})

        candidates = vals.mapInPandas(
            part_candidates, schema="value string"
        ).distinct()
        # exact recount of candidates only: broadcast semi-filter keeps the
        # aggregation exchange at candidate cardinality, not corpus rows
        counted = (
            vals.join(F.broadcast(candidates), "value", "left_semi")
            .groupBy("value")
            .agg(agg)
        )
    return (
        counted.orderBy(F.col("weight").desc(), F.col("value").asc())
        .limit(k)
        .select("value", "weight")
    )


@module("topk", kind=KIND_TRANSFORM)
def topk_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    field = p.get("field")
    if not field:
        raise ValueError("topk requires 'field'")
    return {
        "": heavy_hitters(
            ctx.input,
            field,
            k=int(p.get("k", 100)),
            counters=int(p.get("counters", 4096)),
            weight_field=p.get("weightField"),
            strategy=str(p.get("strategy", "sketch")).lower(),
        )
    }
