"""`reshuffle` transform: redistribute rows across workers.

Reference: module/transform/ReshuffleTransform.java:8-29 — breaks Beam
fusion to rebalance parallelism (docs/config/module/transform/reshuffle.md:20).

Spark stage boundaries differ (whole-stage codegen + AQE handle most
rebalancing), but the knob is preserved: ``repartition(numShards[, keys])``
for an explicit exchange, or ``rebalance`` hint to let AQE size it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


@module("reshuffle", kind=KIND_TRANSFORM)
def reshuffle_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = ctx.input
    n = p.get("numShards") or p.get("numPartitions")
    keys = p.get("fields") or []
    if keys and n:
        out = df.repartition(int(n), *[F.col(k) for k in keys])
    elif keys:
        out = df.repartition(*[F.col(k) for k in keys])
    elif n:
        out = df.repartition(int(n))
    else:
        out = df.hint("rebalance")
    return {"": out}
