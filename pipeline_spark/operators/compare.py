"""`compare` transform: diff N inputs by primary key, emit mismatches.

Reference: module/transform/CompareTransform.java:13-157 — joins inputs on
``primaryKeyFields`` and emits records describing field-level mismatches
and rows missing on either side (a data-validation utility).

Spark: full outer join on the keys + struct inequality; output one row per
differing key with a `differences` array of {field, values-per-input}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


@module("compare", kind=KIND_TRANSFORM)
def compare_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    keys = p.get("primaryKeyFields") or p.get("keys")
    if not keys:
        raise ValueError("compare requires primaryKeyFields")
    if len(ctx.inputs) < 2:
        raise ValueError("compare requires at least 2 inputs")

    left, right = ctx.inputs[0], ctx.inputs[1]
    lname = ctx.input_names[0] if ctx.input_names else "left"
    rname = ctx.input_names[1] if len(ctx.input_names) > 1 else "right"

    common = [c for c in left.columns if c in right.columns and c not in keys]
    l = left.alias("__l__")
    r = right.alias("__r__")
    cond = [l[k].eqNullSafe(r[k]) for k in keys]
    joined = l.join(r, cond, "full_outer")

    diffs = F.filter(
        F.array(
            *[
                F.when(
                    ~l[c].eqNullSafe(r[c]),
                    F.struct(
                        F.lit(c).alias("field"),
                        l[c].cast("string").alias(lname),
                        r[c].cast("string").alias(rname),
                    ),
                )
                for c in common
            ]
        ),
        lambda x: x.isNotNull(),
    )
    status = (
        F.when(r[keys[0]].isNull(), F.lit("only_" + lname))
        .when(l[keys[0]].isNull(), F.lit("only_" + rname))
        .when(F.size(diffs) > 0, F.lit("mismatch"))
        .otherwise(F.lit("match"))
    )
    out = joined.select(
        *[F.coalesce(l[k], r[k]).alias(k) for k in keys],
        status.alias("status"),
        diffs.alias("differences"),
    ).filter(F.col("status") != "match")
    return {"": out}
