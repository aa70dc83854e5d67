"""`pack` transform: token-budget sequence packing for training batches.

Training-data-pipeline extension (BASELINE.json north star): LLM
training wants documents grouped into packs whose token counts fill a
context-length budget.  The strategy here is offset packing (next-fit in
a deterministic order): docs are bucketed by key hash for parallelism,
ordered by key within each bucket, and a doc starting at running-token
offset t goes to pack ``floor(t / budget)``.  A pack can overflow by
less than one document — exactly the semantics of training pipelines
that split an overflowing document across adjacent packs.

Why this formulation: greedy-with-reset packing is an inherently
sequential loop, but offset packing is a windowed cumulative sum — one
shuffle on the bucket key, per-bucket sort, no Python, and the
correctness oracle reproduces it with the same SQL window.  Determinism:
bucket and order are pure functions of the key.

Output columns: ``bucket``, ``pack_id`` (unique within bucket),
``n_tokens``, ``pack_offset`` (token offset within the pack).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def pack_documents(
    df: DataFrame,
    *,
    key_field: str,
    token_budget: int,
    buckets: int = 64,
    token_count_field: str | None = None,
    text_field: str = "text",
) -> DataFrame:
    if token_count_field:
        n_tokens = F.col(token_count_field).cast("long")
    else:
        from pipeline_spark.operators.textstats import token_count

        n_tokens = token_count(F.col(text_field)).cast("long")
    # md5-prefix bucket (not xxhash64): pure function of the key that any
    # engine reproduces — the correctness oracle recomputes assignment
    # bit-for-bit, and membership survives repartitioning
    bucket = F.conv(
        F.substring(F.md5(F.col(key_field).cast("string")), 1, 4), 16, 10
    ).cast("long") % F.lit(buckets)
    out = df.withColumn("n_tokens", n_tokens).withColumn(
        "bucket", bucket.cast("int")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(key_field))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return out.withColumn(
        "pack_id", F.floor(start / F.lit(token_budget)).cast("long")
    ).withColumn("pack_offset", start % F.lit(token_budget))


@module("pack", kind=KIND_TRANSFORM)
def pack_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    budget = int(p.get("tokenBudget") or p.get("budget") or 0)
    if budget <= 0:
        raise ValueError("pack requires tokenBudget > 0")
    return {
        "": pack_documents(
            ctx.input,
            key_field=p.get("keyField") or p.get("idField", "doc_id"),
            token_budget=budget,
            buckets=int(p.get("buckets", 64)),
            token_count_field=p.get("tokenCountField"),
            text_field=p.get("field", "text"),
        )
    }
