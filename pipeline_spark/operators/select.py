"""`select` transform: the projection engine.

Reference: module/transform/SelectTransform.java:26-580 — ordered select
function list with sequential name binding; stateless / stateful variants
chosen per function set (94-142); stateful path regroups by ``groupFields``
with event-time-sorted buffers (391-547).

Spark: stateless → one ``df.select``; stateful → Window functions
(see compilers/stateful.py).  Both stay fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.compilers.filter_dsl import compile_filter
from pipeline_spark.compilers.select_fns import apply_select
from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


@module("select", kind=KIND_TRANSFORM)
def select_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = ctx.input
    if p.get("filter"):
        df = df.filter(compile_filter(p["filter"], df))
    selects = p.get("select") or p.get("fields")
    if not selects:
        raise ValueError("select transform requires select list")
    # normalize shorthand: a bare string is a pass-through field
    selects = [{"name": s} if isinstance(s, str) else s for s in selects]
    df = apply_select(
        df,
        selects,
        ctx.config.get("timestampAttribute"),
        group_fields=p.get("groupFields") or [],
    )
    if p.get("flattenField"):
        from pipeline_spark.operators.unnest import flatten_field

        df = flatten_field(df, p["flattenField"])
    return {"": df}
