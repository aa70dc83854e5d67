"""`lookup` transform: enrich rows from a small side input (broadcast join).

Reference: module/transform/LookupTransform.java:17-415 — side inputs are
materialized as ``Map<key,row>`` views (util/pipeline/Views.java:16-78);
``flatten: true`` merges looked-up fields into the row, else they appear as
a nested struct field; missing key → nulls (left-join semantics).

Spark: ``df.join(broadcast(side), keys, "left")``.  The broadcast hint is
correct by contract — reference `view`-mode sources must be small
(module/Source.java:34-40); if the side ever exceeds
spark.sql.autoBroadcastJoinThreshold, drop the hint via
``broadcast: false`` and let AQE pick the strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


@module("lookup", kind=KIND_TRANSFORM)
def lookup_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = ctx.input
    if ctx.side_inputs:
        side = next(iter(ctx.side_inputs.values()))
    elif len(ctx.inputs) > 1:
        side = ctx.inputs[1]
    else:
        raise ValueError("lookup requires a side input")

    key_fields = p.get("keyFields") or [p.get("keyField")]
    side_key_fields = p.get("sideKeyFields") or p.get("lookupKeyFields") or key_fields
    flatten = bool(p.get("flatten", True))
    output_name = p.get("name") or "lookup"

    if flatten:
        # looked-up fields merge into the row; on a name clash the side
        # value wins (reference merges into the row map,
        # LookupTransform.java:273-322)
        side_cols = [c for c in side.columns if c not in side_key_fields]
        side_sel = side.alias("__side__")
        cond = [df[k] == side_sel[sk] for k, sk in zip(key_fields, side_key_fields)]
        rhs = F.broadcast(side_sel) if p.get("broadcast", True) else side_sel
        joined = df.join(rhs, cond, "left")
        keep = [df[c] for c in df.columns if c not in side_cols]
        looked = [side_sel[c] for c in side_cols]
        return {"": joined.select(*keep, *looked)}

    struct_col = F.struct(*[F.col(f"__side__.{c}") for c in side.columns if c not in side_key_fields])
    side_nested = side.alias("__side__")
    cond = [df[k] == side_nested[sk] for k, sk in zip(key_fields, side_key_fields)]
    side_maybe_bc = F.broadcast(side_nested) if p.get("broadcast", True) else side_nested
    joined = df.join(side_maybe_bc, cond, "left").select(*[df[c] for c in df.columns], struct_col.alias(output_name))
    return {"": joined}
