"""`union` transform: merge N inputs by name with null padding.

Reference: util/pipeline/Union.java:92-134 — union schema is the union of
field names (first input wins the type) or explicit per-input field
``mappings``; missing fields are null-padded.

Spark: ``unionByName(allowMissingColumns=True)``; mappings become a
pre-``select(alias)`` per input.  No shuffle — union is a narrow op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


@module("union", kind=KIND_TRANSFORM)
def union_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    inputs = list(ctx.inputs)
    if not inputs:
        raise ValueError("union requires inputs")

    mappings = p.get("mappings")
    if mappings:
        # mappings: [{outputField, inputs: {inputName: inputField}}...]
        renamed = []
        for df, in_name in zip(inputs, ctx.input_names):
            cols = []
            for m in mappings:
                out_field = m.get("outputField") or m.get("field")
                src = (m.get("inputs") or {}).get(in_name, out_field)
                if src in df.columns:
                    cols.append(F.col(src).alias(out_field))
                else:
                    cols.append(F.lit(None).alias(out_field))
            renamed.append(df.select(*cols))
        inputs = renamed

    out = inputs[0]
    for df in inputs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return {"": out}
