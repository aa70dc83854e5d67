"""`example` transform: union inputs and print each batch's head — the
reference's registered demo/debug passthrough.

Reference: module/transform/ExampleTransform.java:13-40 (union + per-
element System.out print, rows passed through unchanged).  Printing
every row from executors is an anti-pattern at scale, so this prints a
bounded driver-side sample (``numRows``, default 20) and passes the
full DataFrame through untouched — the debug-visibility contract
without a per-row executor side effect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


@module("example", kind=KIND_TRANSFORM)
def example_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    inputs = list(ctx.inputs)
    if not inputs:
        raise ValueError("example requires inputs")
    out = inputs[0]
    for df in inputs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    n = int(ctx.params.get("numRows", 20))
    if not out.isStreaming:
        print(f"debug [{ctx.name}]:")
        out.show(n=n, truncate=False)
    return {"": out}
