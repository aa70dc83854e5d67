"""`debug` sink: log rows (batch show / streaming console).

Reference: module/sink/DebugSink.java:22-197.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SINK, ModuleContext, module


@module("debug", kind=KIND_SINK)
def debug_sink(ctx: ModuleContext) -> dict[str, DataFrame]:
    df = ctx.input
    n = int(ctx.params.get("limit", 20))
    if df.isStreaming:
        df.writeStream.format("console").start()
    else:
        df.show(n, truncate=False)
    return {"": df}
