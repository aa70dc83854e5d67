"""`memory` sink: materialize a (streaming) DataFrame into an in-memory
table — the test substrate for streaming pipelines (batch writes a temp
view).  Counterpart of the reference's debug/test sinks."""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SINK, ModuleContext, module


@module("memory", kind=KIND_SINK)
def memory_sink(ctx: ModuleContext) -> dict[str, DataFrame]:
    df = ctx.input
    table = ctx.params.get("table", ctx.name)
    if df.isStreaming:
        query = (
            df.writeStream.format("memory")
            .queryName(table)
            .outputMode(ctx.params.get("outputMode", "append"))
            .trigger(availableNow=True)
            .start()
        )
        if ctx.params.get("await", True):
            query.awaitTermination()
    else:
        df.createOrReplaceTempView(table)
    return {"": df}
