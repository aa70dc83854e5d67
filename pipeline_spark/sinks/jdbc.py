"""`jdbc` sink: batched writes via Spark's JDBC writer.

Reference: module/sink/JdbcSink.java:24-326 — batched prepared statements
with configurable batch size.  Spark: ``df.write.jdbc`` (batchsize option);
mutation-typed inputs (op column, SURVEY §2.10) degrade to append/overwrite
since plain JDBC has no MERGE in the writer — documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SINK, ModuleContext, module


@module("jdbc", kind=KIND_SINK)
def jdbc_sink(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = ctx.input
    url = p.get("url")
    table = p.get("table")
    if not url or not table:
        raise ValueError("jdbc sink requires url and table")
    props = {"batchsize": str(p.get("batchSize", 10_000))}
    if p.get("driver"):
        props["driver"] = p["driver"]
    if p.get("user"):
        props["user"] = p["user"]
    if p.get("password"):
        props["password"] = p["password"]
    df.write.mode(p.get("mode", "append")).jdbc(url, table, properties=props)
    return {"": df}
