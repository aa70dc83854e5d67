"""`jdbc` source: query/table reads with parallel splits.

Reference: module/source/JdbcSource.java:38-1046 — ``query`` or ``table``;
``fetchSize`` default 50,000; ``splitSize`` default 10 → parallel split
queries (JdbcSource.java:117-121).

Spark mapping: ``spark.read.jdbc`` with numPartitions/partitionColumn
bounds — Spark's native parallel JDBC read replaces the reference's manual
query splitting.  Requires a JDBC driver jar on the classpath; in this
container there is none, so the module raises a clear error at run time
(the plumbing is real and unit-testable with any driver present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SOURCE, ModuleContext, module


@module("jdbc", kind=KIND_SOURCE)
def jdbc_source(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    url = p.get("url")
    if not url:
        raise ValueError("jdbc source requires url")
    reader = (
        ctx.spark.read.format("jdbc")
        .option("url", url)
        .option("fetchsize", int(p.get("fetchSize", 50_000)))
    )
    if p.get("driver"):
        reader = reader.option("driver", p["driver"])
    if p.get("user"):
        reader = reader.option("user", p["user"])
    if p.get("password"):
        reader = reader.option("password", p["password"])
    if p.get("query"):
        reader = reader.option("query", p["query"])
    elif p.get("table"):
        reader = reader.option("dbtable", p["table"])
    else:
        raise ValueError("jdbc source requires query or table")
    # reference splitSize → Spark partitioned read
    if p.get("partitionColumn"):
        reader = (
            reader.option("partitionColumn", p["partitionColumn"])
            .option("lowerBound", p["lowerBound"])
            .option("upperBound", p["upperBound"])
            .option("numPartitions", int(p.get("splitSize", 10)))
        )
    return {"": reader.load()}
