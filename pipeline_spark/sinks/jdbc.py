"""`jdbc` sink: batched writes via Spark's JDBC writer or a DB-API driver.

Reference: module/sink/JdbcSink.java:24-326 — batched prepared statements
with configurable batch size.  Spark: ``df.write.jdbc`` (batchsize option);
mutation-typed inputs (op column, SURVEY §2.10) degrade to append/overwrite
since plain JDBC has no MERGE in the writer — documented.

With ``connectionFactory`` (``pkg.mod:fn`` → PEP 249 connection) the
write runs through ``foreachPartition``: each executor task opens its own
connection and issues batched ``executemany`` inserts (batchSize rows per
round-trip, one commit per partition) — no jar required, e2e-testable
with sqlite3.  ``mode: overwrite`` clears the table driver-side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SINK, ModuleContext, module


def _dbapi_write(df: DataFrame, p: dict) -> None:
    from pipeline_spark.operators.ml import resolve_factory

    factory_path = p["connectionFactory"]
    table = p["table"]
    cols = df.columns
    batch = int(p.get("batchSize", 10_000))
    style = str(p.get("paramStyle", "qmark")).lower()
    ph = "%s" if style in ("format", "pyformat") else "?"
    sql = (
        f"INSERT INTO {table} ({', '.join(cols)}) "
        f"VALUES ({', '.join([ph] * len(cols))})"
    )
    params_snapshot = dict(p)

    if str(p.get("mode", "append")).lower() == "overwrite":
        conn = resolve_factory(factory_path)(params_snapshot)
        try:
            conn.cursor().execute(f"DELETE FROM {table}")
            conn.commit()
        finally:
            conn.close()

    def write_partition(rows):
        conn = resolve_factory(factory_path)(params_snapshot)
        try:
            cur = conn.cursor()
            buf = []
            for r in rows:
                buf.append(tuple(r[c] for c in cols))
                if len(buf) >= batch:
                    cur.executemany(sql, buf)
                    buf.clear()
            if buf:
                cur.executemany(sql, buf)
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(write_partition)


@module("jdbc", kind=KIND_SINK)
def jdbc_sink(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = ctx.input
    table = p.get("table")
    if not table:
        raise ValueError("jdbc sink requires table")
    if p.get("connectionFactory"):
        _dbapi_write(df, p)
        return {"": df}
    url = p.get("url")
    if not url:
        raise ValueError("jdbc sink requires url (or connectionFactory)")
    props = {"batchsize": str(p.get("batchSize", 10_000))}
    if p.get("driver"):
        props["driver"] = p["driver"]
    if p.get("user"):
        props["user"] = p["user"]
    if p.get("password"):
        props["password"] = p["password"]
    df.write.mode(p.get("mode", "append")).jdbc(url, table, properties=props)
    return {"": df}
