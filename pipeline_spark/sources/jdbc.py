"""`jdbc` source: query/table reads with parallel splits.

Reference: module/source/JdbcSource.java:38-1046 — ``query`` or ``table``;
``fetchSize`` default 50,000; ``splitSize`` default 10 → parallel split
queries (JdbcSource.java:117-121).

Two execution paths:

  JVM      ``spark.read.jdbc`` with partitionColumn/numPartitions bounds —
           Spark's native parallel JDBC read replaces the reference's
           manual query splitting.  Needs a JDBC driver jar on the
           classpath (none bundled in this container).
  DB-API   ``connectionFactory: pkg.mod:fn`` — a dotted path resolving to
           ``fn(params) -> PEP 249 connection``.  Split planning mirrors
           the reference's splitSize: the [lowerBound, upperBound] range
           of ``partitionColumn`` divides into splitSize half-open
           predicates, and EACH EXECUTOR TASK opens its own connection
           and reads one split (one task per split; the driver never
           holds row data).  This makes warehouse reads e2e-testable with
           sqlite3 and usable with any pure-Python driver, the same
           injectable-client pattern as the SDK connectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SOURCE, ModuleContext, module


def _split_predicates(p: dict) -> list:
    """Reference splitSize semantics → half-open range predicates."""
    col = p.get("partitionColumn")
    if not col:
        return [None]
    lo, hi = int(p["lowerBound"]), int(p["upperBound"])
    n = max(int(p.get("splitSize", p.get("numPartitions", 10))), 1)
    if hi <= lo:
        return [None]
    step = max((hi - lo + n - 1) // n, 1)
    # first split unbounded below, last unbounded above: bounds PARTITION
    # the range, they don't filter rows (Spark JDBC partitioning semantics)
    preds = []
    start = lo
    first = True
    while True:
        end = start + step
        if end >= hi:
            preds.append(f"{col} >= {start}" if not first else "1=1")
            return preds
        lo_cond = None if first else f"{col} >= {start}"
        conds = [c for c in (lo_cond, f"{col} < {end}") if c]
        preds.append(" AND ".join(conds))
        first = False
        start = end


def dbapi_read_client(params: dict):
    """plan_partitions/read_partition adapter over a PEP 249 connection.

    Fits the `_read_with_client` contract used by the SDK connector
    sources, so the jdbc DB-API path shares the distributed-read plumbing.
    """
    from pipeline_spark.operators.ml import resolve_factory

    connect = resolve_factory(params["connectionFactory"])
    base = params.get("query")
    if not base and params.get("table"):
        base = f"SELECT * FROM {params['table']}"
    if not base:
        raise ValueError("jdbc source requires query or table")
    fetch = int(params.get("fetchSize", 50_000))

    class _Client:
        def plan_partitions(self):
            return _split_predicates(params)

        def read_partition(self, pred):
            conn = connect(params)
            try:
                cur = conn.cursor()
                sql = (
                    f"SELECT * FROM ({base}) AS __q__ WHERE {pred}"
                    if pred
                    else base
                )
                cur.execute(sql)
                cols = [d[0] for d in cur.description]
                out = []
                while True:
                    rows = cur.fetchmany(fetch)
                    if not rows:
                        return out
                    out.extend(dict(zip(cols, r)) for r in rows)
            finally:
                conn.close()

    return _Client()


@module("jdbc", kind=KIND_SOURCE)
def jdbc_source(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    if p.get("connectionFactory"):
        from pipeline_spark.sources.connectors import _read_with_client

        return {"": _read_with_client(ctx, "pipeline_spark.sources.jdbc:dbapi_read_client")}
    url = p.get("url")
    if not url:
        raise ValueError("jdbc source requires url (or connectionFactory)")
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
