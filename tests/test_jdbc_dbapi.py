"""jdbc source/sink DB-API path, e2e with sqlite3 (no jar needed)."""

import sqlite3

import pytest

from pipeline_spark.sources.jdbc import _split_predicates, jdbc_source
from pipeline_spark.sinks.jdbc import jdbc_sink
from pipeline_spark.registry import ModuleContext


def ctx(spark, params, inputs=(), config=None):
    return ModuleContext(
        spark=spark,
        name="j",
        params=params,
        inputs=list(inputs),
        input_names=["in"] * len(inputs),
        side_inputs={},
        config=config or {},
    )


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "t.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE items (id INTEGER, name TEXT, qty INTEGER)")
    conn.executemany(
        "INSERT INTO items VALUES (?, ?, ?)",
        [(i, f"item{i}", i * 3) for i in range(100)],
    )
    conn.commit()
    conn.close()
    return path


def test_split_predicates_cover_and_do_not_overlap():
    preds = _split_predicates(
        {"partitionColumn": "id", "lowerBound": 0, "upperBound": 100, "splitSize": 4}
    )
    assert preds == ["id < 25", "id >= 25 AND id < 50", "id >= 50 AND id < 75", "id >= 75"]
    assert _split_predicates({}) == [None]
    # degenerate range → single unbounded split
    assert _split_predicates(
        {"partitionColumn": "id", "lowerBound": 5, "upperBound": 5, "splitSize": 4}
    ) == [None]


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_source_partitioned_read(spark, db):
    out = jdbc_source(
        ctx(
            spark,
            {
                "connectionFactory": "pipeline_spark.testing:sqlite_connection",
                "database": db,
                "table": "items",
                "partitionColumn": "id",
                "lowerBound": 0,
                "upperBound": 100,
                "splitSize": 4,
            },
            config={"schema": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": "string"},
                {"name": "qty", "type": "long"},
            ]},
        )
    )[""]
    assert out.rdd.getNumPartitions() == 4
    rows = sorted((r["id"], r["name"], r["qty"]) for r in out.collect())
    assert len(rows) == 100
    assert rows[7] == (7, "item7", 21)


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_source_query_single_split_inferred_schema(spark, db):
    out = jdbc_source(
        ctx(
            spark,
            {
                "connectionFactory": "pipeline_spark.testing:sqlite_connection",
                "database": db,
                "query": "SELECT id, qty FROM items WHERE id < 10",
            },
        )
    )[""]
    rows = sorted((r["id"], r["qty"]) for r in out.collect())
    assert rows == [(i, i * 3) for i in range(10)]


def test_sink_append_and_overwrite(spark, db):
    df = spark.createDataFrame(
        [(200 + i, f"new{i}", i) for i in range(10)], "id: long, name: string, qty: long"
    ).repartition(3)
    params = {
        "connectionFactory": "pipeline_spark.testing:sqlite_connection",
        "database": db,
        "table": "items",
        "batchSize": 4,
    }
    jdbc_sink(ctx(spark, params, [df]))
    conn = sqlite3.connect(db)
    assert conn.execute("SELECT count(*) FROM items").fetchone()[0] == 110
    got = conn.execute(
        "SELECT name, qty FROM items WHERE id = 203"
    ).fetchone()
    assert got == ("new3", 3)
    conn.close()

    jdbc_sink(ctx(spark, {**params, "mode": "overwrite"}, [df]))
    conn = sqlite3.connect(db)
    assert conn.execute("SELECT count(*) FROM items").fetchone()[0] == 10
    conn.close()


def test_jdbc_mutation_ops(spark, tmp_path):
    """UnifiedMutation semantics on the DB-API path (SURVEY §2.10):
    __op__ routes rows to INSERT / UPSERT / UPDATE / DELETE batches."""
    path = str(tmp_path / "mut.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT, n INTEGER)")
    conn.executemany("INSERT INTO kv VALUES (?, ?, ?)",
                     [(1, "one", 10), (2, "two", 20), (3, "three", 30)])
    conn.commit()
    conn.close()

    df = spark.createDataFrame(
        [
            (2, "TWO", 22, "UPSERT"),     # existing key → update
            (4, "four", 40, "UPSERT"),    # new key → insert
            (3, None, None, "DELETE"),    # drop key 3
            (1, "uno", 11, "UPDATE"),     # plain update
            (5, "five", 50, "INSERT"),    # plain insert
        ],
        "k int, v string, n int, __op__ string",
    ).coalesce(1)
    jdbc_sink(ctx(spark, {
        "table": "kv",
        "connectionFactory": "pipeline_spark.testing:sqlite_connection",
        "database": path,
        "primaryKeys": ["k"],
    }, [df]))
    got = sqlite3.connect(path).execute("SELECT k, v, n FROM kv ORDER BY k").fetchall()
    assert got == [(1, "uno", 11), (2, "TWO", 22), (4, "four", 40), (5, "five", 50)]


def test_jdbc_without_op_column_still_plain_insert(spark, tmp_path):
    path = str(tmp_path / "plain.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE t (a INTEGER, b TEXT)")
    conn.commit()
    conn.close()
    df = spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    jdbc_sink(ctx(spark, {
        "table": "t",
        "connectionFactory": "pipeline_spark.testing:sqlite_connection",
        "database": path,
        "primaryKeys": ["a"],  # keys set but no __op__ column → plain path
    }, [df]))
    got = sqlite3.connect(path).execute("SELECT a, b FROM t ORDER BY a").fetchall()
    assert got == [(1, "x"), (2, "y")]
