"""Iceberg file-scoped COW UPDATE / DELETE WHERE (r8) — the delta DML
twins: only files whose bounds admit the predicate AND whose data
contains a match rewrite; untouched files survive by path."""

import pytest

from pipeline_spark.sinks.iceberg_native import (
    delete_iceberg_native,
    update_iceberg_native,
    write_iceberg_native,
)
from pipeline_spark.sources.iceberg_native import plan_files, read_iceberg_native


def _mk(spark, tmp_path, n_files=3, per=10):
    tbl = str(tmp_path / "tbl")
    for i in range(n_files):
        df = spark.createDataFrame(
            [(i * per + j, (i * per + j) * 10) for j in range(per)],
            "id long, amt long",
        ).coalesce(1)
        write_iceberg_native(
            df, {"path": tbl, "mode": "append" if i else "create"}
        )
    return tbl


def test_update_where_set(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    before = {d["path"] for d in plan_files(tbl)[0]}
    out = update_iceberg_native(spark, {
        "path": tbl,
        "where": [{"key": "id", "op": ">=", "value": 12},
                  {"key": "id", "op": "<=", "value": 14}],
        "set": {"amt": "amt + 1000"},
    })
    assert out["updated_rows"] == 3 and out["rewritten_files"] == 1
    after = {d["path"] for d in plan_files(tbl)[0]}
    assert len(before & after) == 2  # two files untouched by path
    back = {r["id"]: r["amt"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect()}
    for i in range(30):
        assert back[i] == i * 10 + (1000 if 12 <= i <= 14 else 0)


def test_update_requires_set(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n_files=1)
    with pytest.raises(ValueError, match="'set'"):
        update_iceberg_native(spark, {
            "path": tbl, "where": [{"key": "id", "op": "=", "value": 1}]})
    with pytest.raises(ValueError, match="not in schema"):
        update_iceberg_native(spark, {
            "path": tbl,
            "where": [{"key": "id", "op": "=", "value": 1}],
            "set": {"bogus": "1"},
        })


def test_delete_where_cow(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    before = {d["path"] for d in plan_files(tbl)[0]}
    out = delete_iceberg_native(spark, {
        "path": tbl, "method": "cow",
        "where": [{"key": "id", "op": "<", "value": 10}],
    })
    assert out["deleted_rows"] == 10 and out["rewritten_files"] == 1
    data, dels, _ = plan_files(tbl)
    assert not dels  # COW: no delete files committed
    assert len(before & {d["path"] for d in data}) == 2
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == list(range(10, 30))


def test_update_on_mor_table_materializes(spark, tmp_path):
    """Updating a file that carries row-level deletes must not
    resurrect the deleted rows through the rewrite."""
    tbl = _mk(spark, tmp_path, n_files=2)
    delete_iceberg_native(spark, {
        "path": tbl, "where": [{"key": "id", "op": "=", "value": 3}],
    })
    update_iceberg_native(spark, {
        "path": tbl,
        "where": [{"key": "id", "op": "=", "value": 5}],
        "set": {"amt": "0"},
    })
    back = {r["id"]: r["amt"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect()}
    assert 3 not in back
    assert back[5] == 0 and back[4] == 40
    assert len(back) == 19


def test_update_null_predicate_rows_kept(spark, tmp_path):
    tbl = str(tmp_path / "nulls")
    write_iceberg_native(
        spark.createDataFrame(
            [(1, 10), (2, None), (3, 30)], "id long, amt long"
        ).coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    update_iceberg_native(spark, {
        "path": tbl,
        "where": [{"key": "amt", "op": "<", "value": 100}],
        "set": {"amt": "amt * 2"},
    })
    back = {r["id"]: r["amt"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect()}
    assert back == {1: 20, 2: None, 3: 60}  # NULL row unmodified


def test_partitioned_update(spark, tmp_path):
    tbl = str(tmp_path / "ptbl")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, i % 2, i * 10) for i in range(20)],
            "id long, p long, amt long",
        ).repartition(2, "p"),
        {"path": tbl,
         "partitionSpec": [{"field": "p", "transform": "identity"}]},
    )
    update_iceberg_native(spark, {
        "path": tbl,
        "where": [{"key": "p", "op": "=", "value": 1}],
        "set": {"amt": "-1"},
    })
    back = {r["id"]: (r["p"], r["amt"]) for r in read_iceberg_native(
        spark, {"path": tbl}).collect()}
    for i in range(20):
        assert back[i] == (i % 2, -1 if i % 2 == 1 else i * 10)


def test_rest_catalog_update(spark, tmp_path):
    """COW UPDATE through a REST catalog: planning reads the catalog's
    metadata, the replace snapshot lands via one optimistic
    CommitTableRequest."""
    from tests.test_iceberg_native import _serve_stateful_catalog

    srv, state = _serve_stateful_catalog()
    try:
        uri = f"http://127.0.0.1:{srv.server_address[1]}"
        loc = str(tmp_path / "rest_upd")
        cat_p = {"catalog": {"uri": uri}, "table": "ns.u", "location": loc}
        write_iceberg_native(
            spark.createDataFrame(
                [(i, i * 10) for i in range(10)], "id long, amt long"
            ).coalesce(1),
            {**cat_p, "mode": "create"},
        )
        update_iceberg_native(spark, {
            "catalog": {"uri": uri}, "table": "ns.u",
            "where": [{"key": "id", "op": "<", "value": 3}],
            "set": {"amt": "amt + 1"},
        })
        back = {r["id"]: r["amt"] for r in read_iceberg_native(
            spark, {"catalog": {"uri": uri}, "table": "ns.u"}).collect()}
        assert back == {i: i * 10 + (1 if i < 3 else 0) for i in range(10)}
        assert len(state["u"]["snapshots"]) == 2
    finally:
        srv.shutdown()


def test_dml_rewrites_preserve_sort_order(spark, tmp_path):
    """Merge/update rewrites and upsert data files re-cluster on the
    table's default sort order — the same contract compaction keeps."""
    import pyarrow.parquet as pq

    from pipeline_spark.sinks.iceberg_native import (
        alter_iceberg_native,
        merge_iceberg_native,
    )

    tbl = str(tmp_path / "sorted")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, i * 10) for i in range(20)], "id long, amt long"
        ).coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    alter_iceberg_native(spark, {"path": tbl, "sortBy": ["id"]})
    # merge with shuffled upserts: the rewrite must come out id-sorted
    batch = spark.createDataFrame(
        [(35, 1), (5, 1), (25, 1), (15, 1)], "id long, amt long"
    ).coalesce(1)
    merge_iceberg_native(spark, batch, {"path": tbl, "primaryKeys": ["id"]})
    data, _, _ = plan_files(tbl)
    for d in data:
        ids = pq.read_table(d["path"]).column("id").to_pylist()
        assert ids == sorted(ids), f"unsorted rewrite {d['path']}"
