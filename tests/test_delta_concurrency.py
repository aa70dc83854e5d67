"""Optimistic concurrency for NON-APPEND delta writers (r8, VERDICT r7
ask #3 — delta-spark's ConflictChecker semantics).

r7 gave blind appends retry-on-race; everything else failed loudly.
Now a losing DELETE / UPDATE / MERGE / OPTIMIZE examines the
interleaved commits and retries iff its read/write set is provably
untouched: disjoint-file operations BOTH commit, true conflicts (same
file rewritten, data added inside the loser's read predicate, metadata
changed) keep failing with the re-plan message.
"""

import os

import pytest

from pipeline_spark.sinks.delta_native import (
    compact_delta_native,
    delete_delta_native,
    merge_delta_native,
    write_delta_native,
)
from pipeline_spark.sources.delta_native import (
    _log_dir,
    latest_version,
    read_delta_native,
)


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _race(monkeypatch, version: int, interleave):
    """Patch os.link so the FIRST attempt to claim ``version`` loses to
    ``interleave()`` (which lands that version first)."""
    import os as _os

    real_link = _os.link
    state = {"injected": False}

    def racing_link(src, dst, *a, **kw):
        if not state["injected"] and dst.endswith(f"{version:020d}.json"):
            state["injected"] = True
            interleave()
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(_os, "link", racing_link)
    return state


def test_delete_vs_disjoint_append_both_commit(spark, tmp_path, monkeypatch):
    tbl = str(tmp_path / "t1")
    write_delta_native(spark, spark.range(0, 10).coalesce(1), {"path": tbl})

    def interleave():
        write_delta_native(
            spark, spark.range(100, 103).coalesce(1),
            {"path": tbl, "mode": "append"},
        )

    state = _race(monkeypatch, 1, interleave)
    out = delete_delta_native(spark, {
        "path": tbl, "method": "mor",
        "where": [{"key": "id", "op": "<", "value": 5}],
    })
    assert state["injected"] and out["deleted_rows"] == 5
    assert latest_version(_log_dir(tbl)) == 2  # lost v1, retried at v2
    assert _ids(read_delta_native(spark, {"path": tbl})) == (
        list(range(5, 10)) + [100, 101, 102]
    )


def test_delete_vs_matching_append_fails(spark, tmp_path, monkeypatch):
    """An interleaved add INSIDE the delete's read predicate is a real
    conflict: the rows the delete planned against changed."""
    tbl = str(tmp_path / "t2")
    write_delta_native(spark, spark.range(0, 10).coalesce(1), {"path": tbl})

    def interleave():
        write_delta_native(
            spark, spark.range(1, 4).coalesce(1),
            {"path": tbl, "mode": "append"},
        )

    _race(monkeypatch, 1, interleave)
    with pytest.raises(FileExistsError, match="read predicate"):
        delete_delta_native(spark, {
            "path": tbl, "method": "mor",
            "where": [{"key": "id", "op": "<", "value": 5}],
        })


def test_same_file_rewrite_fails(spark, tmp_path, monkeypatch):
    """Two DMLs touching the SAME file: the loser must fail — retrying
    would clobber the winner's deletion vector."""
    tbl = str(tmp_path / "t3")
    write_delta_native(spark, spark.range(0, 10).coalesce(1), {"path": tbl})

    def interleave():
        delete_delta_native(spark, {
            "path": tbl, "method": "mor",
            "where": [{"key": "id", "op": "=", "value": 7}],
        })

    _race(monkeypatch, 1, interleave)
    with pytest.raises(FileExistsError, match="also rewrites"):
        delete_delta_native(spark, {
            "path": tbl, "method": "mor",
            "where": [{"key": "id", "op": "=", "value": 2}],
        })


def test_merge_vs_disjoint_append_both_commit(spark, tmp_path, monkeypatch):
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t4")
    write_delta_native(
        spark,
        spark.range(0, 10).withColumn(
            "v", F.lit(0).cast("long")).coalesce(1),
        {"path": tbl},
    )

    def interleave():
        write_delta_native(
            spark,
            spark.range(200, 202).withColumn(
                "v", F.lit(0).cast("long")).coalesce(1),
            {"path": tbl, "mode": "append"},
        )

    state = _race(monkeypatch, 1, interleave)
    batch = spark.createDataFrame(
        [(3, 33), (4, 44)], "id long, v long"
    )
    out = merge_delta_native(
        spark, batch, {"path": tbl, "primaryKeys": ["id"]})
    assert state["injected"] and out["merged_rows"] == 2
    back = {r["id"]: r["v"] for r in read_delta_native(
        spark, {"path": tbl}).collect()}
    assert back[3] == 33 and back[4] == 44
    assert back[200] == 0 and back[201] == 0  # the append survived
    assert len(back) == 12


def test_compact_vs_append_both_commit(spark, tmp_path, monkeypatch):
    """A layout-only rewrite never conflicts with a blind append
    (delta-spark's dataChange=false rule)."""
    tbl = str(tmp_path / "t5")
    write_delta_native(spark, spark.range(0, 5).coalesce(1), {"path": tbl})
    write_delta_native(
        spark, spark.range(5, 10).coalesce(1),
        {"path": tbl, "mode": "append"},
    )

    def interleave():
        write_delta_native(
            spark, spark.range(300, 303).coalesce(1),
            {"path": tbl, "mode": "append"},
        )

    state = _race(monkeypatch, 2, interleave)
    out = compact_delta_native(spark, {"path": tbl})
    assert state["injected"] and out["compacted_files"] == 2
    assert _ids(read_delta_native(spark, {"path": tbl})) == (
        list(range(0, 10)) + [300, 301, 302]
    )


def test_metadata_change_fails(spark, tmp_path, monkeypatch):
    """An interleaved schema change invalidates any planned DML."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t6")
    write_delta_native(spark, spark.range(0, 10).coalesce(1), {"path": tbl})

    def interleave():
        write_delta_native(
            spark,
            spark.range(400, 402).withColumn("extra", F.lit("x")).coalesce(1),
            {"path": tbl, "mode": "append", "mergeSchema": True},
        )

    _race(monkeypatch, 1, interleave)
    with pytest.raises(FileExistsError, match="metadata|schema"):
        delete_delta_native(spark, {
            "path": tbl, "method": "mor",
            "where": [{"key": "id", "op": "<", "value": 2}],
        })


def test_no_tmp_files_left_after_retry(spark, tmp_path, monkeypatch):
    tbl = str(tmp_path / "t7")
    write_delta_native(spark, spark.range(0, 10).coalesce(1), {"path": tbl})

    def interleave():
        write_delta_native(
            spark, spark.range(500, 502).coalesce(1),
            {"path": tbl, "mode": "append"},
        )

    _race(monkeypatch, 1, interleave)
    delete_delta_native(spark, {
        "path": tbl, "method": "mor",
        "where": [{"key": "id", "op": "=", "value": 0}],
    })
    assert not [
        n for n in os.listdir(os.path.join(tbl, "_delta_log"))
        if n.endswith(".tmp")
    ]


def test_replace_where_vs_disjoint_append_both_commit(
    spark, tmp_path, monkeypatch
):
    """r8: a replaceWhere that loses the race to an append OUTSIDE its
    domain retries and commits; an append INSIDE the domain conflicts."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t8")
    df = spark.range(0, 10).withColumn(
        "grp", F.when(F.col("id") < 5, "a").otherwise("b"))
    write_delta_native(spark, df.repartition("grp"), {"path": tbl})

    def interleave():
        write_delta_native(
            spark,
            spark.range(100, 102).withColumn("grp", F.lit("b")).coalesce(1),
            {"path": tbl, "mode": "append"},
        )

    state = _race(monkeypatch, 1, interleave)
    write_delta_native(
        spark,
        spark.createDataFrame([(50, "a"), (51, "a")], "id long, grp string"),
        {"path": tbl, "mode": "overwrite",
         "replaceWhere": [{"key": "grp", "op": "=", "value": "a"}]},
    )
    assert state["injected"]
    back = {(r["id"], r["grp"]) for r in read_delta_native(
        spark, {"path": tbl}).collect()}
    # domain 'a' replaced; the disjoint append to 'b' survived
    assert {(50, "a"), (51, "a"), (100, "b"), (101, "b")} <= back
    assert not any(g == "a" and i < 50 for i, g in back)

    # and an interleaved append INSIDE the domain conflicts
    def interleave2():
        write_delta_native(
            spark,
            spark.createDataFrame([(200, "a")], "id long, grp string"),
            {"path": tbl, "mode": "append"},
        )

    _race(monkeypatch, 3, interleave2)
    with pytest.raises(FileExistsError, match="replaceWhere domain"):
        write_delta_native(
            spark,
            spark.createDataFrame([(60, "a")], "id long, grp string"),
            {"path": tbl, "mode": "overwrite",
             "replaceWhere": [{"key": "grp", "op": "=", "value": "a"}]},
        )


def test_partitioned_delete_vs_other_partition_append(
    spark, tmp_path, monkeypatch
):
    """Partition columns never appear in footer stats, so disjointness
    on a PARTITIONED table must come from the interleaved add's
    partitionValues — an append to partition 'b' and a delete in
    partition 'a' both commit."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t9")
    df = spark.range(0, 10).withColumn(
        "grp", F.when(F.col("id") < 5, "a").otherwise("b"))
    write_delta_native(
        spark, df.repartition("grp"),
        {"path": tbl, "partitionBy": ["grp"]},
    )

    def interleave():
        write_delta_native(
            spark,
            spark.createDataFrame([(100, "b")], "id long, grp string"),
            {"path": tbl, "mode": "append", "partitionBy": ["grp"]},
        )

    state = _race(monkeypatch, 1, interleave)
    out = delete_delta_native(spark, {
        "path": tbl, "method": "mor",
        "where": [{"key": "grp", "op": "=", "value": "a"},
                  {"key": "id", "op": "<", "value": 2}],
    })
    assert state["injected"] and out["deleted_rows"] == 2
    back = {(r["id"], r["grp"]) for r in read_delta_native(
        spark, {"path": tbl}).collect()}
    assert (100, "b") in back and (0, "a") not in back and (1, "a") not in back
    assert len(back) == 9


def test_dv_merge_on_cdf_table_stages_change_rows(spark, tmp_path):
    """r8: method=mor MERGE on an unpartitioned CDF table stages
    delete+insert change rows (the COW merge's pairing) — the gate now
    covers only partitioned CDF tables."""
    from pyspark.sql import functions as F

    from pipeline_spark.sources.delta_native import read_delta_cdf

    tbl = str(tmp_path / "cdfmor")
    write_delta_native(
        spark,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"),
        {"path": tbl,
         "properties": {"delta.enableChangeDataFeed": True}},
    )
    out = merge_delta_native(
        spark,
        spark.createDataFrame(
            [(2, "B", "UPSERT"), (3, None, "DELETE")],
            "id long, v string, __op__ string",
        ),
        {"path": tbl, "primaryKeys": ["id"], "method": "mor"},
    )
    assert out["dv_files"] >= 1
    cdc = read_delta_cdf(spark, {"path": tbl, "startingVersion": 1})
    got = sorted(
        (r["_change_type"], r["id"], r["v"]) for r in cdc.collect())
    assert got == [
        ("delete", 2, "b"), ("delete", 3, "c"), ("insert", 2, "B"),
    ]
    back = {r["id"]: r["v"] for r in read_delta_native(
        spark, {"path": tbl}).collect()}
    assert back == {1: "a", 2: "B"}


def test_cdf_identifier_columns_pair_updates(spark, tmp_path):
    """r8: identifierColumns on read_delta_cdf pairs derivation-rule
    delete+insert rows into update pre/post images and nets out
    unchanged pairs (full-file overwrite noise)."""
    from pyspark.sql import functions as F

    from pipeline_spark.sources.delta_native import read_delta_cdf

    tbl = str(tmp_path / "cdfpair")
    write_delta_native(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        {"path": tbl,
         "properties": {"delta.enableChangeDataFeed": True}},
    )
    # a plain overwrite has NO cdc actions: CDF derives full-file
    # delete+insert rows; identifier pairing nets the unchanged row out
    write_delta_native(
        spark,
        spark.createDataFrame([(1, "a"), (2, "B")], "id long, v string"),
        {"path": tbl, "mode": "overwrite"},
    )
    out = read_delta_cdf(spark, {
        "path": tbl, "startingVersion": 1, "identifierColumns": ["id"]})
    got = sorted((r["_change_type"], r["id"], r["v"]) for r in out.collect())
    assert got == [
        ("update_postimage", 2, "B"),
        ("update_preimage", 2, "b"),
    ]
