"""Iceberg ``add_files`` import (r10, iceberg's own procedure):
existing hive-layout parquet registers into an iceberg table with zero
data movement — partition records from the ``col=value`` dirs, reads
fill the physically-absent partition columns from manifest metadata
(spec Column Projection rule #2), compaction materializes them."""

import os

import pytest

from pipeline_spark.sinks.iceberg_addfiles import add_files_iceberg_native
from pipeline_spark.sources.iceberg_native import read_iceberg_native


def _mk_hive(spark, path, rows, parts):
    spark.createDataFrame(rows, "id long, v string, par long").write \
        .partitionBy(*parts).parquet(path)


def test_add_files_create(spark, tmp_path):
    src = str(tmp_path / "hive")
    rows = [(i, f"v{i}", i % 3) for i in range(12)]
    _mk_hive(spark, src, rows, ["par"])
    tbl = str(tmp_path / "ice")
    out = add_files_iceberg_native(spark, {
        "path": tbl, "sourceDir": src,
    })
    assert out["rows"] == 12
    got = sorted(
        (r["id"], r["v"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == sorted(rows)
    # files stayed in place (zero copy)
    assert not any(
        n.endswith(".parquet")
        for _r, _d, ns in os.walk(os.path.join(tbl, "data"))
        for n in ns
    ) if os.path.isdir(os.path.join(tbl, "data")) else True
    # manifest partition records drive pruning
    pruned = read_iceberg_native(
        spark, {"path": tbl, "partitionFilter": {"par": 1}}
    )
    assert sorted(r["id"] for r in pruned.collect()) == [1, 4, 7, 10]


def test_add_files_append_to_existing(spark, tmp_path):
    src1 = str(tmp_path / "h1")
    src2 = str(tmp_path / "h2")
    _mk_hive(spark, src1, [(i, f"v{i}", 0) for i in range(4)], ["par"])
    _mk_hive(spark, src2, [(i, f"v{i}", 1) for i in range(4, 8)], ["par"])
    tbl = str(tmp_path / "ice2")
    add_files_iceberg_native(spark, {"path": tbl, "sourceDir": src1})
    add_files_iceberg_native(spark, {"path": tbl, "sourceDir": src2})
    got = sorted(
        (r["id"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(i, 0 if i < 4 else 1) for i in range(8)]


def test_add_files_schema_mismatch_refuses(spark, tmp_path):
    src1 = str(tmp_path / "h3")
    _mk_hive(spark, src1, [(1, "a", 0)], ["par"])
    tbl = str(tmp_path / "ice3")
    add_files_iceberg_native(spark, {"path": tbl, "sourceDir": src1})
    src2 = str(tmp_path / "h4")
    spark.createDataFrame(
        [(1, 0)], "id long, par long"
    ).write.partitionBy("par").parquet(src2)
    with pytest.raises(ValueError, match="schema"):
        add_files_iceberg_native(spark, {"path": tbl, "sourceDir": src2})


def test_add_files_then_compact_materializes(spark, tmp_path):
    import pyarrow.parquet as pq

    from pipeline_spark.sinks.iceberg_native import compact_iceberg_native
    from pipeline_spark.sources.iceberg_native import (
        identity_fill_plan,
        plan_files,
    )

    src = str(tmp_path / "h5")
    rows = [(i, f"v{i}", i % 2) for i in range(10)]
    _mk_hive(spark, src, rows, ["par"])
    tbl = str(tmp_path / "ice5")
    add_files_iceberg_native(spark, {"path": tbl, "sourceDir": src})
    data, _d, meta = plan_files(tbl)
    fills, _t = identity_fill_plan(data, meta)
    assert fills  # hive files lack the partition column physically
    compact_iceberg_native(spark, {"path": tbl, "minFilesPerGroup": 1})
    data2, _d2, meta2 = plan_files(tbl)
    assert not identity_fill_plan(data2, meta2)[0]
    assert all("par" in pq.read_schema(d["path"]).names for d in data2)
    got = sorted(
        (r["id"], r["v"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == sorted(rows)


def test_add_files_via_sink_mode(spark, tmp_path):
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native

    src = str(tmp_path / "h6")
    _mk_hive(spark, src, [(1, "a", 0), (2, "b", 1)], ["par"])
    tbl = str(tmp_path / "ice6")
    write_iceberg_native(
        spark.createDataFrame([(0,)], "x long"),  # operand table unused
        {"path": tbl, "mode": "addFiles", "sourceDir": src},
    )
    assert sorted(
        r["id"] for r in read_iceberg_native(spark, {"path": tbl}).collect()
    ) == [1, 2]


def test_add_files_spec_order_insensitive(spark, tmp_path):
    """r10 review fix: a table whose identity spec preserves a
    non-alphabetical creation order still accepts matching imports."""
    from pipeline_spark.sinks.delta_native import write_delta_native
    from pipeline_spark.sinks.tableconvert import convert_delta_to_iceberg

    tbl = str(tmp_path / "ord")
    write_delta_native(
        spark,
        spark.createDataFrame(
            [(1, "a", "y2", "m1")], "id long, v string, year string, month string"
        ),
        # creation order year, month — alphabetical would be month, year
        {"path": tbl, "partitionBy": ["year", "month"]},
    )
    convert_delta_to_iceberg(spark, {"path": tbl})
    src = str(tmp_path / "ordsrc")
    spark.createDataFrame(
        [(2, "b", "y2", "m2")], "id long, v string, year string, month string"
    ).write.partitionBy("year", "month").parquet(src)
    add_files_iceberg_native(spark, {"path": tbl, "sourceDir": src})
    got = sorted(
        (r["id"], r["year"], r["month"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(1, "y2", "m1"), (2, "y2", "m2")]


def test_rewrite_manifests_keeps_fill_manifests_separate(spark, tmp_path):
    """r10 review fix: manifest consolidation groups by identity-fill
    signature — an imported (fill) manifest never merges with a
    materialized one, so the reader's one-probe-per-manifest rule stays
    sound and imported rows keep their partition values."""
    from pipeline_spark.sinks.iceberg_native import (
        rewrite_manifests_iceberg_native,
        write_iceberg_native,
    )

    # two imported manifests (fill) + two native appends (materialized)
    tbl = str(tmp_path / "mixm")
    for j in range(2):
        src = str(tmp_path / f"mh{j}")
        _mk_hive(spark, src, [(j * 10 + k, f"v{k}", k % 2)
                              for k in range(4)], ["par"])
        add_files_iceberg_native(spark, {"path": tbl, "sourceDir": src})
    for j in range(2):
        write_iceberg_native(
            spark.createDataFrame(
                [(100 + j * 10 + k, f"n{k}", k % 2) for k in range(4)],
                # par int: partition-dir inference typed the imported
                # column as int
                "id long, v string, par int",
            ),
            {"path": tbl, "mode": "append",
             "partitionSpec": [{"field": "par", "transform": "identity"}]},
        )
    rewrite_manifests_iceberg_native(spark, {"path": tbl})
    got = sorted(
        (r["id"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    want = sorted(
        [(j * 10 + k, k % 2) for j in range(2) for k in range(4)]
        + [(100 + j * 10 + k, k % 2) for j in range(2) for k in range(4)]
    )
    assert got == want  # no null partition values anywhere
    assert all(p is not None for _i, p in got)
