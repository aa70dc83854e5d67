"""In-place delta ↔ iceberg metadata-only conversion (r9, VERDICT r8
stretch): the target format's metadata lands over the SAME parquet
files — zero data movement — and both formats' readers agree on the
rows afterwards."""

import os

import pytest

from pipeline_spark.sinks.delta_native import write_delta_native
from pipeline_spark.sinks.iceberg_native import (
    delete_iceberg_native,
    write_iceberg_native,
)
from pipeline_spark.sinks.tableconvert import (
    convert_delta_to_iceberg,
    convert_iceberg_to_delta,
)
from pipeline_spark.sources.delta_native import read_delta_native
from pipeline_spark.sources.iceberg_native import read_iceberg_native


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.collect())


def test_delta_to_iceberg_zero_copy(spark, tmp_path):
    tbl = str(tmp_path / "d2i")
    data = [(i, f"v{i}") for i in range(20)]
    write_delta_native(
        spark, spark.createDataFrame(data, "id long, v string").repartition(3),
        {"path": tbl},
    )
    before = {
        f for f in os.listdir(tbl) if f.endswith(".parquet")
    }
    out = convert_delta_to_iceberg(spark, {"path": tbl})
    assert out["converted_files"] == 3 and out["rows"] == 20
    # zero copy: exactly the same parquet files
    after = {f for f in os.listdir(tbl) if f.endswith(".parquet")}
    assert after == before
    assert _rows(read_iceberg_native(spark, {"path": tbl})) == sorted(data)
    # the delta log stays readable (conversion is a snapshot, not a move)
    assert _rows(read_delta_native(spark, {"path": tbl})) == sorted(data)


def test_iceberg_to_delta_zero_copy_with_stats(spark, tmp_path):
    tbl = str(tmp_path / "i2d")
    data = [(i, f"v{i}") for i in range(20)]
    write_iceberg_native(
        spark.createDataFrame(data, "id long, v string").repartition(3),
        {"path": tbl, "mode": "create"},
    )
    out = convert_iceberg_to_delta(spark, {"path": tbl})
    assert out["converted_files"] == 3 and out["rows"] == 20
    assert _rows(read_delta_native(spark, {"path": tbl})) == sorted(data)
    assert _rows(read_iceberg_native(spark, {"path": tbl})) == sorted(data)
    # stats landed: delta-side skipping prunes on id from commit zero
    import json

    log = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    adds = [json.loads(x)["add"] for x in open(log) if '"add"' in x]
    assert all("stats" in a and json.loads(a["stats"])["numRecords"] > 0
               for a in adds)


def test_roundtrip_through_both_formats(spark, tmp_path):
    """delta → iceberg convert, mutate via ICEBERG DML, convert the
    RESULT to a fresh delta clone-style read — values survive both
    format hops."""
    tbl = str(tmp_path / "rt")
    data = [(i, f"v{i}") for i in range(10)]
    write_delta_native(
        spark, spark.createDataFrame(data, "id long, v string").coalesce(1),
        {"path": tbl},
    )
    convert_delta_to_iceberg(spark, {"path": tbl})
    delete_iceberg_native(spark, {
        "path": tbl, "method": "cow",
        "where": [{"key": "id", "op": "<", "value": 3}],
    })
    got = _rows(read_iceberg_native(spark, {"path": tbl}))
    assert got == [(i, f"v{i}") for i in range(3, 10)]


def test_convert_guards(spark, tmp_path):
    # iceberg with live deletes refuses
    tbl = str(tmp_path / "g1")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        ).coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    delete_iceberg_native(spark, {
        "path": tbl, "where": [{"key": "id", "op": "=", "value": 1}],
    })
    with pytest.raises(ValueError, match="compact"):
        convert_iceberg_to_delta(spark, {"path": tbl})
    # double-convert refuses
    tbl2 = str(tmp_path / "g3")
    write_delta_native(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"),
        {"path": tbl2},
    )
    convert_delta_to_iceberg(spark, {"path": tbl2})
    with pytest.raises(FileExistsError, match="already"):
        convert_delta_to_iceberg(spark, {"path": tbl2})


def test_partitioned_delta_to_iceberg(spark, tmp_path):
    """r10: partitioned delta converts — identity spec, per-file
    partition records from partitionValues, and the reader fills the
    physically-absent partition columns (spec Column Projection #2)."""
    tbl = str(tmp_path / "pd2i")
    rows = [(i, f"v{i}", "even" if i % 2 == 0 else "odd", i % 3)
            for i in range(12)]
    write_delta_native(
        spark,
        spark.createDataFrame(rows, "id long, v string, par string, b long"),
        {"path": tbl, "partitionBy": ["par", "b"]},
    )
    out = convert_delta_to_iceberg(spark, {"path": tbl})
    assert out["rows"] == 12
    got = sorted(
        (r["id"], r["v"], r["par"], r["b"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == sorted(rows)
    # manifest-level partition pruning works on the converted records
    pruned = read_iceberg_native(
        spark, {"path": tbl, "partitionFilter": {"par": "even"}}
    )
    assert sorted(r["id"] for r in pruned.collect()) == [0, 2, 4, 6, 8, 10]


def test_column_mapped_delta_to_iceberg(spark, tmp_path):
    """r10: column-mapped delta converts — iceberg field-ids from
    delta.columnMapping.id, physical names resolved through the
    manifest's embedded write schema (field-id renames)."""
    tbl = str(tmp_path / "cm2i")
    data = [(i, f"v{i}") for i in range(10)]
    write_delta_native(
        spark, spark.createDataFrame(data, "id long, v string").coalesce(1),
        {"path": tbl,
         "properties": {"delta.columnMapping.mode": "name"}},
    )
    out = convert_delta_to_iceberg(spark, {"path": tbl})
    assert out["converted_files"] == 1
    df = read_iceberg_native(spark, {"path": tbl})
    assert sorted(df.columns) == ["id", "v"]  # LOGICAL names
    assert _rows(df) == sorted(data)
    # manifest bounds carried under the mapped field-ids: data skipping
    # prunes on the logical filter key
    got = read_iceberg_native(
        spark, {"path": tbl, "dataFilter": {"key": "id", "op": ">=",
                                            "value": 8}},
    )
    assert sorted(r["id"] for r in got.collect()) == [8, 9]


def test_dv_delta_to_iceberg(spark, tmp_path):
    """r10: live delta deletion vectors convert — re-framed as iceberg
    v3 puffin DV blobs over the same (untouched) data files."""
    import json as _json

    from pipeline_spark.sinks.delta_native import delete_delta_native

    tbl = str(tmp_path / "dv2i")
    data = [(i, f"v{i}") for i in range(20)]
    write_delta_native(
        spark, spark.createDataFrame(data, "id long, v string").coalesce(1),
        {"path": tbl,
         "properties": {"delta.enableDeletionVectors": "true"}},
    )
    before = {f for f in os.listdir(tbl) if f.endswith(".parquet")}
    delete_delta_native(spark, {
        "path": tbl, "method": "dv",
        "where": [{"key": "id", "op": "<", "value": 5}],
    })
    out = convert_delta_to_iceberg(spark, {"path": tbl})
    assert out["deletion_vectors"] == 1
    # zero copy held even across the DV translation
    after = {f for f in os.listdir(tbl) if f.endswith(".parquet")}
    assert after == before
    got = _rows(read_iceberg_native(spark, {"path": tbl}))
    assert got == [(i, f"v{i}") for i in range(5, 20)]
    # the converted table is a well-formed v3 table (row-lineage fields)
    mfile = next(
        os.path.join(tbl, "metadata", n)
        for n in os.listdir(os.path.join(tbl, "metadata"))
        if n.endswith(".metadata.json")
    )
    m = _json.load(open(mfile))
    assert m["format-version"] == 3 and m["next-row-id"] == 20


def test_partitioned_cm_dv_delta_to_iceberg(spark, tmp_path):
    """The three translations compose: partitioned + column-mapped +
    DV-carrying delta converts and reads back exactly."""
    from pipeline_spark.sinks.delta_native import delete_delta_native

    tbl = str(tmp_path / "all2i")
    rows = [(i, f"v{i}", i % 2) for i in range(12)]
    write_delta_native(
        spark,
        spark.createDataFrame(rows, "id long, v string, par long"),
        {"path": tbl, "partitionBy": ["par"],
         "properties": {"delta.columnMapping.mode": "name",
                        "delta.enableDeletionVectors": "true"}},
    )
    delete_delta_native(spark, {
        "path": tbl, "method": "dv",
        "where": [{"key": "id", "op": "<", "value": 4}],
    })
    convert_delta_to_iceberg(spark, {"path": tbl})
    got = sorted(
        (r["id"], r["v"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(i, f"v{i}", i % 2) for i in range(4, 12)]


def test_partitioned_cm_percent_encoded_value(spark, tmp_path):
    """A partition value with a space percent-encodes into the directory
    name; the evolved scan's lineage stamp must percent-DECODE so the
    identity fill (and MOR delete matching) still key-match the plan's
    raw paths.  Regression: caught by the r10 verify drive on
    o_orderpriority='4-NOT SPECIFIED'."""
    tbl = str(tmp_path / "sp2i")
    rows = [(1, "NOT SPECIFIED"), (2, "HIGH"), (3, "NOT SPECIFIED")]
    write_delta_native(
        spark, spark.createDataFrame(rows, "id long, par string"),
        {"path": tbl, "partitionBy": ["par"],
         "properties": {"delta.columnMapping.mode": "name"}},
    )
    convert_delta_to_iceberg(spark, {"path": tbl})
    got = sorted(
        (r["id"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == sorted(rows)


def test_tableconvert_module(spark, tmp_path):
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    tbl = str(tmp_path / "mod")
    write_delta_native(
        spark,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(5)], "id long, v string"
        ).coalesce(1),
        {"path": tbl},
    )
    cfg = f"""
sources:
  - name: noop
    module: create
    parameters: {{elements: [{{x: 1}}]}}
sinks:
  - name: conv
    module: tableconvert
    inputs: [noop]
    parameters: {{path: {tbl}, to: iceberg}}
"""
    run_pipeline(spark, parse_config(cfg))
    assert len(_rows(read_iceberg_native(spark, {"path": tbl}))) == 5
