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
    # partitioned delta refuses (partition cols not in parquet)
    dtbl = str(tmp_path / "g2")
    write_delta_native(
        spark,
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y")], "id long, v string, part string"
        ),
        {"path": dtbl, "partitionBy": ["part"]},
    )
    with pytest.raises(ValueError, match="partition"):
        convert_delta_to_iceberg(spark, {"path": dtbl})
    # double-convert refuses
    tbl2 = str(tmp_path / "g3")
    write_delta_native(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"),
        {"path": tbl2},
    )
    convert_delta_to_iceberg(spark, {"path": tbl2})
    with pytest.raises(FileExistsError, match="already"):
        convert_delta_to_iceberg(spark, {"path": tbl2})


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
