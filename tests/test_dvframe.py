"""Strategy equivalence for the DV positions frame (r15 optimization):
the driver-decode+broadcast path and the executor-decode path must
subtract exactly the same rows — the threshold only changes the plan,
never the result."""

import pytest
from pyspark.sql import functions as F

from pipeline_spark.functions.dvframe import positions_frame, total_rows_of
from pipeline_spark.sinks.delta_native import (
    delete_delta_native,
    write_delta_native,
)
from pipeline_spark.sinks.iceberg_native import (
    delete_iceberg_native,
    write_iceberg_native,
)
from pipeline_spark.sources.delta_native import read_delta_native
from pipeline_spark.sources.iceberg_native import read_iceberg_native


def test_total_rows_of():
    assert total_rows_of([3, 4]) == 7
    assert total_rows_of([]) == 0
    assert total_rows_of([3, None]) is None


def test_positions_frame_both_strategies_agree(spark):
    entries = [("f1", "[0, 2]"), ("f2", "[5]")]

    def decode(it):
        import json

        for fp, pj in it:
            for pos in json.loads(pj):
                yield (fp, int(pos))

    small, is_small = positions_frame(
        spark, entries, decode, "fp string, pos long", total_rows=3)
    large, is_large = positions_frame(
        spark, entries, decode, "fp string, pos long", total_rows=10**9)
    assert is_small and not is_large
    assert sorted(map(tuple, small.collect())) == \
        sorted(map(tuple, large.collect())) == \
        [("f1", 0), ("f1", 2), ("f2", 5)]


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_dv_read_identical_across_threshold(spark, tmp_path, monkeypatch, fmt):
    t = str(tmp_path / f"t_{fmt}")
    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    if fmt == "delta":
        write_delta_native(spark, df, {
            "path": t,
            "properties": {"delta.enableDeletionVectors": "true"}})
        delete_delta_native(spark, {
            "path": t, "method": "dv",
            "where": [{"key": "id", "op": "<", "value": 60}]})
        read = lambda: read_delta_native(spark, {"path": t})
    else:
        write_iceberg_native(df, {"path": t, "formatVersion": 3})
        delete_iceberg_native(spark, {
            "path": t, "method": "dv",
            "where": [{"key": "id", "op": "<", "value": 60}]})
        read = lambda: read_iceberg_native(spark, {"path": t})

    driver_rows = sorted(map(tuple, read().collect()))
    monkeypatch.setenv("SPARK_GRAFT_DV_DRIVER_MAX", "0")
    exec_rows = sorted(map(tuple, read().collect()))
    assert driver_rows == exec_rows
    assert len(driver_rows) == 140


def test_delta_dv_build_distributed_matches_driver(
    spark, tmp_path, monkeypatch
):
    """The DV *write* side has the same gate: stats-bounded small
    mutations build vectors on the driver, large ones through
    applyInPandas — the table state must be identical either way."""
    def run(env_max):
        t = str(tmp_path / f"t_{env_max}")
        if env_max is not None:
            monkeypatch.setenv("SPARK_GRAFT_DV_DRIVER_MAX", env_max)
        else:
            monkeypatch.delenv("SPARK_GRAFT_DV_DRIVER_MAX", raising=False)
        write_delta_native(
            spark, spark.range(300).select(
                F.col("id"), (F.col("id") * 2).alias("v")),
            {"path": t,
             "properties": {"delta.enableDeletionVectors": "true"}})
        delete_delta_native(spark, {
            "path": t, "method": "dv",
            "where": [{"key": "id", "op": "<", "value": 50}]})
        # second mutation exercises the prior-DV merge on both paths
        delete_delta_native(spark, {
            "path": t, "method": "dv",
            "where": [{"key": "id", "op": ">=", "value": 280}]})
        return sorted(
            map(tuple, read_delta_native(spark, {"path": t}).collect()))

    assert run(None) == run("0")
