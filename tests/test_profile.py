"""profile module: one-pass column stats, numeric vs string, approx path."""

import pytest
from pyspark.sql import Row

from pipeline_spark.operators.profile import profile, profile_transform
from pipeline_spark.registry import ModuleContext


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        [
            Row(id=1, score=10.0, name="bob"),
            Row(id=2, score=2.5, name="alice"),
            Row(id=3, score=None, name="bob"),
            Row(id=4, score=100.0, name=None),
        ]
    )


def test_profile_stats(spark, table):
    rows = {r["column"]: r for r in profile(table).collect()}
    assert set(rows) == {"id", "score", "name"}
    i = rows["id"]
    assert (i["dtype"], i["n_rows"], i["n_nulls"], i["n_distinct"]) == ("bigint", 4, 0, 4)
    assert (i["min_value"], i["max_value"], i["mean"]) == ("1", "4", 2.5)
    s = rows["score"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 3)
    # native-type comparison: 2.5 < 10.0 < 100.0, not lexicographic
    assert (s["min_value"], s["max_value"]) == ("2.5", "100.0")
    assert s["mean"] == 37.5
    n = rows["name"]
    assert (n["n_nulls"], n["n_distinct"], n["mean"]) == (1, 2, None)
    assert (n["min_value"], n["max_value"]) == ("alice", "bob")


def test_profile_column_subset_and_validation(spark, table):
    out = profile(table, ["id"]).collect()
    assert len(out) == 1 and out[0]["column"] == "id"
    with pytest.raises(ValueError, match="unknown columns"):
        profile(table, ["nope"])


def test_profile_approx_distinct(spark, table):
    rows = {r["column"]: r for r in profile(table, approx_distinct=True).collect()}
    # HLL at this cardinality is exact
    assert rows["id"]["n_distinct"] == 4


def test_profile_module(spark, table):
    out = profile_transform(
        ModuleContext(
            spark=spark, name="p", params={"columns": ["id", "name"]},
            inputs=[table], input_names=["in"], side_inputs={},
        )
    )[""]
    assert [r["column"] for r in out.collect()] == ["id", "name"]


def test_profile_percentiles(spark, table):
    rows = {r["column"]: r for r in profile(
        table, percentiles=[0.5, 0.95]
    ).collect()}
    assert rows["id"]["p50"] == 2.5  # linear interpolation between 2 and 3
    assert rows["id"]["p95"] == 3.85
    assert rows["score"]["p50"] == 10.0  # nulls excluded
    assert rows["name"]["p50"] is None
    with pytest.raises(ValueError, match="percentile"):
        profile(table, percentiles=[1.5]).collect()


def test_profile_percentile_column_naming(spark, table):
    out = profile(table, ["id"], percentiles=[0.25, 0.999]).columns
    assert out[-2:] == ["p25", "p99_9"]
