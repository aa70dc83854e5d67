"""grouped_apply_in_pandas — the many-groups-per-batch substrate under
matchRecognize (functions/grouped_apply.py).  Equivalence with
groupBy().applyInPandas is the contract; the risky paths are groups that
span Arrow batch boundaries and null-valued keys.

Helper fns live INSIDE each test so cloudpickle ships them by value
(executors cannot import the tests package)."""

import pandas as pd
import pytest

from pipeline_spark.functions.grouped_apply import grouped_apply_in_pandas

SCHEMA = "k long, n long, total long"


def _mk_summarize():
    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": [pdf["k"].iloc[0]],
                "n": [len(pdf)],
                "total": [int(pdf["v"].sum())],
            }
        )

    return summarize


def test_matches_apply_in_pandas(spark):
    summarize = _mk_summarize()
    df = spark.range(0, 10_000).selectExpr("id % 37 AS k", "id AS v")
    fast = grouped_apply_in_pandas(df, ["k"], summarize, SCHEMA)
    ref = df.groupBy("k").applyInPandas(summarize, SCHEMA)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, ref.collect()))


def test_group_spans_arrow_batches(spark):
    """One giant group + tiny batches: the group must stitch across
    maxRecordsPerBatch boundaries into a single fn() call."""
    summarize = _mk_summarize()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = spark.range(0, 5_000).selectExpr("id % 3 AS k", "id AS v")
        rows = {
            r["k"]: (r["n"], r["total"])
            for r in grouped_apply_in_pandas(df, ["k"], summarize, SCHEMA).collect()
        }
        import math

        for k in (0, 1, 2):
            size = math.ceil((5_000 - k) / 3)
            assert rows[k][0] == size  # each group arrived as ONE call
        assert sum(t for _, t in rows.values()) == sum(range(5_000))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_null_keys_form_one_group(spark):
    summarize = _mk_summarize()
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (7, 3), (7, 4)], "k long, v long"
    )
    out = grouped_apply_in_pandas(df, ["k"], summarize, SCHEMA).collect()
    by_k = {r["k"]: (r["n"], r["total"]) for r in out}
    assert by_k[None] == (2, 3)
    assert by_k[7] == (2, 7)


def test_multi_key_and_string_keys(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 20), ("a", 2, 1), ("b", 1, 5), (None, 1, 7)],
        "s string, k long, v long",
    )

    def summ(pdf):
        return pd.DataFrame(
            {
                "s": [pdf["s"].iloc[0]],
                "k": [pdf["k"].iloc[0]],
                "total": [int(pdf["v"].sum())],
            }
        )

    out = grouped_apply_in_pandas(df, ["s", "k"], summ, "s string, k long, total long")
    got = {(r["s"], r["k"]): r["total"] for r in out.collect()}
    assert got == {("a", 1): 30, ("a", 2): 1, ("b", 1): 5, (None, 1): 7}


def test_requires_keys(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        grouped_apply_in_pandas(df, [], _mk_summarize(), SCHEMA)
