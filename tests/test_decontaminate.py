"""decontaminate module: report/flag/clean modes + broadcast guard."""

import pytest
from pyspark.sql import Row

from pipeline_spark.operators.decontaminate import decontaminate_transform
from pipeline_spark.registry import ModuleContext


def ctx(spark, params, inputs, side=None):
    return ModuleContext(
        spark=spark,
        name="d",
        params=params,
        inputs=inputs,
        input_names=["in"] * len(inputs),
        side_inputs=side or {},
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="the quick brown fox jumps over the lazy dog tonight"),
            Row(doc_id=1, text="pack my box with five dozen liquor jugs right now"),
            Row(doc_id=2, text="the quick brown fox jumps over something else entirely today"),
            Row(doc_id=3, text="short"),
        ]
    )


@pytest.fixture(scope="module")
def bench(spark):
    # shares the 5-gram "the quick brown fox jumps" with docs 0 and 2
    return spark.createDataFrame(
        [Row(doc_id=100, text="benchmark asks about the quick brown fox jumps over")]
    )


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_report_counts_and_overlap(spark, corpus, bench):
    out = decontaminate_transform(
        ctx(spark, {"ngram": 5}, [corpus], {"bench": bench})
    )[""]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_grams"] == 6  # 10 tokens → 6 distinct 5-grams
    assert rows[0]["matched"] == 2  # "the quick...jumps", "quick...jumps over"
    assert abs(rows[0]["overlap"] - 2 / 6) < 1e-9
    assert rows[1]["matched"] == 0
    assert rows[2]["matched"] == 2
    assert rows[3]["n_grams"] == 0 and rows[3]["overlap"] == 0.0


def test_clean_drops_contaminated(spark, corpus, bench):
    out = decontaminate_transform(
        ctx(spark, {"ngram": 5, "output": "clean"}, [corpus], {"bench": bench})
    )[""]
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_flag_preserves_all_rows(spark, corpus, bench):
    out = decontaminate_transform(
        ctx(
            spark,
            {"ngram": 5, "output": "flag", "minMatches": 2},
            [corpus],
            {"bench": bench},
        )
    )[""]
    flags = {r["doc_id"]: r["contaminated"] for r in out.collect()}
    assert flags == {0: True, 1: False, 2: True, 3: False}


def test_requires_side_input(spark, corpus):
    with pytest.raises(ValueError, match="sideInput"):
        decontaminate_transform(ctx(spark, {}, [corpus]))


def test_benchmark_broadcast_guard(spark, corpus, bench):
    with pytest.raises(ValueError, match="too large to broadcast"):
        decontaminate_transform(
            ctx(
                spark,
                {"ngram": 5, "maxBenchmarkGrams": 2},
                [corpus],
                {"bench": bench},
            )
        )
