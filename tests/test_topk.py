"""topk heavy hitters: MG fold math, sketch vs exact parity, module params."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pipeline_spark.operators.topk import _mg_fold, heavy_hitters, topk_transform
from pipeline_spark.registry import ModuleContext


def test_mg_fold_respects_counter_budget_and_support():
    summary = {}
    # 60 a's, 30 b's, 10 singletons — m=3 must retain a and b
    vals = ["a"] * 60 + ["b"] * 30 + [f"s{i}" for i in range(10)]
    summary = _mg_fold(summary, vals, [1.0] * len(vals), 3)
    assert len(summary) <= 3
    assert "a" in summary and "b" in summary
    # MG estimates undercount by at most the cut — never overcount
    assert summary["a"] <= 60


@pytest.fixture(scope="module")
def zipf(spark):
    rows = []
    for rank in range(1, 51):
        rows += [Row(word=f"w{rank:02d}", bytes=rank)] * (2000 // rank)
    return spark.createDataFrame(rows).repartition(8)


def test_sketch_matches_exact(spark, zipf):
    exact = heavy_hitters(zipf, "word", k=10, strategy="exact").collect()
    sketch = heavy_hitters(zipf, "word", k=10, counters=64).collect()
    assert [(r["value"], r["weight"]) for r in sketch] == [
        (r["value"], r["weight"]) for r in exact
    ]
    # exact weights, descending, deterministic head
    assert sketch[0]["value"] == "w01" and sketch[0]["weight"] == 2000.0


def test_weight_field_sums_instead_of_counts(spark, zipf):
    out = heavy_hitters(zipf, "word", k=3, weight_field="bytes", counters=64).collect()
    # weight = count * rank = 2000//rank * rank ≈ 2000 for every word, so
    # ties break on value ascending
    assert [r["value"] for r in out] == ["w01", "w02", "w04"]
    assert out[0]["weight"] == 2000.0


def test_tie_break_on_value(spark):
    df = spark.createDataFrame(
        [Row(v="z"), Row(v="a"), Row(v="m"), Row(v="z"), Row(v="a"), Row(v="m")]
    )
    out = heavy_hitters(df, "v", k=2, counters=16).collect()
    assert [r["value"] for r in out] == ["a", "m"]


def test_null_values_ignored(spark):
    df = spark.createDataFrame([Row(v="x"), Row(v=None), Row(v="x")])
    out = heavy_hitters(df, "v", k=5, counters=16).collect()
    assert [(r["value"], r["weight"]) for r in out] == [("x", 2.0)]


def test_module_params(spark, zipf):
    ctx = ModuleContext(
        spark=spark, name="t", params={"field": "word", "k": 5, "counters": 32},
        inputs=[zipf], input_names=["in"], side_inputs={},
    )
    out = topk_transform(ctx)[""]
    assert out.columns == ["value", "weight"] and out.count() == 5
    with pytest.raises(ValueError, match="field"):
        topk_transform(ModuleContext(
            spark=spark, name="t", params={}, inputs=[zipf],
            input_names=["in"], side_inputs={},
        ))
    with pytest.raises(ValueError, match="counters"):
        heavy_hitters(zipf, "word", k=10, counters=5)
    with pytest.raises(ValueError, match="strategy"):
        heavy_hitters(zipf, "word", strategy="nope")


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_sketch_equals_exact_property(spark):
    """On any data whose top-k clears the support floor, sketch == exact."""
    import numpy as np

    rng = np.random.default_rng(23)
    for trial in range(3):
        # zipf-ish: value i appears ~1000/(i+1) times, plus unique noise
        vals = []
        for i in range(30):
            vals += [f"v{i:02d}"] * int(1000 / (i + 1))
        vals += [f"noise{j}" for j in range(500)]
        rng.shuffle(vals)
        df = spark.createDataFrame([(v,) for v in vals], "value string").repartition(
            int(rng.integers(2, 12))
        )
        exact = [
            (r["value"], r["weight"])
            for r in heavy_hitters(df, "value", k=10, strategy="exact").collect()
        ]
        sketch = [
            (r["value"], r["weight"])
            for r in heavy_hitters(df, "value", k=10, counters=256).collect()
        ]
        assert sketch == exact, trial
