"""chunk transform: fixed-size word/char windows with overlap."""

import pytest
from pyspark.sql import Row

from pipeline_spark.operators.chunk import chunk_transform
from pipeline_spark.registry import ModuleContext


def run(spark, rows, params):
    df = spark.createDataFrame(rows)
    return chunk_transform(
        ModuleContext(
            spark=spark, name="c", params=params,
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )[""].collect()


def test_word_windows_no_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))
    out = run(spark, [Row(doc=1, text=text)], {"size": 4})
    chunks = sorted((r["chunk_id"], r["chunk_text"], r["n_units"]) for r in out)
    assert chunks == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w4 w5 w6 w7", 4),
        (2, "w8 w9", 2),
    ]


def test_word_windows_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(7))
    out = run(spark, [Row(doc=1, text=text)], {"size": 4, "overlap": 2})
    chunks = sorted((r["chunk_id"], r["chunk_text"]) for r in out)
    # starts 0,2,4,6 (step 2)
    assert chunks == [
        (0, "w0 w1 w2 w3"),
        (1, "w2 w3 w4 w5"),
        (2, "w4 w5 w6"),
        (3, "w6"),
    ]


def test_min_chunk_units_drops_tail(spark):
    text = " ".join(f"w{i}" for i in range(9))
    out = run(spark, [Row(doc=1, text=text)], {"size": 4, "minChunkUnits": 2})
    assert len(out) == 2  # the 1-word tail (w8) is dropped


def test_char_windows_and_empty_doc(spark):
    out = run(
        spark,
        [Row(doc=1, text="abcdefghij"), Row(doc=2, text=""), Row(doc=3, text=None)],
        {"unit": "chars", "size": 4},
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc"], []).append((r["chunk_id"], r["chunk_text"]))
    assert sorted(by_doc[1]) == [(0, "abcd"), (1, "efgh"), (2, "ij")]
    assert 2 not in by_doc and 3 not in by_doc  # no rows for empty/null


def test_whitespace_runs_and_validation(spark):
    out = run(spark, [Row(doc=1, text="  a \n b\t\tc  ")], {"size": 2})
    chunks = sorted((r["chunk_id"], r["chunk_text"]) for r in out)
    assert chunks == [(0, "a b"), (1, "c")]
    with pytest.raises(ValueError, match="overlap"):
        run(spark, [Row(doc=1, text="x")], {"size": 4, "overlap": 4})


def test_plan_is_pure_column(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(text="a b c")])
    out = chunk_transform(
        ModuleContext(
            spark=spark, name="c", params={"size": 2},
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )[""]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
