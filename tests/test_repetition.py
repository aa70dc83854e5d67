"""repetition module: span report, filter mode, line dedup + clean rebuild."""

import pytest
from pyspark.sql import Row

from pipeline_spark.operators.repetition import repetition_transform
from pipeline_spark.registry import ModuleContext


def ctx(spark, params, inputs):
    return ModuleContext(
        spark=spark,
        name="r",
        params=params,
        inputs=inputs,
        input_names=["in"],
        side_inputs={},
    )


@pytest.fixture(scope="module")
def line_docs(spark):
    boiler = "subscribe to our newsletter"
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=f"unique opening line\n{boiler}\nunique closing one"),
            Row(doc_id=2, text=f"{boiler}\nanother original thought"),
            Row(doc_id=3, text="entirely distinct document\n\nwith a blank line"),
        ]
    )


def test_line_report(spark, line_docs):
    out = repetition_transform(
        ctx(spark, {"mode": "lines", "minFreq": 2}, [line_docs])
    )[""]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_lines"] == 3 and rows[1]["dup_lines"] == 1
    assert rows[2]["n_lines"] == 2 and rows[2]["dup_lines"] == 1
    assert rows[3]["dup_lines"] == 0
    assert abs(rows[2]["dup_line_fraction"] - 0.5) < 1e-9


def test_line_clean_preserves_order_and_blanks(spark, line_docs):
    out = repetition_transform(
        ctx(spark, {"mode": "lines", "minFreq": 2, "clean": True}, [line_docs])
    )[""]
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[1] == "unique opening line\nunique closing one"
    assert texts[2] == "another original thought"
    assert texts[3] == "entirely distinct document\n\nwith a blank line"


def test_line_within_doc_repeat_not_global_dup(spark):
    # a line repeated twice in ONE doc has document-frequency 1 → kept
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="echo\necho\nother"), Row(doc_id=2, text="unrelated")]
    )
    out = repetition_transform(
        ctx(spark, {"mode": "lines", "minFreq": 2, "clean": True}, [docs])
    )[""]
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[1] == "echo\necho\nother"


def test_span_report_and_filter(spark):
    shared = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{shared} zeta eta"),
            Row(doc_id=2, text=f"{shared} theta iota"),
            Row(doc_id=3, text="totally different words everywhere in here friend"),
            Row(doc_id=4, text="tiny"),
        ]
    )
    report = repetition_transform(
        ctx(spark, {"mode": "spans", "ngram": 5, "minFreq": 2}, [docs])
    )[""]
    rows = {r["doc_id"]: r for r in report.collect()}
    # docs 1,2 share exactly the 5-gram "alpha beta gamma delta epsilon"
    assert rows[1]["n_spans"] == 3 and rows[1]["dup_spans"] == 1
    assert rows[2]["dup_spans"] == 1
    assert rows[3]["dup_spans"] == 0
    assert rows[4]["n_spans"] == 0 and rows[4]["dup_fraction"] == 0.0

    filtered = repetition_transform(
        ctx(
            spark,
            {"mode": "spans", "ngram": 5, "minFreq": 2, "maxDupFraction": 0.2},
            [docs],
        )
    )[""]
    kept = sorted(r["doc_id"] for r in filtered.collect())
    # docs 1,2 are 1/3 duplicated (> 0.2) → dropped; 4 has 0 spans → kept
    assert kept == [3, 4]


def test_internal_repetition(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="loop loop loop loop loop loop"),  # 1 distinct 3-gram of 4
            Row(doc_id=2, text="one two three four five six"),
        ]
    )
    out = repetition_transform(
        ctx(spark, {"mode": "spans", "ngram": 3, "minFreq": 99}, [docs])
    )[""]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert abs(rows[1]["internal_repetition"] - 0.75) < 1e-9
    assert rows[2]["internal_repetition"] == 0.0
