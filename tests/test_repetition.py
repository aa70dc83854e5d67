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


def _cut(spark, docs, **params):
    out = repetition_transform(
        ctx(spark, {"mode": "cut", **params}, [docs])
    )[""]
    return {r["doc_id"]: r for r in out.collect()}


def test_cut_keeps_canonical_first_occurrence(spark):
    dup = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro words {dup} tail one"),
            Row(doc_id=2, text=f"other opening {dup} closing"),
        ]
    )
    rows = _cut(spark, docs, ngram=4)
    # doc 1 holds the canonical copy (min doc_id), doc 2 loses the span
    assert rows[1]["text"] == f"intro words {dup} tail one"
    assert rows[1]["n_removed"] == 0
    assert rows[2]["text"] == "other opening closing"
    assert rows[2]["n_removed"] == 4
    assert rows[2]["n_tokens"] == 7


def test_cut_within_doc_second_occurrence_removed(spark):
    dup = "one two three four"
    docs = spark.createDataFrame(
        [Row(doc_id=7, text=f"{dup} middle bit {dup} end")]
    )
    rows = _cut(spark, docs, ngram=4)
    assert rows[7]["text"] == f"{dup} middle bit end"
    assert rows[7]["n_removed"] == 4


def test_cut_overlapping_spans_merge(spark):
    # doc 2 repeats a 5-token run; with ngram=4 two overlapping duplicated
    # grams cover tokens 0..4 — the union cuts 5 tokens, not 8
    run = "p q r s t"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{run} unique trailer here"),
            Row(doc_id=2, text=f"{run} different ending words"),
        ]
    )
    rows = _cut(spark, docs, ngram=4)
    assert rows[2]["text"] == "different ending words"
    assert rows[2]["n_removed"] == 5


def test_cut_short_doc_unchanged_and_normalized_view(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="Tiny  DOC"), Row(doc_id=2, text="")]
    )
    rows = _cut(spark, docs, ngram=4)
    # cut operates on the canonical normalized view (lowercase, collapsed)
    assert rows[1]["text"] == "tiny doc"
    assert rows[1]["n_removed"] == 0
    assert rows[2]["text"] == ""


def test_cut_stride_skips_unanchored_duplicates(spark):
    dup = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{dup} filler"),
            # duplicate starts at pos 1 in doc 2 — invisible to stride=2
            Row(doc_id=2, text=f"x {dup}"),
        ]
    )
    exact = _cut(spark, docs, ngram=4, stride=1)
    assert exact[2]["n_removed"] == 4
    strided = _cut(spark, docs, ngram=4, stride=2)
    assert strided[2]["n_removed"] == 0


def test_cut_param_validation(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    with pytest.raises(ValueError, match="ngram"):
        _cut(spark, docs, ngram=1)
    with pytest.raises(ValueError, match="stride"):
        _cut(spark, docs, ngram=4, stride=0)
