"""DSIR importance resampling: lambda math vs a direct reference, the
scoring Column vs a Python replica, Gumbel determinism, and the three
selection modes."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row

from pipeline_spark.operators.dsir import dsir_lambda, dsir_transform
from pipeline_spark.registry import ModuleContext


def ctx(spark, params, inputs):
    return ModuleContext(
        spark=spark, name="ds", params=params, inputs=inputs,
        input_names=["corpus", "target"][: len(inputs)],
    )


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:2], 16)


def _norm_toks(t: str) -> list[str]:
    import re

    return re.sub(r"\s+", " ", (t or "").lower()).strip().split(" ")


CORPUS = [
    Row(doc_id=1, text="spark shuffles data across the cluster"),
    Row(doc_id=2, text="the cat sat on the mat"),
    Row(doc_id=3, text="partition pruning skips parquet files"),
    Row(doc_id=4, text="dogs and cats play in the garden"),
]
TARGET = [
    Row(doc_id=10, text="spark partition shuffles and parquet pruning"),
    Row(doc_id=11, text="cluster data files"),
]


def _ref_lambda(alpha=1.0):
    tc: dict[int, int] = {}
    cc: dict[int, int] = {}
    for rows, counts in ((TARGET, tc), (CORPUS, cc)):
        for r in rows:
            for t in _norm_toks(r.text):
                b = _bucket(t)
                counts[b] = counts.get(b, 0) + 1
    return dsir_lambda(tc, cc, alpha)


def test_lambda_math_closed_form():
    lam = dsir_lambda({0: 3}, {0: 1, 5: 2}, alpha=1.0, buckets=4)
    assert lam[0] == pytest.approx(math.log(4 / 7) - math.log(2 / 7), abs=1e-12)
    assert lam[1] == pytest.approx(math.log(1 / 7) - math.log(1 / 7), abs=1e-12)
    assert lam[5 % 4] == lam[1]  # buckets=4: index 5 simply absent


def test_scores_match_python_replica(spark):
    out = dsir_transform(ctx(
        spark,
        {"field": "text", "idField": "doc_id"},
        [spark.createDataFrame(CORPUS), spark.createDataFrame(TARGET)],
    ))[""]
    got = {r["doc_id"]: r["dsir_weight"] for r in out.collect()}
    lam = _ref_lambda()
    for r in CORPUS:
        want = sum(lam[_bucket(t)] for t in _norm_toks(r.text))
        assert got[r.doc_id] == pytest.approx(want, rel=1e-9), r.doc_id
    # in-domain docs (sharing target vocabulary) outrank the cat/dog docs
    assert min(got[1], got[3]) > max(got[2], got[4])


def test_bigram_features(spark):
    out = dsir_transform(ctx(
        spark,
        {"field": "text", "ngram": 2},
        [spark.createDataFrame(CORPUS), spark.createDataFrame(TARGET)],
    ))[""]
    got = {r["doc_id"]: r["dsir_weight"] for r in out.collect()}
    # replica with bigram grams
    tc: dict[int, int] = {}
    cc: dict[int, int] = {}
    for rows, counts in ((TARGET, tc), (CORPUS, cc)):
        for r in rows:
            toks = _norm_toks(r.text)
            for i in range(len(toks) - 1):
                b = _bucket(" ".join(toks[i : i + 2]))
                counts[b] = counts.get(b, 0) + 1
    lam = dsir_lambda(tc, cc)
    for r in CORPUS:
        toks = _norm_toks(r.text)
        want = sum(lam[_bucket(" ".join(toks[i:i+2]))] for i in range(len(toks) - 1))
        assert got[r.doc_id] == pytest.approx(want, rel=1e-9), r.doc_id


def test_gumbel_deterministic_and_selection_modes(spark):
    base = {"field": "text", "idField": "doc_id", "gumbel": True, "salt": "e0"}
    dfs = [spark.createDataFrame(CORPUS), spark.createDataFrame(TARGET)]
    a = dsir_transform(ctx(spark, base, dfs))[""].collect()
    b = dsir_transform(ctx(spark, base, dfs))[""].collect()
    assert sorted(map(str, a)) == sorted(map(str, b))  # same salt, same keys
    c = dsir_transform(ctx(spark, {**base, "salt": "e1"}, dfs))[""].collect()
    keys_a = {r["doc_id"]: r["dsir_key"] for r in a}
    keys_c = {r["doc_id"]: r["dsir_key"] for r in c}
    assert keys_a != keys_c  # new salt, new permutation

    top = dsir_transform(ctx(spark, {"field": "text", "select": "top", "k": 2}, dfs))[""]
    rows = top.collect()
    assert len(rows) == 2
    all_w = {r["doc_id"]: r["dsir_weight"]
             for r in dsir_transform(ctx(spark, {"field": "text"}, dfs))[""].collect()}
    assert sorted(r["doc_id"] for r in rows) == sorted(
        sorted(all_w, key=all_w.get, reverse=True)[:2]
    )

    thr = dsir_transform(ctx(
        spark, {"field": "text", "select": "threshold", "minWeight": 0.0}, dfs
    ))[""]
    assert {r["doc_id"] for r in thr.collect()} == {d for d, w in all_w.items() if w >= 0}


def test_validation(spark):
    df = spark.createDataFrame(CORPUS)
    with pytest.raises(ValueError, match="target"):
        dsir_transform(ctx(spark, {"field": "text"}, [df]))
    tgt = spark.createDataFrame(TARGET)
    with pytest.raises(ValueError, match="minWeight"):
        dsir_transform(ctx(spark, {"field": "text", "select": "threshold"}, [df, tgt]))
    with pytest.raises(ValueError, match="k > 0"):
        dsir_transform(ctx(spark, {"field": "text", "select": "top"}, [df, tgt]))
    with pytest.raises(ValueError, match="maxRows"):
        dsir_transform(ctx(
            spark, {"field": "text", "select": "top", "k": 100, "maxRows": 10},
            [df, tgt],
        ))


def test_bigram_short_docs_do_not_crash(spark):
    """Docs with < n tokens (incl. empty text) must yield zero grams, not
    a sequence(1,0) slice error."""
    corpus = [Row(doc_id=1, text="hello"), Row(doc_id=2, text=""),
              Row(doc_id=3, text="two words here")]
    out = dsir_transform(ctx(
        spark,
        {"field": "text", "ngram": 2},
        [spark.createDataFrame(corpus), spark.createDataFrame(TARGET)],
    ))[""]
    got = {r["doc_id"]: r["dsir_weight"] for r in out.collect()}
    assert got[1] == 0.0 and got[2] == 0.0  # no bigrams -> empty fold
    assert got[3] != 0.0
