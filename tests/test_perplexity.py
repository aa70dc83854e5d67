"""ARPA LM trainer/parser/scorer + the textstats `perplexity` op.

The trainer's math is checked against closed-form hand computations; the
scorer's backoff rule is checked against a direct recursive reference;
the op is exercised end-to-end through the config path.
"""

from __future__ import annotations

import math

import pytest

from pipeline_spark.functions.arpalm import (
    ArpaLM,
    normalize_tokens,
    parse_arpa,
    train_arpa,
)

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
]


def test_train_parse_roundtrip_counts():
    text = train_arpa(CORPUS, order=2)
    lm = parse_arpa(text)
    assert lm.order == 2
    # declared counts match emitted entries
    header = dict(
        line.split("=")
        for line in text.splitlines()
        if line.startswith("ngram")
        for line in [line.replace("ngram ", "")]
    )
    assert int(header["1"]) == len(lm.grams[1])
    assert int(header["2"]) == len(lm.grams[2])
    # every word of the corpus is in the vocab, plus <unk>
    vocab = {w for s in CORPUS for w in s.split()}
    assert {g[0] for g in lm.grams[1]} == vocab | {"<unk>"}


def test_unigram_additive_smoothing_exact():
    lm = parse_arpa(train_arpa(CORPUS, order=1))
    n = sum(len(s.split()) for s in CORPUS)  # 17 tokens
    v = len({w for s in CORPUS for w in s.split()})
    # c(the) = 4
    assert lm.grams[1][("the",)][0] == pytest.approx(
        math.log10((4 + 1) / (n + v + 1)), abs=1e-6
    )
    assert lm.unk_logprob == pytest.approx(math.log10(1 / (n + v + 1)), abs=1e-6)


def test_bigram_discount_and_backoff_mass():
    lm = parse_arpa(train_arpa(CORPUS, order=2, discount=0.75))
    # context 'the': continuations cat,dog,mat,log each once -> denom 4, types 4
    assert lm.grams[2][("the", "cat")][0] == pytest.approx(
        math.log10((1 - 0.75) / 4), abs=1e-6
    )
    # Katz alpha: leftover mass / unseen unigram mass
    n = sum(len(s.split()) for s in CORPUS)
    v = len({w for s in CORPUS for w in s.split()})

    def uni(w, c):
        return (c + 1) / (n + v + 1)

    seen_lower = uni("cat", 2) + uni("dog", 2) + uni("mat", 1) + uni("log", 1)
    assert lm.grams[1][("the",)][1] == pytest.approx(
        math.log10((0.75 * 4 / 4) / (1 - seen_lower)), abs=1e-5
    )
    # probability mass: sum_w P(w|the) over vocab+unk == 1 (up to the
    # 6-decimal rounding the ARPA text serialization applies)
    vocab = sorted({w for s in CORPUS for w in s.split()} | {"<unk>"})
    total = sum(10 ** lm.logprob(("the",), w) for w in vocab)
    assert total == pytest.approx(1.0, abs=1e-5)


def test_backoff_scoring_matches_direct_reference():
    lm = parse_arpa(train_arpa(CORPUS, order=3))

    def ref_logprob(ctx: tuple, w: str) -> float:
        ctx = ctx[-(lm.order - 1):]
        for k in range(len(ctx), -1, -1):
            sub = ctx[len(ctx) - k:]
            if sub + (w,) in lm.grams[k + 1]:
                acc = 0.0
                # accumulate backoffs of the *longer* contexts we skipped
                for j in range(len(ctx), k, -1):
                    acc += lm.grams[j].get(ctx[len(ctx) - j:], (0.0, 0.0))[1]
                return acc + lm.grams[k + 1][sub + (w,)][0]
        acc = 0.0
        for j in range(len(ctx), 0, -1):
            acc += lm.grams[j].get(ctx[len(ctx) - j:], (0.0, 0.0))[1]
        return acc + lm.unk_logprob

    seqs = [
        "the cat sat on the log",
        "a dog sat",
        "zebra the cat",
        "the zebra jumped over",
    ]
    for s in seqs:
        toks = normalize_tokens(s)
        for i, w in enumerate(toks):
            ctx = tuple(toks[max(0, i - lm.order + 1):i])
            assert lm.logprob(ctx, w) == pytest.approx(
                ref_logprob(ctx, w), abs=1e-9
            ), (s, i, w)


def test_perplexity_prefers_in_domain_text():
    lm = parse_arpa(train_arpa(CORPUS, order=2))
    in_domain = lm.perplexity(normalize_tokens("the cat sat on the mat"))
    gibberish = lm.perplexity(normalize_tokens("zq wv xx qq zz yy"))
    assert in_domain is not None and gibberish is not None
    assert in_domain < gibberish
    assert lm.perplexity([]) is None


def test_parse_arpa_space_separated_and_missing_backoff():
    text = """\\data\\
ngram 1=3
ngram 2=1

\\1-grams:
-1.0 <unk>
-0.5 the -0.2
-0.7 cat

\\2-grams:
-0.3 the cat

\\end\\
"""
    lm = parse_arpa(text)
    assert lm.grams[1][("the",)] == (-0.5, -0.2)
    assert lm.grams[1][("cat",)] == (-0.7, 0.0)
    assert lm.grams[2][("the", "cat")] == (-0.3, 0.0)
    # backoff applies: P(cat | dog-context) = bo(dog)=0 -> unigram
    assert lm.logprob(("dog",), "cat") == pytest.approx(-0.7)
    # seen bigram wins
    assert lm.logprob(("the",), "cat") == pytest.approx(-0.3)


def _run_op(spark, df, params):
    from pipeline_spark.operators.textstats import textstats_transform
    from pipeline_spark.registry import ModuleContext

    return textstats_transform(
        ModuleContext(spark=spark, name="pp", params=params, inputs=[df])
    )[""]


def test_perplexity_op_end_to_end(spark):
    model = train_arpa(CORPUS, order=2)
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zq wv xx qq"), (3, None)],
        "doc_id int, text string",
    )
    out = _run_op(spark, df, {"field": "text", "ops": ["perplexity"], "model": model})
    rows = {r["doc_id"]: r["ppl"] for r in out.collect()}
    lm = parse_arpa(model)
    assert rows[1] == pytest.approx(
        lm.perplexity(normalize_tokens("the cat sat on the mat")), rel=1e-9
    )
    assert rows[2] == pytest.approx(
        lm.perplexity(normalize_tokens("zq wv xx qq")), rel=1e-9
    )
    assert rows[3] is None
    assert rows[1] < rows[2]


def test_perplexity_op_max_ppl_filter(spark):
    model = train_arpa(CORPUS, order=2)
    lm = parse_arpa(model)
    cut = lm.perplexity(normalize_tokens("the cat sat")) + 1.0
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zq wv xx qq zz")], "doc_id int, text string"
    )
    out = _run_op(
        spark,
        df,
        {"field": "text", "ops": ["perplexity"], "model": model, "maxPpl": cut},
    )
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_model_size_guard(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(Exception, match="maxModelBytes"):
        _run_op(
            spark,
            df,
            {
                "field": "text",
                "ops": ["perplexity"],
                "model": train_arpa(CORPUS, order=2),
                "maxModelBytes": 10,
            },
        ).collect()
