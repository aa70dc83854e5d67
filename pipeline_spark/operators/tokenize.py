"""`tokenize` transform: per-field text analysis pipelines.

Reference: module/transform/TokenizeTransform.java:28-268 drives Lucene
analyzers (util/domain/text/analyzer/TokenAnalyzer.java; doc
docs/config/module/transform/tokenize.md:1-158): char filters → tokenizer
→ token filters, emitting array<struct{token,...}>.

Spark-first re-expression: the common tokenizers/filters compile to
JVM-side column expressions (split / regexp / transform / filter on
arrays) — no Python in the hot path:

  tokenizer: whitespace | pattern(split) | ngram | standard-ish regex
  filters:   lowercase, length(min,max), stop-words, ngram, shingle,
             asciifolding(approx), edge_ngram

Lucene-specific analyzers (kuromoji Japanese, OpenNLP, ICU) are out of
container scope — gated behind NotImplementedError with the config shape
preserved.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline_spark.functions.partitioning import spread
from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def tokenize_column(col: Column, tokenizer: dict[str, Any] | None, filters: list[dict[str, Any]]) -> Column:
    tk = (tokenizer or {}).get("type", "standard").lower()
    if tk in ("whitespace",):
        toks = F.split(col, r"\s+")
    elif tk in ("pattern", "simplepatternsplit", "simple_pattern_split"):
        toks = F.split(col, (tokenizer or {}).get("pattern", r"\W+"))
    elif tk in ("standard",):
        # standard-ish: split on non-alphanumerics (unicode-aware)
        toks = F.split(col, r"[^\p{L}\p{N}]+")
    elif tk in ("keyword",):
        toks = F.array(col)
    elif tk in ("ngram",):
        n = int((tokenizer or {}).get("minGram", (tokenizer or {}).get("n", 3)))
        toks = character_ngrams(col, n)
    else:
        raise NotImplementedError(f"tokenizer '{tk}' requires Lucene/ICU (not in container)")

    toks = F.filter(toks, lambda t: (t.isNotNull()) & (F.length(t) > 0))

    for flt in filters or []:
        ft = str(flt.get("type", "")).lower()
        if ft == "lowercase":
            toks = F.transform(toks, lambda t: F.lower(t))
        elif ft == "uppercase":
            toks = F.transform(toks, lambda t: F.upper(t))
        elif ft == "length":
            mn = int(flt.get("min", 0))
            mx = int(flt.get("max", 1 << 30))
            toks = F.filter(toks, lambda t: (F.length(t) >= mn) & (F.length(t) <= mx))
        elif ft in ("stop", "stopwords"):
            words = [w.lower() for w in flt.get("words", _ENGLISH_STOP)]
            arr = F.array(*[F.lit(w) for w in words])
            toks = F.filter(toks, lambda t: ~F.array_contains(arr, F.lower(t)))
        elif ft in ("keep", "keepword"):
            words = flt.get("words", [])
            arr = F.array(*[F.lit(w) for w in words])
            toks = F.filter(toks, lambda t: F.array_contains(arr, t))
        elif ft == "shingle":
            n = int(flt.get("size", flt.get("maxShingleSize", 2)))
            toks = word_shingles(toks, n, flt.get("separator", " "))
        elif ft in ("patternreplace", "pattern_replace"):
            toks = F.transform(toks, lambda t: F.regexp_replace(t, flt["pattern"], flt.get("replacement", "")))
        elif ft in ("edge_ngram", "edgengram"):
            n = int(flt.get("maxGram", 3))
            toks = F.transform(toks, lambda t: F.substring(t, 1, n))
        else:
            raise NotImplementedError(f"token filter '{ft}' not supported")
    return toks


def character_ngrams(col: Column, n: int) -> Column:
    """Character n-grams via sequence+substr — pure Column ops.

    Guarded: F.sequence(1, stop) would count DOWN when stop < 1, so short
    strings return an empty array explicitly.
    """
    return F.when(
        F.length(col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(col) - F.lit(n - 1)),
            lambda i: col.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(toks: Column, n: int, sep: str = " ") -> Column:
    """Word n-gram shingles over a token array (MinHash substrate)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(sep, F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


_ENGLISH_STOP = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
]


@module("tokenize", kind=KIND_TRANSFORM)
def tokenize_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = spread(ctx.input)
    fields = p.get("fields") or []
    for spec in fields:
        name = spec.get("name") or f"{spec['field']}_tokens"
        col = F.col(spec["field"]).cast("string")
        toks = tokenize_column(col, spec.get("tokenizer"), spec.get("filters", []))
        df = df.withColumn(name, toks)
    return {"": df}
