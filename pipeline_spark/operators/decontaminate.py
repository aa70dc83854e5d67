"""`decontaminate` transform: benchmark-overlap detection for training data.

Training-data-pipeline extension (BASELINE.json north star; the reference
has no analogue — its pipeline stops at warehouse ETL).  Standard
decontamination practice for LLM corpora (as published for GPT-3 /
PaLM-class training runs): a training document is contaminated if it
shares word n-grams with an evaluation/benchmark set; matched documents
are flagged or dropped before training.

Plan shape, designed for a 100 TB corpus vs a small benchmark side:

  1. benchmark side → distinct n-gram hashes (8-byte ints).  Benchmarks
     are MBs, not TBs — the gram-hash set is broadcast (contract-guarded:
     counts the gram set and refuses silent giant broadcasts).
  2. corpus side → per-doc distinct gram hashes, exploded map-side; the
     broadcast hash join marks matches WITHOUT shuffling corpus grams.
  3. one shuffle: partial-agg count of matched grams per doc (ints), then
     join back per-doc gram totals for the overlap fraction.

Corpus text bytes never shuffle; the only wide exchange carries
(doc_id, count) pairs.  Output modes: ``report`` (per-doc match stats),
``clean`` (drop contaminated docs), ``flag`` (corpus + boolean column).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.functions.partitioning import spread
from pipeline_spark.operators.dedup import normalize_text, tokens
from pipeline_spark.operators.tokenize import hashed_word_shingles
from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def _gram_hashes(df: DataFrame, text_field: str, n: int) -> DataFrame:
    """Distinct benchmark n-gram hashes (one 8-byte int per gram).

    Both the benchmark side and the corpus side MUST build fingerprints
    the same way (hashed_word_shingles over pre-hashed tokens) — matches
    are hash equality, so the two sides have to agree on the scheme.
    Two selects on purpose: the token-hash array must be an attribute
    reference inside the shingle lambda, or it would re-evaluate per
    position."""
    th = F.transform(tokens(F.col(text_field)), lambda t: F.xxhash64(t))
    return (
        df.select(th.alias("__th__"))
        .select(
            F.explode(
                F.array_distinct(hashed_word_shingles(F.col("__th__"), n))
            ).alias("g")
        )
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_field: str = "text",
    id_field: str = "doc_id",
    bench_text_field: str | None = None,
    ngram: int = 13,
    max_benchmark_grams: int = 50_000_000,
) -> DataFrame:
    """Per-document benchmark overlap: (id, n_grams, matched, overlap).

    ``matched`` counts the doc's distinct n-grams that appear anywhere in
    the benchmark set; ``overlap`` = matched / n_grams (0.0 when the doc
    is shorter than one n-gram).  Docs with zero grams are reported, not
    dropped — deciding their fate is the caller's policy.
    """
    # persisted: the guard count AND the broadcast join both consume the
    # benchmark gram set; without the cache its tokenize pipeline runs
    # twice.  Small by contract (8 B/gram ints).
    bench = _gram_hashes(benchmark, bench_text_field or text_field, ngram).persist()
    # broadcast guard: the benchmark contract is "small"; a config mixup
    # (corpus wired into the benchmark port) would OOM every executor.
    # The limit-probe stops scanning once the cap is disproven.
    if bench.limit(max_benchmark_grams + 1).count() > max_benchmark_grams:
        raise ValueError(
            f"decontaminate: benchmark side exceeds {max_benchmark_grams} "
            "distinct n-grams — too large to broadcast; lower ngram or "
            "raise maxBenchmarkGrams deliberately"
        )

    # ONE corpus tokenize pass, cached as (doc, hashed distinct-gram
    # array) int arrays and reused by both consumers.  r15: the per-doc
    # gram count is the ARRAY SIZE, read pre-explode — the former
    # exploded.groupBy(id).count() pass (a second scan of the cache plus
    # a full shuffle+aggregate) is free here.  Fingerprints are
    # hashed_word_shingles (same scheme as the benchmark side above —
    # matches are hash equality); no gram strings are ever built.
    th = F.transform(tokens(F.col(text_field)), lambda t: F.xxhash64(t))
    hashed = (
        spread(corpus)
        .select(F.col(id_field).alias("__id__"), th.alias("__th__"))
        .select(
            "__id__",
            F.array_distinct(
                hashed_word_shingles(F.col("__th__"), ngram)
            ).alias("hs"),
        )
        .persist()
    )
    exploded = hashed.select("__id__", F.explode("hs").alias("g"))
    sizes = hashed.select("__id__", F.size("hs").alias("n_grams"))
    matched = (
        exploded.join(F.broadcast(bench), "g")
        .groupBy("__id__")
        .agg(F.count(F.lit(1)).alias("matched"))
    )
    # zero-gram docs vanish from the explode — restore from a slim
    # id-column scan (columnar projection, no re-tokenize)
    ids = corpus.select(F.col(id_field).alias("__id__"))
    return (
        ids.join(sizes, "__id__", "left")
        .join(matched, "__id__", "left")
        .select(
            F.col("__id__").alias(id_field),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("int").alias("n_grams"),
            F.coalesce(F.col("matched"), F.lit(0)).cast("long").alias("matched"),
            F.when(F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                   F.coalesce(F.col("matched"), F.lit(0)) / F.col("n_grams"))
            .otherwise(F.lit(0.0))
            .alias("overlap"),
        )
    )


@module("decontaminate", kind=KIND_TRANSFORM)
def decontaminate_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    """Corpus = main input; benchmark = side input (required)."""
    p: dict[str, Any] = ctx.params
    if not ctx.side_inputs:
        raise ValueError("decontaminate: requires the benchmark as a sideInput")
    corpus = ctx.input
    benchmark = next(iter(ctx.side_inputs.values()))
    id_field = p.get("idField", "doc_id")
    report = contamination_report(
        corpus,
        benchmark,
        text_field=p.get("field") or p.get("textField", "text"),
        id_field=id_field,
        bench_text_field=p.get("benchmarkField"),
        ngram=int(p.get("ngram", 13)),
        max_benchmark_grams=int(p.get("maxBenchmarkGrams", 50_000_000)),
    )
    mode = str(p.get("output", "report")).lower()
    if mode == "report":
        return {"": report}
    # contamination policy: ≥ minMatches matched grams OR overlap ≥ maxOverlap
    min_matches = int(p.get("minMatches", 1))
    max_overlap = p.get("maxOverlap")
    contaminated = F.col("matched") >= F.lit(min_matches)
    if max_overlap is not None:
        contaminated = contaminated | (F.col("overlap") >= F.lit(float(max_overlap)))
    flags = report.select(id_field, contaminated.alias("contaminated"))
    if mode == "flag":
        return {"": ctx.input.join(flags, id_field, "left").fillna(
            {"contaminated": False}
        )}
    if mode == "clean":
        dirty = flags.filter(F.col("contaminated")).select(id_field)
        return {"": ctx.input.join(dirty, id_field, "left_anti")}
    raise ValueError(f"decontaminate: unknown output mode '{mode}'")
