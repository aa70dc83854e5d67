"""`repetition` transform: repeated-span / repeated-line analysis & removal.

Training-data-pipeline extension (no reference analogue).  Two public
practices folded into one module:

  spans   exact substring duplication at token-k-gram granularity (the
          Lee et al., "Deduplicating Training Data Makes Language Models
          Better", ACL 2022 shape): per doc, the fraction of its distinct
          token k-grams that occur in ≥ ``minFreq`` documents corpus-wide,
          plus the doc's INTERNAL repetition (1 - distinct/total k-grams —
          boilerplate and looping generations score high).
  lines   C4-style line-level dedup: global frequency of each normalized
          line; report per-doc duplicate-line fraction, or CLEAN the text
          by dropping lines that occur in more than ``minFreq`` docs
          (keeping document order).
  cut     the actual Lee et al. ExactSubstr REMOVAL: every corpus-wide
          duplicated token-k-gram occurrence except one canonical copy
          (the globally first by (doc id, position)) is cut out of the
          text; overlapping duplicated spans merge before cutting.  The
          paper does this over a corpus suffix array on one giant
          machine; the Spark shape is positional k-gram fingerprints —
          one (doc, pos, xxhash64) int row per token — a single int-key
          shuffle to rank occurrences, then a doc-local rebuild.

Scale posture: span/line identity shuffles as an 8-byte xxhash64 — raw
text never rides a duplicate-detection exchange.  ``spans`` report is two
int-key shuffles (df counts, per-doc match counts).  ``lines`` clean mode
adds the doc-rebuild shuffle, which carries surviving line text once —
that exchange IS the output.  Internal repetition is a pure Column
expression (zero shuffle).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_spark.functions.partitioning import spread
from pipeline_spark.operators.dedup import tokens
from pipeline_spark.operators.tokenize import hashed_word_shingles
from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def span_repetition_report(
    df: DataFrame,
    *,
    text_field: str = "text",
    id_field: str = "doc_id",
    ngram: int = 10,
    min_freq: int = 2,
) -> DataFrame:
    """(id, n_spans, dup_spans, dup_fraction, internal_repetition).

    ``dup_spans`` counts the doc's distinct k-grams whose document
    frequency (distinct docs containing the gram) reaches ``min_freq``;
    ``internal_repetition`` = 1 - distinct/total grams within the doc.
    """
    # ONE tokenize pass, cached as (id, total, hashed distinct-gram
    # array) — int arrays, ~8 B/gram.  THREE consumers read it (per-doc
    # stats, the df counts, the dup-count join).  r15: per-doc stats are
    # array-local (n_spans = size of the distinct array, total carried
    # through) — the former exploded.groupBy(id).agg(count, first)
    # pass (a second scan of the cache plus a full shuffle+aggregate)
    # is free pre-explode.  Grams are hashed_word_shingles fingerprints
    # (hash of the pre-hashed token slice, no gram strings built;
    # array_distinct dedups longs, not strings — 2.7× faster cache
    # build measured at sf0.1); total = n_tokens - ngram + 1 clamped at
    # 0, exactly ``size(word_shingles(...))`` including the NULL-text
    # case (size(NULL)→NULL, greatest skips it).
    th = F.transform(tokens(F.col(text_field)), lambda t: F.xxhash64(t))
    hashed = (
        spread(df)
        .select(F.col(id_field).alias("__id__"), th.alias("__th__"))
        .select(
            "__id__",
            F.greatest(
                F.size("__th__") - F.lit(ngram - 1), F.lit(0)
            ).alias("total"),
            F.array_distinct(
                hashed_word_shingles(F.col("__th__"), ngram)
            ).alias("hs"),
        )
        .persist()
    )
    exploded = hashed.select("__id__", F.explode("hs").alias("h"))
    stats = hashed.select(
        "__id__", F.size("hs").alias("n_spans"), "total"
    )
    # document frequency per gram: rows are (doc, gram) distinct already
    dfreq = exploded.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    dup = (
        exploded.join(dfreq.filter(F.col("df") >= min_freq), "h")
        .groupBy("__id__")
        .agg(F.count(F.lit(1)).alias("dup_spans"))
    )
    # zero-gram docs vanish from the explode — restore them from a slim
    # id-column scan (columnar projection, no re-tokenize)
    ids = df.select(F.col(id_field).alias("__id__"))
    return (
        ids.join(stats, "__id__", "left")
        .join(dup, "__id__", "left")
        .select(
            F.col("__id__").alias(id_field),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("int").alias("n_spans"),
            F.coalesce(F.col("dup_spans"), F.lit(0)).cast("long").alias("dup_spans"),
            F.when(
                F.coalesce(F.col("n_spans"), F.lit(0)) > 0,
                F.coalesce(F.col("dup_spans"), F.lit(0)) / F.col("n_spans"),
            ).otherwise(F.lit(0.0)).alias("dup_fraction"),
            F.when(
                F.coalesce(F.col("total"), F.lit(0)) > 0,
                1.0 - F.coalesce(F.col("n_spans"), F.lit(0)) / F.col("total"),
            ).otherwise(F.lit(0.0)).alias("internal_repetition"),
        )
    )


def span_cut(
    df: DataFrame,
    *,
    text_field: str = "text",
    id_field: str = "doc_id",
    ngram: int = 50,
    stride: int = 1,
) -> DataFrame:
    """Cut duplicated token spans, keeping one canonical copy corpus-wide.

    Lee et al. "Deduplicating Training Data Makes Language Models Better"
    (ACL 2022) ExactSubstr semantics at token-k-gram granularity: an
    occurrence of a k-gram is REMOVED iff some earlier occurrence (by
    (doc id, position) order) of the same k-gram exists anywhere in the
    corpus.  Removed spans union per doc before cutting, so overlapping
    duplicates don't double-cut.  Output rows:
    (id, text, n_tokens, n_removed) where ``text`` is the doc's canonical
    normalized view (lowercased, single-spaced — the dedup-family text
    view) with removed tokens cut.

    ``stride`` > 1 is the paper's efficiency trade: only anchor positions
    ``pos % stride == 0`` are duplicate candidates, shrinking the
    fingerprint exchange by ~stride× at the cost of missing duplicates
    that never align on an anchor.  Exact mode (stride=1) is the default.

    Scale: fingerprints ride the one shuffle as (id, pos, hash) ints —
    raw text never rides a duplicate-detection exchange; the rebuild
    shuffle carries each surviving token once and IS the output.  No
    caching: the source is re-scanned per stage (column-pruned, map-only)
    because at corpus scale re-reading beats materializing token arrays.
    """
    if ngram < 2:
        raise ValueError(f"span cut: ngram must be >= 2, got {ngram}")
    if stride < 1:
        raise ValueError(f"span cut: stride must be >= 1, got {stride}")
    toks = tokens(F.col(text_field))
    base = spread(df).select(F.col(id_field).alias("__id__"), toks.alias("__t__"))
    # fingerprints come straight from hashed_word_shingles (hash of the
    # pre-hashed token slice) — no k-token gram strings are ever built
    # (at the default ngram=50 the string path concatenated ~50 tokens
    # per position).  Canonical-copy choice is untouched: the window
    # orders by (__id__, pos), never by gram value.
    grams = base.select(
        "__id__",
        F.transform("__t__", lambda t: F.xxhash64(t)).alias("__th__"),
    ).select(
        "__id__",
        F.posexplode(
            hashed_word_shingles(F.col("__th__"), ngram)
        ).alias("pos", "h"),
    )
    if stride > 1:
        grams = grams.filter(F.col("pos") % stride == 0)
    # one int-key shuffle: rank every occurrence of a fingerprint by
    # global (doc, pos) order; rank 1 is the canonical kept copy
    rn = F.row_number().over(Window.partitionBy("h").orderBy("__id__", "pos"))
    removals = grams.withColumn("rn", rn).filter(F.col("rn") > 1)
    # r15 rebuild (guide §2.4): cut via per-doc merged intervals instead
    # of exploding every corpus token into a (doc, idx) anti-join + a
    # collect_list re-assembly — those two shuffles carried EVERY token
    # of EVERY doc; removal starts are duplicate-scale, and a doc with
    # no duplicates now never shuffles at all (the gap join's build side
    # is only the docs with removals).
    starts = removals.groupBy("__id__").agg(
        F.array_sort(F.collect_set("pos")).alias("__ss__")
    )

    def _iv(s_col, e_col):
        return F.struct(
            s_col.cast("int").alias("s"), e_col.cast("int").alias("e")
        )

    # sorted removal starts -> disjoint covered intervals [s, s+n-1],
    # overlapping/adjacent runs merged (starts ascend, so the merged
    # interval's end only ever extends)
    merged = F.aggregate(
        F.col("__ss__"),
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (s <= F.get(acc, F.size(acc) - 1)["e"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(_iv(F.get(acc, F.size(acc) - 1)["s"],
                            s + F.lit(ngram - 1))),
            ),
        ).otherwise(F.concat(acc, F.array(_iv(s, s + F.lit(ngram - 1))))),
    )
    joined = (
        base.join(starts, "__id__", "left")
        .select("__id__", "__t__", F.coalesce(
            merged, F.array().cast("array<struct<s:int,e:int>>")
        ).alias("__iv__"))
    )
    # kept tokens = the gaps between covered intervals, sliced out of the
    # token array in order (gap i spans [prev.e+1, next.s-1]; first gap
    # starts at 0, last ends at the doc's final token)
    t_col, iv = F.col("__t__"), F.col("__iv__")
    k = F.size(iv)
    gaps = F.transform(
        F.sequence(F.lit(0), k),
        lambda i: F.struct(
            F.when(i == 0, F.lit(0))
            .otherwise(F.get(iv, i - 1)["e"] + 1).alias("gs"),
            F.when(i == k, F.size(t_col) - 1)
            .otherwise(F.get(iv, i)["s"] - 1).alias("ge"),
        ),
    )
    kept = F.flatten(F.transform(
        gaps,
        lambda g: F.slice(
            t_col, g["gs"] + 1,
            F.greatest(g["ge"] - g["gs"] + 1, F.lit(0)),
        ),
    ))
    return joined.select(
        F.col("__id__").alias(id_field),
        F.array_join(kept, " ").alias(text_field),
        F.size("__t__").cast("int").alias("n_tokens"),
        (F.size("__t__") - F.size(kept)).cast("int").alias("n_removed"),
    )


def _line_base(
    df: DataFrame, text_field: str, id_field: str, sep: str, min_line_len: int
) -> DataFrame:
    """(id, pos, line, h): h is null for lines too short to dedup."""
    lines = F.split(F.col(text_field), sep)
    return spread(df).select(
        F.col(id_field).alias("__id__"),
        F.posexplode(lines).alias("pos", "line"),
    ).withColumn(
        "h",
        F.when(
            F.length(F.trim(F.col("line"))) >= min_line_len,
            F.xxhash64(F.trim(F.col("line"))),
        ),
    )


def line_dedup(
    df: DataFrame,
    *,
    text_field: str = "text",
    id_field: str = "doc_id",
    separator: str = "\n",
    min_freq: int = 2,
    min_line_len: int = 1,
    clean: bool = False,
) -> DataFrame:
    """Line-frequency report, or the corpus with over-frequent lines removed.

    Frequency counts DOCUMENTS containing the normalized line (so a line
    repeated within one doc doesn't self-promote to "duplicate").  Clean
    mode preserves original line order and keeps short/blank lines.
    """
    base = _line_base(df, text_field, id_field, separator, min_line_len)
    per_doc_line = base.filter(F.col("h").isNotNull()).select("__id__", "h").distinct()
    freq = per_doc_line.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    if not clean:
        joined = base.join(freq, "h", "left")
        return (
            joined.groupBy("__id__")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.count(F.when(F.col("df") >= min_freq, 1)).alias("dup_lines"),
            )
            .select(
                F.col("__id__").alias(id_field),
                "n_lines",
                "dup_lines",
                (F.col("dup_lines") / F.col("n_lines")).alias("dup_line_fraction"),
            )
        )
    hot = freq.filter(F.col("df") >= min_freq)
    kept = base.join(hot, "h", "left_anti")
    rebuilt = (
        kept.groupBy("__id__")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                separator,
            ).alias("__text__")
        )
    )
    out = df.join(
        rebuilt, df[id_field] == rebuilt["__id__"], "left"
    )
    # a doc whose every line was dropped rebuilds to the empty string
    return out.withColumn(
        text_field, F.coalesce(F.col("__text__"), F.lit(""))
    ).drop("__id__", "__text__")


@module("repetition", kind=KIND_TRANSFORM)
def repetition_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    df = ctx.input
    mode = str(p.get("mode", "spans")).lower()
    text_field = p.get("field") or p.get("textField", "text")
    id_field = p.get("idField", "doc_id")
    min_freq = int(p.get("minFreq", 2))
    if mode == "spans":
        report = span_repetition_report(
            df,
            text_field=text_field,
            id_field=id_field,
            ngram=int(p.get("ngram", 10)),
            min_freq=min_freq,
        )
        max_frac = p.get("maxDupFraction")
        if max_frac is None:
            return {"": report}
        # filter mode: keep docs under the duplicate-span budget
        keep = report.filter(
            F.col("dup_fraction") <= F.lit(float(max_frac))
        ).select(id_field)
        return {"": df.join(keep, id_field, "left_semi")}
    if mode == "cut":
        return {
            "": span_cut(
                df,
                text_field=text_field,
                id_field=id_field,
                ngram=int(p.get("ngram", 50)),
                stride=int(p.get("stride", 1)),
            )
        }
    if mode == "lines":
        return {
            "": line_dedup(
                df,
                text_field=text_field,
                id_field=id_field,
                separator=str(p.get("separator", "\n")),
                min_freq=min_freq,
                min_line_len=int(p.get("minLineLength", 1)),
                clean=bool(p.get("clean", False)),
            )
        }
    raise ValueError(f"repetition: unknown mode '{mode}'")
