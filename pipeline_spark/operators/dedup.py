"""`dedup` transform: exact + near-duplicate removal at corpus scale.

Beyond the reference's surface (a training-data pipeline requirement,
BASELINE.json north star).  Methods, all shuffle-planned for 100 TB:

  exact          hash-groupBy on content column(s); keeps the row with the
                 smallest ``idField``.  One shuffle on a 64-bit hash — never
                 groups by the raw (potentially megabyte) text.
  minhash_lsh    shingle → k minhashes (xxhash64 seeded per permutation) →
                 b bands → candidate pairs bucket-join → Jaccard-estimate
                 filter.  The band bucket join is the scale path: candidate
                 generation is linear in corpus size, never all-pairs.
  simhash        64-bit signature from per-token xxhash64 bit-majority;
                 near-dups = equal signature (or banded signature for
                 hamming tolerance).
  ngram_jaccard  exact n-gram Jaccard via explode + pair-count — exact but
                 quadratic in bucket size; kept as the correctness oracle
                 for the LSH variants.
  embedding      cosine near-dup over an embedding column (delegated to
                 functions/vector.py expressions).

All signatures/hashes are computed with Spark builtins (xxhash64, md5) —
JVM-side, deterministic across runs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline_spark.functions.vector import cosine
from pipeline_spark.operators.tokenize import word_shingles
from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def normalize_text(col: Column) -> Column:
    """Canonical text view for dedup: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def exact_dedup(df: DataFrame, fields: list[str], id_field: str) -> DataFrame:
    """Keep one row per distinct content (smallest id wins).

    Shuffles on xxhash64(content) — constant-width key regardless of
    document size; the winner per group is min_by, a single-pass partial
    aggregate (no window/sort needed).
    """
    content_hash = F.xxhash64(*[F.col(f) for f in fields])
    agg = (
        df.groupBy(content_hash.alias("__h__"))
        .agg(F.min(F.col(id_field)).alias("__keep__"))
    )
    return (
        df.join(
            agg,
            (content_hash == agg["__h__"]) & (F.col(id_field) == agg["__keep__"]),
            "inner",
        )
        .drop("__h__", "__keep__")
    )


def minhash_signature(shingles: Column, k: int) -> Column:
    """k minhash values: min over shingles of xxhash64(shingle, seed=i)."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(k)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_field: str,
    id_field: str,
    *,
    shingle_size: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs with estimated Jaccard ≥ threshold.

    Plan shape (scales linearly in corpus size):
      1. per-doc signature (map-only)
      2. explode to `bands` rows per doc, groupless self-join on
         (band_id, band_hash) — the ONLY shuffle, on a small int key pair
      3. estimated Jaccard = fraction of matching minhashes; filter.
    """
    rows = num_hashes // bands
    sig = minhash_signature(word_shingles(tokens(F.col(text_field)), shingle_size), num_hashes)
    with_sig = df.select(F.col(id_field).alias("doc"), sig.alias("sig"))

    banded = with_sig.select(
        "doc",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows)).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "sig", "bk.band", "bk.bhash")

    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    return cand.select("doc_a", "doc_b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


def simhash_signature(toks: Column, bits: int = 64) -> Column:
    """SimHash: per-token xxhash64, bit-majority vote → 64-bit fingerprint.

    Pure Column expr: for each bit position, count tokens with that bit set
    vs total; bit set in output if majority.  shiftright+bitwise ops are
    codegen'd.
    """
    h = F.transform(toks, lambda t: F.xxhash64(t))
    total = F.size(h)
    out = F.lit(0).cast("long")
    for b in range(bits):
        ones = F.size(F.filter(h, lambda x, b=b: F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1))
        bit = F.when(ones * 2 > total, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(F.shiftleft(bit, b))
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_field: str,
    id_field: str,
    *,
    ngram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word n-gram Jaccard similarity for pairs sharing ≥1 n-gram.

    explode(distinct ngrams) → self-join on the ngram hash → pair overlap
    counts → |A∩B| / (|A|+|B|-|A∩B|).  Exact (the oracle for LSH) but the
    join fans out quadratically inside hot n-grams — at 100 TB use
    minhash_lsh and keep this for validation samples.
    """
    grams = F.array_distinct(word_shingles(tokens(F.col(text_field)), ngram))
    base = df.select(F.col(id_field).alias("doc"), grams.alias("grams")).filter(
        F.size("grams") > 0
    )
    sizes = base.select("doc", F.size("grams").alias("n"))
    exploded = base.select("doc", F.explode("grams").alias("g"))

    a = exploded.alias("a")
    b = exploded.alias("b")
    overlap = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        overlap.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("overlap").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("overlap")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def embedding_neardup_pairs(
    df: DataFrame,
    vec_field: str,
    id_field: str,
    *,
    threshold: float = 0.95,
    bands: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs above threshold.

    Scale path: LSH-bucket by sign-random-projection first (see
    similarity.py); this entry point is the exact all-pairs variant used at
    validation scale.
    """
    a = df.select(F.col(id_field).alias("doc_a"), F.col(vec_field).alias("va"))
    b = df.select(F.col(id_field).alias("doc_b"), F.col(vec_field).alias("vb"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    sim = cosine(F.col("va"), F.col("vb"))
    return pairs.select("doc_a", "doc_b", sim.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


@module("dedup", kind=KIND_TRANSFORM)
def dedup_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    df = ctx.input
    method = str(p.get("method", "exact")).lower()
    id_field = p.get("idField", "doc_id")
    text_field = p.get("field") or p.get("textField", "text")

    if method == "exact":
        fields = p.get("fields") or [text_field]
        return {"": exact_dedup(df, fields, id_field)}
    if method in ("minhash", "minhash_lsh"):
        pairs = minhash_lsh_pairs(
            df,
            text_field,
            id_field,
            shingle_size=int(p.get("shingleSize", 3)),
            num_hashes=int(p.get("numHashes", 64)),
            bands=int(p.get("bands", 16)),
            threshold=float(p.get("threshold", 0.5)),
        )
        if p.get("outputPairs", False):
            return {"": pairs}
        # drop the larger id of each near-dup pair
        dupes = pairs.select(F.col("doc_b").alias(id_field)).distinct()
        return {"": df.join(dupes, id_field, "left_anti")}
    if method == "simhash":
        toks = tokens(F.col(text_field))
        sig = simhash_signature(toks)
        with_sig = df.withColumn("simhash", sig)
        if p.get("outputSignatures", False):
            return {"": with_sig}
        return {"": exact_dedup(with_sig, ["simhash"], id_field).drop("simhash")}
    if method in ("ngram_jaccard", "jaccard"):
        return {
            "": ngram_jaccard_pairs(
                df,
                text_field,
                id_field,
                ngram=int(p.get("ngram", 3)),
                threshold=float(p.get("threshold", 0.5)),
            )
        }
    if method in ("embedding", "cosine"):
        return {
            "": embedding_neardup_pairs(
                df,
                p.get("vectorField", "embedding"),
                id_field,
                threshold=float(p.get("threshold", 0.95)),
            )
        }
    raise ValueError(f"dedup: unknown method '{method}'")
