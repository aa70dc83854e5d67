"""`chunk` transform: split documents into fixed-size training windows.

Training-data-pipeline extension (BASELINE.json north star): corpora are
chunked into bounded context windows (with optional overlap) before
tokenization/packing — for pretraining sequences and for RAG passage
stores alike.  Implemented as pure Column trees: split → filter-empties
→ sequence of window starts → transform to (chunk_id, chunk_text,
n_units) structs → explode.  One narrow map stage, no Python, no
shuffle; the same list semantics reproduce in the DuckDB oracle.

Config:
  field      text column (default "text")
  unit       "words" (whitespace tokens, default) or "chars"
  size       window size in units (default 256)
  overlap    units shared between consecutive windows (default 0;
             must be < size)
  minChunkUnits  drop trailing windows shorter than this (default 1)

Output: one row per chunk, original columns plus
  chunk_id (0-based), chunk_text, n_units.
Documents with no content produce no rows (explode of an empty array).

Scale posture: fan-out is rows×(n/step) but each output row is bounded
by ``size`` units — the canonical pre-pack step.  Downstream
``pack_sequences`` / ``sample`` shuffles see bounded-width rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


@module("chunk", kind=KIND_TRANSFORM)
def chunk_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    field = p.get("field", "text")
    unit = str(p.get("unit", "words")).lower()
    size = int(p.get("size", 256))
    overlap = int(p.get("overlap", 0))
    min_units = int(p.get("minChunkUnits", 1))
    if size <= 0:
        raise ValueError("chunk: size must be > 0")
    if not 0 <= overlap < size:
        raise ValueError("chunk: overlap must satisfy 0 <= overlap < size")
    step = size - overlap
    df = ctx.input
    if field not in df.columns:
        raise ValueError(f"chunk: input has no column '{field}'")

    if unit == "words":
        units = F.filter(
            F.split(F.coalesce(F.col(field), F.lit("")), r"\s+"),
            lambda w: w != "",
        )
        n = F.size(units)
        make_text = lambda s: F.concat_ws(" ", F.slice(units, s + 1, size))  # noqa: E731
    elif unit == "chars":
        text = F.coalesce(F.col(field), F.lit(""))
        n = F.length(text)
        make_text = lambda s: F.substring(  # noqa: E731
            text, (s + 1).cast("int"), size
        )
        units = None
    else:
        raise ValueError(f"chunk: unknown unit '{unit}' (words|chars)")

    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(step))).otherwise(
        F.array()
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_id"),
            make_text(s).alias("chunk_text"),
            F.least(n - s, F.lit(size)).cast("int").alias("n_units"),
        ),
    )
    chunks = F.filter(chunks, lambda c: c["n_units"] >= min_units)
    out = (
        df.withColumn("__chunk__", F.explode(chunks))
        .select("*", "__chunk__.chunk_id", "__chunk__.chunk_text",
                "__chunk__.n_units")
        .drop("__chunk__")
    )
    return {"": out}
