"""`sample` transform: deterministic sampling and dataset splitting.

Training-data-pipeline extension (BASELINE.json north star): every
large-scale corpus needs reproducible train/val/test splits and
subsampling that are stable across runs, engines, and partitionings —
which rules out ``df.sample`` (seed + partitioning dependent).

Everything here keys on ``md5(key)`` hex prefixes: a row's bucket is a
pure function of its key, so splits are deterministic, disjoint,
exhaustive, and reproducible ANYWHERE md5 exists (the DuckDB correctness
oracle recomputes them bit-for-bit).  Comparing the first 8 hex chars
lexicographically partitions the uniform hash space without any bigint
conversion — portable string compares that reach whole-stage codegen.

Methods:
  split       ``splits: {train: 0.9, val: 0.05, test: 0.05}`` → one
              output per split name (multi-output module)
  fraction    keep ``fraction`` of rows
  stratified  per-stratum fractions: ``fractions: {A: 0.5, B: 0.1}``
              on ``stratifyField`` (default fraction for absent keys)
  mix         multi-input dataset mixing by target proportions with
              temperature and bounded upsampling (see mix_datasets)

Scale: map-only (a hash + string compare per row), no shuffle, no state.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module

_HEX_SPACE = 16**8  # first 8 md5 hex chars


def _hex_boundary(fraction: float) -> str:
    """Hex string h such that P[md5_prefix < h] == fraction."""
    n = min(max(int(round(fraction * _HEX_SPACE)), 0), _HEX_SPACE)
    if n >= _HEX_SPACE:
        return "g"  # sorts after every hex char → matches all rows
    return format(n, "08x")


def _hash_prefix(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, 8)


def sample_fraction(df: DataFrame, key_field: str, fraction: float, salt: str = "") -> DataFrame:
    key = F.concat(F.lit(salt), F.col(key_field).cast("string"))
    return df.filter(_hash_prefix(key) < _hex_boundary(fraction))


def split_dataset(
    df: DataFrame, key_field: str, splits: dict[str, float], salt: str = ""
) -> dict[str, DataFrame]:
    """Disjoint, exhaustive named splits by cumulative hash boundaries."""
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"sample split fractions must sum to 1 (got {total})")
    key = F.concat(F.lit(salt), F.col(key_field).cast("string"))
    h = _hash_prefix(key)
    out: dict[str, DataFrame] = {}
    cum = 0.0
    lo = _hex_boundary(0.0)
    names = list(splits)
    for i, name in enumerate(names):
        cum += splits[name]
        # the last split takes everything remaining, so rounding in the
        # boundary arithmetic can never drop rows
        hi = _hex_boundary(1.0) if i == len(names) - 1 else _hex_boundary(cum)
        out[name] = df.filter((h >= lo) & (h < hi))
        lo = hi
    return out


def stratified_fraction(
    df: DataFrame,
    key_field: str,
    stratify_field: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    key = F.concat(F.lit(salt), F.col(key_field).cast("string"))
    h = _hash_prefix(key)
    bound: Column = F.lit(_hex_boundary(default))
    for stratum, frac in fractions.items():
        bound = F.when(
            F.col(stratify_field).cast("string") == str(stratum),
            F.lit(_hex_boundary(frac)),
        ).otherwise(bound)
    return df.filter(h < bound)


def shuffle_dataset(
    df: DataFrame,
    key_field: str,
    salt: str = "",
    partitions: int | None = None,
    key_column: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global shuffle for training order.

    Orders the corpus by ``md5(salt || key)`` — a reproducible permutation
    that any engine can recompute (the oracle re-derives the key); a new
    ``salt`` is a fresh epoch permutation with zero data movement logic
    changes.  Implemented as repartitionByRange + sortWithinPartitions on
    the hash: the range exchange samples the (uniform) md5 space, so
    partitions balance by construction and no global single-task sort or
    keyless window appears anywhere.  Writing the partitions in index
    order yields the corpus in shuffled order.
    """
    out = df.withColumn(
        key_column,
        F.md5(F.concat(F.lit(salt), F.col(key_field).cast("string"))),
    )
    if partitions:
        part = out.repartitionByRange(int(partitions), F.col(key_column))
    else:  # default parallelism-sized range exchange
        part = out.repartitionByRange(F.col(key_column))
    return part.sortWithinPartitions(key_column)


def _hex_boundary_floor(fraction: float) -> str:
    """Like _hex_boundary but floor-based: floor is identical across
    engines (Python / DuckDB / Spark), while round() tie-breaking is not
    — the mix oracle replays this boundary bit-for-bit in SQL."""
    n = min(max(int(math.floor(fraction * _HEX_SPACE)), 0), _HEX_SPACE)
    if n >= _HEX_SPACE:
        return "g"
    return format(n, "08x")


def mix_proportions(weights: dict[str, float], temperature: float = 1.0) -> dict[str, float]:
    """Temperature-adjusted normalized mixing proportions:
    p_i ∝ w_i^(1/T).  T > 1 flattens toward uniform (upweights small
    sources — the multilingual-sampling trick), T < 1 sharpens.
    Zero-weight sources drop out."""
    if temperature <= 0:
        raise ValueError(f"sample mix: temperature must be > 0, got {temperature}")
    q = {k: float(v) ** (1.0 / temperature) for k, v in weights.items() if float(v) > 0}
    z = sum(q.values())
    if z <= 0:
        raise ValueError("sample mix: all weights are zero")
    return {k: v / z for k, v in q.items()}


def mix_datasets(
    dfs: list[DataFrame],
    names: list[str],
    key_field: str,
    weights: dict[str, float],
    temperature: float = 1.0,
    max_epochs: int = 1,
    salt: str = "",
    source_field: str = "__source__",
    epoch_field: str = "__epoch__",
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Mix named datasets to target proportions (pretraining data mixing).

    Given source sizes n_i and proportions p_i (see mix_proportions), the
    mixed corpus size is the largest N every source can serve without
    exceeding ``maxEpochs`` passes: N = min_i(maxEpochs * n_i / p_i).
    Source i then contributes at rate r_i = p_i * N / n_i: floor(r_i)
    full passes plus an md5-sampled partial pass, each pass tagged with
    ``epoch_field`` (only when maxEpochs > 1) and salted independently so
    repeated rows are a deterministic, reproducible subset.

    Scale: sizes come from ``df.count()`` (cheap metadata counts for
    parquet scans; pass ``counts`` to skip the jobs entirely); selection
    is map-only md5 bucketing — no shuffle, no state, stable under
    repartitioning.  The union is a name-union with null padding, so
    heterogeneous source schemas behave like the union module.
    """
    if len(dfs) != len(names):
        raise ValueError("sample mix: inputs and names must align")
    if max_epochs < 1:
        raise ValueError(f"sample mix: maxEpochs must be >= 1, got {max_epochs}")
    missing = [n for n in names if n not in weights]
    if missing:
        raise ValueError(
            f"sample mix: no weight for input(s) {missing} — weights keys "
            f"must name every input (got {sorted(weights)})"
        )
    phantom = [k for k in weights if k not in names]
    if phantom:
        raise ValueError(
            f"sample mix: weights name unknown input(s) {phantom} — their "
            f"probability mass would silently shrink the mixture (inputs: "
            f"{names})"
        )
    p = mix_proportions(weights, temperature)
    sized: dict[str, int] = {}
    for name, df in zip(names, dfs):
        if name in p:
            sized[name] = int((counts or {}).get(name) or df.count())
    active = [n for n in sized if sized[n] > 0]
    if not active:
        raise ValueError("sample mix: every weighted input is empty")
    total = min(max_epochs * sized[n] / p[n] for n in active)
    parts: list[DataFrame] = []
    for name, df in zip(names, dfs):
        if name not in p or sized.get(name, 0) == 0:
            continue
        rate = p[name] * total / sized[name]
        for epoch in range(max_epochs + 1):
            frac = rate - epoch
            if frac <= 0:
                break
            if frac >= 1:
                sub = df
            else:
                key = F.concat(
                    F.lit(f"{salt}|{name}|{epoch}"),
                    F.col(key_field).cast("string"),
                )
                sub = df.filter(_hash_prefix(key) < _hex_boundary_floor(frac))
            sub = sub.withColumn(source_field, F.lit(name))
            if max_epochs > 1:
                sub = sub.withColumn(epoch_field, F.lit(epoch))
            parts.append(sub)
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x, allowMissingColumns=True)
    return out


@module("sample", kind=KIND_TRANSFORM)
def sample_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    df = ctx.input
    key_field = p.get("keyField") or p.get("idField", "id")
    salt = str(p.get("salt", ""))
    method = str(p.get("method", "split" if p.get("splits") else "fraction")).lower()

    if method == "split":
        splits = p.get("splits")
        if not splits:
            raise ValueError("sample split requires splits: {name: fraction}")
        return {
            name: part
            for name, part in split_dataset(df, key_field, splits, salt).items()
        }
    if method == "fraction":
        return {"": sample_fraction(df, key_field, float(p["fraction"]), salt)}
    if method == "stratified":
        return {
            "": stratified_fraction(
                df,
                key_field,
                p.get("stratifyField") or p["field"],
                {str(k): float(v) for k, v in (p.get("fractions") or {}).items()},
                default=float(p.get("defaultFraction", 0.0)),
                salt=salt,
            )
        }
    if method == "mix":
        weights = p.get("weights")
        if not weights:
            raise ValueError("sample mix requires weights: {inputName: weight}")
        return {
            "": mix_datasets(
                ctx.inputs,
                ctx.input_names,
                key_field,
                {str(k): float(v) for k, v in weights.items()},
                temperature=float(p.get("temperature", 1.0)),
                max_epochs=int(p.get("maxEpochs", 1)),
                salt=salt,
                source_field=p.get("sourceField", "__source__"),
                epoch_field=p.get("epochField", "__epoch__"),
                counts=p.get("counts"),
            )
        }
    if method == "shuffle":
        return {
            "": shuffle_dataset(
                df,
                key_field,
                salt=salt,
                partitions=p.get("partitions"),
                key_column=p.get("keyColumn", "shuffle_key"),
            )
        }
    raise ValueError(f"sample: unknown method '{method}'")
