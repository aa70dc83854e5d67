"""Morton (Z-order) clustering value for OPTIMIZE ZORDER rewrites.

Shared by the Delta and Iceberg compaction paths: quantile-rank each
column once (a distributed approxQuantile scan of the z columns; only
the boundary array — a few hundred doubles — reaches the driver), fold
the per-row rank JVM-side over the broadcast boundary array, and
interleave rank bits into one long.  Quantile buckets keep the curve
balanced under skew, which is what makes min/max file bounds tight on
EVERY z-ordered column after the rewrite.
"""

from __future__ import annotations

import math


def _z_sources(df, cols):
    """Attach the cast-to-double __zsrc_i__ columns; returns (df, tmps)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    tmps = []
    for i, c in enumerate(cols):
        dt = df.schema[c].dataType
        if isinstance(dt, (T.DateType,)):
            src = F.col(c).cast("timestamp").cast("double")
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            src = F.col(c).cast("double")
        elif isinstance(dt, T.NumericType):
            src = F.col(c).cast("double")
        else:
            raise ValueError(
                f"delta compact: zOrderBy column '{c}' has type "
                f"{dt.simpleString()} — z-ordering needs a numeric, date "
                "or timestamp column"
            )
        tmp = f"__zsrc_{i}__"
        df = df.withColumn(tmp, src)
        tmps.append(tmp)
    return df, tmps


def _interleave_columns(rank_cols, bits, n):
    """Column-API interleave — the pre-r16 construction, kept as the
    exact-semantics fallback for non-finite quantile boundaries (a z
    column containing ±inf), which the SQL-text literal path cannot
    spell as a plain double literal."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, rank in enumerate(rank_cols):
            bit = F.shiftright(rank, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * n + (n - 1 - i))
    return z


def zvalue_column(spark, df, cols, bits: int = 8):
    """Morton (Z-order) value over ``cols`` as one JVM Column.

    Each column quantile-bucketizes into 2^bits ranks (boundaries from
    ONE approxQuantile per column — a distributed columnar scan whose
    driver-side *collect* is just the boundary array; the per-row rank
    is an ``aggregate`` fold over the broadcast boundary array,
    whole-stage-codegen'd), then the ranks' bits interleave.
    Quantile (not uniform) buckets keep the curve balanced under skew —
    the property that makes min/max bounds tight on EVERY z-ordered
    column, not just the first sort key.

    The interleaved value must stay clear of a signed long's sign bit
    (bit 63 would invert the sort order), so the per-column width
    adapts: bits*len(cols) <= 62.

    r16: the z expression is assembled as ONE SQL text parsed by a
    single F.expr call.  The Column-API construction it replaces made a
    py4j round-trip per boundary literal and per interleave step —
    >4,000 driver->JVM round-trips for two 8-bit columns, the dominant
    driver-side cost of every OPTIMIZE ZORDER at ~1 ms socket RTT.  The
    SQL parses to the IDENTICAL analyzed tree (verified modulo
    auto-generated lambda-variable names, which print identically as
    namedlambdavariable() in formatted plans); the Column path remains
    only as the exact fallback for non-finite quantile boundaries."""
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("zvalue_column: at least one column required")
    if len(cols) > 31:
        # 62 // 32 == 1, and the max(2, ...) floor would push the
        # interleaved value to bit 63 (the sign bit), inverting sort
        # order for high ranks.  More than ~4 z columns already dilutes
        # clustering benefit; 32+ is certainly a config error.
        raise ValueError(
            f"zvalue_column: {len(cols)} z-order columns exceed the "
            "31-column limit (bits*cols must stay below a signed long's "
            "sign bit); pick the few most-filtered columns instead"
        )
    bits = max(2, min(bits, 62 // len(cols)))
    buckets = 1 << bits
    probs = [i / buckets for i in range(1, buckets)]
    n = len(cols)
    df, tmps = _z_sources(df, cols)
    # r16: ONE percentile_approx scan for ALL z columns replaces one
    # df.stat.approxQuantile job per column.  Besides the n-1 saved
    # full scans, the stat API moved the 255-element probability list
    # AND the boundary array element-by-element over py4j (~1,300
    # round-trips for two columns); the SQL text carries the probes in
    # one string and .first() streams the arrays back in one batch.
    # Same accuracy (relativeError 0.01 == accuracy 100), same
    # null-skipping; boundaries are approximate under either API and
    # only steer file split points, never row values.
    from pyspark.sql import functions as F  # noqa: F811 — local import

    probs_sql = "array(" + ",".join(repr(p) + "D" for p in probs) + ")"
    qrow = df.select(*[
        F.expr(f"percentile_approx(`{tmp}`, {probs_sql}, 100)")
        for tmp in tmps
    ]).first()
    per_col_uniq: list[list[float]] = []
    for k in range(len(tmps)):
        bnds = [b for b in (qrow[k] or []) if b is not None]
        # dedupe while preserving order: constant columns give one bucket
        uniq: list[float] = []
        for b in bnds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        per_col_uniq.append(uniq)

    if any(not math.isfinite(b) for uniq in per_col_uniq for b in uniq):
        # ±inf/NaN boundary: keep the exact pre-r16 Column semantics
        def _mk_merge(t):
            return lambda acc, b: acc + F.when(
                F.col(t) >= b, F.lit(1)
            ).otherwise(F.lit(0))

        rank_cols = []
        for tmp, uniq in zip(tmps, per_col_uniq):
            arr = F.array(*[F.lit(float(b)) for b in uniq]) if uniq else None
            if arr is None:
                rank = F.lit(0)
            else:
                rank = F.aggregate(arr, F.lit(0), _mk_merge(tmp))
            rank_cols.append(F.coalesce(rank, F.lit(0)).cast("long"))
        return df, _interleave_columns(rank_cols, bits, n), tmps

    rank_sqls = []
    for tmp, uniq in zip(tmps, per_col_uniq):
        if not uniq:
            rank_sqls.append("CAST(coalesce(0, 0) AS BIGINT)")
        else:
            # repr() round-trips doubles exactly; the D suffix keeps the
            # literal DoubleType (a bare 0.5 would parse as DECIMAL)
            arr = "array(" + ",".join(
                repr(float(b)) + "D" for b in uniq
            ) + ")"
            rank_sqls.append(
                f"CAST(coalesce(aggregate({arr}, 0, (acc, b) -> acc + "
                f"CASE WHEN (`{tmp}` >= b) THEN 1 ELSE 0 END), 0) "
                "AS BIGINT)"
            )
    zsql = "CAST(0 AS BIGINT)"
    for j in range(bits):
        for i, rk in enumerate(rank_sqls):
            zsql = (
                f"({zsql} + shiftleft((shiftright({rk}, {j}) & 1), "
                f"{j * n + (n - 1 - i)}))"
            )
    return df, F.expr(zsql), tmps
