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
    adapts: bits*len(cols) <= 62."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

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
    rank_cols = []
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
        bnds = df.stat.approxQuantile(tmp, probs, 0.01)
        # dedupe while preserving order: constant columns give one bucket
        uniq: list[float] = []
        for b in bnds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        arr = F.array(*[F.lit(float(b)) for b in uniq]) if uniq else None
        if arr is None:
            rank = F.lit(0)
        else:
            rank = F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col(tmp) >= b, F.lit(1)).otherwise(F.lit(0)),
            )
        rank_cols.append(F.coalesce(rank, F.lit(0)).cast("long"))
    n = len(cols)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, rank in enumerate(rank_cols):
            bit = F.shiftright(rank, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * n + (n - 1 - i))
    return df, z, [f"__zsrc_{i}__" for i in range(len(cols))]
