"""Pin the r16 SQL-text z-value construction against the Column-API
fallback it replaced: same boundaries in, bit-identical z values out,
and the analyzed expression trees match modulo auto-generated lambda
variable names."""

import math
import re

import pytest
from pyspark.sql import functions as F

from pipeline_spark.functions.zorder import (
    _interleave_columns,
    _z_sources,
    zvalue_column,
)


def _column_api_z(df, tmps, per_col_uniq, bits):
    """The exact pre-r16 construction (kept in-module as the non-finite
    fallback), reproduced here from fixed boundary lists."""
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
    return _interleave_columns(rank_cols, bits, len(tmps))


def _norm_plan(plan: str) -> str:
    ids: dict = {}

    def sub(m):
        k = m.group(1)
        ids.setdefault(k, f"E{len(ids)}")
        return "#" + ids[k]

    plan = re.sub(r"#(\d+)", sub, plan)
    # lambda variable NAMES are auto-generated (x_1/y_2 by the Column
    # API, the literal parameter names by the SQL parser) and print
    # identically as namedlambdavariable() in formatted plans
    return re.sub(r"lambda [A-Za-z_][A-Za-z0-9_]*", "lambda V", plan)


def test_sql_z_matches_column_api_values_and_plan(spark):
    df0 = spark.range(2000).selectExpr(
        "id",
        "CAST(id % 97 AS DOUBLE) a",
        "CAST((id * 37) % 251 AS DOUBLE) b",
    )
    df1, z1, tmps = zvalue_column(spark, df0, ["a", "b"])
    # rebuild the Column-API z from the SAME df (same __zsrc_ columns)
    probs = [i / 256 for i in range(1, 256)]
    probs_sql = "array(" + ",".join(repr(p) + "D" for p in probs) + ")"
    qrow = df1.select(*[
        F.expr(f"percentile_approx(`{t}`, {probs_sql}, 100)") for t in tmps
    ]).first()
    per_col_uniq = []
    for k in range(len(tmps)):
        uniq = []
        for bv in qrow[k] or []:
            if uniq == [] or bv > uniq[-1]:
                uniq.append(bv)
        assert all(math.isfinite(x) for x in uniq)
        per_col_uniq.append(uniq)
    z2 = _column_api_z(df1, tmps, per_col_uniq, bits=8)

    r1 = [r[0] for r in df1.select(z1).collect()]
    r2 = [r[0] for r in df1.select(z2).collect()]
    assert r1 == r2

    p1 = _norm_plan(
        df1.withColumn("__z__", z1)._jdf.queryExecution().analyzed().toString()
    )
    p2 = _norm_plan(
        df1.withColumn("__z__", z2)._jdf.queryExecution().analyzed().toString()
    )
    assert p1 == p2


def test_constant_column_single_bucket(spark):
    df0 = spark.range(100).selectExpr("id", "CAST(7 AS DOUBLE) c")
    df1, z, tmps = zvalue_column(spark, df0, ["c"])
    vals = {r[0] for r in df1.select(z).collect()}
    # a constant column has <=1 distinct boundary: every row must land
    # in one z bucket
    assert len(vals) == 1


def test_nonfinite_boundary_falls_back(spark):
    df0 = spark.range(100).selectExpr(
        "id", "CAST(IF(id % 2 = 0, 'Infinity', '1.0') AS DOUBLE) c"
    )
    df1, z, tmps = zvalue_column(spark, df0, ["c"])
    vals = sorted({r[0] for r in df1.select(z).collect()})
    # inf rows rank above every finite boundary; finite rows below —
    # two distinct buckets, monotone in the source value
    assert len(vals) >= 2


def test_date_and_int_columns_roundtrip(spark):
    df0 = spark.range(500).selectExpr(
        "id",
        "DATE_ADD(DATE'2030-01-01', CAST(id % 90 AS INT)) d",
        "CAST(id % 11 AS INT) i",
    )
    df1, z, tmps = zvalue_column(spark, df0, ["d", "i"])
    got = df1.select("id", z.alias("z")).collect()
    assert len(got) == 500
    assert all(r.z >= 0 for r in got)
    # monotonicity within one column's bucket grid: the max-date rows
    # must not z-sort below the min-date rows when the other column ties
    by_d = {
        r.id: r.z
        for r in got
        if r.id % 11 == 0  # fix i's bucket
    }
    lo = min(by_d, key=lambda k: k % 90)
    hi = max(by_d, key=lambda k: k % 90)
    assert by_d[hi] >= by_d[lo]
