"""Pin the r16 SQL-text data_filter_condition against the Column
construction it batches: identical analyzed trees for every supported
op, and the fallback engages for unspellable inputs."""

import re

from pyspark.sql import functions as F

from pipeline_spark.sources.delta_native import (
    _data_filter_sql,
    data_filter_condition,
)


def _column_path(dfilter):
    conds = []
    for f in dfilter:
        key, op = f.get("key"), str(f.get("op", "=")).lower()
        want = f.get("value")
        c = F.col(key)
        if op in ("=", "=="):
            cond = c == F.lit(want)
        elif op == "!=":
            cond = c != F.lit(want)
        elif op == "<":
            cond = c < F.lit(want)
        elif op == "<=":
            cond = c <= F.lit(want)
        elif op == ">":
            cond = c > F.lit(want)
        elif op == ">=":
            cond = c >= F.lit(want)
        elif op == "in":
            cond = c.isin(
                list(want if isinstance(want, (list, tuple)) else [want])
            )
        elif op in ("isnull", "is_null"):
            cond = c.isNull()
        elif op in ("isnotnull", "is_not_null"):
            cond = c.isNotNull()
        conds.append(cond)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _norm(plan):
    ids = {}

    def sub(m):
        ids.setdefault(m.group(1), f"E{len(ids)}")
        return "#" + ids[m.group(1)]

    return re.sub(r"#(\d+)", sub, plan)


def test_sql_text_matches_column_tree(spark):
    df = spark.range(100).selectExpr(
        "id", "CAST(id AS DOUBLE) x", "CAST(id AS STRING) s",
        "id % 2 = 0 AS b",
    )
    cases = [
        [{"key": "id", "op": "<", "value": 50}],
        [{"key": "id", "op": ">=", "value": 10},
         {"key": "x", "op": "<=", "value": 42.5},
         {"key": "s", "op": "!=", "value": "it's"}],
        [{"key": "s", "op": "in", "value": ["a", "b'c"]},
         {"key": "id", "op": "=", "value": 3}],
        [{"key": "x", "op": "isnull"},
         {"key": "b", "op": "=", "value": True}],
        [{"key": "s", "op": "is_not_null"}],
    ]
    for dfilter in cases:
        a = df.where(data_filter_condition(dfilter))
        b = df.where(_column_path(dfilter))
        pa = _norm(a._jdf.queryExecution().analyzed().toString())
        pb = _norm(b._jdf.queryExecution().analyzed().toString())
        assert pa == pb, dfilter
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )


def test_fallback_engages():
    # unknown op and exotic key must leave the SQL path (Column path
    # raises its own actionable error for the former)
    assert _data_filter_sql([{"key": "k", "op": "between"}]) is None
    assert _data_filter_sql([{"key": "weird col", "op": "="}]) is None
    assert _data_filter_sql([{"key": "k", "op": "in", "value": []}]) is None
    # dotted keys keep F.col's nested-access semantics on BOTH paths
    assert _data_filter_sql(
        [{"key": "a.b", "op": "=", "value": 1}]
    ) == "((a.b = 1))".replace("((", "(").replace("))", ")")
