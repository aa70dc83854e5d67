"""Filter DSL compiler tests — reference semantics from
util/pipeline/Filter.java:478-541 (null/NaN edges) and FilterTest.java."""

import pytest
from pyspark.sql import Row

from pipeline_spark.compilers.filter_dsl import compile_filter


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            Row(s="a", i=1, d=1.0, b=True),
            Row(s="b", i=2, d=float("nan"), b=False),
            Row(s="c", i=3, d=None, b=True),
            Row(s=None, i=4, d=-1.5, b=False),
            Row(s="e", i=5, d=float("inf"), b=True),
        ]
    )


def keys(df, cond, col="i"):
    return sorted(r[col] for r in df.filter(compile_filter(cond, df)).collect())


def test_eq(df):
    assert keys(df, {"key": "s", "op": "=", "value": "a"}) == [1]


def test_ne(df):
    # null row value never matches != literal (reference: value null → false)
    assert keys(df, {"key": "s", "op": "!=", "value": "a"}) == [2, 3, 5]


def test_null_eq(df):
    assert keys(df, {"key": "s", "op": "=", "value": None}) == [4]


def test_null_ne(df):
    assert keys(df, {"key": "s", "op": "!=", "value": None}) == [1, 2, 3, 5]


def test_null_gt_is_false(df):
    assert keys(df, {"key": "s", "op": ">", "value": None}) == []


def test_nan_inf_compare_false(df):
    # NaN and Inf row values compare false under every op (c=-2 trick)
    assert keys(df, {"key": "d", "op": ">", "value": 0}) == [1]
    assert keys(df, {"key": "d", "op": "<=", "value": 100}) == [1, 4]


def test_in(df):
    assert keys(df, {"key": "s", "op": "in", "value": ["a", "c"]}) == [1, 3]


def test_not_in(df):
    # null row value → false for not in as well
    assert keys(df, {"key": "s", "op": "not in", "value": ["a"]}) == [2, 3, 5]


def test_match(df):
    assert keys(df, {"key": "s", "op": "match", "value": "[ab]"}) == [1, 2]


def test_and_or_tree(df):
    cond = {
        "or": [
            {"and": [{"key": "i", "op": ">", "value": 1}, {"key": "b", "op": "=", "value": True}]},
            {"key": "s", "op": "=", "value": "a"},
        ]
    }
    assert keys(df, cond) == [1, 3, 5]


def test_implicit_and_list(df):
    assert keys(df, [{"key": "i", "op": ">", "value": 1}, {"key": "i", "op": "<", "value": 4}]) == [2, 3]


def test_expression_leaf(df):
    assert keys(df, {"expression": "i * 2", "op": ">=", "value": 6}) == [3, 4, 5]


def test_json_string_condition(df):
    assert keys(df, '{"key": "i", "op": "<=", "value": 2}') == [1, 2]
