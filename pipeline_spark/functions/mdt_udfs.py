"""MDT_* SQL compatibility functions.

The reference registers custom Calcite UDF/UDAFs for its `beamsql` module
(reference: BeamSQLTransform.java:168-186; util/sql/udf/MathFunctions.java,
ArrayFunctions.java, AggregateFunctions.java; doc
docs/config/module/transform/beamsqludf.md).  We register thin SQL-body
functions so reference configs run unmodified — each alias maps to a Spark
builtin, keeping everything JVM-side (no Python UDFs).

UDAF aliases (MDT_ARRAY_AGG_*, MDT_COUNT_DISTINCT_*) cannot be SQL-body
functions in Spark; the sql module rewrites those call sites textually to
collect_list/collect_set/count(distinct ...).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

_FLAG = "spark.pipeline_spark.mdt_registered"

_SQL_FUNCTIONS = [
    # null-skipping 2-arg greatest/least: Spark builtins already skip nulls
    "CREATE OR REPLACE TEMPORARY FUNCTION MDT_GREATEST_INT64(a BIGINT, b BIGINT) RETURNS BIGINT RETURN greatest(a, b)",
    "CREATE OR REPLACE TEMPORARY FUNCTION MDT_GREATEST_FLOAT64(a DOUBLE, b DOUBLE) RETURNS DOUBLE RETURN greatest(a, b)",
    "CREATE OR REPLACE TEMPORARY FUNCTION MDT_LEAST_INT64(a BIGINT, b BIGINT) RETURNS BIGINT RETURN least(a, b)",
    "CREATE OR REPLACE TEMPORARY FUNCTION MDT_LEAST_FLOAT64(a DOUBLE, b DOUBLE) RETURNS DOUBLE RETURN least(a, b)",
    "CREATE OR REPLACE TEMPORARY FUNCTION MDT_GENERATE_UUID() RETURNS STRING RETURN uuid()",
    "CREATE OR REPLACE TEMPORARY FUNCTION MDT_CONTAINS_ALL_INT64(a ARRAY<BIGINT>, b ARRAY<BIGINT>) RETURNS BOOLEAN RETURN forall(b, x -> array_contains(a, x))",
    "CREATE OR REPLACE TEMPORARY FUNCTION MDT_CONTAINS_ALL_STRING(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS BOOLEAN RETURN forall(b, x -> array_contains(a, x))",
    # timezone-aware now-functions (reference QueryTest.java:40 uses
    # CURRENT_DATE_('Asia/Tokyo') through the Calcite Query path)
    "CREATE OR REPLACE TEMPORARY FUNCTION CURRENT_DATE_(tz STRING) RETURNS DATE RETURN to_date(convert_timezone(tz, current_timestamp()))",
    "CREATE OR REPLACE TEMPORARY FUNCTION CURRENT_TIMESTAMP_(tz STRING) RETURNS TIMESTAMP RETURN convert_timezone(tz, current_timestamp())",
]

# UDAF aliases → textual rewrite (Calcite-style call → Spark builtin)
_UDAF_REWRITES = [
    (re.compile(r"\bMDT_ARRAY_AGG_DISTINCT_(?:STRING|FLOAT64|INT64)\s*\(", re.I), "collect_set("),
    (re.compile(r"\bMDT_ARRAY_AGG_(?:STRING|INT64)\s*\(", re.I), "collect_list("),
    (re.compile(r"\bMDT_COUNT_DISTINCT_(?:STRING|FLOAT64|INT64)\s*\(", re.I), "count(DISTINCT "),
]


def register_mdt_functions(spark: SparkSession) -> None:
    """Idempotently register MDT_* scalar aliases."""
    try:
        if spark.conf.get(_FLAG, "false") == "true":
            return
    except Exception:
        pass
    for stmt in _SQL_FUNCTIONS:
        spark.sql(stmt)
    spark.conf.set(_FLAG, "true")


def rewrite_mdt_udafs(sql: str) -> str:
    """Rewrite MDT_* aggregate call sites to Spark builtins."""
    for pat, repl in _UDAF_REWRITES:
        sql = pat.sub(repl, sql)
    return sql
