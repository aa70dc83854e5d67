"""`sql` (reference name `beamsql`): full SQL over N named inputs.

Reference: module/transform/BeamSQLTransform.java:26-281 — registers each
input as a named relation, plans Calcite SQL with custom MDT_* UDF/UDAFs
(168-186), executes via Beam SQL.

Spark: each input becomes a temp view named after its module; the query
runs through ``spark.sql`` — Catalyst plans the full join zoo
(broadcast/SMJ/shuffled-hash picked by size + AQE at runtime), which is the
join strategy story for 100 TB: we do NOT hand-roll join operators.

MDT_* compatibility aliases are registered so reference configs run
unmodified (see functions/mdt_udfs.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from pipeline_spark.functions.mdt_udfs import register_mdt_functions, rewrite_mdt_udafs
from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def _resolve_sql(ctx: ModuleContext) -> str:
    """The reference resolves sql from inline text, base64, or a file
    (BeamSQLTransform.java:54-86); same surface here."""
    p = ctx.params
    if p.get("sql"):
        return str(p["sql"])
    if p.get("sqlBase64"):
        import base64

        return base64.b64decode(p["sqlBase64"]).decode()
    if p.get("sqlFile"):
        with open(p["sqlFile"]) as f:
            return f.read()
    raise ValueError("sql transform requires sql, sqlBase64, or sqlFile")


_UNNEST_RE = re.compile(
    r",\s*UNNEST\s*\(\s*([A-Za-z0-9_.]+)\s*\)\s+AS\s+(\w+)", re.I
)


def _rewrite_calcite_unnest(sql: str) -> str:
    """Calcite's ``FROM t, UNNEST(arr) AS x`` → Spark's LATERAL VIEW
    explode — same row-per-element semantics, struct elements keep their
    fields addressable as ``x.field`` (reference QueryTest.java:36-43)."""
    return _UNNEST_RE.sub(
        lambda m: f" LATERAL VIEW explode({m.group(1)}) {m.group(2)}_uv AS {m.group(2)}",
        sql,
    )


def _run_sql(ctx: ModuleContext) -> dict[str, DataFrame]:
    sql = _rewrite_calcite_unnest(rewrite_mdt_udafs(_resolve_sql(ctx)))
    register_mdt_functions(ctx.spark)
    for df, name in zip(ctx.inputs, ctx.input_names):
        # inputs may be addressed as `module` or `module.output`
        view = name.replace(".", "_")
        df.createOrReplaceTempView(view)
        if "." in name and name.split(".", 1)[0] not in ctx.input_names:
            df.createOrReplaceTempView(name.split(".", 1)[-1])
    sql = _rewrite_match_recognize(ctx, sql)
    return {"": ctx.spark.sql(sql)}


def _rewrite_match_recognize(ctx: ModuleContext, sql: str) -> str:
    """Spark SQL has no MATCH_RECOGNIZE (the reference runs it through
    Calcite — BeamSQLTransformTest.testMatchRecognize); execute the clause
    with operators/matchrec.py and splice the result back in as a view."""
    from pipeline_spark.operators.matchrec import (
        match_recognize,
        parse_clause,
        split_match_recognize,
    )

    found = split_match_recognize(sql)
    if found is None:
        return sql
    prefix, table, body, alias, suffix = found
    # the FROM target may be a CTE from this statement's WITH clause — let
    # spark.sql resolve it in that scope
    with_m = __import__("re").match(r"\s*WITH\s", prefix, 2)  # re.IGNORECASE
    if with_m:
        # prefix = "WITH cte AS (...) SELECT ... FROM" — everything before
        # the final SELECT is the CTE scope
        last_select = prefix.upper().rfind("SELECT")
        cte_scope = prefix[:last_select]
        input_df = ctx.spark.sql(f"{cte_scope} SELECT * FROM `{table}`")
        outer = prefix[last_select:]
    else:
        input_df = ctx.spark.table(table)
        outer = prefix
    kwargs = parse_clause(body)
    result = match_recognize(input_df, allow_global=True, **kwargs)
    view = f"__mr_{ctx.name}_{alias or 'm'}"
    result.createOrReplaceTempView(view)
    as_alias = f" AS {alias}" if alias else ""
    return f"{outer} FROM {view}{as_alias} {suffix}"


@module("beamsql", kind=KIND_TRANSFORM)
def beamsql_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    return _run_sql(ctx)


@module("sql", kind=KIND_TRANSFORM)
def sql_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    return _run_sql(ctx)
