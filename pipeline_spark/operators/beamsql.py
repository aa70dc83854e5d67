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


def _run_sql(ctx: ModuleContext) -> dict[str, DataFrame]:
    sql = rewrite_mdt_udafs(_resolve_sql(ctx))
    register_mdt_functions(ctx.spark)
    for df, name in zip(ctx.inputs, ctx.input_names):
        # inputs may be addressed as `module` or `module.output`
        view = name.replace(".", "_")
        df.createOrReplaceTempView(view)
        if "." in name and name.split(".", 1)[0] not in ctx.input_names:
            df.createOrReplaceTempView(name.split(".", 1)[-1])
    return {"": ctx.spark.sql(sql)}


@module("beamsql", kind=KIND_TRANSFORM)
def beamsql_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    return _run_sql(ctx)


@module("sql", kind=KIND_TRANSFORM)
def sql_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    return _run_sql(ctx)
