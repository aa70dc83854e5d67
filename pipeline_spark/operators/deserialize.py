"""`deserialize` transform: parse a bytes/string field into struct fields.

Reference: module/transform/DeserializeTransform.java:41-400 — formats
json / avro / protobuf (117-121), schema from config or registry.

Spark: ``F.from_json`` / ``from_avro`` / ``from_protobuf`` — all JVM-side.
Avro/protobuf need the schema string / descriptor file in config; json
schema comes from the config schema block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module
from pipeline_spark.sources.create import build_schema


@module("deserialize", kind=KIND_TRANSFORM)
def deserialize_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = ctx.input
    field = p.get("field") or p.get("payloadField", "payload")
    fmt = str(p.get("format", "json")).lower()
    flatten = bool(p.get("flatten", True))
    out_field = p.get("name", "deserialized")

    if fmt == "json":
        schema_cfg = ctx.config.get("schema") or p.get("schema")
        if not schema_cfg:
            raise ValueError("deserialize json requires schema")
        fields = schema_cfg.get("fields") if isinstance(schema_cfg, dict) else schema_cfg
        schema = build_schema(fields)
        parsed = F.from_json(F.col(field).cast("string"), schema)
    elif fmt == "avro":
        from pyspark.sql.avro.functions import from_avro

        avro_schema = p.get("avroSchema")
        if not avro_schema:
            raise ValueError("deserialize avro requires avroSchema (json string)")
        parsed = from_avro(F.col(field).cast("binary"), avro_schema)
    elif fmt in ("protobuf", "proto"):
        from pyspark.sql.protobuf.functions import from_protobuf

        parsed = from_protobuf(
            F.col(field).cast("binary"),
            p["messageName"],
            descFilePath=p.get("descriptorFile"),
        )
    else:
        raise ValueError(f"deserialize: unsupported format '{fmt}'")

    out = df.withColumn(out_field, parsed)
    outputs: dict[str, DataFrame] = {}
    if not ctx.config.get("failFast", True) and fmt == "json":
        # dead-letter: unparseable payloads (from_json → null for non-null
        # input) route to the failures output (reference: failFast default
        # true batch / false streaming, module/Module.java:135-141)
        bad = out.filter(F.col(out_field).isNull() & F.col(field).isNotNull())
        outputs["failures"] = bad.drop(out_field)
        out = out.filter(F.col(out_field).isNotNull() | F.col(field).isNull())
    if flatten:
        others = [c for c in df.columns if c != field]
        out = out.select(*others, f"{out_field}.*")
    outputs[""] = out
    return outputs
