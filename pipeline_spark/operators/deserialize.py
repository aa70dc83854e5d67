"""`deserialize` transform: parse a bytes/string field into struct fields.

Reference: module/transform/DeserializeTransform.java:41-400 — formats
json / avro / protobuf (117-121), schema from config or registry.

Spark: ``F.from_json`` / ``from_avro`` / ``from_protobuf`` — all JVM-side.
Avro/protobuf need the schema string / descriptor file in config; json
schema comes from the config schema block.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.functions.jvmclass import jvm_class_present
from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module
from pipeline_spark.sources.create import build_schema

#: extra struct field the stdlib avro/proto fallback decoders emit: null on
#: success, the decode error message on failure.  An explicit signal — a
#: legitimately all-null record (every [null,T] union branch absent) must
#: NOT route to the dead letter.
ERR_FIELD = "__deserialize_error__"


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
        if schema_cfg:
            fields = schema_cfg.get("fields") if isinstance(schema_cfg, dict) else schema_cfg
            schema = build_schema(fields)
        else:
            # no declared schema: infer from a sample of payloads
            # (driver-side, bounded) — explicit schema is still the
            # recommended path for production stability
            sample = [
                r[0]
                for r in df.select(F.col(field).cast("string"))
                .filter(F.col(field).isNotNull())
                .limit(int(p.get("inferSampleSize", 100)))
                .collect()
            ]
            if not sample:
                raise ValueError("deserialize json: no schema given and no rows to infer from")
            inferred = ctx.spark.read.json(ctx.spark.sparkContext.parallelize(sample)).schema
            corrupt = ctx.spark.conf.get(
                "spark.sql.columnNameOfCorruptRecord", "_corrupt_record"
            )
            from pyspark.sql import types as T

            schema = T.StructType([f for f in inferred.fields if f.name != corrupt])
        parsed = F.from_json(F.col(field).cast("string"), schema)
    elif fmt == "avro":
        avro_schema = p.get("avroSchema")
        if not avro_schema:
            raise ValueError("deserialize avro requires avroSchema (json string)")
        import json as _json

        if isinstance(avro_schema, dict):
            avro_schema = _json.dumps(avro_schema)
        # prefer the JVM-side spark-avro expression when the jar is on the
        # classpath; otherwise the stdlib binary decoder
        # (functions/avrodec.py) runs in a vectorized pandas UDF — the
        # common Kafka-payload path needs no extra jar
        try:
            if not jvm_class_present(
                ctx.spark, "org.apache.spark.sql.avro.AvroDataToCatalyst"
            ):
                raise RuntimeError("spark-avro jar absent")
            from pyspark.sql.avro.functions import from_avro

            parsed = from_avro(F.col(field).cast("binary"), avro_schema)
        except Exception:
            from pipeline_spark.functions.avrodec import (
                avro_to_spark_type,
                decode_record,
                parse_schema,
            )

            schema_obj, reg = parse_schema(avro_schema)
            spark_type = avro_to_spark_type(avro_schema)

            names = [f.name for f in spark_type.fields]
            udf_type, out_names = _with_error_field(spark_type, names)

            fail_fast = bool(ctx.config.get("failFast", True))

            @F.pandas_udf(udf_type)
            def avro_decode(payloads: pd.Series) -> pd.DataFrame:
                recs = []
                for b in payloads:
                    if b is None:
                        recs.append(dict.fromkeys(out_names))
                        continue
                    try:
                        recs.append({**decode_record(bytes(b), schema_obj, reg), ERR_FIELD: None})
                    except Exception as e:
                        if fail_fast:
                            raise
                        rec = dict.fromkeys(out_names)
                        rec[ERR_FIELD] = f"{type(e).__name__}: {e}"
                        recs.append(rec)
                return pd.DataFrame(recs, columns=out_names)

            parsed = avro_decode(F.col(field).cast("binary"))
    elif fmt in ("protobuf", "proto"):
        if not p.get("descriptorFile"):
            raise ValueError(
                "deserialize protobuf requires descriptorFile "
                "(a compiled FileDescriptorSet, e.g. protoc --descriptor_set_out)"
            )
        # prefer the JVM-side spark-protobuf expression when the jar is on
        # the classpath; otherwise the stdlib wire-format decoder
        # (functions/protodec.py) runs in a vectorized pandas UDF — the
        # common "Kafka protobuf payload + descriptor file" path needs no
        # extra jar, mirroring the avro fallback above
        try:
            if not jvm_class_present(
                ctx.spark, "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
            ):
                raise RuntimeError("spark-protobuf jar absent")
            from pyspark.sql.protobuf.functions import from_protobuf

            parsed = from_protobuf(
                F.col(field).cast("binary"),
                p["messageName"],
                descFilePath=p["descriptorFile"],
            )
        except Exception:
            from pipeline_spark.functions.protodec import (
                DescriptorPool,
                decode_message,
                message_to_spark_type,
            )

            with open(p["descriptorFile"], "rb") as fh:
                pool = DescriptorPool(fh.read())
            desc = pool.message(p["messageName"])
            spark_type = message_to_spark_type(desc, pool)
            names = [f.name for f in spark_type.fields]
            udf_type, out_names = _with_error_field(spark_type, names)

            fail_fast = bool(ctx.config.get("failFast", True))

            @F.pandas_udf(udf_type)
            def proto_decode(payloads: pd.Series) -> pd.DataFrame:
                recs = []
                for b in payloads:
                    if b is None:
                        recs.append(dict.fromkeys(out_names))
                        continue
                    try:
                        recs.append({**decode_message(bytes(b), desc, pool), ERR_FIELD: None})
                    except Exception as e:
                        if fail_fast:
                            raise
                        rec = dict.fromkeys(out_names)
                        rec[ERR_FIELD] = f"{type(e).__name__}: {e}"
                        recs.append(rec)
                return pd.DataFrame(recs, columns=out_names)

            parsed = proto_decode(F.col(field).cast("binary"))
    else:
        raise ValueError(f"deserialize: unsupported format '{fmt}'")

    out = df.withColumn(out_field, parsed)
    parsed_col = F.col(out_field)
    struct_fields = out.schema[out_field].dataType.fieldNames()
    has_err = ERR_FIELD in struct_fields
    outputs: dict[str, DataFrame] = {}
    if not ctx.config.get("failFast", True) and fmt in ("json", "avro", "protobuf", "proto"):
        # dead-letter: unparseable payloads route to the failures output
        # (reference: failFast default true batch / false streaming,
        # module/Module.java:135-141).
        if has_err:
            # the fallback decoders emit an explicit error field — a
            # legitimately all-null record stays on the main output
            failed = parsed_col[ERR_FIELD].isNotNull()
            outputs["failures"] = (
                out.filter(failed)
                .withColumn("error", parsed_col[ERR_FIELD])
                .drop(out_field)
            )
        else:
            # PERMISSIVE from_json yields an ALL-NULL struct for malformed
            # input, so failure = null struct OR every top-level field
            # null, with non-null input
            all_null = F.lit(True)
            for fld in struct_fields:
                all_null = all_null & parsed_col[fld].isNull()
            failed = (parsed_col.isNull() | all_null) & F.col(field).isNotNull()
            outputs["failures"] = out.filter(failed).drop(out_field)
        out = out.filter(~F.coalesce(failed, F.lit(False)))
    if has_err:
        # the error signal is internal: strip it from the main output
        keep = [f for f in struct_fields if f != ERR_FIELD]
        out = out.withColumn(out_field, F.struct(*[parsed_col[f].alias(f) for f in keep]))
    if flatten:
        others = [c for c in df.columns if c != field]
        out = out.select(*others, f"{out_field}.*")
    outputs[""] = out
    return outputs


def _with_error_field(spark_type, names):
    """Append ERR_FIELD to a decoder's struct type (skipped on the
    vanishingly unlikely name collision — routing then falls back to the
    all-null heuristic)."""
    from pyspark.sql import types as T

    if ERR_FIELD in names:
        return spark_type, list(names)
    udf_type = T.StructType([*spark_type.fields, T.StructField(ERR_FIELD, T.StringType())])
    return udf_type, [*names, ERR_FIELD]
