"""Cloud-connector sources: bigquery / spanner / firestore / datastore /
bigtable / pubsub / kafka / iceberg / drivefile.

Reference surface (SURVEY §2.6): module/source/{BigQuery,Spanner,Firestore,
Datastore,Bigtable,PubSub,Kafka,Iceberg,DriveFile}Source.java.  Spark-first
mapping (native connectors, not Beam IO translations):

  bigquery   spark.read.format("bigquery") — query or table
  iceberg    spark.read.format("iceberg") / catalog table
  kafka      spark.readStream.format("kafka") + from_json/from_avro/
             from_protobuf payload decode (KafkaSource.java:120-125)
  pubsub     Pub/Sub Lite connector or Kafka bridge
  others     driver/foreachBatch SDK reads

Connectors resolve lazily with actionable errors when the jar/SDK is
absent (none bundled here); config surfaces match the reference so
pipelines validate end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SOURCE, ModuleContext, module


def _require_class(ctx: ModuleContext, fmt: str, cls: str) -> None:
    try:
        ctx.spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
    except Exception:
        raise RuntimeError(
            f"{fmt} source requires its Spark connector on the classpath "
            f"(missing {cls}); add it via spark.jars.packages"
        ) from None


@module("bigquery", kind=KIND_SOURCE)
def bigquery_source(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    _require_class(
        ctx, "bigquery", "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
    )
    reader = ctx.spark.read.format("bigquery")
    if p.get("query"):
        reader = reader.option("query", p["query"]).option("viewsEnabled", "true")
    elif p.get("table"):
        reader = reader.option("table", p["table"])
    else:
        raise ValueError("bigquery source requires query or table")
    return {"": reader.load()}


@module("iceberg", kind=KIND_SOURCE)
def iceberg_source(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    _require_class(ctx, "iceberg", "org.apache.iceberg.spark.SparkCatalog")
    return {"": ctx.spark.read.format("iceberg").load(p["table"])}


@module("kafka", kind=KIND_SOURCE)
def kafka_source(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    _require_class(
        ctx, "kafka", "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    )
    reader = (
        ctx.spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", p["bootstrapServers"])
        .option("subscribe", p.get("topic") or p.get("topics"))
        .option("startingOffsets", p.get("startingOffsets", "latest"))
    )
    df = reader.load()
    fmt = str(p.get("format", "json")).lower()
    if fmt in ("json", "avro", "protobuf"):
        # payload decode mirrors Serialize.Format
        # (reference: util/pipeline/Serialize.java:32-38)
        from pipeline_spark.operators.deserialize import deserialize_transform
        from pipeline_spark.registry import ModuleContext as MC

        sub = MC(
            spark=ctx.spark,
            name=ctx.name,
            params={"field": "value", "format": fmt, **p.get("deserialize", {})},
            inputs=[df],
            input_names=["kafka"],
            config=ctx.config,
        )
        return deserialize_transform(sub)
    return {"": df}


def _sdk_source(name: str, sdk_module: str):
    @module(name, kind=KIND_SOURCE)
    def source(ctx: ModuleContext) -> dict[str, DataFrame]:
        try:
            __import__(sdk_module)
        except ImportError:
            raise RuntimeError(
                f"{name} source requires the '{sdk_module}' SDK (not installed "
                f"in this environment); config surface matches the reference"
            ) from None
        raise NotImplementedError(f"{name} SDK read: SDK present but wiring TBD")

    source.__name__ = f"{name}_source"
    return source


spanner_source = _sdk_source("spanner", "google.cloud.spanner")
firestore_source = _sdk_source("firestore", "google.cloud.firestore")
datastore_source = _sdk_source("datastore", "google.cloud.datastore")
bigtable_source = _sdk_source("bigtable", "google.cloud.bigtable")
pubsub_source = _sdk_source("pubsub", "google.cloud.pubsub_v1")
drivefile_source = _sdk_source("drivefile", "googleapiclient")
