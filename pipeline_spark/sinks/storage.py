"""`storage` sink: write parquet/avro/csv/json with compression + sharding.

Reference: module/sink/StorageSink.java:30-439 — formats (93-115), codecs
SNAPPY/ZSTD/GZIP, ``numShards``, optional pre-write ``select`` (144-160),
dynamic destination templating over row fields (133-142).

Spark: ``df.write.{format}`` + compression option.  Dynamic destinations
map to ``partitionBy`` (hive-style layout — the scalable equivalent of
per-key file naming); ``numShards`` → repartition(n) before write.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from pipeline_spark.compilers.select_fns import apply_select
from pipeline_spark.registry import KIND_SINK, ModuleContext, module


@module("storage", kind=KIND_SINK)
def storage_sink(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = ctx.input
    if p.get("select"):
        df = apply_select(df, p["select"], ctx.config.get("timestampAttribute"))

    fmt = str(p.get("format", "parquet")).lower()
    path = p.get("output") or p.get("path")
    if not path:
        raise ValueError("storage sink requires output path")

    # dynamic destination template ${field} → partitionBy(field)
    partition_cols = re.findall(r"\$\{([A-Za-z0-9_]+)\}", path)
    if partition_cols:
        path = re.sub(r"/?\$\{[A-Za-z0-9_]+\}", "", path)

    num_shards = p.get("numShards")
    if num_shards:
        df = df.repartition(int(num_shards))

    if df.isStreaming:
        from pipeline_spark.streaming.triggers import (
            parse_trigger,
            stream_with_early_firing,
        )

        strategy = ctx.config.get("strategy") or {}
        if parse_trigger(strategy) is not None:
            # early-firing trigger (Strategy.java:232-343): update-mode
            # panes via foreachBatch, each batch appended to the path —
            # same format dispatch as the batch writer (jsonl is not a
            # registered source name; csv keeps its header option)
            def write_pane(bdf: DataFrame, _bid: int) -> None:
                w = bdf.write.mode("append")
                if partition_cols:
                    w = w.partitionBy(*partition_cols)
                if fmt in ("json", "jsonl"):
                    w.json(path)
                elif fmt == "csv":
                    w.option(
                        "header", str(bool(p.get("header", True))).lower()
                    ).csv(path)
                else:
                    w.format(fmt).save(path)

            if str(strategy.get("paneStateBackend", "driver")) == "executor":
                # the aggregation module already materialized pane rows
                # executor-side (streaming/panes.py) — no driver ledger;
                # each micro-batch of fired panes appends directly
                writer = (
                    df.writeStream.outputMode("update")
                    .option(
                        "checkpointLocation",
                        p.get(
                            "checkpointLocation",
                            path.rstrip("/") + "_checkpoint",
                        ),
                    )
                    .foreachBatch(write_pane)
                )
                if p.get("availableNow", True):
                    writer = writer.trigger(availableNow=True)
                else:
                    writer = writer.trigger(
                        processingTime=p.get("processingTime", "1 seconds")
                    )
                query = writer.start()
                if p.get("await", True):
                    query.awaitTermination()
                return {"": df}

            query = stream_with_early_firing(
                df,
                strategy,
                write_pane,
                checkpoint=p.get(
                    "checkpointLocation", path.rstrip("/") + "_checkpoint"
                ),
                available_now=bool(p.get("availableNow", True)),
            )
            if p.get("await", True):
                query.awaitTermination()
            return {"": df}

        # streaming file sink: append-mode with checkpointing; trigger
        # availableNow processes the backlog then stops (the batch-parity
        # path used by tests and micro-batch style jobs)
        writer = (
            df.writeStream.format(fmt)
            .option("path", path)
            .option(
                "checkpointLocation",
                p.get("checkpointLocation", path.rstrip("/") + "_checkpoint"),
            )
            .outputMode(p.get("outputMode", "append"))
        )
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        if p.get("availableNow", True):
            query = writer.trigger(availableNow=True).start()
        else:
            interval = p.get("processingTime", "10 seconds")
            query = writer.trigger(processingTime=interval).start()
        if p.get("await", True):
            query.awaitTermination()
        return {"": df}

    if p.get("bucketBy"):
        # bucketed table write (Spark-idiomatic, beyond the reference's
        # Beam surface): both sides of a recurring large join bucketed on
        # the join key read back WITHOUT an exchange — the shuffle is
        # paid once at write time, not per query (SCALE.md).  Bucketing
        # metadata lives in the session catalog, so this writes through
        # saveAsTable; `table` names it and `path` keeps it external.
        b = p["bucketBy"]
        fields = b.get("fields") or b.get("columns")
        n_buckets = int(b.get("numBuckets", 0) or b.get("buckets", 0))
        table = p.get("table")
        if not (fields and n_buckets and table):
            raise ValueError(
                "storage sink bucketBy needs numBuckets, fields, and a "
                "'table' name (bucket metadata lives in the catalog)"
            )
        writer = (
            df.write.mode(p.get("mode", "overwrite"))
            .format(fmt if fmt != "jsonl" else "json")
            .option("path", path)
            .bucketBy(n_buckets, *fields)
        )
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        bucket_codec = p.get("compression") or p.get("codec")
        if bucket_codec:
            writer = writer.option("compression", str(bucket_codec).lower())
        sort_by = b.get("sortBy")
        if sort_by:
            writer = writer.sortBy(*(sort_by if isinstance(sort_by, list) else [sort_by]))
        writer.saveAsTable(table)
        return {"": df}

    writer = df.write.mode(p.get("mode", "overwrite"))
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    codec = p.get("compression") or p.get("codec")

    if fmt == "parquet":
        if codec:
            writer = writer.option("compression", codec.lower())
        # parquet bloom filters (parquet-mr writer properties): at 100 TB
        # a point lookup on a high-cardinality key (doc_id, url hash)
        # skips row groups the min/max bounds can't — bounds on near-
        # uniform keys span everything, blooms answer "definitely not
        # here" per row group.  Costs ~1% file size on the named columns.
        for col in p.get("bloomFilterColumns") or []:
            writer = writer.option(
                f"parquet.bloom.filter.enabled#{col}", "true"
            )
        writer.parquet(path)
    elif fmt == "avro":
        try:
            writer.format("avro").save(path)
        except Exception as e:
            if "Failed to find data source: avro" not in str(e):
                raise
            # no spark-avro jar: each task writes its partition as one OCF
            # file via the stdlib encoder (shared-filesystem paths);
            # dynamic-destination columns keep their hive-style layout
            from pipeline_spark.sources.avro_native import write_avro_native

            write_avro_native(
                df, path, codec=codec, mode=p.get("mode", "overwrite"),
                partition_cols=partition_cols,
            )
    elif fmt == "csv":
        writer.option("header", str(bool(p.get("header", True))).lower()).csv(path)
    elif fmt in ("json", "jsonl"):
        writer.json(path)
    elif fmt == "orc":
        if codec:
            writer = writer.option("compression", codec.lower())
        writer.orc(path)
    else:
        raise ValueError(f"storage sink: unsupported format '{fmt}'")
    return {"": df}
