"""Streaming Kafka WITHOUT the connector jar: a Spark 4 Python Data
Source over the native wire client (functions/kafkawire.py).

Reference: module/source/KafkaSource.java:28-330 reads through the
spark-sql-kafka connector; when that jar is absent this module registers
``kafka_native`` with Structured Streaming's Python DataSource API, so
the SAME micro-batch machinery (offset log, checkpoint recovery,
availableNow draining, exactly-once within the pipeline) drives the
stdlib-socket wire client:

  initialOffset/latestOffset   driver-side Metadata + ListOffsets (KB of
                               control traffic); offsets checkpoint in
                               Spark's own offset log
  partitions(start, end)       one InputPartition per Kafka partition
                               with its [start, end) range
  read(partition)              EXECUTOR-side: fetches that partition's
                               range from its leader over its own socket

Parallelism = Kafka partition count, rows never pass through the
driver — the same contract as the real connector.  Output schema
mirrors it too: key/value binary + topic/partition/offset/timestamp/
timestampType.  PLAINTEXT brokers only (SASL/TLS still need the jar).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


class KafkaNativeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka_native"

    def schema(self) -> str:
        return KAFKA_SCHEMA

    def streamReader(self, schema):
        return _KafkaStreamReader(self.options)


class _RangePartition(InputPartition):
    def __init__(
        self, servers: str, topic: str, part: int, start: int, end: int,
        security: dict | None = None,
    ):
        self.servers, self.topic, self.part = servers, topic, part
        self.start, self.end = start, end
        self.security = security


def _security_from_options(options) -> dict | None:
    """DataSource options (lowercased string keys) → the shared
    normalizer, so batch and streaming security semantics can't drift."""
    from pipeline_spark.functions.kafkawire import security_from_params

    params = {
        name: options[name.lower()]
        for name in ("securityProtocol", "saslMechanism", "saslUsername",
                     "saslPassword", "sslCaFile", "sslCertFile",
                     "sslKeyFile", "sslVerify")
        if options.get(name.lower()) is not None
    }
    return security_from_params(params)


class _KafkaStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        # DataSource options arrive with case-insensitive (lowercased) keys
        self.servers = options.get("bootstrapservers") or options.get(
            "kafka.bootstrap.servers"
        )
        self.topic = options.get("topic") or options.get("subscribe")
        if not self.servers or not self.topic:
            raise ValueError(
                "kafka_native needs bootstrapServers and topic options"
            )
        self.starting = str(options.get("startingoffsets", "earliest"))
        self.security = _security_from_options(options)

    def _offsets(self, which) -> dict:
        from pipeline_spark.functions.kafkawire import KafkaClient

        boot = KafkaClient.bootstrap(self.servers, security=self.security)
        try:
            parts = sorted(boot.metadata([self.topic])["topics"][self.topic])
            return {
                str(p): boot.list_offset(self.topic, p, which) for p in parts
            }
        finally:
            boot.close()

    def initialOffset(self) -> dict:
        import json as _json

        from pipeline_spark.functions.kafkawire import EARLIEST, LATEST

        cfg = self.starting
        if cfg.strip().startswith("{"):
            cfg = _json.loads(cfg)
        if isinstance(cfg, dict):
            # per-partition form {'topic': {'0': N}} (or flat {'0': N}) —
            # the same surface the batch path and the jar accept; missing
            # partitions start at earliest
            explicit = {
                str(k): int(v) for k, v in (cfg.get(self.topic) or cfg).items()
            }
            base = self._offsets(EARLIEST)
            base.update({p: o for p, o in explicit.items() if p in base})
            return base
        low = cfg.lower()
        if low not in ("earliest", "latest"):
            raise ValueError(
                f"kafka_native: unsupported startingOffsets {cfg!r} "
                "(earliest, latest, or a per-partition offset map)"
            )
        return self._offsets(EARLIEST if low == "earliest" else LATEST)

    def latestOffset(self) -> dict:
        from pipeline_spark.functions.kafkawire import LATEST

        return self._offsets(LATEST)

    def partitions(self, start: dict, end: dict):
        out = []
        for p, e in end.items():
            s = int(start.get(p, 0))
            if int(e) > s:
                out.append(
                    _RangePartition(
                        self.servers, self.topic, int(p), s, int(e),
                        self.security,
                    )
                )
        return out

    def read(self, partition: _RangePartition):
        import datetime as dt

        from pipeline_spark.functions.kafkawire import read_partition_range

        for rec in read_partition_range(
            partition.servers,
            partition.topic,
            partition.part,
            partition.start,
            partition.end,
            security=getattr(partition, "security", None),
        ):
            ts = rec["timestamp"]
            yield (
                rec["key"],
                rec["value"],
                partition.topic,
                partition.part,
                rec["offset"],
                # Kafka NO_TIMESTAMP (-1) must surface as null, not a
                # 1969 epoch artifact that poisons downstream watermarks
                dt.datetime.fromtimestamp(ts / 1000.0, dt.timezone.utc)
                if ts is not None and ts >= 0
                else None,
                0,
            )

    def commit(self, end: dict) -> None:
        pass  # Spark's offset log is the source of truth


def read_kafka_stream_native(spark, p: dict):
    """readStream DataFrame over the native wire client; registration is
    idempotent per session."""
    try:
        spark.dataSource.register(KafkaNativeDataSource)
    except Exception as exc:  # already registered in this session
        if "already" not in str(exc).lower():
            raise
    topic = p.get("topic") or p.get("topics")
    if not topic or "," in str(topic):
        raise ValueError("kafka native streaming reads one topic per module")
    reader = (
        spark.readStream.format("kafka_native")
        .option("bootstrapServers", p["bootstrapServers"])
        .option("topic", str(topic))
        .option("startingOffsets", str(p.get("startingOffsets", "earliest")))
    )
    for key in ("securityProtocol", "saslMechanism", "saslUsername",
                "saslPassword", "sslCaFile", "sslCertFile", "sslKeyFile",
                "sslVerify"):
        if p.get(key) is not None:
            reader = reader.option(key, str(p[key]))
    return reader.load()
