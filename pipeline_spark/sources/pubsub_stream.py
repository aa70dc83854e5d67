"""Streaming Pub/Sub via the Spark 4 Python DataSource API.

Reference: module/source/PubSubSource.java streams subscriptions through
Beam's PubsubIO; our batch-mode connector does a bounded catch-up pull
(sources/connectors.py).  This module adds TRUE streaming on
``SimpleDataSourceStreamReader``, whose prefetch-and-cache contract is
exactly Pub/Sub's at-least-once pull model:

  read(start)    driver-side pull of up to ``maxMessages`` — Spark CACHES
                 the returned batch in its checkpoint log until commit,
                 so a failed/restarted micro-batch REPLAYS the cached
                 rows instead of re-pulling (a destructive pull cannot be
                 re-executed)
  commit(end)    acknowledge everything pulled up to ``end`` — acks
                 happen only after Spark has durably committed the batch,
                 the same ack-after-output contract the reference keeps

The client is injectable (``clientFactory``) with the contract
``pull(max_messages) -> list[{"data": bytes|str, "message_id": str,
"ack_id": str, "attributes": dict}]`` and ``ack(ack_ids)``; the default
factory wraps the google-cloud-pubsub SDK and is import-gated.

Scale note: Pub/Sub pull is inherently a per-subscription firehose — the
driver-side pull here is control-plane-bounded by maxMessages per
micro-batch, and heavy decode/transform work still runs distributed on
the returned DataFrame.  For sustained very-high-throughput topics the
reference points at Pub/Sub Lite / Kafka bridges; so do we.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

PUBSUB_SCHEMA = (
    "data binary, message_id string, attributes map<string,string>, "
    "publish_time timestamp"
)


class PubSubNativeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pubsub_native"

    def schema(self) -> str:
        return PUBSUB_SCHEMA

    def simpleStreamReader(self, schema):
        return _PubSubStreamReader(self.options)


class _PubSubStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        factory = options.get("clientfactory")
        if not factory:
            factory = (
                "pipeline_spark.sources.pubsub_stream:default_pubsub_stream_client"
            )
        self._factory_path = factory
        self._params = {
            "subscription": options.get("subscription"),
            "maxMessages": int(options.get("maxmessages", 1000)),
        }
        self._client = None
        # ack ids by pull sequence, kept until commit
        self._pending_acks: dict[int, list] = {}

    def _get_client(self):
        if self._client is None:
            from pipeline_spark.operators.ml import resolve_factory

            self._client = resolve_factory(self._factory_path)(self._params)
        return self._client

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        import datetime as dt

        client = self._get_client()
        msgs = client.pull(self._params["maxMessages"]) or []
        seq = int(start["seq"])
        if not msgs:
            if self._pending_acks:
                # Spark only source-commits batch N when batch N+1 starts,
                # so WITH acks outstanding an empty poll must still
                # advance the offset — the resulting empty batch triggers
                # the commit that flushes them
                return iter([]), {"seq": seq + 1}
            # idle and nothing pending: hold the offset so the offset log
            # doesn't grow one entry per idle micro-batch
            return iter([]), start
        self._pending_acks[seq + 1] = [m["ack_id"] for m in msgs if m.get("ack_id")]
        now = dt.datetime.now(dt.timezone.utc)
        rows = iter(
            [
                (
                    m["data"] if isinstance(m["data"], (bytes, bytearray))
                    else str(m["data"]).encode(),
                    str(m.get("message_id", "")),
                    dict(m.get("attributes") or {}),
                    m.get("publish_time") or now,
                )
                for m in msgs
            ]
        )
        return rows, {"seq": seq + 1}

    def commit(self, end: dict) -> None:
        client = self._get_client()
        upto = int(end["seq"])
        for seq in sorted(self._pending_acks):
            if seq > upto:
                break
            ids = self._pending_acks.pop(seq)
            if ids:
                client.ack(ids)

    def readBetweenOffsets(self, start: dict, end: dict):
        # Spark serves replays from its driver-side prefetch cache; this
        # fallback is reached only when a RESTARTED query replans the last
        # uncommitted batch (cache gone with the old driver).  Those
        # messages were pulled but never acked, so Pub/Sub itself
        # redelivers them after the ack deadline into a later pull —
        # at-least-once holds via the broker (the reference's Beam source
        # has the same contract); emitting nothing here avoids binding
        # unrelated fresh messages to a replayed offset range.
        return iter([])


def default_pubsub_stream_client(params: dict[str, Any]):
    """google-cloud-pubsub-backed client (import-gated)."""
    try:
        from google.cloud import pubsub_v1
    except ImportError:
        raise RuntimeError(
            "pubsub streaming needs the 'google-cloud-pubsub' SDK; pass "
            "clientFactory to inject another client"
        ) from None

    subscriber = pubsub_v1.SubscriberClient()
    subscription = params["subscription"]

    class _Client:
        def pull(self, max_messages: int):
            resp = subscriber.pull(
                request={"subscription": subscription, "max_messages": max_messages}
            )
            out = []
            for m in resp.received_messages:
                out.append(
                    {
                        "data": bytes(m.message.data),
                        "message_id": m.message.message_id,
                        "ack_id": m.ack_id,
                        "attributes": dict(m.message.attributes),
                        "publish_time": m.message.publish_time,
                    }
                )
            return out

        def ack(self, ack_ids):
            for i in range(0, len(ack_ids), 1000):
                subscriber.acknowledge(
                    request={
                        "subscription": subscription,
                        "ack_ids": ack_ids[i : i + 1000],
                    }
                )

    return _Client()


def read_pubsub_stream_native(spark, p: dict):
    """readStream DataFrame over the pull/ack client."""
    try:
        spark.dataSource.register(PubSubNativeDataSource)
    except Exception as exc:
        if "already" not in str(exc).lower():
            raise
    reader = (
        spark.readStream.format("pubsub_native")
        .option("subscription", p["subscription"])
        .option("maxMessages", str(p.get("maxMessages", 1000)))
    )
    if p.get("clientFactory"):
        reader = reader.option("clientFactory", p["clientFactory"])
    return reader.load()
