"""Fake injectable clients for connector-backed modules.

These document (and exercise) the client contracts that production
factories implement with real SDKs:

  vertexai.gemini  factory(params) -> obj with
                   ``generate(model, request_json) -> {"text", "raw"}``
  bigtable         factory(params) -> obj with
                   ``read_rows(table_id, *, exact/prefix/start/end)
                   -> [{"key", "cells": {family: {qualifier: bytes}}}]``
  sink writers     factory(params) -> obj with ``write(mutations: list)``
                   (see sinks/connectors.py for the per-sink row shape)

They are deterministic, dependency-free, and importable from executor
workers (tests pass them as ``pipeline_spark.testing:fake_...`` dotted
paths through the same ``clientFactory`` mechanism production uses).
"""

from __future__ import annotations


def fake_gemini_client(params: dict):
    """Echo-style LLM fake: deterministic 'text' derived from the request;
    raises for prompts containing 'FAIL' (dead-letter path testing)."""

    class _Fake:
        def generate(self, model: str, request_json: str) -> dict:
            if "FAIL" in request_json:
                raise RuntimeError("fake gemini refused request")
            return {
                "text": f"echo({model}): {request_json}",
                "raw": {"model": model, "request": request_json},
            }

    return _Fake()


def fake_bigtable_client(params: dict):
    """In-memory Bigtable fake: key 'user#<n>' has profile cells; keys
    containing 'BOOM' raise (dead-letter path testing)."""

    class _Fake:
        def read_rows(self, table_id, *, exact=None, prefix=None, start=None, end=None):
            key = exact or prefix or start or ""
            if "BOOM" in key:
                raise RuntimeError("fake bigtable unavailable")
            if not key.startswith("user#"):
                return []
            n = key.split("#", 1)[1]
            if not n.isdigit():
                return []
            return [
                {
                    "key": key,
                    "cells": {
                        "profile": {
                            "name": f"name-{n}".encode(),
                            "score": int(n).to_bytes(8, "big", signed=True),
                        }
                    },
                }
            ]

    return _Fake()


def fake_read_client(params: dict):
    """Partitioned-read fake for connector sources: serves
    ``params["rows"]`` (a list of dicts) split into
    ``params["partitions"]`` (default 3) descriptor-addressed slices —
    exercises plan_partitions/read_partition distribution exactly like a
    Spanner partitionQuery would."""

    rows = params.get("rows") or [
        {"id": i, "name": f"row-{i}", "score": i * 10} for i in range(10)
    ]
    n_parts = int(params.get("partitions", 3))

    class _Fake:
        def plan_partitions(self):
            return list(range(n_parts))

        def read_partition(self, desc):
            return [r for i, r in enumerate(rows) if i % n_parts == desc]

    return _Fake()


def fake_pull_client(params: dict):
    """Pull-style fake mirroring the pubsub client contract: a destructive
    pull served ONCE driver-side in plan_partitions, replayed verbatim by
    read_partition, with the acknowledge deferred to on_commit.  Pulls and
    acks spool to ``params["spool"]`` so tests can assert the pull is not
    re-executed on recomputation and the ack lands only post-commit."""
    import json
    import os

    spool = params["spool"]
    rows = params.get("rows") or [{"id": i, "msg": f"m-{i}"} for i in range(5)]

    class _Fake:
        def __init__(self):
            self._acks: list = []

        def plan_partitions(self):
            with open(os.path.join(spool, "pulls.jsonl"), "a") as f:
                f.write(json.dumps({"n": len(rows)}) + "\n")
            self._acks = [f"ack-{r['id']}" for r in rows]
            return [rows]

        def read_partition(self, batch):
            return batch or []

        def on_commit(self):
            with open(os.path.join(spool, "acks.jsonl"), "a") as f:
                for a in self._acks:
                    f.write(json.dumps({"ack": a}) + "\n")

    return _Fake()


def fake_writer_client(params: dict):
    """Writer fake for connector sinks: spools every mutation batch as
    JSON lines under ``params["spoolDir"]`` (one file per write call, so
    it works from executor processes); rows whose serialized form
    contains 'BOOM' raise, exercising the sink's failure path.

    Read back with ``read_spool(spool_dir)``."""
    import json
    import os
    import uuid

    spool = params["spoolDir"]

    class _Fake:
        def write(self, mutations: list) -> None:
            if any("BOOM" in str(m) for m in mutations):
                raise RuntimeError("fake writer rejected batch")
            if not mutations:
                return
            os.makedirs(spool, exist_ok=True)
            path = os.path.join(spool, f"{uuid.uuid4().hex}.jsonl")
            with open(path, "w") as f:
                for m in mutations:
                    f.write(json.dumps(m, default=str) + "\n")

    return _Fake()


def fake_pubsub_stream_client(params: dict):
    """Streaming pull/ack fake for the pubsub_native data source: messages
    are files under ``<spool>/inbox`` (``<id>.msg`` with the payload);
    pull() is DESTRUCTIVE like the real API — pulled ids land in
    ``pulled.log`` and are never served again — and ack() appends to
    ``acks.log``.  The spool dir rides in the subscription string after a
    '#' (``projects/p/subscriptions/s#/tmp/spool``) so the option
    round-trips through the data source."""
    import os

    sub = str(params["subscription"])
    spool = sub.split("#", 1)[1]
    inbox = os.path.join(spool, "inbox")
    pulled_log = os.path.join(spool, "pulled.log")
    acks_log = os.path.join(spool, "acks.log")

    class _Fake:
        def pull(self, max_messages: int):
            os.makedirs(inbox, exist_ok=True)
            pulled = set()
            if os.path.exists(pulled_log):
                with open(pulled_log) as fh:
                    pulled = {line.strip() for line in fh}
            out = []
            for name in sorted(os.listdir(inbox)):
                if not name.endswith(".msg") or name in pulled:
                    continue
                with open(os.path.join(inbox, name), "rb") as fh:
                    data = fh.read()
                out.append(
                    {
                        "data": data,
                        "message_id": name[:-4],
                        "ack_id": f"ack-{name[:-4]}",
                        "attributes": {},
                    }
                )
                if len(out) >= max_messages:
                    break
            with open(pulled_log, "a") as fh:
                for m in out:
                    fh.write(m["message_id"] + ".msg\n")
            return out

        def ack(self, ack_ids):
            with open(acks_log, "a") as fh:
                for a in ack_ids:
                    fh.write(a + "\n")

    return _Fake()


def fake_bq_load_client(params: dict):
    """BigQuery load-job fake for the sink's FILE_LOADS path: reads the
    Spark-staged parquet files back with pyarrow (proving the staging
    write really happened and is loadable) and spools one record per
    load call — ``{"table", "rows", "cfg"}`` — to ``params["spoolDir"]``."""
    import glob
    import json
    import os
    import uuid

    spool = params["spoolDir"]

    class _Fake:
        def load_parquet(self, uri_glob: str, cfg: dict) -> None:
            import pyarrow.parquet as pq

            paths = sorted(glob.glob(uri_glob))
            if not paths:
                raise RuntimeError(f"fake bq load: no staged files at {uri_glob}")
            rows = []
            for p in paths:
                rows.extend(pq.read_table(p).to_pylist())
            os.makedirs(spool, exist_ok=True)
            path = os.path.join(spool, f"{uuid.uuid4().hex}.jsonl")
            with open(path, "w") as f:
                f.write(json.dumps({"table": cfg["table"], "rows": rows, "cfg": cfg}, default=str) + "\n")

    return _Fake()


def read_spool(spool_dir: str) -> list:
    """Collect every mutation spooled by ``fake_writer_client``."""
    import json
    import os

    out = []
    if not os.path.isdir(spool_dir):
        return out
    for name in sorted(os.listdir(spool_dir)):
        with open(os.path.join(spool_dir, name)) as f:
            out.extend(json.loads(line) for line in f if line.strip())
    return out


def sqlite_connection(params: dict):
    """DB-API connection factory for the jdbc source/sink DB-API path.

    ``params["database"]`` is the sqlite file path.  The generous timeout
    matters: executor tasks write concurrently and sqlite serializes
    writers with a whole-file lock.
    """
    import sqlite3

    return sqlite3.connect(params["database"], timeout=30)


def fake_action_client(params: dict):
    """Action-service fake (action sink contract: ``run(sub_params) ->
    result dict``): records the call as one spool line and returns a
    deterministic job descriptor; a query containing 'BOOM' raises."""
    import json
    import os
    import uuid

    spool = params["spoolDir"]

    class _Fake:
        def run(self, sub: dict) -> dict:
            if "BOOM" in json.dumps(sub, default=str):
                raise RuntimeError("fake action service rejected the call")
            os.makedirs(spool, exist_ok=True)
            with open(os.path.join(spool, f"{uuid.uuid4().hex}.jsonl"), "w") as f:
                f.write(json.dumps(sub, default=str) + "\n")
            return {"job_id": "fake-job-1", "state": "DONE"}

    return _Fake()


def scope_delete_manifests(tbl, partition, keep_stamp: bool = False):
    """Simulate a FOREIGN writer's partition-scoped equality delete:
    stamp ``partition`` into every equality-delete manifest entry.
    With an all-null ``partition`` this reproduces the PRE-r11 legacy
    global-delete shape the reader's legacyGlobalDeletes guard detects.
    By default also strips the engine's spec-strict-era property stamp
    (a pre-stamp writer would not carry it); ``keep_stamp=True``
    simulates a post-stamp foreign writer instead."""
    from pipeline_spark.functions.avroocf import (
        read_ocf_file_with_meta,
        write_ocf_bytes,
    )
    from pipeline_spark.sources.iceberg_native import (
        _strip_scheme,
        load_table_metadata,
    )

    meta = load_table_metadata(tbl)
    # a real foreign writer declares the PARTITIONED spec on a scoped
    # delete manifest (r12: scope identity is (spec_id, record), so an
    # all-null/unpartitioned-spec manifest reads as global)
    spec_id = int(meta.get("default-spec-id", 0) or 0)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    ml_path = _strip_scheme(snap["manifest-list"])
    ml_schema, ml_meta, ml_recs = read_ocf_file_with_meta(ml_path)
    mans = list(ml_recs)
    retouched = []
    for m in mans:
        # only the CURRENT snapshot's delete manifests: a foreign
        # writer scopes the delete it is committing, not every delete
        # the table ever saw (stamping carried-forward manifests would
        # retroactively re-scope earlier global deletes)
        if m.get("added_snapshot_id") != snap["snapshot-id"]:
            continue
        mp = _strip_scheme(m["manifest_path"])
        schema_json, ometa, recs = read_ocf_file_with_meta(mp)
        rows = list(recs)
        touched = False
        for r in rows:
            df = r.get("data_file") or {}
            if df.get("content") == 2:
                df["partition"] = dict(partition)
                touched = True
        if touched:
            m["partition_spec_id"] = spec_id
            retouched.append(m)
            # a foreign partition-scoped delete carries the partition
            # record under the table's PARTITIONED spec — widen the
            # (possibly empty) partition record type to hold the values
            def _rec(t):
                return t if isinstance(t, dict) else None
            for f in schema_json["fields"]:
                if f["name"] != "data_file":
                    continue
                dtype = _rec(f["type"]) or next(
                    x for x in f["type"] if isinstance(x, dict))
                for df_f in dtype["fields"]:
                    if df_f["name"] == "partition":
                        prec = _rec(df_f["type"]) or next(
                            x for x in df_f["type"] if isinstance(x, dict))
                        have = {pf["name"] for pf in prec["fields"]}
                        for i, k in enumerate(sorted(partition)):
                            if k not in have:
                                prec["fields"].append({
                                    "name": k,
                                    "type": ["null", "string"],
                                    "default": None,
                                    "field-id": 1000 + i,
                                })
            extra = {k: v.decode() for k, v in ometa.items()
                     if k not in ("avro.schema", "avro.codec")}
            import json as _json
            spec = next(
                (sp for sp in meta.get("partition-specs", [])
                 if int(sp.get("spec-id", 0)) == spec_id),
                {"fields": []},
            )
            extra["partition-spec-id"] = str(spec_id)
            extra["partition-spec"] = _json.dumps(spec.get("fields", []))
            with open(mp, "wb") as fh:
                fh.write(write_ocf_bytes(schema_json, rows, extra_meta=extra))
    if retouched:
        extra = {k: v.decode() for k, v in ml_meta.items()
                 if k not in ("avro.schema", "avro.codec")}
        with open(ml_path, "wb") as fh:
            fh.write(write_ocf_bytes(ml_schema, mans, extra_meta=extra))
    if not keep_stamp:
        # r15: the engine stamps its first eq-delete commit with the
        # spec-strict-era cutoff property; a writer from BEFORE that
        # era (what this helper simulates) would not have it — strip,
        # or the legacy-ambiguity detector would (correctly) classify
        # the simulated file as post-stamp and skip detection entirely
        import json as _json

        from pipeline_spark.sources.iceberg_native import (
            find_table_metadata,
        )

        mpath = find_table_metadata(tbl)
        with open(mpath) as fh:
            m2 = _json.load(fh)
        props = dict(m2.get("properties") or {})
        if props.pop("pipeline-spark.eq-scope-strict-since-seq", None) is not None:
            m2["properties"] = props
            with open(mpath, "w") as fh:
                _json.dump(m2, fh)
