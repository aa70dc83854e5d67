"""Every example config must run end-to-end on sf0.001 (living docs,
mirroring the reference's examples/ directory role)."""

import glob
import os

import pytest

pytestmark = pytest.mark.slow  # r16: fast-tier default deselects (see pyproject)

from pipeline_spark.config import load_config
from pipeline_spark.executor import run_pipeline

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.yaml")))


@pytest.fixture(scope="module", autouse=True)
def stage_stream_inputs():
    # the streaming example consumes a directory (file-stream contract)
    import shutil

    os.makedirs("/tmp/pipeline_in/events", exist_ok=True)
    shutil.copyfile(
        "/root/testdata/sf0.001/events.parquet",
        "/tmp/pipeline_in/events/events.parquet",
    )
    # the iceberg example reads a staged fixture table (spec-built)
    import pathlib

    from test_iceberg_native import build_table

    tbl = pathlib.Path("/tmp/pipeline_in/iceberg_tbl")
    if tbl.exists():
        shutil.rmtree(tbl)
    build_table(tbl, codec="deflate")
    # the lakehouse-maintenance example compacts+vacuums a staged Delta
    # table of small-file appends (rebuilt fresh per session — the
    # example mutates it)
    import pathlib as _pl

    tbl = _pl.Path("/tmp/pipeline_in/delta_tbl")
    if tbl.exists():
        shutil.rmtree(tbl)
    from pyspark.sql import SparkSession as _S

    from pipeline_spark.sinks.delta_native import write_delta_native

    _spark = _S.builder.getOrCreate()
    for i in range(4):
        write_delta_native(
            _spark,
            _spark.range(i * 10, (i + 1) * 10).coalesce(1),
            {"path": str(tbl), "mode": "append" if i else "errorifexists"},
        )
    # the schema-evolution example lands then ALTERs a table — a prior
    # session's renamed table would fail the fresh overwrite's schema check
    shutil.rmtree("/tmp/pipeline_out/delta_governed", ignore_errors=True)
    # the replaceWhere example overwrites then reloads a partition —
    # start from a clean table per session
    shutil.rmtree("/tmp/pipeline_out/delta_reload", ignore_errors=True)
    # the commoncrawl example reads a staged WARC archive built from the
    # documents table wrapped as crawled HTML pages
    import pyarrow.parquet as pq

    from pipeline_spark.functions import warcrec

    crawl = "/tmp/pipeline_in/crawl"
    shutil.rmtree(crawl, ignore_errors=True)
    os.makedirs(crawl, exist_ok=True)
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    with open(os.path.join(crawl, "part-00000.warc.gz"), "wb") as f:
        for d in docs[:200]:
            body = (
                "<html><body><nav>chrome</nav><article><p>"
                f"{d['text']}</p></article></body></html>"
            ).encode("utf-8")
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            f.write(
                warcrec.encode_gzip_member(
                    {
                        "WARC-Type": "response",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "WARC-Target-URI": f"http://crawl.example/doc/{d['doc_id']}",
                        "Content-Type": "application/http; msgtype=response",
                    },
                    http,
                )
            )
    # the change-data-feed example reads a staged CDF-enabled table with
    # one merge-on-read delete applied
    from pipeline_spark.sinks.delta_native import delete_delta_native

    cdf_tbl = _pl.Path("/tmp/pipeline_in/cdf_tbl")
    if cdf_tbl.exists():
        shutil.rmtree(cdf_tbl)
    write_delta_native(
        _spark, _spark.range(0, 40).coalesce(1),
        {"path": str(cdf_tbl),
         "properties": {"delta.enableChangeDataFeed": True}},
    )
    delete_delta_native(
        _spark,
        {"path": str(cdf_tbl), "method": "mor",
         "where": [{"key": "id", "op": "<", "value": 8}]},
    )
    # early-firing example: fresh checkpoint per test session so the
    # stream re-processes the staged file
    shutil.rmtree("/tmp/pipeline_out/early_firing", ignore_errors=True)
    shutil.rmtree("/tmp/pipeline_out/early_firing_checkpoint", ignore_errors=True)
    shutil.rmtree("/tmp/pipeline_out/count_trigger", ignore_errors=True)
    shutil.rmtree("/tmp/pipeline_out/count_trigger_checkpoint", ignore_errors=True)
    shutil.rmtree("/tmp/pipeline_out/composite_trigger", ignore_errors=True)
    shutil.rmtree("/tmp/pipeline_out/composite_trigger_checkpoint", ignore_errors=True)
    # --- r14 example fixtures (VERDICT r13 ask #7) ---------------------
    # onnx-score-embeddings: the shared seeded 64->16->1 MLP
    # (functions/onnxwire.py — one definition for entry/examples/tests)
    from pipeline_spark.functions.onnxwire import build_mlp64

    with open("/tmp/pipeline_in/mlp64.onnx", "wb") as fh:
        fh.write(build_mlp64())
    # jdbc-sqlite-ingest: the items DB the partitioned DB-API read scans
    import sqlite3

    if os.path.exists("/tmp/pipeline_in/items.db"):
        os.remove("/tmp/pipeline_in/items.db")
    con = sqlite3.connect("/tmp/pipeline_in/items.db")
    con.execute("CREATE TABLE items (id INTEGER, name TEXT, qty INTEGER)")
    con.executemany(
        "INSERT INTO items VALUES (?, ?, ?)",
        [(i, f"item{i}", i * 3) for i in range(100)],
    )
    con.commit()
    con.close()
    # bigquery-to-jdbc: the destination DB with an empty users table
    # (the DB-API sink INSERTs; DDL stays with the database owner)
    os.makedirs("/tmp/pipeline_out", exist_ok=True)
    if os.path.exists("/tmp/pipeline_out/bq_users.db"):
        os.remove("/tmp/pipeline_out/bq_users.db")
    con = sqlite3.connect("/tmp/pipeline_out/bq_users.db")
    con.execute("CREATE TABLE users (id INTEGER, name TEXT, score INTEGER)")
    con.commit()
    con.close()
    # csv-ingest-cast: nation as header CSV
    import csv as _csv

    nrows = pq.read_table(
        "/root/testdata/sf0.001/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pylist()
    os.makedirs("/tmp/pipeline_in/nation_csv", exist_ok=True)
    with open("/tmp/pipeline_in/nation_csv/part-0.csv", "w", newline="") as fh:
        w = _csv.DictWriter(fh, ["n_nationkey", "n_name", "n_regionkey"])
        w.writeheader()
        w.writerows(nrows)
    # pubsub-pull-fake: the pull/ack spool directory
    os.makedirs("/tmp/pipeline_in/pubsub_spool", exist_ok=True)
    # http-enrich-local: a local JSON echo endpoint for the session
    import json as _json
    import threading as _th
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class _EchoHandler(BaseHTTPRequestHandler):
        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            q = parse_qs(urlparse(self.path).query)
            body = _json.dumps({"id": int(q.get("id", ["0"])[0])}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    try:
        _srv = HTTPServer(("127.0.0.1", 18647), _EchoHandler)
        _th.Thread(target=_srv.serve_forever, daemon=True).start()
    except OSError:
        pass  # port already bound by a previous session's daemon thread
    # deserialize-protobuf: descriptor set + wire-encoded payload parquet
    # (the entry module's descriptor/wire builders keep one source of truth)
    import struct as _struct
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __spark_entry__ as _entry

    with open("/tmp/pipeline_in/order_fds.bin", "wb") as fh:
        fh.write(_entry._order_descriptor_set())
    import pandas as _pd_
    from pyspark.sql import functions as _F

    @_F.pandas_udf("binary")
    def _enc(ids, sts, prs, prios):
        out = []
        for i, s, p, pr in zip(ids, sts, prs, prios):
            b = _entry._proto_vi(1, int(i)) + _entry._proto_ld(2, s.encode())
            b += _entry._proto_varint((3 << 3) | 1) + _struct.pack("<d", float(p))
            b += _entry._proto_ld(4, pr.encode())
            out.append(b)
        return _pd_.Series(out)

    (_spark.read.parquet("/root/testdata/sf0.001/orders.parquet").limit(200)
     .select(_enc("o_orderkey", "o_orderstatus", "o_totalprice",
                  "o_orderpriority").alias("payload"))
     .coalesce(1).write.mode("overwrite")
     .parquet("/tmp/pipeline_in/proto_orders"))
    # pdf-text-extraction: two fixture PDFs (one compressed-good, one junk)
    from tests.test_pdftext import build_pdf

    pdf_dir = "/tmp/pipeline_in/pdfs"
    shutil.rmtree(pdf_dir, ignore_errors=True)
    os.makedirs(pdf_dir, exist_ok=True)
    with open(os.path.join(pdf_dir, "good.pdf"), "wb") as fh:
        fh.write(build_pdf([b"BT (Hello from the example corpus) Tj ET"],
                           compress=True))
    with open(os.path.join(pdf_dir, "junk.pdf"), "wb") as fh:
        fh.write(b"not a pdf at all")
    # copyfile-fanout: source files + a clean destination dir
    os.makedirs("/tmp/pipeline_in/copysrc", exist_ok=True)
    for n in ("a", "b"):
        with open(f"/tmp/pipeline_in/copysrc/{n}.txt", "w") as fh:
            fh.write(f"payload {n}\n")
    shutil.rmtree("/tmp/pipeline_out/copydst", ignore_errors=True)
    os.makedirs("/tmp/pipeline_out/copydst", exist_ok=True)
    # streaming-executor-panes: fresh output + checkpoint per session
    shutil.rmtree("/tmp/pipeline_out/executor_panes", ignore_errors=True)
    # avro-filter-roundtrip: stage the input OCF with the same native
    # writer the export example exercises
    from pipeline_spark.config import parse_config as _pc
    from pipeline_spark.executor import run_pipeline as _rp

    shutil.rmtree("/tmp/pipeline_in/orders_avro", ignore_errors=True)
    _rp(_spark, _pc("""
sources:
  - name: orders
    module: storage
    parameters: {format: parquet, input: /root/testdata/sf0.001/orders.parquet}
sinks:
  - name: out
    module: storage
    inputs: [orders]
    parameters: {format: avro, output: /tmp/pipeline_in/orders_avro}
"""))
    # r15 service-sink examples: fresh mutation spools per session so
    # the per-example content assertions below see only this run
    for d in glob.glob("/tmp/pipeline_out/spool_*"):
        shutil.rmtree(d, ignore_errors=True)
    for f in ("drive_a.txt", "drive_b.txt"):
        try:
            os.remove(f"/tmp/pipeline_out/copydst/{f}")
        except OSError:
            pass


def _spool(d):
    from pipeline_spark.testing import read_spool

    return read_spool(f"/tmp/pipeline_out/spool_{d}")


# Per-example content assertions beyond "it ran" — keyed by file name.
# (Most examples' operator semantics are oracle-checked elsewhere; these
# pin the service-sink examples whose effect lives in the fake spools.)
EXTRA_CHECKS = {
    "beamsql-join-two-services.yaml": lambda outs: (
        sorted(m["row"]["id"] for m in _spool("beamsql_join"))
        == [1, 2, 3, 4]  # join drops nothing above score>=10 except id 0
        and all(m["table"] == "user_levels" and m["op"] == "UPSERT"
                for m in _spool("beamsql_join"))
        and {m["row"]["level"] for m in _spool("beamsql_join")}
        == {"silver", "gold", "bronze"}
    ),
    "spanner-to-spanner.yaml": lambda outs: (
        sorted(m["row"]["id"] for m in _spool("spanner_copy"))
        == list(range(10))
        and all(set(m["row"]) == {"id", "name", "tier"}
                for m in _spool("spanner_copy"))
    ),
    "csv-to-spanner.yaml": lambda outs: (
        len(_spool("csv_spanner")) == 25
        and all(m["table"] == "nation" for m in _spool("csv_spanner"))
    ),
    "datastore-delete-mutations.yaml": lambda outs: (
        sorted((m["row"]["id"], m["op"])
               for m in _spool("datastore_delete"))
        == [(11, "DELETE"), (12, "DELETE"), (13, "DELETE")]
        and all("__op__" not in m["row"]
                for m in _spool("datastore_delete"))
    ),
    "drivefile-to-copyfile.yaml": lambda outs: (
        open("/tmp/pipeline_out/copydst/drive_a.txt").read()
        == "payload a\n"
        and open("/tmp/pipeline_out/copydst/drive_b.txt").read()
        == "payload b\n"
    ),
    "firestore-to-bigquery.yaml": lambda outs: (
        len(_spool("fs_bq")) == 1
        and sorted(
            (r["user"], r["n"], r["total"])
            for r in _spool("fs_bq")[0]["rows"]
        ) == [("ann", 2, 42), ("bob", 1, 7), ("cat", 1, 99)]
    ),
    "setoperation-replace-spanner.yaml": lambda outs: (
        sorted((m["row"]["id"], m["op"])
               for m in _spool("setop_spanner"))
        == [(2, "REPLACE"), (3, "REPLACE")]
    ),
    "jdbc-to-spanner.yaml": lambda outs: (
        sorted(m["row"]["id"] for m in _spool("jdbc_spanner"))
        == list(range(100))
    ),
    "avro-to-partition-to-spanner.yaml": lambda outs: (
        {m["table"] for m in _spool("part_open")} == {"open_orders"}
        and {m["table"] for m in _spool("part_done")}
        == {"finished_orders"}
        and all(m["row"]["o_orderstatus"] == "O"
                for m in _spool("part_open"))
        and all(m["row"]["o_orderstatus"] == "F"
                for m in _spool("part_done"))
    ),
    "bigquery-to-aggregation-to-bigquery.yaml": lambda outs: (
        sorted((r["name"], r["n"], r["best"])
               for r in _spool("bq_agg_bq")[0]["rows"])
        == [("ann", 2, 14), ("bob", 2, 30), ("cat", 1, 2)]
    ),
    "bigquery-to-jdbc.yaml": lambda outs: (
        __import__("sqlite3").connect("/tmp/pipeline_out/bq_users.db")
        .execute("SELECT count(*), min(id), max(id) FROM users")
        .fetchone() == (10, 0, 9)
    ),
    "pubsub-to-aggregation-to-pubsub.yaml": lambda outs: (
        [(m["row"]["n"], m["row"]["max_id"])
         for m in _spool("ps_agg_ps")] == [(5, 4)]
    ),
    "spanner-to-spanner-delete.yaml": lambda outs: (
        sorted((m["row"]["id"], m["op"])
               for m in _spool("spanner_delete"))
        == [(0, "DELETE"), (1, "DELETE"), (2, "DELETE")]
    ),
    "microbatch-to-spanner.yaml": lambda outs: (
        len(_spool("mb_spanner")) > 0
        and {m["table"] for m in _spool("mb_spanner")}
        == {"recent_events"}
    ),
}


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(spark, path):
    outputs = run_pipeline(spark, load_config(path))
    assert outputs
    check = EXTRA_CHECKS.get(os.path.basename(path))
    if check is not None:
        assert check(outputs), os.path.basename(path)
