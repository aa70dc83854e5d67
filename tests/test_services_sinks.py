"""`localH2` / `auxia` / `tasks` / `action` sinks (r9): the last four
sink modules of SURVEY §2.7, each e2e through the config path with the
repo's injectable-client fakes (tasks is registered-but-
NotImplementedException in the reference — TasksSink.java:73 — so this
exercises the declared surface the reference never finished)."""

import json
import os
import sqlite3
import zipfile

import pytest

from pipeline_spark.config import parse_config
from pipeline_spark.executor import run_pipeline
from pipeline_spark.testing import read_spool


def _docs_cfg(extra: str) -> str:
    return f"""
sources:
  - name: rows
    module: create
    parameters:
      elements:
        - {{user_id: u1, event_name: click, score: 10}}
        - {{user_id: u2, event_name: view, score: 20}}
        - {{user_id: u2, event_name: click, score: 30}}
{extra}
"""


def test_localh2_single_db_zip(spark, tmp_path):
    out = str(tmp_path / "artifact.zip")
    cfg = _docs_cfg(f"""
sinks:
  - name: db
    module: localH2
    inputs: [rows]
    parameters:
      output: {out}
      database: corpus
      configs:
        - {{input: rows, table: events, keyFields: [user_id, event_name],
            op: INSERT_OR_UPDATE}}
""")
    run_pipeline(spark, parse_config(cfg))
    with zipfile.ZipFile(out) as zf:
        assert zf.namelist() == ["corpus.db"]
        zf.extract("corpus.db", tmp_path)
    con = sqlite3.connect(str(tmp_path / "corpus.db"))
    rows = con.execute(
        "SELECT user_id, event_name, score FROM events ORDER BY 1, 2"
    ).fetchall()
    assert rows == [("u1", "click", 10), ("u2", "click", 30),
                    ("u2", "view", 20)]
    # unique key index exists (the upsert contract)
    idx = con.execute("PRAGMA index_list(events)").fetchall()
    assert any(r[2] == 1 for r in idx)  # unique
    con.close()


def test_localh2_upsert_and_seed(spark, tmp_path):
    out1 = str(tmp_path / "v1.zip")
    cfg1 = _docs_cfg(f"""
sinks:
  - name: db
    module: localH2
    inputs: [rows]
    parameters:
      output: {out1}
      configs:
        - {{input: rows, table: events, keyFields: [user_id, event_name],
            op: INSERT_OR_UPDATE}}
""")
    run_pipeline(spark, parse_config(cfg1))
    # second batch SEEDED from the first artifact: u1/click updates,
    # u3 inserts
    out2 = str(tmp_path / "v2.zip")
    cfg2 = f"""
sources:
  - name: rows
    module: create
    parameters:
      elements:
        - {{user_id: u1, event_name: click, score: 99}}
        - {{user_id: u3, event_name: view, score: 7}}
sinks:
  - name: db
    module: localH2
    inputs: [rows]
    parameters:
      input: {out1}
      output: {out2}
      configs:
        - {{input: rows, table: events, keyFields: [user_id, event_name],
            op: INSERT_OR_UPDATE}}
"""
    run_pipeline(spark, parse_config(cfg2))
    with zipfile.ZipFile(out2) as zf:
        zf.extract("local.db", tmp_path)
    con = sqlite3.connect(str(tmp_path / "local.db"))
    rows = con.execute(
        "SELECT user_id, event_name, score FROM events ORDER BY 1, 2"
    ).fetchall()
    con.close()
    assert rows == [("u1", "click", 99), ("u2", "click", 30),
                    ("u2", "view", 20), ("u3", "view", 7)]


def test_localh2_grouped_builds_one_db_per_group(spark, tmp_path):
    out = str(tmp_path / "per_user")
    cfg = _docs_cfg(f"""
sinks:
  - name: db
    module: localH2
    inputs: [rows]
    parameters:
      output: {out}
      groupFields: [user_id]
      configs:
        - {{input: rows, table: events}}
""")
    outs = run_pipeline(spark, parse_config(cfg))
    built = sorted(r["group"] for r in outs["db"].collect())
    assert built == ["u1", "u2"]
    for user, want in (("u1", 1), ("u2", 2)):
        with zipfile.ZipFile(os.path.join(out, f"{user}.db.zip")) as zf:
            zf.extract("local.db", tmp_path / user)
        con = sqlite3.connect(str(tmp_path / user / "local.db"))
        n = con.execute("SELECT count(*) FROM events").fetchone()[0]
        con.close()
        assert n == want


def test_localh2_max_rows_guard(spark, tmp_path):
    cfg = _docs_cfg(f"""
sinks:
  - name: db
    module: localH2
    inputs: [rows]
    parameters:
      output: {tmp_path}/never.zip
      maxRows: 2
      configs: [{{input: rows, table: events}}]
""")
    with pytest.raises(Exception, match="maxRows"):
        run_pipeline(spark, parse_config(cfg))


def test_auxia_element_events_to_pubsub(spark, tmp_path):
    spool = str(tmp_path / "spool")
    cfg = _docs_cfg(f"""
sinks:
  - name: crm
    module: auxia
    inputs: [rows]
    parameters:
      projectId: demo-proj
      excludeFields: [score]
      pubsub:
        topic: projects/p/topics/auxia
      clientFactory: "pipeline_spark.testing:fake_writer_client"
      spoolDir: {spool}
""")
    run_pipeline(spark, parse_config(cfg))
    msgs = read_spool(spool)
    assert len(msgs) == 3
    reqs = [m["row"] for m in msgs]
    assert all(r["project_id"] == "demo-proj" for r in reqs)
    by_user = sorted(
        (r["user_id"], r["events"][0]["event_name"]) for r in reqs
    )
    assert by_user == [("u1", "click"), ("u2", "click"), ("u2", "view")]
    # excluded field never leaks into event_properties
    assert all(
        "score" not in (r["events"][0].get("event_properties") or {})
        for r in reqs
    )


def test_auxia_json_field_and_property_types(spark, tmp_path):
    spool = str(tmp_path / "spool2")
    cfg = f"""
sources:
  - name: rows
    module: create
    parameters:
      elements:
        - {{user_id: u9, payload: '{{"event_name": "buy", "insert_id": "i1"}}'}}
sinks:
  - name: crm
    module: auxia
    inputs: [rows]
    parameters:
      type: json
      field: payload
      projectId: demo-proj
      pubsub: {{topic: projects/p/topics/auxia}}
      clientFactory: "pipeline_spark.testing:fake_writer_client"
      spoolDir: {spool}
"""
    run_pipeline(spark, parse_config(cfg))
    msgs = read_spool(spool)
    assert len(msgs) == 1
    req = msgs[0]["row"]
    assert req["user_id"] == "u9"
    assert req["events"][0] == {"event_name": "buy", "insert_id": "i1"}


def test_tasks_enqueue_one_task_per_row(spark, tmp_path):
    import base64

    spool = str(tmp_path / "spool3")
    cfg = _docs_cfg(f"""
sinks:
  - name: q
    module: tasks
    inputs: [rows]
    parameters:
      queue: projects/p/locations/l/queues/work
      format: json
      url: https://example.com/handle
      attributes: [user_id]
      clientFactory: "pipeline_spark.testing:fake_writer_client"
      spoolDir: {spool}
""")
    run_pipeline(spark, parse_config(cfg))
    msgs = read_spool(spool)
    assert len(msgs) == 3
    t0 = msgs[0]["row"]["task"]["httpRequest"]
    assert t0["url"] == "https://example.com/handle"
    assert t0["httpMethod"] == "POST"
    body = json.loads(base64.b64decode(t0["body"]))
    assert body["user_id"] in ("u1", "u2")
    assert t0["headers"][f"x-attr-user_id"] == body["user_id"]
    assert msgs[0]["table"] == "projects/p/locations/l/queues/work"


def test_action_bigquery_runs_after_inputs(spark, tmp_path):
    spool = str(tmp_path / "spool4")
    cfg = _docs_cfg(f"""
sinks:
  - name: act
    module: action
    inputs: [rows]
    parameters:
      service: bigquery
      bigquery:
        query: "SELECT 1"
        destinationTable: p.d.t
      clientFactory: "pipeline_spark.testing:fake_action_client"
      spoolDir: {spool}
""")
    outs = run_pipeline(spark, parse_config(cfg))
    res = outs["act"].collect()
    assert len(res) == 1 and res[0]["service"] == "bigquery"
    assert json.loads(res[0]["result"])["state"] == "DONE"
    calls = read_spool(spool)
    assert calls == [{"query": "SELECT 1", "destinationTable": "p.d.t"}]


def test_action_gemini_with_fake(spark, tmp_path):
    cfg = _docs_cfg("""
sinks:
  - name: act
    module: action
    inputs: [rows]
    parameters:
      service: vertexai_gemini
      gemini: {prompt: "summarize the run", model: test-model}
      clientFactory: "pipeline_spark.testing:fake_gemini_client"
""")
    outs = run_pipeline(spark, parse_config(cfg))
    res = json.loads(outs["act"].collect()[0]["result"])
    assert res["text"].startswith("echo(test-model)")


def test_action_unknown_service_fails(spark, tmp_path):
    cfg = _docs_cfg("""
sinks:
  - name: act
    module: action
    inputs: [rows]
    parameters: {service: nosuch}
""")
    with pytest.raises(Exception, match="service"):
        run_pipeline(spark, parse_config(cfg))


def test_localh2_group_key_sanitized(spark, tmp_path):
    """Group values become filenames — path metacharacters must not
    escape the output directory."""
    out = str(tmp_path / "hostile")
    cfg = f"""
sources:
  - name: rows
    module: create
    parameters:
      elements:
        - {{user_id: "../escape", score: 1}}
sinks:
  - name: db
    module: localH2
    inputs: [rows]
    parameters:
      output: {out}
      groupFields: [user_id]
      configs: [{{input: rows, table: t}}]
"""
    run_pipeline(spark, parse_config(cfg))
    names = os.listdir(out)
    assert len(names) == 1 and ".." not in names[0] and "/" not in names[0]
    assert not os.path.exists(str(tmp_path / "escape.db.zip"))


def test_localh2_delete_op(spark, tmp_path):
    """op DELETE removes seeded rows by key."""
    out1 = str(tmp_path / "base.zip")
    run_pipeline(spark, parse_config(_docs_cfg(f"""
sinks:
  - name: db
    module: localH2
    inputs: [rows]
    parameters:
      output: {out1}
      configs:
        - {{input: rows, table: events, keyFields: [user_id, event_name]}}
""")))
    out2 = str(tmp_path / "after.zip")
    cfg = f"""
sources:
  - name: gone
    module: create
    parameters:
      elements:
        - {{user_id: u2, event_name: view}}
sinks:
  - name: db
    module: localH2
    inputs: [gone]
    parameters:
      input: {out1}
      output: {out2}
      configs:
        - {{input: gone, table: events, keyFields: [user_id, event_name],
            op: DELETE}}
"""
    run_pipeline(spark, parse_config(cfg))
    with zipfile.ZipFile(out2) as zf:
        zf.extract("local.db", tmp_path / "d")
    con = sqlite3.connect(str(tmp_path / "d" / "local.db"))
    rows = con.execute(
        "SELECT user_id, event_name FROM events ORDER BY 1, 2"
    ).fetchall()
    con.close()
    assert rows == [("u1", "click"), ("u2", "click")]


def test_tasks_default_client_gated(spark, tmp_path):
    """Without google-auth the default tasks client names its workaround
    instead of failing obscurely."""
    from pipeline_spark.sinks.services import default_tasks_client

    try:
        import google.auth  # noqa: F401

        pytest.skip("google-auth present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="clientFactory"):
        default_tasks_client({"queue": "q"})


def test_localh2_group_collision_disambiguated(spark, tmp_path):
    """Distinct raw groups that sanitize identically must land in
    distinct artifacts (hash-suffixed), never overwrite each other."""
    out = str(tmp_path / "collide")
    cfg = f"""
sources:
  - name: rows
    module: create
    parameters:
      elements:
        - {{user_id: "a b", score: 1}}
        - {{user_id: "a_b", score: 2}}
sinks:
  - name: db
    module: localH2
    inputs: [rows]
    parameters:
      output: {out}
      groupFields: [user_id]
      configs: [{{input: rows, table: t}}]
"""
    outs = run_pipeline(spark, parse_config(cfg))
    paths = {r["path"] for r in outs["db"].collect()}
    assert len(paths) == 2          # two distinct artifacts
    assert len(os.listdir(out)) == 2


def test_localh2_decimal_column(spark, tmp_path):
    """DecimalType columns bind as exact strings (sqlite NUMERIC)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "dec.zip")
    df = spark.range(3).select(
        F.col("id"), F.col("id").cast("decimal(10,2)").alias("amount")
    )
    from pipeline_spark.registry import ModuleContext
    from pipeline_spark.sinks.localdb import localh2_sink

    localh2_sink(ModuleContext(
        spark=spark, name="db",
        params={"output": out, "configs": [{"input": "rows", "table": "t"}]},
        inputs=[df], input_names=["rows"], side_inputs={}, config={},
    ))
    with zipfile.ZipFile(out) as zf:
        zf.extract("local.db", tmp_path / "x")
    con = sqlite3.connect(str(tmp_path / "x" / "local.db"))
    got = con.execute("SELECT id, amount FROM t ORDER BY id").fetchall()
    con.close()
    assert [(i, float(a)) for i, a in got] == [(0, 0.0), (1, 1.0), (2, 2.0)]


def test_localh2_seed_with_groupfields_refused(spark, tmp_path):
    cfg = _docs_cfg(f"""
sinks:
  - name: db
    module: localH2
    inputs: [rows]
    parameters:
      output: {tmp_path}/g
      input: {tmp_path}/seed.zip
      groupFields: [user_id]
      configs: [{{input: rows, table: t}}]
""")
    with pytest.raises(Exception, match="groupFields"):
        run_pipeline(spark, parse_config(cfg))


def test_auxia_json_multi_user_payload(spark, tmp_path):
    """A multi-user json payload attributes each event to ITS user."""
    spool = str(tmp_path / "spool5")
    payload = ('[{"user_id": "a", "event_name": "x"},'
               ' {"user_id": "b", "event_name": "y"}]')
    cfg = f"""
sources:
  - name: rows
    module: create
    parameters:
      elements:
        - {{payload: '{payload}'}}
sinks:
  - name: crm
    module: auxia
    inputs: [rows]
    parameters:
      type: json
      field: payload
      projectId: demo
      pubsub: {{topic: projects/p/topics/t}}
      clientFactory: "pipeline_spark.testing:fake_writer_client"
      spoolDir: {spool}
"""
    run_pipeline(spark, parse_config(cfg))
    got = sorted(
        (m["row"]["user_id"], m["row"]["events"][0]["event_name"])
        for m in read_spool(spool)
    )
    assert got == [("a", "x"), ("b", "y")]


def test_localh2_property_roundtrip(spark, tmp_path):
    """Property: arbitrary (text, int, float, bool, bytes) rows survive
    the sqlite artifact roundtrip value-exactly (hypothesis over the
    cell codec — the Spark plumbing is pinned by the e2e tests above)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pipeline_spark.sinks.localdb import _cell, _ddl_for, _dml_for

    class _F:
        def __init__(self, name, t):
            self.name = name
            self.dataType = type("T", (), {
                "simpleString": staticmethod(lambda t=t: t)
            })()

    class _S:
        fields = [
            _F("s", "string"), _F("i", "bigint"), _F("d", "double"),
            _F("b", "boolean"), _F("z", "binary"),
        ]

    @settings(max_examples=60, deadline=None)
    @given(
        s=st.text(max_size=40),
        i=st.integers(min_value=-(2**62), max_value=2**62),
        d=st.floats(allow_nan=False, allow_infinity=False, width=32),
        b=st.booleans(),
        z=st.binary(max_size=24),
    )
    def run(s, i, d, b, z):
        con = sqlite3.connect(":memory:")
        for ddl in _ddl_for("t", _S(), ["i"]):
            con.execute(ddl)
        dml = _dml_for(
            "t", ["s", "i", "d", "b", "z"], "INSERT_OR_UPDATE", ["i"]
        )
        con.execute(dml, tuple(_cell(v) for v in (s, i, d, b, z)))
        # upsert the same key again — must replace, not duplicate
        con.execute(dml, tuple(_cell(v) for v in (s + "!", i, d, b, z)))
        got = con.execute("SELECT s, i, d, b, z FROM t").fetchall()
        con.close()
        assert got == [(s + "!", i, d, int(b), z)]

    run()
