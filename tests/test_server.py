"""API server tests: probe, schema listing, validate good/bad configs,
full run. Reference: MPipelineServer.java:1-60, PipelineService.java."""

import json
import threading
import urllib.request

import pytest

from pipeline_spark.server import PipelineServer


@pytest.fixture(scope="module")
def server(spark):
    srv = PipelineServer(spark=spark, port=0, allow_run=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def locked_server(spark):
    """Default-posture server: run disabled, bearer token required."""
    srv = PipelineServer(spark=spark, port=0, token="s3cret")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
        return r.status, json.loads(r.read())


def _post(srv, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=body.encode(), method="POST"
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


GOOD = """
sources:
  - name: src
    module: create
    parameters:
      elements: [{a: 1}, {a: 2}]
    schema:
      fields:
        - {name: a, type: int64}
transforms:
  - name: doubled
    module: select
    inputs: [src]
    parameters:
      select:
        - {name: a}
        - {name: b, func: expression, expression: "a * 2"}
sinks:
  - name: out
    module: memory
    inputs: [doubled]
    parameters:
      table: server_run_out
"""


def test_probe_and_schema(server):
    status, body = _get(server, "/probe")
    assert status == 200 and body["status"] == "ok"
    status, body = _get(server, "/api/schema")
    assert status == 200
    assert "create" in body["modules"]["source"]
    assert "aggregation" in body["modules"]["transform"]
    assert "storage" in body["modules"]["sink"]


def test_validate_good_config(server):
    status, body = _post(server, "/api/pipeline?action=validate", GOOD)
    assert status == 200 and body["status"] == "ok"
    assert body["modules"] == ["src", "doubled", "out"]


def test_validate_bad_configs(server):
    # unknown module name
    bad = GOOD.replace("module: select", "module: selectron")
    status, body = _post(server, "/api/pipeline?action=validate", bad)
    assert status == 400 and body["status"] == "error"
    assert any("selectron" in e for e in body["errors"])

    # dangling input
    bad = GOOD.replace("inputs: [src]", "inputs: [nonexistent]")
    status, body = _post(server, "/api/pipeline?action=validate", bad)
    assert status == 400
    assert any("unresolved input 'nonexistent'" in e for e in body["errors"])

    # unparsable YAML
    status, body = _post(server, "/api/pipeline?action=validate", "sources: [}")
    assert status == 400 and "config parse" in body["errors"][0]

    # cycle
    cyc = GOOD + """
  - name: c1
    module: debug
    inputs: [c2]
  - name: c2
    module: debug
    inputs: [c1]
"""
    status, body = _post(server, "/api/pipeline?action=validate", cyc)
    assert status == 400
    assert any("stuck" in e for e in body["errors"])


def test_run_action(server, spark):
    status, body = _post(server, "/api/pipeline?action=run", GOOD)
    assert status == 200 and body["status"] == "ok"
    assert "doubled" in {o["name"] for o in body["outputs"]}
    rows = sorted(
        (r["a"], r["b"]) for r in spark.table("server_run_out").collect()
    )
    assert rows == [(1, 2), (2, 4)]


def test_dryrun_schema_report(server, spark):
    """dryrun plans the pipeline and reports per-output schemas without
    executing any sink action (reference: PipelineService.java dryrun +
    MCollection.toJsonObject)."""
    cfg = GOOD.replace("table: server_run_out", "table: server_dryrun_out")
    status, body = _post(server, "/api/pipeline?action=dryrun", cfg)
    assert status == 200 and body["status"] == "ok" and body["action"] == "dryrun"
    by_name = {o["name"]: o["schema"] for o in body["outputs"]}
    assert [f["name"] for f in by_name["doubled"]["fields"]] == ["a", "b"]
    types = {f["name"]: f["type"] for f in by_name["doubled"]["fields"]}
    assert types["a"] == "bigint" and types["b"] in ("bigint", "double")
    # the memory sink must NOT have materialized
    assert "server_dryrun_out" not in [t.name for t in spark.catalog.listTables()]


def test_run_disabled_by_default(locked_server):
    status, body = _post(locked_server, "/api/pipeline?action=run", GOOD)
    assert status == 403
    assert any("--allow-run" in e for e in body["errors"])


def test_dryrun_requires_token(locked_server):
    status, body = _post(locked_server, "/api/pipeline?action=dryrun", GOOD)
    assert status == 401
    req = urllib.request.Request(
        f"http://127.0.0.1:{locked_server.port}/api/pipeline?action=dryrun",
        data=GOOD.encode(), method="POST",
        headers={"Authorization": "Bearer s3cret"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200


def test_factory_allowlist(server):
    """A *Factory dotted path outside pipeline_spark.* is rejected before
    planning — resolve_factory would import and call it."""
    cfg = """
sources:
  - name: sp
    module: spanner
    parameters:
      clientFactory: "os.path:join"
      instanceId: i
      databaseId: d
"""
    status, body = _post(server, "/api/pipeline?action=dryrun", cfg)
    assert status == 403
    assert any("os.path:join" in e for e in body["errors"])
    # validate (static, no execution) still answers
    status, _ = _post(server, "/api/pipeline?action=validate", cfg)
    assert status == 200


def test_run_with_template_args(server, spark):
    cfg = GOOD.replace("elements: [{a: 1}, {a: 2}]", "elements: [{a: {{ args.start }} }]").replace(
        "table: server_run_out", "table: server_args_out"
    )
    status, body = _post(server, "/api/pipeline?action=run&args.start=41", cfg)
    assert status == 200, body
    assert [r["b"] for r in spark.table("server_args_out").collect()] == [82]
