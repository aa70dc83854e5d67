"""Generative windowed-aggregation fuzz vs DuckDB (r14): random window
strategies (fixed / sliding / calendar-day) x random aggregations x the
timestampCombiner knob (none / end_of_window / earliest / latest), each
config compiled through the REAL config path (parse_config +
run_pipeline) and cross-checked against an independently generated
DuckDB SQL translation over the same events parquet.

The SQL generator maps the window semantics on its own: fixed windows =
epoch-floor bucketing, sliding = a generate_series cross join producing
the S/P windows per event Spark's F.window assigns, calendar-day =
date_trunc; combiners = min/max(ts) or window start + size - 1ms.  A
systematic compiler bug in the window-key or hidden-aggregate plumbing
can't hide in shared code.
"""

from __future__ import annotations

import json
import math
import random

import duckdb
import pytest

pytestmark = pytest.mark.slow  # r16: fast-tier default deselects (see pyproject)

EVENTS = "/root/testdata/sf0.001/events.parquet"

AGG_OPS = [
    ("count", None),
    ("sum", "value"),
    ("min", "value"),
    ("max", "value"),
    ("avg", "value"),
    ("sum", "event_id"),
    ("min", "event_id"),
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def _rows_close(got, want) -> bool:
    """Order-insensitive row-set equality with float tolerance: double
    sums accumulate in engine-specific orders, so a value sitting ON a
    round-4 boundary can differ by one ULP of the rounded digit."""
    if len(got) != len(want):
        return False
    for g, w in zip(got, want):
        if len(g) != len(w):
            return False
        for a, b in zip(g, w):
            if a == b:
                continue
            try:
                if math.isclose(float(a), float(b), abs_tol=2e-4):
                    continue
            except (TypeError, ValueError):
                pass
            return False
    return True


def _gen_window(rng: random.Random):
    """Returns (window_cfg, wstart_sql, wsize_sec | None, joins_sql)."""
    r = rng.random()
    if r < 0.45:
        size = rng.choice([60, 300, 900, 3600])
        cfg = {"type": "fixed", "size": size, "unit": "second"}
        wstart = (
            f"CAST(to_timestamp(floor(epoch(ts) / {size}) * {size}) "
            "AS TIMESTAMP)"
        )
        return cfg, wstart, size, ""
    if r < 0.8:
        period = rng.choice([300, 600])
        size = period * rng.choice([2, 3])
        cfg = {"type": "sliding", "size": size, "period": period,
               "unit": "second"}
        # Spark assigns each event to exactly size/period windows whose
        # starts are floor(epoch/period)*period - j*period
        wstart = (
            f"CAST(to_timestamp(floor(epoch(ts) / {period}) * {period} "
            f"- g.j * {period}) AS TIMESTAMP)"
        )
        joins = (
            f", generate_series(0, {size // period - 1}) AS g(j)"
        )
        return cfg, wstart, size, joins
    cfg = {"type": "calendar", "unit": "day"}
    return cfg, "CAST(date_trunc('day', ts) AS TIMESTAMP)", None, ""


def _run_one(spark, seed: int):
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    rng = random.Random(77_000 + seed)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    window_cfg, wstart_sql, wsize, joins_sql = _gen_window(rng)
    combiner = rng.choice([None, "end_of_window", "earliest", "latest"])
    if combiner:
        window_cfg = {**window_cfg, "timestampCombiner": combiner}
    group = rng.random() < 0.7  # else window-only grouping

    n_aggs = rng.randint(1, 3)
    aggs_cfg, aggs_sql = [], []
    for i, (op, field) in enumerate(rng.sample(AGG_OPS, n_aggs)):
        name = f"a{i}"
        spec = {"name": name, "op": op}
        if field:
            spec["field"] = field
        aggs_cfg.append(spec)
        if op == "count":
            aggs_sql.append(f"count(*) AS {name}")
        elif op in ("sum", "avg"):
            aggs_sql.append(f"round({op}({field}), 4) AS {name}")
        else:
            aggs_sql.append(f"round({op}({field}), 4) AS {name}")

    select_shape = [
        {"name": "wstart", "field": "window.start"}
        if window_cfg["type"] != "calendar"
        else {"name": "wstart", "field": "window"},
    ]
    if group:
        select_shape.append({"name": "event_type"})
    if combiner:
        select_shape.append({"name": "cts", "field": "ts"})
    select_shape += [{"name": s["name"]} for s in aggs_cfg]

    cfg = {
        "sources": [{
            "name": "events", "module": "storage",
            "parameters": {"format": "parquet", "input": EVENTS},
        }],
        "transforms": [
            {"name": "agg", "module": "aggregation", "inputs": ["events"],
             "timestampAttribute": "ts",
             "strategy": {"window": window_cfg},
             "parameters": {
                 "groupFields": ["event_type"] if group else [],
                 "aggregations": aggs_cfg,
             }},
            {"name": "shaped", "module": "select", "inputs": ["agg"],
             "parameters": {"select": select_shape}},
        ],
    }
    out = run_pipeline(spark, parse_config(json.dumps(cfg)))["shaped"]
    # round the aggregate columns on the Spark side too
    from pyspark.sql import functions as F

    for s in aggs_cfg:
        out = out.withColumn(s["name"], F.round(F.col(s["name"]), 4))
    got = sorted(
        tuple(_norm(r[c]) for c in out.columns) for r in out.collect()
    )

    # independent DuckDB translation
    if combiner == "earliest":
        cts_sql = "min(ts) AS cts, "
    elif combiner == "latest":
        cts_sql = "max(ts) AS cts, "
    elif combiner == "end_of_window":
        if window_cfg["type"] == "calendar":
            cts_sql = (
                "CAST(date_trunc('day', ts) + INTERVAL 1 DAY "
                "- INTERVAL 1 MILLISECOND AS TIMESTAMP) AS cts, "
            )
        else:
            cts_sql = (
                f"{wstart_sql} + INTERVAL {wsize} SECOND "
                "- INTERVAL 1 MILLISECOND AS cts, "
            )
    else:
        cts_sql = ""
    group_cols = ["wstart"] + (["event_type"] if group else [])
    if combiner == "end_of_window":
        group_cols.append("cts")
    sql = (
        f"SELECT {wstart_sql} AS wstart, "
        + ("event_type, " if group else "")
        + cts_sql
        + ", ".join(aggs_sql)
        + f" FROM '{EVENTS}'{joins_sql} GROUP BY "
        + ", ".join(str(i + 1) for i in range(len(group_cols)))
    )
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    names = [d[0] for d in con.execute(sql).description]
    order = [names.index(c) for c in out.columns]
    want = sorted(tuple(_norm(row[i]) for i in order) for row in rows)
    assert _rows_close(got, want), (
        f"seed {seed} window={window_cfg} combiner={combiner} "
        f"group={group}: {len(got)} vs {len(want)} rows\nSQL: {sql}\n"
        f"first got:  {got[:2]}\nfirst want: {want[:2]}"
    )


@pytest.mark.parametrize("chunk", range(2))
def test_window_fuzz_vs_duckdb(spark, chunk):
    for seed in range(chunk * 20, (chunk + 1) * 20):
        _run_one(spark, seed)


def _run_session_one(spark, seed: int):
    """Session windows x combiner: Spark's session_window(start=min ts,
    end=max ts + gap) cross-checked against DuckDB's lag-gap-cumsum
    session assignment — an independent derivation of the same merge
    semantics."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline
    from pyspark.sql import functions as F

    rng = random.Random(88_000 + seed)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    gap = rng.choice([120, 300, 900])
    combiner = rng.choice([None, "end_of_window", "earliest", "latest"])
    window_cfg = {"type": "session", "gap": gap, "unit": "second"}
    if combiner:
        window_cfg["timestampCombiner"] = combiner

    n_aggs = rng.randint(1, 2)
    aggs_cfg, aggs_sql = [], []
    for i, (op, field) in enumerate(rng.sample(AGG_OPS, n_aggs)):
        name = f"a{i}"
        spec = {"name": name, "op": op}
        if field:
            spec["field"] = field
        aggs_cfg.append(spec)
        aggs_sql.append(
            f"count(*) AS {name}" if op == "count"
            else f"round({op}({field}), 4) AS {name}"
        )

    select_shape = [
        {"name": "wstart", "field": "window.start"},
        {"name": "wend", "field": "window.end"},
        {"name": "event_type"},
    ]
    if combiner:
        select_shape.append({"name": "cts", "field": "ts"})
    select_shape += [{"name": s["name"]} for s in aggs_cfg]

    cfg = {
        "sources": [{
            "name": "events", "module": "storage",
            "parameters": {"format": "parquet", "input": EVENTS},
        }],
        "transforms": [
            {"name": "agg", "module": "aggregation", "inputs": ["events"],
             "timestampAttribute": "ts",
             "strategy": {"window": window_cfg},
             "parameters": {"groupFields": ["event_type"],
                            "aggregations": aggs_cfg}},
            {"name": "shaped", "module": "select", "inputs": ["agg"],
             "parameters": {"select": select_shape}},
        ],
    }
    out = run_pipeline(spark, parse_config(json.dumps(cfg)))["shaped"]
    for s in aggs_cfg:
        out = out.withColumn(s["name"], F.round(F.col(s["name"]), 4))
    got = sorted(
        tuple(_norm(r[c]) for c in out.columns) for r in out.collect()
    )

    if combiner == "earliest":
        cts = "min(ts) AS cts, "
    elif combiner == "latest":
        cts = "max(ts) AS cts, "
    elif combiner == "end_of_window":
        cts = (f"max(ts) + INTERVAL {gap} SECOND "
               "- INTERVAL 1 MILLISECOND AS cts, ")
    else:
        cts = ""
    sql = f"""
WITH t AS (
  SELECT event_type, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL {gap} SECOND
              THEN 1 ELSE 0 END AS brk
  FROM '{EVENTS}'
  WINDOW w AS (PARTITION BY event_type ORDER BY ts)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY event_type ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM t
)
SELECT min(ts) AS wstart,
       max(ts) + INTERVAL {gap} SECOND AS wend,
       event_type, {cts}{", ".join(aggs_sql)}
FROM s GROUP BY event_type, sess
"""
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    names = [d[0] for d in con.execute(sql).description]
    order = [names.index(c) for c in out.columns]
    want = sorted(tuple(_norm(row[i]) for i in order) for row in rows)
    assert _rows_close(got, want), (
        f"seed {seed} gap={gap} combiner={combiner}: "
        f"{len(got)} vs {len(want)} rows\n"
        f"first got:  {got[:2]}\nfirst want: {want[:2]}"
    )


def test_session_window_fuzz_vs_duckdb(spark):
    for seed in range(15):
        _run_session_one(spark, seed)


def _run_two_stage_one(spark, seed: int):
    """The two-stage pattern generatively: stage 1 = fixed windows with a
    random combiner, stage 2 re-windows the combined timestamp at a
    coarser random size.  DuckDB translates both stages independently:
    bucket ts -> derive cts per combiner -> bucket cts."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline
    from pyspark.sql import functions as F

    rng = random.Random(99_000 + seed)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    s1 = rng.choice([300, 900, 1800])
    s2 = s1 * rng.choice([2, 4])
    combiner = rng.choice(["end_of_window", "earliest", "latest"])

    cfg = {
        "sources": [{
            "name": "events", "module": "storage",
            "parameters": {"format": "parquet", "input": EVENTS},
        }],
        "transforms": [
            {"name": "agg1", "module": "aggregation", "inputs": ["events"],
             "timestampAttribute": "ts",
             "strategy": {"window": {
                 "type": "fixed", "size": s1, "unit": "second",
                 "timestampCombiner": combiner}},
             "parameters": {
                 "groupFields": ["event_type"],
                 "aggregations": [
                     {"name": "v", "op": "sum", "field": "value"}],
             }},
            {"name": "agg2", "module": "aggregation", "inputs": ["agg1"],
             "timestampAttribute": "ts",
             "strategy": {"window": {
                 "type": "fixed", "size": s2, "unit": "second"}},
             "parameters": {
                 "groupFields": ["event_type"],
                 "aggregations": [
                     {"name": "n_windows", "op": "count"},
                     {"name": "total", "op": "sum", "field": "v"}],
             }},
            {"name": "shaped", "module": "select", "inputs": ["agg2"],
             "parameters": {"select": [
                 {"name": "wstart", "field": "window.start"},
                 {"name": "event_type"},
                 {"name": "n_windows"},
                 {"name": "total"},
             ]}},
        ],
    }
    out = run_pipeline(spark, parse_config(json.dumps(cfg)))["shaped"]
    out = out.withColumn("total", F.round("total", 4))
    got = sorted(
        tuple(_norm(r[c]) for c in out.columns) for r in out.collect()
    )

    w1 = f"floor(epoch(ts) / {s1}) * {s1}"
    if combiner == "earliest":
        cts = "epoch(min(ts))"
    elif combiner == "latest":
        cts = "epoch(max(ts))"
    else:
        cts = f"{w1} + {s1} - 0.001"
    sql = f"""
WITH s1 AS (
  SELECT event_type, {w1} AS w1, sum(value) AS v, {cts} AS cts
  FROM '{EVENTS}' GROUP BY event_type, {w1}
)
SELECT CAST(to_timestamp(floor(cts / {s2}) * {s2}) AS TIMESTAMP) AS wstart,
       event_type, count(*) AS n_windows, round(sum(v), 4) AS total
FROM s1 GROUP BY 1, 2
"""
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    names = [d[0] for d in con.execute(sql).description]
    order = [names.index(c) for c in out.columns]
    want = sorted(tuple(_norm(row[i]) for i in order) for row in rows)
    assert _rows_close(got, want), (
        f"seed {seed} s1={s1} s2={s2} combiner={combiner}: "
        f"{len(got)} vs {len(want)} rows\n"
        f"first got:  {got[:2]}\nfirst want: {want[:2]}"
    )


def test_two_stage_rewindow_fuzz_vs_duckdb(spark):
    for seed in range(15):
        _run_two_stage_one(spark, seed)
