"""Generative stateful-select fuzz vs DuckDB window functions (r13,
extending VERDICT r12 stretch #8 from stateless configs to the §2.4
stateful surface).

Random stateful select configs — running aggregates over count/duration
frames with offsets and conditions, lag expressions, lead, navigation —
compile through the real config path (select module, groupFields,
timestampAttribute) and are cross-checked against independently
generated SQL window functions on the same parquet fixture.

The fixture has UNIQUE (k, ts) pairs so ROWS frames and navigation are
deterministic; RANGE frames get deliberately irregular gaps (including
same-second... no: unique seconds, but uneven spacing) so duration
windows cover varying row counts.
"""

from __future__ import annotations

import datetime as dt
import json
import math
import random

import duckdb
import pytest

pytestmark = pytest.mark.slow  # r16: fast-tier default deselects (see pyproject)


@pytest.fixture(scope="module")
def fixture_parquet(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(777)
    rows = []
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    for k in ("ka", "kb", "kc"):
        t = 0
        for i in range(100):
            t += rng.randint(1, 40)  # irregular gaps, strictly increasing
            rows.append((
                k,
                round(rng.uniform(-50, 50), 3),
                rng.randint(-5, 99),
                base + dt.timedelta(seconds=t),
            ))
    path = str(tmp_path_factory.mktemp("sfuzz") / "events.parquet")
    pq.write_table(pa.table({
        "k": pa.array([r[0] for r in rows]),
        "v": pa.array([r[1] for r in rows], pa.float64()),
        "w": pa.array([r[2] for r in rows], pa.int64()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
    }), path)
    return path


_W = "PARTITION BY k ORDER BY ts"
_WE = "PARTITION BY k ORDER BY epoch(ts)"


def _frame_sql(rng: random.Random):
    """Random range spec -> (config_fragment, sql_frame, over_epoch)."""
    r = rng.random()
    if r < 0.3:
        return None, "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW", False
    if r < 0.7:
        n = rng.randint(1, 6)
        off = rng.choice([0, 0, 1, 2])
        spec = {"count": n}
        if off:
            spec["offset"] = off
        return (spec,
                f"ROWS BETWEEN {off + n - 1} PRECEDING AND {off} PRECEDING",
                False)
    d = rng.randint(5, 120)
    off = rng.choice([0, 0, 1, 3])
    spec = {"duration": d, "unit": "second"}
    if off:
        spec["offset"] = off
    # engine: rangeBetween(-(D+off-1), -off) over unix seconds, both
    # bounds INCLUSIVE.  DuckDB 1.0's RANGE end bound "k PRECEDING" is
    # inclusive for k>=1 but "0 PRECEDING" drops the current peer group
    # (probed) — spell offset 0 as CURRENT ROW
    end = "CURRENT ROW" if off == 0 else f"{off} PRECEDING"
    return (spec,
            f"RANGE BETWEEN {d + off - 1} PRECEDING AND {end}",
            True)


def _gen_stateful(rng: random.Random, idx: int):
    """One random stateful select -> (config, sql_item, kind)."""
    name = f"s{idx}"
    pick = rng.random()
    if pick < 0.12:  # navigation
        fn = rng.choice(["row_number", "rank", "dense_rank"])
        return ({"name": name, "func": fn},
                f"{fn}() OVER ({_W}) AS {name}", "long")
    if pick < 0.24:  # lead
        fld = rng.choice(["v", "w"])
        k = rng.randint(1, 3)
        kind = "double" if fld == "v" else "long"
        return ({"name": name, "func": "lead", "field": fld, "offset": k},
                f"lead({fld}, {k}) OVER ({_W}) AS {name}", kind)
    if pick < 0.40:  # lag expression over lagged doubles
        fld = rng.choice(["v", "w"])
        k1 = rng.randint(1, 3)
        if rng.random() < 0.5:
            expr = f"{fld}[{k1}]"
            sql = f"lag(CAST({fld} AS DOUBLE), {k1}) OVER ({_W})"
        else:
            op = rng.choice(["+", "-", "*"])
            expr = f"{fld}[{k1}] {op} {fld}[0]"
            sql = (f"(lag(CAST({fld} AS DOUBLE), {k1}) OVER ({_W})"
                   f" {op} CAST({fld} AS DOUBLE))")
        return ({"name": name, "func": "lag", "expression": expr},
                f"{sql} AS {name}", "double")
    # running aggregate over a frame
    op = rng.choice(["count", "sum", "max", "min", "avg"])
    fld = rng.choice(["v", "w"])
    spec, frame, over_epoch = _frame_sql(rng)
    cfg = {"name": name, "func": op, "field": fld}
    if spec:
        cfg["range"] = spec
    w = f"{_WE} {frame}" if over_epoch else f"{_W} {frame}"
    cond_sql = None
    if rng.random() < 0.3:
        cfld = rng.choice(["v", "w"])
        cop = rng.choice([">", ">=", "<", "<="])
        cv = (round(rng.uniform(-40, 40), 1) if cfld == "v"
              else rng.randint(-3, 80))
        cfg["condition"] = {"key": cfld, "op": cop, "value": cv}
        cond_sql = f"{cfld} {cop} {cv!r}"
    src = f"CASE WHEN {cond_sql} THEN {fld} END" if cond_sql else fld
    if op == "count":
        call = (f"count(CASE WHEN {cond_sql} THEN 1 END)" if cond_sql
                else "count(*)")
        kind = "long"
    else:
        call = f"{op}({src})"
        kind = ("double" if fld == "v" or op == "avg" else "long")
    body = f"{call} OVER ({w})"
    if op == "avg":
        body = f"CAST({body} AS DOUBLE)"
    if op == "sum" and fld == "w":
        body = f"CAST({body} AS BIGINT)"
    return cfg, f"{body} AS {name}", kind


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v  # floats compare with tolerance in _rows_equal
    if v is None:
        return "<null>"
    return str(v)


def _rows_equal(a, b) -> bool:
    """Pairwise with float tolerance: window aggs accumulate in
    different orders, so decimal-string rounding hits knife-edge
    half-way cases no fixed precision survives."""
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif x != y:
                return False
    return True


def _run_one(spark, path: str, seed: int):
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    rng = random.Random(seed)
    selects = [{"name": "k"}, {"name": "ts"}]
    sql_items = ["k", "ts"]
    for i in range(rng.randint(2, 5)):
        cfg, item, _k = _gen_stateful(rng, i)
        selects.append(cfg)
        sql_items.append(item)
    pipeline = {
        "sources": [{
            "name": "ev", "module": "storage",
            "parameters": {"format": "parquet", "input": path},
        }],
        "transforms": [{
            "name": "st", "module": "select", "inputs": ["ev"],
            "timestampAttribute": "ts",
            "parameters": {"groupFields": ["k"], "select": selects},
        }],
    }
    got_df = run_pipeline(spark, parse_config(json.dumps(pipeline)))["st"]
    cols = got_df.columns
    # (k, ts) is unique per row — a total order without touching the
    # float columns (which mix with "<null>" markers)
    key = lambda t: (t[0], t[1])  # noqa: E731
    got = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in got_df.collect()),
        key=key)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW ev AS SELECT * FROM '{path}'")
    sql = "SELECT {} FROM ev".format(", ".join(sql_items))
    cur = con.execute(sql)
    want_cols = [d[0] for d in cur.description]
    assert want_cols == cols, (seed, cols, want_cols)
    want = sorted(
        (tuple(_norm(x) for x in row) for row in cur.fetchall()), key=key)
    assert _rows_equal(got, want), (
        f"seed {seed}\nSQL: {sql}\n"
        f"diff={[ (ra, rb) for ra, rb in zip(got, want) if not _rows_equal([ra],[rb]) ][:3]}")


@pytest.mark.parametrize("chunk", range(4))
def test_stateful_fuzz_vs_duckdb(spark, fixture_parquet, chunk):
    for seed in range(chunk * 25, (chunk + 1) * 25):
        _run_one(spark, fixture_parquet, seed)
