"""Generative config fuzz vs DuckDB (r13, VERDICT r12 stretch #8).

Random filter → select → aggregation pipeline configs are compiled by
the engine (the real config path: parse_config + run_pipeline) and
cross-checked against an INDEPENDENTLY generated ANSI-SQL translation
run by DuckDB on the same parquet.  The SQL generator walks the same
config dict but maps each construct to SQL on its own — a systematic
compiler bug can't hide in shared code (the expression property suite's
protocol, extended from one function to whole configs).

Scope is the oracle-able core: every filter op (= != > >= < <= in
"not in" match, null literals, and/or trees, expression leaves) and the
deterministic select functions (pass/rename/cast/constant/expression/
concat/nullif/switch — including sequential binding: later functions
referencing earlier outputs, shadowing physical columns), then
optionally aggregation (count/sum/min/max/avg, conditional aggs,
group-by on a select output).  240 seeded configs (8 chunks x 30).
"""

from __future__ import annotations

import json
import math
import random

import duckdb
import pytest

pytestmark = pytest.mark.slow  # r16: fast-tier default deselects (see pyproject)

PART = "/root/testdata/sf0.001/part.parquet"

# (name, kind) — the physical schema the generator draws from
PHYS = [
    ("p_partkey", "long"),
    ("p_name", "string"),
    ("p_brand", "string"),
    ("p_type", "string"),
    ("p_size", "long"),
    ("p_retailprice", "double"),
]
STR_COLS = [c for c, k in PHYS if k == "string"]
NUM_COLS = [c for c, k in PHYS if k in ("long", "double")]
LONG_COLS = [c for c, k in PHYS if k == "long"]

_con = duckdb.connect()
_DOMAIN = {
    c: [r[0] for r in _con.execute(
        f"SELECT DISTINCT {c} FROM '{PART}' ORDER BY 1 LIMIT 40"
    ).fetchall()]
    for c, _ in PHYS
}


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


# ---------------------------------------------------------------- filter

def _gen_value(rng: random.Random, col: str, kind: str):
    dom = _DOMAIN[col]
    if rng.random() < 0.7 and dom:
        return rng.choice(dom)
    if kind == "long":
        return rng.randint(-3, 250)
    if kind == "double":
        return round(rng.uniform(800.0, 2200.0), 2)
    return rng.choice(["NOPE", "Brand#99", "zzz", ""])


def _gen_leaf(rng: random.Random):
    """Returns (leaf_config, sql_fn) where sql_fn(resolve) renders the
    leaf against a name->sql-expression resolver."""
    col, kind = rng.choice(PHYS)
    r = rng.random()
    if r < 0.08:  # expression leaf (double-compared, Filter.java:419)
        a, b = rng.sample(NUM_COLS, 2)
        op = rng.choice([">", ">=", "<", "<="])
        v = round(rng.uniform(-100, 5000), 2)
        cfg = {"expression": f"{a} + {b}", "op": op, "value": v}

        def sql(res):
            return (f"(CAST(({res(a)} + {res(b)}) AS DOUBLE) {op} "
                    f"{_sql_lit(float(v))})")

        return cfg, sql
    if r < 0.16:  # null literal: = -> IS NULL, != -> IS NOT NULL
        op = rng.choice(["=", "!="])
        cfg = {"key": col, "op": op, "value": None}

        def sql(res, col=col, op=op):
            return (f"({res(col)} IS NULL)" if op == "="
                    else f"({res(col)} IS NOT NULL)")

        return cfg, sql
    if r < 0.30 and kind in ("long", "string"):
        # in / not in: reference compares toString()s; doubles excluded
        # (Java Double.toString vs SQL varchar render diverge)
        op = rng.choice(["in", "not in"])
        vals = [_gen_value(rng, col, kind) for _ in range(rng.randint(1, 4))]
        cfg = {"key": col, "op": op, "value": vals}
        strs = [str(v) for v in vals]

        def sql(res, col=col, op=op, strs=strs):
            lst = ", ".join(_sql_lit(s) for s in strs)
            base = f"CAST({res(col)} AS VARCHAR) IN ({lst})"
            if op == "not in":
                return f"(({res(col)} IS NOT NULL) AND NOT ({base}))"
            return f"({base})"

        return cfg, sql
    if r < 0.38 and kind == "string":
        # match: unanchored regex find (rlike / regexp_matches)
        v = rng.choice(_DOMAIN[col]) or "x"
        i = rng.randrange(len(v))
        pat = v[i:i + rng.randint(2, 6)] or v[:2]
        pat = "".join(ch for ch in pat if ch.isalnum() or ch in "# ") or "a"
        cfg = {"key": col, "op": "match", "value": pat}

        def sql(res, col=col, pat=pat):
            return f"regexp_matches(CAST({res(col)} AS VARCHAR), {_sql_lit(pat)})"

        return cfg, sql
    op = rng.choice(["=", "!=", ">", ">=", "<", "<="])
    v = _gen_value(rng, col, kind)
    cfg = {"key": col, "op": op, "value": v}
    sqlop = {"=": "=", "!=": "<>", ">": ">", ">=": ">=",
             "<": "<", "<=": "<="}[op]

    def sql(res, col=col, sqlop=sqlop, v=v):
        return f"({res(col)} {sqlop} {_sql_lit(v)})"

    return cfg, sql


def _gen_condition(rng: random.Random, depth: int = 0):
    """Random and/or tree; returns (config_node, sql_fn)."""
    if depth >= 2 or rng.random() < 0.5:
        return _gen_leaf(rng)
    kids = [_gen_condition(rng, depth + 1) for _ in range(rng.randint(2, 3))]
    kind = rng.choice(["and", "or"])
    cfg = {kind: [c for c, _ in kids]}
    glue = " AND " if kind == "and" else " OR "

    def sql(res, kids=kids, glue=glue):
        # engine's `or` coalesces children to FALSE before OR-ing; for
        # row filtering 3-valued SQL OR is equivalent (NULL drops)
        return "(" + glue.join(
            f"COALESCE({s(res)}, FALSE)" for _, s in kids) + ")"

    return cfg, sql


# ---------------------------------------------------------------- select

def _gen_selects(rng: random.Random):
    """Random select list with sequential binding.  Returns
    (select_configs, out_specs) where out_specs = [(name, sql_expr,
    kind)]; sql exprs are fully inlined (bound references substituted),
    which IS the reference's sequential-binding semantics."""
    env: dict[str, tuple[str, str]] = {
        c: (c, k) for c, k in PHYS
    }  # name -> (sql_expr, kind)

    def res(name: str) -> str:
        return env[name][0]

    cfgs: list[dict] = []
    outs: list[tuple[str, str, str]] = []

    def add(name, cfg, sql_expr, kind):
        cfgs.append(cfg)
        env[name] = (sql_expr, kind)
        outs.append((name, sql_expr, kind))

    # always keep a stable key column for deterministic comparison
    add("p_partkey", {"name": "p_partkey"}, "p_partkey", "long")

    n_funcs = rng.randint(2, 5)
    for i in range(n_funcs):
        name = f"c{i}"
        kindpick = rng.random()
        bound_nums = [n for n, (_, k) in env.items() if k in ("long", "double")]
        bound_strs = [n for n, (_, k) in env.items() if k == "string"]
        if kindpick < 0.14:  # rename (maybe of a bound output)
            src = rng.choice(list(env))
            e, k = env[src]
            add(name, {"name": name, "field": src, "func": "rename"}, e, k)
        elif kindpick < 0.26:  # cast long->double / long->string
            src = rng.choice([n for n in bound_nums
                              if env[n][1] == "long"] or ["p_size"])
            e, _ = env[src]
            if rng.random() < 0.5:
                add(name, {"name": name, "field": src, "type": "float64"},
                    f"CAST({e} AS DOUBLE)", "double")
            else:
                add(name, {"name": name, "field": src, "type": "string"},
                    f"CAST({e} AS VARCHAR)", "string")
        elif kindpick < 0.36:  # constant
            c = rng.choice([
                (rng.randint(-5, 99), "int64", "long"),
                (round(rng.uniform(0, 9), 3), "float64", "double"),
                (rng.choice(["alpha", "beta", ""]), "string", "string"),
            ])
            v, t, k = c
            lit = (f"CAST({_sql_lit(float(v))} AS DOUBLE)" if k == "double"
                   else f"CAST({_sql_lit(v)} AS BIGINT)" if k == "long"
                   else _sql_lit(v))
            add(name, {"name": name, "value": v, "type": t}, lit, k)
        elif kindpick < 0.58:  # expression over bound numerics (double)
            a, b = rng.choice(bound_nums), rng.choice(bound_nums)
            op = rng.choice(["+", "-", "*"])
            expr = f"{a} {op} {b}"
            sql = (f"CAST(({env[a][0]} {op} {env[b][0]}) AS DOUBLE)")
            add(name, {"name": name, "func": "expression",
                       "expression": expr}, sql, "double")
        elif kindpick < 0.70:  # concat over strings + longs
            pool = bound_strs + [n for n in bound_nums
                                 if env[n][1] == "long"]
            fields = rng.sample(pool, min(len(pool), rng.randint(2, 3)))
            delim = rng.choice(["", "|", "-"])
            sql = "concat_ws({}, {})".format(
                _sql_lit(delim),
                ", ".join(f"CAST({env[f][0]} AS VARCHAR)" for f in fields),
            )
            add(name, {"name": name, "func": "concat", "fields": fields,
                       "delimiter": delim}, sql, "string")
        elif kindpick < 0.86:  # nullif — condition may see bound outputs
            src = rng.choice(list(env))
            e, k = env[src]
            cond_cfg, cond_sql = _gen_leaf(rng)
            # leaf keys must resolve in env (they always do: leaves draw
            # from PHYS and physical names stay bound unless shadowed —
            # shadowing substitutes the bound expr, which is the point)
            add(name, {"name": name, "func": "nullif", "field": src,
                       "condition": cond_cfg},
                f"(CASE WHEN COALESCE({cond_sql(res)}, FALSE) "
                f"THEN NULL ELSE {e} END)", k)
        else:  # switch
            cases = []
            sql_cases = []
            for _ in range(rng.randint(1, 2)):
                cond_cfg, cond_sql = _gen_leaf(rng)
                then = rng.choice(["hit", "low", "hi"])
                cases.append({"when": cond_cfg, "then": then})
                sql_cases.append(
                    f"WHEN COALESCE({cond_sql(res)}, FALSE) "
                    f"THEN {_sql_lit(then)}")
            default = rng.choice(["other", None])
            add(name, {"name": name, "func": "switch", "cases": cases,
                       "default": default},
                "(CASE " + " ".join(sql_cases)
                + f" ELSE {_sql_lit(default)} END)", "string")
    return cfgs, outs


# ----------------------------------------------------------- aggregation

_AGG_OPS = ["count", "sum", "min", "max", "avg"]


def _gen_agg(rng: random.Random, outs):
    """Random aggregation over the select stage's outputs.  Returns
    (agg_params, sql_select_list, group_names)."""
    str_outs = [o for o in outs if o[2] == "string"]
    num_outs = [o for o in outs if o[2] in ("long", "double")]
    group = rng.sample(str_outs, min(len(str_outs), rng.randint(1, 2)))
    if not group or not num_outs:
        return None
    aggs = []
    sql_items = [f"{n}" for n, _, _ in group]
    for i in range(rng.randint(1, 3)):
        op = rng.choice(_AGG_OPS)
        name = f"a{i}"
        tgt = rng.choice(num_outs)
        cfg = {"name": name, "op": op}
        cond_sql = None
        if op != "count" or rng.random() < 0.5:
            cfg["field"] = tgt[0]
        if rng.random() < 0.3:
            # conditions resolve against the aggregation INPUT (the
            # select output schema), so leaves draw from outs only
            cn, ce, ck = rng.choice(num_outs + str_outs)
            cop = rng.choice(["=", "!=", ">", ">=", "<", "<="]
                             if ck != "string" else ["=", "!="])
            v = (rng.choice(["alpha", "hit", "other", "Brand#21", ""])
                 if ck == "string"
                 else rng.randint(-3, 250) if ck == "long"
                 else round(rng.uniform(0, 4000), 2))
            cfg["condition"] = {"key": cn, "op": cop, "value": v}
            sqlop = "<>" if cop == "!=" else cop
            cond_sql = f"({cn} {sqlop} {_sql_lit(v)})"
        col = tgt[0]
        if op == "count":
            # engine: condition -> rows matching; field -> non-null
            # count; bare -> count(*)  (compilers/aggregation.py:73-80)
            if cond_sql:
                body = (f"COUNT(CASE WHEN COALESCE({cond_sql}, FALSE) "
                        f"THEN 1 END)")
            elif "field" in cfg:
                body = f"COUNT({col})"
            else:
                body = "COUNT(*)"
        else:
            src = (f"CASE WHEN COALESCE({cond_sql}, FALSE) THEN {col} END"
                   if cond_sql else col)
            fn = {"sum": "SUM", "min": "MIN", "max": "MAX",
                  "avg": "AVG"}[op]
            body = f"{fn}({src})"
            if op in ("sum",) and tgt[2] == "long":
                body = f"CAST({body} AS BIGINT)"
            if op in ("sum", "avg") and (tgt[2] == "double" or op == "avg"):
                body = f"CAST({body} AS DOUBLE)"
        sql_items.append(f"{body} AS {name}")
        aggs.append(cfg)
    params = {"groupFields": [n for n, _, _ in group],
              "aggregations": aggs}
    return params, sql_items, [n for n, _, _ in group]


# ------------------------------------------------------------- the check

def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if v is None:
        return "<null>"
    return str(v)


def _run_one(spark, seed: int):
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    rng = random.Random(seed)
    transforms = []
    where_sql = None
    if rng.random() < 0.8:
        cond_cfg, cond_sql = _gen_condition(rng)
        transforms.append({
            "name": "flt", "module": "filter", "inputs": ["part"],
            "parameters": {"filters": cond_cfg},
        })
        where_sql = cond_sql(lambda nm: nm)
    sel_cfgs, outs = _gen_selects(rng)
    transforms.append({
        "name": "sel", "module": "select",
        "inputs": [transforms[-1]["name"] if transforms else "part"],
        "parameters": {"select": sel_cfgs},
    })
    inner = "SELECT {} FROM part{}".format(
        ", ".join(f"{e} AS {n}" for n, e, _ in outs),
        f" WHERE {where_sql}" if where_sql else "",
    )
    out_name = "sel"
    agg = _gen_agg(rng, outs) if rng.random() < 0.5 else None
    if agg:
        params, sql_items, group = agg
        transforms.append({
            "name": "agg", "module": "aggregation", "inputs": ["sel"],
            "parameters": params,
        })
        out_name = "agg"
        sql = "SELECT {} FROM ({}) GROUP BY {}".format(
            ", ".join(sql_items), inner, ", ".join(group))
    else:
        sql = inner

    cfg = {
        "sources": [{
            "name": "part", "module": "storage",
            "parameters": {"format": "parquet", "input": PART},
        }],
        "transforms": transforms,
    }
    got_df = run_pipeline(spark, parse_config(json.dumps(cfg)))[out_name]
    got_cols = got_df.columns
    got = [tuple(r[c] for c in got_cols) for r in got_df.collect()]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{PART}'")
    cur = con.execute(sql)
    want_cols = [d[0] for d in cur.description]
    want = cur.fetchall()

    assert sorted(got_cols) == sorted(want_cols), (
        f"seed {seed}: columns {got_cols} vs {want_cols}\nSQL: {sql}")
    order = {c: i for i, c in enumerate(got_cols)}
    w_idx = [want_cols.index(c) for c in got_cols]
    g_norm = sorted(tuple(_norm_cell(x) for x in row) for row in got)
    w_norm = sorted(
        tuple(_norm_cell(row[i]) for i in w_idx) for row in want)
    assert g_norm == w_norm, (
        f"seed {seed}: {len(g_norm)} vs {len(w_norm)} rows\nSQL: {sql}\n"
        f"engine[:3]={g_norm[:3]}\noracle[:3]={w_norm[:3]}\n"
        f"only_engine={[r for r in g_norm if r not in w_norm][:3]}\n"
        f"only_oracle={[r for r in w_norm if r not in g_norm][:3]}")


CHUNK = 30


@pytest.mark.parametrize("chunk", range(8))
def test_config_fuzz_vs_duckdb(spark, chunk):
    for seed in range(chunk * CHUNK, (chunk + 1) * CHUNK):
        _run_one(spark, seed)


def _run_partition_fuzz(spark, seed: int):
    """Random partition module config: first-match (exclusive) or
    multi-match routing over random condition trees, plus the excluded
    output — each output cross-checked against its own SQL predicate."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    rng = random.Random(10_000 + seed)
    n_parts = rng.randint(1, 3)
    exclusive = rng.random() < 0.6
    parts_cfg = []
    conds_sql = []
    res = lambda nm: nm  # noqa: E731 — physical columns only
    for i in range(n_parts):
        cond_cfg, cond_sql = _gen_condition(rng)
        parts_cfg.append({"name": f"p{i}", "filters": cond_cfg})
        conds_sql.append(f"COALESCE({cond_sql(res)}, FALSE)")
    cfg = {
        "sources": [{
            "name": "part", "module": "storage",
            "parameters": {"format": "parquet", "input": PART},
        }],
        "transforms": [{
            "name": "pt", "module": "partition", "inputs": ["part"],
            "parameters": {"exclusive": exclusive,
                           "partitions": parts_cfg},
        }],
    }
    outs = run_pipeline(spark, parse_config(json.dumps(cfg)))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{PART}'")

    def check(df, where):
        got = sorted(
            tuple(_norm_cell(r[c]) for c in df.columns)
            for r in df.collect())
        cols = ", ".join(df.columns)
        want = sorted(
            tuple(_norm_cell(x) for x in row)
            for row in con.execute(
                f"SELECT {cols} FROM part WHERE {where}").fetchall())
        assert got == want, (
            f"seed {seed} exclusive={exclusive} WHERE {where}: "
            f"{len(got)} vs {len(want)} rows")

    for i in range(n_parts):
        if exclusive and i > 0:
            earlier = " OR ".join(conds_sql[:i])
            check(outs[f"pt.p{i}"], f"{conds_sql[i]} AND NOT ({earlier})")
        else:
            check(outs[f"pt.p{i}"], conds_sql[i])
    check(outs["pt.excluded"],
          "NOT (" + " OR ".join(conds_sql) + ")")


def _run_union_fuzz(spark, seed: int):
    """Random union module config: two select stages project different
    (overlapping) column subsets of part, union name-unions with null
    padding; oracle = UNION ALL with explicit NULL slots."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    rng = random.Random(20_000 + seed)
    all_cols = [c for c, _ in PHYS]
    a_cols = sorted(rng.sample(all_cols, rng.randint(2, 4)))
    b_cols = sorted(rng.sample(all_cols, rng.randint(2, 4)))
    cfg = {
        "sources": [{
            "name": "part", "module": "storage",
            "parameters": {"format": "parquet", "input": PART},
        }],
        "transforms": [
            {"name": "a", "module": "select", "inputs": ["part"],
             "parameters": {"select": [{"name": c} for c in a_cols]}},
            {"name": "b", "module": "select", "inputs": ["part"],
             "parameters": {"select": [{"name": c} for c in b_cols]}},
            {"name": "u", "module": "union", "inputs": ["a", "b"]},
        ],
    }
    got_df = run_pipeline(spark, parse_config(json.dumps(cfg)))["u"]
    # unionByName: first input's columns, then the second's new ones
    expect_cols = a_cols + [c for c in b_cols if c not in a_cols]
    assert got_df.columns == expect_cols, (seed, got_df.columns, expect_cols)
    got = sorted(
        tuple(_norm_cell(r[c]) for c in expect_cols)
        for r in got_df.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{PART}'")
    sel_a = ", ".join(
        c if c in a_cols else f"NULL AS {c}" for c in expect_cols)
    sel_b = ", ".join(
        c if c in b_cols else f"NULL AS {c}" for c in expect_cols)
    want = sorted(
        tuple(_norm_cell(x) for x in row)
        for row in con.execute(
            f"SELECT {sel_a} FROM part UNION ALL "
            f"SELECT {sel_b} FROM part").fetchall())
    assert got == want, f"seed {seed}: {len(got)} vs {len(want)}"


@pytest.mark.parametrize("chunk", range(2))
def test_partition_fuzz_vs_duckdb(spark, chunk):
    for seed in range(chunk * 20, (chunk + 1) * 20):
        _run_partition_fuzz(spark, seed)


def test_union_fuzz_vs_duckdb(spark):
    for seed in range(20):
        _run_union_fuzz(spark, seed)


def _run_multi_agg_fuzz(spark, seed: int):
    """Multi-input aggregation: per-input aggregator lists full-outer
    merged on the group key (partial key overlap via disjoint filters
    exercises the null-padded side)."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    rng = random.Random(30_000 + seed)
    g = rng.choice(["p_brand", "p_type"])
    # per-input numeric + independent row filters for partial overlap
    fa = rng.randint(0, 120)
    fb = rng.randint(80, 210)
    ops = ["count", "sum", "min", "max"]

    def aggs_for(prefix, col, kind):
        out_cfg, out_sql = [], []
        for i in range(rng.randint(1, 2)):
            op = rng.choice(ops)
            nm = f"{prefix}{i}"
            if op == "count":
                out_cfg.append({"name": nm, "op": "count"})
                out_sql.append(f"COUNT(*) AS {nm}")
            else:
                out_cfg.append({"name": nm, "op": op, "field": col})
                body = f"{op}({col})"
                if op == "sum" and kind == "long":
                    body = f"CAST({body} AS BIGINT)"
                out_sql.append(f"{body} AS {nm}")
        return out_cfg, out_sql

    a_cfg, a_sql = aggs_for("xa", "p_size", "long")
    b_cfg, b_sql = aggs_for("xb", "p_retailprice", "double")
    cfg = {
        "sources": [{
            "name": "part", "module": "storage",
            "parameters": {"format": "parquet", "input": PART},
        }],
        "transforms": [
            {"name": "ia", "module": "select", "inputs": ["part"],
             "parameters": {
                 "filter": {"key": "p_partkey", "op": "<", "value": fa},
                 "select": [{"name": "g", "field": g, "func": "rename"},
                            {"name": "p_size"}]}},
            {"name": "ib", "module": "select", "inputs": ["part"],
             "parameters": {
                 "filter": {"key": "p_partkey", "op": ">=", "value": fb},
                 "select": [{"name": "g", "field": g, "func": "rename"},
                            {"name": "p_retailprice"}]}},
            {"name": "agg", "module": "aggregation",
             "inputs": ["ia", "ib"],
             "parameters": {"groupFields": ["g"], "aggregations": [
                 {"input": "ia", "fields": a_cfg},
                 {"input": "ib", "fields": b_cfg},
             ]}},
        ],
    }
    got_df = run_pipeline(spark, parse_config(json.dumps(cfg)))["agg"]
    cols = got_df.columns
    got = sorted(
        tuple(_norm_cell(r[c]) for c in cols) for r in got_df.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{PART}'")
    sql = (
        "SELECT coalesce(a.g, b.g) AS g, {acols}, {bcols} FROM "
        "(SELECT {g} AS g, {asql} FROM part WHERE p_partkey < {fa} "
        " GROUP BY 1) a FULL OUTER JOIN "
        "(SELECT {g} AS g, {bsql} FROM part WHERE p_partkey >= {fb} "
        " GROUP BY 1) b ON a.g = b.g"
    ).format(
        g=g, fa=fa, fb=fb,
        asql=", ".join(a_sql), bsql=", ".join(b_sql),
        acols=", ".join(f"a.{c['name']}" for c in a_cfg),
        bcols=", ".join(f"b.{c['name']}" for c in b_cfg),
    )
    cur = con.execute(sql)
    want_cols = [d[0] for d in cur.description]
    assert sorted(cols) == sorted(want_cols), (seed, cols, want_cols)
    idx = [want_cols.index(c) for c in cols]
    want = sorted(
        tuple(_norm_cell(row[i]) for i in idx) for row in cur.fetchall())
    assert got == want, (
        f"seed {seed}\nSQL: {sql}\n"
        f"only_engine={[r for r in got if r not in want][:3]}\n"
        f"only_oracle={[r for r in want if r not in got][:3]}")


def _run_limit_fuzz(spark, seed: int):
    """limit module: per-key cap (QUALIFY row_number oracle) and the
    keyless global top-k (TakeOrdered path, ORDER BY .. LIMIT oracle)."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    rng = random.Random(40_000 + seed)
    n = rng.randint(1, 5)
    keyed = rng.random() < 0.7
    desc = rng.random() < 0.3
    params = {"count": n, "orderFields": ["p_partkey"]}
    if keyed:
        params["groupFields"] = [rng.choice(["p_brand", "p_type"])]
    if desc:
        params["descending"] = True
    cfg = {
        "sources": [{
            "name": "part", "module": "storage",
            "parameters": {"format": "parquet", "input": PART},
        }],
        "transforms": [{
            "name": "lim", "module": "limit", "inputs": ["part"],
            "parameters": params,
        }],
    }
    got_df = run_pipeline(spark, parse_config(json.dumps(cfg)))["lim"]
    got = sorted(
        tuple(_norm_cell(r[c]) for c in ("p_partkey", "p_brand"))
        for r in got_df.select("p_partkey", "p_brand").collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{PART}'")
    order = "p_partkey DESC" if desc else "p_partkey"
    if keyed:
        k = params["groupFields"][0]
        sql = (f"SELECT p_partkey, p_brand FROM part QUALIFY "
               f"row_number() OVER (PARTITION BY {k} ORDER BY {order})"
               f" <= {n}")
    else:
        sql = f"SELECT p_partkey, p_brand FROM part ORDER BY {order} LIMIT {n}"
    want = sorted(
        tuple(_norm_cell(x) for x in row)
        for row in con.execute(sql).fetchall())
    assert got == want, f"seed {seed}: {len(got)} vs {len(want)}\n{sql}"


def test_multi_input_agg_fuzz_vs_duckdb(spark):
    for seed in range(20):
        _run_multi_agg_fuzz(spark, seed)


def test_limit_fuzz_vs_duckdb(spark):
    for seed in range(20):
        _run_limit_fuzz(spark, seed)


def _run_compare_fuzz(spark, seed: int):
    """compare module: two derived views of part (overlapping key ranges,
    one column perturbed on a subset) diffed by primary key; oracle
    recomputes per-key status and the differing-field list in SQL."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    rng = random.Random(50_000 + seed)
    fa = rng.randint(120, 210)   # a: keys < fa
    fb = rng.randint(0, 90)      # b: keys >= fb  (overlap [fb, fa))
    mut_lo = rng.randint(0, 200)
    mut_hi = mut_lo + rng.randint(5, 60)
    cfg = {
        "sources": [{
            "name": "part", "module": "storage",
            "parameters": {"format": "parquet", "input": PART},
        }],
        "transforms": [
            {"name": "a", "module": "select", "inputs": ["part"],
             "parameters": {
                 "filter": {"key": "p_partkey", "op": "<", "value": fa},
                 "select": [{"name": "p_partkey"}, {"name": "p_size"},
                            {"name": "p_brand"}]}},
            {"name": "b", "module": "select", "inputs": ["part"],
             "parameters": {
                 "filter": {"key": "p_partkey", "op": ">=", "value": fb},
                 "select": [
                     {"name": "p_partkey"},
                     # perturb p_size on [mut_lo, mut_hi): mismatch rows
                     {"name": "p_size", "func": "expression",
                      "expression": (
                          f"if(p_partkey >= {mut_lo} & "
                          f"p_partkey < {mut_hi}, p_size + 1, p_size)")},
                     {"name": "p_brand"}]}},
            {"name": "cmp", "module": "compare", "inputs": ["a", "b"],
             "parameters": {"primaryKeyFields": ["p_partkey"]}},
        ],
    }
    got_df = run_pipeline(spark, parse_config(json.dumps(cfg)))["cmp"]
    got = sorted(
        (r["p_partkey"], r["status"],
         tuple(sorted(d["field"] for d in r["differences"])))
        for r in got_df.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{PART}'")
    # engine expressions are double-typed, so the perturbed p_size is a
    # DOUBLE compared against a's BIGINT p_size via eqNullSafe — equal
    # values of different TYPES are still equal under Spark's null-safe
    # equality on the coerced comparison, so only the +1 rows differ
    sql = f"""
    WITH a AS (SELECT p_partkey, p_size, p_brand FROM part
               WHERE p_partkey < {fa}),
         b AS (SELECT p_partkey,
                      CASE WHEN p_partkey >= {mut_lo}
                            AND p_partkey < {mut_hi}
                           THEN p_size + 1 ELSE p_size END AS p_size,
                      p_brand FROM part WHERE p_partkey >= {fb})
    SELECT coalesce(a.p_partkey, b.p_partkey) AS k,
           CASE WHEN b.p_partkey IS NULL THEN 'only_a'
                WHEN a.p_partkey IS NULL THEN 'only_b'
                WHEN a.p_size <> b.p_size THEN 'mismatch'
                ELSE 'match' END AS status,
           CASE WHEN a.p_partkey IS NOT NULL AND b.p_partkey IS NOT NULL
                 AND a.p_size <> b.p_size
                THEN 'p_size' ELSE NULL END AS difffield
    FROM a FULL OUTER JOIN b ON a.p_partkey = b.p_partkey
    """
    # engine lists EVERY common field as differing on one-sided rows
    # (the absent side reads NULL, ~eqNullSafe is true for them all)
    want = sorted(
        (k, status,
         ("p_brand", "p_size") if status.startswith("only_")
         else (("p_size",) if diff else ()))
        for k, status, diff in con.execute(sql).fetchall()
        if status != "match")
    assert got == want, (
        f"seed {seed}: {len(got)} vs {len(want)}\n"
        f"only_engine={[r for r in got if r not in want][:3]}\n"
        f"only_oracle={[r for r in want if r not in got][:3]}")


def test_compare_fuzz_vs_duckdb(spark):
    for seed in range(15):
        _run_compare_fuzz(spark, seed)


def _run_lookup_fuzz(spark, seed: int):
    """lookup module: broadcast left-join enrichment with a randomly
    pruned dimension (unmatched keys null-pad) vs a LEFT JOIN oracle."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    rng = random.Random(60_000 + seed)
    dim_cut = rng.randint(20, 180)  # dimension covers only keys < cut
    fact_filter = rng.randint(50, 210)
    dim_cols = sorted(rng.sample(["p_brand", "p_type", "p_retailprice"],
                                 rng.randint(1, 2)))
    cfg = {
        "sources": [{
            "name": "part", "module": "storage",
            "parameters": {"format": "parquet", "input": PART},
        }],
        "transforms": [
            {"name": "fact", "module": "select", "inputs": ["part"],
             "parameters": {
                 "filter": {"key": "p_partkey", "op": "<",
                            "value": fact_filter},
                 "select": [{"name": "k", "field": "p_partkey",
                             "func": "rename"},
                            {"name": "p_size"}]}},
            {"name": "dim", "module": "select", "inputs": ["part"],
             "parameters": {
                 "filter": {"key": "p_partkey", "op": "<",
                            "value": dim_cut},
                 "select": [{"name": "p_partkey"}]
                 + [{"name": c} for c in dim_cols]}},
            {"name": "enriched", "module": "lookup", "inputs": ["fact"],
             "sideInputs": ["dim"],
             "parameters": {"keyFields": ["k"],
                            "sideKeyFields": ["p_partkey"]}},
        ],
    }
    got_df = run_pipeline(spark, parse_config(json.dumps(cfg)))["enriched"]
    cols = ["k", "p_size"] + dim_cols
    got = sorted(
        tuple(_norm_cell(r[c]) for c in cols) for r in got_df.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{PART}'")
    sql = (
        "SELECT f.k, f.p_size, {dc} FROM "
        "(SELECT p_partkey AS k, p_size FROM part "
        " WHERE p_partkey < {ff}) f LEFT JOIN "
        "(SELECT p_partkey, {dcols} FROM part WHERE p_partkey < {dcut}) d "
        "ON f.k = d.p_partkey"
    ).format(ff=fact_filter, dcut=dim_cut,
             dcols=", ".join(dim_cols),
             dc=", ".join(f"d.{c}" for c in dim_cols))
    want = sorted(
        tuple(_norm_cell(x) for x in row)
        for row in con.execute(sql).fetchall())
    assert got == want, (
        f"seed {seed}: {len(got)} vs {len(want)}\n{sql}\n"
        f"only_engine={[r for r in got if r not in want][:3]}")


def test_lookup_fuzz_vs_duckdb(spark):
    for seed in range(15):
        _run_lookup_fuzz(spark, seed)


DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run_tokenize_fuzz(spark, seed: int):
    """tokenize (whitespace) -> random token-filter chain -> unnest ->
    word-frequency aggregation, vs a DuckDB regexp_split + list oracle
    that applies the same filter chain stepwise."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    rng = random.Random(70_000 + seed)
    filters = []
    expr = "tok"          # SQL expression for the token
    conds = ["len(tok) > 0"]
    for _ in range(rng.randint(1, 3)):
        pick = rng.random()
        if pick < 0.3:
            filters.append({"type": "lowercase"})
            expr = f"lower({expr})"
        elif pick < 0.45:
            filters.append({"type": "uppercase"})
            expr = f"upper({expr})"
        elif pick < 0.75:
            mn = rng.randint(1, 5)
            mx = rng.randint(mn, 12)
            filters.append({"type": "length", "min": mn, "max": mx})
            conds.append(f"len({expr}) BETWEEN {mn} AND {mx}")
        elif pick < 0.9:
            words = rng.sample(
                ["the", "and", "data", "of", "to", "a", "in"], 3)
            filters.append({"type": "stopwords", "words": words})
            lst = ", ".join(_sql_lit(w.lower()) for w in words)
            conds.append(f"lower({expr}) NOT IN ({lst})")
        else:
            n = rng.randint(2, 5)
            filters.append({"type": "edge_ngram", "maxGram": n})
            expr = f"substr({expr}, 1, {n})"
    cfg = {
        "sources": [{
            "name": "documents", "module": "storage",
            "parameters": {"format": "parquet", "input": DOCS},
        }],
        "transforms": [
            {"name": "tok", "module": "tokenize", "inputs": ["documents"],
             "parameters": {"fields": [{
                 "field": "text", "name": "tokens",
                 "tokenizer": {"type": "whitespace"},
                 "filters": filters}]}},
            {"name": "sel", "module": "select", "inputs": ["tok"],
             "parameters": {"select": [{"name": "doc_id"},
                                       {"name": "tokens"}]}},
            {"name": "flat", "module": "unnest", "inputs": ["sel"],
             "parameters": {"flattenField": "tokens"}},
            {"name": "freq", "module": "aggregation", "inputs": ["flat"],
             "parameters": {"groupFields": ["tokens"], "aggregations": [
                 {"name": "freq", "op": "count",
                  "condition": {"key": "tokens", "op": "!=",
                                "value": None}},
                 {"name": "n_docs", "op": "count_distinct",
                  "field": "doc_id"},
             ]}},
        ],
    }
    got_df = run_pipeline(spark, parse_config(json.dumps(cfg)))["freq"]
    # unnest is explode_outer (reference flattenField keeps rows whose
    # array is empty, as a NULL element) — when a filter chain empties
    # every token the engine emits one NULL-token group; the oracle
    # models tokens only, so compare non-null groups
    got = sorted(
        (r["tokens"], r["freq"], r["n_docs"])
        for r in got_df.collect() if r["tokens"] is not None)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    sql = f"""
    WITH raw AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    )
    SELECT {expr} AS tokens, count(*) AS freq,
           count(DISTINCT doc_id) AS n_docs
    FROM raw WHERE {' AND '.join(conds)}
    GROUP BY 1
    """
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, (
        f"seed {seed} filters={filters}\n{sql}\n"
        f"only_engine={[r for r in got if r not in want][:3]}\n"
        f"only_oracle={[r for r in want if r not in got][:3]}")


def test_tokenize_fuzz_vs_duckdb(spark):
    for seed in range(15):
        _run_tokenize_fuzz(spark, seed)
