"""`localH2` sink: build an embedded SQL database FILE from pipeline
rows and publish it as an artifact.

Reference parity: module/sink/LocalH2Sink.java + fileio/H2Sink.java —
each config maps one INPUT to one TABLE in an embedded database
(optionally seeded from a prior database archive), rows land via
batched INSERT / INSERT_OR_UPDATE / INSERT_OR_DONOTHING / DELETE
(JdbcUtil.OP), and the finished database ships to ``output`` (zipped
when the path ends in ``.zip``, mirroring ZipFileUtil).

The embedded engine here is the stdlib's ``sqlite3`` instead of H2 —
H2 is a JVM library; sqlite is the Python-native embedded database with
the same artifact semantics (single portable file, SQL DDL/DML, unique
keys for upsert).  DDLs are derived from the Spark schema when not
given, exactly like H2Util's schema-driven CREATE TABLE.

Scale posture: an embedded database is an ARTIFACT, not a table — it is
single-file by definition, so the ungrouped build streams batches
through the driver (``toLocalIterator``, bounded by ``batchSize``) with
a ``maxRows`` guard, the same discipline as position-delete
materialization.  ``groupFields`` is the scale path: one database per
group, built EXECUTOR-side via ``applyInPandas`` (thousands of per-key
artifacts build in parallel; nothing crosses the driver).
"""

from __future__ import annotations

import os
import zipfile
from typing import Any

from pipeline_spark.registry import KIND_SINK, ModuleContext, module

_SQLITE_TYPE = {
    # Spark simpleString names + their logical aliases
    "bigint": "INTEGER", "long": "INTEGER", "int": "INTEGER",
    "integer": "INTEGER", "smallint": "INTEGER", "short": "INTEGER",
    "tinyint": "INTEGER", "byte": "INTEGER", "boolean": "INTEGER",
    "double": "REAL", "float": "REAL",
    "string": "TEXT", "date": "TEXT", "timestamp": "TEXT",
    "timestamp_ntz": "TEXT", "binary": "BLOB",
}


def _sqlite_type(spark_type: str) -> str:
    t = spark_type.lower()
    if t in _SQLITE_TYPE:
        return _SQLITE_TYPE[t]
    if t.startswith("decimal"):
        return "NUMERIC"
    raise ValueError(
        f"localH2: column type {spark_type!r} has no embedded-db mapping "
        "(cast nested/exotic columns to string/json upstream)"
    )


def _ddl_for(table: str, schema, key_fields: list[str]) -> list[str]:
    cols = ", ".join(
        f'"{f.name}" {_sqlite_type(f.dataType.simpleString())}'
        for f in schema.fields
    )
    ddls = [f'CREATE TABLE IF NOT EXISTS "{table}" ({cols})']
    if key_fields:
        keys = ", ".join(f'"{k}"' for k in key_fields)
        ddls.append(
            f'CREATE UNIQUE INDEX IF NOT EXISTS "idx_{table}_pk" '
            f'ON "{table}" ({keys})'
        )
    return ddls


def _dml_for(table: str, cols: list[str], op: str, keys: list[str]) -> str:
    ph = ", ".join("?" for _ in cols)
    names = ", ".join(f'"{c}"' for c in cols)
    op = op.upper()
    if op == "INSERT":
        return f'INSERT INTO "{table}" ({names}) VALUES ({ph})'
    if op == "INSERT_OR_UPDATE":
        if not keys:
            raise ValueError("localH2: INSERT_OR_UPDATE needs keyFields")
        sets = ", ".join(
            f'"{c}"=excluded."{c}"' for c in cols if c not in keys
        )
        conflict = ", ".join(f'"{k}"' for k in keys)
        return (
            f'INSERT INTO "{table}" ({names}) VALUES ({ph}) '
            f"ON CONFLICT({conflict}) DO UPDATE SET {sets}"
        )
    if op == "INSERT_OR_DONOTHING":
        return f'INSERT OR IGNORE INTO "{table}" ({names}) VALUES ({ph})'
    if op == "DELETE":
        if not keys:
            raise ValueError("localH2: DELETE needs keyFields")
        cond = " AND ".join(f'"{k}"=?' for k in keys)
        return f'DELETE FROM "{table}" WHERE {cond}'
    raise ValueError(f"localH2: unsupported op '{op}' (JdbcUtil.OP)")


def _cell(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        # sqlite has no decimal binding; NUMERIC affinity coerces the
        # exact string form back to a number on read
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (bytearray, memoryview)):
        return bytes(v)
    return v


def _seed(db_path: str, seed_path: str) -> None:
    """Start from a prior database artifact (H2Sink's ``input`` zip)."""
    if seed_path.endswith(".zip"):
        with zipfile.ZipFile(seed_path) as zf:
            names = [n for n in zf.namelist() if not n.endswith("/")]
            if len(names) != 1:
                raise ValueError(
                    f"localH2: seed archive {seed_path} must hold exactly "
                    f"one database file (found {names})"
                )
            with open(db_path, "wb") as out, zf.open(names[0]) as src:
                out.write(src.read())
    else:
        import shutil

        shutil.copyfile(seed_path, db_path)


def _publish(db_path: str, output: str) -> str:
    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    if output.endswith(".zip"):
        with zipfile.ZipFile(output, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.write(db_path, os.path.basename(db_path))
    else:
        import shutil

        shutil.copyfile(db_path, output)
    return output


@module("localH2", kind=KIND_SINK)
def localh2_sink(ctx: ModuleContext) -> dict:
    """``configs: [{input, table, ddls, keyFields, op}]`` build tables in
    one embedded database published to ``output``; ``groupFields``
    builds one database PER GROUP executor-side (single input)."""
    import sqlite3
    import tempfile

    p: dict[str, Any] = ctx.params
    output = p.get("output")
    if not output:
        raise ValueError("localH2 sink: 'output' is required")
    database = str(p.get("database") or "local")
    batch_size = int(p.get("batchSize", 1000))
    max_rows = int(p.get("maxRows", 10_000_000))
    group_fields = list(p.get("groupFields") or [])
    configs = p.get("configs") or [{}]
    by_name = dict(zip(ctx.input_names, ctx.inputs))

    resolved = []
    for i, cfg in enumerate(configs):
        src = cfg.get("input") or (
            ctx.input_names[0] if ctx.input_names else None
        )
        if src not in by_name:
            raise ValueError(
                f"localH2 sink: configs[{i}].input '{src}' is not one of "
                f"this module's inputs {ctx.input_names}"
            )
        resolved.append({
            "df": by_name[src],
            "table": str(cfg.get("table") or src),
            "ddls": list(cfg.get("ddls") or []),
            "keys": list(cfg.get("keyFields") or []),
            "op": str(cfg.get("op") or "INSERT"),
        })

    if group_fields:
        # scale path: one artifact per group, built where the data lives
        if len(resolved) != 1:
            raise ValueError(
                "localH2 sink: groupFields supports exactly one input "
                "(one table per per-group database)"
            )
        if p.get("input"):
            raise ValueError(
                "localH2 sink: seeding from a prior archive ('input') is "
                "not supported with groupFields — seed per-group archives "
                "by unioning the prior rows upstream instead"
            )
        cfg = resolved[0]
        df = cfg["df"]
        schema = df.schema
        ddls = cfg["ddls"] or _ddl_for(cfg["table"], schema, cfg["keys"])
        dml = _dml_for(
            cfg["table"],
            [f.name for f in schema.fields], cfg["op"], cfg["keys"],
        )
        table, keys, op = cfg["table"], cfg["keys"], cfg["op"]
        out_dir = output
        os.makedirs(out_dir, exist_ok=True)

        def build(pdf):
            import re as _re

            import pandas as pd
            import sqlite3 as sq

            # group values become FILENAMES: strip path separators and
            # shell-hostile characters so 'en/../..' can't escape
            # out_dir; a key the sanitizer had to ALTER gets a stable
            # hash suffix so distinct raw groups ('a b' vs 'a_b') can
            # never collide onto one artifact path
            raw = "_".join(str(pdf[g].iloc[0]) for g in group_fields)
            key = _re.sub(r"[^A-Za-z0-9_.=-]", "_", raw).lstrip(".")
            if key != raw or not key:
                import hashlib as _hl

                key = (key or "group") + "-" + _hl.sha256(
                    raw.encode()
                ).hexdigest()[:8]
            db = os.path.join(
                tempfile.mkdtemp(prefix="localh2_"), f"{database}.db"
            )
            con = sq.connect(db)
            for d in ddls:
                con.execute(d)
            cols = (
                keys if op.upper() == "DELETE"
                else [f.name for f in schema.fields]
            )
            if len(pdf) > max_rows:
                raise ValueError(
                    f"localH2 sink: group '{raw}' exceeds maxRows="
                    f"{max_rows} — an embedded database artifact is not "
                    "a table; aggregate upstream or raise maxRows"
                )
            rows = [
                tuple(_cell(v) for v in t)
                for t in pdf[cols].itertuples(index=False, name=None)
            ]
            for i0 in range(0, len(rows), batch_size):
                con.executemany(dml, rows[i0:i0 + batch_size])
            con.commit()
            con.close()
            final = os.path.join(out_dir, f"{key}.db.zip")
            _publish(db, final)
            return pd.DataFrame(
                {"group": [key], "rows": [len(pdf)], "path": [final]}
            )

        summary = df.groupBy(*group_fields).applyInPandas(
            build, schema="group string, rows long, path string"
        )
        # materialize ONCE (the build IS the sink action) and hand the
        # tiny one-row-per-group summary downstream as a literal frame —
        # returning the lazy plan would rebuild every artifact per action
        rows = summary.collect()
        return {"": ctx.spark.createDataFrame(rows, summary.schema)}

    # artifact path: ONE database file — stream batches through the
    # driver with a hard row cap (an embedded db is small by contract)
    tmp = tempfile.mkdtemp(prefix="localh2_")
    db_path = os.path.join(tmp, f"{database}.db")
    if p.get("input"):
        _seed(db_path, str(p["input"]))
    con = sqlite3.connect(db_path)
    try:
        total = 0
        for cfg in resolved:
            df = cfg["df"]
            schema = df.schema
            for d in cfg["ddls"] or _ddl_for(
                cfg["table"], schema, cfg["keys"]
            ):
                con.execute(d)
            cols = (
                cfg["keys"] if cfg["op"].upper() == "DELETE"
                else [f.name for f in schema.fields]
            )
            dml = _dml_for(cfg["table"], cols, cfg["op"], cfg["keys"])
            buf: list[tuple] = []
            for row in df.select(*cols).toLocalIterator():
                buf.append(tuple(_cell(v) for v in row))
                total += 1
                if total > max_rows:
                    raise ValueError(
                        f"localH2 sink: more than maxRows={max_rows} rows "
                        "— an embedded database artifact is not a 100 TB "
                        "table; aggregate/filter upstream or raise maxRows"
                    )
                if len(buf) >= batch_size:
                    con.executemany(dml, buf)
                    buf = []
            if buf:
                con.executemany(dml, buf)
        con.commit()
    finally:
        con.close()
    _publish(db_path, str(output))
    return {"": ctx.input}
