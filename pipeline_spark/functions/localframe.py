"""Driver-side frames for metadata-scale lookup inputs (file -> fill
values, row-id bases, per-file sequence numbers, decoded DV positions).

``spark.createDataFrame(list)`` slices the list across
``defaultParallelism`` partitions — on ``local[32]`` a 5-row lookup
frame becomes a 32-task stage inside EVERY broadcast-exchange build that
consumes it, and DML paths consume several per commit (r15 fix: one
partition).  r16 goes further: metadata-scale frames build as a SQL
VALUES LocalRelation — the broadcast build then needs NO Spark job at
all (LocalTableScan), and the whole frame ships to the JVM in one
spark.sql round-trip instead of RDD-serialization py4j chatter.  Large
frames (driver-decoded DV positions up to the 131072 gate) and value
types whose SQL spelling could drift from createDataFrame coercion
(naive datetimes: system-tz dependent) keep the single-partition RDD
path."""
from __future__ import annotations

import datetime as _dt
import math

# above this the VALUES text gets parser-hostile (a 131k-position DV
# frame would be ~15 MB of SQL); the RDD path ships pickled bytes
_VALUES_MAX_ROWS = 2048


def _sql_value(v) -> str:
    """Spell one Python scalar as SQL able to CAST losslessly to the
    declared column type; raises ValueError for types we refuse to
    spell (the caller falls back to the RDD path)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        if -(2**63) <= v < 2**63:
            return str(v)
        raise ValueError("int out of BIGINT range")
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            s = "Infinity" if v > 0 else "-Infinity"
            return f"CAST('{s}' AS DOUBLE)"
        return repr(v) + "D"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex() + "'"
    if isinstance(v, _dt.datetime):
        # naive datetimes coerce through the SYSTEM timezone in classic
        # createDataFrame; a SQL TIMESTAMP literal uses the SESSION
        # timezone — refusing keeps the two paths bit-identical
        raise ValueError("datetime values take the RDD path")
    if isinstance(v, _dt.date):
        return f"DATE'{v.isoformat()}'"
    raise ValueError(f"unsupported VALUES type {type(v).__name__}")


def _split_ddl(schema: str) -> list[tuple[str, str]]:
    """'name type, name type' -> [(name, type)], depth-aware for
    decimal(10,2)/struct<...> type arguments."""
    parts, depth, cur = [], 0, []
    for ch in schema:
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    out = []
    for p in parts:
        p = p.strip()
        name, typ = p.split(None, 1)
        out.append((name.strip("`"), typ.strip()))
    return out


def _values_sql(rows, schema: str) -> str | None:
    try:
        fields = _split_ddl(schema)
        if not fields or any(not t for _n, t in fields):
            return None
        vals = ",".join(
            "(" + ",".join(_sql_value(v) for v in r) + ")" for r in rows
        )
        cols = ",".join(
            f"CAST(__c{i} AS {t}) AS `" + n.replace("`", "``") + "`"
            for i, (n, t) in enumerate(fields)
        )
        names = ",".join(f"__c{i}" for i in range(len(fields)))
        return f"SELECT {cols} FROM VALUES {vals} AS __lf__({names})"
    except (ValueError, TypeError):
        return None


def local_frame(spark, rows, schema: str):
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    if len(rows) <= _VALUES_MAX_ROWS:
        sql = _values_sql(rows, schema)
        if sql is not None:
            return spark.sql(sql)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
