"""Driver contract for the spark-graft builder (PySpark target).

Every query exercises the pipeline_spark engine (config-driven modules →
DataFrame plans) and carries a DuckDB oracle in ``oracle_sql()``.  Rows-only
(non-SQL-expressible) entries: minhash/simhash/LSH (xxhash64-based
signatures have no DuckDB equivalent) and lang_id (argmax over embedded
stopword lists).

Column names are aligned 1:1 between the Spark result and the oracle SQL;
double aggregates are rounded identically on both sides to absorb
floating-point summation-order differences.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_spark.config import parse_config
from pipeline_spark.executor import run_pipeline

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _pipeline(spark: SparkSession, sf_dir: str, tables: list[str], body: str, out: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = "sources:\n" + "".join(
        f"  - name: {t}\n    module: storage\n"
        f"    parameters: {{format: parquet, input: {sf_dir}/{t}.parquet}}\n"
        for t in tables
    )
    return run_pipeline(spark, parse_config(src + body))[out]


def _pipeline_multi(spark: SparkSession, sf_dir: str, tables: list[str], body: str):
    """Like _pipeline but returns the full output registry (for
    multi-output modules like partition/sample)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = "sources:\n" + "".join(
        f"  - name: {t}\n    module: storage\n"
        f"    parameters: {{format: parquet, input: {sf_dir}/{t}.parquet}}\n"
        for t in tables
    )
    return run_pipeline(spark, parse_config(src + body))


def _spread_ids(df: DataFrame) -> DataFrame:
    """Scale-adaptive fan-out for payload-generating fixtures (see
    functions/partitioning.spread — no-op when the scan already has
    cluster-parallelism partitions)."""
    from pipeline_spark.functions.partitioning import spread

    return spread(df)


def _tmp_path(name: str, sf_dir: str) -> str:
    """Collision-proof scratch path for queries that write a table first.

    Keyed by query name, sf-dir basename, AND pid so concurrent driver runs
    (e.g. bench at sf0.1 overlapping correctness at sf0.01, or a stale table
    surviving a crashed run) can never read each other's data.
    """
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(
        tempfile.gettempdir(), f"pipeline_spark_{name}_{sf}_{os.getpid()}"
    )


# ---------------------------------------------------------------- queries

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter + aggregation modules (TPC-H Q1 shape)."""
    df = _pipeline(spark, sf_dir, ["lineitem"], """
transforms:
  - name: filtered
    module: filter
    inputs: [lineitem]
    parameters:
      filters: [{key: l_shipdate, op: "<=", value: "1998-09-02T00:00:00"}]
  - name: agg
    module: aggregation
    inputs: [filtered]
    parameters:
      groupFields: [l_returnflag, l_linestatus]
      aggregations:
        - {name: sum_qty, op: sum, field: l_quantity}
        - {name: sum_base_price, op: sum, field: l_extendedprice}
        - {name: sum_disc_price, op: sum, expression: "l_extendedprice * (1 - l_discount)"}
        - {name: avg_qty, op: avg, field: l_quantity}
        - {name: avg_price, op: avg, field: l_extendedprice}
        - {name: count_order, op: count}
""", "agg")
    return df.select(
        "l_returnflag", "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_base_price", 2).alias("sum_base_price"),
        F.round("sum_disc_price", 2).alias("sum_disc_price"),
        F.round("avg_qty", 4).alias("avg_qty"),
        F.round("avg_price", 4).alias("avg_price"),
        "count_order",
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sql module: 3-way join, aggregate, top-k (TPC-H Q3 shape)."""
    return _pipeline(spark, sf_dir, ["customer", "orders", "lineitem"], """
transforms:
  - name: q
    module: sql
    inputs: [customer, orders, lineitem]
    parameters:
      sql: |
        SELECT l.l_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
""", "q")


Q3_SQL = """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregation argmax/argmin (max_by/min_by)."""
    return _pipeline(spark, sf_dir, ["lineitem"], """
transforms:
  - name: agg
    module: aggregation
    inputs: [lineitem]
    parameters:
      groupFields: [l_returnflag, l_linestatus]
      aggregations:
        - {name: priciest_order, op: argmax, field: l_orderkey, comparingField: l_extendedprice}
        - {name: cheapest_order, op: argmin, field: l_orderkey, comparingField: l_extendedprice}
        - {name: max_price, op: max, field: l_extendedprice}
""", "agg")


Q_ARG_SQL = """
SELECT l_returnflag, l_linestatus,
       arg_max(l_orderkey, l_extendedprice) AS priciest_order,
       arg_min(l_orderkey, l_extendedprice) AS cheapest_order,
       max(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregation first/last by event time (events.ts unique per user)."""
    return _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: agg
    module: aggregation
    inputs: [events]
    timestampAttribute: ts
    parameters:
      groupFields: [user_id]
      aggregations:
        - {name: first_event, op: first, field: event_type}
        - {name: last_event, op: last, field: event_type}
        - {name: n_events, op: count}
        - {name: n_purchases, op: count, condition: {key: event_type, op: "=", value: purchase}}
""", "agg")


Q_FIRSTLAST_SQL = """
SELECT user_id,
       arg_min(event_type, ts) AS first_event,
       arg_max(event_type, ts) AS last_event,
       count(*) AS n_events,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
FROM events
GROUP BY user_id
"""


def q_partition_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partition module: first-match routing + per-partition select + union."""
    return _pipeline(spark, sf_dir, ["lineitem"], """
transforms:
  - name: parts
    module: partition
    inputs: [lineitem]
    parameters:
      exclusive: true
      union: true
      partitions:
        - name: returned
          filters: [{key: l_returnflag, op: "=", value: A}]
          select:
            - {name: l_orderkey}
            - {name: l_linenumber}
            - {name: bucket, type: string, value: returned}
        - name: open
          filters: [{key: l_linestatus, op: "=", value: O}]
          select:
            - {name: l_orderkey}
            - {name: l_linenumber}
            - {name: bucket, type: string, value: open}
""", "parts")


Q_PARTITION_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_returnflag = 'A' THEN 'returned' ELSE 'open' END AS bucket
FROM lineitem
WHERE l_returnflag = 'A' OR l_linestatus = 'O'
"""


def q_union_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union module with per-input field mappings + null padding."""
    return _pipeline(spark, sf_dir, ["customer", "supplier"], """
transforms:
  - name: u
    module: union
    inputs: [customer, supplier]
    parameters:
      mappings:
        - {outputField: name, inputs: {customer: c_name, supplier: s_name}}
        - {outputField: acctbal, inputs: {customer: c_acctbal, supplier: s_acctbal}}
        - {outputField: nationkey, inputs: {customer: c_nationkey, supplier: s_nationkey}}
        - {outputField: segment, inputs: {customer: c_mktsegment}}
""", "u")


Q_UNION_SQL = """
SELECT c_name AS name, c_acctbal AS acctbal, c_nationkey AS nationkey, c_mktsegment AS segment FROM customer
UNION ALL
SELECT s_name, s_acctbal, s_nationkey, NULL FROM supplier
"""


def q_lookup_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lookup module: broadcast left join enrichment."""
    return _pipeline(spark, sf_dir, ["lineitem", "part"], """
transforms:
  - name: keyed
    module: select
    inputs: [lineitem]
    parameters:
      select:
        - {name: l_orderkey}
        - {name: l_linenumber}
        - {name: l_partkey}
  - name: dim
    module: select
    inputs: [part]
    parameters:
      select:
        - {name: p_partkey}
        - {name: p_brand}
        - {name: p_type}
  - name: enriched
    module: lookup
    inputs: [keyed]
    sideInputs: [dim]
    parameters:
      keyFields: [l_partkey]
      sideKeyFields: [p_partkey]
""", "enriched")


Q_LOOKUP_SQL = """
SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_brand, p.p_type
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
"""


def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """limit module: per-key top-k (oldest-first with tiebreak)."""
    return _pipeline(spark, sf_dir, ["lineitem"], """
transforms:
  - name: lim
    module: limit
    inputs: [lineitem]
    timestampAttribute: l_shipdate
    parameters:
      count: 2
      groupFields: [l_orderkey]
      orderFields: [l_shipdate, l_linenumber]
""", "lim").select("l_orderkey", "l_linenumber", "l_shipdate")


Q_LIMIT_SQL = """
SELECT l_orderkey, l_linenumber, l_shipdate
FROM lineitem
QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber) <= 2
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stateful select: running agg (rows frame), lag[k], row_number."""
    df = _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: st
    module: select
    inputs: [events]
    timestampAttribute: ts
    parameters:
      groupFields: [user_id]
      select:
        - {name: user_id}
        - {name: event_id}
        - {name: value}
        - {name: run_sum3, func: sum, field: value, range: {count: 3}}
        - {name: prev_value, func: lag, expression: "value[1]"}
        - {name: rn, func: row_number}
""", "st")
    return df.select(
        "user_id", "event_id",
        F.round("value", 4).alias("value"),
        F.round("run_sum3", 4).alias("run_sum3"),
        F.round("prev_value", 4).alias("prev_value"),
        "rn",
    )


Q_RUNNING_SQL = """
SELECT user_id, event_id, round(value, 4) AS value,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS run_sum3,
       round(lag(value) OVER (PARTITION BY user_id ORDER BY ts), 4) AS prev_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
FROM events
"""


def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stateful select: duration range frame (last hour per key)."""
    df = _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: st
    module: select
    inputs: [events]
    timestampAttribute: ts
    parameters:
      groupFields: [user_id]
      select:
        - {name: user_id}
        - {name: event_id}
        - {name: hour_sum, func: sum, field: value, range: {duration: 1, unit: hour}}
        - {name: hour_cnt, func: count, range: {duration: 1, unit: hour}}
""", "st")
    return df.select(
        "user_id", "event_id",
        F.round("hour_sum", 4).alias("hour_sum"),
        "hour_cnt",
    )


Q_TIMERANGE_SQL = """
SELECT user_id, event_id,
       round(sum(value) OVER w, 4) AS hour_sum,
       count(*) OVER w AS hour_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch(ts) AS BIGINT)
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
"""


def q_calendar_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregation with calendar (month) window strategy."""
    return _pipeline(spark, sf_dir, ["orders"], """
transforms:
  - name: agg
    module: aggregation
    inputs: [orders]
    timestampAttribute: o_orderdate
    strategy:
      window: {type: calendar, unit: month}
    parameters:
      groupFields: [o_orderpriority]
      aggregations:
        - {name: n_orders, op: count}
        - {name: total, op: sum, field: o_totalprice}
  - name: shaped
    module: select
    inputs: [agg]
    parameters:
      select:
        - {name: month, field: window}
        - {name: o_orderpriority}
        - {name: n_orders}
        - {name: total}
""", "shaped").withColumn("total", F.round("total", 2))


Q_CALENDAR_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, o_orderpriority,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY 1, 2
"""


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregation with fixed (tumbling) window strategy."""
    return _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: agg
    module: aggregation
    inputs: [events]
    timestampAttribute: ts
    strategy:
      window: {type: fixed, size: 1, unit: day}
    parameters:
      groupFields: [event_type]
      aggregations:
        - {name: n, op: count}
        - {name: v, op: sum, field: value}
  - name: shaped
    module: select
    inputs: [agg]
    parameters:
      select:
        - {name: day, field: window.start}
        - {name: event_type}
        - {name: n}
        - {name: v}
""", "shaped").withColumn("v", F.round("v", 4))


Q_TUMBLING_SQL = """
SELECT CAST(to_timestamp(floor(epoch(ts) / 86400) * 86400) AS TIMESTAMP) AS day, event_type,
       count(*) AS n, round(sum(value), 4) AS v
FROM events
GROUP BY 1, 2
"""


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregation with sliding window strategy (1h size / 30m period)."""
    return _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: agg
    module: aggregation
    inputs: [events]
    timestampAttribute: ts
    strategy:
      window: {type: sliding, size: 3600, period: 1800, unit: second}
    parameters:
      groupFields: [event_type]
      aggregations:
        - {name: n, op: count}
  - name: shaped
    module: select
    inputs: [agg]
    parameters:
      select:
        - {name: wstart, field: window.start}
        - {name: event_type}
        - {name: n}
""", "shaped")


Q_SLIDING_SQL = """
WITH windows AS (
  SELECT event_type, ts,
         unnest([
           CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800) AS TIMESTAMP),
           CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP)
         ]) AS wstart
  FROM events
)
SELECT wstart, event_type, count(*) AS n
FROM windows
GROUP BY wstart, event_type
"""


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregation with session window strategy (30 min gap per user)."""
    return _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: agg
    module: aggregation
    inputs: [events]
    timestampAttribute: ts
    strategy:
      window: {type: session, gap: 1800, unit: second}
    parameters:
      groupFields: [user_id]
      aggregations:
        - {name: n, op: count}
  - name: shaped
    module: select
    inputs: [agg]
    parameters:
      select:
        - {name: user_id}
        - {name: session_start, field: window.start}
        - {name: session_end, field: window.end}
        - {name: n}
""", "shaped")


Q_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 1800 SECOND
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 1800 SECOND AS session_end,
       count(*) AS n
FROM sessions
GROUP BY user_id, session_id
"""


def q_expression_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select module exp4j expressions: if/comparison/sqrt/log/power."""
    df = _pipeline(spark, sf_dir, ["part"], """
transforms:
  - name: sel
    module: select
    inputs: [part]
    parameters:
      select:
        - {name: p_partkey}
        - {name: score, expression: "if(p_size > 25, log(p_retailprice), sqrt(p_size))"}
        - {name: flag, expression: "p_size > 10 & p_retailprice < 1500"}
        - {name: poly, expression: "p_size ^ 2 + 3 * p_size - 1"}
""", "sel")
    return df.select(
        "p_partkey",
        F.round("score", 6).alias("score"),
        "flag",
        F.round("poly", 4).alias("poly"),
    )


Q_EXPR_SQL = """
SELECT p_partkey,
       round(CASE WHEN p_size > 25 THEN ln(p_retailprice) ELSE sqrt(p_size) END, 6) AS score,
       CAST(CASE WHEN p_size > 10 AND p_retailprice < 1500 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS flag,
       round(p_size * p_size + 3 * p_size - 1, 4) AS poly
FROM part
"""


def q_select_text_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select module text template / hash / concat / json build+extract."""
    return _pipeline(spark, sf_dir, ["customer"], """
transforms:
  - name: sel
    module: select
    inputs: [customer]
    parameters:
      select:
        - {name: c_custkey}
        - {name: label, text: "cust:${c_name}:${c_mktsegment}"}
        - {name: digest, func: hash, field: c_name}
        - {name: short_digest, func: hash, field: c_name, size: 8}
        - {name: joined, func: concat, fields: [c_name, c_mktsegment], delimiter: "|"}
        - name: payload
          func: json
          fields:
            - {name: key, field: c_custkey}
            - {name: seg, field: c_mktsegment}
        - {name: seg_back, func: json_path, field: payload, path: "$.seg"}
""", "sel")


Q_TEXT_SQL = """
SELECT c_custkey,
       'cust:' || c_name || ':' || c_mktsegment AS label,
       sha256(c_name) AS digest,
       substr(sha256(c_name), 1, 8) AS short_digest,
       c_name || '|' || c_mktsegment AS joined,
       '{"key":' || c_custkey || ',"seg":"' || c_mktsegment || '"}' AS payload,
       c_mktsegment AS seg_back
FROM customer
"""


def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg (+distinct) — sorted for deterministic comparison."""
    df = _pipeline(spark, sf_dir, ["lineitem"], """
transforms:
  - name: agg
    module: aggregation
    inputs: [lineitem]
    parameters:
      groupFields: [l_returnflag]
      aggregations:
        - {name: statuses, op: array_agg, field: l_linestatus, distinct: true}
        - {name: n, op: count}
""", "agg")
    return df.select(
        "l_returnflag",
        F.array_join(F.sort_array("statuses"), ",").alias("statuses"),
        "n",
    )


Q_AGG_COLLECT_SQL = """
SELECT l_returnflag,
       array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


def q_select_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif / switch / base64 encode+decode / cast select functions."""
    return _pipeline(spark, sf_dir, ["part"], """
transforms:
  - name: sel
    module: select
    inputs: [part]
    parameters:
      select:
        - {name: p_partkey}
        - {name: size_nz, func: nullif, field: p_size, condition: {key: p_size, op: "=", value: 25}}
        - name: brand_class
          func: switch
          cases:
            - {when: {key: p_brand, op: "=", value: "Brand#11"}, then: premium}
            - {when: {key: p_brand, op: match, value: "^Brand#1"}, then: standard}
          default: other
        - {name: name_b64, func: base64_encode, field: p_name}
        - {name: size_str, func: cast, field: p_size, type: string}
""", "sel").withColumn("name_b64", F.col("name_b64").cast("string"))


Q_SELECT_MISC_SQL = """
SELECT p_partkey,
       CASE WHEN p_size = 25 THEN NULL ELSE p_size END AS size_nz,
       CASE WHEN p_brand = 'Brand#11' THEN 'premium'
            WHEN regexp_matches(p_brand, '^Brand#1') THEN 'standard'
            ELSE 'other' END AS brand_class,
       to_base64(encode(p_name)) AS name_b64,
       CAST(p_size AS VARCHAR) AS size_str
FROM part
"""


def q_nullif_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif/switch conditions over a PRIOR computed output — sequential
    binding parity (Nullif.java:56-64 resolves condition variables against
    the cumulative inputFields SelectFunction.java:64-87 threads through
    the chain).  r13: closes VERDICT r12 "What's missing" #2."""
    return _pipeline(spark, sf_dir, ["part"], """
transforms:
  - name: sel
    module: select
    inputs: [part]
    parameters:
      select:
        - {name: p_partkey}
        - {name: bulk, func: expression, expression: "p_size * p_retailprice"}
        - {name: retail_nz, func: nullif, field: p_retailprice, condition: {key: bulk, op: ">", value: 30000}}
        - name: tier
          func: switch
          cases:
            - {when: {key: bulk, op: ">=", value: 40000}, then: high}
            - {when: {key: bulk, op: ">=", value: 20000}, then: mid}
          default: low
""", "sel")


Q_NULLIF_BOUND_SQL = """
SELECT p_partkey,
       p_size * p_retailprice AS bulk,
       CASE WHEN p_size * p_retailprice > 30000 THEN NULL
            ELSE p_retailprice END AS retail_nz,
       CASE WHEN p_size * p_retailprice >= 40000 THEN 'high'
            WHEN p_size * p_retailprice >= 20000 THEN 'mid'
            ELSE 'low' END AS tier
FROM part
"""


def q_create_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create source: typed sequence generation + select post-processing."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cfg = parse_config("""
sources:
  - name: seq
    module: create
    parameters:
      from: 1
      to: 1000
      type: long
transforms:
  - name: shaped
    module: select
    inputs: [seq]
    parameters:
      select:
        - {name: value}
        - {name: squared, expression: "value ^ 2"}
        - {name: bucket, expression: "value % 7"}
""")
    return run_pipeline(spark, cfg)["shaped"]


Q_CREATE_SEQ_SQL = """
SELECT r AS value,
       CAST(r AS DOUBLE) * r AS squared,
       CAST(r % 7 AS DOUBLE) AS bucket
FROM range(1, 1001) t(r)
"""


def q_compare_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compare module: detect injected per-key mismatches."""
    return _pipeline(spark, sf_dir, ["orders"], """
transforms:
  - name: perturbed
    module: select
    inputs: [orders]
    parameters:
      select:
        - {name: o_orderkey}
        - {name: o_totalprice, expression: "o_totalprice + if(o_orderkey % 100 = 0, 1, 0)"}
  - name: base
    module: select
    inputs: [orders]
    parameters:
      select:
        - {name: o_orderkey}
        - {name: o_totalprice, expression: "o_totalprice + 0"}
  - name: cmp
    module: compare
    inputs: [base, perturbed]
    parameters:
      primaryKeyFields: [o_orderkey]
""", "cmp").select("o_orderkey", "status")


Q_COMPARE_SQL = """
SELECT o_orderkey, 'mismatch' AS status FROM orders WHERE o_orderkey % 100 = 0
"""


def q_tokenize_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tokenize (whitespace + lowercase + stopword-ish len filter) →
    unnest → aggregation (word frequencies)."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: tok
    module: tokenize
    inputs: [documents]
    parameters:
      fields:
        - field: text
          name: tokens
          tokenizer: {type: whitespace}
          filters:
            - {type: lowercase}
            - {type: length, min: 4}
  - name: toksel
    module: select
    inputs: [tok]
    parameters:
      select:
        - {name: doc_id}
        - {name: tokens}
  - name: flat
    module: unnest
    inputs: [toksel]
    parameters:
      flattenField: tokens
  - name: freq
    module: aggregation
    inputs: [flat]
    parameters:
      groupFields: [tokens]
      aggregations:
        - {name: freq, op: count, condition: {key: tokens, op: "!=", value: null}}
        - {name: n_docs, op: count_distinct, field: doc_id}
  - name: top
    module: filter
    inputs: [freq]
    parameters:
      filters: [{key: freq, op: ">=", value: 10}]
""", "top")


Q_TOKENIZE_SQL = """
WITH toks AS (
  SELECT doc_id, lower(tok) AS token
  FROM documents, unnest(string_split_regex(text, '\\s+')) AS t(tok)
  WHERE length(tok) >= 4
)
SELECT token AS tokens, count(*) AS freq, count(DISTINCT doc_id) AS n_docs
FROM toks
GROUP BY token
HAVING count(*) >= 10
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup module, exact method (hash-groupBy, min id wins)."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: dd
    module: dedup
    inputs: [documents]
    parameters:
      method: exact
      idField: doc_id
      fields: [text]
""", "dd")


Q_DEDUP_EXACT_SQL = """
SELECT * FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""


def q_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textstats: token_count, subword estimate, md5 fingerprint, quality."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: st
    module: textstats
    inputs: [documents]
    parameters:
      field: text
      ops: [token_count, subword_count, fingerprint, quality]
""", "st").select("doc_id", "n_tokens", "n_subwords", "fingerprint", "quality")


Q_TEXTSTATS_SQL = """
WITH norm AS (
  SELECT doc_id, text,
         trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')) AS ntext
  FROM documents
), base AS (
  SELECT doc_id, text, ntext,
         length(string_split(ntext, ' ')) AS n_tokens,
         CAST(ceil(length(coalesce(text, '')) / 3.2) AS BIGINT) AS n_subwords,
         md5(ntext) AS fingerprint,
         length(coalesce(text, '')) AS n_chars,
         length(regexp_replace(coalesce(text, ''), '[^!-/:-@\\[-`{-~]', '', 'g')) AS n_punct,
         length(regexp_replace(coalesce(text, ''), '[^0-9]', '', 'g')) AS n_digits
  FROM norm
)
SELECT doc_id, n_tokens, n_subwords, fingerprint,
       round((
         least(n_chars / 200.0, 1.0)
         + (1.0 - least(n_punct * 5.0 / greatest(n_chars, 1), 1.0))
         + (1.0 - least(n_digits * 5.0 / greatest(n_chars, 1), 1.0))
         + (CASE WHEN n_chars * 1.0 / greatest(n_tokens, 1) BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)
       ) / 4, 6) AS quality
FROM base
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup module, exact n-gram Jaccard pair similarity."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: jc
    module: dedup
    inputs: [documents]
    parameters:
      method: ngram_jaccard
      idField: doc_id
      field: text
      ngram: 3
      threshold: 0.2
""", "jc").withColumn("jaccard", F.round("jaccard", 6))


Q_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(length(t) - 2, 0)),
           i -> array_to_string(t[i:i+2], ' ')))) AS g
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), overlap AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS o
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(o * 1.0 / (sa.n + sb.n - o), 6) AS jaccard
FROM overlap
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE o * 1.0 / (sa.n + sb.n - o) >= 0.2
"""


def q_similarity_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity module: exact cosine top-5 for 3 query vectors."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = f"""
sources:
  - name: embeddings
    module: storage
    parameters: {{format: parquet, input: {sf_dir}/embeddings.parquet}}
transforms:
  - name: queries
    module: filter
    inputs: [embeddings]
    parameters:
      filters: [{{key: vec_id, op: "<", value: 3}}]
      select:
        - {{name: query_id, field: vec_id}}
        - {{name: query_vec, field: embedding}}
  - name: knn
    module: similarity
    inputs: [embeddings]
    sideInputs: [queries]
    parameters:
      method: brute_force
      k: 5
      vectorField: embedding
      idField: vec_id
"""
    df = run_pipeline(spark, parse_config(src))["knn"]
    return df.select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")


Q_SIM_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(q.qv, e.embedding::DOUBLE[])
         / (sqrt(list_dot_product(q.qv, q.qv))
            * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos
  FROM q, embeddings e
)
SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 5
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup module, embedding-cosine near-dup pairs (exact all-pairs,
    the validation oracle; guarded by maxExactRows in the module)."""
    return _pipeline(spark, sf_dir, ["embeddings"], """
transforms:
  - name: nd
    module: dedup
    inputs: [embeddings]
    parameters:
      method: embedding
      strategy: exact
      idField: vec_id
      vectorField: embedding
      threshold: 0.5
""", "nd").withColumn("cosine", F.round("cosine", 6))


def q_embedding_neardup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup module, SRP-bucketed embedding near-dup — the 100 TB path
    (no driver collect, no corpus broadcast).  Low bits / many tables so
    recall reaches 1 on the test corpus even for a cos≈0.51 pair; at a
    0.95-threshold production run, bits=8/tables=8 gives the same recall
    with far smaller buckets."""
    return _pipeline(spark, sf_dir, ["embeddings"], """
transforms:
  - name: nd
    module: dedup
    inputs: [embeddings]
    parameters:
      method: embedding
      idField: vec_id
      vectorField: embedding
      threshold: 0.5
      bits: 2
      tables: 16
""", "nd").withColumn("cosine", F.round("cosine", 6))


Q_NEARDUP_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         list_dot_product(a.e, b.e)
         / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cos
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT doc_a, doc_b, round(cos, 6) AS cosine FROM pairs WHERE cos >= 0.5
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal extract_meta over binary payload column."""
    df = _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: binarized
    module: select
    inputs: [documents]
    parameters:
      select:
        - {name: doc_id}
        - {name: payload, func: cast, field: text, type: bytes}
  - name: meta
    module: multimodal
    inputs: [binarized]
    parameters:
      op: extract_meta
      field: payload
      idField: doc_id
""", "meta")
    return df.select("doc_id", "mime", "payload_size")


Q_MULTIMODAL_SQL = """
SELECT doc_id, 'application/octet-stream' AS mime, octet_length(encode(text)) AS payload_size
FROM documents
"""


def q_image_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode e2e: per-doc payloads are ENCODED in-executor with
    the native codecs (PNG / baseline JPEG / GIF / lossless WebP rotating by id) at
    id-derived dimensions, then decoded back through the multimodal decode
    op; the oracle recomputes the dimension formulas in SQL — a hash
    mismatch means a codec round-trip broke."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from pipeline_spark.operators.multimodal import multimodal_transform
    from pipeline_spark.registry import ModuleContext

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") % 10 == 0)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipeline_spark.functions.gifcodec import encode_gif
        from pipeline_spark.functions.imagecodec import encode_png
        from pipeline_spark.functions.jpegcodec import encode_jpeg
        from pipeline_spark.functions.vp8lcodec import encode_webp

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 9, 8 + did % 7
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(xx * 255 // max(w - 1, 1)), (yy * 255 // max(h - 1, 1)),
                     np.full((h, w), did % 256)], axis=2
                ).astype(np.uint8)
                fmt = did % 4
                if fmt == 0:
                    payloads.append(encode_png(img))
                elif fmt == 1:
                    payloads.append(encode_jpeg(img, quality=90))
                elif fmt == 2:
                    payloads.append(encode_gif(img))
                else:
                    payloads.append(encode_webp(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    import pyspark.sql.types as T

    # spread the id list BEFORE payloads exist: the single-row-group
    # fixture scan would otherwise run the whole codec pass in ONE Python
    # worker; only ids shuffle, payload bytes never move (no-op at scale)
    payload_df = _spread_ids(docs).mapInPandas(
        gen,
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    decoded = multimodal_transform(ModuleContext(
        spark=spark, name="mm", params={"op": "decode", "field": "payload",
                                        "idField": "doc_id"},
        inputs=[payload_df], input_names=["in"], config={},
    ))[""]
    return decoded.select("doc_id", "width", "height")


Q_IMAGE_CODEC_SQL = """
SELECT doc_id, 8 + doc_id % 9 AS width, 8 + doc_id % 7 AS height
FROM documents WHERE doc_id % 10 = 0
"""


def q_audio_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode e2e: id-derived sine clips encoded in-executor by
    the native codecs (WAV, FLAC every other row), decoded back through
    the format-dispatching audio_features op; the
    oracle recomputes duration/rate/channels formulas in SQL."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from pipeline_spark.operators.multimodal import multimodal_transform
    from pipeline_spark.registry import ModuleContext

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") % 10 == 0)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipeline_spark.functions.audiocodec import encode_wav
        from pipeline_spark.functions.flaccodec import encode_flac

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 800 + (did % 5) * 80
                ch = 1 + did % 2
                t = np.linspace(0, n / 8000.0, n, endpoint=False)
                sig = np.stack(
                    [0.5 * np.sin(2 * np.pi * (200 + did % 7 * 100) * t)] * ch,
                    axis=1,
                )
                enc = encode_flac if did % 20 == 0 else encode_wav
                payloads.append(enc(sig, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    import pyspark.sql.types as T

    # spread the id list BEFORE payloads exist: the single-row-group
    # fixture scan would otherwise run the whole codec pass in ONE Python
    # worker; only ids shuffle, payload bytes never move (no-op at scale)
    payload_df = _spread_ids(docs).mapInPandas(
        gen,
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    feat = multimodal_transform(ModuleContext(
        spark=spark, name="mm", params={"op": "audio_features", "field": "payload"},
        inputs=[payload_df], input_names=["in"], config={},
    ))[""]
    return feat.select(
        "doc_id",
        F.round("duration_s", 6).alias("duration_s"),
        "sample_rate",
        "channels",
    )


Q_AUDIO_SQL = """
SELECT doc_id,
       round((800 + (doc_id % 5) * 80) / 8000.0, 6) AS duration_s,
       8000 AS sample_rate,
       1 + doc_id % 2 AS channels
FROM documents WHERE doc_id % 10 = 0
"""


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregation: std, count_distinct, median, weighted avg, regression."""
    df = _pipeline(spark, sf_dir, ["lineitem"], """
transforms:
  - name: agg
    module: aggregation
    inputs: [lineitem]
    parameters:
      groupFields: [l_returnflag]
      aggregations:
        - {name: std_price, op: std, field: l_extendedprice}
        - {name: n_parts, op: count_distinct, field: l_partkey}
        - {name: med_qty, op: median, field: l_quantity}
        - {name: wavg_disc, op: avg, field: l_discount, weightField: l_quantity}
        - {name: reg, op: simple_regression, field: l_extendedprice, xField: l_quantity}
""", "agg")
    return df.select(
        "l_returnflag",
        F.round("std_price", 4).alias("std_price"),
        "n_parts",
        F.round("med_qty", 4).alias("med_qty"),
        F.round("wavg_disc", 6).alias("wavg_disc"),
        F.round(F.col("reg.Slope"), 4).alias("slope"),
        F.round(F.col("reg.Intercept"), 4).alias("intercept"),
    )


Q_AGG_STATS_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS std_price,
       count(DISTINCT l_partkey) AS n_parts,
       round(median(l_quantity), 4) AS med_qty,
       round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wavg_disc,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
FROM lineitem
GROUP BY l_returnflag
"""


def q_multi_input_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi-input aggregation: per-input aggregator lists joined on the
    group key (reference: AggregationTransform multi-input semantics,
    SURVEY §2.2)."""
    df = _pipeline(spark, sf_dir, ["orders", "lineitem"], """
transforms:
  - name: keyed_orders
    module: select
    inputs: [orders]
    parameters:
      select:
        - {name: k, field: o_orderkey}
        - {name: o_totalprice}
  - name: keyed_items
    module: select
    inputs: [lineitem]
    parameters:
      select:
        - {name: k, field: l_orderkey}
        - {name: l_quantity}
  - name: agg
    module: aggregation
    inputs: [keyed_orders, keyed_items]
    parameters:
      groupFields: [k]
      aggregations:
        - input: keyed_orders
          fields:
            - {name: total, op: sum, field: o_totalprice}
        - input: keyed_items
          fields:
            - {name: qty, op: sum, field: l_quantity}
            - {name: n_items, op: count}
""", "agg")
    return df.select(
        "k",
        F.round("total", 2).alias("total"),
        F.round("qty", 2).alias("qty"),
        "n_items",
    )


Q_MULTI_AGG_SQL = """
SELECT coalesce(a.k, b.k) AS k, a.total, b.qty, b.n_items
FROM (SELECT o_orderkey AS k, round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1) a
FULL OUTER JOIN (SELECT l_orderkey AS k, round(sum(l_quantity), 2) AS qty, count(*) AS n_items
                 FROM lineitem GROUP BY 1) b
ON a.k = b.k
"""


def q_sql_mdt_udfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """beamsql module with MDT_* compatibility functions
    (reference: BeamSQLTransform.java:168-186, beamsqludf.md)."""
    return _pipeline(spark, sf_dir, ["orders"], """
transforms:
  - name: q
    module: beamsql
    inputs: [orders]
    parameters:
      sql: |
        SELECT o_orderkey,
               MDT_GREATEST_INT64(o_orderkey % 7, o_custkey % 7) AS g,
               MDT_LEAST_INT64(o_orderkey % 7, o_custkey % 7) AS l,
               MDT_CONTAINS_ALL_INT64(array(1L, 2L, 3L), array(o_orderkey % 3 + 1)) AS c
        FROM orders
""", "q")


Q_MDT_SQL = """
SELECT o_orderkey,
       greatest(o_orderkey % 7, o_custkey % 7) AS g,
       least(o_orderkey % 7, o_custkey % 7) AS l,
       list_has_all([1, 2, 3], [o_orderkey % 3 + 1]) AS c
FROM orders
"""


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup module, MinHash-LSH candidates + exact-Jaccard verification.

    The banding stage is the approximate candidate generator (recall ≈ 1
    for pairs at j ≥ threshold: miss prob (1-j^4)^16 < 1e-7 at j=0.9);
    the exact verify makes the OUTPUT the exact pair set, so the DuckDB
    oracle recomputes it from scratch — a full end-to-end check of the
    signature/banding path (a broken signature drops candidates → red)."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: mh
    module: dedup
    inputs: [documents]
    parameters:
      method: minhash_lsh
      idField: doc_id
      field: text
      numHashes: 64
      bands: 16
      threshold: 0.2
      exactVerify: true
      outputPairs: true
""", "mh").withColumn("jaccard", F.round("jaccard", 6))


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup module, SimHash pigeonhole candidates (hamming ≤ 6) + exact
    verification — same oracle-equality contract as minhash_pairs; checks
    the simhash signature + multi-index block join end-to-end."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: sh
    module: dedup
    inputs: [documents]
    parameters:
      method: simhash
      idField: doc_id
      field: text
      outputPairs: true
      maxHamming: 6
      exactVerify: true
      ngram: 3
      threshold: 0.2
""", "sh").withColumn("jaccard", F.round("jaccard", 6))


def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash pairs → distributed connected components → cluster labels.

    Exercises the large-star/small-star CC loop (functions/graph.py) end
    to end: the exact-verified pair set becomes an edge list, every doc in
    a near-dup cluster gets the component-minimum doc_id as its cluster
    id.  The oracle recomputes the transitive closure from scratch with a
    DuckDB recursive CTE — a disagreement in ANY iteration of the star
    algorithm (a dropped edge, a wrong min) flips at least one label."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: cl
    module: dedup
    inputs: [documents]
    parameters:
      method: minhash_lsh
      idField: doc_id
      field: text
      numHashes: 64
      bands: 16
      threshold: 0.2
      exactVerify: true
      outputClusters: true
""", "cl")


Q_CLUSTER_SQL = """
WITH RECURSIVE toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(length(t) - 2, 0)),
           i -> array_to_string(t[i:i+2], ' ')))) AS g
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), overlap AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS o
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b
  FROM overlap
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE o * 1.0 / (sa.n + sb.n - o) >= 0.2
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
), reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node
)
SELECT node AS doc_id, min(r) AS cluster_id
FROM reach GROUP BY node
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via the binned-equi-join technique: event
    values land in nation-derived value bands.  Binning restores a hash
    join where a BETWEEN theta-join would plan broadcast-nested-loop;
    the oracle is the naive BETWEEN join."""
    return _pipeline(spark, sf_dir, ["events", "nation"], """
transforms:
  - name: bands
    module: beamsql
    inputs: [nation]
    parameters:
      sql: "SELECT n_nationkey AS band_id, CAST(n_nationkey * 20 AS DOUBLE) AS lo, CAST(n_nationkey * 20 + 19.99 AS DOUBLE) AS hi FROM nation"
  - name: joined
    module: rangejoin
    inputs: [events]
    sideInputs: [bands]
    parameters:
      point: value
      lo: lo
      hi: hi
      binSize: 20.0
""", "joined").select("event_id", "band_id")


Q_RANGE_JOIN_SQL = """
WITH bands AS (
  SELECT n_nationkey AS band_id, n_nationkey * 20.0 AS lo,
         n_nationkey * 20.0 + 19.99 AS hi
  FROM nation
)
SELECT e.event_id, b.band_id
FROM events e JOIN bands b ON e.value >= b.lo AND e.value <= b.hi
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session labeling: per user, a >10-minute silence starts
    a new session; each event carries its 1-based session ordinal.  One
    keyed window pass; the oracle recomputes with SQL window functions."""
    return _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: sess
    module: sessionize
    inputs: [events]
    parameters:
      keys: [user_id]
      timestampField: ts
      gapSeconds: 600
""", "sess").select("event_id", "user_id", "session_id")


Q_SESSIONIZE_SQL = """
WITH e AS (
  SELECT event_id, user_id, ts, epoch_us(ts) AS us FROM events
), m AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR us - lag(us) OVER (PARTITION BY user_id ORDER BY ts)
                   > 600000000
              THEN 1 ELSE 0 END AS ns
  FROM e
)
SELECT event_id, user_id,
       CAST(sum(ns) OVER (
         PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS session_id
FROM m
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (pandas merge_asof / DuckDB ASOF JOIN semantics): each
    click event picks up the latest view event of the same user at or
    before it.  Engine shape is union + keyed window carry (one shuffle,
    no row multiplication); the oracle is DuckDB's native ASOF JOIN."""
    return _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: clicks
    module: beamsql
    inputs: [events]
    parameters:
      sql: "SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'"
  - name: views
    module: beamsql
    inputs: [events]
    parameters:
      sql: "SELECT user_id, ts, value FROM events WHERE event_type = 'view'"
  - name: joined
    module: asof
    inputs: [clicks]
    sideInputs: [views]
    parameters:
      keys: [user_id]
      leftTimestamp: ts
""", "joined").select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("click_ts"),
        F.col("value").alias("view_value"),
        F.col("ts_right").cast("string").alias("view_ts"),
    )


Q_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), views AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'view'
)
SELECT c.event_id, c.user_id,
       CAST(c.ts AS VARCHAR) AS click_ts,
       v.value AS view_value,
       CAST(v.ts AS VARCHAR) AS view_ts
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling of the documents table: null counts,
    exact distincts, native-type min/max (cast after comparing), numeric
    means.  The oracle recomputes every statistic per column.
    ``integerStats`` makes the float stats representation-proof: integral
    means via exact decimal sum + one double division, then every float
    statistic emits as scaled BIGINT micro-units (round(x*1e6)) — an
    integer admits exactly one representation on every engine."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: prof
    module: profile
    inputs: [documents]
    parameters:
      columns: [doc_id, lang, source, n_chars]
      percentiles: [0.5, 0.95]
      integerStats: true
""", "prof")


Q_PROFILE_SQL = """
SELECT 'doc_id' AS column, 'bigint' AS dtype, count(*) AS n_rows,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT doc_id) AS n_distinct,
       CAST(min(doc_id) AS VARCHAR) AS min_value,
       CAST(max(doc_id) AS VARCHAR) AS max_value,
       CAST(round(CAST(sum(doc_id) AS DOUBLE) / count(doc_id) * 1e6)
            AS BIGINT) AS mean_micros,
       CAST(round(quantile_cont(doc_id, 0.5) * 1e6) AS BIGINT) AS p50_micros,
       CAST(round(quantile_cont(doc_id, 0.95) * 1e6) AS BIGINT) AS p95_micros
FROM documents
UNION ALL
SELECT 'lang', 'string', count(*),
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT lang), CAST(min(lang) AS VARCHAR),
       CAST(max(lang) AS VARCHAR), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM documents
UNION ALL
SELECT 'source', 'string', count(*),
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT source), CAST(min(source) AS VARCHAR),
       CAST(max(source) AS VARCHAR), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM documents
UNION ALL
SELECT 'n_chars', 'bigint', count(*),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR),
       CAST(max(n_chars) AS VARCHAR),
       CAST(round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars) * 1e6)
            AS BIGINT),
       CAST(round(quantile_cont(n_chars, 0.5) * 1e6) AS BIGINT),
       CAST(round(quantile_cont(n_chars, 0.95) * 1e6) AS BIGINT)
FROM documents
"""


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC sink+source (ISO 28500, stdlib codec): documents written as
    per-record gzip members, read back via the binaryFile-per-file scan,
    doc ids recovered from the target URI and payload decoded; the
    oracle reads the original table directly."""
    import os
    import shutil
    import tempfile

    out = _tmp_path("warc_rt", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    run_pipeline(spark, parse_config(f"""
sources:
  - name: documents
    module: storage
    parameters: {{format: parquet, input: {sf_dir}/documents.parquet}}
transforms:
  - name: recs
    module: beamsql
    inputs: [documents]
    parameters:
      sql: "SELECT concat('doc://', CAST(doc_id AS STRING)) AS uri, text AS payload FROM documents"
  - name: sharded
    module: reshuffle
    inputs: [recs]
    parameters: {{numShards: 8}}
sinks:
  - name: w
    module: warc
    inputs: [sharded]
    parameters: {{output: {out}}}
"""))
    outs = run_pipeline(spark, parse_config(f"""
sources:
  - name: back
    module: warc
    parameters: {{input: {out}/*.warc.gz}}
"""))
    return outs["back"].select(
        F.regexp_extract("target_uri", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )


Q_WARC_RT_SQL = """
SELECT doc_id, text FROM documents
"""


# r12 (VERDICT r11 ask #5): the train+apply path, made oracle-checkable.
# The merge loop is deterministic given the corpus (ties break on the
# lexicographically smallest pair), so encoding a HELD-OUT fixture
# string with the trained table is a pure function of the sf0.01
# documents corpus — precomputed once and pinned as a VALUES oracle
# (the driver's correctness gate runs at sf0.01 only).  Any drift in
# word counting, merge learning, or the distributed encode UDF shifts
# the token stream and hash-mismatches.
_BPE_FIXTURE = "streaming tablescan aggregates the windowed rowgroups quickly"
_BPE_EXPECT = [
    "st", "r", "e", "a", "m", "in", "g", "t", "a", "b", "l", "e",
    "scan", "a", "g", "g", "r", "e", "g", "at", "e", "s", "t", "h",
    "e", "w", "in", "d", "ow", "e", "d", "row", "g", "r", "o", "u",
    "p", "s", "q", "u", "i", "c", "k", "l", "y",
]


def q_bpe_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successor to the rows-only ``bpe_train`` row: train 30 merges on
    the documents corpus, then encode the held-out fixture through the
    same distributed BPE UDF the tokenize module uses; (pos, token)
    oracle-pinned against the precomputed sf0.01 token stream."""
    return _pipeline(spark, sf_dir, ["documents"], f"""
transforms:
  - name: bpe
    module: bpe_train
    inputs: [documents]
    parameters:
      field: text
      numMerges: 30
      maxWords: 20000
      encodeText: "{_BPE_FIXTURE}"
""", "bpe")


Q_BPE_ENCODE_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"({i}, '{t}')" for i, t in enumerate(_BPE_EXPECT)
) + ") AS t(pos, token)"


def q_bpe_wordcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale stage of BPE training in isolation: the
    distributed (word, freq) count with deterministic cap tie-break —
    SQL-checkable, unlike the driver-side merge loop (whose parity is
    pinned in tests/test_llm_ops.py)."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: bpe
    module: bpe_train
    inputs: [documents]
    parameters:
      field: text
      stage: counts
      maxWords: 5000
""", "bpe")


Q_BPE_WORDCOUNTS_SQL = """
WITH words AS (
  SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
  FROM documents
)
SELECT word, count(*) AS freq
FROM words WHERE word <> ''
GROUP BY word
ORDER BY freq DESC, word ASC
LIMIT 5000
"""


_SEMDEDUP_YAML = """
transforms:
  - name: sem
    module: dedup
    inputs: [embeddings]
    parameters:
      method: semantic
      idField: vec_id
      vectorField: embedding
      clusters: 8
      threshold: 0.4
"""

_SEMDEDUP_SQL_BASE = """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), cents AS (
  SELECT vec_id AS cid, v AS cv FROM vecs WHERE vec_id < 8
), sim AS (
  SELECT vecs.vec_id, cid,
         list_dot_product(v, cv)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS cos
  FROM vecs CROSS JOIN cents
), assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
    FROM sim) t WHERE rn = 1
)
"""


def q_semdedup_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup stage 1 (Abbas et al. 2023): nearest-centroid assignment
    by cosine, centroids seeded deterministically from the 8 lowest-id
    vectors (iterations=0 — the SQL-reproducible path; iterations>0 runs
    sample-bounded k-means).  Oracle recomputes the argmax per vector."""
    return _pipeline(spark, sf_dir, ["embeddings"], """
transforms:
  - name: sem
    module: dedup
    inputs: [embeddings]
    parameters:
      method: semantic
      idField: vec_id
      vectorField: embedding
      clusters: 8
      outputAssignments: true
""", "sem")


Q_SEMDEDUP_ASSIGN_SQL = _SEMDEDUP_SQL_BASE + """
SELECT vec_id, CAST(cid AS INTEGER) AS cluster FROM assign
"""


def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup stage 2: within each cluster drop any vector with a
    lower-id cluster-mate above the cosine threshold (greedy, id-ordered,
    no transitive chaining).  The synthetic embeddings have no true
    near-dups, so the threshold sits at 0.4 to exercise real drops;
    production runs use ~0.95.  Oracle recomputes the in-cluster pair
    cosines and the NOT-EXISTS keep rule."""
    return _pipeline(
        spark, sf_dir, ["embeddings"], _SEMDEDUP_YAML, "sem"
    ).select("vec_id", "label")


Q_SEMDEDUP_PRUNE_SQL = _SEMDEDUP_SQL_BASE + """
, dropped AS (
  SELECT DISTINCT j.vec_id
  FROM assign i
  JOIN assign j ON i.cid = j.cid AND i.vec_id < j.vec_id
  JOIN vecs vi ON vi.vec_id = i.vec_id
  JOIN vecs vj ON vj.vec_id = j.vec_id
  WHERE list_dot_product(vi.v, vj.v)
          / (sqrt(list_dot_product(vi.v, vi.v)) * sqrt(list_dot_product(vj.v, vj.v)))
        > 0.4
)
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
"""


def q_topk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: top-20 words corpus-wide via the Misra-Gries
    candidate/recount sketch (counters=2048).  Final weights are EXACT
    recounts of sketch survivors; any word above total/2048 support is
    guaranteed in, so the true top-20 is deterministic and the exact
    group-count oracle matches.  Ties break on value ascending."""
    return _pipeline(spark, sf_dir, ["documents"], r"""
transforms:
  - name: words
    module: beamsql
    inputs: [documents]
    parameters:
      sql: "SELECT explode(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')) AS word FROM documents"
  - name: top
    module: topk
    inputs: [words]
    parameters:
      field: word
      k: 20
      counters: 2048
""", "top")


Q_TOPK_SQL = """
WITH words AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents
)
SELECT word AS value, CAST(count(*) AS DOUBLE) AS weight
FROM words GROUP BY word
ORDER BY weight DESC, value ASC LIMIT 20
"""


def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a history corpus via a Bloom filter.

    History = docs with doc_id < 250; batch = the whole table.  The
    module builds a membership filter over the history's content hashes
    (compact broadcast, no join) and keeps only "definitely new" docs.
    fpp=1e-9 over a few hundred probes makes a false positive
    effectively impossible AND deterministic on fixed data, so the
    exact NOT-IN anti-join oracle matches bit-for-bit."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: history
    module: beamsql
    inputs: [documents]
    parameters:
      sql: "SELECT doc_id, text FROM documents WHERE doc_id < 250"
  - name: fresh
    module: dedup
    inputs: [documents]
    sideInputs: [history]
    parameters:
      method: bloom
      field: text
      fpp: 1.0e-9
""", "fresh").select("doc_id", "n_chars")


Q_BLOOM_DEDUP_SQL = """
SELECT doc_id, n_chars
FROM documents
WHERE text NOT IN (SELECT text FROM documents WHERE doc_id < 250)
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-overlap decontamination report.

    Benchmark side = every 25th document (deterministic slice via SQL);
    the module counts each doc's distinct 8-gram hashes hitting the
    broadcast benchmark gram set.  Benchmark members self-match at
    overlap 1.0, their near-dups partially — the oracle recomputes the
    same join from raw text."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: bench
    module: beamsql
    inputs: [documents]
    parameters:
      sql: "SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0"
  - name: decon
    module: decontaminate
    inputs: [documents]
    sideInputs: [bench]
    parameters:
      idField: doc_id
      field: text
      ngram: 8
""", "decon").withColumn("overlap", F.round("overlap", 6))


Q_DECON_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), glist AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(length(t) - 7, 0)),
           i -> array_to_string(t[i:i+7], ' '))) AS gs
  FROM toks
), sizes AS (
  SELECT doc_id, length(gs) AS n_grams FROM glist
), grams AS (
  SELECT doc_id, unnest(gs) AS g FROM glist
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 25 = 0
), matched AS (
  SELECT grams.doc_id, count(*) AS matched
  FROM grams JOIN bench USING (g)
  GROUP BY 1
)
SELECT s.doc_id, s.n_grams,
       coalesce(m.matched, 0) AS matched,
       CASE WHEN s.n_grams > 0
            THEN round(coalesce(m.matched, 0) * 1.0 / s.n_grams, 6)
            ELSE 0.0 END AS overlap
FROM sizes s LEFT JOIN matched m ON m.doc_id = s.doc_id
"""


def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: md5(salt||id) ordering key.

    The permutation key is engine-reproducible — the oracle recomputes
    it; order itself is asserted in tests (the driver compare is
    order-insensitive by design)."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: sh
    module: sample
    inputs: [documents]
    parameters:
      method: shuffle
      keyField: doc_id
      salt: ep1
""", "sh").select("doc_id", "shuffle_key")


Q_SHUFFLE_SQL = """
SELECT doc_id, md5('ep1' || doc_id) AS shuffle_key FROM documents
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier (fasttext-style) over documents.

    The 256-bucket weight table is generated from a fixed integer
    recurrence on BOTH sides, so the oracle rebuilds the exact model and
    recomputes every score from raw text — md5 feature hashing, weight
    lookup, mean, sigmoid, bit-for-bit."""
    weights = [((i + 1) * 2654435761 % 1000) / 1000.0 - 0.5 for i in range(256)]
    wlist = ", ".join(repr(w) for w in weights)
    return _pipeline(spark, sf_dir, ["documents"], f"""
transforms:
  - name: clf
    module: textstats
    inputs: [documents]
    parameters:
      field: text
      ops: [classifier]
      weights: [{wlist}]
      bias: 0.1
""", "clf").select("doc_id", "clf_score")


Q_CLASSIFIER_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), w AS (
  SELECT list_transform(
           generate_series(0, 255),
           i -> ((i + 1) * 2654435761) % 1000 / 1000.0 - 0.5) AS wl
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-(0.1 +
         list_sum(list_transform(t, tok ->
           wl[(ascii(substr(md5(tok), 1, 1))
               - CASE WHEN ascii(substr(md5(tok), 1, 1)) >= 97 THEN 87 ELSE 48 END) * 16
              + (ascii(substr(md5(tok), 2, 1))
               - CASE WHEN ascii(substr(md5(tok), 2, 1)) >= 97 THEN 87 ELSE 48 END) + 1]))
         / greatest(length(t), 1)))), 6) AS clf_score
FROM toks, w
"""


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span analysis (Lee-et-al exact-substring-dedup shape):
    per doc, distinct 5-gram count, how many occur in ≥2 docs, and the
    internal repetition ratio.  Oracle recomputes document frequencies
    from raw text."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: rep
    module: repetition
    inputs: [documents]
    parameters:
      mode: spans
      idField: doc_id
      field: text
      ngram: 5
      minFreq: 2
""", "rep").select(
        "doc_id", "n_spans", "dup_spans",
        F.round("dup_fraction", 6).alias("dup_fraction"),
        F.round("internal_repetition", 6).alias("internal_repetition"),
    )


Q_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), glist AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(length(t) - 4, 0)),
           i -> array_to_string(t[i:i+4], ' ')) AS gall
  FROM toks
), gd AS (
  SELECT doc_id, list_distinct(gall) AS gs, length(gall) AS total FROM glist
), grams AS (
  SELECT doc_id, unnest(gs) AS g FROM gd
), dfreq AS (
  SELECT g, count(*) AS df FROM grams GROUP BY g
), dup AS (
  SELECT doc_id, count(*) AS dup_spans
  FROM grams JOIN dfreq USING (g) WHERE df >= 2 GROUP BY 1
)
SELECT gd.doc_id,
       length(gs) AS n_spans,
       coalesce(dup.dup_spans, 0) AS dup_spans,
       CASE WHEN length(gs) > 0
            THEN round(coalesce(dup.dup_spans, 0) * 1.0 / length(gs), 6)
            ELSE 0.0 END AS dup_fraction,
       CASE WHEN total > 0
            THEN round(1.0 - length(gs) * 1.0 / total, 6)
            ELSE 0.0 END AS internal_repetition
FROM gd LEFT JOIN dup USING (doc_id)
"""


def q_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee-et-al ExactSubstr REMOVAL: every duplicated token-10-gram
    occurrence except the globally first (by doc_id, pos) is cut out of
    the normalized text; overlapping spans merge before cutting.  Oracle
    recomputes occurrence ranks and the rebuilt text from raw text."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: cut
    module: repetition
    inputs: [documents]
    parameters:
      mode: cut
      idField: doc_id
      field: text
      ngram: 10
""", "cut").select("doc_id", "text", "n_tokens", "n_removed")


Q_SUBSTRING_CUT_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), grams AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+9], ' ') AS g
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, greatest(length(t) - 9, 0))) AS i) s
), removals AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
    FROM grams) r WHERE rn > 1
), covered AS (
  SELECT DISTINCT doc_id, pos + j AS idx
  FROM removals, LATERAL (SELECT unnest(generate_series(0, 9)) AS j) s
), toku AS (
  SELECT doc_id, i - 1 AS idx, t[i] AS tok
  FROM toks, LATERAL (SELECT unnest(generate_series(1, length(t))) AS i) s
), kept AS (
  SELECT u.doc_id, u.idx, u.tok
  FROM toku u ANTI JOIN covered c ON u.doc_id = c.doc_id AND u.idx = c.idx
), rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text, count(*) AS kept_n
  FROM kept GROUP BY doc_id
)
SELECT toks.doc_id,
       coalesce(rebuilt.text, '') AS text,
       length(t) AS n_tokens,
       length(t) - coalesce(rebuilt.kept_n, 0) AS n_removed
FROM toks LEFT JOIN rebuilt USING (doc_id)
"""


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity module, SRP-LSH approximate top-k.

    Held to the exact brute-force oracle.  This corpus is random vectors
    (the only close neighbor is the query itself, rank-2+ sit at
    cos≈0.26), so recall-1 needs low bits / many tables: per-neighbor
    miss prob (1-0.58²)⁶⁴ ≈ 3e-12, and the seeded hyperplanes make the
    result deterministic.  On a real corpus where neighbors are actually
    near (cos ≥ 0.8), bits=8-16 gives the same recall with candidate
    counts ≈ N·Q/2^bits — the knob trades scan fraction for how far down
    the similarity range recall must hold."""
    src_yaml = """
transforms:
  - name: queries
    module: filter
    inputs: [embeddings]
    parameters:
      filters: [{key: vec_id, op: "<", value: 3}]
      select:
        - {name: query_id, field: vec_id}
        - {name: query_vec, field: embedding}
  - name: knn
    module: similarity
    inputs: [embeddings]
    sideInputs: [queries]
    parameters:
      method: lsh
      k: 5
      bits: 2
      tables: 64
      dim: 64
      vectorField: embedding
      idField: vec_id
"""
    return _pipeline(spark, sf_dir, ["embeddings"], src_yaml, "knn").select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sample module: deterministic md5-prefix train/val/test split —
    per-split counts (disjoint + exhaustive by construction; the oracle
    recomputes the same md5 bucketing)."""
    outs = _pipeline_multi(spark, sf_dir, ["documents"], """
transforms:
  - name: sp
    module: sample
    inputs: [documents]
    parameters:
      method: split
      keyField: doc_id
      splits: {train: 0.8, val: 0.1, test: 0.1}
""")
    parts = []
    for name in ("train", "val", "test"):
        parts.append(
            outs[f"sp.{name}"].groupBy().agg(
                F.lit(name).alias("split"), F.count(F.lit(1)).alias("n")
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


Q_SAMPLE_SQL = """
WITH h AS (
  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS p FROM documents
)
SELECT 'train' AS split, count(*) AS n FROM h WHERE p < 'cccccccd'
UNION ALL
SELECT 'val' AS split, count(*) AS n FROM h WHERE p >= 'cccccccd' AND p < 'e6666666'
UNION ALL
SELECT 'test' AS split, count(*) AS n FROM h WHERE p >= 'e6666666'
"""


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scrub module: PII redaction — emails/urls/ssn/cc/ip/phone masked
    with engine-portable regexes (same redaction in the DuckDB oracle)."""
    return _pipeline(spark, sf_dir, ["customer"], """
transforms:
  - name: seeded
    module: select
    inputs: [customer]
    parameters:
      select:
        - {name: c_custkey}
        - name: contact
          func: text
          text: "reach ${c_name} at user${c_custkey}@example.com or +1 (555) 010-${c_custkey} re 10.0.0.${c_custkey}"
  - name: clean
    module: scrub
    inputs: [seeded]
    parameters:
      fields: [contact]
""", "clean")


Q_SCRUB_SQL = r"""
WITH seeded AS (
  SELECT c_custkey,
         'reach ' || c_name || ' at user' || c_custkey ||
         '@example.com or +1 (555) 010-' || c_custkey ||
         ' re 10.0.0.' || c_custkey AS contact
  FROM customer
)
SELECT c_custkey,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(contact, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            'https?://[^\s<>"]+', '<URL>', 'g'),
          '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        '\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{1,4}\b', '<CC>', 'g'),
      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
    '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS contact
FROM seeded
"""


def q_processing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """processing module (legacy staged time-series processor): history
    expression, windowed sum over a count range, offset range, and lag —
    all one exchange on user_id.  Reference:
    module/transform/ProcessingTransform.java:39-1150."""
    df = _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: proc
    module: processing
    inputs: [events]
    timestampAttribute: ts
    parameters:
      stages:
        - name: stage1
          type: timeseries
          groupFields: [user_id]
          remainFields: [event_id]
          steps:
            - {name: delta, op: expression, expression: "value_0 - value_1"}
            - {name: sum5, op: sum, field: value, range: 5}
            - {name: prevsum, op: sum, field: value, ranges: [[1, 4]]}
            - {name: lagv, op: lag, field: value, lags: [2]}
""", "proc")
    return df.select(
        "user_id", "event_id",
        F.round("delta", 4).alias("delta"),
        F.round("sum5", 4).alias("sum5"),
        F.round("prevsum", 4).alias("prevsum"),
        F.round("lagv", 4).alias("lagv"),
    )


Q_PROCESSING_SQL = """
SELECT user_id, event_id,
       round(value - lag(value, 1) OVER w, 4) AS delta,
       round(sum(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS sum5,
       round(sum(value) OVER (w ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4) AS prevsum,
       round(lag(value, 2) OVER w, 4) AS lagv
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
"""


def q_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matchRecognize module: per-user row patterns — an error event
    followed by two consecutively rising values.  AFTER MATCH SKIP TO NEXT
    ROW emits every anchored match, which a LEAD-window oracle reproduces
    exactly (skip-past-last-row suppression is not SQL-expressible without
    recursion).  Reference: BeamSQLTransformTest.java:166-279 runs the
    same clause shape through Calcite."""
    return _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: matched
    module: matchRecognize
    inputs: [events]
    parameters:
      partitionBy: [user_id]
      orderBy: [ts, event_id]
      pattern: "A R{2}"
      define:
        A: "event_type = 'error'"
        R: "value > PREV(value, 1)"
      afterMatch: skip to next row
      measures:
        - {name: start_id, expression: "A.event_id"}
        - {name: v_a, expression: "A.value"}
        - {name: v_b, expression: "FIRST(R.value)"}
        - {name: v_c, expression: "LAST(R.value)"}
""", "matched")


Q_MATCHREC_SQL = """
SELECT user_id, event_id AS start_id, value AS v_a, v2 AS v_b, v3 AS v_c
FROM (
  SELECT user_id, event_id, event_type, value,
         lead(value, 1) OVER w AS v2,
         lead(value, 2) OVER w AS v3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE event_type = 'error' AND v2 > value AND v3 > v2
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack module: offset sequence packing into a 2048-token budget —
    per-(bucket, pack) doc counts and token sums; oracle reproduces the
    same hash-bucket + windowed-cumsum assignment."""
    df = _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: packed
    module: pack
    inputs: [documents]
    parameters:
      keyField: doc_id
      tokenBudget: 2048
      buckets: 8
""", "packed")
    return (
        df.groupBy("bucket", "pack_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tokens"))
    )


Q_PACK_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS n_tokens,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 8) AS bucket
  FROM documents
), placed AS (
  SELECT bucket, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM toks
)
SELECT bucket, CAST(start // 2048 AS BIGINT) AS pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens
FROM placed GROUP BY 1, 2
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity module, IVF (k-means inverted cells) approximate top-k.

    Probing ALL cells (nprobe=cells) makes IVF exhaustive — recall 1 by
    construction, so the exact brute-force oracle applies while the full
    train/assign/probe/join/re-rank machinery is exercised.  Production
    tuning is nprobe << cells (candidate fraction ≈ nprobe/cells)."""
    src_yaml = """
transforms:
  - name: queries
    module: filter
    inputs: [embeddings]
    parameters:
      filters: [{key: vec_id, op: "<", value: 3}]
      select:
        - {name: query_id, field: vec_id}
        - {name: query_vec, field: embedding}
  - name: knn
    module: similarity
    inputs: [embeddings]
    sideInputs: [queries]
    parameters:
      method: ivf
      k: 5
      cells: 16
      nprobe: 16
      kmeansIters: 3
      vectorField: embedding
      idField: vec_id
"""
    return _pipeline(spark, sf_dir, ["embeddings"], src_yaml, "knn").select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textstats lang_id heuristic (argmax stopword overlap)."""
    return _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: st
    module: textstats
    inputs: [documents]
    parameters:
      field: text
      ops: [lang_id]
""", "st").select("doc_id", "lang_pred")


def _lang_id_oracle_sql() -> str:
    """DuckDB replica of textstats.lang_id: per-language stopword-overlap
    score, strict-> argmax so the FIRST language reaching the max wins
    ties, 'und' when every score is zero."""
    from pipeline_spark.operators.textstats import LANG_STOPWORDS

    score_cols = []
    for lang, words in LANG_STOPWORDS.items():
        wl = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            f"len(list_filter(t, x -> list_contains([{wl}], x))) * 1.0"
            f" / greatest(len(t), 1) AS s_{lang}"
        )
    langs = list(LANG_STOPWORDS)
    g = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = "CASE WHEN " + g + " <= 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = {g} THEN '{l}'" for l in langs
    ) + " ELSE 'und' END"
    return f"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), scores AS (
  SELECT doc_id, {', '.join(score_cols)} FROM toks
)
SELECT doc_id, {case} AS lang_pred FROM scores
"""


def q_match_recognize_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matchRecognize hotKeyMode=chunked: bounded pattern, skip-to-next —
    chunk-parallel scanning with carry-over must equal the sequential
    semantics, which the lead()-window oracle expresses exactly."""
    return _pipeline(spark, sf_dir, ["lineitem"], """
transforms:
  - name: mr
    module: matchRecognize
    inputs: [lineitem]
    parameters:
      partitionBy: [l_suppkey]
      # full tie-free ordering: the synthetic lineitem has duplicate
      # (orderkey, linenumber) pairs within a suppkey, and adjacency
      # queries are ill-defined under ordering ties
      orderBy: [l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount]
      pattern: "A B"
      afterMatch: "skip to next row"
      define:
        A: "l_discount < 0.05"
        B: "l_discount >= 0.05"
      measures:
        - {expression: "SUM(A.l_quantity)", name: qa}
        - {expression: "SUM(B.l_quantity)", name: qb}
      hotKeyMode: chunked
      # ~600 rows per suppkey at every SF → 2-3 chunks per key: chunking
      # genuinely exercised without drowning in tiny applyInPandas groups
      hotKeyChunkSize: 256
""", "mr").select(
        "l_suppkey", F.round("qa", 2).alias("qa"), F.round("qb", 2).alias("qb")
    )


Q_MATCHREC_CHUNKED_SQL = """
WITH seq AS (
  SELECT l_suppkey, l_quantity, l_discount,
         lead(l_discount) OVER w AS next_disc,
         lead(l_quantity) OVER w AS next_qty
  FROM lineitem
  WINDOW w AS (PARTITION BY l_suppkey
               ORDER BY l_orderkey, l_linenumber, l_quantity,
                        l_extendedprice, l_discount)
)
SELECT l_suppkey, round(l_quantity, 2) AS qa, round(next_qty, 2) AS qb
FROM seq WHERE l_discount < 0.05 AND next_disc >= 0.05
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal decode, REAL path: PNG images synthesized in-query with
    dimensions derived from document fields, decoded by the stdlib codec
    (functions/imagecodec.py) inside the module; the oracle recomputes
    the dimensions arithmetically from the table."""
    import numpy as np

    from pipeline_spark.functions.imagecodec import encode_png

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") % 17 == 0
    )

    @F.pandas_udf("binary")
    def make_png(ids: pd.Series, nchars: pd.Series) -> pd.Series:
        out = []
        for doc_id, n in zip(ids, nchars):
            w = int(n) % 31 + 1
            h = (int(n) // 31) % 17 + 1
            rng = np.random.default_rng(int(doc_id))
            out.append(encode_png(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)))
        return pd.Series(out)

    imgs = docs.select(
        F.col("doc_id").alias("mm_id"), make_png("doc_id", "n_chars").alias("payload")
    )
    outs = run_pipeline(spark, parse_config("""
transforms:
  - name: dec
    module: multimodal
    inputs: [imgs]
    parameters: {op: decode, field: payload, idField: mm_id}
"""), inputs={"imgs": imgs})
    return outs["dec"].select(
        F.col("mm_id").alias("doc_id"), "width", "height"
    )


Q_MULTIMODAL_DECODE_SQL = """
SELECT doc_id,
       CAST(n_chars % 31 + 1 AS INTEGER) AS width,
       CAST((n_chars // 31) % 17 + 1 AS INTEGER) AS height
FROM documents WHERE doc_id % 17 = 0
"""


def _avro_zz(v: int) -> bytes:
    """Avro varint of zigzag(v) — spec-based, independent of the engine's
    decoder (functions/avrodec.py) so encode/decode bugs can't cancel."""
    u = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def q_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """processing linear_regression learner: per-user trailing-window OLS
    (features lagged by the horizon) predicting each row.  With a single
    feature + standardization, the fit is exactly slope/intercept least
    squares, which DuckDB recomputes with regr_slope/regr_intercept over
    the same window frame."""
    df = _pipeline(spark, sf_dir, ["events"], """
transforms:
  - name: base
    module: sql
    inputs: [events]
    parameters:
      sql: |
        SELECT user_id, ts, avg(value) AS v,
               unix_micros(CAST(ts AS TIMESTAMP)) / 1000000.0 - 1704067200 AS x
        FROM events GROUP BY user_id, ts
  - name: proc
    module: processing
    inputs: [base]
    timestampAttribute: ts
    parameters:
      groupFields: [user_id]
      steps:
        - name: v_pred
          op: linear_regression
          featureFields: [x]
          targetFields: [v]
          horizon: 1
          trainSize: 20
      remainFields: [v]
""", "proc")
    return df.filter(F.col("v_pred").isNotNull()).select(
        "user_id", "ts", F.round("v_pred", 2).alias("v_pred")
    )


Q_LINREG_SQL = """
WITH base AS (
  SELECT user_id, ts, avg(value) AS v, epoch(ts) - 1704067200 AS x
  FROM events GROUP BY user_id, ts
), seq AS (
  SELECT user_id, ts, v, x,
         lag(x, 1) OVER (PARTITION BY user_id ORDER BY ts) AS x_lag,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM base
), pairs AS (
  -- explicit 20-row frame join: a two-pass centered fit avoids the
  -- incremental-slide float drift of windowed regr_* aggregates
  SELECT a.user_id, a.rn AS anchor, a.ts, a.x AS x_cur,
         b.v AS y, b.x_lag AS xp
  FROM seq a JOIN seq b
    ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 19 AND a.rn
  WHERE a.rn > 20
), means AS (
  SELECT user_id, anchor, ts, any_value(x_cur) AS x_cur,
         avg(xp) AS mx, avg(y) AS my
  FROM pairs GROUP BY user_id, anchor, ts
), fit AS (
  SELECT p.user_id, p.anchor, m.ts, m.x_cur, m.mx, m.my,
         sum((p.xp - m.mx) * (p.y - m.my)) / sum((p.xp - m.mx) * (p.xp - m.mx)) AS slope
  FROM pairs p JOIN means m USING (user_id, anchor)
  GROUP BY p.user_id, p.anchor, m.ts, m.x_cur, m.mx, m.my
)
SELECT user_id, ts, round(slope * x_cur + (my - slope * mx), 2) AS v_pred
FROM fit
"""


def q_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence tokenizer (the OpenNLP analyzer stand-in,
    TokenAnalyzer.java:160-172): text synthesized from doc_id carries a
    leading abbreviation (Dr.) that must NOT split, two real boundaries,
    and a terminal exclamation — the oracle reconstructs the exact three
    sentences in SQL."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") % 25 == 0)
    )
    text = F.concat(
        F.lit("Dr. Smith saw "), F.col("doc_id"),
        F.lit(" cases. It took "), F.col("doc_id") % 7,
        F.lit(" days. Done!"),
    )
    synth = docs.withColumn("text", text)
    from pipeline_spark.operators.tokenize import tokenize_column

    sents = tokenize_column(F.col("text"), {"type": "sentence"}, [])
    out = synth.withColumn("sents", sents)
    return out.select(
        "doc_id",
        F.size("sents").alias("n_sentences"),
        F.element_at("sents", 1).alias("first_sentence"),
        F.element_at("sents", 3).alias("last_sentence"),
    )


Q_SENTENCE_SQL = """
SELECT doc_id,
       3 AS n_sentences,
       'Dr. Smith saw ' || doc_id || ' cases.' AS first_sentence,
       'Done!' AS last_sentence
FROM documents WHERE doc_id % 25 = 0
"""


def q_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video container parsing e2e: id-derived MP4s assembled
    in-executor by the ISO-BMFF box builder, parsed back through the
    video_meta op (functions/mp4box.py); the oracle recomputes the
    duration/dimension/count formulas in SQL."""
    from typing import Iterator

    import pandas as pd

    from pipeline_spark.operators.multimodal import multimodal_transform
    from pipeline_spark.registry import ModuleContext

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") % 25 == 0)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipeline_spark.functions.mp4box import build_mp4

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 5 + did % 9
                payloads.append(build_mp4(
                    [bytes([i & 0xFF]) * 12 for i in range(n)],
                    width=16 * (1 + did % 4), height=16 * (1 + did % 3),
                    timescale=1000, sample_delta=40,
                    sync_samples=list(range(1, n + 1, 2)),
                ))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    import pyspark.sql.types as T

    # spread the id list BEFORE payloads exist: the single-row-group
    # fixture scan would otherwise run the whole codec pass in ONE Python
    # worker; only ids shuffle, payload bytes never move (no-op at scale)
    payload_df = _spread_ids(docs).mapInPandas(
        gen,
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    meta = multimodal_transform(ModuleContext(
        spark=spark, name="vm",
        params={"op": "video_meta", "field": "payload", "idField": "doc_id"},
        inputs=[payload_df], input_names=["in"], config={},
    ))[""]
    return meta.select(
        "doc_id",
        F.round("duration_s", 6).alias("duration_s"),
        "video_width", "video_height", "n_samples", "n_keyframes",
    )


Q_VIDEO_META_SQL = """
SELECT doc_id,
       round(CAST((5 + doc_id % 9) * 0.04 AS DOUBLE), 6) AS duration_s,
       16 * (1 + doc_id % 4) AS video_width,
       16 * (1 + doc_id % 3) AS video_height,
       5 + doc_id % 9 AS n_samples,
       (5 + doc_id % 9 + 1) // 2 AS n_keyframes
FROM documents WHERE doc_id % 25 = 0
"""


def q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio container parsing e2e: id-derived MP3 / Ogg-Opus / WebM
    fixtures assembled in-executor by the spec-shaped builders
    (functions/mediacontainers.py), parsed back header-only through the
    audio_meta op; the oracle recomputes the duration/rate/count formulas
    per container in SQL."""
    from typing import Iterator

    import pandas as pd

    from pipeline_spark.operators.multimodal import multimodal_transform
    from pipeline_spark.registry import ModuleContext

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") % 25 == 0)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipeline_spark.functions.mediacontainers import (
            build_matroska,
            build_mp3,
            build_ogg_opus,
        )

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                kind = did % 3
                if kind == 0:
                    payloads.append(build_mp3(n_frames=10 + did % 7))
                elif kind == 1:
                    payloads.append(
                        build_ogg_opus(
                            duration_s=(1 + did % 5) * 0.25,
                            channels=1 + did % 2,
                        )
                    )
                else:
                    payloads.append(
                        build_matroska(
                            duration_s=(1 + did % 4) * 0.5,
                            audio={"codec": "A_OPUS", "sample_rate": 48000,
                                   "channels": 2},
                            cluster_blocks=[(2, False)] * (3 + did % 5),
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    import pyspark.sql.types as T

    # spread the id list BEFORE payloads exist: the single-row-group
    # fixture scan would otherwise run the whole codec pass in ONE Python
    # worker; only ids shuffle, payload bytes never move (no-op at scale)
    payload_df = _spread_ids(docs).mapInPandas(
        gen,
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    meta = multimodal_transform(ModuleContext(
        spark=spark, name="am",
        params={"op": "audio_meta", "field": "payload"},
        inputs=[payload_df], input_names=["in"], config={},
    ))[""]
    return meta.select(
        "doc_id", "container", "audio_codec",
        F.round("duration_s", 6).alias("duration_s"),
        "sample_rate", "channels", "n_frames",
    )


Q_AUDIO_META_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'mp3' WHEN 1 THEN 'ogg' ELSE 'webm' END
         AS container,
       CASE doc_id % 3 WHEN 0 THEN 'mp3' WHEN 1 THEN 'opus' ELSE 'A_OPUS' END
         AS audio_codec,
       CASE doc_id % 3
         WHEN 0 THEN round((10 + doc_id % 7) * 1152.0 / 44100, 6)
         WHEN 1 THEN round((1 + doc_id % 5) * 0.25, 6)
         ELSE round((1 + doc_id % 4) * 0.5, 6)
       END AS duration_s,
       CASE doc_id % 3 WHEN 0 THEN 44100 ELSE 48000 END AS sample_rate,
       CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN CAST(1 + doc_id % 2 AS INT)
         ELSE 2 END AS channels,
       CASE doc_id % 3 WHEN 0 THEN CAST(10 + doc_id % 7 AS INT)
         WHEN 1 THEN NULL ELSE CAST(3 + doc_id % 5 AS INT) END AS n_frames
FROM documents WHERE doc_id % 25 = 0
"""


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction e2e: each document's text is wrapped in a
    full HTML page with nav/sidebar/footer chrome (pure-Column concat),
    the htmlextract op must recover exactly the article text and title
    and drop every piece of chrome; the oracle rebuilds the expectation
    from the raw text in SQL."""
    from pipeline_spark.operators.htmlextract import htmlextract_transform
    from pipeline_spark.registry import ModuleContext

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .filter(F.col("doc_id") % 10 == 0)
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "), F.col("doc_id").cast("string"),
        F.lit("</title></head><body>"
              "<nav><a href='/'>Home</a> <a href='/about'>About</a></nav>"
              "<div id='sidebar'><p>Subscribe to the newsletter for updates "
              "and promotions today.</p></div>"
              "<article><p>"),
        F.col("text"),
        F.lit("</p></article>"
              "<footer><p>Site copyright boilerplate text lives down here "
              "in the footer.</p></footer></body></html>"),
    )
    wrapped = docs.select("doc_id", html.alias("html"))
    out = htmlextract_transform(ModuleContext(
        spark=spark, name="hx", params={"field": "html"},
        inputs=[wrapped], input_names=["in"], config={},
    ))[""]
    return out.select("doc_id", "title", "main_text", "n_paragraphs")


Q_HTML_EXTRACT_SQL = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
  FROM documents WHERE doc_id % 10 = 0
)
SELECT doc_id,
       'Doc ' || doc_id AS title,
       CASE WHEN length(t) >= 25 THEN t ELSE '' END AS main_text,
       CASE WHEN length(t) >= 25 THEN 1 ELSE 0 END AS n_paragraphs
FROM norm
"""


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """urls op e2e: deterministic id-derived URLs exercising default-port
    dropping, tracking-param removal, fragment stripping, userinfo/case
    normalization, and the registrable-domain heuristic; the oracle
    constructs every expected component directly in SQL."""
    from pipeline_spark.operators.urls import urls_transform
    from pipeline_spark.registry import ModuleContext

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .filter(F.col("doc_id") % 10 == 0)
    )
    d = F.col("doc_id").cast("string")
    kind = F.col("doc_id") % 3
    url = (
        F.when(kind == 0, F.concat(
            F.lit("HTTP://user@Sub"), d, F.lit(".Example.COM:80/a/"), d,
            F.lit("?id="), d, F.lit("&utm_source=feed#frag"),
        ))
        .when(kind == 1, F.concat(
            F.lit("https://news"), d, F.lit(".site"), d,
            F.lit(".co.uk/stories?utm_campaign=x&page="), d, F.lit("&fbclid=y"),
        ))
        .otherwise(F.concat(
            F.lit("https://plain"), d, F.lit(".example.org:8443/p/"), d,
        ))
    )
    base = docs.select("doc_id", url.alias("url"))
    out = urls_transform(ModuleContext(
        spark=spark, name="u", params={"field": "url"},
        inputs=[base], input_names=["in"], config={},
    ))[""]
    return out.select(
        "doc_id", "url_scheme", "url_host", "url_domain", "url_path",
        "url_normalized",
    )


Q_URL_NORMALIZE_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'http' ELSE 'https' END AS url_scheme,
       CASE doc_id % 3
         WHEN 0 THEN 'sub' || doc_id || '.example.com'
         WHEN 1 THEN 'news' || doc_id || '.site' || doc_id || '.co.uk'
         ELSE 'plain' || doc_id || '.example.org'
       END AS url_host,
       CASE doc_id % 3
         WHEN 0 THEN 'example.com'
         WHEN 1 THEN 'site' || doc_id || '.co.uk'
         ELSE 'example.org'
       END AS url_domain,
       CASE doc_id % 3
         WHEN 0 THEN '/a/' || doc_id
         WHEN 1 THEN '/stories'
         ELSE '/p/' || doc_id
       END AS url_path,
       CASE doc_id % 3
         WHEN 0 THEN 'http://sub' || doc_id || '.example.com/a/' || doc_id
                     || '?id=' || doc_id
         WHEN 1 THEN 'https://news' || doc_id || '.site' || doc_id
                     || '.co.uk/stories?page=' || doc_id
         ELSE 'https://plain' || doc_id || '.example.org:8443/p/' || doc_id
       END AS url_normalized
FROM documents WHERE doc_id % 10 = 0
"""


def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chunk op e2e: overlapping word windows (size 8, overlap 2) over
    documents; the oracle rebuilds the identical windows with DuckDB
    list slicing."""
    from pipeline_spark.operators.chunk import chunk_transform
    from pipeline_spark.registry import ModuleContext

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .filter(F.col("doc_id") % 10 == 0)
    )
    out = chunk_transform(ModuleContext(
        spark=spark, name="c",
        params={"field": "text", "size": 8, "overlap": 2},
        inputs=[docs], input_names=["in"], config={},
    ))[""]
    return out.select("doc_id", "chunk_id", "chunk_text", "n_units")


Q_CHUNK_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS ws
  FROM documents WHERE doc_id % 10 = 0
), s AS (
  SELECT doc_id, ws, unnest(range(0, len(ws), 6)) AS start
  FROM w WHERE len(ws) > 0
)
SELECT doc_id,
       CAST(start // 6 AS INT) AS chunk_id,
       array_to_string(ws[start + 1 : start + 8], ' ') AS chunk_text,
       CAST(least(len(ws) - start, 8) AS INT) AS n_units
FROM s
"""


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textstats gopher op: the published Gopher document-quality rules
    (word count / mean word length / symbol / bullet / ellipsis / alpha
    ratios) as pure Columns, per-rule breakdown oracled in SQL."""
    df = _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: st
    module: textstats
    inputs: [documents]
    parameters:
      field: text
      ops: [gopher]
      gopherBreakdown: true
""", "st")
    return df.select(
        "doc_id", "rule_word_count", "rule_mean_word_len",
        "rule_symbol_ratio", "rule_alpha_words", "gopher_pass",
    )


Q_GOPHER_SQL = r"""
WITH m AS (
  SELECT doc_id,
         coalesce(text, '') AS t,
         trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')) AS norm
  FROM documents
), s AS (
  SELECT doc_id,
         len(string_split(norm, ' ')) AS n_words,
         (length(norm) - (len(string_split(norm, ' ')) - 1)) * 1.0
           / greatest(len(string_split(norm, ' ')), 1) AS mean_wl,
         len(regexp_extract_all(t, '#|…|\.\.\.')) AS n_symbols,
         len(string_split(t, chr(10))) AS n_lines,
         len(regexp_extract_all(t, '(?m)^[ \t]*[•‣◦\-\*]')) AS bullet_lines,
         len(regexp_extract_all(t, '(?m)(\.\.\.|…)[ \t]*$')) AS ellipsis_lines,
         len(regexp_extract_all(' ' || norm, ' [^ ]*?[A-Za-z]')) AS alpha_words
  FROM m
)
SELECT doc_id,
       n_words >= 50 AND n_words <= 100000 AS rule_word_count,
       mean_wl >= 3.0 AND mean_wl <= 10.0 AS rule_mean_word_len,
       n_symbols * 1.0 / greatest(n_words, 1) <= 0.1 AS rule_symbol_ratio,
       alpha_words * 1.0 / greatest(n_words, 1) >= 0.8 AS rule_alpha_words,
       (n_words >= 50 AND n_words <= 100000)
       AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
       AND (n_symbols * 1.0 / greatest(n_words, 1) <= 0.1)
       AND (bullet_lines * 1.0 / greatest(n_lines, 1) <= 0.9)
       AND (ellipsis_lines * 1.0 / greatest(n_lines, 1) <= 0.3)
       AND (alpha_words * 1.0 / greatest(n_words, 1) >= 0.8) AS gopher_pass
FROM s
"""


def q_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dsir module: importance-resampling log weights (Xie et al. 2023)
    for every document against an in-domain target slice (lang='en'),
    hashed-unigram features in the engine-portable 256-bucket space —
    the oracle recomputes counts, lambdas, and per-doc sums in SQL."""
    df = _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: target
    module: beamsql
    inputs: [documents]
    parameters:
      sql: "SELECT text FROM documents WHERE lang = 'en'"
  - name: ds
    module: dsir
    inputs: [documents, target]
    parameters:
      field: text
      idField: doc_id
""", "ds")
    return df.select("doc_id", F.round("dsir_weight", 6).alias("dsir_weight"))


Q_DSIR_SQL = r"""
WITH norm AS (
  SELECT doc_id, lang,
         trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')) AS ntext
  FROM documents
), toks AS (
  SELECT doc_id, lang, unnest(string_split(ntext, ' ')) AS g FROM norm
), bt AS (
  SELECT doc_id, lang,
         (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1) AS b
  FROM toks
), tcnt AS (
  SELECT b, count(*) AS t FROM bt WHERE lang = 'en' GROUP BY b
), ccnt AS (
  SELECT b, count(*) AS c FROM bt GROUP BY b
), tot AS (
  SELECT (SELECT sum(t) FROM tcnt) AS tt, (SELECT sum(c) FROM ccnt) AS ct
), lam AS (
  SELECT s.b,
         ln((coalesce(t, 0) + 1.0) / (tt + 256.0))
         - ln((coalesce(c, 0) + 1.0) / (ct + 256.0)) AS l
  FROM (SELECT unnest(generate_series(0, 255)) AS b) s
  LEFT JOIN tcnt USING (b) LEFT JOIN ccnt USING (b) CROSS JOIN tot
)
SELECT bt.doc_id, round(sum(lam.l), 6) AS dsir_weight
FROM bt JOIN lam USING (b)
GROUP BY bt.doc_id
"""


def q_delta_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta file-level data skipping: orders committed as three appends
    with disjoint o_orderkey ranges (three files, each carrying footer
    add.stats), read back with a dataFilter whose bounds prove two of
    the files irrelevant — the scan plans one file, the row filter keeps
    the semantics exact.  Oracle = the same predicate on the original."""
    import os
    import shutil
    import tempfile

    from pipeline_spark.sinks.delta_native import write_delta_native
    from pipeline_spark.sources.delta_native import read_delta_native

    tbl = _tmp_path("delta_skip", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for i, (lo, hi) in enumerate(((0, 5000), (5000, 10000), (10000, 1 << 40))):
        part = orders.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        ).coalesce(1)
        write_delta_native(
            spark, part, {"path": tbl, "mode": "append" if i else "errorifexists"}
        )
    df = read_delta_native(spark, {"path": tbl, "dataFilter": [
        {"key": "o_orderkey", "op": ">=", "value": 2000},
        {"key": "o_orderkey", "op": "<", "value": 4500},
    ]})
    assert len(df.inputFiles()) == 1, "stats skipping failed to prune"
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


Q_DELTA_SKIP_SQL = """
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total_price
FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 4500
GROUP BY o_orderstatus
"""


def q_iceberg_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg manifest-level data skipping: same shape as delta_skipping
    but through the native Iceberg writer's Appendix-C/D manifest stats;
    the reader prunes files before Spark plans a task."""
    import os
    import shutil
    import tempfile

    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("ice_skip", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for i, (lo, hi) in enumerate(((0, 5000), (5000, 10000), (10000, 1 << 40))):
        part = orders.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        ).coalesce(1)
        write_iceberg_native(part, {"path": tbl, "mode": "append" if i else "create"})
    df = read_iceberg_native(spark, {"path": tbl, "dataFilter": [
        {"key": "o_orderkey", "op": ">=", "value": 6000},
        {"key": "o_orderkey", "op": "<", "value": 9000},
    ]})
    assert len(df.inputFiles()) == 1, "manifest skipping failed to prune"
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


Q_ICE_SKIP_SQL = """
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total_price
FROM orders WHERE o_orderkey >= 6000 AND o_orderkey < 9000
GROUP BY o_orderstatus
"""


def q_delta_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE WHERE on a native Delta table (copy-on-write,
    stats-guided so untouched files never move), then aggregate the
    survivors; the oracle applies the negated predicate directly.
    Nulls in the predicate column are kept (they did not match)."""
    import os
    import shutil
    import tempfile

    from pipeline_spark.sinks.delta_native import (
        delete_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import read_delta_native

    tbl = _tmp_path("delta_del", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_delta_native(spark, orders, {"path": tbl})
    delete_delta_native(spark, {"path": tbl, "where": [
        {"key": "o_orderstatus", "op": "=", "value": "F"},
        {"key": "o_totalprice", "op": ">", "value": 150000.0},
    ]})
    df = read_delta_native(spark, {"path": tbl})
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


Q_DELTA_DELETE_SQL = """
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total_price
FROM orders
WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 150000.0)
GROUP BY o_orderstatus
"""


def q_delta_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level UPDATE WHERE SET on a native Delta table (copy-on-write,
    stats-guided): urgent orders get a 10% surcharge and a status stamp;
    the oracle recomputes with CASE expressions."""
    import os
    import shutil
    import tempfile

    from pipeline_spark.sinks.delta_native import (
        update_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import read_delta_native

    tbl = _tmp_path("delta_upd", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_delta_native(spark, orders, {"path": tbl})
    update_delta_native(spark, {
        "path": tbl,
        "where": [{"key": "o_orderpriority", "op": "=", "value": "1-URGENT"}],
        "set": {"o_totalprice": "o_totalprice * 1.1",
                "o_orderstatus": "'U'"},
    })
    df = read_delta_native(spark, {"path": tbl})
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


Q_DELTA_UPDATE_SQL = """
WITH updated AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'U'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice
  FROM orders
)
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total_price
FROM updated GROUP BY o_orderstatus
"""


def q_iceberg_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE WHERE on a native Iceberg table via merge-on-read
    position deletes — no data file rewritten; the reader's anti-join
    applies the delete file.  Oracle = the negated predicate."""
    import os
    import shutil
    import tempfile

    from pipeline_spark.sinks.iceberg_native import (
        delete_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("ice_del", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_iceberg_native(orders, {"path": tbl, "mode": "create"})
    delete_iceberg_native(spark, {"path": tbl, "where": [
        {"key": "o_orderpriority", "op": "=", "value": "1-URGENT"},
    ]})
    df = read_iceberg_native(spark, {"path": tbl})
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


Q_ICE_DELETE_SQL = """
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total_price
FROM orders WHERE o_orderpriority <> '1-URGENT'
GROUP BY o_orderstatus
"""


def q_delta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delta sink+source with the native (jar-free) path: supplier rows
    committed to a partitioned filesystem Delta table (parquet data +
    _delta_log JSON commits), read back through the metadata-path reader
    (hive basePath partition recovery), aggregated; the oracle aggregates
    the original table."""
    import os
    import shutil
    import tempfile

    tbl = _tmp_path("delta_rt", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    run_pipeline(spark, parse_config(f"""
sources:
  - name: supplier
    module: storage
    parameters: {{format: parquet, input: {sf_dir}/supplier.parquet}}
sinks:
  - name: w
    module: delta
    inputs: [supplier]
    parameters: {{path: {tbl}, partitionBy: [s_nationkey]}}
"""))
    outs = run_pipeline(spark, parse_config(f"""
sources:
  - name: back
    module: delta
    parameters: {{path: {tbl}}}
transforms:
  - name: agg
    module: aggregation
    inputs: [back]
    parameters:
      groupFields: [s_nationkey]
      aggregations:
        - {{name: n, op: count}}
        - {{name: total_bal, op: sum, field: s_acctbal}}
"""))
    return outs["agg"].select(
        "s_nationkey", "n", F.round("total_bal", 2).alias("total_bal")
    )


Q_DELTA_SQL = """
SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS total_bal
FROM supplier GROUP BY s_nationkey
"""


def q_delta_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector merge-on-read: documents land in a Delta table,
    then a spec-shaped DV commit (PROTOCOL.md "Deletion Vector Format",
    built with functions/deltadv.py — z85 uuid path, portable roaring
    bitmap, size/CRC framing) marks doc_id % 7 == 0 rows deleted WITHOUT
    rewriting a single data file; the native reader decodes the bitmaps
    executor-side and anti-joins them away.  Oracle = the same predicate
    on the source table."""
    import json as _json
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as _pq

    from pipeline_spark.functions.deltadv import make_dv_descriptor_relative
    from pipeline_spark.sources.delta_native import read_delta_native, replay_log
    from pipeline_spark.sinks.delta_native import write_delta_native

    tbl = _tmp_path("delta_dv", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    write_delta_native(spark, docs.repartition(2), {"path": tbl})
    adds, _m, _p, version = replay_log(tbl)
    # DV commit: re-add each file with a deletion vector for its
    # doc_id % 7 == 0 positions (remove+add of the same path, per spec)
    actions = [{
        "protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                     "readerFeatures": ["deletionVectors"],
                     "writerFeatures": ["deletionVectors"]},
    }]
    for a in adds:
        fpath = os.path.join(tbl, a["path"])
        ids = _pq.read_table(fpath, columns=["doc_id"])["doc_id"].to_pylist()
        positions = [i for i, v in enumerate(ids) if v is not None and v % 7 == 0]
        new_add = dict(a)
        if positions:
            desc, target, blob = make_dv_descriptor_relative(tbl, positions)
            os.makedirs(os.path.dirname(target), exist_ok=True)
            with open(target, "wb") as fh:
                fh.write(blob)
            new_add["deletionVector"] = desc
        actions.append({"remove": {"path": a["path"], "dataChange": True}})
        actions.append({"add": new_add})
    commit = os.path.join(tbl, "_delta_log", f"{version + 1:020d}.json")
    with open(commit, "w") as fh:
        for act in actions:
            fh.write(_json.dumps(act) + "\n")
    return read_delta_native(spark, {"path": tbl}).orderBy("doc_id")


Q_DELTA_DV_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id % 7 <> 0 ORDER BY doc_id
"""


def q_delta_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed: documents land in a CDF-enabled Delta table in
    two appends, a DELETE WHERE records row-level cdc files, and the
    table_changes read stitches inserts + deletes with commit versions.
    The oracle recomputes the feed from the source table."""
    import os
    import shutil
    import tempfile

    from pipeline_spark.sinks.delta_native import (
        delete_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import read_delta_cdf

    tbl = _tmp_path("delta_cdf", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    write_delta_native(
        spark, docs.where(F.col("doc_id") % 2 == 0).coalesce(1),
        {"path": tbl, "properties": {"delta.enableChangeDataFeed": True}},
    )
    write_delta_native(
        spark, docs.where(F.col("doc_id") % 2 == 1).coalesce(1),
        {"path": tbl, "mode": "append"},
    )
    delete_delta_native(
        spark, {"path": tbl, "where": [{"key": "doc_id", "op": "<", "value": 50}]}
    )
    feed = read_delta_cdf(spark, {"path": tbl, "startingVersion": 0})
    return feed.select(
        "doc_id", "lang", "n_chars", "_change_type",
        F.col("_commit_version").alias("commit_version"),
    )


Q_DELTA_CDF_SQL = """
SELECT doc_id, lang, n_chars, 'insert' AS _change_type,
       CAST(doc_id % 2 AS BIGINT) AS commit_version
FROM documents
UNION ALL
SELECT doc_id, lang, n_chars, 'delete', 2
FROM documents WHERE doc_id < 50
"""


def q_delta_cm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-mapped Delta write path (r6): table created with
    ``delta.columnMapping.mode=name`` — data files carry physical
    col-<uuid> column names and physical partitionValues — then a
    merge-on-read deletion-vector DELETE on a LOGICAL key, and a native
    read that restores logical names.  The oracle recomputes the
    surviving aggregate from the source parquet."""
    import shutil

    from pipeline_spark.sinks.delta_native import (
        delete_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import read_delta_native

    tbl = _tmp_path("delta_cm", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    write_delta_native(
        spark, docs.repartition(2),
        {"path": tbl, "partitionBy": ["lang"],
         "properties": {"delta.columnMapping.mode": "name"}},
    )
    delete_delta_native(
        spark,
        {"path": tbl, "method": "mor",
         "where": [{"key": "doc_id", "op": "<", "value": 100}]},
    )
    back = read_delta_native(spark, {"path": tbl})
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


Q_DELTA_CM_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id >= 100
GROUP BY lang ORDER BY lang
"""


def q_delta_alter_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only ALTER (r6): an unmapped Delta table upgrades to
    column mapping in place (physical name = current name), a column
    renames with ZERO data motion, and appends under the NEW logical
    name stitch with pre-rename files.  The oracle recomputes the final
    aggregate from the source parquet under the renamed column."""
    import shutil

    from pipeline_spark.sinks.delta_native import (
        alter_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import read_delta_native

    tbl = _tmp_path("delta_alter", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    write_delta_native(
        spark, docs.where(F.col("doc_id") % 2 == 0).coalesce(1), {"path": tbl}
    )
    alter_delta_native(spark, {
        "path": tbl, "enableColumnMapping": True,
        "renameColumn": {"n_chars": "chars"},
    })
    write_delta_native(
        spark,
        docs.where(F.col("doc_id") % 2 == 1)
        .withColumnRenamed("n_chars", "chars")
        .coalesce(1),
        {"path": tbl, "mode": "append"},
    )
    back = read_delta_native(spark, {"path": tbl})
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


Q_DELTA_ALTER_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_delta_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER (r6): documents land as randomly-ordered files,
    the Morton-curve rewrite clusters on (doc_id, n_chars), and a
    two-sided dataFilter read returns exactly the source predicate's
    rows — file skipping on BOTH columns is the optimization, the
    row-level filter the semantics the oracle checks."""
    import shutil

    from pipeline_spark.sinks.delta_native import (
        compact_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import read_delta_native

    tbl = _tmp_path("delta_zorder", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    write_delta_native(spark, docs.repartition(8), {"path": tbl})
    compact_delta_native(
        spark,
        {"path": tbl, "zOrderBy": ["doc_id", "n_chars"],
         "targetFileBytes": 64 * 1024},
    )
    back = read_delta_native(
        spark,
        {"path": tbl, "dataFilter": [
            {"key": "doc_id", "op": "<=", "value": 200},
            {"key": "n_chars", "op": "<=", "value": 3000},
        ]},
    )
    return back.orderBy("doc_id")


Q_DELTA_ZORDER_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id <= 200 AND n_chars <= 3000 ORDER BY doc_id
"""


def q_delta_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """replaceWhere partition reload (r6): documents land partitioned by
    lang, then the 'en' partition reloads atomically with doubled
    n_chars — only that partition's files move, incoming rows are
    validated against the predicate, one commit.  The oracle recomputes
    the post-reload aggregate from the source parquet."""
    import shutil

    from pipeline_spark.sinks.delta_native import write_delta_native
    from pipeline_spark.sources.delta_native import read_delta_native

    tbl = _tmp_path("delta_rw", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    write_delta_native(
        spark, docs.repartition(2), {"path": tbl, "partitionBy": ["lang"]}
    )
    reload_en = docs.where(F.col("lang") == "en").withColumn(
        "n_chars", F.col("n_chars") * 2
    )
    write_delta_native(
        spark, reload_en,
        {"path": tbl, "mode": "overwrite", "partitionBy": ["lang"],
         "replaceWhere": {"key": "lang", "op": "=", "value": "en"}},
    )
    back = read_delta_native(spark, {"path": tbl})
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


Q_DELTA_RW_SQL = """
SELECT lang, count(*) AS n,
       CAST(sum(CASE WHEN lang = 'en' THEN n_chars * 2 ELSE n_chars END)
            AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_iceberg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append-scan: supplier committed in two snapshots,
    fromSnapshotId resolves ONLY the second commit's files — the
    incremental-consumer pattern (process what arrived since the last
    run without re-reading the table)."""
    import glob as _glob
    import json as _json
    import os
    import shutil
    import tempfile

    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("ice_inc", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    write_iceberg_native(
        sup.where(F.col("s_suppkey") % 2 == 0).coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    write_iceberg_native(
        sup.where(F.col("s_suppkey") % 2 == 1).coalesce(1),
        {"path": tbl, "mode": "append"},
    )
    meta = _json.load(
        open(sorted(_glob.glob(f"{tbl}/metadata/v*.metadata.json"))[-1])
    )
    first = min(meta["snapshots"], key=lambda s: s["sequence-number"])
    inc = read_iceberg_native(
        spark, {"path": tbl, "fromSnapshotId": first["snapshot-id"]}
    )
    return inc.select("s_suppkey", "s_nationkey", "s_acctbal")


Q_ICEBERG_INC_SQL = """
SELECT s_suppkey, s_nationkey, s_acctbal
FROM supplier WHERE s_suppkey % 2 = 1
"""


def q_iceberg_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Managed-catalog Iceberg: supplier rows committed to a native
    filesystem table, its metadata served by an in-process REST catalog
    (the public OpenAPI routes: /v1/config prefix merge + LoadTableResult),
    loaded back via ``catalog: {uri}`` + ``table: ns.t`` with NO
    filesystem path, then aggregated.  Planning is eager, so the server
    lives only for the metadata exchange."""
    import glob as _glob
    import http.server
    import json as _json
    import os
    import shutil
    import tempfile
    import threading

    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("ice_rest", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    write_iceberg_native(sup.coalesce(1), {"path": tbl, "mode": "create"})
    meta = _json.load(
        open(sorted(_glob.glob(f"{tbl}/metadata/v*.metadata.json"))[-1])
    )

    class _H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _j(self, obj, code=200):
            body = _json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/v1/config":
                return self._j({"defaults": {}, "overrides": {"prefix": "main"}})
            if path == "/v1/main/namespaces/ns/tables/suppliers":
                return self._j({"metadata-location": "inline", "metadata": meta})
            return self._j({}, 404)

    srv = http.server.HTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        back = read_iceberg_native(
            spark,
            {"catalog": {"uri": f"http://127.0.0.1:{srv.server_address[1]}"},
             "table": "ns.suppliers"},
        )
    finally:
        srv.shutdown()
        srv.server_close()
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
    )


Q_ICEBERG_REST_SQL = """
SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS total_bal
FROM supplier GROUP BY s_nationkey
"""


def q_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sample module, mix method: pretraining data mixing — language
    shards recombined to target proportions with bounded upsampling
    (maxEpochs=2), md5-deterministic membership per epoch."""
    df = _pipeline(spark, sf_dir, ["documents"], """
transforms:
  - name: en
    module: filter
    inputs: [documents]
    parameters:
      filters: [{key: lang, op: "=", value: en}]
  - name: de
    module: filter
    inputs: [documents]
    parameters:
      filters: [{key: lang, op: "=", value: de}]
  - name: fr
    module: filter
    inputs: [documents]
    parameters:
      filters: [{key: lang, op: "=", value: fr}]
  - name: mixed
    module: sample
    inputs: [en, de, fr]
    parameters:
      method: mix
      keyField: doc_id
      weights: {en: 0.5, de: 0.25, fr: 0.25}
      maxEpochs: 2
      salt: s4
""", "mixed")
    return df.select(
        "doc_id", "lang",
        F.col("__source__").alias("src"),
        F.col("__epoch__").alias("epoch"),
    )


def _mix_oracle_sql() -> str:
    from pipeline_spark.operators.sample import mix_proportions

    p = mix_proportions({"en": 0.5, "de": 0.25, "fr": 0.25}, 1.0)
    w_rows = ", ".join(f"('{k}', {v!r})" for k, v in p.items())
    # the count-dependent arithmetic (N = min(maxEpochs*n/p), r = p*N/n,
    # floor-based hex boundary) replays the engine's float ops 1:1 —
    # identical IEEE doubles on both sides, no rounding ties (floor).
    return f"""
WITH src AS (
  SELECT doc_id, lang, lang AS s FROM documents WHERE lang IN ('en','de','fr')
), cnt AS (
  SELECT s, count(*) AS n FROM src GROUP BY s
), w AS (
  SELECT * FROM (VALUES {w_rows}) t(s, p)
), par AS (
  SELECT c.s, c.n, w.p FROM cnt c JOIN w USING (s)
), tot AS (
  SELECT min(2 * n / p) AS big_n FROM par
), rate AS (
  SELECT s, p * big_n / n AS r FROM par, tot
), ep AS (
  SELECT unnest(generate_series(0, 2)) AS e
)
SELECT d.doc_id, d.lang, d.s AS src, CAST(ep.e AS INT) AS epoch
FROM src d JOIN rate USING (s) CROSS JOIN ep
WHERE (rate.r - ep.e >= 1)
   OR (rate.r - ep.e > 0
       AND substr(md5('s4|' || d.s || '|' || ep.e || CAST(d.doc_id AS VARCHAR)), 1, 8)
           < printf('%08x', CAST(floor((rate.r - ep.e) * 4294967296.0) AS BIGINT)))
"""


Q_DATASET_MIX_SQL = _mix_oracle_sql()


# CCNet-style perplexity filtering: a deterministic demo bigram LM trained
# (absolute discounting, Katz-normalized backoff — functions/arpalm.py) on a
# seed corpus over the documents vocabulary.  The SAME parsed model feeds
# both the engine query (broadcast + pandas UDF) and the DuckDB oracle
# (gram tables as VALUES + the ARPA backoff rule in SQL), so the scores
# must agree bit-for-bit after rounding.
_PPL_SEED = [
    "the table scan is fast and the hash join is slow",
    "a query plan should push the filter below the join",
    "the window sort spills when the batch is big",
    "small table scan fast big table scan slow",
    "the spark query reads the part table and the customer table",
    "a hash agg groups the row batch by key",
    "the column vector batch makes the scan fast",
    "sort merge join shuffles the data by key",
    "the line order value is a part of the row",
    "data flows from scan to filter to agg to sort",
]


def _ppl_model():
    from pipeline_spark.functions.arpalm import parse_arpa, train_arpa

    arpa = train_arpa(_PPL_SEED, order=2)
    return arpa, parse_arpa(arpa)


_PPL_ARPA, _PPL_LM = _ppl_model()


def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textstats perplexity op: document perplexity under an ARPA bigram
    LM with standard backoff scoring (CCNet / Wenzek et al. 2019 corpus
    curation; map-only broadcast-model scoring)."""
    import yaml

    body = yaml.safe_dump({
        "transforms": [{
            "name": "pp",
            "module": "textstats",
            "inputs": ["documents"],
            "parameters": {
                "field": "text",
                "ops": ["perplexity"],
                "model": _PPL_ARPA,
            },
        }]
    })
    df = _pipeline(spark, sf_dir, ["documents"], "\n" + body, "pp")
    return df.select("doc_id", F.round("ppl", 4).alias("ppl"))


def _ppl_oracle_sql() -> str:
    def q(w: str) -> str:
        return "'" + w.replace("'", "''") + "'"

    uni_rows = ",\n    ".join(
        f"({q(w)}, {lp!r}, {bo!r})"
        for (w,), (lp, bo) in sorted(_PPL_LM.grams[1].items())
    )
    bi_rows = ",\n    ".join(
        f"({q(v)}, {q(w)}, {lp!r})"
        for (v, w), (lp, _) in sorted(_PPL_LM.grams[2].items())
    )
    unk = repr(_PPL_LM.unk_logprob)
    return f"""
WITH uni AS (
  SELECT * FROM (VALUES
    {uni_rows}
  ) t(w, lp, bo)
), bi AS (
  SELECT * FROM (VALUES
    {bi_rows}
  ) t(v, w, lp)
), toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
  FROM documents
), pos AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i FROM toks
), ctx AS (
  SELECT doc_id, i, w,
         lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw
  FROM pos
), scored AS (
  SELECT c.doc_id,
    CASE
      WHEN b.lp IS NOT NULL THEN b.lp
      WHEN c.pw IS NOT NULL THEN coalesce(uc.bo, 0.0) + coalesce(u.lp, {unk})
      ELSE coalesce(u.lp, {unk})
    END AS lp
  FROM ctx c
  LEFT JOIN bi b ON b.v = c.pw AND b.w = c.w
  LEFT JOIN uni u ON u.w = c.w
  LEFT JOIN uni uc ON uc.w = c.pw
)
SELECT doc_id, round(power(10.0, -avg(lp)), 4) AS ppl
FROM scored GROUP BY doc_id
"""


Q_PERPLEXITY_SQL = _ppl_oracle_sql()


def q_deserialize_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deserialize module, avro format: orders rows are encoded to avro
    binary datums per the public spec in-query, decoded back by the
    module's stdlib fallback decoder, and oracled against the plain table
    (DeserializeTransform.java:117-121)."""
    import json as _json
    import struct

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sub = orders.filter(F.col("o_orderkey") % 97 == 0)

    @F.pandas_udf("binary")
    def enc(ids: pd.Series, sts: pd.Series, prs: pd.Series, prios: pd.Series) -> pd.Series:
        out = []
        for i, s, p, pr in zip(ids, sts, prs, prios):
            b = _avro_zz(int(i))
            b += _avro_zz(len(s.encode())) + s.encode()
            b += struct.pack("<d", float(p))
            b += _avro_zz(len(pr.encode())) + pr.encode()
            out.append(b)
        return pd.Series(out)

    raw = sub.select(
        enc("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority").alias("payload")
    )
    schema = {
        "type": "record", "name": "Order", "fields": [
            {"name": "id", "type": "long"},
            {"name": "status", "type": "string"},
            {"name": "price", "type": "double"},
            {"name": "priority", "type": "string"},
        ],
    }
    outs = run_pipeline(spark, parse_config(f"""
transforms:
  - name: parsed
    module: deserialize
    inputs: [raw]
    parameters:
      field: payload
      format: avro
      avroSchema: '{_json.dumps(schema)}'
"""), inputs={"raw": raw})
    return outs["parsed"].select(
        "id", "status", F.round("price", 2).alias("price"), "priority"
    )


Q_DESER_AVRO_SQL = """
SELECT o_orderkey AS id, o_orderstatus AS status,
       round(o_totalprice, 2) AS price, o_orderpriority AS priority
FROM orders WHERE o_orderkey % 97 = 0
"""


def q_storage_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """storage avro with the native (jar-free) path: customer rows written
    as OCF avro by the sink, read back by the source, aggregated; the
    oracle aggregates the original table directly."""
    import os
    import tempfile

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = _tmp_path("avro_rt", sf_dir)
    run_pipeline(spark, parse_config(f"""
sources:
  - name: customer
    module: storage
    parameters: {{format: parquet, input: {sf_dir}/customer.parquet}}
sinks:
  - name: w
    module: storage
    inputs: [customer]
    parameters: {{format: avro, output: {out}}}
"""))
    outs = run_pipeline(spark, parse_config(f"""
sources:
  - name: back
    module: storage
    parameters: {{format: avro, input: {out}}}
transforms:
  - name: agg
    module: aggregation
    inputs: [back]
    parameters:
      groupFields: [c_mktsegment]
      aggregations:
        - {{name: n, op: count}}
        - {{name: total_bal, op: sum, field: c_acctbal}}
"""))
    return outs["agg"].select(
        "c_mktsegment", "n", F.round("total_bal", 2).alias("total_bal")
    )


Q_STORAGE_AVRO_SQL = """
SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
FROM customer GROUP BY c_mktsegment
"""


def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregation groupType=rollup: subtotals per (returnflag, linestatus),
    per returnflag, and grand total in one pass (Spark grouping sets);
    the oracle is DuckDB's GROUP BY ROLLUP."""
    return _pipeline(spark, sf_dir, ["lineitem"], """
transforms:
  - name: agg
    module: aggregation
    inputs: [lineitem]
    parameters:
      groupFields: [l_returnflag, l_linestatus]
      groupType: rollup
      aggregations:
        - {name: n, op: count}
        - {name: qty, op: sum, field: l_quantity}
""", "agg").select(
        "l_returnflag", "l_linestatus", "n", F.round("qty", 2).alias("qty")
    )


Q_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregation pivot: linestatus values become columns (explicit value
    list keeps the schema static); sum so absent combinations are NULL in
    both engines.  Oracle = conditional aggregation."""
    return _pipeline(spark, sf_dir, ["lineitem"], """
transforms:
  - name: agg
    module: aggregation
    inputs: [lineitem]
    parameters:
      groupFields: [l_returnflag]
      pivot:
        field: l_linestatus
        values: [F, O]
      aggregations:
        - {name: qty, op: sum, field: l_quantity}
""", "agg").select(
        "l_returnflag", F.round("F", 2).alias("F"), F.round("O", 2).alias("O")
    )


Q_PIVOT_SQL = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
FROM lineitem GROUP BY l_returnflag
"""


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """storage ORC (Spark-native columnar alternative): part rows written
    as zstd ORC by the sink, read back by the source, aggregated; the
    oracle aggregates the original table."""
    import os
    import shutil
    import tempfile

    out = _tmp_path("orc_rt", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    run_pipeline(spark, parse_config(f"""
sources:
  - name: part
    module: storage
    parameters: {{format: parquet, input: {sf_dir}/part.parquet}}
sinks:
  - name: w
    module: storage
    inputs: [part]
    parameters: {{format: orc, output: {out}, compression: zstd}}
"""))
    outs = run_pipeline(spark, parse_config(f"""
sources:
  - name: back
    module: storage
    parameters: {{format: orc, input: {out}}}
transforms:
  - name: agg
    module: aggregation
    inputs: [back]
    parameters:
      groupFields: [p_brand]
      aggregations:
        - {{name: n, op: count}}
        - {{name: total_retail, op: sum, field: p_retailprice}}
"""))
    return outs["agg"].select(
        "p_brand", "n", F.round("total_retail", 2).alias("total_retail")
    )


Q_ORC_SQL = """
SELECT p_brand, count(*) AS n, round(sum(p_retailprice), 2) AS total_retail
FROM part GROUP BY p_brand
"""


def q_iceberg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """iceberg sink+source with the native (jar-free) commit path: supplier
    rows committed to a filesystem Iceberg v2 table (parquet data + OCF
    manifests + metadata JSON), read back through the independent metadata
    reader, aggregated; the oracle aggregates the original table."""
    import os
    import shutil
    import tempfile

    tbl = _tmp_path("iceberg_rt", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    run_pipeline(spark, parse_config(f"""
sources:
  - name: supplier
    module: storage
    parameters: {{format: parquet, input: {sf_dir}/supplier.parquet}}
sinks:
  - name: w
    module: iceberg
    inputs: [supplier]
    parameters: {{path: {tbl}}}
"""))
    outs = run_pipeline(spark, parse_config(f"""
sources:
  - name: back
    module: iceberg
    parameters: {{path: {tbl}}}
transforms:
  - name: agg
    module: aggregation
    inputs: [back]
    parameters:
      groupFields: [s_nationkey]
      aggregations:
        - {{name: n, op: count}}
        - {{name: total_bal, op: sum, field: s_acctbal}}
"""))
    return outs["agg"].select(
        "s_nationkey", "n", F.round("total_bal", 2).alias("total_bal")
    )


Q_ICEBERG_SQL = """
SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS total_bal
FROM supplier GROUP BY s_nationkey
"""


def q_iceberg_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned native iceberg commit (identity + bucket transforms,
    functions/icebergpart.py) + manifest-level partitionFilter pruning on
    read: orders committed partitioned by priority and a custkey bucket,
    read back with a priority filter; the oracle filters the plain table.
    The bucket column check pins the spec murmur3 math end-to-end."""
    import os
    import shutil
    import tempfile

    tbl = _tmp_path("iceberg_part", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    run_pipeline(spark, parse_config(f"""
sources:
  - name: orders
    module: storage
    parameters: {{format: parquet, input: {sf_dir}/orders.parquet}}
transforms:
  - name: slim
    module: select
    inputs: [orders]
    parameters:
      select:
        - {{name: o_orderkey}}
        - {{name: o_custkey}}
        - {{name: o_orderpriority}}
sinks:
  - name: w
    module: iceberg
    inputs: [slim]
    parameters:
      path: {tbl}
      partitionBy: ["o_orderpriority", "bucket(4, o_custkey)"]
"""))
    outs = run_pipeline(spark, parse_config(f"""
sources:
  - name: back
    module: iceberg
    parameters:
      path: {tbl}
      partitionFilter: {{o_orderpriority: "1-URGENT"}}
"""))
    return (
        outs["back"]
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_custkey").alias("cust_sum"),
        )
    )


Q_ICEBERG_PART_SQL = """
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(o_custkey) AS BIGINT) AS cust_sum
FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderpriority
"""


def q_iceberg_branch_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish via snapshot refs (r7): a base batch lands on
    main, the audit batch appends to a BRANCH (main's ref does not move —
    the Iceberg spec's ref semantics), and one frame joins the branch
    read's aggregate against main's to pin BOTH sides: the branch sees
    base+audit rows, main still sees only base."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("iceberg_wap", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    write_iceberg_native(
        docs.where(F.col("doc_id") % 3 == 0).coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    write_iceberg_native(
        docs.where(F.col("doc_id") % 3 == 1).coalesce(1),
        {"path": tbl, "mode": "append", "toBranch": "audit"},
    )
    branch = (
        read_iceberg_native(spark, {"path": tbl, "ref": "audit"})
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_branch"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
    main = (
        read_iceberg_native(spark, {"path": tbl})
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_main"))
    )
    return branch.join(main, "lang").orderBy("lang")


Q_ICEBERG_WAP_SQL = """
SELECT b.lang, b.n_branch, b.sum_chars, m.n_main
FROM (
  SELECT lang, count(*) AS n_branch,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM documents WHERE doc_id % 3 IN (0, 1) GROUP BY lang
) b
JOIN (
  SELECT lang, count(*) AS n_main
  FROM documents WHERE doc_id % 3 = 0 GROUP BY lang
) m USING (lang)
ORDER BY lang
"""


def q_iceberg_evolved_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evolved-table merge-on-read (r7): create under (doc_id, lang,
    n_chars), rename n_chars->chars (metadata-only), mergeSchema-append
    the other half WITH an extra ``source`` column (old files null-pad),
    then a position DELETE whose predicate spans both schema generations
    — the read stitches renames + padding + delete subtraction.  Oracle
    recomputes from the source parquet with a CASE for the padded
    column."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        alter_iceberg_native,
        delete_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("iceberg_evmor", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_iceberg_native(
        docs.where(F.col("doc_id") % 2 == 0)
        .select("doc_id", "lang", "n_chars")
        .coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    alter_iceberg_native(
        spark, {"path": tbl, "renameColumn": {"n_chars": "chars"}}
    )
    write_iceberg_native(
        docs.where(F.col("doc_id") % 2 == 1)
        .select(
            "doc_id", "lang", F.col("n_chars").alias("chars"), "source"
        )
        .coalesce(1),
        {"path": tbl, "mode": "append", "mergeSchema": True},
    )
    delete_iceberg_native(
        spark, {"path": tbl, "where": {"key": "lang", "op": "=", "value": "en"}}
    )
    back = read_iceberg_native(spark, {"path": tbl})
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("chars").alias("sum_chars"),
            F.count("source").alias("n_src"),
        )
        .orderBy("lang")
    )


Q_ICEBERG_EVMOR_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       count(CASE WHEN doc_id % 2 = 1 THEN source END) AS n_src
FROM documents WHERE lang <> 'en'
GROUP BY lang ORDER BY lang
"""


def q_iceberg_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-delete CDC round (r7): documents land in a table, a
    key-only equality delete (spec content=2 — ZERO data-file scan, the
    O(keys) delete path) removes every doc_id % 7 == 0, then a
    re-insert of the % 14 keys with doubled n_chars lands AFTER the
    delete — the strict below-sequence rule keeps the re-inserted rows
    alive.  The oracle replays base-minus-deleted plus re-inserts."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        equality_delete_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("iceberg_cdc", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 300)
        .select("doc_id", "lang", "n_chars")
    )
    write_iceberg_native(docs.coalesce(1), {"path": tbl, "mode": "create"})
    equality_delete_iceberg_native(
        spark, {"path": tbl},
        keys_df=docs.where(F.col("doc_id") % 7 == 0).select("doc_id"),
    )
    write_iceberg_native(
        docs.where(F.col("doc_id") % 14 == 0)
        .withColumn("n_chars", F.col("n_chars") * 2)
        .coalesce(1),
        {"path": tbl, "mode": "append"},
    )
    back = read_iceberg_native(spark, {"path": tbl})
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


Q_ICEBERG_CDC_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM (
  SELECT lang, n_chars FROM documents
  WHERE doc_id < 300 AND doc_id % 7 <> 0
  UNION ALL
  SELECT lang, n_chars * 2 FROM documents
  WHERE doc_id < 300 AND doc_id % 14 = 0
)
GROUP BY lang ORDER BY lang
"""


def q_streaming_panes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executor-pane streaming (r7): events stream through the fused
    applyInPandasWithState windowed-aggregation + pane-ledger operator
    (strategy.paneStateBackend: executor — keyed state in Spark's state
    store, no driver ledger), a withholding count trigger (afterPane
    with an unreachable count) keeps every window's content pending
    until the REAL watermark passes its end, and the EventTimeTimeout
    flush then emits exactly ONE ON_TIME pane per (day, key) carrying
    the full aggregate — which must equal the batch aggregate the
    oracle computes.  Covers count/sum plus the r7 champion-state ops
    (first/last by event time).  Reference: module/Strategy.java:232-343
    trigger surface."""
    panes = _stream_pane_variant(
        spark, sf_dir, aggs_yaml=_PANES_AGGS_YAML,
        allow_unbounded=False, tag="stream_panes",
    )
    return (
        panes.where(F.col("__pane__.timing") == "ON_TIME")
        .where(F.col("event_type") != "__wm__")
        .select(
            F.col("window").cast("date").alias("day"),
            "event_type",
            "n",
            F.round("total", 3).alias("total"),
            "fv",
            "lv",
        )
        .orderBy("day", "event_type")
    )


_PANES_AGGS_YAML = """\
        - {name: n, op: count}
        - {name: total, op: sum, field: value}
        - {name: fv, op: first, field: value}
        - {name: lv, op: last, field: value}"""


Q_STREAM_PANES_SQL = """
SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
       round(sum(value), 3) AS total,
       arg_min(value, ts) AS fv, arg_max(value, ts) AS lv
FROM events WHERE event_id % 8 = 0
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _stream_pane_variant(spark, sf_dir: str, *, aggs_yaml: str,
                         allow_unbounded: bool, tag: str) -> DataFrame:
    """One executor-pane streaming run over the same event slice, file
    cadence, and calendar-day windows; only the agg set (and the
    unbounded-state opt-in) varies.  q_streaming_buffered builds its
    oracled row on the buffered variant; bench.py times the buffered
    vs scalar pair — identical micro-batch scheduling overhead cancels
    in the delta, isolating what paneAllowUnboundedState's O(rows)
    keyed state costs over the O(1) scalar ledger (VERDICT r11 ask
    #6)."""
    import datetime as _dt
    import shutil
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = _tmp_path(tag, sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    in_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    os.makedirs(in_dir)
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_id") % 8 == 0)
        .select("ts", "event_type", "value")
        .orderBy("ts")
        .toPandas()
    )
    f0 = os.path.join(in_dir, "b0.parquet")
    pq.write_table(
        pa.table({
            "ts": pa.Array.from_pandas(ev["ts"]).cast(pa.timestamp("us")),
            "event_type": pa.array(ev["event_type"].tolist()),
            "value": pa.array(ev["value"].tolist(), pa.float64()),
        }),
        f0,
    )
    for i, sent_ts in enumerate(
        (_dt.datetime(2100, 1, 1), _dt.datetime(2100, 1, 2),
         _dt.datetime(2100, 1, 3))
    ):
        fi = os.path.join(in_dir, f"b{i + 1}.parquet")
        pq.write_table(
            pa.table({
                "ts": pa.array([sent_ts], pa.timestamp("us")),
                "event_type": pa.array(["__wm__"]),
                "value": pa.array([0.0], pa.float64()),
            }),
            fi,
        )
        os.utime(fi, (_time.time() - 50 + i * 10,) * 2)
    now = _time.time()
    os.utime(f0, (now - 100, now - 100))
    run_pipeline(spark, parse_config(f"""
sources:
  - name: events
    module: storage
    parameters:
      format: parquet
      input: {in_dir}
      mode: streaming
      maxFilesPerTrigger: 1
transforms:
  - name: agg
    module: aggregation
    inputs: [events]
    timestampAttribute: ts
    strategy:
      window: {{type: calendar, unit: day}}
      allowedLateness: 5
      trigger:
        type: afterWatermark
        earlyFiringTrigger: {{type: afterPane, elementCountAtLeast: 1000000}}
      paneStateBackend: executor
      paneAllowUnboundedState: {str(allow_unbounded).lower()}
      outputPaneInfo: true
    parameters:
      groupFields: [event_type]
      aggregations:
{aggs_yaml}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
"""))
    return spark.read.parquet(out_dir)


_BUFFERED_AGGS_YAML = """\
        - {name: med, op: median, field: value}
        - {name: p25, op: percentile, field: value, percentile: 0.25}
        - {name: vals, op: array_agg, field: value}
        - {name: nd, op: count_distinct, field: value}"""

_SCALAR_AGGS_YAML = """\
        - {name: s, op: sum, field: value}
        - {name: av, op: avg, field: value}
        - {name: mn, op: min, field: value}
        - {name: mx, op: max, field: value}"""


def stream_pane_bench_run(spark, sf_dir: str, buffered: bool) -> int:
    """bench.py hook: run the buffered or scalar twin, return pane
    count (materialization proof)."""
    df = _stream_pane_variant(
        spark, sf_dir,
        aggs_yaml=_BUFFERED_AGGS_YAML if buffered else _SCALAR_AGGS_YAML,
        allow_unbounded=buffered,
        tag=f"panebench_{'buf' if buffered else 'scalar'}",
    )
    return df.count()


def q_streaming_buffered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executor-pane BUFFERED aggregations (r11, VERDICT r10 missing
    #3): exact median / percentile / array_agg / count_distinct on the
    executor backend via strategy.paneAllowUnboundedState — keyed state
    buffers each window's elements, the EventTimeTimeout flush emits
    one ON_TIME pane per (day, type), and every buffered value must
    equal the batch aggregate the oracle computes (array_agg pinned by
    size + sum so float-array formatting never enters the hash)."""
    panes = _stream_pane_variant(
        spark, sf_dir, aggs_yaml=_BUFFERED_AGGS_YAML,
        allow_unbounded=True, tag="stream_buf",
    )
    return (
        panes.where(F.col("__pane__.timing") == "ON_TIME")
        .where(F.col("event_type") != "__wm__")
        .select(
            F.col("window").cast("date").alias("day"),
            "event_type",
            F.round("med", 3).alias("med"),
            F.round("p25", 3).alias("p25"),
            F.size("vals").alias("arr_n"),
            F.expr(
                "round(aggregate(vals, 0d, (a, x) -> a + x), 3)"
            ).alias("arr_sum"),
            "nd",
        )
        .orderBy("day", "event_type")
    )


# the percentile interpolation is REPRODUCED term-for-term (lower +
# (higher - lower) * frac, Spark's percentile.scala order) instead of
# duckdb's quantile_cont — the two differ by 1 ULP on some groups,
# which crosses round(,3) boundaries and hash-mismatches
Q_STREAM_BUF_SQL = """
WITH g AS (
  SELECT date_trunc('day', ts) AS day, event_type,
         list(value ORDER BY value) AS l,
         count(value) AS n,
         round(sum(value), 3) AS arr_sum,
         count(DISTINCT value) AS nd
  FROM events WHERE event_id % 8 = 0
  GROUP BY 1, 2
)
SELECT day, event_type,
  round(l[CAST(floor((n-1)*0.5) AS INT)+1]
        + CASE WHEN (n-1)*0.5 > floor((n-1)*0.5)
          THEN (l[CAST(floor((n-1)*0.5) AS INT)+2]
                - l[CAST(floor((n-1)*0.5) AS INT)+1])
               * ((n-1)*0.5 - floor((n-1)*0.5))
          ELSE 0 END, 3) AS med,
  round(l[CAST(floor((n-1)*0.25) AS INT)+1]
        + CASE WHEN (n-1)*0.25 > floor((n-1)*0.25)
          THEN (l[CAST(floor((n-1)*0.25) AS INT)+2]
                - l[CAST(floor((n-1)*0.25) AS INT)+1])
               * ((n-1)*0.25 - floor((n-1)*0.25))
          ELSE 0 END, 3) AS p25,
  n AS arr_n, arr_sum, nd
FROM g ORDER BY day, event_type
"""


_LEGACY_DEL_KEYS = [32 * i for i in range(1, 26)]


def q_iceberg_legacy_migrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy global-delete detection + migration (r13, VERDICT r12 ask
    #2): a pre-r11-shaped table (global equality deletes re-stamped
    under the PARTITIONED spec with all-null records) must REFUSE a
    default read — the only path where strict spec scoping could
    silently resurrect deleted rows — and compaction with
    ``legacyGlobalDeletes: apply`` migrates it: deletes materialize as
    global, delete files drop, and the default (refusing) read works.
    Reference: iceberg-java DeleteFileIndex spec-identity scoping;
    sources/iceberg_native.py plan_equality_deletes."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        compact_iceberg_native,
        equality_delete_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native
    from pipeline_spark.testing import scope_delete_manifests

    tbl = _tmp_path("ice_legacy", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    slim = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    write_iceberg_native(
        slim, {"path": tbl, "mode": "create",
               "partitionBy": ["o_orderpriority"]},
    )
    equality_delete_iceberg_native(
        spark,
        {"path": tbl,
         "values": [{"o_orderkey": k} for k in _LEGACY_DEL_KEYS]},
    )
    scope_delete_manifests(tbl, {"o_orderpriority": None})  # pre-r11 shape
    try:  # the detector must fire on the default read
        read_iceberg_native(spark, {"path": tbl}).collect()
        raise AssertionError("legacy global deletes read without refusal")
    except ValueError as exc:
        assert "legacy GLOBAL" in str(exc)
    compact_iceberg_native(
        spark, {"path": tbl, "legacyGlobalDeletes": "apply"}
    )
    back = read_iceberg_native(spark, {"path": tbl})  # default mode again
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
    )


Q_ICE_LEGACY_SQL = f"""
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders
WHERE o_orderkey NOT IN ({", ".join(str(k) for k in _LEGACY_DEL_KEYS)})
GROUP BY o_orderpriority
"""


def q_iceberg_spec_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution (r7): orders commit partitioned by
    priority, then the SAME rows append under bucket(4, o_custkey) with
    evolvePartitionSpec — fresh spec-id, ZERO data motion — and per-spec
    compaction rewrites each generation under its own layout.  A
    partitionFilter on the OLD field prunes only old-generation files
    (files that predate a partition field are kept, Iceberg's rule), so
    the result is urgent rows from copy 1 plus ALL rows from copy 2.
    Reference: mercari/pipeline has no spec evolution; Iceberg spec
    §Partition Evolution."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        compact_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("ice_specev", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    slim = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    write_iceberg_native(
        slim, {"path": tbl, "mode": "create",
               "partitionBy": ["o_orderpriority"]},
    )
    write_iceberg_native(
        slim, {"path": tbl, "mode": "append",
               "partitionBy": ["bucket(4, o_custkey)"],
               "evolvePartitionSpec": True},
    )
    rep = compact_iceberg_native(
        spark, {"path": tbl, "targetFileBytes": 1 << 30}
    )
    assert rep["new_files"] >= 0  # per-spec compaction must not error
    back = read_iceberg_native(
        spark, {"path": tbl,
                "partitionFilter": {"o_orderpriority": "1-URGENT"}}
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_custkey").alias("cust_sum"),
    )


Q_ICE_SPECEV_SQL = """
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(o_custkey) AS BIGINT) AS cust_sum
FROM (
  SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
  WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
) GROUP BY o_orderpriority
"""


def q_iceberg_rewrite_manifests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rewrite_manifests (r7): three appends leave three manifests; the
    rewrite merges them into ONE EXISTING-status manifest (original data
    sequence numbers preserved) as a metadata-only replace snapshot —
    the fix for the tiny-manifest planning tax of micro-batch-fed
    tables.  Data skipping still prunes off the merged manifest's
    carried stats.  Iceberg spec §Manifests / RewriteManifestsAction."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        rewrite_manifests_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("ice_rwm", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    slim = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    for i in range(3):
        write_iceberg_native(
            slim, {"path": tbl, "mode": "create" if i == 0 else "append"},
        )
    rep = rewrite_manifests_iceberg_native(spark, {"path": tbl})
    assert rep["rewritten_manifests"] == 3 and rep["created_manifests"] == 1
    back = read_iceberg_native(spark, {"path": tbl})
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


Q_ICE_RWM_SQL = """
SELECT o_orderstatus, count(*) AS n,
       round(sum(o_totalprice), 2) AS total_price
FROM (
  SELECT * FROM orders UNION ALL SELECT * FROM orders
  UNION ALL SELECT * FROM orders
) GROUP BY o_orderstatus
"""


def q_delta_v2_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta v2 checkpoint write symmetry (r7): a table created with
    delta.checkpointPolicy=v2 (protocol carries the v2Checkpoint
    feature) checkpoints as a UUID top file + _sidecars/ shards at the
    interval; the read replays THROUGH the v2 checkpoint (pre-checkpoint
    JSON commits deleted to prove it).  PROTOCOL.md §V2 Checkpoint."""
    import glob
    import json as _json
    import os
    import shutil

    from pipeline_spark.sinks.delta_native import write_delta_native
    from pipeline_spark.sources.delta_native import read_delta_native

    tbl = _tmp_path("delta_v2cp", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    slim = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_delta_native(
        spark, slim,
        {"path": tbl, "checkpointInterval": 1,
         "properties": {"delta.checkpointPolicy": "v2"}},
    )
    write_delta_native(
        spark, slim,
        {"path": tbl, "mode": "append", "checkpointInterval": 1},
    )
    log = os.path.join(tbl, "_delta_log")
    hint = _json.loads(open(os.path.join(log, "_last_checkpoint")).read())
    assert hint.get("checkpointPolicy") == "v2"
    assert glob.glob(os.path.join(log, "_sidecars", "*.parquet"))
    # prove replay runs off the v2 checkpoint alone
    for v in range(hint["version"] + 1):
        pth = os.path.join(log, f"{v:020d}.json")
        if os.path.exists(pth):
            os.remove(pth)
    back = read_delta_native(spark, {"path": tbl})
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


Q_DELTA_V2CP_SQL = """
SELECT o_orderstatus, count(*) AS n,
       round(sum(o_totalprice), 2) AS total_price
FROM (
  SELECT * FROM orders UNION ALL SELECT * FROM orders
) GROUP BY o_orderstatus
"""


def q_delta_liquid_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta liquid clustering (r7, PROTOCOL.md Clustered Table + Domain
    Metadata): clusterBy at create records the delta.clustering domain;
    the paramless append inherits it (every file sorted on the cluster
    column — asserted); OPTIMIZE with no zOrderBy re-clusters on the
    table's own columns.  Values equal a plain 2x union — clustering is
    layout, never semantics."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from pipeline_spark.sinks.delta_native import (
        compact_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import (
        read_delta_native,
        replay_domains,
    )

    tbl = _tmp_path("delta_liquid", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    slim = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_delta_native(
        spark, slim, {"path": tbl, "clusterBy": ["o_orderkey"]})
    write_delta_native(spark, slim, {"path": tbl, "mode": "append"})
    assert "delta.clustering" in replay_domains(tbl)
    for f in glob.glob(
        os.path.join(tbl, "data-*", "**", "*.parquet"), recursive=True
    ):
        ks = pq.read_table(
            f, columns=["o_orderkey"]).column("o_orderkey").to_pylist()
        assert ks == sorted(ks), f"unclustered file {f}"
    compact_delta_native(spark, {"path": tbl, "targetFileBytes": 1 << 30})
    back = read_delta_native(spark, {"path": tbl})
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


Q_DELTA_LIQUID_SQL = """
SELECT o_orderstatus, count(*) AS n,
       round(sum(o_totalprice), 2) AS total_price
FROM (
  SELECT * FROM orders UNION ALL SELECT * FROM orders
) GROUP BY o_orderstatus
"""


def q_delta_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-scoped COW MERGE (r7): documents land in a delta table, then
    ONE keyed mutation batch deletes every doc_id % 7 == 0 and re-upserts
    the % 14 keys with doubled n_chars — the Delta twin of
    iceberg_cdc_upsert, same end state, but via stats-pruned + exact
    touched-file copy-on-write instead of equality deletes.  The oracle
    replays base-minus-deleted plus the upserts."""
    import shutil

    from pipeline_spark.sinks.delta_native import (
        merge_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import read_delta_native

    tbl = _tmp_path("delta_cdc", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 300)
        .select("doc_id", "lang", "n_chars")
    )
    write_delta_native(spark, docs.coalesce(1), {"path": tbl})
    batch = (
        docs.where(F.col("doc_id") % 7 == 0)
        .withColumn(
            "__op__",
            F.when(F.col("doc_id") % 14 == 0, F.lit("UPSERT"))
            .otherwise(F.lit("DELETE")),
        )
        .withColumn("n_chars", F.col("n_chars") * 2)
    )
    rep = merge_delta_native(
        spark, batch, {"path": tbl, "primaryKeys": ["doc_id"]})
    assert rep["rewritten_files"] >= 1
    back = read_delta_native(spark, {"path": tbl})
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


Q_DELTA_MERGE_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM (
  SELECT lang, n_chars FROM documents
  WHERE doc_id < 300 AND doc_id % 7 <> 0
  UNION ALL
  SELECT lang, n_chars * 2 FROM documents
  WHERE doc_id < 300 AND doc_id % 14 = 0
)
GROUP BY lang ORDER BY lang
"""


def q_iceberg_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-commit keyed upsert (r7, the Flink iceberg-connector commit
    shape): the SAME CDC batch as delta_merge_upsert lands as equality-
    delete files + data files in ONE snapshot under one sequence number
    — O(batch) cost, no scan, no rewrite; the table is PARTITIONED by
    lang, so the upsert data recomputes the spec's layout per file.
    Same oracle end state as the delta twin."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        upsert_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("ice_upsert_q", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 300)
        .select("doc_id", "lang", "n_chars")
    )
    write_iceberg_native(
        docs.coalesce(1),
        {"path": tbl, "mode": "create", "partitionBy": ["lang"]},
    )
    batch = (
        docs.where(F.col("doc_id") % 7 == 0)
        .withColumn(
            "__op__",
            F.when(F.col("doc_id") % 14 == 0, F.lit("UPSERT"))
            .otherwise(F.lit("DELETE")),
        )
        .withColumn("n_chars", F.col("n_chars") * 2)
    )
    rep = upsert_iceberg_native(
        spark, batch.coalesce(1), {"path": tbl, "primaryKeys": ["doc_id"]})
    assert rep["delete_files"] >= 1 and rep["data_files"] >= 1
    back = read_iceberg_native(spark, {"path": tbl})
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


Q_ICE_UPSERT_SQL = Q_DELTA_MERGE_SQL


def q_iceberg_merge_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-SCOPED iceberg copy-on-write MERGE (r8, VERDICT r7 ask #1):
    documents land as FOUR range-disjoint data files, then ONE keyed
    mutation batch touching only doc_id < 150 deletes every %7 key and
    re-upserts the %14 keys with doubled n_chars.  Manifest key-range
    bounds + the exact probe semi-join confine the rewrite to the files
    actually holding matched keys — the files covering doc_id >= 150
    survive BY PATH (asserted), the delta twin of delta_merge_upsert.
    Oracle replays base-minus-deleted plus the upserts."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        merge_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import (
        plan_files,
        read_iceberg_native,
    )

    tbl = _tmp_path("ice_merge_cow", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 300)
        .select("doc_id", "lang", "n_chars")
    )
    write_iceberg_native(
        docs.repartitionByRange(4, "doc_id"), {"path": tbl, "mode": "create"}
    )
    before = {d["path"] for d in plan_files(tbl)[0]}
    batch = (
        docs.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 150))
        .withColumn(
            "__op__",
            F.when(F.col("doc_id") % 14 == 0, F.lit("UPSERT"))
            .otherwise(F.lit("DELETE")),
        )
        .withColumn("n_chars", F.col("n_chars") * 2)
    )
    rep = merge_iceberg_native(
        spark, batch, {"path": tbl, "primaryKeys": ["doc_id"]})
    after = {d["path"] for d in plan_files(tbl)[0]}
    # the merge is file-scoped: untouched range files survive by path
    assert rep["rewritten_files"] >= 1
    assert rep["rewritten_files"] < len(before)
    assert before & after, "untouched data files must survive by path"
    back = read_iceberg_native(spark, {"path": tbl})
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


Q_ICE_MERGE_COW_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM (
  SELECT lang, n_chars FROM documents
  WHERE doc_id < 300 AND NOT (doc_id % 7 = 0 AND doc_id < 150)
  UNION ALL
  SELECT lang, n_chars * 2 FROM documents
  WHERE doc_id < 300 AND doc_id % 14 = 0 AND doc_id < 150
)
GROUP BY lang ORDER BY lang
"""


def q_iceberg_merge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read iceberg MERGE (r8, VERDICT r7 ask #2): the SAME
    mutation batch as iceberg_merge_cow lands via ``mode: merge,
    method: mor`` — matched keys tombstone as equality-delete files,
    upserts append, ONE snapshot, ZERO data files read or rewritten
    (every pre-existing file survives by path, asserted); then compact
    materializes the deletes and the state must hold.  Same oracle as
    the COW twin: the two blast-radius shapes are semantically one."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        compact_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import (
        plan_files,
        read_iceberg_native,
    )

    tbl = _tmp_path("ice_merge_mor", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 300)
        .select("doc_id", "lang", "n_chars")
    )
    write_iceberg_native(
        docs.repartitionByRange(4, "doc_id"), {"path": tbl, "mode": "create"}
    )
    before = {d["path"] for d in plan_files(tbl)[0]}
    batch = (
        docs.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 150))
        .withColumn(
            "__op__",
            F.when(F.col("doc_id") % 14 == 0, F.lit("UPSERT"))
            .otherwise(F.lit("DELETE")),
        )
        .withColumn("n_chars", F.col("n_chars") * 2)
    )
    write_iceberg_native(batch, {
        "path": tbl, "mode": "merge", "method": "mor",
        "primaryKeys": ["doc_id"],
    })
    data, dels, _ = plan_files(tbl)
    assert before <= {d["path"] for d in data}, "MOR merge rewrites nothing"
    assert any(d["content"] == 2 for d in dels)
    compact_iceberg_native(spark, {"path": tbl, "targetFileBytes": 1 << 30})
    assert not plan_files(tbl)[1], "compaction materializes the deletes"
    back = read_iceberg_native(spark, {"path": tbl})
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


Q_ICE_MERGE_MOR_SQL = Q_ICE_MERGE_COW_SQL


def q_iceberg_dv_puffin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 deletion vectors (r8): DELETE WHERE with ``format:
    puffin`` commits one puffin file holding a roaring-bitmap blob per
    touched data file (spec deletion-vector-v1 framing, manifest
    addressing via referenced_data_file/content_offset, table bumped to
    format-version 3); the reader subtracts the vectors executor-side.
    Oracle: the negated predicate on the source table."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        delete_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import (
        find_table_metadata,
        read_iceberg_native,
    )

    tbl = _tmp_path("ice_dv_puffin", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
    )
    write_iceberg_native(
        docs.repartitionByRange(4, "doc_id"), {"path": tbl, "mode": "create"}
    )
    out = delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "doc_id", "op": "<", "value": 200}],
    })
    assert out["dv_blobs"] >= 1
    import json as _json
    with open(find_table_metadata(tbl)) as fh:
        assert _json.load(fh)["format-version"] == 3
    back = read_iceberg_native(spark, {"path": tbl})
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


Q_ICE_DV_PUFFIN_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id >= 200
GROUP BY lang ORDER BY lang
"""


def q_iceberg_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-scoped COW UPDATE WHERE SET on iceberg (r8, the delta_update
    twin): orders land range-clustered on o_orderkey, urgent orders get
    a 10% surcharge and a status stamp — manifest bounds + the exact
    probe confine the rewrite to files containing matches.  Oracle
    applies the same CASE directly."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        update_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = _tmp_path("ice_update", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"
    )
    write_iceberg_native(
        orders.repartitionByRange(4, "o_orderkey"),
        {"path": tbl, "mode": "create"},
    )
    update_iceberg_native(spark, {
        "path": tbl,
        "where": [{"key": "o_orderpriority", "op": "=",
                   "value": "1-URGENT"}],
        "set": {"o_totalprice": "o_totalprice * 1.1",
                "o_orderstatus": "'U'"},
    })
    back = read_iceberg_native(spark, {"path": tbl})
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


Q_ICE_UPDATE_SQL = """
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'U'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice
  FROM orders
)
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_iceberg_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg changelog read (r8, the Delta-CDF twin): documents land,
    then one keyed CDC upsert (%10 keys; %40 keys are DELETEs, the rest
    re-upsert with doubled n_chars); the changelog over the full history
    surfaces the base rows + re-upserts as inserts and the matched old
    rows as deletes — derived purely from per-snapshot metadata diffs.
    Oracle replays the same change stream in SQL."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        upsert_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_changelog

    tbl = _tmp_path("ice_changelog", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "lang", "n_chars")
    )
    write_iceberg_native(docs.coalesce(1), {"path": tbl, "mode": "create"})
    batch = (
        docs.where(F.col("doc_id") % 10 == 0)
        .withColumn(
            "__op__",
            F.when(F.col("doc_id") % 40 == 0, F.lit("DELETE"))
            .otherwise(F.lit("UPSERT")),
        )
        .withColumn("n_chars", F.col("n_chars") * 2)
    )
    upsert_iceberg_native(
        spark, batch.coalesce(1), {"path": tbl, "primaryKeys": ["doc_id"]})
    log = read_iceberg_changelog(spark, {"path": tbl})
    return (
        log.groupBy("_change_type", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("_change_type", "lang")
    )


Q_ICE_CHANGELOG_SQL = """
SELECT _change_type, lang, count(*) AS n FROM (
  SELECT 'insert' AS _change_type, lang FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT 'insert', lang FROM documents
  WHERE doc_id < 200 AND doc_id % 10 = 0 AND doc_id % 40 <> 0
  UNION ALL
  SELECT 'delete', lang FROM documents
  WHERE doc_id < 200 AND doc_id % 10 = 0
)
GROUP BY _change_type, lang ORDER BY _change_type, lang
"""


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (r8): PQ/ADC top-5 in its exactness
    configuration — the training sample covers the whole corpus and the
    codebook is larger than the unique-subvector count, so every
    subvector IS a codeword and the asymmetric distance equals true
    squared L2 (the same property the aligned-data pytest pins).  That
    makes the approximate index SQL-oracle-able: DuckDB recomputes the
    exact L2 top-5 with list_distance.  At scale the same code path
    runs with codebook ≪ corpus — 32-64× smaller vectors."""
    from pipeline_spark.operators.similarity import pq_topk

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    queries = corpus.where(F.col("vec_id") < 3).selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    out = pq_topk(
        corpus, queries, k=5, m=2, codebook_size=256,
        sample_size=200, kmeans_iters=3,
    )
    return (
        out.groupBy("query_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("neighbor_id")).cast(
                    "array<string>"
                ),
                ",",
            ).alias("topk")
        )
        .orderBy("query_id")
    )


Q_PQ_TOPK_SQL = """
SELECT query_id,
       array_to_string(list_sort(list(neighbor_id)), ',') AS topk FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_distance(
                      list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
                      list_transform(q.embedding, x -> CAST(x AS DOUBLE))),
                    c.vec_id
         ) AS rnk
  FROM embeddings c CROSS JOIN embeddings q
  WHERE q.vec_id < 3 AND c.vec_id < 200
) WHERE rnk <= 5
GROUP BY query_id ORDER BY query_id
"""


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (r9, VERDICT r8 ask #2): the FAISS coarse-cells +
    PQ-codes composition in its exactness configuration — nprobe equals
    n_cells (every cell probed, so the candidate set is the whole
    corpus) and the codebook covers every unique subvector (so ADC is
    exact squared L2).  DuckDB recomputes the exact L2 top-5.  At scale
    the same path runs with nprobe ≪ n_cells and codebook ≪ corpus —
    that's the scan-1/8th-of-the-index, 32×-smaller-vectors posture."""
    from pipeline_spark.operators.similarity import ivfpq_topk

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    queries = corpus.where(F.col("vec_id") < 3).selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    out = ivfpq_topk(
        corpus, queries, k=5, n_cells=4, nprobe=4, m=2,
        codebook_size=256, sample_size=200, kmeans_iters=3,
    )
    return (
        out.groupBy("query_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("neighbor_id")).cast(
                    "array<string>"
                ),
                ",",
            ).alias("topk")
        )
        .orderBy("query_id")
    )


Q_IVFPQ_TOPK_SQL = """
SELECT query_id,
       array_to_string(list_sort(list(neighbor_id)), ',') AS topk FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_distance(
                      list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
                      list_transform(q.embedding, x -> CAST(x AS DOUBLE))),
                    c.vec_id
         ) AS rnk
  FROM embeddings c CROSS JOIN embeddings q
  WHERE q.vec_id < 3 AND c.vec_id < 200
) WHERE rnk <= 5
GROUP BY query_id ORDER BY query_id
"""


def q_iceberg_mor_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """iceberg v2 merge-on-read: nation committed natively (one sorted
    data file), then a POSITION delete file (row ordinals 0,1 →
    nationkeys 0,1) and an EQUALITY delete file (n_regionkey = 2) are
    committed via append_delete_files; the native reader applies both
    through anti-joins on _metadata row addressing / null-safe identifier
    columns.  Oracle: the same predicate filter on the source table."""
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pipeline_spark.sinks.iceberg_native import (
        append_delete_files,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import (
        _field_names_by_id,
        find_table_metadata,
        plan_files,
        read_iceberg_native,
    )

    tbl = _tmp_path("iceberg_mor", sf_dir)
    shutil.rmtree(tbl, ignore_errors=True)
    nation = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
        .coalesce(1)
        .sortWithinPartitions("n_nationkey")
    )
    write_iceberg_native(nation, {"path": tbl})
    data, _, _ = plan_files(tbl)
    pos_path = os.path.join(tbl, "pos-del.parquet")
    pq.write_table(
        pa.table(
            {"file_path": [data[0]["path"]] * 2, "pos": pa.array([0, 1], pa.int64())}
        ),
        pos_path,
    )
    import json as _json

    with open(find_table_metadata(tbl)) as fh:
        meta = _json.load(fh)
    region_id = next(
        fid for fid, n in _field_names_by_id(meta).items() if n == "n_regionkey"
    )
    eq_path = os.path.join(tbl, "eq-del.parquet")
    pq.write_table(pa.table({"n_regionkey": pa.array([2], pa.int64())}), eq_path)
    append_delete_files(
        tbl,
        [
            {"path": pos_path, "content": 1},
            {"path": eq_path, "content": 2, "equality_ids": [region_id]},
        ],
    )
    return read_iceberg_native(spark, {"path": tbl}).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


Q_ICEBERG_MOR_SQL = """
SELECT n_nationkey, n_name, n_regionkey
FROM nation
WHERE n_nationkey NOT IN (0, 1) AND n_regionkey <> 2
"""


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join THROUGH THE ENGINE (r8, VERDICT r7
    ask #5 — the r7 version called spark.read/bucketBy directly):
    customer and orders land as catalog tables via the storage sink's
    ``bucketBy`` config (``sinks/storage.py``), read back via the
    storage source's ``table:`` catalog path, and joined in beamsql
    WITHOUT a shuffle exchange — the write pays the shuffle once,
    recurring joins are exchange-free (plan pinned by
    scripts/explain_audit.py + tests/test_modules.py).  The oracle
    checks the VALUES against a plain join."""
    import shutil

    for tbl in ("bq_customer", "bq_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    base = _tmp_path("bucketed", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    # the two bucketed CTAS writes are independent tables — run them as
    # concurrent jobs (guide §2.6); each write's bucket shuffle is the
    # row's dominant cost and they back-fill each other's task tails
    from concurrent.futures import ThreadPoolExecutor

    def _build(args):
        name, src, key, cols = args
        _pipeline_multi(spark, sf_dir, [src], f"""
transforms:
  - name: proj
    module: select
    inputs: [{src}]
    parameters:
      fields: {cols}
sinks:
  - name: out
    module: storage
    inputs: [proj]
    parameters:
      format: parquet
      output: {base}/{name}
      table: {name}
      bucketBy: {{numBuckets: 8, fields: [{key}], sortBy: [{key}]}}
""")

    with ThreadPoolExecutor(max_workers=2) as _pool:
        for _f in [
            _pool.submit(_build, a)
            for a in (
                ("bq_customer", "customer", "c_custkey",
                 "[c_custkey, c_mktsegment]"),
                ("bq_orders", "orders", "o_custkey",
                 "[o_custkey, o_totalprice]"),
            )
        ]:
            _f.result()
    return _pipeline_multi(spark, sf_dir, [], """  - name: c
    module: storage
    parameters: {table: bq_customer}
  - name: o
    module: storage
    parameters: {table: bq_orders}
transforms:
  - name: joined
    module: beamsql
    inputs: [c, o]
    parameters:
      sql: |
        SELECT c_mktsegment, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM c JOIN o ON c_custkey = o_custkey
        GROUP BY c_mktsegment
""")["joined"]


Q_BUCKETED_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def _proto_varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _proto_ld(fno: int, payload: bytes) -> bytes:
    return _proto_varint((fno << 3) | 2) + _proto_varint(len(payload)) + payload


def _proto_vi(fno: int, v: int) -> bytes:
    return _proto_varint(fno << 3) + _proto_varint(v)


def _order_descriptor_set() -> bytes:
    """Serialized FileDescriptorSet for `message Order {int64 id=1; string
    status=2; double price=3; string priority=4;}` — built byte-by-byte
    from the public descriptor.proto wire format (same technique as
    tests/test_protodec.py), independent of the engine's decoder."""
    def field(name: str, number: int, ftype: int) -> bytes:
        return (_proto_ld(1, name.encode()) + _proto_vi(3, number)
                + _proto_vi(4, 1) + _proto_vi(5, ftype))

    order = _proto_ld(1, b"Order") + b"".join(
        _proto_ld(2, f) for f in [
            field("id", 1, 3),        # TYPE_INT64
            field("status", 2, 9),    # TYPE_STRING
            field("price", 3, 1),     # TYPE_DOUBLE
            field("priority", 4, 9),  # TYPE_STRING
        ]
    )
    file_pb = _proto_ld(1, b"order.proto") + _proto_ld(2, b"bench") + _proto_ld(4, order)
    return _proto_ld(1, file_pb)


def q_deserialize_proto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deserialize module, protobuf format: orders rows wire-encoded
    in-query, decoded by the module's stdlib fallback against a
    hand-built FileDescriptorSet, oracled against the plain table."""
    import os
    import struct
    import tempfile

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    desc_path = _tmp_path("order_fds.bin", sf_dir)
    with open(desc_path, "wb") as fh:
        fh.write(_order_descriptor_set())

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sub = orders.filter(F.col("o_orderkey") % 89 == 0)

    @F.pandas_udf("binary")
    def enc(ids: pd.Series, sts: pd.Series, prs: pd.Series, prios: pd.Series) -> pd.Series:
        out = []
        for i, s, p, pr in zip(ids, sts, prs, prios):
            b = _proto_vi(1, int(i))
            b += _proto_ld(2, s.encode())
            b += _proto_varint((3 << 3) | 1) + struct.pack("<d", float(p))
            b += _proto_ld(4, pr.encode())
            out.append(b)
        return pd.Series(out)

    raw = sub.select(
        enc("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority").alias("payload")
    )
    outs = run_pipeline(spark, parse_config(f"""
transforms:
  - name: parsed
    module: deserialize
    inputs: [raw]
    parameters:
      field: payload
      format: protobuf
      descriptorFile: {desc_path}
      messageName: bench.Order
"""), inputs={"raw": raw})
    return outs["parsed"].select(
        "id", "status", F.round("price", 2).alias("price"), "priority"
    )


Q_DESER_PROTO_SQL = """
SELECT o_orderkey AS id, o_orderstatus AS status,
       round(o_totalprice, 2) AS price, o_orderpriority AS priority
FROM orders WHERE o_orderkey % 89 = 0
"""


# ---------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def q_convert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-place delta↔iceberg metadata-only conversion (r9, VERDICT r8
    stretch): leg 1 writes documents[<200] as a DELTA table, converts it
    to ICEBERG (zero data movement) and reads it back through the
    iceberg reader; leg 2 writes documents[200,400) as ICEBERG, converts
    to DELTA and reads through the delta reader.  The union aggregates
    per lang — the oracle recomputes from the original table, so any
    row lost or duplicated in either format hop hash-mismatches."""
    import shutil

    from pipeline_spark.sinks.delta_native import write_delta_native
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sinks.tableconvert import (
        convert_delta_to_iceberg,
        convert_iceberg_to_delta,
    )
    from pipeline_spark.sources.delta_native import read_delta_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    t1 = _tmp_path("conv_d2i", sf_dir)
    t2 = _tmp_path("conv_i2d", sf_dir)
    shutil.rmtree(t1, ignore_errors=True)
    shutil.rmtree(t2, ignore_errors=True)
    write_delta_native(
        spark, docs.where(F.col("doc_id") < 200).coalesce(2), {"path": t1}
    )
    convert_delta_to_iceberg(spark, {"path": t1})
    leg1 = read_iceberg_native(spark, {"path": t1})
    write_iceberg_native(
        docs.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 400))
        .coalesce(2),
        {"path": t2, "mode": "create"},
    )
    convert_iceberg_to_delta(spark, {"path": t2})
    leg2 = read_delta_native(spark, {"path": t2})
    return (
        leg1.unionByName(leg2)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .orderBy("lang")
    )


Q_CONVERT_RT_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents WHERE doc_id < 400
GROUP BY lang ORDER BY lang
"""


def q_iceberg_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 default values (r10, spec §Default values): write
    events[<2000] WITHOUT a tier column, ALTER addColumn tier with
    default 'standard' (metadata-only backfill — the v3 way to add a
    populated column across a 100 TB table with zero data motion), then
    append events[2000,3000) WITH explicit tiers.  Old files read the
    initial-default, the append keeps its values, and an omitted-column
    append takes the write-default.  Grouped by tier; the oracle
    recomputes the CASE from the source table."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        alter_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    t = _tmp_path("ice_dflt", sf_dir)
    shutil.rmtree(t, ignore_errors=True)
    write_iceberg_native(
        ev.where(F.col("event_id") < 2000).coalesce(2),
        {"path": t, "mode": "create"},
    )
    alter_iceberg_native(spark, {
        "path": t,
        "addColumn": {"name": "tier", "type": "string",
                      "default": "standard"},
    })
    write_iceberg_native(
        ev.where((F.col("event_id") >= 2000) & (F.col("event_id") < 3000))
        .withColumn(
            "tier",
            F.when(F.col("value") > 50, F.lit("gold"))
            .otherwise(F.lit("silver")),
        ).coalesce(2),
        {"path": t, "mode": "append"},
    )
    return (
        read_iceberg_native(spark, {"path": t})
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("amt"),
        )
        .orderBy("tier")
    )


Q_ICE_DFLT_SQL = """
SELECT tier, count(*) AS n, round(sum(value), 4) AS amt
FROM (
  SELECT value,
         CASE WHEN event_id < 2000 THEN 'standard'
              WHEN value > 50 THEN 'gold' ELSE 'silver' END AS tier
  FROM events WHERE event_id < 3000
)
GROUP BY tier ORDER BY tier
"""


def q_delta_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta type widening (r10, PROTOCOL.md Type Widening): write
    events[<2000] with value DOWNCAST to float and user_id to int, ALTER
    widenColumn to double/long (METADATA-ONLY — the files stay
    byte-identical, readers upcast at scan), then append
    events[2000,3000) in the widened types.  The mixed-generation
    aggregate matches an oracle that applies the same float round-trip,
    so a mis-typed read or a dropped generation hash-mismatches."""
    import shutil

    from pipeline_spark.sinks.delta_native import (
        alter_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import read_delta_native

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    t = _tmp_path("delta_tw", sf_dir)
    shutil.rmtree(t, ignore_errors=True)
    write_delta_native(
        spark,
        ev.where(F.col("event_id") < 2000).select(
            "event_id",
            F.col("user_id").cast("int").alias("user_id"),
            F.col("value").cast("float").alias("value"),
        ).coalesce(2),
        {"path": t},
    )
    alter_delta_native(spark, {
        "path": t, "widenColumn": {"user_id": "long", "value": "double"},
    })
    write_delta_native(
        spark,
        ev.where((F.col("event_id") >= 2000) & (F.col("event_id") < 3000)),
        {"path": t, "mode": "append"},
    )
    return (
        read_delta_native(spark, {"path": t})
        .groupBy((F.col("user_id") % 7).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("total"),
        )
        .orderBy("bucket")
    )


Q_DELTA_TW_SQL = """
SELECT CAST(user_id % 7 AS BIGINT) AS bucket,
       count(*) AS n,
       round(sum(v), 3) AS total
FROM (
  SELECT user_id,
         CASE WHEN event_id < 2000
              THEN CAST(CAST(value AS FLOAT) AS DOUBLE)
              ELSE value END AS v
  FROM events WHERE event_id < 3000
)
GROUP BY 1 ORDER BY 1
"""


def q_delta_row_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta row tracking (r10, PROTOCOL.md Row Tracking): two appends of
    customers assign contiguous row ids (baseRowId + position), OPTIMIZE
    rewrites the small files while PRESERVING every id via the
    materialized columns, and a DV delete keeps survivors' ids for free.
    The query proves identity end-to-end: after all three operations,
    each row's ``_row_id`` must equal the rank its insert order gave it
    — reconstructed by the oracle as row_number over the insert batches
    — and the per-commit-version counts must match the batch sizes.
    A duplicated, dropped, or reassigned id hash-mismatches."""
    import shutil

    from pipeline_spark.sinks.delta_native import (
        compact_delta_native,
        delete_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import read_delta_native

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_acctbal"
    ).orderBy("c_custkey")
    t = _tmp_path("delta_rt", sf_dir)
    shutil.rmtree(t, ignore_errors=True)
    write_delta_native(
        spark, cust.where(F.col("c_custkey") <= 400).coalesce(1),
        {"path": t, "properties": {
            "delta.enableRowTracking": "true",
            "delta.enableDeletionVectors": "true",
        }},
    )
    write_delta_native(
        spark,
        cust.where((F.col("c_custkey") > 400) & (F.col("c_custkey") <= 800))
        .coalesce(1),
        {"path": t, "mode": "append"},
    )
    compact_delta_native(spark, {"path": t, "minFilesPerGroup": 2})
    delete_delta_native(spark, {
        "path": t, "method": "dv",
        "where": [{"key": "c_custkey", "op": "<=", "value": 100}],
    })
    df = read_delta_native(spark, {"path": t, "withRowIds": True})
    return (
        df.groupBy("_row_commit_version")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_row_id").alias("id_sum"),
            F.min("_row_id").alias("id_min"),
            F.max("_row_id").alias("id_max"),
        )
        .orderBy("_row_commit_version")
    )


Q_DELTA_RT_SQL = """
WITH ordered AS (
  SELECT c_custkey,
         row_number() OVER (ORDER BY c_custkey) - 1 AS rid,
         CASE WHEN c_custkey <= 400 THEN 0 ELSE 1 END AS cv
  FROM customer WHERE c_custkey <= 800
)
SELECT CAST(cv AS BIGINT) AS _row_commit_version,
       count(*) AS n,
       CAST(sum(rid) AS BIGINT) AS id_sum,
       CAST(min(rid) AS BIGINT) AS id_min,
       CAST(max(rid) AS BIGINT) AS id_max
FROM ordered
WHERE c_custkey > 100
GROUP BY cv ORDER BY 1
"""


def q_iceberg_row_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 row lineage (r10, spec §Row Lineage): a v3 table
    assigns explicit per-file first_row_id on create and append,
    compaction MATERIALIZES each surviving row's _row_id through the
    rewrite, and a COW DELETE preserves the survivors' ids.  The oracle
    reconstructs the ids as row_number over insert order — any
    reassigned, duplicated, or dropped id hash-mismatches.  (The delta
    twin is delta_row_tracking.)"""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        compact_iceberg_native,
        delete_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_acctbal"
    ).orderBy("c_custkey")
    t = _tmp_path("ice_lineage", sf_dir)
    shutil.rmtree(t, ignore_errors=True)
    write_iceberg_native(
        cust.where(F.col("c_custkey") <= 400).coalesce(1),
        {"path": t, "mode": "create",
         "properties": {"format-version": "3"}},
    )
    write_iceberg_native(
        cust.where((F.col("c_custkey") > 400) & (F.col("c_custkey") <= 800))
        .coalesce(1),
        {"path": t, "mode": "append"},
    )
    compact_iceberg_native(spark, {"path": t, "minFilesPerGroup": 2})
    delete_iceberg_native(spark, {
        "path": t, "method": "cow",
        "where": [{"key": "c_custkey", "op": "<=", "value": 100}],
    })
    df = read_iceberg_native(spark, {"path": t, "withRowIds": True})
    return (
        df.groupBy((F.col("_row_id") % 4).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_row_id").alias("id_sum"),
            F.min("_row_id").alias("id_min"),
            F.max("_row_id").alias("id_max"),
        )
        .orderBy("bucket")
    )


Q_ICE_LINEAGE_SQL = """
WITH ordered AS (
  SELECT c_custkey,
         row_number() OVER (ORDER BY c_custkey) - 1 AS rid
  FROM customer WHERE c_custkey <= 800
)
SELECT CAST(rid % 4 AS BIGINT) AS bucket,
       count(*) AS n,
       CAST(sum(rid) AS BIGINT) AS id_sum,
       CAST(min(rid) AS BIGINT) AS id_min,
       CAST(max(rid) AS BIGINT) AS id_max
FROM ordered
WHERE c_custkey > 100
GROUP BY 1 ORDER BY 1
"""


def q_uniform_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniForm under STREAMING (r11, VERDICT r10 stretch): a structured
    streaming delta sink on a UniForm table syncs the iceberg mirror
    per micro-batch, so an iceberg reader sees consistent state
    MID-STREAM — after the first stream drains but before the second
    resumes from its checkpoint — and again after resume.  The query
    reads the ICEBERG surface at both points; the oracle recomputes
    each phase from the source table, so a missed batch sync, a stale
    mirror marker, or a double-applied replayed batch all mismatch."""
    import shutil

    from pipeline_spark.registry import ModuleContext
    from pipeline_spark.sinks.delta_native import (
        delta_sink,
        write_delta_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    t = _tmp_path("uniform_stream", sf_dir)
    stage = _tmp_path("uniform_stream_src", sf_dir)
    ckpt = t + "_checkpoint"
    for d in (t, stage, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    write_delta_native(
        spark, ev.where(F.lit(False)),
        {"path": t, "properties": {
            "delta.universalFormat.enabledFormats": "iceberg"}},
    )

    def _run_stream():
        sdf = (
            spark.readStream.schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(stage + "/*")
        )
        delta_sink(ModuleContext(
            spark=spark, name="w", params={"path": t}, inputs=[sdf],
            input_names=["in"],
        ))

    # phase 1: two micro-batch files, stream drains, iceberg read.
    # The two staged files are independent fixture writes — land them as
    # concurrent jobs (guide §2.6, the bucketed_join/iceberg_addfiles
    # shape) instead of serially; the stream still starts only after
    # BOTH are on disk, so batch content and order are unchanged.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        for _f in [
            _pool.submit(
                lambda d, p: d.coalesce(1).write.parquet(p),
                ev.where(F.col("event_id") < 500), f"{stage}/b1",
            ),
            _pool.submit(
                lambda d, p: d.coalesce(1).write.parquet(p),
                ev.where(
                    (F.col("event_id") >= 500) & (F.col("event_id") < 1000)
                ), f"{stage}/b2",
            ),
        ]:
            _f.result()
    _run_stream()
    mid = (
        read_iceberg_native(spark, {"path": t})
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("amt"))
        .withColumn("phase", F.lit("mid"))
    )
    mid_rows = mid.collect()  # materialize BEFORE the stream resumes
    # phase 2: one more file lands; the stream RESUMES from checkpoint
    ev.where((F.col("event_id") >= 1000) & (F.col("event_id") < 1500)) \
        .coalesce(1).write.parquet(f"{stage}/b3")
    _run_stream()
    final = (
        read_iceberg_native(spark, {"path": t})
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("amt"))
        .withColumn("phase", F.lit("final"))
    )
    mid_df = spark.createDataFrame(mid_rows, mid.schema)
    return mid_df.unionByName(final).select("phase", "n", "amt") \
        .orderBy("phase")


Q_UNIFORM_STREAM_SQL = """
SELECT 'final' AS phase, count(*) AS n,
       round(sum(value), 4) AS amt
FROM events WHERE event_id < 1500
UNION ALL
SELECT 'mid' AS phase, count(*) AS n,
       round(sum(value), 4) AS amt
FROM events WHERE event_id < 1000
ORDER BY phase
"""


def uniform_stream_stage_breakdown(spark: SparkSession, sf_dir: str) -> dict:
    """Per-stage wall-clock of the uniform_stream pipeline (r13, VERDICT
    r12 ask #7: slowest bench row, never broken down).  Times each stage
    separately AND runs a TWIN stream on a plain delta table (same
    files, same 1-file-per-trigger cadence, no UniForm property) so the
    per-micro-batch iceberg mirror sync cost is the DIFFERENCE of the
    drain times — trigger scheduling overhead cancels in the subtraction,
    the same protocol as the buffered-pane microbench."""
    import shutil
    import time as _time

    from pipeline_spark.registry import ModuleContext
    from pipeline_spark.sinks.delta_native import delta_sink, write_delta_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    out: dict[str, float] = {}

    def _t(fn):
        t0 = _time.time()
        fn()
        return round(_time.time() - t0, 3)

    def _drain(stage, t, ckpt):
        sdf = (
            spark.readStream.schema(
                "event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(stage + "/*")
        )
        delta_sink(ModuleContext(
            spark=spark, name="w",
            params={"path": t, "checkpointLocation": ckpt},
            inputs=[sdf], input_names=["in"],
        ))

    # two rounds of the twin pair, min per stage: the FIRST streaming
    # query of a session pays foreachBatch/stream-engine warmup that
    # otherwise lands entirely on whichever twin runs first and flips
    # the subtraction's sign (measured -1.07 s on a cold session)
    for rnd in range(2):
        for label, props in (
            ("plain", {}),
            ("uniform", {"delta.universalFormat.enabledFormats": "iceberg"}),
        ):
            stage = _tmp_path(f"ustream_bd_src_{label}{rnd}", sf_dir)
            t = _tmp_path(f"ustream_bd_{label}{rnd}", sf_dir)
            ckpt = t + "_checkpoint"
            for d in (stage, t, ckpt):
                shutil.rmtree(d, ignore_errors=True)
            ev.where(F.col("event_id") < 500).coalesce(1) \
                .write.parquet(f"{stage}/b1")
            ev.where(
                (F.col("event_id") >= 500) & (F.col("event_id") < 1000)
            ).coalesce(1).write.parquet(f"{stage}/b2")

            def rec(key, sec):
                out[key] = min(out.get(key, 9e9), sec)

            rec(f"{label}_setup_sec", _t(lambda: write_delta_native(
                spark, ev.where(F.lit(False)),
                {"path": t, "properties": props},
            )))
            rec(f"{label}_drain2_batches_sec", _t(
                lambda: _drain(stage, t, ckpt)))
            if label == "uniform":
                rec("mid_iceberg_read_sec", _t(lambda: read_iceberg_native(
                    spark, {"path": t}).agg(F.sum("value")).collect()))
            ev.where(
                (F.col("event_id") >= 1000) & (F.col("event_id") < 1500)
            ).coalesce(1).write.parquet(f"{stage}/b3")
            rec(f"{label}_resume1_batch_sec", _t(
                lambda: _drain(stage, t, ckpt)))
            if label == "uniform":
                rec("final_iceberg_read_sec", _t(lambda: read_iceberg_native(
                    spark, {"path": t}).agg(F.sum("value")).collect()))
    out["sync_cost_2_batches_sec"] = round(
        out["uniform_drain2_batches_sec"] - out["plain_drain2_batches_sec"], 3
    )
    out["sync_cost_resume_sec"] = round(
        out["uniform_resume1_batch_sec"] - out["plain_resume1_batch_sec"], 3
    )
    return out


def q_iceberg_row_lineage_inherited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 row-lineage INHERITANCE on read (r11, spec §Row
    Lineage): a FOREIGN v3 writer may omit per-file first_row_id
    entirely; readers must derive each file's base from the adding
    snapshot's first-row-id plus the running record_count of preceding
    ADDED files in manifest order.  The query builds a three-snapshot
    v3 table, STRIPS every explicit per-file id from the manifests
    (simulating such a writer), and reads ids back — the oracle
    reconstructs them as row_number over insert order, so a derivation
    that loses a file's base, double-counts, or misorders manifests
    hash-mismatches.  Seam: sources/iceberg_native.py plan_files
    inheritance walk."""
    import shutil

    from pipeline_spark.functions.avroocf import (
        read_ocf_file,
        read_ocf_file_with_meta,
        write_ocf_bytes,
    )
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import (
        _strip_scheme,
        load_table_metadata,
        read_iceberg_native,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_acctbal"
    ).orderBy("c_custkey")
    t = _tmp_path("ice_lineage_inh", sf_dir)
    shutil.rmtree(t, ignore_errors=True)
    bands = [(-1, 300), (300, 600), (600, 900)]  # custkeys start at 0
    for i, (lo, hi) in enumerate(bands):
        write_iceberg_native(
            cust.where((F.col("c_custkey") > lo) & (F.col("c_custkey") <= hi))
            .coalesce(1).sortWithinPartitions("c_custkey"),
            {"path": t, "mode": "create" if i == 0 else "append",
             **({"properties": {"format-version": "3"}} if i == 0 else {})},
        )
    # strip the explicit ids: every manifest of every snapshot
    meta = load_table_metadata(t)
    manifest_paths = set()
    for snap in meta.get("snapshots") or []:
        _, mans = read_ocf_file(_strip_scheme(snap["manifest-list"]))
        manifest_paths.update(_strip_scheme(m["manifest_path"]) for m in mans)
    for mp in manifest_paths:
        schema_json, ometa, recs = read_ocf_file_with_meta(mp)
        rows = list(recs)
        for r in rows:
            if (r.get("data_file") or {}).get("first_row_id") is not None:
                r["data_file"]["first_row_id"] = None
        extra = {k: v.decode() for k, v in ometa.items()
                 if k not in ("avro.schema", "avro.codec")}
        with open(mp, "wb") as fh:
            fh.write(write_ocf_bytes(schema_json, rows, extra_meta=extra))
    df = read_iceberg_native(spark, {"path": t, "withRowIds": True})
    return (
        df.groupBy((F.col("_row_id") % 5).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_row_id").alias("id_sum"),
            F.sum("c_custkey").alias("key_sum"),
            F.max("_row_id").alias("id_max"),
        )
        .orderBy("bucket")
    )


Q_ICE_LINEAGE_INH_SQL = """
WITH ordered AS (
  SELECT c_custkey,
         row_number() OVER (ORDER BY c_custkey) - 1 AS rid
  FROM customer WHERE c_custkey <= 900
)
SELECT CAST(rid % 5 AS BIGINT) AS bucket,
       count(*) AS n,
       CAST(sum(rid) AS BIGINT) AS id_sum,
       CAST(sum(c_custkey) AS BIGINT) AS key_sum,
       CAST(max(rid) AS BIGINT) AS id_max
FROM ordered
GROUP BY 1 ORDER BY 1
"""


def q_uniform_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniForm continuous format sync (r10, delta-spark's
    delta.universalFormat.enabledFormats=iceberg): a delta table created
    with the property keeps LIVE iceberg metadata over the same files
    across create → append → DV delete → update.  The query reads the
    final state through BOTH protocol surfaces and joins them per group
    — any divergence (a commit the sync missed, a bound mistranslated
    from add.stats, a DV not re-framed) breaks the equality columns the
    oracle pins."""
    import shutil

    from pipeline_spark.sinks.delta_native import (
        delete_delta_native,
        update_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sources.delta_native import read_delta_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    t = _tmp_path("uniform", sf_dir)
    shutil.rmtree(t, ignore_errors=True)
    write_delta_native(
        spark, docs.where(F.col("doc_id") < 400).coalesce(2),
        {"path": t, "properties": {
            "delta.universalFormat.enabledFormats": "iceberg",
            "delta.enableDeletionVectors": "true",
        }},
    )
    write_delta_native(
        spark,
        docs.where((F.col("doc_id") >= 400) & (F.col("doc_id") < 600)),
        {"path": t, "mode": "append"},
    )
    delete_delta_native(spark, {
        "path": t, "method": "dv",
        "where": [{"key": "doc_id", "op": "<", "value": 100}],
    })
    update_delta_native(spark, {
        "path": t,
        "where": [{"key": "doc_id", "op": "<", "value": 200}],
        "set": {"n_chars": "n_chars + 1000"},
    })
    delta_side = (
        read_delta_native(spark, {"path": t})
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_delta"),
             F.sum("n_chars").alias("chars_delta"))
    )
    ice_side = (
        read_iceberg_native(spark, {"path": t})
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_ice"),
             F.sum("n_chars").alias("chars_ice"))
    )
    return (
        delta_side.join(ice_side, "lang")
        .select("lang", "n_delta", "n_ice", "chars_delta", "chars_ice")
        .orderBy("lang")
    )


def q_uniform_resync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniForm full-resync fallback (r12, VERDICT r11 stretch #8): the
    incremental append path refuses to chain onto a STALE mirror
    (sinks/tableconvert.py sync_uniform_append — the mirror must
    reflect the immediately-prior delta version, else chaining would
    silently drop the missed commits) and the commit hook then
    self-heals via full regeneration from current delta state.

    Simulation: create+append in sync, then roll the iceberg mirror
    back one metadata version (exactly what a sync that died before
    its create-exclusive publish leaves behind), assert the mirror
    really is stale (iceberg misses a batch), then one more normal
    append — the guard must reject the incremental chain and the full
    regen must re-converge BOTH surfaces over all four commits, which
    the per-group equality oracle pins."""
    import re as _re
    import shutil

    from pipeline_spark.sinks.delta_native import write_delta_native
    from pipeline_spark.sources.delta_native import read_delta_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    t = _tmp_path("uniform_resync", sf_dir)
    shutil.rmtree(t, ignore_errors=True)
    write_delta_native(
        spark, docs.where(F.col("doc_id") < 300).coalesce(2),
        {"path": t, "properties": {
            "delta.universalFormat.enabledFormats": "iceberg",
        }},
    )
    for lo, hi in ((300, 400), (400, 500)):
        write_delta_native(
            spark,
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            {"path": t, "mode": "append"},
        )
    # roll the mirror back one metadata version: the second append's
    # sync "never published"
    meta_dir = os.path.join(t, "metadata")
    vs = sorted(
        int(m.group(1)) for m in (
            _re.match(r"v(\d+)\.metadata\.json$", n)
            for n in os.listdir(meta_dir)
        ) if m
    )
    os.remove(os.path.join(meta_dir, f"v{vs[-1]}.metadata.json"))
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint, "w") as fh:
            fh.write(str(vs[-2]))
    n_ice = read_iceberg_native(spark, {"path": t}).count()
    n_delta = read_delta_native(spark, {"path": t}).count()
    if n_ice >= n_delta:
        raise AssertionError(
            f"mirror rollback did not stale the iceberg side "
            f"({n_ice} >= {n_delta})"
        )
    # normal append: sync_uniform_append must REFUSE the stale chain
    # (mirror reflects delta v1, commit is v3) and full-regen instead
    write_delta_native(
        spark,
        docs.where((F.col("doc_id") >= 500) & (F.col("doc_id") < 600)),
        {"path": t, "mode": "append"},
    )
    delta_side = (
        read_delta_native(spark, {"path": t})
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_delta"),
             F.sum("n_chars").alias("chars_delta"))
    )
    ice_side = (
        read_iceberg_native(spark, {"path": t})
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_ice"),
             F.sum("n_chars").alias("chars_ice"))
    )
    return (
        delta_side.join(ice_side, "lang")
        .select("lang", "n_delta", "n_ice", "chars_delta", "chars_ice")
        .orderBy("lang")
    )


Q_UNIFORM_RESYNC_SQL = """
SELECT lang,
       count(*) AS n_delta,
       count(*) AS n_ice,
       CAST(sum(n_chars) AS BIGINT) AS chars_delta,
       CAST(sum(n_chars) AS BIGINT) AS chars_ice
FROM documents
WHERE doc_id < 600
GROUP BY lang
ORDER BY lang
"""


Q_UNIFORM_SQL = """
WITH state AS (
  SELECT lang,
         CASE WHEN doc_id < 200 THEN n_chars + 1000 ELSE n_chars END AS nc
  FROM documents
  WHERE doc_id >= 100 AND doc_id < 600
)
SELECT lang,
       count(*) AS n_delta,
       count(*) AS n_ice,
       CAST(sum(nc) AS BIGINT) AS chars_delta,
       CAST(sum(nc) AS BIGINT) AS chars_ice
FROM state GROUP BY lang ORDER BY lang
"""


def q_iceberg_addfiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg add_files import (r10, the public AddFilesProcedure
    shape): documents[<600] written as plain HIVE-layout parquet
    (partitioned by lang — the columns live only in the directory
    names) registers into an iceberg table IN PLACE, then a second
    directory appends.  Reads fill the partition column from manifest
    records (spec Column Projection #2) and prune on it; the oracle
    recomputes from the source table, so a lost file, a mistyped
    partition value, or a broken fill hash-mismatches."""
    import shutil

    from pipeline_spark.sinks.iceberg_addfiles import (
        add_files_iceberg_native,
    )
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    h1 = _tmp_path("addf_h1", sf_dir)
    h2 = _tmp_path("addf_h2", sf_dir)
    t = _tmp_path("addf_ice", sf_dir)
    for d in (h1, h2, t):
        shutil.rmtree(d, ignore_errors=True)
    # the two hive directories are independent fixtures: write them as
    # concurrent jobs (guide §2.6 — the second job's tasks back-fill the
    # first's tail) instead of serially; the add_files imports stay
    # ordered (both mutate the same table)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        futs = [
            _pool.submit(
                lambda d, p: d.write.partitionBy("lang").parquet(p),
                docs.where(F.col("doc_id") < 300), h1,
            ),
            _pool.submit(
                lambda d, p: d.write.partitionBy("lang").parquet(p),
                docs.where(
                    (F.col("doc_id") >= 300) & (F.col("doc_id") < 600)
                ), h2,
            ),
        ]
        for f in futs:
            f.result()
    add_files_iceberg_native(spark, {"path": t, "sourceDir": h1})
    add_files_iceberg_native(spark, {"path": t, "sourceDir": h2})
    return (
        read_iceberg_native(spark, {"path": t})
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .orderBy("lang")
    )


Q_ADDFILES_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents WHERE doc_id < 600
GROUP BY lang ORDER BY lang
"""


def q_convert_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10 conversion surface in one oracled row: a PARTITIONED,
    COLUMN-MAPPED, DV-CARRYING delta table converts to iceberg in place
    (identity spec + physical-name write schema + v3 puffin DVs —
    references sinks/tableconvert.py), then iceberg COW DELETE on a
    PARTITION column proves the identity-fill probe works and the
    rewrite MATERIALIZES the partition columns.  The final read groups
    per lang; the oracle recomputes from the source table, so a row
    lost in the conversion, the DV translation, the fill, or the
    partition-scoped rewrite hash-mismatches."""
    import shutil

    from pipeline_spark.sinks.delta_native import (
        delete_delta_native,
        write_delta_native,
    )
    from pipeline_spark.sinks.iceberg_native import delete_iceberg_native
    from pipeline_spark.sinks.tableconvert import convert_delta_to_iceberg
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    ).where(F.col("doc_id") < 500)
    t = _tmp_path("conv_part", sf_dir)
    shutil.rmtree(t, ignore_errors=True)
    write_delta_native(
        spark, docs, {
            "path": t, "partitionBy": ["lang"],
            "properties": {"delta.columnMapping.mode": "name",
                           "delta.enableDeletionVectors": "true"},
        },
    )
    delete_delta_native(spark, {
        "path": t, "method": "dv",
        "where": [{"key": "doc_id", "op": "<", "value": 100}],
    })
    convert_delta_to_iceberg(spark, {"path": t})
    delete_iceberg_native(spark, {
        "path": t, "method": "cow",
        "where": [{"key": "lang", "op": "=", "value": "de"}],
    })
    return (
        read_iceberg_native(spark, {"path": t})
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .orderBy("lang")
    )


Q_CONVERT_PART_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
WHERE doc_id >= 100 AND doc_id < 500 AND lang <> 'de'
GROUP BY lang ORDER BY lang
"""


def q_convert_eqdelete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg EQUALITY deletes → delta conversion (r11, VERDICT r10
    ask #4): an iceberg table with an equality-delete file (CDC upsert
    shape: delete-by-key + re-insert in the SAME merge snapshot) plus a
    later position delete converts in place — the equality deletes
    MATERIALIZE into per-file roaring DVs via a distributed semi-join
    under the spec's null-safe-equality + strict-sequence rule, zero
    data rewrite.  The final read goes through the DELTA surface; the
    oracle recomputes survivors from the source table, so a delete
    applied to the wrong sequence range (killing the upserted row) or a
    missed position hash-mismatches."""
    import shutil

    from pipeline_spark.sinks.iceberg_native import (
        delete_iceberg_native,
        merge_iceberg_native,
        write_iceberg_native,
    )
    from pipeline_spark.sinks.tableconvert import convert_iceberg_to_delta
    from pipeline_spark.sources.delta_native import read_delta_native

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    ).where(F.col("doc_id") < 500)
    t = _tmp_path("conv_eq", sf_dir)
    shutil.rmtree(t, ignore_errors=True)
    write_iceberg_native(docs.coalesce(2), {"path": t, "mode": "create"})
    # MOR merge: equality-delete the keys then re-append them mutated —
    # the classic CDC upsert (one snapshot, eq-delete + data file)
    merge_iceberg_native(
        spark,
        docs.where(F.col("doc_id") < 150)
        .withColumn("n_chars", F.col("n_chars") + 10000),
        {"path": t, "primaryKeys": ["doc_id"], "method": "mor"},
    )
    # a position delete on top (mixed delete shapes must combine)
    delete_iceberg_native(spark, {
        "path": t, "method": "mor",
        "where": [{"key": "doc_id", "op": ">=", "value": 450}],
    })
    convert_iceberg_to_delta(spark, {"path": t})
    return (
        read_delta_native(spark, {"path": t})
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .orderBy("lang")
    )


Q_CONVERT_EQ_SQL = """
SELECT lang, count(*) AS n,
       CAST(sum(CASE WHEN doc_id < 150 THEN n_chars + 10000
                     ELSE n_chars END) AS BIGINT) AS chars
FROM documents
WHERE doc_id < 450
GROUP BY lang ORDER BY lang
"""


def q_localdb_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """localH2 sink (r9): build one embedded sqlite database artifact PER
    LANG from documents (the reference's per-group H2 database shape,
    sqlite-backed), then read every artifact back with sqlite3 and count
    its rows — the oracle recomputes the group sizes from the source
    table, so a row lost or duplicated inside any artifact mismatches."""
    import shutil
    import sqlite3
    import zipfile

    out = _tmp_path("localdb", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    run_pipeline(spark, parse_config(f"""
sources:
  - name: documents
    module: storage
    parameters: {{format: parquet, input: {sf_dir}/documents.parquet}}
transforms:
  - name: subset
    module: filter
    inputs: [documents]
    parameters:
      filters: [{{key: doc_id, op: "<", value: 500}}]
      select:
        - {{name: doc_id}}
        - {{name: lang}}
        - {{name: n_chars}}
sinks:
  - name: db
    module: localH2
    inputs: [subset]
    parameters:
      output: {out}
      groupFields: [lang]
      configs:
        - {{input: subset, table: docs, keyFields: [doc_id],
            op: INSERT_OR_UPDATE}}
"""))
    rows = []
    for name in sorted(os.listdir(out)):
        if not name.endswith(".db.zip"):
            continue
        lang = name[: -len(".db.zip")]
        with zipfile.ZipFile(os.path.join(out, name)) as zf:
            with zf.open("local.db") as src:
                tmp = os.path.join(out, f".{lang}.db")
                with open(tmp, "wb") as dst:
                    dst.write(src.read())
        con = sqlite3.connect(tmp)
        n, chars = con.execute(
            "SELECT count(*), sum(n_chars) FROM docs"
        ).fetchone()
        con.close()
        rows.append((lang, int(n), int(chars)))
    return spark.createDataFrame(rows, "lang string, n long, chars long")


Q_LOCALDB_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents WHERE doc_id < 500
GROUP BY lang
"""


def q_auxia_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """auxia sink (r9): documents become LogEventsRequest events
    (user_id/event_name + catch-all event_properties) published through
    the injectable pubsub client (spool fake); the spooled requests are
    re-aggregated per event_name and checked against the source table."""
    import json as _json
    import shutil

    from pipeline_spark.testing import read_spool

    spool = _tmp_path("auxia_spool", sf_dir)
    shutil.rmtree(spool, ignore_errors=True)
    run_pipeline(spark, parse_config(f"""
sources:
  - name: documents
    module: storage
    parameters: {{format: parquet, input: {sf_dir}/documents.parquet}}
transforms:
  - name: events
    module: beamsql
    inputs: [documents]
    parameters:
      sql: "SELECT CAST(doc_id AS STRING) AS user_id, lang AS event_name, n_chars FROM documents WHERE doc_id < 300"
sinks:
  - name: crm
    module: auxia
    inputs: [events]
    parameters:
      projectId: demo
      pubsub: {{topic: projects/p/topics/auxia}}
      clientFactory: "pipeline_spark.testing:fake_writer_client"
      spoolDir: {spool}
"""))
    reqs = [m["row"] for m in read_spool(spool)]
    rows = [
        (
            r["events"][0]["event_name"],
            int(r["events"][0]["event_properties"]["n_chars"]["long_value"]),
        )
        for r in reqs
    ]
    df = spark.createDataFrame(rows, "event_name string, n_chars long")
    return (
        df.groupBy("event_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .orderBy("event_name")
    )


Q_AUXIA_SQL = """
SELECT lang AS event_name, count(*) AS n,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents WHERE doc_id < 300
GROUP BY event_name ORDER BY event_name
"""


def q_timestamp_combiner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strategy.window.timestampCombiner (Strategy.java:72-74,129): the
    two-stage windowing knob.  Stage 1 aggregates 15-minute windows and
    carries the combined event time downstream (end_of_window = Beam's
    maxTimestamp = window.end - 1ms; earliest/latest = min/max input
    time); stage 2 re-windows hourly on that derived timestamp.  All
    three combiner values run and union, tagged."""
    parts = []
    for combiner in ("end_of_window", "earliest", "latest"):
        df = _pipeline(spark, sf_dir, ["events"], f"""
transforms:
  - name: agg
    module: aggregation
    inputs: [events]
    timestampAttribute: ts
    strategy:
      window: {{type: fixed, size: 900, unit: second, timestampCombiner: {combiner}}}
    parameters:
      groupFields: [event_type]
      aggregations:
        - {{name: v, op: sum, field: value}}
  - name: agg2
    module: aggregation
    inputs: [agg]
    timestampAttribute: ts
    strategy:
      window: {{type: fixed, size: 1, unit: hour}}
    parameters:
      groupFields: [event_type]
      aggregations:
        - {{name: n_windows, op: count}}
        - {{name: total, op: sum, field: v}}
""", "agg2")
        parts.append(
            df.select(
                F.lit(combiner).alias("combiner"),
                F.col("window.start").alias("hour"),
                "event_type",
                "n_windows",
                F.round("total", 4).alias("total"),
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


Q_TS_COMBINER_SQL = """
WITH s1 AS (
  SELECT event_type,
         to_timestamp(floor(epoch(ts) / 900) * 900) AS wstart,
         sum(value) AS v,
         min(ts) AS early,
         max(ts) AS late
  FROM events
  GROUP BY 1, 2
),
staged AS (
  SELECT 'end_of_window' AS combiner, event_type,
         wstart + INTERVAL 900 SECOND - INTERVAL 1 MILLISECOND AS cts, v
  FROM s1
  UNION ALL
  SELECT 'earliest', event_type, early, v FROM s1
  UNION ALL
  SELECT 'latest', event_type, late, v FROM s1
)
SELECT combiner,
       CAST(to_timestamp(floor(epoch(cts) / 3600) * 3600) AS TIMESTAMP) AS hour,
       event_type,
       count(*) AS n_windows,
       round(sum(v), 4) AS total
FROM staged
GROUP BY 1, 2, 3
"""


def q_timestamp_combiner_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-input timestampCombiner (VERDICT r14 ask #3): the
    least/greatest merge of the per-input hidden min/max aggregates
    across the multi-input full-outer join
    (operators/aggregation.py), exercised where window occupancy is
    DISJOINT — input a holds minutes [0,45), input b [30,60), so
    :00/:15 windows have a null b-branch, :45 windows a null a-branch,
    and :30 windows merge two non-null event times.  earliest AND
    latest both run, two-stage re-windowed hourly on the derived
    timestamp, vs a DuckDB two-table full-outer oracle."""
    parts = []
    for combiner in ("earliest", "latest"):
        df = _pipeline(spark, sf_dir, ["events"], f"""
transforms:
  - name: a
    module: beamsql
    inputs: [events]
    parameters:
      sql: "SELECT event_type, ts, value FROM events WHERE minute(ts) < 45"
  - name: b
    module: beamsql
    inputs: [events]
    parameters:
      sql: "SELECT event_type, ts FROM events WHERE minute(ts) >= 30"
  - name: agg
    module: aggregation
    inputs: [a, b]
    timestampAttribute: ts
    strategy:
      window: {{type: fixed, size: 900, unit: second, timestampCombiner: {combiner}}}
    parameters:
      groupFields: [event_type]
      aggregations:
        - input: a
          fields:
            - {{name: na, op: count}}
            - {{name: va, op: sum, field: value}}
        - input: b
          fields:
            - {{name: nb, op: count}}
  - name: agg2
    module: aggregation
    inputs: [agg]
    timestampAttribute: ts
    strategy:
      window: {{type: fixed, size: 1, unit: hour}}
    parameters:
      groupFields: [event_type]
      aggregations:
        - {{name: n_windows, op: count}}
        - {{name: a_rows, op: sum, field: na}}
        - {{name: b_rows, op: sum, field: nb}}
        - {{name: a_total, op: sum, field: va}}
""", "agg2")
        parts.append(
            df.select(
                F.lit(combiner).alias("combiner"),
                F.col("window.start").alias("hour"),
                "event_type",
                "n_windows",
                "a_rows",
                "b_rows",
                F.round("a_total", 4).alias("a_total"),
            )
        )
    return parts[0].unionByName(parts[1])


Q_TS_COMBINER_MULTI_SQL = """
WITH a AS (
  SELECT event_type, ts, value FROM events WHERE minute(ts) < 45
),
b AS (
  SELECT event_type, ts FROM events WHERE minute(ts) >= 30
),
sa AS (
  SELECT event_type,
         to_timestamp(floor(epoch(ts) / 900) * 900) AS w,
         count(*) AS na, sum(value) AS va,
         min(ts) AS amin, max(ts) AS amax
  FROM a GROUP BY 1, 2
),
sb AS (
  SELECT event_type,
         to_timestamp(floor(epoch(ts) / 900) * 900) AS w,
         count(*) AS nb,
         min(ts) AS bmin, max(ts) AS bmax
  FROM b GROUP BY 1, 2
),
j AS (
  SELECT coalesce(sa.event_type, sb.event_type) AS event_type,
         na, va, nb,
         least(amin, bmin) AS early,
         greatest(amax, bmax) AS late
  FROM sa FULL OUTER JOIN sb
    ON sa.event_type = sb.event_type AND sa.w = sb.w
),
staged AS (
  SELECT 'earliest' AS combiner, event_type, early AS cts, na, va, nb
  FROM j
  UNION ALL
  SELECT 'latest', event_type, late, na, va, nb FROM j
)
SELECT combiner,
       CAST(to_timestamp(floor(epoch(cts) / 3600) * 3600) AS TIMESTAMP)
         AS hour,
       event_type,
       count(*) AS n_windows,
       CAST(sum(na) AS BIGINT) AS a_rows,
       CAST(sum(nb) AS BIGINT) AS b_rows,
       round(sum(va), 4) AS a_total
FROM staged
GROUP BY 1, 2, 3
"""


def q_reshuffle_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reshuffle module (ReshuffleTransform.java:8-29): an explicit
    repartition is content-identity; the realized partition count is
    surfaced as a literal column so the oracle hash-checks that the
    requested shard count actually took effect (AQE must not coalesce a
    user-specified repartition number)."""
    df = _pipeline(spark, sf_dir, ["lineitem"], """
transforms:
  - name: shuffled
    module: reshuffle
    inputs: [lineitem]
    parameters: {numShards: 7}
""", "shuffled")
    n_parts = df.rdd.getNumPartitions()
    return df.select(
        "l_orderkey", "l_linenumber", "l_quantity",
        F.lit(n_parts).cast("int").alias("n_parts"),
    )


Q_RESHUFFLE_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, CAST(7 AS INT) AS n_parts
FROM lineitem
"""


def _build_mlp64_onnx() -> bytes:
    """Deterministic 64->16->1 MLP as raw ONNX wire bytes — delegates
    to the single shared builder (functions/onnxwire.py; ADVICE r14:
    the entry, the examples fixture, and the executor tests each
    carried a drift-prone copy)."""
    from pipeline_spark.functions.onnxwire import build_mlp64

    return build_mlp64()


def q_onnx_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """onnx transform (ONNXTransform.java; numpy executor,
    functions/onnxexec.py): a seeded 64->16->1 MLP scores the
    embeddings table; output = per-vector predicted label.  The oracle
    re-implements the forward pass in DuckDB list arithmetic with the
    SAME seeded weights — label margins are 5 orders of magnitude above
    the float32-vs-float64 deviation (verified: min |z| 0.50 vs max
    drift 2e-6), so the row is deterministic."""
    import os

    model_path = _tmp_path("onnx_score_model", sf_dir) + ".onnx"
    with open(model_path, "wb") as fh:
        fh.write(_build_mlp64_onnx())
    df = _pipeline(spark, sf_dir, ["embeddings"], f"""
transforms:
  - name: scored
    module: onnx
    inputs: [embeddings]
    parameters:
      model: {model_path}
      inputs: {{x: embedding}}
      outputs:
        - {{name: score, type: float32}}
""", "scored")
    try:
        os.remove(model_path)
    except OSError:
        pass
    return df.select(
        "vec_id",
        (F.col("score") > F.lit(0.5)).cast("int").alias("label"),
    )


def _onnx_score_oracle_sql() -> str:
    """DuckDB forward pass with the same seeded weights: sigmoid(z) > .5
    iff z > 0, so the label needs no exp at all."""
    import numpy as np

    rng = np.random.RandomState(7)
    W = rng.randn(64, 16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    W2 = rng.randn(16, 1).astype(np.float32)
    hidden_terms = []
    for j in range(16):
        w_list = ", ".join(repr(float(x)) for x in W[:, j])
        hidden_terms.append(
            f"greatest(0.0, list_dot_product(embedding, [{w_list}]) "
            f"+ {float(b[j])!r}) * {float(W2[j, 0])!r}"
        )
    z = " + ".join(hidden_terms)
    return f"SELECT vec_id, CAST(({z}) > 0 AS INT) AS label FROM embeddings"


def q_example_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """example module (ExampleTransform.java:13-40): union inputs +
    bounded driver-side sample print, rows passed through UNCHANGED —
    the passthrough contract is what the oracle hash-checks."""
    df = _pipeline(spark, sf_dir, ["region", "nation"], """
transforms:
  - name: demo
    module: example
    inputs: [nation, region]
    parameters: {numRows: 3}
""", "demo")
    return df.select("n_nationkey", "n_name", "n_regionkey", "r_regionkey", "r_name")


Q_EXAMPLE_SQL = """
SELECT n_nationkey, n_name, n_regionkey,
       CAST(NULL AS BIGINT) AS r_regionkey, CAST(NULL AS VARCHAR) AS r_name
FROM nation
UNION ALL
SELECT CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
       r_regionkey, r_name
FROM region
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING CONTRACT: the driver's CORRECTNESS gate caps at the
    # first 50 entries, never-green-first.  r15 composition (VERDICT
    # r14 ask #2): the new never-green row (timestamp_combiner_multi —
    # the least/greatest merge of per-input hidden min/max across the
    # multi-input full-outer join, disjoint window occupancy) + ALL 37
    # r12-stale rows + 10 r13 fills biased to the paths this round's
    # diff touched (iceberg eq-delete/legacy machinery, pane streaming,
    # windowed aggregation) + the headline pair.  Staleness floor moves
    # r12 -> r13.
    return {
        # --- never green: the new r15 row (multi-input combiner with
        #     disjoint window occupancy — VERDICT r14 ask #3)
        "timestamp_combiner_multi": q_timestamp_combiner_multi,
        # --- all 37 r12-stale rows (VERDICT r14 ask #2: staleness
        #     floor moves r12 -> r13)
        "pq_topk": q_pq_topk,
        "ivfpq_topk": q_ivfpq_topk,
        "uniform_resync": q_uniform_resync,
        "delta_merge_upsert": q_delta_merge_upsert,
        "iceberg_branch_wap": q_iceberg_branch_wap,
        "delta_cdf": q_delta_cdf,
        "delta_v2_checkpoint": q_delta_v2_checkpoint,
        "iceberg_spec_evolution": q_iceberg_spec_evolution,
        "bucketed_join": q_bucketed_join,
        "lookup_enrich": q_lookup_enrich,
        "agg_collect": q_agg_collect,
        "agg_stats": q_agg_stats,
        "multi_input_agg": q_multi_input_agg,
        "rollup_agg": q_rollup_agg,
        "pivot_agg": q_pivot_agg,
        "sql_mdt_udfs": q_sql_mdt_udfs,
        "tokenize_unnest": q_tokenize_unnest,
        "dedup_exact": q_dedup_exact,
        "textstats": q_textstats,
        "ngram_jaccard": q_ngram_jaccard,
        "similarity_bruteforce": q_similarity_bruteforce,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_bucketed": q_embedding_neardup_bucketed,
        "multimodal_meta": q_multimodal_meta,
        "image_codec_roundtrip": q_image_codec_roundtrip,
        "audio_roundtrip": q_audio_roundtrip,
        "minhash_pairs": q_minhash_pairs,
        "simhash_neardup": q_simhash_neardup,
        "dedup_cluster": q_dedup_cluster,
        "decontaminate": q_decontaminate,
        "bloom_dedup": q_bloom_dedup,
        "topk_words": q_topk_words,
        "semdedup_assign": q_semdedup_assign,
        "asof_join": q_asof_join,
        "convert_eqdelete": q_convert_eqdelete,
        "streaming_buffered": q_streaming_buffered,
        "select_misc": q_select_misc,
        # --- r13 fills biased to this round's touched paths (iceberg
        #     eq-delete/DML + pane streaming + windowed agg)
        "iceberg_legacy_migrate": q_iceberg_legacy_migrate,
        "iceberg_merge_cow": q_iceberg_merge_cow,
        "iceberg_update": q_iceberg_update,
        "iceberg_delete": q_iceberg_delete,
        "streaming_panes": q_streaming_panes,
        "nullif_bound": q_nullif_bound,
        "create_sequence": q_create_sequence,
        "delta_row_tracking": q_delta_row_tracking,
        "processing_timeseries": q_processing,
        "agg_argminmax": q_agg_argminmax,
        # --- headline pair stays in-cap every round
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        # --- past the 50-cap: ever-green r13/r14; pytest + harness
        #     guarded (the r14-fresh rows rotate out, freshest-last)
        "timestamp_combiner": q_timestamp_combiner,
        "reshuffle_roundtrip": q_reshuffle_roundtrip,
        "example_passthrough": q_example_passthrough,
        "onnx_score": q_onnx_score,
        "linear_regression": q_linear_regression,
        "deserialize_avro": q_deserialize_avro,
        "deserialize_proto": q_deserialize_proto,
        "storage_avro_roundtrip": q_storage_avro_roundtrip,
        "orc_roundtrip": q_orc_roundtrip,
        "multimodal_decode": q_multimodal_decode,
        "video_meta": q_video_meta,
        "audio_meta": q_audio_meta,
        "html_extract": q_html_extract,
        "url_normalize": q_url_normalize,
        "chunk_windows": q_chunk_windows,
        "gopher_rules": q_gopher_rules,
        "sentence_split": q_sentence_split,
        "lang_id": q_lang_id,
        "sample_split": q_sample_split,
        "scrub_pii": q_scrub_pii,
        "pack_sequences": q_pack_sequences,
        "profile_documents": q_profile_documents,
        "iceberg_row_lineage": q_iceberg_row_lineage,
        "uniform_sync": q_uniform_sync,
        "convert_roundtrip": q_convert_roundtrip,
        "convert_partitioned": q_convert_partitioned,
        "iceberg_addfiles": q_iceberg_addfiles,
        "iceberg_defaults": q_iceberg_defaults,
        "iceberg_changelog": q_iceberg_changelog,
        "iceberg_incremental": q_iceberg_incremental,
        "iceberg_skipping": q_iceberg_skipping,
        "iceberg_rest": q_iceberg_rest,
        "iceberg_merge_mor": q_iceberg_merge_mor,
        "iceberg_dv_puffin": q_iceberg_dv_puffin,
        "iceberg_cdc_upsert": q_iceberg_cdc_upsert,
        "iceberg_upsert": q_iceberg_upsert,
        "warc_roundtrip": q_warc_roundtrip,
        "window_running": q_window_running,
        "window_time_range": q_window_time_range,
        "calendar_window": q_calendar_window,
        "tumbling_window": q_tumbling_window,
        "sliding_window": q_sliding_window,
        "session_window": q_session_window,
        "bpe_train_encode": q_bpe_train_encode,
        "select_text_hash": q_select_text_hash,
        "compare_diff": q_compare_diff,
        "limit_topk": q_limit_topk,
        "expression_math": q_expression_math,
        "localdb_artifact": q_localdb_artifact,
        "auxia_events": q_auxia_events,
        "delta_type_widening": q_delta_type_widening,
        "delta_delete": q_delta_delete,
        "delta_skipping": q_delta_skipping,
        "sessionize": q_sessionize,
        "range_join": q_range_join,
        "semdedup_prune": q_semdedup_prune,
        "repetition": q_repetition,
        "perplexity_filter": q_perplexity_filter,
        "dataset_mix": q_dataset_mix,
        "delta_roundtrip": q_delta_roundtrip,
        "delta_update": q_delta_update,
        "dsir_scores": q_dsir_scores,
        "bpe_wordcounts": q_bpe_wordcounts,
        "delta_dv_read": q_delta_dv_read,
        "delta_zorder": q_delta_zorder,
        "iceberg_rewrite_manifests": q_iceberg_rewrite_manifests,
        "delta_cm_roundtrip": q_delta_cm_roundtrip,
        "delta_alter_roundtrip": q_delta_alter_roundtrip,
        "delta_replace_where": q_delta_replace_where,
        "delta_liquid_cluster": q_delta_liquid_cluster,
        "agg_firstlast": q_agg_firstlast,
        "partition_route": q_partition_route,
        "union_pad": q_union_pad,
        "substring_cut": q_substring_cut,
        "shuffle_order": q_shuffle_order,
        "quality_classifier": q_quality_classifier,
        "uniform_stream": q_uniform_stream,
        "iceberg_roundtrip": q_iceberg_roundtrip,
        "iceberg_mor_roundtrip": q_iceberg_mor_roundtrip,
        "iceberg_evolved_mor": q_iceberg_evolved_mor,
        "iceberg_partitioned": q_iceberg_partitioned,
        "iceberg_row_lineage_inherited": q_iceberg_row_lineage_inherited,
        "ivf_topk": q_ivf_topk,
        "lsh_topk": q_lsh_topk,
        "match_recognize": q_match_recognize,
        "match_recognize_chunked": q_match_recognize_chunked,
    }

def oracle_sql() -> dict[str, str]:
    return {
        "timestamp_combiner": Q_TS_COMBINER_SQL,
        "timestamp_combiner_multi": Q_TS_COMBINER_MULTI_SQL,
        "reshuffle_roundtrip": Q_RESHUFFLE_SQL,
        "example_passthrough": Q_EXAMPLE_SQL,
        "onnx_score": _onnx_score_oracle_sql(),
        "q1_pricing_summary": Q1_SQL,
        "q3_shipping_priority": Q3_SQL,
        "agg_argminmax": Q_ARG_SQL,
        "agg_firstlast": Q_FIRSTLAST_SQL,
        "partition_route": Q_PARTITION_SQL,
        "union_pad": Q_UNION_SQL,
        "lookup_enrich": Q_LOOKUP_SQL,
        "limit_topk": Q_LIMIT_SQL,
        "window_running": Q_RUNNING_SQL,
        "window_time_range": Q_TIMERANGE_SQL,
        "calendar_window": Q_CALENDAR_SQL,
        "tumbling_window": Q_TUMBLING_SQL,
        "sliding_window": Q_SLIDING_SQL,
        "session_window": Q_SESSION_SQL,
        "expression_math": Q_EXPR_SQL,
        "select_text_hash": Q_TEXT_SQL,
        "compare_diff": Q_COMPARE_SQL,
        "agg_collect": Q_AGG_COLLECT_SQL,
        "select_misc": Q_SELECT_MISC_SQL,
        "nullif_bound": Q_NULLIF_BOUND_SQL,
        "iceberg_legacy_migrate": Q_ICE_LEGACY_SQL,
        "create_sequence": Q_CREATE_SEQ_SQL,
        "agg_stats": Q_AGG_STATS_SQL,
        "multi_input_agg": Q_MULTI_AGG_SQL,
        "rollup_agg": Q_ROLLUP_SQL,
        "pivot_agg": Q_PIVOT_SQL,
        "sql_mdt_udfs": Q_MDT_SQL,
        "tokenize_unnest": Q_TOKENIZE_SQL,
        "dedup_exact": Q_DEDUP_EXACT_SQL,
        "textstats": Q_TEXTSTATS_SQL,
        "ngram_jaccard": Q_JACCARD_SQL,
        "similarity_bruteforce": Q_SIM_SQL,
        "embedding_neardup": Q_NEARDUP_SQL,
        # the bucketed path is deterministic (seeded hyperplanes) and at
        # full recall on this corpus — held to the same exact-pair oracle
        "embedding_neardup_bucketed": Q_NEARDUP_SQL,
        "multimodal_meta": Q_MULTIMODAL_SQL,
        "image_codec_roundtrip": Q_IMAGE_CODEC_SQL,
        "audio_roundtrip": Q_AUDIO_SQL,
        # LSH candidate generators + exact verify: output IS the exact
        # near-dup pair set, so all three share the from-scratch oracle
        "minhash_pairs": Q_JACCARD_SQL,
        "simhash_neardup": Q_JACCARD_SQL,
        # transitive closure of the same exact pair set, recomputed with a
        # recursive CTE — checks the distributed CC loop label-for-label
        "dedup_cluster": Q_CLUSTER_SQL,
        "decontaminate": Q_DECON_SQL,
        "bloom_dedup": Q_BLOOM_DEDUP_SQL,
        "topk_words": Q_TOPK_SQL,
        "semdedup_assign": Q_SEMDEDUP_ASSIGN_SQL,
        "bpe_wordcounts": Q_BPE_WORDCOUNTS_SQL,
        "warc_roundtrip": Q_WARC_RT_SQL,
        "profile_documents": Q_PROFILE_SQL,
        "delta_dv_read": Q_DELTA_DV_SQL,
        "iceberg_rest": Q_ICEBERG_REST_SQL,
        "delta_cdf": Q_DELTA_CDF_SQL,
        "delta_cm_roundtrip": Q_DELTA_CM_SQL,
        "delta_alter_roundtrip": Q_DELTA_ALTER_SQL,
        "delta_zorder": Q_DELTA_ZORDER_SQL,
        "delta_replace_where": Q_DELTA_RW_SQL,
        "iceberg_incremental": Q_ICEBERG_INC_SQL,
        "asof_join": Q_ASOF_SQL,
        "sessionize": Q_SESSIONIZE_SQL,
        "range_join": Q_RANGE_JOIN_SQL,
        "semdedup_prune": Q_SEMDEDUP_PRUNE_SQL,
        "repetition": Q_REPETITION_SQL,
        "substring_cut": Q_SUBSTRING_CUT_SQL,
        "shuffle_order": Q_SHUFFLE_SQL,
        "quality_classifier": Q_CLASSIFIER_SQL,
        # seeded SRP-LSH at these params reaches recall 1 on this corpus →
        # held to the same exact brute-force top-k oracle
        "lsh_topk": Q_SIM_SQL,
        # nprobe=cells → exhaustive IVF, exact oracle applies
        "ivf_topk": Q_SIM_SQL,
        "lang_id": _lang_id_oracle_sql(),
        "sample_split": Q_SAMPLE_SQL,
        "scrub_pii": Q_SCRUB_SQL,
        "pack_sequences": Q_PACK_SQL,
        "match_recognize": Q_MATCHREC_SQL,
        "processing_timeseries": Q_PROCESSING_SQL,
        "deserialize_avro": Q_DESER_AVRO_SQL,
        "deserialize_proto": Q_DESER_PROTO_SQL,
        "match_recognize_chunked": Q_MATCHREC_CHUNKED_SQL,
        "multimodal_decode": Q_MULTIMODAL_DECODE_SQL,
        "storage_avro_roundtrip": Q_STORAGE_AVRO_SQL,
        "orc_roundtrip": Q_ORC_SQL,
        "iceberg_roundtrip": Q_ICEBERG_SQL,
        "iceberg_partitioned": Q_ICEBERG_PART_SQL,
        "iceberg_branch_wap": Q_ICEBERG_WAP_SQL,
        "iceberg_evolved_mor": Q_ICEBERG_EVMOR_SQL,
        "iceberg_cdc_upsert": Q_ICEBERG_CDC_SQL,
        "streaming_panes": Q_STREAM_PANES_SQL,
        "iceberg_spec_evolution": Q_ICE_SPECEV_SQL,
        "iceberg_rewrite_manifests": Q_ICE_RWM_SQL,
        "delta_v2_checkpoint": Q_DELTA_V2CP_SQL,
        "delta_liquid_cluster": Q_DELTA_LIQUID_SQL,
        "delta_merge_upsert": Q_DELTA_MERGE_SQL,
        "iceberg_upsert": Q_ICE_UPSERT_SQL,
        "iceberg_merge_cow": Q_ICE_MERGE_COW_SQL,
        "iceberg_merge_mor": Q_ICE_MERGE_MOR_SQL,
        "iceberg_dv_puffin": Q_ICE_DV_PUFFIN_SQL,
        "iceberg_update": Q_ICE_UPDATE_SQL,
        "iceberg_changelog": Q_ICE_CHANGELOG_SQL,
        "pq_topk": Q_PQ_TOPK_SQL,
        "ivfpq_topk": Q_IVFPQ_TOPK_SQL,
        "convert_roundtrip": Q_CONVERT_RT_SQL,
        "convert_partitioned": Q_CONVERT_PART_SQL,
        "convert_eqdelete": Q_CONVERT_EQ_SQL,
        "iceberg_defaults": Q_ICE_DFLT_SQL,
        "delta_type_widening": Q_DELTA_TW_SQL,
        "delta_row_tracking": Q_DELTA_RT_SQL,
        "iceberg_row_lineage": Q_ICE_LINEAGE_SQL,
        "iceberg_row_lineage_inherited": Q_ICE_LINEAGE_INH_SQL,
        "uniform_stream": Q_UNIFORM_STREAM_SQL,
        "uniform_resync": Q_UNIFORM_RESYNC_SQL,
        "bpe_train_encode": Q_BPE_ENCODE_SQL,
        "streaming_buffered": Q_STREAM_BUF_SQL,
        "uniform_sync": Q_UNIFORM_SQL,
        "iceberg_addfiles": Q_ADDFILES_SQL,
        "localdb_artifact": Q_LOCALDB_SQL,
        "auxia_events": Q_AUXIA_SQL,
        "iceberg_mor_roundtrip": Q_ICEBERG_MOR_SQL,
        "bucketed_join": Q_BUCKETED_JOIN_SQL,
        "gopher_rules": Q_GOPHER_SQL,
        "sentence_split": Q_SENTENCE_SQL,
        "video_meta": Q_VIDEO_META_SQL,
        "audio_meta": Q_AUDIO_META_SQL,
        "html_extract": Q_HTML_EXTRACT_SQL,
        "url_normalize": Q_URL_NORMALIZE_SQL,
        "chunk_windows": Q_CHUNK_SQL,
        "linear_regression": Q_LINREG_SQL,
        "perplexity_filter": Q_PERPLEXITY_SQL,
        "dataset_mix": Q_DATASET_MIX_SQL,
        "delta_roundtrip": Q_DELTA_SQL,
        "delta_skipping": Q_DELTA_SKIP_SQL,
        "delta_delete": Q_DELTA_DELETE_SQL,
        "delta_update": Q_DELTA_UPDATE_SQL,
        "iceberg_delete": Q_ICE_DELETE_SQL,
        "iceberg_skipping": Q_ICE_SKIP_SQL,
        "dsir_scores": Q_DSIR_SQL,
    }
