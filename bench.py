"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query materializes fully via the noop sink (forces execution of the
whole plan without measuring result-transfer or disk-write overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import __spark_entry__ as entrymod

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "agg_argminmax",
    "agg_firstlast",
    "partition_route",
    "union_pad",
    "lookup_enrich",
    "limit_topk",
    "window_running",
    "window_time_range",
    "calendar_window",
    "tumbling_window",
    "sliding_window",
    "session_window",
    "expression_math",
    "select_text_hash",
    "compare_diff",
    "agg_collect",
    "select_misc",
    "create_sequence",
    "agg_stats",
    "multi_input_agg",
    "sql_mdt_udfs",
    "tokenize_unnest",
    "dedup_exact",
    "textstats",
    "ngram_jaccard",
    "similarity_bruteforce",
    "embedding_neardup",
    "embedding_neardup_bucketed",
    "multimodal_meta",
    "minhash_pairs",
    "simhash_neardup",
    "dedup_cluster",
    "decontaminate",
    "repetition",
    "shuffle_order",
    "quality_classifier",
    "lsh_topk",
    "ivf_topk",
    "lang_id",
    "sample_split",
    "scrub_pii",
    "pack_sequences",
    "match_recognize",
    "processing_timeseries",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pipeline_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # many distinct codegen'd plans in one JVM exhaust the default
        # 240m JIT code cache -> interpreter fallback -> 5-10x slowdowns
        # late in the run
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()

    # warm up the JVM (parquet reader, codegen, python worker pool) so
    # per-query timings measure the queries, not session startup
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "x long").selectExpr("x").write.mode(
        "overwrite"
    ).format("noop").save()

    # min of 2 runs per query: this host is multi-tenant and CPU-steal
    # spikes inflate single runs 3-10x; the min reflects the engine.
    # A soft wall-clock budget degrades to single runs (and then to
    # recording what we have) so the JSON line always lands.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    bench_start = time.time()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        best = None
        for attempt in range(runs):
            if attempt > 0 and (time.time() - bench_start) > budget * 0.6:
                break  # skip re-runs when the budget is running out
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
            if elapsed < 0.5:
                break  # fast enough; a re-run can't change the story
        timings[name] = round(best, 3)
        if (time.time() - bench_start) > budget:
            break  # record what we have rather than losing the line

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "pipeline_spark headline queries wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
