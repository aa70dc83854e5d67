"""cProfile the BUILD phase (fn return) of bench rows (r16, VERDICT
r15 asks #3/#5): where does driver-side time go — Spark jobs (py4j
socket waits inside collect/save calls), pure-Python metadata work, or
py4j round-trip chatter (send_command call count x host RTT)?

    python scripts/profile_build.py [--runs 2] [--top 25] name...

Runs on the bench's session shape so numbers are comparable to
bench.py's plan_build_sec.
"""

from __future__ import annotations

import argparse
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--exec", dest="do_exec", action="store_true",
                    help="also profile the noop-write execute phase")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_build")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "x long").selectExpr("x").write.mode(
        "overwrite").format("noop").save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long").write.mode("overwrite").format(
        "noop").save()

    queries = entrymod.queries()
    for name in args.names:
        fn = queries[name]
        # warm runs so JIT/codegen/worker-spawn don't pollute attribution
        for _ in range(max(args.runs - 1, 1)):
            df = fn(spark, sf_dir)
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        df = fn(spark, sf_dir)
        pr.disable()
        build = time.time() - t0
        t1 = time.time()
        df.write.mode("overwrite").format("noop").save()
        ex = time.time() - t1
        print(f"\n===== {name}: build={build:.3f}s exec={ex:.3f}s =====")
        st = pstats.Stats(pr)
        # py4j round-trip count: every send_command is one driver->JVM
        # socket round trip; at this host's ~1-2 ms RTT the count alone
        # can be the row's whole build time
        total_rt = 0
        for (f, ln, fname), (cc, nc, tt, ct, callers) in st.stats.items():
            if fname == "send_command" and "java_gateway" in f:
                total_rt += nc
        print(f"py4j send_command calls: {total_rt}")
        st.sort_stats("cumulative")
        st.print_stats(args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
