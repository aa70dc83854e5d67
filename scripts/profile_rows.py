"""Per-row phase profiler for the optimization rounds (guide §1).

For each named bench query: time plan BUILD (fn return) and EXECUTE
(noop write) separately, min-of-N, and optionally dump
.explain("formatted") to plans/<round>/<name>_<tag>.txt.

    python scripts/profile_rows.py [--plans r15 --tag before] [--runs 3] name...

Runs on the bench's own session shape (local[$SPARK_GRAFT_CPUS],
$SPARK_GRAFT_SF_DIR) so numbers are comparable to bench.py rows.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="plans subdir (e.g. r15)")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_rows")
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
    # same warmup as bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "x long").selectExpr("x").write.mode(
        "overwrite").format("noop").save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long").write.mode("overwrite").format(
        "noop").save()

    queries = entrymod.queries()
    out: dict[str, dict] = {}
    for name in args.names:
        fn = queries[name]
        best_total = best_build = best_exec = None
        df_last = None
        for _ in range(args.runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            df_last = df
            if best_total is None or (t2 - t0) < best_total:
                best_total, best_build, best_exec = (
                    t2 - t0, t1 - t0, t2 - t1)
        out[name] = {
            "total": round(best_total, 3),
            "build": round(best_build, 3),
            "exec": round(best_exec, 3),
        }
        print(f"{name:32s} total={best_total:7.3f} build={best_build:7.3f} "
              f"exec={best_exec:7.3f}", flush=True)
        if args.plans and df_last is not None:
            pdir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", args.plans)
            os.makedirs(pdir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df_last.explain("formatted")
            with open(os.path.join(
                    pdir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
