"""Plan-quality audit: assert the physical plans we rely on at scale.

Checks (against sf0.01):
  * q1: filter pushed into the parquet scan + pruned ReadSchema
  * lookup: BroadcastHashJoin (never a shuffle join for view-sized sides)
  * q3: joins broadcast under threshold, filters pushed to all three scans

Run: python scripts/explain_audit.py
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as entrymod


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    failures = []

    p1 = plan_of(entrymod.q1_pricing_summary(spark, sf))
    if "LessThanOrEqual(l_shipdate" not in p1:
        failures.append("q1: shipdate filter NOT pushed to parquet scan")
    if "l_tax" in p1 or "l_comment" in p1:
        failures.append("q1: unused columns not pruned from scan")

    p2 = plan_of(entrymod.q_lookup_enrich(spark, sf))
    if "BroadcastHashJoin" not in p2:
        failures.append("lookup: expected BroadcastHashJoin")

    p3 = plan_of(entrymod.q3_shipping_priority(spark, sf))
    if p3.count("BroadcastHashJoin") < 2:
        failures.append("q3: expected 2 broadcast joins at this scale")
    if "EqualTo(c_mktsegment,BUILDING)" not in p3:
        failures.append("q3: segment filter not pushed through the join")

    for f in failures:
        print("FAIL", f)
    print("PLAN AUDIT:", "FAILED" if failures else "ALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
