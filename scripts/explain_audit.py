"""Plan-quality audit: assert the physical plans we rely on at scale.

Checks (against sf0.01):
  * q1: filter pushed into the parquet scan + pruned ReadSchema
  * lookup: BroadcastHashJoin (never a shuffle join for view-sized sides)
  * q3: joins broadcast under threshold, filters pushed to all three scans
  * textstats: zero Python in the plan (pure Column, codegen)
  * keyless limit: TakeOrderedAndProject, no single-partition WindowExec
  * exact dedup: partial/final HashAggregate (map-side combine), no window
  * minhash: exactly the planned shuffles, no cartesian/BNL join
  * ngram jaccard: bucket-local pairs — no SortMergeJoin of exploded grams
  * rangejoin: binned equi-join, never nested-loop/cartesian
  * asof: union+window shape — one keyed exchange, zero join operators
  * profile: single pure-JVM aggregation + 1-row explode

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

    # r13: bound-output select chain (nullif/switch over a computed
    # expression) must stay pure Column AND prune the scan to the
    # referenced columns — sequential binding compiles to expressions,
    # never a materialization barrier that widens the read
    p_nb = plan_of(entrymod.q_nullif_bound(spark, sf))
    if "EvalPython" in p_nb or "MapInPandas" in p_nb:
        failures.append("nullif_bound: Python in the plan")
    if "p_name" in p_nb or "p_type" in p_nb:
        failures.append("nullif_bound: unreferenced columns not pruned")

    p4 = plan_of(entrymod.q_textstats(spark, sf))
    if "EvalPython" in p4 or "MapInPandas" in p4:
        # (codegen span markers are hidden under AdaptiveSparkPlan until
        # execution, so no-Python is the assertable property here)
        failures.append("textstats: Python in the plan — must stay pure Column")

    from pipeline_spark.operators.limit import apply_limit
    from pyspark.sql import functions as F

    lim = apply_limit(
        spark.read.parquet(f"{sf}/orders.parquet"),
        {"count": 7, "orderFields": ["o_totalprice"]},
        [],
        None,
        descending=True,
    )
    p5 = plan_of(lim)
    if "TakeOrderedAndProject" not in p5:
        failures.append("keyless limit: expected TakeOrderedAndProject")
    if "Window" in p5:
        failures.append("keyless limit: single-partition WindowExec present")

    p6 = plan_of(entrymod.q_dedup_exact(spark, sf))
    if "Window" in p6:
        failures.append("exact dedup: window present — should be min_by partial agg")
    if p6.count("HashAggregate") < 2:
        failures.append("exact dedup: expected partial+final HashAggregate")

    p7 = plan_of(entrymod.q_minhash_pairs(spark, sf))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in p7:
            failures.append(f"minhash: {bad} in plan — candidate gen must be bucket-local")

    p8 = plan_of(entrymod.q_ngram_jaccard(spark, sf))
    if "SortMergeJoin" in p8 and "ds" in p8:
        # the pair path must come from bucket-local enumeration, not an
        # exploded-grams self-join; SMJs here only join tiny sizes tables
        smj_section = p8.split("SortMergeJoin", 1)[1][:400]
        if "g#" in smj_section:
            failures.append("ngram: self-join on gram hash — use bucket-local pairs")

    p9 = plan_of(entrymod.q_decontaminate(spark, sf))
    if "BroadcastHashJoin" not in p9:
        failures.append("decontaminate: benchmark gram join must broadcast")
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in p9:
            failures.append(f"decontaminate: {bad} in plan")

    p10 = plan_of(entrymod.q_repetition(spark, sf))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in p10:
            failures.append(f"repetition: {bad} in plan")
    if "InMemoryTableScan" not in p10:
        failures.append("repetition: exploded gram cache missing — tokenize re-runs per consumer")

    p11 = plan_of(entrymod.q_shuffle_order(spark, sf))
    if "rangepartitioning" not in p11.lower():
        failures.append("shuffle: expected a range exchange on the hash key")
    if "GlobalLimit" in p11 or "CollectLimit" in p11:
        failures.append("shuffle: unexpected limit/collect in plan")

    p12 = plan_of(entrymod.q_match_recognize(spark, sf))
    if "__mr_mask_" not in p12 or "Window" not in p12:
        failures.append("matchRecognize: row-local DEFINE masks not computed JVM-side")
    if p12.count("Exchange") > 2:
        failures.append("matchRecognize: more than window+group exchanges in plan")

    p13 = plan_of(entrymod.q_processing(spark, sf))
    if "EvalPython" in p13 or "MapInPandas" in p13 or "FlatMapGroupsInPandas" in p13:
        failures.append("processing: Python in the plan — stages must stay Window exprs")
    if "Window" not in p13:
        failures.append("processing: expected WindowExec for history steps")

    # chunked matchRecognize (r15 shape): ONE spillable window sort
    # computes the sequence numbers, a single when/array/explode assigns
    # each row its 1-2 owning chunks (the pre-r15 carry-over Union
    # re-evaluated the whole window subtree twice), then the per-chunk
    # grouped apply — exactly 2 exchanges: the seq window + the
    # width-pinned (key, chunk) grouping shuffle.
    p14 = plan_of(entrymod.q_match_recognize_chunked(spark, sf))
    if "Union" in p14:
        failures.append(
            "matchrec chunked: carry-over Union is back — the window "
            "subtree would evaluate once per branch (r15 regression)"
        )
    if "Generate" not in p14:
        failures.append(
            "matchrec chunked: expected the explode chunk fan-out (Generate)"
        )
    if "MapInPandas" not in p14:
        failures.append(
            "matchrec chunked: expected the grouped-apply MapInPandas substrate"
        )
    import re as _re

    # formatted explain lists each node in the tree AND the details
    # section, so 2 physical shuffle exchanges == 4 matches; \bExchange\b
    # does not match Reused/BroadcastExchange
    n_exchanges = len(_re.findall(r"\bExchange\b", p14))
    if n_exchanges > 4:
        failures.append(
            f"matchrec chunked: {n_exchanges // 2} exchange nodes — "
            "expected ≤2 (seq window + chunk grouping)"
        )
    if n_exchanges == 0:
        failures.append("matchrec chunked: exchange counter matched nothing — audit broken")
    # r15 column pruning: the Python stage must not carry unread input
    # columns (the query reads l_quantity; l_extendedprice is order-only
    # and must be pruned before the MapInPandas boundary)
    mip = p14[p14.find("MapInPandas"):]
    arg_line = mip.split("Arguments:", 1)[-1].split("\n", 1)[0] if "Arguments:" in mip else ""
    if "l_extendedprice" in arg_line:
        failures.append(
            "matchrec chunked: unread column l_extendedprice crosses the "
            "Python boundary — §4.1 pruning regressed"
        )

    # native avro read: binaryFile scan feeding the per-file decode —
    # and nothing else Python-side in the plan
    import tempfile, os
    avro_dir = os.path.join(tempfile.gettempdir(), "audit_avro")
    entrymod.run_pipeline(spark, entrymod.parse_config(f"""
sources:
  - name: r
    module: storage
    parameters: {{format: parquet, input: {sf}/region.parquet}}
sinks:
  - name: w
    module: storage
    inputs: [r]
    parameters: {{format: avro, output: {avro_dir}}}
"""))
    p15 = plan_of(entrymod.run_pipeline(spark, entrymod.parse_config(f"""
sources:
  - name: back
    module: storage
    parameters: {{format: avro, input: {avro_dir}}}
"""))["back"])
    if "binaryFile" not in p15 and "BinaryFile" not in p15:
        failures.append("avro native: expected binaryFile scan in plan")
    if "MapInPandas" not in p15:
        failures.append("avro native: expected per-file MapInPandas decode")

    # range join: binning must restore a hash/merge equi-join — a BETWEEN
    # theta-join would plan BroadcastNestedLoopJoin (quadratic work)
    p16 = plan_of(entrymod.q_range_join(spark, sf))
    if "NestedLoop" in p16 or "Cartesian" in p16:
        failures.append("rangejoin: binning failed — nested-loop/cartesian join")
    if not any(j in p16 for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")):
        failures.append("rangejoin: expected an equi-join operator")

    # as-of join: one keyed window carry, never a join operator at all
    p17 = plan_of(entrymod.q_asof_join(spark, sf))
    if "Join" in p17:
        failures.append("asof: expected the union+window shape, found a join")
    if "Window" not in p17:
        failures.append("asof: expected a Window carry")
    if "hashpartitioning(user_id" not in p17:
        failures.append("asof: expected ONE exchange keyed on user_id")

    # profile: the whole profile is a single aggregation over one scan
    p18 = plan_of(entrymod.q_profile_documents(spark, sf))
    if "Generate" not in p18 and "explode" not in p18:
        failures.append("profile: expected the 1-row explode")
    if "PythonUDF" in p18 or "MapInPandas" in p18:
        failures.append("profile: expected a pure-JVM aggregate plan")

    # DV merge-on-read: deleted positions arrive as a (file, row-index)
    # frame and anti-join the scan — an equi-join, never nested-loop;
    # the bitmap decode itself is an executor-side RDD map
    p19 = plan_of(entrymod.q_delta_dv_read(spark, sf))
    if "NestedLoop" in p19 or "Cartesian" in p19:
        failures.append("delta dv: anti-join planned as nested-loop/cartesian")
    if "Anti" not in p19:
        failures.append("delta dv: expected a left-anti join against the DV frame")

    # REST-cataloged iceberg read: once the catalog hands over metadata,
    # the plan is the same pruned parquet scan + partial/final aggregate
    # as a filesystem table — no Python anywhere
    p20 = plan_of(entrymod.q_iceberg_rest(spark, sf))
    if p20.count("HashAggregate") < 2:
        failures.append("iceberg rest: expected partial+final HashAggregate")
    if "EvalPython" in p20 or "MapInPandas" in p20:
        failures.append("iceberg rest: Python in the plan")

    # iceberg v3 puffin DVs (r8): decoded positions anti-join the scan as
    # an equi-join, exactly like the delta DV path — never nested-loop
    p21 = plan_of(entrymod.q_iceberg_dv_puffin(spark, sf))
    if "NestedLoop" in p21 or "Cartesian" in p21:
        failures.append("iceberg puffin dv: anti-join planned as nested-loop")
    if "Anti" not in p21:
        failures.append("iceberg puffin dv: expected a left-anti position join")

    # timestampCombiner (r14): the hidden earliest/latest min/max rides
    # the SAME partial/final hash aggregate as the user aggregates — no
    # extra exchange, no Python; each of the three unioned stages is
    # two windowed aggregations = 4 HashAggregate pairs max per branch
    p23 = plan_of(entrymod.q_timestamp_combiner(spark, sf))
    if "HashAggregate" not in p23:
        failures.append("timestamp_combiner: expected HashAggregate")
    if "BatchEvalPython" in p23 or "ArrowEvalPython" in p23:
        failures.append("timestamp_combiner: Python in the plan")
    import re as _re

    n_exch = len(_re.findall(r"\(\d+\) Exchange", p23))
    # 3 union branches x 2 aggregation stages x 1 keyed exchange each =
    # 6 exchange NODES.  The regex matches the details-section header
    # "(N) Exchange" (once per node); the tree section prints
    # "Exchange (N)" with the number AFTER, which the regex does not
    # match — so this counts physical nodes, not print occurrences.
    # More than 6 would mean the hidden combiner aggregate added its
    # own shuffle
    if n_exch > 6:
        failures.append(
            f"timestamp_combiner: {n_exch} exchange nodes — hidden "
            "combiner aggregate must not add a shuffle (expected 6)"
        )

    # executor pane backend (r15, VERDICT r14 stretch #7): the fused
    # windowed-aggregation + pane-ledger operator's STREAMING physical
    # plan — exactly ONE FlatMapGroupsInPandasWithState (aggregation
    # and trigger ledger fused, state executor-side) and no exchange
    # beyond the single keyed one the stateful operator requires.  A
    # second exchange would mean the fusion regressed to aggregate +
    # re-shuffle; a second stateful operator would mean double-ledger.
    from pipeline_spark.streaming.panes import stream_panes_with_state

    _pane_src = (
        spark.readStream.format("rate").option("rowsPerSecond", "1")
        .load()
        .selectExpr(
            "timestamp as ts", "CAST(value % 3 AS STRING) as k",
            "CAST(value AS DOUBLE) as v",
        )
        .withWatermark("ts", "10 seconds")
    )
    p_pane = plan_of(stream_panes_with_state(
        _pane_src, "ts", ["k"],
        [{"name": "n", "op": "count"},
         {"name": "s", "op": "sum", "field": "v"}],
        {"window": {"type": "fixed", "size": 60, "unit": "second"},
         "trigger": {"type": "afterWatermark",
                     "earlyFiringTrigger": {
                         "type": "afterProcessingTime", "delay": 1}}},
    ))
    import re as _re2

    n_state = len(_re2.findall(
        r"\(\d+\) FlatMapGroupsInPandasWithState", p_pane
    ))
    if n_state != 1:
        failures.append(
            f"executor panes: {n_state} FlatMapGroupsInPandasWithState "
            "nodes — aggregation and pane ledger must fuse into ONE"
        )
    n_pane_exch = len(_re2.findall(r"\(\d+\) Exchange", p_pane))
    if n_pane_exch > 1:
        failures.append(
            f"executor panes: {n_pane_exch} exchange nodes — only the "
            "stateful operator's keyed exchange is allowed"
        )

    # iceberg changelog (r8): change derivation is unions of pruned scans
    # + semi-joins — no nested-loop anywhere
    p22 = plan_of(entrymod.q_iceberg_changelog(spark, sf))
    if "NestedLoop" in p22 or "Cartesian" in p22:
        failures.append("iceberg changelog: nested-loop/cartesian in plan")
    if "Union" not in p22:
        failures.append("iceberg changelog: expected the per-snapshot union")

    # iceberg changelog BOUNDED read (r9, VERDICT r8 ask #7): an
    # incremental read of one appended file must scan ONLY that file —
    # never the table's untouched bulk.  Built on a throwaway 7-file
    # table so the plan's scan locations are assertable by path.
    import json as _json
    import shutil as _shutil
    import tempfile as _tempfile

    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import (
        find_table_metadata,
        plan_files,
        read_iceberg_changelog,
    )

    cl_tbl = _tempfile.mkdtemp(prefix="audit_cl_")
    _shutil.rmtree(cl_tbl, ignore_errors=True)
    for i in range(6):
        write_iceberg_native(
            spark.createDataFrame(
                [(i * 10 + j, f"v{j}") for j in range(10)],
                "id long, v string",
            ).coalesce(1),
            {"path": cl_tbl, "mode": "append" if i else "create"},
        )
    before = _json.load(
        open(find_table_metadata(cl_tbl)))["current-snapshot-id"]
    write_iceberg_native(
        spark.createDataFrame(
            [(100 + j, "new") for j in range(5)], "id long, v string"
        ).coalesce(1),
        {"path": cl_tbl, "mode": "append"},
    )
    data, _dels, _m = plan_files(cl_tbl)
    p23 = plan_of(read_iceberg_changelog(
        spark, {"path": cl_tbl, "fromSnapshotId": before}))
    import os as _os

    names = {_os.path.basename(d["path"]) for d in data}
    scanned = {n for n in names if n in p23}
    if len(scanned) != 1:
        failures.append(
            "iceberg changelog: incremental read must scan ONLY the "
            f"changed file — plan references {len(scanned)}/{len(names)} "
            "data files"
        )
    _shutil.rmtree(cl_tbl, ignore_errors=True)

    # identity-partition fill (r10): the per-file value map must ride a
    # BROADCAST join (O(files) tiny rows) — a shuffled join here would
    # move the whole scan for metadata
    import tempfile as _tf

    from pipeline_spark.sinks.delta_native import write_delta_native
    from pipeline_spark.sinks.tableconvert import convert_delta_to_iceberg
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    fill_tbl = _os.path.join(_tf.gettempdir(), "audit_fill_tbl")
    _shutil.rmtree(fill_tbl, ignore_errors=True)
    write_delta_native(
        spark,
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .where(F.col("doc_id") < 300),
        {"path": fill_tbl, "partitionBy": ["lang"]},
    )
    convert_delta_to_iceberg(spark, {"path": fill_tbl})
    p24 = plan_of(read_iceberg_native(spark, {"path": fill_tbl}))
    if "BroadcastHashJoin" not in p24:
        failures.append("identity fill: expected a BROADCAST value join")
    if "SortMergeJoin" in p24:
        failures.append("identity fill: SortMergeJoin — the fill map shuffled")
    _shutil.rmtree(fill_tbl, ignore_errors=True)

    # v3 row lineage (r10): withRowIds derives ids off a BROADCAST of
    # per-file bases, never a shuffle
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native

    lin_tbl = _os.path.join(_tf.gettempdir(), "audit_lineage_tbl")
    _shutil.rmtree(lin_tbl, ignore_errors=True)
    write_iceberg_native(
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "lang").where(F.col("doc_id") < 300),
        {"path": lin_tbl, "mode": "create",
         "properties": {"format-version": "3"}},
    )
    p25 = plan_of(read_iceberg_native(
        spark, {"path": lin_tbl, "withRowIds": True}))
    if "BroadcastHashJoin" not in p25:
        failures.append("row lineage: expected a BROADCAST base join")
    if "SortMergeJoin" in p25:
        failures.append("row lineage: SortMergeJoin — the base map shuffled")
    _shutil.rmtree(lin_tbl, ignore_errors=True)

    # UniForm O(batch) incremental append (r11, VERDICT r10 ask #6): a
    # blind append on a synced table must (a) take the INCREMENTAL path
    # (sync_uniform_append returns True), (b) add exactly ONE new
    # manifest with every pre-existing manifest left in place, and
    # (c) read ZERO parquet footers — bounds come from add.stats, the
    # stats_source="log" contract (sinks/tableconvert.py
    # sync_uniform_iceberg docstring; delta_native._maybe_uniform_sync).
    import pipeline_spark.sinks.tableconvert as _tc

    ut = _os.path.join(_tf.gettempdir(), "audit_uniform_tbl")
    _shutil.rmtree(ut, ignore_errors=True)
    docs_small = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
    )
    write_delta_native(spark, docs_small.where(F.col("doc_id") < 300), {
        "path": ut,
        "properties": {"delta.universalFormat.enabledFormats": "iceberg"},
    })

    def _manifests():
        mdir = _os.path.join(ut, "metadata")
        return {
            n: _os.path.getsize(_os.path.join(mdir, n))
            for n in _os.listdir(mdir)
            if n.endswith(".avro") and not n.startswith("snap-")
        }

    before_m = _manifests()
    probe = {"incremental": None, "footer_reads": 0}
    orig_append = _tc.sync_uniform_append

    def probe_append(table, adds, version=None):
        import pyarrow.parquet as _pq

        orig_pf, orig_rm, orig_rt = (
            _pq.ParquetFile, _pq.read_metadata, _pq.read_table,
        )

        def _count(fn):
            def wrapped(*a, **k):
                probe["footer_reads"] += 1
                return fn(*a, **k)
            return wrapped

        _pq.ParquetFile = _count(orig_pf)
        _pq.read_metadata = _count(orig_rm)
        _pq.read_table = _count(orig_rt)
        try:
            ok = orig_append(table, adds, version)
        finally:
            _pq.ParquetFile, _pq.read_metadata, _pq.read_table = (
                orig_pf, orig_rm, orig_rt,
            )
        probe["incremental"] = ok
        return ok

    _tc.sync_uniform_append = probe_append
    try:
        write_delta_native(
            spark,
            docs_small.where(
                (F.col("doc_id") >= 300) & (F.col("doc_id") < 400)
            ).coalesce(1),
            {"path": ut, "mode": "append"},
        )
    finally:
        _tc.sync_uniform_append = orig_append
    after_m = _manifests()
    if probe["incremental"] is not True:
        failures.append(
            "uniform append: incremental sync path not taken "
            f"(returned {probe['incremental']})"
        )
    if probe["footer_reads"] != 0:
        failures.append(
            f"uniform append: {probe['footer_reads']} parquet footer "
            "reads during sync — stats must come from add.stats (log)"
        )
    new_m = set(after_m) - set(before_m)
    kept = all(after_m.get(n) == s for n, s in before_m.items())
    if len(new_m) != 1 or not kept:
        failures.append(
            f"uniform append: expected exactly 1 new manifest with old "
            f"ones untouched (new={len(new_m)}, kept={kept})"
        )
    _shutil.rmtree(ut, ignore_errors=True)

    # r15: mixed exact-distinct + object-buffer aggregation must split —
    # the unsplit plan drags the percentile value map through a
    # per-distinct-value (returnflag, partkey) pre-aggregation and two
    # exchanges of object buffers (2.7 s vs 0.4 s on the bench row).
    # Signature of the regression: a node whose detail block lists a
    # percentile function grouped by BOTH the group key and the distinct
    # column.
    p15 = plan_of(entrymod.q_agg_stats(spark, sf))
    for block in p15.split("\n\n"):
        if ("percentile" in block and "Keys [2]" in block
                and "l_partkey" in block):
            failures.append(
                "agg_stats: percentile buffers grouped by the distinct "
                "column — the r15 distinct-split regressed"
            )
            break
    if "BroadcastHashJoin" not in p15 and "SortMergeJoin" not in p15:
        failures.append(
            "agg_stats: no recombine join — the distinct-split did not fire"
        )

    # r15: ANN candidate dedup runs AFTER scoring, on scalars — a
    # SortAggregate in these plans means array buffers are riding the
    # dedup again
    for qname in ("q_lsh_topk", "q_ivfpq_topk"):
        pq = plan_of(getattr(entrymod, qname)(spark, sf))
        if "SortAggregate" in pq:
            failures.append(
                f"{qname}: SortAggregate in plan — candidate dedup is "
                "carrying array buffers again (r15 regression)"
            )

    for f in failures:
        print("FAIL", f)
    print("PLAN AUDIT:", "FAILED" if failures else "ALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
