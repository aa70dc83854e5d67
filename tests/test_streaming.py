"""Streaming pipeline tests: file-stream source → windowed agg with
watermark → memory/parquet sink; stateful streaming limit."""

import datetime as dt
import time
import shutil

import pytest

from pipeline_spark.config import parse_config
from pipeline_spark.executor import run_pipeline


@pytest.fixture()
def stream_input(spark, tmp_path):
    rows = [
        (1, "a", 1.0, dt.datetime(2024, 1, 1, 0, 0, 5)),
        (2, "a", 2.0, dt.datetime(2024, 1, 1, 0, 0, 15)),
        (3, "b", 3.0, dt.datetime(2024, 1, 1, 0, 0, 25)),
        (4, "a", 4.0, dt.datetime(2024, 1, 1, 0, 1, 5)),
        (5, "b", 5.0, dt.datetime(2024, 1, 1, 0, 1, 15)),
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double, ts timestamp")
    path = str(tmp_path / "stream_in")
    df.coalesce(1).write.parquet(path)
    return path


def test_streaming_windowed_aggregation(spark, stream_input, tmp_path):
    out_dir = str(tmp_path / "agg_out")
    cfg = parse_config(f"""
sources:
  - name: events
    module: storage
    parameters:
      format: parquet
      input: {stream_input}
      mode: streaming
transforms:
  - name: agg
    module: aggregation
    inputs: [events]
    timestampAttribute: ts
    strategy:
      window: {{type: fixed, size: 1, unit: minute}}
      allowedLateness: 5
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: n, op: count}}
        - {{name: total, op: sum, field: v}}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
""")
    outs = run_pipeline(spark, cfg)
    assert outs["agg"].isStreaming
    result = spark.read.parquet(out_dir)
    rows = {(r["k"], r["window"]["start"].minute): (r["n"], r["total"]) for r in result.collect()}
    # append-mode emits only windows closed by the watermark; minute-0
    # windows must be present and correct
    assert rows[("a", 0)] == (2, 3.0)
    assert rows[("b", 0)] == (1, 3.0)


def test_streaming_limit_per_key(spark, stream_input, tmp_path):
    out_dir = str(tmp_path / "lim_out")
    cfg = parse_config(f"""
sources:
  - name: events
    module: storage
    parameters:
      format: parquet
      input: {stream_input}
      mode: streaming
transforms:
  - name: lim
    module: limit
    inputs: [events]
    parameters:
      count: 1
      groupFields: [k]
sinks:
  - name: out
    module: storage
    inputs: [lim]
    parameters:
      format: parquet
      output: {out_dir}
""")
    run_pipeline(spark, cfg)
    result = spark.read.parquet(out_dir)
    per_key = {}
    for r in result.collect():
        per_key[r["k"]] = per_key.get(r["k"], 0) + 1
    assert per_key == {"a": 1, "b": 1}


def test_streaming_memory_sink(spark, stream_input):
    cfg = parse_config(f"""
sources:
  - name: events
    module: storage
    parameters:
      format: parquet
      input: {stream_input}
      mode: streaming
transforms:
  - name: sel
    module: select
    inputs: [events]
    parameters:
      select:
        - {{name: id}}
        - {{name: upper_k, func: hash, field: k, size: 6}}
sinks:
  - name: snap
    module: memory
    inputs: [sel]
    parameters:
      table: snap_table
""")
    run_pipeline(spark, cfg)
    rows = spark.table("snap_table").collect()
    assert len(rows) == 5
    assert all(len(r["upper_k"]) == 6 for r in rows)


def test_microbatch_incremental_with_checkpoint(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt.json")
    cfg_tpl = """
sources:
  - name: mb
    module: microbatch
    parameters:
      input: /root/testdata/sf0.001/events.parquet
      table: ev
      query: |
        SELECT event_id, ts, value FROM ev
        WHERE ts >= TIMESTAMP '__timestamp_from__' AND ts < TIMESTAMP '__timestamp_to__'
      startDatetime: "2024-01-01T00:00:00"
      endDatetime: "{end}"
      intervalSeconds: 3600
      checkpointFile: {ckpt}
      useCheckpointAsStartDatetime: true
"""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    outs = run_pipeline(
        spark, parse_config(cfg_tpl.format(end="2024-01-01T06:00:00", ckpt=ckpt))
    )
    import duckdb

    con = duckdb.connect()

    def expected(lo, hi):
        return con.execute(
            "SELECT count(*) FROM '/root/testdata/sf0.001/events.parquet' "
            f"WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}'"
        ).fetchone()[0]

    n1 = outs["mb"].count()
    assert n1 == expected("2024-01-01", "2024-01-01 06:00:00") and n1 > 0

    # second run resumes from the checkpoint watermark (06:00)
    outs2 = run_pipeline(
        spark, parse_config(cfg_tpl.format(end="2024-01-01T12:00:00", ckpt=ckpt))
    )
    n2 = outs2["mb"].count()
    assert n2 == expected("2024-01-01 06:00:00", "2024-01-01 12:00:00") and n2 > 0


def test_microbatch_checkpoint_not_advanced_on_sink_failure(spark, tmp_path):
    """Checkpoint persists post-commit only: a failing sink must leave the
    watermark untouched so the next run replays the interval
    (reference: MicroBatch.java CheckpointSaveDoFn)."""
    import json
    import os

    import pytest

    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    ckpt = str(tmp_path / "ckpt.json")
    # a FILE as the output's parent dir makes the sink action fail reliably
    blocker = tmp_path / "blocker"
    blocker.write_text("not a directory")
    bad_out = str(blocker / "out.parquet")
    cfg = f"""
sources:
  - name: mb
    module: microbatch
    parameters:
      input: /root/testdata/sf0.001/events.parquet
      table: ev
      query: |
        SELECT event_id, ts FROM ev
        WHERE ts >= TIMESTAMP '__timestamp_from__' AND ts < TIMESTAMP '__timestamp_to__'
      startDatetime: "2024-01-01T00:00:00"
      endDatetime: "2024-01-01T02:00:00"
      intervalSeconds: 3600
      checkpointFile: {ckpt}
sinks:
  - name: bad
    module: storage
    inputs: [mb]
    parameters:
      output: {bad_out}
      format: parquet
"""
    with pytest.raises(Exception):
        run_pipeline(spark, parse_config(cfg))
    assert not os.path.exists(ckpt), "sink failed but checkpoint was written"

    ok_cfg = cfg.replace(bad_out, str(tmp_path / "out.parquet"))
    run_pipeline(spark, parse_config(ok_cfg))
    assert json.load(open(ckpt))["watermark"].startswith("2024-01-01T02:00:00")


def test_output_pane_info_batch_semantics(spark):
    """outputPaneInfo in batch = Beam's single ON_TIME pane, index 0
    (reference: AggregationTransform.java:36 + Beam PaneInfo)."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    outs = run_pipeline(spark, parse_config("""
sources:
  - name: ev
    module: create
    parameters:
      elements:
        - {k: a, v: 1}
        - {k: a, v: 2}
        - {k: b, v: 5}
    schema:
      fields:
        - {name: k, type: string, mode: required}
        - {name: v, type: int64, mode: required}
transforms:
  - name: agg
    module: aggregation
    inputs: [ev]
    parameters:
      groupFields: [k]
      outputPaneInfo: true
      aggregations:
        - {name: total, op: sum, field: v}
"""))
    rows = {r["k"]: r for r in outs["agg"].collect()}
    assert rows["a"]["total"] == 3
    for r in rows.values():
        pane = r["pane"]
        assert pane["timing"] == "ON_TIME"
        assert pane["index"] == 0 and pane["is_first"] and pane["is_last"]
        assert pane["firing_time"] is not None


def test_streaming_exact_dedup_within_watermark(spark, tmp_path):
    import datetime as dt

    rows = [
        (1, "same content", dt.datetime(2024, 1, 1, 0, 0, 5)),
        (2, "same content", dt.datetime(2024, 1, 1, 0, 0, 15)),   # dup
        (3, "other content", dt.datetime(2024, 1, 1, 0, 0, 25)),
        (4, "same content", dt.datetime(2024, 1, 1, 0, 1, 5)),    # dup
        (5, "third thing", dt.datetime(2024, 1, 1, 0, 1, 15)),
    ]
    df = spark.createDataFrame(rows, "id long, text string, ts timestamp")
    in_dir = str(tmp_path / "dedup_in")
    df.coalesce(1).write.parquet(in_dir)
    out_dir = str(tmp_path / "dedup_out")
    cfg = parse_config(f"""
sources:
  - name: docs
    module: storage
    parameters:
      format: parquet
      input: {in_dir}
      mode: streaming
transforms:
  - name: dd
    module: dedup
    inputs: [docs]
    parameters:
      method: exact
      fields: [text]
      idField: id
      timestampField: ts
      watermarkDelay: 10 minutes
sinks:
  - name: out
    module: storage
    inputs: [dd]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
""")
    outs = run_pipeline(spark, cfg)
    assert outs["dd"].isStreaming
    got = spark.read.parquet(out_dir)
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["other content", "same content", "third thing"]


def test_streaming_exact_dedup_requires_watermark_or_optin(spark, tmp_path):
    import datetime as dt

    df = spark.createDataFrame(
        [(1, "x", dt.datetime(2024, 1, 1))], "id long, text string, ts timestamp"
    )
    in_dir = str(tmp_path / "nb_in")
    df.write.parquet(in_dir)
    cfg = parse_config(f"""
sources:
  - name: docs
    module: storage
    parameters: {{format: parquet, input: {in_dir}, mode: streaming}}
transforms:
  - name: dd
    module: dedup
    inputs: [docs]
    parameters: {{method: exact, fields: [text]}}
""")
    with pytest.raises(ValueError, match="timestampField"):
        run_pipeline(spark, cfg)


def test_streaming_watermark_on_ntz_parquet(spark, tmp_path):
    """Parquet written with isAdjustedToUTC=false (pyarrow default) is read
    back by Spark 4 as TIMESTAMP_NTZ, which withWatermark rejects — the
    engine must normalize event time at the boundary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array(["a", "a", "b", "a"]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
        # timestamp[us] with no timezone → NTZ in Spark 4
        "ts": pa.array(
            [
                dt.datetime(2024, 1, 1, 0, 0, 5),
                dt.datetime(2024, 1, 1, 0, 0, 15),
                dt.datetime(2024, 1, 1, 0, 0, 25),
                dt.datetime(2024, 1, 1, 0, 1, 5),
            ],
            pa.timestamp("us"),
        ),
    })
    in_dir = tmp_path / "ntz_in"
    in_dir.mkdir()
    pq.write_table(tbl, str(in_dir / "part-0.parquet"))
    # precondition: Spark really does see NTZ, else this test is vacuous
    assert (
        spark.read.parquet(str(in_dir)).schema["ts"].dataType.typeName()
        == "timestamp_ntz"
    )
    out_dir = str(tmp_path / "ntz_out")
    cfg = parse_config(f"""
sources:
  - name: events
    module: storage
    parameters:
      format: parquet
      input: {in_dir}
      mode: streaming
transforms:
  - name: agg
    module: aggregation
    inputs: [events]
    timestampAttribute: ts
    strategy:
      window: {{type: fixed, size: 1, unit: minute}}
      allowedLateness: 5
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: n, op: count}}
        - {{name: total, op: sum, field: v}}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
""")
    run_pipeline(spark, cfg)
    result = spark.read.parquet(out_dir)
    rows = {(r["k"], r["window"]["start"].minute): (r["n"], r["total"]) for r in result.collect()}
    assert rows[("a", 0)] == (2, 3.0)
    assert rows[("b", 0)] == (1, 3.0)


def _write_stream_files(tmp_path, name, batches):
    """Write one parquet file per batch with staggered mtimes so the file
    stream (maxFilesPerTrigger=1) processes them in order."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    in_dir = tmp_path / name
    in_dir.mkdir()
    for i, rows in enumerate(batches):
        tbl = pa.table({
            "k": pa.array([r[0] for r in rows]),
            "v": pa.array([
                None if r[1] is None else float(r[1]) for r in rows
            ], pa.float64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        })
        f = in_dir / f"b{i}.parquet"
        pq.write_table(tbl, str(f))
        mt = time.time() - 100 + i * 10
        os.utime(f, (mt, mt))
    return str(in_dir)


def _early_firing_cfg(in_dir, out_dir, accumulation_mode):
    return f"""
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
      window: {{type: fixed, size: 1, unit: minute}}
      allowedLateness: 5
      trigger:
        type: afterWatermark
        earlyFiringTrigger: {{type: afterProcessingTime, pastFirstElementDelay: 1}}
      accumulationMode: {accumulation_mode}
      outputPaneInfo: true
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: n, op: count}}
        - {{name: total, op: sum, field: v}}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
"""


def test_early_firing_accumulating_panes(spark, tmp_path):
    """afterProcessingTime early firings (Strategy.java:232-343): each
    micro-batch emits an updated pane; accumulating panes carry the
    running aggregate and pane indexes increase per firing."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "ef_in", [
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=15))],
        [("a", 4.0, base.replace(second=25))],
        [("a", 8.0, base.replace(second=35)),
         ("b", 1.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    out_dir = str(tmp_path / "ef_out")
    run_pipeline(spark, parse_config(_early_firing_cfg(in_dir, out_dir, "accumulating")))
    rows = spark.read.parquet(out_dir).collect()
    a_panes = sorted(
        (r for r in rows if r["k"] == "a"), key=lambda r: r["__pane__"]["index"]
    )
    assert [p["__pane__"]["index"] for p in a_panes] == [0, 1, 2]
    assert a_panes[0]["__pane__"]["is_first"] is True
    # accumulating: each pane is the full running aggregate
    assert [(p["n"], p["total"]) for p in a_panes] == [(2, 3.0), (3, 7.0), (4, 15.0)]
    # Beam timing: EARLY until the (proxy) watermark passes the window end —
    # the first two firings happen while a's window could still change; the
    # third fires after the 2100 event pushed the mark far past it
    assert [p["__pane__"]["timing"] for p in a_panes] == ["EARLY", "EARLY", "ON_TIME"]
    b_panes = [r for r in rows if r["k"] == "b"]
    assert b_panes and all(p["__pane__"]["timing"] == "EARLY" for p in b_panes)


def test_early_firing_discarding_panes(spark, tmp_path):
    """Discarding panes: each firing carries only the delta since the
    previous pane; deltas sum to the final accumulated aggregate."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "efd_in", [
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=15))],
        [("a", 4.0, base.replace(second=25))],
        [("a", 8.0, base.replace(second=35))],
    ])
    out_dir = str(tmp_path / "efd_out")
    run_pipeline(spark, parse_config(_early_firing_cfg(in_dir, out_dir, "discarding")))
    rows = spark.read.parquet(out_dir).collect()
    panes = sorted(rows, key=lambda r: r["__pane__"]["index"])
    assert [(p["n"], p["total"]) for p in panes] == [(2, 3.0), (1, 4.0), (1, 8.0)]
    assert sum(p["n"] for p in panes) == 4
    assert sum(p["total"] for p in panes) == 15.0


def test_early_firing_count_trigger_panes(spark, tmp_path):
    """afterPane.elementCountAtLeast(3): pane updates are withheld until
    the count aggregate grows by >= 3 since the last firing, and the
    withheld remainder flushes as a final ON_TIME pane when the proxy
    watermark closes the window (no suppressed data lost).
    Reference trigger surface: Strategy.java:232-343."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "efc_in", [
        # batch 1: 2 elements -> withheld (count 2 < 3)
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=10))],
        # batch 2: +2 -> count 4, grown 4 >= 3 -> EARLY firing
        [("a", 4.0, base.replace(second=20)), ("a", 8.0, base.replace(second=25))],
        # batch 3: +1 -> grown 1 < 3 -> withheld; the far-future event
        # pushes the proxy watermark past a's window -> ON_TIME flush
        [("a", 16.0, base.replace(second=40)),
         ("b", 1.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    out_dir = str(tmp_path / "efc_out")
    cfg = _early_firing_cfg(in_dir, out_dir, "accumulating").replace(
        "earlyFiringTrigger: {type: afterProcessingTime, pastFirstElementDelay: 1}",
        "earlyFiringTrigger: {type: afterPane, elementCountAtLeast: 3}",
    )
    run_pipeline(spark, parse_config(cfg))
    rows = spark.read.parquet(out_dir).collect()
    a_panes = sorted(
        (r for r in rows if r["k"] == "a"), key=lambda r: r["__pane__"]["index"]
    )
    # exactly two firings: the count-triggered EARLY pane and the flush
    assert [(p["n"], p["total"]) for p in a_panes] == [(4, 15.0), (5, 31.0)]
    assert [p["__pane__"]["timing"] for p in a_panes] == ["EARLY", "ON_TIME"]
    assert [p["__pane__"]["index"] for p in a_panes] == [0, 1]
    # b never reaches 3 elements and no later event closes its window —
    # the end-of-stream flush must still emit it (suppression loses no
    # data on bounded runs)
    b_panes = [r for r in rows if r["k"] == "b"]
    assert [(p["n"], p["total"]) for p in b_panes] == [(1, 1.0)]
    assert b_panes[0]["__pane__"]["timing"] == "ON_TIME"


def test_early_firing_count_trigger_zero_lateness(spark, tmp_path):
    """allowedLateness 0 regression: the proxy watermark is max window
    START (a sound event-time lower bound), so a window must NOT close in
    its own batch — the count threshold stays in force instead of every
    pane degenerating to ON_TIME."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "efz_in", [
        [("a", 1.0, base.replace(second=5))],   # count 1 < 2 -> withheld
        [("a", 2.0, base.replace(second=10))],  # count 2 >= 2 -> EARLY
    ])
    out_dir = str(tmp_path / "efz_out")
    cfg = _early_firing_cfg(in_dir, out_dir, "accumulating").replace(
        "earlyFiringTrigger: {type: afterProcessingTime, pastFirstElementDelay: 1}",
        "earlyFiringTrigger: {type: afterPane, elementCountAtLeast: 2}",
    ).replace("allowedLateness: 5", "allowedLateness: 0")
    run_pipeline(spark, parse_config(cfg))
    rows = spark.read.parquet(out_dir).collect()
    panes = sorted(rows, key=lambda r: r["__pane__"]["index"])
    # one count-triggered EARLY firing; batch 1's lone row was withheld
    assert [(p["n"], p["total"]) for p in panes] == [(2, 3.0)]
    assert panes[0]["__pane__"]["timing"] == "EARLY"


def test_early_firing_count_trigger_requires_count_field(spark):
    from pipeline_spark.streaming.triggers import early_firing_foreach_batch

    with pytest.raises(ValueError, match="paneCountField"):
        early_firing_foreach_batch(
            lambda df, bid: None, ["window", "k"], ["total"],
            discarding=False, output_pane_info=False,
            early_count=2, count_field="n",
        )


def test_trigger_parse_rejects_non_emulatable():
    from pipeline_spark.streaming.triggers import parse_trigger

    assert parse_trigger({}) is None
    assert parse_trigger({"trigger": {"type": "afterWatermark"}}) is None
    cfg = parse_trigger({"trigger": {
        "type": "afterWatermark",
        "earlyFiringTrigger": {"type": "afterProcessingTime",
                               "pastFirstElementDelay": 30},
    }})
    assert cfg == {"early_delay_sec": 30.0}
    assert parse_trigger(
        {"trigger": {"type": "afterPane", "elementCountAtLeast": 2}}
    ) == {"early_count": 2}
    assert parse_trigger({"trigger": {
        "type": "afterWatermark",
        "earlyFiringTrigger": {"type": "afterPane", "elementCountAtLeast": 3},
    }}) == {"early_count": 3}
    with pytest.raises(NotImplementedError, match="afterFirst"):
        parse_trigger({"trigger": {"type": "afterFirst"}})


def test_streaming_count_range_matches_batch_window(spark, tmp_path):
    """Streaming stateful count-range (applyInPandasWithState) must produce
    row-for-row the same aggregates as the batch Window compiler
    (rowsBetween(-(N-1), 0)) on identical in-order data — pinning the
    streaming/batch stateful-select contract (VERDICT r3 #9)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pipeline_spark.compilers.stateful import apply_stateful_select
    from pipeline_spark.streaming.state import streaming_count_range_select

    rng = __import__("random").Random(13)
    base = dt.datetime(2024, 1, 1)
    rows = []
    seq = 0
    for _ in range(60):
        k = rng.choice(["a", "b", "c"])
        rows.append((k, float(rng.randint(-50, 50)), base + dt.timedelta(seconds=seq)))
        seq += 1
    # three event-time-ordered files → three micro-batches
    in_dir = tmp_path / "cr_in"
    in_dir.mkdir()
    import os
    import time as _time

    for i in range(3):
        chunk = rows[i * 20 : (i + 1) * 20]
        tbl = pa.table({
            "k": pa.array([r[0] for r in chunk]),
            "v": pa.array([r[1] for r in chunk]),
            "ts": pa.array([r[2] for r in chunk], pa.timestamp("us")),
        })
        f = in_dir / f"b{i}.parquet"
        pq.write_table(tbl, str(f))
        mt = _time.time() - 100 + i * 10
        os.utime(f, (mt, mt))

    N = 5
    sdf = (
        spark.readStream.schema("k string, v double, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1).parquet(str(in_dir))
    )
    stream_out = streaming_count_range_select(
        sdf, ["k"], "v", N, "ts", [("k", "k"), ("ts", "ts")],
        [("range_n", "count"), ("range_sum", "sum"), ("range_min", "min"),
         ("range_max", "max"), ("range_avg", "avg")],
    )
    q = (
        stream_out.writeStream.format("memory").queryName("cr_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cr_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["k"], r["ts"]): (r["range_n"], r["range_sum"], r["range_min"],
                            r["range_max"], r["range_avg"])
        for r in spark.table("cr_stream").collect()
    }

    bdf = spark.read.parquet(str(in_dir))
    batch = apply_stateful_select(
        bdf,
        [
            {"name": "k", "field": "k"},
            {"name": "ts", "field": "ts"},
            {"name": "range_n", "func": "count", "field": "v", "range": {"count": N}},
            {"name": "range_sum", "func": "sum", "field": "v", "range": {"count": N}},
            {"name": "range_min", "func": "min", "field": "v", "range": {"count": N}},
            {"name": "range_max", "func": "max", "field": "v", "range": {"count": N}},
            {"name": "range_avg", "func": "avg", "field": "v", "range": {"count": N}},
        ],
        "ts",
        ["k"],
    ).collect()
    assert len(batch) == len(got) == 60
    for r in batch:
        s = got[(r["k"], r["ts"])]
        assert s[0] == r["range_n"], (r, s)
        assert s[1] == pytest.approx(r["range_sum"])
        assert s[2] == pytest.approx(r["range_min"])
        assert s[3] == pytest.approx(r["range_max"])
        assert s[4] == pytest.approx(r["range_avg"])


def test_streaming_select_rename_and_validation(spark, tmp_path):
    """Review fixes: stateless renames emit the OUTPUT name (batch parity);
    expression/field-less stateful entries fail with clear errors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pipeline_spark.streaming.state import streaming_stateful_select

    in_dir = tmp_path / "rn_in"
    in_dir.mkdir()
    pq.write_table(pa.table({
        "user_id": pa.array(["a", "a", "b"]),
        "v": pa.array([1.0, 2.0, 3.0]),
        "ts": pa.array([dt.datetime(2024, 1, 1, 0, 0, s) for s in (1, 2, 3)],
                       pa.timestamp("us")),
    }), str(in_dir / "b0.parquet"))
    sdf = spark.readStream.schema("user_id string, v double, ts timestamp_ntz").parquet(str(in_dir))
    out = streaming_stateful_select(
        sdf,
        [{"name": "uid", "field": "user_id"}, {"name": "ts"},
         {"name": "n", "func": "count", "field": "v", "range": {"count": 5}}],
        "ts", ["user_id"],
    )
    assert "uid" in out.columns and "user_id" not in out.columns
    q = (out.writeStream.format("memory").queryName("rn_t")
         .option("checkpointLocation", str(tmp_path / "rn_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table("rn_t").collect()
    assert sorted(r["uid"] for r in rows) == ["a", "a", "b"]

    # r6: expression inputs now stream (compiled to one derived JVM
    # column upstream) — batch parity checked below
    expr_out = streaming_stateful_select(
        sdf, [{"name": "uid", "field": "user_id"}, {"name": "ts"},
              {"name": "s", "func": "sum", "expression": "v * 2",
               "range": {"count": 3}}], "ts", ["user_id"])
    q = (expr_out.writeStream.format("memory").queryName("rn_expr")
         .option("checkpointLocation", str(tmp_path / "rn_expr_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {
        (r["uid"], r["ts"]): r["s"] for r in spark.table("rn_expr").collect()
    }
    from pipeline_spark.compilers.stateful import apply_stateful_select
    batch = apply_stateful_select(
        spark.read.parquet(str(in_dir)),
        [{"name": "uid", "field": "user_id"}, {"name": "ts"},
         {"name": "s", "func": "sum", "expression": "v * 2",
          "range": {"count": 3}}],
        "ts", ["user_id"],
    ).collect()
    assert len(batch) == len(got) == 3
    for r in batch:
        assert got[(r["uid"], r["ts"])] == pytest.approx(r["s"])
    with pytest.raises(NotImplementedError, match="needs a field"):
        streaming_stateful_select(
            sdf, [{"name": "s", "func": "sum", "range": {"count": 3}}],
            "ts", ["user_id"])
    with pytest.raises(NotImplementedError, match="name a field"):
        streaming_stateful_select(
            sdf, [{"name": "n", "func": "count", "range": {"count": 3}}],
            "ts", ["user_id"])


def test_trigger_unit_validation():
    from pipeline_spark.streaming.triggers import parse_trigger

    cfg = parse_trigger({"trigger": {
        "type": "afterProcessingTime", "delay": 500, "unit": "milliseconds"}})
    assert cfg == {"early_delay_sec": 0.5}
    with pytest.raises(ValueError, match="fortnight"):
        parse_trigger({"trigger": {
            "type": "afterProcessingTime", "delay": 1, "unit": "fortnight"}})


def test_pane_key_split_protects_nonnumeric_frame(spark):
    from pipeline_spark.streaming.triggers import split_pane_columns

    df = spark.createDataFrame(
        [("u", "x", 1, 2.0)], "user string, label string, k int, total double"
    )
    # under-declared keys: the string 'label' must stay identity, the
    # numeric group key 'k' becomes identity only when declared
    keys, vals = split_pane_columns(df, {"paneKeyFields": ["user", "k"]})
    assert set(keys) == {"user", "label", "k"} and vals == ["total"]
    keys2, vals2 = split_pane_columns(df, {})
    assert set(keys2) == {"user", "label"} and set(vals2) == {"k", "total"}


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_pubsub_streaming_datasource_pull_ack(spark, tmp_path):
    """TRUE streaming pubsub on the Python DataSource API: the
    prefetch-and-cache contract carries the destructive pull (pulled
    exactly once), messages arriving mid-stream land in later
    micro-batches, and acks fire at source-commit time — after the batch
    is durably committed, never before.  Reference: PubSubSource.java
    ack-after-output semantics."""
    import os
    import time

    spool = str(tmp_path / "ps_spool")
    inbox = os.path.join(spool, "inbox")
    os.makedirs(inbox)

    def put(i):
        with open(os.path.join(inbox, f"m{i:03d}.msg"), "wb") as fh:
            fh.write(f"payload-{i}".encode())

    for i in range(4):
        put(i)

    from pipeline_spark.sources.pubsub_stream import read_pubsub_stream_native

    out_dir = str(tmp_path / "ps_rows")
    df = read_pubsub_stream_native(
        spark,
        {
            "subscription": f"projects/p/subscriptions/s#{spool}",
            "clientFactory": "pipeline_spark.testing:fake_pubsub_stream_client",
            "maxMessages": 100,
        },
    )
    q = (
        df.selectExpr("CAST(data AS STRING) AS payload", "message_id")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ps_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        acks_path = os.path.join(spool, "acks.log")

        def acks():
            if not os.path.exists(acks_path):
                return set()
            return set(open(acks_path).read().splitlines())

        while time.time() < deadline and len(acks()) < 4:
            time.sleep(0.5)
        assert acks() == {f"ack-m{i:03d}" for i in range(4)}
        put(9)  # mid-stream arrival -> a later micro-batch picks it up
        while time.time() < deadline and "ack-m009" not in acks():
            time.sleep(0.5)
        assert "ack-m009" in acks()
    finally:
        q.stop()
    got = sorted(r["payload"] for r in spark.read.parquet(out_dir).collect())
    assert got == [f"payload-{i}" for i in (0, 1, 2, 3, 9)]  # exactly once
    pulled = open(os.path.join(spool, "pulled.log")).read().splitlines()
    assert len(pulled) == len(set(pulled)) == 5  # destructive pull, once each


# ---------------------------------------------------------------------------
# composite triggers (Strategy.java:319-331), lateFiringTrigger
# (Strategy.java:277-301), finalTrigger/orFinally (Strategy.java:335-341):
# the pane ledger is driven directly with crafted micro-batches — the
# foreachBatch contract is the same whether Spark or the test calls it.


def _ledger(spark, key_cols, value_cols, **kw):
    from pipeline_spark.streaming.triggers import early_firing_foreach_batch

    out = []
    fb = early_firing_foreach_batch(
        lambda bdf, _bid: out.extend(
            r.asDict(recursive=True) for r in bdf.collect()
        ),
        key_cols,
        value_cols,
        discarding=False,
        output_pane_info=True,
        count_field="n",
        **kw,
    )
    return fb, out


def test_composite_after_first_count_or_time(spark):
    """afterFirst(count>=3, processingTime 50ms): a pane fires when EITHER
    leaf is satisfied — and a time leaf can fire a pane withheld in an
    earlier batch even when the current batch carries no row for it."""
    from pipeline_spark.streaming.triggers import parse_trigger

    cfg = parse_trigger({"trigger": {
        "type": "afterWatermark",
        "earlyFiringTrigger": {
            "type": "afterFirst",
            "childrenTriggers": [
                {"type": "afterPane", "elementCountAtLeast": 3},
                {"type": "afterProcessingTime", "pastFirstElementDelay": 50,
                 "pastFirstElementDelayUnit": "millisecond"},
            ],
        },
    }})
    assert cfg["tree"]["kind"] == "first" and cfg["check_sec"] == 0.05
    fb, out = _ledger(spark, ["k"], ["n"], trigger_tree=cfg["tree"])
    mk = lambda *rows: spark.createDataFrame(list(rows), "k string, n long")
    fb(mk(("a", 2)), 0)
    assert out == []  # count 2 < 3, time 0 < 50ms -> withheld
    fb(mk(("a", 4)), 1)
    assert [(r["k"], r["n"], r["__pane__"]["timing"]) for r in out] == [
        ("a", 4, "EARLY")  # count leaf fired
    ]
    out.clear()
    fb(mk(("b", 1)), 2)
    assert out == []  # withheld on both leaves
    time.sleep(0.06)
    fb(mk(("c", 1)), 3)  # batch has no 'b' row; its time leaf fires anyway
    assert [(r["k"], r["n"]) for r in out] == [("b", 1)]
    fb.flush_pending()  # drain: 'c' (and 'a' count 4 already fired) flush
    assert sorted((r["k"], r["n"]) for r in out) == [("b", 1), ("c", 1)]


def test_composite_after_all(spark):
    """afterAll(count>=2, processingTime 50ms) fires only once BOTH leaves
    are satisfied within the pane's current cycle."""
    from pipeline_spark.streaming.triggers import parse_trigger

    cfg = parse_trigger({"trigger": {
        "type": "afterAll",
        "childrenTriggers": [
            {"type": "afterPane", "elementCountAtLeast": 2},
            {"type": "afterProcessingTime", "pastFirstElementDelay": 50,
             "pastFirstElementDelayUnit": "ms"},
        ],
    }})
    fb, out = _ledger(spark, ["k"], ["n"], trigger_tree=cfg["tree"])
    mk = lambda *rows: spark.createDataFrame(list(rows), "k string, n long")
    fb(mk(("a", 2)), 0)
    assert out == []  # count satisfied, time not -> withheld
    time.sleep(0.06)
    fb(mk(("z", 1)), 1)
    assert [(r["k"], r["n"], r["__pane__"]["timing"]) for r in out] == [
        ("a", 2, "EARLY")
    ]


def test_composite_after_each_sequence(spark):
    """afterEach fires its children once each, in order (Beam
    AfterEach.inOrder over OnceTriggers); the exhausted sequence stops
    early firings and the drain flush emits the withheld tail."""
    from pipeline_spark.streaming.triggers import parse_trigger

    cfg = parse_trigger({"trigger": {
        "type": "afterEach",
        "childrenTriggers": [
            {"type": "afterPane", "elementCountAtLeast": 2},
            {"type": "afterPane", "elementCountAtLeast": 4},
        ],
    }})
    fb, out = _ledger(spark, ["k"], ["n"], trigger_tree=cfg["tree"])
    mk = lambda n: spark.createDataFrame([("a", n)], "k string, n long")
    fb(mk(2), 0)   # child 0: grown 2 >= 2 -> fire, advance
    fb(mk(4), 1)   # child 1: grown 2 < 4 -> withheld
    fb(mk(8), 2)   # child 1: grown 6 >= 4 -> fire, sequence exhausted
    fb(mk(20), 3)  # no active child -> withheld
    fb.flush_pending()
    assert [(r["n"], r["__pane__"]["index"], r["__pane__"]["timing"])
            for r in out] == [
        (2, 0, "EARLY"), (8, 1, "EARLY"), (20, 2, "ON_TIME")
    ]


def test_final_trigger_closes_pane(spark):
    """finalTrigger (orFinally): when the since-birth condition is met the
    pane emits one final firing and CLOSES — later updates are dropped."""
    from pipeline_spark.streaming.triggers import parse_trigger

    cfg = parse_trigger({"trigger": {
        "type": "afterProcessingTime", "pastFirstElementDelay": 0,
        "finalTrigger": {"type": "afterPane", "elementCountAtLeast": 5},
    }})
    assert cfg["early_delay_sec"] == 0.0 and cfg["final_tree"]["n"] == 5
    fb, out = _ledger(spark, ["k"], ["n"], final_tree=cfg["final_tree"],
              early_delay=cfg["early_delay_sec"])
    mk = lambda n: spark.createDataFrame([("a", n)], "k string, n long")
    fb(mk(2), 0)   # processing-time firing
    fb(mk(5), 1)   # total 5 >= 5 -> final firing + close
    fb(mk(9), 2)   # closed -> dropped
    fb.flush_pending()
    assert [r["n"] for r in out] == [2, 5]


def test_late_firing_trigger_gates_late_panes(spark):
    """After the unconditional ON_TIME watermark firing, further updates
    are LATE panes gated on lateFiringTrigger's condition."""
    from pipeline_spark.streaming.triggers import parse_trigger

    cfg = parse_trigger({"trigger": {
        "type": "afterWatermark",
        "lateFiringTrigger": {"type": "afterPane", "elementCountAtLeast": 2},
    }})
    fb, out = _ledger(
        spark, ["window", "k"], ["n"], late_tree=cfg["late_tree"]
    )
    schema = (
        "window struct<start:timestamp,end:timestamp>, k string, n long"
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    w1 = (t0, t0 + dt.timedelta(minutes=1))
    w9 = (t0 + dt.timedelta(hours=1), t0 + dt.timedelta(hours=1, minutes=1))
    mk = lambda *rows: spark.createDataFrame(list(rows), schema)
    fb(mk((w1, "a", 1)), 0)                      # withheld: no early trigger
    fb(mk((w9, "z", 1), (w1, "a", 2)), 1)        # w9 closes w1 -> ON_TIME
    fb(mk((w1, "a", 3)), 2)                      # LATE, grown 1 < 2 -> held
    fb(mk((w1, "a", 5)), 3)                      # LATE, grown 3 >= 2 -> fire
    a = [(r["n"], r["__pane__"]["timing"]) for r in out if r["k"] == "a"]
    # r12: Beam's AfterWatermark.withLateFirings declares NO early
    # firings — nothing may fire before the unconditional ON_TIME pane
    # (the pre-r12 ledger emitted a spurious EARLY pane every batch)
    assert a == [(2, "ON_TIME"), (5, "LATE")]


def test_trigger_parse_composites():
    from pipeline_spark.streaming.triggers import parse_trigger

    # afterEach cannot nest (not a OnceTrigger) — same rule as the
    # reference's early-firing validation (Strategy.java:283-285)
    with pytest.raises(NotImplementedError, match="afterEach"):
        parse_trigger({"trigger": {
            "type": "afterFirst",
            "childrenTriggers": [
                {"type": "afterEach",
                 "childrenTriggers": [{"type": "afterPane",
                                       "elementCountAtLeast": 1}]},
            ],
        }})
    with pytest.raises(NotImplementedError, match="afterEach"):
        parse_trigger({"trigger": {
            "type": "afterWatermark",
            "earlyFiringTrigger": {
                "type": "afterEach",
                "childrenTriggers": [{"type": "afterPane",
                                      "elementCountAtLeast": 1}]},
        }})
    # nested afterFirst-in-afterAll is fine (OnceTrigger composition)
    cfg = parse_trigger({"trigger": {
        "type": "afterAll",
        "childrenTriggers": [
            {"type": "afterFirst",
             "childrenTriggers": [
                 {"type": "afterPane", "elementCountAtLeast": 2},
                 {"type": "afterProcessingTime", "pastFirstElementDelay": 1},
             ]},
            {"type": "afterPane", "elementCountAtLeast": 1},
        ],
    }})
    assert cfg["tree"]["children"][0]["kind"] == "first"
    assert cfg["check_sec"] == 1.0


# ---------------------------------------------------------------------------
# executor-side pane ledger (streaming/panes.py): the same trigger surface
# with state in Spark's state store instead of the driver foreachBatch dict


def _exec_backend_cfg(in_dir, out_dir, accumulation_mode):
    return _early_firing_cfg(in_dir, out_dir, accumulation_mode).replace(
        "accumulationMode:", "paneStateBackend: executor\n      accumulationMode:"
    )


def test_executor_panes_accumulating(spark, tmp_path):
    """paneStateBackend executor: processing-time early firings fire per
    micro-batch with pane values identical to the driver ledger; timing
    uses the REAL watermark (visible one batch later than the driver's
    same-batch proxy, so the last dirty update labels EARLY and closure
    is handled by the EventTimeTimeout path)."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xef_in", [
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=15))],
        [("a", 4.0, base.replace(second=25))],
        [("a", 8.0, base.replace(second=35)),
         ("b", 1.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    out_dir = str(tmp_path / "xef_out")
    run_pipeline(spark, parse_config(_exec_backend_cfg(in_dir, out_dir, "accumulating")))
    rows = spark.read.parquet(out_dir).collect()
    a_panes = sorted(
        (r for r in rows if r["k"] == "a"), key=lambda r: r["__pane__"]["index"]
    )
    assert [p["__pane__"]["index"] for p in a_panes] == [0, 1, 2]
    assert a_panes[0]["__pane__"]["is_first"] is True
    # accumulating: each pane is the full running aggregate — identical
    # values to the driver-ledger test
    assert [(p["n"], p["total"]) for p in a_panes] == [(2, 3.0), (3, 7.0), (4, 15.0)]
    b_panes = [r for r in rows if r["k"] == "b"]
    assert [(p["n"], p["total"]) for p in b_panes] == [(1, 1.0)]


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_executor_panes_discarding(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xefd_in", [
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=15))],
        [("a", 4.0, base.replace(second=25))],
        [("a", 8.0, base.replace(second=35))],
    ])
    out_dir = str(tmp_path / "xefd_out")
    run_pipeline(spark, parse_config(_exec_backend_cfg(in_dir, out_dir, "discarding")))
    rows = spark.read.parquet(out_dir).collect()
    panes = sorted(rows, key=lambda r: r["__pane__"]["index"])
    assert [(p["n"], p["total"]) for p in panes] == [(2, 3.0), (1, 4.0), (1, 8.0)]
    assert sum(p["n"] for p in panes) == 4
    assert sum(p["total"] for p in panes) == 15.0


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_executor_panes_count_trigger(spark, tmp_path):
    """afterPane on the executor backend: withheld until count growth >= 3
    (the operator owns the aggregation, so no paneCountField contract);
    the withheld remainder flushes ON_TIME through the EventTimeTimeout
    timer once the real watermark passes the window end."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xefc_in", [
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=10))],
        [("a", 4.0, base.replace(second=20)), ("a", 8.0, base.replace(second=25))],
        [("a", 16.0, base.replace(second=40))],
        # the far-future event pushes the REAL watermark past a's window;
        # its own trailing pane is the documented executor-backend
        # divergence (no drain-time flush in keyed state)
        [("wm", 0.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    out_dir = str(tmp_path / "xefc_out")
    cfg = _exec_backend_cfg(in_dir, out_dir, "accumulating").replace(
        "earlyFiringTrigger: {type: afterProcessingTime, pastFirstElementDelay: 1}",
        "earlyFiringTrigger: {type: afterPane, elementCountAtLeast: 3}",
    )
    run_pipeline(spark, parse_config(cfg))
    rows = spark.read.parquet(out_dir).collect()
    a_panes = sorted(
        (r for r in rows if r["k"] == "a"), key=lambda r: r["__pane__"]["index"]
    )
    # exactly two firings: the count-triggered EARLY pane and the
    # watermark-timer ON_TIME flush of the withheld remainder
    assert [(p["n"], p["total"]) for p in a_panes] == [(4, 15.0), (5, 31.0)]
    assert [p["__pane__"]["timing"] for p in a_panes] == ["EARLY", "ON_TIME"]
    assert [p["__pane__"]["index"] for p in a_panes] == [0, 1]


def test_executor_panes_rejects_unsupported_loudly(spark, tmp_path):
    """A silent fallback would double-ledger at the sink — unsupported
    aggregations/windows must raise with the reason."""
    import pytest as _pytest

    from pipeline_spark.streaming.panes import parse_exec_aggs

    df = spark.createDataFrame([(1.0, "a")], "v double, k string")
    with _pytest.raises(NotImplementedError, match="driver backend"):
        parse_exec_aggs([{"name": "m", "op": "median", "field": "v"}], df)
    # conditions/expressions/weights are SUPPORTED now (r6): they compile
    # to derived JVM columns upstream of the stateful operator
    df2, aggs = parse_exec_aggs(
        [{"name": "c", "op": "count",
          "condition": {"key": "v", "op": ">", "value": 0}},
         {"name": "s", "op": "sum", "expression": "v * 2"},
         {"name": "w", "op": "avg", "field": "v", "weightField": "v"}],
        df,
    )
    assert [op for _n, op, _f in aggs] == ["count", "sum", "wavg"]
    assert all(c.startswith("__ea") for c in df2.columns if c not in ("v", "k"))
    from pipeline_spark.streaming.panes import _window_params

    # session windows are SUPPORTED now (merging keyed state); unknown
    # window types still refuse with the reason
    assert _window_params({"window": {"type": "session", "gap": 5}})[0] == "session"
    with _pytest.raises(NotImplementedError, match="driver backend"):
        _window_params({"window": {"type": "bogus"}})


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_streaming_duration_range_matches_batch_window(spark, tmp_path):
    """Streaming stateful duration-range (event-time-trimmed buffers in
    applyInPandasWithState) must produce row-for-row the same aggregates
    as the batch Window compiler's rangeBetween(-(D+offset-1), -offset)
    frame on identical in-order data — closing VERDICT r4 gap #7 (the
    last batch-only stateful-select frame)."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pipeline_spark.compilers.stateful import apply_stateful_select
    from pipeline_spark.streaming.state import streaming_duration_range_select

    rng = __import__("random").Random(29)
    base = dt.datetime(2024, 1, 1)
    rows = []
    t = 0
    for _ in range(60):
        k = rng.choice(["a", "b", "c"])
        t += rng.randint(1, 7)  # irregular spacing exercises the frame
        rows.append((k, float(rng.randint(-50, 50)), base + dt.timedelta(seconds=t)))
    in_dir = tmp_path / "dr_in"
    in_dir.mkdir()
    for i in range(3):
        chunk = rows[i * 20 : (i + 1) * 20]
        tbl = pa.table({
            "k": pa.array([r[0] for r in chunk]),
            "v": pa.array([r[1] for r in chunk]),
            "ts": pa.array([r[2] for r in chunk], pa.timestamp("us")),
        })
        f = in_dir / f"b{i}.parquet"
        pq.write_table(tbl, str(f))
        mt = _time.time() - 100 + i * 10
        os.utime(f, (mt, mt))

    for dur, off in [(15, 0), (10, 5)]:
        sdf = (
            spark.readStream.schema("k string, v double, ts timestamp_ntz")
            .option("maxFilesPerTrigger", 1).parquet(str(in_dir))
        )
        stream_out = streaming_duration_range_select(
            sdf, ["k"], "v", dur, off, "ts", [("k", "k"), ("ts", "ts")],
            [("range_n", "count"), ("range_sum", "sum"), ("range_min", "min"),
             ("range_max", "max"), ("range_avg", "avg")],
        )
        qname = f"dr_stream_{dur}_{off}"
        q = (
            stream_out.writeStream.format("memory").queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"dr_ck_{dur}_{off}"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        got = {
            (r["k"], r["ts"]): (r["range_n"], r["range_sum"], r["range_min"],
                                r["range_max"], r["range_avg"])
            for r in spark.table(qname).collect()
        }

        rng_spec = {"duration": dur, "unit": "second"}
        if off:
            rng_spec["offset"] = off
        bdf = spark.read.parquet(str(in_dir))
        batch = apply_stateful_select(
            bdf,
            [
                {"name": "k", "field": "k"},
                {"name": "ts", "field": "ts"},
                {"name": "range_n", "func": "count", "field": "v", "range": dict(rng_spec)},
                {"name": "range_sum", "func": "sum", "field": "v", "range": dict(rng_spec)},
                {"name": "range_min", "func": "min", "field": "v", "range": dict(rng_spec)},
                {"name": "range_max", "func": "max", "field": "v", "range": dict(rng_spec)},
                {"name": "range_avg", "func": "avg", "field": "v", "range": dict(rng_spec)},
            ],
            "ts",
            ["k"],
        ).collect()
        assert len(batch) == len(got) == 60
        for r in batch:
            s = got[(r["k"], r["ts"])]
            assert s[0] == r["range_n"], (dur, off, r, s)
            if r["range_sum"] is None:
                # r12: empty frames are NULL on BOTH paths now (the
                # pandas path used to let NaN through the Arrow
                # hand-off, diverging from the batch Window)
                assert s[1] is None, (dur, off, r, s)
            else:
                assert s[1] == pytest.approx(r["range_sum"])
                assert s[2] == pytest.approx(r["range_min"])
                assert s[3] == pytest.approx(r["range_max"])
                assert s[4] == pytest.approx(r["range_avg"])


def test_streaming_select_duration_route(spark, tmp_path):
    """The select module's streaming stateful route now accepts duration
    frames (the r4 gate) and still rejects mixed frames loudly."""
    from pipeline_spark.streaming.state import streaming_stateful_select

    src = tmp_path / "dr_route_in"
    src.mkdir()
    spark.createDataFrame(
        [("a", 1.0, dt.datetime(2024, 1, 1))], "k string, v double, ts timestamp"
    ).write.parquet(str(src / "seed.parquet"))
    sdf = (
        spark.readStream.schema("k string, v double, ts timestamp")
        .parquet(str(src / "seed.parquet"))
    )
    # mixed count + duration frames: one buffer cannot serve both
    with pytest.raises(NotImplementedError, match="share one frame"):
        streaming_stateful_select(
            sdf,
            [
                {"name": "a", "func": "sum", "field": "v", "range": {"count": 3}},
                {"name": "b", "func": "sum", "field": "v",
                 "range": {"duration": 10, "unit": "second"}},
            ],
            "ts",
            ["k"],
        )
    # pure duration frame: routes to the duration-range operator
    out = streaming_stateful_select(
        sdf,
        [
            {"name": "k", "field": "k"},
            {"name": "s", "func": "sum", "field": "v",
             "range": {"duration": 10, "unit": "second", "offset": 2}},
        ],
        "ts",
        ["k"],
    )
    assert out.isStreaming and set(out.columns) == {"k", "s"}


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_executor_panes_composite_after_first(spark, tmp_path):
    """Composite afterFirst(count>=3, time>=1h) on the executor backend:
    the count leaf dominates deterministically (the time leaf cannot fire
    inside the test)."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xcf_in", [
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=10))],
        [("a", 4.0, base.replace(second=20)), ("a", 8.0, base.replace(second=25))],
        [("wm", 0.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    out_dir = str(tmp_path / "xcf_out")
    cfg = _exec_backend_cfg(in_dir, out_dir, "accumulating").replace(
        "earlyFiringTrigger: {type: afterProcessingTime, pastFirstElementDelay: 1}",
        """earlyFiringTrigger:
          type: afterFirst
          childrenTriggers:
            - {type: afterPane, elementCountAtLeast: 3}
            - {type: afterProcessingTime, pastFirstElementDelay: 3600}""",
    )
    run_pipeline(spark, parse_config(cfg))
    rows = spark.read.parquet(out_dir).collect()
    a_panes = sorted(
        (r for r in rows if r["k"] == "a"), key=lambda r: r["__pane__"]["index"]
    )
    # batch 1: 2 < 3 withheld; batch 2: grown 4 >= 3 → EARLY; watermark
    # closes the window with nothing withheld → no further pane
    assert [(p["n"], p["total"]) for p in a_panes] == [(4, 15.0)]
    assert a_panes[0]["__pane__"]["timing"] == "EARLY"


def test_executor_panes_final_trigger_closes(spark, tmp_path):
    """finalTrigger afterPane(4) on the executor backend: one last firing
    when total count reaches 4, then the pane CLOSES — the fifth element
    is dropped (Beam's finished-trigger semantics)."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xft_in", [
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=10))],
        [("a", 4.0, base.replace(second=20)), ("a", 8.0, base.replace(second=25))],
        [("a", 16.0, base.replace(second=40))],
        [("wm", 0.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    out_dir = str(tmp_path / "xft_out")
    cfg = _exec_backend_cfg(in_dir, out_dir, "accumulating").replace(
        """trigger:
        type: afterWatermark
        earlyFiringTrigger: {type: afterProcessingTime, pastFirstElementDelay: 1}""",
        """trigger:
        type: afterWatermark
        earlyFiringTrigger: {type: afterProcessingTime, pastFirstElementDelay: 1}
        finalTrigger: {type: afterPane, elementCountAtLeast: 4}""",
    )
    run_pipeline(spark, parse_config(cfg))
    rows = spark.read.parquet(out_dir).collect()
    a_panes = sorted(
        (r for r in rows if r["k"] == "a"), key=lambda r: r["__pane__"]["index"]
    )
    # pane 0: processing-time firing after batch 1 (n=2); pane 1: final
    # firing when n reaches 4 — then closed, so batch 3's element 16.0
    # never surfaces
    assert [(p["n"], p["total"]) for p in a_panes] == [(2, 3.0), (4, 15.0)]
    assert all(p["n"] < 5 for p in a_panes)


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_executor_panes_after_each_sequence(spark, tmp_path):
    """Top-level afterEach on the executor backend: the children fire
    once each in order (count>=2 then count>=3); afterwards updates stay
    withheld until the watermark flushes them ON_TIME."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xae_in", [
        [("a", 1.0, base.replace(second=2))],                     # 1 < 2
        [("a", 2.0, base.replace(second=4))],                     # 2 → fire
        [("a", 4.0, base.replace(second=6)),
         ("a", 8.0, base.replace(second=8))],                     # +2 < 3
        [("a", 16.0, base.replace(second=10))],                   # +3 → fire
        [("a", 32.0, base.replace(second=12))],                   # exhausted
        [("wm", 0.0, dt.datetime(2100, 1, 1, 0, 0, 5))],          # close
    ])
    out_dir = str(tmp_path / "xae_out")
    cfg = _exec_backend_cfg(in_dir, out_dir, "accumulating").replace(
        """trigger:
        type: afterWatermark
        earlyFiringTrigger: {type: afterProcessingTime, pastFirstElementDelay: 1}""",
        """trigger:
        type: afterEach
        childrenTriggers:
          - {type: afterPane, elementCountAtLeast: 2}
          - {type: afterPane, elementCountAtLeast: 3}""",
    )
    run_pipeline(spark, parse_config(cfg))
    rows = spark.read.parquet(out_dir).collect()
    a_panes = sorted(
        (r for r in rows if r["k"] == "a"), key=lambda r: r["__pane__"]["index"]
    )
    assert [(p["n"], p["total"]) for p in a_panes] == [
        (2, 3.0), (5, 31.0), (6, 63.0)
    ]
    assert [p["__pane__"]["timing"] for p in a_panes] == [
        "EARLY", "EARLY", "ON_TIME"
    ]


def test_streaming_count_range_counts_rows_with_nulls(spark, tmp_path):
    """Review fix: streaming count must count ROWS in the frame (batch
    F.count(F.lit(1)) parity), not non-null values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pipeline_spark.streaming.state import streaming_count_range_select

    in_dir = tmp_path / "cr_null"
    in_dir.mkdir()
    base = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "k": pa.array(["a", "a", "a"]),
        "v": pa.array([1.0, None, 2.0]),
        "ts": pa.array(
            [base + dt.timedelta(seconds=i) for i in range(3)],
            pa.timestamp("us"),
        ),
    })
    pq.write_table(tbl, str(in_dir / "b0.parquet"))
    sdf = (
        spark.readStream.schema("k string, v double, ts timestamp_ntz")
        .parquet(str(in_dir))
    )
    out = streaming_count_range_select(
        sdf, ["k"], "v", 2, "ts", [("ts", "ts")],
        [("range_n", "count"), ("range_sum", "sum")],
    )
    q = (
        out.writeStream.format("memory").queryName("cr_null")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = sorted(spark.table("cr_null").collect(), key=lambda r: r["ts"])
    # frames: [1], [1,null], [null,2] — row counts 1,2,2 (batch parity)
    assert [r["range_n"] for r in rows] == [1, 2, 2]
    assert rows[1]["range_sum"] == 1.0  # sum still skips nulls


def test_executor_panes_rejects_discarding_minmax_and_late_trigger(spark, tmp_path):
    from pipeline_spark.streaming.panes import stream_panes_with_state

    src = tmp_path / "rej_in"
    src.mkdir()
    spark.createDataFrame(
        [("a", 1.0, dt.datetime(2024, 1, 1))], "k string, v double, ts timestamp"
    ).write.parquet(str(src / "seed.parquet"))
    sdf = (
        spark.readStream.schema("k string, v double, ts timestamp")
        .parquet(str(src / "seed.parquet"))
    )
    with pytest.raises(NotImplementedError, match="accumulating"):
        stream_panes_with_state(
            sdf, "ts", ["k"], [{"name": "m", "op": "min", "field": "v"}],
            {"window": {"type": "fixed", "size": 1, "unit": "minute"},
             "accumulationMode": "discarding",
             "trigger": {"type": "afterProcessingTime", "delay": 1}},
        )
    with pytest.raises(NotImplementedError, match="lateFiringTrigger"):
        stream_panes_with_state(
            sdf, "ts", ["k"], [{"name": "n", "op": "count"}],
            {"window": {"type": "fixed", "size": 1, "unit": "minute"},
             "trigger": {"type": "afterWatermark",
                         "earlyFiringTrigger": {"type": "afterProcessingTime",
                                                "pastFirstElementDelay": 1},
                         "lateFiringTrigger": {"type": "afterPane",
                                               "elementCountAtLeast": 2}}},
        )
    from pipeline_spark.streaming.panes import _window_params

    with pytest.raises(ValueError, match="size > 0"):
        _window_params({"window": {"type": "fixed"}})


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_executor_panes_first_last_arg_std(spark, tmp_path):
    """r7 (VERDICT r6 ask #6): first/last/argmax/argmin/std on the
    executor backend — single-value champion state and exact incremental
    moments, values matching the batch compiler's min_by/max_by and
    sqrt(M2/(n-ddof)) semantics."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xfla_in", [
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=15))],
        [("a", 4.0, base.replace(second=25)), ("a", 8.0, base.replace(second=35))],
        [("wm", 0.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    out_dir = str(tmp_path / "xfla_out")
    cfg = f"""
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
      window: {{type: fixed, size: 1, unit: minute}}
      allowedLateness: 5
      trigger:
        type: afterWatermark
        earlyFiringTrigger: {{type: afterProcessingTime, pastFirstElementDelay: 1}}
      paneStateBackend: executor
      outputPaneInfo: true
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: fv, op: first, field: v}}
        - {{name: lv, op: last, field: v}}
        - {{name: smallest, op: argmax, field: v, comparingExpression: "10.0 - v"}}
        - {{name: biggest, op: argmin, field: v, comparingExpression: "10.0 - v"}}
        - {{name: sd, op: std, field: v}}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
"""
    run_pipeline(spark, parse_config(cfg))
    rows = [r for r in spark.read.parquet(out_dir).collect() if r["k"] == "a"]
    assert rows
    r = max(rows, key=lambda r: r["__pane__"]["index"])  # final pane
    assert (r["fv"], r["lv"]) == (1.0, 8.0)
    # argmax of (10 - v) is the SMALLEST v; argmin the biggest
    assert (r["smallest"], r["biggest"]) == (1.0, 8.0)
    # stddev_samp([1,2,4,8]) = sqrt((85 - 15^2/4) / 3)
    import math

    assert r["sd"] == pytest.approx(math.sqrt((85 - 225 / 4) / 3), rel=1e-9)


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_executor_panes_first_last_session_merge(spark, tmp_path):
    """Session-window merge carries first/last champion state: a bridging
    event merges two sessions and the merged pane's first/last reflect
    the UNION of both."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xflm_in", [
        [("a", 1.0, base.replace(second=0)), ("a", 8.0, base.replace(second=30))],
        [("a", 4.0, base.replace(second=15))],  # bridges [0,20) and [30,50)
        [("wm", 0.0, dt.datetime(2100, 1, 1))],
    ])
    out_dir = str(tmp_path / "xflm_out")
    cfg = f"""
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
      window: {{type: session, gap: 20, unit: second}}
      allowedLateness: 5
      trigger:
        type: afterWatermark
        earlyFiringTrigger: {{type: afterProcessingTime, pastFirstElementDelay: 1}}
      paneStateBackend: executor
      outputPaneInfo: true
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: n, op: count}}
        - {{name: fv, op: first, field: v}}
        - {{name: lv, op: last, field: v}}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
"""
    run_pipeline(spark, parse_config(cfg))
    rows = [r for r in spark.read.parquet(out_dir).collect() if r["k"] == "a"]
    assert rows
    r = max(rows, key=lambda r: r["__pane__"]["index"])  # merged final pane
    assert (r["n"], r["fv"], r["lv"]) == (3, 1.0, 8.0)


def test_executor_panes_calendar_window(spark, tmp_path):
    """Calendar (day) windows on the executor backend: session-timezone
    truncation, plain-timestamp window column (the batch calendar shape),
    watermark closure per day."""
    in_dir = _write_stream_files(tmp_path, "xcal_in", [
        [("a", 1.0, dt.datetime(2024, 1, 1, 3, 0)),
         ("a", 2.0, dt.datetime(2024, 1, 1, 20, 0))],
        [("a", 4.0, dt.datetime(2024, 1, 2, 5, 0)),
         ("wm", 0.0, dt.datetime(2100, 1, 1))],
    ])
    out_dir = str(tmp_path / "xcal_out")
    cfg = _exec_backend_cfg(in_dir, out_dir, "accumulating").replace(
        "window: {type: fixed, size: 1, unit: minute}",
        "window: {type: calendar, unit: day}",
    )
    run_pipeline(spark, parse_config(cfg))
    rows = spark.read.parquet(out_dir).collect()
    a = {}
    for r in rows:
        if r["k"] != "a":
            continue
        key = r["window"]
        a[key] = max(
            a.get(key, (-1, 0, 0.0)),
            (r["__pane__"]["index"], r["n"], r["total"]),
            key=lambda t: t[0],
        )
    days = {str(k): (v[1], v[2]) for k, v in a.items()}
    assert days == {
        "2024-01-01 00:00:00": (2, 3.0),
        "2024-01-02 00:00:00": (1, 4.0),
    }, days


def test_executor_panes_session_window(spark, tmp_path):
    """Session windows on the executor backend: events within the gap
    merge (accumulators + trigger state combine), a quiet period starts a
    new session, watermark closes sessions at last-activity + gap —
    Spark's own session_window merge semantics."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xsw_in", [
        # session 1: 0s,8s (within the 10s gap)
        [("a", 1.0, base.replace(second=0)), ("a", 2.0, base.replace(second=8))],
        # 30s: > gap after 8s → NEW session; 35s extends it
        [("a", 4.0, base.replace(second=30)), ("a", 8.0, base.replace(second=35))],
        # 15s is within the gap of session 1's last event (8s) → MERGES
        # into it, extending to [0, 25); it is 15s before 30s (> gap), so
        # the second session stays separate — Spark's session_window rule
        [("a", 16.0, base.replace(second=15))],
        [("wm", 0.0, dt.datetime(2100, 1, 1))],
    ])
    out_dir = str(tmp_path / "xsw_out")
    cfg = _exec_backend_cfg(in_dir, out_dir, "accumulating").replace(
        "window: {type: fixed, size: 1, unit: minute}",
        "window: {type: session, gap: 10, unit: second}",
    )
    run_pipeline(spark, parse_config(cfg))
    rows = [r for r in spark.read.parquet(out_dir).collect() if r["k"] == "a"]
    final = {}
    for r in rows:
        key = (r["window"]["start"], r["window"]["end"])
        cur = final.get(key)
        if cur is None or r["__pane__"]["index"] > cur[0]:
            final[key] = (r["__pane__"]["index"], r["n"], r["total"])
    # final sessions: merged [0, 25) n=3 total=19, separate [30, 45)
    sessions = {
        (k[0], k[1]): (v[1], v[2]) for k, v in final.items()
    }
    assert sessions[(base, base.replace(second=25))] == (3, 19.0), sessions
    assert sessions[
        (base.replace(second=30), base.replace(second=45))
    ] == (2, 12.0), sessions
    # the pre-merge EARLY pane of session 1 ([0, 18)) is also present —
    # the pane of the session as known at firing time
    assert sessions.get((base, base.replace(second=18))) == (2, 3.0)


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_executor_panes_compiled_aggregations(spark, tmp_path):
    """r6 (VERDICT r5 ask #6): condition / expression / weighted-avg
    aggregations on the EXECUTOR pane backend — compiled to derived JVM
    columns upstream of the stateful operator, values matching the batch
    compiler's filtered-aggregate / sum(v*w)/sum(w) semantics."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xca_in", [
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=15))],
        [("a", 4.0, base.replace(second=25))],
        [("a", 8.0, base.replace(second=35)),
         ("wm", 1.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    out_dir = str(tmp_path / "xca_out")
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
      window: {{type: fixed, size: 1, unit: minute}}
      allowedLateness: 5
      trigger:
        type: afterWatermark
        earlyFiringTrigger: {{type: afterProcessingTime, pastFirstElementDelay: 1}}
      paneStateBackend: executor
      accumulationMode: accumulating
      outputPaneInfo: true
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: cn, op: count, condition: {{key: v, op: ">", value: 2}}}}
        - {{name: es, op: sum, expression: "v * 2"}}
        - {{name: wa, op: avg, field: v, weightField: v}}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
"""))
    rows = spark.read.parquet(out_dir).collect()
    a_panes = sorted(
        (r for r in rows if r["k"] == "a"), key=lambda r: r["__pane__"]["index"]
    )
    final = a_panes[-1]
    # v = 1,2,4,8: condition v>2 counts 2; sum(v*2)=30; wavg=sum(v*v)/sum(v)
    assert final["cn"] == 2
    assert final["es"] == 30.0
    assert abs(final["wa"] - 85.0 / 15.0) < 1e-9
    # the early panes accumulate consistently (batch 1: v=1,2)
    first = a_panes[0]
    assert first["cn"] == 0 and first["es"] == 6.0
    assert abs(first["wa"] - 5.0 / 3.0) < 1e-9


def test_streaming_count_range_offset_matches_batch_window(spark, tmp_path):
    """r6 (VERDICT r5 ask #9): streaming count-range WITH offset must
    match the batch Window compiler's rowsBetween(-(offset+N-1), -offset)
    frame row-for-row — head rows whose frame precedes the key's first
    row emit count 0 / null aggregates like the clipped batch frame."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pipeline_spark.compilers.stateful import apply_stateful_select
    from pipeline_spark.streaming.state import streaming_count_range_select

    rng = __import__("random").Random(29)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for seq in range(60):
        k = rng.choice(["a", "b", "c"])
        rows.append((k, float(rng.randint(-50, 50)), base + dt.timedelta(seconds=seq)))
    in_dir = tmp_path / "cro_in"
    in_dir.mkdir()
    for i in range(3):
        chunk = rows[i * 20 : (i + 1) * 20]
        tbl = pa.table({
            "k": pa.array([r[0] for r in chunk]),
            "v": pa.array([r[1] for r in chunk]),
            "ts": pa.array([r[2] for r in chunk], pa.timestamp("us")),
        })
        f = in_dir / f"b{i}.parquet"
        pq.write_table(tbl, str(f))
        mt = _time.time() - 100 + i * 10
        os.utime(f, (mt, mt))

    N, OFF = 4, 2
    sdf = (
        spark.readStream.schema("k string, v double, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1).parquet(str(in_dir))
    )
    stream_out = streaming_count_range_select(
        sdf, ["k"], "v", N, "ts", [("k", "k"), ("ts", "ts")],
        [("range_n", "count"), ("range_sum", "sum"), ("range_min", "min"),
         ("range_max", "max"), ("range_avg", "avg")],
        offset=OFF,
    )
    q = (
        stream_out.writeStream.format("memory").queryName("cro_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cro_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["k"], r["ts"]): (r["range_n"], r["range_sum"], r["range_min"],
                            r["range_max"], r["range_avg"])
        for r in spark.table("cro_stream").collect()
    }

    bdf = spark.read.parquet(str(in_dir))
    spec = {"count": N, "offset": OFF}
    batch = apply_stateful_select(
        bdf,
        [
            {"name": "k", "field": "k"},
            {"name": "ts", "field": "ts"},
            {"name": "range_n", "func": "count", "field": "v", "range": spec},
            {"name": "range_sum", "func": "sum", "field": "v", "range": spec},
            {"name": "range_min", "func": "min", "field": "v", "range": spec},
            {"name": "range_max", "func": "max", "field": "v", "range": spec},
            {"name": "range_avg", "func": "avg", "field": "v", "range": spec},
        ],
        "ts",
        ["k"],
    ).collect()
    assert len(batch) == len(got) == 60
    null_frames = 0
    for r in batch:
        s = got[(r["k"], r["ts"])]
        assert s[0] == r["range_n"], (r, s)
        for j, col in enumerate(
            ("range_sum", "range_min", "range_max", "range_avg"), start=1
        ):
            if r[col] is None:
                null_frames += 1
                assert s[j] is None, (col, r, s)
            else:
                assert s[j] == pytest.approx(r[col]), (col, r, s)
    assert null_frames > 0  # the head rows genuinely exercised empty frames


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_executor_panes_buffered_ops_opt_in(spark, tmp_path):
    """r11 (VERDICT r10 missing #3): exact median / percentile /
    array_agg / count_distinct on the EXECUTOR pane backend, opt-in via
    strategy.paneAllowUnboundedState (keyed state buffers the window's
    elements — the cost Beam's exact combiners pay).  Values must match
    the exact batch semantics (F.median / F.percentile interpolation /
    collect_list / count_distinct)."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xbuf_in", [
        [("a", 1.0, base.replace(second=5)), ("a", 2.0, base.replace(second=10))],
        [("a", 4.0, base.replace(second=20)), ("a", 8.0, base.replace(second=25))],
        [("a", 8.0, base.replace(second=40))],
        [("wm", 0.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    out_dir = str(tmp_path / "xbuf_out")
    cfg = f"""
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
      window: {{type: fixed, size: 1, unit: minute}}
      allowedLateness: 5
      trigger:
        type: afterWatermark
        earlyFiringTrigger: {{type: afterProcessingTime, pastFirstElementDelay: 1}}
      accumulationMode: accumulating
      paneStateBackend: executor
      paneAllowUnboundedState: true
      outputPaneInfo: true
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: med, op: median, field: v}}
        - {{name: p25, op: percentile, field: v, percentile: 0.25}}
        - {{name: vals, op: array_agg, field: v}}
        - {{name: uniq, op: array_agg, field: v, distinct: true}}
        - {{name: nd, op: count_distinct, field: v}}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
"""
    run_pipeline(spark, parse_config(cfg))
    rows = [r for r in spark.read.parquet(out_dir).collect() if r["k"] == "a"]
    r = max(rows, key=lambda r: r["__pane__"]["index"])  # final pane
    # sorted buffer [1,2,4,8,8]: median 4.0, p25 rank (5-1)*.25=1 -> 2.0
    assert r["med"] == 4.0 and r["p25"] == 2.0
    assert sorted(r["vals"]) == [1.0, 2.0, 4.0, 8.0, 8.0]
    assert sorted(r["uniq"]) == [1.0, 2.0, 4.0, 8.0]
    assert r["nd"] == 4


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_executor_panes_buffered_ops_skip_nulls(spark, tmp_path):
    """r12 (ADVICE): nulls in a float column reach the buffered insert
    loop as pandas NaN; batch collect_list / count_distinct skip nulls,
    and NaN hashes by identity (py3.10+) so buffering it would count
    EVERY null row as a new distinct value.  array_agg / count_distinct
    must skip them like median/percentile already did."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    in_dir = _write_stream_files(tmp_path, "xnull_in", [
        [("a", 1.0, base.replace(second=5)), ("a", None, base.replace(second=10))],
        [("a", None, base.replace(second=20)), ("a", 2.0, base.replace(second=25))],
        [("wm", 0.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    out_dir = str(tmp_path / "xnull_out")
    cfg = f"""
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
      window: {{type: fixed, size: 1, unit: minute}}
      allowedLateness: 5
      trigger:
        type: afterWatermark
        earlyFiringTrigger: {{type: afterProcessingTime, pastFirstElementDelay: 1}}
      accumulationMode: accumulating
      paneStateBackend: executor
      paneAllowUnboundedState: true
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: vals, op: array_agg, field: v}}
        - {{name: nd, op: count_distinct, field: v}}
        - {{name: med, op: median, field: v}}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {out_dir}
      availableNow: true
"""
    run_pipeline(spark, parse_config(cfg))
    rows = [r for r in spark.read.parquet(out_dir).collect() if r["k"] == "a"]
    r = max(rows, key=lambda r: len(r["vals"]))  # final (accumulated) pane
    assert sorted(r["vals"]) == [1.0, 2.0]
    assert r["nd"] == 2
    assert r["med"] == 1.5


def test_executor_panes_buffered_refuses_without_opt_in(spark):
    from pipeline_spark.streaming.panes import parse_exec_aggs

    df = spark.createDataFrame([(1.0, "a")], "v double, k string")
    for op in ("median", "percentile", "array_agg", "count_distinct"):
        with pytest.raises(NotImplementedError, match="paneAllowUnboundedState"):
            parse_exec_aggs([{"name": "x", "op": op, "field": "v"}], df)
    # with the opt-in they parse
    _, aggs = parse_exec_aggs(
        [{"name": "x", "op": "median", "field": "v"},
         {"name": "q", "op": "percentile", "field": "v", "percentile": 0.9}],
        df, allow_unbounded=True,
    )
    assert [a[1] for a in aggs] == ["median", "percentile"]
    assert aggs[1][2][1] == 0.9


def test_winstate_merge_buffered():
    """Session-window merge combines buffers and distinct sets."""
    from pipeline_spark.streaming.panes import _WinState

    a, b = _WinState(0.0), _WinState(0.0)
    a.bufs["m"] = [1.0, 2.0]
    b.bufs["m"] = [3.0]
    a.sets["d"] = {1: None, 2: None}
    b.sets["d"] = {2: None, 5: None}
    a.merge_from(b)
    assert a.bufs["m"] == [1.0, 2.0, 3.0]
    assert list(a.sets["d"]) == [1, 2, 5]


def test_await_termination_timeout_does_not_flush():
    """r12 (review find): awaitTermination(timeout) returning False means
    the query is STILL RUNNING — flushing the withheld panes then would
    emit the tail mid-stream and re-fire it at the real drain."""
    from pipeline_spark.streaming.triggers import _EarlyFiringRun

    calls = []

    class _FakeQuery:
        def __init__(self):
            self.results = [False, False, True]

        def awaitTermination(self, *a, **kw):
            return self.results.pop(0)

    run = _EarlyFiringRun(_FakeQuery(), lambda: calls.append(1))
    assert run.awaitTermination(5) is False
    assert run.awaitTermination(5) is False
    assert not calls, "flushed while the query was still running"
    assert run.awaitTermination() is True
    assert calls == [1]


def test_stateful_select_unknown_field_is_loud(spark):
    """r12 (review find): a typo'd range-function field fails at PLAN
    time with the column list, not as a KeyError inside an executor."""
    import pytest as _pytest

    from pipeline_spark.streaming.state import streaming_stateful_select

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with _pytest.raises(ValueError, match="unknown field 'amont'"):
        streaming_stateful_select(
            df,
            [{"name": "s", "func": "sum", "field": "amont",
              "range": {"count": 3}}],
            "v", ["k"],
        )
