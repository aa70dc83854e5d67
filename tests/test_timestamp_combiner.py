"""strategy.window.timestampCombiner (Strategy.java:72-74,129): which
event time a windowed-aggregation row carries downstream — the
two-stage-windowing knob.  end_of_window = Beam's maxTimestamp
(window.end - 1ms, so the row re-windows into its OWN window);
earliest/latest = min/max input event time.  Covers the batch path,
calendar windows, multi-input merge, the executor pane backend, and
the plan-time validation gates."""

import datetime as dt

import pytest

from pipeline_spark.config import parse_config
from pipeline_spark.executor import run_pipeline

BASE = dt.datetime(2024, 1, 1, 0, 0)


@pytest.fixture()
def batch_input(spark, tmp_path):
    rows = [
        ("a", 1.0, BASE.replace(second=5)),
        ("a", 2.0, BASE.replace(second=40)),
        ("b", 4.0, BASE.replace(second=20)),
        ("a", 8.0, BASE.replace(minute=1, second=10)),
        ("b", 16.0, BASE.replace(minute=1, second=50)),
    ]
    df = spark.createDataFrame(rows, "k string, v double, ts timestamp")
    path = str(tmp_path / "tsc_in")
    df.coalesce(1).write.parquet(path)
    return path


def _agg_cfg(in_path, combiner, extra_transforms=""):
    return f"""
sources:
  - name: events
    module: storage
    parameters:
      format: parquet
      input: {in_path}
transforms:
  - name: agg
    module: aggregation
    inputs: [events]
    timestampAttribute: ts
    strategy:
      window: {{type: fixed, size: 1, unit: minute, timestampCombiner: {combiner}}}
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: n, op: count}}
        - {{name: total, op: sum, field: v}}
{extra_transforms}
"""


def test_end_of_window(spark, batch_input):
    outs = run_pipeline(spark, parse_config(_agg_cfg(batch_input, "end_of_window")))
    rows = {(r["k"], r["window"]["start"].minute): r for r in outs["agg"].collect()}
    assert set(rows) == {("a", 0), ("b", 0), ("a", 1), ("b", 1)}
    for (k, minute), r in rows.items():
        assert r["ts"] == r["window"]["end"] - dt.timedelta(milliseconds=1)
    assert rows[("a", 0)]["total"] == 3.0


def test_earliest_and_latest(spark, batch_input):
    for combiner, expect in [
        ("earliest", {("a", 0): 5, ("b", 0): 20, ("a", 1): 70, ("b", 1): 110}),
        ("latest", {("a", 0): 40, ("b", 0): 20, ("a", 1): 70, ("b", 1): 110}),
    ]:
        outs = run_pipeline(spark, parse_config(_agg_cfg(batch_input, combiner)))
        got = {
            (r["k"], r["window"]["start"].minute): int((r["ts"] - BASE).total_seconds())
            for r in outs["agg"].collect()
        }
        assert got == expect, combiner
        # hidden min/max aggregate is dropped from the output schema
        assert not [c for c in outs["agg"].columns if c.startswith("__tsc")]


def test_two_stage_rewindow(spark, batch_input):
    """The actual two-stage pattern: minutely agg -> re-window hourly on
    the combined timestamp.  end_of_window keeps each minutely row inside
    the hour that contains its window (the -1ms matters: without it the
    minute-59 row would leak into the next hour)."""
    second_stage = """
  - name: agg2
    module: aggregation
    inputs: [agg]
    timestampAttribute: ts
    strategy:
      window: {type: fixed, size: 1, unit: hour}
    parameters:
      groupFields: [k]
      aggregations:
        - {name: windows, op: count}
        - {name: grand, op: sum, field: total}
"""
    outs = run_pipeline(
        spark,
        parse_config(_agg_cfg(batch_input, "end_of_window", second_stage)),
    )
    rows = {r["k"]: r for r in outs["agg2"].collect()}
    assert rows["a"]["window"]["start"] == BASE
    assert (rows["a"]["windows"], rows["a"]["grand"]) == (2, 11.0)
    assert (rows["b"]["windows"], rows["b"]["grand"]) == (2, 20.0)


def test_calendar_end_of_window(spark, tmp_path):
    rows = [
        ("a", 1.0, dt.datetime(2024, 1, 1, 5, 0)),
        ("a", 2.0, dt.datetime(2024, 1, 2, 23, 59)),
    ]
    path = str(tmp_path / "tsc_cal")
    spark.createDataFrame(rows, "k string, v double, ts timestamp").write.parquet(path)
    cfg = _agg_cfg(path, "end_of_window").replace(
        "{type: fixed, size: 1, unit: minute,",
        "{type: calendar, unit: day,",
    )
    outs = run_pipeline(spark, parse_config(cfg))
    got = {r["window"].day: r["ts"] for r in outs["agg"].collect()}
    assert got[1] == dt.datetime(2024, 1, 2) - dt.timedelta(milliseconds=1)
    assert got[2] == dt.datetime(2024, 1, 3) - dt.timedelta(milliseconds=1)


def test_multi_input_earliest(spark, tmp_path):
    """Per-input hidden min aggregates merge with least() across the
    full-outer multi-input join (nulls skipped)."""
    a = [("k1", 1.0, BASE.replace(second=30))]
    b = [("k1", 2.0, BASE.replace(second=10)), ("k2", 3.0, BASE.replace(second=50))]
    pa_ = str(tmp_path / "mi_a")
    pb = str(tmp_path / "mi_b")
    spark.createDataFrame(a, "k string, v double, ts timestamp").write.parquet(pa_)
    spark.createDataFrame(b, "k string, v double, ts timestamp").write.parquet(pb)
    cfg = f"""
sources:
  - name: ina
    module: storage
    parameters: {{format: parquet, input: {pa_}}}
  - name: inb
    module: storage
    parameters: {{format: parquet, input: {pb}}}
transforms:
  - name: agg
    module: aggregation
    inputs: [ina, inb]
    timestampAttribute: ts
    strategy:
      window: {{type: fixed, size: 1, unit: minute, timestampCombiner: earliest}}
    parameters:
      groupFields: [k]
      aggregations:
        - input: ina
          fields:
            - {{name: na, op: count}}
        - input: inb
          fields:
            - {{name: nb, op: count}}
"""
    outs = run_pipeline(spark, parse_config(cfg))
    got = {r["k"]: int((r["ts"] - BASE).total_seconds()) for r in outs["agg"].collect()}
    # k1 appears in both inputs: earliest across inputs = 10; k2 only in b
    assert got == {"k1": 10, "k2": 50}


def test_validation_gates(spark, batch_input):
    with pytest.raises(ValueError, match="timestampCombiner must be one of"):
        run_pipeline(spark, parse_config(_agg_cfg(batch_input, "erliest")))
    # global window: no per-window timestamp to combine
    cfg = _agg_cfg(batch_input, "x").replace(
        "window: {type: fixed, size: 1, unit: minute, timestampCombiner: x}",
        "window: {type: global, timestampCombiner: latest}",
    )
    with pytest.raises(ValueError, match="non-global window"):
        run_pipeline(spark, parse_config(cfg))
    # pivot + earliest would expand the hidden aggregate per pivot value
    cfg = _agg_cfg(batch_input, "earliest").replace(
        "groupFields: [k]", "groupFields: []\n      pivot: {field: k}"
    )
    with pytest.raises(ValueError, match="pivot"):
        run_pipeline(spark, parse_config(cfg))
    # rollup/cube subtotal rows carry a NULL window — no event time to
    # derive (ADVICE r14); refused for EVERY combiner, not just
    # earliest/latest (end_of_window would be NULL on subtotals too)
    for combiner in ("end_of_window", "earliest"):
        for gtype in ("rollup", "cube"):
            cfg = _agg_cfg(batch_input, combiner).replace(
                "groupFields: [k]",
                f"groupFields: [k]\n      groupType: {gtype}",
            )
            with pytest.raises(ValueError, match="rollup/cube"):
                run_pipeline(spark, parse_config(cfg))


def test_ledger_engages_matches_run_batch_passthrough():
    """ADVICE r14: the aggregation-side earliest/latest guard and the
    sink's pass-through rule share ONE predicate (ledger_engages /
    trigger_gates) — assert it over the strategy grid so a future rule
    change that forgets one side fails here."""
    from pipeline_spark.streaming.triggers import (
        ledger_engages,
        parse_trigger,
        trigger_gates,
    )

    strategies = [
        # no trigger at all: the ledger sink path never runs
        ({}, False),
        ({"accumulationMode": "discarding"}, False),
        # plain accumulating processing-time early firing: pass-through
        ({"trigger": {"type": "afterWatermark", "earlyFiringTrigger": {
            "type": "afterProcessingTime", "delay": 1}}}, False),
        # discarding engages the ledger
        ({"accumulationMode": "discarding",
          "trigger": {"type": "afterWatermark", "earlyFiringTrigger": {
              "type": "afterProcessingTime", "delay": 1}}}, True),
        # outputPaneInfo engages
        ({"outputPaneInfo": True,
          "trigger": {"type": "afterWatermark", "earlyFiringTrigger": {
              "type": "afterProcessingTime", "delay": 1}}}, True),
        # count trigger engages
        ({"trigger": {"type": "afterWatermark", "earlyFiringTrigger": {
            "type": "afterPane", "elementCountAtLeast": 2}}}, True),
        # composite tree engages
        ({"trigger": {"type": "afterWatermark", "earlyFiringTrigger": {
            "type": "afterFirst", "childrenTriggers": [
                {"type": "afterProcessingTime", "delay": 1},
                {"type": "afterPane", "elementCountAtLeast": 3}]}}}, True),
        # late-firing tree engages
        ({"trigger": {"type": "afterWatermark",
                      "earlyFiringTrigger": {
                          "type": "afterProcessingTime", "delay": 1},
                      "lateFiringTrigger": {
                          "type": "afterPane", "elementCountAtLeast": 1}}},
         True),
        # final trigger engages
        ({"trigger": {"type": "afterProcessingTime", "delay": 1,
                      "finalTrigger": {"type": "afterPane",
                                       "elementCountAtLeast": 5}}}, True),
    ]
    for strategy, want in strategies:
        assert ledger_engages(strategy) is want, strategy
        # the sink derives ledger_gates via trigger_gates on the same
        # parsed cfg — mirror the derivation at sink-arg granularity
        cfg = parse_trigger(strategy)
        if cfg is not None:
            sink_gates = trigger_gates({
                "early_count": cfg.get("early_count"),
                "tree": cfg.get("tree"),
                "late_tree": cfg.get("late_tree"),
                "final_tree": cfg.get("final_tree"),
            })
            mode = str(
                strategy.get("accumulationMode", "accumulating")
            ).lower()
            passthrough = not (
                mode in ("discarding", "discarding_fired_panes")
                or bool(strategy.get("outputPaneInfo", False))
                or sink_gates
            )
            assert passthrough is (not want), strategy


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_executor_pane_backend_combiner(spark, tmp_path):
    """The executor pane backend threads the combiner through its keyed
    state: latest = hidden max over event time; end_of_window derives
    from the emitted window struct."""
    from tests.test_streaming import _write_stream_files

    in_dir = _write_stream_files(tmp_path, "tsc_exec_in", [
        [("a", 1.0, BASE.replace(second=5)), ("a", 2.0, BASE.replace(second=15))],
        [("a", 4.0, BASE.replace(second=25)),
         ("z", 1.0, dt.datetime(2100, 1, 1, 0, 0, 5))],
    ])
    for combiner, expect_a in [
        ("latest", BASE.replace(second=25)),
        ("end_of_window", BASE.replace(minute=1) - dt.timedelta(milliseconds=1)),
    ]:
        out_dir = str(tmp_path / f"tsc_exec_out_{combiner}")
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
      window: {{type: fixed, size: 1, unit: minute, timestampCombiner: {combiner}}}
      allowedLateness: 5
      trigger:
        type: afterWatermark
        earlyFiringTrigger: {{type: afterProcessingTime, pastFirstElementDelay: 1}}
      paneStateBackend: executor
      accumulationMode: accumulating
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
        run_pipeline(spark, parse_config(cfg))
        rows = [r for r in spark.read.parquet(out_dir).collect() if r["k"] == "a"]
        assert rows, combiner
        final = max(rows, key=lambda r: r["n"])
        assert final["n"] == 3 and final["total"] == 7.0
        assert final["ts"] == expect_a, combiner
        assert not [c for c in spark.read.parquet(out_dir).columns
                    if c.startswith("__tsc")]


def test_discarding_earliest_refused(spark, tmp_path):
    from tests.test_streaming import _write_stream_files

    in_dir = _write_stream_files(tmp_path, "tsc_disc_in", [
        [("a", 1.0, BASE.replace(second=5))],
    ])
    cfg = f"""
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
      window: {{type: fixed, size: 1, unit: minute, timestampCombiner: earliest}}
      trigger:
        type: afterWatermark
        earlyFiringTrigger: {{type: afterProcessingTime, pastFirstElementDelay: 1}}
      paneStateBackend: executor
      accumulationMode: discarding
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: n, op: count}}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {tmp_path}/tsc_disc_out
      availableNow: true
"""
    with pytest.raises(ValueError, match="discarding"):
        run_pipeline(spark, parse_config(cfg))


def test_driver_ledger_earliest_refused(spark, tmp_path):
    """r14 review find: on the DEFAULT driver pane-ledger path the
    derived earliest/latest event-time column varies per firing and
    would split pane identity (split_pane_columns keys every
    non-numeric column) — refused loudly; end_of_window (window-
    constant) and the executor backend remain the supported routes."""
    from tests.test_streaming import _write_stream_files

    in_dir = _write_stream_files(tmp_path, "tsc_drv_in", [
        [("a", 1.0, BASE.replace(second=5))],
    ])
    cfg = f"""
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
      window: {{type: fixed, size: 1, unit: minute, timestampCombiner: latest}}
      trigger:
        type: afterWatermark
        earlyFiringTrigger: {{type: afterPane, elementCountAtLeast: 2}}
      accumulationMode: accumulating
    parameters:
      groupFields: [k]
      aggregations:
        - {{name: n, op: count}}
sinks:
  - name: out
    module: storage
    inputs: [agg]
    parameters:
      format: parquet
      output: {tmp_path}/tsc_drv_out
      availableNow: true
"""
    with pytest.raises(ValueError, match="pane identity"):
        run_pipeline(spark, parse_config(cfg))
