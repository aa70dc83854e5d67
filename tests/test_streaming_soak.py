"""Streaming state-soak tests (r13, VERDICT r12 stretch #9).

The r12 review found an eviction leak — a window whose LAST firing was
a clean EARLY pane lingered in the state store forever and re-armed its
key's timer on every watermark advance (streaming/panes.py:851-868) —
plus a DST-ambiguity path that produced NaT-keyed windows that never
close.  These soaks would have caught both: long synthetic streams
(hundreds of micro-batches, early firings every batch, DST-crossing
timestamps, tumbling/session/calendar windows) with a HARD assertion on
the state store's final row count from the query's own progress
metrics.  A leak scales with windows TOUCHED (hundreds); correct
eviction scales with windows still OPEN at the final watermark (a
handful per key).
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow  # r16: fast-tier default deselects (see pyproject)

from pipeline_spark.streaming.panes import stream_panes_with_state


def _write_batches(tmp_path, name, batches):
    in_dir = tmp_path / name
    in_dir.mkdir()
    for i, rows in enumerate(batches):
        tbl = pa.table({
            "k": pa.array([r[0] for r in rows]),
            "v": pa.array([float(r[1]) for r in rows], pa.float64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        })
        f = in_dir / f"b{i:05d}.parquet"
        pq.write_table(tbl, str(f))
        mt = time.time() - 10_000 + i * 10
        os.utime(f, (mt, mt))
    return str(in_dir)


def _drain(spark, tmp_path, in_dir, strategy, qname, lateness_sec=5,
           aggs=None):
    sdf = (
        spark.readStream.schema("k string, v double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    ).withWatermark("ts", f"{lateness_sec} seconds")
    out = stream_panes_with_state(
        sdf, "ts", ["k"],
        aggs or [{"name": "n", "op": "count"},
                 {"name": "total", "op": "sum", "field": "v"}],
        strategy,
    )
    # hundreds of micro-batches x per-partition state tasks dominate the
    # soak's wall-clock; 2 state partitions (baked into the fresh
    # checkpoint) keep it a few minutes instead of ten
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            out.writeStream.format("memory").queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"{qname}_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    state_rows = None
    # recentProgress is capped (default 100 entries) — batch count comes
    # from the last batchId; state rows from the newest progress entry
    # that carries stateOperators
    batches = (q.lastProgress or {}).get("batchId", -1) + 1
    for prog in reversed(q.recentProgress):
        ops = prog.get("stateOperators") or []
        if ops:
            state_rows = ops[0].get("numRowsTotal")
            break
    return spark.table(qname), state_rows, batches


def test_soak_tumbling_early_firings_state_bounded(spark, tmp_path):
    """200 micro-batches, early firing every batch (the leak scenario:
    most windows' final firing is a clean EARLY pane), 4 keys, ~67
    one-minute windows touched per key.  Final state must hold only the
    windows still open at the last watermark — single digits per key —
    not the ~270 key-windows the stream touched."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    keys = ["a", "b", "c", "d"]
    batches = []
    for i in range(200):
        ts = base + dt.timedelta(seconds=20 * i)
        batches.append([
            (keys[i % 4], 1.0, ts),
            (keys[(i + 1) % 4], 2.0, ts + dt.timedelta(seconds=3)),
        ])
    in_dir = _write_batches(tmp_path, "soak_tumble", batches)
    strategy = {
        "window": {"type": "fixed", "size": 1, "unit": "minute"},
        "allowedLateness": 5,
        "trigger": {
            "type": "afterWatermark",
            "earlyFiringTrigger": {
                "type": "afterProcessingTime", "pastFirstElementDelay": 1,
            },
        },
        "accumulationMode": "accumulating",
        "outputPaneInfo": True,
    }
    out, state_rows, n_batches = _drain(
        spark, tmp_path, in_dir, strategy, "soak_t")
    assert n_batches >= 200, f"expected 1 file per trigger, got {n_batches}"
    rows = out.collect()
    # every touched window eventually fired, none with a null window key
    assert all(r["window"] is not None for r in rows)
    # with an every-batch early trigger, a window's final accumulation
    # leaves in its last EARLY pane and the window evicts WITHOUT an
    # empty duplicate ON_TIME (the r12 eviction fix) — so coverage is
    # asserted over all panes, not ON_TIME ones
    assert len({(r["k"], str(r["window"]["start"])) for r in rows}) > 200
    assert {r["__pane__"]["timing"] for r in rows} <= {"EARLY", "ON_TIME"}
    assert state_rows is not None
    # open windows at final watermark: ≤2 per key (+slack); a leak of
    # clean-EARLY windows would leave hundreds
    assert state_rows <= 4 * 6, f"state store leaked: {state_rows} rows"


def test_soak_session_windows_state_bounded(spark, tmp_path):
    """Session windows (merge-heavy state): 150 batches, bursts split by
    gaps so sessions continuously open, merge, and close.  Bounded final
    state = only the sessions the final watermark hasn't sealed."""
    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    batches = []
    for i in range(150):
        # bursts of 3 batches 5 s apart, then a 60 s gap (session gap 20 s)
        burst, pos = divmod(i, 3)
        ts = base + dt.timedelta(seconds=burst * 75 + pos * 5)
        batches.append([("s1", 1.0, ts), ("s2", 1.0, ts)])
    in_dir = _write_batches(tmp_path, "soak_sess", batches)
    strategy = {
        "window": {"type": "session", "gap": 20, "unit": "second"},
        "allowedLateness": 5,
        "accumulationMode": "accumulating",
        "outputPaneInfo": True,
    }
    out, state_rows, _ = _drain(spark, tmp_path, in_dir, strategy, "soak_s")
    rows = out.collect()
    # 50 sealed sessions per key (the last may stay open)
    per_key = {}
    for r in rows:
        per_key.setdefault(r["k"], set()).add(r["window"]["start"])
    assert all(len(v) >= 49 for v in per_key.values()), {
        k: len(v) for k, v in per_key.items()}
    # each burst is 3 batches x 1 row -> merged session of n=3
    assert all(r["n"] == 3 for r in rows)
    assert state_rows is not None and state_rows <= 2 * 4, state_rows


def test_soak_calendar_dst_crossing_state_bounded(spark, tmp_path):
    """Calendar (day) windows in a DST timezone, timestamps crossing the
    US fall-back (2024-11-03: 01:xx local occurs twice).  The r12 bug:
    ambiguous timestamps tz_localize'd to NaT -> NaN-keyed windows that
    never close.  Assert every window key is a real date and state stays
    bounded."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        base = dt.datetime(2024, 11, 1, 22, 0, 0)  # local naive
        batches = []
        for i in range(90):
            # 1-hour steps local-naive: walks straight through the
            # repeated 01:00-02:00 hour on Nov 3
            ts = base + dt.timedelta(hours=i)
            batches.append([("d1", 1.0, ts)])
        in_dir = _write_batches(tmp_path, "soak_dst", batches)
        strategy = {
            "window": {"type": "calendar", "size": 1, "unit": "day"},
            "allowedLateness": 5,
            "accumulationMode": "accumulating",
            "outputPaneInfo": True,
        }
        out, state_rows, _ = _drain(
            spark, tmp_path, in_dir, strategy, "soak_d", lateness_sec=5)
        rows = out.collect()
        assert rows, "no calendar windows fired"
        assert all(r["window"] is not None for r in rows), (
            "NaT/NaN-keyed calendar window escaped")
        days = {r["window"].date() for r in rows}
        # Nov 1 .. Nov 5 local days covered, each exactly once ON_TIME
        assert dt.date(2024, 11, 3) in days
        on_time = [r for r in rows if r["__pane__"]["timing"] == "ON_TIME"]
        assert len({r["window"] for r in on_time}) >= 3
        # Nov 3 has 25 local hours; its count must include the repeated
        # ambiguous hour (a NaT drop would lose rows)
        by_day = {r["window"].date(): r["n"] for r in on_time}
        assert by_day.get(dt.date(2024, 11, 3)) == 25, by_day
        assert state_rows is not None and state_rows <= 4, state_rows
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_soak_sliding_windows_state_bounded(spark, tmp_path):
    """Sliding windows multiply state (each row joins size/period
    windows — here 4); eviction must still track only the windows open
    at the final watermark, not the ~4x touched set."""
    base = dt.datetime(2024, 2, 1, 0, 0, 0)
    batches = []
    for i in range(120):
        ts = base + dt.timedelta(seconds=15 * i)
        batches.append([("w1", 1.0, ts), ("w2", 2.0, ts)])
    in_dir = _write_batches(tmp_path, "soak_slide", batches)
    strategy = {
        "window": {"type": "sliding", "size": 120, "period": 30,
                   "unit": "second"},
        "allowedLateness": 5,
        "accumulationMode": "accumulating",
        "outputPaneInfo": True,
    }
    out, state_rows, _ = _drain(spark, tmp_path, in_dir, strategy, "soak_sl")
    rows = out.collect()
    assert all(r["window"] is not None for r in rows)
    on_time = [r for r in rows if r["__pane__"]["timing"] == "ON_TIME"]
    # ~60 sliding windows closed per key
    per_key = {}
    for r in on_time:
        per_key.setdefault(r["k"], set()).add(str(r["window"]["start"]))
    assert all(len(v) >= 50 for v in per_key.values()), {
        k: len(v) for k, v in per_key.items()}
    # full interior windows hold size/period * rows-per-period = 8 rows
    full = [r for r in on_time if r["n"] == 8]
    assert len(full) >= 80
    # open at final watermark: ≤ size/period + 1 per key (+slack)
    assert state_rows is not None and state_rows <= 2 * 8, state_rows


def test_soak_tumbling_combiner_state_bounded(spark, tmp_path):
    """r14: the timestampCombiner's hidden event-time max aggregate adds
    one keyed-state field per window (the aggregation module injects it
    as a max agg over ts) — soak it exactly like the plain tumbling run
    and hold the same state bound, plus the emitted combined timestamp
    must sit inside its own window."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    keys = ["a", "b", "c", "d"]
    batches = []
    for i in range(150):
        ts = base + dt.timedelta(seconds=20 * i)
        batches.append([
            (keys[i % 4], 1.0, ts),
            (keys[(i + 1) % 4], 2.0, ts + dt.timedelta(seconds=3)),
        ])
    in_dir = _write_batches(tmp_path, "soak_tsc", batches)
    strategy = {
        "window": {"type": "fixed", "size": 1, "unit": "minute"},
        "allowedLateness": 5,
        "trigger": {
            "type": "afterWatermark",
            "earlyFiringTrigger": {
                "type": "afterProcessingTime", "pastFirstElementDelay": 1,
            },
        },
        "accumulationMode": "accumulating",
    }
    out, state_rows, n_batches = _drain(
        spark, tmp_path, in_dir, strategy, "soak_tsc_q",
        aggs=[{"name": "n", "op": "count"},
              {"name": "total", "op": "sum", "field": "v"},
              {"name": "__tsc0__", "op": "max", "field": "ts"}],
    )
    assert n_batches >= 150
    rows = out.collect()
    assert rows
    for r in rows:
        # the combined (latest) timestamp lives inside its own window
        assert r["window"]["start"] <= r["__tsc0__"] < r["window"]["end"], r
    assert state_rows is not None
    assert state_rows <= 4 * 6, f"state store leaked: {state_rows} rows"
