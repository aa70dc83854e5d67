"""Generative fuzz of the pane-ledger TRIGGER SEMANTICS (VERDICT r13
ask #5): random Beam-shaped trigger configs (early/count/composite/
late/final x accumulation modes x windowed/global keys) over random
event streams, asserting the invariants Beam guarantees:

  1. CONSERVATION — no data is lost to suppression: after the drain
     flush, accumulating panes' last value equals the batch aggregation
     oracle (an independent Python count/sum over the same fed rows),
     and discarding panes' deltas SUM to it.  finalTrigger closure is
     the one sanctioned loss (Beam drops post-final updates), checked
     against the pane's fed-value history instead.
  2. Pane indexes increase 0,1,2,... per (window,key); is_first iff 0.
  3. Timing sequence per pane is EARLY* [ON_TIME] LATE* — never an
     EARLY after the watermark pane, at most one ON_TIME.
  4. afterPane(elementCountAtLeast=N): every EARLY firing carries count
     growth >= N since the previous firing.

The r12 eviction leak and the DST bug both lived in this ledger; the
soak suite covers state SIZE, this suite covers firing SEMANTICS.  The
ledger is driven directly with stub micro-batch frames (its contract:
.collect() / .schema / .sparkSession.createDataFrame), so the fuzz is
pure-Python deterministic — time leaves use only delay 0 (always
satisfied within the batch) or 9999 (never), making wall-clock
irrelevant.  End-to-end Spark integration of the same ledger is
covered by tests/test_streaming.py, and the executor pane backend
(streaming/panes.py) imports THIS module's _eval_tree/parse_trigger,
so the tree-evaluation semantics fuzzed here are the ones both
backends run.

Reference semantics: module/Strategy.java:232-343 (trigger trees),
Beam's AfterWatermark/AfterPane/AfterEach/OrFinally contracts.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

pytestmark = pytest.mark.slow  # r16: fast-tier default deselects (see pyproject)
from pyspark.sql import types as T

from pipeline_spark.streaming.triggers import (
    early_firing_foreach_batch,
    parse_trigger,
)

WINDOW_SEC = 60


class _StubSession:
    def createDataFrame(self, rows, schema=None):
        return _StubFrame(list(rows), schema, self)


class _StubFrame:
    def __init__(self, rows, schema, session):
        self._rows = rows
        self.schema = schema
        self.sparkSession = session

    def collect(self):
        return self._rows


class _Row(dict):
    """Mapping with Row's .asDict(recursive=False) contract."""

    def asDict(self, recursive=False):
        return dict(self)


def _gen_leaf(rng: random.Random) -> dict:
    if rng.random() < 0.55:
        return {"type": "afterPane", "elementCountAtLeast": rng.randint(1, 4)}
    return {
        "type": "afterProcessingTime",
        "pastFirstElementDelay": rng.choice([0, 9999]),
    }


def _gen_once(rng: random.Random, depth: int = 0) -> dict:
    if depth >= 1 or rng.random() < 0.5:
        return _gen_leaf(rng)
    return {
        "type": rng.choice(["afterFirst", "afterAll"]),
        "childrenTriggers": [
            _gen_once(rng, depth + 1) for _ in range(rng.randint(1, 3))
        ],
    }


def _gen_trigger(rng: random.Random) -> dict:
    shape = rng.random()
    if shape < 0.45:
        trig: dict = {"type": "afterWatermark"}
        e = rng.random()
        if e < 0.3:
            trig["earlyFiringTrigger"] = {
                "type": "afterProcessingTime", "pastFirstElementDelay": 0,
            }
        elif e < 0.6:
            trig["earlyFiringTrigger"] = {
                "type": "afterPane", "elementCountAtLeast": rng.randint(1, 4),
            }
        elif e < 0.9:
            early = _gen_once(rng)
            if early["type"] not in ("afterFirst", "afterAll"):
                early = {"type": "afterFirst", "childrenTriggers": [early]}
            trig["earlyFiringTrigger"] = early
        if rng.random() < 0.4:
            trig["lateFiringTrigger"] = _gen_once(rng)
    elif shape < 0.7:
        trig = _gen_once(rng)
    elif shape < 0.85:
        trig = {
            "type": "afterEach",
            "childrenTriggers": [_gen_leaf(rng) for _ in range(rng.randint(1, 3))],
        }
    else:
        trig = {"type": "repeatedly", "foreverTrigger": _gen_leaf(rng)}
    if rng.random() < 0.25:
        trig["finalTrigger"] = _gen_leaf(rng)
    return trig


def _window_of(sec: float):
    start = int(sec // WINDOW_SEC) * WINDOW_SEC
    return (
        dt.datetime(2024, 1, 1) + dt.timedelta(seconds=start),
        dt.datetime(2024, 1, 1) + dt.timedelta(seconds=start + WINDOW_SEC),
    )


def _run_case(seed: int):
    rng = random.Random(seed)
    windowed = rng.random() < 0.85
    lateness = rng.choice([0.0, 30.0])
    discarding = rng.random() < 0.5
    trig = _gen_trigger(rng)
    cfg = parse_trigger({"trigger": trig}) or {}

    key_cols = (["window", "k"] if windowed else ["k"])
    value_cols = ["n", "total"]
    fields = []
    if windowed:
        fields.append(T.StructField("window", T.StructType([
            T.StructField("start", T.TimestampType()),
            T.StructField("end", T.TimestampType()),
        ])))
    fields += [
        T.StructField("k", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
    schema = T.StructType(fields)
    session = _StubSession()

    captured: list[tuple] = []

    def sink(frame, batch_id):
        names = [f.name for f in frame.schema.fields]
        for r in frame.collect():
            captured.append(dict(zip(names, r)))

    fb = early_firing_foreach_batch(
        sink, key_cols, value_cols, discarding, True,
        lateness_sec=lateness,
        early_count=cfg.get("early_count"),
        count_field="n",
        trigger_tree=cfg.get("tree"),
        late_tree=cfg.get("late_tree"),
        final_tree=cfg.get("final_tree"),
        early_delay=cfg.get("early_delay_sec"),
    )

    # random event stream: mostly time-ordered with occasional late rows
    keys = [f"k{i}" for i in range(rng.randint(1, 3))]
    n_events = rng.randint(6, 36)
    events = []
    t_cursor = 0.0
    for _ in range(n_events):
        t_cursor += rng.uniform(0, 25)
        ts = t_cursor
        if rng.random() < 0.15 and t_cursor > 90:
            ts = t_cursor - rng.uniform(60, 90)  # late event
        events.append((rng.choice(keys), round(rng.uniform(0, 10), 2), ts))

    n_batches = rng.randint(2, 5)
    per = max(1, len(events) // n_batches)
    batches = [events[i * per:(i + 1) * per] for i in range(n_batches - 1)]
    batches.append(events[(n_batches - 1) * per:])
    if rng.random() < 0.3:
        batches.insert(rng.randrange(len(batches)), [])  # empty micro-batch

    # independent batch-aggregation oracle + per-pane fed-value history
    agg: dict[tuple, tuple[int, float]] = {}
    history: dict[tuple, list[tuple[int, float]]] = {}

    for bi, batch in enumerate(batches):
        touched = set()
        for k, v, ts in batch:
            pane = ((_window_of(ts), k) if windowed else (k,))
            n0, s0 = agg.get(pane, (0, 0.0))
            agg[pane] = (n0 + 1, round(s0 + v, 6))
            touched.add(pane)
        rows = []
        for pane in touched:
            n0, s0 = agg[pane]
            history.setdefault(pane, []).append((n0, s0))
            d = {"k": pane[-1], "n": n0, "total": s0}
            if windowed:
                d["window"] = _Row(start=pane[0][0], end=pane[0][1])
            rows.append(_Row(d))
        fb(_StubFrame(rows, schema, session), bi)
    fb.flush_pending()

    # ---- invariants --------------------------------------------------
    by_pane: dict[tuple, list[dict]] = {}
    for r in captured:
        if windowed:
            w = r["window"]
            pane = (((w["start"], w["end"]) if w is not None else None), r["k"])
        else:
            pane = (r["k"],)
        by_pane.setdefault(pane, []).append(r)

    has_final = cfg.get("final_tree") is not None
    for pane, rows in by_pane.items():
        rows.sort(key=lambda r: r["__pane__"][1])
        idxs = [r["__pane__"][1] for r in rows]
        assert idxs == list(range(len(rows))), (seed, pane, idxs)
        for r in rows:
            assert r["__pane__"][3] == (r["__pane__"][1] == 0), (seed, pane)
        timings = [r["__pane__"][2] for r in rows]
        seen_on_time = False
        for t_ in timings:
            if t_ == "ON_TIME":
                assert not seen_on_time, (seed, pane, timings)
                seen_on_time = True
            elif t_ == "EARLY":
                assert not seen_on_time, (seed, pane, timings)
        # conservation vs the batch oracle
        true_n, true_s = agg[pane]
        if discarding:
            got_n = sum(r["n"] for r in rows)
            got_s = round(sum(r["total"] for r in rows), 4)
        else:
            got_n = rows[-1]["n"]
            got_s = round(rows[-1]["total"], 4)
        if not has_final:
            assert got_n == true_n, (seed, pane, got_n, true_n)
            assert abs(got_s - round(true_s, 4)) < 1e-6, (seed, pane)
        else:
            # finalTrigger may close the pane mid-stream (sanctioned
            # loss): the emitted state must match SOME fed prefix
            fed = history[pane]
            assert any(
                got_n == n and abs(got_s - round(s, 4)) < 1e-6
                for n, s in fed
            ), (seed, pane, got_n, got_s, fed)
        # afterPane growth contract (simple early_count form only:
        # composite trees own the growth condition with time leaves).
        # An orFinally final firing bypasses the gate by design (Beam's
        # OrFinally fires-and-closes regardless of the main trigger) —
        # the final firing is necessarily the pane's LAST row, so it is
        # exempted when a finalTrigger exists.
        ec = cfg.get("early_count")
        if ec is not None:
            gated = rows[:-1] if has_final else rows
            if not discarding:
                prev_n = 0
                for r in rows:
                    if r["__pane__"][2] == "EARLY" and r in gated:
                        assert r["n"] - prev_n >= ec, (seed, pane, rows)
                    prev_n = r["n"]
            else:
                for r in gated:
                    if r["__pane__"][2] == "EARLY":
                        assert r["n"] >= ec, (seed, pane, rows)

    # every fed pane fired at least once (flush_pending guarantees the
    # tail) unless a finalTrigger closed it after its only firing —
    # closure still requires >= 1 firing, so presence is unconditional
    for pane in agg:
        assert pane in by_pane, (seed, pane, "pane never fired")

    return len(captured)


SEEDS = list(range(160))


@pytest.mark.parametrize("seed", SEEDS)
def test_trigger_semantics_fuzz(seed):
    fired = _run_case(seed)
    assert fired >= 1


# ---------------------------------------------------------------------------
# e2e sample: a handful of the same random configs through the REAL
# executor pane backend (streaming/panes.py, applyInPandasWithState) —
# the stub-driven fuzz above covers the shared tree semantics at volume;
# this proves the keyed-state twin honors them under actual micro-batches.

EXEC_SEEDS = [0, 1, 2, 3, 4, 5]


def _gen_exec_trigger(rng: random.Random) -> dict:
    while True:
        trig = _gen_trigger(rng)
        if "lateFiringTrigger" in trig:
            continue  # executor backend refuses late trees (documented)
        cfg = parse_trigger({"trigger": trig}) or {}
        if not cfg or set(cfg) == {"final_tree"}:
            continue  # needs an early-firing trigger to engage the backend
        return trig


@pytest.mark.parametrize("seed", EXEC_SEEDS)
def test_executor_backend_trigger_sample(spark, tmp_path, seed):
    import yaml

    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline
    from tests.test_streaming import _write_stream_files

    rng = random.Random(10_000 + seed)
    trig = _gen_exec_trigger(rng)
    cfg = parse_trigger({"trigger": trig}) or {}
    discarding = rng.random() < 0.4 and cfg.get("late_tree") is None
    lateness = rng.choice([0, 5])

    # strictly time-ordered stream + a far-future sentinel that closes
    # every real window (the sentinel's own window has no drain flush in
    # keyed state — documented divergence, excluded from the oracle)
    keys = ["a", "b"]
    t, events = 5.0, []
    for _ in range(rng.randint(8, 16)):
        t += rng.uniform(2, 20)
        events.append((rng.choice(keys), round(rng.uniform(0, 5), 2),
                       dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t)))
    n_b = rng.randint(2, 4)
    per = max(1, len(events) // n_b)
    batches = [events[i * per:(i + 1) * per] for i in range(n_b - 1)]
    batches.append(events[(n_b - 1) * per:])
    batches.append([("zz", 1.0, dt.datetime(2100, 1, 1))])

    in_dir = _write_stream_files(tmp_path, f"tf_exec_{seed}", batches)
    out_dir = str(tmp_path / f"tf_exec_out_{seed}")
    pipeline = {
        "sources": [{"name": "events", "module": "storage", "parameters": {
            "format": "parquet", "input": in_dir, "mode": "streaming",
            "maxFilesPerTrigger": 1}}],
        "transforms": [{"name": "agg", "module": "aggregation",
                        "inputs": ["events"], "timestampAttribute": "ts",
                        "strategy": {
                            "window": {"type": "fixed", "size": 1,
                                       "unit": "minute"},
                            "allowedLateness": lateness,
                            "trigger": trig,
                            "paneStateBackend": "executor",
                            "accumulationMode": (
                                "discarding" if discarding else "accumulating"
                            ),
                            "outputPaneInfo": True,
                        },
                        "parameters": {
                            "groupFields": ["k"],
                            "aggregations": [
                                {"name": "n", "op": "count"},
                                {"name": "total", "op": "sum", "field": "v"},
                            ],
                        }}],
        "sinks": [{"name": "out", "module": "storage", "inputs": ["agg"],
                   "parameters": {"format": "parquet", "output": out_dir,
                                  "availableNow": True}}],
    }
    run_pipeline(spark, parse_config(yaml.safe_dump(pipeline)))

    # batch oracle over the real (non-sentinel) events
    expect: dict[tuple, tuple[int, float]] = {}
    for k, v, ts in events:
        wstart = ts.replace(second=0, microsecond=0)
        n0, s0 = expect.get((wstart, k), (0, 0.0))
        expect[(wstart, k)] = (n0 + 1, round(s0 + v, 6))

    rows = [r for r in spark.read.parquet(out_dir).collect() if r["k"] != "zz"]
    by_pane: dict[tuple, list] = {}
    for r in rows:
        by_pane.setdefault((r["window"]["start"], r["k"]), []).append(r)
    has_final = cfg.get("final_tree") is not None
    for pane, expected in expect.items():
        assert pane in by_pane, (seed, trig, pane, "window never fired")
        prs = sorted(by_pane[pane], key=lambda r: r["__pane__"]["index"])
        assert [r["__pane__"]["index"] for r in prs] == list(range(len(prs)))
        if discarding:
            got = (sum(r["n"] for r in prs),
                   round(sum(r["total"] for r in prs), 4))
        else:
            got = (prs[-1]["n"], round(prs[-1]["total"], 4))
        if not has_final:
            assert got == (expected[0], round(expected[1], 4)), (
                seed, trig, pane, got, expected)
        else:
            assert got[0] <= expected[0], (seed, trig, pane, got, expected)
