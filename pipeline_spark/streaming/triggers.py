"""Beam trigger emulation: processing-time early firings on windowed aggs.

Reference semantics (module/Strategy.java:232-343): the default trigger is
``afterWatermark`` (one final pane when the watermark passes the window
end), optionally with ``earlyFiringTrigger: {type: afterProcessingTime,
pastFirstElementDelay: N}`` — periodic early panes carrying the
aggregate-so-far — and ``accumulationMode`` accumulating (each pane is the
full running aggregate) or discarding (each pane is the delta since the
previous pane).

Spark mapping — the honestly-emulatable subset (everything else remains a
documented divergence in streaming/__init__.py):

  * update outputMode + ``Trigger.ProcessingTime(delay)``: every
    micro-batch re-emits the windows whose aggregate changed — exactly
    Beam's repeated early firing with ACCUMULATING panes.
  * DISCARDING panes: ``foreachBatch`` keeps the previously-emitted
    accumulated values per (window, key) and emits per-pane deltas for
    numeric aggregate columns.
  * pane metadata (``outputPaneInfo: true``): a __pane__ struct with
    firing_time (batch wall-clock), index (per window+key firing
    counter), is_first, and timing — classified against an event-time
    high-water mark (max window START seen so far — a sound lower bound
    on max event time, the foreachBatch-visible proxy for Spark's
    watermark): EARLY while the mark hasn't passed this window's end +
    lateness, ON_TIME after.

Scale posture: the foreachBatch state is one small tuple per ACTIVE
(window, key) pane on the driver — the same cardinality Spark's update
mode keeps in its state store — and entries evict once their window can
no longer fire.  Pane rows are post-aggregation (windows × keys), orders
of magnitude smaller than the input stream; the collect here is the
driver-side pane ledger, not a data-plane materialization.  For
high-cardinality keyed streams, ``strategy.paneStateBackend: executor``
routes the whole pipeline through streaming/panes.py instead — the
aggregation and the ledger fuse into one ``applyInPandasWithState``
operator with state in Spark's state store and no driver collect at
all; this module remains the default because its drain-time
flush_pending is exact on bounded runs.

  * afterPane element-count triggers: the pane ledger withholds a pane's
    update until its count aggregate (``paneCountField``, default ``n``)
    has grown by >= elementCountAtLeast since the last firing; withheld
    panes flush as a final ON_TIME pane when the proxy watermark closes
    the window, AND any still-withheld tail flushes when the query drains
    (awaitTermination on the returned handle), so no data is lost to
    suppression.

  * composite triggers (afterFirst / afterAll / afterEach over
    afterProcessingTime + afterPane leaves, Strategy.java:319-331): the
    ledger evaluates the trigger TREE per pane against per-cycle state —
    wall-clock since the first element after the last firing
    (pastFirstElementInPane) and count growth since the last firing.
    afterFirst = any leaf satisfied, afterAll = all leaves satisfied,
    afterEach = the leaves fire once each, in order (Beam's
    AfterEach.inOrder over OnceTriggers).  The check cadence is the
    micro-batch interval (min leaf delay); a time leaf can fire a pane
    withheld in an earlier batch.
  * lateFiringTrigger (Strategy.java:277-301): once a pane has fired its
    ON_TIME pane, further updates are LATE panes; with a
    lateFiringTrigger they gate on its tree (fresh cycle per late
    firing), without one every late update fires — Beam's default
    repeated late firing.
  * finalTrigger → orFinally (Strategy.java:335-341): when its
    since-pane-birth condition (total count / pane age) is met the pane
    emits one final firing and CLOSES — later updates are dropped, like
    Beam's finished trigger.

afterWatermark's earlyFiringTrigger accepts afterFirst/afterAll
composites (OnceTriggers in Beam) but not afterEach — the same
IllegalArgument the reference raises (Strategy.java:283-285).

Delivery semantics: the pane ledger lives in the foreachBatch closure,
so if Spark retries a micro-batch after a sink failure the retried batch
re-increments pane indexes and re-deltas discarding values — pane
METADATA is at-least-once, exactly like Beam's pane index under retried
bundle commits.  The underlying aggregate values remain governed by
Spark's checkpointed state and stay correct.
"""

from __future__ import annotations

import time
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_NUMERIC = (T.LongType, T.DoubleType, T.IntegerType, T.FloatType, T.DecimalType)

_PANE_STRUCT = T.StructType(
    [
        T.StructField("firing_time", T.DoubleType()),
        T.StructField("index", T.IntegerType()),
        T.StructField("timing", T.StringType()),
        T.StructField("is_first", T.BooleanType()),
    ]
)


_UNIT_SEC = {
    "second": 1.0, "seconds": 1.0, "minute": 60.0, "minutes": 60.0,
    "hour": 3600.0, "hours": 3600.0,
    "millisecond": 0.001, "milliseconds": 0.001, "millis": 0.001,
    "ms": 0.001,
}
_COMPOSITES = ("afterFirst", "afterAll", "afterEach")


def _delay_of(t: dict[str, Any]) -> float:
    delay = t.get("pastFirstElementDelay", t.get("delay", 0)) or 0
    unit = str(t.get("pastFirstElementDelayUnit", t.get("unit", "second")))
    if unit.lower() not in _UNIT_SEC:
        # an unknown unit silently read as seconds would mis-time
        # firings by orders of magnitude — fail loudly instead
        raise ValueError(f"trigger delay unit '{unit}' not recognized")
    return float(delay) * _UNIT_SEC[unit.lower()]


def _count_of(t: dict[str, Any]) -> int:
    n = int(t.get("elementCountAtLeast", t.get("count", 0)) or 0)
    if n < 1:
        raise ValueError("afterPane trigger needs elementCountAtLeast >= 1")
    return n


def _node_of(t: dict[str, Any], root: bool = False) -> dict[str, Any]:
    """Parse one TriggerStrategy into a tree node the pane ledger can
    evaluate: {"kind": "time"|"count"} leaves, {"kind": "first"|"all"|
    "each", "children": [...]} composites (Strategy.java:319-331)."""
    ttype = str(t.get("type", "afterWatermark"))
    if ttype == "afterProcessingTime":
        return {"kind": "time", "delay": _delay_of(t)}
    if ttype == "afterPane":
        return {"kind": "count", "n": _count_of(t)}
    if ttype == "repeatedly":
        return _node_of(t.get("foreverTrigger") or {}, root=root)
    if ttype in _COMPOSITES:
        children = t.get("childrenTriggers") or []
        if not children:
            raise NotImplementedError(
                f"{ttype} composite needs childrenTriggers (afterProcessingTime/"
                "afterPane leaves or nested afterFirst/afterAll)"
            )
        if ttype == "afterEach" and not root:
            # Beam's AfterEach is not a OnceTrigger — it cannot nest
            # inside another composite or an early-firing slot
            raise NotImplementedError(
                "afterEach is only supported as the top-level trigger"
            )
        kind = {"afterFirst": "first", "afterAll": "all", "afterEach": "each"}
        return {"kind": kind[ttype], "children": [_node_of(c) for c in children]}
    raise NotImplementedError(
        f"trigger type '{ttype}' is not emulatable on Spark "
        "(afterProcessingTime/afterPane leaves and afterFirst/afterAll/"
        "afterEach composites only)"
    )


def _min_delay(node: dict[str, Any]) -> float | None:
    if node["kind"] == "time":
        return node["delay"]
    delays = [
        d for c in node.get("children", ()) if (d := _min_delay(c)) is not None
    ]
    return min(delays) if delays else None


def tree_has_count(node: dict[str, Any] | None) -> bool:
    if not node:
        return False
    return node["kind"] == "count" or any(
        tree_has_count(c) for c in node.get("children", ())
    )


def parse_trigger(strategy: dict[str, Any] | None) -> dict[str, Any] | None:
    """Normalize a strategy's trigger config: ``{"early_delay_sec": s}`` /
    ``{"early_count": n}`` for the simple forms, ``{"tree": node,
    "check_sec": s}`` for composites, plus optional ``late_tree`` /
    ``final_tree`` keys; None for the default afterWatermark-only
    trigger.  Raises on non-emulatable families."""
    trigger = (strategy or {}).get("trigger")
    if not trigger:
        return None
    ttype = str(trigger.get("type", "afterWatermark"))
    cfg: dict[str, Any] = {}
    if trigger.get("finalTrigger"):
        cfg["final_tree"] = _node_of(trigger["finalTrigger"])

    if ttype == "afterWatermark":
        if trigger.get("lateFiringTrigger"):
            cfg["late_tree"] = _node_of(trigger["lateFiringTrigger"])
        early = trigger.get("earlyFiringTrigger")
        if early:
            etype = str(early.get("type"))
            if etype == "afterProcessingTime":
                cfg["early_delay_sec"] = _delay_of(early)
            elif etype == "afterPane":
                # element-count early firing: the pane ledger withholds a
                # pane until its count aggregate has grown by >= N since
                # the last firing (strategy.paneCountField names the
                # count column)
                cfg["early_count"] = _count_of(early)
            elif etype in ("afterFirst", "afterAll"):
                tree = _node_of(early, root=True)
                cfg["tree"] = tree
                cfg["check_sec"] = _min_delay(tree) or 1.0
            else:
                # afterEach is not a OnceTrigger — the same
                # IllegalArgument the reference raises
                # (Strategy.java:283-285)
                raise NotImplementedError(
                    f"earlyFiringTrigger type '{etype}' is not emulatable "
                    "on Spark (afterProcessingTime, afterPane, afterFirst, "
                    "afterAll only)"
                )
        return cfg or None
    if ttype == "afterProcessingTime":
        # Beam wraps the repeated form as Repeatedly.forever(...) — the
        # same periodic-emission shape as an early-firing trigger
        cfg["early_delay_sec"] = _delay_of(trigger)
        return cfg
    if ttype == "afterPane":
        cfg["early_count"] = _count_of(trigger)
        return cfg
    if ttype == "repeatedly":
        inner = parse_trigger({"trigger": trigger.get("foreverTrigger") or {}})
        return {**(inner or {}), **cfg} or None
    tree = _node_of(trigger, root=True)
    cfg["tree"] = tree
    cfg["check_sec"] = _min_delay(tree) or 1.0
    return cfg


def trigger_gates(cfg: dict[str, Any] | None) -> bool:
    """Whether a ``parse_trigger`` config carries any gate that forces the
    driver pane ledger to materialize micro-batches (count / composite /
    late / final triggers) instead of passing them through."""
    return cfg is not None and (
        cfg.get("early_count") is not None
        or cfg.get("tree") is not None
        or cfg.get("late_tree") is not None
        or cfg.get("final_tree") is not None
    )


_UNPARSED = object()


def ledger_engages(
    strategy: dict[str, Any] | None, cfg: Any = _UNPARSED
) -> bool:
    """Single source of truth for whether the driver pane ledger ENGAGES
    for this strategy — i.e. ``early_firing_foreach_batch.run_batch``
    materializes batches instead of passing them straight to the sink.

    Used both by the sink path (via ``trigger_gates``) and by the
    aggregation-side timestampCombiner earliest/latest guard, so the two
    cannot drift: if the pass-through rule changes, change it HERE.

    Pass ``cfg`` when ``parse_trigger(strategy)`` has already run (it
    raises on non-emulatable trigger families, so callers that want the
    parse error first should parse first)."""
    if cfg is _UNPARSED:
        cfg = parse_trigger(strategy)
    if cfg is None:
        # no early-firing trigger -> the pane-ledger sink path never runs
        return False
    s = strategy or {}
    discarding = str(s.get("accumulationMode", "accumulating")).lower() in (
        "discarding", "discarding_fired_panes"
    )
    return (
        discarding
        or bool(s.get("outputPaneInfo", False))
        or trigger_gates(cfg)
    )


def split_pane_columns(
    df: DataFrame, strategy: dict[str, Any]
) -> tuple[list[str], list[str]]:
    """Pane identity columns vs aggregate value columns.

    Identity = the window struct + group fields.  Group fields come from
    ``strategy.paneKeyFields`` when declared; otherwise every non-numeric
    column is treated as identity (numeric group keys then need the
    explicit declaration — documented)."""
    declared = set(strategy.get("paneKeyFields") or ())
    keys = [
        f.name
        for f in df.schema.fields
        # non-numeric columns are always identity: they cannot be
        # delta-ed, so an under-declared paneKeyFields must not push a
        # string/struct column into the value set
        if f.name == "window"
        or f.name in declared
        or not isinstance(f.dataType, _NUMERIC)
    ]
    vals = [c for c in df.columns if c not in keys]
    return keys, vals


class _Pane:
    """Per-(window, key) pane ledger entry."""

    __slots__ = (
        "idx", "fired", "latest", "dirty", "cycle_start", "each_ptr",
        "on_time_fired", "closed", "birth",
    )

    def __init__(self, now: float):
        self.idx = 0                 # next pane index
        self.fired: tuple = ()       # accumulated values at last firing
        self.latest: tuple = ()      # latest (possibly withheld) values
        self.dirty = False           # has an unfired update
        self.cycle_start: float | None = None  # first element after last firing
        self.each_ptr = 0            # afterEach: which child is active
        self.on_time_fired = False   # the watermark pane has been emitted
        self.closed = False          # finalTrigger fired — drop updates
        self.birth = now             # for finalTrigger time leaves


def _eval_tree(
    node: dict[str, Any], now: float, cycle_start: float | None,
    count_grown: int, each_ptr: int = -1,
) -> bool:
    """Evaluate a trigger tree against one pane's current cycle: time
    leaves measure wall-clock since the cycle's first element
    (pastFirstElementInPane), count leaves measure count growth since the
    last firing.  ``each_ptr`` >= 0 selects the active child of a
    top-level afterEach."""
    kind = node["kind"]
    if kind == "time":
        return cycle_start is not None and now - cycle_start >= node["delay"]
    if kind == "count":
        return count_grown >= node["n"]
    if kind == "each":
        children = node["children"]
        if each_ptr >= len(children):
            return False  # every OnceTrigger in the sequence has fired
        return _eval_tree(children[each_ptr], now, cycle_start, count_grown)
    results = (
        _eval_tree(c, now, cycle_start, count_grown) for c in node["children"]
    )
    return any(results) if kind == "first" else all(results)


def early_firing_foreach_batch(
    sink_fn: Callable[[DataFrame, int], None],
    key_cols: list[str],
    value_cols: list[str],
    discarding: bool,
    output_pane_info: bool,
    lateness_sec: float = 0.0,
    max_keys: int = 1_000_000,
    early_count: int | None = None,
    count_field: str | None = None,
    trigger_tree: dict[str, Any] | None = None,
    late_tree: dict[str, Any] | None = None,
    final_tree: dict[str, Any] | None = None,
    early_delay: float | None = None,
):
    """foreachBatch function implementing pane semantics over update-mode
    micro-batches; ``sink_fn(batch_df, batch_id)`` persists pane rows.

    With ``early_count`` (afterPane.elementCountAtLeast), a pane update is
    WITHHELD until its ``count_field`` aggregate has grown by >= N since
    the pane's last firing; withheld panes are never lost — the ledger
    keeps each pane's latest values and flushes a final ON_TIME pane once
    the proxy watermark passes the window end + lateness.

    ``trigger_tree`` generalizes that to composite triggers: each dirty
    pane fires when its tree is satisfied against the pane's current
    cycle (afterFirst = any, afterAll = all, afterEach = the children
    fire once each in order).  ``late_tree`` gates LATE panes (updates
    after the ON_TIME firing); ``final_tree`` is orFinally — when its
    since-birth condition is met the pane fires once more and closes.

    ``max_keys`` bounds the ledger for NON-windowed (global per-key)
    streams, where no watermark ever closes a pane: beyond the cap the
    least-recently-fired key is dropped (its next firing restarts at pane
    index 0 / full value — degraded metadata, bounded memory)."""
    # driver-side pane ledger: pane key -> _Pane.
    # dict insertion order doubles as the LRU queue (re-insert on update)
    state: dict[tuple, _Pane] = {}
    has_window = "window" in key_cols
    # event-time high-water mark: max window START seen.  A window's rows
    # have event time >= its start, so this is a SOUND lower bound on the
    # true max event time (max window END would overshoot by up to a
    # window length, closing every pane in its own batch and turning the
    # count trigger into a no-op at allowedLateness 0).  Drives pane
    # timing + eviction.
    high_water: list[float] = [float("-inf")]
    # (spark, schema) of the latest batch — lets flush_pending build the
    # end-of-stream flush frame after the query drains
    _last: dict[str, Any] = {}
    needs_count = early_count is not None or any(
        tree_has_count(t) for t in (trigger_tree, late_tree, final_tree)
    )
    if needs_count and count_field not in value_cols:
        raise ValueError(
            f"afterPane trigger needs paneCountField naming a count "
            f"aggregate column (got {count_field!r}; value columns: "
            f"{value_cols})"
        )
    count_idx = value_cols.index(count_field) if needs_count else -1
    # same gate rule as ledger_engages — keep via trigger_gates so the
    # aggregation-side guard cannot drift from the sink's actual behavior
    ledger_gates = trigger_gates({
        "early_count": early_count, "tree": trigger_tree,
        "late_tree": late_tree, "final_tree": final_tree,
    })

    def pane_key(d: dict) -> tuple:
        out = []
        for k in key_cols:
            v = d[k]
            if k == "window" and v is not None:
                try:
                    out.append((v["start"], v["end"]))
                except (TypeError, KeyError, IndexError):
                    # calendar windows are a PLAIN truncated timestamp,
                    # not a struct — treat as an opaque pane key (no
                    # window-close semantics; the max_keys cap bounds it)
                    out.append(v)
            else:
                out.append(v)
        return tuple(out)

    widx = key_cols.index("window") if has_window else -1

    def grown_count(p: _Pane) -> int:
        if count_idx < 0:
            return 0
        fired_count = (p.fired[count_idx] if p.fired else 0) or 0
        return ((p.latest[count_idx] or 0) if p.latest else 0) - fired_count

    def pane_dict(key: tuple, p: _Pane) -> dict:
        d = dict(zip(key_cols, key))
        if has_window and isinstance(key[widx], tuple):
            d["window"] = {"start": key[widx][0], "end": key[widx][1]}
        d.update(zip(value_cols, p.latest))
        return d

    def window_end(key: tuple) -> float | None:
        if has_window and isinstance(key[widx], tuple):
            return key[widx][1].timestamp()
        return None

    def run_batch(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        if (
            not discarding and not output_pane_info and not ledger_gates
        ):
            sink_fn(bdf, batch_id)  # plain accumulating panes: pass-through
            return
        rows = bdf.collect()
        now = time.time()
        schema = bdf.schema
        if output_pane_info:
            schema = T.StructType(
                [*schema.fields, T.StructField("__pane__", _PANE_STRUCT)]
            )
        _last["spark"], _last["schema"] = spark, schema
        if has_window:
            for r in rows:
                w = r["window"]
                if w is not None:
                    try:
                        high_water[0] = max(
                            high_water[0], w["start"].timestamp()
                        )
                    except (TypeError, KeyError, IndexError):
                        pass  # calendar window: plain timestamp, no struct
        out_rows = []

        def emit(d: dict, idx: int, fired: tuple, timing: str) -> None:
            if discarding and fired:
                for c, pv in zip(value_cols, fired):
                    if d[c] is not None and pv is not None:
                        d[c] = d[c] - pv
            if output_pane_info:
                d["__pane__"] = (float(now), idx, timing, idx == 0)
            out_rows.append(tuple(d.get(f.name) for f in schema.fields))

        def fire(key: tuple, p: _Pane, d: dict, timing: str) -> None:
            emit(d, p.idx, p.fired, timing)
            p.idx += 1
            p.fired = p.latest
            p.dirty = False
            p.cycle_start = None
            if trigger_tree is not None and trigger_tree["kind"] == "each":
                p.each_ptr += 1

        # ingest: update each pane's latest values (closed panes drop)
        for r in rows:
            d = r.asDict(recursive=False)
            key = pane_key(d)
            if key in state:
                p = state.pop(key)  # re-insert → LRU refresh
            else:
                p = _Pane(now)
            state[key] = p
            if p.closed:
                continue
            p.latest = tuple(d[c] for c in value_cols)
            p.dirty = True
            if p.cycle_start is None:
                p.cycle_start = now

        # decide: one pass over dirty panes — a time leaf can fire a pane
        # withheld in an earlier batch even when this batch carries no row
        # for it
        for key in list(state):
            p = state[key]
            if not p.dirty or p.closed:
                continue
            w_end = window_end(key)
            window_closed = (
                w_end is not None and high_water[0] >= w_end + lateness_sec
            )
            d = pane_dict(key, p)
            # orFinally: final condition measured since pane birth
            if final_tree is not None and _eval_tree(
                final_tree, now, p.birth,
                (p.latest[count_idx] or 0) if count_idx >= 0 and p.latest else 0,
            ):
                timing = "EARLY" if not window_closed else (
                    "ON_TIME" if not p.on_time_fired else "LATE"
                )
                fire(key, p, d, timing)
                p.closed = True
                continue
            if not window_closed:
                if trigger_tree is not None:
                    should = _eval_tree(
                        trigger_tree, now, p.cycle_start, grown_count(p),
                        each_ptr=(
                            p.each_ptr
                            if trigger_tree["kind"] == "each"
                            else -1
                        ),
                    )
                elif early_count is not None:
                    should = grown_count(p) >= early_count
                elif early_delay is not None:
                    should = True  # processing-time cadence = batch cadence
                else:
                    # late/final-only trigger: Beam fires NOTHING before
                    # the unconditional watermark pane (the executor twin
                    # has the same branch) — before r12 this fired a
                    # spurious EARLY pane every micro-batch
                    should = False
                if should:
                    fire(key, p, d, "EARLY")
                # else: withheld — the close-time flush below or a later
                # batch's re-evaluation emits it
            elif not p.on_time_fired:
                # the watermark firing is unconditional (AfterWatermark
                # pastEndOfWindow) — withheld updates flush here too
                fire(key, p, d, "ON_TIME")
                p.on_time_fired = True
            else:
                # LATE pane: gate on lateFiringTrigger when declared,
                # else Beam's default repeated late firing
                if late_tree is None or _eval_tree(
                    late_tree, now, p.cycle_start, grown_count(p)
                ):
                    fire(key, p, d, "LATE")
        # evict panes that can no longer fire (the proxy watermark is well
        # past window end + lateness) so the ledger stays bounded by the
        # stream's active windows
        if has_window:
            dead = [
                k
                for k in state
                if isinstance(k[widx], tuple)
                and not state[k].dirty
                and k[widx][1].timestamp() + lateness_sec
                < high_water[0] - 3600
            ]
            for k in dead:
                del state[k]
        # backstop for global (never-closing) panes: LRU-drop beyond cap
        while len(state) > max_keys:
            state.pop(next(iter(state)))
        if out_rows:
            sink_fn(spark.createDataFrame(out_rows, schema=schema), batch_id)

    def flush_pending() -> None:
        """Emit every still-withheld pane as its final pane — called after
        the query drains (availableNow / stop), where no later event will
        ever push the proxy watermark past the trailing windows.  Without
        this, count-trigger suppression would silently LOSE the tail."""
        if not _last or not any(
            p.dirty and not p.closed for p in state.values()
        ):
            return
        spark, schema = _last["spark"], _last["schema"]
        now = time.time()
        out_rows = []
        for key in list(state):
            p = state[key]
            if not p.dirty or p.closed:
                continue
            d = pane_dict(key, p)
            if discarding and p.fired:
                for c, pv in zip(value_cols, p.fired):
                    if d[c] is not None and pv is not None:
                        d[c] = d[c] - pv
            if output_pane_info:
                timing = "LATE" if p.on_time_fired else "ON_TIME"
                d["__pane__"] = (float(now), p.idx, timing, p.idx == 0)
            out_rows.append(tuple(d.get(f.name) for f in schema.fields))
            p.idx += 1
            p.fired = p.latest
            p.dirty = False
            p.cycle_start = None
        if out_rows:
            sink_fn(spark.createDataFrame(out_rows, schema=schema), -1)

    run_batch.flush_pending = flush_pending
    return run_batch


def stream_with_early_firing(
    df: DataFrame,
    strategy: dict[str, Any],
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool = False,
):
    """Start an update-mode stream with processing-time early firings;
    returns a handle wrapping the StreamingQuery whose
    ``awaitTermination()`` also flushes still-withheld count-trigger
    panes once the query drains (otherwise the trailing windows'
    suppressed updates would be lost — no later event ever closes them).
    ``available_now: true`` drains the backlog in bounded micro-batches
    (each one an early firing) — the deterministic test/batch-parity
    path."""
    cfg = parse_trigger(strategy)
    if cfg is None:
        raise ValueError("strategy has no early-firing trigger")
    mode = str(strategy.get("accumulationMode", "accumulating")).lower()
    discarding = mode in ("discarding", "discarding_fired_panes")
    pane_info = bool(strategy.get("outputPaneInfo", False))
    lateness = strategy.get("allowedLateness", 0)
    lateness_sec = float(lateness) if isinstance(lateness, (int, float)) else 0.0

    key_cols, value_cols = split_pane_columns(df, strategy)
    fb = early_firing_foreach_batch(
        sink_fn, key_cols, value_cols, discarding, pane_info, lateness_sec,
        max_keys=int(strategy.get("paneStateMaxKeys", 1_000_000)),
        early_count=cfg.get("early_count"),
        count_field=str(strategy.get("paneCountField", "n")),
        trigger_tree=cfg.get("tree"),
        late_tree=cfg.get("late_tree"),
        final_tree=cfg.get("final_tree"),
        early_delay=cfg.get("early_delay_sec"),
    )
    writer = (
        df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(fb)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        # count/composite triggers check every micro-batch; the interval
        # is the check cadence, not the firing condition
        delay = max(
            cfg.get("early_delay_sec", cfg.get("check_sec", 1.0)), 0.1
        )
        writer = writer.trigger(processingTime=f"{delay} seconds")
    return _EarlyFiringRun(writer.start(), fb.flush_pending)


class _EarlyFiringRun:
    """StreamingQuery wrapper: awaitTermination() additionally flushes
    withheld panes after the drain; everything else delegates."""

    def __init__(self, query, flush):
        self.query = query
        self.flush_pending = flush

    def awaitTermination(self, *args, **kwargs):
        result = self.query.awaitTermination(*args, **kwargs)
        # a timeout poll returns False with the query still running —
        # flushing then would emit the withheld tail mid-stream and
        # re-fire it at the real drain
        if result is not False:
            self.flush_pending()
        return result

    def __getattr__(self, name):
        return getattr(self.query, name)
