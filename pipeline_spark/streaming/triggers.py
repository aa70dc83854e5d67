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
driver-side pane ledger, not a data-plane materialization.

  * afterPane element-count triggers: the pane ledger withholds a pane's
    update until its count aggregate (``paneCountField``, default ``n``)
    has grown by >= elementCountAtLeast since the last firing; withheld
    panes flush as a final ON_TIME pane when the proxy watermark closes
    the window, AND any still-withheld tail flushes when the query drains
    (awaitTermination on the returned handle), so no data is lost to
    suppression.

Non-emulatable trigger families (afterEach / afterFirst / afterAll
composites) raise with the reason: Spark exposes no per-key pane
accounting to hang them on.

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


def parse_trigger(strategy: dict[str, Any] | None) -> dict[str, Any] | None:
    """Normalize a strategy's trigger config to
    ``{"early_delay_sec": float}`` or None for the default
    afterWatermark-only trigger.  Raises on non-emulatable families."""
    trigger = (strategy or {}).get("trigger")
    if not trigger:
        return None
    ttype = str(trigger.get("type", "afterWatermark"))
    unit_sec = {
        "second": 1.0, "seconds": 1.0, "minute": 60.0, "minutes": 60.0,
        "hour": 3600.0, "hours": 3600.0,
        "millisecond": 0.001, "milliseconds": 0.001, "millis": 0.001,
        "ms": 0.001,
    }

    def delay_of(t: dict[str, Any]) -> float:
        delay = t.get("pastFirstElementDelay", t.get("delay", 0)) or 0
        unit = str(t.get("pastFirstElementDelayUnit", t.get("unit", "second")))
        if unit.lower() not in unit_sec:
            # an unknown unit silently read as seconds would mis-time
            # firings by orders of magnitude — fail loudly instead
            raise ValueError(f"trigger delay unit '{unit}' not recognized")
        return float(delay) * unit_sec[unit.lower()]

    def count_of(t: dict[str, Any]) -> int:
        n = int(t.get("elementCountAtLeast", t.get("count", 0)) or 0)
        if n < 1:
            raise ValueError("afterPane trigger needs elementCountAtLeast >= 1")
        return n

    if ttype == "afterWatermark":
        early = trigger.get("earlyFiringTrigger")
        if not early:
            return None
        etype = str(early.get("type"))
        if etype == "afterProcessingTime":
            return {"early_delay_sec": delay_of(early)}
        if etype == "afterPane":
            # element-count early firing: the pane ledger withholds a
            # pane until its count aggregate has grown by >= N since the
            # last firing (strategy.paneCountField names the count column)
            return {"early_count": count_of(early)}
        raise NotImplementedError(
            f"earlyFiringTrigger type '{etype}' is not emulatable on "
            "Spark (afterProcessingTime and afterPane only)"
        )
    if ttype == "afterProcessingTime":
        # Beam wraps the repeated form as Repeatedly.forever(...) — the
        # same periodic-emission shape as an early-firing trigger
        return {"early_delay_sec": delay_of(trigger)}
    if ttype == "afterPane":
        return {"early_count": count_of(trigger)}
    if ttype == "repeatedly":
        return parse_trigger({"trigger": trigger.get("foreverTrigger") or {}})
    raise NotImplementedError(
        f"trigger type '{ttype}' is not emulatable on Spark "
        "(afterEach/afterFirst/afterAll composites need Beam pane state)"
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
):
    """foreachBatch function implementing pane semantics over update-mode
    micro-batches; ``sink_fn(batch_df, batch_id)`` persists pane rows.

    With ``early_count`` (afterPane.elementCountAtLeast), a pane update is
    WITHHELD until its ``count_field`` aggregate has grown by >= N since
    the pane's last firing; withheld panes are never lost — the ledger
    keeps each pane's latest values and flushes a final ON_TIME pane once
    the proxy watermark passes the window end + lateness.

    ``max_keys`` bounds the ledger for NON-windowed (global per-key)
    streams, where no watermark ever closes a pane: beyond the cap the
    least-recently-fired key is dropped (its next firing restarts at pane
    index 0 / full value — degraded metadata, bounded memory)."""
    # driver-side pane ledger:
    #   pane key -> [next_index, fired_values, latest_values, dirty]
    # fired_values = accumulated values at the last firing (delta base);
    # latest_values/dirty track withheld updates for the close-time flush.
    # dict insertion order doubles as the LRU queue (re-insert on update)
    state: dict[tuple, list] = {}
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
    if early_count is not None and count_field not in value_cols:
        raise ValueError(
            f"afterPane trigger needs paneCountField naming a count "
            f"aggregate column (got {count_field!r}; value columns: "
            f"{value_cols})"
        )
    count_idx = value_cols.index(count_field) if early_count is not None else -1

    def pane_key(d: dict) -> tuple:
        out = []
        for k in key_cols:
            v = d[k]
            if k == "window" and v is not None:
                out.append((v["start"], v["end"]))
            else:
                out.append(v)
        return tuple(out)

    def run_batch(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        if not discarding and not output_pane_info and early_count is None:
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
                    high_water[0] = max(high_water[0], w["start"].timestamp())
        out_rows = []

        def emit(d: dict, idx: int, fired: tuple, timing: str) -> None:
            if discarding and fired:
                for c, pv in zip(value_cols, fired):
                    if d[c] is not None and pv is not None:
                        d[c] = d[c] - pv
            if output_pane_info:
                d["__pane__"] = (float(now), idx, timing, idx == 0)
            out_rows.append(tuple(d.get(f.name) for f in schema.fields))

        for r in rows:
            d = r.asDict(recursive=False)
            key = pane_key(d)
            if key in state:
                ent = state.pop(key)  # re-insert → LRU refresh
            else:
                ent = [0, (), (), False]
            idx, fired = ent[0], ent[1]
            cur_vals = tuple(d[c] for c in value_cols)
            w_end = (
                d["window"]["end"].timestamp()
                if has_window and d["window"]
                else None
            )
            timing = (
                "ON_TIME"
                if w_end is not None and high_water[0] >= w_end + lateness_sec
                else "EARLY"
            )
            if early_count is not None and timing == "EARLY":
                fired_count = fired[count_idx] if fired else 0
                grown = (cur_vals[count_idx] or 0) - (fired_count or 0)
                if grown < early_count:
                    state[key] = [idx, fired, cur_vals, True]  # withhold
                    continue
            emit(d, idx, fired, timing)
            state[key] = [idx + 1, cur_vals, cur_vals, False]
        # flush withheld panes whose windows the proxy watermark has now
        # closed — their final (ON_TIME) pane must not be lost
        if early_count is not None and has_window:
            widx = key_cols.index("window")
            for key in list(state):
                ent = state[key]
                if not ent[3] or not isinstance(key[widx], tuple):
                    continue
                if key[widx][1].timestamp() + lateness_sec > high_water[0]:
                    continue
                d = dict(zip(key_cols, key))
                d["window"] = {"start": key[widx][0], "end": key[widx][1]}
                d.update(zip(value_cols, ent[2]))
                emit(d, ent[0], ent[1], "ON_TIME")
                state[key] = [ent[0] + 1, ent[2], ent[2], False]
        # evict panes that can no longer fire (the proxy watermark is well
        # past window end + lateness) so the ledger stays bounded by the
        # stream's active windows
        if has_window:
            widx = key_cols.index("window")
            dead = [
                k
                for k in state
                if isinstance(k[widx], tuple)
                and not state[k][3]
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
        if not _last or not any(ent[3] for ent in state.values()):
            return
        spark, schema = _last["spark"], _last["schema"]
        now = time.time()
        out_rows = []
        widx = key_cols.index("window") if has_window else -1
        for key in list(state):
            ent = state[key]
            if not ent[3]:
                continue
            d = dict(zip(key_cols, key))
            if has_window and isinstance(key[widx], tuple):
                d["window"] = {"start": key[widx][0], "end": key[widx][1]}
            d.update(zip(value_cols, ent[2]))
            if discarding and ent[1]:
                for c, pv in zip(value_cols, ent[1]):
                    if d[c] is not None and pv is not None:
                        d[c] = d[c] - pv
            if output_pane_info:
                d["__pane__"] = (float(now), ent[0], "ON_TIME", ent[0] == 0)
            out_rows.append(tuple(d.get(f.name) for f in schema.fields))
            state[key] = [ent[0] + 1, ent[2], ent[2], False]
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
    )
    writer = (
        df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(fb)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        # count triggers check every micro-batch; 1 s is the check cadence,
        # not the firing condition
        delay = max(cfg.get("early_delay_sec", 1.0), 0.1)
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
        self.flush_pending()
        return result

    def __getattr__(self, name):
        return getattr(self.query, name)
