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
    high-water mark (max window end seen so far, the foreachBatch-visible
    proxy for Spark's watermark): EARLY while the mark hasn't passed this
    window's end + lateness, ON_TIME after.

Scale posture: the foreachBatch state is one small tuple per ACTIVE
(window, key) pane on the driver — the same cardinality Spark's update
mode keeps in its state store — and entries evict once their window can
no longer fire.  Pane rows are post-aggregation (windows × keys), orders
of magnitude smaller than the input stream; the collect here is the
driver-side pane ledger, not a data-plane materialization.

Non-emulatable trigger families (afterPane element counts, afterEach /
afterFirst / afterAll composites) raise with the reason: Spark exposes no
per-key pane accounting to hang them on.

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

    if ttype == "afterWatermark":
        early = trigger.get("earlyFiringTrigger")
        if not early:
            return None
        if str(early.get("type")) != "afterProcessingTime":
            raise NotImplementedError(
                f"earlyFiringTrigger type '{early.get('type')}' is not "
                "emulatable on Spark (only afterProcessingTime; Spark has "
                "no per-key pane accounting for afterPane counts)"
            )
        return {"early_delay_sec": delay_of(early)}
    if ttype == "afterProcessingTime":
        # Beam wraps the repeated form as Repeatedly.forever(...) — the
        # same periodic-emission shape as an early-firing trigger
        return {"early_delay_sec": delay_of(trigger)}
    if ttype == "repeatedly":
        return parse_trigger({"trigger": trigger.get("foreverTrigger") or {}})
    raise NotImplementedError(
        f"trigger type '{ttype}' is not emulatable on Spark "
        "(afterPane/afterEach/afterFirst/afterAll need Beam pane state)"
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
):
    """foreachBatch function implementing pane semantics over update-mode
    micro-batches; ``sink_fn(batch_df, batch_id)`` persists pane rows.

    ``max_keys`` bounds the ledger for NON-windowed (global per-key)
    streams, where no watermark ever closes a pane: beyond the cap the
    least-recently-fired key is dropped (its next firing restarts at pane
    index 0 / full value — degraded metadata, bounded memory)."""
    # driver-side pane ledger: pane key -> (next_index, last_emitted_values)
    # dict insertion order doubles as the LRU queue (re-insert on update)
    state: dict[tuple, tuple[int, tuple]] = {}
    has_window = "window" in key_cols
    # event-time high-water mark (max window end seen) — the proxy
    # watermark visible from foreachBatch; drives pane timing + eviction
    high_water: list[float] = [float("-inf")]

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
        if not discarding and not output_pane_info:
            sink_fn(bdf, batch_id)  # plain accumulating panes: pass-through
            return
        rows = bdf.collect()
        now = time.time()
        schema = bdf.schema
        if output_pane_info:
            schema = T.StructType(
                [*schema.fields, T.StructField("__pane__", _PANE_STRUCT)]
            )
        if has_window:
            for r in rows:
                w = r["window"]
                if w is not None:
                    high_water[0] = max(high_water[0], w["end"].timestamp())
        out_rows = []
        for r in rows:
            d = r.asDict(recursive=False)
            key = pane_key(d)
            if key in state:
                idx, prev = state.pop(key)  # re-insert → LRU refresh
            else:
                idx, prev = 0, ()
            cur_vals = tuple(d[c] for c in value_cols)
            if discarding and prev:
                for c, pv in zip(value_cols, prev):
                    if d[c] is not None and pv is not None:
                        d[c] = d[c] - pv
            state[key] = (idx + 1, cur_vals)
            if output_pane_info:
                w_end = d["window"]["end"].timestamp() if has_window and d["window"] else None
                timing = (
                    "ON_TIME"
                    if w_end is not None and high_water[0] >= w_end + lateness_sec
                    else "EARLY"
                )
                d["__pane__"] = (float(now), idx, timing, idx == 0)
            out_rows.append(tuple(d.get(f.name) for f in schema.fields))
        # evict panes that can no longer fire (the proxy watermark is well
        # past window end + lateness) so the ledger stays bounded by the
        # stream's active windows
        if has_window:
            widx = key_cols.index("window")
            dead = [
                k
                for k in state
                if isinstance(k[widx], tuple)
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

    return run_batch


def stream_with_early_firing(
    df: DataFrame,
    strategy: dict[str, Any],
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool = False,
):
    """Start an update-mode stream with processing-time early firings;
    returns the StreamingQuery.  ``available_now: true`` drains the
    backlog in bounded micro-batches (each one an early firing) — the
    deterministic test/batch-parity path."""
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
    )
    writer = (
        df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(fb)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        delay = max(cfg["early_delay_sec"], 0.1)
        writer = writer.trigger(processingTime=f"{delay} seconds")
    return writer.start()
