"""`aggregation` transform: group-by + multi-input aggregates.

Reference: module/transform/AggregationTransform.java:20-255 — keys =
``groupFields`` (must exist in every input, 54-62); each input gets its own
aggregator list dispatched on MElement.index
(util/pipeline/Aggregation.java:159-164); optional post ``filter``, post
``select``, per-key ``limit``; ``fanout`` hot-key mitigation.

Spark strategy:
  * single input  → ``df.groupBy(keys).agg(*exprs)`` — Catalyst's
    HashAggregate does partial (map-side) + final combine, which subsumes
    both Beam's CombineFn lifting AND the ``fanout`` knob.  Group keys are
    native columns, never stringified (BASELINE.md commitment #2).
  * multi input   → aggregate each input separately, then full-outer join
    on the group keys (null-fill), matching the reference's merged
    accumulator output (SURVEY §2.2).
  * strategy window → grouping keys gain F.window(ts, size[, period]) /
    session_window (batch + streaming identical code).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_spark.compilers.aggregation import agg_name, compile_aggs
from pipeline_spark.compilers.filter_dsl import compile_filter
from pipeline_spark.compilers.select_fns import apply_select
from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module
from pipeline_spark.streaming import ensure_event_time


_TS_COMBINERS = ("end_of_window", "earliest", "latest")

# r15 perf: exact-distinct ops that trigger Catalyst's distinct rewrite,
# and object-buffer ops whose partial state is a per-group container
# (value-count map / quantile summary / collected array) rather than a
# few scalars
_EXACT_DISTINCT_OPS = frozenset({"count_distinct"})
_OBJECT_BUFFER_OPS = frozenset({"median", "percentile", "array_agg"})


def _agg_with_distinct_split(df, keys, key_names, aggs, ts_attr):
    """Split a mixed exact-distinct + object-buffer aggregate (r15 perf,
    guide §2.3 "shuffle fewer bytes").

    Catalyst rewrites ``count(DISTINCT x)`` by pre-aggregating on
    ``(group keys, x)`` and drags EVERY other aggregate's partial buffer
    through that per-distinct-value grouping — for object-buffer
    aggregates (exact percentile/median value maps, collected arrays)
    that shuffles one container per (group, x) pair through TWO
    exchanges (measured 2.7 s vs ~0.4 s on the agg_stats bench row,
    plan: 4 ObjectHashAggregate + 2 Exchange of 30 buffer columns).

    Split: distinct aggs run in their own lightweight plan (only tiny
    declarative buffers pass through the rewrite), everything else
    aggregates once at true group granularity, and a null-safe
    equi-join on the group keys recombines.  Same rows, same values,
    same column order — both sides group the same input by the same
    keys, so the key sets are identical and an inner join loses
    nothing; eqNullSafe keeps null-key groups.  Returns None when the
    split does not apply.
    """
    live = [a for a in aggs if not a.get("ignore")]

    def _op(a):
        return str(a.get("op", "")).lower()

    dist = [a for a in live if _op(a) in _EXACT_DISTINCT_OPS]
    heavy = [a for a in live if _op(a) in _OBJECT_BUFFER_OPS]
    if not dist or not heavy:
        return None
    rest = [a for a in live if _op(a) not in _EXACT_DISTINCT_OPS]
    left = df.groupBy(*keys).agg(*compile_aggs(rest, df, ts_attr))
    right = df.groupBy(*keys).agg(*compile_aggs(dist, df, ts_attr))
    ren_keys = [f"__dk{j}__" for j in range(len(key_names))]
    right = right.toDF(*ren_keys, *[agg_name(a) for a in dist])
    if key_names:
        cond = None
        for kn, rn in zip(key_names, ren_keys):
            c = left[kn].eqNullSafe(right[rn])
            cond = c if cond is None else cond & c
        joined = left.join(right, cond, "inner").drop(*ren_keys)
    else:
        # global aggregation: both sides are exactly one row
        joined = left.crossJoin(right)
    return joined.select(*key_names, *[agg_name(a) for a in live])


def _parse_ts_combiner(strategy: dict[str, Any]) -> str | None:
    """strategy.window.timestampCombiner (Strategy.java:72-74,129).

    Decides which event time the aggregated row carries downstream —
    the two-stage-windowing knob (window → aggregate → re-window):

      * ``end_of_window`` (Beam's default) → ``window.end - 1ms``
        (Beam's ``maxTimestamp``; the -1ms keeps the row inside its OWN
        window when re-windowed at the same size);
      * ``earliest`` → min input event time; ``latest`` → max.

    When the knob is absent the output keeps only the window struct
    (downstream selects window.start/window.end explicitly) — existing
    query schemas are unchanged; set the knob to get the reference's
    derived event-time column.
    """
    w = (strategy or {}).get("window") or {}
    c = w.get("timestampCombiner")
    if c is None:
        return None
    cs = str(c).strip().lower()
    if cs not in _TS_COMBINERS:
        raise ValueError(
            "strategy.window.timestampCombiner must be one of "
            f"{'/'.join(_TS_COMBINERS)}, got '{c}'"
        )
    wtype = str(w.get("type", "global")).lower()
    if wtype == "global":
        raise ValueError(
            "strategy.window.timestampCombiner needs a non-global window "
            "(fixed/sliding/session/calendar) — a global window has no "
            "per-window output timestamp to combine"
        )
    return cs


def _end_of_window_col(out: DataFrame, strategy: dict[str, Any]):
    """window.end - 1ms; calendar windows add their unit to the start."""
    from pyspark.sql import types as T

    one_ms = F.expr("INTERVAL 1 MILLISECOND")
    if isinstance(out.schema["window"].dataType, T.StructType):
        return F.col("window.end") - one_ms
    cal_unit = str((strategy.get("window") or {}).get("unit", "day")).lower()
    iv = {
        "day": "INTERVAL 1 DAY",
        "week": "INTERVAL 7 DAY",
        "month": "INTERVAL 1 MONTH",
        "year": "INTERVAL 1 YEAR",
    }[cal_unit]
    return F.col("window") + F.expr(iv) - one_ms


def _is_discarding(strategy: dict[str, Any]) -> bool:
    return str(strategy.get("accumulationMode", "accumulating")).lower() in (
        "discarding", "discarding_fired_panes"
    )


def _hidden_ts_spec(i: int, ts_combiner: str, ts_attr: str) -> dict[str, str]:
    """The hidden min/max aggregate that materializes earliest/latest."""
    return {
        "name": f"__tsc{i}__",
        "op": "min" if ts_combiner == "earliest" else "max",
        "field": ts_attr,
    }


def _window_key(strategy: dict[str, Any] | None, ts_col: str):
    """strategy.window → extra grouping column (reference: Strategy.java:185-215)."""
    if not strategy or not strategy.get("window"):
        return None
    w = strategy["window"]
    wtype = str(w.get("type", "global")).lower()
    unit = str(w.get("unit", "second")).lower()

    def dur(key: str, default: int = 0) -> str:
        mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit]
        return f"{int(w.get(key, default)) * mult} seconds"

    if wtype in ("fixed", "tumbling"):
        return F.window(F.col(ts_col), dur("size"))
    if wtype == "sliding":
        return F.window(F.col(ts_col), dur("size"), dur("period"))
    if wtype == "session":
        return F.session_window(F.col(ts_col), dur("gap"))
    if wtype == "calendar":
        cal_unit = str(w.get("unit", "day")).lower()
        trunc = {"day": "DAY", "week": "WEEK", "month": "MONTH", "year": "YEAR"}[cal_unit]
        return F.date_trunc(trunc, F.col(ts_col))
    if wtype == "global":
        return None
    raise ValueError(f"unknown window type '{wtype}'")


@module("aggregation", kind=KIND_TRANSFORM)
def aggregation_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    group_fields: list[str] = p.get("groupFields") or []
    if p.get("groupField"):
        group_fields = [p["groupField"], *group_fields]
    ts_attr = ctx.config.get("timestampAttribute")

    agg_specs = p.get("aggregations") or []
    # aggregations may be flat (single input) or per-input: [{input, fields:[...]}]
    per_input: list[list[dict[str, Any]]]
    if agg_specs and "fields" in agg_specs[0]:
        by_input = {a.get("input"): a["fields"] for a in agg_specs}
        per_input = [
            by_input.get(name, by_input.get(None, []))
            for name in (ctx.input_names or [None])
        ]
    else:
        per_input = [agg_specs]

    strategy = ctx.config.get("strategy") or {}
    # validated unconditionally at plan time so a typo'd combiner fails
    # on every config, not only once a window fires
    ts_combiner = _parse_ts_combiner(strategy)
    if ts_combiner and not ts_attr:
        raise ValueError(
            "strategy.window.timestampCombiner requires timestampAttribute"
        )
    hidden_ts_cols: list[str] = []
    results: list[DataFrame] = []
    for i, (df, aggs) in enumerate(zip(ctx.inputs, per_input)):
        if not aggs:
            continue
        if df.isStreaming and ts_attr:
            # allowedLateness → watermark delay (Strategy.java:69-71).
            # Divergence from Beam documented in streaming/__init__.py:
            # post-watermark rows are dropped, not re-fired.
            lateness = strategy.get("allowedLateness", "10 seconds")
            if isinstance(lateness, (int, float)):
                lateness = f"{int(lateness)} seconds"
            df = ensure_event_time(df, ts_attr)
            df = df.withWatermark(ts_attr, lateness)
        if (
            df.isStreaming
            and str(strategy.get("paneStateBackend", "driver")) == "executor"
        ):
            # scale path: fuse the windowed aggregation and the pane
            # ledger into ONE applyInPandasWithState operator so trigger
            # state lives executor-side in the state store instead of the
            # sink's driver ledger (streaming/panes.py).  Raises (never
            # silently falls back) when the surface needs the full
            # compiler — a quiet fallback would double-ledger at the sink.
            from pipeline_spark.streaming.panes import stream_panes_with_state
            from pipeline_spark.streaming.triggers import parse_trigger

            if parse_trigger(strategy) is None:
                raise ValueError(
                    "paneStateBackend executor needs an early-firing "
                    "trigger in the strategy (plain watermark aggregation "
                    "already scales without a ledger)"
                )
            if not ts_attr:
                raise ValueError(
                    "paneStateBackend executor requires timestampAttribute"
                )
            if len(per_input) > 1 or p.get("pivot") or (
                str(p.get("groupType", "group")).lower() != "group"
            ):
                raise NotImplementedError(
                    "paneStateBackend executor supports a single input with "
                    "plain grouping (no pivot/rollup/cube)"
                )
            pane_aggs = aggs
            if ts_combiner in ("earliest", "latest"):
                if _is_discarding(strategy):
                    raise ValueError(
                        "timestampCombiner earliest/latest tracks a min/max "
                        "over event time, which discarding panes cannot "
                        "delta — use accumulating mode or end_of_window"
                    )
                spec = _hidden_ts_spec(i, ts_combiner, ts_attr)
                hidden_ts_cols.append(spec["name"])
                pane_aggs = [*aggs, spec]
            results.append(
                stream_panes_with_state(
                    df, ts_attr, group_fields, pane_aggs, strategy
                )
            )
            continue
        if df.isStreaming and ts_combiner in ("earliest", "latest"):
            # r14 review find: the sink's driver pane ledger keys pane
            # identity on every non-numeric column (split_pane_columns)
            # — a derived event-time that MOVES with min/max would split
            # the pane per firing (index resets, duplicate discarding
            # deltas).  Refuse whenever that ledger would engage;
            # plain accumulating early firings pass through untouched.
            from pipeline_spark.streaming.triggers import ledger_engages

            if ledger_engages(strategy):
                raise ValueError(
                    "timestampCombiner earliest/latest with the driver "
                    "pane ledger: the derived event-time column varies "
                    "per firing and would split pane identity (pane "
                    "indexes reset, discarding deltas double-count).  "
                    "Use strategy.paneStateBackend: executor (fully "
                    "supported) or timestampCombiner: end_of_window "
                    "(window-constant)."
                )
        keys = [F.col(g) for g in group_fields]
        wkey = _window_key(strategy, ts_attr) if ts_attr else None
        if wkey is not None:
            keys = [wkey.alias("window"), *keys]
        if wkey is not None and ts_combiner in ("earliest", "latest"):
            if p.get("pivot"):
                raise ValueError(
                    "timestampCombiner earliest/latest cannot combine with "
                    "pivot (the hidden event-time aggregate would expand "
                    "per pivot value); use end_of_window"
                )
            spec = _hidden_ts_spec(i, ts_combiner, ts_attr)
            hidden_ts_cols.append(spec["name"])
            aggs = [*aggs, spec]
        exprs = compile_aggs(aggs, df, ts_attr)
        group_type = str(p.get("groupType", "group")).lower()
        pivot_cfg = p.get("pivot")
        if group_type not in ("group", "rollup", "cube"):
            raise ValueError(
                f"aggregation: groupType must be group/rollup/cube, got "
                f"'{group_type}'"
            )
        if group_type != "group" and ts_combiner:
            # grouping-set subtotal rows carry a NULL window key, so
            # end_of_window would derive a NULL event time and
            # earliest/latest a cross-window min/max on subtotal rows —
            # rows that then vanish or mis-window in a second stage
            raise ValueError(
                "aggregation: timestampCombiner cannot combine with "
                "groupType rollup/cube (subtotal rows have no window to "
                "derive an event time from); use groupType: group"
            )
        if group_type != "group" and df.isStreaming:
            raise ValueError(
                "aggregation: rollup/cube need a bounded input (Spark has "
                "no streaming grouping-sets state)"
            )
        if group_type == "rollup":
            grouped = df.rollup(*keys)
        elif group_type == "cube":
            grouped = df.cube(*keys)
        else:
            grouped = df.groupBy(*keys)
        if pivot_cfg:
            # subtotal rows with a pivoted column are ambiguous — refuse
            if group_type != "group":
                raise ValueError("aggregation: pivot requires groupType: group")
            field = pivot_cfg.get("field") if isinstance(pivot_cfg, dict) else pivot_cfg
            if not field:
                raise ValueError("aggregation: pivot needs 'field'")
            values = pivot_cfg.get("values") if isinstance(pivot_cfg, dict) else None
            # explicit values keep the output schema static (required for
            # streaming and for engine-reproducible column order)
            grouped = grouped.pivot(field, values) if values else grouped.pivot(field)
        split = None
        if group_type == "group" and not pivot_cfg and not df.isStreaming:
            key_names = (
                ["window"] if wkey is not None else []
            ) + list(group_fields)
            split = _agg_with_distinct_split(df, keys, key_names, aggs, ts_attr)
        results.append(split if split is not None else grouped.agg(*exprs))

    if not results:
        raise ValueError("aggregation requires aggregations")
    out = results[0]
    join_keys = group_fields if not (ctx.config.get("strategy") or {}).get("window") else ["window", *group_fields]
    for other in results[1:]:
        out = out.join(other, on=[k for k in join_keys if k in out.columns and k in other.columns], how="full_outer")

    if ts_combiner and "window" in out.columns:
        if ts_combiner == "end_of_window":
            tcol = _end_of_window_col(out, strategy)
        else:
            # per-input hidden min/max; least/greatest skip the nulls a
            # full-outer multi-input join introduces
            cols = [F.col(c) for c in hidden_ts_cols if c in out.columns]
            if len(cols) == 1:
                tcol = cols[0]
            else:
                pick = F.least if ts_combiner == "earliest" else F.greatest
                tcol = pick(*cols)
        # Spark's drop is lenient about absent names
        out = out.withColumn(ts_attr, tcol).drop(*hidden_ts_cols)

    if p.get("outputPaneInfo"):
        # Beam pane accounting (reference: AggregationTransform.java:36 —
        # declared there but dead upstream; semantics from Beam's
        # PaneInfo).  Batch = exactly one ON_TIME pane (exact parity).
        # Streaming: firing_time is the micro-batch timestamp
        # (current_timestamp resolves per batch) and timing classifies
        # against the window end; Beam's per-key firing index has no
        # stateless Spark equivalent — emitted null (documented
        # divergence, streaming/__init__.py).
        is_streaming = any(df.isStreaming for df in ctx.inputs)
        if not is_streaming:
            timing = F.lit("ON_TIME")
            index: Any = F.lit(0).cast("long")
            is_first = F.lit(True)
            is_last = F.lit(True)
        else:
            has_window = "window" in out.columns
            timing = (
                F.when(F.col("window.end") <= F.current_timestamp(), F.lit("ON_TIME"))
                .otherwise(F.lit("EARLY"))
                if has_window
                else F.lit("EARLY")
            )
            index = F.lit(None).cast("long")
            is_first = F.lit(None).cast("boolean")
            is_last = F.lit(None).cast("boolean")
        out = out.withColumn(
            "pane",
            F.struct(
                F.current_timestamp().alias("firing_time"),
                timing.alias("timing"),
                index.alias("index"),
                is_first.alias("is_first"),
                is_last.alias("is_last"),
            ),
        )

    if p.get("filter"):
        out = out.filter(compile_filter(p["filter"], out))
    if p.get("select"):
        out = apply_select(out, p["select"])
    if p.get("limit"):
        from pipeline_spark.operators.limit import apply_limit

        out = apply_limit(out, p["limit"], group_fields, ts_attr)
    return {"": out}
