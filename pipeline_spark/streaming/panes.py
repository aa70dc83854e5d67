"""Executor-side pane ledger: trigger emulation in Spark keyed state.

The foreachBatch ledger in streaming/triggers.py is exact but driver-side:
every changed (window, key) pane funnels through one collect() per
micro-batch.  Honest and bounded at moderate key cardinality — but the
100×-scale keyed stream needs the ledger to live WHERE THE KEYS LIVE.

Spark rejects a second stateful operator after an update-mode windowed
aggregation, so the scale path fuses BOTH stages into one
``applyInPandasWithState`` over the RAW event stream keyed by the group
fields: per-key state holds each active window's incremental aggregate
accumulators AND its pane ledger entry (index, fired values, cycle,
closure).  One stateful operator, state in Spark's checkpointed state
store, pane rows emitted executor-side — the sink appends micro-batch
output with no driver ledger at all.

Engaged with ``strategy.paneStateBackend: executor`` (the driver ledger
stays the default — it has exact end-of-stream flush semantics that
keyed state cannot reproduce, see below).  The supported surface is the
incrementally-computable one; everything else raises with the reason so
a silent fallback never double-ledgers:

  * aggregations: count / sum / min / max / avg — over a plain field OR
    with ``condition`` / ``expression`` / avg ``weightField`` (r6):
    those compile to JVM-side derived Columns upstream of the stateful
    operator via the batch compiler's own compile_filter /
    compile_expression, so state stays plain-field accumulation — PLUS
    first / last / argmax / argmin (r7): single-value champion state
    ((ordering, value) per window, O(1), session-mergeable) matching
    the batch compiler's min_by/max_by semantics — PLUS std (r7):
    exact incremental moments (n, Σx, Σx²), the batch compiler's own
    general-ddof formula — PLUS, OPT-IN via
    ``strategy.paneAllowUnboundedState: true`` (r11): exact median /
    percentile / array_agg / count_distinct, whose keyed state buffers
    the window's elements (or distinct set) per key — the cost Beam's
    own exact combiners pay.  Without the opt-in they refuse loudly:
    the default contract is bounded per-key state, and this backend
    never substitutes sketch approximations (see SCALE.md §streaming);
  * windows: fixed, sliding, global, session, calendar
    (day/week/month/year, truncated in the session timezone like the
    batch path's date_trunc; emitted as the batch shape's plain
    truncated timestamp).  Session windows merge keyed state in place
    (``_WinState.merge_from``): overlapping windows combine
    accumulators and ledger state before trigger evaluation;
  * triggers: afterProcessingTime / afterPane leaves, afterFirst /
    afterAll / afterEach composites, finalTrigger (lateFiringTrigger is
    rejected: post-watermark rows never reach this operator, so LATE
    panes cannot fire — the driver backend re-fires them);
  * accumulation: accumulating always; discarding only for count/sum
    (a per-pane delta of min/max/avg is not a numeric difference —
    rejected loudly, matching what the driver ledger's delta can
    actually express correctly).

Watermark semantics: the stream is ``withWatermark(ts, allowedLateness)``
upstream, so ``state.getCurrentWatermarkMs() >= window.end`` IS Beam's
"watermark passed end-of-window + lateness" — no proxy high-water mark.
Window closure fires through EventTimeTimeout timers, so a withheld
count-trigger pane flushes ON_TIME even when its key receives no more
rows.  Divergences vs the driver ledger, both documented here and in
SCALE.md: (1) rows arriving after the watermark are dropped by Spark
before the stateful operator (the aggregation path's documented
lateness contract), so LATE panes cannot occur and lateFiringTrigger is
rejected; (2) windows whose end the watermark never passes
(the stream's trailing edge on bounded runs) emit their final flush only
if a later event advances the watermark past them — the driver ledger's
drain-time flush_pending has no keyed-state equivalent.  Streaming-test
inputs push the watermark past every window with a far-future sentinel
event, the same pattern Spark's own streaming tests use.

State-format note: keyed state blobs are pickled ``_WinState`` objects —
fine for same-version checkpoint resume, but NOT portable across
pipeline_spark versions (a field added to ``_WinState`` invalidates old
checkpoints).  Bump a checkpoint directory when upgrading.

Reference: module/Strategy.java:232-343 (trigger surface); the driver
twin is streaming/triggers.py.
"""

from __future__ import annotations

import pickle
import time
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pipeline_spark.streaming.triggers import _eval_tree, parse_trigger

from pipeline_spark.streaming.triggers import _PANE_STRUCT as _PANE_FIELDS

_EXEC_OPS = (
    "count", "sum", "min", "max", "avg",
    "first", "last", "argmax", "argmin", "std",
    "median", "percentile", "array_agg", "count_distinct",
)

#: exact-but-buffered ops (r11): keyed state holds the window's elements
#: (median/percentile/array_agg) or its distinct set (count_distinct,
#: array_agg distinct) — state grows with rows per (key, window), the
#: cost Beam's own exact combiners pay.  Opt-in via
#: ``strategy.paneAllowUnboundedState: true`` so the default contract
#: (bounded per-key state) never silently degrades.
_BUFFERED_OPS = ("median", "percentile", "array_agg", "count_distinct")


def parse_exec_aggs(
    agg_specs: list[dict[str, Any]], df: DataFrame, ts_col: str | None = None,
    allow_unbounded: bool = False,
) -> tuple[DataFrame, list[tuple[str, str, Any]]]:
    """Validate + compile aggregations for the executor backend: returns
    ``(df_with_derived_columns, [(name, op, field)])`` — or raise naming
    the entry that needs the driver backend.

    Conditions, weights and expressions (r6, VERDICT r5 ask #6) compile
    to JVM-side derived Columns UPSTREAM of the stateful operator using
    the SAME ``compile_filter``/``compile_expression`` the batch
    aggregation compiler uses, so the keyed state stays plain-field
    accumulation and the per-row Python work never re-evaluates an
    expression:

      * ``expression`` → one derived column;
      * ``condition``  → ``when(cond, value)`` (null when false), which
        count/sum/min/max/avg skip exactly like the batch filtered
        aggregate; a field-less conditioned count counts
        ``when(cond, 1)`` (the batch compiler's shape);
      * ``avg`` + ``weightField`` → op ``wavg`` with TWO derived columns
        (``v*w`` and ``when(v.isNotNull(), w)``) whose running sums
        divide at emit — the batch ``sum(v*w)/sum(when(v.isNotNull(),
        w))`` semantics.
    """
    from pyspark.sql import functions as F

    from pipeline_spark.compilers.expression import (
        compile_expression,
        schema_resolver,
    )
    from pipeline_spark.compilers.filter_dsl import compile_filter

    out: list[tuple[str, str, Any]] = []
    derived: dict[str, Any] = {}

    def add_col(col) -> str:
        cname = f"__ea{len(derived)}__"
        derived[cname] = col
        return cname

    for a in agg_specs:
        if a.get("ignore"):
            continue
        op = str(a.get("op", "")).lower()
        name = a.get("name") or a.get("field") or op
        if op not in _EXEC_OPS:
            raise NotImplementedError(
                f"paneStateBackend executor: aggregation '{name}' op '{op}' "
                "is not incrementally computable in keyed state "
                f"(supported: {', '.join(_EXEC_OPS)}); use the driver backend"
            )
        if op in _BUFFERED_OPS and not allow_unbounded:
            raise NotImplementedError(
                f"paneStateBackend executor: '{op}' is exact-but-buffered "
                "— keyed state holds the window's elements (or distinct "
                "set), growing with rows per key.  Opt in with "
                "strategy.paneAllowUnboundedState: true, or use the "
                "driver backend"
            )
        field = a.get("field")
        if op == "array_agg" and not field and not a.get("expression"):
            flds = a.get("fields") or []
            if len(flds) == 1:
                field = flds[0]
            elif flds:
                raise NotImplementedError(
                    "paneStateBackend executor: multi-field array_agg "
                    "(struct elements) — use the driver backend"
                )
        expr = a.get("expression")
        cond = a.get("condition")
        if field and field not in df.columns:
            raise ValueError(f"aggregation '{name}': unknown field '{field}'")
        if op in ("first", "last", "argmax", "argmin"):
            # single-value keyed state (r7, VERDICT r6 ask #6): track the
            # (ordering, value) champion per window — O(1) state, fully
            # mergeable for session windows.  Ordering column = event time
            # for first/last (the batch compiler's min_by/max_by(v, ts)),
            # comparingField/Expression for argmin/argmax; a condition
            # guards the ORDERING column exactly like the batch _guard, so
            # non-matching rows can never become the champion.
            fields = a.get("fields")
            if fields:
                val_col = F.struct(*[F.col(f) for f in fields])
            elif expr:
                val_col = compile_expression(str(expr), schema_resolver(df))
            elif field:
                val_col = F.col(field)
            else:
                raise ValueError(
                    f"aggregation '{name}' ({op}) needs fields, a field "
                    "or an expression"
                )
            if op in ("first", "last"):
                if not ts_col:
                    raise ValueError(
                        f"aggregation '{name}' ({op}) needs an event-time "
                        "column (timestampAttribute)"
                    )
                # the ordering IS the row's event time — a derived copy of
                # the watermark column would register as a SECOND event-
                # time column and fail the stream, so the stateful fn uses
                # the per-row epoch it already computes (sentinel \x00ts);
                # a condition becomes a separate boolean guard column
                guard = (
                    add_col(compile_filter(cond, df))
                    if cond is not None else None
                )
                out.append((name, op, (add_col(val_col), "\x00ts", guard)))
                continue
            if a.get("comparingExpression"):
                cmp_col = compile_expression(
                    str(a["comparingExpression"]), schema_resolver(df)
                )
            elif a.get("comparingField"):
                cmp_col = F.col(str(a["comparingField"]))
            else:
                raise ValueError(
                    f"aggregation '{name}' ({op}) needs comparingField "
                    "or comparingExpression"
                )
            if cond is not None:
                cmp_col = F.when(compile_filter(cond, df), cmp_col)
            out.append((name, op, (add_col(val_col), add_col(cmp_col), None)))
            continue
        if op != "count" and not field and not expr:
            raise ValueError(
                f"aggregation '{name}' ({op}) needs a field or expression"
            )
        col = None
        if expr:
            col = compile_expression(str(expr), schema_resolver(df))
        elif field:
            col = F.col(field)
        if op == "std":
            # exact incremental moments (r7): (n, Σx, Σx²) in keyed state,
            # sqrt(M2/(n-ddof)) at emit — the batch compiler's own general-
            # ddof formula, mergeable for session windows
            v = col.cast("double")
            if cond is not None:
                v = F.when(compile_filter(cond, df), v)
            out.append((name, "std", (add_col(v), int(a.get("ddof", 1)))))
            continue
        if op == "avg" and a.get("weightField"):
            w = F.col(str(a["weightField"]))
            v = col
            if cond is not None:
                c = compile_filter(cond, df)
                v = F.when(c, v)
                w = F.when(c, w)
            vw = add_col((v * w).cast("double"))
            wg = add_col(F.when(v.isNotNull(), w).cast("double"))
            out.append((name, "wavg", (vw, wg)))
            continue
        if cond is not None:
            c = compile_filter(cond, df)
            if op == "count":
                # batch shape: a conditioned count counts matching ROWS,
                # independent of any field's nullity
                col = F.when(c, F.lit(1))
            else:
                col = F.when(c, col)
        if col is not None and (expr or cond is not None):
            field = add_col(col)
        if op == "percentile":
            # exact percentile (batch F.percentile's linear interpolation;
            # the approx variant resolves to the exact value here)
            out.append((name, op, (field, float(a.get("percentile", 0.5)))))
            continue
        if op == "array_agg":
            out.append((name, op, (field, bool(a.get("distinct")))))
            continue
        out.append((name, op, field))
    if not out:
        raise ValueError("paneStateBackend executor: no aggregations")
    df2 = df
    for cname, col in derived.items():
        df2 = df2.withColumn(cname, col)
    return df2, out


def _window_params(strategy: dict[str, Any]) -> tuple[str, float, float, str]:
    """(type, size_sec, period_sec, calendar_unit) for the
    executor-supported windows."""
    w = strategy.get("window") or {}
    wtype = str(w.get("type", "global")).lower()
    unit = str(w.get("unit", "second")).lower()
    if wtype == "calendar":
        cal = str(w.get("unit", "day")).lower()
        if cal not in ("day", "week", "month", "year"):
            raise ValueError(
                f"paneStateBackend executor: calendar unit '{cal}' "
                "(day/week/month/year)"
            )
        return "calendar", 0.0, 0.0, cal
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit]
    if wtype == "session":
        gap = int(w.get("gap", 0)) * mult
        if gap <= 0:
            raise ValueError(
                "paneStateBackend executor: session window needs gap > 0"
            )
        return "session", float(gap), 0.0, ""
    if wtype in ("fixed", "tumbling"):
        size = int(w.get("size", 0)) * mult
        if size <= 0:
            raise ValueError(
                "paneStateBackend executor: fixed window needs size > 0"
            )
        return "fixed", float(size), float(size), ""
    if wtype == "sliding":
        size = int(w.get("size", 0)) * mult
        period = int(w.get("period", 0)) * mult
        if size <= 0 or period <= 0:
            raise ValueError(
                "paneStateBackend executor: sliding window needs "
                "size > 0 and period > 0"
            )
        return "sliding", float(size), float(period), ""
    if wtype == "global":
        return "global", 0.0, 0.0, ""
    raise NotImplementedError(
        f"paneStateBackend executor: window type '{wtype}' — use the "
        "driver backend"
    )


def _agg_out_type(op: str, field, df: DataFrame):
    if op == "count":
        return T.LongType()
    if op in ("avg", "wavg"):
        return T.DoubleType()
    if op == "std":
        return T.DoubleType()
    if op in ("first", "last", "argmax", "argmin"):
        return df.schema[field[0]].dataType  # the derived value column
    if op in ("median", "percentile"):
        return T.DoubleType()  # batch F.median / F.percentile output
    if op == "count_distinct":
        return T.LongType()
    if op == "array_agg":
        return T.ArrayType(df.schema[field[0]].dataType)
    src = df.schema[field].dataType
    if op == "sum":
        return T.LongType() if isinstance(src, T.IntegralType) else T.DoubleType()
    return src  # min / max keep the input type


class _WinState:
    """One window's accumulators + pane ledger entry (pickled per key)."""

    def merge_from(self, other: "_WinState") -> None:
        """Session-window merge: combine the other window's accumulators
        and ledger state into this one (all supported aggregations are
        mergeable; trigger counts sum like Beam's merging-window trigger
        state; the merged window's watermark pane is pending again)."""
        self.n += other.n
        for k, v in other.sums.items():
            self.sums[k] = self.sums.get(k, 0.0) + v
        for k, v in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v
        for k, v in other.mins.items():
            cur = self.mins.get(k)
            self.mins[k] = v if cur is None else min(cur, v)
        for k, v in other.maxs.items():
            cur = self.maxs.get(k)
            self.maxs[k] = v if cur is None else max(cur, v)
        for k, entry in other.args.items():
            cur = self.args.get(k)
            if cur is None:
                self.args[k] = entry
            else:
                c_new, _v, want_max = entry
                if (c_new > cur[0]) if want_max else (c_new < cur[0]):
                    self.args[k] = entry
        for k, buf in other.bufs.items():
            self.bufs.setdefault(k, []).extend(buf)
        for k, s in other.sets.items():
            self.sets.setdefault(k, {}).update(s)
        self.idx = max(self.idx, other.idx)
        self.fired = None  # merged content has no previous-pane baseline
        self.fired_n += other.fired_n
        self.dirty = self.dirty or other.dirty
        if other.cycle_start is not None:
            self.cycle_start = (
                other.cycle_start
                if self.cycle_start is None
                else min(self.cycle_start, other.cycle_start)
            )
        self.each_ptr = max(self.each_ptr, other.each_ptr)
        self.on_time_fired = False
        self.birth = min(self.birth, other.birth)

    __slots__ = (
        "n", "sums", "mins", "maxs", "counts", "args", "bufs", "sets",
        "idx", "fired", "fired_n", "dirty", "cycle_start", "each_ptr",
        "on_time_fired", "closed", "birth",
    )

    def __init__(self, now: float):
        self.n = 0                    # total rows (count-trigger source)
        self.sums: dict[str, float] = {}
        self.mins: dict[str, Any] = {}
        self.maxs: dict[str, Any] = {}
        self.counts: dict[str, int] = {}  # non-null counts per field
        self.args: dict[str, tuple] = {}  # first/last/argmin/argmax champions
        self.bufs: dict[str, list] = {}   # buffered elements (opt-in ops)
        self.sets: dict[str, dict] = {}   # distinct sets (insertion-ordered)
        self.idx = 0
        self.fired: tuple | None = None  # values at last firing
        self.fired_n = 0              # row count at last firing
        self.dirty = False
        self.cycle_start: float | None = None
        self.each_ptr = 0
        self.on_time_fired = False
        self.closed = False
        self.birth = now


def stream_panes_with_state(
    df: DataFrame,
    ts_col: str,
    group_fields: list[str],
    agg_specs: list[dict[str, Any]],
    strategy: dict[str, Any],
) -> DataFrame:
    """The fused windowed-aggregation + pane-ledger stateful operator.

    ``df`` must already carry ``withWatermark(ts_col, allowedLateness)``
    (the aggregation module applies it); returns the pane-row stream.
    """
    cfg = parse_trigger(strategy) or {}
    df, aggs = parse_exec_aggs(
        agg_specs, df, ts_col=ts_col,
        allow_unbounded=bool(strategy.get("paneAllowUnboundedState")),
    )
    wtype, size, period, cal_unit = _window_params(strategy)
    mode = str(strategy.get("accumulationMode", "accumulating")).lower()
    discarding = mode in ("discarding", "discarding_fired_panes")
    if discarding and wtype == "session":
        raise NotImplementedError(
            "paneStateBackend executor: discarding panes on session "
            "windows — merged sessions have no well-defined previous-pane "
            "delta; use accumulating mode"
        )
    if discarding:
        bad = [
            name for name, op, _f in aggs
            if op in ("min", "max", "avg", "wavg", "std",
                      "first", "last", "argmax", "argmin",
                      "median", "percentile", "array_agg",
                      "count_distinct")
        ]
        if bad:
            raise NotImplementedError(
                f"paneStateBackend executor: discarding panes for {bad} — "
                "per-pane deltas are only sound for count/sum (min/max/avg "
                "of only-new elements is not a numeric difference); use "
                "accumulating mode"
            )
    pane_info = bool(strategy.get("outputPaneInfo", False))

    early_delay = cfg.get("early_delay_sec")
    early_count = cfg.get("early_count")
    trigger_tree = cfg.get("tree")
    if cfg.get("late_tree") is not None:
        raise NotImplementedError(
            "paneStateBackend executor: lateFiringTrigger — Spark filters "
            "post-watermark rows before this operator, so LATE panes can "
            "never fire here; the driver backend's proxy-watermark window "
            "does re-fire late updates"
        )
    final_tree = cfg.get("final_tree")

    # pandas receives TimestampType as SESSION-LOCAL naive datetimes and
    # Spark reinterprets naive output the same way, while the watermark is
    # true epoch — convert through the session timezone on both sides or
    # a non-UTC session closes every window offset-by-timezone wrong
    session_tz = str(
        df.sparkSession.conf.get("spark.sql.session.timeZone")
    )
    has_window = wtype != "global"
    is_calendar = wtype == "calendar"
    out_fields: list[T.StructField] = []
    if is_calendar:
        out_fields.append(T.StructField("window", T.TimestampType()))
    elif has_window:
        out_fields.append(
            T.StructField(
                "window",
                T.StructType(
                    [
                        T.StructField("start", T.TimestampType()),
                        T.StructField("end", T.TimestampType()),
                    ]
                ),
            )
        )
    for g in group_fields:
        out_fields.append(
            T.StructField(g, df.schema[g].dataType, df.schema[g].nullable)
        )
    int_sums = set()
    for name, op, field in aggs:
        t = _agg_out_type(op, field, df)
        if op == "sum" and isinstance(t, T.LongType):
            int_sums.add(name)
        out_fields.append(T.StructField(name, t))
    if pane_info:
        out_fields.append(T.StructField("__pane__", _PANE_FIELDS))
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType([T.StructField("blob", T.BinaryType())])
    value_names = [name for name, _op, _f in aggs]

    def assign_windows(ts_epoch: float) -> list[tuple[float, float]]:
        if wtype == "calendar":
            # calendar arithmetic runs in the SESSION timezone, matching
            # the batch path's date_trunc grouping column
            t = pd.Timestamp(ts_epoch, unit="s", tz="UTC").tz_convert(
                session_tz
            )
            if cal_unit == "day":
                start = t.normalize()
                end = start + pd.Timedelta(days=1)
            elif cal_unit == "week":
                start = (t - pd.Timedelta(days=t.weekday())).normalize()
                end = start + pd.Timedelta(days=7)
            elif cal_unit == "month":
                start = t.normalize().replace(day=1)
                end = start + pd.DateOffset(months=1)
            else:
                start = t.normalize().replace(month=1, day=1)
                end = start + pd.DateOffset(years=1)
            return [(start.timestamp(), end.timestamp())]
        if wtype == "fixed":
            start = (ts_epoch // size) * size
            return [(start, start + size)]
        # sliding: every period-aligned window containing ts
        w = (ts_epoch // period) * period
        out = []
        while w > ts_epoch - size:
            out.append((w, w + size))
            w -= period
        return out

    def values_of(ws: _WinState) -> tuple:
        vals = []
        for name, op, field in aggs:
            if op == "count":
                vals.append(ws.counts.get(name, 0) if field else ws.n)
            elif op == "sum":
                v = ws.sums.get(name)
                vals.append(None if v is None else (
                    int(v) if name in int_sums else v
                ))
            elif op == "avg":
                c = ws.counts.get(name, 0)
                vals.append(ws.sums.get(name, 0.0) / c if c else None)
            elif op == "wavg":
                den = ws.sums.get(name + "\x00w")
                vals.append(
                    ws.sums.get(name, 0.0) / den if den else None
                )
            elif op == "std":
                import math

                c = ws.counts.get(name, 0)
                ddof = field[1]
                if c == 0 or c <= ddof:
                    # batch parity: stddev_samp of one row is NaN; the
                    # general formula's n==ddof divides by zero -> null
                    vals.append(
                        float("nan") if (ddof == 1 and c == 1) else None
                    )
                else:
                    s = ws.sums.get(name, 0.0)
                    m2 = max(0.0, ws.sums.get(name + "\x00sq", 0.0) - s * s / c)
                    vals.append(math.sqrt(m2 / (c - ddof)))
            elif op in ("first", "last", "argmax", "argmin"):
                e = ws.args.get(name)
                vals.append(None if e is None else e[1])
            elif op in ("median", "percentile"):
                # batch F.median / F.percentile: exact linear interpolation
                q = 0.5 if op == "median" else field[1]
                buf = sorted(float(x) for x in ws.bufs.get(name, []))
                if not buf:
                    vals.append(None)
                else:
                    r = (len(buf) - 1) * q
                    lo = int(r)
                    frac = r - lo
                    vals.append(
                        buf[lo] if frac == 0 or lo + 1 >= len(buf)
                        else buf[lo] + (buf[lo + 1] - buf[lo]) * frac
                    )
            elif op == "array_agg":
                src = ws.sets.get(name, {}) if field[1] else ws.bufs.get(
                    name, [])
                vals.append(list(src))
            elif op == "count_distinct":
                vals.append(len(ws.sets.get(name, {})))
            elif op == "min":
                vals.append(ws.mins.get(name))
            else:
                vals.append(ws.maxs.get(name))
        return tuple(vals)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        windows: dict[Any, _WinState] = (
            pickle.loads(state.get[0]) if state.exists else {}
        )
        now = time.time()
        wm_sec = state.getCurrentWatermarkMs() / 1000.0

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts = pdf[ts_col]
                dts = str(ts.dtype)
                if dts.startswith("datetime64"):
                    if session_tz not in ("UTC", "Etc/UTC", "GMT"):
                        # ambiguous=True = first (DST) occurrence, never
                        # NaT: a NaT epoch would become a NaN-keyed
                        # window that never closes (NaN != NaN) and
                        # leaks state per affected row
                        ts = ts.dt.tz_localize(
                            session_tz, ambiguous=True,
                            nonexistent="shift_forward",
                        )
                    # pandas 2 Arrow conversion can deliver any datetime64
                    # unit (us from parquet-born frames, ns from Spark's
                    # own batches) — scale by the ACTUAL unit, or every
                    # window start is off by the unit ratio
                    import re as _re

                    m = _re.search(r"\[(\w+)", str(ts.dtype))
                    div = {"s": 1e0, "ms": 1e3, "us": 1e6, "ns": 1e9}[
                        m.group(1) if m else "ns"
                    ]
                    epochs = ts.astype("int64") / div
                else:
                    epochs = ts.astype("float64")
                # hot path: per-row Series.iloc costs microseconds of
                # pandas indexing per access — O(rows x aggs) of it
                # dominated the fused operator.  Extract each referenced
                # column ONCE per batch as a plain numpy array (lazy: a
                # condition-guarded agg may reference columns absent
                # from cheap batches) and index that.
                epochs_np = epochs.to_numpy()
                cols_np: dict[str, Any] = {}

                def colv(c, _pdf=pdf, _cache=cols_np):
                    a = _cache.get(c)
                    if a is None:
                        a = _cache[c] = _pdf[c].to_numpy()
                    return a

                for i in range(len(pdf)):
                    e = float(epochs_np[i])
                    if wtype == "session":
                        # merging-window assignment: a point extends the
                        # session to [min(start, t), max(end, t+gap));
                        # every overlapping session merges into one —
                        # accumulators, trigger counts and ledger state
                        # combine (all supported aggs are mergeable)
                        gap = size
                        hits = [
                            wk for wk, ws0 in windows.items()
                            if wk is not None and not ws0.closed
                            and e < wk[1] and e + gap > wk[0]
                        ]
                        if hits:
                            wk0 = hits[0]
                            ws = windows.pop(wk0)
                            start = min(wk0[0], e)
                            end = max(wk0[1], e + gap)
                            for other_wk in hits[1:]:
                                other = windows.pop(other_wk)
                                ws.merge_from(other)
                                start = min(start, other_wk[0])
                                end = max(end, other_wk[1])
                            windows[(start, end)] = ws
                        else:
                            ws = windows[(e, e + gap)] = _WinState(now)
                        wkeys = [None]  # row already routed to ws
                    else:
                        wkeys = (
                            assign_windows(e) if has_window else [None]
                        )
                        ws = None
                    for wk in (wkeys if wtype != "session" else [0]):
                        if wtype != "session":
                            ws = windows.get(wk)
                            if ws is None:
                                ws = windows[wk] = _WinState(now)
                        if ws.closed:
                            continue
                        ws.n += 1
                        ws.dirty = True
                        if ws.cycle_start is None:
                            ws.cycle_start = now
                        for name, op, field in aggs:
                            if field is None:
                                continue
                            if op in ("first", "last", "argmax", "argmin"):
                                vf, cf, gf = field
                                if gf is not None:
                                    g = colv(gf)[i]
                                    if g is None or g != g or not bool(g):
                                        continue  # condition guard
                                c = e if cf == "\x00ts" else colv(cf)[i]
                                if c is None or c != c:
                                    continue  # null/NaT ordering: skip
                                cur = ws.args.get(name)
                                want_max = op in ("last", "argmax")
                                if cur is None or (
                                    (c > cur[0]) if want_max else (c < cur[0])
                                ):
                                    ws.args[name] = (
                                        c, colv(vf)[i], want_max
                                    )
                                continue
                            if op == "std":
                                v = colv(field[0])[i]
                                if v is None or v != v:
                                    continue
                                v = float(v)
                                ws.sums[name] = ws.sums.get(name, 0.0) + v
                                sq = name + "\x00sq"
                                ws.sums[sq] = ws.sums.get(sq, 0.0) + v * v
                                ws.counts[name] = ws.counts.get(name, 0) + 1
                                continue
                            if op == "wavg":
                                # two running sums (numerator v*w and the
                                # v-guarded weight), both null-skipping —
                                # the \x00w key merges like any sum
                                vw = colv(field[0])[i]
                                if vw is not None and vw == vw:
                                    ws.sums[name] = (
                                        ws.sums.get(name, 0.0) + float(vw)
                                    )
                                wg = colv(field[1])[i]
                                if wg is not None and wg == wg:
                                    wkey = name + "\x00w"
                                    ws.sums[wkey] = (
                                        ws.sums.get(wkey, 0.0) + float(wg)
                                    )
                                continue
                            if op in _BUFFERED_OPS:
                                fcol = (
                                    field[0] if isinstance(field, tuple)
                                    else field
                                )
                                v = colv(fcol)[i]
                                # NaN here is pandas' null coercion for
                                # float/nullable-int columns; batch
                                # collect_list / count_distinct skip nulls,
                                # and NaN hashes by identity (py3.10+) so
                                # buffering it would count every null row
                                # as a new distinct value. DOCUMENTED
                                # DIVERGENCE: a GENUINE float NaN datum is
                                # indistinguishable from a null after the
                                # Arrow->pandas hand-off, so it is skipped
                                # too (batch collect_list would keep it);
                                # null-skipping is the common case and
                                # wrong NaN-counting the worse failure.
                                # Scalar-guarded: array-valued cells
                                # (array_agg over an array column) can't
                                # be NaN-compared.
                                if v is None or (
                                    pd.api.types.is_scalar(v) and v != v
                                ):
                                    continue
                                if op == "count_distinct" or (
                                    op == "array_agg" and field[1]
                                ):
                                    ws.sets.setdefault(name, {})[v] = None
                                else:
                                    ws.bufs.setdefault(name, []).append(v)
                                continue
                            v = colv(field)[i]
                            if v is None or v != v:
                                continue
                            if op == "count":
                                ws.counts[name] = ws.counts.get(name, 0) + 1
                            elif op in ("sum", "avg"):
                                ws.sums[name] = ws.sums.get(name, 0.0) + float(v)
                                ws.counts[name] = ws.counts.get(name, 0) + 1
                            elif op == "min":
                                cur = ws.mins.get(name)
                                ws.mins[name] = v if cur is None else min(cur, v)
                            else:
                                cur = ws.maxs.get(name)
                                ws.maxs[name] = v if cur is None else max(cur, v)

        out_rows: list[dict] = []

        def emit(wk, ws: _WinState, timing: str) -> None:
            latest = values_of(ws)
            d: dict[str, Any] = {}
            if has_window:
                def render(sec: float):
                    t = pd.Timestamp(sec, unit="s", tz="UTC")
                    if session_tz not in ("UTC", "Etc/UTC", "GMT"):
                        t = t.tz_convert(session_tz)
                    return t.tz_localize(None)

                if is_calendar:
                    d["window"] = render(wk[0])
                else:
                    d["window"] = {
                        "start": render(wk[0]), "end": render(wk[1]),
                    }
            d.update(zip(group_fields, key))
            vals = list(latest)
            if discarding and ws.fired is not None:
                for j, (name, _op, _f) in enumerate(aggs):
                    if vals[j] is not None and ws.fired[j] is not None:
                        vals[j] = vals[j] - ws.fired[j]
            d.update(zip(value_names, vals))
            if pane_info:
                d["__pane__"] = {
                    "firing_time": float(now),
                    "index": ws.idx,
                    "timing": timing,
                    "is_first": ws.idx == 0,
                }
            out_rows.append(d)
            ws.idx += 1
            ws.fired = latest
            ws.fired_n = ws.n
            ws.dirty = False
            ws.cycle_start = None
            if trigger_tree is not None and trigger_tree["kind"] == "each":
                ws.each_ptr += 1

        for wk in list(windows):
            ws = windows[wk]
            window_closed = wk is not None and wm_sec >= wk[1]
            if ws.closed or not ws.dirty:
                # fired/closed windows drop at close — rows behind the
                # watermark are filtered before this operator (module
                # docstring divergence #1), so nothing can arrive for
                # them.  Unconditional: a window whose LAST firing was a
                # clean EARLY pane also evicts here (like the driver
                # ledger, the final accumulation already left in that
                # pane; no empty ON_TIME duplicate fires) — before r12 it
                # lingered forever and re-armed the key's timer on every
                # watermark advance.  finalTrigger-closed TIMED windows
                # keep their tombstone until close (deleting early would
                # let a pre-watermark straggler restart the pane index);
                # a closed GLOBAL window's tombstone persists by design,
                # bounded by key count.
                if window_closed:
                    del windows[wk]
                continue
            # count growth since last firing: the operator OWNS the
            # aggregation, so the ledger always has an exact row count —
            # no paneCountField contract needed on this backend
            grown = ws.n - ws.fired_n
            if final_tree is not None and _eval_tree(
                final_tree, now, ws.birth, ws.n
            ):
                timing = (
                    "ON_TIME"
                    if window_closed and not ws.on_time_fired
                    else ("LATE" if window_closed else "EARLY")
                )
                emit(wk, ws, timing)
                ws.closed = True
                continue
            if not window_closed:
                if trigger_tree is not None:
                    should = _eval_tree(
                        trigger_tree, now, ws.cycle_start, grown,
                        each_ptr=(
                            ws.each_ptr
                            if trigger_tree["kind"] == "each"
                            else -1
                        ),
                    )
                elif early_count is not None:
                    should = grown >= early_count
                elif early_delay is not None:
                    should = True  # processing-time cadence = batch cadence
                else:
                    should = False  # afterWatermark-only: final pane only
                if should:
                    emit(wk, ws, "EARLY")
            elif not ws.on_time_fired:
                emit(wk, ws, "ON_TIME")
                ws.on_time_fired = True
                del windows[wk]
            # no LATE branch: rows behind the watermark never reach this
            # operator (docstring divergence #1), so a closed window can
            # have no further updates

        if windows:
            state.update((pickle.dumps(windows),))
            open_ends = [
                wk[1] for wk in windows
                if wk is not None
            ]  # every undeleted timed window (incl. closed tombstones)
            #    needs a wake at its end to evict
            has_withheld = any(
                ws.dirty and not ws.closed for ws in windows.values()
            )
            target_ms = None
            if open_ends:
                # EventTimeTimeout: wake this key when the watermark passes
                # its earliest open window end, so withheld panes flush
                # ON_TIME without new rows.  Must be strictly past the
                # current watermark.
                target_ms = int(min(open_ends) * 1000)
            if has_withheld:
                # a withheld pane (count/composite gate unsatisfied) also
                # wakes on the VERY NEXT watermark advance, so time leaves
                # re-evaluate without new rows for this key — the driver
                # ledger's every-batch cadence
                nxt = state.getCurrentWatermarkMs() + 1
                target_ms = nxt if target_ms is None else min(target_ms, nxt)
            if target_ms is not None:
                if target_ms <= state.getCurrentWatermarkMs():
                    target_ms = state.getCurrentWatermarkMs() + 1
                state.setTimeoutTimestamp(target_ms)
        else:
            state.remove()

        if out_rows:
            cols: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for d in out_rows:
                for f in out_schema.fields:
                    cols[f.name].append(d.get(f.name))
            yield pd.DataFrame(cols)

    return df.groupBy(*group_fields).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
