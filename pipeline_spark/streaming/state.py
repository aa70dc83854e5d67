"""Stateful streaming operators via applyInPandasWithState.

The reference implements per-key streaming state with OrderedListState +
event-time timers (reference: SelectTransform.java:469-547 streaming
stateful select; util/pipeline/Limit.java:187-277 streaming limit).  In
batch mode our engine compiles the same semantics to Window functions
(compilers/stateful.py); in streaming mode Spark's structured state API is
the idiomatic substrate.

``streaming_limit``: per-key cap — emit at most ``count`` rows per key
(oldest-first by arrival within the stream), state = rows seen so far.

``streaming_running_agg``: per-key running aggregates (count/sum/min/max/
avg) over the stream, state = the accumulator tuple, emitted per row.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_limit(
    df: DataFrame,
    group_fields: list[str],
    count: int,
) -> DataFrame:
    """Per-key output cap for streaming DataFrames."""
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if n >= count:
                break
            take = pdf.iloc[: max(0, count - n)]
            n += len(take)
            if len(take):
                yield take
        state.update((n,))

    return df.groupBy(*group_fields).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_running_agg(
    df: DataFrame,
    group_fields: list[str],
    value_field: str,
    ops: Iterable[str] = ("count", "sum", "min", "max", "avg"),
) -> DataFrame:
    """Per-key running aggregates emitted once per micro-batch per key."""
    ops = list(ops)
    key_fields = [df.schema[g] for g in group_fields]
    out_schema = T.StructType(
        [*key_fields]
        + [
            T.StructField("n", T.LongType()),
            T.StructField("sum", T.DoubleType()),
            T.StructField("min", T.DoubleType()),
            T.StructField("max", T.DoubleType()),
            T.StructField("avg", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("sum", T.DoubleType()),
            T.StructField("min", T.DoubleType()),
            T.StructField("max", T.DoubleType()),
        ]
    )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, mn, mx = state.get
        else:
            n, s, mn, mx = 0, 0.0, None, None
        for pdf in pdfs:
            vals = pd.to_numeric(pdf[value_field], errors="coerce").dropna()
            if not len(vals):
                continue
            n += int(len(vals))
            s += float(vals.sum())
            bmn, bmx = float(vals.min()), float(vals.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        state.update((n, s, mn, mx))
        row: dict[str, Any] = {g: [k] for g, k in zip(group_fields, key)}
        row.update(
            {
                "n": [n],
                "sum": [s],
                "min": [mn],
                "max": [mx],
                "avg": [s / n if n else None],
            }
        )
        yield pd.DataFrame(row)

    return df.groupBy(*group_fields).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_RANGE_OPS = {"count", "sum", "min", "max", "avg"}


def streaming_count_range_select(
    df: DataFrame,
    group_fields: list[str],
    value_field: str,
    n: int,
    order_field: str,
    passthrough: list[tuple[str, str]],
    aggs: list[tuple[str, str]],
) -> DataFrame:
    """Per-ROW trailing count-range aggregates on a stream — the streaming
    twin of the batch Window compiler's ``rowsBetween(-(N-1), 0)`` frame
    (compilers/stateful.py:14).  Every input row is emitted once with the
    requested ``aggs`` (list of (output name, op) with op in count/sum/
    min/max/avg) over the last ``n`` rows of its key; state = the
    previous ``n-1`` values, a bounded array — the same frame the batch
    window holds.  ``passthrough`` is (output name, source column) pairs
    carried through (renames honored, matching the batch path's
    ``withColumn(name, ...)`` binding).

    Contract pinned by the batch-parity test: rows must reach the stream
    in per-key ``order_field`` order (micro-batch sequence × an in-batch
    sort here).  Under out-of-order delivery the batch path re-sorts
    globally while a stream cannot — the same contract Beam's
    @RequiresTimeSortedInput imposes on the reference's stateful select
    (SelectTransform.java:391-467).
    """
    bad = [op for _, op in aggs if op not in _RANGE_OPS]
    if bad:
        raise ValueError(f"streaming count-range: unsupported ops {bad}")
    # passthrough: (output_name, source_column) pairs — renames honored;
    # ONLY selected columns are emitted (batch parity: apply_stateful_select
    # projects to the select names — group/order fields appear only when
    # the select list names them)
    carry_pairs = list(dict.fromkeys(tuple(p) for p in passthrough))
    out_schema = T.StructType(
        [
            T.StructField(out, df.schema[src].dataType, df.schema[src].nullable)
            for out, src in carry_pairs
        ]
        + [
            T.StructField(
                name, T.LongType() if op == "count" else T.DoubleType()
            )
            for name, op in aggs
        ]
    )
    state_schema = T.StructType([T.StructField("tail", T.ArrayType(T.DoubleType()))])

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        tail: list[float] = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_field, kind="mergesort")
            vals = pd.to_numeric(pdf[value_field], errors="coerce").astype(float)
            full = pd.concat(
                [pd.Series(tail, dtype=float), vals], ignore_index=True
            )
            roll = full.rolling(n, min_periods=1)
            lo = len(tail)
            out = {o: pdf[src].to_numpy() for o, src in carry_pairs}
            for name, op in aggs:
                if op == "count":
                    out[name] = roll.count().iloc[lo:].astype("int64").to_numpy()
                else:
                    series = getattr(roll, {"avg": "mean"}.get(op, op))()
                    out[name] = series.iloc[lo:].to_numpy()
            tail = list(full.iloc[len(full) - (n - 1):]) if n > 1 else []
            yield pd.DataFrame(out)
        state.update((tail,))

    return df.groupBy(*group_fields).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_stateful_select(
    df: DataFrame,
    selects: list[dict],
    event_time_col: str | None,
    group_fields: list[str],
) -> DataFrame:
    """Streaming route for the select module's stateful path.

    Emulatable subset (everything else raises with the reason): every
    stateful function is a count-range count/sum/min/max/avg over ONE
    shared field with ONE shared range count, stateless entries are
    pass-through/rename of existing columns.  That is exactly the frame
    ``streaming_count_range_select`` keeps bounded state for; duration
    ranges or mixed frames would need per-row event-time buffers whose
    eviction Spark ties to watermarks — batch mode handles those.
    """
    from pipeline_spark.compilers import select_fns

    if not event_time_col:
        raise ValueError("streaming stateful select requires timestampAttribute")
    aggs: list[tuple[str, str]] = []
    passthrough: list[tuple[str, str]] = []
    value_field = None
    range_n = None
    for sf in selects:
        if sf.get("ignore"):
            continue
        name = sf["name"]
        if not select_fns.is_stateful(sf):
            src = sf.get("field", name)
            if set(sf) - {"name", "field"} or src not in df.columns:
                raise NotImplementedError(
                    f"streaming stateful select: stateless entry '{name}' "
                    "must be a pass-through/rename of an existing column "
                    "(computed stateless functions: apply a separate "
                    "stateless select first)"
                )
            passthrough.append((name, src))
            continue
        func = select_fns.infer_func(sf)
        rng = sf.get("range") or {}
        if func not in _RANGE_OPS or "count" not in rng or rng.get("offset"):
            raise NotImplementedError(
                f"streaming stateful select: '{name}' ({func}) — only "
                "count-range count/sum/min/max/avg without offset stream; "
                "duration ranges need watermark-evicted buffers (use batch)"
            )
        if sf.get("expression"):
            raise NotImplementedError(
                f"streaming stateful select: '{name}' uses an expression "
                "input — only a plain field streams (compute the expression "
                "in a stateless select first)"
            )
        field = sf.get("field")
        if field is None and func != "count":
            raise NotImplementedError(
                f"streaming stateful select: '{name}' ({func}) needs a field"
            )
        if field is not None:
            if value_field is None:
                value_field, range_n = field, int(rng["count"])
            elif field != value_field or int(rng["count"]) != range_n:
                raise NotImplementedError(
                    "streaming stateful select: all range functions must "
                    "share one field and one range count (state is a single "
                    "bounded tail array)"
                )
        elif range_n is not None and int(rng["count"]) != range_n:
            raise NotImplementedError(
                "streaming stateful select: all range functions must share "
                "one range count"
            )
        else:
            range_n = int(rng["count"])
        aggs.append((name, func))
    if not aggs:
        raise ValueError("streaming stateful select: no stateful functions")
    if value_field is None:
        raise NotImplementedError(
            "streaming stateful select: at least one range function must "
            "name a field (a field-less count alone has no value column to "
            "frame — give count the same field)"
        )
    return streaming_count_range_select(
        df, group_fields, value_field, range_n, event_time_col, passthrough, aggs
    )
