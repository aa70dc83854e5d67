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
