"""`limit` transform: per-key output cap + output-start gate.

Reference: util/pipeline/Limit.java:38-67 params, 97-185 batch — per-key
``count`` cap keeps the OLDEST rows first (batch requires time-sorted
input), and ``outputStartAt`` suppresses output before a timestamp.

Spark: row_number over Window.partitionBy(keys).orderBy(event_time) —
a single shuffle on the keys; the filter on row_number cannot be pushed
past the window but Spark's WindowExec with partial TopK (rank limit
pushdown in AQE) keeps it linear.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module

_ROWNUM = "__limit_rn__"


def apply_limit(
    df: DataFrame,
    limit_spec: dict[str, Any] | int,
    group_fields: list[str],
    ts_attr: str | None,
    descending: bool = False,
) -> DataFrame:
    if isinstance(limit_spec, int):
        limit_spec = {"count": limit_spec}
    count = limit_spec.get("count")
    start_at = limit_spec.get("outputStartAt")

    out = df
    if start_at is not None and ts_attr:
        out = out.filter(F.col(ts_attr) >= F.to_timestamp(F.lit(str(start_at))))
    if count is not None:
        keys = limit_spec.get("fields") or group_fields or []
        order_fields = limit_spec.get("orderFields") or ([ts_attr] if ts_attr and ts_attr in df.columns else [])
        if order_fields:
            order = [
                F.col(f).desc() if descending else F.col(f).asc() for f in order_fields
            ]
        else:
            order = [F.monotonically_increasing_id().asc()]
        if not keys:
            # a keyless Window.partitionBy() funnels the WHOLE dataset
            # through one WindowExec partition — global top-k must go
            # through orderBy().limit(), which Spark executes as
            # TakeOrderedAndProject (per-partition top-k, tiny merge on
            # the driver side of the shuffle)
            return out.orderBy(*order).limit(int(count))
        w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
        out = (
            out.withColumn(_ROWNUM, F.row_number().over(w))
            .filter(F.col(_ROWNUM) <= int(count))
            .drop(_ROWNUM)
        )
    return out


@module("limit", kind=KIND_TRANSFORM)
def limit_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    if ctx.input.isStreaming:
        # streaming per-key cap via keyed state
        # (reference: Limit.java:187-277 streaming path with timers)
        from pipeline_spark.streaming.state import streaming_limit

        return {
            "": streaming_limit(
                ctx.input, p.get("groupFields") or [], int(p.get("count", 1))
            )
        }
    return {
        "": apply_limit(
            ctx.input,
            {k: v for k, v in p.items() if k in ("count", "outputStartAt", "fields", "orderFields")},
            p.get("groupFields") or [],
            ctx.config.get("timestampAttribute"),
            descending=bool(p.get("descending", False)),
        )
    }
