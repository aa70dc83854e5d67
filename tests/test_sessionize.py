"""sessionize: gap-based session labeling, nulls, validation."""

from datetime import datetime

import pytest
from pyspark.sql import Row

from pipeline_spark.operators.sessionize import sessionize, sessionize_transform
from pipeline_spark.registry import ModuleContext


def _ts(s):
    return datetime.fromisoformat(s)


def test_sessionize_gap_splits(spark):
    df = spark.createDataFrame(
        [
            Row(u=1, t=_ts("2024-01-01 10:00:00")),
            Row(u=1, t=_ts("2024-01-01 10:10:00")),   # 10 min gap: same
            Row(u=1, t=_ts("2024-01-01 11:00:00")),   # 50 min gap: new
            Row(u=1, t=_ts("2024-01-01 11:20:00")),
            Row(u=2, t=_ts("2024-01-01 10:05:00")),   # other key: own count
        ]
    )
    out = sessionize(df, ["u"], timestamp="t", gap_seconds=30 * 60)
    rows = sorted((r["u"], r["t"], r["session_id"]) for r in out.collect())
    assert [s for _u, _t, s in rows] == [1, 1, 2, 2, 1]


def test_sessionize_exact_gap_boundary_and_nulls(spark):
    df = spark.createDataFrame(
        [
            Row(u=1, t=_ts("2024-01-01 10:00:00")),
            Row(u=1, t=_ts("2024-01-01 10:30:00")),   # exactly 30 min: SAME
            Row(u=1, t=None),
        ],
        schema="u int, t timestamp",
    )
    out = sessionize(df, ["u"], timestamp="t", gap_seconds=1800)
    rows = {r["t"]: r["session_id"] for r in out.collect()}
    assert rows[_ts("2024-01-01 10:30:00")] == 1
    assert rows[None] is None


def test_sessionize_module_and_validation(spark):
    df = spark.createDataFrame([Row(u=1, ts=_ts("2024-01-01 00:00:00"))])
    out = sessionize_transform(
        ModuleContext(spark=spark, name="s",
                      params={"keys": ["u"], "gapSeconds": 60},
                      inputs=[df], input_names=["in"])
    )[""]
    assert out.first()["session_id"] == 1
    with pytest.raises(ValueError, match="gapSeconds"):
        sessionize_transform(
            ModuleContext(spark=spark, name="s", params={"keys": ["u"]},
                          inputs=[df], input_names=["in"])
        )
    with pytest.raises(ValueError, match="key"):
        sessionize(df, [], timestamp="ts", gap_seconds=60)
    with pytest.raises(ValueError, match="gapSeconds must"):
        sessionize(df, ["u"], timestamp="ts", gap_seconds=0)
