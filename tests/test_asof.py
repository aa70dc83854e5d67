"""asof join: backward/forward/nearest, ties, tolerance, vs pandas merge_asof."""

from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import Row

from pipeline_spark.operators.asof import asof_join, asof_transform
from pipeline_spark.registry import ModuleContext


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            Row(sym="A", t=_ts("2024-01-01 10:00:03"), qty=10),
            Row(sym="A", t=_ts("2024-01-01 10:00:07"), qty=20),
            Row(sym="B", t=_ts("2024-01-01 10:00:05"), qty=30),
            Row(sym="C", t=_ts("2024-01-01 10:00:05"), qty=40),  # no quotes
        ]
    )
    quotes = spark.createDataFrame(
        [
            Row(sym="A", t=_ts("2024-01-01 10:00:01"), px=1.0),
            Row(sym="A", t=_ts("2024-01-01 10:00:03"), px=2.0),  # tie with trade 1
            Row(sym="A", t=_ts("2024-01-01 10:00:06"), px=3.0),
            Row(sym="B", t=_ts("2024-01-01 10:00:09"), px=9.0),  # only after
        ]
    )
    return trades, quotes


def test_backward_includes_equal_ts(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, ["sym"], left_ts="t")
    rows = {(r["sym"], r["qty"]): r for r in out.collect()}
    assert rows[("A", 10)]["px"] == 2.0  # equal-ts quote matches
    assert rows[("A", 20)]["px"] == 3.0
    assert rows[("B", 30)]["px"] is None  # only future quotes
    assert rows[("C", 40)]["px"] is None
    assert rows[("A", 10)]["t_right"] == _ts("2024-01-01 10:00:03")


def test_forward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, ["sym"], left_ts="t", direction="forward")
    rows = {(r["sym"], r["qty"]): r for r in out.collect()}
    assert rows[("A", 10)]["px"] == 2.0  # equal ts counts forward too
    assert rows[("A", 20)]["px"] is None  # nothing at/after 10:00:07
    assert rows[("B", 30)]["px"] == 9.0


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_nearest_prefers_backward_on_tie(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, ["sym"], left_ts="t", direction="nearest")
    rows = {(r["sym"], r["qty"]): r for r in out.collect()}
    assert rows[("A", 20)]["px"] == 3.0  # 1s back vs nothing forward
    assert rows[("B", 30)]["px"] == 9.0  # forward only
    assert rows[("C", 40)]["px"] is None


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, ["sym"], left_ts="t", tolerance_seconds=1)
    rows = {(r["sym"], r["qty"]): r for r in out.collect()}
    assert rows[("A", 10)]["px"] == 2.0  # 0s gap, inside
    assert rows[("A", 20)]["px"] == 3.0  # 1s gap, inclusive boundary
    out2 = asof_join(trades, quotes, ["sym"], left_ts="t", tolerance_seconds=0.5)
    rows2 = {(r["sym"], r["qty"]): r for r in out2.collect()}
    assert rows2[("A", 20)]["px"] is None


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_tie_breaker_on_duplicate_right_ts(spark):
    left = spark.createDataFrame([Row(k="x", t=_ts("2024-01-01 00:00:10"))])
    right = spark.createDataFrame(
        [
            Row(k="x", t=_ts("2024-01-01 00:00:05"), seq=1, v="low"),
            Row(k="x", t=_ts("2024-01-01 00:00:05"), seq=2, v="high"),
        ]
    )
    out = asof_join(left, right, ["k"], left_ts="t", tie_breaker="seq").collect()
    assert out[0]["v"] == "high"  # highest tieBreaker wins for backward


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    lt = sorted(rng.integers(0, 10_000, size=300).tolist())
    rt = sorted(rng.integers(0, 10_000, size=200).tolist())
    lkey = rng.integers(0, 5, size=300)
    rkey = rng.integers(0, 5, size=200)
    lpdf = pd.DataFrame(
        {"k": lkey, "t": pd.to_datetime(lt, unit="s"), "lid": range(300)}
    )
    rpdf = pd.DataFrame(
        {"k": rkey, "t": pd.to_datetime(rt, unit="s"), "val": range(200)}
    )
    expected = pd.merge_asof(
        lpdf.sort_values("t"), rpdf.sort_values("t"), on="t", by="k",
        direction="backward",
    ).sort_values("lid")
    # drop rows where pandas had duplicate right (k, t) — tie order differs
    dup = rpdf.duplicated(["k", "t"], keep=False)
    dup_keys = set(map(tuple, rpdf[dup][["k", "t"]].itertuples(index=False)))
    out = asof_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), ["k"], left_ts="t"
    ).collect()
    got = {r["lid"]: r["val"] for r in out}
    checked = 0
    for _, e in expected.iterrows():
        if (e["k"], e["t_right" if "t_right" in e else "t"]) in dup_keys:
            continue
        g = got[e["lid"]]
        want = None if pd.isna(e["val"]) else int(e["val"])
        assert g == want, (e["lid"], g, want)
        checked += 1
    assert checked > 250


def test_module_params_and_validation(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_transform(
        ModuleContext(
            spark=spark, name="a",
            params={"on": ["sym"], "leftTimestamp": "t"},
            inputs=[trades], input_names=["l"], side_inputs={"q": quotes},
        )
    )[""]
    assert out.count() == 4
    with pytest.raises(ValueError, match="sideInput"):
        asof_transform(
            ModuleContext(
                spark=spark, name="a", params={"on": ["sym"], "leftTimestamp": "t"},
                inputs=[trades], input_names=["l"], side_inputs={},
            )
        )
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, ["sym"], left_ts="t", direction="sideways")
    with pytest.raises(ValueError, match="equality key"):
        asof_join(trades, quotes, [], left_ts="t")
    with pytest.raises(ValueError, match="both sides"):
        asof_join(trades, quotes, ["qty"], left_ts="t")


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_matches_pandas_merge_asof_forward_and_nearest(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 4, size=250),
            "t": pd.to_datetime(sorted(rng.integers(0, 5000, size=250)), unit="s"),
            "lid": range(250),
        }
    )
    rpdf = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 4, size=150),
                "t": pd.to_datetime(sorted(rng.integers(0, 5000, size=150)), unit="s"),
                "val": range(150),
            }
        )
        .drop_duplicates(["k", "t"])  # tie order is engine-defined; exclude
        .reset_index(drop=True)
    )
    for direction in ("forward", "nearest"):
        expected = pd.merge_asof(
            lpdf.sort_values("t"), rpdf.sort_values("t"), on="t", by="k",
            direction=direction,
        ).sort_values("lid")
        got = {
            r["lid"]: r["val"]
            for r in asof_join(
                spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
                ["k"], left_ts="t", direction=direction,
            ).collect()
        }
        for _, e in expected.iterrows():
            want = None if pd.isna(e["val"]) else int(e["val"])
            assert got[e["lid"]] == want, (direction, e["lid"], got[e["lid"]], want)


def test_negative_tolerance_rejected(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="toleranceSeconds"):
        asof_join(trades, quotes, ["sym"], left_ts="t", tolerance_seconds=-1)
