"""`processing` module tests — the staged time-series processor mapped onto
Window frames.  Covers the op set the reference's (upstream-commented)
ProcessingTransformTest exercises: expression with `field_k` history
suffixes, window sum over count and [a,b] ranges, lag, binning, hash,
current_timestamp, remainFields/outputRenameFields, and per-key isolation.
Reference: module/transform/ProcessingTransform.java:39-1150,
util/pipeline/processing/processor/*."""

import datetime as dt

import pytest

from pipeline_spark.config import parse_config
from pipeline_spark.executor import run_pipeline

CFG = """
sources:
  - name: rows
    module: create
    timestampAttribute: timestamp
    parameters:
      elements:
{elements}
      schema:
        fields:
          - {{name: userId, type: string}}
          - {{name: long, type: int64}}
          - {{name: double, type: float64}}
          - {{name: string, type: string}}
          - {{name: timestamp, type: timestamp}}
transforms:
  - name: processing
    module: processing
    inputs: [rows]
    parameters:
      stages:
        - name: stage1
          type: timeseries
          groupFields: [userId]
          remainFields: [long, string]
          outputRenameFields: {{timestamp: t}}
          steps:
            - {{name: expr1, op: expression, expression: "(double_0 + double_1) / max(long, long_0)"}}
            - {{name: sum3, op: sum, field: long, range: 3}}
            - {{name: sumoff, op: sum, field: long, ranges: [[1, 3]]}}
            - {{name: lag1, op: lag, field: long, lags: [1]}}
            - {{name: bin, op: binning, field: double, bins: [2.0, 4.0]}}
            - {{name: hashed, op: hash, algorithm: HmacSHA256, secret: "My Secret Key", size: 16, field: string}}
            - {{name: now, op: current_timestamp}}
"""


def _elements():
    lines = []
    for uid in ("u1", "u2"):
        for i in range(1, 6):
            lines.append(
                f'        - {{ userId: {uid}, long: {i}, double: {i - 0.5}, '
                f'string: "{chr(64 + i)}", timestamp: "2025-01-01T00:00:0{i}Z" }}'
            )
    return "\n".join(lines)


@pytest.fixture(scope="module")
def outs(spark):
    cfg = parse_config(CFG.format(elements=_elements()))
    return run_pipeline(spark, cfg)


def _user_rows(outs, uid):
    return sorted(
        (r for r in outs["processing"].collect() if r["userId"] == uid),
        key=lambda r: r["t"],
    )


def test_expression_history_suffix(outs):
    rows = _user_rows(outs, "u1")
    # (double + prev_double) / long; row 1 has no prev → null
    assert rows[0]["expr1"] is None
    assert abs(rows[2]["expr1"] - (2.5 + 1.5) / 3) < 1e-12
    assert abs(rows[4]["expr1"] - (4.5 + 3.5) / 5) < 1e-12


def test_window_sum_count_range(outs):
    assert [r["sum3"] for r in _user_rows(outs, "u1")] == [1, 3, 6, 9, 12]


def test_window_sum_offset_range(outs):
    # range [1, 3] = the 2 rows ending 1 back
    assert [r["sumoff"] for r in _user_rows(outs, "u1")] == [None, 1, 3, 5, 7]


def test_lag_step(outs):
    assert [r["lag1"] for r in _user_rows(outs, "u1")] == [None, 1.0, 2.0, 3.0, 4.0]


def test_binning(outs):
    assert [r["bin"] for r in _user_rows(outs, "u1")] == [0, 0, 1, 1, 2]


def test_hash_and_timestamp(outs):
    rows = _user_rows(outs, "u1")
    assert all(len(r["hashed"]) == 16 for r in rows)
    assert rows[0]["hashed"] != rows[1]["hashed"]  # different strings
    assert all(r["now"] is not None for r in rows)


def test_remain_and_rename(outs):
    rows = _user_rows(outs, "u1")
    assert rows[0]["long"] == 1 and rows[0]["string"] == "A"
    assert "t" in rows[0].asDict() and "timestamp" not in rows[0].asDict()


def test_per_key_isolation(outs):
    # u2 has identical values → identical window outputs
    assert [r["sum3"] for r in _user_rows(outs, "u2")] == [1, 3, 6, 9, 12]


def test_recursive_reference_rejected(spark):
    cfg = parse_config(CFG.format(elements=_elements()).replace(
        '{name: expr1, op: expression, expression: "(double_0 + double_1) / max(long, long_0)"}',
        '{name: ema, op: expression, expression: "long * 0.8 + ema_1 * 0.2"}',
    ))
    with pytest.raises(Exception, match="recursive"):
        run_pipeline(spark, cfg)["processing"].collect()


def test_linear_regression_learner(spark):
    """linear_regression step (LinearRegression.java + Learner.java):
    per-key trailing-window OLS with horizon-lagged features; on an exact
    linear series the prediction must recover y = 2x + 3 almost exactly."""
    import numpy as np

    rows = []
    for k in ("a", "b"):
        for i in range(40):
            x = float(i + (10 if k == "b" else 0))
            rows.append((k, x, 2.0 * x + 3.0,
                         dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)))
    df = spark.createDataFrame(rows, "k string, x double, y double, ts timestamp")
    outs = run_pipeline(spark, parse_config("""
transforms:
  - name: proc
    module: processing
    inputs: [ev]
    timestampAttribute: ts
    parameters:
      groupFields: [k]
      steps:
        - name: y_pred
          op: linear_regression
          featureFields: [x]
          targetFields: [y]
          horizon: 1
          trainSize: 10
      remainFields: [x, y]
"""), inputs={"ev": df})
    got = outs["proc"].collect()
    assert {r["k"] for r in got} == {"a", "b"}
    # rows before h + trainSize have no model → null predictions
    by_key = {}
    for r in got:
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r["x"])
        assert all(r["y_pred"] is None for r in rs[:10])
        # horizon-1 model is fit on (x(t-1) → y(t)) pairs, so predicting
        # with the CURRENT features estimates y one step ahead: on the
        # exact series y = 2x+3, that is 2(x+1)+3
        for r in rs[11:]:
            assert r["y_pred"] == pytest.approx(2.0 * (r["x"] + 1) + 3.0, rel=1e-6), (k, r)


def test_linear_regression_ridge_and_multi_horizon(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    for i in range(60):
        x = float(i)
        rows.append(("k", x, 3.0 * x - 1.0 + float(rng.normal(0, 0.01)),
                     dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)))
    df = spark.createDataFrame(rows, "k string, x double, y double, ts timestamp")
    outs = run_pipeline(spark, parse_config("""
transforms:
  - name: proc
    module: processing
    inputs: [ev]
    timestampAttribute: ts
    parameters:
      groupFields: [k]
      steps:
        - name: pred
          op: linear_regression
          featureFields: [x]
          targetFields: [y]
          horizons: [1, 3]
          trainSize: 15
          regularizationType: ridge
          alpha: 0.001
      remainFields: [x, y]
"""), inputs={"ev": df})
    rows_out = sorted(outs["proc"].collect(), key=lambda r: r["x"])
    assert "pred_horizon1" in rows_out[0].asDict()
    assert "pred_horizon3" in rows_out[0].asDict()
    late = rows_out[-1]
    # horizon-h prediction estimates y(t+h) = 3(x+h) - 1 on this series
    assert late["pred_horizon1"] == pytest.approx(3.0 * (late["x"] + 1) - 1.0, rel=1e-3)
    assert late["pred_horizon3"] == pytest.approx(3.0 * (late["x"] + 3) - 1.0, rel=1e-3)


def test_linear_regression_fast_path_parity(spark):
    """The vectorized rolling-OLS fast path must agree with the reference
    loop (implementation: loop) on noisy data, multiple horizons, a
    train cadence > 1, and large-offset x values."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for k in ("a", "b", "c"):
        base = 1.7e7 if k == "b" else 0.0  # epoch-scale offsets
        for i in range(60):
            x = base + i * 37.0 + float(rng.normal(0, 3))
            y = 0.8 * x + 5.0 + float(rng.normal(0, 2))
            rows.append((k, x, y, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)))
    df = spark.createDataFrame(rows, "k string, x double, y double, ts timestamp")

    def run(impl):
        outs = run_pipeline(spark, parse_config(f"""
transforms:
  - name: proc
    module: processing
    inputs: [ev]
    timestampAttribute: ts
    parameters:
      groupFields: [k]
      steps:
        - name: y_pred
          op: linear_regression
          featureFields: [x]
          targetFields: [y]
          horizons: [1, 3]
          trainSize: 12
          trainIntervalSize: 4
          implementation: {impl}
      remainFields: [x, y]
"""), inputs={"ev": df})
        return {
            (r["k"], round(r["x"], 6)): tuple(
                None if r[c] is None else r[c]
                for c in ("y_pred_horizon1", "y_pred_horizon3")
            )
            for r in outs["proc"].collect()
        }

    fast, slow = run("auto"), run("loop")
    assert fast.keys() == slow.keys() and len(fast) == 180
    n_filled = 0
    for key in fast:
        for f, s in zip(fast[key], slow[key]):
            assert (f is None) == (s is None), (key, fast[key], slow[key])
            if f is not None:
                assert f == pytest.approx(s, rel=1e-6, abs=1e-6), key
                n_filled += 1
    assert n_filled > 200  # the comparison actually exercised predictions
