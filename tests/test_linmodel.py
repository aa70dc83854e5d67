"""Linear model math vs the reference's own published test vectors
(LinearModelUtilTest.java — expected OLS/ridge/PLS weights)."""

import numpy as np
import pytest

from pipeline_spark.functions.linmodel import (
    calc_standardize_params,
    fit,
    inference,
    lasso,
    ols,
    pls2,
    ridge,
    standardize,
)

X = np.array([
    [0.01, 0.50, -0.12],
    [0.97, -0.63, 0.02],
    [0.41, 1.15, -1.17],
    [-1.38, -1.02, 1.27],
])
Y = np.array([[0.25], [0.08], [1.03], [-1.37]])


def test_ols_matches_reference_vectors():
    beta = ols(X, Y)
    np.testing.assert_allclose(
        beta[:, 0],
        [0.3634706488178612, 0.41624871282274356, -0.3467759307908499],
        rtol=1e-12,
    )


def test_ridge_matches_reference_vectors():
    beta = ridge(X, Y, 0.1)
    np.testing.assert_allclose(
        beta[:, 0],
        [0.3398400247536521, 0.37935912658459536, -0.3847992027403095],
        rtol=1e-12,
    )


def test_pls2_matches_reference_vectors():
    beta = pls2(X, Y, 2)
    np.testing.assert_allclose(
        beta[:, 0],
        [0.33835661051283145, 0.3691038639153049, -0.4089846505801048],
        rtol=1e-10,
    )


def test_lasso_shape_and_determinism():
    b1 = lasso(X, Y, 0.9, 500, 0.01)
    b2 = lasso(X, Y, 0.9, 500, 0.01)
    assert b1.shape == (3, 1)
    np.testing.assert_array_equal(b1, b2)


def test_standardize_params_match_reference():
    """testCalcStandardizeParams vectors: population mean/std/var, and a
    zero-variance column passes through unchanged."""
    data = np.array([
        [1, 10, 90, 1], [-1, -10, -10, 1], [2, 30, 50, 1], [-2, 50, 30, 1],
    ], dtype=float)
    params = calc_standardize_params(data)
    assert params[0][0] == pytest.approx(0.0)
    assert params[0][2] == pytest.approx(2.5)
    assert params[1][0] == pytest.approx(20.0)
    assert params[1][2] == pytest.approx(500.0)
    assert params[2][0] == pytest.approx(40.0)
    assert params[2][2] == pytest.approx(1300.0)
    std = standardize(data, params)
    # constant column (std 0) untouched
    np.testing.assert_array_equal(std[:, 3], data[:, 3])
    assert std[:, 0].mean() == pytest.approx(0.0)
    assert std[:, 0].std() == pytest.approx(1.0)


def test_fit_standardized_equals_affine_ols_prediction():
    """With standardization, single-feature OLS predictions equal plain
    slope/intercept regression — the property the driver oracle uses."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((30, 1))
    y = 2.5 * x + 1.0 + rng.standard_normal((30, 1)) * 0.1
    w = fit(x, y, "none", with_standardize=True)
    assert w.shape == (2, 1)
    # compare against numpy polyfit (slope+intercept least squares)
    slope, intercept = np.polyfit(x[:, 0], y[:, 0], 1)
    assert w[0, 0] == pytest.approx(slope, rel=1e-9)
    assert w[1, 0] == pytest.approx(intercept, rel=1e-9)
    pred = inference(w, x[0])
    assert pred[0] == pytest.approx(slope * x[0, 0] + intercept, rel=1e-9)
