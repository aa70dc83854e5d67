"""Linear model fitting for the processing module's learner steps.

Reference: util/domain/ml/LinearModelUtil.java — OLS via normal
equations, ridge (Tikhonov), lasso as iterated adaptive ridge, PLS2
(SVD-NIPALS deflation), and population-moment standardization with
de-standardized weights + intercept (Learner.train minibatch path).
numpy replaces commons-math3; ols/ridge/pls2 reproduce
LinearModelUtilTest's expected weights to ~1e-12 (tests/test_linmodel).

Deliberate divergence: the reference seeds lasso's iteration from an
UNSEEDED random matrix (nondeterministic output by construction); we
seed deterministically so results are reproducible across retries.
"""

from __future__ import annotations

import numpy as np


def ols(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    X = np.asarray(X, dtype=float)
    Y = np.asarray(Y, dtype=float)
    return np.linalg.inv(X.T @ X) @ X.T @ Y


def ridge(X: np.ndarray, Y: np.ndarray, alpha: float) -> np.ndarray:
    X = np.asarray(X, dtype=float)
    Y = np.asarray(Y, dtype=float)
    eye = np.eye(X.shape[1])
    return np.linalg.inv(X.T @ X + alpha * eye) @ X.T @ Y


def lasso(
    X: np.ndarray, Y: np.ndarray, alpha: float,
    max_iteration: int = 500, tolerance: float = 0.01,
) -> np.ndarray:
    """Iterated adaptive ridge (the reference's lasso formulation):
    beta_{k+1} = (XᵀX + α·pinv(|diag(beta_k)|))⁻¹ XᵀY."""
    X = np.asarray(X, dtype=float)
    Y = np.asarray(Y, dtype=float)
    rng = np.random.default_rng(20260813)  # deterministic (divergence note)
    beta = rng.random((Y.shape[1], X.shape[1]))
    for _ in range(max_iteration):
        B = np.abs(np.diag(beta[0]))
        pinv = np.linalg.pinv(B)
        new_beta = np.linalg.inv(X.T @ X + alpha * pinv) @ X.T @ Y
        eps = np.linalg.norm(beta - new_beta.T)
        if eps < tolerance:
            break
        beta = new_beta.T
    return beta.T


def pls2(X: np.ndarray, Y: np.ndarray, components: int) -> np.ndarray:
    X = np.asarray(X, dtype=float).copy()
    Y = np.asarray(Y, dtype=float).copy()
    xd, yd = X.shape[1], Y.shape[1]
    W = np.zeros((xd, components))
    P = np.zeros((xd, components))
    Q = np.zeros((yd, components))
    for r in range(components):
        # first right-singular vector of YᵀX (sign-invariant in the final
        # product: W, P, Q columns all flip together)
        _, _, vt = np.linalg.svd(Y.T @ X, full_matrices=True)
        w = vt[0][:, None]
        t = X @ w
        a = 1.0 / float((t.T @ t).item())
        p = X.T @ t * a
        q = Y.T @ t * a
        X = X - t @ p.T
        Y = Y - t @ q.T
        W[:, r] = w[:, 0]
        P[:, r] = p[:, 0]
        Q[:, r] = q[:, 0]
    return W @ np.linalg.inv(P.T @ W) @ Q.T


def calc_standardize_params(data: np.ndarray) -> list[list[float]]:
    """Per-column [mean, population std, population var] (Welford in the
    reference; numpy population moments are numerically equivalent)."""
    data = np.asarray(data, dtype=float)
    out = []
    for col in range(data.shape[1]):
        v = data[:, col]
        avg = float(v.mean())
        var = float(v.var())  # population (ddof=0), matching var/count
        out.append([avg, float(np.sqrt(var)), var])
    return out


def standardize(
    data: np.ndarray, params: list[list[float]], skip_std: bool = False
) -> np.ndarray:
    data = np.asarray(data, dtype=float).copy()
    for col, (avg, std, _var) in enumerate(params):
        if std == 0:
            continue  # reference: zero-variance columns pass through
        if skip_std:
            data[:, col] = data[:, col] - avg
        else:
            data[:, col] = (data[:, col] - avg) / std
    return data


def fit(
    X: np.ndarray,
    Y: np.ndarray,
    regularization: str = "none",
    alpha: float = 0.2,
    max_iteration: int = 500,
    tolerance: float = 0.01,
    components: int = 2,
    with_standardize: bool = True,
) -> np.ndarray:
    """Learner.train minibatch path: optional standardization, fit, then
    de-standardize into weights with a trailing intercept row.

    Returns shape (n_features [+1], n_outputs) — the extra last row is
    the intercept when ``with_standardize`` (reference appends bias
    during de-standardization; without standardization there is no
    intercept, exactly like the reference)."""
    X = np.asarray(X, dtype=float)
    Y = np.asarray(Y, dtype=float)
    if with_standardize:
        params_x = calc_standardize_params(X)
        params_y = calc_standardize_params(Y)
        Xs = standardize(X, params_x)
        Ys = standardize(Y, params_y, skip_std=True)
    else:
        Xs, Ys = X, Y
    if regularization == "none":
        beta = ols(Xs, Ys)
    elif regularization == "ridge":
        beta = ridge(Xs, Ys, alpha)
    elif regularization == "lasso":
        beta = lasso(Xs, Ys, alpha, max_iteration, tolerance)
    elif regularization == "pls":
        beta = pls2(Xs, Ys, components)
    else:
        raise ValueError(f"linear_regression: unknown regularizationType '{regularization}'")
    if not with_standardize:
        return beta
    n_feat, n_out = beta.shape
    out = np.zeros((n_feat + 1, n_out))
    for y in range(n_out):
        s = 0.0
        for col in range(n_feat):
            avg, std, _ = params_x[col]
            w = beta[col, y] / std if std != 0 else beta[col, y]
            out[col, y] = w
            s += w * avg
        out[n_feat, y] = params_y[y][0] - s
    return out


def inference(weights: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Predict one row: dot per output column, + intercept row if the
    weights carry one (LinearModel.inference semantics)."""
    x = np.asarray(x, dtype=float)
    if weights.shape[0] == x.shape[0] + 1:
        return x @ weights[:-1] + weights[-1]
    return x @ weights
