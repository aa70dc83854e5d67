"""``processing`` transform: the reference's legacy staged time-series
processor, re-expressed on the Window compilers.

Reference: module/transform/ProcessingTransform.java:39-1150 — stages of
``steps``, each step an op from util/pipeline/processing/processor/
(utility: remain/constant/expression/current_timestamp/hash; window:
count/max/min/sum/avg/std/lag/argmax/argmin; feature: binning).  State is
a per-key ProcessingBuffer of the last N values
(ProcessingBuffer.java:27-120); expressions address history with a
``field_k`` suffix (ExpressionUtil.extractBufferSizes:176-205, k rows
back, ``_0`` = the value just buffered i.e. the current row for input
fields).

Spark mapping: the buffer IS a Window — every step compiles to the same
event-time-sorted per-key frames as stateful select (compilers/
stateful.py), so the whole stage stays one exchange on ``groupFields``.
``field_k`` suffixes rewrite to the lag expression syntax ``field[k]``.
Recursive self-reference (EMA-style ``out = f(out_0)``) is a sequential
scan, not a window — unsupported here, with an actionable error
(the reference test's EMA step is commented out upstream too).

Window ``range`` semantics: ``range: N`` → rows [-(N-1), 0] (the N most
recent buffered values); ``range: [a, b]`` → rows [-(b-1), -a].  Output
naming follows WindowProcessor.createOutputName:154-165 (``name``,
``name_field``, ``name_atob``, ``name_field_atob``).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_spark.compilers.filter_dsl import compile_filter
from pipeline_spark.compilers.stateful import apply_stateful_select
from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module

_SUFFIX_RE = re.compile(r"\b([A-Za-z_]\w*?)_(\d+)\b")


def _rewrite_suffixes(expr: str) -> str:
    """``field_k`` history suffix → ``field[k]`` lag syntax."""
    return _SUFFIX_RE.sub(lambda m: f"{m.group(1)}[{m.group(2)}]", expr)


def _ranges(step: dict[str, Any]) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    raw = step.get("range", step.get("ranges"))
    if raw is None:
        out.append((0, 1))
    elif isinstance(raw, int):
        out.append((0, int(raw)))
    elif isinstance(raw, list) and raw and isinstance(raw[0], (int, list)):
        if isinstance(raw[0], int) and "ranges" not in step:
            out.append((int(raw[0]), int(raw[1])))
        else:
            for r in raw:
                if isinstance(r, int):
                    out.append((0, int(r)))
                else:
                    out.append((int(r[0]), int(r[1])))
    else:
        raise ValueError(f"processing: bad range spec {raw!r}")
    return out


def _out_name(name: str, field: str | None, rng: tuple[int, int],
              single_field: bool, single_range: bool) -> str:
    if single_field and single_range:
        return name
    if single_range:
        return f"{name}_{field}"
    if single_field:
        return f"{name}_{rng[0]}to{rng[1]}"
    return f"{name}_{field}_{rng[0]}to{rng[1]}"


_WINDOW_OPS = {"count", "max", "min", "sum", "avg", "std", "argmax", "argmin"}


def _steps_to_selects(steps: list[dict[str, Any]], passthrough: list[str]) -> list[dict[str, Any]]:
    selects: list[dict[str, Any]] = [{"name": c} for c in passthrough]
    for step in steps:
        if step.get("ignore"):
            continue
        op = str(step["op"]).lower()
        name = step["name"]
        if op == "remain":
            for f in step.get("fields") or [step.get("field")]:
                selects.append({"name": f})
        elif op == "constant":
            selects.append({"name": name, "value": step["value"],
                            "type": step.get("type", "string")})
        elif op == "current_timestamp":
            selects.append({"name": name, "func": "current_timestamp"})
        elif op == "hash":
            h = {"name": name, "func": "hash"}
            for k in ("algorithm", "secret", "size", "field", "fields", "text"):
                if k in step:
                    h[k] = step[k]
            selects.append(h)
        elif op == "expression":
            expr = _rewrite_suffixes(str(step["expression"]))
            if re.search(rf"\b{re.escape(name)}\[", expr):
                raise ValueError(
                    f"processing step '{name}': recursive self-reference is a "
                    "sequential scan, not a window; restate without "
                    f"{name}_k history terms"
                )
            if "[" in expr:
                selects.append({"name": name, "func": "lag", "expression": expr})
            else:
                selects.append({"name": name, "expression": expr})
        elif op == "lag":
            fields = step.get("fields") or [step.get("field")]
            lags = step.get("lags") or [step.get("lag", 1)]
            for f in fields:
                for k in lags:
                    out = _out_name(name, f, (k, k), len(fields) == 1, len(lags) == 1)
                    selects.append({"name": out, "func": "lag", "expression": f"{f}[{int(k)}]"})
        elif op == "binning":
            bins = step["bins"]
            fields = step.get("fields") or [step.get("field")]
            for f in fields:
                out = name if len(fields) == 1 else f"{name}_{f}"
                # bucket index by ascending bin edges; values past the last
                # edge land in the final bucket (Binning.java:26-80)
                expr = None
                col = F.col(f).cast("double")
                for i, edge in enumerate(bins):
                    cond = col < float(edge)
                    expr = F.when(cond, i) if expr is None else expr.when(cond, i)
                selects.append({"name": out, "_column": expr.otherwise(len(bins))})
        elif op in _WINDOW_OPS:
            fields = step.get("fields") or [step.get("field")]
            rngs = _ranges(step)
            for f in fields:
                for rng in rngs:
                    out = _out_name(name, f, rng, len(fields) == 1, len(rngs) == 1)
                    sel: dict[str, Any] = {
                        "name": out,
                        "func": op,
                        "field": f,
                        "range": {"count": rng[1] - rng[0], "offset": rng[0]},
                    }
                    if op in ("argmax", "argmin"):
                        sel["comparingField"] = step.get("comparingField") or step.get("comparing")
                    selects.append(sel)
        elif op == "linear_regression":
            # learner step: handled by a per-key applyInPandas pass before
            # the window selects (processing_transform); its prediction
            # columns then flow through the select as pass-throughs
            for out in _learner_output_names(step):
                selects.append({"name": out})
            selects.append({"_learner": step, "name": name})
        else:
            raise ValueError(
                f"processing: op '{op}' not supported (only the "
                "linear_regression learner is implemented; use the onnx "
                "module for arbitrary model scoring)"
            )
    return selects


def _learner_targets(step: dict[str, Any]) -> list[str]:
    return step.get("targetFields") or (
        [step["targetField"]] if step.get("targetField") else []
    )


def _learner_horizons(step: dict[str, Any]) -> list[int]:
    hs = step.get("horizons") or (
        [step["horizon"]] if step.get("horizon") is not None else [1]
    )
    return [int(h) for h in hs]


def _learner_output_names(step: dict[str, Any]) -> list[str]:
    """Learner.createOutputName: single target + single horizon → the step
    name; otherwise suffix per target and/or _horizon{h}."""
    name = step["name"]
    targets = _learner_targets(step)
    horizons = _learner_horizons(step)
    single_t, single_h = len(targets) == 1, len(horizons) == 1
    out = []
    for t in targets:
        for h in horizons:
            if single_t and single_h:
                out.append(name)
            elif single_h:
                out.append(f"{name}_{t}")
            elif single_t:
                out.append(f"{name}_horizon{h}")
            else:
                out.append(f"{name}_{t}_horizon{h}")
    return out


def _apply_linear_regression(
    df: DataFrame, step: dict[str, Any], group_fields: list[str], ts_attr: str
) -> DataFrame:
    """linear_regression learner (LinearRegression.java + Learner.java):
    per key in event-time order, every ``trainIntervalSize`` rows fit a
    linear model on the trailing ``trainSize`` pairs (features lagged by
    ``horizon`` against the target) and predict the current row with the
    latest model.  OLS / ridge / lasso / pls per ``regularizationType``
    (functions/linmodel.py, reference-vector-tested); standardization on
    by default with de-standardized weights + intercept.

    Scale contract: one key's history is processed by one task (the same
    applyInPandas contract as matchRecognize); training cost is
    rows × trainSize × d² per key — size trainIntervalSize accordingly.
    """
    import numpy as np
    import pandas as pd

    features = step.get("featureFields") or step.get("features") or []
    targets = _learner_targets(step)
    horizons = _learner_horizons(step)
    if not features or not targets:
        raise ValueError(
            "linear_regression step requires featureFields and targetFields"
        )
    missing = [c for c in [*features, *targets] if c not in df.columns]
    if missing:
        # fail fast at the driver, not with a KeyError inside the UDF:
        # the learner consumes INPUT columns — series derived by window/
        # expression steps of the SAME stage aren't materialized yet.
        raise ValueError(
            f"linear_regression step '{step['name']}': columns {missing} "
            f"not in the input (have {sorted(df.columns)}); to regress on "
            "derived series, compute them in a PRIOR processing stage"
        )
    train_size = int(step.get("trainSize", 30))
    train_interval = int(step.get("trainIntervalSize", 1))
    reg = str(step.get("regularizationType", "none"))
    alpha = float(step.get("alpha", 0.2))
    max_iteration = int(step.get("maxIteration", 500))
    tolerance = float(step.get("tolerance", 0.01))
    components = int(step.get("components", 2))
    with_std = bool(step.get("standardize", True))
    skip_null = bool(step.get("skipNullRows", False))
    out_names = _learner_output_names(step)
    # overwrite semantics on name collision (matching withColumn-based
    # window ops): colliding input fields are replaced, never duplicated
    in_fields = [f for f in df.schema.fields if f.name not in set(out_names)]
    out_schema = T.StructType(
        [*in_fields]
        + [T.StructField(n, T.DoubleType(), True) for n in out_names]
    )
    in_cols = [f.name for f in in_fields]
    # (target, horizon) → output column, computed ONCE (Learner
    # createOutputName semantics live in _learner_output_names alone)
    name_of = dict(
        zip([(t, h) for t in targets for h in horizons], out_names)
    )

    implementation = str(step.get("implementation", "auto")).lower()

    def fast_simple_ols(a: "np.ndarray", b: "np.ndarray") -> dict | None:
        """Vectorized rolling simple-OLS for the 1-feature/1-target/
        no-regularization case — numerically exact vs the loop (for a
        single feature, standardized OLS de-standardizes to the same
        line; x is centered per key for conditioning).  Returns
        {output_name: np.ndarray} or None when it must defer to the
        loop (NaNs with skipNullRows, a singular window)."""
        n = len(a)
        if n == 0 or np.isnan(a).any() or np.isnan(b).any():
            return None
        x0 = a[0]
        ac = a - x0
        out: dict[str, np.ndarray] = {}
        idx = np.arange(n)
        m = float(train_size)

        def roll(v: "np.ndarray") -> "np.ndarray":
            cs = np.concatenate([[0.0], np.cumsum(v)])
            r = np.full(n, np.nan)
            if n >= train_size:
                j = idx[train_size - 1 :]
                r[j] = cs[j + 1] - cs[j + 1 - train_size]
            return r

        for h in horizons:
            # pair at k: feature a[k-h], target b[k].  Zero padding (NOT
            # NaN — cumsum would poison every later window) is safe: the
            # padded region [0, h) never overlaps a trainable window
            # (trainable starts at h + train_size - 1).
            x = np.concatenate([np.zeros(h), ac[: n - h]]) if h else ac
            Sx, Sy = roll(x), roll(b)
            Sxy, Sxx = roll(x * b), roll(x * x)
            denom = Sxx - Sx * Sx / m
            trainable = (idx >= h + train_size - 1) & ((idx + 1) % train_interval == 0)
            with np.errstate(invalid="ignore", divide="ignore"):
                slope = (Sxy - Sx * Sy / m) / denom
                intercept = Sy / m - slope * Sx / m
            scale = np.nanmax(np.abs(Sxx)) if n >= train_size else 0.0
            if np.any(trainable & ~(np.abs(denom) > 1e-9 * max(scale, 1.0))):
                return None  # singular window: loop semantics keep prior model
            last_train = np.maximum.accumulate(np.where(trainable, idx, -1))
            have = last_train >= 0
            pred = np.full(n, np.nan)
            j = idx[have]
            pred[j] = slope[last_train[j]] * ac[j] + intercept[last_train[j]]
            for t in targets:
                out[name_of[(t, h)]] = pred
        return out

    def run_key(pdf: pd.DataFrame) -> pd.DataFrame:
        from pipeline_spark.functions.linmodel import fit, inference

        pdf = pdf.sort_values(ts_attr, kind="mergesort").reset_index(drop=True)
        feats = pdf[features].to_numpy(dtype=float)
        targs = pdf[targets].to_numpy(dtype=float)
        n = len(pdf)
        if (
            implementation != "loop"
            and len(features) == 1
            and len(targets) == 1
            and reg in ("none", "")
        ):
            fast = fast_simple_ols(feats[:, 0], targs[:, 0])
            if fast is not None:
                out = pdf[in_cols].copy()
                for o in out_names:
                    v = fast[o]
                    out[o] = [
                        None if not np.isfinite(x) else float(x) for x in v
                    ]
                return out
        preds: dict[str, list] = {o: [None] * n for o in out_names}
        models: dict[tuple, np.ndarray] = {}
        interval = 0
        for i in range(n):
            interval += 1
            do_train = interval >= train_interval
            if do_train:
                interval = 0
            for hi, h in enumerate(horizons):
                if do_train and i - h - train_size + 1 >= 0:
                    # pair k: target at k back, features at h+k back
                    Y = targs[i - train_size + 1 : i + 1][::-1]
                    X = feats[i - h - train_size + 1 : i - h + 1][::-1]
                    if skip_null:
                        keep = ~(
                            np.isnan(X).any(axis=1) | np.isnan(Y).any(axis=1)
                        )
                        X, Y = X[keep], Y[keep]
                    if len(X):
                        try:
                            models[(h,)] = fit(
                                X, Y, reg, alpha, max_iteration,
                                tolerance, components, with_std,
                            )
                        except np.linalg.LinAlgError:
                            pass  # singular window: keep previous model
                w = models.get((h,))
                if w is not None:
                    yhat = inference(w, feats[i])
                    for ti, t in enumerate(targets):
                        v = float(yhat[ti])
                        preds[name_of[(t, h)]][i] = (
                            None if (np.isnan(v) or np.isinf(v)) else v
                        )
        out = pdf[in_cols].copy()
        for o in out_names:
            out[o] = preds[o]
        return out

    if group_fields:
        # many-keys-per-batch execution: ONE exchange on the group keys,
        # keys contiguous within partitions, then a mapInPandas whose
        # in-batch pandas groupby amortizes Spark's per-group apply
        # overhead across every key in the Arrow batch (1500 toy groups
        # cost ~1 pandas groupby, not 1500 applyInPandas round-trips).
        # Arrow may split one key across adjacent batches, so the trailing
        # key of each batch is carried into the next and flushed at end.
        from typing import Iterator

        # explicit width (REPARTITION_BY_NUM): a bare repartition(cols) is
        # an AQE-coalescible exchange, and AQE sizes by bytes — which
        # strands cores on Python-expensive stages like this one
        n_width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        shuffled = df.repartition(
            n_width, *[F.col(g) for g in group_fields]
        ).sortWithinPartitions(*group_fields, ts_attr)

        def process_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            carry: pd.DataFrame | None = None
            for pdf in batches:
                if carry is not None and len(carry):
                    pdf = pd.concat([carry, pdf], ignore_index=True)
                    carry = None
                if not len(pdf):
                    continue
                gid = pdf.groupby(group_fields, sort=False, dropna=False).ngroup().to_numpy()
                tail = gid == gid[-1]
                carry = pdf[tail]
                head = pdf[~tail]
                if len(head):
                    yield pd.concat(
                        [
                            run_key(g.reset_index(drop=True))
                            for _, g in head.groupby(group_fields, sort=False, dropna=False)
                        ],
                        ignore_index=True,
                    )
            if carry is not None and len(carry):
                yield pd.concat(
                    [
                        run_key(g.reset_index(drop=True))
                        for _, g in carry.groupby(group_fields, sort=False, dropna=False)
                    ],
                    ignore_index=True,
                )

        return shuffled.mapInPandas(process_partition, schema=out_schema)
    return df.groupBy(F.lit(1).alias("__g__")).applyInPandas(
        lambda pdf: run_key(pdf.drop(columns="__g__", errors="ignore")),
        schema=out_schema,
    )


@module("processing", kind=KIND_TRANSFORM)
def processing_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    stages = p.get("stages")
    if not stages:
        stages = [dict(p, name=ctx.name)]
    ts_attr = ctx.config.get("timestampAttribute")
    if not ts_attr:
        raise ValueError("processing requires timestampAttribute (event-time order)")

    df = ctx.input
    outs: dict[str, DataFrame] = {}
    for stage in stages:
        group_fields = stage.get("groupFields") or []
        remain = stage.get("remainFields") or []
        renames = stage.get("outputRenameFields") or {}
        steps = stage.get("steps") or []
        passthrough = list(dict.fromkeys([*group_fields, ts_attr, *remain]))
        selects = _steps_to_selects(steps, passthrough)

        # pre-bind literal Column steps (binning) and run learner passes
        # (per-key applyInPandas) so the stateful walker only sees plain
        # select specs; learner outputs flow through as pass-throughs
        plain: list[dict[str, Any]] = []
        for sel in selects:
            if "_column" in sel:
                df = df.withColumn(sel["name"], sel["_column"])
                plain.append({"name": sel["name"]})
            elif "_learner" in sel:
                df = _apply_linear_regression(
                    df, sel["_learner"], group_fields, ts_attr
                )
            else:
                plain.append(sel)
        df = apply_stateful_select(df, plain, ts_attr, group_fields=group_fields)

        for old, new in renames.items():
            if old in df.columns:
                df = df.withColumnRenamed(old, new)
        cond = stage.get("filter")
        if cond is not None:
            df = df.filter(compile_filter(cond, df))
        outs[stage.get("name", ctx.name)] = df

    if len(outs) == 1:
        return {"": next(iter(outs.values()))}
    last = list(outs)[-1]
    out_map = {name: d for name, d in outs.items()}
    out_map[""] = outs[last]
    return out_map
