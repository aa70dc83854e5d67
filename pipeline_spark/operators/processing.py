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
        else:
            raise ValueError(
                f"processing: op '{op}' not supported (linear_regression and "
                "learner steps are out of scope; use the onnx module for "
                "model scoring)"
            )
    return selects


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

        # pre-bind literal Column steps (binning) so the stateful walker
        # only sees plain select specs
        plain: list[dict[str, Any]] = []
        for sel in selects:
            if "_column" in sel:
                df = df.withColumn(sel["name"], sel["_column"])
                plain.append({"name": sel["name"]})
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
