"""ML/enrichment transforms: `onnx`, `pdfextract`, `vertexai.gemini`,
`bigtable` (per-row read/mutate).

Reference surface (SURVEY §2.9): module/transform/ONNXTransform.java:24-590,
PDFExtractTransform.java:31-352, vertexai/GeminiTransform.java:25-305,
BigtableTransform.java:41-622.

Spark-first shape for all four: Arrow-batched ``mapInPandas`` with the
heavy client/model initialized once per partition (the reference's
@Setup), executors do the work, no driver loops.  The libraries are not in
this container, so each gates on import with an actionable error — the
schema/partitioning/batching plumbing is real and the onnx path is
testable with any model once onnxruntime is present.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module
from pipeline_spark.compilers.select_fns import spark_type


@module("onnx", kind=KIND_TRANSFORM)
def onnx_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    """ONNX Runtime inference: model broadcast to executors, tensor<->field
    mappings from config (reference: ONNXTransform.java, docs onnx.md).
    Without onnxruntime, MLP-class models (MatMul/Gemm/activations) run on
    the numpy executor in functions/onnxexec.py instead."""
    p = ctx.params
    try:
        import onnxruntime  # noqa: F401

        have_ort = True
    except ImportError:
        have_ort = False

    model_path = p["model"]
    input_map: dict[str, str] = p.get("inputs") or {}
    outputs_cfg: list[dict[str, Any]] = p.get("outputs") or []
    out_fields = [
        T.StructField(o["name"], spark_type(o.get("type", "float32"))) for o in outputs_cfg
    ]
    df = ctx.input
    out_schema = T.StructType([*df.schema.fields, *out_fields])
    with open(model_path, "rb") as f:
        model_bytes = ctx.spark.sparkContext.broadcast(f.read())

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if have_ort:
            import onnxruntime as ort

            sess = ort.InferenceSession(model_bytes.value)
        else:
            from pipeline_spark.functions.onnxexec import NumpyInferenceSession

            sess = NumpyInferenceSession(model_bytes.value)
        for pdf in batches:
            feeds = {
                tensor: np.stack(pdf[field].to_numpy())
                for tensor, field in input_map.items()
            }
            results = sess.run([o["name"] for o in outputs_cfg], feeds)
            out = pdf.copy()
            for o, fld, r in zip(outputs_cfg, out_fields, results):
                r = np.asarray(r)
                # scalar-typed output column + (batch, 1) tensor → squeeze
                # the trailing unit axis so Arrow sees scalars, not lists
                if not isinstance(fld.dataType, T.ArrayType):
                    while r.ndim > 1 and r.shape[-1] == 1:
                        r = r[..., 0]
                out[o["name"]] = list(r)
            yield out

    return {"": df.mapInPandas(infer, schema=out_schema)}


@module("pdfextract", kind=KIND_TRANSFORM)
def pdfextract_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    """PDF text+metadata extraction (reference: PDFExtractTransform.java
    uses PDFBox; pypdf when available, else the stdlib extractor in
    functions/pdftext.py — classic-layout PDFs with FlateDecode streams,
    same zero-dependency fallback story as the avro/protobuf decoders)."""
    p = ctx.params
    try:
        import pypdf  # noqa: F401

        have_pypdf = True
    except ImportError:
        have_pypdf = False
    field = p.get("field", "content")
    df = ctx.input
    out_schema = T.StructType(
        [
            *df.schema.fields,
            T.StructField("text", T.StringType()),
            T.StructField("page_count", T.IntegerType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        if have_pypdf:
            from pypdf import PdfReader

            def one(payload):
                reader = PdfReader(io.BytesIO(payload))
                return (
                    "\n".join(pg.extract_text() or "" for pg in reader.pages),
                    len(reader.pages),
                )
        else:
            from pipeline_spark.functions.pdftext import extract_pdf_text as one

        for pdf in batches:
            texts, pages = [], []
            for payload in pdf[field]:
                try:
                    text, n_pages = one(bytes(payload))
                    texts.append(text)
                    pages.append(n_pages)
                except Exception:  # noqa: BLE001 — dead-letter contract
                    texts.append(None)
                    pages.append(None)
            out = pdf.copy()
            out["text"] = texts
            out["page_count"] = pages
            yield out

    return {"": df.mapInPandas(extract, schema=out_schema)}


def resolve_factory(path: str):
    """Resolve a ``pkg.mod:attr`` dotted path to a callable.

    Client factories are passed as dotted paths (not objects) so the
    reference survives pickling into executor-side pandas UDFs; tests
    inject fakes the same way production injects the real SDK client.
    """
    import importlib

    mod_name, _, attr = path.partition(":")
    obj = importlib.import_module(mod_name)
    for part in (attr or "").split("."):
        if part:
            obj = getattr(obj, part)
    return obj


def _render_template(template: str, row: pd.Series) -> str:
    """Row templating matching the engine's text/http modules: plain
    ``${field}`` interpolation fast path, FreeMarker-subset (directives /
    ``?builtin`` chains) via the shared renderer."""
    import re

    if "<#" not in template and not re.search(r"\$\{[^}]*\?[^}]*\}", template):
        return re.sub(
            r"\$\{([A-Za-z0-9_.]+)\}",
            lambda m: str(row.get(m.group(1), "")),
            template,
        )
    from pipeline_spark.compilers.select_fns import render_row_template

    return render_row_template(template)(dict(row))


@module("vertexai.gemini", kind=KIND_TRANSFORM)
def gemini_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    """LLM generate-content per row (reference: GeminiTransform.java:25-305).

    Reference semantics: a FormatDoFn renders the configured request
    template against each row (failures → dead-letter), then mode selects
    the output: ``batch_json``/``batch_bigquery`` emit the rendered
    request for offline batch prediction; ``predict`` calls the
    generateContent endpoint per row.  (The reference's PredictDoFn drops
    successful responses on the floor — GeminiTransform.java:283-289 has
    no ``c.output``; here predict emits input + a ``response`` struct,
    the obviously-intended behavior, documented as a divergence.)

    Spark shape: Arrow-batched ``mapInPandas``; the client is built once
    per partition from ``clientFactory`` (a ``pkg.mod:fn`` dotted path —
    defaults to the google-genai SDK, import-gated).  The factory is
    called with the module's params dict and must return an object with
    ``generate(model: str, request_json: str) -> dict`` (keys: ``text``,
    optional ``raw``).  ``requestsPerMinute`` throttles per partition.
    Failures route to the ``failures`` output.
    """
    import json as _json

    p = ctx.params
    df = ctx.input
    mode = str(p.get("mode", "predict")).lower()
    request_cfg = p.get("request")
    if request_cfg is None:
        raise ValueError("vertexai.gemini requires a request template")
    request_json = (
        request_cfg if isinstance(request_cfg, str) else _json.dumps(request_cfg)
    )
    fail_fast = bool(ctx.config.get("failFast", False))

    if mode in ("batch_json", "batch_bigquery"):
        # render-only modes: emit the request payload for offline batch
        # prediction (reference FormatDoFn output schema: one JSON field)
        out_schema = T.StructType(
            [*df.schema.fields, T.StructField("request", T.StringType())]
        )

        def fmt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = pdf.copy()
                out["request"] = [
                    _render_template(request_json, row) for _, row in pdf.iterrows()
                ]
                yield out

        return {"": df.mapInPandas(fmt, schema=out_schema)}

    if mode != "predict":
        raise ValueError(f"vertexai.gemini: unknown mode '{mode}'")

    factory_path = p.get("clientFactory", "pipeline_spark.operators.ml:default_gemini_client")
    model = p.get("model") or {}
    model_name = model.get("model") if isinstance(model, dict) else str(model)
    rpm = p.get("requestsPerMinute")
    min_interval = 60.0 / float(rpm) if rpm else 0.0

    out_schema = T.StructType(
        [
            *df.schema.fields,
            T.StructField(
                "response",
                T.StructType(
                    [
                        T.StructField("text", T.StringType()),
                        T.StructField("raw", T.StringType()),
                    ]
                ),
            ),
            T.StructField("__error__", T.StringType()),
        ]
    )

    params_snapshot = dict(p)

    def predict(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        client = resolve_factory(factory_path)(params_snapshot)
        last_call = 0.0
        for pdf in batches:
            responses, errors = [], []
            for _, row in pdf.iterrows():
                try:
                    rendered = _render_template(request_json, row)
                    if min_interval:
                        wait = last_call + min_interval - time.monotonic()
                        if wait > 0:
                            time.sleep(wait)
                        last_call = time.monotonic()
                    resp = client.generate(model_name, rendered)
                    responses.append(
                        {"text": resp.get("text"), "raw": _json.dumps(resp.get("raw"))
                         if resp.get("raw") is not None else None}
                    )
                    errors.append(None)
                except Exception as e:  # noqa: BLE001 — dead-letter contract
                    if fail_fast:
                        raise
                    responses.append(None)
                    errors.append(str(e))
            out = pdf.copy()
            out["response"] = responses
            out["__error__"] = errors
            yield out

    from pyspark.sql import functions as F

    enriched = df.mapInPandas(predict, schema=out_schema).persist()
    ctx.on_commit(lambda: enriched.unpersist())
    ok = enriched.filter(F.col("__error__").isNull()).drop("__error__")
    failures = enriched.filter(F.col("__error__").isNotNull())
    return {"": ok, "failures": failures}


def default_gemini_client(params: dict):
    """Production factory: the google-genai SDK (import-gated)."""
    try:
        from google import genai
    except ImportError:
        raise RuntimeError(
            "vertexai.gemini predict requires the google-genai SDK (not "
            "installed in this environment); pass clientFactory to inject "
            "another client"
        ) from None

    import json as _json

    model_cfg = params.get("model") or {}
    sdk = genai.Client(
        vertexai=True,
        project=model_cfg.get("projectId") or params.get("projectId"),
        location=model_cfg.get("region") or params.get("region"),
    )

    class _Client:
        def generate(self, model: str, request_json: str) -> dict:
            req = _json.loads(request_json)
            resp = sdk.models.generate_content(model=model, **req)
            return {"text": resp.text, "raw": resp.to_json_dict()}

    return _Client()


@module("bigtable", kind=KIND_TRANSFORM)
def bigtable_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    """Per-row Bigtable enrichment read
    (reference: BigtableTransform.java:41-622).

    Reference semantics: for each input row, render the configured key
    range (exact / prefix / start+end, templated on row fields), read the
    matching Bigtable rows, decode the configured column families /
    qualifiers into typed fields (latest cell wins), and emit input +
    decoded fields; read errors dead-letter to ``failures``.

    Spark shape: ``mapInPandas`` with a per-partition client from
    ``clientFactory`` (``pkg.mod:fn`` dotted path; defaults to the
    google-cloud-bigtable SDK, import-gated).  The factory is called with
    the module's params dict and returns an object with
    ``read_rows(table_id, *, exact=None, prefix=None, start=None,
    end=None) -> list[dict]`` where each dict is
    ``{"key": str, "cells": {family: {qualifier: bytes}}}``.
    """
    p = ctx.params
    df = ctx.input
    table_id = p.get("tableId")
    if not table_id:
        raise ValueError("bigtable transform requires tableId")
    key_range = p.get("keyRange") or {}
    if not any(k in key_range for k in ("exact", "prefix", "start", "end")):
        raise ValueError("bigtable keyRange requires exact, prefix, or start/end")
    columns = p.get("columns") or []
    if not columns:
        raise ValueError("bigtable transform requires columns")
    fail_fast = bool(ctx.config.get("failFast", False))
    factory_path = p.get(
        "clientFactory", "pipeline_spark.operators.ml:default_bigtable_client"
    )

    out_fields, decoders = [], []
    for fam_cfg in columns:
        family = fam_cfg["family"]
        for q in fam_cfg.get("qualifiers") or []:
            name = q.get("field") or q["name"]
            type_name = q.get("type", "string")
            out_fields.append(T.StructField(name, spark_type(type_name)))
            decoders.append((name, family, q["name"], type_name))

    out_schema = T.StructType(
        [
            *df.schema.fields,
            *out_fields,
            T.StructField("__error__", T.StringType()),
        ]
    )

    def _decode(raw: bytes | None, type_name: str):
        if raw is None:
            return None
        if isinstance(raw, str):
            raw = raw.encode()
        t = type_name.lower()
        if t in ("string", "str", "text"):
            return raw.decode("utf-8", "replace")
        if t in ("int64", "long", "int", "int32"):
            return int.from_bytes(raw, "big", signed=True)
        if t in ("float64", "double", "float"):
            import struct

            return struct.unpack(">d", raw)[0]
        if t in ("bool", "boolean"):
            return bool(raw[0])
        if t in ("bytes", "binary"):
            return raw
        raise ValueError(f"bigtable: unsupported cell type {type_name}")

    params_snapshot = dict(p)

    def read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = resolve_factory(factory_path)(params_snapshot)
        for pdf in batches:
            cols: dict[str, list] = {name: [] for name, *_ in decoders}
            errors = []
            for _, row in pdf.iterrows():
                try:
                    kw = {
                        k: _render_template(str(v), row)
                        for k, v in key_range.items()
                        if k in ("exact", "prefix", "start", "end")
                    }
                    rows = client.read_rows(table_id, **kw)
                    # latest/first matching row wins, per reference default
                    cells = rows[0]["cells"] if rows else {}
                    for name, family, qual, type_name in decoders:
                        raw = (cells.get(family) or {}).get(qual)
                        cols[name].append(_decode(raw, type_name))
                    errors.append(None)
                except Exception as e:  # noqa: BLE001 — dead-letter contract
                    if fail_fast:
                        raise
                    for name, *_ in decoders:
                        cols[name].append(None)
                    errors.append(str(e))
            out = pdf.copy()
            for name, values in cols.items():
                out[name] = values
            out["__error__"] = errors
            yield out

    from pyspark.sql import functions as F

    enriched = df.mapInPandas(read, schema=out_schema).persist()
    ctx.on_commit(lambda: enriched.unpersist())
    ok = enriched.filter(F.col("__error__").isNull()).drop("__error__")
    failures = enriched.filter(F.col("__error__").isNotNull())
    return {"": ok, "failures": failures}


def default_bigtable_client(params: dict):
    """Production factory: google-cloud-bigtable SDK (import-gated).

    Reads projectId/instanceId from the module params (reference:
    BigtableTransform.java Parameters.projectId/instanceId) and adapts
    the SDK row shape to the engine's read_rows contract."""
    try:
        from google.cloud import bigtable
        from google.cloud.bigtable import row_set as bt_row_set
    except ImportError:
        raise RuntimeError(
            "bigtable transform requires google-cloud-bigtable (not installed "
            "in this environment); pass clientFactory to inject another client"
        ) from None

    project_id, instance_id = params.get("projectId"), params.get("instanceId")
    if not project_id or not instance_id:
        raise ValueError("bigtable transform requires projectId and instanceId")
    instance = bigtable.Client(project=project_id, admin=False).instance(instance_id)

    class _Client:
        def read_rows(self, table_id, *, exact=None, prefix=None, start=None, end=None):
            table = instance.table(table_id)
            rs = bt_row_set.RowSet()
            if exact is not None:
                rs.add_row_key(exact.encode())
            elif prefix is not None:
                rs.add_row_range_with_prefix(prefix)
            else:
                rs.add_row_range_from_keys(
                    start_key=(start or "").encode(),
                    end_key=end.encode() if end else None,
                )
            out = []
            for row in table.read_rows(row_set=rs):
                cells = {
                    fam: {
                        q.decode("utf-8", "replace"): cs[0].value
                        for q, cs in quals.items()
                    }
                    for fam, quals in row.cells.items()
                }
                out.append({"key": row.row_key.decode("utf-8", "replace"), "cells": cells})
            return out

    return _Client()
