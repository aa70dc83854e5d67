"""`htmlextract` transform: main-content extraction from crawled HTML.

Training-data-pipeline extension (BASELINE.json north star): web corpora
arrive as raw HTML and the model-worthy text is the article body, not
the surrounding chrome.  The density heuristics live in
``functions/htmlextract.py`` (readability/jusText family, stdlib DOM);
this module is the Spark plumbing: an Arrow-batched ``mapInPandas``
appending ``title`` / ``main_text`` / ``n_paragraphs`` /
``link_density`` columns.  Map-only — no shuffle at any scale; CPU cost
is linear in HTML bytes and parallelizes per input split.

Config:
  field              column holding HTML (string or binary; default "html")
  minParagraphChars  paragraph length gate (default 25)
  maxLinkDensity     paragraph link-density gate (default 0.5)
  onError            "fail" (default) or "null"
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


@module("htmlextract", kind=KIND_TRANSFORM)
def htmlextract_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    field = p.get("field", "html")
    min_chars = int(p.get("minParagraphChars", 25))
    max_ld = float(p.get("maxLinkDensity", 0.5))
    null_on_error = str(p.get("onError", "fail")).lower() == "null"
    df = ctx.input
    if field not in df.columns:
        raise ValueError(f"htmlextract: input has no column '{field}'")
    schema = T.StructType(
        [
            *df.schema.fields,
            T.StructField("title", T.StringType()),
            T.StructField("main_text", T.StringType()),
            T.StructField("n_paragraphs", T.IntegerType()),
            T.StructField("link_density", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipeline_spark.functions.htmlextract import extract_main_text

        for pdf in batches:
            out = pdf.copy()
            titles, texts, nps, lds = [], [], [], []
            for raw in pdf[field]:
                try:
                    if isinstance(raw, (bytes, bytearray)):
                        raw = bytes(raw).decode("utf-8", "replace")
                    r = extract_main_text(
                        raw or "",
                        min_paragraph_chars=min_chars,
                        max_link_density=max_ld,
                    )
                    titles.append(r["title"])
                    texts.append(r["text"])
                    nps.append(r["n_paragraphs"])
                    lds.append(r["link_density"])
                except Exception:
                    if not null_on_error:
                        raise
                    titles.append(None)
                    texts.append(None)
                    nps.append(None)
                    lds.append(None)
            out["title"] = titles
            out["main_text"] = texts
            out["n_paragraphs"] = nps
            out["link_density"] = lds
            yield out

    return {"": df.mapInPandas(run, schema=schema)}
