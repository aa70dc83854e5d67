"""`http` source: driver-side HTTP fetch → DataFrame.

Reference: module/source/HttpSource.java:34-335 — polling HTTP API source.
Batch mapping: fetch on the driver (it is a single request by design),
parse the response per ``format`` (json/jsonl/csv/text), and parallelize.
Streaming polling → microbatch loop (see streaming/microbatch.py).
"""

from __future__ import annotations

import json as _json

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SOURCE, ModuleContext, module


@module("http", kind=KIND_SOURCE)
def http_source(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    url = p.get("url") or (p.get("request") or {}).get("url")
    if not url:
        raise ValueError("http source requires url")
    import urllib.request

    req = urllib.request.Request(
        url,
        headers=(p.get("request") or {}).get("headers", {}) or p.get("headers", {}),
        method=str(p.get("method", "GET")).upper(),
    )
    with urllib.request.urlopen(req, timeout=int(p.get("timeout", 60))) as resp:
        body = resp.read().decode(p.get("charset", "utf-8"))

    fmt = str(p.get("format", "json")).lower()
    if fmt == "json":
        doc = _json.loads(body)
        records = doc if isinstance(doc, list) else [doc]
        df = ctx.spark.createDataFrame(records)
    elif fmt in ("jsonl", "ndjson"):
        records = [_json.loads(line) for line in body.splitlines() if line.strip()]
        df = ctx.spark.createDataFrame(records)
    else:
        df = ctx.spark.createDataFrame([(body,)], "body: string")
    return {"": df}
