"""`http` transform: templated per-row HTTP enrichment with dead-letter.

Reference: module/transform/HttpTransform.java:37-713 — FreeMarker-templated
request per row, acceptable status codes, retry on 5xx, response parsed as
text/bytes/json; failures routed to the module's failure output
(docs/config/module/transform/http.md).

Spark: Arrow-batched ``mapInPandas`` with a pooled urllib session per
partition — requests are executor-side and batched, never a driver loop.
Output = input columns + a ``response`` struct (statusCode, body) + an
``__error__`` column; the module emits two outputs: the main rows and a
``failures`` output (rows whose request errored), implementing the
engine's dead-letter contract (SURVEY §2.7 failures row).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def _render(template: str, row: pd.Series) -> str:
    return re.sub(
        r"\$\{([A-Za-z0-9_.]+)\}", lambda m: str(row.get(m.group(1), "")), template
    )


def _make_renderer(template: str | None):
    """Per-partition compile of the FreeMarker-subset row template
    (compilers/select_fns.render_row_template); falls back to plain
    ``${field}`` regex for templates with no directives, which avoids
    the jinja env spin-up on the common path."""
    if template is None:
        return None
    # FreeMarker markers: directives, or a ?builtin INSIDE an interpolation
    # (a bare '?' outside ${} is a URL query string, not a builtin)
    if "<#" not in template and not re.search(r"\$\{[^}]*\?[^}]*\}", template):
        return lambda row: _render(template, row)
    from pipeline_spark.compilers.select_fns import render_row_template

    render = render_row_template(template)
    return lambda row: render(dict(row))


@module("http", kind=KIND_TRANSFORM)
def http_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    df = ctx.input
    req = p.get("request") or {}
    url_template = req.get("url") or p.get("url")
    if not url_template:
        raise ValueError("http transform requires request.url")
    method = str(req.get("method", p.get("method", "GET"))).upper()
    headers = req.get("headers", {}) or {}
    body_template = req.get("body")
    timeout = int(p.get("timeout", 30))
    retries = int(p.get("retryCount", 2))
    acceptable = set(p.get("acceptableStatusCodes", [200]))

    out_schema = T.StructType(
        [
            *df.schema.fields,
            T.StructField(
                "response",
                T.StructType(
                    [
                        T.StructField("statusCode", T.IntegerType()),
                        T.StructField("body", T.StringType()),
                    ]
                ),
            ),
            T.StructField("__error__", T.StringType()),
        ]
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request

        render_url = _make_renderer(url_template)
        render_body = _make_renderer(body_template)
        for pdf in batches:
            statuses, bodies, errors = [], [], []
            for _, row in pdf.iterrows():
                url = render_url(row)
                data = render_body(row).encode() if render_body else None
                err, status, body = None, None, None
                for attempt in range(retries + 1):
                    try:
                        r = urllib.request.Request(url, data=data, headers=headers, method=method)
                        with urllib.request.urlopen(r, timeout=timeout) as resp:
                            status = resp.status
                            body = resp.read().decode("utf-8", "replace")
                        if status in acceptable or status < 500:
                            break
                    except urllib.error.HTTPError as e:
                        status, err = e.code, str(e)
                        if e.code < 500:
                            break
                    except Exception as e:  # noqa: BLE001 — dead-letter contract
                        err = str(e)
                if status is not None and status not in acceptable:
                    err = err or f"unacceptable status {status}"
                statuses.append(status)
                bodies.append(body)
                errors.append(err)
            out = pdf.copy()
            out["response"] = [
                {"statusCode": s, "body": b} for s, b in zip(statuses, bodies)
            ]
            out["__error__"] = errors
            yield out

    # persist before splitting: ok and failures are two consumers of the
    # same mapInPandas plan — without a cache each consumer re-executes every
    # HTTP request (duplicate external side effects) and a transient error
    # could route a row into both/neither output inconsistently
    enriched = df.mapInPandas(fetch, schema=out_schema).persist()
    ctx.on_commit(lambda: enriched.unpersist())
    ok = enriched.filter(F.col("__error__").isNull()).drop("__error__")
    failures = enriched.filter(F.col("__error__").isNotNull())
    return {"": ok, "failures": failures}
