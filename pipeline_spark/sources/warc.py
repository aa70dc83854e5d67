"""`warc` source: read WARC / WARC.gz crawl archives (ISO 28500).

Training-data-pipeline extension (no reference analogue): Common Crawl
ships ~64k ``.warc.gz`` files per crawl, each ~1 GB of per-record gzip
members.  The FILE is the parallelism unit — exactly how CC processing
pipelines shard — so the plan is a ``binaryFile`` scan (one task per
file) and an Arrow-batched decode; no shuffle, no driver involvement.

Output row per record (filterable by ``recordTypes``):
  file            source path
  record_id       WARC-Record-ID
  warc_type       response / request / warcinfo / metadata / ...
  target_uri      WARC-Target-URI (null for warcinfo)
  warc_date       WARC-Date as string (spec: UTC W3C-ISO8601)
  content_type    the record block's Content-Type
  http_status     parsed from the HTTP message when the record carries
                  application/http (else null)
  payload         entity bytes — HTTP headers stripped for
                  application/http records when ``httpPayload`` (default
                  true), raw block otherwise
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

from pipeline_spark.functions import warcrec
from pipeline_spark.registry import KIND_SOURCE, ModuleContext, module

_SCHEMA = (
    "file string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, payload binary"
)


def read_warc(
    spark,
    path: str,
    *,
    record_types: list[str] | None = None,
    http_payload: bool = True,
    on_error: str = "fail",
) -> DataFrame:
    """``on_error``: "fail" (default) propagates a corrupt archive as a
    task failure; "skip" drops the FILE and keeps the job alive — at
    crawl scale a handful of truncated archives per batch is routine and
    must not kill a 100 TB ingest."""
    if on_error not in ("fail", "skip"):
        raise ValueError(f"warc source: onError must be fail or skip, got {on_error!r}")
    raw = spark.read.format("binaryFile").load(path)
    want = {t.lower() for t in record_types} if record_types else None

    def decode(batches):
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "file", "record_id", "warc_type", "target_uri", "warc_date",
                "content_type", "http_status", "payload",
            )}
            for fpath, data in zip(pdf["path"], pdf["content"]):
                try:
                    records = list(warcrec.decode_records(bytes(data)))
                except ValueError:
                    if on_error == "fail":
                        raise
                    continue
                for headers, payload in records:
                    wtype = headers.get("warc-type", "")
                    if want is not None and wtype.lower() not in want:
                        continue
                    ctype = headers.get("content-type", "")
                    status = None
                    if http_payload and ctype.lower().startswith("application/http"):
                        status, _, payload = warcrec.split_http(payload)
                    out["file"].append(fpath)
                    out["record_id"].append(headers.get("warc-record-id"))
                    out["warc_type"].append(wtype)
                    out["target_uri"].append(headers.get("warc-target-uri"))
                    out["warc_date"].append(headers.get("warc-date"))
                    out["content_type"].append(ctype)
                    out["http_status"].append(status)
                    out["payload"].append(payload)
            if out["file"]:
                yield pd.DataFrame(out)

    return raw.select("path", "content").mapInPandas(decode, schema=_SCHEMA)


@module("warc", kind=KIND_SOURCE)
def warc_source(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    path = p.get("input") or p.get("path")
    if not path:
        raise ValueError("warc source requires input path/glob")
    return {
        "": read_warc(
            ctx.spark,
            path,
            record_types=p.get("recordTypes"),
            http_payload=bool(p.get("httpPayload", True)),
            on_error=str(p.get("onError", "fail")).lower(),
        )
    }
