"""`files` source: file-metadata listing + whole-file binary reads.

Reference: module/source/FilesSource.java:22-275.

Spark mapping: ``spark.read.format("binaryFile")`` — yields
(path, modificationTime, length, content) which is also the substrate for
the multimodal (image/audio/video as opaque binary) columns of the
LLM-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline_spark.registry import KIND_SOURCE, ModuleContext, module


@module("files", kind=KIND_SOURCE)
def files_source(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    paths = p.get("input") or p.get("inputs") or p.get("path")
    if isinstance(paths, str):
        paths = [paths]
    reader = ctx.spark.read.format("binaryFile")
    if p.get("pathGlobFilter"):
        reader = reader.option("pathGlobFilter", p["pathGlobFilter"])
    df = reader.load(paths)
    if not p.get("withContent", True):
        df = df.drop("content")
    return {"": df}
