"""Native distributed avro read/write for the storage modules — no jar.

Read: ``binaryFile`` gives one row per .avro file (whole-file bytes);
an Arrow-batched ``mapInPandas`` decodes each file's OCF blocks with the
stdlib reader (functions/avroocf.py) into typed rows.  Parallelism is
per-file — the same planning unit spark-avro uses for unsplittable-codec
files; schema comes from a driver-side probe of the first file.

Write: each task serializes its partition into one OCF file (deflate by
default) via ``mapInPandas``; materializing the receipts DataFrame IS
the write action.  Paths must be on a filesystem the executors share
(local/NFS — object stores need the jar's committers).  Decimals narrow
to double (documented).

Memory posture: a file is decoded/encoded as one buffer per task — size
files via ``numShards`` like any avro pipeline; this mirrors the row
groups a parquet writer buffers.

Write-commit semantics: the native writer has no commit protocol (that
is what the jar's FileFormatWriter supplies), so a task that fails AFTER
writing its file and is retried leaves the earlier uuid-named part
behind — at-least-once file output.  Overwrite mode clears the directory
first, so re-running the pipeline converges; treat in-flight partial
output as provisional, as with any direct-write sink.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def _expand(paths: list[str]) -> list[str]:
    out: list[str] = []
    for p in paths:
        matches = sorted(glob.glob(p)) or [p]
        for m in matches:
            if os.path.isdir(m):
                out.extend(sorted(glob.glob(os.path.join(m, "*.avro"))))
            else:
                out.append(m)
    return out


def read_avro_native(spark: SparkSession, paths: list[str]) -> DataFrame:
    from pipeline_spark.functions.avrodec import avro_to_spark_type
    from pipeline_spark.functions.avroocf import read_ocf, read_ocf_file

    files = _expand(paths)
    if not files:
        raise FileNotFoundError(f"avro: no files match {paths}")
    schema_json, _ = read_ocf_file(files[0])
    spark_type = avro_to_spark_type(schema_json)
    names = [f.name for f in spark_type.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                _, recs = read_ocf(bytes(content))
                rows = list(recs)
                if rows:
                    yield pd.DataFrame(rows, columns=names)

    binary = spark.read.format("binaryFile").load(files)
    return binary.select("content").mapInPandas(decode, schema=spark_type)


def stream_avro_native(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    explicit_schema=None,
) -> DataFrame:
    """File-stream over a directory of avro OCF files, no jar: Spark's
    binaryFile streaming source hands each new file's bytes to the same
    per-file stdlib decode as the batch path (each file decodes with its
    own embedded writer schema).  The SPARK schema comes from the config
    (``explicit_schema``) or a one-time probe of an existing file — file
    streams need a schema before any data arrives, the same contract as
    the parquet file stream."""
    from pipeline_spark.functions.avrodec import avro_to_spark_type
    from pipeline_spark.functions.avroocf import read_ocf, read_ocf_file

    if explicit_schema is not None:
        spark_type = explicit_schema
    else:
        existing = _expand([path])
        if not existing:
            raise ValueError(
                f"avro streaming: no existing .avro file under {path} to "
                "probe the schema from — declare a config schema (used "
                "directly, no probe) or stage one file"
            )
        schema_json, _ = read_ocf_file(existing[0])
        spark_type = avro_to_spark_type(schema_json)
    names = [f.name for f in spark_type.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                _, recs = read_ocf(bytes(content))
                rows = list(recs)
                if rows:
                    yield pd.DataFrame(rows, columns=names)

    reader = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.avro")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    binary = reader.load(path)
    return binary.select("content").mapInPandas(decode, schema=spark_type)


def write_avro_native(
    df: DataFrame,
    path: str,
    codec: str = "deflate",
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
) -> None:
    import shutil

    from pipeline_spark.functions.avroocf import (
        spark_schema_to_avro,
        write_ocf_bytes,
    )

    partition_cols = list(partition_cols or [])
    data_schema = (
        df.drop(*partition_cols).schema if partition_cols else df.schema
    )
    avro_schema = spark_schema_to_avro(data_schema)
    data_cols = [f.name for f in data_schema.fields]
    if mode == "overwrite" and os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    codec = {"snappy": "deflate", None: "deflate"}.get(codec, codec or "deflate")

    def write_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        from pyspark import TaskContext

        def scalar_null(v):
            # cell-wise (not frame-wise): array/map cells hold numpy arrays
            # whose truthiness pd.notnull would try to coerce
            if v is None or v is pd.NaT:
                return None
            if isinstance(v, float) and v != v:
                return None
            return v

        # hive layout: one row group per partition-column value combo
        groups: dict[tuple, list[dict]] = {}
        for pdf in batches:
            clean = pdf.apply(lambda col: col.map(scalar_null))
            for rec in clean.to_dict("records"):
                pkey = tuple(rec[c] for c in partition_cols)
                groups.setdefault(pkey, []).append(
                    {c: rec[c] for c in data_cols}
                )
        tc = TaskContext.get()
        pid = tc.partitionId() if tc else 0
        receipts = []
        for pkey, rows in groups.items():
            sub = path
            for c, v in zip(partition_cols, pkey):
                sub = os.path.join(sub, f"{c}={v}")
            os.makedirs(sub, exist_ok=True)
            blob = write_ocf_bytes(avro_schema, rows, codec)
            fname = os.path.join(sub, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.avro")
            with open(fname, "wb") as fh:
                fh.write(blob)
            receipts.append({"path": fname, "rows": len(rows)})
        if receipts:
            yield pd.DataFrame(receipts)

    # r15: fan the encode out first — a single-row-group source would
    # otherwise serialize the per-record OCF encode in ONE Python worker
    # (spread is a no-op once the plan already has cluster-parallelism
    # partitions, so at scale no extra shuffle appears)
    from pipeline_spark.functions.partitioning import spread

    # materializing the receipts performs the distributed write
    spread(df).mapInPandas(
        write_parts, schema="path string, rows long"
    ).write.mode("overwrite").format("noop").save()
