"""Native Iceberg metadata-path reader: batch reads without the runtime jar.

Reference: module/source/IcebergSource.java:20-108 reads Iceberg tables
through the Spark runtime.  That jar is a 🔌 gate in this container, but
an Iceberg table on a filesystem is fully public format (spec at
iceberg.apache.org/spec): JSON table metadata + avro manifest lists +
avro manifests + parquet data files.  With the stdlib avro OCF reader
(functions/avroocf.py) the metadata path needs no jar at all:

  metadata/v*.metadata.json (or version-hint.text)
    → current snapshot → manifest list (avro)
    → manifests (avro; status != DELETED, content == DATA)
    → data file paths → ``spark.read.parquet(*paths)``

Scale posture: metadata files are KB-MB and read driver-side (same as
Iceberg's own planning); the DATA path stays a parquet scan with full
Catalyst pushdown/pruning.  Honest gates: v2 row-level deletes
(positional/equality delete files) raise — merge-on-read semantics need
the runtime; snapshot-id time travel is supported, schema evolution
relies on parquet-by-name resolution of the CURRENT files.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pipeline_spark.functions.avroocf import read_ocf_file

#: manifest_entry.status — 2 marks a data file removed in this snapshot
_STATUS_DELETED = 2
#: data_file.content — 0 data, 1 position deletes, 2 equality deletes
_CONTENT_DATA = 0


def _strip_scheme(path: str) -> str:
    return re.sub(r"^file:/{0,2}(/)", r"\1", path)


def find_table_metadata(table_path: str) -> str:
    """Latest metadata JSON under <table>/metadata, honoring
    version-hint.text when present (the HadoopCatalog convention)."""
    meta_dir = os.path.join(table_path, "metadata")
    if not os.path.isdir(meta_dir):
        raise FileNotFoundError(
            f"iceberg: no metadata directory at {meta_dir} — is "
            f"'{table_path}' an Iceberg table location?"
        )
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = fh.read().strip()
        cand = os.path.join(meta_dir, f"v{v}.metadata.json")
        if os.path.exists(cand):
            return cand
    versions = []
    for name in os.listdir(meta_dir):
        m = re.match(r"(?:v(\d+)|\d+-[0-9a-f-]+)\.metadata\.json$", name)
        if m:
            versions.append((int(m.group(1) or 0), name))
    if not versions:
        raise FileNotFoundError(f"iceberg: no *.metadata.json in {meta_dir}")
    versions.sort()
    return os.path.join(meta_dir, versions[-1][1])


def plan_data_files(
    table_path: str, snapshot_id: int | None = None
) -> list[str]:
    """Resolve the snapshot's live parquet data files via the metadata path."""
    meta_file = find_table_metadata(table_path)
    with open(meta_file) as fh:
        meta = json.load(fh)
    snapshots = meta.get("snapshots") or []
    if not snapshots:
        return []
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
    snap = next((s for s in snapshots if s.get("snapshot-id") == snapshot_id), None)
    if snap is None:
        raise ValueError(
            f"iceberg: snapshot {snapshot_id} not found in {meta_file} "
            f"(have {[s.get('snapshot-id') for s in snapshots]})"
        )
    manifest_list = _strip_scheme(snap["manifest-list"])
    _, manifests = read_ocf_file(manifest_list)
    data_files: list[str] = []
    for m in manifests:
        manifest_path = _strip_scheme(m["manifest_path"])
        _, entries = read_ocf_file(manifest_path)
        for entry in entries:
            if entry.get("status") == _STATUS_DELETED:
                continue
            df = entry.get("data_file") or {}
            content = df.get("content", _CONTENT_DATA) or _CONTENT_DATA
            if content != _CONTENT_DATA:
                raise NotImplementedError(
                    "iceberg: table has row-level delete files (v2 "
                    "merge-on-read); reading it correctly needs the "
                    "iceberg-spark runtime jar"
                )
            fmt = str(df.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"iceberg: {fmt} data files need the runtime jar "
                    "(native path reads parquet)"
                )
            data_files.append(_strip_scheme(df["file_path"]))
    return data_files


def read_iceberg_native(spark, p: dict[str, Any]):
    """DataFrame over an Iceberg table's current (or given) snapshot."""
    table_path = p.get("path") or p.get("table")
    if not table_path or "://" in str(table_path).replace("file://", ""):
        raise ValueError(
            "iceberg native path needs a local/posix table location "
            "(catalog URIs need the runtime jar)"
        )
    table_path = _strip_scheme(str(table_path))
    snapshot_id = p.get("snapshotId")
    files = plan_data_files(table_path, int(snapshot_id) if snapshot_id else None)
    if not files:
        raise ValueError(f"iceberg: snapshot has no data files at {table_path}")
    reader = spark.read
    if p.get("mergeSchema"):
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*files)
    if p.get("fields"):
        from pyspark.sql import functions as F

        df = df.select(*[F.col(c) for c in p["fields"]])
    return df
