"""In-place, metadata-only table-format conversion: delta ↔ iceberg.

The lakehouse migration shape (delta-spark's ``CONVERT TO DELTA`` /
iceberg's ``snapshot``/``add_files`` procedures) re-expressed over this
repo's two native metadata stacks: the TARGET format's metadata is
written over the SAME parquet data files — zero bytes of data move, the
r7 clone discipline applied across formats.  The source format's log
stays behind untouched (the conversion is a snapshot, not a rename), so
the original table keeps reading until its owner retires it.

Scope guards (each names its workaround):

- live row-level deletes (delta DVs, iceberg position/equality/DV
  files) cannot be translated metadata-only — compact/purge first;
- delta column mapping renames physical parquet columns — the iceberg
  side would need a name-mapping seeded from the delta mapping, not yet
  wired;
- partitioned DELTA sources are refused: delta files do NOT materialize
  partition columns in the parquet, so an iceberg reader would see
  nulls.  Iceberg identity-partitioned sources convert fine (iceberg
  files DO carry partition columns physically) and land as an
  unpartitioned delta table;
- schema-evolved iceberg manifests (renamed/added columns since a
  file's write) need delta column mapping to express — compact first.

Reference: mercari/pipeline has no converter; parity target is the
public ConvertToDeltaCommand / SnapshotTableSparkAction semantics.
"""

from __future__ import annotations

import json
import os
import re
import time
import urllib.parse
import uuid
from typing import Any

from pipeline_spark.registry import KIND_SINK, ModuleContext, module

_DELTA_TO_ICE = {
    "long": "long", "integer": "int", "short": "int", "byte": "int",
    "string": "string", "double": "double", "float": "float",
    "boolean": "boolean", "date": "date", "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp", "binary": "binary",
}
_ICE_TO_DELTA = {
    "long": "long", "int": "integer", "string": "string",
    "double": "double", "float": "float", "boolean": "boolean",
    "date": "date", "timestamptz": "timestamp",
    "timestamp": "timestamp_ntz", "binary": "binary",
}


def _delta_type_to_ice(t: Any) -> str:
    if isinstance(t, str):
        if t in _DELTA_TO_ICE:
            return _DELTA_TO_ICE[t]
        if t.startswith("decimal("):
            return t
    raise NotImplementedError(
        f"convert: delta type {t!r} has no metadata-only iceberg mapping "
        "(nested/exotic types: rewrite through a storage sink instead)"
    )


def _ice_type_to_delta(t: Any) -> str:
    if isinstance(t, str):
        if t in _ICE_TO_DELTA:
            return _ICE_TO_DELTA[t]
        if t.startswith("decimal("):
            return t
    raise NotImplementedError(
        f"convert: iceberg type {t!r} has no metadata-only delta mapping "
        "(nested/exotic types: rewrite through a storage sink instead)"
    )


def convert_delta_to_iceberg(spark, p: dict[str, Any]) -> dict[str, Any]:
    """Write iceberg metadata (v1 table) over a delta table's current
    data files.  O(files) driver-side footer reads for manifest stats —
    the same bounds the delta log carried keep pruning working on the
    iceberg side."""
    from pipeline_spark.sinks.iceberg_native import (
        _MANIFEST_FILE_SCHEMA,
        _footer_column_stats,
        _manifest_entry_schema,
        _name_mapping,
        _parquet_stats,
        _publish_metadata_exclusive,
    )
    from pipeline_spark.functions.avroocf import write_ocf_bytes
    from pipeline_spark.sources.delta_native import (
        _column_mapping,
        replay_state,
    )

    table = re.sub(
        r"^file:/{0,2}(/)", r"\1",
        str(p.get("path") or p.get("table") or p.get("source") or ""),
    )
    if not table:
        raise ValueError("convert: 'path' of the delta table is required")
    meta_dir = os.path.join(table, "metadata")
    if os.path.isdir(meta_dir) and any(
        n.endswith(".metadata.json") for n in os.listdir(meta_dir)
    ):
        raise FileExistsError(
            f"convert: {table} already carries iceberg metadata"
        )
    adds, dmeta, _proto, _version, _txns = replay_state(table)
    if any(a.get("deletionVector") for a in adds):
        raise ValueError(
            "convert: the delta table carries deletion vectors — purge "
            "them first (delta update/optimize materializes DVs)"
        )
    if _column_mapping(dmeta):
        raise NotImplementedError(
            "convert: column-mapped delta tables need a seeded iceberg "
            "name-mapping — disable column mapping or rewrite"
        )
    if dmeta.get("partitionColumns"):
        raise ValueError(
            "convert: partitioned delta tables don't materialize the "
            "partition columns in their parquet files — an iceberg "
            "reader would see nulls; rewrite through a storage sink"
        )
    dfields = json.loads(dmeta["schemaString"])["fields"]
    ice_fields = [
        {
            "id": i + 1,
            "name": f["name"],
            "required": not f.get("nullable", True),
            "type": _delta_type_to_ice(f["type"]),
        }
        for i, f in enumerate(dfields)
    ]
    schema = {"type": "struct", "schema-id": 0, "fields": ice_fields}
    colmap = {f["name"]: (f["id"], f["type"]) for f in ice_fields}

    now_ms = int(time.time() * 1000)
    snapshot_id = now_ms * 1000 + (uuid.uuid4().int % 1000)
    commit_uuid = str(uuid.uuid4())
    os.makedirs(meta_dir, exist_ok=True)
    entries = []
    total_rows = 0
    for a in adds:
        full = os.path.join(table, urllib.parse.unquote(a["path"]))
        rows, size = _parquet_stats(full)
        total_rows += rows
        nulls, lows, highs = _footer_column_stats(full, colmap)
        entries.append({
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0,
                "file_path": full,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": rows,
                "file_size_in_bytes": size,
                "null_value_counts": nulls,
                "lower_bounds": lows,
                "upper_bounds": highs,
                "equality_ids": None,
            },
        })
    manifest_path = os.path.join(meta_dir, f"{commit_uuid}-m0.avro")
    mb = write_ocf_bytes(
        _manifest_entry_schema([]), entries,
        extra_meta={
            "schema": json.dumps(schema),
            "partition-spec": "[]",
            "partition-spec-id": "0",
            "format-version": "2",
            "content": "data",
        },
    )
    with open(manifest_path, "wb") as fh:
        fh.write(mb)
    list_path = os.path.join(
        meta_dir, f"snap-{snapshot_id}-1-{commit_uuid}.avro"
    )
    lb = write_ocf_bytes(
        _MANIFEST_FILE_SCHEMA,
        [{
            "manifest_path": manifest_path,
            "manifest_length": len(mb),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": 1,
            "min_sequence_number": 1,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": total_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }],
        extra_meta={"format-version": "2", "snapshot-id": str(snapshot_id)},
    )
    with open(list_path, "wb") as fh:
        fh.write(lb)
    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": 1,
        "timestamp-ms": now_ms,
        "manifest-list": list_path,
        "schema-id": 0,
        "summary": {
            "operation": "append",
            "added-data-files": str(len(entries)),
            "added-records": str(total_rows),
            "converted-from": "delta",
        },
    }
    meta = {
        "format-version": 2,
        "table-uuid": commit_uuid,
        "location": table,
        "last-sequence-number": 1,
        "last-updated-ms": now_ms,
        "last-column-id": len(ice_fields),
        "current-schema-id": 0,
        "schemas": [schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "write.format.default": "parquet",
            "schema.name-mapping.default": json.dumps(
                _name_mapping(ice_fields)
            ),
        },
        "current-snapshot-id": snapshot_id,
        "refs": {"main": {"snapshot-id": snapshot_id, "type": "branch"}},
        "snapshots": [snapshot],
        "snapshot-log": [
            {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
        ],
        "metadata-log": [],
        "__version": 1,
    }
    _publish_metadata_exclusive(meta_dir, 1, meta)
    return {"converted_files": len(entries), "rows": total_rows}


def convert_iceberg_to_delta(spark, p: dict[str, Any]) -> dict[str, Any]:
    """Write a delta log (protocol 1/2 + metaData + adds) over an
    iceberg table's current live data files.  Footer stats land in each
    ``add.stats`` so delta-side skipping works from commit zero."""
    from pipeline_spark.sinks.delta_native import (
        _commit_actions,
        _footer_stats,
    )
    from pipeline_spark.sources.iceberg_native import plan_files

    table = re.sub(
        r"^file:/{0,2}(/)", r"\1",
        str(p.get("path") or p.get("table") or p.get("source") or ""),
    )
    if not table:
        raise ValueError("convert: 'path' of the iceberg table is required")
    log_dir = os.path.join(table, "_delta_log")
    if os.path.isdir(log_dir) and os.listdir(log_dir):
        raise FileExistsError(
            f"convert: {table} already carries a delta log"
        )
    data, deletes, imeta = plan_files(table)
    if deletes:
        raise ValueError(
            "convert: the iceberg table carries row-level delete files — "
            "compact first to materialize them"
        )
    if any(d.get("renames") or d.get("absent") or d.get("dropped")
           for d in data):
        raise NotImplementedError(
            "convert: schema-evolved iceberg manifests need delta column "
            "mapping to express — compact first"
        )
    cur_schema = next(
        s for s in imeta["schemas"]
        if s.get("schema-id", 0) == imeta.get("current-schema-id", 0)
    )
    dfields = [
        {
            "name": f["name"],
            "type": _ice_type_to_delta(f["type"]),
            "nullable": not f.get("required", False),
            "metadata": {},
        }
        for f in cur_schema["fields"]
    ]
    schema_string = json.dumps({"type": "struct", "fields": dfields})
    now_ms = int(time.time() * 1000)
    actions: list[dict] = [
        {"commitInfo": {
            "timestamp": now_ms, "operation": "CONVERT",
            "operationParameters": {"sourceFormat": "iceberg"},
        }},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {},
            "createdTime": now_ms,
        }},
    ]
    total_rows = 0
    for d in data:
        full = d["path"]
        rel = os.path.relpath(full, table)
        if rel.startswith(".."):
            raise ValueError(
                f"convert: data file {full} lives outside the table root "
                "— delta add paths must be table-relative"
            )
        st = _footer_stats(full)
        if st:
            total_rows += json.loads(st).get("numRecords") or 0
        actions.append({"add": {
            "path": urllib.parse.quote(rel.replace(os.sep, "/"), safe="/="),
            "partitionValues": {},
            "size": os.path.getsize(full),
            "modificationTime": now_ms,
            "dataChange": True,
            **({"stats": st} if st else {}),
        }})
    os.makedirs(log_dir, exist_ok=True)
    _commit_actions(table, 0, actions)
    return {"converted_files": len(data), "rows": total_rows}


@module("tableconvert", kind=KIND_SINK)
def tableconvert_sink(ctx: ModuleContext) -> dict:
    """``to: iceberg`` converts a delta table in place; ``to: delta``
    converts an iceberg table.  The module input passes through (the
    table is the operand, like the other maintenance sinks)."""
    p = ctx.params
    to = str(p.get("to", "")).lower()
    if to == "iceberg":
        convert_delta_to_iceberg(ctx.spark, p)
    elif to == "delta":
        convert_iceberg_to_delta(ctx.spark, p)
    else:
        raise ValueError("tableconvert: 'to' must be 'iceberg' or 'delta'")
    return {"": ctx.input}
