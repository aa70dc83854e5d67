"""Iceberg ``add_files`` import: register existing hive-layout parquet
into an iceberg table with ZERO data movement.

The public procedure (iceberg's ``system.add_files`` /
``snapshot``-then-import shape): walk the hive directory, derive each
file's partition record from its ``col=value`` path segments, record
footer stats, and commit ONE append snapshot whose entries point at the
files IN PLACE.  The files never materialized their partition columns
— reads work because the reader fills identity-partition values from
the manifest partition record (spec §Column Projection rule #2,
``sources/iceberg_native.py`` ``identity_fill_plan``), and one
compaction materializes them for good.

Reference: mercari/pipeline has no importer; parity target is Iceberg's
own AddFilesProcedure semantics (docs at iceberg.apache.org/docs/latest/
spark-procedures/#add_files).
"""

from __future__ import annotations

import json
import os
import re
import time
import urllib.parse
import uuid
from typing import Any


def _walk_hive_files(src_dir: str) -> list[tuple[str, dict[str, str]]]:
    """[(absolute parquet path, {partition col: raw string value})] from
    a hive-layout directory; value ``__HIVE_DEFAULT_PARTITION__`` → None."""
    out = []
    for root, _dirs, names in os.walk(src_dir):
        pv: dict[str, str | None] = {}
        rel = os.path.relpath(root, src_dir)
        for seg in [] if rel == "." else rel.split(os.sep):
            if "=" in seg:
                k, v = seg.split("=", 1)
                pv[k] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__"
                    else urllib.parse.unquote(v)
                )
        for name in sorted(names):
            if name.endswith(".parquet"):
                out.append((os.path.join(root, name), dict(pv)))
    return out


def add_files_iceberg_native(spark, p: dict[str, Any]) -> dict[str, int]:
    """``mode: addFiles``: import ``sourceDir`` (hive-layout parquet)
    into the iceberg table at ``path`` — creating it when absent, else
    appending one snapshot chaining the prior manifests by reference.

    Partition column TYPES come from Spark's own partition-discovery
    inference over the directory (the same types a hive reader would
    assign); data column types come from one footer.  Appends require
    the import's schema to match the table's (by name and type)."""
    from pipeline_spark.functions.avroocf import read_ocf_file, write_ocf_bytes
    from pipeline_spark.sinks.iceberg_native import (
        _MANIFEST_FILE_SCHEMA,
        _footer_column_stats,
        _manifest_entry_schema,
        _parquet_stats,
        _publish_metadata_exclusive,
        iceberg_schema,
    )
    from pipeline_spark.sources.iceberg_native import load_table_metadata

    table = re.sub(
        r"^file:/{0,2}(/)", r"\1", str(p.get("path") or p.get("table") or "")
    )
    src_dir = re.sub(
        r"^file:/{0,2}(/)", r"\1", str(p.get("sourceDir") or "")
    )
    if not table or not src_dir:
        raise ValueError("iceberg addFiles: 'path' and 'sourceDir' required")
    files = _walk_hive_files(src_dir)
    if not files:
        raise ValueError(f"iceberg addFiles: no parquet under {src_dir}")
    part_cols = sorted({k for _p, pv in files.__iter__() for k in pv})
    ragged = [fp for fp, pv in files if sorted(pv) != part_cols]
    if ragged:
        raise ValueError(
            f"iceberg addFiles: inconsistent partition depth at "
            f"{ragged[:2]} — every file must sit under the same "
            f"col=value layout (have {part_cols})"
        )

    # one schema-discovery read (metadata only): Spark's partition
    # inference types the partition columns; the footer types the rest
    disc = spark.read.option("basePath", src_dir).parquet(src_dir)
    full_schema = iceberg_schema(disc.schema)
    full_schema.pop("__last_column_id", None)
    by_name = {f["name"]: f for f in full_schema["fields"]}
    missing = [c for c in part_cols if c not in by_name]
    if missing:
        raise ValueError(
            f"iceberg addFiles: partition dirs {missing} did not survive "
            "schema inference"
        )

    meta_dir = os.path.join(table, "metadata")
    prev_meta = None
    try:
        prev_meta = load_table_metadata(table)
    except FileNotFoundError:
        pass

    if prev_meta is not None:
        cur_schema = next(
            s for s in prev_meta["schemas"]
            if s.get("schema-id", 0) == prev_meta.get("current-schema-id", 0)
        )
        want = {(f["name"], f["type"]) for f in cur_schema["fields"]}
        have = {(f["name"], f["type"]) for f in full_schema["fields"]}
        if want != have:
            raise ValueError(
                "iceberg addFiles: import schema "
                f"{sorted(have)} != table schema {sorted(want)}"
            )
        schema = cur_schema
        spec = next(
            (sp for sp in prev_meta.get("partition-specs", [])
             if sp.get("spec-id", 0) == prev_meta.get("default-spec-id", 0)),
            {"fields": []},
        )
        spec_names = [sf["name"] for sf in spec.get("fields", [])]
        # SET comparison: the spec preserves creation order (e.g. a
        # delta-converted table's partitionBy order) while part_cols is
        # sorted — partition records are name-keyed, so order is layout-
        # irrelevant
        if sorted(spec_names) != part_cols or any(
            sf.get("transform") != "identity" for sf in spec.get("fields", [])
        ):
            raise ValueError(
                f"iceberg addFiles: import partitioning {part_cols} != "
                f"table's identity spec {spec_names}"
            )
        spec_fields = spec.get("fields", [])
        seq = int(prev_meta.get("last-sequence-number", 0)) + 1
        version = int(prev_meta.get("__version") or 0) + 1
    else:
        # fresh table: schema ids assigned by iceberg_schema; identity
        # spec over the discovered partition columns
        schema = {"type": "struct", "schema-id": 0,
                  "fields": full_schema["fields"]}
        spec_fields = [
            {"name": c, "transform": "identity",
             "source-id": by_name[c]["id"], "field-id": 1000 + i}
            for i, c in enumerate(part_cols)
        ]
        seq = 1
        version = 1

    sby_name = {f["name"]: f for f in schema["fields"]}
    part_kinds = [
        (c, "long" if sby_name[c]["type"] in ("int", "long") else "string")
        for c in part_cols
    ]
    part_avro_fields = [
        {"name": sf["name"],
         "type": ["null",
                  "long" if sby_name[sf["name"]]["type"] in ("int", "long")
                  else "string"],
         "default": None,
         "field-id": sf.get("field-id", 1000 + i)}
        for i, sf in enumerate(spec_fields)
    ]
    colmap = {
        f["name"]: (f["id"], f["type"])
        for f in schema["fields"]
        if isinstance(f["type"], str) and f["name"] not in part_cols
    }

    now_ms = int(time.time() * 1000)
    snapshot_id = now_ms * 1000 + (uuid.uuid4().int % 1000)
    commit_uuid = str(uuid.uuid4())
    os.makedirs(meta_dir, exist_ok=True)
    entries = []
    total_rows = 0
    kinds = dict(part_kinds)
    for fp, pv in files:
        rows, size = _parquet_stats(fp)
        if rows == 0:
            continue
        total_rows += rows
        nulls, lows, highs = _footer_column_stats(fp, colmap)
        part = {
            c: (None if pv.get(c) is None
                else (int(pv[c]) if kinds[c] == "long" else str(pv[c])))
            for c in part_cols
        }
        entries.append({
            "status": 1,
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0,
                "file_path": fp,
                "file_format": "PARQUET",
                "partition": part,
                "record_count": rows,
                "file_size_in_bytes": size,
                "null_value_counts": nulls,
                "lower_bounds": lows,
                "upper_bounds": highs,
                "equality_ids": None,
            },
        })
    if not entries:
        raise ValueError(f"iceberg addFiles: only empty parquet in {src_dir}")

    mp = os.path.join(meta_dir, f"{commit_uuid}-m0.avro")
    mb = write_ocf_bytes(
        _manifest_entry_schema(part_avro_fields), entries,
        extra_meta={
            "schema": json.dumps(schema),
            "partition-spec": json.dumps(spec_fields),
            "partition-spec-id": str(
                (prev_meta or {}).get("default-spec-id", 0)
            ),
            "format-version": "2",
            "content": "data",
        },
    )
    with open(mp, "wb") as fh:
        fh.write(mb)
    manifests = []
    if prev_meta is not None:
        prev_snap = next(
            (s for s in prev_meta.get("snapshots", [])
             if s.get("snapshot-id") == prev_meta.get("current-snapshot-id")),
            None,
        )
        if prev_snap is not None:
            _, pm = read_ocf_file(re.sub(
                r"^file:/{0,2}(/)", r"\1", prev_snap["manifest-list"]
            ))
            manifests.extend(dict(m) for m in pm)
    manifests.append({
        "manifest_path": mp,
        "manifest_length": len(mb),
        "partition_spec_id": (prev_meta or {}).get("default-spec-id", 0),
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": total_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    })
    lp = os.path.join(meta_dir, f"snap-{snapshot_id}-1-{commit_uuid}.avro")
    lb = write_ocf_bytes(
        _MANIFEST_FILE_SCHEMA, manifests,
        extra_meta={"format-version": "2", "snapshot-id": str(snapshot_id)},
    )
    with open(lp, "wb") as fh:
        fh.write(lb)
    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": lp,
        "schema-id": schema.get("schema-id", 0),
        "summary": {
            "operation": "append",
            "added-data-files": str(len(entries)),
            "added-records": str(total_rows),
            "imported-from": src_dir,
        },
    }
    if prev_meta is not None:
        meta = dict(prev_meta)
        meta["last-sequence-number"] = seq
        meta["last-updated-ms"] = now_ms
        meta["current-snapshot-id"] = snapshot_id
        meta["refs"] = {
            **(meta.get("refs") or {}),
            "main": {"snapshot-id": snapshot_id, "type": "branch"},
        }
        meta["snapshots"] = list(meta.get("snapshots") or []) + [snapshot]
        meta["snapshot-log"] = (
            list(meta.get("snapshot-log") or [])
            + [{"timestamp-ms": now_ms, "snapshot-id": snapshot_id}]
        )[-10:]
        meta["__version"] = version
    else:
        nm = [{"field-id": f["id"], "names": [f["name"]]}
              for f in schema["fields"]]
        meta = {
            "format-version": 2,
            "table-uuid": commit_uuid,
            "location": table,
            "last-sequence-number": seq,
            "last-updated-ms": now_ms,
            "last-column-id": max(f["id"] for f in schema["fields"]),
            "current-schema-id": 0,
            "schemas": [schema],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "last-partition-id": 999 + len(spec_fields),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {
                "write.format.default": "parquet",
                "schema.name-mapping.default": json.dumps(nm),
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
    _publish_metadata_exclusive(meta_dir, version, meta)
    return {"added_files": len(entries), "rows": total_rows}
