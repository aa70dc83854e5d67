"""Streaming Iceberg source WITHOUT the runtime jar: a Spark 4 Python
DataSource that replays the table's snapshot history as micro-batch
offsets — the twin of sources/delta_stream.py for the other lakehouse
format (Spark's own iceberg connector exposes the same capability as
``spark.readStream.format("iceberg")``).

  initialOffset      "earliest" = the table's CURRENT state as an
                     initial snapshot (delete-aware plan), then the
                     append tail; "latest" = new snapshots only; an
                     integer startingSnapshotId = appends after it
  latestOffset       driver-side metadata read (one JSON file)
  partitions(s, e)   driver-side: files ADDED by snapshots with
                     sequence-number in (s, e] — one InputPartition per
                     data FILE (added_files_of_snapshot)
  read(partition)    EXECUTOR-side pyarrow read of that one parquet
                     file (Iceberg data files carry every source
                     column, including identity partition sources)

Parallelism = files per batch; rows never pass through the driver.
Non-append snapshots (delete/overwrite/replace) error actionably —
``skipChangeSnapshots: true`` skips them, mirroring the connector's
streaming-skip-{delete,overwrite}-snapshots options.  Snapshot history
must be retained across the replay horizon (same contract the jar
has: expire_snapshots trims what a lagging stream still needs).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class IcebergNativeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_native"

    def schema(self):
        from pipeline_spark.sources.iceberg_native import (
            _spark_schema_of,
            find_table_metadata,
        )

        with open(find_table_metadata(self.options.get("path"))) as fh:
            return _spark_schema_of(json.load(fh))

    def streamReader(self, schema):
        return _IcebergStreamReader(self.options, schema)


class _FilePartition(InputPartition):
    def __init__(self, path: str, fields: list):
        self.path = path
        self.fields = fields  # [(name, typeName), ...] in output order


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.table = options.get("path")
        if not self.table:
            raise ValueError("iceberg_native stream needs a 'path' option")
        self.starting = str(
            options.get("startingsnapshotid", "earliest")
        ).lower()
        self.skip_change = (
            str(options.get("skipchangesnapshots", "")).lower() == "true"
        )
        self.schema_fields = [
            (f.name, f.dataType.typeName()) for f in schema.fields
        ]

    def _meta(self) -> dict:
        from pipeline_spark.sources.iceberg_native import find_table_metadata

        with open(find_table_metadata(self.table)) as fh:
            return json.load(fh)

    @staticmethod
    def _snaps(meta: dict) -> list[dict]:
        snaps = sorted(
            meta.get("snapshots") or [],
            key=lambda s: (
                s.get("sequence-number", 0), s.get("timestamp-ms", 0),
            ),
        )
        # offsets key on sequence-number; format-v1 tables don't record
        # them (every snapshot reads as 0), which would make the stream
        # silently NEVER advance — fail actionably instead
        seqs = [s.get("sequence-number", 0) for s in snaps]
        if len(snaps) > 1 and len(set(seqs)) != len(seqs):
            raise ValueError(
                "iceberg stream: the table's snapshots carry no distinct "
                "sequence-numbers (format-v1 metadata?) — streaming needs "
                "a format-v2 table"
            )
        return snaps

    def initialOffset(self) -> dict:
        meta = self._meta()
        snaps = self._snaps(meta)
        latest_seq = snaps[-1].get("sequence-number", 0) if snaps else 0
        if self.starting == "latest":
            return {"seq": latest_seq}
        if self.starting == "earliest":
            return {"seq": latest_seq, "snapshot_pending": True}
        snap_id = int(self.starting)
        match = next(
            (s for s in snaps if s.get("snapshot-id") == snap_id), None
        )
        if match is None:
            raise ValueError(
                f"iceberg stream: startingSnapshotId {snap_id} not in the "
                "snapshot history"
            )
        return {"seq": match.get("sequence-number", 0)}

    def latestOffset(self) -> dict:
        snaps = self._snaps(self._meta())
        return {"seq": snaps[-1].get("sequence-number", 0) if snaps else 0}

    def partitions(self, start: dict, end: dict):
        from pipeline_spark.sources.iceberg_native import (
            added_files_of_snapshot,
            plan_files,
        )

        recs: list[dict] = []
        meta = self._meta()
        if start.get("snapshot_pending"):
            snaps = self._snaps(meta)
            pending = next(
                (
                    s for s in snaps
                    if s.get("sequence-number", 0) == int(start["seq"])
                ),
                None,
            )
            # pending resolves the SNAPSHOT the offset named; when it no
            # longer exists (empty table at stream start, or the snapshot
            # expired) there is nothing to plan — falling back to the
            # CURRENT snapshot would double-read files the append loop
            # below also emits
            if pending is not None:
                data, deletes, _m = plan_files(
                    self.table, pending.get("snapshot-id")
                )
                if deletes:
                    raise ValueError(
                        "iceberg stream: the initial snapshot carries "
                        "row-level delete files — compact the table first "
                        "(the file-level stream cannot apply merge-on-read "
                        "deletes)"
                    )
                recs.extend(data)
        for snap in self._snaps(meta):
            seq = snap.get("sequence-number", 0)
            if not (int(start["seq"]) < seq <= int(end["seq"])):
                continue
            op = str((snap.get("summary") or {}).get("operation", "append"))
            if op != "append":
                if self.skip_change:
                    continue
                raise ValueError(
                    f"iceberg stream: snapshot {snap.get('snapshot-id')} is "
                    f"'{op}' — a streaming read would be incorrect; set "
                    "skipChangeSnapshots: true to skip such snapshots"
                )
            recs.extend(added_files_of_snapshot(self.table, snap))
        return [
            _FilePartition(r["path"], self.schema_fields) for r in recs
        ]

    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        cols = set(tbl.schema.names)
        for row in tbl.to_pylist():
            yield tuple(
                row.get(name) if name in cols else None
                for name, _t in partition.fields
            )

    def commit(self, end: dict) -> None:
        pass  # Spark's offset log is the source of truth


def read_iceberg_stream_native(spark, p: dict):
    """readStream DataFrame over the native snapshot replay; registration
    is idempotent per session."""
    try:
        spark.dataSource.register(IcebergNativeDataSource)
    except Exception as exc:
        if "already" not in str(exc).lower():
            raise
    table = p.get("path") or p.get("table") or p.get("input")
    if not table:
        raise ValueError("iceberg source: 'path' is required")
    reader = spark.readStream.format("iceberg_native").option(
        "path", str(table)
    )
    for key in ("startingSnapshotId", "skipChangeSnapshots"):
        if p.get(key) is not None:
            reader = reader.option(key, str(p[key]))
    return reader.load()
