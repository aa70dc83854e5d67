"""Native Delta Lake reader: batch reads without the delta-spark jar.

A Delta table on a filesystem is fully public format (PROTOCOL.md in the
delta-io/delta repo): parquet data files plus a ``_delta_log/`` of
line-delimited JSON commits and periodic parquet checkpoints.  The
reference engine reads warehouse formats through vendor runtimes
(module/source/IcebergSource.java:20-108 is the closest analogue); here
the delta-spark extension cannot be enabled mid-session even when
present, so the metadata path runs natively:

  _delta_log/_last_checkpoint  → {"version": N, ["parts": k]}
    → N.checkpoint(.part)*.parquet  (consolidated add/remove/metaData)
  _delta_log/<v>.json for v > N  → replayed last-wins per file path
    → active data file paths → ``spark.read.parquet(*paths)``

Scale posture: the log is KB-MB per commit and the checkpoint holds one
row per live file — both read driver-side, exactly like Delta's own
log replay on the Spark driver.  The data path stays a parquet scan
with full Catalyst pushdown; partitioned tables take the hive-layout
``basePath`` fast path (partition columns pruned by directory), falling
back to per-partition-value literal groups for non-hive layouts.

Deletion vectors (merge-on-read deletes) are read natively: DV bitmaps
decode executor-side (functions/deltadv.py) into a (file, row index)
frame anti-joined against ``_metadata.file_path`` / ``row_index`` — no
driver materialization of deleted positions.  Column mapping resolves
via each field's ``delta.columnMapping.physicalName`` metadata: files
read under the physical schema, one positional struct cast restores the
logical names (works for ``name`` mode and for ``id``-mode tables that
also record physical names, which delta-spark always does).

V2 checkpoints (UUID-named ``<v>.checkpoint.<uuid>.{json,parquet}``,
add actions delegated to ``_delta_log/_sidecars/`` parquet files) replay
through the same loader; ``versionAsOf`` and ``timestampAsOf`` time
travel are supported (commit time = commit-file mtime, delta's own
source when in-commit-timestamps are off).
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse
from typing import Any

_CKPT_SINGLE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_CKPT_MULTI = re.compile(r"^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$")
# v2 checkpoints (PROTOCOL.md "V2 Checkpoint Table Feature"): UUID-named
# <v>.checkpoint.<uniqueStr>.{json,parquet}, whose rows may delegate the
# add actions to sidecar parquet files under _delta_log/_sidecars/
_CKPT_V2 = re.compile(r"^(\d{20})\.checkpoint\.[A-Za-z0-9_-]+\.(json|parquet)$")
_COMMIT = re.compile(r"^(\d{20})\.json$")
_ISO_PREFIX = re.compile(r"^\d{4}-\d{2}-\d{2}[ T]")

#: reader features this implementation understands when minReaderVersion=3
_OK_READER_FEATURES = {
    "timestampNtz",
    "vacuumProtocolCheck",
    "checkConstraints",
    "appendOnly",
    "invariants",
    "deletionVectors",  # read natively (functions/deltadv.py)
    "columnMapping",    # resolved via physicalName field metadata
    "v2Checkpoint",     # UUID-named checkpoints + sidecar files
    "typeWidening",     # safe promotions; parquet readers upcast natively
    "typeWidening-preview",
}


def _log_dir(table_path: str) -> str:
    d = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"delta: no _delta_log directory at {d} — is '{table_path}' a "
            "Delta table location?"
        )
    return d


def _list_commits(log_dir: str) -> list[tuple[int, str]]:
    out = []
    for name in os.listdir(log_dir):
        m = _COMMIT.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(log_dir, name)))
    return sorted(out)


def latest_version(log_dir: str) -> int | None:
    """Highest committed version: max of JSON commits and the
    _last_checkpoint hint (commits at or below a checkpoint may have
    been vacuumed away)."""
    versions = [v for v, _ in _list_commits(log_dir)]
    hint = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(hint):
        with open(hint) as fh:
            versions.append(int(json.load(fh)["version"]))
    return max(versions) if versions else None


def _commit_time(path: str) -> float:
    """A commit's effective time in epoch seconds: the ICT feature's
    ``inCommitTimestamp`` (first-line commitInfo, r7) when present —
    robust to file copies/restores — else the commit file's mtime, the
    same fallback delta-spark uses."""
    try:
        with open(path) as fh:
            first = json.loads(fh.readline())
        ci = first.get("commitInfo")
        if isinstance(ci, dict) and ci.get("inCommitTimestamp") is not None:
            return int(ci["inCommitTimestamp"]) / 1000.0
    except (OSError, ValueError):
        pass
    return os.path.getmtime(path)


def _version_at_timestamp(log_dir: str, ts) -> int:
    """Latest version whose commit time <= ``ts`` — delta's
    ``timestampAsOf`` contract.  Commit time = in-commit timestamp when
    the table writes them (r7), else the commit file's modification
    time — the same sources delta-spark reads.  ``ts`` accepts an epoch
    number or an ISO-8601 string (naive strings are interpreted as
    UTC).  Commits vacuumed below a checkpoint are not resolvable (same
    limit as the runtime)."""
    import datetime as _dt

    if isinstance(ts, (int, float)):
        want = float(ts)
    else:
        parsed = _dt.datetime.fromisoformat(str(ts).replace("T", " "))
        if parsed.tzinfo is None:
            parsed = parsed.replace(tzinfo=_dt.timezone.utc)
        want = parsed.timestamp()
    commits = _list_commits(log_dir)
    if not commits:
        raise FileNotFoundError(f"delta: empty _delta_log at {log_dir}")
    best = None
    latest_ts = None
    for v, path in commits:
        ctime = _commit_time(path)
        latest_ts = ctime if latest_ts is None else max(latest_ts, ctime)
        if ctime <= want:
            best = v if best is None else max(best, v)
    if best is None:
        raise ValueError(
            f"delta: timestampAsOf {ts!r} is before the earliest available "
            f"commit (version {commits[0][0]}) — nothing to time-travel to"
        )
    if want > latest_ts:
        # delta-spark contract: a timestamp after the newest commit is an
        # error, not a silent read of current state — a typo'd future
        # timestamp must fail loudly instead of masquerading as history.
        import datetime as _dt

        latest_iso = _dt.datetime.fromtimestamp(
            latest_ts, _dt.timezone.utc
        ).isoformat()
        raise ValueError(
            f"delta: timestampAsOf {ts!r} is after the latest commit "
            f"(version {max(v for v, _ in commits)} at {latest_iso}); "
            "use a timestamp at or before that, or omit timestampAsOf "
            "to read the current state"
        )
    return best


def _checkpoint_files(log_dir: str, version: int) -> list[str]:
    """All files of the checkpoint at ``version`` — classic single-file,
    multi-part (sorted by part number), or a UUID-named v2 checkpoint."""
    parts = []
    for name in os.listdir(log_dir):
        m = _CKPT_SINGLE.match(name)
        if m and int(m.group(1)) == version:
            return [os.path.join(log_dir, name)]
        m = _CKPT_MULTI.match(name)
        if m and int(m.group(1)) == version:
            parts.append((int(m.group(2)), os.path.join(log_dir, name)))
        m = _CKPT_V2.match(name)
        if m and int(m.group(1)) == version:
            return [os.path.join(log_dir, name)]
    return [p for _, p in sorted(parts)]


def _maps_to_dicts(obj):
    """pyarrow map<k,v> columns round-trip to_pylist as [(k, v), ...] —
    normalize them (recursively) back to dicts so checkpoint state looks
    exactly like JSON-log state."""
    if isinstance(obj, list) and obj and all(
        isinstance(x, tuple) and len(x) == 2 for x in obj
    ):
        return {k: _maps_to_dicts(v) for k, v in obj}
    if isinstance(obj, dict):
        return {k: _maps_to_dicts(v) for k, v in obj.items()}
    return obj


def _iter_checkpoint_rows(path: str):
    """Rows of one checkpoint file — parquet or (v2) line-delimited JSON."""
    if path.endswith(".json"):
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    yield json.loads(line)
    else:
        import pyarrow.parquet as pq

        yield from pq.read_table(path).to_pylist()


def _load_checkpoint(
    paths: list[str], log_dir: str | None = None
) -> tuple[dict, dict | None, dict | None, dict]:
    """Consolidated state from checkpoint files: (adds by path, metaData,
    protocol, txns).  v2 checkpoints may carry ``sidecar`` actions whose
    parquet files (under ``_delta_log/_sidecars/``) hold the adds."""
    adds: dict[str, dict] = {}
    txns: dict[str, int] = {}
    meta = proto = None
    sidecars: list[str] = []

    def ingest(row: dict) -> None:
        add = row.get("add")
        if add and add.get("path"):
            adds[add["path"]] = _maps_to_dicts(add)
        md = row.get("metaData")
        if md and md.get("id"):
            nonlocal meta
            meta = _maps_to_dicts(md)
        pr = row.get("protocol")
        if pr and pr.get("minReaderVersion") is not None:
            nonlocal proto
            proto = pr
        tx = row.get("txn")
        if tx and tx.get("appId"):
            txns[tx["appId"]] = max(
                txns.get(tx["appId"], -1), int(tx.get("version", -1))
            )
        sc = row.get("sidecar")
        if sc and sc.get("path"):
            sidecars.append(sc["path"])

    for path in paths:
        for row in _iter_checkpoint_rows(path):
            ingest(row)
    for rel in sidecars:
        if log_dir is None:
            raise ValueError(
                "delta: v2 checkpoint carries sidecar files but no log "
                "directory was provided to resolve them"
            )
        side = rel if os.path.isabs(rel) else os.path.join(
            log_dir, "_sidecars", rel
        )
        if not os.path.exists(side):
            raise FileNotFoundError(
                f"delta: v2 checkpoint sidecar {rel} not found at {side}"
            )
        for row in _iter_checkpoint_rows(side):
            ingest(row)
    return adds, meta, proto, txns


def replay_log(
    table_path: str, version_as_of: int | None = None
) -> tuple[list[dict], dict, dict, int]:
    """Resolve live data files via checkpoint + JSON replay.

    Returns (adds, metaData, protocol, version): ``adds`` are the live
    file actions after last-wins add/remove reconciliation.
    """
    adds, meta, proto, version, _txns = replay_state(table_path, version_as_of)
    return adds, meta, proto, version


def replay_state(
    table_path: str, version_as_of: int | None = None
) -> tuple[list[dict], dict, dict, int, dict[str, int]]:
    """replay_log plus the table's transaction markers: the highest
    ``txn`` version per appId (the streaming writer's idempotence
    bookkeeping — PROTOCOL.md: Transaction Identifiers)."""
    log_dir = _log_dir(table_path)
    commits = _list_commits(log_dir)
    if not commits and not os.path.exists(os.path.join(log_dir, "_last_checkpoint")):
        raise FileNotFoundError(f"delta: empty _delta_log at {log_dir}")

    adds: dict[str, dict] = {}
    txns: dict[str, int] = {}
    meta: dict | None = None
    proto: dict | None = None
    start = 0

    hint = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(hint):
        with open(hint) as fh:
            cp = json.load(fh)
        cp_version = int(cp["version"])
        if version_as_of is None or cp_version <= version_as_of:
            cp_paths = _checkpoint_files(log_dir, cp_version)
            if not cp_paths:
                raise FileNotFoundError(
                    f"delta: _last_checkpoint points at version {cp_version} "
                    f"but no checkpoint parquet exists in {log_dir}"
                )
            adds, meta, proto, txns = _load_checkpoint(cp_paths, log_dir)
            start = cp_version + 1

    last = start - 1
    for version, path in commits:
        if version < start:
            continue
        if version_as_of is not None and version > version_as_of:
            break
        if version > last + 1:
            raise FileNotFoundError(
                f"delta: commit gap in {log_dir} — expected version "
                f"{last + 1}, found {version} (vacuumed log without a "
                "checkpoint?)"
            )
        last = version
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    adds[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    adds.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    proto = action["protocol"]
                elif "txn" in action:
                    tx = action["txn"]
                    if tx.get("appId"):
                        txns[tx["appId"]] = max(
                            txns.get(tx["appId"], -1),
                            int(tx.get("version", -1)),
                        )
    if version_as_of is not None and last < version_as_of:
        raise ValueError(
            f"delta: versionAsOf={version_as_of} but the log only reaches "
            f"version {last}"
        )
    if meta is None or proto is None:
        raise ValueError(
            f"delta: log at {log_dir} has no metaData/protocol action — "
            "corrupt or truncated table"
        )
    _check_protocol(proto, meta, adds)
    return list(adds.values()), meta, proto, last, txns


def replay_domains(
    table_path: str, version_as_of: int | None = None
) -> dict[str, dict]:
    """The table's live domain metadata (PROTOCOL.md: Domain Metadata):
    ``{domain: configuration-json-str}`` after last-wins replay, removed
    domains dropped.  Carried through checkpoints like every other
    action, so a cleaned-up log still resolves (e.g. ``delta.clustering``
    — the clustered-table feature's column list lives here)."""
    log_dir = _log_dir(table_path)
    domains: dict[str, dict] = {}

    def ingest(action: dict) -> None:
        dm = action.get("domainMetadata")
        if not dm or not dm.get("domain"):
            return
        if dm.get("removed"):
            domains.pop(dm["domain"], None)
        else:
            domains[dm["domain"]] = dm

    start = 0
    hint = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(hint):
        with open(hint) as fh:
            cp = json.load(fh)
        cp_version = int(cp["version"])
        if version_as_of is None or cp_version <= version_as_of:
            for path in _checkpoint_files(log_dir, cp_version):
                for row in _iter_checkpoint_rows(path):
                    ingest(row)
            start = cp_version + 1
    for version, path in _list_commits(log_dir):
        if version < start:
            continue
        if version_as_of is not None and version > version_as_of:
            break
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    ingest(json.loads(line))
    return domains


def _check_protocol(proto: dict, meta: dict, adds: dict[str, dict]) -> None:
    r = int(proto.get("minReaderVersion", 1))
    conf = meta.get("configuration") or {}
    if conf.get("delta.columnMapping.mode") not in (None, "", "none"):
        # supported when every field records its physical name — the
        # invariant delta-spark maintains for both 'name' and 'id' modes;
        # a table without them cannot be resolved against its files
        fields = json.loads(meta["schemaString"]).get("fields", [])
        missing = [
            f["name"]
            for f in fields
            if "delta.columnMapping.physicalName" not in (f.get("metadata") or {})
        ]
        if missing:
            raise NotImplementedError(
                f"delta: columnMapping.mode="
                f"{conf['delta.columnMapping.mode']} but fields {missing} "
                "carry no delta.columnMapping.physicalName metadata — "
                "cannot resolve physical columns"
            )
    if r >= 3:
        feats = proto.get("readerFeatures")
        if feats is None:
            raise ValueError(
                f"delta: minReaderVersion={r} requires readerFeatures in "
                "the protocol action — corrupt or unsupported table"
            )
        bad = set(feats) - _OK_READER_FEATURES
        if bad:
            raise NotImplementedError(
                f"delta: unsupported readerFeatures {sorted(bad)} — this "
                "table needs the delta-spark runtime"
            )


def _schema_from_meta(meta: dict):
    from pyspark.sql.types import StructType

    return StructType.fromJson(json.loads(meta["schemaString"]))


def _phys_json(node):
    """Schema JSON with every field renamed to its
    ``delta.columnMapping.physicalName`` (recursively); metadata cleared."""
    if not isinstance(node, dict):
        return node
    out = dict(node)
    t = node.get("type")
    if t == "struct":
        out["fields"] = [
            {
                **f,
                "name": (f.get("metadata") or {}).get(
                    "delta.columnMapping.physicalName", f["name"]
                ),
                "type": _phys_json(f["type"]),
                "metadata": {},
            }
            for f in node["fields"]
        ]
    elif t == "array":
        out["elementType"] = _phys_json(node["elementType"])
    elif t == "map":
        out["keyType"] = _phys_json(node["keyType"])
        out["valueType"] = _phys_json(node["valueType"])
    return out


def _column_mapping(meta: dict) -> dict[str, Any] | None:
    """None when the table has no column mapping; else
    {"phys_of": {logical: physical}, "phys_schema": StructType} — the
    physical names files are written under (PROTOCOL.md Column Mapping;
    valid for mode=name, and for mode=id tables that also record
    physical names, which delta-spark always does)."""
    conf = meta.get("configuration") or {}
    if conf.get("delta.columnMapping.mode") in (None, "", "none"):
        return None
    from pyspark.sql.types import StructType

    sj = json.loads(meta["schemaString"])
    phys_of = {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        for f in sj.get("fields", [])
    }
    return {
        "phys_of": phys_of,
        "phys_schema": StructType.fromJson(_phys_json(sj)),
    }


def stats_to_logical(adds: list[dict], cm: dict | None) -> None:
    """Translate each add's stats keys from PHYSICAL to logical names in
    place (metadata scale, driver-side) so stats-based file skipping
    keeps working on logical filter keys."""
    if not cm:
        return
    log_of = {v: k for k, v in cm["phys_of"].items()}
    for a in adds:
        if a.get("stats"):
            try:
                st = json.loads(a["stats"])
                for sect in ("minValues", "maxValues", "nullCount"):
                    if isinstance(st.get(sect), dict):
                        st[sect] = {
                            log_of.get(k, k): v for k, v in st[sect].items()
                        }
                a["stats"] = json.dumps(st)
            except (ValueError, TypeError):
                pass


def _nullable_type(dt):
    """A nullability-relaxed copy of a Spark type: struct casts refuse a
    nullable→non-nullable field, and parquet round-trips erase the
    original non-null markers anyway (Delta's own write behavior)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return T.StructType([
            T.StructField(f.name, _nullable_type(f.dataType), True, f.metadata)
            for f in dt.fields
        ])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_nullable_type(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _nullable_type(dt.keyType), _nullable_type(dt.valueType), True
        )
    return dt


def to_physical_df(df, cm: dict | None):
    """Rename a logical-schema DataFrame to the physical names data files
    are written under: one positional struct cast per column renames
    every nesting level (the exact inverse of the reader's restore).
    Columns with no mapping (e.g. ``_change_type``) pass through."""
    if not cm:
        return df
    from pyspark.sql import functions as F

    from pipeline_spark.functions.sqltext import atomic_ddl, qi

    # r16: SQL text per column (one selectExpr round-trip) instead of
    # col+cast+alias Column calls each; nested types keep the Column
    # cast (their simpleString would not quote physical field names)
    fields = {f.name: f for f in cm["phys_schema"].fields}
    exprs: list = []
    for name in df.columns:
        p = cm["phys_of"].get(name, name)
        if p in fields:
            t = _nullable_type(fields[p].dataType)
            ddl = atomic_ddl(t)
            if ddl is None:
                exprs.append(F.col(name).cast(t).alias(p))
            else:
                exprs.append(f"CAST({qi(name)} AS {ddl}) AS {qi(p)}")
        else:
            exprs.append(f"{qi(name)} AS {qi(p)}")
    if all(isinstance(e, str) for e in exprs):
        return df.selectExpr(*exprs)
    return df.select(
        *[F.expr(e) if isinstance(e, str) else e for e in exprs]
    )


def to_logical_df(df, cm: dict | None, fields, keep: tuple = ()):
    """Restore logical names on a physical-schema frame: one positional
    struct cast per column renames every nesting level.  ``fields`` =
    the logical StructFields to restore; ``keep`` = passthrough columns
    (``__dv_fp``, ``_change_type``...) appended verbatim when present."""
    from pyspark.sql import functions as F

    from pipeline_spark.functions.sqltext import atomic_ddl, qi

    if not cm:
        sel: list = [qi(f.name) for f in fields]
    else:
        sel = []
        for f in fields:
            t = _nullable_type(f.dataType)
            ddl = atomic_ddl(t)
            phys = cm["phys_of"].get(f.name, f.name)
            if ddl is None:
                sel.append(F.col(phys).cast(t).alias(f.name))
            else:
                sel.append(f"CAST({qi(phys)} AS {ddl}) AS {qi(f.name)}")
    sel += [qi(k) for k in keep if k in df.columns]
    if all(isinstance(e, str) for e in sel):
        return df.selectExpr(*sel)
    return df.select(*[F.expr(e) if isinstance(e, str) else e for e in sel])


def _is_hive_layout(adds: list[dict], part_cols: list[str]) -> bool:
    """True when every live file path embeds every partition column as a
    ``col=value`` directory segment AND all files share one top-level
    commit directory — Spark's partition discovery can then recover the
    columns without per-file literals.  Files spread across SEVERAL
    commit dirs (the normal state after appends) have a non-partition
    dir between basePath and the partition segments, which Spark's
    inference rejects (CONFLICTING_DIRECTORY_STRUCTURES) even with
    basePath set — those take the per-partition literal-group scan."""
    roots = set()
    for a in adds:
        segs = a["path"].split("/")[:-1]
        seen = {s.split("=", 1)[0] for s in segs if "=" in s}
        if not set(part_cols) <= seen:
            return False
        roots.add(a["path"].split("/", 1)[0])
    return len(roots) <= 1


from pipeline_spark.registry import KIND_SOURCE, ModuleContext, module


@module("delta", kind=KIND_SOURCE)
def delta_source(ctx: ModuleContext) -> dict[str, Any]:
    """`delta` source module: filesystem Delta tables, read natively.
    ``mode: streaming`` follows the commit log as a stream
    (sources/delta_stream.py); ``mode: cdf`` (or ``readChangeFeed:
    true``) returns the change feed between ``startingVersion`` and
    ``endingVersion``."""
    mode = str(ctx.params.get("mode", "")).lower()
    if mode == "history":
        return {"": read_delta_history(ctx.spark, ctx.params)}
    if mode == "streaming":
        if ctx.params.get("readChangeFeed"):
            from pipeline_spark.sources.delta_stream import (
                read_delta_cdf_stream_native,
            )

            return {"": read_delta_cdf_stream_native(ctx.spark, ctx.params)}
        from pipeline_spark.sources.delta_stream import read_delta_stream_native

        return {"": read_delta_stream_native(ctx.spark, ctx.params)}
    if mode == "cdf" or ctx.params.get("readChangeFeed"):
        return {"": read_delta_cdf(ctx.spark, ctx.params)}
    return {"": read_delta_native(ctx.spark, ctx.params)}


def _uri_to_path(col):
    """``_metadata.file_path`` (a URI: scheme + percent-encoding) → the
    raw filesystem path driver-side code uses.  A hive partition value
    with a space ('grp=4-NOT SPECIFIED/') arrives as %20 — an undecoded
    comparison silently misses the file and deleted rows resurrect.
    ``url_decode`` form-decodes '+' as space, so literal '+' is escaped
    to %2B first; the URI encoder escapes '%' itself, so every remaining
    %XX is a valid escape."""
    from pyspark.sql import functions as F

    return F.url_decode(
        F.regexp_replace(
            F.regexp_replace(col, "^file:/+", "/"), r"\+", "%2B"
        )
    )


def read_files_with_dv(spark, table, fschema, adds, with_meta: bool = False):
    """DataFrame over these add actions' data files with their deletion
    vectors APPLIED — the one correct way to re-read table files once
    DVs are writable state (mutation rewrites, compaction, CDF remove
    derivation must never treat a DV-carrying file as fully live).

    Files without DVs read in one multi-path scan; DV files anti-join
    their executor-decoded (file, row-index) frame.  ``with_meta=True``
    keeps ``__dv_fp``/``__dv_ri`` (normalized file path + physical row
    index) on the output for callers that need row identity.
    """
    from pyspark.sql import functions as F

    from pipeline_spark.functions.sqltext import fp_norm_sql

    # r16: SQL text — one selectExpr round-trip instead of ~10 Column
    # calls per scan (this helper runs on every DV-aware delta read)
    meta_texts = [
        fp_norm_sql("_metadata.file_path") + " AS __dv_fp",
        "_metadata.row_index AS __dv_ri",
    ]

    paths = [
        os.path.join(table, urllib.parse.unquote(a["path"])) for a in adds
    ]
    plain = [p for p, a in zip(paths, adds) if not a.get("deletionVector")]
    dv = [
        (p, a["deletionVector"])
        for p, a in zip(paths, adds)
        if a.get("deletionVector")
    ]
    parts = []
    if plain:
        # recursiveFileLookup: explicit-file scans must not run
        # partition-directory inference — staged rewrite dirs
        # (data-delete-*/grp-*) sit at different depths than plain
        # data dirs and would raise CONFLICTING_DIRECTORY_STRUCTURES
        df = (
            spark.read.schema(fschema)
            .option("recursiveFileLookup", "true")
            .parquet(*plain)
        )
        if with_meta:
            df = df.selectExpr("*", *meta_texts)
        parts.append(df)
    if dv:
        df = (
            spark.read.schema(fschema)
            .option("recursiveFileLookup", "true")
            .parquet(*[p for p, _ in dv])
        ).selectExpr(
            "*", *meta_texts
        )
        entries = [(os.path.abspath(p), json.dumps(d)) for p, d in dv]
        tbl = table

        def decode(it):
            import json as _j

            from pipeline_spark.functions.deltadv import load_dv_positions

            for fp, dj in it:
                for pos in load_dv_positions(tbl, _j.loads(dj)):
                    yield (fp, int(pos))

        from pipeline_spark.functions.dvframe import (
            positions_frame,
            total_rows_of,
        )

        deleted, small = positions_frame(
            spark, entries, decode, "__dv_fp string, __dv_ri bigint",
            total_rows_of(d.get("cardinality") for _p, d in dv),
        )
        if small:
            deleted = F.broadcast(deleted)
        out = df.join(deleted, on=["__dv_fp", "__dv_ri"], how="left_anti")
        if not with_meta:
            out = out.drop("__dv_fp", "__dv_ri")
        parts.append(out)
    if not parts:
        return spark.createDataFrame([], fschema)
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


def read_delta_cdf(spark, p: dict[str, Any]):
    """Change Data Feed between two versions (delta's ``table_changes``).

    For each commit in [startingVersion, endingVersion]:

      * ``cdc`` actions present → ONLY those change files are read (the
        writer recorded exact row-level changes: ``delete``,
        ``update_preimage``/``update_postimage``);
      * otherwise data-changing ``add`` files surface as ``insert`` rows
        and data-changing ``remove`` files as ``delete`` rows (reading
        the removed file's content — full-file semantics, e.g. an
        overwrite), per the protocol's CDF derivation rule.

    Output columns: table columns + ``_change_type``,
    ``_commit_version``, ``_commit_timestamp``.  The log must still hold
    every commit in range (vacuumed/checkpoint-trimmed history errors
    actionably); planning is O(commits in range) driver-side, file reads
    stay distributed.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    table = p.get("path") or p.get("table") or p.get("input")
    if not table:
        raise ValueError("delta cdf: 'path' is required")
    log_dir = _log_dir(table)
    last = latest_version(log_dir)
    if last is None:
        raise FileNotFoundError(f"delta cdf: empty _delta_log at {log_dir}")
    start = int(p.get("startingVersion", 0))
    end = int(p.get("endingVersion", last))
    if start > end:
        raise ValueError(f"delta cdf: startingVersion {start} > endingVersion {end}")
    commits = dict(_list_commits(log_dir))
    missing = [v for v in range(start, end + 1) if v not in commits]
    if missing:
        raise FileNotFoundError(
            f"delta cdf: commits {missing} are no longer in the log "
            "(checkpoint-trimmed or vacuumed) — change feed needs the "
            "JSON history for the requested range"
        )
    # schema as of the requested end (CDF ranges are read under one schema)
    _adds, meta, _proto, _v, _t = replay_state(table, end)
    if (meta.get("configuration") or {}).get(
        "delta.enableChangeDataFeed", ""
    ).lower() != "true":
        # derivable changes (pure appends/overwrites) still work, but
        # row-level DML history before enablement is not reconstructable;
        # mirror delta's own behavior of refusing silently-partial feeds
        raise ValueError(
            "delta cdf: table does not set delta.enableChangeDataFeed=true "
            "— row-level changes were not recorded"
        )
    schema = _schema_from_meta(meta)
    part_cols = list(meta.get("partitionColumns") or [])
    cm = _column_mapping(meta)
    # data/cdc files are written under PHYSICAL names on column-mapped
    # tables: read under the physical schema, restore logical in attach()
    phys_part_cols = (
        [cm["phys_of"].get(c, c) for c in part_cols] if cm else part_cols
    )
    read_fields = cm["phys_schema"].fields if cm else schema.fields
    fschema = StructType(
        [f for f in read_fields if f.name not in phys_part_cols]
    )
    log_fschema = [f for f in schema.fields if f.name not in part_cols]
    types = {f.name: f.dataType for f in schema.fields}
    cdc_schema = StructType(
        [*fschema.fields]
    ).add("_change_type", "string")

    def attach(df, pv, ctype, version, ts_ms):
        df = to_logical_df(df, cm, log_fschema, keep=("_change_type",))
        for c in part_cols:
            v = (pv or {}).get(cm["phys_of"].get(c, c) if cm else c)
            df = df.withColumn(
                c,
                F.lit(v).cast(types[c]) if v is not None
                else F.lit(None).cast(types[c]),
            )
        if ctype is not None:
            df = df.withColumn("_change_type", F.lit(ctype))
        return (
            df.withColumn("_commit_version", F.lit(version).cast("long"))
            .withColumn(
                "_commit_timestamp",
                F.timestamp_millis(F.lit(ts_ms).cast("long")),
            )
            .select(
                *[f.name for f in schema.fields],
                "_change_type", "_commit_version", "_commit_timestamp",
            )
        )

    parts = []
    for v in range(start, end + 1):
        cdc_actions, add_actions, remove_actions = [], [], []
        ts_ms = int(os.path.getmtime(commits[v]) * 1000)
        with open(commits[v]) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    cdc_actions.append(action["cdc"])
                elif "add" in action and action["add"].get("dataChange", True):
                    add_actions.append(action["add"])
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    remove_actions.append(action["remove"])
                elif "commitInfo" in action and action["commitInfo"].get(
                    "timestamp"
                ):
                    ts_ms = int(action["commitInfo"]["timestamp"])
        def by_partition(actions):
            grouped: dict[tuple, list[dict]] = {}
            for act in actions:
                key = tuple(sorted((act.get("partitionValues") or {}).items()))
                grouped.setdefault(key, []).append(act)
            return grouped

        if cdc_actions:
            # one multi-path scan per partition tuple, not per file —
            # a realistic range would otherwise chain thousands of scans
            for key, acts in by_partition(cdc_actions).items():
                cpaths = [
                    os.path.join(table, urllib.parse.unquote(c["path"]))
                    for c in acts
                ]
                df = spark.read.schema(cdc_schema).parquet(*cpaths)
                parts.append(attach(df, dict(key), None, v, ts_ms))
            continue
        for key, acts in by_partition(add_actions).items():
            df = read_files_with_dv(spark, table, fschema, acts)
            parts.append(attach(df, dict(key), "insert", v, ts_ms))
        if remove_actions:
            # delete rows = the removed files' content AS OF the prior
            # version: the pre-remove add carries the file's deletion
            # vector, which must not resurrect already-deleted rows
            prior_adds, _m2, _p2, _v2, _t2 = replay_state(table, v - 1)
            prior_by_path = {a["path"]: a for a in prior_adds}
            for key, acts in by_partition(remove_actions).items():
                resolved = []
                for r in acts:
                    path = os.path.join(
                        table, urllib.parse.unquote(r["path"])
                    )
                    if not os.path.exists(path):
                        raise FileNotFoundError(
                            f"delta cdf: removed file {r['path']} (version "
                            f"{v}) was vacuumed — its delete rows cannot "
                            "be reconstructed"
                        )
                    resolved.append(prior_by_path.get(r["path"], r))
                df = read_files_with_dv(spark, table, fschema, resolved)
                parts.append(attach(df, dict(key), "delete", v, ts_ms))
    if not parts:
        empty = StructType([*schema.fields]).add("_change_type", "string").add(
            "_commit_version", "long"
        ).add("_commit_timestamp", "timestamp")
        return spark.createDataFrame([], empty)
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    id_cols = [str(c) for c in (p.get("identifierColumns") or [])]
    if id_cols:
        # r8: pair per-key delete+insert within one commit into update
        # pre/post images and net out unchanged full-file-derivation
        # pairs — writer-staged update_* rows pass through untouched
        from pipeline_spark.functions.cdc import compute_cdc_updates

        out = compute_cdc_updates(
            out, [f.name for f in schema.fields], id_cols,
            ["_commit_version", "_commit_timestamp"],
        )
    return out


def _coerce_stat(v, want):
    """Parse a stats-JSON value and the filter literal into comparables.

    ISO-8601 date/timestamp strings compare lexicographically, which
    matches chronological order for the fixed-width format the stats
    writer emits."""
    if v is None or want is None:
        return None, None
    def norm(s: str) -> str:
        # normalize the 'T' vs ' ' datetime separator so lexicographic
        # comparison stays chronological across both spellings, and strip
        # a UTC offset suffix (externally-written stats may carry
        # '+00:00'/'Z', which would sort after every suffix-free literal)
        if _ISO_PREFIX.match(s):
            s = s.replace(" ", "T")
            if s.endswith("Z"):
                s = s[:-1]
            elif s.endswith("+00:00"):
                s = s[:-6]
            return s
        return s

    if isinstance(v, str) and not isinstance(want, str):
        # ISO-encoded date/timestamp stat vs a non-string filter literal
        return norm(v), norm(str(want))
    if isinstance(v, (int, float)) and isinstance(want, (int, float, bool)):
        return float(v), float(want)
    if isinstance(v, str) and isinstance(want, str):
        return norm(v), norm(want)
    if isinstance(v, bool) or isinstance(want, bool):
        return bool(v), bool(want)
    try:
        return float(v), float(want)
    except (TypeError, ValueError):
        return None, None


def _stats_may_match(a: dict, dfilter: list[dict], schema) -> bool:
    """False only when the file's stats PROVE no row satisfies EVERY
    predicate (the filter list is an AND).  Absent stats → True."""
    raw = a.get("stats")
    if not raw:
        return True
    try:
        st = json.loads(raw) if isinstance(raw, str) else raw
    except (TypeError, ValueError):
        return True
    mins = st.get("minValues") or {}
    maxs = st.get("maxValues") or {}
    nulls = st.get("nullCount") or {}
    nrec = st.get("numRecords")
    for f in dfilter:
        key, op = f.get("key"), str(f.get("op", "=")).lower()
        want = f.get("value")
        if op in ("isnull", "is_null"):
            if key in nulls and nulls[key] == 0:
                return False
            continue
        if op in ("isnotnull", "is_not_null"):
            if key in nulls and nrec is not None and nulls[key] == nrec:
                return False
            continue
        if op == "in":
            vals = want if isinstance(want, (list, tuple)) else [want]
            ok = False
            for v in vals:
                l2, wv = _coerce_stat(mins.get(key), v)
                h2, _ = _coerce_stat(maxs.get(key), v)
                if l2 is None or h2 is None or (l2 <= wv <= h2):
                    ok = True
                    break
            if not ok:
                return False
            continue
        lo, w1 = _coerce_stat(mins.get(key), want)
        hi, w2 = _coerce_stat(maxs.get(key), want)
        if lo is None or hi is None:
            continue
        if op in ("=", "=="):
            if w1 < lo or w2 > hi:
                return False
        elif op == "<":
            if lo >= w1:
                return False
        elif op == "<=":
            if lo > w1:
                return False
        elif op == ">":
            if hi <= w1:
                return False
        elif op == ">=":
            if hi < w1:
                return False
        # != and unknown ops: stats cannot prune soundly — keep the file
    return True


def data_filter_condition(dfilter: list[dict]):
    """The AND of a predicate list as one Column (shared by the readers'
    dataFilter and the writers' delete-WHERE).

    r16: spelled as one SQL text when every key/value is spellable —
    one F.expr round-trip instead of ~6 Column calls per predicate on
    every DML/read path; the Column construction below stays as the
    exact fallback (unspellable literals, exotic key names)."""
    from pyspark.sql import functions as F

    if isinstance(dfilter, dict):
        dfilter = [dfilter]
    sql = _data_filter_sql(dfilter)
    if sql is not None:
        return F.expr(sql)
    conds = []
    for f in dfilter:
        key, op = f.get("key"), str(f.get("op", "=")).lower()
        want = f.get("value")
        c = F.col(key)
        if op in ("=", "=="):
            cond = c == F.lit(want)
        elif op == "!=":
            cond = c != F.lit(want)
        elif op == "<":
            cond = c < F.lit(want)
        elif op == "<=":
            cond = c <= F.lit(want)
        elif op == ">":
            cond = c > F.lit(want)
        elif op == ">=":
            cond = c >= F.lit(want)
        elif op == "in":
            cond = c.isin(list(want if isinstance(want, (list, tuple)) else [want]))
        elif op in ("isnull", "is_null"):
            cond = c.isNull()
        elif op in ("isnotnull", "is_not_null"):
            cond = c.isNotNull()
        else:
            raise ValueError(f"delta dataFilter: unknown op '{op}'")
        conds.append(cond)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


_SIMPLE_KEY = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _data_filter_sql(dfilter: list[dict]) -> str | None:
    """SQL text of the predicate list, or None when any piece cannot be
    spelled with the exact semantics of the Column construction
    (F.col parses dotted keys as nested access, so only plain/dotted
    identifier keys qualify)."""
    from pipeline_spark.functions.sqltext import sql_lit

    parts = []
    try:
        for f in dfilter:
            key, op = f.get("key"), str(f.get("op", "=")).lower()
            if not isinstance(key, str) or not _SIMPLE_KEY.match(key):
                return None
            want = f.get("value")
            if op in ("=", "=="):
                parts.append(f"({key} = {sql_lit(want)})")
            elif op in ("!=", "<", "<=", ">", ">="):
                sop = "!=" if op == "!=" else op
                parts.append(f"({key} {sop} {sql_lit(want)})")
            elif op == "in":
                vals = list(
                    want if isinstance(want, (list, tuple)) else [want]
                )
                if not vals:
                    return None  # Column isin([]) has its own semantics
                parts.append(
                    f"({key} IN ("
                    + ", ".join(sql_lit(v) for v in vals)
                    + "))"
                )
            elif op in ("isnull", "is_null"):
                parts.append(f"({key} IS NULL)")
            elif op in ("isnotnull", "is_not_null"):
                parts.append(f"({key} IS NOT NULL)")
            else:
                return None  # unknown op: the Column path raises
    except ValueError:
        return None
    return " AND ".join(parts) if parts else None


def _apply_data_filter(df, dfilter: list[dict]):
    """The row-level semantics of dataFilter — file skipping is only an
    optimization layered under this."""
    return df.where(data_filter_condition(dfilter))


def read_delta_native(spark, p: dict[str, Any]):
    """DataFrame over a filesystem Delta table via the metadata path."""
    table = p.get("path") or p.get("table") or p.get("input")
    if not table:
        raise ValueError("delta source: 'path' is required")
    version = p.get("versionAsOf")
    if p.get("timestampAsOf") is not None:
        if version is not None:
            raise ValueError(
                "delta: versionAsOf and timestampAsOf are mutually exclusive"
            )
        version = _version_at_timestamp(_log_dir(table), p["timestampAsOf"])
    adds, meta, _proto, _v = replay_log(
        table, int(version) if version is not None else None
    )
    schema = _schema_from_meta(meta)
    part_cols = list(meta.get("partitionColumns") or [])
    cm = _column_mapping(meta)
    # files, partitionValues keys and stats keys all use PHYSICAL names;
    # translate stats back to logical once (metadata scale) so dataFilter
    # skipping keeps working on logical columns
    stats_to_logical(adds, cm)
    pfilter = p.get("partitionFilter")
    if pfilter:
        # LOG-level pruning: drop whole data files by their recorded
        # partitionValues before Spark plans a single task (the same
        # shape as the iceberg reader's manifest pruning).  Filter form:
        # {partition_column: value | [values]}, matched on the raw
        # string values the log stores.
        unknown = set(pfilter) - set(part_cols)
        if unknown:
            raise ValueError(
                f"delta: partitionFilter fields {sorted(unknown)} are not "
                f"partition columns (have {part_cols})"
            )

        def keep(a: dict) -> bool:
            pv = a.get("partitionValues") or {}
            for k, want in pfilter.items():
                have = pv.get(cm["phys_of"].get(k, k) if cm else k)
                if isinstance(want, (list, tuple)):
                    if have not in [str(w) for w in want]:
                        return False
                elif have != str(want):
                    return False
            return True

        adds = [a for a in adds if keep(a)]
        if not adds:
            raise ValueError(
                f"delta: partitionFilter {pfilter} matches no data files"
            )
    dfilter = p.get("dataFilter")
    if dfilter:
        # STATS-level file skipping: drop whole data files whose recorded
        # add.stats PROVE no row can match (min/max disjoint, null counts
        # decisive).  Files without stats always survive — skipping is an
        # optimization, the row-level filter below is the semantics.
        if isinstance(dfilter, dict):
            dfilter = [dfilter]
        adds = [a for a in adds if _stats_may_match(a, dfilter, schema)]
        if not adds:
            return _apply_data_filter(spark.createDataFrame([], schema), dfilter)
    if not adds:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table, urllib.parse.unquote(a["path"])) for a in adds]

    from pyspark.sql import functions as F

    # physical view of the table: column mapping renames, DV descriptors
    read_schema = cm["phys_schema"] if cm else schema
    # row tracking (PROTOCOL.md Row Tracking): ``withRowIds: true`` adds
    # ``_row_id`` / ``_row_commit_version`` — a row's id is the
    # MATERIALIZED column when a rewrite preserved it, else
    # baseRowId + physical position (fresh rows); the commit version
    # follows the same rule via defaultRowCommitVersion
    want_ri = bool(p.get("withRowIds"))
    conf_ri = meta.get("configuration") or {}
    mat_id = conf_ri.get("delta.rowTracking.materializedRowIdColumnName")
    mat_cv = conf_ri.get(
        "delta.rowTracking.materializedRowCommitVersionColumnName"
    )
    if want_ri:
        missing_ri = [a["path"] for a in adds if a.get("baseRowId") is None]
        if missing_ri:
            raise ValueError(
                "delta: withRowIds needs a row-tracking table — files "
                f"without baseRowId: {missing_ri[:3]}"
            )
        from pyspark.sql.types import LongType, StructField, StructType

        mat_fields = [
            StructField(c, LongType(), True)
            for c in (mat_id, mat_cv) if c
        ]
        if mat_fields:
            read_schema = StructType(list(read_schema.fields) + mat_fields)
    phys_part_cols = (
        [cm["phys_of"].get(c, c) for c in part_cols] if cm else part_cols
    )
    dv_adds = [
        (pth, a["deletionVector"])
        for a, pth in zip(adds, paths)
        if a.get("deletionVector")
    ]

    def add_meta(df):
        # merge-on-read: tag every row with its file + physical row index
        # so DV positions can anti-join it away (row-id derivation needs
        # the same pair)
        if not dv_adds and not want_ri:
            return df
        from pipeline_spark.functions.sqltext import fp_norm_sql

        return df.selectExpr(
            "*",
            # normalize the URI ("file:/p" → "/p", %XX decoded) so it
            # matches the descriptor-side os.path.abspath form
            fp_norm_sql("_metadata.file_path") + " AS __dv_fp",
            "_metadata.row_index AS __dv_ri",
        )

    def drop_deleted(df):
        if not dv_adds:
            return df
        tbl = table
        entries = [
            (os.path.abspath(pth), json.dumps(desc)) for pth, desc in dv_adds
        ]

        def decode(it):
            # bitmap decode runs ON EXECUTORS — deleted positions never
            # materialize on the driver (a DV can carry millions of rows)
            import json as _j

            from pipeline_spark.functions.deltadv import load_dv_positions

            for fp, dj in it:
                for pos in load_dv_positions(tbl, _j.loads(dj)):
                    yield (fp, int(pos))

        from pipeline_spark.functions.dvframe import (
            positions_frame,
            total_rows_of,
        )

        deleted, small = positions_frame(
            spark, entries, decode, "__dv_fp string, __dv_ri bigint",
            total_rows_of(desc.get("cardinality") for _p, desc in dv_adds),
        )
        if small:
            deleted = F.broadcast(deleted)
        out = df.join(
            deleted, on=["__dv_fp", "__dv_ri"], how="left_anti"
        )
        # survivors keep their PHYSICAL positions — exactly what the
        # row-id derivation needs, so the stamp stays when requested
        return out if want_ri else out.drop("__dv_fp", "__dv_ri")

    def done(out):
        # one positional struct cast per column restores the logical
        # names at every nesting level — no per-field rewrites
        keep = (
            ("__dv_fp", "__dv_ri") + tuple(c for c in (mat_id, mat_cv) if c)
            if want_ri else ()
        )
        out = to_logical_df(drop_deleted(out), cm, schema.fields, keep=keep)
        if want_ri:
            from pipeline_spark.functions.localframe import local_frame

            rid = local_frame(
                spark,
                [
                    (
                        os.path.abspath(pth),
                        int(a["baseRowId"]),
                        int(a.get("defaultRowCommitVersion") or 0),
                    )
                    for a, pth in zip(adds, paths)
                ],
                "__rt_fp string, __rt_base long, __rt_dcv long",
            )
            out = out.join(
                F.broadcast(rid), out["__dv_fp"] == rid["__rt_fp"], "left"
            )
            mat_id_col = (
                F.col(mat_id) if mat_id and mat_id in out.columns
                else F.lit(None).cast("long")
            )
            mat_cv_col = (
                F.col(mat_cv) if mat_cv and mat_cv in out.columns
                else F.lit(None).cast("long")
            )
            out = out.withColumn(
                "_row_id",
                F.coalesce(mat_id_col, F.col("__rt_base") + F.col("__dv_ri")),
            ).withColumn(
                "_row_commit_version",
                F.coalesce(mat_cv_col, F.col("__rt_dcv")),
            ).drop(
                "__dv_fp", "__dv_ri", "__rt_fp", "__rt_base", "__rt_dcv",
                *[c for c in (mat_id, mat_cv) if c],
            )
        return _apply_data_filter(out, dfilter) if dfilter else out

    if not part_cols:
        # explicit files, no partition columns: skip directory inference
        return done(
            add_meta(
                spark.read.schema(read_schema)
                .option("recursiveFileLookup", "true")
                .parquet(*paths)
            )
        )
    if _is_hive_layout(adds, phys_part_cols):
        # hive layout: directory-based partition columns, pruned by Spark
        return done(
            add_meta(
                spark.read.schema(read_schema)
                .option("basePath", table)
                .parquet(*paths)
            )
        )
    # non-hive layout: group files by partition tuple, attach literals
    from pyspark.sql.types import StructType

    fschema = StructType(
        [f for f in read_schema.fields if f.name not in phys_part_cols]
    )
    types = {f.name: f.dataType for f in read_schema.fields}
    groups: dict[tuple, list[str]] = {}
    for a, path in zip(adds, paths):
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in phys_part_cols)
        groups.setdefault(key, []).append(path)
    parts = []
    for key, gpaths in groups.items():
        df = add_meta(
            spark.read.schema(fschema)
            .option("recursiveFileLookup", "true")
            .parquet(*gpaths)
        )
        for c, v in zip(phys_part_cols, key):
            df = df.withColumn(
                c, F.lit(v).cast(types[c]) if v is not None else F.lit(None).cast(types[c])
            )
        parts.append(df)
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return done(out)


def read_delta_history(spark, p: dict[str, Any]):
    """DESCRIBE HISTORY: one row per retained commit — version,
    timestamp (commitInfo's when recorded, else the commit file's
    mtime, the same clock time travel uses), operation and its
    parameters (JSON string).  Newest first, like delta's own."""
    import datetime as _dt

    table = p.get("path") or p.get("table") or p.get("input")
    if not table:
        raise ValueError("delta history: 'path' is required")
    log_dir = _log_dir(table)
    commits = _list_commits(log_dir)
    if not commits:
        raise FileNotFoundError(f"delta history: empty _delta_log at {table}")
    rows = []
    for v, path in commits:
        op = None
        params: dict = {}
        ts_ms = int(os.path.getmtime(path) * 1000)
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if "commitInfo" in act:
                    ci = act["commitInfo"]
                    op = ci.get("operation")
                    params = ci.get("operationParameters") or {}
                    if ci.get("timestamp"):
                        ts_ms = int(ci["timestamp"])
                    break  # commitInfo is one-per-commit
        rows.append((
            v,
            _dt.datetime.fromtimestamp(ts_ms / 1000.0, tz=_dt.timezone.utc),
            op,
            json.dumps(params),
        ))
    rows.sort(key=lambda r: -r[0])
    return spark.createDataFrame(
        rows,
        "version long, timestamp timestamp, operation string,"
        " operation_parameters string",
    )
