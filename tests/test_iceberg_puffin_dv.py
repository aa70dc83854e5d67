"""Iceberg v3 deletion vectors in Puffin (r8, VERDICT r7 ask #9).

Container framing validated against the PUBLIC Puffin spec (magic
placement, LE footer size/flags, JSON FileMetadata) and the v3
deletion-vector-v1 blob framing (BE length + delta-portable roaring
bitmap + BE CRC-32); the end-to-end path drives DELETE WHERE →
puffin DV commit → read-side subtraction → compaction materialization.
"""

import json
import os
import struct

import pytest

from pipeline_spark.functions.puffin import (
    MAGIC,
    read_dv_positions,
    read_puffin_footer,
    write_puffin_dvs,
)
from pipeline_spark.sinks.iceberg_native import (
    compact_iceberg_native,
    delete_iceberg_native,
    merge_iceberg_native,
    write_iceberg_native,
)
from pipeline_spark.sources.iceberg_native import (
    find_table_metadata,
    plan_files,
    read_iceberg_native,
)


def test_puffin_container_framing(tmp_path):
    path = str(tmp_path / "dv.puffin")
    blobs = write_puffin_dvs(path, [
        ("/data/a.parquet", [0, 3, 5, 100000]),
        ("/data/b.parquet", [7]),
    ])
    raw = open(path, "rb").read()
    # spec: magic at offsets 0, footer start, and file end
    assert raw[:4] == MAGIC and raw[-4:] == MAGIC
    (size,) = struct.unpack_from("<i", raw, len(raw) - 12)
    (flags,) = struct.unpack_from("<i", raw, len(raw) - 8)
    assert flags == 0
    payload = json.loads(raw[len(raw) - 12 - size:len(raw) - 12])
    assert [b["type"] for b in payload["blobs"]] == ["deletion-vector-v1"] * 2
    assert payload["blobs"][0]["properties"]["referenced-data-file"] == (
        "/data/a.parquet"
    )
    assert payload["blobs"][0]["properties"]["cardinality"] == "4"
    # footer parse agrees with the raw layout
    footer = read_puffin_footer(path)
    assert footer == payload
    # blob decode roundtrip
    b0 = blobs[0]
    assert list(read_dv_positions(path, b0["offset"], b0["length"])) == [
        0, 3, 5, 100000,
    ]
    assert list(read_dv_positions(
        path, blobs[1]["offset"], blobs[1]["length"])) == [7]


def test_puffin_crc_guard(tmp_path):
    path = str(tmp_path / "bad.puffin")
    blobs = write_puffin_dvs(path, [("/data/a.parquet", [1, 2])])
    raw = bytearray(open(path, "rb").read())
    raw[blobs[0]["offset"] + 5] ^= 0xFF  # corrupt one bitmap byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC"):
        read_dv_positions(path, blobs[0]["offset"], blobs[0]["length"])


def _mk(spark, tmp_path, n_files=2, per=10):
    tbl = str(tmp_path / "tbl")
    for i in range(n_files):
        df = spark.createDataFrame(
            [(i * per + j, f"v{i * per + j}") for j in range(per)],
            "id long, v string",
        ).coalesce(1)
        write_iceberg_native(
            df, {"path": tbl, "mode": "append" if i else "create"}
        )
    return tbl


def test_delete_where_format_puffin_roundtrip(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    out = delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "in", "value": [2, 3, 15]}],
    })
    assert out["deleted_rows"] == 3 and out["dv_blobs"] == 2
    # manifests carry the v3 addressing and the metadata is v3 now
    _, dels, meta = plan_files(tbl)
    assert meta["format-version"] == 3
    assert all(d.get("content_offset") is not None for d in dels)
    assert all(d["path"].endswith(".puffin") for d in dels)
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == [i for i in range(20) if i not in (2, 3, 15)]


def test_puffin_dv_then_compact_materializes(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "<", "value": 3}],
    })
    res = compact_iceberg_native(
        spark, {"path": tbl, "targetFileBytes": 1 << 30})
    assert res["materialized_delete_files"] >= 1
    _, dels, _ = plan_files(tbl)
    assert not dels
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == list(range(3, 20))


def test_puffin_dv_then_merge_materializes(spark, tmp_path):
    """A file-scoped merge rewriting a DV-carrying file must subtract
    the puffin positions during the rewrite."""
    tbl = _mk(spark, tmp_path)
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "=", "value": 4}],
    })
    merge_iceberg_native(
        spark,
        spark.createDataFrame([(5, "FIVE")], "id long, v string"),
        {"path": tbl, "primaryKeys": ["id"]},
    )
    back = {r["id"]: r["v"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect()}
    assert 4 not in back           # DV did not resurrect through the rewrite
    assert back[5] == "FIVE"
    assert len(back) == 19


def test_mixed_puffin_and_parquet_position_deletes(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "=", "value": 1}],
    })
    delete_iceberg_native(spark, {
        "path": tbl,
        "where": [{"key": "id", "op": "=", "value": 11}],
    })
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == [i for i in range(20) if i not in (1, 11)]


def test_maintenance_keeps_puffin_files(spark, tmp_path):
    """remove_orphan_files / expire must treat a referenced puffin DV
    file like any delete file — reachable via its manifest entry."""
    from pipeline_spark.sinks.iceberg_native import (
        expire_iceberg_native,
        remove_orphans_iceberg_native,
    )

    tbl = _mk(spark, tmp_path)
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "=", "value": 6}],
    })
    out = remove_orphans_iceberg_native(
        spark, {"path": tbl, "olderThanMs": 0})
    expire_iceberg_native(spark, {"path": tbl, "retainLast": 1})
    puffins = [
        os.path.join(r, n)
        for r, _d, ns in os.walk(tbl) for n in ns if n.endswith(".puffin")
    ]
    assert len(puffins) == 1  # survived both sweeps
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == [i for i in range(20) if i != 6]


def _live_deletes(tbl):
    _, dels, meta = plan_files(tbl)
    return dels, meta


def test_repeated_puffin_deletes_merge_one_dv_per_file(spark, tmp_path):
    """v3 at-most-one-DV-per-file (r9, ADVICE r8): a second DV delete
    touching the same data file must MERGE the prior vector's positions
    and supersede its entry — never accumulate two DVs on one file."""
    tbl = _mk(spark, tmp_path)
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "in", "value": [2, 12]}],
    })
    out = delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "in", "value": [3, 13]}],
    })
    assert out["deleted_rows"] == 2 and out["merged_dvs"] == 2
    dels, _ = _live_deletes(tbl)
    by_ref = {}
    for d in dels:
        assert d.get("content_offset") is not None  # all DVs
        assert d["referenced_data_file"] not in by_ref, (
            "two live DVs reference one data file"
        )
        by_ref[d["referenced_data_file"]] = d
    assert len(by_ref) == 2
    # each merged DV carries BOTH rounds' positions
    for d in by_ref.values():
        assert d["record_count"] == 2
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == [i for i in range(20) if i not in (2, 3, 12, 13)]


def test_puffin_delete_converts_prior_position_deletes(spark, tmp_path):
    """A DV write over a file with prior position-delete parquets must
    fold those positions in and supersede the parquet entry; rows the
    parquet held for OTHER files become those files' DVs (v3 has no
    position-delete files)."""
    tbl = _mk(spark, tmp_path)
    # parquet position delete spanning BOTH files
    delete_iceberg_native(spark, {
        "path": tbl,
        "where": [{"key": "id", "op": "in", "value": [1, 11]}],
    })
    out = delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "=", "value": 2}],
    })
    assert out["converted_position_delete_files"] == 1
    dels, meta = _live_deletes(tbl)
    assert meta["format-version"] == 3
    assert all(d.get("content_offset") is not None for d in dels), (
        "a superseded position-delete parquet is still live"
    )
    refs = [d["referenced_data_file"] for d in dels]
    assert len(refs) == len(set(refs)) == 2
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == [i for i in range(20) if i not in (1, 2, 11)]


def test_delete_probe_skips_already_deleted_rows(spark, tmp_path):
    """deleted_rows counts NEWLY deleted rows only — rows a prior DV
    already removed must not re-match (ADVICE r8 double-count)."""
    tbl = _mk(spark, tmp_path)
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "=", "value": 5}],
    })
    out = delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "<=", "value": 5}],
    })
    assert out["deleted_rows"] == 5  # 0..4; 5 was already dead
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == list(range(6, 20))


def test_v3_table_defaults_new_deletes_to_dvs(spark, tmp_path):
    """Once a table is format-version 3, an unset-format DELETE must
    produce a deletion vector, not a new position-delete parquet
    (deprecated in v3)."""
    tbl = _mk(spark, tmp_path)
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "=", "value": 1}],
    })
    delete_iceberg_native(spark, {
        "path": tbl,  # no format — table is v3 now
        "where": [{"key": "id", "op": "=", "value": 11}],
    })
    dels, _ = _live_deletes(tbl)
    assert all(d.get("content_offset") is not None for d in dels)
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == [i for i in range(20) if i not in (1, 11)]


def test_v3_row_lineage_fields_stamped(spark, tmp_path):
    """The v3 bump records row-lineage bookkeeping: table next-row-id
    and the DV snapshot's first-row-id (spec §Row Lineage)."""
    import json as _json

    tbl = _mk(spark, tmp_path)
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "=", "value": 0}],
    })
    meta = _json.load(open(find_table_metadata(tbl)))
    assert meta["format-version"] == 3
    assert "next-row-id" in meta
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    assert "first-row-id" in snap


def test_rest_catalog_puffin_dv_upgrades_format_version(spark, tmp_path):
    """REST-path DV commit (r9, ADVICE r8): the CommitTableRequest must
    carry an upgrade-format-version action so the CATALOG copy of the
    metadata reads format-version 3 — not just the local manifests."""
    from tests.test_iceberg_native import _serve_stateful_catalog

    srv, state = _serve_stateful_catalog()
    try:
        uri = f"http://127.0.0.1:{srv.server_address[1]}"
        cat_p = {"catalog": {"uri": uri}, "table": "ns.dvt",
                 "location": str(tmp_path / "rest_dvt")}
        write_iceberg_native(
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(10)], "id long, v string"
            ).coalesce(1),
            {**cat_p, "mode": "create"},
        )
        out = delete_iceberg_native(spark, {
            **cat_p, "format": "puffin",
            "where": [{"key": "id", "op": "in", "value": [2, 5]}],
        })
        assert out["deleted_rows"] == 2
        assert int(state["dvt"]["format-version"]) == 3
        back = sorted(r["id"] for r in read_iceberg_native(
            spark, cat_p).collect())
        assert back == [i for i in range(10) if i not in (2, 5)]
    finally:
        srv.shutdown()


def test_append_preserves_v3_and_row_lineage(spark, tmp_path):
    """r9 regression (review finding): a plain append to a table a DV
    delete upgraded to v3 must NOT stamp format-version 2 back over
    metadata that still references DV manifests, and must advance the
    row-lineage high-water."""
    import json as _json

    tbl = _mk(spark, tmp_path)
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "=", "value": 3}],
    })
    before = _json.load(open(find_table_metadata(tbl)))
    write_iceberg_native(
        spark.createDataFrame([(100, "x"), (101, "y")], "id long, v string")
        .coalesce(1),
        {"path": tbl, "mode": "append"},
    )
    meta = _json.load(open(find_table_metadata(tbl)))
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == int(before["next-row-id"]) + 2
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    assert snap["first-row-id"] == int(before["next-row-id"])
    # the DV still applies and new rows read back
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == [i for i in range(20) if i != 3] + [100, 101]
    # a non-DV MOR commit on the v3 table also keeps lineage moving
    delete_iceberg_native(spark, {
        "path": tbl,  # v3 default → DV
        "where": [{"key": "id", "op": "=", "value": 100}],
    })
    meta2 = _json.load(open(find_table_metadata(tbl)))
    assert meta2["format-version"] == 3 and "next-row-id" in meta2


def test_v3_upgrade_converts_all_position_deletes(spark, tmp_path):
    """r9 regression (review finding): the v3 upgrade converts EVERY
    live position-delete parquet — including ones whose files the new
    DV never touches — because v3 forbids position-delete files."""
    tbl = _mk(spark, tmp_path)
    # position delete naming ONLY file 1 (ids 10..19)
    delete_iceberg_native(spark, {
        "path": tbl, "where": [{"key": "id", "op": "=", "value": 11}],
    })
    # puffin delete touching ONLY file 0 (ids 0..9)
    out = delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "=", "value": 2}],
    })
    assert out["converted_position_delete_files"] == 1
    _, dels, meta = plan_files(tbl)
    assert meta["format-version"] == 3
    assert all(d.get("content_offset") is not None for d in dels), (
        "a position-delete parquet survived the v3 upgrade"
    )
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == [i for i in range(20) if i not in (2, 11)]


def test_rest_v3_append_keeps_row_lineage(spark, tmp_path):
    """r9 regression (review finding): a plain append to a v3 REST table
    must stamp the snapshot's first-row-id, and the catalog advances
    next-row-id when it applies the snapshot."""
    from tests.test_iceberg_native import _serve_stateful_catalog

    srv, state = _serve_stateful_catalog()
    try:
        uri = f"http://127.0.0.1:{srv.server_address[1]}"
        cat_p = {"catalog": {"uri": uri}, "table": "ns.rl",
                 "location": str(tmp_path / "rest_rl")}
        write_iceberg_native(
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(10)], "id long, v string"
            ).coalesce(1),
            {**cat_p, "mode": "create"},
        )
        delete_iceberg_native(spark, {
            **cat_p, "format": "puffin",
            "where": [{"key": "id", "op": "=", "value": 3}],
        })
        assert int(state["rl"]["format-version"]) == 3
        write_iceberg_native(
            spark.createDataFrame([(50, "x"), (51, "y")], "id long, v string")
            .coalesce(1),
            {**cat_p, "mode": "append"},
        )
        meta = state["rl"]
        snap = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == meta["current-snapshot-id"])
        assert "first-row-id" in snap
        assert int(meta["next-row-id"]) >= int(snap["first-row-id"]) + 2
        back = sorted(r["id"] for r in read_iceberg_native(
            spark, cat_p).collect())
        assert back == [i for i in range(10) if i != 3] + [50, 51]
    finally:
        srv.shutdown()
