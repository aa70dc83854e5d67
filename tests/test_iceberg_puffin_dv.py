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
