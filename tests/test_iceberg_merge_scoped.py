"""File-scoped Iceberg copy-on-write MERGE (r8, VERDICT r7 asks #1-2).

The scale contract under test: a merge rewrites ONLY the data files
whose rows actually match an incoming key — untouched files survive BY
PATH across the commit, untouched manifests carry forward verbatim,
row-level delete files keep applying to the untouched old generation,
and the merge-on-read variant (``method: mor``) produces the same final
table state without reading a single data file.
"""

import json
import os

import pytest

from pipeline_spark.sinks.iceberg_native import (
    append_delete_files,
    compact_iceberg_native,
    merge_iceberg_native,
    upsert_iceberg_native,
    write_iceberg_native,
)
from pipeline_spark.sources.iceberg_native import plan_files, read_iceberg_native


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path, name="tbl", n_files=4, per=10):
    """n_files single-file appends → n_files data files, ids disjoint."""
    tbl = str(tmp_path / name)
    for i in range(n_files):
        df = spark.createDataFrame(
            [(i * per + j, f"v{i * per + j}") for j in range(per)],
            "id long, v string",
        ).coalesce(1)
        write_iceberg_native(
            df, {"path": tbl, "mode": "append" if i else "create"}
        )
    return tbl


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_untouched_files_survive_by_path(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    import pyarrow.parquet as pq

    before, _, _ = plan_files(tbl)
    assert len(before) == 4
    by_min = {
        min(pq.read_table(d["path"]).column("id").to_pylist()): d["path"]
        for d in before
    }
    # batch touches only the file holding ids 10-19
    changes = spark.createDataFrame(
        [(12, "V12", "UPSERT"), (15, None, "DELETE"), (99, "new", "UPSERT")],
        "id long, v string, __op__ string",
    )
    out = merge_iceberg_native(
        spark, changes, {"path": tbl, "primaryKeys": ["id"]}
    )
    assert out["rewritten_files"] == 1
    after, _, _ = plan_files(tbl)
    before_paths = {d["path"] for d in before}
    after_paths = {d["path"] for d in after}
    # the three untouched files survive by PATH; the 10-19 file is gone
    assert by_min[0] in after_paths
    assert by_min[20] in after_paths
    assert by_min[30] in after_paths
    assert by_min[10] not in after_paths
    assert len(after_paths - before_paths) == out["added_files"] >= 1
    back = {r["id"]: r["v"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect()}
    expect = {i: f"v{i}" for i in range(40) if i != 15}
    expect[12] = "V12"
    expect[99] = "new"
    assert back == expect


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_untouched_manifests_carry_forward_verbatim(spark, tmp_path):
    from pipeline_spark.functions.avroocf import read_ocf_file

    tbl = _mk(spark, tmp_path)
    meta_dir = os.path.join(tbl, "metadata")

    def _manifest_paths():
        with open(os.path.join(meta_dir, "version-hint.text")) as fh:
            v = fh.read().strip()
        with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as fh:
            meta = json.load(fh)
        snap = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == meta["current-snapshot-id"])
        _, ms = read_ocf_file(snap["manifest-list"])
        return {m["manifest_path"] for m in ms if m.get("content", 0) == 0}

    before = _manifest_paths()
    assert len(before) == 4  # one ADDED manifest per append
    changes = spark.createDataFrame([(5, "X")], "id long, v string")
    merge_iceberg_native(spark, changes, {"path": tbl, "primaryKeys": ["id"]})
    after = _manifest_paths()
    # 3 of the 4 original manifests ride along by path; the touched one
    # was rewritten and a new ADDED manifest appeared
    assert len(before & after) == 3
    assert len(after) == 5


def test_merge_materializes_row_deletes(spark, tmp_path):
    """A rewritten file must apply its delete files during the rewrite —
    its new sequence number would otherwise resurrect deleted rows."""
    tbl = _mk(spark, tmp_path, n_files=2)
    # equality-delete id=3 (lives in file 0) and id=25 (file 1, untouched)
    upsert_iceberg_native(
        spark,
        spark.createDataFrame([(3, None, "DELETE"), (25, None, "DELETE")],
                              "id long, v string, __op__ string"),
        {"path": tbl, "primaryKeys": ["id"]},
    )
    # merge touches file 0 only (id 5)
    merge_iceberg_native(
        spark,
        spark.createDataFrame([(5, "five")], "id long, v string"),
        {"path": tbl, "primaryKeys": ["id"]},
    )
    back = {r["id"]: r["v"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect()}
    assert 3 not in back          # deleted row did NOT resurrect
    assert 25 not in back         # delete still applies to untouched file
    assert back[5] == "five"
    assert back[4] == "v4"


def test_no_match_merge_is_pure_append(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n_files=2)
    before = {d["path"] for d in plan_files(tbl)[0]}
    out = merge_iceberg_native(
        spark,
        spark.createDataFrame([(100, "hundred")], "id long, v string"),
        {"path": tbl, "primaryKeys": ["id"]},
    )
    assert out["rewritten_files"] == 0 and out["added_files"] >= 1
    after = {d["path"] for d in plan_files(tbl)[0]}
    assert before <= after
    back = read_iceberg_native(spark, {"path": tbl})
    assert back.count() == 21


def test_pure_delete_batch(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n_files=2)
    out = merge_iceberg_native(
        spark,
        spark.createDataFrame([(0, None, "DELETE"), (19, None, "DELETE")],
                              "id long, v string, __op__ string"),
        {"path": tbl, "primaryKeys": ["id"]},
    )
    assert out["rewritten_files"] == 2 and out["merged_rows"] == 2
    back = sorted(r["id"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect())
    assert back == list(range(1, 19))


def test_partitioned_merge(spark, tmp_path):
    tbl = str(tmp_path / "ptbl")
    df = spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(20)], "id long, p long, v string"
    ).repartition(2, "p")
    write_iceberg_native(df, {
        "path": tbl,
        "partitionSpec": [{"field": "p", "transform": "identity"}],
    })
    changes = spark.createDataFrame(
        [(4, 0, "FOUR", "UPSERT"), (7, 1, None, "DELETE"),
         (40, 0, "forty", "UPSERT")],
        "id long, p long, v string, __op__ string",
    )
    merge_iceberg_native(spark, changes, {"path": tbl, "primaryKeys": ["id"]})
    back = {r["id"]: (r["p"], r["v"]) for r in read_iceberg_native(
        spark, {"path": tbl}).collect()}
    assert back[4] == (0, "FOUR")
    assert 7 not in back
    assert back[40] == (0, "forty")
    assert len(back) == 20
    # rewrites landed under the default spec: partition values recorded
    data, _, _ = plan_files(tbl)
    assert all("partition" in d and "p" in d["partition"] for d in data)


def test_mor_merge_parity_with_cow(spark, tmp_path):
    """mode merge + method mor commits equality deletes + data files in
    one snapshot — same final state as the COW merge, zero data files
    read; then compaction materializes to the same state again."""
    changes = spark.createDataFrame(
        [(2, "TWO", "UPSERT"), (5, None, "DELETE"), (50, "fifty", "UPSERT")],
        "id long, v string, __op__ string",
    )
    cow = _mk(spark, tmp_path, name="cow", n_files=2)
    mor = _mk(spark, tmp_path, name="mor", n_files=2)
    write_iceberg_native(changes, {"path": cow, "mode": "merge",
                                   "primaryKeys": ["id"]})
    mor_before = {d["path"] for d in plan_files(mor)[0]}
    write_iceberg_native(changes, {"path": mor, "mode": "merge",
                                   "method": "mor", "primaryKeys": ["id"]})
    mor_data, mor_dels, _ = plan_files(mor)
    # MOR: every pre-existing data file survives by path; deletes landed
    assert mor_before <= {d["path"] for d in mor_data}
    assert any(d["content"] == 2 for d in mor_dels)
    a = _rows(read_iceberg_native(spark, {"path": cow}))
    b = _rows(read_iceberg_native(spark, {"path": mor}))
    assert a == b
    # MOR-merge → compact roundtrip: deletes materialize, state holds
    compact_iceberg_native(spark, {"path": mor, "targetFileBytes": 1 << 30})
    _, dels_after, _ = plan_files(mor)
    assert not dels_after
    assert _rows(read_iceberg_native(spark, {"path": mor})) == a


def test_merge_on_schema_evolved_table(spark, tmp_path):
    """Untouched old-generation manifests keep their embedded write-time
    schema, so rename inference still upgrades their files on read."""
    from pipeline_spark.sinks.iceberg_native import alter_iceberg_native

    tbl = _mk(spark, tmp_path, n_files=2)
    alter_iceberg_native(
        spark, {"path": tbl, "renameColumn": {"v": "val"}}
    )
    merge_iceberg_native(
        spark,
        spark.createDataFrame([(5, "FIVE"), (100, "hundred")],
                              "id long, val string"),
        {"path": tbl, "primaryKeys": ["id"]},
    )
    back = {r["id"]: r["val"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect()}
    assert back[5] == "FIVE" and back[100] == "hundred"
    assert back[15] == "v15"  # untouched old-generation file, renamed col
    assert len(back) == 21


def test_merge_schema_mismatch_raises(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n_files=1)
    with pytest.raises(ValueError, match="batch columns"):
        merge_iceberg_native(
            spark,
            spark.createDataFrame([(1, "x", 1.0)],
                                  "id long, v string, extra double"),
            {"path": tbl, "primaryKeys": ["id"]},
        )


def test_bounds_prune_skips_probe_files(spark, tmp_path):
    """Manifest key-range pruning: files wholly outside the batch's key
    range are not even candidates (checked via the rewrite count when
    the probe would over-match without bounds)."""
    tbl = _mk(spark, tmp_path, n_files=4)
    data, _, meta = plan_files(tbl)
    from pipeline_spark.sources.iceberg_native import _bounds_may_match

    cur = next(s for s in meta["schemas"]
               if s.get("schema-id", 0) == meta.get("current-schema-id", 0))
    id2f = {f["id"]: f for f in cur["fields"]}
    where = [{"key": "id", "op": ">=", "value": 12},
             {"key": "id", "op": "<=", "value": 13}]
    cands = [d for d in data if _bounds_may_match(d, where, id2f)]
    assert len(cands) == 1  # only the 10-19 file admits ids 12-13


def test_compact_schema_evolved_without_migrate(spark, tmp_path):
    """r8 (VERDICT r7 ask #4): bin-pack compaction on a schema-evolved
    table no longer demands migrateSchema — rewritten bins upgrade to
    the current schema; SURVIVING old-generation files keep their
    generation, their consolidated EXISTING manifest re-embedding the
    generation's write-time schema so rename inference still applies."""
    from pyspark.sql import functions as F

    from pipeline_spark.sinks.iceberg_native import alter_iceberg_native

    tbl = str(tmp_path / "genpack")
    # old generation: one file BIG enough to survive bin-packing, one tiny
    big = spark.createDataFrame(
        [(i, "pad" * 200) for i in range(2000)], "id long, tag string"
    ).coalesce(1)
    write_iceberg_native(big, {"path": tbl, "mode": "create"})
    write_iceberg_native(
        spark.createDataFrame([(9001, "x")], "id long, tag string").coalesce(1),
        {"path": tbl, "mode": "append"},
    )
    alter_iceberg_native(spark, {"path": tbl, "renameColumn": {"tag": "label"}})
    # new generation: two tiny files under the current schema
    for i in (9100, 9200):
        write_iceberg_native(
            spark.createDataFrame([(i, "y")], "id long, label string").coalesce(1),
            {"path": tbl, "mode": "append"},
        )
    data, _d, _m = plan_files(tbl)
    assert any(d.get("renames") for d in data)  # evolved

    big_size = max(os.path.getsize(d["path"]) for d in data)
    res = compact_iceberg_native(
        spark, {"path": tbl, "targetFileBytes": big_size - 1}
    )
    # the 3 tiny files packed (old+new generation mixed bin rewrites
    # under the CURRENT schema); the big old-generation file survived
    assert res["compacted_files"] == 3
    after, _d2, _m2 = plan_files(tbl)
    assert len(after) == len(data) - 2
    surviving_old = [d for d in after if d.get("renames")]
    assert len(surviving_old) == 1  # big file kept its generation
    back = {r["id"]: r["label"] for r in read_iceberg_native(
        spark, {"path": tbl}).collect()}
    assert back[0] == "pad" * 200          # survivor: rename still applies
    assert back[9001] == "x" and back[9100] == "y" and back[9200] == "y"
    assert len(back) == 2003
