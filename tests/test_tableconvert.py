"""In-place delta ↔ iceberg metadata-only conversion (r9, VERDICT r8
stretch): the target format's metadata lands over the SAME parquet
files — zero data movement — and both formats' readers agree on the
rows afterwards."""

import os

import pytest

from pipeline_spark.sinks.delta_native import write_delta_native
from pipeline_spark.sinks.iceberg_native import (
    delete_iceberg_native,
    write_iceberg_native,
)
from pipeline_spark.sinks.tableconvert import (
    convert_delta_to_iceberg,
    convert_iceberg_to_delta,
)
from pipeline_spark.sources.delta_native import read_delta_native
from pipeline_spark.sources.iceberg_native import read_iceberg_native


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.collect())


def test_delta_to_iceberg_zero_copy(spark, tmp_path):
    tbl = str(tmp_path / "d2i")
    data = [(i, f"v{i}") for i in range(20)]
    write_delta_native(
        spark, spark.createDataFrame(data, "id long, v string").repartition(3),
        {"path": tbl},
    )
    before = {
        f for f in os.listdir(tbl) if f.endswith(".parquet")
    }
    out = convert_delta_to_iceberg(spark, {"path": tbl})
    assert out["converted_files"] == 3 and out["rows"] == 20
    # zero copy: exactly the same parquet files
    after = {f for f in os.listdir(tbl) if f.endswith(".parquet")}
    assert after == before
    assert _rows(read_iceberg_native(spark, {"path": tbl})) == sorted(data)
    # the delta log stays readable (conversion is a snapshot, not a move)
    assert _rows(read_delta_native(spark, {"path": tbl})) == sorted(data)


def test_iceberg_to_delta_zero_copy_with_stats(spark, tmp_path):
    tbl = str(tmp_path / "i2d")
    data = [(i, f"v{i}") for i in range(20)]
    write_iceberg_native(
        spark.createDataFrame(data, "id long, v string").repartition(3),
        {"path": tbl, "mode": "create"},
    )
    out = convert_iceberg_to_delta(spark, {"path": tbl})
    assert out["converted_files"] == 3 and out["rows"] == 20
    assert _rows(read_delta_native(spark, {"path": tbl})) == sorted(data)
    assert _rows(read_iceberg_native(spark, {"path": tbl})) == sorted(data)
    # stats landed: delta-side skipping prunes on id from commit zero
    import json

    log = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    adds = [json.loads(x)["add"] for x in open(log) if '"add"' in x]
    assert all("stats" in a and json.loads(a["stats"])["numRecords"] > 0
               for a in adds)


def test_roundtrip_through_both_formats(spark, tmp_path):
    """delta → iceberg convert, mutate via ICEBERG DML, convert the
    RESULT to a fresh delta clone-style read — values survive both
    format hops."""
    tbl = str(tmp_path / "rt")
    data = [(i, f"v{i}") for i in range(10)]
    write_delta_native(
        spark, spark.createDataFrame(data, "id long, v string").coalesce(1),
        {"path": tbl},
    )
    convert_delta_to_iceberg(spark, {"path": tbl})
    delete_iceberg_native(spark, {
        "path": tbl, "method": "cow",
        "where": [{"key": "id", "op": "<", "value": 3}],
    })
    got = _rows(read_iceberg_native(spark, {"path": tbl}))
    assert got == [(i, f"v{i}") for i in range(3, 10)]


def test_convert_guards(spark, tmp_path):
    # double-convert refuses
    tbl2 = str(tmp_path / "g3")
    write_delta_native(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"),
        {"path": tbl2},
    )
    convert_delta_to_iceberg(spark, {"path": tbl2})
    with pytest.raises(FileExistsError, match="already"):
        convert_delta_to_iceberg(spark, {"path": tbl2})


def test_partitioned_delta_to_iceberg(spark, tmp_path):
    """r10: partitioned delta converts — identity spec, per-file
    partition records from partitionValues, and the reader fills the
    physically-absent partition columns (spec Column Projection #2)."""
    tbl = str(tmp_path / "pd2i")
    rows = [(i, f"v{i}", "even" if i % 2 == 0 else "odd", i % 3)
            for i in range(12)]
    write_delta_native(
        spark,
        spark.createDataFrame(rows, "id long, v string, par string, b long"),
        {"path": tbl, "partitionBy": ["par", "b"]},
    )
    out = convert_delta_to_iceberg(spark, {"path": tbl})
    assert out["rows"] == 12
    got = sorted(
        (r["id"], r["v"], r["par"], r["b"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == sorted(rows)
    # manifest-level partition pruning works on the converted records
    pruned = read_iceberg_native(
        spark, {"path": tbl, "partitionFilter": {"par": "even"}}
    )
    assert sorted(r["id"] for r in pruned.collect()) == [0, 2, 4, 6, 8, 10]


def test_column_mapped_delta_to_iceberg(spark, tmp_path):
    """r10: column-mapped delta converts — iceberg field-ids from
    delta.columnMapping.id, physical names resolved through the
    manifest's embedded write schema (field-id renames)."""
    tbl = str(tmp_path / "cm2i")
    data = [(i, f"v{i}") for i in range(10)]
    write_delta_native(
        spark, spark.createDataFrame(data, "id long, v string").coalesce(1),
        {"path": tbl,
         "properties": {"delta.columnMapping.mode": "name"}},
    )
    out = convert_delta_to_iceberg(spark, {"path": tbl})
    assert out["converted_files"] == 1
    df = read_iceberg_native(spark, {"path": tbl})
    assert sorted(df.columns) == ["id", "v"]  # LOGICAL names
    assert _rows(df) == sorted(data)
    # manifest bounds carried under the mapped field-ids: data skipping
    # prunes on the logical filter key
    got = read_iceberg_native(
        spark, {"path": tbl, "dataFilter": {"key": "id", "op": ">=",
                                            "value": 8}},
    )
    assert sorted(r["id"] for r in got.collect()) == [8, 9]


def test_dv_delta_to_iceberg(spark, tmp_path):
    """r10: live delta deletion vectors convert — re-framed as iceberg
    v3 puffin DV blobs over the same (untouched) data files."""
    import json as _json

    from pipeline_spark.sinks.delta_native import delete_delta_native

    tbl = str(tmp_path / "dv2i")
    data = [(i, f"v{i}") for i in range(20)]
    write_delta_native(
        spark, spark.createDataFrame(data, "id long, v string").coalesce(1),
        {"path": tbl,
         "properties": {"delta.enableDeletionVectors": "true"}},
    )
    before = {f for f in os.listdir(tbl) if f.endswith(".parquet")}
    delete_delta_native(spark, {
        "path": tbl, "method": "dv",
        "where": [{"key": "id", "op": "<", "value": 5}],
    })
    out = convert_delta_to_iceberg(spark, {"path": tbl})
    assert out["deletion_vectors"] == 1
    # zero copy held even across the DV translation
    after = {f for f in os.listdir(tbl) if f.endswith(".parquet")}
    assert after == before
    got = _rows(read_iceberg_native(spark, {"path": tbl}))
    assert got == [(i, f"v{i}") for i in range(5, 20)]
    # the converted table is a well-formed v3 table (row-lineage fields)
    mfile = next(
        os.path.join(tbl, "metadata", n)
        for n in os.listdir(os.path.join(tbl, "metadata"))
        if n.endswith(".metadata.json")
    )
    m = _json.load(open(mfile))
    assert m["format-version"] == 3 and m["next-row-id"] == 20


def test_partitioned_cm_dv_delta_to_iceberg(spark, tmp_path):
    """The three translations compose: partitioned + column-mapped +
    DV-carrying delta converts and reads back exactly."""
    from pipeline_spark.sinks.delta_native import delete_delta_native

    tbl = str(tmp_path / "all2i")
    rows = [(i, f"v{i}", i % 2) for i in range(12)]
    write_delta_native(
        spark,
        spark.createDataFrame(rows, "id long, v string, par long"),
        {"path": tbl, "partitionBy": ["par"],
         "properties": {"delta.columnMapping.mode": "name",
                        "delta.enableDeletionVectors": "true"}},
    )
    delete_delta_native(spark, {
        "path": tbl, "method": "dv",
        "where": [{"key": "id", "op": "<", "value": 4}],
    })
    convert_delta_to_iceberg(spark, {"path": tbl})
    got = sorted(
        (r["id"], r["v"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(i, f"v{i}", i % 2) for i in range(4, 12)]


def test_partitioned_cm_percent_encoded_value(spark, tmp_path):
    """A partition value with a space percent-encodes into the directory
    name; the evolved scan's lineage stamp must percent-DECODE so the
    identity fill (and MOR delete matching) still key-match the plan's
    raw paths.  Regression: caught by the r10 verify drive on
    o_orderpriority='4-NOT SPECIFIED'."""
    tbl = str(tmp_path / "sp2i")
    rows = [(1, "NOT SPECIFIED"), (2, "HIGH"), (3, "NOT SPECIFIED")]
    write_delta_native(
        spark, spark.createDataFrame(rows, "id long, par string"),
        {"path": tbl, "partitionBy": ["par"],
         "properties": {"delta.columnMapping.mode": "name"}},
    )
    convert_delta_to_iceberg(spark, {"path": tbl})
    got = sorted(
        (r["id"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == sorted(rows)


def test_iceberg_position_deletes_to_delta(spark, tmp_path):
    """r10: iceberg position deletes translate to delta deletion
    vectors — same roaring position bitmaps, zero data copied."""
    tbl = str(tmp_path / "pd2d")
    data = [(i, f"v{i}") for i in range(20)]
    write_iceberg_native(
        spark.createDataFrame(data, "id long, v string").coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    delete_iceberg_native(spark, {
        "path": tbl, "where": [{"key": "id", "op": "<", "value": 4}],
    })
    before = {
        os.path.join(r, f)
        for r, _d, fs in os.walk(tbl) for f in fs if f.endswith(".parquet")
        and "_delta_log" not in r
    }
    out = convert_iceberg_to_delta(spark, {"path": tbl})
    assert out["deletion_vectors"] == 1
    got = _rows(read_delta_native(spark, {"path": tbl}))
    assert got == [(i, f"v{i}") for i in range(4, 20)]
    after = {
        os.path.join(r, f)
        for r, _d, fs in os.walk(tbl) for f in fs if f.endswith(".parquet")
        and "_delta_log" not in r
    }
    assert before == after  # zero copy


def test_iceberg_puffin_dv_to_delta(spark, tmp_path):
    """v3 puffin deletion vectors also translate (blob → delta DV)."""
    tbl = str(tmp_path / "pf2d")
    data = [(i, f"v{i}") for i in range(15)]
    write_iceberg_native(
        spark.createDataFrame(data, "id long, v string").coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": ">=", "value": 12}],
    })
    out = convert_iceberg_to_delta(spark, {"path": tbl})
    assert out["deletion_vectors"] == 1
    assert _rows(read_delta_native(spark, {"path": tbl})) == [
        (i, f"v{i}") for i in range(12)
    ]


def test_renamed_iceberg_to_delta_column_mapping(spark, tmp_path):
    """r10: a renamed iceberg column converts via delta column mapping
    (physicalName = the files' write name, id = the iceberg field-id)
    when every live file agrees on one physical name."""
    import json as _json

    from pipeline_spark.sinks.iceberg_native import alter_iceberg_native

    tbl = str(tmp_path / "rn2d")
    data = [(i, f"v{i}") for i in range(10)]
    write_iceberg_native(
        spark.createDataFrame(data, "id long, tag string").coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    alter_iceberg_native(spark, {"path": tbl, "renameColumn": {"tag": "v"}})
    convert_iceberg_to_delta(spark, {"path": tbl})
    df = read_delta_native(spark, {"path": tbl})
    assert sorted(df.columns) == ["id", "v"]  # logical names
    assert _rows(df) == sorted(data)
    log = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    meta = next(
        _json.loads(x)["metaData"] for x in open(log) if '"metaData"' in x
    )
    assert meta["configuration"]["delta.columnMapping.mode"] == "name"
    f = next(f for f in _json.loads(meta["schemaString"])["fields"]
             if f["name"] == "v")
    assert f["metadata"]["delta.columnMapping.physicalName"] == "tag"


def test_mixed_physical_names_refuse(spark, tmp_path):
    """Files on both sides of a rename carry different physical names —
    delta column mapping cannot express that; refuse with the compact
    workaround."""
    from pipeline_spark.sinks.iceberg_native import alter_iceberg_native

    tbl = str(tmp_path / "mx2d")
    write_iceberg_native(
        spark.createDataFrame([(1, "a")], "id long, tag string"),
        {"path": tbl, "mode": "create"},
    )
    alter_iceberg_native(spark, {"path": tbl, "renameColumn": {"tag": "v"}})
    write_iceberg_native(
        spark.createDataFrame([(2, "b")], "id long, v string"),
        {"path": tbl, "mode": "append"},
    )
    with pytest.raises(NotImplementedError, match="compact"):
        convert_iceberg_to_delta(spark, {"path": tbl})


def test_identity_fill_iceberg_back_to_partitioned_delta(spark, tmp_path):
    """A delta-converted partitioned iceberg table (identity-fill files)
    converts BACK to partitioned delta — delta's native layout for
    exactly that shape.  Full circle, still zero data movement."""
    import shutil

    src = str(tmp_path / "src")
    rows = [(i, f"v{i}", i % 3) for i in range(12)]
    write_delta_native(
        spark, spark.createDataFrame(rows, "id long, v string, par long"),
        {"path": src, "partitionBy": ["par"]},
    )
    convert_delta_to_iceberg(spark, {"path": src})
    # clone the ICEBERG side to a fresh location (the original keeps its
    # delta log, so in-place reverse conversion refuses there)
    dst = str(tmp_path / "dst")
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns("_delta_log"))
    _fix_iceberg_paths(dst, src)
    out = convert_iceberg_to_delta(spark, {"path": dst})
    assert out["converted_files"] > 0
    import json as _json

    log = os.path.join(dst, "_delta_log", f"{0:020d}.json")
    meta = next(
        _json.loads(x)["metaData"] for x in open(log) if '"metaData"' in x
    )
    assert meta["partitionColumns"] == ["par"]
    got = sorted(
        (r["id"], r["v"], r["par"])
        for r in read_delta_native(spark, {"path": dst}).collect()
    )
    assert got == sorted(rows)


def _fix_iceberg_paths(dst: str, src: str) -> None:
    """Rewrite absolute paths inside copied iceberg metadata (metadata
    json + avro manifests store absolute locations)."""
    import json as _json

    from pipeline_spark.functions.avroocf import (
        read_ocf_file_with_meta,
        write_ocf_bytes,
    )

    mdir = os.path.join(dst, "metadata")
    for name in os.listdir(mdir):
        path = os.path.join(mdir, name)
        if name.endswith(".metadata.json"):
            s = open(path).read().replace(src, dst)
            open(path, "w").write(s)
        elif name.endswith(".avro"):
            schema, meta, recs = read_ocf_file_with_meta(path)

            def fix(v):
                if isinstance(v, str):
                    return v.replace(src, dst)
                if isinstance(v, dict):
                    return {k: fix(x) for k, x in v.items()}
                if isinstance(v, list):
                    return [fix(x) for x in v]
                return v

            recs = [fix(r) for r in recs]
            extra = {
                k: v.decode() if isinstance(v, bytes) else v
                for k, v in meta.items()
                if k not in ("avro.schema", "avro.codec")
            }
            out = write_ocf_bytes(schema, recs, extra_meta=extra)
            open(path, "wb").write(out)


def test_dml_on_converted_partitioned_table(spark, tmp_path):
    """COW DELETE on an identity-fill table: the predicate can name a
    partition column, and rewritten files MATERIALIZE the partition
    columns (the fill migrates out one rewrite at a time)."""
    tbl = str(tmp_path / "dmlconv")
    rows = [(i, f"v{i}", i % 2) for i in range(10)]
    write_delta_native(
        spark, spark.createDataFrame(rows, "id long, v string, par long"),
        {"path": tbl, "partitionBy": ["par"]},
    )
    convert_delta_to_iceberg(spark, {"path": tbl})
    out = delete_iceberg_native(spark, {
        "path": tbl, "method": "cow",
        "where": [{"key": "par", "op": "=", "value": 1}],
    })
    assert out["deleted_rows"] == 5
    got = sorted(
        (r["id"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(i, 0) for i in range(0, 10, 2)]


def test_compact_materializes_identity_fill(spark, tmp_path):
    """Compaction rewrites identity-fill files WITH their partition
    columns — after one compact, the fill plan is empty and the table
    reads like any natively-written partitioned iceberg table."""
    import pyarrow.parquet as pq

    from pipeline_spark.sinks.iceberg_native import compact_iceberg_native
    from pipeline_spark.sources.iceberg_native import (
        identity_fill_plan,
        load_table_metadata,
        plan_files,
    )

    tbl = str(tmp_path / "cmpconv")
    rows = [(i, f"v{i}", i % 2) for i in range(10)]
    write_delta_native(
        spark, spark.createDataFrame(rows, "id long, v string, par long"),
        {"path": tbl, "partitionBy": ["par"]},
    )
    convert_delta_to_iceberg(spark, {"path": tbl})
    data, _dels, meta = plan_files(tbl)
    fills, _t = identity_fill_plan(data, meta)
    assert fills  # converted: files lack the partition column
    compact_iceberg_native(spark, {"path": tbl, "minFilesPerGroup": 1})
    data2, _d2, meta2 = plan_files(tbl)
    fills2, _t2 = identity_fill_plan(data2, meta2)
    assert not fills2  # materialized
    assert all("par" in pq.read_schema(d["path"]).names for d in data2)
    got = sorted(
        (r["id"], r["v"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == sorted(rows)


def test_tableconvert_module(spark, tmp_path):
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    tbl = str(tmp_path / "mod")
    write_delta_native(
        spark,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(5)], "id long, v string"
        ).coalesce(1),
        {"path": tbl},
    )
    cfg = f"""
sources:
  - name: noop
    module: create
    parameters: {{elements: [{{x: 1}}]}}
sinks:
  - name: conv
    module: tableconvert
    inputs: [noop]
    parameters: {{path: {tbl}, to: iceberg}}
"""
    run_pipeline(spark, parse_config(cfg))
    assert len(_rows(read_iceberg_native(spark, {"path": tbl}))) == 5


def test_parquet_to_delta_convert(spark, tmp_path):
    """CONVERT TO DELTA over a plain hive-partitioned parquet directory
    (r10): one delta log in place, partition columns from the dirs,
    stats-driven skipping from commit zero, and the table stays fully
    writable afterwards."""
    import json as _json

    tbl = str(tmp_path / "pq2d")
    rows = [(i, f"v{i}", i % 3) for i in range(12)]
    spark.createDataFrame(rows, "id long, v string, par long").write \
        .partitionBy("par").parquet(tbl)
    from pipeline_spark.sinks.tableconvert import convert_parquet_to_delta

    out = convert_parquet_to_delta(
        spark, {"path": tbl, "partitionSchema": {"par": "long"}}
    )
    assert out["rows"] == 12 and out["partition_columns"] == ["par"]
    got = sorted(
        (r["id"], r["v"], r["par"])
        for r in read_delta_native(spark, {"path": tbl}).collect()
    )
    assert got == sorted(rows)
    # partition pruning off the recorded partitionValues
    pruned = read_delta_native(
        spark, {"path": tbl, "partitionFilter": {"par": 1}}
    )
    assert sorted(r["id"] for r in pruned.collect()) == [1, 4, 7, 10]
    # stats landed
    log = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    adds = [_json.loads(x)["add"] for x in open(log) if '"add"' in x]
    assert all("stats" in a for a in adds)
    # the converted table accepts normal delta writes
    write_delta_native(
        spark,
        spark.createDataFrame([(99, "x", 0)], "id long, v string, par long"),
        {"path": tbl, "mode": "append", "partitionBy": ["par"]},
    )
    assert len(read_delta_native(spark, {"path": tbl}).collect()) == 13


def test_parquet_convert_unpartitioned_and_guards(spark, tmp_path):
    tbl = str(tmp_path / "pq2d2")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], "id long, v string"
    ).coalesce(1).write.parquet(tbl)
    from pipeline_spark.sinks.tableconvert import convert_parquet_to_delta

    convert_parquet_to_delta(spark, {"path": tbl})
    assert len(read_delta_native(spark, {"path": tbl}).collect()) == 5
    with pytest.raises(FileExistsError, match="already"):
        convert_parquet_to_delta(spark, {"path": tbl})


def test_convert_refuses_unmaterialized_defaults(spark, tmp_path):
    """r10 review fix: a v3 initial-default that older files rely on
    would silently read NULL through delta — refuse with the compact
    workaround."""
    from pipeline_spark.sinks.iceberg_native import alter_iceberg_native

    tbl = str(tmp_path / "dflt2d")
    write_iceberg_native(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        {"path": tbl, "mode": "create"},
    )
    alter_iceberg_native(spark, {
        "path": tbl,
        "addColumn": {"name": "tier", "type": "string", "default": "std"},
    })
    with pytest.raises(NotImplementedError, match="initial-default"):
        convert_iceberg_to_delta(spark, {"path": tbl})


def test_null_partition_value_roundtrip(spark, tmp_path):
    """r10 review fix: a null partition value
    (__HIVE_DEFAULT_PARTITION__) stays in the fill plan, reads as null,
    and converts back to partitioned delta instead of refusing."""
    import shutil

    src = str(tmp_path / "np_src")
    rows = [(1, "a", "x"), (2, "b", None), (3, "c", "x")]
    write_delta_native(
        spark,
        spark.createDataFrame(rows, "id long, v string, par string"),
        {"path": src, "partitionBy": ["par"]},
    )
    convert_delta_to_iceberg(spark, {"path": src})
    got = sorted(
        (r["id"], r["par"])
        for r in read_iceberg_native(spark, {"path": src}).collect()
    )
    assert got == [(1, "x"), (2, None), (3, "x")]
    dst = str(tmp_path / "np_dst")
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns("_delta_log"))
    _fix_iceberg_paths(dst, src)
    convert_iceberg_to_delta(spark, {"path": dst})
    back = sorted(
        (r["id"], r["par"])
        for r in read_delta_native(spark, {"path": dst}).collect()
    )
    assert back == got


# ---------------------------------------------------------------- r11:
# iceberg EQUALITY deletes → delta (VERDICT r10 ask #4): materialized
# into per-file roaring DVs at conversion time via a distributed
# semi-join — zero data rewrite, and the strict-sequence rule holds
# (rows re-inserted AFTER the delete survive).


def test_iceberg_equality_deletes_to_delta(spark, tmp_path):
    from pipeline_spark.sinks.iceberg_native import (
        equality_delete_iceberg_native,
    )

    tbl = str(tmp_path / "eq2d")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        ).coalesce(2),
        {"path": tbl, "mode": "create"},
    )
    equality_delete_iceberg_native(spark, {
        "path": tbl, "values": [{"id": 1}, {"id": 4}, {"id": 7}],
    })
    # re-insert id=4 AFTER the delete: newer seq, must survive
    write_iceberg_native(
        spark.createDataFrame([(4, "REBORN")], "id long, v string"),
        {"path": tbl, "mode": "append"},
    )
    expect = _rows(read_iceberg_native(spark, {"path": tbl}))
    assert (4, "REBORN") in expect and (1, "v1") not in expect
    out = convert_iceberg_to_delta(spark, {"path": tbl})
    assert out["deletion_vectors"] >= 1
    assert _rows(read_delta_native(spark, {"path": tbl})) == expect


def test_eq_and_position_deletes_combine_in_one_dv(spark, tmp_path):
    """A file hit by BOTH a position delete and an equality delete gets
    ONE DV carrying the union of positions."""
    from pipeline_spark.sinks.iceberg_native import (
        delete_iceberg_native as _del,
        equality_delete_iceberg_native,
    )

    tbl = str(tmp_path / "eqpos")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id long, v string"
        ).coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    _del(spark, {
        "path": tbl, "method": "mor",
        "where": [{"key": "id", "op": "=", "value": 2}],
    })
    equality_delete_iceberg_native(spark, {
        "path": tbl, "values": [{"id": 5}],
    })
    expect = _rows(read_iceberg_native(spark, {"path": tbl}))
    convert_iceberg_to_delta(spark, {"path": tbl})
    assert _rows(read_delta_native(spark, {"path": tbl})) == expect
    assert expect == [(i, f"v{i}") for i in (0, 1, 3, 4, 6, 7)]


def test_mor_upsert_eq_deletes_to_delta(spark, tmp_path):
    """merge method=mor writes equality-delete + upsert files in one
    snapshot — the exact CDC shape; conversion must keep only the new
    versions."""
    from pipeline_spark.sinks.iceberg_native import merge_iceberg_native

    tbl = str(tmp_path / "eqmor")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "id long, v string"
        ).coalesce(2),
        {"path": tbl, "mode": "create"},
    )
    merge_iceberg_native(
        spark,
        spark.createDataFrame(
            [(2, "TWO"), (99, "NEW")], "id long, v string"
        ),
        {"path": tbl, "primaryKeys": ["id"], "method": "mor"},
    )
    expect = _rows(read_iceberg_native(spark, {"path": tbl}))
    assert (2, "TWO") in expect and (2, "v2") not in expect
    convert_iceberg_to_delta(spark, {"path": tbl})
    assert _rows(read_delta_native(spark, {"path": tbl})) == expect
