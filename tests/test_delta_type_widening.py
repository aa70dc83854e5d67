"""Delta type widening (r10, PROTOCOL.md Type Widening): ALTER COLUMN
TYPE along the safe promotion lattice is METADATA-ONLY — existing
parquet files stay byte-identical and readers upcast at scan time
(Spark's parquet readers promote int32→int64/double and float→double
natively).  The 100 TB payoff: an int column that outgrew its type
widens with zero data motion."""

import json
import os

import pytest

from pipeline_spark.sinks.delta_native import (
    alter_delta_native,
    write_delta_native,
)
from pipeline_spark.sources.delta_native import read_delta_native


def test_widen_int_to_long_and_float_to_double(spark, tmp_path):
    tbl = str(tmp_path / "tw")
    write_delta_native(
        spark,
        spark.createDataFrame(
            [(1, 10, 1.5), (2, 20, 2.5)], "id long, n int, x float"
        ).coalesce(1),
        {"path": tbl},
    )
    before = {
        f: os.path.getsize(os.path.join(tbl, f))
        for f in os.listdir(tbl) if f.endswith(".parquet")
    }
    out = alter_delta_native(spark, {
        "path": tbl, "widenColumn": {"n": "long", "x": "double"},
    })
    assert out["widened"] == {"n": "long", "x": "double"}
    # metadata-only: identical files
    after = {
        f: os.path.getsize(os.path.join(tbl, f))
        for f in os.listdir(tbl) if f.endswith(".parquet")
    }
    assert after == before
    df = read_delta_native(spark, {"path": tbl})
    types = dict(df.dtypes)
    assert types["n"] == "bigint" and types["x"] == "double"
    got = sorted((r["id"], r["n"], r["x"]) for r in df.collect())
    assert got == [(1, 10, 1.5), (2, 20, 2.5)]


def test_widen_records_type_changes_and_protocol(spark, tmp_path):
    tbl = str(tmp_path / "twmeta")
    write_delta_native(
        spark, spark.createDataFrame([(1, 5)], "id long, n int"),
        {"path": tbl},
    )
    alter_delta_native(spark, {"path": tbl, "widenColumn": {"n": "long"}})
    log = os.path.join(tbl, "_delta_log", f"{1:020d}.json")
    acts = [json.loads(x) for x in open(log)]
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert "typeWidening" in proto["readerFeatures"]
    meta = next(a["metaData"] for a in acts if "metaData" in a)
    f = next(f for f in json.loads(meta["schemaString"])["fields"]
             if f["name"] == "n")
    tc = f["metadata"]["delta.typeChanges"]
    assert tc == [{"fromType": "integer", "toType": "long",
                   "tableVersion": 1}]


def test_widen_then_append_and_dml(spark, tmp_path):
    """Appends after the widening write the NEW type; a DV delete and a
    mixed-generation read agree on values."""
    from pipeline_spark.sinks.delta_native import delete_delta_native

    tbl = str(tmp_path / "twmix")
    write_delta_native(
        spark,
        spark.createDataFrame(
            [(i, i * 10) for i in range(5)], "id long, n int"
        ).coalesce(1),
        {"path": tbl,
         "properties": {"delta.enableDeletionVectors": "true"}},
    )
    alter_delta_native(spark, {"path": tbl, "widenColumn": {"n": "long"}})
    write_delta_native(
        spark,
        spark.createDataFrame(
            [(9, 2**40)], "id long, n long"  # needs the widened type
        ),
        {"path": tbl, "mode": "append"},
    )
    delete_delta_native(spark, {
        "path": tbl, "method": "dv",
        "where": [{"key": "id", "op": "=", "value": 0}],
    })
    got = sorted(
        (r["id"], r["n"])
        for r in read_delta_native(spark, {"path": tbl}).collect()
    )
    assert got == [(1, 10), (2, 20), (3, 30), (4, 40), (9, 2**40)]


def test_unsafe_widening_refuses(spark, tmp_path):
    tbl = str(tmp_path / "twbad")
    write_delta_native(
        spark, spark.createDataFrame([(1, "a", 5)], "id long, v string, n int"),
        {"path": tbl},
    )
    with pytest.raises(ValueError, match="safe widening"):
        alter_delta_native(spark, {"path": tbl, "widenColumn": {"v": "long"}})
    with pytest.raises(ValueError, match="safe widening"):
        alter_delta_native(spark, {"path": tbl, "widenColumn": {"n": "int"}})
    with pytest.raises(ValueError, match="not in schema"):
        alter_delta_native(spark, {"path": tbl, "widenColumn": {"zz": "long"}})


def test_widen_survives_checkpoint(spark, tmp_path):
    """The widened schema and the reader-feature protocol replay from a
    checkpoint identically to the JSON log."""
    from pipeline_spark.sinks.delta_native import write_checkpoint

    tbl = str(tmp_path / "twckpt")
    write_delta_native(
        spark, spark.createDataFrame([(1, 5)], "id long, n int"),
        {"path": tbl},
    )
    alter_delta_native(spark, {"path": tbl, "widenColumn": {"n": "long"}})
    write_delta_native(
        spark, spark.createDataFrame([(2, 7)], "id long, n long"),
        {"path": tbl, "mode": "append"},
    )
    write_checkpoint(tbl, 2)
    # drop the JSON commits at/below the checkpoint: replay must come
    # from the parquet checkpoint alone
    for v in (0, 1, 2):
        os.remove(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))
    df = read_delta_native(spark, {"path": tbl})
    assert dict(df.dtypes)["n"] == "bigint"
    assert sorted((r["id"], r["n"]) for r in df.collect()) == [(1, 5), (2, 7)]
