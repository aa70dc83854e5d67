"""Iceberg partition transforms: murmur3 vectors, transform math, and
partitioned native commits round-tripped through the native reader."""

import datetime
import glob
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pipeline_spark.functions.icebergpart import (
    bucket_hash_long,
    bucket_hash_str,
    iceberg_bucket,
    murmur3_32,
    parse_partition_spec,
)


def test_murmur3_canonical_vectors():
    assert murmur3_32(b"", 0) == 0
    assert murmur3_32(b"", 1) == 0x514E28B7
    # incremental tail lengths exercise the 1/2/3-byte tail paths
    assert murmur3_32(b"a", 0) != murmur3_32(b"ab", 0) != murmur3_32(b"abc", 0)


def test_iceberg_spec_appendix_vectors():
    # Iceberg spec Appendix B: hashLong(34) and hash of UTF-8 "iceberg"
    assert bucket_hash_long(34) == 2017239379
    assert bucket_hash_str("iceberg") == 1210000089
    # ints and longs hash identically (spec requirement)
    assert bucket_hash_long(34) == bucket_hash_long(34)
    assert iceberg_bucket(34, 16, "long") == 2017239379 % 16


def test_parse_partition_spec_forms():
    spec = parse_partition_spec(
        {"partitionBy": ["region", "bucket(8, id)", "day(ts)", "truncate(4, s)"]}
    )
    assert [f["transform"] for f in spec] == [
        "identity", "bucket", "day", "truncate",
    ]
    assert spec[1]["param"] == 8 and spec[1]["source"] == "id"
    assert spec[0]["name"] == "region" and spec[2]["name"] == "ts_day"

    spec = parse_partition_spec(
        {"partitionSpec": [{"field": "id", "transform": "bucket[4]"}]}
    )
    assert spec[0]["param"] == 4

    with pytest.raises(ValueError, match="parameter"):
        parse_partition_spec({"partitionBy": ["bucket(id)"]})
    with pytest.raises(ValueError, match="transform"):
        parse_partition_spec(
            {"partitionSpec": [{"field": "x", "transform": "zstd"}]}
        )


def _df(spark):
    rows = [
        Row(
            id=i,
            region="r%d" % (i % 3),
            ts=datetime.datetime(2024, 1 + i % 3, 1 + i, 12, 0, 0),
            v=float(i),
        )
        for i in range(12)
    ]
    return spark.createDataFrame(rows)


def test_partitioned_commit_roundtrip(spark, tmp_path):
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = str(tmp_path / "tbl")
    df = _df(spark)
    write_iceberg_native(
        df, {"path": tbl, "partitionBy": ["region", "bucket(4, id)"]}
    )
    back = read_iceberg_native(spark, {"path": tbl})
    assert sorted(r["id"] for r in back.collect()) == list(range(12))
    # identity source column survives inside the data files
    assert sorted(set(r["region"] for r in back.collect())) == ["r0", "r1", "r2"]

    # hive-style dirs with both transform values
    dirs = glob.glob(os.path.join(tbl, "data", "*", "_ip_0=*", "_ip_1=*"))
    assert dirs, "expected nested partition dirs"

    # metadata JSON carries the spec
    vfiles = sorted(glob.glob(os.path.join(tbl, "metadata", "v*.metadata.json")))
    meta = json.load(open(vfiles[-1]))
    fields = meta["partition-specs"][0]["fields"]
    assert [f["transform"] for f in fields] == ["identity", "bucket[4]"]
    assert [f["name"] for f in fields] == ["region", "id_bucket"]
    assert meta["last-partition-id"] == 1001
    src_ids = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    assert fields[0]["source-id"] == src_ids["region"]
    assert fields[1]["source-id"] == src_ids["id"]


def test_manifest_partition_values_match_bucket_math(spark, tmp_path):
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import plan_files

    tbl = str(tmp_path / "tbl")
    write_iceberg_native(_df(spark), {"path": tbl, "partitionBy": ["bucket(4, id)"]})
    data, _, _ = plan_files(tbl)
    seen = set()
    import pyarrow.parquet as pq

    for rec in data:
        part = rec["partition"]
        ids = pq.read_table(rec["path"], columns=["id"])["id"].to_pylist()
        for i in ids:
            assert part["id_bucket"] == iceberg_bucket(i, 4, "long")
        seen.add(part["id_bucket"])
    assert len(seen) > 1  # the fixture spreads across buckets


def test_time_transforms(spark, tmp_path):
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import plan_files, read_iceberg_native

    tbl = str(tmp_path / "tbl")
    write_iceberg_native(_df(spark), {"path": tbl, "partitionBy": ["month(ts)"]})
    data, _, _ = plan_files(tbl)
    months = {rec["partition"]["ts_month"] for rec in data}
    # 2024-01/02/03 → (2024-1970)*12 + {0,1,2}
    assert months == {648, 649, 650}
    back = read_iceberg_native(spark, {"path": tbl})
    assert back.count() == 12


def test_partition_filter_prunes_files(spark, tmp_path):
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = str(tmp_path / "tbl")
    df = _df(spark).repartition(1)
    write_iceberg_native(df, {"path": tbl, "partitionBy": ["region"]})
    pruned = read_iceberg_native(
        spark, {"path": tbl, "partitionFilter": {"region": "r1"}}
    )
    rows = pruned.collect()
    assert rows and all(r["region"] == "r1" for r in rows)
    # list form
    two = read_iceberg_native(
        spark, {"path": tbl, "partitionFilter": {"region": ["r0", "r2"]}}
    )
    assert set(r["region"] for r in two.collect()) == {"r0", "r2"}
    with pytest.raises(ValueError, match="matches no data files"):
        read_iceberg_native(
            spark, {"path": tbl, "partitionFilter": {"region": "nope"}}
        )


def test_truncate_and_append(spark, tmp_path):
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import plan_files, read_iceberg_native

    tbl = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [Row(k=v, s=s) for v, s in [(-7, "alpha"), (3, "alphabet"), (13, "beta")]]
    )
    write_iceberg_native(df, {"path": tbl, "partitionBy": ["truncate(10, k)", "truncate(4, s)"]})
    data, _, _ = plan_files(tbl)
    parts = {(r["partition"]["k_trunc"], r["partition"]["s_trunc"]) for r in data}
    # floor-to-multiple for negatives: -7 → -10; strings → 4-char prefix
    assert parts == {(-10, "alph"), (0, "alph"), (10, "beta")}
    # append keeps working on a partitioned table
    write_iceberg_native(
        spark.createDataFrame([Row(k=25, s="gamma")]),
        {"path": tbl, "mode": "append", "partitionBy": ["truncate(10, k)", "truncate(4, s)"]},
    )
    back = read_iceberg_native(spark, {"path": tbl})
    assert back.count() == 4


# ----------------------------------------------------- review regressions


def test_partition_filter_typo_errors_not_full_table(spark, tmp_path):
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = str(tmp_path / "tbl")
    write_iceberg_native(_df(spark).repartition(1), {"path": tbl, "partitionBy": ["region"]})
    with pytest.raises(ValueError, match="not in any data file"):
        read_iceberg_native(
            spark, {"path": tbl, "partitionFilter": {"regoin": "r1"}}
        )
    # multi-key filters apply ALL keys
    rows = read_iceberg_native(
        spark, {"path": tbl, "partitionFilter": {"region": ["r0", "r1"]}}
    ).collect()
    assert set(r["region"] for r in rows) == {"r0", "r1"}


def test_bucket_timestamp_null_and_exact_micros(spark, tmp_path):
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import plan_files

    # 2040-02-15T...: epoch micros 2213002852629810 is one of the values
    # whose double round-trip is off by one micro
    micros = 2213002852629810
    df = spark.createDataFrame(
        [Row(k=1, ts=datetime.datetime.utcfromtimestamp(micros / 1e6)),
         Row(k=2, ts=None)],
        "k long, ts timestamp",
    )
    tbl = str(tmp_path / "tbl")
    write_iceberg_native(df, {"path": tbl, "partitionBy": ["bucket(16, ts)"]})
    data, _, _ = plan_files(tbl)
    buckets = {r["partition"]["ts_bucket"] for r in data}
    from pipeline_spark.functions.icebergpart import iceberg_bucket

    assert iceberg_bucket(micros, 16, "long") in buckets  # exact micros
    assert None in buckets  # null row lands in the null partition


def test_time_transforms_are_session_tz_independent(spark, tmp_path):
    """Iceberg time transforms are defined on UTC; a non-UTC session must
    write identical partition values."""
    from pipeline_spark.functions.icebergpart import transform_column
    from pyspark.sql import functions as F, types as T

    ts = datetime.datetime(2024, 1, 2, 0, 30, 0)  # UTC (session tz is UTC)
    df = spark.createDataFrame([Row(ts=ts)], "ts timestamp")
    prev = spark.conf.get("spark.sql.session.timeZone")
    vals = {}
    try:
        for tz in ("UTC", "America/Los_Angeles"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            cols = {}
            for tr in ("year", "month", "day", "hour"):
                col, _ = transform_column(
                    {"transform": tr, "source": "ts", "param": None,
                     "name": "x"},
                    T.TimestampType(),
                )
                cols[tr] = col
            row = df.select(
                *[c.alias(t) for t, c in cols.items()]
            ).collect()[0]
            vals[tz] = (row["year"], row["month"], row["day"], row["hour"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert vals["UTC"] == vals["America/Los_Angeles"]
    # and the UTC values are the spec ordinals for 2024-01-02T00:30Z
    assert vals["UTC"] == (54, 648, 19724, 19724 * 24)


def test_append_spec_mismatch_rejected(spark, tmp_path):
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native
    from pipeline_spark.sources.iceberg_native import read_iceberg_native

    tbl = str(tmp_path / "tbl")
    write_iceberg_native(_df(spark), {"path": tbl, "partitionBy": ["region"]})
    with pytest.raises(ValueError, match="does not match the table"):
        write_iceberg_native(
            _df(spark), {"path": tbl, "mode": "append"}  # unpartitioned
        )
    with pytest.raises(ValueError, match="does not match the table"):
        write_iceberg_native(
            _df(spark),
            {"path": tbl, "mode": "append", "partitionBy": ["bucket(4, id)"]},
        )
    # the rejected appends left no orphan data files / extra snapshots
    assert read_iceberg_native(spark, {"path": tbl}).count() == 12


def test_bucket_np_matches_scalar():
    """The numpy-vectorized batch bucket must agree with the scalar spec
    implementation on every long-kind value class: negatives, extremes,
    NULL (in the float64 arrival shape pandas uses for nullable long
    batches), and the spec Appendix B vector."""
    import random

    import pandas as pd

    from pipeline_spark.functions.icebergpart import bucket_np

    rng = random.Random(0xB0C)
    vals = [
        34,  # spec appendix vector
        0, 1, -1, 2**31 - 1, -(2**31), 2**63 - 1, -(2**63),
    ] + [rng.randint(-(2**63), 2**63 - 1) for _ in range(1000)]
    s = pd.Series(vals, dtype="int64")
    for n in (4, 16, 1000):
        got = bucket_np(s, n)
        for i, v in enumerate(vals):
            assert got[i] == iceberg_bucket(v, n, "long"), (v, n)
    # nullable batches arrive as float64 with NaN; the scalar path did
    # int(float_v) — same truncation as the vectorized cast
    sf = pd.Series([7.0, None, -3.0, 123456.0], dtype="float64")
    got = bucket_np(sf, 16)
    assert got[1] is None or pd.isna(got[1])
    assert got[0] == iceberg_bucket(7, 16, "long")
    assert got[2] == iceberg_bucket(-3, 16, "long")
    assert got[3] == iceberg_bucket(123456, 16, "long")
