"""rangejoin: binned equi-join parity with a naive BETWEEN join."""

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pipeline_spark.operators.rangejoin import range_join, rangejoin_transform
from pipeline_spark.registry import ModuleContext


@pytest.fixture(scope="module")
def sides(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    pts = spark.createDataFrame(
        [Row(pid=i, k=int(i % 3), p=float(v))
         for i, v in enumerate(rng.uniform(0, 100, size=200))]
    )
    ivs = []
    for j in range(40):
        lo = float(rng.uniform(0, 95))
        ivs.append(Row(iid=j, k=int(j % 3), lo=lo, hi=lo + float(rng.uniform(0, 8)), tag=f"t{j}"))
    return pts, spark.createDataFrame(ivs)


def test_matches_naive_between_join(spark, sides):
    pts, ivs = sides
    for bin_size in (1.0, 5.0, 50.0):
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(
                pts, ivs, point="p", lo="lo", hi="hi", bin_size=bin_size, keys=["k"]
            ).collect()
        )
        want = sorted(
            (r["pid"], r["iid"])
            for r in pts.alias("a")
            .join(
                ivs.alias("b"),
                (F.col("a.k") == F.col("b.k"))
                & (F.col("a.p") >= F.col("b.lo"))
                & (F.col("a.p") <= F.col("b.hi")),
            )
            .collect()
        )
        assert got == want and len(got) > 50


def test_left_outer_keeps_unmatched(spark, sides):
    pts, ivs = sides
    out = range_join(
        pts, ivs, point="p", lo="lo", hi="hi", bin_size=5.0, keys=["k"], how="left"
    )
    assert out.select("pid").distinct().count() == 200
    unmatched = out.filter(F.col("iid").isNull()).count()
    assert unmatched > 0


def test_left_outer_null_payload_not_duplicated(spark):
    # a left row with a NULL column (e.g. from an upstream outer join)
    # must not reappear as an unmatched duplicate — the anti-join is
    # null-safe
    pts = spark.createDataFrame(
        [Row(pid=1, p=5.0, extra=None), Row(pid=2, p=999.0, extra=None)],
        schema="pid int, p double, extra string",
    )
    ivs = spark.createDataFrame([Row(lo=0.0, hi=10.0, tag="band")])
    out = range_join(
        pts, ivs, point="p", lo="lo", hi="hi", bin_size=10.0, how="left"
    ).collect()
    assert len(out) == 2
    rows = {r["pid"]: r["tag"] for r in out}
    assert rows == {1: "band", 2: None}


def test_inclusive_bounds_and_degenerate_interval(spark):
    pts = spark.createDataFrame([Row(p=5.0), Row(p=4.999)])
    ivs = spark.createDataFrame([Row(lo=5.0, hi=5.0, tag="point")])
    rows = range_join(pts, ivs, point="p", lo="lo", hi="hi", bin_size=2.0).collect()
    assert [r["p"] for r in rows] == [5.0]


def test_timestamp_domain(spark):
    t = lambda s: datetime.fromisoformat(s)
    pts = spark.createDataFrame([Row(p=t("2024-01-01 10:30:00"))])
    ivs = spark.createDataFrame(
        [
            Row(lo=t("2024-01-01 10:00:00"), hi=t("2024-01-01 11:00:00"), tag="in"),
            Row(lo=t("2024-01-01 11:00:01"), hi=t("2024-01-01 12:00:00"), tag="out"),
        ]
    )
    rows = range_join(
        pts, ivs, point="p", lo="lo", hi="hi", bin_size=3600.0 * 1e6
    ).collect()
    assert [r["tag"] for r in rows] == ["in"]


def test_bin_explosion_guard(spark):
    pts = spark.createDataFrame([Row(p=1.0)])
    ivs = spark.createDataFrame([Row(lo=0.0, hi=1e9, tag="huge")])
    with pytest.raises(Exception, match="maxBinsPerInterval"):
        range_join(
            pts, ivs, point="p", lo="lo", hi="hi", bin_size=1.0,
            max_bins_per_interval=100,
        ).collect()


def test_module_params(spark, sides):
    pts, ivs = sides
    out = rangejoin_transform(
        ModuleContext(
            spark=spark, name="r",
            params={"point": "p", "lo": "lo", "hi": "hi", "binSize": 5.0,
                    "keys": ["k"]},
            inputs=[pts], input_names=["l"], side_inputs={"i": ivs},
        )
    )[""]
    assert out.count() > 50
    with pytest.raises(ValueError, match="binSize"):
        rangejoin_transform(
            ModuleContext(
                spark=spark, name="r", params={"point": "p", "lo": "lo", "hi": "hi"},
                inputs=[pts], input_names=["l"], side_inputs={"i": ivs},
            )
        )
    with pytest.raises(ValueError, match="sideInput"):
        rangejoin_transform(
            ModuleContext(
                spark=spark, name="r",
                params={"point": "p", "lo": "lo", "hi": "hi", "binSize": 1.0},
                inputs=[pts], input_names=["l"], side_inputs={},
            )
        )
