"""Iceberg v3 default values (r10, spec §Default values): ALTER
addColumn with a ``default`` stamps ``initial-default`` (readers
produce it for files written BEFORE the column existed) and
``write-default`` (writers fill it when an append omits the column).
Metadata-only, zero data motion — the v3 way to backfill a column
across a 100 TB table."""

import json
import os

from pipeline_spark.sinks.iceberg_native import (
    alter_iceberg_native,
    write_iceberg_native,
)
from pipeline_spark.sources.iceberg_native import read_iceberg_native


def _meta(tbl):
    mdir = os.path.join(tbl, "metadata")
    vs = sorted(
        n for n in os.listdir(mdir) if n.endswith(".metadata.json")
    )
    return json.load(open(os.path.join(mdir, vs[-1])))


def test_add_column_with_default(spark, tmp_path):
    tbl = str(tmp_path / "dflt")
    write_iceberg_native(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        ).coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    out = alter_iceberg_native(spark, {
        "path": tbl,
        "addColumn": [{"name": "tier", "type": "string",
                       "default": "standard"},
                      {"name": "score", "type": "long", "default": 100}],
    })
    assert out["added"] == ["tier", "score"]
    m = _meta(tbl)
    assert m["format-version"] == 3  # initial-default is a v3 construct
    cur = next(s for s in m["schemas"]
               if s["schema-id"] == m["current-schema-id"])
    tier = next(f for f in cur["fields"] if f["name"] == "tier")
    assert tier["initial-default"] == "standard"
    assert tier["write-default"] == "standard"
    # pre-alter files read the default, not null
    got = sorted(
        (r["id"], r["v"], r["tier"], r["score"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(1, "a", "standard", 100), (2, "b", "standard", 100)]


def test_write_default_fills_appends(spark, tmp_path):
    tbl = str(tmp_path / "wd")
    write_iceberg_native(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        {"path": tbl, "mode": "create"},
    )
    alter_iceberg_native(spark, {
        "path": tbl,
        "addColumn": {"name": "tier", "type": "string", "default": "std"},
    })
    # append OMITTING the column: write-default fills it (and the new
    # file materializes the column physically)
    write_iceberg_native(
        spark.createDataFrame([(2, "b")], "id long, v string"),
        {"path": tbl, "mode": "append"},
    )
    # append PROVIDING the column: the given value wins
    write_iceberg_native(
        spark.createDataFrame(
            [(3, "c", "gold")], "id long, v string, tier string"
        ),
        {"path": tbl, "mode": "append"},
    )
    got = sorted(
        (r["id"], r["tier"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(1, "std"), (2, "std"), (3, "gold")]


def test_add_column_without_default_pads_null(spark, tmp_path):
    tbl = str(tmp_path / "nod")
    write_iceberg_native(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        {"path": tbl, "mode": "create"},
    )
    alter_iceberg_native(spark, {
        "path": tbl, "addColumn": {"name": "x", "type": "long"},
    })
    m = _meta(tbl)
    assert m["format-version"] == 2  # no default, no v3 requirement
    rows = read_iceberg_native(spark, {"path": tbl}).collect()
    assert rows[0]["x"] is None


def test_default_per_generation(spark, tmp_path):
    """Files written AFTER the column exists keep their own values even
    when another generation takes the default — padding is per schema
    generation, never post-union."""
    tbl = str(tmp_path / "gen")
    write_iceberg_native(
        spark.createDataFrame([(1,)], "id long"),
        {"path": tbl, "mode": "create"},
    )
    alter_iceberg_native(spark, {
        "path": tbl, "addColumn": {"name": "t", "type": "string",
                                   "default": "old"},
    })
    write_iceberg_native(
        spark.createDataFrame([(2, "new")], "id long, t string"),
        {"path": tbl, "mode": "append"},
    )
    got = sorted(
        (r["id"], r["t"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(1, "old"), (2, "new")]


def test_default_survives_dml_and_date_type(spark, tmp_path):
    """COW DELETE on a defaulted table rewrites with the default
    materialized; date defaults (JSON 'YYYY-MM-DD') cast correctly."""
    import datetime

    from pipeline_spark.sinks.iceberg_native import delete_iceberg_native

    tbl = str(tmp_path / "dml")
    write_iceberg_native(
        spark.createDataFrame(
            [(i,) for i in range(6)], "id long"
        ).coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    alter_iceberg_native(spark, {
        "path": tbl,
        "addColumn": {"name": "d", "type": "date", "default": "2024-06-01"},
    })
    delete_iceberg_native(spark, {
        "path": tbl, "method": "cow",
        "where": [{"key": "id", "op": "<", "value": 2}],
    })
    got = sorted(
        (r["id"], r["d"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(i, datetime.date(2024, 6, 1)) for i in range(2, 6)]


def test_rest_add_column_default(spark, tmp_path):
    """REST: addColumn rides add-schema + upgrade-format-version in one
    optimistic commit."""
    from tests.test_iceberg_native import _serve_stateful_catalog

    srv, state = _serve_stateful_catalog()
    try:
        uri = f"http://127.0.0.1:{srv.server_address[1]}"
        loc = str(tmp_path / "rest_dflt")
        cat_p = {"catalog": {"uri": uri}, "table": "ns.dflt",
                 "location": loc}
        write_iceberg_native(
            spark.createDataFrame([(1, "a")], "id long, v string"),
            {**cat_p, "mode": "create"},
        )
        alter_iceberg_native(spark, {
            "catalog": {"uri": uri}, "table": "ns.dflt",
            "addColumn": {"name": "tier", "type": "string",
                          "default": "std"},
        })
        assert state["dflt"]["format-version"] == 3
        got = read_iceberg_native(
            spark, {"catalog": {"uri": uri}, "table": "ns.dflt"}
        ).collect()
        assert got[0]["tier"] == "std"
    finally:
        srv.shutdown()
