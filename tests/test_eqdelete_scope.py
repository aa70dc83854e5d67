"""Equality-delete spec fidelity (r11 review fixes): partition-scoped
deletes apply only to their partition, match columns resolve by parquet
FIELD ID (renames after the delete must not unresolve or swap them),
and the data-file seq join normalizes paths (percent-encoded partition
dirs).  Shared planner: sources/iceberg_native.py
plan_equality_deletes, used by both the MOR reader (anti-join) and the
delta converter (semi-join)."""

import pytest

from pipeline_spark.sinks.iceberg_native import (
    alter_iceberg_native,
    equality_delete_iceberg_native,
    write_iceberg_native,
)
from pipeline_spark.sources.iceberg_native import (
    _strip_scheme,
    load_table_metadata,
    plan_files,
    read_iceberg_native,
)


def _rows(spark, tbl, cols=("id", "par")):
    return sorted(
        tuple(r[c] for c in cols)
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )


from pipeline_spark.testing import (  # noqa: E402 — shared foreign-writer shape
    scope_delete_manifests as _scope_delete_manifests,
)



def _mk_partitioned(spark, tmp_path, name="pt", pars=("x", "y")):
    tbl = str(tmp_path / name)
    rows = [(i, p) for i in range(4) for p in pars]
    write_iceberg_native(
        spark.createDataFrame(rows, "id long, par string"),
        {"path": tbl, "mode": "create", "partitionBy": ["par"]},
    )
    return tbl, rows


def test_global_eq_delete_hits_all_partitions(spark, tmp_path):
    """Our own writer's deletes carry all-null partition records —
    GLOBAL scope (both partitions lose id=1)."""
    tbl, rows = _mk_partitioned(spark, tmp_path, "g")
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 1}]})
    assert _rows(spark, tbl) == sorted(
        (i, p) for i, p in rows if i != 1
    )


def test_partition_scoped_eq_delete(spark, tmp_path):
    """A foreign partition-scoped delete applies ONLY to its partition:
    id=1 scoped to par='x' leaves (1,'y') alive."""
    tbl, rows = _mk_partitioned(spark, tmp_path, "s")
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 1}]})
    _scope_delete_manifests(tbl, {"par": "x"})
    got = _rows(spark, tbl)
    assert (1, "y") in got and (1, "x") not in got
    assert got == sorted((i, p) for i, p in rows if (i, p) != (1, "x"))


def test_eq_delete_survives_rename(spark, tmp_path):
    """Field-id resolution: rename the match column AFTER the delete
    lands — the delete file carries the old name + field-id metadata
    and must still apply."""
    tbl = str(tmp_path / "ren")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "id long, v string"
        ).coalesce(1),
        {"path": tbl, "mode": "create"},
    )
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 2}]})
    alter_iceberg_native(spark, {
        "path": tbl, "renameColumn": {"id": "key"},
    })
    got = sorted(
        r["key"] for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [0, 1, 3, 4, 5]


def test_eq_delete_on_percent_encoded_partition(spark, tmp_path):
    """The seq join normalizes data paths: a partition value with a
    space percent-encodes into the directory name, and before r11 the
    raw-path seq join missed, nulling __dseq__ and resurrecting the
    deleted rows."""
    tbl = str(tmp_path / "enc")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, "a b") for i in range(4)], "id long, par string"
        ),
        {"path": tbl, "mode": "create", "partitionBy": ["par"]},
    )
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 1}]})
    got = sorted(
        r["id"] for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [0, 2, 3]


def test_converter_honors_partition_scope(spark, tmp_path):
    """The delta conversion's semi-join shares the planner: a scoped
    delete materializes DV positions only in its partition."""
    from pipeline_spark.sinks.tableconvert import convert_iceberg_to_delta
    from pipeline_spark.sources.delta_native import read_delta_native

    tbl, rows = _mk_partitioned(spark, tmp_path, "c")
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 1}]})
    _scope_delete_manifests(tbl, {"par": "x"})
    expect = _rows(spark, tbl)  # iceberg truth
    convert_iceberg_to_delta(spark, {"path": tbl})
    got = sorted(
        (r["id"], r["par"])
        for r in read_delta_native(spark, {"path": tbl}).collect()
    )
    assert got == expect and (1, "y") in got


def test_percent_literal_partition_all_delete_shapes(spark, tmp_path):
    """r11 regression: a partition VALUE containing '%' Hive-escapes
    into the dir name as literal '%25'; stored paths must compare as
    LITERALS (norm_path must not percent-decode) or every path join —
    seq, position, DV, identity fill — silently misses these files."""
    from pipeline_spark.sinks.iceberg_native import delete_iceberg_native

    tbl = str(tmp_path / "pct")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, "100%") for i in range(6)], "id long, par string"
        ),
        {"path": tbl, "mode": "create", "partitionBy": ["par"]},
    )
    # identity fill works (par not physically in the files)
    got = sorted(
        (r["id"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(i, "100%") for i in range(6)]
    # equality delete
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 1}]})
    # position delete (parquet shape)
    delete_iceberg_native(spark, {
        "path": tbl, "method": "mor",
        "where": [{"key": "id", "op": "=", "value": 2}],
    })
    # puffin DV delete
    delete_iceberg_native(spark, {
        "path": tbl, "format": "puffin",
        "where": [{"key": "id", "op": "=", "value": 3}],
    })
    got = sorted(
        r["id"] for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [0, 4, 5]


import pytest as _pytest


@_pytest.mark.parametrize("val", [
    "with space", "a+b", "100%", "x%20y", "semi;colon", "eq=sign",
    "hash#tag", "quo\"te", "unié中", "tab\tchar",
])
def test_nasty_partition_values_roundtrip(spark, tmp_path, val):
    """Write → identity-fill read → equality delete → read, for every
    URI/Hive-special shape we could think of: the literal-path contract
    (stored paths literal, _metadata decoded once) must hold for all of
    them.  'x%20y' is the adversarial one — a LITERAL percent-two-zero
    in the VALUE, which any double-decode would corrupt into a space."""
    tbl = str(tmp_path / "nasty")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, val) for i in range(4)], "id long, par string"
        ),
        {"path": tbl, "mode": "create", "partitionBy": ["par"]},
    )
    got = sorted(
        (r["id"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [(i, val) for i in range(4)]
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 2}]})
    got = sorted(
        r["id"] for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [0, 1, 3]


def test_global_delete_manifest_declares_unpartitioned_spec(spark, tmp_path):
    """r11 interop: this writer's deletes are GLOBAL, and the spec
    scopes a delete manifest by its declared partition — on a
    partitioned table the manifest must declare an UNPARTITIONED spec
    (registered in table metadata), or strict readers (iceberg-java's
    DeleteFileIndex) scope it to the null partition and miss every
    real row."""
    from pipeline_spark.functions.avroocf import (
        read_ocf_file,
        read_ocf_file_with_meta,
    )

    tbl, rows = _mk_partitioned(spark, tmp_path, "uspec")
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 1}]})
    meta = load_table_metadata(tbl)
    specs = {sp["spec-id"]: sp for sp in meta["partition-specs"]}
    unpart = [sid for sid, sp in specs.items() if not sp.get("fields")]
    assert unpart, "unpartitioned spec not registered"
    assert specs[meta["default-spec-id"]]["fields"]  # default unchanged
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    _, mans = read_ocf_file(_strip_scheme(snap["manifest-list"]))
    dels = [m for m in mans if m.get("content") == 1]
    assert dels and all(
        m["partition_spec_id"] == unpart[0] for m in dels
    )
    # the manifest's embedded spec metadata agrees
    for m in dels:
        _, mmeta, _ = read_ocf_file_with_meta(
            _strip_scheme(m["manifest_path"]))
        assert mmeta["partition-spec"].decode() == "[]"
        assert int(mmeta["partition-spec-id"].decode()) == unpart[0]
    # and the read still applies the delete globally
    got = _rows(spark, tbl)
    assert got == sorted((i, p) for i, p in rows if i != 1)
    # a SECOND delete reuses the registered spec (no duplicate)
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 2}]})
    meta2 = load_table_metadata(tbl)
    assert len([sp for sp in meta2["partition-specs"]
                if not sp.get("fields")]) == 1


def test_scope_key_includes_spec_identity(spark):
    """r12: scope identity is (partition_spec_id, record) — under
    partition-spec EVOLUTION a spec-1 scoped delete must not apply to a
    spec-0 data file whose partition record is coincidentally equal
    (iceberg-java DeleteFileIndex keys by spec id); an unpartitioned
    spec reads as GLOBAL; a PARTITIONED spec's all-null record is the
    legitimate null-partition scope, not global."""
    from pipeline_spark.sources.iceberg_native import plan_equality_deletes

    meta = {
        "schemas": [{"schema-id": 0, "fields": [
            {"id": 1, "name": "id", "type": "long"},
            {"id": 2, "name": "par", "type": "string"},
        ]}],
        "partition-specs": [
            {"spec-id": 0, "fields": [
                {"name": "par", "transform": "identity",
                 "source-id": 2, "field-id": 1000}]},
            {"spec-id": 1, "fields": [
                {"name": "par", "transform": "truncate[1]",
                 "source-id": 2, "field-id": 1001}]},
            {"spec-id": 2, "fields": []},
        ],
        "default-spec-id": 0,
    }
    data = [
        {"path": "/t/a.parquet", "seq": 1, "spec_id": 0,
         "partition": {"par": "x"}},
        {"path": "/t/b.parquet", "seq": 1, "spec_id": 1,
         "partition": {"par": "x"}},
        {"path": "/t/c.parquet", "seq": 1, "spec_id": 2},
        {"path": "/t/d.parquet", "seq": 1, "spec_id": 0,
         "partition": {"par": None}},
        {"path": "/t/e.parquet", "seq": 1, "spec_id": 1,
         "partition": {"par": None}},
    ]
    seq_rows, groups = plan_equality_deletes(spark, [], data, meta)
    keys = {p: k for p, _, k in seq_rows}
    # same record dict, different spec => DIFFERENT scope
    assert keys["/t/a.parquet"] != keys["/t/b.parquet"]
    # unpartitioned spec => global
    assert keys["/t/c.parquet"] == ""
    # all-null record under a PARTITIONED spec: a real (null-partition)
    # scope, distinct per spec, never global
    assert keys["/t/d.parquet"] not in ("", keys["/t/a.parquet"])
    assert keys["/t/e.parquet"] not in ("", keys["/t/d.parquet"])
    # undeclared spec id keeps the legacy inference: all-null => global
    legacy = {"path": "/t/f.parquet", "seq": 1, "spec_id": 9,
              "partition": {"par": None}}
    seq_rows2, _ = plan_equality_deletes(spark, [], [legacy], meta)
    assert seq_rows2[0][2] == ""


def test_null_partition_scoped_eq_delete(spark, tmp_path):
    """A foreign delete scoped to the NULL partition (partitioned spec,
    all-null record) deletes only null-partition rows — before r12 the
    all-null record was inferred as GLOBAL and over-applied table-wide."""
    tbl = str(tmp_path / "nullpart")
    rows = [(0, "x"), (1, "x"), (0, None), (1, None), (1, "y")]
    write_iceberg_native(
        spark.createDataFrame(rows, "id long, par string"),
        {"path": tbl, "mode": "create", "partitionBy": ["par"]},
    )
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 1}]})
    _scope_delete_manifests(tbl, {"par": None})
    got = {
        (r["id"], r["par"])
        for r in read_iceberg_native(spark, {"path": tbl}).collect()
    }
    assert got == {
        (i, p) for i, p in rows if not (i == 1 and p is None)
    }, got


def test_evolved_spec_partition_scoped_delete_e2e(spark, tmp_path):
    """End-to-end spec evolution + scoped deletes: spec-0 partitions by
    par, the spec evolves to par2, and a foreign delete scoped to a
    spec-1 partition must hit only spec-1 files in that partition —
    spec-0 files (whose records live in a different spec) stay intact,
    and a GLOBAL delete still spans both generations."""
    from pipeline_spark.sources.iceberg_native import plan_files

    tbl = str(tmp_path / "evo")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, "x", "x") for i in range(4)],
            "id long, par string, par2 string",
        ),
        {"path": tbl, "mode": "create", "partitionBy": ["par"]},
    )
    write_iceberg_native(
        spark.createDataFrame(
            [(i, "x", "x") for i in range(4, 8)],
            "id long, par string, par2 string",
        ),
        {"path": tbl, "mode": "append", "partitionBy": ["par2"],
         "evolvePartitionSpec": True},
    )
    data, _, meta = plan_files(tbl)
    assert {d["spec_id"] for d in data} == {0, 1}
    # global delete (unpartitioned-spec manifest): spans BOTH specs
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 0}]})
    got = sorted(
        r["id"] for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert got == [1, 2, 3, 4, 5, 6, 7]
    # foreign delete scoped to spec-1's par2='x' partition: id=1 lives
    # only in a spec-0 file, so the scoped delete must NOT remove it —
    # even though spec-0's record {par: 'x'} and spec-1's {par2: 'x'}
    # both say 'x' for their own field
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 1}]})
    _scope_delete_manifests(tbl, {"par2": "x"})
    got = sorted(
        r["id"] for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert 1 in got, "spec-1-scoped delete leaked onto a spec-0 file"
    # and a spec-1 file's key scoped the same way DOES delete
    equality_delete_iceberg_native(spark, {"path": tbl, "values": [{"id": 5}]})
    _scope_delete_manifests(tbl, {"par2": "x"})
    got = sorted(
        r["id"] for r in read_iceberg_native(spark, {"path": tbl}).collect()
    )
    assert 5 not in got and 1 in got
    assert got == [1, 2, 3, 4, 6, 7]
