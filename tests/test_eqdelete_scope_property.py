"""Property suite for equality-delete scope identity + the legacy
global-delete detector (r13).

``plan_equality_deletes`` derives each manifest entry's scope key from
(partition-spec id, partition record) and flags the pre-r11 legacy
shape.  This suite re-implements both rules as an INDEPENDENT model of
iceberg-java's DeleteFileIndex semantics and checks 300 randomized
metadata scenarios — random spec declarations (partitioned /
unpartitioned / undeclared), random records (values, nulls, all-null,
absent), random data-file placement — against the planner.  Pure
metadata: no parquet is read (detection and scope keys resolve before
any file IO; "refuse" raises first).
"""

from __future__ import annotations

import random

import pytest

from pipeline_spark.sources.iceberg_native import plan_equality_deletes

PART_COLS = ["pa", "pb"]


def _rand_meta(rng: random.Random) -> dict:
    """Random table metadata: 1-3 specs, each unpartitioned or over a
    random subset of PART_COLS."""
    specs = []
    for sid in range(rng.randint(1, 3)):
        if rng.random() < 0.3:
            fields = []
        else:
            cols = rng.sample(PART_COLS, rng.randint(1, 2))
            fields = [
                {"name": c, "transform": "identity",
                 "source-id": 10 + i, "field-id": 1000 + i}
                for i, c in enumerate(cols)
            ]
        specs.append({"spec-id": sid, "fields": fields})
    return {
        "schemas": [{"schema-id": 0, "fields": [
            {"id": 1, "name": "id", "type": "long"},
            {"id": 10, "name": "pa", "type": "string"},
            {"id": 11, "name": "pb", "type": "string"},
        ]}],
        "partition-specs": specs,
        "default-spec-id": 0,
    }


def _rand_entry(rng: random.Random, n_specs: int, path: str) -> dict:
    sid = rng.randint(0, n_specs)  # == n_specs -> UNDECLARED spec id
    r = rng.random()
    if r < 0.2:
        rec = None
    elif r < 0.45:
        rec = {c: None for c in rng.sample(PART_COLS, rng.randint(1, 2))}
    else:
        rec = {
            c: rng.choice([None, "x", "y"])
            for c in rng.sample(PART_COLS, rng.randint(1, 2))
        }
    e = {"path": path, "seq": rng.randint(1, 5), "spec_id": sid}
    if rec is not None:
        e["partition"] = rec
    return e


def _model_scope(meta: dict, entry: dict) -> tuple:
    """Independent model of DeleteFileIndex scope identity:
    - declared UNPARTITIONED spec -> global
    - absent/empty record -> global
    - undeclared spec id + all-null record -> global (legacy inference)
    - else -> (spec_id, frozenset(record items))"""
    declared = {int(s["spec-id"]): s.get("fields") or []
                for s in meta["partition-specs"]}
    sid = int(entry.get("spec_id", 0) or 0)
    rec = entry.get("partition") or {}
    if sid in declared and not declared[sid]:
        return ("GLOBAL",)
    if not rec:
        return ("GLOBAL",)
    if sid not in declared and all(v is None for v in rec.values()):
        return ("GLOBAL",)
    return (sid, frozenset(rec.items()))


def _model_legacy(meta: dict, eq: list[dict], data: list[dict]) -> bool:
    """Independent model of the legacy detector: some delete sits under
    a DECLARED PARTITIONED spec with a non-empty all-null record, and no
    data file shares its scope."""
    data_scopes = {_model_scope(meta, d) for d in data}
    for d in eq:
        declared = {int(s["spec-id"]): s.get("fields") or []
                    for s in meta["partition-specs"]}
        sid = int(d.get("spec_id", 0) or 0)
        rec = d.get("partition") or {}
        if (
            sid in declared and declared[sid]
            and rec and all(v is None for v in rec.values())
            and _model_scope(meta, d) not in data_scopes
        ):
            return True
    return False


@pytest.mark.parametrize("chunk", range(3))
def test_scope_identity_property(spark, chunk):
    """Scope-key EQUIVALENCE: two entries share a planner scope key iff
    the model puts them in the same scope (the key string itself is an
    implementation detail; the equivalence relation is the contract)."""
    for seed in range(chunk * 50, (chunk + 1) * 50):
        rng = random.Random(seed)
        meta = _rand_meta(rng)
        n = len(meta["partition-specs"])
        data = [_rand_entry(rng, n, f"/t/d{i}.parquet")
                for i in range(rng.randint(2, 8))]
        seq_rows, _ = plan_equality_deletes(spark, [], data, meta)
        got = {p: k for p, _, k in seq_rows}
        want = {d["path"]: _model_scope(meta, d) for d in data}
        for a in data:
            for b in data:
                same_got = got[a["path"]] == got[b["path"]]
                same_want = want[a["path"]] == want[b["path"]]
                assert same_got == same_want, (
                    seed, a, b, got[a["path"]], got[b["path"]],
                    want[a["path"]], want[b["path"]])
        # global is a distinguished scope: key "" iff model says GLOBAL
        for d in data:
            assert (got[d["path"]] == "") == (want[d["path"]] == ("GLOBAL",)), (
                seed, d, got[d["path"]], want[d["path"]])


@pytest.mark.parametrize("chunk", range(3))
def test_legacy_detector_property(spark, chunk):
    """The planner refuses (mode=refuse) EXACTLY when the model flags a
    legacy shape — no false refusals, no missed resurrection paths."""
    for seed in range(chunk * 50, (chunk + 1) * 50):
        rng = random.Random(100_000 + seed)
        meta = _rand_meta(rng)
        n = len(meta["partition-specs"])
        data = [_rand_entry(rng, n, f"/t/d{i}.parquet")
                for i in range(rng.randint(0, 6))]
        eq = [
            {**_rand_entry(rng, n, f"/t/e{i}.parquet"),
             "equality_ids": [1]}
            for i in range(rng.randint(1, 4))
        ]
        want_flag = _model_legacy(meta, eq, data)
        try:
            # grouping would read delete parquet; a bogus-path failure
            # AFTER detection still proves "not refused"
            plan_equality_deletes(spark, eq, data, meta)
            got_flag = False
        except ValueError as exc:
            assert "legacy GLOBAL" in str(exc), (seed, exc)
            got_flag = True
        except Exception:
            got_flag = False  # file-IO error past the guard
        assert got_flag == want_flag, (seed, meta, eq, data)


@pytest.mark.parametrize("chunk", range(2))
def test_legacy_detector_uses_whole_table_placement(spark, chunk):
    """r13 review find regression, property form: when ``all_data``
    (the whole table) contains a file in the delete's null-partition
    scope, the detector must stay quiet no matter how the caller's scan
    subset is pruned; with no such file anywhere it must fire even if
    the subset is empty."""
    for seed in range(chunk * 25, (chunk + 1) * 25):
        rng = random.Random(200_000 + seed)
        meta = _rand_meta(rng)
        # pick a declared PARTITIONED spec if any, else skip
        part_specs = [s for s in meta["partition-specs"]
                      if s.get("fields")]
        if not part_specs:
            continue
        sid = int(part_specs[0]["spec-id"])
        cols = [f["name"] for f in part_specs[0]["fields"]]
        null_rec = {c: None for c in cols}
        eq = [{"path": "/t/e.parquet", "seq": 3, "spec_id": sid,
               "partition": dict(null_rec), "equality_ids": [1]}]
        null_file = {"path": "/t/null.parquet", "seq": 1, "spec_id": sid,
                     "partition": dict(null_rec)}
        other = [{"path": f"/t/d{i}.parquet", "seq": 1, "spec_id": sid,
                  "partition": {c: "x" for c in cols}}
                 for i in range(rng.randint(0, 3))]
        has_null = rng.random() < 0.5
        all_data = other + ([null_file] if has_null else [])
        subset = rng.sample(other, rng.randint(0, len(other)))  # pruned
        try:
            plan_equality_deletes(
                spark, eq, subset, meta, all_data=all_data)
            fired = False
        except ValueError as exc:
            assert "legacy GLOBAL" in str(exc)
            fired = True
        except Exception:
            fired = False  # file IO past the guard
        assert fired == (not has_null), (seed, has_null, subset, all_data)


def _model_ambiguous(meta: dict, eq: list[dict], data: list[dict]) -> bool:
    """Independent model of the r14 ambiguous class: a delete under a
    DECLARED PARTITIONED spec with a non-empty all-null record whose
    null-partition scope DOES hold data (undecidable legacy-vs-legit)."""
    data_scopes = {_model_scope(meta, d) for d in data}
    declared = {int(s["spec-id"]): s.get("fields") or []
                for s in meta["partition-specs"]}
    for d in eq:
        sid = int(d.get("spec_id", 0) or 0)
        rec = d.get("partition") or {}
        if (
            sid in declared and declared[sid]
            and rec and all(v is None for v in rec.values())
            and _model_scope(meta, d) in data_scopes
        ):
            return True
    return False


@pytest.mark.parametrize("chunk", range(2))
def test_apply_mode_property(spark, chunk, caplog):
    """r14 review-fix contract, property form: mode='apply' NEVER
    refuses, and it logs the globalized-ambiguous warning exactly when
    the model finds an ambiguous delete (all-null partitioned record
    with null-partition data present) — the class 'apply' now
    globalizes instead of silently scoping strict."""
    import logging

    for seed in range(chunk * 50, (chunk + 1) * 50):
        rng = random.Random(300_000 + seed)
        meta = _rand_meta(rng)
        n = len(meta["partition-specs"])
        data = [_rand_entry(rng, n, f"/t/d{i}.parquet")
                for i in range(rng.randint(0, 6))]
        eq = [
            {**_rand_entry(rng, n, f"/t/e{i}.parquet"),
             "equality_ids": [1]}
            for i in range(rng.randint(1, 4))
        ]
        caplog.clear()
        with caplog.at_level(logging.WARNING,
                             logger="pipeline_spark.iceberg"):
            try:
                plan_equality_deletes(
                    spark, eq, data, meta, legacy_global_deletes="apply")
            except ValueError as exc:
                raise AssertionError(
                    f"seed {seed}: apply mode refused: {exc}") from exc
            except Exception:
                pass  # file IO past the guard — detection already ran
        want_ambig = _model_ambiguous(meta, eq, data)
        got_ambig = any(
            "GLOBAL (legacyGlobalDeletes: apply)" in r.message
            for r in caplog.records
        )
        assert got_ambig == want_ambig, (seed, meta, eq, data)
