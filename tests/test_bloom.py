"""Bloom membership filter: sizing, hash math, build/probe, dedup module."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pipeline_spark.functions import bloom
from pipeline_spark.operators.dedup import dedup_transform
from pipeline_spark.registry import ModuleContext


def test_size_for_classic_values():
    m, k = bloom.size_for(1000, 0.01)
    # textbook: ~9.585 bits/item at 1% fpp, k ~ 7
    assert 9000 <= m <= 9700 and m % 64 == 0
    assert k == 7
    with pytest.raises(ValueError):
        bloom.size_for(0, 0.01)
    with pytest.raises(ValueError):
        bloom.size_for(10, 1.5)


def test_no_false_negatives_numpy():
    rng = np.random.default_rng(7)
    m, k = bloom.size_for(5000, 1e-4)
    bits = np.zeros(m // 8, dtype=np.uint8)
    h = rng.integers(-(2**63), 2**63, size=5000, dtype=np.int64)
    bloom.set_bits(bits, h, k, m)
    assert bloom.test_bits(bits, h, k, m).all()


def test_false_positive_rate_near_target():
    rng = np.random.default_rng(11)
    m, k = bloom.size_for(5000, 0.01)
    bits = np.zeros(m // 8, dtype=np.uint8)
    member = rng.integers(-(2**63), 2**63, size=5000, dtype=np.int64)
    bloom.set_bits(bits, member, k, m)
    probe = rng.integers(-(2**63), 2**63, size=50_000, dtype=np.int64)
    fp = bloom.test_bits(bits, probe, k, m).mean()
    assert fp < 0.03  # target 0.01, generous margin for variance


def _ctx(spark, params, inputs, side=None):
    return ModuleContext(
        spark=spark,
        name="d",
        params=params,
        inputs=inputs,
        input_names=["in"],
        side_inputs=side or {},
    )


@pytest.fixture(scope="module")
def corpus(spark):
    history = spark.createDataFrame(
        [Row(doc_id=i, text=f"historical document number {i}") for i in range(200)]
    )
    batch = spark.createDataFrame(
        # 50 re-crawled duplicates of history + 100 genuinely new docs
        [Row(doc_id=1000 + i, text=f"historical document number {i}") for i in range(50)]
        + [Row(doc_id=2000 + i, text=f"fresh document number {i}") for i in range(100)]
    )
    return history, batch


def test_bloom_dedup_drops_seen_keeps_new(spark, corpus):
    history, batch = corpus
    out = dedup_transform(
        _ctx(spark, {"method": "bloom", "fpp": 1e-9}, [batch], {"h": history})
    )[""]
    ids = {r["doc_id"] for r in out.collect()}
    # every true duplicate dropped (no false negatives), columns unchanged
    assert not any(1000 <= i < 1100 for i in ids)
    assert out.columns == batch.columns
    # at fpp=1e-9 on 100 probes, false positives are effectively impossible
    assert ids == {2000 + i for i in range(100)}


def test_bloom_dedup_flag_mode(spark, corpus):
    history, batch = corpus
    out = dedup_transform(
        _ctx(
            spark,
            {"method": "bloom", "fpp": 1e-9, "outputFlag": True},
            [batch],
            {"h": history},
        )
    )[""]
    rows = {r["doc_id"]: r["seen"] for r in out.collect()}
    assert rows[1000] is True and rows[2000] is False
    assert len(rows) == 150


def test_bloom_dedup_requires_side_input(spark, corpus):
    _, batch = corpus
    with pytest.raises(ValueError, match="sideInput"):
        dedup_transform(_ctx(spark, {"method": "bloom"}, [batch]))


def test_bloom_build_partition_cap(spark, corpus):
    history, batch = corpus
    bitmap, m, k = bloom.build_bloom(
        history.repartition(16), ["text"], expected_items=200, max_build_partitions=2
    )
    probed = bloom.probe_bloom(batch, ["text"], bitmap, m, k)
    seen = probed.filter(F.col("__seen__")).count()
    assert seen == 50  # cap changes the merge shape, never the answer


def test_bloom_empty_history(spark, corpus):
    history, batch = corpus
    empty = history.filter(F.lit(False))
    out = dedup_transform(
        _ctx(spark, {"method": "bloom", "expectedItems": 10}, [batch], {"h": empty})
    )[""]
    assert out.count() == batch.count()


# --- semantic (SemDeDup) dedup ---------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=(4, 8))
    rows = []
    # anchors take the 4 LOWEST ids so the seeded-centroid path (first k
    # vectors by id) initializes one centroid per anchor direction
    for a, b in enumerate(base):
        rows.append(Row(vec_id=a, embedding=[float(x) for x in b]))
    for a, b in enumerate(base):
        for j, eps in enumerate((1e-3, 2e-3)):
            v = b + eps * rng.normal(size=8)
            rows.append(Row(vec_id=10 + 2 * a + j, embedding=[float(x) for x in v]))
    for i in range(8):
        rows.append(
            Row(vec_id=20 + i, embedding=[float(x) for x in rng.normal(size=8)])
        )
    return spark.createDataFrame(rows)


def test_semantic_dedup_drops_near_copies(spark, vectors):
    out = dedup_transform(
        _ctx(
            spark,
            {"method": "semantic", "idField": "vec_id", "clusters": 4,
             "threshold": 0.99},
            [vectors],
        )
    )[""]
    ids = {r["vec_id"] for r in out.collect()}
    # each anchor survives; its near-copies (higher ids, cosine ~0.999) drop
    for a in range(4):
        assert a in ids
        assert 10 + 2 * a not in ids and 11 + 2 * a not in ids
    # unrelated random vectors all survive
    assert all(20 + i in ids for i in range(8))
    assert out.columns == vectors.columns


def test_semantic_dedup_assignments_mode(spark, vectors):
    out = dedup_transform(
        _ctx(
            spark,
            {"method": "semantic", "idField": "vec_id", "clusters": 4,
             "outputAssignments": True},
            [vectors],
        )
    )[""]
    rows = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert len(rows) == vectors.count()
    # near-copies land in the same cluster as their anchor
    for a in range(4):
        assert rows[a] == rows[10 + 2 * a] == rows[11 + 2 * a]


def test_semantic_dedup_cluster_size_guard(spark, vectors):
    with pytest.raises(Exception, match="maxClusterSize"):
        dedup_transform(
            _ctx(
                spark,
                {"method": "semantic", "idField": "vec_id", "clusters": 1,
                 "maxClusterSize": 3},
                [vectors],
            )
        )[""].collect()


def test_semantic_dedup_kmeans_path(spark, vectors):
    out = dedup_transform(
        _ctx(
            spark,
            {"method": "semantic", "idField": "vec_id", "clusters": 4,
             "iterations": 3, "threshold": 0.99},
            [vectors],
        )
    )[""]
    ids = {r["vec_id"] for r in out.collect()}
    for a in range(4):
        assert a in ids and 10 + 2 * a not in ids


def test_bloom_filter_persistence_and_rolling_merge(spark, corpus, tmp_path):
    history, batch = corpus
    path = str(tmp_path / "history.bloom")
    # run 1: build from history, persist
    out1 = dedup_transform(
        _ctx(
            spark,
            {"method": "bloom", "fpp": 1e-9, "filterPath": path,
             "expectedItems": 500},
            [batch], {"h": history},
        )
    )[""]
    assert out1.count() == 100
    # run 2: probe-only from the persisted filter, no side input
    out2 = dedup_transform(
        _ctx(spark, {"method": "bloom", "filterPath": path}, [batch])
    )[""]
    assert {r["doc_id"] for r in out2.collect()} == {2000 + i for i in range(100)}
    # run 3: roll the fresh docs into the filter; now everything is "seen"
    fresh = batch.filter(F.col("doc_id") >= 2000)
    dedup_transform(
        _ctx(
            spark,
            {"method": "bloom", "fpp": 1e-9, "filterPath": path,
             "expectedItems": 500},
            [batch], {"h": fresh},
        )
    )[""].count()
    out3 = dedup_transform(
        _ctx(spark, {"method": "bloom", "filterPath": path}, [batch])
    )[""]
    assert out3.count() == 0


def test_bloom_persisted_geometry_mismatch(spark, corpus, tmp_path):
    from pipeline_spark.functions import bloom as bl

    history, batch = corpus
    path = str(tmp_path / "geo.bloom")
    bl.save_filter(path, b"\x00" * 8, 64, 3)
    with pytest.raises(ValueError, match="geometry"):
        dedup_transform(
            _ctx(
                spark,
                {"method": "bloom", "filterPath": path, "expectedItems": 500,
                 "fpp": 1e-9},
                [batch], {"h": history},
            )
        )[""]
    with open(path, "wb") as f:
        f.write(b"junkjunkjunk" * 4)
    with pytest.raises(ValueError, match="not a pipeline_spark bloom"):
        bl.load_filter(path)


@pytest.mark.slow  # fast-tier deselects (r16: driver verify window)
def test_bloom_streaming_probe(spark, tmp_path, corpus):
    """The probe is a stateless pandas UDF — it must work unchanged on a
    streaming DataFrame (the incremental-crawl shape)."""
    history, batch = corpus
    src = tmp_path / "stream_in"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b1.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(str(src / "*"))
    out = dedup_transform(
        _ctx(spark, {"method": "bloom", "fpp": 1e-9}, [stream], {"h": history})
    )[""]
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("bloom_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    ids = {r["doc_id"] for r in spark.sql("SELECT * FROM bloom_stream").collect()}
    assert ids == {2000 + i for i in range(100)}


def test_semantic_dedup_param_validation(spark, vectors):
    with pytest.raises(ValueError, match="clusters"):
        dedup_transform(
            _ctx(spark, {"method": "semantic", "idField": "vec_id",
                         "clusters": 0}, [vectors])
        )
    with pytest.raises(ValueError, match="cosine"):
        dedup_transform(
            _ctx(spark, {"method": "semantic", "idField": "vec_id",
                         "clusters": 4, "threshold": 2.0}, [vectors])
        )


def test_bloom_save_load_merge_property(tmp_path):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pipeline_spark.functions import bloom as bl

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=200),
        st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=200),
    )
    def roundtrip(xs, ys):
        m, k = bl.size_for(500, 1e-4)
        a = np.zeros(m // 8, dtype=np.uint8)
        b = np.zeros(m // 8, dtype=np.uint8)
        bl.set_bits(a, np.array(xs, dtype=np.int64), k, m)
        bl.set_bits(b, np.array(ys, dtype=np.int64), k, m)
        path = str(tmp_path / "f.bloom")
        bl.save_filter(path, a.tobytes(), m, k)
        bits, m2, k2 = bl.load_filter(path)
        assert (m2, k2) == (m, k) and bits == a.tobytes()
        merged = np.frombuffer(
            bl.merge_filters(a.tobytes(), b.tobytes()), dtype=np.uint8
        )
        # merge = union: every member of either side tests positive
        both = np.array(xs + ys, dtype=np.int64)
        assert bl.test_bits(merged, both, k, m).all()

    roundtrip()
