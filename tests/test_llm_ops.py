"""Tests for the training-data-pipeline operators: dedup variants,
similarity search, textstats, multimodal plumbing, http dead-letter,
crypto roundtrip."""

import base64

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pipeline_spark.registry import ModuleContext
from pipeline_spark.operators.dedup import dedup_transform
from pipeline_spark.operators.similarity import similarity_transform
from pipeline_spark.operators.textstats import textstats_transform
from pipeline_spark.operators.multimodal import multimodal_transform
from pipeline_spark.operators.crypto import crypto_transform


def ctx(spark, params, inputs, side=None):
    return ModuleContext(
        spark=spark,
        name="t",
        params=params,
        inputs=inputs,
        input_names=["in"] * len(inputs),
        side_inputs=side or {},
    )


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),  # exact dup
        Row(doc_id=2, text="the quick brown fox leaps over the lazy dog"),  # near dup
        Row(doc_id=3, text="completely different content about spark engines"),
        Row(doc_id=4, text=""),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(spark, docs):
    out = dedup_transform(ctx(spark, {"method": "exact", "idField": "doc_id", "fields": ["text"]}, [docs]))[""]
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [0, 2, 3, 4]  # doc 1 removed (dup of 0, larger id)


def test_minhash_near_dup(spark, docs):
    out = dedup_transform(
        ctx(
            spark,
            {
                "method": "minhash_lsh",
                "idField": "doc_id",
                "field": "text",
                "threshold": 0.3,
                "outputPairs": True,
            },
            [docs],
        )
    )[""]
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 1) in pairs  # exact dup must collide with est_jaccard 1.0
    est = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in out.collect()}
    assert est[(0, 1)] == 1.0


def test_simhash_identical_signatures(spark, docs):
    out = dedup_transform(
        ctx(spark, {"method": "simhash", "idField": "doc_id", "field": "text", "outputSignatures": True}, [docs])
    )[""]
    sig = {r["doc_id"]: r["simhash"] for r in out.collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[3]


def test_ngram_jaccard_exact_value(spark, docs):
    out = dedup_transform(
        ctx(spark, {"method": "ngram_jaccard", "idField": "doc_id", "field": "text", "threshold": 0.2}, [docs])
    )[""]
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    assert jac[(0, 1)] == 1.0
    # 9 tokens → 7 trigrams; "jumps"→"leaps" changes trigrams 2..4 →
    # overlap 4, union 10 → 0.4
    assert abs(jac[(0, 2)] - 0.4) < 1e-9


def test_similarity_bruteforce_self_top1(spark):
    vecs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i == j) for j in range(4)]) for i in range(4)]
    )
    queries = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity_transform(
        ctx(spark, {"method": "brute_force", "k": 2}, [vecs], side={"q": queries})
    )[""]
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows[0]["neighbor_id"] == 0 and abs(rows[0]["cosine"] - 1.0) < 1e-9


def test_textstats_ops(spark, docs):
    out = textstats_transform(
        ctx(spark, {"field": "text", "ops": ["lang_id", "quality", "token_count", "fingerprint"]}, [docs])
    )[""]
    r = {x["doc_id"]: x for x in out.collect()}
    assert r[0]["lang_pred"] == "en"
    assert r[0]["n_tokens"] == 9
    assert r[0]["fingerprint"] == r[1]["fingerprint"]
    assert 0.0 <= r[0]["quality"] <= 1.0


def test_multimodal_meta_and_fake_decode(spark):
    rows = [
        Row(mm_id=1, payload=bytes.fromhex("ffd8ff") + b"rest"),
        Row(mm_id=2, payload=b"\x89PNG\r\n"),
        Row(mm_id=3, payload=b"plain bytes"),
    ]
    df = spark.createDataFrame(rows)
    meta = multimodal_transform(ctx(spark, {"op": "extract_meta", "field": "payload", "idField": "mm_id"}, [df]))[""]
    mimes = {r["mm_id"]: r["mime"] for r in meta.collect()}
    assert mimes[1] == "image/jpeg" and mimes[2] == "image/png"
    assert mimes[3] == "application/octet-stream"

    dec = multimodal_transform(
        ctx(spark, {"op": "decode", "field": "payload", "idField": "mm_id", "fake": True}, [df])
    )[""]
    feats = {r["mm_id"]: r["features"] for r in dec.collect()}
    assert len(feats[1]) == 8
    # deterministic fake: same payload → same features
    dec2 = multimodal_transform(
        ctx(spark, {"op": "decode", "field": "payload", "idField": "mm_id", "fake": True}, [df])
    )[""]
    feats2 = {r["mm_id"]: r["features"] for r in dec2.collect()}
    assert feats[1] == feats2[1]

    # real decode on undecodable payloads: onError null keeps the rows
    # with null features, default (fail) raises at execution
    dec3 = multimodal_transform(
        ctx(spark, {"op": "decode", "field": "payload", "idField": "mm_id",
                    "onError": "null"}, [df])
    )[""]
    assert all(r["features"] is None for r in dec3.collect())
    # whichever undecodable row's task aborts the job first surfaces its
    # own actionable error: the truncated JPEG raises JpegError, the
    # truncated PNG ValueError, the plain bytes NotImplementedError
    with pytest.raises(Exception, match="NotImplementedError|ValueError|JpegError"):
        multimodal_transform(
            ctx(spark, {"op": "decode", "field": "payload", "idField": "mm_id"}, [df])
        )[""].collect()


def test_crypto_roundtrip(spark):
    df = spark.createDataFrame([Row(id=1, secret="hello world")])
    key = base64.b64encode(b"0123456789abcdef").decode()
    enc = crypto_transform(ctx(spark, {"mode": "encrypt", "fields": ["secret"], "key": key}, [df]))[""]
    enc_val = enc.collect()[0]["secret"]
    assert enc_val != "hello world"
    dec = crypto_transform(ctx(spark, {"mode": "decrypt", "fields": ["secret"], "key": key}, [enc]))[""]
    assert dec.collect()[0]["secret"] == "hello world"


def test_http_transform_dead_letter(spark):
    # unreachable host → every row lands in the failures output
    from pipeline_spark.operators.http import http_transform

    df = spark.createDataFrame([Row(id=1), Row(id=2)])
    outs = http_transform(
        ctx(
            spark,
            {
                "request": {"url": "http://127.0.0.1:1/nope?id=${id}"},
                "retryCount": 0,
                "timeout": 2,
            },
            [df],
        )
    )
    assert outs[""].count() == 0
    fails = outs["failures"].collect()
    assert len(fails) == 2 and all(r["__error__"] for r in fails)


def test_embedding_neardup_bucketed_matches_exact(spark):
    """The SRP-bucketed scale path must find the same pairs as the exact
    all-pairs oracle on a corpus with planted near-dups (no driver collect,
    no corpus broadcast)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    vecs = list(base)
    # planted near-dups: tiny perturbations of rows 0..4
    for i in range(5):
        vecs.append(base[i] + rng.standard_normal(16) * 0.01)
    rows = [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows)

    exact = dedup_transform(
        ctx(spark, {"method": "embedding", "strategy": "exact", "idField": "vec_id",
                    "vectorField": "embedding", "threshold": 0.95}, [df])
    )[""]
    bucketed = dedup_transform(
        ctx(spark, {"method": "embedding", "idField": "vec_id",
                    "vectorField": "embedding", "threshold": 0.95,
                    "bits": 4, "tables": 8}, [df])
    )[""]
    e = {(r["doc_a"], r["doc_b"]) for r in exact.collect()}
    b = {(r["doc_a"], r["doc_b"]) for r in bucketed.collect()}
    assert e == {(i, 40 + i) for i in range(5)}
    assert b == e


def test_embedding_exact_guard_refuses_large_input(spark):
    rows = [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(30)]
    df = spark.createDataFrame(rows)
    with pytest.raises(ValueError, match="maxExactRows"):
        dedup_transform(
            ctx(spark, {"method": "embedding", "strategy": "exact",
                        "maxExactRows": 10, "idField": "vec_id",
                        "vectorField": "embedding"}, [df])
        )


def test_ngram_jaccard_hot_gram_guard(spark):
    """Grams above the document-frequency cap are dropped before the
    self-join; pairs only linked by hot grams disappear, pairs with
    rarer shared grams keep exact Jaccard over surviving grams."""
    common = "alpha beta gamma"  # one shared trigram across ALL docs
    rows = [Row(doc_id=i, text=f"{common} unique{i} filler{i} tail{i}") for i in range(6)]
    rows += [
        Row(doc_id=100, text="rare shared trigram one two three"),
        Row(doc_id=101, text="rare shared trigram four five six"),
    ]
    df = spark.createDataFrame(rows)
    params = {"method": "ngram_jaccard", "idField": "doc_id", "field": "text",
              "ngram": 3, "threshold": 0.05}
    uncapped = dedup_transform(ctx(spark, {**params, "maxDocFreq": None}, [df]))[""]
    capped = dedup_transform(ctx(spark, {**params, "maxDocFreq": 3}, [df]))[""]
    u = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    c = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # the 6 'common' docs pair up only via the hot trigram → gone when capped
    assert any(a < 6 and b < 6 for a, b in u)
    assert not any(a < 6 and b < 6 for a, b in c)
    # the rare-gram pair survives with its exact score
    assert (100, 101) in c


def test_keyless_limit_is_take_ordered(spark):
    """Global (keyless) top-k must compile to TakeOrderedAndProject, not a
    single-partition WindowExec funneling the whole dataset."""
    from pipeline_spark.operators.limit import apply_limit

    df = spark.range(0, 10000).withColumn("v", F.col("id") * 3 % 7)
    out = apply_limit(df, {"count": 5, "orderFields": ["v"]}, [], None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert out.count() == 5


def test_gemini_predict_with_fake_client(spark):
    """vertexai.gemini predict mode: per-row templated request, response
    struct on success, dead-letter on client error (fake SDK client via
    clientFactory). Reference: GeminiTransform.java:25-305."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    outs = run_pipeline(spark, parse_config("""
sources:
  - name: prompts
    module: create
    parameters:
      elements:
        - {id: 1, prompt: "summarize spark"}
        - {id: 2, prompt: "please FAIL loudly"}
    schema:
      fields:
        - {name: id, type: int64, mode: required}
        - {name: prompt, type: string, mode: required}
transforms:
  - name: llm
    module: vertexai.gemini
    inputs: [prompts]
    failFast: false
    parameters:
      mode: predict
      clientFactory: "pipeline_spark.testing:fake_gemini_client"
      model: {model: gemini-test}
      request: '{"contents": [{"parts": [{"text": "${prompt}"}]}]}'
"""))
    ok = outs["llm"].collect()
    assert len(ok) == 1 and ok[0]["id"] == 1
    assert "summarize spark" in ok[0]["response"]["text"]
    assert "gemini-test" in ok[0]["response"]["text"]
    fails = outs["llm.failures"].collect()
    assert len(fails) == 1 and fails[0]["id"] == 2
    assert "refused" in fails[0]["__error__"]


def test_gemini_batch_json_mode(spark):
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    outs = run_pipeline(spark, parse_config("""
sources:
  - name: prompts
    module: create
    parameters:
      elements:
        - {id: 1, prompt: hello}
    schema:
      fields:
        - {name: id, type: int64, mode: required}
        - {name: prompt, type: string, mode: required}
transforms:
  - name: fmt
    module: vertexai.gemini
    inputs: [prompts]
    parameters:
      mode: batch_json
      request: '{"contents": [{"parts": [{"text": "${prompt}"}]}]}'
"""))
    row = outs["fmt"].collect()[0]
    assert '"text": "hello"' in row["request"]


def test_bigtable_transform_with_fake_client(spark):
    """bigtable enrichment read: templated exact key per row, typed cell
    decode, dead-letter on read error. Reference: BigtableTransform.java."""
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    outs = run_pipeline(spark, parse_config("""
sources:
  - name: users
    module: create
    parameters:
      elements:
        - {uid: "7"}
        - {uid: "12"}
        - {uid: "BOOM"}
    schema:
      fields:
        - {name: uid, type: string, mode: required}
transforms:
  - name: enrich
    module: bigtable
    inputs: [users]
    failFast: false
    parameters:
      tableId: profiles
      clientFactory: "pipeline_spark.testing:fake_bigtable_client"
      keyRange: {exact: "user#${uid}"}
      columns:
        - family: profile
          qualifiers:
            - {name: name, type: string}
            - {name: score, type: int64}
"""))
    ok = {r["uid"]: (r["name"], r["score"]) for r in outs["enrich"].collect()}
    assert ok == {"7": ("name-7", 7), "12": ("name-12", 12)}
    fails = outs["enrich.failures"].collect()
    assert len(fails) == 1 and fails[0]["uid"] == "BOOM"


def test_ivf_topk_matches_bruteforce_on_clustered_data(spark):
    """IVF with nprobe < cells: planted clusters mean true neighbors live
    in the probed cell, so top-k matches brute force while scanning only
    a candidate subset. Exhaustive probing (nprobe=cells) must always
    match brute force."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)) * 10
    vecs, rows = [], []
    for i in range(80):
        v = centers[i % 4] + rng.standard_normal(16) * 0.5
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    corpus = spark.createDataFrame(rows)
    queries = corpus.filter("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )

    def run_sim(method, **extra):
        params = {"method": method, "k": 4, "idField": "vec_id",
                  "vectorField": "embedding", **extra}
        return {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in similarity_transform(
                ctx(spark, params, [corpus], side={"q": queries})
            )[""].collect()
        }

    exact = run_sim("brute_force")
    ivf_partial = run_sim("ivf", cells=4, nprobe=1, sampleSize=80, kmeansIters=4)
    ivf_full = run_sim("ivf", cells=4, nprobe=4, sampleSize=80, kmeansIters=4)
    assert ivf_full == exact
    assert ivf_partial == exact  # clustered data: 1 probe finds the cluster


def test_multimodal_resize_and_frame_sample_plumbing(spark):
    """resize keeps 1:1 rows with stamped dims; frame_sample explodes one
    row into N deterministic frames — the Spark-side row-multiplication
    plumbing is real even with the fake codec."""
    rows = [Row(mm_id=1, payload=b"video-bytes-a"), Row(mm_id=2, payload=b"video-b")]
    df = spark.createDataFrame(rows)

    resized = multimodal_transform(
        ctx(spark, {"op": "resize", "field": "payload", "width": 64,
                    "height": 48, "fake": True}, [df])
    )[""]
    r = {x["mm_id"]: x for x in resized.collect()}
    assert len(r) == 2 and r[1]["width"] == 64 and r[1]["height"] == 48
    assert bytes(r[1]["resized"]) == b"video-bytes-a"

    frames = multimodal_transform(
        ctx(spark, {"op": "frame_sample", "field": "payload", "idField": "mm_id",
                    "frames": 4, "fake": True}, [df])
    )[""].collect()
    assert len(frames) == 8
    by_id = {}
    for f in frames:
        by_id.setdefault(f["mm_id"], []).append(f)
    assert sorted(x["frame_idx"] for x in by_id[1]) == [0, 1, 2, 3]
    # deterministic: same payload → same frame bytes
    again = multimodal_transform(
        ctx(spark, {"op": "frame_sample", "field": "payload", "idField": "mm_id",
                    "frames": 4, "fake": True}, [df])
    )[""].collect()
    assert {bytes(f["frame"]) for f in frames} == {bytes(f["frame"]) for f in again}

    # real path: non-GIF containers still need ffmpeg — the gate now fires
    # per-payload inside the UDF (GIF animations decode for real)
    with pytest.raises(Exception, match="ffmpeg"):
        multimodal_transform(
            ctx(spark, {"op": "frame_sample", "field": "payload"}, [df])
        )[""].collect()


def test_sample_split_disjoint_exhaustive_deterministic(spark):
    from pipeline_spark.operators.sample import sample_transform

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    outs = sample_transform(
        ctx(spark, {"method": "split", "keyField": "doc_id",
                    "splits": {"train": 0.8, "val": 0.1, "test": 0.1}}, [df])
    )
    parts = {k: {r["doc_id"] for r in v.collect()} for k, v in outs.items()}
    all_ids = set().union(*parts.values())
    assert all_ids == set(range(2000))  # exhaustive
    assert sum(len(s) for s in parts.values()) == 2000  # disjoint
    assert 1500 < len(parts["train"]) < 1700  # ~80%
    # deterministic: second run = identical membership
    outs2 = sample_transform(
        ctx(spark, {"method": "split", "keyField": "doc_id",
                    "splits": {"train": 0.8, "val": 0.1, "test": 0.1}}, [df])
    )
    assert {r["doc_id"] for r in outs2["train"].collect()} == parts["train"]
    # salt changes membership
    salted = sample_transform(
        ctx(spark, {"method": "split", "keyField": "doc_id", "salt": "v2",
                    "splits": {"train": 0.8, "val": 0.1, "test": 0.1}}, [df])
    )
    assert {r["doc_id"] for r in salted["train"].collect()} != parts["train"]


def test_sample_stratified(spark):
    from pyspark.sql import functions as SF

    from pipeline_spark.operators.sample import sample_transform

    df = spark.range(0, 3000).select(
        SF.col("id").alias("doc_id"),
        SF.when(SF.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
    )
    out = sample_transform(
        ctx(spark, {"method": "stratified", "keyField": "doc_id",
                    "stratifyField": "grp",
                    "fractions": {"a": 0.5, "b": 0.05}}, [df])
    )[""]
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(SF.count("*").alias("n")).collect()}
    assert 650 < counts["a"] < 850        # ~50% of 1500
    assert 30 < counts.get("b", 0) < 140  # ~5% of 1500


def _mix_ctx(spark, params, inputs, names):
    return ModuleContext(
        spark=spark, name="mx", params=params, inputs=inputs, input_names=names,
    )


def test_sample_mix_proportions_and_determinism(spark):
    from pyspark.sql import functions as SF

    from pipeline_spark.operators.sample import sample_transform

    big = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    small = spark.range(10000, 10500).withColumnRenamed("id", "doc_id")
    params = {
        "method": "mix", "keyField": "doc_id",
        "weights": {"big": 0.5, "small": 0.5},
    }
    out = sample_transform(_mix_ctx(spark, params, [big, small], ["big", "small"]))[""]
    counts = {
        r["__source__"]: r["n"]
        for r in out.groupBy("__source__").agg(SF.count("*").alias("n")).collect()
    }
    # equal weights, no upsampling: N is capped by the small source at
    # 2*500 -> ~500 rows each (md5-binomial wiggle on the big side)
    assert counts["small"] == 500
    assert 420 < counts["big"] < 580
    assert "__epoch__" not in out.columns  # maxEpochs=1 -> no epoch tag
    # deterministic
    out2 = sample_transform(_mix_ctx(spark, params, [big, small], ["big", "small"]))[""]
    assert sorted(out.collect()) == sorted(out2.collect())


def test_sample_mix_upsampling_epochs(spark):
    from pyspark.sql import functions as SF

    from pipeline_spark.operators.sample import sample_transform

    big = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    small = spark.range(10000, 10500).withColumnRenamed("id", "doc_id")
    out = sample_transform(_mix_ctx(
        spark,
        {"method": "mix", "keyField": "doc_id",
         "weights": {"big": 0.5, "small": 0.5}, "maxEpochs": 3},
        [big, small], ["big", "small"],
    ))[""]
    rows = out.groupBy("__source__", "__epoch__").agg(SF.count("*").alias("n")).collect()
    by = {(r["__source__"], r["__epoch__"]): r["n"] for r in rows}
    # small source now repeats: 3 epochs of 500 = its maxEpochs cap
    assert by[("small", 0)] == 500 and by[("small", 1)] == 500 and by[("small", 2)] == 500
    # big source contributes ~1500 rows in its single partial epoch
    assert 1350 < by[("big", 0)] < 1650
    # repeated rows are exact copies modulo the epoch tag
    small_e0 = {r["doc_id"] for r in out.filter(
        (SF.col("__source__") == "small") & (SF.col("__epoch__") == 1)).collect()}
    assert small_e0 == set(range(10000, 10500))


def test_sample_mix_temperature_flattens(spark):
    from pipeline_spark.operators.sample import mix_proportions

    p1 = mix_proportions({"a": 0.9, "b": 0.1}, temperature=1.0)
    p5 = mix_proportions({"a": 0.9, "b": 0.1}, temperature=5.0)
    assert p1["b"] < p5["b"] < 0.5  # T>1 upweights the small source
    assert abs(sum(p1.values()) - 1) < 1e-12 and abs(sum(p5.values()) - 1) < 1e-12
    with pytest.raises(ValueError, match="temperature"):
        mix_proportions({"a": 1.0}, temperature=0)


def test_sample_mix_validation(spark):
    from pipeline_spark.operators.sample import sample_transform

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="no weight"):
        sample_transform(_mix_ctx(
            spark, {"method": "mix", "keyField": "doc_id", "weights": {"x": 1.0}},
            [df, df], ["a", "b"],
        ))
    with pytest.raises(ValueError, match="weights"):
        sample_transform(_mix_ctx(
            spark, {"method": "mix", "keyField": "doc_id"}, [df], ["a"],
        ))


def test_scrub_pii_patterns(spark):
    from pipeline_spark.operators.scrub import scrub_transform

    rows = [Row(id=1, text=(
        "mail a.b+c@x-mail.co.uk visit https://ex.com/p?q=1 "
        "ssn 123-45-6789 card 4111 1111 1111 1111 ip 192.168.0.1 "
        "call +81 (90) 1234-5678 done"
    ))]
    df = spark.createDataFrame(rows)
    out = scrub_transform(ctx(spark, {"fields": ["text"]}, [df]))[""]
    t = out.collect()[0]["text"]
    for token in ("<EMAIL>", "<URL>", "<SSN>", "<CC>", "<IP>", "<PHONE>"):
        assert token in t, (token, t)
    assert "@" not in t and "192.168" not in t and "4111" not in t
    # custom rule + kind subset
    out2 = scrub_transform(
        ctx(spark, {"fields": ["text"], "kinds": ["email"],
                    "rules": [{"pattern": "done", "replacement": "<END>"}]}, [df])
    )[""]
    t2 = out2.collect()[0]["text"]
    assert "<EMAIL>" in t2 and "<END>" in t2 and "192.168.0.1" in t2


def test_pack_sequences_budget_semantics(spark):
    """Offset packing: docs fill packs in key order per bucket; every doc
    starts at offset = cumulative tokens before it, pack overflows by
    less than one doc, assignment is deterministic and repartition-proof."""
    from pipeline_spark.operators.pack import pack_transform

    rows = [Row(doc_id=i, text=" ".join(["w"] * (10 + i % 7))) for i in range(200)]
    df = spark.createDataFrame(rows)
    params = {"keyField": "doc_id", "tokenBudget": 50, "buckets": 4}
    out = pack_transform(ctx(spark, params, [df]))[""].collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for bucket_rows in by_bucket.values():
        bucket_rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in bucket_rows:
            assert r["pack_id"] == cum // 50
            assert r["pack_offset"] == cum % 50
            cum += r["n_tokens"]
    # deterministic under repartition
    out2 = pack_transform(ctx(spark, params, [df.repartition(13)]))[""].collect()
    assert {(r["doc_id"], r["pack_id"]) for r in out} == {
        (r["doc_id"], r["pack_id"]) for r in out2
    }


def test_shuffle_deterministic_order(spark):
    from pipeline_spark.operators.sample import sample_transform

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id: long, text: string"
    )
    params = {"method": "shuffle", "keyField": "doc_id", "salt": "s1",
              "partitions": 4}
    out = sample_transform(ctx(spark, params, [df]))[""]
    # order across partitions-in-index-order must equal global hash order
    collected = out.collect()
    keys = [r["shuffle_key"] for r in collected]
    assert keys == sorted(keys)
    assert sorted(r["doc_id"] for r in collected) == list(range(200))
    # same salt → identical permutation even from a different partitioning
    again = sample_transform(ctx(spark, params, [df.repartition(13)]))[""]
    assert [r["doc_id"] for r in again.collect()] == [r["doc_id"] for r in collected]
    # different salt → different permutation
    other = sample_transform(
        ctx(spark, {**params, "salt": "s2"}, [df])
    )[""]
    assert [r["doc_id"] for r in other.collect()] != [r["doc_id"] for r in collected]


def test_classifier_score_matches_reference_math(spark):
    import hashlib
    import math

    from pipeline_spark.operators.textstats import textstats_transform

    weights = [((i + 1) * 7919 % 100) / 100.0 - 0.5 for i in range(256)]
    df = spark.createDataFrame([("alpha",), ("alpha beta",), (None,)], "text: string")
    out = textstats_transform(
        ctx(
            spark,
            {"field": "text", "ops": ["classifier"], "weights": weights, "bias": 0.25},
            [df],
        )
    )[""]
    got = [r["clf_score"] for r in out.collect()]

    def feat(tok):
        h = hashlib.md5(tok.encode()).hexdigest()
        return int(h[0], 16) * 16 + int(h[1], 16)

    def score(toks):
        m = sum(weights[feat(t)] for t in toks) / max(len(toks), 1)
        return round(1.0 / (1.0 + math.exp(-(0.25 + m))), 6)

    assert got[0] == score(["alpha"])
    assert got[1] == score(["alpha", "beta"])
    assert got[2] == score([""])  # null text → one empty token, like split('')

    with pytest.raises(ValueError, match="256"):
        textstats_transform(
            ctx(spark, {"ops": ["classifier"], "weights": [0.1]}, [df])
        )[""]


def test_gopher_rules(spark):
    """Published Gopher quality thresholds as pure Columns: short docs,
    symbol-heavy docs, and non-alphabetic docs fail their rules; a normal
    paragraph passes all."""
    from pipeline_spark.operators.textstats import textstats_transform

    good = " ".join(f"word{i} another thing entirely here" for i in range(20))
    rows = [
        Row(doc_id=1, text=good),
        Row(doc_id=2, text="too short"),
        Row(doc_id=3, text=" ".join(["####"] * 60)),     # symbols + no alpha
        Row(doc_id=4, text=" ".join(["1234567"] * 60)),  # numeric words
    ]
    df = spark.createDataFrame(rows)
    out = textstats_transform(
        ctx(spark, {"field": "text", "ops": ["gopher"],
                    "gopherBreakdown": True}, [df])
    )[""]
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["gopher_pass"] is True
    assert got[2]["rule_word_count"] is False and got[2]["gopher_pass"] is False
    assert got[3]["rule_symbol_ratio"] is False and got[3]["rule_alpha_words"] is False
    assert got[4]["rule_alpha_words"] is False and got[4]["gopher_pass"] is False
    # thresholds overridable per config
    relaxed = textstats_transform(
        ctx(spark, {"field": "text", "ops": ["gopher"],
                    "gopher": {"minWords": 2}}, [df])
    )[""]
    r2 = {r["doc_id"]: r["gopher_pass"] for r in relaxed.collect()}
    assert r2[2] is True  # "too short" passes with minWords=2


def test_gopher_symbol_match_counting_and_nulls(spark):
    """Review fixes: '...' counts as ONE symbol (match-counted, not
    char-counted) and null text yields a real False verdict, not NULL."""
    base = " ".join(f"plain word number {i}" for i in range(25))  # 100 words
    rows = [
        Row(doc_id=1, text=base + " " + "also..." * 0 + "x... y... z... w..."),
        Row(doc_id=2, text=None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pipeline_spark.operators.textstats import textstats_transform

    out = textstats_transform(
        ctx(spark, {"field": "text", "ops": ["gopher"],
                    "gopherBreakdown": True}, [df])
    )[""]
    got = {r["doc_id"]: r for r in out.collect()}
    # 4 ellipses / 104 words = 0.038 <= 0.1 → passes under match counting
    # (char counting would give 12/104 = 0.115 → fail)
    assert got[1]["rule_symbol_ratio"] is True
    assert got[2]["gopher_pass"] is False  # null text → False, never NULL
    assert got[2]["rule_word_count"] is False


def test_learner_validation_and_collision(spark):
    """Review fixes: missing feature columns fail fast at the driver;
    a step name colliding with an input column overwrites it."""
    import datetime as dt

    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    df = spark.createDataFrame(
        [("k", float(i), 2.0 * i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i))
         for i in range(30)],
        "k string, x double, y double, ts timestamp",
    )
    with pytest.raises(Exception, match="PRIOR processing stage"):
        run_pipeline(spark, parse_config("""
transforms:
  - name: proc
    module: processing
    inputs: [ev]
    timestampAttribute: ts
    parameters:
      groupFields: [k]
      steps:
        - {name: p, op: linear_regression, featureFields: [nope],
           targetFields: [y], horizon: 1, trainSize: 5}
"""), inputs={"ev": df})
    # step named like an existing column: replaced, not duplicated
    outs = run_pipeline(spark, parse_config("""
transforms:
  - name: proc
    module: processing
    inputs: [ev]
    timestampAttribute: ts
    parameters:
      groupFields: [k]
      steps:
        - {name: y, op: linear_regression, featureFields: [x],
           targetFields: [y], horizon: 1, trainSize: 5}
      remainFields: [x]
"""), inputs={"ev": df})
    cols = outs["proc"].columns
    assert cols.count("y") == 1
    rows = [r for r in outs["proc"].collect() if r["y"] is not None]
    assert rows  # predictions landed in the overwritten column


def test_sample_mix_rejects_phantom_weight_keys(spark):
    from pipeline_spark.operators.sample import sample_transform

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="unknown input"):
        sample_transform(_mix_ctx(
            spark,
            {"method": "mix", "keyField": "doc_id",
             "weights": {"a": 0.5, "b": 0.25, "web": 0.25}},
            [df, df], ["a", "b"],
        ))


# --- BPE training ------------------------------------------------------------


def test_bpe_train_merges_hand_computed():
    from pipeline_spark.operators.tokenize import bpe_train_merges

    # classic Sennrich toy: {"low":5, "lower":2, "newest":6, "widest":3}
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train_merges(wf, 4)
    # pair counts round 1: ('e','s')=9, ('s','t')=9, ('w','e')=8(newest)... 
    # ties at 9 break lexicographically: ('e','s') first, then ('es','t')
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_bpe_train_end_of_word_marker():
    from pipeline_spark.operators.tokenize import bpe_train_merges

    merges = bpe_train_merges([("aa", 10)], 2, end_of_word="</w>")
    assert merges[0] == ("a", "a</w>")
    assert len(merges) == 1  # single symbol left, nothing more to merge


def test_bpe_train_roundtrip_with_apply(spark):
    from pipeline_spark.operators.tokenize import (
        bpe_tokens_udf,
        bpe_train_merges,
        bpe_word_freq,
    )
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(text="the cat sat on the mat"), Row(text="the cat ate the rat")] * 3
    )
    wf_rows = bpe_word_freq(docs, "text").collect()
    wf = [(r["word"], r["freq"]) for r in wf_rows]
    assert ("the", 12) == max(wf, key=lambda t: t[1])
    merges = bpe_train_merges(wf, 6)
    ranks = {m: i for i, m in enumerate(merges)}
    toks = bpe_tokens_udf(ranks, "")
    out = docs.select(toks(F.col("text")).alias("t")).first()["t"]
    # 'the' must have merged into a single token after 6 merges
    assert "the" in out


def test_bpe_train_module(spark):
    from pipeline_spark.operators.tokenize import bpe_train_transform
    from pipeline_spark.registry import ModuleContext
    from pyspark.sql import Row

    docs = spark.createDataFrame([Row(text="ab ab ab cd")])
    out = bpe_train_transform(
        ModuleContext(
            spark=spark, name="b", params={"numMerges": 2}, inputs=[docs],
            input_names=["in"], side_inputs={},
        )
    )[""]
    rows = out.collect()
    assert [r["merged"] for r in rows] == ["ab", "cd"]
    assert rows[0]["rank"] == 0 and rows[0]["left"] == "a"


def test_bpe_word_freq_cap_deterministic(spark):
    from pipeline_spark.operators.tokenize import bpe_word_freq
    from pyspark.sql import Row

    docs = spark.createDataFrame([Row(text="z y x w v u t s r q p o")] * 2)
    top = bpe_word_freq(docs, "text", max_words=5).collect()
    # all freqs tie at 2 — the cap keeps the lexicographically smallest
    assert [r["word"] for r in top] == ["o", "p", "q", "r", "s"]


def test_pq_topk_exact_on_codeword_aligned_data(spark):
    """PQ/ADC (r8): when every subvector IS one of the trained codewords
    (k-means over identical points converges to the points), the
    asymmetric distance equals the true squared L2, so PQ top-k equals
    exact L2 top-k.  On noisy data, recall@k against the exact ranking
    must stay high — the compression/recall trade PQ exists for."""
    import numpy as np

    # 4 distinct patterns per 8-dim subspace, 2 subspaces → 16 possible
    # vectors; every subvector is exactly representable
    rng = np.random.default_rng(7)
    pat = rng.standard_normal((4, 8)) * 5
    rows = []
    for i in range(64):
        v = np.concatenate([pat[i % 4], pat[(i // 4) % 4]])
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    corpus = spark.createDataFrame(rows)
    queries = corpus.filter("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )

    def run_sim(method, **extra):
        params = {"method": method, "k": 8, "idField": "vec_id",
                  "vectorField": "embedding", **extra}
        return similarity_transform(
            ctx(spark, params, [corpus], side={"q": queries})
        )[""]

    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"])
        for r in run_sim(
            "pq", m=2, codebookSize=4, sampleSize=64, kmeansIters=10,
        ).collect()
    }
    # exact squared-L2 ranking computed directly
    mat = np.array([r.embedding for r in rows])
    for qid in (0, 1):
        d2 = ((mat - mat[qid]) ** 2).sum(1)
        order = np.lexsort((np.arange(len(mat)), d2))
        for rank in range(1, 9):
            nid, adc = got[(qid, rank)]
            # ADC distance must EQUAL the true distance on aligned data
            assert abs(adc - d2[nid]) < 1e-9
        assert got[(qid, 1)][0] == qid  # self is nearest


def test_ivfpq_matches_pq_on_clustered_aligned_data(spark):
    """IVF-PQ (r8): exhaustive probing + codeword-aligned subvectors →
    identical results to exact L2; partial probing on clustered data
    still finds the planted neighbors."""
    import numpy as np

    rng = np.random.default_rng(13)
    pat = rng.standard_normal((4, 8)) * 5
    rows = []
    for i in range(64):
        v = np.concatenate([pat[i % 4], pat[(i // 4) % 4]])
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    corpus = spark.createDataFrame(rows)
    queries = corpus.filter("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )

    def run_sim(method, **extra):
        params = {"method": method, "k": 6, "idField": "vec_id",
                  "vectorField": "embedding", **extra}
        return {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in similarity_transform(
                ctx(spark, params, [corpus], side={"q": queries})
            )[""].collect()
        }

    full = run_sim("ivfpq", cells=4, nprobe=4, m=2, codebookSize=4,
                   sampleSize=64, kmeansIters=10)
    mat = np.array([r.embedding for r in rows])
    for qid in (0, 1):
        d2 = ((mat - mat[qid]) ** 2).sum(1)
        order = np.lexsort((np.arange(len(mat)), d2))
        assert [full[(qid, r)] for r in range(1, 7)] == [
            int(x) for x in order[:6]
        ]
    assert full[(0, 1)] == 0 and full[(1, 1)] == 1


def test_pq_topk_ragged_codebooks(spark):
    """PQ/ADC with a low-cardinality subspace (r9, ADVICE): one subspace
    trains fewer centroids than the other, so the per-subspace LUT rows
    have unequal length — the inf-padded rectangular LUT must still give
    exact ADC on aligned data (np.stack over ragged rows used to crash)."""
    import numpy as np

    rng = np.random.default_rng(3)
    pat = rng.standard_normal((8, 4)) * 5
    rows = []
    for i in range(32):
        # first subspace: 8 distinct patterns; second: only 2 → ragged k
        v = np.concatenate([pat[i % 8], pat[i % 2]])
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    corpus = spark.createDataFrame(rows)
    queries = corpus.filter("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )

    def run_sim(method, **extra):
        params = {"method": method, "k": 6, "idField": "vec_id",
                  "vectorField": "embedding", **extra}
        return similarity_transform(
            ctx(spark, params, [corpus], side={"q": queries})
        )[""]

    mat = np.array([r.embedding for r in rows])
    for method, extra in (
        ("pq", {}),
        ("ivfpq", {"cells": 2, "nprobe": 2}),
    ):
        got = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in run_sim(
                method, m=2, codebookSize=8, sampleSize=32,
                kmeansIters=10, **extra,
            ).collect()
        }
        for qid in (0, 1):
            d2 = ((mat - mat[qid]) ** 2).sum(1)
            order = np.lexsort((np.arange(len(mat)), d2))
            assert [got[(qid, r)] for r in range(1, 7)] == [
                int(x) for x in order[:6]
            ], method
