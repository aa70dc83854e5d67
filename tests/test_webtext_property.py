"""Property checks: the urls op vs Python's urllib.parse (independent
reference), and the chunk op vs a direct Python chunker.

Each hypothesis example generates a BATCH of inputs and runs ONE Spark
job over the batch, keeping job-count (the slow part) independent of
example count.
"""

import random
import string

from pyspark.sql import Row

from pipeline_spark.operators.chunk import chunk_transform
from pipeline_spark.operators.urls import urls_transform
from pipeline_spark.registry import ModuleContext

# deterministic seeds; hypothesis isn't needed for seeded batch fuzzing
# and one Spark job per seed keeps runtime bounded
SEEDS = [3, 17, 91]


def _rand_url(rng: random.Random) -> str:
    scheme = rng.choice(["http", "https", "HTTP", "Ftp"])
    labels = [
        "".join(rng.choices(string.ascii_letters + string.digits, k=rng.randint(1, 8)))
        for _ in range(rng.randint(2, 4))
    ]
    host = ".".join(labels)
    userinfo = rng.choice(["", "user@", "u:p@"])
    port = rng.choice(["", ":80", ":443", ":8080"])
    path = "".join(
        "/" + "".join(rng.choices(string.ascii_lowercase + string.digits, k=rng.randint(1, 6)))
        for _ in range(rng.randint(0, 3))
    )
    query = rng.choice(["", "?a=1", "?a=1&b=2", "?utm_source=x&a=1"])
    frag = rng.choice(["", "#frag", "#sec?notaquery"])
    return f"{scheme}://{userinfo}{host}{port}{path}{query}{frag}"


def test_urls_agree_with_urllib(spark):
    from urllib.parse import urlsplit

    for seed in SEEDS:
        rng = random.Random(seed)
        urls = [_rand_url(rng) for _ in range(40)]
        df = spark.createDataFrame([Row(i=i, url=u) for i, u in enumerate(urls)])
        out = urls_transform(
            ModuleContext(
                spark=spark, name="u", params={"field": "url"},
                inputs=[df], input_names=["in"], side_inputs={},
            )
        )[""]
        rows = {r["i"]: r for r in out.collect()}
        for i, u in enumerate(urls):
            ref = urlsplit(u)
            row = rows[i]
            assert row["url_scheme"] == ref.scheme.lower(), u
            assert row["url_host"] == (ref.hostname or ""), u
            expected_path = ref.path if ref.path else "/"
            assert row["url_path"] == expected_path, u
            # normalized never carries a fragment and never carries
            # tracking params
            assert "#" not in (row["url_normalized"] or ""), u
            assert "utm_" not in (row["url_normalized"] or ""), u


def _py_chunks(text: str, size: int, overlap: int):
    words = [w for w in (text or "").split() if w]
    step = size - overlap
    out = []
    for cid, s in enumerate(range(0, len(words), step)):
        w = words[s : s + size]
        out.append((cid, " ".join(w), len(w)))
    return out


def test_chunk_agrees_with_python_reference(spark):
    for seed in SEEDS:
        rng = random.Random(seed)
        docs = []
        for d in range(30):
            n = rng.randint(0, 40)
            docs.append(
                Row(doc=d, text=" ".join(
                    "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 5)))
                    for _ in range(n)
                ))
            )
        size = rng.randint(2, 9)
        overlap = rng.randint(0, size - 1)
        df = spark.createDataFrame(docs)
        out = chunk_transform(
            ModuleContext(
                spark=spark, name="c",
                params={"size": size, "overlap": overlap},
                inputs=[df], input_names=["in"], side_inputs={},
            )
        )[""]
        got = {}
        for r in out.collect():
            got.setdefault(r["doc"], []).append(
                (r["chunk_id"], r["chunk_text"], r["n_units"])
            )
        for row in docs:
            expect = _py_chunks(row.text, size, overlap)
            assert sorted(got.get(row.doc, [])) == expect, (
                row.doc, size, overlap,
            )


def test_ebml_builder_parse_roundtrip_fuzz():
    from pipeline_spark.functions.mediacontainers import (
        build_matroska, parse_matroska,
    )

    for seed in SEEDS:
        rng = random.Random(seed)
        for _ in range(25):
            dur = rng.randint(1, 10000) / 100.0
            w, h = rng.randint(16, 4096), rng.randint(16, 2160)
            n_blocks = rng.randint(0, 20)
            keys = [rng.random() < 0.3 for _ in range(n_blocks)]
            data = build_matroska(
                doctype=rng.choice(["webm", "matroska"]),
                duration_s=dur,
                video={"codec": "V_VP9", "width": w, "height": h},
                cluster_blocks=[(1, k) for k in keys],
            )
            meta = parse_matroska(data)
            (tr,) = meta["tracks"]
            assert meta["duration_s"] == round(dur, 10) or abs(
                meta["duration_s"] - dur
            ) < 1e-9
            assert (tr["width"], tr["height"]) == (w, h)
            assert tr["n_blocks"] == n_blocks
            assert tr["n_keyframes"] == sum(keys)


def test_mp3_builder_parse_roundtrip_fuzz():
    from pipeline_spark.functions.mediacontainers import build_mp3, parse_mp3

    rates = [44100, 48000, 32000]
    kbps_choices = [32, 64, 96, 128, 192, 320]
    for seed in SEEDS:
        rng = random.Random(seed)
        for _ in range(20):
            rate = rng.choice(rates)
            kbps = rng.choice(kbps_choices)
            n = rng.randint(1, 60)
            meta = parse_mp3(build_mp3(n_frames=n, kbps=kbps, rate=rate))
            assert meta["n_frames"] == n
            assert meta["sample_rate"] == rate
            assert meta["bitrate_kbps"] == kbps
