"""Generate a scaled-up benchmark dataset by replicating /root/testdata.

Produces ``.benchdata/sf<target>`` (gitignored) from an existing SF dir by
replicating each table K times with coherent key offsets, so joins still
resolve and per-key cardinalities stay realistic:

  * TPC-H-ish tables: every key column shifts by ``replica * (max_key+1)``
    consistently across tables (an order's lineitems follow it into the
    replica).
  * documents: every 4th word of a replica's text is rewritten to a
    replica-specific token — this destroys most 3-gram shingle overlap, so
    the near-dup structure (pairs per doc) stays comparable to the source
    instead of exploding quadratically with K identical copies.
  * embeddings: replicas get fresh seeded random vectors (same dim/norm
    profile); identical copies would put K×ANN-probe results in every
    bucket, measuring the data change rather than the engine.
  * events: ids/user_ids shift; timestamps keep their range (K× density —
    the realistic shape for a busier stream over the same wall-clock).
  * region/nation: dimension tables copied as-is.

Usage: python scripts/gen_sf_scale.py [--src /root/testdata/sf0.1] [--k 10]
         [--out .benchdata/sf1]
"""

from __future__ import annotations

import argparse
import hashlib
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEYED = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
}


def perturb_text(text: str, replica: int, doc_id: int) -> str:
    words = text.split()
    step = 4
    for i in range(replica % step, len(words), step):
        h = hashlib.md5(f"{replica}:{doc_id}:{i}".encode()).hexdigest()[:6]
        words[i] = f"w{h}"
    return " ".join(words)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata", "sf1"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    # key spans for coherent offsets
    span = {}
    for kind, (table, col) in {
        "order": ("orders", "o_orderkey"),
        "cust": ("customer", "c_custkey"),
        "part": ("part", "p_partkey"),
        "supp": ("supplier", "s_suppkey"),
    }.items():
        span[kind] = con.execute(
            f"SELECT max({col}) + 1 FROM '{args.src}/{table}.parquet'"
        ).fetchone()[0]

    for table in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{table}.parquet') TO "
            f"'{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )

    for table, keymap in KEYED.items():
        selects = []
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{args.src}/{table}.parquet'").fetchall()]
        for c in cols:
            if c in keymap:
                selects.append(f"{c} + r.r * {span[keymap[c]]} AS {c}")
            else:
                selects.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(selects)} FROM "
            f"'{args.src}/{table}.parquet', range({args.k}) r(r)) TO "
            f"'{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )

    n_events = con.execute(
        f"SELECT max(event_id) + 1, max(user_id) + 1 FROM '{args.src}/events.parquet'"
    ).fetchone()
    con.execute(
        f"COPY (SELECT event_id + r.r * {n_events[0]} AS event_id, ts, "
        f"user_id + r.r * {n_events[1]} AS user_id, event_type, value, props "
        f"FROM '{args.src}/events.parquet', range({args.k}) r(r)) TO "
        f"'{args.out}/events.parquet' (FORMAT PARQUET)"
    )

    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM '{args.src}/documents.parquet'"
    ).fetchall()
    n_docs = max(d[0] for d in docs) + 1
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for r in range(args.k):
        for doc_id, text, lang, source, n_chars in docs:
            t = text if r == 0 else perturb_text(text, r, doc_id)
            out["doc_id"].append(doc_id + r * n_docs)
            out["text"].append(t)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(t))
    pq.write_table(pa.table(out), f"{args.out}/documents.parquet")

    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM '{args.src}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    dim = len(emb[0][1])
    n_vec = max(e[0] for e in emb) + 1
    rng = np.random.default_rng(12345)
    ids, vecs, labels = [], [], []
    for r in range(args.k):
        for vec_id, v, label in emb:
            ids.append(vec_id + r * n_vec)
            if r == 0:
                vecs.append(np.asarray(v, dtype=np.float32))
            else:
                x = rng.standard_normal(dim).astype(np.float32)
                vecs.append(x / np.linalg.norm(x) * np.linalg.norm(v))
            labels.append(label)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }),
        f"{args.out}/embeddings.parquet",
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
