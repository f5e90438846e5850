#!/usr/bin/env python
"""Generate an sf1.0-shaped measurement dataset (optimization round, guide §1).

The driver's round-end MEASUREMENT escalated to sf=1.0 (BENCH_r05.json), but
the sandbox only ships sf{0.001,0.01,0.1}.  This tool synthesizes a dataset
with the same schemas, the same scaling laws (rows-per-sf ratios observed
across the three shipped scales), and distributions matched to the shipped
data, so optimizations can be measured at the scale the driver grades:

* documents  50,000 — word-soup over the observed 31-word vocabulary,
  empirical word-count bootstrap, lang/source proportions as observed,
  near-dup rate calibrated to sf0.1 (256 verified minhash pairs / 5,000 docs
  at est-jaccard >= 0.5 -> ~0.05 pairs/doc, planted as 1-2-word mutations).
* embeddings 20,000 — dim-64 unit vectors (the shipped vectors have no label
  cluster structure: mean cos-to-centroid 0.07), labels ~ uniform(10).
* events  1,000,000 — 15,000 users (10x the sf0.1 1,500), exponential(50)
  values, 30-day timestamp window, props {"k": 0..99}.
* TPC-H-ish tables — 10 copies of sf0.1 with consistently shifted keys
  (customer +15000/copy, orders +150000, part +20000, supplier +1000;
  lineitem/orders foreign keys follow), nation/region verbatim.

NOT for correctness gates (the DuckDB oracles run on driver data at
sf0.001/0.01) and never read by bench.py unless SPARK_GRAFT_SF_DIR points
here explicitly.  Deterministic (numpy PCG64 seed 20260822).

Usage: python tools/gen_sfbig.py [out_dir]   (default /tmp/testdata/sf1.0)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 20260822


def gen_documents(rng: np.random.Generator, n_docs: int) -> pd.DataFrame:
    src = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    vocab = sorted(set(" ".join(src.text).split()))
    wc_pool = src.text.str.split().str.len().to_numpy()
    lang_vals, lang_counts = np.unique(src.lang, return_counts=True)
    lang_p = lang_counts / lang_counts.sum()

    vocab_arr = np.array(vocab)
    docs: list[list[str]] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.045:
            j = i - 1 - int(rng.integers(0, min(i, 50)))
            words = list(docs[j])
            for _ in range(int(rng.integers(0, 3))):
                words[int(rng.integers(len(words)))] = vocab[
                    int(rng.integers(len(vocab)))
                ]
        else:
            n = int(wc_pool[rng.integers(len(wc_pool))])
            words = list(vocab_arr[rng.integers(0, len(vocab), n)])
        docs.append(words)
    texts = [" ".join(w) for w in docs]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(lang_vals, size=n_docs, p=lang_p),
            "source": [f"src{i % 20}" for i in range(n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    v = rng.standard_normal((n, 64))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n).astype(np.int32)),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pd.DataFrame:
    t0 = pd.Timestamp("2024-01-01").value // 1000
    t1 = pd.Timestamp("2024-01-31").value // 1000
    ts = rng.integers(t0, t1, n)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]"),
            "user_id": rng.integers(0, n_users, n),
            "event_type": rng.choice(
                ["view", "click", "purchase", "signup", "error"], size=n
            ),
            "value": np.round(rng.exponential(50.0, n), 2),
            "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)],
        }
    )


def replicate(name: str, copies: int, shifts: dict[str, int]) -> pd.DataFrame:
    src = pq.read_table(os.path.join(SRC, f"{name}.parquet")).to_pandas()
    out = []
    for c in range(copies):
        d = src.copy()
        for col, base in shifts.items():
            d[col] = d[col] + c * base
        out.append(d)
    return pd.concat(out, ignore_index=True)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1.0"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    def write(name: str, obj) -> None:
        t = obj if isinstance(obj, pa.Table) else pa.Table.from_pandas(
            obj, preserve_index=False
        )
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(name, t.num_rows)

    write("documents", gen_documents(rng, 50_000))
    write("embeddings", gen_embeddings(rng, 20_000))
    write("events", gen_events(rng, 1_000_000, 15_000))
    write(
        "lineitem",
        replicate(
            "lineitem", 10,
            {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
        ),
    )
    write(
        "orders",
        replicate("orders", 10, {"o_orderkey": 150_000, "o_custkey": 15_000}),
    )
    write("customer", replicate("customer", 10, {"c_custkey": 15_000}))
    write("part", replicate("part", 10, {"p_partkey": 20_000}))
    write("supplier", replicate("supplier", 10, {"s_suppkey": 1_000}))
    for name in ("nation", "region"):
        write(name, pq.read_table(os.path.join(SRC, f"{name}.parquet")).to_pandas())
    open(os.path.join(out_dir, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
