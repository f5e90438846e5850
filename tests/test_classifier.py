"""Hashed-feature logistic-regression quality classifier
(operators/classifier.py): separation on a separable corpus, the
zero-gram contract, distributed-vs-sequential training equivalence, and
partition invariance of the round-6 scores."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from relationextractionpipeline_spark.operators import classifier


def _docs(spark):
    rows = [
        # positives share a distinctive vocabulary
        (0, "alpha beta gamma alpha delta", 1),
        (1, "beta gamma alpha beta epsilon", 1),
        (2, "gamma alpha delta beta gamma", 1),
        (3, "alpha epsilon beta delta gamma", 1),
        # negatives use a disjoint one
        (4, "zork quux fnord zork blarg", 0),
        (5, "quux blarg zork fnord quux", 0),
        (6, "fnord zork blarg quux fnord", 0),
        # empty doc: no grams, margin = bias only
        (7, "", 0),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_classifier_separates_and_handles_empty(spark):
    d = _docs(spark)
    w, b = classifier.train_quality_classifier(
        d, F.col("y") == 1, n_buckets=512, n_iter=40, lr=2.0
    )
    assert len(w) == 512
    out = {r["doc_id"]: r for r in classifier.score_quality(d, w, b).collect()}
    assert len(out) == 8
    pos = [out[i]["qc_score"] for i in range(4)]
    neg = [out[i]["qc_score"] for i in range(4, 7)]
    assert min(pos) > max(neg)
    assert all(out[i]["qc_label"] for i in range(4))
    assert not any(out[i]["qc_label"] for i in range(4, 7))
    # 5 words -> 9 gram occurrences
    assert out[0]["n_grams"] == 9
    # empty doc scores sigmoid(bias) exactly
    e = out[7]
    assert e["n_grams"] == 0
    assert abs(e["qc_score"] - round(1.0 / (1.0 + np.exp(-b)), 6)) < 1e-9


def test_classifier_matches_sequential_replica(spark):
    """Distributed GD equals a sequential numpy run of the same math
    contract up to float-sum-order drift (~1e-12 after 20 iterations)."""
    d = _docs(spark)
    w, b = classifier.train_quality_classifier(
        d, F.col("y") == 1, n_buckets=64, n_iter=20, lr=1.0
    )

    pdf = d.toPandas().sort_values("doc_id")
    occ = {}
    for did, text in zip(pdf["doc_id"], pdf["text"]):
        toks = text.lower().strip().split() if text.strip() else []
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for g in grams:
            import hashlib

            h = int(hashlib.md5(f"{g}:qcls".encode()).hexdigest()[:8], 16)
            key = (did, h % 64)
            occ[key] = occ.get(key, 0) + 1
    did = np.array([k[0] for k in occ])
    bkt = np.array([k[1] for k in occ])
    m = np.array(list(occ.values()), dtype="float64")
    n_docs = len(pdf)
    n_per = np.zeros(n_docs)
    np.add.at(n_per, did, m)
    x = m / n_per[did]
    y = pdf["y"].to_numpy().astype("float64")
    ws = np.zeros(64)
    bs = 0.0
    for _ in range(20):
        dot = np.zeros(n_docs)
        np.add.at(dot, did, ws[bkt] * x)
        r = 1.0 / (1.0 + np.exp(-(bs + dot))) - y
        gw = np.zeros(64)
        np.add.at(gw, bkt, r[did] * x)
        ws -= gw / n_docs
        bs -= r.sum() / n_docs
    got = w.sort_values("bucket")["weight"].to_numpy()
    assert np.allclose(got, ws, atol=1e-9)
    assert abs(b - bs) < 1e-9


def test_classifier_scores_partition_invariant(spark):
    rows = [
        (i, f"tok{i % 5} alpha tok{i % 3} beta gamma", i % 2) for i in range(30)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, y int")
    outs = []
    for parts in (1, 7):
        w, b = classifier.train_quality_classifier(
            d.repartition(parts), F.col("y") == 1, n_buckets=32, n_iter=10
        )
        pdf = (
            classifier.score_quality(d.repartition(parts), w, b)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(pdf)
    pd.testing.assert_frame_equal(outs[0], outs[1])
