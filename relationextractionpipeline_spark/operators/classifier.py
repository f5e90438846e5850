"""Hashed-feature logistic-regression quality classifier — the
fastText-style document scorer modern curation pipelines train on a small
labeled seed set and sweep over the whole corpus (quality filtering as in
FineWeb-Edu / DCLM: score every document, keep a threshold or quantile
band).

Two halves, deliberately separable:

* :func:`train_quality_classifier` — full-batch gradient descent on
  L1-normalized hashed n-gram counts, run AS A SPARK JOB: the per-doc
  feature table stays distributed and each iteration is two shuffles of
  that table (margins keyed by doc, gradients keyed by bucket); only the
  dimension-sized gradient vector (``n_buckets`` rows) is ever collected.
  The model (weights + bias) is driver-sized by construction, like the
  IVF centroids and PQ codebooks (operators/similarity.py).
* :func:`score_quality` — one pass over any corpus with a broadcast
  weight table; featurization is the corpus-wide md5 primitive
  (``sampling.hash_bucket``), so scoring replays relationally in a SQL
  oracle given the materialized weights.

Feature/math contract (the sequential replica in
``sources/oracle_mat.classifier_weights`` implements the SAME spec, so
the two trainings agree to float-sum-order drift, absorbed by the
corpus-wide round-6 score contract):

* tokens  = lowercased whitespace split of trimmed text (empty → [])
* grams   = unigrams + bigrams, hashed into ``n_buckets`` buckets with
  ``hash_bucket(gram, salt)``
* x[d,b]  = m[d,b] / n[d]   (per-doc L1-normalized bucket counts;
  docs with zero grams contribute margin = bias only)
* init w = 0, bias = 0; per iteration over ALL N docs:
      p[d]    = sigmoid(bias + w . x[d])
      r[d]    = p[d] - y[d]
      grad_w  = (sum_d r[d] * x[d]) / N + l2 * w
      grad_b  = (sum_d r[d]) / N
      w      -= lr * grad_w ;  bias -= lr * grad_b

No reference analog (the reference stops at triple emission,
de_pipeline/pipeline.py:69-77); beyond-reference curation surface.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .sampling import hash_bucket


def hashed_gram_features(
    docs: DataFrame,
    n_buckets: int,
    salt: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, bucket) gram multiplicities ``m`` plus the per-doc total
    ``n`` — the shared featurization of the classifier and DSIR: unigrams
    + bigrams of lowercased whitespace tokens, md5-hashed (SQL-replicable).
    Occurrences collapse to multiplicities with map-side combine before
    the per-doc total joins back (keyed on the doc id, the natural key of
    everything downstream).  Docs with zero grams yield zero rows."""
    from .textindex import kgram_join, tokens_lower

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = tokens_lower(F.col(text_col))
    occ = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(F.concat(w, kgram_join(w, 2))).alias("_gram"),
        )
        .select(
            "_id",
            F.pmod(
                hash_bucket(F.col("_gram"), salt), F.lit(int(n_buckets))
            ).alias("bucket"),
        )
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    totals = occ.groupBy("_id").agg(F.sum("m").alias("n"))
    return occ.join(totals, "_id")


def train_quality_classifier(
    docs: DataFrame,
    label_flag: Column,
    n_buckets: int = 256,
    n_iter: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
    salt: str = "qcls",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Tuple[pd.DataFrame, float]:
    """Train by full-batch GD; returns ``(weights, bias)`` where
    ``weights`` is a pandas frame (bucket, weight) of ``n_buckets`` rows.

    Distributed shape: the feature table is built ONCE and persisted;
    each iteration is (a) a broadcast join of the current weights onto it
    + a doc-keyed aggregate for the margins, (b) a doc-keyed join of the
    residuals back + a bucket-keyed aggregate for the gradient — two
    data-sized shuffles per iteration, which is the floor for synchronous
    full-batch GD (the margins need every bucket of a doc, the gradient
    every doc of a bucket).  Only ``n_buckets`` gradient rows and one
    bias scalar cross to the driver per iteration; document features
    never do.  Iteration count is a constant, not data-scaled, so the
    100 TB cost is n_iter passes over the (doc, bucket) table.
    """
    spark = docs.sparkSession
    base = docs.select(
        F.col(id_col).alias("_id"),
        label_flag.cast("double").alias("_y"),
    )
    n_docs = base.count()
    if n_docs == 0:
        raise ValueError("cannot train on an empty corpus")
    feats = hashed_gram_features(
        docs, n_buckets, salt, id_col=id_col, text_col=text_col
    ).persist()
    try:
        feats.count()  # materialize once; n_iter iterations reuse it
        w = np.zeros(int(n_buckets), dtype="float64")
        bias = 0.0
        for _ in range(int(n_iter)):
            wdf = spark.createDataFrame(
                pd.DataFrame(
                    {"bucket": np.arange(len(w), dtype="int64"), "_w": w}
                )
            )
            dots = (
                feats.join(F.broadcast(wdf), "bucket")
                .groupBy("_id")
                .agg(F.sum(F.col("m") * F.col("_w") / F.col("n")).alias("_dot"))
            )
            resid = base.join(dots, "_id", "left").select(
                "_id",
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(-(F.lit(bias) + F.coalesce("_dot", F.lit(0.0))))
                    )
                    - F.col("_y")
                ).alias("_r"),
            )
            # doc-sized; persisted so the bucket gradient and the bias
            # gradient don't re-run the margin pipeline twice
            resid = resid.persist()
            try:
                grad = (
                    feats.join(resid, "_id")
                    .groupBy("bucket")
                    .agg(
                        F.sum(F.col("_r") * F.col("m") / F.col("n")).alias("_g")
                    )
                )
                # one action per iteration: the bias gradient rides along
                # as the bucket = -1 row
                rows = grad.unionByName(
                    resid.agg(
                        F.lit(-1).cast("int").alias("bucket"),
                        F.sum("_r").alias("_g"),
                    )
                ).collect()
            finally:
                resid.unpersist()
            gb = 0.0
            gw = np.zeros_like(w)
            for r in rows:
                if int(r["bucket"]) < 0:
                    gb = float(r["_g"] or 0.0)
                else:
                    gw[int(r["bucket"])] = float(r["_g"])
            gw /= n_docs
            if l2:
                gw += float(l2) * w
            w -= float(lr) * gw
            bias -= float(lr) * (float(gb) / n_docs)
    finally:
        feats.unpersist()
    return (
        pd.DataFrame({"bucket": np.arange(len(w), dtype="int64"), "weight": w}),
        float(bias),
    )


def score_quality(
    docs: DataFrame,
    weights: pd.DataFrame,
    bias: float,
    n_buckets: int | None = None,
    salt: str = "qcls",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with a trained model: one featurization pass,
    a broadcast join of the dimension-sized weight table, a doc-keyed
    aggregate, and a left join back so zero-gram docs score
    sigmoid(bias).  Output: (id, n_grams, qc_score round-6, qc_label).

    The scoring half is the part a 100 TB sweep actually runs (training
    happens once on a seed sample); it is a single pass with no
    driver-sized state beyond the weight vector.
    """
    spark = docs.sparkSession
    b = int(n_buckets) if n_buckets is not None else len(weights)
    feats = hashed_gram_features(
        docs, b, salt, id_col=id_col, text_col=text_col
    )
    wdf = spark.createDataFrame(weights[["bucket", "weight"]])
    dots = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("_id")
        .agg(
            F.sum("m").alias("n_grams"),
            F.sum(F.col("m") * F.col("weight") / F.col("n")).alias("_dot"),
        )
    )
    score = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.lit(float(bias)) + F.coalesce("_dot", F.lit(0.0))))
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(dots, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(score, 6).alias("qc_score"),
            (score >= F.lit(float(threshold))).alias("qc_label"),
        )
    )
