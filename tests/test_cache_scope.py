"""The storage-leak contract (operators/cache.py): operators register
every persist/localCheckpoint, and one ``release_all(checkpoints=True)``
returns executor storage to its prior state — the guarantee a long-lived
service session relies on between request batches (bench.py and
tools/check_parity.py call it between queries)."""

import numpy as np
from pyspark.sql import functions as F

from relationextractionpipeline_spark.operators import (
    cache,
    canonicalize,
    dedup,
    similarity,
)


def _n_persistent(spark):
    return len(cache._persistent_rdd_ids(spark.sparkContext))


def test_release_all_returns_storage_to_baseline(spark):
    # start from a clean slate (earlier tests in the shared session may
    # have materialized results they already released)
    cache.release_all(checkpoints=True)
    spark.catalog.clearCache()
    before = _n_persistent(spark)

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 4} jumps over the lazy dog wordy "
             f"filler text number {i % 4} for shingles")
         for i in range(24)],
        "doc_id long, text string",
    )
    rng = np.random.RandomState(7)
    emb = spark.createDataFrame(
        [(i, rng.rand(64).tolist()) for i in range(60)],
        "vec_id long, embedding array<double>",
    )

    # three persisting operator families: sketch-backed dedup,
    # IVF similarity, and the checkpointing connected-components
    dedup.near_dup_pairs_minhash(docs, n_hashes=8, bands=4).count()
    qs = emb.where(F.col("vec_id") % 20 == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    similarity.ivf_topk(emb, qs, k=3, n_clusters=4, nprobe=2).count()
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    canonicalize.connected_components(pairs).count()

    assert _n_persistent(spark) > before  # the ops really did persist

    freed = cache.release_all(checkpoints=True)
    assert freed > 0
    assert _n_persistent(spark) == before
