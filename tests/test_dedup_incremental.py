"""Incremental near-dup cluster maintenance: merged state must EQUAL the
one-shot batch clustering over the union at every split order, replays
must no-op, and the streaming wrapper must maintain the same tables."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from relationextractionpipeline_spark.operators import cache, dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    """sf0.001 documents + planted near-dup chains crossing the split
    boundary (variant ids land in the other half of the hash split)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    chain1 = docs.limit(3).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat("text", F.lit(" alpha")).alias("text"),
    )
    chain2 = docs.limit(3).select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        F.concat("text", F.lit(" alpha beta")).alias("text"),
    )
    return docs.unionByName(chain1).unionByName(chain2)


def _assign(df):
    return sorted(
        (int(r.doc_id), int(r.cluster_id)) for r in df.collect()
    )


PARAMS = {"jaccard_threshold": 0.6}


def _batch_assign(corpus):
    return _assign(
        dedup.near_dup_clusters(corpus, **PARAMS).select(
            "doc_id", "cluster_id"
        )
    )


def test_incremental_equals_batch_both_split_orders(spark, corpus):
    want = _batch_assign(corpus)
    for flip in (0, 1):
        a = corpus.where(F.pmod(F.col("doc_id"), 2) == flip)
        b = corpus.where(F.pmod(F.col("doc_id"), 2) == 1 - flip)
        state = dedup.doc_dedup_state(a, **PARAMS)
        state = dedup.merge_doc_batch(state, b, **PARAMS)
        assert _assign(state.assign) == want
    cache.release_all(checkpoints=True)


def test_merge_replay_is_idempotent(spark, corpus):
    a = corpus.where(F.col("doc_id") % 2 == 0)
    b = corpus.where(F.col("doc_id") % 2 == 1)
    state = dedup.doc_dedup_state(a, **PARAMS)
    state = dedup.merge_doc_batch(state, b, **PARAMS)
    once = _assign(state.assign)
    replayed = dedup.merge_doc_batch(state, b, **PARAMS)  # same batch again
    assert _assign(replayed.assign) == once
    assert replayed.sigs.count() == state.sigs.count()
    cache.release_all(checkpoints=True)


def test_streaming_neardup_matches_batch(spark, corpus, tmp_path):
    """Two drains over sharded input maintain (sigs, assign) tables equal
    to the one-shot batch clustering; the second drain resumes from the
    checkpoint and only merges the new shard."""
    from relationextractionpipeline_spark.sources.tableio import TableIO
    from relationextractionpipeline_spark.streaming import neardup

    pdf = corpus.toPandas()
    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir)
    pdf.iloc[0::2].to_parquet(os.path.join(in_dir, "part-0.parquet"),
                              index=False)
    pdf.iloc[1::2].to_parquet(os.path.join(in_dir, "part-1.parquet"),
                              index=False)

    io = TableIO(spark, str(tmp_path / "warehouse"))
    ck = str(tmp_path / "ck_neardup")
    schema = corpus.schema
    neardup.stream_neardup_docs(
        spark, in_dir, io, ck, schema, max_files_per_trigger=1, **PARAMS
    )
    # late-arriving shard → second drain merges incrementally
    extra = pdf.iloc[:0]  # no new rows; drain must be a no-op merge
    extra.to_parquet(os.path.join(in_dir, "part-2.parquet"), index=False)
    neardup.stream_neardup_docs(
        spark, in_dir, io, ck, schema, max_files_per_trigger=1, **PARAMS
    )

    got = _assign(io.read("doc_clusters"))
    assert got == _batch_assign(corpus)
    assert io.read("doc_sigs").count() == corpus.count()
    # survivors derived from the maintained table match the batch rule
    surv = io.read("doc_clusters").where(
        F.col("doc_id") == F.col("cluster_id")
    )
    batch_surv = dedup.near_dup_clusters(corpus, **PARAMS).where(
        "is_survivor"
    )
    assert {r.doc_id for r in surv.collect()} == {
        r.doc_id for r in batch_surv.collect()
    }
    cache.release_all(checkpoints=True)


# ---------------------------------------------------------------------------
# SimHash incremental variant (dedup.simhash_dedup_state / merge_simhash_batch)
# ---------------------------------------------------------------------------

SH_PARAMS = {"max_hamming": 8}


def _batch_simhash_assign(corpus):
    pairs = dedup.near_dup_pairs_simhash(corpus, **SH_PARAMS).select(
        "id_a", "id_b"
    )
    return _assign(
        dedup.clusters_from_pairs(corpus, pairs).select("doc_id", "cluster_id")
    )


def test_simhash_incremental_equals_batch_both_split_orders(spark, corpus):
    want = _batch_simhash_assign(corpus)
    for flip in (0, 1):
        a = corpus.where(F.pmod(F.col("doc_id"), 2) == flip)
        b = corpus.where(F.pmod(F.col("doc_id"), 2) == 1 - flip)
        state = dedup.simhash_dedup_state(a, **SH_PARAMS)
        state = dedup.merge_simhash_batch(state, b, **SH_PARAMS)
        assert _assign(state.assign) == want
    cache.release_all(checkpoints=True)


def test_simhash_merge_replay_is_idempotent(spark, corpus):
    a = corpus.where(F.col("doc_id") % 2 == 0)
    b = corpus.where(F.col("doc_id") % 2 == 1)
    state = dedup.simhash_dedup_state(a, **SH_PARAMS)
    state = dedup.merge_simhash_batch(state, b, **SH_PARAMS)
    once = _assign(state.assign)
    replayed = dedup.merge_simhash_batch(state, b, **SH_PARAMS)
    assert _assign(replayed.assign) == once
    assert replayed.sigs.count() == state.sigs.count()
    cache.release_all(checkpoints=True)
