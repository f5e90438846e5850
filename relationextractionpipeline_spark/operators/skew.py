"""Explicit skew handling (BASELINE.json north_star).

Conversation lengths are power-law (FIXTURES.md: 1% of conversations have
200-1000 turns), so any stage that *groups by conversation* has hot keys.
The engine's first line of defense is structural: the extract path never
groups by conversation at all (plans/pipeline.py).  Where conversation
grouping is required (document assembly W2, grouped link scoring T5), these
utilities apply the standard remedies:

* ``hot_keys``            — cheap count pre-pass to *detect* skew (the
                            reference had no equivalent; its round-robin file
                            scheduler, helper_functions.py:94-107, was blind
                            to per-file cost).
* ``salted_repartition``  — spread one hot key over k sub-partitions.
* ``assemble_conversations_skew_aware`` — two-phase W2: partial per-bucket
                            assembly (hot conversation spread over B
                            reducers), then a merge of B pre-combined chunks
                            per conversation — the merge shuffle sees B rows
                            per conversation instead of n_turns rows.
* AQE skew-join splitting  — ``spark.sql.adaptive.skewJoin.enabled`` is on in
                            the session factory for the join-shaped stages.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key_cols: List[str], min_count: int = 100_000) -> DataFrame:
    """Keys whose row count exceeds ``min_count`` — the skew pre-pass."""
    return (
        df.groupBy(*key_cols)
        .count()
        .where(F.col("count") >= min_count)
        .orderBy(F.desc("count"))
    )


def salted_repartition(
    df: DataFrame,
    key_col: str,
    num_partitions: int,
    salt_buckets: int = 16,
    salt_col: str = "_salt",
) -> DataFrame:
    """Repartition on (key, salt) so one hot key spans ``salt_buckets``
    partitions.  Salt is deterministic (hash of a secondary column would also
    work); callers must aggregate per (key, salt) first, then re-aggregate
    per key."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets))
    ).repartition(num_partitions, F.col(key_col), F.col(salt_col))


def assemble_conversations_skew_aware(
    transcripts: DataFrame,
    bucket_turns: int = 64,
) -> DataFrame:
    """W2 assembly with two-phase aggregation for power-law conversations.

    Phase 1 groups by (conv_id, turn_idx div bucket_turns): a 1000-turn
    conversation becomes ~16 partial rows built on ~16 different reducers,
    each already sorted and '\\n'/' '-free-joined.  Phase 2 merges the
    partials in bucket order — per conversation it shuffles B small rows,
    not n_turns.  Output schema matches operators/assemble.assemble_conversations
    minus the full turns array (kept only per-bucket internally).
    """
    bucket = (F.col("turn_idx") / bucket_turns).cast("int")
    partial = (
        transcripts.groupBy("conv_id", bucket.alias("bucket"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("turn_idx", "text"))
            ).alias("chunk"),
            F.count("*").alias("n"),
            # non-null text count: a bucket whose texts are ALL null joins
            # to '' but must contribute NO separator in phase 2 (batch
            # array_join skips nulls element-wise; an already-joined empty
            # bucket string can't be skipped without this flag)
            F.count("text").alias("nn"),
        )
        .select(
            "conv_id",
            "bucket",
            "n",
            "nn",
            F.array_join(F.transform("chunk", lambda t: t["text"]), "\n").alias(
                "chunk_text"
            ),
        )
    )
    merged = (
        partial.groupBy("conv_id")
        .agg(
            F.sum("n").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.sort_array(
                            F.collect_list(
                                F.struct("bucket", "chunk_text", "nn")
                            )
                        ),
                        lambda s: s["nn"] > 0,
                    ),
                    lambda s: s["chunk_text"],
                ),
                "\n",
            ).alias("doc_text"),
        )
        .select("conv_id", F.col("n_turns").cast("int").alias("n_turns"), "doc_text")
    )
    return merged
