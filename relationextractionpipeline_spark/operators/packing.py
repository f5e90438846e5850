"""Sequence packing + token-window chunking — the last mile of an LLM
training-data pipeline: turning curated documents into fixed-context
training sequences.

``pack_sequences`` assigns each document to a training pack by GLOBAL
cumulative token count under a deterministic (id-ordered) document order:
``pack_id = floor(tokens_before / ctx_len)`` — the streaming-concatenation
packing used by GPT-style pretraining loaders (documents concatenated in
order, sliced every ``ctx_len`` tokens; a document may straddle a pack
boundary, recorded in ``offset_in_pack``).

The global running sum is the scalable part.  A single
``Window.orderBy(...)`` collapses to ONE partition — correct but a
scale-killer — so the operator uses the classic two-phase cumsum:

1. ``repartitionByRange`` on the id (global order across partitions,
   sampled boundaries — the boundaries affect placement, never the
   result) + per-bucket window cumsum;
2. per-partition totals (one tiny row per partition) → driver-free
   prefix-sum via a single-partition window over n_partitions rows →
   broadcast-joined back as offsets.

Cost at 100 TB: the (id, size) PROJECTION shuffles twice — the range
partition, then the window's hash clustering on the bucket id (Catalyst
cannot know rangepartitioning(id) already clusters by bucket) — plus a
broadcast of n_partitions offset rows; the text itself never moves.  The
bucketed frame is ``cache.checkpoint``-ed so BOTH branches read one
materialization of the sampled range boundaries — a per-branch recompute
could resample boundaries and silently mis-join the offsets (caller frees
via ``cache.release_all(checkpoints=True)``; plan-audited in PLANS.md).

``chunk_documents`` slices each document's token array into overlapping
``ctx_len`` windows (stride ``ctx_len - overlap``) — explode-based, purely
row-local, no shuffle at all.

No reference analog (the reference ends at triple files,
de_pipeline/pipeline.py:69-77); beyond-reference training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import cache
from .quality import TOKEN_REGEX


def pack_sequences(
    df: DataFrame,
    size_col: str,
    ctx_len: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, size) → (id, size, pack_id, offset_in_pack) under id-ordered
    streaming concatenation into ``ctx_len``-token packs.

    Deterministic: depends only on the id order and sizes, never on
    partitioning (equality-tested against a single-partition run)."""
    nparts = df.sparkSession.sparkContext.defaultParallelism
    sized = df.select(F.col(id_col), F.col(size_col).cast("long").alias("_sz"))
    # checkpoint, not a plain persist: BOTH branches (cumsum + offsets) must
    # see ONE materialization of the sampled range boundaries — a partial
    # recompute could resample them and silently mis-join the offsets.  The
    # checkpoint truncates lineage, so divergence is impossible by
    # construction (cache.release_all(checkpoints=True) frees the blocks
    # once results are materialized).
    parted = cache.checkpoint(
        sized.repartitionByRange(max(nparts, 2), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted.withColumn("_cum_in", F.sum("_sz").over(w_in))
    # n_partitions rows: a single-partition window here is O(parallelism),
    # not O(rows) — the one place a global window is the right tool
    w_off = (
        Window.orderBy(F.col("_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        parted.groupBy("_pid")
        .agg(F.sum("_sz").alias("_ptot"))
        .withColumn("_off", F.coalesce(F.sum("_ptot").over(w_off), F.lit(0)))
        .select("_pid", "_off")
    )
    cum_before = F.col("_off") + F.col("_cum_in") - F.col("_sz")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            F.col(id_col),
            F.col("_sz").alias(size_col),
            F.floor(cum_before / F.lit(int(ctx_len))).alias("pack_id"),
            (cum_before % F.lit(int(ctx_len))).alias("offset_in_pack"),
        )
    )


def pack_documents(
    df: DataFrame,
    ctx_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``pack_sequences`` over the corpus token counts (shared
    ``TOKEN_REGEX`` tokenizer, same counts as ``with_token_stats``)."""
    sized = df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
        .alias("n_tokens"),
    )
    return pack_sequences(sized, "n_tokens", ctx_len, id_col=id_col)


def chunk_documents(
    df: DataFrame,
    ctx_len: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into overlapping token windows of at most
    ``ctx_len`` tokens (stride ``ctx_len - overlap``): one row per chunk
    with (id, chunk_idx, n_chunk_tokens, chunk_text).

    Chunk boundaries are token-aligned; ``chunk_text`` re-joins tokens
    with single spaces (the token-stream view a trainer consumes — NOT
    byte-identical to the source text).  The last chunk may be short; a
    final window that would only repeat overlap tokens is not emitted.
    Entirely row-local (explode over a per-row sequence) — zero shuffle,
    scales linearly with corpus size."""
    if not 0 <= overlap < ctx_len:
        raise ValueError("need 0 <= overlap < ctx_len")
    stride = ctx_len - overlap
    # tokenize ONCE in its own projection: the generator expression lives
    # in a separate Generate operator from the projection, so referencing
    # the regexp inside n_chunks too would regex-scan every text twice
    # (codegen subexpression elimination does not cross the Generate)
    toked = df.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.col(text_col), F.lit(TOKEN_REGEX), 0
        ).alias("_toks"),
    )
    n = F.size("_toks")
    # number of stride-aligned starts covering all n tokens:
    # 1 + ceil(max(n - ctx, 0) / stride); empty docs emit one empty chunk
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(ctx_len), F.lit(0)) / F.lit(stride)
    ).cast("int")
    return (
        toked.select(
            F.col(id_col),
            F.col("_toks"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_idx", "_start_i"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            F.slice(
                F.col("_toks"), F.col("_start_i") * stride + 1, ctx_len
            ).alias("_chunk"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("_chunk").alias("n_chunk_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )
