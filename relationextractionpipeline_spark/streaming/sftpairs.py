"""Streaming SFT-pair extraction — the training-data sibling of
``streaming/ctxlink.py``: instruction-tuning pairs maintained continuously
as transcripts arrive.

``instruct.sft_pairs`` is conversation-local (its windows partition by
``conv_id``), but a raw micro-batch can SPLIT a conversation — the
adjacency lead at the split and the context frame after it would both be
wrong.  The same stateful conversation-closer pattern fixes it:

1. ``applyInPandasWithState`` keyed by ``conv_id`` buffers turns (with
   ``role`` — the closer here carries the columns pair extraction needs)
   and emits a conversation's raw turn rows exactly once, when the
   event-time watermark passes its last turn + gap;
2. each micro-batch therefore holds whole conversations, so running the
   BATCH ``sft_pairs`` inside ``foreachBatch`` produces exactly the
   batch answer for those conversations;
3. pairs MERGE into the maintained table on the natural key
   ``(conv_id, turn_idx)`` (turn_idx = the prompt turn, unique per pair)
   — replayed batches rewrite identical rows (at-least-once →
   idempotent), the same contract as the other maintained tables.

Late turns behind the watermark are dropped by the engine — the emit
waits for conversation CLOSURE because a prefix's pairs could differ
from the full conversation's (a missing next turn fails the adjacency
test; a missing earlier turn changes the context window).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from relationextractionpipeline_spark.operators import instruct
from relationextractionpipeline_spark.plans import schemas
from relationextractionpipeline_spark.sources.tableio import TableIO

PAIR_KEYS = ["conv_id", "turn_idx"]

TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idx", T.ArrayType(T.IntegerType()), False),
        T.StructField("role", T.ArrayType(T.StringType()), False),
        T.StructField("text", T.ArrayType(T.StringType()), False),
        T.StructField("max_ts_ms", T.LongType(), False),
    ]
)


def _close_conversations_fn(session_gap_ms: int):
    """Buffer (turn_idx, role, text); emit all rows once, when the
    conversation closes (watermark past last turn + gap)."""

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            turn_idx, roles, texts, _max_ts = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id] * len(turn_idx),
                    "turn_idx": list(turn_idx),
                    "role": list(roles),
                    "text": list(texts),
                }
            )
            return
        turn_idx: list = []
        roles: list = []
        texts: list = []
        max_ts = 0
        if state.exists:
            turn_idx, roles, texts, max_ts = state.get
            turn_idx, roles, texts = list(turn_idx), list(roles), list(texts)
        for pdf in pdfs:
            turn_idx.extend(int(v) for v in pdf["turn_idx"])
            roles.extend("" if v is None else str(v) for v in pdf["role"])
            texts.extend("" if v is None else str(v) for v in pdf["text"])
            ts_ms = pdf["ts"].values.astype("datetime64[ms]").astype("int64")
            if len(ts_ms):
                max_ts = max(max_ts, int(ts_ms.max()))
        state.update((turn_idx, roles, texts, max_ts))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts + session_gap_ms, wm + 1))
        return
        yield  # pragma: no cover — generator on the buffering path

    return fn


def stream_sft_pairs(
    spark: SparkSession,
    input_dir: str,
    io: TableIO,
    table: str,
    checkpoint_dir: str,
    ctx_turns: int = 3,
    min_response_words: int = 3,
    watermark: str = "10 seconds",
    session_gap_ms: int = 1,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain transcripts and MERGE (prompt, response) pairs for every
    conversation the watermark has closed.  Conversations still open when
    the backlog drains stay in the checkpoint and emit on a later run."""
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    closed = stream.groupBy("conv_id").applyInPandasWithState(
        _close_conversations_fn(session_gap_ms),
        outputStructType=TURNS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

    def merge_batch(batch_df, batch_id: int) -> None:
        pairs = instruct.sft_pairs(
            batch_df, ctx_turns=ctx_turns,
            min_response_words=min_response_words,
        ).withColumn("_version", F.lit(int(batch_id)).cast("long"))
        try:
            io.read(table)
        except Exception:
            io.write(pairs, table, mode="overwrite")
            return
        io.upsert(pairs, table, keys=PAIR_KEYS, version_col="_version")

    q = (
        closed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
