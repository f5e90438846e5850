"""Context-aware entity linking under streaming — closes the documented
limitation of ``stream_upsert_kg`` (micro-batch boundaries can split a
conversation, so it uses the row-local max-prior scorer; the context
scorer needs ALL of a conversation's mentions at once).

The composition: a stateful conversation-closer re-batches the stream so
every downstream micro-batch contains only COMPLETE conversations, then
the batch context scorer runs unchanged inside ``foreachBatch``:

1. ``applyInPandasWithState`` keyed by ``conv_id`` buffers turns (same
   state machine as the stateful W2 assembly, ``streaming/assembly.py``)
   and emits a conversation's RAW TURN ROWS exactly once, when the
   event-time watermark passes its last turn + gap;
2. each emitted micro-batch therefore holds whole conversations, so
   ``fused.mention_rows_fused`` → ``link.score_links_grouped
   (mode='context')`` produce exactly the batch answer for those
   conversations — the context scorer is conversation-local, so scoring
   per micro-batch equals scoring globally (tested);
3. the scored links MERGE into the maintained table on the mention's
   natural key ``(conv_id, turn_idx, sent_idx, mention_id)`` — replayed
   batches rewrite identical rows (at-least-once → idempotent), the same
   contract as ``stream_upsert_triples``.

Late turns behind the watermark are dropped by the engine — the standard
trade, and the reason the emit must wait for conversation CLOSURE rather
than score partial prefixes (a prefix's coreference boosts could differ
from the full conversation's).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from relationextractionpipeline_spark.operators import fused, link
from relationextractionpipeline_spark.plans import schemas
from relationextractionpipeline_spark.sources.tableio import TableIO

LINK_KEYS = ["conv_id", "turn_idx", "sent_idx", "mention_id"]

TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idx", T.ArrayType(T.IntegerType()), False),
        T.StructField("text", T.ArrayType(T.StringType()), False),
        T.StructField("max_ts_ms", T.LongType(), False),
    ]
)


def _close_conversations_fn(session_gap_ms: int):
    """Buffer turns; emit them all, once, when the conversation closes
    (watermark past last turn + gap) — assembly's state machine emitting
    rows instead of a joined document."""

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            turn_idx, texts, _max_ts = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id] * len(turn_idx),
                    "turn_idx": list(turn_idx),
                    "text": list(texts),
                }
            )
            return
        turn_idx: list = []
        texts: list = []
        max_ts = 0
        if state.exists:
            turn_idx, texts, max_ts = state.get
            turn_idx, texts = list(turn_idx), list(texts)
        for pdf in pdfs:
            turn_idx.extend(int(v) for v in pdf["turn_idx"])
            texts.extend("" if v is None else str(v) for v in pdf["text"])
            ts_ms = pdf["ts"].values.astype("datetime64[ms]").astype("int64")
            if len(ts_ms):
                max_ts = max(max_ts, int(ts_ms.max()))
        state.update((turn_idx, texts, max_ts))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts + session_gap_ms, wm + 1))
        return
        yield  # pragma: no cover — generator on the buffering path

    return fn


def stream_context_links(
    spark: SparkSession,
    input_dir: str,
    io: TableIO,
    table: str,
    checkpoint_dir: str,
    kb_bc,
    kb_index_bc,
    figer_bc,
    cands_bc,
    watermark: str = "10 seconds",
    session_gap_ms: int = 1,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain transcripts and MERGE context-scored links for every
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
        mrows = fused.mention_rows_fused(batch_df, kb_index_bc)
        scored = link.score_links_grouped(
            mrows, kb_bc, figer_bc, mode="context", cands_bc=cands_bc
        ).withColumn("_version", F.lit(int(batch_id)).cast("long"))
        try:
            io.read(table)
        except Exception:
            io.write(scored, table, mode="overwrite")
            return
        io.upsert(scored, table, keys=LINK_KEYS, version_col="_version")

    q = (
        closed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
