"""W2 (conversation assembly) lifted to Structured Streaming — the stateful
counterpart of ``operators/assemble.py``.

The batch engine assembles a conversation with one hash aggregation; under
streaming, turns for one conversation arrive across micro-batches, so
assembly becomes a **custom stateful operator**: ``applyInPandasWithState``
keyed by ``conv_id``, buffering turns in the state store, with an
**event-time watermark** on ``ts`` deciding when a conversation is closed —
a conversation whose last turn is older than (watermark - session gap) times
out, emits its assembled document once, and clears its state.  Late turns
behind the watermark are dropped by the engine (documented late-data
semantics), exactly the trade a real pipeline makes.

Output schema matches the batch operator's ``(conv_id, n_turns, doc_text)``
so batch≡stream equivalence is directly testable
(tests/test_streaming.py::test_stateful_assembly_matches_batch).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from relationextractionpipeline_spark.plans import schemas

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.IntegerType(), False),
        T.StructField("doc_text", T.StringType(), False),
    ]
)

# buffered turns; ts kept as epoch millis (state stores scalars/arrays)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idx", T.ArrayType(T.IntegerType()), False),
        T.StructField("text", T.ArrayType(T.StringType()), False),
        T.StructField("max_ts_ms", T.LongType(), False),
    ]
)


def _assemble_fn(session_gap_ms: int):
    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            # watermark passed last-turn ts + gap: the conversation is closed
            turn_idx, texts, _max_ts = state.get
            order = sorted(range(len(turn_idx)), key=lambda i: turn_idx[i])
            # skip null texts like the batch operator's array_join does —
            # mapping them to '' diverged from batch by one blank line per
            # null-text turn
            doc = "\n".join(
                texts[i] for i in order if texts[i] is not None
            )
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [len(turn_idx)],
                    "doc_text": [doc],
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
            # preserve nulls (emit-time join skips them, matching batch)
            texts.extend(
                None if v is None or (isinstance(v, float) and pd.isna(v))
                else str(v)
                for v in pdf["text"]
            )
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                max_ts = max(max_ts, int(batch_max.value // 1_000_000))
        state.update((turn_idx, texts, max_ts))
        # close when event time passes the conversation's last turn + gap;
        # clamp above the current watermark (rows are watermark-filtered at
        # batch START, so max_ts can trail the batch-end watermark slightly)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts + session_gap_ms, wm + 1))
        return
        yield  # pragma: no cover — make fn a generator on the buffering path

    return fn


def stream_assemble_conversations(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 seconds",
    session_gap_ms: int = 1,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain ``input_dir`` and write assembled conversations for every
    conversation the watermark has closed.  ``availableNow`` semantics: state
    still open when the backlog is drained stays in the checkpoint (emitted
    by a later run) — stream-correct behavior, tested with a watermark-
    advancing sentinel."""
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    assembled = stream.groupBy("conv_id").applyInPandasWithState(
        _assemble_fn(session_gap_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        assembled.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
