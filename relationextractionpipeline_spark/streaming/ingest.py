"""Streaming lift of the extract path (demonstration; see package docstring
for why streaming is otherwise out of scope — the reference and the north
rule are batch).

Because every stage of turns→triples is a stateless per-row pure function,
the identical fused operator runs under Structured Streaming unchanged:
``readStream`` on the transcripts directory → ``mapInPandas`` →
``writeStream`` parquet sink with a checkpoint location (exactly-once via
sink commit log).  ``trigger(availableNow=True)`` drains the backlog and
stops — the batch-equivalence test in tests/test_streaming.py asserts the
streamed triple set equals the batch run's.

The one stateful piece (W2 conversation assembly) lives in
``streaming/assembly.py``: ``applyInPandasWithState`` keyed by conv_id with
an event-time watermark on ``ts``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from relationextractionpipeline_spark.operators import fused
from relationextractionpipeline_spark.plans import schemas


def stream_extract_triples(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    kb_bc,
    kb_index_bc,
    figer_bc,
    max_files_per_trigger: int = 8,
) -> None:
    """Drain all transcript files currently in ``input_dir`` into a triples
    parquet sink, exactly-once, then stop."""
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    triples = fused.extract_triples_fused(stream, kb_bc, kb_index_bc, figer_bc)
    q = (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
