"""Incremental KG maintenance: streamed triple extraction merging into a
governed table via the MERGE-INTO analog (sources/tableio.py).

The north rule's production loop — transcripts land continuously, the KG
table must stay current — is a streaming MERGE, not an append: a replayed
micro-batch (Structured Streaming's failure contract for ``foreachBatch``
is at-least-once) must not duplicate triples.  The composition here makes
the merge IDEMPOTENT instead of relying on sink transactionality:

* triple identity is the natural key ``(conv_id, turn_idx, sent_idx,
  rel_idx)`` — re-extracting the same turn yields the same keys;
* ``TableIO.upsert`` keeps one row per key, latest ``_version`` (= the
  micro-batch id) winning, update side winning ties — so replaying batch N
  rewrites identical rows and the table converges to the same state;
* with an Iceberg runtime the same call becomes a real ``MERGE INTO``
  against a snapshot; the parquet fallback stages + swaps (never
  overwriting a directory a lazy plan still reads).

This is the streaming counterpart of the batch graph tail: extraction is
incremental per micro-batch, while canonicalization (a global fixpoint)
stays a periodic batch job over the maintained triple table — the standard
lambda split for clustering-shaped operators.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from relationextractionpipeline_spark.operators import fused
from relationextractionpipeline_spark.plans import schemas
from relationextractionpipeline_spark.sources.tableio import TableIO

TRIPLE_KEYS = ["conv_id", "turn_idx", "sent_idx", "rel_idx"]


def stream_upsert_triples(
    spark: SparkSession,
    input_dir: str,
    io: TableIO,
    table: str,
    checkpoint_dir: str,
    kb_bc,
    kb_index_bc,
    figer_bc,
    max_files_per_trigger: int = 8,
) -> None:
    """Drain transcript files into the ``table`` maintained by ``io``:
    fused extraction per micro-batch, then MERGE on the triple's natural
    key.  ``availableNow`` processes the current backlog and stops; the
    checkpoint carries the source offsets, so a later call only merges NEW
    files."""
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    triples = fused.extract_triples_fused(stream, kb_bc, kb_index_bc, figer_bc)

    def merge_batch(batch_df, batch_id: int) -> None:
        updates = batch_df.withColumn(
            "_version", F.lit(int(batch_id)).cast("long")
        )
        try:
            io.read(table)  # existence probe (parquet read raises on no dir)
        except Exception:
            io.write(updates, table, mode="overwrite")
            return
        io.upsert(updates, table, keys=TRIPLE_KEYS, version_col="_version")

    q = (
        triples.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
