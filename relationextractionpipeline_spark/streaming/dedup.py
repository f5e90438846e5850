"""Streaming exact deduplication — the training-data-pipeline lift of
``operators/dedup.dedup_exact`` (continuous corpus ingestion keeps only the
first occurrence of each distinct content).

Uses Structured Streaming's native stateful ``dropDuplicatesWithinWatermark``
keyed by the content hash pair (xxhash64 + md5 — the same ~28-byte key
``dedup.exact_dup_groups`` shuffles, so the dedup state store never holds
document text): a document whose content was seen within the watermark
horizon is dropped; the watermark bounds the state store — at 10^12-row
scale unbounded-key dedup state is the thing that kills streaming jobs, so
the horizon IS the design decision, stated in the API.

Exactly-once: the parquet sink's commit log + the state store checkpoint.
Batch-equivalence (same input ⇒ same surviving distinct contents) is tested
in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def with_content_key(df: DataFrame, text_col: str) -> DataFrame:
    """The shared exact-dedup content key (~28 bytes of state per doc):
    64-bit xxhash + 128-bit md5 of the text bytes.  Public so every
    streaming consumer (stream_dedup_exact, curate.stream_curate) derives
    the SAME key pair — two copies of this pairing could silently drift."""
    return df.withColumn("_h64", F.xxhash64(text_col)).withColumn(
        "_h128", F.md5(F.col(text_col).cast("binary"))
    )


def stream_dedup_exact(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    max_files_per_trigger: int = 8,
) -> None:
    """Drain ``input_dir`` into ``out_dir`` keeping the first occurrence per
    distinct content within the watermark horizon, exactly-once, then stop."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    deduped = (
        with_content_key(stream, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h64", "_h128"])
        .drop("_h64", "_h128")
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
