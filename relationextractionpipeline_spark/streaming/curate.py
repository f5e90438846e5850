"""Streaming corpus curation — the training-data composition
(dedup → quality gate → deterministic sample, batch form ``q_curate_corpus``)
lifted onto Structured Streaming for continuous ingestion.

Stage order mirrors the batch composition exactly:

1. exact dedup within the watermark horizon
   (``dropDuplicatesWithinWatermark`` on the 28-byte content-hash pair —
   state never holds text, the horizon bounds the state store);
2. quality gate — ``operators/quality.with_quality`` is pure native Columns,
   so it applies to a stream UNCHANGED (the point of keeping the quality
   operators stateless: batch and streaming share one implementation);
3. deterministic md5-threshold sampling
   (``operators/sampling.deterministic_sample``) — membership is a pure
   function of the id, so a restart or replay admits exactly the same docs
   (no RNG state to checkpoint).

Exactly-once via the parquet sink commit log + state checkpoint.
Batch-equivalence on the FILTER DECISIONS (same surviving doc ids as the
batch composition over the same input) is tested in tests/test_streaming.py
— the one semantic difference is dedup's winner: streaming keeps the FIRST
arrival within the horizon, batch ``dedup_exact`` keeps the min id; the
test feeds ids in order so the two coincide, and the docstring states the
difference for out-of-order ingestion.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from relationextractionpipeline_spark.operators import quality, sampling
from relationextractionpipeline_spark.streaming import dedup


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    min_quality: float = 0.5,
    sample_fraction: float = 0.5,
    max_files_per_trigger: int = 8,
) -> None:
    """Drain ``input_dir`` through dedup → quality ≥ ``min_quality`` (with
    stop_ratio > 0) → deterministic ``sample_fraction`` into ``out_dir``,
    exactly-once, then stop."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    deduped = (
        dedup.with_content_key(stream, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h64", "_h128"])
        .drop("_h64", "_h128")
    )
    scored = quality.with_quality(deduped, text_col=text_col)
    kept = scored.where(
        (F.col("quality_score") >= min_quality) & (F.col("stop_ratio") > 0)
    )
    sampled = sampling.deterministic_sample(kept, id_col, sample_fraction)
    q = (
        sampled.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
