"""Watermarked tumbling-window aggregation — the textbook Structured
Streaming operator (late data handled by the engine, not custom state):
hourly event counts/sums equivalent to the batch ``q_events_hourly``
rollup.

``window('ts', '1 hour')`` + watermark means a window only EMITS (append
mode) once the watermark passes its end — each window is written exactly
once with its final value, and rows later than the watermark are dropped.
That is precisely the batch groupBy result for every window the watermark
has closed, which is what the batch≡stream test asserts (a sentinel
advances the watermark past all real data, closing every window).

State here is engine-managed (one row per open (window, event_type) —
bounded by the watermark horizon, not history), in contrast to the custom
``applyInPandasWithState`` operators (assembly, as-of join) whose state
the pipeline owns.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from .asof import EVENTS_SCHEMA


def stream_hourly_event_stats(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 seconds",
    max_files_per_trigger: int = 2,
) -> None:
    """Drain ``input_dir`` (events-shaped parquet) and append finalized
    hourly (hour_epoch, event_type, n_events, sum_value) rows — the
    streaming counterpart of the batch ``q_events_hourly`` query."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
