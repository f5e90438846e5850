"""Streaming lift: the fused extract path under Structured Streaming
(availableNow drain) produces exactly the batch triple set, and a re-run
against the same checkpoint emits nothing new (exactly-once)."""

from __future__ import annotations

import os

from relationextractionpipeline_spark.plans import pipeline
from relationextractionpipeline_spark.streaming import ingest
from tests.test_pipeline import _triple_set


def test_stream_equals_batch_and_is_exactly_once(spark, tiny_paths, tmp_path):
    out = str(tmp_path / "triples_stream")
    ck = str(tmp_path / "ck_stream")
    _, entity_kb, figer_map = pipeline.load_inputs(spark, tiny_paths)
    kb_bc, kbi_bc, fg_bc = pipeline.build_broadcasts(spark, entity_kb, figer_map)

    ingest.stream_extract_triples(
        spark, tiny_paths["transcripts"], out, ck, kb_bc, kbi_bc, fg_bc
    )
    streamed = _triple_set(spark.read.parquet(out).toPandas())
    batch = _triple_set(
        pipeline.run_pipeline(spark, tiny_paths, mode="fused")["triples"].toPandas()
    )
    assert streamed == batch

    # second drain against the same checkpoint: no new input ⇒ no new rows
    ingest.stream_extract_triples(
        spark, tiny_paths["transcripts"], out, ck, kb_bc, kbi_bc, fg_bc
    )
    assert _triple_set(spark.read.parquet(out).toPandas()) == batch
