"""Streaming lift: the fused extract path under Structured Streaming
(availableNow drain) produces exactly the batch triple set, and a re-run
against the same checkpoint emits nothing new (exactly-once)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

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


def test_stateful_assembly_matches_batch(spark, tiny_paths, tmp_path):
    """W2 under streaming: applyInPandasWithState keyed by conv_id with an
    event-time watermark.  Conversations close when the watermark passes
    their last turn + gap; a watermark-advancing sentinel closes the tail.
    The second drain also proves state survives in the checkpoint across
    runs (emitting from resumed state, no input re-read)."""
    import pandas as pd

    from relationextractionpipeline_spark.operators import assemble
    from relationextractionpipeline_spark.streaming import assembly

    src = pd.read_parquet(tiny_paths["transcripts"])
    in_dir = str(tmp_path / "turns_in")
    os.makedirs(in_dir)
    for s in range(4):  # shard so availableNow runs several micro-batches
        src.iloc[s::4].to_parquet(
            os.path.join(in_dir, f"part-{s}.parquet"), index=False
        )
    max_ts = src["ts"].max()

    def sentinel(name, days):
        pd.DataFrame(
            {
                "conv_id": [f"__sentinel_{days}__"],
                "turn_idx": pd.array([0], dtype="int32"),
                "role": ["user"],
                "text": ["x"],
                "tool": [""],
                "ts": pd.Series(
                    [max_ts + pd.Timedelta(days=days)], dtype="datetime64[us]"
                ),
            }
        ).to_parquet(os.path.join(in_dir, name), index=False)

    out = str(tmp_path / "assembled_stream")
    ck = str(tmp_path / "ck_assembly")
    sentinel("sentinel-1.parquet", 1)
    assembly.stream_assemble_conversations(spark, in_dir, out, ck)

    # a later sentinel advances the watermark past every real conversation;
    # their buffered state (from the checkpoint) emits on this run
    sentinel("sentinel-2.parquet", 2)
    assembly.stream_assemble_conversations(spark, in_dir, out, ck)

    got = spark.read.parquet(out).toPandas()
    got = got[~got.conv_id.str.startswith("__sentinel")]
    want = (
        assemble.assemble_conversations(spark.read.parquet(tiny_paths["transcripts"]))
        .select("conv_id", "n_turns", "doc_text")
        .toPandas()
    )
    cols = ["conv_id", "n_turns", "doc_text"]
    a = got[cols].astype({"n_turns": "int64"}).sort_values("conv_id").reset_index(drop=True)
    b = want[cols].astype({"n_turns": "int64"}).sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_streaming_dedup_matches_batch_distinct(spark, tiny_paths, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark on the content
    hash pair): the surviving distinct contents equal the batch distinct
    set, and a second drain with duplicate files emits nothing new
    (dedup state survives in the checkpoint)."""
    import os

    import pandas as pd

    from relationextractionpipeline_spark.plans import schemas
    from relationextractionpipeline_spark.streaming import dedup as sdedup

    src = pd.read_parquet(tiny_paths["transcripts"]).head(200)
    in_dir = str(tmp_path / "turns_in")
    os.makedirs(in_dir)
    # shard + plant duplicates across DIFFERENT files (cross-batch dedup)
    src.iloc[0::2].to_parquet(os.path.join(in_dir, "part-0.parquet"), index=False)
    src.iloc[1::2].to_parquet(os.path.join(in_dir, "part-1.parquet"), index=False)
    src.head(50).to_parquet(os.path.join(in_dir, "part-2-dups.parquet"), index=False)

    out = str(tmp_path / "deduped")
    ck = str(tmp_path / "ck_dedup")
    sdedup.stream_dedup_exact(
        spark, in_dir, out, ck, schemas.TRANSCRIPTS, watermark="365 days",
        max_files_per_trigger=1,
    )
    got = spark.read.parquet(out).toPandas()
    assert sorted(set(got["text"])) == sorted(set(src["text"]))
    # one survivor per distinct content
    assert got["text"].nunique() == len(got)

    # re-drain with MORE duplicate files against the same checkpoint
    src.head(80).to_parquet(os.path.join(in_dir, "part-3-dups.parquet"), index=False)
    sdedup.stream_dedup_exact(
        spark, in_dir, out, ck, schemas.TRANSCRIPTS, watermark="365 days",
        max_files_per_trigger=1,
    )
    again = spark.read.parquet(out).toPandas()
    assert len(again) == len(got)  # nothing new: all contents already seen


def test_streaming_curation_matches_batch_composition(spark, tmp_path):
    """Streaming curation (dedup → quality gate → deterministic sample)
    admits exactly the docs the batch composition admits over the same
    input — the quality/sampling operators are stateless/pure-function by
    design, so batch and stream share one implementation; dedup winners
    coincide because files drain in doc_id order (min id arrives first)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from relationextractionpipeline_spark.operators import (
        dedup as bdedup,
        quality,
        sampling,
    )
    from relationextractionpipeline_spark.streaming import curate

    src = pd.read_parquet("/root/testdata/sf0.001/documents.parquet").sort_values(
        "doc_id"
    )
    src["ts"] = (
        pd.Timestamp("2026-01-01") + pd.to_timedelta(src["doc_id"], unit="s")
    ).dt.tz_localize("UTC")  # tz-aware → parquet TIMESTAMP (watermarkable)
    # plant a later-id duplicate: the batch min-id rule and the streaming
    # first-arrival rule must both drop it
    dup = src.head(3).copy()
    dup["doc_id"] += 900000
    dup["ts"] += pd.Timedelta(hours=1)
    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir)
    half = len(src) // 2
    # pandas defaults to ns timestamps, which Spark's parquet reader
    # rejects — coerce to µs (and declare ts as timestamp_ntz below)
    src.iloc[:half].to_parquet(
        os.path.join(in_dir, "part-0.parquet"), index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    pd.concat([src.iloc[half:], dup]).to_parquet(
        os.path.join(in_dir, "part-1.parquet"), index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )

    out = str(tmp_path / "curated")
    ck = str(tmp_path / "ck_curate")
    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long, ts timestamp")
    curate.stream_curate(
        spark, in_dir, out, ck, schema, watermark="365 days",
        max_files_per_trigger=1,
    )
    got = spark.read.parquet(out)

    full = spark.createDataFrame(pd.concat([src, dup]))
    batch = sampling.deterministic_sample(
        quality.with_quality(bdedup.dedup_exact(full)).where(
            (F.col("quality_score") >= 0.5) & (F.col("stop_ratio") > 0)
        ),
        "doc_id",
        0.5,
    )
    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert got_ids == batch_ids
    assert len(got_ids) > 0
    assert not any(i >= 900000 for i in got_ids)  # planted dups dropped
    # the stream carries the same quality scores the batch operator computes
    gq = {r["doc_id"]: r["quality_score"] for r in got.collect()}
    bq = {r["doc_id"]: r["quality_score"] for r in batch.collect()}
    assert gq == bq
    spark.catalog.clearCache()


def test_streaming_upsert_maintains_triple_table(spark, tiny_paths, tmp_path):
    """Incremental KG maintenance: two drains (second sees only NEW files)
    converge the maintained table to the full batch triple set, and
    re-merging an already-applied batch (the at-least-once replay case) is
    idempotent — the MERGE keys dedupe, row count unchanged."""
    import pandas as pd

    from relationextractionpipeline_spark.sources.tableio import TableIO
    from relationextractionpipeline_spark.streaming import upsert as up

    src = pd.read_parquet(tiny_paths["transcripts"]).sort_values(
        ["conv_id", "turn_idx"]
    )
    in_dir = str(tmp_path / "turns_in")
    os.makedirs(in_dir)
    half = len(src) // 2
    src.iloc[:half].to_parquet(os.path.join(in_dir, "part-0.parquet"), index=False)

    _, entity_kb, figer_map = pipeline.load_inputs(spark, tiny_paths)
    kb_bc, kbi_bc, fg_bc = pipeline.build_broadcasts(spark, entity_kb, figer_map)
    io = TableIO(spark, str(tmp_path / "wh"))
    ck = str(tmp_path / "ck_upsert")

    up.stream_upsert_triples(
        spark, in_dir, io, "triples", ck, kb_bc, kbi_bc, fg_bc
    )
    n_first = io.read("triples").count()
    assert n_first > 0

    # second wave of files arrives; the checkpoint merges only the delta
    src.iloc[half:].to_parquet(os.path.join(in_dir, "part-1.parquet"), index=False)
    up.stream_upsert_triples(
        spark, in_dir, io, "triples", ck, kb_bc, kbi_bc, fg_bc
    )
    maintained = _triple_set(
        io.read("triples").drop("_version").toPandas()
    )
    batch = _triple_set(
        pipeline.run_pipeline(spark, tiny_paths, mode="fused")["triples"].toPandas()
    )
    assert maintained == batch

    # replay: merging the full extraction again (stale version) changes nothing
    all_again = pipeline.run_fused(
        spark.read.parquet(in_dir), kb_bc, kbi_bc, fg_bc
    ).withColumn("_version", F.lit(0).cast("long"))
    before = io.read("triples").count()
    io.upsert(all_again, "triples", keys=up.TRIPLE_KEYS, version_col="_version")
    assert io.read("triples").count() == before
    assert _triple_set(io.read("triples").drop("_version").toPandas()) == batch


def test_streaming_kg_maintains_entity_graph(spark, tiny_paths, tmp_path):
    """Full-KG streaming maintenance: two drains over arriving files converge
    BOTH the triple table and the canonical entity graph to the batch result,
    and replaying already-applied links into the loaded state is the empty
    merge (at-least-once safety)."""
    import pandas as pd

    from relationextractionpipeline_spark.operators import (
        canonicalize,
        fused,
        link as link_op,
    )
    from relationextractionpipeline_spark.sources.tableio import TableIO
    from relationextractionpipeline_spark.streaming import upsert as up

    src = pd.read_parquet(tiny_paths["transcripts"]).sort_values(
        ["conv_id", "turn_idx"]
    )
    in_dir = str(tmp_path / "turns_kg_in")
    os.makedirs(in_dir)
    half = len(src) // 2
    src.iloc[:half].to_parquet(os.path.join(in_dir, "part-0.parquet"), index=False)

    _, entity_kb, figer_map = pipeline.load_inputs(spark, tiny_paths)
    kb_bc, kbi_bc, fg_bc = pipeline.build_broadcasts(spark, entity_kb, figer_map)
    io = TableIO(spark, str(tmp_path / "wh_kg"))
    ck = str(tmp_path / "ck_kg")

    up.stream_upsert_kg(spark, in_dir, io, ck, kb_bc, kbi_bc, fg_bc)
    assert io.read("entity_assign").count() > 0

    src.iloc[half:].to_parquet(os.path.join(in_dir, "part-1.parquet"), index=False)
    up.stream_upsert_kg(spark, in_dir, io, ck, kb_bc, kbi_bc, fg_bc)

    # batch reference over ALL turns: same fused mention path + scorer
    transcripts = spark.read.parquet(in_dir)
    mentions = fused.mention_rows_fused(transcripts, kbi_bc)
    links = link_op.score_links_grouped(
        mentions, kb_bc, fg_bc,
        n_groups=link_op.groups_for(
            transcripts.count() * 5, spark.sparkContext.defaultParallelism
        ),
    )
    links.persist().count()
    want = {
        r.ent_key: r.canonical_id
        for r in canonicalize.entity_graph_state(links).assign.collect()
    }
    got = {
        r.ent_key: r.canonical_id for r in io.read("entity_assign").collect()
    }
    assert got == want

    # triple table converged to the batch extraction too
    maintained = _triple_set(io.read("triples").drop("_version").toPandas())
    batch = _triple_set(
        pipeline.run_pipeline(spark, tiny_paths, mode="fused")["triples"].toPandas()
    )
    assert maintained == batch

    # replay: merging the full link set into the LOADED state changes nothing
    state = canonicalize.EntityGraphState(
        refs=io.read("entity_refs"), assign=io.read("entity_assign")
    )
    replayed = canonicalize.merge_entity_batch(state, links)
    assert {
        r.ent_key: r.canonical_id for r in replayed.assign.collect()
    } == want
    links.unpersist()
    spark.catalog.clearCache()


def test_streaming_asof_matches_batch(spark, tmp_path):
    """Streaming as-of join (applyInPandasWithState keyed by user_id):
    after a watermark-advancing sentinel finalizes every purchase, the
    emitted matches equal the batch asof_join on the same events.  The
    second drain also proves pending state survives the checkpoint."""
    import pandas as pd

    from relationextractionpipeline_spark.operators.asof import asof_join
    from relationextractionpipeline_spark.streaming import asof as sasof

    src = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    src = src[src["event_type"].isin(["purchase", "view"])].reset_index(drop=True)
    in_dir = str(tmp_path / "events_in")
    os.makedirs(in_dir)
    # shard in a processing order decoupled from event time so micro-batches
    # interleave lefts and rights out of order (the case the state handles)
    for s in range(4):
        src.iloc[s::4].to_parquet(
            os.path.join(in_dir, f"part-{s}.parquet"), index=False
        )
    max_ts = src["ts"].max()

    def sentinel(name, days):
        pd.DataFrame(
            {
                "event_id": pd.array([10**12 + days], dtype="int64"),
                "ts": pd.Series(
                    [max_ts + pd.Timedelta(days=days)], dtype="datetime64[us]"
                ),
                "user_id": pd.array([-days], dtype="int64"),
                "event_type": ["view"],
                "value": [0.0],
                "props": ["{}"],
            }
        ).to_parquet(os.path.join(in_dir, name), index=False)

    out = str(tmp_path / "asof_stream")
    ck = str(tmp_path / "ck_asof")
    sentinel("sentinel-1.parquet", 1)
    sasof.stream_asof_join(spark, in_dir, out, ck)
    sentinel("sentinel-2.parquet", 2)
    sasof.stream_asof_join(spark, in_dir, out, ck)

    got = spark.read.parquet(out).toPandas()
    got = got[got.user_id >= 0]

    e = spark.createDataFrame(src)
    want = asof_join(
        e.where(F.col("event_type") == "purchase").select(
            "event_id", "ts", "user_id"
        ),
        e.where(F.col("event_type") == "view"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        right_order="event_id",
    ).select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "matched_event_id",
        F.unix_millis("matched_ts").alias("matched_ts_ms"),
        F.round("matched_value", 6).alias("matched_value"),
    ).toPandas()

    cols = ["user_id", "event_id", "ts_ms", "matched_event_id",
            "matched_ts_ms", "matched_value"]
    key = ["user_id", "event_id"]
    a = got[cols].sort_values(key).reset_index(drop=True)
    b = want[cols].sort_values(key).reset_index(drop=True)
    a["matched_value"] = a["matched_value"].round(6)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_streaming_hourly_agg_matches_batch(spark, tmp_path):
    """Watermarked tumbling-window aggregation: once a sentinel advances
    the watermark past all real data, the appended windows equal the
    batch q_events_hourly rollup exactly (engine-managed state, append
    mode = one final row per closed window)."""
    import pandas as pd

    from relationextractionpipeline_spark.streaming import windowagg

    src = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "events_wa_in")
    os.makedirs(in_dir)
    for s in range(4):
        src.iloc[s::4].to_parquet(
            os.path.join(in_dir, f"part-{s}.parquet"), index=False
        )
    max_ts = src["ts"].max()
    pd.DataFrame(
        {
            "event_id": pd.array([10**12], dtype="int64"),
            "ts": pd.Series(
                [max_ts + pd.Timedelta(days=2)], dtype="datetime64[us]"
            ),
            "user_id": pd.array([-1], dtype="int64"),
            "event_type": ["__sentinel__"],
            "value": [0.0],
            "props": ["{}"],
        }
    ).to_parquet(os.path.join(in_dir, "sentinel.parquet"), index=False)

    out = str(tmp_path / "hourly_stream")
    ck = str(tmp_path / "ck_hourly")
    windowagg.stream_hourly_event_stats(spark, in_dir, out, ck)

    got = spark.read.parquet(out).toPandas()
    got = got[got.event_type != "__sentinel__"]
    e = spark.createDataFrame(src)
    want = (
        e.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .toPandas()
    )
    key = ["hour_epoch", "event_type"]
    cols = key + ["n_events", "sum_value"]
    a = got[cols].sort_values(key).reset_index(drop=True)
    b = want[cols].sort_values(key).reset_index(drop=True)
    import pandas.testing as pdt

    pdt.assert_frame_equal(a, b, check_dtype=False)


def test_streaming_context_links_match_batch(spark, tiny_paths, tmp_path):
    """Conversation-complete micro-batching (stateful closer) + the batch
    context scorer inside foreachBatch: the maintained links table equals
    the batch context-mode links exactly — the composition that makes
    context linking valid under streaming (split conversations would
    change coreference boosts).  Second drain proves checkpoint resume."""
    import pandas as pd

    from relationextractionpipeline_spark.operators import fused, link
    from relationextractionpipeline_spark.plans import pipeline as pl
    from relationextractionpipeline_spark.sources.tableio import TableIO
    from relationextractionpipeline_spark.streaming import ctxlink

    src = pd.read_parquet(tiny_paths["transcripts"])
    in_dir = str(tmp_path / "ctx_turns_in")
    os.makedirs(in_dir)
    for s in range(4):
        src.iloc[s::4].to_parquet(
            os.path.join(in_dir, f"part-{s}.parquet"), index=False
        )
    max_ts = src["ts"].max()

    def sentinel(name, days):
        pd.DataFrame(
            {
                "conv_id": [f"__sentinel_{days}__"],
                "turn_idx": pd.array([0], dtype="int32"),
                "role": ["user"],
                "text": ["x"],
                "tool": [""],
                "ts": pd.Series(
                    [max_ts + pd.Timedelta(days=days)], dtype="datetime64[us]"
                ),
            }
        ).to_parquet(os.path.join(in_dir, name), index=False)

    _, entity_kb, figer_map = pl.load_inputs(spark, tiny_paths)
    kb_bc, kbi_bc, fg_bc = pl.build_broadcasts(spark, entity_kb, figer_map)
    cands_bc = pl.build_candidates_broadcast(spark, entity_kb)

    io = TableIO(spark, str(tmp_path / "warehouse"))
    ck = str(tmp_path / "ck_ctxlink")
    sentinel("sentinel-1.parquet", 1)
    ctxlink.stream_context_links(
        spark, in_dir, io, "ctx_links", ck, kb_bc, kbi_bc, fg_bc, cands_bc
    )
    sentinel("sentinel-2.parquet", 2)
    ctxlink.stream_context_links(
        spark, in_dir, io, "ctx_links", ck, kb_bc, kbi_bc, fg_bc, cands_bc
    )

    got = io.read("ctx_links").toPandas()
    got = got[~got.conv_id.str.startswith("__sentinel")]

    batch = link.score_links_grouped(
        fused.mention_rows_fused(
            spark.read.parquet(tiny_paths["transcripts"]), kbi_bc
        ),
        kb_bc, fg_bc, mode="context", cands_bc=cands_bc,
    ).toPandas()

    keys = ["conv_id", "turn_idx", "sent_idx", "mention_id"]
    cols = keys + ["surface", "kind", "url", "figer", "score"]
    a = got[cols].sort_values(keys).reset_index(drop=True)
    b = batch[cols].sort_values(keys).reset_index(drop=True)
    a["score"] = a["score"].round(6)
    b["score"] = b["score"].round(6)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_streaming_sft_pairs_match_batch(spark, tiny_paths, tmp_path):
    """Conversation-complete micro-batching + the batch SFT-pair extractor
    inside foreachBatch: the maintained pair table equals the batch
    extraction exactly (split conversations would break both the
    adjacency test and the context window).  Second drain proves
    checkpoint resume; replayed conversations rewrite identical rows."""
    import pandas as pd

    from relationextractionpipeline_spark.operators import instruct
    from relationextractionpipeline_spark.sources.tableio import TableIO
    from relationextractionpipeline_spark.streaming import sftpairs

    src = pd.read_parquet(tiny_paths["transcripts"])
    in_dir = str(tmp_path / "sft_turns_in")
    os.makedirs(in_dir)
    for s in range(4):
        src.iloc[s::4].to_parquet(
            os.path.join(in_dir, f"part-{s}.parquet"), index=False
        )
    max_ts = src["ts"].max()

    def sentinel(name, days):
        pd.DataFrame(
            {
                "conv_id": [f"__sentinel_{days}__"],
                "turn_idx": pd.array([0], dtype="int32"),
                "role": ["user"],
                "text": ["x"],
                "tool": [""],
                "ts": pd.Series(
                    [max_ts + pd.Timedelta(days=days)], dtype="datetime64[us]"
                ),
            }
        ).to_parquet(os.path.join(in_dir, name), index=False)

    io = TableIO(spark, str(tmp_path / "warehouse"))
    ck = str(tmp_path / "ck_sft")
    sentinel("sentinel-1.parquet", 1)
    sftpairs.stream_sft_pairs(spark, in_dir, io, "sft_pairs", ck)
    sentinel("sentinel-2.parquet", 2)
    sftpairs.stream_sft_pairs(spark, in_dir, io, "sft_pairs", ck)

    got = io.read("sft_pairs").toPandas()
    got = got[~got.conv_id.str.startswith("__sentinel")]

    batch = instruct.sft_pairs(
        spark.read.parquet(tiny_paths["transcripts"])
    ).toPandas()

    keys = ["conv_id", "turn_idx"]
    cols = ["conv_id", "turn_idx", "context", "n_ctx", "prompt", "response"]
    a = got[cols].sort_values(keys).reset_index(drop=True)
    b = batch[cols].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Gap-based sessionization as a custom stateful operator: after a
    sentinel advances the watermark past every real session's close, the
    emitted (user, session ordinal, count, bounds) rows equal the batch
    lag→flag→running-sum composition.  Two drains prove open-session
    state survives the checkpoint."""
    import pandas as pd
    from pyspark.sql import Window

    from relationextractionpipeline_spark.streaming import (
        sessionize as ssess,
    )

    src = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "sess_in")
    os.makedirs(in_dir)
    for s in range(4):
        src.iloc[s::4].to_parquet(
            os.path.join(in_dir, f"part-{s}.parquet"), index=False
        )
    max_ts = src["ts"].max()

    def sentinel(name, days):
        pd.DataFrame(
            {
                "event_id": pd.array([10**12 + days], dtype="int64"),
                "ts": pd.Series(
                    [max_ts + pd.Timedelta(days=days)], dtype="datetime64[us]"
                ),
                "user_id": pd.array([-days], dtype="int64"),
                "event_type": ["view"],
                "value": [0.0],
                "props": ["{}"],
            }
        ).to_parquet(os.path.join(in_dir, name), index=False)

    out = str(tmp_path / "sess_stream")
    ck = str(tmp_path / "ck_sess")
    sentinel("sentinel-1.parquet", 1)
    ssess.stream_sessionize(spark, in_dir, out, ck)
    sentinel("sentinel-2.parquet", 2)
    ssess.stream_sessionize(spark, in_dir, out, ck)

    got = spark.read.parquet(out).toPandas()
    got = got[got.user_id >= 0]

    e = spark.createDataFrame(src)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        e.withColumn(
            "new_sess",
            F.when(
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w)) > 1800,
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_timestamp(F.min("ts")).alias("start_epoch"),
            F.unix_timestamp(F.max("ts")).alias("end_epoch"),
        )
        .toPandas()
    )
    cols = ["user_id", "session_id", "n_events", "start_epoch", "end_epoch"]
    key = ["user_id", "session_id"]
    a = got[cols].sort_values(key).reset_index(drop=True)
    b = want[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
