#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}`` plus KG throughput fields (turns/sec — the BASELINE.md metric).

Each query is forced with a full-column hash aggregate so Catalyst cannot
prune the computed columns away; timings therefore cover the real work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from relationextractionpipeline_spark.operators import cache  # noqa: E402
from relationextractionpipeline_spark.session import get_spark  # noqa: E402
from relationextractionpipeline_spark.sources import testgen  # noqa: E402

BENCH_QUERIES = [
    "kg_triples",
    "kg_links",
    "kg_assembly",
    "q1_lineitem_agg",
    "q_lineitem_rollup",
    "q_join_revenue_by_nation",
    "q_window_user_sessions",
    "q_events_pivot",
    "q_top_words",
    "q_doc_token_stats",
    "q_quality",
    "q_langid",
    "q_dedup_exact_groups",
    "q_dedup_minhash",
    "q_dedup_clusters",
    "q_dedup_simhash",
    "q_pii_scrub",
    "q_decontaminate",
    "q_repetition",
    "q_dedup_substring",
    "q_lm_perplexity",
    "q_bm25_search",
    "q_events_asof",
    "q_pack_sequences",
    "q_chunk_documents",
    "q_embed_topk",
    "q_embed_topk_ivf",
    "q_embed_topk_ivfpq",
    "q_sample_deterministic",
    "q_multimodal_features",
    # round-4 fifth session (new keys only — existing keys untouched for
    # cross-round comparability)
    "q_bpe_tokens",
    "q_shuffle_order",
    "q_training_mix",
    # round-4 sixth session (kg_rules/kg_salience stay out like the other
    # graph-tail queries — they re-run the full pipeline + CC and would
    # double bench wall-clock for no new signal beyond kg_triples/kg_links)
    "q_gopher_rules",
    "q_sample_dsir",
    "q_c4_rules",
    # round-4 eighth session (new keys only)
    "q_sft_pairs",
    "q_hybrid_search",
    "q_distinct_hll",
    "q_quantile_sketch",
    "q_curation_funnel",
    "q_dedup_convs",
    # q_quality_classifier stays out: 30 GD iterations are ~60 Spark jobs
    # of fixed scheduling overhead — a bench line would measure the
    # local-mode job launch path, not the engine (the parity gate times it)
    # kg_transe / kg_linkpred(_mrr) stay out for both reasons at once:
    # graph-tail pipeline re-run + 10 checkpointed GD iterations
]


def force(df: DataFrame) -> int:
    """Force full evaluation of every column (defeat column pruning)."""
    row = df.select(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
    ).collect()[0]
    return int(row["n"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = 0.1

    # pre-materialize the synthetic transcripts outside the timed region
    paths = testgen.materialize(entrymod._scale_for(sf_dir))

    from relationextractionpipeline_spark.session import (
        dir_bytes,
        input_split_conf,
    )

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="rex-spark-bench",
        shuffle_partitions=cpus,
        # CPU-bound Python stages: size input splits from the actual input
        # for ≥3 task waves per core (see session.input_split_conf)
        extra_conf=input_split_conf(dir_bytes(paths["transcripts"]), cpus),
    )
    qs = entrymod.queries()

    # warm-up outside the timed region: spin up one Python UDF worker per
    # core (hash-sampled so every partition contributes) + JIT the JVM scan
    import pandas as pd
    from pyspark.sql import types as T

    _warm = F.pandas_udf(lambda x: x, T.LongType())

    spark.range(0, cpus * 1000, 1, cpus).select(
        F.sum(_warm(F.col("id")))
    ).collect()
    t = spark.read.parquet(paths["transcripts"])
    from relationextractionpipeline_spark.plans import pipeline as _pl

    kb_bc, kbi_bc, fg_bc = _pl.build_broadcasts(
        spark,
        spark.read.parquet(paths["entity_kb"]),
        spark.read.parquet(paths["figer_map"]),
    )
    _pl.run_fused(
        t.where(F.pmod(F.xxhash64("conv_id"), F.lit(50)) == 0),
        kb_bc, kbi_bc, fg_bc,
    ).count()

    # best-of-N per query: the host's vCPUs are shared and neighbor
    # contention only ever ADDS time, so the min over repetitions is the
    # closest observable to true cost (same protocol as bench_scaling)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(reps):
            t0 = time.time()
            counts[name] = force(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # sketch/ANN operators persist() intermediates scoped to one
            # query; drop them so repeated queries don't accumulate storage
            # memory (and so reps re-measure real work, not the cache).
            # release_all(checkpoints=True) additionally frees the
            # localCheckpoint tails (pack/shuffle/BPE) that clearCache
            # cannot touch (RDD-owned blocks).
            spark.catalog.clearCache()
            cache.release_all(checkpoints=True)
        timings[name] = round(best, 3)

    # ---- ANN recall@k vs the exact baseline (untimed): the observability
    # knob for n_planes / nprobe / shortlist tuning — without it a low-recall
    # configuration (LSH returning 9 rows where exact returns 25) passes
    # every per-oracle gate silently.
    def _topk_sets(name: str) -> dict:
        pdf = qs[name](spark, sf_dir).select("query_id", "neighbor_id").toPandas()
        d: dict = {}
        for q_, n_ in zip(pdf["query_id"], pdf["neighbor_id"]):
            d.setdefault(q_, set()).add(n_)
        spark.catalog.clearCache()
        cache.release_all(checkpoints=True)
        return d

    exact = _topk_sets("q_embed_topk")

    def _recall(approx: dict) -> float | None:
        vals = [
            len(approx.get(q_, set()) & nbrs) / len(nbrs)
            for q_, nbrs in exact.items() if nbrs
        ]
        return round(sum(vals) / len(vals), 4) if vals else None

    recalls: dict[str, float | None] = {}
    for name in ("q_embed_topk_lsh", "q_embed_topk_lsh_multi",
                 "q_embed_topk_lsh_probe", "q_embed_topk_ivf",
                 "q_embed_topk_pq", "q_embed_topk_pq_rerank",
                 "q_embed_topk_ivfpq"):
        recalls[name.replace("q_embed_topk_", "")] = _recall(_topk_sets(name))

    # IVF recall curve over nprobe — the knob a user actually turns; recall
    # approaches exact as nprobe → n_clusters, cost grows with probed cells
    from relationextractionpipeline_spark.operators import similarity as _sim

    ivf_curve: dict[str, float | None] = {}
    emb_df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q_df = emb_df.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for nprobe in (2, 4, 8, 12):
        pdf = _sim.ivf_topk(
            emb_df, q_df, k=5, n_clusters=16, nprobe=nprobe
        ).select("query_id", "neighbor_id").toPandas()
        d: dict = {}
        for q_, n_ in zip(pdf["query_id"], pdf["neighbor_id"]):
            d.setdefault(q_, set()).add(n_)
        ivf_curve[f"nprobe{nprobe}"] = _recall(d)
        spark.catalog.clearCache()

    # same-window host-contention calibration: a fixed pure-Python+Arrow
    # probe that no engine change touches — cross-round comparisons divide
    # by this to separate code deltas from host-quota noise (the r02→r03
    # comparison was unusable because untouched queries "doubled")
    calib = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 2_000_000, 1, cpus).select(
            F.sum(_warm(F.col("id")))
        ).collect()
        calib.append(time.time() - t0)
    calibration_sec = round(min(calib), 3)

    n_turns = spark.read.parquet(paths["transcripts"]).count()
    kg_sec = timings["kg_triples"]
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "cpus": cpus,
        "kg_turns": n_turns,
        "kg_triples": counts["kg_triples"],
        "kg_turns_per_sec": round(n_turns / kg_sec, 1) if kg_sec > 0 else None,
        "kg_triples_per_sec": (
            round(counts["kg_triples"] / kg_sec, 1) if kg_sec > 0 else None
        ),
        # corpus/grammar version: v4 emits ~24% more triples/turn than v3 —
        # cross-round turns/sec comparisons are invalid across versions
        "corpus_version": testgen.GEN_VERSION,
        "calibration_sec": calibration_sec,
        "ann_recall_at_5": recalls,
        "ivf_recall_curve": ivf_curve,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
