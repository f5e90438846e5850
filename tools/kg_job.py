"""One full KG pipeline run, as a standalone job: read transcripts →
fused extraction → write triples parquet.  Used by tools/bench_scaling.py at
two parallelism levels (local[N] vs local[4N]) — the sandbox stand-in for the
north rule's N→4N-executor scaling measurement.

Usage: python tools/kg_job.py <cpus> <scale> <out_dir>
Prints one JSON line: {"cpus": N, "turns": T, "triples": R, "sec": S,
"turns_per_sec": X}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relationextractionpipeline_spark.session import (  # noqa: E402
    dir_bytes,
    get_spark,
    input_split_conf,
)
from relationextractionpipeline_spark.sources import testgen  # noqa: E402
from relationextractionpipeline_spark.plans import pipeline  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    scale = sys.argv[2]
    out_dir = sys.argv[3]
    paths = testgen.materialize(scale)
    # size input splits from the actual input so every core gets ≥3 task
    # waves regardless of parallelism level (see session.input_split_conf)
    conf = input_split_conf(dir_bytes(paths["transcripts"]), cpus)
    if "REX_MAX_PART_BYTES" in os.environ:
        conf["spark.sql.files.maxPartitionBytes"] = os.environ["REX_MAX_PART_BYTES"]
    if "REX_ARROW_BATCH" in os.environ:
        conf["spark.sql.execution.arrow.maxRecordsPerBatch"] = os.environ[
            "REX_ARROW_BATCH"
        ]
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"rex-kg-job-{cpus}",
        shuffle_partitions=cpus,
        extra_conf=conf,
    )
    transcripts, entity_kb, figer_map = pipeline.load_inputs(spark, paths)
    n_turns = transcripts.count()
    kb_bc, kb_index_bc, figer_bc = pipeline.build_broadcasts(
        spark, entity_kb, figer_map
    )
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    # warm-up: spin up the Python UDF workers + JIT before the timed region.
    # hash-sampled filter (not limit) so every input partition keeps a slice
    # and every core's Python worker gets warmed, not just one task's.
    from pyspark.sql import functions as F

    warm = transcripts.where(F.pmod(F.xxhash64("conv_id"), F.lit(50)) == 0)
    pipeline.run_fused(warm, kb_bc, kb_index_bc, figer_bc).count()
    stats = {
        k: spark.sparkContext.accumulator(0)
        for k in ("lookups", "hits", "evictions")
    }
    t0 = time.time()
    # sharded input ⇒ the scan parallelizes natively; the extract path is
    # narrow end-to-end (no shuffle between read and write)
    triples = pipeline.run_fused(
        transcripts, kb_bc, kb_index_bc, figer_bc, cache_stats=stats
    )
    triples.write.mode("overwrite").parquet(out_dir)
    sec = time.time() - t0
    n_triples = spark.read.parquet(out_dir).count()
    looked = stats["lookups"].value
    out = {
        "cpus": cpus,
        "turns": n_turns,
        "triples": n_triples,
        "sec": round(sec, 3),
        "turns_per_sec": round(n_turns / sec, 1),
        # sentence-memo observability (functions/turnproc)
        "memo_lookups": looked,
        "memo_hit_rate": round(stats["hits"].value / looked, 3) if looked else None,
        "memo_evictions": stats["evictions"].value,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
