"""The SHUFFLE-HEAVY scaling workload: read transcripts → skew-aware
two-phase conversation assembly (one data-sized hash Exchange) → write
parquet.  The companion to tools/kg_job.py (whose extract path is
shuffle-free): together the two pairs evidence the north rule on both a
narrow pipeline and one whose cost IS the shuffle — a skeptic can't read
the headline pair as "trivially scalable because nothing moves".

Usage: python tools/shuffle_job.py <cpus> <scale> <out_dir>
Prints one JSON line: {"cpus": N, "turns": T, "docs": D, "sec": S,
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
from relationextractionpipeline_spark.operators import skew  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    scale = sys.argv[2]
    out_dir = sys.argv[3]
    paths = testgen.materialize(scale)
    conf = input_split_conf(dir_bytes(paths["transcripts"]), cpus)
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"rex-shuffle-job-{cpus}",
        shuffle_partitions=cpus,
        extra_conf=conf,
    )
    transcripts = spark.read.parquet(paths["transcripts"])
    n_turns = transcripts.count()
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    # warm-up outside the timed region: JIT the scan + shuffle machinery
    transcripts.limit(2000).groupBy("conv_id").count().count()
    # a single assembly pass finishes in seconds at these corpus sizes, so
    # per-job fixed costs (stage scheduling, write commit) would dominate
    # the ratio; ROUNDS sequential passes amortize them — each round
    # re-executes scan → Exchange → write (nothing is persisted between)
    rounds = int(os.environ.get("REX_SHUFFLE_ROUNDS", "5"))
    t0 = time.time()
    for r in range(rounds):
        skew.assemble_conversations_skew_aware(transcripts).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"r{r}"))
    sec = time.time() - t0
    n_docs = spark.read.parquet(os.path.join(out_dir, "r0")).count()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "turns": n_turns * rounds,
                "docs": n_docs,
                "rounds": rounds,
                "sec": round(sec, 2),
                "turns_per_sec": round(n_turns * rounds / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
