#!/usr/bin/env python
"""Per-query measurement harness for the optimization round (guide §1).

``bench.py`` is frozen for the driver; this file provides the same
methodology (force() full-column hash, best-of-N, cache release between
reps) for an arbitrary subset of queries so single optimizations can be
measured in isolation without paying the full-suite wall clock.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q_embed_topk q_quality
    python bench_extra.py --noop q_embed_topk     # noop-sink isolation (§1.4)

Prints one JSON line {"queries": {...}, "sf_dir": ..., "reps": N}.
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
from relationextractionpipeline_spark.session import (  # noqa: E402
    dir_bytes,
    get_spark,
    input_split_conf,
)
from relationextractionpipeline_spark.sources import testgen  # noqa: E402


def force(df: DataFrame) -> int:
    row = df.select(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
    ).collect()[0]
    return int(row["n"])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noop = "--noop" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    paths = testgen.materialize(entrymod._scale_for(sf_dir))
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="rex-spark-bench-extra",
        shuffle_partitions=cpus,
        extra_conf=input_split_conf(dir_bytes(paths["transcripts"]), cpus),
    )
    qs = entrymod.queries()

    # same warm-up as bench.py: one Python worker per core + JIT
    from pyspark.sql import types as T

    _warm = F.pandas_udf(lambda x: x, T.LongType())
    spark.range(0, cpus * 1000, 1, cpus).select(
        F.sum(_warm(F.col("id")))
    ).collect()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name in args:
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(reps):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                counts[name] = -1
            else:
                counts[name] = force(df)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            cache.release_all(checkpoints=True)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({
        "queries": timings, "counts": counts, "sf_dir": sf_dir,
        "cpus": cpus, "reps": reps, "noop": noop,
    }))


if __name__ == "__main__":
    main()
