"""Single-window query timer for cross-round comparisons: import the driver
contract from a given REPO CHECKOUT, time a subset of its queries() once
each (same warm-up and force protocol as bench.py), print ONE JSON line.

Run by tools/bench_paired_rounds.py in alternating (old, new) subprocesses —
never directly against two checkouts from one process (the package import
would be ambiguous).

Usage: python bench_pair_runner.py <repo_root> <sf_dir> <cpus> <query> [...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo, sf_dir, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    sys.path.insert(0, repo)
    from pyspark.sql import DataFrame, functions as F

    import __spark_entry__ as em
    from relationextractionpipeline_spark.session import (
        dir_bytes,
        get_spark,
        input_split_conf,
    )
    from relationextractionpipeline_spark.sources import testgen

    paths = testgen.materialize(em._scale_for(sf_dir))
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="rex-bench-pair",
        shuffle_partitions=cpus,
        extra_conf=input_split_conf(dir_bytes(paths["transcripts"]), cpus),
    )
    # warm-up identical to bench.py: one Python worker per core + JVM JIT
    warm = F.pandas_udf(lambda x: x, "long")
    spark.range(0, cpus * 1000, 1, cpus).select(
        F.sum(warm(F.col("id")))
    ).collect()
    from relationextractionpipeline_spark.plans import pipeline as _pl

    t = spark.read.parquet(paths["transcripts"])
    kb_bc, kbi_bc, fg_bc = _pl.build_broadcasts(
        spark,
        spark.read.parquet(paths["entity_kb"]),
        spark.read.parquet(paths["figer_map"]),
    )
    _pl.run_fused(
        t.where(F.pmod(F.xxhash64("conv_id"), F.lit(50)) == 0),
        kb_bc, kbi_bc, fg_bc,
    ).count()

    def force(df: DataFrame) -> int:
        row = df.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]
        return int(row["n"])

    qs = em.queries()
    out = {}
    for name in names:
        t0 = time.time()
        n = force(qs[name](spark, sf_dir))
        out[name] = {"sec": round(time.time() - t0, 3), "rows": n}
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
