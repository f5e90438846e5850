#!/usr/bin/env python
"""Dump (row count, full-column order-insensitive hash) per query — the
equivalence probe used to prove optimized query rewrites return identical
results to the round-start tree (run in both trees, diff the JSON).

Usage: SPARK_GRAFT_SF_DIR=... python tools/dump_hashes.py out.json q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from relationextractionpipeline_spark.operators import cache  # noqa: E402
from relationextractionpipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="rex-spark-hashdump",
        shuffle_partitions=cpus,
    )
    qs = entrymod.queries()
    out: dict = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        row = df.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]
        out[name] = {"n": int(row["n"]), "h": int(row["h"] or 0),
                     "schema": df.schema.simpleString()}
        print(name, out[name])
        spark.catalog.clearCache()
        cache.release_all(checkpoints=True)
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
