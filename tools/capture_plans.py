#!/usr/bin/env python
"""Capture .explain('formatted') output for declared queries.

Usage:
    python tools/capture_plans.py <tag> <query> [query ...]

Writes ``plans/r06/<query>_<tag>.txt`` for each query, evaluated against
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) — the optimization-round evidence
files the judge checks plan claims against (guide §7.2).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from relationextractionpipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r06",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="rex-spark-plans",
        shuffle_partitions=cpus,
    )
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
