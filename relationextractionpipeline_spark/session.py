"""SparkSession factory with the engine's scale-oriented defaults.

Replaces the reference's hand-rolled parallelism (``multiprocessing.Pool`` +
round-robin batch files, ``main.py:51-61,144-151``; ``helper_functions.py:94-107``)
with Spark's scheduler: AQE on (runtime re-planning + skew-join splitting),
Arrow on (all Python stages are vectorized pandas UDFs), UTC session time.

In the sandbox this runs ``local[N]`` (single JVM); on a real cluster the same
session conf ships via ``spark-submit --py-files`` — nothing here is
local-mode-specific except the optional driver-memory default.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import SparkSession


def get_spark(
    master: Optional[str] = None,
    app_name: str = "rex-spark",
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[Dict[str, str]] = None,
) -> SparkSession:
    master = master or os.environ.get("REX_SPARK_MASTER", "local[*]")
    if shuffle_partitions is None:
        # local[N] → match cores; cluster → leave Spark/AQE defaults alone
        if master.startswith("local["):
            n = master[len("local["):-1]
            shuffle_partitions = os.cpu_count() if n == "*" else max(int(n), 1)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing, measured on the extract path (round 2, with
        # input splits sized by input_split_conf): 20k-row batches beat 10k
        # at every parallelism level (4c: ~par, 16c: +11%, 32c: +17%) and
        # hold 4→16-core scaling efficiency at 0.90 (10k drops to 0.73 —
        # too many tiny Arrow flushes per task; 50k loses wave balance).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("REX_SPARK_DRIVER_MEM", "16g"))
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def dir_bytes(path: str) -> int:
    """Total bytes of a file or directory tree (input-size probe)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def input_split_conf(
    total_bytes: int,
    cores: int,
    waves: int = 3,
    lo: int = 256 * 1024,
    hi: int = 128 * 1024 * 1024,
) -> Dict[str, str]:
    """Split-size conf for a CPU-bound per-row stage: bytes are a bad proxy
    for cost, so size splits from the *actual input* such that every core
    gets ≥ ``waves`` task waves (smooths stragglers, hides Python-worker
    spin-up), clamped to [256KB, 128MB].

    This replaces a fixed maxPartitionBytes: a fixed 2MB was measured to
    leave local[16] at ~1 wave on the 22MB bench corpus (4→16 scaling
    efficiency 0.44); the same rule at 100 TB yields ~128MB splits — the
    right answer at both ends.  ``openCostInBytes=0`` because file-open cost
    is irrelevant next to the Python stage cost.
    """
    per = max(lo, min(hi, total_bytes // max(1, cores * waves)))
    return {
        "spark.sql.files.maxPartitionBytes": str(per),
        "spark.sql.files.openCostInBytes": "0",
    }
