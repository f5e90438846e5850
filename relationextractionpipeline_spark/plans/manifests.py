"""Per-stage checkpoint manifests with lineage + counters, and resume.

The reference's resume story is coarse: re-run a whole *stage* over a
persisted batch-group manifest (``main.py:85-94``, ``helper_functions.py:
118-135``) — a failed batch restarts the stage for every batch in that
worker's group.  The new engine checkpoints each heavy stage to parquet with
a JSON manifest carrying:

* an **input fingerprint** (files + sizes + mtimes + stage-code version) so a
  resume never silently reuses stale output;
* **per-partition row counters** (lineage/observability: which partition
  produced how many rows);
* total rows and output path.

``CheckpointedRunner.stage`` is idempotent: a valid manifest (fingerprint
match + parquet ``_SUCCESS``) short-circuits to a scan of the materialized
output — a killed run resumes without recomputing completed stages
(BASELINE.json north_rule "resumable from checkpoint with per-partition
lineage + metrics").
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

STAGE_CODE_VERSION = "1"  # bump to invalidate all checkpoints on rule changes


def input_fingerprint(paths: List[str], extra: str = "") -> str:
    """Fingerprint of input files (or directories of files): path + size +
    mtime per contained file, plus the stage-code version."""
    h = hashlib.sha256()
    h.update(STAGE_CODE_VERSION.encode())
    h.update(extra.encode())

    def add(p: str) -> None:
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())

    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _dirs, files in sorted(os.walk(p)):
                for f in sorted(files):
                    add(os.path.join(root, f))
        else:
            add(p)
    return h.hexdigest()[:24]


class CheckpointedRunner:
    def __init__(self, spark: SparkSession, checkpoint_dir: str):
        self.spark = spark
        self.dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.events: List[Dict] = []  # (stage, 'computed'|'resumed') log

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.dir, f"{name}._manifest.json")

    def _out_path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def read_manifest(self, name: str) -> Optional[Dict]:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, name: str, fingerprint: str) -> bool:
        m = self.read_manifest(name)
        if m is None or m.get("fingerprint") != fingerprint:
            return False
        return os.path.exists(os.path.join(self._out_path(name), "_SUCCESS"))

    def stage(
        self,
        name: str,
        fingerprint: str,
        build: Callable[[], DataFrame],
    ) -> DataFrame:
        """Return the stage output, computing + materializing only if no
        valid checkpoint exists."""
        out = self._out_path(name)
        if self.is_complete(name, fingerprint):
            self.events.append({"stage": name, "action": "resumed"})
            # _pid is manifest bookkeeping, not stage schema — never leak it
            return self.spark.read.parquet(out).drop("_pid")
        t0 = time.time()
        df = build().withColumn("_pid", F.spark_partition_id())
        df.write.mode("overwrite").parquet(out)
        part_counts = [
            {"pid": int(r["_pid"]), "rows": int(r["cnt"])}
            for r in self.spark.read.parquet(out)
            .groupBy("_pid")
            .agg(F.count("*").alias("cnt"))
            .collect()
        ]
        manifest = {
            "stage": name,
            "fingerprint": fingerprint,
            "output": out,
            "rows": sum(p["rows"] for p in part_counts),
            "n_partitions": len(part_counts),
            "partitions": sorted(part_counts, key=lambda p: p["pid"]),
            "wall_sec": round(time.time() - t0, 3),
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(name))  # atomic publish
        self.events.append({"stage": name, "action": "computed"})
        return self.spark.read.parquet(out).drop("_pid")


def run_checkpointed(
    spark: SparkSession,
    paths: Dict[str, str],
    checkpoint_dir: str,
) -> Dict[str, DataFrame]:
    """Checkpointed staged pipeline: sentences → links+tokens → triples.

    Each stage's fingerprint chains the input files, so editing the input (or
    bumping STAGE_CODE_VERSION) invalidates downstream checkpoints while a
    plain kill/restart reuses everything already finished.
    """
    from relationextractionpipeline_spark.plans import pipeline as pl
    from relationextractionpipeline_spark.operators import (
        link as link_op,
        mentions as mentions_op,
        parse as parse_op,
        segment as segment_op,
        triples as triples_op,
    )

    inputs = [paths["transcripts"], paths["entity_kb"], paths["figer_map"]]
    fp = input_fingerprint(inputs)
    runner = CheckpointedRunner(spark, checkpoint_dir)

    transcripts, entity_kb, figer_map = pl.load_inputs(spark, paths)
    kb_bc, kb_index_bc, figer_bc = pl.build_broadcasts(spark, entity_kb, figer_map)

    sentences = runner.stage(
        "sentences", fp, lambda: segment_op.segment_sentences(transcripts)
    )
    linked = runner.stage(
        "linked",
        fp,
        lambda: link_op.link_mentions_in_row(
            mentions_op.detect_mentions(
                parse_op.parse_sentences(sentences), kb_index_bc
            ),
            kb_bc,
            figer_bc,
        ),
    )
    triples = runner.stage(
        "triples",
        fp,
        lambda: triples_op.extract_triples(linked),
    )
    return {
        "sentences": sentences,
        "linked": linked,
        "triples": triples,
        "runner": runner,
    }
