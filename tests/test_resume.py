"""Checkpoint/resume: kill-and-resume skips completed stages; byte-identical
triples; fingerprint invalidation recomputes (SURVEY.md §5.3)."""

from __future__ import annotations

import os
import shutil

from relationextractionpipeline_spark.plans import manifests, pipeline
from tests.test_pipeline import TRIPLE_KEY, _triple_set


def _events(runner):
    return {(e["stage"], e["action"]) for e in runner.events}


def test_checkpoint_then_resume(spark, tiny_paths, tmp_path):
    ck = str(tmp_path / "ck")

    # first (cold) run: everything computed
    r1 = manifests.run_checkpointed(spark, tiny_paths, ck)
    t1 = _triple_set(r1["triples"].toPandas())
    assert _events(r1["runner"]) == {
        ("sentences", "computed"), ("linked", "computed"), ("triples", "computed"),
    }
    m = r1["runner"].read_manifest("triples")
    assert m["rows"] == len(t1)
    assert m["partitions"] and all(p["rows"] >= 0 for p in m["partitions"])

    # simulate a kill after stage 2: drop the triples checkpoint only
    shutil.rmtree(os.path.join(ck, "triples"))
    os.remove(os.path.join(ck, "triples._manifest.json"))

    r2 = manifests.run_checkpointed(spark, tiny_paths, ck)
    assert _events(r2["runner"]) == {
        ("sentences", "resumed"), ("linked", "resumed"), ("triples", "computed"),
    }
    assert _triple_set(r2["triples"].toPandas()) == t1

    # full resume: nothing recomputed
    r3 = manifests.run_checkpointed(spark, tiny_paths, ck)
    assert _events(r3["runner"]) == {
        ("sentences", "resumed"), ("linked", "resumed"), ("triples", "resumed"),
    }
    assert _triple_set(r3["triples"].toPandas()) == t1


def test_checkpointed_graph_tail_resume(spark, tiny_paths, tmp_path):
    """Graph stages (entities/edges/predicates) under manifest control: a
    kill during the graph tail recomputes only the dead stage; a full
    resume never re-runs the iterative CC; outputs match the direct
    materialize_graph path."""
    ck = str(tmp_path / "ck_graph")
    r1 = manifests.run_checkpointed(spark, tiny_paths, ck, graph=True)
    assert _events(r1["runner"]) >= {
        ("entities", "computed"), ("edges", "computed"), ("predicates", "computed"),
    }
    ents1 = {r["canonical_id"] for r in r1["entities"].collect()}
    edges1 = r1["edges"].count()

    # direct path equality — including the EDGES SCHEMA: the checkpointed
    # tail must carry the predicate rewrite (pred_canonical/pred_id), not a
    # schema-diverged edges table missing the predicates join
    staged = pipeline.run_pipeline(spark, tiny_paths, mode="staged")
    g = pipeline.materialize_graph(staged)
    assert {r["canonical_id"] for r in g["entities"].collect()} == ents1
    assert g["edges"].count() == edges1
    assert r1["edges"].columns == g["edges"].columns
    assert {"pred_canonical", "pred_id"} <= set(r1["edges"].columns)
    pe_ck = {
        (r["pred"], r["pred_canonical"])
        for r in r1["edges"].select("pred", "pred_canonical").distinct().collect()
    }
    pe_direct = {
        (r["pred"], r["pred_canonical"])
        for r in g["edges"].select("pred", "pred_canonical").distinct().collect()
    }
    assert pe_ck == pe_direct

    # kill during the graph tail: drop edges only
    shutil.rmtree(os.path.join(ck, "edges"))
    os.remove(os.path.join(ck, "edges._manifest.json"))
    r2 = manifests.run_checkpointed(spark, tiny_paths, ck, graph=True)
    ev = _events(r2["runner"])
    assert ("edges", "computed") in ev
    assert ("entities", "resumed") in ev and ("triples", "resumed") in ev
    assert r2["edges"].count() == edges1

    # full resume: every stage (incl. graph) resumed, CC never re-ran
    r3 = manifests.run_checkpointed(spark, tiny_paths, ck, graph=True)
    assert _events(r3["runner"]) == {
        (s, "resumed")
        for s in ("sentences", "linked", "triples",
                  "entities", "edges", "predicates")
    }


def test_checkpointed_matches_direct(spark, tiny_paths, tmp_path):
    ck = str(tmp_path / "ck2")
    r = manifests.run_checkpointed(spark, tiny_paths, ck)
    direct = pipeline.run_pipeline(spark, tiny_paths, mode="fused")
    assert _triple_set(r["triples"].toPandas()) == _triple_set(
        direct["triples"].toPandas()
    )


def test_partition_level_resume(spark, tiny_paths, tmp_path):
    """Mid-stage kill: only the group that was in flight recomputes; finished
    groups are skipped (the partition-level resume the stage-level runner
    can't do)."""
    ck = str(tmp_path / "ckp")
    # shard the tiny transcripts into 3 files so groups exist
    import pandas as _pd

    tdir = str(tmp_path / "tshard")
    os.makedirs(tdir)
    pdf = _pd.read_parquet(tiny_paths["transcripts"])
    for s in range(3):
        pdf.iloc[s::3].to_parquet(os.path.join(tdir, f"part-{s}.parquet"),
                                  index=False)
    paths = dict(tiny_paths, transcripts=tdir)

    # groups are hash buckets of the ACTUAL file paths — derive the
    # expected layout from plan_groups rather than hardcoding indices
    files = manifests.list_parquet_files(tdir)
    buckets = manifests.PartitionedStageRunner.plan_groups(files, 1)
    nonempty = [gi for gi, fs in enumerate(buckets) if fs]

    r1 = manifests.run_checkpointed_partitioned(spark, paths, ck, group_size=1)
    t1 = _triple_set(r1["triples"].toPandas())
    groups = {e["group"] for e in r1["runner"].events}
    assert groups == set(nonempty)
    assert all(e["action"] == "computed" for e in r1["runner"].events)

    # simulate a kill while one group was in flight: drop output + manifest
    import glob

    gkill = nonempty[0]
    g1 = os.path.join(ck, "triples", f"g{gkill:05d}")
    shutil.rmtree(g1)
    for m in glob.glob(
        os.path.join(ck, "triples", f"g{gkill:05d}._manifest.json")
    ):
        os.remove(m)

    r2 = manifests.run_checkpointed_partitioned(spark, paths, ck, group_size=1)
    acts = {(e["group"], e["action"]) for e in r2["runner"].events}
    assert (gkill, "computed") in acts
    assert all(a == "resumed" for g, a in acts if g != gkill)
    assert _triple_set(r2["triples"].toPandas()) == t1

    # and equals the direct fused run
    direct = pipeline.run_pipeline(spark, tiny_paths, mode="fused")
    assert t1 == _triple_set(direct["triples"].toPandas())


def test_partition_resume_group_manifest_counters(spark, tiny_paths, tmp_path):
    ck = str(tmp_path / "ckp2")
    import glob
    import json

    manifests.run_checkpointed_partitioned(spark, tiny_paths, ck, group_size=2)
    mfiles = sorted(glob.glob(os.path.join(ck, "triples", "g*._manifest.json")))
    assert mfiles
    total = 0
    for mf in mfiles:
        m = json.load(open(mf))
        assert m["files"] and m["fingerprint"]
        assert m["rows"] == sum(p["rows"] for p in m["partitions"])
        total += m["rows"]
    direct = pipeline.run_pipeline(spark, tiny_paths, mode="fused")
    assert total == direct["triples"].count()


def test_fingerprint_invalidation(spark, tiny_paths, tmp_path):
    ck = str(tmp_path / "ck3")
    manifests.run_checkpointed(spark, tiny_paths, ck)
    # touch the input files → new fingerprint → stale checkpoints recompute
    t = tiny_paths["transcripts"]
    targets = (
        [os.path.join(t, f) for f in os.listdir(t)] if os.path.isdir(t) else [t]
    )
    for p in targets:
        os.utime(p, (1, 1))
    r = manifests.run_checkpointed(spark, tiny_paths, ck)
    assert _events(r["runner"]) == {
        ("sentences", "computed"), ("linked", "computed"), ("triples", "computed"),
    }


def test_partition_resume_append_recomputes_only_gained_buckets(
    spark, tiny_paths, tmp_path
):
    """Appending corpus files must NOT invalidate untouched groups: file →
    bucket assignment is hash-stable and fingerprints are per-group, so
    only buckets that gained files recompute.  (The old positional
    chunking + global fingerprint re-extracted the whole corpus for one
    appended file.)"""
    import pandas as _pd

    ck = str(tmp_path / "ckp3")
    tdir = str(tmp_path / "tshard3")
    os.makedirs(tdir)
    pdf = _pd.read_parquet(tiny_paths["transcripts"])
    # 5 shards at group_size=2 → 4 buckets; the 6th keeps the bucket
    # count at 4 (no doubling), so old files keep their buckets
    for s in range(5):
        pdf.iloc[s::6].to_parquet(
            os.path.join(tdir, f"part-{s}.parquet"), index=False
        )
    paths = dict(tiny_paths, transcripts=tdir)
    manifests.run_checkpointed_partitioned(spark, paths, ck, group_size=2)

    # append shard 5 and re-run
    pdf.iloc[5::6].to_parquet(
        os.path.join(tdir, f"part-5.parquet"), index=False
    )
    files = manifests.list_parquet_files(tdir)
    before = manifests.PartitionedStageRunner.plan_groups(
        [f for f in files if not f.endswith("part-5.parquet")], 2
    )
    after = manifests.PartitionedStageRunner.plan_groups(files, 2)
    assert len(before) == len(after)  # no bucket-count doubling
    changed = {
        gi for gi, fs in enumerate(after) if fs and fs != before[gi]
    }
    assert changed  # the new file landed somewhere

    r2 = manifests.run_checkpointed_partitioned(spark, paths, ck, group_size=2)
    acts = {(e["group"], e["action"]) for e in r2["runner"].events}
    assert {g for g, a in acts if a == "computed"} == changed
    assert all(a == "resumed" for g, a in acts if g not in changed)

    # result equals a direct fused run over the full 6-shard corpus
    direct_triples = pipeline.run_pipeline(
        spark, dict(tiny_paths, transcripts=tdir), mode="fused"
    )["triples"]
    assert _triple_set(r2["triples"].toPandas()) == _triple_set(
        direct_triples.toPandas()
    )
