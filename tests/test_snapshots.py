"""Snapshot table format (sources/snapshots.py): atomic commits, time
travel, snapshot-pinned reads, MERGE isolation, rollback, expiry.

These are the Iceberg-shaped guarantees the north rule asks for, run on the
parquet fallback (no Iceberg jar in this container — probed, documented in
tableio.py).  The layout under test is the real one a cluster would use on
HDFS-like storage; only the commit lock would move into a catalog service
on an object store."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from relationextractionpipeline_spark.sources import snapshots
from relationextractionpipeline_spark.sources.snapshots import (
    CommitConflict,
    NoSuchSnapshot,
    SnapshotTableIO,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, version long, w long")


@pytest.fixture()
def io(spark, tmp_path):
    return SnapshotTableIO(spark, str(tmp_path))


def test_replace_read_roundtrip_and_history(io, spark):
    io.write(_df(spark, [("a", 1, 10)]), "t")
    io.write(_df(spark, [("a", 1, 10), ("b", 1, 20)]), "t")
    assert io.current_version("t") == 2
    assert {r["k"] for r in io.read("t").collect()} == {"a", "b"}
    hist = io.history("t")
    assert [s.version for s in hist] == [1, 2]
    assert [s.operation for s in hist] == ["replace", "replace"]
    assert hist[1].parent_id == hist[0].snapshot_id
    assert hist[1].row_count == 2


def test_append_is_metadata_only_and_old_version_stays_readable(io, spark):
    io.write(_df(spark, [("a", 1, 10)]), "t")
    v1_dirs = io.snapshot("t").data_dirs
    io.write(_df(spark, [("b", 1, 20)]), "t", mode="append")
    snap = io.snapshot("t")
    # append reuses the parent's data dirs verbatim + exactly one new dir
    assert snap.data_dirs[: len(v1_dirs)] == v1_dirs
    assert len(snap.data_dirs) == len(v1_dirs) + 1
    assert snap.row_count == 2
    # time travel: version 1 is still exactly the old table
    assert [r["k"] for r in io.read("t", version=1).collect()] == ["a"]
    assert {r["k"] for r in io.read("t").collect()} == {"a", "b"}


def test_append_rejects_schema_name_drift(io, spark):
    io.write(_df(spark, [("a", 1, 10)]), "t")
    bad = spark.createDataFrame([("b", 1)], "k string, version long")
    with pytest.raises(ValueError, match="schema mismatch"):
        io.append(bad, "t")


def test_merge_semantics_and_snapshot_pinned_resume(io, spark):
    io.write(_df(spark, [("a", 1, 10), ("b", 1, 20)]), "t")
    pinned = io.current_version("t")
    pinned_before = io.read("t", version=pinned)
    io.upsert(
        _df(spark, [("b", 2, 99), ("c", 1, 30)]), "t", keys=["k"],
        version_col="version",
    )
    # head sees the merge...
    assert {r["k"]: r["w"] for r in io.read("t").collect()} == {
        "a": 10, "b": 99, "c": 30,
    }
    # ...but the pinned snapshot is bit-stable (resume reads what it started
    # with, even though the merge landed mid-job)
    assert {r["k"]: r["w"] for r in pinned_before.collect()} == {"a": 10, "b": 20}
    assert {
        r["k"]: r["w"] for r in io.read("t", version=pinned).collect()
    } == {"a": 10, "b": 20}


def test_time_travel_by_timestamp(io, spark):
    io.write(_df(spark, [("a", 1, 10)]), "t")
    ts_between = io.snapshot("t").ts
    io.write(_df(spark, [("a", 2, 11)]), "t")
    got = io.read("t", as_of_ts=ts_between).collect()
    assert [(r["k"], r["w"]) for r in got] == [("a", 10)]
    with pytest.raises(NoSuchSnapshot):
        io.snapshot("t", as_of_ts=ts_between - 1e6)


def test_stale_commit_conflicts_and_upsert_retries(io, spark, monkeypatch):
    io.write(_df(spark, [("a", 1, 10)]), "t")
    # direct stale commit: computed against v1, but HEAD moves to v2 first
    stale_base = io.current_version("t")
    io.write(_df(spark, [("a", 2, 11)]), "t")
    with pytest.raises(CommitConflict):
        io._commit("t", io.snapshot("t").data_dirs, "merge",
                   io.snapshot("t").schema_json, 1, stale_base)
    # upsert retry loop: a competing append lands between the merge compute
    # and its commit exactly once; the merge must recompute against the new
    # head so the competitor's row survives
    real_write = io._write_data_dir
    raced = {"done": False}

    def racing_write(df, name):
        path_n = real_write(df, name)
        if not raced["done"]:
            raced["done"] = True
            io.append(_df(spark, [("z", 1, 70)]), "t")
        return path_n

    monkeypatch.setattr(io, "_write_data_dir", racing_write)
    io.upsert(_df(spark, [("a", 3, 12)]), "t", keys=["k"], version_col="version")
    got = {r["k"]: r["w"] for r in io.read("t").collect()}
    assert got == {"a": 12, "z": 70}  # neither the merge nor the racer lost
    assert io.snapshot("t").operation == "merge"


def test_crashed_commit_leaves_head_intact_and_expire_collects_orphan(io, spark):
    io.write(_df(spark, [("a", 1, 10)]), "t")
    head = io.current_version("t")
    # simulate a writer killed after its data write, before its commit:
    # the data dir exists, HEAD never moved
    io._write_data_dir(_df(spark, [("junk", 9, 0)]), "t")
    assert io.current_version("t") == head
    assert {r["k"] for r in io.read("t").collect()} == {"a"}  # no corruption
    # default grace period protects a FRESH unreferenced dir — it could be
    # a concurrent writer's in-flight data whose commit hasn't landed yet
    assert io.expire_snapshots("t", keep_last=1) == 0
    # grace 0 (operator knows no writer is live) collects the orphan
    removed = io.expire_snapshots("t", keep_last=1, orphan_grace_sec=0.0)
    assert removed == 1  # the orphan
    assert {r["k"] for r in io.read("t").collect()} == {"a"}


def test_rollback_is_append_only_history(io, spark):
    io.write(_df(spark, [("good", 1, 1)]), "t")
    io.write(_df(spark, [("bad", 1, 2)]), "t")
    snap = io.rollback_to("t", 1)
    assert snap.version == 3  # rollback COMMITS, never erases
    assert [r["k"] for r in io.read("t").collect()] == ["good"]
    assert [r["k"] for r in io.read("t", version=2).collect()] == ["bad"]


def test_expire_drops_old_manifests_and_unreferenced_data(io, spark):
    io.write(_df(spark, [("a", 1, 1)]), "t")
    io.write(_df(spark, [("b", 1, 2)]), "t")
    io.write(_df(spark, [("c", 1, 3)]), "t")
    removed = io.expire_snapshots("t", keep_last=2)
    assert removed == 1  # v1's replaced data dir
    assert [s.version for s in io.history("t")] == [2, 3]
    with pytest.raises(NoSuchSnapshot):
        io.read("t", version=1)
    # retained versions still read fine
    assert [r["k"] for r in io.read("t", version=2).collect()] == ["b"]
    assert [r["k"] for r in io.read("t").collect()] == ["c"]


def test_compact_collapses_append_dirs_without_changing_content(io, spark):
    io.write(_df(spark, [("a", 1, 1)]), "t")
    for i in range(3):
        io.append(_df(spark, [(f"x{i}", 1, i)]), "t")
    assert len(io.snapshot("t").data_dirs) == 4
    before = io.compact("t", target_files=2)
    assert before == 4
    assert len(io.snapshot("t").data_dirs) == 1
    assert io.read("t").count() == 4
    assert {r["k"] for r in io.read("t").collect()} == {"a", "x0", "x1", "x2"}


def test_snapshot_io_drops_into_streaming_upsert_surface(io, spark):
    """The streaming maintenance path takes any TableIO; with the snapshot
    variant every micro-batch merge becomes a versioned commit — replay the
    upsert.py merge_batch shape by hand (probe → create → merge) and check
    the history reads like a stream's."""
    table = "triples"
    try:
        io.read(table)
        exists = True
    except Exception:  # noqa: BLE001
        exists = False
    assert not exists
    io.write(_df(spark, [("t1", 0, 1)]), table, mode="overwrite")
    io.upsert(_df(spark, [("t1", 1, 5), ("t2", 1, 2)]), table,
              keys=["k"], version_col="version")
    io.upsert(_df(spark, [("t3", 2, 3)]), table, keys=["k"],
              version_col="version")
    assert [s.operation for s in io.history(table)] == [
        "replace", "merge", "merge",
    ]
    assert io.read(table).count() == 3
    # a resume that pinned the post-batch-1 snapshot sees exactly batch 0+1
    assert io.read(table, version=2).count() == 2


def test_streaming_triple_maintenance_over_snapshot_store(
    spark, tiny_paths, tmp_path
):
    """END-TO-END drop-in: the streaming triple-table MERGE maintenance
    (streaming/upsert.stream_upsert_triples) running over the snapshot
    store instead of bare parquet.  Every micro-batch merge becomes a
    versioned commit, so after the drain the table has real history: the
    final head is the merged set, and a reader pinned to an earlier
    version sees exactly the pre-merge table — the snapshot-pinned-resume
    property, on the actual streaming path."""
    import os as _os

    import pandas as pd

    from relationextractionpipeline_spark.plans import pipeline
    from relationextractionpipeline_spark.streaming import upsert as up

    src = pd.read_parquet(tiny_paths["transcripts"]).sort_values(
        ["conv_id", "turn_idx"]
    )
    in_dir = str(tmp_path / "turns_in")
    _os.makedirs(in_dir)
    half = len(src) // 2
    src.iloc[:half].to_parquet(_os.path.join(in_dir, "part-0.parquet"), index=False)

    _, entity_kb, figer_map = pipeline.load_inputs(spark, tiny_paths)
    kb_bc, kbi_bc, fg_bc = pipeline.build_broadcasts(spark, entity_kb, figer_map)
    io = SnapshotTableIO(spark, str(tmp_path / "wh"))
    ck = str(tmp_path / "ck_upsert_snap")

    up.stream_upsert_triples(spark, in_dir, io, "triples", ck, kb_bc, kbi_bc, fg_bc)
    v_after_first = io.current_version("triples")
    n_first = io.read("triples").count()
    assert n_first > 0

    src.iloc[half:].to_parquet(_os.path.join(in_dir, "part-1.parquet"), index=False)
    up.stream_upsert_triples(spark, in_dir, io, "triples", ck, kb_bc, kbi_bc, fg_bc)

    # head converged to the full batch extraction
    batch = pipeline.run_fused(
        spark.read.parquet(in_dir), kb_bc, kbi_bc, fg_bc
    )
    assert io.read("triples").count() == batch.count()
    # history: the second drain's merge landed as new version(s) on top
    assert io.current_version("triples") > v_after_first
    ops = [s.operation for s in io.history("triples")]
    assert ops[0] == "replace" and "merge" in ops[1:]
    # snapshot-pinned resume: the pre-second-drain version still reads as
    # exactly the first half's extraction
    assert io.read("triples", version=v_after_first).count() == n_first


def test_incremental_scan_returns_only_append_deltas(io, spark):
    io.write(_df(spark, [("a", 1, 1)]), "t")
    v1 = io.current_version("t")
    io.append(_df(spark, [("b", 1, 2)]), "t")
    io.append(_df(spark, [("c", 1, 3), ("d", 1, 4)]), "t")
    v3 = io.current_version("t")
    # delta (v1, v3]: exactly the two appends, never the base rows
    delta = io.read_incremental("t", v1)
    assert {r["k"] for r in delta.collect()} == {"b", "c", "d"}
    # sub-range (v1, v2]
    assert {r["k"] for r in io.read_incremental("t", v1, v1 + 1).collect()} == {"b"}
    # empty range → empty frame with the table schema
    empty = io.read_incremental("t", v3, v3)
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "version", "w"}
    # a merge in the range breaks append-only semantics → explicit error
    io.upsert(_df(spark, [("a", 2, 9)]), "t", keys=["k"], version_col="version")
    with pytest.raises(ValueError, match="not append"):
        io.read_incremental("t", v1)


def test_schema_evolution_add_column(io, spark):
    io.write(_df(spark, [("a", 1, 1)]), "t")
    wide = spark.createDataFrame(
        [("b", 1, 2, "de")], "k string, version long, w long, lang string"
    )
    # strict append refuses the wider batch...
    with pytest.raises(ValueError, match="schema mismatch"):
        io.append(wide, "t")
    # ...evolution accepts it: history is NOT rewritten, old rows read null
    io.append(wide, "t", allow_evolution=True)
    got = {r["k"]: r["lang"] for r in io.read("t").collect()}
    assert got == {"a": None, "b": "de"}
    assert set(io.read("t").columns) == {"k", "version", "w", "lang"}
    # time travel to v1 shows the pre-evolution schema untouched
    assert set(io.read("t", version=1).columns) == {"k", "version", "w"}
    # dropping an existing column is refused even under evolution
    narrow = spark.createDataFrame([("c", 1)], "k string, version long")
    with pytest.raises(ValueError, match="add-column only"):
        io.append(narrow, "t", allow_evolution=True)
    # post-evolution strict appends use the WIDENED schema
    io.append(
        spark.createDataFrame(
            [("d", 1, 4, "en")], "k string, version long, w long, lang string"
        ),
        "t",
    )
    assert io.read("t").count() == 3
    # and a merge over the evolved table reads/writes the union schema
    io.upsert(
        spark.createDataFrame(
            [("a", 2, 9, "fr")], "k string, version long, w long, lang string"
        ),
        "t", keys=["k"], version_col="version",
    )
    head = {r["k"]: (r["w"], r["lang"]) for r in io.read("t").collect()}
    assert head == {"a": (9, "fr"), "b": (2, "de"), "d": (4, "en")}


def test_write_honors_save_mode_semantics(io, spark):
    """mode='error'/'errorifexists' must fail on an existing table and
    mode='ignore' must be a no-op — the snapshot subclass previously
    routed every non-append mode to replace(), silently destroying the
    table under the modes that promise NOT to touch it."""
    io.write(_df(spark, [("a", 1, 1)]), "t")
    with pytest.raises(ValueError, match="already exists"):
        io.write(_df(spark, [("b", 1, 2)]), "t", mode="error")
    io.write(_df(spark, [("b", 1, 2)]), "t", mode="ignore")
    assert [r["k"] for r in io.read("t").collect()] == ["a"]
    # on a missing table both modes create it
    io.write(_df(spark, [("c", 1, 3)]), "t2", mode="error")
    assert [r["k"] for r in io.read("t2").collect()] == ["c"]


def test_stale_commit_lock_is_broken(io, spark):
    """A writer killed while holding COMMIT.lock must not wedge the table:
    locks older than STALE_LOCK_SEC are crash artifacts and get broken."""
    io.write(_df(spark, [("a", 1, 1)]), "t")
    lock = os.path.join(io._meta_dir("t"), "COMMIT.lock")
    with open(lock, "w"):
        pass
    os.utime(lock, (1, 1))  # ancient mtime = crashed holder
    io.write(_df(spark, [("b", 1, 2)]), "t")  # breaks the lock, commits
    assert [r["k"] for r in io.read("t").collect()] == ["b"]
    assert not os.path.exists(lock)


def test_release_leaves_stolen_lock_alone(io, spark, monkeypatch):
    """If a breaker stole the holder's lock mid-commit (the holder stalled
    past STALE_LOCK_SEC), the holder's release must NOT remove the thief's
    lock by bare path — that would cascade the theft to a third writer.
    The release is inode-verified: only the holder's own lock is removed."""
    io.write(_df(spark, [("a", 1, 1)]), "t")
    lock = os.path.join(io._meta_dir("t"), "COMMIT.lock")
    real_rename = os.rename

    def steal_at_head_swap(src, dst):
        real_rename(src, dst)
        if dst.endswith("HEAD"):  # holder is inside the critical section
            os.remove(lock)       # breaker breaks...
            with open(lock, "w"):
                pass              # ...and re-acquires (new inode)

    monkeypatch.setattr(os, "rename", steal_at_head_swap)
    io.write(_df(spark, [("b", 1, 2)]), "t")
    monkeypatch.undo()
    # the thief's lock must survive the original holder's release
    assert os.path.exists(lock)
    os.remove(lock)
    assert [r["k"] for r in io.read("t").collect()] == ["b"]


def test_iceberg_pinned_read_refuses_silent_head(io, spark, monkeypatch):
    """With an Iceberg runtime, version/as_of_ts pins are not routed to
    time travel yet — the read must refuse rather than silently return
    HEAD and shear a pinned multi-stage job."""
    io.write(_df(spark, [("a", 1, 1)]), "t")
    monkeypatch.setattr(io, "use_iceberg", True)
    with pytest.raises(NotImplementedError, match="snapshot-pinned"):
        io.read("t", version=1)
