"""TableIO shim + MERGE-INTO-analog upsert (sources/tableio.py).

No Iceberg runtime exists in this container (probed via Class.forName), so
these tests exercise the parquet fallback — the same call surface an
Iceberg-equipped cluster would route to the table format."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from relationextractionpipeline_spark.sources import tableio


def test_tableio_roundtrip_and_bucketing(spark, tmp_path):
    io = tableio.TableIO(spark, str(tmp_path))
    assert io.use_iceberg is False  # no runtime jar in this container
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    io.write(df, "t", bucket_by="k", n_buckets=4)
    back = io.read("t")
    assert back.count() == 100
    assert "_bucket" in back.columns  # the bucket(n, key) stand-in
    assert back.select("_bucket").distinct().count() == 4


def test_upsert_by_key_latest_wins_and_tie_prefers_update(spark):
    cur = spark.createDataFrame(
        [("a", 1, "old"), ("b", 5, "keep"), ("c", 2, "old")],
        "k string, version int, payload string",
    )
    upd = spark.createDataFrame(
        [("a", 3, "new"),      # higher version → replaces
         ("b", 5, "tie-upd"),  # version tie → UPDATE side wins
         ("d", 1, "insert")],  # new key → inserted
        "k string, version int, payload string",
    )
    out = {
        r["k"]: (r["version"], r["payload"])
        for r in tableio.upsert_by_key(cur, upd, ["k"], "version").collect()
    }
    assert out == {
        "a": (3, "new"),
        "b": (5, "tie-upd"),
        "c": (2, "old"),
        "d": (1, "insert"),
    }


def test_tableio_upsert_snapshot_swap(spark, tmp_path):
    """Table-level upsert: staging-directory swap (never overwrite the
    directory a lazy plan still reads), no staging/old debris left."""
    io = tableio.TableIO(spark, str(tmp_path))
    io.write(
        spark.createDataFrame(
            [("e1", 1, 10), ("e2", 1, 20)], "edge string, version int, w int"
        ),
        "edges",
    )
    io.upsert(
        spark.createDataFrame(
            [("e2", 2, 99), ("e3", 1, 30)], "edge string, version int, w int"
        ),
        "edges",
        keys=["edge"],
        version_col="version",
    )
    got = {r["edge"]: r["w"] for r in io.read("edges").collect()}
    assert got == {"e1": 10, "e2": 99, "e3": 30}
    assert not os.path.exists(str(tmp_path / "edges__staging"))
    assert not os.path.exists(str(tmp_path / "edges__old"))
    # idempotent second upsert with the same updates changes nothing
    io.upsert(
        spark.createDataFrame([("e3", 1, 30)], "edge string, version int, w int"),
        "edges", keys=["edge"], version_col="version",
    )
    assert {r["edge"]: r["w"] for r in io.read("edges").collect()} == got


def test_bucketed_tables_join_with_zero_exchange(spark, tmp_path):
    """write_bucketed lays both join sides out pre-hashed on the join key
    (catalog-recorded bucket spec), so the repeated edges ⋈ key-map join
    plans WITHOUT any Exchange — the shuffle is paid once at write time.
    The same join over bare parquet reads of the same data must show an
    Exchange, proving the bucketing (not the data size) removed it."""
    io = tableio.TableIO(spark, str(tmp_path))
    edges = spark.range(0, 2000).select(
        (F.col("id") % 97).cast("string").alias("subj_key"),
        F.col("id").alias("edge_id"),
    )
    keymap = spark.range(0, 97).select(
        F.col("id").cast("string").alias("subj_key"),
        F.concat(F.lit("canon"), (F.col("id") % 11).cast("string")).alias(
            "canonical_id"
        ),
    )
    io.write_bucketed(edges, "b_edges", "subj_key", n_buckets=4)
    io.write_bucketed(keymap, "b_keymap", "subj_key", n_buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = io.read_table("b_edges").join(
            io.read_table("b_keymap"), "subj_key"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # control: the identical join over pathwise parquet reads shuffles
        flat = spark.read.parquet(io._path("b_edges")).join(
            spark.read.parquet(io._path("b_keymap")), "subj_key"
        )
        flat_plan = flat._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in flat_plan
        # and the bucketed join is still correct
        assert joined.count() == 2000
        assert flat.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_edges")
        spark.sql("DROP TABLE IF EXISTS b_keymap")


def test_compact_reduces_files_preserving_content(spark, tmp_path):
    """Small-file maintenance: compact() rewrites a many-file table into few
    files with identical content — the cleanup job for tables grown by
    per-micro-batch appends."""
    import glob
    import os

    io = tableio.TableIO(spark, str(tmp_path / "wh_compact"))
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    io.write(df.repartition(16), "grown", mode="overwrite")
    n_before = len(glob.glob(os.path.join(io._path("grown"), "*.parquet")))
    assert n_before >= 16
    want = {(r.id, r.v) for r in io.read("grown").collect()}

    reported = io.compact("grown", target_files=2)
    assert reported == n_before
    n_after = len(glob.glob(os.path.join(io._path("grown"), "*.parquet")))
    assert n_after <= 2
    assert {(r.id, r.v) for r in io.read("grown").collect()} == want
