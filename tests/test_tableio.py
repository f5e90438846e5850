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
