"""Skew utilities: detection, salting, two-phase assembly equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from relationextractionpipeline_spark.operators import assemble, skew


def test_hot_keys_detects_planted_skew(spark):
    rows = [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)]
    df = spark.createDataFrame(rows, ["k", "v"])
    hk = skew.hot_keys(df, ["k"], min_count=100).collect()
    assert [r["k"] for r in hk] == ["hot"]


def test_salted_repartition_spreads_hot_key(spark):
    rows = [("hot", i) for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = skew.salted_repartition(df, "k", num_partitions=8, salt_buckets=8)
    pid_counts = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    # one hot key must not land on one partition
    assert len(pid_counts) >= 4
    assert max(r["count"] for r in pid_counts) < 2000


def test_skew_aware_assembly_matches_plain(spark, tiny_paths):
    t = spark.read.parquet(tiny_paths["transcripts"])
    plain = (
        assemble.assemble_conversations(t)
        .select("conv_id", "n_turns", "doc_text")
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    two_phase = (
        skew.assemble_conversations_skew_aware(t, bucket_turns=4)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(plain, two_phase)


def test_skew_aware_assembly_matches_batch_on_all_null_bucket(spark):
    """A bucket whose texts are all null must contribute NOTHING to
    doc_text (batch array_join skips nulls element-wise); the two-phase
    merge used to emit the empty bucket string plus a spurious '\\n'."""
    from relationextractionpipeline_spark.operators import assemble

    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    rows = [("c", i, "user", None, None, ts) for i in range(3)] + [
        ("c", 3, "user", "hello", None, ts)
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    batch = assemble.assemble_conversations(t).collect()[0]
    two_phase = skew.assemble_conversations_skew_aware(
        t, bucket_turns=2
    ).collect()[0]
    assert batch["doc_text"] == "hello"
    assert two_phase["doc_text"] == batch["doc_text"]
    assert two_phase["n_turns"] == batch["n_turns"] == 4
