"""as-of join + sequence packing/chunking: semantics, determinism,
partition invariance."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from relationextractionpipeline_spark.operators.asof import asof_join
from relationextractionpipeline_spark.operators.packing import (
    chunk_documents,
    pack_documents,
    pack_sequences,
)


def _events(spark):
    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, "2024-01-01 10:00:00", "u1", "view", 1.0),
        (2, "2024-01-01 10:05:00", "u1", "view", 2.0),
        (3, "2024-01-01 10:05:00", "u1", "purchase", 9.0),  # ties view #2
        (4, "2024-01-01 11:00:00", "u1", "purchase", 9.5),
        (5, "2024-01-01 09:00:00", "u2", "purchase", 3.0),  # no prior view
        (6, "2024-01-01 09:30:00", "u2", "view", 4.0),
        (7, "2024-01-01 09:45:00", "u2", "purchase", 5.0),
        (8, "2024-01-01 10:05:00", "u3", "view", 6.0),
        (9, "2024-01-01 10:05:00", "u3", "view", 7.0),      # same-ts pair
        (10, "2024-01-01 10:06:00", "u3", "purchase", 8.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))


def _asof_pdf(spark, tolerance=None):
    e = _events(spark)
    out = asof_join(
        e.where(F.col("event_type") == "purchase"),
        e.where(F.col("event_type") == "view"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        right_order="event_id",
        tolerance_sec=tolerance,
    )
    pdf = out.toPandas().set_index("event_id").sort_index()
    return pdf


def test_asof_matches_latest_at_or_before(spark):
    pdf = _asof_pdf(spark)
    # purchase 3 at 10:05 matches view 2 at the SAME ts (inclusive)
    assert pdf.loc[3, "matched_event_id"] == 2
    assert pdf.loc[4, "matched_event_id"] == 2
    # purchase 5 predates every view for u2 -> null match
    assert pdf.loc[5, ["matched_event_id"]].isna().all()
    assert pdf.loc[7, "matched_event_id"] == 6
    # same-ts right rows: greatest right_order wins
    assert pdf.loc[10, "matched_event_id"] == 9
    assert pdf.loc[10, "matched_value"] == 7.0
    # left columns survive untouched
    assert set(pdf.columns) >= {"user_id", "event_type", "value",
                                "matched_ts", "matched_event_id",
                                "matched_value"}


def test_asof_tolerance_nulls_stale_matches(spark):
    pdf = _asof_pdf(spark, tolerance=600)
    # purchase 4 is 55 min after view 2 -> outside a 10-min window
    assert pdf.loc[4, ["matched_event_id", "matched_value"]].isna().all()
    # purchase 3 (0 sec gap) and 10 (60 sec) stay matched
    assert pdf.loc[3, "matched_event_id"] == 2
    assert pdf.loc[10, "matched_event_id"] == 9


def test_asof_partition_invariance(spark):
    e = _events(spark)
    kw = dict(on=["user_id"], left_ts="ts", right_ts="ts",
              right_cols=["event_id"], right_order="event_id")
    a = asof_join(e.where("event_type = 'purchase'"),
                  e.where("event_type = 'view'"), **kw)
    b = asof_join(e.where("event_type = 'purchase'").repartition(7),
                  e.where("event_type = 'view'").coalesce(1), **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_sequences_streaming_concat_semantics(spark):
    df = spark.createDataFrame(
        [("d1", 3), ("d2", 4), ("d3", 2), ("d4", 8), ("d5", 1)],
        "doc_id string, n long",
    )
    got = {
        r["doc_id"]: (r["pack_id"], r["offset_in_pack"])
        for r in pack_sequences(df, "n", ctx_len=5).collect()
    }
    # cum_before: d1=0 d2=3 d3=7 d4=9 d5=17
    assert got == {
        "d1": (0, 0), "d2": (0, 3), "d3": (1, 2), "d4": (1, 4), "d5": (3, 2),
    }


def test_pack_sequences_partition_invariant(spark, tiny_paths):
    docs = spark.createDataFrame(
        [(f"d{i:04d}", (i * 37) % 90 + 1) for i in range(500)],
        "doc_id string, n long",
    )
    multi = pack_sequences(docs.repartition(11), "n", 7)
    single = pack_sequences(docs.coalesce(1), "n", 7)
    assert sorted(map(tuple, multi.collect())) == sorted(
        map(tuple, single.collect())
    )


def test_pack_documents_counts_match_token_stats(spark):
    docs = spark.createDataFrame(
        [("a", "Hallo Welt ! 123"), ("b", ""), ("c", "ein zwei drei")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in pack_documents(docs, 8).collect()}
    assert rows["a"]["n_tokens"] == 4  # Hallo, Welt, !, 123
    assert rows["b"]["n_tokens"] == 0
    # id order a,b,c: a -> (0,0); b is empty but still lands at the
    # current boundary (cum_before 4); c follows at the same spot
    assert (rows["a"]["pack_id"], rows["a"]["offset_in_pack"]) == (0, 0)
    assert (rows["b"]["pack_id"], rows["b"]["offset_in_pack"]) == (0, 4)
    assert (rows["c"]["pack_id"], rows["c"]["offset_in_pack"]) == (0, 4)


@pytest.mark.parametrize("ctx,overlap", [(4, 0), (4, 2), (6, 1)])
def test_chunk_documents_reconstructs_token_stream(spark, ctx, overlap):
    texts = [
        ("a", "eins zwei drei vier fuenf sechs sieben acht neun"),
        ("b", "kurz"),
        ("c", ""),
        ("d", "genau vier kleine tokens"),
    ]
    docs = spark.createDataFrame(texts, "doc_id string, text string")
    out = chunk_documents(docs, ctx, overlap).collect()
    stride = ctx - overlap
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in texts:
        toks = text.split()
        chunks = by_doc[doc_id]
        # every chunk at most ctx tokens; stride-aligned starts
        rebuilt = []
        for i, r in enumerate(chunks):
            ctoks = r["chunk_text"].split() if r["chunk_text"] else []
            assert r["n_chunk_tokens"] == len(ctoks) <= ctx
            assert ctoks == toks[i * stride: i * stride + ctx]
            rebuilt.extend(ctoks if i == 0 else ctoks[overlap:])
        assert rebuilt == toks
        # no trailing all-overlap chunk
        if len(chunks) > 1:
            assert chunks[-1]["n_chunk_tokens"] > overlap


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_asof_matches_pandas_merge_asof(spark, seed):
    """Independent-oracle check: pandas.merge_asof (direction='backward',
    allow_exact_matches=True) implements the same contract with a
    completely different algorithm.  Random interleaved events, duplicate
    timestamps included; right side pre-sorted by (ts, event_id) so
    merge_asof's last-wins tie rule equals our greatest-right_order rule."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    n = 240
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            # coarse grid forces duplicate timestamps across and within keys
            "ts": pd.to_datetime(
                rng.integers(0, 50, n) * 60, unit="s", origin="2024-01-01"
            ),
            "user_id": rng.integers(0, 8, n).astype("int64"),
            "event_type": rng.choice(["purchase", "view"], n),
            "value": np.round(rng.random(n), 3),
        }
    )
    e = spark.createDataFrame(pdf)
    got = (
        asof_join(
            e.where("event_type = 'purchase'").select("event_id", "ts", "user_id"),
            e.where("event_type = 'view'"),
            on=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["event_id", "value"],
            right_order="event_id",
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    left = (
        pdf[pdf.event_type == "purchase"][["event_id", "ts", "user_id"]]
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    right = (
        pdf[pdf.event_type == "view"][["ts", "user_id", "event_id", "value"]]
        .rename(columns={"event_id": "m_id", "value": "m_val"})
        .sort_values(["ts", "m_id"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left, right, on="ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert (
        got["matched_event_id"].fillna(-1).astype("int64").tolist()
        == want["m_id"].fillna(-1).astype("int64").tolist()
    )
    assert (
        got["matched_value"].fillna(-1.0).tolist()
        == want["m_val"].fillna(-1.0).tolist()
    )


def test_negative_samples_contract(spark):
    from relationextractionpipeline_spark.operators.negatives import (
        entity_index,
        negative_samples,
    )

    ents = spark.createDataFrame(
        [(f"e{i}",) for i in range(10)], "canonical_id string"
    )
    triples = spark.createDataFrame(
        [("e0", "knows", "e1"), ("e0", "knows", "e2"), ("e3", "likes", "e4"),
         ("e0", "knows", "e1")],  # duplicate collapses
        "subj string, pred string, obj string",
    )
    out = negative_samples(triples, ents, k=4).toPandas()
    # dense index is the 0-based id-order rank
    idx = {r["canonical_id"]: r["ent_idx"]
           for r in entity_index(ents).collect()}
    assert idx == {f"e{i}": i for i in range(10)}
    # per-triple budget respected; no negative equals the true object or
    # reconstructs a true triple
    true_set = {("e0", "knows", "e1"), ("e0", "knows", "e2"),
                ("e3", "likes", "e4")}
    assert 0 < len(out) <= 3 * 4
    for r in out.itertuples(index=False):
        assert (r.subj, r.pred, r.obj) in true_set
        assert r.neg_obj != r.obj
        assert (r.subj, r.pred, r.neg_obj) not in true_set
    # deterministic + partition-invariant
    again = negative_samples(triples.repartition(5), ents.coalesce(1), k=4).toPandas()
    key = ["subj", "pred", "obj", "neg_k"]
    a = out.sort_values(key).reset_index(drop=True)
    b = again.sort_values(key).reset_index(drop=True)
    import pandas.testing as pdt

    pdt.assert_frame_equal(a, b)


def test_asof_composite_key(spark):
    rows = [
        # (event_id, ts, user_id, region, event_type)
        (1, "2024-01-01 10:00:00", "u1", "eu", "view"),
        (2, "2024-01-01 10:01:00", "u1", "us", "view"),
        (3, "2024-01-01 10:02:00", "u1", "eu", "purchase"),
        (4, "2024-01-01 10:02:00", "u1", "us", "purchase"),
        (5, "2024-01-01 10:03:00", "u2", "eu", "purchase"),  # no u2/eu view
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts string, user_id string, region string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    pdf = asof_join(
        e.where("event_type = 'purchase'"),
        e.where("event_type = 'view'"),
        on=["user_id", "region"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        right_order="event_id",
    ).toPandas().set_index("event_id").sort_index()
    # matches respect BOTH key columns
    assert pdf.loc[3, "matched_event_id"] == 1
    assert pdf.loc[4, "matched_event_id"] == 2
    assert pdf.loc[5, ["matched_event_id"]].isna().all()


def test_asof_null_payload_column_is_not_stitched_across_rows(spark):
    """The carried match must be ONE right row: when the winning right row
    has a null payload column, per-column carry-forward used to surface
    the previous row's non-null value next to the winner's other columns
    — a chimera row no right row ever contained."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [("k", t(30), "L")], "k string, ts timestamp, l string"
    )
    right = spark.createDataFrame(
        [("k", t(1), 5.0, "a", 1), ("k", t(2), None, "b", 2)],
        "k string, ts timestamp, val double, tag string, event_id long",
    )
    out = asof_join(
        left, right, ["k"], "ts", "ts", ["val", "tag"], "event_id"
    ).collect()[0]
    assert out["matched_tag"] == "b"
    assert out["matched_val"] is None  # the WINNER's null, not row a's 5.0
