"""Unit tests for corpus-statistics text scoring (operators/textindex.py)
and substring-level dedup (dedup.substring_dup_stats): hand-computable
fixtures, degenerate inputs, and partition invariance.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from relationextractionpipeline_spark.operators import dedup, textindex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- k-grams


def test_kgram_join_windows(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b"), (3, ""), (4, "x")])
    out = (
        df.select(
            "doc_id",
            textindex.kgram_join(
                textindex.tokens_lower(F.col("text")), 3
            ).alias("g"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert out[0]["g"] == ["a b c", "b c d"]
    assert out[1]["g"] == []  # shorter than k
    assert out[2]["g"] == []  # blank text
    assert out[3]["g"] == []


def test_kgram_join_k1_is_tokens(spark):
    df = _docs(spark, [(1, "A b  a")])
    out = df.select(
        textindex.kgram_join(
            textindex.tokens_lower(F.col("text")), 1
        ).alias("g")
    ).collect()
    assert out[0]["g"] == ["a", "b", "a"]


def test_kgram_join_rejects_k0(spark):
    with pytest.raises(ValueError):
        textindex.kgram_join(F.col("x"), 0)


# ---------------------------------------------------------- bigram LM


def test_lm_scores_hand_computed(spark):
    # corpus: "a b" ×2 and "a c"; vocab {a,b,c} V=3, c1(a)=3,
    # c(a b)=2, c(a c)=1, k=0.5:
    #   p(b|a) = 2.5/4.5, p(c|a) = 1.5/4.5
    df = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    rows = {
        r["doc_id"]: r
        for r in textindex.ngram_lm_scores(df).collect()
    }
    p_ab, p_ac = 2.5 / 4.5, 1.5 / 4.5
    assert rows[1]["n_bigrams"] == 1
    assert rows[1]["cross_entropy"] == round(-math.log(p_ab), 6)
    assert rows[3]["cross_entropy"] == round(-math.log(p_ac), 6)
    assert rows[1]["perplexity"] == round(math.exp(-math.log(p_ab)), 6)
    # repeated doc scores identically
    assert rows[2]["cross_entropy"] == rows[1]["cross_entropy"]


def test_lm_scores_degenerate_docs(spark):
    df = _docs(spark, [(1, "a b"), (2, "solo"), (3, ""), (4, "   ")])
    rows = {
        r["doc_id"]: r
        for r in textindex.ngram_lm_scores(df).collect()
    }
    assert len(rows) == 4  # every input doc gets a row
    for did in (2, 3, 4):
        assert rows[did]["n_bigrams"] == 0
        assert rows[did]["cross_entropy"] == 0.0
        assert rows[did]["perplexity"] == 1.0


def test_lm_scores_multiplicity_weighting(spark):
    # "a b a b" has bigrams (a b), (b a), (a b): the repeated gram must
    # count twice in the mean (occurrences, not distinct grams)
    df = _docs(spark, [(1, "a b a b")])
    r = textindex.ngram_lm_scores(df).collect()[0]
    assert r["n_bigrams"] == 3
    # c(a b)=2, c1(a)=2, V=2 -> p=2.5/3.0 ; c(b a)=1, c1(b)=2 -> p=1.5/3.0
    expect = -(2 * math.log(2.5 / 3.0) + math.log(1.5 / 3.0)) / 3
    assert r["cross_entropy"] == pytest.approx(expect, abs=2e-6)


def test_lm_scores_partition_invariance(spark):
    df = _docs(
        spark,
        [(i, f"w{i % 3} w{(i + 1) % 4} w{i % 3} common") for i in range(40)],
    )
    a = sorted(
        map(tuple, textindex.ngram_lm_scores(df.repartition(1)).collect())
    )
    b = sorted(
        map(tuple, textindex.ngram_lm_scores(df.repartition(7)).collect())
    )
    assert a == b


# ------------------------------------------------------------------ BM25


def test_bm25_hand_computed(spark):
    # 3 docs, query = ["x"]: doc 1 has x twice (dl 4), doc 2 once (dl 2),
    # doc 3 none (dl 1).  N=3, df=2, avgdl=7/3.
    df = _docs(spark, [(1, "x y x z"), (2, "x y"), (3, "q")])
    out = textindex.bm25_scores(df, terms=["x"], top_k=10).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert [r["rank"] for r in out] == [1, 2]
    k1, b, avgdl = 1.2, 0.75, 7 / 3
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)

    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[0]["score"] == pytest.approx(score(2, 4), abs=2e-6)
    assert out[1]["score"] == pytest.approx(score(1, 2), abs=2e-6)
    assert out[0]["tf_x"] == 2 and out[1]["tf_x"] == 1


def test_bm25_rare_term_outranks_common(spark):
    rows = [(i, "common filler words here") for i in range(20)]
    rows.append((100, "rare common"))
    df = _docs(spark, rows)
    out = textindex.bm25_scores(df, terms=["rare", "common"], top_k=3).collect()
    assert out[0]["doc_id"] == 100  # the only doc with the high-idf term


def test_bm25_ties_break_by_doc_id(spark):
    df = _docs(spark, [(5, "t"), (3, "t"), (9, "t")])
    out = textindex.bm25_scores(df, terms=["t"], top_k=2).collect()
    assert [r["doc_id"] for r in out] == [3, 5]


def test_bm25_empty_terms_rejected(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        textindex.bm25_scores(df, terms=[])


# ------------------------------------------------- substring-level dedup


def test_substring_dup_flags_shared_span(spark):
    shared = "one two three four five"
    df = _docs(
        spark,
        [
            (1, f"{shared} alpha beta gamma delta"),
            (2, f"prefix words here {shared}"),
            (3, "entirely different text with no shared span at all"),
        ],
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.substring_dup_stats(df, k=5).collect()
    }
    # doc1: 5 windows, exactly 1 (the shared 5-gram) duplicated
    assert rows[1]["n_windows"] == 5
    assert rows[1]["n_dup_windows"] == 1
    assert rows[1]["dup_frac"] == 0.2
    assert rows[1]["is_dup"]  # 0.2 >= default flag threshold
    assert rows[2]["n_dup_windows"] == 1
    assert rows[3]["n_dup_windows"] == 0 and not rows[3]["is_dup"]


def test_substring_dup_counts_occurrences_not_distinct(spark):
    # the duplicated gram appears TWICE in doc 1 -> both occurrences count
    g = "a b c d e"
    df = _docs(spark, [(1, f"{g} {g}"), (2, g)])
    rows = {
        r["doc_id"]: r
        for r in dedup.substring_dup_stats(df, k=5).collect()
    }
    assert rows[1]["n_windows"] == 6
    assert rows[1]["n_dup_windows"] == 2
    assert rows[2]["n_dup_windows"] == 1


def test_substring_dup_within_doc_repeat_not_cross_doc(spark):
    # a gram repeated within ONE doc only is not duplicated (min_docs=2
    # counts distinct documents)
    g = "p q r s t"
    df = _docs(spark, [(1, f"{g} {g}"), (2, "nothing in common here")])
    rows = {
        r["doc_id"]: r
        for r in dedup.substring_dup_stats(df, k=5).collect()
    }
    assert rows[1]["n_dup_windows"] == 0


def test_substring_dup_short_and_blank_docs(spark):
    df = _docs(spark, [(1, "a b"), (2, ""), (3, "x y z a b")])
    rows = {
        r["doc_id"]: r
        for r in dedup.substring_dup_stats(df, k=5).collect()
    }
    assert len(rows) == 3
    assert rows[1]["n_windows"] == 0 and rows[1]["dup_frac"] == 0.0
    assert rows[2]["n_windows"] == 0
    assert rows[3]["n_windows"] == 1


def test_substring_dup_partition_invariance(spark):
    df = _docs(
        spark,
        [(i, f"w{i % 4} a b c d e f w{i % 3}") for i in range(30)],
    )
    a = sorted(
        map(tuple, dedup.substring_dup_stats(df.repartition(1), k=5).collect())
    )
    b = sorted(
        map(tuple, dedup.substring_dup_stats(df.repartition(6), k=5).collect())
    )
    assert a == b


def test_bm25_dotted_uppercase_duplicate_terms(spark):
    """Terms containing '.' must not be parsed as nested-field access,
    uppercase terms must match the lowercased tokens, and duplicates
    must not create ambiguous columns."""
    from relationextractionpipeline_spark.operators import textindex

    docs = spark.createDataFrame(
        [(1, "the u.s. economy and IBM"), (2, "ibm stock rises")],
        ["doc_id", "text"],
    )
    r = textindex.bm25_scores(docs, ["u.s.", "IBM", "IBM"], top_k=5)
    assert r.columns == ["doc_id", "tf_u.s.", "tf_IBM", "score", "rank"]
    rows = {x["doc_id"]: x for x in r.collect()}
    assert rows[1]["tf_IBM"] == 1 and rows[2]["tf_IBM"] == 1
    assert rows[1]["tf_u.s."] == 1 and rows[2]["tf_u.s."] == 0
