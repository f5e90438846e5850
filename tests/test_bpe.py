"""BPE tokenizer training (operators/bpe.py): sequential rule fixtures +
distributed ≡ sequential equality + application stats."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from relationextractionpipeline_spark.operators import bpe


SENNRICH_FREQS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_seq_on_the_paper_example():
    merges = bpe.train_bpe_seq(SENNRICH_FREQS, 4)
    # round 0: (e,s) and (s,t</w>) tie at 9 — lexicographic tie-break
    # picks (e,s); then (es,t</w>) 9, then (est</w>,?) vs (l,o) 7 ...
    assert merges[0][1:4] == ("e", "s", "es")
    assert merges[0][4] == 9
    assert merges[1][1:4] == ("es", "t</w>", "est</w>")
    assert merges[1][4] == 9
    assert merges[2][1:4] == ("l", "o", "lo")
    assert merges[2][4] == 7
    # ranks are dense from 0
    assert [m[0] for m in merges] == [0, 1, 2, 3]


def test_greedy_fold_matches_seq_on_overlaps(spark):
    # rule (a,a) over 'aaaa' must give [aa, aa]; over 'aaa' → [aa, a</w>]
    df = spark.createDataFrame([("aaaa",), ("aaa",)], "word string")
    out = df.select(
        bpe._merge_fold(bpe.initial_symbols_col(F.col("word")), "a", "a").alias("s")
    ).collect()
    # distributed fold ≡ sequential fold, per word (the sequential fold's
    # own semantics are pinned by test_train_seq_on_the_paper_example)
    for row, word in zip(out, ["aaaa", "aaa"]):
        assert tuple(row["s"]) == bpe._apply_merge_seq(
            bpe.initial_symbols(word), "a", "a"
        )


def test_initial_symbols_edges(spark):
    df = spark.createDataFrame([("x",), ("ab",)], "word string")
    got = [r["s"] for r in df.select(
        bpe.initial_symbols_col(F.col("word")).alias("s")).collect()]
    assert got == [["x</w>"], ["a", "b</w>"]]
    assert bpe.initial_symbols("") == ()


def test_distributed_training_equals_sequential(spark):
    texts = [
        "low low low low low lower lower",
        "newest newest newest widest",
        "newest newest newest widest widest",
        "the low bar and the newest bar",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wc = {
        r["word"]: r["freq"] for r in bpe.word_counts(docs).collect()
    }
    expect = bpe.train_bpe_seq(wc, 12)
    got = bpe.train_bpe(docs, 12, checkpoint_every=4)
    assert [tuple(r) for r in got.itertuples(index=False)] == expect


def test_train_stops_early_when_no_pairs_remain(spark):
    docs = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    merges = bpe.train_bpe(docs, 50)
    # single-char words: nothing to merge at all
    assert len(merges) == 0


def test_encode_word_reproduces_training_segmentation():
    merges = bpe.train_bpe_seq(SENNRICH_FREQS, 10)
    ranks = {(m[1], m[2]): m[0] for m in merges}
    # replay training's folds on each word and compare with rank-apply
    for word in SENNRICH_FREQS:
        sym = bpe.initial_symbols(word)
        for _, left, right, _, _ in merges:
            sym = bpe._apply_merge_seq(sym, left, right)
        assert tuple(bpe.encode_word(word, ranks)) == sym
    # unseen word still tokenizes (falls back toward characters)
    assert bpe.encode_word("zzz", ranks) == ["z", "z", "z</w>"]


def test_bpe_token_stats_matches_sequential(spark):
    texts = ["low lower newest", "widest widest low", "", "LOW Newest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_pdf = pd.DataFrame(
        bpe.train_bpe_seq(SENNRICH_FREQS, 6),
        columns=["rank", "left", "right", "merged", "pair_count"],
    )
    ranks = {(r.left, r.right): int(r.rank)
             for r in merges_pdf.itertuples(index=False)}
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["bpe_per_word"])
           for r in bpe.bpe_token_stats(docs, merges_pdf).collect()}
    for i, t in enumerate(texts):
        ws = t.lower().split()
        n_tok = sum(len(bpe.encode_word(w, ranks)) for w in ws)
        assert got[i][0] == len(ws)
        assert got[i][1] == n_tok
        if ws:
            assert got[i][2] == pytest.approx(round(n_tok / len(ws), 6))
        else:
            assert got[i][2] is None


def test_bpe_vocab_matches_sequential(spark):
    texts = ["low lower newest", "widest widest low low", "newest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_pdf = bpe.train_bpe(docs, 8)
    ranks = {(r.left, r.right): int(r.rank)
             for r in merges_pdf.itertuples(index=False)}
    # sequential expectation: encode distinct words, weight by frequency
    freqs = {}
    for t in texts:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    expect = {}
    for w, f in freqs.items():
        for tok in bpe.encode_word(w, ranks):
            expect[tok] = expect.get(tok, 0) + f
    got = {r["token"]: r["freq"] for r in bpe.bpe_vocab(docs, merges_pdf).collect()}
    assert got == expect
    # token mass conservation: vocab freq total == total encoded tokens
    assert sum(got.values()) == sum(
        len(bpe.encode_word(w, ranks)) * f for w, f in freqs.items()
    )


# ---------------------------------------------------------------------------
# Batched training (batch_size > 1)
# ---------------------------------------------------------------------------


def test_batched_seq_equals_classic_when_batch_is_1():
    assert bpe.train_bpe_seq(SENNRICH_FREQS, 8) == bpe.train_bpe_seq(
        SENNRICH_FREQS, 8, batch_size=1
    )


def test_batch_selection_is_symbol_disjoint():
    cands = [
        ("e", "s", 9), ("s", "t", 9), ("es", "t", 8), ("l", "o", 7),
        ("o", "w", 7), ("a", "b", 6), ("c", "d", 5), ("ab", "x", 4),
    ]
    batch = bpe.select_merge_batch(cands, 5)
    # greedy order respected; (s,t) skipped (s touched), (es,t) skipped
    # (t touched via nothing? no — t untouched until (s,t) REJECTED, but
    # es touched), (o,w) skipped (o touched), (ab,x) skipped (ab == a+b
    # merged symbol of an accepted pair)
    assert batch == [("e", "s", 9), ("l", "o", 7), ("a", "b", 6), ("c", "d", 5)]
    touched = set()
    for left, right, _ in batch:
        assert left not in touched and right not in touched
        assert left + right not in touched
        touched.update((left, right, left + right))


def test_batch_fold_equals_sequential_rule_folds(spark):
    rules = [("a", "b"), ("c", "d")]
    # no empty word: word tables come from a whitespace split, which never
    # emits "" (initial_symbols_col is only defined over that domain)
    words = ["abcd", "cabd", "aabb", "acdb", "a", "abab", "cdcd"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    out = df.select(
        bpe._merge_fold_batch(
            bpe.initial_symbols_col(F.col("word")), rules
        ).alias("s")
    ).collect()
    for row, word in zip(out, words):
        sym = bpe.initial_symbols(word)
        for left, right in rules:
            sym = bpe._apply_merge_seq(sym, left, right)
        assert tuple(row["s"]) == sym


def test_distributed_batched_training_equals_sequential(spark):
    texts = [
        "low low low low low lower lower",
        "newest newest newest widest",
        "newest newest newest widest widest",
        "the low bar and the newest bar",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wc = {r["word"]: r["freq"] for r in bpe.word_counts(docs).collect()}
    for bs in (3, 8):
        expect = bpe.train_bpe_seq(wc, 13, batch_size=bs)
        got = bpe.train_bpe(docs, 13, checkpoint_every=6, batch_size=bs)
        assert [tuple(r) for r in got.itertuples(index=False)] == expect
