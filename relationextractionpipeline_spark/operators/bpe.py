"""Distributed BPE tokenizer training + application.

A training-data pipeline that feeds an LLM needs the tokenizer itself
trained on the corpus it curates — byte-pair encoding (Sennrich, Haddow &
Birch 2016, ACL: "Neural Machine Translation of Rare Words with Subword
Units") is the standard.  The reference stops at triple emission
(de_pipeline/pipeline.py:69-77); this is a beyond-reference curation
operator like dedup/quality/packing.

Spark-first decomposition — BPE's training state is NOT the corpus, it is
the **word-frequency table** (the classic reduction from the paper):

1. ``word_counts``: one explode + groupBy over the documents — after this,
   a 100 TB corpus has collapsed to its unique-word table (tens of millions
   of rows, not billions), which stays DISTRIBUTED here, unlike in-memory
   trainers.
2. Each word becomes a symbol array: characters, with the final character
   carrying an end-of-word marker (``</w>``) so merges never cross word
   boundaries and word-final units are distinct.
3. Per merge round: adjacent-pair counts are a zip_with-explode + groupBy
   SUM weighted by word frequency (map-side partial aggregation does the
   heavy lifting — the shuffle carries one row per distinct pair per
   partition); the argmax pair (count desc, then lexicographic — the
   deterministic tie-break the sequential replica mirrors) is a 1-row
   collect; applying the merge to every word is a row-local ``F.aggregate``
   fold (greedy left-to-right, exactly the paper's re-pair semantics), no
   Python in the loop.
4. Lineage discipline for the iteration: the symbol table is
   ``localCheckpoint``-ed every ``checkpoint_every`` rounds with the
   superseded round freed eagerly (the CC-loop pattern,
   operators/canonicalize.py) — working set stays O(one word table)
   regardless of merge count.

Scale notes: each round costs one shuffle over the unique-word table —
independent of corpus size after step 1.  Real 100 TB runs train on a
deterministic sample anyway (pass ``docs.sample(...)`` or a
sampling-operator output); the word table is the scale knob.

**Batched merges** (``batch_size > 1``): a 32k-entry production vocabulary
cannot afford 32k sequential shuffle rounds, so each round may learn up to
``batch_size`` SYMBOL-DISJOINT merges (no accepted pair shares a left /
right / merged symbol with another) — disjointness makes the batch
order-independent: no merge can consume a symbol another needs, and a
merged token can never feed another rule in the same pass, so applying the
batch in one left-to-right fold is provably identical to applying each
rule's own fold in sequence (``test_bpe.py`` pins this).  The selection
rule (scan the top ``4×batch_size`` candidates in (count desc, left,
right) order, greedily accept disjoint pairs) lives in ONE function,
``select_merge_batch``, called by both the distributed trainer and the
sequential replica — the two sides cannot diverge by construction.
``batch_size=1`` degenerates to classic Sennrich BPE exactly.  Batched
training is the standard production variant (pair counts of disjoint
pairs are unchanged by each other's application; only the relative rank
of a *newly created* pair vs. the tail of the batch can differ from the
strictly sequential schedule — a bounded, documented deviation).

Application (``encode_word`` / ``bpe_token_stats``) uses the learned merge
RANKS: repeatedly merge the lowest-rank adjacent pair (the paper's greedy
apply).  Per-document work is a vectorized pandas UDF over Arrow batches
with an per-batch word memo (Zipf makes the memo hit rate ~99%); the merge
table rides a broadcast — vectors of text never shuffle.

Sequential replica for the driver gate: ``train_bpe_seq`` — same counts,
same tie-break, pure Python — lives HERE so operator and oracle share one
definition of the algorithm while the distributed path is gated against it
(the kg_entities pattern: the gate proves the DISTRIBUTION, pytest fixtures
prove the rule).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import cache
from .quality import words

EOW = "</w>"

MERGES_SCHEMA = StructType(
    [
        StructField("rank", LongType()),
        StructField("left", StringType()),
        StructField("right", StringType()),
        StructField("merged", StringType()),
        StructField("pair_count", LongType()),
    ]
)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased whitespace words — the corpus→vocab
    collapse.  One shuffle; partial aggregation happens map-side."""
    return (
        docs.select(F.explode(words(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols_col(word):
    """Characters of ``word``, last one suffixed with the end-of-word
    marker: 'ab' → ['a', 'b</w>'].  Empty words → empty array."""
    chars = F.split(word, "")
    n = F.size(chars)
    return F.when(n == 0, chars).otherwise(
        F.concat(
            F.slice(chars, 1, n - F.lit(1)),
            F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
        )
    )


def _merge_fold(sym, left: str, right: str):
    """Greedy left-to-right application of one merge rule to a symbol
    array, as a row-local fold: append each symbol unless it is ``right``
    and the accumulator currently ends in ``left`` — then the tail becomes
    the merged token.  The merged token immediately re-participates as a
    LEFT (so rule (a,a) turns 'aaaa' into [aa, aa]), which is exactly the
    paper's re-pair semantics."""
    merged = left + right
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - F.lit(1)), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def select_merge_batch(
    candidates: List[Tuple[str, str, int]], batch_size: int
) -> List[Tuple[str, str, int]]:
    """THE shared batch-selection rule (distributed trainer and sequential
    replica both call this — they cannot diverge): scan ``candidates`` in
    the given order (callers pass (count desc, left asc, right asc)) and
    greedily accept up to ``batch_size`` pairs that are symbol-disjoint
    from every previously accepted pair (left, right, AND merged symbol all
    unseen).  Disjointness is what makes one-pass batch application equal
    to sequential per-rule application — see the module docstring."""
    batch: List[Tuple[str, str, int]] = []
    touched: set = set()
    for left, right, cnt in candidates:
        if len(batch) >= batch_size:
            break
        merged = left + right
        if left in touched or right in touched or merged in touched:
            continue
        batch.append((left, right, int(cnt)))
        touched.update((left, right, merged))
    return batch


def _merge_fold_batch(sym, rules: List[Tuple[str, str]]):
    """One left-to-right fold applying a whole symbol-disjoint batch: at
    most one rule can match any (tail, next) position (disjointness), so a
    chained ``when`` per rule inside a single ``F.aggregate`` is exactly
    the sequential composition of the rules' individual folds."""
    def step(acc, s):
        out = F.concat(acc, F.array(s))
        for left, right in rules:
            hit = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (s == F.lit(right))
            )
            out = F.when(
                hit,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - F.lit(1)),
                    F.array(F.lit(left + right)),
                ),
            ).otherwise(out)
        return out

    return F.aggregate(sym, F.array().cast("array<string>"), step)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word frequency.  zip_with over two
    shifted slices (O(n) per row — the kgram_join lesson), explode, one
    groupBy SUM."""
    n = F.size("sym")
    width = n - F.lit(1)
    pairs = F.zip_with(
        F.slice("sym", 1, width),
        F.slice("sym", 2, width),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        vocab.where(n >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.left", "p.right")
        .agg(F.sum("freq").alias("pair_count"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
    batch_size: int = 1,
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus, distributed.

    ``batch_size=1`` (default) is classic Sennrich BPE: one pair-count
    shuffle + 1-row argmax collect + one fold per merge.  ``batch_size>1``
    learns up to that many symbol-disjoint merges per round
    (``select_merge_batch`` — the shared rule), cutting the number of
    sequential Spark jobs ~batch_size× — the knob that makes a 32k-entry
    vocabulary trainable (32k rounds is not a schedulable job count; 4k
    is).  Returns the merge table as a small pandas frame (rank, left,
    right, merged, pair_count) — tokenizer metadata (thousands of rows),
    not data; callers broadcast it into ``bpe_token_stats``.  Stops early
    if no pair remains (tiny corpora)."""
    vocab = word_counts(docs, text_col).withColumn(
        "sym", initial_symbols_col(F.col("word"))
    ).select("sym", "freq")
    vocab = prev_ck = cache.checkpoint(vocab)
    merges: List[Tuple[int, str, str, str, int]] = []
    since_ck = 0
    while len(merges) < n_merges:
        remaining = n_merges - len(merges)
        want = min(batch_size, remaining)
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(4 * batch_size)
            .collect()
        )
        batch = select_merge_batch(
            [(r["left"], r["right"], r["pair_count"]) for r in top], want
        )
        if not batch:
            break
        for left, right, cnt in batch:
            merges.append((len(merges), left, right, left + right, cnt))
        vocab = vocab.withColumn(
            "sym",
            _merge_fold_batch(F.col("sym"), [(l, r) for l, r, _ in batch]),
        )
        since_ck += len(batch)
        if since_ck >= checkpoint_every:
            # CC-loop discipline: checkpoint the new round, free ONLY the
            # superseded round's blocks (never release_all — other
            # operators' checkpoints are not ours to drop)
            vocab = cache.checkpoint(vocab)
            cache.free_checkpoint(prev_ck)
            prev_ck = vocab
            since_ck = 0
    # everything is collected (merge list is plain Python) — the last
    # checkpoint has no live dependents, free it on exit
    cache.free_checkpoint(prev_ck)
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "merged", "pair_count"]
    )


# ---------------------------------------------------------------------------
# Sequential replica (shared rule definition for the oracle + fixtures)
# ---------------------------------------------------------------------------


def initial_symbols(word: str) -> Tuple[str, ...]:
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _apply_merge_seq(sym: Tuple[str, ...], left: str, right: str) -> Tuple[str, ...]:
    out: List[str] = []
    for s in sym:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return tuple(out)


def train_bpe_seq(
    word_freqs: Dict[str, int], n_merges: int, batch_size: int = 1
) -> List[Tuple[int, str, str, str, int]]:
    """Pure-Python replica of ``train_bpe`` over a word→freq dict: same
    pair counting, same (count desc, left asc, right asc) tie-break, the
    SAME ``select_merge_batch`` call over the same top-``4×batch_size``
    candidate window, same greedy fold.  The driver gate compares the
    distributed trainer's output to this, proving shuffle/fold/argmax
    plumbing."""
    vocab: Dict[Tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        s = initial_symbols(w)
        if s:
            vocab[s] = vocab.get(s, 0) + f
    merges: List[Tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges:
        counts: Dict[Tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        candidates = sorted(
            ((l, r, c) for (l, r), c in counts.items()),
            key=lambda x: (-x[2], x[0], x[1]),
        )[: 4 * batch_size]
        batch = select_merge_batch(
            candidates, min(batch_size, n_merges - len(merges))
        )
        if not batch:
            break
        for left, right, cnt in batch:
            merges.append((len(merges), left, right, left + right, cnt))
            new_vocab: Dict[Tuple[str, ...], int] = {}
            for sym, f in vocab.items():
                ns = _apply_merge_seq(sym, left, right)
                new_vocab[ns] = new_vocab.get(ns, 0) + f
            vocab = new_vocab
    return merges


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Tokenize one word with learned merge ranks: repeatedly merge the
    lowest-rank adjacent pair (ties by position are impossible — equal
    pairs merge in one pass, and distinct pairs never share a rank)."""
    sym = list(initial_symbols(word))
    while len(sym) >= 2:
        best_rank, best_pair = None, None
        for a, b in zip(sym, sym[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        sym = list(_apply_merge_seq(tuple(sym), best_pair[0], best_pair[1]))
    return sym


def bpe_vocab(
    docs: DataFrame, merges: pd.DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus subword vocabulary under a learned merge table: one row per
    BPE token with its total corpus occurrence count — the artifact a
    tokenizer ships with, and the coverage diagnostic (which merges earn
    their slot).

    Same distribution shape as training's step 1: encode per word AFTER
    collapsing the corpus to its unique-word table (encode each distinct
    word once, weighted by frequency — not once per occurrence), explode
    the symbols, one weighted groupBy.  The pandas UDF crosses Arrow with
    (word, freq) rows only."""
    ranks = {
        (r.left, r.right): int(r.rank) for r in merges.itertuples(index=False)
    }

    out_schema = StructType(
        [
            StructField("token", StringType()),
            StructField("freq", LongType()),
        ]
    )

    def encode(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            toks: List[str] = []
            freqs: List[int] = []
            for w, f in zip(pdf["word"], pdf["freq"]):
                for t in encode_word(w, ranks):
                    toks.append(t)
                    freqs.append(int(f))
            yield pd.DataFrame({"token": toks, "freq": freqs})

    return (
        word_counts(docs, text_col)
        .mapInPandas(encode, out_schema)
        .groupBy("token")
        .agg(F.sum("freq").alias("freq"))
    )


def bpe_token_stats(
    docs: DataFrame, merges: pd.DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document BPE statistics under a learned merge table:
    ``n_bpe_tokens``, ``n_words``, and ``bpe_per_word`` (the fertility
    metric that decides whether a tokenizer fits a corpus).

    The merge table rides the UDF closure (broadcast-sized tokenizer
    metadata); the documents never shuffle — scan → mapInPandas → project.
    A per-batch word→len memo exploits Zipf: each distinct word is encoded
    once per Arrow batch."""
    ranks = {
        (r.left, r.right): int(r.rank) for r in merges.itertuples(index=False)
    }

    out_schema = StructType(
        [
            StructField("doc_id", docs.schema["doc_id"].dataType),
            StructField("n_words", LongType()),
            StructField("n_bpe_tokens", LongType()),
        ]
    )

    def score(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        memo: Dict[str, int] = {}

        def doc_tokens(text: str) -> int:
            total = 0
            for w in (text or "").lower().split():
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    memo[w] = n
                total += n
            return total

        for pdf in batches:
            texts = pdf[text_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": texts.map(
                        lambda t: len((t or "").lower().split())
                    ).astype("int64"),
                    "n_bpe_tokens": texts.map(doc_tokens).astype("int64"),
                }
            )

    stats = docs.select("doc_id", text_col).mapInPandas(score, out_schema)
    return stats.select(
        "doc_id",
        "n_words",
        "n_bpe_tokens",
        F.round(
            F.when(F.col("n_words") > 0, F.col("n_bpe_tokens") / F.col("n_words")),
            6,
        ).alias("bpe_per_word"),
    )
