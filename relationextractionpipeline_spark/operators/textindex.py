"""Corpus-statistics text scoring: n-gram LM perplexity (quality signal)
and BM25 keyword retrieval.

Both are standard training-data-curation surfaces the reference lacks (it
stops at triple emission, de_pipeline/pipeline.py:69-77):

* ``ngram_lm_scores`` is the CCNet-style perplexity filter (Wenzek et al.
  2020): train a smoothed bigram LM on the corpus itself, score every
  document by cross-entropy, drop the tails.  Here the LM *training* and
  the *scoring* are one distributed job — gram counting is a groupBy, the
  probability table is a join, nothing crosses to Python.
* ``bm25_scores`` is Okapi BM25 keyword search over the corpus.  With a
  bounded query-term list the whole computation is ROW-LOCAL: per-term
  ``tf`` comes from ``F.filter`` over the token array (no posting-list
  shuffle at all), the corpus statistics (N, avgdl, per-term df) are ONE
  aggregate row collected to the driver (an O(#terms) transfer, not data),
  and the top-k is a TakeOrderedAndProject — the plan a 100 TB scan wants.

Float contract: probabilities are exact ((c+k)/(c'+kV) over integer counts
is correctly rounded in any IEEE engine); ln/exp and the per-doc sums are
subject to summation-order and last-ulp drift, absorbed by round(·, 6) —
the same tolerance discipline as kg_cooccurrence_pmi and the ANN cosine
queries.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F

from . import cache
from .quality import words


def tokens_lower(text_col: Column) -> Column:
    """Lowercased whitespace tokens; empty/blank text → empty array (the
    corpus-wide convention, quality.with_token_stats)."""
    return F.when(
        F.length(F.trim(text_col)) == 0, F.array().cast("array<string>")
    ).otherwise(words(F.lower(text_col)))


def kgram_join(w: Column, k: int, sep: str = " ") -> Column:
    """All length-``k`` sliding windows of token array ``w``, each joined
    with ``sep`` — O(n·k) per row via k shifted slices zipped pairwise
    (NOT transform(sequence, i -> slice): per-index slice copies are
    quadratic in document length — the q_repetition lesson,
    operators/quality.py:194).  Rows with fewer than k tokens yield an
    empty array."""
    if k < 1:
        raise ValueError("k must be >= 1")
    n = F.size(w)
    width = n - F.lit(k - 1)
    g = F.slice(w, 1, width)
    for i in range(1, k):
        g = F.zip_with(
            g,
            F.slice(w, i + 1, width),
            lambda a, b: F.concat(a, F.lit(sep), b),
        )
    return F.when(n >= k, g).otherwise(F.array().cast("array<string>"))


def bigram_pairs(w: Column) -> Column:
    """Adjacent (w1, w2) struct pairs of token array ``w`` — the O(n)
    shifted-zip form."""
    return F.when(
        F.size(w) >= 2,
        F.zip_with(
            F.slice(w, 1, F.size(w) - 1),
            F.slice(w, 2, F.size(w) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )


def ngram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
) -> DataFrame:
    """Bigram-LM cross-entropy / perplexity per document, with the LM
    trained on the documents themselves (add-k smoothed):

        p(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V)

    where c(·) are corpus counts and V the unigram vocabulary size.
    Returns one row per input document:
    (id, n_bigrams, cross_entropy, perplexity), cross_entropy =
    mean over bigram OCCURRENCES of −ln p (0.0 for <2-token docs,
    perplexity 1.0), both rounded to 6 decimals.

    Distributed shape: per-(doc, bigram) occurrence counts aggregate with
    map-side combine BEFORE any join (the per-doc multiplicity ``m``
    collapses repeated bigrams, so hot boilerplate n-grams shuffle once
    per doc, not once per occurrence); the probability table is the
    distinct-bigram table joined to unigram counts on w1; scoring is one
    equi-join back + a per-doc sum.  V is a single driver scalar (one
    O(1) aggregate, not a collect of data).  Every shuffle keys on grams
    or doc ids — no all-pairs, no driver loops; at a 10^12-token scale
    the distinct-gram table is the working set and it only ever moves
    through hash joins."""
    w = tokens_lower(F.col(text_col))
    toks = cache.track(docs.select(F.col(id_col).alias("_id"), w.alias("_w")))
    uni = cache.track(
        toks.select(F.explode("_w").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.count()  # scalar: smoothing denominator term
    # per-(doc, bigram) multiplicities collapsed in ONE mapInPandas pass
    # (guide §4.2): a doc's tokens live in its own row, so adjacent-pair
    # counting is row-local — the former explode(bigram structs) →
    # groupBy shuffled every bigram OCCURRENCE (tokens × corpus rows)
    # to build the same table, through an interpreted zip_with on top.
    # Python's zip(ws, ws[1:]) enumerates exactly bigram_pairs' adjacent
    # (w1, w2) sequence and Counter reproduces the grouped counts, so the
    # table is value-identical (strings in, integer counts out).
    occ_schema = (
        "_id " + docs.schema[id_col].dataType.simpleString()
        + ", w1 string, w2 string, m long"
    )

    def _count_bigrams(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            ids_out, w1_out, w2_out, m_out = [], [], [], []
            for i, ws in zip(pdf["_id"], pdf["_w"]):
                if ws is None or len(ws) < 2:
                    continue
                c = Counter(zip(ws, ws[1:]))
                for (a, b), m in c.items():
                    ids_out.append(i)
                    w1_out.append(a)
                    w2_out.append(b)
                    m_out.append(m)
            yield pd.DataFrame(
                {"_id": ids_out, "w1": w1_out, "w2": w2_out, "m": m_out}
            )

    occ = cache.track(toks.mapInPandas(_count_bigrams, schema=occ_schema))
    bgc = occ.groupBy("w1", "w2").agg(F.sum("m").alias("c12"))
    stats = bgc.join(uni, "w1").select(
        "w1",
        "w2",
        (
            -F.log(
                (F.col("c12") + F.lit(float(add_k)))
                / (F.col("c1") + F.lit(float(add_k)) * F.lit(float(vocab)))
            )
        ).alias("nlp"),
    )
    scored = (
        occ.join(stats, ["w1", "w2"])
        .groupBy("_id")
        .agg(
            F.sum(F.col("m") * F.col("nlp")).alias("tot"),
            F.sum("m").alias("nb"),
        )
    )
    out = (
        toks.select("_id")
        .join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("nb"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(
                F.coalesce(F.col("tot") / F.col("nb"), F.lit(0.0)), 6
            ).alias("cross_entropy"),
            F.round(
                F.coalesce(F.exp(F.col("tot") / F.col("nb")), F.lit(1.0)), 6
            ).alias("perplexity"),
        )
    )
    return out


def bm25_scores(
    docs: DataFrame,
    terms: list,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-``top_k`` retrieval for a bounded ``terms`` list:

        idf(t)    = ln((N − df_t + 0.5) / (df_t + 0.5) + 1)
        score(d)  = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Returns (id, per-term tf columns, score, rank) for the top-k matching
    docs, rank dense over (rounded score desc, id asc) — the rounding
    happens BEFORE ranking so the ordering is reproducible across engines.

    Plan: tf per term is row-local array arithmetic (zero shuffle — the
    term list IS the pruned inverted index); corpus stats are one
    aggregate row; the top-k is orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    if not terms:
        raise ValueError("terms must be non-empty")
    # dedupe preserving order (duplicate terms made ambiguous columns) and
    # use INDEX-based internal column names: a term containing '.' would
    # make F.col(f"tf_{term}") parse as nested-field access and fail to
    # resolve.  Output columns keep the tf_<term> names via aliasing.
    terms = list(dict.fromkeys(terms))
    w = tokens_lower(F.col(text_col))

    def _eq(term):
        # single-parameter closure: F.filter inspects the lambda's arity,
        # so a default-arg capture would be misread as (element, index)
        # — and tokens are lowercased, so match the lowercased term or an
        # uppercase query term silently matches nothing
        return lambda x: x == F.lit(term.lower())

    tf_cols = {t: F.size(F.filter(w, _eq(t))) for t in terms}
    base = cache.track(
        docs.select(
            F.col(id_col).alias("_id"),
            F.size(w).alias("dl"),
            *[tf_cols[t].alias(f"tf_{i}") for i, t in enumerate(terms)],
        )
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n_docs, avgdl = stats["n_docs"], stats["avgdl"] or 0.0
    idf = {
        i: math.log(
            (n_docs - stats[f"df_{i}"] + 0.5) / (stats[f"df_{i}"] + 0.5) + 1.0
        )
        for i in range(len(terms))
    }
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
    )
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}")
        part = F.lit(idf[i]) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    hits = (
        base.where(
            sum(F.col(f"tf_{i}") for i in range(len(terms))) > 0
        )
        .select(
            F.col("_id").alias(id_col),
            *[
                F.col(f"tf_{i}").alias(f"tf_{t}")
                for i, t in enumerate(terms)
            ],
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )
    # rank over the ≤top_k surviving rows — the single-partition window is
    # bounded by top_k, never by data size
    return hits.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc(id_col))
        ),
    )


def rrf_fuse(
    kw: DataFrame,
    dense: DataFrame,
    id_col: str = "doc_id",
    k_rrf: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009) of a
    keyword ranking and a dense ranking —
    ``rrf(d) = Σ_lists 1/(k_rrf + rank_list(d))``, absent-from-list
    contributing 0.  The standard BM25 ⊕ embedding combiner: rank-based,
    so the two scorers' incomparable score scales never meet.

    Inputs are (id, rank) lists ALREADY truncated to their per-retriever
    top-k (shortlist-sized, typically ≤ a few hundred rows), so the
    full-outer join and the final row_number window are candidate-bounded
    — never data-sized — regardless of corpus scale.

    Output: (id, rank_kw, rank_dense, rrf, rank), top-``top_k`` by fused
    score with id as the deterministic tie-break.
    """
    a = kw.select(F.col(id_col), F.col("rank").alias("rank_kw"))
    b = dense.select(F.col(id_col), F.col("rank").alias("rank_dense"))
    j = a.join(b, id_col, "full_outer")

    def _contrib(c: str):
        return (
            F.when(
                F.col(c).isNotNull(),
                F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(c)),
            )
            .otherwise(F.lit(0.0))
        )

    scored = j.select(
        id_col,
        "rank_kw",
        "rank_dense",
        F.round(_contrib("rank_kw") + _contrib("rank_dense"), 6).alias("rrf"),
    )
    top = scored.orderBy(F.desc("rrf"), F.asc(id_col)).limit(int(top_k))
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("rrf"), F.asc(id_col))),
    )
