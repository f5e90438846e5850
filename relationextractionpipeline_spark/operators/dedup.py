"""Document deduplication operators for training-data pipelines.

Beyond the reference's scope (it has no dedup), but first-class for a 100 TB
corpus engine.  Five strategies, cheapest→richest; all deterministic:

* exact           — hash groupBy on content (one shuffle, map-side combine)
* MinHash+LSH     — shingle → signature → band → bucket-join (operators/sketches)
* SimHash         — 64-bit fingerprint; banded hamming join, native bit_count
* n-gram Jaccard  — exact set similarity via an inverted shingle index
                    (explode + self-join on shingle + count ratio; no UDF)
* embedding cosine— near-dup via vector similarity (see operators/similarity)

Pair-emitting strategies share one clustering tail (``clusters_from_pairs``:
connected components → min-id survivor) because duplicates CHAIN — see
``near_dup_clusters`` (lexical) and ``similarity.semantic_dedup_clusters``
(embedding-space).

Scale design: every strategy is one-or-two shuffles keyed by content-derived
values (never doc ids), so hot documents can't skew; quadratic pair expansion
is bounded by bucket caps (sketches.lsh_candidate_pairs) or min-shingle
prefiltering (ngram path keeps only pairs sharing ≥1 shingle, then computes
the exact ratio from counted intersections — no full cross join anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from relationextractionpipeline_spark.operators import cache, sketches


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(keeper, n_dups) per distinct content; keeper = min id.

    Groups by ``(xxhash64(text), md5(text), length(text))`` rather than the
    text itself: identical grouping semantics (a same-length 64-bit xxhash +
    128-bit md5 double collision never happens in practice), but the shuffle
    moves ~28 bytes per row instead of the whole document — at 100 TB the
    difference between a metadata shuffle and re-shuffling the corpus."""
    return (
        df.groupBy(
            F.xxhash64(text_col).alias("_h64"),
            F.md5(F.col(text_col).cast("binary")).alias("_h128"),
            F.length(text_col).alias("_len"),
        )
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").alias("n_docs"),
        )
        .drop("_h64", "_h128", "_len")
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the min-id row per distinct content (deterministic winner)."""
    keep = exact_dup_groups(df, id_col, text_col).select(
        F.col("keeper").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def near_dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate CLUSTERS with survivor selection — the step a real
    dedup pass runs after pair generation: transitive closure over the
    minhash near-dup pair graph, one keeper per cluster.

    ``near_dup_pairs_minhash`` emits the pair EDGES; duplicates chain
    (A≈B≈C with A,C below threshold), so keeping "one of each pair" both
    over- and under-deletes.  This operator closes the chains with the same
    large-star/small-star connected-components the entity canonicalizer
    uses (O(log n) rounds at any chain length — boilerplate-heavy corpora
    produce very long chains), then assigns every document its component:

    * ``cluster_id``  — min ``id_col`` in the component (singletons map to
      themselves; no extra join for singleton handling — a left join +
      coalesce covers both).
    * ``cluster_size``— component size (1 = unique document).
    * ``is_survivor`` — ``doc_id == cluster_id``: the deterministic min-id
      keeper, same winner rule as ``dedup_exact``.

    Scale: pair generation is band-bucketed (never all-pairs), CC shuffles
    only the pair edge set (≪ corpus), and the final size join keys on
    ``cluster_id`` — the one potentially-skewed key is a giant boilerplate
    cluster, which AQE skew-join splitting handles (session default)."""
    pairs = near_dup_pairs_minhash(
        df, id_col, text_col, n_hashes=n_hashes, bands=bands,
        shingle_k=shingle_k, jaccard_threshold=jaccard_threshold,
    )
    return clusters_from_pairs(df, pairs, id_col)


def clusters_from_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Shared clustering tail for every pair-emitting dedup strategy:
    connected components over ``(id_a, id_b)`` pair edges, every ``df`` row
    assigned its component (min-id label; rows absent from any pair stay
    singletons via the left join + coalesce), component sizes joined back,
    min-id row flagged survivor."""
    from relationextractionpipeline_spark.operators import canonicalize

    comp = canonicalize.connected_components(pairs, src="id_a", dst="id_b")
    ids = df.select(F.col(id_col))
    assigned = ids.join(comp, ids[id_col] == comp["node"], "left").select(
        F.col(id_col),
        F.coalesce("component", F.col(id_col)).alias("cluster_id"),
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return assigned.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_survivor"),
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    verify: str = "estimate",
) -> DataFrame:
    """MinHash-LSH candidates, verified two ways:

    * ``verify='estimate'`` (default): signature agreement ratio — an
      unbiased Jaccard estimator, NO second pass over the text (cheapest;
      at 100 TB the text never re-shuffles).
    * ``verify='exact'``: candidates join back to their texts and the true
      word-shingle Jaccard is computed (Arrow-batched UDF over the pair's
      two texts).  Costs one extra text join each side, but the output is
      exact (precision 1 against the threshold by construction) — banding
      only bounds recall.
    """
    sigs = cache.track(  # reused by LSH banding and both verification
        sketches.with_minhash(  # joins; caller releases (operators/cache.py)
            df.select(id_col, text_col), text_col, n_hashes=n_hashes,
            shingle_k=shingle_k, mode="word",
        )
    )
    cand = sketches.lsh_candidate_pairs(sigs, id_col, "minhash", bands=bands)
    if verify == "exact":
        t = df.select(F.col(id_col), F.col(text_col))
        pairs = (
            cand.join(t.select(F.col(id_col).alias("id_a"),
                               F.col(text_col).alias("text_a")), "id_a")
            .join(t.select(F.col(id_col).alias("id_b"),
                           F.col(text_col).alias("text_b")), "id_b")
        )

        @F.pandas_udf("double")
        def jac(a, b):
            import pandas as pd

            return pd.Series(
                [
                    sketches.jaccard(
                        sketches.word_shingles(x or "", shingle_k),
                        sketches.word_shingles(y or "", shingle_k),
                    )
                    for x, y in zip(a, b)
                ]
            )

        return (
            pairs.withColumn("jaccard", jac("text_a", "text_b"))
            .where(F.col("jaccard") >= jaccard_threshold)
            .select("id_a", "id_b", "jaccard")
        )
    return _sig_agreement_pairs(cand, sigs, id_col, jaccard_threshold)


def _sig_agreement_pairs(
    cand: DataFrame, sigs: DataFrame, id_col: str, jaccard_threshold: float
) -> DataFrame:
    """Verify candidate pairs by signature agreement ratio (unbiased
    Jaccard estimator) — shared by the batch and incremental minhash
    paths so the threshold semantics cannot drift."""
    s = sigs.select(F.col(id_col), F.col("minhash"))
    est = (
        cand.join(s.select(F.col(id_col).alias("id_a"),
                           F.col("minhash").alias("sig_a")), "id_a")
        .join(s.select(F.col(id_col).alias("id_b"),
                       F.col("minhash").alias("sig_b")), "id_b")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.size("sig_a"),
        )
    )
    return est.where(F.col("est_jaccard") >= jaccard_threshold).select(
        "id_a", "id_b", "est_jaccard"
    )


def _simhash_chunks(sh: DataFrame, id_col: str) -> DataFrame:
    """(chunk_idx, chunk_val, _id, simhash): the 64-bit fingerprint split
    into 4×16-bit band keys (pigeonhole: hamming ≤ 3 ⇒ at least one chunk
    equal) — shared by the batch and incremental simhash paths so the
    banding cannot drift."""
    return sh.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )


def near_dup_pairs_simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """SimHash near-dups: band the 64-bit fingerprint into 4×16-bit chunks
    (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal), bucket-join on
    chunk, verify with native bit_count(xor).  No UDF past the signature.

    ``max_bucket`` bounds the quadratic within-bucket expansion on
    boilerplate-heavy corpora (many genuinely-similar fingerprints share
    chunk values): oversized buckets are dropped, trading recall on
    degenerate content for a hard cost bound — same policy as
    sketches.lsh_candidate_pairs.
    """
    sh = sketches.with_simhash(
        df.select(id_col, text_col), text_col, shingle_k=shingle_k, mode="word"
    )
    chunks = _simhash_chunks(sh, id_col)
    # self-join + size pre-pass: sketch UDF once; caller releases the
    # caches.  Bucket population via a window over the join key (one
    # exchange) instead of groupBy + join-back (two) — guide §2.4.
    from pyspark.sql import Window

    w = Window.partitionBy("chunk_idx", "chunk_val")
    chunks = cache.track(chunks)
    chunks = cache.track(
        chunks.withColumn("count", F.count(F.lit(1)).over(w))
        .where(F.col("count") <= max_bucket)
        .drop("count")
    )
    a = chunks.select("chunk_idx", "chunk_val", F.col("_id").alias("id_a"),
                      F.col("simhash").alias("sim_a"))
    b = chunks.select("chunk_idx", "chunk_val", F.col("_id").alias("id_b"),
                      F.col("simhash").alias("sim_b"))
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", sketches.hamming64(F.col("sim_a"), F.col("sim_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def _gram_set_col(text_col: str, n: int):
    """Distinct word-n-gram column (whole text when shorter than n words —
    same rule as sketches.word_shingles and the DuckDB oracle).  NULL text
    is treated as the empty string: without the coalesce, explode(NULL)
    silently DROPS the document, violating ngram_contamination's
    'output row for every training doc' contract on nullable columns."""
    words = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    sliding = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(words) < n, F.array(F.array_join(words, " "))).otherwise(
            sliding
        )
    )


def ngram_hot_grams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int = 10_000,
) -> DataFrame:
    """(gram, df) for every shingle whose document frequency exceeds
    ``max_df`` — exactly the grams ``ngram_jaccard_pairs`` drops from its
    inverted index.  Run (or sink) this alongside the dedup job so the cap
    is observable, the same way SimHash's dropped buckets are."""
    grams = df.select(
        F.col(id_col).alias("_id"), F.explode(_gram_set_col(text_col, n)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_df)
        .orderBy(F.desc("df"), F.asc("gram"))
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    max_df: int = None,
) -> DataFrame:
    """Benchmark decontamination: per TRAINING document, how many of its
    distinct word-``n``-grams also appear in ANY evaluation document —
    the standard train/test-contamination check a training-data pipeline
    runs before every corpus release (an eval example whose n-grams leak
    into training data inflates downstream benchmark scores).

    Output: (doc_id, n_grams, n_shared_grams, contaminated) for EVERY
    training doc — zero-overlap docs included, so the row count is stable
    and the sink can either drop flagged docs or audit near-misses.

    Plan shape: inverted-index join, like ``ngram_jaccard_pairs`` but
    one-sided — the EVAL gram set is the small side by construction (eval
    suites are fixed-size; the corpus is the 100 TB side), so it
    broadcasts: the training table is scanned once, never self-joined, and
    cost is O(train grams).  ``max_df`` (opt-in) additionally drops
    boilerplate grams from the TRAIN side before the join, same recall-only
    policy as ``ngram_jaccard_pairs``."""
    tgrams = train.select(
        F.col(id_col).alias("_id"), F.explode(_gram_set_col(text_col, n)).alias("gram")
    )
    egrams = (
        eval_df.select(F.explode(_gram_set_col(text_col, n)).alias("gram"))
        .distinct()
    )
    if max_df is None:
        # one pass (round 6): the per-doc gram count and the shared-gram
        # count come from the SAME broadcast left join — previously the
        # uncached train-gram explode executed twice (once per aggregate)
        # and the two per-doc aggregates met in an extra shuffle join.
        # egrams is distinct and the join is a left, so row multiplicity —
        # and therefore both counts — is unchanged.
        joined = tgrams.join(
            F.broadcast(egrams.withColumn("_hit", F.lit(1))), "gram", "left"
        )
        return (
            joined.groupBy("_id")
            .agg(
                F.count("*").alias("n_grams"),
                F.count("_hit").alias("n_shared_grams"),
            )
            .select(
                F.col("_id").alias(id_col),
                "n_grams",
                "n_shared_grams",
                (F.col("n_shared_grams") > 0).alias("contaminated"),
            )
        )
    sizes = tgrams.groupBy("_id").agg(F.count("*").alias("n_grams"))
    dfc = tgrams.groupBy("gram").agg(F.count("*").alias("_df"))
    posting = tgrams.join(dfc.where(F.col("_df") <= max_df), "gram").drop("_df")
    shared = (
        posting.join(F.broadcast(egrams), "gram")
        .groupBy("_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )
    return (
        sizes.join(shared, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            (F.coalesce("n_shared_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard via an inverted index — pure native ops.

    |A∩B| comes from counting shared distinct shingles (join on shingle),
    |A∪B| = |A|+|B|-|A∩B|.  The shingle join only produces pairs that share
    content, so cost is output-bound, not |docs|².

    ``max_df`` (OPT-IN, default None = exact) bounds the posting-list
    blowup: a shingle appearing in d documents yields d² join rows, so one
    boilerplate gram ("terms of service…") shared by a million docs would be
    quadratic at corpus scale — set ``max_df`` (e.g. 10_000) for any real
    corpus run.  Grams with document frequency > ``max_df`` are dropped from
    the inverted index ONLY (denominators keep the full gram counts), so
    capped runs can undercount |A∩B| — a pure recall trade, never a false
    positive — same drop-oversized-buckets policy as SimHash's
    ``max_bucket``.  Dropped grams are observable via ``ngram_hot_grams``
    (same cap).  The cap is opt-in precisely because it changes answers
    silently otherwise: a default cap would undercount Jaccard on corpora
    whose df exceeds it while every small-scale gate stays green.
    """
    grams = df.select(
        F.col(id_col).alias("_id"), F.explode(_gram_set_col(text_col, n)).alias("gram")
    )
    # denominators over the FULL gram sets (the cap must not inflate jaccard)
    sizes = grams.groupBy("_id").agg(F.count("*").alias("n_grams"))
    posting = grams
    if max_df is not None:
        dfc = grams.groupBy("gram").agg(F.count("*").alias("_df"))
        posting = (
            grams.join(dfc.where(F.col("_df") <= max_df), "gram").drop("_df")
        )
    inter = (
        posting.select(F.col("_id").alias("id_a"), "gram")
        .join(posting.select(F.col("_id").alias("id_b"), "gram"), "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col("_id").alias("id_a"),
                                F.col("n_grams").alias("size_a")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"),
                           F.col("n_grams").alias("size_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def substring_dup_stats(
    df: DataFrame,
    k: int = 5,
    min_docs: int = 2,
    dup_frac_flag: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level (span) duplication profile — the sixth dedup
    strategy: instead of whole-document similarity, find k-token WINDOWS
    that recur across documents (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better": memorization tracks repeated
    SPANS, which whole-doc near-dup misses when boilerplate is embedded
    in otherwise-unique pages).

    A window is duplicated when its exact k-gram appears in ≥ ``min_docs``
    distinct documents.  Returns one row per document:
    (id, n_windows, n_dup_windows, dup_frac, is_dup) where ``dup_frac``
    counts duplicated window OCCURRENCES over total windows (rounded to
    6) and ``is_dup`` flags docs at ≥ ``dup_frac_flag``.

    Scale shape (no suffix array needed for the windowed formulation):
    windows build ROW-LOCALLY via k shifted zips (textindex.kgram_join,
    O(n·k) per doc — never transform+slice); per-(doc, gram) counts
    aggregate with map-side combine, so a page repeating one gram 10^6
    times shuffles one row; the duplicated-gram set is a groupBy over
    distinct (doc, gram) rows — count(*) there IS the distinct-doc count;
    the join back is a left-semi on the gram key.  Everything keys on
    content-derived grams — hot DOCUMENTS cannot skew, and a hot GRAM
    (corpus-wide boilerplate) is one aggregation key whose partial
    combine bounds it.  No pair expansion anywhere: cost is linear in
    total windows, unlike the pairwise strategies above."""
    from relationextractionpipeline_spark.operators.textindex import (
        kgram_join,
        tokens_lower,
    )

    w = tokens_lower(F.col(text_col))
    toks = cache.track(
        df.select(F.col(id_col).alias("_id"), w.alias("_w"))
    )
    # per-(doc, gram) multiplicities collapsed in ONE mapInPandas pass
    # (guide §4.2, same shape as ngram_lm_scores): a doc's windows are
    # row-local, so the former explode(all windows) → groupBy shuffled
    # every window occurrence to build this table.  Python's
    # " ".join(ws[i:i+k]) produces exactly kgram_join's space-joined
    # window strings (the <k-token rule matches kgram_join's empty
    # array), so the table is value-identical.
    kk = int(k)
    occ_schema = (
        "_id " + df.schema[id_col].dataType.simpleString()
        + ", gram string, m long"
    )

    def _count_windows(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            ids_out, g_out, m_out = [], [], []
            for i, ws in zip(pdf["_id"], pdf["_w"]):
                if ws is None or len(ws) < kk:
                    continue
                c = Counter(
                    " ".join(ws[j : j + kk])
                    for j in range(len(ws) - kk + 1)
                )
                for g, m in c.items():
                    ids_out.append(i)
                    g_out.append(g)
                    m_out.append(m)
            yield pd.DataFrame({"_id": ids_out, "gram": g_out, "m": m_out})

    occ = cache.track(toks.mapInPandas(_count_windows, schema=occ_schema))
    dup = (
        occ.groupBy("gram")
        .agg(F.count("*").alias("nd"))  # occ is distinct per (doc, gram)
        .where(F.col("nd") >= min_docs)
        .select("gram")
    )
    per_doc = (
        occ.join(dup, "gram", "left_semi")
        .groupBy("_id")
        .agg(F.sum("m").alias("n_dup"))
    )
    n_windows = F.greatest(F.size(F.col("_w")) - F.lit(k - 1), F.lit(0))
    return (
        toks.select("_id", n_windows.alias("n_windows"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("n_windows").cast("long").alias("n_windows"),
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias(
                "n_dup_windows"
            ),
            F.round(
                F.when(
                    F.col("n_windows") > 0,
                    F.coalesce(F.col("n_dup"), F.lit(0))
                    / F.col("n_windows"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
        .withColumn("is_dup", F.col("dup_frac") >= F.lit(dup_frac_flag))
    )


# ---------------------------------------------------------------------------
# Incremental near-dup cluster maintenance — the dedup analog of
# canonicalize.merge_entity_batch: continuous corpus ingestion keeps the
# minhash cluster assignment current WITHOUT re-clustering history.
#
# Exactness (not an approximation, cap-free regime): connected components
# factor through the quotient by any prior partial clustering and the
# min-id cluster label is an associative reduction, so contracting the
# batch's new pair evidence onto prior labels and running CC on that
# batch-sized quotient graph EQUALS a one-shot near_dup_clusters over the
# union (tests/test_dedup_incremental.py asserts exact equality at every
# split order).  Pair evidence is incremental too: new signatures probe
# the union's LSH buckets (sketches.lsh_candidate_pairs_incremental), so
# the candidate join scales with the batch.  Shared caveat: if the LSH
# max_bucket cap triggers mid-history, incremental and one-shot can
# differ (population-dependent pruning).
# ---------------------------------------------------------------------------

from typing import NamedTuple  # noqa: E402


class DocDedupState(NamedTuple):
    """Persistable near-dup state for incremental maintenance.

    ``sigs``   — (id, minhash) for every document ever seen: the
                 signature universe (new batches anti-join it; documents
                 never re-shingle).
    ``assign`` — (id, cluster_id): the connected-component label (min id
                 of the component) for every known document.

    Both tables round-trip through ``sources.tableio.TableIO`` — see
    ``streaming/neardup.py`` for the maintained-table wrapper.
    """

    sigs: DataFrame
    assign: DataFrame


def doc_dedup_state(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
) -> DocDedupState:
    """Bootstrap the state from a batch corpus — same signatures, candidate
    generation, and verification as ``near_dup_clusters`` (estimate mode),
    so the assignment equals the batch operator's (doc_id, cluster_id)."""
    sigs = cache.checkpoint(
        sketches.with_minhash(
            df.select(id_col, text_col), text_col, n_hashes=n_hashes,
            shingle_k=shingle_k, mode="word",
        ).select(id_col, "minhash")
    )
    cand = sketches.lsh_candidate_pairs(sigs, id_col, "minhash", bands=bands)
    pairs = _sig_agreement_pairs(cand, sigs, id_col, jaccard_threshold)
    assign = cache.checkpoint(
        clusters_from_pairs(df, pairs, id_col).select(id_col, "cluster_id")
    )
    return DocDedupState(sigs=sigs, assign=assign)


def merge_doc_batch(
    state: DocDedupState,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
) -> DocDedupState:
    """Merge a batch of new documents into an existing cluster state.

    Replay-idempotent: already-seen ids anti-join ``sigs`` away, so a
    replayed batch is the empty merge.  Parameters must match the ones the
    state was built with."""
    from relationextractionpipeline_spark.operators import canonicalize

    new_rows = cache.checkpoint(
        new_df.select(id_col, text_col).join(
            state.sigs.select(id_col), id_col, "left_anti"
        )
    )
    new_sigs = cache.checkpoint(
        sketches.with_minhash(
            new_rows, text_col, n_hashes=n_hashes, shingle_k=shingle_k,
            mode="word",
        ).select(id_col, "minhash")
    )
    all_sigs = state.sigs.unionByName(new_sigs)
    cand = sketches.lsh_candidate_pairs_incremental(
        new_sigs, all_sigs, id_col, "minhash", bands=bands
    )
    pairs = _sig_agreement_pairs(cand, all_sigs, id_col, jaccard_threshold)
    return DocDedupState(
        sigs=cache.checkpoint(all_sigs),
        assign=_quotient_merge(state.assign, new_sigs, pairs, id_col),
    )


def _quotient_merge(
    assign: DataFrame, new_sigs: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Shared incremental-clustering tail (minhash AND simhash paths):
    contract the batch's new pair evidence onto prior cluster labels
    (known endpoints map to their cluster_id, new ids to themselves), run
    CC on that batch-sized quotient graph, and relabel both prior and new
    ids.  Returns the checkpointed new assignment."""
    from relationextractionpipeline_spark.operators import canonicalize

    q_edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .join(
            assign.select(F.col(id_col).alias("src"),
                          F.col("cluster_id").alias("src_c")),
            "src", "left",
        )
        .join(
            assign.select(F.col(id_col).alias("dst"),
                          F.col("cluster_id").alias("dst_c")),
            "dst", "left",
        )
        .select(
            F.coalesce("src_c", F.col("src")).alias("src"),
            F.coalesce("dst_c", F.col("dst")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )

    comps = (
        None if q_edges.isEmpty()
        else canonicalize.connected_components(q_edges)
    )

    def relabel(df: DataFrame, key: str) -> DataFrame:
        if comps is None:
            return df.select(id_col, F.col(key).alias("cluster_id"))
        return df.join(comps, df[key] == comps["node"], "left").select(
            id_col,
            F.coalesce(F.col("component"), F.col(key)).alias("cluster_id"),
        )

    # prior ids follow their (possibly merged) component label; genuinely
    # new ids (not yet in assign — the distinction matters on replay after
    # a partial state write) get their quotient label or stay singletons
    updated = relabel(assign, "cluster_id")
    new_ids = new_sigs.select(id_col).join(assign, id_col, "left_anti")
    added = relabel(new_ids, id_col)
    return cache.checkpoint(updated.unionByName(added))


class SimHashDedupState(NamedTuple):
    """Persistable simhash near-dup state: ``sigs`` — (id, simhash) for
    every document ever seen; ``assign`` — (id, cluster_id) component
    labels.  Same contract as DocDedupState (anti-join replay idempotence,
    TableIO round-trip)."""

    sigs: DataFrame
    assign: DataFrame


def simhash_dedup_state(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> SimHashDedupState:
    """Bootstrap simhash cluster state from a batch corpus — same
    fingerprints, chunk banding, and hamming verification as
    ``near_dup_pairs_simhash``, so the assignment equals the batch
    operator's clustering of its pairs."""
    sigs = cache.checkpoint(
        sketches.with_simhash(
            df.select(id_col, text_col), text_col, shingle_k=shingle_k,
            mode="word",
        ).select(id_col, "simhash")
    )
    pairs = _simhash_pairs_from_sigs(sigs, sigs, id_col, max_hamming,
                                     max_bucket, symmetric=True)
    assign = cache.checkpoint(
        clusters_from_pairs(df, pairs, id_col).select(id_col, "cluster_id")
    )
    return SimHashDedupState(sigs=sigs, assign=assign)


def _simhash_pairs_from_sigs(
    probe_sigs: DataFrame,
    all_sigs: DataFrame,
    id_col: str,
    max_hamming: int,
    max_bucket: int,
    symmetric: bool,
) -> DataFrame:
    """Chunk-banded candidate join + hamming verify over precomputed
    (id, simhash) tables.  ``symmetric=True`` is the batch self-join
    (id_a < id_b); ``symmetric=False`` probes new fingerprints against the
    union (normalized to least/greatest so edges stay canonical).  The
    bucket cap counts the UNION side — the population a hot chunk value
    actually gathers — matching the batch operator's policy."""
    chunks_all = cache.track(_simhash_chunks(all_sigs, id_col))
    capped = cache.track(
        chunks_all.join(
            chunks_all.groupBy("chunk_idx", "chunk_val").count(),
            ["chunk_idx", "chunk_val"],
        ).where(F.col("count") <= max_bucket).drop("count")
    )
    if symmetric:
        probe = capped
    else:
        # no cap pre-join needed on the probe side: the equi-join against
        # the capped union below already drops probes in dropped buckets
        probe = _simhash_chunks(probe_sigs, id_col)
    a = probe.select("chunk_idx", "chunk_val", F.col("_id").alias("id_a"),
                     F.col("simhash").alias("sim_a"))
    b = capped.select("chunk_idx", "chunk_val", F.col("_id").alias("id_b"),
                      F.col("simhash").alias("sim_b"))
    joined = a.join(b, ["chunk_idx", "chunk_val"])
    if symmetric:
        joined = joined.where(F.col("id_a") < F.col("id_b"))
    else:
        joined = joined.where(F.col("id_a") != F.col("id_b")).select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.col("sim_a"),
            F.col("sim_b"),
        )
    return (
        joined.withColumn(
            "hamming", sketches.hamming64(F.col("sim_a"), F.col("sim_b"))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b")
        .distinct()
    )


def merge_simhash_batch(
    state: SimHashDedupState,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> SimHashDedupState:
    """Merge a batch of new documents into a simhash cluster state WITHOUT
    re-clustering history — the simhash analog of ``merge_doc_batch``:
    new fingerprints probe the union's chunk buckets (candidate join
    scales with the batch), verified pairs contract onto prior labels, CC
    runs on the quotient.  Exactness argument and replay idempotence are
    shared with the minhash path (module comment above DocDedupState;
    ``_quotient_merge``)."""
    new_rows = cache.checkpoint(
        new_df.select(id_col, text_col).join(
            state.sigs.select(id_col), id_col, "left_anti"
        )
    )
    new_sigs = cache.checkpoint(
        sketches.with_simhash(
            new_rows, text_col, shingle_k=shingle_k, mode="word"
        ).select(id_col, "simhash")
    )
    all_sigs = state.sigs.unionByName(new_sigs)
    pairs = _simhash_pairs_from_sigs(
        new_sigs, all_sigs, id_col, max_hamming, max_bucket, symmetric=False
    )
    return SimHashDedupState(
        sigs=cache.checkpoint(all_sigs),
        assign=_quotient_merge(state.assign, new_sigs, pairs, id_col),
    )
