"""Deterministic sampling operators for training-data pipelines.

Beyond the reference's scope (it has no sampling), but first-class for a
100 TB corpus engine: reproducible corpus subsampling, per-language quota
sampling, and leakage-free train/validation splits all reduce to ONE
primitive — a uniform [0, 2^32) hash of a stable row key:

    h(key, salt) = int(md5(str(key) + ":" + salt)[:8 hex], 16)

Membership is ``h < floor(fraction · 2^32)`` — a pure narrow filter:

* no shuffle, no RNG state, no seed-plus-partition coupling
  (``df.sample`` changes membership when partitioning changes; this never
  does — resume/metamorphic-safe);
* the same row lands on the same side of every split in every run, on any
  engine that can compute md5 (the DuckDB oracles re-derive membership
  exactly — integer threshold compare, no float equality);
* disjoint splits come from complementary intervals of the SAME hash, so
  train/val can never leak (tested).
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import Column, DataFrame, functions as F

_HASH_SPACE = 1 << 32


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform value in [0, 2^32) from md5 of ``str(key) + ':' + salt`` —
    first 8 hex chars, the exact expression a SQL oracle can replicate.
    NULL keys hash to NULL (null-rejecting, like the SQL replica) — a
    caller whose filter must be TOTAL over rows coalesces the key first
    (see train_val_split)."""
    payload = F.concat(key.cast("string"), F.lit(":" + salt)).cast("binary")
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def threshold(fraction: float) -> int:
    """Integer membership threshold (exact on both engines)."""
    f = min(max(float(fraction), 0.0), 1.0)
    return int(f * _HASH_SPACE)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of the key."""
    return df.where(hash_bucket(F.col(key_col), salt) < F.lit(threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum fractions (e.g. per-language quotas when rebalancing a
    multilingual corpus); unlisted strata get ``default_fraction``."""
    thr = F.lit(threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(threshold(frac))
        ).otherwise(thr)
    return df.where(hash_bucket(F.col(key_col), salt) < thr)


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, scale: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """IMPORTANCE sampling: keep each row with probability
    ``clamp(scale · weight, 0, 1)`` — how quality-aware curation keeps more
    of the good documents without a hard cutoff (hard thresholds discard
    the entire mid-quality band; weighting keeps a calibrated slice of it).

    Same hash primitive as ``deterministic_sample``; the threshold becomes
    per-row (``floor(p · 2^32)``, still an integer compare, exact on any
    engine).  Membership stays a pure function of (key, weight), so
    re-runs, repartitions and resumes keep identical samples, and raising
    ``scale`` only ever ADDS rows (nested samples, same property as the
    uniform case)."""
    p = F.least(
        F.greatest(F.col(weight_col) * F.lit(float(scale)), F.lit(0.0)),
        F.lit(1.0),
    )
    per_row_thr = F.floor(p * F.lit(float(_HASH_SPACE))).cast("long")
    return df.where(hash_bucket(F.col(key_col), salt) < per_row_thr)


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.3,
    salt: str = "",
) -> DataFrame:
    """Temperature-based stratum rebalancing (the multilingual-corpus
    mixture flattening used by mC4/XLM-style pipelines): keep rates chosen
    so the EXPECTED kept counts are ∝ n_s^alpha — alpha=1 keeps the natural
    mixture, alpha→0 flattens toward uniform — without upsampling: the
    rarest stratum keeps everything (rate 1) and every other stratum
    downsamples by ``rate_s = (n_min / n_s)^(1 - alpha)``.

    Unlike ``stratified_sample`` the per-stratum fractions are DERIVED
    from the data: one tiny groupBy(stratum) count (map-side combined,
    output rows = #strata), a 1-row global min crossed in via broadcast,
    and the rate table broadcast-joined back — no driver collect, no wide
    shuffle of the fact table.  Membership uses the same md5 primitive as
    every sampler here; the per-stratum threshold is rounded to 6 decimals
    before the integer floor so Spark and a SQL oracle agree bit-for-bit.
    """
    a = float(alpha)
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n_s"))
    n_min = counts.agg(F.min("_n_s").alias("_n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        strata_col,
        F.floor(
            F.round(
                F.pow(F.col("_n_min") / F.col("_n_s"), F.lit(1.0 - a)), 6
            )
            * F.lit(float(_HASH_SPACE))
        )
        .cast("long")
        .alias("_thr"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(hash_bucket(F.col(key_col), salt) < F.col("_thr"))
        .drop("_thr")
    )


def train_val_split(
    df: DataFrame, key_col: str, val_fraction: float, salt: str = "split"
) -> Tuple[DataFrame, DataFrame]:
    """Leakage-free split: complementary intervals of one hash, so the two
    sides are disjoint BY CONSTRUCTION and stable across runs/partitionings.
    NULL keys hash as the empty string — without the coalesce both
    predicates evaluate to null and null-key rows silently vanish from
    BOTH sides, violating the partition contract."""
    h = hash_bucket(
        F.coalesce(F.col(key_col).cast("string"), F.lit("")), salt
    )
    t = F.lit(threshold(val_fraction))
    return df.where(h >= t), df.where(h < t)


def shuffle_deterministic(
    df: DataFrame, key_col: str, salt: str = "epoch0"
) -> DataFrame:
    """Global deterministic pseudo-random training order: adds
    ``shuffle_pos`` — the row's 0-based position when the whole corpus is
    sorted by ``(hash_bucket(key, salt), key)``.  The order is a pure
    function of keys and salt (epoch N reshuffles with a new salt), never
    of partitioning or RNG state — the property a resumable training
    loader needs (restart mid-epoch, same order).

    Scale shape: a single ``Window.orderBy`` would collapse to one
    partition, so this uses the pack_sequences two-phase rank:
    ``repartitionByRange`` on the hash (global order across partitions,
    sampled boundaries affect placement only) → per-partition
    ``row_number`` → per-partition counts prefix-summed over
    n_partitions rows and broadcast back.  Only (key, hash) drives the
    shuffle; payload columns ride along once.  The range-bucketed frame is
    checkpointed for the same reason as pack_sequences: both branches must
    read ONE materialization of the sampled boundaries (caller frees via
    ``cache.release_all(checkpoints=True)``)."""
    from pyspark.sql import Window

    from . import cache

    nparts = df.sparkSession.sparkContext.defaultParallelism
    h = hash_bucket(F.col(key_col), salt)
    parted = cache.checkpoint(
        df.withColumn("_h", h)
        .repartitionByRange(max(nparts, 2), F.col("_h"), F.col(key_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("_pid").orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    local = parted.withColumn("_rn", F.row_number().over(w_in))
    w_off = (
        Window.orderBy(F.col("_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        parted.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_pcnt"))
        .withColumn("_off", F.coalesce(F.sum("_pcnt").over(w_off), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("shuffle_pos", F.col("_off") + F.col("_rn") - F.lit(1))
        .drop("_h", "_pid", "_rn", "_off")
    )


def dsir_weights(
    docs: DataFrame,
    target_flag: Column,
    n_buckets: int = 1024,
    add_k: float = 0.5,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much its hashed-n-gram profile looks like a TARGET subcorpus
    relative to the raw pool.

    ``target_flag`` is a boolean Column over ``docs`` marking the target
    exemplars (e.g. ``F.col('lang') == 'en'`` to up-select English-like
    text, or a quality-score band).  Features are unigrams + bigrams of
    lowercased whitespace tokens hashed into ``n_buckets`` buckets with
    the corpus-wide md5 primitive (``hash_bucket``, SQL-replicable);
    bucket distributions are add-k smoothed, and

        dsir_logweight(d) = sum over d's gram occurrences of
                            ln p_target[bucket] - ln p_raw[bucket]

    Output: one row per document — (id, n_grams, dsir_logweight,
    selected) with ``selected = dsir_logweight > 0`` (net evidence toward
    the target).  Threshold- or quota-based selection composes downstream
    (``quantile_thresholds`` / ``weighted_sample``) — deliberately NOT a
    global top-k rank here, which would be a single-reducer sort at
    corpus scale.

    Distributed shape: gram occurrences collapse to per-(doc, bucket)
    multiplicities with map-side combine BEFORE anything joins (hot
    grams shuffle once per doc, not once per occurrence — the
    ngram_lm_scores discipline); the bucket distribution table is
    dimension-sized (<= n_buckets rows) and joins back by broadcast; the
    only data-sized shuffles key on bucket ids and doc ids.  Float
    contract: the per-doc sum is subject to summation-order drift,
    absorbed by round(., 6) like every corpus-statistics score here.

    No reference analog (the reference stops at triple emission,
    de_pipeline/pipeline.py:69-77); beyond-reference curation surface.
    """
    from . import cache
    from .textindex import kgram_join, tokens_lower

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = tokens_lower(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("_id"),
        target_flag.alias("_target"),
        F.concat(w, kgram_join(w, 2)).alias("_grams"),
    )
    # The per-(doc, bucket) multiplicity table, collapsed in ONE
    # mapInPandas pass (guide §4.2): a doc's grams all live in its own
    # row, so hashing and counting are row-local — the former
    # explode(5M gram rows) → per-gram md5 Columns → groupBy exchange
    # shuffled the whole gram stream to produce the same table.  The
    # Python kernel mirrors ``hash_bucket`` byte-for-byte:
    # md5(utf8(gram + ":" + salt)), first 8 hex chars as an integer,
    # mod n_buckets — md5 is md5, so every bucket id is identical to the
    # Column expression's (verified row-identical at sf0.1) and the SQL
    # oracle still replays it relationally.  Gram CONSTRUCTION stays in
    # the JVM (tokens_lower/kgram_join above) so tokenizer semantics
    # cannot drift between engines.
    #
    # Tracked (caller releases): the collapsed table feeds THREE
    # consumers — the bucket distribution, its totals row (a nested
    # broadcast job), and the per-doc scoring join; uncached, Spark
    # re-executed the gram pass for each (measured 3× per action).
    import hashlib

    nb = int(n_buckets)
    salt_b = (":" + salt).encode("utf-8")
    occ_schema = (
        "_id " + docs.schema[id_col].dataType.simpleString()
        + ", _target boolean, bucket long, m long"
    )

    def _count_buckets(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            ids_out, tg_out, bk_out, m_out = [], [], [], []
            for i, tg, grams in zip(
                pdf["_id"], pdf["_target"], pdf["_grams"]
            ):
                if grams is None or not len(grams):
                    continue
                c = Counter(
                    int(
                        hashlib.md5(
                            g.encode("utf-8") + salt_b
                        ).hexdigest()[:8],
                        16,
                    )
                    % nb
                    for g in grams
                )
                for bk, m in c.items():
                    ids_out.append(i)
                    tg_out.append(tg)
                    bk_out.append(bk)
                    m_out.append(m)
            yield pd.DataFrame(
                {"_id": ids_out, "_target": tg_out,
                 "bucket": bk_out, "m": m_out}
            )

    occ = cache.track(base.mapInPandas(_count_buckets, schema=occ_schema))
    dist = occ.groupBy("bucket").agg(
        F.sum("m").alias("c_raw"),
        F.sum(F.when(F.col("_target"), F.col("m")).otherwise(F.lit(0))).alias(
            "c_t"
        ),
    )
    totals = dist.agg(
        F.sum("c_raw").alias("tot_raw"), F.sum("c_t").alias("tot_t")
    )
    k = float(add_k)
    kv = k * float(n_buckets)
    ratio = dist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_t") + F.lit(k)) / (F.col("tot_t") + F.lit(kv)))
            - F.log(
                (F.col("c_raw") + F.lit(k)) / (F.col("tot_raw") + F.lit(kv))
            )
        ).alias("lr"),
    )
    scored = (
        occ.join(F.broadcast(ratio), "bucket")
        .groupBy("_id")
        .agg(
            F.sum("m").alias("n_grams"),
            F.sum(F.col("m") * F.col("lr")).alias("w"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(F.coalesce("w", F.lit(0.0)), 6).alias("dsir_logweight"),
            (F.coalesce("w", F.lit(0.0)) > 0).alias("selected"),
        )
    )
