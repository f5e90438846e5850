"""Text analysis for training-data curation: language-ID, quality scoring,
token counting, fingerprinting.

All native Column expressions (JVM-side, whole-stage codegen) — zero Python.
Every builder is mirrored 1:1 by an ANSI-SQL oracle in ``__spark_entry__``,
so each is independently verified against DuckDB by the driver gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# deterministic per-language stopword anchors for the n-gram/lexical heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "nicht", "ein"],
    "es": ["el", "la", "de", "y", "que", "los"],
    "fr": ["le", "les", "et", "des", "une", "est"],
}
LANG_ORDER = ["en", "de", "es", "fr"]  # deterministic tie-break priority

# word-ish BPE-style pre-tokenizer: letter runs | digit runs | single symbol
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text_col: Column) -> Column:
    return F.split(F.trim(text_col), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_chars_calc", F.length(t))
        .withColumn(
            "n_words",
            F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
                F.size(words(t))
            ),
        )
        .withColumn("n_tokens", F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)))
    )


def _stop_hits(text_col: Column, stops) -> Column:
    arr = F.array(*[F.lit(s) for s in stops])
    return F.size(F.filter(words(F.lower(text_col)), lambda w: F.array_contains(arr, w)))


def with_langid(df: DataFrame, text_col: str = "text",
                out_col: str = "lang_pred") -> DataFrame:
    t = F.col(text_col)
    hits = {lang: _stop_hits(t, sw) for lang, sw in LANG_STOPWORDS.items()}
    best = F.greatest(*[hits[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):  # earlier langs win ties (priority order)
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return df.withColumn(out_col, expr)


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: length band, punctuation ratio,
    stopword ratio, mean word length → [0,1] composite."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(words(t)))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    stop_all = [w for sw in LANG_STOPWORDS.values() for w in sw]
    n_stop = _stop_hits(t, stop_all)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_words > 0, (n_chars - (n_words - 1)) / n_words).otherwise(F.lit(0.0))
    length_score = F.least(n_words / F.lit(20.0), F.lit(1.0))
    score = F.round(
        0.4 * length_score
        + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.3 * (1 - F.least(punct_ratio * 10, F.lit(1.0))),
        6,
    )
    return (
        df.withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stop_ratio", F.round(stop_ratio, 6))
        .withColumn("mean_word_len", F.round(mean_word_len, 6))
        .withColumn("quality_score", score)
    )


# PII surface patterns, applied in THIS order (dict order is the contract —
# the SQL oracle replays the same sequence).  Kept to syntax both Java regex
# (Spark) and RE2 (DuckDB) interpret identically: literal classes, bounded
# repetition, \b word boundaries; no lookaround, no backrefs.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[- ]\d{3}[- ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction — the scrub every shared training corpus
    runs before anything else sees the text.

    Adds ``n_<kind>`` match counts per pattern and ``scrubbed`` (every match
    replaced by its ``<KIND>`` placeholder, patterns applied in dict order;
    placeholders contain no digits, so later patterns can't re-match inside
    earlier redactions).  Entirely native Columns — regexp_extract_all /
    regexp_replace run inside whole-stage codegen, nothing crosses to
    Python, and the scan stays one pass per document."""
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)),
        )
    scrubbed = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return out.withColumn("scrubbed", scrubbed)


def quantile_thresholds(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs=(0.25, 0.5, 0.75, 0.9),
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group EXACT quantile thresholds — how quality gates get picked
    in practice ("drop the bottom quartile per language") without
    hand-chosen constants.

    Deterministic rank-based definition (type-1: the value at rank
    ``ceil(q·n)`` under (value asc, id asc) ordering) rather than
    interpolation, so Spark and any SQL engine produce bit-identical
    thresholds.  One window + one rank equi-join; the quantile fractions
    fan out via ``explode`` on the n-groups-sized count table — no cross
    join, nothing driver-side.  At 100 TB scale swap in
    ``percentile_approx`` for the single-pass sketch; this operator is the
    exact reference it's validated against."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = df.select(group_col, value_col, id_col).withColumn(
        "rn", F.row_number().over(w)
    )
    targets = (
        df.groupBy(F.col(group_col).alias("_grp"))  # fresh name: ranked and
        .agg(F.count("*").alias("n_docs"))          # targets share lineage
        .withColumn("q", F.explode(F.array(*[F.lit(float(x)) for x in qs])))
        .withColumn(
            "target", F.ceil(F.col("q") * F.col("n_docs")).cast("int")
        )
    )
    return (
        ranked.join(
            targets,
            (ranked[group_col] == targets["_grp"])
            & (ranked["rn"] == targets["target"]),
        )
        .select(
            F.col("_grp").alias(group_col),
            "q",
            F.col(value_col).alias("threshold"),
            "n_docs",
        )
    )


def with_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_word_max: float = 0.4,
    top_bigram_max: float = 0.2,
) -> DataFrame:
    """Within-document repetition signals (the Gopher-style repetition
    filters, Rae et al. 2021 — boilerplate and generation loops show up as
    repeated tokens long before any cross-document dedup sees them):

    * ``dup_word_frac``   — 1 − distinct/total words (pure array ops);
    * ``top_bigram_frac`` — occurrences of the most frequent word bigram /
      total bigrams, computed ROW-LOCALLY: sort the bigram array and take
      the longest equal run via ``F.aggregate`` (O(n log n) per doc,
      bounded by the doc's own length — the same bound the explode
      alternative has — but with ZERO shuffle and no join back);
    * ``repetitive``      — either signal over its threshold.

    Emits one row per input doc (degenerate ≤1-word docs score 0), so the
    filter composes with the dedup → quality → sample curation chain."""
    t = F.col(text_col)
    w = F.when(F.length(F.trim(t)) == 0, F.array().cast("array<string>")).otherwise(
        words(F.lower(t))
    )
    # O(n) shifted-zip, NOT transform(sequence, i -> slice(w, i+1, 2)):
    # per-index slice copies make that quadratic in document length
    bigrams = F.when(
        F.size(w) >= 2,
        F.zip_with(
            F.slice(w, 1, F.size(w) - 1),
            F.slice(w, 2, F.size(w) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # longest equal run in the sorted bigram array = max bigram count
    top_bg = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_bigrams = F.when(F.size(w) >= 2, F.size(w) - 1).otherwise(F.lit(0))
    return df.select(
        F.col(id_col),
        F.when(
            F.size(w) > 0,
            F.round(1 - F.size(F.array_distinct(w)) / F.size(w), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
        F.when(n_bigrams > 0, F.round(top_bg / n_bigrams, 6))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    ).withColumn(
        "repetitive",
        (F.col("dup_word_frac") > dup_word_max)
        | (F.col("top_bigram_frac") > top_bigram_max),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 (cross-engine reproducible) + a 16-hex-prefix
    shard key usable for fingerprint-range partition pruning."""
    t = F.col(text_col)
    return df.withColumn("fingerprint", F.md5(t)).withColumn(
        "fp_bucket", F.substring(F.md5(t), 1, 4)
    )
