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
    """Content fingerprint: md5 (cross-engine reproducible) + a 4-hex-char
    (16-bit) prefix shard key usable for fingerprint-range partition
    pruning."""
    t = F.col(text_col)
    return df.withColumn("fingerprint", F.md5(t)).withColumn(
        "fp_bucket", F.substring(F.md5(t), 1, 4)
    )


# The Gopher rule battery (Rae et al. 2021, appendix A1.1) — the published
# heuristic filter suite most pretraining pipelines start from.  Constants
# are the paper's, except the word-count floor which is a constructor arg
# because the useful band is corpus-dependent.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_BULLETS = ["-", "*", "•"]


def with_gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Named boolean columns, one per Gopher quality rule, plus the
    conjunction ``pass_gopher`` — kept separate (not pre-folded into one
    flag) because curation pipelines tune and ablate rules individually,
    and a per-rule pass-rate rollup is the standard corpus diagnostic.

    Rules (Rae et al. 2021): word count in [min_words, max_words]; mean
    word length in [3, 10]; '#'/'...' symbol-to-word ratio <= 0.1; <= 90%
    of lines bullet-initial; <= 30% of lines ellipsis-final; >= 80% of
    words contain an alphabetic character; >= 2 distinct stopword hits.

    Entirely native Columns over one scan — every rule is row-local
    arithmetic on split arrays inside whole-stage codegen; the operator
    adds zero shuffles at any scale.  No reference analog (the reference
    stops at triple emission, de_pipeline/pipeline.py:69-77)."""
    t = F.col(text_col)
    w = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(words(F.lower(t)))
    n_words = F.size(w)
    n_chars = F.length(t)
    mean_wl = F.when(
        n_words > 0, (n_chars - (n_words - 1)) / n_words
    ).otherwise(F.lit(0.0))
    n_symbols = F.size(
        F.regexp_extract_all(t, F.lit(r"#|\.\.\."), 0)
    )
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullet_arr = F.array(*[F.lit(b) for b in GOPHER_BULLETS])
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.array_contains(
                bullet_arr, F.substring(F.trim(ln), 1, 1)
            ),
        )
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda ln: F.trim(ln).endswith("..."))
    )
    n_alpha_words = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop_distinct = F.size(F.array_intersect(F.array_distinct(w), stop_arr))

    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "rule_symbol_ratio": F.when(
            n_words > 0, n_symbols / n_words <= 0.1
        ).otherwise(F.lit(False)),
        "rule_bullet_lines": F.when(
            n_lines > 0, n_bullet / n_lines <= 0.9
        ).otherwise(F.lit(True)),
        "rule_ellipsis_lines": F.when(
            n_lines > 0, n_ellipsis / n_lines <= 0.3
        ).otherwise(F.lit(True)),
        "rule_alpha_words": F.when(
            n_words > 0, n_alpha_words / n_words >= 0.8
        ).otherwise(F.lit(False)),
        "rule_stopwords": n_stop_distinct >= 2,
    }
    out = df.withColumn("n_words", n_words)
    passed = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        passed = passed & F.col(name)
    return out.withColumn("pass_gopher", passed)


def with_c4_rules(
    df: DataFrame,
    text_col: str = "text",
    min_sentences: int = 5,
    min_line_words: int = 3,
) -> DataFrame:
    """The C4 cleaning battery (Raffel et al. 2020 §2.2) — unlike the
    Gopher flags this one also TRANSFORMS: lines that don't end in
    terminal punctuation (. ! ? ") or carry fewer than ``min_line_words``
    words are dropped, and ``c4_text`` is the page rebuilt from the
    surviving lines.  Page-level flags:

    * ``rule_min_sentences`` — >= ``min_sentences`` sentence terminators
      in the retained text (C4 drops pages under 5 sentences)
    * ``rule_no_lorem``      — no 'lorem ipsum' boilerplate
    * ``rule_no_braces``     — no '{' (code page heuristic)
    * ``pass_c4``            — all of the above and >= 1 retained line

    The bad-words list (C4's fourth page filter) is deliberately
    omitted — it is a policy artifact, not an algorithm; plug it in as
    one more `~contains` conjunct if a deployment needs it.

    All row-local native Columns (split / filter / rlike inside
    whole-stage codegen), zero shuffles at any scale.  No reference
    analog (the reference stops at triple emission,
    de_pipeline/pipeline.py:69-77)."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda ln: F.trim(ln).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(ln), r"\s+")) >= min_line_words),
    )
    c4_text = F.array_join(kept, "\n")
    n_sentences = F.size(F.regexp_extract_all(c4_text, F.lit(r"[.!?]"), 0))
    rules = {
        "rule_min_sentences": n_sentences >= min_sentences,
        "rule_no_lorem": ~F.contains(F.lower(t), F.lit("lorem ipsum")),
        "rule_no_braces": ~F.contains(t, F.lit("{")),
    }
    out = (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn("n_sentences", n_sentences)
    )
    passed = F.col("n_lines_kept") > 0
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        passed = passed & F.col(name)
    return out.withColumn("pass_c4", passed).withColumn("c4_text", c4_text)
