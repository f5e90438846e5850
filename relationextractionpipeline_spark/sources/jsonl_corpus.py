"""Reference-format JSONL corpus ingest (S1; README.txt INPUT DATA FORMAT).

The reference reads a JSONL file of articles
``{date, title, url, text, articleId, autoDetectLanguage}`` and explodes
``text`` into lines (``preprocessing.py:52-59``).  This adapter maps that
corpus shape onto the engine's native transcripts shape — an article is a
fully-assembled conversation, one line per turn (the exact inverse of
operators/assemble.assemble_conversations) — so the reference's own input
format runs through the same pipeline unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("articleId", T.StringType(), False),
        T.StructField("date", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("autoDetectLanguage", T.StringType(), True),
    ]
)


def read_reference_corpus(spark: SparkSession, path: str) -> DataFrame:
    """JSONL articles → transcripts(conv_id, turn_idx, role, text, tool, ts)."""
    articles = spark.read.schema(ARTICLE_SCHEMA).json(path)
    return articles_to_transcripts(articles)


def articles_to_transcripts(articles: DataFrame) -> DataFrame:
    """P1 as a keyed explode: article text lines become turn rows."""
    return articles.select(
        F.col("articleId").alias("conv_id"),
        F.posexplode(F.split(F.coalesce("text", F.lit("")), "\n")).alias(
            "turn_idx", "text"
        ),
    ).select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.lit("user").alias("role"),
        "text",
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("1980-01-01 00:00:00")).alias("ts"),
    )
