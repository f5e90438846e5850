"""Offline FIGER dimension build (SURVEY.md §2.1 S11 / §2.4 J4 / §3.4).

The reference builds its DBPedia→FIGER map with three sequential gzip scans
into Python dicts (``scripts/DBPedia_to_FIGER.py:13-49``) composed by a
first-non-empty fold (``:51-71``).  Re-expressed as one Spark job:

* TTL scan        → ``regexp_extract`` over ``spark.read.text`` lines
* entity2type     → split + ``posexplode`` (keeps the file-order position the
                    reference's "first non-empty" rule depends on)
* type→FIGER      → broadcast join
* first-non-empty → ``row_number`` over (dbpedia_url ORDER BY type position)

Runs once offline; the runtime consumes the small output as a broadcast dim
(J3).  The synthetic fixtures in tests mirror the reference's file formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# '<http://de.dbpedia.org/resource/X> <owl#sameAs> <http://rdf.freebase.com/ns/m.0abc> .'
TTL_PATTERN = r"<(http://[^>]*dbpedia[^>]*)>\s+<[^>]*>\s+<http://rdf\.freebase\.com/ns/([^>]+)>"


def parse_freebase_links(ttl_lines: DataFrame) -> DataFrame:
    """TTL text → (dbpedia_url, freebase_mid); non-matching lines dropped."""
    return (
        ttl_lines.select(
            F.regexp_extract("value", TTL_PATTERN, 1).alias("dbpedia_url"),
            F.regexp_extract("value", TTL_PATTERN, 2).alias("freebase_mid"),
        )
        .where((F.col("dbpedia_url") != "") & (F.col("freebase_mid") != ""))
    )


def parse_entity_types(lines: DataFrame) -> DataFrame:
    """'mid<TAB>/type/a /type/b ...' → (freebase_mid, pos, freebase_type)."""
    parts = F.split("value", "\t")
    return (
        lines.select(
            parts.getItem(0).alias("freebase_mid"),
            F.posexplode(F.split(parts.getItem(1), " ")).alias(
                "pos", "freebase_type"
            ),
        )
        .where(F.col("freebase_type") != "")
    )


def parse_types_map(lines: DataFrame) -> DataFrame:
    """'/freebase/type<TAB>/figer/type' → (freebase_type, figer_type)."""
    parts = F.split("value", "\t")
    return lines.select(
        parts.getItem(0).alias("freebase_type"),
        parts.getItem(1).alias("figer_type"),
    )


def build_figer_map(
    freebase_links: DataFrame,
    entity_types: DataFrame,
    types_map: DataFrame,
) -> DataFrame:
    """(url, figer_type): first (file-order) freebase type with a non-empty
    FIGER mapping per DBPedia url — the reference's composition rule
    (DBPedia_to_FIGER.py:51-71).  URLs whose types all map to '' keep '' —
    the runtime turns that into 'none' (nel.py:302-306)."""
    typed = (
        freebase_links.join(entity_types, "freebase_mid")
        .join(F.broadcast(types_map), "freebase_type", "left")
        .withColumn("figer_type", F.coalesce("figer_type", F.lit("")))
    )
    w = Window.partitionBy("dbpedia_url").orderBy("pos")
    first_nonempty = (
        typed.where(F.col("figer_type") != "")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("dbpedia_url").alias("url"), "figer_type")
    )
    all_urls = freebase_links.select(
        F.col("dbpedia_url").alias("url")
    ).distinct()
    return all_urls.join(first_nonempty, "url", "left").select(
        "url", F.coalesce("figer_type", F.lit("")).alias("figer_type")
    )
