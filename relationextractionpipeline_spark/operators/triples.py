"""J6 + R1-R9 — binary relation extraction.

The reference's flagship stage (``binary_relation.py:207-267``): within-row
ordered pair product over mentions (J6 — never a table-level crossJoin),
com-com / self / empty-predicate filters (P8-P10), dependency tree-walk
rules R1-R9, passive swap (R8), canonical strings (P11-P14).  The whole rule
set lives in ``functions/rules.py`` — shared verbatim with the oracle — and
runs as one Arrow-batched pandas UDF over ``(tokens, mentions)``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from relationextractionpipeline_spark.functions import rules
from relationextractionpipeline_spark.plans import schemas


@F.pandas_udf(schemas.TRIPLES)
def triples_udf(tokens: pd.Series, mentions: pd.Series) -> pd.Series:
    return pd.Series(
        [
            rules.extract_relations(t, ms)  # Arrow structs arrive dict-shaped
            for t, ms in zip(tokens, mentions)
        ]
    )


# Deterministic in fact; fenced so InferFiltersFromGenerate can't clone the
# whole parse→link→triples UDF chain into an inferred filter below the
# explode (observed: the staged plan evaluated all three Arrow stages twice).
# See operators/segment.py for the full rationale.
triples_udf = triples_udf.asNondeterministic()


def extract_triples(linked: DataFrame) -> DataFrame:
    """sentence rows (tokens + linked mentions) → one row per triple."""
    return (
        linked.withColumn("triples", triples_udf("tokens", "mentions"))
        .select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            F.explode("triples").alias("t"),
        )
        .select("conv_id", "turn_idx", "sent_idx", "t.*")
    )


def distinct_types(triples: DataFrame) -> DataFrame:
    """S14 — distinct FIGER types seen (binary_relation.py:72-82): a
    partial+final hash aggregate, replacing the reference's driver-side
    dict-as-set accumulated across every batch file."""
    return (
        triples.select(
            F.explode(F.array("subj_type", "obj_type")).alias("figer_type")
        )
        .distinct()
    )
