"""T4 — mention detection (NER analog + noun projection + merge + spans).

Replaces the reference's Stanford-NER socket round trip per sentence
(``ner.py:108-143``), the noun projection (``helper_functions.py:33-48``,
P5), the overlap merge (``nel.py:129-148``, J2) and the BIO span fold
(``nel.py:179-208``, W3 / ``nel.py:91-126``, A3) with ONE Arrow-batched
pandas UDF over the ``tokens`` column — the reference's intermediate TSV
files (S6-S8) disappear entirely, and J1's positional file zip becomes a
zero-cost same-row operation.

The gazetteer index ships as a Spark broadcast variable (the small-dim
pattern of SURVEY.md §2.4 J3): one copy per executor, not per task.
"""

from __future__ import annotations

from typing import Dict, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.broadcast import Broadcast

from relationextractionpipeline_spark.functions import rules
from relationextractionpipeline_spark.plans import schemas


def make_mentions_udf(kb_index_bc: Broadcast, include_common: bool = True,
                      fuse_adjacent: bool = False):
    @F.pandas_udf(schemas.MENTIONS)
    def mentions_udf(tokens: pd.Series) -> pd.Series:
        kb_index: Dict[Tuple[str, ...], str] = kb_index_bc.value
        return tokens.map(
            lambda toks: rules.detect_mentions(
                toks, kb_index,  # Arrow structs normalize via rules._ensure_sent
                include_common=include_common, fuse_adjacent=fuse_adjacent,
            )
        )

    # deterministic in fact; fenced against InferFiltersFromGenerate cloning
    # the UDF below explode_mentions (see operators/segment.py)
    return mentions_udf.asNondeterministic()


def detect_mentions(parsed: DataFrame, kb_index_bc: Broadcast,
                    nel_mode: str = "merged") -> DataFrame:
    """``nel_mode='merged'`` — the main path (NER analog + common-noun merge,
    nel.py).  ``nel_mode='ner_only'`` — the reference's alternative NEL path
    (``ner_nel.py:31-44``): named entities only, adjacent NE spans fused into
    one mention (``ner_nel.py:139-142``); the output schema is identical —
    the NEL record schema, not the detector, is the stable interface
    (``ner_nel.py:235-255``)."""
    include_common = nel_mode != "ner_only"
    fuse_adjacent = nel_mode == "ner_only"
    return parsed.withColumn(
        "mentions",
        make_mentions_udf(kb_index_bc, include_common, fuse_adjacent)("tokens"),
    )


def explode_mentions(with_mentions: DataFrame) -> DataFrame:
    """One row per mention, keyed by (conv_id, turn_idx, sent_idx) — the
    ``links``-table precursor (entity-present sentences only: P7 filter,
    nel.py:260-261, expressed as the explode dropping empty arrays)."""
    return with_mentions.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        F.posexplode("mentions").alias("mention_id", "m"),
    ).select(
        "conv_id", "turn_idx", "sent_idx", "mention_id", "m.*"
    )
