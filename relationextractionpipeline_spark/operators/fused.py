"""Fused turns→triples extractor: one ``mapInPandas`` crossing.

The staged operators (segment → parse → mentions → link → triples) are each
narrow, so Catalyst pipelines them into one Spark stage — but every pandas
UDF is a separate Arrow (de)serialization of the intermediate ``tokens`` /
``mentions`` arrays.  For the hot path that transfer dominates, so this
operator runs the identical per-turn orchestration
(``functions/turnproc.extract_turn_triples`` — the same function the oracle
calls) inside a single ``mapInPandas``: turns in, triple rows out, one Arrow
crossing, iterator API so broadcast dicts are fetched once per task.

Equality with the staged path is asserted by tests/test_pipeline.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.broadcast import Broadcast

from relationextractionpipeline_spark.functions import (
    lexicon as lx,
    rules,
    turnproc,
)

# rel/rel_human are NOT ferried through Arrow: they render natively from
# these fields after the crossing (operators/triples.with_rel_strings)
TRIPLE_COLS = [
    "conv_id", "turn_idx", "sent_idx", "subj", "pred", "obj", "subj_type",
    "obj_type", "subj_kind", "obj_kind", "neg", "passive", "pred_tok",
    "rel_idx",
]

OUT_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, subj string, pred string, "
    "obj string, subj_type string, obj_type string, subj_kind string, "
    "obj_kind string, neg boolean, passive boolean, pred_tok int, rel_idx int"
)


def extract_triples_fused(
    transcripts: DataFrame,
    kb_bc: Broadcast,
    kb_index_bc: Broadcast,
    figer_bc: Broadcast,
    cache_stats: dict | None = None,
) -> DataFrame:
    """``cache_stats`` (optional): dict of LongAccumulator under keys
    'lookups'/'hits'/'evictions' — the sentence-memo counters
    (functions/turnproc) surface per job, so cache behavior at scale is
    observable rather than inferred (see tools/kg_job.py)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kb = kb_bc.value
        kb_index = kb_index_bc.value
        figer = figer_bc.value
        base = turnproc.cache_counters() if cache_stats else (0, 0, 0)
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                for trip in turnproc.extract_turn_triples(
                    text, kb, kb_index, figer, render=False
                ):
                    rows.append(
                        (
                            conv_id, int(turn_idx), trip["sent_idx"],
                            trip["subj"], trip["pred"], trip["obj"],
                            trip["subj_type"], trip["obj_type"],
                            trip["subj_kind"], trip["obj_kind"],
                            trip["neg"], trip["passive"], trip["pred_tok"],
                            trip["rel_idx"],
                        )
                    )
            yield pd.DataFrame(rows, columns=TRIPLE_COLS)
        if cache_stats:
            now = turnproc.cache_counters()
            cache_stats["lookups"].add(now[0] - base[0])
            cache_stats["hits"].add(now[1] - base[1])
            cache_stats["evictions"].add(now[2] - base[2])

    from relationextractionpipeline_spark.operators import triples as triples_op

    return triples_op.with_rel_strings(
        transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
            run, schema=OUT_SCHEMA
        )
    )


MENTION_ROW_COLS = [
    "conv_id", "turn_idx", "sent_idx", "mention_id", "start_tok", "end_tok",
    "surface", "tag", "kind",
]

MENTION_ROW_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, mention_id int, "
    "start_tok int, end_tok int, surface string, tag string, kind string"
)


def mention_rows_fused(
    transcripts: DataFrame, kb_index_bc: Broadcast
) -> DataFrame:
    """Fused turns→mention-rows: segment + parse + mention detection in ONE
    ``mapInPandas`` crossing, emitting the exploded mention-row table
    directly (same columns as ``mentions.explode_mentions`` over the staged
    path — equality-tested).

    Rationale: the staged chain serializes the token-struct arrays through
    Arrow three times (parse out, mentions in/out); per-sentence token
    tables are ~10× the text's bytes, so at bench scale the staged path
    spends ~4× the fused path's wall just ferrying structs.  The link stage
    consumes only mention ROWS, so for link-only jobs nothing else needs to
    cross."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kb_index = kb_index_bc.value
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                ti = int(turn_idx)
                for sent_idx, (_li, sent) in enumerate(
                    rules.segment_text_with_lines(text or "")
                ):
                    toks = lx.parse_sentence_soa(sent)
                    for mid, m in enumerate(
                        rules.detect_mentions(toks, kb_index)
                    ):
                        rows.append(
                            (
                                conv_id, ti, sent_idx, mid,
                                int(m["start_tok"]), int(m["end_tok"]),
                                m["surface"], m["tag"], m["kind"],
                            )
                        )
            yield pd.DataFrame(rows, columns=MENTION_ROW_COLS)

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=MENTION_ROW_SCHEMA
    )
