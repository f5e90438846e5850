"""Pure-Python sequential oracle (SURVEY.md §5.1).

Runs the reference semantics — shared with the Spark UDFs via
``relationextractionpipeline_spark.functions.rules`` / ``lexicon`` — one
conversation at a time, in plain Python loops, exactly the way the reference
pipeline walks its batch files.  The Spark pipeline's distributed result is
compared against this; because both sides share the rule definitions, a
mismatch can only come from the distributed concerns (ordering, partitioning,
join keys, Arrow batching) — which is precisely what the P/R ≥ 0.95 gate is
meant to exercise (BASELINE.md).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pandas as pd

from relationextractionpipeline_spark.functions import lexicon as lx
from relationextractionpipeline_spark.functions import rules, turnproc


def build_kb_dict(entity_kb: pd.DataFrame) -> Dict[str, Tuple[str, float]]:
    """surface -> (url, prior), keeping the highest-prior candidate — the
    deterministic analog of AGDISTIS disambiguation (agdistis.py:36-53)."""
    kb: Dict[str, Tuple[str, float]] = {}
    for surface, url, prior in entity_kb.itertuples(index=False):
        cur = kb.get(surface)
        if cur is None or prior > cur[1]:
            kb[surface] = (url, float(prior))
    return kb


def build_kb_index(entity_kb: pd.DataFrame) -> Dict[Tuple[str, ...], str]:
    """token-tuple -> surface, for gazetteer longest-match."""
    return {tuple(s.split(" ")): s for s in entity_kb["surface"].tolist()}


def build_figer_dict(figer_map: pd.DataFrame) -> Dict[str, str]:
    return dict(zip(figer_map["url"], figer_map["figer_type"]))


def run_oracle(
    transcripts: pd.DataFrame,
    entity_kb: pd.DataFrame,
    figer_map: pd.DataFrame,
) -> pd.DataFrame:
    """Sequential reference run: returns the triples table
    (conv_id, turn_idx, sent_idx, subj, pred, obj, subj_type, obj_type,
    subj_kind, obj_kind, neg, passive, pred_tok, rel)."""
    kb = build_kb_dict(entity_kb)
    kb_index = build_kb_index(entity_kb)
    figer = build_figer_dict(figer_map)

    rows: List[dict] = []
    ordered = transcripts.sort_values(["conv_id", "turn_idx"])
    for conv_id, turn_idx, text in zip(
        ordered["conv_id"], ordered["turn_idx"], ordered["text"]
    ):
        for trip in turnproc.extract_turn_triples(text, kb, kb_index, figer):
            trip = dict(trip)
            trip.pop("line_idx", None)
            rows.append({"conv_id": conv_id, "turn_idx": int(turn_idx), **trip})
    cols = [
        "conv_id", "turn_idx", "sent_idx", "subj", "pred", "obj",
        "subj_type", "obj_type", "subj_kind", "obj_kind", "neg", "passive",
        "pred_tok", "rel", "rel_human", "rel_idx",
    ]
    return pd.DataFrame(rows, columns=cols)
