"""Per-turn orchestration shared by the oracle and the fused Spark stage.

One function owns the turn → sentences → tokens → mentions → links → triples
sequence so the sequential oracle (tests/oracle.py) and the distributed fused
extractor (operators/fused.py) cannot drift apart: both call
``extract_turn_triples`` and differ only in how turns are iterated
(driver loop vs Arrow-batched partitions).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from relationextractionpipeline_spark.functions import lexicon as lx
from relationextractionpipeline_spark.functions import rules


def extract_turn_triples(
    text: Optional[str],
    kb: Dict[str, Tuple[str, float]],
    kb_index: Dict[Tuple[str, ...], str],
    figer: Dict[str, str],
) -> List[dict]:
    """All triples for one turn's text; ``sent_idx`` counts sentences within
    the turn (the reference's per-file sentence numbering, nel.py:259-264,
    rekeyed per turn)."""
    out: List[dict] = []
    sent_idx = 0
    for line_idx, sent in rules.segment_text_with_lines(text or ""):
        tokens = lx.parse_sentence(sent)
        mentions = rules.detect_mentions(tokens, kb_index)
        for m in mentions:
            url, fg = rules.link_mention(str(m["surface"]), kb, figer)
            m["url"] = url
            m["figer"] = fg
        for trip in rules.extract_relations(tokens, mentions):
            out.append({"sent_idx": sent_idx, "line_idx": line_idx, **trip})
        sent_idx += 1
    return out
