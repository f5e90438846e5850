"""Reference-format sinks (S12-S14): byte-level JSONL parity with a
sequential oracle writer sharing the reference's serialization rules."""

from __future__ import annotations

import json

import pytest

from relationextractionpipeline_spark.operators import sinks
from relationextractionpipeline_spark.plans import pipeline
from relationextractionpipeline_spark.functions import lexicon as lx, rules, turnproc
from tests import oracle as orc


@pytest.fixture(scope="module")
def run(spark, tiny_paths):
    return pipeline.run_pipeline(spark, tiny_paths, mode="staged")


def _oracle_jsonl(tiny_pandas):
    """Sequential writer: per conversation, per sentence in order, the
    reference's JSON object (binary_relation.py:150-157)."""
    kb = orc.build_kb_dict(tiny_pandas["entity_kb"])
    kbi = orc.build_kb_index(tiny_pandas["entity_kb"])
    fg = orc.build_figer_dict(tiny_pandas["figer_map"])
    lines = {}
    ordered = tiny_pandas["transcripts"].sort_values(["conv_id", "turn_idx"])
    counters = {}
    for conv_id, text in zip(ordered["conv_id"], ordered["text"]):
        trips_by_sent = {}
        sents = []
        sent_idx = 0
        for _li, sent in rules.segment_text_with_lines(text):
            tokens = lx.parse_sentence(sent)
            sents.append(rules.reconstruct_sentence(tokens))
            sent_idx += 1
        for trip in turnproc.extract_turn_triples(text, kb, kbi, fg):
            # emission order — the reference appends rels in pair-product
            # order (binary_relation.py get_relations), no re-sort
            trips_by_sent.setdefault(trip["sent_idx"], []).append(trip["rel"])
        for i, s in enumerate(sents):
            line_id = counters.get(conv_id, 0)
            counters[conv_id] = line_id + 1
            rels = trips_by_sent.get(i, [])
            obj = {
                "s": s,
                "date": sinks.REFERENCE_DATE,
                "articleId": conv_id,
                "lineId": str(line_id),
                "rels": [{"r": r} for r in rels],
            }
            lines[(conv_id, line_id)] = json.dumps(obj, ensure_ascii=False)
    return set(lines.values())


def test_reference_jsonl_byte_parity(run, tiny_pandas):
    got = set(
        r["line"]
        for r in sinks.reference_jsonl(run["parsed"], run["triples"]).collect()
    )
    want = _oracle_jsonl(tiny_pandas)
    assert got == want


def test_relation_free_sentences_still_emitted(run):
    df = sinks.reference_jsonl(run["parsed"], run["triples"]).toPandas()
    empties = df["line"].str.contains('"rels": []', regex=False)
    assert empties.any()  # entity-free/comcom templates produce rel-less rows


def _oracle_human_file(tiny_pandas) -> str:
    """Sequential replica of write_to_human_readable_file
    (binary_relation.py:292-303): per conversation (≙ per batch file), per
    sentence, 'line: <s>\\n' + format_relation_string per rel + blank line."""
    kb = orc.build_kb_dict(tiny_pandas["entity_kb"])
    kbi = orc.build_kb_index(tiny_pandas["entity_kb"])
    fg = orc.build_figer_dict(tiny_pandas["figer_map"])
    ordered = tiny_pandas["transcripts"].sort_values(["conv_id", "turn_idx"])
    per_conv: dict = {}
    for conv_id, text in zip(ordered["conv_id"], ordered["text"]):
        sents = [
            rules.reconstruct_sentence(lx.parse_sentence(s))
            for _li, s in rules.segment_text_with_lines(text)
        ]
        trips_by_sent: dict = {}
        for trip in turnproc.extract_turn_triples(text, kb, kbi, fg):
            trips_by_sent.setdefault(trip["sent_idx"], []).append(
                trip["rel_human"]
            )
        blocks = per_conv.setdefault(conv_id, [])
        for i, s in enumerate(sents):
            b = "line: " + s + "\n"
            for r in trips_by_sent.get(i, []):
                b += r + "\n"
            b += "\n"
            blocks.append(b)
    return "".join(
        "".join(per_conv[c]) for c in sorted(per_conv)
    )


def test_human_readable_byte_parity(run, tiny_pandas):
    """S13: concatenating block values in (conv_id, line_id) order must equal
    the reference writer's file bytes."""
    blocks = (
        sinks.human_readable(run["parsed"], run["triples"])
        .orderBy("conv_id", "line_id")
        .toPandas()
    )
    got = "".join(blocks["block"])
    assert got == _oracle_human_file(tiny_pandas)


def test_human_readable_blocks(run):
    blocks = sinks.human_readable(run["parsed"], run["triples"]).toPandas()
    assert blocks["block"].str.startswith("line: ").all()
    assert blocks["block"].str.endswith("\n\n").all()  # blank-line terminator
    with_rels = blocks[blocks["block"].str.contains("|||(passive: ", regex=False)]
    assert not with_rels.empty
    # the human format is format_relation_string, not the JSON rel string:
    # figer types sit directly after the predicate parens (')#'), and the
    # string ends with the passive suffix
    sample = with_rels["block"].iloc[0].splitlines()[1]
    assert ")#" in sample
    assert sample.endswith("|||(passive: True)") or sample.endswith(
        "|||(passive: False)"
    )


def test_types_list_matches_triples(run):
    types = {r["t"] for r in sinks.types_list(run["triples"]).collect()}
    tp = run["triples"].toPandas()
    assert types == set(tp["subj_type"]) | set(tp["obj_type"])
