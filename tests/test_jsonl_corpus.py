"""Reference-format corpus round trip: assembling conversations into articles
(JSONL) and re-ingesting them yields the same triple multiset."""

from __future__ import annotations

import json

from relationextractionpipeline_spark.plans import pipeline
from relationextractionpipeline_spark.sources import jsonl_corpus


def test_jsonl_corpus_round_trip(spark, tiny_paths, tiny_pandas, tmp_path):
    # build the reference-shaped JSONL from assembled conversations
    src = tiny_pandas["transcripts"].sort_values(["conv_id", "turn_idx"])
    articles = []
    for conv_id, grp in src.groupby("conv_id"):
        text = "\n".join(grp["text"])
        articles.append(
            {
                "articleId": conv_id,
                "date": "2026-01-01",
                "title": grp["text"].iloc[0][:20],
                "url": f"synthetic://{conv_id}",
                "text": text,
                "autoDetectLanguage": "xx",
            }
        )
    corpus_path = str(tmp_path / "corpus.jsonl")
    with open(corpus_path, "w") as f:
        for a in articles:
            f.write(json.dumps(a, ensure_ascii=False) + "\n")

    transcripts = jsonl_corpus.read_reference_corpus(spark, corpus_path)
    _, entity_kb, figer_map = pipeline.load_inputs(spark, tiny_paths)
    kb_bc, kbi_bc, fg_bc = pipeline.build_broadcasts(spark, entity_kb, figer_map)
    got = pipeline.run_fused(transcripts, kb_bc, kbi_bc, fg_bc).toPandas()

    native = pipeline.run_pipeline(spark, tiny_paths, mode="fused")[
        "triples"
    ].toPandas()

    # turn/sent numbering differs (multi-line turns split into separate
    # article lines) but the extracted content must be identical
    cols = ["conv_id", "subj", "pred", "obj", "subj_type", "obj_type",
            "subj_kind", "obj_kind", "neg", "passive", "rel"]
    a = sorted(map(tuple, got[cols].itertuples(index=False)))
    b = sorted(map(tuple, native[cols].itertuples(index=False)))
    assert a == b
