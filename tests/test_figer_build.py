"""Offline FIGER dimension build (S11/J4): Spark job vs a sequential fold of
the same synthetic raw files."""

from __future__ import annotations

from relationextractionpipeline_spark.sources import figer_build

TTL = [
    "<http://de.dbpedia.org/resource/Ada_Lovelace> <http://www.w3.org/2002/07/owl#sameAs> <http://rdf.freebase.com/ns/m.01> .",
    "<http://de.dbpedia.org/resource/Berlin> <http://www.w3.org/2002/07/owl#sameAs> <http://rdf.freebase.com/ns/m.02> .",
    "<http://de.dbpedia.org/resource/NoTypes> <http://www.w3.org/2002/07/owl#sameAs> <http://rdf.freebase.com/ns/m.03> .",
    "# a comment line that matches nothing",
    "<http://de.dbpedia.org/resource/OnlyEmpty> <http://www.w3.org/2002/07/owl#sameAs> <http://rdf.freebase.com/ns/m.04> .",
]
ENTITY_TYPES = [
    "m.01\t/people/person /computer/scientist",
    "m.02\t/unknown/zzz /location/citytown",
    "m.04\t/unknown/zzz",
]
TYPES_MAP = [
    "/people/person\t/person",
    "/computer/scientist\t/person/engineer",
    "/location/citytown\t/location/city",
    "/unknown/zzz\t",  # maps to empty ⇒ must be skipped by first-non-empty
]


def test_build_figer_map_first_nonempty_semantics(spark):
    links = figer_build.parse_freebase_links(
        spark.createDataFrame([(l,) for l in TTL], ["value"])
    )
    etypes = figer_build.parse_entity_types(
        spark.createDataFrame([(l,) for l in ENTITY_TYPES], ["value"])
    )
    tmap = figer_build.parse_types_map(
        spark.createDataFrame([(l,) for l in TYPES_MAP], ["value"])
    )
    got = {
        r["url"]: r["figer_type"]
        for r in figer_build.build_figer_map(links, etypes, tmap).collect()
    }
    assert got["http://de.dbpedia.org/resource/Ada_Lovelace"] == "/person"
    # first type maps to '' ⇒ second (non-empty) wins
    assert got["http://de.dbpedia.org/resource/Berlin"] == "/location/city"
    # no types at all / only-empty types ⇒ '' (runtime turns into 'none')
    assert got["http://de.dbpedia.org/resource/NoTypes"] == ""
    assert got["http://de.dbpedia.org/resource/OnlyEmpty"] == ""
    assert len(got) == 4  # comment line produced nothing


def test_ner_only_and_fused_mention_variants():
    from relationextractionpipeline_spark.functions import lexicon as lx, rules
    from relationextractionpipeline_spark.sources import testgen
    from tests.oracle import build_kb_index

    kbi = build_kb_index(testgen.gen_entity_kb())
    toks = lx.parse_sentence("Ada Lovelace audited the report.")
    full = rules.detect_mentions(toks, kbi)
    ner_only = rules.detect_mentions(toks, kbi, include_common=False)
    assert {m["kind"] for m in full} == {"ner", "com"}
    assert {m["kind"] for m in ner_only} == {"ner"}

    # adjacent KB entities: default keeps two mentions, fused path merges
    toks2 = lx.parse_sentence("Ada Lovelace Marie Curie audited Berlin.")
    plain = rules.detect_mentions(toks2, kbi, include_common=False)
    fused = rules.detect_mentions(
        toks2, kbi, include_common=False, fuse_adjacent=True
    )
    assert [m["surface"] for m in plain][:2] == ["Ada Lovelace", "Marie Curie"]
    assert fused[0]["surface"] == "Ada Lovelace Marie Curie"
