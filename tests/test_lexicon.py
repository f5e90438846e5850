"""Parser-analog unit tests: one handcrafted expectation per template family
(SURVEY.md §5.2) + detokenization round trip over a generated corpus."""

import random

from relationextractionpipeline_spark.functions import lexicon as lx, rules
from relationextractionpipeline_spark.sources import testgen


def _by_form(tokens):
    return {t["form"]: t for t in tokens}


def _tok(tokens, i):
    return tokens[i - 1]


def test_svo_parse():
    toks = lx.parse_sentence("Ada Lovelace audited Berlin.")
    d = _by_form(toks)
    assert d["Ada"]["deprel"] == "nsubj" and d["Ada"]["head"] == d["audited"]["id"]
    assert d["Lovelace"]["deprel"] == "flat" and d["Lovelace"]["head"] == d["Ada"]["id"]
    assert d["audited"]["deprel"] == "root" and d["audited"]["head"] == 0
    assert d["audited"]["lemma"] == "audit"
    assert d["Berlin"]["deprel"] == "obj" and d["Berlin"]["head"] == d["audited"]["id"]
    assert d["."]["deprel"] == "punct"


def test_particle_parse():
    toks = lx.parse_sentence("Alan Turing picked the report up.")
    d = _by_form(toks)
    assert d["up"]["deprel"] == "compound:prt" and d["up"]["head"] == d["picked"]["id"]
    assert d["the"]["deprel"] == "det" and d["the"]["head"] == d["report"]["id"]
    assert d["report"]["deprel"] == "obj"


def test_xcomp_parse():
    toks = lx.parse_sentence("Grace Hopper wanted to audit Berlin.")
    d = _by_form(toks)
    assert d["audit"]["deprel"] == "xcomp" and d["audit"]["head"] == d["wanted"]["id"]
    assert d["to"]["deprel"] == "mark" and d["to"]["head"] == d["audit"]["id"]
    assert d["Berlin"]["deprel"] == "obj" and d["Berlin"]["head"] == d["audit"]["id"]


def test_prep_parse():
    toks = lx.parse_sentence("Marie Curie relied on Paris.")
    d = _by_form(toks)
    assert d["Paris"]["deprel"] == "obl" and d["Paris"]["head"] == d["relied"]["id"]
    assert d["on"]["deprel"] == "case" and d["on"]["head"] == d["Paris"]["id"]


def test_negation_parse_direct_and_nested():
    toks = lx.parse_sentence("Isaac Newton not trust Berlin.")
    d = _by_form(toks)
    assert d["not"]["xpos"] == "PTKNEG"
    assert d["not"]["deprel"] == "advmod" and d["not"]["head"] == d["trust"]["id"]

    toks = lx.parse_sentence("Isaac Newton really not trust Berlin.")
    d = _by_form(toks)
    assert d["not"]["head"] == d["really"]["id"]  # nested advmod chain
    assert d["really"]["head"] == d["trust"]["id"]


def test_passive_parse():
    toks = lx.parse_sentence("Berlin was audited by Acme Corp.")
    d = _by_form(toks)
    assert d["Berlin"]["deprel"] == "nsubj:pass"
    assert d["was"]["deprel"] == "aux:pass"
    assert d["Acme"]["deprel"] == "obl"
    assert d["by"]["deprel"] == "case" and d["by"]["head"] == d["Acme"]["id"]


def test_adjacent_entities_split_by_kb():
    toks = lx.parse_sentence("Ada Lovelace Marie Curie audited Berlin.")
    d = _by_form(toks)
    assert d["Ada"]["deprel"] == "nsubj"
    assert d["Marie"]["deprel"] == "appos" and d["Marie"]["head"] == d["Ada"]["id"]
    assert d["Curie"]["deprel"] == "flat" and d["Curie"]["head"] == d["Marie"]["id"]


def test_unknown_capitalized_run_is_propn():
    toks = lx.parse_sentence("Zanzibar Holdings audited Berlin.")
    d = _by_form(toks)
    assert d["Zanzibar"]["upos"] == "PROPN" and d["Zanzibar"]["deprel"] == "nsubj"
    assert d["Holdings"]["deprel"] == "flat"


def test_detokenize_round_trip_generated():
    """Surface round trip over the full grammar (incl. MWT contractions):
    reconstruction is defined over surface tokens (P6)."""
    rng = random.Random(7)
    saw_mwt = False
    for _ in range(500):
        s = testgen.gen_sentence(rng)
        full = lx.parse_sentence_full(s)
        surface = [t["form"] for t in full["surface_tokens"]]
        assert rules.detokenize_surface(surface) == s
        toks = full["tokens"]
        assert [t["id"] for t in toks] == list(range(1, len(toks) + 1))
        if full["mwt"]:
            saw_mwt = True
            # MWT sentences: syntax list is longer and contraction-free
            assert len(toks) > len(surface)
            assert all(t["form"] not in lx.CONTRACTIONS for t in toks)
        else:
            # degenerate case: the two lists carry identical forms
            assert [t["form"] for t in toks] == surface
            assert rules.detokenize(toks) == s
    assert saw_mwt  # the grammar actually exercises P6


def test_mwt_expansion_surface_syntax_split():
    """P6 — the reference re-inserts German contraction range lines
    (unstable_parser_post_proc.py:11-41): one surface token ``im`` maps to
    syntax tokens ``in dem``; the range line records the span."""
    full = lx.parse_sentence_full("Turing testified im archive.")
    surface = [t["form"] for t in full["surface_tokens"]]
    syntax = [t["form"] for t in full["tokens"]]
    assert surface == ["Turing", "testified", "im", "archive", "."]
    assert syntax == ["Turing", "testified", "in", "dem", "archive", "."]
    assert full["mwt"] == [{"start": 3, "end": 4, "form": "im"}]
    # surface restores the contraction; syntax reads the expansion
    assert rules.detokenize_surface(surface) == "Turing testified im archive."
    assert rules.detokenize(full["tokens"]) == "Turing testified in dem archive."
    # the expanded tokens parse like their uncontracted counterparts
    d = _by_form(full["tokens"])
    assert d["in"]["xpos"] == "APPR" and d["dem"]["deprel"] == "det"
    assert d["archive"]["deprel"] == "obj"


_KB = {"Alan Turing": ("http://synthetic.kb/resource/Alan_Turing", 1.0),
       "Turing": ("http://synthetic.kb/resource/Alan_Turing", 0.9),
       "Berlin": ("http://synthetic.kb/resource/Berlin", 1.0),
       "Paris": ("http://synthetic.kb/resource/Paris", 1.0)}
_KBI = {tuple(k.split()): k for k in _KB}


def test_conjunction_extracts_first_clause_only():
    """R2's shared-head/xcomp gate is blind to `conj` (the reference too,
    binary_relation.py:252): only the first conjunct's pair emits."""
    from relationextractionpipeline_spark.functions import turnproc

    s = "Turing audited Berlin and praised Paris."
    toks = lx.parse_sentence(s)
    d = _by_form(toks)
    assert d["and"]["deprel"] == "cc" and d["and"]["upos"] == "CCONJ"
    assert d["praised"]["deprel"] == "conj"
    trips = turnproc.extract_turn_triples(s, _KB, _KBI, {})
    assert [(t["subj"], t["pred"], t["obj"]) for t in trips] == [
        ("Alan_Turing", "audit", "Berlin")
    ]
    assert rules.detokenize(toks) == s


def test_relative_clause_extracts_embedded_clause():
    from relationextractionpipeline_spark.functions import turnproc

    s = "Turing , who audited the budget , signed Berlin."
    toks = lx.parse_sentence(s)
    d = _by_form(toks)
    assert d["who"]["upos"] == "PRON" and d["who"]["deprel"] == "nsubj"
    assert d[","]["upos"] == "PUNCT"
    trips = turnproc.extract_turn_triples(s, _KB, _KBI, {})
    # the head entity is nsubj of the embedded verb → (E, V1, X); the matrix
    # clause hangs off a `conj` head → invisible to R2, as in the reference
    assert [(t["subj"], t["pred"], t["obj"]) for t in trips] == [
        ("Alan_Turing", "audit", "budget")
    ]
    # mid-sentence punctuation keeps its space in the round trip
    assert rules.detokenize(toks) == s


def test_mwt_sentence_yields_triples():
    from relationextractionpipeline_spark.functions import turnproc

    kb = {"Alan Turing": ("http://synthetic.kb/resource/Alan_Turing", 1.0),
          "Turing": ("http://synthetic.kb/resource/Alan_Turing", 0.9)}
    kbi = {("Alan", "Turing"): "Alan Turing", ("Turing",): "Turing"}
    trips = turnproc.extract_turn_triples(
        "Turing testified im archive.", kb, kbi, {}
    )
    assert len(trips) == 1
    assert trips[0]["pred"] == "testify"
    assert trips[0]["obj"] == "archive"


def test_mwt_inventory_full_roundtrip():
    """Every contraction in the inventory (28 German preposition-article
    forms — the full standard set plus colloquial-register variants; the
    range the reference's post-processor handles,
    unstable_parser_post_proc.py:11-41) expands to its two syntax tokens,
    records one MWT range, and round-trips exactly at the surface level."""
    assert len(lx.CONTRACTIONS) >= 28
    for c, parts in sorted(lx.CONTRACTIONS.items()):
        s = f"Turing testified {c} archive."
        full = lx.parse_sentence_full(s)
        surface = [t["form"] for t in full["surface_tokens"]]
        syntax = [t["form"] for t in full["tokens"]]
        assert surface[2] == c
        assert tuple(syntax[2:4]) == parts
        assert full["mwt"] == [{"start": 3, "end": 4, "form": c}]
        assert rules.detokenize_surface(surface) == s
        d = _by_form(full["tokens"])
        # expansion parses like an uncontracted prep+det pair
        assert d[parts[0]]["upos"] == "ADP"
        assert d[parts[1]]["deprel"] == "det"
        assert d["archive"]["deprel"] == "obj"


def test_multiword_numeric_and_unicode_surfaces():
    toks = lx.parse_sentence("42 audited São Paulo.")
    d = _by_form(toks)
    assert d["42"]["upos"] == "PROPN" and d["42"]["deprel"] == "nsubj"
    assert d["São"]["deprel"] == "obj" and d["Paulo"]["deprel"] == "flat"
