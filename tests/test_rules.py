"""Unit tests per reference operator (SURVEY.md §5.2), each citing the
behavior it pins down."""

from relationextractionpipeline_spark.functions import lexicon as lx, rules
from relationextractionpipeline_spark.sources import testgen
from tests import oracle as orc


KB = testgen.gen_entity_kb()
FIGER = testgen.gen_figer_map()
KB_DICT = orc.build_kb_dict(KB)
KB_INDEX = orc.build_kb_index(KB)
FIGER_DICT = orc.build_figer_dict(FIGER)


def _mentions(sent):
    toks = lx.parse_sentence(sent)
    ms = rules.detect_mentions(toks, KB_INDEX)
    for m in ms:
        m["url"], m["figer"] = rules.link_mention(m["surface"], KB_DICT, FIGER_DICT)
    return toks, ms


def _triples(sent):
    toks, ms = _mentions(sent)
    return rules.extract_relations(toks, ms)


# --- segmentation (T1, preprocessing.py:101-112) ---------------------------

def test_segment_basic_and_empty_line_filter():
    assert rules.segment_text("A b. C d!\n\nE f?") == ["A b.", "C d!", "E f?"]


def test_segment_abbreviation_guard():
    assert rules.segment_line("Dr. Who audited Berlin. Fine.") == [
        "Dr. Who audited Berlin.", "Fine.",
    ]


def test_segment_with_lines_keeps_line_idx():
    got = rules.segment_text_with_lines("A b.\nC d. E f.")
    assert got == [(0, "A b."), (1, "C d."), (1, "E f.")]


# --- BIO span grouping (W3, nel.py:179-208) --------------------------------

def test_adjacent_nouns_merge_into_one_com_span():
    # identical 'NOUN' tags with no B- prefix ⇒ contiguous run = one span
    toks = lx.parse_sentence("the report archive audited Berlin.")
    tags = rules.noun_tags(toks)
    assert tags[1] == tags[2] == "com1"


def test_adjacent_kb_entities_get_distinct_spans():
    toks = lx.parse_sentence("Ada Lovelace Marie Curie audited Berlin.")
    nt = rules.ner_tags(toks, KB_INDEX)
    assert nt[:4] == ["ner1", "ner1", "ner2", "ner2"]


# --- overlap merge (J2, nel.py:129-148) ------------------------------------

def test_merge_ne_wins_and_suppresses_overlapped_com_everywhere():
    ner = ["0", "ner1", "0", "0"]
    com = ["com1", "com1", "0", "com2"]
    # com1 overlaps ner1 at position 1 ⇒ suppressed also at position 0
    assert rules.merge_tags(ner, com) == ["0", "ner1", "0", "com2"]


# --- span map (A3, nel.py:91-126) ------------------------------------------

def test_spans_are_one_based_with_kind():
    toks, ms = _mentions("Ada Lovelace audited the report.")
    assert ms[0]["start_tok"] == 1 and ms[0]["end_tok"] == 2
    assert ms[0]["kind"] == "ner" and ms[0]["surface"] == "Ada Lovelace"
    assert ms[1]["kind"] == "com" and ms[1]["surface"] == "report"


# --- linking (T5/J3, nel.py:286-315) ----------------------------------------

def test_link_known_alias_resolves_to_canonical_url():
    url, figer = rules.link_mention("Lovelace", KB_DICT, FIGER_DICT)
    assert url.endswith("/Ada_Lovelace")
    assert figer == "/person/engineer"


def test_link_unknown_surface_gets_notinwiki():
    url, figer = rules.link_mention("report", KB_DICT, FIGER_DICT)
    assert url == rules.NOT_IN_WIKI_PREFIX + "report"
    assert figer == "none"


def test_link_empty_figer_maps_to_none():
    # testgen maps some urls to '' — nel.py:304 treats '' as unmapped
    url, figer = rules.link_mention("Quietfall Collective", KB_DICT, FIGER_DICT)
    assert "notInWiki" in url and figer == "none"


# --- canonical strings (P11-P14, binary_relation.py:113-124) ----------------

def test_canonical_entity_string_branches():
    assert rules.canonical_entity_string(
        "http://synthetic.kb/resource/Ada_Lovelace", "Lovelace"
    ) == "Ada_Lovelace"
    assert rules.canonical_entity_string(
        rules.NOT_IN_WIKI_PREFIX + "x", "New Entity"
    ) == "New_Entity"


def test_figer_normalize():
    assert rules.figer_normalize("none") == "#thing"
    assert rules.figer_normalize("/person/politician") == "#person"
    assert rules.figer_normalize("/location") == "#location"


def test_kind_flag():
    assert rules.kind_flag("ner") == "E" and rules.kind_flag("com") == "G"


# --- extraction rules (R1-R9, binary_relation.py:177-267) -------------------

def test_r3_plain_predicate_lemma():
    (t,) = _triples("Ada Lovelace audited Berlin.")
    assert (t["subj"], t["pred"], t["obj"]) == ("Ada_Lovelace", "audit", "Berlin")
    assert t["subj_type"] == "#person" and t["obj_type"] == "#location"
    assert t["subj_kind"] == "E" and t["obj_kind"] == "E"


def test_r4_particle_verb():
    (t,) = _triples("Ada Lovelace picked the report up.")
    assert t["pred"] == "pick_up"


def test_r5_xcomp_modifier_and_r2_head_path():
    (t,) = _triples("Ada Lovelace wanted to audit Berlin.")
    assert t["pred"] == "want.audit"
    # R9: arg-1 name drops the suffixes (binary_relation.py:126)
    assert "(want.1,want.audit.2)" in t["rel"]


def test_depth2_xcomp_emits_nothing():
    assert _triples("Ada Lovelace wanted to try to audit Berlin.") == []


def test_r5_deep_xcomp_chain_object_on_matrix_verb():
    """R5 depth ≥3: the object sits BEFORE the xcomp chain, so the pair gate
    passes on ent1head==ent2head and the recursive descent
    (binary_relation.py:193-204) appends every chained verb."""
    (t,) = _triples("Ada Lovelace wanted Berlin to try to plan to audit.")
    assert t["pred"] == "want.try.plan.audit"
    # arg-1 still drops the suffixes (binary_relation.py:126)
    assert "(want.1,want.try.plan.audit.2)" in t["rel"]


def test_r7_negation_with_xcomp_bridge():
    """R7×R5: negation on the matrix verb of an xcomp bridge — advmod
    descent starts at the predicate index (binary_relation.py:177-190),
    the xcomp hop passes the pair gate (:252)."""
    (t,) = _triples("Ada Lovelace not want to audit Berlin.")
    assert t["pred"] == "want.audit"
    assert t["neg"] is True and t["rel"].startswith("(NEG__(")


def test_to_not_verb_emits_nothing():
    """Parser-analog boundary: 'to not V' breaks the TO-adjacency xcomp
    detection, the verb attaches as conj, the gate rejects the pair."""
    assert _triples("Ada Lovelace wanted to not audit Berlin.") == []


def test_r6_preposition_suffix():
    (t,) = _triples("Ada Lovelace relied on Berlin.")
    assert t["pred"] == "rely.on"


def test_r7_negation_direct_and_nested():
    (t,) = _triples("Ada Lovelace not trust Berlin.")
    assert t["neg"] is True and t["rel"].startswith("(NEG__(")
    (t,) = _triples("Ada Lovelace really not trust Berlin.")
    assert t["neg"] is True


def test_r8_passive_swap():
    (t,) = _triples("Berlin was audited by Acme Corp.")
    assert t["subj"] == "Acme_Corp" and t["obj"] == "Berlin"
    assert t["passive"] is True and t["pred"] == "audit.by"


def test_p8_comcom_filtered():
    assert _triples("the report audited the budget.") == []


def test_p10_no_predicate_filtered():
    assert _triples("really audited.") == []


def test_j6_ordered_pair_product_multi_entity():
    ts = _triples("Ada Lovelace audited Berlin with Paris.")
    got = {(t["subj"], t["pred"], t["obj"]) for t in ts}
    assert got == {
        ("Ada_Lovelace", "audit", "Berlin"),
        ("Ada_Lovelace", "audit.with", "Paris"),
    }


def test_rel_string_format_exact():
    (t,) = _triples("Ada Lovelace audited Berlin.")
    assert t["rel"] == (
        "((audit.1,audit.2)::Ada_Lovelace::Berlin::#person::#location::EE::0::3)"
    )


def test_numeric_surface_entity():
    (t,) = _triples("42 audited Berlin.")
    assert t["subj"] == "42" and t["subj_type"] == "#thing"
