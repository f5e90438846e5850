"""Ontology-induction rollups: signatures and functionality on a
hand-computed fixture (the sf-scale gate is the DuckDB oracle for
kg_pred_signatures / kg_functionality)."""

from __future__ import annotations

from pyspark.sql import Row

from relationextractionpipeline_spark.operators import ontology


def _triples(spark):
    rows = [
        # born_in: 3 (person, location) + 1 (person, organization)
        ("born_in", "person", "location"),
        ("born_in", "person", "location"),
        ("born_in", "person", "location"),
        ("born_in", "person", "organization"),
        # works at / works_at: same cluster, map below merges them
        ("works at", "person", "organization"),
        ("works_at", "person", "organization"),
        # orphan predicate absent from the map → self-canonical
        ("unmapped_pred", "none", "none"),
    ]
    return spark.createDataFrame(rows, "pred string, subj_type string, obj_type string")


def _pred_map(spark):
    return spark.createDataFrame(
        [
            ("born_in", "born_in"),
            ("works at", "works at"),
            ("works_at", "works at"),
        ],
        "pred string, pred_canonical string",
    )


def test_predicate_signatures(spark):
    out = {
        r["pred_canonical"]: r
        for r in ontology.predicate_signatures(
            _triples(spark), _pred_map(spark)
        ).collect()
    }
    assert set(out) == {"born_in", "works at", "unmapped_pred"}

    b = out["born_in"]
    assert (b["top_subj_type"], b["top_obj_type"]) == ("person", "location")
    assert b["top_support"] == 3 and b["n_edges"] == 4
    assert b["n_signatures"] == 2
    assert abs(b["coverage"] - 0.75) < 1e-9

    w = out["works at"]  # the two surface forms merge into one signature
    assert w["n_edges"] == 2 and w["n_signatures"] == 1
    assert abs(w["coverage"] - 1.0) < 1e-9

    assert out["unmapped_pred"]["n_edges"] == 1  # coalesce fallback


def test_predicate_signatures_tie_break(spark):
    """Equal-support signatures resolve by type-pair string order."""
    t = spark.createDataFrame(
        [("p", "b_type", "x"), ("p", "a_type", "x")],
        "pred string, subj_type string, obj_type string",
    )
    m = spark.createDataFrame([("p", "p")], "pred string, pred_canonical string")
    row = ontology.predicate_signatures(t, m).collect()[0]
    assert row["top_subj_type"] == "a_type"
    assert row["top_support"] == 1 and row["n_edges"] == 2


def _edges(spark):
    rows = [
        # capital_of: functional for S1, violated by S2 (2 objects);
        # repeated (S2, O2) edge counts once for distinctness, twice for n_edges
        Row(pred="capital_of", subj_canonical="S1", obj_canonical="O1"),
        Row(pred="capital_of", subj_canonical="S2", obj_canonical="O2"),
        Row(pred="capital_of", subj_canonical="S2", obj_canonical="O2"),
        Row(pred="capital_of", subj_canonical="S2", obj_canonical="O3"),
        # unlinked endpoints are excluded entirely
        Row(pred="capital_of", subj_canonical=None, obj_canonical="O1"),
        Row(pred="knows", subj_canonical="S1", obj_canonical=None),
        Row(pred="knows", subj_canonical="S1", obj_canonical="O2"),
    ]
    return spark.createDataFrame(rows)


def test_functionality_with_map(spark):
    m = spark.createDataFrame(
        [("capital_of", "capital_of"), ("knows", "knows")],
        "pred string, pred_canonical string",
    )
    out = {
        r["pred_canonical"]: r
        for r in ontology.functionality(_edges(spark), m).collect()
    }
    c = out["capital_of"]
    assert c["n_edges"] == 4 and c["n_subjects"] == 2
    assert c["n_violating_subjects"] == 1
    assert abs(c["functionality"] - 0.5) < 1e-9
    k = out["knows"]  # the null-obj row dropped; one clean edge remains
    assert k["n_edges"] == 1 and k["n_violating_subjects"] == 0
    assert abs(k["functionality"] - 1.0) < 1e-9


def test_functionality_pre_joined_edges(spark):
    """materialize_graph edges already carry pred_canonical — pred_map=None
    path must agree with the joined path."""
    m = spark.createDataFrame(
        [("capital_of", "capital_of"), ("knows", "knows")],
        "pred string, pred_canonical string",
    )
    joined = _edges(spark).join(m, "pred", "left")
    a = sorted(
        ontology.functionality(joined).collect(),
        key=lambda r: r["pred_canonical"],
    )
    b = sorted(
        ontology.functionality(_edges(spark), m).collect(),
        key=lambda r: r["pred_canonical"],
    )
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def _rule_edges(spark, rows):
    df = spark.createDataFrame(
        rows,
        "conv_id string, pred string, subj_canonical string, "
        "obj_canonical string",
    )
    # materialize_graph edges carry pred_canonical; singleton self-map here
    return df.withColumn("pred_canonical", df.pred)


_RULE_ROWS = [
    # capital_of(x,y) co-occurs with city_in(x,y) on 2 pairs
    ("c1", "capital_of", "paris", "france"),
    ("c1", "capital_of", "paris", "france"),  # duplicate fact: no effect
    ("c1", "capital_of", "berlin", "germany"),
    ("c1", "city_in", "paris", "france"),
    ("c1", "city_in", "berlin", "germany"),
    ("c1", "city_in", "munich", "germany"),
    # inverse evidence: located_in(y,x) for one capital_of pair
    ("c2", "located_in", "france", "paris"),
    # symmetry: married_to on (a,b)/(b,a) plus a self-loop that must NOT
    # certify its own symmetry
    ("c2", "married_to", "a", "b"),
    ("c2", "married_to", "b", "a"),
    ("c2", "married_to", "c", "c"),
    # unresolved endpoint: excluded entirely
    ("c2", "capital_of", "ghost", None),
]


def test_mine_rules(spark):
    out = {
        (r["body_pred"], r["head_pred"], r["direction"]): r
        for r in ontology.mine_rules(
            _rule_edges(spark, _RULE_ROWS), min_support=1
        ).collect()
    }

    fwd = out[("capital_of", "city_in", "same")]
    assert fwd["support"] == 2 and fwd["n_body_pairs"] == 2
    assert abs(fwd["confidence"] - 1.0) < 1e-9
    assert abs(fwd["head_coverage"] - round(2 / 3, 6)) < 1e-9

    rev = out[("city_in", "capital_of", "same")]
    assert rev["support"] == 2 and rev["n_body_pairs"] == 3
    assert abs(rev["confidence"] - round(2 / 3, 6)) < 1e-9
    assert abs(rev["head_coverage"] - 1.0) < 1e-9
    # PCA: munich has no capital_of fact, so its body pair doesn't
    # count against the rule (2/2) where CWA counts it (2/3)
    assert abs(rev["pca_confidence"] - 1.0) < 1e-9

    inv = out[("capital_of", "located_in", "inverse")]
    assert inv["support"] == 1
    assert abs(inv["confidence"] - 0.5) < 1e-9
    # PCA for inverse keys on the body OBJECT (the head subject):
    # germany is no located_in subject -> 1/1
    assert abs(inv["pca_confidence"] - 1.0) < 1e-9

    # symmetry: (a,b)/(b,a) support 2; the (c,c) self-loop is excluded
    sym = out[("married_to", "married_to", "inverse")]
    assert sym["support"] == 2 and sym["n_body_pairs"] == 3
    assert abs(sym["confidence"] - round(2 / 3, 6)) < 1e-9
    # all three body objects (b, a, c) are married_to subjects: PCA
    # keeps the self-loop in the denominator -> 2/3
    assert abs(sym["pca_confidence"] - round(2 / 3, 6)) < 1e-9

    # a rule can never pair a predicate with itself in the same direction
    assert not any(
        b == h for (b, h, d) in out if d == "same"
    )
    # the null-endpoint fact contributes nowhere
    assert all("ghost" not in (b, h) for (b, h, _) in out)


def test_mine_rules_min_support(spark):
    sup2 = ontology.mine_rules(
        _rule_edges(spark, _RULE_ROWS), min_support=2
    ).collect()
    assert all(r["support"] >= 2 for r in sup2)
    assert ("capital_of", "located_in") not in {
        (r["body_pred"], r["head_pred"]) for r in sup2
    }


def test_entity_salience(spark):
    rows = [
        ("c1", "p", "e1", "e2"),
        ("c1", "p", "e1", "e3"),
        ("c2", "p", "e1", "e2"),
        ("c2", "p", None, "e9"),  # null side dropped, e9 still counts
    ]
    edges = spark.createDataFrame(
        rows,
        "conv_id string, pred string, subj_canonical string, "
        "obj_canonical string",
    )
    out = ontology.entity_salience(edges, top_k=2).collect()
    got = {(r["conv_id"], r["rank"]): r for r in out}
    assert len(out) == 4  # two convs × top-2

    # conv c1: tf e1=2, e2=1, e3=1; df e1=e2=2, e3=1; N=2
    # salience: e3 = ln 2, e1 = e2 = 0 → e3 first, tie broken by entity asc
    assert got[("c1", 1)]["entity"] == "e3"
    assert abs(got[("c1", 1)]["salience"] - round(0.6931471805599453, 6)) < 1e-9
    assert got[("c1", 2)]["entity"] == "e1"
    assert got[("c1", 2)]["salience"] == 0.0

    # conv c2: e9 (df 1) outranks the ubiquitous e1/e2
    assert got[("c2", 1)]["entity"] == "e9"
    assert got[("c2", 2)]["entity"] == "e1"
    assert got[("c2", 1)]["df"] == 1 and got[("c2", 2)]["df"] == 2


_CHAIN_ROWS = [
    # chain: born_in(x, city) + city_in(city, country) => citizen_of(x, country)
    ("c1", "born_in", "ada", "london"),
    ("c1", "born_in", "alan", "london"),
    ("c1", "born_in", "kurt", "vienna"),
    ("c1", "city_in", "london", "uk"),
    ("c1", "city_in", "vienna", "austria"),
    ("c1", "citizen_of", "ada", "uk"),
    ("c1", "citizen_of", "alan", "uk"),
    # kurt's head fact is missing: body-only pair
    # improper chains that must NOT count: self-loop bridge and x == y
    ("c2", "born_in", "loop", "loop"),
    ("c2", "city_in", "loop", "loop"),
    ("c2", "born_in", "narcissus", "mirror"),
    ("c2", "city_in", "mirror", "narcissus"),
]


def test_mine_chain_rules_composition(spark):
    out = {
        (r["body_pred1"], r["body_pred2"], r["head_pred"]): r
        for r in ontology.mine_chain_rules(
            _rule_edges(spark, _CHAIN_ROWS), min_support=1
        ).collect()
    }
    r = out[("born_in", "city_in", "citizen_of")]
    # body pairs: (ada,uk), (alan,uk), (kurt,austria); head holds for 2
    assert r["support"] == 2 and r["n_body_pairs"] == 3
    assert abs(r["confidence"] - round(2 / 3, 6)) < 1e-9
    assert abs(r["head_coverage"] - 1.0) < 1e-9
    # improper chains never form a body: no rule is keyed through loop /
    # narcissus-mirror (they'd surface as born_in+city_in => born_in etc.)
    assert all(k == ("born_in", "city_in", "citizen_of") for k in out), out


def test_mine_chain_rules_min_support_and_cap(spark):
    # min_support=3 kills the only rule
    assert (
        ontology.mine_chain_rules(
            _rule_edges(spark, _CHAIN_ROWS), min_support=3
        ).count()
        == 0
    )
    # cap=1 drops london (in_deg 2) from the bridge set: only the vienna
    # path survives as a body pair, and its head fact is absent
    capped = ontology.mine_chain_rules(
        _rule_edges(spark, _CHAIN_ROWS), min_support=1, max_mid_degree=1
    ).collect()
    assert capped == []


def test_mine_chain_rules_cap_keeps_head_denominators(spark):
    # two disjoint chains; the hub bridge is capped out but the head
    # denominator still counts ALL citizen_of facts
    rows = _CHAIN_ROWS + [
        ("c3", "citizen_of", "x%d" % i, "y%d" % i) for i in range(3)
    ]
    out = {
        (r["body_pred1"], r["body_pred2"], r["head_pred"]): r
        for r in ontology.mine_chain_rules(
            _rule_edges(spark, rows), min_support=1
        ).collect()
    }
    r = out[("born_in", "city_in", "citizen_of")]
    # head_coverage = 2 / (2 + 3) citizen_of facts
    assert abs(r["head_coverage"] - 0.4) < 1e-9


def test_mine_chain_rules_partition_invariant(spark):
    df = _rule_edges(spark, _CHAIN_ROWS)
    a = sorted(
        map(
            tuple,
            ontology.mine_chain_rules(df.repartition(7), min_support=1).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            ontology.mine_chain_rules(df.coalesce(1), min_support=1).collect(),
        )
    )
    assert a == b and a


def test_mine_chain_rules_bridge_fanout_rank_order(spark):
    # bridge "hub" has 3 in-facts; fanout=2 keeps the lexicographically
    # first two by (pred, subject): (in, a1) and (in, a2) — the a3 path
    # is sampled out, so its head fact can no longer be supported
    rows = [
        ("c1", "in", "a1", "hub"),
        ("c1", "in", "a2", "hub"),
        ("c1", "in", "a3", "hub"),
        ("c1", "out", "hub", "t"),
        ("c1", "goal", "a1", "t"),
        ("c1", "goal", "a2", "t"),
        ("c1", "goal", "a3", "t"),
    ]
    full = {
        (r["body_pred1"], r["body_pred2"], r["head_pred"]): r
        for r in ontology.mine_chain_rules(
            _rule_edges(spark, rows), min_support=1
        ).collect()
    }
    assert full[("in", "out", "goal")]["support"] == 3
    sampled = {
        (r["body_pred1"], r["body_pred2"], r["head_pred"]): r
        for r in ontology.mine_chain_rules(
            _rule_edges(spark, rows), min_support=1, bridge_fanout=2
        ).collect()
    }
    r = sampled[("in", "out", "goal")]
    assert r["support"] == 2 and r["n_body_pairs"] == 2
    # head denominator keeps ALL goal facts: coverage 2/3
    assert abs(r["head_coverage"] - round(2 / 3, 6)) < 1e-9


def test_mine_chain_rules_pca_confidence(spark):
    # kurt's body pair (kurt, austria) has NO citizen_of fact for kurt:
    # CWA confidence counts it against the rule (2/3); PCA does not (2/2)
    out = {
        (r["body_pred1"], r["body_pred2"], r["head_pred"]): r
        for r in ontology.mine_chain_rules(
            _rule_edges(spark, _CHAIN_ROWS), min_support=1
        ).collect()
    }
    r = out[("born_in", "city_in", "citizen_of")]
    assert abs(r["confidence"] - round(2 / 3, 6)) < 1e-9
    assert abs(r["pca_confidence"] - 1.0) < 1e-9

    # give kurt a citizen_of fact elsewhere: his body pair now counts
    # against PCA too (known-incomplete -> known-wrong)
    rows = _CHAIN_ROWS + [("c9", "citizen_of", "kurt", "hungary")]
    out2 = {
        (r["body_pred1"], r["body_pred2"], r["head_pred"]): r
        for r in ontology.mine_chain_rules(
            _rule_edges(spark, rows), min_support=1
        ).collect()
    }
    r2 = out2[("born_in", "city_in", "citizen_of")]
    assert abs(r2["pca_confidence"] - round(2 / 3, 6)) < 1e-9


def test_apply_chain_rules_predicts_missing_head(spark):
    # the only rule (born_in+city_in => citizen_of, pca 1.0) fires on
    # kurt's body pair; known facts are never re-predicted
    preds = ontology.apply_chain_rules(
        _rule_edges(spark, _CHAIN_ROWS), min_support=2, min_pca=0.9
    ).collect()
    assert [(r["pred"], r["subj"], r["obj"], r["n_rules"], r["score"])
            for r in preds] == [("citizen_of", "kurt", "austria", 1, 1.0)]


def test_apply_chain_rules_threshold_silences_weak_rules(spark):
    # raising min_pca above every rule's confidence yields no predictions
    assert (
        ontology.apply_chain_rules(
            _rule_edges(spark, _CHAIN_ROWS), min_support=2, min_pca=1.01
        ).count()
        == 0
    )


def test_apply_chain_rules_best_score_across_rules(spark):
    # two rules derive the same missing fact; the prediction keeps the
    # max PCA confidence and counts both rules
    rows = [
        # rule A: in1+out1 => goal (2 supported pairs, 1 missing)
        ("c1", "in1", "a", "h1"), ("c1", "out1", "h1", "t"),
        ("c1", "in1", "b", "h2"), ("c1", "out1", "h2", "t"),
        ("c1", "in1", "c", "h3"), ("c1", "out1", "h3", "t"),
        ("c1", "goal", "a", "t"), ("c1", "goal", "b", "t"),
        # rule B: in2+out2 => goal, weaker (1 of 2 supported + c missing)
        ("c1", "in2", "c", "h4"), ("c1", "out2", "h4", "t"),
        ("c1", "in2", "d", "h5"), ("c1", "out2", "h5", "t"),
        ("c1", "in2", "e", "h6"), ("c1", "out2", "h6", "t"),
        ("c1", "goal", "d", "t"), ("c1", "goal", "e", "t"),
    ]
    preds = {
        (r["pred"], r["subj"], r["obj"]): r
        for r in ontology.apply_chain_rules(
            _rule_edges(spark, rows), min_support=2, min_pca=0.1
        ).collect()
    }
    r = preds[("goal", "c", "t")]
    assert r["n_rules"] == 2 and abs(r["score"] - 1.0) < 1e-9


_RESOLVE_ROWS = [
    # "capital": 5 subjects, 1 conflicted -> functionality 0.8 (kept)
    ("c1", "capital", "fr", "paris"), ("c2", "capital", "fr", "paris"),
    ("c1", "capital", "de", "berlin"), ("c2", "capital", "de", "berlin"),
    ("c3", "capital", "de", "bonn"),
    ("c1", "capital", "uk", "london"),
    ("c1", "capital", "es", "madrid"),
    ("c1", "capital", "it", "rome"),
    # "likes": both subjects conflicted -> functionality 0.0 (excluded)
    ("c1", "likes", "a", "x"), ("c1", "likes", "a", "y"),
    ("c1", "likes", "b", "m"), ("c1", "likes", "b", "n"),
    # "cites": conv counts tie, evidence decides; then a pure lexicographic tie
    ("c1", "cites", "s", "o1"),
    ("c2", "cites", "s", "o2"), ("c2", "cites", "s", "o2"),
    ("c1", "cites", "t", "alpha"), ("c2", "cites", "t", "beta"),
    ("c1", "cites", "u", "solo"),
]


def test_resolve_functional_conflicts_keeps_best_evidence(spark):
    out = {
        (r["pred_canonical"], r["subj"]): r
        for r in ontology.resolve_functional_conflicts(
            _rule_edges(spark, _RESOLVE_ROWS), min_functionality=0.8
        ).collect()
    }
    r = out[("capital", "de")]
    assert r["kept_obj"] == "berlin" and r["n_objects"] == 2
    assert r["kept_convs"] == 2 and r["kept_evidence"] == 2
    assert r["total_evidence"] == 3
    # non-conflicting subjects are silent; sub-threshold predicates too
    assert ("capital", "fr") not in out
    assert not any(p == "likes" for p, _ in out)


def test_resolve_functional_conflicts_tie_breaks(spark):
    # "cites" functionality: s and t conflicted, u fine -> 1/3 < 0.8, so
    # lower the threshold to observe the tie-break ladder
    out = {
        (r["pred_canonical"], r["subj"]): r
        for r in ontology.resolve_functional_conflicts(
            _rule_edges(spark, _RESOLVE_ROWS), min_functionality=0.0
        ).collect()
    }
    # conv tie (1 vs 1): evidence 2 beats 1
    assert out[("cites", "s")]["kept_obj"] == "o2"
    # full tie: lexicographic min object
    assert out[("cites", "t")]["kept_obj"] == "alpha"
    # sub-threshold predicates now included: likes conflicts resolved
    assert out[("likes", "a")]["kept_obj"] == "x"


def test_resolve_functional_conflicts_partition_invariant(spark):
    df = _rule_edges(spark, _RESOLVE_ROWS)
    a = sorted(map(tuple, ontology.resolve_functional_conflicts(
        df.repartition(7), min_functionality=0.0).collect()))
    b = sorted(map(tuple, ontology.resolve_functional_conflicts(
        df.coalesce(1), min_functionality=0.0).collect()))
    assert a == b and a
