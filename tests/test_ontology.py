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
