"""Motif compiler: pattern parsing, join compilation, negation, and the
documented DISTINCT-named-assignment semantics on hand-computed graphs.
The sf-scale gate is the DuckDB oracle for kg_motif."""

from __future__ import annotations

import pytest

from relationextractionpipeline_spark.operators import motif


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


# a small graph with a chain, a shortcut, a self-loop, and a duplicate edge
GRAPH = [
    ("a", "likes", "b"),
    ("a", "likes", "b"),          # duplicate mention — must collapse
    ("b", "knows", "c"),
    ("a", "knows", "c"),          # shortcut a->c
    ("b", "knows", "d"),          # chain a->b->d with NO shortcut
    ("d", "likes", "d"),          # self-loop
    ("c", "mentors", "a"),
]


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_parse_rejects_bad_terms():
    with pytest.raises(ValueError):
        motif.parse_motif("(a)-[e]-(b)")  # undirected not supported
    with pytest.raises(ValueError):
        motif.parse_motif("")
    with pytest.raises(ValueError):
        motif.parse_motif("(a)-[a]->(b)")  # node/edge namespace collision


def test_single_edge_binds_all_positions(spark):
    out = motif.find(_edges(spark, GRAPH), "(x)-[r]->(y)")
    assert set(out.columns) == {"x", "r", "y"}
    # duplicates collapse: 6 distinct edges
    assert out.count() == 6


def test_chain_join(spark):
    out = motif.find(_edges(spark, GRAPH), "(x)-[]->(y); (y)-[]->(z)")
    got = _rows(out.select("x", "y", "z"))
    assert ("a", "b", "c") in got
    assert ("a", "b", "d") in got
    assert ("b", "c", "a") in got          # via mentors
    assert ("d", "d", "d") in got          # self-loop chains with itself
    assert ("a", "c", "a") in got          # a->c->a via mentors


def test_negation_left_anti(spark):
    out = motif.find(
        _edges(spark, GRAPH), "(x)-[]->(y); (y)-[]->(z); !(x)-[]->(z)"
    )
    got = _rows(out.select("x", "y", "z"))
    assert ("a", "b", "c") not in got      # shortcut a->c exists
    assert ("a", "b", "d") in got          # no shortcut a->d


def test_self_loop_term(spark):
    out = motif.find(_edges(spark, GRAPH), "(x)-[r]->(x)")
    # x binds ONCE (one column per named variable)
    assert set(out.columns) == {"x", "r"}
    assert _rows(out.select("x", "r")) == {("d", "likes")}


def test_edge_variable_join_on_predicate(spark):
    # same predicate on both hops: only knows->knows qualifies (b->c, b->d
    # have no incoming knows into b... a->b is likes) — build explicitly
    rows = [
        ("a", "p1", "b"),
        ("b", "p1", "c"),
        ("b", "p2", "c"),
    ]
    out = motif.find(_edges(spark, rows), "(x)-[e]->(y); (y)-[e]->(z)")
    assert _rows(out.select("x", "e", "z")) == {("a", "p1", "c")}


def test_anonymous_elements_bind_nothing(spark):
    out = motif.find(_edges(spark, GRAPH), "()-[r]->()")
    assert out.columns == ["r"]
    assert _rows(out) == {("likes",), ("knows",), ("mentors",)}


def test_disconnected_pattern_raises(spark):
    with pytest.raises(ValueError, match="disconnected"):
        motif.find(_edges(spark, GRAPH), "(a)-[]->(b); (c)-[]->(d)")


def test_negation_cannot_introduce_vars(spark):
    with pytest.raises(ValueError, match="unbound"):
        motif.find(_edges(spark, GRAPH), "(a)-[]->(b); !(b)-[]->(zzz)")


def test_distinct_assignment_semantics(spark):
    # two parallel predicates a->b: projecting only nodes yields ONE row
    rows = [("a", "p1", "b"), ("a", "p2", "b")]
    out = motif.find(_edges(spark, rows), "(x)-[]->(y)")
    assert out.count() == 1


def test_compiled_plan_has_no_cartesian(spark):
    out = motif.find(
        _edges(spark, GRAPH), "(x)-[p]->(y); (y)-[q]->(z); !(x)-[]->(z)"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# bound constants ('lit' slots)
# ---------------------------------------------------------------------------


def test_constant_predicate_filters_edges(spark):
    out = motif.find(_edges(spark, GRAPH), "(x)-['likes']->(y)")
    assert set(out.columns) == {"x", "y"}
    assert _rows(out) == {("a", "b"), ("d", "d")}


def test_constant_node_anchors_pattern(spark):
    # chains that END at c
    out = motif.find(_edges(spark, GRAPH), "(x)-[]->(y); (y)-[]->('c')")
    assert _rows(out.select("x", "y")) == {("a", "b"), ("c", "a")}


def test_constant_in_negation(spark):
    # pairs (x,y) adjacent where x does NOT 'like' y
    out = motif.find(
        _edges(spark, GRAPH), "(x)-[]->(y); !(x)-['likes']->(y)"
    )
    got = _rows(out)
    assert ("a", "b") not in got and ("d", "d") not in got
    assert ("b", "c") in got and ("c", "a") in got


def test_constant_with_spaces_and_dots(spark):
    rows = [("a", "located in.x", "b"), ("a", "other", "c")]
    out = motif.find(_edges(spark, rows), "(x)-['located in.x']->(y)")
    assert _rows(out) == {("a", "b")}


def test_constant_only_term_raises(spark):
    with pytest.raises(ValueError):
        motif.find(_edges(spark, GRAPH), "('a')-['likes']->('b')")


def test_constant_does_not_claim_variable_namespace():
    # a constant spelled like a variable elsewhere is fine — no clash
    terms = motif.parse_motif("(a)-['a']->(b)")
    assert terms[0].named_vars == ("a", "b")
