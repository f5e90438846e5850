"""Incremental canonicalization: merging a new batch into an existing
canonical entity graph must EQUAL a one-shot batch run over the union
(quotient-graph CC exactness), at every split and merge order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from relationextractionpipeline_spark.operators import canonicalize, sketches
from relationextractionpipeline_spark.plans import pipeline

NIW = "http://aksw.org/notInWiki/"

# verified in-module: J(S_A, S_OMEGA) = 0.667 < 0.7 (candidate pair, killed
# by verification) while the BRIDGE surface clears 0.7 against BOTH and
# co-buckets with both at (n_hashes=32, bands=8)
S_A = "merger bridge company alpha"
S_OMEGA = "merger bridge company omega"
S_BRIDGE = "merger bridge company alega"


def _links(spark, rows):
    """Minimal linked-mention rows: (surface, url)."""
    return spark.createDataFrame(
        [(s, u, "/organization", "E") for s, u in rows],
        ["surface", "url", "figer", "kind"],
    )


def _niw(surface):
    return NIW + surface.replace(" ", "_")


def _assign_map(state):
    return {r.ent_key: r.canonical_id for r in state.assign.collect()}


def test_fixture_topology_preconditions():
    def j(a, b):
        return sketches.jaccard(
            sketches.char_shingles(a, 3), sketches.char_shingles(b, 3)
        )

    assert j(S_A, S_OMEGA) < 0.7
    assert j(S_A, S_BRIDGE) >= 0.7
    assert j(S_OMEGA, S_BRIDGE) >= 0.7


def test_new_batch_bridges_old_clusters(spark):
    s0 = canonicalize.entity_graph_state(
        _links(spark, [(S_A, _niw(S_A)), (S_OMEGA, _niw(S_OMEGA))])
    )
    before = _assign_map(s0)
    assert before[S_A.replace(" ", "_")] != before[S_OMEGA.replace(" ", "_")]

    s1 = canonicalize.merge_entity_batch(
        s0, _links(spark, [(S_BRIDGE, _niw(S_BRIDGE))])
    )
    after = _assign_map(s1)
    keys = [x.replace(" ", "_") for x in (S_A, S_OMEGA, S_BRIDGE)]
    assert len({after[k] for k in keys}) == 1
    # canonical is the min ent_key over the MERGED component — old keys relabel
    assert after[keys[0]] == min(keys)


def test_returning_key_with_new_surface_adds_evidence(spark):
    """A key seen before can return with a new alias surface; the new
    surface's LSH evidence must be able to merge OLD clusters."""
    url_one = "http://dbpedia.org/page/Node_One"
    s0 = canonicalize.entity_graph_state(
        _links(
            spark,
            [("completely different thing", url_one), (S_OMEGA, _niw(S_OMEGA))],
        )
    )
    before = _assign_map(s0)
    assert before["Node_One"] != before[S_OMEGA.replace(" ", "_")]

    # same ent_key Node_One, NEW surface near S_OMEGA
    s1 = canonicalize.merge_entity_batch(s0, _links(spark, [(S_BRIDGE, url_one)]))
    after = _assign_map(s1)
    assert after["Node_One"] == after[S_OMEGA.replace(" ", "_")] == "Node_One"


def test_merge_empty_batch_is_identity(spark):
    base = _links(spark, [(S_A, _niw(S_A)), (S_OMEGA, _niw(S_OMEGA))])
    s0 = canonicalize.entity_graph_state(base)
    s1 = canonicalize.merge_entity_batch(s0, base.limit(0))
    assert _assign_map(s1) == _assign_map(s0)
    assert s1.refs.count() == s0.refs.count()


@pytest.fixture(scope="module")
def corpus_links(spark, tiny_paths):
    run = pipeline.run_pipeline(spark, tiny_paths, mode="staged")
    links = run["links"].select(
        "conv_id", "surface", "url", "figer", "kind"
    )
    links.persist().count()
    yield links
    links.unpersist()


def _splits(links, n):
    return [
        links.where(F.pmod(F.xxhash64("conv_id"), F.lit(n)) == i) for i in range(n)
    ]


def test_two_batch_merge_equals_batch_on_corpus(spark, corpus_links):
    full = _assign_map(canonicalize.entity_graph_state(corpus_links))
    b0, b1 = _splits(corpus_links, 2)
    incr = canonicalize.merge_entity_batch(canonicalize.entity_graph_state(b0), b1)
    assert _assign_map(incr) == full
    # refs universe is the union's distinct rows
    assert (
        incr.refs.count()
        == canonicalize.entity_refs(corpus_links)
        .select("ent_key", "surface", "url")
        .distinct()
        .count()
    )


def test_repeated_merges_equal_batch_on_corpus(spark, corpus_links):
    full = _assign_map(canonicalize.entity_graph_state(corpus_links))
    b0, b1, b2 = _splits(corpus_links, 3)
    state = canonicalize.entity_graph_state(b0)
    state = canonicalize.merge_entity_batch(state, b1)
    state = canonicalize.merge_entity_batch(state, b2)
    assert _assign_map(state) == full


def test_entities_from_assign_matches_canonicalize(spark, tiny_paths):
    run = pipeline.run_pipeline(spark, tiny_paths, mode="staged")
    ents_batch, _ = canonicalize.canonicalize(run["triples"], run["links"])
    state = canonicalize.entity_graph_state(run["links"])
    ents_incr = canonicalize.entities_from_assign(run["links"], state.assign)
    cols = ["canonical_id", "n_mentions", "n_keys", "n_surfaces"]

    def norm(df):
        return sorted(
            map(
                tuple,
                df.select(
                    "canonical_id",
                    "n_mentions",
                    F.size("keys").alias("n_keys"),
                    F.size("surfaces").alias("n_surfaces"),
                ).collect(),
            )
        )

    assert norm(ents_incr) == norm(ents_batch), cols


def _pred_triples(spark, preds):
    return spark.createDataFrame([(p,) for p in preds], ["pred"])


def _pred_map(state):
    return {r.pred: r.pred_canonical for r in state.assign.collect()}


def test_predicate_merge_relabels_grown_cluster(spark):
    # batch 1: {B, C} cluster (canonical B), D singleton; batch 2 adds A,
    # near both and lexicographically smaller -> whole cluster relabels to A
    b = "escalate_ticket.abc"
    c = "escalate_ticket.abz"
    d = "open_incident_report"
    a = "escalate_ticket.ab"
    s0 = canonicalize.predicate_graph_state(_pred_triples(spark, [b, c, d]))
    m0 = _pred_map(s0)
    assert m0[b] == m0[c] == b and m0[d] == d
    s1 = canonicalize.merge_predicate_batch(s0, _pred_triples(spark, [a]))
    m1 = _pred_map(s1)
    assert m1[a] == m1[b] == m1[c] == a
    assert m1[d] == d


def test_predicate_merge_replay_is_identity(spark):
    batch = _pred_triples(
        spark, ["escalate_ticket.abc", "escalate_ticket.abz", "other_pred"]
    )
    s0 = canonicalize.predicate_graph_state(batch)
    s1 = canonicalize.merge_predicate_batch(s0, batch)
    assert _pred_map(s1) == _pred_map(s0)


def test_predicate_two_batch_merge_equals_batch_on_corpus(spark, tiny_paths):
    run = pipeline.run_pipeline(spark, tiny_paths, mode="staged")
    triples = run["triples"].select("conv_id", "pred")
    triples.persist().count()
    full = {
        r.pred: r.pred_canonical
        for r in canonicalize.canonicalize_predicates(triples).collect()
    }
    b0 = triples.where(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0)
    b1 = triples.where(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 1)
    incr = canonicalize.merge_predicate_batch(
        canonicalize.predicate_graph_state(b0), b1
    )
    assert _pred_map(incr) == full
    triples.unpersist()
    spark.catalog.clearCache()


def test_merge_with_partial_or_absent_sigs_self_heals(spark, corpus_links):
    """The persisted signature cache is an OPTIMIZATION, never a semantic
    input: a merge over a state whose ``sigs`` table is absent (legacy /
    kill before the sigs write) or missing rows (kill between the refs and
    sigs writes) must sketch the gap itself and produce exactly the full
    one-shot assignment."""
    full = _assign_map(canonicalize.entity_graph_state(corpus_links))
    b0, b1 = _splits(corpus_links, 2)
    s0 = canonicalize.entity_graph_state(b0)

    # absent sigs (legacy state)
    legacy = s0._replace(sigs=None)
    assert _assign_map(canonicalize.merge_entity_batch(legacy, b1)) == full

    # partial sigs: drop half the rows deterministically
    partial = s0._replace(
        sigs=s0.sigs.where(F.pmod(F.xxhash64("ent_key"), F.lit(2)) == 0)
    )
    assert _assign_map(canonicalize.merge_entity_batch(partial, b1)) == full

    # extra sigs rows (kill after sigs write, before refs write on some
    # hypothetical reorder): rows not in refs must be ignored
    extra_rows = sketches.with_minhash(
        spark.createDataFrame(
            [("zz_phantom_key", "zz phantom surface")],
            ["ent_key", "surface"],
        ),
        "surface",
        n_hashes=32,
        shingle_k=3,
        mode="char",
    )
    extra = s0._replace(sigs=s0.sigs.unionByName(extra_rows))
    merged = canonicalize.merge_entity_batch(extra, b1)
    assert _assign_map(merged) == full
    assert (
        merged.sigs.where(F.col("ent_key") == "zz_phantom_key").count() == 0
    )


def test_merged_sigs_equal_fresh_sketch(spark, corpus_links):
    """After a merge, the carried sigs table covers exactly the distinct
    (ent_key, surface) universe of refs, with signatures identical to a
    fresh sketch (so later merges can trust it bit-for-bit)."""
    b0, b1 = _splits(corpus_links, 2)
    state = canonicalize.merge_entity_batch(
        canonicalize.entity_graph_state(b0), b1
    )
    fresh = sketches.with_minhash(
        state.refs.select("ent_key", "surface").distinct(),
        "surface",
        n_hashes=32,
        shingle_k=3,
        mode="char",
    )
    got = {
        (r.ent_key, r.surface): tuple(r.minhash)
        for r in state.sigs.collect()
    }
    want = {
        (r.ent_key, r.surface): tuple(r.minhash) for r in fresh.collect()
    }
    assert got == want
