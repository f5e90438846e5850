"""Canonicalization: sketches, LSH, connected components, entity clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from relationextractionpipeline_spark.operators import canonicalize, sketches
from relationextractionpipeline_spark.plans import pipeline


def test_minhash_deterministic_and_similarity_ordered():
    a = sketches.minhash_signature(sketches.char_shingles("acme corporation", 3), 64)
    a2 = sketches.minhash_signature(sketches.char_shingles("acme corporation", 3), 64)
    b = sketches.minhash_signature(sketches.char_shingles("acme corporatio", 3), 64)
    c = sketches.minhash_signature(sketches.char_shingles("zzz unrelated", 3), 64)
    assert a == a2
    sim_ab = sum(x == y for x, y in zip(a, b)) / 64
    sim_ac = sum(x == y for x, y in zip(a, c)) / 64
    assert sim_ab > 0.5 > sim_ac


def test_simhash_hamming_tracks_similarity():
    h1 = sketches.simhash64(sketches.word_shingles("the quick brown fox jumps", 2))
    h2 = sketches.simhash64(sketches.word_shingles("the quick brown fox jumped", 2))
    h3 = sketches.simhash64(sketches.word_shingles("entirely different words here", 2))
    d12 = bin(h1 ^ h2).count("1")
    d13 = bin(h1 ^ h3).count("1")
    assert d12 < d13


def test_lsh_pairs_find_near_dups(spark):
    rows = [
        (1, "binary relation extraction pipeline for german"),
        (2, "binary relation extraction pipeline for germany"),
        (3, "totally unrelated content with other words"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    sig = sketches.with_minhash(df, "text", n_hashes=32, shingle_k=3)
    got = {
        (r.id_a, r.id_b)
        for r in sketches.lsh_candidate_pairs(sig, "id", bands=8).collect()
    }
    assert (1, 2) in got and (1, 3) not in got


def test_connected_components_chain_and_singleton(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("p", "q")], ["src", "dst"]
    )
    comps = dict(
        (r.node, r.component)
        for r in canonicalize.connected_components(e).collect()
    )
    assert comps["a"] == comps["b"] == comps["c"] == comps["d"] == "a"
    assert comps["p"] == comps["q"] == "p"


def test_star_equals_minlabel_on_random_graphs(spark):
    """Large/small-star ≡ min-label propagation on seeded random graphs,
    including a long chain (the case star handles in O(log n) rounds)."""
    import random

    rng = random.Random(99)
    cases = []
    # random sparse graph
    nodes = [f"n{i:03d}" for i in range(60)]
    cases.append([(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)])
    # long chain (diameter 40)
    cases.append([(f"c{i:03d}", f"c{i + 1:03d}") for i in range(40)])
    # two cliques bridged
    cases.append(
        [("x1", f"x{i}") for i in range(2, 6)]
        + [("y1", f"y{i}") for i in range(2, 6)]
        + [("x3", "y3")]
    )
    for pairs in cases:
        pairs = [(a, b) for a, b in pairs if a != b] or [("a", "b")]
        e = spark.createDataFrame(pairs, ["src", "dst"])
        star = dict(
            (r.node, r.component)
            for r in canonicalize.connected_components(e, algorithm="star").collect()
        )
        ml = dict(
            (r.node, r.component)
            for r in canonicalize.connected_components(
                e, algorithm="minlabel", max_iter=100
            ).collect()
        )
        assert star == ml


@pytest.fixture(scope="module")
def graph(spark, tiny_paths):
    run = pipeline.run_pipeline(spark, tiny_paths, mode="staged")
    g = pipeline.materialize_graph(run)
    return run, g


def test_entities_cluster_aliases_by_url(graph):
    _run, g = graph
    ents = g["entities"].toPandas()
    # Ada Lovelace + alias Lovelace must be ONE entity if both occurred
    ada = ents[ents["surfaces"].map(lambda s: "Ada Lovelace" in list(s))]
    if not ada.empty:
        assert len(ada) == 1
        surfaces = set(ada.iloc[0]["surfaces"])
        # alias rows (if seen in corpus) folded into the same cluster
        assert ada.iloc[0]["canonical_id"] == "Ada_Lovelace"


def test_edges_fully_resolved(graph):
    _run, g = graph
    edges = g["edges"]
    n = edges.count()
    assert n > 0
    assert edges.where(F.col("subj_id").isNull() | F.col("obj_id").isNull()).count() == 0


def test_edge_count_matches_triples(graph):
    run, g = graph
    assert g["edges"].count() == run["triples"].count()


def test_predicate_canonicalization_clusters_near_dups(spark):
    rows = [
        ("a", "hand_off.to", "b"), ("a", "hand_off.too", "b"),
        ("a", "audit", "b"), ("a", "visit", "b"),
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    m = {
        r["pred"]: r["pred_canonical"]
        for r in canonicalize.canonicalize_predicates(
            t, jaccard_threshold=0.6
        ).collect()
    }
    assert m["hand_off.to"] == m["hand_off.too"]  # near-dups cluster
    assert m["audit"] == "audit" and m["visit"] == "visit"  # singletons
    assert m["audit"] != m["visit"]


def test_graph_edges_have_pred_ids(graph):
    _run, g = graph
    assert g["edges"].where(F.col("pred_id").isNull()).count() == 0
    assert g["predicates"].count() > 0


# --- structural alignment candidates ---------------------------------------

ALIGN_FACTS = [
    # bot_a and bot_b occupy the same neighborhood (2 shared out-features,
    # 1 shared in-feature); hub 'log' is a neighbor of everything
    ("bot_a", "writes", "log"), ("bot_b", "writes", "log"),
    ("bot_a", "calls", "api"), ("bot_b", "calls", "api"),
    ("user", "runs", "bot_a"), ("user", "runs", "bot_b"),
    ("bot_a", "calls", "db"),  # asymmetric extra feature
    ("other", "writes", "log"),
    ("log", "rotates", "log"),  # self-loop
]


def _brute_align(facts, min_shared=1, max_df=None):
    from collections import defaultdict
    from itertools import combinations

    feats = defaultdict(set)
    for s, p, o in facts:
        feats[s].add(("out", p, o))
        feats[o].add(("in", p, s))
    df = defaultdict(int)
    for fs in feats.values():
        for f in fs:
            df[f] += 1
    out = {}
    for a, b in combinations(sorted(feats), 2):
        shared = feats[a] & feats[b]
        if max_df is not None:
            shared = {f for f in shared if df[f] <= max_df}
        if len(shared) >= min_shared:
            n_a, n_b = len(feats[a]), len(feats[b])
            j = round(len(shared) / (n_a + n_b - len(shared)), 6)
            out[(a, b)] = (len(shared), n_a, n_b, j)
    return out


def test_structural_align_matches_enumeration(spark):
    df = spark.createDataFrame(ALIGN_FACTS, "s string, p string, o string")
    got = {
        (r["a"], r["b"]): (r["n_shared"], r["n_a"], r["n_b"], r["jaccard"])
        for r in canonicalize.structural_align_candidates(
            df, min_shared=1
        ).collect()
    }
    assert got == _brute_align(ALIGN_FACTS, min_shared=1)
    assert got[("bot_a", "bot_b")][0] == 3  # 2 out + 1 in shared features


def test_structural_align_min_shared_filters(spark):
    df = spark.createDataFrame(ALIGN_FACTS, "s string, p string, o string")
    got = {
        (r["a"], r["b"])
        for r in canonicalize.structural_align_candidates(
            df, min_shared=2
        ).collect()
    }
    assert got == set(_brute_align(ALIGN_FACTS, min_shared=2))
    assert ("bot_a", "bot_b") in got


def test_structural_align_max_df_drops_hub_features_recall_only(spark):
    # the (out, writes, log) feature has df=3 — capping at 2 removes it
    # from PAIRING (recall-only) while degrees keep full counts
    df = spark.createDataFrame(ALIGN_FACTS, "s string, p string, o string")
    got = {
        (r["a"], r["b"]): (r["n_shared"], r["n_a"], r["n_b"], r["jaccard"])
        for r in canonicalize.structural_align_candidates(
            df, min_shared=1, max_df=2
        ).collect()
    }
    assert got == _brute_align(ALIGN_FACTS, min_shared=1, max_df=2)
    # hub-only pairs disappear entirely under the cap
    assert ("bot_a", "other") not in got


def test_structural_align_partition_invariant(spark):
    from relationextractionpipeline_spark.operators import cache

    df = spark.createDataFrame(ALIGN_FACTS, "s string, p string, o string")
    a = sorted(
        map(tuple, canonicalize.structural_align_candidates(df).collect())
    )
    b = sorted(
        map(
            tuple,
            canonicalize.structural_align_candidates(
                df.repartition(7, "p")
            ).collect(),
        )
    )
    cache.release_all()
    assert a == b
