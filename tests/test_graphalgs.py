"""PageRank: known-graph values vs an inline numpy replica, dangling
mass, determinism across partitionings."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from relationextractionpipeline_spark.operators import cache, graphalgs

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
    # d has no out-edges (dangling); self-loop + dup must be ignored
    ("a", "a"), ("a", "b"),
]


def _numpy_pr(edges, damping=0.85, n_iter=15):
    ed = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in ed} | {d for _, d in ed})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    src = np.array([idx[s] for s, _ in ed])
    dst = np.array([idx[d] for _, d in ed])
    out = np.bincount(src, minlength=n).astype(float)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dang = float(r[out == 0].sum())
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / out[src])
        r = (1 - damping) / n + damping * dang / n + damping * contrib
    return dict(zip(nodes, np.round(r, 6)))


def test_pagerank_matches_numpy_replica(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank"] for r in graphalgs.pagerank(df).collect()}
    cache.release_all(checkpoints=True)
    want = _numpy_pr(EDGES)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])
    # ranks form a distribution
    assert abs(sum(got.values()) - 1.0) < 1e-5
    # c receives from a and b -> highest-ranked
    assert max(got, key=got.get) == "c"


def test_pagerank_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {r["node"]: r["rank"]
         for r in graphalgs.pagerank(df.repartition(7), n_iter=5).collect()}
    b = {r["node"]: r["rank"]
         for r in graphalgs.pagerank(df.coalesce(1), n_iter=5).collect()}
    cache.release_all(checkpoints=True)
    assert a == b


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert graphalgs.pagerank(df).count() == 0
    cache.release_all(checkpoints=True)


BFS_EDGES = [
    # chain a-b-c-d, shortcut a-c, disconnected island x-y, self-loop b-b
    ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("x", "y"), ("b", "b"),
]


def test_bfs_distances_levels(spark):
    df = spark.createDataFrame(BFS_EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in graphalgs.bfs_distances(df, seeds).collect()}
    cache.release_all(checkpoints=True)
    # shortcut a-c beats the 2-hop chain; island x/y unreachable
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_multi_seed_and_direction_blind(spark):
    df = spark.createDataFrame(BFS_EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("d",), ("y",)], "node string")
    got = {r["node"]: r["dist"]
           for r in graphalgs.bfs_distances(df, seeds).collect()}
    cache.release_all(checkpoints=True)
    # edges are walked undirected: d reaches back up the chain
    assert got == {"d": 0, "y": 0, "c": 1, "x": 1, "a": 2, "b": 2}


def test_bfs_partition_invariant(spark):
    df = spark.createDataFrame(BFS_EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    a = sorted(map(tuple, graphalgs.bfs_distances(df.repartition(5), seeds).collect()))
    b = sorted(map(tuple, graphalgs.bfs_distances(df.coalesce(1), seeds).collect()))
    cache.release_all(checkpoints=True)
    assert a == b


def test_label_propagation_two_cliques(spark):
    # two triangles bridged by one edge: LPA settles into two communities
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a3", "b1"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["community"]
           for r in graphalgs.label_propagation(df, n_iter=5).collect()}
    cache.release_all(checkpoints=True)
    assert set(got) == {"a1", "a2", "a3", "b1", "b2", "b3"}
    # each clique is internally uniform
    assert got["a1"] == got["a2"] == got["a3"]
    assert got["b1"] == got["b2"] == got["b3"]


def test_label_propagation_matches_sequential_replica(spark):
    import itertools

    edges = [("n%d" % i, "n%d" % j)
             for i, j in itertools.combinations(range(6), 2) if (i + j) % 3]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["community"]
           for r in graphalgs.label_propagation(df, n_iter=4).collect()}
    cache.release_all(checkpoints=True)
    # inline sequential replica (same recurrence as oracle_mat.lpa_table)
    neigh = {}
    for s, d in edges:
        neigh.setdefault(s, set()).add(d)
        neigh.setdefault(d, set()).add(s)
    labels = {n: n for n in neigh}
    for _ in range(4):
        new = {}
        for n, nbs in neigh.items():
            cnt = {}
            for nb in nbs:
                cnt[labels[nb]] = cnt.get(labels[nb], 0) + 1
            m = max(cnt.values())
            new[n] = min(l for l, c in cnt.items() if c == m)
        labels = new
    assert got == labels


def test_label_propagation_partition_invariant(spark):
    df = spark.createDataFrame(BFS_EDGES, "src string, dst string")
    a = sorted(map(tuple, graphalgs.label_propagation(df.repartition(5), n_iter=3).collect()))
    b = sorted(map(tuple, graphalgs.label_propagation(df.coalesce(1), n_iter=3).collect()))
    cache.release_all(checkpoints=True)
    assert a == b


def test_k_core_peels_cascading_tendrils(spark):
    # square core a-b-c-d-a, chain tail d-e-f-g (cascades away), isolated
    # pair x-y; k=2 keeps exactly the square with in-core degree 2
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
        ("d", "e"), ("e", "f"), ("f", "g"),
        ("x", "y"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["core_degree"]
           for r in graphalgs.k_core(df, k=2).collect()}
    cache.release_all(checkpoints=True)
    assert got == {"a": 2, "b": 2, "c": 2, "d": 2}


def test_k_core_matches_sequential_peel(spark):
    import itertools

    edges = [("n%d" % i, "n%d" % j)
             for i, j in itertools.combinations(range(8), 2)
             if (i * 7 + j * 3) % 4 == 0]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["core_degree"]
           for r in graphalgs.k_core(df, k=3).collect()}
    cache.release_all(checkpoints=True)
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < 3}
        if not drop:
            break
        alive -= drop
    want = {n: len(adj[n] & alive) for n in alive}
    assert got == want


def test_personalized_pagerank_concentrates_on_seed(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["rank"]
           for r in graphalgs.pagerank(df, seeds=seeds, n_iter=10).collect()}
    cache.release_all(checkpoints=True)
    # distribution over the same node set; the seed holds the most mass
    assert abs(sum(got.values()) - 1.0) < 1e-5
    assert max(got, key=got.get) == "a"
    # unreachable-from-seed nodes exist only via teleport -> rank ~ 0
    # (d receives only flow: c->d; still > 0 through the chain)
    assert got["d"] > 0


# ------------------------------------------------- weighted PageRank


WEDGES = [
    # (src, dst, weight); duplicate (a,b) rows must sum (1+2=3)
    ("a", "b", 1.0), ("a", "b", 2.0), ("a", "c", 1.0),
    ("b", "c", 4.0), ("c", "a", 1.0), ("c", "d", 1.0),
    ("a", "a", 9.0),  # self-loop ignored regardless of weight
]


def _numpy_pr_weighted(rows, damping=0.85, n_iter=15):
    cnt = {}
    for s, d, w in rows:
        if s != d:
            cnt[(s, d)] = cnt.get((s, d), 0.0) + w
    ed = sorted(cnt)
    nodes = sorted({s for s, _ in ed} | {d for _, d in ed})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    src = np.array([idx[s] for s, _ in ed])
    dst = np.array([idx[d] for _, d in ed])
    w = np.array([cnt[e] for e in ed])
    outw = np.zeros(n)
    np.add.at(outw, src, w)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dang = float(r[outw == 0].sum())
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] * w / outw[src])
        r = (1 - damping) / n + damping * dang / n + damping * contrib
    return dict(zip(nodes, np.round(r, 6)))


def test_pagerank_weighted_matches_numpy_replica(spark):
    df = spark.createDataFrame(
        WEDGES, "src string, dst string, weight double"
    )
    got = {
        r["node"]: r["rank"]
        for r in graphalgs.pagerank_weighted(df).collect()
    }
    cache.release_all(checkpoints=True)
    want = _numpy_pr_weighted(WEDGES)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_pagerank_weighted_uniform_weights_equal_unweighted(spark):
    # weight 1.0 on the DISTINCT edge set must reproduce classic pagerank
    distinct = sorted({(s, d) for s, d in EDGES if s != d})
    wdf = spark.createDataFrame(
        [(s, d, 1.0) for s, d in distinct],
        "src string, dst string, weight double",
    )
    udf_ = spark.createDataFrame(EDGES, "src string, dst string")
    got_w = {
        r["node"]: r["rank"]
        for r in graphalgs.pagerank_weighted(wdf).collect()
    }
    got_u = {
        r["node"]: r["rank"] for r in graphalgs.pagerank(udf_).collect()
    }
    cache.release_all(checkpoints=True)
    assert set(got_w) == set(got_u)
    for n in got_u:
        assert abs(got_w[n] - got_u[n]) < 2e-6, (n, got_w[n], got_u[n])


def test_pagerank_weighted_weight_pulls_rank(spark):
    # b -> c carries 9x the weight of b -> d: c must outrank d
    rows = [("a", "b", 1.0), ("b", "c", 9.0), ("b", "d", 1.0)]
    df = spark.createDataFrame(rows, "src string, dst string, weight double")
    got = {
        r["node"]: r["rank"]
        for r in graphalgs.pagerank_weighted(df).collect()
    }
    cache.release_all(checkpoints=True)
    assert got["c"] > got["d"]


def test_pagerank_weighted_partition_invariant(spark):
    df = spark.createDataFrame(
        WEDGES, "src string, dst string, weight double"
    )
    a = sorted(map(tuple, graphalgs.pagerank_weighted(df.repartition(1)).collect()))
    cache.release_all(checkpoints=True)
    b = sorted(map(tuple, graphalgs.pagerank_weighted(df.repartition(5)).collect()))
    cache.release_all(checkpoints=True)
    assert a == b


# --------------------------------------------------------------- HITS


def _numpy_hits(edges, n_iter=15):
    ed = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in ed} | {d for _, d in ed})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    src = np.array([idx[s] for s, _ in ed])
    dst = np.array([idx[d] for _, d in ed])
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(n_iter):
        a_raw = np.zeros(n)
        np.add.at(a_raw, dst, h[src])
        sa = float(a_raw.sum())
        a = a_raw / (sa if sa > 0 else 1.0)
        h_raw = np.zeros(n)
        np.add.at(h_raw, src, a[dst])
        sh = float(h_raw.sum())
        h = h_raw / (sh if sh > 0 else 1.0)
    return {
        nd: (round(float(h[i]), 6), round(float(a[i]), 6))
        for nd, i in idx.items()
    }


def test_hits_matches_numpy_replica(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in graphalgs.hits(df).collect()
    }
    cache.release_all(checkpoints=True)
    want = _numpy_hits(EDGES)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n][0] - want[n][0]) < 1e-9, (n, got[n], want[n])
        assert abs(got[n][1] - want[n][1]) < 1e-9, (n, got[n], want[n])


def test_hits_star_graph_roles(spark):
    # hub h points at three authorities; pure sinks have hub 0, the pure
    # source has authority 0
    rows = [("h", "x"), ("h", "y"), ("h", "z")]
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in graphalgs.hits(df).collect()
    }
    cache.release_all(checkpoints=True)
    assert got["h"][0] == 1.0 and got["h"][1] == 0.0
    for n in ("x", "y", "z"):
        assert got[n][0] == 0.0
        assert abs(got[n][1] - round(1 / 3, 6)) < 2e-6
    # L1 normalization: each score vector sums to 1
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-5
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-5


def test_hits_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = sorted(map(tuple, graphalgs.hits(df.repartition(1)).collect()))
    cache.release_all(checkpoints=True)
    b = sorted(map(tuple, graphalgs.hits(df.repartition(5)).collect()))
    cache.release_all(checkpoints=True)
    assert a == b


# --- metapath census --------------------------------------------------------

FACTS = [
    # hub 'h' with mixed predicate fan-in/out, a self-loop, parallel preds
    ("a", "p1", "h"), ("b", "p1", "h"), ("c", "p2", "h"),
    ("h", "p1", "x"), ("h", "p3", "y"), ("h", "p3", "z"),
    ("x", "p2", "y"), ("y", "p2", "y"),  # self-loop at y
    ("a", "p3", "b"), ("b", "p2", "c"),
]


def _brute_metapaths(facts):
    """Quadratic path enumeration — the semantics the census must match."""
    from collections import defaultdict

    paths = defaultdict(int)
    mids = defaultdict(set)
    for s1, p1, o1 in facts:
        for s2, p2, o2 in facts:
            if o1 == s2:
                paths[(p1, p2)] += 1
                mids[(p1, p2)].add(o1)
    return {k: (v, len(mids[k])) for k, v in paths.items()}


def test_metapath_census_matches_enumeration(spark):
    df = spark.createDataFrame(FACTS, "s string, pred string, o string")
    got = {
        (r["pred1"], r["pred2"]): (r["n_paths"], r["n_mids"])
        for r in graphalgs.metapath_census(df).collect()
    }
    assert got == _brute_metapaths(FACTS)


def test_metapath_census_counts_self_loop_both_hops(spark):
    # one self-loop fact is a valid 2-hop path reusing itself (census
    # convention, documented): paths(p,p) = 1 via mid=y
    df = spark.createDataFrame(
        [("y", "p", "y")], "s string, pred string, o string"
    )
    [row] = graphalgs.metapath_census(df).collect()
    assert (row["pred1"], row["pred2"], row["n_paths"], row["n_mids"]) == (
        "p", "p", 1, 1
    )


def test_metapath_census_partition_invariant(spark):
    df = spark.createDataFrame(FACTS, "s string, pred string, o string")
    a = sorted(map(tuple, graphalgs.metapath_census(df).collect()))
    b = sorted(
        map(tuple, graphalgs.metapath_census(df.repartition(7, "pred")).collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# local clustering coefficient


UND_EDGES = [
    # K4 clique a-b-c-d, pendant e off a, isolated pair f-g
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
    ("a", "e"), ("f", "g"),
]


def _und_df(spark, edges):
    ed = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    both = ed + [(b, a) for a, b in ed]
    return spark.createDataFrame(both, "a string, b string")


def _py_clustering(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for n, nbrs in adj.items():
        d = len(nbrs)
        t = sum(
            1
            for i, u in enumerate(sorted(nbrs))
            for v in sorted(nbrs)[i + 1:]
            if v in adj[u]
        )
        cc = (2.0 * t) / (d * (d - 1)) if d >= 2 else 0.0
        out[n] = (d, t, cc)
    return out


def test_local_clustering_matches_bruteforce(spark):
    got = {
        r["canonical_id"]: (r["degree"], r["n_triangles"], r["clustering_coeff"])
        for r in graphalgs.local_clustering(_und_df(spark, UND_EDGES)).collect()
    }
    assert got == _py_clustering(UND_EDGES)
    # spot-check the shapes: clique interior is 1.0, pendant/star endpoints 0
    assert got["b"][2] == 1.0 and got["c"][2] == 1.0 and got["d"][2] == 1.0
    assert got["e"] == (1, 0, 0.0) and got["f"] == (1, 0, 0.0)
    # a: degree 4 (clique + pendant), 3 triangles -> 6/12
    assert got["a"] == (4, 3, 0.5)


def test_local_clustering_partition_invariant(spark):
    und = _und_df(spark, UND_EDGES)
    a = sorted(map(tuple, graphalgs.local_clustering(und.repartition(7)).collect()))
    b = sorted(map(tuple, graphalgs.local_clustering(und.coalesce(1)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# deterministic random walks


def _h32(payload: str) -> int:
    import hashlib

    return int(hashlib.md5(payload.encode()).hexdigest()[:8], 16)


def _py_walks(edges, length=3, salt="walk"):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for seed in adj:
        cur = seed
        rows.append((seed, 0, seed))
        for t in range(1, length + 1):
            nbrs = sorted(adj[cur])
            cur = nbrs[_h32(f"{seed}|{cur}|{t}:{salt}") % len(nbrs)]
            rows.append((seed, t, cur))
    return sorted(rows)


def test_random_walks_match_sequential_replica(spark):
    und = _und_df(spark, UND_EDGES)
    got = sorted(
        (r["seed"], r["step"], r["node"])
        for r in graphalgs.random_walks(und, length=3).collect()
    )
    cache.release_all(checkpoints=True)
    assert got == _py_walks(UND_EDGES, length=3)
    # every step follows a real edge
    adj = {(a, b) for a, b in UND_EDGES} | {(b, a) for a, b in UND_EDGES}
    byw = {}
    for seed, step, node in got:
        byw.setdefault(seed, {})[step] = node
    for seed, path in byw.items():
        assert sorted(path) == [0, 1, 2, 3]
        for t in range(1, 4):
            assert (path[t - 1], path[t]) in adj


def test_random_walks_partition_invariant(spark):
    und = _und_df(spark, UND_EDGES)
    a = sorted(map(tuple, graphalgs.random_walks(und.repartition(5), 2).collect()))
    cache.release_all(checkpoints=True)
    b = sorted(map(tuple, graphalgs.random_walks(und.coalesce(1), 2).collect()))
    cache.release_all(checkpoints=True)
    assert a == b


# ---------------------------------------------------------------------------
# GraphSAGE-style neighborhood sampling


def _py_neighbor_sample(edges, seeds, fanouts=(3, 2), salt="nbr"):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sampled = []
    for h, f in enumerate(fanouts, start=1):
        s = {
            n: sorted(nbrs, key=lambda d: (_h32(f"{n}|{d}:{salt}|{h}"), d))[:f]
            for n, nbrs in adj.items()
        }
        sampled.append(s)
    rows = set()
    frontier = {(s, s) for s in seeds}
    for h, s in enumerate(sampled, start=1):
        nxt = set()
        for seed, node in frontier:
            for d in s.get(node, []):
                rows.add((seed, h, node, d))
                nxt.add((seed, d))
        frontier = nxt
    return sorted(rows)


def test_sample_neighborhood_matches_replica_and_bounds(spark):
    und = _und_df(spark, UND_EDGES)
    seeds_py = ["a", "f"]
    seeds = spark.createDataFrame([(s,) for s in seeds_py], "node string")
    got = sorted(
        (r["seed"], r["hop"], r["src"], r["dst"])
        for r in graphalgs.sample_neighborhood(und, seeds, fanouts=(3, 2)).collect()
    )
    cache.release_all(checkpoints=True)
    assert got == _py_neighbor_sample(UND_EDGES, seeds_py, fanouts=(3, 2))
    # fanout bound: per (seed, hop, src) at most fanouts[hop-1] edges
    from collections import Counter

    cnt = Counter((s, h, u) for s, h, u, _ in got)
    for (s, h, u), c in cnt.items():
        assert c <= (3, 2)[h - 1]
    # a's hop-1 keeps 3 of its 4 real neighbors; f (degree 1) keeps 1
    assert cnt[("a", 1, "a")] == 3 and cnt[("f", 1, "f")] == 1


def test_sample_neighborhood_partition_invariant(spark):
    und = _und_df(spark, UND_EDGES)
    seeds = spark.createDataFrame([("a",), ("b",)], "node string")
    a = sorted(map(tuple, graphalgs.sample_neighborhood(
        und.repartition(5), seeds, (2, 1)).collect()))
    cache.release_all(checkpoints=True)
    b = sorted(map(tuple, graphalgs.sample_neighborhood(
        und.coalesce(1), seeds, (2, 1)).collect()))
    cache.release_all(checkpoints=True)
    assert a == b


# --------------------------------------------------------------------------
# propagate_labels
# --------------------------------------------------------------------------


def _collect_labels(spark, edges, seeds, rounds=2):
    und = _und_df(spark, edges)
    sd = spark.createDataFrame(seeds, "node string, label string")
    got = {
        r["node"]: (r["label"], r["round"])
        for r in graphalgs.propagate_labels(und, sd, rounds=rounds).collect()
    }
    cache.release_all(checkpoints=True)
    return got


def test_propagate_labels_chain_multi_round(spark):
    # s -- x -- y: x adopts in round 1, y in round 2
    got = _collect_labels(spark, [("s", "x"), ("x", "y")], [("s", "/person")])
    assert got == {
        "s": ("/person", 0),
        "x": ("/person", 1),
        "y": ("/person", 2),
    }


def test_propagate_labels_majority_and_tie_break(spark):
    # m has two /org neighbors and one /person neighbor -> majority /org;
    # t has one /b and one /a neighbor (tied count) -> label ASC picks /a
    edges = [
        ("o1", "m"), ("o2", "m"), ("p1", "m"),
        ("b1", "t"), ("a1", "t"),
    ]
    seeds = [
        ("o1", "/org"), ("o2", "/org"), ("p1", "/person"),
        ("b1", "/b"), ("a1", "/a"),
    ]
    got = _collect_labels(spark, edges, seeds, rounds=1)
    assert got["m"] == ("/org", 1)
    assert got["t"] == ("/a", 1)


def test_propagate_labels_seeds_clamped_and_frozen(spark):
    # seed s keeps /person even though both neighbors are /org seeds; a
    # node labeled in round 1 is frozen in round 2 (round-2 votes cannot
    # flip x even though its round-1 label came from a single neighbor)
    edges = [("o1", "s"), ("o2", "s"), ("s", "x"), ("x", "o3"), ("x", "o4")]
    seeds = [("o1", "/org"), ("o2", "/org"), ("s", "/person")]
    got = _collect_labels(
        spark, edges + [("o3", "z"), ("o4", "z")],
        seeds + [("o3", "/org"), ("o4", "/org")],
    )
    assert got["s"] == ("/person", 0)
    # x: round-1 voters are s(/person), o3(/org), o4(/org) -> majority /org
    assert got["x"] == ("/org", 1)


def test_propagate_labels_unreached_nodes_absent(spark):
    # y-z component has no seed: absent from the output
    got = _collect_labels(spark, [("s", "x"), ("y", "z")], [("s", "/person")])
    assert set(got) == {"s", "x"}


def test_propagate_labels_partition_invariant(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("b", "e"),
        ("e", "f"), ("a", "f"), ("c", "f"),
    ]
    seeds = [("a", "/person"), ("d", "/org")]
    und = _und_df(spark, edges)
    sd = spark.createDataFrame(seeds, "node string, label string")
    base = sorted(
        map(tuple, graphalgs.propagate_labels(und, sd).collect())
    )
    cache.release_all(checkpoints=True)
    rep = sorted(
        map(
            tuple,
            graphalgs.propagate_labels(
                und.repartition(7), sd.repartition(3)
            ).collect(),
        )
    )
    cache.release_all(checkpoints=True)
    assert base == rep and base


# --------------------------------------------------------------------------
# adamic_adar_candidates
# --------------------------------------------------------------------------


def _py_adamic_adar(edges, min_common=2, max_degree=None):
    import math

    ed = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in ed:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    for v, ns in adj.items():
        if max_degree is not None and deg[v] > max_degree:
            continue
        ns = sorted(ns)
        for i, a in enumerate(ns):
            for b in ns[i + 1:]:
                if (a, b) in ed:
                    continue
                cn, aa = out.get((a, b), (0, 0.0))
                out[(a, b)] = (cn + 1, aa + 1.0 / math.log(deg[v]))
    return {
        k: (cn, round(aa, 6))
        for k, (cn, aa) in out.items()
        if cn >= min_common
    }


AA_EDGES = [
    # u and w share v1, v2 (open); x-y adjacent AND sharing v1
    ("u", "v1"), ("u", "v2"), ("w", "v1"), ("w", "v2"),
    ("x", "v1"), ("y", "v1"), ("x", "y"),
    ("u", "z"),  # z: degree-1 tendril, never a shared mid
]


def test_adamic_adar_matches_bruteforce(spark):
    und = _und_df(spark, AA_EDGES)
    got = {
        (r["a"], r["b"]): (r["n_common"], r["aa_score"])
        for r in graphalgs.adamic_adar_candidates(und).collect()
    }
    want = _py_adamic_adar(AA_EDGES)
    assert got == want and ("u", "w") in got
    # adjacent pair (x, y) excluded even though they share v1
    assert ("x", "y") not in got


def test_adamic_adar_cap_drops_wedges_not_denominators(spark):
    # v1 has degree 4 -> capped out of the WEDGE join at max_degree=3,
    # but v2 (uncapped) keeps its full-degree ln in the weight
    und = _und_df(spark, AA_EDGES)
    got = {
        (r["a"], r["b"]): (r["n_common"], r["aa_score"])
        for r in graphalgs.adamic_adar_candidates(
            und, min_common=1, max_degree=3
        ).collect()
    }
    want = _py_adamic_adar(AA_EDGES, min_common=1, max_degree=3)
    assert got == want
    # (u, w) now witnessed only by v2
    assert got[("u", "w")][0] == 1


def test_adamic_adar_partition_invariant(spark):
    und = _und_df(spark, AA_EDGES)
    base = sorted(map(tuple, graphalgs.adamic_adar_candidates(und).collect()))
    rep = sorted(
        map(
            tuple,
            graphalgs.adamic_adar_candidates(und.repartition(7)).collect(),
        )
    )
    assert base == rep and base


def _py_truss(edges, k=3):
    alive = {(min(a, b), max(a, b)) for a, b in edges if a != b}

    def supports(es):
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {(a, b): len(adj[a] & adj[b]) for a, b in es}

    while alive:
        sup = supports(alive)
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            break
        alive -= drop
    sup = supports(alive)
    return {(a, b): sup[(a, b)] for a, b in alive}


# 4-clique abcd; triangle (a, e, f) hanging off it by the single shared
# node a; pendant edge a-p; isolated edge x-y.  The 3-truss keeps the
# clique AND the triangle but drops the pendant/isolated edges; the
# 4-truss keeps only the clique (peeling the triangle cascades nothing
# back into the clique).
TRUSS_EDGES = [
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
    ("a", "e"), ("a", "f"), ("e", "f"),
    ("a", "p"), ("x", "y"),
]


def test_k_truss_matches_peel_replica(spark):
    und = _und_df(spark, TRUSS_EDGES)
    got = {
        (r["a"], r["b"]): r["support"]
        for r in graphalgs.k_truss(und, k=3).collect()
    }
    cache.release_all(checkpoints=True)
    want = _py_truss(TRUSS_EDGES, k=3)
    assert got == want
    assert ("a", "p") not in got and ("x", "y") not in got
    assert ("e", "f") in got  # the side triangle survives k=3


def test_k_truss_nesting_and_k4(spark):
    und = _und_df(spark, TRUSS_EDGES)
    t3 = {
        (r["a"], r["b"]): r["support"]
        for r in graphalgs.k_truss(und, k=3).collect()
    }
    t4 = {
        (r["a"], r["b"]): r["support"]
        for r in graphalgs.k_truss(und, k=4).collect()
    }
    cache.release_all(checkpoints=True)
    assert t4 == _py_truss(TRUSS_EDGES, k=4)
    # k=4 keeps exactly the 4-clique (every edge in 2 in-truss triangles)
    assert set(t4) == {("a", "b"), ("a", "c"), ("a", "d"),
                       ("b", "c"), ("b", "d"), ("c", "d")}
    assert all(s == 2 for s in t4.values())
    # trusses nest: the 4-truss edge set is a subset of the 3-truss's
    assert set(t4) <= set(t3)


def test_k_truss_cascade(spark):
    # path of triangles: removing the weakest end edge cascades — only
    # a true peel (not one-shot support filtering) gets the fixpoint
    edges = [("a", "b"), ("b", "c"), ("a", "c"),
             ("c", "d"), ("a", "d")]
    und = _und_df(spark, edges)
    got = {
        (r["a"], r["b"]): r["support"]
        for r in graphalgs.k_truss(und, k=4).collect()
    }
    cache.release_all(checkpoints=True)
    assert got == _py_truss(edges, k=4) == {}


def test_k_truss_k2_keeps_triangle_free_edges(spark):
    und = _und_df(spark, [("x", "y"), ("y", "z")])
    got = {
        (r["a"], r["b"]): r["support"]
        for r in graphalgs.k_truss(und, k=2).collect()
    }
    cache.release_all(checkpoints=True)
    assert got == {("x", "y"): 0, ("y", "z"): 0}


def test_k_truss_partition_invariant(spark):
    und = _und_df(spark, TRUSS_EDGES)
    base = sorted(map(tuple, graphalgs.k_truss(und, k=3).collect()))
    rep = sorted(
        map(tuple, graphalgs.k_truss(und.repartition(7), k=3).collect())
    )
    cache.release_all(checkpoints=True)
    assert base == rep and base


def _py_hyperball(edges, max_r=3, b=4, salt="hb"):
    """Inline replica of graphalgs.hyperball (same cell math as
    freq._hll_cells, same exact-integer estimator)."""
    import hashlib
    import math

    ed = {(a, b_) for a, b_ in edges if a != b_}
    adj = {}
    for a, b_ in ed:
        adj.setdefault(a, set()).add(b_)
        adj.setdefault(b_, set()).add(a)
    nodes = sorted(adj)
    w_bits = 32 - b
    m = 1 << b
    scale_u = 1 << (w_bits + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)

    def cell(key):
        h = int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)
        w = h % (1 << w_bits)
        rho = (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length())
        return h >> w_bits, rho

    regs = {}
    for n in nodes:
        bkt, rho = cell(n)
        regs[n] = {bkt: rho}

    def estimate(rg):
        n_used = len(rg)
        v_zero = m - n_used
        s_scaled = sum(1 << (w_bits + 1 - r) for r in rg.values()) + (
            v_zero * scale_u
        )
        raw = alpha * float(m) * float(m) * float(scale_u) / float(s_scaled)
        if raw <= 2.5 * m and v_zero > 0:
            est = float(m) * math.log(float(m) / float(v_zero))
        else:
            est = raw
        return n_used, v_zero, s_scaled, int(math.floor(est))

    out = {}
    for n in nodes:
        out[(n, 0)] = estimate(regs[n])
    for r in range(1, max_r + 1):
        regs = {
            n: {
                bkt: max(
                    [regs[n].get(bkt, 0)]
                    + [regs[nb].get(bkt, 0) for nb in adj[n]]
                )
                for bkt in set(regs[n])
                | {b2 for nb in adj[n] for b2 in regs[nb]}
            }
            for n in nodes
        }
        for n in nodes:
            out[(n, r)] = estimate(regs[n])
    return out


# path graph a-b-c-d-e plus isolated edge x-y: balls grow hop by hop
HB_EDGES = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]


def test_hyperball_matches_replica(spark):
    und = _und_df(spark, HB_EDGES)
    got = {
        (r["node"], r["r"]): (
            r["n_used"], r["v_zero"], r["s_scaled"], r["est"]
        )
        for r in graphalgs.hyperball(und, max_r=3, b=4).collect()
    }
    cache.release_all(checkpoints=True)
    want = _py_hyperball(HB_EDGES, max_r=3, b=4)
    assert got == want
    # every (node, r) pair present: 7 nodes x 4 radii
    assert len(got) == 7 * 4


def test_hyperball_ball_growth_tracks_bfs(spark):
    # with only a handful of distinct elements per ball, the HLL
    # estimate is exact after linear counting -> est == true ball size
    und = _und_df(spark, HB_EDGES)
    got = {
        (r["node"], r["r"]): r["est"]
        for r in graphalgs.hyperball(und, max_r=3, b=4).collect()
    }
    cache.release_all(checkpoints=True)
    # c (path center) reaches: itself, then +-1, +-2 hops
    assert got[("c", 0)] in (1,)
    assert got[("c", 1)] in (2, 3)  # collisions may merge registers
    assert got[("c", 2)] <= 5 and got[("c", 2)] >= got[("c", 1)]
    # x-y component never exceeds 2
    assert got[("x", 3)] <= 2
    # monotone in r for every node
    for n in "abcdexy":
        for r in range(3):
            assert got[(n, r)] <= got[(n, r + 1)]


def test_hyperball_partition_invariant(spark):
    und = _und_df(spark, HB_EDGES)
    base = sorted(map(tuple, graphalgs.hyperball(und, max_r=2).collect()))
    rep = sorted(
        map(tuple, graphalgs.hyperball(und.repartition(7), max_r=2).collect())
    )
    cache.release_all(checkpoints=True)
    assert base == rep and base


# --- weighted SSSP ---------------------------------------------------------

# weighted graph: direct a-d edge costs 9, but the a-b-c-d chain costs
# 1+2+3=6; island x-y; self-loop and a duplicate heavier a-b must be ignored
SSSP_EDGES = [
    ("a", "b", 1), ("b", "c", 2), ("c", "d", 3), ("a", "d", 9),
    ("x", "y", 4), ("b", "b", 5), ("a", "b", 7),
]


def test_sssp_weighted_prefers_cheap_chain(spark):
    df = spark.createDataFrame(SSSP_EDGES, "src string, dst string, w int")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in graphalgs.sssp_weighted(df, seeds).collect()}
    cache.release_all(checkpoints=True)
    # d via the chain (6) beats the direct edge (9); x/y unreachable
    assert got == {"a": 0, "b": 1, "c": 3, "d": 6}


def test_sssp_weighted_equals_bfs_at_unit_weights(spark):
    df = spark.createDataFrame(BFS_EDGES, "src string, dst string")
    wdf = df.withColumn("w", F.lit(1))
    seeds = spark.createDataFrame([("a",)], "node string")
    sp = sorted(map(tuple, graphalgs.sssp_weighted(wdf, seeds).collect()))
    bf = sorted(map(tuple, graphalgs.bfs_distances(df, seeds).collect()))
    cache.release_all(checkpoints=True)
    assert sp == bf


def test_sssp_weighted_multi_seed_direction_blind(spark):
    df = spark.createDataFrame(SSSP_EDGES, "src string, dst string, w int")
    seeds = spark.createDataFrame([("d",), ("x",)], "node string")
    got = {r["node"]: r["dist"]
           for r in graphalgs.sssp_weighted(df, seeds).collect()}
    cache.release_all(checkpoints=True)
    # edges walked undirected from both seeds
    assert got == {"d": 0, "x": 0, "c": 3, "b": 5, "a": 6, "y": 4}


def test_sssp_weighted_max_iter_bounds_rounds(spark):
    # chain of 5 unit edges: max_iter=2 explores only 2 hops
    chain = [("n%d" % i, "n%d" % (i + 1), 1) for i in range(5)]
    df = spark.createDataFrame(chain, "src string, dst string, w int")
    seeds = spark.createDataFrame([("n0",)], "node string")
    got = {r["node"]: r["dist"]
           for r in graphalgs.sssp_weighted(df, seeds, max_iter=2).collect()}
    cache.release_all(checkpoints=True)
    assert got == {"n0": 0, "n1": 1, "n2": 2}


def test_sssp_weighted_relaxes_early_settled_nodes(spark):
    # b is reached at dist 10 in round 1 via the direct edge, then
    # IMPROVED to 3 via the 3-hop unit chain — the frontier loop must
    # keep relaxing nodes that already hold a tentative distance
    edges = [
        ("a", "b", 10),
        ("a", "m1", 1), ("m1", "m2", 1), ("m2", "b", 1),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in graphalgs.sssp_weighted(df, seeds).collect()}
    cache.release_all(checkpoints=True)
    assert got == {"a": 0, "m1": 1, "m2": 2, "b": 3}


def test_sssp_weighted_partition_invariant(spark):
    df = spark.createDataFrame(SSSP_EDGES, "src string, dst string, w int")
    seeds = spark.createDataFrame([("a",)], "node string")
    base = sorted(
        map(tuple, graphalgs.sssp_weighted(df.repartition(7), seeds).collect())
    )
    rep = sorted(
        map(tuple, graphalgs.sssp_weighted(df.coalesce(1), seeds).collect())
    )
    cache.release_all(checkpoints=True)
    assert base == rep and base


# --- closeness from HyperBall balls ---------------------------------------


def test_closeness_from_balls_matches_replica(spark):
    und = _und_df(spark, HB_EDGES)
    balls = graphalgs.hyperball(und, max_r=3, b=4)
    got = {
        r["node"]: (r["reached"], r["total_dist"], r["lin"])
        for r in graphalgs.closeness_from_balls(balls, max_r=3).collect()
    }
    cache.release_all(checkpoints=True)
    est = _py_hyperball(HB_EDGES, max_r=3, b=4)
    want = {}
    for n in "abcdexy":
        e = {r: est[(n, r)][3] for r in range(4)}
        total = sum(r * (e[r] - e[r - 1]) for r in range(1, 4))
        reached = e[3] - e[0]
        lin = round(reached * reached / total, 6) if total > 0 else 0.0
        want[n] = (reached, total, lin)
    assert got == want


def test_closeness_ranks_path_center_highest(spark):
    # on the a-b-c-d-e path the center c has the smallest truncated
    # distance sum => the highest Lin index within its component
    und = _und_df(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    balls = graphalgs.hyperball(und, max_r=3, b=4)
    got = {
        r["node"]: r["lin"]
        for r in graphalgs.closeness_from_balls(balls, max_r=3).collect()
    }
    cache.release_all(checkpoints=True)
    assert got["c"] == max(got.values())


# --- distance profile / effective diameter --------------------------------


def _py_profile(edges, max_r=3, q=0.9):
    est = _py_hyperball(edges, max_r=max_r, b=4)
    nodes = sorted({n for e in edges for n in e if e[0] != e[1]})
    nr = {r: sum(est[(n, r)][3] for n in nodes) for r in range(max_r + 1)}
    tot, n0 = nr[max_r], nr[0]
    target = 0.9 * float(tot)
    dist_sum = sum(r * (nr[r] - nr[r - 1]) for r in range(1, max_r + 1))
    avg = round(dist_sum / (tot - n0), 6) if tot - n0 > 0 else 0.0
    for r in range(max_r + 1):
        if nr[r] >= target:
            if r == 0:
                eff = 0.0
            else:
                eff = round((r - 1) + (target - nr[r - 1])
                            / (nr[r] - nr[r - 1]), 6)
            return (n0, tot, avg, eff)
    raise AssertionError("no crossing")


def test_distance_profile_matches_replica(spark):
    und = _und_df(spark, HB_EDGES)
    balls = graphalgs.hyperball(und, max_r=3, b=4)
    got = graphalgs.distance_profile(balls, max_r=3, q=0.9).collect()
    cache.release_all(checkpoints=True)
    assert len(got) == 1
    r = got[0]
    assert (r["n_nodes"], r["n_pairs"], r["avg_dist"], r["eff_diameter"]) \
        == _py_profile(HB_EDGES, max_r=3)


def test_distance_profile_clique_effective_diameter_below_one(spark):
    # complete graph on 4 nodes: everything reached at r=1, so the 0.9
    # quantile interpolates inside the (0, 1] step and avg_dist is 1.0
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    und = _und_df(spark, k4)
    balls = graphalgs.hyperball(und, max_r=3, b=4)
    r = graphalgs.distance_profile(balls, max_r=3, q=0.9).collect()[0]
    cache.release_all(checkpoints=True)
    assert r["avg_dist"] == 1.0
    assert 0.0 < r["eff_diameter"] <= 1.0


def test_distance_profile_zero_when_everything_at_r0(spark):
    # edgeless graph reaches nothing beyond r=0: guard branches fire
    balls = spark.createDataFrame(
        [("a", r, 1) for r in range(4)] + [("b", r, 1) for r in range(4)],
        "node string, r int, est long",
    )
    r = graphalgs.distance_profile(balls, max_r=3, q=0.9).collect()[0]
    assert (r["n_nodes"], r["n_pairs"], r["avg_dist"], r["eff_diameter"]) \
        == (2, 2, 0.0, 0.0)


# --- degree assortativity ---------------------------------------------------


def _py_assortativity(edges):
    ed = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    deg = {}
    for a, b in ed:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    pairs = [(deg[a], deg[b]) for a, b in ed] + [(deg[b], deg[a]) for a, b in ed]
    m = len(pairs)
    s_j = sum(da for da, _ in pairs)
    s_jj = sum(da * da for da, _ in pairs)
    s_jk = sum(da * db for da, db in pairs)
    den = m * s_jj - s_j * s_j
    r = round((m * s_jk - s_j * s_j) / den, 6) if den else 0.0
    return (m, s_j, s_jj, s_jk, r)


def test_assortativity_star_is_negative(spark):
    star = [("hub", "l%d" % i) for i in range(5)]
    und = _und_df(spark, star)
    got = tuple(graphalgs.assortativity(und).collect()[0])
    cache.release_all(checkpoints=True)
    assert got == _py_assortativity(star)
    assert got[4] == -1.0  # pure star: perfectly disassortative


def test_assortativity_matches_replica_on_mixed_graph(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
        ("hub", "a"), ("hub", "x"), ("hub", "y"), ("x", "y"),
    ]
    und = _und_df(spark, edges)
    got = tuple(graphalgs.assortativity(und).collect()[0])
    cache.release_all(checkpoints=True)
    assert got == _py_assortativity(edges)


def test_assortativity_regular_graph_denominator_guard(spark):
    # a cycle is 2-regular: zero degree variance -> guarded 0.0
    cyc = [("n%d" % i, "n%d" % ((i + 1) % 5)) for i in range(5)]
    und = _und_df(spark, cyc)
    got = tuple(graphalgs.assortativity(und).collect()[0])
    cache.release_all(checkpoints=True)
    assert got[4] == 0.0
