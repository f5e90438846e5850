"""Sequential oracle materializations for the driver's DuckDB gate.

The driver verifies each ``queries()`` entry against an ANSI-SQL oracle run
by DuckDB.  A dependency parse, a MinHash signature or a k-means quantizer is
not expressible in SQL — but their *outputs* are deterministic, so this
module computes them **sequentially on the driver** (plain pandas/numpy, no
Spark) and caches them as parquet.  The SQL oracle then reads the
materialization and re-derives the final answer relationally, while the Spark
query computes the same answer through the distributed path.  What the
comparison then actually verifies is exactly the distributed machinery —
partitioning, shuffles, joins, Arrow batching, window ranks — which is the
part that can drift (the per-row functions are shared code by design, the
same posture as the pytest oracle gate in tests/oracle.py).

Materializations (all seed-fixed, wall-clock-free, cached by path):

* ``oracle_triples(scale)``  — the full sequential KG extraction
  (turnproc.extract_turn_triples per turn, exactly the reference's
  one-process walk, ``main.py:166-170``) → triples parquet.
* ``mention_rows(scale)``    — sequential segment→parse→mention detection →
  exploded mention rows parquet (the link-scoring stage's input, so the SQL
  oracle can re-derive linking relationally).
* ``doc_sketches(sf_dir)``   — MinHash signatures + SimHash fingerprints of
  the driver's ``documents`` table (sketches.py shared functions).
* ``embed_aux(sf_dir)``      — hyperplane-LSH buckets and IVF cell
  assignments for the driver's ``embeddings`` table (similarity.py shared
  numpy functions).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
import pandas as pd

from relationextractionpipeline_spark.functions import lexicon as lx
from relationextractionpipeline_spark.functions import rules, turnproc
from relationextractionpipeline_spark.operators import sketches
from relationextractionpipeline_spark.sources import testgen

AUX_SUBDIR = "aux"

# bump when a materialization's schema or semantics change: the cache is
# deterministic for a given code version, but NOT across code versions
ORACLE_MAT_VERSION = 2
ORACLE_TRIPLES_FILE = f"oracle_triples_v{ORACLE_MAT_VERSION}.parquet"
MENTION_ROWS_FILE = f"mention_rows_v{ORACLE_MAT_VERSION}.parquet"


def _publish(pdf: pd.DataFrame, dst: str) -> str:
    """Atomic parquet publish (deterministic output ⇒ last writer identical)."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = f"{dst}.tmp{os.getpid()}"
    pdf.to_parquet(tmp, index=False)
    os.replace(tmp, dst)
    return dst


def aux_dir(sf_dir: str, data_dir: str = testgen.DEFAULT_DATA_DIR) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.abspath(os.path.join(data_dir, AUX_SUBDIR, base))


# ---------------------------------------------------------------------------
# KG pipeline oracles (synthetic transcripts)
# ---------------------------------------------------------------------------


def _load_kg_inputs(scale: str):
    paths = testgen.materialize(scale)
    transcripts = pd.read_parquet(paths["transcripts"])
    entity_kb = pd.read_parquet(paths["entity_kb"])
    figer_map = pd.read_parquet(paths["figer_map"])
    return paths, transcripts, entity_kb, figer_map


def oracle_triples(scale: str, data_dir: str = testgen.DEFAULT_DATA_DIR) -> str:
    """Sequential reference extraction → parquet; the DuckDB oracle for
    ``kg_triples``/``kg_types`` selects from this."""
    dst = os.path.abspath(
        os.path.join(data_dir, testgen.scale_dir(scale), ORACLE_TRIPLES_FILE)
    )
    if os.path.exists(dst):
        return dst
    _paths, transcripts, entity_kb, figer_map = _load_kg_inputs(scale)
    kb: Dict = {}
    for surface, url, prior in entity_kb[["surface", "url", "prior"]].itertuples(
        index=False
    ):
        cur = kb.get(surface)
        if cur is None or prior > cur[1]:
            kb[surface] = (url, float(prior))
    kb_index = {tuple(s.split(" ")): s for s in entity_kb["surface"]}
    figer = dict(zip(figer_map["url"], figer_map["figer_type"]))

    rows: List[dict] = []
    ordered = transcripts.sort_values(["conv_id", "turn_idx"])
    for conv_id, turn_idx, text in zip(
        ordered["conv_id"], ordered["turn_idx"], ordered["text"]
    ):
        for trip in turnproc.extract_turn_triples(text, kb, kb_index, figer):
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": int(turn_idx),
                    "sent_idx": int(trip["sent_idx"]),
                    "subj": trip["subj"],
                    "pred": trip["pred"],
                    "obj": trip["obj"],
                    "subj_type": trip["subj_type"],
                    "obj_type": trip["obj_type"],
                    "subj_kind": trip["subj_kind"],
                    "obj_kind": trip["obj_kind"],
                    "neg": bool(trip["neg"]),
                    "passive": bool(trip["passive"]),
                    "pred_tok": int(trip["pred_tok"]),
                    "rel": trip["rel"],
                    "rel_human": trip["rel_human"],
                    "rel_idx": int(trip["rel_idx"]),
                }
            )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "conv_id", "turn_idx", "sent_idx", "subj", "pred", "obj",
            "subj_type", "obj_type", "subj_kind", "obj_kind", "neg",
            "passive", "pred_tok", "rel", "rel_human", "rel_idx",
        ],
    )
    for c in ("turn_idx", "sent_idx", "pred_tok", "rel_idx"):
        pdf[c] = pdf[c].astype("int32")
    return _publish(pdf, dst)


def mention_rows(scale: str, data_dir: str = testgen.DEFAULT_DATA_DIR) -> str:
    """Sequential segment→parse→mention detection → exploded mention rows
    (conv_id, turn_idx, sent_idx, mention_id, start_tok, end_tok, surface,
    tag, kind) — the input table of the link-scoring stage."""
    dst = os.path.abspath(
        os.path.join(data_dir, testgen.scale_dir(scale), MENTION_ROWS_FILE)
    )
    if os.path.exists(dst):
        return dst
    _paths, transcripts, entity_kb, _figer = _load_kg_inputs(scale)
    kb_index = {tuple(s.split(" ")): s for s in entity_kb["surface"]}
    rows: List[dict] = []
    ordered = transcripts.sort_values(["conv_id", "turn_idx"])
    for conv_id, turn_idx, text in zip(
        ordered["conv_id"], ordered["turn_idx"], ordered["text"]
    ):
        for sent_idx, (_li, sent) in enumerate(
            rules.segment_text_with_lines(text or "")
        ):
            tokens = lx.parse_sentence_soa(sent)
            for mid, m in enumerate(rules.detect_mentions(tokens, kb_index)):
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "sent_idx": sent_idx,
                        "mention_id": mid,
                        "start_tok": int(m["start_tok"]),
                        "end_tok": int(m["end_tok"]),
                        "surface": m["surface"],
                        "tag": m["tag"],
                        "kind": m["kind"],
                    }
                )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "conv_id", "turn_idx", "sent_idx", "mention_id", "start_tok",
            "end_tok", "surface", "tag", "kind",
        ],
    )
    for c in ("turn_idx", "sent_idx", "mention_id", "start_tok", "end_tok"):
        pdf[c] = pdf[c].astype("int32")
    # linking determinism precondition: each surface has a unique max-prior
    # candidate, so dict argmax (Spark/UDF, first-row-wins on strict >) and
    # SQL row_number (ORDER BY prior DESC, url ASC) agree.  Checked on the
    # CANDIDATE side: all rows at the surface's max prior must share one url.
    max_prior = entity_kb.groupby("surface")["prior"].transform("max")
    ties = entity_kb[entity_kb["prior"] == max_prior]
    n_urls_at_max = ties.groupby("surface")["url"].nunique()
    assert int(n_urls_at_max.max()) == 1, (
        "ambiguous max-prior candidate — linker tie-break undefined for "
        f"surfaces: {list(n_urls_at_max[n_urls_at_max > 1].index[:5])}"
    )
    return _publish(pdf, dst)


ENTITY_CLUSTERS_FILE = f"entity_clusters_v{ORACLE_MAT_VERSION}.parquet"
ENTITY_KEYMAP_FILE = f"entity_keymap_v{ORACLE_MAT_VERSION}.parquet"


def entity_clusters(scale: str, data_dir: str = testgen.DEFAULT_DATA_DIR) -> str:
    """Sequential replica of operators/canonicalize.canonicalize's entities
    rollup: link every mention, cluster entity keys (same-URL star + LSH
    near-dup surfaces verified by exact char-shingle Jaccard ≥ 0.7), label
    components by min key (union-find), roll up per cluster.

    Shares the sketch functions (operators/sketches.py) with the Spark UDFs;
    what the DuckDB comparison then verifies is the distributed machinery —
    LSH band shuffle, candidate joins, iterative star CC, the rollup
    aggregation — against this single-threaded run."""
    dst = os.path.abspath(
        os.path.join(data_dir, testgen.scale_dir(scale), ENTITY_CLUSTERS_FILE)
    )
    keymap_dst = os.path.abspath(
        os.path.join(data_dir, testgen.scale_dir(scale), ENTITY_KEYMAP_FILE)
    )
    if os.path.exists(dst) and os.path.exists(keymap_dst):
        return dst
    mrows = pd.read_parquet(mention_rows(scale, data_dir))
    _paths, _t, entity_kb, _f = _load_kg_inputs(scale)
    kb: Dict = {}
    for surface, url, prior in entity_kb[["surface", "url", "prior"]].itertuples(
        index=False
    ):
        cur = kb.get(surface)
        if cur is None or prior > cur[1]:
            kb[surface] = (url, float(prior))

    refs: List[tuple] = []  # (ent_key, surface, url), one per mention row
    for s in mrows["surface"]:
        hit = kb.get(s)
        url = hit[0] if hit is not None else rules.NOT_IN_WIKI_PREFIX + s.replace(" ", "_")
        ent_key = rules.canonical_entity_string(url, s)
        refs.append((ent_key, s, url))
    ents = sorted(set(refs))  # distinct (ent_key, surface, url)

    # evidence 1: same-URL star edges (min key per url)
    by_url: Dict[str, List[str]] = {}
    for k, _s, u in ents:
        by_url.setdefault(u, []).append(k)
    pair_edges = set()
    for u, ks in by_url.items():
        root = min(ks)
        for k in set(ks):
            if k != root:
                pair_edges.add((root, k))

    # evidence 2: minhash-LSH candidates over distinct (ent_key, surface),
    # banded exactly like sketches.lsh_candidate_pairs (8 bands of 4), with
    # the same max_bucket=1000 cap, verified by exact char-shingle Jaccard
    ks_rows = sorted({(k, s) for k, s, _u in refs})
    sigs = {
        (k, s): sketches.minhash_signature(sketches.char_shingles(s, 3), 32)
        for k, s in ks_rows
    }
    buckets: Dict[tuple, List[str]] = {}
    for (k, s), sig in sigs.items():
        for b in range(8):
            buckets.setdefault((b, tuple(sig[b * 4 : b * 4 + 4])), []).append(k)
    surfaces_of: Dict[str, set] = {}
    for k, s in ks_rows:
        surfaces_of.setdefault(k, set()).add(s)
    cand = set()
    for members in buckets.values():
        if len(members) > 1000:  # bucket cap — same policy as the operator
            continue
        uniq = sorted(set(members))
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                cand.add((uniq[i], uniq[j]))
    for a, b in sorted(cand):
        ok = any(
            sketches.jaccard(
                sketches.char_shingles(sa, 3), sketches.char_shingles(sb, 3)
            )
            >= 0.7
            for sa in surfaces_of[a]
            for sb in surfaces_of[b]
        )
        if ok:
            pair_edges.add((a, b))

    # union-find, min-label components
    parent: Dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    comp: Dict[str, str] = {}
    for k in surfaces_of:
        comp[k] = find(k)
    # min label per component (find() roots are not guaranteed minimal)
    cmin: Dict[str, str] = {}
    for k, r in comp.items():
        cmin[r] = min(cmin.get(r, k), k)
    canon = {k: cmin[r] for k, r in comp.items()}

    agg: Dict[str, Dict[str, object]] = {}
    for k, s, u in refs:
        c = canon[k]
        a = agg.setdefault(c, {"keys": set(), "surfaces": set(), "n": 0})
        a["keys"].add(k)
        a["surfaces"].add(s)
        a["n"] += 1
    pdf = pd.DataFrame(
        sorted(
            (c, len(a["keys"]), len(a["surfaces"]), a["n"])
            for c, a in agg.items()
        ),
        columns=["canonical_id", "n_keys", "n_surfaces", "n_mentions"],
    )
    pdf["n_keys"] = pdf["n_keys"].astype("int32")
    pdf["n_surfaces"] = pdf["n_surfaces"].astype("int32")
    pdf["n_mentions"] = pdf["n_mentions"].astype("int64")
    # key map (ent_key → canonical) — the kg_edges oracle rewrites the
    # oracle triples' subj/obj through this, mirroring canonicalize()'s
    # edge join
    _publish(
        pd.DataFrame(
            sorted(canon.items()), columns=["ent_key", "canonical_id"]
        ),
        keymap_dst,
    )
    return _publish(pdf, dst)


def pagerank_table(
    scale: str,
    data_dir: str = testgen.DEFAULT_DATA_DIR,
    damping: float = 0.85,
    n_iter: int = 15,
    personalized_min_seed: bool = False,
) -> str:
    """Sequential numpy replica of operators/graphalgs.pagerank over the
    canonical entity graph (distinct directed subj→obj canonical edges,
    self-loops dropped): identical recurrence — uniform init, uniform
    dangling-mass redistribution, fixed ``n_iter`` power iterations —
    so the DuckDB comparison gates the distributed per-round join/agg
    machinery and the checkpoint discipline, not the math.

    ``personalized_min_seed`` runs the personalized variant instead:
    teleport + dangling mass go to the lexicographically-first node (the
    same seed rule as kg_bfs), matching graphalgs.pagerank(seeds=...)'s
    arithmetic association exactly.

    Parameter-suffixed filename (aux-cache convention): changing damping
    or iteration count can never serve stale ranks."""
    stem = "ppr" if personalized_min_seed else "pagerank"
    dst = os.path.abspath(
        os.path.join(
            data_dir,
            testgen.scale_dir(scale),
            f"{stem}_v{ORACLE_MAT_VERSION}_d{int(damping * 100)}i{n_iter}.parquet",
        )
    )
    if os.path.exists(dst):
        return dst
    entity_clusters(scale, data_dir)  # ensures the keymap exists
    triples = pd.read_parquet(oracle_triples(scale, data_dir))
    keymap = pd.read_parquet(
        os.path.join(data_dir, testgen.scale_dir(scale), ENTITY_KEYMAP_FILE)
    )
    canon = dict(zip(keymap["ent_key"], keymap["canonical_id"]))
    edges = sorted(
        {
            (canon[s], canon[o])
            for s, o in zip(triples["subj"], triples["obj"])
            if s in canon and o in canon and canon[s] != canon[o]
        }
    )
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    if not nodes:
        return _publish(pd.DataFrame({"canonical_id": [], "rank": []}), dst)
    idx = {n: i for i, n in enumerate(nodes)}
    n_nodes = len(nodes)
    src_i = np.array([idx[s] for s, _ in edges], dtype=np.int64)
    dst_i = np.array([idx[d] for _, d in edges], dtype=np.int64)
    out_deg = np.bincount(src_i, minlength=n_nodes).astype(np.float64)
    if personalized_min_seed:
        v = np.zeros(n_nodes)
        v[0] = 1.0  # nodes is sorted: index 0 is the min node
        r = v.copy()
        for _ in range(n_iter):
            dangling = float(r[out_deg == 0].sum())
            contrib = np.zeros(n_nodes)
            np.add.at(contrib, dst_i, r[src_i] / out_deg[src_i])
            r = (1.0 - damping) * v + (damping * dangling) * v \
                + damping * contrib
    else:
        r = np.full(n_nodes, 1.0 / n_nodes)
        for _ in range(n_iter):
            dangling = float(r[out_deg == 0].sum())
            contrib = np.zeros(n_nodes)
            np.add.at(contrib, dst_i, r[src_i] / out_deg[src_i])
            r = (1.0 - damping) / n_nodes + damping * dangling / n_nodes \
                + damping * contrib
    return _publish(
        pd.DataFrame({"canonical_id": nodes, "rank": np.round(r, 6)}), dst
    )


def pagerank_weighted_table(
    scale: str,
    data_dir: str = testgen.DEFAULT_DATA_DIR,
    damping: float = 0.85,
    n_iter: int = 15,
) -> str:
    """Sequential numpy replica of operators/graphalgs.pagerank_weighted:
    edge weight = triple-evidence count per canonical (src, dst) pair
    (self-loops and unlinked endpoints dropped), rank distributed
    proportionally to outgoing weight — per-edge association
    (r·w)/out_w matches the distributed Column expression exactly.
    Parameter-suffixed filename."""
    dst = os.path.abspath(
        os.path.join(
            data_dir,
            testgen.scale_dir(scale),
            f"pagerankw_v{ORACLE_MAT_VERSION}"
            f"_d{int(damping * 100)}i{n_iter}.parquet",
        )
    )
    if os.path.exists(dst):
        return dst
    entity_clusters(scale, data_dir)
    triples = pd.read_parquet(oracle_triples(scale, data_dir))
    keymap = pd.read_parquet(
        os.path.join(data_dir, testgen.scale_dir(scale), ENTITY_KEYMAP_FILE)
    )
    canon = dict(zip(keymap["ent_key"], keymap["canonical_id"]))
    cnt: Dict[tuple, int] = {}
    for s, o in zip(triples["subj"], triples["obj"]):
        if s in canon and o in canon and canon[s] != canon[o]:
            key = (canon[s], canon[o])
            cnt[key] = cnt.get(key, 0) + 1
    edges = sorted(cnt)
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    if not nodes:
        return _publish(pd.DataFrame({"canonical_id": [], "rank": []}), dst)
    idx = {n: i for i, n in enumerate(nodes)}
    n_nodes = len(nodes)
    src_i = np.array([idx[s] for s, _ in edges], dtype=np.int64)
    dst_i = np.array([idx[d] for _, d in edges], dtype=np.int64)
    w = np.array([float(cnt[e]) for e in edges])
    out_w = np.zeros(n_nodes)
    np.add.at(out_w, src_i, w)
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(n_iter):
        dangling = float(r[out_w == 0.0].sum())
        contrib = np.zeros(n_nodes)
        np.add.at(contrib, dst_i, r[src_i] * w / out_w[src_i])
        r = (1.0 - damping) / n_nodes + damping * dangling / n_nodes \
            + damping * contrib
    return _publish(
        pd.DataFrame({"canonical_id": nodes, "rank": np.round(r, 6)}), dst
    )


def hits_table(
    scale: str,
    data_dir: str = testgen.DEFAULT_DATA_DIR,
    n_iter: int = 15,
) -> str:
    """Sequential numpy replica of operators/graphalgs.hits over the
    canonical entity graph (distinct directed self-loop-free edges):
    per round the authority vector sums incoming hub scores and
    L1-normalizes, then the hub vector sums outgoing NEW authorities and
    L1-normalizes — the identical recurrence, so the DuckDB comparison
    gates the distributed join/agg rounds.  Parameter-suffixed
    filename."""
    dst = os.path.abspath(
        os.path.join(
            data_dir,
            testgen.scale_dir(scale),
            f"hits_v{ORACLE_MAT_VERSION}_i{n_iter}.parquet",
        )
    )
    if os.path.exists(dst):
        return dst
    entity_clusters(scale, data_dir)
    triples = pd.read_parquet(oracle_triples(scale, data_dir))
    keymap = pd.read_parquet(
        os.path.join(data_dir, testgen.scale_dir(scale), ENTITY_KEYMAP_FILE)
    )
    canon = dict(zip(keymap["ent_key"], keymap["canonical_id"]))
    edges = sorted(
        {
            (canon[s], canon[o])
            for s, o in zip(triples["subj"], triples["obj"])
            if s in canon and o in canon and canon[s] != canon[o]
        }
    )
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    if not nodes:
        return _publish(
            pd.DataFrame({"canonical_id": [], "hub": [], "authority": []}),
            dst,
        )
    idx = {n: i for i, n in enumerate(nodes)}
    n_nodes = len(nodes)
    src_i = np.array([idx[s] for s, _ in edges], dtype=np.int64)
    dst_i = np.array([idx[d] for _, d in edges], dtype=np.int64)
    h = np.ones(n_nodes)
    a = np.ones(n_nodes)
    for _ in range(n_iter):
        a_raw = np.zeros(n_nodes)
        np.add.at(a_raw, dst_i, h[src_i])
        sa = float(a_raw.sum())
        a = a_raw / (sa if sa > 0 else 1.0)
        h_raw = np.zeros(n_nodes)
        np.add.at(h_raw, src_i, a[dst_i])
        sh = float(h_raw.sum())
        h = h_raw / (sh if sh > 0 else 1.0)
    return _publish(
        pd.DataFrame(
            {
                "canonical_id": nodes,
                "hub": np.round(h, 6),
                "authority": np.round(a, 6),
            }
        ),
        dst,
    )


def kcore_table(
    scale: str,
    data_dir: str = testgen.DEFAULT_DATA_DIR,
    k: int = 2,
) -> str:
    """Sequential replica of operators/graphalgs.k_core: peel nodes with
    degree < k to the unique fixpoint; emit surviving nodes with their
    in-core degree.  Parameter-suffixed filename."""
    dst = os.path.abspath(
        os.path.join(
            data_dir,
            testgen.scale_dir(scale),
            f"kcore_v{ORACLE_MAT_VERSION}_k{k}.parquet",
        )
    )
    if os.path.exists(dst):
        return dst
    entity_clusters(scale, data_dir)
    triples = pd.read_parquet(oracle_triples(scale, data_dir))
    keymap = pd.read_parquet(
        os.path.join(data_dir, testgen.scale_dir(scale), ENTITY_KEYMAP_FILE)
    )
    canon = dict(zip(keymap["ent_key"], keymap["canonical_id"]))
    adj: Dict[str, set] = {}
    for s, o in zip(triples["subj"], triples["obj"]):
        if s in canon and o in canon and canon[s] != canon[o]:
            a, b = canon[s], canon[o]
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    rows = sorted((n, len(adj[n] & alive)) for n in alive)
    return _publish(
        pd.DataFrame(rows, columns=["canonical_id", "core_degree"]), dst
    )


def truss_table(
    scale: str,
    data_dir: str = testgen.DEFAULT_DATA_DIR,
    k: int = 3,
) -> str:
    """Sequential replica of operators/graphalgs.k_truss: peel edges in
    fewer than k−2 triangles (support counted over the surviving edge
    set) to the unique fixpoint; emit surviving a < b edges with their
    in-truss support.  Parameter-suffixed filename."""
    dst = os.path.abspath(
        os.path.join(
            data_dir,
            testgen.scale_dir(scale),
            f"truss_v{ORACLE_MAT_VERSION}_k{k}.parquet",
        )
    )
    if os.path.exists(dst):
        return dst
    entity_clusters(scale, data_dir)
    triples = pd.read_parquet(oracle_triples(scale, data_dir))
    keymap = pd.read_parquet(
        os.path.join(data_dir, testgen.scale_dir(scale), ENTITY_KEYMAP_FILE)
    )
    canon = dict(zip(keymap["ent_key"], keymap["canonical_id"]))
    alive = {
        (min(canon[s], canon[o]), max(canon[s], canon[o]))
        for s, o in zip(triples["subj"], triples["obj"])
        if s in canon and o in canon and canon[s] != canon[o]
    }
    threshold = k - 2

    def _supports(edges: set) -> Dict[tuple, int]:
        adj: Dict[str, set] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {(a, b): len(adj[a] & adj[b]) for a, b in edges}

    while alive:
        sup = _supports(alive)
        drop = {e for e, s in sup.items() if s < threshold}
        if not drop:
            break
        alive -= drop
    sup = _supports(alive)
    rows = sorted((a, b, sup[(a, b)]) for a, b in alive)
    return _publish(
        pd.DataFrame(rows, columns=["a", "b", "support"]), dst
    )


def sssp_table(
    scale: str,
    data_dir: str = testgen.DEFAULT_DATA_DIR,
    max_iter: int = 50,
) -> str:
    """Sequential replica of the kg_sssp query: evidence-weighted
    shortest paths from the lexicographically-first entity.  Edge weight
    per unordered canonical pair = max(1, 4 − n_evidence) — corroborated
    edges are cheaper — exactly the derivation the Spark query builds
    with native Columns.  Distances via heapq Dijkstra: the fixpoint of
    positive-integer relaxation is the same unique minima set the
    distributed Bellman–Ford loop converges to, so the comparison gates
    the frontier/join/min machinery, not the algorithm choice."""
    import heapq

    dst = os.path.abspath(
        os.path.join(
            data_dir,
            testgen.scale_dir(scale),
            f"sssp_v{ORACLE_MAT_VERSION}_w4.parquet",
        )
    )
    if os.path.exists(dst):
        return dst
    entity_clusters(scale, data_dir)
    triples = pd.read_parquet(oracle_triples(scale, data_dir))
    keymap = pd.read_parquet(
        os.path.join(data_dir, testgen.scale_dir(scale), ENTITY_KEYMAP_FILE)
    )
    canon = dict(zip(keymap["ent_key"], keymap["canonical_id"]))
    n_ev: Dict[tuple, int] = {}
    for s, o in zip(triples["subj"], triples["obj"]):
        if s in canon and o in canon and canon[s] != canon[o]:
            pair = (min(canon[s], canon[o]), max(canon[s], canon[o]))
            n_ev[pair] = n_ev.get(pair, 0) + 1
    adj: Dict[str, list] = {}
    for (a, b), cnt in n_ev.items():
        w = max(1, 4 - cnt)
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    seed = min(adj) if adj else None
    dist: Dict[str, int] = {}
    if seed is not None:
        heap = [(0, seed)]
        while heap:
            d, node = heapq.heappop(heap)
            if node in dist:
                continue
            dist[node] = d
            for nbr, w in adj[node]:
                if nbr not in dist:
                    heapq.heappush(heap, (d + w, nbr))
    rows = sorted(dist.items())
    return _publish(
        pd.DataFrame(rows, columns=["canonical_id", "dist"]), dst
    )


def hyperball_table(
    scale: str,
    data_dir: str = testgen.DEFAULT_DATA_DIR,
    max_r: int = 3,
    b: int = 4,
    salt: str = "hb",
) -> str:
    """Sequential replica of operators/graphalgs.hyperball: per-node HLL
    ball sketches grown by neighbor register-max rounds, with the exact
    same md5 cell math and exact-integer estimator as
    freq._hll_cells / freq.hll_estimate_grouped — bit-for-bit, so the
    DuckDB comparison gates the distributed join/max rounds.
    Parameter-suffixed filename."""
    import hashlib
    import math

    dst = os.path.abspath(
        os.path.join(
            data_dir,
            testgen.scale_dir(scale),
            f"hyperball_v{ORACLE_MAT_VERSION}_r{max_r}b{b}.parquet",
        )
    )
    if os.path.exists(dst):
        return dst
    entity_clusters(scale, data_dir)
    triples = pd.read_parquet(oracle_triples(scale, data_dir))
    keymap = pd.read_parquet(
        os.path.join(data_dir, testgen.scale_dir(scale), ENTITY_KEYMAP_FILE)
    )
    canon = dict(zip(keymap["ent_key"], keymap["canonical_id"]))
    edges = {
        (canon[s], canon[o])
        for s, o in zip(triples["subj"], triples["obj"])
        if s in canon and o in canon and canon[s] != canon[o]
    }
    adj: Dict[str, set] = {}
    for s, o in edges:
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    nodes = sorted(adj)
    w_bits = 32 - b
    m = 1 << b
    scale_u = 1 << (w_bits + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)

    def cell(key: str):
        h = int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)
        w = h % (1 << w_bits)
        rho = (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length())
        return h >> w_bits, rho

    regs = {}
    for n in nodes:
        bkt, rho = cell(n)
        regs[n] = {bkt: rho}

    def estimate(rg: Dict[int, int]):
        n_used = len(rg)
        v_zero = m - n_used
        s_scaled = sum(1 << (w_bits + 1 - rho) for rho in rg.values()) + (
            v_zero * scale_u
        )
        raw = alpha * float(m) * float(m) * float(scale_u) / float(s_scaled)
        if raw <= 2.5 * m and v_zero > 0:
            est = float(m) * math.log(float(m) / float(v_zero))
        else:
            est = raw
        return n_used, v_zero, s_scaled, int(math.floor(est))

    rows = []
    for n in nodes:
        nu, vz, ss, es = estimate(regs[n])
        rows.append((n, 0, nu, vz, ss, es))
    for r in range(1, max_r + 1):
        nxt = {}
        for n in nodes:
            merged = dict(regs[n])
            for nb in adj[n]:
                for bkt, rho in regs[nb].items():
                    if merged.get(bkt, 0) < rho:
                        merged[bkt] = rho
            nxt[n] = merged
        regs = nxt
        for n in nodes:
            nu, vz, ss, es = estimate(regs[n])
            rows.append((n, r, nu, vz, ss, es))
    rows.sort()
    return _publish(
        pd.DataFrame(
            rows,
            columns=[
                "canonical_id",
                "r",
                "n_used",
                "v_zero",
                "s_scaled",
                "est",
            ],
        ),
        dst,
    )


def lpa_table(
    scale: str,
    data_dir: str = testgen.DEFAULT_DATA_DIR,
    n_iter: int = 5,
) -> str:
    """Sequential replica of operators/graphalgs.label_propagation over
    the canonical entity graph: synchronous rounds, most-frequent
    neighbor label with min-label tie-break — identical recurrence, so
    the DuckDB comparison gates the distributed join/count/argmax rounds.
    Parameter-suffixed filename (aux-cache convention)."""
    dst = os.path.abspath(
        os.path.join(
            data_dir,
            testgen.scale_dir(scale),
            f"lpa_v{ORACLE_MAT_VERSION}_i{n_iter}.parquet",
        )
    )
    if os.path.exists(dst):
        return dst
    entity_clusters(scale, data_dir)
    triples = pd.read_parquet(oracle_triples(scale, data_dir))
    keymap = pd.read_parquet(
        os.path.join(data_dir, testgen.scale_dir(scale), ENTITY_KEYMAP_FILE)
    )
    canon = dict(zip(keymap["ent_key"], keymap["canonical_id"]))
    neigh: Dict[str, set] = {}
    for s, o in zip(triples["subj"], triples["obj"]):
        if s in canon and o in canon and canon[s] != canon[o]:
            a, b = canon[s], canon[o]
            neigh.setdefault(a, set()).add(b)
            neigh.setdefault(b, set()).add(a)
    labels = {n: n for n in neigh}
    for _ in range(n_iter):
        new = {}
        for n, nbs in neigh.items():
            cnt: Dict[str, int] = {}
            for nb in nbs:
                lb = labels[nb]
                cnt[lb] = cnt.get(lb, 0) + 1
            m = max(cnt.values())
            new[n] = min(lb for lb, c in cnt.items() if c == m)
        labels = new
    rows = sorted(labels.items())
    return _publish(
        pd.DataFrame(rows, columns=["canonical_id", "community"]), dst
    )


PREDICATE_CLUSTERS_FILE = f"predicate_clusters_v{ORACLE_MAT_VERSION}.parquet"


def predicate_clusters(scale: str, data_dir: str = testgen.DEFAULT_DATA_DIR) -> str:
    """Sequential replica of operators/canonicalize.canonicalize_predicates:
    distinct predicate strings from the oracle triples, minhash-LSH over
    2-char shingles (32 hashes, 8 bands of 4, max_bucket=1000 — the exact
    banding/cap of the Spark operator), candidates verified by exact
    char-shingle Jaccard ≥ 0.8, union-find with min-label components,
    singletons map to themselves.  The DuckDB comparison then gates the
    distributed machinery (band shuffle, candidate joins, iterative CC)
    against this single-threaded run."""
    dst = os.path.abspath(
        os.path.join(data_dir, testgen.scale_dir(scale), PREDICATE_CLUSTERS_FILE)
    )
    if os.path.exists(dst):
        return dst
    preds = sorted(
        set(pd.read_parquet(oracle_triples(scale, data_dir), columns=["pred"])["pred"])
    )
    shingle_k, n_hashes, bands, threshold = 2, 32, 8, 0.8
    sigs = {
        p: sketches.minhash_signature(sketches.char_shingles(p, shingle_k), n_hashes)
        for p in preds
    }
    buckets: Dict[tuple, List[str]] = {}
    for p, sig in sigs.items():
        for b in range(bands):
            buckets.setdefault((b, tuple(sig[b * 4 : b * 4 + 4])), []).append(p)
    cand = set()
    for members in buckets.values():
        if len(members) > 1000:  # operator bucket cap
            continue
        uniq = sorted(set(members))
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                cand.add((uniq[i], uniq[j]))
    parent: Dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sorted(cand):
        if (
            sketches.jaccard(
                sketches.char_shingles(a, shingle_k),
                sketches.char_shingles(b, shingle_k),
            )
            >= threshold
        ):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    comp = {p: find(p) for p in preds}
    cmin: Dict[str, str] = {}
    for p, r in comp.items():
        cmin[r] = min(cmin.get(r, p), p)
    pdf = pd.DataFrame(
        {"pred": preds, "pred_canonical": [cmin[comp[p]] for p in preds]}
    )
    return _publish(pdf, dst)


# ---------------------------------------------------------------------------
# Document sketches (driver `documents` table)
# ---------------------------------------------------------------------------


def doc_sketches(sf_dir: str, n_hashes: int = 64, shingle_k: int = 3) -> Dict[str, str]:
    """MinHash signatures + SimHash fingerprints per document, computed
    sequentially with the shared sketch functions (operators/sketches.py)."""
    adir = aux_dir(sf_dir)
    out = {
        "minhash": os.path.join(adir, "minhash.parquet"),
        "simhash": os.path.join(adir, "simhash.parquet"),
    }
    if all(os.path.exists(p) for p in out.values()):
        return out
    docs = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    shingles = [
        sketches.word_shingles(t or "", shingle_k) for t in docs["text"]
    ]
    mh = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "minhash": [
                sketches.minhash_signature(s, n_hashes) for s in shingles
            ],
        }
    )
    sh = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "simhash": np.array(
                [sketches.simhash64(s) for s in shingles], dtype=np.int64
            ),
        }
    )
    # gate-scale precondition: the DuckDB oracles enumerate ALL band/chunk-
    # equal pairs with no size cap, while the Spark operators drop buckets
    # larger than max_bucket=1000 (sketches.lsh_candidate_pairs,
    # dedup.near_dup_pairs_simhash).  Assert no bucket exceeds the cap here,
    # so the two sides provably see the same candidate set at this scale.
    band_counts: Dict[tuple, int] = {}
    for sig in mh["minhash"]:
        for b in range(16):  # 16 bands of 4 — same banding as both sides
            key = (b, tuple(sig[b * 4 : b * 4 + 4]))
            band_counts[key] = band_counts.get(key, 0) + 1
    assert max(band_counts.values()) <= 1000, (
        "minhash band bucket exceeds the operator cap — oracle would diverge"
    )
    chunk_counts: Dict[tuple, int] = {}
    for fp in sh["simhash"]:
        for c in range(4):  # 4 chunks of 16 bits — same banding as both sides
            key = (c, (int(fp) >> (16 * c)) & 0xFFFF)
            chunk_counts[key] = chunk_counts.get(key, 0) + 1
    assert max(chunk_counts.values()) <= 1000, (
        "simhash chunk bucket exceeds the operator cap — oracle would diverge"
    )
    _publish(mh, out["minhash"])
    _publish(sh, out["simhash"])
    return out


# ---------------------------------------------------------------------------
# Embedding aux tables (driver `embeddings` table)
# ---------------------------------------------------------------------------


def _load_embeddings(sf_dir: str):
    emb = pd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    mat = np.vstack(emb["embedding"].map(np.asarray).to_numpy())
    return emb, mat


def embed_aux(
    sf_dir: str,
    n_clusters: int = 16,
    nprobes: tuple = (8, 12),
    query_mod: int = 100,
) -> Dict[str, str]:
    """LSH buckets (8/6/4/3-plane) and IVF cell assignments per vector, via
    the shared numpy functions in operators/similarity.py.

    Every filename is parameter-suffixed (planes in the lsh names,
    ``_k{n_clusters}`` / ``p{nprobe}`` on the IVF files): changing an ANN
    default can therefore never silently serve a materialization built with
    another configuration — the cache either matches or gets rebuilt.
    ``nprobes`` materializes one query-cell table per setting (the IVF query
    runs nprobe=8, IVF-PQ nprobe=12)."""
    from relationextractionpipeline_spark.operators import similarity

    adir = aux_dir(sf_dir)
    out = {
        "lsh8": os.path.join(adir, "lsh8.parquet"),
        "lsh6": os.path.join(adir, "lsh6.parquet"),
        "lsh4": os.path.join(adir, "lsh4.parquet"),
        "lsh3": os.path.join(adir, "lsh3.parquet"),
        "ivf_cells": os.path.join(adir, f"ivf_cells_k{n_clusters}.parquet"),
    }
    for np_ in nprobes:
        out[f"ivf_qcells_p{np_}"] = os.path.join(
            adir, f"ivf_qcells_k{n_clusters}p{np_}.parquet"
        )
    if all(os.path.exists(p) for p in out.values()):
        return out
    emb, mat = _load_embeddings(sf_dir)
    dim = mat.shape[1]
    for planes, key in ((8, "lsh8"), (6, "lsh6"), (4, "lsh4"), (3, "lsh3")):
        buckets = similarity.hyperplane_buckets(mat, planes, dim)
        _publish(
            pd.DataFrame({"vec_id": emb["vec_id"], "bucket": buckets}), out[key]
        )
    # IVF: train on the same deterministic sample the Spark path uses
    # (first `max_train` vectors by id), then assign every vector
    order = np.argsort(emb["vec_id"].to_numpy(), kind="stable")
    train = mat[order[:100_000]].astype(np.float64)
    centroids = similarity.train_centroids(train, n_clusters)
    cells = similarity.assign_cells(mat, centroids, nprobe=1)[:, 0].astype("int32")
    _publish(
        pd.DataFrame({"vec_id": emb["vec_id"], "cell": cells}), out["ivf_cells"]
    )
    qmask = (emb["vec_id"] % query_mod == 0).to_numpy()
    qids = emb["vec_id"].to_numpy()[qmask]
    for np_ in nprobes:
        qcells = similarity.assign_cells(mat[qmask], centroids, nprobe=np_)
        _publish(
            pd.DataFrame(
                {
                    "query_id": np.repeat(qids, np_),
                    "cell": qcells.reshape(-1).astype("int32"),
                }
            ),
            out[f"ivf_qcells_p{np_}"],
        )
    return out


def lsh_multi_aux(
    sf_dir: str, n_planes: int = 4, n_tables: int = 8
) -> str:
    """(vec_id, table_idx, bucket) rows for multi-table hyperplane LSH,
    via the shared numpy function (similarity.hyperplane_buckets_multi)."""
    from relationextractionpipeline_spark.operators import similarity

    adir = aux_dir(sf_dir)
    dst = os.path.join(adir, f"lsh_multi_p{n_planes}t{n_tables}.parquet")
    if os.path.exists(dst):
        return dst
    emb, mat = _load_embeddings(sf_dir)
    buckets = similarity.hyperplane_buckets_multi(
        mat, n_planes, mat.shape[1], n_tables
    )
    _publish(
        pd.DataFrame(
            {
                "vec_id": np.repeat(emb["vec_id"].to_numpy(), n_tables),
                "table_idx": np.tile(
                    np.arange(n_tables, dtype=np.int32), len(emb)
                ),
                "bucket": buckets.reshape(-1).astype("int32"),
            }
        ),
        dst,
    )
    return dst


def lsh_probe_aux(
    sf_dir: str, n_planes: int = 6, n_probes: int = 15, query_mod: int = 100
) -> str:
    """(query_id, bucket) probe rows for multi-probe LSH — base bucket +
    lowest-total-|margin| flip sets of ≤3 bits, via the shared numpy function
    (similarity.hyperplane_probe_buckets).  Corpus-side buckets reuse
    ``lsh{n_planes}.parquet`` from embed_aux (same planes: seed 42).  The
    ``v2`` filename marker versions the perturbation SEMANTICS (v1 flipped
    single bits only) on top of the parameter suffix."""
    from relationextractionpipeline_spark.operators import similarity

    adir = aux_dir(sf_dir)
    dst = os.path.join(adir, f"lsh_probe_v2_p{n_planes}m{n_probes}.parquet")
    if os.path.exists(dst):
        return dst
    emb, mat = _load_embeddings(sf_dir)
    qmask = (emb["vec_id"] % query_mod == 0).to_numpy()
    qids = emb["vec_id"].to_numpy()[qmask]
    probes = similarity.hyperplane_probe_buckets(
        mat[qmask], n_planes, mat.shape[1], n_probes
    )
    _publish(
        pd.DataFrame(
            {
                "query_id": np.repeat(qids, n_probes + 1),
                "bucket": probes.reshape(-1).astype("int32"),
            }
        ),
        dst,
    )
    return dst


def pq_aux(
    sf_dir: str, n_sub: int = 8, n_codes: int = 256, query_mod: int = 100
) -> Dict[str, str]:
    """PQ codes for every vector + per-query ADC lookup tables, via the
    shared numpy functions in operators/similarity.py."""
    from relationextractionpipeline_spark.operators import similarity

    adir = aux_dir(sf_dir)
    # param-suffixed filenames: a default change can never silently serve
    # codes built with another codebook resolution (see NOTES.md)
    out = {
        "codes": os.path.join(adir, f"pq_codes_s{n_sub}c{n_codes}.parquet"),
        "lut": os.path.join(adir, f"pq_lut_s{n_sub}c{n_codes}.parquet"),
    }
    if all(os.path.exists(p) for p in out.values()):
        return out
    emb, mat = _load_embeddings(sf_dir)
    order = np.argsort(emb["vec_id"].to_numpy(), kind="stable")
    books = similarity.train_pq_codebooks(
        mat[order[:100_000]], n_sub=n_sub, n_codes=n_codes
    )
    codes = similarity.pq_encode(mat, books)
    _publish(
        pd.DataFrame(
            {
                "vec_id": np.repeat(emb["vec_id"].to_numpy(), n_sub),
                "sub_idx": np.tile(np.arange(n_sub, dtype=np.int32), len(emb)),
                "code": codes.reshape(-1).astype("int32"),
            }
        ),
        out["codes"],
    )
    qmask = (emb["vec_id"] % query_mod == 0).to_numpy()
    qids = emb["vec_id"].to_numpy()[qmask]
    lut = similarity.pq_lut(mat[qmask], books)
    _publish(
        similarity.lut_frame(qids, lut, n_sub, n_codes, "query_id"),
        out["lut"],
    )
    return out


def dedup_clusters(
    sf_dir: str,
    jaccard_threshold: float = 0.5,
    n_hashes: int = 64,
    bands: int = 16,
) -> str:
    """Sequential replica of operators/dedup.near_dup_clusters: banded
    minhash candidate pairs → signature-agreement Jaccard estimate ≥
    threshold → union-find transitive closure, components labeled by min
    doc_id, singletons self-labeled.

    Reads the ``doc_sketches`` signatures (whose build asserts no band
    bucket exceeds the operator's max_bucket cap at gate scale, so both
    sides provably see the same pair set).  The DuckDB comparison then
    verifies the DISTRIBUTED machinery — band shuffle, pair joins, the
    iterative large-star/small-star CC, the size join — against this
    single-threaded union-find.  Filename is parameter-suffixed (threshold
    in percent) so a default change can never serve a stale clustering."""
    adir = aux_dir(sf_dir)
    dst = os.path.join(
        adir, f"dedup_clusters_t{int(jaccard_threshold * 100)}.parquet"
    )
    if os.path.exists(dst):
        return dst
    sketch_paths = doc_sketches(sf_dir, n_hashes=n_hashes)
    mh = pd.read_parquet(sketch_paths["minhash"])
    rows_per_band = n_hashes // bands
    buckets: Dict[tuple, List[int]] = {}
    for doc_id, sig in zip(mh["doc_id"], mh["minhash"]):
        for b in range(bands):
            key = (b, tuple(sig[b * rows_per_band : (b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(int(doc_id))
    sig_of = dict(zip((int(i) for i in mh["doc_id"]), mh["minhash"]))
    cand = set()
    for members in buckets.values():
        uniq = sorted(set(members))
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                cand.add((uniq[i], uniq[j]))
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in sorted(cand):
        sa, sb = sig_of[a], sig_of[b]
        agree = sum(1 for x, y in zip(sa, sb) if x == y)
        if agree / len(sa) >= jaccard_threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min label keeps roots = component minima
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    doc_ids = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"]
    out = pd.DataFrame(
        {
            "doc_id": doc_ids.astype("int64"),
            "cluster_id": [find(int(d)) for d in doc_ids],
        }
    )
    return _publish(out, dst)


def simhash_clusters(sf_dir: str, max_hamming: int = 8) -> str:
    """Sequential replica of the simhash clustering path
    (dedup.simhash_dedup_state semantics over the full corpus): 4×16-bit
    chunk-banded candidate pairs → hamming(xor) ≤ max_hamming → union-find
    transitive closure, min-doc_id component labels, singletons
    self-labeled.  Reads the ``doc_sketches`` fingerprints (whose build
    asserts no chunk bucket exceeds the operator's max_bucket cap at gate
    scale).  Gates q_dedup_simhash_incr: incremental merge ≡ one-shot
    clustering is the exactness claim."""
    adir = aux_dir(sf_dir)
    dst = os.path.join(adir, f"simhash_clusters_h{max_hamming}.parquet")
    if os.path.exists(dst):
        return dst
    sketch_paths = doc_sketches(sf_dir)
    sh = pd.read_parquet(sketch_paths["simhash"])
    buckets: Dict[tuple, List[int]] = {}
    for doc_id, fp in zip(sh["doc_id"], sh["simhash"]):
        for c in range(4):
            key = (c, (int(fp) >> (16 * c)) & 0xFFFF)
            buckets.setdefault(key, []).append(int(doc_id))
    fp_of = dict(zip((int(i) for i in sh["doc_id"]), (int(f) for f in sh["simhash"])))
    cand = set()
    for members in buckets.values():
        uniq = sorted(set(members))
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                cand.add((uniq[i], uniq[j]))
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    mask = (1 << 64) - 1
    for a, b in sorted(cand):
        if bin((fp_of[a] ^ fp_of[b]) & mask).count("1") <= max_hamming:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    doc_ids = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"]
    out = pd.DataFrame(
        {
            "doc_id": doc_ids.astype("int64"),
            "cluster_id": [find(int(d)) for d in doc_ids],
        }
    )
    return _publish(out, dst)


def semantic_clusters(
    sf_dir: str,
    threshold: float = 0.25,
    n_planes: int = 4,
    id_mod: int = 5,
) -> str:
    """Sequential replica of similarity.semantic_dedup_clusters over the
    sampled embeddings (vec_id % id_mod == 0): near-dup pair edges are
    enumerated with DuckDB using EXACTLY the SQL the q_embed_neardup gate
    already proves equal to the Spark pair operator (same lsh{n_planes}
    bucket materialization, same round-6 cosine), then closed transitively
    with a single-threaded union-find (min-label components).  The DuckDB
    comparison of q_embed_semantic_clusters therefore isolates the
    DISTRIBUTED connected-components + assignment joins."""
    import duckdb

    adir = aux_dir(sf_dir)
    dst = os.path.join(
        adir,
        f"semantic_clusters_t{int(threshold * 100)}p{n_planes}m{id_mod}.parquet",
    )
    if os.path.exists(dst):
        return dst
    aux = embed_aux(sf_dir)
    lsh = aux.get(f"lsh{n_planes}") or os.path.join(
        adir, f"lsh{n_planes}.parquet"
    )
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    cos = (
        "round(list_dot_product(ae.embedding::DOUBLE[], be.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(ae.embedding::DOUBLE[], ae.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(be.embedding::DOUBLE[], be.embedding::DOUBLE[]))), 6)"
    )
    pairs = duckdb.sql(
        f"""
        WITH bk AS (SELECT vec_id, bucket FROM read_parquet('{lsh}'))
        SELECT DISTINCT ae.vec_id AS id_a, be.vec_id AS id_b
        FROM read_parquet('{emb_path}') ae
        JOIN bk ab ON ab.vec_id = ae.vec_id
        JOIN bk bb ON bb.bucket = ab.bucket
        JOIN read_parquet('{emb_path}') be ON be.vec_id = bb.vec_id
        WHERE ae.vec_id % {id_mod} = 0 AND be.vec_id % {id_mod} = 0
          AND ae.vec_id < be.vec_id AND {cos} >= {threshold}
        """
    ).df()
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in sorted(zip(pairs["id_a"], pairs["id_b"])):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    ids = duckdb.sql(
        f"SELECT vec_id FROM read_parquet('{emb_path}') "
        f"WHERE vec_id % {id_mod} = 0 ORDER BY vec_id"
    ).df()["vec_id"]
    out = pd.DataFrame(
        {
            "vec_id": ids.astype("int64"),
            "cluster_id": [find(int(v)) for v in ids],
        }
    )
    return _publish(out, dst)


def bpe_aux(
    sf_dir: str, n_merges: int = 60, batch_size: int = 1
) -> Dict[str, str]:
    """Sequential BPE replica (operators/bpe.train_bpe_seq — the SHARED
    algorithm definition) over the documents word counts: the learned merge
    table plus per-document token statistics under it.

    The gate on ``q_bpe_merges`` compares the DISTRIBUTED trainer (per-round
    pair-count shuffle + argmax collect + fold apply + checkpoint loop)
    against this single-threaded run — same counts, same (count desc, left,
    right) tie-break, so any divergence is distribution machinery, not the
    rule.  ``q_bpe_tokens`` then gates the broadcast/mapInPandas application
    plumbing.  Filenames are parameter-suffixed (merge count + batch size)
    so a default change can never serve stale merges.  ``batch_size`` feeds
    the SHARED ``select_merge_batch`` rule — the replica stays the same
    algorithm as the distributed trainer by construction."""
    adir = aux_dir(sf_dir)
    suffix = f"_b{batch_size}" if batch_size != 1 else ""
    out = {
        "merges": os.path.join(adir, f"bpe_merges_m{n_merges}{suffix}.parquet"),
        "tokens": os.path.join(adir, f"bpe_tokens_m{n_merges}{suffix}.parquet"),
    }
    if all(os.path.exists(p) for p in out.values()):
        return out
    from relationextractionpipeline_spark.operators import bpe

    docs = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    freqs: Dict[str, int] = {}
    for t in docs["text"]:
        for w in (t or "").lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    merges = bpe.train_bpe_seq(freqs, n_merges, batch_size=batch_size)
    merges_pdf = pd.DataFrame(
        merges, columns=["rank", "left", "right", "merged", "pair_count"]
    )
    ranks = {(m[1], m[2]): m[0] for m in merges}
    memo: Dict[str, int] = {}

    def doc_tokens(text: str) -> int:
        total = 0
        for w in (text or "").lower().split():
            n = memo.get(w)
            if n is None:
                n = len(bpe.encode_word(w, ranks))
                memo[w] = n
            total += n
        return total

    n_words = docs["text"].map(lambda t: len((t or "").lower().split()))
    n_tok = docs["text"].map(doc_tokens)
    tokens_pdf = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].astype("int64"),
            "n_words": n_words.astype("int64"),
            "n_bpe_tokens": n_tok.astype("int64"),
            "bpe_per_word": [
                round(t / w, 6) if w else None for t, w in zip(n_tok, n_words)
            ],
        }
    )
    _publish(merges_pdf, out["merges"])
    _publish(tokens_pdf, out["tokens"])
    return out


def bpe_vocab_aux(sf_dir: str, n_merges: int = 60, batch_size: int = 1) -> str:
    """Sequential subword-vocabulary replica for q_bpe_vocab: encode each
    distinct word once with the sequential trainer's merges, weight by
    corpus frequency, sum per token."""
    adir = aux_dir(sf_dir)
    suffix = f"_b{batch_size}" if batch_size != 1 else ""
    dst = os.path.join(adir, f"bpe_vocab_m{n_merges}{suffix}.parquet")
    if os.path.exists(dst):
        return dst
    from relationextractionpipeline_spark.operators import bpe

    docs = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    freqs: Dict[str, int] = {}
    for t in docs["text"]:
        for w in (t or "").lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    ranks = {
        (m[1], m[2]): m[0]
        for m in bpe.train_bpe_seq(freqs, n_merges, batch_size=batch_size)
    }
    vocab: Dict[str, int] = {}
    for w, f in freqs.items():
        for tok in bpe.encode_word(w, ranks):
            vocab[tok] = vocab.get(tok, 0) + f
    out = pd.DataFrame(
        {"token": list(vocab.keys()), "freq": list(vocab.values())}
    ).astype({"freq": "int64"})
    return _publish(out, dst)


def classifier_weights(
    sf_dir: str,
    n_buckets: int = 256,
    n_iter: int = 30,
    lr: float = 1.0,
    label_sql: str = "lang = 'en'",
    salt: str = "qcls",
) -> str:
    """Sequential numpy replica of
    operators/classifier.train_quality_classifier over the documents
    table: DuckDB featurizes with the SAME md5 bucket hash (the
    expression the q_sample_dsir gate already proves equal to the Spark
    featurization), then a single-threaded full-batch GD implements the
    module's math contract verbatim.  The DuckDB comparison of
    q_quality_classifier therefore isolates the DISTRIBUTED training
    passes (per-iteration margin/gradient shuffles + driver update) and
    the distributed scoring join; float-sum-order drift between the two
    trainings is absorbed by the round-6 score contract.

    Output parquet: (bucket, weight) for all ``n_buckets`` buckets plus
    the bias as the ``bucket = -1`` row.  Param-suffixed filename — a
    default change can never silently serve weights trained under
    another configuration."""
    import duckdb

    adir = aux_dir(sf_dir)
    dst = os.path.join(
        adir,
        f"qcls_w_b{n_buckets}i{n_iter}lr{int(lr * 100)}.parquet",
    )
    if os.path.exists(dst):
        return dst
    docs_path = os.path.join(sf_dir, "documents.parquet")
    docs = duckdb.sql(
        f"SELECT doc_id, ({label_sql}) AS y FROM read_parquet('{docs_path}')"
        " ORDER BY doc_id"
    ).df()
    occ = duckdb.sql(
        f"""
        WITH toks AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(lower(trim(text)), '\\s+')
                   END AS w
            FROM read_parquet('{docs_path}')
        ),
        grams AS (
            SELECT doc_id, unnest(w) AS g FROM toks
            UNION ALL
            SELECT doc_id, w[i] || ' ' || w[i+1] AS g
            FROM toks, UNNEST(range(1, len(w))) AS r(i)
            WHERE len(w) >= 2
        )
        SELECT doc_id,
               ('0x' || substr(md5(g || ':{salt}'), 1, 8))::BIGINT
                   % {int(n_buckets)} AS bucket,
               count(*) AS m
        FROM grams GROUP BY 1, 2 ORDER BY doc_id, bucket
        """
    ).df()
    n_docs = len(docs)
    idx = {d: i for i, d in enumerate(docs["doc_id"].to_numpy())}
    did = occ["doc_id"].map(idx).to_numpy()
    bkt = occ["bucket"].to_numpy()
    m = occ["m"].to_numpy().astype("float64")
    n_per_doc = np.zeros(n_docs)
    np.add.at(n_per_doc, did, m)
    x = m / n_per_doc[did]
    y = docs["y"].to_numpy().astype("float64")
    w = np.zeros(int(n_buckets))
    bias = 0.0
    for _ in range(int(n_iter)):
        dot = np.zeros(n_docs)
        np.add.at(dot, did, w[bkt] * x)
        p = 1.0 / (1.0 + np.exp(-(bias + dot)))
        r = p - y
        gw = np.zeros_like(w)
        np.add.at(gw, bkt, r[did] * x)
        w -= float(lr) * (gw / n_docs)
        bias -= float(lr) * (r.sum() / n_docs)
    out = pd.DataFrame(
        {
            "bucket": np.concatenate(
                [np.arange(int(n_buckets), dtype="int64"), [-1]]
            ),
            "weight": np.concatenate([w, [bias]]),
        }
    )
    return _publish(out, dst)


def oracle_facts(scale: str, data_dir: str = testgen.DEFAULT_DATA_DIR) -> pd.DataFrame:
    """Sequential canonical fact set (s, p, o) — the oracle-side analog of
    operators/kgembed.fact_table over materialize_graph's edges: oracle
    triples' subj/obj rewritten through the entity key map (rows with an
    unmapped endpoint dropped), pred through the predicate-cluster map
    (singletons self-map via coalesce), then DISTINCT.  Mirrors the facts
    CTE of the kg_rules oracle SQL."""
    t = pd.read_parquet(oracle_triples(scale, data_dir))
    small = os.path.join(data_dir, testgen.scale_dir(scale))
    entity_clusters(scale, data_dir)
    predicate_clusters(scale, data_dir)
    keymap = pd.read_parquet(os.path.join(small, ENTITY_KEYMAP_FILE))
    pmap = pd.read_parquet(os.path.join(small, PREDICATE_CLUSTERS_FILE))
    k = dict(zip(keymap["ent_key"], keymap["canonical_id"]))
    pm = dict(zip(pmap["pred"], pmap["pred_canonical"]))
    f = pd.DataFrame(
        {
            "s": t["subj"].map(k),
            "p": t["pred"].map(lambda x: pm.get(x, x)),
            "o": t["obj"].map(k),
        }
    )
    return f.dropna().drop_duplicates().reset_index(drop=True)


def transe_filename(
    dim: int = 16, n_iter: int = 10, lr: float = 0.1, margin: float = 1.0
) -> str:
    """Param-suffixed basename of the transe_aux parquet (shared with the
    oracle SQL so path construction cannot drift)."""
    return (
        f"transe_d{int(dim)}i{int(n_iter)}lr{int(lr * 1000)}"
        f"m{int(margin * 10)}_v{ORACLE_MAT_VERSION}.parquet"
    )


def distmult_filename(
    dim: int = 16, n_iter: int = 10, lr: float = 0.1, margin: float = 1.0
) -> str:
    """Param-suffixed basename of the distmult_aux parquet (shared with
    the kg_distmult oracle SQL)."""
    return (
        f"distmult_d{int(dim)}i{int(n_iter)}lr{int(lr * 1000)}"
        f"m{int(margin * 1000)}.parquet"
    )


def distmult_aux(
    scale: str,
    dim: int = 16,
    n_iter: int = 10,
    lr: float = 0.1,
    margin: float = 1.0,
    salt: str = "distmult",
    data_dir: str = testgen.DEFAULT_DATA_DIR,
) -> str:
    """Sequential numpy replica of operators/kgembed.train_distmult over
    the sequential canonical fact set (the transe_aux pattern: same math
    contract, bit-comparable by the fixed-point discipline).  Trained on
    the SAME 80% 'transe'-salted hash split as TransE so the two models
    share one held-out protocol and their eval numbers compare."""
    from relationextractionpipeline_spark.operators import kgembed

    small = os.path.join(data_dir, testgen.scale_dir(scale))
    dst = os.path.abspath(
        os.path.join(small, distmult_filename(dim, n_iter, lr, margin))
    )
    if os.path.exists(dst):
        return dst
    facts = oracle_facts(scale, data_dir)
    is_test = facts.apply(
        lambda r: kgembed._md5_bucket(
            f"{r['s']}{kgembed.SEP}{r['p']}{kgembed.SEP}{r['o']}",
            "transe-split",
        )
        % 5
        == 0,
        axis=1,
    )
    emb = kgembed.distmult_train_numpy(
        facts[~is_test],
        dim=dim, n_iter=n_iter, lr=lr, margin=margin, salt=salt,
    )
    emb["j"] = emb["j"].astype("int32")
    return _publish(emb, dst)


def complex_filename(
    dim: int = 16, n_iter: int = 10, lr: float = 0.1, margin: float = 1.0
) -> str:
    """Param-suffixed basename of the complex_aux parquet (shared with
    the kg_complex oracle SQL)."""
    return (
        f"complex_d{int(dim)}i{int(n_iter)}lr{int(lr * 1000)}"
        f"m{int(margin * 1000)}.parquet"
    )


def complex_aux(
    scale: str,
    dim: int = 16,
    n_iter: int = 10,
    lr: float = 0.1,
    margin: float = 1.0,
    salt: str = "complex",
    data_dir: str = testgen.DEFAULT_DATA_DIR,
) -> str:
    """Sequential numpy replica of operators/kgembed.train_complex over
    the sequential canonical fact set (the transe_aux pattern).  Trained
    on the SAME 80% 'transe'-salted hash split as the other two models so
    all three share one held-out protocol."""
    from relationextractionpipeline_spark.operators import kgembed

    small = os.path.join(data_dir, testgen.scale_dir(scale))
    dst = os.path.abspath(
        os.path.join(small, complex_filename(dim, n_iter, lr, margin))
    )
    if os.path.exists(dst):
        return dst
    facts = oracle_facts(scale, data_dir)
    is_test = facts.apply(
        lambda r: kgembed._md5_bucket(
            f"{r['s']}{kgembed.SEP}{r['p']}{kgembed.SEP}{r['o']}",
            "transe-split",
        )
        % 5
        == 0,
        axis=1,
    )
    emb = kgembed.complex_train_numpy(
        facts[~is_test],
        dim=dim, n_iter=n_iter, lr=lr, margin=margin, salt=salt,
    )
    emb["j"] = emb["j"].astype("int32")
    return _publish(emb, dst)


def transe_aux(
    scale: str,
    dim: int = 16,
    n_iter: int = 10,
    lr: float = 0.1,
    margin: float = 1.0,
    salt: str = "transe",
    data_dir: str = testgen.DEFAULT_DATA_DIR,
) -> str:
    """Sequential numpy replica of operators/kgembed.train_transe over the
    sequential canonical fact set: the kg_transe oracle reads this table
    directly and the kg_linkpred oracle re-derives filtered ranks from it
    relationally, so the DuckDB comparison isolates the DISTRIBUTED
    training machinery (role joins, gradient shuffles, checkpointed
    iteration, the two-phase entity indexing) against a single-threaded
    run of the same math contract (see the kgembed module docstring for
    the quantization rules that make the two runs bit-comparable).

    Output parquet: (kind 'ent'|'rel', id, j, w) round-6.  Param-suffixed
    filename — a default change can never silently serve embeddings
    trained under another configuration."""
    from relationextractionpipeline_spark.operators import kgembed

    small = os.path.join(data_dir, testgen.scale_dir(scale))
    dst = os.path.abspath(
        os.path.join(small, transe_filename(dim, n_iter, lr, margin))
    )
    if os.path.exists(dst):
        return dst
    facts = oracle_facts(scale, data_dir)
    # held-out protocol: train on the 80% hash split (the kg_linkpred
    # oracle SQL selects the complementary 20% as its test set)
    is_test = facts.apply(
        lambda r: kgembed._md5_bucket(
            f"{r['s']}{kgembed.SEP}{r['p']}{kgembed.SEP}{r['o']}",
            salt + "-split",
        )
        % 5
        == 0,
        axis=1,
    )
    emb = kgembed.transe_train_numpy(
        facts[~is_test],
        dim=dim, n_iter=n_iter, lr=lr, margin=margin, salt=salt,
    )
    emb["j"] = emb["j"].astype("int32")
    return _publish(emb, dst)
