"""KG-embedding training (operators/kgembed.py): distributed-vs-sequential
exact equality, partition invariance, the negative-sampling contract, unit
norms, and hand-checked filtered link-prediction ranks."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from relationextractionpipeline_spark.operators import kgembed


def _toy_facts_pdf():
    rows = []
    # structured toy KG: cities ↦ countries (functional), capitals,
    # a border chain, plus a couple of repeated-object facts
    for c in range(4):
        for k in range(3):
            rows.append((f"city{c}_{k}", "located_in", f"country{c}"))
        rows.append((f"country{c}", "capital", f"city{c}_0"))
    for c in range(3):
        rows.append((f"country{c}", "borders", f"country{c+1}"))
    return pd.DataFrame(rows, columns=["s", "p", "o"])


@pytest.fixture(scope="module")
def toy(spark):
    pdf = _toy_facts_pdf()
    return pdf, spark.createDataFrame(pdf)


def _collect_emb(res):
    ent = res["ent_emb"].toPandas().assign(kind="ent")
    rel = res["rel_emb"].toPandas().assign(kind="rel")
    return (
        pd.concat([ent, rel])[["kind", "id", "j", "w"]]
        .sort_values(["kind", "id", "j"])
        .reset_index(drop=True)
    )


def test_transe_matches_sequential_replica_exactly(spark, toy):
    """The fixed-point contract makes distributed training BIT-equal to
    the numpy replica — not merely close: every cross-row sum is int64,
    and rounding replicates Spark's shortest-repr HALF_UP."""
    pdf, facts = toy
    res = kgembed.train_transe(facts, dim=8, n_iter=5, lr=0.5, margin=1.0)
    a = _collect_emb(res)
    b = (
        kgembed.transe_train_numpy(pdf, dim=8, n_iter=5, lr=0.5, margin=1.0)
        .sort_values(["kind", "id", "j"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) == (res["n_entities"] + res["n_relations"]) * 8
    assert (a["w"].to_numpy() == b["w"].to_numpy()).all()


def test_transe_partition_invariance(spark, toy):
    """Identical parameters no matter how the fact table is partitioned —
    the distributed-determinism claim the integer gradient sums buy."""
    _, facts = toy
    outs = []
    for nparts in (1, 7):
        res = kgembed.train_transe(
            facts.repartition(nparts), dim=4, n_iter=3, lr=0.5
        )
        outs.append(_collect_emb(res))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_corrupted_tail_is_deterministic_and_never_true_tail(spark, toy):
    _, facts = toy
    f, eidx, n_ent = kgembed._facts_with_negatives(facts, "transe")
    rows = f.collect()
    assert len(rows) == facts.count()
    assert all(r["t2"] != r["o"] for r in rows)
    ents = {r["ent"] for r in eidx.collect()}
    assert all(r["t2"] in ents for r in rows)
    # pure function of the fact: a second call yields the same negatives
    f2, _, _ = kgembed._facts_with_negatives(facts, "transe")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, f2.collect()))


def test_entity_rows_unit_normalized(spark, toy):
    _, facts = toy
    res = kgembed.train_transe(facts, dim=8, n_iter=2, lr=0.5)
    norms = (
        res["ent_emb"]
        .groupBy("id")
        .agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
        .collect()
    )
    # round-6 components: |Σw² − 1| ≤ ~2·dim·1e-6
    assert all(abs(r["n2"] - 1.0) < 1e-4 for r in norms)


def test_linkpred_ranks_hand_checked(spark):
    """Tiny hand-built model: 1-d embeddings, distances and the filtered
    rank computed by hand."""
    # entities a,b,c at positions 0.1, 0.5, 0.9; relation r = +0.4
    ent = spark.createDataFrame(
        [("a", 0, 0.1), ("b", 0, 0.5), ("c", 0, 0.9)], "id string, j int, w double"
    )
    rel = spark.createDataFrame([("r", 0, 0.4)], "id string, j int, w double")
    facts_pdf = pd.DataFrame(
        [("a", "r", "b"), ("a", "r", "c"), ("b", "r", "c")],
        columns=["s", "p", "o"],
    )
    facts = spark.createDataFrame(facts_pdf)
    # evaluate EVERY fact (test_mod=1 selects all)
    out = {
        (r["s"], r["p"], r["o"]): r
        for r in kgembed.link_prediction_ranks(
            facts, ent, rel, test_mod=1
        ).collect()
    }
    assert len(out) == 3
    # fact (a, r, b): h+r = 0.5 → d(a)=0.16, d(b)=0, d(c)=0.16;
    # candidate c is another true tail of (a, r, ·) → filtered out;
    # true tail b has the strict minimum → rank 1
    assert out[("a", "r", "b")]["rank"] == 1
    # fact (a, r, c): d(c)=0.16 vs d(a)=0.16 (tie → id order: a < c wins),
    # b filtered (true fact) → rank 2
    assert out[("a", "r", "c")]["rank"] == 2
    # fact (b, r, c): h+r = 0.9 → d(c)=0 strict minimum → rank 1; hit10
    r = out[("b", "r", "c")]
    assert r["rank"] == 1 and r["hit10"] and r["inv_rank"] == 1.0


def test_training_improves_over_init(spark, toy):
    """Learning-capacity sanity: trained embeddings rank true tails
    better than the untrained init on the structured toy KG (in-sample —
    this asserts the loss moves the geometry, not generalization)."""
    pdf, facts = toy
    res = kgembed.train_transe(facts, dim=8, n_iter=8, lr=1.0)
    init_ent = kgembed.normalize_unit(
        kgembed.init_embeddings(
            res["ent_emb"].select("id").distinct(), "id", 8,
            6.0 / float(np.sqrt(8)), "transe-ent",
        )
    )
    init_rel = kgembed.init_embeddings(
        res["rel_emb"].select("id").distinct(), "id", 8,
        6.0 / float(np.sqrt(8)), "transe-rel",
    )
    def mrr(ent, rel):
        rows = kgembed.link_prediction_ranks(
            facts, ent, rel, test_mod=2
        ).collect()
        assert rows
        return sum(r["inv_rank"] for r in rows) / len(rows)

    assert mrr(res["ent_emb"], res["rel_emb"]) > mrr(init_ent, init_rel)


def test_fact_table_excludes_unlinked_and_dedups(spark):
    edges = spark.createDataFrame(
        [
            ("e1", "p1", "e2", "p1c"),
            ("e1", "p1", "e2", "p1c"),   # duplicate fact
            (None, "p1", "e2", "p1c"),   # unlinked subject
            ("e1", "p2", None, None),    # unlinked object
            ("e3", "p3", "e3", None),    # predicate outside the map
        ],
        "subj_canonical string, pred string, obj_canonical string,"
        " pred_canonical string",
    )
    got = sorted(map(tuple, kgembed.fact_table(edges).collect()))
    assert got == [("e1", "p1c", "e2"), ("e3", "p3", "e3")]


# ---------------------------------------------------------------------------
# DistMult (train_distmult / distmult_prediction_ranks)
# ---------------------------------------------------------------------------


def test_distmult_matches_sequential_replica_exactly(spark, toy):
    """The 1e-4 quantization + int64 trilinear contract makes distributed
    DistMult training BIT-equal to the numpy replica (quant ties included
    — both sides round HALF_UP on the same doubles)."""
    pdf, facts = toy
    res = kgembed.train_distmult(facts, dim=8, n_iter=5, lr=0.5, margin=1.0)
    a = _collect_emb(res)
    b = (
        kgembed.distmult_train_numpy(pdf, dim=8, n_iter=5, lr=0.5, margin=1.0)
        .sort_values(["kind", "id", "j"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) == (res["n_entities"] + res["n_relations"]) * 8
    assert (a["w"].to_numpy() == b["w"].to_numpy()).all()


def test_distmult_partition_invariance(spark, toy):
    _, facts = toy
    outs = []
    for nparts in (1, 7):
        res = kgembed.train_distmult(
            facts.repartition(nparts), dim=4, n_iter=3, lr=0.5
        )
        outs.append(_collect_emb(res))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_distmult_ranks_match_numpy_rescoring(spark, toy):
    """Distributed filtered ranks equal a numpy re-scoring of the same
    trained embeddings: ψ DESC, other-true-tail filtering, id tie-break."""
    pdf, facts = toy
    res = kgembed.train_distmult(facts, dim=8, n_iter=3, lr=0.5)
    ent = res["ent_emb"].toPandas()
    rel = res["rel_emb"].toPandas()
    got = {
        (r["s"], r["p"], r["o"]): int(r["rank"])
        for r in kgembed.distmult_prediction_ranks(
            facts, res["ent_emb"], res["rel_emb"], test_mod=3, salt="toy"
        ).collect()
    }
    assert got, "test split selected no facts — widen test_mod"

    def q4_table(df):
        out = {}
        for i, grp in df.groupby("id"):
            w = grp.sort_values("j")["w"].to_numpy()
            out[i] = kgembed._round_half_up(w * 1e4, 0).astype("int64")
        return out

    e4, r4 = q4_table(ent), q4_table(rel)
    known = set(map(tuple, pdf[["s", "p", "o"]].itertuples(index=False)))
    n_checked = 0
    for (s, p, o), rank in got.items():
        psi_t = int((e4[s] * r4[p] * e4[o]).sum())
        better = 0
        for e in e4:
            if e == o or (s, p, e) in known:
                continue
            psi = int((e4[s] * r4[p] * e4[e]).sum())
            if psi > psi_t or (psi == psi_t and e < o):
                better += 1
        assert rank == 1 + better
        n_checked += 1
    assert n_checked == len(got)


# ---------------------------------------------------------------------------
# entity_neighbors (embedding-space retrieval)
# ---------------------------------------------------------------------------


def test_entity_neighbors_matches_numpy_bruteforce(spark, toy):
    """Distributed top-k equals a numpy brute-force over the same trained
    table: exact-int squared L2, self excluded, neighbor-id tie-break."""
    pdf, facts = toy
    res = kgembed.train_transe(facts, dim=8, n_iter=3, lr=0.5)
    ent = res["ent_emb"].toPandas()
    queries = ["country0", "country1", "city2_1"]
    got = (
        kgembed.entity_neighbors(
            res["ent_emb"],
            spark.createDataFrame(pd.DataFrame({"entity": queries})),
            k=3,
        )
        .toPandas()
        .sort_values(["entity", "rank"])
        .reset_index(drop=True)
    )
    table = {
        i: kgembed._round_half_up(
            grp.sort_values("j")["w"].to_numpy() * 1e6, 0
        ).astype("int64")
        for i, grp in ent.groupby("id")
    }
    for qid in queries:
        dists = sorted(
            (int(((table[qid] - w) ** 2).sum()), e)
            for e, w in table.items()
            if e != qid
        )[:3]
        sub = got[got["entity"] == qid]
        assert list(sub["neighbor"]) == [e for _, e in dists]
        assert list(sub["d_sq"]) == [d for d, _ in dists]
        assert list(sub["rank"]) == [1, 2, 3]
    assert len(got) == 3 * len(queries)


def test_entity_neighbors_excludes_self_and_ranks_exact_ties(spark):
    """Two neighbors at the IDENTICAL integer distance rank by id."""
    rows = [
        ("q", 0, 0.0), ("q", 1, 0.0),
        ("b", 0, 1.0), ("b", 1, 0.0),
        ("a", 0, 0.0), ("a", 1, 1.0),   # same |q−a| as |q−b|
        ("z", 0, 2.0), ("z", 1, 2.0),
    ]
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "j", "w"]))
    got = (
        kgembed.entity_neighbors(
            emb,
            spark.createDataFrame(pd.DataFrame({"entity": ["q"]})),
            k=2,
        )
        .orderBy("rank")
        .collect()
    )
    assert [(r["neighbor"], r["rank"], r["d_sq"]) for r in got] == [
        ("a", 1, 10**12), ("b", 2, 10**12)
    ]


# ---------------------------------------------------------------------------
# ComplEx (train_complex / complex_prediction_ranks)
# ---------------------------------------------------------------------------


def test_complex_matches_sequential_replica_exactly(spark, toy):
    """The 2·dim long layout + int64 Re⟨h,r,conj(t)⟩ contract makes
    distributed ComplEx training BIT-equal to the numpy replica."""
    pdf, facts = toy
    res = kgembed.train_complex(facts, dim=4, n_iter=5, lr=0.5, margin=1.0)
    a = _collect_emb(res)
    b = (
        kgembed.complex_train_numpy(pdf, dim=4, n_iter=5, lr=0.5, margin=1.0)
        .sort_values(["kind", "id", "j"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) == (res["n_entities"] + res["n_relations"]) * 8
    assert (a["w"].to_numpy() == b["w"].to_numpy()).all()


def test_complex_partition_invariance(spark, toy):
    _, facts = toy
    outs = []
    for nparts in (1, 7):
        res = kgembed.train_complex(
            facts.repartition(nparts), dim=2, n_iter=3, lr=0.5
        )
        outs.append(_collect_emb(res))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_complex_models_asymmetry(spark):
    """The capability DistMult provably lacks: on a purely ANTISYMMETRIC
    relation (a→b present, b→a absent), trained ComplEx separates
    ψ(a,p,b) from ψ(b,p,a); DistMult CANNOT (its score is symmetric in
    (h,t) — equal by construction at every iteration)."""
    rows = [(f"n{i}", "next", f"n{(i+1) % 6}") for i in range(6)]
    pdf = pd.DataFrame(rows, columns=["s", "p", "o"])
    facts = spark.createDataFrame(pdf)

    def psi_table(train_fn, score):
        emb = train_fn(pdf, dim=4, n_iter=8, lr=0.5)
        ent = {
            i: kgembed._round_half_up(
                g.sort_values("j")["w"].to_numpy() * 1e4, 0
            ).astype("int64")
            for i, g in emb[emb["kind"] == "ent"].groupby("id")
        }
        rel = {
            i: kgembed._round_half_up(
                g.sort_values("j")["w"].to_numpy() * 1e4, 0
            ).astype("int64")
            for i, g in emb[emb["kind"] == "rel"].groupby("id")
        }
        return ent, rel, score

    def dm_score(h, r, t):
        return int((h * r * t).sum())

    def cx_score(h, r, t):
        d = len(h) // 2
        hr, hi = h[:d], h[d:]
        rr, ri = r[:d], r[d:]
        tr, ti = t[:d], t[d:]
        return int(
            (hr * rr * tr + hi * rr * ti + hr * ri * ti - hi * ri * tr).sum()
        )

    ent, rel, score = psi_table(kgembed.distmult_train_numpy, dm_score)
    dm_gaps = [
        score(ent[f"n{i}"], rel["next"], ent[f"n{(i+1)%6}"])
        - score(ent[f"n{(i+1)%6}"], rel["next"], ent[f"n{i}"])
        for i in range(6)
    ]
    assert all(g == 0 for g in dm_gaps)  # symmetric by construction

    ent, rel, score = psi_table(kgembed.complex_train_numpy, cx_score)
    cx_gaps = [
        score(ent[f"n{i}"], rel["next"], ent[f"n{(i+1)%6}"])
        - score(ent[f"n{(i+1)%6}"], rel["next"], ent[f"n{i}"])
        for i in range(6)
    ]
    assert any(g != 0 for g in cx_gaps)
    assert sum(1 for g in cx_gaps if g > 0) >= 4  # forward mostly wins

    # spark training agrees with the replica used above (cheap re-check
    # at the same tiny config)
    res = kgembed.train_complex(facts, dim=4, n_iter=8, lr=0.5)
    a = _collect_emb(res)
    b = (
        kgembed.complex_train_numpy(pdf, dim=4, n_iter=8, lr=0.5)
        .sort_values(["kind", "id", "j"])
        .reset_index(drop=True)
    )
    assert (a["w"].to_numpy() == b["w"].to_numpy()).all()


def test_complex_ranks_match_numpy_rescoring(spark, toy):
    """Distributed filtered ranks equal a numpy re-scoring of the same
    trained embeddings: ψ DESC, other-true-tail filtering, id tie-break."""
    pdf, facts = toy
    res = kgembed.train_complex(facts, dim=4, n_iter=3, lr=0.5)
    ent = res["ent_emb"].toPandas()
    got = {
        (r["s"], r["p"], r["o"]): int(r["rank"])
        for r in kgembed.complex_prediction_ranks(
            facts, res["ent_emb"], res["rel_emb"],
            dim=4, test_mod=3, salt="toy",
        ).collect()
    }
    assert got, "test split selected no facts — widen test_mod"
    rel = res["rel_emb"].toPandas()

    def q4_table(df):
        return {
            i: kgembed._round_half_up(
                g.sort_values("j")["w"].to_numpy() * 1e4, 0
            ).astype("int64")
            for i, g in df.groupby("id")
        }

    def cx(h, r, t, d=4):
        hr, hi, rr, ri = h[:d], h[d:], r[:d], r[d:]
        return int(
            (hr * rr * t[:d] + hi * rr * t[d:]
             + hr * ri * t[d:] - hi * ri * t[:d]).sum()
        )

    e4, r4 = q4_table(ent), q4_table(rel)
    known = set(map(tuple, pdf[["s", "p", "o"]].itertuples(index=False)))
    for (s, p, o), rank in got.items():
        psi_t = cx(e4[s], r4[p], e4[o])
        better = 0
        for e in e4:
            if e == o or (s, p, e) in known:
                continue
            psi = cx(e4[s], r4[p], e4[e])
            if psi > psi_t or (psi == psi_t and e < o):
                better += 1
        assert rank == 1 + better
