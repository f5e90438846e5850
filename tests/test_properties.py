"""Property-based tests (hypothesis) for the sequence-sensitive pure rules:
BIO span grouping, overlap merge, spans↔tags round trip, segmentation
reconstruction, minhash similarity monotonicity."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from relationextractionpipeline_spark.functions import rules
from relationextractionpipeline_spark.operators import sketches

# token streams over a tiny tag alphabet
tag_seq = st.lists(
    st.sampled_from(["0", "ner1", "ner2", "com1", "com2"]), min_size=0, max_size=30
)


def _toks(n):
    return [
        {"id": i + 1, "form": f"w{i}", "lemma": f"w{i}", "upos": "NOUN",
         "xpos": "NN", "head": 0, "deprel": "dep"}
        for i in range(n)
    ]


@given(tag_seq)
@settings(max_examples=200, deadline=None)
def test_spans_partition_nonzero_positions(tags):
    """Every non-'0' position belongs to exactly one span; spans are
    contiguous, ordered, 1-based, and carry the joined surface."""
    toks = _toks(len(tags))
    spans = rules.spans_from_tags(toks, tags)
    covered = set()
    prev_end = 0
    for m in spans:
        assert 1 <= m["start_tok"] <= m["end_tok"] <= len(tags)
        assert m["start_tok"] > prev_end  # ordered, non-overlapping
        prev_end = m["end_tok"]
        for p in range(m["start_tok"], m["end_tok"] + 1):
            assert tags[p - 1] == m["tag"]
            covered.add(p)
        # boundary: same tag does not continue on either side
        if m["start_tok"] >= 2:
            assert tags[m["start_tok"] - 2] != m["tag"]
        if m["end_tok"] < len(tags):
            assert tags[m["end_tok"]] != m["tag"]
    assert covered == {i + 1 for i, t in enumerate(tags) if t != "0"}


@given(
    st.integers(1, 25).flatmap(
        lambda n: st.tuples(
            st.lists(st.sampled_from(["0", "ner1", "ner2"]), min_size=n, max_size=n),
            st.lists(st.sampled_from(["0", "com1", "com2"]), min_size=n, max_size=n),
        )
    )
)
@settings(max_examples=200, deadline=None)
def test_merge_invariants(pair):
    """J2 merge: NE positions always win; a com tag overlapping any NE
    position disappears everywhere; other com tags survive verbatim."""
    ner, com = pair
    merged = rules.merge_tags(ner, com)
    overlapped = {com[i] for i in range(len(ner)) if ner[i] != "0" and com[i] != "0"}
    for i in range(len(ner)):
        if ner[i] != "0":
            assert merged[i] == ner[i]
        elif com[i] != "0" and com[i] not in overlapped:
            assert merged[i] == com[i]
        else:
            assert merged[i] == "0"


@given(st.text(alphabet=st.characters(blacklist_characters="\r"), max_size=200))
@settings(max_examples=200, deadline=None)
def test_segmentation_preserves_all_nonspace_content(text):
    """T1 never invents or drops non-whitespace characters."""
    segs = rules.segment_text(text)
    def squash(s):
        return "".join(s.split())
    assert squash("".join(segs)) == squash(text)


@given(st.text(min_size=0, max_size=80), st.text(min_size=0, max_size=80))
@settings(max_examples=100, deadline=None)
def test_minhash_identical_iff_equal_shingles(a, b):
    sa = sketches.char_shingles(a, 3)
    sb = sketches.char_shingles(b, 3)
    ma = sketches.minhash_signature(sa, 32)
    mb = sketches.minhash_signature(sb, 32)
    if set(sa) == set(sb):
        assert ma == mb
    # estimator bounded in [0,1] and symmetric
    est = sum(x == y for x, y in zip(ma, mb)) / 32
    assert 0.0 <= est <= 1.0


# --- struct-of-arrays token representation (round 3) -------------------------

_token_dicts = st.lists(
    st.builds(
        lambda i, form, upos, head, rel: {
            "id": i, "form": form, "lemma": form.lower(), "upos": upos,
            "xpos": "NN", "head": head, "deprel": rel,
        },
        st.integers(1, 30),
        st.text(min_size=1, max_size=8),
        st.sampled_from(["NOUN", "PROPN", "VERB", "ADP"]),
        st.integers(0, 30),
        st.sampled_from(["dep", "nsubj", "obj", "root"]),
    ),
    min_size=0, max_size=20,
)


@given(_token_dicts)
@settings(max_examples=200, deadline=None)
def test_soa_roundtrip_preserves_token_fields(tokens):
    """sent_to_dicts(as_soa(tokens)) preserves every rule-visible field;
    ids renumber positionally (1-based), which is what every consumer
    assumes (the dict 'id' field is redundant with position by contract)."""
    from relationextractionpipeline_spark.functions import lexicon as lx

    sent = lx.as_soa(tokens)
    back = lx.sent_to_dicts(sent)
    assert len(back) == len(tokens)
    for i, (a, b) in enumerate(zip(tokens, back)):
        assert b["id"] == i + 1
        for f in ("form", "lemma", "upos", "xpos", "head", "deprel"):
            assert b[f] == a[f]


@given(st.integers(2, 10), st.integers(1, 20), st.integers(0, 2**32 - 1))
@settings(max_examples=100, deadline=None)
def test_multiprobe_buckets_distinct_and_extend_base(n_planes, n_probes, seed_vec):
    """Probe bucket 0 IS the single-table bucket (same planes); all probes
    are distinct ≤3-bit perturbations within range, lowest-total-margin
    first — so probe 1 is always the single min-|margin| bit flip (any
    multi-bit set's margin sum is ≥ the smallest single margin)."""
    import numpy as np

    from relationextractionpipeline_spark.operators import similarity

    rng = np.random.RandomState(seed_vec % (2**31 - 1))
    mat = rng.standard_normal((5, 16))
    base = similarity.hyperplane_buckets(mat, n_planes, 16)
    probes = similarity.hyperplane_probe_buckets(mat, n_planes, 16, n_probes)
    masks, _ind = similarity._probe_flip_sets(n_planes)
    eff = min(n_probes, len(masks))  # n_probes clamps to enumerable sets
    assert probes.shape == (5, eff + 1)
    assert (probes[:, 0] == base).all()
    planes = np.random.RandomState(42).standard_normal((16, n_planes))
    margins = np.abs(mat @ planes)
    for i, row in enumerate(probes):
        assert len(set(row.tolist())) == eff + 1  # all distinct
        assert all(0 <= b < 2**n_planes for b in row.tolist())
        for p in row[1:]:
            flips = bin(int(p) ^ int(row[0])).count("1")
            assert 1 <= flips <= 3
        # first perturbation = flip of the single lowest-margin plane
        jmin = int(np.argmin(margins[i]))
        assert int(row[1]) == int(row[0]) ^ (1 << jmin)


# ---------------------------------------------------------------------------
# minhash_plan_for_threshold (S-curve band planner — pure driver arithmetic)
# ---------------------------------------------------------------------------


def test_minhash_plan_midpoint_tracks_threshold():
    from relationextractionpipeline_spark.operators import sketches

    mids = [
        sketches.minhash_plan_for_threshold(t, 128)["threshold_50"]
        for t in (0.3, 0.5, 0.7, 0.9)
    ]
    # midpoints are monotone in the target and land near it
    assert mids == sorted(mids)
    for t, m in zip((0.3, 0.5, 0.7, 0.9), mids):
        assert abs(m - t) < 0.1, (t, m)


def test_minhash_plan_respects_budget_and_is_deterministic():
    from relationextractionpipeline_spark.operators import sketches

    p1 = sketches.minhash_plan_for_threshold(0.8, 64)
    p2 = sketches.minhash_plan_for_threshold(0.8, 64)
    assert p1 == p2
    assert p1["bands"] * p1["rows"] == p1["n_used"] <= 64
    assert p1["bands"] >= 1 and p1["rows"] >= 1


def test_minhash_plan_fp_weight_biases_toward_precision():
    from relationextractionpipeline_spark.operators import sketches

    neutral = sketches.minhash_plan_for_threshold(0.8, 128)
    precise = sketches.minhash_plan_for_threshold(0.8, 128, fp_weight=5.0)
    assert precise["fp_mass"] <= neutral["fp_mass"]
    assert precise["threshold_50"] >= neutral["threshold_50"]


def test_minhash_plan_matches_empirical_candidate_rate():
    """The closed-form P(s) the planner integrates is the TRUE banding
    probability: empirical agreement of real MinHash signatures on pairs
    of known Jaccard similarity matches 1−(1−s^r)^b."""
    from relationextractionpipeline_spark.operators import sketches

    plan = sketches.minhash_plan_for_threshold(0.5, 32)
    b, r = plan["bands"], plan["rows"]
    n = b * r
    import zlib

    hits = 0
    trials = 300
    # pairs of exact Jaccard 0.5: A = base[:50], B = base[:30]+base[50:60]
    # → |A∩B| = 30, |A∪B| = 60
    for i in range(trials):
        base = [f"tok{i}_{j}" for j in range(60)]
        a_set, b_set = set(base[:50]), set(base[:30]) | set(base[50:60])
        ai = [zlib.crc32(f"{x}:{i}".encode()) for x in a_set]
        bi = [zlib.crc32(f"{x}:{i}".encode()) for x in b_set]
        sa = sketches.minhash_signature(ai, n, seed=7 + i)
        sb = sketches.minhash_signature(bi, n, seed=7 + i)
        if any(
            sa[k * r:(k + 1) * r] == sb[k * r:(k + 1) * r]
            for k in range(b)
        ):
            hits += 1
    s = 30 / 60
    p_expect = 1 - (1 - s**r) ** b
    p_got = hits / trials
    assert abs(p_got - p_expect) < 0.12, (p_got, p_expect, s, b, r)
