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
