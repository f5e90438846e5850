"""Reference-semantics rules, shared by the Spark UDF stages and the oracle.

Every function here is a pure, deterministic re-expression (NOT a copy) of a
behavior of ``webersab/relationExtractionPipeline`` (read-only mirror at
``/root/reference``).  Citations point at the reference implementation so the
semantics can be checked line by line:

* sentence segmentation            — ``preprocessing.py:101-112`` (T1)
* BIO span grouping                — ``nel.py:179-208`` (W3)
* NER/noun overlap merge           — ``nel.py:129-148`` (J2)
* span map                         — ``nel.py:91-126`` (A3)
* entity-link record               — ``nel.py:286-315`` (T5 output shape)
* FIGER lookup default             — ``nel.py:302-306`` (J3)
* pair gate / predicate / negation — ``binary_relation.py:177-267`` (R1-R9)
* canonical strings                — ``binary_relation.py:105-132`` (P11-P14)

The reference walks an ``nltk.parse.DependencyGraph``; here a sentence is a
list of token dicts ``{id, form, lemma, upos, xpos, head, deprel}`` (1-based
ids, head 0 = root) and the "graph" is just head-pointer chasing — O(1) per
hop on a Python list, no graph library.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

from relationextractionpipeline_spark.functions import lexicon as _lx


def _ensure_sent(tokens) -> "_lx.Sent":
    """Normalize any token representation (Sent, list of dicts, list of
    pyspark Rows) to the struct-of-arrays Sent — the rule core indexes
    parallel lists instead of hashing per-token dicts on every access."""
    return tokens if isinstance(tokens, _lx.Sent) else _lx.as_soa(tokens)

# ---------------------------------------------------------------------------
# T1 — sentence segmentation (analog of NLTK Punkt, preprocessing.py:101-112)
# ---------------------------------------------------------------------------

# Abbreviation guard: don't split after these even though they end with '.'.
ABBREVIATIONS = frozenset(
    {"Dr.", "Mr.", "Ms.", "Prof.", "St.", "No.", "vs.", "e.g.", "i.e.", "etc."}
)

_SENT_BOUNDARY = re.compile(r"(?<=[.!?]) ")


def segment_line(line: str) -> List[str]:
    """Split one line into sentences on terminal punctuation + space.

    The abbreviation guard rejoins splits produced after a known
    abbreviation.  Deterministic analog of the Punkt call at
    ``preprocessing.py:111``.
    """
    parts = _SENT_BOUNDARY.split(line)
    out: List[str] = []
    for p in parts:
        if out and out[-1].split(" ")[-1] in ABBREVIATIONS:
            out[-1] = out[-1] + " " + p
        else:
            out.append(p)
    return [s for s in out if s.strip() != ""]


def segment_text(text: str) -> List[str]:
    """Full T1: split text into lines (P1, preprocessing.py:59), drop empty
    lines (P2, :110), segment each line (:111)."""
    segs: List[str] = []
    for line in text.split("\n"):
        if line != "":
            segs.extend(segment_line(line))
    return segs


def segment_text_with_lines(text: str) -> List[Tuple[int, str]]:
    """T1 keeping the line index — the lineage key that lets the per-turn
    text-equality invariant reconstruct multi-line turns exactly (the new
    engine's replacement for the reference's positional ``.lines`` sidecar,
    preprocessing.py:85-98)."""
    segs: List[Tuple[int, str]] = []
    for li, line in enumerate(text.split("\n")):
        if line != "":
            for s in segment_line(line):
                segs.append((li, s))
    return segs


# ---------------------------------------------------------------------------
# T4/W3/J2 — mention detection over a parsed token table
# ---------------------------------------------------------------------------


# first-word index cache per gazetteer dict: {first_token: lengths desc}.
# Avoids constructing candidate tuples at every token position — the
# inner-loop hotspot at scale.  Keyed by id() BUT the cache entry holds a
# strong reference to the keyed dict itself: a plain dict can't be weakly
# referenced, and without the strong ref a garbage-collected KB could let a
# NEW dict reuse the same id and silently serve a stale index.  Entries are
# verified by identity on every hit; the leak is bounded (a handful of
# broadcast dimension dicts per worker lifetime).
_GAZ_FIRST_CACHE: Dict[int, Tuple[Dict, Dict[str, List[int]]]] = {}


def _gaz_first(kb_index: Dict[Tuple[str, ...], str]) -> Dict[str, List[int]]:
    entry = _GAZ_FIRST_CACHE.get(id(kb_index))
    if entry is not None and entry[0] is kb_index:
        return entry[1]
    first: Dict[str, List[int]] = {}
    for tup in kb_index:
        first.setdefault(tup[0], []).append(len(tup))
    got = {w: sorted(set(ls), reverse=True) for w, ls in first.items()}
    _GAZ_FIRST_CACHE[id(kb_index)] = (kb_index, got)
    return got


def ner_tags(tokens, kb_index: Dict[Tuple[str, ...], str],
             max_len: int = 3) -> List[str]:
    """Named-entity tags per token: longest-match gazetteer over KB surfaces
    plus a capitalized-run fallback (deterministic Stanford-NER analog,
    ner.py:108-143).  Output alphabet mirrors nel.py: '0' or 'ner{k}' with k
    incrementing per new entity left-to-right (nel.py:204 boundary rule).
    """
    sent = _ensure_sent(tokens)
    first = _gaz_first(kb_index)
    forms = sent.forms
    upos = sent.upos
    n = len(forms)
    tags = ["0"] * n
    counter = 0

    def match_at(i: int) -> int:
        lengths = first.get(forms[i])
        if lengths:
            for length in lengths:
                if length <= n - i and tuple(forms[i : i + length]) in kb_index:
                    return length
        return 0

    i = 0
    while i < n:
        matched = match_at(i)
        if matched:
            counter += 1
            for k in range(matched):
                tags[i + k] = f"ner{counter}"
            i += matched
        elif upos[i] == "PROPN":
            counter += 1
            j = i
            while j < n and upos[j] == "PROPN" and tags[j] == "0":
                # stop the fallback run where a KB match would begin
                if j > i and match_at(j):
                    break
                tags[j] = f"ner{counter}"
                j += 1
            i = j
        else:
            i += 1
    return tags


def noun_tags(tokens) -> List[str]:
    """Common-entity tags: contiguous NOUN runs become one 'com{k}' span.

    Two-step analog of the reference: NOUN projection
    (helper_functions.py:33-48) then BIO grouping with identical tags
    (nel.py:179-208 — same non-O tag and no 'B-' prefix ⇒ contiguous run is a
    single span).
    """
    upos = _ensure_sent(tokens).upos
    tags = ["0"] * len(upos)
    counter = 0
    prev_noun = False
    for i, u in enumerate(upos):
        if u == "NOUN":
            if not prev_noun:
                counter += 1
            tags[i] = f"com{counter}"
            prev_noun = True
        else:
            prev_noun = False
    return tags


def merge_tags(ner: Sequence[str], com: Sequence[str]) -> List[str]:
    """J2 — overlap merge, NE wins; an overlapped common span is suppressed
    at *every* position it occurs (nel.py:129-148)."""
    overlaps = set()
    for i in range(len(ner)):
        if ner[i] != "0" and com[i] != "0":
            overlaps.add(com[i])
    merged: List[str] = []
    for i in range(len(ner)):
        if ner[i] != "0":
            merged.append(ner[i])
        elif com[i] != "0" and com[i] not in overlaps:
            merged.append(com[i])
        else:
            merged.append(ner[i])  # '0'
    return merged


def spans_from_tags(tokens, tags: Sequence[str]) -> List[Dict]:
    """A3 — fold the merged tag sequence into mention spans.

    Returns mentions ``{start_tok, end_tok, surface, tag, kind}`` with
    1-based token offsets (the reference keys its map by ``start+1``,
    nel.py:107) and ``kind = tag[0:3]`` ('ner'/'com', nel.py:308).
    """
    forms = _ensure_sent(tokens).forms
    mentions: List[Dict] = []
    cur_tag = "0"
    start = -1
    for i in range(len(tags) + 1):
        tag = tags[i] if i < len(tags) else "0"
        if tag != cur_tag:
            if cur_tag != "0":
                surface = " ".join(forms[start:i])
                mentions.append(
                    {
                        "start_tok": start + 1,
                        "end_tok": i,
                        "surface": surface,
                        "tag": cur_tag,
                        "kind": cur_tag[0:3],
                    }
                )
            cur_tag = tag
            start = i
    return mentions


def detect_mentions(tokens,
                    kb_index: Dict[Tuple[str, ...], str],
                    include_common: bool = True,
                    fuse_adjacent: bool = False) -> List[Dict]:
    """T4 end-to-end: NER analog + noun projection + merge + span fold.

    ``include_common=False`` selects the reference's alternative NEL-over-
    NER-only path (``ner_nel.py:31-44`` — no common-entity merge);
    ``fuse_adjacent=True`` mirrors that path's fusing of adjacent NE spans
    into one mention (``ner_nel.py:139-142``).
    """
    tokens = _ensure_sent(tokens)
    nt = ner_tags(tokens, kb_index)
    if fuse_adjacent:
        fused: List[str] = []
        prev = "0"
        for tag in nt:
            if tag != "0" and prev != "0":
                tag = prev  # adjacent NE spans merge
            fused.append(tag)
            prev = tag
        nt = fused
    if include_common:
        merged = merge_tags(nt, noun_tags(tokens))
    else:
        merged = list(nt)
    return spans_from_tags(tokens, merged)


# ---------------------------------------------------------------------------
# T5/J3 — entity linking (AGDISTIS analog + FIGER map)
# ---------------------------------------------------------------------------

NOT_IN_WIKI_PREFIX = "http://aksw.org/notInWiki/"


def link_mention(surface: str,
                 kb: Dict[str, Tuple[str, float]],
                 figer_map: Dict[str, str]) -> Tuple[str, str]:
    """Link one mention surface to (url, figer_type).

    Candidate generation = exact surface lookup in the broadcast KB dict; the
    best candidate is the KB's highest-prior entry (the dict stores the
    winner).  Unknown surfaces get the notInWiki URL AGDISTIS emits, which
    routes P11 through the surface-form branch (binary_relation.py:115-122).
    FIGER default: missing or empty mapping ⇒ 'none' (nel.py:302-306).
    """
    hit = kb.get(surface)
    if hit is None:
        url = NOT_IN_WIKI_PREFIX + surface.replace(" ", "_")
    else:
        url = hit[0]
    figer = figer_map.get(url, "none")
    if figer == "":
        figer = "none"
    return url, figer


# ---------------------------------------------------------------------------
# R1-R9 — relation extraction over (tokens, linked mentions)
# ---------------------------------------------------------------------------


def _deps(sent) -> Dict[int, Dict[str, List[int]]]:
    """head-id -> deprel -> [child ids] (the reference's node['deps'])."""
    deps: Dict[int, Dict[str, List[int]]] = {}
    heads = sent.heads
    deprels = sent.deprels
    for i in range(len(heads)):
        deps.setdefault(heads[i], {}).setdefault(deprels[i], []).append(i + 1)
    return deps


def _negation(sent, deps, i: int, neg: bool) -> bool:
    """R7 — recursive advmod descent looking for xpos PTKNEG
    (binary_relation.py:177-190)."""
    if i < 1 or i > len(sent.forms):
        return neg
    children = deps.get(i, {}).get("advmod", [])
    for n_ in children:
        if sent.xpos[n_ - 1] == "PTKNEG":
            neg = True
    for n_ in children:
        neg = _negation(sent, deps, n_, neg)
    return neg


def _xcomp_modifiers(sent, deps, i: int, mods: List[int]) -> List[int]:
    """R5 — recursive xcomp descent, skipping PTKNEG (binary_relation.py:193-204)."""
    for n_ in deps.get(i, {}).get("xcomp", []):
        if sent.xpos[n_ - 1] != "PTKNEG":
            mods.append(n_)
            mods = _xcomp_modifiers(sent, deps, n_, mods)
    return mods


def _predicate(sent, deps, ent1: Dict, ent2: Dict) -> Tuple[str, int, bool]:
    """R1-R6 + R8 detect — predicate linking two mentions
    (binary_relation.py:236-267)."""
    pred_string = ""
    pred_index = -1
    passive = False
    i1 = int(ent1["start_tok"]) - 1
    i2 = int(ent2["start_tok"]) - 1
    ent1rel = sent.deprels[i1]
    ent2rel = sent.deprels[i2]
    if ent1rel in ("nsubj", "nsubj:pass", "dep") and ent2rel in ("obj", "obl", "dep"):
        if ent1rel == "nsubj:pass":
            passive = True
        ent1head = sent.heads[i1]
        ent2head = sent.heads[i2]
        if ent2head >= 1:
            ent2headhead = sent.heads[ent2head - 1]
            ent2headrel = sent.deprels[ent2head - 1]
        else:
            ent2headhead, ent2headrel = -1, ""
        if ent1head == ent2head or (ent2headhead == ent1head and ent2headrel == "xcomp"):
            if ent1head >= 1:
                pred_string = sent.lemmas[ent1head - 1]
                pred_index = ent1head
                # R4 — particle verbs
                for prt in deps.get(ent1head, {}).get("compound:prt", []):
                    pred_string += "_" + sent.lemmas[prt - 1]
                # R5 — xcomp modifiers
                for mod in _xcomp_modifiers(sent, deps, pred_index, []):
                    pred_string += "." + sent.lemmas[mod - 1]
                # R6 — prepositions (case children of ent2's start token)
                for prep in deps.get(i2 + 1, {}).get("case", []):
                    pred_string += "." + sent.lemmas[prep - 1]
    return pred_string, pred_index, passive


# P11 — canonical entity string (binary_relation.py:115-122)
def canonical_entity_string(url: str, surface: str) -> str:
    if "notInWiki" in url:
        return surface.replace(" ", "_")
    return url.split("/")[-1]


# P12 — FIGER normalize (binary_relation.py:123-124)
def figer_normalize(figer: str) -> str:
    if figer == "none":
        return "#thing"
    return "#" + figer.split("/")[1]


# P14 — E/G kind flag (binary_relation.py:113-114)
def kind_flag(kind: str) -> str:
    return "E" if kind == "ner" else "G"


def render_rel_string(subj: str, obj: str, pred: str, subj_figer: str,
                      obj_figer: str, subj_kind: str, obj_kind: str,
                      neg: bool, pred_tok: int) -> str:
    """P13/R9 — the reference's serialized relation
    (binary_relation.py:125-128): arg-1 name drops the '.'-suffixes, arg-2
    keeps them."""
    negs = "NEG__" if neg else ""
    predicate = pred.split(".")[0] + ".1," + pred + ".2"
    return "({}({})::{}::{}::{}::{}::{}{}::{}::{})".format(
        negs, predicate, subj, obj, subj_figer, obj_figer,
        subj_kind, obj_kind, "0", str(pred_tok),
    )


def render_human_string(subj: str, obj: str, pred: str, subj_figer: str,
                        obj_figer: str, neg: bool, passive: bool) -> str:
    """S13 — the reference's human-readable relation string,
    ``format_relation_string`` (binary_relation.py:270-289), byte-exact:
    unlike the JSON form (P13), BOTH argument names keep the '.'-suffixes,
    the figer types sit directly after the parenthesized predicate with no
    '::' separator, there is no outer paren wrap, and the string carries a
    ``|||(passive: True/False)`` suffix.  Called with the already-swapped
    entity order (the reference formats after the R8 swap)."""
    negation = "NEG__" if neg else ""
    predicate = pred + ".1," + pred + ".2"
    return "{}({}){}{}::{}::{}|||(passive: {})".format(
        negation, predicate, subj_figer, obj_figer, subj, obj, str(passive)
    )


def extract_relations(
    tokens, mentions: Sequence[Dict], render: bool = True
) -> List[Dict]:
    """J6 + P8-P10 + R1-R9: emit triples for one sentence.

    ``mentions`` carry link fields ``url`` and ``figer``.  Mirrors
    ``binary_relation.py:207-233``: ordered pair product over mentions, com-com
    pairs dropped (P8), self pairs dropped (P9), empty predicates dropped
    (P10), passive pairs swapped (R8).

    ``render=False`` omits the serialized ``rel``/``rel_human`` strings —
    they are pure functions of the other emitted fields, so the Spark
    operators render them as NATIVE Column expressions instead
    (operators/triples.with_rel_strings: JVM codegen, pruned away by
    Catalyst for consumers that never read them).  The default True keeps
    the sequential oracle and the rule fixtures rendering in Python — the
    byte-equality of the two renderers is then part of what the kg_triples
    hash gate verifies.
    """
    sent = _ensure_sent(tokens)
    deps = _deps(sent)
    out: List[Dict] = []
    for a in range(len(mentions)):
        for b in range(len(mentions)):
            if a == b:
                continue
            e1, e2 = mentions[a], mentions[b]
            if e1["kind"] == "com" and e2["kind"] == "com":
                continue
            pred_string, pred_index, passive = _predicate(sent, deps, e1, e2)
            negation = _negation(sent, deps, pred_index, False)
            if passive:
                e1, e2 = e2, e1
            if pred_string != "":
                subj = canonical_entity_string(str(e1["url"]), str(e1["surface"]))
                obj = canonical_entity_string(str(e2["url"]), str(e2["surface"]))
                subj_figer = figer_normalize(str(e1["figer"]))
                obj_figer = figer_normalize(str(e2["figer"]))
                subj_kind = kind_flag(str(e1["kind"]))
                obj_kind = kind_flag(str(e2["kind"]))
                trip = {
                    "subj": subj,
                    "pred": pred_string,
                    "obj": obj,
                    "subj_type": subj_figer,
                    "obj_type": obj_figer,
                    "subj_kind": subj_kind,
                    "obj_kind": obj_kind,
                    "neg": bool(negation),
                    "passive": bool(passive),
                    "pred_tok": int(pred_index),
                    # emission index within the sentence = the reference's
                    # pair-product order (binary_relation.py:207-233);
                    # sinks sort by it for byte-level output parity
                    "rel_idx": len(out),
                }
                if render:
                    trip["rel"] = render_rel_string(
                        subj, obj, pred_string, subj_figer, obj_figer,
                        subj_kind, obj_kind, negation, pred_index,
                    )
                    trip["rel_human"] = render_human_string(
                        subj, obj, pred_string, subj_figer, obj_figer,
                        negation, passive,
                    )
                out.append(trip)
    return out


# ---------------------------------------------------------------------------
# P16 — sentence reconstruction invariant helper (binary_relation.py:164-174)
# ---------------------------------------------------------------------------


def reconstruct_sentence(tokens: Sequence[Dict]) -> str:
    return " ".join(str(t["form"]) for t in tokens)


def detokenize(tokens: Sequence[Dict]) -> str:
    """Inverse of the tokenizer for the closed grammar: space-join, but
    terminal punctuation reattaches to the preceding token.  Together with
    line/sentence keys this makes per-turn text reconstruction exact — the
    per-turn text-equality invariant (BASELINE.md; analog of
    binary_relation.py:164-174).

    NOTE: operates on *syntax* tokens; for MWT-bearing sentences (P6) text
    equality holds only over the surface list — use ``detokenize_surface``.
    """
    parts: List[str] = []
    for t in tokens:
        form = str(t["form"])
        # only TERMINAL punctuation reattaches — the tokenizer only ever
        # splits terminals, so mid-sentence punctuation (commas) keeps its
        # space and the round trip stays exact
        if t["upos"] == "PUNCT" and form in (".", "!", "?") and parts:
            parts[-1] = parts[-1] + form
        else:
            parts.append(form)
    return " ".join(parts)


def detokenize_surface(forms: Sequence[str]) -> str:
    """P6/P16 — reconstruct sentence text from SURFACE forms (contractions
    intact), the list the text-equality invariant is defined over (the
    reference restores these via unstable_parser_post_proc.py:11-41 so its
    output files remain surface-faithful)."""
    from relationextractionpipeline_spark.functions import lexicon as _lx

    parts: List[str] = []
    for form in forms:
        form = str(form)
        if form in _lx.SENT_TERMINALS and parts:
            parts[-1] = parts[-1] + form
        else:
            parts.append(form)
    return " ".join(parts)
