"""Deterministic synthetic-data generators (FIXTURES.md).

Produces, at several scales, the three tables the KG pipeline consumes:

* ``transcripts(conv_id, turn_idx, role, text, tool, ts)`` — the primary
  input shape from BASELINE.json ``input_hint``; power-law conversation
  lengths (the skew fixture), shuffled row order to exercise window-ordered
  reassembly, seeded RNG (42), no wall clock.
* ``entity_kb(surface, url, prior)`` — candidate dictionary for linking
  (broadcast dim; analog of the AGDISTIS service the reference POSTs to,
  ``agdistis.py:36-53``).
* ``figer_map(url, figer_type)`` — type dimension (analog of the gzip JSON
  DBPedia→FIGER map, ``nel.py:211-219``).

Sentence text is drawn from the closed template grammar in
``functions/lexicon.py`` — one template per reference rule (SURVEY.md §2.8),
so expected triples are computable by construction via the shared rules.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta
from typing import Dict, List, Tuple

import pandas as pd

from relationextractionpipeline_spark.functions import lexicon as lx

SEED = 42
BASE_TS = datetime(2026, 1, 1, 0, 0, 0)

SCALES = {"tiny": 20, "small": 2000, "bench": 30000, "scaling": 120000}

# bump whenever the grammar/generator changes: cached parquet is valid for a
# given generator version only, and the cache key is the directory name
# v4: +ambiguous aliases (Franklin/Turing/Hamilton), 16-entry MWT inventory,
#     _xcomp_deep / _neg_xcomp / _neg_under_xcomp adversarial templates
# v5: GEN_CONTRACTIONS widened to the full 28-contraction parser inventory
#     (every MWT the parser handles now occurs in generated corpora)
GEN_VERSION = 5


def scale_dir(scale: str) -> str:
    return f"{scale}_v{GEN_VERSION}"

WIKI_URL_PREFIX = "http://synthetic.kb/resource/"
NOT_IN_WIKI_PREFIX = "http://aksw.org/notInWiki/"

TOOL_NAMES = ["search", "calculator", "browser", "python"]


def entity_url(canonical: str, in_wiki: bool) -> str:
    slug = canonical.replace(" ", "_")
    return (WIKI_URL_PREFIX if in_wiki else NOT_IN_WIKI_PREFIX) + slug


def gen_entity_kb() -> pd.DataFrame:
    """One row per (surface, url); prior is a deterministic rank so the link
    scorer has something to maximize."""
    rows: List[Tuple[str, str, float]] = []
    for i, (name, aliases, _figer, in_wiki) in enumerate(lx.ENTITIES):
        url = entity_url(name, in_wiki)
        rows.append((name, url, 1.0 - i * 0.001))
        for j, a in enumerate(aliases):
            rows.append((a, url, 0.9 - i * 0.001 - j * 0.01))
    return pd.DataFrame(rows, columns=["surface", "url", "prior"])


def gen_figer_map() -> pd.DataFrame:
    """url -> figer type; ~20% of typed urls deliberately absent and a few
    mapped to '' to exercise the 'none'→'#thing' default paths
    (nel.py:302-306, binary_relation.py:123-124)."""
    rows: List[Tuple[str, str]] = []
    for i, (name, _aliases, figer, in_wiki) in enumerate(lx.ENTITIES):
        url = entity_url(name, in_wiki)
        if figer == "":
            if i % 2 == 0:
                rows.append((url, ""))  # present-but-empty ⇒ 'none'
            continue
        if i % 5 == 3:
            continue  # absent ⇒ 'none'
        rows.append((url, figer))
    return pd.DataFrame(rows, columns=["url", "figer_type"])


# ---------------------------------------------------------------------------
# sentence templates (FIXTURES.md §3) — each exercises one reference rule
# ---------------------------------------------------------------------------


def _ent(rng: random.Random) -> str:
    name, aliases, _f, _w = rng.choice(lx.ENTITIES)
    forms = [name] + aliases
    return rng.choice(forms)


def _com(rng: random.Random) -> str:
    return "the " + rng.choice(lx.COMMON_NOUNS)


def _arg(rng: random.Random) -> str:
    return _ent(rng) if rng.random() < 0.7 else _com(rng)


def _svo(rng):
    v = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return f"{_ent(rng)} {v['past']} {_arg(rng)}."


def _particle(rng):
    lemma = rng.choice(lx.PARTICLE_VERBS)
    v = lx.VERBS[lemma]
    prt = rng.choice(lx.PARTICLES)
    return f"{_ent(rng)} {v['past']} {_arg(rng)} {prt}."


def _xcomp1(rng):
    v1 = lx.VERBS[rng.choice(lx.XCOMP_VERBS)]
    v2 = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return f"{_ent(rng)} {v1['past']} to {v2['base']} {_arg(rng)}."


def _xcomp2(rng):  # depth-2 chain: must emit nothing (R2 single-hop gate)
    v1 = lx.VERBS[rng.choice(lx.XCOMP_VERBS)]
    v2 = lx.VERBS[rng.choice(lx.XCOMP_VERBS)]
    v3 = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return f"{_ent(rng)} {v1['past']} to {v2['base']} to {v3['base']} {_arg(rng)}."


def _prep(rng):
    v = lx.VERBS[rng.choice(lx.PREP_VERBS)]
    p = rng.choice(lx.PREPOSITIONS)
    return f"{_ent(rng)} {v['past']} {p} {_arg(rng)}."


def _neg(rng):
    v = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return f"{_ent(rng)} not {v['base']} {_arg(rng)}."


def _neg_nested(rng):
    v = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    adv = rng.choice(lx.ADVERBS)
    return f"{_ent(rng)} {adv} not {v['base']} {_arg(rng)}."


def _passive(rng):
    v = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return f"{_arg(rng)} was {v['part']} by {_ent(rng)}."


def _comcom(rng):  # P8: both common ⇒ must emit nothing
    v = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return f"{_com(rng)} {v['past']} {_com(rng)}."


def _entity_free(rng):  # P7/P10: must emit nothing
    v = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    adv = rng.choice(lx.ADVERBS)
    return f"{adv} {v['past']}."


def _multi(rng):  # 3 mentions ⇒ ordered-pair product (J6)
    v = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    p = rng.choice(lx.PREPOSITIONS)
    return f"{_ent(rng)} {v['past']} {_ent(rng)} {p} {_arg(rng)}."


def _adjacent(rng):  # BIO boundary between two KB entities (W3, nel.py:204)
    v = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return f"{_ent(rng)} {_ent(rng)} {v['past']} {_arg(rng)}."


# the GENERATOR's contraction pool — an explicit frozen list so corpus
# bytes are a function of GEN_VERSION alone.  The PARSER's inventory
# (lexicon.CONTRACTIONS) may grow without touching generated text; sampling
# lexicon.CONTRACTIONS directly here silently changed v4 corpora when the
# inventory widened (caught by the oracle-vs-Spark equality tests).  Widen
# THIS list only together with a GEN_VERSION bump.
#
# v5: the full 28-contraction parser inventory (v4 froze the original 16)
# — every contraction the MWT machinery handles now occurs in generated
# corpora, so the surface≠syntax split is corpus-gated end-to-end
# (kg_triples hash + the P/R gate), not just unit-fixtured.
GEN_CONTRACTIONS = tuple(sorted((
    "am", "ans", "aufm", "aufn", "aufs", "ausm", "beim", "durchn",
    "durchs", "fürn", "fürs", "gegens", "hinterm", "hinters", "im", "ins",
    "ums", "unterm", "untern", "unters", "vom", "vorm", "vors", "zum",
    "zur", "überm", "übern", "übers",
)))


def _mwt(rng):
    """P6 fixture: a German preposition-article contraction (``im``/``zum``)
    — ONE surface token that the parser must expand to two syntax tokens
    and reconstruction must restore (unstable_parser_post_proc.py:11-41)."""
    v = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    c = rng.choice(GEN_CONTRACTIONS)
    return f"{_ent(rng)} {v['past']} {c} {rng.choice(lx.COMMON_NOUNS)}."


def _conj(rng):
    """Coordination fixture: the second conjunct's object must NOT pair with
    the subject (R2 requires a shared head or an xcomp bridge; `conj` is
    neither — the reference has the same blind spot, binary_relation.py:252),
    so exactly one triple comes from the first clause."""
    v1 = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    v2 = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return (
        f"{_ent(rng)} {v1['past']} {_arg(rng)} and {v2['past']} {_arg(rng)}."
    )


def _relative(rng):
    """Relative-clause fixture: 'E , who V1 X , V2 Y .' — the embedded
    clause extracts (E, V1, X) because the head entity is nsubj of the first
    verb; the matrix clause (E, V2, Y) is invisible to R2 (`conj` head), as
    in the reference."""
    v1 = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    v2 = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return (
        f"{_ent(rng)} , who {v1['past']} {_arg(rng)} , "
        f"{v2['past']} {_arg(rng)}."
    )


def _xcomp_deep(rng):
    """R5 depth-≥3 fixture: the object attaches to the FIRST verb (it sits
    before the xcomp chain), so the pair gate passes with ent1head==ent2head
    and the recursive xcomp descent appends every chained verb — pred is
    ``v1.v2.v3[.v4]`` (binary_relation.py:193-204 recursion depth ≥ 2)."""
    v1 = lx.VERBS[rng.choice(lx.XCOMP_VERBS)]
    chain = [lx.VERBS[rng.choice(lx.XCOMP_VERBS)]
             for _ in range(rng.randint(2, 3))]
    tail = " ".join(f"to {v['base']}" for v in chain)
    return f"{_ent(rng)} {v1['past']} {_arg(rng)} {tail}."


def _neg_xcomp(rng):
    """R7×R5 interaction fixture: negation on the MATRIX verb of an xcomp
    bridge — emits ``NEG__`` with pred ``v1.v2`` (the advmod descent starts
    at the predicate index, binary_relation.py:177-190, and the xcomp hop
    passes the pair gate, :252)."""
    v1 = lx.VERBS[rng.choice(lx.XCOMP_VERBS)]
    v2 = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return f"{_ent(rng)} not {v1['base']} to {v2['base']} {_arg(rng)}."


def _neg_under_xcomp(rng):
    """Parser-analog boundary fixture: ``to not V`` — the negation particle
    sits between the marker and the verb, so the analog parser attaches the
    verb as ``conj`` (not xcomp) and the pair gate rejects the pair: must
    emit NOTHING.  Documents where the deterministic parser's xcomp
    detection ends; the shared oracle agrees by construction."""
    v1 = lx.VERBS[rng.choice(lx.XCOMP_VERBS)]
    v2 = lx.VERBS[rng.choice(lx.PLAIN_VERBS)]
    return f"{_ent(rng)} {v1['past']} to not {v2['base']} {_arg(rng)}."


TEMPLATES = [
    (_svo, 22), (_particle, 10), (_xcomp1, 10), (_xcomp2, 4), (_prep, 10),
    (_neg, 8), (_neg_nested, 4), (_passive, 10), (_comcom, 6),
    (_entity_free, 6), (_multi, 6), (_adjacent, 4), (_mwt, 5),
    (_conj, 5), (_relative, 4), (_xcomp_deep, 4), (_neg_xcomp, 4),
    (_neg_under_xcomp, 3),
]
_TOTAL_W = sum(w for _, w in TEMPLATES)


def gen_sentence(rng: random.Random) -> str:
    r = rng.randrange(_TOTAL_W)
    acc = 0
    for fn, w in TEMPLATES:
        acc += w
        if r < acc:
            return fn(rng)
    return _svo(rng)


def _conv_len(rng: random.Random) -> int:
    """Power-law-ish conversation lengths (FIXTURES.md §1 skew fixture)."""
    r = rng.random()
    if r < 0.80:
        return rng.randint(2, 8)
    if r < 0.99:
        return rng.randint(9, 40)
    return rng.randint(200, 1000)


def gen_transcripts(n_convs: int, seed: int = SEED) -> pd.DataFrame:
    """Deterministic transcripts table; rows shuffled (not grouped by conv)."""
    rng = random.Random(seed)
    roles = ["user", "assistant", "tool"]
    recs: List[Tuple[str, int, str, str, str, datetime]] = []
    for c in range(n_convs):
        conv_id = f"conv{c:08d}"
        n_turns = _conv_len(rng)
        for t in range(n_turns):
            role = roles[t % 3]
            tool = rng.choice(TOOL_NAMES) if role == "tool" else ""
            r = rng.random()
            if r < 0.04:
                text = ""  # empty-turn fixture
            else:
                n_sents = rng.randint(1, 4)
                sents = [gen_sentence(rng) for _ in range(n_sents)]
                if n_sents > 1 and rng.random() < 0.15:
                    # multi-line turn: newline between two sentence groups
                    cut = rng.randint(1, n_sents - 1)
                    text = " ".join(sents[:cut]) + "\n" + " ".join(sents[cut:])
                else:
                    text = " ".join(sents)
            ts = BASE_TS + timedelta(seconds=c * 3600 + t * 7)
            recs.append((conv_id, t, role, text, tool, ts))
    rng.shuffle(recs)
    df = pd.DataFrame(
        recs, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return df


# ---------------------------------------------------------------------------
# materialization + caching
# ---------------------------------------------------------------------------

DEFAULT_DATA_DIR = os.environ.get(
    "REX_SPARK_DATA_DIR", os.path.join(os.path.dirname(__file__), "..", "..", "data")
)


def materialize(scale: str, data_dir: str = DEFAULT_DATA_DIR) -> Dict[str, str]:
    """Write (or reuse cached) parquet for one scale; returns table paths.

    Generation is deterministic, so an existing file is always valid.
    """
    n_convs = SCALES[scale]
    out = os.path.abspath(os.path.join(data_dir, scale_dir(scale)))
    os.makedirs(out, exist_ok=True)
    paths = {
        "transcripts": os.path.join(out, "transcripts.parquet"),
        "entity_kb": os.path.join(out, "entity_kb.parquet"),
        "figer_map": os.path.join(out, "figer_map.parquet"),
    }
    if not os.path.exists(paths["transcripts"]):
        df = gen_transcripts(n_convs)
        # shard into a directory of parquet files so the Spark scan
        # parallelizes without a repartition shuffle (a single file is one
        # input split regardless of row groups)
        n_shards = max(1, min(64, len(df) // 8000))
        tmp = paths["transcripts"] + f".tmp{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        for s in range(n_shards):
            df.iloc[s::n_shards].to_parquet(
                os.path.join(tmp, f"part-{s:05d}.parquet"), index=False
            )
        try:
            os.replace(tmp, paths["transcripts"])
        except OSError:
            # a concurrent generator won the publish race; output is
            # deterministic, so theirs is identical — discard ours
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    def _publish(pdf, dst):
        # atomic single-file publish (safe under concurrent generators —
        # output is deterministic, last writer wins with identical bytes)
        tmp = f"{dst}.tmp{os.getpid()}"
        pdf.to_parquet(tmp, index=False)
        os.replace(tmp, dst)

    if not os.path.exists(paths["entity_kb"]):
        _publish(gen_entity_kb(), paths["entity_kb"])
    if not os.path.exists(paths["figer_map"]):
        _publish(gen_figer_map(), paths["figer_map"])
    return paths
