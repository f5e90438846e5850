"""Closed synthetic lexicon + deterministic tokenizer/tagger/parser analog.

The reference pipeline (``/root/reference``) shells out to external ML
components for tokenization/tagging/parsing (UDPipe: ``udpipe_model.py:33-62``)
and NER (Stanford NER socket client: ``ner.py:108-143``).  None of those
services exist here, and the correctness contract (BASELINE.md) judges the
*distributed* engine against a pure-Python oracle that shares one deterministic
analog of those components.  This module is that analog:

* a closed vocabulary (entities / common nouns / verbs / function words),
* a whitespace tokenizer with terminal-punctuation splitting,
* a rule-based dependency parser producing the same token-table shape the
  reference consumes via CoNLL-U (``helper_functions.py:11-30``):
  ``(id, form, lemma, upos, xpos, head, deprel)`` with 1-based ids, head=0 for
  root.

Everything is a pure function of the input text (no RNG, no wall clock), so
the Spark pandas-UDF stages and the sequential oracle agree by construction;
the tests then exercise what actually matters at scale: partitioning,
ordering, join keys and Arrow batching boundaries (SURVEY.md §5).

Tagset: ``upos`` follows UD; ``xpos`` follows the German STTS-ish codes the
reference's rules read — in particular ``PTKNEG`` for the negation particle
(``binary_relation.py:186``) and ``compound:prt`` / ``xcomp`` / ``advmod`` /
``case`` / ``obl`` deprels (``binary_relation.py:245-266``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# Vocabulary
# ---------------------------------------------------------------------------

# 50 named entities: (canonical_name, aliases, figer_type_or_empty, in_wiki).
# Unicode surfaces and one numeric surface are deliberate fixtures
# (FIXTURES.md §3 item 11; numeric coercion analog of nel.py:310-312).
ENTITIES: List[Tuple[str, List[str], str, bool]] = [
    ("Ada Lovelace", ["Lovelace"], "/person/engineer", True),
    ("Alan Turing", ["Turing"], "/person/engineer", True),
    ("Grace Hopper", ["Hopper"], "/person/engineer", True),
    ("Marie Curie", ["Curie"], "/person/scientist", True),
    ("Isaac Newton", ["Newton"], "/person/scientist", True),
    ("Albert Einstein", ["Einstein"], "/person/scientist", True),
    ("Nikola Tesla", ["Tesla"], "/person/engineer", True),
    ("Rosalind Franklin", ["Franklin"], "/person/scientist", True),
    ("Katherine Johnson", ["Johnson"], "/person/scientist", True),
    ("Margaret Hamilton", ["Hamilton"], "/person/engineer", True),
    ("Tim Renner", ["Renner"], "/person", True),
    ("Anna Schmidt", ["Schmidt"], "/person", True),
    ("Karl Weber", ["Weber"], "/person", True),
    ("Lena Fischer", ["Fischer"], "/person", True),
    ("Omar Haddad", ["Haddad"], "/person", True),
    ("Mei Lin", ["Lin"], "/person", True),
    ("Ravi Patel", ["Patel"], "/person", True),
    ("Sofia Russo", ["Russo"], "/person", True),
    ("Ivan Petrov", ["Petrov"], "/person", True),
    ("Aiko Tanaka", ["Tanaka"], "/person", True),
    ("Berlin", [], "/location/city", True),
    ("Paris", [], "/location/city", True),
    ("London", [], "/location/city", True),
    ("Madrid", [], "/location/city", True),
    ("Vienna", [], "/location/city", True),
    ("Zurich", ["Zürich"], "/location/city", True),
    ("Warsaw", ["Warschau"], "/location/city", True),
    ("Kyoto", [], "/location/city", True),
    ("Nairobi", [], "/location/city", True),
    ("Bogota", ["Bogotá"], "/location/city", True),
    ("Acme Corp", ["Acme"], "/organization/company", True),
    ("Globex Industries", ["Globex"], "/organization/company", True),
    ("Initech Labs", ["Initech"], "/organization/company", True),
    ("Umbrella Group", ["Umbrella"], "/organization/company", True),
    ("Vandelay Trading", ["Vandelay"], "/organization/company", True),
    ("Hooli Systems", ["Hooli"], "/organization/company", True),
    ("Stark Forge", ["Stark"], "/organization/company", True),
    ("Wayne Works", [], "/organization/company", True),
    ("Tyrell Dynamics", ["Tyrell"], "/organization/company", True),
    ("Aperture Optics", ["Aperture"], "/organization/company", True),
    # notInWiki fixtures: KB carries a notInWiki URL (binary_relation.py:115-122)
    ("Quietfall Collective", ["Quietfall"], "", False),
    ("Novum Circle", ["Novum"], "", False),
    ("Driftwood Assembly", ["Driftwood"], "", False),
    ("Hollow Pine Society", [], "", False),
    ("Lantern Bureau", ["Lantern"], "", False),
    # unicode-heavy and numeric surfaces
    ("São Paulo", [], "/location/city", True),
    ("Łódź", [], "/location/city", True),
    ("Øresund Bridge", ["Øresund"], "/location", True),
    ("Čapek Robotics", ["Čapek"], "/organization/company", True),
    ("42", [], "", False),
    # AMBIGUOUS aliases (T5 disambiguation fixtures): these three share a
    # surface with an earlier entity — "Franklin" / "Turing" / "Hamilton"
    # each have TWO KB candidates with distinct priors (the earlier entity
    # wins on prior; max-prior stays unique, so the prior-only linker is
    # still deterministic).  A context-aware scorer can flip the alias to
    # the later entity when its full name co-occurs in the conversation.
    ("Benjamin Franklin", ["Franklin"], "/person/politician", True),
    ("Turing Dynamics", ["Turing"], "/organization/company", True),
    ("Hamilton Precision", ["Hamilton"], "/organization/company", True),
]

# 30 common nouns — the parser tags these NOUN; the noun-projection operator
# (reference helper_functions.py:33-48, 'NOUN' ctag) turns them into 'com'
# mention candidates.
COMMON_NOUNS: List[str] = [
    "report", "engine", "pipeline", "dataset", "budget", "contract",
    "ledger", "memo", "charter", "treaty", "bridge", "reactor",
    "archive", "survey", "tribunal", "statute", "protocol", "manifesto",
    "audit", "blueprint", "quorum", "mandate", "dossier", "registry",
    "summit", "embargo", "tariff", "subsidy", "consortium", "syndicate",
]

# 40 verbs: lemma -> dict(base, past, part). Particle verbs carry a particle;
# xcomp-takers are used for clausal-complement templates; prepositional verbs
# pair with a fixed preposition in templates.
def _reg(lemma: str) -> Dict[str, str]:
    if lemma.endswith("e"):
        past = lemma + "d"
    elif lemma.endswith("y") and lemma[-2] not in "aeiou":
        past = lemma[:-1] + "ied"
    else:
        past = lemma + "ed"
    return {"base": lemma, "past": past, "part": past}


VERBS: Dict[str, Dict[str, str]] = {
    # plain transitive (R1-R3)
    "audit": _reg("audit"), "review": _reg("review"), "approve": _reg("approve"),
    "reject": _reg("reject"), "sign": _reg("sign"), "draft": _reg("draft"),
    "fund": _reg("fund"), "inspect": _reg("inspect"), "endorse": _reg("endorse"),
    "oppose": _reg("oppose"), "praise": _reg("praise"), "trust": _reg("trust"),
    "advise": _reg("advise"), "hire": _reg("hire"), "summon": _reg("summon"),
    "visit": _reg("visit"),
    # particle verbs (R4, compound:prt)
    "pick": _reg("pick"), "turn": _reg("turn"), "shut": {"base": "shut", "past": "shut", "part": "shut"},
    "hand": _reg("hand"), "call": _reg("call"), "write": {"base": "write", "past": "wrote", "part": "written"},
    "wind": {"base": "wind", "past": "wound", "part": "wound"},
    "phase": _reg("phase"), "roll": _reg("roll"), "break": {"base": "break", "past": "broke", "part": "broken"},
    # xcomp-takers (R5 / R2 xcomp head path)
    "want": _reg("want"), "try": _reg("try"), "plan": {"base": "plan", "past": "planned", "part": "planned"},
    "decide": _reg("decide"), "promise": _reg("promise"), "refuse": _reg("refuse"),
    "agree": _reg("agree"), "hope": _reg("hope"),
    # prepositional (R6, obl+case)
    "rely": _reg("rely"), "insist": _reg("insist"), "vote": _reg("vote"),
    "argue": _reg("argue"), "lean": _reg("lean"), "testify": _reg("testify"),
}

PARTICLE_VERBS = ["pick", "turn", "shut", "hand", "call", "write", "wind", "phase", "roll", "break"]
XCOMP_VERBS = ["want", "try", "plan", "decide", "promise", "refuse", "agree", "hope"]
PREP_VERBS = ["rely", "insist", "vote", "argue", "lean", "testify"]
PLAIN_VERBS = [
    "audit", "review", "approve", "reject", "sign", "draft", "fund", "inspect",
    "endorse", "oppose", "praise", "trust", "advise", "hire", "summon", "visit",
]

PARTICLES = ["up", "down", "off", "away"]
PREPOSITIONS = ["on", "with", "about", "against", "for", "in"]
ADVERBS = ["really", "absolutely", "quite", "often"]
NEG_WORD = "not"
DET_WORD = "the"
TO_WORD = "to"
AUX_WORD = "was"
BY_WORD = "by"

# P6 — multi-word tokens: one *surface* token whose syntax is several words,
# the German preposition-article contractions the reference re-inserts after
# parsing (unstable_parser_post_proc.py:11-41, e.g. ``im`` = ``in dem``).
# The parser consumes the expanded (syntax) tokens; the surface token list
# keeps the contraction so per-turn text reconstruction is exact.
CONTRACTIONS: Dict[str, Tuple[str, ...]] = {
    "am": ("an", "dem"),
    "ans": ("an", "das"),
    "aufm": ("auf", "dem"),     # colloquial register — UDPipe's range-line
    "aufn": ("auf", "den"),     # handling covers these identically
    "aufs": ("auf", "das"),
    "ausm": ("aus", "dem"),
    "beim": ("bei", "dem"),
    "durchn": ("durch", "den"),
    "durchs": ("durch", "das"),
    "fürn": ("für", "den"),
    "fürs": ("für", "das"),
    "gegens": ("gegen", "das"),
    "hinterm": ("hinter", "dem"),
    "hinters": ("hinter", "das"),
    "im": ("in", "dem"),
    "ins": ("in", "das"),
    "überm": ("über", "dem"),
    "übern": ("über", "den"),
    "übers": ("über", "das"),
    "ums": ("um", "das"),
    "untern": ("unter", "den"),
    "unterm": ("unter", "dem"),
    "unters": ("unter", "das"),
    "vom": ("von", "dem"),
    "vorm": ("vor", "dem"),
    "vors": ("vor", "das"),
    "zum": ("zu", "dem"),
    "zur": ("zu", "der"),
}
DET_WORDS = frozenset({DET_WORD, "dem", "das", "der", "den"})
# syntax-only preposition forms introduced by MWT expansion
_EXTRA_PREPS = frozenset(
    {"zu", "an", "auf", "aus", "bei", "durch", "für", "gegen", "hinter",
     "über", "um", "unter", "von", "vor"}
)
CCONJ_WORD = "and"
REL_PRON = "who"
COMMA = ","

SENT_TERMINALS = (".", "!", "?")

# form -> lemma for every verb inflection
VERB_FORM_TO_LEMMA: Dict[str, str] = {}
for _lemma, _forms in VERBS.items():
    for _f in _forms.values():
        VERB_FORM_TO_LEMMA[_f] = _lemma

_COMMON_NOUN_SET = frozenset(COMMON_NOUNS)
_PARTICLE_SET = frozenset(PARTICLES)
_PREP_SET = frozenset(PREPOSITIONS)
_ADV_SET = frozenset(ADVERBS)

# all KB surfaces (canonical + aliases), used for longest-match chunking
def all_entity_surfaces() -> List[str]:
    out: List[str] = []
    for name, aliases, _t, _w in ENTITIES:
        out.append(name)
        out.extend(aliases)
    return out


_SURFACE_TOKEN_TUPLES = None
_SURFACE_FIRST = None


def surface_token_index() -> Dict[Tuple[str, ...], str]:
    """token-tuple -> canonical surface string, for longest-match lookup."""
    global _SURFACE_TOKEN_TUPLES
    if _SURFACE_TOKEN_TUPLES is None:
        idx: Dict[Tuple[str, ...], str] = {}
        for s in all_entity_surfaces():
            idx[tuple(s.split(" "))] = s
        _SURFACE_TOKEN_TUPLES = idx
    return _SURFACE_TOKEN_TUPLES


def surface_first_index() -> Dict[str, List[int]]:
    """first token -> candidate match lengths (desc) — longest-match fast path."""
    global _SURFACE_FIRST
    if _SURFACE_FIRST is None:
        first: Dict[str, List[int]] = {}
        for tup in surface_token_index():
            first.setdefault(tup[0], []).append(len(tup))
        _SURFACE_FIRST = {w: sorted(set(ls), reverse=True) for w, ls in first.items()}
    return _SURFACE_FIRST


MAX_SURFACE_TOKENS = 3

# ---------------------------------------------------------------------------
# Tokenizer (T1-adjacent: word level; sentence segmentation lives in rules.py)
# ---------------------------------------------------------------------------


def tokenize(sentence: str) -> List[str]:
    """Whitespace tokenizer; terminal punctuation becomes its own token."""
    raw = sentence.split()
    toks: List[str] = []
    for w in raw:
        if len(w) > 1 and w.endswith(SENT_TERMINALS):
            toks.append(w[:-1])
            toks.append(w[-1])
        else:
            toks.append(w)
    return toks


# ---------------------------------------------------------------------------
# Categories
# ---------------------------------------------------------------------------

CAT_VERB = "VERB"
CAT_NOUN = "NOUN"
CAT_PROPN = "PROPN"
CAT_DET = "DET"
CAT_PREP = "PREP"
CAT_BY = "BY"
CAT_TO = "TO"
CAT_AUX = "AUX"
CAT_NEG = "NEG"
CAT_ADV = "ADV"
CAT_PRT = "PRT"
CAT_PUNCT = "PUNCT"
CAT_CCONJ = "CCONJ"
CAT_PRON = "PRON"
CAT_COMMA = "COMMA"


_CLASSIFY_CACHE: Dict[str, str] = {}


def classify(form: str) -> str:
    got = _CLASSIFY_CACHE.get(form)
    if got is None:
        got = _classify_uncached(form)
        if len(_CLASSIFY_CACHE) < 1_000_000:  # bounded: corpus vocab is closed
            _CLASSIFY_CACHE[form] = got
    return got


def _classify_uncached(form: str) -> str:
    if form in SENT_TERMINALS:
        return CAT_PUNCT
    if form == COMMA:
        return CAT_COMMA
    if form == CCONJ_WORD:
        return CAT_CCONJ
    if form == REL_PRON:
        return CAT_PRON
    if form in DET_WORDS:
        return CAT_DET
    if form in _EXTRA_PREPS:
        return CAT_PREP
    if form == TO_WORD:
        return CAT_TO
    if form == AUX_WORD:
        return CAT_AUX
    if form == NEG_WORD:
        return CAT_NEG
    if form == BY_WORD:
        return CAT_BY
    if form in VERB_FORM_TO_LEMMA:
        return CAT_VERB
    if form in _PARTICLE_SET:
        return CAT_PRT
    if form in _PREP_SET:
        return CAT_PREP
    if form in _ADV_SET:
        return CAT_ADV
    if form in _COMMON_NOUN_SET:
        return CAT_NOUN
    if form[:1].isupper() or form[:1].isdigit():
        return CAT_PROPN
    return CAT_NOUN


_UPOS_XPOS = {
    CAT_VERB: ("VERB", "VVFIN"),
    CAT_NOUN: ("NOUN", "NN"),
    CAT_PROPN: ("PROPN", "NE"),
    CAT_DET: ("DET", "ART"),
    CAT_PREP: ("ADP", "APPR"),
    CAT_BY: ("ADP", "APPR"),
    CAT_TO: ("PART", "PTKZU"),
    CAT_AUX: ("AUX", "VAFIN"),
    CAT_NEG: ("PART", "PTKNEG"),
    CAT_ADV: ("ADV", "ADV"),
    CAT_PRT: ("ADP", "PTKVZ"),
    CAT_PUNCT: ("PUNCT", "$."),
    CAT_CCONJ: ("CCONJ", "KON"),
    CAT_PRON: ("PRON", "PRELS"),
    CAT_COMMA: ("PUNCT", "$,"),
}


# ---------------------------------------------------------------------------
# Deterministic dependency parser
# ---------------------------------------------------------------------------

Token = Dict[str, object]  # {id, form, lemma, upos, xpos, head, deprel}


class Sent:
    """Struct-of-arrays token table — the hot-path representation.

    Same fields as the CoNLL-U-shaped ``Token`` dicts (1-based ids are
    implicit: token ``i`` has id ``i+1``; ``heads`` hold 1-based head ids,
    0 = root), but stored as six parallel lists: the rule core then does
    list indexing instead of per-token dict hashing, and the parser emits
    no per-token dict at all.  Converted to dicts only at Arrow/schema
    boundaries (``sent_to_dicts``); anything dict-shaped (including
    pyspark Rows) converts in with ``as_soa``.
    """

    __slots__ = ("forms", "lemmas", "upos", "xpos", "heads", "deprels")

    def __init__(self, forms, lemmas, upos, xpos, heads, deprels):
        self.forms = forms
        self.lemmas = lemmas
        self.upos = upos
        self.xpos = xpos
        self.heads = heads
        self.deprels = deprels

    def __len__(self) -> int:
        return len(self.forms)


def as_soa(tokens) -> "Sent":
    """Sequence of dict-like tokens (dicts or pyspark Rows, positional
    order) → Sent.  The one-listcomp-per-field cost replaces the per-field
    dict lookups the rule core would otherwise do on every access."""
    return Sent(
        [str(t["form"]) for t in tokens],
        [str(t["lemma"]) for t in tokens],
        [str(t["upos"]) for t in tokens],
        [str(t["xpos"]) for t in tokens],
        [int(t["head"]) for t in tokens],
        [str(t["deprel"]) for t in tokens],
    )


def sent_to_dicts(sent: "Sent") -> List[Token]:
    """Sent → the CoNLL-U-shaped dicts the Spark schemas and tests read."""
    return [
        {
            "id": i + 1,
            "form": sent.forms[i],
            "lemma": sent.lemmas[i],
            "upos": sent.upos[i],
            "xpos": sent.xpos[i],
            "head": sent.heads[i],
            "deprel": sent.deprels[i],
        }
        for i in range(len(sent.forms))
    ]


def _entity_chunks(forms: Sequence[str], cats: Sequence[str]) -> List[Tuple[int, int]]:
    """Split PROPN runs into per-entity chunks via KB longest-match.

    Returns (start, end) inclusive 0-based index pairs.  Mirrors the NER
    analog so mention spans and parse chunks agree (SURVEY.md §2.3 T4).
    """
    idx = surface_token_index()
    first = surface_first_index()

    def match_at(k: int, j: int) -> int:
        lengths = first.get(forms[k])
        if lengths:
            for length in lengths:
                if length <= j - k + 1 and tuple(forms[k:k + length]) in idx:
                    return length
        return 0

    chunks: List[Tuple[int, int]] = []
    i = 0
    n = len(forms)
    while i < n:
        if cats[i] != CAT_PROPN:
            i += 1
            continue
        # end of this PROPN run
        j = i
        while j + 1 < n and cats[j + 1] == CAT_PROPN:
            j += 1
        # longest-match segmentation within [i, j]
        k = i
        while k <= j:
            matched = match_at(k, j)
            if matched == 0:
                # capitalized run not in KB: greedy single-entity span until
                # a position where a KB match would start
                m = k + 1
                while m <= j and match_at(m, j) == 0:
                    m += 1
                chunks.append((k, m - 1))
                k = m
            else:
                chunks.append((k, k + matched - 1))
                k += matched
        i = j + 1
    return chunks


def expand_contractions(
    surface_forms: Sequence[str],
) -> Tuple[List[str], List[Dict[str, object]]]:
    """P6 — expand MWT contractions into syntax forms.

    Returns ``(syntax_forms, mwt_ranges)`` where each range is
    ``{start, end, form}`` with 1-based *syntax* token ids — the analog of a
    CoNLL-U range line ``3-4  im`` followed by ``3 in`` / ``4 dem``
    (unstable_parser_post_proc.py:11-41 re-inserts exactly these)."""
    syntax: List[str] = []
    ranges: List[Dict[str, object]] = []
    for form in surface_forms:
        parts = CONTRACTIONS.get(form)
        if parts is None:
            syntax.append(form)
        else:
            start = len(syntax) + 1
            syntax.extend(parts)
            ranges.append({"start": start, "end": len(syntax), "form": form})
    return syntax, ranges


def parse_sentence_full(sentence: str) -> Dict[str, object]:
    """Parse one sentence keeping BOTH token lists (P6):

    * ``surface_tokens`` — what the text actually contains (``im``), the list
      per-turn text reconstruction must use;
    * ``tokens`` — the expanded syntax tokens (``in dem``) the dependency
      rules read (1-based ids; MWT ranges in ``mwt`` map surface→syntax).

    For contraction-free sentences the two lists have identical forms and
    ``mwt`` is empty — the degenerate case the closed grammar used to be
    limited to."""
    surface_forms = tokenize(sentence)
    syntax_forms, mwt = expand_contractions(surface_forms)
    tokens = sent_to_dicts(_parse_forms(syntax_forms))
    return {
        "surface_tokens": [
            {"id": i + 1, "form": f} for i, f in enumerate(surface_forms)
        ],
        "tokens": tokens,
        "mwt": mwt,
    }


def parse_sentence(sentence: str) -> List[Token]:
    """Parse one sentence of the closed grammar into a (syntax) token table.

    Output shape mirrors the CoNLL-U fields the reference loads into
    ``nltk.parse.DependencyGraph`` (``helper_functions.py:11-30``): 1-based
    ``id``, ``head`` (0 = root), and the deprels the extraction rules read
    (``binary_relation.py:243-266``).  MWT contractions are expanded first
    (P6); use ``parse_sentence_full`` when the surface list is also needed,
    ``parse_sentence_soa`` on the hot path (no per-token dicts).
    """
    return sent_to_dicts(parse_sentence_soa(sentence))


def parse_sentence_soa(sentence: str) -> Sent:
    """Hot-path parse: same semantics as ``parse_sentence``, emitted as the
    struct-of-arrays ``Sent`` (no per-token dict construction)."""
    forms, _mwt = expand_contractions(tokenize(sentence))
    return _parse_forms(forms)


def _parse_forms(forms: List[str]) -> Sent:
    n = len(forms)
    cats = [classify(f) for f in forms]
    heads = [0] * n
    rels = ["dep"] * n

    # --- verbs ------------------------------------------------------------
    verb_ix = [i for i in range(n) if cats[i] == CAT_VERB]
    root: Optional[int] = None
    prev_verb: Optional[int] = None
    for v in verb_ix:
        if v > 0 and cats[v - 1] == CAT_TO and prev_verb is not None:
            heads[v] = prev_verb + 1
            rels[v] = "xcomp"
            heads[v - 1] = v + 1
            rels[v - 1] = "mark"
        elif root is None:
            root = v
            heads[v] = 0
            rels[v] = "root"
        else:
            heads[v] = root + 1
            rels[v] = "conj"
        prev_verb = v
    if root is None:
        # verbless sentence: last non-punct token is root
        for i in range(n - 1, -1, -1):
            if cats[i] != CAT_PUNCT:
                root = i
                heads[i] = 0
                rels[i] = "root"
                break
        if root is None:
            root = 0
            rels[0] = "root"

    passive = any(
        cats[i] == CAT_AUX and i + 1 < n and cats[i + 1] == CAT_VERB for i in range(n)
    )

    def nearest_verb_left(i: int) -> Optional[int]:
        for v in reversed(verb_ix):
            if v < i:
                return v
        return None

    def nearest_verb_right(i: int) -> Optional[int]:
        for v in verb_ix:
            if v > i:
                return v
        return None

    # --- nominal chunks ----------------------------------------------------
    # entity chunks (KB-aware) + common-noun chunks (optional det + noun run,
    # head = last noun, earlier nouns compound->head)
    chunks: List[Tuple[int, int, int]] = []  # (start, end, head_ix)
    ent_spans = _entity_chunks(forms, cats)
    covered = set()
    for s, e in ent_spans:
        chunks.append((s, e, s))  # entity head = first token (UD flat)
        covered.update(range(s, e + 1))
    i = 0
    while i < n:
        if cats[i] == CAT_NOUN and i not in covered:
            j = i
            while j + 1 < n and cats[j + 1] == CAT_NOUN and (j + 1) not in covered:
                j += 1
            chunks.append((i, j, j))  # common head = last noun
            for k in range(i, j):
                heads[k] = j + 1
                rels[k] = "compound"
            i = j + 1
        else:
            i += 1
    chunks.sort(key=lambda c: c[0])

    # flat attachment inside entity chunks
    for s, e, h in chunks:
        if cats[s] == CAT_PROPN:
            for k in range(s + 1, e + 1):
                heads[k] = h + 1
                rels[k] = "flat"

    # --- chunk attachment ---------------------------------------------------
    first_preverbal: Optional[int] = None
    obj_seen_for_verb: Dict[int, bool] = {}
    prev_chunk_head: Optional[int] = None
    for s, e, h in chunks:
        if s < root and (first_preverbal is None):
            heads[h] = root + 1
            rels[h] = "nsubj:pass" if passive else "nsubj"
            first_preverbal = h
        elif s < root:
            heads[h] = first_preverbal + 1
            rels[h] = "appos"
        else:
            gov = nearest_verb_left(s)
            gov = root if gov is None else gov
            preceded_by_adp = s > 0 and cats[s - 1] in (CAT_PREP, CAT_BY)
            if preceded_by_adp:
                heads[h] = gov + 1
                rels[h] = "obl"
                heads[s - 1] = h + 1
                rels[s - 1] = "case"
            elif not obj_seen_for_verb.get(gov, False):
                heads[h] = gov + 1
                rels[h] = "obj"
                obj_seen_for_verb[gov] = True
            else:
                tgt = prev_chunk_head if prev_chunk_head is not None else gov
                heads[h] = tgt + 1
                rels[h] = "appos"
        prev_chunk_head = h

    # --- function words ------------------------------------------------------
    for i in range(n):
        c = cats[i]
        if c == CAT_DET:
            # det -> head of the chunk starting right of it
            tgt = None
            for s, e, h in chunks:
                if s <= i + 1 <= e:
                    tgt = h
                    break
            heads[i] = (tgt + 1) if tgt is not None else root + 1
            rels[i] = "det"
        elif c == CAT_AUX:
            v = nearest_verb_right(i)
            heads[i] = (v + 1) if v is not None else root + 1
            rels[i] = "aux:pass"
        elif c == CAT_NEG:
            if i > 0 and cats[i - 1] == CAT_ADV:
                heads[i] = i  # advmod -> previous adverb (nested negation)
                rels[i] = "advmod"
            else:
                v = nearest_verb_right(i)
                if v is None:
                    v = nearest_verb_left(i)
                heads[i] = (v + 1) if v is not None else root + 1
                rels[i] = "advmod"
        elif c == CAT_ADV:
            v = nearest_verb_right(i)
            if v is None:
                v = nearest_verb_left(i)
            heads[i] = (v + 1) if v is not None else root + 1
            rels[i] = "advmod"
        elif c == CAT_PRT:
            v = nearest_verb_left(i)
            heads[i] = (v + 1) if v is not None else root + 1
            rels[i] = "compound:prt"
        elif c == CAT_PREP or c == CAT_BY:
            if rels[i] == "dep":  # not already attached as case
                v = nearest_verb_left(i)
                heads[i] = (v + 1) if v is not None else root + 1
                rels[i] = "case"
        elif c == CAT_PUNCT or c == CAT_COMMA:
            heads[i] = root + 1
            rels[i] = "punct"
        elif c == CAT_CCONJ:
            # cc attaches to the following conjunct's head (UD): the next verb
            v = nearest_verb_right(i)
            if v is None:
                v = nearest_verb_left(i)
            heads[i] = (v + 1) if v is not None else root + 1
            rels[i] = "cc"
        elif c == CAT_PRON:
            # relative pronoun: nsubj of the embedded (following) verb
            v = nearest_verb_right(i)
            if v is None:
                v = nearest_verb_left(i)
            heads[i] = (v + 1) if v is not None else root + 1
            rels[i] = "nsubj"
        elif c == CAT_TO and rels[i] == "dep":
            v = nearest_verb_right(i)
            heads[i] = (v + 1) if v is not None else root + 1
            rels[i] = "mark"

    # --- emit (struct-of-arrays; dicts only at schema boundaries) -----------
    upos_l: List[str] = [""] * n
    xpos_l: List[str] = [""] * n
    lemmas: List[str] = [""] * n
    for i in range(n):
        c = cats[i]
        upos_l[i], xpos_l[i] = _UPOS_XPOS[c]
        lemmas[i] = VERB_FORM_TO_LEMMA[forms[i]] if c == CAT_VERB else forms[i]
    return Sent(list(forms), lemmas, upos_l, xpos_l, heads, rels)
