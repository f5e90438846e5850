"""Graph-pattern (motif) matching over the canonical KG edge table.

A declarative query surface for the materialized graph, modeled on the
public GraphFrames ``find`` API: a pattern string of edge terms compiles
to a chain of Catalyst hash equi-joins, so Spark picks the physical join
strategy (broadcast for small bound sets, shuffled hash otherwise, AQE
skew-split for hub variables) instead of us hand-scheduling traversal.

    find(edges, "(a)-[p]->(b); (b)-[q]->(c); !(a)-[]->(c)")

Semantics (documented precisely so the DuckDB oracle can replay them):

* ``edges`` carries ``src`` / ``dst`` (canonical entity ids) and ``pred``
  (canonical predicate string); it is deduplicated on (src, pred, dst)
  before matching, so motif cardinality is graph-sized, not
  mention-sized.
* Node variables bind to entity ids, edge variables to predicate
  strings.  One variable may not name both a node and an edge.
* Anonymous elements ``()`` / ``[]`` match anything and bind nothing.
* Single-quoted slots are BOUND CONSTANTS — ``(a)-['located.in']->(b)``
  or ``(a)-[p]->('Berlin')`` — compiled to equality filters ahead of the
  projection, so Catalyst pushes them into the parquet scan and a
  constant-anchored pattern joins only the matching edge subset.
* The result is the set of DISTINCT assignments of the named variables
  satisfying every positive term and excluded by every negated term —
  one column per named variable.
* Each positive term after the first must share at least one bound
  variable (patterns never compile to a cartesian product; a
  disconnected pattern raises ``ValueError``).
* ``!``-terms compile to LEFT ANTI joins and may not introduce new
  variables (the standard motif-negation restriction; GraphFrames
  documents the same rule).

Scale: every join keys on already-bound entity ids; per-term projections
are deduplicated before joining so a term that binds only a predicate
variable contributes its distinct-predicate set, not the edge set.  The
deduplicated edge table is computed once and reused by every term.

No reference analog (the reference stops at triple emission,
de_pipeline/pipeline.py:69-77); beyond-reference KG-analytics surface.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

_SLOT = r"\w*|'[^']*'"
_TERM_RE = re.compile(
    rf"^\s*(?P<neg>!?)\s*\(\s*(?P<src>{_SLOT})\s*\)\s*-\s*"
    rf"\[\s*(?P<edge>{_SLOT})\s*\]\s*->\s*\(\s*(?P<dst>{_SLOT})\s*\)\s*$"
)


def _is_const(slot: str) -> bool:
    return slot.startswith("'")


def _const_value(slot: str) -> str:
    return slot[1:-1]


@dataclass(frozen=True)
class MotifTerm:
    src: str  # "" = anonymous; "'lit'" = bound constant; else a variable
    edge: str
    dst: str
    negated: bool

    @property
    def named_vars(self) -> tuple[str, ...]:
        return tuple(
            v
            for v in (self.src, self.edge, self.dst)
            if v and not _is_const(v)
        )


def parse_motif(pattern: str) -> list[MotifTerm]:
    """Parse ``"(a)-[e]->(b); !(b)-[]->(a)"`` into terms.

    Validates the variable discipline up front (node/edge namespace
    collision, a variable reused for two different edge positions is
    fine — that's the join).
    """
    terms: list[MotifTerm] = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"unparseable motif term: {raw!r}")
        terms.append(
            MotifTerm(
                src=m.group("src"),
                edge=m.group("edge"),
                dst=m.group("dst"),
                negated=bool(m.group("neg")),
            )
        )
    if not terms:
        raise ValueError("empty motif pattern")
    node_vars = {
        v for t in terms for v in (t.src, t.dst) if not _is_const(v)
    }
    edge_vars = {t.edge for t in terms if not _is_const(t.edge)}
    clash = (node_vars & edge_vars) - {""}
    if clash:
        raise ValueError(f"variables used as both node and edge: {sorted(clash)}")
    # an edge variable appearing in two terms would require the SAME edge
    # row to satisfy both positions; the relational reading (same predicate
    # string) is what we implement, which is well-defined — allowed.
    return terms


def _project_term(edges: DataFrame, term: MotifTerm) -> DataFrame:
    """One term's contribution: the distinct tuples of its named variables.

    ``edges`` must already be deduplicated on (src, pred, dst).  A term
    reusing one variable for both endpoints ((a)-[]->(a)) filters to
    self-loops before projecting.
    """
    df = edges
    # constants compile to filters BEFORE the projection/join — Catalyst
    # pushes them into the scan, so a constant-predicate pattern never
    # shuffles the full edge set
    for slot, col in ((term.src, "src"), (term.edge, "pred"), (term.dst, "dst")):
        if slot and _is_const(slot):
            df = df.where(F.col(col) == F.lit(_const_value(slot)))
    if (
        term.src
        and term.src == term.dst
        and not _is_const(term.src)
    ):
        df = df.where(F.col("src") == F.col("dst"))
    cols = []
    seen: set[str] = set()
    for var, col in ((term.src, "src"), (term.edge, "pred"), (term.dst, "dst")):
        if var and not _is_const(var) and var not in seen:
            cols.append(F.col(col).alias(var))
            seen.add(var)
    if not cols:
        raise ValueError(
            "motif term binds no variables: anonymous/constant-only terms "
            "are either trivially true or dead weight — remove it"
        )
    return df.select(*cols).distinct()


def find(edges: DataFrame, pattern: str) -> DataFrame:
    """Match ``pattern`` against the edge table; one column per named
    variable, one row per DISTINCT satisfying assignment.

    ``edges``: columns ``src``, ``pred``, ``dst`` (extra columns are
    ignored).  Callers pass the canonicalized edge table with
    ``pred_canonical`` aliased onto ``pred`` for canonical-predicate
    matching.
    """
    terms = parse_motif(pattern)
    positives = [t for t in terms if not t.negated]
    negatives = [t for t in terms if t.negated]
    if not positives:
        raise ValueError("motif pattern needs at least one positive term")

    dedup = edges.select("src", "pred", "dst").distinct()

    bound: DataFrame | None = None
    bound_vars: set[str] = set()
    for term in positives:
        proj = _project_term(dedup, term)
        tvars = set(term.named_vars)
        if bound is None:
            bound = proj
        else:
            shared = sorted(bound_vars & tvars)
            if not shared:
                raise ValueError(
                    f"disconnected motif term {term}: shares no variable with "
                    f"the bound set {sorted(bound_vars)} (would be a cartesian)"
                )
            bound = bound.join(proj, shared)
        bound_vars |= tvars

    for term in negatives:
        tvars = set(term.named_vars)
        new = tvars - bound_vars
        if new:
            raise ValueError(
                f"negated motif term introduces unbound variables {sorted(new)}"
            )
        if not tvars:
            raise ValueError("negated term binds no variables")
        proj = _project_term(dedup, term)
        bound = bound.join(proj, sorted(tvars), "left_anti")

    assert bound is not None
    return bound.distinct()
