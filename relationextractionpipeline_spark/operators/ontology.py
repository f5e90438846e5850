"""Ontology induction over the materialized KG.

Two rollups a KG-construction pipeline runs right after canonicalization:

* ``predicate_signatures`` — for every canonical predicate, the dominant
  (subject FIGER type, object FIGER type) pair with its support and
  coverage.  This is schema induction from data: the signature table IS
  the inferred domain/range of each relation, and a predicate whose top
  signature covers only a small fraction of its edges is a candidate for
  sense-splitting or a symptom of over-merged predicate clusters.

* ``functionality`` — per canonical predicate, how close the relation is
  to functional (each subject → exactly one object).  Subjects with more
  than one distinct object under a near-functional predicate are the
  standard KB-consistency signal (conflicting facts / under-merged
  objects); the per-predicate functionality score is the prior a
  downstream fusion stage weighs evidence against.

Both are pure aggregates over the edge table: groupBy on
(predicate, type-pair) or (predicate, subject) — keys whose cardinality
is bounded by the ontology / entity count, not the corpus — followed by a
second tiny rollup keyed on the predicate alone.  At 100 TB the first
exchange carries map-side-combined partial counts (distinct predicate ×
type-pair is thousands of rows regardless of corpus size; predicate ×
subject is bounded by the entity table), and everything downstream of it
is dimension-sized.  No UDFs, no collects.

No reference analog (the reference stops at triple emission,
de_pipeline/pipeline.py:69-77); beyond-reference KG-quality surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def predicate_signatures(
    triples: DataFrame, pred_map: DataFrame
) -> DataFrame:
    """Dominant (subj_type, obj_type) signature per canonical predicate.

    ``triples`` must carry ``pred``, ``subj_type``, ``obj_type``;
    ``pred_map`` is the (pred, pred_canonical) table from
    ``canonicalize.canonicalize_predicates`` (singletons self-map, so the
    left join's coalesce is belt-and-braces for predicates absent from
    the map).  Output is one row per canonical predicate with the
    top-support type pair (ties broken by type-pair string order so the
    row is deterministic), the number of distinct signatures, total edge
    count, and the top pair's coverage fraction.
    """
    sig = (
        triples.join(F.broadcast(pred_map), "pred", "left")
        .select(
            F.coalesce("pred_canonical", "pred").alias("pred_canonical"),
            "subj_type",
            "obj_type",
        )
        .groupBy("pred_canonical", "subj_type", "obj_type")
        .agg(F.count(F.lit(1)).alias("n_support"))
    )
    per_pred = Window.partitionBy("pred_canonical")
    ranked = sig.select(
        "*",
        F.row_number()
        .over(
            per_pred.orderBy(
                F.desc("n_support"), F.asc("subj_type"), F.asc("obj_type")
            )
        )
        .alias("_rn"),
        F.sum("n_support").over(per_pred).alias("n_edges"),
        F.count(F.lit(1)).over(per_pred).alias("n_signatures"),
    )
    return ranked.where(F.col("_rn") == 1).select(
        "pred_canonical",
        F.col("subj_type").alias("top_subj_type"),
        F.col("obj_type").alias("top_obj_type"),
        F.col("n_support").alias("top_support"),
        "n_signatures",
        "n_edges",
        F.round(F.col("n_support") / F.col("n_edges"), 6).alias("coverage"),
    )


def functionality(
    edges: DataFrame, pred_map: DataFrame | None = None
) -> DataFrame:
    """Per-canonical-predicate functionality profile.

    ``edges`` is the canonicalized edge table (``pred``,
    ``subj_canonical``, ``obj_canonical``); rows with an unlinked (null)
    endpoint are excluded — functionality is a statement about resolved
    entities.  If ``edges`` already carries ``pred_canonical`` (the
    ``materialize_graph`` output does) pass ``pred_map=None``; otherwise
    the (pred, pred_canonical) map joins in here.  Output per canonical
    predicate: total edge count, distinct subject count, subjects
    asserting >1 distinct object (``n_violating_subjects`` — the
    conflicting-fact candidates), and ``functionality`` = fraction of
    subjects with exactly one distinct object (1.0 = perfectly
    functional relation).
    """
    linked = edges.where(
        F.col("subj_canonical").isNotNull()
        & F.col("obj_canonical").isNotNull()
    )
    if pred_map is not None:
        linked = linked.join(F.broadcast(pred_map), "pred", "left")
    per_subj = (
        linked.select(
            F.coalesce("pred_canonical", "pred").alias("pred_canonical"),
            "subj_canonical",
            "obj_canonical",
        )
        .groupBy("pred_canonical", "subj_canonical")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.countDistinct("obj_canonical").alias("n_objects"),
        )
    )
    return per_subj.groupBy("pred_canonical").agg(
        F.sum("n_edges").alias("n_edges"),
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum(F.when(F.col("n_objects") > 1, 1).otherwise(0)).alias(
            "n_violating_subjects"
        ),
        F.round(
            F.avg(F.when(F.col("n_objects") == 1, 1.0).otherwise(0.0)), 6
        ).alias("functionality"),
    )

def _resolved_facts(
    edges: DataFrame, pred_map: DataFrame | None = None
) -> DataFrame:
    """DISTINCT resolved fact set (p, s, o) over canonical ids — the
    shared input of the rule miners: multiplicity is evidence strength,
    not logical truth, so facts dedup before mining."""
    linked = edges.where(
        F.col("subj_canonical").isNotNull()
        & F.col("obj_canonical").isNotNull()
    )
    if pred_map is not None:
        linked = linked.join(F.broadcast(pred_map), "pred", "left")
    return (
        linked.select(
            F.coalesce("pred_canonical", "pred").alias("p"),
            F.col("subj_canonical").alias("s"),
            F.col("obj_canonical").alias("o"),
        )
        .distinct()
    )


def resolve_functional_conflicts(
    edges: DataFrame,
    pred_map: DataFrame | None = None,
    min_functionality: float = 0.8,
) -> DataFrame:
    """Knowledge fusion for near-functional relations: for every
    canonical predicate whose measured ``functionality`` ≥ the
    threshold, a subject asserting SEVERAL distinct objects is a
    conflict (a near-functional relation should map each subject to one
    object), and the resolution keeps the best-evidenced object —
    ranked by (distinct conversations DESC, evidence rows DESC, object
    ASC): independent corroboration beats within-conversation
    repetition beats the lexicographic tie-break.  The knowledge-vault
    style fusion stage (Dong et al. 2014) run right after
    canonicalization, downstream of the ``functionality`` profile this
    module already emits.

    Emits ONE row per conflicting (predicate, subject): the kept object
    with its evidence, plus the conflict width (``n_objects``) and the
    evidence total across all asserted objects — the audit columns a
    human reviewer or a downstream confidence model consumes.
    Subjects without conflicts are silent (their single object needs no
    resolution).

    Distributed shape: one (pred, subj, obj) evidence aggregate, the
    functionality profile (dimension-sized) broadcast as a semi-join
    filter, one (pred, subj)-keyed window for the argmax — group size
    is the per-subject object fan-out, never corpus-sized.  The rank
    order is a deterministic total order (obj is unique within the
    group), so the SQL oracle replays it bit-for-bit.

    No reference analog (the reference stops at triple emission,
    de_pipeline/pipeline.py:69-77); beyond-reference KG-quality surface.
    """
    linked = edges.where(
        F.col("subj_canonical").isNotNull()
        & F.col("obj_canonical").isNotNull()
    )
    if pred_map is not None:
        linked = linked.join(F.broadcast(pred_map), "pred", "left")
    per_obj = (
        linked.select(
            F.coalesce("pred_canonical", "pred").alias("pred_canonical"),
            "conv_id",
            "subj_canonical",
            "obj_canonical",
        )
        .groupBy("pred_canonical", "subj_canonical", "obj_canonical")
        .agg(
            F.count(F.lit(1)).alias("n_evidence"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
    )
    functional = functionality(edges, pred_map).where(
        F.col("functionality") >= F.lit(float(min_functionality))
    )
    cand = per_obj.join(
        F.broadcast(functional.select("pred_canonical")),
        "pred_canonical",
        "left_semi",
    )
    w = Window.partitionBy("pred_canonical", "subj_canonical")
    w_rank = w.orderBy(
        F.desc("n_convs"), F.desc("n_evidence"), F.asc("obj_canonical")
    )
    ranked = cand.select(
        "*",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w).alias("n_objects"),
        F.sum("n_evidence").over(w).alias("total_evidence"),
    )
    return (
        ranked.where((F.col("rk") == 1) & (F.col("n_objects") > 1))
        .select(
            "pred_canonical",
            F.col("subj_canonical").alias("subj"),
            F.col("obj_canonical").alias("kept_obj"),
            "n_objects",
            F.col("n_convs").alias("kept_convs"),
            F.col("n_evidence").alias("kept_evidence"),
            "total_evidence",
        )
    )


def mine_rules(
    edges: DataFrame,
    pred_map: DataFrame | None = None,
    min_support: int = 2,
) -> DataFrame:
    """AMIE-style 1-hop horn rules over the canonical edge table.

    Mines both rule shapes a single body atom supports (Galarraga et al.
    2013, AMIE):

    * ``same``:    body(x, y) => head(x, y)
    * ``inverse``: body(x, y) => head(y, x)  (body == head is the
      symmetry test for a predicate)

    over the DISTINCT resolved fact set (subj_canonical,
    pred_canonical, obj_canonical) — multiplicity is evidence strength,
    not logical truth, so facts dedup before mining.  Per rule:

    * ``support``        = #distinct entity pairs satisfying body AND head
    * ``confidence``     = support / #pairs satisfying the body (std conf)
    * ``pca_confidence`` = support / #body pairs whose HEAD SUBJECT (x
      for ``same``, y for ``inverse``) has ANY head-predicate fact —
      AMIE's partial-completeness denominator: open-world
      incompleteness doesn't count against the rule
    * ``head_coverage``  = support / #pairs satisfying the head

    The degenerate instantiation where the body atom IS the head fact
    (inverse rules with body == head on a self-loop x == y) is excluded,
    otherwise reflexive facts would certify their own symmetry.

    Distributed shape: the fact table self-joins keyed on the ENTITY
    PAIR — (s, o) for ``same``, (s, o) = (o', s') for ``inverse`` — so
    each shuffle key's group is bounded by the predicate vocabulary on
    that pair, never by corpus size; rule aggregation and the per-pred
    denominators are dimension-sized (#pred^2 and #pred rows) and join
    back by broadcast.  No all-pairs product anywhere; at 100 TB the
    working set is the distinct-fact table moving through two hash
    joins.  No reference analog (the reference stops at triple emission,
    de_pipeline/pipeline.py:69-77); beyond-reference KG-quality surface.
    """
    facts = _resolved_facts(edges, pred_map)
    n_pairs = facts.groupBy("p").agg(F.count(F.lit(1)).alias("n"))

    body = facts.select(
        F.col("p").alias("body_pred"), "s", "o"
    )
    head_same = facts.select(F.col("p").alias("head_pred"), "s", "o")
    same = (
        body.join(head_same, ["s", "o"])
        .where(F.col("body_pred") != F.col("head_pred"))
        .groupBy("body_pred", "head_pred")
        .agg(F.count(F.lit(1)).alias("support"))
        .select("*", F.lit("same").alias("direction"))
    )
    head_inv = facts.select(
        F.col("p").alias("head_pred"),
        F.col("o").alias("s"),
        F.col("s").alias("o"),
    )
    inverse = (
        body.join(head_inv, ["s", "o"])
        .where(
            (F.col("body_pred") != F.col("head_pred"))
            | (F.col("s") != F.col("o"))
        )
        .groupBy("body_pred", "head_pred")
        .agg(F.count(F.lit(1)).alias("support"))
        .select("*", F.lit("inverse").alias("direction"))
    )
    rules = same.unionByName(inverse).where(
        F.col("support") >= F.lit(int(min_support))
    )
    # PCA denominators: body facts whose head-subject (s for `same`,
    # o for `inverse`) is a known head_pred subject — keyed on one
    # entity, group sizes bounded by the predicate vocabulary
    head_subj = facts.select(
        F.col("p").alias("head_pred"), F.col("s").alias("hs")
    ).distinct()
    pca_same = (
        body.join(head_subj, body["s"] == head_subj["hs"])
        .groupBy("body_pred", "head_pred")
        .agg(F.count(F.lit(1)).alias("n_pca"))
        .select("*", F.lit("same").alias("direction"))
    )
    pca_inv = (
        body.join(head_subj, body["o"] == head_subj["hs"])
        .groupBy("body_pred", "head_pred")
        .agg(F.count(F.lit(1)).alias("n_pca"))
        .select("*", F.lit("inverse").alias("direction"))
    )
    n_pca = pca_same.unionByName(pca_inv)
    return (
        rules.join(n_pca, ["body_pred", "head_pred", "direction"])
        .join(
            F.broadcast(n_pairs.select(F.col("p").alias("body_pred"),
                                       F.col("n").alias("n_body_pairs"))),
            "body_pred",
        )
        .join(
            F.broadcast(n_pairs.select(F.col("p").alias("head_pred"),
                                       F.col("n").alias("n_head_pairs"))),
            "head_pred",
        )
        .select(
            "body_pred",
            "head_pred",
            "direction",
            "support",
            "n_body_pairs",
            F.round(F.col("support") / F.col("n_body_pairs"), 6).alias(
                "confidence"
            ),
            F.round(F.col("support") / F.col("n_pca"), 6).alias(
                "pca_confidence"
            ),
            F.round(F.col("support") / F.col("n_head_pairs"), 6).alias(
                "head_coverage"
            ),
        )
    )

def _chain_bodies(
    facts: DataFrame,
    bridge_fanout: int | None,
    max_mid_degree: int | None,
) -> DataFrame:
    """Distinct sampled chain bodies (body_pred1, body_pred2, x, y) —
    the shared enumeration of ``mine_chain_rules`` and
    ``apply_chain_rules`` (one code path, so the application can never
    see a body the miner didn't)."""
    a1 = facts.select(
        F.col("p").alias("body_pred1"),
        F.col("s").alias("x"),
        F.col("o").alias("z"),
    )
    a2 = facts.select(
        F.col("p").alias("body_pred2"),
        F.col("s").alias("z"),
        F.col("o").alias("y"),
    )
    if max_mid_degree is not None:
        in_deg = facts.groupBy(F.col("o").alias("z")).agg(
            F.count(F.lit(1)).alias("ind")
        )
        out_deg = facts.groupBy(F.col("s").alias("z")).agg(
            F.count(F.lit(1)).alias("outd")
        )
        mids = in_deg.join(out_deg, "z").where(
            F.greatest("ind", "outd") <= F.lit(int(max_mid_degree))
        )
        a1 = a1.join(mids.select("z"), "z", "left_semi")
    if bridge_fanout is not None:
        k = int(bridge_fanout)
        w_in = Window.partitionBy("z").orderBy("body_pred1", "x")
        a1 = (
            a1.withColumn("rk", F.row_number().over(w_in))
            .where(F.col("rk") <= k)
            .drop("rk")
        )
        w_out = Window.partitionBy("z").orderBy("body_pred2", "y")
        a2 = (
            a2.withColumn("rk", F.row_number().over(w_out))
            .where(F.col("rk") <= k)
            .drop("rk")
        )
    return (
        a1.join(a2, "z")
        .where(
            (F.col("x") != F.col("y"))
            & (F.col("z") != F.col("x"))
            & (F.col("z") != F.col("y"))
        )
        .select("body_pred1", "body_pred2", "x", "y")
        .distinct()
    )


def mine_chain_rules(
    edges: DataFrame,
    pred_map: DataFrame | None = None,
    min_support: int = 2,
    max_mid_degree: int | None = None,
    bridge_fanout: int | None = 64,
) -> DataFrame:
    """AMIE chain rules p1(x, z) ∧ p2(z, y) ⇒ p3(x, y) over the
    canonical fact set (Galarraga et al. 2013 §2: the closed 2-atom
    body, the rule shape that completes transitive/compositional
    relations 1-hop mining can't see).  x, z, y pairwise distinct —
    proper 3-node chains, so a self-loop can never certify its own
    composition.  Per rule:

    * ``support``        = #distinct (x, y) with a body path AND the head
    * ``n_body_pairs``   = #distinct (x, y) with a body path
    * ``confidence``     = support / n_body_pairs (standard CWA conf)
    * ``pca_confidence`` = support / #body pairs whose x has ANY p3 fact
      — AMIE's partial-completeness denominator: a body pair only
      counts against the rule if the KB knows at least one p3 object
      for its subject, so open-world incompleteness stops masquerading
      as a counter-example
    * ``head_coverage``  = support / #head facts

    Distributed shape: atom1 ⋈ atom2 keyed on the BRIDGE entity z, then
    the distinct (p1, p2, x, y) body table joins the head facts keyed on
    the entity pair; rule aggregation and both denominators are
    dimension-sized (≤ #pred³ + #pred rows) and join back by broadcast.

    The body enumeration is inherently quadratic in bridge degree
    (in_deg(z)·out_deg(z) paths through z), and KG bridges are exactly
    the hot entities — on the transcript corpus EVERY bridge has degree
    ≥ ~10³, so a degree cap is all-or-nothing.  ``bridge_fanout``
    instead bounds the per-bridge SAMPLE: each bridge contributes its
    first ``bridge_fanout`` in-facts (ordered by (p1, x)) × first
    ``bridge_fanout`` out-facts (ordered by (p2, y)) — ≤ fanout² paths
    per bridge however hot it is, the AMIE+ sampling idea under a
    deterministic total order (facts are distinct, so the rank is
    unique and the SQL oracle replays it bit-for-bit).  support /
    confidence are then estimates over the sampled body (head
    denominators keep full counts); ``max_mid_degree`` additionally
    drops bridges above a degree cap entirely (off by default).  The
    body table is persisted once (three consumers: denominator rollup,
    head join, PCA join).

    No reference analog (the reference stops at triple emission,
    de_pipeline/pipeline.py:69-77); beyond-reference KG-quality surface.
    """
    from . import cache

    facts = _resolved_facts(edges, pred_map)
    body = cache.track(_chain_bodies(facts, bridge_fanout, max_mid_degree))
    return _rules_from_body(facts, body, min_support)


def _rules_from_body(
    facts: DataFrame, body: DataFrame, min_support: int
) -> DataFrame:
    """Rule scoring over a precomputed (tracked) body table — split out of
    ``mine_chain_rules`` so ``apply_chain_rules`` can reuse ONE body
    enumeration for both mining and application (the bridge-keyed
    enumeration is the dominant fanout join; round 6, advisor item)."""
    n_pairs = facts.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    n_body = body.groupBy("body_pred1", "body_pred2").agg(
        F.count(F.lit(1)).alias("n_body_pairs")
    )
    head = facts.select(
        F.col("p").alias("head_pred"),
        F.col("s").alias("x"),
        F.col("o").alias("y"),
    )
    support = (
        body.join(head, ["x", "y"])
        .groupBy("body_pred1", "body_pred2", "head_pred")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= F.lit(int(min_support)))
    )
    # PCA denominator: body pairs whose x is a known p3 subject —
    # keyed on x alone, group sizes bounded by the predicate vocabulary
    head_subj = facts.select(
        F.col("p").alias("head_pred"), F.col("s").alias("x")
    ).distinct()
    n_pca = (
        body.join(head_subj, "x")
        .groupBy("body_pred1", "body_pred2", "head_pred")
        .agg(F.count(F.lit(1)).alias("n_pca_pairs"))
    )
    return (
        support.join(n_pca, ["body_pred1", "body_pred2", "head_pred"])
        .join(
            F.broadcast(n_body), ["body_pred1", "body_pred2"]
        )
        .join(
            F.broadcast(
                n_pairs.select(
                    F.col("p").alias("head_pred"),
                    F.col("n").alias("n_head_pairs"),
                )
            ),
            "head_pred",
        )
        .select(
            "body_pred1",
            "body_pred2",
            "head_pred",
            "support",
            "n_body_pairs",
            F.round(F.col("support") / F.col("n_body_pairs"), 6).alias(
                "confidence"
            ),
            F.round(F.col("support") / F.col("n_pca_pairs"), 6).alias(
                "pca_confidence"
            ),
            F.round(F.col("support") / F.col("n_head_pairs"), 6).alias(
                "head_coverage"
            ),
        )
    )


def apply_chain_rules(
    edges: DataFrame,
    pred_map: DataFrame | None = None,
    min_support: int = 2,
    min_pca: float = 0.5,
    bridge_fanout: int | None = 64,
    max_mid_degree: int | None = None,
) -> DataFrame:
    """KB completion by rule application — the consumer of
    ``mine_chain_rules``: every sampled body path (x, z, y) whose
    (p1, p2) matches a mined rule predicts head_pred(x, y); predictions
    already present in the fact set are dropped (only NEW facts emit),
    and a fact derivable by several rules keeps its best score.

    Per predicted fact: ``n_rules`` = #distinct rules deriving it and
    ``score`` = max PCA confidence among them — PCA, not CWA, because
    prediction is exactly the open-world regime the PCA denominator
    models (Galarraga et al. 2013 §5 rank facts the same way).  Rules
    are filtered to ``min_pca`` before application so the candidate set
    is support-bearing, not the full body×predicate product.

    Distributed shape: ONE body enumeration under the SAME
    fanout/degree-cap parameters serves both mining and application
    (tracked persist — the bridge-keyed fanout join is the dominant
    cost and previously ran twice; round 6, advisor item), the filtered
    rule table is dimension-sized and broadcast onto the body pairs,
    and the known-fact filter is one anti-join keyed on
    (pred, subj, obj).  Deterministic end-to-end, so the SQL oracle
    replays mining AND application bit-for-bit.

    No reference analog (the reference stops at triple emission,
    de_pipeline/pipeline.py:69-77); beyond-reference KG-quality surface.
    """
    from . import cache

    facts = _resolved_facts(edges, pred_map)
    body = cache.track(_chain_bodies(facts, bridge_fanout, max_mid_degree))
    rules = _rules_from_body(facts, body, min_support).where(
        F.col("pca_confidence") >= F.lit(float(min_pca))
    )
    cand = body.join(
        F.broadcast(
            rules.select(
                "body_pred1", "body_pred2", "head_pred", "pca_confidence"
            )
        ),
        ["body_pred1", "body_pred2"],
    )
    known = facts.select(
        F.col("p").alias("head_pred"),
        F.col("s").alias("x"),
        F.col("o").alias("y"),
    )
    return (
        cand.join(known, ["head_pred", "x", "y"], "left_anti")
        .groupBy("head_pred", "x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_rules"),
            F.max("pca_confidence").alias("score"),
        )
        .select(
            F.col("head_pred").alias("pred"),
            F.col("x").alias("subj"),
            F.col("y").alias("obj"),
            "n_rules",
            "score",
        )
    )


def entity_salience(edges: DataFrame, top_k: int = 5) -> DataFrame:
    """TF-IDF entity salience per conversation over the canonical edge
    table: which entities a conversation is ABOUT, down-weighted by how
    ubiquitous each entity is across the corpus.

        tf(c, e)   = #edge endpoints of entity e in conversation c
        df(e)      = #distinct conversations whose edges touch e
        salience   = tf * ln(N / df),  N = #conversations with any edge

    Returns the ``top_k`` entities per conversation ranked by
    (salience desc, entity asc) — the deterministic headline row a
    conversation-indexing or retrieval stage consumes.

    Distributed shape: endpoints explode row-locally (2 rows per edge),
    tf is one map-side-combined groupBy on (conv, entity); df is a
    groupBy on the entity key joined back BY KEY (not broadcast — the
    entity table can be billions of rows at corpus scale, so this stays
    a hash join keyed on the entity); N is a single scalar aggregate;
    the final window partitions by conversation, whose group size is
    bounded by the per-conversation entity count, never the corpus.  No
    reference analog (the reference stops at triple emission,
    de_pipeline/pipeline.py:69-77).
    """
    ends = (
        edges.select(
            "conv_id",
            F.explode(
                F.array(F.col("subj_canonical"), F.col("obj_canonical"))
            ).alias("entity"),
        )
        .where(F.col("entity").isNotNull())
    )
    tf = ends.groupBy("conv_id", "entity").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = tf.groupBy("entity").agg(F.count(F.lit(1)).alias("df"))
    n_convs = tf.select("conv_id").distinct().agg(
        F.count(F.lit(1)).alias("n_convs")
    )
    scored = (
        tf.join(df, "entity")
        .crossJoin(F.broadcast(n_convs))
        .select(
            "conv_id",
            "entity",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_convs") / F.col("df")), 6
            ).alias("salience"),
        )
    )
    ranked = scored.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy("conv_id").orderBy(
                F.desc("salience"), F.asc("entity")
            )
        )
        .alias("rank"),
    )
    return ranked.where(F.col("rank") <= F.lit(int(top_k)))


def verbalize(edges: DataFrame) -> DataFrame:
    """KG-to-text verbalization: the KELM-style (Agarwal et al. 2021,
    "Knowledge Graph Based Synthetic Corpus Generation") training-data
    export — every distinct fact renders to one template sentence and each
    canonical subject's facts concatenate into a deterministic description
    paragraph, the corpus a KG-grounded pretraining mix ingests.

    Rendering is native Column work (NEG__ prefix → "not ", predicate dots
    → spaces, terminal period); the paragraph is
    ``sort_array(collect_list(sentence))`` joined by single spaces, so the
    output is independent of partitioning and join order.  Plan: one
    distinct on (subject, sentence) + one groupBy on the canonical subject
    — both keyed on entity-bounded columns, map-side combined; no UDFs.

    Output: (subj_canonical, n_facts, description) with n_facts the count
    of distinct rendered sentences.
    """
    pred_txt = F.regexp_replace(F.col("pred"), r"^NEG__", "not ")
    pred_txt = F.regexp_replace(pred_txt, r"\.", " ")
    sentence = F.concat(
        F.concat_ws(" ", F.col("subj"), pred_txt, F.col("obj")), F.lit(".")
    )
    sents = edges.select(
        "subj_canonical", sentence.alias("sentence")
    ).distinct()
    return sents.groupBy("subj_canonical").agg(
        F.count(F.lit(1)).alias("n_facts"),
        F.array_join(F.sort_array(F.collect_list("sentence")), " ").alias(
            "description"
        ),
    )


def fact_intervals(edges: DataFrame, turns: DataFrame) -> DataFrame:
    """Temporal KG: per canonical fact the observation interval.

    Each edge row carries the extraction lineage keys (conv_id, turn_idx);
    joining them back to the transcripts' event time gives every fact an
    observation timestamp, and the rollup per DISTINCT resolved
    (subj_canonical, pred_canonical, obj_canonical) yields
    ``first_seen`` / ``last_seen`` plus observation and conversation
    counts — the table an incremental KG build uses for fact aging,
    recency-weighted fusion, and snapshot validity intervals.

    Scale: one corpus-keyed equi-join (edges ⋈ turns on the lineage key —
    both sides hash-partition on conv_id, no skew beyond conversation
    length, which AQE splits) followed by one fact-keyed aggregate whose
    output is graph-sized.  No UDFs.
    """
    linked = edges.where(
        F.col("subj_canonical").isNotNull()
        & F.col("obj_canonical").isNotNull()
    ).select(
        "conv_id",
        "turn_idx",
        "subj_canonical",
        F.coalesce("pred_canonical", "pred").alias("pred_canonical"),
        "obj_canonical",
    )
    ts = turns.select("conv_id", "turn_idx", "ts")
    return (
        linked.join(ts, ["conv_id", "turn_idx"])
        .groupBy("subj_canonical", "pred_canonical", "obj_canonical")
        .agg(
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.count(F.lit(1)).alias("n_observations"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
    )


def fact_conflicts(edges: DataFrame, turns: DataFrame) -> DataFrame:
    """KB-consistency over time: subjects whose object CHANGES under a
    predicate, with the change count along the event-time observation
    sequence.

    ``functionality`` (above) counts violating subjects statically; this
    orders each (pred, subj) group's observations by a total key
    (ts, then the edge natural key) and counts transitions where the
    object differs from the previous observation — distinguishing a
    value that legitimately evolved (few changes, e.g. an attribute
    updated mid-corpus) from interleaved contradiction (many changes).
    Output per (pred_canonical, subj_canonical) with >1 distinct object:
    distinct-object / observation / change counts plus the first and
    last observed object.

    Scale: one shuffle on (pred, subj) serving both the window and the
    aggregate (same key); group size is bounded by a subject's edge
    count under one predicate.  The ordering key is total (the edge
    natural key is unique), so ``lag`` is deterministic under any
    partitioning.
    """
    keys = ["pred_canonical", "subj_canonical"]
    order = [F.col(c) for c in
             ("ts", "conv_id", "turn_idx", "sent_idx", "rel_idx")]
    linked = edges.where(
        F.col("subj_canonical").isNotNull()
        & F.col("obj_canonical").isNotNull()
    ).select(
        "conv_id", "turn_idx", "sent_idx", "rel_idx",
        "subj_canonical",
        F.coalesce("pred_canonical", "pred").alias("pred_canonical"),
        "obj_canonical",
    ).join(turns.select("conv_id", "turn_idx", "ts"),
           ["conv_id", "turn_idx"])
    w = Window.partitionBy(*keys).orderBy(*order)
    seq = linked.select(
        *keys,
        "obj_canonical",
        F.lag("obj_canonical").over(w).alias("prev_obj"),
        F.row_number().over(w).alias("rn"),
    )
    grp = seq.groupBy(*keys).agg(
        F.countDistinct("obj_canonical").alias("n_objects"),
        F.count(F.lit(1)).alias("n_observations"),
        F.sum(
            F.when(
                F.col("prev_obj").isNotNull()
                & (F.col("prev_obj") != F.col("obj_canonical")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        F.max(F.when(F.col("rn") == 1, F.col("obj_canonical"))).alias(
            "first_obj"
        ),
        F.max_by("obj_canonical", "rn").alias("last_obj"),
    )
    return grp.where(F.col("n_objects") > 1)
