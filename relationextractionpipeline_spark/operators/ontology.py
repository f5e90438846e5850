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

    * ``support``       = #distinct entity pairs satisfying body AND head
    * ``confidence``    = support / #pairs satisfying the body (std conf)
    * ``head_coverage`` = support / #pairs satisfying the head

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
    linked = edges.where(
        F.col("subj_canonical").isNotNull()
        & F.col("obj_canonical").isNotNull()
    )
    if pred_map is not None:
        linked = linked.join(F.broadcast(pred_map), "pred", "left")
    facts = (
        linked.select(
            F.coalesce("pred_canonical", "pred").alias("p"),
            F.col("subj_canonical").alias("s"),
            F.col("obj_canonical").alias("o"),
        )
        .distinct()
    )
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
    return (
        rules.join(
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
            F.round(F.col("support") / F.col("n_head_pairs"), 6).alias(
                "head_coverage"
            ),
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
