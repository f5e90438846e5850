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
