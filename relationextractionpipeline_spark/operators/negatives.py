"""Negative sampling for KG-embedding training (TransE/DistMult-style):
for every true (subj, pred, obj) triple, K corrupted-object candidates —
the other half of every margin/contrastive KG-embedding batch.

Design constraints, in order:

* **Deterministic**: the k-th candidate for a triple is a pure function
  of (triple, k) via the corpus-wide md5 primitive
  (``sampling.hash_bucket``) — reproducible across runs, engines, and
  partitionings, so the DuckDB oracle re-derives every candidate exactly.
* **Filtered** (Bordes et al. 2013): candidates equal to the true object
  or colliding with ANY true triple are dropped (an unfiltered "negative"
  that is actually true teaches the model the wrong margin).  The filter
  is one anti-join against the true-triple set.
* **Scale-safe**: the entity dimension gets a global dense index via the
  two-phase distributed cumsum (``packing.pack_sequences`` with unit
  sizes — pack_id IS the 0-based rank), never a single-partition window;
  candidate → entity resolution is an equi-join on that index.  Triples
  never self-join.

No reference analog (the reference emits triples and stops); this is the
operator a KG-embedding training pipeline runs right after
materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import packing
from .sampling import hash_bucket


def entity_index(entities: DataFrame, ent_col: str = "canonical_id") -> DataFrame:
    """(entity, ent_idx): dense 0-based rank under entity-id order, built
    with the distributed cumsum (SQL equivalent: row_number() - 1)."""
    return packing.pack_sequences(
        entities.select(ent_col).distinct().withColumn("_one", F.lit(1)),
        "_one",
        ctx_len=1,
        id_col=ent_col,
    ).select(ent_col, F.col("pack_id").alias("ent_idx"))


def negative_samples(
    triples: DataFrame,
    entities: DataFrame,
    k: int = 3,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    ent_col: str = "canonical_id",
    salt: str = "negs",
) -> DataFrame:
    """K filtered corrupted-object candidates per distinct true triple:
    (subj, pred, obj, neg_k, neg_obj).  Candidates that equal the true
    object or form another TRUE triple are filtered, so output rows per
    triple range 0..K (the training loader treats K as a budget)."""
    true_t = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"),
        F.col(obj).alias("obj"),
    ).where(
        F.col(subj).isNotNull() & F.col(obj).isNotNull()
    ).distinct()
    idx = entity_index(entities, ent_col)
    n_ents = idx.count()
    if n_ents == 0:
        return true_t.select(
            "subj", "pred", "obj",
            F.lit(0).alias("neg_k"), F.lit(None).cast("string").alias("neg_obj"),
        ).limit(0)
    cands = true_t.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("neg_k")
    ).withColumn(
        "_neg_idx",
        hash_bucket(
            F.concat_ws("|", "subj", "pred", "obj", "neg_k"), salt
        ) % F.lit(int(n_ents)),
    )
    out = (
        cands.join(
            # entity dimension broadcasts while it fits; beyond that the
            # equi-join on ent_idx shuffles both sides on the index
            F.broadcast(idx) if n_ents <= 1_000_000 else idx,
            cands["_neg_idx"] == idx["ent_idx"],
        )
        .select(
            "subj", "pred", "obj", "neg_k", F.col(ent_col).alias("neg_obj")
        )
        .where(F.col("neg_obj") != F.col("obj"))
    )
    # filtered negatives: drop candidates that are themselves true triples
    return out.join(
        true_t.select(
            F.col("subj").alias("_ts"), F.col("pred").alias("_tp"),
            F.col("obj").alias("_to"),
        ),
        (F.col("subj") == F.col("_ts"))
        & (F.col("pred") == F.col("_tp"))
        & (F.col("neg_obj") == F.col("_to")),
        "left_anti",
    )
