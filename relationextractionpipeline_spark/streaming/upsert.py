"""Incremental KG maintenance: streamed triple extraction merging into a
governed table via the MERGE-INTO analog (sources/tableio.py).

The north rule's production loop — transcripts land continuously, the KG
table must stay current — is a streaming MERGE, not an append: a replayed
micro-batch (Structured Streaming's failure contract for ``foreachBatch``
is at-least-once) must not duplicate triples.  The composition here makes
the merge IDEMPOTENT instead of relying on sink transactionality:

* triple identity is the natural key ``(conv_id, turn_idx, sent_idx,
  rel_idx)`` — re-extracting the same turn yields the same keys;
* ``TableIO.upsert`` keeps one row per key, latest ``_version`` (= the
  micro-batch id) winning, update side winning ties — so replaying batch N
  rewrites identical rows and the table converges to the same state;
* with an Iceberg runtime the same call becomes a real ``MERGE INTO``
  against a snapshot; the parquet fallback stages + swaps (never
  overwriting a directory a lazy plan still reads).

This is the streaming counterpart of the batch graph tail.  Extraction is
incremental per micro-batch; since round 4 the canonical entity graph is
TOO (``stream_upsert_kg``): each micro-batch's links merge into the
maintained (refs, assign) state via quotient-graph CC
(operators/canonicalize.merge_entity_batch — exact, work scales with the
batch), so no periodic batch re-clustering job is needed.  Context-mode
linking under streaming lives in ``streaming/ctxlink.py``: a stateful
conversation closer re-batches the stream into complete conversations,
then the batch context scorer runs unchanged per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from relationextractionpipeline_spark.operators import fused
from relationextractionpipeline_spark.plans import schemas
from relationextractionpipeline_spark.sources.tableio import TableIO

TRIPLE_KEYS = ["conv_id", "turn_idx", "sent_idx", "rel_idx"]


def stream_upsert_triples(
    spark: SparkSession,
    input_dir: str,
    io: TableIO,
    table: str,
    checkpoint_dir: str,
    kb_bc,
    kb_index_bc,
    figer_bc,
    max_files_per_trigger: int = 8,
) -> None:
    """Drain transcript files into the ``table`` maintained by ``io``:
    fused extraction per micro-batch, then MERGE on the triple's natural
    key.  ``availableNow`` processes the current backlog and stops; the
    checkpoint carries the source offsets, so a later call only merges NEW
    files."""
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    triples = fused.extract_triples_fused(stream, kb_bc, kb_index_bc, figer_bc)

    def merge_batch(batch_df, batch_id: int) -> None:
        updates = batch_df.withColumn(
            "_version", F.lit(int(batch_id)).cast("long")
        )
        try:
            io.read(table)  # existence probe (parquet read raises on no dir)
            exists = True
        except Exception:  # noqa: BLE001 — first batch creates the table
            exists = False
        # probe OUTSIDE the upsert try: a real merge failure (e.g. a lost
        # commit race) must propagate, never fall through to an overwrite
        if exists:
            io.upsert(updates, table, keys=TRIPLE_KEYS, version_col="_version")
        else:
            io.write(updates, table, mode="overwrite")

    q = (
        triples.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_kg(
    spark: SparkSession,
    input_dir: str,
    io: TableIO,
    checkpoint_dir: str,
    kb_bc,
    kb_index_bc,
    figer_bc,
    triple_table: str = "triples",
    refs_table: str = "entity_refs",
    assign_table: str = "entity_assign",
    sigs_table: str = "entity_sigs",
    max_files_per_trigger: int = 8,
) -> None:
    """Maintain the FULL KG incrementally: per micro-batch, triples MERGE on
    their natural key AND the canonical entity graph grows by quotient-graph
    CC (canonicalize.merge_entity_batch) — no periodic batch re-clustering.

    Replay safety under foreachBatch's at-least-once contract, per table:

    * triples — the natural-key MERGE dedupes (stream_upsert_triples);
    * entity graph — ``merge_entity_batch`` is idempotent by construction
      (replayed reference rows anti-join ``refs`` away, so a replay is the
      empty merge).  ``assign`` is written BEFORE ``refs``: if a kill lands
      between the two writes, the replay re-derives the batch's pair
      evidence (rows are absent from ``refs``), finds every quotient edge
      already contracted to a self-loop by the updated ``assign``, and
      converges — the reverse order would lose the batch's keys forever.
      ``sigs`` (the persisted minhash cache that keeps merges from
      re-sketching history) is written LAST: a kill before it lands leaves
      sigs missing the batch's rows, and the next merge self-heals by
      sketching exactly the missing rows (extra sigs rows are filtered
      against ``refs``, so no order corrupts results).  All writes are
      staged-swap snapshots (TableIO.replace), so a kill mid-write never
      corrupts the current table.

    The link scorer runs in default max-prior mode, which is row-local:
    micro-batch boundaries (which can split a conversation across batches)
    cannot change link decisions.  Context-mode scoring would need
    conversation-complete batches — sessionize upstream before asking for it.
    """
    from relationextractionpipeline_spark.operators import (
        cache,
        canonicalize,
        link,
    )

    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def merge_batch(batch_df, batch_id: int) -> None:
        batch_df = batch_df.persist()
        _scope = cache.scope()  # frees only THIS batch's tracked frames
        _scope.__enter__()
        try:
            n_turns = batch_df.count()
            if n_turns == 0:
                return
            triples = fused.extract_triples_fused(
                batch_df, kb_bc, kb_index_bc, figer_bc
            ).withColumn("_version", F.lit(int(batch_id)).cast("long"))
            try:
                io.read(triple_table)  # existence probe
                exists = True
            except Exception:  # noqa: BLE001 — first batch creates the table
                exists = False
            # probe OUTSIDE the upsert try: a real merge failure (e.g. a
            # lost commit race) must propagate, never silently overwrite
            if exists:
                io.upsert(
                    triples, triple_table, keys=TRIPLE_KEYS, version_col="_version"
                )
            else:
                io.write(triples, triple_table, mode="overwrite")

            mentions = fused.mention_rows_fused(batch_df, kb_index_bc)
            links = link.score_links_grouped(
                mentions,
                kb_bc,
                figer_bc,
                n_groups=link.groups_for(
                    n_turns * 5, spark.sparkContext.defaultParallelism
                ),
            )
            # existence probe OUTSIDE the merge, like the triple-table probe
            # above: a real merge failure must propagate — the old shape
            # (probe + merge in one try) silently rebuilt the state from
            # this batch alone, discarding the accumulated graph
            try:
                prior = canonicalize.EntityGraphState(
                    refs=io.read(refs_table), assign=io.read(assign_table)
                )
            except Exception:  # noqa: BLE001 — first batch builds the state
                prior = None
            if prior is not None:
                try:  # sigs optional: absent/partial self-heals in merge
                    sigs = io.read(sigs_table)
                except Exception:  # noqa: BLE001
                    sigs = None
                state = canonicalize.merge_entity_batch(
                    prior._replace(sigs=sigs), links
                )
            else:
                state = canonicalize.entity_graph_state(links)
            # merge outputs are EAGERLY localCheckpoint-ed, so nothing below
            # still reads the directories being replaced
            io.replace(state.assign, assign_table)  # assign FIRST (see above)
            io.replace(state.refs, refs_table)
            io.replace(state.sigs, sigs_table)  # sigs LAST (see above)
        finally:
            # free THIS batch's persists/checkpoints now that the snapshots
            # are on disk — state working set stays O(one batch) across the
            # drain.  Scope-exit, NOT release_all(checkpoints=True): that
            # freed EVERY registered checkpoint in the session, killing any
            # other operator's live lineage-truncated frames (bpe.py:260's
            # documented discipline)
            _scope.__exit__(None, None, None)
            batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
