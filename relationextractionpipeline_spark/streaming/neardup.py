"""Streaming near-duplicate dedup maintenance — continuous corpus
ingestion keeps the minhash cluster assignment current, the near-dup
analog of the exact ``streaming/dedup.py`` path and the KG maintenance in
``streaming/upsert.py``.

Per micro-batch, ``dedup.merge_doc_batch`` merges the new documents into
the maintained (``sigs``, ``assign``) state: new signatures probe the
union's LSH buckets (batch-sized candidate work), new pair evidence
contracts onto prior cluster labels, CC runs on the quotient — the
composed assignment EQUALS a one-shot ``near_dup_clusters`` over
everything ingested so far (cap-free regime; see the exactness note in
``operators/dedup.py``).

Replay safety under foreachBatch's at-least-once contract:
``merge_doc_batch`` is idempotent (replayed ids anti-join ``sigs`` away),
and ``assign`` is written BEFORE ``sigs`` — a kill between the two writes
replays the batch, whose quotient edges are already contracted to
self-loops by the updated ``assign``, and converges.  Both writes are
staged-swap snapshots (``TableIO.replace``), so a kill mid-write never
corrupts the current table.

Downstream consumers read ``assign`` directly: survivors are the rows
with ``doc_id == cluster_id`` (the same min-id winner rule as the batch
operator), so the maintained table doubles as the dedup filter for any
incremental training-data export.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from relationextractionpipeline_spark.operators import cache, dedup
from relationextractionpipeline_spark.sources.tableio import TableIO


def stream_neardup_docs(
    spark: SparkSession,
    input_dir: str,
    io: TableIO,
    checkpoint_dir: str,
    schema,
    sigs_table: str = "doc_sigs",
    assign_table: str = "doc_clusters",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 8,
    **dedup_params,
) -> None:
    """Drain ``input_dir`` and maintain the near-dup cluster state tables;
    stops when the backlog is drained (availableNow)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def merge_batch(batch_df, batch_id: int) -> None:
        batch_df = batch_df.persist()
        _scope = cache.scope()  # frees only THIS batch's tracked frames
        _scope.__enter__()
        try:
            if batch_df.count() == 0:
                return
            try:
                state = dedup.DocDedupState(
                    sigs=io.read(sigs_table), assign=io.read(assign_table)
                )
                exists = True
            except Exception:  # noqa: BLE001 — first batch builds the state
                exists = False
            # probe OUTSIDE the merge: a real merge failure must propagate,
            # never silently fall back to a from-scratch overwrite
            if exists:
                state = dedup.merge_doc_batch(
                    state, batch_df, id_col=id_col, text_col=text_col,
                    **dedup_params,
                )
            else:
                state = dedup.doc_dedup_state(
                    batch_df, id_col=id_col, text_col=text_col,
                    **dedup_params,
                )
            # merge outputs are eagerly checkpointed, so nothing below still
            # reads the directories being replaced; assign FIRST (see module
            # docstring)
            io.replace(state.assign, assign_table)
            io.replace(state.sigs, sigs_table)
        finally:
            # scope-exit, NOT release_all: free only THIS batch's frames
            # (release_all killed other operators' live checkpoints)
            _scope.__exit__(None, None, None)
            batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
