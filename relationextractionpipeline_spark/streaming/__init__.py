"""Structured Streaming — deliberately out of scope (SURVEY.md §2.9).

The reference is a pure batch pipeline over files on disk: no watermarks,
event-time windows, session windows, state stores, or late-data semantics
exist anywhere in it, and BASELINE.json's north rule is likewise batch
(tables in → tables out).  The only stream-adjacent requirement is
*resumability*, which lives in plans/manifests.py (per-stage checkpoint
manifests with per-partition lineage + counters).

If a streaming ingest were added later, the natural seams already exist:
``readStream`` on the transcripts table → the same narrow extract path
(every stage is a per-row pure function, so it lifts to a streaming query
unchanged) → ``writeStream`` with ``foreachBatch`` for the edges sink;
conversation assembly (the only stateful piece) would become
``applyInPandasWithState`` keyed by conv_id with an event-time watermark on
``ts``.
"""
