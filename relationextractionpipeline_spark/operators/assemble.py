"""W2 — window-ordered document (conversation) assembly.

The reference receives whole articles and explodes them into lines
(``preprocessing.py:59``); transcripts arrive as shuffled turn rows, so the
new engine runs the inverse: group by ``conv_id`` and order by ``turn_idx``
(SURVEY.md §2.6 W2).  Implemented as one hash aggregation —
``groupBy(conv_id).agg(sort_array(collect_list(struct(turn_idx, ...))))`` —
i.e. a single shuffle on the conversation key with map-side partial
aggregation; no window-function sort-within-partition pass is needed.

Skew note: power-law conversation lengths make a few ``collect_list`` groups
hot.  At 10^12-turn scale the assembly shuffle keys on ``conv_id`` alone, so
AQE skew handling plus the generator-bounded turn cap keep group size sane;
the per-turn stages (segment/parse/extract) deliberately do NOT group by
conversation at all — they are embarrassingly parallel over turns, so long
conversations cost nothing there (see plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assemble_conversations(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_turns, turns sorted by turn_idx, doc_text).

    ``doc_text`` joins turn texts with '\\n' — the reference-parity corpus
    shape (an article's ``text`` is a '\\n'-joined blob, README.txt INPUT
    DATA FORMAT).
    """
    turn = F.struct(
        F.col("turn_idx"), F.col("role"), F.col("text"), F.col("tool"), F.col("ts")
    )
    return (
        transcripts.groupBy("conv_id")
        .agg(F.sort_array(F.collect_list(turn)).alias("turns"))
        .select(
            "conv_id",
            F.size("turns").alias("n_turns"),
            "turns",
            F.array_join(F.transform("turns", lambda t: t["text"]), "\n").alias(
                "doc_text"
            ),
        )
    )


def explode_back(assembled: DataFrame) -> DataFrame:
    """Inverse of assembly, for the per-turn text-equality invariant
    (BASELINE.md): exploding the assembled doc must reproduce every input
    row's text under stable (conv_id, turn_idx) ordering."""
    return assembled.select(
        "conv_id", F.inline("turns")
    ).select("conv_id", "turn_idx", "role", "text", "tool", "ts")
