"""Agent-transcript analytics — native-Column operators over the
(conv_id, turn_idx, role, text, tool, ts) input table itself.

The reference pipeline never looks at WHO produced a line (its corpus is
articles); agent transcripts carry role/tool/ts structure worth mining
before any NLP runs: which tools fire, in what order, and when.  Everything
here is window + groupBy — one hash shuffle each, no UDFs, survives any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """(prev_tool, tool, n_transitions) — the tool-call bigram graph.

    Tool-bearing turns (role='tool', non-empty tool) are ordered by
    ``turn_idx`` within each conversation; consecutive pairs count as a
    transition.  The window partitions by ``conv_id`` — exactly the
    conversation-bucketed shuffle the assembly stage uses, so at scale the
    two stages can share one partitioning.  First tool calls (no
    predecessor) are dropped, not emitted as NULL rows."""
    tools = transcripts.where(
        (F.col("role") == "tool") & (F.col("tool") != "")
    ).select("conv_id", "turn_idx", "tool")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        tools.withColumn("prev_tool", F.lag("tool").over(w))
        .where(F.col("prev_tool").isNotNull())
        .groupBy("prev_tool", "tool")
        .agg(F.count("*").alias("n_transitions"))
    )


def role_stats(transcripts: DataFrame) -> DataFrame:
    """Per-role turn counts, mean turn length and conversation reach —
    the corpus profile a curation pass reads first."""
    return (
        transcripts.groupBy("role")
        .agg(
            F.count("*").alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.round(F.avg(F.length("text")), 6).alias("mean_chars"),
        )
    )
