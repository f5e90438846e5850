"""Instruction-tuning pair extraction from multi-turn transcripts.

The last-mile training-data operation for the transcripts input shape
(conv_id, turn_idx, role, text, …): every user→assistant adjacency becomes
one (prompt, response) SFT example, with the preceding turns rendered into
a bounded context window the way a chat template would.  No reference
analog (the reference extracts triples, not training pairs); part of the
training-data operator family the 100 TB pipeline feeds.

Scale shape: ONE hash shuffle on conv_id feeds both window functions
(adjacency lead + context frame share the same (conv_id, turn_idx) window
spec, so Catalyst plans a single Exchange + single Window); everything
else is row-local native Column work — no UDFs, no collects.  Skewed
conversation lengths bound the context cost at ``ctx_turns`` rows per
output pair regardless of conversation length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sft_pairs(
    turns: DataFrame,
    ctx_turns: int = 3,
    min_response_words: int = 3,
) -> DataFrame:
    """(prompt, response) pairs from a transcripts table.

    A pair is an adjacent ``user`` turn followed by an ``assistant`` turn
    (``turn_idx + 1`` — a gap means a filtered/missing turn and emits
    nothing).  ``context`` is the up-to-``ctx_turns`` turns immediately
    before the prompt, rendered ``role: text`` and newline-joined in turn
    order (empty turns stay — the template decides, not the extractor).
    Pairs are dropped when the prompt is blank or the response has fewer
    than ``min_response_words`` whitespace words.

    Output: (conv_id, turn_idx, context, n_ctx, prompt, response) with
    turn_idx the PROMPT turn.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ctx_w = w.rowsBetween(-int(ctx_turns), -1)
    rendered = F.concat_ws(": ", F.col("role"), F.col("text"))
    resp_words = F.when(
        F.trim(F.lead("text").over(w)) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.lead("text").over(w)), r"\s+")))
    base = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("text").alias("prompt"),
        F.array_join(F.collect_list(rendered).over(ctx_w), "\n").alias(
            "context"
        ),
        F.size(F.collect_list(rendered).over(ctx_w)).alias("n_ctx"),
        F.lead("role").over(w).alias("_next_role"),
        F.lead("turn_idx").over(w).alias("_next_idx"),
        F.lead("text").over(w).alias("response"),
        resp_words.alias("_resp_words"),
    )
    return base.where(
        (F.col("role") == "user")
        & (F.col("_next_role") == "assistant")
        & (F.col("_next_idx") == F.col("turn_idx") + 1)
        & (F.trim("prompt") != "")
        & (F.col("_resp_words") >= int(min_response_words))
    ).select("conv_id", "turn_idx", "context", "n_ctx", "prompt", "response")
