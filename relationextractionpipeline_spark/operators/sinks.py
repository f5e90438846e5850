"""Reference-format output sinks (SURVEY.md §2.1 S12-S14).

The native outputs of this engine are columnar tables (triples / entities /
edges / types).  These sinks additionally reproduce the reference's exact
file formats for parity checking:

* S12 JSONL — one object per sentence:
  ``{"s": …, "date": "Jan 1, 1980 12:00:00 AM", "articleId": …, "lineId": …,
  "rels": [{"r": "…"}, …]}`` (``binary_relation.py:150-157``).  The ``date``
  is the reference's hardcoded constant (``:154`` — it drops real
  timestamps; the native tables keep ``ts``).  ``articleId`` carries the
  conv_id (the reference emits its batch *file name* there — positional
  identity we replaced with keys); ``lineId`` is the per-conversation
  sentence index as a string (``:156``).  Byte-level parity includes
  ``json.dumps`` default separators (", " / ": ") — hence a (cold-path)
  pandas UDF rather than ``to_json``.
* S13 human-readable — ``line: <sentence>`` + one relation string per line +
  blank line (``binary_relation.py:292-303``), relation string byte-exact per
  ``format_relation_string`` (``:270-289``), in the reference's emission
  order (``rel_idx``).
* S14 types list — distinct FIGER types, one per line (``:72-82``).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

REFERENCE_DATE = "Jan 1, 1980 12:00:00 AM"


def sentence_rollup(parsed: DataFrame, triples: DataFrame) -> DataFrame:
    """A5 — one row per sentence with its sentence string and relation-string
    lists (empty arrays for relation-free sentences, which the reference
    still emits).  Relations are ordered by ``rel_idx`` — the within-sentence
    emission index the extractor carries — so the rolled-up order is the
    reference's entity-pair-product order (binary_relation.py get_relations),
    not an artificial sort."""
    keys = ["conv_id", "turn_idx", "sent_idx"]
    sent = parsed.select(
        *keys,
        F.concat_ws(
            " ", F.transform("tokens", lambda t: t["form"])
        ).alias("s"),
    )
    rels = triples.groupBy(*keys).agg(
        F.collect_list(
            F.struct(F.col("rel_idx"), F.col("rel"), F.col("rel_human"))
        ).alias("rs")
    )
    rolled = sent.join(rels, keys, "left").select(
        *keys,
        "s",
        # sort_array on the struct orders by rel_idx (first field, unique
        # within a sentence) — restores emission order after the shuffle
        F.coalesce(
            F.transform(F.sort_array("rs"), lambda r: r["rel"]),
            F.array().cast("array<string>"),
        ).alias("rels"),
        F.coalesce(
            F.transform(F.sort_array("rs"), lambda r: r["rel_human"]),
            F.array().cast("array<string>"),
        ).alias("rels_human"),
    )
    # per-conversation sentence numbering = the reference's per-file lineId
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "sent_idx")
    return rolled.withColumn("line_id", F.row_number().over(w) - 1)


@F.pandas_udf(T.StringType())
def _ref_json_line(s: pd.Series, conv_id: pd.Series, line_id: pd.Series,
                   rels: pd.Series) -> pd.Series:
    out = []
    for sv, cv, lv, rv in zip(s, conv_id, line_id, rels):
        obj = {
            "s": sv,
            "date": REFERENCE_DATE,
            "articleId": cv,
            "lineId": str(int(lv)),
            "rels": [{"r": r} for r in (rv if rv is not None else [])],
        }
        # byte parity with the reference's json.dumps(ensure_ascii=False)
        out.append(json.dumps(obj, ensure_ascii=False))
    return pd.Series(out)


def reference_jsonl(parsed: DataFrame, triples: DataFrame) -> DataFrame:
    """S12 — DataFrame of reference-format JSONL lines (one per sentence);
    write with ``df.write.text`` (append mode ≙ the reference's appends)."""
    rolled = sentence_rollup(parsed, triples)
    return rolled.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        _ref_json_line("s", "conv_id", "line_id", "rels").alias("line"),
    )


def human_readable(parsed: DataFrame, triples: DataFrame) -> DataFrame:
    """S13 — the human-readable block per sentence, byte-exact with the
    reference's ``write_to_human_readable_file`` (binary_relation.py:292-303):
    ``'line: ' + sentence + '\\n'`` then one ``format_relation_string`` line
    per relation (emission order), then a blank line.  Concatenating the
    ``block`` values in (conv_id, line_id) order reproduces the reference
    file's bytes."""
    rolled = sentence_rollup(parsed, triples)
    return rolled.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        "line_id",
        F.concat(
            F.lit("line: "),
            F.col("s"),
            F.lit("\n"),
            F.array_join(F.col("rels_human"), "\n"),
            F.when(F.size("rels_human") > 0, F.lit("\n")).otherwise(F.lit("")),
            F.lit("\n"),
        ).alias("block"),
    )


def types_list(triples: DataFrame) -> DataFrame:
    """S14 — distinct FIGER type strings, one per row (``types.txt``)."""
    return (
        triples.select(F.explode(F.array("subj_type", "obj_type")).alias("t"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# RDF N-Triples export (beyond-reference: the interchange format a KG
# consumer loads into a triple store; the reference stops at its private
# JSONL, binary_relation.py:150-157)
# ---------------------------------------------------------------------------

KG_ENTITY_NS = "http://kg.local/e/"
KG_PRED_NS = "http://kg.local/p/"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


def _nt_escape(col):
    """N-Triples string-literal escaping (W3C N-Triples spec §2.3): backslash
    first, then quote / LF / CR / TAB.  Native Column chain — whole-stage
    codegen, and replayable verbatim as nested replace() in the DuckDB
    oracle."""
    out = F.col(col) if isinstance(col, str) else col
    for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def _iri(ns: str, col) -> "F.Column":
    """Mint a deterministic IRI for an arbitrary canonical string: the md5
    of the string under a fixed namespace.  Hashing (rather than
    percent-encoding) keeps the IRI grammar trivially valid for any input
    byte sequence and the minting SQL-replayable; the human-readable form
    travels alongside as an rdfs:label literal."""
    return F.concat(F.lit("<" + ns), F.md5(col), F.lit(">"))


def ntriples(edges: DataFrame) -> DataFrame:
    """RDF N-Triples lines for the canonicalized edge table: one fact line
    per DISTINCT resolved (subj_canonical, pred_canonical, obj_canonical)
    plus one rdfs:label line per distinct entity and predicate (the label
    carries the canonical string, N-Triples-escaped).

    ``edges`` is the ``materialize_graph`` output (``subj_canonical``,
    ``obj_canonical``, ``pred_canonical``/``pred``).  Rows with an
    unresolved (null) endpoint are excluded — RDF wants stable IRIs, and
    the unlinked remainder stays in the columnar tables.

    Scale: three distinct-aggregations (fact set, entity set, predicate
    set), each keyed on graph-sized — not mention-sized — values, then
    pure per-row string assembly in whole-stage codegen.  Output column:
    ``line``.  Writing sorted lines to one file is the caller's choice
    (tiny graphs); at scale, ``df.write.text`` per partition.
    """
    facts = (
        edges.where(
            F.col("subj_canonical").isNotNull()
            & F.col("obj_canonical").isNotNull()
        )
        .select(
            F.col("subj_canonical").alias("s"),
            F.coalesce("pred_canonical", "pred").alias("p"),
            F.col("obj_canonical").alias("o"),
        )
        .distinct()
    )
    fact_lines = facts.select(
        F.concat_ws(
            " ", _iri(KG_ENTITY_NS, F.col("s")), _iri(KG_PRED_NS, F.col("p")),
            _iri(KG_ENTITY_NS, F.col("o")), F.lit(".")
        ).alias("line")
    )
    ents = facts.select(F.col("s").alias("v")).union(
        facts.select(F.col("o").alias("v"))
    ).distinct()
    ent_labels = ents.select(
        F.concat_ws(
            " ", _iri(KG_ENTITY_NS, F.col("v")), F.lit("<" + RDFS_LABEL + ">"),
            F.concat(F.lit('"'), _nt_escape("v"), F.lit('"')), F.lit(".")
        ).alias("line")
    )
    pred_labels = facts.select(F.col("p").alias("v")).distinct().select(
        F.concat_ws(
            " ", _iri(KG_PRED_NS, F.col("v")), F.lit("<" + RDFS_LABEL + ">"),
            F.concat(F.lit('"'), _nt_escape("v"), F.lit('"')), F.lit(".")
        ).alias("line")
    )
    return fact_lines.union(ent_labels).union(pred_labels)
