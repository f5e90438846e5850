"""N-Triples export (escaping byte-parity vs a pure-Python serializer) and
the temporal fact rollups on hand-computed fixtures.  The sf-scale gates
are the DuckDB oracles for kg_ntriples / kg_fact_intervals /
kg_fact_conflicts."""

from __future__ import annotations

import datetime
import hashlib

from relationextractionpipeline_spark.operators import ontology, sinks


def _py_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _py_ntriples(facts):
    """Independent pure-Python serializer with the same contract."""
    md5 = lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()  # noqa: E731
    lines = set()
    ents, preds = set(), set()
    for s, p, o in facts:
        lines.add(
            f"<{sinks.KG_ENTITY_NS}{md5(s)}> <{sinks.KG_PRED_NS}{md5(p)}> "
            f"<{sinks.KG_ENTITY_NS}{md5(o)}> ."
        )
        ents.update((s, o))
        preds.add(p)
    for v in ents:
        lines.add(
            f'<{sinks.KG_ENTITY_NS}{md5(v)}> <{sinks.RDFS_LABEL}> '
            f'"{_py_escape(v)}" .'
        )
    for v in preds:
        lines.add(
            f'<{sinks.KG_PRED_NS}{md5(v)}> <{sinks.RDFS_LABEL}> '
            f'"{_py_escape(v)}" .'
        )
    return lines


def _edges_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj_canonical string, pred string, pred_canonical string, "
        "obj_canonical string",
    )


def test_ntriples_byte_parity_with_python_serializer(spark):
    # names exercising every escape class + unicode + duplicates + nulls
    rows = [
        ('He said "hi"', "says\tto", "says to", "Tab\tName"),
        ("Back\\slash", "knows", None, "New\nline"),
        ("Über AG", "owns", "owns", "Carriage\rreturn"),
        ("Über AG", "owns", "owns", "Carriage\rreturn"),  # dup collapses
        (None, "dropped", None, "x"),                     # null endpoint
    ]
    out = sinks.ntriples(_edges_df(spark, rows))
    got = {r.line for r in out.collect()}
    want = _py_ntriples(
        [
            ('He said "hi"', "says to", "Tab\tName"),
            ("Back\\slash", "knows", "New\nline"),
            ("Über AG", "owns", "Carriage\rreturn"),
        ]
    )
    assert got == want
    assert out.count() == len(want)  # unionAll introduced no duplicates


def _ts(h, m=0):
    return datetime.datetime(2026, 3, 1, h, m)


def _fact_fixture(spark):
    edges = spark.createDataFrame(
        [
            # (conv, turn, sent, rel, subj, pred raw, pred canon, obj)
            ("c1", 0, 0, 0, "s1", "ceo of", "ceo_of", "AcmeA"),
            ("c1", 1, 0, 0, "s1", "ceo_of", "ceo_of", "AcmeB"),
            ("c2", 0, 0, 0, "s1", "ceo_of", "ceo_of", "AcmeA"),
            ("c2", 1, 0, 0, "s2", "ceo_of", "ceo_of", "OnlyOne"),
            ("c2", 2, 0, 0, None, "ceo_of", "ceo_of", "dropped"),
        ],
        "conv_id string, turn_idx int, sent_idx int, rel_idx int, "
        "subj_canonical string, pred string, pred_canonical string, "
        "obj_canonical string",
    )
    turns = spark.createDataFrame(
        [
            ("c1", 0, _ts(9)),
            ("c1", 1, _ts(10)),
            ("c2", 0, _ts(11)),
            ("c2", 1, _ts(12)),
            ("c2", 2, _ts(13)),
        ],
        "conv_id string, turn_idx int, ts timestamp",
    )
    return edges, turns


def test_fact_intervals(spark):
    edges, turns = _fact_fixture(spark)
    out = {
        (r.subj_canonical, r.pred_canonical, r.obj_canonical): r
        for r in ontology.fact_intervals(edges, turns).collect()
    }
    assert len(out) == 3  # null-subject row dropped
    a = out[("s1", "ceo_of", "AcmeA")]
    assert a.first_seen == _ts(9) and a.last_seen == _ts(11)
    assert a.n_observations == 2 and a.n_convs == 2


def test_fact_conflicts_change_counting(spark):
    edges, turns = _fact_fixture(spark)
    out = {
        (r.pred_canonical, r.subj_canonical): r
        for r in ontology.fact_conflicts(edges, turns).collect()
    }
    # s2 has a single object -> filtered out
    assert set(out) == {("ceo_of", "s1")}
    r = out[("ceo_of", "s1")]
    # time order: AcmeA(9) -> AcmeB(10) -> AcmeA(11): two changes
    assert r.n_objects == 2 and r.n_observations == 3 and r.n_changes == 2
    assert r.first_obj == "AcmeA" and r.last_obj == "AcmeA"


def test_fact_conflicts_partition_invariance(spark):
    edges, turns = _fact_fixture(spark)
    a = ontology.fact_conflicts(edges.repartition(7), turns).collect()
    b = ontology.fact_conflicts(edges.coalesce(1), turns).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
