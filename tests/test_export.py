"""N-Triples export sink (operators/export.py): line templates, the
percent-escape chain (order: %25 first), and the weight reification."""

from __future__ import annotations

from datetime import datetime

from transner_spark.operators.export import edges_to_ntriples

SCHEMA = (
    "subj_id string, pred string, obj_id string, weight long,"
    " first_ts timestamp, last_ts timestamp"
)


def _edges(spark):
    t = datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            ("city:rome", "near", "surface:la spezia", 3, t, t),
            # escaping torture row: literal %, <, > and space — the %
            # must escape FIRST or the later %20/%3C bytes double-escape
            ("a% <b>", "p", "c", 1, t, t),
        ],
        SCHEMA,
    )


def test_ntriples_lines_and_escaping(spark):
    lines = {
        r["line"] for r in edges_to_ntriples(_edges(spark)).collect()
    }
    assert lines == {
        "<urn:kg:node/city:rome> <urn:kg:pred/near>"
        " <urn:kg:node/surface:la%20spezia> .",
        "<urn:kg:node/a%25%20%3Cb%3E> <urn:kg:pred/p> <urn:kg:node/c> .",
    }


def test_ntriples_full_illegal_charset(spark):
    t = datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [('s"q\\r', "p|q", "a/b^`{}", 1, t, t)], SCHEMA
    )
    got = [r["line"] for r in edges_to_ntriples(df).collect()]
    assert got == [
        "<urn:kg:node/s%22q%5Cr> <urn:kg:pred/p%7Cq>"
        " <urn:kg:node/a%2Fb%5E%60%7B%7D> ."
    ]


def test_ntriples_edge_iri_delimiter_unambiguous(spark):
    # ('a','p','p/c') vs ('a/p','p','c') must NOT collide on the edge
    # IRI — '/' inside components is escaped, the delimiter is not
    t = datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("a", "p", "p/c", 1, t, t), ("a/p", "p", "c", 2, t, t)], SCHEMA
    )
    weight_lines = {
        r["line"]
        for r in edges_to_ntriples(df, include_weights=True).collect()
        if "edge/" in r["line"]
    }
    assert len(weight_lines) == 2
    subjects = {ln.split(">")[0] for ln in weight_lines}
    assert subjects == {"<urn:kg:edge/a/p/p%2Fc", "<urn:kg:edge/a%2Fp/p/c"}


def test_ntriples_control_char_fails_loud(spark):
    import pytest

    t = datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("a\tb", "p", "c", 1, t, t)], SCHEMA
    )
    with pytest.raises(Exception, match="control character"):
        edges_to_ntriples(df).collect()


def test_ntriples_weight_reification(spark):
    got = {r["line"] for r in edges_to_ntriples(_edges(spark), include_weights=True).collect()}
    assert len(got) == 4  # 2 statements + 2 weight literals
    assert (
        "<urn:kg:edge/city:rome/near/surface:la%20spezia>"
        ' <urn:kg:pred/weight> "3"'
        "^^<http://www.w3.org/2001/XMLSchema#integer> ." in got
    )
