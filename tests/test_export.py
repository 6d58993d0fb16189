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


def test_ntriples_weight_reification(spark):
    got = {r["line"] for r in edges_to_ntriples(_edges(spark), include_weights=True).collect()}
    assert len(got) == 4  # 2 statements + 2 weight literals
    assert (
        "<urn:kg:edge/city:rome/near/surface:la%20spezia>"
        ' <urn:kg:pred/weight> "3"'
        "^^<http://www.w3.org/2001/XMLSchema#integer> ." in got
    )
