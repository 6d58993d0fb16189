"""Evaluation + co-occurrence operators (operators/evaluate.py):
set_prf exactness on handcrafted sets (every branch: match,
emitted-only, reference-only, empty-side conventions) and
entity_cooccurrence against a pure-python PMI twin, plus the in-plan
conversation-size guard."""

from __future__ import annotations

import math

import pytest

from transner_spark.operators.evaluate import (
    entity_cooccurrence,
    set_prf,
)

KEYS = ["subj_id", "pred", "obj_id"]
SCHEMA = "subj_id string, pred string, obj_id string"


def test_set_prf_exact_per_group(spark):
    # p1: 2 emitted, 3 reference, 2 match -> P=1, R=2/3
    # p2: 2 emitted, 1 reference, 1 match -> P=1/2, R=1
    # p3: emitted-only -> R undefined-by-convention = 0
    # p4: reference-only -> P undefined-by-convention = 0
    emitted = spark.createDataFrame(
        [
            ("a", "p1", "b"), ("a", "p1", "c"),
            ("a", "p2", "b"), ("a", "p2", "c"),
            ("a", "p3", "b"),
            ("a", "p1", "b"),  # duplicate: set semantics must dedupe
        ],
        SCHEMA,
    )
    reference = spark.createDataFrame(
        [
            ("a", "p1", "b"), ("a", "p1", "c"), ("a", "p1", "d"),
            ("a", "p2", "b"),
            ("a", "p4", "b"),
        ],
        SCHEMA,
    )
    got = {
        r["pred"]: r.asDict()
        for r in set_prf(emitted, reference, KEYS, "pred").collect()
    }
    assert set(got) == {"p1", "p2", "p3", "p4"}
    p1 = got["p1"]
    assert (p1["n_emitted"], p1["n_reference"], p1["n_match"]) == (2, 3, 2)
    assert p1["precision"] == 1.0
    assert p1["recall"] == round(2 / 3, 6)
    assert p1["f1"] == round(2 * 1.0 * (2 / 3) / (1.0 + 2 / 3), 6)
    p2 = got["p2"]
    assert (p2["precision"], p2["recall"]) == (0.5, 1.0)
    assert p2["f1"] == round(2 * 0.5 * 1.0 / 1.5, 6)
    p3 = got["p3"]
    assert (p3["n_reference"], p3["precision"], p3["recall"], p3["f1"]) == (
        0, 0.0, 0.0, 0.0,
    )
    p4 = got["p4"]
    assert (p4["n_emitted"], p4["precision"], p4["recall"], p4["f1"]) == (
        0, 0.0, 0.0, 0.0,
    )


def test_set_prf_null_keys_are_set_members(spark):
    # NULL key/group values are first-class set members: identical
    # NULL-bearing tuples MATCH (null-safe join) and the NULL group
    # reports as exactly ONE row, not two half-empty ones
    emitted = spark.createDataFrame(
        [("a", None, "b"), (None, "p1", "b")], SCHEMA
    )
    reference = spark.createDataFrame(
        [("a", None, "b"), ("x", "p1", "y")], SCHEMA
    )
    rows = set_prf(emitted, reference, KEYS, "pred").collect()
    got = {r["pred"]: r.asDict() for r in rows}
    assert len(rows) == len(got) == 2  # one row per group incl. NULL
    null_g = got[None]
    assert (null_g["n_emitted"], null_g["n_reference"], null_g["n_match"]) == (
        1, 1, 1,
    )
    assert (null_g["precision"], null_g["recall"], null_g["f1"]) == (
        1.0, 1.0, 1.0,
    )
    p1 = got["p1"]
    assert (p1["n_emitted"], p1["n_reference"], p1["n_match"]) == (1, 1, 0)
    assert (p1["precision"], p1["recall"], p1["f1"]) == (0.0, 0.0, 0.0)


def test_set_prf_identical_sets_is_all_ones(spark):
    df = spark.createDataFrame([("a", "p1", "b"), ("c", "p1", "d")], SCHEMA)
    row = set_prf(df, df, KEYS, "pred").collect()[0]
    assert (row["precision"], row["recall"], row["f1"]) == (1.0, 1.0, 1.0)


# triples carry the columns entity_cooccurrence's node resolution needs;
# conv c1 mentions {x, y}, c2 {x, y, z}, c3 {x}; types are all
# non-structural so every node becomes surface:<norm> pre-canon.
def _triple(conv, s, o):
    return (conv, s, "LOCATION", s, "near", o, "LOCATION", o)


TRIPLE_SCHEMA = (
    "conv_id string, subj_value string, subj_type string, subj_norm string,"
    " pred string, obj_value string, obj_type string, obj_norm string"
)


@pytest.fixture(scope="module")
def cooc_triples(spark):
    return spark.createDataFrame(
        [
            _triple("c1", "x", "y"),
            _triple("c2", "x", "y"),
            _triple("c2", "y", "z"),
            _triple("c3", "x", "x"),
        ],
        TRIPLE_SCHEMA,
    )


@pytest.fixture(scope="module")
def empty_canon(spark):
    return spark.createDataFrame([], "node_id string, canon_id string")


def test_entity_cooccurrence_matches_python_twin(spark, cooc_triples, empty_canon):
    got = {
        (r["node_a"], r["node_b"]): r.asDict()
        for r in entity_cooccurrence(cooc_triples, empty_canon).collect()
    }
    # membership: c1 {x,y}, c2 {x,y,z}, c3 {x}; N=3, n_x=3, n_y=2, n_z=1
    sx, sy, sz = "surface:x", "surface:y", "surface:z"
    want = {
        (sx, sy): (2, 3, 2),  # n_pair, n_a, n_b
        (sx, sz): (1, 3, 1),
        (sy, sz): (1, 2, 1),
    }
    assert set(got) == set(want)
    for key, (n_pair, n_a, n_b) in want.items():
        r = got[key]
        assert (r["n_pair"], r["n_a"], r["n_b"]) == (n_pair, n_a, n_b)
        lift = n_pair * 3.0 / (n_a * n_b)
        assert r["lift"] == round(lift, 6)
        assert r["pmi"] == round(round(math.log(lift), 9), 6)
    # (x,y) co-occur twice in 3 convs with marginals 3 and 2: exactly
    # independence (lift 1, pmi 0) — a meaningful zero, not a default
    assert got[(sx, sy)]["lift"] == 1.0 and got[(sx, sy)]["pmi"] == 0.0


def test_entity_cooccurrence_respects_canon_map(spark, cooc_triples):
    # y and z canonicalize to one entity: c2's {y, z} collapses, so the
    # only surviving pair is (canon, x-surface) with n_pair=2
    canon = spark.createDataFrame(
        [("surface:y", "E1"), ("surface:z", "E1")],
        "node_id string, canon_id string",
    )
    got = entity_cooccurrence(cooc_triples, canon).collect()
    assert len(got) == 1
    r = got[0]
    assert {r["node_a"], r["node_b"]} == {"E1", "surface:x"}
    assert (r["n_pair"], sorted([r["n_a"], r["n_b"]])) == (2, [2, 3])


def test_entity_cooccurrence_guard_fails_loud(spark, cooc_triples, empty_canon):
    # surfaces as Py4JJavaError or SparkRuntimeException depending on
    # the session's error-conversion mode — match the message, not the
    # wrapper (the test_block_guards.py posture)
    with pytest.raises(Exception, match="entity_cooccurrence"):
        entity_cooccurrence(
            cooc_triples, empty_canon, max_conv_nodes=2
        ).collect()


def test_entity_cooccurrence_min_pair_filter(spark, cooc_triples, empty_canon):
    got = entity_cooccurrence(
        cooc_triples, empty_canon, min_pair_count=2
    ).collect()
    assert [(r["node_a"], r["node_b"], r["n_pair"]) for r in got] == [
        ("surface:x", "surface:y", 2)
    ]


def test_kg_integrity_report(spark):
    from datetime import datetime

    from transner_spark.operators.evaluate import kg_integrity_report

    t1, t2 = datetime(2026, 1, 1), datetime(2026, 1, 2)
    canon = spark.createDataFrame(
        # y is REWRITTEN to E1; E1 itself is an identity row (legal)
        [("y", "E1"), ("E1", "E1")],
        "node_id string, canon_id string",
    )
    healthy = spark.createDataFrame(
        # E1 as an endpoint is fine (identity row), self-loop is legal
        [("a", "p", "E1", 2, t1, t2), ("b", "p", "b", 1, t1, t1)],
        "subj_id string, pred string, obj_id string, weight long,"
        " first_ts timestamp, last_ts timestamp",
    )
    got = {r["check"]: r["n_violations"] for r in kg_integrity_report(healthy, canon).collect()}
    assert got == {
        "unresolved_node": 0,
        "ts_disorder": 0,
        "nonpositive_weight": 0,
        "duplicate_edge_key": 0,
    }
    # one violation of each kind: y unresolved (canon says rewrite),
    # swapped ts, zero weight, and a duplicated key (counted as 1 KEY)
    bad = spark.createDataFrame(
        [
            ("y", "p", "a", 1, t1, t2),      # unresolved subj
            ("a", "p", "b", 1, t2, t1),      # ts disorder
            ("a", "q", "b", 0, t1, t2),      # nonpositive weight
            ("d", "p", "e", 1, t1, t2),      # dup key, row 1
            ("d", "p", "e", 3, t1, t2),      # dup key, row 2
        ],
        "subj_id string, pred string, obj_id string, weight long,"
        " first_ts timestamp, last_ts timestamp",
    )
    got = {r["check"]: r["n_violations"] for r in kg_integrity_report(bad, canon).collect()}
    assert got == {
        "unresolved_node": 1,
        "ts_disorder": 1,
        "nonpositive_weight": 1,
        "duplicate_edge_key": 1,
    }
