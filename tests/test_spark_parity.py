"""Spark ↔ single-node-oracle parity for every pipeline stage, plus the
north rule's P/R ≥ 0.95 triple metric and per-turn text-equality invariant.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import assert_pdf_equal
from transner_spark.kernels.oracle import TRIPLE_COLUMNS
from transner_spark.operators.annotate import explode_mentions, explode_triples
from transner_spark.operators.canonicalize import canonicalize
from transner_spark.operators.linking import link_surfaces, node_surfaces
from transner_spark.operators.materialize import materialize_edges


def test_mentions_parity(annotated, oracle_results):
    got = explode_mentions(annotated).toPandas()
    assert_pdf_equal(got, oracle_results["mentions"],
                     ["conv_id", "turn_idx", "mention_id"])
    assert len(got) > 50


def test_triples_parity(annotated, oracle_results):
    got = explode_triples(annotated).drop("ts").toPandas()
    assert_pdf_equal(got, oracle_results["triples"], TRIPLE_COLUMNS)
    assert len(got) > 10


def test_triple_precision_recall(annotated, oracle_results):
    """North-rule metric: (subj, pred, obj) P/R ≥ 0.95 vs the oracle."""
    got = explode_triples(annotated).select("subj_norm", "pred", "obj_norm").toPandas()
    spark_set = set(map(tuple, got.values))
    oracle_set = set(
        map(tuple, oracle_results["triples"][["subj_norm", "pred", "obj_norm"]].values)
    )
    tp = len(spark_set & oracle_set)
    precision = tp / max(1, len(spark_set))
    recall = tp / max(1, len(oracle_set))
    assert precision >= 0.95
    assert recall >= 0.95


def test_links_parity(spark, annotated, oracle_results):
    links = link_surfaces(spark, node_surfaces(explode_triples(annotated)))
    assert_pdf_equal(links.toPandas(), oracle_results["links"], ["norm_key"])


def test_canonical_parity(spark, annotated, oracle_results):
    links = link_surfaces(spark, node_surfaces(explode_triples(annotated)))
    canon = canonicalize(links)
    assert_pdf_equal(canon.toPandas(), oracle_results["canonical"], ["node_id"])


def test_edges_parity(spark, annotated, oracle_results):
    t = explode_triples(annotated)
    links = link_surfaces(spark, node_surfaces(t))
    canon = canonicalize(links)
    edges = materialize_edges(t, canon).drop("bucket")
    assert_pdf_equal(edges.toPandas(), oracle_results["edges"],
                     ["subj_id", "pred", "obj_id"])


def test_edges_salted_equals_unsalted(spark, annotated):
    t = explode_triples(annotated)
    links = link_surfaces(spark, node_surfaces(t))
    canon = canonicalize(links)
    salted = materialize_edges(t, canon, salted=True).drop("bucket").toPandas()
    plain = materialize_edges(t, canon, salted=False).drop("bucket").toPandas()
    assert_pdf_equal(salted, plain, ["subj_id", "pred", "obj_id"])


def test_per_turn_text_equality(annotated, tiny_pdf):
    """BASELINE.json invariant: output text == input text under stable
    (conv_id, turn_idx) ordering."""
    got = (
        annotated.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    kept = tiny_pdf[tiny_pdf["text"].str.split().str.len() <= 150]
    want = (
        kept[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"turn_idx": "int64"}), want.astype({"turn_idx": "int64"})
    )


def test_mention_invariants(annotated):
    """Offsets in range; value is the exact substring at its offset."""
    rows = (
        annotated.select("text", F.explode("mentions").alias("m"))
        .select("text", "m.value", "m.offset", "m.type", "m.confidence")
        .toPandas()
    )
    assert len(rows) > 0
    for r in rows.itertuples(index=False):
        assert 0 <= r.offset < len(r.text)
        assert r.text[r.offset : r.offset + len(r.value)] == r.value
        assert 0.0 <= r.confidence <= 1.0


def test_lsh_linking_subset(spark, annotated):
    """The MinHash-LSH scale path: every pair it links must agree with the
    deterministic path on entity_key (recall may be lower, never precision)."""
    from transner_spark.operators.linking import link_surfaces_lsh

    surfaces = node_surfaces(explode_triples(annotated))
    det = link_surfaces(spark, surfaces).where(F.col("method") != "none").toPandas()
    lsh = link_surfaces_lsh(spark, surfaces).toPandas()
    det_map = dict(zip(det["norm_key"], det["entity_key"]))
    assert len(lsh) > 0
    for r in lsh.itertuples(index=False):
        assert det_map.get(r.norm_key) == r.entity_key
