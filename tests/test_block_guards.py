"""Fail-loud block caps on the exact quadratic baselines."""

from __future__ import annotations

import pytest

from transner_spark.operators.dedup import (
    dedup_embedding_cosine,
    dedup_ngram_jaccard,
)


def _docs(spark, n):
    return spark.createDataFrame(
        [(i, "the same words in every doc", "en") for i in range(n)],
        "doc_id long, text string, lang string",
    )


def _emb(spark, n):
    return spark.createDataFrame(
        [(i, [1.0, 0.5, float(0)], "c0") for i in range(n)],
        "vec_id long, embedding array<float>, label string",
    )


def test_ngram_jaccard_guard_trips_on_oversized_block(spark):
    with pytest.raises(Exception, match="max_block_rows"):
        dedup_ngram_jaccard(_docs(spark, 8), max_block_rows=5).collect()


def test_ngram_jaccard_guard_passes_under_cap(spark):
    out = dedup_ngram_jaccard(_docs(spark, 8), max_block_rows=100)
    assert out.count() == 8 * 7 // 2  # identical docs: all pairs survive


def test_embedding_cosine_guard_trips(spark):
    with pytest.raises(Exception, match="dedup_embedding_cosine_lsh"):
        dedup_embedding_cosine(_emb(spark, 7), max_block_rows=4).collect()


def test_embedding_cosine_guard_passes_under_cap(spark):
    out = dedup_embedding_cosine(_emb(spark, 7), max_block_rows=10)
    assert out.count() == 7 * 6 // 2
