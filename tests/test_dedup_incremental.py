"""Incremental minhash dedup (operators/dedup.dedup_minhash_incremental):
the merged pair set must equal the full recompute on old ∪ new — the
same algebraic claim the sf0.01 gate proves against the full-recompute
DuckDB oracle, pinned here at unit scale with a fixture that forces
pairs in every partition class (old-old, old-new, new-new)."""

from __future__ import annotations

import pytest


def _doc(doc_id: str, text: str):
    return (doc_id, text)


@pytest.fixture(scope="module")
def split_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from the loud hunters"
    )
    variant = base.replace("green", "dark")  # near-dup of base
    other = (
        "completely unrelated text about spark shuffles partitions and "
        "broadcast joins that shares no shingles with the fox documents"
    )
    o_variant = other.replace("joins", "maps")
    old = spark.createDataFrame(
        [
            _doc("d1", base),
            _doc("d2", variant),  # old-old pair (d1,d2)
            _doc("d5", other),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            _doc("d3", base + " extra"),  # old-new pairs vs d1/d2
            _doc("d4", base + " extra"),  # new-new pair (d3,d4)
            _doc("d6", o_variant),  # old-new pair vs d5
        ],
        ["doc_id", "text"],
    )
    return old, new


def _pairs(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()
    )


def test_incremental_equals_full(spark, split_docs):
    from transner_spark.operators.dedup import (
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )

    old, new = split_docs
    inc = _pairs(dedup_minhash_incremental(old, new, threshold=0.5))
    full = _pairs(dedup_minhash_lsh(old.unionByName(new), threshold=0.5))
    assert inc == full
    assert len(inc) > 0


def test_all_pair_classes_present(spark, split_docs):
    """The fixture must actually exercise old-old, old-new AND new-new
    pairs, or the equality test above proves nothing."""
    from transner_spark.operators.dedup import dedup_minhash_incremental

    old, new = split_docs
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    pairs = _pairs(dedup_minhash_incremental(old, new, threshold=0.5))
    classes = {
        (a in new_ids) + (b in new_ids) for a, b, _ in pairs
    }
    assert classes == {0, 1, 2}


def test_precomputed_state_path_equals_full(spark, split_docs):
    """The production path — maintained signature + pair tables passed
    in, old_docs=None — must produce the same merged pair set as the
    full recompute (and must not need the old corpus at all)."""
    from transner_spark.operators.dedup import (
        dedup_minhash_incremental,
        dedup_minhash_lsh,
        minhash_signatures,
    )

    old, new = split_docs
    inc = dedup_minhash_incremental(
        None,
        new,
        threshold=0.5,
        old_sigs=minhash_signatures(old),
        old_pairs=dedup_minhash_lsh(old, threshold=0.5),
    )
    full = dedup_minhash_lsh(old.unionByName(new), threshold=0.5)
    assert _pairs(inc) == _pairs(full)


def test_requires_old_input(spark, split_docs):
    from transner_spark.operators.dedup import dedup_minhash_incremental

    _, new = split_docs
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_minhash_incremental(None, new)


def test_disjoint_union_no_duplicates(spark, split_docs):
    from transner_spark.operators.dedup import dedup_minhash_incremental

    old, new = split_docs
    out = dedup_minhash_incremental(old, new, threshold=0.5)
    assert out.count() == out.select("doc_a", "doc_b").distinct().count()
