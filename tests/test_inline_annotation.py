"""T10/T11 parity: Spark inline-annotation operators vs the single-node
transcription kernel, on real testdata docs plus crafted quirk cases."""

from __future__ import annotations

import pytest

from transner_spark.kernels import inline_annotation as K
from transner_spark.operators.inline_annotation import (
    concat_corpus,
    inline_annotate,
    inline_conll,
    t10_entities,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def annotated(spark, docs):
    return inline_annotate(docs).cache()


def test_entity_dict_matches_python(spark, docs):
    texts = [r["text"] for r in docs.collect()]
    want = K.t10_entities_py(texts)
    got = {r["key"]: r["ty"] for r in t10_entities(docs).collect()}
    assert got == want
    assert len(got) > 3  # the corpus actually yields a dictionary


def test_annotate_parity(spark, docs, annotated):
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    ents = K.t10_entities_py(list(rows.values()))
    got = {r["doc_id"]: r["annotated"] for r in annotated.collect()}
    want = {did: K.annotate_text(t, ents) for did, t in rows.items()}
    assert got == want
    assert any("$" in v for v in got.values())  # replacements actually fire


def test_conll_parity(spark, docs, annotated):
    got: dict = {}
    for r in inline_conll(annotated).orderBy("doc_id", "src_line", "out_idx").collect():
        got.setdefault(r["doc_id"], []).append(r["line"])
    rows = {r["doc_id"]: r["annotated"] for r in annotated.collect()}
    want = {did: K.create_conll_lines(t) for did, t in rows.items()}
    for did in want:
        assert got.get(did, []) == want[did], did


def test_corpus_concat_parity(spark, docs, annotated):
    conll = inline_conll(annotated)
    got = [
        r["line"]
        for r in concat_corpus(conll, docs)
        .orderBy("doc_id", "src_line", "out_idx")
        .collect()
    ]
    rows = sorted(
        (r["doc_id"], r["annotated"]) for r in annotated.collect()
    )
    want = K.concat_corpus_lines([K.create_conll_lines(t) for _, t in rows])
    assert got == want


def _ann_one(spark, text, ents):
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    edf = spark.createDataFrame(
        sorted(ents.items()), "key string, ty string"
    )
    return inline_annotate(docs, edf).collect()[0]["annotated"]


def test_index_gate_quirk(spark):
    """A key whose FIRST occurrence is at index <= 1 is never replaced
    anywhere in the doc (str.find > 1 gate), even if later occurrences
    exist."""
    ents = {"alpha": "PER"}
    # ' alpha ' first occurs at index 0 → no replacement at all
    assert _ann_one(spark, " alpha x alpha y", ents) == " alpha x alpha y"
    # first occurrence at index 1 ('x alpha') → still gated (find == 1)
    assert _ann_one(spark, "x alpha y alpha z", ents) == "x alpha y alpha z"
    # first occurrence at index 2 → ALL occurrences replaced
    assert (
        _ann_one(spark, "xx alpha y alpha z", ents)
        == "xx $alpha$PER y $alpha$PER z"
    )
    assert K.annotate_text(" alpha x alpha y", ents) == " alpha x alpha y"
    assert K.annotate_text("x alpha y alpha z", ents) == "x alpha y alpha z"
    assert (
        K.annotate_text("xx alpha y alpha z", ents)
        == "xx $alpha$PER y $alpha$PER z"
    )


def test_adjacent_and_nested_keys(spark):
    """Adjacent single-word keys both match (the replacement restores
    both delimiter spaces); a key nested inside an earlier-sorted
    multiword key is consumed by it (sequential fold, faithful)."""
    ents = {"aa": "PER", "bb": "LOC"}
    got = _ann_one(spark, "xx aa bb y", ents)
    assert got == K.annotate_text("xx aa bb y", ents)
    assert got == "xx $aa$PER $bb$LOC y"

    ents2 = {"aa bb": "ORG", "bb": "LOC"}
    got2 = _ann_one(spark, "xx aa bb y", ents2)
    assert got2 == K.annotate_text("xx aa bb y", ents2)
    # 'aa bb' (sorted first) wraps the span; ' bb ' then has no trailing
    # space inside '$aa bb$ORG' → nested key never fires
    assert got2 == "xx $aa bb$ORG y"


def test_conll_state_machine_cases(spark):
    """Single, multi-token, middle-$, and unclosed-entity cases."""
    text = "go $alpha$PER now $multi word key$LOC end $open never"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    ann = docs.select("doc_id", docs["text"].alias("annotated"))
    got = [r["line"] for r in inline_conll(ann).orderBy("out_idx").collect()]
    assert got == K.create_conll_lines(text)
    assert got == [
        "go O",
        "alpha PER",
        "now O",
        "multi LOC",
        "word LOC",
        "key LOC",
        "end O",
        # "$open never" opens an entity that never closes → dropped
    ]


def test_empty_doc_still_gets_corpus_separator(spark):
    """A doc producing zero CoNLL lines (whitespace-only text) still
    contributes its per-doc blank separator (reference appends
    data+'\\n' per file unconditionally)."""
    docs = spark.createDataFrame(
        [(0, "go $alpha$PER now"), (1, "   ")], "doc_id long, text string"
    )
    ann = docs.select("doc_id", docs["text"].alias("annotated"))
    conll = inline_conll(ann)
    assert conll.where("doc_id = 1").count() == 0
    corpus = concat_corpus(conll, docs)
    seps = corpus.where("line = '' AND src_line = 2147483648")
    assert {r["doc_id"] for r in seps.collect()} == {0, 1}
    want = K.concat_corpus_lines(
        [K.create_conll_lines("go $alpha$PER now"), K.create_conll_lines("   ")]
    )
    got = [
        r["line"]
        for r in corpus.orderBy("doc_id", "src_line", "out_idx").collect()
    ]
    assert got == want
