"""GrAF standoff merge (T7 front half): Spark operator vs the verbatim
python twin (kernels/graf.py), plus hand-pinned reference quirks."""

from __future__ import annotations

import pytest

from transner_spark.kernels.graf import annotate_conll, merge_graf


def _twin_conll(model: dict) -> list[str]:
    regions = {rid: (s, e) for rid, s, e in model["regions"]}
    sents, ners = merge_graf(regions, model["sents"], model["toks"], model["ners"])
    return annotate_conll(sents, ners)


def test_graf_chain_matches_twin_on_synthetic_corpus(spark, tmp_path):
    """Full chain (XML render → Spark parse → merge) equals the python
    twin applied directly to the element model, doc for doc."""
    import pyarrow.parquet as pq

    from transner_spark.operators.graf import graf_merge
    from transner_spark.sources.graf import (
        GRAF_SAMPLE_MOD,
        ensure_graf_raw,
        read_graf_ners,
        read_graf_pos,
        read_graf_regions,
        read_graf_sents,
        synthesize_doc,
    )

    sf_dir = "/root/testdata/sf0.001"
    graf_dir = ensure_graf_raw("/root/repo", sf_dir)
    out = graf_merge(
        read_graf_regions(spark, graf_dir),
        read_graf_sents(spark, graf_dir),
        read_graf_pos(spark, graf_dir),
        read_graf_ners(spark, graf_dir),
    )
    got: dict[int, list[str]] = {}
    for r in out.orderBy("doc_id", "out_idx").collect():
        got.setdefault(r["doc_id"], []).append(r["line"])

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = 0
    for doc_id, text in sorted(
        zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
    ):
        doc_id = int(doc_id)
        if doc_id % GRAF_SAMPLE_MOD:
            continue
        want = _twin_conll(synthesize_doc(doc_id, text or ""))
        assert got.get(doc_id, []) == want, doc_id
        n_docs += 1
    assert n_docs > 10
    # the corpus must actually exercise the interesting paths
    all_lines = [ln for lines in got.values() for ln in lines]
    assert any(ln and not ln.endswith("\tO") for ln in all_lines)  # some NER tags
    assert "" in all_lines  # sentence-final blank lines


# hand-written micro-model: two sentences, overlap NER, dup keys, noise
MICRO = {
    "regions": [
        ("r0", 0, 10),    # sentence 0
        ("r1", 11, 20),   # sentence 1
        ("r2", 0, 4),     # tok a
        ("r3", 5, 10),    # tok b (sentence-final)
        ("r4", 11, 15),   # tok c
        ("r5", 16, 20),   # tok d (sentence-final)
        ("r6", 0, 10),    # ner covering a+b
        ("r7", 5, 10),    # ner covering b only (overlaps r6)
        ("r8", 11, 15),   # ner below conf threshold
        ("r9", 11, 25),   # dup-sent_start region: same start as r1, longer
    ],
    "sents": [
        {"label": "s", "ref": "s0", "region_id": "r0"},
        {"label": "s", "ref": "s1", "region_id": "r1"},
        {"label": "chunk", "ref": "sx", "region_id": "r0"},  # skipped
    ],
    "toks": [
        {"ref": "t0", "region_id": "r2", "word": "a", "sentOrd": "0"},
        {"ref": "t1", "region_id": "r3", "word": "b", "sentOrd": "1"},
        {"ref": "t2", "region_id": "r4", "word": "c", "sentOrd": "0"},
        {"ref": "t3", "region_id": "r5", "word": "d", "sentOrd": "1"},
    ],
    "ners": [
        {"ref": "n0", "region_id": "r6", "label": "PER", "conf": "0.90"},
        {"ref": "n1", "region_id": "r7", "label": "LOC", "conf": "0.80"},
        {"ref": "n2", "region_id": "r8", "label": "ORG", "conf": "0.50"},
        {"ref": "n3", "region_id": None, "label": "MISC", "conf": "0.99"},
    ],
}

MICRO_WANT = [
    "a\tPER",          # tok a inside n0
    "b\tPER",          # tok b inside n0 (sentence-final → blank)
    "",
    "b\tLOC",          # tok b ALSO inside n1 → double emission + blank
    "",
    "c\tO",            # n2 conf 0.50 < 0.75 → O
    "d\tO",
    "",
]


def test_micro_twin_pins_reference_quirks():
    assert _twin_conll(MICRO) == MICRO_WANT


def test_micro_operator_matches_twin(spark):
    from transner_spark.operators.graf import graf_merge

    regions = spark.createDataFrame(
        [(1, rid, s, e) for rid, s, e in MICRO["regions"]],
        "doc_id long, region_id string, start long, end long",
    )
    sents = spark.createDataFrame(
        [
            (1, i, a["label"], a["ref"], a["region_id"])
            for i, a in enumerate(MICRO["sents"])
        ],
        "doc_id long, seq long, label string, ref string, region_id string",
    )
    pos = spark.createDataFrame(
        [
            (1, i, a["ref"], a["region_id"], a["word"], a["sentOrd"])
            for i, a in enumerate(MICRO["toks"])
        ],
        "doc_id long, seq long, ref string, region_id string, "
        "word string, sent_ord string",
    )
    ners = spark.createDataFrame(
        [
            (1, i, a["ref"], a["region_id"], a["label"], a["conf"])
            for i, a in enumerate(MICRO["ners"])
        ],
        "doc_id long, seq long, ref string, region_id string, "
        "label string, conf string",
    )
    got = [
        r["line"]
        for r in graf_merge(regions, sents, pos, ners)
        .orderBy("out_idx")
        .collect()
    ]
    assert got == MICRO_WANT


def test_dup_sent_start_overwrite():
    """A second label=='s' annotation with the same sent_start keeps the
    LAST end (dict overwrite) — tokens beyond the first end now fit."""
    model = {
        "regions": [
            ("r1", 11, 20), ("r9", 11, 25),
            ("r4", 11, 15), ("rx", 21, 25),
        ],
        "sents": [
            {"label": "s", "ref": "s1", "region_id": "r1"},
            {"label": "s", "ref": "s2", "region_id": "r9"},  # same start 11
        ],
        "toks": [
            {"ref": "t2", "region_id": "r4", "word": "c", "sentOrd": "0"},
            {"ref": "t4", "region_id": "rx", "word": "e", "sentOrd": "1"},
        ],
        "ners": [],
    }
    # sent_end becomes 25 → token e (21-25) is contained AND sentence-final
    assert _twin_conll(model) == ["c\tO", "e\tO", ""]


def test_nosent_token_dropped():
    model = {
        "regions": [("r0", 0, 5), ("r2", 0, 5), ("r3", 6, 9)],
        "sents": [{"label": "s", "ref": "s0", "region_id": "r0"}],
        "toks": [
            {"ref": "t0", "region_id": "r2", "word": "in", "sentOrd": "0"},
            {"ref": "t1", "region_id": "r3", "word": "out", "sentOrd": "0"},
        ],
        "ners": [],
    }
    assert _twin_conll(model) == ["in\tO", ""]


def test_graf_parser_resolves_first_node_and_last_link(spark, tmp_path):
    """Duplicate xml:id nodes resolve to the FIRST (reference ET.find);
    multiple links on one node resolve to the LAST (loop overwrite)."""
    xml = (
        "<graph xmlns='http://www.xces.org/ns/GrAF/1.0/' "
        "xmlns:xml='http://www.w3.org/XML/1998/namespace'>"
        "<node xml:id='n0'><link targets='rA'/><link targets='rB'/></node>"
        "<node xml:id='n0'><link targets='rC'/></node>"
        "<a label='s' ref='n0'><fs/></a>"
        "</graph>"
    )
    p = tmp_path / "000001-sent.xml"
    p.write_text(xml)
    from transner_spark.sources.graf import read_graf_sents

    rows = read_graf_sents(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["region_id"] == "rB"  # first node, last link
