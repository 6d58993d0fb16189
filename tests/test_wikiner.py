"""T1/T2/T4 parity: Spark WikiNER operators vs the single-node
transcription kernel, on the deterministic sf0.001 corpus."""

from __future__ import annotations

import pytest

from transner_spark.kernels import wikiner as K
from transner_spark.operators.wikiner import (
    iob_to_bio_arr,  # noqa: F401  (exercised via wikiner_conll)
    read_wikiner_lines,
    wikiner_conll,
    wikiner_scan,
    wikiner_sentences,
    write_conll,
)
from transner_spark.sources.wikiner import ensure_wikiner_raw


@pytest.fixture(scope="module")
def raw_path():
    txt, _ = ensure_wikiner_raw("/root/repo", "/root/testdata/sf0.001")
    return txt


@pytest.fixture(scope="module")
def spark_tokens(spark, raw_path):
    return wikiner_scan(read_wikiner_lines(spark, raw_path)).cache()


def test_scan_parity(spark_tokens, raw_path):
    data, targets = K.read_wikiner(raw_path)
    got = {
        (r["article_id"], r["tok_idx"]): (r["word"], r["tag"])
        for r in spark_tokens.collect()
    }
    want = {
        (a, i + 1): (w, t)
        for a, (words, tags) in enumerate(zip(data, targets))
        for i, (w, t) in enumerate(zip(words, tags))
    }
    assert len(got) > 1000
    assert got == want


def test_sentences_parity(spark, spark_tokens, raw_path):
    data, targets = K.read_wikiner(raw_path)
    # kernel sentences per article (reference keeps a flat list; re-derive
    # per-article indices by re-running parse per article)
    want = []
    for a, (words, tags) in enumerate(zip(data, targets)):
        for s_idx, (sent, stags) in enumerate(K.parse_sentences([words], [tags])):
            want.append((a, s_idx, sent, tuple(stags)))
    got = [
        (r["article_id"], r["sent_idx"], r["sentence"], tuple(r["tags"]))
        for r in wikiner_sentences(spark_tokens)
        .orderBy("article_id", "sent_idx")
        .collect()
    ]
    assert len(got) > 100
    assert got == sorted(want)


def test_trailing_tokens_dropped(spark_tokens, raw_path):
    """The leftover-after-last-'.' drop quirk must actually fire on this
    corpus (the generator leaves most articles un-terminated)."""
    data, _ = K.read_wikiner(raw_path)
    n_dropped_articles = sum(1 for words in data if words and words[-1] != ".")
    assert n_dropped_articles > 0  # quirk exercised


def test_conll_parity_with_augment(spark, spark_tokens, raw_path, tmp_path):
    data, targets = K.read_wikiner(raw_path)
    want = K.to_conll_lines(K.parse_sentences(data, targets), augment=True)
    conll = wikiner_conll(wikiner_sentences(spark_tokens), augment=True)
    out = tmp_path / "out.conll"
    write_conll(conll, str(out))
    got = out.read_text(encoding="utf-8").split("\n")[:-1]  # strip final \n
    assert got == want


def test_multi_file_articles_do_not_merge(spark, tmp_path):
    """Per-file article numbering: same article_id in different files
    must stay distinct through scan → sentences (keyed on (file,
    article_id))."""
    for name in ("a.txt", "b.txt"):
        (tmp_path / name).write_text("w1|N|O .|P|O\n", encoding="utf-8")
    toks = wikiner_scan(read_wikiner_lines(spark, str(tmp_path)))
    rows = toks.collect()
    per_file: dict = {}
    for r in rows:
        per_file.setdefault(r["file"], []).append(r["tok_idx"])
    assert len(per_file) == 2
    assert all(sorted(v) == [1, 2] for v in per_file.values())
    assert wikiner_sentences(toks).count() == 2  # one per file, unmerged


def test_trailing_blank_line_drops_final_article(spark, tmp_path):
    """Reference tail-flush quirk (dataset_wikiNER.py:74-79): a file
    ending with a blank line loses its final article — Spark and the
    transcription kernel must agree."""
    p = tmp_path / "t.txt"
    p.write_text("a|N|O .|P|O\n\nb|N|O .|P|O\n\n", encoding="utf-8")
    toks = wikiner_scan(read_wikiner_lines(spark, str(p)))
    assert {r["word"] for r in toks.collect()} == {"a", "."}
    data, _ = K.read_wikiner(str(p))
    assert [w for ws in data for w in ws] == ["a", "."]
    # without the trailing blank, both keep article b
    p2 = tmp_path / "t2.txt"
    p2.write_text("a|N|O .|P|O\n\nb|N|O .|P|O\n", encoding="utf-8")
    toks2 = wikiner_scan(read_wikiner_lines(spark, str(p2)))
    assert {r["word"] for r in toks2.collect()} == {"a", "b", "."}
    data2, _ = K.read_wikiner(str(p2))
    assert [w for ws in data2 for w in ws] == ["a", ".", "b", "."]


def test_any_whitespace_separates_tokens(spark, tmp_path):
    """line.split() semantics: tabs and space runs both separate
    triplets."""
    p = tmp_path / "w.txt"
    p.write_text("a|N|O\tb|N|I-PER  c|N|O\n", encoding="utf-8")
    toks = wikiner_scan(read_wikiner_lines(spark, str(p)))
    got = [(r["word"], r["tag"]) for r in toks.orderBy("tok_idx").collect()]
    assert got == [("a", "O"), ("b", "I-PER"), ("c", "O")]


def test_bio_conversion_in_lines(spark, spark_tokens):
    """At least one B- tag must appear only via conversion (raw corpus
    tags are IOB1: I-* / O only)."""
    conll = wikiner_conll(wikiner_sentences(spark_tokens))
    tags = {r["line"].split(" ")[-1] for r in conll.collect() if r["line"]}
    assert any(t.startswith("B-") for t in tags)
    assert any(t.startswith("I-") for t in tags)


def test_space_only_line_is_not_a_separator(spark, tmp_path):
    """Reference blank test is `line == '\\n'` exactly: a space-only line
    contributes no tokens but does NOT split or terminate an article —
    and a file ENDING in a space-only line keeps its final article."""
    p = tmp_path / "sp.txt"
    p.write_text("a|N|O .|P|O\n \nb|N|O .|P|O\n", encoding="utf-8")
    toks = wikiner_scan(read_wikiner_lines(spark, str(p)))
    rows = toks.orderBy("article_id", "tok_idx").collect()
    # one article containing a . b . (the space line is a no-op)
    assert {r["article_id"] for r in rows} == {0}
    assert [r["word"] for r in rows] == ["a", ".", "b", "."]
    data, _ = K.read_wikiner(str(p))
    assert data == [["a", ".", "b", "."]]

    p2 = tmp_path / "sp2.txt"
    p2.write_text("a|N|O .|P|O\n \n", encoding="utf-8")
    toks2 = wikiner_scan(read_wikiner_lines(spark, str(p2)))
    assert {r["word"] for r in toks2.collect()} == {"a", "."}
    data2, _ = K.read_wikiner(str(p2))
    assert data2 == [["a", "."]]
