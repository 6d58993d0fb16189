"""Randomized differential tests: seeded pathological corpora pushed
through the Spark operators and the single-node transcription kernels,
compared exactly. One generated corpus per chain → one Spark run, broad
structural coverage (blank runs, space-only lines, trailing blanks,
dot-only sentences, unterminated articles, '$'-bearing words,
overlapping entity keys)."""

from __future__ import annotations

import random

from transner_spark.kernels import inline_annotation as KI
from transner_spark.kernels import wikiner as KW

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "kk", "x1", "räto"]
TAGS = ["O", "I-PER", "I-LOC", "I-ORG"]
POS = ["N", "V", "A"]


def _random_wikiner(rng: random.Random) -> str:
    chunks: list[str] = []
    for _ in range(60):
        kind = rng.random()
        if kind < 0.18:
            chunks.append("")  # blank separator (possibly consecutive)
        elif kind < 0.24:
            chunks.append(" " * rng.randint(1, 3))  # space-only no-op line
        else:
            n = rng.randint(1, 12)
            toks = []
            for _ in range(n):
                if rng.random() < 0.25:
                    toks.append(".|P|O")
                else:
                    w = rng.choice(WORDS)
                    toks.append(f"{w}|{rng.choice(POS)}|{rng.choice(TAGS)}")
            chunks.append(" ".join(toks))
    text = "\n".join(chunks)
    if rng.random() < 0.5:
        text += "\n"  # may or may not end with newline/blank
    return text


def test_wikiner_chain_random_corpus(spark, tmp_path):
    from transner_spark.operators.wikiner import (
        read_wikiner_lines,
        wikiner_conll,
        wikiner_scan,
        wikiner_sentences,
        write_conll,
    )

    rng = random.Random(20260817)
    p = tmp_path / "rand.txt"
    p.write_text(_random_wikiner(rng), encoding="utf-8")

    data, targets = KW.read_wikiner(str(p))
    toks = wikiner_scan(read_wikiner_lines(spark, str(p))).cache()

    got_tokens = {
        (r["article_id"], r["tok_idx"]): (r["word"], r["tag"])
        for r in toks.collect()
    }
    want_tokens = {
        (a, i + 1): (w, t)
        for a, (ws, ts) in enumerate(zip(data, targets))
        for i, (w, t) in enumerate(zip(ws, ts))
    }
    assert got_tokens == want_tokens
    assert len(got_tokens) > 50

    want_sents = []
    for a, (ws, ts) in enumerate(zip(data, targets)):
        for s_idx, (sent, stags) in enumerate(KW.parse_sentences([ws], [ts])):
            want_sents.append((a, s_idx, sent, tuple(stags)))
    got_sents = [
        (r["article_id"], r["sent_idx"], r["sentence"], tuple(r["tags"]))
        for r in wikiner_sentences(toks).orderBy("article_id", "sent_idx").collect()
    ]
    assert got_sents == sorted(want_sents)

    out = tmp_path / "rand.conll"
    write_conll(wikiner_conll(wikiner_sentences(toks), augment=True), str(out))
    got_lines = out.read_text(encoding="utf-8").split("\n")[:-1]
    want_lines = KW.to_conll_lines(KW.parse_sentences(data, targets), augment=True)
    assert got_lines == want_lines


def test_inline_annotation_random_corpus(spark):
    from transner_spark.operators.inline_annotation import (
        concat_corpus,
        inline_annotate,
        inline_conll,
    )

    rng = random.Random(99)
    texts = []
    for _ in range(40):
        n = rng.randint(0, 25)
        ws = []
        for _ in range(n):
            # "$a$b$c" (>=3 '$'s) buffers while ent=False, exercising the
            # reference's append-on-start-of-entity quirk (ADVICE r2)
            w = rng.choice(WORDS + ["$odd", "a$b", "$x$PER", "$a$b$c"])
            ws.append(w)
        sep = rng.choice([" ", "  "])
        texts.append(sep.join(ws))
    ents = {
        "alpha": "PER",
        "beta gamma": "ORG",  # multiword key
        "gamma": "LOC",       # nested inside the multiword key
        "kk": "PER",
    }

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    edf = spark.createDataFrame(sorted(ents.items()), "key string, ty string")
    ann = inline_annotate(docs, edf).cache()

    got_ann = {r["doc_id"]: r["annotated"] for r in ann.collect()}
    want_ann = {i: KI.annotate_text(t, ents) for i, t in enumerate(texts)}
    assert got_ann == want_ann
    assert any("$" in v and "$PER " in v + " " for v in got_ann.values())

    conll = inline_conll(ann)
    got_c: dict = {i: [] for i in range(len(texts))}
    for r in conll.orderBy("doc_id", "src_line", "out_idx").collect():
        got_c[r["doc_id"]].append(r["line"])
    for i, t in enumerate(texts):
        assert got_c[i] == KI.create_conll_lines(want_ann[i]), i

    corpus = concat_corpus(conll, docs)
    got_all = [
        r["line"]
        for r in corpus.orderBy("doc_id", "src_line", "out_idx").collect()
    ]
    want_all = KI.concat_corpus_lines(
        [KI.create_conll_lines(want_ann[i]) for i in range(len(texts))]
    )
    assert got_all == want_all
