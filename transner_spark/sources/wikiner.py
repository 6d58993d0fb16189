"""Deterministic WikiNER-format corpus synthesis.

The reference's training-corpus chain (T1/T2/T4) ingests the raw WikiNER
files: articles of whitespace-separated ``word|POS|IOB-tag`` triplets,
spread over one or more lines, with blank lines separating articles
(/root/reference/transner/transner/tools/wikiner_tools/dataset_wikiNER.py:39-80).
The real aij-wikiner downloads are unreachable from this sandbox, so this
module synthesizes a byte-deterministic stand-in from the driver-provided
``documents`` table:

- one article per sampled document; words are the document's text tokens
  ('|' and whitespace stripped so the triplet format stays parseable);
- POS and IOB1 tag are pure functions of the word (md5-keyed), giving
  realistic I-run/type-switch patterns for the IOB→BIO conversion;
- a ``.|PUNCT|O`` token closes each sentence after a deterministic 6-12
  words; most articles end with trailing words after the last '.' so the
  reference's leftover-token drop quirk is exercised;
- articles are wrapped at 20 tokens per line; single blank separators;
  no trailing blank line (exercises the reference's tail-flush branch).

Both the Spark operators (reading ``wikiner.txt``) and the DuckDB
oracles (reading the line-for-line ``wikiner_lines.parquet``) consume
this same generated content; each engine re-derives article grouping,
token parsing, sentence splitting, and CoNLL export independently.
"""

from __future__ import annotations

import hashlib
import os

POS_TAGS = ("NOUN", "VERB", "ADJ", "ADV", "DET", "ADP", "PRON", "PROPN")
IOB_TYPES = ("PER", "LOC", "ORG")
TOKENS_PER_LINE = 20
MAX_WORDS_PER_ARTICLE = 120
ARTICLE_SAMPLE_MOD = 5  # keep doc_id % 5 == 0 → 1/5 of documents


def _h(key: str) -> int:
    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:8], 16)


def _pos(word: str) -> str:
    return POS_TAGS[_h("pos:" + word) % len(POS_TAGS)]


def _tag(word: str) -> str:
    """IOB1 tag as a pure function of the word (a gazetteer tagger's
    behavior): codes 0-2 → I-{PER,LOC,ORG}, 3-9 → O."""
    code = _h("wtag:" + word) % 10
    return f"I-{IOB_TYPES[code]}" if code < len(IOB_TYPES) else "O"


def _sentence_len(doc_id: int, sent_idx: int) -> int:
    return 6 + _h(f"slen:{doc_id}:{sent_idx}") % 7  # 6..12 words


def article_tokens(doc_id: int, text: str) -> list[str]:
    """One article's ``word|POS|tag`` triplet stream, '.' separators
    inserted every 6-12 words."""
    words = [
        w.replace("|", "") for w in text.split() if w.replace("|", "")
    ][:MAX_WORDS_PER_ARTICLE]
    out: list[str] = []
    sent_idx, in_sent = 0, 0
    for w in words:
        out.append(f"{w}|{_pos(w)}|{_tag(w)}")
        in_sent += 1
        if in_sent >= _sentence_len(doc_id, sent_idx):
            out.append(".|PUNCT|O")
            sent_idx += 1
            in_sent = 0
    # leftover words after the last '.' stay un-terminated on purpose
    return out


def wikiner_paths(repo_root: str, sf: str) -> tuple[str, str]:
    base = os.path.join(repo_root, "data", "cache", sf)
    return os.path.join(base, "wikiner.txt"), os.path.join(
        base, "wikiner_lines.parquet"
    )


def ensure_wikiner_raw(repo_root: str, sf_dir: str) -> tuple[str, str]:
    """Generate-once raw WikiNER file + its line-for-line parquet twin.
    Returns (txt_path, lines_parquet_path)."""
    from transner_spark.sources.transcripts import sf_name

    sf = sf_name(sf_dir)
    txt_path, pq_path = wikiner_paths(repo_root, sf)
    if os.path.exists(txt_path) and os.path.exists(pq_path):
        return txt_path, pq_path

    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    docs_path = os.path.join(sf_dir, "documents.parquet")
    tbl = pq_mod.read_table(docs_path, columns=["doc_id", "text"])
    rows = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )

    lines: list[str] = []
    first = True
    for doc_id, text in rows:
        if int(doc_id) % ARTICLE_SAMPLE_MOD != 0:
            continue
        toks = article_tokens(int(doc_id), text or "")
        if not toks:
            continue
        if not first:
            lines.append("")  # single blank separator
        first = False
        for i in range(0, len(toks), TOKENS_PER_LINE):
            lines.append(" ".join(toks[i : i + TOKENS_PER_LINE]))

    os.makedirs(os.path.dirname(txt_path), exist_ok=True)
    # tmp + os.replace, parquet last (matches ensure_alias_dim_parquet):
    # a crash mid-write must not leave both paths existing with a
    # truncated parquet that the existence check above would accept
    txt_tmp, pq_tmp = txt_path + ".tmp", pq_path + ".tmp"
    with open(txt_tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    pq_mod.write_table(
        pa.table(
            {
                "line_no": pa.array(range(len(lines)), type=pa.int64()),
                "text": pa.array(lines, type=pa.string()),
            }
        ),
        pq_tmp,
    )
    os.replace(txt_tmp, txt_path)
    os.replace(pq_tmp, pq_path)
    return txt_path, pq_path
