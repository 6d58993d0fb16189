"""The independent DuckDB classifier-mentions oracle vs the python
kernel chain (ner_batch) on crafted inputs — pins the SQL re-derivation
of preprocess+map, greedy tiling, softmax confidence, BIO decode, and
the P8 remap on constructions the synthetic corpus may not exercise."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from transner_spark.data.lexicons import ensure_ner_lexicon_parquet
from transner_spark.kernels.ner_pipeline import ner_batch
from transner_spark.oracles_ner import mentions_ner_sql

CRAFTED = [
    "Mario Rossi flew to Naples yesterday",          # name chain + city
    "il signor Rossi called dr Bianchi",             # title promotions
    "rossi rossi mario mario",                       # repeated tokens (shared offsets)
    "Maria,Verdi visited Milan!!",                   # punctuation splits + case restore
    "acme bank talked to Abn Amro about abn amro",   # multi-token phrases
    "unknown words only here",                       # no entities
    "",                                              # empty turn
    "...!!!",                                        # punctuation only
    "mario",                                         # trailing entity (flush quirk)
    "Mario Rossi.",                                  # entity closed by punct token
    "  leading  spaces mario   rossi  ",             # whitespace runs
]


def test_mentions_ner_oracle_matches_kernel(tmp_path):
    rows = [("c0", i, t) for i, t in enumerate(CRAFTED)]
    src = tmp_path / "turns.parquet"
    pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"]).to_parquet(
        src, index=False
    )
    ph, nm = ensure_ner_lexicon_parquet("/root/repo")
    got = duckdb.sql(mentions_ner_sql(str(src), ph, nm)).df()

    want_rows = []
    results = ner_batch([t for _, _, t in rows])
    for (conv_id, turn_idx, _), res in zip(rows, results):
        mid = 0
        for e in res["entities"]:
            if e["source"] != "model":
                continue
            want_rows.append(
                (conv_id, turn_idx, mid, e["type"], e["value"], e["offset"],
                 e["confidence"])
            )
            mid += 1
    want = pd.DataFrame(
        want_rows,
        columns=["conv_id", "turn_idx", "mention_id", "type", "value",
                 "offset", "confidence"],
    )
    assert len(want) > 4, "crafted inputs must actually produce mentions"
    key = ["conv_id", "turn_idx", "mention_id"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w), (len(g), len(w))
    for c in ["type", "value", "offset", "confidence"]:
        mism = (g[c].values != w[c].values).sum()
        assert mism == 0, (c, g[g[c].values != w[c].values].head())


@pytest.mark.parametrize("sf", ["sf0.001"])
def test_mentions_ner_oracle_matches_golden(sf):
    """Corpus-wide: the SQL chain reproduces every model-path golden
    mention bit-for-bit (including the truncated-mean confidences)."""
    cache = f"/root/repo/data/cache/{sf}/transcripts.parquet"
    golden = f"/root/repo/data/golden/{sf}/mentions.parquet"
    ph, nm = ensure_ner_lexicon_parquet("/root/repo")
    got = duckdb.sql(mentions_ner_sql(cache, ph, nm)).df()
    want = pd.read_parquet(golden)
    want = want[want.source == "model"].drop(columns=["source"])
    key = ["conv_id", "turn_idx", "mention_id"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    for c in ["type", "value", "offset", "confidence"]:
        assert (g[c].values == w[c].values).all(), c


def test_mentions_regex_oracle_matches_kernel(tmp_path):
    """Position-exact finditer emulation vs kernels/rules.find_from_regex
    on adversarial inputs: the strpos-relocation trap (a match string
    occurring earlier as a NON-match, end guard satisfied only by $),
    ^-anchored first matches, boundary-char trims, and multiple
    same-pattern matches per line."""
    from transner_spark.kernels.rules import find_from_regex
    from transner_spark.oracles_ner import RE2_SAFE_TYPES, mentions_regex_sql

    texts = [
        "id 123456789x and then 123456789",    # trap: last match via $
        "123456789 starts the line",            # ^ start guard
        "a@b.co c@d.net,x 1.2.3.4. 10.0.0.1",   # emails + ipv4 + trims
        "phone +39 0612345678 end",
        "RSSMRA85T10A562S. code",               # fiscal + trailing-dot trim
        "AB123456C near AB123456 and QQ999999M",
        "iban IT60 9934 1234 5678 9012 3456 end",   # EU_IBAN spaced form
        "IT6099341234567890123456",                  # EU_IBAN compact
        "",
    ]
    src = tmp_path / "t.parquet"
    pd.DataFrame(
        [("c", i, t) for i, t in enumerate(texts)],
        columns=["conv_id", "turn_idx", "text"],
    ).to_parquet(src, index=False)
    got = duckdb.sql(mentions_regex_sql(str(src))).df()
    want = pd.DataFrame(
        [
            ("c", i, e["type"], e["value"], e["offset"], e["confidence"])
            for i, t in enumerate(texts)
            for e in find_from_regex(t)
            if e["type"] in RE2_SAFE_TYPES
        ],
        columns=["conv_id", "turn_idx", "type", "value", "offset", "confidence"],
    )
    assert len(want) >= 8
    key = ["conv_id", "turn_idx", "type", "offset"]
    g = got.sort_values(key).reset_index(drop=True).astype(str)
    w = want.sort_values(key).reset_index(drop=True).astype(str)
    assert g.equals(w), (g.to_string(), w.to_string())


def test_kg_mentions_combined_oracle_matches_golden():
    """The COMBINED kg_mentions derivation (model + regex + gazetteer
    with interleaved mention_id) reproduces the golden table
    bit-for-bit — the golden file's remaining role is this cross-check;
    the gate oracle is the SQL derivation itself."""
    from transner_spark.data.lexicons import ensure_ner_lexicon_parquet
    from transner_spark.oracles_ner import kg_mentions_sql

    ph, nm = ensure_ner_lexicon_parquet("/root/repo")
    got = duckdb.sql(
        kg_mentions_sql("/root/repo/data/cache/sf0.001/transcripts.parquet", ph, nm)
    ).df()
    want = pd.read_parquet("/root/repo/data/golden/sf0.001/mentions.parquet")
    key = ["conv_id", "turn_idx", "mention_id"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    for c in ["type", "value", "offset", "confidence", "source"]:
        assert (g[c].values == w[c].values).all(), c
