"""Unit tests for the training-data pipeline operators (textops, dedup,
simsearch, multimodal, relational) on tiny inline frames."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s1", 43),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat", "en", "s0", 43),  # near dup
        (3, "der hund und die katze sind nicht da", "de", "s0", 36),
        (4, "completely different words entirely here now", "en", "s1", 44),
        (5, "", "en", "s0", 0),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    )


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [0.0, 0.95, 0.05, 0.0], 1),
        (4, [0.0, 0.0, 1.0, 0.0], 2),
        # exactly parallel to vec 0: identical hyperplane sign pattern,
        # so LSH bucketing MUST pair it with query 0 in every table
        (5, [0.5, 0.0, 0.0, 0.0], 0),
    ]
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    return spark.createDataFrame(df)


def test_text_stats_counts(spark, docs_df):
    from transner_spark.operators.textops import text_stats

    out = {r["doc_id"]: r for r in text_stats(docs_df).collect()}
    assert out[0]["n_ws_tokens"] == 9
    assert out[0]["n_stopwords"] == 2  # 'the' twice
    assert out[5]["n_ws_tokens"] == 0 and out[5]["sum_token_chars"] == 0
    assert 0.0 <= out[0]["quality_score"] <= 1.0


def test_lang_id_markers(spark, docs_df):
    from transner_spark.operators.textops import lang_id

    out = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs_df).collect()}
    assert out[0] == "en"
    assert out[3] == "de"
    assert out[5] == "und"


def test_dedup_exact_groups(spark, docs_df):
    from transner_spark.operators.dedup import dedup_exact

    out = {r["doc_id"]: r for r in dedup_exact(docs_df).collect()}
    assert out[0]["text_hash"] == out[1]["text_hash"]
    assert out[0]["keep"] and not out[1]["keep"]
    assert out[2]["keep"]


def test_minhash_lsh_finds_dups(spark, docs_df):
    from transner_spark.operators.dedup import dedup_minhash_lsh

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup_minhash_lsh(docs_df).collect()}
    assert pairs[(0, 1)] == 1.0  # identical docs always collide
    assert (0, 4) not in pairs


def test_simhash_identical_zero_hamming(spark, docs_df):
    from transner_spark.operators.dedup import dedup_simhash

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup_simhash(docs_df).collect()}
    assert pairs[(0, 1)] == 0


def test_embedding_cosine_blocked(spark, emb_df):
    from transner_spark.operators.dedup import dedup_embedding_cosine

    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"]
             for r in dedup_embedding_cosine(emb_df, threshold=0.9).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert all(a != 4 and b != 4 for a, b in pairs)  # label 2 is a singleton


def test_ann_bruteforce_ranks(spark, emb_df):
    from transner_spark.operators.simsearch import ann_bruteforce

    out = ann_bruteforce(emb_df, k=2, n_queries=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    top0 = sorted(by_q[0], key=lambda r: r["rank"])
    # vec 5 is exactly parallel to query 0 → cosine 1.0, always rank 1
    assert [r["neighbor_id"] for r in top0][0] == 5
    assert all(r["rank"] <= 2 for r in out)


def test_ann_lsh_subset_of_bruteforce_candidates(spark, emb_df):
    from transner_spark.operators.simsearch import ann_lsh

    out = ann_lsh(spark, emb_df, k=3, n_queries=2, dim=4).collect()
    # at least one query must find a bucket-mate (vectors 0/1 and 2/3
    # are near-parallel pairs)
    assert len(out) > 0
    # LSH returns ranked bucket-mates only; ranks are contiguous from 1
    for q in {r["query_id"] for r in out}:
        ranks = sorted(r["rank"] for r in out if r["query_id"] == q)
        assert ranks == list(range(1, len(ranks) + 1))


def test_ann_lsh_dim_mismatch_fails_loud(spark, emb_df):
    """The in-plan guard replaced the driver-side .first() dim probe: a
    planes/vector dim mismatch must raise, not silently NULL the dot
    products and return an empty candidate set."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from transner_spark.operators.simsearch import ann_lsh

    with pytest.raises(SparkRuntimeException, match="dim mismatch"):
        ann_lsh(spark, emb_df, k=3, n_queries=2, dim=64).collect()


def test_mm_features_match_payload(spark, docs_df):
    from transner_spark.operators.multimodal import media_features, synthesize_assets

    feats = {r["asset_id"]: r for r in media_features(docs_df).collect()}
    raw = {r["asset_id"]: bytes(r["content"])
           for r in synthesize_assets(docs_df).collect()}
    for aid, content in raw.items():
        r = feats[aid]
        assert r["n_bytes"] == len(content)
        assert r["sum_bytes"] == sum(content)
        assert r["h0"] + r["h1"] + r["h2"] + r["h3"] == len(content)


def test_decode_media_rejects_garbage():
    # the default hook is now a REAL parser (round 5) — garbage bytes
    # fail loud instead of raising NotImplementedError
    from transner_spark.operators.multimodal import decode_media

    with pytest.raises(ValueError):
        decode_media("image", b"\x00")
    with pytest.raises(ValueError):
        decode_media("audio", b"\x00" * 16)


def test_iob_to_bio_shape(spark, docs_df):
    from transner_spark.operators.relational import iob_to_bio

    out = {r["doc_id"]: r for r in iob_to_bio(docs_df).collect()}
    for r in out.values():
        iob, bio = r["iob"].split(" "), r["bio"].split(" ")
        assert len(iob) == len(bio)
        prev = "O"
        for got, src in zip(bio, iob):
            if src == "O":
                assert got == "O"
            elif prev == "O" or prev[2:] != src[2:]:
                assert got == "B-" + src[2:]
            else:
                assert got == src
            prev = src
    assert 5 not in out  # empty doc excluded


def test_region_containment_excludes_straddlers(spark, docs_df):
    from transner_spark.operators.relational import region_containment, token_spans

    spans = token_spans(docs_df).collect()
    contained = sum(
        1 for r in spans
        if (r["t_start"] // 100) == ((r["t_end"] - 1) // 100) or r["t_end"] % 100 == 0
    )
    total = region_containment(docs_df).groupBy().sum("n_tokens").collect()[0][0]
    assert total == contained


def test_substring_antijoin(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"key": ["mario rossi", "rossi", "mario", "luigi verdi"]})
    )
    from transner_spark.operators.relational import substring_antijoin

    kept = {r["key"] for r in substring_antijoin(df).collect()}
    assert kept == {"mario rossi", "luigi verdi"}


def test_role_transitions_total(spark, tiny_df):
    from transner_spark.operators.relational import role_transitions

    out = role_transitions(tiny_df).collect()
    assert sum(r["n"] for r in out) == tiny_df.count()
    starts = sum(r["n"] for r in out if r["prev_role"] == "_START_")
    assert starts == tiny_df.select("conv_id").distinct().count()


def test_frame_sample_video_only(spark, docs_df):
    from transner_spark.operators.multimodal import (
        FRAME_BYTES, FRAME_STRIDE, synthesize_assets, video_frames,
    )

    assets = {r["asset_id"]: r for r in synthesize_assets(docs_df).collect()}
    frames = video_frames(docs_df).collect()
    video_ids = {a for a, r in assets.items() if r["media_type"] == "video"}
    assert {r["asset_id"] for r in frames} <= video_ids
    for r in frames:
        content = bytes(assets[r["asset_id"]]["content"])
        w = content[r["frame_off"]: r["frame_off"] + FRAME_BYTES]
        assert r["frame_len"] == len(w) and r["frame_sum"] == sum(w)
        assert r["frame_idx"] % FRAME_STRIDE == 0


def test_mm_decoder_injection(spark, docs_df):
    """The decoder hook runs inside the batch loop: an injected decoder
    transforms payloads before feature extraction."""
    from transner_spark.operators.multimodal import (
        extract_features, synthesize_assets,
    )

    def truncate_decoder(media_type, content):
        return content[:4]

    out = extract_features(
        synthesize_assets(docs_df), decoder=truncate_decoder
    ).collect()
    assert all(r["n_bytes"] == 4 for r in out)


def test_ann_ivf_cell_structure_and_exact_scores(spark, emb_df):
    from transner_spark.operators.simsearch import ann_ivf, ivf_centroids

    cents = ivf_centroids(emb_df, n_cells=2, n_queries=2).collect()
    assert [r["cell_id"] for r in sorted(cents, key=lambda r: r["cell_id"])] == [0, 1]

    out = ann_ivf(spark, emb_df, k=3, n_queries=2, n_cells=2, nprobe=2).collect()
    assert len(out) > 0
    # with nprobe == n_cells every corpus vector is a candidate → the
    # result must EQUAL brute-force top-k exactly (same ranks, cosines)
    from transner_spark.operators.simsearch import ann_bruteforce

    bf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ann_bruteforce(emb_df, k=3, n_queries=2).collect()
    }
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in out
    }
    assert got == bf


def test_ann_ivf_nprobe_bounds_candidates(spark, emb_df):
    from transner_spark.operators.simsearch import ann_ivf

    out = ann_ivf(spark, emb_df, k=4, n_queries=2, n_cells=4, nprobe=1).collect()
    # probing one of four cells can only surface that cell's members;
    # ranks stay contiguous from 1 per query
    for q in {r["query_id"] for r in out}:
        ranks = sorted(r["rank"] for r in out if r["query_id"] == q)
        assert ranks == list(range(1, len(ranks) + 1))


def test_kmeans_refine_improves_objective(spark, emb_df):
    """Lloyd's objective (sum of cosine to the assigned centroid) must
    not decrease across refinement rounds, and assignments stay total."""
    from transner_spark.operators.simsearch import (
        _dot,
        _nearest_cells,
        _with_norm,
        ivf_centroids,
        kmeans_refine,
    )
    from pyspark.sql import functions as F

    def objective(cents):
        corpus = _with_norm(emb_df).where(F.col("vec_id") >= 2)
        a = _nearest_cells(corpus, cents, 1)
        cos = _dot(F.col("emb"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm"))
        return (
            corpus.join(a, "vec_id")
            .join(cents, "cell_id")
            .select(cos.alias("c"))
            .agg(F.sum("c"))
            .collect()[0][0]
        )

    base = objective(ivf_centroids(emb_df, n_cells=2, n_queries=2))
    assign, cents = kmeans_refine(spark, emb_df, n_cells=2, iters=2, n_queries=2)
    refined = objective(cents)
    assert refined >= base - 1e-9
    rows = assign.collect()
    assert {r["vec_id"] for r in rows} == {2, 3, 4, 5}
    assert all(r["cell_id"] in (0, 1) for r in rows)
    assert cents.count() == 2  # empty cells keep their previous centroid


def test_ann_recall_floors_on_testdata(spark):
    """Regression floor for the shipped ANN configs (VERDICT r2 item 6):
    ann_recall_{lsh,ivf} gate rows verify the recall COMPUTATION; this
    pins the recall LEVEL, so a (L, k) / (n_cells, nprobe) tuning break
    that silently craters candidate generation fails loudly. The
    synthetic embeddings are near-uniform — adversarial for ANN — so the
    absolute levels are modest by data shape (measured mean recall@5:
    lsh 0.45, ivf 0.35 at sf0.01); the floor 0.25 gives tuning headroom
    while still catching a bucketing collapse (which lands near 0)."""
    import os

    import pytest

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        pytest.skip("driver testdata unavailable")
    from transner_spark.operators.simsearch import ann_recall

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    for method in ("lsh", "ivf"):
        rows = ann_recall(spark, emb, method=method).collect()
        assert len(rows) == 8, method
        mean_recall = sum(r["recall"] for r in rows) / len(rows)
        assert mean_recall >= 0.25, (method, mean_recall)


def test_vocab_topk_order_and_tiebreak(spark):
    from transner_spark.operators.textops import vocab_topk

    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (0, "a a a b b zz", "en", "s", 12),
                (1, "b c  c", "en", "s", 6),
                (2, "   ", "en", "s", 3),  # empty after trim -> no tokens
            ],
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
    )
    rows = [(r["token"], r["freq"]) for r in vocab_topk(docs, k=3).collect()]
    # a:3 b:3 (tie -> 'a' first), c:2; 'zz' (1) cut at the boundary
    assert sorted(rows) == [("a", 3), ("b", 3), ("c", 2)]
    with pytest.raises(ValueError):
        vocab_topk(docs, k=0)


def test_tfidf_keywords_vs_twin(spark):
    import math

    from transner_spark.operators.textops import tfidf_keywords

    texts = {
        0: "apple banana apple cherry",
        1: "banana cherry cherry date",
        2: "apple egg egg egg",
        3: "",  # counts toward N, emits nothing
    }
    docs = spark.createDataFrame(
        pd.DataFrame(
            [(i, t, "en", "s", len(t)) for i, t in texts.items()],
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
    )
    # python twin with the identical double-round snap
    n = len(texts)
    tf: dict[tuple, int] = {}
    for i, t in texts.items():
        for w in t.split():
            tf[(i, w)] = tf.get((i, w), 0) + 1
    df_t: dict[str, int] = {}
    for (_, w) in tf:
        df_t[w] = df_t.get(w, 0) + 1
    scored: dict[int, list] = {}
    for (i, w), c in tf.items():
        s = round(round(c * (math.log((n + 1) / (df_t[w] + 1)) + 1), 9), 6)
        scored.setdefault(i, []).append((-s, w, c))
    want = []
    for i, terms in scored.items():
        for r, (neg_s, w, c) in enumerate(sorted(terms)[:2], start=1):
            want.append((i, w, c, df_t[w], -neg_s, r))
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["df"], r["score"], r["rank"])
        for r in tfidf_keywords(docs, k=2).collect()
    )
    assert got == sorted(want)
    assert not any(i == 3 for i, *_ in got)
    with pytest.raises(ValueError):
        tfidf_keywords(docs, k=0)


def test_token_drift_vs_twin(spark):
    import math

    from transner_spark.operators.textops import token_drift

    old_texts = ["a a b c", "a b", ""]
    new_texts = ["a d d d", "d d b"]

    def mk(texts):
        return spark.createDataFrame(
            pd.DataFrame(
                [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
                columns=["doc_id", "text", "lang", "source", "n_chars"],
            )
        )

    got = [
        (r["token"], r["c_old"], r["c_new"], r["kl_term"])
        for r in token_drift(mk(old_texts), mk(new_texts), k=3).collect()
    ]
    # python twin with identical smoothing + snap
    co: dict[str, int] = {}
    cn: dict[str, int] = {}
    for t in old_texts:
        for w in t.split():
            co[w] = co.get(w, 0) + 1
    for t in new_texts:
        for w in t.split():
            cn[w] = cn.get(w, 0) + 1
    vocab = sorted(set(co) | set(cn))
    n_old, n_new, v = sum(co.values()), sum(cn.values()), len(vocab)
    scored = []
    for w in vocab:
        p = (co.get(w, 0) + 1) / (n_old + v)
        q = (cn.get(w, 0) + 1) / (n_new + v)
        scored.append(
            (w, co.get(w, 0), cn.get(w, 0),
             round(round(q * math.log(q / p), 9), 6))
        )
    want = sorted(scored, key=lambda x: (-x[3], x[0]))[:3]
    assert got == want
    # 'd' (absent old, 5 new) must be the top riser
    assert got[0][0] == "d" and got[0][1] == 0 and got[0][2] == 5
    with pytest.raises(ValueError):
        token_drift(mk(old_texts), mk(new_texts), k=0)


def _substr_reference(rows, k):
    import re
    wins = {}
    for doc_id, text in rows:
        # mirror the ENGINE semantics exactly: trim() strips SPACES only
        # (a leading tab survives as a leading collapsed space), then
        # whitespace runs collapse to one space
        nt = re.sub(r"\s+", " ", text.strip(" ")).lower()
        if len(nt) >= k:
            wins[doc_id] = {nt[i:i + k] for i in range(len(nt) - k + 1)}
    pairs = {}
    ids = sorted(wins)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = len(wins[a] & wins[b])
            if n:
                pairs[(a, b)] = n
    return pairs


def test_dedup_substring_matches_python_twin(spark):
    from transner_spark.operators.dedup import dedup_substring

    rows = [
        (1, "The quick brown fox jumps over the lazy dog tonight"),
        (2, "the   QUICK brown fox jumps over a sleeping cat today"),  # shares a run, case/ws-normalized
        (3, "completely unrelated text with no overlap at all here"),
        (4, "short"),                                   # < k chars: no windows
        (5, "The quick brown fox jumps over the lazy dog tonight"),  # exact dup of 1
        # leading tab: trim() keeps it, the collapse turns it into a
        # LEADING SPACE — the twin must see the same extra window
        (6, "\tThe quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_windows"]
        for r in dedup_substring(df, k=20).collect()
    }
    assert got == _substr_reference(rows, 20)
    assert (1, 5) in got           # verbatim dup found
    # leading tab → leading SPACE on both engines AND the twin: doc 6 is
    # " " + doc 1, so every doc-1 window is shared (equal counts) and
    # doc 6 additionally owns the one leading-space window
    assert got[(1, 6)] == got[(1, 5)]
    assert (1, 2) in got           # shared run across case/ws differences
    assert all(4 not in p and 3 not in p for p in got)


def test_dedup_substring_guard_and_sampling(spark):
    from transner_spark.operators.dedup import dedup_substring

    boiler = "x" * 40  # one hot window set shared by every doc
    df = spark.createDataFrame(
        [(i, boiler, "en", "s", 40) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(Exception, match="max_block_rows|dedup_substring"):
        dedup_substring(df, k=20, max_docs_per_window=3).collect()
    # sampling keeps/drops windows by CONTENT hash — both members of a
    # pair decide identically, so surviving pairs keep exact counts
    from transner_spark.operators.dedup import substring_windows

    rows = [(1, "a" * 30 + " middle text " + "b" * 30),
            (2, "a" * 30 + " other words " + "b" * 30)]
    df2 = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    full = {(r["doc_id"], r["win"]) for r in substring_windows(df2, 20).collect()}
    samp = {(r["doc_id"], r["win"])
            for r in substring_windows(df2, 20, sample_mod=3).collect()}
    assert samp < full
    kept = {w for _, w in samp}
    assert all((1, w) in samp and (2, w) in samp
               for w in kept
               if (1, w) in full and (2, w) in full)
