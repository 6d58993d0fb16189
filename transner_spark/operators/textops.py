"""Text-analysis operators for the training-data pipeline: token
counting, quality scoring, n-gram-heuristic language ID, and rolling
document fingerprinting — over the ``documents`` table
(doc_id, text, lang, source, n_chars).

Everything here is pure Catalyst (built-in ``pyspark.sql.functions``,
JVM-side, whole-stage-codegen) — zero Python UDFs. Each operator is a
narrow per-row map over the scan: no shuffle, so at 100 TB the job is
scan-bound and scales linearly with executors; column pruning means the
parquet reader fetches only ``doc_id, text`` (+ ``lang`` for the
accuracy flag).

Counterpart of the reference's corpus tooling (stats over tokens,
/root/reference/transner/transner/tools/wikiner_tools/stats/stats.py:79-99;
fasttext language ID, /root/reference/transner/transner/ner.py:154-161 —
re-expressed as a deterministic marker-word heuristic since the output
contract needs no ML model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transner_spark.functions.hashing import h60, h60_seeded

# BPE-ish word/number/symbol tokenizer — valid in both Java regex (Spark)
# and RE2 (DuckDB), so the oracle reuses it verbatim.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

# Marker-word lists for the n-gram/stopword language-ID heuristic.
# Deterministic, tiny, broadcast-free (inlined constants in the plan).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "and", "of", "to", "in", "is", "for"),
    "es": ("el", "los", "las", "que", "es", "una", "por", "con"),
    "fr": ("le", "les", "et", "est", "dans", "une", "pour", "qui"),
    "it": ("il", "di", "che", "per", "sono", "della", "con", "una"),
}

STOPWORDS: tuple[str, ...] = tuple(
    sorted({w for ws in LANG_MARKERS.values() for w in ws})
)

FINGERPRINT_K = 8  # char-shingle width for the rolling fingerprint


def ws_tokens(col: F.Column) -> F.Column:
    """Whitespace tokens of trimmed text (empty text → empty array)."""
    return F.when(F.length(F.trim(col)) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(F.trim(col), r"\s+"))



def exploded_tokens(docs: DataFrame, alias: str = "token") -> DataFrame:
    """(doc_id?, <alias>): one row per whitespace token — tokens
    materialized into a column BEFORE the explode, as explode_outer +
    NULL filter. Plain explode over the raw split() expression makes
    Catalyst infer a `size > 0` filter, push it below the projection,
    and re-run the split per row (the round-5 decontaminate pathology);
    outer explode skips the inference and the post-generate NULL filter
    restores identical rows (empty/NULL text contributes nothing).
    Measured ~12% off the sf0.1 token census."""
    cols = ["doc_id"] if "doc_id" in docs.columns else []
    return (
        docs.select(*cols, ws_tokens(F.col("text")).alias("_t"))
        .select(*cols, F.explode_outer("_t").alias(alias))
        .where(F.col(alias).isNotNull())
    )


def quality_from_counts(
    n_ws: F.Column, n_bpe: F.Column, n_punct: F.Column, n_stop: F.Column
) -> F.Column:
    """The deterministic quality score from pre-computed counts — the
    single definition shared by text_stats and corpus_filter, so callers
    that already built the counts don't re-derive the regex passes."""
    punct_ratio = n_punct / F.greatest(n_bpe, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_ws, F.lit(1))
    return F.round(
        F.least(F.lit(1.0), n_ws / F.lit(50.0))
        * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio))
        * (F.lit(0.5) + F.lit(0.5) * F.least(F.lit(1.0), stop_ratio * 5.0)),
        6,
    )


def quality_expr(text: F.Column, toks: F.Column | None = None) -> F.Column:
    """Quality score from a text column. Pass ``toks`` as a MATERIALIZED
    token column when available (the word_grams contract: the size and
    the interpreted stopword filter would otherwise each re-run the
    split)."""
    toks = ws_tokens(text) if toks is None else toks
    return quality_from_counts(
        F.size(toks),
        F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(PUNCT_PATTERN), F.lit(0))),
        F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))),
    )


def lang_pred_expr(text: F.Column, ltoks: F.Column | None = None) -> F.Column:
    """Marker-word language prediction as a reusable Column expression.
    Pass ``ltoks`` (lowercased tokens) as a materialized column when
    available — the five per-language filters would otherwise each
    re-run the split+lower."""
    toks = F.transform(ws_tokens(text), F.lower) if ltoks is None else ltoks
    counts = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")
        for lang, words in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*counts.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # alphabetical ⇒ deterministic ties
        pred = pred.when(counts[lang] == best, F.lit(lang))
    return pred


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counts, punctuation/stopword ratios, and a
    deterministic quality score (the length/punct/stopword heuristic a
    pretraining-data filter would threshold on). Tokens are materialized
    once (word_grams contract) — size / stopword filter / char-sum each
    consume the column, not a re-split."""
    docs = docs.select("doc_id", "text", ws_tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    n_ws = F.size(toks)
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0)))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(PUNCT_PATTERN), F.lit(0)))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    sum_tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    quality = quality_from_counts(n_ws, n_bpe, n_punct, n_stop)
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_ws.cast("long").alias("n_ws_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        n_punct.cast("long").alias("n_punct"),
        n_stop.cast("long").alias("n_stopwords"),
        sum_tok_chars.alias("sum_token_chars"),
        quality.alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: occurrence count per language's marker
    list; argmax with alphabetical tie-break; 'und' when nothing hits.
    Lowered tokens materialize once; the five marker filters read the
    column."""
    docs = docs.select(
        "doc_id", "lang", ws_tokens(F.col("text")).alias("_toks")
    ).select(
        "doc_id", "lang", F.transform("_toks", F.lower).alias("_ltoks")
    )
    toks = F.col("_ltoks")
    def _marker_count(words: tuple[str, ...]) -> F.Column:
        return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")

    counts = {
        lang: _marker_count(words) for lang, words in sorted(LANG_MARKERS.items())
    }
    df = docs.select("doc_id", F.col("lang").alias("lang_declared"),
                     *[c.alias(f"c_{lang}") for lang, c in counts.items()])
    best = F.greatest(*[F.col(f"c_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # alphabetical ⇒ deterministic ties
        pred = pred.when(F.col(f"c_{lang}") == best, F.lit(lang))
    return df.select(
        "doc_id",
        "lang_declared",
        pred.alias("lang_pred"),
        best.alias("marker_hits"),
    )


QUALITY_MIN = 0.3  # corpus_filter default keep threshold


def corpus_filter(
    docs: DataFrame,
    min_quality: float = QUALITY_MIN,
    allowed_langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Single-pass corpus curation — the compose step a pretraining
    pipeline actually runs: quality threshold + language filter + exact
    near-dup keeper, decided per document in ONE narrow projection plus
    ONE shuffle (the dup-keeper window on the normalized-text hash).
    Joining the standalone text_stats/lang_id/dedup_exact outputs would
    cost three scans and two extra shuffles for the same answer.

    Returns every doc with its flags (not pre-filtered) so downstream
    consumers can audit rejection reasons: (doc_id, quality_score,
    lang_pred, quality_ok, lang_ok, not_dup, keep_doc)."""
    from pyspark.sql import Window

    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    w = Window.partitionBy(h60(norm)).orderBy("doc_id")
    docs = docs.select(
        "doc_id", "text", ws_tokens(F.col("text")).alias("_toks")
    ).select(
        "doc_id", "text", "_toks",
        F.transform("_toks", F.lower).alias("_ltoks"),
    )
    quality = quality_expr(F.col("text"), F.col("_toks"))
    pred = lang_pred_expr(F.col("text"), F.col("_ltoks"))
    lang_ok = (
        pred != "und" if allowed_langs is None else pred.isin(*allowed_langs)
    )
    out = docs.select(
        "doc_id",
        quality.alias("quality_score"),
        pred.alias("lang_pred"),
        (quality >= min_quality).alias("quality_ok"),
        lang_ok.alias("lang_ok"),
        (F.row_number().over(w) == 1).alias("not_dup"),
    )
    return out.withColumn(
        "keep_doc", F.col("quality_ok") & F.col("lang_ok") & F.col("not_dup")
    )


def doc_fingerprint(docs: DataFrame, k: int = FINGERPRINT_K) -> DataFrame:
    """Rolling-hash document fingerprint: k-char shingles over
    whitespace-normalized lowercase text, each hashed with h60; the
    fingerprint is the min hash under two independent seeds (a 2-row
    winnowing sketch), plus the distinct-shingle cardinality."""
    # normalized text materialized BEFORE the shingle transform: a
    # higher-order lambda runs interpreted with no common-subexpression
    # elimination, so an inline `norm` would re-run the regex once per
    # character position — O(len^2) per doc (the round-5 decontaminate
    # pathology, operators/dedup.word_grams)
    norm = F.col("_norm")
    shingles = F.when(F.length(norm) < k, F.array(norm)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(norm) - (k - 1)),
                lambda i: norm.substr(i, F.lit(k)),
            )
        )
    )
    df = docs.select(
        "doc_id",
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")).alias(
            "_norm"
        ),
    ).select("doc_id", shingles.alias("shingles"))
    return df.select(
        "doc_id",
        F.size("shingles").cast("long").alias("n_shingles"),
        F.array_min(F.transform(F.col("shingles"), h60)).alias("fp_min"),
        F.array_min(
            F.transform(F.col("shingles"), lambda s: h60_seeded(1, s))
        ).alias("fp_alt"),
    )


VOCAB_TOPK = 200
# gate-scale k: BELOW sf0.01's distinct-token count (31), so the
# driver-visible oracle actually exercises the deterministic boundary
# cut — with k > |vocab| the LIMIT never fires and a tiebreak
# regression would pass the gate unnoticed
VOCAB_GATE_K = 20


def vocab_topk(docs: DataFrame, k: int = VOCAB_TOPK) -> DataFrame:
    """(token, freq): the ``k`` most frequent whitespace tokens of the
    corpus, ties broken by token asc (a total order, so the cut at the
    k boundary is deterministic and value-gateable) — the frequency
    table a BPE/WordPiece vocabulary build starts from, and the base
    census for stopword-list induction.

    Shape: one explode + one map-side-combinable hash aggregate (token
    partials collapse within each partition before the single shuffle),
    then top-k as TakeOrderedAndProject — per-partition heaps of k
    merged on the driver, never a global sort. The hot token ("the")
    costs one partial per partition, not a skewed reduce."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        exploded_tokens(docs.select("text"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
    )


KEYWORDS_K = 3


def tfidf_keywords(docs: DataFrame, k: int = KEYWORDS_K) -> DataFrame:
    """(doc_id, term, tf, df, score, rank): the top-``k`` TF-IDF terms
    of every document — keyword extraction / salient-term indexing over
    the corpus (what a search or topic surface shows per document).
    Smooth-idf variant: ``score = tf * (ln((N+1)/(df+1)) + 1)`` with N
    counting ALL documents of the input (empty docs contribute to N but
    emit no terms).

    Shape: one explode + (doc, term) count agg (map-side partials) into
    a localCheckpoint BARRIER (the dedup persisted-signature precedent:
    Catalyst does not reuse the exchange across the tf/df branches, so
    without the barrier the df branch re-scans and re-explodes the
    whole corpus — the expensive pass — a second time; materializing
    the far smaller tf frame once buys both branches). df is then a
    term-keyed agg over the barrier, the scalar N a broadcast 1-row
    crossJoin (the pagerank posture — no collect), one equi-join on
    term (the hot term is AQE skew-join territory at scale), and a rank
    window PARTITIONED by doc_id (per-doc frames). ln is
    transcendental, so the score is double-round-snapped
    (round(round(x, 9), 6)) on BOTH engines before ranking — the repo's
    float-determinism rule — and ties break by term asc, making the
    top-k cut a total order."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    toks = exploded_tokens(docs.select("doc_id", "text"), alias="term")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).localCheckpoint()
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.round(
                    F.col("tf")
                    * (
                        F.log(
                            (F.col("n_docs") + F.lit(1).cast("double"))
                            / (F.col("df") + F.lit(1).cast("double"))
                        )
                        + F.lit(1.0)
                    ),
                    9,
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


DRIFT_TOPK = 30


def snapshot_split(docs: DataFrame) -> F.Column:
    """The deterministic md5-half predicate ("old snapshot" = md5 first
    hex digit < '8') the drift gate and its plan audit both split the
    documents table with — ONE definition so the audited plan cannot
    diverge from the gated plan (the eval_split pattern). DuckDB twin:
    ``substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'``."""
    return (
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1
        )
        < "8"
    )


def token_drift(
    old_docs: DataFrame, new_docs: DataFrame, k: int = DRIFT_TOPK
) -> DataFrame:
    """(token, c_old, c_new, kl_term): the ``k`` tokens whose frequency
    shifted most between two corpus snapshots, scored by their
    add-1-smoothed KL(new‖old) contribution — the drift monitor a
    continuously-ingesting training pipeline runs between yesterday's
    and today's corpus before deciding to retrain (vocabulary drift,
    topic shift, ingestion bugs that flood one template). kl_term =
    q·ln(q/p) with p=(c_old+1)/(N_old+V), q=(c_new+1)/(N_new+V) over
    the UNION vocabulary, so tokens absent from one side still score.

    Shape: one token-count agg per side (map-side partials), a full
    outer join on token into a localCheckpoint BARRIER (the vocab frame
    feeds both the scalar totals and the scoring — same tfidf
    rationale), the three scalars (N_old, N_new, V) as ONE broadcast
    1-row crossJoin, then top-k via orderBy+limit over the vocab-sized
    frame (TakeOrderedAndProject — per-partition heaps). ln is
    transcendental, so kl_term is double-round-snapped on BOTH engines
    BEFORE the ordering; ties break by token asc — a total order at
    the k boundary."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def counts(docs: DataFrame, name: str) -> DataFrame:
        return (
            exploded_tokens(docs.select("text"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    vocab = (
        counts(old_docs, "c_old")
        .join(counts(new_docs, "c_new"), "token", "full")
        .fillna(0, subset=["c_old", "c_new"])
        .localCheckpoint()
    )
    scal = vocab.agg(
        F.sum("c_old").cast("long").alias("n_old"),
        F.sum("c_new").cast("long").alias("n_new"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    p = (F.col("c_old") + F.lit(1).cast("double")) / (
        F.col("n_old") + F.col("v")
    )
    q = (F.col("c_new") + F.lit(1).cast("double")) / (
        F.col("n_new") + F.col("v")
    )
    return (
        vocab.crossJoin(F.broadcast(scal))
        .withColumn("kl_term", F.round(F.round(q * F.log(q / p), 9), 6))
        .orderBy(F.col("kl_term").desc(), F.col("token").asc())
        .limit(k)
        .select("token", "c_old", "c_new", "kl_term")
    )
