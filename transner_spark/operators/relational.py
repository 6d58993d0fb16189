"""Relational coverage operators — the Spark expression of the
reference's corpus-tooling dataflow (SURVEY.md §2.5) plus the two
join-shaped predicates buried in its rule engine:

- corpus_stats       : T6 — distinct-word/avg-length aggregation
                       (reference stats.py:79-99)
- iob_to_bio         : T3 — IOB→BIO tag conversion over token arrays
                       (reference dataset_wikiNER.py:140-155)
- split_train_val_test: T5 — deterministic hash split
                       (reference wikiNER2CoNLL.py:108-126)
- region_containment : T7 — interval-containment join of char-anchored
                       tokens into fixed regions (reference
                       graf_merger.py:19-121, annotation.py:35)
- substring_antijoin : T9 — drop keys that are word-bounded substrings
                       of another key (reference parser.py:101-118)
- mention_overlap_pairs: R5 — the overlap-or-touching span predicate as
                       a self-join (reference ner.py:312-350; adjacency
                       counts as overlap, ner.py:341)
- role_transitions   : the north rule's cross-turn window (lag over
                       (conv_id, turn_idx)) aggregated to a transition
                       matrix

Scale notes: T6 shuffles once on (lang, word) then once on lang; T7's
containment join is an equi-join on doc_id with the interval predicate
as a post-filter (regions per doc are generated, not shuffled); T9 is a
broadcast nested-loop over a dimension-sized key set — it is only
correct to use for dictionaries, never for fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transner_spark.functions.hashing import h60
from transner_spark.operators.textops import ws_tokens

REGION_CHARS = 100
IOB_TYPES = ("PER", "LOC", "ORG")  # pmod(h60,5): 0,1,2 → typed, 3,4 → O


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-language corpus statistics: doc count, distinct word count,
    token totals, average tokens per document."""
    toks = docs.select("lang", "doc_id", ws_tokens(F.col("text")).alias("toks"))
    per_doc = toks.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("sum_tokens"),
    )
    words = (
        toks.select("lang", F.explode("toks").alias("word"))
        .groupBy("lang")
        .agg(F.count_distinct("word").cast("long").alias("n_distinct_words"))
    )
    return per_doc.join(words, "lang").select(
        "lang",
        "n_docs",
        "n_distinct_words",
        "sum_tokens",
        F.round(F.col("sum_tokens") / F.col("n_docs"), 6).alias("avg_tokens"),
    )


def _iob_tags(toks: F.Column) -> F.Column:
    """Deterministic synthetic IOB tags (the corpus stand-in: tag is a
    pure function of the token, as a gazetteer tagger would emit)."""
    def tag(t: F.Column) -> F.Column:
        code = F.pmod(h60(F.concat(F.lit("tag:"), t)), F.lit(5))
        out = F.lit("O")
        for i, ty in enumerate(IOB_TYPES):
            out = F.when(code == i, F.lit(f"I-{ty}")).otherwise(out)
        return out

    return F.transform(toks, tag)


def iob_to_bio(docs: DataFrame) -> DataFrame:
    """IOB→BIO: a typed tag becomes B- when the previous tag is O or a
    different type (reference dataset_wikiNER.py:140-155). Implemented
    with an O-sentinel prepend so no conditional indexing is needed."""
    toks = ws_tokens(F.col("text"))
    # filter empties first: sequence(1, 0) would DESCEND, not return []
    base = docs.select("doc_id", _iob_tags(toks).alias("tags")).where(
        F.size("tags") > 0
    )
    padded = F.concat(F.array(F.lit("O")), F.col("tags"))  # padded[i] = prev of tags[i]
    bio = F.transform(
        F.sequence(F.lit(1), F.size("tags")),
        lambda i: F.when(
            (F.element_at(padded, i + 1) != "O")
            & (
                (F.element_at(padded, i) == "O")
                | (
                    F.substring(F.element_at(padded, i), 3, 10)
                    != F.substring(F.element_at(padded, i + 1), 3, 10)
                )
            ),
            F.concat(F.lit("B-"), F.substring(F.element_at(padded, i + 1), 3, 10)),
        ).otherwise(F.element_at(padded, i + 1)),
    )
    return base.select(
        "doc_id",
        F.concat_ws(" ", F.col("tags")).alias("iob"),
        F.concat_ws(" ", bio).alias("bio"),
    )


def split_train_val_test(docs: DataFrame) -> DataFrame:
    """Deterministic 70/15/15 hash split (modulo-20 buckets on the
    portable hash of the doc id — reproducible on any engine/cluster,
    unlike randomSplit)."""
    bucket = F.pmod(
        h60(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), F.lit(20)
    )
    split = (
        F.when(bucket < 14, F.lit("train"))
        .when(bucket < 17, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def token_spans(docs: DataFrame) -> DataFrame:
    """Char-anchored tokens: (doc_id, tok_idx, t_start, t_end) with
    t_start = (tok_idx−1) + chars of all prior tokens — the GrAF-style
    standoff anchor model. Prefix sums via concat-length stay pure
    Catalyst; O(n²) in token count, which is bounded per document."""
    toks = ws_tokens(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    base = docs.select("doc_id", toks.alias("toks"))
    spans = F.transform(
        F.sequence(F.lit(1), F.size("toks")),
        lambda i: F.struct(
            i.alias("tok_idx"),
            (
                i - 1 + F.length(F.concat_ws("", F.slice(F.col("toks"), 1, i - 1)))
            ).alias("t_start"),
            (
                i - 1
                + F.length(F.concat_ws("", F.slice(F.col("toks"), 1, i - 1)))
                + F.length(F.element_at(F.col("toks"), i))
            ).alias("t_end"),
        ),
    )
    return (
        base.where(F.size("toks") > 0)
        .select("doc_id", F.explode(spans).alias("s"))
        .select("doc_id", "s.tok_idx", "s.t_start", "s.t_end")
    )


def region_containment(docs: DataFrame) -> DataFrame:
    """Interval-containment join: tokens fall into the fixed-width char
    region that fully contains them (tokens straddling a boundary are
    dropped — containment, not overlap). Equi-join on doc_id; the
    interval predicate is a join-side filter."""
    spans = token_spans(docs)
    regions = docs.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), F.floor(F.length(F.trim(F.col("text"))) / REGION_CHARS)
            )
        ).alias("region_id"),
    ).select(
        "doc_id",
        "region_id",
        (F.col("region_id") * REGION_CHARS).alias("r_start"),
        ((F.col("region_id") + 1) * REGION_CHARS).alias("r_end"),
    )
    joined = spans.join(regions, "doc_id").where(
        (F.col("t_start") >= F.col("r_start")) & (F.col("t_end") <= F.col("r_end"))
    )
    return joined.groupBy("doc_id", F.col("region_id").cast("long").alias("region_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("t_end") - F.col("t_start")).cast("long").alias("sum_token_chars"),
    )


def substring_antijoin(keys: DataFrame) -> DataFrame:
    """Keep only keys that are NOT a word-bounded substring of another
    key (reference parser.py:101-118; word boundary approximated by
    space-padding, identically in the oracle). Broadcast nested-loop —
    dimension-sized inputs only."""
    a, b = keys.alias("a"), keys.alias("b")
    contained = (
        a.join(
            F.broadcast(b),
            (F.col("a.key") != F.col("b.key"))
            & (
                F.instr(
                    F.concat(F.lit(" "), F.col("b.key"), F.lit(" ")),
                    F.concat(F.lit(" "), F.col("a.key"), F.lit(" ")),
                )
                > 0
            ),
        )
        .select(F.col("a.key").alias("key"))
        .distinct()
    )
    return keys.join(contained, "key", "left_anti").select("key")


def mention_overlap_pairs(mentions: DataFrame) -> DataFrame:
    """Overlapping-or-touching mention span pairs within a turn — the
    reference's find_overlap predicate (ner.py:312-350) as a self-join;
    touching endpoints count as overlap (ner.py:341)."""
    spans = mentions.select(
        "conv_id",
        "turn_idx",
        F.col("mention_id").cast("long").alias("mention_id"),
        "type",
        F.col("offset").cast("long").alias("s"),
        (F.col("offset") + F.length("value")).cast("long").alias("e"),
    )
    a, b = spans.alias("a"), spans.alias("b")
    return (
        a.join(
            b,
            (F.col("a.conv_id") == F.col("b.conv_id"))
            & (F.col("a.turn_idx") == F.col("b.turn_idx"))
            & (F.col("a.mention_id") < F.col("b.mention_id"))
            & ~(
                (F.col("a.e") < F.col("b.s")) | (F.col("b.e") < F.col("a.s"))
            ),
        )
        .select(
            F.col("a.conv_id").alias("conv_id"),
            F.col("a.turn_idx").cast("long").alias("turn_idx"),
            F.col("a.mention_id").alias("a_id"),
            F.col("b.mention_id").alias("b_id"),
            F.col("a.type").alias("a_type"),
            F.col("b.type").alias("b_type"),
        )
    )


def role_transitions(transcripts: DataFrame) -> DataFrame:
    """Cross-turn window: previous role via lag over the stable
    (conv_id, turn_idx) ordering, aggregated into a transition matrix."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.select(
            F.coalesce(F.lag("role").over(w), F.lit("_START_")).alias("prev_role"),
            "role",
        )
        .groupBy("prev_role", "role")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization of the events stream table: a new session
    starts when a user's inter-event gap exceeds ``gap_minutes``.
    Classic two-window composition — lag to flag session starts, running
    sum to assign session ids — one shuffle on user_id, which is also the
    session key, so the whole computation is co-partitioned. This is the
    batch twin of the SURVEY §2.6 note on session assembly (the streaming
    analogue being a session window with watermark)."""
    def secs(c):
        # TIMESTAMP_NTZ → seconds: route via TIMESTAMP (session tz is UTC)
        return F.col(c).cast("timestamp").cast("long")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = secs("ts") - F.lag(secs("ts")).over(w)
    with_start = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    with_sess = with_start.withColumn(
        "session_idx", F.sum("is_start").over(w)
    )
    return (
        with_sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.count_distinct("event_type").cast("long").alias("n_event_types"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("long").alias("session_idx"),
            "n_events",
            (
                F.col("session_end").cast("timestamp").cast("long")
                - F.col("session_start").cast("timestamp").cast("long")
            ).alias("duration_s"),
            "sum_value",
            "n_event_types",
        )
    )
