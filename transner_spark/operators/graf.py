"""T7 front half — GrAF standoff merge + CoNLL annotation, Spark-first.

Distributed re-expression of the reference's two-script chain
(/root/reference/transner/transner/tools/panacea_tools/preprocessing_dataset/graf_merger.py:19-121
→ annotation.py:26-48): resolve sentence/token/NER annotations through
the region table, containment-join tokens into sentences and NERs onto
tokens, and emit CoNLL lines in the reference's output order with its
quirks intact (documented in kernels/graf.py — the test-only python
twin of this operator).

Scale design: every join is a doc_id equi-join with an in-partition
range predicate (regions per doc are bounded), dedup quirks are
``max_by``/``min`` aggregates, and the only windows are partitioned by
doc_id — no global ordering anywhere; the output's ``out_idx`` makes
per-doc order explicit so a downstream writer can shard by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transner_spark.kernels.graf import CONF_THRESHOLD


def _resolved(annos: DataFrame, regions: DataFrame) -> DataFrame:
    """Inner-join annotations to their region anchors: annotations whose
    node has no link (region_id null) vanish — the reference assigns
    inside the link loop."""
    return annos.join(regions, ["doc_id", "region_id"])


def graf_sentences(sents: DataFrame, regions: DataFrame) -> DataFrame:
    """(doc_id, sent_start, sent_end, spos): label=='s' only; duplicate
    sent_start keeps the LAST annotation's end (dict overwrite) but the
    FIRST occurrence's position (dict insertion order is preserved on
    overwrite) — spos is that insertion position, used for the
    first-containing-sentence token assignment."""
    s = _resolved(sents.where(F.col("label") == "s"), regions)
    return s.groupBy("doc_id", F.col("start").alias("sent_start")).agg(
        F.max_by("end", "seq").alias("sent_end"),
        F.min("seq").alias("spos"),
    )


def graf_tokens(pos: DataFrame, sentences: DataFrame, regions: DataFrame) -> DataFrame:
    """Tokens resolved + containment-assigned to the first (by spos)
    sentence that fully contains them; tokens outside every sentence are
    dropped ("Nosent?"); duplicate (sentence, sentOrd) keeps the last
    annotation (dict overwrite)."""
    t = _resolved(pos, regions)
    joined = t.join(
        sentences,
        (t["doc_id"] == sentences["doc_id"])
        & (t["start"] >= sentences["sent_start"])
        & (t["end"] <= sentences["sent_end"]),
    ).select(
        t["doc_id"], "seq", "word", "sent_ord", "start", "end",
        "sent_start", "sent_end", "spos",
    )
    first_sent = Window.partitionBy("doc_id", "seq").orderBy("spos")
    assigned = (
        joined.withColumn("_rn", F.row_number().over(first_sent))
        .where(F.col("_rn") == 1)
        .drop("_rn", "spos")
    )
    return assigned.groupBy("doc_id", "sent_start", "sent_ord").agg(
        F.max_by(F.struct("word", "start", "end", "sent_end"), "seq").alias("t")
    ).select(
        "doc_id", "sent_start", "sent_ord",
        F.col("t.word").alias("word"),
        F.col("t.start").alias("start"),
        F.col("t.end").alias("end"),
        F.col("t.sent_end").alias("sent_end"),
    )


def graf_ner_spans(ners: DataFrame, regions: DataFrame) -> DataFrame:
    """NER spans resolved through regions; duplicate refs keep the last
    annotation's span/label/conf but the first occurrence's position
    (npos — the stable-sort tiebreak for equal starts)."""
    n = _resolved(ners, regions)
    return n.groupBy("doc_id", "ref").agg(
        F.max_by(F.struct("start", "end", "label", "conf"), "seq").alias("n"),
        F.min("seq").alias("npos"),
    ).select(
        "doc_id",
        F.col("n.start").alias("ner_start"),
        F.col("n.end").alias("ner_end"),
        F.col("n.label").alias("ner_label"),
        F.col("n.conf").alias("conf"),
        "npos",
    )


def graf_merge(
    regions: DataFrame,
    sents: DataFrame,
    pos: DataFrame,
    ners: DataFrame,
    conf_threshold: float = CONF_THRESHOLD,
) -> DataFrame:
    """(doc_id, out_idx, line) — the reference's .conll output.

    Emission rules (annotation.py): per token, one "word\\tLABEL" line
    per containing NER with conf >= threshold, in (ner_start, npos)
    order — overlapping NERs multi-emit; tokens with no NER emit
    "word\\tO"; EVERY emission whose token ends its sentence is followed
    by a blank line. Output order: sentences by sent_start, tokens by
    int(sent_ord), then the token's emissions."""
    sentences = graf_sentences(sents, regions)
    tokens = graf_tokens(pos, sentences, regions)
    kept = graf_ner_spans(ners, regions).where(
        F.col("conf").cast("double") >= conf_threshold
    )

    matched = tokens.join(
        kept,
        (tokens["doc_id"] == kept["doc_id"])
        & (tokens["start"] >= kept["ner_start"])
        & (tokens["end"] <= kept["ner_end"]),
        "left",
    ).select(
        tokens["doc_id"], "sent_start", "sent_ord", "word", "end", "sent_end",
        "ner_start", "ner_label", "npos",
    )
    line = F.when(
        F.col("ner_label").isNotNull(),
        F.concat(F.col("word"), F.lit("\t"), F.col("ner_label")),
    ).otherwise(F.concat(F.col("word"), F.lit("\tO")))
    lines = F.when(
        F.col("end") == F.col("sent_end"), F.array(line, F.lit(""))
    ).otherwise(F.array(line))

    order = Window.partitionBy("doc_id").orderBy(
        "sent_start",
        F.col("sent_ord").cast("int"),
        F.col("ner_start").asc_nulls_first(),
        F.col("npos").asc_nulls_first(),
        "eidx",
    )
    return (
        matched.select(
            "doc_id", "sent_start", "sent_ord", "ner_start", "npos",
            F.posexplode(lines).alias("eidx", "line"),
        )
        .withColumn("out_idx", F.row_number().over(order).cast("long") - 1)
        .select("doc_id", "out_idx", "line")
    )
