"""T1/T2/T4 — the WikiNER training-corpus chain, Spark-first.

Reference semantics
(/root/reference/transner/transner/tools/wikiner_tools/dataset_wikiNER.py and
wikiNER2CoNLL.py):

- T1 ``wikiner_scan``: raw lines → (file, article_id, tok_idx, word, pos,
  tag). Contiguous non-blank lines form one article; consecutive blank
  lines collapse (dataset_wikiNER.py:49-64 article_end flag → dense
  article numbering); a file ENDING with a blank line loses its final
  article (the tail flush at :74-79 is guarded by ``line != '\\n'`` — a
  pinned reference quirk); tokens split on ANY whitespace (line.split()),
  triplets split on '|' with word = first part, tag = LAST part
  (dataset_wikiNER.py:65-72).
- T2 ``wikiner_sentences``: per article, a '.' word closes the sentence;
  sentence text = each word + ' ' joined, then '.' appended; the tag list
  includes the '.' token's tag; words after the final '.' are DISCARDED
  (dataset_wikiNER.py:86-116 — curr_sentence is only flushed on '.').
- T4 ``wikiner_conll``: per sentence, one "word tag" line per whitespace
  token with IOB→BIO-converted tags (dataset_wikiNER.py:140-155 — B- when
  the previous RAW tag is O or a different type, reset per sentence),
  then one blank separator line; ``augment=True`` appends a lowercased
  copy of each sentence right after it (wikiNER2CoNLL.py:12-25).

Scale design: article numbering is PER FILE (ids restart at 0 in each
file, like running the reference once per file), so every operator keys
on (file, article_id) — thousands of corpus files parallelize, and
articles from different files can never merge. Within one file the
blank-count window is the unavoidable sequential structure of the
format; token order and sentence assembly are per-article windows /
array ops bounded by article size. Everything is pure Catalyst; no
Python in the data path. Line order inside a file relies on
``monotonically_increasing_id`` being monotone in file order (partition
ids follow split offsets), the standard Spark idiom for line-numbered
text ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ARTICLE_KEY = ["file", "article_id"]


def read_wikiner_lines(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path).select(
        F.input_file_name().alias("file"),
        F.monotonically_increasing_id().alias("lid"),
        F.col("value").alias("text"),
    )


def wikiner_scan(lines: DataFrame) -> DataFrame:
    """T1: raw WikiNER lines → token table
    (file, article_id, tok_idx, word, pos, tag); tok_idx is 1-based
    within the article; article ids number non-empty line groups densely
    per file."""
    w = Window.partitionBy("file").orderBy("lid")
    # reference blank test is `line == '\n'` EXACTLY (dataset_wikiNER.py:51)
    # — after the text source strips the newline that is text == "". A
    # space-only line is NOT a separator: it contributes no tokens but
    # keeps the article open (line.split() yields nothing).
    blank = F.col("text") == ""
    lines = lines.withColumn("_blank", blank).withColumn(
        "grp", F.sum(F.col("_blank").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    # reference quirk: the tail flush (dataset_wikiNER.py:74-79) is
    # skipped when the file's last line is blank → that file's final
    # article is dropped
    file_tail = lines.groupBy("file").agg(
        F.max_by("_blank", "lid").alias("_last_blank")
    )
    nb = lines.where(~F.col("_blank")).withColumn(
        "_max_grp", F.max("grp").over(Window.partitionBy("file"))
    )
    nb = nb.join(F.broadcast(file_tail), "file").where(
        ~(F.col("_last_blank") & (F.col("grp") == F.col("_max_grp")))
    )
    aw = Window.partitionBy("file").orderBy("grp")
    nb = nb.withColumn("article_id", F.dense_rank().over(aw) - 1)

    # line.split()-style tokenization over ASCII whitespace runs. Known
    # bounded divergence from the Python reference: str.split() also
    # splits on non-ASCII Unicode whitespace (NBSP etc.) which Java's
    # \s does not — real WikiNER corpora (and the synthetic one) are
    # ASCII-whitespace separated, so this only matters for exotic input.
    toks = nb.select(
        "file",
        "article_id",
        "lid",
        F.posexplode(F.split(F.col("text"), r"\s+")).alias("lpos", "tok"),
    ).where(F.col("tok") != "")
    tw = Window.partitionBy("file", "article_id").orderBy("lid", "lpos")
    parts = F.split(F.col("tok"), r"\|")
    return (
        toks.withColumn("tok_idx", F.row_number().over(tw))
        .select(
            "file",
            F.col("article_id").cast("long").alias("article_id"),
            F.col("tok_idx").cast("long").alias("tok_idx"),
            F.element_at(parts, 1).alias("word"),
            F.element_at(parts, 2).alias("pos"),
            F.element_at(parts, -1).alias("tag"),  # triplet[-1], T1 quirk
        )
    )


def wikiner_sentences(tokens: DataFrame) -> DataFrame:
    """T2: token table → (file, article_id, sent_idx, sentence, tags).

    sent_idx is 0-based within the article; ``tags`` keeps the raw IOB
    tags (BIO conversion happens at CoNLL export, like the reference's
    __convert_to_BIO before the writer runs)."""
    toks = F.array_sort(F.collect_list(F.struct("tok_idx", "word", "tag")))
    per_art = tokens.groupBy(*ARTICLE_KEY).agg(toks.alias("toks"))

    dots = F.filter(
        F.sequence(F.lit(1), F.size("toks")),
        lambda i: F.element_at(F.col("toks"), i)["word"] == ".",
    )
    per_art = per_art.withColumn("dots", dots).where(F.size("dots") > 0)

    def sent(k: Column) -> Column:
        start = F.when(k == 1, F.lit(1)).otherwise(
            F.element_at(F.col("dots"), (k - 1).cast("int")) + 1
        )
        end = F.element_at(F.col("dots"), k.cast("int"))
        body = F.slice(F.col("toks"), start, end - start)  # words before '.'
        full = F.slice(F.col("toks"), start, end - start + 1)  # incl '.'
        text = F.concat(
            F.concat_ws(
                "", F.transform(body, lambda s: F.concat(s["word"], F.lit(" ")))
            ),
            F.lit("."),
        )
        return F.struct(
            (k - 1).alias("sent_idx"),
            text.alias("sentence"),
            F.transform(full, lambda s: s["tag"]).alias("tags"),
        )

    sents = F.transform(F.sequence(F.lit(1), F.size("dots")), sent)
    return per_art.select(*ARTICLE_KEY, F.explode(sents).alias("s")).select(
        "file",
        "article_id",
        F.col("s.sent_idx").cast("long").alias("sent_idx"),
        "s.sentence",
        "s.tags",
    )


def iob_to_bio_arr(tags: Column) -> Column:
    """Array-level IOB1→BIO (dataset_wikiNER.py:140-155): a typed tag
    becomes B-* when the previous RAW tag is O or of a different type.
    The comparison uses tag[1:] like the reference ('-PER' suffixes)."""
    padded = F.concat(F.array(F.lit("O")), tags)  # padded[i] = prev of tags[i]
    def conv(i: Column) -> Column:
        prev = F.element_at(padded, i.cast("int"))
        curr = F.element_at(padded, (i + 1).cast("int"))
        suffix = F.substring(curr, 2, 1000)  # curr_tag[1:]
        return F.when(
            (curr != "O")
            & ((prev == "O") | (F.substring(prev, 2, 1000) != suffix)),
            F.concat(F.lit("B"), suffix),
        ).otherwise(curr)

    return F.transform(F.sequence(F.lit(1), F.size(tags)), conv)


def wikiner_conll(sentences: DataFrame, augment: bool = False) -> DataFrame:
    """T4: sentence table → ordered CoNLL line table
    (file, article_id, sent_idx, variant, line_idx, line). variant 0 =
    original, variant 1 = lowercased augmentation; each sentence's block
    ends with one blank separator line. The on-disk file is this table
    ordered by (article_id, sent_idx, variant, line_idx) per file — see
    write_conll."""
    base = sentences.select(
        *ARTICLE_KEY,
        "sent_idx",
        F.split(F.col("sentence"), " ").alias("words"),
        iob_to_bio_arr(F.col("tags")).alias("bio"),
    )

    def lines_arr(words: Column) -> Column:
        content = F.transform(
            F.sequence(F.lit(1), F.size(words)),
            lambda i: F.concat(
                F.element_at(words, i.cast("int")),
                F.lit(" "),
                F.element_at(F.col("bio"), i.cast("int")),
            ),
        )
        return F.concat(content, F.array(F.lit("")))

    def variant(v: int, words: Column) -> DataFrame:
        return base.select(
            *ARTICLE_KEY,
            "sent_idx",
            F.lit(v).cast("long").alias("variant"),
            F.posexplode(lines_arr(words)),
        ).withColumnsRenamed({"pos": "line_idx", "col": "line"})

    out = variant(0, F.col("words"))
    if augment:
        out = out.unionByName(
            variant(1, F.transform(F.col("words"), F.lower))
        )
    return out.select(
        "file",
        "article_id",
        "sent_idx",
        "variant",
        F.col("line_idx").cast("long").alias("line_idx"),
        "line",
    )


def write_conll(conll: DataFrame, path: str) -> None:
    """Materialize the line table as a .conll text file in reference
    order. Driver-side like the reference's writer (wikiNER2CoNLL.py:14);
    at corpus scale write per-partition text shards ordered by the same
    key and concatenate (the reference's own `cat` step, SURVEY T11)."""
    rows = (
        conll.orderBy("file", "article_id", "sent_idx", "variant", "line_idx")
        .select("line")
        .collect()
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(r["line"] for r in rows) + "\n")
