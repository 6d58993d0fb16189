"""Structured-Streaming surface: incremental mention extraction over an
append-only transcripts directory, plus a watermarked windowed mention
count.

The reference is strictly request/response (no streaming), and the
north-rule pipeline is batch-with-checkpoints; this module is the
capability extension for continuously-arriving transcripts: the SAME
fused mapInPandas NER stage (operators/annotate.py) runs unmodified on
a ``readStream`` DataFrame — micro-batch execution, exactly-once via
the sink checkpoint, late turns handled by the event-time watermark.

Scale notes: the annotate stage is stateless per-row, so streaming adds
no shuffle; the windowed aggregate keeps state bounded by the watermark
horizon. ``trigger(availableNow=True)`` gives catch-up batch runs with
streaming semantics (the test path, and the natural backfill mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from transner_spark.config import PipelineConfig
from transner_spark.operators.annotate import annotate_turns, explode_mentions

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def read_transcripts_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """Append-only parquet directory → streaming transcripts source."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_mentions(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    await_termination: bool = True,
):
    """Incremental NER: new transcript files → appended mention rows.
    Exactly-once per input file via the sink checkpoint; a restart
    resumes from the last committed micro-batch."""
    stream = read_transcripts_stream(spark, input_dir)
    mentions = explode_mentions(annotate_turns(stream, cfg))
    q = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_windowed_mention_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    cfg: PipelineConfig | None = None,
):
    """Watermarked tumbling-window aggregate: mentions per (window, type).
    Late turns within the watermark horizon still update their window;
    older state is dropped (bounded-state streaming agg). Returns the
    in-memory query (sink table name = 'mention_counts')."""
    stream = read_transcripts_stream(spark, input_dir)
    annotated = annotate_turns(stream, cfg)
    mentions = annotated.select(
        "ts", F.explode("mentions").alias("m")
    ).select("ts", F.col("m.type").alias("type"))
    counts = (
        mentions.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "type")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select("w.start", "w.end", "type", "n_mentions")
    )
    return (
        counts.writeStream.format("memory")
        .queryName("mention_counts")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
