"""Structured-Streaming surface: incremental mention extraction with
exactly-once file semantics, and the watermarked windowed aggregate."""

from __future__ import annotations

import os

import pandas as pd
import pytest


@pytest.fixture()
def stream_dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "cp", "cp2")}
    os.makedirs(d["in"])
    return d


def _write_batch(spark, tiny_pdf, in_dir: str, lo: int, hi: int, name: str):
    part = tiny_pdf[(tiny_pdf["turn_idx"] >= lo) & (tiny_pdf["turn_idx"] < hi)]
    spark.createDataFrame(part).coalesce(1).write.mode("append").parquet(
        os.path.join(in_dir, name)
    )


def test_stream_mentions_incremental(spark, tiny_pdf, tiny_df, stream_dirs):
    from transner_spark.operators.annotate import annotate_turns, explode_mentions
    from transner_spark.streaming.incremental import stream_mentions

    d = stream_dirs
    _write_batch(spark, tiny_pdf, d["in"], 0, 3, "b0")
    stream_mentions(spark, d["in"] + "/*", d["out"], d["cp"])
    first = spark.read.parquet(d["out"]).count()
    assert first > 0

    # second file arrives → ONLY the new turns are processed (exactly-once
    # per input file via the sink checkpoint)
    _write_batch(spark, tiny_pdf, d["in"], 3, 5, "b1")
    stream_mentions(spark, d["in"] + "/*", d["out"], d["cp"])
    total = spark.read.parquet(d["out"]).count()
    assert total > first

    # streamed total == batch total over the same rows
    batch = explode_mentions(annotate_turns(tiny_df)).count()
    assert total == batch


def test_stream_windowed_counts(spark, tiny_pdf, stream_dirs):
    from transner_spark.streaming.incremental import (
        stream_windowed_mention_counts,
    )

    d = stream_dirs
    _write_batch(spark, tiny_pdf, d["in"], 0, 5, "b0")
    q = stream_windowed_mention_counts(spark, d["in"] + "/*", d["cp2"])
    q.awaitTermination()
    out = spark.sql("select * from mention_counts").toPandas()
    # append mode only emits windows the watermark has closed; the fixture
    # spans a bounded ts range so at least the earliest windows finalize
    assert set(out.columns) == {"start", "end", "type", "n_mentions"}
    if len(out):
        assert (out["n_mentions"] > 0).all()
        assert (pd.to_datetime(out["end"]) > pd.to_datetime(out["start"])).all()
