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


def _to_sdf(spark, pdf):
    from transner_spark.streaming.incremental import TRANSCRIPT_SCHEMA

    # explicit schema: an all-null object column would otherwise be
    # inferred (and parquet-written) as BOOLEAN
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def _write_batch(spark, tiny_pdf, in_dir: str, lo: int, hi: int, name: str):
    part = tiny_pdf[(tiny_pdf["turn_idx"] >= lo) & (tiny_pdf["turn_idx"] < hi)]
    _to_sdf(spark, part).coalesce(1).write.mode("append").parquet(
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


def test_stateful_conversation_assembly(spark, tiny_pdf, tmp_path):
    """applyInPandasWithState: conversations close via idle timeout and
    the emitted aggregates match a batch groupBy over the same turns."""
    import time

    from transner_spark.streaming.incremental import (
        assemble_conversations, read_transcripts_stream,
    )

    in_dir = str(tmp_path / "in"); cp = str(tmp_path / "cp")
    part = tiny_pdf[tiny_pdf["conv_id"].isin(tiny_pdf["conv_id"].unique()[:5])]
    _to_sdf(spark, part).coalesce(1).write.parquet(in_dir + "/b0")

    stream = read_transcripts_stream(spark, in_dir + "/*")
    q = (
        assemble_conversations(stream, idle_timeout_ms=2000)
        .writeStream.format("memory")
        .queryName("conv_assembly")
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        out = None
        for _ in range(60):
            time.sleep(1)
            out = spark.sql("select * from conv_assembly").toPandas()
            if len(out) >= part["conv_id"].nunique():
                break
        assert out is not None and len(out) == part["conv_id"].nunique()
    finally:
        q.stop()

    expect = part.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"),
        n_roles=("role", lambda s: s.nunique()),
        first_ts=("ts", "min"),
        last_ts=("ts", "max"),
    )
    for _, r in out.iterrows():
        e = expect.loc[r["conv_id"]]
        assert r["n_turns"] == e["n_turns"]
        assert r["n_roles"] == e["n_roles"]
        assert r["first_ts"] == e["first_ts"] and r["last_ts"] == e["last_ts"]
        assert r["closed_by"] == "timeout"


def test_append_mode_windowed_counts_flush(spark, tmp_path):
    """Append-mode file-sink aggregate (production semantics): after two
    far-future sentinel turns advance the watermark (the second inside
    the first's horizon), the sink holds exactly the batch-derived real
    windows and neither sentinel window."""
    from pyspark.sql import functions as F
    from transner_spark.operators.annotate import annotate_turns
    from transner_spark.sources.transcripts import ensure_transcripts_parquet
    from transner_spark.streaming.incremental import (
        run_append_counts_to_horizon,
    )

    src = ensure_transcripts_parquet("/root/repo", "/root/testdata/sf0.001")
    in_dir, out_dir, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    run_append_counts_to_horizon(spark, src, in_dir, out_dir, ck)

    got = spark.read.parquet(out_dir)
    # batch-derived expectation over the REAL corpus only
    batch = annotate_turns(spark.read.parquet(src)).select(
        "ts", F.explode("mentions").alias("m")
    )
    want = (
        batch.groupBy(F.window("ts", "10 minutes").alias("w"), F.col("m.type").alias("type"))
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select("w.start", "w.end", "type", "n_mentions")
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_append_mode_drops_late_data(spark, tmp_path):
    """Watermark semantics pinned from the LATE side: once the watermark
    has passed a window's end (and its row flushed to the sink), a late
    event inside that window is DROPPED — the sink row is neither
    re-emitted nor updated. This is the exactly-once contract consumers
    of the append sink rely on: a flushed window is final."""
    from datetime import timedelta

    from pyspark.sql import functions as F
    from transner_spark.sources.transcripts import ensure_transcripts_parquet
    from transner_spark.streaming.incremental import (
        TRANSCRIPT_SCHEMA,
        run_append_counts_to_horizon,
        stream_windowed_counts_append,
    )

    src = ensure_transcripts_parquet("/root/repo", "/root/testdata/sf0.001")
    in_dir, out_dir, ck = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    run_append_counts_to_horizon(spark, src, in_dir, out_dir, ck)
    before = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert len(before) > 0

    # a late turn INSIDE the already-flushed data range, carrying a
    # mention so the post-explode watermark node sees its ts
    min_ts = spark.read.parquet(src).agg(F.min("ts")).collect()[0][0]
    late = [(
        "__late_arrival__", 0, "user",
        "late [URL_9] inside a closed window",
        None, min_ts + timedelta(seconds=1),
    )]
    spark.createDataFrame(late, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream_windowed_counts_append(
        spark, in_dir, out_dir, ck
    ).awaitTermination()

    after = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert after == before  # late event dropped; flushed windows final

    # a regression that ADMITTED the late row into window state might
    # only surface its duplicate/updated row on a LATER batch (state
    # eviction order is an implementation detail) — so drive one more
    # micro-batch. The extra turn is itself late vs the horizon
    # watermark (dropped too); its only job is forcing batch N+1, where
    # any wrongly-admitted state would have to flush.
    max_ts = spark.read.parquet(src).agg(F.max("ts")).collect()[0][0]
    sentinel = [(
        "__batch_driver__", 0, "user",
        "one more [URL_9] to drive the next micro-batch",
        None, max_ts + timedelta(hours=2),
    )]
    spark.createDataFrame(sentinel, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream_windowed_counts_append(
        spark, in_dir, out_dir, ck
    ).awaitTermination()
    final = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert final == before  # nothing re-emitted, nothing updated


def test_stream_edge_increments_maintenance(spark, tiny_pdf, tiny_df, stream_dirs):
    """The maintained edge table equals the batch rollup after each
    arrival; a rerun with no new files is a no-op (exactly-once per
    input file), and a new file merges only its increment."""
    import pyspark.sql.functions as F

    from transner_spark.operators.annotate import annotate_turns, explode_triples
    from transner_spark.operators.canonicalize import canonicalize
    from transner_spark.operators.linking import link_surfaces, node_surfaces
    from transner_spark.operators.materialize import materialize_edges
    from transner_spark.streaming.incremental import (
        current_edge_state,
        stream_edge_increments,
    )

    d = stream_dirs
    state = d["out"] + "_edges"
    t_all = explode_triples(annotate_turns(tiny_df))
    canon = canonicalize(link_surfaces(spark, node_surfaces(t_all)))

    def batch_edges(lo, hi):
        part = tiny_df.where(
            (F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi)
        )
        return materialize_edges(explode_triples(annotate_turns(part)), canon)

    def snap(df):
        cols = ["subj_id", "pred", "obj_id", "weight", "first_ts", "last_ts"]
        return sorted(map(tuple, df.select(cols).collect()))

    def state_df():
        return spark.read.parquet(current_edge_state(state)[0])

    _write_batch(spark, tiny_pdf, d["in"], 0, 3, "b0")
    stream_edge_increments(spark, d["in"] + "/*", state, d["cp"], canon)
    assert snap(state_df()) == snap(batch_edges(0, 3))

    # rerun, nothing new → identical state (no double-merge)
    before = snap(state_df())
    stream_edge_increments(spark, d["in"] + "/*", state, d["cp"], canon)
    assert snap(state_df()) == before

    # new file → maintained table becomes the whole-corpus rollup
    _write_batch(spark, tiny_pdf, d["in"], 3, 5, "b1")
    stream_edge_increments(spark, d["in"] + "/*", state, d["cp"], canon)
    assert snap(state_df()) == snap(batch_edges(0, 5))

    # a re-delivered batch id is a committed no-op: CURRENT carries the
    # last applied id in the same atomic pointer as the data
    path, last = current_edge_state(state)
    assert last >= 0 and path.endswith(f"v{last}")

    # pointing a DIFFERENT checkpoint at the same state dir fails loud:
    # its batch ids restart at 0, so the last-applied guard would
    # silently drop new batches (ADVICE r3) — the identity recorded in
    # CURRENT must match the running query's checkpoint
    _write_batch(spark, tiny_pdf, d["in"], 5, 7, "b2")
    with pytest.raises(Exception, match="different checkpoint"):
        stream_edge_increments(spark, d["in"] + "/*", state, d["cp2"], canon)
    # and the committed state is untouched by the refused run
    assert current_edge_state(state) == (path, last)

    # a LEGACY two-field CURRENT (no recorded identity) is just as
    # uncomparable — the guard must not silently bypass it (review r4):
    # rewrite the pointer without the identity field and expect the
    # same loud failure even under the ORIGINAL checkpoint
    with open(os.path.join(state, "CURRENT")) as fh:
        current_line = fh.read()
    vname_cur, last_s = current_line.split()[:2]
    with open(os.path.join(state, "CURRENT"), "w") as fh:
        fh.write(f"{vname_cur} {last_s}")
    with pytest.raises(Exception, match="different checkpoint"):
        stream_edge_increments(spark, d["in"] + "/*", state, d["cp"], canon)

    # a checkpoint DELETED AND RECREATED AT THE SAME PATH restarts batch
    # ids at 0 under a fresh query id — the identity must come from the
    # checkpoint's metadata, not its path, for the guard to see this
    # (review r4): restore the full pointer, nuke the checkpoint, expect
    # the same loud failure instead of silent batch drops
    import shutil as _shutil

    with open(os.path.join(state, "CURRENT"), "w") as fh:
        fh.write(current_line)
    _shutil.rmtree(d["cp"])
    _write_batch(spark, tiny_pdf, d["in"], 7, 9, "b3")
    with pytest.raises(Exception, match="different checkpoint"):
        stream_edge_increments(spark, d["in"] + "/*", state, d["cp"], canon)
    assert current_edge_state(state) == (path, last)
