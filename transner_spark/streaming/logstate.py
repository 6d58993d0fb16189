"""Log-structured streaming edge state: O(batch) writes, merge-on-read,
amortized compaction.

``stream_edge_increments`` (streaming/incremental.py) maintains the edge
table as a full snapshot per micro-batch — simple and atomic, but every
commit REWRITES the whole accumulated table, so per-batch write cost is
O(table). At 10^12-turn scale that is the wrong asymptote: a maintained
KG's steady state is tiny increments against a huge table, and the
production pattern (Iceberg/Delta merge-on-read, LSM trees, Kafka
compacted topics) is the opposite split:

- **append**: each micro-batch writes ONLY its increment-sized edge
  segment (``segments/s{batch_id}``) — per-batch write cost is O(batch),
  independent of table size;
- **merge-on-read**: readers union the live segments and apply the same
  commutative-monoid rollup the batch gate proves
  (``merge_edge_increments``: weight sums, first/last ts bounds) — one
  hash aggregate whose input is the segment rows;
- **compaction**: when the live-segment count passes a threshold (or on
  an explicit ``compact_edge_log`` call) the segments are rolled up once
  into a single base segment, restoring O(1)-segment reads — the
  amortized rewrite the snapshot layout pays on EVERY batch.

Commit protocol (same family as stream_edge_increments, extended with a
manifest level — the filesystem mirror of a table format's snapshot +
manifest-list):

- segment dirs are named by batch id and written with
  ``mode("overwrite")``: a crash mid-write leaves an uncommitted dir
  that re-delivery simply overwrites;
- each commit writes an immutable ``MANIFEST.{n}`` (one live segment
  path per line, tmp + ``os.replace``), then atomically swings
  ``CURRENT`` — which records the manifest name, the last applied batch
  id, and the CHECKPOINT IDENTITY (see stream_edge_increments: batch
  ids are only monotone within one checkpoint's sequence, so a
  fresh/recreated checkpoint against existing state fails loud instead
  of silently dropping batches);
- superseded manifests and unreferenced segment dirs are pruned only
  AFTER the commit;
- compaction commits through the same CURRENT pointer with an
  optimistic concurrency check (re-read CURRENT before the swing; a
  batch landing in between aborts the compaction rather than losing
  it). Inline auto-compaction (``compact_every``) runs inside
  foreachBatch — same single writer, so batch + compaction are one
  commit.

Read path at scale: segments share one schema, so the reader is a
single multi-path parquet scan → one hash aggregate on the edge key
(map-side partials bound hot edges). Read amplification grows with the
live-segment count — exactly the measured LSM trade
(scripts/bench_logstate.py, BENCH.md) — and compaction is the knob.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from transner_spark.config import PipelineConfig
from transner_spark.operators.annotate import annotate_turns
from transner_spark.streaming.incremental import (
    TRANSCRIPT_SCHEMA,
    _checkpoint_identity,
)

SEGMENTS_DIR = "segments"
MANIFEST_PREFIX = "MANIFEST."


def _read_log_current(state_dir: str) -> tuple[str | None, int, str | None]:
    """(manifest name, last applied batch id, checkpoint identity) from
    the CURRENT pointer; (None, -1, None) if nothing committed."""
    cur = os.path.join(state_dir, "CURRENT")
    if not os.path.exists(cur):
        return None, -1, None
    with open(cur) as fh:
        fields = fh.read().split()
    return fields[0], int(fields[1]), fields[2] if len(fields) > 2 else None


def _read_manifest(state_dir: str, manifest_name: str) -> list[str]:
    """Live segment paths (relative to state_dir), in commit order."""
    with open(os.path.join(state_dir, manifest_name)) as fh:
        return [line.strip() for line in fh if line.strip()]


def log_edge_segments(state_dir: str) -> tuple[list[str], int]:
    """Resolve the live snapshot of a log-structured state dir:
    (absolute segment paths, last applied batch id), or ([], -1) if no
    commit yet. Readers go through this instead of assuming a layout."""
    manifest, bid, _ = _read_log_current(state_dir)
    if manifest is None:
        return [], -1
    rels = _read_manifest(state_dir, manifest)
    return [os.path.join(state_dir, r) for r in rels], bid


def read_edge_log(
    spark: SparkSession, state_dir: str, cfg: PipelineConfig | None = None
) -> DataFrame | None:
    """Merge-on-read: union the live segments and apply the edge monoid
    (one multi-path scan + one hash aggregate). Returns None if nothing
    has committed. The result is value-identical to the snapshot
    layout's maintained table — the stream_edges_log_eq gate checks it
    against the whole-corpus SQL derivation."""
    from transner_spark.operators.materialize import merge_edge_increments

    segs, _ = log_edge_segments(state_dir)
    if not segs:
        return None
    return merge_edge_increments(spark.read.parquet(*segs), cfg=cfg)


def _commit(
    state_dir: str,
    segment_rels: list[str],
    batch_id: int,
    ck_identity: str,
    manifest_seq: int,
) -> None:
    """Write an immutable manifest then atomically swing CURRENT; prune
    superseded manifests and unreferenced segments after the commit."""
    mname = f"{MANIFEST_PREFIX}{manifest_seq}"
    tmp = os.path.join(state_dir, f"{mname}.{os.getpid()}.tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(segment_rels) + "\n")
    os.replace(tmp, os.path.join(state_dir, mname))
    tmp = os.path.join(state_dir, f"CURRENT.{os.getpid()}.tmp")
    with open(tmp, "w") as fh:
        fh.write(f"{mname} {batch_id} {ck_identity}")
    os.replace(tmp, os.path.join(state_dir, "CURRENT"))
    live = {r.split("/", 1)[1] for r in segment_rels}
    seg_root = os.path.join(state_dir, SEGMENTS_DIR)
    for d in os.listdir(seg_root):
        if d not in live:
            shutil.rmtree(os.path.join(seg_root, d), ignore_errors=True)
    for f in os.listdir(state_dir):
        if f.startswith(MANIFEST_PREFIX) and f != mname and not f.endswith(".tmp"):
            os.remove(os.path.join(state_dir, f))


def _manifest_seq(manifest_name: str | None) -> int:
    return -1 if manifest_name is None else int(manifest_name.removeprefix(MANIFEST_PREFIX))


def compact_edge_log(
    spark: SparkSession, state_dir: str, cfg: PipelineConfig | None = None
) -> int:
    """Offline compaction: roll the live segments up into one base
    segment and commit a one-entry manifest. Returns the number of
    segments compacted away (0 = nothing to do). The rollup is the same
    monoid as the read path, so reads before and after are
    value-identical (pinned by tests/test_logstate.py).

    Concurrency: optimistic — CURRENT is re-read just before the swing
    and a batch id or manifest change aborts with RuntimeError (the
    writer's inline ``compact_every`` path has no such race: it compacts
    inside the same foreachBatch commit)."""
    manifest, bid, ck = _read_log_current(state_dir)
    if manifest is None:
        return 0
    rels = _read_manifest(state_dir, manifest)
    if len(rels) <= 1:
        return 0
    merged = read_edge_log(spark, state_dir, cfg)
    base_rel = os.path.join(SEGMENTS_DIR, f"base-{bid}")
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, base_rel))
    manifest2, bid2, _ = _read_log_current(state_dir)
    if (manifest2, bid2) != (manifest, bid):
        raise RuntimeError(
            f"compact_edge_log: state {state_dir!r} advanced during "
            f"compaction (CURRENT {manifest} b{bid} -> {manifest2} "
            f"b{bid2}); single-writer discipline violated — rerun."
        )
    _commit(state_dir, [base_rel], bid, ck or "", _manifest_seq(manifest) + 1)
    return len(rels)


def stream_edge_increments_log(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    canon: DataFrame,
    cfg: PipelineConfig | None = None,
    max_files_per_trigger: int = 1,
    await_termination: bool = True,
    compact_every: int | None = None,
):
    """Log-structured twin of ``stream_edge_increments``: each
    micro-batch of new transcripts is annotated, rolled up to an edge
    increment (operators/materialize), and APPENDED as a segment —
    per-batch write cost is the increment, never the accumulated table.
    ``compact_every=k`` compacts inline whenever the live-segment count
    would reach k (the LSM flush knob; None = never, compaction is then
    an offline ``compact_edge_log`` call). Canon-map cadence and the
    checkpoint-identity guard are identical to the snapshot twin — see
    its docstring for the two-speed design and the guard rationale."""
    from transner_spark.operators.annotate import explode_triples
    from transner_spark.operators.materialize import (
        materialize_edges,
        merge_edge_increments,
    )

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        ck_identity = _checkpoint_identity(checkpoint_dir)
        manifest, last_applied, state_ck = _read_log_current(state_dir)
        if manifest is not None and state_ck != ck_identity:
            raise RuntimeError(
                f"stream_edge_increments_log: state dir {state_dir!r} "
                f"was built by a different checkpoint (or one with no "
                f"recorded identity; state {state_ck}, this query "
                f"{ck_identity}). Batch ids are not comparable across "
                "checkpoints — reuse the original checkpoint_dir or "
                "start a fresh state_dir."
            )
        if batch_id <= last_applied:
            return  # re-delivered batch: already committed
        sess = batch_df.sparkSession
        inc = materialize_edges(explode_triples(batch_df), canon, cfg)
        seg_rel = os.path.join(SEGMENTS_DIR, f"s{batch_id}")
        inc.write.mode("overwrite").parquet(os.path.join(state_dir, seg_rel))
        rels = (_read_manifest(state_dir, manifest) if manifest else []) + [seg_rel]
        if compact_every is not None and len(rels) >= compact_every:
            merged = merge_edge_increments(
                sess.read.parquet(*(os.path.join(state_dir, r) for r in rels)),
                cfg=cfg,
            )
            base_rel = os.path.join(SEGMENTS_DIR, f"base-{batch_id}")
            merged.write.mode("overwrite").parquet(
                os.path.join(state_dir, base_rel)
            )
            rels = [base_rel]
        _commit(
            state_dir, rels, batch_id, ck_identity, _manifest_seq(manifest) + 1
        )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    q = (
        annotate_turns(stream, cfg)
        .writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
