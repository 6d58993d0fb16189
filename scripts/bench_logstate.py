"""Write-amplification evidence for the log-structured edge state.

Feeds the sf corpus to the two streaming maintenance layouts one
micro-batch at a time and measures what each COMMIT physically writes:

- snapshot layout (``stream_edge_increments``): every batch rewrites the
  whole accumulated table — per-batch bytes grow with the table, total
  written across k batches is ~k/2 x the final table;
- log layout (``stream_edge_increments_log``): every batch appends an
  increment-sized segment — per-batch bytes are O(batch); the total
  (including each compaction's one-off table-sized rewrite, which this
  script measures and reports separately) stays a small constant
  multiple of the final table, versus the snapshot layout's multiple
  that GROWS with the batch count.

Also times the read path the log layout trades for its cheap writes:
merge-on-read over k live segments vs after ``compact_edge_log`` vs the
snapshot table's plain scan — the LSM read-amplification knob, measured.

Results go into a marker-delimited BENCH.md section.
Usage: python scripts/bench_logstate.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- LOG_STATE:BEGIN -->"
END = "<!-- LOG_STATE:END -->"
N_BATCHES = 8


def upsert_section(md_path: str, body: str) -> None:
    section = f"{BEGIN}\n{body}\n{END}"
    text = ""
    if os.path.exists(md_path):
        with open(md_path) as f:
            text = f.read()
    if BEGIN in text and END in text:
        head, rest = text.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
        text = head + section + tail
    else:
        text = text.rstrip("\n") + "\n\n" + section + "\n"
    with open(md_path, "w") as f:
        f.write(text)


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def timed_count(make_df) -> tuple[int, float]:
    """warm + steady (same protocol as bench_bucketed/bench_two_hop)."""
    make_df().count()
    t0 = time.monotonic()
    n = make_df().count()
    return n, time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from bench import build_session
    from transner_spark.operators.annotate import annotate_turns, explode_triples
    from transner_spark.operators.canonicalize import canonicalize
    from transner_spark.operators.linking import link_surfaces, node_surfaces
    from transner_spark.sources.transcripts import (
        ensure_transcripts_parquet,
        sf_name,
    )
    from transner_spark.streaming.incremental import (
        current_edge_state,
        stream_edge_increments,
    )
    from transner_spark.streaming.logstate import (
        compact_edge_log,
        log_edge_segments,
        read_edge_log,
        stream_edge_increments_log,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(f"local[{cpus}]", cpus)
    src = ensure_transcripts_parquet(REPO, sf_dir)
    t = explode_triples(annotate_turns(spark.read.parquet(src))).localCheckpoint()
    canon = canonicalize(link_surfaces(spark, node_surfaces(t))).localCheckpoint()

    work = tempfile.mkdtemp(prefix="transner_logstate_")
    try:
        splits = os.path.join(work, "splits")
        spark.read.parquet(src).repartition(N_BATCHES).write.parquet(splits)
        parts = sorted(glob.glob(os.path.join(splits, "part-*.parquet")))
        assert len(parts) == N_BATCHES

        per_batch: dict[str, list[int]] = {"snapshot": [], "log": []}
        runners = {
            "snapshot": lambda ind, st, cp: stream_edge_increments(
                spark, ind, st, cp, canon, max_files_per_trigger=1
            ),
            "log": lambda ind, st, cp: stream_edge_increments_log(
                spark, ind, st, cp, canon, max_files_per_trigger=1
            ),
        }
        for layout, run in runners.items():
            in_dir = os.path.join(work, layout, "in")
            state = os.path.join(work, layout, "state")
            cp = os.path.join(work, layout, "ck")
            os.makedirs(in_dir)
            for i, p in enumerate(parts):
                shutil.copy(p, os.path.join(in_dir, f"b{i:02d}.parquet"))
                run(in_dir, state, cp)
                if layout == "snapshot":
                    live, _ = current_edge_state(state)
                    per_batch[layout].append(du(live))
                else:
                    segs, bid = log_edge_segments(state)
                    (new_seg,) = [s for s in segs if s.endswith(f"s{bid}")]
                    per_batch[layout].append(du(new_seg))

        snap_state = os.path.join(work, "snapshot", "state")
        log_state = os.path.join(work, "log", "state")
        n_live = len(log_edge_segments(log_state)[0])
        _, r_snap = timed_count(
            lambda: spark.read.parquet(current_edge_state(snap_state)[0])
        )
        n_log, r_log = timed_count(lambda: read_edge_log(spark, log_state))
        compacted = compact_edge_log(spark, log_state)
        # the compaction's base-segment rewrite is real write cost —
        # charge it to the log layout's total (review r4)
        compact_bytes = du(log_edge_segments(log_state)[0][0])
        _, r_compact = timed_count(lambda: read_edge_log(spark, log_state))

        tot = {k: sum(v) for k, v in per_batch.items()}
        tot["log"] += compact_bytes
        final = du(current_edge_state(snap_state)[0])
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)
    mib = lambda b: b / (1024 * 1024)  # noqa: E731
    rows = [
        f"| snapshot (`stream_edge_increments`) | {mib(tot['snapshot']):.1f} | "
        f"{mib(per_batch['snapshot'][0]):.2f} → {mib(per_batch['snapshot'][-1]):.2f} | "
        f"{tot['snapshot'] / final:.1f}x | {r_snap:.2f} |",
        f"| log (`stream_edge_increments_log`, incl. one compaction "
        f"rewrite of {mib(compact_bytes):.2f}) | {mib(tot['log']):.1f} | "
        f"{mib(per_batch['log'][0]):.2f} → {mib(per_batch['log'][-1]):.2f} | "
        f"{tot['log'] / final:.1f}x | {r_log:.2f} ({n_live} segs) / "
        f"{r_compact:.2f} compacted |",
    ]
    body = "\n".join(
        [
            "## Log-structured edge state: write amplification (measured)",
            "",
            f"Corpus {sf_name(sf_dir)} fed as {N_BATCHES} micro-batches to both "
            "streaming maintenance layouts (same canon map, same input "
            "order). 'bytes written' is what each COMMIT physically wrote "
            "(the live version dir / the new segment); final maintained "
            f"table = {mib(final):.1f} MiB, {n_log} edges. Read walls use "
            "the warm+steady protocol.",
            "",
            "| layout | total written (MiB) | per-batch first → last (MiB) "
            "| write amp vs final table | read wall (s) |",
            "| --- | --- | --- | --- | --- |",
            *rows,
            "",
            f"The snapshot layout's per-batch write GROWS with the table "
            f"(O(table) per commit — "
            f"{tot['snapshot'] / max(tot['log'], 1):.1f}x the log layout's "
            f"total here, and unbounded as the corpus accumulates); the log "
            f"layout writes each increment once (O(batch)) and pays for it "
            f"on read until compaction folds {compacted} segments into one "
            f"base. At 10^12-turn scale the maintained KG dwarfs any "
            f"micro-batch, so O(table)-per-commit is not viable — the log "
            f"layout + periodic compaction is the Iceberg/Delta "
            f"merge-on-read pattern, with value-equality to the batch "
            f"rollup pinned by the stream_edges_log_eq gate and "
            f"tests/test_logstate.py.",
        ]
    )
    upsert_section(os.path.join(REPO, "BENCH.md"), body)
    print(
        f"snapshot: {mib(tot['snapshot']):.1f} MiB written, read {r_snap:.2f}s | "
        f"log: {mib(tot['log']):.1f} MiB written, read {r_log:.2f}s "
        f"({n_live} segs) / {r_compact:.2f}s compacted"
    )


if __name__ == "__main__":
    main()
