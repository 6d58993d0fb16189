"""Walk-corpus / provenance scale evidence on the skewed sf0.1 corpus.

Three measurements over the live-derived sf0.1 edge table, recorded
into a marker-delimited BENCH.md section (the bench_graph_analytics
pattern):

1. ``random_walks`` at the gate shape (top-degree seeds) AND at the
   full-DeepWalk shape (EVERY node a seed) — the claim under test is
   O(walkers) per step via the rank-indexed adjacency: walking from
   all V nodes must cost proportional to V, not blow up on the hot
   entity's degree.
2. ``walk_skipgrams`` over the full-corpus walks — constant per-walk
   fan-out, so the pair table scales with walk count.
3. ``edge_provenance`` — the salted two-phase top-k over the skewed
   edge table (the generator's hot pair is the stress case).

Usage: python scripts/bench_walks.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- WALKS_PROVENANCE:BEGIN -->"
END = "<!-- WALKS_PROVENANCE:END -->"


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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import pyspark.sql.functions as F

    from bench import build_session
    from transner_spark.operators.annotate import annotate_turns, explode_triples
    from transner_spark.operators.canonicalize import canonicalize
    from transner_spark.operators.graph import _undirected, _undirected_degrees
    from transner_spark.operators.linking import link_surfaces, node_surfaces
    from transner_spark.operators.materialize import edge_provenance, materialize_edges
    from transner_spark.operators.walks import random_walks, walk_skipgrams
    from transner_spark.sources.transcripts import ensure_transcripts_parquet

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(f"local[{cpus}]", cpus)
    t = explode_triples(
        annotate_turns(
            spark.read.parquet(ensure_transcripts_parquet(REPO, sf_dir))
        )
    ).localCheckpoint()
    canon = canonicalize(link_surfaces(spark, node_surfaces(t)))
    edges = materialize_edges(t, canon).localCheckpoint()
    n_edges = edges.count()
    und = _undirected(edges)
    deg = _undirected_degrees(und).localCheckpoint()
    n_nodes = deg.count()
    max_deg = deg.agg(F.max("deg")).first()[0]
    all_nodes = deg.select(F.col("node").alias("node_id"))

    def timed(build):
        build().count()  # warm: codegen + broadcast
        t0 = time.monotonic()
        n = build().count()
        return n, time.monotonic() - t0

    gate_rows, gate_wall = timed(lambda: random_walks(edges))
    full_rows, full_wall = timed(
        lambda: random_walks(edges, seeds=all_nodes)
    )
    sg_rows, sg_wall = timed(
        lambda: walk_skipgrams(edges, seeds=all_nodes)
    )
    pv_rows, pv_wall = timed(lambda: edge_provenance(t, canon))

    body = "\n".join(
        [
            "## Walk corpus + provenance (skewed corpus, measured)",
            "",
            f"Live-derived sf0.1 KG: {n_edges} edges, {n_nodes} nodes,"
            f" max undirected degree {max_deg} (the hot entity).",
            "",
            "| op | walkers/input | rows | wall (s) |",
            "| --- | --- | --- | --- |",
            f"| random_walks (gate shape: 4 top-degree seeds) | 12 walkers"
            f" | {gate_rows} | {gate_wall:.2f} |",
            f"| random_walks (full DeepWalk: every node a seed) |"
            f" {3 * n_nodes} walkers | {full_rows} | {full_wall:.2f} |",
            f"| walk_skipgrams (full corpus) | {3 * n_nodes} walks"
            f" | {sg_rows} | {sg_wall:.2f} |",
            f"| edge_provenance (k=3, salted two-phase) | {n_edges} edges"
            f" | {pv_rows} | {pv_wall:.2f} |",
            "",
            "The full-corpus walk visits every node including the"
            f" degree-{max_deg} hub; per-step cost is one broadcast degree"
            " join + one composite-key (node, rank) equi-join, so the"
            " fleet scales with walker count — no per-neighbor fan-out,"
            " no wide adjacency arrays (PLANS.md graph_walks row)."
            " Provenance ranks citations inside (edge, salt) frames"
            " first, so the hot edge never materializes an edge-sized"
            " window frame.",
        ]
    )
    upsert_section(os.path.join(REPO, "BENCH.md"), body)
    print(body)
    spark.stop()


if __name__ == "__main__":
    main()
