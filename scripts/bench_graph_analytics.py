"""Triangle/similarity scale evidence on the skewed corpus.

Two measurements over the sf0.1 edge table (generator-default skew: one
hot entity pair in ~20% of conversations), recorded into a
marker-delimited BENCH.md section the same way bench_two_hop does:

1. ``graph_triangles`` — the degree-ordered orientation claim made
   concrete: the max RAW undirected degree (the hot entity) vs the max
   ORIENTED out-degree actually paid by the wedge join. The gap IS the
   skew mitigation — the hub's edges orient toward it, so it never
   pivots.
2. ``graph_similarity`` with and without ``max_neighbor_degree`` — the
   shared-neighbor self-join is quadratic in the neighbor's degree,
   exactly two-hop's hub problem; the guard drops super-node witnesses
   (audited via ``similarity_dropped_hubs``).

Usage: python scripts/bench_graph_analytics.py [sf_dir] [max_neighbor_degree]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- GRAPH_ANALYTICS:BEGIN -->"
END = "<!-- GRAPH_ANALYTICS:END -->"


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
    bound = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import pyspark.sql.functions as F

    from bench import build_session
    from transner_spark.operators.annotate import annotate_turns, explode_triples
    from transner_spark.operators.canonicalize import canonicalize
    from transner_spark.operators.graph import (
        _oriented,
        _undirected,
        _undirected_degrees,
        graph_similarity,
        graph_triangles,
        similarity_dropped_hubs,
    )
    from transner_spark.operators.linking import link_surfaces, node_surfaces
    from transner_spark.operators.materialize import materialize_edges
    from transner_spark.sources.transcripts import ensure_transcripts_parquet, sf_name

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

    # -- orientation bound: raw max degree vs oriented max out-degree --
    und = _undirected(edges).localCheckpoint()
    deg = _undirected_degrees(und)
    max_deg = deg.agg(F.max("deg")).first()[0]
    # the OPERATOR's own orientation (shared helper), not a re-derivation
    o = _oriented(und, deg)
    max_out = o.groupBy("src").count().agg(F.max("count")).first()[0]

    def timed(build):
        build().count()  # warm: codegen + broadcast
        t0 = time.monotonic()
        n = build().count()
        return n, time.monotonic() - t0

    tri_rows, tri_wall = timed(lambda: graph_triangles(edges))
    sim_rows_off, sim_wall_off = timed(lambda: graph_similarity(edges))
    sim_rows_on, sim_wall_on = timed(
        lambda: graph_similarity(edges, max_neighbor_degree=bound)
    )
    drops = (
        similarity_dropped_hubs(edges, bound)
        .orderBy("nb_degree", ascending=False)
        .collect()
    )
    top = ", ".join(f"{r['nb']} (deg {r['nb_degree']})" for r in drops[:5])

    body = "\n".join(
        [
            "## Graph analytics: triangles + shared-neighbor similarity (skewed corpus, measured)",
            "",
            f"Edge table: {sf_name(sf_dir)}, {n_edges} edges, same skew fixture "
            "as the two-hop section. Warm + steady timing protocol.",
            "",
            f"**Orientation bound (`graph_triangles`)**: max raw undirected "
            f"degree {max_deg} vs max ORIENTED out-degree {max_out} — the "
            "wedge join's quadratic step fans out on the oriented degree, so "
            f"the hot entity's {max_deg}-way star never pivots; the worst "
            f"wedge cost is {max_out}², not {max_deg}².",
            "",
            "| op | output rows | wall (s) | hubs dropped |",
            "| --- | --- | --- | --- |",
            f"| graph_triangles | {tri_rows} | {tri_wall:.2f} | n/a (orientation) |",
            f"| graph_similarity (unguarded) | {sim_rows_off} | {sim_wall_off:.2f} | 0 |",
            f"| graph_similarity (max_neighbor_degree={bound}) | {sim_rows_on} | {sim_wall_on:.2f} | {len(drops)} |",
            "",
            f"Dropped shared-neighbor hubs (top by degree): {top or 'none'}.",
            "",
            f"The guard removes {sim_rows_off - sim_rows_on} of {sim_rows_off} "
            f"pair rows ({100 * (sim_rows_off - sim_rows_on) / max(1, sim_rows_off):.1f}%) — "
            "the shared-neighbor join's blow-up concentrates in the same hub "
            "nodes two-hop guards against; any witness's contribution is "
            f"bounded to ≤ {bound}² pairs.",
        ]
    )
    upsert_section(os.path.join(REPO, "BENCH.md"), body)
    print(
        f"triangles: {tri_rows} rows / {tri_wall:.2f}s (max_deg {max_deg} -> "
        f"oriented {max_out}); similarity off: {sim_rows_off} rows / "
        f"{sim_wall_off:.2f}s; guard({bound}): {sim_rows_on} rows / "
        f"{sim_wall_on:.2f}s; dropped {len(drops)} hubs"
    )
    spark.stop()


if __name__ == "__main__":
    main()
