"""Graph-analytics operators over the materialized edge table — the
consumption side of the KG the north rule builds (BASELINE.json:
"materialization of (subj, pred, obj) edge tables"): once edges exist, a
user immediately asks for degrees, centrality, and neighborhoods. All
three are expressed as DataFrame plans (no RDDs, no driver-side row
loops) and each has an unrolled DuckDB oracle in the gate.

Scale shapes (100 TB / 10^12-turn corpus → edge table is post-aggregate,
typically 10^2-10^4× smaller than the triple stream, but still far
beyond one executor):

- ``graph_degrees``: one union projection + one groupBy — a single
  shuffle over node ids; map-side partial aggregation bounds hot-node
  reducer load exactly like the edge materialize's salted agg.
- ``graph_pagerank``: classic damped PageRank with uniform dangling-mass
  redistribution, FIXED iteration count (deterministic, and the same
  unrollable-iteration posture as ``kmeans_refine``). Per iteration: one
  shuffle join (ranks → link source) + one groupBy (contributions →
  target) + a broadcast of the two scalar aggregates (node count,
  dangling mass) via ``crossJoin(broadcast(...))`` — no driver-side
  ``collect`` anywhere; ``localCheckpoint`` truncates the iterative
  lineage each round (same barrier pattern as
  operators/canonicalize.connected_components).
- ``graph_two_hop``: edge self-join on the middle node. Hub middles are
  THE skew risk at scale: AQE skew-join splitting (on in the session
  factory) handles moderate hubs, and ``max_mid_degree`` drops
  super-node middles entirely — the standard production guard (a
  celebrity node's 2-hop fan-out is quadratic in its degree and almost
  never wanted). The guard is observable, not silent: a run that needs
  the audit trail calls ``two_hop_dropped_mids(edges, max_mid_degree)``
  — the exact complement of the filter the join applies — to get each
  dropped hub and its degree (bench_two_hop reports these counts in
  BENCH.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAGERANK_ITERATIONS = 3
PAGERANK_DAMPING = 0.85
NEIGHBORS_TOPK_K = 5


def graph_degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree table: out/in edge counts and out/in weight sums.

    One union projection + one aggregation — the node id is the only
    shuffle key, and partial (map-side) aggregation makes hot nodes
    cheap: each input partition contributes at most one partial row per
    node.
    """
    out_side = edges.select(
        F.col("subj_id").alias("node_id"),
        F.lit(1).alias("is_out"),
        F.col("weight"),
    )
    in_side = edges.select(
        F.col("obj_id").alias("node_id"),
        F.lit(0).alias("is_out"),
        F.col("weight"),
    )
    sides = out_side.unionByName(in_side)
    flag = F.col("is_out") == 1
    return sides.groupBy("node_id").agg(
        F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias("out_deg"),
        F.sum(F.when(~flag, 1).otherwise(0)).cast("long").alias("in_deg"),
        F.sum(F.when(flag, F.col("weight")).otherwise(0)).cast("long").alias("out_weight"),
        F.sum(F.when(~flag, F.col("weight")).otherwise(0)).cast("long").alias("in_weight"),
    )


def _distinct_links(edges: DataFrame) -> DataFrame:
    """Classic-PageRank link set: distinct (src, dst) pairs, predicates
    and multiplicities collapsed."""
    return edges.select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    ).distinct()


def graph_pagerank(
    edges: DataFrame,
    n_iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """Fixed-iteration damped PageRank over the distinct link graph.

    Semantics (matched exactly by the unrolled DuckDB oracle):
      pr_0(v)   = 1 / N
      pr_t+1(v) = (1-d)/N + d * (Σ_{u→v} pr_t(u)/outdeg(u) + dangling_t/N)
    where dangling_t = Σ pr_t(u) over nodes with outdeg(u) = 0 — the
    standard uniform redistribution, so Σ pr stays 1 every iteration.

    Deterministic: fixed iteration count, and the published ``pr`` is
    rounded so float summation order (which varies with partitioning)
    cannot leak into gate hashes — same posture as the cosine scores in
    dedup/ANN. The rounding is DOUBLE (snap to 9 decimals, then publish
    at 6; the oracle does the identical two-step): cross-engine sums
    agree to ~1e-15, so both engines land on the same 9-dec grid point
    first, and a true value sitting within float-drift of a 6-dec
    rounding boundary can no longer flip the published digit between
    Spark and DuckDB (ADVICE r3; the semantic anchor is the
    tolerance-based numpy differential in tests/test_graph.py).

    Returns (node_id, pr).
    """
    links = _distinct_links(edges).localCheckpoint(eager=True)
    nodes = (
        links.select(F.col("src").alias("node_id"))
        .union(links.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # scalar N as a 1-row dim — broadcast-crossJoined, never collected
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    outdeg = links.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("outdeg"))

    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node_id", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(n_iterations):
        contrib = (
            links.join(ranks.withColumnRenamed("node_id", "src"), "src")
            .join(outdeg, "src")
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("contrib"))
        )
        dangling = (
            ranks.join(outdeg, ranks.node_id == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dangling"))
        )
        ranks = (
            nodes.join(contrib, "node_id", "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(n_df))
            .select(
                "node_id",
                (
                    (1.0 - damping) / F.col("n")
                    + damping
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dangling") / F.col("n")
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
    return ranks.select(
        "node_id", F.round(F.round("pr", 9), 6).alias("pr")
    )


def _mid_degrees(links: DataFrame) -> DataFrame:
    """(mid, deg): total degree of every node over the distinct link
    set — the single definition both the two-hop hub guard and its
    observability complement (two_hop_dropped_mids) filter on."""
    return (
        links.select(F.col("src").alias("mid"))
        .union(links.select("dst"))
        .groupBy("mid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def two_hop_dropped_mids(edges: DataFrame, max_mid_degree: int) -> DataFrame:
    """The middle nodes ``graph_two_hop(edges, max_mid_degree)`` drops,
    with their degrees — the audit-trail complement of the hub guard
    (same degree definition, opposite predicate), so a production run
    can log exactly which hubs were excluded and how big they were.
    Only nodes that can actually OCCUPY the middle position count: a
    middle needs an incoming link (dst of hop 1) AND an outgoing link
    (src of hop 2), so over-bound nodes seen in just one role (e.g.
    dst-only ``tool:*`` objects) contribute zero paths unguarded and are
    excluded here — two cheap semi-joins keep the complement exact."""
    links = _distinct_links(edges)
    over = _mid_degrees(links).where(F.col("deg") > max_mid_degree)
    as_dst = links.select(F.col("dst").alias("mid"))
    as_src = links.select(F.col("src").alias("mid"))
    return over.join(as_dst, "mid", "left_semi").join(
        as_src, "mid", "left_semi"
    )


def graph_two_hop(
    edges: DataFrame, max_mid_degree: int | None = None
) -> DataFrame:
    """2-hop reachability with path multiplicity: for every pair
    (src, dst) connected by src→mid→dst over the distinct link graph,
    the number of distinct middles. Self-pairs (src = dst, i.e. 2-cycles)
    are kept — they are real paths and the SQL oracle keeps them too.

    ``max_mid_degree`` drops middle nodes whose total degree exceeds the
    bound BEFORE the join — the production hub guard (fan-out through a
    hub is outdeg×indeg rows). None = no filter (gate default at test
    scale).
    """
    links = _distinct_links(edges)
    if max_mid_degree is not None:
        deg = (
            _mid_degrees(links)
            .where(F.col("deg") <= max_mid_degree)
            .select("mid")
        )
        links_in = links.join(
            deg.withColumnRenamed("mid", "dst"), "dst"
        ).select("src", "dst")
        links_out = links.join(
            deg.withColumnRenamed("mid", "src"), "src"
        ).select("src", "dst")
    else:
        links_in, links_out = links, links
    a = links_in.select(F.col("src"), F.col("dst").alias("mid"))
    b = links_out.select(F.col("src").alias("mid"), F.col("dst"))
    return (
        a.join(b, "mid")
        .groupBy("src", "dst")
        # links are distinct pairs, so each mid contributes exactly one
        # (src, mid, dst) row — a plain count IS the distinct-mid count,
        # without a distinct-aggregate's extra shuffle state
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .select(
            F.col("src").alias("src_id"), F.col("dst").alias("dst_id"), "n_paths"
        )
    )


def graph_neighbors_topk(edges: DataFrame, k: int = NEIGHBORS_TOPK_K) -> DataFrame:
    """Per-node top-k outgoing neighbors by edge weight — the KG-serving
    primitive ("what is X most connected to?"). A rank window PARTITIONED
    BY the subject id: at cluster scale each node's frame is its own
    out-degree (bounded, never a global sort), so the plan is one shuffle
    on subj_id + a per-partition sort — the unpartitioned-window
    anti-pattern this repo bans does not appear. Deterministic total
    tiebreak (weight desc, obj_id, pred) so the gate hash is stable."""
    w = F.row_number().over(
        Window.partitionBy("subj_id").orderBy(
            F.col("weight").desc(), F.col("obj_id"), F.col("pred")
        )
    )
    return (
        edges.select("subj_id", "pred", "obj_id", "weight")
        .withColumn("rank", w)
        .where(F.col("rank") <= k)
        .select(
            "subj_id",
            "pred",
            "obj_id",
            F.col("weight").cast("long").alias("weight"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
