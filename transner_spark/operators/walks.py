"""Deterministic random-walk corpus generation over the entity graph —
the DeepWalk / node2vec input step for KG-embedding training: a corpus
of fixed-length walks whose node sequences feed a skip-gram model, the
positive-context complement of operators/negatives.py's corrupted
triples.

Like the negative sampler, every "random" choice is HASH-derived (the
engine-portable h60, functions/hashing.py): the next hop of walk w at
step t is neighbor ``h60('rw:' || w || ':' || t || ':' || seed) % deg``
of the current node's SORTED neighbor list. The walk corpus is a pure
function of the edge table — bit-identical across re-runs and across
engines, so the gate value-checks it against a DuckDB re-derivation and
a training run is exactly reproducible.

The crux at scale is the neighbor CHOICE. The naive shapes both die at
100 TB:

- fan-out join (walker x all neighbors, then argmin): every walker at a
  hub pays the hub's full degree per step — O(E) per step and maximally
  skewed on exactly the hottest key;
- per-node neighbor ARRAYS (collect_list + element_at): O(1) per walker,
  but the hub's array is one row of width = its degree — an unbounded
  row that breaks long before the join does.

Instead the adjacency is RANK-INDEXED: one row per (node, rn, neighbor)
with rn a per-node dense 0..deg-1 rank (row_number over a window
PARTITIONED by node — per-node frames, the repo's standard partitioned-
window posture). Each step is then two equi-joins: walker -> degree
(dim-sized in entities, broadcastable) to compute ``idx = h % deg``, and
walker -> adjacency on the COMPOSITE key (node, idx) — exactly one
matching row per walker, so a hub's neighbors are spread across many
distinct join keys and the hot entity never concentrates a partition.
Per-step cost is O(walkers), never O(E), with no wide rows anywhere.

Cited parity: the reference repo has no graph-walk counterpart (its
scope ends at NER); this extends the training-data surface on top of
the materialized KG (SURVEY §2 training-data ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transner_spark.functions.hashing import h60
from transner_spark.operators.graph import (
    _adjacency,
    _undirected,
    _undirected_degrees,
    khop_seeds,
)

RW_WALKS = 3
RW_STEPS = 5
RW_SEEDS = 4


def _ranked_adjacency(und: DataFrame) -> DataFrame:
    """(node, rn, nb): the undirected adjacency with a per-node dense
    0..deg-1 rank over the SORTED neighbor ids — the hash-addressable
    index the walk resolves its next hop through. The rank window is
    PARTITIONED by node (per-node frames); neighbor ids are unique per
    node (_adjacency expands a distinct ordered pair set), so the rank
    is a total order and the index is deterministic."""
    w = Window.partitionBy("node").orderBy("nb")
    return _adjacency(und).withColumn(
        "rn", (F.row_number().over(w) - 1).cast("long")
    )


def random_walks(
    edges: DataFrame,
    seeds: DataFrame | None = None,
    n_walks: int = RW_WALKS,
    n_steps: int = RW_STEPS,
    n_seeds: int = RW_SEEDS,
) -> DataFrame:
    """(seed_id, walk_no, step, node_id): ``n_walks`` deterministic
    uniform random walks of ``n_steps`` steps from each seed node over
    the undirected entity graph — the DeepWalk corpus. Step 0 is the
    seed itself; step t resolves neighbor
    ``h60('rw:' || walk || ':' || t || ':' || seed) % deg`` of the
    current node's sorted neighbor list (the walk's own RNG stream — the
    two digit-only fields come FIRST so an entity id containing the
    delimiters can't make two distinct walks share a stream; two walks
    never share a draw, and revisiting a node at a different step
    re-draws). A walker whose current node has no edges stops (its walk
    simply ends); seeds drawn from the degree table always have deg >= 1,
    so the default corpus has full-length walks.

    ``seeds=None`` takes the top-``n_seeds`` degree seeds via
    :func:`khop_seeds` over the SAME undirected link set the walk uses
    (one distinct-shuffle, the graph_khop posture). For a full DeepWalk
    corpus pass ``seeds=`` all nodes: per-step cost stays O(walkers) —
    one broadcast degree join + one composite-key equi-join against the
    rank-indexed adjacency (see module docstring for why this is the
    only hub-safe shape)."""
    if n_walks < 1 or n_steps < 0:
        raise ValueError(
            f"need n_walks >= 1 and n_steps >= 0, got {n_walks}/{n_steps}"
        )
    und = _undirected(edges).localCheckpoint()
    if seeds is None:
        seeds = khop_seeds(edges, n_seeds, und=und)
    adjr = _ranked_adjacency(und).localCheckpoint()
    deg = _undirected_degrees(und).withColumnRenamed("node", "node_id")
    # distinct() on the seed projection: a caller-supplied seeds frame
    # with duplicate rows would otherwise emit byte-identical duplicated
    # walks, which walk_skipgrams then silently double-counts into
    # inflated n_pairs. Seeds are a tiny frame; the dedup is one cheap
    # shuffle against a corpus-sized mistake.
    walkers = (
        seeds.select("node_id")
        .distinct()
        .select(
            F.col("node_id").alias("seed_id"),
            F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias(
                "walk_no"
            ),
            F.col("node_id"),
        )
        .withColumn("walk_no", F.col("walk_no").cast("int"))
        .localCheckpoint()
    )
    out = walkers.withColumn("step", F.lit(0).cast("int"))
    for t in range(1, n_steps + 1):
        draw = h60(
            F.concat(
                F.lit("rw:"),
                F.col("walk_no").cast("string"),
                F.lit(f":{t}:"),
                F.col("seed_id"),
            )
        )
        walkers = (
            walkers.join(F.broadcast(deg), "node_id")
            .withColumn("idx", F.pmod(draw, F.col("deg")))
            .join(
                adjr,
                (F.col("node") == F.col("node_id"))
                & (F.col("rn") == F.col("idx")),
            )
            .select("seed_id", "walk_no", F.col("nb").alias("node_id"))
            .localCheckpoint()  # truncate iterative lineage
        )
        out = out.unionByName(
            walkers.withColumn("step", F.lit(t).cast("int"))
        )
    return out.select("seed_id", "walk_no", "step", "node_id")


SKIPGRAM_WINDOW = 2


def walk_skipgrams(
    edges: DataFrame,
    seeds: DataFrame | None = None,
    window: int = SKIPGRAM_WINDOW,
    n_walks: int = RW_WALKS,
    n_steps: int = RW_STEPS,
    n_seeds: int = RW_SEEDS,
) -> DataFrame:
    """(center_id, context_id, n_pairs): skip-gram co-occurrence counts
    over the walk corpus — the final data-prep step of the DeepWalk
    recipe (walks -> windowed (center, context) pairs -> SGNS training,
    with :mod:`operators.negatives` supplying the negatives). Directed
    pairs: every ordered (center, context) with 0 < |Δstep| <= window
    inside one walk counts once; the aggregate is what the embedding
    trainer consumes as positive-pair frequencies.

    Shape: the walk frame self-joins on its (seed, walk) key with the
    step-distance predicate — per-walk fan-out is the constant
    (n_steps+1)·2·window, so cost scales with the NUMBER of walks,
    never quadratically in graph size — then one map-side-combinable
    count aggregate on the pair. The walk corpus itself is the
    rank-indexed O(walkers)-per-step construction of
    :func:`random_walks`; everything downstream of it is exact-integer,
    so the gate hash is engine-stable with no float snap needed."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = random_walks(edges, seeds, n_walks, n_steps, n_seeds)
    a = w.select(
        "seed_id",
        "walk_no",
        F.col("step").alias("step_a"),
        F.col("node_id").alias("center_id"),
    )
    b = w.select(
        "seed_id",
        "walk_no",
        F.col("step").alias("step_b"),
        F.col("node_id").alias("context_id"),
    )
    return (
        a.join(b, ["seed_id", "walk_no"])
        .where(
            (F.col("step_a") != F.col("step_b"))
            & (F.abs(F.col("step_a") - F.col("step_b")) <= window)
        )
        .groupBy("center_id", "context_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
