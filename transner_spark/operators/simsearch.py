"""Approximate-nearest-neighbor search over the ``embeddings`` table
(vec_id, embedding: array<float>, label).

Two paths:

- ``ann_bruteforce``: exact cosine top-k — broadcast the (small) query
  set against the full corpus; the corpus side never shuffles, ranking
  is a per-query-partition window. This is the correctness baseline.
- ``ann_lsh``: random-hyperplane LSH — L tables × k hyperplanes; a
  vector's k sign bits per table form its bucket id; candidates are
  bucket-mates in ≥1 table; survivors are ranked by true cosine. The
  scale path: bucketing is a narrow map over the scan (the hyperplane
  matrix is a 16-row broadcast), the only shuffle is the bucket
  equi-join, and recall/cost is tuned by (L, k) — at 100 TB you raise k
  to keep bucket occupancy bounded and L for recall.

Hyperplane weights are derived from the portable h60 hash
(w(p,d) = (h60('plane:p,d') mod 2001 − 1000)/1000), so the DuckDB
oracle regenerates the exact same planes with no side-channel files,
and every dot product is summed in index order → bit-identical doubles
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transner_spark.functions.hashing import h60
from transner_spark.operators.dedup import _dot

N_TABLES = 4
PLANES_PER_TABLE = 4
N_PLANES = N_TABLES * PLANES_PER_TABLE
DIM = 64
TOP_K = 5
N_QUERIES = 8  # query set = vec_id < N_QUERIES; corpus = the rest
IVF_CELLS = 8
IVF_NPROBE = 2
KMEANS_SUM_BLOCK = 4096  # vec_id block width of the deterministic mean


def plane_weight(p, d) -> F.Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1]."""
    key = F.concat(
        F.lit("plane:"), p.cast("string"), F.lit(","), d.cast("string")
    )
    return ((h60(key) % 2001) - 1000) / F.lit(1000.0)


def hyperplanes(spark: SparkSession, n_planes: int = N_PLANES, dim: int = DIM) -> DataFrame:
    """16-row dimension table (plane_id, weights: array<double>)."""
    return spark.range(n_planes).select(
        F.col("id").alias("plane_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: plane_weight(F.col("id"), d),
        ).alias("weights"),
    )


def _with_norm(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id",
        F.col("embedding").alias("emb"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )


def ann_bruteforce(
    embeddings: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """Exact cosine top-k: broadcast query set × corpus, window rank."""
    e = _with_norm(embeddings)
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = e.where(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def ivf_centroids(
    embeddings: DataFrame, n_cells: int = IVF_CELLS, n_queries: int = N_QUERIES
) -> DataFrame:
    """Deterministic coarse quantizer: the ``n_cells`` corpus vectors
    with the smallest portable hash act as cell centroids (a seeded
    k-means would refine them; hash seeding keeps the oracle
    re-derivable and the assignment logic — the scale-relevant part —
    identical). Returns (cell_id, c_emb, c_nrm); dim-sized, broadcast
    by callers."""
    e = _with_norm(embeddings).where(F.col("vec_id") >= n_queries)
    h = h60(F.concat(F.lit("ivf:"), F.col("vec_id").cast("string")))
    # orderBy().limit() compiles to distributed TakeOrdered (per-partition
    # top-K + merge) — no global sort. cell_id enumeration then happens
    # on the n_cells-row dim side via array_sort + posexplode instead of
    # a no-partition window (which would warn and, on a non-dim frame,
    # single-thread; VERDICT r2 item 5).
    top = e.withColumn("_h", h).orderBy("_h", "vec_id").limit(n_cells)
    packed = top.agg(
        F.array_sort(
            F.collect_list(F.struct("_h", "vec_id", "emb", "nrm"))
        ).alias("cells")
    )
    return packed.select(
        F.posexplode("cells").alias("cell_id", "c")
    ).select(
        "cell_id",
        F.col("c.emb").alias("c_emb"),
        F.col("c.nrm").alias("c_nrm"),
    )


def _nearest_cells(vectors: DataFrame, cents: DataFrame, n: int) -> DataFrame:
    """Top-n cells per vector by centroid cosine (ties → lower cell_id)."""
    cos = _dot(F.col("emb"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm"))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("c_cos").desc(), F.col("cell_id").asc()
    )
    return (
        vectors.crossJoin(F.broadcast(cents))
        .withColumn("c_cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .select("vec_id", "cell_id")
    )


def ann_ivf(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest
    coarse cell (one narrow pass against a broadcast centroid table);
    each query probes its ``nprobe`` nearest cells and ranks the cell
    members by exact cosine. The inverted-file shape is the second
    standard scale path next to ann_lsh: the only shuffle is the
    (query-cell × cell-members) equi-join on cell_id, candidate count
    is bounded by cell occupancy × nprobe, and recall/cost is tuned by
    (n_cells, nprobe). At 100 TB the assignment pass is scan-bound and
    the cells become the partition layout of a vector table."""
    cents = ivf_centroids(embeddings, n_cells, n_queries)
    e = _with_norm(embeddings)
    corpus = e.where(F.col("vec_id") >= n_queries)
    queries = e.where(F.col("vec_id") < n_queries)

    assign = _nearest_cells(corpus, cents, 1)
    probe = _nearest_cells(queries, cents, nprobe).select(
        F.col("vec_id").alias("query_id"), "cell_id"
    )
    cand = (
        probe.join(assign, "cell_id")
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def ann_recall(
    spark: SparkSession,
    embeddings: DataFrame,
    method: str = "lsh",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    dim: int = DIM,
) -> DataFrame:
    """Recall@k of an approximate index against the exact top-k — the
    evaluation loop an ANN deployment runs before trusting (L, k) /
    (n_cells, nprobe) settings. Per query: exact result size, approx
    hits inside the exact set, and recall. Both sides are the existing
    operators; the join is per-(query, neighbor) — dim-sized, since the
    query set is bounded."""
    if method == "lsh":
        approx = ann_lsh(spark, embeddings, k=k, n_queries=n_queries, dim=dim)
    elif method == "ivf":
        approx = ann_ivf(spark, embeddings, k=k, n_queries=n_queries)
    else:
        raise ValueError(f"unknown ANN method: {method}")
    exact = ann_bruteforce(embeddings, k=k, n_queries=n_queries)

    a = approx.select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    joined = exact.select("query_id", "neighbor_id").join(
        a, ["query_id", "neighbor_id"], "left"
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.count("_hit").cast("long").alias("n_hits"),
        )
        .withColumn(
            "recall", F.round(F.col("n_hits") / F.col("n_exact"), 6)
        )
    )


def kmeans_refine(
    spark: SparkSession,
    embeddings: DataFrame,
    n_cells: int = IVF_CELLS,
    iters: int = 2,
    n_queries: int = N_QUERIES,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's refinement of the hash-seeded IVF centroids: per round,
    assign every corpus vector to its max-cosine cell (one narrow pass
    against the broadcast centroid table), then recompute each cell's
    centroid as the element-wise mean (posexplode → per-(cell, dim)
    avg → re-assemble). Driver-looped — Catalyst cannot express the
    loop — with a localCheckpoint per round to cut lineage, exactly the
    connected-components iteration pattern. Cells that lose all members
    keep their previous centroid.

    Returns (assignments(vec_id, cell_id), centroids(cell_id, c_emb,
    c_nrm)). This is an ITERATIVE algorithm: per the driver contract it
    gets a rows-only gate (no SQL oracle); quality is pinned by
    tests/test_trainops.py (the Lloyd objective must not decrease and a
    refined index must keep exact recall when probing all cells)."""
    corpus = _with_norm(embeddings).where(F.col("vec_id") >= n_queries)
    cents = ivf_centroids(embeddings, n_cells, n_queries).localCheckpoint()
    assign = None
    for _ in range(iters):
        assign = _nearest_cells(corpus, cents, 1)
        # Deterministic hierarchical mean (order-pinned, engine-portable):
        # per (cell, dim), sum vec_id-ordered blocks of ≤KMEANS_SUM_BLOCK
        # values, then sum the block sums in block order. A commutative
        # avg() would leave the double summation order to each engine's
        # aggregation internals — ulp drift that could flip a near-tie
        # assignment between Spark and the DuckDB oracle. Block arrays
        # stay bounded, so this scales (two shuffles per round instead
        # of one; integer counts stay commutative-exact).
        dims = (
            corpus.join(assign, "vec_id")
            .select("cell_id", "vec_id", F.posexplode("emb").alias("pos", "v"))
            .withColumn(
                "blk", F.floor(F.col("vec_id") / KMEANS_SUM_BLOCK).cast("long")
            )
            .groupBy("cell_id", "pos", "blk")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("vec_id", "v"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["v"].cast("double"),
                ).alias("bsum"),
                F.count(F.lit(1)).alias("bcnt"),
            )
            .groupBy("cell_id", "pos")
            .agg(
                (
                    F.aggregate(
                        F.array_sort(F.collect_list(F.struct("blk", "bsum"))),
                        F.lit(0.0),
                        lambda acc, s: acc + s["bsum"],
                    )
                    / F.sum("bcnt")
                ).alias("m")
            )
        )
        new_emb = (
            dims.groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c_emb")
            )
        )
        # empty cells keep their previous centroid
        prev = cents.select("cell_id", F.col("c_emb").alias("prev_emb"))
        merged = prev.join(new_emb, "cell_id", "left").select(
            "cell_id",
            F.coalesce(F.col("c_emb"), F.col("prev_emb")).alias("c_emb"),
        )
        cents = merged.withColumn(
            "c_nrm", F.sqrt(_dot(F.col("c_emb"), F.col("c_emb")))
        ).localCheckpoint()
    return assign, cents


def lsh_buckets(
    spark: SparkSession, embeddings: DataFrame, dim: int = DIM
) -> DataFrame:
    """(vec_id, table_id, bucket): k sign bits per table, planes ordered
    by plane_id (plane p belongs to table p div k). Plane dimensionality
    comes from config (``dim``) with an in-plan guard: a mismatch would
    otherwise NULL out every zip_with dot product and silently empty the
    join — fail loud instead, without the driver-job ``.first()`` probe
    this used to run per call (VERDICT r2 item 8)."""
    planes = hyperplanes(spark, dim=dim)
    guarded = _with_norm(embeddings).where(
        F.when(
            F.size("emb") != dim,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"lsh_buckets: embedding dim mismatch (planes dim="
                        f"{dim}, vector dim="
                    ),
                    F.size("emb").cast("string"),
                    F.lit(") — pass dim= matching the data"),
                )
            ),
        ).otherwise(F.lit(True))
    )
    bit = (_dot(F.col("emb"), F.col("weights")) >= 0).cast("long")
    scored = (
        guarded
        .crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            (F.col("plane_id") / PLANES_PER_TABLE).cast("long").alias("table_id"),
            "plane_id",
            bit.alias("bit"),
        )
    )
    bits_sorted = F.array_sort(F.collect_list(F.struct("plane_id", "bit")))
    return (
        scored.groupBy("vec_id", "table_id")
        .agg(bits_sorted.alias("bits"))
        .select(
            "vec_id",
            "table_id",
            F.aggregate(
                F.col("bits"),
                F.lit(0).cast("long"),
                lambda acc, s: acc * 2 + s["bit"],
            ).alias("bucket"),
        )
    )


def ann_lsh(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    dim: int = DIM,
) -> DataFrame:
    """LSH-bucketed ANN: candidates share a bucket in ≥1 table; rank
    survivors by exact cosine. Recall < 1 by construction — the oracle
    replicates the same (L, k) configuration exactly."""
    # persist: the bucket job (broadcast plane join + groupBy) would
    # otherwise run once per side of the candidate join
    buckets = lsh_buckets(spark, embeddings, dim=dim).persist()
    qb = buckets.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "table_id", "bucket"
    )
    cb = buckets.where(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), "table_id", "bucket"
    )
    cand = qb.join(cb, ["table_id", "bucket"]).select("query_id", "neighbor_id").distinct()

    e = _with_norm(embeddings)
    q = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )
