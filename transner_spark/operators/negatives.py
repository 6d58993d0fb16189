"""Deterministic negative sampling over the materialized edge table —
the training-data op that turns a KG into KG-embedding training pairs
(TransE/DistMult-style contrastive learning needs, for every positive
(subj, pred, obj), k corrupted negatives drawn uniformly from the entity
vocabulary, minus accidental positives — "filtered" sampling in the KG
literature).

Everything is HASH-derived (the engine-portable h60, functions/
hashing.py), so the sample is a pure function of the edge table: the
gate can value-check it against a DuckDB re-derivation, a re-run emits
bit-identical training data (reproducible experiments), and no RNG state
needs coordinating across executors.

The crux at scale is indexing the entity vocabulary 0..N-1 so a hash can
address it uniformly WITHOUT a global sort/window over a data-scaled
table (the banned WindowExec-SinglePartition shape). Two-level scheme:

1. bucket each entity by ``h60('nsb:'||id) % NEG_BUCKETS`` — uniform,
   deterministic;
2. rank WITHIN each bucket (window PARTITIONED by bucket — per-bucket
   frames of ~N/256 rows, the partitioned-window posture every other
   operator uses);
3. bucket offsets as a prefix sum over the bucket-stats table,
   computed by a broadcast inequality self-join over EXACTLY
   ``NEG_BUCKETS`` rows — a compile-time CONSTANT, not data-scaled,
   and free of single-partition WindowExec;
4. ``global_idx = offset + rank - 1`` — a gapless 0..N-1 labeling.

Each (edge, sample_i) then computes ``target = h60(...) % N`` (N enters
the plan as a broadcast 1-row scalar, the pagerank crossJoin posture —
no driver collect) and resolves the corrupted object via an equi-join on
``global_idx`` against the entity index — broadcastable, since the
entity vocabulary is the dim-sized side (Zipf collapse: entities are
orders of magnitude fewer than edges). Finally the "filtered" step:
drop corruptions that hit the true object or ANY existing positive —
one left_anti join on the edge key.

Cited parity: the reference repo has no negative-sampling counterpart
(its scope ends at NER); this is part of the training-data surface the
build adds on top (SURVEY §2 training-data ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transner_spark.functions.hashing import h60

NEG_SAMPLES = 2
NEG_BUCKETS = 256


def entity_index(edges: DataFrame, n_buckets: int = NEG_BUCKETS) -> DataFrame:
    """(id, gidx): gapless deterministic 0..N-1 index over the distinct
    entity vocabulary of the edge table — bucketed rank + constant-size
    offset scan (see module docstring for why this avoids a data-scaled
    global window)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    ents = (
        edges.select(F.col("subj_id").alias("id"))
        .unionByName(edges.select(F.col("obj_id").alias("id")))
        .distinct()
    )
    eb = ents.withColumn(
        "b", F.pmod(h60(F.concat(F.lit("nsb:"), F.col("id"))), F.lit(n_buckets))
    )
    rn_w = Window.partitionBy("b").orderBy("id")
    ranked = eb.withColumn("rn", F.row_number().over(rn_w))
    bc = eb.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    # prefix sum over the bucket-stats table as a broadcast inequality
    # join (off(b) = Σ c over b' < b): n_buckets² = 65k comparisons, a
    # CONSTANT regardless of corpus size — and, unlike an ORDER BY
    # running-sum window, it never creates a single-partition WindowExec
    # (the repo pins zero such warnings; the DuckDB oracle uses the
    # running-sum formulation, an independent derivation of the same
    # prefix sums)
    prior = bc.select(F.col("b").alias("b_prior"), F.col("c").alias("c_prior"))
    offsets = (
        bc.join(F.broadcast(prior), F.col("b_prior") < F.col("b"), "left")
        .groupBy("b")
        .agg(F.coalesce(F.sum("c_prior"), F.lit(0)).alias("off"))
    )
    return ranked.join(F.broadcast(offsets), "b").select(
        "id", (F.col("off") + F.col("rn") - 1).cast("long").alias("gidx")
    )


def negative_samples(
    edges: DataFrame,
    n_samples: int = NEG_SAMPLES,
    n_buckets: int = NEG_BUCKETS,
) -> DataFrame:
    """(subj_id, pred, obj_id, sample_id): for every distinct positive
    triple, up to ``n_samples`` object-corrupted negatives — corrupted
    object = entity ``h60('neg:'||i||':'||subj|pred|obj) % N`` of the
    deterministic entity index, minus corruptions that collide with the
    true object or any existing positive (filtered sampling, so the
    emitted count can be slightly below ``n_samples`` per edge — by
    construction, never by chance).

    Distinct SOURCE positives sharing (subj, pred) can hash to the same
    corrupted object, so the output may contain duplicate rows — that is
    the sampler's semantics (one draw per positive), mirrored exactly by
    the oracle; consumers wanting a distinct negative set dedup on read.

    ``n_samples`` must be >= 1: Spark's ``sequence(0, n-1)`` DESCENDS
    for n=0 (yielding [0, -1] instead of []), which would silently
    desynchronize operator and oracle — so both fail loud instead."""
    if n_samples < 1:
        raise ValueError(f"n_samples must be >= 1, got {n_samples}")
    pos = edges.select("subj_id", "pred", "obj_id").distinct().localCheckpoint()
    idx = entity_index(pos, n_buckets)
    total = idx.agg(F.count(F.lit(1)).cast("long").alias("n_ents"))
    cand = (
        pos.withColumn(
            "sample_id", F.explode(F.sequence(F.lit(0), F.lit(n_samples - 1)))
        )
        .withColumn("sample_id", F.col("sample_id").cast("int"))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "gidx",
            F.pmod(
                h60(
                    F.concat(
                        F.lit("neg:"),
                        F.col("sample_id").cast("string"),
                        F.lit(":"),
                        F.col("subj_id"),
                        F.lit("|"),
                        F.col("pred"),
                        F.lit("|"),
                        F.col("obj_id"),
                    )
                ),
                F.col("n_ents"),
            ),
        )
    )
    corrupted = (
        cand.join(F.broadcast(idx), "gidx")
        .where(F.col("id") != F.col("obj_id"))
        .select(
            "subj_id",
            "pred",
            F.col("id").alias("obj_id"),
            "sample_id",
        )
    )
    return corrupted.join(pos, ["subj_id", "pred", "obj_id"], "left_anti")
