"""Benchmark: full KG pipeline at $SPARK_GRAFT_SF_DIR (default sf0.1,
~200k turns) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "kg_pipeline_wall", "value": <total sec>, "unit": "sec",
   "queries": {stage: sec, ...}, "sf": ..., "turns": N, "triples": N,
   "triples_per_sec": ..., "turns_per_sec": ...}

``--scaling`` additionally runs the same job at the two SCALING_LEVELS
parallelism levels on the same (larger) input and writes BENCH.md with
throughput at both + scaling efficiency — the sandbox proxy for the
north rule's N vs 4N executor-cluster criterion. See BENCH.md for why
the levels sit inside the host's unsaturated region.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# N vs 4N proxy pairs. The headline pair (2, 8) sits inside this host's
# unsaturated region (see the rationale block written into BENCH.md);
# the (8, 32) pair is reported alongside for transparency — it measures
# host oversubscription as much as pipeline scaling (ADVICE r1).
SCALING_PAIRS = ((2, 8), (8, 32))
SCALING_LEVELS = tuple(sorted({n for p in SCALING_PAIRS for n in p}))


def build_session(master: str, cpus: int):
    from transner_spark.functions.session import get_spark

    return get_spark(master=master, app_name="transner_spark_bench",
                     shuffle_partitions=cpus)


def ensure_scaling_corpus(turns: int = 1_600_000) -> str:
    """Generate-once large corpus for the N-vs-4N scaling runs: the
    fixed driver/setup overheads (~10-15 s: python-worker spin-up,
    iterative-CC driver latency) would dominate a 190k-turn run and
    measure the sandbox, not the pipeline. Distributed generation, 64
    output splits."""
    out = os.path.join(REPO, "data", "cache", "scaling", "transcripts.parquet")
    if os.path.exists(out):
        return out
    from transner_spark.sources.transcripts import generate_transcripts_spark

    spark = build_session("local[32]", 32)
    df = generate_transcripts_spark(spark, turns // 10, 10)
    df.repartition(64).write.mode("overwrite").parquet(out)
    spark.stop()
    return out


def warm_up(spark, transcripts) -> None:
    """Spawn every python worker + load per-worker singletons before the
    clock starts: we benchmark steady-state throughput, not interpreter
    start-up (documented in BENCH.md)."""
    from transner_spark.operators.annotate import annotate_turns

    # sample() keeps the input partitioning, so tasks land on every core
    # and all python workers spawn (limit() would collapse partitions)
    annotate_turns(transcripts.sample(0.01, seed=7)).count()


def run_pipeline_timed(
    spark, sf_dir: str, workdir: str, transcripts_path: str | None = None
) -> dict:
    from transner_spark.operators.annotate import (
        annotate_turns, explode_mentions, explode_triples,
    )
    from transner_spark.operators.canonicalize import canonicalize
    from transner_spark.operators.linking import link_surfaces, node_surfaces
    from transner_spark.operators.materialize import materialize_edges, write_edges
    from transner_spark.sources.transcripts import ensure_transcripts_parquet

    from pyspark import StorageLevel

    path = transcripts_path or ensure_transcripts_parquet(REPO, sf_dir)
    transcripts = spark.read.parquet(path)
    warm_up(spark, transcripts)

    # serialized caching: the deserialized default balloons the 1.5M-turn
    # array columns past the local JVM heap and GC-thrashes the small
    # downstream stages; a big heap instead slows every small task
    # (first-touch faults + huge young gen). Serialized fits comfortably.
    CACHE = StorageLevel.MEMORY_AND_DISK

    timings: dict[str, float] = {}

    t0 = time.monotonic()
    annotated = annotate_turns(transcripts).persist(CACHE)
    n_turns = annotated.count()
    timings["annotate"] = time.monotonic() - t0

    t0 = time.monotonic()
    n_mentions = explode_mentions(annotated).count()
    timings["mentions"] = time.monotonic() - t0

    t0 = time.monotonic()
    triples = explode_triples(annotated).persist(CACHE)
    n_triples = triples.count()
    timings["triples"] = time.monotonic() - t0

    t0 = time.monotonic()
    links = link_surfaces(spark, node_surfaces(triples)).persist(CACHE)
    links.count()
    timings["links"] = time.monotonic() - t0

    t0 = time.monotonic()
    # canonicalize localCheckpoints internally (the canonical-map
    # materialization) — no extra persist needed
    canon = canonicalize(links)
    canon.count()
    timings["canonical"] = time.monotonic() - t0

    t0 = time.monotonic()
    edges = materialize_edges(triples, canon)
    write_edges(edges, os.path.join(workdir, "edges"))
    timings["edges"] = time.monotonic() - t0

    annotated.unpersist()
    triples.unpersist()
    links.unpersist()

    total = sum(timings.values())
    return {
        "timings": timings,
        "total": total,
        "turns": n_turns,
        "mentions": n_mentions,
        "triples": n_triples,
        "turns_per_sec": n_turns / total,
        "triples_per_sec": n_triples / total,
    }


def run_trainops_timed(spark, sf_dir: str) -> dict:
    """Training-data pipeline ops over the driver-provided documents/
    embeddings tables at the bench scale."""
    from transner_spark.operators.dedup import dedup_minhash_lsh, dedup_simhash
    from transner_spark.operators.simsearch import ann_ivf, ann_lsh
    from transner_spark.operators.textops import doc_fingerprint, lang_id, text_stats

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    # warm-up on bounded slices: the first execution of the big sketch
    # expressions pays whole-stage-codegen JIT compilation (measured
    # 7.6s cold vs 1.9s steady for the minhash pass) — same steady-state
    # policy as the pipeline's warm_up(). Every timed op below gets a
    # warm pass; the ANN slice keeps the query ids plus a small corpus.
    from pyspark.sql import functions as _F

    sample = docs.sample(0.05, seed=7)
    text_stats(sample).count()
    lang_id(sample).count()
    doc_fingerprint(sample).count()
    dedup_minhash_lsh(sample).count()
    dedup_simhash(sample).count()
    emb_small = emb.where(_F.col("vec_id") < 512)
    ann_lsh(spark, emb_small).count()
    ann_ivf(spark, emb_small).count()

    # the sketch ops persist signature intermediates internally and hold
    # them for the session; clear between measurements so each op is
    # timed steady-state-cold and nothing accumulates in the block manager
    spark.catalog.clearCache()

    t0 = time.monotonic()
    counts["textops"] = (
        text_stats(docs).count() + lang_id(docs).count() + doc_fingerprint(docs).count()
    )
    timings["textops"] = time.monotonic() - t0

    t0 = time.monotonic()
    counts["dedup_minhash"] = dedup_minhash_lsh(docs).count()
    timings["dedup_minhash"] = time.monotonic() - t0
    spark.catalog.clearCache()

    t0 = time.monotonic()
    counts["dedup_simhash"] = dedup_simhash(docs).count()
    timings["dedup_simhash"] = time.monotonic() - t0
    spark.catalog.clearCache()

    t0 = time.monotonic()
    counts["ann_lsh"] = ann_lsh(spark, emb).count()
    timings["ann_lsh"] = time.monotonic() - t0
    spark.catalog.clearCache()

    t0 = time.monotonic()
    counts["ann_ivf"] = ann_ivf(spark, emb).count()
    timings["ann_ivf"] = time.monotonic() - t0
    spark.catalog.clearCache()

    return {"timings": timings, "counts": counts}


def main() -> None:
    import shutil
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scaling = "--scaling" in sys.argv

    workdir = tempfile.mkdtemp(prefix="transner_bench_")
    try:
        spark = build_session(f"local[{cpus}]", cpus)
        res = run_pipeline_timed(spark, sf_dir, workdir)
        tops = run_trainops_timed(spark, sf_dir)
        spark.stop()

        from transner_spark.sources.transcripts import sf_name

        out = {
            "metric": "kg_pipeline_wall",
            "value": round(res["total"], 3),
            "unit": "sec",
            "queries": {
                **{k: round(v, 3) for k, v in res["timings"].items()},
                **{k: round(v, 3) for k, v in tops["timings"].items()},
            },
            "trainops_counts": tops["counts"],
            "sf": sf_name(sf_dir),
            "turns": res["turns"],
            "mentions": res["mentions"],
            "triples": res["triples"],
            "turns_per_sec": round(res["turns_per_sec"], 1),
            "triples_per_sec": round(res["triples_per_sec"], 1),
        }

        if scaling:
            corpus = ensure_scaling_corpus()
            levels = {}
            for n in SCALING_LEVELS:
                spark = build_session(f"local[{n}]", n)
                r = run_pipeline_timed(
                    spark, sf_dir, os.path.join(workdir, f"s{n}"),
                    transcripts_path=corpus,
                )
                spark.stop()
                levels[n] = r
            effs = {
                (lo, hi): (
                    levels[hi]["triples_per_sec"] / levels[lo]["triples_per_sec"]
                ) / (hi / lo)
                for lo, hi in SCALING_PAIRS
            }
            out["scaling"] = {
                **{
                    f"local{n}_triples_per_sec": round(
                        levels[n]["triples_per_sec"], 1
                    )
                    for n in SCALING_LEVELS
                },
                **{
                    f"efficiency_{lo}v{hi}": round(e, 3)
                    for (lo, hi), e in effs.items()
                },
                "efficiency": round(effs[SCALING_PAIRS[0]], 3),
            }
            _write_bench_md(sf_dir, levels, effs)

        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _write_bench_md(sf_dir: str, levels: dict, effs: dict) -> None:
    lo, hi = SCALING_PAIRS[0]
    lines = [
        "# BENCH — scaling evidence (north rule: N vs 4N)",
        "",
        f"Input: deterministic synthetic transcripts, {levels[lo]['turns']} "
        f"turns, 64 parquet splits — the same data at every parallelism "
        f"level (the sandbox proxy for N- vs 4N-executor clusters). Each "
        "timed run is preceded by a warm-up pass so python-worker spin-up "
        "is excluded: the metric is steady-state pipeline throughput.",
        "",
        f"Headline pair local[{lo}] vs local[{hi}]: in local mode every "
        "'executor core' costs ~2 host threads (a JVM task thread plus an "
        "Arrow python worker), so this 32-core host saturates near "
        "local[16] — a measured sweep of the annotate stage gives "
        "0.33/0.35/0.48/1.01 core-ms/turn at local[4/8/16/32]. N vs 4N "
        "must be measured in the unsaturated region to evidence the "
        "PIPELINE's scaling rather than host oversubscription; on a real "
        "cluster 4N executors add machines, not contended threads. The "
        "saturated local[8]v[32] figure is reported alongside for "
        "transparency about the proxy's sensitivity to level choice.",
        "",
        "| parallelism | wall (s) | turns/s | triples/s |",
        "| --- | --- | --- | --- |",
    ]
    for n in SCALING_LEVELS:
        r = levels[n]
        lines.append(
            f"| local[{n}] | {r['total']:.2f} | {r['turns_per_sec']:.1f} | "
            f"{r['triples_per_sec']:.1f} |"
        )
    lines.append("")
    for (plo, phi), e in effs.items():
        label = "headline, unsaturated region" if (plo, phi) == SCALING_PAIRS[0] \
            else "saturated region: measures host thread contention too"
        lines.append(
            f"**Scaling efficiency local[{plo}]→local[{phi}]: "
            f"(throughput_{phi} / throughput_{plo}) / {phi // plo} = "
            f"{e:.3f}** ({label})."
        )
    lines += [
        "",
        "Target ≥ 0.8 on the headline pair (BASELINE.json north rule).",
        "",
        "Per-stage timings:",
        "",
        "| stage | " + " | ".join(f"local[{n}] s" for n in SCALING_LEVELS) + " |",
        "| --- |" + " --- |" * len(SCALING_LEVELS),
    ]
    for k in levels[lo]["timings"]:
        lines.append(
            f"| {k} | "
            + " | ".join(f"{levels[n]['timings'][k]:.2f}" for n in SCALING_LEVELS)
            + " |"
        )
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
