"""Benchmark: full KG pipeline at $SPARK_GRAFT_SF_DIR (default sf0.1,
~200k turns) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "kg_pipeline_wall", "value": <total sec>, "unit": "sec",
   "queries": {stage: sec, ...}, "sf": ..., "turns": N, "triples": N,
   "triples_per_sec": ..., "turns_per_sec": ...}

``--scaling`` additionally runs the same job at local[8] and local[32] on
the same input and writes BENCH.md with throughput at both parallelism
levels + scaling efficiency (the sandbox proxy for the north rule's
N vs 4N executor-cluster criterion).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def build_session(master: str, cpus: int):
    from transner_spark.functions.session import get_spark

    return get_spark(master=master, app_name="transner_spark_bench",
                     shuffle_partitions=cpus)


def run_pipeline_timed(spark, sf_dir: str, workdir: str) -> dict:
    from pyspark.sql import functions as F

    from transner_spark.operators.annotate import (
        annotate_turns, explode_mentions, explode_triples,
    )
    from transner_spark.operators.canonicalize import canonicalize
    from transner_spark.operators.linking import link_surfaces, node_surfaces
    from transner_spark.operators.materialize import materialize_edges, write_edges
    from transner_spark.sources.transcripts import ensure_transcripts_parquet

    path = ensure_transcripts_parquet(REPO, sf_dir)
    transcripts = spark.read.parquet(path)

    timings: dict[str, float] = {}

    t0 = time.monotonic()
    annotated = annotate_turns(transcripts).persist()
    n_turns = annotated.count()
    timings["annotate"] = time.monotonic() - t0

    t0 = time.monotonic()
    n_mentions = explode_mentions(annotated).count()
    timings["mentions"] = time.monotonic() - t0

    t0 = time.monotonic()
    triples = explode_triples(annotated).persist()
    n_triples = triples.count()
    timings["triples"] = time.monotonic() - t0

    t0 = time.monotonic()
    links = link_surfaces(spark, node_surfaces(triples)).persist()
    links.count()
    timings["links"] = time.monotonic() - t0

    t0 = time.monotonic()
    canon = canonicalize(links).persist()
    canon.count()
    timings["canonical"] = time.monotonic() - t0

    t0 = time.monotonic()
    edges = materialize_edges(triples, canon)
    write_edges(edges, os.path.join(workdir, "edges"))
    timings["edges"] = time.monotonic() - t0

    annotated.unpersist()
    triples.unpersist()
    links.unpersist()
    canon.unpersist()

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
    from transner_spark.operators.simsearch import ann_lsh
    from transner_spark.operators.textops import doc_fingerprint, lang_id, text_stats

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    t0 = time.monotonic()
    counts["textops"] = (
        text_stats(docs).count() + lang_id(docs).count() + doc_fingerprint(docs).count()
    )
    timings["textops"] = time.monotonic() - t0

    t0 = time.monotonic()
    counts["dedup_minhash"] = dedup_minhash_lsh(docs).count()
    timings["dedup_minhash"] = time.monotonic() - t0

    t0 = time.monotonic()
    counts["dedup_simhash"] = dedup_simhash(docs).count()
    timings["dedup_simhash"] = time.monotonic() - t0

    t0 = time.monotonic()
    counts["ann_lsh"] = ann_lsh(spark, emb).count()
    timings["ann_lsh"] = time.monotonic() - t0

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
            levels = {}
            for n in (8, 32):
                spark = build_session(f"local[{n}]", n)
                r = run_pipeline_timed(spark, sf_dir, os.path.join(workdir, f"s{n}"))
                spark.stop()
                levels[n] = r
            eff = (levels[32]["triples_per_sec"] / levels[8]["triples_per_sec"]) / 4.0
            out["scaling"] = {
                "local8_triples_per_sec": round(levels[8]["triples_per_sec"], 1),
                "local32_triples_per_sec": round(levels[32]["triples_per_sec"], 1),
                "efficiency": round(eff, 3),
            }
            _write_bench_md(sf_dir, levels, eff)

        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _write_bench_md(sf_dir: str, levels: dict, eff: float) -> None:
    lines = [
        "# BENCH — scaling evidence (north rule: N vs 4N)",
        "",
        f"Input: deterministic transcripts at `{sf_dir}` scale "
        f"({levels[8]['turns']} turns), same data at both parallelism levels.",
        "",
        "| parallelism | wall (s) | turns/s | triples/s |",
        "| --- | --- | --- | --- |",
    ]
    for n in (8, 32):
        r = levels[n]
        lines.append(
            f"| local[{n}] | {r['total']:.2f} | {r['turns_per_sec']:.1f} | "
            f"{r['triples_per_sec']:.1f} |"
        )
    lines += [
        "",
        f"**Scaling efficiency (throughput_32 / throughput_8) / 4 = {eff:.3f}** "
        f"(target ≥ 0.8, BASELINE.json north rule; local[8] vs local[32] is the "
        "sandbox proxy for N vs 4N executor clusters).",
        "",
        "Per-stage timings:",
        "",
        "| stage | local[8] s | local[32] s |",
        "| --- | --- | --- |",
    ]
    for k in levels[8]["timings"]:
        lines.append(
            f"| {k} | {levels[8]['timings'][k]:.2f} | {levels[32]['timings'][k]:.2f} |"
        )
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
