"""Bucketed serving-table evidence at bench scale.

Writes the sf0.1 edge table twice — plain parquet directory vs a
Spark-native bucketed table (``write_edges_bucketed``:
``bucketBy(edge_buckets, subj_id) + sortBy``) — then runs the two
read-side workload shapes every KG consumer repeats (an equi-self-join
on ``subj_id`` and a ``groupBy(subj_id)`` rollup) over each layout, and
records wall time plus the number of shuffle Exchanges in the executed
plan. The point is the Exchange count: the bucketed layout pays its
shuffle ONCE at write time and every later subj_id join/agg reads the
table pre-distributed — at 10^12-turn scale that is the difference
between "each analytics query re-shuffles the KG" and "the KG is born
co-located". (Iceberg: same layout via the ``bucket(N, subj_id)``
partition transform + storage-partitioned joins, SURVEY.md §1.2.)

Results go into a marker-delimited BENCH.md section that
``bench.py --scaling`` preserves across regenerations.

Usage: python scripts/bench_bucketed.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- BUCKETED_EDGES:BEGIN -->"
END = "<!-- BUCKETED_EDGES:END -->"


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


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange hashpartitioning", plan))


def _timed(make_df):
    """warm + steady: first pass pays codegen/listing, second is the
    figure (same protocol as bench_two_hop)."""
    make_df().count()
    t0 = time.monotonic()
    n = make_df().count()
    return n, time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from bench import build_session
    from transner_spark.operators.annotate import annotate_turns, explode_triples
    from transner_spark.operators.canonicalize import canonicalize
    from transner_spark.operators.linking import link_surfaces, node_surfaces
    from transner_spark.operators.materialize import (
        materialize_edges,
        write_edges_bucketed,
    )
    from transner_spark.sources.transcripts import (
        ensure_transcripts_parquet,
        sf_name,
    )

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

    workdir = tempfile.mkdtemp(prefix="transner_bucketed_")
    plain_path = os.path.join(workdir, "plain")
    edges.write.mode("overwrite").parquet(plain_path)
    spark.sql("DROP TABLE IF EXISTS edges_serving")
    write_edges_bucketed(edges, "edges_serving", os.path.join(workdir, "bucketed"))

    # force sort-merge so the Exchange presence/absence is the signal
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_abs = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        readers = {
            "plain parquet": lambda: spark.read.parquet(plain_path),
            "bucketed table": lambda: spark.table("edges_serving"),
        }
        # hot subject for the point-lookup workload (driver-side single
        # value — bench harness, not the data path)
        hot = (
            edges.groupBy("subj_id")
            .count()
            .orderBy(F.desc("count"), "subj_id")
            .first()["subj_id"]
        )
        # bucket PRUNING needs the bucketed scan kept for filter-only
        # plans; autoBucketedScan would trade it away for split
        # parallelism (pinned by test_bucketed_edges_point_lookup_*)
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        rows = {}
        for name, rd in readers.items():
            join = lambda rd=rd: rd().alias("a").join(rd().alias("b"), "subj_id")
            agg = lambda rd=rd: rd().groupBy("subj_id").agg(
                F.sum("weight").alias("w")
            )
            lookup = lambda rd=rd: rd().where(F.col("subj_id") == hot)
            jn, jw = _timed(join)
            an, aw = _timed(agg)
            ln, lw = _timed(lookup)
            m = re.search(
                r"SelectedBucketsCount: (\d+ out of \d+)",
                lookup()._jdf.queryExecution().executedPlan().toString(),
            )
            rows[name] = {
                "join": (jn, jw, str(_exchanges(join()))),
                "agg": (an, aw, str(_exchanges(agg()))),
                "lookup": (ln, lw, f"buckets {m.group(1)}" if m else "no pruning"),
            }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old_abs
        )
        spark.sql("DROP TABLE IF EXISTS edges_serving")

    body_rows = []
    for name, r in rows.items():
        for wl in ("join", "agg", "lookup"):
            n, w, ex = r[wl]
            body_rows.append(f"| {name} | {wl} on subj_id | {n} | {w:.2f} | {ex} |")

    body = "\n".join(
        [
            "## Bucketed serving layout (edge table, measured)",
            "",
            f"Edge table: {sf_name(sf_dir)}, {n_edges} edges, written as a "
            "plain parquet directory vs a Spark-native bucketed table "
            "(`write_edges_bucketed`: `bucketBy(64, subj_id) + sortBy`, "
            "session catalog). Workloads: self-equi-join, groupBy rollup, "
            "and hot-subject point lookup on `subj_id` — the access "
            "patterns two-hop, edge-diff, incremental merge, entity "
            "rollups, and entity serving repeat. Broadcast disabled so "
            "the shuffle question is visible; autoBucketedScan disabled "
            "so the filter-only lookup keeps the prunable bucketed scan; "
            "warm+steady timing protocol as the two-hop section.",
            "",
            "| layout | workload | rows | wall (s) | shuffle Exchanges / pruning |",
            "| --- | --- | --- | --- | --- |",
            *body_rows,
            "",
            "The bucketed layout runs the join and agg workloads with "
            "**zero** shuffle Exchanges — the write-time shuffle is "
            "amortized across every read — and the point lookup reads "
            "**one bucket of 64** (bucket pruning; the plain directory "
            "scans every file). Plan pins: tests/test_plan_shapes.py::"
            "test_bucketed_edges_*. At sf0.1 the edge table is dim-sized "
            "so the wall delta is modest; the Exchange and "
            "SelectedBucketsCount figures are the scale-relevant facts — "
            "each eliminated Exchange is a full table shuffle, and a "
            "pruned point lookup touches 1/64th of the KG's files, at "
            "10^12-turn scale the difference between a serving query and "
            "a table scan.",
        ]
    )
    upsert_section(os.path.join(REPO, "BENCH.md"), body)
    for name, r in rows.items():
        print(
            f"{name}: join {r['join'][1]:.2f}s/{r['join'][2]} exch; "
            f"agg {r['agg'][1]:.2f}s/{r['agg'][2]} exch"
        )
    spark.stop()

    import shutil

    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
