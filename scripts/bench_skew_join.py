"""Measured skew-join evidence: AQE skew-split vs profiler-derived
salting vs the naive plan.

The session factory turns on ``spark.sql.adaptive.skewJoin.enabled``
(functions/session.py:73) and the skew profiler derives ``salt_factor``
knobs (operators/skew.py) — this script is the MEASUREMENT behind both
claims, on a join skewed the way this repo's data actually is (the
transcripts generator plants one hot entity in ~20-30% of rows;
linking keys on Zipfian surfaces, the edge rollup on Zipfian entity
ids).

Workload: a deterministic Zipf-shaped fact table (one hot key carrying
``HOT_SHARE`` of N rows, the rest uniform over ``n_keys``) joined to a
per-key dim with broadcast disabled — the classic skewed shuffle join.
Per-row post-join work (sha2 over the joined columns) runs inside the
join stage, so the hot shuffle partition concentrates real CPU on one
task: exactly the straggler a 1000-executor cluster sees when one
entity holds 30% of a 100 TB table.

Three legs, same input, same session (AQE confs are runtime-settable;
each leg re-runs ``reps`` times and reports the median — the r3 lesson
that single-shot timings can't detect regressions):

- ``naive``  — skew-join handling OFF: the hot partition serializes on
  one core; wall approaches HOT_SHARE x total-CPU.
- ``aqe``    — skew-join ON with thresholds scaled to the local corpus
  (the defaults target 256 MB cluster partitions): AQE splits the hot
  partition at runtime; the executed plan is checked for the split
  (``skew=true`` / AQEShuffleRead markers), not assumed.
- ``salted`` — skew-join OFF, manual two-sided salting with the fan-out
  ``profile_skew`` derives (``salt_factor`` at rows_per_task = N/cores):
  fact rows get a deterministic salt, the dim explodes x salt_factor —
  the pre-AQE mitigation, and the one that also fixes skewed
  AGGREGATES (materialize_edges' two-phase rollup), which AQE
  skew-join does not touch.

Writes a marker-delimited section into BENCH.md (preserved by
``bench.py --scaling`` regenerations, same protocol as
bench_two_hop.py).

Usage: python scripts/bench_skew_join.py [n_rows] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SKEW_BEGIN = "<!-- SKEW_JOIN:BEGIN -->"
SKEW_END = "<!-- SKEW_JOIN:END -->"

HOT_SHARE = 0.3  # fraction of fact rows on the single hot key
N_KEYS = 10_000


def upsert_section(md_path: str, body: str) -> None:
    section = f"{SKEW_BEGIN}\n{body}\n{SKEW_END}"
    text = ""
    if os.path.exists(md_path):
        with open(md_path) as f:
            text = f.read()
    if SKEW_BEGIN in text and SKEW_END in text:
        head, rest = text.split(SKEW_BEGIN, 1)
        _, tail = rest.split(SKEW_END, 1)
        text = head + section + tail
    else:
        text = text.rstrip("\n") + "\n\n" + section + "\n"
    with open(md_path, "w") as f:
        f.write(text)


def make_tables(spark, n_rows: int):
    """Deterministic Zipf-shaped fact + per-key dim. ``pmod(id, 10) < 3``
    routes HOT_SHARE of ids to key 0; the rest spread uniformly."""
    from pyspark.sql import functions as F

    hot_mod = int(HOT_SHARE * 10)
    fact = (
        spark.range(n_rows)
        .select(
            F.when(F.pmod("id", F.lit(10)) < hot_mod, F.lit(0))
            .otherwise(F.pmod("id", F.lit(N_KEYS)))
            .cast("long")
            .alias("k"),
            F.col("id").alias("payload"),
        )
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("attr"),
    )
    return fact, dim


def run_leg(spark, fact, dim, salt: int | None) -> tuple[float, str]:
    """One timed join run; returns (wall_s, executed-plan string). The
    post-join sha2 + aggregate forces full evaluation with per-row CPU
    inside the join stage."""
    from pyspark.sql import functions as F

    if salt is None:
        joined = fact.join(dim, "k")
    else:
        # two-sided deterministic salting: fact rows scatter over
        # salt buckets, the dim replicates across all of them
        f_s = fact.withColumn("s", F.pmod(F.hash("payload"), F.lit(salt)))
        d_s = dim.withColumn(
            "s", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        joined = f_s.join(d_s, ["k", "s"])
    out = joined.select(
        F.sha2(F.concat_ws(":", "payload", "attr"), 256).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("h").startswith("00"), 1)).alias("n00"),
    )
    t0 = time.monotonic()
    row = out.collect()[0]
    wall = time.monotonic() - t0
    assert row["n"] > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    return wall, plan


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import build_session
    from transner_spark.operators.skew import profile_skew

    spark = build_session(f"local[{cpus}]", cpus)
    # force the shuffled join everywhere: broadcast would dodge the
    # skew instead of demonstrating the mitigation
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact, dim = make_tables(spark, n_rows)
    fact = fact.persist()
    fact.count()  # warm: materialize + spin python-free codegen paths

    # pre-flight: the profiler derives the salt fan-out the salted leg
    # uses — the exact workflow the module docstring prescribes
    rows_per_task = max(1, n_rows // cpus)
    prof = profile_skew(fact, ["k"], top_k=1, rows_per_task=rows_per_task)
    hot = prof.collect()[0]
    salt = int(hot["salt_factor"])

    legs: dict[str, dict] = {}

    def measure(name: str, salt_arg: int | None) -> None:
        walls, plans = [], []
        for _ in range(reps):
            w, p = run_leg(spark, fact, dim, salt_arg)
            walls.append(w)
            plans.append(p)
        legs[name] = {
            "wall_s": round(statistics.median(walls), 3),
            "spread_s": [round(w, 3) for w in sorted(walls)],
            "plan_skew_split": any(
                "skew=true" in p or "skewed" in p for p in plans
            ),
        }

    skew_confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # defaults target 256 MB cluster partitions; scale to corpus
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    measure("naive", None)
    measure("salted", salt)
    for k, v in skew_confs.items():
        spark.conf.set(k, v)
    measure("aqe", None)

    assert legs["aqe"]["plan_skew_split"], (
        "AQE leg did not split the skewed partition — thresholds no "
        "longer match the corpus; evidence would be vacuous."
    )

    result = {
        "n_rows": n_rows,
        "n_keys": N_KEYS,
        "hot_share": HOT_SHARE,
        "hot_cnt": int(hot["cnt"]),
        "hot_skew_x": float(hot["skew_x"]),
        "salt_factor": salt,
        "cpus": cpus,
        "reps": reps,
        "legs": legs,
        "speedup_aqe": round(
            legs["naive"]["wall_s"] / legs["aqe"]["wall_s"], 2
        ),
        "speedup_salted": round(
            legs["naive"]["wall_s"] / legs["salted"]["wall_s"], 2
        ),
    }
    print(json.dumps(result))

    body = f"""## Skew-join mitigation (measured)

Deterministic Zipf fact ({n_rows:,} rows, key 0 = {int(HOT_SHARE * 100)}% of rows,
measured skew_x {result["hot_skew_x"]:.1f}) joined to a {N_KEYS:,}-key dim,
broadcast disabled, per-row sha2 inside the join stage; local[{cpus}],
median of {reps}. `profile_skew` derived `salt_factor={salt}` at
rows_per_task=N/cores — the knob the salted leg feeds straight in.

| leg | wall (s) | spread | vs naive | skew split in plan |
| --- | --- | --- | --- | --- |
| naive (skew handling off) | {legs["naive"]["wall_s"]} | {legs["naive"]["spread_s"]} | 1.0x | {legs["naive"]["plan_skew_split"]} |
| AQE skew-join (thresholds scaled to corpus) | {legs["aqe"]["wall_s"]} | {legs["aqe"]["spread_s"]} | {result["speedup_aqe"]}x | {legs["aqe"]["plan_skew_split"]} |
| salted (profiler-derived x{salt}) | {legs["salted"]["wall_s"]} | {legs["salted"]["spread_s"]} | {result["speedup_salted"]}x | {legs["salted"]["plan_skew_split"]} |

AQE's split is verified in the executed plan, not assumed. The salted
leg is the mitigation that also covers skewed AGGREGATES
(materialize_edges' two-phase salted rollup), which AQE skew-join does
not touch. At cluster scale the same legs apply with default
thresholds (256 MB partitions); the profiler's salt_factor scales with
the measured hot-key count, not with this sandbox."""
    upsert_section(os.path.join(REPO, "BENCH.md"), body)
    fact.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
