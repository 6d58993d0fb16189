"""Diff-shaped diagnosis of the saturated-leg anomaly (VERDICT r3 item
7): per-stage scaling shows `mentions` 0.52s → 2.48s going local[8] →
local[32] while the unsaturated headline holds. The stage is
``explode_mentions(annotated).count()`` over the persisted annotated
frame, so there are only two suspects: the CACHE READ (serialized
MEMORY_AND_DISK blocks — deserialization + possible disk spill under
32-way concurrent materialization) or the EXPLODE itself (JVM codegen,
no shuffle). This script separates them: each leg (local[8], local[32],
cold JVM subprocess, same scaling corpus) times the mentions count
twice — once over the persisted annotated frame (cache-read path) and
once over a fresh un-persisted annotate (recompute path) — and reports
the cache's memory/disk storage split. If the cached path degrades at
32 while the recompute path scales, and/or diskSize lights up only at
32, the cause is the cache, not the operator.

Usage: python scripts/diag_saturation.py          # spawn both legs
       python scripts/diag_saturation.py --leg N  # one leg (internal)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def leg(n: int) -> None:
    from pyspark import StorageLevel

    sys.path.insert(0, REPO)
    import bench
    from transner_spark.operators.annotate import annotate_turns, explode_mentions

    corpus = bench.ensure_scaling_corpus()
    spark = bench.build_session(f"local[{n}]", n)
    t = spark.read.parquet(corpus)
    bench.warm_up(spark, t, "/tmp/diag_sat_warm")

    r: dict = {"level": n}
    t0 = time.monotonic()
    annotated = annotate_turns(t).persist(StorageLevel.MEMORY_AND_DISK)
    annotated.count()
    r["annotate_s"] = round(time.monotonic() - t0, 2)

    # discriminator: same session, same fully-cached blocks, reader
    # CONCURRENCY alternated between full width and a narrow coalesce(8)
    # — repeated, because the sandbox host has bursty one-sided noise
    # (min per width is the unbiased estimator, same rationale as
    # bench.py). If w8 stays fast inside local[32] while full width is
    # slow, the slowdown is concurrent-cached-reader contention (shared
    # block manager / GC), not session config or cache state.
    full, w8 = [], []
    for _ in range(3):
        t0 = time.monotonic()
        explode_mentions(annotated).count()
        full.append(round(time.monotonic() - t0, 2))
        t0 = time.monotonic()
        explode_mentions(annotated.coalesce(8)).count()
        w8.append(round(time.monotonic() - t0, 2))
    r["mentions_cached_s"] = min(full)
    r["mentions_cached_w8_s"] = min(w8)
    r["cached_spread"] = {"full": full, "w8": w8}
    # the heap the JVM actually got, not a re-statement of the default
    r["heap"] = spark.conf.get("spark.driver.memory")

    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    r["cache_mem_mib"] = round(sum(i.memSize() for i in infos) / 2**20)
    r["cache_disk_mib"] = round(sum(i.diskSize() for i in infos) / 2**20)

    annotated.unpersist(blocking=True)
    t0 = time.monotonic()
    explode_mentions(annotate_turns(t)).count()
    r["mentions_recompute_s"] = round(time.monotonic() - t0, 2)
    spark.stop()
    print(json.dumps(r))


def main() -> None:
    if "--leg" in sys.argv:
        leg(int(sys.argv[sys.argv.index("--leg") + 1]))
        return
    import subprocess

    for n in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", str(n)],
            capture_output=True,
            text=True,
        )
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-4000:])
            raise RuntimeError(f"leg {n} failed")
        print(p.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
