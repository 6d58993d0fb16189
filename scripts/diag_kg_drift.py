"""Round-5 KG-wall drift investigation (VERDICT r4 item 5): the driver
record's wall went 19.62 (r2) -> 20.50 (r3) -> 21.64s (r4) on an
unchanged KG chain. This runs the sf0.1 KG pipeline phase as cold-JVM
subprocesses INTERLEAVED across three checkouts — r3-end code
(.worktrees/r3code), r4-end code (.worktrees/r4code), and HEAD — so any
host burst window hits at most one rep of each tree. Per-tree result =
per-stage and total MIN over reps (the unbiased estimator under
one-sided noise). If the three mins agree within the rep spread, the
drift is host noise, not code. Prints one JSON line; evidence paragraph
goes in BENCH.md.

Usage: python scripts/diag_kg_drift.py [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, tempfile
sys.path.insert(0, os.getcwd())
from bench import build_session, run_pipeline_timed
spark = build_session("local[32]", 32)
r = run_pipeline_timed(spark, "/root/testdata/sf0.1", tempfile.mkdtemp())
spark.stop()
print("DIAG" + json.dumps(
    {**{k: round(v, 3) for k, v in r["timings"].items()},
     "total": round(r["total"], 3)}
))
"""

TREES = {
    "r3": os.path.join(REPO, ".worktrees", "r3code"),
    "r4": os.path.join(REPO, ".worktrees", "r4code"),
    "head": REPO,
}


def run_once(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD],
        cwd=TREES[tree],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("DIAG"):
            return json.loads(line[4:])
    raise RuntimeError(f"{tree} leg failed:\n{out.stderr[-2000:]}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs: dict[str, list[dict]] = {t: [] for t in TREES}
    for i in range(reps):  # round-robin interleave
        for t in TREES:
            runs[t].append(run_once(t))
            print(f"rep {i + 1} {t}: total={runs[t][-1]['total']}",
                  file=sys.stderr)
    result = {}
    for t, rs in runs.items():
        keys = rs[0].keys()
        result[t] = {
            "min": {k: min(r[k] for r in rs) for k in keys},
            "totals": sorted(r["total"] for r in rs),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
