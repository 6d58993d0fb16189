"""One-off larger-N spot run: full KG pipeline at ~4x the scaling
corpus (6.4M turns), local[32], 128 splits, warm-up pass — evidence
that the downstream stages (links/canonical/edges) stay flat as the
turn count grows while annotate scales linearly (the 100 TB shape).
Prints one JSON line; paste the numbers into BENCH.md's spot-run
section. Usage: python scripts/spot_run.py [n_turns]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import build_session, run_pipeline_timed  # noqa: E402


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 6_400_000
    corpus = os.path.join(REPO, "data", "cache", "spot", "transcripts.parquet")
    # _SUCCESS check: a bare directory check would accept a partially
    # written output if generation crashed mid-write
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from transner_spark.sources.transcripts import generate_transcripts_spark

        spark = build_session("local[32]", 32)
        df = generate_transcripts_spark(spark, n_turns // 10, 10)
        df.repartition(128).write.mode("overwrite").parquet(corpus)
        spark.stop()

    workdir = tempfile.mkdtemp(prefix="transner_spot_")
    try:
        spark = build_session("local[32]", 32)
        res = run_pipeline_timed(spark, "", workdir, transcripts_path=corpus)
        spark.stop()
        print(
            json.dumps(
                {
                    "turns": res["turns"],
                    "wall": round(res["total"], 1),
                    "turns_per_sec": round(res["turns_per_sec"], 0),
                    "triples_per_sec": round(res["triples_per_sec"], 0),
                    "timings": {k: round(v, 2) for k, v in res["timings"].items()},
                    "rss_mib": {k: round(v, 0) for k, v in res["rss"].items()},
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
