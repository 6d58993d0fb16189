"""Generate transcript caches + single-node-oracle golden parquet.

The driver's correctness gate runs each Spark query against an
``oracle_sql()`` DuckDB statement. For the NER/KG stages — which no SQL
engine can express — the oracle SQL reads these frozen goldens, produced
by the pure-Python reference-semantics oracle (kernels/oracle.py). The
files are deterministic (seedless crc32 generation) and committed; this
script regenerates them after any kernel change (pytest compares Spark
against a FRESH oracle run, so stale goldens fail loudly via the DuckDB
gate, never silently).

Usage: python scripts/make_goldens.py [sf0.001 sf0.01]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from transner_spark.kernels.oracle import run_oracle_pipeline  # noqa: E402
from transner_spark.sources.transcripts import (  # noqa: E402
    SF_CONVS,
    ensure_transcripts_parquet,
)


def write_pdf(pdf, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    # normalize any timestamp columns to microseconds (Spark-compatible)
    fields = []
    changed = False
    for f in table.schema:
        if pa.types.is_timestamp(f.type):
            fields.append(pa.field(f.name, pa.timestamp("us")))
            changed = True
        else:
            fields.append(f)
    if changed:
        table = table.cast(pa.schema(fields))
    pq.write_table(table, path)


def main(sfs: list[str]) -> None:
    import pandas as pd

    for sf in sfs:
        tpath = ensure_transcripts_parquet(REPO, sf)
        transcripts = pd.read_parquet(tpath)
        print(f"{sf}: {len(transcripts)} turns → oracle pipeline ...")
        out = run_oracle_pipeline(transcripts)
        for name, pdf in out.items():
            gpath = os.path.join(REPO, "data", "golden", sf, f"{name}.parquet")
            write_pdf(pdf, gpath)
            print(f"  golden {name}: {len(pdf)} rows → {gpath}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["sf0.001", "sf0.01"])
