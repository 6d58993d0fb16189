"""Staged KG pipeline with per-stage commit, per-partition lineage metrics,
and resume-from-last-committed-stage.

Stage graph (each stage reads its inputs from the catalog, writes its
output table, then appends lineage rows — the Spark analogue of the
reference's JSON-lines request log, /root/reference/logger.py:5-11,
upgraded to the north rule's checkpoint-table contract):

    transcripts ─→ annotated ─→ mentions
                        │  └──→ triples ─→ links ─→ canonical ─→ edges ─→ serving
                        └─────→ quarantine

The final ``serving`` stage re-publishes the committed edge table as the
bucketed layout (operators/materialize.write_edges_bucketed): downstream
subj_id joins/aggs read it shuffle-free and point lookups bucket-prune
(BENCH.md bucketed section) — the KG is born co-located, as part of the
resumable run rather than a separate job.

On rerun, any stage whose output is already committed (``_SUCCESS``
present — the Parquet stand-in for an Iceberg snapshot) is skipped; a
mid-run kill therefore resumes exactly after the last committed stage.
"""

from __future__ import annotations

import hashlib
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transner_spark.config import PipelineConfig
from transner_spark.operators.annotate import (
    annotate_turns,
    explode_mentions,
    explode_triples,
    split_quarantine,
)
from transner_spark.operators.canonicalize import canonicalize
from transner_spark.operators.linking import link_surfaces, node_surfaces
from transner_spark.operators.materialize import (
    ensure_edges_bucketed_table,
    materialize_edges,
    write_edges_bucketed,
)
from transner_spark.sources.catalog import Catalog

STAGES = (
    "annotated",
    "quarantine",
    "mentions",
    "triples",
    "links",
    "canonical",
    "edges",
    "serving",
)


class PipelineRun:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        cfg: PipelineConfig | None = None,
        run_id: str | None = None,
    ):
        self.spark = spark
        self.catalog = Catalog(spark, workdir)
        self.cfg = cfg or PipelineConfig()
        self.run_id = run_id or uuid.uuid4().hex[:12]
        # workdir-stable (NOT run-scoped): reruns and resumed sessions
        # re-attach the same catalog entry instead of leaking one per run
        digest = hashlib.md5(
            os.path.abspath(workdir).encode("utf-8")
        ).hexdigest()[:10]
        self.serving_table = f"edges_serving_{digest}"
        self.stages_run: list[str] = []
        self.stages_skipped: list[str] = []

    # -- lineage ---------------------------------------------------------
    def _lineage(self, stage: str, wall_ms: float) -> None:
        """Per-partition row counts of the committed output + wall time.
        Counting happens on the already-written parquet (metadata-cheap),
        so the stage computation itself is never re-executed."""
        out = self.catalog.read(stage)
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows_out"))
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("stage", F.lit(stage))
            .withColumn("wall_ms", F.lit(float(wall_ms)))
            .withColumn("committed_at", F.current_timestamp())
            .select(
                "run_id", "stage", "partition_id", "rows_out", "wall_ms", "committed_at"
            )
        )
        self.catalog.append(per_part, "_lineage")

    def _commit(self, df: DataFrame, stage: str, partition_by: list[str] | None = None) -> None:
        t0 = time.monotonic()
        self.catalog.write(df, stage, partition_by=partition_by)
        self._lineage(stage, (time.monotonic() - t0) * 1000.0)
        self.stages_run.append(stage)

    def _done(self, stage: str) -> bool:
        if self.catalog.exists(stage):
            self.stages_skipped.append(stage)
            return True
        return False

    # -- stages ----------------------------------------------------------
    def run(self, transcripts: DataFrame) -> dict[str, DataFrame]:
        cat, cfg = self.catalog, self.cfg

        if not self._done("annotated"):
            self._commit(annotate_turns(transcripts, cfg), "annotated")
        if not self._done("quarantine"):
            _, rejected = split_quarantine(transcripts, cfg)
            self._commit(rejected, "quarantine")

        annotated = cat.read("annotated")
        if not self._done("mentions"):
            self._commit(explode_mentions(annotated), "mentions")
        if not self._done("triples"):
            self._commit(explode_triples(annotated), "triples")

        triples = cat.read("triples")
        if not self._done("links"):
            self._commit(link_surfaces(self.spark, node_surfaces(triples), cfg), "links")
        if not self._done("canonical"):
            self._commit(canonicalize(cat.read("links")), "canonical")
        if not self._done("edges"):
            edges = materialize_edges(triples, cat.read("canonical"), cfg)
            self._commit(edges, "edges", partition_by=["bucket"])
        if not self._done("serving"):
            # bucketed serving twin of the edge table — bypasses
            # catalog.write (the layout IS the point) but keeps the same
            # lineage + commit bookkeeping; the catalog name is
            # workdir-stable, the durable artifact is the path
            t0 = time.monotonic()
            write_edges_bucketed(
                cat.read("edges"),
                self.serving_table,
                cat.path("serving"),
                cfg,
            )
            self._lineage("serving", (time.monotonic() - t0) * 1000.0)
            self.stages_run.append("serving")
        else:
            # resumed run / fresh session: the files are committed but
            # the bucket spec is session-catalog metadata — re-attach it
            # so downstream reads keep the zero-Exchange property
            ensure_edges_bucketed_table(
                self.spark, self.serving_table, cat.path("serving"), cfg
            )

        out = {s: cat.read(s) for s in STAGES if s != "serving"}
        # read through the catalog entry (never the bare path): the
        # bucketed distribution only exists via the table metadata
        out["serving"] = self.spark.table(self.serving_table)
        return out


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    workdir: str,
    cfg: PipelineConfig | None = None,
    run_id: str | None = None,
) -> dict[str, DataFrame]:
    return PipelineRun(spark, workdir, cfg, run_id).run(transcripts)
