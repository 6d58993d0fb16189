"""SparkSession factory with the pipeline's standard configuration.

Single place for the scale-relevant knobs: Arrow batching for the UDF
stages, AQE (+ skew join) for the linking/materialize shuffles, UTC
session timezone so timestamps round-trip identically through parquet,
pandas, and DuckDB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from transner_spark.config import PipelineConfig


def get_spark(
    master: str | None = None,
    app_name: str = "transner_spark",
    shuffle_partitions: int | None = None,
    cfg: PipelineConfig | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cfg = cfg or PipelineConfig()
    if master is None:
        # under spark-submit the cluster master arrives via spark.master —
        # never override it with a local default (that would silently run
        # the whole job single-node on the driver)
        from pyspark import SparkConf

        if SparkConf().get("spark.master", None) is None:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
            master = f"local[{cpus}]"
    if shuffle_partitions is None and master is not None and (
        master == "local" or master.startswith("local[")
    ):
        # plain local mode only (NOT local-cluster[m,c,mem] — its bracket
        # payload is not a core count): match the chosen core count. When
        # the master is external (spark-submit / cluster), leave the
        # config UNSET so the cluster default + AQE coalescing govern
        # shuffle parallelism — hardcoding 32 here would silently cap a
        # 1000-executor job.
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        n = inner.split(",")[0]  # local[N,maxFailures] is valid syntax
        shuffle_partitions = 32 if n in ("*", "") else int(n)

    builder = SparkSession.builder
    if master is not None:
        builder = builder.master(master)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    builder = (
        builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(cfg.arrow_batch_rows),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce small shuffles by SIZE (advisoryPartitionSizeInBytes),
        # not down to defaultParallelism: the dim-sized linking/canonical
        # shuffles otherwise schedule `width` near-empty tasks per stage
        # (measured: links first pass 5.4s → 2.3s at sf0.1/local[32]).
        # At cluster scale a large shuffle still gets thousands of
        # advisory-sized partitions — this only collapses genuinely tiny
        # exchanges, exactly AQE's documented intent for the flag.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 24g default (was 8g): in local mode the ONE driver JVM holds
        # every "executor's" storage AND execution memory, so an 8g heap
        # at 1.5M-turn bench scale is heap-bound in the shuffle-heavy
        # post-annotate stages (cached array columns + concurrent task
        # execution memory → GC pressure / spill to this host's
        # ~116 MB/s disk). Measured on the local[8] scaling leg, same
        # code and corpus: triples 23.9s → 2.3s, links 27.7s → 6.2s,
        # leg wall 109.7s → 77.5s after the bump. The heap is FIXED
        # across parallelism levels (memory is not the variable under
        # test; a real 4N-executor cluster would bring 4x memory, so a
        # constant heap only understates 4N's advantage).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
