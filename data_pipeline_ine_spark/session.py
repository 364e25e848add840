"""SparkSession factory with scale-aware defaults.

The reference has no session concept (one eager pandas process,
``pipeline_orchestrator.py:71``). Here every entry point shares one factory so
local tests and a real cluster get the same tuned configuration.

Design notes for 100 TB scale:
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuning per dataset size.
- Broadcast threshold 64 MB: dimension tables (region/nation/customer slices,
  label maps) always broadcast instead of shuffling the fact table.
- Arrow enabled: any unavoidable Python stage (Pandas UDFs in
  operators/dedup.py, operators/multimodal.py) moves data in columnar batches.
- Session timezone pinned to UTC so timestamp semantics are cluster-invariant.
- Shuffle partitions default from the local core count but AQE coalesces; on a
  real cluster this should be set ~2-3x total executor cores via
  ``spark.sql.shuffle.partitions`` at submit time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "data-pipeline-ine-spark"


def default_parallelism() -> int:
    """Local core budget: $SPARK_GRAFT_CPUS, else all cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) the engine's SparkSession.

    ``master=None`` respects an externally-provided master (spark-submit /
    cluster mode); locally it falls back to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cores = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER") and "spark.master" not in os.environ:
        builder = builder.master(f"local[{cores}]")

    conf = {
        # --- memory ----------------------------------------------------------
        # In local mode the single JVM defaults to a 1g heap regardless of
        # machine size — shuffles and broadcasts that are trivially fine on a
        # sized cluster executor die here first (observed: connected-components
        # broadcast build at 10x sf0.1). Only effective before JVM launch; a
        # cluster submit's --driver-memory takes precedence there.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        # A 160+-query session codegens 160+ unique plans; the JVM's default
        # 240 MB reserved code cache fills mid-run, the JIT disables itself,
        # and every LATER query runs partially interpreted (observed: the
        # alphabetical tail of bench.py degrading 2-4x with no code change).
        # Only effective before JVM launch, like driver.memory.
        # 1g (r12): raising spark.sql.codegen.cache.maxEntries keeps more
        # generated classes (and their JIT'd code) alive, so the 512m
        # reservation that sufficed for a 100-entry cache fills mid-sweep
        # again — the sweep-tail queries degrade 2-4x exactly as the
        # original note describes. Code cache is reserved virtual
        # address space, committed on use; 1g is nothing on any box that
        # can run Spark.
        "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
        # The generated-class cache (CodeGenerator.cache) holds 100 entries
        # by default; one composed-pipeline plan alone spans 150+
        # WholeStageCodegen units, so a many-query session (bench.py runs
        # 307) evicts and re-Janino-compiles its own spans on EVERY
        # invocation (measured r12: curation_v3 warm runs 7.4 s -> 5.4 s
        # from this alone). Driver-side and scale-independent — the cache
        # is keyed by generated source text, so repeated plan shapes hit
        # regardless of data volume. Bounded: entries are (source, class),
        # ~4k entries stay well inside the 8g driver heap.
        "spark.sql.codegen.cache.maxEntries": "4096",
        # --- optimizer / execution -----------------------------------------
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cores),
        # --- python boundary -----------------------------------------------
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # --- scan behavior --------------------------------------------------
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # --- semantics -------------------------------------------------------
        "spark.sql.session.timeZone": "UTC",
        # TIMESTAMP(NANOS) parquet is rejected by default (PARQUET_TYPE_ILLEGAL);
        # this surfaces such columns as raw int64 which the registry rebuilds to
        # NTZ (sources/registry.py). Set once here so a table scan is not a
        # hidden session-wide mutation.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Replaces the reference's delete-folder-then-rewrite idempotency
        # (pipeline_orchestrator.py:38-69) with partition-scoped overwrite.
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        # Keep driver results bounded; queries should aggregate, not collect.
        "spark.driver.maxResultSize": "4g",
        "spark.ui.enabled": os.environ.get("SPARK_UI_ENABLED", "false"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
