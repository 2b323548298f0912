"""SparkSession factory tuned for this engine.

Local mode is single-JVM; on a real cluster the same settings hold except
memory, which comes from the cluster manager. AQE is on so skewed joins and
small shuffle partitions re-plan at runtime — essential at the 100 TB design
point, harmless locally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark-lightgbm-engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - Arrow on (vectorized pandas-UDF boundary; SURVEY.md §1 "row- vs
      column-oriented").
    - UTC session timezone (oracle comparability; parquet timestamps are
      instants).
    - shuffle partitions ~ cores locally; AQE coalesces at runtime so a
    - cluster deployment can leave this high.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate adds a redundant `size(arr) > 0` filter
        # under every explode and pushes it below exchanges with the array
        # expression fully re-inlined (no subexpression elimination in
        # filters) — for explodes of derived arrays like shingle hashes
        # this re-evaluates an O(len) inner array per element_at tap,
        # turning an O(len) projection into O(len²) per row: measured 266 s
        # → 1.9 s on the sf0.1 shingle explode. explode() already drops
        # empty arrays, so excluding the rule cannot change results.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_SCRATCH_ROOT: str | None = None


def scratch_dir(subdir: str) -> str:
    """Per-process scratch directory, removed at interpreter exit.

    Queries that materialize intermediate parquet (the s15 persisted-index
    build, the foreachBatch stream sink) write under a single process-wide
    root instead of a fresh ``mkdtemp`` per invocation — repeated runs
    (bench's min-of-3, the driver gate) overwrite the same path rather than
    accumulating orphaned directories, and the whole root is cleaned up
    when the process ends."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        import atexit
        import shutil
        import tempfile

        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="dls_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, True)
    path = os.path.join(_SCRATCH_ROOT, subdir)
    os.makedirs(path, exist_ok=True)
    return path


def apply_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (the driver owns its own session; we can only set dynamic confs).

    UTC matters: every timestamp-producing query is compared against a
    DuckDB oracle whose timestamps are UTC-naive.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    return spark
