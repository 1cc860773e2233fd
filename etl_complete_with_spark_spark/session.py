"""SparkSession factory.

Replaces the reference's proprietary ``SnessSpark`` wrapper
(reference: resync_date/etls/carga_date.py:30, shared_etls/etls/load_utils.py:38)
with a plain ``SparkSession.builder`` configured for:

- AQE (adaptive query execution) so shuffle partition counts, skew joins
  and join strategies re-plan at runtime — essential at 100 TB where
  static ``spark.sql.shuffle.partitions`` is always wrong for someone.
- Arrow-batched Python<->JVM transfer for the Pandas-UDF operators.
- UTC session timezone so results are oracle-comparable (DuckDB is
  UTC-naive).

On a real cluster the ``master`` and memory settings come from
spark-submit / the cluster manager; the env overrides here only matter
for local runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Local-mode thread count (SPARK_GRAFT_CPUS env, else all cores)."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "etl-complete-with-spark-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` defaults to the local thread count — with AQE
    coalescing enabled the exact number matters little locally, and on a
    cluster AQE re-derives it from runtime statistics anyway.
    """
    cpus = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Parquet TIMESTAMP(NANOS) (e.g. pandas-written event data) is
        # unreadable by Spark's vectorized reader; read as int64 nanos and
        # let the loader convert to microsecond timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # Shuffle/spill files on the fastest local storage available. On this
    # single-node box that is RAM-backed tmpfs: the per-task shuffle-file
    # overhead (create + write + fsync of data/index files) measured
    # ~75 ms/task on the root overlay FS vs ~30 ms on /dev/shm — 2.5x, and
    # it is THE dominant executor-runtime cost for multi-stage queries
    # over dimension-sized data. On a real cluster this maps to the
    # standard practice of pointing spark.local.dir at local NVMe; the
    # env override (SPARK_GRAFT_LOCAL_DIR) restores any other placement.
    # Spill safety: bench SFs shuffle MBs against a 126 GiB tmpfs.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
