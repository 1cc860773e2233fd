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
        # AQE sort-merge -> shuffled-hash conversion (guide §3.1): when
        # every post-shuffle build partition is under this threshold, the
        # SMJ's two per-partition sorts are replaced by an in-memory hash
        # build. Size-gated at runtime by AQE (unlike the blanket
        # preferSortMergeJoin=false), so the build is bounded by one
        # advisory-size shuffle partition. Caveat (r15 ADVICE): the
        # threshold compares COMPRESSED map-output bytes; the deserialized
        # hash relation can be several times 64 MB, SHJ's build side
        # cannot spill like SMJ, and N concurrent tasks multiply the
        # peak — on memory-starved executors set
        # SPARK_GRAFT_SHJ_THRESHOLD=0 to keep SMJ's graceful spill
        # (multiplier math in SCALING.md). Measured
        # (r15 ABAB at sf1.0, scripts/ab_shj.py): join_revenue_by_nation
        # 32.4/31.6 -> 19.7/22.9 CPU s/run (-34%), q3_shipping_priority
        # 18.8/23.4 -> 14.4/15.4 (-26%), shuffle bytes byte-identical.
        # Default 0 in Spark (off); env-overridable for deployments that
        # want SMJ's graceful spill on memory-starved executors.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "64m"),
        )
        # ANSI SQL mode, pinned explicitly (r13 VERDICT order 2): the
        # money-sum contract (queries.rev_e4 / sum_money) promises that a
        # long-sum overflow RAISES rather than silently wrapping to a
        # plausible-looking wrong total. Spark 4.x defaults ansi=true, but
        # the guarantee must not ride on a default a deployment (or a
        # future version bump) can flip.
        .config("spark.sql.ansi.enabled", "true")
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
    # single-node box that is RAM-backed tmpfs. Measured effect (round-8
    # controlled A/B, scripts/ab_local_dir.py, fresh JVM per placement):
    # a modest, consistent single-digit-% win — overlay/tmpfs executor
    # runtime 1.00-1.09x across shuffle-heavy and scan-only queries at
    # MB-scale shuffle volumes (the page cache absorbs writes this
    # small; the earlier ~75 vs ~30 ms/task figure came from a stage
    # with pathologically many near-empty partitions, not the typical
    # path). Kept because it is free on this box and directionally
    # matches pointing spark.local.dir at local NVMe on a real cluster;
    # at real per-task shuffle sizes the placement matters far more. The
    # env override (SPARK_GRAFT_LOCAL_DIR) restores any other placement.
    # Guarded by FREE SPACE, not mere existence (round-8, per r7 ADVICE):
    # containers commonly mount a 64 MB /dev/shm, where shuffle data
    # would hit ENOSPC mid-job — tmpfs is used only when it has generous
    # headroom over anything the local suites shuffle (bench SFs shuffle
    # MBs; this box's /dev/shm is 126 GiB). Everyone else keeps Spark's
    # default (java.io.tmpdir), which at least fails with disk semantics.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 8 * 1024**3:  # >= 8 GiB free
                local_dir = "/dev/shm/spark-local"
        except OSError:
            pass
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
