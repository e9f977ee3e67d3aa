"""SparkSession construction tuned for the link-graph engine.

Local-mode defaults mirror the sandbox (local[32], 128 GiB); on a real
cluster the same builder is used via ``spark-submit --py-files`` with
master/memory supplied externally. All engine code is agnostic to the
master — scale comes from partitioning choices, not session config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "accelerating_tc_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    - AQE on (runtime coalescing + skew-join splitting),
    - Arrow on (every custom kernel is a vectorized pandas UDF),
    - shuffle partitions sized to cores (not the 200 default),
    - UTC session timezone (oracle comparisons against DuckDB).
    """
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or cores
    # local[N, 4]: allow 4 task attempts, the DEFAULT on a real cluster
    # (spark.task.maxFailures). Plain local[N] uses maxFailures=1, so one
    # transient Python-worker crash aborts a whole multi-minute job — on the
    # 24M-edge scaling fixture a single intermittent worker death (observed
    # ~1 per hour of sustained Arrow-kernel load on this sandbox) cost an
    # entire measurement session. A crashed task retries, same as production.
    builder = (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores},4]")
        )
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Whole-stage-codegen class cache (static conf, default 100
        # entries): a multi-query session (bench suite, notebook) cycles
        # through far more generated stages than that, so each query's
        # classes were evicted between passes and recompiled every time
        # (~50-150 ms per stage, serial on the driver). 1000 entries keeps
        # every suite stage resident for ~tens of MB of metaspace —
        # scale-independent (driver-side JVM cost only).
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        # A crashed Python worker (segfault/OOM-kill) otherwise dies
        # silently; with faulthandler the executor log carries the native
        # traceback — required to diagnose intermittent kernel crashes.
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Batch engine: throughput GC beats G1's pause targets here
        # (measured: -17% on the blocked TC at 32 threads).
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # Shuffle files of finished jobs are only removed when their RDDs
        # get JVM-GC'd; with tmpfs-backed local dirs stale files eat RAM and
        # progressively slow successive jobs — force frequent cleanups.
        .config("spark.cleaner.periodicGC.interval", "45s")
        # Shuffle spill dir: tmpfs when available (the sandbox's /tmp is
        # spinning-disk backed and serializes high-parallelism shuffles; on
        # a real cluster this is the executors' local SSDs). Tradeoff:
        # tmpfs spill consumes RAM — set SPARK_GRAFT_LOCAL_DIR to a disk
        # path for shuffle volumes near memory size. The per-PID suffix
        # keeps concurrent sessions from sharing (and deleting) state.
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_GRAFT_LOCAL_DIR",
                f"/dev/shm/spark_graft_local_{os.getpid()}"
                if os.path.isdir("/dev/shm")
                else "/tmp",
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Register the driver-provided parquet tables as temp views and return them.

    Mirrors the DuckDB oracle environment, where the same tables are
    pre-registered views.
    """
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for name in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
