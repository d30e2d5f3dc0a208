"""SparkSession factory with the engine's default tuning.

Defaults are chosen for the 100 TB design point and scale down to
local[32] tests: AQE on (runtime re-plan + skew-join handling),
Arrow enabled for the pandas-UDF fetch/parse stages, shuffle
partitions sized to the cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spider_man_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or
    ``local[*]``); on a real cluster pass ``None`` and configure via
    spark-submit instead — every setting here is also safe under
    multi-executor deployment.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 0
        except ValueError:
            n = 0
        shuffle_partitions = max(32, n or 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing of shuffle partitions + skew-join
        # splitting — critical for hot-domain skew at crawl scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce by data size, not by core count: crawl epochs run
        # many small-to-medium shuffles where per-task fixed cost
        # dominates; without this AQE keeps cores x partitions alive
        # and the epoch pays ~20 shuffles x P task overheads.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # no implicit broadcast joins: the engine's medium tables
        # (scheduled slice, seen deltas) flip into broadcasts under
        # AQE stats and get re-shipped to EVERY executor each epoch —
        # measured as the dominant stage at 8 executors.  Per-host
        # state (robots/session) is broadcast via explicit hints,
        # which ignore this threshold.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # Arrow for the vectorized fetch/parse/image UDFs.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Keep scan partitions bounded so a 100 TB frontier read
        # fans out instead of producing giant tasks.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    # shuffle scratch on tmpfs when available: local-mode shuffles are
    # disk-latency-bound at high thread counts (a real cluster gets
    # this from NVMe-local scratch per executor)
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
        # local-cluster workers IGNORE spark.local.dir and read
        # SPARK_LOCAL_DIRS from their (inherited) environment — without
        # this, multi-executor legs silently shuffle to the one shared
        # system disk while local mode uses tmpfs
        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
        # shuffle compression exists to save disk/network bandwidth;
        # with shuffle scratch on tmpfs there is neither, so lz4 is
        # pure CPU on both sides of every exchange (guide §2.3
        # "compression can be pure overhead": the 6 GB/epoch fetch
        # join measured 7.7 s -> 5.7 s with it off).  Parameterised:
        # SPARK_GRAFT_SHUFFLE_COMPRESS=1 forces it back on, and
        # disk-backed deployments (no tmpfs local dir) keep the
        # Spark default (on) via this branch not applying.
        comp_env = os.environ.get("SPARK_GRAFT_SHUFFLE_COMPRESS")
        compress = "false" if comp_env in (None, "0") else "true"
        builder = (
            builder.config("spark.shuffle.compress", compress)
            .config("spark.shuffle.spill.compress", compress)
        )
    if master.startswith("local-cluster"):
        # separate executor JVMs spawn their own Python workers, which
        # need this package on their path (the spark-submit --py-files
        # equivalent for the in-sandbox multi-executor mode)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = builder.config("spark.executorEnv.PYTHONPATH", repo_root)
        # local-cluster[n,c,mem] only caps the WORKER; executors would
        # otherwise run on the 1g default heap.  Size the executor to
        # the worker allowance minus headroom for the Python workers.
        try:
            parts = master.split("[")[1].rstrip("]").split(",")
            exec_cores = int(parts[1].strip())
            worker_mb = int(parts[2].strip())
            exec_mb = max(worker_mb - 1024, 1024)
            builder = builder.config("spark.executor.memory", f"{exec_mb}m")
            # each executor JVM otherwise sizes GC/netty/IO pools for
            # ALL host cores (availableProcessors): with N executors
            # per host that's N x oversubscription and measured ~5x
            # task-time inflation.  A real cluster manager does this
            # via cgroups; here the JVM flag is the equivalent.
            builder = builder.config(
                "spark.executor.extraJavaOptions",
                f"-XX:ActiveProcessorCount={exec_cores}",
            )
        except (IndexError, ValueError):
            pass
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
