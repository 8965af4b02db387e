"""SparkSession factory tuned for this engine.

Scale posture: the same builder is used by tests (local[*]) and by
spark-submit on a real cluster — only master/partition counts differ.
AQE is on (runtime re-plan + skew-join splitting), Arrow is on (every
Python crossing is a vectorized pandas UDF), and shuffle partitions
default to the local core count so local runs don't create thousands of
tiny tasks while cluster runs can override via --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "nominatimwrapper_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default conf.

    ``master=None`` defers to spark-submit / an existing session: when
    neither the caller nor $SPARK_MASTER names a master, ``.master()`` is
    NOT set at all, so a ``spark-submit --master yarn`` submit conf wins
    (calling ``.master()`` here would silently override it back to
    local). Standalone ``python`` runs fall back to local[N]. Tests pass
    ``local[N]`` explicitly.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    # spark-submit launches the driver JVM first and hands python a gateway;
    # its presence means a submit conf (--master et al.) exists and must win
    submitted = (
        "PYSPARK_GATEWAY_PORT" in os.environ or "PYSPARK_SUBMIT_ARGS" in os.environ
    )
    if master is None:
        master = os.environ.get("SPARK_MASTER")
        if master is None and not submitted:
            master = f"local[{cpus}]"  # plain `python` run, no submit conf
    if shuffle_partitions is None and master is not None:
        # only size shuffles off the local core count when WE chose a local
        # master. In the deferred-master path (spark-submit / SPARK_MASTER
        # handled by the submit conf) the driver's cpu_count says nothing
        # about executor cores — leave the conf unset so the cluster-level
        # default / --conf spark.sql.shuffle.partitions wins, with an env
        # escape hatch for images that want to pin it anyway.
        m = master
        n = m[m.find("[") + 1 : m.find("]")] if "[" in m else cpus
        shuffle_partitions = (os.cpu_count() or 8) if n == "*" else int(n)
    if shuffle_partitions is None:
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        shuffle_partitions = int(env_sp) if env_sp else None

    builder = (
        SparkSession.builder
        .appName(app_name)
        # runtime re-planning: broadcast-join conversion, skew-join splitting,
        # partition coalescing — all load-bearing at 100 TB
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # lz4 on cached/checkpointed blocks: the cascade materializes the
        # input once per run and rescans it for dedup + fan-back; compressed
        # blocks trade per-core CPU (scales with executors) for block-store/
        # memory-bus bandwidth (shared). Measured: +8% at 2 cores, +18% at
        # 8 cores on the 8M-page flagship (BENCH.md)
        .config("spark.rdd.compress", "true")
        # all Python UDFs in this engine are pandas UDFs — Arrow transfer only
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # session TZ pinned so timestamp semantics match the DuckDB oracle
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
