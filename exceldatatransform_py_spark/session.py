"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32
threads); the same configs are the right defaults on a real cluster:
AQE for runtime re-planning (skew joins, partition coalescing), Arrow
for any Pandas-UDF exchange, UTC session timezone so date semantics
are stable across engines (the DuckDB oracle is timezone-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "exceldatatransform_py_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    On a real cluster, drop the ``master`` override via the
    ``SPARK_MASTER`` env var and size ``shuffle_partitions`` to
    ~2-3× total executor cores.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime partition coalescing, skew-join splitting,
        # broadcast-join demotion/promotion from observed sizes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Stable date/time semantics (oracle comparisons are tz-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4's ICU-backed case mapping pays a ~250s one-time
        # static-init (CollationAwareUTF8String precomputes titlecase
        # tables on first lower()/upper()). JVM case mapping is
        # identical for the data handled here and starts instantly.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        # Arrow transfer for toPandas / pandas_udf exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Local mode: the driver is the only JVM; give it headroom.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g")
        )
        # Whole-stage-codegen classes run interpreted until the JIT
        # compiles them; with many distinct queries per session the
        # default compiler-thread pool backlogs and a big generated
        # method can stay interpreted for an entire single-task stage
        # (measured 16x slowdown). More JIT threads drain the queue —
        # but scale them with the core count, or several concurrent
        # bench JVMs (4 × local[8]) oversubscribe the box with
        # compiler threads alone (measured 3.8s → 33s on the same
        # query purely from 4 × 18 JIT threads).
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:CICompilerCount={max(2, min(18, cpus // 2 + 2))} "
            "-XX:ReservedCodeCacheSize=512m",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Deterministic parquet scans at small SF (fewer, stabler splits).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
