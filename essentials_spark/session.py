"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same settings (AQE, skew join,
Arrow, explicit shuffle partitioning) are the ones that matter on a
1000-executor cluster — shuffle partitions and maxPartitionBytes are
overridable via env for cluster submission with spark-submit
--py-files (see cli.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "essentials_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for iterative graph work.

    - AQE + skew-join: runtime re-planning is the backstop for hub-vertex
      skew (our explicit mitigation is salting, see engine/skew.py).
    - Arrow: all pandas-UDF kernels move columns in Arrow batches.
    - UTC session TZ: keeps timestamps comparable with DuckDB oracles.
    - Low parallelism knobs are env-overridable so bench.py can run the
      identical job at local[8] vs local[32] for scaling evidence.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BROADCAST_BYTES", str(64 * 1024 * 1024)),
        )
        # iterative workloads leak localCheckpoint blocks + shuffle files
        # until a driver GC lets ContextCleaner reap them; default
        # periodicGC is 30min — far too lazy for superstep loops
        .config("spark.cleaner.periodicGC.interval", "1min")
    )
    # env-driven overrides (cluster submission / A-B measurement):
    # SPARK_GRAFT_EXTRA_CONF is a JSON object of spark confs applied
    # after the defaults, before the caller's extra_conf
    env_extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_extra:
        import json

        for k, v in json.loads(env_extra).items():
            builder = builder.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
