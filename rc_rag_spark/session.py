"""SparkSession factory.

Scale posture (tested on local[N], designed for a 1000-executor
cluster):
  - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
    dynamic broadcast-join demotion/promotion.
  - Arrow on: every pandas interchange (pandas UDFs, toPandas) is
    columnar/batched, never row-at-a-time pickling.
  - Session timezone pinned to UTC so event-time semantics are
    identical across driver, executors, and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # local single-JVM: the driver hosts all executor threads
    "spark.driver.memory": "24g",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    # dims (region/nation/supplier) stay far below this; at cluster
    # scale raise it rather than disabling broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
}


def build_session(
    app_name: str = "rc-rag-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) the engine session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_runtime(spark: SparkSession) -> None:
    """Apply runtime-settable engine conf to an externally-built session
    (the correctness driver hands us its own session)."""
    for key in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.execution.arrow.pyspark.enabled",
    ):
        try:
            spark.conf.set(key, DEFAULT_CONF[key])
        except Exception:  # conf may be static in some deployments
            pass
