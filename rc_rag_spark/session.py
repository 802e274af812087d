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
    # Reliable-mode checkpoints (spark.rc_rag.checkpoint.reliable) are
    # written to durable storage; without this the ContextCleaner never
    # reclaims superseded checkpoint dirs, so iterative loops leak
    # unbounded HDFS/S3 data. Creation-time-only conf — must be here,
    # not set at runtime (see rc_rag_spark/checkpoints.py).
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
}


_PKG_ZIP: str | None = None
_SHIPPED_CONTEXTS: set[str] = set()  # keyed by applicationId (id() can be reused)


def _package_zip() -> str:
    """Zip this package so executors can import it regardless of the
    driver process's cwd/sys.path (UDF closures unpickle module refs
    on the workers)."""
    global _PKG_ZIP
    if _PKG_ZIP is None:
        import tempfile
        import zipfile

        import rc_rag_spark

        pkg_dir = os.path.dirname(os.path.abspath(rc_rag_spark.__file__))
        zpath = os.path.join(tempfile.gettempdir(), "rc_rag_spark_pkg.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        _PKG_ZIP = zpath
    return _PKG_ZIP


def _scrub_stale_includes() -> None:
    """Drop DEAD zip entries a previous (stopped) session's addPyFile
    left on the driver's sys.path. sc.addPyFile inserts the zip's
    userFiles copy into sys.path; stopping the session deletes the
    userFiles dir but not the sys.path entry, and the CACHED
    zipimporter in sys.path_importer_cache then raises
    FileNotFoundError into every later import scan — breaking any
    process that cycles sessions (e.g. the local-vs-local-cluster
    comparison harness). Found by the r14 multi-JVM sweep."""
    import sys

    stale = [
        p
        for p in sys.path
        if p.endswith(".zip") and "userFiles-" in p and not os.path.exists(p)
    ]
    for p in stale:
        sys.path.remove(p)
        sys.path_importer_cache.pop(p, None)


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make rc_rag_spark importable on executor Python workers, and —
    when the real protobuf runtime is absent — ship the vendored
    protobuf shim so transformWithStateInPandas' state-server client
    can import google.protobuf in the workers."""
    try:
        sc = spark.sparkContext
        app_id = sc.applicationId
        if app_id in _SHIPPED_CONTEXTS:
            return
        _scrub_stale_includes()
        sc.addPyFile(_package_zip())
        from rc_rag_spark.vendor import ensure_protobuf_shim

        ensure_protobuf_shim(spark)
        _SHIPPED_CONTEXTS.add(app_id)
    except Exception:
        pass


def build_session(
    app_name: str = "rc-rag-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) the engine session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    """
    # must run BEFORE any import scan (pythonpath_with_shim calls
    # find_spec): a previous stopped session's dead addPyFile zips
    # poison sys.path_importer_cache
    _scrub_stale_includes()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(DEFAULT_CONF)
    # Protobuf shim for transformWithStateInPandas: its DRIVER-side
    # Python worker inherits PYTHONPATH from the function env / JVM
    # env (it never reads addPyFile includes), so the path must be in
    # place BEFORE the JVM launches. No-op when real protobuf exists.
    from rc_rag_spark.vendor import pythonpath_with_shim

    shim_pp = pythonpath_with_shim()
    if shim_pp is not None:
        os.environ["PYTHONPATH"] = shim_pp
        conf["spark.executorEnv.PYTHONPATH"] = shim_pp
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ensure_worker_imports(spark)
    return spark


def tune_runtime(spark: SparkSession) -> None:
    """Apply runtime-settable engine conf to an externally-built session
    (the correctness driver hands us its own session)."""
    ensure_worker_imports(spark)
    for key in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.execution.arrow.pyspark.enabled",
    ):
        try:
            spark.conf.set(key, DEFAULT_CONF[key])
        except Exception:  # conf may be static in some deployments
            pass
