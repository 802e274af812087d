"""Checkpoint durability knob (round 14, found by the executor-kill
harness).

Iterative operators (min-label propagation, fixed-point fits, greedy
selection loops) and materialize-once stages truncate lineage with
``localCheckpoint`` — blocks live on EXECUTORS, fast and retry-safe
(task retries recompute from the checkpoint, which survives because
only an ATTEMPT died). But kill the EXECUTOR and the blocks are gone
with nothing to recompute from: Spark aborts the job with
CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (measured: SIGKILL of one
local-cluster executor mid-q102, tools/executor_kill_run.py). On a
1000-node run with spot preemption that is a routine event, not a
corner case.

So durability is a DEPLOYMENT property, not a per-operator choice:

- default (unset / "false"): ``localCheckpoint`` — the single-box /
  reliable-fleet fast path; zero behavior change.
- ``spark.rc_rag.checkpoint.reliable=true``: ``checkpoint`` to the
  fault-tolerant checkpoint dir (``spark.rc_rag.checkpoint.dir`` or
  ``sc.setCheckpointDir``'s current value; at 100 TB this is HDFS/S3,
  shared by every executor) — executor loss recomputes from durable
  storage and the job finishes.

Call sites use ``df.transform(ckpt)`` / ``df.transform(ckpt_lazy)``
so the chain shape stays declarative.
"""

from __future__ import annotations

import tempfile
import warnings

from pyspark.sql import DataFrame

#: Reliable-mode deployments should also set
#: ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (a
#: SparkContext-creation-time conf — it cannot be flipped after the
#: session exists, so it lives in session.DEFAULT_CONF rather than
#: here). Without it, every iteration of a loop that checkpoints
#: (dedup_clusters, k-means, BPE induction, greedy selection) leaves
#: its superseded checkpoint directory on HDFS/S3 forever —
#: ``localCheckpoint`` blocks are freed when the RDD reference drops,
#: but RELIABLE checkpoint files are only reclaimed by the
#: ContextCleaner, and only when that conf is on.
CLEAN_CHECKPOINTS_CONF = "spark.cleaner.referenceTracking.cleanCheckpoints"


def _reliable(spark) -> bool:
    try:
        return (
            spark.conf.get(
                "spark.rc_rag.checkpoint.reliable", "false"
            ).lower()
            == "true"
        )
    except Exception:  # noqa: BLE001 — static-conf-only deployments
        return False


def _ensure_checkpoint_dir(spark) -> None:
    sc = spark.sparkContext
    if not sc._jsc.sc().getCheckpointDir().isEmpty():
        return
    d = spark.conf.get("spark.rc_rag.checkpoint.dir", None)
    if d is None:
        # A driver-local tmpdir is only a valid checkpoint root when
        # every executor shares the driver's filesystem — i.e. local /
        # local-cluster masters. On a real cluster each executor would
        # write its partitions to its OWN local disk, and recovery
        # after executor loss (the exact scenario reliable mode exists
        # for) would read garbage or fail. Refuse rather than silently
        # degrade the durability the caller explicitly asked for.
        master = sc.master or ""
        if not master.startswith(("local", "local-cluster")):
            raise ValueError(
                "spark.rc_rag.checkpoint.reliable=true on a non-local "
                f"master ({master!r}) requires a SHARED checkpoint dir: "
                "set spark.rc_rag.checkpoint.dir (or call "
                "sc.setCheckpointDir) to an HDFS/S3/NFS path visible to "
                "every executor. A driver-local tempdir would not "
                "survive executor loss."
            )
        d = tempfile.mkdtemp(prefix="rc_rag_reliable_ckpt_")
        warnings.warn(
            f"reliable checkpointing is using driver-local tempdir {d}; "
            "fine for local masters, set spark.rc_rag.checkpoint.dir "
            "to shared storage on a real cluster",
            stacklevel=3,
        )
    sc.setCheckpointDir(d)


def checkpoint_df(df: DataFrame, eager: bool = True) -> DataFrame:
    """Lineage-truncating checkpoint honoring the durability conf."""
    spark = df.sparkSession
    if _reliable(spark):
        _ensure_checkpoint_dir(spark)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def ckpt(df: DataFrame) -> DataFrame:
    """``df.transform(ckpt)`` — eager checkpoint, durability-aware."""
    return checkpoint_df(df, eager=True)


def ckpt_lazy(df: DataFrame) -> DataFrame:
    """``df.transform(ckpt_lazy)`` — lazy variant."""
    return checkpoint_df(df, eager=False)
