"""Conf-gated task-fault injection for retry-determinism proofs.

At 100 TB, task retries are a certainty (spot-instance preemption,
executor OOM, shuffle-fetch failures), and Spark's recovery contract
only yields correct results if every operator is DETERMINISTIC per
partition — same input split, same output, on every attempt. The
engine is designed RNG-free (seeded md5/xxhash orderings, no
Date.now-style entropy, Arrow kernels that are pure functions of
their batch), and this module is how that property is PROVEN rather
than assumed: tests/test_fault_injection.py runs the bench anchors,
the mock-LLM pipeline, and a live stateful stream with a fault
injected into the first attempt of a chosen partition of every
Python kernel, under ``spark.task.maxFailures > 1``, and asserts the
output hash is identical to the clean run.

Mechanism: every engine Python kernel (mapInPandas / applyInPandas /
applyInPandasWithState / pandas UDF bodies) calls
``maybe_inject_fault("<kernel-name>")`` on entry. The call is a
no-op unless the driver armed injection via the task-local property
``rc_rag.faultinject`` (local properties propagate to tasks — the
one conf channel an executor-side kernel can read without shipping
closures). When armed, the FIRST attempt (TaskContext.attemptNumber
== 0) of the target partition raises InjectedTaskFailure; the
retried attempt passes, so the job completes iff Spark's retry
machinery + the engine's determinism hold. Firing is recorded by
appending to a marker file named in the spec (local/test use), so a
test can assert the fault actually triggered instead of passing
vacuously on a pure-JVM plan.

Production cost: one TaskContext.get() + getLocalProperty per kernel
invocation when DISARMED — nanoseconds against an Arrow batch.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

PROP = "rc_rag.faultinject"


class InjectedTaskFailure(RuntimeError):
    """The deliberate first-attempt failure raised by an armed
    maybe_inject_fault — never anything else, so a test that sees a
    different exception knows the engine (not the injector) broke."""


def maybe_inject_fault(kernel: str = "") -> None:
    """Call on entry of every Python kernel. No-op unless armed via
    the ``rc_rag.faultinject`` task-local property.

    Two injection modes, selected by the spec:

    - ``partition=<n>[;marker=<path>]`` (RAISE mode): the first
      attempt of partition ``n`` of EVERY armed kernel stage raises
      InjectedTaskFailure (recording the firing in ``marker``); the
      retried attempt passes. ``partition=-1`` fails the first
      attempt of ALL partitions — the full-wave shape of an entire
      executor's running tasks dying at once.

    - ``partition=<n>;delay=<ms>[;marker=<path>]`` (STRAGGLER mode,
      VERDICT r13 #2): the first attempt of partition ``n`` SLEEPS
      ``ms`` milliseconds instead of raising — long enough, under
      ``spark.speculation=true``, for the scheduler to launch a live
      DUPLICATE attempt of the same task while attempt 0 is still
      running. That is the race retry-mode can never create (retry
      implies the first attempt is already dead), and it is exactly
      the shape that corrupts non-idempotent commit paths at
      100-node scale. In straggler mode EVERY attempt of the target
      partition logs ``attempt=<k>`` to the marker, so a test can
      assert a speculative duplicate (attempt>0, with no failure to
      explain it) genuinely ran."""
    try:
        from pyspark import TaskContext

        tc = TaskContext.get()
    except Exception:  # noqa: BLE001 — not on an executor
        return
    if tc is None:
        return
    spec = tc.getLocalProperty(PROP)
    if not spec:
        return
    target, marker, delay_ms = -1, None, None
    for part in spec.split(";"):
        k, _, v = part.partition("=")
        if k == "partition":
            target = int(v)
        elif k == "marker":
            marker = v
        elif k == "delay":
            delay_ms = int(v)
    if target != -1 and tc.partitionId() != target:
        return

    def record(line: str) -> None:
        # append is atomic enough for a firing count; never let the
        # marker itself break the injection path
        if marker:
            try:
                with open(marker, "a") as fh:
                    fh.write(line + "\n")
            except OSError:
                pass

    if delay_ms is not None:
        # straggler mode: all attempts log; attempt 0 stalls
        record(
            f"{kernel}\tstage={tc.stageId()}"
            f"\tpartition={tc.partitionId()}"
            f"\tattempt={tc.attemptNumber()}"
        )
        if tc.attemptNumber() == 0:
            import time

            time.sleep(delay_ms / 1000.0)
        return
    if tc.attemptNumber() != 0:
        return
    record(
        f"{kernel}\tstage={tc.stageId()}"
        f"\tpartition={tc.partitionId()}"
    )
    raise InjectedTaskFailure(
        f"injected first-attempt failure: kernel={kernel or '?'} "
        f"stage={tc.stageId()} partition={tc.partitionId()}"
    )


@contextmanager
def inject_task_failures(
    spark,
    partition: int = 0,
    marker: str | None = None,
    delay_ms: int | None = None,
):
    """Arm fault injection for jobs submitted by the calling thread
    while the context is open (local properties are per-thread and
    inherited by that thread's jobs).

    RAISE mode (default) requires the session to run with
    ``spark.task.maxFailures >= 2`` (local master
    ``local[N, maxFailures]``; cluster masters default to 4) or every
    armed job will fail terminally on the injected first attempt.

    STRAGGLER mode (``delay_ms`` set) makes the target partition's
    first attempt sleep instead of raise — combine with
    ``spark.speculation=true`` to force a live duplicate-attempt race
    (tools/specul_run.py)."""
    spec = f"partition={partition}"
    if delay_ms is not None:
        spec += f";delay={int(delay_ms)}"
    if marker:
        spec += f";marker={marker}"
    sc = spark.sparkContext
    old = sc.getLocalProperty(PROP)
    sc.setLocalProperty(PROP, spec)
    try:
        yield
    finally:
        sc.setLocalProperty(PROP, old if old else None)


def marker_firings(marker: str) -> list[str]:
    """The kernels that actually fired, one line per injected raise
    (empty if the plan had no armed Python kernel — a test asserting
    non-empty proves the injection was exercised, not skipped)."""
    if not os.path.exists(marker):
        return []
    with open(marker) as fh:
        return [ln.strip() for ln in fh if ln.strip()]
