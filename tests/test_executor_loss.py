"""Whole-executor death recovery (round 14, beyond the r13 brief).

fault_run kills ATTEMPTS; this kills a PROCESS: tools/executor_kill_run
SIGKILLs one of local-cluster's two executor JVMs while a query runs —
taking its running tasks, shuffle output, and Python workers — and the
job must complete with an identical hash, with the Master replacing
the dead executor.

The knob under test is checkpoints.py: in the default localCheckpoint
mode the checkpoint BLOCKS die with the executor and Spark aborts with
CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (measured — that failure is what
motivated the knob); with spark.rc_rag.checkpoint.reliable=true the
lineage truncation goes to durable storage and the kill is survivable.
At 100 TB on spot fleets, reliable mode is the correct deployment
posture for every iterative operator.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def kill_report():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "executor_kill_run.py"),
            "--sf-dir", "/root/testdata/sf0.1",
            "--queries", "q102_dedup_clusters",
            "--kill-after", "6",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert lines, f"no report: rc={proc.returncode}\n{proc.stderr[-4000:]}"
    return json.loads(lines[-1])


def test_executor_death_mid_query_is_survivable(kill_report):
    r = kill_report["queries"]["q102_dedup_clusters"]
    assert r["match"], r
    assert r["killed_pid"], "no executor was killed — vacuous pass"
    assert r["replaced"], "the Master never replaced the dead executor"


def test_kill_landed_while_query_was_running(kill_report):
    assert kill_report["kill_landed_mid_flight"], kill_report


@pytest.fixture(scope="module")
def decommission_report():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "executor_kill_run.py"),
            "--sf-dir", "/root/testdata/sf0.1",
            "--queries", "q102_dedup_clusters",
            "--kill-after", "6",
            "--mode", "decommission",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert lines, f"no report: rc={proc.returncode}\n{proc.stderr[-4000:]}"
    return json.loads(lines[-1])


def test_graceful_decommission_survives_default_checkpoint_mode(
    decommission_report,
):
    """SIGPWR (the spot-instance scale-down path): the decommissioning
    executor migrates its RDD + shuffle blocks to survivors before
    exiting, so even DEFAULT localCheckpoint mode completes with an
    identical hash — the complement of the hard-kill test, which
    needs the reliable knob."""
    assert decommission_report["mode"] == "decommission"
    r = decommission_report["queries"]["q102_dedup_clusters"]
    assert r["match"], r
    assert r["killed_pid"], "no executor was decommissioned"
    assert decommission_report["kill_landed_mid_flight"]


@pytest.fixture(scope="module")
def streaming_kill_report():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "executor_kill_run.py"),
            "--streaming",
            "--mode", "kill",
            "--kill-after", "8",
            "--sf-dir", "/root/testdata/sf0.01",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert lines, f"no report: rc={proc.returncode}\n{proc.stderr[-4000:]}"
    return json.loads(lines[-1])


def test_stateful_stream_survives_executor_death(streaming_kill_report):
    """SIGKILL an executor mid-stream: the state store's contents live
    on executors but checkpoint to the shared location, so the
    replacement executor reloads state and the final per-user totals
    must equal the batch twin — exactly-once across a PROCESS death
    inside a running stateful stream."""
    s = streaming_kill_report["streaming"]
    assert s["match"], s
    assert s["killed_pid"] and s["mid_flight"], s
