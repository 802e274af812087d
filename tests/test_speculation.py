"""Speculative-execution determinism (VERDICT r13 next-round #2).

Two halves, because genuine scheduler speculation is PHYSICALLY
IMPOSSIBLE on one machine — Spark refuses to place a speculative copy
on a host that already runs an attempt of the task, and probes with
every gate disabled (quantile 0.1, multiplier 1.01, efficiency off,
hard 1s duration threshold, 12s straggler) produced zero speculative
launches (tools/specul_run.py docstring):

1. STRAGGLER half (this file, via tools/specul_run.py under
   local-cluster with spark.speculation=true): faultinject's
   ``delay=`` mode stalls the first attempt of partition 0 of every
   engine Python kernel. Results must be hash-identical to the clean
   run — a slow-but-alive task changes nothing, and the speculation
   machinery being ARMED changes nothing.
2. RACE half (tests/test_pyds.py::test_*_duplicate_attempt_race_*):
   two genuinely concurrent live attempts of the same write task
   driven against the 2PC writer at the commit-protocol level — the
   exact interleaving a speculative duplicate produces.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("RC_RAG_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def specul_report():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "specul_run.py"),
            "--sf-dir", SF_DIR,
            "--queries", "q105_trimmed_mean,q222_cdc_chunking",
            "--writer",
            "--streaming",
            "--delay-ms", "2500",
        ],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert lines, f"no report: rc={proc.returncode}\n{proc.stderr[-4000:]}"
    return json.loads(lines[-1])


def test_straggler_mode_leaves_query_hashes_identical(specul_report):
    assert "failures" not in specul_report, specul_report.get("failures")
    bad = {
        n: r
        for n, r in specul_report["queries"].items()
        if not r["match"]
    }
    assert not bad, f"straggler changed results: {bad}"


def test_straggler_2pc_writer_exactly_once(specul_report):
    w = specul_report["writer"]
    assert w["match"], w
    assert w["manifest_rows"] == 5000
    assert w["manifest_files"] == 4
    assert w["attempts"] >= 1, "straggler hook never fired in the writer"


def test_straggler_streaming_totals_match_batch_twin(specul_report):
    s = specul_report["streaming"]
    assert s["match"], s
    assert s["attempts"] > 0, "straggler hook never fired in the stream"
