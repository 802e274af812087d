"""Per-query executor-resource measurement (round 15, VERDICT r14 #2).

The plan-regression guard counts plan SHAPES (exchanges, join
strategies) but not BYTES: a kernel change that doubles shuffle
volume behind an unchanged plan shape sails through it. This module
reads Spark's always-on AppStatusStore (populated by the
AppStatusListener regardless of ``spark.ui.enabled``) and attributes
stage-level IO to a measured block by snapshot-diffing stage
(id, attempt) pairs — the same numbers the UI's REST API serves, but
available in every session including the UI-less test fixture.

At 100 TB these are the numbers that decide feasibility: shuffle
read/write bytes are the cluster fabric cost, spills mark partitions
that outgrew executor memory, and peak execution memory bounds the
executor size the job needs. tools/resource_probe.py commits them
per bench anchor (RESOURCES.md) and tests/test_evidence.py ratchets
them, mirroring the plan guard's docstring escape hatch
(``resource-change:`` with explicit byte caps).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


#: metric name -> v1.StageData accessor; sums over the block's stages
_SUM_FIELDS = {
    "input_bytes": "inputBytes",
    "output_bytes": "outputBytes",
    "shuffle_read_bytes": "shuffleReadBytes",
    "shuffle_write_bytes": "shuffleWriteBytes",
    "disk_spill_bytes": "diskBytesSpilled",
    "memory_spill_bytes": "memoryBytesSpilled",
}
#: max over stages — a per-stage high-water mark, not additive
_MAX_FIELDS = {"peak_execution_memory": "peakExecutionMemory"}

METRIC_NAMES = tuple(_SUM_FIELDS) + tuple(_MAX_FIELDS) + ("n_stages",)


@dataclass
class StageMetrics:
    values: dict[str, int] = field(
        default_factory=lambda: {m: 0 for m in METRIC_NAMES}
    )

    def __getitem__(self, k: str) -> int:
        return self.values[k]

    def as_dict(self) -> dict[str, int]:
        return dict(self.values)


class StageMetricsCollector:
    """Snapshot-diff collector over the driver's AppStatusStore."""

    def __init__(self, spark):
        self._spark = spark
        sc = spark.sparkContext
        jvm = sc._gateway.jvm
        self._store = sc._jsc.sc().statusStore()
        # Spark 4 AppStatusStore.stageList(statuses, details,
        # withSummaries, unsortedQuantiles, taskStatus) — py4j needs
        # every default spelled out.
        self._args = (
            jvm.java.util.ArrayList(),
            False,
            False,
            sc._gateway.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        )

    def _stages(self) -> dict[tuple[int, int], object]:
        it = self._store.stageList(*self._args).iterator()
        out = {}
        while it.hasNext():
            s = it.next()
            out[(s.stageId(), s.attemptId())] = s
        return out

    def snapshot(self) -> set[tuple[int, int]]:
        return set(self._stages())

    def diff(
        self, before: set[tuple[int, int]], settle_sec: float = 0.3
    ) -> StageMetrics:
        """Metrics of every stage that appeared since ``before``.

        The status listener is asynchronous; a short settle window
        lets the final stage-completed events land before reading."""
        if settle_sec:
            time.sleep(settle_sec)
        m = StageMetrics()
        vals = m.values
        for key, s in self._stages().items():
            if key in before:
                continue
            vals["n_stages"] += 1
            for name, accessor in _SUM_FIELDS.items():
                vals[name] += getattr(s, accessor)()
            for name, accessor in _MAX_FIELDS.items():
                vals[name] = max(vals[name], getattr(s, accessor)())
        return m

    def measure(self, fn) -> tuple[object, StageMetrics]:
        """Run ``fn()`` and return (its result, the block's metrics)."""
        before = self.snapshot()
        result = fn()
        return result, self.diff(before)
