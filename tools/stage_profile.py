"""Per-stage wall/CPU attribution for one or more queries (round 16,
guide §1: decide whether time goes to shuffle read, executor compute,
scheduler delay, or the DRIVER — the UI is disabled in this sandbox,
so this reads the same AppStatusStore the UI would render).

For each query: one untimed cold pass (codegen/JIT), then a timed
warm pass. Prints every stage the warm pass ran — duration,
executor run/CPU time, shuffle read/write bytes, task count, call
site — plus the gap between wall time and the span covered by
stages, which is driver-side work (planning/analysis/collects).

    python tools/stage_profile.py q168_retrieval_gd_training [...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _opt(v):
    """Unwrap a scala Option / java Optional-ish value via py4j."""
    try:
        if v is None or v.isEmpty():
            return None
        return v.get()
    except Exception:
        return None


def _ms(dt) -> float | None:
    """java.util.Date -> epoch millis."""
    try:
        return float(dt.getTime())
    except Exception:
        return None


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return
    from rc_rag_spark.session import build_session
    import rc_rag_spark.queries as q

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="rc-rag-stage-profile",
        extra_conf={
            "spark.sql.shuffle.partitions": os.environ.get(
                "SPARK_GRAFT_SHUFFLE_PARTITIONS", "8"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    store = spark.sparkContext._jsc.sc().statusStore()
    from rc_rag_spark.metrics import StageMetricsCollector

    coll = StageMetricsCollector(spark)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        q.REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        spark.sparkContext.setJobDescription(f"profile-cold: {name}")
        cold = run(name)
        spark.sparkContext.setJobDescription(f"profile-warm: {name}")
        before = coll.snapshot()
        t_start = time.time() * 1000.0
        warm = run(name)
        t_end = time.time() * 1000.0
        time.sleep(0.3)
        stages = [
            (k, s) for k, s in coll._stages().items() if k not in before
        ]

        def subm(item):
            t = _ms(_opt(item[1].submissionTime()))
            return t if t is not None else 0.0

        stages.sort(key=subm)
        print(f"\n=== {name}: cold {cold:.3f}s warm {warm:.3f}s "
              f"({len(stages)} stages) ===")
        span = 0.0
        run_ms = 0.0
        print(f"{'stage':>6} {'dur_ms':>8} {'run_ms':>8} {'cpu_ms':>8} "
              f"{'tasks':>5} {'shR_kB':>8} {'shW_kB':>8}  name")
        for (sid, att), s in stages:
            t_sub = _ms(_opt(s.submissionTime()))
            t_done = _ms(_opt(s.completionTime()))
            dur = (t_done - t_sub) if t_sub and t_done else float("nan")
            span += dur if dur == dur else 0.0
            rt = s.executorRunTime()
            run_ms += rt
            print(
                f"{sid:>6} {dur:>8.0f} {rt:>8.0f} "
                f"{s.executorCpuTime() / 1e6:>8.0f} {s.numTasks():>5} "
                f"{s.shuffleReadBytes() / 1024:>8.1f} "
                f"{s.shuffleWriteBytes() / 1024:>8.1f}  "
                f"{s.name()[:70]}"
            )
        wall_ms = t_end - t_start
        print(f"wall {wall_ms:.0f} ms; sum(stage dur) {span:.0f} ms; "
              f"sum(executor run) {run_ms:.0f} ms; "
              f"driver-side gap ~{wall_ms - span:.0f} ms "
              f"(negative => stages overlapped)")


if __name__ == "__main__":
    main()
