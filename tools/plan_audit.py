"""Corpus-wide physical-plan audit: build every registered query's
executed plan and tabulate the operators that matter at 100 TB:
shuffles (Exchange), join strategies, sorts, whole-stage-codegen
coverage, cartesian products.

HONESTY NOTE on "plans only": most query builders are lazy, but some
legitimately launch Spark jobs while the plan is being CONSTRUCTED —
eager localCheckpoints that bound iterative lineage (q205/q208,
k-means/power-iteration steps), and driver-side seed/statistics
collects (e.g. q212's centroid draw). The audit measures this instead
of pretending it away: each query runs under its own job group, and
the `build jobs` column reports how many jobs its construction
actually submitted (0 = genuinely plan-only).

    python tools/plan_audit.py          # writes PLANS.md

The audit FAILS (exit 1) if ANY query's plan contains a
CartesianProduct — the same invariant tests/test_plans.py pins for
individual queries, enforced corpus-wide with no exceptions.
(Single-row scalar broadcasts attached via crossJoin(broadcast(...))
compile to BroadcastNestedLoopJoin, a different node, and are fine.)
"""

from __future__ import annotations

import datetime
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("RC_RAG_TEST_SF_DIR", "/root/testdata/sf0.001")

def main() -> None:
    import rc_rag_spark.queries as q
    from rc_rag_spark.session import build_session

    spark = build_session(app_name="rc-rag-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    rows = []
    cartesian_offenders = []
    n_eager_builders = 0
    for name in sorted(q.REGISTRY):
        spec = q.REGISTRY[name]
        try:
            sc.setJobGroup(f"audit:{name}", f"plan build for {name}")
            df = spec.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            # Count EXECUTION jobs only: every parquet read submits a
            # 1-task footer/schema-inference job ("parquet at ..."),
            # which is metadata access, not query execution.
            build_jobs = 0
            for jid in tracker.getJobIdsForGroup(f"audit:{name}"):
                ji = tracker.getJobInfo(jid)
                stage_names = [
                    si.name
                    for si in (
                        tracker.getStageInfo(s) for s in ji.stageIds
                    )
                    if si
                ]
                if stage_names and all(
                    n.startswith("parquet at ") for n in stage_names
                ):
                    continue
                build_jobs += 1
        except Exception as exc:  # noqa: BLE001
            rows.append((name, "-", "-", "-", "-", "-", "-", "-", "-",
                         f"plan error: {str(exc)[:60]}"))
            continue
        finally:
            sc.setJobGroup("", "")
        if build_jobs:
            n_eager_builders += 1
        n_exch = len(re.findall(r"Exchange hashpartitioning", plan))
        n_range = len(re.findall(r"Exchange rangepartitioning", plan))
        n_single = len(re.findall(r"Exchange SinglePartition", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_shj = len(re.findall(r"ShuffledHashJoin", plan))
        n_bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        n_cart = len(re.findall(r"CartesianProduct", plan))
        n_wsc = len(re.findall(r"WholeStageCodegen", plan))
        n_imr = len(re.findall(r"InMemoryTableScan", plan))
        if n_cart:
            cartesian_offenders.append(name)
        rows.append((
            name,
            f"{n_exch}+{n_range}r+{n_single}s",
            n_bhj, n_smj + n_shj, n_bnlj, n_cart, n_wsc, n_imr,
            build_jobs, "",
        ))

    lines = [
        "# PLANS — corpus-wide physical-plan audit",
        "",
        f"Generated {datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M} UTC "
        f"by `tools/plan_audit.py` over {SF_DIR}.",
        "",
        "Columns: hash-exchanges (+range +single-partition), broadcast",
        "hash joins, shuffle joins (SMJ+SHJ), broadcast nested loops",
        "(tolerated only for single-row scalar attaches), cartesian",
        "products (never tolerated), whole-stage-codegen spans,",
        "in-memory-cache scans, and `build jobs` — EXECUTION jobs the",
        "query builder itself submitted while constructing the plan",
        "(eager lineage checkpoints / driver-side seed collects; 0 =",
        "genuinely plan-only; 1-task parquet footer/schema-inference",
        "jobs are metadata access and excluded). NOTE: toString()",
        "re-prints a cached",
        "subtree at every InMemoryTableScan reference, so plans with",
        "IMR > 0 overstate raw exchange counts — each cached subtree",
        "executes its exchanges ONCE (q146's 70 printed exchanges are",
        "~7 executed).",
        "",
        "| query | exchanges | BHJ | shuffle-join | BNLJ | cartesian | WSC | IMR | build jobs | note |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")

    n_err = sum(1 for r in rows if r[-1])
    lines += [
        "",
        f"**{len(rows)} queries audited, "
        f"{len(cartesian_offenders)} cartesian products, {n_err} plan "
        f"errors; {n_eager_builders} builders submit jobs during plan "
        f"construction (see `build jobs`).**",
    ]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write(out)
    print(out.splitlines()[-1])

    if cartesian_offenders:
        print("CARTESIAN OFFENDERS:", cartesian_offenders)
        sys.exit(1)


if __name__ == "__main__":
    main()
