"""Corpus-wide physical-plan audit: build every registered query's
executed plan (no execution — plans only) and tabulate the operators
that matter at 100 TB: shuffles (Exchange), join strategies, sorts,
whole-stage-codegen coverage, cartesian products.

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

    rows = []
    cartesian_offenders = []
    for name in sorted(q.REGISTRY):
        spec = q.REGISTRY[name]
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            rows.append((name, "-", "-", "-", "-", "-", "-", "-",
                         f"plan error: {str(exc)[:60]}"))
            continue
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
            n_bhj, n_smj + n_shj, n_bnlj, n_cart, n_wsc, n_imr, "",
        ))

    lines = [
        "# PLANS — corpus-wide physical-plan audit",
        "",
        f"Generated {datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M} UTC "
        f"by `tools/plan_audit.py` over {SF_DIR} (plans only, no execution).",
        "",
        "Columns: hash-exchanges (+range +single-partition), broadcast",
        "hash joins, shuffle joins (SMJ+SHJ), broadcast nested loops",
        "(tolerated only for single-row scalar attaches), cartesian",
        "products (never tolerated), whole-stage-codegen spans,",
        "in-memory-cache scans. NOTE: toString() re-prints a cached",
        "subtree at every InMemoryTableScan reference, so plans with",
        "IMR > 0 overstate raw exchange counts — each cached subtree",
        "executes its exchanges ONCE (q146's 70 printed exchanges are",
        "~7 executed).",
        "",
        "| query | exchanges | BHJ | shuffle-join | BNLJ | cartesian | WSC | IMR | note |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")

    n_err = sum(1 for r in rows if r[-1])
    lines += [
        "",
        f"**{len(rows)} queries audited, "
        f"{len(cartesian_offenders)} cartesian products, {n_err} plan errors.**",
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
