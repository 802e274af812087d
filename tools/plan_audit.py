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

PLAN-REGRESSION GUARD (round 11): the audit is DIFFABLE — before
overwriting PLANS.md it parses the committed table and flags any
query whose hash-exchange or shuffle-join count GREW. Growth is a
structural perf regression the noisy sub-second bench cannot catch;
it fails the audit (exit 2, after writing the new table so the diff
is inspectable) unless the query's docstring carries a
``plan-change:`` note that BOUNDS the intentional change with
explicit caps — ``hash-exchanges<=N`` / ``shuffle-joins<=M`` tokens
anywhere in the docstring. A note waives growth only UP TO its caps
(round 12: a bare note used to waive all future growth forever,
blinding the guard to later unintentional regressions in that
query); growth past a cap, or growth in a metric the note carries no
cap for, still fails. tests/test_evidence.py unit-tests the diff
logic and live-checks a deterministic sample of plan-only queries
against the committed table on every pytest run.
"""

from __future__ import annotations

import datetime
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("RC_RAG_TEST_SF_DIR", "/root/testdata/sf0.001")

_ROW_RE = re.compile(
    r"^\| (q\S+) \| (\d+)\+(\d+)r\+(\d+)s \| (\d+) \| (\d+) \| (\d+) "
    r"\| (\d+) \| (\d+) \| (\d+) \| (\d+) \|"
)


def parse_plans_table(text: str) -> dict[str, dict[str, int]]:
    """The committed PLANS.md table -> {query: counts}. Rows with a
    plan error ('-' columns) are skipped — there is nothing to diff
    against."""
    out: dict[str, dict[str, int]] = {}
    for line in text.splitlines():
        m = _ROW_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        out[name] = {
            "hash_exchanges": int(m.group(2)),
            "range_exchanges": int(m.group(3)),
            "single_exchanges": int(m.group(4)),
            "bhj": int(m.group(5)),
            "shuffle_join": int(m.group(6)),
            "bnlj": int(m.group(7)),
            "cartesian": int(m.group(8)),
            "wsc": int(m.group(9)),
            "imr": int(m.group(10)),
            "build_jobs": int(m.group(11)),
        }
    return out


def plan_regressions(
    old: dict[str, dict[str, int]],
    new: dict[str, dict[str, int]],
    get_allowance,
) -> list[str]:
    """Queries (present in both tables) whose hash-exchange or
    shuffle-join count grew beyond what a ``plan-change:`` docstring
    note allows. ``get_allowance(name)`` returns None (no note — any
    growth flags) or {"hash_exchanges": cap|None, "shuffle_join":
    cap|None}; growth is waived only while the new count stays <= the
    cap for THAT metric, so a note documents one bounded change
    instead of blinding the guard to the query forever. New queries
    and removals are not regressions; reductions never are.
    Cached-plan reprinting (IMR > 0) inflates exchange counts, so a
    query whose IMR count itself changed is compared on shuffle-joins
    only."""
    bad = []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        allow = get_allowance(name) or {}

        def waived(metric: str) -> bool:
            cap = allow.get(metric)
            return cap is not None and n[metric] <= cap

        grew = []
        if (
            n["imr"] == o["imr"]
            and n["hash_exchanges"] > o["hash_exchanges"]
            and not waived("hash_exchanges")
        ):
            grew.append(
                f"hash-exchanges {o['hash_exchanges']} -> "
                f"{n['hash_exchanges']}"
                + (
                    f" (note cap {allow['hash_exchanges']} exceeded)"
                    if allow.get("hash_exchanges") is not None
                    else ""
                )
            )
        if n["shuffle_join"] > o["shuffle_join"] and not waived(
            "shuffle_join"
        ):
            grew.append(
                f"shuffle-joins {o['shuffle_join']} -> {n['shuffle_join']}"
                + (
                    f" (note cap {allow['shuffle_join']} exceeded)"
                    if allow.get("shuffle_join") is not None
                    else ""
                )
            )
        if grew:
            if allow and all(v is None for v in allow.values()):
                grew.append(
                    "plan-change note carries no caps — add "
                    "hash-exchanges<=N / shuffle-joins<=M"
                )
            bad.append(f"{name}: {', '.join(grew)}")
    return bad


_NOTE_CAPS = {
    "hash_exchanges": re.compile(r"hash-exchanges<=(\d+)"),
    "shuffle_join": re.compile(r"shuffle-joins<=(\d+)"),
}


def docstring_plan_allowance(name: str) -> dict[str, int | None] | None:
    """Parse a registered query's ``plan-change:`` note into its
    growth allowance: None when no note, else per-metric caps
    (``hash-exchanges<=N`` / ``shuffle-joins<=M`` tokens anywhere in
    the docstring; a missing token means NO allowance for that
    metric)."""
    import rc_rag_spark.queries as q

    spec = q.REGISTRY.get(name)
    doc = (spec.fn.__doc__ or "") if spec else ""
    if "plan-change:" not in doc:
        return None
    return {
        metric: int(m.group(1)) if (m := rx.search(doc)) else None
        for metric, rx in _NOTE_CAPS.items()
    }


def count_plan(plan: str) -> dict[str, int]:
    """The scale-relevant node counts of one executed-plan string —
    shared by the audit table and the test-side live sample."""
    return {
        "hash_exchanges": len(
            re.findall(r"Exchange hashpartitioning", plan)
        ),
        "range_exchanges": len(
            re.findall(r"Exchange rangepartitioning", plan)
        ),
        "single_exchanges": len(
            re.findall(r"Exchange SinglePartition", plan)
        ),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "shuffle_join": len(re.findall(r"SortMergeJoin", plan))
        + len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "wsc": len(re.findall(r"WholeStageCodegen", plan)),
        "imr": len(re.findall(r"InMemoryTableScan", plan)),
    }

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
        c = count_plan(plan)
        if c["cartesian"]:
            cartesian_offenders.append(name)
        rows.append((
            name,
            f"{c['hash_exchanges']}+{c['range_exchanges']}r"
            f"+{c['single_exchanges']}s",
            c["bhj"], c["shuffle_join"], c["bnlj"], c["cartesian"],
            c["wsc"], c["imr"],
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
    plans_path = os.path.join(REPO, "PLANS.md")
    committed = ""
    if os.path.exists(plans_path):
        with open(plans_path) as fh:
            committed = fh.read()
    with open(plans_path, "w") as fh:
        fh.write(out)
    print(out.splitlines()[-1])

    if cartesian_offenders:
        print("CARTESIAN OFFENDERS:", cartesian_offenders)
        sys.exit(1)

    # regression guard: exchange/shuffle-join growth vs the committed
    # table fails the audit unless the docstring carries a
    # 'plan-change:' note (the new table is already written, so the
    # diff is inspectable either way)
    offenders = plan_regressions(
        parse_plans_table(committed),
        parse_plans_table(out),
        docstring_plan_allowance,
    )
    if offenders:
        print("PLAN REGRESSIONS (if intentional, add a 'plan-change:' "
              "docstring note with hash-exchanges<=N / "
              "shuffle-joins<=M caps):")
        for o in offenders:
            print("  " + o)
        sys.exit(2)


if __name__ == "__main__":
    main()
