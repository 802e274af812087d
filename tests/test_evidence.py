"""Evidence-drift guard: the repo's own evidence artifacts must cover
the CURRENT query registry, or pytest fails.

Rounds 6 and 8 both shipped late query additions without regenerating
PARITY.md / PLANS.md / the README and SURVEY counts, so a user
auditing the corpus saw unevidenced queries. This makes the drift
structural instead of procedural: adding a query without re-running
`tools/parity_report.py` and `tools/plan_audit.py` (and syncing the
two prose counts) cannot survive a green suite."""

from __future__ import annotations

import os
import re

import rc_rag_spark.queries as q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(REPO, name)) as f:
        return f.read()


def _registry_counts() -> tuple[int, int]:
    total = len(q.REGISTRY)
    oracled = sum(1 for s in q.REGISTRY.values() if s.sql)
    return total, oracled


def test_parity_report_covers_registry():
    """PARITY.md footer: '**N hash-match, M rows-only, 0 failures.**'
    must account for every registered query (N == oracled, M == the
    rows-only remainder) — and report zero failures."""
    total, oracled = _registry_counts()
    m = re.search(
        r"\*\*(\d+) hash-match, (\d+) rows-only, (\d+) failures?\.\*\*",
        _read("PARITY.md"),
    )
    assert m, "PARITY.md footer missing — regenerate tools/parity_report.py"
    n_match, n_rows_only, n_fail = map(int, m.groups())
    assert n_fail == 0
    assert (n_match, n_rows_only) == (oracled, total - oracled), (
        f"PARITY.md covers {n_match}+{n_rows_only} queries but the "
        f"registry has {oracled} oracled + {total - oracled} rows-only — "
        "re-run `python tools/parity_report.py`"
    )


def test_plan_audit_covers_registry():
    """PLANS.md footer: '**N queries audited, 0 cartesian products,
    0 plan errors...' must audit every registered query."""
    total, _ = _registry_counts()
    m = re.search(
        r"\*\*(\d+) queries audited, (\d+) cartesian products?, "
        r"(\d+) plan errors?",
        _read("PLANS.md"),
    )
    assert m, "PLANS.md footer missing — regenerate tools/plan_audit.py"
    n_audited, n_cartesian, n_err = map(int, m.groups())
    assert n_cartesian == 0 and n_err == 0
    assert n_audited == total, (
        f"PLANS.md audits {n_audited} queries but the registry has "
        f"{total} — re-run `python tools/plan_audit.py`"
    )


def test_prose_counts_match_registry():
    """README.md and SURVEY.md state the corpus size in prose
    ('N named queries, M with DuckDB oracle' / 'N queries, M
    DuckDB-hash-checked'); both must match the registry."""
    total, oracled = _registry_counts()
    readme = re.findall(
        r"(\d+) named queries, (\d+) with DuckDB oracle", _read("README.md")
    )
    assert readme, "README.md corpus-count sentence missing"
    assert tuple(map(int, readme[-1])) == (total, oracled), (
        f"README.md says {readme[-1]}; registry is "
        f"{total}/{oracled} — sync the count"
    )
    # SURVEY §8 is a running round log; earlier rounds' counts stay —
    # the LAST stated count is the current one and must match.
    survey = re.findall(
        r"(\d+) queries, (\d+) DuckDB-hash-checked", _read("SURVEY.md")
    )
    assert survey, "SURVEY.md corpus-count sentence missing"
    assert tuple(map(int, survey[-1])) == (total, oracled), (
        f"SURVEY.md says {survey[-1]}; registry is "
        f"{total}/{oracled} — sync the count"
    )


def test_evidence_not_stale_vs_source():
    """PARITY.md / PLANS.md must be (re)committed AT or AFTER the
    newest rc_rag_spark/ source commit — round 9 shipped a source
    refactor (5cfbcd0) AFTER the final evidence regen (b784c97), so
    the published evidence predated HEAD's source and only count
    checks (not freshness) guarded it. Two layers:

    - committed history: last-commit time of each evidence file >=
      last-commit time of rc_rag_spark/;
    - dirty working tree: if rc_rag_spark/ has uncommitted edits, the
      evidence files' mtimes must be newer than the dirtiest source
      mtime (regen after editing).

    Set RC_RAG_EVIDENCE_LAX=1 to relax while iterating mid-round; the
    strict default is what the driver and judge run."""
    import subprocess

    if os.environ.get("RC_RAG_EVIDENCE_LAX"):
        import pytest

        pytest.skip("RC_RAG_EVIDENCE_LAX set — mid-round iteration")

    def commit_ts(path: str) -> int:
        out = subprocess.run(
            ["git", "-C", REPO, "log", "-1", "--format=%ct", "--", path],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        return int(out) if out else 0

    src_ts = commit_ts("rc_rag_spark")
    for ev in ("PARITY.md", "PLANS.md"):
        ev_ts = commit_ts(ev)
        assert ev_ts >= src_ts, (
            f"{ev} was last committed before the newest rc_rag_spark/ "
            f"source commit — regenerate evidence (tools/parity_report.py "
            f"/ tools/plan_audit.py) as the LAST commit of the round"
        )

    dirty = subprocess.run(
        ["git", "-C", REPO, "status", "--porcelain", "--", "rc_rag_spark"],
        capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    dirty_files = [
        os.path.join(REPO, line[3:].strip()) for line in dirty if line
    ]
    dirty_mtimes = [
        os.path.getmtime(p) for p in dirty_files if os.path.exists(p)
    ]
    if dirty_mtimes:
        newest_src = max(dirty_mtimes)
        for ev in ("PARITY.md", "PLANS.md"):
            assert os.path.getmtime(os.path.join(REPO, ev)) >= newest_src, (
                f"rc_rag_spark/ has uncommitted edits newer than {ev} — "
                f"regenerate evidence before committing"
            )


def test_bench_headline_names_exist():
    """bench.py silently drops HEADLINE names missing from the
    registry (`[n for n in HEADLINE if n in q.REGISTRY]`) — a typo'd
    or renamed anchor would vanish from the benchmark without any
    failure. Pin every name, and that the ANCHORS split is a subset
    of the headline set."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in q.REGISTRY]
    assert not missing, f"bench HEADLINE not in registry: {missing}"
    assert bench.ANCHORS <= set(bench.HEADLINE)


def _plan_audit_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "plan_audit", os.path.join(REPO, "tools", "plan_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_plan_regression_guard_logic():
    """The diff logic behind the plan-regression guard: exchange or
    shuffle-join GROWTH is flagged, growth within a 'plan-change:'
    note's explicit caps is waived (growth PAST a cap, or in a metric
    the note carries no cap for, is not — a bare note must not waive
    a query forever), reductions and new/removed queries are never
    flagged, and IMR-count changes demote the (reprint-inflated)
    exchange comparison to shuffle-joins only."""
    pa = _plan_audit_mod()
    base = {
        "hash_exchanges": 2, "range_exchanges": 0, "single_exchanges": 0,
        "bhj": 1, "shuffle_join": 1, "bnlj": 0, "cartesian": 0,
        "wsc": 3, "imr": 0, "build_jobs": 0,
    }

    def v(**kw):
        d = dict(base)
        d.update(kw)
        return d

    old = {"q_a": v(), "q_b": v(), "q_c": v(), "q_gone": v()}
    new = {
        "q_a": v(hash_exchanges=3),            # regression
        "q_b": v(shuffle_join=2),              # regression (noted<=2)
        "q_c": v(hash_exchanges=1),            # improvement
        "q_new": v(hash_exchanges=99),         # new query: not a diff
    }
    allow_b = {"hash_exchanges": None, "shuffle_join": 2}
    flagged = pa.plan_regressions(
        old, new, lambda n: allow_b if n == "q_b" else None
    )
    assert flagged == ["q_a: hash-exchanges 2 -> 3"]
    # without any note, both are flagged
    flagged = pa.plan_regressions(old, new, lambda n: None)
    assert flagged == [
        "q_a: hash-exchanges 2 -> 3",
        "q_b: shuffle-joins 1 -> 2",
    ]
    # growth PAST the cap still flags, with the cap in the message
    over = {"q_b": v(shuffle_join=3)}
    flagged = pa.plan_regressions(old, over, lambda n: allow_b)
    assert flagged == ["q_b: shuffle-joins 1 -> 3 (note cap 2 exceeded)"]
    # a note with a cap only for the OTHER metric does not waive
    flagged = pa.plan_regressions(
        old, {"q_a": v(hash_exchanges=3)},
        lambda n: {"hash_exchanges": None, "shuffle_join": 9},
    )
    assert flagged == ["q_a: hash-exchanges 2 -> 3"]
    # a bare cap-less note flags AND asks for caps
    flagged = pa.plan_regressions(
        old, {"q_a": v(hash_exchanges=3)},
        lambda n: {"hash_exchanges": None, "shuffle_join": None},
    )
    assert flagged == [
        "q_a: hash-exchanges 2 -> 3, plan-change note carries no caps "
        "— add hash-exchanges<=N / shuffle-joins<=M"
    ]
    # IMR change: exchange growth is reprint noise, shuffle-joins rule
    new_imr = {"q_a": v(hash_exchanges=9, imr=2)}
    assert pa.plan_regressions(old, new_imr, lambda n: None) == []
    new_imr = {"q_a": v(hash_exchanges=9, imr=2, shuffle_join=2)}
    assert pa.plan_regressions(old, new_imr, lambda n: None) == [
        "q_a: shuffle-joins 1 -> 2"
    ]


def test_plan_note_allowances_parse():
    """Every committed 'plan-change:' note must carry parsable caps —
    docstring_plan_allowance returns per-metric caps for noted
    queries, None for unnoted ones, and no committed note may be
    cap-less (that would silence the guard for that query forever)."""
    pa = _plan_audit_mod()
    noted = [
        name
        for name in q.REGISTRY
        if "plan-change:" in (q.REGISTRY[name].fn.__doc__ or "")
    ]
    assert len(noted) >= 5  # q62/q102/q239/q264/q284 as of round 12
    for name in noted:
        allow = pa.docstring_plan_allowance(name)
        assert allow is not None, name
        assert any(v is not None for v in allow.values()), (
            f"{name}: plan-change note has no hash-exchanges<=N / "
            "shuffle-joins<=M caps"
        )
    assert pa.docstring_plan_allowance("q01_pricing_summary") is None


def test_plans_md_table_parses():
    """The committed PLANS.md table must round-trip through the
    guard's parser — every audited query (minus plan-error rows)
    yields a counts row, so the diff has something to diff."""
    pa = _plan_audit_mod()
    parsed = pa.parse_plans_table(_read("PLANS.md"))
    total, _ = _registry_counts()
    assert len(parsed) >= total - 5  # tolerate a few error rows
    row = parsed["q01_pricing_summary"]
    assert set(row) >= {"hash_exchanges", "shuffle_join", "cartesian"}


def test_sampled_plans_match_committed(spark, sf_dir):
    """LIVE plan-regression guard: a deterministic sample of
    plan-only queries is rebuilt on every pytest run and compared to
    the committed PLANS.md — exchange/shuffle-join growth without a
    'plan-change:' docstring note fails here, months before a bench
    could notice. (Growth-only: improvements wait for the round-close
    regen, which the staleness guard forces anyway.)"""
    pa = _plan_audit_mod()
    committed = pa.parse_plans_table(_read("PLANS.md"))
    eligible = sorted(
        name
        for name, c in committed.items()
        if c["build_jobs"] == 0 and c["imr"] == 0 and name in q.REGISTRY
    )
    assert len(eligible) >= 50
    step = max(1, len(eligible) // 12)
    sample = eligible[::step][:12]
    fresh = {}
    for name in sample:
        df = q.REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        fresh[name] = {**pa.count_plan(plan), "build_jobs": 0}
    flagged = pa.plan_regressions(
        committed, fresh, pa.docstring_plan_allowance
    )
    assert not flagged, (
        "plan regression vs committed PLANS.md (if intentional, add a "
        "'plan-change:' docstring note with hash-exchanges<=N / "
        f"shuffle-joins<=M caps): {flagged}"
    )


def _resource_probe_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "resource_probe", os.path.join(REPO, "tools", "resource_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_resources_md_covers_anchors():
    """RESOURCES.md must carry a parseable sf0.01 ratchet-baseline row
    and an sf0.1 headline row for every bench anchor."""
    rp = _resource_probe_mod()
    tables = rp.parse_resources_md(_read("RESOURCES.md"))
    for sf in ("sf0.01", "sf0.1"):
        assert sf in tables, f"RESOURCES.md missing {sf} section"
        missing = [a for a in rp.ANCHORS if a not in tables[sf]]
        assert not missing, f"RESOURCES.md {sf} missing anchors: {missing}"
        for name, row in tables[sf].items():
            assert set(row) == set(rp.COLS), name


def test_resource_regression_guard_logic():
    """Unit contract of the byte ratchet: growth inside tolerance
    passes, silent growth flags, a 'resource-change:' cap waives
    exactly up to the cap, reductions never flag."""
    rp = _resource_probe_mod()
    base = {
        "qX": {
            "shuffle_read_bytes": 10 << 20,
            "shuffle_write_bytes": 10 << 20,
            "disk_spill_bytes": 0,
        }
    }

    def grown(mult):
        return {
            "qX": {
                k: int(v * mult) for k, v in base["qX"].items()
            }
        }

    assert rp.resource_regressions(base, grown(1.0), lambda n: None) == []
    assert rp.resource_regressions(base, grown(1.2), lambda n: None) == []
    flagged = rp.resource_regressions(base, grown(2.0), lambda n: None)
    assert len(flagged) == 2 and "shuffle_read_bytes" in flagged[0]
    # spill 0 -> 1 MiB stays inside the absolute slack; 0 -> 3 MiB flags
    spilled = {"qX": {**base["qX"], "disk_spill_bytes": 3 << 20}}
    assert any(
        "disk_spill_bytes" in f
        for f in rp.resource_regressions(base, spilled, lambda n: None)
    )
    # a note cap waives growth up to the cap, not beyond
    cap = {"shuffle_read_bytes": 25 << 20, "shuffle_write_bytes": None,
           "disk_spill_bytes": None}
    flagged = rp.resource_regressions(base, grown(2.0), lambda n: cap)
    assert all("shuffle_read_bytes" not in f for f in flagged)
    assert any("shuffle_write_bytes" in f for f in flagged)
    under = {"qX": {**base["qX"]}}
    under["qX"]["shuffle_read_bytes"] = 30 << 20
    assert any(
        "note cap" in f
        for f in rp.resource_regressions(base, under, lambda n: cap)
    )


def test_sampled_resources_match_committed(spark):
    """LIVE byte ratchet (round 15, VERDICT r14 item 2): a
    deterministic sample of bench anchors is re-measured at sf0.01 on
    every pytest run and its shuffle/spill bytes compared to the
    committed RESOURCES.md baseline — a kernel change that inflates
    shuffle volume behind an unchanged plan shape fails here unless
    the query's docstring documents it with a 'resource-change:' note
    carrying byte caps (shuffle-read<=N / shuffle-write<=N /
    spill<=N). Growth-only, like the plan guard; regenerate the
    baseline with tools/resource_probe.py when bytes legitimately
    shrink or a noted change lands."""
    rp = _resource_probe_mod()
    committed = rp.parse_resources_md(_read("RESOURCES.md"))["sf0.01"]
    sample = sorted(rp.ANCHORS)[::3]
    assert len(sample) >= 4
    fresh = rp.measure(spark, sample, "/root/testdata/sf0.01")
    flagged = rp.resource_regressions(committed, fresh)
    assert not flagged, (
        "shuffle/spill byte regression vs committed RESOURCES.md "
        "(if intentional, add a 'resource-change:' docstring note "
        f"with byte caps, then regenerate): {flagged}"
    )


def test_sf1_parity_footer_certified():
    """The sf1 section footer must show the round-15 shape: >=120
    value-verified (hash-match) queries, the three certificate rows
    (q102/q212/q217 — tools/certify_sf1.py replacing the old
    rows+schema fallbacks), and zero failures."""
    m = re.search(
        r"\*\*sf1: (\d+) hash-match, (\d+) certificate-verified, "
        r"(\d+) rows\+schema, (\d+) failures?\.\*\*",
        _read("PARITY.md"),
    )
    assert m, (
        "sf1 footer missing/old-format — re-run "
        "`python tools/parity_report.py --sf1`"
    )
    n_match, n_cert, n_rows, n_fail = map(int, m.groups())
    assert n_fail == 0, f"sf1 section has {n_fail} failures"
    assert n_cert == 3
    assert n_match >= 120, (
        f"sf1 value coverage regressed to {n_match} (round-15 bar: 120)"
    )
