"""Generate PARITY.md: every registered query run against its DuckDB
oracle (the same comparison the correctness driver performs), at one or
more scale factors. Queries without oracle SQL get a rows-only run.

    python tools/parity_report.py [sf_dir ...]

The driver's own CORRECTNESS_r{N}.json records a subset of the corpus
(50 queries in round 1); this report is the full-corpus evidence.
"""

from __future__ import annotations

import datetime
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]

    import rc_rag_spark.queries as q
    from rc_rag_spark.session import build_session
    from tests.oracle import assert_parity

    spark = build_session(app_name="rc-rag-parity-report")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PARITY — full-corpus oracle check",
        "",
        f"Generated {datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M} UTC by `tools/parity_report.py`.",
        "Comparison identical to the driver's gate: run the Spark query and",
        "the DuckDB oracle SQL on the same parquet, sort columns by name,",
        "sort rows, compare values exactly (floats to 1e-9).",
        "",
    ]
    overall_fail = 0
    for sf_dir in sf_dirs:
        lines += [f"## {sf_dir}", "", "| query | oracle | result | sec |",
                  "|---|---|---|---|"]
        n_ok = n_fail = n_rows_only = 0
        for name in sorted(q.REGISTRY):
            spec = q.REGISTRY[name]
            t0 = time.perf_counter()
            try:
                if spec.sql:
                    assert_parity(spark, name, spec, sf_dir)
                    kind, result = "duckdb", "match"
                    n_ok += 1
                else:
                    rows = spec.fn(spark, sf_dir).count()
                    kind, result = "rows-only", f"{rows} rows"
                    n_rows_only += 1
            except Exception as exc:  # noqa: BLE001
                kind = "duckdb" if spec.sql else "rows-only"
                msg = " ".join(str(exc).split()).replace("|", "\\|")[:80]
                result = f"FAIL: {msg}"
                n_fail += 1
            dt = time.perf_counter() - t0
            lines.append(f"| {name} | {kind} | {result} | {dt:.1f} |")
        lines += [
            "",
            f"**{n_ok} hash-match, {n_rows_only} rows-only, {n_fail} failures.**",
            "",
        ]
        overall_fail += n_fail

    out = os.path.join(REPO, "PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; failures: {overall_fail}")
    sys.exit(1 if overall_fail else 0)


if __name__ == "__main__":
    main()
