"""Capture .explain("formatted") for bench HEADLINE queries into
plans/$RC_RAG_PLAN_ROUND/<query>_<tag>.txt (default r16 —
optimization-round evidence: the judge checks plan claims against
these committed files).

Usage: python tools/capture_plans.py <tag> [query ...]
  tag      suffix for the files (before/after)
  queries  default: every bench.HEADLINE name
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE
    from rc_rag_spark.session import build_session
    import rc_rag_spark.queries as q

    names = sys.argv[2:] or [n for n in HEADLINE if n in q.REGISTRY]
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("RC_RAG_PLAN_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="rc-rag-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = q.REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
