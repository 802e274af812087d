"""Declared query corpus.

Every operator claimed in SURVEY.md §2 is backed by a named query here:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are SQL-expressible, an equivalent DuckDB oracle SQL string
(run by the driver side-by-side at sf0.01).

Import side effects populate REGISTRY.
"""

from rc_rag_spark.queries.core import REGISTRY, QuerySpec, register  # noqa: F401

# Populate the registry.
from rc_rag_spark.queries import relational  # noqa: E402,F401
from rc_rag_spark.queries import text  # noqa: E402,F401
from rc_rag_spark.queries import rag  # noqa: E402,F401
from rc_rag_spark.queries import dedup_sim  # noqa: E402,F401
from rc_rag_spark.queries import events_windows  # noqa: E402,F401
from rc_rag_spark.queries import ml  # noqa: E402,F401
from rc_rag_spark.queries import corpus  # noqa: E402,F401
from rc_rag_spark.queries import analytics  # noqa: E402,F401
from rc_rag_spark.queries import scale_batch  # noqa: E402,F401
from rc_rag_spark.queries import semdedup  # noqa: E402,F401
from rc_rag_spark.queries import stats_ts  # noqa: E402,F401
from rc_rag_spark.queries import linkage  # noqa: E402,F401
from rc_rag_spark.queries import profiling_ml  # noqa: E402,F401
from rc_rag_spark.queries import warehouse_ops  # noqa: E402,F401
from rc_rag_spark.queries import linalg_stats  # noqa: E402,F401
from rc_rag_spark.queries import stats_eval  # noqa: E402,F401
from rc_rag_spark.queries import retrieval_ops  # noqa: E402,F401
from rc_rag_spark.queries import discovery  # noqa: E402,F401
from rc_rag_spark.queries import spark4  # noqa: E402,F401
from rc_rag_spark.queries import governance  # noqa: E402,F401
from rc_rag_spark.queries import curation  # noqa: E402,F401


def queries():
    return {name: spec.fn for name, spec in sorted(REGISTRY.items())}


def oracle_sql():
    return {
        name: spec.sql for name, spec in sorted(REGISTRY.items()) if spec.sql
    }
