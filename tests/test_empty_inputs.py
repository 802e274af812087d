"""Corpus-wide EMPTY-INPUT robustness (round 12): every registered
query must plan and execute against ZERO-ROW tables. At 100 TB the
empty case is routine — a day partition with no events, a source
whose docs were all filtered upstream, a fresh table before first
load — and an operator that throws on it (MLlib fit on zero rows,
numpy axis errors on a (0,)-shaped matrix, ANSI DIVIDE_BY_ZERO on a
zero count, UNABLE_TO_INFER_SCHEMA reading back an empty write,
collect()[0] on a missing boundary row) takes the whole pipeline
down with it.

The sf0 fixture is built on demand from the real tables' parquet
schemas (tools/make_sf0.py), so it can never drift from the shapes
the queries actually read. Value-level empty-input SEMANTICS (e.g.
global aggregates over zero rows, NULL rates where the oracle yields
NULL) are hash-checked separately by `tools/parity_report.py --sf0`.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

import rc_rag_spark.queries as q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_sf0(out_dir: str, n_rows: int = 0, null_row: bool = False) -> str:
    spec = importlib.util.spec_from_file_location(
        "make_sf0", os.path.join(REPO, "tools", "make_sf0.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_sf0(out_dir, n_rows=n_rows, null_row=null_row)


@pytest.fixture(scope="module")
def sf0_dir(tmp_path_factory):
    return _make_sf0(str(tmp_path_factory.mktemp("rc_rag_sf0")))


@pytest.fixture(scope="module")
def sftiny_dir(tmp_path_factory):
    return _make_sf0(
        str(tmp_path_factory.mktemp("rc_rag_sftiny")), n_rows=1
    )


@pytest.fixture(scope="module")
def sfnulls_dir(tmp_path_factory):
    return _make_sf0(
        str(tmp_path_factory.mktemp("rc_rag_sfnulls")),
        n_rows=1,
        null_row=True,
    )


def _sweep(fn_dir, names, workers: int = 8):
    """Run every query once against the fixture, 8 at a time — the
    sweep is dominated by per-query fixed overhead (plan + a few
    tiny jobs), and Spark's scheduler interleaves concurrent jobs
    fine. Queries are mutually independent here: same-named temp
    views re-register identical content (same sf_dir), per-query
    tmp dirs are distinct, and the two conf-toggling queries
    (q235 scripting, q286 DS pushdown) save/restore flags that are
    semantics-preserving for everyone else."""
    from concurrent.futures import ThreadPoolExecutor

    def one(name):
        try:
            rows = q.REGISTRY[name].fn(*fn_dir).collect()
            assert isinstance(rows, list)
            return None
        except Exception as exc:  # noqa: BLE001
            msg = " ".join(str(exc).split())[:140]
            return f"{name}: {type(exc).__name__}: {msg}"

    with ThreadPoolExecutor(max_workers=workers) as pool:
        return sorted(r for r in pool.map(one, names) if r)


def test_every_query_survives_empty_tables(spark, sf0_dir):
    """One sweep, all failures reported together (a parametrized
    per-query version would re-pay Spark fixture overhead 293x for
    sub-second bodies). Every query must return a collectable
    DataFrame — possibly zero rows, possibly one global-aggregate
    row — never raise."""
    failures = _sweep((spark, sf0_dir), sorted(q.REGISTRY))
    assert not failures, (
        f"{len(failures)} queries crash on empty tables:\n  "
        + "\n  ".join(failures)
    )


def test_every_query_survives_single_row_tables(spark, sftiny_dir):
    """The OTHER degenerate shape: one row per table. Exercises the
    failure class sf0 cannot reach — fits with fewer points than
    centroids, zero-variance statistics (z-scores, correlations),
    windows over a single row, joins whose FK target row is missing
    from the 1-row parent slice."""
    failures = _sweep((spark, sftiny_dir), sorted(q.REGISTRY))
    assert not failures, (
        f"{len(failures)} queries crash on single-row tables:\n  "
        + "\n  ".join(failures)
    )


def test_every_query_survives_null_rows(spark, sfnulls_dir):
    """The THIRD degenerate shape: a row whose every nullable column
    is NULL (real crawl feeds have them — missing text, missing
    embedding, missing blob). NULL text through tokenizer/chunking
    kernels, NULL embeddings through similarity/ANN/SemDeDup (the
    SQL-NULL contract: a NULL key never matches, a NULL vector has no
    position in the space), NULL payloads through the multimodal
    decoders — all must degrade to skipped rows, never a dead
    executor.

    This in-suite gate is the fast CRASH-SAFETY sweep; the VALUE
    check on this same shape is `tools/parity_report.py --sfnulls`
    (PARITY.md '## sfnulls') — since round 13 the full corpus
    hash-matches DuckDB on it with ZERO documented divergences (the
    formulation-specific NULL calls this docstring once waved at —
    window NULL placement, NaN-vs-NULL, DuckDB's split_part/least
    quirks — all turned out reconcilable, and the reconciliation
    caught five real engine bugs)."""
    failures = _sweep((spark, sfnulls_dir), sorted(q.REGISTRY))
    assert not failures, (
        f"{len(failures)} queries crash on all-NULL rows:\n  "
        + "\n  ".join(failures)
    )


def test_empty_input_spot_semantics(spark, sf0_dir):
    """The handful of empty-input answers whose SHAPE is part of the
    operator contract (not just 'no crash'): recall bounds are
    vacuously OK, the joinability audit reports NULL containment (the
    oracle's x/0), the funnel reports a NULL rate, and the knn/dedup
    families return typed zero-row frames."""
    r = q.REGISTRY["q130_lsh_recall_bound"].fn(spark, sf0_dir).collect()
    assert len(r) == 1 and r[0]["recall_ok"] is True
    assert r[0]["n_queries"] == 0 and r[0]["n_exact_pairs"] == 0

    audit = q.REGISTRY["q210_joinability_audit"].fn(spark, sf0_dir).collect()
    assert len(audit) == 5
    assert all(
        row["containment_a"] is None and row["nd_a"] == 0 for row in audit
    )

    funnel = q.REGISTRY["q209_windowed_funnel"].fn(spark, sf0_dir).collect()
    assert len(funnel) == 1 and funnel[0]["rate_1h"] is None

    knn = q.REGISTRY["q64_knn_bruteforce"].fn(spark, sf0_dir)
    assert knn.collect() == []
    assert [f.name for f in knn.schema.fields] == [
        "query_id", "neighbor_id", "similarity", "rank",
    ]
