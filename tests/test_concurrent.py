"""Concurrent-query / multi-session correctness (round 15, VERDICT
r14 item 4 — the in-suite twin of tools/concurrent_run.py).

Until this round every query ran alone; the round-14 pyds
active-session pinning bug and the r13 soak-cleanup cross-talk bug
both lived in the sharing class. The suite-level checks run at
sf0.001 under the shared (FIFO) session — interleaved scheduling and
shared-context isolation are what's probed here; the FAIR-pool
variant at bench SF is the tool's job, since scheduler.mode is a
context-creation conf the shared fixture cannot flip."""

from __future__ import annotations

import threading

import rc_rag_spark.queries as q

ANCHOR_SAMPLE = [
    "q102_dedup_clusters",
    "q212_semdedup_scaled",
    "q222_cdc_chunking",
    "q263_bradley_terry",
    "q288_skewed_join_enrich",
]


def _hash(df) -> str:
    import hashlib

    from tests.oracle import canonicalize

    rows = canonicalize(df.toPandas())
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return f"{len(rows)}:{h.hexdigest()}"


def _run_threads(workers):
    errs, ths = [], []

    def wrap(fn):
        def inner():
            try:
                fn()
            except BaseException as exc:  # noqa: BLE001
                errs.append(exc)

        return inner

    for fn in workers:
        th = threading.Thread(target=wrap(fn), daemon=True)
        th.start()
        ths.append(th)
    for th in ths:
        th.join(600)
    assert not errs, errs[0]


def test_concurrent_queries_match_serial(spark, sf_dir):
    """Five mixed anchors (iterative dedup, SemDeDup's broadcast
    seeds + applyInPandas, Arrow UDFs, an AQE skew join) running
    SIMULTANEOUSLY on one session must hash identically to their
    solo runs — shared-state bugs (cached plans, broadcast ids, temp
    paths) show up as cross-talk here."""
    serial = {n: _hash(q.REGISTRY[n].fn(spark, sf_dir))
              for n in ANCHOR_SAMPLE}
    got: dict[str, str] = {}
    lock = threading.Lock()

    def worker(name):
        def run():
            h = _hash(q.REGISTRY[name].fn(spark, sf_dir))
            with lock:
                got[name] = h

        return run

    _run_threads([worker(n) for n in ANCHOR_SAMPLE])
    mism = [n for n in ANCHOR_SAMPLE if got.get(n) != serial[n]]
    assert not mism, f"concurrent hash mismatch: {mism}"


def test_two_sessions_interleave(spark, sf_dir):
    """Two newSession() children of one context interleave the
    Python-DataSource 2PC writer query and batch transformWithState
    (the pair round-14's active-session pinning bug implicates) while
    a third thread runs a plain anchor on the parent — all hashes
    must equal serial runs on the parent session."""
    serial = {
        n: _hash(q.REGISTRY[n].fn(spark, sf_dir))
        for n in (
            "q230_python_datasource_writer",
            "q281_transform_with_state_batch",
            "q222_cdc_chunking",
        )
    }
    s1, s2 = spark.newSession(), spark.newSession()
    got: dict[str, str] = {}
    lock = threading.Lock()

    def put(k, v):
        with lock:
            got[k] = v

    def a():
        put(
            "q230_python_datasource_writer",
            _hash(
                q.REGISTRY["q230_python_datasource_writer"].fn(s1, sf_dir)
            ),
        )

    def b():
        put(
            "q281_transform_with_state_batch",
            _hash(
                q.REGISTRY["q281_transform_with_state_batch"].fn(s2, sf_dir)
            ),
        )

    def c():
        put(
            "q222_cdc_chunking",
            _hash(q.REGISTRY["q222_cdc_chunking"].fn(spark, sf_dir)),
        )

    _run_threads([a, b, c])
    mism = [k for k, v in serial.items() if got.get(k) != v]
    assert not mism, f"multi-session hash mismatch: {mism}"
