"""Oracle-independence audit (VERDICT r13 "what's wrong" #2 / next #4).

The parity gate compares Spark against DuckDB. Wherever the SAME SQL
text is passed verbatim to both engines, a bug inside that shared
fragment hits both identically and the hash stays green — the gate is
blind there. This file (a) inventories the verbatim-shared fragments
and ratchets their count, and (b) gives each SEMANTIC-bearing one a
THIRD implementation (pure Python, no SQL) plus a MUTATION check:
perturbing the fragment must produce a divergence the third
implementation can see — proving the blindspot is actually covered.

Verbatim-shared inventory (audited r14):

1. ``_URL_EXPR`` and its ``_U_*`` sub-fragments (queries/curation.py)
   — the synthetic-URL input derivation, run via F.expr on Spark and
   interpolated into every URL-family oracle. SEMANTIC (it defines
   the corpus): third implementation + mutation tests below.
2. ``UNPARSED_SENTINEL`` / ``NOHOST_SENTINEL`` vs their
   ``_DUCK_*_SENTINEL`` mirrors — shared by construction. SEMANTIC:
   mirror-equality + NULL-behavior tests below (the behavioral
   equivalence under dirty URLs is tests/test_curation_pipeline.py's
   dirty-URL grid).
3. ``_Q79_SQL`` / ``_Q80_SQL`` / ``_Q81_SQL`` (queries/relational.py)
   — whole queries deliberately run verbatim on both engines (the
   SQL-front-door exercise). SEMANTIC: independent DataFrame twins
   below re-derive each result without any shared text.
4. ``_LHOST_LABELS`` / ``_REGISTRABLE_CASE`` (queries/curation.py) —
   oracle-side only (Spark's _with_registrable is independent
   DataFrame code), but the regexes are structurally identical twins,
   so a shared MISCONCEPTION would pass: the pure-Python PSL matcher
   below breaks that correlation.

Everything else matching the ``both engines`` marker comment is
commentary about keeping numeric types/NULL order aligned (label
plumbing), not shared executable text — see the ratchet test, which
forces any NEW marker site to be classified here.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from pyspark.sql import functions as F

from rc_rag_spark.queries.curation import (
    _LHOST_LABELS,
    _PSL1,
    _PSL2,
    _REGISTRABLE_CASE,
    _SUFFIX_BY_MOD,
    _URL_EXPR,
    _DUCK_NOHOST_SENTINEL,
    _DUCK_UNPARSED_SENTINEL,
    NOHOST_SENTINEL,
    UNPARSED_SENTINEL,
    _values_cte,
    _with_registrable,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_IDS = 4000  # covers the pid cycle (499) x the doc_id mod lattice


# ---------------------------------------------------------------- #
# third implementation: the URL derivation in pure Python
# ---------------------------------------------------------------- #


def _py_url(doc_id: int) -> str:
    pid = doc_id % 499
    scheme = "https" if pid % 3 == 0 else "http"
    sub = {1: "www.", 2: "cdn.", 3: "a.b."}.get(pid % 4, "")
    host = f"{sub}site{pid % 97}.{_SUFFIX_BY_MOD[pid % 7]}"
    if doc_id % 8 == 0:
        host = host.upper()
    if pid % 5 == 0:
        port = ":8080"
    elif doc_id % 5 == 1:
        port = ":443" if pid % 3 == 0 else ":80"
    else:
        port = ""
    path = f"/p/{pid % 13}" + ("/" if doc_id % 9 == 0 else "")
    if pid % 2 == 0:
        if doc_id % 4 == 0:
            query = f"?ref=r{pid % 4}&q={pid % 11}"
        else:
            query = f"?q={pid % 11}&ref=r{pid % 4}"
    else:
        query = ""
    frag = f"#sec{doc_id % 3}" if doc_id % 6 == 0 else ""
    return f"{scheme}://{host}{port}{path}{query}{frag}"


def _duck_urls(expr: str, n: int = N_IDS) -> dict[int, str]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT range AS doc_id, {expr} AS url FROM range(0, {n}) "
        "ORDER BY doc_id"
    ).fetchall()
    return {int(i): u for i, u in rows}


def test_url_expr_matches_python_third_implementation(spark):
    """DuckDB eval, Spark eval, and the Python reimplementation of
    _URL_EXPR must agree on every doc_id — three engines, one truth."""
    want = {i: _py_url(i) for i in range(N_IDS)}
    assert _duck_urls(_URL_EXPR) == want

    got_spark = {
        r["doc_id"]: r["url"]
        for r in spark.range(N_IDS)
        .withColumnRenamed("id", "doc_id")
        .select("doc_id", F.expr(_URL_EXPR).alias("url"))
        .collect()
    }
    assert got_spark == want


@pytest.mark.parametrize(
    "mutant",
    [
        ("':8080'", "':8081'"),          # wrong explicit port
        ("'https'", "'httpz'"),          # scheme typo
        ("% 97", "% 96"),                # host universe shrinks
        ("'co.uk'", "'couk'"),           # suffix corruption
        ("?ref=r", "?ref=s"),            # param-order leg drifts
        ("% 13", "% 14"),                # path universe drifts
    ],
)
def test_url_expr_mutation_is_visible(mutant):
    """Perturb the shared fragment -> the Python third implementation
    MUST see a divergence (if it didn't, the audit would be
    decorative). Each mutation models a bug class: a typo'd constant,
    a wrong modulus, a corrupted suffix."""
    old, new = mutant
    mutated = _URL_EXPR.replace(old, new)
    assert mutated != _URL_EXPR, f"mutation {mutant} didn't apply"
    got = _duck_urls(mutated)
    diverged = sum(1 for i in range(N_IDS) if got[i] != _py_url(i))
    assert diverged > 0, f"third implementation blind to {mutant}"


# ---------------------------------------------------------------- #
# third implementation: PSL longest-suffix match in pure Python
# ---------------------------------------------------------------- #

_EDGE_HOSTS = [
    "site5.com",
    "www.site5.com",
    "a.b.site5.com",
    "WWW.SITE5.COM",
    "site9.co.uk",
    "cdn.site9.ac.uk",
    "deep.a.b.site1.com.au",
    "evil.example",
    "localhost",
    "com",            # bare 1-label public suffix
    "co.uk",          # bare 2-label public suffix
    "x.co.uk",
]


def _py_registrable(host: str) -> str:
    """Longest-suffix match, no SQL: if the last TWO labels are a
    listed suffix the registrable domain is three labels, else if the
    last ONE label is listed it is two, else the whole lowered host.
    Mirrors the regexes' behavior of yielding '' when the host has
    fewer labels than requested."""
    lhost = host.lower()
    labels = lhost.split(".")

    def lastn(n: int) -> str:
        return ".".join(labels[-n:]) if len(labels) >= n else ""

    if lastn(2) in _PSL2:
        return lastn(3)
    if lastn(1) in _PSL1:
        return lastn(2)
    return lhost


def _duck_registrable(case_sql: str, hosts: list[str]) -> dict[str, str]:
    vals = ", ".join(f"('{h}')" for h in hosts)
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH {_values_cte('psl2', _PSL2)},
        {_values_cte('psl1', _PSL1)},
        h(host) AS (VALUES {vals}),
        lab AS (SELECT h.host,{_LHOST_LABELS} FROM h),
        reg AS (
            SELECT lab.*,{case_sql}
            FROM lab
            LEFT JOIN psl2 p2 ON p2.s = lab.last2
            LEFT JOIN psl1 p1 ON p1.s = lab.last1)
        SELECT host, registrable FROM reg
        """
    ).fetchall()
    return dict(rows)


def test_registrable_matches_python_third_implementation(spark):
    """The oracle fragment (_LHOST_LABELS + _REGISTRABLE_CASE), the
    Spark operator (_with_registrable), and the pure-Python matcher
    agree on every URL-universe host plus the edge grid."""
    hosts = sorted(
        {_py_url(i).split("://")[1].split("/")[0].split(":")[0]
         for i in range(N_IDS)}
    ) + _EDGE_HOSTS
    want = {h: _py_registrable(h) for h in hosts}

    assert _duck_registrable(_REGISTRABLE_CASE, hosts) == want

    hdf = spark.createDataFrame([(h,) for h in hosts], "host string")
    got_spark = {
        r["host"]: r["registrable"]
        for r in _with_registrable(hdf).select(
            "host", "registrable"
        ).collect()
    }
    assert got_spark == want


@pytest.mark.parametrize(
    "mutant",
    [
        ("THEN last3", "THEN last2"),    # suffix depth off by one
        ("ELSE lhost", "ELSE last2"),    # unlisted TLD truncated
    ],
)
def test_registrable_mutation_is_visible(mutant):
    old, new = mutant
    mutated = _REGISTRABLE_CASE.replace(old, new)
    assert mutated != _REGISTRABLE_CASE
    hosts = _EDGE_HOSTS + [
        _py_url(i).split("://")[1].split("/")[0].split(":")[0]
        for i in range(0, 600, 7)
    ]
    got = _duck_registrable(mutated, sorted(set(hosts)))
    diverged = sum(
        1 for h, r in got.items() if r != _py_registrable(h)
    )
    assert diverged > 0, f"third implementation blind to {mutant}"


# ---------------------------------------------------------------- #
# sentinels: the Python constants and their DuckDB mirrors
# ---------------------------------------------------------------- #


def test_sentinel_mirrors_are_literally_equal():
    """The DuckDB sentinel expressions are mirrors BY CONSTRUCTION —
    pin that construction: evaluating them must yield exactly the
    Python constant + doc_id, NUL byte included."""
    con = duckdb.connect()
    got_u, got_n = con.execute(
        f"SELECT {_DUCK_UNPARSED_SENTINEL}, {_DUCK_NOHOST_SENTINEL} "
        "FROM (SELECT 42 AS doc_id)"
    ).fetchone()
    assert got_u == f"{UNPARSED_SENTINEL}42"
    assert got_n == f"{NOHOST_SENTINEL}42"
    assert UNPARSED_SENTINEL.startswith("\x00")
    assert NOHOST_SENTINEL.startswith("\x00")


# ---------------------------------------------------------------- #
# SQL-front-door queries: independent DataFrame twins
# ---------------------------------------------------------------- #


def test_sql_entry_queries_have_independent_twins(spark, sf_dir):
    """q79/q80/q81 run ONE SQL string on both engines by design. The
    blindspot closer: re-derive each result with DataFrame code that
    shares no text with the SQL, and require exact row equality."""
    from rc_rag_spark.sources import table

    import rc_rag_spark.queries as q

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # q79: suppliers with any lineitem of quantity > 45 (EXISTS)
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    twin79 = (
        s.join(
            li.where(F.col("l_quantity") > 45)
            .select("l_suppkey")
            .distinct(),
            s.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        ).select("s_name", "s_acctbal")
    )
    got79 = q.REGISTRY["q79_sql_exists"].fn(spark, sf_dir)
    assert rows(twin79) == rows(got79)

    # q80: order-priority counts for customers with negative balance
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    twin80 = (
        o.join(
            c.where(F.col("c_acctbal") < 0).select("c_custkey"),
            o.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    got80 = q.REGISTRY["q80_sql_in_subquery"].fn(spark, sf_dir)
    assert rows(twin80) == rows(got80)

    # q81: top-10 nations by summed customer balance, rank-windowed
    from pyspark.sql import Window

    n = table(spark, sf_dir, "nation")
    bal = c.groupBy("c_nationkey").agg(
        F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
        .cast("double")
        .alias("total")
    )
    w = Window.orderBy(F.col("total").desc(), F.col("n_name"))
    twin81 = (
        bal.join(n, bal.c_nationkey == n.n_nationkey)
        .select("n_name", "total")
        .withColumn("rnk", F.rank().over(w).cast("int"))
        .where(F.col("rnk") <= 10)
    )
    got81 = q.REGISTRY["q81_sql_cte_rank"].fn(spark, sf_dir)
    assert rows(twin81) == rows(got81)


# ---------------------------------------------------------------- #
# the ratchet: new shared-fragment sites must come here first
# ---------------------------------------------------------------- #


def test_shared_fragment_marker_ratchet():
    """Count the ``both engines`` marker comments across the package.
    Growing the count without classifying the new site in this file's
    inventory (semantic -> third impl + mutation test; commentary ->
    note) should fail loudly here. Shrinkage is fine — tighten the
    bound when it happens."""
    hits = 0
    for path in glob.glob(
        os.path.join(REPO, "rc_rag_spark", "**", "*.py"), recursive=True
    ):
        with open(path, encoding="utf-8") as fh:
            hits += fh.read().count("both engines")
    assert hits <= 46, (
        f"{hits} 'both engines' sites (ratchet: 46) — a NEW shared "
        "fragment was added; classify it in "
        "tests/test_oracle_independence.py's inventory first"
    )
