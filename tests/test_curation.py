"""Round-10 curation family: BPE encode kernel semantics, PSL
registrable-domain edges, URL canonicalization collapse, blocklist
case-evasion, and the broadcast plan shape (rc_rag_spark/queries/
curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rc_rag_spark.queries import curation


# --------------------------------------------------------------------------
# BPE encode kernel (Spark-free)


def test_bpe_encode_greedy_run_semantics():
    """The encode kernel must implement the SAME simultaneous
    leftmost-non-overlapping pass the induction's apply step (and its
    SQL window construction) uses: within a run of consecutive
    matches, merges land on the odd offsets."""
    count = curation._bpe_encode_counts([("a", "a")])
    assert count("aaa") == 2      # [aa, a]
    assert count("aaaa") == 2     # [aa, aa]
    assert count("aaaaa") == 3    # [aa, aa, a]
    assert count("ababa") == 5    # no aa pair at all


def test_bpe_encode_is_lossless():
    """Property over random words and random merge lists: the
    segmentation always concatenates back to the input word (BPE
    never drops, duplicates, or reorders characters), and the count
    kernel equals len(segments)."""
    import random
    import string

    rng = random.Random(7)
    alpha = string.ascii_lowercase[:6]
    for trial in range(300):
        word = "".join(
            rng.choice(alpha) for _ in range(rng.randrange(0, 14))
        )
        merges = []
        pool = list(alpha)
        for _ in range(rng.randrange(0, 5)):
            left, right = rng.choice(pool), rng.choice(pool)
            merges.append((left, right))
            pool.append(left + right)  # later merges may use outputs
        seg = curation._bpe_encode_segments(merges)(word)
        assert "".join(seg) == word, (word, merges, seg)
        assert curation._bpe_encode_counts(merges)(word) == len(seg)
        assert all(s for s in seg)  # no empty tokens


def test_bpe_encode_applies_merges_in_rank_order():
    """Rank order matters: with merges [(a,b), (ab,c)] the word 'abc'
    becomes [ab, c] then [abc] — one token; with the ranks reversed,
    (ab,c) can never fire before 'ab' exists, leaving two tokens."""
    fwd = curation._bpe_encode_counts([("a", "b"), ("ab", "c")])
    rev = curation._bpe_encode_counts([("ab", "c"), ("a", "b")])
    assert fwd("abc") == 1
    assert rev("abc") == 2
    # merged symbols compare as STRINGS: 'ab' from a merge matches the
    # left side of a later merge exactly
    assert fwd("abcabc") == 2


def test_bpe_encode_no_intra_pass_cascade():
    """Within ONE merge pass the matches are simultaneous on the
    pre-pass symbol sequence: merging (a,b) in 'aab' gives [a, ab]; the
    freshly formed 'ab' must NOT immediately re-match inside the same
    pass even when the merge's left symbol equals its output prefix."""
    count = curation._bpe_encode_counts([("a", "ab")])
    # symbols [a, a, b]: no (a, ab) pair exists pre-pass
    assert count("aab") == 3


# --------------------------------------------------------------------------
# Registrable-domain (PSL) edges


def _registrable(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    parsed = df.select(
        "host",
        F.lit("x").alias("source"),
        F.lit("http").alias("proto"),
    )
    out = curation._with_registrable(parsed)
    return {r["host"]: (r["registrable"], r["public_suffix"])
            for r in out.collect()}


def test_registrable_domain_edges(spark):
    got = _registrable(
        spark,
        [
            "site5.com",            # 1-label suffix, bare
            "www.site5.com",        # subdomain
            "a.b.site5.com",        # deep subdomain
            "site9.co.uk",          # 2-label suffix, bare
            "cdn.site9.co.uk",      # 2-label suffix + subdomain
            "SITE5.COM",            # case noise must not split
            "localhost",            # no known suffix -> host itself
            "site1.internal",       # unknown TLD -> host itself
        ],
    )
    assert got["site5.com"] == ("site5.com", "com")
    assert got["www.site5.com"] == ("site5.com", "com")
    assert got["a.b.site5.com"] == ("site5.com", "com")
    assert got["site9.co.uk"] == ("site9.co.uk", "co.uk")
    assert got["cdn.site9.co.uk"] == ("site9.co.uk", "co.uk")
    assert got["SITE5.COM"] == ("site5.com", "com")
    assert got["localhost"] == ("localhost", None)
    assert got["site1.internal"] == ("site1.internal", None)


# --------------------------------------------------------------------------
# Canonicalization collapse


def test_canonical_collapses_presentation_variants(spark):
    """Every presentation variant of one page — case, default port,
    trailing slash, param order, fragment — must canonicalize to ONE
    string; semantically different URLs (real port, different param
    value, https vs http) must NOT collapse."""
    variants = [
        "http://WWW.Site5.COM/p/3?q=4&ref=r1",
        "http://www.site5.com:80/p/3?q=4&ref=r1",
        "http://www.site5.com/p/3/?q=4&ref=r1",
        "http://www.site5.com/p/3?ref=r1&q=4",
        "http://www.site5.com/p/3?q=4&ref=r1#sec2",
    ]
    distinct = [
        "http://www.site5.com:8080/p/3?q=4&ref=r1",  # real port
        "https://www.site5.com/p/3?q=4&ref=r1",      # scheme
        "http://www.site5.com/p/3?q=5&ref=r1",       # param value
        "http://www.site5.com/p/4?q=4&ref=r1",       # path
    ]
    df = spark.createDataFrame(
        [(u,) for u in variants + distinct], "url string"
    )
    canon = (
        curation.parse_urls(df)
        .select(curation.canonical_url_col())
        .collect()
    )
    vals = [r["canonical"] for r in canon]
    collapsed = set(vals[: len(variants)])
    assert collapsed == {"http://www.site5.com/p/3?q=4&ref=r1"}, vals
    # the distinct set stays distinct from the collapsed one and from
    # each other
    assert len(set(vals)) == 1 + len(distinct)


def test_blocklist_matches_case_noised_hosts(spark):
    """A blocklisted registrable domain must be caught even when the
    URL presents the host in uppercase or behind a subdomain — the
    match runs on the lowercased registrable, not the raw host."""
    bl = set(curation._BLOCKLIST)
    target = sorted(bl - {"evil.example"})[0]
    urls = [
        f"http://{target.upper()}/p/1",
        f"http://www.{target}/p/1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    reg = curation._with_registrable(curation.parse_urls(df))
    assert [r["registrable"] for r in reg.collect()] == [target, target]


def test_parse_urls_agrees_with_urllib_grid(spark):
    """Cross-validation against an independent implementation: for a
    grid of component combinations (scheme x subdomain x case x port x
    path x query x fragment — 432 URLs), Spark's parse_url
    (java.net.URI) must agree with CPython's urllib.parse on scheme,
    host, port, path, query, and fragment. One Spark job for the whole
    grid."""
    from itertools import product
    from urllib.parse import urlsplit

    urls = []
    for scheme, sub, case_up, port, path, query, frag in product(
        ["http", "https"],
        ["", "www.", "a.b."],
        [False, True],
        ["", ":80", ":8080"],
        ["/", "/p/3", "/p/3/"],
        ["", "?q=1", "?q=1&ref=r2"],
        ["", "#s"],
    ):
        host = f"{sub}site7.co.uk"
        if case_up:
            host = host.upper()
        urls.append(f"{scheme}://{host}{port}{path}{query}{frag}")

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r
        for r in curation.parse_urls(df).collect()
    }
    assert len(got) == len(urls)
    for u in urls:
        want = urlsplit(u)
        r = got[u]
        assert r["proto"] == want.scheme, u
        # urllib lowercases hostname; java.net.URI preserves case
        assert r["host"].lower() == want.hostname, u
        assert (r["port"] or None) == (
            str(want.port) if want.port is not None else None
        ), u
        assert r["path"] == want.path, u
        assert (r["query"] or None) == (want.query or None), u
        assert (r["frag"] or None) == (want.fragment or None), u


def test_q278_plan_is_broadcast_only(spark):
    """The PSL attach must be two BroadcastHashJoins — a SortMergeJoin
    here would shuffle the whole corpus against an 7-row suffix
    table."""
    import rc_rag_spark.queries as q

    plan = q.REGISTRY["q278_registrable_domain_rollup"].fn(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_parse_and_canonical_agree_with_urllib_fuzz(spark):
    """Seeded-RANDOM cross-validation (VERDICT r13 #7): ~10k URLs —
    8k clean component combinations plus 2k deliberately messy ones
    (unicode hosts, userinfo, out-of-range/odd ports, missing
    schemes, bad escapes) — checked against CPython's urllib.parse as
    the independent implementation.

    Rules of engagement (the two parsers differ BY DESIGN on garbage):
      - every CLEAN url must parse non-NULL in Spark and agree with
        urllib on scheme/host/port/path/query/fragment, and its
        canonical form must equal a urllib-derived python mirror of
        canonical_url_col's semantics;
      - a MESSY url may parse to NULL host in Spark (java.net.URI is
        stricter); when BOTH sides produce a host they must agree
        (case-insensitively). A Spark host urllib cannot reproduce is
        a real divergence and fails.
    One Spark job for the whole corpus."""
    import random
    import re
    from urllib.parse import urlsplit

    rng = random.Random(20260816)

    schemes = ["http", "https", "ftp"]
    userinfos = ["", "user@", "u:pw@"]
    hosts = [
        "example.com", "a-b.c0.org", "SITE7.CO.UK", "x.y.z.example",
        "h123.net", "single", "deep.a.b.site1.com.au", "0start.io",
    ]
    ports = ["", ":80", ":443", ":8080", ":1", ":65000"]
    paths = ["", "/", "/p/3", "/p/3/", "/a/../b", "/a%20b/c",
             "/;params/x", "/~user/x.y"]
    queries = ["", "?q=1", "?b=2&a=1", "?a=%2F&z=9", "?dup=1&dup=0",
               "?k=v&k2="]
    frags = ["", "#s", "#a/b?c", "#%20x"]

    clean = []
    for _ in range(8000):
        clean.append(
            f"{rng.choice(schemes)}://{rng.choice(userinfos)}"
            f"{rng.choice(hosts)}{rng.choice(ports)}{rng.choice(paths)}"
            f"{rng.choice(queries)}{rng.choice(frags)}"
        )

    messy_hosts = [
        "münchen.de", "пример.example",
        "_under.com", "ex ample.com", "example.com.", "..", "a..b.com",
        "[::1]", "two@ats@h.com", "",
    ]
    messy = []
    for _ in range(2000):
        kind = rng.randrange(6)
        h = rng.choice(messy_hosts)
        if kind == 0:
            messy.append(f"http://{h}:8080/p")
        elif kind == 1:
            messy.append(f"http://{h}:{rng.choice(['8a', '99999', ''])}/p")
        elif kind == 2:
            messy.append(f"//{h}/no-scheme")
        elif kind == 3:
            messy.append(f"http:///{rng.choice(['path', ''])}")
        elif kind == 4:
            messy.append(f"http://{h}/%zz{rng.randrange(10)}")
        else:
            messy.append(rng.choice([":::", "http:/one", "?", "#", " "]))

    urls = clean + messy
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "uid long, url string"
    )
    parsed = curation.parse_urls(df).select(
        "uid", "url", "proto", "host", "port", "path", "query", "frag",
        curation.canonical_url_col(),
    )
    got = {r["uid"]: r for r in parsed.collect()}
    assert len(got) == len(urls)

    def py_netloc_port(netloc: str) -> str | None:
        rest = netloc.rsplit("@", 1)[-1]
        if ":" in rest and not rest.endswith("]"):
            cand = rest.rsplit(":", 1)[1]
            if cand.isdigit():
                return cand
        return None

    def py_canonical(u: str) -> str | None:
        w = urlsplit(u)
        if not w.scheme or not w.hostname:
            return None
        port = py_netloc_port(w.netloc)
        if port and (
            (w.scheme, port) in (("http", "80"), ("https", "443"))
        ):
            port = None
        return (
            w.scheme + "://" + w.hostname
            + (f":{port}" if port else "")
            + re.sub(r"/$", "", w.path)
            + (f"?{'&'.join(sorted(w.query.split('&')))}" if w.query
               else "")
        )

    for i, u in enumerate(clean):
        w = urlsplit(u)
        r = got[i]
        assert r["host"] is not None, f"clean url failed to parse: {u}"
        assert r["proto"] == w.scheme, u
        assert r["host"].lower() == w.hostname, u
        assert (r["port"] or None) == py_netloc_port(w.netloc), u
        assert r["path"] == w.path, u
        assert (r["query"] or None) == (w.query or None), u
        assert (r["frag"] or None) == (w.fragment or None), u
        assert r["canonical"] == py_canonical(u), u

    n_messy_parsed = 0
    for j, u in enumerate(messy):
        r = got[len(clean) + j]
        if r["host"] is None:
            continue
        n_messy_parsed += 1
        try:
            w = urlsplit(u)
            py_host = w.hostname
        except ValueError:
            py_host = None
        # java.net.URI keeps IPv6 brackets ([::1]); urllib strips them
        got_host = r["host"].lower().strip("[]")
        assert py_host is not None and got_host == py_host, (
            f"Spark parsed a host urllib cannot reproduce: {u!r} -> "
            f"{r['host']!r} vs {py_host!r}"
        )
    # the messy pool must actually exercise BOTH outcomes
    assert 0 < n_messy_parsed < len(messy)
