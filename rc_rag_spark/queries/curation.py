"""Round-10 curation batch: real-BPE token accounting + the
URL/domain curation family.

  - q275: BPE ENCODE — apply the q172-learned merges to the corpus
    and produce REAL per-document token counts. The scale shape is
    encode-the-vocabulary, not encode-the-corpus: distinct words are
    encoded once by an Arrow-batched kernel with the (tiny) merge
    table shipped in the task closure, then per-doc token counts come
    from a word-count join — the corpus itself is scanned once and
    never re-tokenized per merge step. This is how tokenizer
    application runs on a real pretraining corpus: vocab-sized Python
    work, corpus-sized JVM work.
  - q276: q247's token-budget selection re-expressed on q275's REAL
    BPE token counts instead of the ceil(chars/4) proxy — the budget
    a training run actually spends. Shares q247's quantile-threshold
    kernel (corpus.token_budget_select) unchanged.
  - q277: URL parsing — scheme/host/port/path/query-param/fragment
    via Spark's codegen'd ``try_parse_url`` (java.net.URI semantics;
    NULL fields on malformed URLs instead of a job-killing
    [INVALID_URL], round 12), rolled up to distinct parse shapes. URLs are derived
    deterministically from doc_id (the testdata has no URL column),
    with page identity on ``doc_id % 499`` and presentation noise
    (case, default ports, trailing slash, param order, fragments) on
    doc_id — so the parse/canonicalize operators face realistic mess
    while both engines can derive the identical input.
  - q278: registrable-domain (eTLD+1) rollup — longest-suffix match
    against a vendored public-suffix sample via two BROADCAST left
    joins (2-label suffixes, then 1-label), the join shape a real
    ~9k-entry PSL would use at 100 TB.
  - q279: domain blocklist filter — broadcast join of each URL's
    registrable domain against a blocklist; per-source kept/blocked
    counts (kept == the LEFT ANTI JOIN the production filter runs).
  - q280: URL canonicalization dedup — lowercase host, strip default
    ports and fragments, trim trailing slash, SORT query params;
    per-source canonical-URL dedup stats (page variants collapse to
    one canonical form).

These are "beyond-the-reference" training-data-pipeline operators
(SURVEY.md §2.2): the reference pipeline starts from already-curated
text (reference: code/utils.py:16 has_answer / :26 Tokens — uncased
word/ngram normalization is as far upstream as it goes), so the URL
family supplies the standard upstream curation stage (PSL rollup per
Mozilla's public-suffix algorithm; canonical form per RFC 3986 §6)
expressed as declarative Spark plans with DuckDB oracles. The BPE
pair extends q172 (itself beyond-reference) from merge induction to
corpus encoding.
"""

from __future__ import annotations

from pyspark.sql import Window  # noqa: F401  (imported for parity with siblings)
from pyspark.sql import functions as F

from rc_rag_spark.checkpoints import ckpt as _ckpt
from rc_rag_spark.queries.core import register
from rc_rag_spark.queries.corpus import (
    _BUDGET_SEL_CTES,
    _BUDGET_TAIL_SQL,
    _Q247_LETTERS,
    _Q247_LETTERS_DUCK,
    budget_selected_docs,
    token_budget_select,
)
from rc_rag_spark.queries.scale_batch import (
    _BPE_STEPS,
    _bpe_cte_prefix,
    bpe_induce,
)
from rc_rag_spark.sources import table, wide_table

# --------------------------------------------------------------------------
# q275/q276 — BPE encode: real token counts from the learned merges.

# Oracle CTEs shared by q275 and q276: after the induction prefix,
# s{R} IS the vocabulary encoded under the learned merges (induction's
# apply step IS encode), so per-word token counts are COUNT(pos), and
# per-doc counts are a word-frequency join.
_BPE_DOC_CTES = f""",
    wtoks AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM s{_BPE_STEPS} GROUP BY word),
    doctoks AS (
        SELECT doc_id, source,
               unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
        FROM documents),
    dw AS (
        SELECT doc_id, source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM doctoks WHERE tok <> '' GROUP BY doc_id, source, tok),
    doc AS (
        SELECT dw.doc_id, dw.source,
               CAST(SUM(w.n_tok * dw.cnt) AS BIGINT) AS bpe_tokens
        FROM dw JOIN wtoks w ON w.word = dw.tok
        GROUP BY dw.doc_id, dw.source)"""


def _bpe_encode_segments(merges):
    """Greedy BPE encoder over a word, applying merges in RANK order,
    each pass leftmost-first without overlap — the same simultaneous
    odd-offset-within-run semantics the induction's apply step (and
    the SQL oracle's window construction) uses. Returns the token
    (segment) list; encoding is LOSSLESS by construction —
    ''.join(segments) == word (pinned by
    tests/test_curation.py::test_bpe_encode_is_lossless)."""

    def segments(word: str) -> list[str]:
        syms = list(word)
        for left, right in merges:
            out = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    return segments


def _bpe_encode_counts(merges):
    """Token-count view of _bpe_encode_segments (the hot kernel shape
    q275 ships to executors)."""
    segments = _bpe_encode_segments(merges)
    return lambda word: len(segments(word))


def bpe_doc_token_counts(spark, sf_dir):
    """(doc_id, source, bpe_tokens): learn the _BPE_STEPS merges with
    q172's distributed induction, take each word's token count as the
    LENGTH of its final segmentation array (induction's apply step IS
    encode — after the last fold, size(syms) is the encoded length),
    broadcast the encoded vocab, and partial-aggregate token counts
    per doc.

    Optimization round 15 (guide §4): the former Arrow mapInPandas
    encode kernel — a per-word Python loop re-applying the collected
    merge table to the vocabulary a second time — is GONE, along with
    the driver collect() of the merges and the whole JVM<->Python
    boundary of this path (plan: ArrowEvalPython node removed). The
    induction already computes every word's final segmentation; q275
    previously threw it away and re-derived it in Python.

    Shuffle accounting (the part that matters at 100 TB): the exploded
    token stream never shuffles on a token key — it broadcast-joins
    the (vocab-sized) word->n_tok map and immediately hash-aggregates
    on doc_id, where map-side combine collapses each document to ONE
    row before the exchange (a doc's tokens are contiguous in its
    input split), so the only corpus-wide shuffle carries |docs| rows.
    The vocabulary groupBy is the other exchange, and it is
    vocab-sized after per-task partial aggregation. When the
    vocabulary outgrows the broadcast budget (~100M+ words), swap the
    broadcast for a shuffle join on tok; the doc_id partial agg is
    unchanged. (A wide_table rebalance of this scan was measured a net
    loss at sf0.1 — the explode feeds map-side partial aggs that
    collapse in place, so extra tasks only add scheduling overhead
    and a wider vocab exchange.)"""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    words = toks.groupBy(F.col("tok").alias("word")).agg(
        F.count("*").alias("wc")
    )
    syms, _ = bpe_induce(words)
    encoded = syms.select(
        F.col("word").alias("tok"),
        F.size("syms").cast("bigint").alias("n_tok"),
    )
    return (
        toks.join(F.broadcast(encoded), "tok")
        .groupBy("doc_id", "source")
        .agg(F.sum("n_tok").alias("bpe_tokens"))
    )


@register(
    "q275_bpe_encode_tokens",
    sql=_bpe_cte_prefix()
    + _BPE_DOC_CTES
    + """
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.bpe_tokens) AS BIGINT) AS bpe_tokens,
           CAST(SUM(CAST(ceil(c.n_chars / 4.0) AS BIGINT)) AS BIGINT)
               AS naive_tokens,
           round(CAST(SUM(d.bpe_tokens) AS DOUBLE)
                 / CAST(SUM(c.n_chars) AS DOUBLE), 6) AS tokens_per_char
    FROM doc d JOIN documents c ON c.doc_id = d.doc_id
    GROUP BY d.source""",
    tags=("text", "tokenizer", "bpe", "encode"),
)
def q275_bpe_encode_tokens(spark, sf_dir):
    """Real BPE token accounting per source: learn merges (q172), then
    ENCODE via the broadcast-merge Arrow kernel over the distinct-word
    vocabulary, per-doc counts by word-frequency join, rolled up per
    source against the ceil(chars/4) proxy the budget queries used
    until now. tokens_per_char exposes how far the proxy sits from the
    learned tokenizer. The oracle replays induction + encode as one
    chained-CTE program (the induction's apply step IS encode), so
    every learned merge, every word's greedy segmentation, and every
    doc rollup is hash-checked."""
    per_doc = bpe_doc_token_counts(spark, sf_dir)
    chars = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        per_doc.join(chars, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("bpe_tokens").cast("bigint").alias("bpe_tokens"),
            F.sum(F.ceil(F.col("n_chars") / 4.0).cast("bigint"))
            .cast("bigint")
            .alias("naive_tokens"),
            F.round(
                F.sum("bpe_tokens").cast("double")
                / F.sum("n_chars").cast("double"),
                6,
            ).alias("tokens_per_char"),
        )
    )


@register(
    "q276_token_budget_real_bpe",
    sql=_bpe_cte_prefix()
    + _BPE_DOC_CTES
    + f""",
    d AS (
        SELECT o.doc_id, o.source, o.bpe_tokens AS tokens,
               (1000 * {_Q247_LETTERS_DUCK.replace('text', 't.text')})
                   // t.n_chars AS bucket
        FROM doc o JOIN documents t ON t.doc_id = o.doc_id),{_BUDGET_TAIL_SQL}""",
    tags=("training", "selection", "budget", "bpe"),
)
def q276_token_budget_real_bpe(spark, sf_dir):
    """q247's quantile-threshold token-budget selection, spent in REAL
    BPE tokens: the per-doc counts come from the learned tokenizer
    (q275's encode path) instead of the ceil(chars/4) proxy, so the
    selected half of the corpus is the half a training run would
    actually fit. Same scalable kernel (token_budget_select): bucket
    grid aggregation + one per-doc prefix sum over only the boundary
    bucket. Optimization round 16 (guide §5 reuse): ``d`` is referenced
    four times inside budget_selected_docs, so the BPE encode subtree
    used to execute 4x per run; the checkpoint materializes the narrow
    (doc_id, source, tokens, bucket) rows once. Same values, same
    oracle."""
    per_doc = bpe_doc_token_counts(spark, sf_dir)
    buckets = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"(1000 * {_Q247_LETTERS}) div n_chars").alias("bucket"),
    )
    d = per_doc.join(buckets, "doc_id").select(
        "doc_id", "source", F.col("bpe_tokens").alias("tokens"), "bucket"
    ).transform(_ckpt)
    return token_budget_select(d)


# --------------------------------------------------------------------------
# q277-q280 — URL/domain curation family.

# Deterministic URL derivation (identical SQL in both engines): page
# identity from doc_id % 499, presentation noise from doc_id itself.
_PID = "(doc_id % 499)"
_U_SCHEME = f"CASE WHEN {_PID} % 3 = 0 THEN 'https' ELSE 'http' END"
_U_HOST_LOWER = (
    f"CASE {_PID} % 4 WHEN 1 THEN 'www.' WHEN 2 THEN 'cdn.'"
    f" WHEN 3 THEN 'a.b.' ELSE '' END"
    f" || 'site' || CAST({_PID} % 97 AS STRING) || '.' || "
    f"CASE {_PID} % 7 WHEN 0 THEN 'com' WHEN 1 THEN 'org'"
    f" WHEN 2 THEN 'net' WHEN 3 THEN 'co.uk' WHEN 4 THEN 'ac.uk'"
    f" WHEN 5 THEN 'io' ELSE 'com.au' END"
)
_U_HOST = (
    f"CASE WHEN doc_id % 8 = 0 THEN upper({_U_HOST_LOWER})"
    f" ELSE ({_U_HOST_LOWER}) END"
)
_U_PORT = (
    f"CASE WHEN {_PID} % 5 = 0 THEN ':8080'"
    f" WHEN doc_id % 5 = 1 THEN"
    f" (CASE WHEN {_PID} % 3 = 0 THEN ':443' ELSE ':80' END)"
    f" ELSE '' END"
)
_U_PATH = (
    f"'/p/' || CAST({_PID} % 13 AS STRING)"
    f" || CASE WHEN doc_id % 9 = 0 THEN '/' ELSE '' END"
)
_U_QUERY = (
    f"CASE WHEN {_PID} % 2 = 0 THEN (CASE WHEN doc_id % 4 = 0"
    f" THEN '?ref=r' || CAST({_PID} % 4 AS STRING)"
    f" || '&q=' || CAST({_PID} % 11 AS STRING)"
    f" ELSE '?q=' || CAST({_PID} % 11 AS STRING)"
    f" || '&ref=r' || CAST({_PID} % 4 AS STRING) END) ELSE '' END"
)
_U_FRAG = (
    "CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id % 3 AS STRING)"
    " ELSE '' END"
)
_URL_EXPR = (
    f"({_U_SCHEME}) || '://' || ({_U_HOST}) || ({_U_PORT})"
    f" || ({_U_PATH}) || ({_U_QUERY}) || ({_U_FRAG})"
)

# DuckDB-side parse (Spark uses parse_url; java.net.URI semantics):
_DUCK_PARSE = """
        SELECT doc_id, source, url,
               regexp_extract(url, '^([a-z]+)://', 1) AS proto,
               regexp_extract(url, '^[a-z]+://([^/?#:]+)', 1) AS host,
               nullif(regexp_extract(url,
                   '^[a-z]+://[^/?#:]+:([0-9]+)', 1), '') AS port,
               regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1)
                   AS path,
               nullif(regexp_extract(url, '\\?([^#]*)', 1), '')
                   AS query,
               nullif(regexp_extract(url, '[?&]q=([^&#]*)', 1), '')
                   AS q_param,
               nullif(regexp_extract(url, '#(.*)$', 1), '') AS frag
        FROM u"""

# NULL-URL sentinel semantics, shared by the QUERY corpus (q280/q282/
# q284) and the resumable PIPELINE (pipeline/curation.py) — the one
# semantic for dirty crawl input (ADVICE r12): a doc whose URL is NULL
# or unparseable gets a PER-DOC key, so canonical dedup keeps it (no
# one-NULL-group min-id collapse) and the domain quota never caps all
# unparseable docs together as one pseudo-domain. The NUL prefix makes
# collision with a real canonical URL / registrable domain impossible;
# the sentinel never reaches output (it only keys groupBy / windows).
UNPARSED_SENTINEL = "\x00unparsed:"
NOHOST_SENTINEL = "\x00nohost:"
_DUCK_UNPARSED_SENTINEL = "chr(0) || 'unparsed:' || CAST(doc_id AS VARCHAR)"
_DUCK_NOHOST_SENTINEL = "chr(0) || 'nohost:' || CAST(doc_id AS VARCHAR)"

# Vendored public-suffix sample (a real deployment broadcasts the full
# ~9k-entry PSL through the same two-join shape).
_PSL2 = ["ac.uk", "co.uk", "com.au"]
_PSL1 = ["com", "io", "net", "org"]
_SUFFIX_BY_MOD = ["com", "org", "net", "co.uk", "ac.uk", "io", "com.au"]


def _registrable_for_pid(pid: int) -> str:
    return f"site{pid % 97}.{_SUFFIX_BY_MOD[pid % 7]}"


_BLOCKLIST = sorted(
    {_registrable_for_pid(p) for p in (0, 13, 101, 250, 444)}
) + ["evil.example"]

# lowercased host + suffix labels, shared by q278/q279 (both engines):
_LHOST_LABELS = """
               lower(host) AS lhost,
               regexp_extract(lower(host), '([^.]+)$', 1) AS last1,
               regexp_extract(lower(host), '([^.]+\\.[^.]+)$', 1) AS last2,
               regexp_extract(lower(host),
                   '([^.]+\\.[^.]+\\.[^.]+)$', 1) AS last3"""

_REGISTRABLE_CASE = """
               CASE WHEN p2.s IS NOT NULL THEN last3
                    WHEN p1.s IS NOT NULL THEN last2
                    ELSE lhost END AS registrable"""


def _values_cte(name: str, items: list[str]) -> str:
    rows = ", ".join(f"('{s}')" for s in items)
    return f"{name}(s) AS (VALUES {rows})"


def values_table(spark, col: str, items: list[str]):
    """Tiny constant string table as a pure-JVM LocalRelation (VALUES).

    Optimization round 15 (guide §4): ``spark.createDataFrame(list)``
    builds these through a pickled Python RDD — every broadcast build
    over one schedules defaultParallelism (32) Python worker tasks to
    deserialize a handful of strings, measured at ~1 s of executor
    run time PER reference at sf0.1 (two PSL builds inside every URL
    query). A VALUES LocalRelation never launches a job at all: the
    broadcast hash relation is built driver-side from the literal
    rows. The module-level PSL/blocklist constants are plain ASCII,
    but pipeline callers pass user-supplied lists, so three guards:
    an empty list (invalid ``VALUES `` SQL) returns an empty relation;
    backslashes are doubled (Spark SQL string literals treat ``\\`` as
    an escape); values with control characters or other non-printables
    fall back to the safe createDataFrame path rather than literal
    interpolation."""
    if not items:
        return spark.createDataFrame([], f"{col} string")
    if any(not s.isprintable() for s in items):
        return spark.createDataFrame([(s,) for s in items], f"{col} string")
    rows = ", ".join(
        "('{}')".format(s.replace("\\", "\\\\").replace("'", "''"))
        for s in items
    )
    return spark.sql(f"SELECT * FROM (VALUES {rows}) AS t({col})")


def parse_urls(df):
    """Attach proto/host/port/path/query/q_param/frag to any DataFrame
    with a ``url`` column via Spark's try_parse_url — the JVM-side,
    codegen'd parser (java.net.URI field semantics). The try_ variant
    is load-bearing at crawl scale: plain parse_url THROWS
    [INVALID_URL] on the first malformed URL (killing the whole job),
    while try_parse_url yields NULL fields, which the downstream
    stages route around (pipeline dedup/quota key on per-doc
    sentinels for NULL; q279's blocklist equi-join never matches
    NULL)."""
    return df.select(
        "*",
        F.try_parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.try_parse_url("url", F.lit("HOST")).alias("host"),
        F.expr(
            "nullif(regexp_extract(try_parse_url(url, 'AUTHORITY'),"
            " ':([0-9]+)$', 1), '')"
        ).alias("port"),
        F.try_parse_url("url", F.lit("PATH")).alias("path"),
        F.try_parse_url("url", F.lit("QUERY")).alias("query"),
        F.try_parse_url("url", F.lit("QUERY"), F.lit("q")).alias(
            "q_param"
        ),
        F.try_parse_url("url", F.lit("REF")).alias("frag"),
    )


def _parsed_urls(spark, sf_dir):
    """documents -> (doc_id, source, url, parsed fields)."""
    return parse_urls(
        table(spark, sf_dir, "documents").select(
            "doc_id", "source", F.expr(_URL_EXPR).alias("url")
        )
    )


def _with_registrable(parsed):
    """Attach the registrable domain (eTLD+1) via longest-suffix match:
    two BROADCAST left joins against the vendored PSL sample (2-label
    suffixes first, then 1-label), CASE-resolved — zero corpus
    shuffles; at 100 TB the full PSL rides the same two broadcasts."""
    spark = parsed.sparkSession
    psl2 = values_table(spark, "s2", _PSL2)
    psl1 = values_table(spark, "s1", _PSL1)
    lab = parsed.select(
        "*",
        F.lower("host").alias("lhost"),
        F.regexp_extract(F.lower("host"), r"([^.]+)$", 1).alias("last1"),
        F.regexp_extract(F.lower("host"), r"([^.]+\.[^.]+)$", 1).alias(
            "last2"
        ),
        F.regexp_extract(
            F.lower("host"), r"([^.]+\.[^.]+\.[^.]+)$", 1
        ).alias("last3"),
    )
    return (
        lab.join(
            F.broadcast(psl2), lab["last2"] == psl2["s2"], "left"
        )
        .join(F.broadcast(psl1), lab["last1"] == psl1["s1"], "left")
        .select(
            "*",
            F.when(F.col("s2").isNotNull(), F.col("last3"))
            .when(F.col("s1").isNotNull(), F.col("last2"))
            .otherwise(F.col("lhost"))
            .alias("registrable"),
            F.when(F.col("s2").isNotNull(), F.col("s2"))
            .when(F.col("s1").isNotNull(), F.col("s1"))
            .otherwise(F.lit(None).cast("string"))
            .alias("public_suffix"),
        )
    )


@register(
    "q277_url_parse",
    sql=f"""
    WITH u AS (
        SELECT doc_id, source, {_URL_EXPR} AS url FROM documents),
    p AS ({_DUCK_PARSE})
    SELECT proto, host, port, path, query, q_param, frag,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(MIN(doc_id) AS BIGINT) AS sample_doc
    FROM p
    GROUP BY proto, host, port, path, query, q_param, frag
    """,
    tags=("url", "parse", "curation"),
)
def q277_url_parse(spark, sf_dir):
    """URL decomposition at corpus scale: Spark's ``try_parse_url``
    (codegen'd java.net.URI field extraction — PROTOCOL/HOST/PATH/
    QUERY/per-key QUERY/REF, port from AUTHORITY; the try_ variant
    yields NULL fields on malformed URLs instead of failing the job,
    which is what a real crawl feed requires) over deterministic
    synthetic URLs, rolled up to distinct parse shapes. The oracle
    re-derives every field with anchored regexes, so scheme/host/port
    splitting, query-param extraction, and NULL-vs-empty semantics
    (absent query/fragment must be NULL, not '') are all
    hash-checked. One scan, one hash aggregate — no UDFs, nothing
    leaves the JVM."""
    return (
        _parsed_urls(spark, sf_dir)
        .groupBy("proto", "host", "port", "path", "query", "q_param", "frag")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("doc_id").alias("sample_doc"),
        )
    )


@register(
    "q278_registrable_domain_rollup",
    sql=f"""
    WITH {_values_cte('psl2', _PSL2)},
    {_values_cte('psl1', _PSL1)},
    u AS (
        SELECT doc_id, source, {_URL_EXPR} AS url FROM documents),
    p AS ({_DUCK_PARSE}),
    lab AS (
        SELECT p.*,{_LHOST_LABELS}
        FROM p),
    reg AS (
        SELECT lab.*,{_REGISTRABLE_CASE},
               COALESCE(p2.s, p1.s) AS public_suffix
        FROM lab
        LEFT JOIN psl2 p2 ON p2.s = lab.last2
        LEFT JOIN psl1 p1 ON p1.s = lab.last1)
    SELECT registrable, public_suffix,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT lhost) AS BIGINT) AS n_hosts,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM reg GROUP BY registrable, public_suffix
    """,
    tags=("url", "domain", "psl", "curation"),
)
def q278_registrable_domain_rollup(spark, sf_dir):
    """Registrable-domain (eTLD+1) rollup — the unit of web curation
    policy (per-site quotas, reputation, dedup scope). Longest-suffix
    match against the vendored public-suffix sample via two broadcast
    left joins (never a UDF, never a corpus shuffle): if the host's
    last TWO labels are a public suffix (co.uk), the registrable
    domain is three labels; else if the last label is (com), two; a
    deep subdomain (a.b.site5.com) still resolves to site5.com. Hosts
    are lowercased first so case noise can't split a domain."""
    reg = _with_registrable(_parsed_urls(spark, sf_dir))
    return reg.groupBy("registrable", "public_suffix").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("lhost").alias("n_hosts"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "q279_domain_blocklist_filter",
    sql=f"""
    WITH {_values_cte('psl2', _PSL2)},
    {_values_cte('psl1', _PSL1)},
    {_values_cte('blocklist', _BLOCKLIST)},
    u AS (
        SELECT doc_id, source, {_URL_EXPR} AS url FROM documents),
    p AS ({_DUCK_PARSE}),
    lab AS (
        SELECT p.*,{_LHOST_LABELS}
        FROM p),
    reg AS (
        SELECT lab.*,{_REGISTRABLE_CASE}
        FROM lab
        LEFT JOIN psl2 p2 ON p2.s = lab.last2
        LEFT JOIN psl1 p1 ON p1.s = lab.last1),
    flagged AS (
        SELECT reg.source,
               CASE WHEN b.s IS NULL THEN 0 ELSE 1 END AS blocked
        FROM reg LEFT JOIN blocklist b ON b.s = reg.registrable)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(SUM(blocked) AS BIGINT) AS n_blocked,
           CAST(COUNT(*) - SUM(blocked) AS BIGINT) AS n_kept
    FROM flagged GROUP BY source
    """,
    tags=("url", "blocklist", "anti-join", "curation"),
)
def q279_domain_blocklist_filter(spark, sf_dir):
    """Blocklist filtering at the registrable-domain level — the
    production crawl filter: a broadcast join of each URL's eTLD+1
    against the blocklist, counted per source. The kept set is exactly
    what ``LEFT ANTI JOIN blocklist`` would pass (the flag formulation
    is used so kept AND blocked are both auditable in one pass — a
    governance requirement: you report what you removed). Case noise
    in hosts cannot evade the filter because matching runs on the
    lowercased registrable domain."""
    reg = _with_registrable(_parsed_urls(spark, sf_dir))
    bl = values_table(reg.sparkSession, "b", _BLOCKLIST)
    flagged = reg.join(
        F.broadcast(bl), reg["registrable"] == bl["b"], "left"
    ).select(
        "source",
        F.when(F.col("b").isNull(), 0).otherwise(1).alias("blocked"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_urls"),
        F.sum("blocked").cast("bigint").alias("n_blocked"),
        (F.count("*") - F.sum("blocked")).cast("bigint").alias("n_kept"),
    )


# Canonical form (both engines): lowercase host, strip default ports
# (http:80 / https:443) but KEEP real ones, trim one trailing slash,
# sort query params, drop fragments.
# The NULL-guard mirrors Spark's concat-NULL propagation: DuckDB's
# regexp_extract yields '' (not NULL) on a non-matching dirty URL, so
# without it an unparseable URL would canonicalize to '://' garbage on
# the oracle side while Spark's try_parse_url path yields NULL.
_DUCK_CANONICAL_EXPR = """
               CASE WHEN nullif(host, '') IS NULL
                      OR nullif(proto, '') IS NULL THEN NULL
               ELSE proto || '://' || lower(host)
               || CASE WHEN port IS NULL THEN ''
                       WHEN (proto = 'http' AND port = '80')
                         OR (proto = 'https' AND port = '443') THEN ''
                       ELSE ':' || port END
               || regexp_replace(path, '/$', '')
               || CASE WHEN query IS NULL THEN ''
                       ELSE '?' || array_to_string(
                           list_sort(string_split(query, '&')), '&') END
               END"""
_DUCK_CANONICAL = _DUCK_CANONICAL_EXPR + " AS canonical"
_DUCK_CANONICAL_SENTINEL = (
    "COALESCE(" + _DUCK_CANONICAL_EXPR + f""",
                   {_DUCK_UNPARSED_SENTINEL}) AS canonical"""
)


@register(
    "q280_url_canonical_dedup",
    sql=f"""
    WITH u AS (
        SELECT doc_id, source, {_URL_EXPR} AS url FROM documents),
    p AS ({_DUCK_PARSE}),
    c AS (
        SELECT source,{_DUCK_CANONICAL_SENTINEL}
        FROM p),
    g AS (
        SELECT source, canonical, CAST(COUNT(*) AS BIGINT) AS n
        FROM c GROUP BY source, canonical)
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_urls,
           CAST(COUNT(*) AS BIGINT) AS n_canonical,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_urls,
           CAST(MAX(n) AS BIGINT) AS max_variants
    FROM g GROUP BY source
    """,
    tags=("url", "canonicalization", "dedup", "curation"),
)
def q280_url_canonical_dedup(spark, sf_dir):
    """URL canonicalization + exact dedup — the first dedup pass of
    every crawl pipeline: case-folded host, default ports stripped
    (real ports kept), one trailing slash trimmed, query params
    SORTED, fragments dropped. Presentation variants of the same page
    (the noise dimensions of the URL derivation) collapse to one
    canonical string; per-source stats count URLs vs canonical forms
    and the largest variant cluster. Unparseable URLs key on the
    shared per-doc sentinel (sentinel_canonical_col — the same
    semantic the resumable pipeline applies), so each counts as its
    own canonical form rather than all collapsing into one NULL
    group. All string work is codegen'd
    (split/array_sort/array_join — no UDF); the only shuffle is the
    (source, canonical) aggregate, which at 100 TB is the standard
    two-level partial agg."""
    p = _parsed_urls(spark, sf_dir)
    g = (
        p.select("source", sentinel_canonical_col())
        .groupBy("source", "canonical")
        .agg(F.count("*").alias("n"))
    )
    return g.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_urls"),
        F.count("*").alias("n_canonical"),
        (F.sum("n") - F.count("*")).cast("bigint").alias("n_dup_urls"),
        F.max("n").cast("bigint").alias("max_variants"),
    )


_Q282_QUOTA = 3  # max docs kept per registrable domain


@register(
    "q282_domain_quota_sample",
    sql=f"""
    WITH {_values_cte('psl2', _PSL2)},
    {_values_cte('psl1', _PSL1)},
    u AS (
        SELECT doc_id, source, {_URL_EXPR} AS url FROM documents),
    p AS ({_DUCK_PARSE}),
    lab AS (
        SELECT p.*,{_LHOST_LABELS}
        FROM p),
    reg AS (
        SELECT lab.*,{_REGISTRABLE_CASE},
               COALESCE(p2.s, p1.s) AS public_suffix
        FROM lab
        LEFT JOIN psl2 p2 ON p2.s = lab.last2
        LEFT JOIN psl1 p1 ON p1.s = lab.last1),
    regs AS (
        SELECT doc_id, public_suffix,
               COALESCE(nullif(registrable, ''),
                        {_DUCK_NOHOST_SENTINEL}) AS registrable
        FROM reg),
    ranked AS (
        SELECT registrable, public_suffix, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY registrable
                   ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
        FROM regs)
    SELECT public_suffix,
           CAST(COUNT(DISTINCT registrable) AS BIGINT) AS n_domains,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn <= {_Q282_QUOTA} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(MAX(rn) AS BIGINT) AS max_domain_docs
    FROM ranked GROUP BY public_suffix
    """,
    tags=("url", "quota", "sampling", "curation"),
)
def q282_domain_quota_sample(spark, sf_dir):
    """Per-domain quota sampling — "at most K documents per site", the
    cap every crawl-derived corpus applies so a few giant domains
    can't dominate training data. Selection inside a domain is by an
    md5 hash of doc_id (an unbiased, deterministic, RNG-free shuffle
    — crawl-order prefixes would bias toward homepage-adjacent pages),
    doc_id as tiebreak; the kept set is rows with row_number <= K over
    the registrable-domain partition. Hostless/unparseable docs rank
    rn=1 on the shared per-doc sentinel (sentinel_registrable_col —
    the pipeline's domain_quota semantic) rather than being capped
    together as one NULL pseudo-domain. Scale: one shuffle on the
    domain key; a pathological mega-domain skews that window, and the
    mitigation is the TakeOrdered-per-key pattern (partial per-task
    top-K before the shuffle) — at K=3 each task forwards at most K
    rows per domain, which AQE-skew handling covers here. Output per
    public suffix: domains, docs, kept-after-quota, largest domain."""
    reg = _with_registrable(_parsed_urls(spark, sf_dir)).withColumn(
        "registrable", sentinel_registrable_col()
    )
    w = Window.partitionBy("registrable").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = reg.select(
        "registrable", "public_suffix", "doc_id",
        F.row_number().over(w).alias("rn"),
    )
    return ranked.groupBy("public_suffix").agg(
        F.countDistinct("registrable").alias("n_domains"),
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.col("rn") <= _Q282_QUOTA, 1).otherwise(0)
        ).cast("bigint").alias("n_kept"),
        F.max("rn").cast("bigint").alias("max_domain_docs"),
    )


def funnel_url_staged(docs):
    """The q284 funnel's URL stages in ONE plan — (1) canonical-URL
    exact dedup (min-doc_id winner per sentinel-keyed canonical) then
    (2) per-registrable-domain quota (md5-ordered rn <= K,
    sentinel-keyed) — over ANY ``(doc_id, source, url)`` DataFrame.
    Returns the dedup SURVIVORS with the quota verdict carried as an
    ``in_quota`` flag (rows: doc_id, source, registrable, in_quota),
    so one executed pass yields both stages' survivor sets: the quota
    window ranks exactly the dedup survivors, identically to filtering
    first, because every input row of the quota window IS a dedup
    survivor."""
    reg = _with_registrable(parse_urls(docs))
    c = reg.select(
        "doc_id", "source",
        sentinel_registrable_col(), sentinel_canonical_col(),
    )
    dedup = (
        c.select(
            "doc_id", "source", "registrable",
            F.row_number()
            .over(Window.partitionBy("canonical").orderBy("doc_id"))
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return dedup.select(
        "doc_id", "source", "registrable",
        (
            F.row_number().over(
                Window.partitionBy("registrable").orderBy(
                    F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
                )
            )
            <= _Q282_QUOTA
        ).alias("in_quota"),
    )


def funnel_url_stages(docs):
    """``(dedup, quota)`` survivor DataFrames — the two-output view of
    funnel_url_staged. Factored out of q284 so the dirty-URL
    equivalence test in tests/test_curation_pipeline.py drives the
    SAME code the funnel query runs; membership-identical to the
    resumable pipeline's url_canonical_dedup -> domain_quota stages by
    construction (both key on sentinel_canonical_col /
    sentinel_registrable_col)."""
    staged = funnel_url_staged(docs)
    dedup = staged.select("doc_id", "source", "registrable")
    quota = staged.where("in_quota").select("doc_id", "source")
    return dedup, quota


_Q284_QUALITY_MIN = 818  # letters-per-kilochar floor (binds ~half)


@register(
    "q284_crawl_curation_funnel",
    sql=_bpe_cte_prefix()
    + _BPE_DOC_CTES
    + f""",
    {_values_cte('psl2', _PSL2)},
    {_values_cte('psl1', _PSL1)},
    u AS (
        SELECT doc_id, source, {_URL_EXPR} AS url FROM documents),
    p AS ({_DUCK_PARSE}),
    lab AS (
        SELECT p.*,{_LHOST_LABELS}
        FROM p),
    reg AS (
        SELECT lab.*,{_REGISTRABLE_CASE}
        FROM lab
        LEFT JOIN psl2 p2 ON p2.s = lab.last2
        LEFT JOIN psl1 p1 ON p1.s = lab.last1),
    c AS (
        SELECT doc_id, source,
               COALESCE(nullif(registrable, ''),
                        {_DUCK_NOHOST_SENTINEL}) AS registrable,
               {_DUCK_CANONICAL_SENTINEL}
        FROM reg),
    dedup AS (
        SELECT doc_id, source, registrable FROM (
            SELECT doc_id, source, registrable,
                   ROW_NUMBER() OVER (PARTITION BY canonical
                                      ORDER BY doc_id) AS rn
            FROM c) WHERE rn = 1),
    quota AS (
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY registrable
                       ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
            FROM dedup) WHERE rn <= {_Q282_QUOTA}),
    quality AS (
        SELECT q.doc_id, q.source, t.n_chars,
               (1000 * {_Q247_LETTERS_DUCK.replace('text', 't.text')})
                   // t.n_chars AS bucket
        FROM quota q JOIN documents t ON t.doc_id = q.doc_id),
    d AS (
        SELECT ql.doc_id, ql.source, b.bpe_tokens AS tokens, ql.bucket
        FROM quality ql JOIN doc b ON b.doc_id = ql.doc_id
        WHERE ql.bucket >= {_Q284_QUALITY_MIN}),{{SEL}}
    f0 AS (SELECT source, COUNT(*) AS n_raw FROM documents
           GROUP BY source),
    f1 AS (SELECT source, COUNT(*) AS n_dedup FROM dedup
           GROUP BY source),
    f2 AS (SELECT source, COUNT(*) AS n_quota FROM quota
           GROUP BY source),
    f3 AS (SELECT source, COUNT(*) AS n_quality FROM d
           GROUP BY source),
    f4 AS (SELECT source, COUNT(*) AS n_selected,
                  CAST(SUM(tokens) AS BIGINT) AS tokens_selected
           FROM sel GROUP BY source)
    SELECT f0.source,
           CAST(n_raw AS BIGINT) AS n_raw,
           CAST(COALESCE(n_dedup, 0) AS BIGINT) AS n_dedup,
           CAST(COALESCE(n_quota, 0) AS BIGINT) AS n_quota,
           CAST(COALESCE(n_quality, 0) AS BIGINT) AS n_quality,
           CAST(COALESCE(n_selected, 0) AS BIGINT) AS n_selected,
           CAST(COALESCE(tokens_selected, 0) AS BIGINT)
               AS tokens_selected
    FROM f0
    LEFT JOIN f1 ON f1.source = f0.source
    LEFT JOIN f2 ON f2.source = f0.source
    LEFT JOIN f3 ON f3.source = f0.source
    LEFT JOIN f4 ON f4.source = f0.source
    """.replace("{SEL}", _BUDGET_SEL_CTES + ","),
    tags=("curation", "pipeline", "funnel", "url"),
)
def q284_crawl_curation_funnel(spark, sf_dir):
    """The crawl-to-corpus pipeline END-TO-END as one declarative
    plan — the composition proof for the whole curation family:

      raw --(1) canonical-URL exact dedup (q280's canonical form,
      min-doc_id winner)--> --(2) per-domain quota (q282's max-K per
      registrable, md5-ordered)--> --(3) quality floor (q247's
      integer letters-per-kilochar bucket >= {_Q284_QUALITY_MIN})-->
      --(4) global token-budget selection (the q247 kernel, half the
      surviving tokens, best buckets first) spent in REAL BPE tokens
      (q275's learned-tokenizer counts via bpe_doc_token_counts, not
      the ceil(chars/4) proxy — the budget the funnel allocates is
      the budget a training run would actually spend)-->

    with the per-source ATTRITION FUNNEL (raw / after-dedup /
    after-quota / after-quality / selected / tokens) as output — what
    a data-governance review actually signs off on. Every stage's
    survivor set is hash-pinned through the funnel counts, so a
    semantic drift in ANY stage (canonicalization, PSL matching,
    quota ordering, bucket arithmetic, tokenizer encode, budget
    boundary) breaks the check — the oracle replays BPE induction +
    encode as the same chained-CTE program q275/q276 use, prepended
    to the URL CTEs. Scale shape: stages 1-2 are window-dedups on
    canonical / registrable keys, stage 3 is a map-side filter, the
    tokenizer join is doc_id-keyed (per-row Python confined to the
    distinct-word vocabulary, q275's accounting), and stage 4 touches
    only the boundary bucket — no stage adds an unbounded shuffle.
    Stages 1-2 key on the shared NULL-URL sentinels
    (sentinel_canonical_col / sentinel_registrable_col — identical to
    the resumable pipeline's stages, proven by the dirty-URL
    equivalence test in tests/test_curation_pipeline.py), so
    unparseable URLs survive dedup individually and are quota-exempt.

    plan-change: round 11 composed the REAL tokenizer into the budget
    stage (VERDICT r10 item 4) — the q275 BPE subtree (induction
    collect + vocab encode + doc-count partial agg) now rides inside
    this plan, so its printed exchange/shuffle-join counts grew by
    exactly that subtree's nodes. Funnel stages themselves are
    unchanged; sf1 growth measured 1.52x per 10x post-composition.
    Allowed: hash-exchanges<=52 shuffle-joins<=11.

    Optimization round 16 (guide §5 reuse, VERDICT r15 item 4 —
    measured: the stage-count formulation re-executed shared subtrees
    per funnel stat): ``d`` is referenced FIVE times (f3 + the four
    references inside budget_selected_docs), and the parse/PSL/window
    chain twice more (f1, f2) — so the BPE token subtree ran 5x and
    the URL chain 7x per bench pass. Now the URL stages run ONCE
    (funnel_url_staged checkpointed, quota carried as the in_quota
    flag — identical membership by construction) and ``d`` is
    checkpointed, so every funnel stat and the whole budget tail read
    materialized narrow rows. Same stage semantics, same oracle, ~5x
    less executed work; at 100 TB the checkpoints hold only
    (doc_id, source, flag/tokens/bucket) — the persisted stage tables
    any production funnel keeps anyway."""
    staged = funnel_url_staged(
        table(spark, sf_dir, "documents").select(
            "doc_id", "source", F.expr(_URL_EXPR).alias("url")
        )
    ).transform(_ckpt)
    quota = staged.where("in_quota")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        F.expr(f"(1000 * {_Q247_LETTERS}) div n_chars").alias("bucket"),
    )
    per_doc = bpe_doc_token_counts(spark, sf_dir).select(
        "doc_id", F.col("bpe_tokens").alias("tokens")
    )
    d = (
        quota.join(docs, "doc_id")
        .where(F.col("bucket") >= _Q284_QUALITY_MIN)
        .join(per_doc, "doc_id")
        .select("doc_id", "source", "tokens", "bucket")
        .transform(_ckpt)
    )
    sel = budget_selected_docs(d)

    def per_source(df, *aggs):
        return df.groupBy("source").agg(*aggs)

    f0 = per_source(
        table(spark, sf_dir, "documents"), F.count("*").alias("n_raw")
    )
    f1 = per_source(staged, F.count("*").alias("n_dedup"))
    f2 = per_source(quota, F.count("*").alias("n_quota"))
    f3 = per_source(d, F.count("*").alias("n_quality"))
    f4 = per_source(
        sel,
        F.count("*").alias("n_selected"),
        F.sum("tokens").cast("bigint").alias("tokens_selected"),
    )
    out = (
        f0.join(f1, "source", "left")
        .join(f2, "source", "left")
        .join(f3, "source", "left")
        .join(f4, "source", "left")
    )
    return out.select(
        "source",
        F.col("n_raw").cast("bigint").alias("n_raw"),
        F.coalesce("n_dedup", F.lit(0)).cast("bigint").alias("n_dedup"),
        F.coalesce("n_quota", F.lit(0)).cast("bigint").alias("n_quota"),
        F.coalesce("n_quality", F.lit(0)).cast("bigint").alias("n_quality"),
        F.coalesce("n_selected", F.lit(0)).cast("bigint").alias("n_selected"),
        F.coalesce("tokens_selected", F.lit(0))
        .cast("bigint")
        .alias("tokens_selected"),
    )


def canonical_url_col():
    """The canonical-URL Column over parse_urls() output — lowercase
    host, default ports stripped (real ports kept), one trailing slash
    trimmed, query params sorted, fragment dropped."""
    return F.concat(
        F.col("proto"),
        F.lit("://"),
        F.lower("host"),
        F.when(F.col("port").isNull(), "")
        .when(
            ((F.col("proto") == "http") & (F.col("port") == "80"))
            | ((F.col("proto") == "https") & (F.col("port") == "443")),
            "",
        )
        .otherwise(F.concat(F.lit(":"), F.col("port"))),
        F.regexp_replace("path", r"/$", ""),
        F.when(F.col("query").isNull(), "").otherwise(
            F.concat(
                F.lit("?"),
                F.array_join(F.array_sort(F.split("query", "&")), "&"),
            )
        ),
    ).alias("canonical")


def sentinel_canonical_col(id_col: str = "doc_id"):
    """canonical_url_col with the shared NULL-URL semantic: a doc
    whose URL doesn't parse (canonical NULL) keys on a per-doc
    sentinel, so canonical-dedup passes it through instead of
    collapsing every unparseable doc into one NULL group. The SAME
    column the pipeline's url_canonical_dedup stage groups on —
    q280/q284 and pipeline/curation.py can never drift."""
    return F.coalesce(
        canonical_url_col(),
        F.concat(F.lit(UNPARSED_SENTINEL), F.col(id_col).cast("string")),
    ).alias("canonical")


def sentinel_registrable_col(id_col: str = "doc_id"):
    """registrable (eTLD+1) with the shared NULL-URL semantic: a doc
    with no parseable host keys on a per-doc sentinel, so the domain
    quota ranks it rn=1 instead of capping all hostless docs together
    as one NULL pseudo-domain. Shared with the pipeline's
    domain_quota stage (q282/q284 parity)."""
    return F.coalesce(
        F.col("registrable"),
        F.concat(F.lit(NOHOST_SENTINEL), F.col(id_col).cast("string")),
    ).alias("registrable")


@register(
    "q287_skewed_domain_quota",
    sql=f"""
    WITH li AS (
        SELECT l_orderkey * 8 + l_linenumber AS doc_id FROM lineitem
        WHERE l_linenumber <= 4),
    u AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'mega' ELSE 'tail' END
                   AS source,
               CASE WHEN doc_id % 2 = 0
                    THEN 'https://www.mega-site.com/p/'
                         || CAST(doc_id // 4 AS VARCHAR)
                    ELSE 'https://site-' || CAST(doc_id % 4999 AS VARCHAR)
                         || '.org/p/' || CAST(doc_id // 2 AS VARCHAR) END
                   AS url
        FROM li),
    p AS (
        SELECT doc_id, source, url AS canonical,
               regexp_extract(url, '^https://(?:www\\.)?([^/]+)/', 1)
                   AS registrable
        FROM u),
    dedup AS (
        SELECT doc_id, source, registrable FROM (
            SELECT doc_id, source, registrable,
                   ROW_NUMBER() OVER (PARTITION BY canonical
                                      ORDER BY doc_id) AS rn
            FROM p) WHERE rn = 1),
    quota AS (
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY registrable
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM dedup) WHERE rn <= {_Q282_QUOTA}),
    f0 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw
           FROM u GROUP BY source),
    f1 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_dedup,
                  CAST(COUNT(DISTINCT registrable) AS BIGINT) AS n_domains
           FROM dedup GROUP BY source),
    f2 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept
           FROM quota GROUP BY source)
    SELECT f0.source, n_raw, n_dedup, n_domains, n_kept
    FROM f0
    JOIN f1 ON f1.source = f0.source
    JOIN f2 ON f2.source = f0.source
    """,
    tags=("url", "skew", "quota", "dedup", "curation", "bench"),
)
def q287_skewed_domain_quota(spark, sf_dir):
    """SKEWED-KEY window dedup + quota — the bench anchor for the
    hot-domain shape the uniform fixtures never exercise (VERDICT r12
    item 7; the off-line evidence lived in tools/stress_skew_urls.py /
    SCALING.md since r11, where the WindowGroupLimit-OFF variant
    single-tasks the mega domain).

    Corpus: one synthetic URL per lineitem row (the largest fixture
    table; line numbers 1-4 -> ~343k rows at sf0.1, a ~50/50
    even/odd doc_id split). HALF the corpus lands in ONE registrable
    domain (www.mega-site.com), with canonical-URL variants
    collapsing in the dedup stage; the other half spreads uniformly
    over 4999 site-N.org domains. The stages are q284's exact window semantics (same
    sentinel keys via sentinel_canonical_col/sentinel_registrable_col,
    same md5 quota ordering) FUSED into one pass — parse + PSL join +
    dedup window -> filter -> quota window -> conditional aggregate —
    instead of re-deriving the chain per funnel stat (at 100 TB the
    corpus is scanned once; the n_raw leg is a URL-free count off the
    fact table). The anchor times BOTH skew shapes: the dedup
    window's rn=1 filter plans a PARTIAL WindowGroupLimit below the
    exchange (each map task forwards one row per canonical —
    plan-verified), while the quota rank feeds a conditional
    aggregate and so sorts each domain's full dedup-survivor list in
    one window task — the q282-style audit form, exactly the hot-key
    sort that hurts when group-limit eligibility is lost. A
    regression in either (losing the partial limit, or the mega
    domain's sort getting slower) moves this anchor's headline time.
    Output: per-class funnel counts (raw / after-dedup / distinct
    domains / kept-after-quota; the mega class keeps exactly
    {_Q282_QUOTA})."""
    # wide_table (r15): the URL-derivation + parse + PSL-join chain is
    # expression-dense (5 try_parse_url/regexp passes per row) and sat
    # on the fixture's single-row-group scan as ONE task (~5 s of the
    # anchor, measured); the conditional rebalance spreads it and adds
    # no exchange on a real multi-split layout. The skewed dedup/quota
    # windows — the shapes this anchor exists to time — are untouched.
    li = (
        wide_table(spark, sf_dir, "lineitem")
        .where(F.col("l_linenumber") <= 4)
        .select(
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias(
                "doc_id"
            )
        )
    )
    is_mega = F.col("doc_id") % 2 == 0
    docs = li.select(
        "doc_id",
        F.when(is_mega, F.lit("mega")).otherwise(F.lit("tail")).alias(
            "source"
        ),
        F.when(
            is_mega,
            F.concat(
                F.lit("https://www.mega-site.com/p/"),
                F.expr("doc_id div 4").cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://site-"),
                (F.col("doc_id") % 4999).cast("string"),
                F.lit(".org/p/"),
                F.expr("doc_id div 2").cast("string"),
            )
        )
        .alias("url"),
    )
    reg = _with_registrable(parse_urls(docs))
    c = reg.select(
        "doc_id", "source",
        sentinel_registrable_col(), sentinel_canonical_col(),
    )
    ranked = (
        c.withColumn(
            "_rn1",
            F.row_number().over(
                Window.partitionBy("canonical").orderBy("doc_id")
            ),
        )
        .where(F.col("_rn1") == 1)
        .withColumn(
            "_rn2",
            F.row_number().over(
                Window.partitionBy("registrable").orderBy(
                    F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
                )
            ),
        )
    )
    f = ranked.groupBy("source").agg(
        F.count("*").alias("n_dedup"),
        F.countDistinct("registrable").alias("n_domains"),
        F.sum(
            F.when(F.col("_rn2") <= _Q282_QUOTA, 1).otherwise(0)
        ).alias("n_kept"),
    )
    f0 = li.groupBy(
        F.when(is_mega, F.lit("mega")).otherwise(F.lit("tail")).alias(
            "source"
        )
    ).agg(F.count("*").alias("n_raw"))
    return f0.join(f, "source").select(
        "source",
        F.col("n_raw").cast("bigint").alias("n_raw"),
        F.col("n_dedup").cast("bigint").alias("n_dedup"),
        F.col("n_domains").cast("bigint").alias("n_domains"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
    )


@register(
    "q288_skewed_join_enrich",
    sql="""
    WITH li AS (
        SELECT l_orderkey * 8 + l_linenumber AS doc_id FROM lineitem
        WHERE l_linenumber <= 4),
    pages AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'mega' ELSE 'tail' END
                   AS source,
               CASE WHEN doc_id % 2 = 0 THEN 'mega-site.com'
                    ELSE 'site-' || CAST(doc_id % 4999 AS VARCHAR)
                         || '.org' END AS registrable,
               doc_id % 97 AS weight
        FROM li),
    dom AS (
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'mega-site.com'
                    ELSE 'site-' || CAST(o_orderkey % 4999 AS VARCHAR)
                         || '.org' END AS registrable,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1)
    SELECT p.source,
           CAST(COUNT(*) AS BIGINT) AS n_joined,
           CAST(COUNT(DISTINCT p.registrable) AS BIGINT) AS n_domains,
           CAST(SUM(p.weight * d.n_orders) AS BIGINT) AS weighted_orders
    FROM pages p JOIN dom d USING (registrable)
    GROUP BY p.source
    """,
    tags=("skew", "join", "curation", "bench"),
)
def q288_skewed_join_enrich(spark, sf_dir):
    """SKEWED-KEY fact-to-fact JOIN — the bench anchor for the
    hot-key join shape (VERDICT r13 #5; q287 covers window skew, this
    covers the other hot-key killer). Same mega-domain universe as
    q287: HALF of ~343k synthetic pages (at sf0.1) key on ONE
    registrable domain; the probe side is a second fact scan (orders)
    aggregated to per-domain stats over the same key universe, then
    joined back and folded per source class.

    Scale shape: at this SF the per-domain aggregate is ~5k rows, so
    the CORRECT plan broadcasts it (AQE does; the mega key never
    concentrates on one reducer because a broadcast join has no
    shuffle-by-key at all) — broadcasting the small side IS the
    first-line skew strategy. When the probe side outgrows broadcast
    (billions of domains at 100 TB), the join becomes SMJ and the
    mega key lands on one reducer: tests/test_plans.py::
    test_q288_aqe_skew_split_fires forces that regime
    (autoBroadcastJoinThreshold=-1, lowered AQE skew thresholds) on
    THIS query's data and asserts AQE's OptimizeSkewedJoin actually
    splits the mega partition; the engine-side salted fallback for
    AQE-less paths is q134_salted_skew_join (operators/skew.py).
    Output: per source class, joined row count, distinct domains,
    and an integer weighted-orders checksum (floats avoided so the
    hash pins exact equality)."""
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_linenumber") <= 4)
        .select(
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias(
                "doc_id"
            )
        )
    )
    is_mega = F.col("doc_id") % 2 == 0
    pages = li.select(
        "doc_id",
        F.when(is_mega, F.lit("mega")).otherwise(F.lit("tail")).alias(
            "source"
        ),
        F.when(is_mega, F.lit("mega-site.com"))
        .otherwise(
            F.concat(
                F.lit("site-"),
                (F.col("doc_id") % 4999).cast("string"),
                F.lit(".org"),
            )
        )
        .alias("registrable"),
        (F.col("doc_id") % 97).alias("weight"),
    )
    o = table(spark, sf_dir, "orders")
    dom = (
        o.select(
            F.when(F.col("o_orderkey") % 2 == 0, F.lit("mega-site.com"))
            .otherwise(
                F.concat(
                    F.lit("site-"),
                    (F.col("o_orderkey") % 4999).cast("string"),
                    F.lit(".org"),
                )
            )
            .alias("registrable")
        )
        .groupBy("registrable")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        pages.join(dom, "registrable")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_joined"),
            F.countDistinct("registrable").cast("bigint").alias(
                "n_domains"
            ),
            F.sum(F.col("weight") * F.col("n_orders"))
            .cast("bigint")
            .alias("weighted_orders"),
        )
    )
