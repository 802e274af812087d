"""Scale-path batch: distributed k-means over embeddings, count-min
frequency sketching, and Z-order (Morton) multi-dimensional layout.

Three capabilities a 100 TB training-data pipeline leans on that the
corpus did not yet cover as first-class hash-checked queries:

  q169_kmeans_embeddings   semantic clustering of the embedding table
                           (deterministic Lloyd iterations — the
                           grouping step behind cluster-balanced
                           sampling and semantic dedup).
  q170_countmin_heavy_hitters
                           fixed-memory token-frequency sketch with
                           exact-side error audit (vocabulary heavy
                           hitters without a full groupBy at scale).
  q171_zorder_layout       Morton-interleaved two-column sort key and
                           the per-file bounding boxes it produces —
                           the layout that makes min/max file stats
                           prunable on BOTH filter columns.

Determinism discipline follows queries/core.py: integer arithmetic
wherever possible (q170/q171 are 100 % integer-exact); the k-means
distance/centroid math quantizes every per-row term to DECIMAL before
the order-independent exact SUM, and re-quantizes centroids to 9
decimals between Lloyd steps so both engines iterate on bit-identical
state (the q168 quantized-iteration discipline).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table
from rc_rag_spark.checkpoints import ckpt as _ckpt


# --------------------------------------------------------------------------
# q169 — deterministic Lloyd k-means over the embeddings table.

_KM_K = 4          # clusters; seeds = embeddings of vec_id 0..3
_KM_STEPS = 3      # unrolled Lloyd iterations


def _kmeans_oracle_sql() -> str:
    """Chained-CTE DuckDB formulation of the identical unrolled Lloyd
    steps: assign-to-nearest (exact DECIMAL distances, cid tiebreak),
    recompute centroids (exact DECIMAL mean, re-quantized to 9
    decimals), repeated _KM_STEPS times."""
    parts = [
        """
    WITH x AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
    c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, pos, x AS c
           FROM x WHERE vec_id < {k})""".format(k=_KM_K)
    ]
    for s in range(1, _KM_STEPS + 1):
        parts.append(
            """,
    d{s} AS (
        SELECT x.vec_id, c.cid,
               SUM(CAST(round((x.x - c.c) * (x.x - c.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM x JOIN c{p} c ON c.pos = x.pos
        GROUP BY x.vec_id, c.cid),
    a{s} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d{s})
        WHERE rn = 1),
    c{s} AS (
        SELECT a.cid, x.pos,
               round(CAST(SUM(CAST(round(x.x, 12) AS DECIMAL(28,12)))
                          AS DOUBLE) / COUNT(*), 9) AS c
        FROM a{s} a JOIN x ON x.vec_id = a.vec_id
        GROUP BY a.cid, x.pos)""".format(s=s, p=s - 1)
        )
    parts.append(
        """,
    sizes AS (SELECT cid, COUNT(*) AS n_members
              FROM a{s} GROUP BY cid)
    SELECT c.cid, c.pos, c.c AS centroid, s.n_members
    FROM c{s} c JOIN sizes s ON s.cid = c.cid""".format(s=_KM_STEPS)
    )
    return "".join(parts)


@register(
    "q169_kmeans_embeddings",
    sql=_kmeans_oracle_sql(),
    tags=("ml", "clustering", "kmeans", "embeddings"),
)
def q169_kmeans_embeddings(spark, sf_dir):
    """Hash-checked distributed k-means (3 unrolled Lloyd steps, k=4,
    seeds = the first k vectors) — the semantic-clustering primitive
    behind cluster-balanced sampling and SemDeDup-style semantic
    dedup of a training corpus. Vectors live long-form (vec_id, pos,
    x); per step: one broadcast join against the k·d centroid table +
    a (vec_id, cid) partial agg computes exact DECIMAL-quantized
    squared distances, argmin is a row_number with cid tiebreak, and
    new centroids are exact DECIMAL means re-quantized to 9 decimals
    so both engines enter the next step with bit-identical state. The
    oracle unrolls the identical steps as chained CTEs. Scale: each
    Lloyd step is broadcast(k·d doubles) + two partial-agg scan
    passes — the textbook map-reduce k-means; nothing grows with the
    corpus except the scans, and the centroid table localCheckpoints
    so lineage stays O(1) per step rather than O(2^steps)."""
    e = table(spark, sf_dir, "embeddings")
    x = (
        e.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "x"
            ),
        )
        .withColumn("pos", (F.col("pos") + 1).cast("int"))
        .transform(_ckpt)
    )
    c = x.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").cast("int").alias("cid"), "pos", F.col("x").alias("c")
    )
    # Packed twin of the corpus for the distance stage (round-7): the
    # assignment flows n·k rows (one zip_with + exact-decimal fold per
    # (vector, centroid) pair) instead of n·d·k exploded rows — the
    # d-factor only appears in the per-dimension MEAN stage, where
    # long form is the natural shape. Fold terms are the same
    # round-at-1e-12 decimal(28,12) values the exploded sum added
    # (decimal addition is exact), so assignments and centroids stay
    # hash-identical to the oracle's chained CTEs.
    # NULL embeddings have no position in the space (r12 contract):
    # posexplode drops them from x for free, but without the filter
    # here the packed side would row_number a NULL fold distance into
    # cid 0 and inflate its member count (sfnulls gate, r13)
    ev = e.where(F.col("embedding").isNotNull()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("_j", F.lit(1)).transform(_ckpt)

    a = None
    for _ in range(_KM_STEPS):
        cp = c.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        ).withColumn("_j", F.lit(1))
        d = ev.join(F.broadcast(cp), "_j").select(
            "vec_id",
            "cid",
            F.aggregate(
                F.zip_with(
                    F.col("v"), F.col("cv"),
                    lambda xx, cc: F.round(
                        (xx - cc) * (xx - cc), 12
                    ).cast("decimal(28,12)"),
                ),
                F.lit(0).cast("decimal(28,12)"),
                lambda acc, t: (acc + t).cast("decimal(28,12)"),
            ).alias("dist"),
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        a = (
            d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid")
        )
        c = (
            a.join(x, "vec_id")
            .groupBy("cid", "pos")
            .agg(
                F.round(
                    F.sum(F.round("x", 12).cast("decimal(28,12)")).cast(
                        "double"
                    )
                    / F.count("*"),
                    9,
                ).alias("c")
            )
            .transform(_ckpt)
        )
    sizes = a.groupBy("cid").agg(F.count("*").alias("n_members"))
    return c.join(F.broadcast(sizes), "cid").select(
        "cid", "pos", F.col("c").alias("centroid"), "n_members"
    )


# --------------------------------------------------------------------------
# q170 — count-min sketch heavy hitters over document tokens.

_CMS_DEPTH = 4
_CMS_WIDTH = 256
_CMS_TOPK = 20


def _cms_bucket_spark(tok, j):
    """Deterministic cross-engine hash row: first 8 md5 hex chars of
    'tok#j' as an integer, mod the sketch width (the md5-prefix
    discipline proven in the MinHash oracle, dedup.py)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("#", tok, j.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % _CMS_WIDTH
    )


@register(
    "q170_countmin_heavy_hitters",
    sql="""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
        FROM documents),
    counts AS (
        SELECT tok, COUNT(*) AS cnt FROM toks WHERE tok <> ''
        GROUP BY tok),
    rows AS (SELECT unnest(generate_series(0, {dm1})) AS j),
    sketch AS (
        SELECT r.j,
               CAST(('0x' || substr(md5(c.tok || '#'
                                        || CAST(r.j AS VARCHAR)), 1, 8))
                    AS BIGINT) % {w} AS bucket,
               CAST(SUM(c.cnt) AS BIGINT) AS cell
        FROM counts c CROSS JOIN rows r
        GROUP BY 1, 2),
    top AS (
        SELECT tok, cnt FROM (
            SELECT tok, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rn
            FROM counts)
        WHERE rn <= {topk}),
    probes AS (
        SELECT t.tok, t.cnt, r.j,
               CAST(('0x' || substr(md5(t.tok || '#'
                                        || CAST(r.j AS VARCHAR)), 1, 8))
                    AS BIGINT) % {w} AS bucket
        FROM top t CROSS JOIN rows r)
    SELECT p.tok, p.cnt AS true_cnt, MIN(s.cell) AS cms_est,
           MIN(s.cell) - p.cnt AS overcount
    FROM probes p
    JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
    GROUP BY p.tok, p.cnt
    """.format(dm1=_CMS_DEPTH - 1, w=_CMS_WIDTH, topk=_CMS_TOPK),
    tags=("sketch", "countmin", "heavy-hitters", "text"),
)
def q170_countmin_heavy_hitters(spark, sf_dir):
    """Count-min sketch over the document token stream, audited
    against exact counts for the true top-20 tokens (estimate is
    always >= truth; `overcount` is the collision error). The sketch
    is depth x width = 4 x 256 integer cells built with one partial
    agg — fixed O(d.w) memory regardless of corpus size, mergeable by
    elementwise add, which is why it replaces a full-vocabulary
    groupBy for frequency screens at 100 TB (the exact arm here
    exists to certify the bound at test SF). Bucket hashing is the
    md5-prefix construction both engines compute bit-identically;
    every output column is an exact integer, so the hash check is
    drift-free by construction."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    counts = counts.transform(_ckpt)  # reused by sketch + top-k
    rows = spark.range(_CMS_DEPTH).select(F.col("id").cast("int").alias("j"))
    sketch = (
        counts.crossJoin(F.broadcast(rows))
        .select(
            "j",
            _cms_bucket_spark(F.col("tok"), F.col("j")).alias("bucket"),
            "cnt",
        )
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cell"))
    )
    w = Window.orderBy(F.col("cnt").desc(), "tok")
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _CMS_TOPK)
        .select("tok", "cnt")
    )
    probes = top.crossJoin(F.broadcast(rows)).select(
        "tok",
        "cnt",
        "j",
        _cms_bucket_spark(F.col("tok"), F.col("j")).alias("bucket"),
    )
    return (
        probes.join(sketch, ["j", "bucket"])
        .groupBy("tok", "cnt")
        .agg(F.min("cell").alias("cms_est"))
        .select(
            "tok",
            F.col("cnt").alias("true_cnt"),
            "cms_est",
            (F.col("cms_est") - F.col("cnt")).alias("overcount"),
        )
    )


# --------------------------------------------------------------------------
# q171 — Z-order (Morton) layout audit on lineitem (ship-day x part).

_Z_BITS = 8        # 8 bits per dimension -> 16-bit Morton key
_Z_FILES = 64      # morton >> 10: 65536 keys / 64 target files


# --------------------------------------------------------------------------
# q172 — distributed BPE merge induction over the document vocabulary.

_BPE_STEPS = 3


def _bpe_cte_prefix() -> str:
    """The WITH-clause through s{_BPE_STEPS} (no final SELECT): the
    unrolled chained-CTE DuckDB formulation of the merge-induction
    steps — weighted pair counts -> deterministic top pair (count
    desc, then left/right lexicographic) -> leftmost-greedy
    non-overlapping merge via the odd-offset-within-run window
    construction -> reindex. Shared by the q172 induction oracle and
    the q275/q276 encode oracles (after step R, s{R} IS the vocabulary
    encoded under the learned merges — induction's apply IS encode)."""
    parts = [
        """
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
        FROM documents),
    words AS (
        SELECT tok AS word, COUNT(*) AS wc FROM toks WHERE tok <> ''
        GROUP BY tok),
    idx AS (
        SELECT word, wc,
               CAST(unnest(generate_series(1, length(word))) AS BIGINT) AS pos
        FROM words),
    s0 AS (SELECT word, wc, pos, substr(word, CAST(pos AS INTEGER), 1) AS sym
           FROM idx)"""
    ]
    for s in range(1, _BPE_STEPS + 1):
        p = s - 1
        parts.append(
            """,
    nx{s} AS (
        SELECT word, wc, pos, sym,
               LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM s{p}),
    pr{s} AS (
        SELECT sym AS l, nxt AS r, CAST(SUM(wc) AS BIGINT) AS cnt
        FROM nx{s} WHERE nxt IS NOT NULL GROUP BY sym, nxt),
    top{s} AS (SELECT l, r, cnt FROM pr{s}
               ORDER BY cnt DESC, l, r LIMIT 1),
    mm{s} AS (
        SELECT word, pos FROM (
            SELECT word, pos, grp,
                   ROW_NUMBER() OVER (PARTITION BY word, grp
                                      ORDER BY pos) AS k
            FROM (
                SELECT z.word, z.pos,
                       z.pos - ROW_NUMBER() OVER (PARTITION BY z.word
                                                  ORDER BY z.pos) AS grp
                FROM nx{s} z CROSS JOIN top{s} t
                WHERE z.sym = t.l AND z.nxt = t.r) g) gg
        WHERE k % 2 = 1),
    s{s} AS (
        SELECT t.word, t.wc,
               ROW_NUMBER() OVER (PARTITION BY t.word
                                  ORDER BY t.pos) AS pos,
               CASE WHEN im.pos IS NOT NULL THEN tp.l || tp.r
                    ELSE t.sym END AS sym
        FROM s{p} t
        CROSS JOIN top{s} tp
        LEFT JOIN mm{s} im ON im.word = t.word AND im.pos = t.pos
        LEFT JOIN mm{s} ic ON ic.word = t.word AND ic.pos = t.pos - 1
        WHERE ic.pos IS NULL)""".format(s=s, p=p)
        )
    return "".join(parts)


def _bpe_oracle_sql() -> str:
    """q172's oracle: the induction prefix plus a final SELECT that
    emits the learned merge per step."""
    finals = " UNION ALL ".join(
        "SELECT {s} AS step, l AS left_sym, r AS right_sym, cnt"
        " AS pair_count FROM top{s}".format(s=s)
        for s in range(1, _BPE_STEPS + 1)
    )
    return (
        _bpe_cte_prefix()
        + "\n    SELECT CAST(step AS INTEGER) AS step, left_sym,"
        " right_sym, pair_count FROM (" + finals + ")"
    )


def _bpe_apply_merge(syms_col, l_col, r_col):
    """Apply ONE learned (l, r) merge leftmost-first without overlap
    to a symbol array, as a JVM array fold (no Python, no shuffle).

    Fold state: (acc, pend) — pend is the one-symbol lookbehind. If
    pend==l and the next symbol==r they fuse and pend clears (so the
    merged token can never chain into a second merge this pass);
    otherwise pend flushes to acc. This is exactly the documented
    "odd offsets within each run" semantics: a run of consecutive
    matches (possible only when l==r) fuses at its 1st, 3rd, 5th...
    positions, because each fuse consumes the symbol that would have
    started the even-offset match. Equivalence is pinned by
    tests/test_scale_batch.py against the pure-Python encoder
    (curation._bpe_encode_segments) and by the q172/q275 DuckDB
    oracles, whose window construction spells the same rule."""
    merged = F.concat(l_col, r_col)

    def step(st, s):
        return (
            F.when(
                st["pend"].isNull(),
                F.struct(st["acc"].alias("acc"), s.alias("pend")),
            )
            .when(
                (st["pend"] == l_col) & (s == r_col),
                F.struct(
                    F.array_append(st["acc"], merged).alias("acc"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.array_append(st["acc"], st["pend"]).alias("acc"),
                    s.alias("pend"),
                )
            )
        )

    return F.aggregate(
        syms_col,
        F.expr(
            "struct(cast(array() as array<string>) as acc, "
            "cast(null as string) as pend)"
        ),
        step,
        lambda st: F.when(st["pend"].isNull(), st["acc"]).otherwise(
            F.array_append(st["acc"], st["pend"])
        ),
    )


def bpe_induce(words, steps: int = _BPE_STEPS):
    """Shared BPE merge-induction kernel over a (word, wc) vocabulary.

    Returns ``(syms, tops)``: ``syms`` is the vocabulary with its
    final segmentation as an array column (after all ``steps``
    merges — induction's apply step IS encode, so ``size(syms)`` is
    the word's token count), and ``tops`` the per-step 1-row learned
    merges (l, r, cnt) as literal relations.

    Scale shape (optimization round 15, guide §2.3/§2.4): the word's
    segmentation lives as ONE array row instead of exploded
    (word, pos, sym) rows, so each step is a map-side-combined pair
    aggregation (explode of adjacent-pair zips -> tiny
    (l, r)-keyed exchange) + TakeOrdered(1) + a NARROW fold applying
    the merge — no word-keyed window shuffles, no (word, pos)
    equi-joins, no per-step vocabulary checkpoint. The previous
    window/join formulation paid 3 shuffles + 2 joins + a
    materialized checkpoint per step on the exploded symbol table;
    this pays one vocabulary-pair exchange per step and one
    vocabulary materialization total.

    Optimization round 16 (guide §2.6, the q263/q168 discipline): the
    per-step 1-row merge is COLLECTED (same one job per step the
    eager localCheckpoint already paid) and applied as constant
    literals, so consumers' plans fold the merge chain as three bare
    projections — the per-step crossJoin(broadcast) machinery (a
    BroadcastExchange build on EVERY downstream execution of the
    vocabulary subtree) is gone. Driver traffic is one (l, r, cnt)
    row per step at any corpus scale; the fold expressions are
    identical, so segmentations — and every BPE oracle — are
    unchanged."""
    spark = words.sparkSession
    syms = words.select(
        "word",
        "wc",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    ).transform(_ckpt)
    tops = []
    for _ in range(steps):
        prs = syms.select(
            "wc",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                    F.slice("syms", 2, F.size("syms") - 1).alias("r"),
                )
            ).alias("p"),
        )
        pairs = prs.groupBy(
            F.col("p.l").alias("l"), F.col("p.r").alias("r")
        ).agg(F.sum("wc").cast("bigint").alias("cnt"))
        rows = (
            pairs.orderBy(F.col("cnt").desc(), "l", "r").limit(1).collect()
        )
        # literal 1-row (or 0-row) relation via range(), NOT
        # createDataFrame: a pickled-RDD relation schedules
        # defaultParallelism Python-worker tasks per consumer (the
        # r15 values_table lesson)
        n = len(rows)
        top = spark.range(n).select(
            F.lit(rows[0]["l"] if n else None).cast("string").alias("l"),
            F.lit(rows[0]["r"] if n else None).cast("string").alias("r"),
            F.lit(rows[0]["cnt"] if n else None).cast("bigint").alias("cnt"),
        )
        tops.append(top)
        if n:
            syms = syms.select(
                "word",
                "wc",
                _bpe_apply_merge(
                    F.col("syms"),
                    F.lit(rows[0]["l"]),
                    F.lit(rows[0]["r"]),
                ).alias("syms"),
            )
        else:
            # replicate the old crossJoin-with-empty semantics: no
            # learnable pair leaves an empty vocabulary downstream
            syms = syms.where(F.lit(False))
    return syms, tops


@register(
    "q172_bpe_merges",
    sql=_bpe_oracle_sql(),
    tags=("text", "tokenizer", "bpe"),
)
def q172_bpe_merges(spark, sf_dir):
    """Distributed BPE merge induction — the tokenizer-training
    primitive: learn the first 3 byte-pair merges over the document
    vocabulary (weighted by word frequency) and emit each learned
    (left, right) merge with its pair count. Semantics are classic
    greedy BPE: per step, count adjacent symbol pairs weighted by
    word count, pick the most frequent pair (count desc, then
    lexicographic tiebreak), then apply it leftmost-first without
    overlap (the "odd offsets within each run" rule — see
    _bpe_apply_merge). The vocabulary (not the corpus) is what
    iterates, so the corpus is scanned exactly once at any scale.

    Optimization round 15 (guide §2.3/§2.4): segmentations now live
    as per-word symbol ARRAYS folded in the JVM (bpe_induce) instead
    of exploded (word, pos, sym) rows rewritten per step through
    window shuffles + two equi-joins + a checkpoint. Per step the
    only exchange is the map-side-combined pair count; the merge
    application is a narrow fold over a broadcast 1-row merge table.
    Identical output (same pair counts, same count-desc/lexicographic
    tiebreak, same greedy-run semantics), hash-checked by the
    unchanged DuckDB oracle. (A wide_table rebalance of this scan was
    measured 1.35x SLOWER at sf0.1 — every post-scan op here is
    vocabulary-sized, so extra tasks are pure scheduling overhead and
    the single-task partial agg already collapses tokens in place.)"""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    words = toks.groupBy(F.col("tok").alias("word")).agg(
        F.count("*").alias("wc")
    )
    _, tops = bpe_induce(words)
    merges = [
        top.select(
            F.lit(step).cast("int").alias("step"),
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            F.col("cnt").alias("pair_count"),
        )
        for step, top in enumerate(tops, start=1)
    ]
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


# --------------------------------------------------------------------------
# q173 — Bloom-filter membership pre-screen with exact FP audit.

_BLOOM_BITS = 4096
_BLOOM_K = 3
_BLOOM_PRICE = 400_000.0  # build side: buyers with an order above this


@register(
    "q173_bloom_membership",
    sql="""
    WITH build AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_totalprice > {price}),
    hashes AS (SELECT unnest(generate_series(0, {km1})) AS j),
    bits AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(b.o_custkey AS VARCHAR)
                                        || '#' || CAST(h.j AS VARCHAR)),
                                    1, 8)) AS BIGINT) % {m} AS bucket
        FROM build b CROSS JOIN hashes h),
    probes AS (
        SELECT c.c_custkey, h.j,
               CAST(('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR)
                                        || '#' || CAST(h.j AS VARCHAR)),
                                    1, 8)) AS BIGINT) % {m} AS bucket
        FROM customer c CROSS JOIN hashes h),
    hits AS (
        SELECT p.c_custkey,
               CAST(SUM(CASE WHEN b.bucket IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_hits
        FROM probes p LEFT JOIN bits b ON b.bucket = p.bucket
        GROUP BY p.c_custkey)
    SELECT h.c_custkey,
           h.n_hits = {k} AS bloom_maybe,
           EXISTS (SELECT 1 FROM build b
                   WHERE b.o_custkey = h.c_custkey) AS actually_present
    FROM hits h
    """.format(price=_BLOOM_PRICE, km1=_BLOOM_K - 1, m=_BLOOM_BITS,
               k=_BLOOM_K),
    tags=("sketch", "bloom", "membership"),
)
def q173_bloom_membership(spark, sf_dir):
    """Bloom-filter membership pre-screen: build a 4096-bit / k=3
    filter over high-value buyer keys, probe every customer, and audit
    the answers against the exact semi-join. The filter is the
    DISTINCT set of md5-derived bit positions — built by one
    partial-agg distinct (<= m rows however large the build side) and
    small enough to broadcast, which is exactly how a bloom pre-filter
    cuts a 100 TB probe-side scan before the real join (the
    runtime-bloom operator in skew.py injects the same idea into
    Catalyst; this query pins the construction bit-for-bit).
    False negatives are impossible (asserted in tests); false
    positives appear as bloom_maybe=true / actually_present=false
    rows whose rate the m/k choice bounds. Integer/boolean output —
    hash-exact."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    build = (
        orders.where(F.col("o_totalprice") > _BLOOM_PRICE)
        .select("o_custkey")
        .distinct()
        .transform(_ckpt)  # reused: bits + exact audit arm
    )
    hashes = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("j"))

    def bucket(key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "#",
                            key_col.cast("string"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _BLOOM_BITS
        )

    bits = (
        build.crossJoin(F.broadcast(hashes))
        .select(bucket(F.col("o_custkey")).alias("bucket"))
        .distinct()
    )
    probes = cust.crossJoin(F.broadcast(hashes)).select(
        "c_custkey", "j", bucket(F.col("c_custkey")).alias("bucket")
    )
    hits = (
        probes.join(
            F.broadcast(bits.withColumn("_hit", F.lit(1))), "bucket", "left"
        )
        .groupBy("c_custkey")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"))
    )
    actual = build.select(
        F.col("o_custkey").alias("c_custkey"), F.lit(True).alias("_present")
    )
    return (
        hits.join(F.broadcast(actual), "c_custkey", "left")
        .select(
            "c_custkey",
            (F.col("n_hits") == _BLOOM_K).alias("bloom_maybe"),
            F.coalesce("_present", F.lit(False)).alias("actually_present"),
        )
    )


# --------------------------------------------------------------------------
# q174 — int8 scalar quantization of the embedding table.


@register(
    "q174_scalar_quantization",
    sql="""
    WITH x AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
    stats AS (
        SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM x GROUP BY pos),
    codes AS (
        SELECT x.vec_id, x.pos, x.x, s.mn, s.mx,
               CASE WHEN s.mx > s.mn
                    THEN LEAST(255, CAST(floor(((x.x - s.mn) / (s.mx - s.mn))
                                               * 256) AS BIGINT))
                    ELSE 0 END AS q
        FROM x JOIN stats s ON s.pos = x.pos),
    recon AS (
        SELECT vec_id, pos, q,
               CASE WHEN mx > mn
                    THEN mn + (q + 0.5) * ((mx - mn) / 256)
                    ELSE mn END AS xr,
               x
        FROM codes)
    SELECT vec_id,
           CAST(SUM(q * pos) AS BIGINT) AS code_checksum,
           round(CAST(SUM(CAST(round((x - xr) * (x - xr), 14)
                               AS DECIMAL(28,14))) AS DOUBLE)
                 / COUNT(*), 9) AS mse
    FROM recon
    GROUP BY vec_id
    """,
    tags=("quantization", "embeddings", "compression"),
)
def q174_scalar_quantization(spark, sf_dir):
    """Int8 scalar quantization of the embedding table — the 4x
    memory/bandwidth compression that production ANN serves from
    (score against uint8 codes, re-rank survivors against float).
    Per-dimension min/max (one partial agg, 64 rows, broadcast back)
    scales each coordinate to a 0..255 code; the audit emits each
    vector's exact integer code checksum (pins the codes themselves)
    and its reconstruction MSE under midpoint decoding (DECIMAL-
    quantized exact mean). Constant dimensions (mx == mn) are guarded
    to code 0 on both engines — Spark yields NaN and DuckDB NULL for
    0.0/0.0, so the unguarded expression would hash-diverge. Scale:
    two scans + a broadcast join; nothing grows with the corpus."""
    e = table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        ),
    ).withColumn("pos", (F.col("pos") + 1).cast("int"))
    stats = x.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    codes = x.join(F.broadcast(stats), "pos").select(
        "vec_id",
        "pos",
        "x",
        "mn",
        "mx",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(255),
                F.floor(
                    ((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")))
                    * 256
                ),
            ),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("q"),
    )
    recon = codes.select(
        "vec_id",
        "pos",
        "q",
        "x",
        F.when(
            F.col("mx") > F.col("mn"),
            F.col("mn")
            + (F.col("q") + 0.5) * ((F.col("mx") - F.col("mn")) / 256),
        )
        .otherwise(F.col("mn"))
        .alias("xr"),
    )
    err = F.round(
        (F.col("x") - F.col("xr")) * (F.col("x") - F.col("xr")), 14
    ).cast("decimal(28,14)")
    return recon.groupBy("vec_id").agg(
        F.sum(F.col("q") * F.col("pos")).cast("bigint").alias("code_checksum"),
        F.round(F.sum(err).cast("double") / F.count("*"), 9).alias("mse"),
    )


def _morton_terms_sql() -> str:
    return " + ".join(
        "(((b1 >> {i}) & 1) << {o1}) + (((b2 >> {i}) & 1) << {o2})".format(
            i=i, o1=2 * i + 1, o2=2 * i
        )
        for i in range(_Z_BITS)
    )


@register(
    "q171_zorder_layout",
    sql="""
    WITH src AS (
        SELECT CAST(datediff('day', TIMESTAMP '1995-01-01', l_shipdate)
                    AS BIGINT) AS day,
               l_partkey AS pk
        FROM lineitem),
    bounds AS (
        SELECT MIN(day) AS mnd, MAX(day) AS mxd,
               MIN(pk) AS mnp, MAX(pk) AS mxp
        FROM src),
    bucketed AS (
        SELECT day, pk,
               CAST(floor((day - mnd) * 256.0 / (mxd - mnd + 1))
                    AS BIGINT) AS b1,
               CAST(floor((pk - mnp) * 256.0 / (mxp - mnp + 1))
                    AS BIGINT) AS b2
        FROM src CROSS JOIN bounds),
    keyed AS (
        SELECT day, pk, {morton} AS morton
        FROM bucketed)
    SELECT CAST(floor(morton / 1024.0) AS INTEGER) AS file_id,
           COUNT(*) AS n_rows,
           MIN(day) AS min_day, MAX(day) AS max_day,
           MIN(pk) AS min_pk, MAX(pk) AS max_pk,
           MAX(day) - MIN(day) AS day_span,
           MAX(pk) - MIN(pk) AS pk_span
    FROM keyed
    GROUP BY 1
    """.format(morton=_morton_terms_sql()),
    tags=("layout", "zorder", "pruning"),
)
def q171_zorder_layout(spark, sf_dir):
    """Morton/Z-order interleave of (ship-day, partkey) and the
    per-file bounding boxes the resulting sort produces — the physical
    layout that lets parquet min/max file stats prune on BOTH filter
    columns at once (a single-column sort gives tight boxes on one
    dimension and full-range boxes on the other). Each dimension is
    min-max scaled to an 8-bit rank, bits are interleaved into a
    16-bit key, and rows land in morton>>10 'files' (64 at test SF;
    at cluster scale this key feeds repartitionByRange + a parquet
    write so each output file IS one Morton range). The audit output
    is each file's row count and day/partkey bounding box; spans
    shrinking ~sqrt(files) on both axes is the Z-order signature.
    100 % integer arithmetic (scaled quotients are exact doubles well
    under 2^53), so hash-exact on both engines; at 100 TB the bounds
    row comes from file-footer stats instead of the extra scan."""
    li = table(spark, sf_dir, "lineitem")
    src = li.select(
        F.datediff("l_shipdate", F.lit("1995-01-01"))
        .cast("bigint")
        .alias("day"),
        F.col("l_partkey").alias("pk"),
    )
    bounds = src.agg(
        F.min("day").alias("mnd"),
        F.max("day").alias("mxd"),
        F.min("pk").alias("mnp"),
        F.max("pk").alias("mxp"),
    )
    bucketed = src.crossJoin(F.broadcast(bounds)).select(
        "day",
        "pk",
        F.floor(
            (F.col("day") - F.col("mnd")) * 256.0
            / (F.col("mxd") - F.col("mnd") + 1)
        ).alias("b1"),
        F.floor(
            (F.col("pk") - F.col("mnp")) * 256.0
            / (F.col("mxp") - F.col("mnp") + 1)
        ).alias("b2"),
    )
    morton = F.lit(0).cast("bigint")
    for i in range(_Z_BITS):
        morton = (
            morton
            + F.shiftleft(
                F.shiftright(F.col("b1"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
            + F.shiftleft(
                F.shiftright(F.col("b2"), i).bitwiseAND(F.lit(1)), 2 * i
            )
        )
    keyed = bucketed.select("day", "pk", morton.alias("morton"))
    return (
        keyed.groupBy(
            F.floor(F.col("morton") / 1024.0).cast("int").alias("file_id")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
            F.min("pk").alias("min_pk"),
            F.max("pk").alias("max_pk"),
            (F.max("day") - F.min("day")).alias("day_span"),
            (F.max("pk") - F.min("pk")).alias("pk_span"),
        )
    )
