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
        .localCheckpoint(eager=True)
    )
    c = x.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").cast("int").alias("cid"), "pos", F.col("x").alias("c")
    )
    a = None
    for _ in range(_KM_STEPS):
        dist_term = F.round(
            (F.col("x") - F.col("c")) * (F.col("x") - F.col("c")), 12
        ).cast("decimal(28,12)")
        d = (
            x.join(F.broadcast(c), "pos")
            .groupBy("vec_id", "cid")
            .agg(F.sum(dist_term).alias("dist"))
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
            .localCheckpoint(eager=True)
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
    counts = counts.localCheckpoint(eager=True)  # reused by sketch + top-k
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
