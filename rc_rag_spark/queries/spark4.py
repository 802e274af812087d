"""Spark-4-native surfaces: Python UDTF (Arrow-optimized table
function), the VARIANT semi-structured type, and correlated LATERAL
subqueries — the three query-surface additions of the Spark 4 line,
each oracle-checked. The reference pipeline has no counterpart for
any of these (it is a fixed Python loop); they are part of the
engine's derived surface, proving the repo tracks the platform's
current query capabilities rather than a Spark-3 subset."""

from __future__ import annotations

from pyspark.sql import functions as F

from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table


@register(
    "q223_udtf_sentence_split",
    sql="""
    WITH p AS (SELECT doc_id, str_split(text, '. ') AS parts
               FROM documents),
    u AS (SELECT doc_id,
                 CAST(generate_subscripts(parts, 1) AS INTEGER) AS idx,
                 unnest(parts) AS sentence
          FROM p)
    SELECT doc_id, idx, sentence,
           CAST(length(sentence) AS INTEGER) AS n_chars
    FROM u
    """,
    tags=("udtf", "text", "spark4"),
)
def q223_udtf_sentence_split(spark, sf_dir):
    """Python UDTF through the SQL front door: an Arrow-optimized
    table function splits each document into '. '-delimited segments
    and emits one row per segment via a correlated LATERAL call —
    the Spark-4 UDTF surface (pyspark.sql.functions.udtf), distinct
    from every UDF shape already covered (scalar/grouped-agg/
    grouped-map/mapInPandas/state). The split is a literal (non-regex)
    delimiter split, so DuckDB's str_split + generate_subscripts
    replays it exactly, empty segments included. Scale note: UDTFs are
    the Python slow path like any UDF — this one exists to pin the
    dispatch surface; the equivalent native plan is one
    posexplode(split(...)), which is what a hot path should use."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, sentence string, n_chars int",
          useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            for i, seg in enumerate((text or "").split(". ")):
                yield i + 1, seg, len(seg)

    spark.udtf.register("q223_sentence_split", SentenceSplit)
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "q223_documents"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.idx, t.sentence, t.n_chars
        FROM q223_documents d, LATERAL q223_sentence_split(d.text) t
        """
    )


@register(
    "q224_variant_extract",
    sql="""
    SELECT o_orderkey,
           o_totalprice AS vprice,
           o_orderpriority AS vpriority,
           upper(o_orderstatus) AS vtag2,
           CAST(NULL AS INTEGER) AS vmissing
    FROM orders
    """,
    tags=("variant", "json", "spark4"),
)
def q224_variant_extract(spark, sf_dir):
    """VARIANT round trip (Spark 4's semi-structured type): each order
    serializes to JSON (nested object + array), parses into a VARIANT
    with parse_json, and values come back with typed variant_get
    paths — a double, a string field of the nested object, an array
    subscript, and a try_variant_get miss that must yield NULL rather
    than raise. The oracle recomputes the SAME values straight from
    the source columns: the check pins that the
    to_json -> parse_json -> variant_get pipeline is lossless for
    exact doubles and strings (shredding/typing bugs would surface as
    value or NULL-mask mismatches). Scale: parse_json/variant_get are
    native codegen'd expressions — the column-pruned binary variant
    encoding is the 100 TB path for ragged telemetry, replacing
    per-query JSON string re-parsing."""
    o = table(spark, sf_dir, "orders")
    j = F.to_json(
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.struct(
                F.col("o_orderpriority").alias("priority")
            ).alias("meta"),
            F.array(
                F.col("o_orderstatus"), F.upper("o_orderstatus")
            ).alias("tags"),
        )
    )
    v = F.parse_json(j)
    return o.select(
        "o_orderkey",
        F.variant_get(v, "$.price", "double").alias("vprice"),
        F.variant_get(v, "$.meta.priority", "string").alias("vpriority"),
        F.variant_get(v, "$.tags[1]", "string").alias("vtag2"),
        F.try_variant_get(v, "$.absent", "int").alias("vmissing"),
    )


@register(
    "q225_lateral_topk",
    sql="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey)
                   AS rn
        FROM orders)
    SELECT c.c_custkey, c.c_name, r.o_orderkey,
           r.o_totalprice AS top_price
    FROM customer c JOIN ranked r ON r.o_custkey = c.c_custkey
    WHERE r.rn <= 2
    """,
    tags=("lateral", "join", "spark4"),
)
def q225_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY + LIMIT — top-2
    orders per customer spelled the way an analyst writes it, through
    Spark SQL's lateral-join planner (supported since 3.4, decorrelated
    by Catalyst into the same shape as the window formulation the
    oracle uses). Pinning this surface matters because lateral
    decorrelation is a planner feature, not sugar: a regression would
    change results, not just plans. Inner lateral ⇒ customers with no
    orders drop, matching the oracle's inner join."""
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "q225_customer"
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("q225_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.top_price
        FROM q225_customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice AS top_price
            FROM q225_orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        """
    )
