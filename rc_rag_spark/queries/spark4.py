"""Spark-4-native surfaces, each oracle-checked: Python UDTF
(Arrow-optimized table function), the VARIANT semi-structured type
(scalar variant_get in q224; the variant_explode TVF in q274),
correlated LATERAL subqueries, SQL pipe syntax (`|>`), named-parameter
SQL, string collations (UTF8_LCASE grouping), the Python Data Source
API (batch read here; the streaming-reader and writer halves live in
rc_rag_spark/sources/pyds.py), SQL UDFs (CREATE FUNCTION ... RETURN,
scalar and table-valued), recursive CTEs (WITH RECURSIVE),
EXECUTE IMMEDIATE with session variables + IDENTIFIER binding, SQL
scripting (BEGIN/DECLARE/SET blocks), hidden _metadata file-lineage
columns, GROUP BY ALL / ORDER BY ALL inference, lateral column
aliases, and LIMIT/OFFSET (proven equal to keyset pagination). The
reference pipeline has no counterpart for any of these
(it is a fixed Python loop); they are part of the engine's derived
surface, proving the repo tracks the platform's current query
capabilities rather than a Spark-3 subset."""

from __future__ import annotations

from pyspark.sql import functions as F

from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table
from rc_rag_spark.checkpoints import ckpt as _ckpt


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
        def eval(self, text):
            if text is None:
                return  # no text -> no sentences (matches unnest(NULL))
            for i, seg in enumerate(text.split(". ")):
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


@register(
    "q226_pipe_syntax_pricing",
    sql="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 10
    """,
    tags=("sql-pipe", "agg", "spark4"),
)
def q226_pipe_syntax_pricing(spark, sf_dir):
    """SQL pipe syntax (Spark 4.0's `|>` operators, SPARK-49555): the
    q01 pricing rollup re-spelled as a linear pipeline —
    FROM |> WHERE |> EXTEND |> AGGREGATE ... GROUP BY |> WHERE (post-agg
    HAVING) |> SELECT. Pipe SQL is a parser front end over the same
    Catalyst plans, so the check pins that each staged operator
    (EXTEND's computed column, AGGREGATE's implicit grouping output,
    the post-aggregate WHERE) lowers to exactly the classic-SQL
    semantics the oracle states. Decimal discipline identical to q01,
    so the hash is drift-free; the physical plan remains the same
    map-side-combine hash agg (grouping cardinality 6)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "q226_lineitem"
    )
    return spark.sql(
        """
        FROM q226_lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |> EXTEND CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(3,2))) AS disc_price
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                         AS sum_qty,
                     CAST(SUM(disc_price) AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_items > 10
        |> SELECT l_returnflag, l_linestatus, n_items, sum_qty, revenue
        """
    )


_Q227_ARGS = {"lo": 50_000.0, "hi": 400_000.0, "status": "F"}


@register(
    "q227_parameterized_sql",
    sql=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_totalprice BETWEEN {_Q227_ARGS["lo"]} AND {_Q227_ARGS["hi"]}
      AND o_orderstatus = '{_Q227_ARGS["status"]}'
    GROUP BY o_orderpriority
    """,
    tags=("parameterized-sql", "spark4"),
)
def q227_parameterized_sql(spark, sf_dir):
    """Named-parameter-marker SQL (spark.sql(..., args={...}), Spark
    3.4+ / first-class in the 4.x line): the query text carries :lo /
    :hi / :status markers and the literals are bound server-side as
    typed parameters — the injection-safe front door a query service
    exposes. The oracle inlines the same constants, so a binding bug
    (type coercion, off-by-one on BETWEEN bounds) surfaces as a hash
    mismatch. Plan-wise the bound literals participate in constant
    folding and parquet predicate pushdown exactly like inline
    literals."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q227_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM q227_orders
        WHERE o_totalprice BETWEEN :lo AND :hi
          AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args=_Q227_ARGS,
    )


@register(
    "q228_collated_grouping",
    sql="""
    WITH m AS (
        SELECT CASE
                 WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
                 WHEN c_custkey % 3 = 1 THEN c_mktsegment
                 ELSE upper(substr(c_mktsegment, 1, 1))
                      || lower(substr(c_mktsegment, 2))
               END AS seg_m
        FROM customer)
    SELECT lower(min(seg_m)) AS segment,
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT seg_m) AS INTEGER) AS n_case_variants
    FROM m
    GROUP BY lower(seg_m)
    """,
    tags=("collation", "spark4"),
)
def q228_collated_grouping(spark, sf_dir):
    """String collations (Spark 4.0, SPARK-46830): market segments are
    deterministically case-mangled three ways by custkey residue, then
    grouped under the UTF8_LCASE collation — the engine-native way to
    get case-insensitive GROUP BY / DISTINCT without rewriting every
    expression through lower(). The collated grouping key itself is an
    arbitrary case representative, so the output canonicalizes through
    lower(min(seg_m)) over the BINARY-collated source column (min is
    deterministic there); n_case_variants counts binary-distinct
    spellings inside each case-insensitive group (exactly 3 per
    segment). The oracle replays the semantics with lower(), which
    agrees with UTF8_LCASE only for ASCII data (Unicode case folding —
    dotted/dotless I, sharp s — would diverge); TPC-H's c_mktsegment
    is ASCII-only, so the equivalence is exact here. At scale
    collation-aware grouping hashes the collation key directly — one
    shuffle, no expression rewrite."""
    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey") % 3
    seg_m = (
        F.when(k == 0, F.lower("c_mktsegment"))
        .when(k == 1, F.col("c_mktsegment"))
        .otherwise(
            F.concat(
                F.upper(F.substring("c_mktsegment", 1, 1)),
                F.lower(F.expr("substr(c_mktsegment, 2)")),
            )
        )
    )
    return (
        c.select(seg_m.alias("seg_m"))
        .groupBy(F.collate("seg_m", "UTF8_LCASE").alias("_ci_key"))
        .agg(
            F.lower(F.min("seg_m")).alias("segment"),
            F.count("*").alias("n_rows"),
            F.count_distinct(F.collate("seg_m", "UTF8_BINARY"))
            .cast("int")
            .alias("n_case_variants"),
        )
        .select("segment", "n_rows", "n_case_variants")
    )


_Q229_N = 20_000
_Q229_PARTS = 8


@register(
    "q229_python_datasource",
    sql=f"""
    WITH t AS (
        SELECT i AS id,
               CAST(i % 7 AS INTEGER) AS k,
               CAST((i * 31) % 1000 AS DOUBLE) / 10.0 AS v
        FROM generate_series(0, {_Q229_N - 1}) s(i))
    SELECT k, COUNT(*) AS n_rows,
           CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
           MAX(id) AS max_id
    FROM t GROUP BY k
    """,
    tags=("datasource", "python-api", "spark4"),
)
def q229_python_datasource(spark, sf_dir):
    """Python Data Source API (Spark 4.0, SPARK-44076): a custom batch
    source registered with spark.dataSource.register and read through
    the normal spark.read.format(...) front door. The source splits its
    row range into 8 InputPartitions, so the scan is genuinely parallel
    (one Python reader per partition) — the extension point for reading
    bespoke feeds (internal formats, service APIs) as first-class
    tables. The reader yields pyarrow.RecordBatch objects (the API
    accepts either rows or batches): columnar batches skip per-row
    Python object construction entirely, which is the 100 TB form — a
    row-tuple generator would re-box every cell through the Python
    interpreter before Arrow serialization. Rows are a deterministic
    arithmetic series, so DuckDB's generate_series recomputes the
    aggregate exactly; the grouped result is also independent of the
    partition count, which is the partition-correctness check."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    n, parts = _Q229_N, _Q229_PARTS

    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 0))
            self.parts = int(options.get("parts", 1))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            import numpy as np
            import pyarrow as pa

            i = partition.value
            chunk = (self.n + self.parts - 1) // self.parts
            lo, hi = i * chunk, min((i + 1) * chunk, self.n)
            ids = np.arange(lo, hi, dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array((ids % 7).astype(np.int32), type=pa.int32()),
                    pa.array((ids * 31) % 1000 / 10.0, type=pa.float64()),
                ],
                names=["id", "k", "v"],
            )

    class SynthSource(DataSource):
        @classmethod
        def name(cls):
            return "rc_rag_synthrange"

        def schema(self):
            return "id bigint, k int, v double"

        def reader(self, schema):
            return SynthReader(self.options)

    spark.dataSource.register(SynthSource)
    df = (
        spark.read.format("rc_rag_synthrange")
        .option("n", str(n))
        .option("parts", str(parts))
        .load()
    )
    return df.groupBy("k").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("sum_v"),
        F.max("id").alias("max_id"),
    )


_Q230_N = 12_000


@register(
    "q230_python_datasource_writer",
    sql=f"""
    WITH t AS (
        SELECT i AS id,
               CAST(i % 7 AS INTEGER) AS k,
               CAST((i * 31) % 1000 AS DOUBLE) / 10.0 AS v
        FROM generate_series(0, {_Q230_N - 1}) s(i))
    SELECT k, COUNT(*) AS n_rows,
           CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
           MAX(id) AS max_id
    FROM t GROUP BY k
    """,
    tags=("datasource", "python-api", "writer", "spark4"),
)
def q230_python_datasource_writer(spark, sf_dir):
    """Writer half of the Python Data Source API (SPARK-44076): a
    native series DataFrame is written through the custom
    rc_rag_jsonldir sink (DataSourceArrowWriter — each executor task
    streams its Arrow batches to one JSONL file and reports a
    WriterCommitMessage; the driver's commit() publishes a _MANIFEST
    of exactly the committed files), then read back THROUGH the
    manifest and aggregated. The oracle recomputes the same aggregate
    from generate_series, so any loss, duplication, or value mangling
    across the write -> two-phase commit -> read-back path breaks the
    hash. Files from aborted/speculative task attempts never reach the
    manifest — the exactly-once contract a 100 TB sink needs under
    task retries (tests/test_pyds.py pins it directly). Eagerness
    note: the write executes during query construction (a sink cannot
    be lazy); the returned plan is the lazy read-back."""
    import os
    import shutil
    import tempfile

    from rc_rag_spark.sources import pyds

    pyds.register_all(spark)
    # deterministic per-SF sink path, dropped first: repeated
    # parity/bench/scale runs reuse ONE directory instead of leaking a
    # fresh mkdtemp per invocation (the q266/q269 external-path pattern)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = os.path.join(tempfile.gettempdir(), f"rc_rag_q230_{tag}")
    shutil.rmtree(d, ignore_errors=True)
    src = pyds.series_batch_df(spark, _Q230_N).repartition(4)
    src.write.format("rc_rag_jsonldir").option("path", d).mode(
        "append"
    ).save()
    files, _ = pyds.manifest_files(d)
    back = spark.read.schema(pyds.ROW_SCHEMA).json(
        [f"{d}/{f}" for f in files]
    )
    return back.groupBy("k").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("sum_v"),
        F.max("id").alias("max_id"),
    )


@register(
    "q231_sql_udf_scalar",
    sql="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(3,2)))
                    * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
               AS charged
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag
    """,
    tags=("sql-udf", "spark4"),
)
def q231_sql_udf_scalar(spark, sf_dir):
    """Scalar SQL UDF (Spark 4.0, SPARK-46057): CREATE TEMPORARY
    FUNCTION ... RETURNS DECIMAL ... RETURN <expr> — the charged-price
    formula factored into a named, typed, catalog-registered function
    instead of being repeated inline. SQL UDFs are inlined by the
    analyzer into the calling plan (no per-row dispatch, full codegen
    and pushdown), so this is the ZERO-COST abstraction path — unlike
    every Python UDF shape, nothing leaves the JVM. The oracle inlines
    the identical decimal arithmetic; declared parameter/return types
    make the UDF's decimal typing explicit, so an analyzer
    type-widening regression breaks the hash."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION q231_charged(
            p DECIMAL(12,2), d DECIMAL(3,2), t DECIMAL(3,2))
        RETURNS DECIMAL(18,6)
        RETURN p * (1 - d) * (1 + t)
        """
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "q231_lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               CAST(SUM(q231_charged(
                   CAST(l_extendedprice AS DECIMAL(12,2)),
                   CAST(l_discount AS DECIMAL(3,2)),
                   CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS charged
        FROM q231_lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag
        """
    )


@register(
    "q232_sql_udf_table",
    sql="""
    WITH bands AS (
        SELECT o_orderpriority,
               'base' AS tier,
               least(o_totalprice, 150000.0) AS amount
        FROM orders
        UNION ALL
        SELECT o_orderpriority, 'excess' AS tier,
               o_totalprice - 150000.0 AS amount
        FROM orders
        WHERE o_totalprice > 150000.0)
    SELECT o_orderpriority, tier,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM bands
    GROUP BY o_orderpriority, tier
    """,
    tags=("sql-udf", "udtf", "spark4"),
)
def q232_sql_udf_table(spark, sf_dir):
    """Table-valued SQL UDF (SPARK-46057): RETURNS TABLE(...) RETURN
    SELECT — each order's price decomposes into banded rows ('base'
    capped at 150 k, 'excess' above it) through a catalog-registered
    table function invoked per row via LATERAL. The analyzer inlines
    the body (no Python, no UDTF dispatch — contrast q223, where the
    same LATERAL shape dispatches a real Python UDTF), then Catalyst
    DECORRELATES: the observed plan evaluates the bands over DISTINCT
    o_totalprice values and joins back on the value (two dedup
    exchanges + the final agg; the join-back broadcasts at this SF and
    degrades to a sort-merge join on the high-cardinality value at
    scale). That is the general correlated-TVF contract, priced
    honestly: for a hot path this particular body should be written as
    the inline UNION ALL (one exchange, the oracle's shape) or as
    posexplode over an array<struct> literal; the query exists to pin
    the catalog-registered-TVF surface, not to recommend it for the
    100 TB inner loop. Banding is the warehouse idiom for tiered
    pricing/progressive rates."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION q232_bands(p DOUBLE)
        RETURNS TABLE(tier STRING, amount DOUBLE)
        RETURN
            SELECT 'base', least(p, 150000.0D)
            UNION ALL
            SELECT 'excess', p - 150000.0D WHERE p > 150000.0D
        """
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("q232_orders")
    return spark.sql(
        """
        SELECT o.o_orderpriority, b.tier,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(b.amount AS DECIMAL(18,4))) AS DOUBLE)
                   AS total
        FROM q232_orders o, LATERAL q232_bands(o.o_totalprice) b
        GROUP BY o.o_orderpriority, b.tier
        """
    )


@register(
    "q233_recursive_cte_keywalk",
    sql="""
    WITH RECURSIVE walk(k, price, depth) AS (
        SELECT o_orderkey, o_totalprice, 0 FROM orders
        UNION ALL
        SELECT k // 10, price, depth + 1 FROM walk WHERE k > 0)
    SELECT depth, COUNT(*) AS n_nodes,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS depth_value
    FROM walk
    GROUP BY depth
    """,
    tags=("recursive-cte", "iterative", "spark4"),
)
def q233_recursive_cte_keywalk(spark, sf_dir):
    """Recursive CTE (Spark 4.0, SPARK-24497): every order walks its
    key's decimal-digit ancestry (parent = k div 10, root at 0) — a
    guaranteed-acyclic forest whose recursion depth is log10(maxkey),
    so the loop terminates in ~6-12 iterations at ANY data scale. This
    is ENGINE-NATIVE iteration: the fixpoint loop runs inside one SQL
    query (each step a shuffle-free projection + filter over the
    previous frontier, union-all accumulated), where the repo's other
    iterative operators (PageRank q205, BFS, power iteration) drive
    the loop from Python with checkpoint-bounded lineage. For
    bounded-depth hierarchy walks (org charts, BOM explosions,
    category trees) the recursive CTE is the 100 TB form — no driver
    round trip per step. Integer `div` on both engines, so there is
    no floating-point key division to drift; per-depth decimal SUM
    keeps the value hash exact.

    cteRecursionRowLimit: Spark's runaway guard defaults to 1M
    ACCUMULATED rows — not a depth cap — so a perfectly-bounded
    8-level walk still trips it at ~125k source rows (found by the
    round-15 sf1 parity widening: 1.5M orders x ~8 digits = ~12M
    rows). The walk's true row count is rows x log10(maxkey); size
    the guard to the data, keeping it finite as a guard."""
    n_orders = table(spark, sf_dir, "orders").count()
    spark.conf.set(
        "spark.sql.cteRecursionRowLimit", str(max(1_000_000, n_orders * 16))
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("q233_orders")
    return spark.sql(
        """
        WITH RECURSIVE walk(k, price, depth) AS (
            SELECT o_orderkey, o_totalprice, 0 FROM q233_orders
            UNION ALL
            SELECT k div 10, price, depth + 1 FROM walk WHERE k > 0)
        SELECT depth, COUNT(*) AS n_nodes,
               CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
                   AS depth_value
        FROM walk
        GROUP BY depth
        """
    )


@register(
    "q234_execute_immediate",
    sql="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_totalprice > 250000.0
    GROUP BY o_orderstatus
    """,
    tags=("execute-immediate", "identifier", "spark4"),
)
def q234_execute_immediate(spark, sf_dir):
    """EXECUTE IMMEDIATE + session VARIABLE + IDENTIFIER (Spark 4.0):
    the statement text lives in a DECLAREd session variable (itself
    set through a named parameter, never string-spliced), the table
    name binds through the IDENTIFIER() clause and the threshold
    through a named USING parameter — the injection-safe dynamic-SQL
    front door for query services that template over table names (a
    raw f-string table name is the classic SQL-injection hole;
    IDENTIFIER validates its argument as exactly one identifier).
    Lowering is the ordinary Catalyst plan of the inner statement —
    the oracle inlines both bindings, so a binding/quoting bug breaks
    the hash."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q234_orders")
    stmt = (
        "SELECT o_orderstatus, COUNT(*) AS n_orders, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) "
        "AS total_price "
        "FROM IDENTIFIER(:tbl) WHERE o_totalprice > :thr "
        "GROUP BY o_orderstatus"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE q234_stmt STRING")
    spark.sql("SET VAR q234_stmt = :s", args={"s": stmt})
    return spark.sql(
        "EXECUTE IMMEDIATE q234_stmt "
        "USING 250000.0 AS thr, 'q234_orders' AS tbl"
    )


@register(
    "q235_sql_scripting",
    sql="""
    SELECT o_orderpriority,
           COUNT(*) AS n_above,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS value_above
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*)
        FROM orders)
    GROUP BY o_orderpriority
    """,
    tags=("sql-scripting", "spark4"),
)
def q235_sql_scripting(spark, sf_dir):
    """SQL scripting (Spark 4.0, SPARK-48338): a BEGIN ... END block
    with DECLARE'd local variables, a SET from a scalar subquery, and
    a final SELECT whose result is the block's result — procedural
    control flow (the feature also supports IF/WHILE/FOR) executed
    statement-by-statement by the engine, replacing driver-side Python
    glue for multi-step jobs. The threshold is the exact-decimal mean
    (decimal SUM / COUNT, one double division), so both engines
    compute the bit-identical cut and the above-mean membership
    cannot drift; the oracle replays the script as a scalar subquery.
    Scale: each statement is an ordinary Catalyst plan; the variable
    is a driver-held scalar, not data movement."""
    saved = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        table(spark, sf_dir, "orders").createOrReplaceTempView(
            "q235_orders"
        )
        return spark.sql(
            """
            BEGIN
              DECLARE thr DOUBLE DEFAULT 0.0;
              SET thr = (
                  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                              AS DOUBLE) / COUNT(*)
                  FROM q235_orders);
              SELECT o_orderpriority,
                     COUNT(*) AS n_above,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DOUBLE) AS value_above
              FROM q235_orders
              WHERE o_totalprice > thr
              GROUP BY o_orderpriority;
            END
            """
        )
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", saved)


@register(
    "q236_file_metadata_columns",
    sql="""
    SELECT 'orders.parquet' AS file_name,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    """,
    tags=("metadata-columns", "lineage", "spark4"),
)
def q236_file_metadata_columns(spark, sf_dir):
    """Hidden file-metadata columns (`_metadata.file_name` /
    `row_index` etc., SPARK-37273): the scan projects per-file lineage
    without any extra column stored in the data — the mechanism a
    curation pipeline uses to attribute every training row back to its
    source file (and to re-shard or quarantine by file). The fixture
    is a single file per table, so the oracle states the name as a
    literal and the grouped aggregate pins that metadata projection
    changes nothing about the data plan; the multi-file semantics
    (per-file row_index ranges, file_name distribution) are pinned by
    tests/test_stages_sources.py::test_file_metadata_columns_multifile.
    Scale: _metadata is populated from the file index at scan time —
    zero I/O added, and filters on it prune files like partition
    predicates."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        df.select(F.col("_metadata.file_name").alias("file_name"),
                  "o_totalprice")
        .groupBy("file_name")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "q241_group_by_all",
    sql="""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY ALL
    """,
    tags=("group-by-all", "agg", "spark4"),
)
def q241_group_by_all(spark, sf_dir):
    """GROUP BY ALL (SPARK-41631) — the analyzer infers the grouping
    keys as every non-aggregate SELECT item, so adding a dimension to
    the projection can never silently desynchronize from the GROUP BY
    list (the classic copy-paste bug in wide reports). ORDER BY ALL is
    exercised Spark-side and dropped before hashing (the driver's
    compare is order-insensitive); DuckDB implements the identical
    inference, so the oracle uses the same spelling — the check pins
    that both engines infer the same key set. Plan: identical to an
    explicit GROUP BY (one partial+final hash agg); inference is
    purely an analyzer feature."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q241_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM q241_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "q242_lateral_column_alias",
    sql="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                * CAST(0.07 AS DECIMAL(3,2)) AS DECIMAL(18,4))
                AS DOUBLE) AS tax,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                + CAST(CAST(o_totalprice AS DECIMAL(18,2))
                       * CAST(0.07 AS DECIMAL(3,2)) AS DECIMAL(18,4))
                AS DOUBLE) AS gross
    FROM orders
    WHERE o_totalprice > 400000.0
    """,
    tags=("lateral-alias", "spark4"),
)
def q242_lateral_column_alias(spark, sf_dir):
    """Lateral column aliases (SPARK-27561, 3.4+): a SELECT item
    references an alias defined EARLIER IN THE SAME SELECT (p → tax →
    gross), so a derivation chain reads top-to-bottom instead of
    re-nesting subqueries or repeating the expression. The analyzer
    rewrites the chain by inlining each alias — exactly the expansion
    the oracle states literally — so the hash pins that the sugar is
    pure. The decimal chain (p exact, tax at scale 4, gross summed
    before the final double cast) survives the rewrite typed, which is
    the part worth pinning: a naive textual inline that re-derived
    types would change the rounding."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q242_orders")
    return spark.sql(
        """
        SELECT o_orderkey, p, tax, gross
        FROM (
            SELECT o_orderkey,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS pd,
                   CAST(pd * CAST(0.07 AS DECIMAL(3,2))
                        AS DECIMAL(18,4)) AS taxd,
                   CAST(pd AS DOUBLE) AS p,
                   CAST(taxd AS DOUBLE) AS tax,
                   CAST(pd + taxd AS DOUBLE) AS gross
            FROM q242_orders
            WHERE o_totalprice > 400000.0
        )
        """
    )


@register(
    "q243_offset_vs_keyset_pagination",
    sql="""
    WITH ranked AS (
        SELECT o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                   AS rn
        FROM orders)
    SELECT 'offset' AS method, o_orderkey, o_totalprice
    FROM ranked WHERE rn > 40 AND rn <= 60
    UNION ALL
    SELECT 'keyset' AS method, o_orderkey, o_totalprice
    FROM ranked WHERE rn > 40 AND rn <= 60
    """,
    tags=("pagination", "offset", "spark4"),
)
def q243_offset_vs_keyset_pagination(spark, sf_dir):
    """LIMIT ... OFFSET (SPARK-28330) vs keyset pagination, proven
    equivalent: page 3 (rows 41-60 by price desc, orderkey tiebreak)
    fetched BOTH ways must be identical — the oracle emits the same
    window-ranked page twice. OFFSET is the convenient form and the
    scale trap: the engine must still produce and discard the first 40
    rows (top-(offset+limit) per partition, then a single-partition
    skip), so page N costs O(N·page) — fine for dashboards, quadratic
    for exhaustive export. The keyset form seeks WHERE (price, key) <
    (last seen) and takes LIMIT 20: the predicate pushes into the
    scan, each page costs the same, and that is the 100 TB pagination
    pattern. The boundary row is computed engine-side (first row of
    page 3 by OFFSET 40 LIMIT 1) so both forms run from the same
    state."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q243_orders")
    offset_page = spark.sql(
        """
        SELECT 'offset' AS method, o_orderkey, o_totalprice
        FROM q243_orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
        """
    )
    boundary_rows = spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM q243_orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 1 OFFSET 39
        """
    ).collect()
    if not boundary_rows:
        # fewer than 40 orders: page 3 is empty under BOTH methods —
        # return the (empty) offset page twice so the schema and the
        # method labels still line up with the oracle's
        return offset_page.unionByName(
            offset_page.select(
                F.lit("keyset").alias("method"),
                "o_orderkey",
                "o_totalprice",
            )
        )
    boundary = boundary_rows[0]
    keyset_page = spark.sql(
        """
        SELECT 'keyset' AS method, o_orderkey, o_totalprice
        FROM q243_orders
        WHERE o_totalprice < :bp
           OR (o_totalprice = :bp AND o_orderkey > :bk)
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
        """,
        args={"bp": boundary["o_totalprice"], "bk": boundary["o_orderkey"]},
    )
    return offset_page.unionByName(keyset_page)


@register(
    "q249_try_arithmetic",
    sql="""
    SELECT
        CAST(COUNT(CASE WHEN o_custkey % 997 = 0 THEN 1 END)
             AS BIGINT) AS n_div_zero,
        CAST(SUM(CASE WHEN o_custkey % 997 != 0
                      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT) // (o_custkey % 997)
                 END) AS BIGINT) AS sum_safe_div_cents,
        CAST(COUNT(CASE WHEN o_custkey % 1000 = 999 THEN 1 END)
             AS BIGINT) AS n_overflow,
        CAST(SUM(CAST(substr(o_orderpriority, 1, 1) AS BIGINT))
             AS BIGINT) AS sum_prio_digit,
        CAST(COUNT(CASE WHEN o_custkey % 500 = 0 THEN 1 END)
             AS BIGINT) AS n_bad_casts,
        CAST(COUNT(CASE WHEN o_orderkey % 300 = 0 THEN 1 END)
             AS BIGINT) AS n_elem_missing
    FROM orders
    """,
    tags=("spark4", "ansi", "try"),
)
def q249_try_arithmetic(spark, sf_dir):
    """ANSI-mode error-safe arithmetic (Spark 4 runs ANSI ON by
    default, SPARK-44111): the try_* family converts what would be a
    hard task failure — divide-by-zero, BIGINT overflow, malformed
    cast, out-of-bounds element — into NULL, which is the only sane
    semantics for a 100 TB batch job where one poison row must not
    kill a 1000-executor stage. One pass over orders exercises each
    family member against engineered poison at REALISTIC (~0.1-0.3%)
    poison rates:

      - try_divide by (custkey % 997): zero on ~0.1% of rows -> NULL;
      - try_add(BIGINT_MAX-998, custkey % 1000): overflows only when
        the residue is 999 -> NULL;
      - try_cast to INT of a value that is the unparseable status
        letter on 0.2% of rows (and a clean digit otherwise);
      - try_element_at past the end of a 2-element array on 1/300
        rows -> NULL.

    The rarity is not cosmetic, it is the MEASURED cost model: each
    caught failure throws a JVM exception inside the expression, and
    an earlier all-rows-poison version of this query cost 8.8 s at
    sf0.1 (~60 us/row of fillInStackTrace) vs sub-second with rare
    poison — try_* is the right contract for dirty data only while
    poison stays exceptional; a mostly-poison column wants an
    explicit predicate guard instead.

    A NULL *input* also comes back NULL from try_* — the error
    counters exclude those rows (IS NOT NULL guards on the inputs),
    because a missing value is not a caught failure (sfnulls gate,
    r13). The oracle replays the NULL-propagation contract with explicit
    CASE guards — DuckDB has no try_* and errors on the raw ops, so
    the guards ARE the semantics being pinned. The safe-division sum
    runs on exact integer CENTS with integer division (a rounded
    double division ties differently under Spark's HALF_UP vs
    DuckDB's HALF_EVEN — measured, not hypothetical). All counts/sums compile
    into a single map-side-combine hash aggregate: zero extra
    shuffles for the entire safety surface."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q249_orders")
    return spark.sql(
        """
        SELECT
            CAST(COUNT(CASE WHEN try_divide(o_totalprice,
                            CAST(o_custkey % 997 AS DOUBLE)) IS NULL
                            AND o_totalprice IS NOT NULL
                            AND o_custkey IS NOT NULL
                            THEN 1 END) AS BIGINT) AS n_div_zero,
            CAST(SUM(CASE WHEN o_custkey % 997 != 0
                     THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) div (o_custkey % 997)
                     END) AS BIGINT) AS sum_safe_div_cents,
            CAST(COUNT(CASE WHEN try_add(9223372036854774809L,
                            o_custkey % 1000) IS NULL
                            AND o_custkey IS NOT NULL THEN 1 END)
                 AS BIGINT) AS n_overflow,
            CAST(SUM(try_cast(substr(o_orderpriority, 1, 1) AS BIGINT))
                 AS BIGINT) AS sum_prio_digit,
            CAST(COUNT(CASE WHEN try_cast(
                            CASE WHEN o_custkey % 500 = 0
                                 THEN o_orderstatus
                                 ELSE substr(o_orderpriority, 1, 1) END
                            AS INT) IS NULL
                            AND (CASE WHEN o_custkey % 500 = 0
                                      THEN o_orderstatus
                                      ELSE substr(o_orderpriority, 1, 1)
                                 END) IS NOT NULL THEN 1 END)
                 AS BIGINT) AS n_bad_casts,
            CAST(COUNT(CASE WHEN try_element_at(array(1, 2),
                            CASE WHEN o_orderkey % 300 = 0 THEN 3
                                 ELSE 1 END) IS NULL
                            THEN 1 END) AS BIGINT) AS n_elem_missing
        FROM q249_orders
        """
    )


@register(
    "q252_xml_extract",
    sql="""
    WITH x AS (
        SELECT '<order><key>' || o_orderkey || '</key><prio>'
               || o_orderpriority || '</prio><price>'
               || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
               || '</price></order>' AS xml
        FROM orders),
    p AS (
        SELECT CAST(regexp_extract(xml, '<key>([0-9]+)</key>', 1)
                    AS BIGINT) AS okey,
               regexp_extract(xml, '<prio>([^<]*)</prio>', 1) AS prio,
               CAST(regexp_extract(xml, '<price>([0-9.]+)</price>', 1)
                    AS DECIMAL(18,2)) AS price
        FROM x)
    SELECT substr(prio, 1, 1) AS prio_class,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(okey) AS BIGINT) AS max_key,
           CAST(SUM(price) AS DOUBLE) AS sum_price
    FROM p GROUP BY substr(prio, 1, 1)
    """,
    tags=("spark4", "xml", "parsing"),
)
def q252_xml_extract(spark, sf_dir):
    """Native XML parsing (Spark 4.0, SPARK-44751): rows are rendered
    to XML documents, then parsed back through `from_xml` with an
    explicit schema — the engine-native path for the XML feeds (SEC
    filings, PubMed, legacy SOAP dumps) that still feed real corpora.
    The struct comes back typed (BIGINT key, DECIMAL(18,2) price), so
    the downstream aggregate runs on exact decimals, and the price is
    serialized from DECIMAL on both sides so the string form never
    carries float noise. The oracle has no XML parser and replays the
    extraction with anchored regexps — a deliberately different
    decoder pinning the same semantics. At scale from_xml is a
    per-row JVM expression inside whole-stage codegen: no UDF, no
    Python, shuffles only at the final 5-group aggregate. (The
    sibling spark.read.format('xml') file source shares the parser;
    the function form is what a 100 TB pipeline maps over an already
    loaded column.)"""
    o = table(spark, sf_dir, "orders")
    x = o.select(
        F.concat(
            F.lit("<order><key>"), F.col("o_orderkey"),
            F.lit("</key><prio>"), F.col("o_orderpriority"),
            F.lit("</prio><price>"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
            F.lit("</price></order>"),
        ).alias("xml")
    )
    p = x.select(
        F.from_xml(
            "xml", "key BIGINT, prio STRING, price DECIMAL(18,2)"
        ).alias("s")
    ).select("s.key", "s.prio", "s.price")
    return p.groupBy(
        F.substring("prio", 1, 1).alias("prio_class")
    ).agg(
        F.count("*").alias("n_orders"),
        F.max("key").alias("max_key"),
        F.sum("price").cast("double").alias("sum_price"),
    )


@register(
    "q254_listagg",
    sql="""
    WITH d AS (SELECT DISTINCT c_nationkey AS nat,
                               c_mktsegment AS seg
               FROM customer)
    SELECT nat,
           string_agg(seg, ',' ORDER BY seg) AS segments,
           CAST(COUNT(*) AS INTEGER) AS n_segments
    FROM d GROUP BY nat
    """,
    tags=("spark4", "listagg", "aggregate"),
)
def q254_listagg(spark, sf_dir):
    """Native LISTAGG (Spark 4.0, SPARK-42746): ordered, de-duplicated
    string aggregation as a first-class aggregate — `LISTAGG(DISTINCT
    seg, ',') WITHIN GROUP (ORDER BY seg)` — replacing the
    array_sort(collect_set(...)) + array_join idiom (q48) the corpus
    needed on Spark 3. WITHIN GROUP ordering is part of the aggregate
    contract, so the output string is deterministic under any
    partitioning: each partial aggregates its local values, the merge
    keeps the multiset, and ordering applies once at final — which is
    why LISTAGG without WITHIN GROUP is nondeterministic by spec and
    never belongs in a hash-checked pipeline. The dedup runs as an
    explicit DISTINCT stage before the aggregate: Spark 4.1's
    LISTAGG(DISTINCT x) WITHIN GROUP (ORDER BY x) trips an internal
    SortOrder cast bug when parsed from SQL, and the pre-aggregation
    DISTINCT is the plan the optimizer produces for it anyway (one
    extra partial-dedup, same single shuffle key). DuckDB replays it
    as string_agg(... ORDER BY) over the same deduped input."""
    c = table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("q254_customer")
    return spark.sql(
        """
        WITH d AS (SELECT DISTINCT c_nationkey AS nat,
                                   c_mktsegment AS seg
                   FROM q254_customer)
        SELECT nat,
               listagg(seg, ',') WITHIN GROUP (ORDER BY seg) AS segments,
               CAST(COUNT(*) AS INT) AS n_segments
        FROM d GROUP BY nat
        """
    )


# --------------------------------------------------------------------------
# q274 — variant_explode: shredding a VARIANT object into rows


@register(
    "q274_variant_explode",
    sql="""
    WITH src AS (
        SELECT event_type AS et,
               CASE WHEN value < 100 THEN 'low'
                    WHEN value < 300 THEN 'mid'
                    ELSE 'high' END AS band,
               CASE WHEN CAST(props ->> 'k' AS INTEGER) % 2 = 0
                    THEN 'even' ELSE 'odd' END AS kp
        FROM events),
    pairs AS (
        -- to_json omits NULL fields: an object with NULL et holds
        -- only {band, kp}, so et emits no row and kp's sorted-key
        -- position is 1 there, not 2
        SELECT 'band' AS field, band AS val, 0 AS enc_pos FROM src
        UNION ALL
        SELECT 'et', et, 1 FROM src WHERE et IS NOT NULL
        UNION ALL
        SELECT 'kp', kp, CASE WHEN et IS NULL THEN 1 ELSE 2 END
        FROM src)
    SELECT field, val,
           CAST(MIN(enc_pos) AS INTEGER) AS enc_pos,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY field, val
    """,
    tags=("variant", "json", "spark4", "udtf"),
)
def q274_variant_explode(spark, sf_dir):
    """variant_explode — the VARIANT table-valued function that shreds
    a semi-structured object into (pos, key, value) rows, completing
    the VARIANT surface q224's scalar variant_get started: each event
    serializes three derived attributes to JSON, parses to VARIANT,
    and LATERAL variant_explode fans every object field out as a row
    (the streaming-telemetry move: one ragged blob column -> a long
    key/value table without a schema migration). The aggregate pins
    two things the oracle replays from first principles: the
    per-(field, value) row counts, and enc_pos — the variant
    encoding's FIELD ORDER, which is sorted-by-key (band < et < kp)
    regardless of the JSON's insertion order (et first): a probe of
    the binary format's canonical key dictionary. CAST(variant AS
    STRING) on string fields yields the raw string (no JSON quotes),
    which is what lets DuckDB compare values directly. Scale:
    parse_json + variant_explode are native codegen'd; the explode
    multiplies rows by object width BEFORE the one count shuffle, so
    at 100 TB you shred only the fields you need (variant_get prunes;
    explode is for full-table pivots like this audit)."""
    e = table(spark, sf_dir, "events")
    j = F.to_json(
        F.struct(
            F.col("event_type").alias("et"),
            F.when(F.col("value") < 100, "low")
            .when(F.col("value") < 300, "mid")
            .otherwise("high")
            .alias("band"),
            F.when(
                F.get_json_object("props", "$.k").cast("int") % 2 == 0,
                "even",
            ).otherwise("odd").alias("kp"),
        )
    )
    view = "q274_events_json"
    e.select(j.alias("j")).createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT v.key AS field,
               CAST(v.value AS STRING) AS val,
               CAST(MIN(v.pos) AS INTEGER) AS enc_pos,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM {view}, LATERAL variant_explode(parse_json(j)) AS v
        GROUP BY v.key, CAST(v.value AS STRING)
    """)


@register(
    "q281_transform_with_state_batch",
    sql="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id
    """,
    tags=("stateful", "transformWithState", "spark4"),
)
def q281_transform_with_state_batch(spark, sf_dir):
    """transformWithStateInPandas (SPARK-49564, the Spark-4
    StatefulProcessor API) driven END-TO-END in batch mode: per-user
    event totals accumulated in typed RocksDB value state through the
    Python state-server protocol — getValueState / exists / get /
    update over the wire for every key — then hash-checked against a
    plain GROUP BY oracle. This is the operator the r1-r9 rounds could
    only cover with an xfail'd live test: the state-server client
    needs a protobuf runtime, supplied here by rc_rag_spark.vendor's
    pbshim (a minimal pure-Python wire-format implementation) whenever
    the real google.protobuf is absent. Every request the shim
    serializes is parsed by the JVM state server and vice versa, so
    the DuckDB hash check transitively validates the wire format too.
    The decimal-exact accumulation inside the processor (HALF_UP cent
    quantization, string-serialized Decimal state) makes the sums
    bit-identical to the oracle's DECIMAL(12,2) aggregation."""
    from rc_rag_spark.streaming.windows import user_totals_tws_batch
    from rc_rag_spark.vendor import ensure_protobuf_shim

    ensure_protobuf_shim(spark)
    return user_totals_tws_batch(table(spark, sf_dir, "events"))


_Q286_N = 20_000
_Q286_LO, _Q286_HI = 2_500, 9_000  # id >= LO AND id < HI


@register(
    "q286_pyds_filter_pushdown",
    sql=f"""
    WITH t AS (
        SELECT i AS id,
               CAST(i % 7 AS INTEGER) AS k,
               CAST((i * 31) % 1000 AS DOUBLE) / 10.0 AS v
        FROM generate_series(0, {_Q286_N - 1}) s(i))
    SELECT k, COUNT(*) AS n_rows,
           CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
           CAST(MIN(id) AS BIGINT) AS min_id,
           CAST(MAX(id) AS BIGINT) AS max_id
    FROM t
    WHERE id >= {_Q286_LO} AND id < {_Q286_HI} AND k <> 3
    GROUP BY k
    """,
    tags=("datasource", "python-api", "pushdown", "spark4"),
)
def q286_pyds_filter_pushdown(spark, sf_dir):
    """Python Data Source FILTER PUSHDOWN (Spark 4.1, pushFilters —
    SPARK-48788 family): rc_rag_pushrange absorbs the id-range
    predicates by narrowing its generated [lo, hi) span at PLAN time
    — the pruned partitions are never scheduled, which is what
    pushdown must mean at 100 TB (a predicate on the layout key cuts
    tasks, not just rows) — while the k <> 3 residual is yielded back
    to Spark per the API contract and evaluated post scan. The oracle
    applies all three predicates to the generate_series twin, so a
    source that narrowed the range wrongly (off-by-one on >, <=) or
    dropped the residual breaks the hash. Partition-count pruning
    itself is pinned in tests/test_pyds.py.

    Conf hygiene: filterPushdown.enabled is session-global, so it is
    set only for the duration of an eager localCheckpoint of the
    (tiny, post-aggregate) result and restored to its prior value —
    a later Python DataSource in the same session must not silently
    inherit pushdown because this query happened to run first. The
    returned plan is therefore the checkpointed scan (same eagerness
    pattern as q285/q230's maintenance queries)."""
    from rc_rag_spark.sources.pyds import register_all

    register_all(spark)
    # runtime-settable gate for pushFilters (default false in 4.1)
    conf_key = "spark.sql.python.filterPushdown.enabled"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        df = (
            spark.read.format("rc_rag_pushrange")
            .option("n", str(_Q286_N))
            .option("parts", "8")
            .load()
            .where(
                (F.col("id") >= _Q286_LO)
                & (F.col("id") < _Q286_HI)
                & (F.col("k") != 3)
            )
        )
        out = df.groupBy("k").agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_v"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        # materialize under the conf; the pruned scan runs HERE
        return out.transform(_ckpt)
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)


@register(
    "q285_compaction_roundtrip",
    sql="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events GROUP BY event_type
    """,
    tags=("maintenance", "compaction", "optimize"),
)
def q285_compaction_roundtrip(spark, sf_dir):
    """EXECUTED small-file compaction (the OPTIMIZE maintenance op —
    q245 plans bin packing; this one rewrites): events are first
    fragmented into a hive-partitioned copy (partitionBy event_type,
    17-way repartition => ~17 small files per partition — the
    streaming-ingest pathology), then operators/compaction.compact
    rewrites each partition to ~target-byte files chosen from a
    _metadata file census, and the query aggregates the COMPACTED
    output. The oracle recomputes the same aggregate straight from
    the source table, so any row lost, duplicated, or mangled across
    fragment -> census -> plan -> rewrite breaks the hash (file-count
    mechanics are pinned separately in tests/test_compaction.py).
    Eagerness note: like q230, the maintenance job runs during query
    construction; the returned plan is the lazy read of its output."""
    import os
    import shutil
    import tempfile

    from rc_rag_spark.operators.compaction import compact
    from rc_rag_spark.sources import table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    frag = os.path.join(tempfile.gettempdir(), f"rc_rag_q285_frag_{tag}")
    out = os.path.join(tempfile.gettempdir(), f"rc_rag_q285_out_{tag}")
    shutil.rmtree(frag, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    (
        table(spark, sf_dir, "events")
        .repartition(17)
        .write.partitionBy("event_type")
        .parquet(frag)
    )
    compact(spark, frag, out, target_bytes=8 * 1024 * 1024)
    # explicit schema + makedirs: an EMPTY events table fragments to
    # zero partitions, so compact writes nothing — the read-back must
    # still produce a typed empty table, not UNABLE_TO_INFER_SCHEMA
    os.makedirs(out, exist_ok=True)
    back = spark.read.schema(
        table(spark, sf_dir, "events").schema
    ).parquet(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        F.max("event_id").alias("max_id"),
    )
