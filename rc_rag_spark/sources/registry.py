"""Fixture-table registry.

The driver materializes a TPC-H-ish star schema plus events/documents/
embeddings as one parquet file per table (TESTDATA.md). Reads go
through ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning and (on partitioned layouts) partition pruning for free.

Reference parity: the reference's only source is a JSONL scan
(`/root/reference/code/utils.py:352-358` load_source) and its only sink
an append JSONL writer (`utils.py:361-365`); ``read_jsonl`` /
``write_jsonl`` cover that surface, parquet is the at-scale format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from rc_rag_spark.session import tune_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    events.parquet stores TIMESTAMP(NANOS) which the Spark reader
    rejects; read nanos as raw int64 and rebuild a microsecond
    timestamp with exact integer division (a double division would
    lose up to ~128 ns at 2024-epoch magnitudes).
    """
    tune_runtime(spark)
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    for col, dtype in df.dtypes:
        if col == "ts" and dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype == "timestamp_ntz":
            # Newer Spark reads TIMESTAMP(NANOS)/unadjusted parquet time
            # as TIMESTAMP_NTZ, which streaming watermarks and
            # unix_micros reject. The session timezone is pinned UTC
            # (session.tune_runtime), so casting NTZ -> TIMESTAMP is a
            # value-exact reinterpretation, not a shift.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def wide_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`table()` plus a CONDITIONAL round-robin rebalance: applied only
    when the scan yields far fewer partitions than the session has
    cores. Each local sf fixture is ONE parquet file with ONE row
    group, so the scan — and every narrow transform chained on it —
    would execute as a single task no matter how many cores the session
    has; the rebalance is the difference between 1-core and 32-core
    execution of an expression-dense projection (regex parsing, quality
    scoring, decimal-heavy aggregation). On a real cluster the input is
    thousands of splittable files, the partition count exceeds the
    threshold, and NO exchange is added — the fact table is never
    round-robin-shuffled at scale."""
    df = table(spark, sf_dir, name)
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= parallelism:
        return df
    return df.repartition(parallelism)


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = False
) -> dict[str, DataFrame]:
    out = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    mode: str = "PERMISSIVE",
    corrupt_column: str | None = None,
) -> DataFrame:
    """JSONL scan (reference S1). Schema-on-read when provided — at
    scale never rely on inference (it triggers a full extra pass).

    Malformed-line policy is explicit because a 100 TB crawl WILL
    contain garbage lines: PERMISSIVE (default) nulls the row's fields
    and, when ``corrupt_column`` is set (it must also appear in the
    schema as a STRING field), captures the raw line there for
    quarantine; DROPMALFORMED silently drops; FAILFAST raises on the
    first bad line (the right setting for trusted stage tables)."""
    reader = spark.read.option("mode", mode)
    if corrupt_column is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "append") -> None:
    """JSONL append sink (reference S2)."""
    df.write.mode(mode).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan (SURVEY §2.2 scans row). Schema-on-read when provided —
    at scale inference triggers a full extra pass, so callers should
    always pass one; header=True only consumes the first line per
    file."""
    reader = (
        spark.read.option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "FAILFAST")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    delimiter: str = ",",
) -> None:
    """CSV sink (interchange format only — parquet is the at-scale
    sink; CSV carries no types, no stats, no pruning)."""
    (
        df.write.mode(mode)
        .option("header", header)
        .option("delimiter", delimiter)
        .csv(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Partitioned parquet sink (the at-scale S2): directory-partition
    on low-cardinality keys so downstream reads get partition pruning
    (PartitionFilters in the scan), with per-file record caps to avoid
    giant files."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan (columnar alternative to parquet; same pushdown/pruning
    machinery in Catalyst — PushedFilters/ReadSchema apply)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink."""
    df.write.mode(mode).orc(path)


def overwrite_changed_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Incremental partitioned write: replace ONLY the directory
    partitions present in `df`, leaving the rest of the table intact
    (spark.sql.sources.partitionOverwriteMode=dynamic scoped to this
    write). This is the parquet-level upsert a daily/hourly pipeline
    uses at 100 TB: reprocess one day -> rewrite one directory, no
    full-table rewrite, readers keep partition pruning. The mode is a
    per-WRITE option (not a session conf mutation), so concurrent
    writers in the same session keep their own semantics."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )
