"""Skew- and layout-management utilities (100 TB posture).

AQE's skew-join splitting handles most cases at runtime; these are the
explicit tools for when the key distribution is known ahead of time:

  salted_join       replicate the small side S ways, salt the big
                    side's key — a hot key fans out over S reducers
  key_histogram     find hot keys cheaply (sampled count-by-key)
  write_bucketed    persist bucketBy(sort) tables so repeated joins
                    on the key are co-located (no shuffle at read)
  repartition_by    explicit pre-partitioning helper to reuse one
                    shuffle across several downstream operators
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_histogram(df: DataFrame, key: str, fraction: float = 0.01,
                  top: int = 20, seed: int = 42) -> DataFrame:
    """Approximate hot-key histogram from a sample (one narrow pass +
    tiny agg; use before choosing a salting factor)."""
    return (
        df.sample(fraction=fraction, seed=seed)
        .groupBy(key)
        .agg(F.count("*").alias("sampled_n"))
        .orderBy(F.col("sampled_n").desc())
        .limit(top)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a random salt in
    [0, S); the small side is exploded S× with every salt value. The
    join key becomes (key, salt) so one hot key spreads over S
    reducers. Correct for inner/left joins on an equi-key.

    The S× replication is the price — use only for genuinely skewed
    keys (salt the hot keys alone by filtering them into this path and
    unioning with a plain join for the rest).

    Measured (SCALING.md skew-join stress, 40M-row fact with one key
    owning 20%, broadcast disabled, local[32]): hot-key salting alone
    1.5× over the plain sort-merge join, AQE skew-split alone 2.2×,
    salted + AQE 3.0× — salting composes with AQE rather than
    replacing it, because AQE splits oversized partitions post-shuffle
    while salting also rebalances the map-side write."""
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def split_salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: list,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hybrid: salt ONLY the listed hot keys, plain-join the rest, and
    union. This is the production pattern — pay replication only where
    the skew is."""
    # NULL-safe split: isin() yields NULL for NULL keys, and where(~NULL)
    # drops the row — NULL-keyed rows must stay on the plain-join side
    # (they never match an equi-join but must survive a left join).
    hot = F.coalesce(F.col(key).isin(hot_keys), F.lit(False))
    plain = big.where(~hot).join(small.where(~hot), key, how)
    salted = salted_join(big.where(hot), small.where(hot), key,
                         salt_buckets, how)
    return plain.unionByName(salted)


def repartition_by(df: DataFrame, *keys: str | Column,
                   num_partitions: int | None = None) -> DataFrame:
    """Explicit hash pre-partitioning; downstream groupBy/join on the
    same keys reuses this shuffle (exchange reuse)."""
    if num_partitions:
        return df.repartition(num_partitions, *[F.col(k) if isinstance(k, str) else k for k in keys])
    return df.repartition(*[F.col(k) if isinstance(k, str) else k for k in keys])


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_key: str,
    num_buckets: int = 16,
    sort_key: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) table: two tables
    bucketed identically on the join key join WITHOUT a shuffle."""
    writer = df.write.mode("overwrite").format("parquet")
    if path:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(name)


class runtime_bloom_thresholds:
    """Scoped enablement of Spark's runtime bloom-filter join pruning.

    Spark (3.3+) injects a `bloom_filter_agg` on the selective
    (creation) side of a shuffle join and a `might_contain` probe on
    the large (application) side, pruning fact rows BEFORE the shuffle
    — the runtime analog of a broadcast semi-join, and one of the
    biggest shuffle reducers on selective fact⋈filtered-dim joins at
    100 TB. The defaults only fire when the application-side scan is
    ≥ 10 GB, so local fixtures never see it; this context manager
    lowers the thresholds (and restores them) so tests and local runs
    can pin the mechanism the cluster relies on.

    Usage:
        with runtime_bloom_thresholds(spark):
            big.join(filtered_dim, "k")...
    """

    _KEYS = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
    }

    def __init__(self, spark):
        self.conf = spark.conf
        self.saved: dict[str, str | None] = {}

    def __enter__(self):
        for k, v in self._KEYS.items():
            try:
                self.saved[k] = self.conf.get(k)
            except Exception:
                self.saved[k] = None
            self.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                self.conf.unset(k)
            else:
                self.conf.set(k, v)
        return False
