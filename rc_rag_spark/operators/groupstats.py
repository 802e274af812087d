"""Grouped-map (applyInPandas) operator surface: per-group pandas
transformations where the semantics genuinely need the whole group in
one frame. The example operator — per-group z-score standardization —
also has a native window formulation used as its oracle.

Scale note: applyInPandas shuffles each group to one task; group
cardinality must exceed parallelism and single groups must fit in
memory. For 100 TB, key by a high-cardinality column (here: lang ×
source), never a handful of giant groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zscore_grouped_map(
    df: DataFrame, key_cols: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group (x - mean) / std via applyInPandas (ddof=1; groups of
    size 1 or zero variance → 0.0)."""
    import pandas as pd  # noqa: F401

    schema = ", ".join(
        [f"{c} {t}" for c, t in df.select(*key_cols, value_col).dtypes]
        + [f"{out_col} double"]
    )

    def standardize(pdf):
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault('zscore_grouped_map')
        v = pdf[value_col]
        std = v.std(ddof=1)
        if len(pdf) < 2 or std == 0 or std != std:
            pdf[out_col] = 0.0
        else:
            pdf[out_col] = (v - v.mean()) / std
        return pdf[[*key_cols, value_col, out_col]]

    return df.select(*key_cols, value_col).groupBy(*key_cols).applyInPandas(
        standardize, schema=schema
    )


def zscore_native(
    df: DataFrame, key_cols: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Native window twin of zscore_grouped_map (the oracle)."""
    w = Window.partitionBy(*key_cols)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    return df.select(*key_cols, value_col).withColumn(
        out_col,
        F.when(
            std.isNull() | (std == 0), F.lit(0.0)
        ).otherwise((F.col(value_col) - mean) / std),
    )


_trimmed_mean_udf = None


def trimmed_mean(value_col, trim: float = 0.1):
    """Grouped-AGG pandas UDF (the third pandas-UDF flavor next to
    scalar and grouped-map): per-group mean after dropping
    floor(n*trim) values from each end of the SORTED group. Spark has
    no native trimmed mean; as a grouped-agg UDF it slots directly
    into groupBy().agg() with partial Arrow batching — unlike
    applyInPandas there is no per-group DataFrame materialization in
    the output path. Deterministic: trimming by sorted position keeps
    a well-defined multiset even with ties (equal values at the cut
    contribute the same mean)."""
    from pyspark.sql.functions import pandas_udf

    global _trimmed_mean_udf
    if _trimmed_mean_udf is None:

        @pandas_udf("double")
        def _udf(v: pd.Series) -> float:
            a = np.sort(v.to_numpy(dtype=np.float64))
            k = int(len(a) * 0.1)
            return float(a[k: len(a) - k].mean()) if len(a) else float("nan")

        _trimmed_mean_udf = _udf
    if trim != 0.1:
        raise ValueError("trimmed_mean: only trim=0.1 is compiled")
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return _trimmed_mean_udf(c)
