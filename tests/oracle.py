"""Shared oracle-parity harness — mirrors the driver's correctness
check: run the Spark query and the DuckDB SQL on the same parquet
tables, sort columns by name, sort rows, compare values exactly
(floats to 1e-9)."""

from __future__ import annotations

import math

import duckdb

from rc_rag_spark.sources import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def canonicalize(pdf):
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # tz-aware → naive UTC so Spark (arrow, UTC) and duckdb agree
    for c in pdf.columns:
        if pd.api.types.is_datetime64tz_dtype(pdf[c]):
            pdf[c] = pdf[c].dt.tz_convert("UTC").dt.tz_localize(None)
        elif pdf[c].dtype == object:
            # a float NaN inside an OBJECT column (string/bool/mixed)
            # is a transport-layer missing marker — DuckDB's fetchdf
            # hands NULL booleans back as NaN where Spark's toPandas
            # hands None — never a genuine float value (those live in
            # float64 columns, where NaN-vs-NULL stays distinguishable
            # and checked). Normalize so both engines' SQL NULLs
            # compare equal.
            pdf[c] = pdf[c].map(
                lambda v: None
                if isinstance(v, float) and math.isnan(v)
                else v
            )
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
                # The driver's canonicalizer cannot sort/hash non-scalar
                # cells (numpy.ndarray is unhashable) — fail loudly here
                # so parity tests catch it before the driver does.
                raise AssertionError(
                    f"non-scalar value in oracle-checked output: {v!r} — "
                    "join arrays to strings in both query and oracle SQL"
                )
            elif isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(f"{round(v, 9):.9f}")
            elif v is None or v != v:
                row.append("NULL")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def assert_parity(spark, name, spec, sf_dir):
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    oracle_pdf = run_oracle(spec.sql, sf_dir)
    assert sorted(c.lower() for c in spark_pdf.columns) == sorted(
        c.lower() for c in oracle_pdf.columns
    ), f"{name}: column mismatch {list(spark_pdf.columns)} vs {list(oracle_pdf.columns)}"
    s_rows, o_rows = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(o_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
