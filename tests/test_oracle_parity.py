"""Replicates the driver's correctness gate locally: every registered
query with a DuckDB oracle must match it exactly at the test SF."""

from __future__ import annotations

import pytest

import rc_rag_spark.queries as q
from tests.oracle import assert_parity

SQL_CHECKED = sorted(n for n, s in q.REGISTRY.items() if s.sql)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_parity(spark, sf_dir, name):
    assert_parity(spark, name, q.REGISTRY[name], sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_registry_contract(spark):
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    for k in oracles:
        assert k in qs
