"""Self-tests of the oracle-parity harness: a gate that cannot fail is
not a gate. Deliberately perturbed results must be rejected."""

from __future__ import annotations

import pytest

import rc_rag_spark.queries as q
from tests.oracle import assert_parity, canonicalize, run_oracle


def test_harness_rejects_wrong_values(spark, sf_dir):
    spec = q.REGISTRY["q01_pricing_summary"]

    class Mutated:
        sql = spec.sql

        @staticmethod
        def fn(spark, sf_dir):
            from pyspark.sql import functions as F

            return spec.fn(spark, sf_dir).withColumn(
                "sum_qty", F.col("sum_qty") + 0.01
            )

    with pytest.raises(AssertionError, match="row mismatches"):
        assert_parity(spark, "q01_mutated", Mutated, sf_dir)


def test_harness_rejects_missing_rows(spark, sf_dir):
    spec = q.REGISTRY["q03_distinct_parts"]

    class Truncated:
        sql = spec.sql

        @staticmethod
        def fn(spark, sf_dir):
            return spec.fn(spark, sf_dir).limit(1)

    with pytest.raises(AssertionError, match="row count"):
        assert_parity(spark, "q03_truncated", Truncated, sf_dir)


def test_harness_rejects_renamed_columns(spark, sf_dir):
    spec = q.REGISTRY["q03_distinct_parts"]

    class Renamed:
        sql = spec.sql

        @staticmethod
        def fn(spark, sf_dir):
            return spec.fn(spark, sf_dir).withColumnRenamed("n", "count")

    with pytest.raises(AssertionError, match="column mismatch"):
        assert_parity(spark, "q03_renamed", Renamed, sf_dir)


def test_canonicalize_float_rounding():
    import pandas as pd

    a = canonicalize(pd.DataFrame({"x": [1.0000000001]}))
    b = canonicalize(pd.DataFrame({"x": [1.0000000002]}))
    c = canonicalize(pd.DataFrame({"x": [1.001]}))
    assert a == b  # below 1e-9 → equal after rounding
    assert a != c


def test_oracle_runner_registers_all_views(sf_dir):
    df = run_oracle(
        "SELECT (SELECT COUNT(*) FROM region) AS r,"
        " (SELECT COUNT(*) FROM embeddings) AS e", sf_dir
    )
    assert df["r"][0] == 5 and df["e"][0] > 0


def test_decimal_sums_partition_invariant(spark, sf_dir, tmp_path):
    """The determinism discipline's core claim: aggregate results are
    bit-identical regardless of physical partitioning. Runs the REAL
    registered query against re-partitioned copies of lineitem."""
    from rc_rag_spark.sources import table

    li = table(spark, sf_dir, "lineitem")
    spec = q.REGISTRY["q01_pricing_summary"]
    base = canonicalize(spec.fn(spark, sf_dir).toPandas())
    for parts in (1, 7, 32):
        d = str(tmp_path / f"rep{parts}")
        import os

        os.makedirs(d, exist_ok=True)
        li.repartition(parts).write.mode("overwrite").parquet(
            f"{d}/lineitem.parquet"
        )
        got = canonicalize(spec.fn(spark, d).toPandas())
        assert got == base, f"partitioning {parts} changed results"


def test_checkpoint_knob_modes(spark, tmp_path):
    """checkpoints.py (round 14): default mode truncates lineage via
    localCheckpoint (executor-memory blocks, no files); reliable mode
    writes REAL checkpoint files under the configured dir — the
    executor-loss-survivable posture tests/test_executor_loss.py
    proves end-to-end. Both modes must return identical rows."""
    import os

    from rc_rag_spark.checkpoints import ckpt

    want = list(range(100))

    local = spark.range(100).transform(ckpt)
    assert sorted(r["id"] for r in local.collect()) == want

    ckdir = str(tmp_path / "reliable_ck")
    spark.conf.set("spark.rc_rag.checkpoint.dir", ckdir)
    spark.conf.set("spark.rc_rag.checkpoint.reliable", "true")
    try:
        reliable = spark.range(100).transform(ckpt)
        assert sorted(r["id"] for r in reliable.collect()) == want
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(ckdir)
            for f in fs
        ]
        assert files, "reliable mode wrote no checkpoint files"
    finally:
        spark.conf.unset("spark.rc_rag.checkpoint.reliable")
        spark.conf.unset("spark.rc_rag.checkpoint.dir")


def test_checkpoint_dir_guard_non_local_master():
    """checkpoints.py (round-14 ADVICE): with reliable mode on, no
    checkpoint dir configured, and a NON-local master, the tempdir
    fallback would silently write each executor's blocks to its own
    local disk — recovery after executor loss (the scenario the knob
    exists for) would read garbage. The guard must refuse; on local
    masters the fallback stays, with a warning."""
    import warnings

    import pytest

    from rc_rag_spark import checkpoints as C

    class FakeDir:
        def isEmpty(self):
            return True

    class FakeScalaSC:
        def getCheckpointDir(self):
            return FakeDir()

    class FakeJsc:
        def sc(self):
            return FakeScalaSC()

    class FakeSC:
        def __init__(self, master):
            self.master = master
            self._jsc = FakeJsc()
            self.set_dir = None

        def setCheckpointDir(self, d):
            self.set_dir = d

    class FakeConf:
        def get(self, key, default=None):
            return default

    class FakeSpark:
        def __init__(self, master):
            self.sparkContext = FakeSC(master)
            self.conf = FakeConf()

    bad = FakeSpark("spark://cluster-master:7077")
    with pytest.raises(ValueError, match="SHARED checkpoint dir"):
        C._ensure_checkpoint_dir(bad)
    assert bad.sparkContext.set_dir is None

    ok = FakeSpark("local[4]")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        C._ensure_checkpoint_dir(ok)
    assert ok.sparkContext.set_dir is not None
    assert any("driver-local tempdir" in str(x.message) for x in w)

    okc = FakeSpark("local-cluster[2,2,2048]")
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        C._ensure_checkpoint_dir(okc)
    assert okc.sparkContext.set_dir is not None


def test_clean_checkpoints_conf_in_session_defaults():
    """Reliable-mode iterative loops would leak superseded checkpoint
    dirs on shared storage without the ContextCleaner conf, which is
    creation-time-only — so it must live in DEFAULT_CONF (round-14
    ADVICE)."""
    from rc_rag_spark.session import DEFAULT_CONF

    assert (
        DEFAULT_CONF["spark.cleaner.referenceTracking.cleanCheckpoints"]
        == "true"
    )
