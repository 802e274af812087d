"""Certificate-verifier honesty tests (round 15, VERDICT r14 item 3).

tools/certify_sf1.py replaces the sf1 rows+schema fallbacks for
q102/q212/q217 with solution-property certificates. A verifier that
passes everything is worse than no verifier — so beyond "the real
output certifies" (it is hash-checked against full DuckDB replays at
this SF, so the certificates MUST agree), every certificate is
mutation-tested: corrupt one aspect of the output and the matching
named check has to catch it. Mirrors the marker-ratchet discipline of
tests/test_oracle_independence.py."""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "certify_sf1", os.path.join(REPO, "tools", "certify_sf1.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def cert():
    return _mod()


@pytest.fixture(scope="module")
def outputs(spark, sf_dir):
    """One computation of each query's output, shared by the pass
    test and every mutation test."""
    import rc_rag_spark.queries as q

    return {
        name: q.REGISTRY[name].fn(spark, sf_dir).toPandas()
        for name in (
            "q102_dedup_clusters",
            "q212_semdedup_scaled",
            "q217_semdedup_hierarchical",
        )
    }


def test_true_outputs_certify(cert, spark, sf_dir, outputs):
    c102 = cert.certify_q102(spark, sf_dir, outputs["q102_dedup_clusters"])
    assert c102["fixpoint_violations"] == 0 and c102["edges"] > 0
    c212 = cert.certify_q212(spark, sf_dir, outputs["q212_semdedup_scaled"])
    assert c212["kept_rule"] == 0 and c212["n"] > 0
    c217 = cert.certify_q217(
        spark, sf_dir, outputs["q217_semdedup_hierarchical"]
    )
    assert c217["kept_rule"] == 0 and c217["m"] >= 1


def _expect_fail(fn, *args, match=None):
    with pytest.raises(AssertionError) as ei:
        fn(*args)
    if match is not None:
        assert match in str(ei.value), (
            f"wrong certificate tripped: wanted {match!r}, "
            f"got {str(ei.value)[:160]!r}"
        )


def test_q102_mutations(cert, spark, sf_dir, outputs):
    base = outputs["q102_dedup_clusters"]

    # relabel one non-canonical doc into a different cluster
    m = base.copy()
    other = m["cluster_id"].iloc[-1]
    victim = m.index[(m["doc_id"] != m["cluster_id"])
                     & (m["cluster_id"] != other)][0]
    m.loc[victim, "cluster_id"] = other
    _expect_fail(cert.certify_q102, spark, sf_dir, m)

    # OVER-MERGE: fuse two whole clusters under the smaller label —
    # per-edge fixpoint still holds inside each true component, so
    # only the union-find equality (or canonical-min) can see it
    m = base.copy()
    labs = sorted(m["cluster_id"].unique())
    assert len(labs) >= 2
    m.loc[m["cluster_id"] == labs[1], "cluster_id"] = labs[0]
    sizes = m.groupby("cluster_id")["doc_id"].transform("size")
    m["cluster_size"] = sizes.astype(base["cluster_size"].dtype)
    _expect_fail(cert.certify_q102, spark, sf_dir, m)

    # drop a row -> coverage
    _expect_fail(
        cert.certify_q102, spark, sf_dir, base.iloc[1:], match="coverage"
    )

    # corrupt a size
    m = base.copy()
    m.loc[m.index[0], "cluster_size"] = m["cluster_size"].iloc[0] + 1
    _expect_fail(cert.certify_q102, spark, sf_dir, m)


def test_q212_mutations(cert, spark, sf_dir, outputs):
    base = outputs["q212_semdedup_scaled"]

    m = base.copy()
    m.loc[m.index[0], "kept"] = 1 - int(m["kept"].iloc[0])
    _expect_fail(cert.certify_q212, spark, sf_dir, m, match="kept_rule")

    m = base.copy()
    m.loc[m.index[0], "cid"] = int(m["cid"].iloc[0]) + 1
    _expect_fail(cert.certify_q212, spark, sf_dir, m)

    m = base.copy()
    m.loc[m.index[0], "salt"] = int(m["salt"].iloc[0]) + 1
    _expect_fail(cert.certify_q212, spark, sf_dir, m, match="salt_formula")

    _expect_fail(
        cert.certify_q212, spark, sf_dir, base.iloc[1:], match="coverage"
    )


def test_q217_mutations(cert, spark, sf_dir, outputs):
    base = outputs["q217_semdedup_hierarchical"]

    m = base.copy()
    m.loc[m.index[0], "kept"] = 1 - int(m["kept"].iloc[0])
    _expect_fail(cert.certify_q217, spark, sf_dir, m, match="kept_rule")

    m = base.copy()
    m.loc[m.index[0], "scell"] = int(m["scell"].iloc[0]) + 1
    _expect_fail(cert.certify_q217, spark, sf_dir, m)

    _expect_fail(
        cert.certify_q217, spark, sf_dir, base.iloc[1:], match="coverage"
    )
