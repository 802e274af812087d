"""Property-based tests (SURVEY §5.4) via hypothesis, driven through
the Spark expressions in one batched pass per property."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from rc_rag_spark.functions import text as T
from tests import golden_ref as G

TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Z"), max_codepoint=0x2FF
    ),
    max_size=60,
)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(TEXT)
def test_normalize_idempotent_python(s):
    assert G.normalize(G.normalize(s)) == G.normalize(s)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(TEXT)
def test_tokenize_self_containment(s):
    """has_answer(x, x) == 1 whenever x produces any tokens."""
    toks = G.tokenize(s)
    if toks:
        assert G.has_answer([s], s) == 1


@settings(max_examples=30, deadline=None, derandomize=True)
@given(TEXT.filter(lambda s: G.normalize(s) != ""))
def test_em_implies_f1(s):
    assert G.f1([s], s) == 1.0
    assert G.em([s], s) == 1


@pytest.fixture(scope="module")
def prop_df(spark):
    """Batch of adversarial strings checked through Spark in one pass."""
    cases = [
        "", " ", "a", "the", "A.B-C", "x  y\tz", "ﬁne", "naïve café",
        "N/A", "$$$", "##x##", "1.5 or 2.5", "Answer: ok",
        "....", "a-b_c", "über straße", "łódź", "ñ", "日本語 テスト",
    ]
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "idx int, txt string"
    )


def test_spark_normalize_idempotent(prop_df):
    out = prop_df.select(
        "idx",
        T.normalize_answer("txt").alias("n1"),
        T.normalize_answer(T.normalize_answer("txt")).alias("n2"),
    ).collect()
    for r in out:
        assert r["n1"] == r["n2"], r


def test_spark_self_match(prop_df):
    out = prop_df.select(
        "idx",
        "txt",
        T.exact_match(F.array(F.col("txt")), F.col("txt")).alias("em"),
        T.token_f1(F.array(F.col("txt")), F.col("txt")).alias("f1"),
        T.contains_tokens("txt", "txt").alias("ct"),
    ).collect()
    for r in out:
        assert r["em"] == 1, r
        assert r["f1"] == 1.0, r
        assert r["ct"] is True, r


def test_confusion_cells_partition(spark):
    """All four (label, pred) combinations partition the input."""
    from rc_rag_spark.pipeline import decisions as D

    rows = [
        (i, ["keep", "discard"][i % 2], ["keep", "discard"][(i // 2) % 2])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id int, label_decision string, pred_decision string")
    c = D.confusion_cells(df).collect()[0]
    assert c["AK"] + c["AD"] + c["UK"] + c["UD"] == 40
    assert c["AK"] == c["AD"] == c["UK"] == c["UD"] == 10
    m = D.risk_metrics(D.confusion_cells(df)).collect()[0]
    assert m["risk"] == 0.5 and m["coverage"] == 0.5 and m["alignment"] == 0.5
