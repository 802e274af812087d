"""Porter stemmer: published-vector goldens for the Python kernel and
cross-engine equality with the DuckDB CTE twin that the q56/q41/q42
oracles stage."""

from __future__ import annotations

import random

import duckdb
import pytest

from rc_rag_spark.functions.stemmer import (
    porter_stem,
    stem_tokens,
    stem_tokens_cte_sql,
)

# step-by-step examples from Porter (1980), "An algorithm for suffix
# stripping" — each pins one rule
VECTORS = {
    # 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    # 1b (+ cleanup)
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # 1c
    "happy": "happi", "sky": "sky",
    # 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    # 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_published_vectors():
    bad = {
        w: (porter_stem(w), want)
        for w, want in VECTORS.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_stem_tokens_guard():
    # rouge_score stems only tokens LONGER than 3 chars
    assert stem_tokens(["ties", "tie", "a", "motoring"]) == [
        "ti", "tie", "a", "motor",
    ]


def test_sql_twin_matches_python():
    """The staged-SQL stemmer must agree with the Python kernel on the
    published vectors, the fixture vocabulary, and random words."""
    rng = random.Random(11)
    vocab = list(VECTORS) + [
        "query", "table", "value", "merge", "customer", "order",
        "filter", "window", "stream", "dying", "lying", "studies",
        "studying", "cries", "cried", "crying", "flies", "a", "ab",
        "abc", "running", "runs",
    ]
    vocab += [
        "".join(
            rng.choice("abcdefghilmnoprstuyz")
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(500)
    ]
    con = duckdb.connect()
    rows = ",".join(
        f"({i}, [{', '.join(repr(w) for w in vocab[i:i + 5])}])"
        for i in range(0, len(vocab), 5)
    )
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {rows}) v(id, toks)")
    sql = (
        "WITH "
        + stem_tokens_cte_sql("t", ["id"], "toks", "st")
        + " SELECT id, toks FROM st ORDER BY id"
    )
    got = {i: list(l) for i, l in con.execute(sql).fetchall()}
    for i in range(0, len(vocab), 5):
        want = stem_tokens(vocab[i:i + 5])
        assert got[i] == want, (vocab[i:i + 5], got[i], want)


def test_rouge_uses_stemmed_tokens():
    from rc_rag_spark.functions.text import rouge_l_recall_py

    # 'motoring'/'motored' stem to 'motor': full recall despite no
    # surface overlap beyond the stem
    assert rouge_l_recall_py(["motoring cars"], "motored cars") == pytest.approx(1.0)
    # short tokens are NOT stemmed ('ran' stays 'ran')
    assert rouge_l_recall_py(["ran far"], "running far") == pytest.approx(0.5)
