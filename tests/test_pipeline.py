"""End-to-end decision-pipeline tests: the Spark pipeline (mock LLM)
must reproduce a pure-Python simulation of the reference control flow
row-for-row, and satisfy the A1/A2 invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rc_rag_spark.functions import prompts as PR
from rc_rag_spark.functions.text import rouge_l_recall_py
from rc_rag_spark.pipeline import decisions as D
from rc_rag_spark.pipeline.llm import mock_chat
from rc_rag_spark.queries.rag import samples_from_documents
from tests import golden_ref as G

N_DOCS = 60


# --- pure-Python mirror of the reference pipeline ------------------------

def render(ptype, question=None, passages=None):
    t = PR.TEMPLATES[ptype]
    tail = "" if "fusion" in ptype else "\nAnswer: "
    if "{question}" in t:
        t = t.replace("{question}", question)
    if "{passage}" in t:
        t = t.replace(
            "{passage}",
            "\n".join(f"Passage-{i}{p}" for i, p in enumerate(passages[:3])),
        )
    return t + tail


def matched(pred, refs):
    if pred is None:
        return False, (0, 0.0, 0.0, False)
    em = G.em(refs, pred)
    f1 = G.f1(refs, pred)
    rl = rouge_l_recall_py(refs, pred)
    ha = any(pred.find(r) > -1 for r in refs)
    return (em == 1 or ha or f1 > 0.7 or rl > 0.7), (em, f1, rl, ha)


def golden_pipeline(sample, num_iteration=1):
    q, refs, ctxs = sample["question"], list(sample["reference"]), sample["ctxs"]
    messages = [{"role": "user", "content": render("rag", q, ctxs)}]
    rag_resp = mock_chat(messages)
    rag_reject, rag_ans, rag_evi = G.parse_prediction(rag_resp)
    refs = G.expand_refs(refs)
    label = "keep" if matched(rag_ans, refs)[0] else "discard"

    def branch(ptype, msgs):
        dec, ans, evi, reject = None, None, None, None
        for i in range(num_iteration):
            prev = rag_ans if i == 0 else ans
            msgs = msgs + [
                {"role": "assistant", "content": prev},
                {"role": "user", "content": render(ptype)},
            ]
            resp = mock_chat(msgs)
            reject, ans, evi = G.parse_prediction(resp)
            if ans and rag_ans:
                dec = "continue" if matched(ans, [rag_ans])[0] else "discard"
            elif not reject and evi and rag_evi:
                dec = "continue" if matched(evi, [rag_evi])[0] else "discard"
            else:
                dec = "discard"
            if dec == "discard":
                break
        if dec == "continue":
            dec = "keep"
        return dec, ans, msgs

    use_dec, use_ans, use_msgs = branch("cf_use", list(messages))
    q_dec, q_ans, q_msgs = branch("cf_quality", list(messages))

    if use_dec == q_dec:
        pred = use_dec
    else:
        fp = render("fusion_probability")
        m1 = use_msgs + [
            {"role": "assistant", "content": use_ans},
            {"role": "user", "content": fp},
        ]
        _, a1, _ = G.parse_prediction(mock_chat(m1))
        p1 = G.fusion_probability(a1)
        m2 = q_msgs + [
            {"role": "assistant", "content": q_ans},
            {"role": "user", "content": fp},
        ]
        _, a2, _ = G.parse_prediction(mock_chat(m2))
        p2 = G.fusion_probability(a2)
        pred = use_dec if p1 > p2 else q_dec if p1 < p2 else "discard"

    if pred == "keep" and rag_reject:
        pred = "discard"
    return {
        "rag_reject": rag_reject,
        "rag_answer": rag_ans,
        "rag_evidence": rag_evi,
        "cf_use_decision": use_dec,
        "cf_quality_decision": q_dec,
        "label_decision": label,
        "pred_decision": pred,
    }


@pytest.fixture(scope="module")
def spark_rows(spark, sf_dir):
    samples = samples_from_documents(spark, sf_dir, limit=N_DOCS)
    out = D.run_pipeline(samples, backend="mock", num_iteration=1,
                         fusion_strategy="probability")
    rows = {r["id"]: r.asDict(recursive=True) for r in out.collect()}
    sample_rows = {r["id"]: r.asDict() for r in samples.collect()}
    return rows, sample_rows


def test_pipeline_matches_golden_simulation(spark_rows):
    rows, samples = spark_rows
    assert len(rows) == N_DOCS
    for sid, sample in samples.items():
        want = golden_pipeline(sample)
        got = rows[sid]
        assert got["rag"]["reject"] == want["rag_reject"], sid
        assert got["rag"]["answer"] == want["rag_answer"], sid
        assert got["rag"]["evidence"] == want["rag_evidence"], sid
        assert got["cf_use"]["pred_decision"] == want["cf_use_decision"], sid
        assert got["cf_quality"]["pred_decision"] == want["cf_quality_decision"], sid
        assert got["label_decision"] == want["label_decision"], sid
        assert got["pred_decision"] == want["pred_decision"], sid


def test_pipeline_decision_distribution(spark_rows):
    rows, _ = spark_rows
    labels = {(r["label_decision"], r["pred_decision"]) for r in rows.values()}
    assert len(labels) >= 2, f"degenerate decision distribution: {labels}"


def test_confusion_cells_sum_to_n(spark, sf_dir):
    samples = samples_from_documents(spark, sf_dir, limit=N_DOCS)
    out = D.run_pipeline(samples, backend="mock")
    cells = D.confusion_cells(out).collect()[0]
    assert cells["AK"] + cells["AD"] + cells["UK"] + cells["UD"] == N_DOCS
    metrics = D.risk_metrics(D.confusion_cells(out)).collect()[0]
    for m in ("alignment", "coverage"):
        assert 0.0 <= metrics[m] <= 1.0


def test_safety_and_prompt_fusion_run(spark, sf_dir):
    samples = samples_from_documents(spark, sf_dir, limit=20)
    for strategy in ("safety", "prompt"):
        out = D.run_pipeline(samples, backend="mock", fusion_strategy=strategy)
        vals = {r["pred_decision"] for r in out.select("pred_decision").collect()}
        assert vals <= {"keep", "discard"}, (strategy, vals)


def test_pipeline_two_iterations_matches_golden(spark, sf_dir):
    """D3 loop with num_iteration=2: early-exit rows keep their frozen
    branch state; continuing rows re-prompt."""
    samples = samples_from_documents(spark, sf_dir, limit=30)
    out = D.run_pipeline(samples, backend="mock", num_iteration=2,
                         fusion_strategy="probability")
    rows = {r["id"]: r.asDict(recursive=True) for r in out.collect()}
    srows = {r["id"]: r.asDict() for r in samples.collect()}
    for sid, sample in srows.items():
        want = golden_pipeline(sample, num_iteration=2)
        got = rows[sid]
        assert got["cf_use"]["pred_decision"] == want["cf_use_decision"], sid
        assert got["cf_quality"]["pred_decision"] == want["cf_quality_decision"], sid
        assert got["pred_decision"] == want["pred_decision"], sid
