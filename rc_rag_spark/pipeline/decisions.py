"""RAG risk-control decision pipeline (reference D1–D5, A1–A2, C1).

Cited parity targets (into /root/reference/):
  D1 label annotation        code/our_method.py:4-9
  D2 counterfactual decision code/our_method.py:12-30
  D3 iterative cf loop       code/run_llm_ours.py:101-139
  D4 fusion (3 strategies)   code/run_llm_ours.py:142-187
  D5 reject override         code/run_llm_ours.py:245-246,270-271
  A1 confusion fold          code/our_method.py:33-42
  A2 risk ratios             code/run_llm_ours.py:278-306
  C1 staged recompute        code/run_llm_ours.py:217-220,229-275

Spark-first shape: the reference's per-sample loop disappears — each
LLM round is ONE distributed pass over the whole DataFrame; rows that
decide 'discard' stop paying for LLM calls (their conversation column
is nulled, the batched UDF skips nulls). Stages are materialized with
localCheckpoint so an LLM stage never re-executes downstream (the
reference's save/reload flags become lineage barriers).

Input samples schema:
  id BIGINT, question STRING, reference ARRAY<STRING>,
  ctxs ARRAY<STRING>
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rc_rag_spark.functions import parsing as P
from rc_rag_spark.functions import prompts as PR
from rc_rag_spark.functions import text as T
from rc_rag_spark.pipeline.llm import llm_call
from rc_rag_spark.checkpoints import ckpt as _ckpt

def _null_s() -> Column:
    return F.lit(None).cast("string")


def _truthy(c: Column) -> Column:
    return c.isNotNull() & (c != "")


def _branch_struct(parsed: Column, metrics: Column, decision: Column) -> Column:
    return F.struct(
        parsed.getField("reject").alias("reject"),
        parsed.getField("answer").alias("answer"),
        parsed.getField("evidence").alias("evidence"),
        metrics.getField("EM").alias("EM"),
        metrics.getField("F1").alias("F1"),
        metrics.getField("RL").alias("RL"),
        metrics.getField("has_answer").alias("has_answer"),
        decision.alias("pred_decision"),
    )


def _materialize(df: DataFrame) -> DataFrame:
    """Lineage barrier after an LLM stage (C1)."""
    return df.transform(_ckpt)


# --- stage 1: rag generation + annotation (D1) ---------------------------

def rag_annotate(samples: DataFrame, backend: str = "mock",
                 num_passage: int = 3, **backend_kw) -> DataFrame:
    prompt = PR.build_prompt("rag", F.col("question"), F.col("ctxs"), num_passage)
    df = samples.withColumn("messages", PR.init_messages(prompt))
    df = df.withColumn("rag_response", llm_call("messages", backend, **backend_kw))
    df = _materialize(df)

    parsed = P.parse_prediction("rag_response")
    df = (
        df.withColumn("reference_exp", PR.expand_references("reference"))
        .withColumn("_rag_parsed", parsed)
        # ROUGE is a pandas UDF: keep it a top-level column so the
        # planner can extract it (it cannot inside CASE/struct exprs)
        .withColumn(
            "_rag_rl",
            T.rouge_l_recall("reference_exp", F.col("_rag_parsed.answer")),
        )
        # Staged (referenced twice below: rag struct + label) so the
        # EM/F1 trees exist ONCE in the plan; matched is derived from
        # the staged attribute's fields, not re-inlined — together this
        # keeps the projection inside the JVM codegen method limits.
        .withColumn(
            "_rag_metrics",
            T.match_metrics(
                "reference_exp", F.col("_rag_parsed.answer"), rl=F.col("_rag_rl")
            ),
        )
    )
    df = df.withColumn(
        "rag",
        _branch_struct(
            F.col("_rag_parsed"), F.col("_rag_metrics"), _null_s()
        ),
    ).withColumn(
        "label_decision",
        F.when(T.matched_expr(F.col("_rag_metrics")), "keep").otherwise(
            "discard"
        ),
    )
    return df.drop("_rag_parsed", "_rag_metrics", "_rag_rl")


# --- stage 2: counterfactual branch loop (D2 + D3) -----------------------

def _decide(parsed: Column, rag: Column, metrics_ans: Column,
            metrics_evi: Column) -> Column:
    """D2: answers comparable → continue/discard on answer match; else
    evidence comparable (and not a rejection) → continue/discard on
    evidence match; else discard.

    metrics_ans / metrics_evi MUST be staged attributes (see
    match_metrics) — matched_expr extracts their fields cheaply."""
    ans_cmp = _truthy(parsed.getField("answer")) & _truthy(rag.getField("answer"))
    evi_cmp = (
        ~parsed.getField("reject")
        & _truthy(parsed.getField("evidence"))
        & _truthy(rag.getField("evidence"))
    )
    return (
        F.when(
            ans_cmp,
            F.when(T.matched_expr(metrics_ans), "continue").otherwise("discard"),
        )
        .when(
            evi_cmp,
            F.when(T.matched_expr(metrics_evi), "continue").otherwise("discard"),
        )
        .otherwise("discard")
    )


def counterfactual_branch(df: DataFrame, branch: str, backend: str = "mock",
                          num_iteration: int = 1, **backend_kw) -> DataFrame:
    """One counterfactual branch (cf_use / cf_quality) as a driver loop
    of whole-DataFrame passes with a shrinking active set (D3)."""
    if num_iteration < 1:
        # with zero iterations the branch struct would stay NULL and
        # safety fusion's otherwise('keep') would bless every row
        raise ValueError("num_iteration must be >= 1")
    msgs_col = f"_{branch}_msgs"
    cf_prompt = PR.build_prompt(branch)

    # seed conversation: rag answer + branch prompt
    df = df.withColumn(
        msgs_col, PR.append_turn("messages", F.col("rag.answer"), cf_prompt)
    ).withColumn(branch, F.lit(None).cast(
        "struct<reject:boolean,answer:string,evidence:string,"
        "EM:int,F1:double,RL:double,has_answer:boolean,pred_decision:string>"
    ))

    for i in range(num_iteration):
        active = (
            F.lit(True) if i == 0
            else F.col(f"{branch}.pred_decision") == "continue"
        )
        if i > 0:
            # re-prompt with the branch's previous answer
            df = df.withColumn(
                msgs_col,
                F.when(
                    active,
                    PR.append_turn(msgs_col, F.col(f"{branch}.answer"), cf_prompt),
                ).otherwise(F.col(msgs_col)),
            )
        # NULL messages for settled rows ⇒ the batched UDF skips them.
        # Iteration 0: every row is active and the conversation is a
        # plain expression over checkpointed leaves — feed the UDF
        # directly. Later iterations gate on the branch struct (whose
        # CASE/struct rebuilds produce subexpression proxies the
        # planner cannot feed into a Python UDF) — materialize first.
        if i == 0:
            df = df.withColumn("_live_msgs", F.col(msgs_col))
        else:
            df = _materialize(
                df.withColumn("_live_msgs", F.when(active, F.col(msgs_col)))
            )
        df = _materialize(df.withColumn("_resp", llm_call("_live_msgs", backend, **backend_kw)))

        df = df.withColumn("_parsed", P.parse_prediction("_resp"))
        # pandas-UDF metrics as standalone columns (planner constraint)
        df = df.withColumn(
            "_rl_ans",
            T.rouge_l_recall(
                F.array(F.col("rag.answer")), F.col("_parsed.answer")
            ),
        ).withColumn(
            "_rl_evi",
            T.rouge_l_recall(
                F.array(F.col("rag.evidence")), F.col("_parsed.evidence")
            ),
        )
        parsed = F.col("_parsed")
        # Stage both metric structs: each is consumed twice (the
        # metrics CASE and the decision), and matched_expr reads the
        # staged fields — without this the EM/F1 trees appeared 4× in
        # one projection and blew the JVM codegen method limit.
        df = df.withColumn(
            "_m_ans",
            T.match_metrics(
                F.array(F.col("rag.answer")), parsed.getField("answer"),
                rl=F.col("_rl_ans"),
            ),
        ).withColumn(
            "_m_evi",
            T.match_metrics(
                F.array(F.col("rag.evidence")), parsed.getField("evidence"),
                rl=F.col("_rl_evi"),
            ),
        )
        m_ans, m_evi = F.col("_m_ans"), F.col("_m_evi")
        ans_cmp = _truthy(parsed.getField("answer")) & _truthy(F.col("rag.answer"))
        evi_cmp = (
            ~parsed.getField("reject")
            & _truthy(parsed.getField("evidence"))
            & _truthy(F.col("rag.evidence"))
        )
        # neither comparable ⇒ the reference never calls match() and the
        # branch metrics stay unset — NULL struct here (no otherwise)
        metrics = F.when(ans_cmp, m_ans).when(evi_cmp, m_evi)
        decision = _decide(parsed, F.col("rag"), m_ans, m_evi)
        df = df.withColumn(
            branch,
            F.when(active, _branch_struct(parsed, metrics, decision)).otherwise(
                F.col(branch)
            ),
        ).drop(
            "_resp", "_live_msgs", "_parsed", "_rl_ans", "_rl_evi",
            "_m_ans", "_m_evi",
        )

    # terminal 'continue' ⇒ 'keep' (run_llm_ours.py:118-119,136-137).
    # Full struct rebuild, not withField: withField emits common-
    # subexpression proxies that break downstream Python-UDF planning.
    b = F.col(branch)
    return df.withColumn(
        branch,
        F.struct(
            b.getField("reject").alias("reject"),
            b.getField("answer").alias("answer"),
            b.getField("evidence").alias("evidence"),
            b.getField("EM").alias("EM"),
            b.getField("F1").alias("F1"),
            b.getField("RL").alias("RL"),
            b.getField("has_answer").alias("has_answer"),
            F.when(b.getField("pred_decision") == "continue", "keep")
            .otherwise(b.getField("pred_decision"))
            .alias("pred_decision"),
        ),
    )


# --- stage 3: fusion (D4) + reject override (D5) -------------------------

def fuse(df: DataFrame, strategy: str = "probability", backend: str = "mock",
         **backend_kw) -> DataFrame:
    use_dec = F.col("cf_use.pred_decision")
    q_dec = F.col("cf_quality.pred_decision")
    agree = use_dec == q_dec

    if strategy == "safety":
        fused = F.when(agree, use_dec).when(
            (use_dec == "discard") | (q_dec == "discard"), F.lit("discard")
        ).otherwise(F.lit("keep"))
        df = df.withColumn("pred_decision", fused)

    elif strategy == "prompt":
        # ask the discarding branch to keep/discard (one LLM call)
        use_discard = use_dec == "discard"
        fusion_prompt = F.when(
            use_discard, PR.build_prompt("fusion_use")
        ).otherwise(PR.build_prompt("fusion_quality"))
        msgs = F.when(
            use_discard,
            PR.append_turn("_cf_use_msgs", F.col("cf_use.answer"), fusion_prompt),
        ).otherwise(
            PR.append_turn("_cf_quality_msgs", F.col("cf_quality.answer"), fusion_prompt)
        )
        df = _materialize(df.withColumn("_flive", F.when(~agree, msgs)))
        df = _materialize(
            df.withColumn("_fresp", llm_call("_flive", backend, **backend_kw))
        )
        df = df.withColumn(
            "pred_decision",
            F.when(agree, use_dec).otherwise(
                P.parse_fusion_decision(F.col("_fresp"))
            ),
        ).drop("_fresp", "_flive")

    elif strategy == "probability":
        fp = PR.build_prompt("fusion_probability")
        m_use = PR.append_turn("_cf_use_msgs", F.col("cf_use.answer"), fp)
        m_q = PR.append_turn("_cf_quality_msgs", F.col("cf_quality.answer"), fp)
        df = _materialize(
            df.withColumn("_pm_use", F.when(~agree, m_use)).withColumn(
                "_pm_q", F.when(~agree, m_q)
            )
        )
        df = _materialize(
            df.withColumn("_p_use_resp", llm_call("_pm_use", backend, **backend_kw))
            .withColumn("_p_q_resp", llm_call("_pm_q", backend, **backend_kw))
        )
        # Stage each probability: the parse tree behind it is ~10³
        # nodes and the when-chain reads each value twice — staged
        # attributes keep both trees single-instanced in the plan.
        df = df.withColumn(
            "_p_use",
            P.parse_fusion_probability(
                P.parse_prediction("_p_use_resp").getField("answer")
            ),
        ).withColumn(
            "_p_q",
            P.parse_fusion_probability(
                P.parse_prediction("_p_q_resp").getField("answer")
            ),
        )
        p_use, p_q = F.col("_p_use"), F.col("_p_q")
        df = df.withColumn(
            "pred_decision",
            F.when(agree, use_dec)
            .when(p_use > p_q, use_dec)
            .when(p_use < p_q, q_dec)
            .otherwise(F.lit("discard")),
        ).drop("_p_use_resp", "_p_q_resp", "_pm_use", "_pm_q", "_p_use", "_p_q")
    else:
        raise ValueError(f"unknown fusion strategy: {strategy}")

    # D5: a refused rag response can never be kept
    return df.withColumn(
        "pred_decision",
        F.when(
            (F.col("pred_decision") == "keep") & F.col("rag.reject"), "discard"
        ).otherwise(F.col("pred_decision")),
    )


# --- full pipeline -------------------------------------------------------

def run_pipeline(samples: DataFrame, backend: str = "mock",
                 num_iteration: int = 1, num_passage: int = 3,
                 fusion_strategy: str = "probability", **backend_kw) -> DataFrame:
    df = rag_annotate(samples, backend, num_passage, **backend_kw)
    df = counterfactual_branch(df, "cf_use", backend, num_iteration, **backend_kw)
    df = counterfactual_branch(df, "cf_quality", backend, num_iteration, **backend_kw)
    df = fuse(df, fusion_strategy, backend, **backend_kw)
    return df.select(
        "id", "rag", "cf_use", "cf_quality", "label_decision",
        "pred_decision", F.col("reference_exp").alias("answer"),
    )


# --- A1/A2: eval ---------------------------------------------------------

def confusion_cells(decisions: DataFrame) -> DataFrame:
    ld, pd_ = F.col("label_decision"), F.col("pred_decision")

    def cell(lv, pv, alias):
        return (
            F.sum(F.when((ld == lv) & (pd_ == pv), 1).otherwise(0))
            .cast("bigint")
            .alias(alias)
        )

    return decisions.agg(
        cell("keep", "keep", "AK"),
        cell("keep", "discard", "AD"),
        cell("discard", "keep", "UK"),
        cell("discard", "discard", "UD"),
    )


def risk_metrics(cells: DataFrame) -> DataFrame:
    """A2 ratios (NULL where the reference would divide by zero)."""
    ak, ad, uk, ud = (F.col(c).cast("double") for c in ("AK", "AD", "UK", "UD"))
    n = ak + ad + uk + ud

    def ratio(num, den, alias):
        return F.when(den != 0, num / den).alias(alias)

    return cells.select(
        "AK", "AD", "UK", "UD",
        ratio(uk, ak + uk, "risk"),
        ratio(ad, ud + ad, "overcaution"),
        ratio(ak, ak + ad, "recall"),
        ratio(ud, uk + ud, "carefulness"),
        ratio(ak + ud, n, "alignment"),
        ratio(ak + uk, n, "coverage"),
    )
