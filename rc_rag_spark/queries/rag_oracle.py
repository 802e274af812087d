"""DuckDB oracle for the FULL mock-LLM decision pipeline (q41/q42).

The pipeline (pipeline/decisions.py) is driver-orchestrated and calls
the LLM operator through a pandas UDF — but with the deterministic
mock backend every response is a pure function of the conversation,
and the conversation is a pure function of the fixture row. This
module spells that whole composition as one DuckDB query:

  samples        <- queries/rag.py samples_from_documents
  rag prompt     <- functions/prompts.py build_prompt (P1/P2)
  mock responses <- pipeline/llm.py mock_chat: sha256-bucket canned
                    forms. The counterfactual and fusion prompts are
                    STATIC strings, so their buckets (and hence which
                    canned path each branch takes, and the fusion
                    probabilities) are compile-time constants —
                    computed here AT SQL-BUILD TIME from the same
                    template/form constants the engine uses, while
                    the per-row rag bucket is computed in SQL from
                    sha256(prompt) exactly as the backend does.
  parse (X2-X5)  <- same CTE logic the q34 oracle uses
  metrics        <- EM / raw-substring / token-F1 / ROUGE-L-recall
                    (recursive-CTE LCS, q56's formulation)
  decisions      <- D1/D2 (+ terminal continue->keep), D4 probability
                    fusion, D5 reject override
  eval           <- A1 confusion fold + A2 ratios (q40's formulation)

Like every generator in queries/text.py, template/phrase constants are
shared with the engine so the two sides cannot drift by transcription,
but the LOGIC is spelled independently (RE2 + list lambdas + recursive
SQL vs Catalyst expressions + pandas UDFs).
"""

from __future__ import annotations

from rc_rag_spark.functions import parsing as P
from rc_rag_spark.functions.prompts import TEMPLATES
from rc_rag_spark.functions.stemmer import stem_tokens_cte_sql as _stem_cte
from rc_rag_spark.pipeline.llm import (
    _MOCK_ANSWER_FORMS,
    _first_passage_words,
    _stable_bucket,
)

# ---- compile-time mock constants (see module docstring) -----------------

_RAG_TMPL = TEMPLATES["rag"] + "\nAnswer: "
# The template's own example text contains 'Passage-0' before the real
# passages section, so the backend's "first passage words" are a
# template constant, identical for every row.
_W = _first_passage_words(_RAG_TMPL)
_RAG_FORMS = [f(_W) for f in _MOCK_ANSWER_FORMS]

# Counterfactual branches: last_user is the static branch template
# (+ '\nAnswer: ' tail), messages length is 3 -> both bucket draws are
# constants. b == 0 means "echo the previous assistant turn (the rag
# answer) when truthy, else emit the canned form with 'different
# thing'"; b == 1 would emit form(W); b == 2 form('different thing').
def _cf_consts(branch: str) -> tuple[int, str, str]:
    last = TEMPLATES[branch] + "\nAnswer: "
    b = _stable_bucket(last + "3", 3)
    form = _MOCK_ANSWER_FORMS[_stable_bucket(last + "cf", 6)]
    return b, form(_W), form("different thing")


# Probability-fusion turn: static prompt, messages length 5 -> one
# constant canned response, shared by both branches.
_PROB_RESP = [
    "Probability: 0.85", "Probability: 0.4", "Probability: 3.", "no idea"
][_stable_bucket(TEMPLATES["fusion_probability"] + "5", 4)]


# ---- SQL fragment helpers ----------------------------------------------

def _lit(s: str) -> str:
    """SQL string literal; newlines via chr(10) so the statement stays
    single-line-safe."""
    return "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"


def _norm(e: str) -> str:
    """Mirror of functions.text.normalize_answer (see queries/text.py
    _sql_norm for the RE2-\\b ASCII caveat)."""
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        f"lower({e}), '[[:punct:]]', '', 'g'),"
        " '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g'))"
    )


def _ntoks(e: str) -> str:
    return (
        f"(CASE WHEN {_norm(e)} = '' THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split({_norm(e)}, ' ') END)"
    )


def _pair_f1(g: str, p: str) -> str:
    num_same = (
        f"list_sum(list_transform(list_distinct({g}), t -> "
        f"least(len(list_filter({g}, x -> x = t)), "
        f"len(list_filter({p}, x -> x = t)))))"
    )
    return f"""(
      CASE
        WHEN len({g}) = 0 OR len({p}) = 0 THEN CAST({g} = {p} AS DOUBLE)
        WHEN coalesce({num_same}, 0) = 0 THEN 0.0
        ELSE 2.0 * ({num_same} / len({p})) * ({num_same} / len({g}))
             / (({num_same} / len({p})) + ({num_same} / len({g})))
      END)"""


def _rtoks(e: str) -> str:
    """ROUGE tokenization ([a-z0-9]+ of lower; None -> [])."""
    return f"regexp_extract_all(lower(coalesce({e}, '')), '[a-z0-9]+')"


def _truthy(e: str) -> str:
    return f"({e} IS NOT NULL AND {e} <> '')"


def _refusal(e: str) -> str:
    """OR over the refusal phrases, token-sequence containment (same
    tokpad trick as queries/text.py _sql_refusal)."""
    from rc_rag_spark.functions.text import py_tokenize

    pad = (
        f"(' ' || array_to_string(regexp_extract_all(lower({e}),"
        " '[\\pL\\pN\\pM]+|[^\\pZ\\pC]'), ' ') || ' ')"
    )
    checks = [
        f"contains({pad}, ' {' '.join(py_tokenize(p))} ')"
        for p in P.REFUSAL_PHRASES
    ]
    return "(" + " OR ".join(checks) + ")"


def _parse_ctes(pfx: str, src: str, col: str) -> str:
    """X2/X3/X4/X5 parse chain (same logic as the q34 oracle),
    prefixed CTE names; output CTE `{pfx}o` has (id, reject, answer,
    evidence)."""
    return f"""
    {pfx}st AS (
        SELECT id,
               CASE WHEN lower({col}) LIKE 'answer:%'
                    THEN substr({col}, 8) ELSE {col} END AS stripped
        FROM {src}),
    {pfx}fl AS (
        SELECT id, stripped,
               regexp_replace(regexp_replace(stripped, '\\n', ' ', 'g'),
                              'Answer: ', '', 'g') AS s2
        FROM {pfx}st),
    {pfx}sp AS (
        SELECT id, stripped,
               CASE WHEN contains(s2, 'Evidence: ')
                    THEN regexp_replace(s2, 'Evidence: (.*)', '')
                    ELSE s2 END AS ans_raw,
               CASE WHEN contains(s2, 'Evidence: ')
                    THEN regexp_replace(s2, '(.*)Evidence: ', '')
                    ELSE s2 END AS evi_raw
        FROM {pfx}fl),
    {pfx}ex AS (
        SELECT id, stripped,
               trim(regexp_replace(ans_raw, '##([\\s\\S]*?)##', '', 'g'))
                   AS answer,
               regexp_extract_all(evi_raw, '##([\\s\\S]*?)##', 1) AS marks,
               -- engine mention regex is 'Passage-.(?=.)' (a char must
               -- FOLLOW, the reference's 9-char-window rule); RE2 has
               -- no lookahead, so capture-and-consume — equivalent
               -- unless two mentions are adjacent within 10 chars,
               -- which the comma-joined forms never produce
               list_sort(list_distinct(
                   regexp_extract_all(evi_raw,
                                      '(Passage-[\\s\\S])[\\s\\S]', 1)))
                   AS mentions,
               evi_raw
        FROM {pfx}sp),
    {pfx}o AS (
        SELECT id, {_refusal("stripped")} AS reject, answer,
               trim(CASE WHEN len(marks) > 0 THEN trim(marks[-1])
                         WHEN len(mentions) > 0
                             THEN array_to_string(mentions, ', ')
                         ELSE evi_raw END) AS evidence
        FROM {pfx}ex)"""


_BUCKET6 = (
    "(list_sum(list_transform(range(1,9), i -> "
    "CAST(strpos('0123456789abcdef',"
    " substr(sha256(prompt), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)"
    " * (CAST(1 AS BIGINT) << CAST(4*(8-i) AS INTEGER)))) % 6)"
)

# X7 over the (static) fusion response: parse_prediction(resp).answer
# then parse_fusion_probability. The response has no 'Answer:'/
# 'Evidence:'/'##' content, so the X2 pass is the identity on it and
# the X7 chain below is the full composition.
def _prob_sql(resp_lit: str) -> str:
    strip = (
        f"(CASE WHEN {resp_lit} LIKE 'Probability: %'"
        f" THEN substr({resp_lit}, 14) ELSE {resp_lit} END)"
    )
    return (
        "CAST(coalesce("
        f"nullif(regexp_extract({strip}, '(\\d+\\.\\d+)', 1), ''), "
        f"nullif(regexp_extract({strip}, '(\\d+\\.)', 1), ''), "
        "'0.0') AS DOUBLE)"
    )


def _matched(em: str, ha: str, f1: str, rl: str) -> str:
    """T7 threshold predicate (utils.py:409-411 semantics)."""
    return f"({em} OR {ha} OR {f1} > 0.7 OR {rl} > 0.7)"


def sql_pipeline_output() -> str:
    """Oracle SQL producing q41_rag_pipeline_mock's exact output."""
    b_cu, cu_w, cu_diff = _cf_consts("cf_use")
    b_cq, cq_w, cq_diff = _cf_consts("cf_quality")

    def cf_resp(b: int, w_form: str, diff_form: str) -> str:
        # mock_chat counterfactual turn with build-time-constant b:
        # b==0 -> previous assistant turn (the rag answer) when truthy;
        # fall through to the canned form otherwise.
        if b == 0:
            return (
                f"CASE WHEN {_truthy('rag_answer')} THEN rag_answer "
                f"ELSE {_lit(diff_form)} END"
            )
        return _lit(w_form if b == 1 else diff_form)

    q_sql = "('What is mentioned in document ' || CAST(id AS VARCHAR) || '?')"
    seg = "coalesce(array_to_string(words[{a}:{b}], ' '), '')"
    p_sql = (
        "('Passage-0' || " + seg.format(a=1, b=8)
        + " || chr(10) || 'Passage-1' || " + seg.format(a=9, b=16)
        + " || chr(10) || 'Passage-2' || " + seg.format(a=17, b=24) + ")"
    )
    prompt_expr = (
        _lit(_RAG_TMPL)
        .replace("{question}", "' || " + q_sql + " || '")
        .replace("{passage}", "' || " + p_sql + " || '")
    )
    resp_case = "CASE " + _BUCKET6 + " " + " ".join(
        f"WHEN {i} THEN {_lit(f)}" for i, f in enumerate(_RAG_FORMS)
    ) + " END"

    pu, pq = _prob_sql(_lit(_PROB_RESP)), _prob_sql(_lit(_PROB_RESP))

    # per-branch D2 decision from the wide metrics row
    def branch_dec(x: str) -> str:
        ans_cmp = f"({_truthy(f'{x}_answer')} AND {_truthy('rag_answer')})"
        evi_cmp = (
            f"(NOT {x}_reject AND {_truthy(f'{x}_evidence')}"
            f" AND {_truthy('rag_evidence')})"
        )
        m_ans = _matched(
            f"({_norm(f'{x}_answer')} = {_norm('rag_answer')})",
            f"contains({x}_answer, rag_answer)",
            _pair_f1(_ntoks("rag_answer"), _ntoks(f"{x}_answer")),
            f"{x}_ans_rl",
        )
        m_evi = _matched(
            f"({_norm(f'{x}_evidence')} = {_norm('rag_evidence')})",
            f"contains({x}_evidence, rag_evidence)",
            _pair_f1(_ntoks("rag_evidence"), _ntoks(f"{x}_evidence")),
            f"{x}_evi_rl",
        )
        d0 = f"""CASE WHEN {ans_cmp}
                   THEN CASE WHEN {m_ans} THEN 'continue' ELSE 'discard' END
                 WHEN {evi_cmp}
                   THEN CASE WHEN {m_evi} THEN 'continue' ELSE 'discard' END
                 ELSE 'discard' END"""
        return f"CASE WHEN ({d0}) = 'continue' THEN 'keep' ELSE ({d0}) END"

    label_em = (
        f"(len(list_filter(refs_exp, r -> {_norm('r')}"
        f" = {_norm('rag_answer')})) > 0)"
    )
    label_ha = (
        "(CASE WHEN rag_answer IS NULL THEN FALSE ELSE"
        " len(list_filter(refs_exp, r -> contains(rag_answer, r))) > 0 END)"
    )
    label_f1 = (
        "coalesce(list_aggregate(list_transform(refs_exp, r -> "
        + _pair_f1(_ntoks("r"), "rag_ntoks")
        + "), 'max'), 0.0)"
    )

    return f"""
    WITH RECURSIVE
    docs AS (
        SELECT doc_id AS id, string_split(text, ' ') AS words
        FROM documents WHERE text IS NOT NULL),
    smp AS (
        SELECT id,
               [concat_ws(' ', words[1], words[2]),
                words[5] || ' or ' || words[6]] AS refs,
               {prompt_expr} AS prompt
        FROM docs),
    resp AS (SELECT id, refs, {resp_case} AS s FROM smp),
    {_parse_ctes("rg", "resp", "s")},
    refsx AS (
        SELECT r.id,
               list_distinct(r.refs || flatten(list_transform(
                   list_filter(r.refs, x -> contains(x, ' or ')),
                   x -> string_split(x, ' or ')))) AS refs_exp,
               g.reject AS rag_reject, g.answer AS rag_answer,
               g.evidence AS rag_evidence
        FROM resp r JOIN rgo g USING (id)),
    cfr AS (
        SELECT *,
               {cf_resp(b_cu, cu_w, cu_diff)} AS cu_s,
               {cf_resp(b_cq, cq_w, cq_diff)} AS cq_s
        FROM refsx),
    {_parse_ctes("cu", "cfr", "cu_s")},
    {_parse_ctes("cq", "cfr", "cq_s")},
    wide AS (
        SELECT f.id, f.refs_exp, f.rag_reject, f.rag_answer,
               f.rag_evidence,
               u.reject AS cu_reject, u.answer AS cu_answer,
               u.evidence AS cu_evidence,
               q.reject AS cq_reject, q.answer AS cq_answer,
               q.evidence AS cq_evidence
        FROM cfr f JOIN cuo u USING (id) JOIN cqo q USING (id)),
    pairs AS (
        SELECT id, 'label' AS grp,
               unnest(generate_series(1, len(refs_exp))) AS ref_no,
               refs_exp, rag_answer AS p_ref, NULL AS g_ref
        FROM wide
        UNION ALL
        SELECT id, 'cu_ans', 1, NULL, cu_answer, rag_answer FROM wide
        UNION ALL
        SELECT id, 'cu_evi', 1, NULL, cu_evidence, rag_evidence FROM wide
        UNION ALL
        SELECT id, 'cq_ans', 1, NULL, cq_answer, rag_answer FROM wide
        UNION ALL
        SELECT id, 'cq_evi', 1, NULL, cq_evidence, rag_evidence FROM wide),
    ptoks0 AS (
        SELECT id, grp, CAST(ref_no AS INTEGER) AS ref_no,
               CASE WHEN grp = 'label'
                    THEN {_rtoks("refs_exp[ref_no]")}
                    ELSE {_rtoks("g_ref")} END AS rt,
               {_rtoks("p_ref")} AS pt
        FROM pairs),
    -- Porter-stem ref and pred tokens (rouge_score use_stemmer
    -- semantics, same staged chain q56's oracle uses; generated by
    -- functions/stemmer.py)
    {_stem_cte("ptoks0", ["id", "grp", "ref_no"], "rt", "ptoks1")},
    {_stem_cte("ptoks1", ["id", "grp", "ref_no"], "pt", "ptoks")},
    m AS (
        SELECT id, grp, ref_no, ij[1] AS i, ij[2] AS j
        FROM (
            SELECT id, grp, ref_no,
                   unnest(flatten([[[i, j]
                                    for j in generate_series(1, len(pt))
                                    if rt[i] = pt[j]]
                                   for i in generate_series(1, len(rt))]))
                       AS ij
            FROM ptoks)),
    -- recursive UNION (not UNION ALL): states dedup to (i, j, len)
    -- triples, so repeated tokens (amplified by stemming) cost
    -- O(n·m·len) states instead of enumerating every distinct chain
    chain AS (
        SELECT id, grp, ref_no, i, j, 1 AS len FROM m
        UNION
        SELECT mm.id, mm.grp, mm.ref_no, mm.i, mm.j, c.len + 1
        FROM chain c JOIN m mm
          ON mm.id = c.id AND mm.grp = c.grp AND mm.ref_no = c.ref_no
         AND mm.i > c.i AND mm.j > c.j),
    lcs AS (
        SELECT id, grp, ref_no, max(len) AS l FROM chain
        GROUP BY id, grp, ref_no),
    rl AS (
        SELECT p.id, p.grp,
               max(CASE WHEN len(p.rt) = 0 THEN 0.0
                        ELSE CAST(coalesce(l.l, 0) AS DOUBLE) / len(p.rt)
                   END) AS v
        FROM ptoks p LEFT JOIN lcs l USING (id, grp, ref_no)
        GROUP BY p.id, p.grp),
    met AS (
        SELECT w.*,
               coalesce(rlab.v, 0.0) AS label_rl,
               coalesce(rcua.v, 0.0) AS cu_ans_rl,
               coalesce(rcue.v, 0.0) AS cu_evi_rl,
               coalesce(rcqa.v, 0.0) AS cq_ans_rl,
               coalesce(rcqe.v, 0.0) AS cq_evi_rl,
               {_ntoks("rag_answer")} AS rag_ntoks
        FROM wide w
        LEFT JOIN rl rlab ON rlab.id = w.id AND rlab.grp = 'label'
        LEFT JOIN rl rcua ON rcua.id = w.id AND rcua.grp = 'cu_ans'
        LEFT JOIN rl rcue ON rcue.id = w.id AND rcue.grp = 'cu_evi'
        LEFT JOIN rl rcqa ON rcqa.id = w.id AND rcqa.grp = 'cq_ans'
        LEFT JOIN rl rcqe ON rcqe.id = w.id AND rcqe.grp = 'cq_evi'),
    dec AS (
        SELECT id, rag_reject, rag_answer, rag_evidence,
               CASE WHEN {_matched(label_em, label_ha, label_f1, "label_rl")}
                    THEN 'keep' ELSE 'discard' END AS label_decision,
               ({branch_dec("cu")}) AS cf_use_decision,
               ({branch_dec("cq")}) AS cf_quality_decision
        FROM met),
    fused AS (
        SELECT *,
               CASE WHEN cf_use_decision = cf_quality_decision
                        THEN cf_use_decision
                    WHEN {pu} > {pq} THEN cf_use_decision
                    WHEN {pu} < {pq} THEN cf_quality_decision
                    ELSE 'discard' END AS pred0
        FROM dec)
    SELECT id, rag_reject, rag_answer, rag_evidence,
           cf_use_decision, cf_quality_decision, label_decision,
           CASE WHEN pred0 = 'keep' AND rag_reject THEN 'discard'
                ELSE pred0 END AS pred_decision
    FROM fused
    """


def sql_pipeline_eval() -> str:
    """Oracle SQL for q42_pipeline_eval: A1 fold + A2 ratios over the
    pipeline output (NULL where the reference divides by zero)."""
    return f"""
    WITH pipe AS ({sql_pipeline_output()}),
    c AS (
        SELECT
          CAST(SUM(CASE WHEN label_decision='keep' AND pred_decision='keep'
                   THEN 1 ELSE 0 END) AS BIGINT) AS AK,
          CAST(SUM(CASE WHEN label_decision='keep' AND pred_decision='discard'
                   THEN 1 ELSE 0 END) AS BIGINT) AS AD,
          CAST(SUM(CASE WHEN label_decision='discard' AND pred_decision='keep'
                   THEN 1 ELSE 0 END) AS BIGINT) AS UK,
          CAST(SUM(CASE WHEN label_decision='discard'
                        AND pred_decision='discard'
                   THEN 1 ELSE 0 END) AS BIGINT) AS UD
        FROM pipe)
    SELECT AK, AD, UK, UD,
           CASE WHEN AK + UK != 0 THEN CAST(UK AS DOUBLE) / (AK + UK) END
               AS risk,
           CASE WHEN UD + AD != 0 THEN CAST(AD AS DOUBLE) / (UD + AD) END
               AS overcaution,
           CASE WHEN AK + AD != 0 THEN CAST(AK AS DOUBLE) / (AK + AD) END
               AS recall,
           CASE WHEN UK + UD != 0 THEN CAST(UD AS DOUBLE) / (UK + UD) END
               AS carefulness,
           CASE WHEN AK + AD + UK + UD != 0
                THEN CAST(AK + UD AS DOUBLE) / (AK + AD + UK + UD) END
               AS alignment,
           CASE WHEN AK + AD + UK + UD != 0
                THEN CAST(AK + UK AS DOUBLE) / (AK + AD + UK + UD) END
               AS coverage
    FROM c
    """
