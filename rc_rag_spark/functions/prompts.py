"""Prompt templating + conversation-state constructors (reference
P1–P3).

Cited parity targets (into /root/reference/):
  P1 prompt templates + passage enumeration  code/prompt.py:1-48
  P2 message-array constructors              code/llm_ours.py:24-35
  P3 reference-answer expansion              code/run_llm_ours.py:90-94

Conversation state is ARRAY<STRUCT<role,content>>; forking a
conversation is just deriving a second column — immutable, no deep
copies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Templates from code/prompt.py:3-27 ({question}/{passage} slots).
TEMPLATES: dict[str, str] = {
    "rag": (
        "Answer the following question based on the given passages with "
        "one or few words. Provide your evidence between two ## symbols "
        "at the end of your response, either the passage id or your "
        "internal knowledge. For example, provide \"Answer: apple.\n"
        "Evidence: ## Passage-0, Passage-1 ##.\" if you are referring to "
        "Passage-0 and Passage-1 to obtain the answer \"apple\". If "
        "there is no information in the passages, explain the answer by "
        "yourself.\nQuestion: {question}\nPassages: {passage}"
    ),
    "cf_use": (
        "Assume that your answer is wrong due to your improper use of "
        "the retrieved passages. Please read the given passages "
        "carefully to regenerate the answer with one or few words."
    ),
    "cf_quality": (
        "Assume that your answer is wrong because the quality of your "
        "referred passages is poor. Please re-select the passages, to "
        "regenerate the answer with one or few words and your referred "
        "passage id as evidence."
    ),
    "fusion_use": (
        "Your answer is likely to be wrong because of the improper use "
        "of retrieval passages, please choose to keep or discard this "
        "output. Generate $$ keep $$ if you choose to keep this answer, "
        "otherwise, generate $$ discard $$."
    ),
    "fusion_quality": (
        "Your answer is likely to be wrong because of the poor quality "
        "of retrieval passages, please choose to keep or discard this "
        "output. Generate $$ keep $$ if you choose to keep this answer, "
        "otherwise, generate $$ discard $$."
    ),
    "fusion_probability": (
        "Provide the probability that your regenerated answer is "
        "correct. Give ONLY the probability, no other words or "
        "explanation.\n\nFor example:\n\nProbability: <the probability "
        "between 0.0 and 1.0 that your specific answer is correct, "
        "without any extra commentary whatsoever; just the "
        "probability!>\n"
    ),
}

MESSAGE_SCHEMA = "array<struct<role:string,content:string>>"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def enumerate_passages(ctxs: str | Column, num_passage: int) -> Column:
    """First-k passages as 'Passage-<i><text>', newline-joined
    (code/prompt.py:36-39)."""
    sliced = F.slice(_c(ctxs), 1, num_passage)
    return F.array_join(
        F.transform(
            sliced,
            lambda x, i: F.concat(F.format_string("Passage-%d", i), x),
        ),
        "\n",
    )


def build_prompt(
    prompt_type: str,
    question: str | Column | None = None,
    ctxs: str | Column | None = None,
    num_passage: int = 3,
) -> Column:
    """P1: render a prompt template. Passage-bearing templates (rag)
    need question+ctxs; counterfactual/fusion templates are static.
    Non-fusion prompts get the '\\nAnswer: ' tail (code/prompt.py:41-44).
    """
    template = TEMPLATES[prompt_type]
    tail = "" if "fusion" in prompt_type else "\nAnswer: "
    parts: list[Column] = []
    rest = template + tail
    while True:
        qi, pi = rest.find("{question}"), rest.find("{passage}")
        nxt = min(x for x in (qi, pi) if x >= 0) if max(qi, pi) >= 0 else -1
        if nxt < 0:
            parts.append(F.lit(rest))
            break
        parts.append(F.lit(rest[:nxt]))
        if nxt == qi:
            parts.append(_c(question))
            rest = rest[nxt + len("{question}"):]
        else:
            parts.append(enumerate_passages(ctxs, num_passage))
            rest = rest[nxt + len("{passage}"):]
    return F.concat(*parts)


# --- P2: conversation-state constructors --------------------------------

def _msg(role: str, content: Column) -> Column:
    return F.struct(
        F.lit(role).alias("role"), content.alias("content")
    )


def init_messages(prompt: str | Column) -> Column:
    """[{user, prompt}] (code/llm_ours.py:24-28)."""
    return F.array(_msg("user", _c(prompt)))


def append_turn(
    messages: str | Column, assistant_reply: str | Column, user_prompt: str | Column
) -> Column:
    """messages + [{assistant, reply}, {user, prompt}]
    (code/llm_ours.py:31-35 + the .extend at run_llm_ours.py:107-109)."""
    return F.concat(
        _c(messages),
        F.array(_msg("assistant", _c(assistant_reply)), _msg("user", _c(user_prompt))),
    )


# --- P3: reference-answer expansion -------------------------------------

def expand_references(refs: str | Column) -> Column:
    """Split gold answers containing ' or ' and append the splits,
    dedup (code/run_llm_ours.py:90-94). The reference dedups via set()
    (nondeterministic order); we keep first-occurrence order — sort
    before comparing against an oracle."""
    r = _c(refs)
    splits = F.flatten(
        F.transform(
            F.filter(r, lambda a: a.contains(" or ")),
            lambda a: F.split(a, " or "),
        )
    )
    return F.array_distinct(F.concat(r, splits))
