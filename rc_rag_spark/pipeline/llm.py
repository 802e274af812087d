"""LLM batch-call operator (reference L1, code/llm_ours.py:38-125).

The reference calls a chat endpoint row-at-a-time with infinite
retry/5 s sleeps. Here the operator is a scalar *pandas UDF* over the
conversation column: Arrow-batched, one Python worker per executor
core, no join/shuffle — the DataFrame stays partitioned while the UDF
fans out HTTP calls per batch. Backends:

  mock      deterministic canned responses (hash of last user turn) —
            covers every parser path (FIXTURES.md llm_responses list)
  echo      returns the last user message (debugging)
  openai    OpenAI-compatible HTTP endpoint with bounded exponential
            backoff (the reference's infinite 5 s loop made generic);
            import-gated — no network in tests.

At cluster scale: size Arrow batches via
spark.sql.execution.arrow.maxRecordsPerBatch to the endpoint's
throughput; failures degrade to None (the reference treats a failed
call as a rejection, code/utils.py:203-205).
"""

from __future__ import annotations

import hashlib
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Canned responses keyed by prompt-hash bucket; each exercises a
# different parser path (X2/X3/X4/X5, refusals, fusion parsers).
_MOCK_ANSWER_FORMS: tuple[Callable[[str], str], ...] = (
    lambda w: f"Answer: {w}.\nEvidence: ## Passage-0, Passage-1 ##",
    lambda w: f"Answer: {w}",
    lambda w: f"{w} Evidence: see Passage-1 here",
    lambda w: "sorry, there is no information available",
    lambda w: f"The answer is {w} ## Passage-2 ## certainly",
    lambda w: "It is unknown",
)


def _stable_bucket(s: str, mod: int) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:4], "big") % mod


def _first_passage_words(prompt: str, n: int = 2) -> str:
    """Deterministic 'answer' tokens derived from the first passage of
    a rag prompt, so mock answers correlate with passage content."""
    idx = prompt.find("Passage-0")
    if idx < 0:
        return "mockword"
    words = prompt[idx + len("Passage-0"):].split()
    return " ".join(words[:n]) if words else "mockword"


def mock_chat(messages: list[dict]) -> str | None:
    """Deterministic mock backend over a chat history."""
    last_user = next(
        (m["content"] for m in reversed(messages) if m["role"] == "user"), ""
    )
    first_user = next(
        (m["content"] for m in messages if m["role"] == "user"), ""
    )
    if "Probability: <the probability" in last_user:
        b = _stable_bucket(last_user + str(len(messages)), 4)
        return ["Probability: 0.85", "Probability: 0.4", "Probability: 3.", "no idea"][b]
    if "$$ keep $$" in last_user:
        return "$$ keep $$" if _stable_bucket(last_user, 2) == 0 else "$$ discard $$"
    w = _first_passage_words(first_user)
    if "Assume that your answer is wrong" in last_user:
        # counterfactual turn: sometimes stick with the rag answer,
        # sometimes change/refuse — keyed on conversation length too
        b = _stable_bucket(last_user + str(len(messages)), 3)
        prev = next(
            (m["content"] for m in reversed(messages) if m["role"] == "assistant"),
            "",
        )
        if b == 0 and prev:
            return prev
        return _MOCK_ANSWER_FORMS[_stable_bucket(last_user + "cf", 6)](
            w if b == 1 else "different thing"
        )
    return _MOCK_ANSWER_FORMS[_stable_bucket(first_user, 6)](w)


def _openai_chat_factory(endpoint: str, model: str, api_key: str,
                         temperature: float = 0.0, max_tokens: int = 256,
                         max_retries: int = 5):
    """OpenAI-compatible backend with bounded exponential backoff
    (replaces the reference's unbounded retry, code/llm_ours.py:95-120).
    Returns None after exhausting retries (⇒ downstream rejection)."""

    def call(messages: list[dict]) -> str | None:
        import json
        import time
        import urllib.request

        body = json.dumps(
            {
                "model": model,
                "messages": messages,
                "temperature": temperature,
                "max_tokens": max_tokens,
            }
        ).encode()
        for attempt in range(max_retries):
            try:
                req = urllib.request.Request(
                    endpoint.rstrip("/") + "/chat/completions",
                    data=body,
                    headers={
                        "Content-Type": "application/json",
                        "Authorization": f"Bearer {api_key}",
                    },
                )
                with urllib.request.urlopen(req, timeout=120) as resp:
                    out = json.loads(resp.read())
                return out["choices"][0]["message"]["content"]
            except Exception:
                time.sleep(min(2 ** attempt, 30))
        return None

    return call


def _vllm_chat_factory(model_path: str, temperature: float = 0.0,
                       max_tokens: int = 256):
    """In-process vLLM backend (reference code/llm_ours.py:60-65).
    The vllm package is not installed in this container — the factory
    import-gates and raises clearly; the call shape (one engine per
    Python worker, batched generate) is the real design."""
    try:
        from vllm import LLM, SamplingParams  # noqa: F401
    except ImportError as exc:  # pragma: no cover - lib absent here
        raise NotImplementedError(
            "vllm is not available in this environment; use the "
            "'openai' backend against a vLLM server instead"
        ) from exc

    llm = LLM(model=model_path)  # pragma: no cover
    params = SamplingParams(temperature=temperature, max_tokens=max_tokens)

    def call(messages: list[dict]) -> str | None:  # pragma: no cover
        out = llm.chat(messages, params)
        return out[0].outputs[0].text if out else None

    return call


def _http_chat_factory(url: str, max_retries: int = 5, timeout: int = 120):
    """Generic JSON-POST chat backend (reference's internal HTTP
    service shape, code/llm_ours.py:68-82): POST {messages:[...]} →
    {text: "..."} with bounded backoff."""

    def call(messages: list[dict]) -> str | None:
        import json
        import time
        import urllib.request

        body = json.dumps({"messages": messages}).encode()
        for attempt in range(max_retries):
            try:
                req = urllib.request.Request(
                    url, data=body,
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    return json.loads(resp.read()).get("text")
            except Exception:
                time.sleep(min(2 ** attempt, 30))
        return None

    return call


BACKENDS: dict[str, Callable[..., Callable[[list[dict]], str | None]]] = {
    "mock": lambda **kw: mock_chat,
    "echo": lambda **kw: (
        lambda messages: next(
            (m["content"] for m in reversed(messages) if m["role"] == "user"),
            None,
        )
    ),
    "openai": _openai_chat_factory,
    "vllm": _vllm_chat_factory,
    "http": _http_chat_factory,
}


# Per-worker-process client cache: the pandas UDF body runs once per
# Arrow BATCH, so client construction must be memoized or a heavy
# backend (vLLM engine, HTTP session) would be rebuilt every 10k rows.
_WORKER_CLIENTS: dict = {}


def _get_client(backend: str, backend_kw: dict):
    key = (backend, tuple(sorted(backend_kw.items())))
    client = _WORKER_CLIENTS.get(key)
    if client is None:
        client = BACKENDS[backend](**backend_kw)
        _WORKER_CLIENTS[key] = client
    return client


def llm_call(messages_col: str | Column, backend: str = "mock", **backend_kw) -> Column:
    """Column expression: conversation array → model response (string,
    NULL on failure). Arrow-batched; the backend client is constructed
    once per Python worker process (memoized across batches), not per
    row or batch."""
    col = F.col(messages_col) if isinstance(messages_col, str) else messages_col
    if backend not in BACKENDS:
        raise KeyError(backend)

    @pandas_udf("string")
    def _udf(msgs: pd.Series) -> pd.Series:
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("llm_call")
        call = _get_client(backend, backend_kw)

        def run(conv):
            if conv is None:
                return None
            messages = [
                {"role": m["role"], "content": m["content"]} for m in conv
            ]
            return call(messages)

        return msgs.map(run)

    return _udf(col)
