"""Pure-Python golden oracle re-implementing the reference semantics
documented in SURVEY.md §2.1 (T1-T5, X1-X7, P3). Used to check the
engine's Catalyst-expression implementations row-by-row."""

from __future__ import annotations

import re
import string
import unicodedata

import regex as regex_mod

TOKEN_RE = regex_mod.compile(
    r"[\p{L}\p{N}\p{M}]+|[^\p{Z}\p{C}]",
    flags=regex_mod.IGNORECASE | regex_mod.UNICODE | regex_mod.MULTILINE,
)

REFUSALS = [
    "no specific", "unconfirmed", "uncertain", "unavailable", "sorry",
    "not have access", "no information", "not provide", "no clear",
    "not mentioned", "not mention", "no mention", "no answer", "N/A",
    "unclear", "not clear", "unknown", "partially correct",
    "partially incorrect", "not correct", "cannot determine",
    "cannot answer", "not incorrect", "incomplete",
]


def tokenize(text: str) -> list[str]:
    text = unicodedata.normalize("NFD", text)
    return [m.group().lower() for m in TOKEN_RE.finditer(text)]


def has_answer(answers: list[str], text: str) -> int:
    toks = tokenize(text)
    for ans in answers:
        a = tokenize(ans)
        for i in range(0, len(toks) - len(a) + 1):
            if a == toks[i : i + len(a)]:
                return 1
    return 0


def normalize(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def em(refs: list[str], pred: str) -> int:
    return max(int(normalize(pred) == normalize(r)) for r in refs)


def f1(refs: list[str], pred: str) -> float:
    import collections

    def toks(s):
        return normalize(s).split() if s else []

    def pair(gold, p):
        g, q = toks(gold), toks(p)
        common = collections.Counter(g) & collections.Counter(q)
        same = sum(common.values())
        if len(g) == 0 or len(q) == 0:
            return float(g == q)
        if same == 0:
            return 0.0
        prec, rec = same / len(q), same / len(g)
        return 2 * prec * rec / (prec + rec)

    return max(pair(r, pred) for r in refs)


def remove_marks(s: str) -> str:
    return re.sub(r"##(.*?)##", "", s).strip()


def extract_evidence(s: str) -> str:
    groups = re.findall(r"##(.*?)##", s, flags=re.S)
    if groups:
        return groups[-1].strip()
    n = s.count("Passage-")
    if n > 1:
        found, start = [], 0
        for _ in range(n):
            idx = s[start:].find("Passage-")
            if idx > -1 and idx + 9 < len(s) - start:
                found.append(s[start + idx : start + idx + 9])
                start = start + idx + 9
            else:
                break
        return ", ".join(sorted(set(found)))  # canonicalized order
    idx = s.find("Passage-")
    if idx > -1 and idx + 9 < len(s):
        return s[idx : idx + 9]
    return s


def split_answer_evidence(s: str) -> tuple[str, str]:
    s = s.replace("Answer: ", "")
    if "Evidence: " in s:
        ans = re.sub(r"Evidence: (.*)", "", s)
        evi = re.sub(r"(.*)Evidence: ", "", s)
    else:
        ans = evi = s
    return remove_marks(ans).strip(), extract_evidence(evi).strip()


def parse_prediction(pred: str | None):
    if pred is None:
        return True, None, None
    if pred.lower().startswith("answer:"):
        pred = pred[7:]
    reject = bool(has_answer(REFUSALS, pred))
    pred = re.sub(r"\n", " ", pred)
    ans, evi = split_answer_evidence(pred)
    return reject, ans, evi


def fusion_decision(s: str) -> str:
    return "keep" if "keep" in s else "discard"


def fusion_probability(text: str) -> float:
    if text.lower().startswith("probability: "):
        text = text[13:]
    m = re.findall(r"\d+\.\d+", text)
    if m:
        return float(m[0])
    m = re.findall(r"\d+\.", text)
    return float(m[0]) if m else 0.0


def expand_refs(refs: list[str]) -> list[str]:
    out = list(refs)
    for r in refs:
        if " or " in r:
            out.extend(r.split(" or "))
    seen, dedup = set(), []
    for r in out:
        if r not in seen:
            seen.add(r)
            dedup.append(r)
    return dedup
