"""Porter stemmer — Python kernel + DuckDB-SQL twin.

The reference scores ROUGE-L with HF ``rouge_scorer(use_stemmer=True)``
(``/root/reference/code/utils.py:335-339``), which stems tokens longer
than 3 characters before the LCS. This module implements the original
published Porter (1980) algorithm twice with identical rule order:

  * ``porter_stem`` / ``stem_tokens`` — pure Python, used by the
    Arrow-batched ROUGE UDF (functions/text.py).
  * ``stem_steps_sql`` — the same algorithm as a chain of SQL CTE
    stages (one column rewrite per Porter step), so a DuckDB oracle
    can reproduce the stemmed tokens in a SINGLE statement (no
    CREATE MACRO — the correctness driver may not execute
    multi-statement SQL). A naive inline expansion would blow up
    exponentially (each step references its input many times), which
    is why stemming is staged per-step over exploded tokens.

Known divergence from the reference, documented: NLTK's PorterStemmer
(which HF loads) runs with NLTK_EXTENSIONS — an irregular-forms pool
(sky/dying/lying/…) and special-cases for 4-letter '-ies'/'-ied'
words ("ties"→"tie" vs original "ti"). Both engines HERE implement
the original algorithm, so the oracle gate pins one consistent,
published semantics; scores can differ from HF on those few words.
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _cv(w: str) -> str:
    """Classification string: 'a' for vowels, the raw char for
    consonants (mirrors the SQL twin, which builds the same string
    with two regexp_replace passes)."""
    out = []
    for i in range(len(w)):
        out.append("a" if not _is_cons(w, i) else w[i])
    return "".join(out)


def _measure(stem: str) -> int:
    import re

    return len(re.findall(r"a+[^a]+", _cv(stem)))


def _has_vowel(stem: str) -> bool:
    return "a" in _cv(stem)


def _ends_dd(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cv(w)[-1] != "a"


def _ends_cvc(w: str) -> bool:
    import re

    return (
        len(w) >= 3
        and re.search(r"[^a]a[^a]$", _cv(w)) is not None
        and w[-1] not in "wxy"
    )


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b_post(s: str) -> str:
    if s.endswith(("at", "bl", "iz")):
        return s + "e"
    if _ends_dd(s) and s[-1] not in "lsz":
        return s[:-1]
    if _measure(s) == 1 and _ends_cvc(s):
        return s + "e"
    return s


def _step1b(w: str) -> str:
    if w.endswith("eed"):
        return w[:-1] if _measure(w[:-3]) > 0 else w
    if w.endswith("ed") and _has_vowel(w[:-2]):
        return _step1b_post(w[:-2])
    if w.endswith("ing") and _has_vowel(w[:-3]):
        return _step1b_post(w[:-3])
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


# (suffix, replacement) in longest-first order; first MATCHING suffix
# decides (its m-condition failing means no rewrite in this step).
_STEP2 = [
    ("ational", "ate"), ("ization", "ize"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("tional", "tion"),
    ("biliti", "ble"), ("entli", "ent"), ("ousli", "ous"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("iviti", "ive"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("ator", "ate"), ("eli", "e"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]
_STEP4 = [
    ("ement", None), ("ance", None), ("ence", None), ("able", None),
    ("ible", None), ("ment", None), ("ant", None), ("ent", None),
    ("ion", None), ("ism", None), ("ate", None), ("iti", None),
    ("ous", None), ("ive", None), ("ize", None), ("al", None),
    ("er", None), ("ic", None), ("ou", None),
]


def _rule_step(w: str, rules, min_m: int) -> str:
    for suf, rep in rules:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > min_m - 1:
                if suf == "ion" and rep is None and (not stem or stem[-1] not in "st"):
                    return w
                return stem + (rep or "")
            return w
    return w


def _step4(w: str) -> str:
    return _rule_step(w, _STEP4, 2)


def _step5a(w: str) -> str:
    if w.endswith("e"):
        s = w[:-1]
        m = _measure(s)
        if m > 1 or (m == 1 and not _ends_cvc(s)):
            return s
    return w


def _step5b(w: str) -> str:
    if _measure(w) > 1 and w.endswith("ll"):
        return w[:-1]
    return w


def porter_stem(word: str) -> str:
    """Original Porter (1980); words of length <= 2 are untouched."""
    w = word.lower()
    if len(w) <= 2:
        return w
    w = _step1a(w)
    w = _step1b(w)
    w = _step1c(w)
    w = _rule_step(w, _STEP2, 1)
    w = _rule_step(w, _STEP3, 1)
    w = _step4(w)
    w = _step5a(w)
    w = _step5b(w)
    return w


def stem_tokens(tokens: list[str]) -> list[str]:
    """rouge_score discipline: stem only tokens LONGER than 3 chars."""
    return [porter_stem(t) if len(t) > 3 else t for t in tokens]


# ---------------------------------------------------------------------------
# SQL twin: one expression per Porter step, rewriting column `w`.
# ---------------------------------------------------------------------------

def _sql_cv(e: str) -> str:
    return (
        f"regexp_replace(regexp_replace({e}, '[aeiou]', 'a', 'g'),"
        f" '([^a])y', '\\1a', 'g')"
    )


def _sql_m(e: str) -> str:
    return f"len(regexp_extract_all({_sql_cv(e)}, 'a+[^a]+'))"


def _sql_hasv(e: str) -> str:
    return f"contains({_sql_cv(e)}, 'a')"


def _sql_dd(e: str) -> str:
    return (
        f"(len({e}) >= 2 AND substr({e}, len({e}) - 1, 1) = substr({e}, len({e}), 1)"
        f" AND substr({_sql_cv(e)}, len({e}), 1) != 'a')"
    )


def _sql_cvc(e: str) -> str:
    return (
        f"(len({e}) >= 3 AND regexp_matches({_sql_cv(e)}, '[^a]a[^a]$')"
        f" AND substr({e}, len({e}), 1) NOT IN ('w', 'x', 'y'))"
    )


def _cut(e: str, n: int) -> str:
    return f"left({e}, len({e}) - {n})"


def _sql_step1a(w: str) -> str:
    return (
        f"CASE WHEN ends_with({w}, 'sses') THEN {_cut(w, 2)}"
        f" WHEN ends_with({w}, 'ies') THEN {_cut(w, 2)}"
        f" WHEN ends_with({w}, 'ss') THEN {w}"
        f" WHEN ends_with({w}, 's') THEN {_cut(w, 1)}"
        f" ELSE {w} END"
    )


def _sql_step1b_post(s: str) -> str:
    return (
        f"CASE WHEN ends_with({s}, 'at') OR ends_with({s}, 'bl')"
        f" OR ends_with({s}, 'iz') THEN {s} || 'e'"
        f" WHEN {_sql_dd(s)} AND substr({s}, len({s}), 1) NOT IN ('l', 's', 'z')"
        f" THEN {_cut(s, 1)}"
        f" WHEN {_sql_m(s)} = 1 AND {_sql_cvc(s)} THEN {s} || 'e'"
        f" ELSE {s} END"
    )


def _sql_step1b(w: str) -> str:
    # the ed/ing stems are staged as columns by stem_steps_sql, so the
    # post-expression's many self-references stay O(1) in size
    return (
        f"CASE WHEN ends_with({w}, 'eed')"
        f" THEN CASE WHEN {_sql_m(_cut(w, 3))} > 0 THEN {_cut(w, 1)} ELSE {w} END"
        f" WHEN ends_with({w}, 'ed') AND {_sql_hasv('_ed')} THEN ({_sql_step1b_post('_ed')})"
        f" WHEN ends_with({w}, 'ing') AND {_sql_hasv('_ing')} THEN ({_sql_step1b_post('_ing')})"
        f" ELSE {w} END"
    )


def _sql_step1c(w: str) -> str:
    return (
        f"CASE WHEN ends_with({w}, 'y') AND {_sql_hasv(_cut(w, 1))}"
        f" THEN {_cut(w, 1)} || 'i' ELSE {w} END"
    )


def _sql_rule_step(w: str, rules, min_m: int) -> str:
    branches = []
    for suf, rep in rules:
        stem = _cut(w, len(suf))
        cond = f"{_sql_m(stem)} >= {min_m}"
        if suf == "ion" and rep is None:
            cond += f" AND substr({stem}, len({stem}), 1) IN ('s', 't')"
        out = f"{stem} || '{rep}'" if rep else stem
        branches.append(
            f"WHEN ends_with({w}, '{suf}')"
            f" THEN CASE WHEN {cond} THEN {out} ELSE {w} END"
        )
    return "CASE " + " ".join(branches) + f" ELSE {w} END"


def _sql_step5a(w: str) -> str:
    s = _cut(w, 1)
    return (
        f"CASE WHEN ends_with({w}, 'e') AND ({_sql_m(s)} > 1"
        f" OR ({_sql_m(s)} = 1 AND NOT {_sql_cvc(s)})) THEN {s} ELSE {w} END"
    )


def _sql_step5b(w: str) -> str:
    return (
        f"CASE WHEN {_sql_m(w)} > 1 AND ends_with({w}, 'll')"
        f" THEN {_cut(w, 1)} ELSE {w} END"
    )


def stem_steps_sql(col: str = "w") -> list[str]:
    """The Porter steps as successive rewrites of column `col`: each
    entry is a SELECT expression for one CTE stage (input column `col`,
    output alias `col`). Callers explode token lists to rows, thread
    these stages, and re-aggregate — see stem_tokens_cte_sql."""
    w = col
    return [
        _sql_step1a(w),
        # stage the ed/ing stems once so 1b's post-rules don't re-expand
        _sql_step1b(w),
        _sql_step1c(w),
        _sql_rule_step(w, _STEP2, 1),
        _sql_rule_step(w, _STEP3, 1),
        _sql_rule_step(w, _STEP4, 2),
        _sql_step5a(w),
        _sql_step5b(w),
    ]


def stem_tokens_cte_sql(
    src: str, keys: list[str], list_col: str, out: str
) -> str:
    """SQL text for a CTE chain stemming every token of `src.list_col`
    (rouge_score guard: only tokens longer than 3 chars are stemmed).
    Emits CTEs `{out}_e`, `{out}_s0..s7`, and `{out}` with columns
    ({keys}, {list_col}) where {list_col} is the stemmed list (order
    preserved, empty lists preserved)."""
    ks = ", ".join(keys)
    stages = []
    stages.append(
        f"{out}_e AS (SELECT {ks}, {list_col} AS _l,"
        f" unnest(generate_series(1, len({list_col}))) AS _pos"
        f" FROM {src})"
    )
    # stem the DISTINCT vocabulary only — the per-step regex cascade is
    # the cost driver, and corpora repeat tokens heavily, so running it
    # per distinct token then joining back to positions turns
    # O(token_instances × regexes) into O(vocabulary × regexes)
    stages.append(
        f"{out}_s0 AS (SELECT _tok, lower(_tok) AS w FROM"
        f" (SELECT DISTINCT _l[_pos] AS _tok FROM {out}_e))"
    )
    prev = f"{out}_s0"
    for i, expr in enumerate(stem_steps_sql("w"), 1):
        extra = ""
        if i == 2:  # step1b needs the ed/ing stems staged
            extra = (
                ", CASE WHEN ends_with(w, 'ed') THEN left(w, len(w) - 2)"
                " ELSE '' END AS _ed"
                ", CASE WHEN ends_with(w, 'ing') THEN left(w, len(w) - 3)"
                " ELSE '' END AS _ing"
            )
            stages.append(
                f"{out}_s{i}p AS (SELECT _tok, w{extra} FROM {prev})"
            )
            prev = f"{out}_s{i}p"
        stages.append(
            f"{out}_s{i} AS (SELECT _tok,"
            f" CASE WHEN len(_tok) > 3 THEN ({expr}) ELSE w END AS w"
            f" FROM {prev})"
        )
        prev = f"{out}_s{i}"
    stages.append(
        f"{out}_g AS (SELECT {ks},"
        f" list(CASE WHEN len(e._tok) > 3 THEN v.w ELSE e._tok END"
        f" ORDER BY e._pos) AS _stemmed"
        f" FROM (SELECT {ks}, _pos, _l[_pos] AS _tok FROM {out}_e) e"
        f" JOIN {prev} v ON v._tok = e._tok"
        f" GROUP BY {ks})"
    )
    # MATERIALIZED: downstream oracles reference the stemmed CTE more
    # than once (LCS match grid + recall denominator); without it
    # DuckDB inlines — and re-runs — the whole stemming cascade per
    # reference
    stages.append(
        f"{out} AS MATERIALIZED (SELECT s.* EXCLUDE ({list_col}),"
        f" coalesce(g._stemmed, []) AS {list_col}"
        f" FROM {src} s LEFT JOIN {out}_g g USING ({ks}))"
    )
    return ",\n".join(stages)
