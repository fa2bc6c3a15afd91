"""Property-based check of the MATCH engine: the Glushkov-NFA greedy
matcher must agree with a brute-force oracle that tests every candidate
span with Python's re.fullmatch (leftmost start, longest end, non-
overlapping — the documented semantics)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from sclera_spark.operators.match.regex_nfa import compile_pattern, find_matches

ALPHABET = "ABC"


# ---- random pattern generator over our grammar ----

def _atom() -> st.SearchStrategy[str]:
    return st.sampled_from(list(ALPHABET))


def _pattern(depth: int = 3) -> st.SearchStrategy[str]:
    if depth == 0:
        return _atom()
    sub = _pattern(depth - 1)
    return st.one_of(
        _atom(),
        st.tuples(sub, sub).map(lambda t: f"{t[0]} {t[1]}"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]}|{t[1]})"),
        sub.map(lambda p: f"({p})+"),
        sub.map(lambda p: f"({p})*"),
        sub.map(lambda p: f"({p})?"),
    )


def _to_python_re(pattern: str) -> str:
    # our grammar uses whitespace/'.' for concatenation; labels are single
    # chars here, so stripping separators yields a valid python regex
    return pattern.replace(" ", "").replace(".", "")


def _oracle_spans(pattern: str, s: str) -> list[tuple[int, int]]:
    """Leftmost-start, longest-end, non-overlapping, non-empty spans where
    the span's text is in L(pattern)."""
    rx = re.compile(_to_python_re(pattern))
    out = []
    i, n = 0, len(s)
    while i < n:
        best = -1
        for j in range(n, i, -1):  # longest first
            if rx.fullmatch(s, i, j):
                best = j
                break
        if best > i:
            out.append((i, best))
            i = best
        else:
            i += 1
    return out


@settings(max_examples=300, deadline=None)
@given(pattern=_pattern(), s=st.text(alphabet=ALPHABET, max_size=14))
def test_nfa_matches_bruteforce(pattern: str, s: str):
    nfa = compile_pattern(pattern)
    got = find_matches(nfa, list(s))
    expect = _oracle_spans(pattern, s)
    assert got == expect, f"pattern={pattern!r} s={s!r}: {got} != {expect}"


@settings(max_examples=100, deadline=None)
@given(s=st.text(alphabet=ALPHABET, max_size=12))
def test_anchored_end(s: str):
    nfa = compile_pattern("A+$")
    got = find_matches(nfa, list(s))
    m = re.search(r"A+$", s)
    expect = [(m.start(), m.end())] if m else []
    assert got == expect
