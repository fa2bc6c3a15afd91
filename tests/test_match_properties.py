"""Property-based check of the MATCH engine: the Glushkov-NFA greedy
matcher must agree with a brute-force oracle that tests every candidate
span with Python's re.fullmatch (leftmost start, longest end, non-
overlapping — the documented semantics)."""

from __future__ import annotations

import pytest

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


# ------- r12: chunked bounded-memory partition matcher equivalence


def _run_chunked(labels, pattern, chunk, key=7, cap=1_000_000):
    """Drive make_partition_matcher directly (no Spark) over a single
    group split into `chunk`-row pandas pieces; return the matched
    (row_index, match_id, match_label) triples."""
    import pandas as pd

    from sclera_spark.operators.match.matcher import (
        make_partition_matcher,
    )
    from sclera_spark.operators.match.regex_nfa import (
        CompiledMatcher,
        compile_pattern,
    )

    matcher = CompiledMatcher(compile_pattern(pattern))
    fn = make_partition_matcher(
        matcher, ["g"], ["g", "i"], True, max_attempt_rows=cap
    )
    n = len(labels)

    def batches():
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            yield pd.DataFrame(
                {
                    "g": [key] * (hi - lo),
                    "i": list(range(lo, hi)),
                    "__labels": list(labels[lo:hi]),
                }
            )

    out = []
    for frame in fn(batches()):
        out.extend(
            (int(r.i), int(r.match_id), r.match_label)
            for r in frame.itertuples()
        )
    return out


@settings(max_examples=120, deadline=None)
@given(
    _pattern(),
    st.text(alphabet="ABC", min_size=0, max_size=60),
    st.integers(min_value=1, max_value=13),
)
def test_chunked_matcher_equals_whole_group(pattern, s, chunk):
    """The chunked, bounded-memory partition processor must produce
    EXACTLY the whole-group vectorized result for every pattern, label
    sequence and chunking — scan_open's withheld-attempt contract."""
    from sclera_spark.operators.match.regex_nfa import (
        CompiledMatcher,
        compile_pattern,
    )

    try:
        nfa = compile_pattern(pattern)
    except ValueError:
        return
    matcher = CompiledMatcher(nfa)
    labels = list(s)
    want = []
    for mid, (a, b, path) in enumerate(
        matcher.find_matches_with_paths(labels)
    ):
        want.extend((i, mid, path[i - a]) for i in range(a, b))
    got = _run_chunked(labels, pattern, chunk)
    assert got == want, (pattern, s, chunk)


def test_chunked_matcher_multiple_groups_split_across_chunks():
    """Group boundaries landing mid-chunk and chunk boundaries landing
    mid-group both resolve: per-group match ids restart, no cross-group
    match ever forms."""
    import pandas as pd

    from sclera_spark.operators.match.matcher import (
        make_partition_matcher,
    )
    from sclera_spark.operators.match.regex_nfa import (
        CompiledMatcher,
        compile_pattern,
    )

    matcher = CompiledMatcher(compile_pattern("A B"))
    fn = make_partition_matcher(matcher, ["g"], ["g", "i"], True)
    rows = []
    for g in (1, 2, 3):
        for i, lab in enumerate(["A", "B", "A", "B", "A"]):
            rows.append((g, i, lab))

    def batches():
        # chunk size 4: every boundary misaligned with the groups of 5
        for lo in range(0, len(rows), 4):
            part = rows[lo: lo + 4]
            yield pd.DataFrame(
                {
                    "g": [r[0] for r in part],
                    "i": [r[1] for r in part],
                    "__labels": [r[2] for r in part],
                }
            )

    got = sorted(
        (int(r.g), int(r.i), int(r.match_id))
        for frame in fn(batches())
        for r in frame.itertuples()
    )
    want = sorted(
        (g, i, mid)
        for g in (1, 2, 3)
        for mid, i in [(0, 0), (0, 1), (1, 2), (1, 3)]
    )
    assert got == want


@pytest.mark.slowstress
def test_match_memory_bound_10m_single_key():
    """VERDICT r12 task 5: a 10M-row SINGLE-KEY group (the pathological
    skew case that used to concatenate into one pandas frame) streams
    through the partition matcher under a hard RSS budget, with the
    full expected match set. Runs in a fresh subprocess so the peak-RSS
    measurement is not polluted by the test session."""
    import json
    import subprocess
    import sys

    code = r"""
import json, os, sys
import pandas as pd
from sclera_spark.operators.match.matcher import make_partition_matcher
from sclera_spark.operators.match.regex_nfa import CompiledMatcher, compile_pattern

PAGE = os.sysconf("SC_PAGE_SIZE")

def rss_mb():
    # CURRENT resident set, not ru_maxrss: the lifetime peak survives
    # fork/exec, so a child spawned from a fat pytest parent inherits
    # the parent's peak and the budget assert reads the WRONG process
    with open("/proc/self/statm") as fh:
        return int(fh.read().split()[1]) * PAGE / (1024 * 1024)

N, CHUNK, PERIOD = 10_000_000, 100_000, 50
matcher = CompiledMatcher(compile_pattern("V+ P"))
fn = make_partition_matcher(matcher, ["g"], ["g", "i"], True)

def batches():
    for lo in range(0, N, CHUNK):
        hi = lo + CHUNK
        labs = ["P" if i % PERIOD == PERIOD - 1 else "V" for i in range(lo, hi)]
        yield pd.DataFrame({"g": [1] * CHUNK, "i": range(lo, hi), "__labels": labs})

rows = 0
max_mid = -1
peak = rss_mb()
for frame in fn(batches()):
    rows += len(frame)
    max_mid = max(max_mid, int(frame["match_id"].max()))
    peak = max(peak, rss_mb())
print(json.dumps({"rows": rows, "max_mid": max_mid, "peak_mb": peak}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        # generous: ~15 s idle, but concurrent Spark sessions on the
        # same host oversubscribe the CPUs heavily and a timeout here
        # reads as a bogus memory-bound failure
        timeout=1800,
        cwd=".",
    )
    assert out.returncode == 0, (out.stderr[-2000:], out.stdout[-500:])
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["rows"] == 10_000_000  # every row belongs to a match
    assert got["max_mid"] == 10_000_000 // 50 - 1
    # the old concat-the-partition path held all 10M rows + labels
    # (>1.5 GB); the chunked path stays under a hard budget
    assert got["peak_mb"] < 500, got


def test_match_over_cap_attempt_settles_in_place():
    """An open attempt longer than max_attempt_rows settles exactly
    like the streaming stateful MATCH: a longer-than-cap true match is
    emitted as consecutive cap-sized matches instead of OOMing."""
    labels = ["A"] * 25
    got = _run_chunked(labels, "A+", chunk=5, cap=10)
    # every row still matches; match ids split at the cap
    assert [i for i, _, _ in got] == list(range(25))
    sizes = {}
    for _i, mid, lab in got:
        assert lab == "A"
        sizes[mid] = sizes.get(mid, 0) + 1
    assert sum(sizes.values()) == 25
    assert all(sz <= 10 for sz in sizes.values())
