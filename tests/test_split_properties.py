"""Property-based check of SPLIT (DisjointInterval) against a brute-force
oracle implementing the reference semantics directly (every atom between
consecutive boundary points, one output row per covering input interval).
"""

from __future__ import annotations

import random

from sclera_spark.operators import split_into


def _oracle(rows: list[tuple[int, int, int]]) -> set[tuple[int, int, int, int, int]]:
    """rows: (g, lo, hi) -> set of (g, out_lo, out_hi, lo, hi)."""
    out = set()
    by_g: dict[int, list[tuple[int, int]]] = {}
    for g, lo, hi in rows:
        by_g.setdefault(g, []).append((lo, hi))
    for g, ivs in by_g.items():
        bounds = sorted({b for iv in ivs for b in iv})
        atoms = list(zip(bounds, bounds[1:]))
        for lo, hi in ivs:
            for s, e in atoms:
                if lo <= s and e <= hi:
                    out.add((g, s, e, lo, hi))
    return out


def test_split_random_intervals(spark):
    rnd = random.Random(7)
    rows = []
    for g in range(6):
        for _ in range(rnd.randint(1, 12)):
            lo = rnd.randint(0, 40)
            hi = lo + rnd.randint(1, 15)
            rows.append((g, lo, hi))
    df = spark.createDataFrame(rows, "g int, lo int, hi int")
    got = {
        tuple(r)
        for r in split_into(df, "lo", "hi", "s", "e", partition_by=["g"])
        .select("g", "s", "e", "lo", "hi")
        .collect()
    }
    assert got == _oracle(rows)


def test_split_duplicates_and_touching(spark):
    rows = [
        (1, 0, 5), (1, 0, 5),          # exact duplicates -> both replicated
        (1, 5, 10),                    # touching, no overlap
        (2, 0, 10), (2, 0, 10), (2, 3, 7),
    ]
    df = spark.createDataFrame(rows, "g int, lo int, hi int")
    out = (
        split_into(df, "lo", "hi", "s", "e", partition_by=["g"])
        .select("g", "s", "e", "lo", "hi")
        .collect()
    )
    got = sorted(tuple(r) for r in out)
    expect = sorted(
        list(_oracle([(1, 0, 5), (1, 5, 10), (2, 0, 10), (2, 3, 7)]))
        # duplicates replicate per input row occurrence
        + [(1, 0, 5, 0, 5)]
        + [(2, 0, 3, 0, 10), (2, 3, 7, 0, 10), (2, 7, 10, 0, 10)]
    )
    assert got == expect
