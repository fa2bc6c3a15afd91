"""Fuzz family 10: asof_join / range_join property + oracle fuzz.

asof_join got a second execution plan in r6 (hot-group auto-split:
range-bucketed two-pass prefix carry) — exactly the kind of rewrite
that dies on an edge the author didn't generate. Each seed randomizes
the data SHAPE (group count, skew, key type, NULL keys, one-sided
groups, empty sides, tolerance, direction, how) and asserts:

1. SPLIT == UNSPLIT: the forced-hot-split plan (tiny threshold, full
   sample, random bucket count) returns exactly the single-window
   plan's rows. Right keys are unique per group so ties cannot excuse
   a divergence.
2. UNSPLIT == pandas.merge_asof: an independent reference
   implementation, per group, same direction/tolerance semantics.

range_join seeds randomize interval lengths (incl. zero-length and
touching endpoints), bin widths and closedness, and compare against a
brute-force pandas double-loop oracle per group.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from sclera_spark.operators import asof_join, range_join

N_SEEDS = 40


def _gen_asof(rng: random.Random):
    n_groups = rng.choice([1, 2, 5])
    hot = rng.random() < 0.5  # one group carries most rows
    groups = [f"g{i}" for i in range(n_groups)]
    key_is_float = rng.random() < 0.5

    def mk_key(i):
        v = rng.randrange(0, 500)
        return v + 0.5 if key_is_float else float(v)

    left_rows, right_rows = [], []
    lid = 0
    for gi, g in enumerate(groups):
        n_left = rng.randrange(0, 60) * (5 if hot and gi == 0 else 1)
        for _ in range(n_left):
            k = None if rng.random() < 0.05 else mk_key(lid)
            left_rows.append((g, k, lid))
            lid += 1
        # unique right keys per group (ties would make the match
        # payload nondeterministic in BOTH plans)
        n_right = rng.randrange(0, 40) * (5 if hot and gi == 0 else 1)
        seen = set()
        for _ in range(n_right):
            k = mk_key(lid)
            if k in seen:
                continue
            seen.add(k)
            right_rows.append((g, k, int(k * 10)))
    # a group that exists only on one side
    left_rows.append(("only_left", 1.0, lid))
    right_rows.append(("only_right", 2.0, 20))
    return left_rows, right_rows


def _pandas_asof(left_rows, right_rows, direction, tolerance, how):
    out = []
    lp = pd.DataFrame(left_rows, columns=["g", "t", "lid"])
    rp = pd.DataFrame(right_rows, columns=["g", "t", "payload"])
    for g, lg in lp.groupby("g", dropna=False):
        rg = rp[rp.g == g].sort_values("t")
        matched = []
        for _, row in lg.iterrows():
            t = row.t
            if pd.isna(t) or rg.empty:
                matched.append(None)
                continue
            if direction == "backward":
                cand = rg[rg.t <= t]
                pick = cand.iloc[-1] if len(cand) else None
            else:
                cand = rg[rg.t >= t]
                pick = cand.iloc[0] if len(cand) else None
            if pick is not None and tolerance is not None:
                if abs(pick.t - t) > tolerance:
                    pick = None
            matched.append(None if pick is None else int(pick.payload))
        for (_, row), m in zip(lg.iterrows(), matched):
            if m is None and how == "inner":
                continue
            out.append((row.g, None if pd.isna(row.t) else row.t, int(row.lid), m))
    return sorted(out, key=lambda x: (x[2],))


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_fuzz_asof_split_equals_unsplit_equals_pandas(spark, seed):
    rng = random.Random(3000 + seed)
    left_rows, right_rows = _gen_asof(rng)
    direction = rng.choice(["backward", "forward"])
    tolerance = rng.choice([None, 5, 50])
    how = rng.choice(["left", "inner"])

    left = spark.createDataFrame(left_rows, "g string, t double, lid long")
    right = spark.createDataFrame(right_rows, "g string, t double, payload long")

    base = asof_join(
        left, right, on="t", by=["g"], direction=direction,
        tolerance=None if tolerance is None else str(tolerance),
        how=how, hot_group_threshold=None,
    ).select("g", "t", "lid", "payload")
    split = asof_join(
        left, right, on="t", by=["g"], direction=direction,
        tolerance=None if tolerance is None else str(tolerance),
        how=how, hot_group_threshold=5, skew_sample_fraction=1.0,
        hot_group_buckets=rng.choice([2, 3, 8]),
    ).select("g", "t", "lid", "payload")

    b = sorted(map(tuple, base.collect()), key=lambda x: x[2])
    s = sorted(map(tuple, split.collect()), key=lambda x: x[2])
    assert s == b, f"seed {seed}: split plan diverged"

    expect = _pandas_asof(left_rows, right_rows, direction, tolerance, how)
    got = [(r[0], r[1], r[2], r[3]) for r in b]
    assert got == expect, f"seed {seed}: vs pandas oracle"


def _pandas_range(left_rows, right_rows, closed):
    out = []
    for g, ls, le, lid in left_rows:
        for g2, rs, re_, rid in right_rows:
            if g != g2:
                continue
            ok = (ls <= re_ and rs <= le) if closed else (ls < re_ and rs < le)
            if ok:
                out.append((lid, rid))
    return sorted(out)


@pytest.mark.parametrize("seed", range(N_SEEDS // 2))
def test_fuzz_range_join_vs_bruteforce(spark, seed):
    rng = random.Random(7000 + seed)
    groups = [f"g{i}" for i in range(rng.choice([1, 3]))]
    left_rows, right_rows = [], []
    for i in range(rng.randrange(5, 60)):
        g = rng.choice(groups)
        s = rng.randrange(0, 300)
        e = s + rng.choice([0, 1, rng.randrange(0, 50)])  # incl. zero-length
        left_rows.append((g, s, e, i))
    for i in range(rng.randrange(5, 60)):
        g = rng.choice(groups)
        s = rng.randrange(0, 300)
        e = s + rng.choice([0, 1, rng.randrange(0, 50)])
        right_rows.append((g, s, e, 1000 + i))
    closed = rng.random() < 0.5
    # None = auto-derived width (r8): must return the same rows as any
    # explicit width — the knob is plan-only
    bin_width = rng.choice([None, 1, 7, 64, 1000])

    left = spark.createDataFrame(left_rows, "g string, ls long, le long, lid long")
    right = spark.createDataFrame(right_rows, "g string, rs long, re long, rid long")
    got = range_join(
        left, right, ("ls", "le"), ("rs", "re"), by=["g"],
        bin_width=bin_width, closed=closed,
    ).select("lid", "rid")
    pairs = sorted((r.lid, r.rid) for r in got.collect())
    assert pairs == _pandas_range(left_rows, right_rows, closed), f"seed {seed}"
