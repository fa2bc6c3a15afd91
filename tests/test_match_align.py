"""MATCH and ALIGN operator tests — pure-pandas/python oracles (no DuckDB
equivalent exists; FIXTURES.md oracle protocol)."""

from __future__ import annotations

import pytest

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sclera_spark.operators.align import align, align_zip
from sclera_spark.operators.match import (
    ColumnRowLabeler,
    PredRowLabeler,
    compile_pattern,
    find_matches,
    label_agg,
    match_aggregate,
    match_rows,
)


def _events_pdf(tables):
    return (
        tables["events"]
        .select("user_id", "event_id", "ts", "event_type", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )


def test_match_rows_against_pandas_oracle(spark, tables):
    pattern = "VIEW+ PURCHASE"
    out = match_rows(
        tables["events"].select("user_id", "event_id", "ts", "event_type", "value"),
        pattern,
        ColumnRowLabeler("event_type"),
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
    ).toPandas()

    # oracle: same NFA run in pure pandas per user
    nfa = compile_pattern(pattern)
    expect_rows = []
    for uid, g in _events_pdf(tables).groupby("user_id"):
        g = g.reset_index(drop=True)
        labels = [frozenset([t.upper()]) for t in g["event_type"]]
        for mid, (s, e) in enumerate(find_matches(nfa, labels)):
            for i in range(s, e):
                expect_rows.append((uid, int(g.loc[i, "event_id"]), mid))
    expect = set(expect_rows)
    got = {(r.user_id, r.event_id, r.match_id) for r in out.itertuples()}
    assert got == expect
    assert len(out) == len(expect_rows)


def test_match_aggregate(spark, tables):
    # one row per VIEW+ PURCHASE funnel: views count, purchase value
    ev = tables["events"].select("user_id", "event_id", "ts", "event_type", "value")
    out = match_aggregate(
        ev,
        "VIEW+ PURCHASE",
        ColumnRowLabeler("event_type"),
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
        aggregates={
            "n_views": label_agg("VIEW", F.count, F.col("event_id")),
            "purchase_value": label_agg("PURCHASE", F.sum, F.col("value")),
            "n_rows": F.count(F.lit(1)),
        },
    ).toPandas()
    assert (out["n_views"] >= 1).all()
    assert (out["n_rows"] == out["n_views"] + 1).all()

    # cross-check per-user match counts against the pandas oracle
    nfa = compile_pattern("VIEW+ PURCHASE")
    per_user = {}
    for uid, g in _events_pdf(tables).groupby("user_id"):
        labels = [frozenset([t.upper()]) for t in g["event_type"]]
        n = len(find_matches(nfa, labels))
        if n:
            per_user[uid] = n
    got = out.groupby("user_id").size().to_dict()
    assert got == per_user


def test_match_pred_labeler(spark, tables):
    ev = tables["events"].select("user_id", "event_id", "ts", "value")
    out = match_rows(
        ev,
        "LOW+ HIGH",
        PredRowLabeler([(F.col("value") < 50, "LOW"), (F.col("value") >= 50, "HIGH")]),
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
    )
    pdf = out.toPandas()
    assert (pdf.groupby(["user_id", "match_id"]).size() >= 2).all()
    # last row of each match must be HIGH, others LOW
    for (_, _), g in pdf.groupby(["user_id", "match_id"]):
        labs = list(g["match_label"])
        assert labs[-1] == "HIGH" and set(labs[:-1]) == {"LOW"}


def test_align_zip(spark):
    a = spark.createDataFrame([(i, f"a{i}") for i in range(5)], "ai int, av string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(5)], "bi int, bv string")
    out = align_zip(a, b, order_by_a=["ai"], order_by_b=["bi"]).orderBy("ai")
    rows = out.collect()
    assert [(r.ai, r.bi) for r in rows] == [(i, i) for i in range(5)]


def test_align_dtw_identical_series(spark):
    # aligning a series with itself: optimal path is the diagonal
    a = spark.createDataFrame([(i, float(i)) for i in range(8)], "ai int, ax double")
    b = spark.createDataFrame([(i, float(i)) for i in range(8)], "bi int, bx double")
    out = align(
        a,
        b,
        dist=lambda pa, pb: np.abs(pa["ax"].to_numpy() - pb["bx"].to_numpy()),
        margin=3,
        order_by_a=["ai"],
        order_by_b=["bi"],
    ).orderBy("ai")
    rows = out.collect()
    assert [(r.ai, r.bi) for r in rows] == [(i, i) for i in range(8)]


def test_align_dtw_band_optimality_randomized():
    """The vectorized band DP must return a valid monotone suffix path
    achieving the optimal banded cost (checked against a per-cell dict
    DP over 25 random instances)."""
    from sclera_spark.operators.align import _dtw_pairs

    def brute_cost(na, nb, costf, margin):
        n = min(na, nb)
        m = max(1, min(abs(margin), n - 1)) if margin is not None else max(1, n - 1)
        D = {}

        def g(i, j):
            return D.get((i, j), float("inf"))

        for i in range(n):
            for j in range(max(0, i - m), min(n - 1, i + m) + 1):
                c = float(costf(np.array([na - 1 - i]), np.array([nb - 1 - j]))[0])
                if i == 0 and j == 0:
                    D[(0, 0)] = c
                    continue
                D[(i, j)] = c + min(g(i - 1, j - 1), g(i - 1, j), g(i, j - 1))
        return D[(n - 1, n - 1)]

    rng = np.random.default_rng(7)
    for _ in range(25):
        na, nb = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        margin = int(rng.integers(1, 8)) if rng.random() < 0.8 else None
        va, vb = rng.normal(size=na), rng.normal(size=nb)

        def costf(ai, bi):
            return np.abs(va[ai] - vb[bi])

        ai, bi = _dtw_pairs(na, nb, costf, margin)
        n = min(na, nb)
        assert ai[0] == na - n and bi[0] == nb - n
        assert ai[-1] == na - 1 and bi[-1] == nb - 1
        da, db = np.diff(ai), np.diff(bi)
        assert ((da >= 0) & (db >= 0) & ((da + db) > 0) & (da <= 1) & (db <= 1)).all()
        got = float(np.abs(va[ai] - vb[bi]).sum())
        assert abs(got - brute_cost(na, nb, costf, margin)) < 1e-9


def test_align_dtw_shifted(spark):
    # b is a shifted by one: DTW path should pair equal values, with one
    # doubled step at the boundary
    av = [0.0, 1.0, 2.0, 3.0, 4.0]
    bv = [1.0, 2.0, 3.0, 4.0, 4.0]
    a = spark.createDataFrame(list(enumerate(av)), "ai int, ax double")
    b = spark.createDataFrame(list(enumerate(bv)), "bi int, bx double")
    out = align(
        a,
        b,
        dist=lambda pa, pb: np.abs(pa["ax"].to_numpy() - pb["bx"].to_numpy()),
        margin=2,
        order_by_a=["ai"],
        order_by_b=["bi"],
    )
    pdf = out.toPandas().sort_values(["ai", "bi"])
    # total distance along path should be small (pairs mostly equal)
    total = float(np.abs(pdf["ax"] - pdf["bx"]).sum())
    assert total <= 2.0, pdf


@pytest.mark.slowstress
def test_align_memory_bound_many_large_groups():
    """VERDICT r12 "What's wrong" #1: many LARGE groups hashing to one
    task used to be concatenated into a single pandas frame before the
    per-key groupby; the chunked partition aligner keeps only the one
    open group resident. 4M rows across 100 groups (64-char payloads)
    stream through under a hard RSS budget, with every group's DP
    output correct (diagonal path for identical series). Fresh
    subprocess so peak-RSS is not polluted by the test session."""
    import json
    import subprocess
    import sys

    code = r"""
import json, os
import numpy as np
import pandas as pd
from sclera_spark.operators.align import make_partition_aligner, _dtw_pairs

PAGE = os.sysconf("SC_PAGE_SIZE")

def rss_mb():
    # CURRENT resident set, not ru_maxrss (the lifetime peak survives
    # fork/exec and would read the pytest parent's peak)
    with open("/proc/self/statm") as fh:
        return int(fh.read().split()[1]) * PAGE / (1024 * 1024)

GROUPS, PER_SIDE, CHUNK = 100, 20_000, 100_000
PAY = "x" * 64

def _group(g):
    # mirrors align()'s group body: split sides, sort, banded DP, zip
    pa = g.loc[g["side"] == 0, ["g", "ai", "ax", "av"]]
    pb = g.loc[g["side"] == 1, ["g", "bi", "bx", "bv"]]
    pa = pa.sort_values("ai").reset_index(drop=True)
    pb = pb.sort_values("bi").reset_index(drop=True)
    def cost(ai, bi):
        return np.abs(pa["ax"].to_numpy()[ai] - pb["bx"].to_numpy()[bi])
    ai, bi = _dtw_pairs(len(pa), len(pb), cost, margin=1)
    left = pa.take(ai).reset_index(drop=True)
    right = pb.take(bi).reset_index(drop=True)[["bi", "bx", "bv"]]
    return pd.concat([left, right], axis=1)

def gen_rows():
    # group-contiguous side-tagged union rows, like the sorted shuffle
    for g in range(GROUPS):
        x = np.arange(PER_SIDE, dtype=np.float64)
        yield pd.DataFrame({
            "g": g, "ai": np.arange(PER_SIDE), "ax": x, "av": PAY,
            "side": 0, "bi": -1, "bx": np.nan, "bv": None,
        })
        yield pd.DataFrame({
            "g": g, "ai": -1, "ax": np.nan, "av": None,
            "side": 1, "bi": np.arange(PER_SIDE), "bx": x, "bv": PAY,
        })

def batches():
    buf = []
    size = 0
    for f in gen_rows():
        buf.append(f)
        size += len(f)
        while size >= CHUNK:
            whole = pd.concat(buf, ignore_index=True)
            yield whole.iloc[:CHUNK]
            rest = whole.iloc[CHUNK:].reset_index(drop=True)
            buf, size = [rest], len(rest)
    if size:
        yield pd.concat(buf, ignore_index=True)

fn = make_partition_aligner(["g"], _group, None)
rows = 0
diag_ok = True
peak = rss_mb()
for frame in fn(batches()):
    rows += len(frame)
    diag_ok = diag_ok and bool((frame["ai"].to_numpy() == frame["bi"].to_numpy()).all())
    peak = max(peak, rss_mb())
print(json.dumps({"rows": rows, "diag_ok": diag_ok, "peak_mb": peak}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=".",
    )
    assert out.returncode == 0, (out.stderr[-2000:], out.stdout[-500:])
    got = json.loads(out.stdout.strip().splitlines()[-1])
    # identical series -> diagonal path, PER_SIDE pairs per group
    assert got["rows"] == 100 * 20_000 and got["diag_ok"], got
    # the old concat-the-partition path held all 4M union rows with
    # 64-char payloads resident (>500 MB); one group is ~6 MB
    assert got["peak_mb"] < 350, got
