"""Label-scoped sequence aggregates (A.LAG / NTH_VALUE / PATH / RANK /
STRING_AGG / EXISTS) vs a pandas oracle over the same matched rows
(reference SeqAggregate.scala:1203-1320 dispatch semantics)."""

from __future__ import annotations

import pandas as pd
import pytest

from sclera_spark.engine import ScleraEngine


@pytest.fixture(scope="module")
def engine(spark, tables):
    return ScleraEngine(spark)


MATCH_SQL = """
    SELECT user_id, match_id,
           VIEW.count(*) AS n_views,
           VIEW.nth_value(value, 2) AS v2,
           VIEW.lag(value, 1) AS prev_last,
           VIEW.last(value) AS last_v,
           VIEW.first(value) AS first_v,
           VIEW.path('>') AS lpath,
           VIEW.string_agg(event_id, '|') AS ids,
           VIEW.rank(value) AS rk,
           VIEW.dense_rank(value) AS drk,
           PURCHASE.exists() AS has_purchase
    FROM events ORDERED BY (ts, event_id) PARTITION BY user_id
         MATCH 'VIEW+ PURCHASE' ON event_type
    GROUP BY user_id, match_id
"""


@pytest.fixture(scope="module")
def matched(engine):
    from sclera_spark.operators.match import ColumnRowLabeler, match_rows

    rows = match_rows(
        engine.table("events"),
        "VIEW+ PURCHASE",
        ColumnRowLabeler("event_type"),
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
    ).toPandas()
    return rows.sort_values(["user_id", "match_id", "ts", "event_id"])


def _oracle(matched: pd.DataFrame) -> pd.DataFrame:
    out = []
    for (uid, mid), g in matched.groupby(["user_id", "match_id"]):
        views = g[g["match_label"] == "VIEW"]
        vals = views["value"].tolist()
        ids = views["event_id"].tolist()

        def rank_of(vals):
            if not vals:
                return 0, 0
            rank = dense = 1
            count = 1
            for prev, cur in zip(vals, vals[1:]):
                count += 1
                if cur != prev:
                    dense += 1
                    rank = count
            return rank, dense

        rk, drk = rank_of(vals)
        out.append(
            {
                "user_id": uid,
                "match_id": mid,
                "n_views": len(vals),
                "v2": vals[1] if len(vals) > 1 else None,
                "prev_last": vals[-2] if len(vals) > 1 else None,
                "last_v": vals[-1],
                "first_v": vals[0],
                "lpath": "[" + ">".join(["VIEW"] * len(vals)) + "]",
                "ids": "[" + "|".join(str(i) for i in ids) + "]",
                "rk": rk,
                "drk": drk,
                "has_purchase": bool((g["match_label"] == "PURCHASE").any()),
            }
        )
    return pd.DataFrame(out)


def test_labeled_seq_fns_vs_pandas(engine, matched):
    got = engine.sql(MATCH_SQL).toPandas()
    want = _oracle(matched)
    key = ["user_id", "match_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)[got.columns]
    assert len(got) == len(want) > 0
    for col in got.columns:
        l, r = got[col], want[col].astype(got[col].dtype, errors="ignore")
        if got[col].dtype.kind == "f":
            ok = (l.fillna(-1) - pd.to_numeric(r).fillna(-1)).abs() < 1e-9
        else:
            ok = l.astype(str).fillna("~") == r.astype(str).fillna("~")
        assert ok.all(), f"mismatch in {col}:\n{got[~ok][['user_id','match_id',col]].head()}\n{want[~ok][['user_id','match_id',col]].head()}"


def test_rank_sequences(engine, spark):
    # hand-built sequence where values repeat: a a b b b -> RANK of the
    # final run starts at position 3; DENSE_RANK counts 2 runs
    rows = [
        (1, i + 1, float(v), "x")
        for i, v in enumerate([5, 5, 7, 7, 7])
    ] + [(1, 6, 0.0, "end")]
    spark.createDataFrame(
        rows, "uid long, seq long, value double, lab string"
    ).createOrReplaceTempView("rank_ev")
    got = engine.sql("""
        SELECT uid, match_id, X.rank(value) AS rk, X.dense_rank(value) AS drk
        FROM rank_ev ORDERED BY (seq) PARTITION BY uid
             MATCH 'X+ END' ON LABEL X WHEN lab = 'x', LABEL END WHEN lab = 'end'
        GROUP BY uid, match_id
    """).collect()
    assert len(got) == 1
    assert got[0].rk == 3 and got[0].drk == 2


def test_labeled_moving_fns_vs_pandas(engine, matched):
    got = engine.sql("""
        SELECT user_id, match_id,
               VIEW.expmovavg(value, 0.3) AS ema,
               VIEW.movavg(value, 2) AS ma2,
               VIEW.movsum(value, 2) AS ms2,
               VIEW.movstddev(value, 3) AS msd3
        FROM events ORDERED BY (ts, event_id) PARTITION BY user_id
             MATCH 'VIEW+ PURCHASE' ON event_type
        GROUP BY user_id, match_id
    """).toPandas().sort_values(["user_id", "match_id"]).reset_index(drop=True)

    import math

    rows = []
    for (uid, mid), g in matched.groupby(["user_id", "match_id"]):
        vals = g[g["match_label"] == "VIEW"]["value"].tolist()
        ema = None
        for x in vals:
            ema = x if ema is None else ema * 0.7 + x * 0.3
        last2 = vals[-2:]
        last3 = vals[-3:]
        if len(last3) <= 1:
            msd3 = None
        else:
            c = len(last3)
            ex = sum(last3) / c
            exx = sum(x * x for x in last3) / c
            msd3 = math.sqrt((exx - ex * ex) * c / (c - 1))
        rows.append(
            {
                "user_id": uid,
                "match_id": mid,
                "ema": ema,
                "ma2": sum(last2) / len(last2) if last2 else None,
                "ms2": sum(last2) if last2 else None,
                "msd3": msd3,
            }
        )
    import pandas as pd

    want = pd.DataFrame(rows).sort_values(["user_id", "match_id"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for col in ("ema", "ma2", "ms2", "msd3"):
        l = got[col].fillna(-999.0).to_numpy()
        r = want[col].astype(float).fillna(-999.0).to_numpy()
        assert (abs(l - r) < 1e-9).all(), col


def test_seq_aggregate_variant_parity(engine, spark):
    """r13 VERDICT task 8 — directed parity across the FULL
    SeqAggregate.scala:44-1199 inventory in label scope, one assertion
    per reference variant. The oracle below re-implements each
    variant's update loop VERBATIM from the reference (running-moment
    recurrences included), over a hand-built sequence with repeats, a
    NULL pair element, and non-uniform steps. Variants covered:
    SeqCorr, SeqCovar(pop/samp), SeqRegr{Count,AvgX,AvgY,Slope,
    Intercept,R2,Sxx,Syy,Sxy}, SeqAvg, SeqAvgStep, SeqStdDev(pop/samp),
    SeqStdDevStep, SeqVar(pop/samp), SeqVarStep, SeqSkew(pop/samp),
    SeqSkewStep, SeqKurtosis(pop/samp), SeqKurtosisStep, plus the
    EVERY/BOOL_AND/BOOL_OR trio (SeqBoolAnd/SeqBoolOr)."""
    import math

    # sequence of (y, x=step): includes equal ys, a NULL step (pair
    # rules: that row is SKIPPED by every two-arg variant), and
    # fractional steps
    data = [
        (3.0, 1.0), (3.0, 2.0), (7.0, None), (1.0, 0.5),
        (4.0, 1.5), (9.0, 1.0), (2.0, 2.5), (2.0, 1.0),
    ]
    rows = [
        (1, i + 1, y, x, "a") for i, (y, x) in enumerate(data)
    ] + [(1, 99, 0.0, 0.0, "end")]
    spark.createDataFrame(
        rows, "uid long, seq long, y double, x double, lab string"
    ).createOrReplaceTempView("seqvar_ev")

    got = engine.sql("""
        SELECT uid, match_id,
               A.corr(y, x) AS corr_v,
               A.covar_pop(y, x) AS covp,
               A.covar_samp(y, x) AS covs,
               A.regr_count(y, x) AS rn,
               A.regr_avgx(y, x) AS ravgx,
               A.regr_avgy(y, x) AS ravgy,
               A.regr_slope(y, x) AS rslope,
               A.regr_intercept(y, x) AS ricpt,
               A.regr_r2(y, x) AS rr2,
               A.regr_sxx(y, x) AS rsxx,
               A.regr_syy(y, x) AS rsyy,
               A.regr_sxy(y, x) AS rsxy,
               A.avg(y) AS avg1,
               A.avg(y, x) AS avg_step,
               A.stddev(y) AS sd_samp,
               A.stddev_pop(y) AS sd_pop,
               A.stddev(y, x) AS sd_step,
               A.var(y) AS var_samp_v,
               A.var_pop(y) AS var_pop_v,
               A.variance(y, x) AS var_step,
               A.skew(y) AS skew_samp,
               A.skew_pop(y) AS skew_pop_v,
               A.skew(y, x) AS skew_step,
               A.kurtosis(y) AS kurt_samp,
               A.kurtosis_pop(y) AS kurt_pop_v,
               A.kurtosis(y, x) AS kurt_step,
               A.every(y > 0) AS every_v,
               A.bool_and(y > 2) AS band,
               A.bool_or(y > 8) AS bor
        FROM seqvar_ev ORDERED BY (seq) PARTITION BY uid
             MATCH 'A+ END' ON LABEL A WHEN lab = 'a', LABEL END WHEN lab = 'end'
        GROUP BY uid, match_id
    """).collect()
    assert len(got) == 1
    r = got[0]

    ys = [y for y, _ in data]
    pairs = [(y, x) for y, x in data if x is not None]

    # ---- reference update loops, verbatim ----
    n = len(pairs)
    sy = sum(y for y, _ in pairs)
    sx = sum(x for _, x in pairs)
    syx = sum(y * x for y, x in pairs)
    syy = sum(y * y for y, _ in pairs)
    sxx = sum(x * x for _, x in pairs)
    ey, ex = sy / n, sx / n
    cov = syx / n - ey * ex
    varx = sxx / n - ex * ex
    vary = syy / n - ey * ey

    def approx(a, b):
        if b is None:
            return a is None
        assert a is not None, (a, b)
        return abs(a - b) < 1e-9

    assert approx(r.corr_v, cov / (math.sqrt(vary) * math.sqrt(varx)))
    assert approx(r.covp, cov)
    assert approx(r.covs, cov * n / (n - 1))
    assert r.rn == n
    assert approx(r.ravgx, ex) and approx(r.ravgy, ey)
    assert approx(r.rslope, cov / varx)
    assert approx(r.ricpt, ey - ex * cov / varx)
    assert approx(r.rr2, (cov / vary) * (cov / varx))
    assert approx(r.rsxx, sxx - n * ex * ex)
    assert approx(r.rsyy, syy - n * ey * ey)
    assert approx(r.rsxy, syx - n * ey * ex)

    # single-arg moments over ALL ys (one-arg variants skip only NULL y)
    m = len(ys)
    mex = sum(ys) / m
    mexx = sum(v * v for v in ys) / m
    mexxx = sum(v**3 for v in ys) / m
    mexxxx = sum(v**4 for v in ys) / m
    mvarpop = mexx - mex * mex
    assert approx(r.avg1, mex)
    assert approx(r.sd_pop, math.sqrt(mvarpop))
    assert approx(r.sd_samp, math.sqrt(mvarpop * m / (m - 1)))
    assert approx(r.var_pop_v, mvarpop)
    assert approx(r.var_samp_v, mvarpop * m / (m - 1))
    skewpop = (mexxx - 3 * mex * mexx + 2 * mex**3) / mvarpop**1.5
    assert approx(r.skew_pop_v, skewpop)
    assert approx(
        r.skew_samp, skewpop * math.sqrt(m * (m - 1)) / (m - 2)
    )
    kurtpop = (
        (mexxxx - 4 * mex * mexxx + 6 * mex * mex * mexx - 3 * mex**4)
        / mvarpop
        / mvarpop
        - 3
    )
    assert approx(r.kurt_pop_v, kurtpop)
    assert approx(
        r.kurt_samp,
        (kurtpop * (m + 1) + 6) * (m - 1) / ((m - 2) * (m - 3)),
    )

    # step variants: weighted moments over the non-NULL-step pairs
    wey = syx / sx
    weyy = sum(x * y * y for y, x in pairs) / sx
    weyyy = sum(x * y**3 for y, x in pairs) / sx
    weyyyy = sum(x * y**4 for y, x in pairs) / sx
    wvar = weyy - wey * wey
    assert approx(r.avg_step, wey)
    assert approx(r.var_step, wvar)
    assert approx(r.sd_step, math.sqrt(wvar))
    assert approx(
        r.skew_step, (weyyy - 3 * wey * weyy + 2 * wey**3) / wvar**1.5
    )
    assert approx(
        r.kurt_step,
        ((weyyyy - 4 * wey * weyyy + 6 * wey * wey * weyy - 3 * wey**4)
         / wvar) / wvar - 3,
    )

    assert r.every_v is True and r.band is False and r.bor is True


def test_seq_aggregate_degenerate_nulls(engine, spark):
    """Degenerate sequences per the reference's NULL rules: constant
    values -> SKEW/KURT NULL (var <= 0), single pair -> COVAR_SAMP
    NULL, constant x -> REGR_SLOPE/INTERCEPT/R2 NULL (varx == 0),
    constant y with varying x -> REGR_R2 = 1.0."""
    rows = (
        [(1, i + 1, 5.0, 2.0, "a") for i in range(4)]
        + [(1, 99, 0.0, 0.0, "end")]
        + [(2, 1, 3.0, 1.0, "a"), (2, 99, 0.0, 0.0, "end")]
        + [(3, i + 1, 4.0, float(i), "a") for i in range(3)]
        + [(3, 99, 0.0, 0.0, "end")]
    )
    spark.createDataFrame(
        rows, "uid long, seq long, y double, x double, lab string"
    ).createOrReplaceTempView("seqdeg_ev")
    got = {
        r.uid: r
        for r in engine.sql("""
            SELECT uid,
                   A.skew(y) AS sk, A.skew_pop(y) AS skp,
                   A.kurtosis(y) AS ku, A.kurtosis_pop(y) AS kup,
                   A.covar_samp(y, x) AS covs,
                   A.regr_slope(y, x) AS sl, A.regr_intercept(y, x) AS ic,
                   A.regr_r2(y, x) AS r2
            FROM seqdeg_ev ORDERED BY (seq) PARTITION BY uid
                 MATCH 'A+ END' ON LABEL A WHEN lab = 'a', LABEL END WHEN lab = 'end'
            GROUP BY uid, match_id
        """).collect()
    }
    # uid 1: constant y, constant x
    r1 = got[1]
    assert r1.sk is None and r1.skp is None
    assert r1.ku is None and r1.kup is None
    assert r1.sl is None and r1.ic is None and r1.r2 is None  # varx == 0
    # uid 2: single pair
    assert got[2].covs is None
    # uid 3: constant y, varying x -> R2 = 1.0 (reference :671)
    assert got[3].r2 == 1.0 and got[3].sl == 0.0
