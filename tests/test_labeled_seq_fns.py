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
