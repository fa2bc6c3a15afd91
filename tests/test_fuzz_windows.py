"""Grammar fuzz, family 3: window functions vs DuckDB.

The window tier (native OVER SQL plus the Sclera MOVAVG/MOVSTDDEV/MOVSUM
lowering in plans/frontend.py:771-791) rides one hand-written oracle
entry (`window_tier`). This family generates randomized OVER clauses —
ranking / offset / frame-agg functions crossed with partition keys,
multi-key ORDER BY with explicit NULLS placement, and the full ROWS
frame template space (including empty frames) — and executes each on the
engine AND DuckDB.

Determinism rules baked into the generator (so every divergence is a
real bug, not tie noise):
- every OVER ORDER BY ends with the unique key `i ASC` (total order);
- NULLS FIRST/LAST is always explicit (the engines' defaults differ);
- double-typed aggregates are wrapped in round(..., 6): running-window
  aggregation order differs legitimately (Spark incremental vs DuckDB
  segment tree), so last-ulp drift is not a semantics bug;
- frames stay in the ROWS template set with start <= end.

MOV* nodes emit (sclera_text, duck_text) pairs — the DuckDB side is the
definitional ROWS-frame expansion, so these seeds pin the frontend
lowering, not just native Spark behavior.
"""

from __future__ import annotations

import math
import random

import pytest

from sclera_spark.engine import ScleraEngine

N_SEEDS = 200

# 60 rows: unique pk i; group g with NULLs; small ints x with ties and
# NULLs; doubles f with NULLs; strings s with dupes/quotes/NULLs
_ROWS = []
_S = ["aa", "o'x", "B b", None, "zz", "aa", "Q(", ""]
for i in range(60):
    _ROWS.append(
        (
            i,
            None if i % 13 == 12 else i % 4,
            None if i % 7 == 6 else (i * 3) % 10,
            None if i % 11 == 10 else round(i * 0.75 - 11.5, 2),
            _S[i % len(_S)],
        )
    )


@pytest.fixture(scope="module")
def wfuzz_env(spark):
    import duckdb
    import pandas as pd

    engine = ScleraEngine(spark)
    wdf = spark.createDataFrame(_ROWS, "i int, g int, x int, f double, s string")
    engine.add_table("w", wdf)

    duck = duckdb.connect()
    wpd = pd.DataFrame(_ROWS, columns=["i", "g", "x", "f", "s"])
    for c in ("i", "g", "x"):
        wpd[c] = wpd[c].astype("Int32")
    duck.register("w", wpd)
    return engine, duck


class WGen:
    """Seeded window-query generator emitting (sclera_sql, duck_sql)."""

    def __init__(self, rng: random.Random):
        self.rng = rng

    def pick(self, seq):
        return self.rng.choice(seq)

    def order_clause(self) -> str:
        keys = []
        for _ in range(self.rng.randint(1, 2)):
            col = self.pick(["x", "f", "s", "g"])
            direction = self.pick(["ASC", "DESC"])
            nulls = self.pick(["NULLS FIRST", "NULLS LAST"])
            keys.append(f"{col} {direction} {nulls}")
        keys.append("i ASC")  # total order — ties never decide output
        return "ORDER BY " + ", ".join(keys)

    def partition_clause(self) -> str:
        return self.pick(["", "PARTITION BY g", "PARTITION BY g, s", "PARTITION BY s"])

    def frame(self) -> str:
        k, j = self.rng.randint(1, 5), self.rng.randint(0, 3)
        return self.pick(
            [
                "",
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW",
                f"ROWS BETWEEN {k} PRECEDING AND {j} FOLLOWING",
                "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND {j} FOLLOWING",
            ]
        )

    def over(self, with_frame: bool) -> str:
        parts = [self.partition_clause(), self.order_clause()]
        if with_frame:
            fr = self.frame()
            if fr:
                parts.append(fr)
        return "OVER (" + " ".join(p for p in parts if p) + ")"

    def wexpr(self) -> tuple[str, str]:
        kind = self.pick(
            ["rank", "offset", "navigate", "agg", "agg_f", "mov", "dist"]
        )
        if kind == "rank":
            fn = self.pick(["row_number()", "rank()", "dense_rank()",
                            f"ntile({self.rng.randint(1, 5)})"])
            ov = self.over(with_frame=False)
            e = f"{fn} {ov}"
            return e, e
        if kind == "dist":
            fn = self.pick(["percent_rank()", "cume_dist()"])
            ov = self.over(with_frame=False)
            e = f"{fn} {ov}"
            return e, e
        if kind == "offset":
            fn = self.pick(["lag", "lead"])
            col = self.pick(["x", "g", "i"])
            off = self.rng.randint(1, 3)
            arg = self.pick([f"{col}, {off}", f"{col}, {off}, -1", col])
            ov = self.over(with_frame=False)
            e = f"{fn}({arg}) {ov}"
            return e, e
        if kind == "navigate":
            col = self.pick(["x", "i", "g"])
            fn = self.pick(
                [f"first_value({col})", f"last_value({col})",
                 f"nth_value({col}, {self.rng.randint(1, 4)})"]
            )
            ov = self.over(with_frame=True)
            e = f"{fn} {ov}"
            return e, e
        if kind == "agg":
            col = self.pick(["x", "i", "g"])
            fn = self.pick(
                [f"sum({col})", f"min({col})", f"max({col})",
                 f"count({col})", "count(*)"]
            )
            ov = self.over(with_frame=True)
            e = f"{fn} {ov}"
            return e, e
        if kind == "agg_f":
            col = self.pick(["f", "x"])
            fn = self.pick([f"avg({col})", f"sum(f)", f"stddev_samp({col})"])
            ov = self.over(with_frame=True)
            e = f"round({fn} {ov}, 6)"
            return e, e
        # mov: Sclera MOVAVG/MOVSTDDEV/MOVSUM vs the definitional frame
        fn, duck_fn = self.pick(
            [("MOVAVG", "avg"), ("MOVSTDDEV", "stddev_samp"), ("MOVSUM", "sum")]
        )
        col = self.pick(["x", "f"])
        n = self.rng.randint(2, 6)
        part = self.partition_clause()
        order = self.order_clause()
        head = f"{part} {order}".strip()
        sclera = f"round({fn}({col}, {n}) OVER ({head}), 6)"
        duck = (
            f"round({duck_fn}({col}) OVER ({head} "
            f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW), 6)"
        )
        return sclera, duck

    def query(self) -> tuple[str, str]:
        n_exprs = self.rng.randint(2, 4)
        sc_parts, dk_parts = [], []
        for n in range(n_exprs):
            sc, dk = self.wexpr()
            sc_parts.append(f"{sc} AS w{n}")
            dk_parts.append(f"{dk} AS w{n}")
        where = self.pick(["", "WHERE x IS NOT NULL", "WHERE i % 3 <> 1",
                           "WHERE f IS NULL OR f > -5"])
        sc = f"SELECT i, {', '.join(sc_parts)} FROM w {where}"
        dk = f"SELECT i, {', '.join(dk_parts)} FROM w {where}"
        shape = self.pick(["plain", "derived", "limit"])
        if shape == "derived":
            # window output consumed by an outer filter — exercises the
            # frontend's derived-table splicing around OVER text
            sc = f"SELECT * FROM ({sc}) q WHERE i % 2 = 0"
            dk = f"SELECT * FROM ({dk}) q WHERE i % 2 = 0"
        elif shape == "limit":
            sc = f"{sc} ORDER BY i LIMIT 25"
            dk = f"{dk} ORDER BY i LIMIT 25"
        return sc, dk


def _canon(rows):
    import decimal

    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append("<NULL>")
            elif isinstance(v, bool):
                canon_row.append(str(v).lower())
            elif isinstance(v, float) and v == int(v) and abs(v) < 2**53:
                canon_row.append(str(int(v)))
            elif isinstance(v, float):
                canon_row.append(f"{v:.9g}")
            else:
                canon_row.append(str(v))
        out.append(tuple(canon_row))
    return sorted(out)


def _run_one(engine, duck, seed: int):
    gen = WGen(random.Random(seed))
    sclera_sql, duck_sql = gen.query()
    try:
        expected = duck.execute(duck_sql).fetchall()
    except Exception as exc:  # pragma: no cover — oracle-side dialect gap
        pytest.fail(f"seed {seed}: oracle rejected\n  {duck_sql}\n  {exc}")
    try:
        got = [tuple(r) for r in engine.sql(sclera_sql).collect()]
    except Exception as exc:
        pytest.fail(f"seed {seed}: engine rejected\n  {sclera_sql}\n  {exc}")
    assert _canon(got) == _canon(expected), (
        f"seed {seed} diverges\n  sclera: {sclera_sql}\n  duck:   {duck_sql}"
    )


_SHARDS = 10


@pytest.mark.parametrize("shard", range(_SHARDS))
def test_window_fuzz_shard(wfuzz_env, shard):
    engine, duck = wfuzz_env
    per = N_SEEDS // _SHARDS
    for seed in range(shard * per, (shard + 1) * per):
        _run_one(engine, duck, seed)
