"""Grammar fuzz, family 5: CTE chains and derived-table nesting vs DuckDB.

The front end's rewrites (``::`` casts, ILIKE, postfix ISNULL/NOTNULL,
BETWEEN, quantified comparisons) are literal-aware text splices; every
other position family (top-level, derived tables, extended clauses) has
had its own seed corpus, but WITH chains — rewrites inside CTE bodies,
CTEs referencing CTEs, a CTE consumed twice, derived tables wrapping CTE
output — had none. This family generates those shapes.

Where dialects differ the node emits a (sclera, duck) pair; everything
else is shared text. Aggregation keys make results deterministic without
ORDER BY (the harness compares canonically sorted rows)."""

from __future__ import annotations

import math
import random

import pytest

from sclera_spark.engine import ScleraEngine

N_SEEDS = 120

_ROWS = []
_S = ["aa", "b(b", None, "c'c", "aa", "dd%"]
for i in range(40):
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
def cfuzz_env(spark):
    import duckdb
    import pandas as pd

    engine = ScleraEngine(spark)
    cdf = spark.createDataFrame(_ROWS, "i int, g int, x int, f double, s string")
    engine.add_table("ct", cdf)

    duck = duckdb.connect()
    cpd = pd.DataFrame(_ROWS, columns=["i", "g", "x", "f", "s"])
    for c in ("i", "g", "x"):
        cpd[c] = cpd[c].astype("Int32")
    duck.register("ct", cpd)
    return engine, duck


class CGen:
    def __init__(self, rng: random.Random):
        self.rng = rng

    def pick(self, seq):
        return self.rng.choice(seq)

    def expr_pair(self) -> tuple[str, str, str]:
        """(alias, sclera_expr, duck_expr) — rewrite-surface expressions
        inside CTE bodies."""
        n = self.rng.randint(0, 9)
        kind = self.pick(["cast", "ilike", "isnull", "between", "case", "plain"])
        if kind == "cast":
            e = self.pick(["i::DOUBLE", "x::BIGINT", "(i + 1)::DOUBLE", "f::VARCHAR"])
            return "c", e, e
        if kind == "ilike":
            e = f"(s ILIKE '%a%')"
            return "c", e, e
        if kind == "isnull":
            col = self.pick(["x", "f", "s"])
            which = self.pick(["ISNULL", "NOTNULL"])
            duck = f"({col} IS {'NULL' if which == 'ISNULL' else 'NOT NULL'})"
            return "c", f"({col} {which})", duck
        if kind == "between":
            e = f"(x BETWEEN {n % 4} AND {n % 4 + 3})"
            return "c", e, e
        if kind == "case":
            e = f"CASE WHEN x > {n} THEN 'hi' WHEN x IS NULL THEN 'nn' ELSE 'lo' END"
            return "c", e, e
        e = self.pick(["i + x", "f * 2", "g"])
        return "c", e, e

    def cte_body(self, src: str, idx: int) -> tuple[str, str]:
        alias, se, de = self.expr_pair()
        where_s, where_d = self.pick(
            [
                ("", ""),
                ("WHERE x IS NOT NULL", "WHERE x IS NOT NULL"),
                ("WHERE i % 3 <> 1", "WHERE i % 3 <> 1"),
                ("WHERE s NOTNULL", "WHERE s IS NOT NULL"),
            ]
        )
        body_s = f"SELECT i, g, x, f, s, {se} AS c{idx} FROM {src} {where_s}"
        body_d = f"SELECT i, g, x, f, s, {de} AS c{idx} FROM {src} {where_d}"
        return body_s, body_d

    def query(self) -> tuple[str, str]:
        depth = self.rng.randint(1, 3)
        parts_s, parts_d = [], []
        src = "ct"
        for d in range(depth):
            bs, bd = self.cte_body(src, d)
            parts_s.append(f"w{d} AS ({bs})")
            parts_d.append(f"w{d} AS ({bd})")
            src = f"w{d}"
        last = f"w{depth - 1}"
        shape = self.pick(["agg", "self_join", "derived", "reuse_first"])
        if shape == "agg":
            tail = (
                f"SELECT g, count(*) AS n, count(c{depth - 1}) AS nc "
                f"FROM {last} GROUP BY g"
            )
            tail_s = tail_d = tail
        elif shape == "self_join":
            tail_s = tail_d = (
                f"SELECT a.i, a.c{depth - 1} AS ca, b.c{depth - 1} AS cb "
                f"FROM {last} a JOIN {last} b ON a.i = b.i"
            )
        elif shape == "derived":
            tail_s = tail_d = (
                f"SELECT q.i, q.c{depth - 1} FROM "
                f"(SELECT * FROM {last} WHERE i % 2 = 0) q"
            )
        else:
            # the first CTE consumed again next to the last one
            tail_s = tail_d = (
                f"SELECT a.i, a.c0 AS first_c, b.c{depth - 1} AS last_c "
                f"FROM w0 a JOIN {last} b ON a.i = b.i"
            )
        sc = "WITH " + ", ".join(parts_s) + " " + tail_s
        dk = "WITH " + ", ".join(parts_d) + " " + tail_d
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
    gen = CGen(random.Random(seed))
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


_SHARDS = 6


@pytest.mark.parametrize("shard", range(_SHARDS))
def test_cte_fuzz_shard(cfuzz_env, shard):
    engine, duck = cfuzz_env
    per = N_SEEDS // _SHARDS
    for seed in range(shard * per, (shard + 1) * per):
        _run_one(engine, duck, seed)
