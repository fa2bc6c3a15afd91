"""Grammar fuzz, family 7: join trees + subquery placement vs DuckDB.

Joins are pass-through to Spark, but the FRONT END splices rewrites
(casts, BETWEEN [SYMMETRIC], quantified comparisons, postfix ISNULL)
into queries whose FROM clause is an arbitrary join tree — and every
front-end bug so far was a splice edge in exactly this kind of context.
This family randomizes:

- join type (INNER / LEFT / RIGHT / FULL / CROSS) x condition form
  (equi ON, theta ON with AND'd inequality, USING, NATURAL), 2- and
  3-table trees, derived-table sides, self-joins with aliases;
- NULL join keys (ANSI: never match), duplicate keys (fan-out);
- subquery placement: correlated EXISTS / NOT EXISTS, IN / NOT IN with
  NULLs in the subquery (NOT IN over a NULL-bearing set is empty —
  ANSI 3VL), correlated scalar subqueries in SELECT, quantified
  comparisons over subqueries in join context;
- Sclera-dialect rewrites spliced inside the join query (``::`` casts,
  BETWEEN SYMMETRIC, postfix ISNULL) so the splicer sees join keywords
  around its operands.

Outer-join USING/NATURAL column coalescing is a dialect agreement
(both Spark and DuckDB emit the coalesced key once for FULL ... USING);
the generator selects the using column unqualified so both sides bind
the coalesced output.
"""

from __future__ import annotations

import math
import random

import pytest

from sclera_spark.engine import ScleraEngine

N_SEEDS = 200

# Overlapping key domains with NULLs and duplicates on both sides.
_J1 = []
for i in range(30):
    _J1.append(
        (
            None if i % 10 == 9 else i % 12,
            None if i % 7 == 6 else (i * 5) % 8,
            ["x", "y", "z)z", "w'w", None][i % 5],
        )
    )
_J2 = []
for i in range(25):
    _J2.append(
        (
            None if i % 8 == 7 else (i * 3) % 12,
            i % 6,
            ["p", "q", None, "r r"][i % 4],
        )
    )
_J3 = [(k % 7, k * 2) for k in range(15)] + [(None, 99)]


@pytest.fixture(scope="module")
def jfuzz_env(spark):
    import duckdb
    import pandas as pd

    engine = ScleraEngine(spark)
    engine.add_table("j1", spark.createDataFrame(_J1, "a int, b int, s string"))
    engine.add_table("j2", spark.createDataFrame(_J2, "a int, c int, t string"))
    engine.add_table("j3", spark.createDataFrame(_J3, "k int, d int"))

    duck = duckdb.connect()
    p1 = pd.DataFrame(_J1, columns=["a", "b", "s"])
    p2 = pd.DataFrame(_J2, columns=["a", "c", "t"])
    p3 = pd.DataFrame(_J3, columns=["k", "d"])
    for df, cols in ((p1, ["a", "b"]), (p2, ["a", "c"]), (p3, ["k", "d"])):
        for c in cols:
            df[c] = df[c].astype("Int32")
    duck.register("j1", p1)
    duck.register("j2", p2)
    duck.register("j3", p3)
    return engine, duck


class JGen:
    def __init__(self, rng: random.Random):
        self.rng = rng

    def pick(self, seq):
        return self.rng.choice(seq)

    # ---------------------------------------------------------- FROM trees

    def join_tree(self) -> tuple[str, list[str]]:
        """Return (from_clause, selectable column exprs)."""
        shape = self.pick(
            ["two", "two", "two", "three", "derived", "self", "natural",
             "using", "cross"]
        )
        jt = self.pick(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
        if shape == "two":
            cond = self.pick(
                ["l.a = r.a",
                 "l.a = r.a AND l.b < r.c",
                 "l.a = r.a AND r.t IS NOT NULL",
                 "l.b = r.c"]
            )
            return (
                f"j1 l {jt} j2 r ON {cond}",
                ["l.a", "l.b", "l.s", "r.a", "r.c", "r.t"],
            )
        if shape == "three":
            return (
                f"j1 l {jt} j2 r ON l.a = r.a "
                f"{self.pick(['JOIN', 'LEFT JOIN'])} j3 g ON r.c = g.k",
                ["l.a", "l.b", "r.c", "g.k", "g.d"],
            )
        if shape == "derived":
            inner = self.pick(
                ["SELECT a, count(*) AS n FROM j2 GROUP BY a",
                 "SELECT a, max(c) AS n FROM j2 WHERE t IS NOT NULL GROUP BY a",
                 "SELECT DISTINCT a, c AS n FROM j2"]
            )
            return (
                f"j1 l {jt} ({inner}) r ON l.a = r.a",
                ["l.a", "l.b", "l.s", "r.n"],
            )
        if shape == "self":
            return (
                f"j1 l {self.pick(['JOIN', 'LEFT JOIN'])} j1 r "
                f"ON l.a = r.b",
                ["l.a", "l.b", "r.a", "r.b"],
            )
        if shape == "natural":
            # j1 NATURAL JOIN j2 joins on the single shared column `a`
            nj = self.pick(["NATURAL JOIN", "NATURAL LEFT JOIN"])
            return (f"j1 {nj} j2", ["a", "b", "s", "c", "t"])
        if shape == "using":
            uj = self.pick(["JOIN", "LEFT JOIN", "FULL JOIN"])
            # unqualified `a` binds the coalesced using-column in both
            return (f"j1 {uj} j2 USING (a)", ["a", "b", "s", "c", "t"])
        return ("j1 l CROSS JOIN j3 g", ["l.a", "l.b", "g.k", "g.d"])

    # ---------------------------------------------------------- predicates

    def where(self, cols: list[str]) -> tuple[str, str]:
        """(sclera_pred, duck_pred) — may use dialect-rewritten forms."""
        intcols = [c for c in cols if c.split(".")[-1] in "abckdn"]
        c1 = self.pick(intcols)
        kind = self.pick(
            ["plain", "plain", "between", "symmetric", "isnull", "in_sub",
             "not_in_sub", "exists", "not_exists", "quant", "cast", "none",
             "none"]
        )
        if kind == "plain":
            return (f"{c1} > 2", f"{c1} > 2")
        if kind == "between":
            p = f"{c1} BETWEEN 1 AND 6"
            return (p, p)
        if kind == "symmetric":
            return (
                f"{c1} BETWEEN SYMMETRIC 6 AND 1",
                f"({c1} BETWEEN 1 AND 6 OR {c1} BETWEEN 6 AND 1)",
            )
        if kind == "isnull":
            return (f"{c1} ISNULL OR {c1} > 3", f"{c1} IS NULL OR {c1} > 3")
        if kind == "in_sub":
            p = f"{c1} IN (SELECT k FROM j3 WHERE d < 20)"
            return (p, p)
        if kind == "not_in_sub":
            # subquery WITHOUT NULLs (j3.d is never NULL below 99's pair);
            # the NULL-bearing variant is its own directed test below
            p = f"{c1} NOT IN (SELECT d FROM j3 WHERE d < 20)"
            return (p, p)
        if kind == "exists":
            p = f"EXISTS (SELECT 1 FROM j3 WHERE j3.k = {c1})"
            return (p, p)
        if kind == "not_exists":
            p = f"NOT EXISTS (SELECT 1 FROM j3 WHERE j3.k = {c1} AND j3.d > 10)"
            return (p, p)
        if kind == "quant":
            op = self.pick([">", "<=", "="])
            q = self.pick(["ANY", "ALL"])
            p = f"{c1} {op} {q} (SELECT k FROM j3 WHERE k IS NOT NULL)"
            return (p, p)
        if kind == "cast":
            return (
                f"{c1}::double > 1.5",
                f"CAST({c1} AS DOUBLE) > 1.5",
            )
        return ("", "")

    def query(self) -> tuple[str, str]:
        frm, cols = self.join_tree()
        ncols = self.rng.randint(2, min(4, len(cols)))
        sel = self.rng.sample(cols, ncols)
        sel_aliased = [f"{c} AS o{n}" for n, c in enumerate(sel)]
        s_pred, d_pred = self.where(cols)
        w_s = f"WHERE {s_pred}" if s_pred else ""
        w_d = f"WHERE {d_pred}" if d_pred else ""
        # occasionally a correlated scalar subquery in SELECT
        if self.rng.random() < 0.25:
            c = self.pick([c for c in cols if c.split(".")[-1] in "abck"])
            sub = f"(SELECT count(*) FROM j3 WHERE j3.k = {c}) AS osub"
            sel_aliased.append(sub)
        body = ", ".join(sel_aliased)
        sql_s = f"SELECT {body} FROM {frm} {w_s}"
        sql_d = f"SELECT {body} FROM {frm} {w_d}"
        return sql_s, sql_d


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
    gen = JGen(random.Random(seed))
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


_SHARDS = 8


@pytest.mark.parametrize("shard", range(_SHARDS))
def test_join_fuzz_shard(jfuzz_env, shard):
    engine, duck = jfuzz_env
    per = N_SEEDS // _SHARDS
    for seed in range(shard * per, (shard + 1) * per):
        _run_one(engine, duck, seed)


# ------------------------------------------------- directed ANSI corners


def test_not_in_null_bearing_set_is_empty(jfuzz_env):
    """NOT IN over a set containing NULL filters every row (3VL)."""
    engine, duck = jfuzz_env
    sql = "SELECT a, b FROM j1 WHERE a NOT IN (SELECT k FROM j3)"
    assert engine.sql(sql).count() == 0
    assert len(duck.execute(sql).fetchall()) == 0


def test_null_keys_never_join(jfuzz_env):
    """NULL = NULL is not a match in any join type."""
    engine, duck = jfuzz_env
    sql = (
        "SELECT count(*) AS n FROM j1 l JOIN j2 r "
        "ON l.a = r.a WHERE l.a IS NULL"
    )
    assert engine.sql(sql).collect()[0][0] == 0


def test_full_using_coalesces_key(jfuzz_env):
    """FULL JOIN ... USING emits one coalesced key column in both engines."""
    engine, duck = jfuzz_env
    sql = "SELECT a, b, c FROM j1 FULL JOIN j2 USING (a)"
    got = _canon([tuple(r) for r in engine.sql(sql).collect()])
    exp = _canon(duck.execute(sql).fetchall())
    assert got == exp
