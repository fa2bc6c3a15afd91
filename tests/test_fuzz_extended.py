"""Seeded fuzz over the EXTENDED-clause surface (SPLIT / PIVOT / ARG /
UNPIVOT) in varying positions — direct table, derived table, and wrapped
inside a derived table under an outer SELECT — against parametric DuckDB
oracles.

Rationale: every front-end bug found in rounds 1-5 lived in the
tokenizer/splice layer, and tests/test_fuzz_frontend.py already sweeps
the scalar/predicate rewrites; this file sweeps the other historically
risky half, the extended-clause tokenizer (plans/extended.py), varying
the degrees of freedom a template-free test suite fixes: clause
position, alias names, partition keys, aggregate choices, label sets,
and upstream predicates.
"""

from __future__ import annotations

import random

import pytest

from sclera_spark.engine import ScleraEngine

from tests.test_fuzz_frontend import _canon


@pytest.fixture(scope="module")
def engine(spark, tables):
    return ScleraEngine(spark)


class ExtGen:
    """Seeded generator: (sclera_sql, duck_sql) for one extended clause."""

    def __init__(self, rng: random.Random):
        self.rng = rng

    def pick(self, seq):
        return self.rng.choice(seq)

    # -- degrees of freedom ------------------------------------------------

    def ev_filter(self) -> str:
        return self.pick(
            [
                "user_id < 40",
                "value > 20",
                "event_type IN ('view', 'click')",
                "user_id % 3 = 0",
                "value BETWEEN 5 AND 180",
            ]
        )

    def names(self) -> tuple[str, str]:
        return self.pick([("s", "e"), ("a_lo", "a_hi"), ("x0", "x1")])

    # -- templates ---------------------------------------------------------

    def split(self) -> tuple[str, str]:
        w = self.ev_filter()
        span = self.pick([1, 7, 10, 37])
        lo_n, hi_n = self.names()
        p = self.pick(["user_id", "event_type"])
        src = (
            f"SELECT {p}, event_id, value AS lo, value + {span} AS hi "
            f"FROM events WHERE {w}"
        )
        sclera = (
            f"SELECT {p}, event_id, {lo_n}, {hi_n} FROM ({src}) "
            f"PARTITION BY {p} SPLIT (lo, hi) INTO ({lo_n}, {hi_n})"
        )
        duck = f"""
            WITH iv AS ({src}),
            b AS (SELECT DISTINCT {p}, b FROM (
                SELECT {p}, lo AS b FROM iv UNION SELECT {p}, hi FROM iv)),
            atoms AS (SELECT {p}, b AS {lo_n},
                             lead(b) OVER (PARTITION BY {p} ORDER BY b)
                               AS {hi_n} FROM b)
            SELECT iv.{p}, iv.event_id, atoms.{lo_n}, atoms.{hi_n}
            FROM iv JOIN atoms ON iv.{p} = atoms.{p}
            WHERE atoms.{hi_n} IS NOT NULL
              AND iv.lo <= atoms.{lo_n} AND atoms.{hi_n} <= iv.hi
        """
        return sclera, duck

    def pivot(self) -> tuple[str, str]:
        w = self.ev_filter()
        agg = self.pick(["SUM", "MIN", "MAX", "COUNT"])
        labels = self.rng.sample(["view", "click", "purchase", "error"], k=self.rng.randint(2, 3))
        p = "user_id"
        aliases = [f"c_{l}" for l in labels]
        in_list = ", ".join(f"'{l}' AS {a}" for l, a in zip(labels, aliases))
        derived = self.rng.random() < 0.5
        src = f"SELECT user_id, event_type, value FROM events WHERE {w}"
        frm = f"({src})" if derived else f"events WHERE_MARK"
        sclera = (
            f"SELECT * FROM {frm} PARTITION BY {p} "
            f"PIVOT {agg}(value) FOR event_type IN ({in_list})"
        )
        # non-derived position carries the WHERE inside the FROM clause
        sclera = sclera.replace(
            "events WHERE_MARK", f"(SELECT * FROM events WHERE {w})"
        )
        cases = ", ".join(
            f"{agg}(CASE WHEN event_type = '{l}' THEN value END) AS {a}"
            for l, a in zip(labels, aliases)
        )
        duck = f"SELECT user_id, {cases} FROM ({src}) g GROUP BY user_id"
        return sclera, duck

    def arg(self) -> tuple[str, str]:
        p = self.pick(["o_orderstatus", "o_orderpriority"])
        specs = self.pick([["MAX"], ["MIN"], ["MAX", "MIN"]])
        # optimize over the partition-unique key so tie-breaks cannot
        # differ between engines
        spec_sql = ", ".join(f"{s}(o_orderkey)" for s in specs)
        sclera = (
            f"SELECT o_orderkey, o_custkey FROM orders "
            f"PARTITION BY {p} ARG ({spec_sql})"
        )
        parts = [
            f"""
            SELECT o_orderkey, o_custkey
            FROM (SELECT *, row_number() OVER (PARTITION BY {p}
                      ORDER BY o_orderkey {'DESC' if s == 'MAX' else 'ASC'}) rn
                  FROM orders) t WHERE rn = 1
            """
            for s in specs
        ]
        return sclera, " UNION ALL ".join(parts)

    def unpivot(self) -> tuple[str, str]:
        k_n = self.pick(["k", "metric"])
        v_n = self.pick(["v", "val"])
        w = self.pick(["p_partkey <= 120", "p_size > 20", "p_retailprice < 1500"])
        sclera = (
            f"SELECT p_partkey, {k_n}, {v_n} "
            f"FROM (SELECT p_partkey, p_size, p_retailprice FROM part "
            f"WHERE {w}) UNPIVOT {v_n} FOR {k_n} IN (p_size, p_retailprice)"
        )
        duck = f"""
            SELECT p_partkey, 'p_size' AS {k_n},
                   CAST(p_size AS DOUBLE) AS {v_n}
            FROM part WHERE {w}
            UNION ALL
            SELECT p_partkey, 'p_retailprice', p_retailprice
            FROM part WHERE {w}
        """
        return sclera, duck

    def query(self) -> tuple[str, str]:
        kind = self.pick(["split", "pivot", "arg", "unpivot"])
        sclera, duck = getattr(self, kind)()
        if self.rng.random() < 0.35:
            # wrap the whole extended query as a derived table under an
            # outer projection — the splice position that used to break
            sclera = f"SELECT * FROM ({sclera}) __w"
            duck = f"SELECT * FROM ({duck}) __w"
        return sclera, duck


def _run_one(engine, duck, seed: int):
    gen = ExtGen(random.Random(seed))
    sclera_sql, duck_sql = gen.query()
    try:
        expected = duck.execute(duck_sql).fetchall()
    except Exception as exc:  # pragma: no cover — oracle-side dialect gap
        pytest.fail(f"seed {seed}: oracle rejected\n  {duck_sql}\n  {exc}")
    try:
        got = [tuple(r) for r in engine.sql(sclera_sql).collect()]
    except Exception as exc:
        pytest.fail(f"seed {seed}: engine rejected\n  {sclera_sql}\n  {exc}")
    if _canon(got) != _canon(expected):
        pytest.fail(
            f"seed {seed}: result mismatch ({len(got)} vs {len(expected)} "
            f"rows)\n  {sclera_sql}\n  {duck_sql}"
        )


N_SEEDS = 144
SHARDS = 6


@pytest.mark.parametrize("shard", range(SHARDS))
def test_fuzz_extended_shard(engine, duck, shard):
    for seed in range(shard, N_SEEDS, SHARDS):
        _run_one(engine, duck, 10_000 + seed)
