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
        r = self.rng.random()
        if r < 0.35:
            # wrap the whole extended query as a derived table under an
            # outer projection — the splice position that used to break
            sclera = f"SELECT * FROM ({sclera}) __w"
            duck = f"SELECT * FROM ({duck}) __w"
        elif r < 0.55:
            # extended clause inside a CTE body, consumed by a plain tail
            # (exercises the CTE-hoisting path in frontend.lower_sql)
            sclera = f"WITH __c AS ({sclera}) SELECT * FROM __c"
            duck = f"WITH __c AS ({duck}) SELECT * FROM __c"
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


# ------------------------------------------------- MATCH semantic fuzz
# Patterns of the run-decomposable family (maximal mid-label run +
# immediate terminal, optional immediately-preceding prefix) have an
# independent window-SQL ground truth — the same decomposition that
# backs the labeled_fn_sql / match_alternation driver oracles, here
# parameterized over label choices so the NFA is checked against DuckDB
# on many pattern instances, not two.

_EVENT_LABELS = ["view", "click", "purchase", "error", "signup"]


class MatchGen:
    def __init__(self, rng: random.Random):
        self.rng = rng

    def query(self) -> tuple[str, str]:
        mids = self.rng.sample(_EVENT_LABELS, k=self.rng.randint(1, 2))
        terms = self.rng.sample(
            [l for l in _EVENT_LABELS if l not in mids], k=self.rng.randint(1, 2)
        )
        prefix = self.rng.random() < 0.5
        pre_choices = [l for l in _EVENT_LABELS if l not in mids and l not in terms]
        pre = self.rng.choice(pre_choices) if prefix and pre_choices else None

        mid_pat = "(" + " | ".join(m.upper() for m in mids) + ")+"
        term_pat = "(" + " | ".join(t.upper() for t in terms) + ")"
        pat = f"{mid_pat} {term_pat}"
        if pre:
            # optional prefix via alternation with an always-empty branch
            pat = f"({pre.upper()} | ABSENT?) {pat}"

        sclera = f"""
            SELECT user_id, match_id, count(*) AS n_rows,
                   min(ts) AS first_ts, max(ts) AS last_ts
            FROM events ORDERED BY (ts, event_id) PARTITION BY user_id
                 MATCH '{pat}' ON event_type
            GROUP BY user_id, match_id
        """
        mid_in = ", ".join(f"'{m}'" for m in mids)
        term_in = ", ".join(f"'{t}'" for t in terms)
        pre_join = (
            f"""LEFT JOIN e s ON s.user_id = r.user_id AND s.rn = r.rn_lo - 1
                  AND s.event_type = '{pre}'"""
            if pre
            else "LEFT JOIN e s ON FALSE"
        )
        duck = f"""
            WITH e AS (
              SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events
            ),
            r0 AS (
              SELECT *, rn - row_number() OVER (PARTITION BY user_id
                                                ORDER BY rn) AS grp
              FROM e WHERE event_type IN ({mid_in})
            ),
            runs AS (
              SELECT user_id, grp, min(rn) AS rn_lo, max(rn) AS rn_hi,
                     count(*) AS n_mid,
                     min(ts) AS mid_min_ts, max(ts) AS mid_max_ts
              FROM r0 GROUP BY user_id, grp
            ),
            m AS (
              SELECT r.user_id, r.rn_lo, r.n_mid, r.mid_min_ts, r.mid_max_ts,
                     t.ts AS term_ts, s.rn AS srn, s.ts AS s_ts
              FROM runs r
              JOIN e t ON t.user_id = r.user_id AND t.rn = r.rn_hi + 1
                      AND t.event_type IN ({term_in})
              {pre_join}
            )
            SELECT user_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY rn_lo) - 1
                     AS match_id,
                   n_mid + 1 + CASE WHEN srn IS NOT NULL THEN 1 ELSE 0 END
                     AS n_rows,
                   least(s_ts, mid_min_ts, term_ts) AS first_ts,
                   greatest(mid_max_ts, term_ts) AS last_ts
            FROM m
        """
        return sclera, duck


N_MATCH_SEEDS = 30


@pytest.mark.parametrize("shard", range(3))
def test_fuzz_match_run_family(engine, duck, shard):
    for seed in range(shard, N_MATCH_SEEDS, 3):
        gen = MatchGen(random.Random(seed))
        sclera_sql, duck_sql = gen.query()
        expected = duck.execute(duck_sql).fetchall()
        got = [tuple(r) for r in engine.sql(sclera_sql).collect()]
        if _canon(got) != _canon(expected):
            pytest.fail(
                f"seed {seed}: MATCH mismatch ({len(got)} vs "
                f"{len(expected)} rows)\n  {sclera_sql}"
            )
