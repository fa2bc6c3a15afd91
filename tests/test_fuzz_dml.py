"""Stateful DML fuzz: randomized INSERT / UPDATE / DELETE sequences
executed on the engine AND on a DuckDB table, with full-state comparison
after every statement.

The DML tier has been the round-over-round bug source (NULL-guard
deletes, layout-dependent COW, CASE-in-SET clause splitting — all r4
ADVICE items), and unlike the query surface it is STATEFUL: a bug
corrupts every later result. A per-statement diff against an independent
engine is the strongest harness for that class. Sequences run twice —
once on a plain managed parquet table, once after ``ALTER TABLE ... SET
FORMAT MANIFEST`` — so both storage paths must satisfy the identical
semantics.

Generated statements deliberately include the historical bug shapes:
predicates that evaluate NULL on some rows (must neither delete nor
update those rows), CASE WHEN inside SET values, multi-assignment SETs
referencing old values, and inserts with NULLs."""

from __future__ import annotations

import random

import pytest

from sclera_spark.engine import ScleraEngine

N_SEQS = 6  # per storage mode; each sequence is ~14 statements
SEQ_LEN = 14


class DGen:
    def __init__(self, rng: random.Random):
        self.rng = rng
        self.next_k = 1000

    def pick(self, seq):
        return self.rng.choice(seq)

    def stmt(self) -> str:
        kind = self.pick(
            ["insert", "insert", "update", "update", "update", "delete"]
        )
        if kind == "insert":
            rows = []
            for _ in range(self.rng.randint(1, 3)):
                k = self.next_k
                self.next_k += 1
                v = self.pick([str(k % 7), "NULL", str(-k % 5)])
                s = self.pick(["'a'", "'b''b'", "NULL", "'zz'"])
                rows.append(f"({k}, {v}, {s})")
            return f"INSERT INTO ft VALUES {', '.join(rows)}"
        if kind == "update":
            setc = self.pick(
                [
                    "v = v + 1",
                    "v = CASE WHEN v > 2 THEN v * 10 ELSE v END",
                    "s = 'u', v = v - 1",
                    "v = coalesce(v, 0)",
                    "s = CASE WHEN s IS NULL THEN 'filled' ELSE s END",
                ]
            )
            where = self.pick(
                [
                    "k % 3 = 0",
                    "v > 2",          # NULL v rows must stay untouched
                    "v IS NULL",
                    "s = 'a'",        # NULL s rows must stay untouched
                    "k IN (SELECT k FROM ft WHERE v < 2)",
                ]
            )
            return f"UPDATE ft SET {setc} WHERE {where}"
        where = self.pick(
            [
                "v < 0",              # NULL v rows survive
                "s = 'zz'",           # NULL s rows survive
                "k % 11 = 5",
                "v IS NULL AND k % 2 = 0",
            ]
        )
        return f"DELETE FROM ft WHERE {where}"


def _state(engine) -> list[tuple]:
    rows = engine.sql("SELECT k, v, s FROM ft").collect()
    return sorted((r.k, r.v, r.s) for r in rows)


def _duck_state(duck) -> list[tuple]:
    return sorted(tuple(r) for r in duck.execute("SELECT k, v, s FROM ft").fetchall())


def _run_sequence(spark, seed: int, manifest: bool):
    import duckdb

    engine = ScleraEngine(spark)
    duck = duckdb.connect()
    engine.execute("CREATE TABLE ft (k INT, v INT, s VARCHAR(20))")
    duck.execute("CREATE TABLE ft (k INTEGER, v INTEGER, s VARCHAR)")
    try:
        engine.execute("INSERT INTO ft VALUES (1, 1, 'a'), (2, NULL, 'b'), (3, 3, NULL)")
        duck.execute("INSERT INTO ft VALUES (1, 1, 'a'), (2, NULL, 'b'), (3, 3, NULL)")
        if manifest:
            engine.execute("ALTER TABLE ft SET FORMAT MANIFEST")
        gen = DGen(random.Random(seed))
        for i in range(SEQ_LEN):
            stmt = gen.stmt()
            engine.execute(stmt)
            duck.execute(stmt)
            got, exp = _state(engine), _duck_state(duck)
            assert got == exp, (
                f"seed {seed} manifest={manifest} diverged after stmt {i}:"
                f"\n  {stmt}\n  engine: {got}\n  duck:   {exp}"
            )
    finally:
        engine.execute("DROP TABLE ft")
        duck.close()


@pytest.mark.parametrize("seed", range(N_SEQS))
def test_dml_fuzz_plain(spark, tables, seed):
    _run_sequence(spark, seed, manifest=False)


@pytest.mark.parametrize("seed", range(N_SEQS))
def test_dml_fuzz_manifest(spark, tables, seed):
    _run_sequence(spark, 100 + seed, manifest=True)
