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


def _run_sequence(
    spark, seed: int, manifest: bool, cas: bool = False, cas_store=None
):
    import duckdb

    engine = ScleraEngine(spark)
    duck = duckdb.connect()
    if cas_store is not None:
        # swap the DDL layer's pointer store (default: warehouse FileCas)
        # for an object-store adapter over a contract-faithful fake —
        # the SAME SQL surface then commits through S3Cas/DynamoCas
        engine.ddl()._cas = cas_store
    engine.execute("CREATE TABLE ft (k INT, v INT, s VARCHAR(20))")
    duck.execute("CREATE TABLE ft (k INTEGER, v INTEGER, s VARCHAR)")
    try:
        engine.execute("INSERT INTO ft VALUES (1, 1, 'a'), (2, NULL, 'b'), (3, 3, NULL)")
        duck.execute("INSERT INTO ft VALUES (1, 1, 'a'), (2, NULL, 'b'), (3, 3, NULL)")
        if manifest:
            engine.execute(
                "ALTER TABLE ft SET FORMAT MANIFEST"
                + (" CAS" if cas else "")
            )
        gen = DGen(random.Random(seed))
        maint = random.Random(seed * 31 + 7)
        for i in range(SEQ_LEN):
            stmt = gen.stmt()
            engine.execute(stmt)
            duck.execute(stmt)
            if manifest and maint.random() < 0.3:
                # maintenance ops are state-INVISIBLE: interleave them
                # engine-only (no DuckDB counterpart) and the state diff
                # below must still hold — compaction/clustering/vacuum
                # racing DML is exactly where a wrong file swap would
                # corrupt every later statement
                mstmt = maint.choice(
                    [
                        "OPTIMIZE ft TARGET 64 MB",
                        "OPTIMIZE ft TARGET 64 MB SORT BY (k)",
                        "VACUUM ft",
                        "VACUUM ft RETAIN 2 VERSIONS",
                    ]
                )
                engine.execute(mstmt)
                stmt = f"{stmt}  [+ {mstmt}]"
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


@pytest.mark.parametrize("seed", range(N_SEQS))
def test_dml_fuzz_manifest_cas(spark, tables, seed):
    """Third storage mode: the lock-free CAS commit loop (FileCas-backed
    CasManifestTable via ALTER ... SET FORMAT MANIFEST CAS) under the
    same randomized DML + maintenance interleavings as flock manifests —
    a stale-snapshot recompute or claim-heal bug diverges the state diff
    immediately."""
    _run_sequence(spark, 200 + seed, manifest=True, cas=True)


@pytest.mark.parametrize("backend", ["s3", "s3_conflict", "dynamo", "gcs"])
@pytest.mark.parametrize("seed", range(3))
@pytest.mark.slowstress
def test_dml_fuzz_manifest_cas_object_stores(spark, tables, seed, backend):
    """Same stateful fuzz, commit point on the OBJECT-STORE adapters:
    S3Cas (incl. the 409 ambiguous-outcome injection) and DynamoCas over
    the contract-faithful fakes — the full DML+maintenance surface runs
    through conditional-put commits exactly as it would against AWS."""
    from tests.test_manifest_cas import make_cas

    store = make_cas(backend, None)  # s3/dynamo kinds ignore tmp_path
    _run_sequence(spark, 300 + seed, manifest=True, cas=True, cas_store=store)


# ------------------------------------------------------------- MERGE fuzz


class MGen:
    """Randomized MERGE statements + their decomposed DuckDB oracle.

    DuckDB 1.0 has no MERGE, but MERGE's pre-state semantics decompose
    exactly: snapshot the pre-merge key set, apply the matched clause as
    UPDATE ... FROM / DELETE ... USING (a non-TRUE guard excludes the
    row in both engines), then insert source rows whose key was not in
    the PRE-state (so a matched-then-deleted key must not re-insert)."""

    def __init__(self, rng: random.Random):
        self.rng = rng

    def pick(self, seq):
        return self.rng.choice(seq)

    def gen(self):
        keys = self.rng.sample(range(1, 13), self.rng.randint(4, 6))
        rows = []
        for i, k in enumerate(keys):
            # each source column keeps at least one non-NULL so VALUES
            # type inference works on both engines
            nv = "NULL" if (self.rng.random() < 0.3 and i > 0) else str(
                self.rng.randint(-2, 9)
            )
            ns = self.pick(["'m'", "'n'"] if i == 0 else ["'m'", "NULL", "'n'"])
            rows.append(f"({k}, {nv}, {ns})")
        src = f"SELECT * FROM (VALUES {', '.join(rows)}) AS x(k, nv, ns)"

        guard = self.pick([None, "t.v > 2", "s.nv IS NOT NULL", "t.s = 'a'"])
        action_kind = self.pick(["update", "update", "delete"])
        if action_kind == "update":
            setc = self.pick(
                [
                    "v = s.nv",
                    "v = t.v + coalesce(s.nv, 0)",
                    "s = CASE WHEN s.ns IS NULL THEN t.s ELSE s.ns END, v = s.nv",
                ]
            )
            action = f"UPDATE SET {setc}"
        else:
            action = "DELETE"
        ig = self.pick([None, "s.nv > 0"])

        g_sql = f" AND {guard}" if guard else ""
        ig_sql = f" AND {ig}" if ig else ""
        merge = (
            f"MERGE INTO ft AS t USING ({src}) AS s ON t.k = s.k "
            f"WHEN MATCHED{g_sql} THEN {action} "
            f"WHEN NOT MATCHED{ig_sql} THEN INSERT (k, v, s) "
            f"VALUES (s.k, s.nv, s.ns)"
        )

        def tr(e):  # engine aliases -> duck decomposition tables
            import re as _re

            return _re.sub(r"\bs\.", "src.", _re.sub(r"\bt\.", "ft.", e))

        duck_steps = [
            f"CREATE TEMP TABLE src AS {src}",
            "CREATE TEMP TABLE prek AS SELECT k FROM ft",
        ]
        gd = tr(guard) if guard else "TRUE"
        if action_kind == "update":
            duck_steps.append(
                f"UPDATE ft SET {tr(setc)} FROM src "
                f"WHERE ft.k = src.k AND ({gd})"
            )
        else:
            duck_steps.append(
                f"DELETE FROM ft USING src WHERE ft.k = src.k AND ({gd})"
            )
        igd = tr(ig) if ig else "TRUE"
        duck_steps.append(
            f"INSERT INTO ft SELECT src.k, src.nv, src.ns FROM src "
            f"WHERE src.k NOT IN (SELECT k FROM prek) AND ({igd})"
        )
        duck_steps += ["DROP TABLE src", "DROP TABLE prek"]
        return merge, duck_steps


def _run_merge_sequence(
    spark, seed: int, manifest: bool, cas: bool = False, cas_store=None
):
    import duckdb

    engine = ScleraEngine(spark)
    duck = duckdb.connect()
    if cas_store is not None:
        engine.ddl()._cas = cas_store
    seedrows = "(1, 1, 'a'), (2, NULL, 'b'), (3, 3, NULL), (4, 7, 'a'), (5, 2, 'zz')"
    engine.execute("CREATE TABLE ft (k INT, v INT, s VARCHAR(20))")
    duck.execute("CREATE TABLE ft (k INTEGER, v INTEGER, s VARCHAR)")
    try:
        engine.execute(f"INSERT INTO ft VALUES {seedrows}")
        duck.execute(f"INSERT INTO ft VALUES {seedrows}")
        if manifest:
            engine.execute(
                "ALTER TABLE ft SET FORMAT MANIFEST" + (" CAS" if cas else "")
            )
        gen = MGen(random.Random(seed))
        for i in range(5):
            merge, steps = gen.gen()
            engine.execute(merge)
            for st in steps:
                duck.execute(st)
            got, exp = _state(engine), _duck_state(duck)
            assert got == exp, (
                f"seed {seed} manifest={manifest} diverged after MERGE {i}:"
                f"\n  {merge}\n  engine: {got}\n  duck:   {exp}"
            )
    finally:
        engine.execute("DROP TABLE ft")
        duck.close()


@pytest.mark.parametrize("seed", range(4))
def test_merge_fuzz_plain(spark, tables, seed):
    _run_merge_sequence(spark, 200 + seed, manifest=False)


@pytest.mark.parametrize("seed", range(4))
def test_merge_fuzz_manifest(spark, tables, seed):
    _run_merge_sequence(spark, 300 + seed, manifest=True)


@pytest.mark.parametrize("seed", range(2))
def test_merge_fuzz_manifest_cas_s3(spark, tables, seed):
    """MERGE through CAS commits on the S3 adapter (conflict-injecting
    fake): decomposed-oracle equality must hold through conditional-put
    publication too."""
    from tests.test_manifest_cas import make_cas

    _run_merge_sequence(
        spark, 400 + seed, manifest=True, cas=True,
        cas_store=make_cas("s3_conflict", None),
    )
