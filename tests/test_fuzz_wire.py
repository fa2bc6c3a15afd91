"""Fuzz family 9: wire-protocol serving parity.

The pg-wire server is a serving boundary — if it drops a row mid-frame,
mis-lengths a multibyte string, or mangles a NULL, every client is
silently wrong while the engine itself stays green. This family routes
seeded generator queries (family 7's join/subquery grammar — the widest
result-shape surface: NULLs, fan-out duplicates, strings with quotes/
parens/spaces) through a real socket round trip and compares the text
rows against `engine.sql()` rendered through the same `_text_value`
codec. That isolates the transport (framing, length prefixes, escaping,
multi-row streaming) as the unit under fuzz; value RENDERING correctness
is pinned by the directed type test below and test_server.py.
"""

from __future__ import annotations

import datetime
import random

import pytest

from sclera_spark.engine import ScleraEngine
from sclera_spark.interfaces import ScleraServer, WireClient
from sclera_spark.interfaces.server import _text_value

from tests.test_fuzz_joins import _J1, _J2, _J3, JGen

N_SEEDS = 24  # transport fuzz: each seed runs the query twice (direct + wire)


@pytest.fixture(scope="module", params=["plain", "secure"])
def wire_env(spark, request):
    """Both transport flavors run the whole family: plain/trust (the
    reference-parity default) and TLS + SCRAM-SHA-256 (r7) — a framing
    bug that only shows through the ssl-wrapped socket, or state left
    over from the auth exchange, diverges the same parity asserts."""
    engine = ScleraEngine(spark)
    engine.add_table("j1", spark.createDataFrame(_J1, "a int, b int, s string"))
    engine.add_table("j2", spark.createDataFrame(_J2, "a int, c int, t string"))
    engine.add_table("j3", spark.createDataFrame(_J3, "k int, d int"))
    if request.param == "secure":
        srv = ScleraServer(engine, tls="auto", auth={"fuzz": "fuzz-pw"}).start()
        client = WireClient(
            "127.0.0.1", srv.port, user="fuzz", tls=True, password="fuzz-pw"
        )
    else:
        srv = ScleraServer(engine).start()
        client = WireClient("127.0.0.1", srv.port)
    yield engine, client
    client.close()
    srv.stop()


def _wire_text(v):
    b = _text_value(v)
    return None if b is None else b.decode("utf-8")


def _row_key(row):
    # None sorts before any string, per-cell, so NULL-bearing rows order
    return tuple((v is not None, v if v is not None else "") for v in row)


@pytest.mark.slowstress
def test_wire_parity_fuzz(wire_env):
    engine, client = wire_env
    for seed in range(N_SEEDS):
        gen = JGen(random.Random(seed))
        sql, _duck = gen.query()
        direct = engine.sql(sql)
        want_cols = [f.name for f in direct.schema.fields]
        want_rows = sorted(
            (tuple(_wire_text(v) for v in row) for row in direct.collect()),
            key=_row_key,
        )
        cols, rows, tag = client.execute(sql)
        assert cols == want_cols, f"seed {seed}: column names\n  {sql}"
        assert tag == f"SELECT {len(want_rows)}", f"seed {seed}: tag\n  {sql}"
        got_rows = sorted((tuple(row) for row in rows), key=_row_key)
        assert got_rows == want_rows, (
            f"seed {seed}: wire rows diverge from engine\n  {sql}\n"
            f"  first diff: "
            f"{next((a, b) for a, b in zip(got_rows, want_rows) if a != b)}"
        )


def test_wire_every_type_roundtrip(wire_env):
    """One row exercising every renderer branch: ints, double (repr
    precision), decimal, bool, date, timestamp (microseconds), NULL,
    array, and strings containing newline / tab / NUL-adjacent escapes /
    multibyte UTF-8 — the characters most likely to break length-prefixed
    framing if the codec miscounted bytes."""
    _engine, client = wire_env
    sql = (
        "SELECT 1 AS i, CAST(9007199254740993 AS BIGINT) AS big, "
        "CAST(1.5 AS DOUBLE)/3 AS dbl, CAST(2.50 AS DECIMAL(10,2)) AS dec, "
        "TRUE AS b, DATE '2024-02-29' AS d, "
        "TIMESTAMP '2024-02-29 23:59:59.123456' AS ts, "
        "CAST(NULL AS INT) AS nul, ARRAY(1, NULL, 3) AS arr, "
        "'line1\nline2\ttab — ünïcødé 日本語' AS s"
    )
    cols, rows, _ = client.execute(sql)
    assert cols == ["i", "big", "dbl", "dec", "b", "d", "ts", "nul", "arr", "s"]
    (row,) = rows
    assert row[0] == "1"
    assert row[1] == "9007199254740993"  # exceeds double mantissa — exact
    assert row[2] == repr(1.5 / 3)
    assert row[3] == "2.50"
    assert row[4] == "t"
    assert row[5] == "2024-02-29"
    assert row[6] == "2024-02-29 23:59:59.123456"
    assert row[7] is None
    assert row[8] == "{1,NULL,3}"
    assert row[9] == "line1\nline2\ttab — ünïcødé 日本語"


def test_wire_timestamp_binding_extended(wire_env):
    """Extended-protocol text binds round-trip a timestamp-shaped string
    parameter into a comparison (what a JDBC setString against a
    timestamp column produces)."""
    _engine, client = wire_env
    cols, rows, _ = client.execute_extended(
        "SELECT COUNT(*) AS n FROM j3 WHERE d < $1", (20,)
    )
    assert cols == ["n"]
    want = str(sum(1 for _k, d in _J3 if d < 20))
    assert rows == [(want,)]
    # reuse with a different bind — prepared-statement re-execution path
    _, rows2, _ = client.execute_extended(
        "SELECT COUNT(*) AS n FROM j3 WHERE d < $1", (5,)
    )
    want2 = str(sum(1 for _k, d in _J3 if d < 5))
    assert rows2 == [(want2,)]


# ------------------- r11: stateful wire-transaction DML fuzz vs DuckDB


@pytest.mark.slowstress
def test_txn_dml_fuzz_vs_duckdb(spark):
    """Seeded random transactions (INSERT / COW UPDATE / COW DELETE /
    SELECT, ending in COMMIT or ROLLBACK) against a manifest table over
    the real wire protocol, mirrored statement-by-statement IN ORDER on
    a DuckDB shadow table — pg semantics (r12 read-your-own-writes): a
    statement sees every earlier statement of its own transaction,
    including reads inside the transaction and DML over the
    transaction's own staged inserts. The only legal mid-txn refusal is
    the published-file double-rewrite guard (treated as a no-op by the
    mirror). Invariants per transaction: command tags match the shadow
    state's in-order counts; mid-txn SELECTs match the shadow state;
    other sessions keep seeing the pre-txn snapshot; COMMIT with any
    staged work lands EXACTLY ONE version (else zero); ROLLBACK lands
    zero; table contents equal the mirror after every boundary."""
    duckdb = pytest.importorskip("duckdb")

    engine = ScleraEngine(spark)
    srv = ScleraServer(engine).start()
    c = WireClient("127.0.0.1", srv.port)
    try:
        for seed in range(5):
            rng = random.Random(4100 + seed)
            try:
                c.execute("DROP TABLE fz")
            except RuntimeError:
                pass
            c.execute(
                "CREATE TABLE fz AS SELECT k, CAST(k AS DOUBLE)/2 AS v "
                "FROM (VALUES "
                + ", ".join(f"({k})" for k in range(40))
                + ") AS t(k)"
            )
            c.execute("ALTER TABLE fz SET FORMAT MANIFEST")
            duck = duckdb.connect()
            duck.execute("CREATE TABLE fz (k INTEGER, v DOUBLE)")
            duck.execute(
                "INSERT INTO fz SELECT k, k/2.0 FROM range(40) t(k)"
            )
            # spread the seed rows over several part files
            for lo in (100, 140, 180):
                vals = ", ".join(
                    f"({k}, {k/2!r})" for k in range(lo, lo + 12)
                )
                c.execute(f"INSERT INTO fz VALUES {vals}")
                duck.execute(f"INSERT INTO fz VALUES {vals}")
            next_k = [1000]

            def gen_where():
                # ranges sometimes overlap the txn's own fresh inserts
                # (k >= 1000), so RYOW DML-over-staged-rows is fuzzed
                a = (
                    rng.randrange(980, next_k[0] + 3)
                    if rng.random() < 0.35
                    else rng.randrange(0, 220)
                )
                b = a + rng.randrange(0, 80)
                where = f"k BETWEEN {a} AND {b}"
                if rng.random() < 0.5:
                    m = rng.choice([3, 7])
                    where += f" AND k % {m} = {rng.randrange(m)}"
                return where

            def gen_stmt():
                kind = rng.choice(["ins", "upd", "del", "upd", "del"])
                if kind == "ins":
                    ks = [next_k[0] + i for i in range(rng.randint(1, 3))]
                    next_k[0] += len(ks)
                    vals = ", ".join(f"({k}, {k/2!r})" for k in ks)
                    return "ins", f"INSERT INTO fz VALUES {vals}", len(ks)
                where = gen_where()
                if kind == "upd":
                    return "upd", f"UPDATE fz SET v = v + 1 WHERE {where}", None
                return "del", f"DELETE FROM fz WHERE {where}", None

            other = WireClient("127.0.0.1", srv.port)
            for _txn in range(4):
                v0 = len(c.execute("SHOW VERSIONS fz")[1])
                n_snapshot = int(
                    c.execute("SELECT count(*) AS n FROM fz")[1][0][0]
                )
                c.execute("BEGIN")
                # in-order shadow of the transaction's view of fz
                duck.execute(
                    "CREATE OR REPLACE TABLE fz_txn AS SELECT * FROM fz"
                )
                # accepted: (duck_shadow_sqls, staged_flag) in execution
                # order — MERGE shadows as UPDATE+INSERT, so each step
                # carries its own list of DuckDB statements
                accepted = []
                marks = []  # savepoints: (name, len(accepted) at mark)

                def replay(upto):
                    duck.execute(
                        "CREATE OR REPLACE TABLE fz_txn AS "
                        "SELECT * FROM fz"
                    )
                    for sqls, _ in upto:
                        for s2 in sqls:
                            duck.execute(s2)

                for _s in range(rng.randint(1, 6)):
                    r = rng.random()
                    if r < 0.12:
                        nm = f"s{_s}"
                        c.execute(f"SAVEPOINT {nm}")
                        marks.append((nm, len(accepted)))
                        continue
                    if r < 0.24 and marks:
                        nm, at = marks[rng.randrange(len(marks))]
                        c.execute(f"ROLLBACK TO SAVEPOINT {nm}")
                        accepted = accepted[:at]
                        replay(accepted)
                        # later savepoints are destroyed, the target kept
                        marks = marks[: next(
                            i for i, (n2, _) in enumerate(marks) if n2 == nm
                        ) + 1]
                        continue
                    if r < 0.45:
                        # read inside the transaction: sees its OWN
                        # writes (mirror = in-order shadow); a second
                        # session still sees the pre-txn snapshot
                        where = gen_where()
                        got_n = int(c.execute(
                            f"SELECT count(*) AS n FROM fz WHERE {where}"
                        )[1][0][0])
                        want_n = duck.execute(
                            f"SELECT count(*) FROM fz_txn WHERE {where}"
                        ).fetchone()[0]
                        assert got_n == want_n, (
                            f"seed {seed} txn {_txn}: read-inside-txn "
                            f"divergence for {where!r}"
                        )
                        other_n = int(other.execute(
                            "SELECT count(*) AS n FROM fz"
                        )[1][0][0])
                        assert other_n == n_snapshot, (
                            f"seed {seed} txn {_txn}: staged rows "
                            "leaked to another session"
                        )
                        continue
                    if r < 0.58:
                        # MERGE upsert (r12 RYOW): source keys mix the
                        # published range, the txn's own staged inserts,
                        # and fresh keys; matched-clause guard makes the
                        # tag count non-trivial
                        new_ks = [
                            next_k[0] + i for i in range(rng.randint(0, 2))
                        ]
                        next_k[0] += len(new_ks)
                        old_ks = [
                            rng.randrange(980, next_k[0] + 3)
                            if rng.random() < 0.4
                            else rng.randrange(0, 220)
                            for _ in range(rng.randint(0, 3))
                        ]
                        ks = sorted(set(new_ks + old_ks))
                        if not ks:
                            continue
                        src = " UNION ALL ".join(
                            f"SELECT {k} AS k, CAST({k} + 0.25 AS DOUBLE)"
                            f" AS v"
                            for k in ks
                        )
                        sql = (
                            f"MERGE INTO fz t USING ({src}) s "
                            "ON t.k = s.k "
                            "WHEN MATCHED AND s.k % 2 = 0 "
                            "THEN UPDATE SET v = s.v "
                            "WHEN NOT MATCHED "
                            "THEN INSERT (k, v) VALUES (s.k, s.v)"
                        )
                        in_list = ", ".join(str(k) for k in ks)
                        matched_any = duck.execute(
                            "SELECT count(*) FROM fz_txn "
                            f"WHERE k IN ({in_list})"
                        ).fetchone()[0]
                        matched_keys = duck.execute(
                            "SELECT count(DISTINCT k) FROM fz_txn "
                            f"WHERE k IN ({in_list})"
                        ).fetchone()[0]
                        matched_upd = duck.execute(
                            "SELECT count(*) FROM fz_txn "
                            f"WHERE k IN ({in_list}) AND k % 2 = 0"
                        ).fetchone()[0]
                        ins_cnt = len(ks) - matched_keys
                        n_want = matched_upd + ins_cnt
                        _, _, tag = c.execute(sql)
                        assert tag == f"MERGE {n_want}", (sql, tag)
                        vals = ", ".join(f"({k})" for k in ks)
                        duck_sqls = [
                            f"UPDATE fz_txn SET v = k + 0.25 "
                            f"WHERE k IN ({in_list}) AND k % 2 = 0",
                            f"INSERT INTO fz_txn SELECT t.k, t.k + 0.25 "
                            f"FROM (VALUES {vals}) t(k) "
                            f"WHERE t.k NOT IN (SELECT k FROM fz_txn)",
                        ]
                        for s2 in duck_sqls:
                            duck.execute(s2)
                        accepted.append(
                            (duck_sqls, matched_any > 0 or ins_cnt > 0)
                        )
                        continue
                    kind, sql, n_ins = gen_stmt()
                    n_want = (
                        n_ins
                        if kind == "ins"
                        else duck.execute(
                            "SELECT count(*) FROM fz_txn WHERE "
                            + sql.split(" WHERE ", 1)[1]
                        ).fetchone()[0]
                    )
                    try:
                        _, _, tag = c.execute(sql)
                    except RuntimeError as exc:
                        # the only legal refusal mid-txn is the
                        # PUBLISHED-file double-rewrite guard; the
                        # statement is a no-op, the shadow stays put
                        assert "already rewritten" in str(exc), exc
                        continue
                    assert tag.split()[-1] == str(n_want), (sql, tag)
                    shadow = sql.replace(" fz ", " fz_txn ")
                    duck.execute(shadow)
                    accepted.append(
                        ([shadow], kind == "ins" or n_want > 0)
                    )
                staged_work = any(flag for _, flag in accepted)
                if rng.random() < 0.7:
                    c.execute("COMMIT")
                    duck.execute("DELETE FROM fz")
                    duck.execute("INSERT INTO fz SELECT * FROM fz_txn")
                    want_delta = 1 if staged_work else 0
                else:
                    c.execute("ROLLBACK")
                    want_delta = 0
                assert (
                    len(c.execute("SHOW VERSIONS fz")[1]) - v0 == want_delta
                )
                got = [
                    (int(k), float(v))
                    for k, v in c.execute(
                        "SELECT k, v FROM fz ORDER BY k, v"
                    )[1]
                ]
                want = duck.execute(
                    "SELECT k, v FROM fz ORDER BY k, v"
                ).fetchall()
                assert got == [(int(k), float(v)) for k, v in want], (
                    f"seed {seed} txn {_txn}: wire/duck divergence"
                )
            other.close()
            duck.close()
        c.execute("DROP TABLE fz")
    finally:
        c.close()
        srv.stop()


def test_txn_create_table_fuzz_vs_duckdb(spark):
    """late r12 transactional DDL fuzz: CREATE TABLE AS inside a txn,
    then a random interleaving of INSERT/UPDATE/DELETE/SAVEPOINT/
    ROLLBACK TO/SELECT on the created table, mirrored in-order on a
    DuckDB shadow; COMMIT must register exactly the shadow contents,
    ROLLBACK must leave no trace (relation unknown + no directory)."""
    import os

    duckdb = pytest.importorskip("duckdb")

    engine = ScleraEngine(spark)
    srv = ScleraServer(engine).start()
    c = WireClient("127.0.0.1", srv.port)
    try:
        for seed in range(4):
            rng = random.Random(5200 + seed)
            duck = duckdb.connect()
            c.execute("BEGIN")
            n0 = rng.randint(0, 5)
            c.execute(
                "CREATE TABLE fzc AS SELECT k, CAST(k AS DOUBLE)/4 AS v "
                "FROM (VALUES "
                + ", ".join(f"({k})" for k in range(max(n0, 1)))
                + f") AS t(k){' WHERE 1=0' if n0 == 0 else ''}"
            )
            duck.execute("CREATE TABLE fzc (k INTEGER, v DOUBLE)")
            if n0:
                duck.execute(
                    f"INSERT INTO fzc SELECT k, k/4.0 FROM range({n0}) t(k)"
                )
            next_k = [100]
            # duck shadow snapshots per savepoint name
            marks: dict[str, list] = {}

            def snap():
                return duck.execute(
                    "SELECT k, v FROM fzc ORDER BY k, v"
                ).fetchall()

            def restore(rows):
                duck.execute("DELETE FROM fzc")
                for k, v in rows:
                    duck.execute(f"INSERT INTO fzc VALUES ({k}, {v!r})")

            for _s in range(rng.randint(2, 8)):
                r = rng.random()
                if r < 0.15:
                    nm = f"s{_s}"
                    c.execute(f"SAVEPOINT {nm}")
                    marks[nm] = snap()
                    continue
                if r < 0.3 and marks:
                    nm = rng.choice(list(marks))
                    c.execute(f"ROLLBACK TO SAVEPOINT {nm}")
                    restore(marks[nm])
                    # later savepoints die on the wire side too
                    names = list(marks)
                    for later in names[names.index(nm) + 1:]:
                        marks.pop(later)
                    continue
                if r < 0.55:
                    got = sorted(
                        (int(k), float(v))
                        for k, v in c.execute(
                            "SELECT k, v FROM fzc ORDER BY k, v"
                        )[1]
                    )
                    assert got == [
                        (int(k), float(v)) for k, v in snap()
                    ], f"seed {seed}: read divergence"
                    continue
                kind = rng.choice(["ins", "upd", "del"])
                if kind == "ins":
                    ks = [next_k[0] + i for i in range(rng.randint(1, 3))]
                    next_k[0] += len(ks)
                    vals = ", ".join(f"({k}, {k/4!r})" for k in ks)
                    _, _, tag = c.execute(f"INSERT INTO fzc VALUES {vals}")
                    assert tag == f"INSERT 0 {len(ks)}"
                    duck.execute(f"INSERT INTO fzc VALUES {vals}")
                    continue
                a = rng.randrange(0, next_k[0] + 2)
                where = f"k BETWEEN {a} AND {a + rng.randrange(0, 60)}"
                if kind == "upd":
                    sql = f"UPDATE fzc SET v = v + 1 WHERE {where}"
                else:
                    sql = f"DELETE FROM fzc WHERE {where}"
                n_want = duck.execute(
                    f"SELECT count(*) FROM fzc WHERE {where}"
                ).fetchone()[0]
                _, _, tag = c.execute(sql)
                assert tag.split()[-1] == str(n_want), (sql, tag)
                duck.execute(sql)
            commit = rng.random() < 0.6
            want = snap()
            path = engine.ddl()._path("fzc")
            if commit:
                c.execute("COMMIT")
                got = sorted(
                    (int(k), float(v))
                    for k, v in c.execute(
                        "SELECT k, v FROM fzc ORDER BY k, v"
                    )[1]
                )
                assert got == [(int(k), float(v)) for k, v in want], (
                    f"seed {seed}: committed contents diverge"
                )
                c.execute("DROP TABLE fzc")
            else:
                c.execute("ROLLBACK")
                with pytest.raises(RuntimeError):
                    c.execute("SELECT count(*) AS n FROM fzc")
                import glob as _glob

                leftovers = _glob.glob(path + "*")
                assert not leftovers, (
                    f"seed {seed}: ROLLBACK left {leftovers}"
                )
            duck.close()
    finally:
        c.close()
        srv.stop()


# ------------------- r12: portal suspension (Execute maxRows)


def test_portal_suspension_fetch_cycles(wire_env):
    """Execute(maxRows) suspends the portal after maxRows DataRows
    (PortalSuspended), resumes on the next Execute, and completes with
    the full-count tag — the JDBC setFetchSize cycle. Rows across
    batches equal the unsuspended result exactly, order preserved."""
    _engine, client = wire_env
    sql = "SELECT k, d FROM j3 ORDER BY k, d"
    cols_all, rows_all, tag_all = client.execute(sql)
    for fetch in (1, 2, 7, 1000):
        cols, batches, tag = client.execute_fetch(sql, fetch)
        assert cols == cols_all
        assert tag == tag_all == f"SELECT {len(rows_all)}"
        flat = [r for b in batches for r in b]
        assert flat == rows_all, f"fetch={fetch}"
        # every non-final batch is exactly `fetch` rows
        assert all(len(b) == fetch for b in batches[:-1]), f"fetch={fetch}"
        assert 1 <= len(batches[-1]) <= fetch or not rows_all
    # a parameterized fetch reuses the same machinery
    cols, batches, tag = client.execute_fetch(
        "SELECT k FROM j3 WHERE d < $1 ORDER BY k", 2, (20,)
    )
    flat = [r for b in batches for r in b]
    assert tag == f"SELECT {len(flat)}"
    assert flat == sorted(
        [(str(k),) for k, d in _J3 if d < 20], key=lambda t: int(t[0])
    )


@pytest.mark.slowstress
def test_portal_suspension_fuzz(wire_env):
    """Seeded generator queries streamed through random fetch sizes:
    concatenated suspended batches must equal the one-shot wire result
    for every seed (framing, NULLs, multibyte strings included)."""
    _engine, client = wire_env
    for seed in range(8):
        gen = JGen(random.Random(7700 + seed))
        sql, _duck = gen.query()
        _, rows_once, tag_once = client.execute(sql)
        fetch = random.Random(seed).choice([1, 2, 3, 5])
        _, batches, tag = client.execute_fetch(sql, fetch)
        flat = [r for b in batches for r in b]
        assert sorted(flat, key=_row_key) == sorted(
            rows_once, key=_row_key
        ), f"seed {seed}"
        assert tag == tag_once, f"seed {seed}"
        assert all(len(b) == fetch for b in batches[:-1]), f"seed {seed}"


@pytest.mark.parametrize("fmt", ["MANIFEST", "MANIFEST CAS"])
@pytest.mark.slowstress
def test_txn_two_table_fuzz_vs_duckdb(spark, fmt):
    """r13 multi-object transactions: random interleavings of
    INSERT/UPDATE/DELETE over TWO manifest tables in one transaction
    (plus savepoints, rollbacks-to, and mid-txn reads that JOIN the
    two buffered tables), mirrored in-order on DuckDB shadows.
    Invariants: command tags match shadow counts; mid-txn reads (per
    table AND the comma-join across both) match the shadows; another
    session keeps the pre-txn snapshots; COMMIT lands exactly one
    version on each table with staged work (zero on the untouched
    one); ROLLBACK lands zero on both; table contents equal the
    shadows at every boundary."""
    duckdb = pytest.importorskip("duckdb")

    engine = ScleraEngine(spark)
    srv = ScleraServer(engine).start()
    c = WireClient("127.0.0.1", srv.port)
    try:
        for seed in range(4):
            rng = random.Random(6300 + seed)
            for t in ("f2a", "f2b"):
                try:
                    c.execute(f"DROP TABLE {t}")
                except RuntimeError:
                    pass
                base = 0 if t == "f2a" else 500
                c.execute(
                    f"CREATE TABLE {t} AS SELECT k, CAST(k AS DOUBLE)/2"
                    " AS v FROM (VALUES "
                    + ", ".join(f"({k})" for k in range(base, base + 30))
                    + ") AS t(k)"
                )
                # r14: the same fuzz runs on BOTH commit protocols —
                # flock-journaled groups and CAS-journaled groups
                # (MANIFEST CAS; FileCas store, journal object in-store)
                c.execute(f"ALTER TABLE {t} SET FORMAT {fmt}")
            duck = duckdb.connect()
            for t, base in (("f2a", 0), ("f2b", 500)):
                duck.execute(f"CREATE TABLE {t} (k INTEGER, v DOUBLE)")
                duck.execute(
                    f"INSERT INTO {t} SELECT k, k/2.0 "
                    f"FROM range({base}, {base + 30}) t(k)"
                )
            next_k = {"f2a": 1000, "f2b": 2000}
            other = WireClient("127.0.0.1", srv.port)
            for _txn in range(3):
                v0 = {
                    t: len(c.execute(f"SHOW VERSIONS {t}")[1])
                    for t in ("f2a", "f2b")
                }
                snap = {
                    t: int(
                        c.execute(f"SELECT count(*) AS n FROM {t}")[1][0][0]
                    )
                    for t in ("f2a", "f2b")
                }
                c.execute("BEGIN")
                for t in ("f2a", "f2b"):
                    duck.execute(
                        f"CREATE OR REPLACE TABLE {t}_txn AS "
                        f"SELECT * FROM {t}"
                    )
                touched = {"f2a": False, "f2b": False}
                marks = []  # (name, duck snapshots, touched copy)

                def dsnap():
                    return {
                        t: duck.execute(
                            f"SELECT k, v FROM {t}_txn ORDER BY k, v"
                        ).fetchall()
                        for t in ("f2a", "f2b")
                    }

                for _s in range(rng.randint(2, 7)):
                    r = rng.random()
                    if r < 0.1:
                        nm = f"s{_s}"
                        c.execute(f"SAVEPOINT {nm}")
                        marks.append((nm, dsnap(), dict(touched)))
                        continue
                    if r < 0.2 and marks:
                        nm, ds, tc = marks[rng.randrange(len(marks))]
                        c.execute(f"ROLLBACK TO SAVEPOINT {nm}")
                        for t, rows in ds.items():
                            duck.execute(f"DELETE FROM {t}_txn")
                            for k, v in rows:
                                duck.execute(
                                    f"INSERT INTO {t}_txn VALUES ({k}, {v!r})"
                                )
                        touched = dict(tc)
                        marks = marks[: next(
                            i for i, (n2, _, _) in enumerate(marks)
                            if n2 == nm
                        ) + 1]
                        continue
                    if r < 0.4:
                        # mid-txn reads: single-table + the comma join
                        # across BOTH buffered tables (RYOW on each)
                        got = int(c.execute(
                            "SELECT count(*) AS n FROM f2a, f2b"
                        )[1][0][0])
                        want = duck.execute(
                            "SELECT (SELECT count(*) FROM f2a_txn) * "
                            "(SELECT count(*) FROM f2b_txn)"
                        ).fetchone()[0]
                        assert got == want, (
                            f"seed {seed} txn {_txn}: cross-join RYOW"
                        )
                        for t in ("f2a", "f2b"):
                            assert int(other.execute(
                                f"SELECT count(*) AS n FROM {t}"
                            )[1][0][0]) == snap[t], "staged rows leaked"
                        continue
                    t = rng.choice(["f2a", "f2b"])
                    if r < 0.52:
                        # MERGE upsert on one of the two buffered
                        # tables (RYOW against ITS OWN staged rows)
                        base = 0 if t == "f2a" else 500
                        new_ks = [
                            next_k[t] + i
                            for i in range(rng.randint(0, 2))
                        ]
                        next_k[t] += len(new_ks)
                        old_ks = [
                            rng.randrange(next_k[t] - 20, next_k[t] + 3)
                            if rng.random() < 0.4
                            else rng.randrange(base, base + 35)
                            for _ in range(rng.randint(0, 3))
                        ]
                        ks = sorted(set(new_ks + old_ks))
                        if not ks:
                            continue
                        src = " UNION ALL ".join(
                            f"SELECT {k} AS k, CAST({k} + 0.25 AS "
                            f"DOUBLE) AS v"
                            for k in ks
                        )
                        sql = (
                            f"MERGE INTO {t} x USING ({src}) s "
                            "ON x.k = s.k "
                            "WHEN MATCHED AND s.k % 2 = 0 "
                            "THEN UPDATE SET v = s.v "
                            "WHEN NOT MATCHED "
                            "THEN INSERT (k, v) VALUES (s.k, s.v)"
                        )
                        in_list = ", ".join(str(k) for k in ks)
                        m_keys = duck.execute(
                            f"SELECT count(DISTINCT k) FROM {t}_txn "
                            f"WHERE k IN ({in_list})"
                        ).fetchone()[0]
                        m_upd = duck.execute(
                            f"SELECT count(*) FROM {t}_txn "
                            f"WHERE k IN ({in_list}) AND k % 2 = 0"
                        ).fetchone()[0]
                        ins_cnt = len(ks) - m_keys
                        n_want = m_upd + ins_cnt
                        try:
                            _, _, tag = c.execute(sql)
                        except RuntimeError as exc:
                            assert "already rewritten" in str(exc), exc
                            continue
                        assert tag == f"MERGE {n_want}", (sql, tag)
                        vals = ", ".join(f"({k})" for k in ks)
                        duck.execute(
                            f"UPDATE {t}_txn SET v = k + 0.25 "
                            f"WHERE k IN ({in_list}) AND k % 2 = 0"
                        )
                        duck.execute(
                            f"INSERT INTO {t}_txn SELECT x.k, x.k + 0.25 "
                            f"FROM (VALUES {vals}) x(k) "
                            f"WHERE x.k NOT IN (SELECT k FROM {t}_txn)"
                        )
                        if n_want > 0:
                            touched[t] = True
                        continue
                    kind = rng.choice(["ins", "upd", "del"])
                    if kind == "ins":
                        ks = [
                            next_k[t] + i
                            for i in range(rng.randint(1, 3))
                        ]
                        next_k[t] += len(ks)
                        vals = ", ".join(f"({k}, {k/2!r})" for k in ks)
                        sql = f"INSERT INTO {t} VALUES {vals}"
                        n_want = len(ks)
                    else:
                        base = 0 if t == "f2a" else 500
                        a = (
                            rng.randrange(next_k[t] - 25, next_k[t] + 3)
                            if rng.random() < 0.35
                            else rng.randrange(base, base + 35)
                        )
                        where = f"k BETWEEN {a} AND {a + rng.randrange(0, 40)}"
                        sql = (
                            f"UPDATE {t} SET v = v + 1 WHERE {where}"
                            if kind == "upd"
                            else f"DELETE FROM {t} WHERE {where}"
                        )
                        n_want = duck.execute(
                            f"SELECT count(*) FROM {t}_txn WHERE {where}"
                        ).fetchone()[0]
                    try:
                        _, _, tag = c.execute(sql)
                    except RuntimeError as exc:
                        assert "already rewritten" in str(exc), exc
                        continue
                    assert tag.split()[-1] == str(n_want), (sql, tag)
                    duck.execute(sql.replace(f" {t} ", f" {t}_txn "))
                    if kind == "ins" or n_want > 0:
                        touched[t] = True
                if rng.random() < 0.7:
                    c.execute("COMMIT")
                    for t in ("f2a", "f2b"):
                        duck.execute(f"DELETE FROM {t}")
                        duck.execute(
                            f"INSERT INTO {t} SELECT * FROM {t}_txn"
                        )
                    want_delta = {t: 1 if touched[t] else 0 for t in touched}
                else:
                    c.execute("ROLLBACK")
                    want_delta = {"f2a": 0, "f2b": 0}
                for t in ("f2a", "f2b"):
                    assert (
                        len(c.execute(f"SHOW VERSIONS {t}")[1]) - v0[t]
                        == want_delta[t]
                    ), f"seed {seed} txn {_txn}: version delta on {t}"
                    got = [
                        (int(k), float(v))
                        for k, v in c.execute(
                            f"SELECT k, v FROM {t} ORDER BY k, v"
                        )[1]
                    ]
                    want = duck.execute(
                        f"SELECT k, v FROM {t} ORDER BY k, v"
                    ).fetchall()
                    assert got == [
                        (int(k), float(v)) for k, v in want
                    ], f"seed {seed} txn {_txn}: divergence on {t}"
            other.close()
            duck.close()
        for t in ("f2a", "f2b"):
            c.execute(f"DROP TABLE {t}")
    finally:
        c.close()
        srv.stop()
