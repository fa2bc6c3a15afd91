"""Serving-tier tests mirroring the reference's JDBC suite.

Reference: modules/interfaces/jdbc/src/test/scala/JDBCTestSuite.scala:24-93
— connect, driver metadata, `select "b'ar" as foo` (quoting round-trip),
statement/connection close, then the whole suite again on a fresh
connection (reconnect). Here the client speaks the public PostgreSQL wire
protocol against `ScleraServer`, and metadata comes from the pg_catalog
emulation (sources/pgcatalog.py) exactly as a real PostgreSQL client
would introspect it.
"""

from __future__ import annotations

import pytest

from sclera_spark.engine import ScleraEngine
from sclera_spark.interfaces import ScleraServer, WireClient


@pytest.fixture(scope="module")
def server(spark, tables):
    engine = ScleraEngine(spark)
    for name, df in tables.items():
        engine.add_table(name, df)
    srv = ScleraServer(engine).start()
    yield srv
    srv.stop()


def connect(server) -> WireClient:
    return WireClient("127.0.0.1", server.port)


def test_connect_handshake(server):
    c = connect(server)
    assert c.parameters.get("server_encoding") == "UTF8"
    assert "sclera" in c.parameters.get("server_version", "")
    c.close()


def test_select_quoted_literal(server):
    # JDBCTestSuite.scala:49-56: select "b'ar" as foo
    c = connect(server)
    cols, rows, tag = c.execute("select 'b''ar' as foo")
    assert cols == ["foo"]
    assert rows == [("b'ar",)]
    assert tag == "SELECT 1"
    c.close()


def test_query_real_table(server):
    c = connect(server)
    cols, rows, _ = c.execute(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
    )
    assert cols == ["r_regionkey", "r_name"]
    assert len(rows) == 5
    assert rows[0][1] == "AFRICA"
    c.close()


def test_metadata_via_pg_catalog(server):
    """DatabaseMetaData-style introspection: list tables from pg_class,
    then columns + types from pg_attribute/pg_type — the queries a
    PostgreSQL client issues for getTables()/getColumns()."""
    c = connect(server)
    cols, rows, _ = c.execute(
        "SELECT relname FROM pg_class WHERE relkind = 'r' ORDER BY relname"
    )
    names = [r[0] for r in rows]
    assert "region" in names and "nation" in names
    cols, rows, _ = c.execute(
        "SELECT a.attname, t.typname FROM pg_attribute a "
        "JOIN pg_class c ON a.attrelid = c.oid "
        "JOIN pg_type t ON a.atttypid = t.oid "
        "WHERE c.relname = 'region' ORDER BY a.attnum"
    )
    assert [r[0] for r in rows] == ["r_regionkey", "r_name"]
    assert rows[0][1] in ("int8", "int4")
    c.close()


def test_multi_statement_and_session_verbs(server):
    c = connect(server)
    # clients open with SET/BEGIN chatter; accepted as no-ops
    _, _, tag = c.execute("SET client_min_messages = warning")
    assert tag == "SET"
    cols, rows, _ = c.execute("SELECT 1 AS a; SELECT 2 AS b")
    # simple protocol returns the last statement's result to this client
    assert rows[-1] == ("2",)
    c.close()


def test_empty_query_and_error_recovery(server):
    c = connect(server)
    cols, rows, tag = c.execute("")
    assert rows == [] and tag == ""
    with pytest.raises(RuntimeError):
        c.execute("SELECT FROM no_such_table_xyz !!")
    # connection must stay usable after an error (ReadyForQuery resync)
    cols, rows, _ = c.execute("SELECT 42 AS answer")
    assert rows == [("42",)]
    c.close()


def test_null_and_type_rendering(server):
    c = connect(server)
    cols, rows, _ = c.execute(
        "SELECT CAST(NULL AS INT) AS n, TRUE AS b, 1.5 AS f, DATE '2024-01-02' AS d"
    )
    assert rows == [(None, "t", "1.5", "2024-01-02")]
    c.close()


def test_ddl_roundtrip_over_wire(server):
    c = connect(server)
    c.execute("CREATE TABLE wire_t AS SELECT 1 AS x UNION ALL SELECT 2 AS x")
    cols, rows, _ = c.execute("SELECT count(*) AS n FROM wire_t")
    assert rows == [("2",)]
    _, _, tag = c.execute("DROP TABLE wire_t")
    assert tag.startswith("DROP")
    c.close()


def test_reconnect(server):
    # JDBCTestSuite.scala:93 runs the suite twice: close + fresh connect
    for _ in range(2):
        c = connect(server)
        cols, rows, _ = c.execute("select 'b''ar' as foo")
        assert rows == [("b'ar",)]
        c.close()


def test_extended_query_protocol(server):
    """Parse/Bind/Describe/Execute/Sync — the pgjdbc prepared-statement
    path, with and without text-format parameter binds."""
    c = connect(server)
    cols, rows, tag = c.execute_extended(
        "SELECT n_name FROM nation WHERE n_regionkey = 0 ORDER BY n_name"
    )
    assert cols == ["n_name"]
    assert len(rows) == 5
    assert tag.startswith("SELECT")
    # bound parameters: numeric splices raw, string is escaped
    cols, rows, _ = c.execute_extended(
        "SELECT n_name FROM nation WHERE n_regionkey = $1 AND n_name <> $2 "
        "ORDER BY n_name",
        params=(0, "it's"),
    )
    assert cols == ["n_name"] and len(rows) == 5
    # NULL parameter
    _, rows, _ = c.execute_extended("SELECT $1 IS NULL AS isn", params=(None,))
    assert rows == [("t",)]
    # unbound placeholder -> clear error, connection stays usable
    with pytest.raises(RuntimeError, match="unbound"):
        c.execute_extended("SELECT * FROM nation WHERE n_nationkey = $1")
    _, rows, _ = c.execute("SELECT 7 AS x")
    assert rows == [("7",)]
    c.close()


def test_concurrent_connections(server):
    import threading

    errors = []

    def work():
        try:
            c = connect(server)
            _, rows, _ = c.execute("SELECT count(*) AS n FROM nation")
            assert rows == [("25",)]
            c.close()
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=work) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_manifest_dml_over_wire(server):
    """A client doing atomic-DML table management end to end over the
    wire: convert to manifest format, UPDATE (versioned commit), inspect
    versions, vacuum, read back."""
    c = connect(server)
    try:
        c.execute("CREATE TABLE wire_m AS SELECT 1 AS x UNION ALL SELECT 2 AS x")
        c.execute("ALTER TABLE wire_m SET FORMAT MANIFEST")
        c.execute("UPDATE wire_m SET x = 10 WHERE x = 1")
        _, rows, _ = c.execute("SELECT sum(x) AS s FROM wire_m")
        assert rows == [("12",)]
        _, rows, _ = c.execute("SHOW VERSIONS wire_m")
        assert [r[0] for r in rows] == ["1", "2"]
        c.execute("VACUUM wire_m")
        _, rows, _ = c.execute("SELECT sum(x) AS s FROM wire_m")
        assert rows == [("12",)]
    finally:
        c.execute("DROP TABLE wire_m")
        c.close()


def test_error_mentioning_cancel_is_not_query_canceled(server):
    """ADVICE r6: an ordinary failure whose text happens to contain
    'cancel' (an unresolved column named cancel_date) must classify as a
    plain error (42601), not 57014 query_canceled — cancellation is now
    an explicit per-session flag set only by CancelRequest / the
    statement-timeout timer."""
    client = connect(server)
    try:
        with pytest.raises(RuntimeError) as ei:
            client.execute("SELECT cancel_date FROM region")
        assert "[42601]" in str(ei.value)
        assert "[57014]" not in str(ei.value)
    finally:
        client.close()


def test_bind_binary_result_format_refused(server):
    """Honest wire rule: rows are text-format only, so a Bind requesting
    BINARY result columns must error (0A000) instead of sending text
    bytes the client would parse as binary."""
    import socket
    import struct as _struct

    s = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    payload = _struct.pack("!i", 196608) + b"user\x00t\x00database\x00sclera\x00\x00"
    s.sendall(_struct.pack("!i", len(payload) + 4) + payload)

    def read_msg():
        head = s.recv(1)
        ln = _struct.unpack("!i", s.recv(4))[0]
        buf = b""
        while len(buf) < ln - 4:
            chunk = s.recv(ln - 4 - len(buf))
            if not chunk:
                break
            buf += chunk
        return head, buf

    # drain startup responses until ReadyForQuery
    while True:
        head, _ = read_msg()
        if head == b"Z":
            break
    # Parse + Bind with one result-format code = 1 (binary)
    parse = b"\x00" + b"SELECT 1 AS x\x00" + _struct.pack("!h", 0)
    s.sendall(b"P" + _struct.pack("!i", len(parse) + 4) + parse)
    bind = (
        b"\x00" + b"\x00"                 # portal, statement
        + _struct.pack("!h", 0)           # no param formats
        + _struct.pack("!h", 0)           # no params
        + _struct.pack("!hh", 1, 1)       # ONE result format: binary
    )
    s.sendall(b"B" + _struct.pack("!i", len(bind) + 4) + bind)
    s.sendall(b"S" + _struct.pack("!i", 4))  # Sync
    saw_error = False
    while True:
        head, body = read_msg()
        if head == b"E":
            assert b"0A000" in body and b"binary result" in body
            saw_error = True
        if head == b"Z":
            break
    assert saw_error
    # text-format Bind on the same connection still works
    bind_ok = (
        b"\x00" + b"\x00"
        + _struct.pack("!h", 0) + _struct.pack("!h", 0)
        + _struct.pack("!hh", 1, 0)       # ONE result format: text
    )
    s.sendall(b"B" + _struct.pack("!i", len(bind_ok) + 4) + bind_ok)
    execute = b"\x00" + _struct.pack("!i", 0)
    s.sendall(b"E" + _struct.pack("!i", len(execute) + 4) + execute)
    s.sendall(b"S" + _struct.pack("!i", 4))
    saw_row = False
    while True:
        head, body = read_msg()
        if head == b"D":
            saw_row = True
        if head == b"Z":
            break
    assert saw_row
    s.close()


def test_copy_text_codec_roundtrip_fuzz():
    """Property fuzz (no Spark, no psql): the wire COPY TEXT writer and
    the copydata reader are exact inverses over adversarial strings —
    tabs, newlines, carriage returns, backslashes, \\N lookalikes,
    unicode, NULLs. The CSV pair is an exact inverse too: the writer
    quotes empty strings and the reader keeps quoted-empty as ''
    (only an UNQUOTED empty field is NULL, as in PostgreSQL)."""
    import random
    import tempfile

    from sclera_spark.interfaces.copydata import iter_copy_rows
    from sclera_spark.interfaces.server import _Handler

    rng = random.Random(7)
    alphabet = list("ab\t\n\r\\,\"' é日") + ["\\N", "", "x\\ty"]

    def cell():
        if rng.random() < 0.15:
            return None
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))

    rows = [[cell() for _ in range(4)] for _ in range(300)]

    encoded = b"".join(
        _Handler._copy_text_row(r) for r in rows
    )
    with tempfile.NamedTemporaryFile("wb", suffix=".bin", delete=False) as f:
        f.write(encoded)
        path = f.name
    decoded = list(iter_copy_rows(path, "text", header=False))
    assert decoded == rows

    enc_csv = b"".join(
        _Handler._copy_csv_row(r) for r in rows
    )
    with tempfile.NamedTemporaryFile("wb", suffix=".bin", delete=False) as f:
        f.write(enc_csv)
        path = f.name
    dec_csv = list(iter_copy_rows(path, "csv", header=False))
    assert dec_csv == rows


def test_txn_connection_drop_is_implicit_rollback(server):
    """A connection that dies mid-transaction leaves NOTHING visible:
    the buffered inserts were staged outside data/, the teardown
    reclaims them, no manifest version lands."""
    import time

    c = connect(server)
    c.execute(
        "CREATE TABLE wtx AS SELECT r_regionkey AS k FROM region"
    )
    c.execute("ALTER TABLE wtx SET FORMAT MANIFEST")
    _, rows, _ = c.execute("SHOW VERSIONS wtx")
    v0 = len(rows)
    try:
        c2 = connect(server)
        c2.execute("BEGIN")
        _, _, tag = c2.execute("INSERT INTO wtx VALUES (777)")
        assert tag == "INSERT 0 1"
        # inside the txn, the row is NOT yet visible to others
        c3 = connect(server)
        _, rows, _ = c3.execute(
            "SELECT count(*) AS n FROM wtx WHERE k = 777"
        )
        assert rows[0][0] == "0"
        c2.sock.close()  # abrupt drop — implicit rollback
        time.sleep(0.5)  # let the handler teardown run
        _, rows, _ = c3.execute(
            "SELECT count(*) AS n FROM wtx WHERE k = 777"
        )
        assert rows[0][0] == "0"
        _, rows, _ = c3.execute("SHOW VERSIONS wtx")
        assert len(rows) == v0  # no version ever landed
        c3.close()
    finally:
        c.execute("DROP TABLE wtx")
        c.close()


# ------------------------------- r11: transactional UPDATE / DELETE


def _count(c, sql):
    _, rows, _ = c.execute(sql)
    return int(rows[0][0])


def test_txn_update_rollback_leaves_version_unchanged(server):
    """BEGIN; UPDATE; ROLLBACK — the COW swap was only STAGED, so the
    rollback is truthful: no manifest version lands, no row changes,
    and other sessions never saw anything in between."""
    c = connect(server)
    c.execute(
        "CREATE TABLE wupd AS SELECT r_regionkey AS k, r_name AS v "
        "FROM region"
    )
    c.execute("ALTER TABLE wupd SET FORMAT MANIFEST")
    v0 = len(c.execute("SHOW VERSIONS wupd")[1])
    try:
        c.execute("BEGIN")
        _, _, tag = c.execute("UPDATE wupd SET v = 'X' WHERE k = 1")
        assert tag == "UPDATE 1"
        other = connect(server)
        assert _count(other, "SELECT count(*) AS n FROM wupd WHERE v = 'X'") == 0
        c.execute("ROLLBACK")
        assert _count(other, "SELECT count(*) AS n FROM wupd WHERE v = 'X'") == 0
        assert _count(other, "SELECT count(*) AS n FROM wupd") == 5
        assert len(c.execute("SHOW VERSIONS wupd")[1]) == v0
        other.close()
    finally:
        c.execute("DROP TABLE wupd")
        c.close()


def test_txn_insert_delete_commit_is_one_version(server):
    """BEGIN; INSERT; DELETE; COMMIT — both effects land in EXACTLY ONE
    manifest version (the buffered insert's file is added and the
    deleted row's file is swapped in the same atomic commit)."""
    c = connect(server)
    c.execute(
        "CREATE TABLE wdml AS SELECT r_regionkey AS k, r_name AS v "
        "FROM region"
    )
    c.execute("ALTER TABLE wdml SET FORMAT MANIFEST")
    v0 = len(c.execute("SHOW VERSIONS wdml")[1])
    try:
        c.execute("BEGIN")
        _, _, tag = c.execute("INSERT INTO wdml VALUES (99, 'new')")
        assert tag == "INSERT 0 1"
        _, _, tag = c.execute("DELETE FROM wdml WHERE k = 2")
        assert tag == "DELETE 1"
        c.execute("COMMIT")
        assert len(c.execute("SHOW VERSIONS wdml")[1]) == v0 + 1
        assert _count(c, "SELECT count(*) AS n FROM wdml WHERE k = 99") == 1
        assert _count(c, "SELECT count(*) AS n FROM wdml WHERE k = 2") == 0
        assert _count(c, "SELECT count(*) AS n FROM wdml") == 5
    finally:
        c.execute("DROP TABLE wdml")
        c.close()


def test_txn_write_write_conflict_aborts(server):
    """A concurrent autocommit DML that rewrites a file this transaction
    also rewrote makes COMMIT abort LOUDLY (validate-inside-commit):
    the transaction's stale rewrite must never resurrect pre-conflict
    rows. The concurrent committer's change survives alone."""
    c1 = connect(server)
    c1.execute(
        "CREATE TABLE wcft AS SELECT r_regionkey AS k, r_name AS v "
        "FROM region"
    )
    c1.execute("ALTER TABLE wcft SET FORMAT MANIFEST")
    try:
        v0 = len(c1.execute("SHOW VERSIONS wcft")[1])
        c1.execute("BEGIN")
        assert c1.execute("DELETE FROM wcft WHERE k = 1")[2] == "DELETE 1"
        # concurrent session rewrites the SAME row's file and commits
        c2 = connect(server)
        c2.execute("UPDATE wcft SET v = 'won' WHERE k = 1")
        with pytest.raises(RuntimeError, match="concurrent commit"):
            c1.execute("COMMIT")
        # only the autocommit version landed; the delete never happened
        assert len(c2.execute("SHOW VERSIONS wcft")[1]) == v0 + 1
        _, rows, _ = c2.execute("SELECT v FROM wcft WHERE k = 1")
        assert rows == [("won",)]
        assert _count(c2, "SELECT count(*) AS n FROM wcft") == 5
        c2.close()
    finally:
        c1.execute("DROP TABLE wcft")
        c1.close()


def test_txn_second_rewrite_of_same_file_refused(server):
    """Two buffered DMLs whose hit files overlap would replay two
    rewrites of one file (duplicating its surviving rows) — the second
    statement is refused 0A000, the first stays buffered and commits."""
    c = connect(server)
    c.execute(
        "CREATE TABLE wovl AS SELECT k FROM (VALUES (1), (2)) AS t(k)"
    )
    c.execute("ALTER TABLE wovl SET FORMAT MANIFEST")
    c.execute("OPTIMIZE wovl")  # fold both rows into ONE part file
    try:
        c.execute("BEGIN")
        assert c.execute("DELETE FROM wovl WHERE k = 1")[2] == "DELETE 1"
        with pytest.raises(RuntimeError, match="already rewritten"):
            c.execute("UPDATE wovl SET k = 5 WHERE k = 2")
        c.execute("COMMIT")
        _, rows, _ = c.execute("SELECT k FROM wovl ORDER BY k")
        assert rows == [("2",)]
    finally:
        c.execute("DROP TABLE wovl")
        c.close()


def test_txn_quoted_and_qualified_insert(server):
    """r11 (verdict #7): `INSERT INTO "Name"` and `public.name` inside a
    transaction resolve like autocommit (identifiers fold to lowercase,
    `public` is the one served schema); a foreign schema is a loud
    3F000."""
    c = connect(server)
    c.execute("CREATE TABLE wquo AS SELECT 1 AS k")
    c.execute("ALTER TABLE wquo SET FORMAT MANIFEST")
    try:
        v0 = len(c.execute("SHOW VERSIONS wquo")[1])
        c.execute("BEGIN")
        assert c.execute('INSERT INTO "WQUO" VALUES (2)')[2] == "INSERT 0 1"
        assert c.execute("INSERT INTO public.wquo VALUES (3)")[2] == "INSERT 0 1"
        assert (
            c.execute('INSERT INTO "public"."wquo" VALUES (4)')[2]
            == "INSERT 0 1"
        )
        with pytest.raises(RuntimeError, match="does not exist"):
            c.execute("INSERT INTO otherschema.wquo VALUES (9)")
        c.execute("COMMIT")
        assert len(c.execute("SHOW VERSIONS wquo")[1]) == v0 + 1
        assert _count(c, "SELECT count(*) AS n FROM wquo") == 4
    finally:
        c.execute("DROP TABLE wquo")
        c.close()


def test_txn_merge_stages_and_commits_atomically(server):
    """r11: MERGE inside a transaction stages its COW swap + inserts;
    ROLLBACK discards everything, COMMIT lands the whole MERGE with the
    transaction's other statements as ONE version; a second statement
    rewriting the same files is refused."""
    merge_sql = (
        "MERGE INTO wmrg t USING ("
        "SELECT 1 AS k, 'up' AS nv UNION ALL SELECT 99 AS k, 'new' AS nv"
        ") s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.nv "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)"
    )
    c = connect(server)
    c.execute(
        "CREATE TABLE wmrg AS SELECT r_regionkey AS k, r_name AS v "
        "FROM region"
    )
    c.execute("ALTER TABLE wmrg SET FORMAT MANIFEST")
    try:
        v0 = len(c.execute("SHOW VERSIONS wmrg")[1])
        c.execute("BEGIN")
        assert c.execute(merge_sql)[2] == "MERGE 2"
        other = connect(server)
        assert _count(other, "SELECT count(*) AS n FROM wmrg") == 5
        c.execute("ROLLBACK")
        assert _count(other, "SELECT count(*) AS n FROM wmrg") == 5
        assert _count(other, "SELECT count(*) AS n FROM wmrg WHERE v = 'up'") == 0
        assert len(c.execute("SHOW VERSIONS wmrg")[1]) == v0

        c.execute("BEGIN")
        assert c.execute(merge_sql)[2] == "MERGE 2"
        # second rewrite of the k=1 file inside the same txn: refused
        with pytest.raises(RuntimeError, match="already rewritten"):
            c.execute("UPDATE wmrg SET v = 'x' WHERE k = 1")
        assert c.execute("INSERT INTO wmrg VALUES (100, 'ins')")[2] == "INSERT 0 1"
        c.execute("COMMIT")
        assert len(c.execute("SHOW VERSIONS wmrg")[1]) == v0 + 1
        _, rows, _ = c.execute("SELECT v FROM wmrg WHERE k = 1")
        assert rows == [("up",)]
        assert _count(c, "SELECT count(*) AS n FROM wmrg WHERE k IN (99, 100)") == 2
        assert _count(c, "SELECT count(*) AS n FROM wmrg") == 7
        other.close()
    finally:
        c.execute("DROP TABLE wmrg")
        c.close()


def test_txn_savepoints(server):
    """r11: SAVEPOINT marks the buffered work; ROLLBACK TO discards
    exactly the batches staged after the mark (truthfully — they were
    never visible) and destroys later savepoints while staying
    re-rollbackable; RELEASE keeps effects; COMMIT lands the surviving
    work as one version. Outside a txn: 25P01; unknown name: 3B001."""
    c = connect(server)
    with pytest.raises(RuntimeError, match="transaction blocks"):
        c.execute("SAVEPOINT sp0")
    c.execute("CREATE TABLE wsp AS SELECT 1 AS k")
    c.execute("ALTER TABLE wsp SET FORMAT MANIFEST")
    try:
        v0 = len(c.execute("SHOW VERSIONS wsp")[1])
        c.execute("BEGIN")
        c.execute("INSERT INTO wsp VALUES (10)")
        assert c.execute("SAVEPOINT a")[2] == "SAVEPOINT"
        c.execute("INSERT INTO wsp VALUES (20)")
        c.execute("SAVEPOINT b")
        c.execute("INSERT INTO wsp VALUES (30)")
        with pytest.raises(RuntimeError, match="does not exist"):
            c.execute("ROLLBACK TO SAVEPOINT nope")
        # drop 20 and 30; b (later than a) is destroyed, a survives
        assert c.execute("ROLLBACK TO SAVEPOINT a")[2] == "ROLLBACK"
        with pytest.raises(RuntimeError, match="does not exist"):
            c.execute("ROLLBACK TO b")
        c.execute("INSERT INTO wsp VALUES (40)")
        c.execute("ROLLBACK TO a")  # a is re-rollbackable: drops 40
        c.execute("INSERT INTO wsp VALUES (50)")
        assert c.execute("RELEASE SAVEPOINT a")[2] == "RELEASE"
        with pytest.raises(RuntimeError, match="does not exist"):
            c.execute("ROLLBACK TO a")
        c.execute("COMMIT")
        _, rows, _ = c.execute("SELECT k FROM wsp ORDER BY k")
        assert rows == [("1",), ("10",), ("50",)]
        assert len(c.execute("SHOW VERSIONS wsp")[1]) == v0 + 1
        # DML + savepoint interplay: a rolled-back DELETE releases its
        # file reservation, so the same file can be rewritten again
        c.execute("BEGIN")
        c.execute("SAVEPOINT s1")
        assert c.execute("DELETE FROM wsp WHERE k = 10")[2] == "DELETE 1"
        with pytest.raises(RuntimeError, match="already rewritten"):
            c.execute("UPDATE wsp SET k = 11 WHERE k = 10")
        c.execute("ROLLBACK TO s1")
        assert c.execute("UPDATE wsp SET k = 11 WHERE k = 10")[2] == "UPDATE 1"
        c.execute("COMMIT")
        _, rows, _ = c.execute("SELECT k FROM wsp ORDER BY k")
        assert rows == [("1",), ("11",), ("50",)]
    finally:
        c.execute("DROP TABLE wsp")
        c.close()


def test_txn_read_your_own_writes(server):
    """r12: reads inside a transaction see the transaction's own
    buffered writes — INSERT then SELECT sees the row, UPDATE/DELETE
    rewrite staged inserts too, other sessions still see the pre-txn
    snapshot, ROLLBACK discards everything, savepoint rollback restores
    the exact staged state."""
    c = connect(server)
    c.execute(
        "CREATE TABLE wryo AS SELECT 1 AS k, 'a' AS v "
        "UNION ALL SELECT 2, 'b'"
    )
    c.execute("ALTER TABLE wryo SET FORMAT MANIFEST")
    try:
        c.execute("BEGIN")
        assert c.execute("INSERT INTO wryo VALUES (10, 'x')")[2] == "INSERT 0 1"
        # same session: the staged row is visible
        assert _count(c, "SELECT count(*) AS n FROM wryo") == 3
        _, rows, _ = c.execute("SELECT v FROM wryo WHERE k = 10")
        assert rows == [("x",)]
        # aggregates + joins over the overlay work too
        assert _count(
            c,
            "SELECT count(*) AS n FROM wryo a JOIN wryo b ON a.k = b.k",
        ) == 3
        # other sessions: pre-txn snapshot only
        other = connect(server)
        assert _count(other, "SELECT count(*) AS n FROM wryo") == 2
        # UPDATE sees (and rewrites) the same-txn staged insert
        assert c.execute("UPDATE wryo SET v = 'y' WHERE k = 10")[2] == "UPDATE 1"
        _, rows, _ = c.execute("SELECT v FROM wryo WHERE k = 10")
        assert rows == [("y",)]
        # DELETE can un-insert a staged row
        assert c.execute("DELETE FROM wryo WHERE k = 10")[2] == "DELETE 1"
        assert _count(c, "SELECT count(*) AS n FROM wryo") == 2
        # published-row DML still overlays reads: rewrite k=1
        assert c.execute("UPDATE wryo SET v = 'z' WHERE k = 1")[2] == "UPDATE 1"
        _, rows, _ = c.execute("SELECT v FROM wryo WHERE k = 1")
        assert rows == [("z",)]
        assert _count(other, "SELECT count(*) AS n FROM wryo WHERE v = 'z'") == 0
        c.execute("ROLLBACK")
        assert _count(c, "SELECT count(*) AS n FROM wryo") == 2
        _, rows, _ = c.execute("SELECT v FROM wryo WHERE k = 1")
        assert rows == [("a",)]

        # savepoint rollback restores the staged state exactly
        c.execute("BEGIN")
        c.execute("INSERT INTO wryo VALUES (20, 'p')")
        c.execute("SAVEPOINT s")
        assert c.execute("UPDATE wryo SET v = 'q' WHERE k = 20")[2] == "UPDATE 1"
        _, rows, _ = c.execute("SELECT v FROM wryo WHERE k = 20")
        assert rows == [("q",)]
        c.execute("ROLLBACK TO s")
        _, rows, _ = c.execute("SELECT v FROM wryo WHERE k = 20")
        assert rows == [("p",)]  # pre-update staged tuple restored
        c.execute("COMMIT")
        _, rows, _ = c.execute("SELECT v FROM wryo WHERE k = 20")
        assert rows == [("p",)]
        assert _count(other, "SELECT count(*) AS n FROM wryo") == 3
        # MERGE after buffered writes sees the staged rows too (r12):
        # the match updates the same-txn INSERT, the anti-join does
        # NOT re-insert a key the txn already staged
        c.execute("BEGIN")
        c.execute("INSERT INTO wryo VALUES (30, 'm')")
        tag = c.execute(
            "MERGE INTO wryo t USING "
            "(SELECT 30 AS k, 'mm' AS nv UNION ALL SELECT 31, 'nn') s "
            "ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.nv "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)"
        )[2]
        assert tag == "MERGE 2"
        _, rows, _ = c.execute(
            "SELECT k, v FROM wryo WHERE k >= 30 ORDER BY k"
        )
        assert rows == [("30", "mm"), ("31", "nn")]
        assert _count(c, "SELECT count(*) AS n FROM wryo WHERE k = 30") == 1
        # other sessions still see the pre-txn snapshot
        assert _count(other, "SELECT count(*) AS n FROM wryo WHERE k >= 30") == 0
        c.execute("ROLLBACK")
        assert _count(c, "SELECT count(*) AS n FROM wryo WHERE k >= 30") == 0
        other.close()
    finally:
        c.execute("DROP TABLE wryo")
        c.close()


def test_txn_merge_read_your_own_writes(server):
    """r12: MERGE after buffered writes unions the transaction's staged
    parts into its target — matched staged rows update/delete, the
    NOT MATCHED anti-join never duplicates a staged key, published-file
    rewrites defer to COMMIT, savepoints restore the pre-MERGE staged
    state, and a MERGE touching a published file this txn already
    rewrote still refuses."""
    c = connect(server)
    c.execute(
        "CREATE TABLE wmg AS SELECT 1 AS k, 'a' AS v UNION ALL SELECT 2, 'b'"
    )
    c.execute("ALTER TABLE wmg SET FORMAT MANIFEST")
    try:
        other = connect(server)
        # matched-DELETE un-inserts a staged row; published match
        # rewrites defer to COMMIT
        c.execute("BEGIN")
        c.execute("INSERT INTO wmg VALUES (10, 'x')")
        c.execute("SAVEPOINT s")
        tag = c.execute(
            "MERGE INTO wmg t USING "
            "(SELECT 10 AS k UNION ALL SELECT 1) s ON t.k = s.k "
            "WHEN MATCHED THEN DELETE"
        )[2]
        assert tag == "MERGE 2"
        assert _count(c, "SELECT count(*) AS n FROM wmg") == 1
        _, rows, _ = c.execute("SELECT k FROM wmg")
        assert rows == [("2",)]
        # pre-txn snapshot intact elsewhere
        assert _count(other, "SELECT count(*) AS n FROM wmg") == 2
        # savepoint rollback restores the staged insert AND the
        # published row (the COW swap was only staged)
        c.execute("ROLLBACK TO s")
        _, rows, _ = c.execute("SELECT k FROM wmg ORDER BY k")
        assert rows == [("1",), ("2",), ("10",)]
        # a second MERGE now touches the same published file the
        # rolled-back MERGE hit — rollback released the reservation
        tag = c.execute(
            "MERGE INTO wmg t USING (SELECT 10 AS k, 'xx' AS nv "
            "UNION ALL SELECT 2, 'bb') s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.nv"
        )[2]
        assert tag == "MERGE 2"
        _, rows, _ = c.execute("SELECT v FROM wmg ORDER BY k")
        assert rows == [("a",), ("bb",), ("xx",)]
        c.execute("COMMIT")
        _, rows, _ = c.execute("SELECT v FROM wmg ORDER BY k")
        assert rows == [("a",), ("bb",), ("xx",)]
        assert _count(other, "SELECT count(*) AS n FROM wmg") == 3

        # MERGE over rows this txn already rewrote matches the
        # REWRITTEN staged values — the removed published file is
        # overlaid out of the target, exactly like the SELECT path
        c.execute("BEGIN")
        assert c.execute("UPDATE wmg SET v = 'z' WHERE k = 1")[2] == "UPDATE 1"
        tag = c.execute(
            "MERGE INTO wmg t USING (SELECT 1 AS k, 'zz' AS nv) s "
            "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.nv"
        )[2]
        assert tag == "MERGE 1"
        _, rows, _ = c.execute("SELECT v FROM wmg WHERE k = 1")
        assert rows == [("zz",)]
        c.execute("ROLLBACK")
        _, rows, _ = c.execute("SELECT v FROM wmg WHERE k = 1")
        assert rows == [("a",)]
        other.close()
    finally:
        c.execute("DROP TABLE wmg")
        c.close()


def test_txn_merge_using_bare_table_ryow(server):
    """r13 ADVICE: a BARE table after MERGE's USING (no subquery
    wrapper) is a table reference — `MERGE INTO t USING t AS s` must
    read the transaction's buffered overlay of t, and `MERGE INTO a
    USING b` must read the same txn's buffered writes to b. Before the
    fix `using` broke the FROM-list scanner's table-position state, so
    both silently read the published snapshot."""
    c = connect(server)
    c.execute("CREATE TABLE wub AS SELECT 1 AS k, 'a' AS v")
    c.execute("ALTER TABLE wub SET FORMAT MANIFEST")
    c.execute(
        "CREATE TABLE wub2 AS SELECT 1 AS k, 'A' AS nv UNION ALL SELECT 9, 'I'"
    )
    c.execute("ALTER TABLE wub2 SET FORMAT MANIFEST")
    try:
        other = connect(server)
        # self-reference: USING wub AS s sees the staged insert (2,'b'),
        # so matching on k+1 updates row 1... build it so the staged
        # row itself drives the match: source = wub shifted by +1 key
        c.execute("BEGIN")
        c.execute("INSERT INTO wub VALUES (2, 'b')")
        tag = c.execute(
            "MERGE INTO wub t USING wub AS s ON t.k = s.k + 1 "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k + 1, s.v)"
        )[2]
        # staged (2,'b') appears on BOTH sides: row 2 matches source
        # row (1,'a') -> v='a'; source row (2,'b') has no target k=3 ->
        # inserts (3,'b'). Published-snapshot USING would see only
        # (1,'a') and produce MERGE 1.
        assert tag == "MERGE 2"
        _, rows, _ = c.execute("SELECT k, v FROM wub ORDER BY k")
        assert rows == [("1", "a"), ("2", "a"), ("3", "b")]
        c.execute("ROLLBACK")
        assert _count(c, "SELECT count(*) AS n FROM wub") == 1

        # cross-table: USING wub2 (bare) sees this txn's buffered
        # UPDATE of wub2; snapshot-read would write 'A' not 'Z'
        c.execute("BEGIN")
        assert c.execute("UPDATE wub2 SET nv = 'Z' WHERE k = 1")[2] == "UPDATE 1"
        tag = c.execute(
            "MERGE INTO wub t USING wub2 s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.nv"
        )[2]
        assert tag == "MERGE 1"
        _, rows, _ = c.execute("SELECT v FROM wub WHERE k = 1")
        assert rows == [("Z",)]
        c.execute("ROLLBACK")
        # other sessions never saw any of it
        assert _count(other, "SELECT count(*) AS n FROM wub") == 1
        other.close()
    finally:
        try:
            c.execute("ROLLBACK")
        except Exception:
            pass
        c.execute("DROP TABLE wub")
        c.execute("DROP TABLE wub2")
        c.close()


def test_txn_partitioned_import_read_your_own_writes(server, spark, tmp_path):
    """late r12: partitioned Delta imports participate in
    read-your-own-writes too — staged parts carry the partition
    columns physically, imported files keep filling from the log's
    partitionValues, and the overlay unions both populations."""
    from test_delta_import import _mk_partitioned_delta

    d = _mk_partitioned_delta(spark, tmp_path, name="wptab")
    c = connect(server)
    c.execute(f"CREATE TABLE wpt FROM DELTA '{d}'")
    try:
        other = connect(server)
        c.execute("BEGIN")
        # staged insert into a brand-new partition, visible same-session
        assert c.execute(
            "INSERT INTO wpt VALUES (100, 0.5, 7, 'q')"
        )[2] == "INSERT 0 1"
        _, rows, _ = c.execute("SELECT k, v, c, dt FROM wpt WHERE k = 100")
        assert rows == [("100", "0.5", "7", "q")]
        # virtual partition values of IMPORTED files still fill in the
        # same overlay read
        assert _count(
            c, "SELECT count(*) AS n FROM wpt WHERE c = 1 AND dt = 'a'"
        ) == 10
        assert _count(c, "SELECT count(*) AS n FROM wpt") == 41
        assert _count(other, "SELECT count(*) AS n FROM wpt") == 40
        # UPDATE rewrites the staged insert (physical partition cols
        # survive the rewrite)
        assert c.execute(
            "UPDATE wpt SET v = 0.75 WHERE k = 100"
        )[2] == "UPDATE 1"
        _, rows, _ = c.execute("SELECT v, c, dt FROM wpt WHERE k = 100")
        assert rows == [("0.75", "7", "q")]
        # MERGE sees both populations: updates the staged row (k=100)
        # and an imported row (k=5), inserts a fresh key
        tag = c.execute(
            "MERGE INTO wpt t USING ("
            "SELECT 100 AS k, -1.0 AS nv, 7 AS c, 'q' AS dt "
            "UNION ALL SELECT 5, -2.0, 0, '' "
            "UNION ALL SELECT 200, -3.0, 8, 'r') s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.nv "
            "WHEN NOT MATCHED THEN INSERT (k, v, c, dt) "
            "VALUES (s.k, s.nv, s.c, s.dt)"
        )[2]
        assert tag == "MERGE 3"
        _, rows, _ = c.execute(
            "SELECT k, v, c, dt FROM wpt WHERE k IN (100, 5, 200) "
            "ORDER BY k"
        )
        # k=5 keeps its VIRTUAL partition values through the rewrite
        assert rows == [
            ("5", "-2.0", "1", "a"),
            ("100", "-1.0", "7", "q"),
            ("200", "-3.0", "8", "r"),
        ]
        c.execute("COMMIT")
        _, rows, _ = c.execute(
            "SELECT k, v, c, dt FROM wpt WHERE k IN (100, 5, 200) "
            "ORDER BY k"
        )
        assert rows == [
            ("5", "-2.0", "1", "a"),
            ("100", "-1.0", "7", "q"),
            ("200", "-3.0", "8", "r"),
        ]
        assert _count(other, "SELECT count(*) AS n FROM wpt") == 42
        # partition pruning still works over the mixed table
        assert _count(
            other, "SELECT count(*) AS n FROM wpt WHERE c = 7"
        ) == 1
        other.close()
    finally:
        c.execute("DROP TABLE wpt")
        c.close()


def test_txn_create_table(server):
    """Transactional CREATE TABLE (late r12): the table is invisible to
    other sessions until COMMIT registers it; same-session statements
    see and write it; ROLLBACK removes it entirely; savepoints restore
    its manifest version; DROP of the created table undoes creation."""
    c = connect(server)
    other = connect(server)
    # CTAS + INSERT + SELECT inside one txn, the pg pattern
    c.execute("BEGIN")
    assert c.execute(
        "CREATE TABLE wnew AS SELECT 1 AS k, 'a' AS v"
    )[2] == "CREATE TABLE"
    assert c.execute("INSERT INTO wnew VALUES (2, 'b')")[2] == "INSERT 0 1"
    assert _count(c, "SELECT count(*) AS n FROM wnew") == 2
    # invisible elsewhere until COMMIT
    with pytest.raises(RuntimeError):
        other.execute("SELECT count(*) AS n FROM wnew")
    # UPDATE/DELETE with pg tags
    assert c.execute("UPDATE wnew SET v = 'bb' WHERE k = 2")[2] == "UPDATE 1"
    assert c.execute("DELETE FROM wnew WHERE k = 1")[2] == "DELETE 1"
    _, rows, _ = c.execute("SELECT k, v FROM wnew ORDER BY k")
    assert rows == [("2", "bb")]
    c.execute("COMMIT")
    try:
        # registered and visible everywhere now
        _, rows, _ = other.execute("SELECT k, v FROM wnew ORDER BY k")
        assert rows == [("2", "bb")]

        # ROLLBACK removes a created table entirely
        c.execute("BEGIN")
        c.execute("CREATE TABLE wgone AS SELECT 1 AS x")
        assert _count(c, "SELECT count(*) AS n FROM wgone") == 1
        c.execute("ROLLBACK")
        with pytest.raises(RuntimeError):
            c.execute("SELECT count(*) AS n FROM wgone")

        # empty (cols) form + savepoint version restore
        c.execute("BEGIN")
        assert c.execute(
            "CREATE TABLE wsv (k INT, v VARCHAR)"
        )[2] == "CREATE TABLE"
        assert _count(c, "SELECT count(*) AS n FROM wsv") == 0
        c.execute("INSERT INTO wsv VALUES (1, 'x')")
        c.execute("SAVEPOINT s")
        c.execute("INSERT INTO wsv VALUES (2, 'y')")
        assert _count(c, "SELECT count(*) AS n FROM wsv") == 2
        c.execute("ROLLBACK TO s")
        assert _count(c, "SELECT count(*) AS n FROM wsv") == 1
        c.execute("INSERT INTO wsv VALUES (3, 'z')")
        c.execute("ROLLBACK TO s")  # re-rollbackable
        _, rows, _ = c.execute("SELECT k FROM wsv")
        assert rows == [("1",)]
        # savepoint BEFORE the create: rolling back undoes creation
        c.execute("COMMIT")
        c.execute("DROP TABLE wsv")

        c.execute("BEGIN")
        c.execute("SAVEPOINT pre")
        c.execute("CREATE TABLE wpre AS SELECT 7 AS q")
        c.execute("ROLLBACK TO pre")
        with pytest.raises(RuntimeError):
            c.execute("SELECT q FROM wpre")
        c.execute("ROLLBACK")

        # DROP of the created table inside the txn undoes creation
        c.execute("BEGIN")
        c.execute("CREATE TABLE wtmp AS SELECT 1 AS a")
        assert c.execute("DROP TABLE wtmp")[2] == "DROP TABLE"
        with pytest.raises(RuntimeError):
            c.execute("SELECT a FROM wtmp")
        c.execute("COMMIT")
        with pytest.raises(RuntimeError):
            c.execute("SELECT a FROM wtmp")

        # single-object rule: CREATE after buffered DML refuses; a
        # second CREATE refuses; DML on another table refuses
        c.execute("ALTER TABLE wnew SET FORMAT MANIFEST")
        c.execute("BEGIN")
        c.execute("INSERT INTO wnew VALUES (9, 'i')")
        with pytest.raises(RuntimeError, match="ONE object"):
            c.execute("CREATE TABLE wother AS SELECT 1 AS z")
        c.execute("ROLLBACK")
        c.execute("BEGIN")
        c.execute("CREATE TABLE wone AS SELECT 1 AS z")
        with pytest.raises(RuntimeError, match="ONE object"):
            c.execute("CREATE TABLE wtwo AS SELECT 2 AS z")
        with pytest.raises(RuntimeError, match="ONE object"):
            c.execute("INSERT INTO wnew VALUES (10, 'j')")
        c.execute("ROLLBACK")
        # name collisions refuse up front
        c.execute("BEGIN")
        with pytest.raises(RuntimeError, match="already exists"):
            c.execute("CREATE TABLE wnew AS SELECT 1 AS z")
        c.execute("ROLLBACK")
        # other CREATE forms stay refused
        c.execute("BEGIN")
        with pytest.raises(RuntimeError, match="autocommit"):
            c.execute("CREATE VIEW wv AS SELECT 1 AS z")
        c.execute("ROLLBACK")
    finally:
        c.execute("DROP TABLE wnew")
        other.close()
        c.close()


def test_txn_create_commit_collision(server):
    """Two sessions CREATE the same table name in open transactions
    (each builds at its own unique staging path): the first COMMIT
    renames into the warehouse path and registers; the second COMMIT
    aborts 40001, reclaiming ONLY its own staging directory — the
    winner's data is untouched."""
    c1 = connect(server)
    c2 = connect(server)
    try:
        c1.execute("BEGIN")
        c1.execute("CREATE TABLE wrace AS SELECT 1 AS k")
        c2.execute("BEGIN")
        c2.execute("CREATE TABLE wrace AS SELECT 2 AS k")
        # each session sees its own unpublished table
        _, rows, _ = c1.execute("SELECT k FROM wrace")
        assert rows == [("1",)]
        _, rows, _ = c2.execute("SELECT k FROM wrace")
        assert rows == [("2",)]
        c1.execute("COMMIT")
        with pytest.raises(RuntimeError, match="another session"):
            c2.execute("COMMIT")
        # the winner's table survives intact
        _, rows, _ = c2.execute("SELECT k FROM wrace")
        assert rows == [("1",)]
        # after the winner registered, a fresh CREATE refuses up front
        c2.execute("BEGIN")
        with pytest.raises(RuntimeError, match="already exists"):
            c2.execute("CREATE TABLE wrace AS SELECT 3 AS k")
        c2.execute("ROLLBACK")
    finally:
        c1.execute("DROP TABLE wrace")
        c1.close()
        c2.close()


def test_txn_create_savepoint_identity_and_table_form(server):
    """r12 review fixes: (1) ROLLBACK TO a mark recording a created
    table that was later dropped-and-recreated refuses (path identity,
    not name); (2) the pg `TABLE t` form honors the overlay for both
    created and dropped tables; (3) DROP of a catalog-registered but
    unmanaged table defers like any other."""
    c = connect(server)
    try:
        c.execute("BEGIN")
        c.execute("CREATE TABLE wsi AS SELECT 1 AS k")
        c.execute("SAVEPOINT s")
        c.execute("DROP TABLE wsi")  # undoes the creation
        c.execute("CREATE TABLE wsi2 AS SELECT 2 AS k")
        with pytest.raises(RuntimeError, match="already undone"):
            c.execute("ROLLBACK TO s")
        c.execute("ROLLBACK")
        # TABLE form reads the created table...
        c.execute("BEGIN")
        c.execute("CREATE TABLE wtf AS SELECT 5 AS k")
        _, rows, _ = c.execute("TABLE wtf")
        assert rows == [("5",)]
        c.execute("ROLLBACK")
        # ...and refuses a deferred-dropped one
        c.execute("CREATE TABLE wtd AS SELECT 6 AS k")
        c.execute("BEGIN")
        c.execute("DROP TABLE wtd")
        with pytest.raises(RuntimeError, match="does not exist"):
            c.execute("TABLE wtd")
        c.execute("ROLLBACK")
        c.execute("DROP TABLE wtd")
        # unmanaged catalog tables (the module fixture tables) defer too
        c.execute("BEGIN")
        assert c.execute("DROP TABLE region")[2] == "DROP TABLE"
        with pytest.raises(RuntimeError, match="does not exist"):
            c.execute("SELECT count(*) AS n FROM region")
        c.execute("ROLLBACK")
        assert _count(c, "SELECT count(*) AS n FROM region") == 5
    finally:
        c.close()


def test_txn_deferred_drop(server):
    """Transactional DROP TABLE (late r12): the drop defers to COMMIT —
    reads inside the txn refuse 42P01, other sessions still see the
    table, ROLLBACK keeps it."""
    c = connect(server)
    other = connect(server)
    c.execute("CREATE TABLE wdrop AS SELECT 1 AS k")
    try:
        c.execute("BEGIN")
        assert c.execute("DROP TABLE wdrop")[2] == "DROP TABLE"
        # in-txn reads see it gone
        with pytest.raises(RuntimeError, match="does not exist"):
            c.execute("SELECT k FROM wdrop")
        # further mutating statements refuse (single-object txn)
        with pytest.raises(RuntimeError, match="deferred DROP"):
            c.execute("INSERT INTO wdrop VALUES (2)")
        # other sessions unaffected
        assert _count(other, "SELECT count(*) AS n FROM wdrop") == 1
        c.execute("ROLLBACK")
        assert _count(c, "SELECT count(*) AS n FROM wdrop") == 1

        c.execute("BEGIN")
        c.execute("DROP TABLE wdrop")
        c.execute("COMMIT")
        with pytest.raises(RuntimeError):
            other.execute("SELECT count(*) AS n FROM wdrop")
        # nonexistent: IF EXISTS no-ops, plain refuses
        c.execute("BEGIN")
        assert c.execute("DROP TABLE IF EXISTS wdrop")[2] == "DROP TABLE"
        with pytest.raises(RuntimeError, match="does not exist"):
            c.execute("DROP TABLE wdrop")
        c.execute("ROLLBACK")
    finally:
        other.close()
        try:
            c.execute("DROP TABLE wdrop")
        except RuntimeError:
            pass
        c.close()


def test_txn_cte_shadows_transaction_table(server):
    """late-r12 review fix: a CTE alias spelled like the transaction's
    table SHADOWS it (pg scoping) — the overlay rewrite must not fire,
    for buffered, created, and deferred-dropped tables alike; a
    non-shadowing CTE keeps the overlay."""
    c = connect(server)
    c.execute("CREATE TABLE wcte AS SELECT 1 AS k")
    c.execute("ALTER TABLE wcte SET FORMAT MANIFEST")
    try:
        c.execute("BEGIN")
        c.execute("INSERT INTO wcte VALUES (2)")
        _, rows, _ = c.execute(
            "WITH wcte AS (SELECT 99 AS k) SELECT k FROM wcte"
        )
        assert rows == [("99",)]
        assert _count(
            c,
            "WITH other AS (SELECT 1 AS x) "
            "SELECT count(*) AS n FROM wcte",
        ) == 2
        c.execute("ROLLBACK")
        c.execute("BEGIN")
        c.execute("CREATE TABLE wcnew AS SELECT 1 AS k")
        _, rows, _ = c.execute(
            "WITH wcnew AS (SELECT 77 AS k) SELECT k FROM wcnew"
        )
        assert rows == [("77",)]
        c.execute("ROLLBACK")
        c.execute("BEGIN")
        c.execute("DROP TABLE wcte")
        _, rows, _ = c.execute(
            "WITH wcte AS (SELECT 55 AS k) SELECT k FROM wcte"
        )
        assert rows == [("55",)]
        c.execute("ROLLBACK")
    finally:
        c.execute("DROP TABLE wcte")
        c.close()


def test_txn_dropped_check_is_cte_scope_aware(server):
    """ADVICE r12: a CTE named like the deferred-dropped table only
    shadows references INSIDE its scope — an outer-scope reference to
    the real table must still raise 42P01 (pg scoping), and a CTE body
    referencing its own name sees the (dropped) table, not itself."""
    c = connect(server)
    c.execute("CREATE TABLE wscope AS SELECT 1 AS k")
    try:
        c.execute("BEGIN")
        c.execute("DROP TABLE wscope")
        # top-level CTE shadows the whole statement: answers from CTE
        _, rows, _ = c.execute(
            "WITH wscope AS (SELECT 55 AS k) SELECT k FROM wscope"
        )
        assert rows == [("55",)]
        # same-named CTE buried in a subquery does NOT shadow the
        # outer reference: pg raises 42P01, so do we
        with pytest.raises(RuntimeError, match="does not exist"):
            c.execute(
                "SELECT k FROM wscope WHERE k IN (SELECT k FROM "
                "(WITH wscope AS (SELECT 1 AS k) SELECT k FROM wscope) s)"
            )
        # a non-recursive CTE body referencing its own name reads the
        # real (dropped) table, not itself
        with pytest.raises(RuntimeError, match="does not exist"):
            c.execute(
                "WITH wscope AS (SELECT k FROM wscope) "
                "SELECT k FROM wscope"
            )
        c.execute("ROLLBACK")
    finally:
        c.execute("DROP TABLE wscope")
        c.close()


def test_txn_read_same_named_column_not_rewritten(server):
    """r12 review: a SELECT inside a transaction where the buffered
    table's NAME also appears as a column of another table must not
    have the column reference rewritten to the overlay view; and a
    statement not referencing the buffered table at all takes the
    ordinary path."""
    c = connect(server)
    c.execute("CREATE TABLE wcol AS SELECT 1 AS k")
    c.execute("ALTER TABLE wcol SET FORMAT MANIFEST")
    # another table whose COLUMN is named like the buffered table
    c.execute("CREATE TABLE wjobs AS SELECT 7 AS wcol, 'x' AS note")
    try:
        c.execute("BEGIN")
        c.execute("INSERT INTO wcol VALUES (2)")
        # overlay applies when wcol is referenced AS A TABLE
        assert _count(c, "SELECT count(*) AS n FROM wcol") == 2
        # ... and a qualified reference resolves through the overlay
        assert _count(
            c, "SELECT count(*) AS n FROM wcol WHERE wcol.k >= 1"
        ) == 2
        # the same word as a COLUMN of another table is untouched
        _, rows, _ = c.execute("SELECT wcol FROM wjobs")
        assert rows == [("7",)]
        _, rows, _ = c.execute(
            "SELECT w.wcol FROM wjobs w WHERE w.wcol = 7"
        )
        assert rows == [("7",)]
        c.execute("ROLLBACK")
    finally:
        c.execute("DROP TABLE wcol")
        c.execute("DROP TABLE wjobs")
        c.close()


def test_txn_scratch_dirs_reclaimed(server):
    """r12: every scratch dir a transaction ever created (inserts, DML
    snapshot staging, RYOW staged-part rewrites — including tuples
    replaced by later rewrites or savepoint rollbacks) is reclaimed at
    transaction end, on both COMMIT and ROLLBACK."""
    import glob
    import os
    import tempfile

    def scratch_dirs():
        # pid-scoped: concurrent pytest processes on the same host make
        # their own scratch dirs and must not fail this assertion
        return set(
            glob.glob(
                os.path.join(
                    tempfile.gettempdir(),
                    f"sclera_manifest_{os.getpid()}_*",
                )
            )
        )

    c = connect(server)
    c.execute("CREATE TABLE wscr AS SELECT 1 AS k, 'a' AS v")
    c.execute("ALTER TABLE wscr SET FORMAT MANIFEST")
    try:
        before = scratch_dirs()
        c.execute("BEGIN")
        c.execute("INSERT INTO wscr VALUES (10, 'x')")
        c.execute("SAVEPOINT s")
        c.execute("UPDATE wscr SET v = 'y' WHERE k = 10")  # rewrites staged
        c.execute("ROLLBACK TO s")  # restores pre-update staged tuple
        c.execute("UPDATE wscr SET v = 'z' WHERE k = 1")   # snapshot COW
        # MERGE rewrites the staged insert too (replaced tuple retires
        # through the same all_staged ledger)
        c.execute(
            "MERGE INTO wscr t USING (SELECT 10 AS k, 'x' AS nv) s "
            "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.nv"
        )
        c.execute("COMMIT")
        assert scratch_dirs() == before, "COMMIT leaked scratch dirs"
        _, rows, _ = c.execute("SELECT v FROM wscr ORDER BY k")
        assert rows == [("z",), ("x",)]

        c.execute("BEGIN")
        c.execute("INSERT INTO wscr VALUES (20, 'p')")
        c.execute("DELETE FROM wscr WHERE k = 20")  # un-inserts staged
        c.execute("UPDATE wscr SET v = 'q' WHERE k = 1")
        c.execute("ROLLBACK")
        assert scratch_dirs() == before, "ROLLBACK leaked scratch dirs"
        assert _count(c, "SELECT count(*) AS n FROM wscr") == 2
    finally:
        c.execute("DROP TABLE wscr")
        c.close()


def test_txn_multi_table_commit_atomic(server):
    """r13 (VERDICT task 7): a transaction buffers DML on TWO manifest
    tables; reads inside the txn see both tables' own writes (joins
    included), other sessions see neither until COMMIT, ROLLBACK
    discards both, and COMMIT publishes each table exactly one version
    via the cross-table intent journal."""
    c = connect(server)
    other = connect(server)
    c.execute("CREATE TABLE wma AS SELECT 1 AS k")
    c.execute("ALTER TABLE wma SET FORMAT MANIFEST")
    c.execute("CREATE TABLE wmb AS SELECT 10 AS k")
    c.execute("ALTER TABLE wmb SET FORMAT MANIFEST")
    try:
        # ROLLBACK discards both tables' staging
        c.execute("BEGIN")
        assert c.execute("INSERT INTO wma VALUES (2)")[2] == "INSERT 0 1"
        assert c.execute("INSERT INTO wmb VALUES (20)")[2] == "INSERT 0 1"
        assert c.execute("UPDATE wma SET k = 5 WHERE k = 1")[2] == "UPDATE 1"
        # read-your-own-writes across BOTH buffered tables in one join
        assert _count(
            c,
            "SELECT count(*) AS n FROM wma, wmb",
        ) == 4  # {5,2} x {10,20}
        assert _count(other, "SELECT count(*) AS n FROM wma") == 1
        assert _count(other, "SELECT count(*) AS n FROM wmb") == 1
        c.execute("ROLLBACK")
        assert _count(c, "SELECT count(*) AS n FROM wma") == 1
        assert _count(c, "SELECT count(*) AS n FROM wmb") == 1
        # COMMIT publishes both, one version each
        va = len(c.execute("SHOW VERSIONS wma")[1])
        vb = len(c.execute("SHOW VERSIONS wmb")[1])
        c.execute("BEGIN")
        c.execute("INSERT INTO wma VALUES (3)")
        c.execute("DELETE FROM wmb WHERE k = 10")
        c.execute("INSERT INTO wmb VALUES (30)")
        c.execute("COMMIT")
        assert len(c.execute("SHOW VERSIONS wma")[1]) == va + 1
        assert len(c.execute("SHOW VERSIONS wmb")[1]) == vb + 1
        _, rows, _ = c.execute("SELECT k FROM wma ORDER BY k")
        assert rows == [("1",), ("3",)]
        _, rows, _ = other.execute("SELECT k FROM wmb ORDER BY k")
        assert rows == [("30",)]
        # savepoint rollback restores BOTH tables' buffers
        c.execute("BEGIN")
        c.execute("INSERT INTO wma VALUES (4)")
        c.execute("SAVEPOINT sp1")
        c.execute("INSERT INTO wmb VALUES (40)")
        c.execute("ROLLBACK TO SAVEPOINT sp1")
        assert _count(c, "SELECT count(*) AS n FROM wmb") == 1
        assert _count(c, "SELECT count(*) AS n FROM wma") == 3
        c.execute("COMMIT")
        _, rows, _ = c.execute("SELECT k FROM wma ORDER BY k")
        assert rows == [("1",), ("3",), ("4",)]
        assert _count(c, "SELECT count(*) AS n FROM wmb") == 1
    finally:
        other.close()
        c.execute("DROP TABLE wma")
        c.execute("DROP TABLE wmb")
        c.close()


def test_txn_multi_table_cas_refused_at_statement(server):
    """r14: MIXED flock+CAS transactions refuse 0A000 at statement
    time (their commit points live in different stores); single-table
    CAS transactions and ALL-CAS multi-table transactions both work
    (the latter journals as an object in the CAS store)."""
    c = connect(server)
    c.execute("CREATE TABLE wcas AS SELECT 1 AS k")
    c.execute("ALTER TABLE wcas SET FORMAT MANIFEST CAS")
    c.execute("CREATE TABLE wpln AS SELECT 1 AS k")
    c.execute("ALTER TABLE wpln SET FORMAT MANIFEST")
    try:
        # single-table CAS txn: fine
        c.execute("BEGIN")
        assert c.execute("INSERT INTO wcas VALUES (2)")[2] == "INSERT 0 1"
        c.execute("COMMIT")
        assert _count(c, "SELECT count(*) AS n FROM wcas") == 2
        # CAS + plain in one txn: refused when the second table enters
        c.execute("BEGIN")
        c.execute("INSERT INTO wpln VALUES (2)")
        with pytest.raises(RuntimeError, match="MIX CAS-backed"):
            c.execute("INSERT INTO wcas VALUES (3)")
        c.execute("ROLLBACK")
        assert _count(c, "SELECT count(*) AS n FROM wcas") == 2
        assert _count(c, "SELECT count(*) AS n FROM wpln") == 1
    finally:
        c.execute("DROP TABLE wcas")
        c.execute("DROP TABLE wpln")
        c.close()


def test_txn_multi_table_all_cas_commit_atomic(server):
    """r14 (VERDICT r13 task 6): TWO CAS-backed tables in one wire
    transaction commit atomically through the CAS journal object —
    both tables land exactly one new version, mid-txn reads see the
    buffered rows, another session keeps the pre-txn snapshots until
    COMMIT, and ROLLBACK lands nothing."""
    c = connect(server)
    for t in ("wc2a", "wc2b"):
        c.execute(f"CREATE TABLE {t} AS SELECT 1 AS k, 'a' AS v")
        c.execute(f"ALTER TABLE {t} SET FORMAT MANIFEST CAS")
    try:
        other = connect(server)
        v0 = {
            t: len(c.execute(f"SHOW VERSIONS {t}")[1])
            for t in ("wc2a", "wc2b")
        }
        c.execute("BEGIN")
        assert c.execute("INSERT INTO wc2a VALUES (2, 'b')")[2] == "INSERT 0 1"
        assert c.execute("INSERT INTO wc2b VALUES (3, 'c')")[2] == "INSERT 0 1"
        assert c.execute("UPDATE wc2b SET v = 'cc' WHERE k = 3")[2] == "UPDATE 1"
        # mid-txn cross-table read over both buffers
        _, rows, _ = c.execute(
            "SELECT a.k AS ak, b.k AS bk FROM wc2a a, wc2b b "
            "WHERE a.k = 2 AND b.k = 3"
        )
        assert rows == [("2", "3")]
        # other session: pre-txn snapshots
        assert _count(other, "SELECT count(*) AS n FROM wc2a") == 1
        assert _count(other, "SELECT count(*) AS n FROM wc2b") == 1
        c.execute("COMMIT")
        assert _count(other, "SELECT count(*) AS n FROM wc2a") == 2
        _, rows, _ = other.execute("SELECT v FROM wc2b WHERE k = 3")
        assert rows == [("cc",)]
        # exactly ONE version landed per table
        for t in ("wc2a", "wc2b"):
            assert len(c.execute(f"SHOW VERSIONS {t}")[1]) == v0[t] + 1
        # ROLLBACK lands nothing on either
        c.execute("BEGIN")
        c.execute("INSERT INTO wc2a VALUES (10, 'x')")
        c.execute("INSERT INTO wc2b VALUES (11, 'y')")
        c.execute("ROLLBACK")
        for t in ("wc2a", "wc2b"):
            assert len(c.execute(f"SHOW VERSIONS {t}")[1]) == v0[t] + 1
        assert _count(c, "SELECT count(*) AS n FROM wc2a") == 2
        other.close()
    finally:
        c.execute("DROP TABLE wc2a")
        c.execute("DROP TABLE wc2b")
        c.close()


def test_txn_dml_sources_read_buffered_tables(server):
    """r13 cross-table RYOW for DML SOURCES: INSERT ... SELECT,
    UPDATE ... WHERE (subquery), and MERGE ... USING referencing a
    table buffered by the SAME transaction read its overlay (staged
    rows included) — and an INSERT's source sees its own target's
    earlier inserts (pg semantics)."""
    c = connect(server)
    c.execute("CREATE TABLE wra AS SELECT 1 AS k")
    c.execute("ALTER TABLE wra SET FORMAT MANIFEST")
    c.execute("CREATE TABLE wrb AS SELECT 100 AS k")
    c.execute("ALTER TABLE wrb SET FORMAT MANIFEST")
    try:
        c.execute("BEGIN")
        c.execute("INSERT INTO wra VALUES (2)")
        # the SELECT source sees wra's staged row (k=2)
        assert (
            c.execute("INSERT INTO wrb SELECT k + 200 FROM wra")[2]
            == "INSERT 0 2"
        )
        assert _count(c, "SELECT count(*) AS n FROM wrb") == 3
        # predicate subquery over the buffered sibling
        assert (
            c.execute(
                "UPDATE wrb SET k = k + 1000 "
                "WHERE k IN (SELECT k + 200 FROM wra)"
            )[2]
            == "UPDATE 2"
        )
        # SELF-RYOW: the source sees the target's own staged rows
        assert (
            c.execute("INSERT INTO wra SELECT k + 10 FROM wra")[2]
            == "INSERT 0 2"
        )
        c.execute("COMMIT")
        _, rows, _ = c.execute("SELECT k FROM wra ORDER BY k")
        assert rows == [("1",), ("2",), ("11",), ("12",)] or [
            int(k) for (k,) in rows
        ] == [1, 2, 11, 12]
        _, rows, _ = c.execute("SELECT k FROM wrb ORDER BY k")
        assert [int(k) for (k,) in rows] == [100, 1201, 1202]
        # MERGE USING a buffered sibling's overlay
        c.execute("BEGIN")
        c.execute("INSERT INTO wra VALUES (50)")
        assert (
            c.execute(
                "MERGE INTO wrb t USING "
                "(SELECT k * 3 AS k FROM wra WHERE k = 50) s "
                "ON t.k = s.k "
                "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)"
            )[2]
            == "MERGE 1"
        )
        c.execute("COMMIT")
        assert _count(c, "SELECT count(*) AS n FROM wrb WHERE k = 150") == 1
    finally:
        c.execute("DROP TABLE wra")
        c.execute("DROP TABLE wrb")
        c.close()


def test_txn_dml_self_reference_subquery_sees_buffer(server):
    """r13 review: a predicate subquery (or USING source) reading the
    statement's OWN target resolves against the transaction's buffered
    state, not the published snapshot — pg's statement snapshot
    includes the transaction's earlier writes. The outer scan and any
    correlated `t.col` qualifiers keep their scoping (the swap is
    `view AS t`, FROM-positions only)."""
    c = connect(server)
    c.execute("CREATE TABLE selfr AS SELECT 1 AS k")
    c.execute("ALTER TABLE selfr SET FORMAT MANIFEST")
    try:
        c.execute("BEGIN")
        c.execute("INSERT INTO selfr VALUES (5)")
        # pg: the subquery's selfr sees the staged k=5, so the DELETE
        # un-inserts it (and deletes the published 1 too)
        assert (
            c.execute(
                "DELETE FROM selfr WHERE k IN (SELECT k FROM selfr)"
            )[2]
            == "DELETE 2"
        )
        assert _count(c, "SELECT count(*) AS n FROM selfr") == 0
        c.execute("ROLLBACK")
        assert _count(c, "SELECT count(*) AS n FROM selfr") == 1
        # UPDATE with a self-aggregate subquery: max over published+staged
        c.execute("BEGIN")
        c.execute("INSERT INTO selfr VALUES (10)")
        assert (
            c.execute(
                "UPDATE selfr SET k = k + 100 "
                "WHERE k = (SELECT max(k) FROM selfr)"
            )[2]
            == "UPDATE 1"
        )
        c.execute("COMMIT")
        _, rows, _ = c.execute("SELECT k FROM selfr ORDER BY k")
        assert [int(k) for (k,) in rows] == [1, 110]
        # aliased self-reference in the subquery keeps working
        c.execute("BEGIN")
        c.execute("INSERT INTO selfr VALUES (7)")
        assert (
            c.execute(
                "DELETE FROM selfr WHERE k IN "
                "(SELECT s2.k FROM selfr s2 WHERE s2.k < 100)"
            )[2]
            == "DELETE 2"
        )
        c.execute("COMMIT")
        _, rows, _ = c.execute("SELECT k FROM selfr ORDER BY k")
        assert [int(k) for (k,) in rows] == [110]
    finally:
        c.execute("DROP TABLE selfr")
        c.close()
