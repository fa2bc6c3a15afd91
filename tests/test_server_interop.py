"""Wire-server interop against an INDEPENDENTLY-IMPLEMENTED client: psql
(libpq). Unlike test_server.py — whose WireClient shares this repo's
codec, so a symmetric framing bug could pass its own parity suite — psql
is the reference implementation's own client: startup (SSLRequest
negotiation), trust auth, simple protocol, error frames, UTF-8, arrays
and NULLs all cross a codec this repo did not write. Mirrors the
reference's real-DriverManager JDBC tier (JDBCTestSuite.scala:24-93).

Also covers pg CancelRequest: a second connection carrying the first's
BackendKeyData (pid, secret) cancels its running Spark job group.
"""

from __future__ import annotations

import shutil
import socket
import struct
import subprocess

import pytest

from sclera_spark.engine import ScleraEngine
from sclera_spark.interfaces import ScleraServer

psql = shutil.which("psql")
pytestmark = pytest.mark.skipif(psql is None, reason="psql not installed")


@pytest.fixture(scope="module")
def server(spark, tables):
    engine = ScleraEngine(spark)
    for name, df in tables.items():
        engine.add_table(name, df)
    srv = ScleraServer(engine).start()
    yield srv
    srv.stop()


def run_psql(server, sql: str, *extra: str):
    """psql in tuples-only unaligned mode; returns (rc, stdout, stderr)."""
    proc = subprocess.run(
        [
            psql, "-h", "127.0.0.1", "-p", str(server.port),
            "-U", "sclera", "-d", "sclera", "-X", "-At", *extra, "-c", sql,
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    return proc.returncode, proc.stdout, proc.stderr


def test_psql_connects_and_selects(server):
    rc, out, err = run_psql(server, "select 'b''ar' as foo")
    assert rc == 0, err
    assert out.strip() == "b'ar"


def test_psql_real_table_and_types(server):
    rc, out, err = run_psql(
        server,
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    )
    assert rc == 0, err
    lines = [ln.split("|") for ln in out.strip().splitlines()]
    assert len(lines) == 5
    assert lines[0] == ["0", "AFRICA"]


def test_psql_utf8_null_and_array_cells(server):
    rc, out, err = run_psql(
        server,
        "SELECT 'héllo wörld' AS s, CAST(NULL AS INT) AS n, array(1, 2, 3) AS a",
    )
    assert rc == 0, err
    s, n, a = out.strip().split("|")
    assert s == "héllo wörld"
    assert n == ""  # NULL renders empty in -At mode
    assert a == "{1,2,3}"


def test_psql_error_frame_and_recovery(server):
    rc, out, err = run_psql(server, "SELECT * FROM no_such_table_xyz")
    assert rc != 0
    assert "ERROR" in err
    # server survives the error: a fresh connection still works
    rc, out, err = run_psql(server, "SELECT count(*) AS n FROM nation")
    assert rc == 0, err
    assert out.strip() == "25"


def test_psql_multi_statement_and_aggregate(server):
    rc, out, err = run_psql(
        server,
        "SELECT count(*) AS n FROM region; "
        "SELECT max(n_nationkey) AS m FROM nation",
    )
    assert rc == 0, err
    assert out.strip().splitlines() == ["5", "24"]


def test_psql_metadata_introspection(server):
    rc, out, err = run_psql(
        server,
        "SELECT relname FROM pg_class WHERE relkind = 'r' ORDER BY relname",
    )
    assert rc == 0, err
    names = out.strip().splitlines()
    assert "region" in names and "nation" in names


def _recv_until_ready(sock) -> dict:
    """Read backend messages until ReadyForQuery; return BackendKeyData."""
    buf = b""
    key = {}
    while True:
        chunk = sock.recv(65536)
        if not chunk:
            raise ConnectionError("server closed during startup")
        buf += chunk
        while len(buf) >= 5:
            t = buf[:1]
            (ln,) = struct.unpack("!i", buf[1:5])
            if len(buf) < 1 + ln:
                break
            payload = buf[5 : 1 + ln]
            buf = buf[1 + ln :]
            if t == b"K":
                key["pid"], key["secret"] = struct.unpack("!ii", payload)
            if t == b"Z":
                return key


def test_cancel_request_kills_running_job(server, spark):
    """pg CancelRequest semantics: connection A starts a long-running
    query; connection B sends CancelRequest with A's key; A gets an
    error frame (sqlstate 57014) instead of the result. Raw-socket
    frontend here on purpose — the cancel path must not depend on any
    client library's goodwill."""
    a = socket.create_connection(("127.0.0.1", server.port), timeout=60)
    params = b"user\x00sclera\x00database\x00sclera\x00\x00"
    a.sendall(struct.pack("!ii", len(params) + 8, 196608) + params)
    key = _recv_until_ready(a)
    assert key.get("pid") and key.get("secret") is not None

    # a query slow enough to outlive the cancel round-trip (~36M-row
    # cartesian with a per-row md5) but bounded if cancel were broken
    slow = (
        "SELECT count(*) AS n FROM lineitem l1, lineitem l2 "
        "WHERE md5(cast(l1.l_quantity + l2.l_quantity + l1.l_orderkey "
        "AS string)) LIKE '%zzzz%'"
    )
    q = slow.encode() + b"\x00"
    a.sendall(b"Q" + struct.pack("!i", len(q) + 4) + q)

    import time

    time.sleep(1.0)  # let the job start
    b = socket.create_connection(("127.0.0.1", server.port), timeout=60)
    b.sendall(struct.pack("!iiii", 16, 80877102, key["pid"], key["secret"]))
    b.close()

    # A must now receive an ErrorResponse (57014) and ReadyForQuery
    buf = b""
    a.settimeout(90)
    state = None
    while True:
        chunk = a.recv(65536)
        if not chunk:
            break
        buf += chunk
        done = False
        while len(buf) >= 5:
            t = buf[:1]
            (ln,) = struct.unpack("!i", buf[1:5])
            if len(buf) < 1 + ln:
                break
            payload = buf[5 : 1 + ln]
            buf = buf[1 + ln :]
            if t == b"E":
                fields = payload.split(b"\x00")
                for f in fields:
                    if f[:1] == b"C":
                        state = f[1:].decode()
            if t == b"Z":
                done = True
        if done:
            break
    a.close()
    assert state == "57014", f"expected query_canceled, got {state!r}"


def test_statement_timeout_via_psql(server):
    """SET statement_timeout is honored (pg semantics, ms): a query past
    the deadline dies with sqlstate 57014 through the same job-group
    kill path as CancelRequest; the session survives and a fast query
    still runs after raising the timeout back."""
    sql = (
        "SET statement_timeout = 400; "
        "SELECT count(*) AS n FROM lineitem l1, lineitem l2 "
        "WHERE md5(cast(l1.l_quantity + l2.l_quantity + l1.l_orderkey "
        "AS string)) LIKE '%zzzz%'"
    )
    rc, out, err = run_psql(server, sql)
    assert rc != 0 and ("cancel" in err.lower() or "57014" in err)
    rc, out, err = run_psql(
        server, "SET statement_timeout = 0; SELECT 1 + 1 AS two"
    )
    assert rc == 0, err
    assert out.strip().splitlines()[-1] == "2"  # psql echoes the SET tag


# ------------------------------------------------------- TLS + SCRAM (r7)


@pytest.fixture(scope="module")
def secure_server(spark, tables):
    """A server with a self-signed cert and SCRAM-SHA-256 credentials:
    TLS on, cleartext refused by default."""
    engine = ScleraEngine(spark)
    for name, df in tables.items():
        engine.add_table(name, df)
    srv = ScleraServer(
        engine, tls="auto", auth={"alice": "s3cret-pw", "bob": "other"}
    ).start()
    yield srv
    srv.stop()


def run_psql_conninfo(server, conninfo_extra: str, sql: str, password: str | None):
    import os

    env = dict(os.environ)
    if password is not None:
        env["PGPASSWORD"] = password
    conninfo = (
        f"host=127.0.0.1 port={server.port} user=alice dbname=sclera "
        + conninfo_extra
    )
    proc = subprocess.run(
        [psql, conninfo, "-X", "-At", "-c", sql],
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
    )
    return proc.returncode, proc.stdout, proc.stderr


def test_psql_tls_scram_connects(secure_server):
    """The r6 verdict's done-criterion: psql negotiates sslmode=require
    TLS (server's self-signed cert) and authenticates via the full
    SCRAM-SHA-256 exchange, then runs a real query."""
    rc, out, err = run_psql_conninfo(
        secure_server,
        "sslmode=require",
        "SELECT count(*) AS n FROM nation",
        "s3cret-pw",
    )
    assert rc == 0, err
    assert out.strip() == "25"


def test_psql_tls_wrong_password_refused(secure_server):
    rc, out, err = run_psql_conninfo(
        secure_server, "sslmode=require", "SELECT 1", "wrong-pw"
    )
    assert rc != 0
    assert "authentication failed" in err.lower()


def test_psql_tls_unknown_user_refused(secure_server):
    import os

    env = dict(os.environ)
    env["PGPASSWORD"] = "s3cret-pw"
    proc = subprocess.run(
        [
            psql,
            f"host=127.0.0.1 port={secure_server.port} user=mallory "
            "dbname=sclera sslmode=require",
            "-X", "-At", "-c", "SELECT 1",
        ],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert proc.returncode != 0
    assert "authentication failed" in proc.stderr.lower()


def test_psql_cleartext_refused_when_tls_configured(secure_server):
    """With TLS configured the cleartext path is closed by default:
    sslmode=disable must be turned away before authentication."""
    rc, out, err = run_psql_conninfo(
        secure_server, "sslmode=disable", "SELECT 1", "s3cret-pw"
    )
    assert rc != 0
    assert "ssl required" in err.lower() or "28000" in err


def test_scram_exchange_unit_roundtrip():
    """Pure-python client side of RFC 5802 against ScramExchange — pins
    the crypto independently of libpq."""
    import base64
    import hashlib
    import hmac as hm

    from sclera_spark.interfaces.auth import (
        AuthFailed,
        ScramCredential,
        ScramExchange,
    )

    cred = ScramCredential.from_password("pw123", salt=b"0123456789abcdef")
    ex = ScramExchange(cred)
    cfirst_bare = "n=,r=clientnonceXYZ"
    sfirst = ex.first(f"n,,{cfirst_bare}".encode()).decode()
    attrs = dict(p.split("=", 1) for p in sfirst.split(","))
    assert attrs["r"].startswith("clientnonceXYZ") and attrs["i"] == "4096"
    salted = hashlib.pbkdf2_hmac(
        "sha256", b"pw123", base64.b64decode(attrs["s"]), int(attrs["i"])
    )
    ckey = hm.new(salted, b"Client Key", hashlib.sha256).digest()
    cfinal_bare = f"c=biws,r={attrs['r']}"
    auth_msg = f"{cfirst_bare},{sfirst},{cfinal_bare}".encode()
    csig = hm.new(hashlib.sha256(ckey).digest(), auth_msg, hashlib.sha256).digest()
    proof = bytes(a ^ b for a, b in zip(ckey, csig))
    sfinal = ex.final(
        (cfinal_bare + ",p=" + base64.b64encode(proof).decode()).encode()
    )
    skey = hm.new(salted, b"Server Key", hashlib.sha256).digest()
    expect_v = base64.b64encode(hm.new(skey, auth_msg, hashlib.sha256).digest())
    assert sfinal == b"v=" + expect_v  # mutual auth: server proves ServerKey

    # a tampered proof fails
    ex2 = ScramExchange(cred)
    sfirst2 = ex2.first(f"n,,{cfirst_bare}".encode()).decode()
    r2 = dict(p.split("=", 1) for p in sfirst2.split(","))["r"]
    bad = base64.b64encode(b"\x00" * 32).decode()
    with pytest.raises(AuthFailed):
        ex2.final(f"c=biws,r={r2},p={bad}".encode())


def test_wireclient_tls_scram_roundtrip(secure_server):
    """This repo's own client over the secure path: TLS wrap + client
    SCRAM with server-signature verification (mutual auth), then both
    protocols' query paths — so the wire fuzz corpus can ride the
    secure server too."""
    from sclera_spark.interfaces import WireClient

    c = WireClient(
        "127.0.0.1", secure_server.port, user="alice",
        tls=True, password="s3cret-pw",
    )
    try:
        cols, rows, _ = c.execute(
            "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 3"
        )
        assert cols == ["n_nationkey", "n_name"]
        assert [r[0] for r in rows] == ["0", "1", "2"]
        cols2, rows2, _ = c.execute_extended(
            "SELECT count(*) AS n FROM region WHERE r_regionkey < $1", (3,)
        )
        assert rows2 == [("3",)]
    finally:
        c.close()

    # wrong password fails with the server's 28P01 before any query
    with pytest.raises((RuntimeError, ConnectionError), match="authentication|28P01"):
        WireClient(
            "127.0.0.1", secure_server.port, user="alice",
            tls=True, password="nope",
        )


def test_malformed_sasl_messages_fail_cleanly(secure_server):
    """Garbage at each stage of the auth exchange must produce an error
    frame / clean disconnect — never a hung session thread or a
    traceback-crashed handler (the server must survive for the next
    client, asserted by a real login afterwards)."""
    import socket as _socket

    def tls_sock():
        import ssl

        s = _socket.create_connection(("127.0.0.1", secure_server.port), timeout=30)
        s.sendall(struct.pack("!ii", 8, 80877103))
        assert s.recv(1) == b"S"
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        return ctx.wrap_socket(s)

    def startup(s, user=b"alice"):
        params = b"user\x00" + user + b"\x00database\x00sclera\x00\x00"
        payload = struct.pack("!i", 196608) + params
        s.sendall(struct.pack("!i", len(payload) + 4) + payload)

    def read_msg(s):
        head = s.recv(1)
        if not head:
            return None, b""
        ln = struct.unpack("!i", s.recv(4))[0]
        buf = b""
        while len(buf) < ln - 4:
            chunk = s.recv(ln - 4 - len(buf))
            if not chunk:
                break
            buf += chunk
        return head, buf

    # 1: bogus mechanism name
    s = tls_sock()
    startup(s)
    head, _ = read_msg(s)
    assert head == b"R"  # AuthenticationSASL
    init = b"NOT-A-MECH\x00" + struct.pack("!i", 3) + b"n,,"
    s.sendall(b"p" + struct.pack("!i", len(init) + 4) + init)
    head, payload = read_msg(s)
    assert head == b"E" and b"28P01" in payload
    s.close()

    # 2: structurally-invalid client-first message
    s = tls_sock()
    startup(s)
    read_msg(s)
    body = b"\xff\xfe garbage not scram"
    init = b"SCRAM-SHA-256\x00" + struct.pack("!i", len(body)) + body
    s.sendall(b"p" + struct.pack("!i", len(init) + 4) + init)
    head, payload = read_msg(s)
    assert head == b"E" and b"28P01" in payload
    s.close()

    # 3: client disconnects mid-exchange — server thread must not wedge
    s = tls_sock()
    startup(s)
    read_msg(s)
    s.close()

    # the server is still healthy: a real login works
    rc, out, err = run_psql_conninfo(
        secure_server, "sslmode=require", "SELECT 1 AS x", "s3cret-pw"
    )
    assert rc == 0, err
    assert out.strip() == "1"


def test_psql_manifest_maintenance_statements(server):
    """Maintenance DDL over the wire: a psql session can upgrade a table
    to manifest format, mutate it, inspect versions, compact and vacuum
    — the full table-ops lifecycle through the serving boundary."""
    stmts = (
        "CREATE TABLE wt AS SELECT r_regionkey AS k, r_name AS v FROM region; "
        "ALTER TABLE wt SET FORMAT MANIFEST; "
        "INSERT INTO wt VALUES (99, 'extra'); "
        "SHOW VERSIONS wt; "
        "OPTIMIZE wt TARGET 64 MB; "
        "VACUUM wt; "
        "SELECT count(*) AS n FROM wt"
    )
    rc, out, err = run_psql(server, stmts)
    assert rc == 0, err
    assert out.strip().splitlines()[-1] == "6"
    run_psql(server, "DROP TABLE wt")


def _sasl_server_first(port: int, user: bytes) -> bytes:
    """Raw-socket SASL probe over TLS: startup as `user`, send a valid
    client-first, return the server-first message (r=...,s=salt,i=n)."""
    import socket as _socket
    import ssl

    s = _socket.create_connection(("127.0.0.1", port), timeout=30)
    s.sendall(struct.pack("!ii", 8, 80877103))
    assert s.recv(1) == b"S"
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    s = ctx.wrap_socket(s)
    params = b"user\x00" + user + b"\x00database\x00sclera\x00\x00"
    payload = struct.pack("!i", 196608) + params
    s.sendall(struct.pack("!i", len(payload) + 4) + payload)
    head = s.recv(1)
    assert head == b"R"
    ln = struct.unpack("!i", s.recv(4))[0]
    s.recv(ln - 4)
    body = b"n,,n=" + user + b",r=cccccccccccccccc"
    init = b"SCRAM-SHA-256\x00" + struct.pack("!i", len(body)) + body
    s.sendall(b"p" + struct.pack("!i", len(init) + 4) + init)
    head = s.recv(1)
    assert head == b"R"
    ln = struct.unpack("!i", s.recv(4))[0]
    buf = b""
    while len(buf) < ln - 4:
        chunk = s.recv(ln - 4 - len(buf))
        if not chunk:
            break
        buf += chunk
    s.close()
    return buf[4:]  # strip the int32 SASL code (11 = continue)


def test_mock_scram_salt_stable_for_unknown_user(secure_server):
    """User existence must not be probeable via salt churn: two SASL
    exchanges for the SAME unknown username must return the SAME salt
    (deterministic mock credentials, as PostgreSQL's mock auth), while
    a different unknown username gets a different salt."""

    def salt_of(server_first: bytes) -> bytes:
        fields = dict(f.split(b"=", 1) for f in server_first.split(b","))
        return fields[b"s"]

    a1 = salt_of(_sasl_server_first(secure_server.port, b"mallory"))
    a2 = salt_of(_sasl_server_first(secure_server.port, b"mallory"))
    b1 = salt_of(_sasl_server_first(secure_server.port, b"trudy"))
    assert a1 == a2, "same unknown user saw two different mock salts"
    assert a1 != b1, "mock salt must vary by username"


def test_preauth_message_length_bounds(server):
    """Client-controlled pre-auth lengths are bounded: a startup packet
    claiming a multi-GB (or negative) length is rejected with an error
    frame / disconnect BEFORE any payload buffering, and the server
    stays healthy for the next client."""
    import socket as _socket

    for bogus in (2**30, 3, -1):
        s = _socket.create_connection(("127.0.0.1", server.port), timeout=30)
        s.settimeout(30)
        s.sendall(struct.pack("!i", bogus))
        try:
            head = s.recv(1)
            # error frame (E) or immediate close are both acceptable
            assert head in (b"E", b"")
        except (ConnectionError, OSError):
            pass
        s.close()

    rc, out, err = run_psql(server, "SELECT 1 AS x")
    assert rc == 0, err
    assert out.strip() == "1"


@pytest.mark.slowstress
def test_transactions_on_manifest_tables(server):
    """r10 (verdict #4): REAL single-table transactions — BEGIN buffers
    manifest-table INSERTs as staged files, COMMIT publishes them all
    as ONE atomic manifest version, ROLLBACK discards the staging so
    nothing was ever visible. Whatever a rollback could not undo is
    refused (0A000) inside the transaction."""
    run_psql(server, "DROP TABLE txt")  # clean slate if rerun
    rc, out, err = run_psql(
        server, "CREATE TABLE txt AS SELECT r_regionkey AS k FROM region"
    )
    assert rc == 0, err
    rc, out, err = run_psql(server, "ALTER TABLE txt SET FORMAT MANIFEST")
    assert rc == 0, err
    rc, out, err = run_psql(server, "SHOW VERSIONS txt")
    assert rc == 0, err
    v0 = len(out.strip().splitlines())

    # bare BEGIN/ROLLBACK: harmless no-op (clients emit on connect)
    rc, out, err = run_psql(server, "BEGIN; ROLLBACK; SELECT 1 AS x")
    assert rc == 0, err
    assert out.strip().splitlines()[-1] == "1"

    # BEGIN; INSERT; INSERT; ROLLBACK -> no new version, no rows
    rc, out, err = run_psql(
        server,
        "BEGIN; INSERT INTO txt VALUES (99); "
        "INSERT INTO txt VALUES (98); ROLLBACK",
    )
    assert rc == 0, err
    rc, out, err = run_psql(
        server, "SELECT count(*) AS n FROM txt WHERE k IN (98, 99)"
    )
    assert rc == 0, err
    assert out.strip() == "0"  # truly rolled back
    rc, out, err = run_psql(server, "SHOW VERSIONS txt")
    assert len(out.strip().splitlines()) == v0  # no version landed

    # BEGIN; INSERT; INSERT; COMMIT -> EXACTLY ONE new version, both rows
    rc, out, err = run_psql(
        server,
        "BEGIN; INSERT INTO txt VALUES (99); "
        "INSERT INTO txt VALUES (98); COMMIT",
    )
    assert rc == 0, err
    rc, out, err = run_psql(
        server, "SELECT count(*) AS n FROM txt WHERE k IN (98, 99)"
    )
    assert out.strip() == "2"
    rc, out, err = run_psql(server, "SHOW VERSIONS txt")
    assert len(out.strip().splitlines()) == v0 + 1  # ONE atomic commit

    # r11: DELETE inside a transaction is REAL — staged COW swap,
    # published at COMMIT as part of the same single version
    rc, out, err = run_psql(
        server, "BEGIN; DELETE FROM txt WHERE k = 99; COMMIT"
    )
    assert rc == 0, err
    rc, out, err = run_psql(
        server, "SELECT count(*) AS n FROM txt WHERE k = 99"
    )
    assert out.strip() == "0"
    rc, out, err = run_psql(server, "SHOW VERSIONS txt")
    assert len(out.strip().splitlines()) == v0 + 2  # one more version

    # CREATE TABLE inside a transaction is REAL (late r12): registered
    # only at COMMIT; unsupported DDL forms still refuse
    rc, out, err = run_psql(
        server, "BEGIN; CREATE TABLE nope AS SELECT 1 AS x; COMMIT"
    )
    assert rc == 0, err
    rc, out, err = run_psql(server, "SELECT x FROM nope")
    assert rc == 0 and out.strip() == "1"
    run_psql(server, "DROP TABLE nope")
    rc, out, err = run_psql(
        server, "BEGIN; CREATE INDEX nix ON region (r_name); COMMIT"
    )
    assert rc != 0 and (
        "not supported" in err or "autocommit" in err
    )
    rc, _, err = run_psql(
        server,
        "CREATE TABLE txt2 AS SELECT r_regionkey AS k FROM region",
    )
    assert rc == 0, err
    run_psql(server, "ALTER TABLE txt2 SET FORMAT MANIFEST")
    # r13: a transaction spanning TWO manifest tables commits — both
    # rows land, each table gains exactly one version
    v2a = len(run_psql(server, "SHOW VERSIONS txt")[1].strip().splitlines())
    v2b = len(run_psql(server, "SHOW VERSIONS txt2")[1].strip().splitlines())
    rc, out, err = run_psql(
        server,
        "BEGIN; INSERT INTO txt VALUES (1); "
        "INSERT INTO txt2 VALUES (42); COMMIT",
    )
    assert rc == 0, err
    rc, out, err = run_psql(
        server, "SELECT count(*) AS n FROM txt2 WHERE k = 42"
    )
    assert out.strip() == "1"
    assert len(
        run_psql(server, "SHOW VERSIONS txt")[1].strip().splitlines()
    ) == v2a + 1
    assert len(
        run_psql(server, "SHOW VERSIONS txt2")[1].strip().splitlines()
    ) == v2b + 1
    rc, _, err = run_psql(
        server, "CREATE TABLE plaint AS SELECT 1 AS k"
    )
    assert rc == 0, err
    rc, out, err = run_psql(
        server, "BEGIN; INSERT INTO plaint VALUES (5); COMMIT"
    )
    assert rc != 0 and "MANIFEST" in err
    run_psql(server, "DROP TABLE plaint")
    run_psql(server, "DROP TABLE txt2")
    run_psql(server, "DROP TABLE txt")


# ------------------------------------------ TLS verify-full (CA chain)


@pytest.fixture(scope="module")
def verified_server(spark, tables, tmp_path_factory):
    """A server whose certificate is SIGNED BY A LOCAL CA with
    SAN=localhost/127.0.0.1 — the production chain shape. Clients pin
    the CA file and use sslmode=verify-full (encryption + identity),
    which the self-signed 'auto' path cannot satisfy."""
    pytest.importorskip("cryptography")
    from sclera_spark.interfaces.auth import make_ca_signed_cert

    d = str(tmp_path_factory.mktemp("tls_ca"))
    cert, key, ca = make_ca_signed_cert(d)
    engine = ScleraEngine(spark)
    for name, df in tables.items():
        engine.add_table(name, df)
    srv = ScleraServer(
        engine, tls=(cert, key), auth={"alice": "s3cret-pw"}
    ).start()
    srv._test_ca = ca
    srv._test_dir = d
    yield srv
    srv.stop()


def test_psql_verify_full_with_pinned_ca(verified_server):
    """libpq validates the CA chain AND the hostname: retire the
    'clients can only use sslmode=require' caveat."""
    rc, out, err = run_psql_conninfo(
        verified_server,
        f"sslmode=verify-full sslrootcert={verified_server._test_ca} "
        "hostaddr=127.0.0.1 host=localhost",
        "SELECT count(*) AS n FROM region",
        "s3cret-pw",
    )
    assert rc == 0, err
    assert out.strip() == "5"


def test_psql_verify_full_rejects_untrusted_ca(verified_server, tmp_path):
    """A different root: the chain must fail BEFORE any auth happens."""
    pytest.importorskip("cryptography")
    from sclera_spark.interfaces.auth import make_ca_signed_cert

    _, _, other_ca = make_ca_signed_cert(str(tmp_path))
    rc, out, err = run_psql_conninfo(
        verified_server,
        f"sslmode=verify-full sslrootcert={other_ca} "
        "hostaddr=127.0.0.1 host=localhost",
        "SELECT 1",
        "s3cret-pw",
    )
    assert rc != 0
    assert "certificate" in err.lower() or "SSL" in err


def test_psql_verify_full_rejects_wrong_hostname(verified_server):
    """Right CA, wrong name: verify-full's identity check must fail
    where plain sslmode=require would connect."""
    rc, out, err = run_psql_conninfo(
        verified_server,
        f"sslmode=verify-full sslrootcert={verified_server._test_ca} "
        "hostaddr=127.0.0.1 host=not-the-server.example",
        "SELECT 1",
        "s3cret-pw",
    )
    assert rc != 0
    # and require (no identity check) still works over the same chain
    rc2, out2, err2 = run_psql_conninfo(
        verified_server,
        "sslmode=require",
        "SELECT 1 AS x",
        "s3cret-pw",
    )
    assert rc2 == 0, err2


def test_cert_rotation_under_same_ca(verified_server, spark, tables):
    """Rotating the server certificate (fresh key pair re-signed under
    the SAME CA) is invisible to a client pinning the CA file — the
    rotation story the r8 caveat said was untested. A second server
    runs the rotated pair; the client's sslrootcert never changes."""
    pytest.importorskip("cryptography")
    import os

    from sclera_spark.interfaces.auth import make_ca_signed_cert

    d = verified_server._test_dir
    key_before = open(
        os.path.join(d, "server-ca-signed.key"), "rb"
    ).read()
    ca_before = open(verified_server._test_ca, "rb").read()
    # rotate: drop the server pair, keep ca.crt + ca.key
    os.remove(os.path.join(d, "server-ca-signed.crt"))
    os.remove(os.path.join(d, "server-ca-signed.key"))
    cert2, key2, ca2 = make_ca_signed_cert(d)
    assert open(ca2, "rb").read() == ca_before  # CA untouched
    assert open(key2, "rb").read() != key_before  # genuinely new pair

    engine = ScleraEngine(spark)
    for name, df in tables.items():
        engine.add_table(name, df)
    srv2 = ScleraServer(
        engine, tls=(cert2, key2), auth={"alice": "s3cret-pw"}
    ).start()
    try:
        rc, out, err = run_psql_conninfo(
            srv2,
            f"sslmode=verify-full sslrootcert={verified_server._test_ca} "
            "hostaddr=127.0.0.1 host=localhost",
            "SELECT 41 + 1 AS x",
            "s3cret-pw",
        )
        assert rc == 0, err
        assert out.strip() == "42"
    finally:
        srv2.stop()


def test_psql_copy_to_stdout_text(server):
    """COPY (query) TO STDOUT, pg text format: psql itself drives the
    CopyOutResponse/CopyData/CopyDone flow (what \\copy speaks)."""
    rc, out, err = run_psql(
        server,
        "COPY (SELECT r_regionkey, r_name FROM region "
        "ORDER BY r_regionkey) TO STDOUT",
    )
    assert rc == 0, err
    lines = out.splitlines()
    assert lines[0] == "0\tAFRICA" and len(lines) == 5


def test_psql_copy_csv_header_nulls_and_escapes(server):
    rc, out, err = run_psql(
        server,
        "COPY (SELECT 1 AS a, CAST(NULL AS STRING) AS s, "
        "'x,\"y\"' AS q UNION ALL SELECT 2, '', 'plain' ORDER BY a) "
        "TO STDOUT WITH (FORMAT CSV, HEADER)",
    )
    assert rc == 0, err
    lines = out.splitlines()
    assert lines[0] == "a,s,q"
    # NULL = nothing; quote-escaping doubled; empty string quoted
    assert lines[1] == '1,,"x,""y"""'
    assert lines[2] == '2,"",plain'


def test_psql_copy_table_form_and_text_escapes(server):
    rc, out, err = run_psql(
        server,
        "COPY (SELECT 'tab\\there' AS v, CAST(NULL AS INT) AS n) TO STDOUT",
    )
    assert rc == 0, err
    # psql prints the received text-format bytes verbatim
    assert out.splitlines()[0] == "tab\\there\t\\N"
    rc2, out2, err2 = run_psql(server, "COPY region TO STDOUT")
    assert rc2 == 0, err2
    assert len(out2.splitlines()) == 5


def test_psql_copy_unsupported_forms_fail_loudly(server):
    rc, _, err = run_psql(
        server, "COPY (SELECT 1) TO STDOUT WITH (FORMAT BINARY)"
    )
    assert rc != 0 and "not supported" in err
    # FROM STDIN is served since late-r9, but only text/CSV — binary
    # loads refuse loudly, and an unknown target table errors BEFORE
    # the client is put into copy mode
    rc2, _, err2 = run_psql_stdin(
        server, "COPY region FROM STDIN WITH (FORMAT BINARY)", ""
    )
    assert rc2 != 0 and "not supported" in err2
    rc3, _, err3 = run_psql_stdin(
        server, "COPY no_such_table FROM STDIN", "1\n"
    )
    assert rc3 != 0


# ----------------------------------------------------- COPY FROM STDIN


def run_psql_stdin(server, sql: str, data: str):
    proc = subprocess.run(
        [
            psql, "-h", "127.0.0.1", "-p", str(server.port),
            "-U", "sclera", "-d", "sclera", "-X", "-At", "-c", sql,
        ],
        input=data,
        capture_output=True,
        text=True,
        timeout=120,
    )
    return proc.returncode, proc.stdout, proc.stderr


def test_psql_restore_pattern_create_copy_commit(server):
    """The pg_dump restore shape (late r12): BEGIN; CREATE TABLE;
    COPY ... FROM STDIN; COMMIT — the table is created inside the
    transaction (registered only at COMMIT), the COPY routes through
    the transaction's direct-commit path, and ROLLBACK of the same
    sequence leaves nothing behind."""
    payload = "1\talpha\n2\tbeta\n3\t\\N\n\\.\n"
    rc, out, err = run_psql_stdin(
        server,
        "BEGIN; CREATE TABLE rst (k BIGINT, name VARCHAR); "
        "COPY rst FROM STDIN; COMMIT;",
        payload,
    )
    assert rc == 0, err
    try:
        rc, out, err = run_psql(
            server, "SELECT k, name FROM rst ORDER BY k"
        )
        assert rc == 0, err
        assert out.splitlines() == ["1|alpha", "2|beta", "3|"]
        # the rolled-back twin never existed
        rc, out, err = run_psql_stdin(
            server,
            "BEGIN; CREATE TABLE rst2 (k BIGINT); "
            "COPY rst2 FROM STDIN; ROLLBACK;",
            "9\n\\.\n",
        )
        assert rc == 0, err
        rc, _, err = run_psql(server, "SELECT count(*) FROM rst2")
        assert rc != 0
        # quoted / public-qualified COPY spellings fold like INSERT
        rc, _, err = run_psql_stdin(
            server, 'COPY "public"."rst" FROM STDIN', "4\tdelta\n\\.\n"
        )
        assert rc == 0, err
        rc, out, err = run_psql(
            server, "COPY public.rst TO STDOUT"
        )
        assert rc == 0, err
        assert len(out.splitlines()) == 4
    finally:
        run_psql(server, "DROP TABLE rst")


def test_psql_copy_from_stdin_text(server):
    """COPY t FROM STDIN, pg text format, driven by psql itself:
    escapes and \\N decode exactly; the load lands through the
    engine's INSERT path (manifest tables get an atomic commit)."""
    rc, _, err = run_psql(
        server,
        "CREATE TABLE cin AS SELECT CAST(1 AS BIGINT) AS k, "
        "'seed' AS name, CAST(1.5 AS DOUBLE) AS x",
    )
    assert rc == 0, err
    rc, _, err = run_psql(server, "ALTER TABLE cin SET FORMAT MANIFEST")
    assert rc == 0, err
    try:
        payload = "2\ttab\\there\t2.5\n3\t\\N\t\\N\n\\.\n"
        rc, out, err = run_psql_stdin(
            server, "COPY cin FROM STDIN", payload
        )
        assert rc == 0, err
        assert "COPY 2" in out or "COPY 2" in err
        rc, out, err = run_psql(
            server,
            "SELECT k, name, x FROM cin ORDER BY k",
        )
        assert rc == 0, err
        lines = out.splitlines()
        assert lines == ["1|seed|1.5", "2|tab\there|2.5", "3||"]
    finally:
        run_psql(server, "DROP TABLE cin")


def test_psql_copy_from_stdin_csv_header_and_subset(server):
    rc, _, err = run_psql(
        server,
        "CREATE TABLE cin2 AS SELECT CAST(1 AS BIGINT) AS k, "
        "'seed' AS name, CAST(9 AS BIGINT) AS extra",
    )
    assert rc == 0, err
    try:
        payload = 'k,name\n2,"a,b"\n3,\n'
        rc, out, err = run_psql_stdin(
            server,
            "COPY cin2 (k, name) FROM STDIN WITH (FORMAT CSV, HEADER)",
            payload,
        )
        assert rc == 0, err
        rc, out, err = run_psql(
            server, "SELECT k, name, extra FROM cin2 ORDER BY k"
        )
        assert rc == 0, err
        # unlisted column = NULL; unquoted empty = NULL
        assert out.splitlines() == ["1|seed|9", "2|a,b|", "3||"]
    finally:
        run_psql(server, "DROP TABLE cin2")


def test_psql_copy_roundtrip_text_lossless(server):
    """COPY TO STDOUT piped back into COPY FROM STDIN reproduces the
    rows exactly — the text format's escaping survives its own
    decoder across a real psql."""
    gnarly = (
        "SELECT r_regionkey, r_name, "
        "concat('a\\tb', chr(10), r_name, '\\\\end') AS tricky "
        "FROM region"
    )
    rc, out, err = run_psql(server, f"COPY ({gnarly}) TO STDOUT")
    assert rc == 0, err
    rc, _, e2 = run_psql(
        server, f"CREATE TABLE rt AS SELECT * FROM ({gnarly}) WHERE 1 = 0"
    )
    assert rc == 0, e2
    try:
        rc, _, e3 = run_psql_stdin(server, "COPY rt FROM STDIN", out)
        assert rc == 0, e3
        rc, got, e4 = run_psql(
            server,
            f"SELECT count(*) FROM rt t JOIN ({gnarly}) r "
            "ON t.r_regionkey = r.r_regionkey AND t.r_name = r.r_name "
            "AND t.tricky = r.tricky",
        )
        assert rc == 0, e4
        assert got.strip() == "5"
    finally:
        run_psql(server, "DROP TABLE rt")


def test_psql_copy_from_stdin_bad_rows_fail_loudly(server):
    rc, _, err = run_psql(
        server, "CREATE TABLE cin3 AS SELECT CAST(1 AS BIGINT) AS k"
    )
    assert rc == 0, err
    try:
        rc, out, err = run_psql_stdin(
            server, "COPY cin3 FROM STDIN", "1\t2\t3\n"
        )
        assert rc != 0 and "fields" in err
        rc, out, err = run_psql(server, "SELECT count(*) FROM cin3")
        assert rc == 0 and out.strip() == "1"  # nothing half-loaded
    finally:
        run_psql(server, "DROP TABLE cin3")


def test_copy_from_buffers_inside_transaction(server):
    """r11: COPY FROM STDIN inside a transaction is BUFFERED like any
    INSERT — staged outside data/, vanishing truthfully on ROLLBACK,
    landing with the rest of the transaction as ONE version at COMMIT.
    A non-manifest target still refuses (via the txn buffer's guard)."""
    rc, _, err = run_psql(
        server,
        "CREATE TABLE ctx AS SELECT r_regionkey AS k FROM region",
    )
    assert rc == 0, err
    run_psql(server, "ALTER TABLE ctx SET FORMAT MANIFEST")
    rc, out, err = run_psql(server, "SHOW VERSIONS ctx")
    v0 = len(out.strip().splitlines())

    # ROLLBACK discards the buffered load — no rows, no version
    rc, out, err = run_psql_stdin(
        server,
        "BEGIN; COPY ctx FROM STDIN; ROLLBACK",
        "99\n\\.\n",
    )
    assert rc == 0, err
    rc, out, err = run_psql(
        server, "SELECT count(*) AS n FROM ctx WHERE k = 99"
    )
    assert out.strip() == "0"
    rc, out, err = run_psql(server, "SHOW VERSIONS ctx")
    assert len(out.strip().splitlines()) == v0

    # COPY + INSERT + COMMIT: both land as EXACTLY ONE version
    rc, out, err = run_psql_stdin(
        server,
        "BEGIN; COPY ctx FROM STDIN; INSERT INTO ctx VALUES (77); COMMIT",
        "98\n99\n\\.\n",
    )
    assert rc == 0, err
    rc, out, err = run_psql(
        server, "SELECT count(*) AS n FROM ctx WHERE k IN (77, 98, 99)"
    )
    assert out.strip() == "3"
    rc, out, err = run_psql(server, "SHOW VERSIONS ctx")
    assert len(out.strip().splitlines()) == v0 + 1

    # non-manifest target inside a txn: the buffer's guard refuses
    rc, _, err = run_psql(server, "CREATE TABLE ctp AS SELECT 1 AS k")
    assert rc == 0, err
    rc, out, err = run_psql_stdin(
        server, "BEGIN; COPY ctp FROM STDIN; COMMIT", "5\n\\.\n"
    )
    assert rc != 0 and "MANIFEST" in err
    run_psql(server, "DROP TABLE ctp")
    run_psql(server, "DROP TABLE ctx")
