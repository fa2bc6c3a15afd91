"""PostgreSQL wire-protocol (v3) server over the Sclera engine.

The reference makes its engine reachable through a JDBC driver whose
`Statement.executeQuery` parses and runs statements on an embedded
Processor (modules/interfaces/jdbc/src/main/scala/Statement.scala;
behaviour pinned by JDBCTestSuite.scala:24-93: connect, metadata via the
pg_catalog emulation, `select "b'ar" as foo`, close/reconnect). Rather
than invent a bespoke RPC, this module speaks the public PostgreSQL
frontend/backend protocol 3.0 (documented at
https://www.postgresql.org/docs/current/protocol.html), so any existing
PostgreSQL client — psql, psycopg, the PostgreSQL JDBC driver — can
connect and run Sclera-dialect SQL. Introspection works because the
engine registers the pg_catalog emulation tables (sources/pgcatalog.py)
as queryable views.

Scale notes: the server is a *serving boundary* — result rows cross the
wire via `DataFrame.toLocalIterator()`, so the driver holds at most one
partition of the result at a time, never the whole result set. Query
execution itself stays fully distributed; nothing here touches the data
path.

Implemented protocol surface:
- startup incl. SSLRequest (REAL TLS when the server holds a cert —
  stdlib ssl wrap; refused otherwise) and CancelRequest;
  ParameterStatus/BackendKeyData/ReadyForQuery
- authentication: trust (default, reference-parity) or SCRAM-SHA-256
  (interfaces/auth.py, RFC 5802/7677) when credentials are configured;
  with TLS configured, cleartext connections are refused by default
- simple query ('Q') with multi-statement split and per-statement
  RowDescription/DataRow/CommandComplete; EmptyQueryResponse; errors
- the extended-query subset drivers use: Parse/Bind/Describe/Execute/
  Close/Flush/Sync, including text-format parameter binds ($1..$N
  inlined as escaped literals; binary-format params are rejected with a
  clear error)
- Terminate ('X')
"""

from __future__ import annotations

import datetime as _dt
import io
import os
import re
import socket
import socketserver
import struct
import threading

from pyspark.sql import DataFrame

from sclera_spark.sources.pgcatalog import _TYPLEN, _spark_type_oid

_PROTO_V3 = 196608
_SSL_REQUEST = 80877103
_CANCEL_REQUEST = 80877102


# ---------------------------------------------------------------- encoding


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def _msg(type_byte: bytes, payload: bytes = b"") -> bytes:
    return type_byte + struct.pack("!i", len(payload) + 4) + payload


def _text_value(v) -> bytes | None:
    """Render a Python value in PostgreSQL text format."""
    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, (bytes, bytearray)):
        return b"\\x" + bytes(v).hex().encode()
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f").encode()
    if isinstance(v, _dt.date):
        return v.isoformat().encode()
    if isinstance(v, float):
        return repr(v).encode()
    if isinstance(v, (list, tuple)):
        return (
            "{" + ",".join("NULL" if x is None else str(x) for x in v) + "}"
        ).encode()
    return str(v).encode()


class _WireError(Exception):
    """An error with an explicit pg sqlstate (the generic statement
    error path reports 42601; raise this to say something precise)."""

    def __init__(self, sqlstate: str, message: str):
        super().__init__(message)
        self.sqlstate = sqlstate


class _ResultSet:
    """A uniform (columns, oids, row-iterator, tag) view over whatever the
    engine returned: DataFrame, DDL list/str result, or None."""

    def __init__(self, columns, oids, rows, tag):
        self.columns = columns
        self.oids = oids
        self.rows = rows  # iterator of tuples, or None for row-less commands
        self.tag = tag


def _tag_for(sql: str, n: int | None = None) -> str:
    head = sql.strip().split(None, 2)
    verb = (head[0] if head else "").upper()
    if verb == "SELECT" or not verb:
        return f"SELECT {n or 0}"
    if verb == "INSERT":
        return "INSERT 0 0"
    if verb in ("CREATE", "DROP") and len(head) > 1:
        return f"{verb} {head[1].upper()}"
    return verb


def _to_resultset(result, sql: str) -> _ResultSet:
    if isinstance(result, DataFrame):
        fields = result.schema.fields
        oids = [_spark_type_oid(f.dataType) for f in fields]
        return _ResultSet(
            [f.name for f in fields],
            oids,
            (tuple(r) for r in result.toLocalIterator()),
            None,  # tag filled by caller with row count
        )
    if result is None:
        return _ResultSet(None, None, None, _tag_for(sql))
    if isinstance(result, str):  # EXPLAIN text
        rows = [(line,) for line in result.splitlines()]
        return _ResultSet(["QUERY PLAN"], [25], iter(rows), None)
    if isinstance(result, (list, tuple)):  # LIST/DESCRIBE/SHOW results
        items = list(result)
        if items and isinstance(items[0], (list, tuple)):
            width = len(items[0])
            cols = [f"col{i + 1}" for i in range(width)]
            rows = [tuple(str(x) if x is not None else None for x in r) for r in items]
        else:
            cols = ["name"]
            rows = [(str(x),) for x in items]
        return _ResultSet(cols, [25] * len(cols), iter(rows), None)
    return _ResultSet(["result"], [25], iter([(str(result),)]), None)


# ---------------------------------------------------------------- server


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):  # noqa: C901 — protocol state machine
        self.buf = self.request.makefile("rb")
        self._tls = False
        self.startup_params: dict[str, str] = {}
        engine = self.server.engine
        key = None
        try:
            if not self._startup():
                return
            if self.server.require_tls and not self._tls:
                # pg_hba "hostssl"-style policy: with TLS configured the
                # cleartext path is closed unless explicitly re-opened
                self._error(
                    "28000",
                    "no pg_hba.conf entry: SSL required (connect with "
                    "sslmode=require)",
                )
                return
            if self.server.credentials is not None:
                if not self._authenticate_scram():
                    return
            engine.pg_catalog.refresh()
            self._send(_msg(b"R", struct.pack("!i", 0)))  # AuthenticationOk
            for k, v in (
                ("server_version", "15.0 (sclera-spark)"),
                ("server_encoding", "UTF8"),
                ("client_encoding", "UTF8"),
                ("DateStyle", "ISO, MDY"),
                ("integer_datetimes", "on"),
                ("standard_conforming_strings", "on"),
            ):
                self._send(_msg(b"S", _cstr(k) + _cstr(v)))
            # BackendKeyData: REAL cancel keys — a CancelRequest carrying
            # this (pid, secret) pair cancels this session's running Spark
            # jobs via its job group (pg's out-of-band cancel semantics)
            key = self.server.register_cancel()
            pid, secret = key
            self._cancel_target = self.server.cancel_registry[key]
            self._job_group = self._cancel_target.group
            try:
                engine.spark.sparkContext.setJobGroup(
                    self._job_group, "sclera wire session", interruptOnCancel=True
                )
            except Exception:
                pass
            self._send(_msg(b"K", struct.pack("!ii", pid, secret)))
            self._ready()
            self._statements: dict[str, str] = {}
            self._portals: dict[str, str] = {}
            # suspended portals (Execute hit its row limit): resumable
            # row iterators, destroyed on Close(P) / re-Bind / Sync
            # outside an explicit transaction (pg portal lifetime)
            self._suspended: dict[str, dict] = {}
            self._loop()
        except (ConnectionError, BrokenPipeError, OSError):
            pass
        finally:
            txn = getattr(self, "_txn", None)
            if txn and (txn.get("all_staged") or self._txn_parts(txn)):
                # connection dropped mid-transaction: implicit ROLLBACK —
                # the staged files were never adopted, just reclaim them
                from sclera_spark.sources.manifest import ManifestTable

                ManifestTable.discard_staged(
                    txn.get("all_staged") or self._txn_parts(txn)
                )
            if txn and txn.get("created"):
                # a txn-created table was never registered: reclaim it
                import shutil as _shutil

                _shutil.rmtree(
                    txn["created"]["path"], ignore_errors=True
                )
            if txn:
                self._txn = None
            if key is not None:
                self.server.cancel_registry.pop(key, None)
            try:
                self.buf.close()
            except Exception:
                pass

    # ---- plumbing ----

    def _send(self, data: bytes) -> None:
        self.request.sendall(data)

    def _ready(self) -> None:
        self._send(_msg(b"Z", b"I"))

    def _read_exact(self, n: int) -> bytes:
        data = self.buf.read(n)
        if data is None or len(data) < n:
            raise ConnectionError("client closed")
        return data

    # Pre-auth message lengths are CLIENT-controlled; an unauthenticated
    # peer must not be able to make the server buffer gigabytes (or pass
    # a negative length through to read()). 64 KiB comfortably covers
    # any legitimate startup packet / SASL message.
    _PREAUTH_MAX_LEN = 64 * 1024

    def _read_preauth_body(self, length: int) -> bytes:
        if length < 4 or length > self._PREAUTH_MAX_LEN:
            self._error("08P01", f"invalid message length {length}")
            raise ConnectionError("bad pre-auth length")
        return self._read_exact(length - 4)

    def _startup(self) -> bool:
        while True:
            (length,) = struct.unpack("!i", self._read_exact(4))
            payload = self._read_preauth_body(length)
            (code,) = struct.unpack("!i", payload[:4])
            if code == _SSL_REQUEST:
                ctx = self.server.ssl_context
                if ctx is None or self._tls:
                    self._send(b"N")  # no TLS; client falls back
                    continue
                self._send(b"S")
                self.request = ctx.wrap_socket(self.request, server_side=True)
                self.buf.close()
                self.buf = self.request.makefile("rb")
                self._tls = True
                continue
            if code == _CANCEL_REQUEST:
                # out-of-band cancel: pid + secret name a live session;
                # cancel its Spark job group, then close (per protocol,
                # no response is ever sent on a cancel connection)
                pid, secret = struct.unpack("!ii", payload[4:12])
                target = self.server.cancel_registry.get((pid, secret))
                if target is not None:
                    # mark the victim session BEFORE killing its jobs, so
                    # its error path can attribute the failure to a real
                    # cancellation (sqlstate 57014) rather than guessing
                    # from the exception text
                    target.flag.set()
                    try:
                        self.server.engine.spark.sparkContext.cancelJobGroup(
                            target.group
                        )
                    except Exception:
                        pass
                return False
            if code != _PROTO_V3:
                self._error("08P01", f"unsupported protocol version {code}")
                return False
            # key\0value\0...\0 — user/database/options
            rest = payload[4:]
            while rest and rest[:1] != b"\x00":
                k, rest = _take_cstr(rest)
                v, rest = _take_cstr(rest)
                self.startup_params[k] = v
            return True

    def _authenticate_scram(self) -> bool:
        """SASL authentication flow (pg protocol 'R' codes 10/11/12/0)
        running the SCRAM-SHA-256 exchange from interfaces/auth.py.
        Returns True on success; on failure sends 28P01 and closes."""
        from sclera_spark.interfaces.auth import AuthFailed, ScramExchange

        user = self.startup_params.get("user", "")
        cred = self.server.credentials.get(user)

        def fail(msg: str) -> bool:
            self._error("28P01", f"password authentication failed for user \"{user}\": {msg}")
            return False

        try:
            self._send(
                _msg(b"R", struct.pack("!i", 10) + _cstr("SCRAM-SHA-256") + b"\x00")
            )
            head, payload = self._read_password_message()
            if head != b"p":
                return fail("expected SASLInitialResponse")
            mech, rest = _take_cstr(payload)
            if mech != "SCRAM-SHA-256":
                return fail(f"unsupported SASL mechanism {mech!r}")
            (ln,) = struct.unpack("!i", rest[:4])
            client_first = rest[4 : 4 + ln] if ln >= 0 else b""
            if cred is None:
                # run a mock exchange against an unmatchable credential so
                # user existence is not probeable from timing/flow shape.
                # The mock salt/keys are derived DETERMINISTICALLY from a
                # per-server secret and the username (as PostgreSQL's mock
                # authentication does): a probe that connects twice with
                # the same unknown username sees the SAME salt both times,
                # just like a real user would — a fresh random salt per
                # connection would itself betray nonexistence.
                from sclera_spark.interfaces.auth import ScramCredential
                import hmac as _hmac
                import hashlib as _hashlib

                secret = self.server.mock_auth_secret
                uname = user.encode()

                def _mock(tag: bytes, n: int) -> bytes:
                    return _hmac.new(
                        secret, tag + uname, _hashlib.sha256
                    ).digest()[:n]

                cred = ScramCredential(
                    _mock(b"salt:", 16), 4096,
                    _mock(b"stored:", 32), _mock(b"server:", 32),
                )
            ex = ScramExchange(cred)
            self._send(_msg(b"R", struct.pack("!i", 11) + ex.first(client_first)))
            head, payload = self._read_password_message()
            if head != b"p":
                return fail("expected SASLResponse")
            server_final = ex.final(payload)
            self._send(_msg(b"R", struct.pack("!i", 12) + server_final))
            return True
        except AuthFailed as exc:
            return fail(str(exc))
        except (ValueError, struct.error):
            return fail("malformed SASL message")

    def _read_password_message(self) -> tuple[bytes, bytes]:
        head = self._read_exact(1)
        (length,) = struct.unpack("!i", self._read_exact(4))
        return head, self._read_preauth_body(length)

    def _sqlstate_for(self, exc: Exception) -> str:
        """pg's query_canceled (57014) ONLY when this session was
        actually cancelled — by a CancelRequest naming its key or by the
        statement-timeout timer — tracked as an explicit flag set by
        those paths. An ordinary failure mentioning 'cancel' (say, an
        unresolved column named cancel_date) stays a syntax/semantic
        error (42601)."""
        if isinstance(exc, _WireError):
            return exc.sqlstate
        target = getattr(self, "_cancel_target", None)
        if target is not None and target.flag.is_set():
            return "57014"
        return "42601"

    def _error(self, sqlstate: str, message: str) -> None:
        body = (
            b"S" + _cstr("ERROR") + b"V" + _cstr("ERROR")
            + b"C" + _cstr(sqlstate) + b"M" + _cstr(message) + b"\x00"
        )
        self._send(_msg(b"E", body))

    def _notice(self, message: str) -> None:
        """NoticeResponse — same field layout as ErrorResponse with
        severity NOTICE (libpq prints it, never fails the statement)."""
        body = (
            b"S" + _cstr("NOTICE") + b"V" + _cstr("NOTICE")
            + b"C" + _cstr("01000") + b"M" + _cstr(message) + b"\x00"
        )
        self._send(_msg(b"N", body))

    # ---- message loop ----

    def _loop(self) -> None:
        self._skip_to_sync = False
        while True:
            head = self.buf.read(1)
            if not head:
                return
            (length,) = struct.unpack("!i", self._read_exact(4))
            payload = self._read_exact(length - 4)
            if head == b"X":
                return
            if self._skip_to_sync and head not in (b"S", b"Q"):
                continue  # error in extended mode: discard until Sync
            if head == b"S":
                self._skip_to_sync = False
            if head == b"Q":
                self._skip_to_sync = False
                self._simple_query(payload[:-1].decode("utf-8", "replace"))
            elif head == b"P":
                self._parse(payload)
            elif head == b"B":
                self._bind(payload)
            elif head == b"D":
                self._describe(payload)
            elif head == b"E":
                self._execute(payload)
            elif head == b"C":
                self._close_portal(payload)
                self._send(_msg(b"3"))  # CloseComplete
            elif head in (b"S", b"H"):  # Sync / Flush
                if head == b"S":
                    # Sync ends the implicit transaction in autocommit,
                    # which destroys portals — suspended ones included;
                    # inside BEGIN they survive (pgjdbc setFetchSize
                    # resumes them across Execute/Sync cycles)
                    if getattr(self, "_txn", None) is None:
                        self._suspended.clear()
                    self._ready()
            else:
                self._error("08P01", f"unsupported message type {head!r}")
                self._ready()

    # ---- statement execution ----

    _SESSION_VERBS = (
        "SET", "BEGIN", "START", "COMMIT", "END", "ROLLBACK", "DISCARD",
        "RESET", "SAVEPOINT", "RELEASE",
    )
    # statements that MUTATE state — inside an advisory "transaction"
    # they make a later ROLLBACK a lie, which we refuse to tell
    _DML_VERBS = (
        "INSERT", "UPDATE", "DELETE", "MERGE", "CREATE", "DROP", "ALTER",
        "TRUNCATE", "OPTIMIZE", "VACUUM", "REORG",
    )

    _TIMEOUT_RE = re.compile(
        r"^\s*SET\s+statement_timeout\s*(?:=|TO)\s*'?(\d+)\s*(m?s)?'?\s*$", re.I
    )

    def _run(self, sql: str) -> _ResultSet:
        """Route one statement through the engine; session-management verbs
        clients emit on connect (SET/RESET/...) are accepted as no-ops —
        the engine is auto-commit, like the reference's JDBC driver.
        Two honesty rules:
        * SET statement_timeout is HONORED (pg semantics, milliseconds;
          0 disables) — enforced via the session's Spark job group, the
          same kill path as CancelRequest.
        * transactions are REAL: BEGIN buffers manifest-table
          INSERT/UPDATE/DELETE/MERGE/COPY as staged (unpublished) part
          files PER TABLE (r13: multi-object transactions); COMMIT
          publishes a single-table txn as ONE atomic manifest commit,
          and a multi-table txn as per-table commits made atomic by a
          cross-table intent journal (write-ahead marker; crash
          recovery completes it on the next engine open); ROLLBACK
          deletes the staging — nothing was ever visible, so the
          rollback is truthful. A crash mid-txn leaves only scratch
          files outside data/. CREATE TABLE [AS] and DROP TABLE are
          transactional too (late r12: unique staging path renamed +
          registered at COMMIT; deferred drop) but stay single-object.
          Anything a rollback could not undo is REFUSED inside a
          transaction (0A000): other DDL forms, inserts into
          non-manifest tables, CAS-backed tables in a multi-table txn.
          Reads inside the transaction see the transaction's
          OWN writes (r12): SELECTs referencing the buffered table run
          against a per-statement overlay of snapshot-minus-rewritten
          files plus staged parts, and UPDATE/DELETE/MERGE probes
          rewrite staged parts too — pg's read-your-own-writes,
          without any shared-catalog leak; partitioned imports
          included (staged parts carry partition columns physically,
          so the virtual fill passes them through)."""
        target = getattr(self, "_cancel_target", None)
        if target is not None:
            target.flag.clear()  # cancellation state is per-statement
        verb = sql.strip().split(None, 1)[0].upper() if sql.strip() else ""
        if verb in self._SESSION_VERBS:
            m = self._TIMEOUT_RE.match(sql)
            if m:
                n, unit = int(m.group(1)), (m.group(2) or "ms").lower()
                self._stmt_timeout_ms = n * 1000 if unit == "s" else n
            if verb in ("BEGIN", "START"):
                if getattr(self, "_txn", None) is not None:
                    self._notice("there is already a transaction in progress")
                else:
                    self._txn = {
                        # per-TABLE write buffers (r13, multi-object
                        # transactions): table -> {"parts": [(scratch,
                        # names)], "removes": set(basenames)}
                        "writes": {}, "rows": 0, "savepoints": {},
                        # every staged tuple EVER created in this txn:
                        # rewrites/savepoint-rollbacks only reshuffle
                        # the per-table parts; scratch dirs are
                        # reclaimed once, at transaction end, from
                        # this ledger
                        "all_staged": [],
                        # transactional DDL (late r12): a table CREATED
                        # in this txn lives at its warehouse path but is
                        # registered in the shared catalog only at
                        # COMMIT ({"name", "path"}); a deferred DROP
                        # executes at COMMIT
                        "created": None,
                        "dropped": None,
                    }
                return _ResultSet(None, None, None, "BEGIN")
            if verb in ("SAVEPOINT", "RELEASE") or self._ROLLBACK_TO_RE.match(
                sql
            ):
                return self._savepoint(verb, sql)
            if verb in ("COMMIT", "END"):
                txn = getattr(self, "_txn", None)
                self._txn = None
                if txn and txn.get("created"):
                    # publish the txn-created table: rename the unique
                    # staging directory into the warehouse path, then
                    # register — the rename is the commit point, and it
                    # can only fail into a ROLLBACK of OUR directory
                    # (the winner's data is never touched)
                    import shutil as _shutil

                    name = txn["created"]["name"]
                    path = txn["created"]["path"]
                    final = txn["created"]["final"]
                    ddl = self.server.engine.ddl()
                    # the publish lock (shared with autocommit CREATE's
                    # name claim in ddl._materialize) makes check+rename
                    # atomic against same-process sessions — POSIX
                    # rename would otherwise succeed over a concurrent
                    # creation's still-EMPTY directory (ADVICE r12)
                    with self.server.engine.publish_lock:
                        lost = (
                            name in ddl.managed
                            or name in ddl.views
                            or name in getattr(
                                self.server.engine.catalog, "tables", {}
                            )
                            or os.path.exists(final)
                        )
                        if not lost:
                            try:
                                os.rename(path, final)
                            except OSError:
                                lost = True  # raced: dest appeared
                    if lost:
                        # another session claimed the name while this
                        # transaction held it unpublished: abort loudly,
                        # reclaiming only OUR staging directory
                        _shutil.rmtree(path, ignore_errors=True)
                        raise _WireError(
                            "40001",
                            f"COMMIT failed: table {name!r} was created "
                            "by another session while this transaction "
                            "held it unpublished; the transaction is "
                            "rolled back",
                        )
                    ddl.managed[name] = final
                    ddl.manifest_tables.add(name)
                    ddl._register_manifest(name)
                    try:
                        ddl._persist_tables()
                    except Exception:
                        pass  # registration is live; durability best-effort
                if txn and txn.get("dropped"):
                    # deferred DROP: the single object this txn touches
                    try:
                        self.server.engine.execute(
                            f"DROP TABLE {txn['dropped']}"
                        )
                    except Exception as exc:
                        # dropped meanwhile by another session: the
                        # outcome the txn wanted already holds
                        self._notice(
                            f"COMMIT: deferred DROP TABLE "
                            f"{txn['dropped']} failed: {exc}"
                        )
                # retired: staged tuples replaced by later same-txn
                # DML rewrites or savepoint rollbacks — reclaim their
                # scratch dirs whatever the outcome (even a txn whose
                # every part was rolled back to a savepoint)
                live_parts = self._txn_parts(txn) if txn else []
                retired = (
                    [
                        s
                        for s in txn.get("all_staged", [])
                        if s not in live_parts
                    ]
                    if txn
                    else []
                )
                writes = (
                    {
                        t: w
                        for t, w in txn["writes"].items()
                        if w["parts"] or w["removes"]
                    }
                    if txn
                    else {}
                )
                if txn and not writes and retired:
                    from sclera_spark.sources.manifest import ManifestTable

                    ManifestTable.discard_staged(retired)
                elif txn and writes:
                    from sclera_spark.sources.manifest import ManifestTable

                    ddl = self.server.engine.ddl()
                    try:
                        if len(writes) == 1:
                            # single-object fast path: ONE manifest
                            # commit, no journal needed
                            ((name, w),) = writes.items()
                            ddl._manifest(name).commit_staged(
                                w["parts"],
                                remove_names=w["removes"] or None,
                            )
                        else:
                            # multi-object COMMIT (r13): per-table
                            # commits made atomic by the cross-table
                            # intent journal; all-or-nothing validation
                            # happens inside every participant's lock.
                            # r14: all-CAS groups journal as an object
                            # in the CAS store (the statement-time
                            # guard already refused mixed groups)
                            try:
                                entries = [
                                    (ddl._manifest(t), w["parts"],
                                     w["removes"])
                                    for t, w in sorted(writes.items())
                                ]
                                if all(
                                    t in ddl.cas_manifest_tables
                                    for t in writes
                                ):
                                    from sclera_spark.sources.manifest import (
                                        CasManifestTable,
                                    )

                                    CasManifestTable.commit_staged_group_cas(
                                        entries, ddl.cas_txn_prefix()
                                    )
                                else:
                                    ManifestTable.commit_staged_group(
                                        entries, ddl.txn_journal_dir()
                                    )
                            except ValueError as exc:
                                if "CAS table" in str(exc):
                                    raise _WireError("0A000", str(exc))
                                raise
                    except Exception as exc:
                        from sclera_spark.sources.manifest import (
                            TxnJournaledError,
                        )

                        if isinstance(exc, TxnJournaledError):
                            # the commit point passed: the txn IS
                            # committed; recovery completes it — the
                            # staged files belong to the journal now
                            self._notice(str(exc))
                            if retired:
                                ManifestTable.discard_staged(retired)
                            for name in writes:
                                # best-effort refresh for the tables
                                # that DID publish before the failure
                                try:
                                    ddl._register_manifest(name)
                                except Exception:
                                    pass
                            return _ResultSet(
                                None, None, None, "COMMIT"
                            )
                        ManifestTable.discard_staged(
                            live_parts + retired
                        )
                        raise
                    if retired:
                        ManifestTable.discard_staged(retired)
                    # the commit is durable at this point: a failure to
                    # refresh the catalog registration must NOT report
                    # the transaction as failed (a retrying client
                    # would duplicate rows) — surface it as a notice
                    for name in writes:
                        try:
                            ddl._register_manifest(name)
                        except Exception as exc:
                            self._notice(
                                "COMMIT succeeded (manifest version is "
                                "durable) but the catalog refresh "
                                f"failed for {name}: {exc}; re-register "
                                "or reconnect to see the new rows"
                            )
                        try:
                            ddl._maybe_mirror(name)
                        except Exception:
                            pass  # _maybe_mirror itself warns-once
                return _ResultSet(None, None, None, "COMMIT")
            if verb == "ROLLBACK":
                txn = getattr(self, "_txn", None)
                self._txn = None
                if txn:
                    staged = txn.get("all_staged") or self._txn_parts(txn)
                    if staged:
                        from sclera_spark.sources.manifest import (
                            ManifestTable,
                        )

                        ManifestTable.discard_staged(staged)
                    if txn.get("created"):
                        # the created table was never registered:
                        # removing its directory undoes it truthfully
                        import shutil as _shutil

                        _shutil.rmtree(
                            txn["created"]["path"], ignore_errors=True
                        )
                return _ResultSet(None, None, None, "ROLLBACK")
            return _ResultSet(None, None, None, verb)
        txn = getattr(self, "_txn", None)
        if txn is not None and verb in self._DML_VERBS:
            return self._txn_buffer(txn, verb, sql)
        if (
            txn is not None
            and (
                any(
                    w["parts"] or w["removes"]
                    for w in txn.get("writes", {}).values()
                )
                or txn.get("created")
                or txn.get("dropped")
            )
            and verb in ("SELECT", "WITH", "TABLE")
        ):
            rs = self._txn_read(txn, sql)
            if rs is not None:
                return rs
        rs = _to_resultset(self.server.engine.execute(sql), sql)
        return rs

    def _txn_read(self, txn: dict, sql: str) -> "_ResultSet | None":
        """Read-your-own-writes (r12; multi-table r13): a SELECT inside
        a transaction referencing ANY of the transaction's buffered
        tables runs against OVERLAYS — per table, the published
        snapshot minus the files this transaction's DML rewrote, plus
        its staged part files; a join across several buffered tables
        reads every one's own writes. Each overlay is a per-statement
        DataFrame registered under a unique temp-view name and dropped
        immediately after analysis, so concurrent sessions can never
        resolve it (no shared-catalog leak). Returns None (ordinary
        snapshot read) when the statement references no buffered
        table. Partitioned imports overlay too
        (late r12): staged parts carry the partition columns
        physically, so the fill coalesce passes them through while
        imported files keep filling from the log's partitionValues.

        Scoping: a CTE alias spelled like the table SHADOWS it (pg
        semantics) — detected, rewrite skipped. A TABLE ALIAS spelled
        like the table (`FROM region AS <txn_table>`) would mis-rewrite
        only the alias's dotted qualifiers, which then fail LOUDLY
        (a dropped temp view is not referencable by qualifier), never
        silently — rephrase the alias."""
        import uuid as _uuid

        # the pg `TABLE t` form carries no FROM keyword, so the
        # reference detector below would miss it — normalize first
        tm = re.match(r"^\s*TABLE\s+(\w+)\s*;?\s*$", sql, re.I)
        if tm:
            sql = f"SELECT * FROM {tm.group(1)}"
        # a CTE alias SHADOWS a same-named table (pg scoping): swapping
        # such a reference to the overlay view would answer from the
        # table where pg answers from the CTE — skip the rewrite and
        # let Spark's own scoping resolve it (late-r12 review fix)
        ctes = self._cte_aliases(sql)
        # transactional DDL (late r12): a deferred-dropped table reads
        # as gone; a txn-created table reads through its (unregistered)
        # manifest — both mutually exclusive with buffered DML
        dropped = txn.get("dropped")
        if dropped and self._references_table(sql, dropped):
            # scope-aware shadow check (ADVICE r12): a same-named CTE
            # only suppresses the 42P01 for references INSIDE its scope
            # — a CTE buried in a subquery must not make an out-of-scope
            # reference read the dropped table as alive
            scopes = self._cte_shadow_scopes(sql, dropped)
            refs = self._table_token_spans(sql, dropped)
            if any(
                not any(a <= s < b for a, b in scopes) for s, _ in refs
            ):
                raise _WireError(
                    "42P01",
                    f"relation {dropped!r} does not exist (dropped in "
                    "the current transaction)",
                )
        created = txn.get("created")
        if created and created["name"] in ctes:
            created = None
        if created and self._references_table(sql, created["name"]):
            from sclera_spark.sources.manifest import ManifestTable

            overlay = ManifestTable(created["path"]).read(
                self.server.engine.spark
            )
            view = f"__sclera_txn_{_uuid.uuid4().hex[:12]}"
            overlay.createOrReplaceTempView(view)
            try:
                rewritten = self._swap_table_token(
                    sql, created["name"], view
                )
                return _to_resultset(
                    self.server.engine.execute(rewritten), rewritten
                )
            finally:
                self._drop_overlay_views([view])
        # every written table referenced in the statement gets its own
        # overlay view (r13: a multi-object transaction's SELECT may
        # join two buffered tables — both read their own writes)
        rewritten, views = self._overlay_rewrite(txn, sql, ctes=ctes)
        try:
            if rewritten == sql:
                return None
            return _to_resultset(
                self.server.engine.execute(rewritten), rewritten
            )
        finally:
            self._drop_overlay_views(views)

    def _overlay_view(self, txn: dict, name: str) -> str | None:
        """Register a per-statement temp view over a buffered table's
        pre-statement effective state: snapshot minus this
        transaction's rewritten files, plus its staged parts. The
        CALLER owns the view's lifetime (``_drop_overlay_views``).
        Returns None when the table has no buffer or no manifest."""
        import uuid as _uuid

        ddl = self.server.engine.ddl()
        spark = self.server.engine.spark
        w = txn.get("writes", {}).get(name)
        if w is None or not (w["parts"] or w["removes"]):
            return None
        try:
            mt = ddl._manifest(name)
        except Exception:
            return None
        removes = w["removes"]
        live = [
            p for p in mt.files() if os.path.basename(p) not in removes
        ]
        staged_files = [
            os.path.join(scratch, f)
            for scratch, names in w["parts"]
            for f in names
        ]
        paths = live + staged_files
        overlay = (
            mt.read(spark, file_paths=paths)
            if paths
            else mt.read(spark).limit(0)
        )
        view = f"__sclera_txn_{_uuid.uuid4().hex[:12]}"
        overlay.createOrReplaceTempView(view)
        return view

    def _overlay_rewrite(
        self,
        txn: dict,
        sql: str,
        exclude: tuple = (),
        ctes: set[str] | None = None,
    ) -> tuple[str, list[str]]:
        """Swap every reference to a buffered table (except ``exclude``
        — a DML's own target, whose RYOW the stager handles) to a
        per-statement overlay view of snapshot-minus-rewritten-files
        plus staged parts. Used by mid-txn reads AND by DML source
        queries (r13: INSERT INTO b SELECT ... FROM a must see a's
        buffered rows when a is written by the same transaction — pg
        read-your-own-writes crosses tables). Caller drops the views
        (``_drop_overlay_views``) after the statement's Spark work; a
        failure mid-rewrite drops the views already created HERE, so a
        raising manifest read can never leak a view into the shared
        catalog."""
        if ctes is None:
            ctes = self._cte_aliases(sql)
        rewritten = sql
        views: list[str] = []
        try:
            for name, w in txn.get("writes", {}).items():
                if name in exclude or not (w["parts"] or w["removes"]):
                    continue
                if name in ctes:
                    continue  # CTE shadows the buffered table (pg)
                # the table must be referenced AS A TABLE (FROM-list
                # position or as a dotted qualifier) — a mere column/
                # alias spelled like the table name must neither
                # trigger nor suffer the rewrite
                if not self._references_table(rewritten, name):
                    continue
                view = self._overlay_view(txn, name)
                if view is None:
                    continue
                views.append(view)
                rewritten = self._swap_table_token(rewritten, name, view)
        except Exception:
            self._drop_overlay_views(views)
            raise
        return rewritten, views

    def _drop_overlay_views(self, views: list[str]) -> None:
        # analysis already bound the views' plans into the produced
        # DataFrames; dropping here cannot invalidate them
        spark = self.server.engine.spark
        for view in views:
            try:
                spark.catalog.dropTempView(view)
            except Exception:
                pass

    _IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_$]*")

    # `name AS (` outside literals is a CTE definition and nothing
    # else in SQL (column aliases are never followed by '('; derived
    # tables spell `AS name`, not `name AS`)
    _CTE_DEF_RE = re.compile(r"(?i)\b(\w+)\s+AS\s*\(")

    @classmethod
    def _cte_aliases(cls, sql: str) -> set[str]:
        """Lowercased CTE alias names defined anywhere in the query
        (any nesting depth — scope-insensitively, which errs toward
        skipping an overlay rewrite, never toward a wrong one)."""
        from sclera_spark.plans.frontend import _split_literals

        out: set[str] = set()
        for is_lit, chunk in _split_literals(sql):
            if not is_lit:
                for m in cls._CTE_DEF_RE.finditer(chunk):
                    out.add(m.group(1).lower())
        return out

    @classmethod
    def _cte_shadow_scopes(cls, sql: str, name: str) -> list[tuple[int, int]]:
        """Spans (absolute offsets) where a CTE named ``name`` is IN
        SCOPE, pg scoping approximated (ADVICE r12 — the dropped-table
        visibility check must not be disabled by a same-named CTE at an
        unrelated nesting depth): a CTE is visible from the END of its
        own definition body (a non-recursive CTE cannot see itself) to
        the end of its enclosing parenthesized subquery — the whole
        statement when the WITH is top-level."""
        from sclera_spark.plans.frontend import _split_literals

        # literal-blanked copy preserving offsets, so paren matching and
        # the def-site regex never fire inside strings
        code = "".join(
            " " * len(chunk) if is_lit else chunk
            for is_lit, chunk in _split_literals(sql)
        )
        stack: list[int] = []
        close_of: dict[int, int] = {}
        for i, ch in enumerate(code):
            if ch == "(":
                stack.append(i)
            elif ch == ")" and stack:
                close_of[stack.pop()] = i
        scopes: list[tuple[int, int]] = []
        pat = re.compile(rf"\b{re.escape(name)}\s+AS\s*\(", re.I)
        for m in pat.finditer(code):
            body_open = m.end() - 1
            body_close = close_of.get(body_open, len(code) - 1)
            # enclosing region: the innermost paren still open at the
            # def site (recompute via a prefix scan — def sites are few)
            depth_stack: list[int] = []
            for i in range(m.start()):
                if code[i] == "(":
                    depth_stack.append(i)
                elif code[i] == ")" and depth_stack:
                    depth_stack.pop()
            region_end = (
                close_of.get(depth_stack[-1], len(code))
                if depth_stack
                else len(code)
            )
            scopes.append((body_close + 1, region_end))
        return scopes

    # tokens the FROM-list state machine walks: identifiers + the three
    # structural characters that change table-position context
    _TOK_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_$]*|[(),]")
    # clause keywords that END a FROM list's table-position context.
    # `using` is NOT here (r13 ADVICE): pg's USING introduces table
    # references in `MERGE INTO t USING src` and `DELETE FROM t USING
    # a, b` — it enters table position like FROM/JOIN below. The
    # join-column form `JOIN x USING (k)` stays safe: the `(` pushes a
    # non-FROM paren scope, so the column names inside never match.
    _CLAUSE_BREAK = frozenset(
        "where group order having limit offset on select set "
        "values window qualify when then case end union intersect "
        "except fetch".split()
    )

    @classmethod
    def _table_token_spans(
        cls, sql: str, table: str, positions_only: bool = False
    ) -> list[tuple[int, int]]:
        """Spans (absolute offsets) where ``table`` appears in
        TABLE-REFERENCE position: directly after FROM/JOIN, after a
        comma WITHIN a FROM list (pg comma joins — r13, multi-table
        RYOW reads often join two buffered tables this way), or as a
        dotted qualifier (`table.col`). Column/alias uses of the same
        word are excluded — rewriting those would break the query (r12
        review finding). Context nests through parentheses (a comma in
        a function-argument or IN list is never a FROM separator);
        known approximation: a comma after an explicit JOIN ... ON
        condition does not re-enter table position.

        ``positions_only`` drops the dotted-qualifier spans: the
        self-reference RYOW swap replaces only FROM/JOIN-position
        occurrences (as ``view AS table``, preserving the relation
        name), so qualifiers keep their pg scoping — a correlated
        ``table.col`` inside a subquery must keep binding to whichever
        relation named ``table`` is in scope, not get textually
        repointed."""
        from sclera_spark.plans.frontend import _split_literals

        # literal-blanked copy preserving offsets
        code = "".join(
            " " * len(chunk) if is_lit else chunk
            for is_lit, chunk in _split_literals(sql)
        )
        spans: list[tuple[int, int]] = []
        in_from = [False]  # per paren depth
        expect = False  # next identifier is a table reference
        for m in cls._TOK_RE.finditer(code):
            tok = m.group(0)
            if tok == "(":
                in_from.append(False)
                expect = False
                continue
            if tok == ")":
                if len(in_from) > 1:
                    in_from.pop()
                expect = False
                continue
            if tok == ",":
                expect = in_from[-1]
                continue
            low = tok.lower()
            if low == "from":
                in_from[-1] = True
                expect = True
                continue
            if low == "join":
                in_from[-1] = True
                expect = True
                continue
            if low == "using":
                # MERGE INTO t USING src / DELETE FROM t USING a, b:
                # table position. (JOIN ... USING (cols) immediately
                # opens a paren scope, which neutralizes this.)
                in_from[-1] = True
                expect = True
                continue
            if low in cls._CLAUSE_BREAK:
                in_from[-1] = False
                expect = False
                continue
            if low == table:
                rest = code[m.end():].lstrip()
                qualifier = code[m.end(): m.end() + 1] == "."
                if (
                    expect or (qualifier and not positions_only)
                ) and not rest.startswith("("):
                    spans.append((m.start(), m.end()))
            expect = False
        return spans

    @classmethod
    def _references_table(cls, sql: str, table: str) -> bool:
        return bool(cls._table_token_spans(sql, table))

    @classmethod
    def _swap_table_token(
        cls, sql: str, table: str, replacement: str
    ) -> str:
        """Replace table-position references to ``table`` (outside
        string literals, case-insensitive) with the overlay view name."""
        out = []
        last = 0
        for a, b in cls._table_token_spans(sql, table):
            out.append(sql[last:a])
            out.append(replacement)
            last = b
        out.append(sql[last:])
        return "".join(out)

    # words that can directly follow a FROM-list table token without
    # being its alias (so `view AS table` is the right swap there)
    _NOT_AN_ALIAS = frozenset(
        "where set on using group order limit offset having join inner "
        "left right full cross natural union intersect except returning "
        "when then and or not as for fetch window".split()
    )

    @classmethod
    def _swap_self_refs(
        cls, sql: str, table: str, view: str, start_at: int
    ) -> str:
        """Self-reference RYOW swap (r13 review): replace FROM-position
        references to a DML's OWN target occurring at/after
        ``start_at`` (past the outer target token) with the overlay
        view. Un-aliased occurrences become ``view AS table`` so every
        qualifier and correlation inside the statement keeps resolving
        exactly as pg would resolve it against the real table; aliased
        occurrences take the bare view (the alias already renames the
        relation). The outer target token itself is never touched —
        the stager owns that scan."""
        from sclera_spark.plans.frontend import _split_literals

        spans = [
            s
            for s in cls._table_token_spans(sql, table, positions_only=True)
            if s[0] >= start_at
        ]
        if not spans:
            return sql
        code = "".join(
            " " * len(chunk) if is_lit else chunk
            for is_lit, chunk in _split_literals(sql)
        )
        out = []
        last = 0
        for a, b in spans:
            out.append(sql[last:a])
            nxt = re.match(r"\s+([A-Za-z_]\w*)", code[b:])
            aliased = bool(nxt) and (
                nxt.group(1).lower() == "as"
                or nxt.group(1).lower() not in cls._NOT_AN_ALIAS
            )
            out.append(view if aliased else f"{view} AS {table}")
            last = b
        out.append(sql[last:])
        return "".join(out)

    _ROLLBACK_TO_RE = re.compile(
        r"^\s*ROLLBACK\s+(?:WORK\s+|TRANSACTION\s+)?TO\s+"
        r"(?:SAVEPOINT\s+)?(\w+)\s*$",
        re.I,
    )
    _SAVEPOINT_RE = re.compile(r"^\s*SAVEPOINT\s+(\w+)\s*$", re.I)
    _RELEASE_RE = re.compile(
        r"^\s*RELEASE\s+(?:SAVEPOINT\s+)?(\w+)\s*$", re.I
    )

    def _savepoint(self, verb: str, sql: str) -> _ResultSet:
        """SAVEPOINT / ROLLBACK TO / RELEASE over the staged-batch txn
        model (r11): a savepoint is a MARK in the buffered work —
        (#parts, removes, rows, table) at creation. ROLLBACK TO
        discards exactly the batches staged after the mark (they were
        never visible, so the partial rollback is truthful, same as
        full ROLLBACK) and destroys later savepoints, keeping this one
        re-rollbackable — pg semantics. RELEASE keeps effects and
        destroys the savepoint and its successors."""
        txn = getattr(self, "_txn", None)
        if txn is None:
            raise _WireError(
                "25P01",
                f"{verb if verb in ('SAVEPOINT', 'RELEASE') else 'ROLLBACK TO'}"
                " can only be used in transaction blocks",
            )
        sp = txn["savepoints"]
        if verb == "SAVEPOINT":
            m = self._SAVEPOINT_RE.match(sql)
            if m is None:
                raise _WireError("42601", f"cannot parse: {sql[:60]!r}")
            name = m.group(1).lower()
            sp.pop(name, None)  # re-establish at the CURRENT position
            created = txn.get("created")
            created_version = None
            if created:
                from sclera_spark.sources.manifest import ManifestTable

                created_version = ManifestTable(created["path"]).version()
            sp[name] = {
                # full per-table LIST copies, not counts: later
                # same-txn DML may REWRITE earlier staged parts in
                # place (r12 RYOW), so restoring must bring back the
                # exact tuples
                "writes": {
                    t: {
                        "parts": list(w["parts"]),
                        "removes": set(w["removes"]),
                    }
                    for t, w in txn["writes"].items()
                },
                "rows": txn["rows"],
                # txn-created table: the manifest VERSION at the mark —
                # rollback RESTOREs it (pure metadata, re-rollbackable)
                "created": dict(created) if created else None,
                "created_version": created_version,
                "dropped": txn.get("dropped"),
            }
            return _ResultSet(None, None, None, "SAVEPOINT")
        m = self._RELEASE_RE.match(sql) if verb == "RELEASE" else (
            self._ROLLBACK_TO_RE.match(sql)
        )
        if m is None:
            raise _WireError("42601", f"cannot parse: {sql[:60]!r}")
        name = m.group(1).lower()
        if name not in sp:
            raise _WireError("3B001", f"savepoint {name!r} does not exist")
        names = list(sp)
        later = names[names.index(name) + 1:]
        if verb == "RELEASE":
            for nm in (name, *later):
                sp.pop(nm, None)
            return _ResultSet(None, None, None, "RELEASE")
        mark = sp[name]
        # no scratch reclaim here: parts dropped by this rollback may
        # still be referenced by EARLIER savepoints' copies — the
        # all_staged ledger reclaims every orphan at transaction end
        cur = txn.get("created")
        want = mark.get("created")
        if want and (cur is None or cur["path"] != want["path"]):
            # the created table the mark recorded was DROPPED after the
            # mark (possibly replaced by a NEW creation — paths are
            # unique per CREATE, so identity is the path): its
            # directory is gone and cannot be restored truthfully —
            # refuse BEFORE mutating any transaction state
            raise _WireError(
                "0A000",
                "cannot roll back to a savepoint taken before a "
                "same-transaction DROP of the transaction-created "
                f"table {want['name']!r}: the creation was already "
                "undone. ROLLBACK the whole transaction instead.",
            )
        if cur and want:
            # restore the created table's manifest to the mark's
            # version — pure metadata, re-rollbackable. Runs before
            # the state mutation below so a restore failure leaves the
            # transaction exactly as it was.
            from sclera_spark.sources.manifest import ManifestTable

            mt = ManifestTable(cur["path"])
            if mt.version() != mark["created_version"]:
                mt.restore(mark["created_version"])
        txn["writes"] = {
            t: {
                "parts": list(w["parts"]),
                "removes": set(w["removes"]),
            }
            for t, w in mark["writes"].items()
        }
        txn["rows"] = mark["rows"]
        txn["dropped"] = mark.get("dropped")
        if cur and want is None:
            # the table was created AFTER the mark: undo the creation
            import shutil as _shutil

            _shutil.rmtree(cur["path"], ignore_errors=True)
            txn["created"] = None
        for nm in later:
            sp.pop(nm, None)
        return _ResultSet(None, None, None, "ROLLBACK")

    # quoted ("Name") and public-qualified spellings accepted, same
    # resolution as autocommit: identifiers fold to lowercase (the
    # engine's registries are lowercase-keyed — the documented
    # case-insensitivity divergence from pg's quoted-identifier rules)
    _INSERT_RE = re.compile(
        r'^\s*INSERT\s+INTO\s+((?:"[^"]+"|\w+)(?:\s*\.\s*(?:"[^"]+"|\w+))?)'
        r"\s+(.*)$",
        re.I | re.S,
    )

    @staticmethod
    def _txn_parts(txn: dict) -> list:
        """Every LIVE staged tuple across the transaction's tables."""
        return [
            p
            for w in txn.get("writes", {}).values()
            for p in w["parts"]
        ]

    @staticmethod
    def _txn_entry(txn: dict, name: str) -> dict:
        """The per-table write buffer, created on first touch (r13
        multi-object transactions)."""
        return txn["writes"].setdefault(
            name.lower(), {"parts": [], "removes": set()}
        )

    @staticmethod
    def _refuse_multi_cas(txn: dict, ddl, name: str) -> None:
        """r14: multi-table transactions run on EITHER commit protocol
        — all-flock groups journal locally
        (manifest.commit_staged_group), all-CAS groups journal as a
        put-if-absent object in the CAS store itself
        (CasManifestTable.commit_staged_group_cas). What cannot work is
        a MIXED group: the two commit points live in different stores,
        so no single journal covers both. Refused at STATEMENT time so
        no work is buffered only to die at COMMIT."""
        tables = set(txn.get("writes", {})) | {name.lower()}
        if len(tables) < 2:
            return
        cas = sorted(
            t for t in tables if t in ddl.cas_manifest_tables
        )
        if cas and len(cas) != len(tables):
            plain = sorted(t for t in tables if t not in ddl.cas_manifest_tables)
            raise _WireError(
                "0A000",
                f"multi-table transactions cannot MIX CAS-backed "
                f"table(s) {cas} with flock-protocol table(s) {plain}: "
                "their commit points live in different stores, so no "
                "single intent journal covers both. Use separate "
                "transactions (all-CAS and all-flock groups each "
                "commit atomically).",
            )

    @staticmethod
    def _dequote_table(spelled: str) -> str:
        """`"Name"` / `public.name` / `"public"."Name"` → bare name;
        raises for a non-public schema qualifier (we serve exactly one
        namespace, reported as `public` in pg_catalog)."""
        parts = [
            p.strip().strip('"')
            for p in re.split(r"\.(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)", spelled)
        ]
        if len(parts) == 2:
            if parts[0].lower() != "public":
                raise _WireError(
                    "3F000", f"schema {parts[0]!r} does not exist"
                )
            return parts[1]
        return parts[0]

    def _txn_buffer(self, txn: dict, verb: str, sql: str) -> _ResultSet:
        """One DML statement inside an open transaction: buffer a
        manifest-table INSERT as staged part files, stage an
        UPDATE/DELETE as a copy-on-write file swap published at COMMIT
        (r11 — validate-inside-commit makes concurrent write-write
        conflicts abort loudly), refuse (0A000) anything a ROLLBACK
        could not truthfully undo."""
        ddl = self.server.engine.ddl()
        if verb == "CREATE":
            return self._txn_create(txn, sql)
        if verb == "DROP":
            return self._txn_drop(txn, sql)
        if txn.get("dropped"):
            raise _WireError(
                "0A000",
                "this transaction holds a deferred DROP TABLE "
                f"{txn['dropped']}; it supports no further statements "
                "that mutate state — COMMIT or ROLLBACK first",
            )
        if txn.get("created"):
            return self._txn_created_dml(txn, verb, sql)
        if verb in ("UPDATE", "DELETE", "MERGE"):
            from sclera_spark.plans.ddl import TxnDmlRefused

            # pre-parse the TARGET table so the statement reads (and
            # rewrites) ITS OWN table's buffered parts — multi-object
            # transactions (r13) buffer each table independently
            tm = (
                ddl._TXN_MERGE_RE.match(sql)
                if verb == "MERGE"
                else ddl._TXN_UPDATE_RE.match(sql)
                if verb == "UPDATE"
                else ddl._TXN_DELETE_RE.match(sql)
            )
            target = tm.group(1).lower() if tm else None
            if target is not None:
                self._refuse_multi_cas(txn, ddl, target)
            # existing buffer when the table was touched before; a
            # FRESH buffer is registered only after the stage succeeds
            # (a refused statement must not leave a phantom entry)
            entry = (
                txn["writes"].get(target)
                if target is not None
                else None
            ) or {"parts": [], "removes": set()}
            created: list = []
            # cross-table RYOW (r13): a source/predicate subquery
            # referencing ANOTHER buffered table reads its overlay
            # (the target's own RYOW lives in the stager); views live
            # until the stager's Spark work finished
            src_views: list = []
            # self-reference RYOW (r13 review): a predicate subquery /
            # USING source reading the statement's OWN target must see
            # the transaction's buffered rows too (pg: after BEGIN;
            # INSERT INTO t VALUES (5), DELETE FROM t WHERE k IN
            # (SELECT k FROM t) deletes the staged 5). Swap only the
            # FROM-position references AFTER the outer target token to
            # `view AS t`, so qualifiers/correlation keep pg scoping;
            # the outer scan stays with the stager.
            if (
                tm is not None
                and target in txn.get("writes", {})
                and target not in self._cte_aliases(sql)
            ):
                spans = self._table_token_spans(
                    sql, target, positions_only=True
                )
                if any(a >= tm.end(1) for a, _ in spans):
                    view = self._overlay_view(txn, target)
                    if view is not None:
                        src_views.append(view)
                        sql = self._swap_self_refs(
                            sql, target, view, tm.end(1)
                        )
            try:
                sql, views2 = self._overlay_rewrite(
                    txn, sql, exclude=(target,) if target else ()
                )
            except Exception:
                self._drop_overlay_views(src_views)
                raise
            src_views.extend(views2)
            try:
                if verb == "MERGE":
                    # PG 15+ tag form 'MERGE <n>' — clients parse the
                    # affected-row count out of the tag. staged_parts
                    # passed in (r12): the MERGE target unions this
                    # transaction's buffered rows (read-your-own-writes);
                    # hit staged parts are replaced in the entry's parts
                    # in place, and every scratch dir enters the
                    # all_staged ledger the moment it exists
                    name, staged, removes, n = ddl.txn_stage_merge(
                        sql, entry["removes"],
                        staged_parts=entry["parts"],
                        staged_table=target,
                        ledger=txn.setdefault("all_staged", []),
                    )
                else:
                    # staged_parts passed in: the DML also rewrites this
                    # transaction's own buffered rows (read-your-own-
                    # writes), replacing tuples in the entry's parts in
                    # place; the ledger receives every scratch dir as it
                    # is created, and entry state mutates only after all
                    # Spark work succeeded — a statement that dies
                    # mid-flight is a clean no-op with reclaimable
                    # scratch
                    name, staged, removes, n, _, created = (
                        ddl.txn_stage_dml(
                            sql, entry["removes"],
                            staged_parts=entry["parts"],
                            staged_table=target,
                            ledger=txn.setdefault("all_staged", []),
                        )
                    )
            except TxnDmlRefused as exc:
                raise _WireError("0A000", str(exc))
            finally:
                self._drop_overlay_views(src_views)
            if staged is not None:
                entry["parts"].append(staged)
                entry["removes"] |= removes
            if entry["parts"] or entry["removes"]:
                # idempotent: when the table was touched before, entry
                # IS the registered dict already
                txn["writes"][name.lower()] = entry
            tag = verb if n is None else f"{verb} {n}"
            return _ResultSet(None, None, None, tag)
        if verb != "INSERT":
            raise _WireError(
                "0A000",
                f"{verb} inside a transaction is not supported: only "
                "manifest-table INSERT/UPDATE/DELETE/MERGE/COPY are "
                "buffered for atomic commit; run other statements in autocommit "
                "(outside BEGIN)",
            )
        m = self._INSERT_RE.match(sql)
        if m is None:
            raise _WireError("42601", f"cannot parse INSERT: {sql[:80]!r}")
        name, rest = self._dequote_table(m.group(1)), m.group(2)
        if name.lower() not in ddl.manifest_tables:
            raise _WireError(
                "0A000",
                f"INSERT INTO {name} inside a transaction: only "
                "MANIFEST tables support buffered transactional "
                "inserts (ALTER TABLE ... SET FORMAT MANIFEST)",
            )
        self._refuse_multi_cas(txn, ddl, name)
        mt = ddl._manifest(name)
        # cross-table (and self-) RYOW for the INSERT's source query:
        # `INSERT INTO b SELECT ... FROM a` sees a's buffered rows, and
        # `INSERT INTO t SELECT ... FROM t` sees t's own earlier
        # inserts (pg semantics). VALUES sources have no table refs and
        # pass through unchanged.
        rest, src_views = self._overlay_rewrite(txn, rest)
        try:
            df = ddl.insert_frame(name, rest)
            scratch, names = mt._stage(df)
        finally:
            self._drop_overlay_views(src_views)
        # track the staged batch BEFORE anything else can raise, so
        # ROLLBACK / disconnect cleanup always reclaims the scratch dir
        w = self._txn_entry(txn, name)
        w["parts"].append((scratch, names))
        txn.setdefault("all_staged", []).append((scratch, names))
        # exact inserted-row count from the staged footers (no extra job)
        import pyarrow.parquet as pq

        n = sum(
            pq.ParquetFile(os.path.join(scratch, f)).metadata.num_rows
            for f in names
        )
        txn["rows"] += n
        return _ResultSet(None, None, None, f"INSERT 0 {n}")

    _TXN_CTAS_RE = re.compile(
        r"^\s*CREATE\s+TABLE\s+(\w+)\s+AS\s+(.*)$", re.I | re.S
    )
    _TXN_CREATE_COLS_RE = re.compile(
        r"^\s*CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*$", re.I | re.S
    )
    _TXN_DROP_TABLE_RE = re.compile(
        r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?(\w+)\s*$", re.I
    )

    def _txn_create(self, txn: dict, sql: str) -> _ResultSet:
        """Transactional CREATE TABLE (late r12): the table is
        materialized AT ITS WAREHOUSE PATH as a real manifest table,
        but the shared catalog registration — the only state any other
        session can see — happens at COMMIT. ROLLBACK removes the
        directory; nothing was ever visible, so the rollback is
        truthful. Forms: CREATE TABLE name AS <query> and
        CREATE TABLE name (cols); every other CREATE stays 0A000.
        A transaction spans ONE object: CREATE in a txn that already
        buffers DML (or vice versa) refuses."""
        import shutil as _shutil

        from sclera_spark.sources.manifest import ManifestTable

        ddl = self.server.engine.ddl()
        query = body = None
        m = self._TXN_CTAS_RE.match(sql)
        if m:
            name, query = m.groups()
        else:
            m = self._TXN_CREATE_COLS_RE.match(sql)
            if m is None:
                raise _WireError(
                    "0A000",
                    "only CREATE TABLE <name> AS <query> and CREATE "
                    "TABLE <name> (columns) are supported inside a "
                    "transaction; run other DDL in autocommit "
                    "(outside BEGIN)",
                )
            name, body = m.groups()
        name = name.lower()
        if (
            any(
                w["parts"] or w["removes"]
                for w in txn["writes"].values()
            )
            or txn.get("created")
            or txn.get("dropped")
        ):
            raise _WireError(
                "0A000",
                "transactional DDL spans ONE object: this transaction "
                "already buffers work; COMMIT first or use a separate "
                "transaction for CREATE TABLE",
            )
        try:
            self.server.engine.table(name)
        except Exception:
            pass
        else:
            raise _WireError("42P07", f"relation {name!r} already exists")
        final = ddl._path(name)
        if os.path.exists(final):
            raise _WireError(
                "42P07",
                f"the warehouse path for {name!r} is already occupied; "
                "choose another name",
            )
        # the table is built at a UNIQUE staging path and renamed into
        # the warehouse path at COMMIT: rollback/disconnect reclamation
        # then can only ever touch THIS transaction's directory — a
        # concurrent autocommit CTAS landing at the deterministic path
        # meanwhile is untouched, and the commit-time rename losing the
        # race aborts 40001 without deleting the winner's data
        import uuid as _uuid

        path = f"{final}.txn{_uuid.uuid4().hex[:12]}"
        if query is not None:
            df = self.server.engine.sql(query)
        else:
            df = self.server.engine.spark.createDataFrame(
                [], ddl.create_table_schema(body)
            )
        try:
            # table_schema in the meta: an empty frame can write ZERO
            # part files, and a schema-only snapshot must still read
            ManifestTable.create(
                df, path, meta={"table_schema": df.schema.json()}
            )
        except Exception:
            _shutil.rmtree(path, ignore_errors=True)
            raise
        txn["created"] = {"name": name, "path": path, "final": final}
        return _ResultSet(None, None, None, "CREATE TABLE")

    def _txn_drop(self, txn: dict, sql: str) -> _ResultSet:
        """Transactional DROP TABLE (late r12): dropping a table this
        transaction CREATED undoes the creation on the spot (it was
        never visible); dropping a published table DEFERS the drop to
        COMMIT — reads inside the transaction already refuse 42P01,
        ROLLBACK keeps the table. One deferred drop per transaction,
        nothing else buffered (single-object atomicity)."""
        import shutil as _shutil

        m = self._TXN_DROP_TABLE_RE.match(sql)
        if m is None:
            raise _WireError(
                "0A000",
                "only DROP TABLE <name> is supported inside a "
                "transaction; run other DROP forms in autocommit "
                "(outside BEGIN)",
            )
        if_exists, name = bool(m.group(1)), m.group(2).lower()
        created = txn.get("created")
        if created and created["name"] == name:
            _shutil.rmtree(created["path"], ignore_errors=True)
            txn["created"] = None
            return _ResultSet(None, None, None, "DROP TABLE")
        if (
            any(
                w["parts"] or w["removes"]
                for w in txn["writes"].values()
            )
            or created
            or txn.get("dropped")
        ):
            raise _WireError(
                "0A000",
                "transactional DDL spans ONE object: this transaction "
                "already buffers work; COMMIT first or use a separate "
                "transaction for DROP TABLE",
            )
        ddl = self.server.engine.ddl()
        if name in ddl.views:
            raise _WireError(
                "0A000",
                f"{name!r} is a view; DROP VIEW inside a transaction "
                "is not supported — run it in autocommit",
            )
        if name not in ddl.managed:
            # catalog-registered but unmanaged tables (register_parquet,
            # external registrations) drop through the same deferred
            # path — autocommit DROP TABLE handles them, so must we
            try:
                self.server.engine.table(name)
            except Exception:
                if if_exists:
                    self._notice(
                        f"table {name!r} does not exist, skipping"
                    )
                    return _ResultSet(None, None, None, "DROP TABLE")
                raise _WireError(
                    "42P01", f"table {name!r} does not exist"
                )
        txn["dropped"] = name
        return _ResultSet(None, None, None, "DROP TABLE")

    def _txn_created_dml(self, txn: dict, verb: str, sql: str) -> _ResultSet:
        """DML on the table this transaction CREATED: the table is
        invisible to every other session until COMMIT registers it, so
        statements commit DIRECTLY into its manifest (full version
        history — savepoint rollbacks RESTORE the recorded version).
        INSERT/UPDATE/DELETE; MERGE on an in-transaction table refuses
        (its lowering needs the shared registration)."""
        from pyspark.sql import functions as F

        from sclera_spark.sources.manifest import ManifestTable

        created = txn["created"]
        ddl = self.server.engine.ddl()
        spark = self.server.engine.spark
        if verb == "INSERT":
            m = self._INSERT_RE.match(sql)
            if m is None:
                raise _WireError("42601", f"cannot parse INSERT: {sql[:80]!r}")
            name, rest = self._dequote_table(m.group(1)).lower(), m.group(2)
        elif verb == "UPDATE":
            m = ddl._TXN_UPDATE_RE.match(sql)
            if m is None:
                raise _WireError("42601", f"cannot parse UPDATE: {sql[:80]!r}")
            name = m.group(1).lower()
        elif verb == "DELETE":
            m = ddl._TXN_DELETE_RE.match(sql)
            if m is None:
                raise _WireError("42601", f"cannot parse DELETE: {sql[:80]!r}")
            name = m.group(1).lower()
        else:
            raise _WireError(
                "0A000",
                f"{verb} is not supported in a transaction that "
                "created a table; COMMIT first",
            )
        if name != created["name"]:
            raise _WireError(
                "0A000",
                "transactions span ONE object: this transaction "
                f"created table {created['name']}, cannot also write "
                f"{name}. COMMIT first or use separate transactions.",
            )
        mt = ManifestTable(created["path"])
        tbl = mt.read(spark)
        if verb == "INSERT":
            incoming = ddl.insert_frame(name, rest, target=tbl)
            before = sum(mt.file_rows().values())
            mt.append(incoming)
            n = sum(mt.file_rows().values()) - before
            txn["rows"] += n
            return _ResultSet(None, None, None, f"INSERT 0 {n}")
        where = m.group(3) if verb == "UPDATE" else m.group(2)
        n = tbl.filter(F.expr(where)).count() if where else tbl.count()
        if n:
            if verb == "UPDATE":
                transform = ddl._update_transform(m.group(2), where)
            else:
                transform = ddl._delete_transform(where)
            # file-granular COW exactly like published-table DML: a
            # selective statement on a big in-txn CTAS rewrites only
            # the hit files (the stats-narrowed probe), not the table
            hits = ddl._manifest_dml_hits(mt, where) if where else None
            if hits and len(hits) < len(mt.files()):
                mt.replace_files(
                    hits, transform(mt.read(spark, file_paths=hits))
                )
            else:
                mt.overwrite(transform(mt.read(spark)))
        return _ResultSet(None, None, None, f"{verb} {n}")

    def _statement_timer(self):
        """Arm a timer that cancels this session's Spark job group when
        statement_timeout elapses; the running action then raises and the
        normal error path reports 57014. Covers execution AND result
        streaming (toLocalIterator keeps triggering jobs)."""
        timeout_ms = getattr(self, "_stmt_timeout_ms", 0)
        if not timeout_ms:
            return None
        group = getattr(self, "_job_group", None)
        spark = self.server.engine.spark
        if group is None:
            return None

        stop = threading.Event()

        target = getattr(self, "_cancel_target", None)

        def fire():
            # cancelJobGroup only kills ACTIVE jobs — a job still in
            # planning when the deadline hits would escape a one-shot
            # cancel, so keep killing until the statement path disarms us
            if target is not None:
                target.flag.set()  # timeout reports as 57014, per pg
            while not stop.is_set():
                try:
                    spark.sparkContext.cancelJobGroup(group)
                except Exception:
                    pass
                stop.wait(0.2)

        t = threading.Timer(timeout_ms / 1000.0, fire)
        t.daemon = True
        t.start()

        class _Disarm:
            def cancel(self):
                stop.set()
                t.cancel()

        return _Disarm()

    def _send_rows(self, rs: _ResultSet, sql: str, with_description: bool) -> None:
        if rs.columns is None:
            self._send(_msg(b"C", _cstr(rs.tag)))
            return
        if with_description:
            self._send(self._row_description(rs))
        n = 0
        for row in rs.rows:
            out = io.BytesIO()
            out.write(struct.pack("!h", len(row)))
            for v in row:
                tv = _text_value(v)
                if tv is None:
                    out.write(struct.pack("!i", -1))
                else:
                    out.write(struct.pack("!i", len(tv)))
                    out.write(tv)
            self._send(_msg(b"D", out.getvalue()))
            n += 1
        self._send(_msg(b"C", _cstr(rs.tag or _tag_for(sql, n))))

    @staticmethod
    def _row_description(rs: _ResultSet) -> bytes:
        out = io.BytesIO()
        out.write(struct.pack("!h", len(rs.columns)))
        for name, oid in zip(rs.columns, rs.oids):
            out.write(_cstr(name))
            out.write(struct.pack("!ihihih", 0, 0, oid, _TYPLEN.get(oid, -1), -1, 0))
        return _msg(b"T", out.getvalue())

    def _simple_query(self, text: str) -> None:
        statements = [s for s in _split_statements(text) if s.strip()]
        if not statements:
            self._send(_msg(b"I"))  # EmptyQueryResponse
            self._ready()
            return
        for sql in statements:
            timer = self._statement_timer()
            try:
                copy_m = self._COPY_OUT_RE.match(sql)
                copy_in_m = self._COPY_IN_RE.match(sql)
                if copy_m:
                    self._copy_out(copy_m)
                elif copy_in_m:
                    # inside a transaction the load is BUFFERED like any
                    # INSERT (r11): rows stage outside data/, publish at
                    # COMMIT, vanish truthfully on ROLLBACK — the
                    # manifest-table-only / single-table refusals of
                    # _txn_buffer apply after the stream drains
                    self._copy_in(copy_in_m)
                else:
                    rs = self._run(sql)
                    self._send_rows(rs, sql, with_description=True)
            except Exception as exc:  # noqa: BLE001 — wire boundary
                self._error(self._sqlstate_for(exc), str(exc))
                break
            finally:
                if timer is not None:
                    timer.cancel()
        self._ready()

    # COPY (query | table) TO STDOUT — the bulk-export half of the pg
    # COPY protocol (what psql's \copy ... to <file> speaks); the
    # FROM STDIN half is _copy_in below.
    _COPY_OUT_RE = re.compile(
        r"^\s*COPY\s+(?:\(\s*(?P<q>.+?)\s*\)|"
        r'(?P<t>(?:"[^"]+"|\w+)(?:\s*\.\s*(?:"[^"]+"|\w+))?))\s+TO\s+STDOUT'
        r"(?:\s+(?:WITH\s+)?\(\s*(?P<opts>[^)]*)\))?\s*$",
        re.I | re.S,
    )

    def _copy_out(self, m) -> None:
        """CopyOutResponse / CopyData / CopyDone for ``COPY ... TO
        STDOUT``: pg text format by default (tab-separated, ``\\N``
        NULLs, backslash escapes) or ``(FORMAT CSV [, HEADER])`` —
        exactly the two formats psql emits for \\copy. Rows stream one
        CopyData per line; nothing is buffered server-side."""
        fmt, header = "text", False
        for tok in (m.group("opts") or "").split(","):
            t = " ".join(tok.upper().split())
            if not t:
                continue
            if t.startswith("FORMAT"):
                f = t.split()[-1]
                if f not in ("TEXT", "CSV"):
                    raise _WireError(
                        "0A000", f"COPY format {f} is not supported"
                    )
                fmt = f.lower()
            elif t in ("HEADER", "HEADER TRUE", "HEADER ON"):
                header = True
            elif t in ("HEADER FALSE", "HEADER OFF"):
                header = False
            else:
                raise _WireError("0A000", f"unsupported COPY option: {tok.strip()}")
        if header and fmt != "csv":
            raise _WireError("42601", "COPY HEADER requires CSV format")
        sql = m.group("q") or (
            f"SELECT * FROM {self._dequote_table(m.group('t'))}"
        )
        rs = self._run(sql)
        if rs.columns is None:
            raise _WireError("42601", "COPY requires a row-returning query")
        ncols = len(rs.columns)
        self._send(
            _msg(
                b"H",
                struct.pack("!bh", 0, ncols)
                + struct.pack(f"!{ncols}h", *([0] * ncols)),
            )
        )
        n = 0
        if header:
            self._send(_msg(b"d", self._copy_csv_line(rs.columns)))
        encode = (
            self._copy_csv_row if fmt == "csv" else self._copy_text_row
        )
        for row in rs.rows:
            self._send(_msg(b"d", encode(row)))
            n += 1
        self._send(_msg(b"c"))  # CopyDone
        self._send(_msg(b"C", _cstr(f"COPY {n}")))

    # COPY t [(cols)] FROM STDIN — the bulk-LOAD half of the pg COPY
    # protocol (what psql's \copy <table> from <file> speaks).
    _COPY_IN_RE = re.compile(
        r'^\s*COPY\s+(?P<t>(?:"[^"]+"|\w+)(?:\s*\.\s*(?:"[^"]+"|\w+))?)'
        r"\s*(?:\(\s*(?P<cols>[\w\s,]+?)\s*\)\s*)?"
        r"FROM\s+STDIN"
        r"(?:\s+(?:WITH\s+)?\(\s*(?P<opts>[^)]*)\))?\s*$",
        re.I | re.S,
    )

    def _copy_in(self, m) -> None:
        """CopyInResponse / CopyData* / CopyDone for ``COPY t FROM
        STDIN``: pg TEXT format (tab-separated, ``\\N`` NULLs,
        backslash escapes — decoded exactly) or ``(FORMAT CSV
        [, HEADER])``. Incoming bytes SPOOL to a temp file (a client
        may stream gigabytes; nothing accumulates in RAM), rows parse
        into string-typed Arrow batches written to temp parquet, and
        one INSERT INTO casts them to the table's column types through
        the engine — so manifest tables get their atomic commit.

        CSV nullness follows pg: an UNQUOTED empty field loads as
        NULL, a QUOTED empty string as '' — so the server's own CSV
        export re-imports losslessly, same as TEXT.
        A mid-stream CopyFail, or a parse/insert failure, drains the
        copy sub-protocol and reports the error honestly."""
        fmt, header = "text", False
        for tok in (m.group("opts") or "").split(","):
            t = " ".join(tok.upper().split())
            if not t:
                continue
            if t.startswith("FORMAT"):
                f = t.split()[-1]
                if f not in ("TEXT", "CSV"):
                    raise _WireError(
                        "0A000", f"COPY format {f} is not supported"
                    )
                fmt = f.lower()
            elif t in ("HEADER", "HEADER TRUE", "HEADER ON"):
                header = True
            elif t in ("HEADER FALSE", "HEADER OFF"):
                header = False
            else:
                raise _WireError(
                    "0A000", f"unsupported COPY option: {tok.strip()}"
                )
        if header and fmt != "csv":
            raise _WireError("42601", "COPY HEADER requires CSV format")
        # quoted / public-qualified spellings fold exactly like INSERT
        table = self._dequote_table(m.group("t"))
        engine = self.server.engine
        tdf = self._resolve_copy_target(table)  # raises before CopyIn
        tcols = tdf.columns
        if m.group("cols"):
            cols = [c.strip() for c in m.group("cols").split(",")]
            missing = [c for c in cols if c not in tcols]
            if missing:
                raise _WireError(
                    "42703", f"column(s) {missing} not in {table}"
                )
        else:
            cols = tcols
        ncols = len(cols)
        self._send(
            _msg(
                b"G",
                struct.pack("!bh", 0, ncols)
                + struct.pack(f"!{ncols}h", *([0] * ncols)),
            )
        )
        import tempfile

        spool = tempfile.NamedTemporaryFile(
            prefix="sclera_copyin_", suffix=".bin", delete=False
        )
        failed = None
        try:
            while True:
                head = self.buf.read(1)
                if not head:
                    raise ConnectionError("client closed mid-COPY")
                (length,) = struct.unpack("!i", self._read_exact(4))
                payload = self._read_exact(length - 4)
                if head == b"d":
                    if failed is None:
                        spool.write(payload)
                elif head == b"c":  # CopyDone
                    break
                elif head == b"f":  # CopyFail
                    failed = payload[:-1].decode("utf-8", "replace")
                    break
                elif head in (b"S", b"H"):
                    continue  # Sync/Flush mid-copy: ignore
                else:
                    raise _WireError(
                        "08P01",
                        f"unexpected message {head!r} during COPY IN",
                    )
            spool.close()
            if failed is not None:
                raise _WireError(
                    "57014", f"COPY from stdin failed: {failed}"
                )
            n = self._copy_insert(engine, table, cols, spool.name, fmt, header)
            self._send(_msg(b"C", _cstr(f"COPY {n}")))
        finally:
            import os as _os

            try:
                spool.close()
            except Exception:
                pass
            try:
                _os.unlink(spool.name)
            except OSError:
                pass

    def _resolve_copy_target(self, table: str):
        """The COPY target's schema frame, transaction-aware (late
        r12): a table CREATED in the open transaction resolves through
        its unregistered manifest (COPY into it then routes via
        _txn_buffer to the direct-commit path), and a table with a
        deferred DROP reads as gone — the ordinary catalog answers
        everything else."""
        engine = self.server.engine
        txn = getattr(self, "_txn", None)
        if txn is not None:
            created = txn.get("created")
            if created and created["name"] == table.lower():
                from sclera_spark.sources.manifest import ManifestTable

                return ManifestTable(created["path"]).read(engine.spark)
            if txn.get("dropped") == table.lower():
                raise _WireError(
                    "42P01",
                    f"relation {table!r} does not exist (dropped in "
                    "the current transaction)",
                )
        return engine.table(table)

    def _copy_insert(self, engine, table, cols, spool_path, fmt, header) -> int:
        """Parse the spooled COPY payload and INSERT it: string-typed
        Arrow batches -> temp parquet -> one INSERT INTO ... SELECT with
        casts to the table's types (missing columns NULL). Batched, so
        driver memory is one batch, not the whole load. Inside an open
        transaction the INSERT routes through the txn buffer (staged,
        published at COMMIT) instead of committing here."""
        import os as _os
        import shutil as _shutil
        import tempfile as _tempfile

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        from sclera_spark.interfaces.copydata import iter_copy_rows

        schema = _pa.schema([(c, _pa.string()) for c in cols])
        pdir = _tempfile.mkdtemp(prefix="sclera_copyin_pq_")
        total = 0
        try:
            writer = _pq.ParquetWriter(
                _os.path.join(pdir, "part-0.parquet"), schema
            )
            batch: list[list] = []
            try:
                for row in iter_copy_rows(spool_path, fmt, header):
                    if len(row) != len(cols):
                        raise _WireError(
                            "22P04",
                            f"COPY row has {len(row)} fields, "
                            f"expected {len(cols)}",
                        )
                    batch.append(row)
                    if len(batch) >= 65536:
                        writer.write_table(
                            _pa.Table.from_arrays(
                                [
                                    _pa.array(
                                        [r[i] for r in batch],
                                        type=_pa.string(),
                                    )
                                    for i in range(len(cols))
                                ],
                                schema=schema,
                            )
                        )
                        total += len(batch)
                        batch = []
                if batch:
                    writer.write_table(
                        _pa.Table.from_arrays(
                            [
                                _pa.array(
                                    [r[i] for r in batch],
                                    type=_pa.string(),
                                )
                                for i in range(len(cols))
                            ],
                            schema=schema,
                        )
                    )
                    total += len(batch)
            finally:
                writer.close()
            if total == 0:
                return 0
            spark = engine.spark
            view = f"_copy_in_{_os.getpid()}_{id(engine) & 0xFFFF}"
            spark.read.parquet(pdir).createOrReplaceTempView(view)
            try:
                tdf = self._resolve_copy_target(table)
                sel = []
                for f in tdf.schema.fields:
                    if f.name in cols:
                        sel.append(
                            f"CAST({f.name} AS {f.dataType.simpleString()})"
                            f" AS {f.name}"
                        )
                    else:
                        sel.append(
                            f"CAST(NULL AS {f.dataType.simpleString()})"
                            f" AS {f.name}"
                        )
                sql_ins = (
                    f"INSERT INTO {table} SELECT {', '.join(sel)} "
                    f"FROM {view}"
                )
                txn = getattr(self, "_txn", None)
                if txn is not None:
                    self._txn_buffer(txn, "INSERT", sql_ins)
                else:
                    engine.execute(sql_ins)
            finally:
                spark.catalog.dropTempView(view)
            return total
        finally:
            _shutil.rmtree(pdir, ignore_errors=True)

    @staticmethod
    def _copy_text_row(row) -> bytes:
        out = []
        for v in row:
            tv = _text_value(v)
            if tv is None:
                out.append(b"\\N")
            else:
                out.append(
                    tv.replace(b"\\", b"\\\\")
                    .replace(b"\t", b"\\t")
                    .replace(b"\n", b"\\n")
                    .replace(b"\r", b"\\r")
                )
        return b"\t".join(out) + b"\n"

    @classmethod
    def _copy_csv_row(cls, row) -> bytes:
        cells = []
        for v in row:
            tv = _text_value(v)
            if tv is None:
                cells.append(None)  # NULL: nothing, unquoted
            else:
                cells.append(tv.decode("utf-8", "replace"))
        return cls._copy_csv_line(cells)

    @staticmethod
    def _copy_csv_line(cells) -> bytes:
        out = []
        for c in cells:
            if c is None:
                out.append("")
            elif c == "" or any(ch in c for ch in (",", '"', "\n", "\r")):
                out.append('"' + c.replace('"', '""') + '"')
            else:
                out.append(c)
        return (",".join(out) + "\n").encode("utf-8")

    # ---- extended-query subset ----

    def _parse(self, payload: bytes) -> None:
        name, rest = _take_cstr(payload)
        query, rest = _take_cstr(rest)
        (nparams,) = struct.unpack("!h", rest[:2])
        oids = list(struct.unpack(f"!{nparams}i", rest[2 : 2 + 4 * nparams]))
        self._statements[name] = (query, oids)
        self._send(_msg(b"1"))  # ParseComplete

    def _bind(self, payload: bytes) -> None:
        portal, rest = _take_cstr(payload)
        stmt, rest = _take_cstr(rest)
        (nfmt,) = struct.unpack("!h", rest[:2])
        fmts = struct.unpack(f"!{nfmt}h", rest[2 : 2 + 2 * nfmt])
        rest = rest[2 + 2 * nfmt :]
        (nparams,) = struct.unpack("!h", rest[:2])
        rest = rest[2:]
        if any(f == 1 for f in fmts):
            self._skip_to_sync = True
            self._error("0A000", "binary parameter format is not supported")
            return
        values: list[str | None] = []
        for _ in range(nparams):
            (vlen,) = struct.unpack("!i", rest[:4])
            rest = rest[4:]
            if vlen == -1:
                values.append(None)
            else:
                values.append(rest[:vlen].decode("utf-8"))
                rest = rest[vlen:]
        # RESULT format codes: rows are always sent in text format, so a
        # request for binary results must fail loudly here — silently
        # answering text to a client that asked for (and will parse)
        # binary would corrupt every value (honest-wire rule)
        if len(rest) >= 2:
            (nrfmt,) = struct.unpack("!h", rest[:2])
            rfmts = struct.unpack(f"!{nrfmt}h", rest[2 : 2 + 2 * nrfmt])
            if any(f == 1 for f in rfmts):
                self._skip_to_sync = True
                self._error("0A000", "binary result format is not supported")
                return
        query, oids = self._statements.get(stmt, ("", []))
        self._suspended.pop(portal, None)  # re-Bind destroys the portal
        try:
            self._portals[portal] = _substitute_params(query, values, oids)
        except ValueError as exc:
            self._skip_to_sync = True
            self._error("0A000", str(exc))
            return
        self._send(_msg(b"2"))  # BindComplete

    def _describe(self, payload: bytes) -> None:
        kind, rest = payload[:1], payload[1:]
        name, _ = _take_cstr(rest)
        if kind == b"P":
            sql = self._portals.get(name, "")
        else:
            sql = self._statements.get(name, ("", []))[0]
            if re.search(r"\$\d+", sql):
                self._send(_msg(b"n"))  # can't describe before Bind
                return
        try:
            result = self.server.engine.execute(sql) if sql.strip() else None
        except Exception as exc:  # noqa: BLE001
            self._skip_to_sync = True
            self._error(self._sqlstate_for(exc), str(exc))
            return
        if isinstance(result, DataFrame):
            rs = _ResultSet(
                [f.name for f in result.schema.fields],
                [_spark_type_oid(f.dataType) for f in result.schema.fields],
                None,
                None,
            )
            self._send(self._row_description(rs))
        else:
            self._send(_msg(b"n"))  # NoData

    def _close_portal(self, payload: bytes) -> None:
        """Close('P', name) drops a suspended portal's iterator;
        Close('S', ...) and unknown names are no-ops (CloseComplete is
        sent by the caller either way, per protocol)."""
        if payload[:1] == b"P":
            name, _ = _take_cstr(payload[1:])
            self._suspended.pop(name, None)

    def _execute(self, payload: bytes) -> None:
        """Execute(portal, maxRows). maxRows > 0 caps the DataRows sent
        this round: if the result has more, PortalSuspended ('s') is
        sent and the portal's iterator is kept — the client resumes it
        with another Execute (pgjdbc setFetchSize). maxRows <= 0
        streams everything, as before."""
        portal, rest = _take_cstr(payload)
        max_rows = (
            struct.unpack("!i", rest[:4])[0] if len(rest) >= 4 else 0
        )
        state = self._suspended.pop(portal, None)
        # the timer covers execution AND result streaming (the lazy
        # toLocalIterator triggers most Spark work during row fetch) —
        # on both the fresh and the resumed path
        timer = self._statement_timer()
        try:
            if state is None:
                sql = self._portals.get(portal, "")
                if not sql.strip():
                    self._send(_msg(b"I"))
                    return
                rs = self._run(sql)
                if rs.columns is None or rs.rows is None:
                    # row-less command: maxRows is meaningless
                    self._send(
                        _msg(b"C", _cstr(rs.tag or _tag_for(sql)))
                    )
                    return
                state = {
                    "rs": rs, "sql": sql, "sent": 0, "pending": None,
                }
            self._send_portal_rows(portal, state, max_rows)
        except Exception as exc:  # noqa: BLE001
            self._skip_to_sync = True
            self._error(self._sqlstate_for(exc), str(exc))
        finally:
            if timer is not None:
                timer.cancel()

    def _send_portal_rows(
        self, portal: str, state: dict, max_rows: int
    ) -> None:
        rs = state["rs"]
        sent = 0
        row = state["pending"]
        state["pending"] = None
        it = rs.rows
        while True:
            if row is None:
                row = next(it, None)
                if row is None:
                    break
            out = io.BytesIO()
            out.write(struct.pack("!h", len(row)))
            for v in row:
                tv = _text_value(v)
                if tv is None:
                    out.write(struct.pack("!i", -1))
                else:
                    out.write(struct.pack("!i", len(tv)))
                    out.write(tv)
            self._send(_msg(b"D", out.getvalue()))
            sent += 1
            row = None
            if max_rows > 0 and sent >= max_rows:
                nxt = next(it, None)
                if nxt is not None:
                    state["pending"] = nxt
                    state["sent"] += sent
                    self._suspended[portal] = state
                    self._send(_msg(b"s"))  # PortalSuspended
                    return
                break
        total = state["sent"] + sent
        self._send(
            _msg(b"C", _cstr(rs.tag or _tag_for(state["sql"], total)))
        )


# pg type oids that may splice as raw (unquoted) SQL tokens
_NUMERIC_OIDS = {20, 21, 23, 26, 700, 701, 1700}
_BOOL_OID = 16
_NUMERIC_RE = re.compile(r"-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def _substitute_params(sql: str, values: list[str | None], oids: list[int]) -> str:
    """Inline text-format parameter values as SQL literals ($N -> value).
    Values are escaped ('' doubling); only declared-numeric (or
    numeric-shaped, when undeclared) values splice unquoted. Known
    limitation, documented: a literal `$N` inside a string constant in
    the statement text would also be replaced."""
    for i in range(len(values), 0, -1):
        v = values[i - 1]
        oid = oids[i - 1] if i - 1 < len(oids) else 0
        if v is None:
            lit = "NULL"
        elif oid == _BOOL_OID:
            lit = "TRUE" if v.lower() in ("t", "true", "1") else "FALSE"
        elif oid in _NUMERIC_OIDS or (oid == 0 and _NUMERIC_RE.match(v)):
            if not _NUMERIC_RE.match(v):
                raise ValueError(f"malformed numeric parameter ${i}: {v!r}")
            lit = v
        else:
            lit = "'" + v.replace("'", "''") + "'"
        sql = sql.replace(f"${i}", lit)
    if re.search(r"\$\d+", sql):
        raise ValueError("unbound statement parameters remain")
    return sql


def _take_cstr(b: bytes) -> tuple[str, bytes]:
    i = b.index(b"\x00")
    return b[:i].decode("utf-8", "replace"), b[i + 1 :]


def _split_statements(text: str) -> list[str]:
    """Split on semicolons outside single/double quotes."""
    out, cur, i, n = [], [], 0, len(text)
    while i < n:
        c = text[i]
        if c in ("'", '"'):
            q = c
            cur.append(c)
            i += 1
            while i < n:
                cur.append(text[i])
                if text[i] == q:
                    if q == "'" and i + 1 < n and text[i + 1] == "'":
                        cur.append(text[i + 1])
                        i += 2
                        continue
                    break
                i += 1
        elif c == ";":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        out.append("".join(cur))
    return out


class _CancelTarget:
    """What a CancelRequest resolves to: the victim session's Spark job
    group plus the explicit cancellation flag that lets the session
    report sqlstate 57014 only for REAL cancellations."""

    __slots__ = ("group", "flag")

    def __init__(self, group: str):
        self.group = group
        self.flag = threading.Event()


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    ssl_context = None  # set by ScleraServer.start when TLS configured
    credentials = None  # user -> ScramCredential; None = trust auth
    require_tls = False

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # per-server secret for DETERMINISTIC mock-SCRAM credentials:
        # unknown usernames get a stable (per username, per server)
        # salt, so user existence is not probeable via salt churn
        import os as _os

        self.mock_auth_secret = _os.urandom(32)
        # (pid, secret) -> the session's cancel target (job group + the
        # explicit was-cancelled flag its error path reads)
        self.cancel_registry: dict[tuple[int, int], _CancelTarget] = {}
        self._pid_counter = 0
        self._pid_lock = threading.Lock()

    def register_cancel(self) -> tuple[int, int]:
        import secrets

        with self._pid_lock:
            self._pid_counter += 1
            pid = self._pid_counter
        secret = secrets.randbits(31)
        self.cancel_registry[(pid, secret)] = _CancelTarget(f"sclera-wire-{pid}")
        return (pid, secret)


class ScleraServer:
    """Serve a ScleraEngine over the PostgreSQL wire protocol.

    >>> server = ScleraServer(engine).start()
    >>> ... clients connect to ("127.0.0.1", server.port) ...
    >>> server.stop()

    Security knobs (r7 — default stays reference-parity trust/cleartext
    for embedded/test use):

    - ``tls``: ``(certfile, keyfile)`` PEM paths, or ``"auto"`` to
      generate a self-signed cert (interfaces/auth.py
      make_self_signed_cert). Enables real TLS on the protocol's
      SSLRequest; with TLS on, CLEARTEXT startup is refused (28000)
      unless ``require_tls=False``.
    - ``auth``: ``{user: password}``; passwords are immediately turned
      into SCRAM-SHA-256 verifiers (salt/iterations/StoredKey/ServerKey
      — the pg_authid shape; plaintext is not retained) and every
      connection must complete the RFC 5802/7677 exchange.
    """

    def __init__(
        self,
        engine,
        host: str = "127.0.0.1",
        port: int = 0,
        tls: tuple[str, str] | str | None = None,
        auth: dict[str, str] | None = None,
        require_tls: bool | None = None,
    ):
        self.engine = engine
        self.host = host
        self.port = port
        self.tls = tls
        self.auth = auth
        self.require_tls = require_tls
        self._server: _Server | None = None
        self._thread: threading.Thread | None = None

    def _build_ssl_context(self):
        if self.tls is None:
            return None
        import ssl
        import tempfile

        if self.tls == "auto":
            from sclera_spark.interfaces.auth import make_self_signed_cert

            certfile, keyfile = make_self_signed_cert(
                tempfile.mkdtemp(prefix="sclera_tls_")
            )
        else:
            certfile, keyfile = self.tls
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(certfile, keyfile)
        return ctx

    def start(self) -> "ScleraServer":
        self._server = _Server((self.host, self.port), _Handler)
        self._server.engine = self.engine
        self._server.ssl_context = self._build_ssl_context()
        self._server.require_tls = (
            self.require_tls
            if self.require_tls is not None
            else self._server.ssl_context is not None
        )
        if self.auth is not None:
            from sclera_spark.interfaces.auth import ScramCredential

            self._server.credentials = {
                u: ScramCredential.from_password(p) for u, p in self.auth.items()
            }
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="sclera-pg-server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


# ---------------------------------------------------------------- client
#
# A minimal wire-protocol client so the serving tier is testable in this
# container (which ships no psycopg/pg8000). Any real PostgreSQL client
# works the same way; this one implements exactly the frontend half of the
# public protocol the server implements above.


class WireClient:
    def __init__(
        self,
        host: str,
        port: int,
        user: str = "sclera",
        database: str = "sclera",
        tls: bool = False,
        password: str | None = None,
    ):
        self.sock = socket.create_connection((host, port))
        if tls:
            import ssl

            self.sock.sendall(struct.pack("!ii", 8, _SSL_REQUEST))
            resp = self.sock.recv(1)
            if resp != b"S":
                raise ConnectionError(f"server refused TLS (got {resp!r})")
            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
            ctx.check_hostname = False  # self-signed server certs in tests
            ctx.verify_mode = ssl.CERT_NONE
            self.sock = ctx.wrap_socket(self.sock, server_hostname=host)
        self.buf = self.sock.makefile("rb")
        self._password = password
        params = _cstr("user") + _cstr(user) + _cstr("database") + _cstr(database) + b"\x00"
        payload = struct.pack("!i", _PROTO_V3) + params
        self.sock.sendall(struct.pack("!i", len(payload) + 4) + payload)
        self.parameters: dict[str, str] = {}
        self._drain_until_ready()

    def _scram_auth(self) -> None:
        """Client half of SCRAM-SHA-256 (RFC 5802/7677) — the mirror of
        interfaces/auth.py's server exchange, built from the same stdlib
        primitives. Verifies the server's v= signature (mutual auth)."""
        import base64
        import hashlib
        import hmac as hm
        import secrets as _secrets

        if self._password is None:
            raise RuntimeError("server requires a password (SCRAM-SHA-256)")
        cnonce = _secrets.token_urlsafe(18)
        cfirst_bare = f"n=,r={cnonce}"
        init = ("n,," + cfirst_bare).encode()
        self.sock.sendall(
            _msg(b"p", _cstr("SCRAM-SHA-256") + struct.pack("!i", len(init)) + init)
        )
        head, payload = self._read_message()
        if head == b"E":
            raise RuntimeError(_parse_error(payload))
        (code,) = struct.unpack("!i", payload[:4])
        if head != b"R" or code != 11:
            raise ConnectionError("expected SASLContinue")
        sfirst = payload[4:].decode()
        attrs = dict(p.split("=", 1) for p in sfirst.split(","))
        if not attrs["r"].startswith(cnonce):
            raise ConnectionError("server nonce does not extend client nonce")
        salted = hashlib.pbkdf2_hmac(
            "sha256",
            self._password.encode(),
            base64.b64decode(attrs["s"]),
            int(attrs["i"]),
        )
        ckey = hm.new(salted, b"Client Key", hashlib.sha256).digest()
        cfinal_bare = f"c=biws,r={attrs['r']}"
        auth_msg = f"{cfirst_bare},{sfirst},{cfinal_bare}".encode()
        csig = hm.new(
            hashlib.sha256(ckey).digest(), auth_msg, hashlib.sha256
        ).digest()
        proof = bytes(a ^ b for a, b in zip(ckey, csig))
        final = (cfinal_bare + ",p=" + base64.b64encode(proof).decode()).encode()
        self.sock.sendall(_msg(b"p", final))
        head, payload = self._read_message()
        if head == b"E":
            raise RuntimeError(_parse_error(payload))
        (code,) = struct.unpack("!i", payload[:4])
        if head != b"R" or code != 12:
            raise ConnectionError("expected SASLFinal")
        skey = hm.new(salted, b"Server Key", hashlib.sha256).digest()
        want = b"v=" + base64.b64encode(
            hm.new(skey, auth_msg, hashlib.sha256).digest()
        )
        if payload[4:] != want:
            raise ConnectionError("server signature verification failed")

    def _read_message(self) -> tuple[bytes, bytes]:
        head = self.buf.read(1)
        if not head:
            raise ConnectionError("server closed")
        (length,) = struct.unpack("!i", self.buf.read(4))
        return head, self.buf.read(length - 4)

    def _drain_until_ready(self) -> None:
        while True:
            head, payload = self._read_message()
            if head == b"R":
                (code,) = struct.unpack("!i", payload[:4])
                if code == 10:  # AuthenticationSASL: run SCRAM
                    if b"SCRAM-SHA-256" not in payload[4:]:
                        raise ConnectionError("no shared SASL mechanism")
                    self._scram_auth()
                # 0 = AuthenticationOk: nothing to do
            elif head == b"S":
                k, rest = _take_cstr(payload)
                v, _ = _take_cstr(rest)
                self.parameters[k] = v
            elif head == b"E":
                raise RuntimeError(_parse_error(payload))
            elif head == b"Z":
                return

    def execute(self, sql: str) -> tuple[list[str], list[tuple], str]:
        """Simple-query protocol: returns (columns, text rows, command tag)."""
        payload = _cstr(sql)
        self.sock.sendall(_msg(b"Q", payload))
        columns: list[str] = []
        rows: list[tuple] = []
        tag = ""
        error: str | None = None
        while True:
            head, payload = self._read_message()
            if head == b"T":
                columns = _parse_row_description(payload)
            elif head == b"D":
                rows.append(_parse_data_row(payload))
            elif head == b"C":
                tag, _ = _take_cstr(payload)
            elif head == b"E":
                error = _parse_error(payload)
            elif head == b"I":
                tag = ""
            elif head == b"Z":
                if error is not None:
                    raise RuntimeError(error)
                return columns, rows, tag

    def execute_extended(
        self, sql: str, params: tuple = ()
    ) -> tuple[list[str], list[tuple], str]:
        """Extended-query protocol round trip (Parse/Bind/Describe/Execute/
        Sync) — the message sequence the PostgreSQL JDBC driver emits for a
        prepared statement. ``params`` bind $1..$N in text format (None,
        str, int, float, bool)."""
        bind = io.BytesIO()
        bind.write(_cstr("") + _cstr("") + struct.pack("!h", 0))
        bind.write(struct.pack("!h", len(params)))
        for p in params:
            if p is None:
                bind.write(struct.pack("!i", -1))
            else:
                if isinstance(p, bool):
                    tv = b"t" if p else b"f"
                else:
                    tv = str(p).encode("utf-8")
                bind.write(struct.pack("!i", len(tv)) + tv)
        bind.write(struct.pack("!h", 0))
        self.sock.sendall(
            _msg(b"P", _cstr("") + _cstr(sql) + struct.pack("!h", 0))
            + _msg(b"B", bind.getvalue())
            + _msg(b"D", b"P" + _cstr(""))
            + _msg(b"E", _cstr("") + struct.pack("!i", 0))
            + _msg(b"S")
        )
        columns: list[str] = []
        rows: list[tuple] = []
        tag = ""
        error: str | None = None
        while True:
            head, payload = self._read_message()
            if head == b"T":
                columns = _parse_row_description(payload)
            elif head == b"D":
                rows.append(_parse_data_row(payload))
            elif head == b"C":
                tag, _ = _take_cstr(payload)
            elif head == b"E":
                error = _parse_error(payload)
            elif head == b"Z":
                if error is not None:
                    raise RuntimeError(error)
                return columns, rows, tag

    def execute_fetch(
        self, sql: str, fetch: int, params: tuple = ()
    ) -> tuple[list[str], list[list[tuple]], str]:
        """Extended protocol with Execute(maxRows) — the message cycle
        a JDBC driver emits under setFetchSize: Parse/Bind/Describe,
        then repeated Execute(fetch) rounds, each answered with up to
        ``fetch`` DataRows and PortalSuspended until the final round's
        CommandComplete. Returns (columns, batches, tag) with one
        row-list per Execute round."""
        bind = io.BytesIO()
        bind.write(_cstr("") + _cstr("") + struct.pack("!h", 0))
        bind.write(struct.pack("!h", len(params)))
        for p in params:
            if p is None:
                bind.write(struct.pack("!i", -1))
            else:
                tv = str(p).encode("utf-8")
                bind.write(struct.pack("!i", len(tv)) + tv)
        bind.write(struct.pack("!h", 0))
        self.sock.sendall(
            _msg(b"P", _cstr("") + _cstr(sql) + struct.pack("!h", 0))
            + _msg(b"B", bind.getvalue())
            + _msg(b"D", b"P" + _cstr(""))
            + _msg(b"E", _cstr("") + struct.pack("!i", fetch))
        )
        columns: list[str] = []
        batches: list[list[tuple]] = []
        cur: list[tuple] = []
        tag = ""
        error: str | None = None
        while True:
            head, payload = self._read_message()
            if head == b"T":
                columns = _parse_row_description(payload)
            elif head == b"D":
                cur.append(_parse_data_row(payload))
            elif head == b"s":  # PortalSuspended: ask for the next batch
                batches.append(cur)
                cur = []
                self.sock.sendall(
                    _msg(b"E", _cstr("") + struct.pack("!i", fetch))
                )
            elif head == b"C":
                tag, _ = _take_cstr(payload)
                batches.append(cur)
                cur = []
                self.sock.sendall(_msg(b"S"))
            elif head == b"E":
                error = _parse_error(payload)
                self.sock.sendall(_msg(b"S"))
            elif head == b"Z":
                if error is not None:
                    raise RuntimeError(error)
                return columns, batches, tag

    def close(self) -> None:
        try:
            self.sock.sendall(_msg(b"X"))
        except OSError:
            pass
        self.sock.close()


def _parse_row_description(payload: bytes) -> list[str]:
    (nfields,) = struct.unpack("!h", payload[:2])
    rest = payload[2:]
    names = []
    for _ in range(nfields):
        name, rest = _take_cstr(rest)
        rest = rest[18:]  # table oid, attnum, type oid, typlen, typmod, fmt
        names.append(name)
    return names


def _parse_data_row(payload: bytes) -> tuple:
    (nfields,) = struct.unpack("!h", payload[:2])
    rest = payload[2:]
    row = []
    for _ in range(nfields):
        (length,) = struct.unpack("!i", rest[:4])
        rest = rest[4:]
        if length == -1:
            row.append(None)
        else:
            row.append(rest[:length].decode("utf-8"))
            rest = rest[length:]
    return tuple(row)


def _parse_error(payload: bytes) -> str:
    fields = {}
    rest = payload
    while rest and rest[:1] != b"\x00":
        code = rest[:1]
        value, rest = _take_cstr(rest[1:])
        fields[code] = value
    state = fields.get(b"C")
    msg = fields.get(b"M", "unknown server error")
    return f"[{state}] {msg}" if state else msg
