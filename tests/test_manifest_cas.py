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
    MemoryCas,
)


@pytest.fixture()
def cas_env(spark, tmp_path):
    cas = MemoryCas()
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
