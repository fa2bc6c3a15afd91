"""Manifest-committed tables (sources/manifest.py): atomic DML, snapshot
isolation, time travel, vacuum. The property under test throughout: a
reader resolves ONE pointer and sees a complete snapshot — a crash at any
step of a commit leaves either the old or the new version visible, never
duplicates and never a partial state (the two flaws of plain-parquet COW
that VERDICT r4 marked the DML tier weak for)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from sclera_spark.engine import ScleraEngine
from sclera_spark.sources.manifest import ManifestTable


@pytest.fixture()
def engine(spark, tables):
    return ScleraEngine(spark)


@pytest.fixture()
def mtab(engine):
    engine.execute("""
        CREATE TABLE m_orders AS
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    """)
    engine.execute("ALTER TABLE m_orders SET FORMAT MANIFEST")
    yield "m_orders"
    engine.execute("DROP TABLE m_orders")


def _mt(engine, name) -> ManifestTable:
    return ManifestTable(engine._ddl._path(name))


def test_convert_preserves_rows(engine, mtab):
    base = engine.table("orders").count()
    assert engine.table(mtab).count() == base
    mt = _mt(engine, mtab)
    assert mt.version() == 1
    # reads resolve via the manifest file list, not directory listing
    assert all(os.sep + "data" + os.sep in p for p in mt.files())


def test_dml_cow_commits_are_versioned(engine, mtab):
    mt = _mt(engine, mtab)
    n0 = engine.table(mtab).count()
    engine.execute("UPDATE m_orders SET o_totalprice = 0 WHERE o_orderkey = 1")
    assert mt.version() == 2
    assert engine.table(mtab).filter("o_orderkey = 1").first().o_totalprice == 0
    assert engine.table(mtab).count() == n0

    engine.execute("DELETE FROM m_orders WHERE o_orderkey = 1")
    assert mt.version() == 3
    assert engine.table(mtab).filter("o_orderkey = 1").count() == 0

    engine.execute("INSERT INTO m_orders VALUES (9999999, 1, 42.0)")
    assert mt.version() == 4
    assert engine.table(mtab).filter("o_orderkey = 9999999").count() == 1


def test_manifest_cow_dml_touches_only_matching_files(engine):
    """Manifest-table variant of test_ddl.test_cow_dml_touches_only
    _matching_files: a keyed UPDATE on a range-clustered manifest table
    replaces ONLY the data file containing the key — the other files
    survive byte-for-byte (same inode, same mtime) — and the
    stats-pre-narrowing path (filter_ranges -> files_pruned) actually
    narrows the probe instead of silently falling back to a full-table
    rewrite (the r8 ADVICE regression: filter_ranges didn't exist and a
    broad except hid the ImportError)."""
    from sclera_spark.sources.prune import filter_ranges

    engine.execute(
        "CREATE TABLE cow_m AS "
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    )
    try:
        df = engine.table("cow_m").repartitionByRange(4, "o_orderkey")
        engine._ddl._rewrite("cow_m", df)
        engine.execute("ALTER TABLE cow_m SET FORMAT MANIFEST")
        mt = _mt(engine, "cow_m")
        before = {p: os.path.getmtime(p) for p in mt.files()}
        assert len(before) == 4
        lo = engine.sql("SELECT min(o_orderkey) AS k FROM cow_m").first().k
        n0 = engine.table("cow_m").count()

        # the pre-narrowing pieces work end-to-end on the probe shape:
        # bounds come out of the probe plan, stats keep ONE candidate
        probe = mt.read(engine.spark).filter(f"o_orderkey = {lo}")
        ranges = filter_ranges(probe)
        assert ranges == {"o_orderkey": (lo, lo)}
        assert len(mt.files_pruned(ranges)) == 1

        engine.execute(
            f"UPDATE cow_m SET o_totalprice = -1.0 WHERE o_orderkey = {lo}"
        )
        after = {p: os.path.getmtime(p) for p in mt.files()}
        survivors = set(before) & set(after)
        assert len(survivors) == 3  # three range files untouched
        assert all(before[p] == after[p] for p in survivors)
        assert len(set(after) - set(before)) >= 1  # replacement committed
        assert engine.table("cow_m").count() == n0
        got = engine.sql(
            f"SELECT o_totalprice FROM cow_m WHERE o_orderkey = {lo}"
        ).collect()
        assert got and all(r.o_totalprice == -1.0 for r in got)

        # keyed no-op outside every file's range: stats prove no file
        # can match, so the DML commits NOTHING (no new version)
        v = mt.version()
        hi = engine.sql("SELECT max(o_orderkey) AS k FROM cow_m").first().k
        engine.execute(
            f"DELETE FROM cow_m WHERE o_orderkey = {hi + 1000000}"
        )
        assert mt.version() == v
        assert engine.table("cow_m").count() == n0
    finally:
        engine.execute("DROP TABLE cow_m")


def test_time_travel_reads_old_snapshot(engine, mtab):
    v1_count = engine.table(mtab).count()
    engine.execute("DELETE FROM m_orders WHERE o_totalprice > 0")
    assert engine.table(mtab).count() < v1_count
    old = engine._ddl.table_at(mtab, 1)
    assert old.count() == v1_count


def test_crash_before_pointer_swap_is_invisible(engine, mtab, monkeypatch):
    """Kill the commit right before the atomic pointer swap: the staged
    files and the new manifest exist on disk, but a reader still sees the
    OLD snapshot exactly — no duplicates, no partial state."""
    mt = _mt(engine, mtab)
    before = sorted(
        r.o_orderkey for r in engine.table(mtab).select("o_orderkey").collect()
    )
    real_replace = os.replace

    def crash(src, dst):
        if os.path.basename(dst) == "LATEST":
            raise RuntimeError("injected crash before pointer swap")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crash)
    with pytest.raises(Exception):
        engine.execute("DELETE FROM m_orders WHERE o_orderkey % 2 = 0")
    monkeypatch.undo()

    # pointer unchanged -> old complete snapshot, bit for bit
    assert mt.version() == 1
    after = sorted(
        r.o_orderkey for r in engine.table(mtab).select("o_orderkey").collect()
    )
    assert after == before
    # the interrupted commit left only invisible garbage; a retry succeeds
    engine.execute("DELETE FROM m_orders WHERE o_orderkey % 2 = 0")
    assert mt.version() == 2
    assert engine.table(mtab).filter("o_orderkey % 2 = 0").count() == 0


def test_no_duplicate_window_and_retention(engine, mtab):
    """The plain-parquet COW crash window (new file published, old not yet
    deleted -> duplicates) does not exist here: the pointer swap IS the
    last step of a commit, and replaced files — though still on disk for
    time travel — are invisible to the live snapshot."""
    mt = _mt(engine, mtab)
    n0 = engine.table(mtab).count()
    engine.execute("UPDATE m_orders SET o_totalprice = -1 WHERE o_orderkey = 2")
    assert mt.version() == 2
    # no duplicates in the live snapshot, despite old files still on disk
    assert engine.table(mtab).count() == n0
    assert engine.table(mtab).filter("o_orderkey = 2").first().o_totalprice == -1
    on_disk = set(os.listdir(mt.data_dir))
    assert on_disk > {os.path.basename(p) for p in mt.files()}
    # vacuum does the physical deletion on the retention schedule
    deleted = mt.vacuum(keep_versions=1)
    assert deleted
    assert set(os.listdir(mt.data_dir)) == {
        os.path.basename(p) for p in mt.files()
    }
    assert engine.table(mtab).count() == n0


def test_vacuum_respects_retained_versions(engine, mtab):
    mt = _mt(engine, mtab)
    engine.execute("DELETE FROM m_orders WHERE o_orderkey = 3")
    engine.execute("DELETE FROM m_orders WHERE o_orderkey = 5")
    assert mt.versions() == [1, 2, 3]
    mt.vacuum(keep_versions=2)
    assert mt.versions() == [2, 3]
    # both retained versions stay readable
    assert engine._ddl.table_at(mtab, 2).count() == mt.read(engine.spark, 3).count() + 1


def test_full_rewrite_path_is_versioned_too(engine, mtab):
    mt = _mt(engine, mtab)
    # WHERE-less UPDATE takes the full-rewrite path, still one commit
    engine.execute("UPDATE m_orders SET o_totalprice = 1.0")
    assert mt.version() == 2
    assert (
        engine.table(mtab).agg(F.max("o_totalprice")).first()[0] == 1.0
    )


def test_vacuum_and_versions_sql_surface(engine, mtab):
    engine.execute("DELETE FROM m_orders WHERE o_orderkey = 7")
    engine.execute("DELETE FROM m_orders WHERE o_orderkey = 9")
    assert engine.execute("SHOW VERSIONS m_orders") == [1, 2, 3]
    deleted = engine.execute("VACUUM m_orders RETAIN 2 VERSIONS")
    assert engine.execute("SHOW VERSIONS m_orders") == [2, 3]
    engine.execute("VACUUM m_orders")
    assert engine.execute("SHOW VERSIONS m_orders") == [3]
    assert isinstance(deleted, list)
    # non-manifest tables are rejected with a pointed message
    engine.execute("CREATE TABLE plain_t AS SELECT 1 AS x")
    try:
        with pytest.raises(ValueError, match="not a manifest table"):
            engine.execute("VACUUM plain_t")
    finally:
        engine.execute("DROP TABLE plain_t")


def test_concurrent_appends_both_land(engine, mtab):
    """Two writers committing at once: the flock + read-inside-lock
    protocol composes the commits (no lost update) — final count is
    base + both appends, versions advance by exactly 2."""
    import threading

    mt = _mt(engine, mtab)
    n0 = engine.table(mtab).count()
    v0 = mt.version()
    errs = []

    def add(key_base):
        try:
            inc = engine.spark.createDataFrame(
                [(key_base + i, 1, 1.0) for i in range(5)],
                engine.table(mtab).schema,
            )
            ManifestTable(engine._ddl._path(mtab)).append(inc)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=add, args=(b,)) for b in (50_000_000, 60_000_000)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert mt.version() == v0 + 2
    engine._ddl._register_manifest(mtab)
    assert engine.table(mtab).count() == n0 + 10


def _mp_append_worker(path: str, wid: int, k: int):
    """Cross-process writer: stages tiny parquet parts with pyarrow (no
    Spark JVM needed) and drives the real locked read-modify-publish
    commit cycle."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sclera_spark.sources.manifest import ManifestTable

    t = ManifestTable(path)
    for i in range(k):
        scratch = tempfile.mkdtemp(prefix="mp_commit_")
        name = f"part-w{wid}-{i:05d}.parquet"
        pq.write_table(
            pa.table({"x": pa.array([wid * 1000 + i], type=pa.int64())}),
            os.path.join(scratch, name),
        )
        with t._writer_lock():
            t._adopt(scratch, [name])
            t._publish(t.version() + 1, t._file_names() + [name])


def test_cross_process_writers_compose(tmp_path):
    """flock is advisory per-FD — the property that matters is between
    PROCESSES: 4 concurrent writer processes x 5 commits each must
    serialize into 20 consecutive versions with every file referenced
    (no lost updates), and the final snapshot must contain every row."""
    import multiprocessing as mp
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sclera_spark.sources.manifest import ManifestTable

    path = str(tmp_path / "mptab")
    t = ManifestTable(path)
    os.makedirs(t.data_dir)
    os.makedirs(t.log_dir)
    pq.write_table(
        pa.table({"x": pa.array([-1], type=pa.int64())}),
        os.path.join(t.data_dir, "part-seed-00000.parquet"),
    )
    t._publish(1, ["part-seed-00000.parquet"])

    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_mp_append_worker, args=(path, w, 5)) for w in range(4)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
        assert p.exitcode == 0

    t2 = ManifestTable(path)
    assert t2.version() == 21  # 1 seed + 20 serialized commits
    assert len(t2.files()) == 21
    rows = duckdb.sql(
        f"SELECT x FROM read_parquet({[p for p in t2.files()]!r})"
    ).fetchall()
    got = sorted(v for (v,) in rows)
    assert got == sorted(
        [-1] + [w * 1000 + i for w in range(4) for i in range(5)]
    )


# ----------------------------------------------------------- compaction


def _fragment(engine, mtab, n_appends=4):
    """Land several tiny commits so the table accumulates small files."""
    for i in range(n_appends):
        engine.execute(
            f"INSERT INTO m_orders VALUES ({8_000_000 + i}, {i}, {float(i)})"
        )


def test_optimize_compacts_small_files(engine, mtab):
    mt = _mt(engine, mtab)
    _fragment(engine, mtab)
    before_files = mt.files()
    before_version = mt.version()
    rows_before = sorted(
        tuple(r) for r in engine.table(mtab).collect()
    )
    assert len(before_files) >= 4

    replaced = engine.execute("OPTIMIZE m_orders TARGET 64 MB")
    assert replaced, "expected sub-target files to be compacted"
    assert mt.version() == before_version + 1
    after_files = mt.files()
    assert len(after_files) < len(before_files)
    # row set is identical — compaction is metadata-only for readers
    rows_after = sorted(tuple(r) for r in engine.table(mtab).collect())
    assert rows_after == rows_before
    # pre-compaction snapshot stays time-travel readable ...
    old = engine._ddl.table_at(mtab, before_version)
    assert sorted(tuple(r) for r in old.collect()) == rows_before
    # ... until VACUUM physically drops the replaced files
    deleted = engine.execute("VACUUM m_orders")
    assert set(replaced) <= set(deleted)


def test_optimize_converges_to_noop(engine, mtab):
    _fragment(engine, mtab)
    assert engine.execute("OPTIMIZE m_orders TARGET 64 MB")
    # everything now sits in one sub-target file -> nothing to compact
    assert engine.execute("OPTIMIZE m_orders TARGET 64 MB") == []


def test_compact_detects_concurrent_dml(engine, mtab, monkeypatch):
    """A DML that lands between compact()'s file-list snapshot and its
    commit invalidates the swap: the stale compaction must surface the
    retry error, never resurrect pre-DML rows."""
    mt = _mt(engine, mtab)
    _fragment(engine, mtab)

    orig_stage = mt._stage

    def racing_stage(df):
        # an UPDATE rewrites the file holding o_orderkey=1 while the
        # compaction rewrite is still staging
        engine.execute(
            "UPDATE m_orders SET o_totalprice = -1 WHERE o_orderkey = 1"
        )
        return orig_stage(df)

    monkeypatch.setattr(mt, "_stage", racing_stage)
    with pytest.raises(ValueError, match="retry"):
        mt.compact(engine.spark, target_bytes=64 * 1024 * 1024)
    # the DML's effect survives; the table is consistent
    assert (
        engine.table(mtab).filter("o_orderkey = 1").first().o_totalprice == -1
    )


def test_optimize_sort_by_clusters_files(engine, mtab):
    """SORT BY clustering yields range-DISJOINT files on the sort column —
    the precondition for footer min/max file skipping on filtered scans."""
    mt = _mt(engine, mtab)
    _fragment(engine, mtab)
    rows_before = sorted(tuple(r) for r in engine.table(mtab).collect())

    # tiny target forces multiple output files so disjointness is non-vacuous
    replaced = mt.compact(
        engine.spark, target_bytes=16 * 1024, cluster_by=["o_orderkey"]
    )
    assert replaced
    engine._ddl._register_manifest(mtab)
    files = mt.files()
    assert len(files) >= 2
    ranges = []
    for p in files:
        agg = (
            engine.spark.read.parquet(p)
            .selectExpr("min(o_orderkey) AS lo", "max(o_orderkey) AS hi")
            .first()
        )
        ranges.append((agg.lo, agg.hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} / {(lo2, hi2)}"
    rows_after = sorted(tuple(r) for r in engine.table(mtab).collect())
    assert rows_after == rows_before

    # SQL surface parses the SORT BY form
    assert engine.execute("OPTIMIZE m_orders TARGET 64 MB SORT BY (o_custkey)")


def test_version_as_of_sql(engine, mtab):
    """`FROM t VERSION AS OF n` time-travel reads, incl. join position."""
    v1 = engine.table(mtab).count()
    engine.execute("DELETE FROM m_orders WHERE o_totalprice > 1000")
    now = engine.sql("SELECT count(*) AS n FROM m_orders").first().n
    assert now < v1
    old = engine.sql(
        "SELECT count(*) AS n FROM m_orders VERSION AS OF 1"
    ).first().n
    assert old == v1
    # old snapshot joined against the current table
    j = engine.sql(
        "SELECT count(*) AS n FROM m_orders VERSION AS OF 1 o "
        "JOIN m_orders c ON o.o_orderkey = c.o_orderkey"
    ).first().n
    assert j == now
    # the phrase inside a string literal is untouched
    s = engine.sql(
        "SELECT 'm_orders VERSION AS OF 1' AS s"
    ).first().s
    assert s == "m_orders VERSION AS OF 1"


def test_schemed_uri_refused_cleanly():
    """Manifest tables are single-host POSIX by design (the commit point
    is os.replace + flock): an object-store URI must be refused with a
    clear error at construction — not fail obscurely mid-commit."""
    for uri in ("s3a://bucket/tbl", "abfss://c@a.dfs.core.windows.net/t", "gs://b/t"):
        with pytest.raises(ValueError, match="local POSIX path"):
            ManifestTable(uri)


def test_crashed_claim_heals_with_warning(spark, tmp_path):
    """A commit that crashed between claiming its version file and the
    LATEST swap leaves an orphan claim. The next commit (inside the
    flock, so no same-host writer can be live) must HEAL it — loudly,
    via warnings — and proceed, so crash-retry needs no manual step."""
    path = str(tmp_path / "tbl")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    mt = ManifestTable.create(df, path)

    # crashed commit's leftovers: claim written, pointer never swapped
    claim = os.path.join(mt.log_dir, "v2.json")
    fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.write(fd, b'{"version": 2, "files": [], "meta": {}}')
    os.close(fd)
    assert mt.version() == 1  # orphan is invisible

    with pytest.warns(UserWarning, match="already claimed"):
        mt.append(df)
    assert mt.version() == 2
    assert mt.read(spark).count() == 20  # healed claim carries OUR commit


def test_cross_host_live_racer_fails_loudly(spark, tmp_path, monkeypatch):
    """Cross-host shape: a claim that REAPPEARS immediately after healing
    means a live writer outside our flock's reach is racing the table —
    that must raise ConcurrentWriterError, not silently trade lost
    updates. Simulated by re-creating the claim on every removal (what a
    racing writer's O_EXCL would do)."""
    from sclera_spark.sources.manifest import ConcurrentWriterError

    path = str(tmp_path / "tbl")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    mt = ManifestTable.create(df, path)

    claim = os.path.join(mt.log_dir, "v2.json")
    with open(claim, "w") as fh:
        fh.write('{"version": 2, "files": [], "meta": {}}')

    real_remove = os.remove

    def racing_remove(p):
        real_remove(p)
        if os.path.basename(p) == "v2.json":
            with open(p, "w") as fh:  # the other host re-claims instantly
                fh.write('{"version": 2, "files": [], "meta": {}}')

    monkeypatch.setattr(os, "remove", racing_remove)
    with pytest.warns(UserWarning, match="already claimed"):
        with pytest.raises(ConcurrentWriterError, match="re-claimed"):
            mt.append(df)
    monkeypatch.undo()

    # old snapshot intact; recover() clears the foreign claim; retry lands
    assert mt.version() == 1
    assert mt.read(spark).count() == 10
    assert ManifestTable(path).recover() == [2]
    mt.append(df)
    assert mt.version() == 2
    assert mt.read(spark).count() == 20


def test_orphan_claim_never_counts_as_version(spark, tmp_path):
    """A crashed commit's claim file above LATEST must be invisible to
    versions()/vacuum — if vacuum keyed its keep-set off the orphan it
    would delete the LIVE version's data files."""
    path = str(tmp_path / "tbl")
    df = spark.range(5).selectExpr("id")
    mt = ManifestTable.create(df, path)
    mt.append(df)
    assert mt.versions() == [1, 2]
    # orphan claim at v3 referencing nothing
    with open(os.path.join(mt.log_dir, "v3.json"), "w") as fh:
        fh.write('{"version": 3, "files": [], "meta": {}}')
    assert mt.versions() == [1, 2]  # not listed
    deleted = mt.vacuum(keep_versions=1)
    # live v2 files survived; orphan claim cleared
    assert mt.read(spark).count() == 10
    assert not os.path.exists(os.path.join(mt.log_dir, "v3.json"))
    assert mt.version() == 2
    _ = deleted


def test_symlink_manifest_export(engine, mtab, spark):
    """GENERATE SYMLINK MANIFEST FOR t: the exported file lists exactly
    the committed snapshot's data files (Hive symlink_format_manifest
    layout), re-export tracks commits, and an external reader consuming
    the listed URIs sees the same rows as the engine."""
    path = engine.execute(f"GENERATE SYMLINK MANIFEST FOR {mtab}")
    mt = _mt(engine, mtab)
    with open(path) as fh:
        uris = [ln.strip() for ln in fh if ln.strip()]
    assert sorted(uris) == sorted(
        "file://" + os.path.abspath(p) for p in mt.files()
    )
    # an "external engine": read exactly the listed files
    ext = spark.read.parquet(*[u[len("file://"):] for u in uris])
    assert ext.count() == engine.table(mtab).count()

    # snapshot moves -> re-export reflects the new file list
    engine.execute(f"DELETE FROM {mtab} WHERE o_orderkey % 2 = 0")
    path2 = engine.execute(f"GENERATE SYMLINK MANIFEST FOR {mtab}")
    with open(path2) as fh:
        uris2 = [ln.strip() for ln in fh if ln.strip()]
    assert sorted(uris2) == sorted(
        "file://" + os.path.abspath(p) for p in mt.files()
    )
    ext2 = spark.read.parquet(*[u[len("file://"):] for u in uris2])
    assert ext2.count() == engine.table(mtab).count()


# --------------------------------------------- file-level data skipping


def test_commit_records_stats_and_pruned_read(spark, tmp_path):
    """r8 data skipping: every commit records per-file column min/max
    (footer-only), and read(prune=...) drops files whose range provably
    cannot overlap — with identical results to the unpruned read."""
    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v"), path
    )
    mt = ManifestTable(path)
    mt.append(spark.range(100, 200).selectExpr("id AS k", "id * 2 AS v"))
    mt.append(spark.range(200, 300).selectExpr("id AS k", "id * 2 AS v"))
    stats = mt.file_stats()
    assert stats and all("k" in s for s in stats.values())
    # range hitting only the middle commit
    pruned = mt.files_pruned({"k": (120, 180)})
    assert len(pruned) < len(mt.files())
    got = sorted(
        r.k for r in mt.read(spark, prune={"k": (120, 180)})
        .filter("k BETWEEN 120 AND 180").collect()
    )
    assert got == list(range(120, 181))
    # open-ended bounds
    assert len(mt.files_pruned({"k": (250, None)})) < len(mt.files())
    assert mt.files_pruned({"k": (None, None)}) == mt.files()
    # unknown column: nothing pruned (safe)
    assert mt.files_pruned({"nope": (0, 1)}) == mt.files()


def test_stats_inherited_and_sorted_compaction_tightens(spark, tmp_path):
    """Stats are immutable with the file (inherited across commits, so
    a maintenance commit costs no re-reads), and OPTIMIZE SORT BY makes
    ranges tight enough that a narrow probe keeps few files."""
    path = str(tmp_path / "t")
    df = spark.range(0, 4000).selectExpr(
        "cast(hash(id) % 1000 AS long) AS k", "id AS v"
    )
    ManifestTable.create(df.repartition(8), path)
    mt = ManifestTable(path)
    pre = mt.file_stats()
    mt.append(
        spark.range(1).selectExpr("cast(999999 AS long) AS k", "id AS v")
    )
    post = mt.file_stats()
    for name, s in pre.items():
        assert post[name] == s  # inherited, not recomputed
    # unsorted layout: hash-scattered k means a narrow range prunes ~0
    wide = len(mt.files_pruned({"k": (10, 20)}))
    mt.compact(spark, target_bytes=1 << 20, cluster_by=["k"])
    tight = len(mt.files_pruned({"k": (10, 20)}))
    assert tight <= wide
    got = sorted(
        (r.k, r.v)
        for r in mt.read(spark, prune={"k": (10, 20)})
        .filter("k BETWEEN 10 AND 20").collect()
    )
    exp = sorted(
        (r.k, r.v)
        for r in mt.read(spark).filter("k BETWEEN 10 AND 20").collect()
    )
    assert got == exp


def test_pre_stats_manifests_never_pruned(spark, tmp_path):
    """A manifest written WITHOUT stats (older build) keeps all files
    under any prune — absence of stats can only disable skipping."""
    import json as _json
    import os as _os

    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(10).selectExpr("id AS k"), path
    )
    mt = ManifestTable(path)
    v = mt.version()
    mpath = _os.path.join(mt.log_dir, f"v{v}.json")
    with open(mpath) as fh:
        m = _json.load(fh)
    m.pop("stats", None)
    with open(mpath, "w") as fh:
        _json.dump(m, fh)
    assert mt.files_pruned({"k": (99999, None)}) == mt.files()


def test_symlink_manifest_import_roundtrip(engine, mtab, tmp_path):
    """Migration interop, both directions: GENERATE SYMLINK MANIFEST
    from one table, CREATE TABLE ... FROM SYMLINK MANIFEST as another —
    bit-identical scans WITHOUT copying data (hard links), stats
    recorded at import (pruning works), and subsequent DML commits
    atop the imported snapshot never touch the source table."""
    path = engine.execute(f"GENERATE SYMLINK MANIFEST FOR {mtab}")
    src_mt = _mt(engine, mtab)
    src_files = {p: os.path.getmtime(p) for p in src_mt.files()}
    n0 = engine.table(mtab).count()

    engine.execute(f"CREATE TABLE imported FROM SYMLINK MANIFEST '{path}'")
    try:
        imp = _mt(engine, "imported")
        assert imp.version() == 1
        # bit-identical scan, zero data copied (same inodes)
        assert sorted(
            tuple(r) for r in engine.table("imported").collect()
        ) == sorted(tuple(r) for r in engine.table(mtab).collect())
        for p in imp.files():
            assert os.stat(p).st_nlink >= 2  # hard link, not a copy
        # stats were recorded at import: pruning + metadata count work
        assert imp.file_stats() and imp.row_count() == n0
        cnt = engine.sql("SELECT count(*) AS n FROM imported")
        assert cnt.first().n == n0 and cnt.inputFiles() == []

        # DML atop the import: new snapshot, source untouched
        engine.execute("DELETE FROM imported WHERE o_orderkey <= 5")
        assert engine.table("imported").count() < n0
        assert engine.table(mtab).count() == n0
        assert {p: os.path.getmtime(p) for p in src_mt.files()} == src_files

        # re-import under the same name refuses; bad sources are loud
        import pytest as _pytest

        with _pytest.raises(ValueError, match="already exists"):
            engine.execute(
                f"CREATE TABLE imported FROM SYMLINK MANIFEST '{path}'"
            )
        bad = tmp_path / "bad_manifest"
        bad.write_text("s3://bucket/far/away.parquet\n")
        with _pytest.raises(ValueError, match="file://"):
            engine.execute(
                f"CREATE TABLE imp2 FROM SYMLINK MANIFEST '{bad}'"
            )
    finally:
        engine.execute("DROP TABLE imported")


def test_restore_and_clone_sql(engine, mtab, tmp_path):
    """RESTORE TABLE ... TO VERSION and CREATE TABLE ... SHALLOW CLONE
    over the wire-level SQL surface: rollback is a forward commit, the
    clone is an independent zero-copy table, and both compose with the
    catalog (reads rebind immediately)."""
    mt = _mt(engine, mtab)
    n0 = engine.table(mtab).count()
    v0 = mt.version()
    engine.execute(f"DELETE FROM {mtab} WHERE o_orderkey <= 100")
    n1 = engine.table(mtab).count()
    assert n1 < n0

    res = engine.execute(f"RESTORE TABLE {mtab} TO VERSION {v0}")
    assert res[0]["restored_to"] == v0
    assert engine.table(mtab).count() == n0
    hist = engine.execute(f"DESCRIBE HISTORY {mtab}")
    assert hist[0]["op"] == "restore"

    engine.execute(f"CREATE TABLE m_clone SHALLOW CLONE {mtab}")
    try:
        assert engine.table("m_clone").count() == n0
        engine.execute("DELETE FROM m_clone WHERE o_orderkey <= 200")
        assert engine.table("m_clone").count() < n0
        assert engine.table(mtab).count() == n0  # source untouched
        import pytest as _pytest

        with _pytest.raises(ValueError, match="already exists"):
            engine.execute(f"CREATE TABLE m_clone SHALLOW CLONE {mtab}")
    finally:
        engine.execute("DROP TABLE m_clone")


def test_timestamp_as_of_time_travel(engine, mtab):
    """FROM t TIMESTAMP AS OF '<ts>' resolves the newest version
    committed at or before the UTC timestamp (commit time = the log
    file's mtime), joins included; pre-history timestamps refuse."""
    import datetime as dt
    import os as _os
    import time

    mt = _mt(engine, mtab)
    n0 = engine.table(mtab).count()
    v0 = mt.version()
    time.sleep(1.1)  # mtime resolution margin between commits
    cut = dt.datetime.now(dt.timezone.utc)
    time.sleep(1.1)
    engine.execute(f"DELETE FROM {mtab} WHERE o_orderkey <= 50")
    assert engine.table(mtab).count() < n0

    iso = cut.strftime("%Y-%m-%d %H:%M:%S.%f")
    got = engine.sql(
        f"SELECT count(*) AS n FROM {mtab} TIMESTAMP AS OF '{iso}'"
    ).first()["n"]
    assert got == n0
    # resolves to v0 exactly
    assert mt.version_at_timestamp(cut.timestamp()) == v0
    # a string literal containing the same text is NOT rewritten
    lit = engine.sql(
        f"SELECT 'x {mtab} TIMESTAMP AS OF ''2999-01-01'' y' AS s"
    ).first()["s"]
    assert "TIMESTAMP AS OF" in lit
    # pre-history timestamp refuses loudly
    import pytest as _pytest

    with _pytest.raises(Exception, match="no retained version"):
        engine.sql(
            f"SELECT count(*) FROM {mtab} TIMESTAMP AS OF '1990-01-01'"
        )


def test_restore_and_clone_timestamp_forms(engine, mtab):
    import datetime as dt
    import time

    mt = _mt(engine, mtab)
    n0 = engine.table(mtab).count()
    time.sleep(1.1)
    cut = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")
    time.sleep(1.1)
    engine.execute(f"DELETE FROM {mtab} WHERE o_orderkey <= 80")
    assert engine.table(mtab).count() < n0

    engine.execute(f"CREATE TABLE m_tclone CLONE {mtab} TIMESTAMP AS OF '{cut}'")
    try:
        assert engine.table("m_tclone").count() == n0
    finally:
        engine.execute("DROP TABLE m_tclone")

    res = engine.execute(f"RESTORE TABLE {mtab} TO TIMESTAMP AS OF '{cut}'")
    assert engine.table(mtab).count() == n0
    assert res[0]["new_version"] > res[0]["restored_to"]


def test_describe_detail(engine, mtab):
    mt = _mt(engine, mtab)
    engine.execute(f"ALTER TABLE {mtab} SET BLOOM FILTER (o_custkey)")
    d = engine.execute(f"DESCRIBE DETAIL {mtab}")[0]
    assert d["format"] == "manifest" and d["location"] == mt.path
    assert d["version"] == mt.version()
    assert d["num_files"] == len(mt.files())
    assert d["num_rows"] == engine.table(mtab).count()
    assert d["size_bytes"] > 0 and d["committed_at"]
    assert d["bloom_columns"] == ["o_custkey"] and d["cas"] is False
    assert d["retained_versions"] == len(mt.versions())


def test_multi_table_group_commit_and_crash_recovery(
    spark, tmp_path, monkeypatch
):
    """r13 multi-table transactions (sources/manifest.py
    commit_staged_group + recover_txn_journals): the intent journal is
    the commit point — a crash after it (simulated: the second table's
    publish raises) leaves one table committed, and recovery on the
    next engine open completes the other from journal + staged files,
    idempotently."""
    from sclera_spark.sources.manifest import TxnJournaledError

    ta = ManifestTable.create(
        spark.range(0, 2).selectExpr("id AS k"), str(tmp_path / "ta")
    )
    tb = ManifestTable.create(
        spark.range(10, 12).selectExpr("id AS k"), str(tmp_path / "tb")
    )
    jd = str(tmp_path / "_sclera_txn")

    def stage(mt, lo, hi):
        return mt._stage(spark.range(lo, hi).selectExpr("id AS k"))

    # happy path: both tables commit, journal gone
    sa, sb = stage(ta, 2, 4), stage(tb, 12, 14)
    ManifestTable.commit_staged_group(
        [(ta, [sa], set()), (tb, [sb], set())], jd
    )
    assert sorted(r.k for r in ta.read(spark).collect()) == [0, 1, 2, 3]
    assert sorted(
        r.k for r in tb.read(spark).collect()
    ) == [10, 11, 12, 13]
    assert not [f for f in os.listdir(jd) if f.endswith(".json")]

    # conflict aborts the WHOLE group before anything commits
    sa2, sb2 = stage(ta, 4, 5), stage(tb, 14, 15)
    with pytest.raises(ValueError, match="no longer live"):
        ManifestTable.commit_staged_group(
            [(ta, [sa2], {"nope.parquet"}), (tb, [sb2], set())], jd
        )
    assert ta.read(spark).count() == 4 and tb.read(spark).count() == 4

    # crash mid-group: second table's publish dies AFTER the journal
    orig = ManifestTable._commit_locked
    calls = {"n": 0}

    def dying(self, compute, staged=None):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash")
        return orig(self, compute, staged)

    monkeypatch.setattr(ManifestTable, "_commit_locked", dying)
    sa3, sb3 = stage(ta, 4, 6), stage(tb, 14, 16)
    with pytest.raises(TxnJournaledError):
        ManifestTable.commit_staged_group(
            [(ta, [sa3], set()), (tb, [sb3], set())], jd
        )
    monkeypatch.setattr(ManifestTable, "_commit_locked", orig)
    # table a committed, table b did not, journal survives
    assert ta.read(spark).count() == 6
    assert tb.read(spark).count() == 4
    (jfile,) = [f for f in os.listdir(jd) if f.endswith(".json")]
    # recovery completes table b and clears the journal — idempotently
    # (a second run is a no-op)
    recovered = ManifestTable.recover_txn_journals(jd)
    assert recovered == [os.path.realpath(str(tmp_path / "tb"))]
    assert sorted(
        r.k for r in tb.read(spark).collect()
    ) == [10, 11, 12, 13, 14, 15]
    assert ta.read(spark).count() == 6
    assert not [f for f in os.listdir(jd) if f.endswith(".json")]
    assert ManifestTable.recover_txn_journals(jd) == []


def test_concurrent_group_commits_opposite_orders(spark, tmp_path):
    """Two sessions committing multi-table transactions over the SAME
    two tables in OPPOSITE orders must serialize, not deadlock — the
    group commit acquires writer locks in canonical path order
    regardless of the entry order callers pass. Every commit must land
    (dense version chains, all rows present)."""
    import threading

    ta = ManifestTable.create(
        spark.range(0, 1).selectExpr("id AS k"), str(tmp_path / "ca")
    )
    tb = ManifestTable.create(
        spark.range(100, 101).selectExpr("id AS k"), str(tmp_path / "cb")
    )
    jd = str(tmp_path / "_j")
    ROUNDS = 4
    errs: list = []

    def worker(order_ab: bool, base: int):
        try:
            for i in range(ROUNDS):
                lo = base + i * 10
                sa = ta._stage(
                    spark.range(lo, lo + 2).selectExpr("id AS k")
                )
                sb = tb._stage(
                    spark.range(lo + 5, lo + 7).selectExpr("id AS k")
                )
                entries = [(ta, [sa], set()), (tb, [sb], set())]
                if not order_ab:
                    entries = entries[::-1]
                ManifestTable.commit_staged_group(entries, jd)
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    t1 = threading.Thread(target=worker, args=(True, 1000))
    t2 = threading.Thread(target=worker, args=(False, 2000))
    t1.start(); t2.start()
    t1.join(timeout=300); t2.join(timeout=300)
    assert not t1.is_alive() and not t2.is_alive(), "deadlock"
    assert not errs, errs
    # every commit landed: create (v1) + 2*ROUNDS txn commits per table
    assert ta.version() == 1 + 2 * ROUNDS
    assert tb.version() == 1 + 2 * ROUNDS
    assert ta.read(spark).count() == 1 + 2 * ROUNDS * 2
    assert tb.read(spark).count() == 1 + 2 * ROUNDS * 2
    import os as _os

    assert not [
        f for f in _os.listdir(jd) if f.endswith(".json")
    ]  # no journals left behind


def test_group_commit_journal_write_failure_leaves_no_orphans(
    spark, tmp_path, monkeypatch
):
    """r13 review: a failure BETWEEN staging relocation and the journal
    rename (e.g. ENOSPC writing the journal) must abort pre-journal
    with the staged bytes back at their original scratch paths (so the
    caller's discard_staged still works) and nothing stranded under
    _txn_staging — which vacuum never scans."""
    import json as _json

    ta = ManifestTable.create(
        spark.range(0, 2).selectExpr("id AS k"), str(tmp_path / "ja")
    )
    tb = ManifestTable.create(
        spark.range(10, 12).selectExpr("id AS k"), str(tmp_path / "jb")
    )
    jd = str(tmp_path / "_j2")
    sa = ta._stage(spark.range(2, 4).selectExpr("id AS k"))
    sb = tb._stage(spark.range(12, 14).selectExpr("id AS k"))

    orig_dump = _json.dump

    def dying(obj, fh, *a, **kw):
        if isinstance(obj, dict) and "tables" in obj:
            raise OSError(28, "No space left on device")
        return orig_dump(obj, fh, *a, **kw)

    monkeypatch.setattr(_json, "dump", dying)
    with pytest.raises(OSError):
        ManifestTable.commit_staged_group(
            [(ta, [sa], set()), (tb, [sb], set())], jd
        )
    monkeypatch.undo()
    # nothing committed, no journal (not even a .tmp), and the staged
    # scratch dirs are BACK where discard_staged expects them
    assert ta.read(spark).count() == 2 and tb.read(spark).count() == 2
    assert not os.path.isdir(jd) or not os.listdir(jd)
    for scratch, names in (sa, sb):
        for n in names:
            assert os.path.exists(os.path.join(scratch, n))
    for t in (ta, tb):
        sroot = os.path.join(t.path, "_txn_staging")
        leftovers = (
            [
                d
                for d in os.listdir(sroot)
                if os.listdir(os.path.join(sroot, d))
            ]
            if os.path.isdir(sroot)
            else []
        )
        assert leftovers == []
    # the transaction is retryable: the same staged tuples commit fine
    ManifestTable.commit_staged_group(
        [(ta, [sa], set()), (tb, [sb], set())], jd
    )
    assert sorted(r.k for r in ta.read(spark).collect()) == [0, 1, 2, 3]
    assert sorted(
        r.k for r in tb.read(spark).collect()
    ) == [10, 11, 12, 13]


def test_recovery_with_vanished_staged_files_marks_failed(
    spark, tmp_path, monkeypatch
):
    """r13 review: a journal whose staged bytes vanished (torn reboot,
    manual cleanup) must be set aside as .failed with a loud warning —
    the same orphan contract as the foreign-writer case — NOT raise and
    brick every subsequent engine open."""
    ta = ManifestTable.create(
        spark.range(0, 2).selectExpr("id AS k"), str(tmp_path / "va")
    )
    jd = str(tmp_path / "_j3")
    sa = ta._stage(spark.range(2, 4).selectExpr("id AS k"))

    orig = ManifestTable._commit_locked

    def dying(self, compute, staged=None):
        raise OSError("simulated crash")

    monkeypatch.setattr(ManifestTable, "_commit_locked", dying)
    from sclera_spark.sources.manifest import TxnJournaledError

    with pytest.raises(TxnJournaledError):
        ManifestTable.commit_staged_group([(ta, [sa], set())], jd)
    monkeypatch.setattr(ManifestTable, "_commit_locked", orig)
    # simulate the staged bytes vanishing before recovery
    sroot = os.path.join(ta.path, "_txn_staging")
    import shutil as _sh

    _sh.rmtree(sroot)
    with pytest.warns(UserWarning, match="vanished"):
        recovered = ManifestTable.recover_txn_journals(jd)
    assert recovered == []
    assert [f for f in os.listdir(jd) if f.endswith(".failed")]
    assert not [f for f in os.listdir(jd) if f.endswith(".json")]
    # the engine stays usable: the table reads its pre-txn state
    assert ta.read(spark).count() == 2
    # and a SECOND recovery pass is a clean no-op
    assert ManifestTable.recover_txn_journals(jd) == []
