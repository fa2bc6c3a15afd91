"""Automatic file-level data skipping on manifest tables
(sources/prune.py + the engine.sql hook). The invariant under test:
pruned queries return EXACTLY the unpruned results (pruning is an
optimization, never a filter), while df.inputFiles() shrinks when the
probe's range misses whole committed files — and the full view is
always restored afterwards."""

from __future__ import annotations

import pytest

from sclera_spark.engine import ScleraEngine


@pytest.fixture()
def engine(spark, tables):
    return ScleraEngine(spark)


@pytest.fixture()
def ptab(engine):
    """A manifest table committed in three disjoint o_orderkey slices,
    so each commit's files carry non-overlapping key ranges."""
    engine.execute(
        """
        CREATE TABLE pt AS
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
               o_orderpriority
        FROM orders WHERE o_orderkey < 500
        """
    )
    engine.execute("ALTER TABLE pt SET FORMAT MANIFEST")
    engine.execute(
        """
        INSERT INTO pt
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
               o_orderpriority
        FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1000
        """
    )
    engine.execute(
        """
        INSERT INTO pt
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
               o_orderpriority
        FROM orders WHERE o_orderkey >= 1000
        """
    )
    yield "pt"
    engine.execute("DROP TABLE pt")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _unpruned(engine, sql):
    engine.config["manifest_pruning"] = "off"
    try:
        return engine.sql(sql)
    finally:
        engine.config.pop("manifest_pruning", None)


def test_range_probe_prunes_files_and_matches(engine, ptab):
    sql = (
        "SELECT sum(o_totalprice) AS s, count(*) AS n FROM pt "
        "WHERE o_orderkey >= 600 AND o_orderkey < 900"
    )
    full = engine.table(ptab).inputFiles()
    pruned = engine.sql(sql)
    assert len(pruned.inputFiles()) < len(full)
    assert _rows(pruned) == _rows(_unpruned(engine, sql))
    # the full view was restored for subsequent queries
    assert len(engine.table(ptab).inputFiles()) == len(full)
    assert engine.sql("SELECT count(*) AS n FROM pt").first().n == \
        engine.table("orders").count()


def test_date_range_prunes(engine, ptab):
    # o_orderdate is not clustered by commit, so force a clustered
    # layout first: OPTIMIZE ... SORT BY tightens per-file date ranges
    engine.execute("OPTIMIZE pt SORT BY (o_orderdate)")
    sql = (
        "SELECT count(*) AS n FROM pt "
        "WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'"
    )
    pruned = engine.sql(sql)
    assert _rows(pruned) == _rows(_unpruned(engine, sql))
    if len(engine.table(ptab).inputFiles()) > 1:
        assert len(pruned.inputFiles()) < len(
            engine.table(ptab).inputFiles()
        )


def test_in_list_and_equality_prune(engine, ptab):
    sql = "SELECT count(*) AS n FROM pt WHERE o_orderkey IN (1, 2, 3, 32)"
    pruned = engine.sql(sql)
    assert len(pruned.inputFiles()) < len(engine.table(ptab).inputFiles())
    assert _rows(pruned) == _rows(_unpruned(engine, sql))

    sql2 = "SELECT o_custkey FROM pt WHERE o_orderkey = 1001"
    assert _rows(engine.sql(sql2)) == _rows(_unpruned(engine, sql2))

    # >10 values: the optimizer converts In to InSet — still pruned
    vals = ",".join(str(i) for i in range(1, 14))
    sql3 = f"SELECT count(*) AS n FROM pt WHERE o_orderkey IN ({vals})"
    pruned3 = engine.sql(sql3)
    assert len(pruned3.inputFiles()) < len(engine.table(ptab).inputFiles())
    assert _rows(pruned3) == _rows(_unpruned(engine, sql3))


def test_or_disjunction_never_prunes_unsoundly(engine, ptab):
    # an OR across distant ranges must not be treated as a conjunct:
    # both slices' rows survive
    sql = (
        "SELECT count(*) AS n FROM pt "
        "WHERE o_orderkey < 100 OR o_orderkey >= 1000"
    )
    assert _rows(engine.sql(sql)) == _rows(_unpruned(engine, sql))


def test_adversarial_string_literal_cannot_forge_bounds(engine, ptab):
    # a literal crafted to look like a serialized pushed filter must
    # stay an opaque value — no bound on o_orderkey may be forged
    sql = (
        "SELECT count(*) AS n FROM pt "
        "WHERE o_orderpriority <> 'x),GreaterThan(o_orderkey,999999)'"
    )
    got = engine.sql(sql).first().n
    assert got == _unpruned(engine, sql).first().n
    sql2 = (
        "SELECT count(*) AS n FROM pt WHERE "
        "o_orderpriority = 'p),LessThan(o_orderkey,-1)' "
        "OR o_orderkey <= 10"
    )
    assert engine.sql(sql2).first().n == _unpruned(engine, sql2).first().n


def test_same_table_twice_takes_union_of_scans(engine, ptab):
    # self-join probing two disjoint slices: the shared view must keep
    # the union of both scans' files
    sql = (
        "SELECT a.o_orderkey AS k1, b.o_orderkey AS k2 "
        "FROM pt a JOIN pt b ON a.o_custkey = b.o_custkey "
        "WHERE a.o_orderkey < 500 AND b.o_orderkey >= 1200"
    )
    assert _rows(engine.sql(sql)) == _rows(_unpruned(engine, sql))


def test_unfiltered_scan_keeps_all_files(engine, ptab):
    # (plain count(*) is metadata-answered — use a shape that scans)
    sql = "SELECT sum(o_totalprice) AS s FROM pt"
    assert len(engine.sql(sql).inputFiles()) == len(
        engine.table(ptab).inputFiles()
    )


def test_pruning_config_off(engine, ptab):
    engine.config["manifest_pruning"] = "off"
    try:
        df = engine.sql(
            "SELECT count(*) AS n FROM pt WHERE o_orderkey >= 1000"
        )
        assert len(df.inputFiles()) == len(engine.table(ptab).inputFiles())
    finally:
        engine.config.pop("manifest_pruning", None)


def test_join_with_plain_table_still_prunes_manifest_side(engine, ptab):
    sql = (
        "SELECT count(*) AS n FROM pt "
        "JOIN customer ON pt.o_custkey = customer.c_custkey "
        "WHERE pt.o_orderkey >= 1000"
    )
    pruned = engine.sql(sql)
    assert _rows(pruned) == _rows(_unpruned(engine, sql))
    pt_files = {
        f for f in pruned.inputFiles() if "/pt/" in f or "pt/data" in f
    }
    all_pt = set(engine.table(ptab).inputFiles())
    assert pt_files and len(pt_files) < len(all_pt)


def test_update_after_pruned_read_sees_new_stats(engine, ptab):
    sql = "SELECT count(*) AS n FROM pt WHERE o_orderkey >= 1000"
    n0 = engine.sql(sql).first().n
    engine.execute(
        "INSERT INTO pt SELECT o_orderkey + 100000, o_custkey, "
        "o_totalprice, o_orderdate, o_orderpriority FROM orders "
        "WHERE o_orderkey <= 10"
    )
    assert engine.sql(sql).first().n > n0


def test_subquery_scans_join_the_survivor_union(engine, ptab):
    """A scalar subquery over the same table hangs off an EXPRESSION,
    not children() — its scan must still contribute to the survivor
    union, or the rebuilt subquery reads the pruned view and computes
    over the wrong rows (found as a live wrong-count before the
    subqueriesAll walk)."""
    sql = (
        "SELECT count(*) AS n FROM pt WHERE o_orderkey < 100 AND "
        "o_totalprice < (SELECT max(o_totalprice) FROM pt "
        "WHERE o_orderkey >= 1000)"
    )
    assert engine.sql(sql).first().n == _unpruned(engine, sql).first().n

    # IN-subquery variant (optimizer may rewrite to a join — either
    # way the survivor union must cover both ranges)
    sql2 = (
        "SELECT count(*) AS n FROM pt WHERE o_orderkey < 100 AND "
        "o_custkey IN (SELECT o_custkey FROM pt WHERE o_orderkey >= 1200)"
    )
    assert engine.sql(sql2).first().n == _unpruned(engine, sql2).first().n

    # EXISTS, correlated
    sql3 = (
        "SELECT count(*) AS n FROM pt a WHERE a.o_orderkey < 100 AND "
        "EXISTS (SELECT 1 FROM pt b WHERE b.o_custkey = a.o_custkey "
        "AND b.o_orderkey >= 1200)"
    )
    assert engine.sql(sql3).first().n == _unpruned(engine, sql3).first().n


# ------------------------------------------------- ZORDER clustering


def test_zorder_prunes_on_every_listed_column(spark, tmp_path):
    """SORT BY (a) leaves probes on b unprunable; ZORDER BY (a, b)
    gives every file a compact cell of the (a, b) space so BOTH
    single-column probes skip files — with identical results."""
    import os

    from sclera_spark.sources.manifest import ManifestTable

    path = str(tmp_path / "zt")
    df = spark.range(0, 40000).selectExpr(
        "id % 149 AS a",
        "cast(abs(hash(id)) % 10007 AS long) AS b",
        "id AS v",
    )
    ManifestTable.create(df.repartition(8), path)
    mt = ManifestTable(path)
    target = max(
        1, sum(os.path.getsize(p) for p in mt.files()) // 16
    )
    mt.compact(spark, target_bytes=target, zorder_by=["a", "b"])
    total = len(mt.files())
    assert total >= 4
    pa = len(mt.files_pruned({"a": (10, 12)}))
    pb = len(mt.files_pruned({"b": (100, 400)}))
    assert pa < total, f"a-probe kept {pa}/{total}"
    assert pb < total, f"b-probe kept {pb}/{total}"
    # correctness: pruned read == full read under the probe predicates
    for col, lo, hi in (("a", 10, 12), ("b", 100, 400)):
        got = (
            mt.read(spark, prune={col: (lo, hi)})
            .filter(f"{col} BETWEEN {lo} AND {hi}")
            .count()
        )
        exp = (
            mt.read(spark).filter(f"{col} BETWEEN {lo} AND {hi}").count()
        )
        assert got == exp


def test_zorder_ddl_roundtrip(engine, ptab):
    engine.execute("OPTIMIZE pt TARGET 1 MB ZORDER BY (o_orderkey, o_custkey)")
    sql = "SELECT count(*) AS n FROM pt WHERE o_custkey BETWEEN 100 AND 140"
    pruned = engine.sql(sql)
    assert _rows(pruned) == _rows(_unpruned(engine, sql))
    sql2 = "SELECT count(*) AS n FROM pt WHERE o_orderkey BETWEEN 10 AND 60"
    assert _rows(engine.sql(sql2)) == _rows(_unpruned(engine, sql2))
    assert engine.sql("SELECT count(*) AS n FROM pt").first().n == \
        engine.table("orders").count()


def test_zorder_rejects_unsupported_types(spark, tmp_path):
    import pytest as _pytest

    from sclera_spark.sources.manifest import ManifestTable

    path = str(tmp_path / "zs")
    ManifestTable.create(
        spark.range(10).selectExpr("id AS k", "cast(id AS string) AS s"),
        path,
    )
    mt = ManifestTable(path)
    with _pytest.raises(ValueError, match="unsupported type"):
        mt.compact(spark, zorder_by=["s"])
    with _pytest.raises(ValueError, match="exclusive"):
        mt.compact(spark, cluster_by=["k"], zorder_by=["k"])


def test_row_counts_and_list_files(engine, ptab):
    """Commits record exact per-file row counts; row_count() answers
    the table count from metadata alone, and LIST FILES surfaces the
    skipping tier's per-file view."""
    from sclera_spark.sources.manifest import ManifestTable

    mt = ManifestTable(engine._ddl._path(ptab))
    assert mt.row_count() == engine.table("orders").count()
    listing = engine.execute("LIST FILES pt")
    assert len(listing) == len(mt.files())
    assert sum(e["rows"] for e in listing) == mt.row_count()
    assert all(e["bytes"] > 0 for e in listing)
    assert any("o_orderkey" in e["stats"] for e in listing)

    # pre-rows manifests degrade to None, never a wrong number: strip
    # the recorded row counts from the whole delta chain (snapshot
    # "rows" block and per-added-file entries alike)
    import json as _json
    import os as _os

    v = mt.version()
    while True:
        mpath = _os.path.join(mt.log_dir, f"v{v}.json")
        with open(mpath) as fh:
            m = _json.load(fh)
        m.pop("rows", None)
        for e in m.get("add", []):
            e.pop("rows", None)
        with open(mpath, "w") as fh:
            _json.dump(m, fh)
        if "files" in m:
            break
        v = m["base"]
    assert mt.row_count() is None


# -------------------------------------------- metadata-only count(*)


def test_metadata_only_count(engine, ptab):
    """SELECT count(*) FROM t over a manifest table is answered from
    recorded per-file row counts: zero files opened (the plan is a
    LocalRelation), exact across DML and compaction — and every
    non-trivial count shape still runs the real scan."""
    exp = engine.table("orders").count()
    df = engine.sql("SELECT count(*) AS n FROM pt")
    assert df.first().n == exp
    assert df.inputFiles() == []  # metadata answer, no scan

    # stays exact across DML + OPTIMIZE
    engine.execute("DELETE FROM pt WHERE o_orderkey < 7")
    engine.execute(
        "INSERT INTO pt SELECT o_orderkey + 500000, o_custkey, "
        "o_totalprice, o_orderdate, o_orderpriority FROM orders "
        "WHERE o_orderkey < 3"
    )
    engine.execute("OPTIMIZE pt TARGET 64 MB")
    df2 = engine.sql("SELECT count(*) AS n FROM pt")
    assert df2.inputFiles() == []
    engine.config["metadata_only_count"] = "off"
    try:
        scanned = engine.sql("SELECT count(*) AS n FROM pt")
        assert scanned.inputFiles() != []
        assert df2.first().n == scanned.first().n
    finally:
        engine.config.pop("metadata_only_count", None)

    # count(col) answers from metadata too (r9): total - null count
    ccol = engine.sql("SELECT count(o_custkey) AS n FROM pt")
    assert ccol.inputFiles() == []
    engine.config["metadata_only_count"] = "off"
    try:
        assert ccol.first().n == engine.sql(
            "SELECT count(o_custkey) AS n FROM pt"
        ).first().n
    finally:
        engine.config.pop("metadata_only_count", None)

    # non-trivial shapes keep the real scan
    for sql in (
        "SELECT count(*) AS n FROM pt WHERE o_orderkey > 100",
        "SELECT count(DISTINCT o_custkey) AS n FROM pt",
        "SELECT o_orderpriority, count(*) AS n FROM pt GROUP BY 1",
        "SELECT count(*) AS n, sum(o_totalprice) AS s FROM pt",
    ):
        assert engine.sql(sql).inputFiles() != [], sql


def test_metadata_count_time_travel_snapshot(engine, ptab):
    """count(*) VERSION AS OF must count THAT snapshot (per-file rows
    resolved across retained versions), not the current one."""
    from sclera_spark.sources.manifest import ManifestTable

    mt = ManifestTable(engine._ddl._path(ptab))
    v = mt.version()
    n_before = engine.sql("SELECT count(*) AS n FROM pt").first().n
    engine.execute("DELETE FROM pt WHERE o_orderkey < 50")
    df = engine.sql(f"SELECT count(*) AS n FROM pt VERSION AS OF {v}")
    assert df.first().n == n_before
    assert df.inputFiles() == []
    now = engine.sql("SELECT count(*) AS n FROM pt").first().n
    assert now < n_before


def test_string_ts_lookalikes_never_mispruned(spark, tmp_path):
    """r8 ADVICE defect: a STRING column mixing timestamp-looking values
    with ordinary strings must compare RAW — regex-rewriting the stored
    bounds broke ordering ('2024-01-02 03:04:05.000000' sorts below
    '2024-01-02B') and an equality probe pruned the file containing its
    own match. Stats now carry the column's type tag and string columns
    are never canonicalized."""
    from sclera_spark.sources.manifest import ManifestTable

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2024-01-02B",), ("2024-01-02T03:04:05",)], "c string"
    )
    ManifestTable.create(df.coalesce(1), path)
    mt = ManifestTable(path)
    # the probed value IS in the file: it must survive every probe shape
    assert mt.files_pruned({"c": ("2024-01-02B", "2024-01-02B")}) == mt.files()
    assert (
        mt.files_pruned({"c": ("2024-01-02T03:04:05", "2024-01-02T03:04:05")})
        == mt.files()
    )
    # raw string ordering still prunes where sound: both values < 'a',
    # and a 'zzz' file lies above 'b'
    mt.append(spark.createDataFrame([("zzz",)], "c string").coalesce(1))
    assert mt.files_pruned({"c": ("a", "b")}) == []


def test_timestamp_column_probes_canonicalize_by_tag(spark, tmp_path):
    """A genuine TIMESTAMP column's bounds canonicalize to the stored
    fixed-width form whether the probe arrives as a datetime object, a
    'T'-separated string, or a short-fraction string — pruning fires for
    all three and never for an incomparable probe type."""
    import datetime as dt

    from sclera_spark.sources.manifest import ManifestTable

    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.sql(
            "SELECT timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600) AS ts "
            "FROM range(0, 10)"
        ).coalesce(1),
        path,
    )
    mt = ManifestTable(path)
    mt.append(
        spark.sql(
            "SELECT timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600) AS ts "
            "FROM range(0, 10)"
        ).coalesce(1)
    )
    assert len(mt.files()) == 2
    probes = [
        ("2024-05-30T00:00:00", None),
        ("2024-05-30 00:00:00.5", None),
        (dt.datetime(2024, 5, 30), None),
    ]
    for lo, hi in probes:
        assert len(mt.files_pruned({"ts": (lo, hi)})) == 1, lo
    # an int probe on a timestamp column is incomparable: keep both
    assert len(mt.files_pruned({"ts": (5, None)})) == 2


def test_null_count_skipping(engine):
    """IS NULL / IS NOT NULL probes prune through per-file null counts,
    and an all-NULL file (which HAS no min/max stats) is pruned by a
    range probe via range-implies-notnull — with results identical to
    the unpruned scan in every case."""
    engine.execute(
        "CREATE TABLE nt AS "
        "SELECT o_orderkey, CAST(NULL AS DOUBLE) AS tp "
        "FROM orders WHERE o_orderkey < 500"
    )
    try:
        engine.execute("ALTER TABLE nt SET FORMAT MANIFEST")
        engine.execute(
            "INSERT INTO nt SELECT o_orderkey, o_totalprice "
            "FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1000"
        )
        engine.execute(
            "INSERT INTO nt SELECT o_orderkey, o_totalprice "
            "FROM orders WHERE o_orderkey >= 1000"
        )
        full = engine.table("nt").inputFiles()
        assert len(full) >= 3

        for sql in (
            "SELECT count(o_orderkey) AS n, sum(tp) AS s FROM nt WHERE tp IS NULL",
            "SELECT count(*) AS n, sum(tp) AS s FROM nt WHERE tp IS NOT NULL",
            "SELECT count(*) AS n, sum(tp) AS s FROM nt WHERE tp > 100",
        ):
            pruned = engine.sql(sql)
            assert len(pruned.inputFiles()) < len(full), sql
            assert _rows(pruned) == _rows(_unpruned(engine, sql)), sql
        # restored afterwards
        assert len(engine.table("nt").inputFiles()) == len(full)
    finally:
        engine.execute("DROP TABLE nt")


def test_metadata_only_min_max(engine, ptab):
    """Bare ungrouped SELECT min(c)/max(c) (alone or mixed with
    count(*)) over a manifest table folds the per-file min/max stats:
    zero files opened, values identical to the forced scan — for
    integer, string and date columns; floating columns and every
    non-trivial shape still run the real scan."""

    def forced(sql):
        engine.config["metadata_only_count"] = "off"
        try:
            return engine.sql(sql).collect()
        finally:
            engine.config.pop("metadata_only_count", None)

    for sql in (
        "SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi, "
        "count(*) AS n FROM pt",
        "SELECT max(o_orderdate) AS d FROM pt",
        "SELECT min(o_orderpriority) AS p, max(o_orderpriority) AS q FROM pt",
    ):
        df = engine.sql(sql)
        assert df.inputFiles() == [], sql  # metadata answer, no scan
        assert df.collect() == forced(sql), sql

    # stays exact across DML (files rewritten, stats re-recorded)
    engine.execute("DELETE FROM pt WHERE o_orderkey <= 10")
    sql = "SELECT min(o_orderkey) AS lo FROM pt"
    df = engine.sql(sql)
    assert df.inputFiles() == []
    assert df.first().lo == forced(sql)[0].lo > 10

    # min(DISTINCT c) is answered too: Catalyst's EliminateDistinct
    # rewrites it to plain min(c) before the gate ever sees it
    dsql = "SELECT min(DISTINCT o_orderkey) AS m FROM pt"
    ddf = engine.sql(dsql)
    assert ddf.inputFiles() == [] and ddf.collect() == forced(dsql)

    # gated shapes: the real scan runs
    for sql in (
        "SELECT min(o_totalprice) AS m FROM pt",  # float: NaN-unsound
        "SELECT min(o_orderkey) AS m FROM pt WHERE o_custkey > 5",
        "SELECT min(o_orderkey + 1) AS m FROM pt",
        "SELECT min(o_orderkey) AS m, avg(o_custkey) AS a FROM pt",
        "SELECT o_orderpriority AS p, min(o_orderkey) AS m FROM pt GROUP BY 1",
    ):
        scanned = engine.sql(sql)
        assert scanned.inputFiles() != [], sql
        assert scanned.collect() == forced(sql), sql


def test_metadata_min_max_all_null_and_time_travel(engine):
    """An all-NULL column's metadata MIN is NULL (files skipped via
    null counts, like SQL MIN skips NULL rows); VERSION AS OF answers
    from THAT snapshot's files."""
    from sclera_spark.sources.manifest import ManifestTable

    engine.execute(
        "CREATE TABLE mm AS SELECT o_orderkey, "
        "CAST(NULL AS BIGINT) AS nothing FROM orders WHERE o_orderkey < 500"
    )
    try:
        engine.execute("ALTER TABLE mm SET FORMAT MANIFEST")
        df = engine.sql("SELECT min(nothing) AS m, max(nothing) AS x FROM mm")
        assert df.inputFiles() == []
        assert df.first() == (None, None)
        dfc = engine.sql(
            "SELECT count(nothing) AS c, count(*) AS n FROM mm"
        )
        assert dfc.inputFiles() == []
        row = dfc.first()
        assert row.c == 0 and row.n > 0  # NULLs excluded, rows counted

        mt = ManifestTable(engine._ddl._path("mm"))
        v = mt.version()
        lo0 = engine.sql("SELECT min(o_orderkey) AS m FROM mm").first().m
        engine.execute("DELETE FROM mm WHERE o_orderkey < 100")
        cur = engine.sql("SELECT min(o_orderkey) AS m FROM mm")
        old = engine.sql(
            f"SELECT min(o_orderkey) AS m FROM mm VERSION AS OF {v}"
        )
        assert cur.inputFiles() == [] and old.inputFiles() == []
        assert old.first().m == lo0
        assert cur.first().m >= 100 > lo0
    finally:
        engine.execute("DROP TABLE mm")


@pytest.fixture()
def dimt(engine):
    """A small dim table whose key range comes from DATA, not literals —
    Catalyst's static constraint inference cannot see it, so any fact
    pruning must come from the dynamic (join-driven) path."""
    engine.execute(
        "CREATE TABLE dimt AS SELECT o_orderkey AS k, o_custkey AS c "
        "FROM orders WHERE o_orderkey BETWEEN 600 AND 900"
    )
    yield "dimt"
    engine.execute("DROP TABLE dimt")


def _pt_files(df):
    return [f for f in df.inputFiles() if "/data/" in f]


def test_dynamic_file_pruning_star_probe(engine, ptab, dimt):
    """Delta-style dynamic file pruning: a join of the manifest fact
    table to a small dimension evaluates the dim side's key range with
    one tiny job and prunes fact files by it — identical results, and
    the derived range is cached so the re-run issues zero extra jobs."""
    full = engine.table(ptab).inputFiles()
    sql = (
        "SELECT sum(pt.o_totalprice) AS s, count(*) AS n "
        "FROM pt JOIN dimt ON pt.o_orderkey = dimt.k"
    )
    df = engine.sql(sql)
    assert len(_pt_files(df)) < len(full)
    assert _rows(df) == _rows(_unpruned(engine, sql))
    assert len(engine._dyn_prune_cache) == 1
    # cached: same dim plan + same files -> no new entry, same pruning
    df2 = engine.sql(sql)
    assert len(_pt_files(df2)) == len(_pt_files(df))
    assert len(engine._dyn_prune_cache) == 1
    # off switch restores the full scan
    engine.config["dynamic_file_pruning"] = "off"
    try:
        assert len(_pt_files(engine.sql(sql))) == len(full)
    finally:
        engine.config.pop("dynamic_file_pruning", None)


def test_dynamic_pruning_dim_update_invalidates(engine, ptab, dimt):
    """Rewriting the dim table changes its file list, which keys the
    derived-range cache — the stale range is never reused."""
    sql = (
        "SELECT count(*) AS n "
        "FROM pt JOIN dimt ON pt.o_orderkey = dimt.k"
    )
    n1 = engine.sql(sql).first().n
    assert n1 == _unpruned(engine, sql).first().n
    # move the dim window: different keys must now survive
    engine.execute("DELETE FROM dimt WHERE k < 700")
    engine.execute(
        "INSERT INTO dimt SELECT o_orderkey, o_custkey FROM orders "
        "WHERE o_orderkey BETWEEN 1200 AND 1400"
    )
    n2 = engine.sql(sql).first().n
    assert n2 == _unpruned(engine, sql).first().n
    assert n2 != n1
    assert len(engine._dyn_prune_cache) >= 2  # fresh entry, not reuse


def test_dynamic_pruning_outer_join_sides(engine, ptab, dimt):
    """A LEFT JOIN preserves its left side: the fact table on the LEFT
    must keep every file (its unmatched rows survive), while the fact
    on the RIGHT of a left join is prunable — both with results equal
    to the unpruned run."""
    full = engine.table(ptab).inputFiles()
    keep_sql = (
        "SELECT count(*) AS n, count(dimt.k) AS m "
        "FROM pt LEFT JOIN dimt ON pt.o_orderkey = dimt.k"
    )
    df = engine.sql(keep_sql)
    assert len(_pt_files(df)) == len(full)  # preserved side: no pruning
    assert _rows(df) == _rows(_unpruned(engine, keep_sql))
    prune_sql = (
        "SELECT count(*) AS n, count(pt.o_orderkey) AS m "
        "FROM dimt LEFT JOIN pt ON pt.o_orderkey = dimt.k"
    )
    df2 = engine.sql(prune_sql)
    assert len(_pt_files(df2)) < len(full)  # inner side: prunable
    assert _rows(df2) == _rows(_unpruned(engine, prune_sql))


def test_dynamic_pruning_blocked_by_window(engine, ptab, dimt):
    """An unpartitioned window function below the join makes row
    removal visible (row_number over the whole table): the derived
    constraint must NOT descend through the Window — all files kept,
    results exact."""
    full = engine.table(ptab).inputFiles()
    sql = (
        "SELECT w.rn, w.o_orderkey FROM "
        "(SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn "
        " FROM pt) w JOIN dimt ON w.o_orderkey = dimt.k"
    )
    df = engine.sql(sql)
    assert len(_pt_files(df)) == len(full)
    assert _rows(df) == _rows(_unpruned(engine, sql))


def test_dynamic_pruning_random_dim_windows(engine, ptab):
    """Soundness sweep: random dim key windows (including empty and
    out-of-range) always produce pruned results identical to the
    unpruned scan."""
    import random

    rnd = random.Random(99)
    for i in range(5):
        lo = rnd.randint(-100, 7000)
        hi = lo + rnd.choice([0, 37, 500, 3000])
        engine.execute(
            f"CREATE TABLE rdim_{i} AS SELECT o_orderkey AS k FROM orders "
            f"WHERE o_orderkey BETWEEN {lo} AND {hi}"
        )
        try:
            sql = (
                "SELECT count(*) AS n, sum(pt.o_totalprice) AS s "
                f"FROM pt JOIN rdim_{i} ON pt.o_orderkey = rdim_{i}.k"
            )
            assert _rows(engine.sql(sql)) == _rows(_unpruned(engine, sql)), (
                lo,
                hi,
            )
        finally:
            engine.execute(f"DROP TABLE rdim_{i}")


def test_view_over_manifest_table_prunes(engine, ptab):
    """A probe through a CREATE VIEW over the manifest table prunes
    exactly like the direct probe (r8 verdict Wrong #1: the text gate
    used to miss views entirely), including a view-on-view chain — and
    the view keeps working, full-file, afterwards."""
    full = engine.table(ptab).inputFiles()
    engine.execute(
        "CREATE VIEW vpt AS SELECT o_orderkey AS k, o_totalprice AS p FROM pt"
    )
    engine.execute("CREATE VIEW vvpt AS SELECT k, p FROM vpt WHERE p > 0")
    try:
        for probe in (
            "SELECT sum(p) AS s, count(*) AS n FROM vpt WHERE k >= 600 AND k < 900",
            "SELECT sum(p) AS s, count(*) AS n FROM vvpt WHERE k >= 600 AND k < 900",
        ):
            df = engine.sql(probe)
            assert len(_pt_files(df)) < len(full), probe
            assert _rows(df) == _rows(_unpruned(engine, probe)), probe
        # restored: an unfiltered view read sees every file again
        assert len(_pt_files(engine.sql("SELECT * FROM vpt"))) == len(full)
    finally:
        engine.execute("DROP VIEW vvpt")
        engine.execute("DROP VIEW vpt")


def test_plan_cache_hits_and_invalidates(engine, ptab):
    """The all-manifest plan cache: a repeated probe returns the SAME
    lazy DataFrame (no re-planning), any commit invalidates via the
    version in the key, config flips key separately, and a query
    touching a non-manifest leaf (a registered VALUES view) is never
    cached."""
    sql = "SELECT count(*) AS n FROM pt WHERE o_orderkey >= 600 AND o_orderkey < 900"
    d1 = engine.sql(sql)
    d2 = engine.sql(sql)
    assert d2 is d1  # cache hit: identical lazy plan object
    assert d1.first().n == _unpruned(engine, sql).first().n

    # DML bumps the version -> fresh plan, fresh (correct) result
    n_before = d1.first().n
    engine.execute(
        "INSERT INTO pt SELECT o_orderkey + 700, o_custkey, o_totalprice, "
        "o_orderdate, o_orderpriority FROM orders WHERE o_orderkey < 10"
    )
    d3 = engine.sql(sql)
    assert d3 is not d1
    assert d3.first().n > n_before

    # a VALUES-backed temp view in the plan blocks caching (its data is
    # frozen at lowering; the key cannot pin it)
    engine.catalog.register(
        "vals", engine.spark.createDataFrame([(600,), (601,)], "k long")
    )
    try:
        jsql = "SELECT count(*) AS n FROM pt JOIN vals ON pt.o_orderkey = vals.k"
        j1 = engine.sql(jsql)
        j2 = engine.sql(jsql)
        assert j2 is not j1
        assert j1.first().n == _unpruned(engine, jsql).first().n
    finally:
        engine.catalog.tables.pop("vals", None)


def test_dynamic_set_pruning_beats_straddling_range(engine, ptab):
    """A SPARSE dim key set (two extreme keys) spans nearly the whole
    fact key range — range-only pruning keeps everything, but the
    exact-value set (collected when the dim has few distinct keys)
    prunes every file whose [min, max] contains neither key."""
    full = engine.table(ptab).inputFiles()
    # two keys from the first and last o_orderkey slice: the RANGE
    # [k_lo, k_hi] overlaps all three commits, the SET hits two
    k_lo = engine.sql("SELECT min(o_orderkey) AS k FROM pt").first().k
    k_hi = engine.sql("SELECT max(o_orderkey) AS k FROM pt").first().k
    engine.execute(
        f"CREATE TABLE sparse_dim AS SELECT * FROM "
        f"(VALUES ({k_lo}), ({k_hi})) AS t(k)"
    )
    try:
        sql = (
            "SELECT count(*) AS n, sum(pt.o_totalprice) AS s "
            "FROM pt JOIN sparse_dim ON pt.o_orderkey = sparse_dim.k"
        )
        df = engine.sql(sql)
        kept = _pt_files(df)
        # middle slice (o_orderkey 500..999) contains neither key
        assert len(kept) < len(full)
        assert _rows(df) == _rows(_unpruned(engine, sql))
    finally:
        engine.execute("DROP TABLE sparse_dim")


def test_dynamic_pruning_timestamp_key(engine):
    """Dynamic file pruning on a TIMESTAMP join key (r9): bounds are
    derived JVM-side as unix_micros and rebuilt as UTC datetimes, so
    the driver's local zone can never mis-zone them (the reason r9
    originally excluded timestamp keys). Fact committed in disjoint
    time slices; dim keys come from DATA (no literals for Catalyst's
    static constraint inference to find)."""
    sel = (
        "SELECT o_orderkey AS k, CAST(o_orderdate AS TIMESTAMP) AS ts, "
        "o_totalprice AS p FROM orders "
    )
    engine.execute(
        f"CREATE TABLE tsf AS {sel} WHERE o_orderdate < DATE '1994-01-01'"
    )
    engine.execute("ALTER TABLE tsf SET FORMAT MANIFEST")
    engine.execute(
        f"INSERT INTO tsf {sel} WHERE o_orderdate >= DATE '1994-01-01' "
        "AND o_orderdate < DATE '1996-01-01'"
    )
    engine.execute(
        f"INSERT INTO tsf {sel} WHERE o_orderdate >= DATE '1996-01-01'"
    )
    engine.execute(
        "CREATE TABLE tsd AS SELECT DISTINCT "
        "CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders "
        "WHERE o_orderdate >= DATE '1997-06-01' LIMIT 20"
    )
    try:
        full = engine.table("tsf").inputFiles()
        sql = (
            "SELECT count(*) AS n, sum(tsf.p) AS s "
            "FROM tsf JOIN tsd ON tsf.ts = tsd.ts"
        )
        df = engine.sql(sql)
        assert len(_pt_files(df)) < len(full)
        assert _rows(df) == _rows(_unpruned(engine, sql))
        # derived values are cached like any other key type
        df2 = engine.sql(sql)
        assert len(_pt_files(df2)) == len(_pt_files(df))
    finally:
        engine.execute("DROP TABLE tsd")
        engine.execute("DROP TABLE tsf")


def test_explain_files_reports_skipping(engine, ptab):
    """EXPLAIN FILES: per-manifest-table kept/total counts matching
    what the real pruned run scans, with no side effects on the
    registered views."""
    full = len(engine.table(ptab).inputFiles())
    sql = (
        "SELECT sum(o_totalprice) AS s FROM pt "
        "WHERE o_orderkey >= 600 AND o_orderkey < 900"
    )
    rows = engine.execute(f"EXPLAIN FILES {sql}")
    assert len(rows) == 1 and rows[0]["table"] == "pt"
    assert rows[0]["total_files"] == full
    kept_real = len(engine.sql(sql).inputFiles())
    assert rows[0]["kept_files"] == kept_real < full
    assert rows[0]["skipped_pct"] > 0
    # no side effects: the full view is still bound
    assert len(engine.table(ptab).inputFiles()) == full
    # an unprunable shape reports kept == total, not an error
    rows2 = engine.execute(
        "EXPLAIN FILES SELECT sum(o_totalprice) AS s FROM pt"
    )
    assert rows2[0]["kept_files"] == rows2[0]["total_files"] == full


def test_ctas_cluster_by_skips_from_birth(engine):
    """CREATE TABLE ... CLUSTER BY (k) AS: the very first manifest
    version's files carry tight disjoint ranges, so a range probe
    prunes immediately — no OPTIMIZE pass needed."""
    engine.execute(
        "CREATE TABLE cb CLUSTER BY (o_orderkey) AS "
        "SELECT o_orderkey, o_totalprice FROM orders"
    )
    engine.execute("ALTER TABLE cb SET FORMAT MANIFEST")
    try:
        full = len(engine.table("cb").inputFiles())
        if full > 1:
            rows = engine.execute(
                "EXPLAIN FILES SELECT sum(o_totalprice) AS s FROM cb "
                "WHERE o_orderkey BETWEEN 10 AND 60"
            )
            assert rows[0]["kept_files"] < rows[0]["total_files"]
        sql = (
            "SELECT sum(o_totalprice) AS s, count(*) AS n FROM cb "
            "WHERE o_orderkey BETWEEN 10 AND 60"
        )
        assert _rows(engine.sql(sql)) == _rows(_unpruned(engine, sql))
        import pytest as _pytest

        with _pytest.raises(ValueError, match="CLUSTER BY"):
            engine.execute(
                "CREATE TABLE cb2 CLUSTER BY (nope) AS SELECT 1 AS a"
            )
    finally:
        engine.execute("DROP TABLE cb")


def test_dynamic_pruning_same_named_dim_columns(engine, ptab):
    """One dim subtree whose output carries TWO columns named `k`
    (a join of two tables that both expose `k`): the derived-bounds
    cache must key on the attribute's OUTPUT POSITION, not its name —
    otherwise the second key silently reuses the first key's
    [min,max]/IN-set and over-prunes fact files (dropped rows)."""
    engine.execute(
        "CREATE TABLE ddup_a AS SELECT o_orderkey AS j, o_orderkey AS k "
        "FROM orders WHERE o_orderkey BETWEEN 1200 AND 1300"
    )
    engine.execute(
        "CREATE TABLE ddup_b AS SELECT o_orderkey AS j, o_custkey AS k "
        "FROM orders WHERE o_orderkey BETWEEN 1200 AND 1300"
    )
    try:
        sql = (
            "SELECT count(*) AS n, sum(pt.o_totalprice) AS s "
            "FROM (ddup_a JOIN ddup_b ON ddup_a.j = ddup_b.j) "
            "JOIN pt ON pt.o_orderkey = ddup_a.k "
            "AND pt.o_custkey = ddup_b.k"
        )
        got = _rows(engine.sql(sql))
        assert got == _rows(_unpruned(engine, sql))
        # both same-named keys derived their OWN bounds (two cache
        # entries, distinguished by output position)
        names_k = [
            key
            for key in engine._dyn_prune_cache
            if key[1] == "k"
        ]
        assert len(names_k) == 2
        assert len({key[2] for key in names_k}) == 2  # distinct positions
    finally:
        engine.execute("DROP TABLE ddup_a")
        engine.execute("DROP TABLE ddup_b")
