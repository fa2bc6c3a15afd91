"""CREATE TABLE t FROM DELTA '<dir>' — importing an external Delta
Lake table by replaying its public `_delta_log` commit protocol
(hand-authored fixtures; no delta-spark dependency). Invariants:

- the live-file set after add/remove replay round-trips bit-identically
  (hard links, no copies);
- DML works atop the import and never touches the source table;
- commit-time stats make skipping live immediately;
- checkpointed logs replay (single- and multi-part checkpoints +
  later commits), streamed per Arrow batch;
- partitioned tables import zero-copy: partitionValues from the log
  become virtual columns (bit-identical vs DuckDB hive_partitioning,
  prunable, DML-safe);
- deletion vectors materialize under the explicit opt-in (only the
  DV-carrying files are rewritten) and refuse without it;
- column mapping and path-escape adds refuse loudly."""

from __future__ import annotations

import json
import os

import pytest

from sclera_spark.engine import ScleraEngine
from sclera_spark.sources.manifest import ManifestTable


@pytest.fixture()
def engine(spark, tables):
    return ScleraEngine(spark)


def _write_part(spark, d, name, lo, hi):
    """One parquet file holding k in [lo, hi) — written via Spark so
    footers look exactly like production files."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp()
    (
        spark.range(lo, hi)
        .selectExpr("id AS k", "CAST(id AS DOUBLE) * 1.5 AS v")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(scratch)
    )
    part = next(
        f
        for f in os.listdir(scratch)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.makedirs(d, exist_ok=True)
    shutil.copyfile(os.path.join(scratch, part), os.path.join(d, name))
    shutil.rmtree(scratch)


def _meta_action(part_cols=None, conf=None):
    return {
        "metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {
                    "type": "struct",
                    "fields": [
                        {"name": "k", "type": "long", "nullable": True,
                         "metadata": {}},
                        {"name": "v", "type": "double", "nullable": True,
                         "metadata": {}},
                    ],
                }
            ),
            "partitionColumns": part_cols or [],
            "configuration": conf or {},
        }
    }


def _commit(log_dir, version, actions):
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _mk_delta(spark, root):
    """Three commits: add f1+f2; add f3; remove f2 → live = {f1, f3}."""
    d = str(root / "dtab")
    log = os.path.join(d, "_delta_log")
    _write_part(spark, d, "f1.parquet", 0, 100)
    _write_part(spark, d, "f2.parquet", 100, 200)
    _write_part(spark, d, "f3.parquet", 200, 300)
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(),
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
        {"add": {"path": "f2.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    _commit(log, 1, [
        {"add": {"path": "f3.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
        {"commitInfo": {"operation": "WRITE"}},
    ])
    _commit(log, 2, [
        {"remove": {"path": "f2.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
    ])
    return d


def test_delta_import_replays_add_remove(engine, spark, tmp_path):
    d = _mk_delta(spark, tmp_path)
    engine.execute(f"CREATE TABLE dt FROM DELTA '{d}'")
    try:
        got = sorted(
            tuple(r) for r in engine.sql("SELECT k, v FROM dt").collect()
        )
        want = sorted(
            tuple(r)
            for r in spark.read.parquet(
                os.path.join(d, "f1.parquet"), os.path.join(d, "f3.parquet")
            ).collect()
        )
        assert got == want and len(got) == 200  # f2's rows are NOT there
        # hard links, not copies: same inode
        mt = engine.ddl()._manifest("dt")
        src_ino = os.stat(os.path.join(d, "f1.parquet")).st_ino
        linked = [p for p in mt.files() if "f1.parquet" in p]
        assert linked and os.stat(linked[0]).st_ino == src_ino
        # skipping is live immediately (commit-time stats)
        probe = engine.sql("SELECT sum(v) AS s FROM dt WHERE k < 50")
        kept = [f for f in probe.inputFiles() if "/data/" in f]
        assert len(kept) == 1
        # DML atop the import; the source table is untouched
        engine.execute("DELETE FROM dt WHERE k < 10")
        assert engine.table("dt").count() == 190
        assert spark.read.parquet(
            os.path.join(d, "f1.parquet")
        ).count() == 100
        assert os.path.isfile(
            os.path.join(d, "_delta_log", f"{0:020d}.json")
        )
    finally:
        engine.execute("DROP TABLE dt")


def test_delta_import_checkpoint_plus_commits(spark, tmp_path):
    """A single-part parquet checkpoint names the base state; only
    LATER json commits replay on top."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "ck")
    log = os.path.join(d, "_delta_log")
    _write_part(spark, d, "f1.parquet", 0, 50)
    _write_part(spark, d, "f2.parquet", 50, 100)
    os.makedirs(log, exist_ok=True)
    # checkpoint at version 5: live = {f1}
    add_t = pa.struct(
        [("path", pa.string()), ("deletionVector", pa.string())]
    )
    rem_t = pa.struct([("path", pa.string())])
    md_t = pa.struct([("id", pa.string()), ("schemaString", pa.string())])
    tbl = pa.table(
        {
            "add": pa.array(
                [{"path": "f1.parquet", "deletionVector": None}, None, None],
                type=add_t,
            ),
            "remove": pa.array([None, None, None], type=rem_t),
            "metaData": pa.array(
                [None, None, {"id": "x", "schemaString": "{}"}], type=md_t
            ),
        }
    )
    pq.write_table(tbl, os.path.join(log, f"{5:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 5, "size": 3}, fh)
    # a STALE commit below the checkpoint must be ignored...
    _commit(log, 4, [
        {"add": {"path": "ghost.parquet", "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    # ...and a later commit replays on top
    _commit(log, 6, [
        {"add": {"path": "f2.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    mt = ManifestTable.import_delta(d, str(tmp_path / "out"))
    names = {os.path.basename(p) for p in mt.files()}
    assert names == {"f1.parquet", "f2.parquet"}
    df = spark.read.parquet(*mt.files())
    assert df.count() == 100


def test_delta_import_refusals(spark, tmp_path):
    # deletion vector without the MATERIALIZE opt-in
    d2 = str(tmp_path / "p2")
    _write_part(spark, d2, "f1.parquet", 0, 10)
    _commit(os.path.join(d2, "_delta_log"), 0, [
        _meta_action(),
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True,
                 "deletionVector": {"storageType": "u", "pathOrInlineDv":
                                    "x", "offset": 1, "sizeInBytes": 1,
                                    "cardinality": 1}}},
    ])
    with pytest.raises(ValueError, match="deletion vector"):
        ManifestTable.import_delta(d2, str(tmp_path / "o2"))
    # column mapping
    d3 = str(tmp_path / "p3")
    _write_part(spark, d3, "f1.parquet", 0, 10)
    _commit(os.path.join(d3, "_delta_log"), 0, [
        _meta_action(conf={"delta.columnMapping.mode": "name"}),
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="columnMapping"):
        ManifestTable.import_delta(d3, str(tmp_path / "o3"))
    # object-store absolute path
    d4 = str(tmp_path / "p4")
    os.makedirs(d4, exist_ok=True)
    _commit(os.path.join(d4, "_delta_log"), 0, [
        _meta_action(),
        {"add": {"path": "s3://bucket/f1.parquet", "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="object-store"):
        ManifestTable.import_delta(d4, str(tmp_path / "o4"))
    # all files removed
    d5 = str(tmp_path / "p5")
    os.makedirs(d5, exist_ok=True)
    _commit(os.path.join(d5, "_delta_log"), 0, [_meta_action()])
    with pytest.raises(ValueError, match="zero live files"):
        ManifestTable.import_delta(d5, str(tmp_path / "o5"))
    # not a delta table at all
    with pytest.raises(FileNotFoundError, match="_delta_log"):
        ManifestTable.import_delta(str(tmp_path), str(tmp_path / "o6"))


def test_delta_import_url_encoded_paths(spark, tmp_path):
    """Delta URL-encodes add paths; 'a b.parquet' arrives as
    'a%20b.parquet' and must resolve to the real file."""
    d = str(tmp_path / "enc")
    _write_part(spark, d, "a b.parquet", 0, 7)
    _commit(os.path.join(d, "_delta_log"), 0, [
        _meta_action(),
        {"add": {"path": "a%20b.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    mt = ManifestTable.import_delta(d, str(tmp_path / "oenc"))
    assert spark.read.parquet(*mt.files()).count() == 7


def test_delta_import_rejects_path_escape(spark, tmp_path):
    """An add action with an absolute filesystem path or a ../
    traversal (SHALLOW CLONE / CONVERT can emit absolutes) must refuse
    — never hard-link a file the untrusted log names outside the table
    directory."""
    victim = str(tmp_path / "secret.parquet")
    _write_part(spark, str(tmp_path), "secret.parquet", 0, 3)
    d = str(tmp_path / "esc")
    _write_part(spark, d, "ok.parquet", 0, 5)
    for bad in (victim, "../secret.parquet", "a/../../secret.parquet"):
        log = os.path.join(d, "_delta_log")
        _commit(log, 0, [
            _meta_action(),
            {"add": {"path": bad, "size": 1, "modificationTime": 0,
                     "dataChange": True}},
        ])
        with pytest.raises(ValueError, match="absolute|escape"):
            ManifestTable.import_delta(d, str(tmp_path / "oesc"))
        os.remove(os.path.join(log, f"{0:020d}.json"))


def _mk_partitioned_delta(spark, root, name="ptab"):
    """2-level-partitioned fixture: c in {1,2} x dt in {'a','b'}, one
    file per partition, partitionValues in the log (public layout)."""
    d = str(root / name)
    log = os.path.join(d, "_delta_log")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "c", "type": "long", "nullable": True, "metadata": {}},
            {"name": "dt", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }
    meta = {
        "metaData": {
            "id": "p",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["c", "dt"],
            "configuration": {},
        }
    }
    adds = []
    i = 0
    for c in (1, 2):
        for dt in ("a", "b"):
            sub = f"c={c}/dt={dt}"
            _write_part(spark, os.path.join(d, sub), "f.parquet",
                        i * 10, i * 10 + 10)
            adds.append({
                "add": {"path": f"{sub}/f.parquet", "size": 1,
                        "modificationTime": 0, "dataChange": True,
                        "partitionValues": {"c": str(c), "dt": dt}}})
            i += 1
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        meta, *adds,
    ])
    return d


def test_delta_import_partitioned(engine, spark, tmp_path):
    """Partitioned import, the production-real case: zero-copy, scans
    bit-identical vs DuckDB reading the same files hive-partitioned,
    EXPLAIN FILES shows partition-key pruning, DML COW-rewrites only
    the hit file, and restructuring a virtual partition column
    refuses."""
    import duckdb

    d = _mk_partitioned_delta(spark, tmp_path)
    engine.execute(f"CREATE TABLE ptd FROM DELTA '{d}'")
    try:
        got = sorted(
            tuple(r)
            for r in engine.sql("SELECT k, v, c, dt FROM ptd").collect()
        )
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                "SELECT k, v, CAST(c AS BIGINT), CAST(dt AS VARCHAR) "
                f"FROM read_parquet('{d}/*/*/*.parquet', "
                "hive_partitioning=true)"
            ).fetchall()
        )
        assert got == want and len(got) == 40
        # zero-copy: imported files are hard links to the source
        mt = engine.ddl()._manifest("ptd")
        src = os.path.join(d, "c=1", "dt=a", "f.parquet")
        assert any(
            os.path.exists(p) and os.stat(p).st_ino == os.stat(src).st_ino
            for p in mt.files()
        )
        # partition-key pruning through the SQL path (EXPLAIN FILES)
        rep = engine.execute("EXPLAIN FILES SELECT * FROM ptd WHERE c = 1")
        assert rep[0]["kept_files"] == 2 and rep[0]["total_files"] == 4
        rep = engine.execute(
            "EXPLAIN FILES SELECT * FROM ptd WHERE c = 1 AND dt = 'b'"
        )
        assert rep[0]["kept_files"] == 1
        # DML: COW rewrites exactly the hit file; the survivors stay
        # hard-linked and the partition values survive the rewrite
        before = set(os.path.basename(p) for p in mt.files())
        engine.execute("DELETE FROM ptd WHERE c = 1 AND dt = 'a' AND k < 5")
        after = set(os.path.basename(p) for p in mt.files())
        assert len(before & after) == 3 and len(after) == 4
        assert sorted(
            tuple(r)
            for r in engine.sql(
                "SELECT c, dt, count(*) AS n FROM ptd GROUP BY c, dt"
            ).collect()
        ) == [(1, "a", 5), (1, "b", 10), (2, "a", 10), (2, "b", 10)]
        # UPDATE through the fill: rewritten rows keep partition cols
        engine.execute("UPDATE ptd SET v = -1 WHERE dt = 'b' AND k = 30")
        assert engine.sql(
            "SELECT v, c, dt FROM ptd WHERE k = 30"
        ).collect()[0][0:3] == (-1.0, 2, "b")
        # MERGE through the fill (late r12: the probe's file column is
        # materialized inside read(), where _metadata still resolves):
        # matched row updates, NOT MATCHED row inserts with physical
        # partition columns
        engine.execute(
            "MERGE INTO ptd t USING (SELECT 31 AS k, -2.0 AS nv, "
            "9 AS c, 'z' AS dt UNION ALL SELECT 999, -3.0, 9, 'z') s "
            "ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.nv "
            "WHEN NOT MATCHED THEN INSERT (k, v, c, dt) "
            "VALUES (s.k, s.nv, s.c, s.dt)"
        )
        # the matched row kept its VIRTUAL partition values
        assert engine.sql(
            "SELECT v, c, dt FROM ptd WHERE k = 31"
        ).collect()[0][0:3] == (-2.0, 2, "b")
        assert engine.sql(
            "SELECT v, c, dt FROM ptd WHERE k = 999"
        ).collect()[0][0:3] == (-3.0, 9, "z")
        # a virtual partition column cannot be renamed/dropped/retyped
        for stmt in (
            "ALTER TABLE ptd RENAME COLUMN dt TO dt2",
            "ALTER TABLE ptd DROP COLUMN c",
        ):
            with pytest.raises(Exception, match="partition column"):
                engine.execute(stmt)
    finally:
        engine.execute("DROP TABLE ptd")


def test_delta_import_partitioned_null_and_timetravel(engine, spark,
                                                      tmp_path):
    """A NULL partition value (JSON null in partitionValues) reads as
    NULL, IS NULL / IS NOT NULL prune on it, and time travel to the
    import version still fills the columns (meta rides the version)."""
    d = str(tmp_path / "np")
    log = os.path.join(d, "_delta_log")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "g", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }
    _write_part(spark, os.path.join(d, "g=x"), "f1.parquet", 0, 5)
    _write_part(spark, os.path.join(d, "g=__HIVE_DEFAULT_PARTITION__"),
                "f2.parquet", 5, 9)
    _commit(log, 0, [
        {"metaData": {"id": "n", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["g"], "configuration": {}}},
        {"add": {"path": "g=x/f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True, "partitionValues": {"g": "x"}}},
        {"add": {"path": "g=__HIVE_DEFAULT_PARTITION__/f2.parquet",
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "partitionValues": {"g": None}}},
    ])
    engine.execute(f"CREATE TABLE npt FROM DELTA '{d}'")
    try:
        assert engine.sql(
            "SELECT count(*) AS n FROM npt WHERE g IS NULL"
        ).collect()[0][0] == 4
        mt = engine.ddl()._manifest("npt")
        assert len(mt.files_pruned({}, nulls={"g": "null"})) == 1
        assert len(mt.files_pruned({}, nulls={"g": "notnull"})) == 1
        assert len(mt.files_pruned({"g": ("x", "x")})) == 1
        # the NULL-partition file fails every comparison probe
        kept = mt.files_pruned({"g": ("y", "y")})
        assert all("f2" not in p for p in kept)
    finally:
        engine.execute("DROP TABLE npt")


def test_delta_import_multipart_checkpoint(spark, tmp_path):
    """A multi-part checkpoint ({v:020d}.checkpoint.{i:010d}.{n:010d}
    .parquet) replays across all parts, streamed per batch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "mp")
    log = os.path.join(d, "_delta_log")
    for i in (1, 2, 3):
        _write_part(spark, d, f"f{i}.parquet", i * 10, i * 10 + 10)
    os.makedirs(log, exist_ok=True)
    add_t = pa.struct(
        [("path", pa.string()), ("deletionVector", pa.string())]
    )
    md_t = pa.struct([("id", pa.string()), ("schemaString", pa.string())])

    def part(rows_add, md=None):
        return pa.table({
            "add": pa.array(rows_add, type=add_t),
            "metaData": pa.array(
                [md] + [None] * (len(rows_add) - 1) if md
                else [None] * len(rows_add),
                type=md_t,
            ),
        })

    parts = [
        part([{"path": "f1.parquet", "deletionVector": None}],
             {"id": "m", "schemaString": "{}"}),
        part([{"path": "f2.parquet", "deletionVector": None},
              {"path": "ghost.parquet", "deletionVector": None}]),
        part([{"path": "f3.parquet", "deletionVector": None}]),
    ]
    for i, tbl in enumerate(parts, start=1):
        pq.write_table(tbl, os.path.join(
            log, f"{4:020d}.checkpoint.{i:010d}.{3:010d}.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 4, "size": 4, "parts": 3}, fh)
    # later commit removes the ghost the checkpoint added
    _commit(log, 5, [
        {"remove": {"path": "ghost.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
    ])
    mt = ManifestTable.import_delta(d, str(tmp_path / "omp"))
    names = {os.path.basename(p) for p in mt.files()}
    assert names == {"f1.parquet", "f2.parquet", "f3.parquet"}
    assert spark.read.parquet(*mt.files()).count() == 30


def test_delta_import_materialize_deletion_vectors(engine, spark,
                                                   tmp_path):
    """MATERIALIZE DELETION VECTORS: a hand-authored DV fixture (public
    on-disk roaring format + an inline Z85 descriptor) imports with
    exact row parity vs the DV-aware row set; un-DV'd files hard-link,
    DV'd files are purged rewrites."""
    from sclera_spark.sources.deletion_vectors import (
        serialize_bitmap_array,
        write_dv_file,
        z85_encode,
    )

    d = str(tmp_path / "dvt")
    log = os.path.join(d, "_delta_log")
    _write_part(spark, d, "f1.parquet", 0, 20)    # DV drops rows 0,3,7
    _write_part(spark, d, "f2.parquet", 20, 40)   # clean
    _write_part(spark, d, "f3.parquet", 40, 50)   # inline DV drops 9
    desc1 = write_dv_file(os.path.join(d, "dv1.bin"), [0, 3, 7])
    bm = serialize_bitmap_array([9])
    pad = (-len(bm)) % 4
    desc3 = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(bm + b"\x00" * pad),
        "sizeInBytes": len(bm),
        "cardinality": 1,
    }
    _commit(log, 0, [
        _meta_action(),
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True, "deletionVector": desc1}},
        {"add": {"path": "f2.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
        {"add": {"path": "f3.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True, "deletionVector": desc3}},
    ])
    engine.execute(
        f"CREATE TABLE dvt FROM DELTA '{d}' MATERIALIZE DELETION VECTORS"
    )
    try:
        got = sorted(
            r[0] for r in engine.sql("SELECT k FROM dvt").collect()
        )
        masked = {0, 3, 7, 49}  # row 9 of f3 holds k=49
        assert got == sorted(set(range(50)) - masked)
        # clean file hard-linked; DV'd files rewritten (new inode)
        mt = engine.ddl()._manifest("dvt")
        by_name = {os.path.basename(p): p for p in mt.files()}
        assert os.stat(by_name["f2.parquet"]).st_ino == os.stat(
            os.path.join(d, "f2.parquet")
        ).st_ino
        f1_new = next(p for n, p in by_name.items() if "00000" in n or
                      n.startswith("purged"))
        assert os.stat(f1_new).st_ino != os.stat(
            os.path.join(d, "f1.parquet")
        ).st_ino
    finally:
        engine.execute("DROP TABLE dvt")


# -------------------- r11: GENERATE DELTA LOG (the write half)


def test_delta_export_round_trips_through_import(engine, spark, tmp_path):
    """GENERATE DELTA LOG emits a public _delta_log our own
    independently-tested importer replays bit-identically: contents
    equal, files hard-link (zero copy), and the exported per-file
    stats give the re-import metadata-only row counts and file
    skipping from birth."""
    from sclera_spark.sources.manifest import ManifestTable

    src = str(tmp_path / "exp")
    ManifestTable.create(
        spark.range(0, 100)
        .selectExpr("id AS k", "CAST(id AS DOUBLE)/4 AS v")
        .repartition(4),
        src,
    )
    mt = ManifestTable(src)
    mt.append(spark.range(100, 120).selectExpr(
        "id AS k", "CAST(id AS DOUBLE)/4 AS v"
    ))
    commit_file = mt.export_delta_log(spark)
    assert os.path.basename(commit_file) == f"{0:020d}.json"
    with open(commit_file) as fh:
        actions = [json.loads(ln) for ln in fh if ln.strip()]
    assert actions[0]["protocol"]["minReaderVersion"] == 1
    assert json.loads(actions[1]["metaData"]["schemaString"])["type"] == "struct"
    adds = [a["add"] for a in actions if "add" in a]
    assert len(adds) == len(mt.files())
    st = json.loads(adds[0]["stats"])
    assert set(st) == {"numRecords", "minValues", "maxValues", "nullCount"}

    dest = str(tmp_path / "reimported")
    mt2 = ManifestTable.import_delta(src, dest)
    got = sorted((r.k, r.v) for r in mt2.read(spark).collect())
    want = sorted((r.k, r.v) for r in mt.read(spark).collect())
    assert got == want
    # zero-copy + skipping metadata live from birth
    assert os.stat(mt2.files()[0]).st_nlink >= 2
    assert mt2.row_count() == 120
    assert len(mt2.files_pruned({"k": (115, None)})) < len(mt2.files())


def test_delta_export_partitioned_import_round_trips(engine, spark, tmp_path):
    """A partitioned Delta import re-exports its virtual partition
    columns as partitionValues (where the public log carries them) and
    partitionColumns in metaData — import of the export preserves the
    columns and their per-file prunability."""
    from sclera_spark.sources.manifest import ManifestTable

    d = _mk_partitioned_delta(spark, tmp_path, name="ptab_exp")
    first = str(tmp_path / "first_import")
    mt = ManifestTable.import_delta(d, first)
    commit_file = mt.export_delta_log(spark)
    with open(commit_file) as fh:
        actions = [json.loads(ln) for ln in fh if ln.strip()]
    assert actions[1]["metaData"]["partitionColumns"] == ["c", "dt"]
    adds = [a["add"] for a in actions if "add" in a]
    assert all(set(a["partitionValues"]) == {"c", "dt"} for a in adds)

    second = str(tmp_path / "second_import")
    mt2 = ManifestTable.import_delta(first, second)
    got = sorted(
        tuple(r) for r in mt2.read(spark).select("k", "v", "c", "dt").collect()
    )
    want = sorted(
        tuple(r) for r in mt.read(spark).select("k", "v", "c", "dt").collect()
    )
    assert got == want
    # partition predicates prune files on the re-import too
    assert len(mt2.files_pruned({"c": (2, 2)})) == 2


def test_delta_export_import_round_trips_column_mapping(
    engine, spark, tmp_path
):
    """r11: an EVOLVED table (rename + drop + add) exports the public
    columnMapping.mode=name form — physicalName/id metadata in the
    schemaString, protocol 2/5 — and the importer translates it back
    to native column mapping: logical contents round-trip, the dropped
    column's leftover physical bytes become a tombstone reservation,
    and re-adding its logical name reads NULL (never the dead bytes)."""
    from sclera_spark.sources.manifest import ManifestTable

    engine.execute(
        "CREATE TABLE dexp AS SELECT CAST(o_orderkey AS INT) AS a, "
        "o_totalprice AS b, o_orderpriority AS dead "
        "FROM orders WHERE o_orderkey < 200"
    )
    engine.execute("ALTER TABLE dexp SET FORMAT MANIFEST")
    engine.execute("ALTER TABLE dexp RENAME COLUMN a TO a2")
    engine.execute("ALTER TABLE dexp DROP COLUMN dead")
    engine.execute("INSERT INTO dexp VALUES (9001, 1.5)")
    want = sorted(
        tuple(r) for r in engine.sql("SELECT a2, b FROM dexp").collect()
    )
    src = engine.ddl()._manifest("dexp").path
    commit_file = engine.execute("GENERATE DELTA LOG FOR dexp")
    with open(commit_file) as fh:
        actions = [json.loads(ln) for ln in fh if ln.strip()]
    assert actions[0]["protocol"] == {
        "minReaderVersion": 2, "minWriterVersion": 5,
    }
    md = actions[1]["metaData"]
    assert md["configuration"]["delta.columnMapping.mode"] == "name"
    fields = json.loads(md["schemaString"])["fields"]
    assert [f["name"] for f in fields] == ["a2", "b"]
    assert all(
        "delta.columnMapping.physicalName" in f["metadata"] for f in fields
    )

    dest = str(tmp_path / "mapped_reimport")
    mt2 = ManifestTable.import_delta(src, dest)
    got = sorted(
        tuple(r) for r in mt2.read(spark).select("a2", "b").collect()
    )
    assert got == want
    # the dropped column's physical name is tombstone-RESERVED: its
    # logical name re-adds under a FRESH physical and reads all-NULL
    mapping = mt2.column_mapping()
    reserved = [e for e in mapping if e.get("dropped")]
    assert reserved, "leftover physical column was not tombstoned"
    from pyspark.sql.types import StringType

    mt2.add_column_mapped("dead", StringType())
    vals = mt2.read(spark).select("dead").distinct().collect()
    assert [r.dead for r in vals] == [None]
    engine.execute("DROP TABLE dexp")


def test_delta_export_refuses_mixed_partition_layout(engine, spark, tmp_path):
    """After DML on a partitioned import, rewritten files carry the
    partition columns physically (no log values) — a Delta log cannot
    describe that mixed layout truthfully, so export refuses."""
    from sclera_spark.sources.manifest import ManifestTable

    d = _mk_partitioned_delta(spark, tmp_path, name="ptab_mix")
    imp = str(tmp_path / "mix_import")
    mt = ManifestTable.import_delta(d, imp)
    # rewrite one partition's file via replace_files (the DML shape)
    victim = [
        p for p in mt.files()
        if "c" not in os.path.basename(p)  # any one file
    ][:1] or [mt.files()[0]]
    mt.replace_files(
        victim, mt.read(spark, file_paths=victim).where("k >= 0")
    )
    with pytest.raises(ValueError, match="mixed layout|physically"):
        mt.export_delta_log(spark)


def test_delta_import_column_mapping_external_fixture(spark, tmp_path):
    """A mapped Delta table as an EXTERNAL writer lays it out: files
    store uuid-ish physical names, the schemaString's field metadata
    carries the logical mapping — import reads logical names/values."""
    import shutil
    import tempfile

    d = str(tmp_path / "cmext")
    scratch = tempfile.mkdtemp()
    (
        spark.range(0, 25)
        .selectExpr(
            "id AS `col-9aa1`", "CAST(id AS DOUBLE) * 2 AS `col-77bc`"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(scratch)
    )
    part = next(
        f for f in os.listdir(scratch)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.makedirs(d, exist_ok=True)
    shutil.copyfile(os.path.join(scratch, part), os.path.join(d, "f1.parquet"))
    shutil.rmtree(scratch)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": "col-9aa1"}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": "col-77bc"}},
        ],
    }
    _commit(os.path.join(d, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "cm", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    mt = ManifestTable.import_delta(d, str(tmp_path / "cm_import"))
    df = mt.read(spark)
    assert df.columns == ["k", "v"]
    rows = sorted((r.k, r.v) for r in df.collect())
    assert rows == [(i, float(i * 2)) for i in range(25)]
    # r12: mode=id imports too — here the footers carry no field ids,
    # but every column IS named by its physicalName, so the binding an
    # id-based reader would compute equals the name-based one
    d2 = str(tmp_path / "cmid")
    os.makedirs(d2, exist_ok=True)
    shutil.copyfile(
        os.path.join(str(tmp_path / "cmext"), "f1.parquet"),
        os.path.join(d2, "f1.parquet"),
    )
    _commit(os.path.join(d2, "_delta_log"), 0, [
        {"metaData": {
            "id": "cm2", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"}}},
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    mt2 = ManifestTable.import_delta(d2, str(tmp_path / "cmid_import"))
    rows2 = sorted((r.k, r.v) for r in mt2.read(spark).collect())
    assert rows2 == [(i, float(i * 2)) for i in range(25)]


def test_delta_import_column_mapping_partitioned(engine, spark, tmp_path):
    """late r12: column mapping COMPOSES with partition columns — the
    log keys partitionColumns and each add's partitionValues by
    PHYSICAL name (Delta protocol), the import translates them to
    logical names so the virtual fill (which runs above the
    physical->logical projection) resolves; scans, partition pruning,
    DML, and MERGE all speak logical names."""
    import shutil
    import tempfile

    d = str(tmp_path / "cmpart")
    os.makedirs(d, exist_ok=True)
    for i, c in enumerate((1, 2)):
        scratch = tempfile.mkdtemp()
        (
            spark.range(i * 10, i * 10 + 10)
            .selectExpr(
                "id AS `col-k`", "CAST(id AS DOUBLE) / 2 AS `col-v`"
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(scratch)
        )
        part = next(
            f for f in os.listdir(scratch)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        shutil.copyfile(
            os.path.join(scratch, part), os.path.join(d, f"f{i}.parquet")
        )
        shutil.rmtree(scratch)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": "col-k"}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": "col-v"}},
            {"name": "c", "type": "long", "nullable": True, "metadata": {
                "delta.columnMapping.id": 3,
                "delta.columnMapping.physicalName": "col-c"}},
        ],
    }
    _commit(os.path.join(d, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "cmp", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["col-c"],
            "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "f0.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True, "partitionValues": {"col-c": "1"}}},
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True, "partitionValues": {"col-c": "2"}}},
    ])
    engine.execute(f"CREATE TABLE cmp FROM DELTA '{d}'")
    try:
        got = sorted(
            tuple(r) for r in engine.sql("SELECT k, v, c FROM cmp").collect()
        )
        assert got == [
            (i, i / 2, 1 if i < 10 else 2) for i in range(20)
        ]
        # partition pruning on the LOGICAL name
        rep = engine.execute("EXPLAIN FILES SELECT * FROM cmp WHERE c = 1")
        assert rep[0]["kept_files"] == 1 and rep[0]["total_files"] == 2
        # export round-trips BEFORE any rewrite (the public log keys
        # partitionColumns/partitionValues by physical name again)
        from sclera_spark.sources.manifest import ManifestTable

        mt = engine.ddl()._manifest("cmp")
        exp = str(tmp_path / "cmp_mirror")
        os.makedirs(os.path.join(exp, "data"), exist_ok=True)
        for p in mt.files():
            shutil.copyfile(
                p, os.path.join(exp, "data", os.path.basename(p))
            )
        mt.export_delta_log(spark, os.path.join(exp, "_delta_log"))
        with open(
            os.path.join(exp, "_delta_log", f"{0:020d}.json")
        ) as fh:
            acts = [json.loads(ln) for ln in fh if ln.strip()]
        md = next(a["metaData"] for a in acts if "metaData" in a)
        assert md["partitionColumns"] == ["col-c"]
        pvs = sorted(
            tuple(sorted(a["add"]["partitionValues"].items()))
            for a in acts
            if "add" in a
        )
        assert pvs == [(("col-c", "1"),), (("col-c", "2"),)]
        mt2 = ManifestTable.import_delta(exp, str(tmp_path / "cmp_back"))
        back = sorted(
            (r.k, r.v, r.c) for r in mt2.read(spark).collect()
        )
        assert back == [
            (i, i / 2, 1 if i < 10 else 2) for i in range(20)
        ]
        # DML through fill + mapping: the rewritten file carries both
        # the data and partition columns physically (physical names)
        engine.execute("UPDATE cmp SET v = -1 WHERE k = 5")
        assert engine.sql(
            "SELECT v, c FROM cmp WHERE k = 5"
        ).collect()[0][0:2] == (-1.0, 1)
        # MERGE: matched keeps its virtual value, insert goes physical
        engine.execute(
            "MERGE INTO cmp t USING "
            "(SELECT 15 AS k, -2.0 AS nv, 5 AS c "
            "UNION ALL SELECT 99, -3.0, 9) s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.nv "
            "WHEN NOT MATCHED THEN INSERT (k, v, c) VALUES (s.k, s.nv, s.c)"
        )
        assert engine.sql(
            "SELECT v, c FROM cmp WHERE k = 15"
        ).collect()[0][0:2] == (-2.0, 2)
        assert engine.sql(
            "SELECT v, c FROM cmp WHERE k = 99"
        ).collect()[0][0:2] == (-3.0, 9)
    finally:
        engine.execute("DROP TABLE cmp")


def test_delta_import_column_mapping_nested_fields(spark, tmp_path):
    """Tables CREATED with columnMapping enabled assign col-<uuid>
    physical names to NESTED struct/array-element fields too (the
    Delta protocol mapping covers every field, not just top-level).
    The import must surface the logical nested names with the file's
    data — a name-only top-level translation would silently read the
    inner fields as NULL (r11 ADVICE, manifest.py nested mapping)."""
    import shutil
    import tempfile

    d = str(tmp_path / "cmnest")
    scratch = tempfile.mkdtemp()
    (
        spark.range(0, 20)
        .selectExpr(
            "named_struct('col-ax', id, 'col-by', CAST(id AS STRING))"
            " AS `col-top`",
            "array(named_struct('col-el', id * 10)) AS `col-arr`",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(scratch)
    )
    part = next(
        f for f in os.listdir(scratch)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.makedirs(d, exist_ok=True)
    shutil.copyfile(os.path.join(scratch, part), os.path.join(d, "f1.parquet"))
    shutil.rmtree(scratch)

    def _mapped(name, phys, typ, fid):
        return {
            "name": name, "type": typ, "nullable": True,
            "metadata": {
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": phys,
            },
        }

    schema = {
        "type": "struct",
        "fields": [
            _mapped("s", "col-top", {
                "type": "struct",
                "fields": [
                    _mapped("x", "col-ax", "long", 3),
                    _mapped("y", "col-by", "string", 4),
                ],
            }, 1),
            _mapped("items", "col-arr", {
                "type": "array",
                "elementType": {
                    "type": "struct",
                    "fields": [_mapped("val", "col-el", "long", 5)],
                },
                "containsNull": True,
            }, 2),
        ],
    }
    _commit(os.path.join(d, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "cmn", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    mt = ManifestTable.import_delta(d, str(tmp_path / "cmn_import"))
    df = mt.read(spark)
    assert df.columns == ["s", "items"]
    assert [f.name for f in df.schema["s"].dataType.fields] == ["x", "y"]
    assert (
        df.schema["items"].dataType.elementType.fields[0].name == "val"
    )
    rows = sorted(
        (r.s.x, r.s.y, r.items[0].val) for r in df.collect()
    )
    assert rows == [(i, str(i), i * 10) for i in range(20)]
    # a nested field with an id but NO physicalName is a malformed
    # log — loud refusal, never a silent NULL read
    bad = json.loads(json.dumps(schema))
    del bad["fields"][0]["type"]["fields"][0]["metadata"][
        "delta.columnMapping.physicalName"
    ]
    d2 = str(tmp_path / "cmnest_bad")
    os.makedirs(d2, exist_ok=True)
    shutil.copyfile(os.path.join(d, "f1.parquet"),
                    os.path.join(d2, "f1.parquet"))
    _commit(os.path.join(d2, "_delta_log"), 0, [
        {"metaData": {
            "id": "cmn2", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(bad), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="nested field .* no physicalName"):
        ManifestTable.import_delta(d2, str(tmp_path / "cmn2_import"))


def test_delta_export_is_incremental(engine, spark, tmp_path):
    """Re-exports append DIFF commits (stable metaData id, removes +
    adds only), an unchanged table appends nothing, and an importer
    replaying the multi-commit log lands on the current snapshot."""
    from sclera_spark.sources.manifest import ManifestTable

    src = str(tmp_path / "inc")
    ManifestTable.create(
        spark.range(0, 40).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
        src,
    )
    mt = ManifestTable(src)
    first = mt.export_delta_log(spark)
    assert os.path.basename(first) == f"{0:020d}.json"
    # no change -> no new commit
    assert mt.export_delta_log(spark) == first
    # append + COW delete -> ONE diff commit with removes and adds
    mt.append(spark.range(40, 60).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    ))
    victim = mt.files()[:1]
    mt.replace_files(
        victim,
        mt.read(spark, file_paths=victim).where("k % 2 = 0"),
    )
    second = mt.export_delta_log(spark)
    assert os.path.basename(second) == f"{1:020d}.json"
    with open(second) as fh:
        acts = [json.loads(ln) for ln in fh if ln.strip()]
    kinds = [next(iter(a)) for a in acts]
    assert "remove" in kinds and "add" in kinds
    assert "metaData" not in kinds  # schema unchanged
    assert kinds[-1] == "commitInfo"
    # id stability across the log
    with open(first) as fh:
        first_acts = [json.loads(ln) for ln in fh if ln.strip()]
    mid = next(a["metaData"]["id"] for a in first_acts if "metaData" in a)
    # replaying the whole multi-commit log equals the current snapshot
    mt2 = ManifestTable.import_delta(src, str(tmp_path / "inc_reimport"))
    got = sorted((r.k, r.v) for r in mt2.read(spark).collect())
    want = sorted((r.k, r.v) for r in mt.read(spark).collect())
    assert got == want
    assert mid  # the id existed and v1 never re-declared metaData
    # a foreign log refuses
    foreign = str(tmp_path / "foreign_log")
    os.makedirs(foreign)
    _commit(foreign, 0, [
        _meta_action(),
        {"commitInfo": {"operation": "WRITE"}},
    ])
    with pytest.raises(ValueError, match="foreign Delta log"):
        mt.export_delta_log(spark, out_dir=foreign)


def test_delta_mirror_follows_mutations(engine, spark, tmp_path, monkeypatch):
    """SET DELTA MIRROR keeps the exported log current after every
    mutation: one diff commit per changed version, importable at any
    point; a failing refresh warns once and never gates the DML; DROP
    stops refreshing."""
    import warnings as _warnings

    import sclera_spark.sources.manifest as man

    engine.execute("CREATE TABLE dmir AS SELECT 1 AS k UNION ALL SELECT 2")
    engine.execute("ALTER TABLE dmir SET FORMAT MANIFEST")
    mt = engine.ddl()._manifest("dmir")
    log = os.path.join(mt.path, "_delta_log")
    try:
        engine.execute("ALTER TABLE dmir SET DELTA MIRROR")
        assert os.path.isfile(os.path.join(log, f"{0:020d}.json"))
        engine.execute("INSERT INTO dmir VALUES (3)")
        assert os.path.isfile(os.path.join(log, f"{1:020d}.json"))
        engine.execute("UPDATE dmir SET k = 20 WHERE k = 2")
        assert os.path.isfile(os.path.join(log, f"{2:020d}.json"))
        mt2 = ManifestTable.import_delta(
            mt.path, str(tmp_path / "mir_import")
        )
        assert sorted(r.k for r in mt2.read(spark).collect()) == [1, 3, 20]
        # failure: warn once, DML still commits
        man._mirror_warned.discard(mt.path)
        monkeypatch.setattr(
            ManifestTable,
            "export_delta_log",
            lambda self, *a, **kw: (_ for _ in ()).throw(
                RuntimeError("mirror dir gone (forced)")
            ),
        )
        with pytest.warns(UserWarning, match="mirror refresh .* failed"):
            engine.execute("INSERT INTO dmir VALUES (4)")
        assert engine.table("dmir").count() == 4
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            engine.execute("INSERT INTO dmir VALUES (5)")  # warned once
        monkeypatch.undo()
        # recovery: the next mutation catches the mirror up in ONE diff
        engine.execute("INSERT INTO dmir VALUES (6)")
        mt3 = ManifestTable.import_delta(
            mt.path, str(tmp_path / "mir_import2")
        )
        assert sorted(r.k for r in mt3.read(spark).collect()) == [
            1, 3, 4, 5, 6, 20,
        ]
        # DROP stops refreshing
        engine.execute("ALTER TABLE dmir DROP DELTA MIRROR")
        commits_before = sorted(os.listdir(log))
        engine.execute("INSERT INTO dmir VALUES (7)")
        assert sorted(os.listdir(log)) == commits_before
    finally:
        engine.execute("DROP TABLE dmir")


def test_delta_mirror_schema_evolution_and_custom_dir(
    engine, spark, tmp_path
):
    """Review fixes (r11): (1) an unmapped ADD COLUMN re-exports a new
    metaData commit even though no file changed; (2) evolving to
    column mapping after v0 appends a PROTOCOL upgrade (2/5) with the
    mapped metaData; (3) a custom mirror directory is a self-contained
    Delta table (data hard-linked next to the log); (4) schema DDL
    refreshes the mirror via the hook, not just DML."""
    mirror = str(tmp_path / "mirror_root")
    engine.execute("CREATE TABLE dmev AS SELECT 1 AS k UNION ALL SELECT 2")
    engine.execute("ALTER TABLE dmev SET FORMAT MANIFEST")
    try:
        engine.execute(f"ALTER TABLE dmev SET DELTA MIRROR '{mirror}'")
        log = os.path.join(mirror, "_delta_log")
        assert os.path.isfile(os.path.join(log, f"{0:020d}.json"))
        # custom dir is self-contained: files linked under <dir>/data
        assert os.listdir(os.path.join(mirror, "data"))
        # (1)+(4): metadata-only ADD COLUMN -> new commit, new schema
        engine.execute("ALTER TABLE dmev ADD COLUMN extra DOUBLE")
        v1 = os.path.join(log, f"{1:020d}.json")
        assert os.path.isfile(v1)
        with open(v1) as fh:
            acts = [json.loads(ln) for ln in fh if ln.strip()]
        md = next(a["metaData"] for a in acts if "metaData" in a)
        assert "extra" in md["schemaString"]
        assert not any("add" in a or "remove" in a for a in acts)
        # (2): RENAME bootstraps column mapping -> protocol upgrade
        engine.execute("ALTER TABLE dmev RENAME COLUMN k TO kk")
        v2 = os.path.join(log, f"{2:020d}.json")
        assert os.path.isfile(v2)
        with open(v2) as fh:
            acts = [json.loads(ln) for ln in fh if ln.strip()]
        pr = next(a["protocol"] for a in acts if "protocol" in a)
        assert pr == {"minReaderVersion": 2, "minWriterVersion": 5}
        md = next(a["metaData"] for a in acts if "metaData" in a)
        assert "delta.columnMapping.physicalName" in md["schemaString"]
        # (3): the mirror imports as a table of its own, mapped schema
        mt2 = ManifestTable.import_delta(
            mirror, str(tmp_path / "from_mirror")
        )
        df = mt2.read(spark)
        assert sorted(df.columns) == ["extra", "kk"]
        assert sorted(r.kk for r in df.collect()) == [1, 2]
    finally:
        engine.execute("DROP TABLE dmev")


def test_delta_export_refuses_markerless_foreign_log(
    engine, spark, tmp_path
):
    """commitInfo is spec-OPTIONAL: a minimal foreign log without one
    must refuse too, not be silently adopted and corrupted."""
    from sclera_spark.sources.manifest import ManifestTable

    src = str(tmp_path / "mfl")
    ManifestTable.create(spark.range(3).selectExpr("id AS k"), src)
    foreign = str(tmp_path / "foreign_min")
    os.makedirs(foreign)
    _commit(foreign, 0, [
        _meta_action(),
        {"add": {"path": "x.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="foreign Delta log"):
        ManifestTable(src).export_delta_log(spark, out_dir=foreign)


def test_delta_export_checkpoints_bound_replay(engine, spark, tmp_path):
    """Every 10th exported commit folds the state into a public Delta
    checkpoint + _last_checkpoint; the importer replays checkpoint +
    later commits to the exact current snapshot, and further exports
    resume from the checkpoint (refresh cost bounded by the interval,
    not table lifetime)."""
    from sclera_spark.sources.manifest import ManifestTable

    src = str(tmp_path / "ckm")
    ManifestTable.create(spark.range(0, 5).selectExpr("id AS k"), src)
    mt = ManifestTable(src)
    mt.amend_meta({"delta_mirror": True})
    mt.maybe_export_delta(spark)  # v0
    for i in range(11):
        mt.append(
            spark.range(100 * (i + 1), 100 * (i + 1) + 3).selectExpr(
                "id AS k"
            )
        )
        mt.maybe_export_delta(spark)
    log = os.path.join(src, "_delta_log")
    assert os.path.isfile(
        os.path.join(log, f"{10:020d}.checkpoint.parquet")
    )
    with open(os.path.join(log, "_last_checkpoint")) as fh:
        assert json.load(fh)["version"] == 10
    mt2 = ManifestTable.import_delta(src, str(tmp_path / "ck_reimport"))
    got = sorted(r.k for r in mt2.read(spark).collect())
    want = sorted(r.k for r in mt.read(spark).collect())
    assert got == want


def test_delta_export_refuses_other_tables_mirror(engine, spark, tmp_path):
    """Two tables pointed at the same mirror directory: the second
    export must refuse (the commits carry the marker but for a
    DIFFERENT source table), not diff the first table's mirror away."""
    from sclera_spark.sources.manifest import ManifestTable

    a = str(tmp_path / "ta")
    b = str(tmp_path / "tb")
    ManifestTable.create(spark.range(3).selectExpr("id AS k"), a)
    ManifestTable.create(spark.range(5).selectExpr("id AS k"), b)
    shared = str(tmp_path / "shared" / "_delta_log")
    ManifestTable(a).export_delta_log(spark, out_dir=shared)
    with pytest.raises(ValueError, match="foreign Delta log"):
        ManifestTable(b).export_delta_log(spark, out_dir=shared)
    # the rightful owner still appends fine
    ManifestTable(a).append(spark.range(10, 12).selectExpr("id AS k"))
    out = ManifestTable(a).export_delta_log(spark, out_dir=shared)
    assert os.path.basename(out) == f"{1:020d}.json"


def test_partitioned_mirror_checkpoint_round_trips(engine, spark, tmp_path):
    """A PARTITIONED import mirrored past the checkpoint interval:
    partitionValues survive the map-typed checkpoint column and the
    re-import still fills + prunes the virtual columns."""
    from sclera_spark.sources.manifest import ManifestTable

    d = _mk_partitioned_delta(spark, tmp_path, name="ptab_ck")
    imp = str(tmp_path / "pck_import")
    mt = ManifestTable.import_delta(d, imp)
    out_dir = str(tmp_path / "pmirror" / "_delta_log")
    mt.export_delta_log(spark, out_dir=out_dir)
    # v0 exports checkpoint immediately (interval divides 0), so the
    # re-import below replays THROUGH the map-typed checkpoint column
    assert os.path.isfile(
        os.path.join(out_dir, f"{0:020d}.checkpoint.parquet")
    )
    mt2 = ManifestTable.import_delta(
        str(tmp_path / "pmirror"), str(tmp_path / "pck_reimport")
    )
    got = sorted(
        tuple(r) for r in mt2.read(spark).select("k", "c", "dt").collect()
    )
    want = sorted(
        tuple(r) for r in mt.read(spark).select("k", "c", "dt").collect()
    )
    assert got == want
    assert len(mt2.files_pruned({"c": (2, 2)})) < len(mt2.files())


def test_mirror_updates_after_restore_reverts_evolution(
    engine, spark, tmp_path
):
    """Second-review fix: RESTORE to a pre-evolution version commits
    the OLD meta (no table_schema), and the mirror must re-export the
    reverted schema instead of trusting the unchanged file set."""
    engine.execute("CREATE TABLE dres AS SELECT 1 AS k UNION ALL SELECT 2")
    engine.execute("ALTER TABLE dres SET FORMAT MANIFEST")
    mt = engine.ddl()._manifest("dres")
    log = os.path.join(mt.path, "_delta_log")
    try:
        engine.execute("ALTER TABLE dres SET DELTA MIRROR")
        v_pre = mt.version()
        engine.execute("ALTER TABLE dres ADD COLUMN extra DOUBLE")
        with open(os.path.join(log, f"{1:020d}.json")) as fh:
            assert any(
                "extra" in ln for ln in fh if '"metaData"' in ln
            )
        engine.execute(f"RESTORE TABLE dres TO VERSION {v_pre}")
        v2 = os.path.join(log, f"{2:020d}.json")
        assert os.path.isfile(v2), "restore did not refresh the mirror"
        with open(v2) as fh:
            acts = [json.loads(ln) for ln in fh if ln.strip()]
        md = next(a["metaData"] for a in acts if "metaData" in a)
        assert "extra" not in md["schemaString"]
        mt2 = ManifestTable.import_delta(
            mt.path, str(tmp_path / "dres_imp")
        )
        assert mt2.read(spark).columns == ["k"]
    finally:
        engine.execute("DROP TABLE dres")


def test_export_refuses_commit_with_any_foreign_commitinfo(
    engine, spark, tmp_path
):
    """Second-review fix: ANY non-matching commitInfo line refuses —
    a crafted commit carrying a foreign operation followed by our
    marker must not be adopted (last-wins would)."""
    from sclera_spark.sources.manifest import ManifestTable

    src = str(tmp_path / "sticky")
    ManifestTable.create(spark.range(3).selectExpr("id AS k"), src)
    crafted = str(tmp_path / "crafted_log")
    os.makedirs(crafted)
    _commit(crafted, 0, [
        _meta_action(),
        {"add": {"path": "x.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
        {"commitInfo": {"operation": "WRITE"}},
        {"commitInfo": {"operation": "SCLERA EXPORT",
                        "operationParameters": {}}},
    ])
    with pytest.raises(ValueError, match="foreign Delta log"):
        ManifestTable(src).export_delta_log(spark, out_dir=crafted)


def test_mirror_vacuum_reclaims_dropped_files(engine, spark, tmp_path):
    """r12: a custom-directory mirror hard-links data files in; diff
    commits REMOVE old files from the log but the links used to stay
    forever (unbounded growth). VACUUM on the source now also vacuums
    the mirror: files referenced neither by the mirror's current
    version nor by a retained source version are unlinked, and the
    mirror still imports to the live snapshot afterwards."""
    from sclera_spark.sources.manifest import ManifestTable

    mirror = str(tmp_path / "mirror_tbl")
    engine.execute(
        "CREATE TABLE mvac AS SELECT 1 AS k UNION ALL SELECT 2"
    )
    engine.execute("ALTER TABLE mvac SET FORMAT MANIFEST")
    try:
        engine.execute(f"ALTER TABLE mvac SET DELTA MIRROR '{mirror}'")
        ddir = os.path.join(mirror, "data")
        n0 = len(os.listdir(ddir))
        assert n0 >= 1
        # rewrite everything twice: each UPDATE swaps every file
        engine.execute("UPDATE mvac SET k = k + 10")
        engine.execute("UPDATE mvac SET k = k + 100")
        grown = len(os.listdir(ddir))
        assert grown > n0  # old links accumulated
        engine.execute("VACUUM mvac")
        kept = os.listdir(ddir)
        # only the files the live snapshot references survive
        live = {
            os.path.basename(p)
            for p in engine.ddl()._manifest("mvac").files()
        }
        assert sorted(kept) == sorted(live)
        mt2 = ManifestTable.import_delta(
            mirror, str(tmp_path / "mvac_import")
        )
        assert sorted(r.k for r in mt2.read(spark).collect()) == [111, 112]
    finally:
        engine.execute("DROP TABLE mvac")


def test_describe_mirror_staleness_and_directed_vacuum(
    engine, spark, tmp_path
):
    """r13 (VERDICT task 6): DESCRIBE MIRROR surfaces the mirror's
    refresh lag (sourceVersion linkage vs current version), and
    VACUUM t MIRROR is the directed, source-versions-untouched form of
    the mirror hygiene pass — it reclaims links a source VACUUM taken
    during mirror staleness could not."""
    mirror = str(tmp_path / "mirror_tbl")
    engine.execute("CREATE TABLE mstale AS SELECT 1 AS k UNION ALL SELECT 2")
    engine.execute("ALTER TABLE mstale SET FORMAT MANIFEST")
    try:
        engine.execute(f"ALTER TABLE mstale SET DELTA MIRROR '{mirror}'")
        (st,) = engine.execute("DESCRIBE MIRROR mstale")
        assert st["lag"] == 0 and st["mirror_version"] == 0
        assert st["source_version"] == st["current_version"]
        # mutate BEHIND the engine's post-mutation hook: the mirror
        # goes stale and DESCRIBE MIRROR says by exactly how much
        mt = engine.ddl()._manifest("mstale")
        mt.overwrite(spark.range(10, 12).selectExpr("id AS k"))
        engine.ddl()._register_manifest("mstale")  # out-of-band writer
        (st,) = engine.execute("DESCRIBE MIRROR mstale")
        assert st["lag"] >= 1
        assert st["current_version"] == st["source_version"] + st["lag"]
        # source vacuum during staleness KEEPS the old links (the
        # mirror's current version still references them — honesty of
        # the embedded hygiene pass)
        ddir = os.path.join(mirror, "data")
        before = set(os.listdir(ddir))
        engine.execute("VACUUM mstale")
        assert set(os.listdir(ddir)) == before
        # refresh the mirror (any engine mutation re-triggers the
        # hook), then the DIRECTED vacuum reclaims what the stale-era
        # source vacuum could not — without touching source versions
        engine.execute("UPDATE mstale SET k = k + 100")
        (st,) = engine.execute("DESCRIBE MIRROR mstale")
        assert st["lag"] == 0
        versions_before = engine.execute("SHOW VERSIONS mstale")
        removed = engine.execute("VACUUM mstale MIRROR")
        assert removed  # the stale-era links are gone
        assert engine.execute("SHOW VERSIONS mstale") == versions_before
        live = {os.path.basename(p) for p in mt.files()}
        assert set(os.listdir(ddir)) == live
        # the mirror still imports to the live snapshot
        from sclera_spark.sources.manifest import ManifestTable

        mt2 = ManifestTable.import_delta(
            mirror, str(tmp_path / "mstale_import")
        )
        assert sorted(r.k for r in mt2.read(spark).collect()) == [110, 111]
        # no mirror configured -> loud, not silently fresh
        engine.execute("ALTER TABLE mstale DROP DELTA MIRROR")
        with pytest.raises(Exception, match="no Delta mirror"):
            engine.execute("DESCRIBE MIRROR mstale")
    finally:
        engine.execute("DROP TABLE mstale")


def test_delta_import_mode_id_with_field_ids(spark, tmp_path):
    """r12: a delta-spark-layout mode=id table (parquet footers carry
    PARQUET:field_id and columns are named by physicalName) imports
    through the same mapping machinery as mode=name; a footer whose
    field id sits under a DIFFERENT column name refuses loudly (an
    id-based reader would bind it differently); an id-less column not
    named by any physicalName refuses too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "idtab")
    os.makedirs(d, exist_ok=True)

    def _write(name, col_a, col_b, ids=(1, 2)):
        fields = [
            pa.field(
                col_a, pa.int64(),
                metadata={b"PARQUET:field_id": str(ids[0]).encode()},
            ),
            pa.field(
                col_b, pa.float64(),
                metadata={b"PARQUET:field_id": str(ids[1]).encode()},
            ),
        ]
        tbl = pa.table(
            {col_a: list(range(12)), col_b: [i * 0.5 for i in range(12)]},
            schema=pa.schema(fields),
        )
        pq.write_table(tbl, os.path.join(d, name))

    _write("f1.parquet", "col-9aa1", "col-77bc")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": "col-9aa1"}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": "col-77bc"}},
        ],
    }

    def _log(root, files):
        _commit(os.path.join(root, "_delta_log"), 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": {
                "id": "cid", "format": {
                    "provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "id"}}},
            *[{"add": {"path": f, "size": 1, "modificationTime": 0,
                       "dataChange": True}} for f in files],
        ])

    _log(d, ["f1.parquet"])
    mt = ManifestTable.import_delta(d, str(tmp_path / "id_import"))
    df = mt.read(spark)
    assert df.columns == ["k", "v"]
    rows = sorted((r.k, r.v) for r in df.collect())
    assert rows == [(i, i * 0.5) for i in range(12)]

    # drifted footer: field id 1 under a name that is NOT its
    # physicalName — loud refusal
    d2 = str(tmp_path / "idtab_drift")
    os.makedirs(d2, exist_ok=True)
    import shutil

    def _mklog(root, fname, writer):
        writer(root, fname)
        _commit(os.path.join(root, "_delta_log"), 0, [
            {"metaData": {
                "id": "cid2", "format": {
                    "provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "id"}}},
            {"add": {"path": fname, "size": 1, "modificationTime": 0,
                     "dataChange": True}},
        ])

    def _drift_writer(root, fname):
        fields = [
            pa.field("col-WRONG", pa.int64(),
                     metadata={b"PARQUET:field_id": b"1"}),
            pa.field("col-77bc", pa.float64(),
                     metadata={b"PARQUET:field_id": b"2"}),
        ]
        tbl = pa.table(
            {"col-WRONG": [1], "col-77bc": [0.5]},
            schema=pa.schema(fields),
        )
        pq.write_table(tbl, os.path.join(root, fname))

    _mklog(d2, "f1.parquet", _drift_writer)
    with pytest.raises(ValueError, match="mis-bind"):
        ManifestTable.import_delta(d2, str(tmp_path / "id_import2"))

    # id-less column with a foreign name: binding unprovable — refuse
    d3 = str(tmp_path / "idtab_foreign")
    os.makedirs(d3, exist_ok=True)

    def _foreign_writer(root, fname):
        tbl = pa.table({"mystery": [1], "col-77bc": [0.5]})
        pq.write_table(tbl, os.path.join(root, fname))

    _mklog(d3, "f1.parquet", _foreign_writer)
    with pytest.raises(ValueError, match="cannot prove"):
        ManifestTable.import_delta(d3, str(tmp_path / "id_import3"))
