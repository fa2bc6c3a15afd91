"""CREATE TABLE t FROM DELTA '<dir>' — importing an external Delta
Lake table by replaying its public `_delta_log` commit protocol
(hand-authored fixtures; no delta-spark dependency). Invariants:

- the live-file set after add/remove replay round-trips bit-identically
  (hard links, no copies);
- DML works atop the import and never touches the source table;
- commit-time stats make skipping live immediately;
- checkpointed logs replay (single-part checkpoint + later commits);
- Delta features whose data is NOT in the parquet bytes (partitioning,
  deletion vectors, column mapping) refuse loudly."""

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
    # partitioned table
    d1 = str(tmp_path / "p1")
    _write_part(spark, d1, "f1.parquet", 0, 10)
    _commit(os.path.join(d1, "_delta_log"), 0, [
        _meta_action(part_cols=["dt"]),
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="partitioned"):
        ManifestTable.import_delta(d1, str(tmp_path / "o1"))
    # deletion vector
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
