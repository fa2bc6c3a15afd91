"""Delta-encoded manifest log (r9): commits record (remove, add) deltas
against their predecessor with a full snapshot at least every
``_snapshot_every`` versions — the Delta-Lake checkpoint model. The
property under test throughout: a delta-encoded log RESOLVES to exactly
the manifest a full-snapshot log would hold (files, order, stats, null
counts, row counts, meta), at every version, across DML, vacuum and
time travel — so the O(changed files) commit cost is free of semantic
drift. Reference context: the reference's storage tier has no log at
all (per-location SQL pushdown); this tier replaces it for Spark, and
its log model comes from public Delta/Iceberg semantics."""

from __future__ import annotations

import json
import os

import pytest

from sclera_spark.sources.manifest import (
    ManifestTable,
    load_manifest,
)


def _raw(mt: ManifestTable, v: int) -> dict:
    with open(os.path.join(mt.log_dir, f"v{v}.json")) as fh:
        return json.load(fh)


def _is_delta(doc: dict) -> bool:
    return "files" not in doc


@pytest.fixture()
def mt(spark, tmp_path):
    t = ManifestTable.create(
        spark.range(100).selectExpr("id AS k", "id * 2 AS v"),
        str(tmp_path / "t"),
    )
    return t


# ------------------------------------------------------- encoding shape


def test_appends_write_deltas(spark, mt):
    for i in range(3):
        mt.append(spark.range(10).selectExpr(
            f"id + {100 + i * 10} AS k", "id AS v"))
    assert not _is_delta(_raw(mt, 1))  # create = snapshot
    for v in (2, 3, 4):
        doc = _raw(mt, v)
        assert _is_delta(doc)
        assert doc["base"] == v - 1
        assert doc["remove"] == []
        assert len(doc["add"]) >= 1
        # delta carries stats only for ITS files, not the whole table
        for e in doc["add"]:
            assert {"name", "nulls", "rows"} <= set(e)


def test_delta_commit_size_is_o_changed(spark, mt):
    """The point of the format: appending one small file to a table
    must not serialize the whole table's stats again."""
    # widen the table so a snapshot would be large
    big = spark.range(2000).selectExpr("id + 1000 AS k", "id AS v")
    mt.append(big.repartition(40))
    snap_size = os.path.getsize(
        os.path.join(mt.log_dir, "v1.json")
    ) + len(json.dumps(_raw(mt, 2)))
    mt.append(spark.range(5).selectExpr("id + 90000 AS k", "id AS v")
              .coalesce(1))
    v = mt.version()
    doc = _raw(mt, v)
    assert _is_delta(doc) and len(doc["add"]) == 1
    assert os.path.getsize(
        os.path.join(mt.log_dir, f"v{v}.json")
    ) < snap_size / 4


def test_snapshot_written_at_depth_cap(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(ManifestTable, "_snapshot_every", 3)
    mt = ManifestTable.create(
        spark.range(10).selectExpr("id AS k"), str(tmp_path / "t"))
    for i in range(5):
        mt.append(spark.range(3).selectExpr(f"id + {100 + i} AS k"))
    # v1 snap(d0), v2 d1, v3 d2, v4 d3, v5 must snapshot (depth 4 > 3)
    assert [_is_delta(_raw(mt, v)) for v in range(1, 7)] == [
        False, True, True, True, False, True,
    ]


def test_overwrite_and_full_delete_snapshot(spark, mt):
    """A commit that changes more files than it keeps is written as a
    snapshot — a delta would be bigger, not smaller."""
    mt.overwrite(spark.range(7).selectExpr("id AS k", "id AS v"))
    assert not _is_delta(_raw(mt, mt.version()))


def test_replace_files_is_a_remove_add_delta(spark, mt):
    mt.append(spark.range(10).selectExpr("id + 500 AS k", "id AS v"))
    victim = mt.files()[0]
    keep_rows = (
        spark.read.parquet(victim).where("k % 2 = 0")
    )
    before = mt.read(spark).count()
    removed_rows = spark.read.parquet(victim).count()
    kept_rows = keep_rows.count()
    mt.replace_files([victim], keep_rows)
    doc = _raw(mt, mt.version())
    assert _is_delta(doc)
    assert doc["remove"] == [os.path.basename(victim)]
    assert mt.read(spark).count() == before - removed_rows + kept_rows


# --------------------------------------------------- resolution parity


def test_delta_log_resolves_identically_to_snapshot_log(
    spark, tmp_path, monkeypatch
):
    """Twin tables, same mutation sequence; one forced to write a full
    snapshot every commit. Every version's RESOLVED manifest must be
    identical (modulo the data-file name tags, so compare shapes and
    stats multisets)."""

    def mutate(t, spark):
        t.append(spark.range(50).selectExpr(
            "id + 1000 AS k", "id AS v").coalesce(1))
        t.append(spark.range(20).selectExpr(
            "id + 2000 AS k", "CAST(NULL AS BIGINT) AS v").coalesce(1))
        victim = t.files()[0]
        t.replace_files(
            [victim], spark.read.parquet(victim).where("k < 40"))
        t.amend_meta({"note": "tagged"})

    delta_t = ManifestTable.create(
        spark.range(100).selectExpr("id AS k", "id * 2 AS v"),
        str(tmp_path / "d"),
    )
    mutate(delta_t, spark)

    monkeypatch.setattr(ManifestTable, "_snapshot_every", 0)
    snap_t = ManifestTable.create(
        spark.range(100).selectExpr("id AS k", "id * 2 AS v"),
        str(tmp_path / "s"),
    )
    mutate(snap_t, spark)
    assert all(
        not _is_delta(_raw(snap_t, v)) for v in snap_t.versions()
    )
    assert any(_is_delta(_raw(delta_t, v)) for v in delta_t.versions())

    assert delta_t.versions() == snap_t.versions()
    for v in delta_t.versions():
        dm = load_manifest(delta_t.log_dir, v)
        sm = load_manifest(snap_t.log_dir, v)
        assert len(dm["files"]) == len(sm["files"])
        assert dm["meta"] == sm["meta"]
        # stats/nulls/rows agree as multisets (file names differ by tag)
        for key in ("stats", "nulls", "rows"):
            d_vals = sorted(
                json.dumps(dm[key][f], sort_keys=True)
                for f in dm[key]
            )
            s_vals = sorted(
                json.dumps(sm[key][f], sort_keys=True)
                for f in sm[key]
            )
            assert d_vals == s_vals, key
        # and the resolved rows match the actual table content
        assert (
            delta_t.read(spark, version=v).count()
            == snap_t.read(spark, version=v).count()
        )


def test_time_travel_and_pruning_across_deltas(spark, mt):
    v1 = mt.version()
    n1 = mt.read(spark).count()
    mt.append(spark.range(10).selectExpr("id + 10000 AS k", "id AS v"))
    mt.append(spark.range(10).selectExpr("id + 20000 AS k", "id AS v"))
    assert mt.read(spark, version=v1).count() == n1
    assert mt.read(spark).count() == n1 + 20
    # data skipping sees delta-recorded stats: a probe above the base
    # range keeps only the late files
    kept = mt.files_pruned({"k": (19999, None)})
    assert len(kept) < len(mt.files())
    assert mt.row_count() == n1 + 20  # metadata-only count still exact


# ----------------------------------------------------------- vacuum


def test_vacuum_materializes_oldest_kept_version(spark, mt):
    for i in range(4):
        mt.append(spark.range(5).selectExpr(f"id + {1000 + i} AS k",
                                            "id AS v"))
    vs = mt.versions()
    keep = vs[-2:]
    expected = {
        v: (load_manifest(mt.log_dir, v)["files"],
            mt.read(spark, version=v).count())
        for v in keep
    }
    old_mtime = os.path.getmtime(
        os.path.join(mt.log_dir, f"v{keep[0]}.json"))
    assert _is_delta(_raw(mt, keep[0]))  # precondition: it was a delta

    mt.vacuum(keep_versions=2)

    assert mt.versions() == keep
    # oldest kept version is now a self-contained snapshot, same mtime
    doc = _raw(mt, keep[0])
    assert not _is_delta(doc)
    assert os.path.getmtime(
        os.path.join(mt.log_dir, f"v{keep[0]}.json")
    ) == pytest.approx(old_mtime, abs=1e-3)
    # both kept versions resolve to what they held before the vacuum
    for v in keep:
        files, rows = expected[v]
        res = load_manifest(mt.log_dir, v)
        assert res["files"] == files
        assert mt.read(spark, version=v).count() == rows
    # versions below the cut are gone, log files and all
    with pytest.raises(FileNotFoundError):
        load_manifest(mt.log_dir, vs[0])


def test_vacuum_then_continue_committing(spark, mt):
    for i in range(3):
        mt.append(spark.range(4).selectExpr(f"id + {200 + i} AS k",
                                            "id AS v"))
    mt.vacuum(keep_versions=1)
    n = mt.read(spark).count()
    mt.append(spark.range(6).selectExpr("id + 900 AS k", "id AS v"))
    assert _is_delta(_raw(mt, mt.version()))  # new delta atop snapshot
    assert mt.read(spark).count() == n + 6
    assert mt.history()[0]["op"] == "append"


# ------------------------------------------------- restore and clone


def test_restore_is_a_metadata_commit(spark, mt):
    v1 = mt.version()
    n1 = mt.read(spark).count()
    mt.append(spark.range(10).selectExpr("id + 5000 AS k", "id AS v"))
    mt.amend_meta({"bloom_columns": ["k"]})
    assert mt.read(spark).count() == n1 + 10

    new_v = mt.restore(v1)
    assert new_v == mt.version() and new_v > v1
    assert mt.read(spark).count() == n1
    # restored meta is version v1's, not a merge: the later bloom
    # config rolled back with the data
    m = mt.meta()
    assert "bloom_columns" not in m
    assert m["_op"] == "restore" and m["restored_from"] == v1
    # the undone state stays time-travel readable
    assert mt.read(spark, version=new_v - 1).count() == n1 + 10
    # and restore of a vacuumed version refuses loudly
    mt.vacuum(keep_versions=1)
    with pytest.raises(ValueError, match="not retained"):
        mt.restore(v1)


def test_clone_is_zero_copy_and_independent(spark, mt, tmp_path):
    mt.append(spark.range(10).selectExpr("id + 5000 AS k", "id AS v"))
    v_clone = mt.version() - 1  # clone the PRE-append snapshot
    n_old = mt.read(spark, version=v_clone).count()

    c = mt.clone(str(tmp_path / "c"), version=v_clone)
    assert c.version() == 1
    assert c.read(spark).count() == n_old
    assert c.meta()["cloned_version"] == v_clone
    # zero-copy: same inodes (hard links), no byte duplication
    src = os.path.join(mt.data_dir, os.path.basename(c.files()[0]))
    assert os.stat(src).st_ino == os.stat(c.files()[0]).st_ino
    # stats recorded at clone time: pruning + metadata count work
    assert c.row_count() == n_old

    # independence both ways: DML on the clone never touches the
    # source; vacuuming the source never breaks the clone (hard links)
    c.append(spark.range(3).selectExpr("id + 90000 AS k", "id AS v"))
    assert mt.read(spark).count() == n_old + 10
    mt.overwrite(spark.range(2).selectExpr("id AS k", "id AS v"))
    mt.vacuum(keep_versions=1)
    assert c.read(spark).count() == n_old + 3


# ------------------------------------------------- cache and back-compat


def test_meta_returns_a_copy(spark, mt):
    mt.amend_meta({"a": 1})
    m = mt.meta()
    m.pop("_op", None)
    m["a"] = 999
    again = mt.meta()
    assert again.get("_op") == "amend" and again.get("a") == 1


def test_rewritten_version_file_is_reread(spark, mt):
    """The resolver cache keys on (mtime, size): an in-place rewrite of
    a log file (vacuum materialization, test scaffolding) must never
    serve stale content."""
    mt.append(spark.range(3).selectExpr("id + 700 AS k", "id AS v"))
    mt.files()  # populate the cache
    v = mt.version()
    doc = _raw(mt, v)
    doc["meta"]["stamp"] = "rewritten"
    p = os.path.join(mt.log_dir, f"v{v}.json")
    with open(p, "w") as fh:
        json.dump(doc, fh)
    os.utime(p)  # force a new mtime even on coarse filesystems
    assert mt.meta().get("stamp") == "rewritten"


def test_pre_delta_full_manifests_still_resolve(spark, tmp_path):
    """An r8 table (every version a full manifest, no depth markers)
    reads unchanged, and the next commit on it writes a delta."""
    mt = ManifestTable.create(
        spark.range(20).selectExpr("id AS k"), str(tmp_path / "t"))
    mt.append(spark.range(5).selectExpr("id + 100 AS k"))
    # rewrite BOTH versions in the legacy full form
    for v in mt.versions():
        res = load_manifest(mt.log_dir, v)
        with open(os.path.join(mt.log_dir, f"v{v}.json"), "w") as fh:
            json.dump(
                {
                    "version": v,
                    "files": res["files"],
                    "meta": res["meta"],
                    "stats": res["stats"],
                    "nulls": res["nulls"],
                    "rows": res["rows"],
                },
                fh,
            )
    assert mt.read(spark).count() == 25
    assert load_manifest(mt.log_dir, mt.version())["_depth"] == 0
    mt.append(spark.range(5).selectExpr("id + 200 AS k"))
    assert _is_delta(_raw(mt, mt.version()))
    assert mt.read(spark).count() == 30


# ------------------------------------------------- schema evolution


def test_add_column_metadata_only(spark, mt, tmp_path):
    """ALTER-style schema evolution (ManifestTable + engine route): the
    evolved schema is a metadata commit; files that predate the column
    read as typed NULLs, new appends carry values, time travel sees the
    schema as of each version, and no data file is rewritten."""
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    engine.execute(
        "CREATE TABLE evo AS SELECT id AS k, id * 2 AS v FROM RANGE(50)"
    )
    engine.execute("ALTER TABLE evo SET FORMAT MANIFEST")
    from sclera_spark.sources.manifest import ManifestTable

    t = ManifestTable(engine._ddl._path("evo"))
    files_before = {p: __import__("os").path.getmtime(p) for p in t.files()}
    v_pre = t.version()
    try:
        engine.execute("ALTER TABLE evo ADD COLUMN tag STRING")
        df = engine.table("evo")
        assert df.columns == ["k", "v", "tag"]
        assert df.where("tag IS NULL").count() == 50
        # no data file touched
        assert {
            p: __import__("os").path.getmtime(p) for p in t.files()
        } == files_before
        # new rows carry values; old rows stay NULL
        engine.execute(
            "INSERT INTO evo SELECT id + 100, id, 'new' FROM RANGE(5)"
        )
        got = engine.sql(
            "SELECT count(*) AS n FROM evo WHERE tag = 'new'"
        ).first()
        assert got.n == 5
        # DML over the evolved schema composes
        engine.execute("DELETE FROM evo WHERE tag IS NULL AND k < 10")
        assert engine.table("evo").count() == 45
        # time travel: pre-ALTER version has the old schema
        old = t.read(spark, version=v_pre)
        assert old.columns == ["k", "v"]
        # duplicate / invalid adds refuse
        import pytest as _pytest

        with _pytest.raises(ValueError, match="already exists"):
            engine.execute("ALTER TABLE evo ADD COLUMN tag STRING")
        with _pytest.raises(ValueError, match="invalid type"):
            engine.execute("ALTER TABLE evo ADD COLUMN zz NOTATYPE")
    finally:
        engine.execute("DROP TABLE evo")


# ----------------------------------------------------- vacuum dry run


def test_vacuum_dry_run_lists_without_deleting(spark, mt, tmp_path):
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    engine.execute(
        "CREATE TABLE vdr AS SELECT id AS k FROM RANGE(30)"
    )
    engine.execute("ALTER TABLE vdr SET FORMAT MANIFEST")
    try:
        engine.execute("DELETE FROM vdr WHERE k < 10")
        t = ManifestTable(engine._ddl._path("vdr"))
        on_disk = set(os.listdir(t.data_dir))
        preview = engine.execute("VACUUM vdr DRY RUN")
        assert preview  # the pre-DML files are deletable
        assert set(os.listdir(t.data_dir)) == on_disk  # nothing deleted
        assert engine.table("vdr").count() == 20
        # the real vacuum deletes exactly what the preview listed
        deleted = engine.execute("VACUUM vdr")
        assert sorted(deleted) == sorted(preview)
        # retained-version preview is empty when nothing is deletable
        assert engine.execute("VACUUM vdr RETAIN 5 VERSIONS DRY RUN") == []
    finally:
        engine.execute("DROP TABLE vdr")


def test_corrupt_base_pointer_fails_loudly(spark, mt):
    """A forged/corrupt delta whose base points at itself (or forward)
    must raise a corrupt-log error, never recurse into a cycle."""
    mt.append(spark.range(3).selectExpr("id + 900 AS k", "id AS v"))
    v = mt.version()
    p = os.path.join(mt.log_dir, f"v{v}.json")
    doc = _raw(mt, v)
    assert _is_delta(doc)
    doc["base"] = v  # self-cycle
    with open(p, "w") as fh:
        json.dump(doc, fh)
    os.utime(p)
    with pytest.raises(ValueError, match="corrupt manifest log"):
        load_manifest(mt.log_dir, v)
