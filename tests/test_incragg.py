"""Incremental materialized aggregates (sources/incragg.py): refresh
cost proportional to NEW data, full-recompute fallback on copy-on-write,
and exactly-once delta application across a crashed refresh."""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sclera_spark.sources.incragg import IncrementalAggregate
from sclera_spark.sources.manifest import ManifestTable

_AGGS = {
    "n": ("count", None),
    "total": ("sum", "value"),
    "lo": ("min", "value"),
    "hi": ("max", "value"),
}


def _mk_rows(spark, start_hour, n, uid_mod=3):
    base = datetime.datetime(2024, 6, 1) + datetime.timedelta(hours=start_hour)
    rows = [
        (
            i,
            i % uid_mod,
            base + datetime.timedelta(minutes=7 * i),
            float((i * 13) % 17) - 8.0,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def _direct(source_df, bucket="1 hour"):
    return (
        source_df.groupBy(F.window("ts", bucket).alias("__w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select(
            F.col("__w.start").alias("bucket_start"),
            F.col("__w.end").alias("bucket_end"),
            "user_id",
            "n",
            "total",
            "lo",
            "hi",
        )
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def env(spark):
    root = tempfile.mkdtemp(prefix="sclera_incragg_")
    src_path = os.path.join(root, "src")
    mv_path = os.path.join(root, "mv")
    src = ManifestTable.create(_mk_rows(spark, 0, 40), src_path)
    ia = IncrementalAggregate.create(
        spark, src, mv_path, ts_col="ts", bucket="1 hour", aggs=_AGGS,
        keys=["user_id"],
    )
    yield spark, src, ia
    shutil.rmtree(root, ignore_errors=True)


def test_create_matches_direct(env):
    spark, src, ia = env
    assert _canon(ia.read(spark)) == _canon(_direct(src.read(spark)))


def test_incremental_refresh_reads_only_new_files(env):
    spark, src, ia = env
    n_before = len(src.files())
    # two appends: new buckets AND rows landing in existing buckets
    src.append(_mk_rows(spark, 2, 25))
    src.append(_mk_rows(spark, 0, 10, uid_mod=2))
    mode, n = ia.refresh(spark)
    assert mode == "incremental"
    # cost metric: exactly the appended files, not the table
    assert n == len(src.files()) - n_before
    assert _canon(ia.read(spark)) == _canon(_direct(src.read(spark)))
    # idempotent when nothing changed
    assert ia.refresh(spark) == ("noop", 0)


def test_cow_update_falls_back_to_full(env):
    spark, src, ia = env
    # replace the initial file (a COW UPDATE): delta is not appendable
    old = src.files()
    changed = src.read(spark).withColumn(
        "value", F.col("value") * F.lit(2.0)
    )
    src.replace_files(old, changed)
    mode, _n = ia.refresh(spark)
    assert mode == "full"
    assert _canon(ia.read(spark)) == _canon(_direct(src.read(spark)))


def test_crashed_refresh_applies_delta_exactly_once(env, monkeypatch):
    """Kill the refresh AFTER its state file is written but BEFORE the MV
    pointer swap: the half-applied delta must be invisible, and the retry
    must apply it exactly once (no double-count, no loss)."""
    spark, src, ia = env
    src.append(_mk_rows(spark, 5, 20))
    before = _canon(ia.read(spark))

    orig_overwrite = ia.mv.overwrite

    def crashing_overwrite(df, meta=None):
        raise RuntimeError("injected crash before pointer swap")

    monkeypatch.setattr(ia.mv, "overwrite", crashing_overwrite)
    with pytest.raises(RuntimeError, match="injected"):
        ia.refresh(spark)
    # MV unchanged: the crash left the old version current
    assert _canon(ia.read(spark)) == before

    monkeypatch.setattr(ia.mv, "overwrite", orig_overwrite)
    mode, n = ia.refresh(spark)
    assert mode == "incremental" and n >= 1
    assert _canon(ia.read(spark)) == _canon(_direct(src.read(spark)))


def test_non_decomposable_agg_rejected(env):
    spark, src, _ia = env
    with pytest.raises(ValueError, match="not decomposable"):
        IncrementalAggregate.create(
            spark, src, tempfile.mkdtemp(prefix="sclera_bad_mv_"),
            ts_col="ts", bucket="1 hour", aggs={"a": ("avg", "value")},
        )


def test_empty_delta_commit_advances_state(env):
    """A source commit that adds NO files (a meta-only commit — e.g. a
    watermark-advancing empty streaming batch recorded via amend_meta)
    must not crash refresh (spark.read.parquet of an empty list raises)
    or stall it: the recorded source version advances as a pure metadata
    commit and the MV data is untouched."""
    spark, src, ia = env
    before = _canon(ia.read(spark))
    src.amend_meta({"note": "watermark advance"})  # version bump, no files
    assert ia.refresh(spark) == ("noop", 0)
    assert ia.state()["source_version"] == src.version()
    assert _canon(ia.read(spark)) == before
    # and a later real append still refreshes incrementally
    src.append(_mk_rows(spark, 3, 12))
    mode, n = ia.refresh(spark)
    assert mode == "incremental" and n >= 1
    assert _canon(ia.read(spark)) == _canon(_direct(src.read(spark)))


def test_mv_side_commit_does_not_desync_state(env):
    """An unrelated commit on the MV itself (OPTIMIZE/compact) must not
    orphan or stale the refresh state: state rides in manifest meta and
    is inherited across commits, so refresh after an MV compaction still
    consumes exactly the unconsumed source delta."""
    spark, src, ia = env
    # several small MV versions so compact has something to fold
    src.append(_mk_rows(spark, 2, 10))
    assert ia.refresh(spark)[0] == "incremental"
    st_before = ia.state()
    ia.mv.compact(spark, target_bytes=64 * 1024 * 1024)  # MV-side commit
    assert ia.state() == st_before  # inherited, not lost / not stale-keyed
    src.append(_mk_rows(spark, 4, 10))
    mode, n = ia.refresh(spark)
    assert mode == "incremental" and n >= 1
    assert _canon(ia.read(spark)) == _canon(_direct(src.read(spark)))


def test_refresh_after_compaction_stays_correct(env):
    """OPTIMIZE on the source replaces files (not append-expressible):
    refresh must take the full path and still match the direct agg."""
    spark, src, ia = env
    src.append(_mk_rows(spark, 8, 15))
    assert ia.refresh(spark)[0] == "incremental"
    replaced = src.compact(spark, target_bytes=64 * 1024 * 1024)
    assert replaced
    mode, _ = ia.refresh(spark)
    assert mode == "full"
    assert _canon(ia.read(spark)) == _canon(_direct(src.read(spark)))
    assert ia.refresh(spark) == ("noop", 0)


def test_incragg_on_cas_tables(spark, tmp_path):
    """r7: the MV can itself be a CAS-committed table (FileCas) — the
    refresh state still rides the version meta through the lock-free
    commit path, and incremental refresh semantics are unchanged."""
    from sclera_spark.sources.incragg import IncrementalAggregate
    from sclera_spark.sources.manifest import CasManifestTable, FileCas

    cas = FileCas(str(tmp_path / "cas"))
    src = CasManifestTable.create_cas(
        spark.range(100).selectExpr(
            "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id*60) AS ts",
            "id % 3 AS k", "CAST(id AS DOUBLE) AS v",
        ),
        str(tmp_path / "src"),
        cas,
    )
    ia = IncrementalAggregate.create(
        spark, src, str(tmp_path / "mv"), "ts", "1 hour",
        {"n": ("count", None), "s": ("sum", "v")}, keys=["k"], cas=cas,
    )
    assert isinstance(ia.mv, CasManifestTable)
    base = {(r.bucket_start, r.k): (r.n, r.s) for r in ia.read(spark).collect()}

    src.append(
        spark.range(100, 140).selectExpr(
            "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id*60) AS ts",
            "id % 3 AS k", "CAST(id AS DOUBLE) AS v",
        )
    )
    mode, nfiles = ia.refresh(spark)
    assert mode == "incremental"
    got = {(r.bucket_start, r.k): (r.n, r.s) for r in ia.read(spark).collect()}
    # oracle: full recompute
    want = {
        (r.bucket_start, r.k): (r.n, r.s)
        for r in IncrementalAggregate(
            str(tmp_path / "mv"), cas=cas
        )._bucket_agg(
            src.read(spark), "ts", "1 hour",
            {"n": ("count", None), "s": ("sum", "v")}, ["k"],
        ).select(
            "bucket_start", "k", "n", "s"
        ).collect()
    }
    assert got == want and got != base


def test_incremental_refresh_on_column_mapped_source(env, spark):
    """A source that evolved via column mapping (rename of a NON-agg
    column) keeps incrementally refreshing: the delta read goes THROUGH
    the table (physical->logical projection), not raw parquet — raw
    files store physical names the agg spec would not resolve."""
    _spark, src, ia = env
    # rename a column the rollup does NOT reference; physical files
    # now differ from the logical schema for every later delta read
    src.rename_column(spark, "event_id", "evt")
    src.append(_mk_rows(spark, 2, 25).withColumnRenamed("event_id", "evt"))
    mode, n = ia.refresh(spark)
    assert mode == "incremental" and n >= 1
    assert _canon(ia.read(spark)) == _canon(_direct(src.read(spark)))
