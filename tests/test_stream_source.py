"""Manifest tables as a streaming SOURCE (sources/stream_source.py —
pyspark Python Data Source): version-offset tailing with exactly-once
delivery, Delta-style change-commit refusal, starting_version, and the
vacuumed-gap loud error."""

from __future__ import annotations

import os

import pytest

from sclera_spark.sources.manifest import ManifestTable
from sclera_spark.sources.stream_source import ManifestStreamSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ManifestStreamSource)
    return spark


def _drain(spark, path, cp, sink: list, **opts):
    """Run the stream until every available version is consumed; rows
    land in ``sink`` as (batch_id, sorted rows)."""
    reader = spark.readStream.format("sclera_manifest").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    df = reader.load()

    def feed(bdf, bid):
        sink.append((bid, sorted(tuple(r) for r in bdf.collect())))

    q = (
        df.writeStream.foreachBatch(feed)
        .option("checkpointLocation", cp)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _rows(pairs):
    return sorted(r for _, rows in pairs for r in rows)


def test_stream_tail_is_exactly_once(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    ManifestTable.create(
        spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"), path
    )
    mt = ManifestTable(path)

    got: list = []
    _drain(spark, path, cp, got)
    assert _rows(got) == [(i, 2 * i) for i in range(10)]

    # two more commits; the SAME checkpoint resumes and sees ONLY them
    mt.append(spark.range(10, 15).selectExpr("id AS k", "id * 2 AS v"))
    mt.append(spark.range(15, 18).selectExpr("id AS k", "id * 2 AS v"))
    got2: list = []
    _drain(spark, path, cp, got2)
    assert _rows(got2) == [(i, 2 * i) for i in range(10, 18)]

    # nothing new -> nothing delivered (no replay, no duplicates)
    got3: list = []
    _drain(spark, path, cp, got3)
    assert _rows(got3) == []


def test_change_commit_refused_then_skippable(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 8).selectExpr("id AS k", "id * 2 AS v"), path
    )
    mt = ManifestTable(path)
    # consume v1, then make a REWRITE commit (removes files)
    got: list = []
    _drain(spark, path, str(tmp_path / "cp1"), got)
    mt.overwrite(spark.range(100, 103).selectExpr("id AS k", "id * 2 AS v"))

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="append stream"):
        _drain(spark, path, str(tmp_path / "cp1"), [])

    # skip_change_commits=true streams the version's ADDED files only
    got2: list = []
    _drain(
        spark,
        path,
        str(tmp_path / "cp1"),
        got2,
        skip_change_commits="true",
    )
    assert _rows(got2) == [(i, 2 * i) for i in range(100, 103)]


def test_starting_version_streams_only_future(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 5).selectExpr("id AS k", "id * 2 AS v"), path
    )
    mt = ManifestTable(path)
    v_now = mt.version()
    mt.append(spark.range(5, 7).selectExpr("id AS k", "id * 2 AS v"))
    got: list = []
    _drain(
        spark,
        path,
        str(tmp_path / "cp"),
        got,
        starting_version=str(v_now),
    )
    assert _rows(got) == [(5, 10), (6, 12)]


def test_vacuumed_gap_fails_loudly(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 4).selectExpr("id AS k"), path
    )
    mt = ManifestTable(path)
    mt.append(spark.range(4, 8).selectExpr("id AS k"))
    mt.overwrite(spark.range(8, 12).selectExpr("id AS k"))
    mt.vacuum(keep_versions=1)

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        StreamingQueryException, match="no longer retained"
    ):
        _drain(spark, path, str(tmp_path / "cp"), [])


def test_schema_inference_and_missing_column_nulls(registered, tmp_path):
    """Schema comes from the current snapshot; an OLD file lacking a
    column that the current schema carries streams NULLs for it."""
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(spark.range(0, 3).selectExpr("id AS k"), path)
    mt = ManifestTable(path)
    mt.append(
        spark.range(3, 5).selectExpr("id AS k", "id * 2 AS extra")
    )
    got: list = []
    _drain(spark, path, str(tmp_path / "cp"), got)
    rows = _rows(got)
    assert (0, None) in rows and (3, 6) in rows and len(rows) == 5
