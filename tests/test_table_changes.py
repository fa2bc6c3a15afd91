"""Change data feed over manifest tables (TABLE_CHANGES): row-level
insert/delete changes derived from the log's file deltas — no stored
change files, reading only the files each commit touched. Property
under test throughout: replaying the feed from version A reproduces
exactly the table state at version B (feed-apply equivalence), and a
pure rewrite (OPTIMIZE) feeds nothing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sclera_spark.engine import ScleraEngine
from sclera_spark.sources.manifest import ManifestTable


@pytest.fixture()
def engine(spark, tables):
    return ScleraEngine(spark)


@pytest.fixture()
def mt(spark, tmp_path):
    return ManifestTable.create(
        spark.range(100).selectExpr("id AS k", "id * 10 AS v"),
        str(tmp_path / "t"),
    )


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_append_only_feed(spark, mt):
    v0 = mt.version()
    mt.append(spark.range(5).selectExpr("id + 1000 AS k", "id AS v"))
    mt.append(spark.range(3).selectExpr("id + 2000 AS k", "id AS v"))
    ch = mt.changes(spark, v0)
    assert ch.where("_change_type = 'delete'").count() == 0
    assert ch.count() == 8
    # per-commit attribution
    by_v = dict(
        (r["_commit_version"], r["n"])
        for r in ch.groupBy("_commit_version").agg(
            F.count("*").alias("n")).collect()
    )
    assert by_v == {v0 + 1: 5, v0 + 2: 3}


def test_cow_update_feeds_delete_plus_insert(spark, mt):
    """A COW rewrite carries unchanged rows over — exceptAll cancels
    them, so the feed holds ONLY the rows the DML touched."""
    v0 = mt.version()
    victim = mt.files()[0]
    old = spark.read.parquet(victim)
    updated = old.withColumn(
        "v", F.when(F.col("k") < 10, F.col("v") + 1).otherwise(F.col("v"))
    )
    mt.replace_files([victim], updated)
    ch = mt.changes(spark, v0)
    touched = old.where("k < 10").count()
    assert ch.where("_change_type = 'delete'").count() == touched
    assert ch.where("_change_type = 'insert'").count() == touched
    assert _rows(
        ch.where("_change_type = 'insert'"), "k", "v"
    ) == _rows(old.where("k < 10").withColumn("v", F.col("v") + 1), "k", "v")


def test_optimize_feeds_nothing(spark, mt):
    mt.append(spark.range(5).selectExpr("id + 500 AS k", "id AS v"))
    v0 = mt.version()
    mt.compact(spark, min_files=2)
    if mt.version() == v0:  # nothing compacted: nothing to assert
        pytest.skip("compaction found nothing to fold")
    assert mt.changes(spark, v0).count() == 0


def test_feed_apply_equivalence(spark, mt):
    """Applying the feed to snapshot A reproduces snapshot B exactly
    (multiset semantics): B = A + inserts - deletes."""
    v0 = mt.version()
    mt.append(spark.range(7).selectExpr("id + 3000 AS k", "id AS v"))
    victim = mt.files()[0]
    mt.replace_files(
        [victim], spark.read.parquet(victim).where("k % 3 != 0"))
    mt.append(spark.range(2).selectExpr("id + 4000 AS k", "id AS v"))
    vB = mt.version()

    a = mt.read(spark, version=v0)
    b = mt.read(spark, version=vB)
    ch = mt.changes(spark, v0, vB)
    ins = ch.where("_change_type = 'insert'").select("k", "v")
    dels = ch.where("_change_type = 'delete'").select("k", "v")
    rebuilt = a.select("k", "v").unionAll(ins).exceptAll(dels)
    assert _rows(rebuilt, "k", "v") == _rows(b, "k", "v")


def test_vacuumed_range_refuses(spark, mt):
    for i in range(3):
        mt.append(spark.range(2).selectExpr(f"id + {100 * i} AS k",
                                            "id AS v"))
    mt.vacuum(keep_versions=1)
    with pytest.raises(ValueError, match="no longer retained"):
        mt.changes(spark, 1)
    # a fully-retained range still works
    assert mt.changes(spark, mt.version()).count() == 0


def test_table_changes_sql(engine, tmp_path):
    """SQL surface: TABLE_CHANGES(t, a[, b]) composes as a relation —
    filters and aggregates apply to the feed."""
    engine.execute(
        "CREATE TABLE cdc_t AS SELECT o_orderkey AS k, o_totalprice AS v "
        "FROM orders LIMIT 50"
    )
    engine.execute("ALTER TABLE cdc_t SET FORMAT MANIFEST")
    try:
        from sclera_spark.sources.manifest import ManifestTable

        v0 = ManifestTable(engine._ddl._path("cdc_t")).version()
        engine.execute("DELETE FROM cdc_t WHERE k <= 10")
        deleted = engine.sql(
            f"SELECT count(*) AS n FROM TABLE_CHANGES(cdc_t, {v0}) "
            "WHERE _change_type = 'delete'"
        ).collect()[0]["n"]
        assert deleted == engine.sql(
            "SELECT count(*) AS n FROM orders "
            "WHERE o_orderkey <= 10"
        ).collect()[0]["n"] > 0
        # explicit upper bound + join back composes
        out = engine.sql(
            f"SELECT c.k FROM TABLE_CHANGES(cdc_t, {v0}, {v0 + 1}) c "
            "WHERE c._change_type = 'delete' ORDER BY c.k"
        ).collect()
        assert [r["k"] for r in out] == sorted(r["k"] for r in out)
    finally:
        engine.execute("DROP TABLE cdc_t")


def test_table_changes_timestamp_bounds(engine, tmp_path):
    """TABLE_CHANGES accepts quoted timestamps (resolved through the
    same commit-time lookup as TIMESTAMP AS OF) and mixes with version
    numbers."""
    import datetime as dt
    import time

    engine.execute(
        "CREATE TABLE cdc_ts AS SELECT o_orderkey AS k FROM orders LIMIT 40"
    )
    engine.execute("ALTER TABLE cdc_ts SET FORMAT MANIFEST")
    try:
        time.sleep(1.1)
        cut = dt.datetime.now(dt.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )
        time.sleep(1.1)
        engine.execute("DELETE FROM cdc_ts WHERE k <= 5")
        n = engine.sql(
            f"SELECT count(*) AS n FROM TABLE_CHANGES(cdc_ts, '{cut}') "
            "WHERE _change_type = 'delete'"
        ).first()["n"]
        want = engine.sql(
            "SELECT count(*) AS n FROM (SELECT o_orderkey AS k FROM "
            "orders LIMIT 40) WHERE k <= 5"
        ).first()["n"]
        assert n == want > 0
    finally:
        engine.execute("DROP TABLE cdc_ts")
