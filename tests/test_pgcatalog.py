"""pg_catalog virtual-table tier (reference pgcatalog/PgCatalogSource.scala,
PgCatalogFunction.scala) — the introspection surface PostgreSQL clients
probe."""

from __future__ import annotations

import pytest

from sclera_spark.engine import ScleraEngine


@pytest.fixture()
def engine(spark, tables):
    return ScleraEngine(spark)


def test_pg_class_lists_tables_and_views(engine):
    engine.execute("CREATE VIEW pgcat_probe_v AS SELECT r_regionkey FROM region")
    try:
        rows = {
            r["relname"]: r["relkind"]
            for r in engine.sql(
                "SELECT relname, relkind FROM pg_class"
            ).collect()
        }
        assert rows.get("region") == "r"
        assert rows.get("lineitem") == "r"
        assert rows.get("pgcat_probe_v") == "v"
        # the pg_catalog tables themselves are not relations
        assert "pg_class" not in rows
    finally:
        engine.execute("DROP VIEW pgcat_probe_v")


def test_pg_attribute_joins_pg_class(engine):
    # the canonical client introspection join: columns of one table in order
    out = engine.sql(
        """
        SELECT a.attname, a.attnum, a.attnotnull
        FROM pg_catalog.pg_attribute a
        JOIN pg_catalog.pg_class c ON a.attrelid = c.oid
        WHERE c.relname = 'region'
        ORDER BY a.attnum
        """
    ).collect()
    names = [r["attname"] for r in out]
    assert names == ["r_regionkey", "r_name"]
    assert [r["attnum"] for r in out] == [1, 2]


def test_pg_attribute_type_oids(engine):
    out = {
        r["attname"]: r["atttypid"]
        for r in engine.sql(
            """
            SELECT a.attname, a.atttypid
            FROM pg_attribute a JOIN pg_class c ON a.attrelid = c.oid
            WHERE c.relname = 'lineitem'
            """
        ).collect()
    }
    assert out["l_orderkey"] == 20      # int8
    assert out["l_quantity"] == 701     # float8
    assert out["l_returnflag"] == 1043  # varchar


def test_pg_type_and_namespace(engine):
    t = {
        r["typname"]: r["oid"]
        for r in engine.sql("SELECT typname, oid FROM pg_type").collect()
    }
    assert t["bool"] == 16 and t["int4"] == 23 and t["varchar"] == 1043
    ns = [r["nspname"] for r in engine.sql("SELECT nspname FROM pg_namespace").collect()]
    assert "sclera" in ns
    assert engine.sql("SELECT * FROM pg_attrdef").count() == 0


def test_pg_catalog_functions(engine):
    row = engine.sql(
        """
        SELECT pg_get_userbyid(0) AS owner,
               pg_table_is_visible(17) AS vis,
               pg_get_expr('x', 1) AS expr,
               format_type(20) AS t20,
               format_type(1043) AS t1043
        FROM sequence(1)
        """
    ).collect()[0]
    assert row["owner"] == "sclera"
    assert row["vis"] is True
    assert row["expr"] is None
    assert row["t20"] == "bigint"
    assert row["t1043"] == "varchar"


def test_engine_table_resolves_pg_names(engine):
    assert engine.table("pg_catalog.pg_namespace").count() >= 1
    assert "relname" in engine.table("pg_class").columns


def test_pg_class_reflects_new_tables(engine):
    engine.execute("CREATE TABLE pgcat_probe_t AS SELECT 1 AS x")
    try:
        rels = [
            r["relname"]
            for r in engine.sql("SELECT relname FROM pg_class").collect()
        ]
        assert "pgcat_probe_t" in rels
    finally:
        engine.execute("DROP TABLE pgcat_probe_t")


def test_pg_class_hides_scratch_views(engine, spark):
    """Engine scratch temp views (__-prefixed) must not leak into client
    introspection via pg_class."""
    spark.range(1).createOrReplaceTempView("__sclera_ext_999")
    spark.range(1).createOrReplaceTempView("__merge_probe")
    try:
        rels = {
            r["relname"]
            for r in engine.sql("SELECT relname FROM pg_class").collect()
        }
        assert not {n for n in rels if n.startswith("__")}
    finally:
        spark.catalog.dropTempView("__sclera_ext_999")
        spark.catalog.dropTempView("__merge_probe")
