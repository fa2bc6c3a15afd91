"""DDL/DML surface: CREATE TABLE/VIEW AS, INSERT, UPDATE, DELETE, DROP,
EXPLAIN, LIST, DESCRIBE."""

from __future__ import annotations

import pytest

from sclera_spark.engine import ScleraEngine


@pytest.fixture()
def engine(spark, tables):
    return ScleraEngine(spark)


def test_ctas_insert_update_delete(engine):
    engine.execute("""
        CREATE TABLE big_orders AS
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_totalprice > 300000
    """)
    n0 = engine.table("big_orders").count()
    assert n0 > 0

    engine.execute("INSERT INTO big_orders VALUES (9999999, 1, 999999.0)")
    assert engine.table("big_orders").count() == n0 + 1

    engine.execute("UPDATE big_orders SET o_totalprice = o_totalprice * 2 WHERE o_orderkey = 9999999")
    row = engine.table("big_orders").filter("o_orderkey = 9999999").first()
    assert row.o_totalprice == 1999998.0
    # untouched rows keep their values
    assert engine.table("big_orders").filter("o_totalprice <= 300000").count() == 0

    engine.execute("DELETE FROM big_orders WHERE o_orderkey = 9999999")
    assert engine.table("big_orders").count() == n0

    engine.execute("DROP TABLE big_orders")
    assert "big_orders" not in engine.execute("LIST TABLES")


def test_insert_query(engine):
    engine.execute("CREATE TABLE n2 AS SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5")
    n0 = engine.table("n2").count()
    engine.execute("INSERT INTO n2 SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 5")
    total = engine.table("nation").count()
    assert engine.table("n2").count() == total
    engine.execute("DROP TABLE n2")


def test_view_and_describe_and_explain(engine):
    engine.execute("CREATE VIEW asia_nations AS SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2")
    cnt = engine.sql("SELECT count(*) AS c FROM asia_nations").first().c
    assert cnt == engine.table("nation").filter("n_regionkey = 2").count()

    desc = engine.execute("DESCRIBE asia_nations")
    assert ("n_nationkey", "int") in desc

    plan = engine.execute("EXPLAIN SELECT count(*) FROM asia_nations")
    assert "Physical Plan" in plan
    engine.execute("DROP VIEW asia_nations")


def test_create_table_with_constraints(engine):
    """Parity with the reference's parser suite (SqlParseSuite.scala:29-82):
    constraint combinations accept/reject."""
    import pytest as _pytest

    # accepted forms
    engine.execute("CREATE TABLE ct1 (a INT PRIMARY KEY, b VARCHAR(10), c DECIMAL(7,2))")
    desc = dict(engine.execute("DESCRIBE ct1"))
    assert desc == {"a": "int", "b": "string", "c": "double"}
    engine.execute("INSERT INTO ct1 VALUES (1, 'x', 2.5)")
    assert engine.table("ct1").count() == 1

    engine.execute(
        "CREATE TABLE ct2 (a INT, b INT NOT NULL, PRIMARY KEY (a), "
        "FOREIGN KEY (b) REFERENCES ct1(a))"
    )
    assert dict(engine.execute("DESCRIBE ct2")) == {"a": "int", "b": "int"}

    # rejected forms
    with _pytest.raises(ValueError, match="malformed|unknown"):
        engine.execute("CREATE TABLE bad1 (a FROB)")
    with _pytest.raises(ValueError, match="malformed"):
        engine.execute("CREATE TABLE bad2 (a INT, PRIMARY KEY)")
    engine.execute("DROP TABLE ct1")
    engine.execute("DROP TABLE ct2")


def test_plain_query_through_execute(engine):
    df = engine.execute("SELECT 1 AS one")
    assert df.first().one == 1


def test_cow_dml_touches_only_matching_files(engine):
    """UPDATE/DELETE rewrite only the parquet part files that contain
    matching rows (copy-on-write; Delta/Iceberg strategy minus the log)."""
    import os

    engine.execute(
        "CREATE TABLE cow_probe AS "
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    )
    try:
        path = engine._ddl.managed["cow_probe"]
        # re-lay the table as 4 files split on o_orderkey ranges
        df = engine.table("cow_probe").repartitionByRange(4, "o_orderkey")
        engine._ddl._rewrite("cow_probe", df)
        path = engine._ddl.managed["cow_probe"]
        before = {
            f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
            if f.startswith("part-")
        }
        assert len(before) == 4
        lo = engine.sql("SELECT min(o_orderkey) AS k FROM cow_probe").collect()[0]["k"]
        n0 = engine.table("cow_probe").count()

        engine.execute(
            f"UPDATE cow_probe SET o_totalprice = -1.0 WHERE o_orderkey = {lo}"
        )
        after = {
            f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
            if f.startswith("part-")
        }
        survivors = set(before) & set(after)
        # exactly one range file was replaced; the other three survive
        assert len(set(before) - survivors) == 1
        assert all(before[f] == after[f] for f in survivors)
        assert engine.table("cow_probe").count() == n0
        got = engine.sql(
            f"SELECT o_totalprice FROM cow_probe WHERE o_orderkey = {lo}"
        ).collect()
        assert all(r["o_totalprice"] == -1.0 for r in got)

        # DELETE through the same path
        engine.execute(f"DELETE FROM cow_probe WHERE o_orderkey = {lo}")
        assert (
            engine.sql(
                f"SELECT count(*) AS c FROM cow_probe WHERE o_orderkey = {lo}"
            ).collect()[0]["c"]
            == 0
        )
        final = {
            f
            for f in os.listdir(path)
            if f.startswith("part-")
        }
        assert survivors <= final  # untouched files still in place

        # no-op DML leaves every file alone
        engine.execute("UPDATE cow_probe SET o_totalprice = 0.0 WHERE o_orderkey = -42")
        assert {
            f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
            if f.startswith("part-")
        } == {
            f: os.path.getmtime(os.path.join(path, f))
            for f in final
        }
    finally:
        engine.execute("DROP TABLE cow_probe")


def test_merge_upsert(engine):
    """MERGE INTO: matched update + not-matched insert, file-granular COW."""
    import os

    engine.execute(
        "CREATE TABLE merge_tgt AS "
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    )
    try:
        df = engine.table("merge_tgt").repartitionByRange(4, "o_orderkey")
        engine._ddl._rewrite("merge_tgt", df)
        path = engine._ddl.managed["merge_tgt"]
        before = {
            f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
            if f.startswith("part-")
        }
        lo = engine.sql("SELECT min(o_orderkey) AS k FROM merge_tgt").collect()[0]["k"]
        n0 = engine.table("merge_tgt").count()

        engine.execute(
            f"""
            MERGE INTO merge_tgt t
            USING (SELECT {lo} AS k, 111.5 AS p
                   UNION ALL SELECT -777 AS k, 222.5 AS p) s
            ON t.o_orderkey = s.k
            WHEN MATCHED THEN UPDATE SET o_totalprice = s.p * 2
            WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice) VALUES (s.k, s.p)
            """
        )
        assert engine.table("merge_tgt").count() == n0 + 1
        got = {
            r["o_orderkey"]: (r["o_totalprice"], r["o_custkey"])
            for r in engine.sql(
                f"SELECT * FROM merge_tgt WHERE o_orderkey IN ({lo}, -777)"
            ).collect()
        }
        assert got[lo][0] == 223.0          # updated via s reference
        assert got[-777] == (222.5, None)   # inserted, missing col NULL
        # only the range file holding `lo` was rewritten
        after = {
            f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
            if f.startswith("part-")
        }
        survivors = set(before) & set(after)
        assert len(set(before) - survivors) == 1
        assert all(before[f] == after[f] for f in survivors)
    finally:
        engine.execute("DROP TABLE merge_tgt")


def test_merge_matched_delete_with_guard(engine):
    engine.execute(
        "CREATE TABLE merge_del AS SELECT o_orderkey, o_totalprice FROM orders LIMIT 100"
    )
    try:
        keys = [
            r["o_orderkey"]
            for r in engine.sql(
                "SELECT o_orderkey FROM merge_del ORDER BY o_orderkey LIMIT 3"
            ).collect()
        ]
        n0 = engine.table("merge_del").count()
        engine.execute(
            f"""
            MERGE INTO merge_del t
            USING (SELECT explode(array({keys[0]}, {keys[1]}, {keys[2]})) AS k) s
            ON t.o_orderkey = s.k
            WHEN MATCHED AND t.o_orderkey <> {keys[0]} THEN DELETE
            """
        )
        assert engine.table("merge_del").count() == n0 - 2
        remaining = {
            r["o_orderkey"]
            for r in engine.sql(
                f"SELECT o_orderkey FROM merge_del WHERE o_orderkey IN "
                f"({keys[0]}, {keys[1]}, {keys[2]})"
            ).collect()
        }
        assert remaining == {keys[0]}  # guard kept the first key
    finally:
        engine.execute("DROP TABLE merge_del")


def test_merge_insert_star(engine):
    engine.execute(
        "CREATE TABLE merge_star AS SELECT o_orderkey, o_totalprice FROM orders LIMIT 10"
    )
    try:
        engine.execute(
            """
            MERGE INTO merge_star t
            USING (SELECT -1 AS o_orderkey, 9.5 AS o_totalprice) s
            ON t.o_orderkey = s.o_orderkey
            WHEN NOT MATCHED THEN INSERT *
            """
        )
        got = engine.sql(
            "SELECT o_totalprice FROM merge_star WHERE o_orderkey = -1"
        ).collect()
        assert len(got) == 1 and got[0]["o_totalprice"] == 9.5
        # idempotent on re-run: now matched, no matched clause -> no-op
        n1 = engine.table("merge_star").count()
        engine.execute(
            """
            MERGE INTO merge_star t
            USING (SELECT -1 AS o_orderkey, 9.5 AS o_totalprice) s
            ON t.o_orderkey = s.o_orderkey
            WHEN NOT MATCHED THEN INSERT *
            """
        )
        assert engine.table("merge_star").count() == n1
    finally:
        engine.execute("DROP TABLE merge_star")
