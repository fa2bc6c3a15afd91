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


# ---- round-5 DML semantics + durability fixes ----


def test_merge_delete_null_guard_keeps_row(engine):
    """WHEN MATCHED AND <guard> THEN DELETE must NOT delete a matched row
    whose guard evaluates to NULL (the clause does not apply)."""
    engine.execute(
        "CREATE TABLE mg_null AS SELECT o_orderkey, "
        "CASE WHEN o_orderkey % 2 = 0 THEN CAST(NULL AS DOUBLE) "
        "ELSE o_totalprice END AS g "
        "FROM orders LIMIT 20"
    )
    try:
        null_keys = {
            r["o_orderkey"]
            for r in engine.sql("SELECT o_orderkey FROM mg_null WHERE g IS NULL").collect()
        }
        assert null_keys
        n0 = engine.table("mg_null").count()
        engine.execute(
            """
            MERGE INTO mg_null t
            USING (SELECT o_orderkey FROM mg_null) s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED AND t.g > -1e18 THEN DELETE
            """
        )
        kept = {r["o_orderkey"] for r in engine.table("mg_null").collect()}
        # every NULL-guard row survives; every non-NULL guard row (g > -1e18
        # always true for real values) is deleted
        assert kept == null_keys
        assert engine.table("mg_null").count() == n0 - (n0 - len(null_keys))
    finally:
        engine.execute("DROP TABLE mg_null")


def test_delete_null_predicate_layout_independent(engine, spark):
    """DELETE keeps NULL-predicate rows in BOTH rewritten and untouched
    files — outcome must not depend on physical co-location."""
    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    # spread NULL-v rows across many files so some land in hit files
    engine.execute("LIST TABLES")  # instantiate the lazy DDL router
    engine._ddl._materialize("del_null", df.repartition(8))
    try:
        null_keys = {
            r["k"] for r in engine.sql("SELECT k FROM del_null WHERE v IS NULL").collect()
        }
        engine.execute("DELETE FROM del_null WHERE v < 50")
        kept = {r["k"] for r in engine.table("del_null").collect()}
        # all NULL rows survive, regardless of which part file they were in
        assert null_keys <= kept
        assert all(k >= 50 or k in null_keys for k in kept)
    finally:
        engine.execute("DROP TABLE del_null")


def test_merge_case_when_in_set(engine):
    """CASE WHEN inside an UPDATE SET value must not be mistaken for a
    MERGE clause boundary."""
    engine.execute(
        "CREATE TABLE mg_case AS SELECT o_orderkey, o_totalprice FROM orders LIMIT 10"
    )
    try:
        engine.execute(
            """
            MERGE INTO mg_case t
            USING (SELECT o_orderkey FROM mg_case) s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED THEN UPDATE SET
              o_totalprice = CASE WHEN t.o_totalprice > 0 THEN 1.0 ELSE 2.0 END
            """
        )
        vals = {r["o_totalprice"] for r in engine.table("mg_case").collect()}
        assert vals == {1.0}
    finally:
        engine.execute("DROP TABLE mg_case")


def test_merge_without_target_alias(engine):
    """Standard MERGE INTO t USING ... (no target alias) routes and runs,
    with the table name itself usable as the qualifier."""
    engine.execute(
        "CREATE TABLE mg_noalias AS SELECT o_orderkey, o_totalprice FROM orders LIMIT 5"
    )
    try:
        engine.execute(
            """
            MERGE INTO mg_noalias
            USING (SELECT -5 AS o_orderkey, 1.5 AS o_totalprice) s
            ON mg_noalias.o_orderkey = s.o_orderkey
            WHEN NOT MATCHED THEN INSERT *
            """
        )
        got = engine.sql(
            "SELECT o_totalprice FROM mg_noalias WHERE o_orderkey = -5"
        ).collect()
        assert len(got) == 1 and got[0]["o_totalprice"] == 1.5
    finally:
        engine.execute("DROP TABLE mg_noalias")


def test_cow_commit_crash_loses_no_rows(engine, spark, monkeypatch):
    """Crash injected between publishing staged parts and deleting the
    replaced originals: every pre-DML row is still present (duplicates
    allowed, loss not)."""
    import os

    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    engine.execute("LIST TABLES")
    engine._ddl._materialize("crash_t", df.repartition(8))
    try:
        before = sorted(r["k"] for r in engine.table("crash_t").collect())

        real_remove = os.remove

        def exploding_remove(p):
            raise RuntimeError("injected crash before delete-originals")

        monkeypatch.setattr(os, "remove", exploding_remove)
        try:
            engine.execute("UPDATE crash_t SET k = k + 10000 WHERE k < 10")
        except RuntimeError:
            pass
        monkeypatch.setattr(os, "remove", real_remove)

        after = [r["k"] for r in engine.table("crash_t").collect()]
        # old rows all survive (k<10 rows exist in the old file AND as
        # k+10000 in the published staged file); nothing lost
        assert set(before) <= {k if k < 10000 else k - 10000 for k in after} | set(after)
        for k in before:
            assert k in after or (k + 10000) in after
    finally:
        engine.execute("DROP TABLE crash_t")


def test_local_hit_paths_rejects_object_store():
    from sclera_spark.plans.ddl import DdlRouter

    assert DdlRouter._local_hit_paths(
        ["s3a://bucket/table/part-0.parquet", "/tmp/t/part-1.parquet"]
    ) is None
    assert DdlRouter._local_hit_paths(
        ["hdfs://nn:8020/t/part-0.parquet"]
    ) is None
    got = DdlRouter._local_hit_paths(
        ["file:///tmp/t/part-0.parquet", "/tmp/t/part-1.parquet"]
    )
    assert got == ["/tmp/t/part-0.parquet", "/tmp/t/part-1.parquet"]


def test_cow_file_cap_falls_back_to_full_rewrite(engine, spark, monkeypatch):
    """With the cap at 0, DELETE/MERGE take the distributed full-rewrite
    path and still produce correct results."""
    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    engine.execute("LIST TABLES")
    engine._ddl._materialize("cap_t", df.repartition(4))
    monkeypatch.setattr(type(engine._ddl), "cow_file_cap", 0)
    try:
        engine.execute("DELETE FROM cap_t WHERE k < 50")
        assert engine.table("cap_t").count() == 50
        engine.execute(
            """
            MERGE INTO cap_t t
            USING (SELECT 60 AS k) s ON t.k = s.k
            WHEN MATCHED THEN DELETE
            """
        )
        kept = {r["k"] for r in engine.table("cap_t").collect()}
        assert 60 not in kept and len(kept) == 49
    finally:
        engine.execute("DROP TABLE cap_t")


def test_list_classifiers_clusterers(spark, tables):
    """LIST/DESCRIBE CLASSIFIERS|CLUSTERERS [name] (reference
    SqlAdminParser.scala:128-132) — r7 admin-surface completion."""
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    for name, df in tables.items():
        engine.add_table(name, df)
    engine.execute(
        "CREATE CLASSIFIER ('stump') bigqty (big) USING "
        "SELECT l_quantity, l_discount, "
        "CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS big "
        "FROM lineitem LIMIT 500"
    )
    engine.execute(
        "CREATE CLUSTERER ('voronoi', '3') qgrp USING "
        "SELECT l_quantity, l_extendedprice FROM lineitem LIMIT 200"
    )
    assert engine.execute("LIST CLASSIFIERS") == ["BIGQTY"]
    assert engine.execute("LIST CLUSTERERS") == ["QGRP"]
    desc = engine.execute("DESCRIBE CLASSIFIER bigqty")
    assert desc[0][0] == "BIGQTY" and desc[0][1] == "classifier"
    assert "l_quantity" in desc[0][2]
    with pytest.raises(KeyError):
        engine.execute("LIST CLUSTERERS nosuch")
    engine.execute("DROP CLASSIFIER bigqty")
    assert engine.execute("LIST CLASSIFIERS") == []


def test_list_remaining(spark, tables, tmp_path):
    """LIST REMAINING [loc] (SqlAdminParser.scala:109-113): tables at a
    location not yet registered in the catalog."""
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    d = str(tmp_path / "ploc")
    spark.range(5).toDF("x").write.parquet(d + "/alpha.parquet")
    spark.range(5).toDF("y").write.parquet(d + "/beta.parquet")
    engine.execute(f"ADD LOCATION ploc AS PARQUETDIR ('{d}')")
    # PARQUETDIR registers its tables eagerly -> nothing remains
    assert engine.execute("LIST REMAINING ploc") == []
    # drop one from the catalog: it is now 'remaining' at the location
    engine.execute("REMOVE TABLE beta")
    assert engine.execute("LIST REMAINING ploc") == [("ploc", "beta")]
    with pytest.raises(KeyError):
        engine.execute("LIST REMAINING nowhere")


def test_explain_script_mode(spark, tables):
    """EXPLAIN SCRIPT ON|OFF (SqlAdminParser.scala:153-163): while on,
    every query records its formatted physical plan."""
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    for name, df in tables.items():
        engine.add_table(name, df)
    assert "ON" in engine.execute("EXPLAIN SCRIPT ON")
    engine.sql("SELECT count(*) AS n FROM region").collect()
    assert len(engine.script_explains) == 1
    q, plan = engine.script_explains[0]
    assert "region" in q and "Physical Plan" in plan
    engine.execute("EXPLAIN SCRIPT OFF")
    engine.sql("SELECT 1").collect()
    assert len(engine.script_explains) == 1  # no longer recording


def test_describe_pg_catalog_qualified(spark, tables):
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    for name, df in tables.items():
        engine.add_table(name, df)
    cols = dict(engine.execute("DESCRIBE pg_catalog.pg_class"))
    assert "relname" in cols


def test_show_create_table(spark, tables):
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    engine.execute(
        "CREATE TABLE sct AS SELECT CAST(1 AS BIGINT) AS k, 'x' AS s"
    )
    engine.execute("ALTER TABLE sct SET FORMAT MANIFEST")
    engine.execute("ALTER TABLE sct SET BLOOM FILTER (s) FPP 0.02")
    engine.execute("CREATE VIEW sct_v AS SELECT k FROM sct")
    try:
        out = engine.execute("SHOW CREATE TABLE sct")[0]["create_sql"]
        assert "k BIGINT" in out and "s STRING" in out
        assert "SET FORMAT MANIFEST" in out
        assert "SET BLOOM FILTER (s) FPP 0.02" in out
        vout = engine.execute("SHOW CREATE TABLE sct_v")[0]["create_sql"]
        assert vout == "CREATE VIEW sct_v AS SELECT k FROM sct"
    finally:
        engine.execute("DROP VIEW sct_v")
        engine.execute("DROP TABLE sct")


def test_drop_recreate_same_name_serves_fresh_data(engine):
    """DROP + re-CREATE under the same name restarts the manifest at
    version 1 — every cache keyed on (name, version) must be evicted
    at drop time or the recreated table would serve the DELETED
    files (stale _mread_cache / engine plan caches)."""
    engine.execute(
        "CREATE TABLE rc AS SELECT o_orderkey AS k, o_totalprice AS v "
        "FROM orders WHERE o_orderkey < 100"
    )
    engine.execute("ALTER TABLE rc SET FORMAT MANIFEST")
    n1 = engine.sql("SELECT count(*) AS n FROM rc").first().n
    s1 = engine.sql(
        "SELECT sum(v) AS s FROM rc WHERE k < 50"
    ).first().s
    assert n1 > 0 and s1 is not None

    engine.execute("DROP TABLE rc")
    engine.execute(
        "CREATE TABLE rc AS SELECT o_orderkey AS k, "
        "CAST(0.0 AS DOUBLE) AS v "
        "FROM orders WHERE o_orderkey < 10"
    )
    engine.execute("ALTER TABLE rc SET FORMAT MANIFEST")
    # same name, same version number (1), different data: both the
    # repeated probe (plan cache) and the registration (_mread_cache)
    # must see the NEW table
    assert engine.sql("SELECT count(*) AS n FROM rc").first().n < n1
    assert engine.sql(
        "SELECT sum(v) AS s FROM rc WHERE k < 50"
    ).first().s == 0.0
    engine.execute("DROP TABLE rc")


def test_cow_hit_collect_is_capped_before_materializing(
    engine, spark, monkeypatch
):
    """A broad DML on a many-file manifest table must trip the COW cap
    WITHOUT collecting the full hit-file list: the probe carries
    LIMIT cap+1, so the driver never sees more than cap+1 paths even
    when every file matches."""
    from pyspark.sql import functions as F

    from sclera_spark.plans import ddl as ddlmod

    df = spark.range(0, 200).select(F.col("id").alias("k"))
    engine.execute("LIST TABLES")  # init the DDL layer
    engine._ddl._materialize("cap_m", df.repartition(8))
    engine.execute("ALTER TABLE cap_m SET FORMAT MANIFEST")
    assert len(engine.ddl()._manifest("cap_m").files()) >= 8

    seen: list[int] = []
    orig = ddlmod.DdlRouter._local_hit_paths.__func__ if hasattr(
        ddlmod.DdlRouter._local_hit_paths, "__func__"
    ) else ddlmod.DdlRouter._local_hit_paths

    def spy(hit_uris):
        seen.append(len(hit_uris))
        return orig(hit_uris)

    monkeypatch.setattr(ddlmod.DdlRouter, "_local_hit_paths", staticmethod(spy))
    monkeypatch.setattr(type(engine._ddl), "cow_file_cap", 2)
    try:
        # every file matches: cap (2) + 1 = at most 3 paths driver-side
        engine.execute("UPDATE cap_m SET k = k + 1000 WHERE k >= 0")
        assert engine.table("cap_m").count() == 200
        assert engine.sql(
            "SELECT min(k) AS lo FROM cap_m"
        ).first().lo == 1000
        assert seen and all(n <= 3 for n in seen), seen
        seen.clear()
        engine.execute(
            """
            MERGE INTO cap_m t
            USING (SELECT id + 1000 AS k FROM range(200)) s ON t.k = s.k
            WHEN MATCHED THEN DELETE
            """
        )
        assert engine.table("cap_m").count() == 0
        assert seen and all(n <= 3 for n in seen), seen
    finally:
        engine.execute("DROP TABLE cap_m")


def test_set_auto_compact_ddl(engine, spark):
    """ALTER TABLE t SET AUTO COMPACT: repeated small INSERTs keep the
    live-file count bounded; DROP AUTO COMPACT stops the folding."""
    engine.execute("CREATE TABLE ac AS SELECT 1 AS k")
    engine.execute("ALTER TABLE ac SET FORMAT MANIFEST")
    engine.execute("ALTER TABLE ac SET AUTO COMPACT TARGET 64 MB MIN FILES 3")
    try:
        for i in range(6):
            engine.execute(f"INSERT INTO ac VALUES ({i + 10})")
        mt = engine.ddl()._manifest("ac")
        assert len(mt.files()) <= 3
        assert engine.table("ac").count() == 7
        engine.execute("ALTER TABLE ac DROP AUTO COMPACT")
        n0 = len(mt.files())
        for i in range(3):
            engine.execute(f"INSERT INTO ac VALUES ({i + 50})")
        assert len(mt.files()) == n0 + 3  # no folding anymore
    finally:
        engine.execute("DROP TABLE ac")


def test_txn_stage_dml_is_capped_and_refuses_over_cap(
    engine, spark, monkeypatch
):
    """r11 scale guard: the transactional DML staging path inherits the
    capped probe — a broad predicate on a many-file table collects at
    most cap+1 paths driver-side and then REFUSES (0A000-shaped)
    instead of silently staging a whole-table rewrite inside the
    transaction; WHERE-less rewrites refuse outright."""
    from pyspark.sql import functions as F

    import sclera_spark.plans.ddl as ddlmod
    from sclera_spark.plans.ddl import TxnDmlRefused

    df = spark.range(0, 200).select(F.col("id").alias("k"))
    engine.execute("LIST TABLES")
    engine._ddl._materialize("cap_tx", df.repartition(8))
    engine.execute("ALTER TABLE cap_tx SET FORMAT MANIFEST")
    seen: list[int] = []
    orig = ddlmod.DdlRouter._local_hit_paths.__func__ if hasattr(
        ddlmod.DdlRouter._local_hit_paths, "__func__"
    ) else ddlmod.DdlRouter._local_hit_paths

    def spy(hit_uris):
        seen.append(len(hit_uris))
        return orig(hit_uris)

    monkeypatch.setattr(
        ddlmod.DdlRouter, "_local_hit_paths", staticmethod(spy)
    )
    monkeypatch.setattr(type(engine._ddl), "cow_file_cap", 2)
    try:
        with pytest.raises(TxnDmlRefused, match="more than 2"):
            engine.ddl().txn_stage_dml(
                "UPDATE cap_tx SET k = k + 1 WHERE k >= 0", set()
            )
        assert seen and all(n <= 3 for n in seen), seen
        with pytest.raises(TxnDmlRefused, match="without WHERE"):
            engine.ddl().txn_stage_dml("DELETE FROM cap_tx", set())
        # a selective statement still stages fine under the same cap
        name, staged, removes, n, verb, _created = engine.ddl().txn_stage_dml(
            "DELETE FROM cap_tx WHERE k = 5", set()
        )
        assert verb == "DELETE" and n == 1 and len(removes) == 1
        if staged is not None:
            from sclera_spark.sources.manifest import ManifestTable

            ManifestTable.discard_staged([staged])
        # nothing committed by any of the above
        assert engine.table("cap_tx").count() == 200
    finally:
        engine.execute("DROP TABLE cap_tx")


def test_truncate_table(engine, spark):
    """TRUNCATE [TABLE] t — pg's unconditional DELETE: one atomic
    commit on a manifest table, pre-truncate version time-travels."""
    engine.execute("CREATE TABLE trn AS SELECT 1 AS k UNION ALL SELECT 2")
    engine.execute("ALTER TABLE trn SET FORMAT MANIFEST")
    try:
        engine.execute("TRUNCATE TABLE trn")
        assert engine.table("trn").count() == 0
        mt = engine.ddl()._manifest("trn")
        assert mt.read(spark, version=mt.version() - 1).count() == 2
        engine.execute("INSERT INTO trn VALUES (5)")
        assert engine.table("trn").count() == 1
    finally:
        engine.execute("DROP TABLE trn")
