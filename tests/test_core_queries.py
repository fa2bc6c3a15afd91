"""Core relational surface vs DuckDB oracle (scan/filter/project/agg/join/
sort/limit/setops/distinct-on) — mirrors the driver's t2 protocol."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_df_equal_duck

from sclera_spark.engine import ScleraEngine


@pytest.fixture(scope="module")
def engine(spark, tables):
    return ScleraEngine(spark)


Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       avg(l_quantity) AS avg_qty,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def test_q1_agg(engine, duck):
    assert_df_equal_duck(engine.sql(Q1), duck, Q1)


JOIN_Q = """
SELECT n_name, count(*) AS cnt, sum(o_totalprice) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderstatus = 'F'
GROUP BY n_name
"""


def test_multi_join(engine, duck):
    assert_df_equal_duck(engine.sql(JOIN_Q), duck, JOIN_Q)


def test_outer_join(engine, duck):
    q = """
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 100000
    WHERE c_acctbal < 0
    """
    assert_df_equal_duck(engine.sql(q), duck, q)


def test_setops(engine, duck):
    q = """
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """
    assert_df_equal_duck(engine.sql(q), duck, q)
    q2 = """
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT s_nationkey AS k FROM supplier
    """
    assert_df_equal_duck(engine.sql(q2), duck, q2)


def test_subqueries(engine, duck):
    q = """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    """
    assert_df_equal_duck(engine.sql(q), duck, q)


def test_case_between_like(engine, duck):
    q = """
    SELECT p_partkey,
           CASE WHEN p_size BETWEEN 1 AND 10 THEN 'small'
                WHEN p_size BETWEEN 11 AND 30 THEN 'medium'
                ELSE 'large' END AS size_class,
           p_name LIKE '%green%' AS is_green
    FROM part
    WHERE p_type LIKE 'SMALL%' OR p_brand = 'Brand#13'
    """
    assert_df_equal_duck(engine.sql(q), duck, q)


def test_cast_colon_syntax(engine, duck):
    q_sclera = "SELECT o_orderkey, o_totalprice::int AS price_int FROM orders WHERE o_orderkey < 100"
    # Sclera/Spark cast double->int truncates (Scala .toInt); DuckDB rounds,
    # so the oracle states the truncation explicitly
    q_ansi = "SELECT o_orderkey, CAST(trunc(o_totalprice) AS int) AS price_int FROM orders WHERE o_orderkey < 100"
    assert_df_equal_duck(engine.sql(q_sclera), duck, q_ansi)


def test_limit_offset(engine, duck):
    q = "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 5"
    assert_df_equal_duck(engine.sql(q), duck, q)


def test_distinct_on(engine, duck):
    # latest order per customer — Sclera/PostgreSQL DISTINCT ON surface
    q = """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
    FROM orders ORDER BY o_custkey, o_orderdate DESC, o_orderkey"""
    assert_df_equal_duck(engine.sql(q), duck, q)


def test_values(engine, duck):
    q = "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) AS t(id, name)"
    assert_df_equal_duck(engine.sql(q), duck, q)


def test_agg_functions(engine, duck):
    q = """
    SELECT l_returnflag,
           stddev_samp(l_quantity) AS sd,
           var_pop(l_discount) AS vp,
           corr(l_quantity, l_extendedprice) AS cor,
           covar_samp(l_quantity, l_extendedprice) AS cov,
           min(l_shipdate) AS mn, max(l_shipdate) AS mx,
           count(DISTINCT l_suppkey) AS nsupp
    FROM lineitem GROUP BY l_returnflag
    """
    assert_df_equal_duck(engine.sql(q), duck, q)


def test_having_ordinal_group(engine, duck):
    q = """
    SELECT l_returnflag, l_linestatus, count(*) AS cnt
    FROM lineitem GROUP BY 1, 2 HAVING count(*) > 100
    """
    assert_df_equal_duck(engine.sql(q), duck, q)
