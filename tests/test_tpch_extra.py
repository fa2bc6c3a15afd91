"""Additional TPC-H-shaped correctness queries vs DuckDB (adapted to the
columns the synthetic tables carry — no partsupp / commitdate / shipmode,
so Q2/Q11/Q12/Q16/Q20 shapes are out of reach; these cover the remaining
canonical shapes: EXISTS-decorrelation, selective scan aggregate,
two-sided nation volume, returned-item revenue, large-order HAVING
join-back, OR-of-ANDs predicate pushdown)."""

from __future__ import annotations

import pytest

from tests.conftest import assert_df_equal_duck

from sclera_spark.engine import ScleraEngine


@pytest.fixture(scope="module")
def engine(spark, tables):
    return ScleraEngine(spark)


def _check(engine, duck, q):
    assert_df_equal_duck(engine.sql(q), duck, q)


def test_q4_shape_exists_priority(engine, duck):
    _check(engine, duck, """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 30)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


def test_q6_shape_forecast_revenue(engine, duck):
    _check(engine, duck, """
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """)


def test_q7_shape_nation_volume(engine, duck):
    _check(engine, duck, """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_regionkey <> n2.n_regionkey
          AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
          AND n1.n_nationkey <= 3 AND n2.n_nationkey <= 3
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        ORDER BY supp_nation, cust_nation, l_year
    """)


def test_q10_shape_returned_items(engine, duck):
    _check(engine, duck, """
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1994-07-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """)


def test_q18_shape_large_orders(engine, duck):
    _check(engine, duck, """
        SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
               sum(l_quantity) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
    """)


def test_q19_shape_or_of_ands(engine, duck):
    _check(engine, duck, """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """)


def test_q14_shape_conditional_revenue_share(engine, duck):
    _check(engine, duck, """
        SELECT round(
                 100.0 * sum(CASE WHEN p_type LIKE 'SMALL%'
                             THEN l_extendedprice * (1 - l_discount) END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS small_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """)
