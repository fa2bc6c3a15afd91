"""Additional TPC-H-shaped correctness queries vs DuckDB (adapted to the
columns the synthetic tables carry — no partsupp / commitdate / shipmode,
so Q2/Q11/Q12/Q16/Q20 shapes are out of reach; these cover the remaining
canonical shapes: EXISTS-decorrelation, selective scan aggregate,
two-sided nation volume, returned-item revenue, large-order HAVING
join-back, OR-of-ANDs predicate pushdown, six-way star join (Q5),
left-join count distribution (Q13), twice-referenced CTE + scalar max
join-back (Q15), correlated-avg scalar subquery (Q17), double
correlated EXISTS/NOT EXISTS (Q21), anti-join against a global-average
scalar (Q22))."""

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


def test_q5_shape_local_supplier_volume(engine, duck):
    _check(engine, duck, """
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """)


def test_q13_shape_customer_distribution(engine, duck):
    _check(engine, duck, """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """)


def test_q15_shape_top_supplier_cte(engine, duck):
    _check(engine, duck, """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """)


def test_q17_shape_correlated_avg(engine, duck):
    _check(engine, duck, """
        SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem l JOIN part p ON p_partkey = l_partkey
        WHERE p_size <= 10
          AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                            FROM lineitem WHERE l_partkey = p_partkey)
    """)


def test_q21_shape_double_correlated_exists(engine, duck):
    _check(engine, duck, """
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """)


def test_q22_shape_antijoin_global_avg(engine, duck):
    _check(engine, duck, """
        SELECT c_nationkey AS cntry, count(*) AS numcust,
               round(sum(c_acctbal), 4) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderstatus = 'O')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """)
