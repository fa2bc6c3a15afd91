"""Sclera extended SQL clause surface: MATCH / SPLIT in FROM."""

from __future__ import annotations

import pytest

from sclera_spark.engine import ScleraEngine


@pytest.fixture(scope="module")
def engine(spark, tables):
    return ScleraEngine(spark)


def test_match_sql_column_labeler(engine, spark):
    df = engine.sql("""
        SELECT user_id, match_id, count(*) AS n_rows
        FROM events ORDERED BY (ts, event_id) PARTITION BY user_id
             MATCH 'VIEW+ PURCHASE' ON event_type
        GROUP BY user_id, match_id
    """)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert (pdf["n_rows"] >= 2).all()

    # equivalence with the programmatic operator
    from pyspark.sql import functions as F

    from sclera_spark.operators.match import ColumnRowLabeler, match_rows

    direct = (
        match_rows(
            engine.table("events"),
            "VIEW+ PURCHASE",
            ColumnRowLabeler("event_type"),
            order_by=["ts", "event_id"],
            partition_by=["user_id"],
        )
        .groupBy("user_id", "match_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .toPandas()
    )
    key = ["user_id", "match_id"]
    assert (
        pdf.sort_values(key).reset_index(drop=True)["n_rows"]
        == direct.sort_values(key).reset_index(drop=True)["n_rows"]
    ).all()


def test_match_sql_pred_labeler(engine):
    df = engine.sql("""
        SELECT user_id, match_id,
               sum(CASE WHEN match_label = 'HI' THEN 1 ELSE 0 END) AS n_hi
        FROM events ORDERED BY (ts, event_id) PARTITION BY user_id
             MATCH 'LO+ HI' ON LABEL LO WHEN value < 50, LABEL HI WHEN value >= 50
        GROUP BY user_id, match_id
    """)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert (pdf["n_hi"] == 1).all()


def test_match_sql_requires_order(engine):
    with pytest.raises(ValueError, match="ORDERED BY"):
        engine.sql("SELECT * FROM events MATCH 'VIEW+' ON event_type")


def test_labeled_functions_sql(engine):
    df = engine.sql("""
        SELECT user_id, match_id,
               VIEW.count(*) AS n_views,
               PURCHASE.sum(value) AS purchase_value,
               count(*) AS n_rows
        FROM events ORDERED BY (ts, event_id) PARTITION BY user_id
             MATCH 'VIEW+ PURCHASE' ON event_type
        GROUP BY user_id, match_id
    """)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert (pdf["n_rows"] == pdf["n_views"] + 1).all()
    assert pdf["purchase_value"].notna().all()


def test_arg_sql(engine, duck):
    from tests.conftest import assert_df_equal_duck

    df = engine.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders PARTITION BY o_orderstatus ARG (MAX(o_orderkey))
    """)
    oracle = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
              ORDER BY o_orderkey DESC) rn FROM orders) t WHERE rn = 1
    """
    assert_df_equal_duck(df, duck, oracle)


def test_arg_multi_spec_sql(engine, duck):
    # reference grammar takes a fnspec LIST (SqlQueryParser.scala:278-298);
    # each spec contributes its own optimum row, concatenated
    from tests.conftest import assert_df_equal_duck

    df = engine.sql("""
        SELECT o_orderkey, o_custkey
        FROM orders PARTITION BY o_orderstatus
             ARG (MAX(o_totalprice), MIN(o_totalprice))
    """)
    oracle = """
    SELECT o_orderkey, o_custkey
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice DESC) rn FROM orders) t WHERE rn = 1
    UNION ALL
    SELECT o_orderkey, o_custkey
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice ASC) rn FROM orders) t WHERE rn = 1
    """
    assert_df_equal_duck(df, duck, oracle)


def test_arg_over_match_sql(engine):
    # the row with max value inside each matched funnel
    df = engine.sql("""
        SELECT user_id, event_id, value
        FROM events ORDERED BY (ts, event_id) PARTITION BY user_id
             ARG (MAX(value)) OVER MATCH 'VIEW+ PURCHASE' ON event_type
    """)
    pdf = df.toPandas()
    assert len(pdf) > 0


def test_pivot_sql(engine, duck):
    from tests.conftest import assert_df_equal_duck

    df = engine.sql("""
        SELECT * FROM lineitem PARTITION BY l_returnflag
        PIVOT sum(l_quantity) FOR l_linestatus IN ('F' AS f_qty, 'O' AS o_qty)
    """)
    oracle = """
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS f_qty,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS o_qty
    FROM lineitem GROUP BY l_returnflag
    """
    assert_df_equal_duck(df, duck, oracle)


def test_split_sql(engine, duck):
    from tests.conftest import assert_df_equal_duck

    engine.table("events").selectExpr(
        "user_id", "event_id", "value AS lo", "value + 10 AS hi"
    ).createOrReplaceTempView("iv")
    df = engine.sql("""
        SELECT user_id, event_id, s, e
        FROM iv PARTITION BY user_id SPLIT (lo, hi) INTO (s, e)
    """)
    oracle = """
    WITH iv AS (SELECT user_id, event_id, value AS lo, value + 10 AS hi FROM events),
    b AS (SELECT DISTINCT user_id, b FROM (
        SELECT user_id, lo AS b FROM iv UNION SELECT user_id, hi FROM iv)),
    atoms AS (SELECT user_id, b AS s, lead(b) OVER (PARTITION BY user_id ORDER BY b) AS e FROM b)
    SELECT iv.user_id, iv.event_id, atoms.s, atoms.e
    FROM iv JOIN atoms ON iv.user_id = atoms.user_id
    WHERE atoms.e IS NOT NULL AND iv.lo <= atoms.s AND atoms.e <= iv.hi
    """
    assert_df_equal_duck(df, duck, oracle)
