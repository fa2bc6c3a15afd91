"""Driver contract for the spark-graft builder (PySpark target).

`queries()` maps operator-inventory names (SURVEY.md §2) to callables
(spark, sf_dir) -> DataFrame; `oracle_sql()` gives the DuckDB-equivalent
SQL for the t2 hash-comparison. Non-SQL-expressible operators (MATCH,
ALIGN, EXPMOVAVG) have no oracle entry -> rows-only check; their full
semantics are tested against pure-pandas oracles in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


_ENGINE_CACHE: dict[tuple[int, str], object] = {}
_LAST_SF: dict[int, str] = {}


def _engine(spark: SparkSession, sf_dir: str):
    from sclera_spark.engine import ScleraEngine

    key = (id(spark), sf_dir)
    eng = _ENGINE_CACHE.get(key)
    if eng is None:
        eng = ScleraEngine(spark)
        _ENGINE_CACHE[key] = eng
    # temp views are session-global: re-register whenever a different
    # sf_dir touched this session (e.g. entry() at sf0.001 then the
    # correctness gate at sf0.01)
    if _LAST_SF.get(id(spark)) != sf_dir:
        eng.add_location(sf_dir)
        _LAST_SF[id(spark)] = sf_dir
    return eng


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY.md §7) on sf0.001."""
    eng = _engine(spark, "/root/testdata/sf0.001")
    return eng.sql(_Q["q1_agg"])


# ---------------------------------------------------------------- SQL corpus

_Q: dict[str, str] = {
    "q1_agg": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               avg(l_quantity) AS avg_qty,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "multi_join": """
        SELECT n_name, count(*) AS cnt, sum(o_totalprice) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND o_orderstatus = 'F'
        GROUP BY n_name
    """,
    "left_outer_join": """
        SELECT c_custkey, o_orderkey
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_totalprice > 100000
        WHERE c_acctbal < 0
    """,
    "setop_intersect": """
        SELECT c_nationkey AS k FROM customer
        INTERSECT
        SELECT s_nationkey AS k FROM supplier
    """,
    "setop_except_all": """
        SELECT c_nationkey AS k FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS k FROM supplier
    """,
    "setop_union": """
        SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
        UNION
        SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 9000
    """,
    "subquery_in_exists": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN
              (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    """,
    "scalar_case_like": """
        SELECT p_partkey,
               CASE WHEN p_size BETWEEN 1 AND 10 THEN 'small'
                    WHEN p_size BETWEEN 11 AND 30 THEN 'medium'
                    ELSE 'large' END AS size_class,
               p_name LIKE '%green%' AS is_green,
               upper(p_brand) AS brand_u,
               length(p_name) AS name_len
        FROM part
        WHERE p_type LIKE 'SMALL%' OR p_brand = 'Brand#13'
    """,
    "scalar_math": """
        SELECT o_orderkey,
               round(o_totalprice, 1) AS r1,
               floor(o_totalprice) AS fl,
               ceil(o_totalprice) AS ce,
               abs(o_totalprice - 100000) AS ab,
               sqrt(o_totalprice) AS sq,
               round(ln(o_totalprice), 9) AS lg,
               power(o_totalprice, 0.5) AS pw,
               o_orderkey % 7 AS md
        FROM orders WHERE o_orderkey <= 2000
    """,
    "scalar_datetime": """
        SELECT o_orderkey,
               year(o_orderdate) AS y,
               month(o_orderdate) AS m,
               day(o_orderdate) AS d,
               quarter(o_orderdate) AS q
        FROM orders WHERE o_orderkey <= 2000
    """,
    "agg_stats": """
        SELECT l_returnflag,
               stddev_samp(l_quantity) AS sd,
               var_pop(l_discount) AS vp,
               corr(l_quantity, l_extendedprice) AS cor,
               covar_samp(l_quantity, l_extendedprice) AS cov,
               min(l_shipdate) AS mn, max(l_shipdate) AS mx,
               count(DISTINCT l_suppkey) AS nsupp
        FROM lineitem GROUP BY l_returnflag
    """,
    "having_group": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM lineitem GROUP BY 1, 2 HAVING count(*) > 100
    """,
    "order_limit_offset": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 20 OFFSET 10
    """,
    "distinct_rows": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "values_inline": """
        SELECT id, name, id * 2 AS twice
        FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, name)
    """,
    "conditional_fns": """
        SELECT c_custkey,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
               greatest(c_acctbal, 0.0) AS bal_pos,
               least(c_acctbal, 1000.0) AS bal_cap,
               CASE c_nationkey WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS nk
        FROM customer WHERE c_custkey <= 500
    """,
    "between_symmetric": """
        SELECT o_orderkey FROM orders
        WHERE o_totalprice BETWEEN SYMMETRIC 200000 AND 100000
          AND o_orderkey <= 2000
    """,
    "sclera_fn_names": """
        SELECT p_partkey,
               REPLACEALL(p_type, ' ', '_') AS t_us,
               STRPOS(p_name, 'red') AS pos_red
        FROM part WHERE p_partkey <= 300
    """,
    "nulls_ordering": """
        SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS p
        FROM orders WHERE o_orderkey <= 300
        ORDER BY p NULLS FIRST, o_orderkey
        LIMIT 50
    """,
    "like_escape": """
        SELECT p_partkey, p_type FROM part
        WHERE p_type LIKE '%!_%' ESCAPE '!'      -- literal underscore: none
           OR p_type LIKE 'SMALL%' ESCAPE '!'    -- escape present, unused
    """,
    "self_join": """
        SELECT a.n_name AS n1, b.n_name AS n2
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    "movavg_sql": """
        SELECT user_id, event_id,
               MOVAVG(value, 5) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ma5,
               MOVSTDDEV(value, 5) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS msd5,
               MOVSUM(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ms3
        FROM events
    """,
    "fetch_first": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey OFFSET 5 FETCH FIRST 15 ROWS ONLY
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "cube_agg": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "natural_join": """
        SELECT c_custkey, nationkey, n_name
        FROM (SELECT c_custkey, c_nationkey AS nationkey FROM customer) c
        NATURAL JOIN (SELECT n_nationkey AS nationkey, n_name FROM nation) n
        WHERE c_custkey <= 200
    """,
    "join_using": """
        SELECT c_custkey, nationkey, n_name
        FROM (SELECT c_custkey, c_nationkey AS nationkey FROM customer) c
        JOIN (SELECT n_nationkey AS nationkey, n_name FROM nation) n
        USING (nationkey)
        WHERE c_custkey <= 200
    """,
    "cross_join": """
        SELECT r1.r_name AS a, r2.r_name AS b
        FROM region r1 CROSS JOIN region r2
        WHERE r1.r_regionkey <> r2.r_regionkey
    """,
    "full_outer_join": """
        SELECT k, a_cnt, b_cnt FROM
        (SELECT c_nationkey AS k, count(*) AS a_cnt FROM customer GROUP BY 1) a
        FULL OUTER JOIN
        (SELECT s_nationkey AS k, count(*) AS b_cnt FROM supplier GROUP BY 1) b
        USING (k)
    """,
    "anti_join_not_exists": """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "scalar_subquery": """
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT avg(o_totalprice) FROM orders) AS diff_from_avg
        FROM orders WHERE o_orderkey <= 1000
    """,
    "union_all": """
        SELECT c_nationkey AS k, 'cust' AS src FROM customer WHERE c_acctbal > 9900
        UNION ALL
        SELECT s_nationkey AS k, 'supp' AS src FROM supplier WHERE s_acctbal > 9900
    """,
    "string_fns": """
        SELECT p_partkey,
               upper(p_name) AS u, lower(p_brand) AS l,
               trim(concat('  ', p_type, ' ')) AS t,
               substring(p_name, 2, 5) AS sub,
               p_brand || '-' || p_type AS cc,
               replace(p_type, 'SMALL', 'S') AS rep,
               length(p_name) AS len
        FROM part WHERE p_partkey <= 500
    """,
    "date_fns": """
        SELECT o_orderkey,
               extract(YEAR FROM o_orderdate) AS y,
               extract(MONTH FROM o_orderdate) AS m,
               date_trunc('month', o_orderdate) AS mon,
               extract(DAY FROM o_orderdate) AS d
        FROM orders WHERE o_orderkey <= 500
    """,
    "string_agg_ordered": """
        SELECT n_regionkey,
               concat_ws(',', sort_array(collect_list(n_name))) AS names
        FROM nation GROUP BY n_regionkey
    """,
    "window_nth_lead": """
        SELECT user_id, event_id,
               nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nth2,
               lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
               stddev_samp(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS movsd5
        FROM events
    """,
    "bool_aggs": """
        SELECT l_returnflag,
               bool_and(l_quantity > 0) AS all_pos,
               bool_or(l_discount > 0.09) AS any_big_disc
        FROM lineitem GROUP BY l_returnflag
    """,
    "is_distinct_from": """
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority IS DISTINCT FROM '1-URGENT'
          AND o_orderkey <= 300
    """,
    "ilike_similar": """
        SELECT p_partkey, p_name FROM part
        WHERE p_name ILIKE '%RED%' OR p_type SIMILAR TO '(SMALL|MEDIUM)%'
    """,
    "quantified_all": """
        SELECT s_suppkey, s_acctbal FROM supplier
        WHERE s_acctbal >= ALL (SELECT c_acctbal FROM customer WHERE c_custkey <= 10)
    """,
    "q3_shipping": """
        SELECT l_orderkey,
               sum(l_extendedprice * (1 - l_discount)) AS revenue,
               o_orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT n_name,
               sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
}

# DISTINCT ON goes through our front-end rewrite, so the engine-side text is
# Sclera/PostgreSQL dialect while the oracle states the window formulation.
_DISTINCT_ON_ENGINE = """
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
    FROM orders ORDER BY o_custkey, o_orderdate DESC, o_orderkey
"""
_DISTINCT_ON_ORACLE = """
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey) rn FROM orders) t
    WHERE rn = 1
"""

_WINDOW_TIER_SQL = """
    SELECT user_id, event_id,
           lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           rank() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk,
           sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum,
           avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov3
    FROM events
"""


def _sql_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _engine(spark, sf_dir).sql(_Q[name])

    return run


def _q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _engine(spark, sf_dir).sql(_DISTINCT_ON_ENGINE)


def _q_window_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _engine(spark, sf_dir).sql(_WINDOW_TIER_SQL)


def _q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.operators import pivot

    eng = _engine(spark, sf_dir)
    return pivot(
        eng.table("lineitem"),
        group_by=["l_returnflag"],
        pivot_col="l_linestatus",
        labels=["F", "O"],
        agg=F.sum("l_quantity"),
    )


def _q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.operators import unpivot

    eng = _engine(spark, sf_dir)
    return unpivot(
        eng.table("part"),
        ids=["p_partkey"],
        value_cols=["p_size", "p_retailprice"],
        key_col="k",
        value_col="v",
    )


def _q_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.operators import arg_opt

    eng = _engine(spark, sf_dir)
    # tie-break on o_orderkey so the argmax row is unique (hash-stable)
    return arg_opt(
        eng.table("orders"),
        F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("tb")),
        maximize=True,
        partition_by=["o_orderstatus"],
    )


def _q_split_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.operators import split_into

    eng = _engine(spark, sf_dir)
    ev = (
        eng.table("events")
        .select("user_id", "event_id", "value")
        .withColumn("lo", F.col("value"))
        .withColumn("hi", F.col("value") + 10)
    )
    return split_into(ev, "lo", "hi", "s", "e", partition_by=["user_id"]).select(
        "user_id", "event_id", "s", "e"
    )


def _q_match_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.operators.match import ColumnRowLabeler, label_agg, match_aggregate

    eng = _engine(spark, sf_dir)
    ev = eng.table("events").select("user_id", "event_id", "ts", "event_type", "value")
    return match_aggregate(
        ev,
        "VIEW+ PURCHASE",
        ColumnRowLabeler("event_type"),
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
        aggregates={
            "n_views": label_agg("VIEW", F.count, F.col("event_id")),
            "purchase_value": label_agg("PURCHASE", F.sum, F.col("value")),
        },
    )


def _q_expmovavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.operators import expmovavg

    eng = _engine(spark, sf_dir)
    ev = eng.table("events").select("user_id", "event_id", "ts", "value")
    return expmovavg(
        ev, "value", decay=0.3, partition_by=["user_id"], order_by=["ts", "event_id"],
        out_col="ema",
    ).select("user_id", "event_id", "ema")


def _q_align_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from sclera_spark.operators import align

    eng = _engine(spark, sf_dir)
    ev = eng.table("events")
    a = ev.filter(F.col("user_id") == 1).select(
        F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"), F.col("value").alias("a_value")
    )
    b = ev.filter(F.col("user_id") == 2).select(
        F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"), F.col("value").alias("b_value")
    )
    return align(
        a,
        b,
        dist=lambda pa, pb: np.abs(pa["a_value"].to_numpy() - pb["b_value"].to_numpy()),
        margin=10,
        order_by_a=["a_ts", "a_id"],
        order_by_b=["b_ts", "b_id"],
    )


# ------------------------------------------------------- LLM pipeline tier


def _q_match_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sclera MATCH clause through the SQL front end (rows-only: regex
    semantics have no SQL equivalent; parity vs the programmatic operator
    is tested in tests/test_extended_sql.py)."""
    eng = _engine(spark, sf_dir)
    return eng.sql("""
        SELECT user_id, match_id, count(*) AS n_rows, sum(value) AS total_value
        FROM events ORDERED BY (ts, event_id) PARTITION BY user_id
             MATCH 'VIEW+ PURCHASE' ON event_type
        GROUP BY user_id, match_id
    """)


def _q_match_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH with alternation + optional + predicate labelers (rows-only;
    NFA semantics property-tested against a brute-force oracle in
    tests/test_match_properties.py)."""
    from sclera_spark.operators.match import PredRowLabeler, match_aggregate

    eng = _engine(spark, sf_dir)
    ev = eng.table("events").select("user_id", "event_id", "ts", "event_type", "value")
    return match_aggregate(
        ev,
        "(SIGNUP | LOGIN?) (CLICK | VIEW)+ (PURCHASE | ERROR)",
        PredRowLabeler(
            [
                (F.col("event_type") == "signup", "SIGNUP"),
                (F.col("event_type") == "view", "VIEW"),
                (F.col("event_type") == "click", "CLICK"),
                (F.col("event_type") == "purchase", "PURCHASE"),
                (F.col("event_type") == "error", "ERROR"),
            ]
        ),
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
        aggregates={
            "n_rows": F.count(F.lit(1)),
            "first_ts": F.min("ts"),
            "last_ts": F.max("ts"),
        },
    )


def _q_split_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sclera SPLIT clause through the SQL front end."""
    eng = _engine(spark, sf_dir)
    eng.table("events").selectExpr(
        "user_id", "event_id", "value AS lo", "value + 10 AS hi"
    ).createOrReplaceTempView("iv")
    return eng.sql("""
        SELECT user_id, event_id, s, e
        FROM iv PARTITION BY user_id SPLIT (lo, hi) INTO (s, e)
    """)


def _q_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT * EXCEPT (cols)` projection sugar (reference star-expansion
    RelOp.scala:219-286)."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "SELECT * EXCEPT (l_tax, l_returnflag, l_linestatus) FROM lineitem WHERE l_orderkey <= 100"
    )


def _q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (extension beyond the reference; HLL values
    are implementation-specific -> rows-only)."""
    eng = _engine(spark, sf_dir)
    return eng.table("lineitem").groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey").alias("approx_supp"),
        F.percentile_approx("l_quantity", 0.5).alias("median_qty"),
    )


def _q_external_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE EXTERNAL <target> AS <query> round-trip (reference
    SqlCudParser.scala:57-60 / ExternalTarget): write an aggregate to CSV
    via the sink registry, read it back through the source registry."""
    import tempfile

    eng = _engine(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="sclera_ext_") + "/nation_counts"
    agg = eng.sql(
        "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey"
    )
    agg.coalesce(1).write.mode("overwrite").option("header", True).csv(out_dir)
    back = eng.external_source("CSV", out_dir)
    return back.select(
        F.col("n_regionkey").cast("int").alias("n_regionkey"), F.col("n").cast("long").alias("n")
    )


def _q_arg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders PARTITION BY o_orderstatus ARG (MAX(o_orderkey))
    """)


def _q_pivot_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.sql("""
        SELECT * FROM lineitem PARTITION BY l_returnflag
        PIVOT sum(l_quantity) FOR l_linestatus IN ('F' AS f_qty, 'O' AS o_qty)
    """)


def _q_labeled_fn_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-scoped aggregates (A.fn(x)) over MATCH — rows-only (regex
    semantics; parity tested in tests/test_extended_sql.py)."""
    eng = _engine(spark, sf_dir)
    return eng.sql("""
        SELECT user_id, match_id,
               VIEW.count(*) AS n_views,
               PURCHASE.sum(value) AS purchase_value
        FROM events ORDERED BY (ts, event_id) PARTITION BY user_id
             MATCH 'VIEW+ PURCHASE' ON event_type
        GROUP BY user_id, match_id
    """)


def _q_typeinfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.operators import infer_types

    eng = _engine(spark, sf_dir)
    src = eng.table("orders").selectExpr(
        "CAST(o_orderkey AS string) AS k",
        "CAST(o_totalprice AS string) AS p",
        "CAST(o_orderdate AS string) AS d",
    )
    return infer_types(src)


def _q_sequence_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SequenceSource(n) external source (reference
    external/objects/SequenceSource.scala:26-46)."""
    eng = _engine(spark, sf_dir)
    return eng.external_source("SEQUENCE", 1000)


def _q_transform_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transform extension op (reference analytics/transform/expr/
    Transform.scala:25-148, Join flavor): per-partition z-score — the
    deterministic semantics let DuckDB window SQL act as the oracle."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    from sclera_spark.operators import transform_partitions

    eng = _engine(spark, sf_dir)
    ev = eng.table("events").select("user_id", "event_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)
        pdf["zscore"] = (pdf["value"] - pdf["value"].mean()) / sd if sd and sd > 0 else 0.0
        return pdf

    out_schema = StructType(list(ev.schema.fields) + [StructField("zscore", DoubleType())])
    return transform_partitions(ev, zscore, out_schema, partition_by=["user_id"])


def _q_align_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALIGN with partition keys: per-user DTW alignment of the view
    stream against the click stream (rows-only; DP semantics tested vs
    pandas in tests/test_match_align.py)."""
    import numpy as np

    from sclera_spark.operators import align

    eng = _engine(spark, sf_dir)
    ev = eng.table("events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    return align(
        views,
        clicks,
        dist=lambda pa, pb: np.abs(pa["v_value"].to_numpy() - pb["c_value"].to_numpy()),
        margin=5,
        order_by_a=["v_ts", "v_id"],
        order_by_b=["c_ts", "c_id"],
        partition_by=["user_id"],
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.llm import dedup_exact

    eng = _engine(spark, sf_dir)
    return dedup_exact(eng.table("documents"), on=["text"], id_col="doc_id")


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.llm import minhash_dup_pairs

    eng = _engine(spark, sf_dir)
    return minhash_dup_pairs(
        eng.table("documents"), threshold=0.8, num_perm=128, bands=16, shingle_k=5
    )


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.llm import simhash_dup_pairs

    eng = _engine(spark, sf_dir)
    return simhash_dup_pairs(eng.table("documents"), max_hamming=3)


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.llm import token_count

    eng = _engine(spark, sf_dir)
    return token_count(eng.table("documents")).select("doc_id", "n_tokens")


def _q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.llm import quality_scores

    eng = _engine(spark, sf_dir)
    return quality_scores(eng.table("documents")).select(
        "doc_id", "n_chars_q", "punct_ratio", "digit_ratio"
    )


def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.llm import language_id

    eng = _engine(spark, sf_dir)
    return language_id(eng.table("documents")).select("doc_id", "lang_pred")


def _q_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of docs with identical whitespace-normalized content — found
    via 64-bit fingerprints (hash equality join), verified by the oracle
    with direct normalized-text equality."""
    from sclera_spark.llm import doc_fingerprint

    eng = _engine(spark, sf_dir)
    fp = doc_fingerprint(eng.table("documents")).select(
        F.col("doc_id").alias("id"), "fingerprint"
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, on="fingerprint", how="inner")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
    )


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.llm import cosine_topk

    eng = _engine(spark, sf_dir)
    emb = eng.table("embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return cosine_topk(emb, q, k=10)


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.llm import ann_topk

    eng = _engine(spark, sf_dir)
    emb = eng.table("embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ann_topk(emb, q, k=10, n_bits=8)


# ---------------------------------------------------- ML / NLP / streaming


def _emb_features(eng) -> DataFrame:
    df = eng.table("embeddings")
    for i in range(4):
        df = df.withColumn(f"f{i}", F.col("embedding")[i].cast("double"))
    return df.select("vec_id", "label", "f0", "f1", "f2", "f3")


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means inverted-file) ANN — the scale path where the corpus
    is partitioned by centroid list and only probed lists are scanned
    (rows-only: k-means assignment is model-specific; recall-vs-exact
    tested in tests/test_llm_ops.py::test_ivf_topk)."""
    from sclera_spark.llm import ivf_index, ivf_topk

    eng = _engine(spark, sf_dir)
    emb = eng.table("embeddings")
    dim = len(emb.select("embedding").first()[0])
    indexed, centroids = ivf_index(emb, dim, n_lists=8)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ivf_topk(indexed, centroids, q, k=10, n_probe=2)


def _q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP-bucket self-join
    (rows-only: bucket recall is probabilistic; planted-pair behavior
    tested in tests/test_llm_ops.py)."""
    from sclera_spark.llm import embedding_dup_pairs

    eng = _engine(spark, sf_dir)
    # the synthetic corpus has no true near-dups (max pairwise cosine
    # ~0.51), so the threshold is set to surface the most-similar pairs —
    # non-vacuous output while staying the same code path
    return embedding_dup_pairs(eng.table("embeddings"), threshold=0.4, n_bits=4)


def _q_classified_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.ml import MLRegistry, classify

    eng = _engine(spark, sf_dir)
    feats = _emb_features(eng)
    reg = MLRegistry()
    reg.create_classifier(
        "clf", feats, label_col="label", feature_cols=["f0", "f1", "f2", "f3"]
    )
    return classify(reg, feats, "clf", out_col="pred")


def _q_clustered_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.ml import MLRegistry, cluster

    eng = _engine(spark, sf_dir)
    feats = _emb_features(eng)
    reg = MLRegistry()
    reg.create_clusterer("km", feats, feature_cols=["f0", "f1", "f2"], k=3)
    return cluster(reg, feats, "km", out_col="cluster")


def _q_imputed_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.ml import MLRegistry, impute

    eng = _engine(spark, sf_dir)
    feats = _emb_features(eng).withColumn("target", (F.col("f0") > 0).cast("int"))
    reg = MLRegistry()
    reg.create_classifier("imp", feats, label_col="target", feature_cols=["f1", "f2", "f3"])
    holey = feats.withColumn(
        "target", F.when(F.col("vec_id") % 10 == 0, None).otherwise(F.col("target"))
    )
    return impute(reg, holey, "imp", col="target", flag_col="was_imputed")


def _q_nlp_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.nlp import nlp_op

    eng = _engine(spark, sf_dir)
    return nlp_op("tokenize", eng.table("documents"), "text").select("doc_id", "token")


def _q_nlp_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sclera_spark.nlp import nlp_op

    eng = _engine(spark, sf_dir)
    return nlp_op("sentiment", eng.table("documents"), "text").select("doc_id", "sentiment")


def _q_stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time window aggregation over a real readStream source — the
    Structured Streaming upgrade of Sclera's ordered-stream group-by. The
    collected result is oracle-checked against DuckDB time_bucket SQL."""
    from sclera_spark.streaming import run_to_memory, stream_from_directory, windowed_agg

    import tempfile

    eng = _engine(spark, sf_dir)  # registers events (ns->us conversion)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema  # ts as long
    # the file stream source requires a directory: expose the (read-only)
    # parquet file through a temp dir symlink
    d = tempfile.mkdtemp(prefix="sclera_entry_stream_")
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    stream = stream_from_directory(spark, d, raw_schema)
    stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    out = windowed_agg(
        stream,
        ts_col="ts",
        watermark="1 hour",
        window_duration="1 day",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
        keys=["event_type"],
    )
    q = run_to_memory(out, "entry_win_agg", output_mode="complete")
    result = spark.table("entry_win_agg")
    q.stop()
    return result


def _events_stream(spark: SparkSession, sf_dir: str):
    import tempfile

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    d = tempfile.mkdtemp(prefix="sclera_entry_stream_")
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    from sclera_spark.streaming import stream_from_directory

    stream = stream_from_directory(spark, d, raw_schema)
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows over a readStream source — the streaming
    sessionization upgrade (rows-only: session_window has no portable SQL
    equivalent; invariants tested in tests/test_ml_nlp_streaming.py)."""
    from sclera_spark.streaming import run_to_memory, sessionize

    _engine(spark, sf_dir)
    out = sessionize(
        _events_stream(spark, sf_dir),
        ts_col="ts",
        watermark="1 hour",
        gap="30 minutes",
        keys=["user_id"],
        aggs={"n_events": F.count(F.lit(1)), "total_value": F.sum("value")},
    )
    q = run_to_memory(out, "entry_sessions", output_mode="complete")
    result = spark.table("entry_sessions")
    q.stop()
    return result


def _q_stream_match_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental stateful MATCH over a keyed stream
    (applyInPandasWithState; O(1) state per key)."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from sclera_spark.streaming import run_to_memory, stream_match_state

    _engine(spark, sf_dir)
    stream = _events_stream(spark, sf_dir).withColumn("lab", F.upper(F.col("event_type")))
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("match_start", TimestampType()),
            StructField("match_end", TimestampType()),
            StructField("match_len", IntegerType()),
        ]
    )
    out = stream_match_state(
        stream,
        pattern="VIEW+ PURCHASE",
        label_col="lab",
        keys=["user_id"],
        ts_col="ts",
        out_schema=out_schema,
    )
    q = run_to_memory(out, "entry_stream_matches")
    result = spark.table("entry_stream_matches")
    q.stop()
    return result


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _sql_query(name) for name in _Q
    }
    out.update(
        {
            "distinct_on": _q_distinct_on,
            "window_tier": _q_window_tier,
            "pivot": _q_pivot,
            "unpivot": _q_unpivot,
            "arg_max": _q_arg_max,
            "split_intervals": _q_split_intervals,
            "match_funnel": _q_match_funnel,
            "match_sql": _q_match_sql,
            "match_alternation": _q_match_alternation,
            "split_sql": _q_split_sql,
            "star_except": _q_star_except,
            "approx_distinct": _q_approx_distinct,
            "external_target": _q_external_target,
            "arg_sql": _q_arg_sql,
            "pivot_sql": _q_pivot_sql,
            "labeled_fn_sql": _q_labeled_fn_sql,
            "typeinfer": _q_typeinfer,
            "sequence_source": _q_sequence_source,
            "expmovavg": _q_expmovavg,
            "align_users": _q_align_users,
            "align_partitioned": _q_align_partitioned,
            "transform_zscore": _q_transform_zscore,
            # LLM-pipeline tier
            "dedup_exact": _q_dedup_exact,
            "minhash_pairs": _q_minhash_pairs,
            "simhash_pairs": _q_simhash_pairs,
            "token_count": _q_token_count,
            "quality_scores": _q_quality_scores,
            "language_id": _q_language_id,
            "fingerprint_dups": _q_fingerprint_dups,
            "cosine_topk": _q_cosine_topk,
            "ann_topk": _q_ann_topk,
            "ivf_topk": _q_ivf_topk,
            "embedding_dups": _q_embedding_dups,
            # ML / NLP / streaming tier
            "classified_with": _q_classified_with,
            "clustered_with": _q_clustered_with,
            "imputed_with": _q_imputed_with,
            "nlp_tokenize": _q_nlp_tokenize,
            "nlp_sentiment": _q_nlp_sentiment,
            "stream_window_agg": _q_stream_window_agg,
            "stream_sessionize": _q_stream_sessionize,
            "stream_match_state": _q_stream_match_state,
        }
    )
    return out


def oracle_sql() -> dict[str, str]:
    oracles = dict(_Q)
    # our dialect lowers power(x, 0.5) -> sqrt(x) (IEEE-exact); DuckDB's
    # pow differs from sqrt in the last ulp on a few rows, so the oracle
    # states sqrt explicitly. ln is rounded on both sides for the same
    # reason (Java Math.log vs libm log ulp drift).
    oracles["scalar_math"] = _Q["scalar_math"].replace(
        "power(o_totalprice, 0.5)", "sqrt(o_totalprice)"
    )
    oracles["distinct_on"] = _DISTINCT_ON_ORACLE
    oracles["window_tier"] = _WINDOW_TIER_SQL
    oracles["pivot"] = """
        SELECT l_returnflag,
               sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS "F",
               sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS "O"
        FROM lineitem GROUP BY l_returnflag
    """
    oracles["unpivot"] = """
        SELECT p_partkey, 'p_size' AS k, CAST(p_size AS double) AS v FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS k, p_retailprice AS v FROM part
    """
    oracles["arg_max"] = """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM (SELECT *, row_number() OVER
                  (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey ASC) rn
              FROM orders) t WHERE rn = 1
    """
    oracles["between_symmetric"] = """
        SELECT o_orderkey FROM orders
        WHERE o_totalprice BETWEEN 100000 AND 200000 AND o_orderkey <= 2000
    """
    oracles["sclera_fn_names"] = """
        SELECT p_partkey,
               regexp_replace(p_type, ' ', '_', 'g') AS t_us,
               strpos(p_name, 'red') AS pos_red
        FROM part WHERE p_partkey <= 300
    """
    oracles["movavg_sql"] = """
        SELECT user_id, event_id,
               avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma5,
               stddev_samp(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS msd5,
               sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ms3
        FROM events
    """
    oracles["star_except"] = """
        SELECT * EXCLUDE (l_tax, l_returnflag, l_linestatus)
        FROM lineitem WHERE l_orderkey <= 100
    """
    oracles["external_target"] = """
        SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey
    """
    oracles["arg_sql"] = """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                  ORDER BY o_orderkey DESC) rn FROM orders) t WHERE rn = 1
    """
    oracles["pivot_sql"] = """
        SELECT l_returnflag,
               sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS f_qty,
               sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS o_qty
        FROM lineitem GROUP BY l_returnflag
    """
    oracles["typeinfer"] = """
        SELECT CAST(o_orderkey AS INT) AS k, o_totalprice AS p, o_orderdate AS d
        FROM orders
    """
    oracles["sequence_source"] = """
        SELECT generate_series AS seq FROM generate_series(0, 999)
    """
    oracles["transform_zscore"] = """
        SELECT user_id, event_id, value,
               CASE WHEN stddev_samp(value) OVER w > 0
                    THEN (value - avg(value) OVER w) / (stddev_samp(value) OVER w)
                    ELSE 0.0 END AS zscore
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    """
    oracles["split_sql"] = """
        WITH iv AS (SELECT user_id, event_id, value AS lo, value + 10 AS hi FROM events),
        b AS (SELECT DISTINCT user_id, b FROM (
            SELECT user_id, lo AS b FROM iv UNION SELECT user_id, hi FROM iv)),
        atoms AS (SELECT user_id, b AS s,
                         lead(b) OVER (PARTITION BY user_id ORDER BY b) AS e FROM b)
        SELECT iv.user_id, iv.event_id, atoms.s, atoms.e
        FROM iv JOIN atoms ON iv.user_id = atoms.user_id
        WHERE atoms.e IS NOT NULL AND iv.lo <= atoms.s AND atoms.e <= iv.hi
    """
    oracles["split_intervals"] = """
        WITH iv AS (SELECT user_id, event_id, value AS lo, value + 10 AS hi FROM events),
        b AS (SELECT DISTINCT user_id, b FROM (
            SELECT user_id, lo AS b FROM iv UNION SELECT user_id, hi FROM iv)),
        atoms AS (SELECT user_id, b AS s,
                         lead(b) OVER (PARTITION BY user_id ORDER BY b) AS e FROM b)
        SELECT iv.user_id, iv.event_id, atoms.s, atoms.e
        FROM iv JOIN atoms ON iv.user_id = atoms.user_id
        WHERE atoms.e IS NOT NULL AND iv.lo <= atoms.s AND atoms.e <= iv.hi
    """
    oracles["dedup_exact"] = """
        SELECT d.* FROM documents d
        JOIN (SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text) k
          ON d.doc_id = k.doc_id
    """
    oracles["token_count"] = r"""
        SELECT doc_id, length(list_filter(string_split_regex(
            regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+'),
            x -> x <> '')) AS n_tokens
        FROM documents
    """
    oracles["quality_scores"] = r"""
        SELECT doc_id,
               length(text) AS n_chars_q,
               length(regexp_replace(text, '[\w\s]', '', 'g')) /
                   greatest(length(text), 1) AS punct_ratio,
               length(regexp_replace(text, '[^0-9]', '', 'g')) /
                   greatest(length(text), 1) AS digit_ratio
        FROM documents
    """
    oracles["fingerprint_dups"] = r"""
        WITH n AS (SELECT doc_id,
                          regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
                   FROM documents)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM n a JOIN n b ON a.norm = b.norm AND a.doc_id < b.doc_id
    """
    oracles["cosine_topk"] = """
        SELECT vec_id,
               list_cosine_similarity(embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
               ) AS cosine
        FROM embeddings
        ORDER BY cosine DESC, vec_id LIMIT 10
    """
    # DuckDB's SIMILAR TO takes a regex (nonstandard: % is literal), so the
    # oracle states the ANSI %-pattern as an explicit regex
    oracles["ilike_similar"] = """
        SELECT p_partkey, p_name FROM part
        WHERE p_name ILIKE '%RED%' OR regexp_full_match(p_type, '(SMALL|MEDIUM).*')
    """
    oracles["string_agg_ordered"] = """
        SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
        FROM nation GROUP BY n_regionkey
    """
    oracles["nlp_tokenize"] = r"""
        SELECT doc_id, unnest(list_filter(string_split_regex(
            regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+'),
            x -> x <> '')) AS token
        FROM documents
    """
    oracles["stream_window_agg"] = """
        SELECT time_bucket(INTERVAL 1 DAY, ts::TIMESTAMP) AS window_start,
               time_bucket(INTERVAL 1 DAY, ts::TIMESTAMP) + INTERVAL 1 DAY AS window_end,
               event_type,
               count(*) AS n,
               sum(value) AS total
        FROM events GROUP BY 1, 2, 3
    """
    # classified_with / clustered_with / imputed_with / nlp_sentiment:
    # model- or lexicon-specific outputs -> rows-only; accuracy/behavior
    # tested in tests/test_ml_nlp_streaming.py.
    # minhash_pairs / simhash_pairs / language_id / ann_topk: probabilistic
    # or hash-family-specific -> rows-only check; exact-semantics tests with
    # planted duplicates live in tests/test_llm_ops.py.
    # match_funnel / expmovavg / align_users: no SQL equivalent ->
    # rows-only check; pandas oracles live in tests/test_match_align.py and
    # tests/test_operators.py.
    return oracles
