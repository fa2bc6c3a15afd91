"""Dialect front-end regressions: paren casts, quoted SYMMETRIC bounds,
ANSI NULL semantics of quantified comparisons, floor/ceil DOUBLE typing,
POWER(x, 0.5) -> sqrt."""

from __future__ import annotations

import pytest

from sclera_spark.engine import ScleraEngine
from sclera_spark.plans.frontend import dialect_rewrite


@pytest.fixture(scope="module")
def engine(spark, tables):
    return ScleraEngine(spark)


def test_paren_cast_untouched():
    # (a+b)::int must be left to Spark's native ::, not mangled
    assert "(c_acctbal + 1)::int" in dialect_rewrite(
        "SELECT (c_acctbal + 1)::int AS x FROM customer"
    )


def test_paren_cast_executes(engine):
    rows = engine.sql(
        "SELECT (c_acctbal + 1)::int AS x FROM customer WHERE c_custkey = 1"
    ).collect()
    assert len(rows) == 1 and isinstance(rows[0].x, int)


def test_simple_cast_rewritten():
    out = dialect_rewrite("SELECT a.b::decimal(10,2) FROM t")
    assert "CAST(a.b AS decimal(10,2))" in out


def test_symmetric_string_bounds(engine):
    sym = {
        r.n_name
        for r in engine.sql(
            "SELECT n_name FROM nation WHERE n_name BETWEEN SYMMETRIC 'NATION_5' AND 'NATION_1'"
        ).collect()
    }
    plain = {
        r.n_name
        for r in engine.sql(
            "SELECT n_name FROM nation WHERE n_name BETWEEN 'NATION_1' AND 'NATION_5'"
        ).collect()
    }
    assert sym == plain and sym


def test_symmetric_numeric_bounds(engine):
    a = engine.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice BETWEEN SYMMETRIC 200000 AND 100000"
    ).collect()[0].n
    b = engine.sql(
        "SELECT count(*) AS n FROM orders WHERE o_totalprice BETWEEN 100000 AND 200000"
    ).collect()[0].n
    assert a == b > 0


def test_floor_ceil_type_preserving(engine):
    # reference preserves the input type (ScalFunctionEvaluator.scala:119-156):
    # floating args stay DOUBLE, integer args stay integral (no 2^53 corruption)
    row = engine.sql(
        "SELECT floor(o_totalprice) AS fl, ceil(o_totalprice) AS ce, "
        "ceiling(o_totalprice) AS ce2, floor(o_orderkey) AS fi, "
        "ceil(o_orderkey + 1) AS ci "
        "FROM orders WHERE o_orderkey = 1"
    ).collect()[0]
    assert isinstance(row.fl, float) and isinstance(row.ce, float)
    assert isinstance(row.ce2, float)
    assert isinstance(row.fi, int) and isinstance(row.ci, int)


def test_floor_bigint_above_2_53(engine):
    # the old unconditional CAST(... AS DOUBLE) silently corrupted BIGINTs
    # above 2^53; the type-preserving lowering must round-trip exactly
    big = (1 << 53) + 1
    row = engine.sql(f"SELECT floor(CAST({big} AS BIGINT)) AS v").collect()[0]
    assert row.v == big and isinstance(row.v, int)


def test_floor_nondeterministic_arg(engine):
    # RAND() cannot be restated in the identity; result is a plain double
    # floor in [0, 1) -> exactly 0.0
    row = engine.sql("SELECT floor(rand()) AS v").collect()[0]
    assert row.v == 0.0 and isinstance(row.v, float)


def test_sclera_datetime_fn_names_sql(engine, duck):
    # reference ScalFunctionEvaluator.scala:791-1445: ms-based arithmetic
    from tests.conftest import assert_df_equal_duck

    df = engine.sql("""
        SELECT o_orderkey,
               TIMESTAMP_ADD(o_orderdate, HOURS(6)) AS ts6h,
               CAST(DATE_ADD(o_orderdate, DAYS(10)) AS TIMESTAMP) AS d10,
               TIME_DIFF(TIME_ADD(o_orderdate, MINUTES(90)), o_orderdate) AS ms90,
               DATE_DIFF(o_orderdate, DATE '1995-01-01') AS msd,
               TIMESTAMP_UNIX(o_orderdate) AS unix_ms,
               SCALE(o_totalprice, 1) AS sc1,
               MILLISECONDS(5) AS u_ms, SECONDS(2) AS u_s,
               MINUTES(3) AS u_mi, HOURS(4) AS u_h, DAYS(1) AS u_d,
               TOUTC(o_orderdate) AS utc_ts,
               TOTIMEZONE(o_orderdate, 'UTC') AS tz_ts,
               TOTIME('01-02-1995', 'DD-MM-YYYY') AS tt
        FROM orders WHERE o_orderkey <= 100
    """)
    oracle = """
        SELECT o_orderkey,
               CAST(o_orderdate AS TIMESTAMP) + INTERVAL 6 HOUR AS ts6h,
               CAST(o_orderdate AS TIMESTAMP) + INTERVAL 10 DAY AS d10,
               CAST(5400000 AS BIGINT) AS ms90,
               CAST(datediff('ms', TIMESTAMP '1995-01-01',
                    CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS msd,
               CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS unix_ms,
               round(o_totalprice, 1) AS sc1,
               CAST(5 AS BIGINT) AS u_ms, CAST(2000 AS BIGINT) AS u_s,
               CAST(180000 AS BIGINT) AS u_mi, CAST(14400000 AS BIGINT) AS u_h,
               CAST(86400000 AS BIGINT) AS u_d,
               CAST(o_orderdate AS TIMESTAMP) AS utc_ts,
               CAST(o_orderdate AS TIMESTAMP) AS tz_ts,
               strptime('01-02-1995', '%d-%m-%Y') AS tt
        FROM orders WHERE o_orderkey <= 100
    """
    assert_df_equal_duck(df, duck, oracle)


def test_string_agg_order_by_other_column(engine, duck):
    # ordered by a position column, not the aggregated value
    # (reference SeqAggregate.scala:1201-1365 orders by sequence position)
    from tests.conftest import assert_df_equal_duck

    df = engine.sql("""
        SELECT n_regionkey,
               STRING_AGG(n_name, ',' ORDER BY n_nationkey DESC) AS names,
               PATH(n_name ORDER BY n_nationkey) AS name_path
        FROM nation GROUP BY n_regionkey
    """)
    oracle = """
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_nationkey DESC) AS names,
               string_agg(n_name, '/' ORDER BY n_nationkey) AS name_path
        FROM nation GROUP BY n_regionkey
    """
    assert_df_equal_duck(df, duck, oracle)


def test_string_agg_order_by_python_api(spark, tables):
    from pyspark.sql import functions as F

    from sclera_spark.functions.aggregates import path, string_agg

    df = (
        spark.table("nation")
        .groupBy("n_regionkey")
        .agg(
            string_agg(
                F.col("n_name"), ",", order_by=[-F.col("n_nationkey")]
            ).alias("names"),
            path(F.col("n_name"), order_by=[F.col("n_nationkey")]).alias("p"),
        )
    )
    row = {r.n_regionkey: (r.names, r.p) for r in df.collect()}
    expect = (
        spark.table("nation")
        .select("n_regionkey", "n_nationkey", "n_name")
        .collect()
    )
    import collections

    by_region = collections.defaultdict(list)
    for r in expect:
        by_region[r.n_regionkey].append((r.n_nationkey, r.n_name))
    for rk, pairs in by_region.items():
        names_desc = ",".join(n for _, n in sorted(pairs, reverse=True))
        path_asc = "/".join(n for _, n in sorted(pairs))
        assert row[rk] == (names_desc, path_asc)


def test_randomstr_sql(engine):
    rows = engine.sql(
        "SELECT RANDOMSTR(12) AS s FROM region"
    ).collect()
    assert all(len(r.s) == 12 and r.s.isalnum() for r in rows)
    assert len({r.s for r in rows}) > 1


def test_power_half_is_sqrt():
    out = dialect_rewrite("SELECT power(x, 0.5), power(x, 2) FROM t")
    assert "sqrt(x)" in out and "power(x, 2)" in out


@pytest.fixture(scope="module")
def quant_tables(spark):
    spark.createDataFrame(
        [(1,), (5,), (None,)], "v int"
    ).createOrReplaceTempView("qsub_nulls")
    spark.createDataFrame([(1,), (5,)], "v int").createOrReplaceTempView("qsub_vals")
    spark.createDataFrame([(1,)], "v int").filter("v < 0").createOrReplaceTempView(
        "qsub_empty"
    )
    spark.createDataFrame(
        [(0, 0), (1, 3), (2, 6), (3, None)], "id int, x int"
    ).createOrReplaceTempView("qprobe")


def _ids(engine, where: str) -> set[int]:
    return {
        r.id
        for r in engine.sql(f"SELECT id FROM qprobe WHERE {where}").collect()
    }


def test_quantified_all_null_semantics(engine, quant_tables):
    # x > ALL {1,5,NULL}: 6 > 5 but NULL element -> UNKNOWN -> filtered out;
    # 3 <= 5 -> FALSE regardless of the NULL
    assert _ids(engine, "x > ALL (SELECT v FROM qsub_nulls)") == set()
    # without the NULL element 6 passes
    assert _ids(engine, "x > ALL (SELECT v FROM qsub_vals)") == {2}
    # empty subquery: ALL is vacuously TRUE (even for NULL x)
    assert _ids(engine, "x > ALL (SELECT v FROM qsub_empty)") == {0, 1, 2, 3}
    # NOT (x > ALL): FALSE rows come back, UNKNOWN rows do not
    assert _ids(engine, "NOT (x > ALL (SELECT v FROM qsub_nulls))") == {0, 1}


def test_quantified_any_null_semantics(engine, quant_tables):
    # x > ANY {1,5,NULL}: 3,6 > 1 -> TRUE; 0 -> no pass + NULL -> UNKNOWN
    assert _ids(engine, "x > ANY (SELECT v FROM qsub_nulls)") == {1, 2}
    assert _ids(engine, "NOT (x > ANY (SELECT v FROM qsub_nulls))") == set()
    # without NULL element: 0 -> FALSE, so NOT returns it
    assert _ids(engine, "NOT (x > ANY (SELECT v FROM qsub_vals))") == {0}
    # empty subquery: ANY is FALSE
    assert _ids(engine, "x > ANY (SELECT v FROM qsub_empty)") == set()
    assert _ids(engine, "NOT (x > ANY (SELECT v FROM qsub_empty))") == {0, 1, 2, 3}


def test_quantified_eq_all(engine, quant_tables):
    engine.spark.createDataFrame([(5,), (5,)], "v int").createOrReplaceTempView(
        "qsub_const"
    )
    assert _ids(engine, "(x + 1) = ALL (SELECT v FROM qsub_const)") == set()
    assert _ids(engine, "x = ALL (SELECT v FROM qsub_const)") == set()
    engine.spark.createDataFrame([(3,), (3,)], "v int").createOrReplaceTempView(
        "qsub_const3"
    )
    assert _ids(engine, "x = ALL (SELECT v FROM qsub_const3)") == {1}
    assert _ids(engine, "x <> ANY (SELECT v FROM qsub_const3)") == {0, 2}


def test_quantified_nested_paren_operand(engine, quant_tables):
    # `(x + abs(x)) > ALL (subq)` — nested parens in the operand broke the
    # old `\([^()]*\)` capture (the ALL passed through and Spark errored)
    # x+abs(x) = 0, 6, 12, NULL vs {1, 5}
    assert _ids(engine, "(x + abs(x)) > ALL (SELECT v FROM qsub_vals)") == {1, 2}
    assert _ids(engine, "(x + abs(x)) < ANY (SELECT v FROM qsub_vals)") == {0}
    # function-call operand
    assert _ids(engine, "abs(x) > ALL (SELECT v FROM qsub_vals)") == {2}


def test_similar_to_paren_operand(engine):
    # `(expr) SIMILAR TO 'p'` used to capture a bare ')' -> invalid SQL
    rows = engine.sql(
        "SELECT n_name FROM nation "
        "WHERE (n_name || '') SIMILAR TO 'NATION_(1|2)' "
    ).collect()
    assert {r.n_name for r in rows} == {"NATION_1", "NATION_2"}
    rows2 = engine.sql(
        "SELECT n_name FROM nation WHERE upper(n_name) SIMILAR TO 'NATION._'"
    ).collect()
    assert len(rows2) > 0


def test_distinct_on_paren_expr(engine):
    # expression with parens in the ON list (broke the old [^)]* capture)
    rows = engine.sql("""
        SELECT DISTINCT ON (date_trunc('month', o_orderdate)) o_orderkey, o_orderdate
        FROM orders ORDER BY date_trunc('month', o_orderdate), o_orderdate, o_orderkey
    """).collect()
    months = {(r.o_orderdate.year, r.o_orderdate.month) for r in rows}
    assert len(rows) == len(months) > 1


def test_create_external_sink_roundtrip(engine):
    import tempfile

    out = tempfile.mkdtemp(prefix="sclera_sink_") + "/regions"
    engine.execute(
        f"CREATE EXTERNAL PARQUET ('{out}') AS SELECT r_regionkey, r_name FROM region"
    )
    back = engine.external_source("PARQUET", out)
    assert back.count() == 5


def test_named_window_frame_extension(engine, spark):
    spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (1, 3.0), (2, 5.0)], "k int, v double"
    ).createOrReplaceTempView("wt")
    rows = engine.sql("""
        SELECT k, v,
               sum(v) OVER w AS s,
               sum(v) OVER (w ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s2
        FROM wt WINDOW w AS (PARTITION BY k ORDER BY v)
    """).collect()
    got = {(r.k, r.v): (r.s, r.s2) for r in rows}
    assert got[(1, 3.0)] == (6.0, 5.0)
    assert got[(2, 5.0)] == (5.0, 5.0)


def test_replace_family_reference_semantics(engine, spark):
    # REPLACE = literal all; REPLACEALL = regex all; REPLACEFIRST = regex
    # first (ScalFunctionEvaluator.scala:664-730)
    from pyspark.sql import functions as F

    from sclera_spark.functions.scalar import scalar_function

    df = spark.createDataFrame([("a.b a.b a.b",)], "s string")
    row = df.select(
        scalar_function("REPLACE", F.col("s"), F.lit("a.b"), F.lit("X")).alias("rep"),
        scalar_function("REPLACEALL", F.col("s"), F.lit("a."), F.lit("Y")).alias("ra"),
        scalar_function("REPLACEFIRST", F.col("s"), F.lit("a."), F.lit("Z")).alias("rf"),
    ).collect()[0]
    assert row.rep == "X X X"          # literal, all occurrences
    assert row.ra == "Yb Yb Yb"        # regex: '.' matches any char
    assert row.rf == "Zb a.b a.b"      # regex, first only


def test_postfix_null_tests(engine):
    rows = engine.sql("""
        SELECT o_orderkey FROM orders
        WHERE nullif(o_orderpriority, '1-URGENT') ISNULL AND o_orderkey <= 300
    """).collect()
    expect = engine.sql("""
        SELECT o_orderkey FROM orders
        WHERE nullif(o_orderpriority, '1-URGENT') IS NULL AND o_orderkey <= 300
    """).collect()
    assert {r.o_orderkey for r in rows} == {r.o_orderkey for r in expect} != set()
    n = engine.sql(
        "SELECT count(*) AS n FROM orders WHERE o_orderpriority NOTNULL"
    ).collect()[0].n
    assert n == engine.table("orders").count()
    # the function form stays a function
    assert engine.sql("SELECT isnull(NULL) AS b").collect()[0].b is True


def test_distinct_on_nested_in_subquery(engine):
    n = engine.sql("""
        SELECT count(*) AS n FROM (
            SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey
            FROM orders ORDER BY o_custkey, o_orderdate DESC) t
    """).collect()[0].n
    assert n == engine.table("orders").select("o_custkey").distinct().count()


def test_distinct_on_with_limit(engine):
    rows = engine.sql("""
        SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey
        FROM orders ORDER BY o_custkey, o_orderdate DESC, o_orderkey LIMIT 7
    """).collect()
    assert len(rows) == 7
    assert [r.o_custkey for r in rows] == sorted({r.o_custkey for r in rows})[:7]


def test_distinct_on_union(engine):
    rows = engine.sql("""
        SELECT o_custkey AS k FROM (
          SELECT DISTINCT ON (o_custkey) o_custkey
          FROM orders ORDER BY o_custkey, o_orderkey) a
        UNION ALL
        SELECT -1 AS k
    """).collect()
    ks = [r.k for r in rows]
    assert -1 in ks and len(ks) == engine.table("orders").select("o_custkey").distinct().count() + 1


@pytest.fixture(scope="module")
def corr_tables(spark):
    spark.createDataFrame(
        [(0, 0, 4), (1, 1, 3), (2, 2, 6), (3, 3, None), (4, 9, 5)],
        "id int, k int, x int",
    ).createOrReplaceTempView("qcorr")
    # per-key element sets: k=0 {1,5}; k=1 {1,5,NULL}; k=2 {1}; k=3 {2};
    # k=9 has NO rows (empty correlated set)
    spark.createDataFrame(
        [(0, 1), (0, 5), (1, 1), (1, 5), (1, None), (2, 1), (3, 2)],
        "k int, v int",
    ).createOrReplaceTempView("qcsub")


def _corr_ids(engine, where: str) -> set[int]:
    return {
        r.id
        for r in engine.sql(
            f"SELECT id FROM qcorr c WHERE {where}"
        ).collect()
    }


def test_quantified_correlated_operand(engine, corr_tables):
    """Correlated subquery operands in quantified comparisons — the
    reference punts on these (ScalExpr.scala:509-519 TODO); here the
    min/max-CASE rewrite produces correlated scalar subqueries that
    Catalyst decorrelates. ANSI corners: empty per-key set (ALL vacuously
    TRUE / ANY FALSE), NULL elements (UNKNOWN unless decided), NULL x."""
    sub = "(SELECT v FROM qcsub s WHERE s.k = c.k)"
    # x > ALL per-key: id0 4>{1,5}? no; id1 3>{1,5,N}? no (and N); id2
    # 6>{1} yes; id3 x NULL vs {2} -> UNKNOWN; id4 empty -> TRUE
    assert _corr_ids(engine, f"x > ALL {sub}") == {2, 4}
    # NOT: FALSE rows only (id0 definite FALSE, id1 FALSE: 3<=5 decides)
    assert _corr_ids(engine, f"NOT (x > ALL {sub})") == {0, 1}
    # x > ANY: id0 4>1 T; id1 3>1 T; id2 T; id3 UNKNOWN; id4 empty -> F
    assert _corr_ids(engine, f"x > ANY {sub}") == {0, 1, 2}
    # NOT of ANY: only id4's empty set gives a definite FALSE to negate
    assert _corr_ids(engine, f"NOT (x > ANY {sub})") == {4}
    # = ALL / <> ANY route through IN-free CASE paths
    assert _corr_ids(engine, f"x = ALL {sub}") == {4}  # empty -> TRUE
    assert _corr_ids(engine, f"x <> ANY {sub}") == {0, 1, 2}


def test_quantified_correlated_tpch_parity(engine, duck):
    """Correlated ALL/ANY over the real tables vs DuckDB."""
    q = """
        SELECT c_custkey FROM customer c
        WHERE c_acctbal > ALL (SELECT o_totalprice / 100 FROM orders o
                               WHERE o.o_custkey = c.c_custkey)
    """
    s = sorted(r[0] for r in engine.sql(q).collect())
    d = sorted(r[0] for r in duck.execute(q).fetchall())
    assert s == d


def test_cast_type_normalization(spark, tables):
    """pg/Sclera type names in cast positions: bare VARCHAR/TEXT ->
    STRING, INT8/FLOAT8 -> BIGINT/DOUBLE, for both `::` (word and
    parenthesized operands) and spelled-out CAST. Found by the CTE fuzz
    family (seed 4: f::VARCHAR inside a WITH body)."""
    from sclera_spark.engine import ScleraEngine

    eng = ScleraEngine(spark)
    row = eng.sql(
        "SELECT o_totalprice::VARCHAR AS a, CAST(o_orderkey AS TEXT) AS b, "
        "(o_orderkey + 1)::VARCHAR AS c, o_orderkey::INT8 AS d, "
        "o_totalprice::FLOAT8 AS e, 'x'::Text AS f, "
        "CAST(o_orderkey AS VARCHAR(10)) AS g "
        "FROM orders ORDER BY o_orderkey LIMIT 1"
    ).collect()[0]
    assert isinstance(row.a, str) and isinstance(row.b, str)
    assert isinstance(row.c, str) and isinstance(row.f, str)
    assert isinstance(row.d, int) and isinstance(row.e, float)
    assert isinstance(row.g, str)
    # not fooled by literals or aliases
    lit = eng.sql("SELECT ' x::VARCHAR ' AS s, 1 AS text").collect()[0]
    assert lit.s == " x::VARCHAR " and lit.text == 1
