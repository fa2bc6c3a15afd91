"""Round-2 extended-clause surface: derived-table inputs, aliases, and the
UNPIVOT / TYPEINFER / ALIGN / CLASSIFIED / CLUSTERED / IMPUTED / TEXT
clause forms (reference SqlQueryParser.scala:163, :203, :1016-1045)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sclera_spark.engine import ScleraEngine


@pytest.fixture(scope="module")
def engine(spark, tables):
    return ScleraEngine(spark)


def test_match_on_derived_table(engine):
    base = engine.sql("""
        SELECT user_id, match_id, count(*) AS n
        FROM events ORDERED BY (ts, event_id) PARTITION BY user_id
             MATCH 'VIEW+ PURCHASE' ON event_type
        GROUP BY user_id, match_id
    """).toPandas()
    derived = engine.sql("""
        SELECT user_id, match_id, count(*) AS n
        FROM (SELECT * FROM events WHERE user_id >= 0)
             ORDERED BY (ts, event_id) PARTITION BY user_id
             MATCH 'VIEW+ PURCHASE' ON event_type
        GROUP BY user_id, match_id
    """).toPandas()
    key = ["user_id", "match_id"]
    assert base.sort_values(key).reset_index(drop=True).equals(
        derived.sort_values(key).reset_index(drop=True)
    )


def test_match_with_alias(engine):
    df = engine.sql("""
        SELECT e.user_id, e.match_id, count(*) AS n
        FROM events AS e ORDERED BY (ts, event_id) PARTITION BY user_id
             MATCH 'VIEW+ PURCHASE' ON event_type
        GROUP BY e.user_id, e.match_id
    """)
    assert df.count() > 0


def test_split_on_derived_table(engine):
    df = engine.sql("""
        SELECT user_id, event_id, s, e
        FROM (SELECT user_id, event_id, value AS lo, value + 10 AS hi FROM events)
             PARTITION BY user_id SPLIT (lo, hi) INTO (s, e)
    """)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert (pdf["s"] < pdf["e"]).all()


def test_unpivot_sql(engine, duck):
    from tests.conftest import assert_df_equal_duck

    df = engine.sql("""
        SELECT p_partkey, k, v
        FROM (SELECT p_partkey, p_size, p_retailprice FROM part)
             UNPIVOT v FOR k IN (p_size AS 'size', p_retailprice)
    """)
    oracle = """
        SELECT p_partkey, 'size' AS k, CAST(p_size AS double) AS v FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS k, p_retailprice AS v FROM part
    """
    assert_df_equal_duck(df, duck, oracle)


def test_typeinfer_sql(engine):
    df = engine.sql("""
        SELECT * FROM (SELECT CAST(o_orderkey AS string) AS k,
                              CAST(o_totalprice AS string) AS p,
                              CAST(o_orderdate AS string) AS d
                       FROM orders)
        TYPEINFER (k, p, d NULLS ('') LIMIT 500)
    """)
    types = dict(df.dtypes)
    assert types["k"] in ("int", "bigint")
    assert types["p"] == "double"
    assert types["d"] == "timestamp"


def test_align_sql_zip(engine):
    from sclera_spark.operators import align_zip

    a = engine.table("events").filter(F.col("user_id") == 1).select(
        F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
    )
    b = engine.table("events").filter(F.col("user_id") == 2).select(
        F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
    )
    a.createOrReplaceTempView("al_a")
    b.createOrReplaceTempView("al_b")
    sql = engine.sql("""
        SELECT a_id, b_id FROM al_a ORDERED BY (a_ts, a_id)
        ALIGN al_b ORDERED BY (b_ts, b_id)
    """).toPandas()
    direct = (
        align_zip(a, b, order_by_a=["a_ts", "a_id"], order_by_b=["b_ts", "b_id"])
        .select("a_id", "b_id")
        .toPandas()
    )
    assert sql.sort_values("a_id").reset_index(drop=True).equals(
        direct.sort_values("a_id").reset_index(drop=True)
    )


def test_align_sql_dtw(engine):
    import numpy as np

    from sclera_spark.operators import align

    a = engine.table("events").filter(F.col("user_id") == 1).select(
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
        F.col("value").alias("a_value"),
    )
    b = engine.table("events").filter(F.col("user_id") == 2).select(
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
    )
    a.createOrReplaceTempView("al_a2")
    b.createOrReplaceTempView("al_b2")
    sql = engine.sql("""
        SELECT a_id, b_id FROM al_a2 ORDERED BY (a_ts, a_id)
        ALIGN al_b2 ORDERED BY (b_ts, b_id)
        ON abs(a_value - b_value) MARGIN 10
    """).toPandas()
    direct = align(
        a,
        b,
        dist=lambda pa, pb: np.abs(pa["a_value"].to_numpy() - pb["b_value"].to_numpy()),
        margin=10,
        order_by_a=["a_ts", "a_id"],
        order_by_b=["b_ts", "b_id"],
    ).select("a_id", "b_id").toPandas()
    key = ["a_id", "b_id"]
    assert sql.sort_values(key).reset_index(drop=True).equals(
        direct.sort_values(key).reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def feats_view(engine):
    emb = engine.table("embeddings")
    df = emb.select(
        "vec_id",
        "label",
        *[F.col("embedding")[i].cast("double").alias(f"f{i}") for i in range(4)],
    )
    df.createOrReplaceTempView("feats_sql")
    return df


def test_classified_with_sql(engine, feats_view):
    engine.execute(
        "CREATE CLASSIFIER clf_sql (label) USING SELECT label, f0, f1, f2, f3 FROM feats_sql"
    )
    df = engine.sql("SELECT vec_id, pred FROM feats_sql CLASSIFIED WITH clf_sql (pred)")
    pdf = df.toPandas()
    assert len(pdf) == feats_view.count()
    assert pdf["pred"].notna().all()
    # parity with the programmatic path
    from sclera_spark.ml import classify

    direct = classify(engine.ml, feats_view, "clf_sql", out_col="pred").select(
        "vec_id", "pred"
    ).toPandas()
    assert pdf.sort_values("vec_id").reset_index(drop=True).equals(
        direct.sort_values("vec_id").reset_index(drop=True)
    )


def test_clustered_with_sql(engine, feats_view):
    engine.execute(
        "CREATE CLUSTERER ('kmeans', 'k=3') km_sql USING SELECT f0, f1, f2 FROM feats_sql"
    )
    df = engine.sql("SELECT vec_id, cl FROM feats_sql CLUSTERED WITH km_sql (cl)")
    pdf = df.toPandas()
    assert pdf["cl"].nunique() == 3


def test_imputed_with_sql(engine, feats_view):
    feats = feats_view.withColumn("target", (F.col("f0") > 0).cast("int"))
    feats.createOrReplaceTempView("imp_train_sql")
    engine.execute(
        "CREATE CLASSIFIER imp_sql (target) USING "
        "SELECT target, f1, f2, f3 FROM imp_train_sql"
    )
    holey = feats.withColumn(
        "target", F.when(F.col("vec_id") % 10 == 0, None).otherwise(F.col("target"))
    )
    holey.createOrReplaceTempView("imp_holey_sql")
    df = engine.sql("""
        SELECT vec_id, target, was_imp
        FROM imp_holey_sql IMPUTED WITH imp_sql (target) FLAG was_imp
    """)
    pdf = df.toPandas()
    assert pdf["target"].notna().all()
    assert pdf["was_imp"].sum() == (pdf["vec_id"] % 10 == 0).sum()


def test_nlp_text_clause(engine):
    df = engine.sql("SELECT doc_id, token FROM documents TEXT tokenize IN text")
    pdf = df.toPandas()
    assert len(pdf) > 0
    # library-qualified form and TO column rename
    df2 = engine.sql(
        "SELECT doc_id, tok FROM documents TEXT nlp.tokenize IN text TO tok"
    )
    assert df2.count() == len(pdf)


def test_drop_classifier(engine, feats_view):
    engine.execute(
        "CREATE CLASSIFIER drop_me (label) USING SELECT label, f0, f1 FROM feats_sql"
    )
    engine.execute("DROP CLASSIFIER drop_me")
    with pytest.raises(KeyError):
        engine.ml.get("drop_me")


def test_from_sequence_sql(engine):
    rows = engine.sql("SELECT seq FROM SEQUENCE(5) ORDER BY seq").collect()
    assert [r.seq for r in rows] == [0, 1, 2, 3, 4]


def test_from_external_source_sql(engine, tables):
    import tempfile

    out = tempfile.mkdtemp(prefix="sclera_extsrc_") + "/nations"
    engine.table("nation").write.mode("overwrite").parquet(out)
    rows = engine.sql(
        f"SELECT count(*) AS n FROM EXTERNAL PARQUET('{out}')"
    ).collect()
    assert rows[0].n == engine.table("nation").count()
    # join position too
    rows2 = engine.sql(f"""
        SELECT r_name, count(*) AS n
        FROM EXTERNAL PARQUET('{out}') e JOIN region ON e.n_regionkey = r_regionkey
        GROUP BY r_name
    """).collect()
    assert len(rows2) == 5


def test_external_scalar_function(engine):
    engine.register_scalar("mylib", "twice", lambda x: None if x is None else 2 * x, "long")
    rows = engine.sql(
        "SELECT EXTERNAL mylib.twice(n_nationkey) AS t FROM nation ORDER BY t LIMIT 3"
    ).collect()
    assert [r.t for r in rows] == [0, 2, 4]


def test_nlp_entities_multi_column_to(engine, spark):
    spark.createDataFrame(
        [(1, "Ada Lovelace met Babbage in London today")], "doc_id long, text string"
    ).createOrReplaceTempView("ner_docs")
    rows = engine.sql(
        "SELECT doc_id, e, t FROM ner_docs TEXT entities IN text TO (e, t)"
    ).collect()
    got = {(r.e, r.t) for r in rows}
    assert ("Ada Lovelace", "NAME") in got
    assert ("London", "TERM") in got


def test_expmovavg_sql_window(engine):
    from sclera_spark.operators import expmovavg

    sql = engine.sql("""
        SELECT user_id, event_id,
               EXPMOVAVG(value, 0.3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ema
        FROM events
    """).toPandas()
    direct = expmovavg(
        engine.table("events").select("user_id", "event_id", "ts", "value"),
        "value",
        decay=0.3,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        out_col="ema",
    ).select("user_id", "event_id", "ema").toPandas()
    key = ["user_id", "event_id"]
    l = sql.sort_values(key).reset_index(drop=True)
    r = direct.sort_values(key).reset_index(drop=True)
    assert len(l) == len(r) > 0
    assert (abs(l["ema"] - r["ema"]) < 1e-9).all()


def test_expmovavg_sql_window_in_order_by(engine):
    # EMA window AFTER the FROM item (ORDER BY position) — the splice must
    # keep text order instead of assuming call-before-FROM
    rows = engine.sql("""
        SELECT user_id, event_id
        FROM events
        ORDER BY EXPMOVAVG(value, 0.3) OVER (PARTITION BY user_id ORDER BY ts, event_id) DESC,
                 user_id, event_id
        LIMIT 20
    """).collect()
    assert len(rows) == 20

    from sclera_spark.operators import expmovavg

    direct = (
        expmovavg(
            engine.table("events").select("user_id", "event_id", "ts", "value"),
            "value",
            decay=0.3,
            partition_by=["user_id"],
            order_by=["ts", "event_id"],
            out_col="ema",
        )
        .orderBy(F.desc("ema"), "user_id", "event_id")
        .limit(20)
        .select("user_id", "event_id")
        .collect()
    )
    assert [(r.user_id, r.event_id) for r in rows] == [
        (r.user_id, r.event_id) for r in direct
    ]


def test_extended_clause_consumes_cte(engine, duck):
    """WITH-aliases feed extended clauses: the CTEs are hoisted to temp
    views around the lowering (found probing CTE x extended composition;
    previously TABLE_OR_VIEW_NOT_FOUND)."""
    from tests.conftest import assert_df_equal_duck

    out = engine.sql("""
        WITH w AS (SELECT n_regionkey, n_nationkey, n_name FROM nation)
        SELECT * FROM w PARTITION BY n_regionkey ARG (MAX(n_nationkey))
    """)
    assert_df_equal_duck(out, duck, """
        SELECT n_regionkey, n_nationkey, n_name FROM (
          SELECT n_regionkey, n_nationkey, n_name,
                 row_number() OVER (PARTITION BY n_regionkey
                                    ORDER BY n_nationkey DESC) AS rk
          FROM nation) t WHERE rk = 1
    """)


def test_extended_clause_inside_cte_body(engine):
    out = engine.sql("""
        WITH w AS (SELECT n_regionkey, mx FROM
            (SELECT n_regionkey, n_nationkey AS mx FROM nation) t
            PARTITION BY n_regionkey ARG (MAX(mx)))
        SELECT count(*) AS n FROM w
    """).collect()
    assert out[0].n == 5


def test_cte_shadows_and_restores_engine_table(engine):
    """A CTE named like an engine table shadows it for the query (SQL
    scoping) and the table is restored afterwards — on success AND on a
    failed hoist."""
    import pytest as _pytest

    out = engine.sql("""
        WITH nation(a, b) AS (SELECT n_nationkey, n_name FROM nation
                              WHERE n_nationkey < 5),
             w2 AS (SELECT a FROM nation)
        SELECT max(a) AS m FROM w2 PARTITION BY a ARG (MAX(a))
    """)
    assert out.count() == 1
    assert engine.sql("SELECT count(*) AS c FROM nation").collect()[0].c == 25
    with _pytest.raises(Exception):
        engine.sql(
            "WITH nation AS (SELECT 1 AS z), broken( AS (SELECT 2) "
            "SELECT * FROM nation PARTITION BY z ARG (MAX(z))"
        )
    assert engine.sql("SELECT count(*) AS c FROM nation").collect()[0].c == 25


# ------- r12: pyspark.ml estimators behind the DDL (WITH model=...)


@pytest.fixture()
def xor_view(spark):
    """A deterministic XOR grid — the canonical dataset NO single-
    feature threshold (stump) can separate, but a depth-2 tree and a
    feature-crossed boundary can."""
    rows = [
        (i, float(i % 20) / 20.0, float((i // 20) % 20) / 20.0)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id int, f0 double, f1 double")
    df = df.withColumn(
        "label",
        ((F.col("f0") > 0.5) != (F.col("f1") > 0.5)).cast("int"),
    )
    df.createOrReplaceTempView("xor_sql")
    return df


def _accuracy(engine, clf, view="xor_sql"):
    pdf = engine.sql(
        f"SELECT label, pred FROM {view} CLASSIFIED WITH {clf} (pred)"
    ).toPandas()
    return (pdf["label"] == pdf["pred"]).mean()


def test_with_model_tree_beats_stump(engine, xor_view):
    """VERDICT r12 task 4: the WITH (model=...) spelling lowers to
    pyspark.ml estimators, and on the XOR fixture the tree (and
    forest) accuracy beats the deterministic stump default — the stump
    stays as the oracle-graded entry, pyspark.ml is the quality path."""
    engine.execute(
        "CREATE CLASSIFIER ('stump') xr_stump (label) USING "
        "SELECT label, f0, f1 FROM xor_sql"
    )
    engine.execute(
        "CREATE CLASSIFIER xr_tree (label) USING "
        "SELECT label, f0, f1 FROM xor_sql WITH (model='tree', max_depth=4)"
    )
    engine.execute(
        "CREATE CLASSIFIER xr_forest (label) USING "
        "SELECT label, f0, f1 FROM xor_sql WITH (model='forest')"
    )
    acc_stump = _accuracy(engine, "xr_stump")
    acc_tree = _accuracy(engine, "xr_tree")
    acc_forest = _accuracy(engine, "xr_forest")
    assert acc_stump <= 0.8  # XOR: one threshold cannot separate
    assert acc_tree >= 0.95 and acc_tree > acc_stump
    assert acc_forest > acc_stump
    # logreg parses and runs through the same surface (XOR is its
    # worst case, so only the plumbing is asserted)
    engine.execute(
        "CREATE CLASSIFIER xr_lr (label) USING "
        "SELECT label, f0, f1 FROM xor_sql WITH (model='logreg')"
    )
    assert 0.0 <= _accuracy(engine, "xr_lr") <= 1.0
    # unknown model name refuses loudly
    with pytest.raises(ValueError, match="unknown model"):
        engine.execute(
            "CREATE CLASSIFIER xr_bad (label) USING "
            "SELECT label, f0, f1 FROM xor_sql WITH (model='svm9000')"
        )
    for n in ("xr_stump", "xr_tree", "xr_forest", "xr_lr"):
        engine.execute(f"DROP CLASSIFIER {n}")


def test_with_model_kmeans_clusterer(engine, xor_view):
    engine.execute(
        "CREATE CLUSTERER xr_km USING SELECT f0, f1 FROM xor_sql "
        "WITH (model='kmeans', k=4)"
    )
    pdf = engine.sql(
        "SELECT vec_id, cl FROM xor_sql CLUSTERED WITH xr_km (cl)"
    ).toPandas()
    assert pdf["cl"].nunique() == 4
    engine.execute("DROP CLUSTERER xr_km")


def test_ml_model_persists_across_sessions(spark, tables, tmp_path, monkeypatch):
    """pyspark.ml models save under the persisted catalog dir and a
    NEW engine lazily reloads them on first CLASSIFIED WITH use
    (reference: models persist in the schema store)."""
    from sclera_spark.engine import ScleraEngine

    monkeypatch.setenv("SCLERA_SPARK_CATALOG_DIR", str(tmp_path / "cat"))
    eng1 = ScleraEngine(spark)
    rows = [(i, float(i), float(2 * i)) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, f0 double, f1 double")
    df = df.withColumn("label", (F.col("f0") > 25).cast("int"))
    df.createOrReplaceTempView("persist_feats")
    eng1.execute(
        "CREATE CLASSIFIER persist_clf (label) USING "
        "SELECT label, f0, f1 FROM persist_feats WITH (model='tree')"
    )
    want = eng1.sql(
        "SELECT vec_id, pred FROM persist_feats "
        "CLASSIFIED WITH persist_clf (pred)"
    ).toPandas()
    eng2 = ScleraEngine(spark)  # fresh registry, same catalog dir
    assert "PERSIST_CLF" not in eng2.ml.models
    got = eng2.sql(
        "SELECT vec_id, pred FROM persist_feats "
        "CLASSIFIED WITH persist_clf (pred)"
    ).toPandas()
    assert got.sort_values("vec_id").reset_index(drop=True).equals(
        want.sort_values("vec_id").reset_index(drop=True)
    )
    # DROP reclaims the persisted artifacts too
    eng2.execute("DROP CLASSIFIER persist_clf")
    eng3 = ScleraEngine(spark)
    with pytest.raises(KeyError):
        eng3.sql(
            "SELECT vec_id, pred FROM persist_feats "
            "CLASSIFIED WITH persist_clf (pred)"
        ).collect()
    # the DETERMINISTIC models persist too (late r12: sidecar JSON —
    # a stump is four scalars, a voronoi is k seed tuples)
    eng3.execute(
        "CREATE CLASSIFIER ('stump') persist_stump (label) USING "
        "SELECT label, f0, f1 FROM persist_feats"
    )
    eng3.execute(
        "CREATE CLUSTERER ('voronoi', 'k=4') persist_vor USING "
        "SELECT f0, f1 FROM persist_feats"
    )
    want_s = eng3.sql(
        "SELECT vec_id, pred FROM persist_feats "
        "CLASSIFIED WITH persist_stump (pred)"
    ).toPandas()
    want_v = eng3.sql(
        "SELECT vec_id, cl FROM persist_feats "
        "CLUSTERED WITH persist_vor (cl)"
    ).toPandas()
    eng4 = ScleraEngine(spark)
    assert "PERSIST_STUMP" not in eng4.ml.models
    # LIST/DESCRIBE show persisted models BEFORE any query loads them
    assert "PERSIST_STUMP" in eng4.execute("LIST CLASSIFIERS")
    assert "PERSIST_VOR" in eng4.execute("LIST CLUSTERERS")
    desc = eng4.execute("DESCRIBE CLASSIFIERS persist_stump")
    assert desc[0][3] == "StumpModel"
    got_s = eng4.sql(
        "SELECT vec_id, pred FROM persist_feats "
        "CLASSIFIED WITH persist_stump (pred)"
    ).toPandas()
    got_v = eng4.sql(
        "SELECT vec_id, cl FROM persist_feats "
        "CLUSTERED WITH persist_vor (cl)"
    ).toPandas()
    for got, want, col in ((got_s, want_s, "pred"), (got_v, want_v, "cl")):
        assert got.sort_values("vec_id").reset_index(drop=True).equals(
            want.sort_values("vec_id").reset_index(drop=True)
        ), col
    eng4.execute("DROP CLASSIFIER persist_stump")
    eng4.execute("DROP CLUSTERER persist_vor")


def test_describe_ml_lazy_and_stale_sidecar(spark, tables, tmp_path, monkeypatch):
    """ADVICE r12: DESCRIBE CLASSIFIERS must not PipelineModel.load()
    every persisted model just to print a class name, and one stale
    sidecar (model dir deleted out from under it) must not break the
    entire listing — it prints 'unavailable' instead."""
    import os
    import shutil

    from sclera_spark.engine import ScleraEngine

    monkeypatch.setenv("SCLERA_SPARK_CATALOG_DIR", str(tmp_path / "cat"))
    eng1 = ScleraEngine(spark)
    rows = [(i, float(i), float(2 * i)) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, f0 double, f1 double")
    df = df.withColumn("label", (F.col("f0") > 25).cast("int"))
    df.createOrReplaceTempView("lazy_feats")
    eng1.execute(
        "CREATE CLASSIFIER lazy_tree (label) USING "
        "SELECT label, f0, f1 FROM lazy_feats WITH (model='tree')"
    )
    eng1.execute(
        "CREATE CLASSIFIER ('stump') lazy_stump (label) USING "
        "SELECT label, f0, f1 FROM lazy_feats"
    )
    eng2 = ScleraEngine(spark)  # fresh registry, same catalog dir
    desc = {r[0]: r for r in eng2.execute("DESCRIBE CLASSIFIERS")}
    assert desc["LAZY_TREE"][3] == "PipelineModel"
    assert desc["LAZY_STUMP"][3] == "StumpModel"
    # class names came from the sidecars — nothing was loaded
    assert "LAZY_TREE" not in eng2.ml.models
    # stale sidecar: delete the pipeline dir, keep the sidecar
    shutil.rmtree(os.path.join(eng2.ml.store_dir, "LAZY_TREE"))
    eng3 = ScleraEngine(spark)
    desc = {r[0]: r for r in eng3.execute("DESCRIBE CLASSIFIERS")}
    assert desc["LAZY_TREE"][3] == "unavailable"
    assert desc["LAZY_STUMP"][3] == "StumpModel"  # listing survives
    eng3.execute("DROP CLASSIFIER lazy_tree")
    eng3.execute("DROP CLASSIFIER lazy_stump")


def test_text_classifier_sql(engine, spark, tmp_path):
    """CREATE CLASSIFIER ('text') over a RAW TEXT column: the pipeline
    owns tokenization (hashed unigrams+bigrams -> logistic), so
    CLASSIFIED WITH applies straight to text, NULL text scores like
    empty text instead of erroring, the model persists/reloads through
    the registry store, and held-out separation on a planted contrast
    is near-perfect."""
    rows = []
    for i in range(200):
        rows.append((i, 1, f"a perfectly normal sentence number {i} with "
                           f"real words and ordinary structure"))
        rows.append((i + 1000, 0, f"zz{i} !!! ### qq@@ ~~ {i}xx 0x{i} %%%"))
    df = spark.createDataFrame(rows, "doc_id long, label int, text string")
    df.where("doc_id % 2 = 0").createOrReplaceTempView("txt_train")
    df.where("doc_id % 2 = 1").createOrReplaceTempView("txt_held")
    engine.execute(
        "CREATE CLASSIFIER ('text') txtclf (label) USING "
        "SELECT label, text FROM txt_train"
    )
    out = engine.sql(
        "SELECT doc_id, label, pred FROM txt_held CLASSIFIED WITH txtclf (pred)"
    ).toPandas()
    assert len(out) == df.where("doc_id % 2 = 1").count()
    acc = (out["label"] == out["pred"]).mean()
    assert acc > 0.98, acc
    # NULL text: scores (as empty), never raises
    nulls = spark.createDataFrame(
        [(9_000_001, None)], "doc_id long, text string"
    )
    nulls.createOrReplaceTempView("txt_nulls")
    got = engine.sql(
        "SELECT doc_id, pred FROM txt_nulls CLASSIFIED WITH txtclf (pred)"
    ).collect()
    assert len(got) == 1 and got[0]["pred"] is not None
    # wrong arity refuses loudly
    import pytest

    with pytest.raises(ValueError, match="ONE"):
        engine.execute(
            "CREATE CLASSIFIER ('text') txtbad (label) USING "
            "SELECT label, text, text AS t2 FROM txt_train"
        )
    # extra numeric columns are simply ignored (string col is the feature)
    engine.execute(
        "CREATE CLASSIFIER ('text') txtnum (label) USING "
        "SELECT label, text, doc_id FROM txt_train"
    )
