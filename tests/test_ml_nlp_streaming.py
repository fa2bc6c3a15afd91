"""ML operators (CLASSIFIED/CLUSTERED/IMPUTED WITH), NLP ops, and the
Structured Streaming tier."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sclera_spark.ml import MLRegistry, classify, cluster, impute
from sclera_spark.nlp import nlp_op
from sclera_spark.streaming import (
    run_to_memory,
    sessionize,
    stream_from_directory,
    stream_match_state,
    windowed_agg,
)


# --------------------------------------------------------------------- ML


@pytest.fixture(scope="module")
def emb_features(tables):
    df = tables["embeddings"]
    for i in range(4):
        df = df.withColumn(f"f{i}", F.col("embedding")[i].cast("double"))
    return df.select("vec_id", "label", "f0", "f1", "f2", "f3")


def test_classifier_roundtrip(emb_features):
    reg = MLRegistry()
    reg.create_classifier(
        "emb_clf", emb_features, label_col="label", feature_cols=["f0", "f1", "f2", "f3"]
    )
    out = classify(reg, emb_features, "emb_clf", out_col="pred")
    assert out.columns == ["vec_id", "label", "f0", "f1", "f2", "f3", "pred"]
    pdf = out.toPandas()
    # a depth-5 tree on its own training data should beat chance easily
    acc = (pdf["pred"] == pdf["label"]).mean()
    n_classes = pdf["label"].nunique()
    assert acc > 1.5 / n_classes, f"accuracy {acc} with {n_classes} classes"


def test_clusterer(emb_features):
    reg = MLRegistry()
    reg.create_clusterer("emb_km", emb_features, feature_cols=["f0", "f1", "f2"], k=3)
    out = cluster(reg, emb_features, "emb_km", out_col="c")
    pdf = out.toPandas()
    assert set(pdf["c"].unique()) <= {0, 1, 2}
    assert pdf["c"].nunique() > 1


def test_impute(spark, emb_features):
    reg = MLRegistry()
    train = emb_features.withColumn("target", (F.col("f0") > 0).cast("int"))
    reg.create_classifier("imp_clf", train, label_col="target", feature_cols=["f1", "f2", "f3"])
    holey = train.withColumn(
        "target", F.when(F.col("vec_id") % 10 == 0, None).otherwise(F.col("target"))
    )
    out = impute(reg, holey, "imp_clf", col="target", flag_col="was_imputed")
    pdf = out.toPandas()
    assert pdf["target"].notna().all()
    assert pdf["was_imputed"].sum() == (holey.filter(F.col("target").isNull()).count())
    # non-null rows unchanged
    orig = train.toPandas().set_index("vec_id")["target"]
    kept = pdf[~pdf["was_imputed"]].set_index("vec_id")["target"]
    assert (orig.loc[kept.index] == kept).all()


# -------------------------------------------------------------------- NLP


def test_nlp_ops(spark):
    df = spark.createDataFrame(
        [(1, "The Quick Fox is great. John Smith hates bad weather!")],
        "doc_id long, text string",
    )
    toks = nlp_op("tokenize", df, "text").select("token").toPandas()["token"].tolist()
    assert "quick" in toks and "fox" in toks
    sents = nlp_op("sentences", df, "text").select("sentence").toPandas()["sentence"].tolist()
    assert len(sents) == 2
    sent = nlp_op("sentiment", df, "text").select("sentiment").first()[0]
    assert sent == 0.0  # one positive (great), one negative (hates? not in lexicon; bad is)
    ents = nlp_op("entities", df, "text").select("entity").toPandas()["entity"].tolist()
    assert "John Smith" in ents
    grams = nlp_op("ngrams", df, "text", n=2).select("ngram").toPandas()["ngram"].tolist()
    assert "quick fox" in grams


# -------------------------------------------------------------- streaming


@pytest.fixture(scope="module")
def stream_dir(spark, tables):
    d = tempfile.mkdtemp(prefix="sclera_stream_")
    ev = tables["events"].select("event_id", "ts", "user_id", "event_type", "value")
    ev.coalesce(4).write.mode("overwrite").parquet(d)
    yield d, ev.schema
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_agg_matches_batch(spark, tables, stream_dir):
    d, schema = stream_dir
    stream = stream_from_directory(spark, d, schema)
    assert stream.isStreaming
    out = windowed_agg(
        stream,
        ts_col="ts",
        watermark="1 hour",
        window_duration="1 day",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
        keys=["event_type"],
    )
    q = run_to_memory(out, "win_agg", output_mode="complete")
    got = spark.table("win_agg").toPandas()
    q.stop()

    batch = (
        tables["events"]
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
        .toPandas()
    )
    key = ["window_start", "window_end", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(g) == len(b)
    assert (g["n"].to_numpy() == b["n"].to_numpy()).all()


def test_sessionize_runs(spark, stream_dir):
    d, schema = stream_dir
    stream = stream_from_directory(spark, d, schema)
    out = sessionize(
        stream,
        ts_col="ts",
        watermark="1 hour",
        gap="30 minutes",
        keys=["user_id"],
        aggs={"n_events": F.count(F.lit(1))},
    )
    q = run_to_memory(out, "sessions", output_mode="complete")
    got = spark.table("sessions").toPandas()
    q.stop()
    assert len(got) > 0
    assert (got["session_end"] > got["session_start"]).all()


def test_stream_match_state(spark, stream_dir):
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    d, schema = stream_dir
    stream = stream_from_directory(spark, d, schema).withColumn(
        "lab", F.upper(F.col("event_type"))
    )
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
    q = run_to_memory(out, "stream_matches")
    got = spark.table("stream_matches").toPandas()
    q.stop()
    assert len(got) > 0
    assert (got["match_len"] >= 2).all()
    assert (got["match_end"] >= got["match_start"]).all()


def _run_label_stream(spark, rows, pattern, name, **match_kwargs):
    """Helper: stream a crafted (user_id, ts, lab) sequence through
    stream_match_state and return the emitted matches."""
    import tempfile

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("lab", StringType()),
        ]
    )
    import datetime

    data = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, i), lab) for i, lab in enumerate(rows)
    ]
    d = tempfile.mkdtemp(prefix="sclera_match_stream_")
    spark.createDataFrame(data, schema).coalesce(1).write.mode("overwrite").parquet(d)
    stream = stream_from_directory(spark, d, schema)
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("match_start", TimestampType()),
            StructField("match_end", TimestampType()),
            StructField("match_len", IntegerType()),
        ]
    )
    out = stream_match_state(
        stream, pattern=pattern, label_col="lab", keys=["user_id"],
        ts_col="ts", out_schema=out_schema, **match_kwargs,
    )
    q = run_to_memory(out, name)
    got = spark.table(name).toPandas().sort_values("match_start")
    q.stop()
    return got


def test_stream_match_longest_semantics(spark):
    # 'A+' over A A A B A A B: batch leftmost-longest = len-3 then len-2;
    # the stream must NOT emit on the first accept (shortest-match bug)
    got = _run_label_stream(spark, list("AAABAAB"), "A+", "lm1")
    assert got["match_len"].tolist() == [3, 2]


def test_stream_match_failed_attempt_replay(spark):
    # 'A A B' over A A A B: the first attempt (rows 0-1) dies at row 2;
    # batch retries from row 1 and matches rows 1-3 — the stream must
    # replay the buffered suffix to find it
    got = _run_label_stream(spark, list("AAAB"), "A A B", "lm2")
    assert got["match_len"].tolist() == [3]


def test_stream_match_batch_parity_funnel(spark):
    # maximal-accept fast path: 'C V+' emits on death, 'V+ P' immediately
    got = _run_label_stream(spark, list("CVVCVC"), "C V+", "lm3")
    assert got["match_len"].tolist() == [3, 2]


def test_stream_match_attempt_cap(spark):
    # 'A+' over an endless A-run never settles; max_attempt_rows bounds
    # per-key state with emit-and-reset: 8 A's at cap 3 -> 3, 3, and a
    # 2-row attempt left pending in state (not emitted without a gap)
    got = _run_label_stream(spark, list("AAAAAAAA"), "A+", "cap1",
                            max_attempt_rows=3)
    assert got["match_len"].tolist() == [3, 3]
    # cap interplay with attempt death: A A A A B A A A at cap 3 ->
    # cap-emit 3, then the lone A settles at the B, then cap-emit 3
    got2 = _run_label_stream(spark, list("AAAABAAA"), "A+", "cap2",
                             max_attempt_rows=3)
    assert got2["match_len"].tolist() == [3, 1, 3]


def test_stream_match_finalize_gap(spark):
    """A pending extensible accept ('A+' with no killer row) is finalized
    once the watermark passes its end + finalize_gap."""
    import datetime
    import tempfile
    import time as _time

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("lab", StringType()),
        ]
    )
    t0 = datetime.datetime(2024, 1, 1)
    d = tempfile.mkdtemp(prefix="sclera_gap_stream_")
    batches = [
        [(1, t0, "A"), (1, t0 + datetime.timedelta(seconds=1), "A")],
        [(2, t0 + datetime.timedelta(days=2), "B")],
        [(2, t0 + datetime.timedelta(days=3), "B")],
    ]
    # symlink each batch's part file into the stream dir with strictly
    # increasing mtimes, so maxFilesPerTrigger=1 processes them in order
    import glob
    import os

    sd = tempfile.mkdtemp(prefix="sclera_gap_sd_")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/b{i}")
        part = sorted(glob.glob(f"{d}/b{i}/part-*.parquet"))[0]
        os.symlink(part, f"{sd}/{i:02d}.parquet")
        _time.sleep(1.1)

    stream = stream_from_directory(
        spark, sd, schema, maxFilesPerTrigger="1"
    ).withWatermark("ts", "10 seconds")
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
        pattern="A+",
        label_col="lab",
        keys=["user_id"],
        ts_col="ts",
        out_schema=out_schema,
        finalize_gap="1 minute",
    )
    q = run_to_memory(out, "gap_matches", timeout_s=90)
    got = spark.table("gap_matches").toPandas()
    q.stop()
    assert len(got) == 1
    assert got.iloc[0].user_id == 1 and got.iloc[0].match_len == 2


def test_stream_match_finalize_gap_tail_replay(spark):
    """Rows buffered past a gap-finalized accept must be replayed: with
    'A B (C D)? | C' over A B C, the pending accept A B is finalized at
    the gap and the buffered C — consumed while attempting the C D
    extension — must come back as its own match, not be dropped."""
    import datetime
    import glob
    import os
    import tempfile
    import time as _time

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("lab", StringType()),
        ]
    )
    t0 = datetime.datetime(2024, 1, 1)
    d = tempfile.mkdtemp(prefix="sclera_gapr_stream_")
    batches = [
        [
            (1, t0, "A"),
            (1, t0 + datetime.timedelta(seconds=1), "B"),
            (1, t0 + datetime.timedelta(seconds=2), "C"),
        ],
        [(2, t0 + datetime.timedelta(days=2), "X")],
        [(2, t0 + datetime.timedelta(days=3), "X")],
    ]
    sd = tempfile.mkdtemp(prefix="sclera_gapr_sd_")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/b{i}")
        part = sorted(glob.glob(f"{d}/b{i}/part-*.parquet"))[0]
        os.symlink(part, f"{sd}/{i:02d}.parquet")
        _time.sleep(1.1)

    stream = stream_from_directory(
        spark, sd, schema, maxFilesPerTrigger="1"
    ).withWatermark("ts", "10 seconds")
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
        pattern="A B (C D)? | C",
        label_col="lab",
        keys=["user_id"],
        ts_col="ts",
        out_schema=out_schema,
        finalize_gap="1 minute",
    )
    q = run_to_memory(out, "gapr_matches", timeout_s=90)
    got = (
        spark.table("gapr_matches")
        .toPandas()
        .sort_values("match_start")
        .reset_index(drop=True)
    )
    q.stop()
    u1 = got[got.user_id == 1]
    assert u1["match_len"].tolist() == [2, 1]


def test_stream_dedup_matches_batch(spark, stream_dir):
    from sclera_spark.streaming import stream_dedup

    d, schema = stream_dir
    stream = stream_from_directory(spark, d, schema)
    out = stream_dedup(stream, ["user_id", "event_type"])
    q = run_to_memory(out, "sdedup", output_mode="append")
    try:
        got = spark.table("sdedup").count()
    finally:
        q.stop()
    batch = spark.read.parquet(d).dropDuplicates(["user_id", "event_type"]).count()
    assert got == batch


def test_stream_dedup_watermarked_state(spark, stream_dir):
    from sclera_spark.streaming import stream_dedup

    d, schema = stream_dir
    stream = stream_from_directory(spark, d, schema)
    out = stream_dedup(stream, ["user_id", "event_type"], ts_col="ts", watermark="1 hour")
    assert out.isStreaming
    q = run_to_memory(out, "sdedup_wm", output_mode="append")
    try:
        got = spark.table("sdedup_wm").count()
    finally:
        q.stop()
    # within-watermark dedup can only merge what exact dedup merges
    batch = spark.read.parquet(d).dropDuplicates(["user_id", "event_type"]).count()
    assert got >= batch
    assert got <= spark.read.parquet(d).count()


def test_stream_quality_filter_matches_batch(spark, tables):
    import shutil as _sh
    import tempfile as _tf

    from sclera_spark.streaming import stream_quality_filter

    d = _tf.mkdtemp(prefix="sclera_docq_")
    docs = tables["documents"].select("doc_id", "text")
    docs.coalesce(2).write.mode("overwrite").parquet(d)
    try:
        stream = stream_from_directory(spark, d, docs.schema)
        out = stream_quality_filter(stream, "text", min_len=100)
        q = run_to_memory(out, "squal", output_mode="append")
        try:
            got = spark.table("squal").count()
        finally:
            q.stop()
        batch = stream_quality_filter(spark.read.parquet(d), "text", min_len=100).count()
        assert got == batch
        assert 0 < got < docs.count()  # the gate actually drops something
    finally:
        _sh.rmtree(d, ignore_errors=True)


def test_stream_expmovavg_matches_batch(spark, tables):
    """Cross-micro-batch EMA continuation == the batch operator, bit for
    bit: time-ordered files fed one per trigger, per-key state carrying
    the EMA scalar across batches."""
    import pandas as pd

    from sclera_spark.operators import expmovavg
    from sclera_spark.streaming import (
        run_to_memory,
        stream_expmovavg,
        stream_from_directory,
    )

    ev = tables["events"].select("event_id", "ts", "user_id", "value")
    batch = {
        r.event_id: r.ema
        for r in expmovavg(
            ev, "value", decay=0.3, partition_by=["user_id"],
            order_by=["ts", "event_id"], out_col="ema",
        ).collect()
    }

    # three time-ordered files -> three micro-batches, state must carry
    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    d = tempfile.mkdtemp(prefix="sclera_ema_stream_")
    try:
        cuts = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
        for i in range(3):
            spark.createDataFrame(pdf.iloc[cuts[i]:cuts[i + 1]]).coalesce(
                1
            ).write.parquet(os.path.join(d, f"f{i}"))
        stream = stream_from_directory(
            spark, d + "/*", ev.schema, maxFilesPerTrigger=1
        )
        out = stream_expmovavg(
            stream, "value", decay=0.3, keys=["user_id"], ts_col="ts"
        )
        q = run_to_memory(out, "ema_stream")
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        got = {
            r.event_id: r.ema
            for r in spark.sql("SELECT event_id, ema FROM ema_stream").collect()
        }
        q.stop()
        # the continuation path is only exercised across multiple triggers
        assert n_batches >= 2, f"expected multiple micro-batches, got {n_batches}"
    finally:
        shutil.rmtree(d, ignore_errors=True)

    assert len(got) == len(batch)
    diffs = [k for k in batch if got[k] != batch[k]]
    assert not diffs, f"{len(diffs)} EMA divergences, e.g. {diffs[:3]}"


def test_stream_enrich_matches_batch(spark, tables, stream_dir):
    """Stream-static broadcast join per micro-batch == the batch join;
    left-join keeps dimension misses as NULLs."""
    from pyspark.sql import functions as F

    from sclera_spark.streaming import (
        run_to_memory,
        stream_enrich,
        stream_from_directory,
    )

    d, schema = stream_dir
    dim = tables["nation"].select("n_nationkey", "n_name")
    stream = stream_from_directory(spark, d, schema).withColumn(
        "nk", F.col("user_id") % 25
    )
    out = stream_enrich(stream, dim, on=F.col("nk") == F.col("n_nationkey"))
    q = run_to_memory(out, "senrich", output_mode="append")
    try:
        got = {
            (r.event_id, r.n_name)
            for r in spark.table("senrich").select("event_id", "n_name").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.event_id, r.n_name)
        for r in spark.read.parquet(d)
        .withColumn("nk", F.col("user_id") % 25)
        .join(dim, F.col("nk") == F.col("n_nationkey"))
        .select("event_id", "n_name")
        .collect()
    }
    assert got == batch and len(got) > 0

    # left join keeps unmatched stream rows (+20 shifts part of the key
    # range past n_nationkey's 0-24 domain)
    stream2 = stream_from_directory(spark, d, schema).withColumn(
        "nk", F.col("user_id") % 40 + 20
    )
    out2 = stream_enrich(
        stream2, dim, on=F.col("nk") == F.col("n_nationkey"), how="left"
    )
    q2 = run_to_memory(out2, "senrich_left", output_mode="append")
    try:
        left_rows = spark.table("senrich_left").count()
        misses = spark.table("senrich_left").filter("n_name IS NULL").count()
    finally:
        q2.stop()
    total = spark.read.parquet(d).count()
    assert left_rows == total
    assert misses > 0


def test_stream_interval_join_matches_batch(spark, stream_dir):
    """Stream-stream interval join over two real file streams == the
    batch interval join; ambiguous non-key columns are refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sclera_spark.streaming import (
        run_to_memory,
        stream_from_directory,
        stream_interval_join,
    )

    d, schema = stream_dir

    def side(ts_name, id_name, etype):
        return (
            stream_from_directory(spark, d, schema)
            .filter(F.col("event_type") == etype)
            .select(
                "user_id",
                F.col("ts").alias(ts_name),
                F.col("event_id").alias(id_name),
            )
        )

    out = stream_interval_join(
        side("v_ts", "v_id", "view"),
        side("c_ts", "c_id", "click"),
        "v_ts", "c_ts", keys=["user_id"],
        lower="0 seconds", upper="30 minutes",
    )
    q = run_to_memory(out, "sij", output_mode="append")
    try:
        got = {
            (r.v_id, r.c_id) for r in spark.table("sij").collect()
        }
    finally:
        q.stop()
    ev = spark.read.parquet(d)
    v = ev.filter("event_type = 'view'").selectExpr(
        "user_id", "ts AS v_ts", "event_id AS v_id"
    )
    c = ev.filter("event_type = 'click'").selectExpr(
        "user_id AS cu", "ts AS c_ts", "event_id AS c_id"
    )
    batch = {
        (r.v_id, r.c_id)
        for r in v.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert got == batch and len(got) > 0

    with _pytest.raises(ValueError, match="ambiguous"):
        stream_interval_join(
            side("v_ts", "same_id", "view"),
            side("c_ts", "same_id", "click"),
            "v_ts", "c_ts", keys=["user_id"],
        )


def test_stump_classifier_deterministic_and_exact(spark):
    """The 'stump' algorithm (ml/registry.py StumpModel): exact error
    minimization with min-label tie-break and lexicographic winner —
    verified against a hand-computed optimum, and rerun-stable."""
    from sclera_spark.ml.registry import MLRegistry, StumpModel, classify

    # y separable on f1 at threshold 2 (error 0); f0 is noise
    rows = [
        (0.9, 1.0, 0), (0.1, 2.0, 0), (0.5, 3.0, 1), (0.7, 4.0, 1), (0.2, 5.0, 1),
    ]
    df = spark.createDataFrame(rows, "f0 double, f1 double, y int")
    reg = MLRegistry()
    reg.create_classifier("s", df, "y", ["f0", "f1"], algorithm="stump")
    m = reg.get("s")
    assert isinstance(m, StumpModel)
    assert (m.feature, m.threshold, m.pred_le, m.pred_gt) == ("f1", 2.0, 0, 1)
    out = classify(reg, df, "s", out_col="pred")
    assert [r.pred for r in out.orderBy("f1").collect()] == [0, 0, 1, 1, 1]
    # rerun-stable (deterministic fit, no RNG)
    reg.create_classifier("s2", df, "y", ["f0", "f1"], algorithm="stump")
    m2 = reg.get("s2")
    assert (m2.feature, m2.threshold, m2.pred_le, m2.pred_gt) == (
        m.feature, m.threshold, m.pred_le, m.pred_gt,
    )


def test_voronoi_clusterer_deterministic(spark):
    """'voronoi' clusterer: seeds are the k lexicographically-smallest
    distinct feature rows; assignment is argmin squared-L2 with ties to
    the lowest seed — verified by hand and rerun-stable."""
    from sclera_spark.ml.registry import MLRegistry, VoronoiModel, cluster

    rows = [(0.0, 0.0), (0.0, 0.0), (10.0, 0.0), (0.1, 0.2), (9.8, 1.0), (5.1, 0.0)]
    df = spark.createDataFrame(rows, "f0 double, f1 double")
    reg = MLRegistry()
    reg.create_clusterer("v", df, ["f0", "f1"], k=2, algorithm="voronoi")
    m = reg.get("v")
    assert isinstance(m, VoronoiModel)
    # distinct sorted rows: (0,0), (0.1,0.2), ... -> seeds k=2
    assert m.seeds == [(0.0, 0.0), (0.1, 0.2)]
    out = {
        (r.f0, r.f1): r.c
        for r in cluster(reg, df, "v", out_col="c").collect()
    }
    assert out[(0.0, 0.0)] == 0        # exact seed hit, tie impossible
    assert out[(0.1, 0.2)] == 1
    assert out[(10.0, 0.0)] == 1       # closer to (0.1, 0.2)
    assert out[(5.1, 0.0)] == 1
