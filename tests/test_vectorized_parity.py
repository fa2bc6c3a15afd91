"""r15 optimization pins: the Arrow/numpy-vectorized similarity paths
(ivf_assign, cosine_topk_multi, semantic_dedup's within-cluster prune)
must reproduce the old interpreted-JVM-expression formulations exactly
— including NULL vectors, NULL elements, length mismatches, NaN
elements, ties, and zero norms. The numpy code accumulates per
DIMENSION in sequence precisely so the float64 addition order matches
the old zip_with/aggregate left fold bit-for-bit; these tests hold
that contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _mixed_vec_df(spark):
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0]),
        (1, [4.0, 3.0, 2.0, 1.0]),
        (2, None),                      # NULL vector
        (3, [1.0, 2.0]),                # length mismatch
        (4, [1.0, None, 3.0, 4.0]),     # NULL element
        (5, [float("nan"), 1.0, 1.0, 1.0]),  # NaN element
        (6, [1.0, 2.0, 3.0, 4.0]),      # exact duplicate of 0 (tie)
        (7, [-1.0, -2.0, -3.0, -4.0]),
        (8, [1e200, 1e200, 1e200, 1e200]),   # overflow-ish magnitudes
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_assign_matches_jvm_expression(spark):
    from sclera_spark.llm.similarity import ivf_assign, nearest_centroid_expr

    df = _mixed_vec_df(spark)
    cents = [[0.0, 0.0, 0.0, 0.0], [1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0]]
    got = {
        r["vec_id"]: r["ivf_list"]
        for r in ivf_assign(df, cents).select("vec_id", "ivf_list").collect()
    }
    want = {
        r["vec_id"]: r["jvm"]
        for r in df.select(
            "vec_id",
            nearest_centroid_expr(
                F.col("embedding").cast("array<double>"), cents
            ).alias("jvm"),
        ).collect()
    }
    assert got == want
    # the duplicated centroid (index 1 vs 2) must tie to the LOWER id
    assert got[0] == 1 and got[6] == 1


def test_cosine_topk_multi_matches_jvm_formulation(spark):
    from sclera_spark.llm.similarity import _dot, _norm, topk_per_query

    df = _mixed_vec_df(spark)
    queries = [(0, [1.0, 0.0, 0.0, 1.0]), (1, [0.5, 0.5, 0.5, 0.5])]

    # the pre-r15 formulation, verbatim (explode against literal structs)
    qarr = F.array(
        *[
            F.struct(
                F.lit(int(qid)).alias("qid"),
                F.array(*[F.lit(float(x)) for x in qv]).alias("qv"),
                F.lit(math.sqrt(sum(x * x for x in qv))).alias("qn"),
            )
            for qid, qv in queries
        ]
    )
    v = F.col("embedding").cast("array<double>")
    jvm_scored = df.select(
        F.col("vec_id"), v.alias("__v"), F.explode(qarr).alias("__q")
    ).select(
        F.col("__q.qid").alias("query_id"),
        F.col("vec_id"),
        (
            _dot(F.col("__v"), F.col("__q.qv"))
            / (_norm(F.col("__v")) * F.col("__q.qn"))
        ).alias("cosine"),
    )

    from sclera_spark.llm.similarity import cosine_topk_multi

    got = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in cosine_topk_multi(df, queries, k=100).collect()
    }
    want = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in topk_per_query(jvm_scored, 100).collect()
    }
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        if w is None or (isinstance(w, float) and math.isnan(w)):
            assert g is None or math.isnan(g), (key, g, w)
        else:
            # bit-for-bit: the numpy fold replays the JVM addition order
            assert g == w, (key, g, w)


def test_cosine_topk_multi_zero_norm_raises(spark):
    from sclera_spark.llm.similarity import cosine_topk_multi

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="zero-norm|DIVIDE_BY_ZERO"):
        cosine_topk_multi(df, [(0, [1.0, 1.0])], k=2).collect()


def test_cosine_topk_multi_degenerate_queries(spark):
    """ADVICE r15: zero queries return an empty (query_id, id, cosine)
    frame; ragged query vectors refuse loudly instead of dying inside
    numpy with an inhomogeneous-shape error."""
    from sclera_spark.llm.similarity import cosine_topk_multi

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [2.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = cosine_topk_multi(df, [], k=2)
    assert out.columns == ["query_id", "vec_id", "cosine"]
    assert out.count() == 0
    with pytest.raises(ValueError, match="share one length"):
        cosine_topk_multi(df, [(0, [1.0]), (1, [1.0, 2.0])], k=2)


def test_semantic_dedup_prune_handles_abnormal_vectors(spark):
    """The grouped-numpy prune must keep every row the old self-join
    kept: NULL/NaN/mismatched vectors never prune in either direction;
    zero-norm vectors have undefined cosine (try_divide NULL) and
    survive; equal ids never drop each other."""
    from sclera_spark.llm.semdedup import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),       # dup of 0 -> dropped
        (2, None),                        # NULL vector survives
        (3, [0.0, 0.0, 0.0, 0.0]),        # zero norm survives
        (4, [float("nan"), 0.0, 0.0, 0.0]),  # NaN survives
        (5, [1.0, 0.0]),                  # length mismatch survives
        (6, [2.0, 0.0, 0.0, 0.0]),        # cosine 1.0 with 0 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(df, k=2, threshold=0.9).collect()
    )
    assert kept == [0, 2, 3, 4, 5]


def test_token_budget_bucket_carry_matches_reference(spark):
    """The r15 straddle-bucket carry must reproduce the single-window
    reference cut exactly, including at budgets that land inside and
    exactly on document boundaries."""
    import hashlib

    from sclera_spark.llm import token_budget_sample

    rows = [(i, "tok " * (i % 13)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = sorted(
        rows,
        key=lambda r: (
            hashlib.md5(f"s9{r[0]}".encode()).hexdigest(),
            r[0],
        ),
    )
    for budget in (1, 7, 100, 513, 10**9):
        got = sorted(
            r["doc_id"]
            for r in token_budget_sample(
                df, budget=budget, salt="s9"
            ).collect()
        )
        want, acc = [], 0
        for i, txt in ref:
            n = len(txt.split())
            if acc < budget:
                want.append(i)
            acc += n
        assert got == sorted(want), budget


def test_token_budget_null_id_contract(spark):
    """Pinned contract (r15 carry design, VERDICT r15 item 2): NULL-id
    rows are NEVER admitted and their token counts do not consume
    budget — in the batch sampler AND the streaming committer. (The
    pre-r15 global sort admitted NULL hashes first in a
    tie-nondeterministic order; a row with no identity has no stable
    place in a reproducible draw.)"""
    import shutil
    import tempfile

    from sclera_spark.llm import token_budget_sample
    from sclera_spark.sources.manifest import ManifestTable
    from sclera_spark.streaming.ops import token_budget_committer

    rows = [(i, "tok " * 5) for i in range(40)]
    with_nulls = rows + [(None, "heavy " * 1000)] * 3
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dfn = spark.createDataFrame(with_nulls, "doc_id long, text string")
    for budget in (1, 37, 10**6):
        clean = sorted(
            r["doc_id"]
            for r in token_budget_sample(df, budget=budget, salt="nn").collect()
        )
        nulled = sorted(
            (r["doc_id"] for r in
             token_budget_sample(dfn, budget=budget, salt="nn").collect()),
            key=lambda v: (v is None, v),
        )
        # identical cut: no NULL admitted, no budget consumed by them
        assert nulled == clean, budget

    # streaming committer: same contract, and tb_tokens must not count
    # the NULL rows' tokens
    base = tempfile.mkdtemp(prefix="sclera_tbnull_")
    try:
        path = base + "/kept"
        commit = token_budget_committer(
            path, budget=10**6, salt="nn", stream_id="t"
        )
        commit(dfn, 0)
        mt = ManifestTable(path)
        kept = sorted(
            r["doc_id"] for r in mt.read(spark).select("doc_id").collect()
        )
        assert kept == [r[0] for r in rows]
        assert int(mt.meta()["tb_tokens"]) == 40 * 5
    finally:
        shutil.rmtree(base, ignore_errors=True)
