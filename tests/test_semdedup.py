"""Semantic dedup (llm/semdedup.py — the SemDeDup shape,
arXiv:2303.09540): deterministic seeded-Voronoi clustering + within-
cluster cosine pruning. The DuckDB-exact oracle lives in
__spark_entry__ (`semantic_dedup`); these tests pin planted-truth
behavior, the scale refusal, and plan shape."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from sclera_spark.llm import assign_clusters, semantic_dedup, semantic_seeds


def _unit(*xs):
    n = math.sqrt(sum(x * x for x in xs))
    return [float(x / n) for x in xs]


@pytest.fixture()
def planted(spark):
    # two well-separated directions. Seeds are the k LEXICOGRAPHICALLY
    # smallest distinct vectors, so with k=3 the seeds are the two
    # y-direction vectors (each its own cluster — the documented
    # cross-cluster survival) and x-direction near-dup of id 3; ids
    # 1/2 (exact dups of each other) land in 3's cluster.
    rows = [
        (1, _unit(1.0, 0.0, 0.0)),
        (2, _unit(1.0, 0.0, 0.0)),
        (3, _unit(0.98, 0.02, 0.0)),
        (4, _unit(0.0, 1.0, 0.0)),
        (5, _unit(0.0101, 0.99995, 0.0)),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_planted_neighbors_prune_to_min_id(planted):
    out = semantic_dedup(
        planted, k=3, threshold=0.95, id_col="vec_id"
    )
    kept = sorted(r.vec_id for r in out.collect())
    # 2 (exact dup) and 3 (same-cluster near-dup) fall to 1; 4 and 5
    # are near-dups that SEEDED separate clusters, so both survive —
    # the documented SemDeDup approximation
    assert kept == [1, 4, 5]
    cl = {r.vec_id: r.cluster for r in out.collect()}
    assert cl[1] != cl[4] and cl[4] != cl[5]


def test_threshold_is_inclusive_and_respected(planted):
    # at a threshold above every planted sim except the exact dup,
    # only the exact duplicate is pruned
    out = semantic_dedup(planted, k=3, threshold=0.9999999)
    assert sorted(r.vec_id for r in out.collect()) == [1, 3, 4, 5]


def test_threshold_boundary_is_inclusive(spark):
    """A pair whose rounded cosine EQUALS the threshold exactly must
    prune (>= is inclusive): sim([1,0],[0.42,sqrt(1-0.42^2)]) = 0.42
    to the double, which round(.,9) keeps at 0.42 — the comparison is
    equality, not strict dominance."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.42, math.sqrt(1.0 - 0.42 * 0.42)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # k=1: one cluster, so the pair IS compared
    out = semantic_dedup(df, k=1, threshold=0.42)
    assert sorted(r.vec_id for r in out.collect()) == [1]
    # one ulp above the threshold: the same pair survives
    out2 = semantic_dedup(df, k=1, threshold=0.4200000005)
    assert sorted(r.vec_id for r in out2.collect()) == [1, 2]


def test_empty_and_collision_contracts(spark):
    """Late-r12 review: an empty (or all-NULL-vector) input returns an
    empty frame like the SQL oracle; an input already carrying a
    'cluster' column refuses loudly instead of clobbering it."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semantic_dedup(empty)
    assert out.columns == ["vec_id", "embedding", "cluster"]
    assert out.count() == 0
    nulls = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    assert semantic_dedup(nulls).count() == 0
    clash = spark.createDataFrame(
        [(1, [1.0], 5)], "vec_id long, embedding array<double>, cluster int"
    )
    with pytest.raises(ValueError, match="'cluster' column"):
        semantic_dedup(clash)


def test_cross_cluster_neighbors_survive(spark):
    """The documented SemDeDup approximation: near-dups landing in
    DIFFERENT clusters are not compared — both survive."""
    rows = [
        (1, _unit(1.0, 0.09, 0.0)),
        (2, _unit(1.0, -0.09, 0.0)),  # sim(1,2) ~ 0.984
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # k=2 with only two distinct vectors: each seeds its own cluster
    out = semantic_dedup(df, k=2, threshold=0.9)
    assert sorted(r.vec_id for r in out.collect()) == [1, 2]


def test_over_cap_cluster_refuses(planted):
    with pytest.raises(ValueError, match="largest cluster"):
        semantic_dedup(
            planted, k=1, threshold=0.99, max_cluster=3,
            on_oversize="refuse",
        )


def test_oversize_cluster_splits_instead_of_refusing(spark):
    """r13 (VERDICT task 3): an over-cap cluster sub-clusters
    deterministically instead of refusing. Three orthogonal exact-dup
    groups of 20 under k=1 land in ONE 60-row cluster over
    max_cluster=25; the split separates the groups (3 distinct vectors
    -> 3 sub-seeds) and the survivor SET matches the exact unsplit
    path — zero recall loss here because no cross-bucket pair is
    similar. In general the split path's recall bound is the SemDeDup
    cross-cluster one: only same-final-bucket near-dups are pruned."""
    rows = []
    vid = 0
    for base in ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]):
        for _ in range(20):
            rows.append((vid, base))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = semantic_dedup(df, k=1, threshold=0.9, max_cluster=25, split_k=8)
    exact = semantic_dedup(df, k=1, threshold=0.9, max_cluster=1000)
    want = [0, 20, 40]  # min id of each exact-dup group
    assert sorted(r.vec_id for r in got.collect()) == want
    assert sorted(r.vec_id for r in exact.collect()) == want
    # survivors-pairwise invariant: no two same-bucket survivors are
    # similar at >= threshold (else the larger id would have dropped)
    surv = got.collect()
    by_cl: dict = {}
    for r in surv:
        by_cl.setdefault(r.cluster, []).append(np.array(r.embedding))
    for vs in by_cl.values():
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                sim = float(
                    vs[i] @ vs[j]
                    / (np.linalg.norm(vs[i]) * np.linalg.norm(vs[j]))
                )
                assert sim < 0.9


def test_oversize_uniform_bucket_min_id_rule(spark):
    """An over-cap bucket whose rows all share ONE distinct vector
    cannot split; its non-null rows collapse to the min-id survivor
    without the quadratic join. Zero vectors (NULL cosine) and NULL
    vectors never prune, matching the join semantics."""
    rows = (
        [(i, [1.0, 1.0]) for i in range(50)]
        + [(100, [0.0, 0.0]), (101, [0.0, 0.0]), (102, None)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, k=1, threshold=0.9, max_cluster=10)
    assert sorted(
        r.vec_id for r in out.collect()
    ) == [0, 100, 101, 102]
    # ... and the guard still fires when convergence is impossible
    # within the configured rounds
    with pytest.raises(ValueError, match="did not converge"):
        semantic_dedup(
            df, k=1, threshold=0.9, max_cluster=10, max_split_rounds=1
        )


def test_assignment_is_deterministic_and_shuffle_free(planted):
    seeds = semantic_seeds(planted, 2)
    assigned = assign_clusters(planted, seeds)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # literal-compiled narrow map
    a = {r.vec_id: r.cluster for r in assigned.collect()}
    b = {
        r.vec_id: r.cluster
        for r in assign_clusters(
            planted.repartition(7), seeds
        ).collect()
    }
    assert a == b


def test_prune_join_is_cluster_keyed_not_cartesian(planted):
    out = semantic_dedup(planted, k=2, threshold=0.95)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_preexisting_ivf_list_column_survives(spark):
    """ADVICE r12: assign_clusters used to route through a fixed
    'ivf_list' intermediate and silently clobber an input column of
    that name; it now writes out_col directly, and refuses an input
    already carrying out_col (mirroring the 'cluster' guard)."""
    rows = [
        (1, _unit(1.0, 0.0, 0.0), 99),
        (2, _unit(0.0, 1.0, 0.0), 98),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, ivf_list int"
    )
    out = semantic_dedup(df, k=2, threshold=0.9)
    got = {r.vec_id: r.ivf_list for r in out.collect()}
    assert got == {1: 99, 2: 98}  # input column intact
    assert "cluster" in out.columns
    seeds = semantic_seeds(df, 2)
    with pytest.raises(ValueError, match="'ivf_list'"):
        assign_clusters(df, seeds, out_col="ivf_list")


@pytest.mark.slowstress
def test_split_path_layout_independent(spark):
    """The oversize sub-clustering must be deterministic under
    physical layout: the same input repartitioned differently yields
    identical (vec_id, cluster) survivor sets — seeds, sub-seeds, and
    tie-breaks are all order-free by construction."""
    import random

    rng = random.Random(77)
    rows = []
    for i in range(120):
        base = rng.choice([(1.0, 0.0), (0.0, 1.0), (0.7, 0.7)])
        rows.append(
            (
                i,
                [
                    base[0] + rng.random() * 0.05,
                    base[1] + rng.random() * 0.05,
                ],
            )
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = semantic_dedup(df, k=1, threshold=0.995, max_cluster=30, split_k=4)
    b = semantic_dedup(
        df.repartition(7), k=1, threshold=0.995, max_cluster=30, split_k=4
    )
    ra = sorted((r.vec_id, r.cluster) for r in a.collect())
    rb = sorted((r.vec_id, r.cluster) for r in b.collect())
    assert ra == rb
    assert len(ra) < 120  # the prune actually dropped near-dups
