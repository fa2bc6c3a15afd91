"""Semantic (embedding-space) deduplication — the SemDeDup shape
(Abbas et al. 2023, arXiv:2303.09540): cluster embeddings around k
centroids, then prune near-duplicates WITHIN each cluster by cosine
similarity, keeping one representative per near-dup neighborhood.
Pairwise work is confined to clusters, so the quadratic blow-up of
all-pairs cosine never happens — the paper's reason for clustering
first, and the reason this survives 100 TB: assignment is a narrow
JVM-expression map (centroid literals compiled into the plan, no
shuffle), the prune join shuffles on the cluster id only, and a
cluster larger than ``max_cluster`` refuses loudly instead of melting
one reducer with an O(n^2) self-join.

Determinism (what makes an exact SQL oracle possible, unlike k-means):
- centroids = the k lexicographically-smallest DISTINCT vectors (the
  same seeded-Voronoi convention as ml/registry.py's clusterer — no
  RNG, no iteration);
- assignment = argmin squared-L2, ties to the lowest centroid index;
- prune rule = drop a row iff SOME same-cluster row with a SMALLER id
  has cosine >= threshold (the kept set is exactly the ids that are
  minimal in their similarity neighborhood — order-independent, no
  iterative greedy pass).

Cosine is computed in float64 with the emitted/compared value rounded
to 9 decimals, the same summation-order armor as cosine_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sclera_spark.llm.similarity import _dot, _norm


def semantic_seeds(
    df: DataFrame, k: int, vec_col: str = "embedding"
) -> list[list[float]]:
    """The k lexicographically-smallest distinct vectors — O(k) driver
    rows (a TakeOrdered over distinct vectors, never a full collect)."""
    rows = (
        df.select(F.col(vec_col).alias("v"))
        .where(F.col("v").isNotNull())
        .distinct()
        .orderBy("v")
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("semantic_dedup: no vectors to seed clusters")
    return [[float(x) for x in r.v] for r in rows]


def assign_clusters(
    df: DataFrame,
    seeds: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Argmin squared-L2 centroid id as ONE JVM expression (centroids
    are literals in the plan — no shuffle, no UDF, full codegen); ties
    to the lowest centroid index via struct ordering. Delegates to the
    IVF assignment — identical semantics, one implementation to keep
    tie-break/precision behavior in sync (similarity.ivf_assign).
    Writes ``out_col`` directly (ADVICE r12: the rename-based version
    clobbered a pre-existing ``ivf_list`` input column); refuses an
    input that already carries ``out_col``."""
    from sclera_spark.llm.similarity import ivf_assign

    if out_col in df.columns:
        raise ValueError(
            f"assign_clusters: the input already has a {out_col!r} "
            "column (the output adds one); rename it first"
        )
    return ivf_assign(df, seeds, vec_col, out_col=out_col)


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster: int = 100_000,
) -> DataFrame:
    """Survivors of within-cluster cosine pruning: the input's columns
    plus ``cluster``. A row is dropped iff a same-cluster row with a
    smaller id is cosine-similar at >= threshold. An empty (or
    all-NULL-vector) input returns an empty result, matching the SQL
    oracle; an input already carrying a ``cluster`` column refuses
    loudly (the output column would silently clobber it)."""
    if "cluster" in df.columns:
        raise ValueError(
            "semantic_dedup: the input already has a 'cluster' column "
            "(the output adds one); rename it first"
        )
    try:
        seeds = semantic_seeds(df, k, vec_col)
    except ValueError:
        # no vectors at all: the dedup of nothing is nothing (the
        # seeding helper keeps its loud contract for direct callers)
        return df.limit(0).withColumn(
            "cluster", F.lit(None).cast("int")
        )
    cl = assign_clusters(df, seeds, vec_col)
    # scale guard BEFORE the quadratic-within-cluster join: one tiny
    # aggregate, k rows to the driver (assignment is a narrow map, so
    # re-evaluating it for the final plan costs one extra codegen pass,
    # not a shuffle)
    sizes = cl.groupBy("cluster").count().collect()
    worst = max((r["count"] for r in sizes), default=0)
    if worst > max_cluster:
        raise ValueError(
            f"semantic_dedup: largest cluster holds {worst} rows "
            f"(cap {max_cluster}) — the within-cluster self-join "
            "would be quadratic in it. Raise k (more, smaller "
            "clusters) or max_cluster explicitly."
        )
    a = cl.select(
        F.col(id_col).alias("__ida"),
        F.col("cluster").alias("__cl"),
        F.col(vec_col).cast("array<double>").alias("__va"),
    )
    b = cl.select(
        F.col(id_col).alias("__idb"),
        F.col("cluster").alias("__cl"),
        F.col(vec_col).cast("array<double>").alias("__vb"),
    )
    sim = F.round(
        _dot(F.col("__va"), F.col("__vb"))
        / (_norm(F.col("__va")) * _norm(F.col("__vb"))),
        9,
    )
    dups = (
        a.join(b, "__cl")
        .where(F.col("__idb") < F.col("__ida"))
        .where(sim >= F.lit(float(threshold)))
        .select(F.col("__ida").alias(id_col))
        .distinct()
    )
    # materialize the (small) dropped-id set NOW, exactly like
    # minhash_dup_pairs: the returned plan then costs ONE scan +
    # narrow assignment + anti-join against a materialized id list,
    # instead of re-running the quadratic-within-cluster join (and two
    # more base scans) on every downstream action
    dups = dups.localCheckpoint(eager=True)
    return cl.join(dups, id_col, "left_anti").select(
        *df.columns, "cluster"
    )
