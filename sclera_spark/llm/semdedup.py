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
    on_oversize: str = "split",
    split_k: int = 8,
    max_split_rounds: int = 16,
    max_split_fanout: int = 64,
) -> DataFrame:
    """Survivors of within-cluster cosine pruning: the input's columns
    plus ``cluster``. A row is dropped iff a same-cluster row with a
    smaller id is cosine-similar at >= threshold. An empty (or
    all-NULL-vector) input returns an empty result, matching the SQL
    oracle; an input already carrying a ``cluster`` column refuses
    loudly (the output column would silently clobber it).

    Oversize growth path (r13, VERDICT task 3): a cluster larger than
    ``max_cluster`` is SUB-CLUSTERED instead of refused —
    ``split_k`` deterministic sub-seeds (the lexicographically-smallest
    distinct vectors within the hot cell, the same convention as the
    top level) re-partition it via the shared nearest-centroid
    expression, recursively until every bucket fits. Pruning then runs
    within the FINAL buckets, so the operator degrades gracefully to
    more-approximate (near-dups split across sub-buckets both survive
    — the same documented recall trade as SemDeDup's cross-cluster
    blindness) rather than melting a reducer or refusing. A bucket
    whose rows all share ONE distinct vector cannot split and does not
    need the quadratic join at all: its non-null-vector rows collapse
    to the min-id survivor directly (cosine of a vector with itself is
    1). ``on_oversize='refuse'`` restores the loud r12 refusal; the
    split path still refuses loudly on pathological concentration
    (``max_split_rounds`` levels or ``max_split_fanout`` simultaneous
    hot cells) rather than building an unbounded plan."""
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
    # not a shuffle). NULL-vector rows group under a NULL cluster id,
    # which an equi-join never matches — they are never quadratic and
    # never split.
    sizes = {
        r["cluster"]: r["count"]
        for r in cl.groupBy("cluster").count().collect()
    }
    oversized = sorted(
        c for c, n in sizes.items() if c is not None and n > max_cluster
    )
    if oversized and on_oversize == "refuse":
        worst = max(sizes[c] for c in oversized)
        raise ValueError(
            f"semantic_dedup: largest cluster holds {worst} rows "
            f"(cap {max_cluster}) — the within-cluster self-join "
            "would be quadratic in it. Raise k (more, smaller "
            "clusters) or max_cluster explicitly."
        )
    from pyspark.sql import Window

    from sclera_spark.llm.similarity import nearest_centroid_expr

    uniform: dict[int, bool] = {}  # bucket id -> min-id rule drops rest
    next_id = len(seeds)
    rounds = 0
    while oversized:
        rounds += 1
        if rounds > max_split_rounds or len(oversized) > max_split_fanout:
            raise ValueError(
                f"semantic_dedup: oversize sub-clustering did not "
                f"converge ({len(oversized)} hot cells at round "
                f"{rounds}; caps {max_split_fanout} cells / "
                f"{max_split_rounds} rounds) — the embedding "
                "distribution is pathologically concentrated. Raise "
                "max_cluster, split_k, or the caps explicitly."
            )
        # per-hot-cell deterministic sub-seeds: top split_k distinct
        # vectors by lexicographic order, one window pass, bounded
        # driver rows (split_k x |oversized|)
        w = Window.partitionBy("cluster").orderBy("__v")
        sd = (
            cl.where(F.col("cluster").isin(oversized))
            .select(
                "cluster",
                F.col(vec_col).cast("array<double>").alias("__v"),
            )
            .where(F.col("__v").isNotNull())
            .distinct()
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= split_k)
            .orderBy("cluster", "__v")
            .collect()
        )
        by_c: dict[int, list[list[float]]] = {}
        for r in sd:
            by_c.setdefault(r["cluster"], []).append(
                [float(x) for x in r["__v"]]
            )
        expr = F.col("cluster")
        split_any = False
        for c in oversized:
            sub = by_c.get(c, [])
            if len(sub) <= 1:
                # every row in the bucket shares one distinct vector:
                # unsplittable, but the join is pointless too — mark
                # for the direct min-id survivor rule (self-cosine
                # rounds to exactly 1.0; a zero vector has NULL cosine
                # and never prunes, matching the join semantics)
                nz = bool(sub) and any(x != 0.0 for x in sub[0])
                uniform[c] = nz and 1.0 >= float(threshold)
                continue
            vec = F.col(vec_col).cast("array<double>")
            expr = F.when(
                F.col("cluster") == c,
                F.lit(next_id) + nearest_centroid_expr(vec, sub),
            ).otherwise(expr)
            next_id += len(sub)
            split_any = True
        if split_any:
            cl = cl.withColumn("cluster", expr.cast("int"))
            sizes = {
                r["cluster"]: r["count"]
                for r in cl.groupBy("cluster").count().collect()
            }
        oversized = sorted(
            c
            for c, n in sizes.items()
            if c is not None and n > max_cluster and c not in uniform
        )
    join_src = cl
    if uniform:
        join_src = cl.where(
            ~F.col("cluster").isin(list(uniform))
            | F.col("cluster").isNull()
        )
    # r15: the within-cluster prune runs as ONE grouped Arrow pass with
    # numpy pairwise cosine instead of the former self-join — the JVM
    # zip_with/aggregate dot product is CodegenFallback (interpreted per
    # element per PAIR: O(cluster² · dim) interpreter steps dominated
    # this operator's wall time). Semantics preserved exactly:
    # - the dot/norm folds accumulate per DIMENSION in sequence (the
    #   same float64 left-fold addition order as the old expression);
    # - round(·, 9) is HALF_UP away-from-zero, as Spark's round;
    # - zero-norm operands (try_divide -> NULL), NULL/NaN/mismatched
    #   vectors and NULL ids never prune in either direction (NaN/-inf
    #   comparisons are false, cross-length pairs are skipped);
    # - only strictly-smaller ids prune (ties never drop each other);
    # - rows in a NULL cluster never join (equi-join semantics).
    # Memory bound per task: one cluster's vectors (<= max_cluster,
    # enforced above) plus one sim block — the same O(cluster) bound
    # the sort-merge join's per-key buffering had.
    import numpy as np
    import pandas as pd

    thr = float(threshold)
    prune_src = join_src.select(
        F.col(id_col).alias("__ida"),
        F.col("cluster").alias("__cl"),
        F.col(vec_col).cast("array<double>").alias("__va"),
    )
    out_dt = prune_src.schema["__ida"].dataType.simpleString()

    def _prune(key, pdf):
        empty = pdf.iloc[0:0][["__ida"]].rename(columns={"__ida": id_col})
        if key[0] is None or len(pdf) < 2:
            return empty
        ok = pdf["__ida"].notna() & pdf["__va"].notna()
        pdf = pdf[ok]
        if len(pdf) < 2:
            return empty
        ids_all = pdf["__ida"].to_numpy()
        vecs = pdf["__va"].to_numpy()
        lens = np.fromiter((len(v) for v in vecs), dtype=np.int64)
        dropped = []
        for dim in np.unique(lens):
            sel = np.flatnonzero(lens == dim)
            if len(sel) < 2:
                continue
            ids = ids_all[sel]  # dtype follows id_col (int or str alike)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            X = np.stack(
                [np.asarray(vecs[i], dtype=np.float64) for i in sel[order]]
            )
            n = len(ids)
            N = np.zeros(n, dtype=np.float64)
            for d in range(dim):  # exact left-fold addition order
                N += X[:, d] * X[:, d]
            norms = np.sqrt(N)
            # j may prune i only when id_j < id_i: after the sort that
            # is column index < the row's strictly-smaller-id count
            lt = np.searchsorted(ids, ids, side="left")
            bs = max(1, (1 << 22) // n)
            drop = np.zeros(n, dtype=bool)
            for s in range(0, n, bs):
                e = min(n, s + bs)
                S = np.zeros((e - s, n), dtype=np.float64)
                for d in range(dim):
                    S += X[s:e, d, None] * X[None, :, d]
                den = norms[s:e, None] * norms[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    sim = np.where(den == 0, -np.inf, S / den)
                r = np.copysign(
                    np.floor(np.abs(sim) * 1e9 + 0.5), sim
                ) / 1e9
                hit = r >= thr
                hit &= np.arange(n)[None, :] < lt[s:e, None]
                drop[s:e] = hit.any(axis=1)
            dropped.append(ids[drop])
        if not dropped:
            return empty
        return pd.DataFrame({id_col: np.concatenate(dropped)})

    dups = prune_src.groupBy("__cl").applyInPandas(
        _prune, schema=f"{id_col} {out_dt}"
    )
    uniform_drop = [c for c, drop in uniform.items() if drop]
    if uniform_drop:
        # uniform buckets: every non-null-vector row is an exact dup of
        # the min id — one aggregate + one semi-join, never quadratic
        usrc = cl.where(F.col("cluster").isin(uniform_drop)).where(
            F.col(vec_col).isNotNull()
        )
        keep = usrc.groupBy("cluster").agg(
            F.min(id_col).alias("__keep")
        )
        udups = (
            usrc.join(keep, "cluster")
            .where(F.col(id_col) != F.col("__keep"))
            .select(F.col(id_col))
        )
        dups = dups.unionByName(udups)
    # materialize the (small) dropped-id set NOW, exactly like
    # minhash_dup_pairs: the returned plan then costs ONE scan +
    # narrow assignment + anti-join against a materialized id list,
    # instead of re-running the quadratic-within-cluster join (and two
    # more base scans) on every downstream action
    dups = dups.distinct().localCheckpoint(eager=True)
    return cl.join(dups, id_col, "left_anti").select(
        *df.columns, "cluster"
    )
