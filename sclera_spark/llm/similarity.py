"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the dot product is a single JVM-side
  `aggregate(zip_with(...))` expression — no UDF, full codegen — followed
  by an orderBy/limit (Spark's TakeOrdered, no global sort materialized).
- ANN path: random-hyperplane LSH — signature bits via the same JVM dot
  product against broadcast hyperplanes, bucket join for candidates.
  At 100 TB the bucket join replaces the O(N) scan per query with a
  shuffle on bucket keys.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(x * x for x in query_vec))
    # compute in float64 regardless of storage precision (array<float>
    # inputs would otherwise accumulate in float32 and diverge from oracles)
    v = F.col(vec_col).cast("array<double>")
    sim = _dot(v, q) / (_norm(v) * F.lit(qn))
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def topk_per_query(
    scored: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    sim_col: str = "cosine",
) -> DataFrame:
    """Top-k rows per query over a pre-scored (query_id, id, sim)
    frame, in two window phases so the heavy phase parallelizes over
    (input partition x query) keys instead of bottlenecking on the
    handful of query ids: phase 1 takes the LOCAL top-k within each
    original partition (spark_partition_id is projected before the
    exchange, so the key space is partitions x queries), phase 2
    ranks the surviving k x n_partitions rows per query — a tiny
    set. Ties break on id for cross-engine determinism."""
    from pyspark.sql import Window

    # exported surface over caller frames: refuse loudly on collision
    # with the working columns instead of silently replacing them
    clash = {"__pid", "__rn"} & set(scored.columns)
    if clash:
        raise ValueError(
            "topk_per_query: input columns collide with internal "
            f"working columns {sorted(clash)}; rename them first"
        )
    loc = scored.withColumn("__pid", F.spark_partition_id())
    w1 = Window.partitionBy("__pid", query_id_col).orderBy(
        F.col(sim_col).desc(), F.col(id_col)
    )
    pruned = (
        loc.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__pid")
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col(sim_col).desc(), F.col(id_col)
    )
    return (
        pruned.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def cosine_topk_multi(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for MANY query vectors in ONE distributed
    pass — the multi-query serving shape (r13 VERDICT task 4: a
    single-query recall probe is a thin certificate). The query set
    (small, driver-held) compiles into the plan as a literal array of
    (qid, qv, 1/|qv|) structs — broadcast-free; every row explodes
    against all queries (the scan is shared), scoring stays inside
    codegen, and :func:`topk_per_query` keeps the shuffle parallel.
    Output: (query_id, id, cosine), k rows per query.

    r15: the scoring pass is vectorized Arrow batches + numpy (guide
    §4.2) — the old explode-against-literal-structs formulation ran
    the dot product through interpreted higher-order expressions
    (CodegenFallback) per (row x query). The numpy fold accumulates
    per DIMENSION in sequence, reproducing the old aggregate
    expression's float64 addition order bit-for-bit; NULL vectors,
    length mismatches and NULL elements yield NULL cosine exactly as
    zip_with/aggregate null propagation did, and a zero-norm operand
    raises loudly (ANSI divide-by-zero parity)."""
    if id_col in ("__v", "__q"):
        raise ValueError(
            "cosine_topk_multi: id_col collides with an internal "
            "working column name; rename it first"
        )
    import pyarrow as pa

    # explicit degenerate-input contracts (ADVICE r15): the old
    # explode-against-literal-structs formulation returned an empty
    # frame for zero queries and NULL-padded ragged ones; np.asarray
    # would instead die with an opaque inhomogeneous-shape error.
    if not queries:
        return df.sparkSession.createDataFrame(
            [],
            f"{query_id_col} int, {id_col} "
            f"{df.select(id_col).schema[0].dataType.simpleString()}, "
            "cosine double",
        )
    qlens = {len(qv) for _, qv in queries}
    if len(qlens) != 1:
        raise ValueError(
            "cosine_topk_multi: query vectors must share one length, "
            f"got lengths {sorted(qlens)}"
        )
    Q = np.asarray([qv for _, qv in queries], dtype=np.float64)  # (q, dim)
    qn = np.asarray(
        [math.sqrt(sum(x * x for x in qv)) for _, qv in queries],
        dtype=np.float64,
    )
    qids = np.asarray([int(qid) for qid, _ in queries], dtype=np.int32)
    nq, dim = Q.shape

    src = df.select(id_col, vec_col)
    id_dt = src.schema[0].dataType.simpleString()

    def _score(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids, lst = b.column(0), b.column(1)
            row_valid = (
                lst.is_valid().to_numpy(zero_copy_only=False)
                if lst.null_count
                else np.ones(n, dtype=bool)
            )
            offs = lst.offsets.to_numpy()
            lens = offs[1:] - offs[:-1]
            vals = lst.values
            if vals.null_count:
                ev = vals.is_valid().to_numpy(zero_copy_only=False)
                cn = np.concatenate(([0], np.cumsum(~ev)))
                row_nulls = cn[offs[1:]] - cn[offs[:-1]]
            else:
                row_nulls = np.zeros(n, dtype=np.int64)
            clean = row_valid & (lens == dim) & (row_nulls == 0)
            m = int(clean.sum())
            cos_full = np.full((n, nq), np.nan, dtype=np.float64)
            if m:
                vnp = vals.to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                take = (
                    offs[:-1][clean][:, None] + np.arange(dim)[None, :]
                ).ravel()
                X = vnp[take].reshape(m, dim)
                S = np.zeros((m, nq), dtype=np.float64)
                N = np.zeros(m, dtype=np.float64)
                for d in range(dim):  # exact left-fold addition order
                    S += X[:, d, None] * Q[None, :, d]
                    N += X[:, d] * X[:, d]
                den = np.sqrt(N)[:, None] * qn[None, :]
                if (den == 0).any():
                    raise ArithmeticError(
                        "cosine_topk_multi: zero-norm operand "
                        "(division by zero)"
                    )
                cos_full[clean] = S / den
            rep = np.repeat(np.arange(n), nq)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.tile(qids, n), type=pa.int32()),
                    ids.take(pa.array(rep)),
                    pa.array(
                        cos_full.ravel(),
                        type=pa.float64(),
                        mask=np.repeat(~clean, nq),
                    ),
                ],
                names=[query_id_col, id_col, "cosine"],
            )

    scored = src.mapInArrow(
        _score,
        f"{query_id_col} int, {id_col} {id_dt}, cosine double",
    )
    return topk_per_query(scored, k, query_id_col, id_col)


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_bits: int = 16,
    vec_col: str = "embedding",
    out_col: str = "bucket",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane (SRP) LSH bucket id: bit i = sign(v . h_i).
    Hyperplanes are literals compiled into the plan (broadcast-free)."""
    planes = _hyperplanes(dim, n_bits, seed)
    bits = [
        F.when(_dot(F.col(vec_col), F.array(*[F.lit(x) for x in h])) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i, h in enumerate(planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.withColumn(out_col, bucket.cast("long"))


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
    seed: int = 42,
    n_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the exact scan to the query's SRP
    bucket, plus multi-probe neighbors for recall. Probe buckets are the
    standard multi-probe LSH sequence: flip the bits whose hyperplane
    margin |q.h_i| is smallest (the likeliest sign disagreements for true
    neighbors), single flips first, then the cheapest double flips —
    driver-side arithmetic over n_bits values only, the scan stays a
    bucket-key filter."""
    import itertools as _it

    dim = len(query_vec)
    planes = _hyperplanes(dim, n_bits, seed)
    margins = [sum(a * b for a, b in zip(query_vec, h)) for h in planes]
    qb = 0
    for i, m in enumerate(margins):
        if m >= 0:
            qb |= 1 << i
    # candidate probes ranked by total flipped-margin cost
    order = sorted(range(n_bits), key=lambda i: abs(margins[i]))
    cands: list[tuple[float, int]] = []
    for i in order:
        cands.append((abs(margins[i]), qb ^ (1 << i)))
    for i, j in _it.combinations(order[: min(n_bits, 6)], 2):
        cands.append((abs(margins[i]) + abs(margins[j]), qb ^ (1 << i) ^ (1 << j)))
    cands.sort(key=lambda t: t[0])
    probes = [qb] + [b for _, b in cands[: max(0, n_probe - 1)]]
    bucketed = hyperplane_buckets(df, dim, n_bits, vec_col, "bucket", seed)
    pred = (
        F.col("bucket") == probes[0]
        if len(probes) == 1
        else F.col("bucket").isin(probes)
    )
    return cosine_topk(bucketed.filter(pred), query_vec, k, vec_col, id_col)


def ivf_index(
    df: DataFrame,
    dim: int,
    n_lists: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Build an IVF (inverted-file) index: k-means centroids partition the
    corpus; each vector is assigned to its nearest centroid's list.

    Returns (indexed_df with an ``ivf_list`` column, centroids list).
    At scale the assignment is a narrow map (centroids broadcast inside
    the plan as literals) and the index is just a partitioning column —
    write it bucketed/partitioned by ``ivf_list`` and queries touch only
    the probed lists' files.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import array_to_vector

    with_vec = df.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(featuresCol="__v", predictionCol="ivf_list", k=n_lists, seed=seed)
    model = km.fit(with_vec)
    indexed = model.transform(with_vec).drop("__v")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return indexed, centroids


def ivf_topk(
    indexed: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k over an IVF index: probe the ``n_probe`` nearest lists
    (by centroid distance, computed driver-side over n_lists values), then
    exact cosine within them — the standard recall/cost dial."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    dists = [float(np.linalg.norm(q - np.asarray(c))) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: dists[i])[:n_probe]
    subset = indexed.filter(F.col("ivf_list").isin(probe))
    return cosine_topk(subset, query_vec, k, vec_col, id_col)


def ivf_write(indexed: DataFrame, centroids: list[list[float]], path: str) -> None:
    """Persist an IVF index partitioned by ``ivf_list`` — the scale path:
    each inverted list becomes its own parquet partition directory, so a
    probe query's `ivf_list IN (...)` filter is PARTITION PRUNING (only
    the probed lists' files are opened), not a post-scan filter.
    Centroids ride along as a JSON sidecar."""
    import json
    import os

    indexed.write.mode("overwrite").partitionBy("ivf_list").parquet(path)
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as f:
        json.dump(centroids, f)


def ivf_load(spark, path: str):
    """Load a persisted IVF index -> (indexed_df, centroids)."""
    import json
    import os

    with open(os.path.join(path, "_ivf_centroids.json")) as f:
        centroids = json.load(f)
    return spark.read.parquet(path), centroids


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k over a PERSISTED IVF index: the probed-list filter prunes
    parquet partitions (see test_plan_quality — PartitionFilters in the
    scan), so cost scales with n_probe/n_lists of the corpus, not O(N)."""
    indexed, centroids = ivf_load(spark, path)
    return ivf_topk(indexed, centroids, query_vec, k, n_probe, vec_col, id_col)


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold) via SRP-bucket
    self-join: high-cosine pairs land in the same bucket with high
    probability; exact cosine verifies inside the bucket.

    SCALING RULE — n_bits must grow with corpus size. The within-bucket
    self-join costs O(Σ bucket²): with n vectors spread over 2^n_bits
    buckets, expected cost ~ n² / 2^n_bits. Pick
    ``n_bits ≈ log2(n) + 4..6`` so mean bucket occupancy stays in the
    tens (n=1e6 -> ~24 bits; n=1e9 -> ~34 bits, via multiple 32-bit
    bands). Each extra bit halves join cost but lowers same-bucket
    recall for borderline pairs (P[same bucket] = (1 - θ/π)^n_bits);
    recover recall by unioning a few independent seeds rather than
    dropping bits. The driver entry uses n_bits=4 / threshold 0.4 ONLY
    because its synthetic corpus is 300 vectors — do not lift those
    constants into a real pipeline."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    b = hyperplane_buckets(df, dim, n_bits, vec_col, "bucket", seed).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "bucket"
    )
    l, r = b.alias("l"), b.alias("r")
    sim = cosine_similarity(F.col("l.v"), F.col("r.v"))
    return (
        l.join(r, on="bucket", how="inner")
        .filter(F.col("l.id") < F.col("r.id"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select(F.col("l.id").alias("a_id"), F.col("r.id").alias("b_id"), "cosine")
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "ivf_list",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared-L2 argmin,
    ties to the lowest list id) as an ``ivf_list`` column.

    r15: vectorized Arrow batches + numpy (guide §4.2). The previous
    all-JVM formulation (one zip_with/aggregate expression per
    centroid) is CodegenFallback — Catalyst interprets higher-order
    array functions per element — and measured 1.7 s for 2000x64
    vectors x 16 centroids where the batched numpy fold runs the same
    arithmetic in milliseconds. Bit-for-bit identical output: the
    distance accumulates per DIMENSION in sequence (D += (x_d - c_d)^2
    — the same left-fold float64 addition order as the old aggregate
    expression), argmin takes the first minimum (the struct
    tie-to-lowest-id rule), and every abnormal row (NULL vector,
    length mismatch, NULL/NaN elements) lands on list 0 exactly as the
    struct-ordering expression did. No shuffle; centroids live in the
    UDF closure."""
    if len({len(c) for c in centroids}) != 1:
        # ragged centroid lengths (possible when seeds were drawn from
        # mixed-dimension vectors): keep the exact JVM-expression path —
        # its zip_with null-padding defines the semantics there
        vec = F.col(vec_col).cast("array<double>")
        return df.withColumn(out_col, nearest_centroid_expr(vec, centroids))
    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    dim = C.shape[1]

    def _assign_fn(vs: pd.Series) -> pd.Series:
        n = len(vs)
        out = np.zeros(n, dtype=np.int32)
        rows = [
            (i, np.asarray(v, dtype=np.float64))
            for i, v in enumerate(vs)
            if v is not None and len(v) == dim
        ]
        if rows:
            idx = np.fromiter((i for i, _ in rows), dtype=np.int64)
            X = np.stack([x for _, x in rows])  # (m, dim)
            D = np.zeros((len(rows), C.shape[0]), dtype=np.float64)
            for d in range(dim):  # exact fold order per (row, centroid)
                diff = X[:, d, None] - C[None, :, d]
                D += diff * diff
            # NaN distances sort FIRST in the old struct ordering only
            # when every centroid's distance is NaN (a NaN vector
            # element poisons all of them) — where argmin-of-inf also
            # yields 0; map NaN to +inf so finite distances always win
            D = np.where(np.isnan(D), np.inf, D)
            out[idx] = D.argmin(axis=1).astype(np.int32)
        return pd.Series(out)

    _assign = F.pandas_udf(_assign_fn, "int")
    return df.withColumn(out_col, _assign(F.col(vec_col)))


def nearest_centroid_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """The nearest-centroid index (squared-L2 argmin, ties to the lowest
    list id) as one JVM expression over ``vec`` — shared by ivf_assign
    and semantic_dedup's oversize sub-clustering (r13) so tie-break and
    precision behavior stay identical everywhere."""
    entries = []
    for i, c in enumerate(centroids):
        cl = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(vec, cl, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        entries.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
    return F.array_min(F.array(*entries))["i"]


def ivf_append(spark, path: str, new_df: DataFrame, vec_col: str = "embedding") -> int:
    """Append new vectors to a PERSISTED IVF index without rebuilding:
    assign against the index's frozen centroids (sidecar), then append
    parquet files into the matching ``ivf_list=`` partition directories —
    probes keep pruning partitions exactly as before, now seeing the new
    vectors too. Returns the number of appended vectors.

    Maintenance model (the standard IVF trade): centroids stay frozen as
    the corpus grows, so heavily-drifted data degrades list balance over
    time; periodic re-train + rewrite (`ivf_index` + `ivf_write`) is the
    compaction analogue. Appending is O(new vectors); nothing existing
    is read or rewritten.

    Atomicity caveat: this is a plain ``mode('append')`` parquet write,
    NOT a manifest commit — a crash mid-write can leave partial part
    files visible to ``ivf_load`` (Spark's _SUCCESS-less directory scan).
    Acceptable for an index (rebuildable derived data; a re-append after
    a crash at worst duplicates candidates, and exact re-rank dedups by
    id); route through sources/manifest.py if the index must be
    crash-consistent."""
    import json
    import os

    with open(os.path.join(path, "_ivf_centroids.json")) as f:
        centroids = json.load(f)
    # cache: the assignment job runs ONCE, and the returned count is the
    # count of what was actually written (not a recompute that could
    # diverge on a non-deterministic new_df)
    assigned = ivf_assign(new_df, centroids, vec_col).cache()
    try:
        n = assigned.count()
        assigned.write.mode("append").partitionBy("ivf_list").parquet(path)
    finally:
        assigned.unpersist()
    return n


# ---- product quantization (the memory side of billion-scale ANN) ----


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 8,
    n_centers: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_rows: int = 10000,
    iters: int = 12,
) -> list[list[list[float]]]:
    """Train PQ codebooks (Jegou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): the vector splits into ``m``
    subspaces of dim/m; each subspace gets ``n_centers`` k-means
    centers trained DRIVER-SIDE on a bounded deterministic sample
    (md5-ordered first ``sample_rows`` — layout-independent), numpy
    Lloyd iterations with seeded farthest-point-style init. The
    codebook is a tiny frozen artifact (m * n_centers * dim/m floats)
    exactly like the IVF centroids sidecar; corpus size never touches
    driver memory."""
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    samp = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .where(F.size("v") == dim)
        .orderBy(F.md5(F.concat_ws(",", F.col("v").cast("array<string>"))))
        .limit(int(sample_rows))
        .collect()
    )
    X = np.asarray([r["v"] for r in samp], dtype=np.float64)
    if len(X) < n_centers:
        raise ValueError(
            f"PQ training needs >= {n_centers} sample vectors, got {len(X)}"
        )
    rng = np.random.RandomState(seed)
    books: list[list[list[float]]] = []
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        # deterministic init: a random sample point, then greedy
        # farthest-point for spread
        centers = [Xj[rng.randint(len(Xj))]]
        for _ in range(n_centers - 1):
            d = np.min(
                [((Xj - c) ** 2).sum(axis=1) for c in centers], axis=0
            )
            centers.append(Xj[int(np.argmax(d))])
        C = np.asarray(centers)
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_centers):
                pts = Xj[assign == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Encode vectors to PQ codes — an array<int> of per-subspace
    nearest-center ids. Entirely JVM-side: per subspace, slice() the
    vector and argmin the per-center squared-L2 via the same
    struct-array_min trick as ivf_assign (no Python worker anywhere).
    With m=8, n_centers=16 a 384-float (1536 B) embedding becomes 8
    small ints — the ~100-200x storage cut that lets a 100 TB corpus's
    candidate scan live in memory; keep the original column only where
    exact re-ranking reads it."""
    vec = F.col(vec_col).cast("array<double>")
    m = len(codebooks)
    sub = len(codebooks[0][0])
    codes = []
    for j, book in enumerate(codebooks):
        s = F.slice(vec, j * sub + 1, sub)
        entries = []
        for i, c in enumerate(book):
            cl = F.array(*[F.lit(float(x)) for x in c])
            d = F.aggregate(
                F.zip_with(s, cl, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            entries.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
        codes.append(F.array_min(F.array(*entries))["i"])
    return df.withColumn(out_col, F.array(*codes))


def pq_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    refine: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Approximate top-k by ASYMMETRIC DISTANCE (ADC): the query builds
    one tiny lookup table per subspace (n_centers floats — computed on
    the driver, inlined as literals), and each row's approximate
    squared-L2 is m element_at lookups + a sum: pure codegen over the
    8-int codes, never touching the full vectors. With ``refine=r``,
    the top r ADC candidates are re-ranked by EXACT cosine over
    ``vec_col`` (the standard two-stage shape: ADC over everything,
    exact over a sliver)."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    adc = F.lit(0.0)
    for j, book in enumerate(codebooks):
        qj = q[j * sub : (j + 1) * sub]
        lut = [float(((qj - np.asarray(c)) ** 2).sum()) for c in book]
        adc = adc + F.element_at(
            F.array(*[F.lit(v) for v in lut]),
            F.element_at(F.col(code_col), j + 1) + 1,
        )
    scored = encoded.withColumn("adc_dist", adc)
    if refine is None:
        return (
            scored.select(id_col, "adc_dist")
            .orderBy(F.col("adc_dist").asc(), F.col(id_col))
            .limit(k)
        )
    cands = scored.orderBy(
        F.col("adc_dist").asc(), F.col(id_col)
    ).limit(int(refine))
    from sclera_spark.llm.similarity import cosine_topk as _ct  # self

    return _ct(cands, list(map(float, query_vec)), k, vec_col, id_col)


def ivf_pq_write(
    df: DataFrame,
    dim: int,
    path: str,
    n_lists: int = 16,
    m: int = 8,
    n_centers: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    keep_vectors: bool = True,
) -> None:
    """Build and persist a composed IVF+PQ index — the billion-scale
    layout (FAISS's IVFPQ, relationally): k-means lists become parquet
    PARTITIONS (a probe's `ivf_list IN (...)` is partition pruning, not
    a filter), and every vector stores its 8-int PQ code alongside, so
    the in-list candidate scan reads codes, not vectors. With
    ``keep_vectors=False`` the originals are dropped — the ~100x
    smaller index FAISS ships; exact re-ranking then needs the source
    table. Codebooks and centroids ride as one JSON sidecar."""
    import json
    import os

    indexed, centroids = ivf_index(df, dim, n_lists, vec_col, seed)
    books = pq_train(df, dim, m, n_centers, vec_col, seed)
    enc = pq_encode(indexed, books, vec_col)
    if not keep_vectors:
        enc = enc.drop(vec_col)
    enc.write.mode("overwrite").partitionBy("ivf_list").parquet(path)
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as f:
        json.dump({"centroids": centroids, "pq_codebooks": books}, f)


def ivf_pq_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    refine: int | None = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k over a persisted IVF+PQ index: probe the n_probe
    nearest lists (driver-side over n_lists centroids -> partition
    pruning), ADC-score their codes (codegen LUT sums), exact-cosine
    re-rank the top ``refine`` when the index kept its vectors. Cost
    scales with n_probe/n_lists of the corpus for the scan and with
    ``refine`` for the exact stage — never O(N) on full vectors."""
    import json
    import os

    import numpy as np

    with open(os.path.join(path, "_ivf_centroids.json")) as f:
        side = json.load(f)
    if isinstance(side, list):  # a plain-IVF sidecar has no codebooks
        raise ValueError(f"{path} is a plain IVF index; use ivf_topk_indexed")
    centroids, books = side["centroids"], side["pq_codebooks"]
    q = np.asarray(query_vec, dtype=np.float64)
    dists = [float(np.linalg.norm(q - np.asarray(c))) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: dists[i])[:n_probe]
    subset = spark.read.parquet(path).filter(F.col("ivf_list").isin(probe))
    if refine is not None and vec_col not in subset.columns:
        refine = None  # vectors dropped at build: ADC order is final
    return pq_topk(
        subset, books, list(map(float, query_vec)), k, refine, vec_col, id_col
    )
