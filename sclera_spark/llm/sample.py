"""Deterministic sampling operators for reproducible corpus pipelines.

A training-data pipeline needs samples that are (a) reproducible across
reruns, (b) independent of physical layout (partitioning, file order),
and (c) cheap at 100 TB. `rand()`-based sampling fails (a) and (b); both
operators here key off a content hash instead, so the same row always
lands on the same side of the cut no matter how the scan is partitioned.

Spark-first: the hash is `md5` (hex) -> first 8 hex digits -> BIGINT via
`conv`, a pure JVM expression chain chosen deliberately over `xxhash64`
because every SQL engine has md5 — the same expression runs in DuckDB,
so sampling decisions made here can be audited (and re-derived) anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 buckets from the first 8 hex digits of md5 — uniform enough for
# sampling; collision structure is irrelevant (we only need a stable
# pseudo-uniform in [0, 1))
_BUCKETS = float(1 << 32)


def _hash_unit(key: Column, salt: str) -> Column:
    """Deterministic pseudo-uniform in [0, 1) from a key column + salt."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10)
    return h.cast("bigint").cast("double") / F.lit(_BUCKETS)


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    salt: str = "",
    out_col: str | None = None,
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content hash of ``key_col``.

    Layout-independent and rerun-stable: a row's fate depends only on its
    key and the salt. Changing the salt draws an independent sample —
    use distinct salts for train/validation splits so they stay disjoint
    in expectation but individually stable. Pure filter on a codegen'd
    expression: no shuffle, no state, scan throughput at any scale.

    With ``out_col`` the unit-interval hash is also emitted (useful for
    nested splits: ``u < 0.8`` train / ``u >= 0.9`` holdout).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    u = _hash_unit(F.col(key_col), salt)
    out = df.filter(u < F.lit(rate))
    if out_col:
        out = out.withColumn(out_col, u)
    return out


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int | dict,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministically:
    rows are ranked within each stratum by their key hash (a stable
    pseudo-random order) and the first n win. ``n_per_group`` may be a
    PER-STRATUM quota dict — the training-MIXTURE sampler ("40k web,
    20k code, 5k math"): unlisted strata contribute nothing, and every
    quota is filled deterministically, so re-running the pipeline
    reproduces the mixture exactly.

    Scale notes: one shuffle on ``group_col`` (the window). Fine for
    quota-style sampling over many moderate strata; for a FEW huge strata
    the single-reducer-per-stratum window is the bottleneck — there,
    derive per-stratum rates from counts and use :func:`hash_sample`
    twice (slight over-sample, exact trim second pass) instead.
    """
    from pyspark.sql.window import Window

    if isinstance(n_per_group, dict):
        quota = F.coalesce(
            F.create_map(
                *[
                    F.lit(x)
                    for k, v in n_per_group.items()
                    for x in (k, int(v))
                ]
            )[F.col(group_col)],
            F.lit(0),
        )
    else:
        quota = F.lit(int(n_per_group))
    u = _hash_unit(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= quota)
        .drop("__rk")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str,
    group_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES),
    deterministic: each row draws its pseudo-uniform u from the key hash
    and is ranked by score = -ln(u) / weight ascending; the top ``n``
    (per stratum if ``group_col``) win. Inclusion probability is
    proportional to weight, and — like the other operators here — the
    outcome is reproducible and layout-independent, with the SAME
    expression re-derivable in any SQL engine for audit.

    Rows with NULL or non-positive weight are excluded (they cannot be
    drawn). u is offset to (0, 1) — (h + 0.5) / 2^32 — so ln never sees
    0 and the score stays finite. One window shuffle (on the stratum, or
    a single global reducer when ``group_col`` is None — fine for
    top-n-of-corpus sizes of n, not for huge global samples)."""
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_BUCKETS)
    score = -F.log(u) / F.col(weight_col)
    eligible = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__score", score)
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(
        F.col("__score").asc(), F.col(key_col).asc()
    )
    return (
        eligible.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk", "__score")
    )


# ----------------------------------------------------- token-budget carry
#
# Shared machinery of the batch sampler (token_budget_sample) and the
# streaming committer (streaming/ops.token_budget_committer): the order
# key is a uniform md5, so its first 4 hex chars give a 65536-way range
# bucketing monotone in the (md5, id) admission order BY CONSTRUCTION.
# One narrow groupBy ships per-bucket (sum, count) to the driver; the
# walk finds the budget-straddling bucket; everything before it is
# admitted by a plain hash predicate, and only the straddle bucket runs
# a window. The payload never rides a shuffle.

_TB_BUCKETS = 1 << 16  # 65536 = 16^4: first 4 hex chars of the md5 key


def _tb_hash(id_col: str, salt: str) -> Column:
    return F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))


def _tb_bucket(h: Column) -> Column:
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def _tb_bucket_stats(t: DataFrame) -> dict[int, tuple[int, int]]:
    """{bucket: (token sum, row count)} from a (__b, __n) frame — ONE
    narrow aggregate, <= _TB_BUCKETS tiny rows to the driver (NULL
    bucket = NULL id rows may appear as a None key; callers ignore it
    per the pinned NULL-id contract)."""
    return {
        r["__b"]: (r["s"], r["c"])
        for r in t.groupBy("__b")
        .agg(F.sum("__n").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }


def _tb_walk_buckets(
    totals: dict[int, int], budget: int
) -> tuple[int | None, int]:
    """Walk buckets in hash order: a bucket is FULLY admitted while the
    running total after it stays under the budget (admission is
    prior < budget, and every row's exclusive prior in such a bucket
    is <= that bucket's end total minus its own count); the first
    bucket whose end total reaches the budget is the straddle bucket.
    Returns (straddle bucket or None, tokens before it)."""
    run = 0
    for b in range(_TB_BUCKETS):
        after = run + (totals.get(b) or 0)
        if after >= budget:
            return b, run
        run = after
    return None, run


def token_budget_sample(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
    count_col: str | None = None,
) -> DataFrame:
    """Draw documents until a TOKEN budget fills — the pretraining
    corpus-sizing step ("give me ~10B tokens of this source"). Rows are
    taken in md5(salt || id) order (a deterministic, layout-independent
    shuffle of the corpus) while the EXCLUSIVE prefix of token counts
    stays under ``budget``; the last admitted document may overshoot it
    (take-until semantics — a budget is a target, not a hard byte
    ceiling). Same salt + budget -> same sample on any partitioning.

    Token counts come from the shared whitespace tokenizer (NULL text
    counts 0, so metadata-only rows ride along free), or pass
    ``count_col`` to budget on precomputed counts (e.g. a real
    tokenizer's). The global running total is the bucket carry over a
    narrow proxy — no single-partition window, driver state is one row
    per hash bucket (``_TB_BUCKETS`` = 65536, corpus-size independent),
    so the cut scales to any corpus size.

    NULL-id contract (pinned since the r15 carry design, tested in
    tests/test_vectorized_parity.py): a NULL id hashes to NULL, lands
    in no bucket, and is NEVER admitted — nor does its count consume
    budget. (The pre-r15 global sort ordered NULL hashes first and
    admitted them in a tie-nondeterministic order; there is no
    deterministic per-row order among NULL keys to restore, so the
    carry rejects them outright — a row with no identity has no stable
    place in a reproducible draw.)"""
    from pyspark.sql.window import Window

    from sclera_spark.llm.text import _tokens

    if budget <= 0:
        raise ValueError("budget must be positive")
    # exported surface over arbitrary caller frames: refuse loudly on
    # a collision with the internal working columns instead of
    # silently overwriting and then dropping the caller's data
    clash = {"__h", "__n", "__b", "__prior"} & set(df.columns)
    if clash:
        raise ValueError(
            "token_budget_sample: input columns collide with internal "
            f"working columns {sorted(clash)}; rename them first"
        )
    # NULL counts 0 on BOTH paths: a row whose count is NULL must ride
    # along free, not vanish (an un-coalesced NULL poisons its own
    # prefix and drops the row from the cut entirely)
    n = F.coalesce(
        (
            F.col(count_col).cast("long")
            if count_col is not None
            else F.size(_tokens(F.col(text_col))).cast("long")
        ),
        F.lit(0),
    )
    # r15 carry design — exploit that the order key IS a uniform hash:
    # the first 4 hex chars of md5 give a 65536-way range bucketing
    # that is monotone in the (md5, id) global order BY CONSTRUCTION
    # (hex digits are ascii-ordered), so there is no RangePartitioner
    # sampling pass, no corpus-wide window, and the document payload
    # never rides a shuffle. One NARROW groupBy collects per-bucket
    # token totals (<= _TB_BUCKETS tiny rows to the driver, corpus-size
    # independent); the driver then knows, exactly, that every bucket
    # before the budget-straddling one is fully admitted (a plain
    # filter on the id hash — no join, no state) and only the ONE
    # straddle bucket (~1/65536 of the corpus, metadata-only columns)
    # needs the within-bucket running sum + a semi-join back.
    # id_col identifies a document: rows sharing an id are admitted or
    # dropped as a unit (with duplicate ids the old per-row path's
    # order among identical (hash, id) keys was tie-nondeterministic
    # anyway).
    h = _tb_hash(id_col, salt)
    bucket = _tb_bucket(h)
    t = df.select(
        h.alias("__h"), F.col(id_col), n.alias("__n")
    ).withColumn("__b", F.conv(F.substring("__h", 1, 4), 16, 10).cast("int"))
    totals = {b: s for b, (s, _c) in _tb_bucket_stats(t).items()}
    bstar, off_star = _tb_walk_buckets(totals, budget)
    full = df.where(bucket < F.lit(bstar if bstar is not None else _TB_BUCKETS))
    if bstar is None:
        return full  # the whole corpus fits in the budget
    st = t.where(F.col("__b") == bstar)
    w = (
        Window.partitionBy("__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sids = (
        st.withColumn(
            "__prior",
            F.lit(int(off_star)) + F.sum("__n").over(w) - F.col("__n"),
        )
        .where(F.col("__prior") < budget)
        .select(id_col)
    )
    return full.unionByName(
        df.where(bucket == F.lit(bstar)).join(
            sids, on=id_col, how="left_semi"
        )
    )
