"""Exact-duplicate collapse in the MinHash LSH paths (r16, guide §2.5).

The collapse rewrites the clone-heavy skew case — one (band, bh) bucket
holding a whole exact-duplicate cluster, quadratic in cluster size —
into representative-level LSH plus narrow expansion joins. Equal hsets
imply equal signatures, band hashes, estimates and exact Jaccards, so
the output must be IDENTICAL either way; these tests pin that on a
clone-heavy corpus for both the self-join (minhash_dup_pairs) and the
anti-join (minhash_anti_join_sketched), plus the probe arithmetic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sclera_spark.llm.dedup import (
    _COLLAPSE_MIN_DUPS,
    _exact_dup_count,
    minhash_anti_join_sketched,
    minhash_dup_pairs,
    minhash_sketch,
)


def _clone_heavy_docs(spark):
    """Clone clusters + near-dups + uniques + a NULL text."""
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs before the dawn breaks",
        "sphinx of black quartz judge my vow said the old librarian",
        "completely unrelated text about distributed query processing",
    ]
    rows = []
    # cluster A: 6 exact clones of base[0]
    for i in range(6):
        rows.append((100 + i, base[0]))
    # cluster B: 4 exact clones of base[1]
    for i in range(4):
        rows.append((200 + i, base[1]))
    # near-dup of base[0] (one word changed) — cross-class pair source
    rows.append((300, base[0].replace("again and again", "again and then")))
    # uniques
    rows.append((400, base[2]))
    rows.append((500, base[3]))
    # NULL text (empty shingle set class)
    rows.append((600, None))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_key(rows):
    return sorted((r["a_id"], r["b_id"], r["jaccard"]) for r in rows)


def test_dup_pairs_collapse_parity(spark):
    df = _clone_heavy_docs(spark)
    kw = dict(threshold=0.5, num_perm=64, bands=32, shingle_k=4)
    plain = minhash_dup_pairs(df, collapse=False, **kw).collect()
    coll = minhash_dup_pairs(df, collapse=True, **kw).collect()
    assert _pairs_key(plain) == _pairs_key(coll)
    # the clone clusters must actually appear as pairs (6C2 + 4C2 at
    # jaccard exactly 1.0), so the parity above is not vacuous
    ones = [r for r in coll if r["jaccard"] == 1.0]
    assert len(ones) >= 15 + 6


def test_dup_pairs_collapse_parity_tight_threshold(spark):
    # threshold 1.0: only the exact clusters survive either branch
    df = _clone_heavy_docs(spark)
    kw = dict(threshold=1.0, num_perm=64, bands=32, shingle_k=4)
    plain = minhash_dup_pairs(df, collapse=False, **kw).collect()
    coll = minhash_dup_pairs(df, collapse=True, **kw).collect()
    assert _pairs_key(plain) == _pairs_key(coll)
    assert all(r["jaccard"] == 1.0 for r in coll)
    assert len(coll) == 15 + 6


def test_anti_join_collapse_parity(spark):
    docs = _clone_heavy_docs(spark)
    new = docs.where("doc_id % 2 = 1")
    corpus = docs.where("doc_id % 2 = 0")
    sk = (
        minhash_sketch(corpus, "text", 64, 4, with_fp=True)
        .select(F.col("doc_id").alias("id"), "minhash", "hset", "hset_fp")
        .localCheckpoint(eager=True)
    )
    kw = dict(threshold=0.5, num_perm=64, bands=32, shingle_k=4)
    plain = minhash_anti_join_sketched(new, sk, collapse=False, **kw)
    coll = minhash_anti_join_sketched(new, sk, collapse=True, **kw)
    a = sorted(r["doc_id"] for r in plain.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in coll.select("doc_id").collect())
    assert a == b
    # clones of cluster A/B exist on both sides, so the gate must have
    # dropped the odd-id clones (non-vacuous parity)
    assert 101 not in a and 201 not in a


def test_exact_dup_count_probe(spark):
    df = _clone_heavy_docs(spark)
    sk = minhash_sketch(df, "text", 64, 4, with_fp=True).select(
        F.col("doc_id").alias("id"), "minhash", "hset", "hset_fp"
    )
    # 6+4 clones collapse to 2 classes -> 8 duplicate rows; everything
    # else (incl. the single NULL text) is its own class
    assert _exact_dup_count(sk) == 8
    assert _COLLAPSE_MIN_DUPS > 8  # tiny clone mass keeps the plain path


def test_dedup_passes_through_collapse(spark):
    from sclera_spark.llm.dedup import minhash_dedup

    df = _clone_heavy_docs(spark)
    kw = dict(threshold=0.5, num_perm=64, bands=32, shingle_k=4)
    plain = minhash_dedup(df, collapse=False, **kw)
    coll = minhash_dedup(df, collapse=True, **kw)
    assert sorted(r["doc_id"] for r in plain.collect()) == sorted(
        r["doc_id"] for r in coll.collect()
    )
