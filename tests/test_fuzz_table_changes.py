"""Seeded fuzz for the change data feed: random mutation sequences
(append / COW update / COW delete / overwrite / compact-style rewrite)
on a manifest table, then for EVERY retained version pair (a, b) the
feed-apply identity must hold as a multiset:

    snapshot(a) + inserts(a, b) - deletes(a, b) == snapshot(b)

which pins both directions of the exceptAll cancellation (carried-over
rows never leak into the feed; touched rows always do) across arbitrary
file layouts and commit kinds."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from sclera_spark.sources.manifest import ManifestTable


def _ms(df, cols=("k", "v")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("seed", [3, 17])
def test_feed_apply_identity_fuzz(spark, tmp_path, seed):
    rng = random.Random(seed)
    mt = ManifestTable.create(
        spark.range(120).selectExpr("id AS k", "id % 9 AS v"),
        str(tmp_path / "t"),
    )
    nxt = [10_000]

    def fresh(n):
        lo = nxt[0]
        nxt[0] += n
        return spark.range(lo, lo + n).selectExpr(
            "id AS k", "id % 5 AS v"
        ).coalesce(rng.randint(1, 2))

    for _ in range(7):
        op = rng.choice(["append", "update", "delete", "overwrite"])
        if op == "append":
            mt.append(fresh(rng.randint(3, 25)))
        elif op == "overwrite":
            mt.overwrite(fresh(rng.randint(10, 30)))
        else:
            files = mt.files()
            victim = files[rng.randrange(len(files))]
            old = spark.read.parquet(victim)
            mod = rng.choice([2, 3, 7])
            if op == "delete":
                mt.replace_files([victim], old.where(f"k % {mod} != 0"))
            else:
                mt.replace_files(
                    [victim],
                    old.withColumn(
                        "v",
                        F.when(
                            F.col("k") % mod == 0, F.col("v") + 1000
                        ).otherwise(F.col("v")),
                    ),
                )

    versions = mt.versions()
    snaps = {v: _ms(mt.read(spark, version=v)) for v in versions}
    # every adjacent pair, plus a few long spans
    pairs = [(a, a + 1) for a in versions[:-1]] + [
        (versions[0], versions[-1]),
        (versions[len(versions) // 2], versions[-1]),
    ]
    for a, b in pairs:
        ch = mt.changes(spark, a, b)
        ins = _ms(ch.where("_change_type = 'insert'"))
        dels = _ms(ch.where("_change_type = 'delete'"))
        rebuilt = list(snaps[a]) + ins
        for d in dels:
            rebuilt.remove(d)  # multiset subtract; raises if absent
        assert sorted(rebuilt) == snaps[b], (a, b)
        # attribution stays within the span
        vs = [
            r["_commit_version"]
            for r in ch.select("_commit_version").distinct().collect()
        ]
        assert all(a < v <= b for v in vs), (a, b, vs)
