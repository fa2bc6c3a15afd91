"""Seeded fuzz for the delta-encoded manifest log: random mutation
sequences (append / COW replace / overwrite / amend / restore / vacuum)
run against TWIN tables — one delta-encoded, one forced to write a full
snapshot every commit — and after every step the two must agree on
versions, resolved file counts, row contents, per-file stats multisets,
meta, metadata-only row counts, and history op stamps. Any divergence
is a log-encoding bug by construction (the snapshot twin is the r8
format the delta log must be semantically identical to)."""

from __future__ import annotations

import json
import random

import pytest

from sclera_spark.sources.manifest import ManifestTable, load_manifest


def _content(spark, t, version=None):
    return sorted(
        tuple(r) for r in t.read(spark, version=version).collect()
    )


def _stats_multiset(t, v):
    m = load_manifest(t.log_dir, v)
    return {
        key: sorted(
            json.dumps(m[key][f], sort_keys=True) for f in m[key]
        )
        for key in ("stats", "nulls", "rows")
    }


class _SnapshotOnly(ManifestTable):
    _snapshot_every = 0  # always write full manifests (the r8 format)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_delta_log_fuzz_twin_parity(spark, tmp_path, seed):
    rng = random.Random(seed)
    base = spark.range(200).selectExpr("id AS k", "id % 13 AS v")
    delta_t = ManifestTable.create(base, str(tmp_path / "d"))
    snap_t = _SnapshotOnly.create(base, str(tmp_path / "s"))
    next_key = [10_000]

    def fresh_rows(n):
        lo = next_key[0]
        next_key[0] += n
        return spark.range(lo, lo + n).selectExpr(
            "id AS k", "id % 7 AS v"
        )

    def step(op):
        for t in (delta_t, snap_t):
            if op == "append":
                t.append(fresh_batch)
            elif op == "replace":
                files = t.files()
                idx = rng_idx % len(files)
                victim = files[idx]
                t.replace_files(
                    [victim],
                    spark.read.parquet(victim).where(f"k % {mod} != 0"),
                )
            elif op == "overwrite":
                t.overwrite(fresh_batch)
            elif op == "amend":
                t.amend_meta({"note": f"n{rng_note}"})
            elif op == "restore":
                vs = t.versions()
                t.restore(vs[max(0, len(vs) - 1 - back)])
            elif op == "vacuum":
                t.vacuum(keep_versions=keep)

    ops = ["append", "append", "replace", "amend", "restore",
           "append", "replace", "vacuum", "overwrite", "append",
           "replace", "restore", "vacuum", "append"]
    rng.shuffle(ops)
    for op in ops:
        # draw shared randomness ONCE so both twins do the same thing
        fresh_batch = fresh_rows(rng.randint(5, 40)).coalesce(
            rng.randint(1, 3)
        )
        rng_idx = rng.randint(0, 10**6)
        mod = rng.choice([2, 3, 5])
        rng_note = rng.randint(0, 99)
        back = rng.randint(1, 2)
        keep = rng.randint(1, 3)
        step(op)

        assert delta_t.versions() == snap_t.versions(), op
        for v in delta_t.versions():
            dm = load_manifest(delta_t.log_dir, v)
            sm = load_manifest(snap_t.log_dir, v)
            assert len(dm["files"]) == len(sm["files"]), (op, v)
            assert dm["meta"] == sm["meta"], (op, v)
            assert _stats_multiset(delta_t, v) == _stats_multiset(
                snap_t, v
            ), (op, v)
        assert _content(spark, delta_t) == _content(spark, snap_t), op
        assert delta_t.row_count() == snap_t.row_count(), op
        assert [h["op"] for h in delta_t.history()] == [
            h["op"] for h in snap_t.history()
        ], op
