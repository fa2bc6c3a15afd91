"""Incremental materialized aggregates over manifest tables.

The time-rollup cascade (operators/rollup.py) makes *computing* a
continuous aggregate cheap; this module makes *maintaining* one cheap.
A materialized bucketed aggregate records which source snapshot it was
built from — by manifest version AND file list (sources/manifest.py) —
and `refresh()` costs O(new data), not O(table):

- source grew by appended files only → read JUST those files, aggregate
  the delta at the bucket grain, and fold it into the existing
  materialization with the decomposable re-aggregation (count merges as
  sum; sum/min/max as themselves — the same algebra the rollup cascade
  validates);
- a file was REPLACED (copy-on-write UPDATE/DELETE/MERGE touched the
  source) → the delta is not expressible as new rows, so refresh falls
  back to a full recompute. Correctness first: a conservative full pass
  beats a silently-wrong subtraction (deletes are not invertible for
  min/max without per-bucket recount anyway).

At 100 TB this is the difference between an hourly dashboard costing an
hourly full scan and costing one pass over the hour's arrivals.

Crash safety: the materialization is itself a manifest table, and the
refresh state (source version + file list) rides in the SAME manifest
version's ``meta`` as the refreshed data — state and data commit in ONE
atomic pointer swap (``overwrite(df, meta=...)``), so there is no
version-keyed sidecar to desync. A crash anywhere before the swap leaves
the old MV version current with its old state — the half-applied delta
is invisible and the retry re-applies it exactly once. Unrelated commits
on the MV (OPTIMIZE/compact) inherit the meta unchanged (manifest meta
is inherited across commits), which is correct: compaction does not
change which source snapshot the rows reflect. A source commit that adds
NO files (empty append, watermark-advancing empty streaming batch) is
consumed as a pure metadata commit (``amend_meta``) — the recorded
source version advances without touching data. Injection-tested in
tests/test_incragg.py.

The maintainer owns the MV table (single writer); the SOURCE may take
concurrent commits freely — refresh reads one consistent source
snapshot (version + files resolved once) and records exactly what it
consumed.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sclera_spark.operators.rollup import _FIRST, _REAGG
from sclera_spark.sources.manifest import ManifestTable


class IncrementalAggregate:
    """A bucketed aggregate of a manifest table, refreshable in
    O(new files). ``aggs``: name -> (kind, col), kind in
    {count, sum, min, max} (col ignored for count); derive avg at read
    time as sum/count, exactly as in the rollup cascade."""

    _META_KEY = "incragg"

    def __init__(self, path: str, cas=None):
        """``cas``: a conditional-put store (FileCas / MemoryCas) makes
        the MV itself a CAS-committed table — refreshes publish through
        the lock-free multi-host protocol. The SOURCE's flavor needs no
        declaration: reads resolve its pointer via the shared-filesystem
        mirror either way (a momentarily stale mirror just means the
        refresh consumes a slightly older CONSISTENT snapshot; the next
        refresh catches up)."""
        from sclera_spark.sources.manifest import CasManifestTable

        self.path = path
        self.cas = cas
        self.mv = (
            CasManifestTable(path, cas) if cas is not None else ManifestTable(path)
        )

    # ---- construction ----

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        source: ManifestTable,
        path: str,
        ts_col: str,
        bucket: str,
        aggs: dict[str, tuple[str, str | None]],
        keys: Sequence[str] = (),
        cas=None,
    ) -> "IncrementalAggregate":
        for name, (kind, _col) in aggs.items():
            if kind not in _REAGG:
                raise ValueError(
                    f"{name}: {kind!r} is not decomposable "
                    "(supported: count, sum, min, max)"
                )
        ia = cls(path, cas=cas)
        src_version = source.version()
        src_files = sorted(os.path.basename(p) for p in source.files())
        df = ia._bucket_agg(source.read(spark), ts_col, bucket, aggs, keys)
        state = {
            "source_path": source.path,
            "source_version": src_version,
            "source_files": src_files,
            "ts_col": ts_col,
            "bucket": bucket,
            "aggs": {n: list(kc) for n, kc in aggs.items()},
            "keys": list(keys),
        }
        if cas is not None:
            from sclera_spark.sources.manifest import CasManifestTable

            CasManifestTable.create_cas(df, path, cas, meta={cls._META_KEY: state})
        else:
            ManifestTable.create(df, path, meta={cls._META_KEY: state})
        return ia

    # ---- reads ----

    def read(self, spark: SparkSession) -> DataFrame:
        return self.mv.read(spark)

    def state(self) -> dict:
        """Refresh state carried by the CURRENT manifest version's meta —
        atomically committed with the data it describes."""
        st = self.mv.meta().get(self._META_KEY)
        if st is None:
            raise ValueError(
                f"{self.path} carries no incremental-aggregate state "
                "(not created via IncrementalAggregate.create?)"
            )
        return st

    # ---- maintenance ----

    def refresh(self, spark: SparkSession) -> tuple[str, int]:
        """Bring the materialization up to the source's current snapshot.
        Returns ("noop", 0), ("incremental", n_new_files) or
        ("full", n_files)."""
        st = self.state()
        source = ManifestTable(st["source_path"])
        # resolve ONE consistent source snapshot
        src_version = source.version()
        if src_version == st["source_version"]:
            return ("noop", 0)
        cur_files = sorted(
            os.path.basename(p) for p in source.files(src_version)
        )
        old = set(st["source_files"])
        added = [f for f in cur_files if f not in old]
        removed = old - set(cur_files)
        ts_col, bucket = st["ts_col"], st["bucket"]
        aggs = {n: tuple(kc) for n, kc in st["aggs"].items()}
        keys = st["keys"]

        new_state = {**st, "source_version": src_version, "source_files": cur_files}
        if removed:
            # COW rewrote live files: deltas are not append-expressible
            df = self._bucket_agg(
                source.read(spark, src_version), ts_col, bucket, aggs, keys
            )
            mode = ("full", len(cur_files))
        elif added:
            paths = [os.path.join(source.data_dir, f) for f in added]
            # read the delta THROUGH the source table (column-mapped
            # sources store physical names; ts_col/keys are logical)
            delta = self._bucket_agg(
                source.read(spark, src_version, file_paths=paths),
                ts_col,
                bucket,
                aggs,
                keys,
            )
            merged = self.mv.read(spark).unionByName(delta)
            df = self._merge(merged, aggs, keys)
            mode = ("incremental", len(added))
        else:
            # source version bumped with no file change (empty append /
            # watermark-advancing empty streaming batch / meta-only
            # commit): nothing to read — advance the recorded state with
            # a pure metadata commit so refresh never stalls on it
            self.mv.amend_meta({self._META_KEY: new_state})
            return ("noop", 0)

        # state + data in ONE atomic pointer swap = the commit point
        self.mv.overwrite(df, meta={self._META_KEY: new_state})
        return mode

    # ---- internals ----

    def _bucket_agg(self, df, ts_col, bucket, aggs, keys):
        """First-pass aggregation of raw rows at the bucket grain (the
        merge of bucket-rows into bucket-rows is :meth:`_merge`)."""
        g = df.groupBy(
            F.window(F.col(ts_col), bucket).alias("__w"),
            *[F.col(k) for k in keys],
        )
        exprs = [
            F.count(F.lit(1)).alias(n)
            if kind == "count"
            else _FIRST[kind](col).alias(n)
            for n, (kind, col) in aggs.items()
        ]
        return g.agg(*exprs).select(
            F.col("__w.start").alias("bucket_start"),
            F.col("__w.end").alias("bucket_end"),
            *keys,
            *aggs.keys(),
        )

    def _merge(self, unioned, aggs, keys):
        """Fold delta bucket-rows into existing bucket-rows with the
        decomposable re-aggregation (count merges as sum)."""
        g = unioned.groupBy("bucket_start", "bucket_end", *keys)
        return g.agg(
            *[_REAGG[kind](n).alias(n) for n, (kind, _col) in aggs.items()]
        ).select("bucket_start", "bucket_end", *keys, *aggs.keys())

