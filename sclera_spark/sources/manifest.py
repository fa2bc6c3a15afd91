"""Manifest-committed managed tables: atomic DML on plain parquet.

The parquet copy-on-write path (plans/ddl.py:_commit_cow) is ordered so a
crash never loses rows — but it can leave DUPLICATES (old + new part file
both present) and readers can observe the half-committed directory. This
module removes both flaws with the core idea of Delta/Iceberg, minus
everything else: data files are immutable, and the set of live files is
named by a versioned manifest whose publication is ONE atomic pointer
swap (`os.replace`). Readers resolve the pointer, then read exactly the
listed files — no directory listing, ever — so every reader sees a
complete snapshot, before or after, never during.

Layout under the table root:

    data/part-*.parquet        immutable data files (write-once)
    _sclera_log/v<N>.json      manifest: {"version": N, "files": [...]}
    _sclera_log/LATEST         pointer file containing N (atomic replace)

Commit protocol (crash-safe at every step):
  1. stage new part files into data/ (invisible: not in any manifest)
  2. write v<N+1>.json fully, fsync
  3. os.replace() the LATEST pointer  <- the commit point; nothing
     happens after it, so there is no post-commit crash window at all

Files dropped by a commit leave the manifest LOGICALLY but stay on disk,
so every retained version remains readable (time travel); ``vacuum()``
does the physical deletion on the operator's retention schedule.

Concurrent writers on one host are serialized by an exclusive flock on
``_sclera_log/LOCK`` held for the whole read-modify-publish of a commit
(each mutation re-reads the live manifest INSIDE the lock, so two
concurrent appends both land instead of lost-updating each other).
Readers never take the lock. Cross-host writers on a shared object
store would instead use the store's conditional-put as a CAS on the
pointer — the protocol is deliberately expressible in those terms.
Reads go through
``spark.read.parquet(*files)``, so Spark's vectorized reader, predicate
pushdown and column pruning all apply unchanged; time travel is
``read(spark, version=N)`` for any retained manifest.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_sclera_log"
_DATA = "data"

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


class ConcurrentWriterError(RuntimeError):
    """A manifest version claim reappeared immediately after healing.

    Same-host writers are serialized by the flock, so inside the lock a
    pre-existing claim is the orphan of a crashed commit (healed with a
    warning). A claim that comes BACK right after healing means a live
    writer outside the flock's reach — another host sharing this
    filesystem — is racing us, which the single-host manifest contract
    does not support (flock is advisory and host-local; an object-store
    backend would use conditional-put as the pointer CAS). Failing
    loudly is the explicit form of that assumption."""


class ManifestTable:
    def __init__(self, path: str):
        if _SCHEME_RE.match(path):
            raise ValueError(
                f"manifest tables require a local POSIX path, got {path!r}: "
                "the commit point is an atomic os.replace + flock, which "
                "does not exist on object stores. An s3/abfs/gs backend "
                "needs the store's conditional-put as the pointer CAS — "
                "use a plain parquet location (copy-on-write DML) for "
                "scheme'd URIs instead."
            )
        self.path = path
        self.log_dir = os.path.join(path, _LOG)
        self.data_dir = os.path.join(path, _DATA)

    # ---- creation ----

    @classmethod
    def create(
        cls, df: DataFrame, path: str, meta: dict | None = None
    ) -> "ManifestTable":
        """Materialize ``df`` as a new manifest table (version 1)."""
        t = cls(path)
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.log_dir, exist_ok=True)
        scratch, added = t._stage(df)
        t._adopt(scratch, added)
        t._publish(1, added, meta)
        return t

    @classmethod
    def convert(cls, path: str) -> "ManifestTable":
        """Adopt an existing plain-parquet directory in place: move its
        part files under data/ and publish them as version 1."""
        t = cls(path)
        if t.exists(path):
            return t
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.log_dir, exist_ok=True)
        moved = []
        for f in sorted(os.listdir(path)):
            if f.startswith("part-") and not f.endswith(".crc"):
                os.rename(os.path.join(path, f), os.path.join(t.data_dir, f))
                moved.append(f)
        t._publish(1, moved)
        return t

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, _LOG, "LATEST"))

    # ---- snapshot resolution ----

    def version(self) -> int:
        with open(os.path.join(self.log_dir, "LATEST")) as fh:
            return int(fh.read().strip())

    def versions(self) -> list[int]:
        """COMMITTED versions only (<= LATEST): a crashed commit can
        leave an orphan claim file above the pointer, which must never
        count as a version — vacuum keying its keep-set off it would
        delete the live version's files."""
        latest = self.version()
        return sorted(
            v
            for f in os.listdir(self.log_dir)
            if f.startswith("v") and f.endswith(".json")
            and (v := int(f[1:-5])) <= latest
        )

    def recover(self) -> list[int]:
        """Clear orphan manifest claims above LATEST (a commit that
        crashed between claiming its version file and the pointer swap).
        Safe inside the writer lock: no same-host commit is in flight,
        and the staged data files an orphan references stay invisible
        until vacuum. Returns the cleared version numbers."""
        with self._writer_lock():
            latest = self.version()
            cleared = []
            for f in os.listdir(self.log_dir):
                if f.startswith("v") and f.endswith(".json"):
                    v = int(f[1:-5])
                    if v > latest:
                        os.remove(os.path.join(self.log_dir, f))
                        cleared.append(v)
            return sorted(cleared)

    def meta(self, version: int | None = None) -> dict:
        """Application metadata carried by a manifest version (e.g. the
        streaming sink's last-committed batch id). INHERITED across
        commits unless explicitly overridden, so compaction or DML never
        silently drops it."""
        v = self.version() if version is None else version
        with open(os.path.join(self.log_dir, f"v{v}.json")) as fh:
            return json.load(fh).get("meta", {})

    def files(self, version: int | None = None) -> list[str]:
        v = self.version() if version is None else version
        with open(os.path.join(self.log_dir, f"v{v}.json")) as fh:
            manifest = json.load(fh)
        return [os.path.join(self.data_dir, f) for f in manifest["files"]]

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        files = self.files(version)
        if not files:
            # schema-only snapshot: keep the latest non-empty schema
            for v in reversed(self.versions()):
                prior = self.files(v)
                if prior:
                    return spark.read.parquet(*prior).limit(0)
            raise ValueError(f"manifest table {self.path} has no data files")
        return spark.read.parquet(*files)

    # ---- mutation (each is one atomic commit) ----

    def _writer_lock(self):
        """Exclusive advisory lock serializing same-host writers for the
        read-modify-publish span of one commit. Live state is re-read
        inside the lock, so concurrent mutations compose (no lost
        updates) instead of clobbering each other's manifests."""
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def lock():
            fd = os.open(
                os.path.join(self.log_dir, "LOCK"), os.O_CREAT | os.O_RDWR
            )
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)

        return lock()

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> None:
        scratch, added = self._stage(df)
        with self._writer_lock():
            self._adopt(scratch, added)
            self._publish(self.version() + 1, added, self._next_meta(meta))

    def amend_meta(self, meta: dict) -> None:
        """Commit a new version with the SAME file list and merged meta —
        a pure metadata commit (e.g. an incremental-aggregate refresh that
        consumed a source version which added no files). Same atomic
        pointer-swap protocol as data commits."""
        with self._writer_lock():
            self._publish(
                self.version() + 1, self._file_names(), self._next_meta(meta)
            )

    def append(self, df: DataFrame, meta: dict | None = None) -> None:
        scratch, added = self._stage(df)
        with self._writer_lock():
            self._adopt(scratch, added)
            self._publish(
                self.version() + 1,
                self._file_names() + added,
                self._next_meta(meta),
            )

    def replace_files(self, remove_paths: list[str], df: DataFrame) -> None:
        """The COW commit: swap the given live files for ``df``'s output
        in one atomic step. ``remove_paths`` are full paths as returned by
        :meth:`files` / the ``_metadata.file_path`` probe. Removal is
        LOGICAL — the files leave the manifest but stay on disk for time
        travel until :meth:`vacuum` (the Delta/Iceberg retention model)."""
        removed = {os.path.basename(p) for p in remove_paths}
        scratch, added = self._stage(df)
        with self._writer_lock():
            live = self._file_names()
            unknown = removed - set(live)
            if unknown:
                shutil.rmtree(scratch, ignore_errors=True)
                raise ValueError(
                    f"not live in current manifest: {sorted(unknown)} "
                    f"(a concurrent commit replaced them — retry the DML)"
                )
            survivors = [f for f in live if f not in removed]
            self._adopt(scratch, added)
            self._publish(
                self.version() + 1, survivors + added, self._next_meta(None)
            )

    def compact(
        self,
        spark: SparkSession,
        target_bytes: int = 128 * 1024 * 1024,
        min_files: int = 2,
        cluster_by: list[str] | None = None,
    ) -> list[str]:
        """Small-file compaction (the OPTIMIZE of Delta/Iceberg) as ONE
        atomic commit: live files smaller than ``target_bytes`` are
        rewritten into ~target-sized files and swapped in via
        :meth:`replace_files`. Pure metadata operation for readers — the
        row set is identical before and after; the pre-compaction
        version stays readable until vacuum.

        At 100 TB this is the maintenance operation that keeps a
        frequently-updated table scannable: per-statement COW commits
        shed small part files, and scan parallelism degrades into
        per-file task overhead + footer chatter unless something folds
        them back to ``maxPartitionBytes``-sized units. The (slow)
        rewrite runs OUTSIDE the writer lock; a DML that lands mid-
        rewrite invalidates the swap and ``replace_files`` raises its
        retry error rather than resurrecting the pre-DML rows.

        ``cluster_by`` additionally range-clusters the rewritten rows on
        the given columns (repartitionByRange + sortWithinPartitions), so
        the output files carry DISJOINT min/max ranges on the leading
        column — that is what lets a later filtered scan skip whole files
        on parquet footer statistics instead of reading them. Clustering
        rewrites ALL live files (a cluster order only helps if it is
        global), not just the sub-target ones.

        Returns the replaced file names ([] = nothing worth compacting).
        """
        if cluster_by:
            small = list(self.files())
            if not small:
                return []
        else:
            small = [
                p
                for p in self.files()
                if os.path.getsize(p) < target_bytes
            ]
            if len(small) < min_files:
                return []
        total = sum(os.path.getsize(p) for p in small)
        n_out = int(max(1, -(-total // target_bytes)))  # ceil
        df = spark.read.parquet(*small)
        if cluster_by:
            from pyspark.sql import functions as F

            cols = [F.col(c) for c in cluster_by]
            df = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
        else:
            df = df.coalesce(n_out)
        self.replace_files(small, df)
        return [os.path.basename(p) for p in small]

    def export_symlink_manifest(self, out_dir: str | None = None) -> str:
        """Ecosystem interop: write the CURRENT snapshot's file list in
        the Hive ``symlink_format_manifest`` layout (one text file whose
        lines are absolute data-file URIs — the same format Delta Lake's
        ``GENERATE symlink_format_manifest`` emits for Presto / Trino /
        Athena / Hive). An external engine defines a table over
        ``<table>/_symlink_format_manifest`` with
        SymlinkTextInputFormat and reads exactly the committed snapshot —
        no directory listing, so staged/orphaned part files stay
        invisible, same as this engine's own readers. Re-export after
        commits (the file is rewritten atomically). Returns the manifest
        file path."""
        out_dir = out_dir or os.path.join(self.path, "_symlink_format_manifest")
        os.makedirs(out_dir, exist_ok=True)
        lines = "".join(
            "file://" + os.path.abspath(p) + "\n" for p in self.files()
        )
        target = os.path.join(out_dir, "manifest")
        tmp = target + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as fh:
            fh.write(lines)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, target)
        return target

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Delete data files unreferenced by the ``keep_versions`` newest
        manifests (and drop older manifests). Returns deleted file names.
        Takes the writer lock: a concurrent commit must not publish a
        manifest referencing files vacuum is deciding to delete."""
        with self._writer_lock():
            return self._vacuum_locked(keep_versions)

    def _vacuum_locked(self, keep_versions: int) -> list[str]:
        # clear orphan claims first (crashed commits above LATEST), so
        # their staged-but-never-committed data files become deletable
        latest = self.version()
        for f in os.listdir(self.log_dir):
            if f.startswith("v") and f.endswith(".json") and int(f[1:-5]) > latest:
                os.remove(os.path.join(self.log_dir, f))
        vs = self.versions()
        keep = vs[-keep_versions:]
        referenced: set[str] = set()
        for v in keep:
            referenced |= {os.path.basename(p) for p in self.files(v)}
        deleted = []
        for f in os.listdir(self.data_dir):
            if f not in referenced:
                os.remove(os.path.join(self.data_dir, f))
                deleted.append(f)
        for v in vs[:-keep_versions]:
            os.remove(os.path.join(self.log_dir, f"v{v}.json"))
        return deleted

    # ---- internals ----

    def _file_names(self) -> list[str]:
        return [os.path.basename(p) for p in self.files()]

    def _stage(self, df: DataFrame) -> tuple[str, list[str]]:
        """Write ``df`` to a scratch dir under collision-free final names.
        The (slow) Spark write happens OUTSIDE the writer lock; files
        enter data/ only via :meth:`_adopt` inside the lock — so nothing
        unpublished ever sits in data/ where vacuum could eat it."""
        scratch = tempfile.mkdtemp(prefix="sclera_manifest_")
        df.write.mode("overwrite").parquet(scratch)
        tag = uuid.uuid4().hex[:8]
        staged = []
        for i, f in enumerate(sorted(os.listdir(scratch))):
            if f.startswith("part-") and not f.endswith(".crc"):
                name = f"part-{tag}-{i:05d}.parquet"
                os.rename(os.path.join(scratch, f), os.path.join(scratch, name))
                staged.append(name)
        return scratch, staged

    def _adopt(self, scratch: str, names: list[str]) -> None:
        """Move staged part files into data/ (cheap renames, same FS via
        the parquet temp dir? no — scratch may be on another mount, so
        fall back to copy+rename when rename crosses devices)."""
        for name in names:
            src = os.path.join(scratch, name)
            dst = os.path.join(self.data_dir, name)
            try:
                os.rename(src, dst)
            except OSError:
                tmp = dst + ".tmp"
                shutil.copyfile(src, tmp)
                os.rename(tmp, dst)
        shutil.rmtree(scratch, ignore_errors=True)

    def _next_meta(self, override: dict | None) -> dict:
        """Merge metadata for the next commit: inherit the current
        version's meta, with explicit keys overriding (called inside the
        writer lock by every mutator)."""
        try:
            base = self.meta()
        except FileNotFoundError:
            base = {}
        return {**base, **(override or {})}

    def _publish(
        self, version: int, files: list[str], meta: dict | None = None
    ) -> None:
        """Steps 2+3 of the commit protocol: durable manifest, then the
        atomic pointer swap that IS the commit.

        The manifest file is CLAIMED with O_EXCL: same-host writers are
        serialized by the flock, so a pre-existing v<N>.json above LATEST
        inside the lock can only be the orphan of a CRASHED commit under
        the single-host contract — it is healed with a loud warning and
        the commit proceeds (crash-retry must not require manual
        recovery). If the claim REAPPEARS immediately after healing, a
        live writer outside our flock's reach (another host — cross-host
        advisory locks are not part of the contract) is actively racing:
        raise ConcurrentWriterError rather than trade silent lost
        updates with it."""
        import warnings

        mpath = os.path.join(self.log_dir, f"v{version}.json")
        try:
            fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            warnings.warn(
                f"manifest version {version} at {self.path} was already "
                "claimed: healing the orphan of a crashed commit (if "
                "writers on ANOTHER host share this table, that is "
                "outside the single-host manifest contract — see the "
                "module docstring's conditional-put note)",
                stacklevel=2,
            )
            try:
                os.remove(mpath)
            except FileNotFoundError:
                pass
            try:
                fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                raise ConcurrentWriterError(
                    f"manifest version {version} at {self.path} was "
                    "re-claimed immediately after healing: a live writer "
                    "on another host is racing this table (unsupported — "
                    "flock is host-local; use a store with conditional-"
                    "put for multi-host writers)"
                ) from None
        with os.fdopen(fd, "w") as fh:
            json.dump(
                {"version": version, "files": files, "meta": meta or {}}, fh
            )
            fh.flush()
            os.fsync(fh.fileno())
        tmp = os.path.join(self.log_dir, f".LATEST.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(self.log_dir, "LATEST"))

