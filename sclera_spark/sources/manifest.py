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
Readers never take the lock. Cross-host writers use
:class:`CasManifestTable` (r6): the commit point becomes a
conditional-put CAS on an external pointer store and version claims
are put-if-absent — lock-free optimistic concurrency, the
Delta-on-S3/DynamoDB log-store shape (race-tested in
tests/test_manifest_cas.py with a shared in-process CAS standing in
for the store).
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

# ---- delta-encoded log resolution (r9) ----------------------------------
#
# A version file is either a SNAPSHOT (full file list + per-file stats —
# the only format through r8, still written every `_snapshot_every`
# commits and whenever a delta would not be smaller) or a DELTA:
#
#   {"version": N, "base": N-1, "depth": d,
#    "remove": [name, ...],                      # files leaving the table
#    "add": [{"name": n, "stats": {...},         # files entering, in order,
#             "nulls": {...}, "rows": R}, ...],  # with their footer stats
#    "meta": {...}}                              # full merged commit meta
#
# Every mutation the table performs (append / replace_files / overwrite /
# amend) rewrites the file list as `[survivors in base order] + added`,
# so a (remove-set, ordered-add-list) pair reconstructs it exactly; the
# writer VERIFIES that equality and falls back to a snapshot otherwise.
# This is the Delta-Lake log model (delta commits + periodic
# checkpoints): commit cost becomes O(changed files) instead of
# O(live files), which is what keeps a million-file 100 TB table's
# append from serializing a 100 MB manifest per commit. Chain depth is
# capped (`depth <= _snapshot_every`), so resolution reads at most
# K+1 small JSON files — and resolved manifests are cached below. The
# cache key includes the version file's (mtime_ns, size), so any
# rewrite — a dropped-and-reclaimed version above the pointer, vacuum's
# snapshot materialization, an externally-mutated log — misses
# naturally; a hit costs one os.stat instead of a full JSON parse.

_MANIFEST_CACHE: dict[tuple, dict] = {}
_MANIFEST_CACHE_CAP = 256

_autocompact_warned: set[str] = set()
_mirror_warned: set[str] = set()


def warn_mirror_failure(path: str, exc: Exception) -> None:
    """Warn ONCE per table when the opt-in Delta mirror refresh fails:
    the mutation itself committed (mirroring never gates it), but a
    silently stale mirror would feed external readers old data. The
    export is idempotent — the next mutation retries it."""
    import warnings

    if path in _mirror_warned:
        return
    _mirror_warned.add(path)
    warnings.warn(
        f"Delta mirror refresh on {path} failed "
        f"({type(exc).__name__}: {exc}); the table commit itself "
        "succeeded but the exported _delta_log is STALE until the "
        "next successful mutation. This warning fires once per table."
    )


def warn_autocompact_failure(path: str, exc: Exception) -> None:
    """Warn ONCE per table path when opt-in auto-compaction fails.
    Callers deliberately never let a maintenance failure gate the
    ingest/DML commit itself — but a fully silent swallow turns a
    persistent misconfiguration into an unbounded small-file leak
    nobody notices. The durable record lives in the table's
    compact_state sidecar, surfaced by DESCRIBE DETAIL."""
    import warnings

    if path in _autocompact_warned:
        return
    _autocompact_warned.add(path)
    warnings.warn(
        f"auto-compaction on {path} failed "
        f"({type(exc).__name__}: {exc}); the ingest/DML commit itself "
        "succeeded. This warning fires once per table — DESCRIBE "
        "DETAIL's last_compact_error carries the latest state."
    )


def _fsync_dir(path: str) -> None:
    """fsync a directory entry table (persists renames/creates within).
    Best-effort: some filesystems refuse O_RDONLY dir fsync — the
    fallback there is the same as everywhere else (data loss only on
    power-cut, caught by recovery's vanished-file refusal)."""
    try:
        dfd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass


def _fsync_tree(root: str) -> None:
    """fsync every regular file under ``root`` plus each directory:
    makes a just-renamed/copied staging tree as durable as an fsync'd
    journal that points at it (rename moves the entry, not the page
    cache)."""
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            try:
                fd = os.open(os.path.join(dirpath, name), os.O_RDONLY)
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
            except OSError:
                pass
        _fsync_dir(dirpath)


def _abort_cas_group(claimed, adopted) -> None:
    """Destructive pre-journal abort of a CAS group commit: drop the
    transaction's version claims and remove its adopted-but-unreferenced
    data files. ONLY safe while the journal object is confirmed absent
    (nothing references the claims)."""
    for mt, v1 in claimed:
        try:
            mt._drop_claim(v1)
        except OSError:
            pass
    for mt, names in adopted:
        for n in names:
            try:
                os.remove(os.path.join(mt.data_dir, n))
            except OSError:
                pass


def _purge_manifest_cache(log_dir: str) -> None:
    """Drop cached manifests for one table (hygiene after vacuum; the
    mtime+size key already protects correctness)."""
    key_dir = os.path.realpath(log_dir)
    for k in [k for k in _MANIFEST_CACHE if k[0] == key_dir]:
        _MANIFEST_CACHE.pop(k, None)


def load_manifest(log_dir: str, version: int) -> dict:
    """Resolve version ``version`` of a manifest log to its full form:
    ``{"files": [...], "stats": {...}, "nulls": {...}, "rows": {...},
    "meta": {...}, "_depth": d}``. Walks the delta chain down to the
    nearest snapshot and replays it. Raises FileNotFoundError when
    the version — or any base under it — has been vacuumed."""
    mpath = os.path.join(log_dir, f"v{version}.json")
    st = os.stat(mpath)  # FileNotFoundError = version not retained
    key = (os.path.realpath(log_dir), version, st.st_mtime_ns, st.st_size)
    hit = _MANIFEST_CACHE.get(key)
    if hit is not None:
        return hit
    with open(mpath) as fh:
        doc = json.load(fh)
    if "files" in doc:  # snapshot (or pre-r9 full manifest)
        res = {
            "files": list(doc["files"]),
            "stats": doc.get("stats", {}),
            "nulls": doc.get("nulls", {}),
            "rows": doc.get("rows", {}),
            "meta": doc.get("meta", {}),
            "_depth": 0,
        }
    else:
        base_v = doc["base"]
        if not isinstance(base_v, int) or not 0 < base_v < version:
            # our writer always chains to version-1; anything else is a
            # corrupt/forged log — fail loudly instead of recursing
            # into a cycle
            raise ValueError(
                f"corrupt manifest log: v{version} claims base "
                f"{base_v!r} (a delta's base must be an earlier version)"
            )
        base = load_manifest(log_dir, base_v)
        rm = set(doc.get("remove", []))
        add = doc.get("add", [])
        files = [f for f in base["files"] if f not in rm]
        stats = {k: v for k, v in base["stats"].items() if k not in rm}
        nulls = {k: v for k, v in base["nulls"].items() if k not in rm}
        rows = {k: v for k, v in base["rows"].items() if k not in rm}
        for e in add:
            name = e["name"]
            files.append(name)
            if "stats" in e:
                stats[name] = e["stats"]
            if "nulls" in e:
                nulls[name] = e["nulls"]
            if "rows" in e:
                rows[name] = e["rows"]
        res = {
            "files": files,
            "stats": stats,
            "nulls": nulls,
            "rows": rows,
            "meta": doc.get("meta", {}),
            "_depth": doc.get("depth", base["_depth"] + 1),
        }
    if len(_MANIFEST_CACHE) >= _MANIFEST_CACHE_CAP:
        # drop the oldest insertions (dict preserves order)
        for k in list(_MANIFEST_CACHE)[: _MANIFEST_CACHE_CAP // 4]:
            _MANIFEST_CACHE.pop(k, None)
    _MANIFEST_CACHE[key] = res
    return res


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


class TxnJournaledError(RuntimeError):
    """A multi-table transaction passed its commit point (the intent
    journal is durable) but a participant failed to publish in-process.
    The transaction IS committed: recovery on the next engine open
    (:meth:`ManifestTable.recover_txn_journals`) completes the
    remaining tables from the journal + staged files — callers must NOT
    discard the staged scratch dirs or report the transaction failed
    (a retrying client would duplicate rows)."""


class ManifestTable:
    def __init__(self, path: str):
        if _SCHEME_RE.match(path):
            raise ValueError(
                f"manifest tables require a local POSIX path, got {path!r}: "
                "the commit point is an atomic os.replace + flock, which "
                "does not exist on object stores. An s3/abfs/gs backend "
                "needs the store's conditional-put as the pointer CAS — "
                "use CasManifestTable with a conditional-put backend, or "
                "a plain parquet location (copy-on-write DML), for "
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
        t._publish(1, added, {**(meta or {}), "_op": "create"})
        return t

    @classmethod
    def import_symlink(cls, manifest: str, path: str) -> "ManifestTable":
        """Migration INTO the engine without copying data: register a
        Hive ``symlink_format_manifest`` snapshot (the exact layout
        :meth:`export_symlink_manifest` and Delta Lake's ``GENERATE``
        emit for Presto/Trino/Athena) as version 1 of a NEW manifest
        table at ``path``. ``manifest`` is the manifest text file, or a
        directory containing one (``manifest`` /
        ``_symlink_format_manifest/manifest``).

        Each referenced parquet file is HARD-LINKED into data/ (free on
        the same filesystem; falls back to symlink, then to a real copy
        across devices), so the import costs O(files) metadata, not
        O(bytes). Commit-time footer stats are recorded as for any
        commit, so pruning/metadata-only answers work immediately.
        Subsequent DML copy-on-writes only the files it touches, and
        removing a link never touches the foreign original — the source
        table remains exactly as exported. Only ``file://``/plain paths
        are accepted; an object-store URI in the manifest is a loud
        error, not a silent empty table."""
        mfile = manifest
        if os.path.isdir(mfile):
            for cand in (
                os.path.join(mfile, "manifest"),
                os.path.join(mfile, "_symlink_format_manifest", "manifest"),
            ):
                if os.path.isfile(cand):
                    mfile = cand
                    break
        if not os.path.isfile(mfile):
            raise FileNotFoundError(
                f"no symlink manifest found at {manifest!r}"
            )
        srcs: list[str] = []
        with open(mfile) as fh:
            for line in fh:
                uri = line.strip()
                if not uri:
                    continue
                if uri.startswith("file:"):
                    p = uri[len("file:") :]
                    while p.startswith("//"):
                        p = p[1:]
                elif "://" in uri:
                    raise ValueError(
                        f"symlink manifest references {uri!r}: only "
                        "file:// URIs can be imported here (fetch "
                        "object-store data with its own client first)"
                    )
                else:
                    p = uri
                if not os.path.isfile(p):
                    raise FileNotFoundError(
                        f"symlink manifest references missing file {p!r}"
                    )
                srcs.append(p)
        if not srcs:
            raise ValueError(f"symlink manifest {mfile!r} lists no files")
        return cls._adopt_external(
            path,
            srcs,
            {"imported_from": os.path.abspath(mfile), "_op": "import"},
        )

    @classmethod
    def _adopt_external(
        cls,
        path: str,
        srcs: list[str],
        meta: dict,
        pv_by_src: dict[str, dict] | None = None,
    ) -> "ManifestTable":
        """Shared import tail: hard-link (fall back symlink, then copy)
        the source parquet files into data/ and publish them as version
        1 — O(files) metadata, commit-time footer stats recorded as for
        any commit. ``pv_by_src`` (partitioned Delta import) maps each
        source path to its partition values; they are re-keyed by the
        final data-file names into ``meta["file_partition_values"]``,
        the lookup :meth:`read` and :meth:`files_pruned` consult."""
        t = cls(path)
        if t.exists(path):
            raise FileExistsError(f"{path} is already a manifest table")
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.log_dir, exist_ok=True)
        names: list[str] = []
        seen: set[str] = set()
        pv_by_name: dict[str, dict] = {}
        for i, src in enumerate(srcs):
            base = os.path.basename(src)
            name = base if base not in seen else f"import-{i:05d}-{base}"
            seen.add(name)
            dst = os.path.join(t.data_dir, name)
            try:
                os.link(src, dst)
            except OSError:
                try:
                    os.symlink(os.path.abspath(src), dst)
                except OSError:
                    tmp = dst + ".tmp"
                    shutil.copyfile(src, tmp)
                    os.rename(tmp, dst)
            names.append(name)
            if pv_by_src and src in pv_by_src:
                pv_by_name[name] = pv_by_src[src]
        if pv_by_name:
            meta = {**meta, "file_partition_values": pv_by_name}
        t._publish(1, names, meta)
        return t

    @classmethod
    def import_delta(
        cls, table_dir: str, path: str, materialize_dvs: bool = False
    ) -> "ManifestTable":
        """Migration from an external DELTA LAKE table without copying
        data: replay the public ``_delta_log`` commit protocol (JSON
        commits of ``add``/``remove``/``metaData`` actions, optionally
        on top of a checkpoint — single- or multi-part — named by
        ``_last_checkpoint``) to the CURRENT live-file set, hard-link
        those parquet files in, and publish them as version 1 of a new
        manifest table. Pure public-format parsing — no delta-spark
        dependency. Checkpoint parts are streamed per Arrow batch
        (``ParquetFile.iter_batches``), so driver memory stays bounded
        on a million-action checkpoint.

        PARTITIONED tables import zero-copy: each add action's
        ``partitionValues`` (they are IN the public log) are recorded
        per final data file in the manifest meta, the partition columns
        join the logical ``table_schema``, reads materialize them via a
        broadcast file-name lookup (:meth:`read`), and
        :meth:`files_pruned` treats each value as a per-file
        ``[v, v]`` stat — so partition-key predicates prune files
        immediately, exactly like native partition pruning.

        DELETION VECTORS (on by default in current Delta writers) are
        refused unless ``materialize_dvs`` — the opt-in decodes each
        public DV descriptor (inline or on-disk roaring bitmap;
        sources/deletion_vectors.py) and rewrites ONLY the DV-carrying
        files with the masked rows purged (streamed per batch); clean
        files are still hard-linked, never copied.

        COLUMN MAPPING (r11): ``delta.columnMapping.mode=name`` tables
        import natively — the schemaString's per-field physicalName/id
        metadata translate directly to this engine's column-mapping
        entries (r10 schema evolution), and leftover physical columns
        (Delta's DROP COLUMN leaves the bytes) become tombstone
        reservations so a later ADD COLUMN can never surface them.

        Mapping × partitioning composes (late r12): the log keys
        partitionColumns/partitionValues by PHYSICAL name, which are
        translated to logical here so the virtual fill (which runs
        above the physical->logical projection) resolves.

        Remaining loud refusal instead of silent data loss:
        object-store paths (no credentials here). ``mode=id`` imports
        with a per-footer field-id/physicalName agreement check."""
        import urllib.parse

        log_dir = os.path.join(table_dir, "_delta_log")
        if not os.path.isdir(log_dir):
            raise FileNotFoundError(
                f"{table_dir!r} has no _delta_log directory: not a "
                "Delta table"
            )
        # relative path -> {"src": abs, "dv": descriptor|None,
        #                   "pv": partitionValues|None}
        live: dict[str, dict] = {}
        part_cols: list[str] | None = None
        mapping_mode: str | None = None
        schema_json: dict | None = None

        def apply_add(rel: str, dv, pv=None) -> None:
            if dv is not None and not isinstance(dv, dict):
                raise ValueError(
                    f"Delta import: unparseable deletionVector {dv!r}"
                )
            if "://" in rel:
                raise ValueError(
                    f"Delta import: add path {rel!r} is an absolute "
                    "object-store URI; only files under the table "
                    "directory can be imported here"
                )
            p = urllib.parse.unquote(rel)
            if os.path.isabs(p):
                raise ValueError(
                    f"Delta import: add path {rel!r} is an absolute "
                    "filesystem path (SHALLOW CLONE / CONVERT can emit "
                    "these); only files under the table directory can "
                    "be imported here"
                )
            resolved = os.path.realpath(os.path.join(table_dir, p))
            root = os.path.realpath(table_dir)
            if os.path.commonpath([resolved, root]) != root:
                raise ValueError(
                    f"Delta import: add path {rel!r} escapes the table "
                    "directory; refusing to link a file outside it"
                )
            if isinstance(pv, list):
                # Arrow MapArray.to_pylist yields (key, value) pairs
                pv = dict(pv)
            live[rel] = {
                "src": os.path.join(table_dir, p),
                "dv": dv or None,
                "pv": pv or None,
            }

        def apply_meta(md: dict) -> None:
            nonlocal part_cols, mapping_mode, schema_json
            part_cols = md.get("partitionColumns") or []
            conf = md.get("configuration") or {}
            if isinstance(conf, list):
                # Arrow MapArray.to_pylist yields (key, value) pairs
                # (checkpoint metaData columns are map-typed)
                conf = dict(conf)
            mapping_mode = conf.get("delta.columnMapping.mode")
            ss = md.get("schemaString")
            if ss:
                try:
                    schema_json = json.loads(ss)
                except ValueError:
                    schema_json = None

        base_version = -1
        ckpt_file = os.path.join(log_dir, "_last_checkpoint")
        if os.path.isfile(ckpt_file):
            import pyarrow.parquet as pq

            with open(ckpt_file) as fh:
                ck = json.load(fh)
            base_version = int(ck["version"])
            nparts = int(ck.get("parts") or 0)
            if nparts:
                cpaths = [
                    os.path.join(
                        log_dir,
                        f"{base_version:020d}.checkpoint."
                        f"{i:010d}.{nparts:010d}.parquet",
                    )
                    for i in range(1, nparts + 1)
                ]
            else:
                cpaths = [
                    os.path.join(
                        log_dir, f"{base_version:020d}.checkpoint.parquet"
                    )
                ]
            for cpath in cpaths:
                pf = pq.ParquetFile(cpath)
                want = [
                    c
                    for c in ("add", "remove", "metaData")
                    if c in pf.schema_arrow.names
                ]
                # streamed per Arrow batch: driver memory is bounded by
                # one batch of actions, not the checkpoint's total size
                for batch in pf.iter_batches(columns=want):
                    for row in batch.to_pylist():
                        add = row.get("add")
                        if add and add.get("path"):
                            apply_add(
                                add["path"],
                                add.get("deletionVector"),
                                add.get("partitionValues"),
                            )
                        rem = row.get("remove")
                        if rem and rem.get("path"):
                            live.pop(rem["path"], None)
                        md = row.get("metaData")
                        if md and (md.get("schemaString") or md.get("id")):
                            apply_meta(md)
        commits = sorted(
            f
            for f in os.listdir(log_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        )
        for f in commits:
            v = int(f[:-5])
            if v <= base_version:
                continue
            with open(os.path.join(log_dir, f)) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if "add" in action:
                        a = action["add"]
                        apply_add(
                            a["path"],
                            a.get("deletionVector"),
                            a.get("partitionValues"),
                        )
                    elif "remove" in action:
                        live.pop(action["remove"]["path"], None)
                    elif "metaData" in action:
                        apply_meta(action["metaData"])
        mapping_cols: list | None = None
        if mapping_mode and mapping_mode != "none":
            # r11: columnMapping.mode=name translates DIRECTLY to this
            # engine's column-mapping machinery (r10 schema evolution):
            # the public log's per-field physicalName/id metadata become
            # mapping entries, reads project physical -> logical exactly
            # as for natively-evolved tables.
            # r12: mode=id imports through the SAME machinery — readers
            # of an id-mapped table match parquet columns by FIELD ID,
            # but delta-spark writes those files with the physicalName
            # as the column name AND the id in the footer, so a
            # name-based read is correct exactly when every footer's
            # (field id -> column name) agrees with the log's
            # (id -> physicalName). That agreement is VERIFIED per file
            # below (one metadata read, import time only); any drifted
            # footer refuses loudly instead of silently mis-binding.
            if mapping_mode not in ("name", "id"):
                raise ValueError(
                    "Delta import: delta.columnMapping.mode="
                    f"{mapping_mode!r} is not supported; only "
                    "mode=name and mode=id import"
                )
            if schema_json is None:
                raise ValueError(
                    "Delta import: columnMapping.mode=name but the log "
                    "carries no schemaString to read the mapping from"
                )
            mapping_cols = []
            for f in schema_json.get("fields", []):
                md = f.get("metadata") or {}
                phys = md.get("delta.columnMapping.physicalName")
                fid = md.get("delta.columnMapping.id")
                if not phys or fid is None:
                    raise ValueError(
                        "Delta import: columnMapping.mode=name but "
                        f"field {f.get('name')!r} lacks physicalName/"
                        "id metadata in the schemaString"
                    )
                # NESTED mapping (r12): tables created with mapping
                # enabled assign col-<uuid> physical names to struct/
                # array/map INNER fields too — files store those, the
                # log stores the logical names. Translate recursively:
                # the entry keeps a logical `type` plus, when any inner
                # name differs, a `physical_type` the parquet reader
                # binds against; the read projection then casts
                # physical_type -> type (struct casts rename fields
                # positionally), so inner data is never silently NULL.
                log_t, phys_t, differs = cls._delta_nested_types(
                    f["type"]
                )
                entry = {
                    "id": int(fid),
                    "name": f["name"],
                    "physical": phys,
                    "type": log_t,
                }
                if differs:
                    entry["physical_type"] = phys_t
                mapping_cols.append(entry)
        pv_key_alts: dict[str, str] = {}
        if mapping_cols is not None and part_cols:
            # mapping × partitioning (late r12): under column mapping
            # the log keys metaData.partitionColumns and each add's
            # partitionValues by PHYSICAL name (Delta protocol), while
            # the virtual-partition fill runs ABOVE the physical ->
            # logical projection and is keyed by logical name.
            # Translate here; accept either keying (a table whose
            # physical names equal its logical names keys logically).
            phys2log = {e["physical"]: e["name"] for e in mapping_cols}
            logical = {e["name"] for e in mapping_cols}
            unknown = [
                c for c in part_cols if c not in phys2log and c not in logical
            ]
            if unknown:
                raise ValueError(
                    "Delta import: partition columns "
                    f"{unknown} match neither a logical nor a physical "
                    "schema name; cannot translate the mapping"
                )
            part_cols = [phys2log.get(c, c) for c in part_cols]
            pv_key_alts = {
                e["name"]: e["physical"]
                for e in mapping_cols
                if e["name"] in part_cols
            }
        if not live:
            raise ValueError(
                f"Delta log at {log_dir!r} resolves to zero live files"
            )
        dvd = [rel for rel in live if live[rel]["dv"]]
        if dvd and not materialize_dvs:
            raise ValueError(
                f"Delta import: {len(dvd)} add action(s) carry deletion "
                "vectors — the parquet bytes do not reflect their "
                "row-level deletes. Re-run with MATERIALIZE DELETION "
                "VECTORS to purge the masked rows at import time (only "
                "the DV-carrying files are rewritten; the rest still "
                "hard-link)."
            )
        purge_dir = None
        if dvd:
            from sclera_spark.sources.deletion_vectors import (
                descriptor_positions,
                purge_parquet,
            )

            purge_dir = tempfile.mkdtemp(prefix="sclera_dv_purge_")
            for i, rel in enumerate(dvd):
                e = live[rel]
                positions = descriptor_positions(table_dir, e["dv"])
                dst = os.path.join(purge_dir, f"purged-{i:05d}.parquet")
                purge_parquet(e["src"], dst, positions)
                e["src"] = dst  # adopted via the copy/link fallback
        pv_by_src: dict[str, dict] | None = None
        if part_cols:
            # zero-copy partitioned import: values come from the log,
            # not the directory names; typed per the schemaString
            pv_by_src = {}
            for rel, e in live.items():
                pv = e["pv"] or {}
                pv_by_src[e["src"]] = {
                    # logical key first (None is a legal value — a null
                    # partition), physical-name fallback for mapped logs
                    c: pv[c] if c in pv else pv.get(pv_key_alts.get(c, c))
                    for c in part_cols
                }
        srcs = []
        for rel in sorted(live):
            src = live[rel]["src"]
            if not os.path.isfile(src):
                raise FileNotFoundError(
                    f"Delta log references missing file {src!r}"
                )
            srcs.append(src)
        meta: dict = {
            "imported_from": os.path.abspath(table_dir),
            "_op": "import_delta",
        }
        if part_cols:
            fields = {
                f["name"]: f["type"]
                for f in (schema_json or {}).get("fields", [])
                if isinstance(f.get("type"), str)
            }
            missing = [c for c in part_cols if c not in fields]
            if missing:
                raise ValueError(
                    f"Delta import: partition columns {missing} have "
                    "no scalar type in the table's schemaString; "
                    "cannot type their values"
                )
            meta["partition_columns"] = [
                {"name": c, "type": fields[c]} for c in part_cols
            ]
            if schema_json:
                meta["table_schema"] = json.dumps(schema_json)
        if mapping_cols is not None and mapping_mode == "id":
            import pyarrow.parquet as pq

            # mode=id verification: every footer column carrying a
            # field id must be NAMED with that id's physicalName (the
            # delta-spark writer layout); a drifted footer would make
            # the name-based read silently mis-bind -> loud refusal.
            by_id = {e["id"]: e["physical"] for e in mapping_cols}
            phys_names = {e["physical"] for e in mapping_cols}
            for src in srcs:
                arrow = pq.ParquetFile(src).schema_arrow
                for af in arrow:
                    md = af.metadata or {}
                    fid = md.get(b"PARQUET:field_id")
                    if fid is None:
                        # id-less column in an id-mapped table: binding
                        # is provable only when the name IS a mapped
                        # physical name (otherwise a true id-reader and
                        # this name-reader would disagree)
                        if af.name.split(".", 1)[0] not in phys_names:
                            raise ValueError(
                                "Delta import: columnMapping.mode=id — "
                                f"file {os.path.basename(src)!r} column "
                                f"{af.name!r} carries no parquet field "
                                "id and is not a mapped physicalName; "
                                "cannot prove how an id-based reader "
                                "would bind it. Rewrite/compact the "
                                "table first."
                            )
                        continue
                    want = by_id.get(int(fid))
                    if want is not None and af.name != want:
                        raise ValueError(
                            "Delta import: columnMapping.mode=id — "
                            f"file {os.path.basename(src)!r} stores "
                            f"field id {int(fid)} under column "
                            f"{af.name!r} but the log maps it to "
                            f"physicalName {want!r}; a name-based "
                            "read would mis-bind it. Rewrite/compact "
                            "the table first."
                        )
        if mapping_cols is not None:
            import pyarrow.parquet as pq

            # leftover physical columns (Delta DROP COLUMN leaves the
            # bytes in files and removes the field from the schema)
            # become tombstone reservations: a later ADD COLUMN can
            # then never pick a physical name that would surface the
            # dead bytes out of old files. One footer (metadata-only)
            # read per file, import-time only.
            known = {e["physical"].lower() for e in mapping_cols}
            next_id = max(e["id"] for e in mapping_cols) + 1
            for src in srcs:
                for nm in pq.ParquetFile(src).schema_arrow.names:
                    base = nm.split(".", 1)[0]
                    if base.lower() in known:
                        continue
                    known.add(base.lower())
                    mapping_cols.append(
                        {
                            "id": next_id,
                            "name": f"__delta_dropped_{base}",
                            "physical": base,
                            "type": "string",
                            "dropped": True,
                        }
                    )
                    next_id += 1
            _, logical, _ = cls._mapping_schemas(mapping_cols)
            meta["columns"] = mapping_cols
            meta["table_schema"] = json.dumps(logical.jsonValue())
        try:
            return cls._adopt_external(path, srcs, meta, pv_by_src=pv_by_src)
        finally:
            if purge_dir:
                shutil.rmtree(purge_dir, ignore_errors=True)

    @classmethod
    def import_iceberg(
        cls, table_dir: str, path: str, materialize_deletes: bool = False
    ) -> "ManifestTable":
        """Migration from an external APACHE ICEBERG table without
        copying data: resolve the current snapshot per the public spec
        (sources/iceberg.py — metadata.json is parsed directly; the
        Avro manifest layer reads via fastavro when installed, else the
        bundled spec reader sources/avro_lite.py), hard-link its live
        parquet files in, and publish them as version 1 of a new
        manifest table.

        Iceberg identity-partitioned files physically contain their
        partition columns, so no virtual-column fill is needed; the
        stats backfill's per-file min/max make partition-key predicates
        prune imported files exactly like native clustering.

        Schema-evolution guard: Iceberg reads map columns by FIELD ID,
        so a renamed/added column leaves footers whose names differ
        from the current schema. Plain name-based parquet reads would
        silently misread those files — every footer is checked (one
        metadata read per file, import-time only) and any mismatch is
        a loud refusal telling the user to rewrite/compact first.
        POSITION deletes (the common v2 row-level delete) and EQUALITY
        deletes (the Flink-CDC shape — r14) are applied at import time
        under the ``materialize_deletes`` opt-in, exactly like the
        Delta importer's deletion vectors: only the delete-bearing
        data files are rewritten with masked rows purged
        (sources/deletion_vectors.purge_parquet — format-agnostic
        row-position masking; equality matches become positions via
        iceberg.equality_delete_matches); every other file still
        hard-links. Equality application follows the spec's rules —
        strictly-older data sequence numbers only, scoped to the
        delete's partition (empty = global). Without the opt-in a
        delete manifest is a loud refusal; unresolvable sequence
        numbers, missing equality_ids, nested equality fields and
        non-local storage always refuse — never silent data loss."""
        from sclera_spark.sources import iceberg as ice

        doc = ice.load_table_metadata(table_dir)
        fields = ice.schema_fields(doc)
        srcs, delete_files, data_info = ice.snapshot_files(
            doc, table_dir, collect_deletes=materialize_deletes
        )
        import pyarrow.parquet as pq

        want = {f["name"] for f in fields}
        by_name = {f["name"]: f["type"] for f in fields}
        widened = False
        for p in srcs:
            arrow = pq.ParquetFile(p).schema_arrow
            got = {n.split(".", 1)[0] for n in arrow.names}
            if got != want:
                raise ice.IcebergImportUnsupported(
                    "Iceberg import: data file "
                    f"{os.path.basename(p)!r} stores columns "
                    f"{sorted(got)} but the current schema says "
                    f"{sorted(want)} — the table evolved via field-id "
                    "mapping (rename/add), which name-based parquet "
                    "reads would misinterpret. Compact/rewrite the "
                    "table with current names first."
                )
            # type drift (r12): Iceberg TYPE PROMOTION (int->long,
            # float->double, decimal precision growth) leaves OLD files
            # with narrower physical types; name-only checks pass and a
            # schema-from-first-file read would bind the narrow type.
            # Legal promotions are accepted and recorded as an explicit
            # widened table_schema (the parquet reader's widening
            # promotion lifts the narrow files); anything else refuses.
            for af in arrow:
                exp = by_name.get(af.name.split(".", 1)[0])
                verdict = cls._iceberg_type_drift(exp, af.type)
                if verdict == "bad":
                    raise ice.IcebergImportUnsupported(
                        "Iceberg import: data file "
                        f"{os.path.basename(p)!r} stores column "
                        f"{af.name!r} as {af.type} but the current "
                        f"schema says {exp!r} — unsupported physical-"
                        "type drift (not an Iceberg promotion). "
                        "Compact/rewrite the table first."
                    )
                widened = widened or verdict == "widen"
        n_purged = 0
        purge_dir = None
        if delete_files:
            from sclera_spark.sources.deletion_vectors import purge_parquet

            live_real = {os.path.realpath(p): i for i, p in enumerate(srcs)}
            # POSITION deletes name their target files exactly; rows
            # naming files outside the live set are no-ops (their
            # target was removed by a later snapshot)
            masked = ice.position_delete_positions(
                [d["path"] for d in delete_files if d["content"] == 1],
                table_dir,
            )
            hit: dict[str, set[int]] = {
                k: set(v) for k, v in masked.items() if k in live_real
            }
            # EQUALITY deletes (r14): per the spec's application rules,
            # a delete applies to data files with a STRICTLY OLDER data
            # sequence number, scoped to the delete's partition (an
            # empty partition struct = global). Matched rows become
            # positions and ride the same purge as position deletes.
            pos_files = set(hit)  # files masked by POSITION deletes
            eq_files: set[str] = set()
            eq = [d for d in delete_files if d["content"] == 2]
            if eq:
                fields_by_id = {f["id"]: f["name"] for f in fields}
                for d in eq:
                    if d["seq"] is None:
                        raise ice.IcebergImportUnsupported(
                            "Iceberg import: equality-delete file "
                            f"{d['path']!r} has no resolvable sequence "
                            "number — cannot order it against the data "
                            "files truthfully"
                        )
                    # load the delete's match set ONCE (it is matched
                    # against every eligible data file); also refuses
                    # corrupt entries even when the sequence rule would
                    # make them no-ops
                    cols, targets = ice.equality_delete_targets(
                        d, fields_by_id
                    )
                    for key, info in data_info.items():
                        if key not in live_real:
                            continue
                        if info["seq"] is None:
                            raise ice.IcebergImportUnsupported(
                                f"Iceberg import: data file {key!r} has "
                                "no resolvable sequence number while "
                                "equality deletes are present — cannot "
                                "apply the strictly-older rule truthfully"
                            )
                        if not info["seq"] < d["seq"]:
                            continue  # data file is newer than the delete
                        if d["partition"] and d["partition"] != info["partition"]:
                            continue  # partition-scoped: other partition
                        pos = ice.equality_delete_matches(
                            srcs[live_real[key]],
                            cols,
                            targets,
                            ids=d["equality_ids"],
                        )
                        if pos:
                            eq_files.add(key)
                            hit.setdefault(key, set()).update(pos)
            purge_dir = tempfile.mkdtemp(prefix="sclera_icedel_purge_")
            for j, key in enumerate(sorted(hit)):
                dst = os.path.join(purge_dir, f"purged-{j:05d}.parquet")
                purge_parquet(srcs[live_real[key]], dst, sorted(hit[key]))
                srcs[live_real[key]] = dst
                n_purged += 1
        meta = {
            "imported_from": os.path.abspath(table_dir),
            "_op": "import_iceberg",
            "iceberg_snapshot_id": doc.get("current-snapshot-id"),
        }
        if n_purged:
            # provenance by CAUSE (a file hit by both kinds counts in
            # both): auditors of an import's metadata must not read
            # "position deletes" off an equality-only table
            if pos_files:
                meta["iceberg_position_deletes_applied"] = len(pos_files)
            if eq_files:
                meta["iceberg_equality_deletes_applied"] = len(eq_files)
        if widened:
            if any(not isinstance(f["type"], str) for f in fields):
                raise ice.IcebergImportUnsupported(
                    "Iceberg import: type promotion detected in a "
                    "table with nested (struct/list/map) columns — "
                    "the widened read schema cannot be derived here. "
                    "Compact/rewrite the table first."
                )
            meta["table_schema"] = json.dumps(
                {
                    "type": "struct",
                    "fields": [
                        {
                            "name": f["name"],
                            "type": f["type"],
                            "nullable": True,
                            "metadata": {},
                        }
                        for f in fields
                    ],
                }
            )
        try:
            return cls._adopt_external(path, srcs, meta)
        finally:
            # drop the purge scratch AFTER adoption: _adopt_external
            # hard-links where it can, so removing the scratch copy
            # leaves the adopted link as the sole owner (same pattern
            # as the Delta DV path above)
            if purge_dir:
                shutil.rmtree(purge_dir, ignore_errors=True)

    @staticmethod
    def _iceberg_type_drift(expected, arrow_type) -> str:
        """'exact' | 'widen' | 'bad' verdict of one parquet footer type
        vs the current Iceberg schema's Spark type name. 'widen' covers
        exactly the promotions the Iceberg spec allows (int->long,
        float->double, decimal precision growth at fixed scale); nested
        (non-str) expected types are not deep-checked (footer names
        already matched)."""
        import pyarrow as pa

        if not isinstance(expected, str):
            return "exact"
        t = arrow_type
        m = re.match(r"^decimal\((\d+),(\d+)\)$", expected)
        if m:
            if not pa.types.is_decimal(t):
                return "bad"
            p, s = int(m.group(1)), int(m.group(2))
            if t.scale != s or t.precision > p:
                return "bad"
            return "exact" if t.precision == p else "widen"
        exact = {
            "long": pa.types.is_int64,
            "integer": pa.types.is_int32,
            "double": pa.types.is_float64,
            "float": pa.types.is_float32,
            "string": lambda x: pa.types.is_string(x)
            or pa.types.is_large_string(x),
            "boolean": pa.types.is_boolean,
            "date": pa.types.is_date,
            "timestamp": pa.types.is_timestamp,
            "binary": lambda x: pa.types.is_binary(x)
            or pa.types.is_large_binary(x)
            or pa.types.is_fixed_size_binary(x),
        }
        chk = exact.get(expected)
        if chk is None:
            return "exact"  # unmapped/nested-ish type: names matched
        if chk(t):
            return "exact"
        if expected == "long" and pa.types.is_int32(t):
            return "widen"
        if expected == "double" and pa.types.is_float32(t):
            return "widen"
        return "bad"

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
        t._publish(1, moved, {"_op": "convert"})
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
        until vacuum. Returns the cleared version numbers.

        CAS tables: run
        :meth:`CasManifestTable.recover_cas_txn_journals` FIRST — a
        claim above the pointer may belong to a journaled (= committed)
        multi-table transaction awaiting its pointer swap; healing it
        here would orphan that transaction (replay then marks the
        journal ``.failed``)."""
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

    def _manifest(self, version: int | None = None) -> dict:
        """The fully-resolved manifest for a version (delta chains
        replayed down to their snapshot — see ``load_manifest``)."""
        v = self.version() if version is None else version
        return load_manifest(self.log_dir, v)

    def meta(self, version: int | None = None) -> dict:
        """Application metadata carried by a manifest version (e.g. the
        streaming sink's last-committed batch id). INHERITED across
        commits unless explicitly overridden, so compaction or DML never
        silently drops it. Returns a copy (callers merge/pop freely;
        the underlying resolved manifest is cached and shared)."""
        return dict(self._manifest(version).get("meta", {}))

    def files(self, version: int | None = None) -> list[str]:
        return [
            os.path.join(self.data_dir, f)
            for f in self._manifest(version)["files"]
        ]

    def file_stats(self, version: int | None = None) -> dict[str, dict]:
        """Per-file column min/max recorded at commit time (r8 data
        skipping): {file name: {column: [min, max]}}. Absent for files
        committed by pre-stats builds — pruning keeps those files.
        READ-ONLY: the dict is shared with the resolved-manifest cache
        (same for file_rows/file_nulls)."""
        return self._manifest(version).get("stats", {})

    def file_rows(self, version: int | None = None) -> dict[str, int]:
        """Per-file row counts recorded at commit time (parquet footer
        num_rows — exact). Absent for files committed by pre-stats
        builds."""
        return self._manifest(version).get("rows", {})

    def row_count(self, version: int | None = None) -> int | None:
        """Exact table row count from manifest metadata alone (no scan,
        no Spark job) — the Delta/Iceberg metadata-only count. None when
        any live file predates row-count recording (callers fall back
        to counting)."""
        v = self.version() if version is None else version
        rows = self.file_rows(v)
        names = [os.path.basename(p) for p in self.files(v)]
        if any(n not in rows for n in names):
            return None
        return sum(rows[n] for n in names)

    def file_nulls(self, version: int | None = None) -> dict[str, dict]:
        """Per-file per-column exact null counts recorded at commit time
        (r9): {file name: {column: nulls}}. A file's entry is present
        (possibly {}) exactly when the commit recorded v2 stats for it —
        absence marks a legacy file whose stats lack type tags."""
        return self._manifest(version).get("nulls", {})

    # ---- virtual partition columns (partitioned Delta import) ----

    def partition_info(
        self, version: int | None = None
    ) -> tuple[list[dict], dict[str, dict]] | None:
        """([{name, type}], {file name: {col: raw string | None}}) for
        a table imported from a partitioned Delta log, else None. The
        values are the log's ``partitionValues`` strings; readers cast
        them to the recorded Spark type. Files written AFTER the import
        (DML COW, compaction) carry the columns physically and have no
        entry here — :meth:`read`'s coalesce keeps both populations
        correct in one scan."""
        try:
            meta = self.meta(version)
        except FileNotFoundError:
            return None
        pcols = meta.get("partition_columns")
        pv = meta.get("file_partition_values")
        if not pcols or not pv:
            return None
        return pcols, pv

    def _fill_partition_columns(
        self, spark, df: DataFrame, info, files: list[str]
    ) -> DataFrame:
        """Materialize virtual partition columns on a scan: broadcast
        a (file name -> partition value strings) lookup — manifest
        metadata the driver already holds, a few MB even at a million
        files — join it on ``_metadata.file_name`` (JVM-side, no
        Python), and coalesce the physical column (NULL for imported
        files, real for post-import rewrites) with the cast virtual
        value. Column order and names are unchanged."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import StringType, StructField, StructType

        pcols, pv = info
        out_cols = list(df.columns)
        fill = [c for c in pcols if c["name"] in out_cols]
        if not fill:
            return df
        names = {os.path.basename(f) for f in files}
        rows = [
            tuple([n] + [pv[n].get(c["name"]) for c in pcols])
            for n in sorted(names & pv.keys())
        ]
        if not rows:
            return df
        lk_schema = StructType(
            [StructField("__sclera_pv_file", StringType())]
            + [
                StructField(f"__sclera_pv_{c['name']}", StringType())
                for c in pcols
            ]
        )
        lookup = spark.createDataFrame(rows, lk_schema)
        df = df.withColumn(
            "__sclera_pv_file", F.col("_metadata.file_name")
        ).join(F.broadcast(lookup), "__sclera_pv_file", "left")
        for c in fill:
            df = df.withColumn(
                c["name"],
                F.coalesce(
                    F.col(c["name"]),
                    F.col(f"__sclera_pv_{c['name']}").cast(c["type"]),
                ),
            )
        return df.select(*out_cols)

    @staticmethod
    def _partition_stat_entry(raw, typ: str):
        """One partition value as a [v, v, tag] stats entry in exactly
        the canonical form :func:`_parquet_minmax` records, so
        :meth:`files_pruned` range/set-compares it soundly. None for
        untypeable values (pruning keeps the file)."""
        if raw is None:
            return None
        try:
            if typ in ("byte", "short", "integer", "long"):
                v = int(raw)
                return [v, v, "n"]
            if typ in ("float", "double") or typ.startswith("decimal"):
                v = float(raw)
                return [v, v, "n"]
            if typ == "string":
                return [raw, raw, "s"]
            if typ == "date":
                import datetime as _dt

                return [
                    _dt.date.fromisoformat(raw).isoformat(),
                ] * 2 + ["d"]
            if typ == "timestamp":
                import datetime as _dt

                ts = _dt.datetime.fromisoformat(raw.replace("T", " "))
                c = ts.strftime("%Y-%m-%d %H:%M:%S.%f")
                return [c, c, "t"]
        except (ValueError, TypeError):
            return None
        return None

    # ---- column mapping (RENAME / DROP COLUMN, type widening) ----
    #
    # Delta-style column-mapping-by-id (public Delta protocol's
    # `columnMapping.mode = name`): each column gets a stable id and a
    # PHYSICAL name — the name under which data files store it, fixed
    # forever at assignment — while the LOGICAL (user-facing) name and
    # type live in manifest meta and can change as pure metadata
    # commits. Stats, null counts and bloom sidecars all key on the
    # physical name, so a rename keeps every skipping structure live
    # without touching a single data file; DROP is a tombstone applied
    # at read; widening (int->long, float->double, int-family->double)
    # re-types the read schema and lets the parquet reader's widening
    # promotion (Spark 4) read old narrow files in place.
    # Reference context: the reference evolves schemas by forwarding
    # ALTER to the location RDBMS (SqlAdminParser.scala); this is the
    # lakehouse-native equivalent for manifest-managed tables.

    _WIDEN_CHAIN = {"byte": 0, "short": 1, "integer": 2, "long": 3}

    def column_mapping(self, version: int | None = None) -> list | None:
        """The column-mapping table of a version, or None for tables
        that never evolved (logical == physical). Entries:
        ``{"id", "name", "physical", "type", "dropped"}`` where
        ``type`` is the Spark dataType jsonValue of the LOGICAL
        (possibly widened) type. Order is column order. Returns a
        DEEP COPY — callers mutate entries freely without corrupting
        the shared resolved-manifest cache."""
        raw = self._manifest(version).get("meta", {}).get("columns")
        return json.loads(json.dumps(raw)) if raw else None

    def _fresh_mapping(self, spark) -> list:
        """First-evolution bootstrap: derive the mapping from the
        current logical schema (physical = logical for every column
        written so far)."""
        schema = self.read(spark).schema
        return [
            {
                "id": i + 1,
                "name": f.name,
                "physical": f.name,
                "type": f.dataType.jsonValue(),
            }
            for i, f in enumerate(schema.fields)
        ]

    @classmethod
    def _delta_nested_types(cls, t):
        """Recursive (logical, physical, differs) translation of a
        Delta schemaString dataType: ``logical`` strips the
        delta.columnMapping metadata and keeps user-facing nested
        names; ``physical`` substitutes each nested field's
        delta.columnMapping.physicalName (the name data files store);
        ``differs`` is True when any nested physical name deviates
        from its logical name. Primitive/decimal types pass through
        unchanged. Refuses a nested field that sits under mapping
        metadata but lacks a physicalName (a malformed log would
        otherwise silently NULL it)."""
        if not isinstance(t, dict):
            return t, t, False
        kind = t.get("type")
        if kind == "struct":
            lfs, pfs, diff = [], [], False
            for f in t.get("fields", []):
                md = f.get("metadata") or {}
                phys = md.get("delta.columnMapping.physicalName")
                if md.get("delta.columnMapping.id") is not None and not phys:
                    raise ValueError(
                        "Delta import: nested field "
                        f"{f.get('name')!r} carries a columnMapping id "
                        "but no physicalName — malformed log"
                    )
                lt, pt, d = cls._delta_nested_types(f["type"])
                diff = diff or d
                if phys and phys != f["name"]:
                    diff = True
                lfs.append(
                    {
                        "name": f["name"],
                        "type": lt,
                        "nullable": f.get("nullable", True),
                        "metadata": {},
                    }
                )
                pfs.append(
                    {
                        "name": phys or f["name"],
                        "type": pt,
                        "nullable": f.get("nullable", True),
                        "metadata": {},
                    }
                )
            return (
                {"type": "struct", "fields": lfs},
                {"type": "struct", "fields": pfs},
                diff,
            )
        if kind == "array":
            lt, pt, d = cls._delta_nested_types(t["elementType"])
            base = {
                "type": "array",
                "containsNull": t.get("containsNull", True),
            }
            return (
                {**base, "elementType": lt},
                {**base, "elementType": pt},
                d,
            )
        if kind == "map":
            lk, pk, dk = cls._delta_nested_types(t["keyType"])
            lv, pv, dv = cls._delta_nested_types(t["valueType"])
            base = {
                "type": "map",
                "valueContainsNull": t.get("valueContainsNull", True),
            }
            return (
                {**base, "keyType": lk, "valueType": lv},
                {**base, "keyType": pk, "valueType": pv},
                dk or dv,
            )
        return t, t, False

    @staticmethod
    def _mapping_schemas(mapping):
        """(physical read schema, logical schema, live entries) for a
        mapping. Physical fields carry the LOGICAL (widened) type —
        the parquet reader's widening promotion handles narrow old
        files — under the physical name; the projection then aliases
        physical -> logical."""
        from pyspark.sql.types import StructType

        live = [e for e in mapping if not e.get("dropped")]

        def _struct(key, typed_physical=False):
            return StructType.fromJson(
                {
                    "type": "struct",
                    "fields": [
                        {
                            "name": e[key],
                            # nested-mapped imports (Delta mode=name
                            # with struct/array/map columns) read under
                            # the physical_type — inner field names as
                            # stored in files — and cast back to the
                            # logical type at projection time
                            "type": (
                                e.get("physical_type", e["type"])
                                if typed_physical
                                else e["type"]
                            ),
                            "nullable": True,
                            "metadata": {},
                        }
                        for e in live
                    ],
                }
            )

        return _struct("physical", True), _struct("name"), live

    def _commit_mapping(self, mapping: list, op: str, extra: dict | None = None):
        """One metadata commit carrying the evolved mapping plus the
        matching logical table_schema (the schema source of truth the
        batch/stream readers consult)."""
        _, logical, _ = self._mapping_schemas(mapping)
        self.amend_meta(
            {
                "columns": mapping,
                "table_schema": json.dumps(logical.jsonValue()),
                "_op": op,
                **(extra or {}),
            }
        )

    def _guard_partition_column(self, col: str, op: str) -> None:
        """Virtual partition columns (partitioned Delta import) are
        keyed by NAME in the per-file value map, so renaming, dropping
        or re-typing one would orphan every file's recorded value —
        refuse loudly (materialize a copy to restructure them)."""
        pinfo = self.partition_info()
        if pinfo and any(
            c["name"].lower() == col.lower() for c in pinfo[0]
        ):
            raise ValueError(
                f"{op}: {col!r} is a virtual partition column of "
                f"{self.path} (partitioned Delta import) — its values "
                "live in the manifest meta keyed by this name. "
                "Materialize a copy (CREATE TABLE ... AS SELECT) to "
                "restructure it."
            )

    def _live_entry(self, mapping: list, name: str) -> dict:
        hits = [
            e
            for e in mapping
            if not e.get("dropped")
            and e["name"].lower() == name.lower()
        ]
        if not hits:
            raise KeyError(
                f"column {name!r} does not exist on {self.path}"
            )
        return hits[0]

    def rename_column(self, spark, old: str, new: str) -> None:
        """RENAME COLUMN as a pure metadata commit: the physical name
        (and with it every stat, null count and bloom sidecar) is
        untouched; only the logical name changes."""
        self._guard_partition_column(old, "RENAME COLUMN")
        mapping = self.column_mapping() or self._fresh_mapping(spark)
        entry = self._live_entry(mapping, old)
        clash = [
            e
            for e in mapping
            if not e.get("dropped")
            and e is not entry
            and e["name"].lower() == new.lower()
        ]
        if clash:
            raise ValueError(
                f"RENAME COLUMN: {new!r} already exists on {self.path}"
            )
        entry["name"] = new
        self._commit_mapping(mapping, "rename_column")

    def drop_column(self, spark, col: str) -> None:
        """DROP COLUMN as a metadata tombstone: data files keep the
        physical column (ignored at read; vacuum of the bytes would be
        a rewrite — same tradeoff Delta documents); the physical name
        stays RESERVED so a later ADD COLUMN can never alias old
        data."""
        self._guard_partition_column(col, "DROP COLUMN")
        mapping = self.column_mapping() or self._fresh_mapping(spark)
        entry = self._live_entry(mapping, col)
        if sum(1 for e in mapping if not e.get("dropped")) <= 1:
            raise ValueError(
                f"DROP COLUMN would leave {self.path} with no columns"
            )
        entry["dropped"] = True
        entry["name"] = None  # physical name stays as the reservation
        extra = {}
        blooms = self.meta().get("bloom_columns")
        if blooms and entry["physical"] in blooms:
            extra["bloom_columns"] = [
                c for c in blooms if c != entry["physical"]
            ]
        self._commit_mapping(mapping, "drop_column", extra)

    def widen_column(self, spark, col: str, new_type) -> None:
        """Type widening as a metadata commit — only promotions the
        parquet vectorized reader performs in place are legal
        (byte<short<integer<long, float->double, integer-family ->
        double): old narrow files stay readable, new files write the
        wide type, and numeric stats compare across both."""
        self._guard_partition_column(col, "ALTER COLUMN TYPE")
        mapping = self.column_mapping() or self._fresh_mapping(spark)
        entry = self._live_entry(mapping, col)
        old_t, new_t = entry["type"], new_type.jsonValue()
        chain = self._WIDEN_CHAIN
        ok = (
            (old_t in chain and new_t in chain and chain[new_t] > chain[old_t])
            or (old_t == "float" and new_t == "double")
            or (old_t in ("byte", "short", "integer", "float")
                and new_t == "double")
        )
        if not ok:
            raise ValueError(
                f"ALTER COLUMN {col}: {old_t} -> {new_t} is not a "
                "widening the parquet reader can perform in place "
                "(allowed: byte<short<int<long, float->double, "
                "byte/short/int/float->double); narrowing or "
                "re-typing needs a rewrite (CREATE TABLE ... AS)"
            )
        entry["type"] = new_t
        self._commit_mapping(mapping, "widen_column")

    def add_column_mapped(self, col: str, dt) -> None:
        """ADD COLUMN on an already-mapped table: fresh id, and a
        physical name guaranteed never to collide with any physical
        name EVER used (dropped entries stay as reservations) — old
        files can therefore never leak a dead column's bytes into a
        new column that reuses its logical name."""
        mapping = self.column_mapping()
        if mapping is None:
            raise ValueError("add_column_mapped needs an existing mapping")
        if any(
            not e.get("dropped") and e["name"].lower() == col.lower()
            for e in mapping
        ):
            raise ValueError(f"column {col!r} already exists")
        new_id = max(e["id"] for e in mapping) + 1
        used = {e["physical"].lower() for e in mapping}
        phys = col if col.lower() not in used else f"{col}__c{new_id}"
        mapping.append(
            {
                "id": new_id,
                "name": col,
                "physical": phys,
                "type": dt.jsonValue(),
            }
        )
        self._commit_mapping(mapping, "add_column")

    def history(self) -> list[dict]:
        """Retained commit history, NEWEST FIRST (DESCRIBE HISTORY t —
        Delta's history command shape): per version the commit kind
        (the ``_op`` stamp each mutator records), the commit wall time
        (the manifest file's mtime — written once, never modified),
        live file/row totals, and the added/removed file deltas vs the
        previous retained version. Pure driver metadata; versions
        dropped by VACUUM are simply absent."""
        import datetime as _dt

        out = []
        versions = self.versions()
        files_by_v = {
            v: set(load_manifest(self.log_dir, v)["files"])
            for v in versions
        }
        for v in reversed(versions):
            cur = files_by_v[v]
            prev = files_by_v.get(v - 1)
            mpath = os.path.join(self.log_dir, f"v{v}.json")
            try:
                ts = _dt.datetime.fromtimestamp(
                    os.path.getmtime(mpath), _dt.timezone.utc
                ).strftime("%Y-%m-%d %H:%M:%S")
            except OSError:
                ts = None
            out.append(
                {
                    "version": v,
                    "ts": ts,
                    "op": self.meta(v).get("_op"),
                    "files": len(cur),
                    "rows": self.row_count(v),
                    "added": len(cur - prev) if prev is not None else None,
                    "removed": (
                        len(prev - cur) if prev is not None else None
                    ),
                }
            )
        return out

    def files_pruned(
        self,
        ranges: dict[str, tuple],
        version: int | None = None,
        nulls: dict[str, str] | None = None,
        sets: dict[str, list] | None = None,
    ) -> list[str]:
        """FILE-LEVEL data skipping: the live files that can contain a
        row satisfying every ``col BETWEEN lo AND hi`` in ``ranges``
        (either bound may be None = unbounded). A file is dropped only
        when its recorded [min, max] for the column provably cannot
        overlap — missing stats, unknown columns, or type mismatches
        keep the file (pruning is an optimization, never a filter:
        parquet min/max ignore NULLs, and a BETWEEN predicate excludes
        NULL rows anyway, so dropping a non-overlapping file is safe).
        At 100 TB this is the move that turns a time-range query over a
        sorted/clustered table from 'open every footer' into 'open the
        few files the manifest says overlap' — same shape as
        Delta/Iceberg file skipping, with OPTIMIZE ... SORT BY as the
        clustering knob that makes ranges tight.

        ``nulls`` adds null-count skipping (r9): {column: 'null'} drops
        files whose recorded null count for the column is 0 (an
        ``IS NULL`` probe cannot match there), {column: 'notnull'}
        drops all-NULL files (null count == row count). A range bound
        on a column ALSO implies notnull (comparisons never match NULL
        rows), which is what keeps range pruning sound for files whose
        min/max are absent because every value is NULL.

        ``sets`` adds exact-value skipping (r9 dynamic pruning): the
        column must equal ONE OF the listed values, so a file whose
        [min, max] contains none of them is dropped even when the
        values' overall range straddles it — the case a sparse
        dimension key set creates (keys {5, 9_000_005} prune nothing
        by range but almost everything by set). A set on a column
        implies notnull like a range does."""
        v = self.version() if version is None else version
        stats = self.file_stats(v)
        fnulls = self.file_nulls(v)
        frows = self.file_rows(v)
        pinfo = self.partition_info(v)
        ptypes = {c["name"]: c["type"] for c in pinfo[0]} if pinfo else {}
        pvmap = pinfo[1] if pinfo else {}
        want_notnull = {c for c, k in (nulls or {}).items() if k == "notnull"}
        want_notnull |= set(ranges)
        want_notnull |= set(sets or {})
        want_null = {c for c, k in (nulls or {}).items() if k == "null"}
        out = []
        for path in self.files(v):
            name = os.path.basename(path)
            fstats = stats.get(name)
            keep = True
            pvals = pvmap.get(name) if pvmap else None
            if pvals is not None:
                # virtual partition columns (partitioned Delta import):
                # each is a per-file CONSTANT, so its [v, v] bounds are
                # exact — a NULL constant fails every comparison probe,
                # a non-NULL one fails IS NULL probes, and the typed
                # entry below range/set-prunes like any recorded stat.
                # Physical footer stats (post-import rewrites) win.
                for col in want_notnull:
                    if col in ptypes and pvals.get(col) is None:
                        keep = False
                        break
                if keep:
                    for col in want_null:
                        if col in ptypes and pvals.get(col) is not None:
                            keep = False
                            break
                if not keep:
                    continue
                over = {
                    col: ent
                    for col, typ in ptypes.items()
                    if (
                        ent := self._partition_stat_entry(
                            pvals.get(col), typ
                        )
                    )
                    is not None
                }
                if over:
                    fstats = {**over, **(fstats or {})}
            fn = fnulls.get(name)
            if fn is not None:
                for col in want_null:
                    if fn.get(col) == 0:
                        keep = False
                        break
                if keep and name in frows:
                    for col in want_notnull:
                        if col in fn and fn[col] == frows[name]:
                            keep = False  # every value NULL: no match
                            break
            if not keep:
                continue
            if fstats is None:
                out.append(path)
                continue
            for col, (lo, hi) in ranges.items():
                entry = fstats.get(col)
                if not entry or len(entry) < 3:
                    # no stats, or a legacy untagged entry (pre-r9):
                    # without the type tag a sound canonicalization of
                    # the probe bound is not possible — keep the file
                    continue
                mn, mx, tag = entry
                lo_c = _canon_bound(lo, tag) if lo is not None else None
                hi_c = _canon_bound(hi, tag) if hi is not None else None
                if lo_c is _INCOMPARABLE or hi_c is _INCOMPARABLE:
                    continue
                try:
                    if lo_c is not None and mx < lo_c:
                        keep = False
                        break
                    if hi_c is not None and mn > hi_c:
                        keep = False
                        break
                except TypeError:
                    continue  # incomparable bound types: keep the file
            if keep:
                # bloom skipping (sources/bloom.py): equality and
                # IN-set probes check the file's sidecar filters — the
                # skip for UNCLUSTERED columns, where [min, max] covers
                # everything. A file is dropped only when EVERY probed
                # value is definitely absent for some column.
                probes: dict[str, list] = {}
                for col, (lo, hi) in ranges.items():
                    if lo is not None and lo == hi:
                        probes[col] = [lo]
                for col, values in (sets or {}).items():
                    probes.setdefault(col, values)
                if probes:
                    blooms = self.file_bloom(name)
                    if blooms:
                        from sclera_spark.sources.bloom import might_contain

                        for col, vals in probes.items():
                            bl = blooms.get(col)
                            if not bl or not vals:
                                continue
                            if all(
                                not might_contain(bl, v) for v in vals
                            ):
                                keep = False
                                break
            if keep and sets and fstats is not None:
                import bisect

                for col, values in sets.items():
                    entry = fstats.get(col)
                    if not entry or len(entry) < 3:
                        continue  # no tagged stats: cannot set-prune
                    mn, mx, tag = entry
                    canon = []
                    bad = False
                    for v in values:
                        cv = _canon_bound(v, tag)
                        if cv is _INCOMPARABLE:
                            bad = True
                            break
                        canon.append(cv)
                    if bad or not canon:
                        continue
                    try:
                        canon.sort()
                        # any listed value inside [mn, mx]? (first
                        # value >= mn must also be <= mx)
                        i = bisect.bisect_left(canon, mn)
                        if i >= len(canon) or canon[i] > mx:
                            keep = False
                            break
                    except TypeError:
                        continue
            if keep:
                out.append(path)
        return out

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        prune: dict[str, tuple] | None = None,
        file_paths: list[str] | None = None,
        schema=None,
        file_col: str | None = None,
    ) -> DataFrame:
        """Snapshot read. ``prune`` applies file-level data skipping
        (see files_pruned); ``file_paths`` reads an explicit subset the
        caller already derived (e.g. the union of per-scan pruned lists
        when one query scans the table twice) — datetime bounds in
        ``prune`` are taken as UTC when naive. ``schema`` (a known
        StructType — e.g. the already-registered full view's) skips
        Spark's footer-sampling schema-inference job, the fixed cost
        that would otherwise dominate a small pruned rebuild.
        ``file_col`` appends ``_metadata.file_path`` under that name —
        the DML hit probe needs it materialized HERE because the
        hidden ``_metadata`` column does not resolve through the
        partition-fill join of a partitioned Delta import."""
        if file_paths is not None:
            files = file_paths
        else:
            files = (
                self.files_pruned(prune, version)
                if prune
                else self.files(version)
            )
        pinfo = self.partition_info(version)
        mapping = self.column_mapping(version)
        if mapping:
            # column-mapped table: data files store PHYSICAL names and
            # possibly narrower pre-widening types; read under the
            # physical schema (the reader's widening promotion lifts
            # narrow files), then alias physical -> logical. The
            # ``schema`` hint is superseded — the mapping itself holds
            # the types, so there is no inference job to skip.
            from pyspark.sql import functions as F

            physical, logical, live = self._mapping_schemas(mapping)
            if not files:
                df = spark.createDataFrame([], logical)
                if file_col:
                    df = df.withColumn(
                        file_col, F.lit(None).cast("string")
                    )
                return df
            cols = [
                (
                    # nested-mapped column: files store physical inner
                    # names; struct/array/map casts rename fields
                    # positionally, restoring the logical nested names
                    F.col(e["physical"])
                    .cast(lf.dataType)
                    .alias(e["name"])
                    if "physical_type" in e
                    else F.col(e["physical"]).alias(e["name"])
                )
                for e, lf in zip(live, logical.fields)
            ]
            if file_col:
                cols.append(F.col("_metadata.file_path").alias(file_col))
            df = spark.read.schema(physical).parquet(*files).select(cols)
            if pinfo:
                df = self._fill_partition_columns(spark, df, pinfo, files)
            return df
        if schema is None:
            # schema evolution (ALTER TABLE ADD COLUMN): the evolved
            # schema rides the manifest meta — files that predate a
            # column fill typed NULLs under an explicit read schema.
            # Version-scoped, so time travel sees the schema as of
            # that version.
            stored = None
            try:
                stored = self.meta(version).get("table_schema")
            except FileNotFoundError:
                pass
            if stored:
                from pyspark.sql.types import StructType

                schema = StructType.fromJson(json.loads(stored))
        reader = spark.read.schema(schema) if schema is not None else spark.read
        if not files:
            # schema-only snapshot (or fully-pruned read): keep the
            # latest non-empty schema
            from pyspark.sql import functions as F

            if schema is not None:
                df = spark.createDataFrame([], schema)
            else:
                df = None
                for v in reversed(self.versions()):
                    prior = self.files(v)
                    if prior:
                        df = spark.read.parquet(*prior).limit(0)
                        break
                if df is None:
                    raise ValueError(
                        f"manifest table {self.path} has no data files"
                    )
            if file_col:
                df = df.withColumn(file_col, F.lit(None).cast("string"))
            return df
        df = reader.parquet(*files)
        if file_col:
            from pyspark.sql import functions as F

            df = df.withColumn(file_col, F.col("_metadata.file_path"))
        if pinfo:
            df = self._fill_partition_columns(spark, df, pinfo, files)
        return df

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

    # read-modify-publish as one retriable unit: local tables hold the
    # flock for the whole span (compute never sees a concurrent move, the
    # swap is unconditional, one iteration); CAS-backed tables (see
    # CasManifestTable) run lock-free and retry the WHOLE computation
    # when the pointer moved or a claim conflicted — the conditional-put
    # protocol of the object-store log stores (Delta S3/DynamoDB shape).
    _commit_attempts = 64

    def _commit(self, compute, staged=None) -> None:
        with self._writer_lock():
            self._commit_locked(compute, staged)

    def _commit_locked(self, compute, staged=None) -> None:
        """The commit body, writer lock ALREADY HELD by the caller —
        split out (r13) so the multi-table transaction commit can hold
        every participant's lock across the whole group (flock is
        per-open-file-description: re-taking it in-process would
        self-deadlock)."""
        import time as _time

        if staged is not None:
            # staged part files enter data/ only under the lock, so
            # a concurrent vacuum can never eat an in-flight commit;
            # a LIST of staged (scratch, names) tuples adopts them
            # all under ONE lock hold — the multi-batch single-commit
            # path (wire COPY FROM, wire transactions)
            batches = (
                staged if isinstance(staged, list) else [staged]
            )
            for s in batches:
                self._adopt(*s)
        for _ in range(self._commit_attempts):
            base = self.version()
            files, meta = compute()
            try:
                self._publish_claim(base + 1, files, meta)
            except _ClaimConflict:
                _time.sleep(0.02)  # foreign claimant mid-commit
                continue
            if self._swap_pointer(base, base + 1):
                return
            self._drop_claim(base + 1)  # lost the race: recompute
        raise ConcurrentWriterError(
            f"commit on {self.path} could not win the pointer race "
            f"after {self._commit_attempts} attempts (a stuck foreign "
            "claim? run ManifestTable.recover())"
        )

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> None:
        scratch, added = self._stage(df)
        self._commit(
            lambda: (added, self._next_meta(meta, op="overwrite")),
            staged=(scratch, added),
        )

    def amend_meta(self, meta: dict) -> None:
        """Commit a new version with the SAME file list and merged meta —
        a pure metadata commit (e.g. an incremental-aggregate refresh that
        consumed a source version which added no files). Same atomic
        pointer-swap protocol as data commits."""
        self._commit(
            lambda: (self._file_names(), self._next_meta(meta, op="amend"))
        )

    def append(self, df: DataFrame, meta: dict | None = None) -> None:
        scratch, added = self._stage(df)
        self._commit(
            lambda: (
                self._file_names() + added,
                self._next_meta(meta, op="append"),
            ),
            staged=(scratch, added),
        )

    def maybe_autocompact(self, spark) -> list[str]:
        """Post-commit auto-compaction hook (Delta's autoCompact): when
        the table's meta carries an ``auto_compact`` config and at
        least ``min_files`` live files sit under ``target_bytes``,
        bin-pack JUST THOSE files with the existing :meth:`compact`
        (itself one atomic replace_files commit, so readers and the
        change feed see a no-op: the CDF exceptAll cancels rewritten
        rows). Bounded work — only the small-file slice is rewritten,
        never the whole table. Returns the replaced file names ([] =
        nothing to do / not configured)."""
        try:
            cfg = self.meta().get("auto_compact")
        except FileNotFoundError:
            return []
        if not cfg:
            return []
        try:
            replaced = self.compact(
                spark,
                target_bytes=int(cfg.get("target_bytes", 128 * 1024 * 1024)),
                min_files=int(cfg.get("min_files", 8)),
            )
        except Exception as exc:
            # r11 observability: a swallowed maintenance failure must
            # still leave a trace — DESCRIBE DETAIL surfaces it
            self._record_compact_state(error=f"{type(exc).__name__}: {exc}")
            raise
        self._record_compact_state(error=None, replaced=len(replaced))
        return replaced

    def maybe_export_delta(self, spark) -> str | None:
        """Post-mutation mirror hook (``ALTER TABLE t SET DELTA
        MIRROR ['<dir>']``): when the table carries a ``delta_mirror``
        config, refresh the incremental Delta-log export so external
        Delta readers follow the table live — one diff commit per
        engine version that changed files, none when idle (the
        unchanged-file fast path costs one os.listdir + log replay,
        no Spark job). Returns the current commit path (None = not
        configured)."""
        try:
            cfg = self.meta().get("delta_mirror")
        except FileNotFoundError:
            return None
        if not cfg:
            return None
        out = None
        if isinstance(cfg, str):
            # a configured path is the mirror TABLE root: the log goes
            # under <dir>/_delta_log and the data files hard-link into
            # <dir>/data (export_delta_log's custom-directory path), so
            # the mirror is a self-contained Delta table. A path that
            # already names a _delta_log directory is honored as one
            # (the pre-r11-hardening spelling).
            out = (
                cfg
                if os.path.basename(cfg.rstrip("/")) == "_delta_log"
                else os.path.join(cfg, "_delta_log")
            )
        return self.export_delta_log(spark, out_dir=out)

    def _compact_state_file(self) -> str:
        return os.path.join(self.log_dir, "compact_state.json")

    def _record_compact_state(
        self, error: str | None, replaced: int = 0
    ) -> None:
        """Sidecar record of the last auto-compaction attempt (NOT a
        manifest commit: observability must work precisely when commits
        are failing, and a success note is not worth a table version).
        Atomic replace; any failure here is itself swallowed — the
        record is best-effort telemetry."""
        import datetime
        import json

        try:
            state = {
                "last_compact_at": datetime.datetime.now(
                    datetime.timezone.utc
                ).isoformat(timespec="seconds"),
                "last_compact_error": error,
                "last_compact_replaced": replaced,
            }
            tmp = self._compact_state_file() + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(state, fh)
            os.replace(tmp, self._compact_state_file())
        except Exception:
            pass

    def compact_state(self) -> dict:
        """The last auto-compaction attempt's sidecar record ({} when
        auto-compaction never ran) — surfaced by DESCRIBE DETAIL."""
        import json

        try:
            with open(self._compact_state_file()) as fh:
                return json.load(fh)
        except Exception:
            return {}

    def commit_staged(
        self,
        staged: list[tuple],
        meta: dict | None = None,
        remove_names: set[str] | None = None,
    ) -> None:
        """Publish previously-:meth:`_stage`-d part-file batches as ONE
        atomic commit — the wire-transaction COMMIT: every buffered
        INSERT of the transaction lands in a single version, so readers
        see all of it or none of it. A crash before this call leaves
        only unpublished scratch directories (invisible;
        :meth:`discard_staged` or tempdir cleanup reclaims them).

        ``remove_names`` (r11, transactional UPDATE/DELETE) extends the
        commit to a file SWAP: the named live files leave the manifest in
        the same version the staged replacements enter it. Validation
        runs INSIDE the commit lock, exactly like :meth:`replace_files`:
        if any to-be-removed file is no longer live (a concurrent commit
        rewrote it between the buffered DML's probe and this COMMIT),
        the whole transaction aborts loudly instead of resurrecting
        pre-DML rows — write-write conflicts fail, never silently merge.
        On that abort the already-adopted staged files are unreferenced
        (invisible) and vacuum reclaims them."""
        added = [n for _, names in staged for n in names]
        removed = set(remove_names or ())

        def compute():
            live = self._file_names()
            unknown = removed - set(live)
            if unknown:
                raise ValueError(
                    f"transaction aborted: files {sorted(unknown)} are "
                    "no longer live in the current manifest (a "
                    "concurrent commit replaced them after this "
                    "transaction's DML was buffered — retry the "
                    "transaction)"
                )
            return (
                [f for f in live if f not in removed] + added,
                self._next_meta(meta, op="txn_commit"),
            )

        self._commit(compute, staged=list(staged))

    @staticmethod
    def discard_staged(staged: list[tuple]) -> None:
        """ROLLBACK of buffered batches: remove the scratch dirs. The
        files were never adopted into data/, so nothing was ever
        visible to any reader."""
        for scratch, _ in staged:
            shutil.rmtree(scratch, ignore_errors=True)

    @classmethod
    def commit_staged_group(
        cls,
        entries: list[tuple["ManifestTable", list, set]],
        journal_dir: str,
    ) -> None:
        """Multi-TABLE transaction commit (r13, VERDICT task 7): publish
        each table's buffered batches/removes as its own manifest
        commit, the group made atomic by a cross-table INTENT JOURNAL.

        Protocol:
        1. acquire every participant's writer lock, in canonical path
           order (no deadlock against another group commit);
        2. validate EVERY table's remove-set against its live manifest
           (write-write conflicts abort the WHOLE group before anything
           commits — same rule as :meth:`commit_staged`);
        3. relocate the staged bytes from the system tempdir to
           ``<table>/_txn_staging/<txn>/`` (rename same-FS, else copy)
           so they are as durable as the journal, then write the
           journal durably (tmp + rename + fsync). THE JOURNAL is the
           transaction's commit point: a crash after it replays the
           remaining tables on the next engine open
           (:meth:`recover_txn_journals`), a crash before it rolls the
           whole group back (scratch dirs only, nothing visible);
        4. commit each table under its already-held lock;
        5. remove the journal.

        Only flock-protocol tables participate: a CAS table's commit
        point lives in an external store that cannot be covered by a
        local journal, so one here refuses loudly (the caller surfaces
        0A000). All-CAS groups commit through
        :meth:`CasManifestTable.commit_staged_group_cas` (r14), whose
        journal is an object in the CAS store itself."""
        import json as _json
        import uuid as _uuid
        from contextlib import ExitStack

        for mt, _, _ in entries:
            if isinstance(mt, CasManifestTable):
                raise ValueError(
                    f"multi-table transactions cannot include the CAS "
                    f"table at {mt.path}: its commit point is the "
                    "external pointer store, outside the local intent "
                    "journal's crash-recovery reach"
                )
        entries = sorted(
            entries, key=lambda e: os.path.realpath(e[0].path)
        )
        os.makedirs(journal_dir, exist_ok=True)
        with ExitStack() as stack:
            for mt, _, _ in entries:
                stack.enter_context(mt._writer_lock())
            # validate ALL before committing ANY — and the locks stay
            # held through every commit, so validity cannot rot
            for mt, _, removes in entries:
                unknown = set(removes or ()) - set(mt._file_names())
                if unknown:
                    raise ValueError(
                        f"transaction aborted: files {sorted(unknown)} "
                        f"of {mt.path} are no longer live (a concurrent "
                        "commit replaced them after this transaction's "
                        "DML was buffered — retry the transaction)"
                    )
            txn_id = _uuid.uuid4().hex
            journal = os.path.join(journal_dir, f"txn-{txn_id}.json")
            # relocate staged scratch dirs UNDER each table's directory
            # before the journal is written: scratch lives in the
            # system tempdir, which need not survive a reboot — the
            # journal's commit-point claim requires the staged bytes to
            # be as durable as the journal itself. rename when same-FS,
            # copy otherwise; a failure here rolls the moves back and
            # aborts pre-journal (nothing committed). The _txn_staging
            # dirs sit OUTSIDE data/, where vacuum never looks.
            moved: list[tuple[str, str]] = []  # (new, original)
            sroots: list[str] = []
            tmp = journal + ".tmp"
            try:
                entries2 = []
                for mt, staged, removes in entries:
                    sroot = os.path.join(mt.path, "_txn_staging", txn_id)
                    sroots.append(sroot)
                    new_staged = []
                    for i, (scratch, names) in enumerate(staged):
                        dst = os.path.join(sroot, str(i))
                        os.makedirs(os.path.dirname(dst), exist_ok=True)
                        try:
                            os.rename(scratch, dst)
                        except OSError:
                            shutil.copytree(scratch, dst)
                            shutil.rmtree(scratch, ignore_errors=True)
                        moved.append((dst, scratch))
                        new_staged.append((dst, list(names)))
                    entries2.append((mt, new_staged, removes))
                entries = entries2
                # the journal is only as good as the bytes it points
                # at: fsync every relocated file AND the directory
                # chain up to the table dir, so a post-journal reboot
                # cannot find a journal whose staged data never hit
                # disk (rename/copy alone leave both in page cache)
                for dst, _ in moved:
                    _fsync_tree(dst)
                for sroot in sroots:
                    _fsync_dir(sroot)
                    _fsync_dir(os.path.dirname(sroot))  # _txn_staging
                    _fsync_dir(os.path.dirname(os.path.dirname(sroot)))
                payload = {
                    "tables": [
                        {
                            "path": os.path.realpath(mt.path),
                            "staged": [
                                [scratch, list(names)]
                                for scratch, names in staged
                            ],
                            "removes": sorted(removes or ()),
                        }
                        for mt, staged, removes in entries
                    ]
                }
                with open(tmp, "w") as fh:
                    _json.dump(payload, fh)
                    fh.flush()
                    os.fsync(fh.fileno())
                os.rename(tmp, journal)
                _fsync_dir(journal_dir)  # persist the rename itself
            except Exception:
                # pre-journal abort: nothing committed. Put staged
                # bytes back where the caller's discard_staged expects
                # them; what cannot be renamed back (cross-FS copytree
                # move, original tempdir gone) is transaction garbage
                # — delete it here rather than orphan it in
                # _txn_staging, where vacuum never looks.
                for dst, orig in moved:
                    try:
                        os.rename(dst, orig)
                    except OSError:
                        shutil.rmtree(dst, ignore_errors=True)
                for sroot in sroots:
                    shutil.rmtree(sroot, ignore_errors=True)
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
            # the journal is durable: the transaction is COMMITTED from
            # here on — a failure below must complete, never unwind
            try:
                for mt, staged, removes in entries:
                    added = [n for _, names in staged for n in names]
                    removed = set(removes or ())

                    def compute(mt=mt, added=added, removed=removed):
                        live = mt._file_names()
                        return (
                            [f for f in live if f not in removed]
                            + added,
                            mt._next_meta(None, op="txn_commit"),
                        )

                    mt._commit_locked(compute, staged=list(staged))
                os.unlink(journal)
                for mt, _, _ in entries:
                    shutil.rmtree(
                        os.path.join(mt.path, "_txn_staging", txn_id),
                        ignore_errors=True,
                    )
            except Exception as exc:
                raise TxnJournaledError(
                    f"multi-table commit reached its commit point "
                    f"(journal {journal}) but a participant failed to "
                    f"publish: {exc}; recovery on next engine open "
                    "completes it"
                ) from exc

    @classmethod
    def recover_txn_journals(cls, journal_dir: str) -> list[str]:
        """Replay crashed multi-table transaction journals (called on
        engine open). A journal exists iff its transaction reached the
        commit point, so every table it names must end up committed:
        tables whose staged file names already live in the current
        manifest are done (idempotent — a crash between the last commit
        and the journal unlink replays as a no-op); the rest re-adopt
        whatever staged files remain and commit. A table whose removes
        are no longer live (a foreign writer won between crash and
        recovery) CANNOT be completed truthfully: the journal is
        renamed to ``.failed`` and a loud warning names it — the same
        orphan-resolution contract as pg's prepared transactions.
        Returns the table paths recovered."""
        import json as _json
        import warnings

        if not os.path.isdir(journal_dir):
            return []
        recovered: list[str] = []
        for f in sorted(os.listdir(journal_dir)):
            if not (f.startswith("txn-") and f.endswith(".json")):
                continue
            jpath = os.path.join(journal_dir, f)
            with open(jpath) as fh:
                payload = _json.load(fh)
            failed = False
            for t in payload["tables"]:
                mt = cls(t["path"])
                staged = [(s, list(names)) for s, names in t["staged"]]
                added = [n for _, names in staged for n in names]
                live = set(mt._file_names())
                if added and set(added) <= live:
                    continue  # this table's commit already published
                removed = set(t["removes"])
                with mt._writer_lock():
                    live = set(mt._file_names())
                    if added and set(added) <= live:
                        continue
                    if removed - live:
                        warnings.warn(
                            f"txn journal {jpath}: table {t['path']} "
                            f"cannot be completed (files "
                            f"{sorted(removed - live)} were rewritten "
                            "by a foreign commit before recovery); "
                            "journal kept as .failed for manual "
                            "resolution"
                        )
                        failed = True
                        break
                    # tolerant re-adopt: a crash mid-adopt left some
                    # files already moved into data/
                    vanished = [
                        os.path.join(scratch, name)
                        for scratch, names in staged
                        for name in names
                        if not os.path.exists(
                            os.path.join(mt.data_dir, name)
                        )
                        and not os.path.exists(os.path.join(scratch, name))
                    ]
                    if vanished:
                        # same orphan contract as the foreign-writer
                        # case: an uncompletable journal must not brick
                        # every subsequent engine open
                        warnings.warn(
                            f"txn journal {jpath}: table {t['path']} "
                            f"cannot be completed (staged files "
                            f"{sorted(vanished)} vanished before "
                            "recovery); journal kept as .failed for "
                            "manual resolution"
                        )
                        failed = True
                        break
                    for scratch, names in staged:
                        for name in names:
                            src = os.path.join(scratch, name)
                            dst = os.path.join(mt.data_dir, name)
                            if os.path.exists(dst):
                                continue
                            try:
                                os.rename(src, dst)
                            except OSError:
                                shutil.copyfile(src, dst + ".tmp")
                                os.rename(dst + ".tmp", dst)

                    def compute(mt=mt, added=added, removed=removed):
                        cur = mt._file_names()
                        return (
                            [x for x in cur if x not in removed] + added,
                            mt._next_meta(None, op="txn_commit"),
                        )

                    mt._commit_locked(compute, staged=None)
                    recovered.append(t["path"])
            if failed:
                os.rename(jpath, jpath + ".failed")
            else:
                for t in payload["tables"]:
                    for scratch, _ in t["staged"]:
                        shutil.rmtree(scratch, ignore_errors=True)
                        try:  # the per-txn _txn_staging parent
                            os.rmdir(os.path.dirname(scratch))
                        except OSError:
                            pass
                os.unlink(jpath)
        return recovered

    def replace_files(
        self,
        remove_paths: list[str],
        df: DataFrame,
        meta: dict | None = None,
    ) -> None:
        """The COW commit: swap the given live files for ``df``'s output
        in one atomic step. ``remove_paths`` are full paths as returned by
        :meth:`files` / the ``_metadata.file_path`` probe. Removal is
        LOGICAL — the files leave the manifest but stay on disk for time
        travel until :meth:`vacuum` (the Delta/Iceberg retention model).
        ``meta`` merges into the version metadata (the streaming upsert
        committer records its batch watermark atomically WITH the swap)."""
        removed = {os.path.basename(p) for p in remove_paths}
        scratch, added = self._stage(df)

        def compute():
            live = self._file_names()
            unknown = removed - set(live)
            if unknown:
                raise ValueError(
                    f"not live in current manifest: {sorted(unknown)} "
                    f"(a concurrent commit replaced them — retry the DML)"
                )
            return (
                [f for f in live if f not in removed] + added,
                self._next_meta(meta, op="replace"),
            )

        try:
            self._commit(compute, staged=(scratch, added))
        except ValueError:
            # staged files were adopted before the validation failure:
            # they are unreferenced (invisible) and vacuum reclaims them
            shutil.rmtree(scratch, ignore_errors=True)
            raise

    def compact(
        self,
        spark: SparkSession,
        target_bytes: int = 128 * 1024 * 1024,
        min_files: int = 2,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
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

        ``zorder_by`` clusters on a Morton space-filling-curve key over
        SEVERAL columns (sources/zorder.py) instead of a lexicographic
        sort: every output file then covers a compact cell of the
        multi-column space, keeping min/max tight on EACH column, so
        file-level data skipping works for probes on any of them —
        Delta's OPTIMIZE ... ZORDER BY. Mutually exclusive with
        ``cluster_by``.

        Returns the replaced file names ([] = nothing worth compacting).
        """
        if cluster_by and zorder_by:
            raise ValueError("compact: cluster_by and zorder_by are exclusive")
        if cluster_by or zorder_by:
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
        if self.column_mapping() is not None or self.partition_info():
            # evolved table: rewrite through the LOGICAL projection —
            # narrow pre-widening files unify under the wide type,
            # cluster_by names resolve, and (as in Delta) compaction
            # reclaims dropped-column bytes; _stage maps the output
            # back to physical names. Partitioned imports likewise:
            # the read materializes virtual partition columns, so the
            # compacted files carry them PHYSICALLY from then on.
            df = self.read(spark, file_paths=small)
        else:
            df = spark.read.parquet(*small)
        if cluster_by:
            from pyspark.sql import functions as F

            cols = [F.col(c) for c in cluster_by]
            df = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
        elif zorder_by:
            from sclera_spark.sources.zorder import zvalue_column

            df = (
                df.withColumn("__z", zvalue_column(df, zorder_by))
                .repartitionByRange(n_out, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            df = df.coalesce(n_out)
        self.replace_files(small, df)
        return [os.path.basename(p) for p in small]

    def reorg_purge(self, spark) -> list[str]:
        """REORG TABLE t PURGE (Delta's ``REORG ... APPLY (PURGE)``):
        rewrite EXACTLY the live files whose physical schema still
        carries a dropped column's bytes, reclaiming that space, and
        leave every clean file untouched. DROP COLUMN is a pure
        metadata tombstone (column mapping), so the bytes linger until
        this maintenance pass folds them out. One atomic
        :meth:`replace_files` commit; the pre-PURGE versions keep
        reading the old files until vacuum, so time travel still sees
        the dropped column's era intact.

        Victim detection is metadata-only: the per-file stats/null
        sidecars recorded at commit time name the physical columns they
        saw — a dead physical name there convicts the file with no I/O.
        Only files those sidecars cannot vouch for (stat-less types,
        pre-stats commits) fall back to a parquet FOOTER read — still
        no data pages, and at 100 TB the convicted-by-stats fast path
        covers every file written by this engine."""
        mapping = self.column_mapping()
        if not mapping:
            return []
        dead = {e["physical"] for e in mapping if e.get("dropped")}
        if not dead:
            return []
        import pyarrow.parquet as pq

        stats, nulls = self.file_stats(), self.file_nulls()
        victims = []
        for p in self.files():
            b = os.path.basename(p)
            seen = set(stats.get(b) or ()) | set(nulls.get(b) or ())
            if seen & dead:
                victims.append(p)
                continue
            # sidecars omit unstatable column types, so absence of the
            # dead name is not an acquittal — consult the footer schema
            try:
                names = set(pq.ParquetFile(p).schema_arrow.names)
            except Exception:
                victims.append(p)  # unreadable footer: rewrite it
                continue
            if names & dead:
                victims.append(p)
        if not victims:
            return []
        # the logical read already drops dead columns (and widens
        # narrow ones); _stage maps the output back to physical names
        out = self.read(spark, file_paths=victims)
        self.replace_files(victims, out)
        return [os.path.basename(p) for p in victims]

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
        if self.column_mapping() is not None:
            # Delta-parity refusal: data files store PHYSICAL names, so
            # an external engine reading the symlink manifest would see
            # pre-rename columns (and dead dropped-column bytes) — a
            # silent schema lie. Rewrite without mapping first
            # (CREATE TABLE ... AS SELECT) to export.
            raise ValueError(
                f"{self.path} uses column mapping (renamed/dropped/"
                "widened columns): a symlink manifest would expose the "
                "files' PHYSICAL schema to external readers. "
                "Materialize an unmapped copy to export."
            )
        if self.partition_info() is not None:
            raise ValueError(
                f"{self.path} carries virtual partition columns "
                "(partitioned Delta import): their values live in the "
                "manifest meta, not the parquet bytes, so an external "
                "reader of a symlink manifest would silently miss "
                "them. Materialize a copy (CREATE TABLE ... AS SELECT) "
                "to export."
            )
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

    def export_delta_log(self, spark, out_dir: str | None = None) -> str:
        """See :meth:`_export_delta_log_locked`. Runs under the writer
        lock (r12): the mirror vacuum and concurrent post-commit mirror
        refreshes must not interleave — a freshly hard-linked data file
        whose log entry has not landed yet would otherwise look
        unreferenced to the vacuum and get unlinked."""
        with self._writer_lock():
            return self._export_delta_log_locked(spark, out_dir)

    def _export_delta_log_locked(
        self, spark, out_dir: str | None = None
    ) -> str:
        """Ecosystem interop, the write half of ``FROM DELTA`` (r11):
        emit the CURRENT snapshot as a public Delta Lake ``_delta_log``
        — one version-0 JSON commit with ``protocol``, ``metaData``
        (schemaString is the Spark StructType JSON, exactly Delta's
        format) and one ``add`` per live file carrying relative path,
        size, and the Delta per-file ``stats`` string (numRecords /
        minValues / maxValues / nullCount — lifted straight from the
        manifest's own skipping sidecars, so an external Delta reader
        data-skips exactly like we do). Any Delta-protocol reader
        (delta-spark, Trino, DuckDB delta) pointed at the table
        directory reads exactly the committed snapshot — staged or
        orphaned part files stay invisible.

        Partitioned imports round-trip: the virtual partition columns'
        per-file values go back out as ``partitionValues`` (where the
        public log carries them) and the columns join
        ``partitionColumns`` in metaData. Column-mapped (evolved)
        tables export the PUBLIC columnMapping.mode=name form — field
        ids + physicalName metadata in the schemaString, protocol
        reader 2 / writer 5 — so external readers project physical to
        logical exactly as this engine does (and stats keys stay
        physical, per the spec).

        Re-exports are INCREMENTAL (r11): a second export into the
        same directory appends one diff commit (remove/add of changed
        files, metaData only when the schema changed, metaData id
        stable) — an external Delta reader following the directory
        sees the table evolve as a live mirror. A log containing
        commits this exporter did not write refuses. Pure driver
        metadata at any table size: no data job except the one schema
        read. Returns the commit file path (the PRIOR one when
        nothing changed — no empty commits)."""
        import time as _time

        mapping = self.column_mapping()
        protocol = {"minReaderVersion": 1, "minWriterVersion": 2}
        configuration: dict = {}
        pinfo = self.partition_info()
        part_cols = [p["name"] for p in pinfo[0]] if pinfo else []
        if mapping is not None:
            # evolved table: emit the PUBLIC columnMapping form — each
            # live field carries its id + physicalName in the
            # schemaString metadata, configuration declares mode=name,
            # and the protocol floor rises to the spec's requirement
            # (reader 2 / writer 5). Dropped entries are simply absent,
            # exactly as Delta leaves dead bytes unlisted; a mapped
            # import of this export re-tombstones them from footers.
            protocol = {"minReaderVersion": 2, "minWriterVersion": 5}
            configuration = {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": str(
                    max(e["id"] for e in mapping)
                ),
            }
            fields = [
                {
                    "name": e["name"],
                    "type": e["type"],
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": e["id"],
                        "delta.columnMapping.physicalName": e["physical"],
                    },
                }
                for e in mapping
                if not e.get("dropped")
            ]
            schema_json = json.dumps(
                {"type": "struct", "fields": fields}
            )
        else:
            # the stored table_schema (ADD COLUMN evolution, imported
            # schemaString) IS a valid Delta schemaString; only tables
            # whose schema lives purely in the files read it via Spark
            # (lazily — see the no-op fast path)
            try:
                schema_json = self.meta().get("table_schema")
            except FileNotFoundError:
                schema_json = None
        out_dir = out_dir or os.path.join(self.path, "_delta_log")
        os.makedirs(out_dir, exist_ok=True)
        now_ms = int(_time.time() * 1000)
        stats, nulls, rows = (
            self.file_stats(),
            self.file_nulls(),
            self.file_rows(),
        )
        pv_meta = pinfo[1] if pinfo else {}
        if pinfo and mapping is not None:
            # public mapped logs key partitionColumns and each add's
            # partitionValues by PHYSICAL name (Delta protocol) — the
            # manifest meta holds logical names (import translated
            # them), so translate back out here
            log2phys = {
                e["name"]: e["physical"]
                for e in mapping
                if not e.get("dropped")
            }
            part_cols = [log2phys.get(c, c) for c in part_cols]
            pv_meta = {
                b: {log2phys.get(c, c): v for c, v in d.items()}
                for b, d in pv_meta.items()
            }
        if pinfo:
            mixed = [
                b for b in self._file_names() if b not in pv_meta
            ]
            if mixed:
                # post-import DML/compaction rewrote these files: they
                # carry the partition columns PHYSICALLY and have no
                # log values. The public Delta layout keeps partition
                # values in the log ONLY — an external reader would
                # fill NULLs for these files. Refuse the silent lie.
                raise ValueError(
                    f"{self.path}: {len(mixed)} file(s) carry the "
                    "partition columns physically (rewritten after the "
                    "partitioned import) — a Delta log cannot describe "
                    "this mixed layout truthfully. Materialize a copy "
                    "(CREATE TABLE ... AS SELECT) to export."
                )
        # incremental mirror (r11): when this table already exported a
        # log here, APPEND a diff commit instead of rewriting version 0
        # — an external Delta reader following the directory sees the
        # table evolve, with a STABLE metaData id across exports (an id
        # change would read as a different table). Only logs this
        # method wrote replay: EVERY commit must carry the SCLERA
        # EXPORT commitInfo marker (commitInfo is spec-OPTIONAL, so a
        # minimal foreign writer's log without one must refuse too, not
        # be silently adopted and corrupted). Replay starts from our
        # own _last_checkpoint when present, so refresh cost is bounded
        # by the checkpoint interval, not table lifetime.
        prev_version = -1
        prev_live: set[str] = set()
        prev_schema: str | None = None
        prev_id: str | None = None
        prev_protocol: dict | None = None
        prev_source_version: int | None = None
        ckpt_base = -1
        ckpt_file = os.path.join(out_dir, "_last_checkpoint")
        if os.path.isfile(ckpt_file):
            with open(ckpt_file) as fh:
                ck = json.load(fh)
            if not ck.get("sclera_export") or os.path.realpath(
                ck.get("source_path") or ""
            ) != os.path.realpath(self.path):
                raise ValueError(
                    f"{out_dir} carries a checkpoint this exporter did "
                    "not write for THIS table; refusing to append to a "
                    "foreign Delta log"
                )
            ckpt_base = int(ck["version"])
            if ck.get("source_version") is not None:
                prev_source_version = int(ck["source_version"])
            import pyarrow.parquet as pq

            cpath = os.path.join(
                out_dir, f"{ckpt_base:020d}.checkpoint.parquet"
            )
            pf = pq.ParquetFile(cpath)
            for batch in pf.iter_batches(
                columns=[
                    c
                    for c in ("add", "metaData", "protocol")
                    if c in pf.schema_arrow.names
                ]
            ):
                for row in batch.to_pylist():
                    add = row.get("add")
                    if add and add.get("path"):
                        prev_live.add(add["path"])
                    md = row.get("metaData")
                    if md and md.get("schemaString"):
                        prev_schema = md["schemaString"]
                        prev_id = md.get("id")
                    pr = row.get("protocol")
                    if pr and pr.get("minReaderVersion") is not None:
                        prev_protocol = {
                            "minReaderVersion": pr["minReaderVersion"],
                            "minWriterVersion": pr["minWriterVersion"],
                        }
            prev_version = ckpt_base
        for f in sorted(os.listdir(out_dir)):
            if not (f.endswith(".json") and f[:-5].isdigit()):
                continue
            v = int(f[:-5])
            if v <= ckpt_base:
                continue
            marked = False
            with open(os.path.join(out_dir, f)) as fh:
                for ln in fh:
                    ln = ln.strip()
                    if not ln:
                        continue
                    a = json.loads(ln)
                    if "add" in a:
                        prev_live.add(a["add"]["path"])
                    elif "remove" in a:
                        prev_live.discard(a["remove"]["path"])
                    elif "metaData" in a:
                        prev_schema = a["metaData"]["schemaString"]
                        prev_id = a["metaData"].get("id")
                    elif "protocol" in a:
                        prev_protocol = a["protocol"]
                    elif "commitInfo" in a:
                        ci = a["commitInfo"]
                        params = ci.get("operationParameters") or {}
                        src = params.get("sourcePath")
                        ours = ci.get("operation") == "SCLERA EXPORT" and (
                            # pre-sourcePath exports pass; a DIFFERENT
                            # table's mirror in the same directory must
                            # refuse, not get diffed away (realpath:
                            # a symlinked warehouse spelling must not
                            # freeze a table out of its OWN mirror)
                            src is None
                            or os.path.realpath(src)
                            == os.path.realpath(self.path)
                        )
                        if not ours:
                            marked = False
                            break  # ANY foreign commitInfo refuses
                        marked = True
                        sv = params.get("sourceVersion")
                        if sv is not None:
                            prev_source_version = int(sv)
            if not marked:
                raise ValueError(
                    f"{out_dir} contains commit {f} this exporter did "
                    "not write for THIS table (no matching SCLERA "
                    "EXPORT commitInfo); refusing to append to a "
                    "foreign Delta log"
                )
            prev_version = max(prev_version, v)

        def _add_action(p: str) -> dict:
            b = os.path.basename(p)
            add = {
                "path": f"data/{b}",
                "partitionValues": {
                    c: None if v is None else str(v)
                    for c, v in (pv_meta.get(b) or {}).items()
                },
                "size": os.path.getsize(p),
                "modificationTime": now_ms,
                "dataChange": True,
            }
            if b in rows:
                st = {
                    "numRecords": rows[b],
                    "minValues": {
                        c: v[0] for c, v in (stats.get(b) or {}).items()
                    },
                    "maxValues": {
                        c: v[1] for c, v in (stats.get(b) or {}).items()
                    },
                    "nullCount": dict(nulls.get(b) or {}),
                }
                add["stats"] = json.dumps(st)
            return {"add": add}

        live_paths = {
            f"data/{os.path.basename(p)}": p for p in self.files()
        }

        def _schema_differs() -> bool:
            if prev_schema is None or schema_json is None:
                return prev_schema != schema_json
            try:  # structural compare: dumps formatting differs between
                # pyspark's StructType.json() and our json.dumps
                return json.loads(prev_schema) != json.loads(schema_json)
            except ValueError:
                return prev_schema != schema_json

        if prev_version >= 0 and set(live_paths) == prev_live:
            if (
                prev_source_version is not None
                and prev_source_version == self.version()
            ):
                # literally nothing committed since the last export
                return os.path.join(out_dir, f"{prev_version:020d}.json")
            # metadata-only commits happened since the export (files
            # unchanged, version moved): the schema may have changed —
            # e.g. RESTORE undoing an ADD COLUMN — so verify for real
            # before trusting the shortcut
            if schema_json is None:
                schema_json = self.read(spark).schema.json()
            if not _schema_differs() and prev_protocol == protocol:
                return os.path.join(out_dir, f"{prev_version:020d}.json")
        if schema_json is None:
            schema_json = self.read(spark).schema.json()
        lines: list[str] = []
        meta_id = prev_id or uuid.uuid4().hex
        if prev_version < 0 or prev_protocol != protocol:
            # v0, or the table evolved to column mapping after the
            # first export: the protocol floor must rise WITH the
            # mapped metaData or readers reject/misread the log
            lines.append(json.dumps({"protocol": protocol}))
        if prev_version < 0 or _schema_differs():
            lines.append(
                json.dumps(
                    {
                        "metaData": {
                            "id": meta_id,
                            "format": {
                                "provider": "parquet", "options": {},
                            },
                            "schemaString": schema_json,
                            "partitionColumns": part_cols,
                            "configuration": configuration,
                            "createdTime": now_ms,
                        }
                    }
                )
            )
        for rel in sorted(prev_live - set(live_paths)):
            lines.append(
                json.dumps(
                    {
                        "remove": {
                            "path": rel,
                            "deletionTimestamp": now_ms,
                            "dataChange": True,
                        }
                    }
                )
            )
        added_rels = sorted(set(live_paths) - prev_live)
        for rel in added_rels:
            lines.append(json.dumps(_add_action(live_paths[rel])))
        version = prev_version + 1
        if prev_version >= 0 and not lines:
            # nothing changed since the last export: no empty commit
            return os.path.join(out_dir, f"{prev_version:020d}.json")
        data_root = os.path.dirname(os.path.abspath(out_dir))
        if os.path.realpath(data_root) != os.path.realpath(self.path):
            # custom mirror directory: the add paths are RELATIVE to
            # the log's parent, so the data files must exist there —
            # hard-link them in (copy fallback), making the mirror a
            # self-contained Delta table
            os.makedirs(os.path.join(data_root, "data"), exist_ok=True)
            for rel in added_rels:
                dst = os.path.join(data_root, rel)
                if os.path.exists(dst):
                    continue
                try:
                    os.link(live_paths[rel], dst)
                except OSError:
                    tmp2 = dst + ".tmp"
                    shutil.copyfile(live_paths[rel], tmp2)
                    os.rename(tmp2, dst)
        lines.append(
            json.dumps(
                {
                    "commitInfo": {
                        "operation": "SCLERA EXPORT",
                        "timestamp": now_ms,
                        "operationParameters": {
                            "sourceVersion": str(self.version()),
                            "sourcePath": os.path.realpath(self.path),
                        },
                    }
                }
            )
        )
        target = os.path.join(out_dir, f"{version:020d}.json")
        tmp = target + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, target)
        if version % self._export_checkpoint_every == 0:
            # v0 included: a fresh export of a million-file table gives
            # external readers a checkpoint immediately instead of a
            # million-line JSON replay
            self._write_export_checkpoint(
                out_dir,
                version,
                protocol,
                schema_json,
                meta_id,
                part_cols,
                configuration,
                live_paths,
                _add_action,
            )
        return target

    # every Nth exported commit folds the replayed state into a Delta
    # checkpoint: refresh cost and external-reader open cost stay
    # bounded by the interval instead of growing with table lifetime
    _export_checkpoint_every = 10

    def _write_export_checkpoint(
        self,
        out_dir: str,
        version: int,
        protocol: dict,
        schema_json: str,
        meta_id: str,
        part_cols: list,
        configuration: dict,
        live_paths: dict,
        add_action,
    ) -> None:
        """Single-part Delta checkpoint for the exported log at
        ``version`` (the public ``{v:020d}.checkpoint.parquet`` +
        ``_last_checkpoint`` layout import_delta already consumes):
        one protocol row, one metaData row, one add row per live file.
        Best-effort — a failure leaves the JSON commits authoritative
        and the next multiple-of-N export retries."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            pv_t = pa.map_(pa.string(), pa.string())
            add_t = pa.struct(
                [
                    ("path", pa.string()),
                    ("partitionValues", pv_t),
                    ("size", pa.int64()),
                    ("modificationTime", pa.int64()),
                    ("dataChange", pa.bool_()),
                    ("stats", pa.string()),
                ]
            )
            md_t = pa.struct(
                [
                    ("id", pa.string()),
                    (
                        "format",
                        pa.struct(
                            [
                                ("provider", pa.string()),
                                (
                                    "options",
                                    pa.map_(pa.string(), pa.string()),
                                ),
                            ]
                        ),
                    ),
                    ("schemaString", pa.string()),
                    ("partitionColumns", pa.list_(pa.string())),
                    ("createdTime", pa.int64()),
                    ("configuration", pa.map_(pa.string(), pa.string())),
                ]
            )
            pr_t = pa.struct(
                [
                    ("minReaderVersion", pa.int32()),
                    ("minWriterVersion", pa.int32()),
                ]
            )
            adds = []
            for rel in sorted(live_paths):
                a = add_action(live_paths[rel])["add"]
                adds.append(
                    {
                        "path": a["path"],
                        "partitionValues": list(
                            (a.get("partitionValues") or {}).items()
                        ),
                        "size": a["size"],
                        "modificationTime": a["modificationTime"],
                        # per the protocol, checkpoint adds carry
                        # dataChange=false (replays must not feed CDC)
                        "dataChange": False,
                        "stats": a.get("stats"),
                    }
                )
            n = len(adds) + 2
            tbl = pa.table(
                {
                    "protocol": pa.array(
                        [protocol] + [None] * (n - 1), type=pr_t
                    ),
                    "metaData": pa.array(
                        [
                            None,
                            {
                                "id": meta_id,
                                "format": {
                                    "provider": "parquet",
                                    "options": [],
                                },
                                "schemaString": schema_json,
                                "partitionColumns": list(part_cols),
                                "createdTime": 0,
                                "configuration": list(
                                    configuration.items()
                                ),
                            },
                        ]
                        + [None] * (n - 2),
                        type=md_t,
                    ),
                    "add": pa.array([None, None] + adds, type=add_t),
                }
            )
            cpath = os.path.join(
                out_dir, f"{version:020d}.checkpoint.parquet"
            )
            pq.write_table(tbl, cpath + ".tmp")
            os.replace(cpath + ".tmp", cpath)
            lc = os.path.join(out_dir, "_last_checkpoint")
            with open(lc + ".tmp", "w") as fh:
                json.dump(
                    {
                        "version": version,
                        "size": n,
                        "sclera_export": True,
                        "source_path": os.path.realpath(self.path),
                        "source_version": self.version(),
                    },
                    fh,
                )
            os.replace(lc + ".tmp", lc)
        except Exception:
            # checkpointing is an optimization, never a commit gate
            pass

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Delete data files unreferenced by the ``keep_versions`` newest
        manifests (and drop older manifests). Returns deleted file names.
        Takes the writer lock: a concurrent commit must not publish a
        manifest referencing files vacuum is deciding to delete.

        A configured CUSTOM-directory Delta mirror (SET DELTA MIRROR
        '<dir>') hard-links every exported data file into <dir>/data;
        without retention those links outlive the source vacuum and the
        mirror grows without bound (r11 ADVICE). Vacuum therefore also
        vacuums the mirror: files referenced neither by the mirror
        log's CURRENT version nor by any retained source version are
        unlinked — external time travel past retention breaks, exactly
        as Delta's own VACUUM contract says it must."""
        with self._writer_lock():
            deleted = self._vacuum_locked(keep_versions)
            # inside the lock: a concurrent commit's mirror refresh
            # (export_delta_log, also lock-guarded as of r12) cannot
            # hard-link a new file between our keep-set computation and
            # the unlink pass
            try:
                self.vacuum_mirror()
            except Exception as exc:  # mirror hygiene never fails vacuum
                warn_mirror_failure(self.path, exc)
        return deleted

    @staticmethod
    def _export_live_paths(out_dir: str) -> set[str]:
        """The CURRENT live add paths of an exported Delta log: replay
        our own checkpoint (if any) plus the json commits above it —
        adds minus removes. Used by the mirror vacuum, which must keep
        every file the mirror's latest version still references even
        when the mirror is stale."""
        live: set[str] = set()
        ckpt_base = -1
        ckpt_file = os.path.join(out_dir, "_last_checkpoint")
        if os.path.isfile(ckpt_file):
            with open(ckpt_file) as fh:
                ck = json.load(fh)
            ckpt_base = int(ck["version"])
            import pyarrow.parquet as pq

            cpath = os.path.join(
                out_dir, f"{ckpt_base:020d}.checkpoint.parquet"
            )
            pf = pq.ParquetFile(cpath)
            if "add" in pf.schema_arrow.names:
                for batch in pf.iter_batches(columns=["add"]):
                    for row in batch.to_pylist():
                        add = row.get("add")
                        if add and add.get("path"):
                            live.add(add["path"])
        for f in sorted(os.listdir(out_dir)):
            if not (f.endswith(".json") and f[:-5].isdigit()):
                continue
            if int(f[:-5]) <= ckpt_base:
                continue
            with open(os.path.join(out_dir, f)) as fh:
                for ln in fh:
                    ln = ln.strip()
                    if not ln:
                        continue
                    a = json.loads(ln)
                    if "add" in a:
                        live.add(a["add"]["path"])
                    elif "remove" in a:
                        live.discard(a["remove"]["path"])
        return live

    def vacuum_mirror(self) -> list[str]:
        """Unlink custom-mirror data files referenced neither by the
        mirror log's current version nor by any RETAINED source version
        (call after the source vacuum dropped old manifests). Returns
        the unlinked file names; a no-op for tables without a
        custom-directory mirror."""
        try:
            cfg = self.meta().get("delta_mirror")
        except FileNotFoundError:
            return []
        if not isinstance(cfg, str) or not cfg:
            return []
        out_dir = (
            cfg
            if os.path.basename(cfg.rstrip("/")) == "_delta_log"
            else os.path.join(cfg, "_delta_log")
        )
        if not os.path.isdir(out_dir):
            return []
        data_root = os.path.dirname(os.path.abspath(out_dir))
        if os.path.realpath(data_root) == os.path.realpath(self.path):
            return []  # in-place mirror: adds point at the table's own files
        ddir = os.path.join(data_root, "data")
        if not os.path.isdir(ddir):
            return []
        keep = self._export_live_paths(out_dir)
        for v in self.versions():
            keep |= {
                f"data/{os.path.basename(p)}" for p in self.files(v)
            }
        removed = []
        for f in sorted(os.listdir(ddir)):
            if f"data/{f}" in keep or f.endswith(".tmp"):
                continue
            try:
                os.unlink(os.path.join(ddir, f))
                removed.append(f)
            except FileNotFoundError:
                pass
        return removed

    def mirror_status(self) -> dict | None:
        """Staleness of the configured Delta mirror, as pure driver
        metadata (r13, VERDICT task 6 — psql-visible refresh lag):
        the mirror's latest exported Delta version, the SOURCE version
        it captured (commitInfo.operationParameters.sourceVersion, the
        linkage every SCLERA EXPORT commit records), the table's
        current version, and their difference as ``lag`` (0 = fresh;
        None = a pre-sourceVersion export whose lag is unknowable).
        Returns None when no mirror is configured."""
        try:
            cfg = self.meta().get("delta_mirror")
        except FileNotFoundError:
            return None
        if not cfg:
            return None
        if isinstance(cfg, str):
            out_dir = (
                cfg
                if os.path.basename(cfg.rstrip("/")) == "_delta_log"
                else os.path.join(cfg, "_delta_log")
            )
        else:
            out_dir = os.path.join(self.path, "_delta_log")
        current = self.version()
        status = {
            "mirror_dir": out_dir,
            "mirror_version": None,
            "source_version": None,
            "current_version": current,
            "lag": None,
        }
        if not os.path.isdir(out_dir):
            return status  # configured but never exported
        latest = -1
        for f in os.listdir(out_dir):
            if f.endswith(".json") and f[:-5].isdigit():
                latest = max(latest, int(f[:-5]))
        if latest < 0:
            return status
        status["mirror_version"] = latest
        with open(os.path.join(out_dir, f"{latest:020d}.json")) as fh:
            for ln in fh:
                ln = ln.strip()
                if not ln:
                    continue
                a = json.loads(ln)
                ci = a.get("commitInfo")
                if ci and ci.get("operation") == "SCLERA EXPORT":
                    sv = (ci.get("operationParameters") or {}).get(
                        "sourceVersion"
                    )
                    if sv is not None:
                        status["source_version"] = int(sv)
                        status["lag"] = current - int(sv)
        return status

    def vacuum_mirror_directed(self) -> list[str]:
        """The standalone form of the mirror vacuum (``VACUUM t
        MIRROR`` — r13): lock-guarded like the vacuum()-embedded call,
        so a concurrent post-commit mirror refresh can never hard-link
        a file between the keep-set computation and the unlink pass."""
        with self._writer_lock():
            return self.vacuum_mirror()

    def vacuum_preview(self, keep_versions: int = 1) -> list[str]:
        """DRY RUN: the data files a ``vacuum(keep_versions)`` would
        delete right now, without deleting anything (claims above the
        pointer are left alone too — a preview must have no side
        effects, so files referenced ONLY by an orphan claim are listed
        as deletable exactly as the real vacuum would treat them after
        clearing it). Same lock, same referenced-set computation."""
        import time as _time

        with self._writer_lock():
            latest = self.version()
            now = _time.time()
            protected: list[int] = []
            for f in os.listdir(self.log_dir):
                if (
                    f.startswith("v")
                    and f.endswith(".json")
                    and int(f[1:-5]) > latest
                ):
                    p = os.path.join(self.log_dir, f)
                    try:
                        age = now - os.path.getmtime(p)
                    except FileNotFoundError:
                        continue
                    if age < self._orphan_claim_ttl:
                        protected.append(int(f[1:-5]))
            vs = self.versions()
            referenced: set[str] = set()
            for v in vs[-keep_versions:] + protected:
                referenced |= {
                    os.path.basename(p) for p in self.files(v)
                }
            return sorted(
                f
                for f in os.listdir(self.data_dir)
                if f not in referenced
            )

    # Minimum age (seconds, by claim-file mtime) before vacuum treats a
    # claim above LATEST as a crashed orphan and deletes it. Local tables
    # vacuum inside the flock, so any claim seen there is provably dead
    # (0 = delete immediately). CAS tables have no lock: a claim may
    # belong to a LIVE foreign writer whose CAS is about to succeed, so
    # claims younger than the TTL — and the data files they reference —
    # are left alone (the object-store log-store retention rule).
    _orphan_claim_ttl = 0.0

    def _vacuum_locked(self, keep_versions: int) -> list[str]:
        import time as _time

        # clear orphan claims first (crashed commits above LATEST), so
        # their staged-but-never-committed data files become deletable;
        # claims younger than _orphan_claim_ttl may be live foreign
        # writers (CAS tables) — keep them AND protect their files
        latest = self.version()
        now = _time.time()
        live_claims: list[int] = []
        for f in os.listdir(self.log_dir):
            if f.startswith("v") and f.endswith(".json") and int(f[1:-5]) > latest:
                p = os.path.join(self.log_dir, f)
                try:
                    age = now - os.path.getmtime(p)
                except FileNotFoundError:
                    continue
                if age >= self._orphan_claim_ttl:
                    os.remove(p)
                else:
                    live_claims.append(int(f[1:-5]))
        vs = self.versions()
        keep = vs[-keep_versions:]
        referenced: set[str] = set()
        for v in keep + live_claims:
            referenced |= {os.path.basename(p) for p in self.files(v)}
        deleted = []
        for f in os.listdir(self.data_dir):
            if f not in referenced:
                os.remove(os.path.join(self.data_dir, f))
                deleted.append(f)
        # Delta-log retention: every delta's base is its predecessor, so
        # each retained version's chain passes THROUGH the oldest
        # retained version. Materializing that one as a full snapshot
        # (same resolved content, mtime preserved for DESCRIBE HISTORY)
        # severs every retained chain cleanly — the log files below it
        # can then go, and versions() keeps meaning "time-travelable".
        if keep:
            self._materialize_snapshot(keep[0])
        for v in vs[:-keep_versions]:
            os.remove(os.path.join(self.log_dir, f"v{v}.json"))
        _purge_manifest_cache(self.log_dir)
        # bloom sidecars die with their data file
        bdir = self.bloom_dir()
        if os.path.isdir(bdir):
            for f in os.listdir(bdir):
                if f.endswith(".json") and f[: -len(".json")] not in referenced:
                    try:
                        os.remove(os.path.join(bdir, f))
                    except FileNotFoundError:
                        pass
        return deleted

    def changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """CHANGE DATA FEED: the row-level changes committed by versions
        ``from_version+1 .. to_version``, as the table's columns plus
        ``_change_type`` ('insert' | 'delete') and ``_commit_version``.
        Derived from the log's file deltas — no stored change files:
        per commit, only its ADDED and REMOVED files are read, and a
        multiset ``exceptAll`` each way cancels rows a COW rewrite
        carried over unchanged (an OPTIMIZE therefore feeds NOTHING).
        Cost is O(changed files) per commit regardless of table size;
        an UPDATE surfaces as a delete of the old row plus an insert of
        the new one (a file-delta log cannot pair pre/post images the
        way Delta's stored CDF does — documented, not hidden).

        Every version in the range (and ``from_version`` itself, as the
        diff base) must still be retained; a vacuumed gap raises with
        remediation instead of silently skipping changes."""
        from pyspark.sql import functions as F

        latest = self.version()
        to_v = latest if to_version is None else to_version
        if not from_version <= to_v <= latest:
            raise ValueError(
                f"changes({from_version}, {to_version}): need "
                f"from_version <= to_version <= {latest}"
            )
        retained = set(self.versions())
        need = set(range(max(from_version, 1), to_v + 1))
        missing = sorted(need - retained)
        if missing:
            raise ValueError(
                f"versions {missing} of {self.path} are no longer "
                "retained (VACUUM dropped them): their changes cannot "
                "be replayed. Start from a retained version "
                f"(SHOW VERSIONS lists {sorted(retained)})."
            )
        schema = self.read(spark, version=to_v).schema
        out: DataFrame | None = None
        prev = (
            set()
            if from_version < 1
            else set(self._manifest(from_version)["files"])
        )
        for v in range(from_version + 1, to_v + 1):
            cur = set(self._manifest(v)["files"])
            added = sorted(cur - prev)
            removed = sorted(prev - cur)
            prev = cur
            if not added and not removed:
                continue
            a_df = r_df = None
            if added:
                a_df = self.read(
                    spark,
                    version=to_v,  # end-version column mapping (CDC
                    # reads the whole range under the latest names)
                    file_paths=[
                        os.path.join(self.data_dir, n) for n in added
                    ],
                    schema=schema,
                )
            if removed:
                r_df = self.read(
                    spark,
                    version=to_v,
                    file_paths=[
                        os.path.join(self.data_dir, n) for n in removed
                    ],
                    schema=schema,
                )
            if a_df is not None and r_df is not None:
                ins, dels = a_df.exceptAll(r_df), r_df.exceptAll(a_df)
            elif a_df is not None:
                ins, dels = a_df, None
            else:
                ins, dels = None, r_df
            for df, kind in ((ins, "insert"), (dels, "delete")):
                if df is None:
                    continue
                step = (
                    df.withColumn("_change_type", F.lit(kind))
                    .withColumn("_commit_version", F.lit(v).cast("long"))
                    .withColumn(
                        "_commit_timestamp",
                        F.lit(self._commit_ts(v)).cast("timestamp"),
                    )
                )
                out = step if out is None else out.unionByName(step)
        if out is None:
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                StructType,
                TimestampType,
            )

            empty = StructType(
                list(schema.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                    StructField("_commit_timestamp", TimestampType()),
                ]
            )
            return spark.createDataFrame([], empty)
        return out

    def _commit_ts(self, v: int):
        """A version's commit wall time as a naive UTC datetime (the
        log file's mtime — written once; vacuum's snapshot
        materialization preserves it)."""
        import datetime as _dt

        try:
            mt = os.path.getmtime(os.path.join(self.log_dir, f"v{v}.json"))
        except OSError:
            return None
        return _dt.datetime.fromtimestamp(mt, _dt.timezone.utc).replace(
            tzinfo=None
        )

    def version_at_timestamp(self, ts_epoch: float) -> int:
        """The newest RETAINED version committed at or before the given
        UTC epoch time (TIMESTAMP AS OF — Delta's timestamp travel).
        Commit times are the version files' mtimes, written once at
        commit; vacuum's snapshot materialization preserves them. Loud
        errors when the time predates the oldest retained commit."""
        best = None
        for v in self.versions():
            try:
                mt = os.path.getmtime(
                    os.path.join(self.log_dir, f"v{v}.json")
                )
            except FileNotFoundError:
                continue
            if mt <= ts_epoch and (best is None or v > best):
                best = v
        if best is None:
            raise ValueError(
                f"no retained version of {self.path} existed at or "
                "before the requested timestamp (older versions may "
                "have been vacuumed; SHOW VERSIONS lists what remains)"
            )
        return best

    def restore(self, version: int) -> int:
        """RESTORE the table to a retained earlier version (Delta's
        ``RESTORE TABLE ... TO VERSION AS OF``): commit that version's
        file list AND metadata as a NEW version — history only moves
        forward, nothing is rewritten, and the undone state stays
        time-travel readable until vacuum. Because manifests name
        immutable files, this is a pure metadata commit at any table
        size: no data file is touched. Returns the new version."""
        if version not in self.versions():
            raise ValueError(
                f"version {version} of {self.path} is not retained "
                f"(SHOW VERSIONS lists {self.versions()}); vacuumed "
                "versions cannot be restored"
            )
        snap = load_manifest(self.log_dir, version)
        # the restored version's OWN meta, not a merge with current:
        # table state a later commit added (e.g. a bloom config) is
        # rolled back with the data, which is what "restore" means
        meta = dict(snap["meta"])
        meta["_op"] = "restore"
        meta["restored_from"] = version
        self._commit(lambda: (list(snap["files"]), meta))
        return self.version()

    def clone(self, path: str, version: int | None = None) -> "ManifestTable":
        """Zero-copy CLONE of a retained version into a NEW manifest
        table at ``path`` (the Delta shallow-clone shape, upgraded:
        data files are HARD-LINKED, so on one filesystem the clone
        keeps its bytes alive even if the source is vacuumed — no
        dangling-reference failure mode; a cross-device clone falls
        back to symlink, then copy, like import_symlink). Costs
        O(files) metadata, not O(bytes). The clone starts its own
        history at version 1 and is fully independent for DML."""
        v = self.version() if version is None else version
        if v not in self.versions():
            raise ValueError(
                f"version {v} of {self.path} is not retained; "
                "vacuumed versions cannot be cloned"
            )
        snap = load_manifest(self.log_dir, v)
        t = ManifestTable(path)
        if t.exists(path):
            raise FileExistsError(f"{path} is already a manifest table")
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.log_dir, exist_ok=True)
        for name in snap["files"]:
            src = os.path.join(self.data_dir, name)
            dst = os.path.join(t.data_dir, name)
            try:
                os.link(src, dst)
            except OSError:
                try:
                    os.symlink(os.path.abspath(src), dst)
                except OSError:
                    tmp = dst + ".tmp"
                    shutil.copyfile(src, tmp)
                    os.rename(tmp, dst)
        # bloom sidecars are immutable with their data file: hard-link
        # them too, so the clone keeps equality skipping without a
        # backfill (best-effort — a missing sidecar only disables the
        # optimization for that file)
        bdir = self.bloom_dir()
        if os.path.isdir(bdir):
            os.makedirs(t.bloom_dir(), exist_ok=True)
            for name in snap["files"]:
                src = os.path.join(bdir, name + ".json")
                if not os.path.exists(src):
                    continue
                dst = os.path.join(t.bloom_dir(), name + ".json")
                try:
                    os.link(src, dst)
                except OSError:
                    try:
                        shutil.copyfile(src, dst)
                    except OSError:
                        pass
        meta = dict(snap["meta"])
        meta["_op"] = "clone"
        meta["cloned_from"] = os.path.abspath(self.path)
        meta["cloned_version"] = v
        t._publish(1, list(snap["files"]), meta)
        return t

    def _materialize_snapshot(self, v: int) -> None:
        """Rewrite version ``v``'s log file as a full snapshot with the
        SAME resolved content (and the same mtime, which DESCRIBE
        HISTORY reports as the commit time). Called by vacuum on the
        oldest retained version so older delta bases become deletable.
        A version that is already a snapshot is left untouched."""
        mpath = os.path.join(self.log_dir, f"v{v}.json")
        with open(mpath) as fh:
            doc = json.load(fh)
        if "files" in doc:
            return
        st = os.stat(mpath)
        res = load_manifest(self.log_dir, v)
        tmp = mpath + ".snap"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": v,
                    "files": res["files"],
                    "meta": res["meta"],
                    "stats": res["stats"],
                    "nulls": res["nulls"],
                    "rows": res["rows"],
                },
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.utime(tmp, (st.st_atime, st.st_mtime))
        os.replace(tmp, mpath)

    # ---- internals ----

    def _file_names(self) -> list[str]:
        return [os.path.basename(p) for p in self.files()]

    def _stage(self, df: DataFrame) -> tuple[str, list[str]]:
        """Write ``df`` to a scratch dir under collision-free final names.
        The (slow) Spark write happens OUTSIDE the writer lock; files
        enter data/ only via :meth:`_adopt` inside the lock — so nothing
        unpublished ever sits in data/ where vacuum could eat it.

        Column-mapped tables (schema evolution) write under PHYSICAL
        names: incoming frames carry logical columns, which are aliased
        back here so footer stats / null counts / bloom sidecars stay
        keyed consistently across renames."""
        try:
            mapping = self.column_mapping()
        except FileNotFoundError:
            mapping = None  # create(): no version published yet
        if mapping:
            from pyspark.sql import functions as F

            phys = {
                e["name"].lower(): e["physical"]
                for e in mapping
                if not e.get("dropped")
            }
            unknown = [c for c in df.columns if c.lower() not in phys]
            if unknown:
                # a physical-named (or otherwise foreign) frame must
                # never be staged against the mapping: a logical name
                # that happens to equal ANOTHER column's physical name
                # would silently cross-wire the two
                raise ValueError(
                    f"stage on {self.path}: columns {unknown} are not "
                    "columns of the table (write frames under the "
                    "table's LOGICAL column names)"
                )
            df = df.select(
                [F.col(c).alias(phys[c.lower()]) for c in df.columns]
            )
        # pid in the name: scratch dirs are attributable to their
        # owning engine process (and tests can filter out dirs made by
        # concurrent runs on the same host)
        scratch = tempfile.mkdtemp(prefix=f"sclera_manifest_{os.getpid()}_")
        df.write.mode("overwrite").parquet(scratch)
        tag = uuid.uuid4().hex[:8]
        staged = []
        for i, f in enumerate(sorted(os.listdir(scratch))):
            if f.startswith("part-") and not f.endswith(".crc"):
                name = f"part-{tag}-{i:05d}.parquet"
                os.rename(os.path.join(scratch, f), os.path.join(scratch, name))
                staged.append(name)
        self._write_blooms(df.sparkSession, scratch, staged)
        return scratch, staged

    def bloom_dir(self) -> str:
        return os.path.join(self.log_dir, "blooms")

    def _write_blooms(self, spark, scratch: str, names: list[str]) -> None:
        """Per-file Bloom filter sidecars (sources/bloom.py) for the
        files being staged, when the table has a bloom configuration
        (``ALTER TABLE t SET BLOOM FILTER (...)``). One distributed
        job over the NEW data only — the Delta bloom-index cost model.
        Sidecars are immutable with their data file; an unreferenced
        sidecar (failed commit) is garbage vacuum sweeps. Any failure
        degrades to 'no filter for those files' — blooms are an
        optimization, never a commit dependency."""
        try:
            meta = self.meta()
        except Exception:
            return
        cols = meta.get("bloom_columns")
        if not cols or not names:
            return
        try:
            from sclera_spark.sources.bloom import build_blooms

            built = build_blooms(
                spark,
                [os.path.join(scratch, n) for n in names],
                cols,
                float(meta.get("bloom_fpp", 0.01)),
            )
            self.store_blooms(built)
        except Exception:
            pass

    def store_blooms(self, built: dict) -> None:
        os.makedirs(self.bloom_dir(), exist_ok=True)
        for name, bl in built.items():
            tmp = os.path.join(self.bloom_dir(), f".{name}.tmp")
            with open(tmp, "w") as fh:
                json.dump(bl, fh)
            os.replace(
                tmp, os.path.join(self.bloom_dir(), name + ".json")
            )

    def file_bloom(self, name: str) -> dict | None:
        """The sidecar filters for one data file ({column: {m,k,t,b}})
        or None — absence just means no bloom skipping for that file
        (pre-configuration files, unbloomable types, failed build)."""
        try:
            with open(os.path.join(self.bloom_dir(), name + ".json")) as fh:
                return json.load(fh)
        except (FileNotFoundError, ValueError):
            return None

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

    def _next_meta(self, override: dict | None, op: str | None = None) -> dict:
        """Merge metadata for the next commit: inherit the current
        version's meta, with explicit keys overriding (called inside the
        writer lock by every mutator). ``op`` stamps the commit KIND for
        DESCRIBE HISTORY — per-version, never inherited (the one meta
        key stripped from the base before merging)."""
        try:
            base = self.meta()
        except FileNotFoundError:
            base = {}
        base.pop("_op", None)
        out = {**base, **(override or {})}
        if op is not None and "_op" not in (override or {}):
            out["_op"] = op
        return out

    def _publish(
        self, version: int, files: list[str], meta: dict | None = None
    ) -> None:
        """Steps 2+3 of the commit protocol: claim + durable manifest,
        then the pointer swap that IS the commit (used directly only by
        create/convert, where version 1 is uncontended; mutations go
        through :meth:`_commit`'s retry loop)."""
        self._publish_claim(version, files, meta)
        self._swap_pointer(version - 1, version)

    def _publish_claim(
        self, version: int, files: list[str], meta: dict | None
    ) -> None:
        """Claim ``version`` with O_EXCL and durably write its manifest.

        Same-host writers are serialized by the flock, so a pre-existing
        v<N>.json above LATEST inside the lock can only be the orphan of
        a CRASHED commit under the single-host contract — it is healed
        with a loud warning and the commit proceeds (crash-retry must
        not require manual recovery). If the claim REAPPEARS immediately
        after healing, a live writer outside our flock's reach (another
        host — cross-host advisory locks are not part of the contract)
        is actively racing: raise ConcurrentWriterError rather than
        trade silent lost updates with it. (CasManifestTable overrides
        the conflict handling: no heal, conflicts retry via CAS.)"""
        mpath = os.path.join(self.log_dir, f"v{version}.json")
        doc = self._encode_manifest(version, files, meta)
        try:
            fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            fd = self._on_claim_conflict(version)
        with os.fdopen(fd, "w") as fh:
            json.dump(doc, fh)
            fh.flush()
            os.fsync(fh.fileno())

    # delta-chain depth cap: a full snapshot is written at least every
    # K commits, so resolving any version reads <= K+1 log files (the
    # Delta checkpoint-interval knob; Delta's default is 10 commits)
    _snapshot_every = 20

    def _encode_manifest(
        self, version: int, files: list[str], meta: dict | None
    ) -> dict:
        """Encode the manifest for ``version``: a DELTA against
        ``version - 1`` when that base resolves, the chain stays under
        the depth cap, the change set is smaller than the file list, and
        the (remove, add) pair reconstructs ``files`` EXACTLY — a full
        snapshot otherwise. Footer stats are read for the ADDED files
        only, so commit cost is O(changed files); legacy (pre-v2-stats)
        survivors are upgraded at the next snapshot commit rather than
        per-delta."""
        base = None
        if version > 1:
            try:
                base = load_manifest(self.log_dir, version - 1)
            except Exception:
                base = None  # base vacuumed/corrupt: snapshot
        if base is not None:
            base_files = base["files"]
            base_set = set(base_files)
            cur_set = set(files)
            removed = sorted(base_set - cur_set)
            added = [f for f in files if f not in base_set]
            recon = [f for f in base_files if f in cur_set] + added
            depth = base["_depth"] + 1
            if (
                recon == files
                and depth <= self._snapshot_every
                and len(added) + len(removed) < max(1, len(files))
            ):
                return {
                    "version": version,
                    "base": version - 1,
                    "depth": depth,
                    "remove": removed,
                    "add": self._delta_stats(added),
                    "meta": meta or {},
                }
        stats, nulls, rows = self._assemble_stats(files)
        return {
            "version": version,
            "files": files,
            "meta": meta or {},
            "stats": stats,
            "nulls": nulls,
            "rows": rows,
        }

    def _delta_stats(self, added: list[str]) -> list[dict]:
        """Footer stats for the files a delta commit adds (same
        per-file read `_assemble_stats` does for new files; a failed
        read degrades to a stat-less entry — pruning keeps the file and
        metadata-only answers fall back to scanning)."""
        out = []
        for name in added:
            e: dict = {"name": name}
            try:
                st, nl, nr = _parquet_minmax(
                    os.path.join(self.data_dir, name)
                )
            except Exception:
                out.append(e)
                continue
            if st:
                e["stats"] = st
            e["nulls"] = nl
            e["rows"] = nr
            out.append(e)
        return out

    def _assemble_stats(
        self, files: list[str]
    ) -> tuple[dict[str, dict], dict[str, dict], dict[str, int]]:
        """Per-file column stats for the manifest being committed:
        inherited from the current version for surviving files (stats
        are immutable with the file), computed from the parquet footer
        for files new to this commit (they are already in data/ —
        _adopt runs before the claim). Footer reads cost O(new files)
        per commit, the Delta/Iceberg stats model. Any failure degrades
        to 'no stats for that file' (pruning keeps it). Returns
        (per-file column [min, max, tag], per-file column null counts,
        per-file row counts). A prior entry is inherited only when it
        carries the v2 markers (a nulls record and type-tagged min/max);
        legacy r8 entries are re-read from the footer ONCE — the file
        still exists, the upgrade costs O(legacy files) on the first v2
        commit and nothing after."""
        prior: dict[str, dict] = {}
        prior_nulls: dict[str, dict] = {}
        prior_rows: dict[str, int] = {}
        try:
            prior = self.file_stats()
            prior_nulls = self.file_nulls()
            prior_rows = self.file_rows()
        except Exception:
            pass
        out: dict[str, dict] = {}
        nulls: dict[str, dict] = {}
        rows: dict[str, int] = {}
        for name in files:
            if (
                name in prior_nulls
                and name in prior_rows
                and all(len(e) >= 3 for e in prior.get(name, {}).values())
            ):
                if name in prior:
                    out[name] = prior[name]
                nulls[name] = prior_nulls[name]
                rows[name] = prior_rows[name]
                continue
            try:
                st, nl, nr = _parquet_minmax(
                    os.path.join(self.data_dir, name)
                )
            except Exception:
                continue
            if st:
                out[name] = st
            nulls[name] = nl
            rows[name] = nr
        return out, nulls, rows

    def _on_claim_conflict(self, version: int) -> int:
        """Local-table policy: heal the crashed orphan loudly; a claim
        that reappears right after healing is a live foreign writer."""
        import warnings

        mpath = os.path.join(self.log_dir, f"v{version}.json")
        warnings.warn(
            f"manifest version {version} at {self.path} was already "
            "claimed: healing the orphan of a crashed commit (if "
            "writers on ANOTHER host share this table, that is "
            "outside the single-host manifest contract — see the "
            "module docstring's conditional-put note)",
            stacklevel=3,
        )
        try:
            os.remove(mpath)
        except FileNotFoundError:
            pass
        try:
            return os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ConcurrentWriterError(
                f"manifest version {version} at {self.path} was "
                "re-claimed immediately after healing: a live writer "
                "on another host is racing this table (unsupported — "
                "flock is host-local; use a store with conditional-"
                "put for multi-host writers)"
            ) from None

    def _swap_pointer(self, expected: int, version: int) -> bool:
        """Advance LATEST. Local tables hold the flock, so the pointer
        cannot have moved since ``expected`` was read — an unconditional
        atomic replace; always succeeds. CAS-backed tables override this
        with the store's compare-and-swap."""
        tmp = os.path.join(self.log_dir, f".LATEST.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(self.log_dir, "LATEST"))
        return True

    def _drop_claim(self, version: int) -> None:
        try:
            os.remove(os.path.join(self.log_dir, f"v{version}.json"))
        except FileNotFoundError:
            pass


def _stat_tag(raw) -> str | None:
    """Type tag stored alongside each column's [min, max] (r9): 't' =
    timestamp, 'd' = date, 's' = string, 'n' = numeric. Canonicalization
    of bounds is driven by THIS tag, never by what a value looks like —
    a string column whose values resemble timestamps must compare as
    raw strings (regex-rewriting them broke ordering; r8 ADVICE)."""
    import datetime as _dt

    if isinstance(raw, _dt.datetime):
        return "t"
    if isinstance(raw, _dt.date):
        return "d"
    if isinstance(raw, str):
        return "s"
    if isinstance(raw, bool):
        return None
    if isinstance(raw, (int, float)):
        return "n"
    return None


def _parquet_minmax(
    path: str,
) -> tuple[dict[str, list] | None, dict[str, int], int]:
    """(top-level-column [min, max, tag], per-column exact null count,
    exact row count) from a parquet file's footer (no data read; pyarrow
    metadata only), restricted to JSON-safe scalar types. Columns whose
    row groups lack min/max (all-NULL, unsupported types) are omitted
    from stats — absence means 'cannot range-prune on this column' —
    but their null counts are still recorded when every row group
    reports one (an all-NULL file is exactly the case IS NULL pruning
    and metadata-only MIN/MAX need the null count for)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    tags: dict[str, str] = {}
    nulls: dict[str, int] = {}
    skip: set[str] = set()
    null_skip: set[str] = set()
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        for ci in range(row.num_columns):
            col = row.column(ci)
            name = col.path_in_schema
            if "." in name:
                continue  # nested leaves: not prunable top-level columns
            st = col.statistics
            if name not in null_skip:
                if st is not None and st.has_null_count:
                    nulls[name] = nulls.get(name, 0) + st.null_count
                else:
                    null_skip.add(name)
                    nulls.pop(name, None)
            if name in skip:
                continue
            if st is None or not st.has_min_max:
                skip.add(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            raw_mn, raw_mx = st.min, st.max
            if isinstance(raw_mn, bytes):
                try:
                    raw_mn, raw_mx = raw_mn.decode(), raw_mx.decode()
                except UnicodeDecodeError:
                    skip.add(name)
                    mins.pop(name, None)
                    maxs.pop(name, None)
                    continue
            tag = _stat_tag(raw_mn)
            if tag is None or tags.get(name, tag) != tag:
                skip.add(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            tags[name] = tag
            mn, mx = _canon_stat(raw_mn), _canon_stat(raw_mx)
            mins[name] = mn if name not in mins else min(mins[name], mn)
            maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    return (
        {k: [mins[k], maxs[k], tags[k]] for k in mins} or None,
        nulls,
        md.num_rows,
    )


def _canon_stat(v):
    """Canonicalize a parquet-footer statistic for JSON storage and
    ORDER-PRESERVING string comparison: dates to ISO (lexicographic ==
    chronological), timestamps to a fixed-width UTC form
    'YYYY-MM-DD HH:MM:SS.ffffff' (tz-aware converted to UTC; naive —
    parquet TIMESTAMP_NTZ — taken as-is, and probes for an NTZ column
    are tz-free too, so both sides agree). Everything else passes
    through for the existing scalar-type gate."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


_TS_RE = None

_INCOMPARABLE = object()


def _canon_bound(v, tag: str):
    """Canonicalize a pruning bound the same way stats of the column's
    TYPE are stored. The tag comes from the manifest stats entry (the
    column's parquet logical type at write time), never from what the
    bound looks like: a string column's bounds pass through raw even
    when they resemble timestamps (regex-rewriting such values is not
    order-preserving against the column's other strings — r8 ADVICE
    defect), while a timestamp column's bounds land on the fixed-width
    'YYYY-MM-DD HH:MM:SS.ffffff' form whether they arrive as datetime
    objects or 'T'-separated / short-fraction strings. Naive datetimes
    are taken as already-UTC (document at call sites). Returns
    _INCOMPARABLE when the bound's type cannot soundly compare with the
    column's stats (callers keep the file)."""
    global _TS_RE
    import datetime as _dt

    if tag == "n":
        return (
            v
            if isinstance(v, (int, float)) and not isinstance(v, bool)
            else _INCOMPARABLE
        )
    if tag == "s":
        return v if isinstance(v, str) else _INCOMPARABLE
    if tag == "d":
        if isinstance(v, _dt.datetime):
            return _INCOMPARABLE  # sub-day probe on a date column: keep
        if isinstance(v, _dt.date):
            return v.isoformat()
        return v if isinstance(v, str) else _INCOMPARABLE
    if tag == "t":
        if isinstance(v, _dt.datetime):
            return _canon_stat(v)
        if isinstance(v, _dt.date):
            return _INCOMPARABLE
        if isinstance(v, str):
            if _TS_RE is None:
                import re

                _TS_RE = re.compile(
                    r"^(\d{4}-\d{2}-\d{2})[ T](\d{2}:\d{2}:\d{2})(?:\.(\d+))?$"
                )
            m = _TS_RE.match(v)
            if m:
                frac = (m.group(3) or "")[:6].ljust(6, "0")
                return f"{m.group(1)} {m.group(2)}.{frac}"
        return _INCOMPARABLE
    return _INCOMPARABLE


class _ClaimConflict(Exception):
    """Internal: a version claim is held by a live foreign writer —
    the CAS commit loop backs off and retries."""


class MemoryCas:
    """In-process conditional-put pointer store — the test stand-in for
    an object store's If-Match/If-None-Match (S3 conditional writes,
    GCS generation preconditions, ABFS etags) or a coordination table
    (the DynamoDB commit-log pattern). One instance shared by all
    'hosts' of a table."""

    def __init__(self):
        import threading

        self._ptr: dict[str, int] = {}
        self._blobs: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def get(self, key: str) -> int | None:
        with self._lock:
            return self._ptr.get(key)

    def cas(self, key: str, expected: int | None, new: int) -> bool:
        with self._lock:
            if self._ptr.get(key) != expected:
                return False
            self._ptr[key] = new
            return True

    def delete_key(self, key: str) -> None:
        """Remove a pointer entirely (DROP TABLE of a CAS table): a
        dead pointer left behind would poison a table re-created at
        the same path."""
        with self._lock:
            self._ptr.pop(key, None)

    # ---- blob API (r14): put-if-absent intent objects for the CAS
    # multi-table transaction journal — same primitive family as the
    # pointer markers (object stores provide it natively) ----
    def put_blob_if_absent(self, key: str, data: bytes) -> bool:
        with self._lock:
            if key in self._blobs:
                return False
            self._blobs[key] = bytes(data)
            return True

    def get_blob(self, key: str) -> bytes | None:
        with self._lock:
            return self._blobs.get(key)

    def delete_blob(self, key: str) -> None:
        with self._lock:
            self._blobs.pop(key, None)

    def list_blobs(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(
                k for k in self._blobs if k.startswith(prefix)
            )


class FileCas:
    """Durable conditional-put pointer store on a shared directory — the
    in-container stand-in for an object store's conditional writes, built
    from the ONE primitive those stores actually provide: put-if-absent.

    A key's pointer value is the max over version-marker files in the
    key's subdirectory; ``cas(key, expected, expected+1)`` is an O_EXCL
    create of the ``expected+1`` marker after re-checking the current
    max. Because the manifest protocol only ever advances the pointer by
    exactly one (asserted), winning the O_EXCL create of version N is
    the unique N-1 -> N transition — two racers cannot both succeed, and
    a stale writer fails the pre-check. Crash-durable: markers are
    fsynced (file + parent dir), and a marker is never removed while it
    is the maximum.

    Object-store mapping, per method:
      * ``get``   -> LIST the key prefix, take the max version key
                     (S3 ListObjectsV2 / GCS objects.list), or read a
                     DynamoDB item's version attribute.
      * ``cas``   -> put-if-absent of the version object: S3
                     ``PutObject If-None-Match: *`` (conditional writes,
                     2024+), GCS ``ifGenerationMatch=0``, ABFS
                     ``If-None-Match: *``, or DynamoDB
                     ``attribute_not_exists`` conditional put.
    No compare-and-swap on a single mutable object is needed anywhere —
    which is exactly why the Delta/Iceberg S3 log stores use this shape.
    """

    _prune_keep = 16  # markers kept below the max (tiny files; cosmetic)

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _key_dir(self, key: str) -> str:
        import hashlib

        return os.path.join(
            self.root, hashlib.sha256(key.encode()).hexdigest()[:24]
        )

    def get(self, key: str) -> int | None:
        try:
            vs = [int(f) for f in os.listdir(self._key_dir(key)) if f.isdigit()]
        except FileNotFoundError:
            return None
        return max(vs) if vs else None

    def cas(self, key: str, expected: int | None, new: int) -> bool:
        if new != (expected or 0) + 1:
            raise ValueError(
                f"FileCas requires single-step advances (expected={expected}, "
                f"new={new}): put-if-absent of version N is only a unique "
                "transition when N == expected + 1"
            )
        if self.get(key) != expected:
            return False
        d = self._key_dir(key)
        os.makedirs(d, exist_ok=True)
        try:
            fd = os.open(os.path.join(d, str(new)), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, key.encode())  # provenance for humans/tools
            os.fsync(fd)
        finally:
            os.close(fd)
        try:  # durability of the marker's existence
            dfd = os.open(d, os.O_RDONLY)
            os.fsync(dfd)
            os.close(dfd)
        except OSError:
            pass
        # prune old markers (never the max): keeps the dir O(1)
        for f in os.listdir(d):
            if f.isdigit() and int(f) <= new - self._prune_keep:
                try:
                    os.remove(os.path.join(d, f))
                except FileNotFoundError:
                    pass
        return True

    def delete_key(self, key: str) -> None:
        """Remove a pointer entirely (DROP TABLE of a CAS table): a
        dead pointer left behind would poison a table re-created at
        the same path."""
        shutil.rmtree(self._key_dir(key), ignore_errors=True)

    # ---- blob API (r14): put-if-absent intent objects for the CAS
    # multi-table transaction journal. Object-store mapping is the
    # same conditional put as the version markers (S3 If-None-Match,
    # GCS ifGenerationMatch=0); here: O_EXCL create + fsync. Keys are
    # percent-encoded into flat filenames so list_blobs can decode
    # them back exactly. ----
    def _blob_path(self, key: str) -> str:
        import urllib.parse

        return os.path.join(
            self.root, "_blobs", urllib.parse.quote(key, safe="")
        )

    def put_blob_if_absent(self, key: str, data: bytes) -> bool:
        p = self._blob_path(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, data)
            os.fsync(fd)
        finally:
            os.close(fd)
        try:  # durability of the blob's existence
            dfd = os.open(os.path.dirname(p), os.O_RDONLY)
            os.fsync(dfd)
            os.close(dfd)
        except OSError:
            pass
        return True

    def get_blob(self, key: str) -> bytes | None:
        try:
            with open(self._blob_path(key), "rb") as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def delete_blob(self, key: str) -> None:
        try:
            os.remove(self._blob_path(key))
        except FileNotFoundError:
            pass

    def list_blobs(self, prefix: str) -> list[str]:
        import urllib.parse

        d = os.path.join(self.root, "_blobs")
        try:
            names = os.listdir(d)
        except FileNotFoundError:
            return []
        keys = [urllib.parse.unquote(n) for n in names]
        return sorted(k for k in keys if k.startswith(prefix))


def _aws_error_code(exc: Exception) -> str | None:
    """The error code of a botocore-shaped ClientError (adapters never
    import boto3 — they duck-type on the injected client and its
    exceptions, so the suite can drive them with contract-faithful
    fakes and a deployment passes a real boto3 client)."""
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        code = (resp.get("Error") or {}).get("Code")
        if code is not None:
            return str(code)
    return None


class S3Cas:
    """Conditional-put pointer store on S3 conditional writes (the
    ``If-None-Match: *`` PutObject precondition, GA since 2024 — the
    primitive that lets Delta/Iceberg run their log store on bare S3).
    Same protocol as :class:`FileCas`: a key's pointer is the max
    version object under the key's prefix; ``cas(key, expected,
    expected+1)`` is a put-if-absent of the ``expected+1`` object, so
    winning the conditional PUT is the unique N-1 -> N transition.

    ``client`` is an injected boto3-style S3 client; only four calls
    are used, so any object with these methods works:
      * ``list_objects_v2(Bucket=, Prefix=, ContinuationToken=?)`` —
        paginated; ``get`` follows ``NextContinuationToken`` (a table
        older than ~1000 commits overflows one page).
      * ``put_object(Bucket=, Key=, Body=, IfNoneMatch="*")`` — must
        raise a botocore-shaped ClientError with code
        ``PreconditionFailed`` (412) when the object exists, and may
        raise ``ConditionalRequestConflict`` (409) when conditional
        writes on the same key race — per AWS docs the outcome is then
        UNKNOWN: the PUT may or may not have been applied.
      * ``get_object(Bucket=, Key=)`` — resolves a 409's ambiguity:
        the marker body carries this call's unique writer token, so
        reading the object back answers "did MY put land?" exactly
        (token match = won; other token = lost; NoSuchKey = not yet
        decided, retry). Reporting a SUCCESSFUL commit as failed is
        not an option — the retry loop would re-apply the mutation on
        top of its own published claim.
      * ``delete_object(Bucket=, Key=)`` — marker pruning only (never
        the max; losing a delete is cosmetic).
    S3 has strong read-after-write consistency (since 2020), so the
    LIST in ``get`` observes every completed PUT — required for the
    pre-check and the 409 re-read to be sound."""

    _prune_keep = 16
    _conflict_retries = 8

    def __init__(self, client, bucket: str, prefix: str = "sclera-cas/"):
        import hashlib as _hashlib

        self.client = client
        self.bucket = bucket
        self.prefix = prefix if prefix.endswith("/") else prefix + "/"
        self._h = lambda key: _hashlib.sha256(key.encode()).hexdigest()[:24]

    def _key_prefix(self, key: str) -> str:
        return f"{self.prefix}{self._h(key)}/"

    def get(self, key: str) -> int | None:
        pfx = self._key_prefix(key)
        best: int | None = None
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": pfx}
            if token:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            for obj in resp.get("Contents", () ) or ():
                tail = obj["Key"][len(pfx):]
                if tail.isdigit():
                    v = int(tail)
                    if best is None or v > best:
                        best = v
            if not resp.get("IsTruncated"):
                return best
            token = resp.get("NextContinuationToken")

    def cas(self, key: str, expected: int | None, new: int) -> bool:
        if new != (expected or 0) + 1:
            raise ValueError(
                f"S3Cas requires single-step advances (expected={expected}, "
                f"new={new}): put-if-absent of version N is only a unique "
                "transition when N == expected + 1"
            )
        if self.get(key) != expected:
            return False
        marker = self._key_prefix(key) + str(new)
        token = uuid.uuid4().hex.encode()  # unique writer identity
        for _ in range(self._conflict_retries):
            try:
                self.client.put_object(
                    Bucket=self.bucket,
                    Key=marker,
                    Body=token,
                    IfNoneMatch="*",
                )
            except Exception as exc:
                code = _aws_error_code(exc)
                if code == "PreconditionFailed":
                    return False  # another writer owns version `new`
                if code == "ConditionalRequestConflict":
                    # concurrent conditional writes raced on this key:
                    # the outcome of OUR put is unknown. Read the
                    # marker back — the body token says whose put won.
                    won = self._owns_marker(marker, token)
                    if won is True:
                        self._prune(key, new)
                        return True
                    if won is False:
                        return False
                    continue  # marker still absent: race undecided
                raise
            else:
                self._prune(key, new)
                return True
        # persistent conflict with the marker never materializing: no
        # put (ours included) was applied, so conceding is accurate
        return False

    def _owns_marker(self, marker: str, token: bytes) -> bool | None:
        """True/False = marker exists with/without our token;
        None = marker does not exist (409 race still undecided)."""
        try:
            resp = self.client.get_object(Bucket=self.bucket, Key=marker)
        except Exception as exc:
            if _aws_error_code(exc) in ("NoSuchKey", "404"):
                return None
            raise
        body = resp["Body"]
        data = body.read() if hasattr(body, "read") else body
        return data == token

    def _prune(self, key: str, new: int) -> None:
        pfx = self._key_prefix(key)
        for v in range(max(1, new - 2 * self._prune_keep), new - self._prune_keep + 1):
            try:
                self.client.delete_object(Bucket=self.bucket, Key=f"{pfx}{v}")
            except Exception:
                pass  # pruning is cosmetic; never fail a commit on it

    def delete_key(self, key: str) -> None:
        """Remove a pointer entirely (DROP TABLE of a CAS table):
        delete every version marker under the key's prefix."""
        pfx = self._key_prefix(key)
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": pfx}
            if token:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            for obj in resp.get("Contents", ()) or ():
                try:
                    self.client.delete_object(
                        Bucket=self.bucket, Key=obj["Key"]
                    )
                except Exception:
                    pass
            if not resp.get("IsTruncated"):
                return
            token = resp.get("NextContinuationToken")

    # ---- blob API (r14): journal objects via the same conditional
    # PUT as the version markers; a 409 ambiguity resolves by reading
    # the body back (journal payloads embed a unique txn id) ----
    def _blob_key(self, key: str) -> str:
        import urllib.parse

        return f"{self.prefix}blob/{urllib.parse.quote(key, safe='')}"

    def put_blob_if_absent(self, key: str, data: bytes) -> bool:
        obj = self._blob_key(key)
        for _ in range(self._conflict_retries):
            try:
                self.client.put_object(
                    Bucket=self.bucket,
                    Key=obj,
                    Body=data,
                    IfNoneMatch="*",
                )
            except Exception as exc:
                code = _aws_error_code(exc)
                if code == "PreconditionFailed":
                    return False
                if code == "ConditionalRequestConflict":
                    won = self._owns_marker(obj, data)
                    if won is True:
                        return True
                    if won is False:
                        return False
                    continue
                raise
            else:
                return True
        return False

    def get_blob(self, key: str) -> bytes | None:
        try:
            resp = self.client.get_object(
                Bucket=self.bucket, Key=self._blob_key(key)
            )
        except Exception as exc:
            if _aws_error_code(exc) in ("NoSuchKey", "404"):
                return None
            raise
        body = resp["Body"]
        return body.read() if hasattr(body, "read") else body

    def delete_blob(self, key: str) -> None:
        try:
            self.client.delete_object(
                Bucket=self.bucket, Key=self._blob_key(key)
            )
        except Exception:
            pass

    def list_blobs(self, prefix: str) -> list[str]:
        import urllib.parse

        pfx = f"{self.prefix}blob/"
        out = []
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": pfx}
            if token:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            for o in resp.get("Contents", ()) or ():
                k = urllib.parse.unquote(o["Key"][len(pfx):])
                if k.startswith(prefix):
                    out.append(k)
            if not resp.get("IsTruncated"):
                return sorted(out)
            token = resp.get("NextContinuationToken")


class GcsCas:
    """Conditional-put pointer store on Google Cloud Storage generation
    preconditions — ``ifGenerationMatch=0`` makes an object insert
    succeed only if no live generation exists: the same put-if-absent
    primitive as S3's If-None-Match, with strong consistency and NO
    ambiguous-conflict status (a precondition failure is definitive
    412), so no writer-token read-back is needed.

    ``client`` duck-types google-cloud-storage's Client:
      * ``client.list_blobs(bucket, prefix=)`` — iterator of objects
        with ``.name`` (the real library's iterator pages internally).
      * ``client.bucket(bucket).blob(key).upload_from_string(data,
        if_generation_match=0)`` — raises an exception whose ``code``
        attribute is 412 (google.api_core PreconditionFailed shape)
        when the object already exists.
      * ``blob.delete()`` — marker pruning only (never the max)."""

    _prune_keep = 16

    def __init__(self, client, bucket: str, prefix: str = "sclera-cas/"):
        import hashlib as _hashlib

        self.client = client
        self.bucket = bucket
        self.prefix = prefix if prefix.endswith("/") else prefix + "/"
        self._h = lambda key: _hashlib.sha256(key.encode()).hexdigest()[:24]

    def _key_prefix(self, key: str) -> str:
        return f"{self.prefix}{self._h(key)}/"

    def get(self, key: str) -> int | None:
        pfx = self._key_prefix(key)
        best: int | None = None
        for blob in self.client.list_blobs(self.bucket, prefix=pfx):
            tail = blob.name[len(pfx):]
            if tail.isdigit():
                v = int(tail)
                if best is None or v > best:
                    best = v
        return best

    def cas(self, key: str, expected: int | None, new: int) -> bool:
        if new != (expected or 0) + 1:
            raise ValueError(
                f"GcsCas requires single-step advances (expected={expected}, "
                f"new={new}): put-if-absent of version N is only a unique "
                "transition when N == expected + 1"
            )
        if self.get(key) != expected:
            return False
        marker = self._key_prefix(key) + str(new)
        bucket = self.client.bucket(self.bucket)
        try:
            bucket.blob(marker).upload_from_string(
                key.encode(), if_generation_match=0
            )
        except Exception as exc:
            if getattr(exc, "code", None) == 412:
                return False  # another writer owns version `new`
            raise
        pfx = self._key_prefix(key)
        for v in range(max(1, new - 2 * self._prune_keep), new - self._prune_keep + 1):
            try:
                bucket.blob(f"{pfx}{v}").delete()
            except Exception:
                pass  # pruning is cosmetic; never fail a commit on it
        return True

    def delete_key(self, key: str) -> None:
        """Remove a pointer entirely (DROP TABLE of a CAS table)."""
        pfx = self._key_prefix(key)
        for blob in self.client.list_blobs(self.bucket, prefix=pfx):
            try:
                blob.delete()
            except Exception:
                pass

    # ---- blob API (r14): journal objects. GCS's ifGenerationMatch=0
    # is a definitive put-if-absent (no 409 ambiguity); reads add one
    # duck-typed call, blob.download_as_bytes() (404-coded exception
    # when absent). ----
    def _blob_key(self, key: str) -> str:
        import urllib.parse

        return f"{self.prefix}blob/{urllib.parse.quote(key, safe='')}"

    def put_blob_if_absent(self, key: str, data: bytes) -> bool:
        try:
            self.client.bucket(self.bucket).blob(
                self._blob_key(key)
            ).upload_from_string(data, if_generation_match=0)
        except Exception as exc:
            if getattr(exc, "code", None) == 412:
                return False
            raise
        return True

    def get_blob(self, key: str) -> bytes | None:
        try:
            return (
                self.client.bucket(self.bucket)
                .blob(self._blob_key(key))
                .download_as_bytes()
            )
        except Exception as exc:
            if getattr(exc, "code", None) == 404:
                return None
            raise

    def delete_blob(self, key: str) -> None:
        try:
            self.client.bucket(self.bucket).blob(self._blob_key(key)).delete()
        except Exception:
            pass

    def list_blobs(self, prefix: str) -> list[str]:
        import urllib.parse

        pfx = f"{self.prefix}blob/"
        out = []
        for blob in self.client.list_blobs(self.bucket, prefix=pfx):
            k = urllib.parse.unquote(blob.name[len(pfx):])
            if k.startswith(prefix):
                out.append(k)
        return sorted(out)


class DynamoCas:
    """Conditional-put pointer store on a DynamoDB coordination table —
    the commit-log pattern Delta Lake uses for S3 multi-writer support.
    Unlike the object-store adapters, DynamoDB gives a TRUE compare-and-
    swap (``ConditionExpression`` on the stored version attribute), so
    no single-step restriction is needed; the item IS the pointer.

    ``client`` is an injected boto3-style DynamoDB client; three calls:
      * ``get_item(TableName=, Key=, ConsistentRead=True)`` — the
        adapter ALWAYS passes ConsistentRead: the default eventually-
        consistent read can return a stale version, which would make
        the pre-commit snapshot check unsound (the fake in the test
        suite serves stale values to non-consistent reads to pin this).
      * ``put_item(TableName=, Item=, ConditionExpression=
        "attribute_not_exists(pk)")`` — creates version 1.
      * ``update_item(TableName=, Key=, UpdateExpression=,
        ConditionExpression="version = :exp", ...)`` — the CAS.
    Both conditional writes signal a lost race with a botocore-shaped
    ClientError code ``ConditionalCheckFailedException``.

    Table schema: partition key ``pk`` (S). One item per manifest
    table; writes are single-item and strongly consistent, so no GSI,
    no transaction API, no TTL needed."""

    def __init__(self, client, table: str):
        self.client = client
        self.table = table

    def get(self, key: str) -> int | None:
        resp = self.client.get_item(
            TableName=self.table,
            Key={"pk": {"S": key}},
            ConsistentRead=True,
        )
        item = resp.get("Item")
        if not item:
            return None
        return int(item["version"]["N"])

    def cas(self, key: str, expected: int | None, new: int) -> bool:
        try:
            if expected is None:
                self.client.put_item(
                    TableName=self.table,
                    Item={"pk": {"S": key}, "version": {"N": str(new)}},
                    ConditionExpression="attribute_not_exists(pk)",
                )
            else:
                self.client.update_item(
                    TableName=self.table,
                    Key={"pk": {"S": key}},
                    UpdateExpression="SET version = :new",
                    ConditionExpression="version = :exp",
                    ExpressionAttributeValues={
                        ":new": {"N": str(new)},
                        ":exp": {"N": str(expected)},
                    },
                )
        except Exception as exc:
            if _aws_error_code(exc) == "ConditionalCheckFailedException":
                return False
            raise
        return True

    def delete_key(self, key: str) -> None:
        """Remove a pointer entirely (DROP TABLE of a CAS table)."""
        self.client.delete_item(
            TableName=self.table, Key={"pk": {"S": key}}
        )

    # ---- blob API (r14): journal objects as items in the same
    # coordination table (pk = the blob key, data = binary attr);
    # put-if-absent is attribute_not_exists, listing is a Scan with a
    # begins_with filter (journal blobs are few and short-lived, so a
    # scan here is O(open transactions), not O(tables)) ----
    def put_blob_if_absent(self, key: str, data: bytes) -> bool:
        try:
            self.client.put_item(
                TableName=self.table,
                Item={"pk": {"S": f"blob::{key}"}, "data": {"B": data}},
                ConditionExpression="attribute_not_exists(pk)",
            )
        except Exception as exc:
            if _aws_error_code(exc) == "ConditionalCheckFailedException":
                return False
            raise
        return True

    def get_blob(self, key: str) -> bytes | None:
        resp = self.client.get_item(
            TableName=self.table,
            Key={"pk": {"S": f"blob::{key}"}},
            ConsistentRead=True,
        )
        item = resp.get("Item")
        if not item:
            return None
        b = item["data"]["B"]
        import base64

        return base64.b64decode(b) if isinstance(b, str) else bytes(b)

    def delete_blob(self, key: str) -> None:
        self.client.delete_item(
            TableName=self.table, Key={"pk": {"S": f"blob::{key}"}}
        )

    def list_blobs(self, prefix: str) -> list[str]:
        out = []
        kw = {
            "TableName": self.table,
            "FilterExpression": "begins_with(pk, :p)",
            "ExpressionAttributeValues": {
                ":p": {"S": f"blob::{prefix}"}
            },
        }
        while True:
            resp = self.client.scan(**kw)
            for item in resp.get("Items", ()) or ():
                out.append(item["pk"]["S"][len("blob::"):])
            lek = resp.get("LastEvaluatedKey")
            if not lek:
                return sorted(out)
            kw["ExclusiveStartKey"] = lek


class CasManifestTable(ManifestTable):
    """A manifest table whose COMMIT POINT is a conditional-put CAS on
    an external pointer store instead of flock + os.replace — the
    multi-host/object-store protocol the plain table's docstring
    promises. Data and manifest files live on shared storage (any
    filesystem all hosts can read; claims use put-if-absent, which
    object stores provide natively); only the pointer goes through the
    CAS. No locks anywhere: every mutation is read-compute-claim-CAS,
    and a lost CAS retries the WHOLE computation against the new
    snapshot — the optimistic-concurrency shape of the Delta/Iceberg
    object-store log stores.

    Vacuum caveat (same as those systems): physical deletion is not
    CAS-protected across hosts — run it from one maintenance owner with
    a retention window longer than any in-flight commit."""

    # a claim above the pointer may be a LIVE foreign writer's — vacuum
    # leaves claims (and their staged files) alone until this age
    _orphan_claim_ttl = 3600.0

    def __init__(self, path: str, cas):
        super().__init__(path)
        self.cas = cas  # any object with get(key) / cas(key, expected, new)
        self._key = os.path.abspath(path)

    # marker file (under _sclera_log/) recording that this table's
    # commit point is the CAS store: a fresh session/engine must never
    # run flock-path commits on it (mixing flock and CAS writers would
    # reintroduce the cross-host race the CAS protocol removes)
    MARKER = "CAS"

    @classmethod
    def is_cas_table(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, _LOG, cls.MARKER))

    def _write_marker(self) -> None:
        mp = os.path.join(self.log_dir, self.MARKER)
        if not os.path.exists(mp):
            with open(mp, "w") as fh:
                fh.write(
                    "commit point = conditional-put CAS store; do not "
                    "commit via the flock path\n"
                )

    @classmethod
    def create_cas(
        cls, df: DataFrame, path: str, cas, meta: dict | None = None
    ) -> "CasManifestTable":
        t = cls(path, cas)
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.log_dir, exist_ok=True)
        t._write_marker()
        scratch, added = t._stage(df)
        t._adopt(scratch, added)
        t._publish_claim(1, added, meta)
        if not t.cas.cas(t._key, None, 1):
            t._drop_claim(1)
            raise ConcurrentWriterError(f"{path} already created")
        try:
            # best-effort LATEST mirror (exists()/humans read it; the CAS
            # value stays the source of truth) — same as _swap_pointer
            ManifestTable._swap_pointer(t, 0, 1)
        except OSError:
            pass
        return t

    @classmethod
    def adopt(cls, path: str, cas) -> "CasManifestTable":
        """Adopt an EXISTING manifest table (or plain parquet directory)
        into CAS-committed mode: seed the store's pointer from the
        on-disk LATEST file. The upgrade is one-way and must itself be
        uncontended (run it before opening the table to multi-host
        writers — same rule as converting a Delta table's log store)."""
        if not ManifestTable.exists(path):
            ManifestTable.convert(path)
        t = cls(path, cas)
        t._write_marker()
        current = cas.get(t._key)
        if current is None:
            with open(os.path.join(t.log_dir, "LATEST")) as fh:
                disk = int(fh.read().strip())
            # seed by walking the pointer up (FileCas requires +1 steps)
            v = 0
            while v < disk and cas.cas(t._key, v if v else None, v + 1):
                v += 1
            if cas.get(t._key) != disk:
                raise ConcurrentWriterError(
                    f"{path}: CAS pointer seeded concurrently during adopt"
                )
        return t

    def version(self) -> int:
        v = self.cas.get(self._key)
        if v is None:
            raise FileNotFoundError(f"{self.path}: no CAS pointer")
        return v

    def _writer_lock(self):
        from contextlib import nullcontext

        return nullcontext()

    def _on_claim_conflict(self, version: int) -> int:
        # no flock, so a pre-existing claim may belong to a LIVE writer
        # on another host about to win the CAS — never heal; back off
        # and recompute (if the pointer advanced, the retry sees it)
        raise _ClaimConflict(version)

    def _swap_pointer(self, expected: int, version: int) -> bool:
        ok = self.cas.cas(self._key, expected, version)
        if ok:
            # best-effort mirror for humans/tools; the CAS value is the
            # source of truth (version() never reads the file)
            try:
                super()._swap_pointer(expected, version)
            except OSError:
                pass
        return ok

    # ---- multi-table transactions over CAS tables (r14, VERDICT r13
    # task 6): the intent journal becomes a put-if-absent OBJECT in the
    # CAS store itself, so the commit point lives where the pointers
    # live — crash recovery replays from the store, not a local dir ----

    @classmethod
    def commit_staged_group_cas(
        cls,
        entries: list[tuple["CasManifestTable", list, set]],
        journal_prefix: str,
    ) -> None:
        """Multi-table transaction commit where EVERY participant is a
        CAS table sharing one pointer store.

        Protocol (contrast with the flock variant
        :meth:`ManifestTable.commit_staged_group` — no locks exist, so
        version CLAIMS play the lock's role):

        1. snapshot each table's version ``v_i``, validate its
           remove-set against the live manifest at ``v_i``;
        2. adopt each table's staged bytes into ``data/`` and fsync
           them (they must be as durable as the journal object that is
           about to reference their manifests), then claim ``v_i + 1``
           via the O_EXCL manifest write (:meth:`_publish_claim`). The
           claim is the concurrency shield: every CAS writer claims
           before swapping, so while we hold all claims no foreign
           commit can advance any participant. A claim conflict or a
           moved pointer aborts the WHOLE group pre-journal (claims
           dropped, adopted files removed — nothing visible);
        3. put-if-absent the JOURNAL OBJECT into the CAS store
           (``<journal_prefix>txn-<id>``), naming every participant's
           (key, expected, target). THIS is the commit point: a crash
           after it replays from the store
           (:meth:`recover_cas_txn_journals`), a crash before it rolls
           back to nothing;
        4. CAS each pointer ``v_i -> v_i + 1`` (we hold ``v_i + 1``'s
           claim, so the swap can only race our own recovery — both
           sides treat pointer-already-at-target as success);
        5. delete the journal object.

        A crash between 2 and 3 leaves stale claims that block foreign
        writers until ``recover()`` — the same stuck-claim contract as
        a crashed single-table CAS commit. Run
        :meth:`recover_cas_txn_journals` BEFORE any manual
        ``recover()``: healing a claim that a journal still references
        would orphan a committed transaction."""
        import json as _json
        import uuid as _uuid

        if not entries:
            return
        store = entries[0][0].cas
        for mt, _, _ in entries:
            if not isinstance(mt, CasManifestTable):
                raise ValueError(
                    f"commit_staged_group_cas: {mt.path} is not a CAS "
                    "table; mixed flock+CAS groups are refused (their "
                    "commit points live in different stores)"
                )
            if mt.cas is not store:
                raise ValueError(
                    "commit_staged_group_cas: participants span two "
                    "different CAS stores; a single journal object "
                    "cannot cover both"
                )
        entries = sorted(
            entries, key=lambda e: os.path.realpath(e[0].path)
        )
        txn_id = _uuid.uuid4().hex
        planned = []  # (mt, v, files_new, adopted names)
        claimed: list[tuple["CasManifestTable", int]] = []
        adopted: list[tuple["CasManifestTable", list[str]]] = []
        try:
            for mt, staged, removes in entries:
                v = mt.version()
                live = mt._file_names()
                unknown = set(removes or ()) - set(live)
                if unknown:
                    raise ValueError(
                        f"transaction aborted: files {sorted(unknown)} "
                        f"of {mt.path} are no longer live (a concurrent "
                        "commit replaced them after this transaction's "
                        "DML was buffered — retry the transaction)"
                    )
                added = [n for _, names in staged for n in names]
                for s in staged:
                    mt._adopt(*s)
                adopted.append((mt, added))
                for n in added:
                    _fsync_tree(os.path.join(mt.data_dir, n))
                _fsync_dir(mt.data_dir)
                files_new = [
                    f for f in live if f not in set(removes or ())
                ] + added
                try:
                    mt._publish_claim(
                        v + 1,
                        files_new,
                        mt._next_meta(None, op="txn_commit"),
                    )
                except _ClaimConflict:
                    raise ConcurrentWriterError(
                        f"transaction aborted: a foreign writer holds "
                        f"the v{v + 1} claim on {mt.path} — retry the "
                        "transaction"
                    )
                # the journal object's commit-point claim requires the
                # claim MANIFEST to survive a crash: _publish_claim
                # fsyncs the file's bytes, but the directory ENTRY
                # needs its own fsync (the flock variant fsyncs its
                # dir chain the same way) — recovery re-keys a journal
                # to .failed when v{target}.json is missing
                _fsync_dir(mt.log_dir)
                claimed.append((mt, v + 1))
                if mt.version() != v:
                    raise ConcurrentWriterError(
                        f"transaction aborted: {mt.path} advanced past "
                        f"v{v} during the group claim — retry the "
                        "transaction"
                    )
                planned.append((mt, v, files_new, added))
            payload = {
                "txn": txn_id,
                "tables": [
                    {
                        "path": os.path.realpath(mt.path),
                        "key": mt._key,
                        "expected": v,
                        "target": v + 1,
                    }
                    for mt, v, _, _ in planned
                ],
            }
        except Exception:
            # pre-journal abort: nothing is visible (pointers never
            # moved). Drop our claims and the adopted-but-unreferenced
            # data files.
            _abort_cas_group(claimed, adopted)
            raise
        # Journal put — the commit point. A CLIENT-side failure here is
        # ambiguous: the object can be durable server-side (S3 put
        # timeout after success, ambiguous-409 retries exhausted
        # returning False, FileCas crash after the O_EXCL create), and
        # a concurrent recover_cas_txn_journals on another host can
        # replay a durable journal and swap pointers to v+1 — after
        # which the destructive abort would delete a LIVE claim
        # manifest and its data files. So on failure the destructive
        # abort requires PROOF, not one observation (r16, ADVICE r15):
        # a GET seeing absence does not prove a timed-out put cannot
        # land later — the key is first CLAIMED with an abort
        # tombstone (put_blob_if_absent), which makes the delayed
        # journal put unlandable; and because a durable journal may
        # already have been replayed AND deleted by recovery, the
        # participant pointers are checked last — any pointer at/past
        # target means published, so the commit rolls forward instead.
        # A foreign blob under our uuid key never references our
        # claims, so foreign occupancy also proves abort-safety.
        jkey = f"{journal_prefix}txn-{txn_id}"
        put_exc: Exception | None = None
        committed = False
        try:
            committed = store.put_blob_if_absent(
                jkey, _json.dumps(payload).encode()
            )
        except Exception as exc:  # noqa: BLE001 — re-raised below
            put_exc = exc
        if not committed:
            def _read_jkey():
                try:
                    return store.get_blob(jkey), True
                except Exception:  # noqa: BLE001 — state stays unknown
                    return None, False

            def _decode(raw):
                if raw is None:
                    return None
                try:
                    doc = _json.loads(raw.decode())
                except Exception:  # noqa: BLE001 — undecodable = foreign
                    return None
                return doc if isinstance(doc, dict) else None

            existing, read_ok = _read_jkey()
            doc = _decode(existing)
            abort_safe = False
            if doc is not None and doc.get("txn") == txn_id:
                if doc.get("abort"):
                    # OUR abort tombstone is durable (an earlier
                    # ambiguous tombstone put of this very call): the
                    # journal put can never land — abort is safe
                    abort_safe = True
                else:
                    # the put WAS durable: committed — fall through to
                    # the pointer swaps exactly as if put_blob_if_absent
                    # had returned True
                    committed = True
            elif read_ok and existing is not None:
                # a FOREIGN object holds the key (uuid collision /
                # prefix misuse): nothing of ours is journaled — the
                # destructive abort is safe
                abort_safe = True
            elif read_ok:
                # GET observed absence — but absence NOW does not prove
                # a timed-out put cannot land LATER (an S3-style PUT
                # that failed client-side can complete server-side
                # after the GET). Claim the key with an abort
                # TOMBSTONE: if the tombstone wins, the delayed journal
                # put can never land (the key is taken) and the
                # destructive abort is provably safe; if it loses, the
                # put DID land after the GET — re-read and roll
                # forward. recover_cas_txn_journals recognizes and
                # sweeps tombstones.
                tomb = _json.dumps(
                    {"txn": txn_id, "abort": True}
                ).encode()
                tomb_won = False
                try:
                    tomb_won = store.put_blob_if_absent(jkey, tomb)
                except Exception:  # noqa: BLE001 — re-read decides
                    pass
                if tomb_won:
                    abort_safe = True
                else:
                    existing, read_ok = _read_jkey()
                    doc = _decode(existing)
                    if doc is not None and doc.get("txn") == txn_id:
                        if doc.get("abort"):
                            abort_safe = True  # our tombstone landed
                        else:
                            committed = True  # the journal landed
                    elif read_ok and existing is not None:
                        abort_safe = True  # foreign
                    # else: unknown — fall through to the journaled
                    # path (claims left for recovery)
            if not committed:
                # last guard: a durable journal can have been REPLAYED
                # AND DELETED by a concurrent recover_cas_txn_journals
                # before our re-read (recovery swaps pointers, then
                # deletes the journal — so a published replay is
                # visible in the pointers). Any participant pointer
                # at/past its target means OUR version is live: roll
                # forward (the swap loop below is idempotent). An
                # unreadable pointer state forfeits abort-safety and
                # leaves the claims for recovery instead.
                try:
                    published = any(
                        (cur := mt.cas.get(mt._key)) is not None
                        and cur >= v + 1
                        for mt, v, _, _ in planned
                    )
                except Exception:  # noqa: BLE001 — state unknown
                    published = None
                if published:
                    committed = True
                elif abort_safe and published is not None:
                    _abort_cas_group(claimed, adopted)
                    if put_exc is not None:
                        raise put_exc
                    raise ConcurrentWriterError(
                        f"journal key {jkey} is unavailable (foreign "
                        "object at the key, or an abort tombstone now "
                        "blocks it) — transaction aborted"
                    )
            if not committed:
                # put failed AND the re-check could not confirm absence:
                # the journal may be durable and replayable — leave the
                # claims and adopted files in place (recovery either
                # completes the commit from the journal, or recover()
                # heals the stale claims) rather than risk deleting a
                # published version's files
                raise TxnJournaledError(
                    f"multi-table CAS commit could not confirm the "
                    f"journal object {jkey} after a failed put "
                    f"({put_exc}); claims left in place — run "
                    "recover_cas_txn_journals (then recover()) to "
                    "resolve"
                ) from put_exc
        # the journal object is durable: COMMITTED from here on — a
        # failure below must complete (recovery replays the same swaps)
        try:
            for mt, v, _, _ in planned:
                if not mt._swap_pointer(v, v + 1):
                    cur = mt.cas.get(mt._key)
                    if cur is None or cur < v + 1:
                        raise ConcurrentWriterError(
                            f"pointer swap on {mt.path} failed with "
                            f"pointer at {cur} while holding the "
                            f"v{v + 1} claim"
                        )
                    # pointer already at/past target: recovery (or a
                    # racing replay) completed this participant — done
            store.delete_blob(jkey)
        except Exception as exc:
            raise TxnJournaledError(
                f"multi-table CAS commit reached its commit point "
                f"(journal object {jkey}) but a participant failed to "
                f"publish: {exc}; recovery on next engine open "
                "completes it"
            ) from exc

    @classmethod
    def recover_cas_txn_journals(
        cls, store, journal_prefix: str
    ) -> list[str]:
        """Replay crashed CAS multi-table journals from the store
        (called on engine open, BEFORE any claim healing). A journal
        object exists iff its transaction committed, and its staged
        bytes + claim manifests were fsynced pre-journal, so every
        participant can be finished by the pointer swap alone:
        pointer >= target means done (idempotent), pointer == expected
        swaps. A missing claim manifest (someone ran ``recover()``
        between crash and replay) cannot be completed truthfully: the
        journal is re-keyed to ``<key>.failed`` for manual resolution,
        mirroring the flock variant's ``.failed`` contract. Returns the
        table paths recovered."""
        import json as _json
        import warnings

        recovered: list[str] = []
        for jkey in store.list_blobs(journal_prefix):
            if jkey.endswith(".failed"):
                continue
            raw = store.get_blob(jkey)
            if raw is None:
                continue  # concurrently completed
            try:
                payload = _json.loads(raw.decode())
                if isinstance(payload, dict) and payload.get("abort"):
                    # abort TOMBSTONE (commit_staged_group_cas): the
                    # writer claimed the key to block a delayed journal
                    # put before its destructive abort — terminal,
                    # nothing to replay; sweep it. (Residual window,
                    # documented: after this delete an extraordinarily
                    # late original put could land; its replay then
                    # finds the claim manifests gone and re-keys to
                    # .failed — noisy, never destructive.)
                    store.delete_blob(jkey)
                    continue
                payload["tables"]
            except Exception:  # noqa: BLE001 — any poison blob
                # a truncated/corrupt journal (e.g. FileCas crash
                # between O_EXCL create and write) must not block
                # replay of every OTHER crashed transaction on every
                # engine open: re-key it to .failed and keep sweeping
                warnings.warn(
                    f"CAS txn journal {jkey}: undecodable payload; "
                    "re-keyed to .failed for manual resolution"
                )
                store.put_blob_if_absent(jkey + ".failed", raw)
                store.delete_blob(jkey)
                continue
            failed = False
            for t in payload["tables"]:
                cur = store.get(t["key"])
                if cur is not None and cur >= t["target"]:
                    continue  # already published
                claim = os.path.join(
                    t["path"], _LOG, f"v{t['target']}.json"
                )
                if not os.path.exists(claim):
                    warnings.warn(
                        f"CAS txn journal {jkey}: table {t['path']} "
                        f"cannot be completed (the v{t['target']} "
                        "claim manifest is gone — recover() ran before "
                        "journal replay?); journal kept as .failed for "
                        "manual resolution"
                    )
                    failed = True
                    break
                if not store.cas(t["key"], t["expected"], t["target"]):
                    cur = store.get(t["key"])
                    if cur is None or cur < t["target"]:
                        warnings.warn(
                            f"CAS txn journal {jkey}: pointer swap on "
                            f"{t['path']} failed (pointer at {cur}); "
                            "journal kept as .failed"
                        )
                        failed = True
                        break
                recovered.append(t["path"])
            if failed:
                raw2 = store.get_blob(jkey)
                if raw2 is not None:
                    store.put_blob_if_absent(jkey + ".failed", raw2)
                    store.delete_blob(jkey)
            else:
                store.delete_blob(jkey)
        return recovered

