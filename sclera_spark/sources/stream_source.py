"""Manifest tables as a STRUCTURED STREAMING SOURCE — the read-side
twin of ``streaming.ops.stream_to_manifest`` (the sink), completing the
end-to-end exactly-once pipeline shape Delta Lake serves with its
streaming source: a manifest table's commit log IS an ordered change
stream, so a consumer can tail it incrementally instead of re-scanning
snapshots.

Implemented as a pyspark Python Data Source (Spark 4's
``pyspark.sql.datasource`` API — the idiomatic way to add a source
without JVM code):

    spark.dataSource.register(ManifestStreamSource)
    df = (spark.readStream.format("sclera_manifest")
          .option("path", "/warehouse/events").load())

Semantics (mirroring Delta's streaming source):
- **Offsets are manifest versions.** An offset ``{"version": N}``
  means "committed through version N"; a micro-batch covers the files
  ADDED by versions N+1..M. Version manifests are immutable and name
  immutable data files, so replaying a batch after a crash reads the
  exact same rows — exactly-once with any checkpointed sink, and
  end-to-end exactly-once against the manifest SINK (its batch-id
  dedup absorbs redelivery).
- **Append commits stream; change commits are refused by default.** A
  version that REMOVES files (UPDATE/DELETE rewrite, OPTIMIZE) is not
  representable as an append stream. Like Delta, the source fails
  loudly on such a version unless ``skip_change_commits=true``
  (Delta's skipChangeCommits): then only the version's ADDED files
  flow and removals are ignored. OPTIMIZE-style rewrites that add AND
  remove would double-deliver rewritten rows — refusing is the sound
  default.
- **starting_version** (default 0) begins the stream after that
  version — ``0`` streams the table from its first commit,
  ``current version`` streams only future commits. A needed version
  already dropped by VACUUM raises with remediation (raise
  starting_version) instead of silently skipping data.

Scale: offsets resolve with one pointer read; a micro-batch plans one
InputPartition per new data file (executors read parquet via Arrow
batches, never the driver); nothing driver-side grows with table size
— only with the new-file count of the versions in the batch.

Reference context: the reference's streaming tier is single-node
iterator chains (modules/core streams); this source is the
Spark-native replacement shape — its log-tailing contract comes from
public Delta/Iceberg streaming-source semantics, not the reference.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_LOG = "_sclera_log"
_DATA = "data"


def _read_version(table_path: str, v: int) -> dict:
    """Resolve one manifest version to its full form (delta-encoded
    commits replayed down to their snapshot — manifest.load_manifest).
    Raises FileNotFoundError when the version (or a base under it) was
    vacuumed, which partitions() turns into the replay-gap error."""
    from sclera_spark.sources.manifest import load_manifest

    return load_manifest(os.path.join(table_path, _LOG), v)


def _current_version(table_path: str) -> int:
    with open(os.path.join(table_path, _LOG, "LATEST")) as fh:
        return int(fh.read().strip())


def _file_batches(path: str, want, phys=None, const=None):
    """Arrow batches of one parquet file aligned to the reader schema:
    a file missing a column (schema evolution) streams TYPED nulls for
    it, so every batch matches. ``phys`` (column-mapped tables) lists
    the PHYSICAL file-side name of each reader field — data selects by
    physical name, the emitted batch carries the logical one; casts
    lift pre-widening narrow files to the mapped (wide) type.
    ``const`` ({column: typed value}) fills a missing column with a
    per-file CONSTANT instead of nulls — the virtual partition columns
    of a partitioned Delta import (values live in the manifest meta,
    not the parquet bytes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    phys = list(phys) if phys else list(want.names)
    pf = pq.ParquetFile(path)
    avail = [c for c in phys if c in pf.schema_arrow.names]
    for batch in pf.iter_batches(columns=avail):
        if avail != list(want.names) or phys != list(want.names) or const:
            arrays = []
            for field, p in zip(want, phys):
                if p in avail:
                    arr = batch.column(avail.index(p)).cast(field.type)
                elif const and const.get(field.name) is not None:
                    arr = pa.array(
                        [const[field.name]] * batch.num_rows,
                        type=field.type,
                    )
                else:
                    arr = pa.nulls(batch.num_rows, type=field.type)
                arrays.append(arr)
            batch = pa.RecordBatch.from_arrays(arrays, schema=want)
        yield batch


def _typed_pv(raw, typ: str):
    """One Delta partitionValues string as a typed Python value for an
    Arrow constant array (None stays None → typed nulls)."""
    if raw is None:
        return None
    import datetime
    import decimal

    try:
        if typ in ("byte", "short", "integer", "long"):
            return int(raw)
        if typ in ("float", "double"):
            return float(raw)
        if typ.startswith("decimal"):
            return decimal.Decimal(raw)
        if typ == "boolean":
            return str(raw).lower() == "true"
        if typ == "date":
            return datetime.date.fromisoformat(raw)
        if typ == "timestamp":
            return datetime.datetime.fromisoformat(
                str(raw).replace("T", " ")
            )
    except (ValueError, decimal.InvalidOperation):
        return None
    return raw


def _tag_batch(batch, change_type: str, version: int, ts_us: int | None):
    """Append the change-feed columns to a data batch (same shape as
    batch TABLE_CHANGES: type, version, commit timestamp)."""
    import pyarrow as pa

    n = batch.num_rows
    cols = list(batch.columns) + [
        pa.array([change_type] * n, type=pa.string()),
        pa.array([version] * n, type=pa.int64()),
        pa.array([ts_us] * n, type=pa.timestamp("us")),
    ]
    fields = list(batch.schema) + [
        pa.field("_change_type", pa.string()),
        pa.field("_commit_version", pa.int64()),
        pa.field("_commit_timestamp", pa.timestamp("us")),
    ]
    return pa.RecordBatch.from_arrays(cols, schema=pa.schema(fields))


def _canon_row(row: dict, names) -> tuple:
    """Hashable multiset key for one row (diff cancellation). NaN maps
    to a sentinel so NaN rows cancel against themselves; lists/maps
    recurse into tuples."""
    return tuple(_canon_cell(row.get(n)) for n in names)


def _canon_cell(v):
    if isinstance(v, float) and v != v:
        return ("__nan__",)
    if isinstance(v, list):
        return ("__list__", tuple(_canon_cell(x) for x in v))
    if isinstance(v, dict):
        return (
            "__map__",
            tuple(sorted((k, _canon_cell(x)) for k, x in v.items())),
        )
    if isinstance(v, bytearray):
        return bytes(v)
    return v


class _FilePartition(InputPartition):
    def __init__(
        self, path: str, arrow_schema, change=None, phys=None, const=None
    ):
        self.path = path
        self.arrow_schema = arrow_schema
        self.phys = phys  # physical file-side column names (mapping)
        # virtual partition-column constants for THIS file (partitioned
        # Delta import) — substituted for the missing columns
        self.const = const
        # (change_type, commit_version, commit_ts_us) when streaming a
        # change feed: this file's rows all carry the same tag (an
        # append commit)
        self.change = change


class _DiffPartition(InputPartition):
    """One CHANGE commit's row-level diff (read_changes mode): the
    added and removed file sets of a single version, diffed multiset-
    wise in the executor — rows a COW rewrite carried over unchanged
    cancel, leaving exactly the touched rows as delete+insert. Memory
    is bounded by the commit's CHANGED bytes (capped in partitions()),
    never by table size."""

    def __init__(
        self,
        added,
        removed,
        version,
        arrow_schema,
        ts_us=None,
        phys=None,
        const_by_path=None,
    ):
        self.added = added
        self.removed = removed
        self.version = version
        self.arrow_schema = arrow_schema
        self.ts_us = ts_us
        self.phys = phys
        # {file path: {column: typed constant}} — virtual partition
        # columns (partitioned Delta import)
        self.const_by_path = const_by_path or {}


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, schema, options):
        from pyspark.sql.pandas.types import to_arrow_schema

        self.table_path = table_path
        self.read_changes = (
            str(options.get("read_changes", "false")).lower() == "true"
        )
        self.skip_change = (
            str(options.get("skip_change_commits", "false")).lower()
            == "true"
        )
        if self.read_changes and self.skip_change:
            raise ValueError(
                "read_changes and skip_change_commits are contradictory: "
                "one streams change commits, the other drops them"
            )
        try:
            self.max_change_bytes = int(
                options.get("max_change_bytes", 1 << 30)
            )
        except (TypeError, ValueError):
            raise ValueError("max_change_bytes must be an integer")
        data_schema = schema
        if self.read_changes:
            # the reader schema carries the feed columns; data files
            # hold only the table columns
            from pyspark.sql.types import StructType

            data_schema = StructType(
                [
                    f
                    for f in schema.fields
                    if f.name
                    not in (
                        "_change_type",
                        "_commit_version",
                        "_commit_timestamp",
                    )
                ]
            )
        self.columns = [f.name for f in data_schema.fields]
        # typed arrow schema rides along to executors so a file missing
        # a column (schema evolution) can fill TYPED nulls
        self.arrow_schema = to_arrow_schema(data_schema)
        # column-mapped table (RENAME/DROP/widen): files store columns
        # under PHYSICAL names — resolve logical -> physical once at
        # reader init (latest mapping, same vintage as the schema)
        self.phys = None
        try:
            mapping = (
                _read_version(table_path, _current_version(table_path))
                .get("meta", {})
                .get("columns")
            )
        except (FileNotFoundError, OSError):
            mapping = None
        if mapping:
            by_name = {
                e["name"]: e["physical"]
                for e in mapping
                if not e.get("dropped")
            }
            self.phys = [by_name.get(c, c) for c in self.columns]
        try:
            self.start_version = int(options.get("starting_version", 0))
        except (TypeError, ValueError):
            raise ValueError(
                "starting_version must be an integer manifest version"
            )
        try:
            self.max_versions = int(
                options.get("max_versions_per_trigger", 0)
            )
        except (TypeError, ValueError):
            raise ValueError(
                "max_versions_per_trigger must be a positive integer"
            )
        try:
            self.max_bytes = int(options.get("max_bytes_per_trigger", 0))
        except (TypeError, ValueError):
            raise ValueError(
                "max_bytes_per_trigger must be an integer byte count"
            )
        self._last_end: int | None = None
        self._last_pos: tuple[int, int] | None = None

    # ---- offsets (driver side) ----

    @staticmethod
    def _pos(off: dict) -> tuple[int, int]:
        """Total order on offsets: (N, K) = "through version N plus the
        first K added files of N+1", so plain tuple comparison is the
        stream order ((0, 6) < (1, 0))."""
        return (int(off["version"]), int(off.get("file_idx", 0)))

    def initialOffset(self) -> dict:
        # Spark may resolve the initial offset AFTER the first
        # latestOffset call (observed runner order) — never move the
        # pacing anchor BACKWARDS, or later walks would emit offsets
        # behind the committed position and re-deliver files
        pos = (self.start_version, 0)
        if self._last_pos is None or pos > self._last_pos:
            self._last_pos = pos
        return {"version": self.start_version}

    def commit(self, end: dict) -> None:
        # the engine's committed position is authoritative: adopt it as
        # the pacing anchor (offsets must be non-decreasing for the
        # life of the checkpoint — Spark compares them only by JSON
        # (in)equality, so a regressed offset re-plans old files)
        pos = self._pos(end)
        if self._last_pos is None or pos > self._last_pos:
            self._last_pos = pos
        if self._last_end is None or pos[0] > self._last_end:
            self._last_end = pos[0]

    def _added_names(self, v: int) -> list[str]:
        cur = set(_read_version(self.table_path, v)["files"])
        if v == 1:
            prev: set = set()
        else:
            prev = set(_read_version(self.table_path, v - 1)["files"])
        return sorted(cur - prev), sorted(prev - cur)

    def _bytes_walk(self, cur: int) -> dict:
        """Byte-based admission (Delta's maxBytesPerTrigger at our
        offset granularity): walk forward from the last position,
        accumulating ADDED-file sizes, and stop at FILE granularity —
        the offset {"version": N, "file_idx": K} means "versions
        through N complete, plus the first K added files of N+1", so a
        giant backfill commit splits across micro-batches. A version
        that REMOVES files (change commit) is never split: its diff is
        one atomic unit (its own max_change_bytes cap guards it). At
        least one file always advances, so an over-cap single file
        still progresses."""
        v0, i0 = self._last_pos
        budget = self.max_bytes
        end_v, end_i = v0, i0
        progressed = False  # >=1 file admitted THIS walk (progress floor)
        data_dir = os.path.join(self.table_path, _DATA)
        while True:
            nv = end_v + 1
            if nv > cur:
                break
            added, removed = self._added_names(nv)
            if removed:
                # atomic change commit: admit whole, or stop before it
                # when this walk already carries files
                if not progressed:
                    end_v, end_i = nv, 0
                break
            k = end_i  # mid-version resume starts at the split point
            stopped = False
            while k < len(added):
                try:
                    sz = os.path.getsize(os.path.join(data_dir, added[k]))
                except OSError:
                    sz = 0
                if budget - sz < 0 and progressed:
                    stopped = True
                    break
                budget -= sz
                k += 1
                progressed = True
            if stopped:
                end_v, end_i = nv - 1, k
                break
            end_v, end_i = nv, 0
            if budget <= 0:
                break
        self._last_pos = (end_v, end_i)
        off = {"version": end_v}
        if end_i:
            off["file_idx"] = end_i
        return off

    def latestOffset(self) -> dict:
        """Current pointer, optionally admission-controlled: with
        ``max_versions_per_trigger = N`` each micro-batch advances at
        most N commits past the previous end (Delta's
        maxFilesPerTrigger shape, at our offset granularity); with
        ``max_bytes_per_trigger = B`` each micro-batch admits added
        files up to ~B bytes, splitting WITHIN a commit at file
        granularity (offset {"version": N, "file_idx": K}) — a long
        backfill proceeds in bounded chunks instead of one giant
        batch. The committed offset in the checkpoint is authoritative
        across restarts; in-run pacing state only paces WITHIN a run
        (the first batch after a restart is unpaced — the checkpoint
        position is not visible to a fresh reader)."""
        cur = _current_version(self.table_path)
        if self.max_versions > 0 and self._last_end is not None:
            # pace only once this run has a known position: after a
            # restart the checkpoint's committed offset is unknown to
            # a fresh reader, and capping from starting_version could
            # propose an offset BEHIND the checkpoint (a stall). The
            # first batch of a run is therefore unpaced; every
            # subsequent one advances at most N commits.
            cur = min(cur, self._last_end + self.max_versions)
        if self.max_bytes > 0 and self._last_pos is not None:
            try:
                off = self._bytes_walk(cur)
            except FileNotFoundError:
                # a vacuum raced the walk: fall back to the plain
                # version boundary — partitions() then reports the
                # retention gap with remediation, instead of a raw
                # missing-file error from the offset path
                self._last_pos = (cur, 0)
                self._last_end = cur
                return {"version": cur}
            # anchor version pacing to DELIVERED progress: when the
            # byte cap truncates the batch short of `cur`, the next
            # max_versions window must extend from what this batch
            # actually delivered, not from the pre-walk candidate
            self._last_end = int(off["version"])
            return off
        self._last_end = cur
        if self.max_bytes > 0:
            # restart: adopt the current pointer as the pacing anchor
            # for SUBSEQUENT batches; this first one is unpaced
            self._last_pos = (cur, 0)
        return {"version": cur}

    def partitions(self, start: dict, end: dict):
        """Plan the files of one micro-batch. Offsets are version
        boundaries, optionally refined to file granularity by
        ``file_idx`` (byte-based admission): {"version": N,
        "file_idx": K} = versions through N complete plus the first K
        ADDED files (sorted name order — deterministic, so a replayed
        batch plans the exact same slice) of version N+1."""
        lo, hi = int(start["version"]), int(end["version"])
        lo_idx = int(start.get("file_idx", 0))
        hi_idx = int(end.get("file_idx", 0))
        last_v = hi + 1 if hi_idx else hi  # partial tail version
        parts: list[_FilePartition] = []
        prev_files: set | None = None
        # virtual partition columns (partitioned Delta import): the
        # per-file values ride the manifest meta, inherited across
        # commits — resolve once from the batch's end version
        pv_meta: dict = {}
        pcols: list = []
        if last_v >= 1:
            try:
                meta = _read_version(self.table_path, last_v).get(
                    "meta"
                ) or {}
                pv_meta = meta.get("file_partition_values") or {}
                pcols = meta.get("partition_columns") or []
            except Exception:
                pv_meta, pcols = {}, []

        def _const_for(name: str):
            vals = pv_meta.get(name)
            if vals is None or not pcols:
                return None
            return {
                c["name"]: _typed_pv(vals.get(c["name"]), c["type"])
                for c in pcols
            }
        for v in range(max(lo, 0) + 1, last_v + 1):
            try:
                cur = set(_read_version(self.table_path, v)["files"])
            except FileNotFoundError:
                raise RuntimeError(
                    f"manifest version {v} of {self.table_path} is no "
                    "longer retained (VACUUM dropped it): the stream "
                    "cannot replay those rows. Restart with "
                    f"starting_version >= {v} (accepting the gap) or "
                    "retain more versions."
                )
            if prev_files is None:
                if v == 1:
                    prev_files = set()
                else:
                    try:
                        prev_files = set(
                            _read_version(self.table_path, v - 1)["files"]
                        )
                    except FileNotFoundError:
                        # The batch's BASE version (v-1) was vacuumed:
                        # without it, the diff is unrecoverable and
                        # delivering the full v snapshot as "added"
                        # would silently re-ingest the whole table.
                        # Mirror ManifestTable.changes()'s retention
                        # check and fail loudly instead.
                        raise RuntimeError(
                            f"manifest version {v - 1} of "
                            f"{self.table_path} (the batch's base) is "
                            "no longer retained (VACUUM dropped it): "
                            f"the diff to version {v} cannot be "
                            "computed, so the stream cannot continue "
                            "exactly-once. Restart with "
                            f"starting_version >= {v} (accepting the "
                            "gap) or retain more versions."
                        )
            added = sorted(cur - prev_files)
            removed = sorted(prev_files - cur)
            prev_files = cur
            if v == lo + 1 and lo_idx:
                # resume mid-version: the first lo_idx added files were
                # delivered by the previous batch
                added = added[lo_idx:]
            if v == hi + 1 and hi_idx:
                # partial tail: only the first hi_idx added files are
                # admitted (byte-capped split); such a version never
                # carries removals (the walk keeps change commits
                # whole). Recompute the FULL added list so a batch that
                # both starts and ends inside this version delivers
                # exactly files [lo_idx:hi_idx].
                base = (
                    set()
                    if v == 1
                    else set(_read_version(self.table_path, v - 1)["files"])
                )
                full = sorted(cur - base)
                keep = set(full[:hi_idx])
                added = [n for n in added if n in keep]
            data_dir = os.path.join(self.table_path, _DATA)
            ts_us = None
            if self.read_changes:
                try:
                    ts_us = int(
                        os.path.getmtime(
                            os.path.join(
                                self.table_path, _LOG, f"v{v}.json"
                            )
                        )
                        * 1_000_000
                    )
                except OSError:
                    pass
            if removed and self.read_changes:
                # a change commit: one partition diffs the commit's
                # added vs removed files row-wise, bounded by the
                # commit's changed bytes (a 100 TB table's COW commit
                # touches only the files the DML touched)
                paths_a = [os.path.join(data_dir, n) for n in added]
                paths_r = [os.path.join(data_dir, n) for n in removed]
                total = 0
                for p in paths_a + paths_r:
                    try:
                        total += os.path.getsize(p)
                    except OSError:
                        pass
                if total > self.max_change_bytes:
                    raise RuntimeError(
                        f"manifest version {v} of {self.table_path} "
                        f"changed ~{total >> 20} MiB of files, over the "
                        f"max_change_bytes cap ({self.max_change_bytes}):"
                        " the row-level diff of one commit is computed "
                        "in a single task. Raise the cap, OPTIMIZE less "
                        "often on streamed tables, or replay this range "
                        "with batch TABLE_CHANGES instead."
                    )
                cbp = {
                    p: c
                    for p in paths_a + paths_r
                    if (c := _const_for(os.path.basename(p))) is not None
                }
                parts.append(
                    _DiffPartition(
                        paths_a,
                        paths_r,
                        v,
                        self.arrow_schema,
                        ts_us,
                        phys=self.phys,
                        const_by_path=cbp or None,
                    )
                )
                continue
            if removed and not self.skip_change:
                raise RuntimeError(
                    f"manifest version {v} of {self.table_path} removed "
                    f"{len(removed)} file(s) (UPDATE/DELETE/OPTIMIZE): "
                    "not representable as an append stream. Set "
                    "skip_change_commits=true to stream only added "
                    "files past such commits (rewritten rows are then "
                    "NOT re-delivered), read_changes=true to stream "
                    "them as row-level insert/delete changes, or start "
                    "a fresh stream from the current snapshot."
                )
            for name in added:
                parts.append(
                    _FilePartition(
                        os.path.join(data_dir, name),
                        self.arrow_schema,
                        change=(
                            ("insert", v, ts_us)
                            if self.read_changes
                            else None
                        ),
                        phys=self.phys,
                        const=_const_for(name),
                    )
                )
        return parts

    # ---- data (executor side) ----

    def read(self, partition):
        if isinstance(partition, _DiffPartition):
            yield from self._read_diff(partition)
            return
        import pyarrow as pa

        for batch in _file_batches(
            partition.path,
            partition.arrow_schema,
            partition.phys,
            getattr(partition, "const", None),
        ):
            if partition.change is not None:
                batch = _tag_batch(batch, *partition.change)
            yield batch

    def _read_diff(self, partition: _DiffPartition):
        """Row-level diff of one change commit: rows present on both
        sides (a COW rewrite's carried-over rows) cancel multiset-wise;
        what remains is exactly the commit's deletes and inserts. Runs
        in one task with memory bounded by the commit's changed bytes
        (pre-capped on the driver)."""
        import collections

        import pyarrow as pa

        want = partition.arrow_schema

        cbp = getattr(partition, "const_by_path", None) or {}

        def rows(paths):
            for p in paths:
                for batch in _file_batches(
                    p, want, partition.phys, cbp.get(p)
                ):
                    yield from batch.to_pylist()

        residual = collections.Counter(
            _canon_row(r, want.names) for r in rows(partition.removed)
        )
        inserts: list[dict] = []
        for r in rows(partition.added):
            key = _canon_row(r, want.names)
            if residual.get(key, 0) > 0:
                residual[key] -= 1  # carried over unchanged: not a change
            else:
                inserts.append(r)
        # residual counts are the commit's deletes: re-scan the removed
        # side once to recover original rows for them
        deletes: list[dict] = []
        emitted: collections.Counter = collections.Counter()
        if any(n > 0 for n in residual.values()):
            for r in rows(partition.removed):
                key = _canon_row(r, want.names)
                if emitted[key] < residual.get(key, 0):
                    emitted[key] += 1
                    deletes.append(r)
        for rows_out, kind in ((inserts, "insert"), (deletes, "delete")):
            if not rows_out:
                continue
            tbl = pa.Table.from_pylist(rows_out, schema=want)
            for batch in tbl.to_batches():
                yield _tag_batch(
                    batch, kind, partition.version, partition.ts_us
                )


class ManifestStreamSource(DataSource):
    """``spark.readStream.format("sclera_manifest")`` — register with
    ``spark.dataSource.register(ManifestStreamSource)`` (the engine
    does this on first use; see ScleraEngine.stream_from_manifest)."""

    @classmethod
    def name(cls) -> str:
        return "sclera_manifest"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError(
                "sclera_manifest requires .option('path', <table root>)"
            )
        v = _current_version(path)
        manifest = _read_version(path, v)
        stored = (manifest.get("meta") or {}).get("table_schema")
        if stored:
            # the manifest meta records the evolved table schema (the
            # same source of truth batch read() uses) — authoritative
            # regardless of file-list ordering, which compaction/COW
            # rewrites no longer keep in schema-evolution age order
            from pyspark.sql.types import StructType as _St

            spark_schema = _St.fromJson(json.loads(stored))
        else:
            if not manifest["files"]:
                raise ValueError(
                    f"manifest table {path} has no data files to derive "
                    "a schema from; pass an explicit .schema(...)"
                )
            # no recorded schema (pre-evolution table): unify the
            # oldest and newest footers so append-style schema
            # evolution (a column added by a later commit) is visible
            # without reading every footer of a large snapshot
            import pyarrow as pa

            names = manifest["files"]
            schemas = [
                pq.ParquetFile(os.path.join(path, _DATA, n)).schema_arrow
                for n in {names[0]: None, names[-1]: None}
            ]
            spark_schema = from_arrow_schema(pa.unify_schemas(schemas))
        # every column nullable: an older file may predate a column
        # (schema evolution) and streams typed NULLs for it
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
            TimestampType,
        )

        fields = [
            StructField(f.name, f.dataType, True)
            for f in spark_schema.fields
        ]
        if str(
            self.options.get("read_changes", "false")
        ).lower() == "true":
            # change-feed mode appends the tag columns (batch
            # TABLE_CHANGES shape)
            fields += [
                StructField("_change_type", StringType(), True),
                StructField("_commit_version", LongType(), True),
                StructField("_commit_timestamp", TimestampType(), True),
            ]
        return StructType(fields)

    def streamReader(self, schema):
        return ManifestStreamReader(
            self.options["path"], schema, self.options
        )
