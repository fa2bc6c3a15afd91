"""DDL / DML statement routing — the `Processor.handleStatement` surface.

Reference (modules/core/src/main/scala/sql/parser/SqlCudParser.scala,
SqlAdminParser.scala; exec/Processor.scala:456-637): CREATE [TEMP] TABLE /
VIEW ... AS, INSERT INTO, UPDATE, DELETE, DROP, EXPLAIN, LIST, DESCRIBE.

Spark lowering: engine-managed tables are parquet datasets in a warehouse
directory (overwrite-rewrite for UPDATE/DELETE — the Spark-native pattern
absent a transactional format like Delta/Iceberg; the write is a full
distributed job, no driver materialization). Views are logical (temp
views), expanded by Catalyst exactly like the reference expands views at
normalize time (exec/Normalizer.scala:301).
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile


class TxnDmlRefused(Exception):
    """A DML statement inside a wire transaction that cannot be staged
    truthfully (non-manifest target, unparseable, over-cap predicate,
    or a rewrite of a file this transaction already rewrote). The wire
    server reports it as SQLSTATE 0A000 — feature_not_supported."""


class DdlRouter:
    def __init__(self, engine, warehouse_dir: str | None = None):
        self.engine = engine
        # persisted-catalog mode (SCLERA_SPARK_CATALOG_DIR, the same
        # switch ADD LOCATION persistence keys off): the warehouse
        # moves under the catalog dir — durable parquet instead of a
        # tmpdir — and table/view registrations are journaled to
        # tables.json so a restarted engine sees its whole catalog
        self._catalog_dir = getattr(engine, "catalog_dir", None)
        if warehouse_dir:
            self.warehouse = warehouse_dir
        elif self._catalog_dir:
            self.warehouse = os.path.join(self._catalog_dir, "warehouse")
            os.makedirs(self.warehouse, exist_ok=True)
        else:
            self.warehouse = tempfile.mkdtemp(prefix="sclera_warehouse_")
        self.managed: dict[str, str] = {}  # table -> parquet path
        self.views: dict[str, str] = {}  # view -> query text
        # tables whose DML commits go through the atomic manifest protocol
        # (sources/manifest.py) instead of the plain parquet COW path
        self.manifest_tables: set[str] = set()
        # subset of manifest_tables whose commit point is the durable
        # conditional-put CAS store (multi-host protocol, FileCas-backed
        # in-container; S3Cas/DynamoCas adapters for real object stores)
        self.cas_manifest_tables: set[str] = set()
        self._cas = None  # lazily-built FileCas shared by all CAS tables
        if self._catalog_dir:
            self._load_tables()
        # crashed multi-table wire transactions (r13): a journal under
        # the warehouse means a txn reached its commit point but not all
        # participants published — finish them before serving queries
        try:
            from sclera_spark.sources.manifest import ManifestTable

            ManifestTable.recover_txn_journals(self.txn_journal_dir())
        except Exception as exc:
            import warnings

            warnings.warn(f"txn journal recovery failed: {exc}")
        # crashed CAS multi-table transactions (r14): the journal is an
        # object in the CAS store itself; replay only when a durable
        # store exists on disk (FileCas — MemoryCas dies with the
        # process, so there is nothing to recover from it here)
        try:
            if os.path.isdir(os.path.join(self.warehouse, "_sclera_cas")):
                from sclera_spark.sources.manifest import CasManifestTable

                CasManifestTable.recover_cas_txn_journals(
                    self._cas_store(), self.cas_txn_prefix()
                )
        except Exception as exc:
            import warnings

            warnings.warn(f"CAS txn journal recovery failed: {exc}")

    def txn_journal_dir(self) -> str:
        """Where multi-table wire transactions journal their commit
        intent (sources/manifest.commit_staged_group)."""
        return os.path.join(self.warehouse, "_sclera_txn")

    def cas_txn_prefix(self) -> str:
        """Key prefix of CAS multi-table transaction journal objects in
        this warehouse's CAS store (r14,
        manifest.CasManifestTable.commit_staged_group_cas). The FileCas
        store is already warehouse-scoped, so a bare namespace
        suffices."""
        return "txn/"

    # ---- routing ----

    _ROUTES = [
        (
            re.compile(
                r"^\s*CREATE\s+TABLE\s+(\w+)\s+(?:SHALLOW\s+)?CLONE\s+(\w+)"
                r"(?:\s+VERSION\s+(?:AS\s+OF\s+)?(\d+)"
                r"|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?\s*$",
                re.I,
            ),
            "_clone",
        ),
        (
            re.compile(
                r"^\s*RESTORE\s+TABLE\s+(\w+)\s+TO\s+"
                r"(?:VERSION\s+(?:AS\s+OF\s+)?(\d+)"
                r"|TIMESTAMP\s+AS\s+OF\s+'([^']+)')\s*$",
                re.I,
            ),
            "_restore",
        ),
        (
            re.compile(
                r"^\s*CREATE\s+(?:TEMP\s+)?TABLE\s+(\w+)\s+"
                r"CLUSTER\s+BY\s*\(\s*([\w\s,]+?)\s*\)\s+AS\s+(.*)$",
                re.I | re.S,
            ),
            "_ctas_clustered",
        ),
        (re.compile(r"^\s*CREATE\s+(?:TEMP\s+)?TABLE\s+(\w+)\s+AS\s+(.*)$", re.I | re.S), "_ctas"),
        (re.compile(r"^\s*CREATE\s+(?:TEMP\s+)?TABLE\s+(\w+)\s*\((.*)\)\s*$", re.I | re.S), "_create_table"),
        (re.compile(r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.*)$", re.I | re.S), "_cview"),
        (
            re.compile(
                r"^\s*CREATE\s+EXTERNAL\s+(\w+)\s*(?:\(([^)]*)\)\s*)?AS\s+(.*)$",
                re.I | re.S,
            ),
            "_create_external",
        ),
        (re.compile(r"^\s*INSERT\s+INTO\s+(\w+)\s+(.*)$", re.I | re.S), "_insert"),
        (
            re.compile(
                r"^\s*MERGE\s+INTO\s+(\w+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?\s+USING\s+(.*)$",
                re.I | re.S,
            ),
            "_merge",
        ),
        (re.compile(r"^\s*UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$", re.I | re.S), "_update"),
        (re.compile(r"^\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*))?$", re.I | re.S), "_delete"),
        (re.compile(r"^\s*TRUNCATE\s+(?:TABLE\s+)?(\w+)\s*$", re.I), "_truncate"),
        (re.compile(r"^\s*DROP\s+(TABLE|VIEW)\s+(?:IF\s+EXISTS\s+)?(\w+)\s*$", re.I), "_drop"),
        (
            re.compile(
                r"^\s*CREATE\s+CLASSIFIER\s+(?:\(\s*'([^']*)'(?:\s*,\s*'([^']*)')?\s*\)\s*)?"
                r"(\w+)\s*\(\s*(\w+)\s*\)\s+USING\s+(.*)$",
                re.I | re.S,
            ),
            "_create_classifier",
        ),
        (
            re.compile(
                r"^\s*CREATE\s+CLUSTERER\s+(?:\(\s*'([^']*)'(?:\s*,\s*'([^']*)')?\s*\)\s*)?"
                r"(\w+)\s+USING\s+(.*)$",
                re.I | re.S,
            ),
            "_create_clusterer",
        ),
        (re.compile(r"^\s*DROP\s+(CLASSIFIER|CLUSTERER)\s+(\w+)\s*$", re.I), "_drop_ml"),
        (
            re.compile(
                r"^\s*ADD\s+(READONLY\s+)?LOCATION\s+(\w+)\s+AS\s+(\w+)\s*"
                r"\(([^)]*)\)(?:\s+SCHEMA\s+'([^']*)')?\s*$",
                re.I,
            ),
            "_add_location",
        ),
        (re.compile(r"^\s*REMOVE\s+LOCATION\s+(\w+)\s*$", re.I), "_remove_location"),
        (re.compile(r"^\s*ADD\s+TABLE\s+(?:(\w+)\.)?(\w+)(?:\s+AS\s+(\w+))?\s*$", re.I), "_add_table"),
        (re.compile(r"^\s*REMOVE\s+TABLE\s+(?:\w+\.)?(\w+)\s*$", re.I), "_remove_table"),
        (re.compile(r"^\s*SET\s+(\w+)\s+LOCATION\s*=\s*(\w+)\s*$", re.I), "_set_location"),
        (re.compile(r"^\s*SET\s+(\w+)\s*=\s*'?(\w+)'?\s*$", re.I), "_set_option"),
        (
            re.compile(r"^\s*CREATE\s+INDEX\s+(\w+)\s+ON\s+(\w+)\s*\(\s*([\w\s,]+?)\s*\)\s*$", re.I),
            "_create_index",
        ),
        (re.compile(r"^\s*DROP\s+INDEX\s+(\w+)\s*$", re.I), "_drop_index"),
        (re.compile(r"^\s*(?:LIST|SHOW)\s+LOCATIONS\s*$", re.I), "_list_locations"),
        (re.compile(r"^\s*@(\w+)\s+'(.*)'\s*$", re.S), "_native_statement"),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+FORMAT\s+MANIFEST(\s+CAS)?\s*$",
                re.I,
            ),
            "_set_format_manifest",
        ),
        (
            re.compile(
                r"^\s*CREATE\s+TABLE\s+(\w+)\s+FROM\s+SYMLINK\s+MANIFEST\s+"
                r"'([^']+)'\s*$",
                re.I,
            ),
            "_create_from_symlink",
        ),
        (
            re.compile(
                r"^\s*CREATE\s+TABLE\s+(\w+)\s+FROM\s+DELTA\s+"
                r"'([^']+)'"
                r"(\s+MATERIALIZE\s+DELETION\s+VECTORS)?\s*$",
                re.I,
            ),
            "_create_from_delta",
        ),
        (
            re.compile(
                r"^\s*CREATE\s+TABLE\s+(\w+)\s+FROM\s+ICEBERG\s+"
                r"'([^']+)'"
                r"(\s+MATERIALIZE\s+DELETION\s+VECTORS)?\s*$",
                re.I,
            ),
            "_create_from_iceberg",
        ),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+BLOOM\s+FILTER\s*"
                r"\(\s*([\w\s,]+?)\s*\)(?:\s+FPP\s+([0-9.]+))?\s*$",
                re.I,
            ),
            "_set_bloom_filter",
        ),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+BLOOM\s+FILTER\s*$",
                re.I,
            ),
            "_drop_bloom_filter",
        ),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+AUTO\s+COMPACT"
                r"(?:\s+TARGET\s+(\d+)\s*MB)?"
                r"(?:\s+MIN\s+FILES\s+(\d+))?\s*$",
                re.I,
            ),
            "_set_auto_compact",
        ),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+AUTO\s+COMPACT\s*$",
                re.I,
            ),
            "_drop_auto_compact",
        ),
        (
            re.compile(r"^\s*VACUUM\s+(\w+)\s+MIRROR\s*$", re.I),
            "_vacuum_mirror",
        ),
        (
            re.compile(
                r"^\s*VACUUM\s+(\w+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?"
                r"(\s+DRY\s+RUN)?\s*$",
                re.I,
            ),
            "_vacuum",
        ),
        (
            re.compile(r"^\s*DESCRIBE\s+MIRROR\s+(\w+)\s*$", re.I),
            "_describe_mirror",
        ),
        (re.compile(r"^\s*SHOW\s+VERSIONS\s+(\w+)\s*$", re.I), "_show_versions"),
        (
            re.compile(r"^\s*GENERATE\s+SYMLINK\s+MANIFEST\s+FOR\s+(\w+)\s*$", re.I),
            "_generate_symlink",
        ),
        (
            re.compile(r"^\s*GENERATE\s+DELTA\s+LOG\s+FOR\s+(\w+)\s*$", re.I),
            "_generate_delta_log",
        ),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+DELTA\s+MIRROR"
                r"(?:\s+'([^']+)')?\s*$",
                re.I,
            ),
            "_set_delta_mirror",
        ),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+DELTA\s+MIRROR\s*$",
                re.I,
            ),
            "_drop_delta_mirror",
        ),
        (
            re.compile(
                r"^\s*OPTIMIZE\s+(\w+)(?:\s+TARGET\s+(\d+)\s*MB)?"
                r"(?:\s+SORT\s+BY\s*\(\s*([\w\s,]+?)\s*\)"
                r"|\s+ZORDER\s+BY\s*\(\s*([\w\s,]+?)\s*\))?\s*$",
                re.I,
            ),
            "_optimize",
        ),
        (
            re.compile(r"^\s*REORG\s+TABLE\s+(\w+)\s+PURGE\s*$", re.I),
            "_reorg_purge",
        ),
        (
            # parenthesized form: ADD COLUMNS (c TYPE) — the wrapper
            # parens are REQUIRED here so a bare `ADD COLUMN c
            # VARCHAR(20)` never loses its type's closing paren
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMNS?\s*"
                r"\(\s*(\w+)\s+([\w()\s,<>]+?)\s*\)\s*$",
                re.I,
            ),
            "_add_column",
        ),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMNS?\s+"
                r"(\w+)\s+([\w()\s,<>]+?)\s*$",
                re.I,
            ),
            "_add_column",
        ),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)"
                r"\s+TO\s+(\w+)\s*$",
                re.I,
            ),
            "_rename_column",
        ),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*$",
                re.I,
            ),
            "_drop_column",
        ),
        (
            re.compile(
                r"^\s*ALTER\s+TABLE\s+(\w+)\s+ALTER\s+COLUMN\s+(\w+)\s+"
                r"(?:TYPE|SET\s+DATA\s+TYPE)\s+([\w()\s,<>]+?)\s*$",
                re.I,
            ),
            "_widen_column",
        ),
        (re.compile(r"^\s*ALTER\b.*$", re.I | re.S), "_alter"),
        (
            re.compile(r"^\s*EXPLAIN\s+SCRIPT(?:\s+(ON|OFF))?\s*$", re.I),
            "_explain_script",
        ),
        (
            re.compile(r"^\s*EXPLAIN\s+FILES\s+(.*)$", re.I | re.S),
            "_explain_files",
        ),
        (re.compile(r"^\s*EXPLAIN\s+(.*)$", re.I | re.S), "_explain"),
        (
            re.compile(
                r"^\s*(LIST|SHOW|DESCRIBE)\s+CLASSIFIERS?(?:\s+(\w+))?\s*$", re.I
            ),
            "_list_classifiers",
        ),
        (
            re.compile(
                r"^\s*(LIST|SHOW|DESCRIBE)\s+CLUSTERERS?(?:\s+(\w+))?\s*$", re.I
            ),
            "_list_clusterers",
        ),
        (
            re.compile(r"^\s*(?:LIST|DESCRIBE)\s+REMAINING(?:\s+(\w+))?\s*$", re.I),
            "_list_remaining",
        ),
        (
            re.compile(
                r"^\s*(?:LIST|SHOW)\s+TABLES?"
                r"(?:\s+(\w+)(?:\.(\*|\w+))?)?\s*$",
                re.I,
            ),
            "_list_tables",
        ),
        (re.compile(r"^\s*(?:LIST|SHOW)\s+VIEWS\s*$", re.I), "_list_views"),
        (
            re.compile(r"^\s*(?:LIST|SHOW)\s+FILES\s+(\w+)\s*$", re.I),
            "_list_files",
        ),
        (
            re.compile(r"^\s*SHOW\s+CREATE\s+TABLE\s+(\w+)\s*$", re.I),
            "_show_create",
        ),
        (re.compile(r"^\s*SHOW\s+(?:CONFIG|OPTIONS)\s*$", re.I), "_show_config"),
        (
            re.compile(r"^\s*DESCRIBE\s+HISTORY\s+(\w+)\s*$", re.I),
            "_describe_history",
        ),
        (
            re.compile(r"^\s*DESCRIBE\s+DETAIL\s+(\w+)\s*$", re.I),
            "_describe_detail",
        ),
        (re.compile(r"^\s*DESCRIBE\s+(?:(\w+)\.)?(\w+)\s*$", re.I), "_describe"),
    ]

    def is_statement(self, sql: str) -> bool:
        return any(rx.match(sql) for rx, _ in self._ROUTES)

    def execute(self, sql: str):
        for rx, meth in self._ROUTES:
            m = rx.match(sql)
            if m:
                out = getattr(self, meth)(*m.groups())
                if self._catalog_dir:
                    self._persist_tables()
                return out
        raise ValueError(f"unroutable statement: {sql!r}")

    # ---- persisted table/view catalog (r9) ----

    def _tables_file(self) -> str:
        return os.path.join(self._catalog_dir, "tables.json")

    def _persist_tables(self) -> None:
        """Journal the table/view registries atomically after every
        routed statement (no-op diffing is not worth the complexity —
        the file is a few hundred bytes per registered object). Paths
        are stored as-is; with the warehouse under the catalog dir
        every managed table is durable alongside its registration."""
        import json
        import uuid

        state = {
            "managed": self.managed,
            "views": self.views,
            "manifest_tables": sorted(self.manifest_tables),
            "cas_manifest_tables": sorted(self.cas_manifest_tables),
        }
        target = self._tables_file()
        tmp = target + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh, indent=1, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, target)

    def _load_tables(self) -> None:
        """Restore persisted table/view registrations: tables first
        (manifest tables rebind through the snapshot reader, plain ones
        re-register their parquet path), then views in creation order
        (a view may reference earlier views). A registration whose
        backing data is gone stays listed but unbound, with a loud
        warning — same contract as restored locations."""
        import json
        import warnings

        try:
            with open(self._tables_file()) as fh:
                stored = json.load(fh)
        except FileNotFoundError:
            return
        self.manifest_tables = set(stored.get("manifest_tables", []))
        self.cas_manifest_tables = set(
            stored.get("cas_manifest_tables", [])
        )
        for name, path in stored.get("managed", {}).items():
            self.managed[name] = path
            try:
                if name in self.manifest_tables:
                    self._register_manifest(name)
                else:
                    self.engine.catalog.register_parquet(name, path)
            except Exception as exc:
                warnings.warn(
                    f"persisted table {name!r} at {path!r} could not be "
                    f"rebound ({exc}); it stays listed but unreadable "
                    "until its data returns or it is dropped"
                )
        for name, query in stored.get("views", {}).items():
            self.views[name] = query
            try:
                self._cview(name, query)
            except Exception as exc:
                warnings.warn(
                    f"persisted view {name!r} could not be rebound "
                    f"({exc}); it stays listed until its sources return "
                    "or it is dropped"
                )

    # ---- implementations ----

    def _path(self, name: str) -> str:
        # an explicit managed-path registration wins (a manifest table
        # can live OUTSIDE the warehouse — e.g. a prebuilt bench table
        # or an adopted external dataset); default is warehouse-relative
        return self.managed.get(name.lower()) or os.path.join(
            self.warehouse, name.lower()
        )

    def _materialize(self, name: str, df) -> None:
        path = self._path(name)
        if name.lower() in self.manifest_tables:
            self._manifest(name).overwrite(df)
            self._register_manifest(name)
            return
        key = name.lower()
        # claim the name BEFORE the (long) write, under the engine's
        # publish lock: a concurrent wire-txn COMMIT publishing the same
        # name checks ddl.managed inside the same lock, so it can never
        # rename its staging dir over this in-flight creation's
        # still-empty directory (ADVICE r12). Rolled back on write
        # failure so a failed CTAS leaves no phantom registration.
        lock = self.engine.publish_lock
        with lock:
            claimed = key not in self.managed
            if claimed:
                self.managed[key] = path
        try:
            df.write.mode("overwrite").parquet(path)
        except BaseException:
            if claimed:
                with lock:
                    if self.managed.get(key) == path:
                        del self.managed[key]
            raise
        self.managed[key] = path
        self.engine.clear_table_provenance(name)
        self.engine.catalog.register_parquet(name, path)

    def _manifest(self, name: str):
        """The right ManifestTable flavor for a registered manifest table:
        CAS-committed (conditional-put pointer store, multi-host) when
        the table was converted with ... SET FORMAT MANIFEST CAS, else
        the flock-serialized local protocol."""
        from sclera_spark.sources.manifest import CasManifestTable, ManifestTable

        path = self._path(name)
        if name.lower() not in self.cas_manifest_tables and CasManifestTable.is_cas_table(path):
            # durable marker from a previous session/engine: this table's
            # commits MUST stay on the CAS path — flock commits here would
            # race cross-host writers
            self.cas_manifest_tables.add(name.lower())
        if name.lower() in self.cas_manifest_tables:
            return CasManifestTable(path, self._cas_store())
        return ManifestTable(path)

    def _cas_store(self):
        if self._cas is None:
            from sclera_spark.sources.manifest import FileCas

            self._cas = FileCas(os.path.join(self.warehouse, "_sclera_cas"))
        return self._cas

    def _register_manifest(self, name: str, schema=None) -> None:
        # snapshot reads are cached per (table, version): the restore
        # after every pruned query (sources/prune.prune_query's finally)
        # and repeated registrations re-use the SAME DataFrame instead
        # of paying a fresh FileIndex + schema-inference job each time.
        # The version is the invalidation — EVERY commit bumps it,
        # including pure-metadata ones (ADD COLUMN's schema evolution)
        # that keep the file list unchanged but must change the read.
        # ``schema`` (r16): a read-schema hint for the NEW version,
        # passed only by callers that can PROVE it (COW DML whose
        # rewritten frame's schema equals the pre-commit snapshot's) —
        # it skips the footer-sampling inference job on the re-read.
        mt = self._manifest(name)
        self.managed[name.lower()] = self._path(name)
        version = mt.version()
        if not hasattr(self, "_mread_cache"):
            self._mread_cache: dict = {}
        key = (name.lower(), version)
        df = self._mread_cache.get(key)
        if df is not None:
            self._mread_cache[key] = self._mread_cache.pop(key)  # LRU
        else:
            df = mt.read(self.engine.spark, schema=schema)
            while len(self._mread_cache) >= 128:
                self._mread_cache.pop(next(iter(self._mread_cache)))
            self._mread_cache[key] = df
        self.engine.catalog.register(name, df)

    def _set_format_manifest(self, name: str, cas: str | None = None):
        """ALTER TABLE t SET FORMAT MANIFEST [CAS] — adopt a managed table
        into the atomic manifest-commit protocol (sources/manifest.py).
        DML on the table becomes crash-atomic: readers see the pre- or
        post-statement snapshot, never duplicates or partial commits.
        With CAS, the commit point is a durable conditional-put store
        (FileCas on the warehouse directory here; S3/GCS/DynamoDB in a
        real deployment — S3Cas/DynamoCas in sources/manifest.py), giving
        lock-free multi-host optimistic concurrency."""
        from sclera_spark.sources.manifest import CasManifestTable, ManifestTable

        if name.lower() not in self.managed:
            # adopt an external/catalog table into the warehouse first
            df = self.engine.table(name)
            path = self._path(name)
            df.write.mode("overwrite").parquet(path)
            self.managed[name.lower()] = path
        if cas:
            CasManifestTable.adopt(self._path(name), self._cas_store())
            self.cas_manifest_tables.add(name.lower())
        else:
            ManifestTable.convert(self._path(name))
        self.manifest_tables.add(name.lower())
        self._register_manifest(name)

    def _create_from_symlink(self, name: str, src: str):
        """CREATE TABLE t FROM SYMLINK MANIFEST '<path>' — register an
        external ``symlink_format_manifest`` snapshot (the layout our
        GENERATE SYMLINK MANIFEST and Delta's GENERATE emit) as a new
        manifest table: migration INTO the engine without copying data
        files (hard links; sources/manifest.import_symlink). The table
        is immediately a first-class manifest table — pruning, DML,
        time travel, OPTIMIZE all work atop the imported snapshot."""
        from sclera_spark.sources.manifest import ManifestTable

        if name.lower() in self.managed or name.lower() in (
            t.lower() for t in self.engine.catalog.tables
        ):
            raise ValueError(f"table {name} already exists")
        path = self._path(name)
        ManifestTable.import_symlink(src, path)
        self.managed[name.lower()] = path
        self.manifest_tables.add(name.lower())
        self._register_manifest(name)

    def _create_from_delta(self, name: str, src: str, mat_dvs=None):
        """CREATE TABLE t FROM DELTA '<table_dir>' [MATERIALIZE
        DELETION VECTORS] — replay an external Delta Lake table's
        public ``_delta_log`` (JSON add/remove actions atop an optional
        single- or multi-part checkpoint) to its live snapshot and
        register it as a new manifest table without copying data (hard
        links; sources/manifest.import_delta). Partitioned tables
        import zero-copy (partitionValues from the log become virtual,
        prunable columns); deletion vectors require the MATERIALIZE
        opt-in, which rewrites only the DV-carrying files with masked
        rows purged. The import is a first-class table: pruning, DML,
        time travel and OPTIMIZE all work atop it, and the source
        Delta table is never modified."""
        from sclera_spark.sources.manifest import ManifestTable

        if name.lower() in self.managed or name.lower() in (
            t.lower() for t in self.engine.catalog.tables
        ):
            raise ValueError(f"table {name} already exists")
        path = self._path(name)
        ManifestTable.import_delta(
            src, path, materialize_dvs=bool(mat_dvs)
        )
        self.managed[name.lower()] = path
        self.manifest_tables.add(name.lower())
        self._register_manifest(name)

    def _create_from_iceberg(self, name: str, src: str, mat_dels=None):
        """CREATE TABLE t FROM ICEBERG '<table_dir>' [MATERIALIZE
        DELETION VECTORS] — resolve an external Apache Iceberg table's
        current snapshot (public spec; sources/iceberg.py) and register
        its live parquet files as a new manifest table without copying
        data (hard links; sources/manifest.import_iceberg). POSITION
        and EQUALITY deletes are applied under the MATERIALIZE opt-in
        (the same spelling as the Delta importer — only delete-bearing
        files are rewritten with masked rows purged; equality deletes
        follow the spec's strictly-older-sequence + partition-scope
        rules); without it a delete manifest is a loud refusal.
        Object-store paths, field-id schema drift, and an unknown Avro
        codec are all LOUD refusals — never silent data loss. The import is a
        first-class table: pruning, DML, time travel and OPTIMIZE all
        work atop it; the source Iceberg table is never modified."""
        from sclera_spark.sources.manifest import ManifestTable

        if name.lower() in self.managed or name.lower() in (
            t.lower() for t in self.engine.catalog.tables
        ):
            raise ValueError(f"table {name} already exists")
        path = self._path(name)
        ManifestTable.import_iceberg(
            src, path, materialize_deletes=bool(mat_dels)
        )
        self.managed[name.lower()] = path
        self.manifest_tables.add(name.lower())
        self._register_manifest(name)

    @staticmethod
    def _ts_epoch(raw: str) -> float:
        """Parse a TIMESTAMP AS OF literal (ISO, naive = UTC)."""
        import datetime as _dt

        try:
            ts = _dt.datetime.fromisoformat(raw.replace("T", " "))
        except ValueError:
            raise ValueError(
                f"TIMESTAMP AS OF: cannot parse {raw!r} (use ISO "
                "'YYYY-MM-DD[ HH:MM:SS[.ffffff]]', taken as UTC)"
            )
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.timestamp()

    def _restore(self, name: str, version: str | None, ts: str | None = None):
        """RESTORE TABLE t TO VERSION [AS OF] n | TO TIMESTAMP AS OF
        '<ts>' — roll the table back (or forward) to a retained state
        as a NEW commit: a pure metadata operation at any table size
        (manifests name immutable files), history keeps moving forward,
        and the undone state stays time-travel readable until VACUUM.
        Delta's RESTORE, both addressing modes."""
        mt = self._require_manifest(name)
        v = (
            int(version)
            if version
            else mt.version_at_timestamp(self._ts_epoch(ts))
        )
        new_v = mt.restore(v)
        self._register_manifest(name)
        self._maybe_mirror(name)
        return [{"table": name, "restored_to": v, "new_version": new_v}]

    def _clone(
        self,
        name: str,
        src: str,
        version: str | None,
        ts: str | None = None,
    ):
        """CREATE TABLE c [SHALLOW] CLONE t [VERSION [AS OF] n |
        TIMESTAMP AS OF '<ts>'] — a zero-copy clone of a retained
        snapshot as an independent manifest table. Data files are
        hard-linked (O(files) metadata, not O(bytes)); unlike Delta's
        shallow clone, a same-filesystem clone keeps its bytes alive
        even if the source is vacuumed."""
        if name.lower() in self.managed or name.lower() in (
            t.lower() for t in self.engine.catalog.tables
        ):
            raise ValueError(f"table {name} already exists")
        src_mt = self._require_manifest(src)
        path = self._path(name)
        v = (
            int(version)
            if version
            else (
                src_mt.version_at_timestamp(self._ts_epoch(ts))
                if ts
                else None
            )
        )
        src_mt.clone(path, version=v)
        self.managed[name.lower()] = path
        self.manifest_tables.add(name.lower())
        self._register_manifest(name)

    def _require_manifest(self, name: str):
        if name.lower() not in self.manifest_tables:
            raise ValueError(
                f"{name} is not a manifest table (ALTER TABLE {name} SET "
                f"FORMAT MANIFEST first)"
            )
        return self._manifest(name)

    def _vacuum(self, name: str, retain: str | None, dry: str | None = None):
        """VACUUM t [RETAIN n VERSIONS] [DRY RUN] — physically delete
        data files unreferenced by the n newest manifests (default 1:
        live only). DRY RUN lists what a real vacuum would delete
        without deleting anything (Delta's VACUUM ... DRY RUN) — the
        safety check before the one irreversible storage operation."""
        mt = self._require_manifest(name)
        keep = int(retain) if retain else 1
        if dry:
            return mt.vacuum_preview(keep_versions=keep)
        return mt.vacuum(keep_versions=keep)

    def _optimize(
        self,
        name: str,
        target_mb: str | None,
        sort_by: str | None,
        zorder_by: str | None = None,
    ):
        """OPTIMIZE t [TARGET n MB] [SORT BY (cols) | ZORDER BY (cols)]
        — atomic small-file compaction on a manifest table
        (sources/manifest.py compact): rewrites sub-target part files
        into ~target-sized ones in one manifest commit, then rebinds
        the catalog view to the new snapshot. SORT BY range-clusters
        all live files on the given columns so filtered scans skip
        files on footer min/max; ZORDER BY clusters on a Morton
        space-filling-curve key (sources/zorder.py) so min/max stay
        tight on EVERY listed column and file-level data skipping works
        for probes on any of them. Row set unchanged; prior version
        stays time-travel readable until VACUUM."""
        mt = self._require_manifest(name)
        replaced = mt.compact(
            self.engine.spark,
            target_bytes=(int(target_mb) if target_mb else 128) * 1024 * 1024,
            cluster_by=(
                [c.strip() for c in sort_by.split(",")] if sort_by else None
            ),
            zorder_by=(
                [c.strip() for c in zorder_by.split(",")]
                if zorder_by
                else None
            ),
        )
        if replaced:
            self._register_manifest(name)
            self._maybe_mirror(name)
        return replaced

    def _reorg_purge(self, name: str):
        """REORG TABLE t PURGE — reclaim dropped-column bytes (r11):
        rewrites exactly the live files whose physical schema still
        carries a tombstoned column (sources/manifest.py reorg_purge),
        one atomic commit, clean files untouched, pre-PURGE versions
        still time-travel readable until VACUUM."""
        mt = self._require_manifest(name)
        replaced = mt.reorg_purge(self.engine.spark)
        if replaced:
            self._register_manifest(name)
            self._maybe_mirror(name)
        return [{"table": name, "rewritten_files": len(replaced)}]

    def _list_files(self, name: str):
        """LIST FILES t — per-file manifest metadata for the current
        snapshot of a manifest table (the observability face of the
        data-skipping tier; Delta's DESCRIBE DETAIL analogue): one dict
        per live file with size, exact row count, and the recorded
        column min/max that file-level pruning uses. Pure driver-side
        metadata — no Spark job at any table size."""
        import os as _os

        mt = self._require_manifest(name)
        stats = mt.file_stats()
        rows = mt.file_rows()
        out = []
        for path in mt.files():
            fname = _os.path.basename(path)
            try:
                size = _os.path.getsize(path)
            except OSError:
                # a concurrent VACUUM (or a foreign CAS writer advancing
                # the table mid-listing) may remove a file between the
                # manifest read and the stat; degrade that ROW, not the
                # whole statement (same contract as rows=None)
                size = None
            entry = {
                "file": fname,
                "bytes": size,
                "rows": rows.get(fname),
                "stats": stats.get(fname, {}),
            }
            bl = mt.file_bloom(fname)
            if bl:
                entry["bloom"] = sorted(bl)
            out.append(entry)
        return out

    def _set_bloom_filter(self, name: str, cols: str, fpp: str | None = None):
        """ALTER TABLE t SET BLOOM FILTER (c1, c2) [FPP 0.01] — per-file
        Bloom filter indexes (sources/bloom.py; Delta's bloom index
        analogue): equality and IN-set probes on the listed columns
        skip files whose filter proves the value absent — the skip for
        UNCLUSTERED columns, where min/max ranges cover everything.
        Existing live files are BACKFILLED with one distributed job
        now; every future commit blooms only its new files."""
        mt = self._require_manifest(name)
        columns = [c.strip() for c in cols.split(",") if c.strip()]
        mapping = mt.column_mapping()
        if mapping:
            # store PHYSICAL names: sidecars are built from and probed
            # against data files, which know nothing of renames
            by_name = {
                e["name"].lower(): e["physical"]
                for e in mapping
                if not e.get("dropped")
            }
            missing = [c for c in columns if c.lower() not in by_name]
            if missing:
                raise KeyError(
                    f"SET BLOOM FILTER: {missing} not columns of {name}"
                )
            columns = [by_name[c.lower()] for c in columns]
        meta: dict = {"bloom_columns": columns}
        if fpp:
            meta["bloom_fpp"] = float(fpp)
        mt.amend_meta(meta)
        self._bloom_backfill(name)

    def _set_auto_compact(
        self, name: str, target_mb: str | None, min_files: str | None
    ):
        """ALTER TABLE t SET AUTO COMPACT [TARGET n MB] [MIN FILES k] —
        opt-in post-commit compaction (Delta's autoCompact table
        property): after every INSERT / streaming micro-batch, if >= k
        live files sit under the n MB target they are bin-packed into
        one atomic replace_files commit. The change feed stays empty
        for those commits (rewritten rows cancel), so downstream CDC
        consumers are unaffected."""
        mt = self._require_manifest(name)
        cfg = {
            "target_bytes": int(target_mb or 128) * 1024 * 1024,
            "min_files": int(min_files or 8),
        }
        mt.amend_meta({"auto_compact": cfg})
        self._register_manifest(name)

    def _drop_auto_compact(self, name: str):
        mt = self._require_manifest(name)
        mt.amend_meta({"auto_compact": None})
        self._register_manifest(name)

    def _drop_bloom_filter(self, name: str):
        """ALTER TABLE t DROP BLOOM FILTER — stop building filters and
        delete the existing sidecars (they would stay CORRECT — a
        sidecar is derived from its immutable file — but dropped means
        dropped)."""
        import shutil as _shutil

        mt = self._require_manifest(name)
        mt.amend_meta({"bloom_columns": None})
        _shutil.rmtree(mt.bloom_dir(), ignore_errors=True)

    def _bloom_backfill(self, name: str) -> None:
        mt = self._require_manifest(name)
        meta = mt.meta()
        cols = meta.get("bloom_columns")
        if not cols:
            return
        missing = [
            p
            for p in mt.files()
            if mt.file_bloom(os.path.basename(p)) is None
        ]
        if not missing:
            return
        from sclera_spark.sources.bloom import build_blooms

        mt.store_blooms(
            build_blooms(
                self.engine.spark,
                missing,
                cols,
                float(meta.get("bloom_fpp", 0.01)),
            )
        )

    def _describe_history(self, name: str):
        """DESCRIBE HISTORY t — retained commit history, newest first
        (Delta's history command analogue; sources/manifest.history):
        version, commit time, operation, file/row totals, add/remove
        deltas. Pure driver metadata, no Spark job."""
        return self._require_manifest(name).history()

    def _describe_mirror(self, name: str):
        """DESCRIBE MIRROR t — staleness of the table's Delta mirror
        (r13): mirror directory, the mirror's latest Delta version, the
        source version it captured, the table's current version, and
        the refresh lag. Pure driver metadata; raises when no mirror is
        configured (a silent empty result would read as 'fresh')."""
        status = self._require_manifest(name).mirror_status()
        if status is None:
            raise ValueError(
                f"table {name!r} has no Delta mirror configured "
                "(ALTER TABLE ... SET DELTA MIRROR)"
            )
        return [status]

    def _vacuum_mirror(self, name: str):
        """VACUUM t MIRROR — unlink custom-mirror data files referenced
        neither by the mirror log's current version nor by any retained
        source version, WITHOUT touching the source table's versions
        (the directed form of the hygiene VACUUM runs implicitly —
        r13). Returns the unlinked file names."""
        return self._require_manifest(name).vacuum_mirror_directed()

    def _show_versions(self, name: str):
        """SHOW VERSIONS t — retained manifest versions, newest last."""
        return self._require_manifest(name).versions()

    def _generate_symlink(self, name: str):
        """GENERATE SYMLINK MANIFEST FOR t — export the current snapshot
        in the Hive symlink_format_manifest layout (Delta's interop
        command for Presto/Trino/Athena; sources/manifest.py
        export_symlink_manifest). Returns the manifest file path."""
        return self._require_manifest(name).export_symlink_manifest()

    def _generate_delta_log(self, name: str):
        """GENERATE DELTA LOG FOR t — export the current snapshot as a
        public Delta Lake _delta_log (the write half of CREATE TABLE
        ... FROM DELTA; sources/manifest.py export_delta_log), stats
        included so external Delta readers data-skip like we do.
        Returns the commit file path."""
        return self._require_manifest(name).export_delta_log(
            self.engine.spark
        )

    def _set_delta_mirror(self, name: str, path: str | None = None):
        """ALTER TABLE t SET DELTA MIRROR ['<dir>'] — keep an
        incremental Delta-log export of the table current after every
        mutation (the live-mirror form of GENERATE DELTA LOG; default
        directory <table>/_delta_log). The first export runs NOW, so
        the mirror exists before any reader looks."""
        mt = self._require_manifest(name)
        mt.amend_meta({"delta_mirror": path or True})
        return mt.maybe_export_delta(self.engine.spark)

    def _drop_delta_mirror(self, name: str):
        """ALTER TABLE t DROP DELTA MIRROR — stop refreshing (the
        already-exported log stays on disk, truthfully frozen at its
        last commit)."""
        self._require_manifest(name).amend_meta({"delta_mirror": None})

    def _maybe_mirror(self, name: str) -> None:
        """Post-mutation hook: refresh the table's Delta mirror when
        configured. Maintenance, never a commit gate — a failure warns
        once per table; the export is idempotent so the next mutation
        retries."""
        if name.lower() not in self.manifest_tables:
            return
        try:
            self._manifest(name).maybe_export_delta(self.engine.spark)
        except Exception as exc:
            from sclera_spark.sources.manifest import warn_mirror_failure

            warn_mirror_failure(self.managed.get(name.lower(), name), exc)

    def table_at(self, name: str, version: int):
        """Time-travel read of a manifest table's retained version."""
        if name.lower() not in self.manifest_tables:
            raise ValueError(f"{name} is not a manifest table")
        return self._manifest(name).read(self.engine.spark, version)

    def _ctas(self, name: str, query: str):
        self._materialize(name, self.engine.sql(query))

    def _ctas_clustered(self, name: str, cols: str, query: str):
        """CREATE TABLE t CLUSTER BY (cols) AS query — materialize
        range-clustered on the given columns (repartitionByRange +
        sortWithinPartitions), so per-file min/max are tight from
        BIRTH and file-level data skipping works without a later
        OPTIMIZE ... SORT BY pass. The write layout is the whole
        feature; the logical result is plain CTAS."""
        keys = [c.strip() for c in cols.split(",") if c.strip()]
        df = self.engine.sql(query)
        missing = [c for c in keys if c not in df.columns]
        if missing:
            raise ValueError(
                f"CLUSTER BY column(s) {missing} not in the query output"
            )
        clustered = df.repartitionByRange(*keys).sortWithinPartitions(*keys)
        self._materialize(name, clustered)

    # Sclera type name -> Spark SQL type (reference sql/types/SqlType.scala;
    # SqlDecimal is double-precision float in the reference, :112-124)
    _TYPE_MAP = {
        "INT": "int", "INTEGER": "int", "SMALLINT": "short", "BIGINT": "long",
        "REAL": "float", "FLOAT": "double", "DOUBLE": "double",
        "DOUBLE PRECISION": "double", "DECIMAL": "double", "NUMERIC": "double",
        "BOOLEAN": "boolean", "BOOL": "boolean",
        "CHAR": "string", "CHARACTER": "string", "VARCHAR": "string",
        "CHARACTER VARYING": "string", "TEXT": "string", "CLOB": "string",
        "DATE": "date", "TIME": "timestamp", "TIMESTAMP": "timestamp",
        "BLOB": "binary",
    }

    def _create_table(self, name: str, body: str):
        schema = self.create_table_schema(body)
        empty = self.engine.spark.createDataFrame([], schema)
        self._materialize(name, empty)

    def create_table_schema(self, body: str):
        """Parse the body of CREATE TABLE name (col type [PRIMARY
        KEY|NOT NULL], ..., [PRIMARY KEY (cols)] [, FOREIGN KEY (cols)
        REFERENCES t(cols)]) into a StructType — the constraint surface
        of the reference (sql/datatypes/TableConstraint.scala;
        parse-tested in SqlParseSuite.scala:29-82). Constraints are
        validated for shape; Spark does not enforce them (neither does
        H2 for the reference's temp tables). Shared by autocommit
        CREATE TABLE and the wire transaction's deferred-registration
        CREATE."""
        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        cols: list[tuple[str, str, bool]] = []
        constraints: list[str] = []
        for item in self._split_assignments(body):
            item = item.strip()
            if re.match(r"^(PRIMARY\s+KEY|FOREIGN\s+KEY|UNIQUE|CHECK)\b", item, re.I):
                m = re.match(
                    r"^(?:PRIMARY\s+KEY|UNIQUE)\s*\(\s*[\w\s,]+\)\s*$"
                    r"|^FOREIGN\s+KEY\s*\(\s*[\w\s,]+\)\s+REFERENCES\s+\w+\s*(?:\(\s*[\w\s,]+\))?\s*$",
                    item,
                    re.I,
                )
                if not m:
                    raise ValueError(f"malformed table constraint: {item!r}")
                constraints.append(item)
                continue
            cm = re.match(
                r"^(\w+)\s+([A-Za-z]+(?:\s+(?:PRECISION|VARYING))?(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
                r"(\s+PRIMARY\s+KEY|\s+NOT\s+NULL|\s+NULL)?\s*$",
                item,
                re.I,
            )
            if not cm:
                raise ValueError(f"malformed column definition: {item!r}")
            col, typ, suffix = cm.group(1), cm.group(2), (cm.group(3) or "").strip().upper()
            base = re.sub(r"\s*\(.*\)$", "", typ).upper()
            spark_type = self._TYPE_MAP.get(base)
            if spark_type is None:
                raise ValueError(f"unknown column type: {typ!r}")
            nullable = suffix not in ("PRIMARY KEY", "NOT NULL")
            if suffix == "PRIMARY KEY":
                constraints.append(f"PRIMARY KEY ({col})")
            cols.append((col, spark_type, nullable))
        if not cols:
            raise ValueError("CREATE TABLE requires at least one column")
        return StructType(
            [StructField(c, _parse_datatype_string(t), n) for c, t, n in cols]
        )

    def _create_external(self, kind: str, params: str | None, query: str):
        """CREATE EXTERNAL <sink> ('param', ...) AS <query> — write the
        query result through the sink registry (reference
        SqlCudParser.scala:57-63 / ExternalTarget)."""
        args = [p.strip().strip("'") for p in (params or "").split(",") if p.strip()]
        df = self.engine.sql(query)
        self.engine.external_sink(kind, df, *args)

    def _cview(self, name: str, query: str):
        df = self.engine.sql(query)
        df.createOrReplaceTempView(name)
        self.views[name.lower()] = query
        self.engine.catalog.tables[name] = df

    def insert_frame(self, name: str, rest: str, target=None):
        """The incoming rows of ``INSERT INTO name <rest>`` as a
        DataFrame cast to the target schema — shared by the normal
        autocommit INSERT, the wire-transaction buffered INSERT (which
        stages the frame without committing), and the transaction-
        created-table path (``target`` passed explicitly because that
        table is not registered until COMMIT; no warehouse adoption)."""
        tbl = target if target is not None else self.engine.table(name)
        if re.match(r"^\s*VALUES", rest, re.I):
            incoming = self.engine.sql(f"SELECT * FROM ({rest}) AS __v")
            incoming = incoming.toDF(*tbl.columns)
        else:
            incoming = self.engine.sql(rest)
        if target is None and name.lower() not in self.managed:
            # adopt the existing table into the warehouse first
            self._materialize(name, tbl)
            tbl = self.engine.table(name)
        from pyspark.sql import functions as F

        # cast to the target schema: parquet append with mismatched physical
        # types (e.g. a decimal VALUES literal into a double column) would
        # corrupt reads
        return incoming.toDF(*tbl.columns).select(
            *[F.col(c).cast(tbl.schema[c].dataType) for c in tbl.columns]
        )

    def _insert(self, name: str, rest: str):
        incoming = self.insert_frame(name, rest)
        if name.lower() in self.manifest_tables:
            mt = self._manifest(name)
            mt.append(incoming)
            try:
                mt.maybe_autocompact(self.engine.spark)
            except Exception as exc:
                # maintenance, never a DML gate — but observable (r11)
                from sclera_spark.sources.manifest import (
                    warn_autocompact_failure,
                )

                warn_autocompact_failure(mt.path, exc)
            self._register_manifest(name)
            self._maybe_mirror(name)
            return
        incoming.write.mode("append").parquet(self._path(name))
        self.engine.catalog.register_parquet(name, self._path(name))

    def _update_transform(self, set_clause: str, where: str | None):
        """The row transform of ``UPDATE ... SET set_clause [WHERE where]``
        as a DataFrame → DataFrame closure — shared by autocommit COW /
        full rewrite and the wire-transaction staging path."""
        from pyspark.sql import functions as F

        assigns = {}
        for part in self._split_assignments(set_clause):
            col, expr = part.split("=", 1)
            assigns[col.strip()] = expr.strip()

        def transform(d):
            pred = F.expr(where) if where else F.lit(True)
            return d.select(
                *[
                    F.when(pred, F.expr(assigns[c])).otherwise(F.col(c)).alias(c)
                    if c in assigns
                    else F.col(c)
                    for c in d.columns
                ]
            )

        return transform

    def _delete_transform(self, where: str | None):
        """Survivors of ``DELETE [WHERE where]`` as a closure. SQL DELETE
        removes rows where the predicate IS TRUE; rows where it evaluates
        NULL survive. `~expr(where)` alone would yield NULL (→ dropped)
        for those rows, making the outcome depend on which part file a
        row happens to live in under copy-on-write."""
        from pyspark.sql import functions as F

        def keep(d):
            if where is None:
                return d.limit(0)
            return d.filter(~F.coalesce(F.expr(where), F.lit(False)))

        return keep

    def _update(self, name: str, set_clause: str, where: str | None):
        transform = self._update_transform(set_clause, where)
        if not (where and self._cow_rewrite(name, where, transform)):
            self._rewrite(name, transform(self.engine.table(name)))
        self._maybe_mirror(name)

    def _truncate(self, name: str):
        """TRUNCATE [TABLE] t — pg's spelling of an unconditional
        DELETE; on a manifest table the emptying is one atomic commit
        and the pre-truncate version stays time-travel readable."""
        self._delete(name, None)

    def _delete(self, name: str, where: str | None):
        keep = self._delete_transform(where)
        if not (where and self._cow_rewrite(name, where, keep)):
            self._rewrite(name, keep(self.engine.table(name)))
        self._maybe_mirror(name)

    # ---- MERGE (upsert; no reference counterpart — the file-granular
    # copy-on-write strategy a training-data pipeline needs for
    # incremental refreshes of 100 TB tables) ----

    @staticmethod
    def _top_level_when_positions(text: str) -> list[int]:
        """Offsets of top-level MERGE-clause WHEN keywords (outside
        parens/quotes). Only a WHEN followed by [NOT] MATCHED is a clause
        boundary — a CASE WHEN inside a SET value or guard expression is
        not (it is followed by its own condition, never by MATCHED)."""
        out, depth, i, n = [], 0, 0, len(text)
        while i < n:
            c = text[i]
            if c == "'":
                i += 1
                while i < n and text[i] != "'":
                    i += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and text[i : i + 4].upper() == "WHEN" and (
                i == 0 or not text[i - 1].isalnum()
            ) and re.match(r"WHEN\s+(?:NOT\s+)?MATCHED\b", text[i:], re.I):
                out.append(i)
                i += 4
                continue
            i += 1
        return out

    def _merge(self, name: str, talias: str, rest: str, _txn_stage=None):
        """MERGE INTO t AS a USING (src)|tbl AS b ON cond
        [WHEN MATCHED [AND g] THEN UPDATE SET c=v,... | DELETE]
        [WHEN NOT MATCHED [AND g] THEN INSERT (cols) VALUES (exprs) | INSERT *]

        Lowering: matched part files found via a `_metadata.file_path`
        probe join are rewritten through a LEFT JOIN CASE projection;
        untouched files stay in place; NOT MATCHED rows append as new
        files (anti-join). At most one matched clause; duplicate source
        matches duplicate target rows (no cardinality check — document,
        don't hide).

        ``_txn_stage`` (r11, via :meth:`txn_stage_merge`): a dict with
        key ``already_removed`` — instead of committing, the COW swap
        is STAGED (``staged`` tuple + ``removes`` basenames written
        back into the dict) for an atomic wire-transaction COMMIT.
        Only the manifest COW / insert-only shapes stage; anything
        that would need a full rewrite refuses (TxnDmlRefused), and a
        hit set overlapping ``already_removed`` refuses before any
        staging work."""
        from pyspark.sql import functions as F

        talias = talias or name  # standard MERGE INTO t USING ... (no alias)
        rest = rest.strip()
        if rest.startswith("("):
            from sclera_spark.plans.frontend import _find_balanced

            close = _find_balanced(rest, 0)
            src_df = self.engine.sql(rest[1 : close - 1])
            rest = rest[close:]
        else:
            m = re.match(r"^(\w+)", rest)
            src_df = self.engine.table(m.group(1))
            rest = rest[m.end() :]
        m = re.match(r"^\s*(?:AS\s+)?(\w+)\s+ON\s+(.*)$", rest, re.I | re.S)
        if m is None:
            raise ValueError("MERGE requires USING ... [AS] alias ON cond")
        salias, tail = m.group(1), m.group(2)

        # Re-alias user aliases to reserved internal names in every spliced
        # expression: a source alias that collides with a TARGET COLUMN
        # name (e.g. alias `s` on a table with column `s`) would otherwise
        # break Spark's name resolution inside the synthesized anti-join —
        # the correlated `s.k` resolves to field-extraction on the inner
        # relation's string column `s` instead of the outer alias.
        from sclera_spark.plans.frontend import _split_literals

        t_re = re.compile(rf"\b{re.escape(talias)}\s*\.", re.IGNORECASE)
        s_re = re.compile(rf"\b{re.escape(salias)}\s*\.", re.IGNORECASE)

        def _safe(expr: str | None) -> str | None:
            if expr is None:
                return None
            out = []
            for is_lit, chunk in _split_literals(expr):
                if is_lit:
                    out.append(chunk)
                else:
                    out.append(s_re.sub("__ms.", t_re.sub("__mt.", chunk)))
            return "".join(out)

        talias, salias = "__mt", "__ms"
        whens = self._top_level_when_positions(tail)
        if not whens:
            raise ValueError("MERGE requires at least one WHEN clause")
        cond = _safe(tail[: whens[0]].strip())
        clauses = [
            tail[a:b].strip() for a, b in zip(whens, whens[1:] + [len(tail)])
        ]

        upd = dele = ins = None
        for cl in clauses:
            cm = re.match(
                r"^WHEN\s+(NOT\s+)?MATCHED(?:\s+AND\s+(.*?))?\s+THEN\s+(.*)$",
                cl,
                re.I | re.S,
            )
            if cm is None:
                raise ValueError(f"bad MERGE clause: {cl!r}")
            negated, guard, action = cm.group(1), cm.group(2), cm.group(3).strip()
            if negated:
                im = re.match(
                    r"^INSERT\s*(?:\(([^)]*)\)\s*)?(?:VALUES\s*\((.*)\)|\*)\s*$",
                    action,
                    re.I | re.S,
                )
                if im is None:
                    raise ValueError(f"bad NOT MATCHED action: {action!r}")
                ins = (_safe(guard), im.group(1), _safe(im.group(2)))
            elif re.match(r"^DELETE\s*$", action, re.I):
                dele = _safe(guard) or "TRUE"
            else:
                um = re.match(r"^UPDATE\s+SET\s+(.*)$", action, re.I | re.S)
                if um is None:
                    raise ValueError(f"bad MATCHED action: {action!r}")
                upd = (_safe(guard) or "TRUE", _safe(um.group(1)))
        if upd and dele:
            raise ValueError("MERGE supports one WHEN MATCHED clause")

        if name.lower() not in self.managed:
            self._materialize(name, self.engine.table(name))
        path = self.managed[name.lower()]
        spark = self.engine.spark
        is_manifest = name.lower() in self.manifest_tables
        if is_manifest:
            mt = self._manifest(name)
            tgt = mt.read(spark)
        else:
            mt = None
            tgt = spark.read.parquet(path)
        cols = tgt.columns
        # read-your-own-writes (r12): a wire-transaction MERGE after
        # buffered writes unions the txn's staged parts into the target —
        # the match join, the matched-clause rewrite, and the NOT MATCHED
        # anti-join all see the transaction's own earlier INSERTs (pg
        # semantics). Hit staged parts are rewritten WHOLESALE and the
        # caller replaces the tuples in txn["parts"]; only published hit
        # files enter the COMMIT-time remove set.
        txn_parts = list((_txn_stage or {}).get("staged_parts") or [])
        staged_owner: dict[str, tuple] = {}
        if txn_parts:
            staged_files: list[str] = []
            for st in txn_parts:
                scratch, names_ = st
                for f in names_:
                    p = os.path.join(scratch, f)
                    staged_files.append(p)
                    staged_owner[os.path.abspath(p)] = st
            # published files this txn already rewrote are EXCLUDED
            # (their surviving rows live in the staged parts) — the
            # same overlay the SELECT path uses; without this an
            # anti-join could see a stale pre-rewrite row and silently
            # skip an insert
            pub_files = [
                p
                for p in mt.files()
                if os.path.basename(p)
                not in _txn_stage["already_removed"]
            ]
            mt.read(
                spark, file_paths=pub_files, file_col="__sclera_file"
            ).unionByName(
                mt.read(
                    spark, file_paths=staged_files, file_col="__sclera_file"
                )
            ).createOrReplaceTempView("__merge_t")
        elif is_manifest:
            # the file column must be materialized INSIDE read():
            # the hidden _metadata column does not resolve above the
            # partition-fill join of a partitioned Delta import
            mt.read(spark, file_col="__sclera_file") \
                .createOrReplaceTempView("__merge_t")
        else:
            tgt.withColumn("__sclera_file", F.col("_metadata.file_path")) \
                .createOrReplaceTempView("__merge_t")
        src_df.createOrReplaceTempView("__merge_s")
        try:
            ins_stage = None
            pending_ins = None
            cached_ins = None
            ins_n = 0
            if ins:
                # materialize inserts BEFORE the matched-file swap: every
                # clause must see the pre-merge snapshot, and the anti-join
                # would otherwise read files the swap just deleted
                guard, ins_cols, ins_vals = ins
                if ins_vals is None:  # INSERT *
                    pairs = {
                        c: f"{salias}.{c}" if c in src_df.columns else "NULL"
                        for c in cols
                    }
                else:
                    from sclera_spark.plans.frontend import _split_top_commas

                    names = [
                        c.strip().lower()
                        for c in (ins_cols or ", ".join(cols)).split(",")
                    ]
                    vals = [v.strip() for v in _split_top_commas(ins_vals)]
                    if len(names) != len(vals):
                        raise ValueError("INSERT column/value count mismatch")
                    given = dict(zip(names, vals))
                    pairs = {c: given.get(c.lower(), "NULL") for c in cols}
                proj = ", ".join(f"({e}) AS {c}" for c, e in pairs.items())
                gsql = f" AND ({guard})" if guard else ""
                new_rows = spark.sql(
                    f"SELECT {proj} FROM __merge_s {salias} "
                    f"WHERE NOT EXISTS (SELECT 1 FROM __merge_t {talias} "
                    f"WHERE {cond}){gsql}"
                )
                new_rows = new_rows.select(
                    *[F.col(c).cast(tgt.schema[c].dataType) for c in cols]
                )
                if is_manifest:
                    # manifest file removal is LOGICAL (pre-merge snapshot
                    # files stay on disk for time travel), so the lazy
                    # plan keeps reading the pre-state — no early staging
                    # needed; inserts ride the same atomic commit below
                    pending_ins = new_rows
                    if _txn_stage is not None:
                        # tag count: one extra job in the wire-txn path
                        # only; cached so staging reuses the anti-join
                        pending_ins = pending_ins.cache()
                        cached_ins = pending_ins
                        ins_n = pending_ins.count()
                else:
                    ins_stage = path + ".insstage"
                    new_rows.write.mode("overwrite").parquet(ins_stage)
            if upd or dele:
                # capped like _cow_rewrite: collect at most cap+1
                # distinct paths — a full-table MERGE never holds the
                # whole file list driver-side, it just trips use_cow
                hit_uris = [
                    r[0]
                    for r in spark.sql(
                        f"SELECT DISTINCT {talias}.__sclera_file "
                        f"FROM __merge_t {talias} JOIN __merge_s {salias} "
                        f"ON {cond} LIMIT {self.cow_file_cap + 1}"
                    ).collect()
                ]
                if hit_uris:
                    hits = self._local_hit_paths(hit_uris)
                    # COW needs local file ops; a huge hit list is better
                    # served by one distributed full rewrite than by a
                    # driver holding ~1M path strings
                    use_cow = hits is not None and len(hits) <= self.cow_file_cap
                    pub_hits = hits
                    if _txn_stage is not None:
                        if not use_cow:
                            raise TxnDmlRefused(
                                "MERGE inside a transaction: the match "
                                "condition touches more than "
                                f"{self.cow_file_cap} files (or "
                                "non-local storage); run it in "
                                "autocommit (outside BEGIN)"
                            )
                        if staged_owner:
                            # split the hit set: staged parts this txn
                            # buffered are rewritten wholesale and
                            # REPLACED in the caller's parts list; only
                            # published files join the COMMIT remove set
                            pub_hits = [
                                p
                                for p in hits
                                if os.path.abspath(p) not in staged_owner
                            ]
                            seen: list[tuple] = []
                            for p in hits:
                                st = staged_owner.get(os.path.abspath(p))
                                if st is not None and st not in seen:
                                    seen.append(st)
                            _txn_stage["replaced"] = seen
                            # a hit staged part is replaced WHOLESALE, so
                            # every file of the part must ride the
                            # rewrite (the LEFT-JOIN CASE carries
                            # unmatched rows through unchanged) — only
                            # rewriting the hit file would drop the
                            # part's sibling files' rows
                            hits = pub_hits + [
                                os.path.join(scratch, f)
                                for scratch, names_ in seen
                                for f in names_
                            ]
                        overlap = {
                            os.path.basename(p) for p in pub_hits
                        } & _txn_stage["already_removed"]
                        if overlap:
                            raise TxnDmlRefused(
                                "MERGE touches files already rewritten "
                                "earlier in this transaction — a second "
                                "rewrite would duplicate their "
                                "surviving rows; COMMIT first"
                            )
                    if use_cow:
                        # manifest tables read hit files through the
                        # table (column mapping: files store PHYSICAL
                        # names, the MERGE clauses reference logical)
                        sub = (
                            mt.read(spark, file_paths=hits)
                            if is_manifest
                            else spark.read.parquet(*hits)
                        )
                        sub.createOrReplaceTempView("__merge_tsub")
                    else:
                        tgt.createOrReplaceTempView("__merge_tsub")
                    if upd:
                        guard, set_clause = upd
                        assigns = {}
                        for part in self._split_assignments(set_clause):
                            c, e = part.split("=", 1)
                            assigns[c.strip().lower()] = e.strip()
                        proj = ", ".join(
                            f"CASE WHEN {salias}.__sm AND ({guard}) "
                            f"THEN ({assigns[c.lower()]}) "
                            f"ELSE {talias}.{c} END AS {c}"
                            if c.lower() in assigns
                            else f"{talias}.{c} AS {c}"
                            for c in cols
                        )
                        where = ""
                    else:
                        # IS NOT TRUE, not NOT(...): a matched row whose guard
                        # evaluates NULL must be KEPT (the clause does not
                        # apply), but NOT(TRUE AND NULL) is NULL → dropped
                        proj = ", ".join(f"{talias}.{c} AS {c}" for c in cols)
                        where = (
                            f" WHERE ({salias}.__sm IS TRUE AND ({dele}))"
                            f" IS NOT TRUE"
                        )
                    out = spark.sql(
                        f"SELECT {proj} FROM __merge_tsub {talias} "
                        f"LEFT JOIN (SELECT *, TRUE AS __sm FROM __merge_s) {salias} "
                        f"ON {cond}{where}"
                    )
                    if is_manifest:
                        # one atomic manifest publish covers the rewritten
                        # hit files AND the inserts — readers see the whole
                        # MERGE or none of it
                        if pending_ins is not None:
                            out = out.unionByName(pending_ins)
                            pending_ins = None
                        if _txn_stage is not None:
                            # affected-row tag (PG 15+ 'MERGE <n>'):
                            # matched rows whose clause guard holds,
                            # plus the anti-join inserts — one count
                            # over the small COW hit subset
                            g = upd[0] if upd else dele
                            matched_n = spark.sql(
                                f"SELECT count(*) FROM __merge_tsub "
                                f"{talias} JOIN __merge_s {salias} "
                                f"ON {cond} WHERE ({g}) IS TRUE"
                            ).collect()[0][0]
                            _txn_stage["n"] = matched_n + ins_n
                            staged_t = mt._stage(out)
                            ledger = _txn_stage.get("ledger")
                            if ledger is not None:
                                ledger.append(staged_t)
                            _txn_stage["staged"] = staged_t
                            _txn_stage["removes"] = {
                                os.path.basename(p) for p in pub_hits
                            }
                            return
                        if use_cow:
                            mt.replace_files(hit_uris, out)
                        else:
                            mt.overwrite(out)
                        self._register_manifest(name)
                    else:
                        staging = path + ".cowstage"
                        out.write.mode("overwrite").parquet(staging)
                        if use_cow:
                            self._commit_cow(path, staging, hits)
                        else:
                            self._swap_dir(path, staging)
            if pending_ins is not None:
                # insert-only MERGE (or no matched rows) on a manifest table
                if _txn_stage is not None:
                    _txn_stage["n"] = ins_n
                    staged_t = mt._stage(pending_ins)
                    ledger = _txn_stage.get("ledger")
                    if ledger is not None:
                        ledger.append(staged_t)
                    _txn_stage["staged"] = staged_t
                    _txn_stage["removes"] = set()
                else:
                    mt.append(pending_ins)
                    self._register_manifest(name)
            if ins_stage is not None:
                for f in os.listdir(ins_stage):
                    if f.startswith("part-"):
                        os.rename(
                            os.path.join(ins_stage, f), os.path.join(path, f)
                        )
                shutil.rmtree(ins_stage)
        finally:
            if cached_ins is not None:
                cached_ins.unpersist()
            spark.catalog.dropTempView("__merge_t")
            spark.catalog.dropTempView("__merge_s")
            try:
                spark.catalog.dropTempView("__merge_tsub")
            except Exception:
                pass
        if _txn_stage is not None:
            return  # nothing committed; staging captured (or a no-op)
        if is_manifest:
            self._register_manifest(name)
            self._maybe_mirror(name)
        else:
            self.engine.catalog.register_parquet(name, path)

    _TXN_MERGE_RE = re.compile(
        r"^\s*MERGE\s+INTO\s+(\w+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?"
        r"\s+USING\s+(.*)$",
        re.I | re.S,
    )

    def txn_stage_merge(
        self,
        sql: str,
        already_removed: set[str],
        staged_parts: list | None = None,
        staged_table: str | None = None,
        ledger: list | None = None,
    ) -> tuple[str, tuple | None, set[str], int]:
        """Stage one MERGE for a wire transaction: same lowering as
        autocommit :meth:`_merge` (capped probe join, LEFT-JOIN CASE
        rewrite of hit files, anti-join inserts — all against the
        pre-transaction snapshot), but the output is STAGED and the
        hit files' removal deferred to the transaction's single
        ``commit_staged(remove_names=...)`` publish, whose
        inside-the-lock liveness validation aborts on write-write
        conflicts. Refusals (TxnDmlRefused): non-manifest target,
        over-cap hit sets, and hit files this transaction already
        rewrote. Returns (table, staged|None, remove_basenames, n)
        where ``n`` is the affected-row count for the PG 15+
        ``MERGE <n>`` command tag (guard-matched rows + inserts).

        READ-YOUR-OWN-WRITES (r12): when ``staged_parts`` (the
        transaction's buffered staged tuples for this table) is given,
        the MERGE target is the published snapshot UNION the staged
        rows — the match join, matched-clause rewrite, and NOT MATCHED
        anti-join all see the transaction's own earlier INSERTs. Hit
        staged parts are rewritten wholesale into the new staged tuple
        and removed from ``staged_parts`` IN PLACE as the last step
        (savepoint marks keep referencing the retired tuples; the
        server reclaims them at transaction end via ``ledger``, which
        receives every scratch dir the moment it exists)."""
        m = self._TXN_MERGE_RE.match(sql)
        if m is None:
            raise TxnDmlRefused(
                f"cannot parse MERGE inside transaction: {sql[:80]!r}"
            )
        name, talias, rest = m.groups()
        if name.lower() not in self.manifest_tables:
            raise TxnDmlRefused(
                f"MERGE INTO {name} inside a transaction: only MANIFEST "
                "tables support buffered transactional DML (ALTER "
                "TABLE ... SET FORMAT MANIFEST)"
            )
        if staged_parts and (
            staged_table is not None and name.lower() != staged_table
        ):
            # statement targets a DIFFERENT table than the one this
            # transaction buffers — the caller's one-table-per-txn check
            # will refuse it; never match against foreign staged rows
            staged_parts = None
        ctx: dict = {
            "already_removed": set(already_removed),
            "staged": None,
            "removes": set(),
            "n": 0,
            "staged_parts": staged_parts,
            "ledger": ledger,
            "replaced": [],
        }
        self._merge(name, talias, rest, _txn_stage=ctx)
        if staged_parts is not None and ctx["replaced"]:
            # LAST step, after every Spark job succeeded: retire the hit
            # staged tuples from the caller's live parts list (their
            # rows ride the new staged tuple); scratch stays on disk for
            # savepoint marks until transaction end
            staged_parts[:] = [
                st for st in staged_parts if st not in ctx["replaced"]
            ]
        return name.lower(), ctx["staged"], ctx["removes"], ctx["n"]

    def _cow_rewrite(self, name: str, where: str, transform) -> bool:
        """Copy-on-write DML at parquet-file granularity (the Delta/Iceberg
        strategy, minus the transaction log): find the part files that
        actually contain matching rows via the `_metadata.file_path`
        column, rewrite ONLY those, and leave every other file untouched.
        At scale the WHERE predicate is pushed into the probe scan, so a
        selective update touches a handful of files instead of re-writing
        the whole table.  Returns False when the caller should fall back
        to a full rewrite (unmanaged table, all files hit, probe failed).
        No concurrent-writer protection — single-engine semantics, same as
        the reference's embedded-store DML (dbms/rdbms/*)."""
        from pyspark.sql import functions as F

        path = self.managed.get(name.lower())
        if path is None:
            return False
        if name.lower() in self.manifest_tables:
            mt = self._manifest(name)
            schema = self._mread_schema(name, mt)
            hits = self._manifest_dml_hits(mt, where, schema=schema)
            if hits is None:
                return False  # probe failed / over cap: full rewrite
            if not hits:
                return True  # nothing matches: DML is a no-op
            if len(hits) >= len(mt.files()):
                return False  # every file touched: full rewrite is simpler
            out = transform(
                mt.read(self.engine.spark, file_paths=hits, schema=schema)
            )
            # one atomic commit: old snapshot or new, never in between
            mt.replace_files(hits, out)
            # schema provably unchanged by this COW (the rewritten
            # frame's schema equals the snapshot's) -> the re-register
            # read may skip schema inference; any difference (e.g. a
            # widening SET) falls back to inference as before
            self._register_manifest(
                name,
                schema=schema if schema == out.schema else None,
            )
            return True
        try:
            base = self.engine.spark.read.parquet(path)
            probe = base.filter(F.expr(where))
            # LIMIT cap+1 BEFORE collecting: a broad predicate on a
            # million-file table must trip the fallback without ever
            # materializing the full path list on the driver — the
            # executors stop feeding distinct paths past the cap
            hit_uris = [
                r[0]
                for r in probe
                .select(F.col("_metadata.file_path"))
                .distinct()
                .limit(self.cow_file_cap + 1)
                .collect()
            ]
        except Exception:
            return False
        if not hit_uris:
            return True  # nothing matches: DML is a no-op
        hits = self._local_hit_paths(hit_uris)
        if hits is None or len(hits) > self.cow_file_cap:
            # non-local storage (s3a://, hdfs://) or a hit list too large to
            # hold driver-side: one distributed full rewrite instead
            return False
        all_parts = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("part-") and not f.endswith(".crc")
        ]
        if len(hits) >= len(all_parts):
            return False  # every file touched: full rewrite is simpler
        out = transform(self.engine.spark.read.parquet(*hits))
        staging = path + ".cowstage"
        out.write.mode("overwrite").parquet(staging)
        self._commit_cow(path, staging, hits)
        self.engine.catalog.register_parquet(name, path)
        return True

    # Above this many matched part files, COW falls back to a full rewrite
    # (a broad MERGE over a ~1M-file table must not collect ~1M URI strings
    # to the driver). Tests lower it to force the fallback path.
    cow_file_cap = 10_000

    def _mread_schema(self, name: str, mt):
        """The registered snapshot's StructType for ``mt``'s CURRENT
        version, from the _register_manifest read cache — a free,
        version-exact schema hint that lets the DML probe/rewrite
        reads skip Spark's footer-sampling inference job (measured
        ~75 ms per read; three reads per tiny COW statement). None on
        any miss: read() then infers exactly as before."""
        try:
            df = getattr(self, "_mread_cache", {}).get(
                (name.lower(), mt.version())
            )
            return df.schema if df is not None else None
        except Exception:
            return None

    def _manifest_dml_hits(
        self, mt, where: str, schema=None
    ) -> list[str] | None:
        """Hit part files of a manifest-table DML predicate: the capped,
        stats-narrowed COW probe shared by autocommit DML and the
        wire-transaction staging path. Returns the LOCAL paths of the
        files containing matching rows, [] when no file can match (the
        DML is a provable no-op), or None when the caller must fall
        back to a full rewrite (probe failed, non-local storage, or
        more than ``cow_file_cap`` files hit). ``schema`` is the
        version-exact read-schema hint (see _mread_schema)."""
        from pyspark.sql import functions as F

        from sclera_spark.sources.prune import filter_ranges

        try:
            # the file identity is materialized by read() itself:
            # the hidden _metadata column cannot be resolved above
            # the partition-fill join of a partitioned Delta import
            base = mt.read(
                self.engine.spark,
                file_col="__sclera_dml_file",
                schema=schema,
            )
            probe = base.filter(F.expr(where))
            # stats pre-narrowing: files whose recorded min/max
            # provably cannot satisfy the predicate cannot contain
            # hits, so the probe scan itself skips them — a keyed
            # DELETE on a clustered 100 TB table probes a handful
            # of files instead of scheduling a full-table scan
            ranges = filter_ranges(probe)
            if ranges:
                cand = mt.files_pruned(ranges)
                if not cand:
                    return []  # no file can match: DML is a no-op
                if len(cand) < len(mt.files()):
                    probe = mt.read(
                        self.engine.spark,
                        file_paths=cand,
                        file_col="__sclera_dml_file",
                        schema=schema,
                    ).filter(F.expr(where))
            # LIMIT cap+1 BEFORE collecting: a broad predicate on a
            # million-file table must trip the fallback without ever
            # materializing the full path list on the driver — the
            # executors stop feeding distinct paths past the cap
            hit_uris = [
                r[0]
                for r in probe
                .select(F.col("__sclera_dml_file"))
                .distinct()
                .limit(self.cow_file_cap + 1)
                .collect()
            ]
        except (ImportError, NameError):
            # a coding defect in the pre-narrowing path must surface,
            # not silently degrade every DML to a full-table rewrite
            raise
        except Exception:
            return None
        if not hit_uris:
            return []  # nothing matches: DML is a no-op
        hits = self._local_hit_paths(hit_uris)
        if hits is None or len(hits) > self.cow_file_cap:
            # non-local storage (s3a://, hdfs://) or a hit list too
            # large to hold driver-side
            return None
        return hits

    _TXN_UPDATE_RE = re.compile(
        r"^\s*UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$",
        re.I | re.S,
    )
    _TXN_DELETE_RE = re.compile(
        r"^\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*))?$", re.I | re.S
    )

    def txn_stage_dml(
        self,
        sql: str,
        already_removed: set[str],
        staged_parts: list | None = None,
        staged_table: str | None = None,
        ledger: list | None = None,
    ) -> tuple[str, tuple, set[str], int, str, list]:
        """Stage one UPDATE/DELETE for a wire transaction WITHOUT
        committing: run the COW probe against the pre-transaction
        snapshot, write the rewritten survivors of the hit files to a
        scratch dir via :meth:`ManifestTable._stage`, and hand the
        caller everything COMMIT needs to publish the swap atomically
        through ``commit_staged(remove_names=...)`` — whose
        inside-the-lock liveness validation makes a write-write
        conflict with a concurrent committer abort the transaction
        loudly. ROLLBACK is truthful by construction: nothing entered
        data/, only scratch dirs are discarded.

        READ-YOUR-OWN-WRITES (r12): when ``staged_parts`` (the
        transaction's buffered staged tuples for this table) is given,
        the predicate is ALSO applied to them — staged parts holding
        matching rows are rewritten through the same transform and
        REPLACED in the list in place (pg semantics: an UPDATE sees the
        transaction's own earlier INSERTs, a DELETE can un-insert
        them). Replaced tuples are NOT discarded here — savepoint marks
        may still reference them; the server retires them at
        transaction end via its ``all_staged`` ledger. A statement
        whose hit files intersect ``already_removed`` (a PUBLISHED file
        this transaction already rewrote) is still refused — replaying
        two rewrites of one published file would duplicate its
        surviving rows; staged parts have no such hazard because each
        rewrite replaces the part wholesale.

        ``ledger`` (the transaction's all_staged list) receives EVERY
        scratch tuple the moment it is created — including the snapshot
        staging — so rollback/disconnect cleanup reclaims scratch dirs
        even when this statement dies mid-flight; transaction state
        (``staged_parts``) mutates only as the LAST step, after every
        Spark job has succeeded, so a failed statement is a clean no-op.

        Returns (table, staged, remove_basenames, affected_rows, verb,
        created) where ``created`` lists newly-staged tuples from
        staged-part rewrites.
        Raises :class:`TxnDmlRefused` for anything that cannot be
        staged truthfully."""
        from pyspark.sql import functions as F

        m = self._TXN_UPDATE_RE.match(sql)
        if m:
            verb = "UPDATE"
            name, set_clause, where = m.groups()
            transform = self._update_transform(set_clause, where)
        else:
            m = self._TXN_DELETE_RE.match(sql)
            if m is None:
                raise TxnDmlRefused(
                    f"cannot parse DML inside transaction: {sql[:80]!r}"
                )
            verb = "DELETE"
            name, where = m.groups()
            transform = self._delete_transform(where)
        if name.lower() not in self.manifest_tables:
            raise TxnDmlRefused(
                f"{verb} {name} inside a transaction: only MANIFEST "
                "tables support buffered transactional DML (ALTER "
                "TABLE ... SET FORMAT MANIFEST)"
            )
        mt = self._manifest(name)
        spark = self.engine.spark
        created: list = []
        n_staged_hits = 0
        if staged_parts and (
            staged_table is not None and name.lower() != staged_table
        ):
            # statement targets a DIFFERENT table than the one this
            # transaction buffers — the caller's one-table-per-txn
            # check will refuse it; never rewrite the buffered parts
            # with a foreign predicate
            staged_parts = None
        if where:
            hits = self._manifest_dml_hits(
                mt, where, schema=self._mread_schema(name, mt)
            )
            if hits is None:
                # over-cap / probe failure: full rewrite would stage a
                # whole-table copy inside the txn — refuse, run it in
                # autocommit where the COW fallback path handles it
                raise TxnDmlRefused(
                    f"{verb} inside a transaction: the predicate "
                    f"matches rows in more than {self.cow_file_cap} "
                    "files (or the hit probe failed); run this "
                    "statement in autocommit (outside BEGIN)"
                )
        else:
            hits = [p for p in mt.files()]
            if len(hits) > self.cow_file_cap:
                # a WHERE-less rewrite of a million-file table must not
                # stage a whole-table copy inside a transaction either
                raise TxnDmlRefused(
                    f"{verb} without WHERE inside a transaction would "
                    f"rewrite {len(hits)} files (cap "
                    f"{self.cow_file_cap}); run it in autocommit"
                )
        overlap = {os.path.basename(p) for p in hits} & already_removed
        if overlap:
            raise TxnDmlRefused(
                f"{verb} touches files already rewritten earlier in "
                "this transaction — a second rewrite would duplicate "
                "their surviving rows; COMMIT first, then run the "
                "statement in a new transaction"
            )
        # staged parts on a PARTITIONED import need no special case:
        # post-import writes carry the partition columns physically, and
        # the fill coalesce passes physical values through untouched
        # (imported files fill from the log's partitionValues; staged
        # files have no lookup entry and keep their physical columns)
        # --- snapshot (published-file) staging first: everything below
        # that can raise runs BEFORE any transaction state mutates, so
        # a failed statement (timeout, executor loss) leaves the txn
        # exactly as it was — never a half-applied UPDATE/DELETE that a
        # later COMMIT would make durable. Every scratch dir enters the
        # caller's ledger the moment it exists, so ROLLBACK/disconnect
        # cleanup reclaims it even if this statement dies mid-flight.
        staged = None
        n = 0
        removes: set[str] = set()
        if hits:
            hit_df = mt.read(spark, file_paths=hits)
            if verb == "DELETE":
                # one Spark job total: stage the survivors, then derive
                # the deleted-row count as (manifest-recorded rows of
                # the hit files) - (staged footer rows) — metadata reads
                import pyarrow.parquet as pq

                staged = mt._stage(transform(hit_df))
                if ledger is not None:
                    ledger.append(staged)
                frows = mt.file_rows()
                hit_names = [os.path.basename(p) for p in hits]
                if all(b in frows for b in hit_names):
                    before = sum(frows[b] for b in hit_names)
                else:  # pre-stats files: count the hit slice directly
                    before = hit_df.count()
                after = sum(
                    pq.ParquetFile(
                        os.path.join(staged[0], f)
                    ).metadata.num_rows
                    for f in staged[1]
                )
                n = before - after
                if n == 0:
                    type(mt).discard_staged([staged])
                    if ledger is not None and staged in ledger:
                        ledger.remove(staged)
                    staged = None
            else:
                # UPDATE's tag counts MATCHED rows — that needs the
                # predicate evaluated, but only over the hit files
                # (bounded by the probe cap, never a full-table job)
                n = (
                    hit_df.filter(F.expr(where)).count()
                    if where
                    else hit_df.count()
                )
                if n:
                    staged = mt._stage(transform(hit_df))
                    if ledger is not None:
                        ledger.append(staged)
            if staged is not None:
                removes = {os.path.basename(p) for p in hits}
        # --- read-your-own-writes rewrite of the txn's own staged
        # parts; the in-place list swap is the LAST statement so an
        # exception anywhere above leaves txn["parts"] untouched
        new_list = None
        if staged_parts:
            new_list = []
            for st in staged_parts:
                scratch, names_ = st
                files = [os.path.join(scratch, f) for f in names_]
                sdf = mt.read(spark, file_paths=files)
                matched = (
                    sdf.filter(F.expr(where)).count()
                    if where
                    else sdf.count()
                )
                if matched == 0:
                    new_list.append(st)
                    continue
                n_staged_hits += matched
                new_st = mt._stage(transform(sdf))
                if ledger is not None:
                    ledger.append(new_st)
                created.append(new_st)
                new_list.append(new_st)
        if new_list is not None:
            staged_parts[:] = new_list
        return (
            name.lower(),
            staged,
            removes,
            n + n_staged_hits,
            verb,
            created,
        )

    @staticmethod
    def _local_hit_paths(hit_uris: list[str]) -> list[str] | None:
        """Probe URIs → local filesystem paths, or None when any URI lives
        on non-local storage (s3a://, hdfs://, ...). Stripping the scheme
        off such a URI would silently turn it into a bogus local path; the
        caller must fall back to a distributed full rewrite instead."""
        from urllib.parse import urlparse

        out = []
        for uri in hit_uris:
            parsed = urlparse(uri)
            if parsed.scheme in ("", "file"):
                out.append(parsed.path if parsed.scheme else uri)
            else:
                return None
        return out

    @staticmethod
    def _commit_cow(path: str, staging: str, hits: list[str]) -> None:
        """Publish staged part files into the table directory FIRST, delete
        the replaced originals LAST: a crash mid-commit can leave duplicate
        rows (old + new file both present, re-runnable) but never lose
        data. Spark part-file names embed a write-UUID, so renames cannot
        collide with existing files."""
        for f in os.listdir(staging):
            if f.startswith("part-"):
                os.rename(os.path.join(staging, f), os.path.join(path, f))
        shutil.rmtree(staging)
        for f in hits:
            try:
                os.remove(f)
            except FileNotFoundError:
                pass  # a retried commit already removed it

    @staticmethod
    def _swap_dir(final: str, staging: str) -> None:
        """Replace a table directory via rename-aside: the table is only
        ever a single rename away from a complete copy (old or new), never
        half-deleted."""
        old = final + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(final, old)
        os.rename(staging, final)
        shutil.rmtree(old)

    def _rewrite(self, name: str, df) -> None:
        """Full-table rewrite through a staging path (parquet cannot
        overwrite its own input mid-read)."""
        if name.lower() in self.manifest_tables:
            self._manifest(name).overwrite(df)
            self._register_manifest(name)
            return
        staging = self._path(name) + ".staging"
        df.write.mode("overwrite").parquet(staging)
        final = self._path(name)
        if os.path.exists(final):
            self._swap_dir(final, staging)
        else:
            os.rename(staging, final)
        self.managed[name.lower()] = final
        self.engine.catalog.register_parquet(name, final)

    # ---- ML object DDL (reference SqlCudParser.scala:79-127:
    # CREATE CLASSIFIER [('alg'[,'opts'])] name (target) USING <query>,
    # CREATE CLUSTERER [('alg'[,'opts'])] name USING <query>) ----

    _NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}

    def _ml_features(self, df, exclude: str | None = None) -> list[str]:
        feats = [
            c
            for c, t in df.dtypes
            if c != exclude and t in self._NUMERIC_TYPES
        ]
        if not feats:
            raise ValueError("training query yields no numeric feature columns")
        return feats

    @staticmethod
    def _ml_opts(opts: str | None) -> dict[str, str]:
        out = {}
        for kv in (opts or "").split(","):
            if "=" in kv:
                k, v = kv.split("=", 1)
                out[k.strip().lower()] = v.strip().strip("'\"")
        return out

    # r12: the prescribed spelling — `USING <query> WITH (model='tree',
    # max_depth=6)` — peels a trailing option list off the training
    # query (a bare trailing `WITH (k=v,...)` is never valid SQL, so
    # the peel cannot eat query text); the legacy ('alg','opts') prefix
    # form still parses, WITH options win on conflict.
    _ML_WITH_RE = re.compile(
        r"^(.*?)\s+WITH\s*\(\s*(\w+\s*=\s*[^,()]+"
        r"(?:\s*,\s*\w+\s*=\s*[^,()]+)*)\s*\)\s*$",
        re.I | re.S,
    )

    _ML_MODEL_ALIASES = {
        "tree": "decision_tree", "decision_tree": "decision_tree",
        "logreg": "logistic", "logistic": "logistic",
        "forest": "random_forest", "random_forest": "random_forest",
        "stump": "stump", "kmeans": "kmeans", "voronoi": "voronoi",
        "text": "text_logistic", "text_logistic": "text_logistic",
        "fasttext": "text_logistic",
    }

    def _peel_ml_with(self, query: str, opts: str | None) -> tuple[str, dict]:
        o = self._ml_opts(opts)
        m = self._ML_WITH_RE.match(query)
        if m:
            query = m.group(1)
            o.update(self._ml_opts(m.group(2)))
        return query, o

    def _ml_algorithm(self, o: dict, alg, default: str) -> str:
        spelled = o.get("model", alg or default).lower()
        algorithm = self._ML_MODEL_ALIASES.get(spelled)
        if algorithm is None:
            raise ValueError(
                f"unknown model {spelled!r}; supported: "
                f"{sorted(set(self._ML_MODEL_ALIASES))}"
            )
        return algorithm

    def _create_classifier(self, alg, opts, name, target, query):
        query, o = self._peel_ml_with(query, opts)
        df = self.engine.sql(query)
        algorithm = self._ml_algorithm(o, alg, "decision_tree")
        if algorithm == "text_logistic":
            # the text classifier's feature is the RAW TEXT column —
            # the numeric-feature picker would drop it
            feats = [
                c for c, t in df.dtypes if c != target and t == "string"
            ]
            if len(feats) != 1:
                raise ValueError(
                    "CREATE CLASSIFIER ('text') needs exactly ONE "
                    f"string column besides the label, got {feats}"
                )
        else:
            feats = self._ml_features(df, exclude=target)
        self.engine.ml.create_classifier(
            name,
            df,
            label_col=target,
            feature_cols=feats,
            algorithm=algorithm,
            max_depth=int(o.get("max_depth", 5)),
        )

    def _create_clusterer(self, alg, opts, name, query):
        query, o = self._peel_ml_with(query, opts)
        df = self.engine.sql(query)
        self.engine.ml.create_clusterer(
            name,
            df,
            feature_cols=self._ml_features(df),
            k=int(o.get("k", 4)),
            algorithm=self._ml_algorithm(o, alg, "kmeans"),
        )

    def _drop_ml(self, kind: str, name: str):
        self.engine.ml.drop(name)

    def _drop(self, kind: str, name: str):
        self.engine.catalog.drop(name)
        self.engine.clear_table_provenance(name)
        self.views.pop(name.lower(), None)
        self.manifest_tables.discard(name.lower())
        path = self.managed.pop(name.lower(), None)
        # a CAS table's pointer lives in the store, not the table dir:
        # clear it with the drop, or a table RE-CREATED at the same
        # path adopts the dead pointer and resolves manifest versions
        # that no longer exist (r14 fuzz finding). The on-disk marker
        # is checked TOO (not just the in-memory set, which _manifest
        # populates lazily): a cross-session DROP whose first touch of
        # the table is the drop itself must still clear the pointer.
        is_cas = name.lower() in self.cas_manifest_tables
        if not is_cas and path:
            from sclera_spark.sources.manifest import CasManifestTable

            is_cas = CasManifestTable.is_cas_table(path)
        if is_cas:
            self.cas_manifest_tables.discard(name.lower())
            if path:
                try:
                    self._cas_store().delete_key(os.path.abspath(path))
                except Exception as exc:
                    import warnings

                    warnings.warn(
                        f"DROP {name}: could not clear the CAS pointer "
                        f"for {path}: {exc}"
                    )
        # Evict every cache slot pinned to the dropped table: a table
        # re-created under the same name restarts at version 1, so a
        # (name, version) key would otherwise serve the DELETED files.
        low = name.lower()
        mread = getattr(self, "_mread_cache", None)
        if mread:
            for k in [k for k in mread if k[0] == low]:
                del mread[k]
        pc = getattr(self.engine, "_plan_cache", None)
        if pc:
            # key[1] is the sorted ((table, version), ...) pin set
            for k in [
                k
                for k in pc
                if any(t == low for t, _ in k[1])
            ]:
                del pc[k]
        rc = getattr(self.engine, "_pruned_read_cache", None)
        if rc:
            for k in [k for k in rc if k[0] == low]:
                del rc[k]
        # dim-side dynamic-pruning bounds key on file LISTS, which the
        # rmtree invalidates wholesale — drops are rare, clear it all
        dc = getattr(self.engine, "_dyn_prune_cache", None)
        if dc:
            dc.clear()
        if path and os.path.exists(path):
            shutil.rmtree(path)

    # ---- admin: locations and indexes (SqlAdminParser.scala:43-95) ----

    def _add_location(self, readonly, name, kind, params, schema):
        args = [p.strip().strip("'") for p in params.split(",") if p.strip()]
        self.engine.add_named_location(
            name, kind, args, readonly=bool(readonly), schema=schema
        )

    def _remove_location(self, name):
        self.engine.remove_location(name)

    def _add_table(self, loc, table, as_name=None):
        if loc is None:
            loc = self.engine.config.get("default")
            if loc is None:
                raise ValueError("ADD TABLE needs loc.table or SET DEFAULT LOCATION")
        return self.engine.add_location_table(loc, table, as_name=as_name)

    def _remove_table(self, table):
        self.engine.catalog.drop(table)
        # stale location provenance would make the JDBC pushdown route
        # a future SAME-NAMED local table to the old remote database
        self.engine.clear_table_provenance(table)

    # engine options settable through SQL (reference SqlAdminParser's
    # config surface); unknown keys refuse loudly rather than set a
    # typo'd option that silently never applies
    _OPTION_KEYS = frozenset(
        {
            "jdbc_pushdown", "manifest_pruning", "metadata_only_count",
            "dynamic_file_pruning",
        }
    )

    def _set_option(self, key, value):
        """SET <option> = '<value>' — engine config toggles."""
        if key.lower() not in self._OPTION_KEYS:
            raise KeyError(
                f"unknown option {key!r}; settable options: "
                f"{sorted(self._OPTION_KEYS)}"
            )
        self.engine.config[key.lower()] = value.lower()

    def _set_location(self, param, name):
        """SET DEFAULT/CACHE LOCATION = loc (SqlAdminParser.scala:89-93)."""
        if name.lower() not in self.engine.locations:
            raise KeyError(f"unknown location: {name}")
        self.engine.config[param.lower()] = name.lower()

    def _create_index(self, idx, table, cols):
        """CREATE INDEX — lowered to a range-partitioned, sorted parquet
        rewrite of the table: Spark's analogue of a clustered index is
        row-group min/max data skipping, which needs the data laid out
        sorted on the key (the reference forwards CREATE INDEX to the
        location RDBMS for the same physical effect)."""
        key_cols = [c.strip() for c in cols.split(",") if c.strip()]
        df = self.engine.table(table)
        out = df.repartitionByRange(*key_cols).sortWithinPartitions(*key_cols)
        if table.lower() not in self.managed:
            self._materialize(table, out)
        else:
            self._rewrite(table, out)
        if not hasattr(self, "indexes"):
            self.indexes: dict[str, tuple[str, list[str]]] = {}
        self.indexes[idx.lower()] = (table.lower(), key_cols)

    def _drop_index(self, idx):
        if hasattr(self, "indexes"):
            self.indexes.pop(idx.lower(), None)

    def _list_locations(self):
        return sorted(self.engine.locations)

    def _native_statement(self, loc: str, sql: str):
        """`@location 'native sql'` (reference SqlNativeStatement,
        SqlCudParser.scala:304-308): run a query in the location's OWN
        dialect. For JDBC locations the text becomes a pushdown subquery
        (the remote database executes it; Spark just reads the cursor)."""
        info = self.engine.locations.get(loc.lower())
        if info is None:
            raise KeyError(f"unknown location: {loc}")
        if info["kind"] != "JDBC":
            raise ValueError(
                f"native statements need a JDBC location (got {info['kind']})"
            )
        sql = sql.replace("''", "'")
        url, opts = self.engine._location_jdbc(info)
        reader = self.engine.spark.read.format("jdbc").option(
            "url", url
        ).option("query", sql)
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load()

    def _add_column(self, name: str, col: str, typ: str):
        """ALTER TABLE t ADD COLUMN c <type> — schema evolution on a
        manifest table as a pure metadata commit (Delta's ADD COLUMNS):
        the evolved schema is recorded in the manifest meta and applied
        at read time, where files that predate the column fill TYPED
        nulls. No data file is touched at any table size; time travel
        sees the schema as of each version. Only manifest tables
        support this (a plain parquet table would need a rewrite)."""
        import json as _json

        mt = self._require_manifest(name)
        spark = self.engine.spark
        # parse the type through Spark itself (canonical + validated)
        try:
            dt = spark.sql(f"SELECT CAST(NULL AS {typ}) AS c").schema[
                0
            ].dataType
        except Exception:
            raise ValueError(
                f"ALTER TABLE {name} ADD COLUMN: invalid type {typ!r}"
            )
        from pyspark.sql.types import StructField, StructType

        if mt.column_mapping() is not None:
            # mapped table: the mapping assigns the new column a fresh
            # id and a never-reused physical name (manifest.py)
            mt.add_column_mapped(col, dt)
            self._register_manifest(name)
            self._maybe_mirror(name)
            return
        cur = mt.read(spark).schema
        if col.lower() in (f.name.lower() for f in cur.fields):
            raise ValueError(
                f"column {col!r} already exists on {name}"
            )
        evolved = StructType(
            [*cur.fields, StructField(col, dt, True)]
        )
        mt.amend_meta(
            {"table_schema": _json.dumps(evolved.jsonValue()), "_op": "add_column"}
        )
        self._register_manifest(name)
        self._maybe_mirror(name)

    def _rename_column(self, name: str, old: str, new: str):
        """ALTER TABLE t RENAME COLUMN a TO b — a pure metadata commit
        via column-mapping ids (sources/manifest.py): data files,
        footer stats, null counts and bloom sidecars key on the
        column's PHYSICAL name, which never changes, so every skipping
        structure stays live across the rename."""
        mt = self._require_manifest(name)
        mt.rename_column(self.engine.spark, old, new)
        self._register_manifest(name)
        self._maybe_mirror(name)

    def _drop_column(self, name: str, col: str):
        """ALTER TABLE t DROP COLUMN c — a metadata tombstone: reads
        stop projecting the column; files keep the bytes (reclaiming
        them is a rewrite, as in Delta); the physical name stays
        reserved so a later ADD COLUMN of the same name can never
        read the dead column's data."""
        mt = self._require_manifest(name)
        mt.drop_column(self.engine.spark, col)
        self._register_manifest(name)
        self._maybe_mirror(name)

    def _widen_column(self, name: str, col: str, typ: str):
        """ALTER TABLE t ALTER COLUMN c TYPE <wider> — type widening
        as a metadata commit; only in-place parquet promotions are
        legal (byte<short<int<long, float->double, int-family->
        double)."""
        mt = self._require_manifest(name)
        spark = self.engine.spark
        try:
            dt = spark.sql(f"SELECT CAST(NULL AS {typ}) AS c").schema[
                0
            ].dataType
        except Exception:
            raise ValueError(
                f"ALTER TABLE {name} ALTER COLUMN: invalid type {typ!r}"
            )
        mt.widen_column(spark, col, dt)
        self._register_manifest(name)
        self._maybe_mirror(name)

    def _show_create(self, name: str):
        """SHOW CREATE TABLE t — a reconstruction a user could replay:
        column list from the live schema, followed by the statements
        that re-establish the table's storage properties (manifest
        format, CAS commit point, bloom config). Views return their
        registered definition verbatim."""
        low = name.lower()
        if low in self.views:
            return [
                {
                    "create_sql": (
                        f"CREATE VIEW {name} AS {self.views[low].strip()}"
                    )
                }
            ]
        df = self.engine.table(name)
        cols = ",\n  ".join(
            f"{f.name} {f.dataType.simpleString().upper()}"
            for f in df.schema.fields
        )
        stmts = [f"CREATE TABLE {name} (\n  {cols}\n)"]
        if low in self.manifest_tables:
            cas = " CAS" if low in self.cas_manifest_tables else ""
            stmts.append(f"ALTER TABLE {name} SET FORMAT MANIFEST{cas}")
            try:
                meta = self._manifest(name).meta()
                bloom = meta.get("bloom_columns")
                if bloom:
                    fpp = meta.get("bloom_fpp", 0.01)
                    stmts.append(
                        f"ALTER TABLE {name} SET BLOOM FILTER "
                        f"({', '.join(bloom)}) FPP {fpp}"
                    )
            except Exception:
                pass
        return [{"create_sql": ";\n".join(stmts)}]

    def _describe_detail(self, name: str):
        """DESCRIBE DETAIL t (Delta's detail shape): one row with the
        table's storage identity — format, location, current version,
        commit time, live file/row totals, size on disk, and the
        configured storage properties (CAS commit point, bloom columns,
        evolved schema flag). Pure driver metadata at any size."""
        import os as _os

        mt = self._require_manifest(name)
        v = mt.version()
        files = mt.files()
        size = 0
        for p in files:
            try:
                size += _os.path.getsize(p)
            except OSError:
                pass
        meta = mt.meta()
        compact_state = mt.compact_state()
        from sclera_spark.sources.manifest import CasManifestTable

        return [
            {
                "name": name,
                "format": "manifest",
                "location": mt.path,
                "version": v,
                "committed_at": (
                    mt._commit_ts(v).isoformat(sep=" ")
                    if mt._commit_ts(v)
                    else None
                ),
                "num_files": len(files),
                "num_rows": mt.row_count(),
                "size_bytes": size,
                "cas": CasManifestTable.is_cas_table(mt.path),
                "bloom_columns": meta.get("bloom_columns"),
                "auto_compact": meta.get("auto_compact"),
                "delta_mirror": meta.get("delta_mirror"),
                "schema_evolved": "table_schema" in meta,
                "retained_versions": len(mt.versions()),
                "last_compact_at": compact_state.get("last_compact_at"),
                "last_compact_error": compact_state.get(
                    "last_compact_error"
                ),
            }
        ]

    def _explain_files(self, query: str):
        """EXPLAIN FILES <query> — data-skipping observability: for each
        manifest table the query scans, how many files the skipping tier
        would open vs the table's live total (min/max ranges, null
        probes, bloom filters, and dynamic join-derived constraints all
        applied, exactly as the real run would). A pure analysis pass:
        nothing is rebuilt or registered, no data job runs."""
        from sclera_spark.plans.frontend import lower_sql
        from sclera_spark.sources.prune import prune_query

        df = lower_sql(self.engine, query)
        report: dict = {}
        prune_query(self.engine, self, query, df, report=report)
        return [
            {
                "table": name,
                "kept_files": r["kept"],
                "total_files": r["total"],
                "skipped_pct": round(
                    100.0 * (1 - r["kept"] / r["total"]), 1
                )
                if r["total"]
                else 0.0,
            }
            for name, r in sorted(report.items())
        ]

    def _alter(self, *_):
        # parity with the reference: SqlCudParser.scala:299-302
        raise ValueError("ALTER statement is not supported")

    def _explain(self, query: str) -> str:
        return self.engine.explain(query)

    def _list_ml(self, kind: str, verb: str, name: str | None):
        """LIST/DESCRIBE CLASSIFIERS|CLUSTERERS [name] (reference
        SqlAdminParser.scala:128-132): short format = names; DESCRIBE
        adds the model kind, feature columns, and model class."""
        ml = self.engine.ml
        ml.hydrate_index()  # persisted models LIST before first use
        items = sorted(
            k for k, kd in ml.kinds.items() if kd == kind
        )
        if name:
            items = [k for k in items if k == name.upper()]
            if not items:
                raise KeyError(f"unknown {kind}: {name}")
        if verb.upper() != "DESCRIBE":
            return items
        # model_class reads the sidecar instead of PipelineModel.load()ing
        # every persisted model, and a stale sidecar (model dir deleted)
        # prints 'unavailable' rather than breaking the whole listing
        return [
            (
                k,
                kind,
                ",".join(ml.feature_cols.get(k, [])),
                ml.model_class(k),
            )
            for k in items
        ]

    def _list_classifiers(self, verb, name=None):
        return self._list_ml("classifier", verb, name)

    def _list_clusterers(self, verb, name=None):
        return self._list_ml("clusterer", verb, name)

    def _list_remaining(self, loc=None):
        """LIST REMAINING [loc] (SqlAdminParser.scala:109-113): tables
        present AT a location but not registered in the catalog — the
        data-virtualization discovery command. Directory locations list
        their files; JDBC locations query the database's own catalog
        (Derby SYS.SYSTABLES / ANSI information_schema)."""
        engine = self.engine
        locs = [loc] if loc else sorted(engine.locations)
        registered = {t.lower() for t in engine.catalog.tables}
        out: list[tuple[str, str]] = []
        for l in locs:
            info = engine.locations.get(l.lower())
            if info is None:
                raise KeyError(f"unknown location: {l}")
            kind, params = info["kind"], info["params"]
            ext = {
                "PARQUETDIR": ".parquet", "DIR": ".parquet",
                "PARQUET": ".parquet", "CSV": ".csv", "JSON": ".json",
            }.get(kind)
            names: list[str] = []
            if ext is not None:
                base = params[0]
                if os.path.isdir(base):
                    names = sorted(
                        f[: -len(ext)]
                        for f in os.listdir(base)
                        if f.endswith(ext)
                    )
            elif kind == "JDBC":
                url, opts = engine._location_jdbc(info)
                meta_q = (
                    "(SELECT TABLENAME AS name FROM SYS.SYSTABLES "
                    "WHERE TABLETYPE = 'T') t"
                    if url.lower().startswith("jdbc:derby")
                    else "(SELECT table_name AS name FROM "
                    "information_schema.tables) t"
                )
                reader = (
                    engine.spark.read.format("jdbc")
                    .option("url", url)
                    .option("dbtable", meta_q)
                )
                for k, v in opts.items():
                    reader = reader.option(k, v)
                names = sorted(r[0] for r in reader.load().collect())
            out += [
                (l.lower(), n) for n in names if n.lower() not in registered
            ]
        return out

    def _explain_script(self, flag=None):
        """EXPLAIN SCRIPT [ON|OFF] (SqlAdminParser.scala:153-163): toggle
        per-statement plan capture. While ON, every engine.sql() appends
        its formatted physical plan to engine.script_explains (the shell
        analogue of the reference's script-mode plan printing)."""
        on = flag is None or flag.upper() == "ON"
        self.engine.config["explain_script"] = "on" if on else "off"
        if on and not hasattr(self.engine, "script_explains"):
            self.engine.script_explains = []
        return f"EXPLAIN SCRIPT {'ON' if on else 'OFF'}"

    def _list_tables(self, arg1=None, arg2=None):
        """LIST TABLES [loc.* | loc.name | name] (reference
        SqlAdminParser.scala:114-127): unfiltered = every registered
        object; ``loc.*`` = registered tables ADDED from that location
        (provenance recorded by add_location_table); ``[loc.]name`` =
        existence-checked single entry."""
        every = sorted(
            set(self.engine.catalog.tables) | set(self.managed) | set(self.views)
        )
        if arg1 is None:
            return every
        prov = getattr(self.engine, "table_locations", {})
        if arg2 == "*":
            if arg1.lower() not in self.engine.locations:
                raise KeyError(f"unknown location: {arg1}")
            return sorted(
                t for t, l in prov.items() if l == arg1.lower()
            )
        name = (arg2 or arg1).lower()
        if arg2 is not None and prov.get(name) != arg1.lower():
            raise KeyError(f"{arg1}.{arg2}: not a table added from {arg1}")
        if name not in every and name not in prov:
            try:  # session-level temp views resolve too
                self.engine.table(name)
            except Exception:
                raise KeyError(f"unknown table: {name}") from None
        return [name]

    def _list_views(self):
        return sorted(self.views)

    def _show_config(self):
        """SHOW OPTIONS/CONFIG (reference SqlAdminParser.scala:97-130) —
        the engine-relevant Spark confs."""
        keys = [
            "spark.sql.session.timeZone",
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.enabled",
            "spark.sql.execution.arrow.pyspark.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
        out = []
        for k in keys:
            try:
                out.append((k, self.engine.spark.conf.get(k)))
            except Exception:
                out.append((k, None))
        # engine options (SET <option> = '<value>'): show effective
        # values, defaults included, so SHOW OPTIONS documents what a
        # session can toggle
        for k in sorted(self._OPTION_KEYS):
            out.append((k, self.engine.config.get(k, "on")))
        return out

    def _describe(self, loc: str | None, name: str):
        """DESCRIBE [loc.]table — the location-qualified form resolves
        through the location (lazy; JDBC metadata only, no scan);
        pg_catalog qualifies through the emulation tier, matching how
        clients introspect."""
        if loc and loc.lower() == "pg_catalog":
            df = self.engine.table(f"pg_catalog.{name}")
        elif loc:
            df = self.engine.location_table(loc, name)
        else:
            df = self.engine.table(name)
        return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]

    @staticmethod
    def _split_assignments(s: str) -> list[str]:
        """Split `a = f(x, y), b = 2` on top-level commas."""
        out, depth, cur = [], 0, []
        for ch in s:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out
