"""pg_catalog emulation: the five virtual tables PostgreSQL clients probe
for introspection, built from the live engine catalog.

Reference: pgcatalog/PgCatalogSource.scala:62-452 (PG_TYPE, PG_NAMESPACE,
PG_CLASS, PG_ATTRIBUTE, PG_ATTRDEF), pgcatalog/PgCatalogFunction.scala:98-107
(PG_GET_USERBYID, PG_TABLE_IS_VISIBLE, PG_GET_EXPR, FORMAT_TYPE),
pgcatalog/PgCatalog.scala:31-46.  The reference materializes rows via an
embedded H2 in PostgreSQL mode; here the rows derive directly from the
Spark-side catalog (registered tables, DDL-managed views, named locations).

Divergence, documented: the reference namespaces each table under its
location's oid; our catalog does not track which location a registered
table came from, so all relations live under the 'sclera' namespace
(oid 0) and named locations appear as additional (empty) namespaces.

Scale note: these are driver-built metadata tables — dozens of rows,
`createDataFrame` on the driver is the correct plan.  The data path never
touches them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T

# Well-known PostgreSQL type oids (public constants, mirrored by H2's
# PgServer which the reference delegates to).
_PG_BOOL = 16
_PG_BYTEA = 17
_PG_NAME = 19
_PG_INT8 = 20
_PG_INT2 = 21
_PG_INT2VECTOR = 22
_PG_INT4 = 23
_PG_REGPROC = 24
_PG_TEXT = 25
_PG_OID = 26
_PG_FLOAT4 = 700
_PG_FLOAT8 = 701
_PG_UNKNOWN = 705
_PG_TEXTARRAY = 1009
_PG_BPCHAR = 1042
_PG_VARCHAR = 1043
_PG_DATE = 1082
_PG_TIME = 1083
_PG_TIMESTAMP = 1114
_PG_NUMERIC = 1700

# (oid, typname, typlen) — the surface the reference assembles from H2's
# INFORMATION_SCHEMA.type_info plus its four hand additions
# (PgCatalogSource.scala:126-172).
_PG_TYPES: list[tuple[int, str, int]] = [
    (_PG_NAME, "name", 64),
    (0, "null", -1),
    (_PG_INT2VECTOR, "int2vector", -1),
    (_PG_REGPROC, "regproc", 4),
    (_PG_BOOL, "bool", 1),
    (_PG_BYTEA, "bytea", -1),
    (_PG_INT8, "int8", 8),
    (_PG_INT2, "int2", 2),
    (_PG_INT4, "int4", 4),
    (_PG_TEXT, "text", -1),
    (_PG_OID, "oid", 4),
    (_PG_FLOAT4, "float4", 4),
    (_PG_FLOAT8, "float8", 8),
    (_PG_TEXTARRAY, "_text", -1),
    (_PG_BPCHAR, "bpchar", -1),
    (_PG_VARCHAR, "varchar", -1),
    (_PG_DATE, "date", 4),
    (_PG_TIME, "time", 8),
    (_PG_TIMESTAMP, "timestamp", 8),
    (_PG_NUMERIC, "numeric", -1),
]

_TYPLEN = {oid: ln for oid, _, ln in _PG_TYPES}

PG_TABLES = ("pg_type", "pg_namespace", "pg_class", "pg_attribute", "pg_attrdef")


def _spark_type_oid(dt: T.DataType) -> int:
    """Spark dtype -> pg type oid (reference maps JDBC codes via
    H2PgServer.convertType; PgCatalog.scala:57-76 is the inverse)."""
    if isinstance(dt, T.BooleanType):
        return _PG_BOOL
    if isinstance(dt, (T.ByteType, T.ShortType)):
        return _PG_INT2
    if isinstance(dt, T.IntegerType):
        return _PG_INT4
    if isinstance(dt, T.LongType):
        return _PG_INT8
    if isinstance(dt, T.FloatType):
        return _PG_FLOAT4
    if isinstance(dt, T.DoubleType):
        return _PG_FLOAT8
    if isinstance(dt, T.DecimalType):
        return _PG_NUMERIC
    if isinstance(dt, T.StringType):
        return _PG_VARCHAR
    if isinstance(dt, T.BinaryType):
        return _PG_BYTEA
    if isinstance(dt, T.DateType):
        return _PG_DATE
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return _PG_TIMESTAMP
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StringType):
        return _PG_TEXTARRAY
    return _PG_UNKNOWN


# pg_type oid -> human name for FORMAT_TYPE (PgCatalogFunction.scala:48-62)
FORMAT_TYPE_NAMES = {
    _PG_BOOL: "boolean",
    _PG_VARCHAR: "varchar",
    _PG_TEXT: "text",
    _PG_BPCHAR: "char",
    _PG_INT2: "smallint",
    _PG_INT4: "int",
    _PG_INT8: "bigint",
    _PG_NUMERIC: "decimal",
    _PG_FLOAT4: "real",
    _PG_FLOAT8: "float",
    _PG_TIME: "time",
    _PG_DATE: "date",
    _PG_TIMESTAMP: "timestamp",
    _PG_BYTEA: "varbinary",
    _PG_OID: "blob",
    _PG_TEXTARRAY: "array",
}


class PgCatalog:
    """Builds and registers the pg_catalog virtual tables as temp views.

    Oids are assigned per engine session, insertion-ordered, starting at
    'sclera' = 0 (reference PgCatalogSource.scala:424-436 TrieMap)."""

    def __init__(self, engine):
        self.engine = engine
        self._oids: dict[str, int] = {"SCLERA": 0}

    def _oid(self, key: str) -> int:
        return self._oids.setdefault(key.upper(), len(self._oids))

    # ---- relation enumeration ----

    def _relations(self) -> list[tuple[str, list[T.StructField], str]]:
        """(name, fields, relkind) for every visible table and view."""
        views = getattr(getattr(self.engine, "_ddl", None), "views", {}) or {}
        rels: dict[str, DataFrame] = {
            name.lower(): df for name, df in self.engine.catalog.tables.items()
        }
        # session temp views registered outside this engine's catalog dict
        # (e.g. a sibling engine sharing the SparkSession)
        for tv in self.engine.spark.catalog.listTables():
            key = tv.name.lower()
            if key not in rels and key not in PG_TABLES:
                try:
                    rels[key] = self.engine.spark.table(tv.name)
                except Exception:
                    continue
        out = []
        for name in sorted(rels):
            if (
                name in views
                or name.upper().startswith("SCLERATEMP_")
                or name.startswith("__")  # engine scratch views (__sclera_ext_*,
                # __merge_*, __align_*) must not leak into client introspection
            ):
                continue
            out.append((name, list(rels[name].schema.fields), "r"))
        for name, text in sorted(views.items()):
            try:
                fields = list(self.engine.sql(text).schema.fields)
            except Exception:
                fields = []
            out.append((name.lower(), fields, "v"))
        return out

    # ---- table builders ----

    def pg_type(self) -> DataFrame:
        rows = [
            (oid, name, 0, ln, "b" if name == "regproc" else "c", 0, -1, False, None)
            for oid, name, ln in _PG_TYPES
        ]
        return self.engine.spark.createDataFrame(
            rows,
            "oid int, typname string, typnamespace int, typlen smallint, "
            "typtype string, typbasetype int, typtypmod int, typnotnull boolean, "
            "typinput string",
        )

    def pg_namespace(self) -> DataFrame:
        rows = [(0, "sclera", 0)] + [
            (self._oid(loc), loc.lower(), 0) for loc in sorted(self.engine.locations)
        ]
        return self.engine.spark.createDataFrame(
            rows, "oid int, nspname string, nspowner int"
        )

    def pg_class(self) -> DataFrame:
        rows = []
        for name, fields, kind in self._relations():
            rows.append(
                (
                    self._oid(name),
                    name,
                    0,          # relnamespace: sclera (divergence note above)
                    0, 0, 0, 0, 0, 0,   # reltype..reltablespace
                    1,          # relpages
                    1.0,        # reltuples
                    1, 0, 0,    # relallvisible, reltoastrelid, reltoastidxid
                    False, False,
                    "p",        # relpersistence
                    kind,
                    len(fields),
                    0,
                    False, False, False, False, False,
                    True,
                    0, 0,
                )
            )
        return self.engine.spark.createDataFrame(
            rows,
            "oid int, relname string, relnamespace int, reltype int, "
            "reloftype int, relowner int, relam int, relfilenode int, "
            "reltablespace int, relpages int, reltuples float, "
            "relallvisible int, reltoastrelid int, reltoastidxid int, "
            "relhasindex boolean, relisshared boolean, relpersistence string, "
            "relkind string, relnatts smallint, relchecks smallint, "
            "relhasoids boolean, relhaspkey boolean, relhasrules boolean, "
            "relhastriggers boolean, relhassubclass boolean, "
            "relispopulated boolean, relfrozenxid int, relminmxid int",
        )

    def pg_attribute(self) -> DataFrame:
        rows = []
        for name, fields, _kind in self._relations():
            rel_oid = self._oid(name)
            for n, field in enumerate(fields, start=1):
                type_oid = _spark_type_oid(field.dataType)
                rows.append(
                    (
                        rel_oid * 100000 + n,
                        rel_oid,
                        field.name.lower(),
                        type_oid,
                        _TYPLEN.get(type_oid, -1),
                        n,
                        -1,
                        not field.nullable,
                        False,
                        False,
                    )
                )
        return self.engine.spark.createDataFrame(
            rows,
            "oid int, attrelid int, attname string, atttypid int, "
            "attlen smallint, attnum smallint, atttypmod int, "
            "attnotnull boolean, attisdropped boolean, atthasdef boolean",
        )

    def pg_attrdef(self) -> DataFrame:
        return self.engine.spark.createDataFrame(
            [],
            "oid int, adrelid int, adnum smallint, adbin string, adsrc string",
        )

    # ---- registration ----

    def table(self, name: str) -> DataFrame:
        key = name.lower().removeprefix("pg_catalog.")
        if key not in PG_TABLES:
            raise KeyError(f"Table not found: pg_catalog.{name}")
        return getattr(self, key)()

    def refresh(self) -> None:
        """(Re)register all five as temp views so plain Spark SQL resolves
        them; rows rebuild from the current catalog state."""
        for key in PG_TABLES:
            getattr(self, key)().createOrReplaceTempView(key)


def format_type_sql(arg: str) -> str:
    """Lower FORMAT_TYPE(oid) to a CASE over the public oid map
    (PgCatalogFunction.scala:48-62)."""
    arms = " ".join(
        f"WHEN {oid} THEN '{nm}'" for oid, nm in sorted(FORMAT_TYPE_NAMES.items())
    )
    return f"(CASE ({arg}) {arms} END)"
