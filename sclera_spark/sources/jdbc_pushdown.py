"""Automatic co-located JDBC subtree pushdown.

The reference plans a whole join/aggregate subtree AT the location when
every leaf table lives there, emitting one dialect SQL text instead of
N per-table scans (exec/Planner.scala:113-212), with a per-location
``supportedFunctionsOpt`` gate deciding which expressions may travel
(sql/mapper/default/ScleraSqlMapper.scala:117-131). This module is the
Spark-native equivalent for queries run through ``ScleraEngine.sql``:
when every table a (lowered) query references was registered from ONE
JDBC location via ``ADD TABLE loc.tbl``, and the query passes a
conservative dialect gate, the whole query executes remotely as a
single ``spark.read.format("jdbc").option("query", ...)`` scan — one
round trip, one JDBCRelation in the plan, join/agg done by the remote
engine next to its data.

Safety model (a wrong pushdown is silent data corruption, so every
check fails TOWARD the local path):

- **Function gate**: every ``name(``-shaped token must be in the
  location dialect's allowlist (ANSI core; the reference's
  supportedFunctionsOpt). Unknown function → local.
- **Construct gate**: blocked keywords (LIMIT/OFFSET/FETCH, window
  functions, LATERAL, VALUES, Spark-only predicates, ...) → local.
  FETCH/LIMIT are blocked because remote NULL-ordering and tie-breaks
  differ; windows because remote support/semantics vary.
- **Containment gate**: every FROM/JOIN table reference must be a
  table of one JDBC location, and NO identifier anywhere in the query
  may collide with a locally-registered table (a comma-join or missed
  reference to a local table must never be resolved remotely).
- **Schema reconciliation**: the local (not executed) plan's schema is
  the contract. Remote column names must match case-insensitively in
  order; remote types must equal the expected type or widen losslessly
  (int family up, float→double, decimal scale-0 → long). An integer
  remote column where Spark expects floating point means the REMOTE
  engine already truncated (e.g. ANSI AVG(INT) = INT) → local.
- **Remote errors at schema-probe time** (dialect rejection) → local.
  The fallback is always the previous per-table-scan path, which
  stays filter-pushdown-capable. HONEST LIMIT: the query body runs
  lazily AFTER this module returns, so a remote error raised only at
  fetch time (division by zero under ANSI where non-ANSI Spark would
  return NULL) surfaces to the user rather than falling back — the
  gates are built to make the pushed text's semantics identical, not
  to replay a half-fetched result locally.

One semantics note, shared with the reference: a pushed subtree
evaluates string comparisons (collation, CHAR trailing-blank padding)
under the LOCATION's rules, exactly as the reference's pushdown does —
that is the contract of federating work to the system that owns the
data. Data whose semantics depend on it should disable pushdown
(``SET jdbc_pushdown = 'off'``) or rely on the per-table-scan path.

``SET jdbc_pushdown = 'off'`` disables the rewrite per engine.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# ANSI-core functions safe to evaluate remotely: identical semantics in
# Derby/PostgreSQL/ANSI and Spark for the types the schema gate admits.
# Deliberately absent: string concat fn (dialects differ), round
# (banker's vs half-up differs), division helpers, every window/regexp
# function, date arithmetic beyond extract-style parts. Removed after
# adversarial review (late r12): CAST (PG ROUNDS float->int where
# Spark truncates, and a CAST's output type can launder a remote
# truncation past the schema gate — e.g. CAST(AVG(int) AS DOUBLE) on
# Derby) and substr/substring (negative/zero start positions: Spark
# tail-slices, PG pads from position 1, Derby errors).
_ANSI_FUNCTIONS = frozenset(
    {
        "count", "sum", "min", "max", "avg",
        "abs", "mod", "sqrt", "floor", "ceil", "ceiling",
        "upper", "lower", "trim", "ltrim", "rtrim",
        "length", "char_length", "character_length",
        "coalesce", "nullif",
        "year", "month", "day", "hour", "minute", "second",
        "exists",  # EXISTS( parses as a fn-shaped token
    }
)

DIALECT_FUNCTIONS: dict[str, frozenset] = {
    # per-URL-prefix widening hooks; ANSI core is the floor. An URL
    # whose dialect is NOT listed here never pushes at all — even a
    # function-free query can diverge on an unknown engine (Oracle
    # treats '' as NULL, MySQL compares case-insensitively, ...).
    "derby": _ANSI_FUNCTIONS,
    "postgresql": _ANSI_FUNCTIONS,
}

# column names that collide with tokens Spark parses as literals or
# operators: the remote rewrite would turn the LITERAL spelling into a
# quoted column reference — refuse pushdown for tables carrying them
_RESERVED_TOKENS = frozenset(
    {
        "true", "false", "null", "and", "or", "not", "in", "is",
        "like", "between", "case", "when", "then", "else", "end",
        "select", "from", "where", "group", "by", "having", "join",
        "on", "as", "union", "all", "exists", "cast", "any", "some",
    }
)

_BLOCKED_RE = re.compile(
    r"(?i)\b(limit|offset|fetch|over|window|qualify|lateral|values|"
    r"pivot|unpivot|tablesample|distribute|cluster|ilike|rlike|regexp|"
    r"semi|anti|natural|with|grouping|rollup|cube|struct|array|map|"
    r"interval|extract|distinct\s+on|order)\b"
    # ORDER blocked with LIMIT/FETCH for the same reason: remote NULL
    # ordering (Derby/PG: nulls high) differs from Spark's ASC NULLS
    # FIRST, and a bare ORDER BY's output order is observable
)

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_$]*")


def _dialect_functions(url: str) -> frozenset | None:
    """The allowlist for a known dialect, or None for an unknown one —
    None means DO NOT PUSH (an unknown engine can diverge from Spark
    even on function-free text: '' IS NULL on Oracle, case-insensitive
    compares on MySQL)."""
    for key, fns in DIALECT_FUNCTIONS.items():
        if url.lower().startswith(f"jdbc:{key}"):
            return fns
    return None


def _nonliteral(sql: str) -> list[tuple[int, str]]:
    """(offset, text) chunks of sql outside single-quoted literals."""
    from sclera_spark.plans.frontend import _split_literals

    out = []
    pos = 0
    for is_lit, chunk in _split_literals(sql):
        if not is_lit:
            out.append((pos, chunk))
        pos += len(chunk)
    return out


def _scan(sql: str):
    """(funcs, idents, table_refs) over the non-literal text: fn-shaped
    tokens, all identifiers, and identifiers in table-reference position
    (immediately after FROM/JOIN at any depth)."""
    funcs: set[str] = set()
    idents: set[str] = set()
    refs: set[str] = set()
    prev: str | None = None
    prev_end = -1
    for _, chunk in _nonliteral(sql):
        prev_end = -1  # chunk boundary: a literal sat between tokens
        for m in _IDENT_RE.finditer(chunk):
            tok = m.group(0).lower()
            rest = chunk[m.end():].lstrip()
            if rest.startswith("("):
                funcs.add(tok)
            else:
                idents.add(tok)
                if (
                    prev in ("from", "join")
                    and prev_end >= 0
                    and chunk[prev_end: m.start()].strip() == ""
                ):
                    # directly after FROM/JOIN (no '(' between): a
                    # table reference, not a derived-table's SELECT
                    refs.add(tok)
            prev = tok
            prev_end = m.end()
    return funcs, idents, refs


def _widen_ok(remote, expected) -> bool:
    """May a remote column be cast LOSSLESSLY to the expected type?"""
    from pyspark.sql import types as T

    ints = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    if remote == expected:
        return True
    if isinstance(expected, T.LongType) and isinstance(remote, ints):
        return True
    if isinstance(expected, T.IntegerType) and isinstance(
        remote, (T.ByteType, T.ShortType)
    ):
        return True
    if isinstance(expected, T.DoubleType) and isinstance(
        remote, T.FloatType
    ):
        return True
    if isinstance(expected, T.LongType) and isinstance(
        remote, T.DecimalType
    ):
        # ANSI SUM(BIGINT) comes back DECIMAL(p,0); the values are
        # exact integers
        return remote.scale == 0
    return False


def try_pushdown(engine, sql: str) -> DataFrame | None:
    """One remote query for a fully co-located SELECT, or None to run
    the ordinary Spark path. Never raises: every gate and every
    schema-probe-time remote error falls back (fetch-time remote
    errors surface — see the module docstring's honest limit)."""
    prov = getattr(engine, "table_locations", None)
    if not prov:
        return None
    if engine.config.get("jdbc_pushdown", "on") == "off":
        return None
    jdbc_tables = {
        name: loc
        for name, loc in prov.items()
        if (engine.locations.get(loc) or {}).get("kind") == "JDBC"
    }
    if not jdbc_tables:
        return None
    if "`" in sql or "?" in sql or '"' in sql:
        # backticks are Spark-only; double-quoted identifiers would
        # collide with the column quoting the remote rewrite adds
        return None
    if "--" in sql or "/*" in sql or "\\" in sql:
        # the literal scanner handles neither SQL comments nor
        # backslash escapes — a quote inside a comment (or an escaped
        # quote) would desync it, letting blocked constructs slip past
        # the gates on a token stream neither engine agrees with
        return None
    if not re.match(r"(?is)\s*SELECT\b", sql):
        return None
    body = " ".join(chunk for _, chunk in _nonliteral(sql))
    if _BLOCKED_RE.search(body):
        return None
    if "/" in body:
        # `/` is TRUE division in Spark but ANSI integer division for
        # int operands on the remote (7/2 = 3.5 vs 3) — and a wrapping
        # expression (CAST, floor) gives both sides the same output
        # type, defeating the schema-reconciliation backstop
        return None
    # CAST gate: only CAST(<bare column> AS floating) may travel — it
    # is lossless in both engines and cannot launder anything (the
    # operand's remote type is the column's). Casting TO an int type
    # diverges (PG ROUNDS float->int, Spark truncates), and casting a
    # computed operand (CAST(AVG(x) AS DOUBLE)) would hide a remote
    # pre-truncation behind a matching output type.
    n_cast = len(re.findall(r"(?i)\bcast\s*\(", body))
    if n_cast:
        simple = re.findall(r"(?i)\bcast\s*\(([^()]*)\)", body)
        if len(simple) != n_cast or not all(
            re.match(
                r"(?is)^\s*[A-Za-z_][\w$.]*\s+AS\s+"
                r"(?:DOUBLE(?:\s+PRECISION)?|FLOAT|REAL)\s*$",
                s,
            )
            for s in simple
        ):
            return None
    funcs, idents, refs = _scan(sql)
    funcs.discard("cast")  # vetted above, shape-by-shape
    if not refs or not refs <= set(jdbc_tables):
        return None
    locs = {jdbc_tables[r] for r in refs}
    if len(locs) != 1:
        return None
    loc = locs.pop()
    info = engine.locations.get(loc) or {}
    try:
        url, opts = engine._location_jdbc(info)
    except Exception:
        return None  # unresolvable location params: local path
    allowed = _dialect_functions(url)
    if allowed is None or not funcs <= allowed:
        return None
    # no identifier anywhere may shadow ANY registered table outside
    # the reference set: a reference this scanner missed (comma-join,
    # correlated name) — local OR at a different JDBC location — must
    # never resolve against the chosen location's remote catalog
    other_tables = (
        {t.lower() for t in engine.catalog.tables} | set(jdbc_tables)
    ) - refs
    if idents & other_tables:
        return None
    # ...nor may it resolve as a Spark temp/global-temp view the
    # engine registry does not know (pg_catalog emulation views, user
    # temp views): those resolve locally in Spark but would resolve
    # against the remote system catalog in the pushed text
    try:
        session_views = {
            t.name.lower() for t in engine.spark.catalog.listTables()
        }
    except Exception:
        return None
    if idents & (session_views - refs):
        return None
    try:
        expected = engine.spark.sql(sql).schema
    except Exception:
        return None  # let the ordinary path surface the real error
    if len(set(f.name.lower() for f in expected.fields)) != len(
        expected.fields
    ):
        return None  # duplicate output names: reconciliation ambiguous
    remote_names = getattr(engine, "table_remote_names", {})
    # Spark's JDBC writer QUOTES column identifiers at CREATE time, so
    # the remote columns are case-sensitive exactly as the registered
    # DataFrame spells them — every column reference in the remote text
    # must be quoted the same way (table names are written unquoted)
    cat = {t.lower(): df for t, df in engine.catalog.tables.items()}
    col_exact: dict[str, str] = {}
    for r in sorted(refs):
        if r not in cat:
            return None
        for c in cat[r].columns:
            if c.lower() in _RESERVED_TOKENS:
                # a column literally named true/null/end/...: the
                # rewrite would turn the LITERAL spelling in the query
                # into a quoted column reference — never push
                return None
            prior = col_exact.setdefault(c.lower(), c)
            if prior != c:
                # same lowercase, different exact spellings across the
                # joined tables: the single quoting map cannot be
                # right for both — deterministic fallback, not a
                # set-iteration-order coin flip
                return None
    remote_sql = _rewrite_remote(
        sql, {n: remote_names.get(n, n) for n in refs}, col_exact
    )
    try:
        reader = (
            engine.spark.read.format("jdbc")
            .option("url", url)
            .option("query", remote_sql)
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        remote = reader.load()  # schema probe runs remotely HERE
    except Exception:
        return None  # dialect rejected the text: local path
    if len(remote.columns) != len(expected.fields):
        return None
    from pyspark.sql import functions as F

    cols = []
    for rf, ef in zip(remote.schema.fields, expected.fields):
        if rf.name.lower() != ef.name.lower():
            return None
        if not _widen_ok(rf.dataType, ef.dataType):
            return None
        c = F.col(rf.name)
        if rf.dataType != ef.dataType:
            c = c.cast(ef.dataType)
        cols.append(c.alias(ef.name))
    return remote.select(cols)


def _rewrite_remote(
    sql: str, tables: dict[str, str], col_exact: dict[str, str]
) -> str:
    """The remote dialect text: registered table names → remote names,
    and every known COLUMN identifier double-quoted in its exact
    DataFrame spelling (Spark's JDBC writer creates quoted columns).
    Outside literals only; fn-shaped tokens untouched."""
    from sclera_spark.plans.frontend import _split_literals

    out = []
    for is_lit, chunk in _split_literals(sql):
        if is_lit:
            out.append(chunk)
            continue

        def sub(m: re.Match) -> str:
            tok = m.group(0)
            rest = chunk[m.end():].lstrip()
            if rest.startswith("("):
                return tok
            low = tok.lower()
            if low in tables:
                return tables[low]
            if low in col_exact:
                return f'"{col_exact[low]}"'
            return tok

        out.append(_IDENT_RE.sub(sub, chunk))
    return "".join(out)
