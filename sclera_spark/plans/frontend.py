"""Sclera-dialect SQL front end.

The reference parses its dialect with Scala parser combinators
(modules/core/src/main/scala/sql/parser/SqlQueryParser.scala:95-1104) into
its own algebra. Here the strategy is dialect *lowering*: Sclera-specific
surface syntax is rewritten to Spark-SQL-native constructs (or routed to
our extended operators), and Spark's analyzer/Catalyst do the rest —
name resolution, optimization, execution. No custom executor.

Round-1 rewrites (text level, string-literal aware):
- ``expr::type``          -> ``CAST(expr AS type)``   (parser :803-812)
- ``DISTINCT ON (exprs)`` -> row_number window subquery (RelOp.scala:445-468)
- ``SELECT ... MATCH``    -> routed to the MATCH operator (WIP surface)
Spark SQL natively covers: ILIKE, * EXCEPT(...), FETCH FIRST, BETWEEN
SYMMETRIC (rewritten), IS DISTINCT FROM, LATERAL, etc.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _split_literals(sql: str) -> list[tuple[bool, str]]:
    """Split into (is_literal, text) chunks so rewrites skip string literals."""
    out: list[tuple[bool, str]] = []
    i, n = 0, len(sql)
    buf = []
    while i < n:
        c = sql[i]
        if c == "'":
            if buf:
                out.append((False, "".join(buf)))
                buf = []
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                elif sql[j] == "'":
                    j += 1
                    break
                else:
                    j += 1
            out.append((True, sql[i:j]))
            i = j
        else:
            buf.append(c)
            i += 1
    if buf:
        out.append((False, "".join(buf)))
    return out


_CAST_RE = re.compile(
    r"(\w+(?:\.\w+)*)\s*::\s*([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
)


def _rewrite_casts(text: str) -> str:
    """``a::int`` -> ``CAST(a AS int)``. Parenthesized operands
    (``(a+b)::int``) are left to Spark, which supports ``::`` natively —
    rewriting them textually would need balanced-paren capture and Spark
    does not need the help."""
    prev = None
    while prev != text:
        prev = text
        text = _CAST_RE.sub(lambda m: f"CAST({m.group(1)} AS {m.group(2)})", text)
    return text


# pg/Sclera type names Spark rejects (bare VARCHAR needs a length) or
# does not know (INT4, FLOAT8, ...), normalized in cast positions only —
# the DDL column-type path has its own map (ddl.py _TYPE_MAP)
_BARE_TYPE_MAP = {
    "VARCHAR": "STRING", "TEXT": "STRING", "CLOB": "STRING",
    "CHARACTER VARYING": "STRING", "CHARACTER": "STRING", "CHAR": "STRING",
    "BLOB": "BINARY", "BYTEA": "BINARY",
    "INT2": "SMALLINT", "INT4": "INT", "INT8": "BIGINT",
    "FLOAT4": "FLOAT", "FLOAT8": "DOUBLE",
}
_TYPE_ALT = "|".join(sorted(_BARE_TYPE_MAP, key=len, reverse=True)).replace(
    " ", r"\s+"
)
# `:: T` is an unambiguous cast context (covers the parenthesized-operand
# casts _rewrite_casts leaves to Spark); `CAST(simple AS T)` covers the
# spelled-out form for paren-free operands. A parameterized type
# (VARCHAR(10)) is valid Spark and stays untouched.
_COLONS_TYPE_RE = re.compile(
    rf"::\s*({_TYPE_ALT})\b(?!\s*\()", re.IGNORECASE
)
_CAST_AS_TYPE_RE = re.compile(
    rf"(CAST\s*\([^()]*?\s+AS\s+)({_TYPE_ALT})(\s*\))", re.IGNORECASE
)


def _normalize_cast_types(text: str) -> str:
    def canon(name: str) -> str:
        return _BARE_TYPE_MAP[" ".join(name.upper().split())]

    text = _COLONS_TYPE_RE.sub(lambda m: f"::{canon(m.group(1))}", text)
    return _CAST_AS_TYPE_RE.sub(
        lambda m: f"{m.group(1)}{canon(m.group(2))}{m.group(3)}", text
    )


_DISTINCT_ON_RE = re.compile(r"SELECT\s+DISTINCT\s+ON\s*\(", re.IGNORECASE)


_SQ_LIT = r"'(?:[^']|'')*'"
_SYMMETRIC_KW_RE = re.compile(r"\b(NOT\s+)?BETWEEN\s+SYMMETRIC\b", re.IGNORECASE)


def _forward_operand(text: str, i: int) -> tuple[int, int] | None:
    """Span of the scalar operand starting at/after ``i``: a quoted
    literal, a parenthesized expression, or an identifier/number with an
    optional call-argument list (``coalesce(x, 0)``), optionally followed
    by a ``:: TYPE`` cast."""
    n = len(text)
    while i < n and text[i].isspace():
        i += 1
    if i >= n:
        return None
    start = i
    if text[i] == "'":
        i = _skip_to_literal_end(text, i)
    elif text[i] == "(":
        i = _find_balanced(text, i)
    else:
        m = re.match(r"[\w.$-]+", text[i:])
        if m is None:
            return None
        i += m.end()
        j = i
        while j < n and text[j].isspace():
            j += 1
        if j < n and text[j] == "(":
            i = _find_balanced(text, j)
    m = re.match(r"\s*::\s*\w+", text[i:])
    if m:
        i += m.end()
    return start, i


def _top_level_and(text: str, i: int) -> int | None:
    """Offset of the first AND at paren depth 0 (outside literals) at or
    after ``i``."""
    depth, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            i = _skip_to_literal_end(text, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (
            depth == 0
            and text[i : i + 3].upper() == "AND"
            and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_"))
            and (i + 3 >= n or not (text[i + 3].isalnum() or text[i + 3] == "_"))
        ):
            return i
        i += 1
    return None


def _rewrite_symmetric(text: str) -> str:
    """`x [NOT] BETWEEN SYMMETRIC a AND b` -> the ANSI OR-expansion
    ``(x >= a AND x <= b) OR (x >= b AND x <= a)`` (reference
    ScalOp.scala:98-103). NOT lowered via `IS NOT TRUE`-free negation of
    the whole disjunction. The expansion — not least()/greatest() — is
    required for three-valued logic: Spark's least/greatest IGNORE NULL
    arguments, so a NULL bound would silently collapse to a one-sided
    range instead of yielding UNKNOWN. Operands may be arbitrary
    parenthesized expressions, function calls, literals, or identifiers;
    an unrecognizable operand fails loudly (Spark rejects the unrewritten
    SYMMETRIC keyword) rather than mis-rewriting."""
    while True:
        m = None
        for cand in _SYMMETRIC_KW_RE.finditer(text):
            if not _in_literal(text, cand.start()):
                m = cand
                break
        if m is None:
            return text
        xspan = _operand_span_before(text, m.start())
        if xspan is None:
            raise ValueError(
                f"cannot locate BETWEEN SYMMETRIC operand before: "
                f"{text[max(0, m.start() - 40) : m.start()]!r}"
            )
        and_pos = _top_level_and(text, m.end())
        if and_pos is None:
            raise ValueError("BETWEEN SYMMETRIC missing AND")
        lo = text[m.end() : and_pos].strip()
        hispan = _forward_operand(text, and_pos + 3)
        if hispan is None:
            raise ValueError("cannot locate BETWEEN SYMMETRIC upper bound")
        x = text[xspan[0] : xspan[1]]
        hi = text[hispan[0] : hispan[1]]
        neg = "NOT " if m.group(1) else ""
        expansion = (
            f"({neg}((({x}) >= ({lo}) AND ({x}) <= ({hi}))"
            f" OR (({x}) >= ({hi}) AND ({x}) <= ({lo}))))"
        )
        text = text[: xspan[0]] + expansion + text[hispan[1] :]


_QUANT_RE = re.compile(
    r"(?P<op><>|!=|<=|>=|=|<|>)\s*(?P<q>ALL|ANY|SOME)\s*\(",
    re.IGNORECASE,
)

# quantified comparison -> aggregate subquery rewrite. `x > ALL (S)` holds
# iff `x > max(S)` over the non-NULL elements; the CASE wrapper in
# _quant_case restores full ANSI three-valued logic (FALSE beats UNKNOWN
# for ALL, TRUE beats UNKNOWN for ANY, empty set -> TRUE/FALSE).
_QUANT_AGG = {
    (">", "ALL"): "max",
    (">=", "ALL"): "max",
    ("<", "ALL"): "min",
    ("<=", "ALL"): "min",
    (">", "ANY"): "min",
    (">=", "ANY"): "min",
    ("<", "ANY"): "max",
    ("<=", "ANY"): "max",
}


def _find_balanced(text: str, start: int) -> int:
    """Index just past the ')' matching the '(' at ``start``; parens
    inside single-quoted literals do not count."""
    depth = 0
    i = start
    n = len(text)
    while i < n:
        c = text[i]
        if c == "'":
            i += 1
            while i < n:
                if text[i] == "'" and i + 1 < n and text[i + 1] == "'":
                    i += 2
                elif text[i] == "'":
                    break
                else:
                    i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parentheses")


def _operand_span_before(text: str, pos: int) -> tuple[int, int] | None:
    """Span (start, end) of the scalar operand that ends just before
    ``pos``, scanning backwards. Handles three shapes:

    - parenthesized expressions, including nested parens and a preceding
      function name: ``(a + f(b))``, ``f(b)``, ``coalesce(x, 0)``
    - dotted identifiers / numbers: ``t.col``, ``42``
    - single-quoted literals: ``'abc'``

    Returns None when nothing recognizable precedes ``pos``.
    """
    j = pos - 1
    while j >= 0 and text[j].isspace():
        j -= 1
    if j < 0:
        return None
    if text[j] == ")":
        depth, i = 0, j
        while i >= 0:
            c = text[i]
            if c == "'":
                # backward over a literal: find the opening quote (the
                # '' escape is ambiguous backwards; operands embedding
                # escaped quotes inside parens are out of scope)
                i -= 1
                while i >= 0 and text[i] != "'":
                    i -= 1
            elif c == ")":
                depth += 1
            elif c == "(":
                depth -= 1
                if depth == 0:
                    k = i - 1
                    while k >= 0 and (text[k].isalnum() or text[k] in "._"):
                        k -= 1
                    return k + 1, j + 1
            i -= 1
        return None
    m = re.search(r"(\w+(?:\.\w+)*|'(?:[^']|'')*')$", text[: j + 1])
    if m is None:
        return None
    return m.start(1), j + 1


def _split_top_commas(text: str) -> list[str]:
    """Split on commas at paren depth 0, ignoring commas in literals."""
    parts, depth, cur, i, n = [], 0, [], 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            j = i + 1
            while j < n:
                if text[j] == "'" and j + 1 < n and text[j + 1] == "'":
                    j += 2
                elif text[j] == "'":
                    j += 1
                    break
                else:
                    j += 1
            cur.append(text[i:j])
            i = j
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


def _in_literal(text: str, pos: int) -> bool:
    """Is ``pos`` inside a single-quoted SQL string literal?"""
    cur = 0
    for is_lit, chunk in _split_literals(text):
        end = cur + len(chunk)
        if cur <= pos < end:
            return is_lit
        cur = end
    return False


def _quant_case(x: str, op: str, quant: str, subq: str) -> str:
    """ANSI three-valued lowering of `x OP ALL/ANY (subq)`.

    The core test reduces to a min/max comparison over the subquery's
    non-NULL elements; the CASE wrapper restores the ANSI corner cases:
    - ALL: any failing element -> FALSE even when NULLs are present;
      otherwise a NULL element (or NULL x) -> UNKNOWN; empty -> TRUE.
    - ANY: any passing element -> TRUE even when NULLs are present;
      otherwise a NULL element (or NULL x) -> UNKNOWN; empty -> FALSE.
    The subquery is restated in each scalar subexpression (up to 3x);
    Catalyst plans each as an independent scalar subquery — acceptable for
    a correctness-first surface, and the aggregates are cheap single-pass.
    """
    q = f"FROM ({subq}) AS __sclera_q(__v)"
    if (op, quant) in _QUANT_AGG:
        agg = _QUANT_AGG[(op, quant)]
        holds = f"{x} {op} (SELECT {agg}(__v) {q})"
    elif quant == "ALL" and op == "=":
        holds = f"({x} = (SELECT min(__v) {q}) AND {x} = (SELECT max(__v) {q}))"
    elif quant == "ANY" and op in ("<>", "!="):
        holds = f"({x} <> (SELECT min(__v) {q}) OR {x} <> (SELECT max(__v) {q}))"
    else:  # pragma: no cover - every op/quant pair is routed before here
        raise ValueError(f"unsupported quantified comparison: {op} {quant}")
    has_null = f"(SELECT count(*) - count(__v) {q}) > 0"
    is_empty = f"(SELECT count(*) {q}) = 0"
    if quant == "ALL":
        return (
            f"(CASE WHEN NOT coalesce({holds}, TRUE) THEN FALSE"
            f" WHEN {is_empty} THEN TRUE"
            f" WHEN {has_null} OR {x} IS NULL THEN CAST(NULL AS BOOLEAN)"
            f" ELSE {holds} END)"
        )
    return (
        f"(CASE WHEN coalesce({holds}, FALSE) THEN TRUE"
        f" WHEN {is_empty} THEN FALSE"
        f" WHEN {has_null} OR {x} IS NULL THEN CAST(NULL AS BOOLEAN)"
        f" ELSE {holds} END)"
    )


def _rewrite_quantified(text: str) -> str:
    """`expr > ALL (subquery)` -> ANSI CASE over min/max aggregates (see
    _quant_case), `= ANY` -> `IN`, `<> ALL` -> `NOT IN` (reference parser
    SqlQueryParser.scala:630-695). Matches inside string literals are
    left untouched."""
    search_from = 0
    while True:
        m = _QUANT_RE.search(text, search_from)
        if m is None:
            return text
        if _in_literal(text, m.start()):
            search_from = m.end()
            continue
        span = _operand_span_before(text, m.start())
        if span is None:
            search_from = m.end()
            continue
        x_start, x_end = span
        x = text[x_start:x_end]
        op = m.group("op")
        quant = m.group("q").upper()
        if quant == "SOME":
            quant = "ANY"
        open_paren = m.end() - 1
        close = _find_balanced(text, open_paren)
        subq = text[open_paren + 1 : close - 1]
        # if the captured operand is just the tail of a larger arithmetic
        # expression (`a + b > ALL (...)`), the CASE template would split
        # it — fall back to the plain aggregate rewrite (keeps the operand
        # in place; NULL-element semantics then follow the aggregate).
        j = x_start - 1
        while j >= 0 and text[j].isspace():
            j -= 1
        compound = j >= 0 and text[j] in "+-*/|%^"
        if op == "=" and quant == "ANY":
            repl = f"{x} IN ({subq})"
        elif op in ("<>", "!=") and quant == "ALL":
            repl = f"{x} NOT IN ({subq})"
        elif compound:
            if (op, quant) not in _QUANT_AGG:
                raise ValueError(
                    f"quantified {op} {quant} needs a simple or parenthesized "
                    f"left operand (got tail {x!r} of a compound expression)"
                )
            agg = _QUANT_AGG[(op, quant)]
            repl = f"{x} {op} (SELECT {agg}(__v) FROM ({subq}) AS __sclera_q(__v))"
        else:
            repl = _quant_case(x, op, quant, subq)
        text = text[:x_start] + repl + text[close:]


_SIMILAR_RE = re.compile(r"\b(NOT\s+)?SIMILAR\s+TO\b", re.IGNORECASE)


def sql_pattern_to_regex(pat: str) -> str:
    """SQL SIMILAR TO pattern -> Java regex: % -> .*, _ -> . (other SQL
    regex metachars pass through, as in the reference's translation)."""
    out = []
    for ch in pat:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(ch)
    return "^(" + "".join(out) + ")$"


_SIMILAR_PAT_RE = re.compile(r"\s*('(?:[^']|'')*')")


def _rewrite_similar_to(sql: str) -> str:
    """`x SIMILAR TO 'pat'` -> `regexp_like(x, '^(pat)$')` with %/_
    translated. The operand is recovered with a backward balanced-paren
    scan, so parenthesized and function-call operands
    (``(a || b) SIMILAR TO 'p'``, ``trim(x) SIMILAR TO 'p'``) work."""
    pos = 0
    while True:
        m = _SIMILAR_RE.search(sql, pos)
        if m is None:
            return sql
        if _in_literal(sql, m.start()):
            pos = m.end()
            continue
        pm = _SIMILAR_PAT_RE.match(sql, m.end())
        span = None if pm is None else _operand_span_before(sql, m.start())
        if span is None:
            pos = m.end()
            continue
        x_start, x_end = span
        negate = m.group(1) is not None
        pat = pm.group(1)[1:-1].replace("''", "'")
        regex = sql_pattern_to_regex(pat).replace("\\", "\\\\").replace("'", "''")
        call = f"regexp_like({sql[x_start:x_end]}, '{regex}')"
        if negate:
            call = f"NOT {call}"
        sql = sql[:x_start] + call + sql[pm.end() :]
        pos = x_start + len(call)


# Sclera scalar-function names -> Spark SQL function names (the Python-level
# library in functions/scalar.py covers the full inventory; these are the
# pure renames usable directly in SQL text)
_FN_RENAMES = {
    "REPLACEALL": "regexp_replace",
    "STRPOS": "instr",
    "RANDUNIFORM": "rand",
    "RANDGAUSSIAN": "randn",
    "RANDNORMAL": "randn",
    "TOTIMESTAMP": "to_timestamp",
    "TODATE": "to_date",
}

_FN_RENAME_RE = re.compile(
    r"\b(" + "|".join(_FN_RENAMES) + r")\s*\(", re.IGNORECASE
)


def _rewrite_fn_names(text: str) -> str:
    return _FN_RENAME_RE.sub(lambda m: _FN_RENAMES[m.group(1).upper()] + "(", text)


# PostgreSQL postfix null tests (reference SqlQueryParser.scala:659-663);
# the lookahead keeps Spark's isnull(x) function form untouched
_ISNULL_RE = re.compile(r"\bISNULL\b(?!\s*\()", re.IGNORECASE)
_NOTNULL_RE = re.compile(r"\bNOTNULL\b(?!\s*\()", re.IGNORECASE)


def _rewrite_postfix_null(text: str) -> str:
    text = _ISNULL_RE.sub("IS NULL", text)
    return _NOTNULL_RE.sub("IS NOT NULL", text)


# EXTERNAL lib.fn(args) -> the registered UDF name (reference
# ExternalScalarFunction, SqlQueryParser.scala:856-864). The relational
# form `FROM EXTERNAL src(...)` has no dot and is handled by the extended
# from-item parser instead.
_EXTERNAL_FN_RE = re.compile(r"\bEXTERNAL\s+(\w+)\.(\w+)\s*\(", re.IGNORECASE)


def _rewrite_external_fns(text: str) -> str:
    return _EXTERNAL_FN_RE.sub(
        lambda m: f"__sclera_ext_{m.group(1)}_{m.group(2)}(".lower(), text
    )


# ---- Sclera date/time + numeric-scale scalar names in SQL text ----
# (reference ScalFunctionEvaluator.scala:791-1445: ms-based arithmetic,
# unit constructors, HALF_UP SCALE, ms TIMESTAMP_UNIX, random strings)

_RANDSTR_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def _sql_ts(x: str) -> str:
    return f"CAST({x} AS TIMESTAMP)"


def _sql_ms(x: str) -> str:
    return f"unix_millis(CAST({x} AS TIMESTAMP))"


def _sfn_ts_add(args: list[str]) -> str:
    t, ms = args
    return f"timestamp_millis({_sql_ms(t)} + CAST({ms} AS BIGINT))"


def _sfn_ts_diff(args: list[str]) -> str:
    a, b = args
    return f"({_sql_ms(a)} - {_sql_ms(b)})"


def _sfn_date_add(args: list[str]) -> str:
    d, ms = args
    return f"CAST(timestamp_millis({_sql_ms(d)} + CAST({ms} AS BIGINT)) AS DATE)"


def _sfn_unit(mult: int):
    def fn(args: list[str]) -> str:
        if not args:
            return f"CAST({mult} AS BIGINT)"
        if mult == 1:
            return f"CAST({args[0]} AS BIGINT)"
        return f"(CAST({args[0]} AS BIGINT) * {mult})"

    return fn


def _sfn_scale(args: list[str]) -> str:
    v, s = args
    return f"CAST(round({v}, {s}) AS DOUBLE)"


def _sfn_totime(args: list[str]) -> str:
    if len(args) == 1:
        return f"to_timestamp({args[0]})"
    from sclera_spark.functions.scalar import _to_spark_datefmt

    fmt = args[1]
    if fmt.startswith("'") and fmt.endswith("'"):
        fmt = "'" + _to_spark_datefmt(fmt[1:-1]) + "'"
    return f"to_timestamp({args[0]}, {fmt})"


def _sfn_totimezone(args: list[str]) -> str:
    t, tz = args
    return f"from_utc_timestamp({_sql_ts(t)}, {tz})"


def _sfn_toutc(args: list[str]) -> str:
    if len(args) == 1:
        return _sql_ts(args[0])
    return f"to_utc_timestamp({_sql_ts(args[0])}, {args[1]})"


def _sfn_randomstr(args: list[str]) -> str:
    return (
        f"array_join(transform(sequence(1, CAST({args[0]} AS INT)), "
        f"__sclera_i -> substring('{_RANDSTR_ALPHABET}', "
        f"CAST(rand() * 62 AS INT) + 1, 1)), '')"
    )


_SCLERA_SQL_FNS = {
    "TIME_ADD": _sfn_ts_add,            # Sclera TIME ~ timestamp (no TimeType)
    "TIME_DIFF": _sfn_ts_diff,
    "DATE_ADD": _sfn_date_add,          # ms-based, NOT Spark's day-based date_add
    "DATE_DIFF": _sfn_ts_diff,          # ms difference of the date midnights
    "TIMESTAMP_ADD": _sfn_ts_add,
    "TIMESTAMP_DIFF": _sfn_ts_diff,
    "TIMESTAMP_UNIX": lambda a: _sql_ms(a[0]),  # getTime() = MILLISECONDS (:1131)
    "MILLISECONDS": _sfn_unit(1),
    "SECONDS": _sfn_unit(1000),
    "MINUTES": _sfn_unit(60_000),
    "HOURS": _sfn_unit(3_600_000),
    "DAYS": _sfn_unit(86_400_000),
    "SCALE": _sfn_scale,
    "TOTIME": _sfn_totime,
    "TOTIMEZONE": _sfn_totimezone,
    "TOUTC": _sfn_toutc,
    "RANDOMSTR": _sfn_randomstr,
    # pg_catalog introspection functions PostgreSQL clients call
    # (reference pgcatalog/PgCatalogFunction.scala:98-107)
    "PG_TABLE_IS_VISIBLE": lambda a: "(TRUE)",
    "PG_GET_USERBYID": lambda a: f"(CASE WHEN ({a[0]}) = 0 THEN 'sclera' END)",
    "PG_GET_EXPR": lambda a: "CAST(NULL AS STRING)",
    "FORMAT_TYPE": lambda a: _pg_format_type(a[0]),
}


def _pg_format_type(arg: str) -> str:
    from sclera_spark.sources.pgcatalog import format_type_sql

    return format_type_sql(arg)

_SCLERA_FN_RE = re.compile(
    r"\b(" + "|".join(_SCLERA_SQL_FNS) + r")\s*\(", re.IGNORECASE
)


def _rewrite_sclera_fns(text: str) -> str:
    """Sclera date/time + SCALE/RANDOMSTR calls in SQL text -> Spark SQL.
    All arithmetic is in milliseconds, matching the reference evaluator
    (ScalFunctionEvaluator.scala:996-1445); note DATE_ADD here is the
    Sclera ms-based form, shadowing Spark's day-based builtin — the SQL
    surface is the Sclera dialect."""
    out: list[str] = []
    i = 0
    while True:
        m = _SCLERA_FN_RE.search(text, i)
        if m is None:
            out.append(text[i:])
            return "".join(out)
        if _in_literal(text, m.start()):
            out.append(text[i : m.end()])
            i = m.end()
            continue
        try:
            close = _find_balanced(text, m.end() - 1)
        except ValueError:
            out.append(text[i : m.end()])
            i = m.end()
            continue
        inner = _rewrite_sclera_fns(text[m.end() : close - 1])
        args = [a.strip() for a in _split_top_commas(inner) if a.strip()]
        repl = _SCLERA_SQL_FNS[m.group(1).upper()](args)
        out.append(text[i : m.start()])
        out.append(repl)
        i = close


_NUMFN_RE = re.compile(r"\b(FLOOR|CEILING|CEIL|POWER|POW)\s*\(", re.IGNORECASE)

# nondeterministic scalar calls cannot be restated in the type-preserving
# floor/ceil identity (each restatement would draw a fresh value)
_NONDET_RE = re.compile(
    r"\b(rand|randn|random|uuid|shuffle|monotonically_increasing_id)\s*\(",
    re.IGNORECASE,
)


def _rewrite_numeric_fns(text: str) -> str:
    """Type-faithful lowering of numeric scalars:

    - ``FLOOR(x)`` / ``CEIL(x)`` -> ``floor(x) + ((x) - (x))``: Spark's
      floor/ceil return BIGINT, while the reference preserves the input
      type (ScalFunctionEvaluator.scala:119-156). ``(x) - (x)`` is an
      exact zero of x's own numeric type, so the sum coerces the BIGINT
      back: DOUBLE stays DOUBLE (as in PostgreSQL/DuckDB), INT/BIGINT
      stay integral — no silent corruption of BIGINT values above 2^53,
      which the old unconditional CAST-to-DOUBLE caused. Nondeterministic
      arguments (RAND() etc.) cannot be restated; they fall back to the
      DOUBLE cast, matching their floating result type anyway.
    - ``POWER(x, 0.5)`` -> ``sqrt(x)``: IEEE-754 sqrt is correctly
      rounded (pow is not), so this is both faster and deterministic
      across engines.
    """
    out: list[str] = []
    i = 0
    while True:
        m = _NUMFN_RE.search(text, i)
        if m is None:
            out.append(text[i:])
            return "".join(out)
        if _in_literal(text, m.start()):
            out.append(text[i : m.end()])
            i = m.end()
            continue
        try:
            close = _find_balanced(text, m.end() - 1)
        except ValueError:
            out.append(text[i : m.end()])
            i = m.end()
            continue
        inner = _rewrite_numeric_fns(text[m.end() : close - 1])
        fn = m.group(1).upper()
        if fn in ("POWER", "POW"):
            args = _split_top_commas(inner)
            if len(args) == 2 and args[1].strip() in ("0.5", ".5"):
                repl = f"sqrt({args[0].strip()})"
            else:
                repl = f"{fn.lower()}({inner})"
        else:
            base = "ceil" if fn == "CEILING" else fn.lower()
            arg = inner.strip()
            if _NONDET_RE.search(arg):
                repl = f"CAST({base}({arg}) AS DOUBLE)"
            else:
                repl = f"({base}({arg}) + (({arg}) - ({arg})))"
        out.append(text[i : m.start()])
        out.append(repl)
        i = close


# PostgreSQL/Sclera ordered string aggregates: STRING_AGG(x, d ORDER BY k)
# and PATH(x [, d] [ORDER BY k]) -> Spark-native string_agg ... WITHIN GROUP
# (the reference orders by sequence position, SeqAggregate.scala:1201-1365;
# Spark 4 supports arbitrary WITHIN GROUP order natively). Label-dotted
# forms (A.PATH(...)) belong to the MATCH tier and are skipped.
_STRAGG_RE = re.compile(r"(\.\s*)?\b(STRING_AGG|PATH)\s*\(", re.IGNORECASE)
_ORDER_BY_KW_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)


def _rewrite_ordered_aggs(text: str) -> str:
    out: list[str] = []
    i = 0
    while True:
        m = _STRAGG_RE.search(text, i)
        if m is None:
            out.append(text[i:])
            return "".join(out)
        if m.group(1) or _in_literal(text, m.start()):
            out.append(text[i : m.end()])
            i = m.end()
            continue
        try:
            close = _find_balanced(text, m.end() - 1)
        except ValueError:
            out.append(text[i : m.end()])
            i = m.end()
            continue
        inner = text[m.end() : close - 1]
        om = _scan_top_level(inner, _ORDER_BY_KW_RE)
        fn = m.group(2).upper()
        if om is None and fn == "STRING_AGG":
            # unordered STRING_AGG is Spark-native (listagg alias)
            out.append(text[i:close])
            i = close
            continue
        if om is None:
            args, order = inner, None
        else:
            args = inner[: om.start()].rstrip().rstrip(",")
            order = inner[om.end() :].strip()
        arg_list = [a.strip() for a in _split_top_commas(args)]
        if fn == "PATH":
            val = f"CAST({arg_list[0]} AS STRING)"
            delim = arg_list[1] if len(arg_list) > 1 else "'/'"
        else:
            val = arg_list[0]
            delim = arg_list[1] if len(arg_list) > 1 else "','"
        repl = f"string_agg({val}, {delim})"
        if order is not None:
            repl += f" WITHIN GROUP (ORDER BY {order})"
        out.append(text[i : m.start()])
        out.append(repl)
        i = close


_OFFSET_FETCH_RE = re.compile(
    r"\bOFFSET\s+(\d+)(?:\s+ROWS?)?\s+FETCH\s+(?:FIRST|NEXT)\s+(\d+)\s+ROWS?\s+ONLY\b",
    re.IGNORECASE,
)
_FETCH_FIRST_RE = re.compile(
    r"\bFETCH\s+(?:FIRST|NEXT)\s+(\d+)\s+ROWS?\s+ONLY\b", re.IGNORECASE
)


_MOV_RE = re.compile(
    r"\b(?P<fn>MOVAVG|MOVSTDDEV|MOVSUM)\s*\(\s*(?P<arg>[\w.]+)\s*,\s*(?P<n>\d+)\s*\)"
    r"\s+OVER\s*\(\s*(?P<win>[^()]*?)\s*\)",
    re.IGNORECASE,
)

_MOV_FNS = {"MOVAVG": "avg", "MOVSTDDEV": "stddev_samp", "MOVSUM": "sum"}


def _rewrite_moving_fns(text: str) -> str:
    """Sclera's moving-window aggregates (reference SeqAggregate.scala
    MovAvg/MovStdDev): `MOVAVG(x, n) OVER (...)` -> a ROWS-framed window."""

    def sub(m: re.Match) -> str:
        fn = _MOV_FNS[m.group("fn").upper()]
        n = int(m.group("n"))
        return (
            f"{fn}({m.group('arg')}) OVER ({m.group('win')} "
            f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)"
        )

    return _MOV_RE.sub(sub, text)


_WINDOW_DEF_RE = re.compile(r"\bWINDOW\s+(\w+)\s+AS\s*\(", re.IGNORECASE)
_OVER_RE = re.compile(r"\bOVER\s*\(", re.IGNORECASE)


def _rewrite_named_window_frames(sql: str) -> str:
    """Inline `OVER (w ROWS BETWEEN ...)` against its `WINDOW w AS (...)`
    definition. Spark supports the WINDOW clause and plain `OVER w`, but
    not the PostgreSQL/reference form that EXTENDS a named window with a
    frame — splice the definition in front of the frame text."""
    defs: dict[str, str] = {}
    for m in _WINDOW_DEF_RE.finditer(sql):
        if _in_literal(sql, m.start()):
            continue
        close = _find_balanced(sql, m.end() - 1)
        defs[m.group(1).lower()] = sql[m.end() : close - 1].strip()
    if not defs:
        return sql
    out: list[str] = []
    i = 0
    while True:
        m = _OVER_RE.search(sql, i)
        if m is None:
            out.append(sql[i:])
            return "".join(out)
        if _in_literal(sql, m.start()):
            out.append(sql[i : m.end()])
            i = m.end()
            continue
        close = _find_balanced(sql, m.end() - 1)
        inner = sql[m.end() : close - 1]
        wm = re.match(r"\s*(\w+)\s+(\S.*)$", inner, re.DOTALL)
        if wm and wm.group(1).lower() in defs:
            out.append(sql[i : m.start()])
            out.append(f"OVER ({defs[wm.group(1).lower()]} {wm.group(2)})")
            i = close
        else:
            out.append(sql[i : close])
            i = close


def dialect_rewrite(sql: str) -> str:
    sql = _rewrite_similar_to(sql)
    sql = _rewrite_moving_fns(sql)
    # ANSI [OFFSET m] FETCH FIRST n ROWS ONLY (reference parser :554-578)
    # -> Spark's LIMIT n [OFFSET m] ordering
    sql = _OFFSET_FETCH_RE.sub(lambda m: f"LIMIT {m.group(2)} OFFSET {m.group(1)}", sql)
    sql = _FETCH_FIRST_RE.sub(lambda m: f"LIMIT {m.group(1)}", sql)
    chunks = _split_literals(sql)
    out = []
    for is_lit, text in chunks:
        if is_lit:
            out.append(text)
        else:
            t = _normalize_cast_types(text)
            t = _rewrite_casts(t)
            t = _normalize_cast_types(t)
            t = _rewrite_fn_names(t)
            t = _rewrite_external_fns(t)
            t = _rewrite_postfix_null(t)
            out.append(t)
    # the remaining rewrites span string literals (quoted SYMMETRIC
    # bounds, subqueries with literals, literal fn args), so they run on
    # the reassembled text with literal-position awareness
    sql = "".join(out)
    sql = _rewrite_symmetric(sql)
    sql = _rewrite_numeric_fns(sql)
    sql = _rewrite_sclera_fns(sql)
    sql = _rewrite_ordered_aggs(sql)
    sql = _rewrite_named_window_frames(sql)
    return _rewrite_quantified(sql)


_PGCAT_RE = re.compile(
    r"\b(?:pg_catalog\.)?(pg_type|pg_namespace|pg_class|pg_attribute|pg_attrdef)\b",
    re.IGNORECASE,
)


_WITH_HEAD_RE = re.compile(r"\s*WITH\s+", re.IGNORECASE)


def _hoist_ctes(engine, sql: str):
    """Register each top-level CTE as a temp view and return the tail
    query + the created names. Needed when a query mixes WITH and
    extended clauses: the extended lowering evaluates its source
    independently (``FROM w PARTITION BY ... ARG (...)`` resolves ``w``
    through the catalog), where a WITH-alias does not exist. Bodies are
    lowered recursively, so extended clauses inside CTE bodies work too.
    Callers must restore via :func:`_restore_cte_views` — a CTE name
    temporarily shadows a same-named catalog table, per SQL scoping."""
    from sclera_spark.plans.extended import has_extended_clause, lower_extended

    m = _WITH_HEAD_RE.match(sql)
    i = m.end()
    if re.match(r"RECURSIVE\b", sql[i:], re.IGNORECASE):
        raise ValueError(
            "WITH RECURSIVE cannot be combined with extended clauses"
        )
    created: list[str] = []
    try:
        while True:
            nm = re.match(
                r"\s*(\w+)\s*(\(([^()]*)\))?\s*AS\s*\(", sql[i:], re.IGNORECASE
            )
            if nm is None:
                raise ValueError(f"cannot parse CTE at: {sql[i : i + 50]!r}")
            name, colspec = nm.group(1), nm.group(3)
            open_idx = i + nm.end() - 1
            close = _find_balanced(sql, open_idx)
            body = sql[open_idx + 1 : close - 1]
            b = body
            if has_extended_clause(b):
                b = lower_extended(engine, b)
            if _DISTINCT_ON_RE.search(b):
                b = _rewrite_distinct_on(b)
            df = engine.spark.sql(b)
            if colspec:
                df = df.toDF(*[c.strip() for c in colspec.split(",")])
            # capture the shadowed relation's ANALYZED plan before
            # clobbering: spark.table resolves eagerly, so the captured
            # DataFrame survives the view being replaced
            try:
                shadowed = engine.spark.table(name)
            except Exception:
                shadowed = None
            df.createOrReplaceTempView(name)
            created.append((name, shadowed))
            i = close
            while i < len(sql) and sql[i].isspace():
                i += 1
            if i < len(sql) and sql[i] == ",":
                i += 1
                continue
            break
    except Exception:
        # a half-hoisted chain must not leave shadowing views behind
        _restore_cte_views(engine, created)
        raise
    return sql[i:], created


def _restore_cte_views(engine, created) -> None:
    for name, shadowed in created:
        try:
            engine.spark.catalog.dropTempView(name)
        except Exception:
            pass
        df = engine.catalog.tables.get(name, shadowed)
        if df is not None:
            # the engine catalog holds the DataFrame itself; otherwise the
            # eagerly-captured pre-shadow plan re-registers losslessly
            df.createOrReplaceTempView(name)


_VERSION_AS_OF_RE = re.compile(
    r"\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)\b", re.IGNORECASE
)


def _rewrite_version_as_of(engine, sql: str) -> str:
    """`FROM t VERSION AS OF n` — time-travel reads on manifest tables
    (Delta-dialect syntax over our own snapshot store): the retained
    version's file list resolves through table_at and is spliced in as a
    scratch temp view (``__``-prefixed, so pg_catalog introspection
    skips it). Works in any from-item position, joins included.

    Only names registered as manifest tables are rewritten — a query
    that merely CONTAINS matching text (a column alias, an unrelated
    identifier before the keywords) passes through untouched instead of
    aborting on table_at's ValueError. View creation is deferred until
    the whole statement has been scanned, so a mid-scan failure leaves
    no stray ``__sclera_tt_*`` views behind."""
    manifest = engine.ddl().manifest_tables
    pending: list[tuple[str, int, str]] = []  # (name, version, view)
    out = []
    for is_lit, seg in _split_literals(sql):
        if is_lit:
            out.append(seg)
            continue

        def sub(m: re.Match) -> str:
            name, v = m.group(1), int(m.group(2))
            if name.lower() not in manifest:
                return m.group(0)  # not a time-travel-able table: leave as-is
            view = f"__sclera_tt_{name.lower()}_{v}"
            pending.append((name, v, view))
            return view

        out.append(_VERSION_AS_OF_RE.sub(sub, seg))
    for name, v, view in pending:
        engine.ddl().table_at(name, v).createOrReplaceTempView(view)
    return "".join(out)


_TS_AS_OF_RE = re.compile(
    r"\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'", re.IGNORECASE
)


def _rewrite_timestamp_as_of(engine, sql: str) -> str:
    """`FROM t TIMESTAMP AS OF '<ts>'` — timestamp time travel: the
    newest retained version committed at or before the (UTC) timestamp
    resolves via the manifest log's commit times and splices in like
    VERSION AS OF. The quoted literal is part of the syntax, so the
    match runs over the raw text with a quote-parity guard (an
    occurrence INSIDE a string literal has an odd number of preceding
    quotes and is left untouched)."""
    import datetime as _dt

    manifest = engine.ddl().manifest_tables
    out = []
    last = 0
    pending: list[tuple[str, int, str]] = []
    for m in _TS_AS_OF_RE.finditer(sql):
        if sql[: m.start()].count("'") % 2 == 1:
            continue  # inside a string literal
        name = m.group(1)
        if name.lower() not in manifest:
            continue
        raw = m.group(2)
        try:
            ts = _dt.datetime.fromisoformat(raw.replace("T", " "))
        except ValueError:
            raise ValueError(
                f"TIMESTAMP AS OF: cannot parse {raw!r} (use ISO "
                "'YYYY-MM-DD[ HH:MM:SS[.ffffff]]', taken as UTC)"
            )
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        mt = engine.ddl()._manifest(name)
        v = mt.version_at_timestamp(ts.timestamp())
        view = f"__sclera_tt_{name.lower()}_{v}"
        pending.append((name, v, view))
        out.append(sql[last : m.start()])
        out.append(view)
        last = m.end()
    out.append(sql[last:])
    for name, v, view in pending:
        engine.ddl().table_at(name, v).createOrReplaceTempView(view)
    return "".join(out)


def lower_sql(engine, query: str) -> DataFrame:
    from sclera_spark.plans.extended import has_extended_clause, lower_extended

    if _VERSION_AS_OF_RE.search(query):
        query = _rewrite_version_as_of(engine, query)
    if _TS_AS_OF_RE.search(query):
        query = _rewrite_timestamp_as_of(engine, query)
    if _PGCAT_RE.search(query):
        # rebuild the virtual pg_catalog views from current catalog state,
        # then let plain Spark SQL resolve them (the pg_catalog. qualifier
        # is stripped — Spark has no such database)
        engine.pg_catalog.refresh()
        query = _PGCAT_RE.sub(lambda m: m.group(1).lower(), query)
    rewritten = dialect_rewrite(query)
    created: list[str] = []
    try:
        if has_extended_clause(rewritten) and _WITH_HEAD_RE.match(rewritten):
            rewritten, created = _hoist_ctes(engine, rewritten)
        if has_extended_clause(rewritten):
            rewritten = lower_extended(engine, rewritten)
        if _DISTINCT_ON_RE.search(rewritten):
            rewritten = _rewrite_distinct_on(rewritten)
        # co-located subtree pushdown (reference exec/Planner.scala:
        # 113-212): a SELECT whose every table lives at ONE JDBC
        # location runs remotely as a single dialect query instead of
        # N per-table scans — gated hard, any doubt runs locally
        from sclera_spark.sources.jdbc_pushdown import try_pushdown

        pushed = try_pushdown(engine, rewritten)
        if pushed is not None:
            return pushed
        # analysis happens inside spark.sql, so views dropped afterwards
        # do not invalidate the returned DataFrame
        return engine.spark.sql(rewritten)
    finally:
        if created:
            _restore_cte_views(engine, created)


def _scan_top_level(text: str, pattern: re.Pattern, start: int = 0) -> re.Match | None:
    """First match of ``pattern`` at paren depth 0, outside literals."""
    depth = 0
    i, n = start, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            j = i + 1
            while j < n:
                if text[j] == "'" and j + 1 < n and text[j + 1] == "'":
                    j += 2
                elif text[j] == "'":
                    j += 1
                    break
                else:
                    j += 1
            i = j
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pattern.match(text, i)
            if m:
                return m
        i += 1
    return None


_FROM_KW_RE = re.compile(r"\bFROM\b", re.IGNORECASE)
_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_TRAILER_RE = re.compile(r"\b(LIMIT|OFFSET|FETCH)\b", re.IGNORECASE)
_SETOP_RE = re.compile(r"\b(UNION|INTERSECT|EXCEPT|MINUS)\b", re.IGNORECASE)
_DO_COUNTER = __import__("itertools").count()


def _rewrite_distinct_on(sql: str) -> str:
    """PostgreSQL DISTINCT ON: first row per key per ORDER BY, rewritten
    to a row_number() window query — scope-aware, so it works nested in
    subqueries, alongside set operations, and with trailing LIMIT/OFFSET
    (the round-1 whole-string regex handled only top-level queries)."""
    while True:
        dm = None
        for cand in _DISTINCT_ON_RE.finditer(sql):
            if not _in_literal(sql, cand.start()):
                dm = cand
                break
        if dm is None:
            return sql
        close_on = _find_balanced(sql, dm.end() - 1)
        on = sql[dm.end() : close_on - 1].strip()
        # span of this SELECT: up to the paren closing our scope or a
        # top-level set-op boundary
        depth = 0
        i, n = close_on, len(sql)
        span_end = n
        while i < n:
            c = sql[i]
            if c == "'":
                i = _skip_to_literal_end(sql, i)
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    span_end = i
                    break
                depth -= 1
            elif depth == 0:
                m = _SETOP_RE.match(sql, i)
                if m:
                    span_end = i
                    break
            i += 1
        body = sql[close_on:span_end]
        fm = _scan_top_level(body, _FROM_KW_RE)
        if fm is None:
            raise ValueError(f"cannot parse DISTINCT ON query: {sql}")
        select = body[: fm.start()].strip()
        rest = body[fm.end() :]
        om = _scan_top_level(rest, _ORDER_BY_RE)
        if om:
            rel = rest[: om.start()].strip()
            tail = rest[om.end() :]
            tm = _scan_top_level(tail, _TRAILER_RE)
            order = tail[: tm.start()].strip() if tm else tail.strip()
            trailer = tail[tm.start() :].strip() if tm else ""
        else:
            rel, order, trailer = rest.strip(), "", ""
        order_clause = order if order else on
        alias = f"__sclera_d{next(_DO_COUNTER)}"
        inner = (
            f"SELECT *, row_number() OVER (PARTITION BY {on} "
            f"ORDER BY {order_clause}) AS __sclera_rn FROM {rel}"
        )
        new = f"SELECT {select} FROM ({inner}) {alias} WHERE __sclera_rn = 1"
        if order:
            new += f" ORDER BY {order}"
        if trailer:
            new += " " + trailer
        sql = sql[: dm.start()] + new + sql[span_end:]


def _skip_to_literal_end(text: str, pos: int) -> int:
    j, n = pos + 1, len(text)
    while j < n:
        if text[j] == "'" and j + 1 < n and text[j + 1] == "'":
            j += 2
        elif text[j] == "'":
            return j + 1
        else:
            j += 1
    return n
