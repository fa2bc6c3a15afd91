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
    r"(\w+(?:\.\w+)*|\))\s*::\s*([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
)


def _rewrite_casts(text: str) -> str:
    """``a::int`` -> ``CAST(a AS int)``. Parenthesized operands are left to
    Spark (which supports :: natively in 3.4+ for simple cases)."""
    prev = None
    while prev != text:
        prev = text
        text = _CAST_RE.sub(lambda m: f"CAST({m.group(1)} AS {m.group(2)})", text)
    return text


_DISTINCT_ON_RE = re.compile(r"SELECT\s+DISTINCT\s+ON\s*\(", re.IGNORECASE)


def _rewrite_symmetric(text: str) -> str:
    return re.sub(r"\bBETWEEN\s+SYMMETRIC\b", "BETWEEN", text, flags=re.IGNORECASE)


def dialect_rewrite(sql: str) -> str:
    chunks = _split_literals(sql)
    out = []
    for is_lit, text in chunks:
        if is_lit:
            out.append(text)
        else:
            t = _rewrite_casts(text)
            t = _rewrite_symmetric(t)
            out.append(t)
    return "".join(out)


def lower_sql(engine, query: str) -> DataFrame:
    rewritten = dialect_rewrite(query)
    if _DISTINCT_ON_RE.search(rewritten):
        return _lower_distinct_on(engine, rewritten)
    return engine.spark.sql(rewritten)


def _lower_distinct_on(engine, sql: str) -> DataFrame:
    """PostgreSQL DISTINCT ON: first row per key per ORDER BY.

    Rewrite:  SELECT DISTINCT ON (k) cols FROM ... ORDER BY k, o
    into a row_number() window query (the same plan shape our distinct_on
    operator produces)."""
    m = re.search(
        r"^\s*SELECT\s+DISTINCT\s+ON\s*\((?P<on>[^)]*)\)\s*(?P<select>.*?)\s+FROM\s+"
        r"(?P<rest>.*?)(?:\s+ORDER\s+BY\s+(?P<order>.*?))?\s*$",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"cannot parse DISTINCT ON query: {sql}")
    on = m.group("on").strip()
    select = m.group("select").strip()
    rest = m.group("rest").strip()
    order = (m.group("order") or "").strip()
    order_clause = order if order else on
    inner = (
        f"SELECT *, row_number() OVER (PARTITION BY {on} ORDER BY {order_clause}) AS __sclera_rn "
        f"FROM {rest}"
    )
    outer = f"SELECT {select} FROM ({inner}) __sclera_d WHERE __sclera_rn = 1"
    if order:
        outer += f" ORDER BY {order}"
    return engine.spark.sql(outer)
