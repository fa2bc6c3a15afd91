"""Sclera scalar function surface -> native Spark Column expressions.

Parity target: the function inventory of the reference's scalar evaluator
(modules/core/src/main/scala/sql/exec/scalar/ScalFunctionEvaluator.scala:57-1449).
Everything stays JVM-side (pyspark.sql.functions) so expressions remain
inside whole-stage codegen; no Python UDFs in this module.

Notable semantic quirks preserved from the reference:
- REPLACE replaces only the FIRST occurrence (ScalFunctionEvaluator.scala:664);
  REPLACEALL is the regex replace-all (:686); REPLACEFIRST regex-first (:708).
- DATE/TIME/TIMESTAMP_ADD/_DIFF operate in milliseconds
  (ScalFunctionEvaluator.scala:996-1126).
- RANDOMSTR(n) produces an n-char random alphanumeric string (:515).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _replace_first_literal(s: Column, search: Column, repl: Column) -> Column:
    """First-occurrence-only literal replace (building block; the
    reference's REPLACE is literal replace-ALL — see SCALAR_FUNCTIONS)."""
    pos = F.instr(s, search)
    return F.when(pos == 0, s).otherwise(
        F.concat(
            F.substring(s, F.lit(1), pos - F.lit(1)),
            repl,
            F.substr(s, pos + F.length(search)),
        )
    )


def _randomstr(n: Column) -> Column:
    """RANDOMSTR(len): random alphanumeric string of given length (:515-529)."""
    alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    # one random char per position, assembled JVM-side; n is small in practice
    idx = F.sequence(F.lit(1), n.cast("int"))
    pick = F.transform(
        idx, lambda _: F.substring(F.lit(alphabet), (F.rand() * 62 + 1).cast("int"), 1)
    )
    return F.array_join(pick, "")


def _millis(c: Column) -> Column:
    return F.unix_millis(c.cast("timestamp"))


# name -> callable(*cols) -> Column.  Names are upper-case (Sclera folds
# identifiers case-insensitively: sql/parser grammar lowercases keywords).
SCALAR_FUNCTIONS: dict[str, Callable[..., Column]] = {
    # ---- math (reference :58-529) ----
    "ABS": F.abs,
    "ROUND": lambda c, s=None: F.round(c, 0) if s is None else F.round(c, s),
    "FLOOR": F.floor,
    "CEIL": F.ceil,
    "CEILING": F.ceil,
    "TRUNC": lambda c, s=None: _trunc(c, s),
    "TRUNCATE": lambda c, s=None: _trunc(c, s),
    "POWER": F.pow,
    "SQRT": F.sqrt,
    "SIGN": F.signum,
    "DIV": lambda a, b: (a / b).cast("long"),
    "MOD": lambda a, b: a % b,
    "EXP": F.exp,
    "LOG": F.log,
    "LN": F.log,
    "LOG10": F.log10,
    "SIN": F.sin,
    "COS": F.cos,
    "TAN": F.tan,
    "ASIN": F.asin,
    "ACOS": F.acos,
    "ATAN": F.atan,
    "ATAN2": F.atan2,
    "PI": lambda: F.lit(3.141592653589793),
    "RANDOM": lambda *a: F.rand() if not a else F.rand() * a[0],
    "RANDUNIFORM": lambda *a: F.rand() if not a else F.rand() * a[0],
    "RANDGAUSSIAN": lambda: F.randn(),
    "RANDNORMAL": lambda: F.randn(),
    "WHITENOISE": lambda: F.randn(),
    "RANDOMINT": lambda n: (F.rand() * n).cast("long"),
    "RANDINTUNIFORM": lambda n: (F.rand() * n).cast("long"),
    "RANDOMSTR": _randomstr,
    # ---- string (:531-729) ----
    "CONCAT": F.concat,
    "CHAR_LENGTH": F.length,
    "CHARLENGTH": F.length,
    "LOWER": F.lower,
    "UPPER": F.upper,
    "TRIM": F.trim,
    "SUBSTRING": lambda s, pos, ln=None: (
        F.substring(s, pos, ln) if ln is not None else F.substr(s, pos)
    ),
    "STRPOS": lambda s, sub: F.instr(s, sub),
    # reference semantics (ScalFunctionEvaluator.scala:664-730):
    # REPLACE = Java String.replace -> LITERAL, all occurrences;
    # REPLACEALL = String.replaceAll -> REGEX, all occurrences;
    # REPLACEFIRST = String.replaceFirst -> REGEX, first occurrence
    "REPLACE": lambda s, t, r: F.replace(s, t, r),
    "REPLACEALL": lambda s, pat, repl: F.regexp_replace(s, pat, repl),
    "REPLACEFIRST": lambda s, pat, repl: _regex_replace_first(s, pat, repl),
    # ---- conditional (:730-790) ----
    "COALESCE": F.coalesce,
    "NULLIF": F.nullif,
    "GREATEST": F.greatest,
    "LEAST": F.least,
    # ---- date/time (:791-1445) ----
    "CURRENT_DATE": F.current_date,
    "CURRENT_TIME": F.current_timestamp,  # Sclera TIME ~ timestamp (no TimeType)
    "CURRENT_TIMESTAMP": F.current_timestamp,
    "NOW": F.current_timestamp,
    "DATE_PART": lambda field, c: _date_part(field, c),
    "DATE_PARTSTR": lambda field, c: _date_part(field, c),
    "TIME_ADD": lambda t, ms: F.timestamp_millis(_millis(t) + ms.cast("long")),
    "TIME_DIFF": lambda a, b: _millis(a) - _millis(b),
    "DATE_ADD": lambda d, ms: F.timestamp_millis(_millis(d) + ms.cast("long")).cast("date"),
    "DATE_DIFF": lambda a, b: _millis(a) - _millis(b),
    "TIMESTAMP_ADD": lambda t, ms: F.timestamp_millis(_millis(t) + ms.cast("long")),
    "TIMESTAMP_DIFF": lambda a, b: _millis(a) - _millis(b),
    # getTime() = MILLISECONDS since epoch (reference :1126-1145), not seconds
    "TIMESTAMP_UNIX": lambda t: F.unix_millis(t.cast("timestamp")),
    "MILLISECONDS": lambda n: n.cast("long"),
    "SECONDS": lambda n: n.cast("long") * 1000,
    "MINUTES": lambda n: n.cast("long") * 60_000,
    "HOURS": lambda n: n.cast("long") * 3_600_000,
    "DAYS": lambda n: n.cast("long") * 86_400_000,
    "TODATE": lambda c, fmt=None: (
        F.to_date(c) if fmt is None else F.to_date(c, _to_spark_datefmt(fmt))
    ),
    "TOTIME": lambda c, fmt=None: (
        F.to_timestamp(c) if fmt is None else F.to_timestamp(c, _to_spark_datefmt(fmt))
    ),
    "TOTIMESTAMP": lambda c, fmt=None: (
        F.to_timestamp(c) if fmt is None else F.to_timestamp(c, _to_spark_datefmt(fmt))
    ),
    "TOTIMEZONE": lambda t, tz: F.from_utc_timestamp(t, tz),
    "TOUTC": lambda t, tz=None: (
        F.to_utc_timestamp(t, tz) if tz is not None else t.cast("timestamp")
    ),
}


def _trunc(c: Column, s: Column | None) -> Column:
    """Numeric TRUNC toward zero (reference :157-177)."""
    if s is None:
        return c.cast("double").cast("long").cast("double")
    factor = F.pow(F.lit(10.0), s)
    return (c * factor).cast("long") / factor


def _regex_replace_first(s: Column, pat, repl) -> Column:
    """REPLACEFIRST: regex replace of first match only (reference :708-728).

    Spark's regexp_replace replaces all; emulate by splitting at the first
    match position via regexp_extract of the match, then literal-first
    replace of that matched text.
    """
    matched = F.regexp_substr(s, pat if isinstance(pat, Column) else F.lit(pat))
    return F.when(matched.isNull(), s).otherwise(
        _replace_first_literal(s, matched, repl if isinstance(repl, Column) else F.lit(repl))
    )


_DATE_PART_MAP = {
    "YEAR": "year",
    "MONTH": "month",
    "DAY": "day",
    "DAY_OF_MONTH": "day",
    "DAY_OF_WEEK": "dayofweek",
    "DAY_OF_YEAR": "doy",
    "HOUR": "hour",
    "MINUTE": "minute",
    "SECOND": "second",
    "QUARTER": "quarter",
    "WEEK": "week",
    "WEEK_OF_YEAR": "week",
    "MILLISECOND": "millisecond",
}


def _date_part(field, c: Column) -> Column:
    """DATE_PART(field, ts) per reference :857-995."""
    name = field if isinstance(field, str) else None
    if name is None:
        raise ValueError("DATE_PART requires a literal field name")
    key = _DATE_PART_MAP.get(name.upper())
    if key is None:
        raise ValueError(f"unsupported DATE_PART field: {name}")
    if key == "dayofweek":
        return F.dayofweek(c).cast("int")
    if key == "doy":
        return F.dayofyear(c).cast("int")
    if key == "week":
        return F.weekofyear(c).cast("int")
    if key == "millisecond":
        return (F.unix_millis(c.cast("timestamp")) % 1000).cast("int")
    return F.extract(F.lit(key), c).cast("int")


_JAVA_FMT = {"YYYY": "yyyy", "MM": "MM", "DD": "dd", "HH24": "HH", "MI": "mm", "SS": "ss"}


def _to_spark_datefmt(fmt) -> str:
    """Translate PostgreSQL-style to_date format tokens to java.time ones."""
    if not isinstance(fmt, str):
        return fmt
    out = fmt
    for pg, jv in _JAVA_FMT.items():
        out = out.replace(pg, jv)
    return out


def scalar_function(name: str, *args) -> Column:
    """Resolve a Sclera scalar function call to a Spark Column."""
    fn = SCALAR_FUNCTIONS.get(name.upper())
    if fn is None:
        raise ValueError(f"unknown scalar function: {name}")
    return fn(*args)
