"""Sclera extended-clause SQL surface: MATCH / SPLIT / ARG in FROM.

Reference grammar (modules/core/src/main/scala/sql/parser/
SqlQueryParser.scala:225-380):

    from_item := <rel> [ORDERED BY (cols)] [PARTITION BY cols] <op>
    op        := MATCH 'regex' [ON labeler]
               | ARG (aggspecs) [OVER MATCH 'regex' [ON labeler]]
               | SPLIT (lo, hi) INTO (olo, ohi)
    labeler   := <column> | LABEL l WHEN pred [, LABEL l2 WHEN pred2 ...]

Lowering strategy: the extended clause is extracted from the FROM text,
the corresponding operator runs (producing a DataFrame registered as a
temp view), and the view name is substituted back — the rest of the query
is plain Spark SQL over that view. MATCH exposes `match_id` and
`match_label` columns, so per-match aggregation in the outer SELECT is a
plain GROUP BY (partition cols, match_id). ORDERED BY supplies the
sequence order (the reference instead inherits its input iterator's
order, which Spark deliberately does not guarantee — SURVEY.md §2.6).
"""

from __future__ import annotations

import itertools
import re

_COUNTER = itertools.count()

# a comma ends the clause unless it introduces another LABEL ... WHEN arm
_CLAUSE_END = r"(?=\s+(?:WHERE|GROUP|ORDER|HAVING|LIMIT|UNION|INTERSECT|EXCEPT|JOIN|LEFT|RIGHT|FULL|CROSS|INNER|ON)\b|\s*,(?!\s*LABEL\b)|\s*\)|\s*$)"

_MATCH_RE = re.compile(
    r"FROM\s+(?P<tbl>\w+)"
    r"(?:\s+ORDERED\s+BY\s+\((?P<ord>[^)]+)\))?"
    r"(?:\s+PARTITION\s+BY\s+(?P<part>\w+(?:\s*,\s*\w+)*))?"
    r"\s+MATCH\s+'(?P<regex>[^']+)'"
    r"(?:\s+ON\s+(?P<labeler>LABEL\s+.+?|\w+(?:\s+WHEN\s+.+?)?))?" + _CLAUSE_END,
    re.IGNORECASE | re.DOTALL,
)

_ARG_RE = re.compile(
    r"FROM\s+(?P<tbl>\w+)"
    r"(?:\s+ORDERED\s+BY\s+\((?P<ord>[^)]+)\))?"
    r"(?:\s+PARTITION\s+BY\s+(?P<part>\w+(?:\s*,\s*\w+)*))?"
    r"\s+ARG\s*\(\s*(?P<spec>(?:MAX|MIN)\s*\(\s*[\w.]+\s*\))\s*\)"
    r"(?:\s+OVER\s+MATCH\s+'(?P<regex>[^']+)'"
    r"(?:\s+ON\s+(?P<labeler>LABEL\s+.+?|\w+(?:\s+WHEN\s+.+?)?))?)?" + _CLAUSE_END,
    re.IGNORECASE | re.DOTALL,
)

_PIVOT_RE = re.compile(
    r"FROM\s+(?P<tbl>\w+)"
    r"(?:\s+PARTITION\s+BY\s+(?P<part>\w+(?:\s*,\s*\w+)*))?"
    r"\s+PIVOT\s+(?P<fn>\w+)\s*\(\s*(?P<arg>[\w.*]*)\s*\)"
    r"\s+FOR\s+(?P<col>\w+)\s+IN\s*\((?P<targets>[^)]+)\)" + _CLAUSE_END,
    re.IGNORECASE,
)

_SPLIT_RE = re.compile(
    r"FROM\s+(?P<tbl>\w+)"
    r"(?:\s+PARTITION\s+BY\s+(?P<part>\w+(?:\s*,\s*\w+)*))?"
    r"\s+SPLIT\s*\(\s*(?P<lo>\w+)\s*,\s*(?P<hi>\w+)\s*\)"
    r"\s+INTO\s*\(\s*(?P<olo>\w+)\s*,\s*(?P<ohi>\w+)\s*\)" + _CLAUSE_END,
    re.IGNORECASE,
)

_LABEL_WHEN_RE = re.compile(
    r"LABEL\s+(?P<label>\w+)\s+WHEN\s+(?P<pred>.+?)(?=\s*,?\s*LABEL\s+\w+\s+WHEN|\s*$)",
    re.IGNORECASE | re.DOTALL,
)


def _parse_labeler(spec: str | None, pattern: str):
    from pyspark.sql import functions as F

    from sclera_spark.operators.match import (
        ColumnRowLabeler,
        ConstRowLabeler,
        PredRowLabeler,
        compile_pattern,
    )

    if spec is None:
        labels = compile_pattern(pattern).labels
        if len(labels) != 1:
            raise ValueError(f"LABEL clause needed for pattern {pattern!r}")
        return ConstRowLabeler(labels[0])
    spec = spec.strip()
    if spec.upper().startswith("LABEL"):
        preds = [
            (F.expr(m.group("pred").strip()), m.group("label"))
            for m in _LABEL_WHEN_RE.finditer(spec)
        ]
        if not preds:
            raise ValueError(f"cannot parse labeler: {spec!r}")
        return PredRowLabeler(preds)
    # `col [WHEN val THEN label ... [ELSE label]]` (reference labelerDef,
    # SqlQueryParser.scala:307-321)
    wm = re.match(r"(\w+)((?:\s+WHEN\s+.+?\s+THEN\s+\w+)+)(?:\s+ELSE\s+(\w+))?\s*$",
                  spec, re.IGNORECASE | re.DOTALL)
    if wm:
        col, arms, default = wm.group(1), wm.group(2), wm.group(3)
        when_then = {}
        for am in re.finditer(
            r"WHEN\s+(?P<val>'[^']*'|[\w.-]+)\s+THEN\s+(?P<lab>\w+)", arms, re.IGNORECASE
        ):
            val = am.group("val")
            if val.startswith("'"):
                val = val.strip("'")
            else:
                try:
                    val = int(val)
                except ValueError:
                    try:
                        val = float(val)
                    except ValueError:
                        pass
            when_then[val] = am.group("lab")
        return ColumnRowLabeler(spec.split()[0], when_then, default)
    return ColumnRowLabeler(spec)


def _cols(s: str | None) -> list[str]:
    return [c.strip() for c in s.split(",")] if s else []


def has_extended_clause(sql: str) -> bool:
    return bool(
        _MATCH_RE.search(sql)
        or _SPLIT_RE.search(sql)
        or _ARG_RE.search(sql)
        or _PIVOT_RE.search(sql)
    )


_LABELED_FN_RE = re.compile(r"\b(\w+)\.(\w+)\s*\(\s*([^()]*?)\s*\)")

_LABELED_AGGS = {
    "AVG", "SUM", "MIN", "MAX", "COUNT", "STDDEV", "STDDEV_SAMP", "STDDEV_POP",
    "VAR_SAMP", "VAR_POP", "BOOL_AND", "BOOL_OR", "FIRST", "LAST",
}


def rewrite_labeled_functions(sql: str, labels: set[str]) -> str:
    """`A.avg(x)` -> `avg(CASE WHEN match_label = 'A' THEN x END)` —
    the label-scoped aggregate surface (reference LabeledFunction,
    sql/expr/scalar/ScalOp.scala:149-154). Applied only for labels of the
    query's MATCH pattern, so table-qualified column refs are untouched."""

    def sub(m: re.Match) -> str:
        label, fn, arg = m.group(1), m.group(2), m.group(3)
        if label.upper() not in labels or fn.upper() not in _LABELED_AGGS:
            return m.group(0)
        inner = arg if arg and arg != "*" else "1"
        return f"{fn}(CASE WHEN match_label = '{label.upper()}' THEN {inner} END)"

    return _LABELED_FN_RE.sub(sub, sql)


def lower_extended(engine, sql: str) -> str:
    """Replace each extended FROM item with a temp view over the operator's
    result; returns plain Spark SQL."""
    from sclera_spark.operators import split_into
    from sclera_spark.operators.match import compile_pattern, match_rows

    while True:
        m = _MATCH_RE.search(sql)
        if m:
            tbl = m.group("tbl")
            order = _cols(m.group("ord"))
            part = _cols(m.group("part"))
            if not order:
                raise ValueError(
                    "MATCH requires ORDERED BY (cols) to fix the row sequence "
                    "(Spark makes no input-order guarantee)"
                )
            labeler = _parse_labeler(m.group("labeler"), m.group("regex"))
            out = match_rows(
                engine.table(tbl),
                m.group("regex"),
                labeler,
                order_by=order,
                partition_by=part,
            )
            view = f"__sclera_match_{next(_COUNTER)}"
            out.createOrReplaceTempView(view)
            sql = sql[: m.start()] + f"FROM {view}" + sql[m.end() :]
            labels = set(compile_pattern(m.group("regex")).labels)
            sql = rewrite_labeled_functions(sql, labels)
            continue
        m = _SPLIT_RE.search(sql)
        if m:
            tbl = m.group("tbl")
            part = _cols(m.group("part"))
            out = split_into(
                engine.table(tbl),
                m.group("lo"),
                m.group("hi"),
                m.group("olo"),
                m.group("ohi"),
                partition_by=part,
            )
            view = f"__sclera_split_{next(_COUNTER)}"
            out.createOrReplaceTempView(view)
            sql = sql[: m.start()] + f"FROM {view}" + sql[m.end() :]
            continue
        m = _ARG_RE.search(sql)
        if m:
            sql = _lower_arg(engine, sql, m)
            continue
        m = _PIVOT_RE.search(sql)
        if m:
            sql = _lower_pivot(engine, sql, m)
            continue
        return sql


def _lower_arg(engine, sql: str, m: re.Match) -> str:
    """`ARG (MAX(col)) [OVER MATCH ...]`: emit the row attaining the
    optimum, per partition [per match] (reference SqlQueryParser.scala:
    278-298, SeqArgAggregate.scala)."""
    from pyspark.sql import functions as F

    from sclera_spark.operators import arg_opt
    from sclera_spark.operators.match import match_rows

    spec = m.group("spec")
    sm = re.match(r"(MAX|MIN)\s*\(\s*([\w.]+)\s*\)", spec, re.IGNORECASE)
    maximize = sm.group(1).upper() == "MAX"
    opt_col = sm.group(2)
    part = _cols(m.group("part"))
    src = engine.table(m.group("tbl"))
    if m.group("regex"):
        order = _cols(m.group("ord"))
        if not order:
            raise ValueError("ARG OVER MATCH requires ORDERED BY (cols)")
        labeler = _parse_labeler(m.group("labeler"), m.group("regex"))
        matched = match_rows(src, m.group("regex"), labeler, order_by=order, partition_by=part)
        out = arg_opt(
            matched.drop("match_label"),
            F.col(opt_col),
            maximize=maximize,
            partition_by=part + ["match_id"],
        ).drop("match_id")
    else:
        out = arg_opt(src, F.col(opt_col), maximize=maximize, partition_by=part)
    view = f"__sclera_arg_{next(_COUNTER)}"
    out.createOrReplaceTempView(view)
    return sql[: m.start()] + f"FROM {view}" + sql[m.end() :]


def _lower_pivot(engine, sql: str, m: re.Match) -> str:
    """`PIVOT fn(arg) FOR col IN (v1 [AS a1], ...)` (reference
    SqlQueryParser.scala:342-363)."""
    from pyspark.sql import functions as F

    from sclera_spark.functions import aggregate_function
    from sclera_spark.operators import pivot as pivot_op

    part = _cols(m.group("part"))
    fn = m.group("fn")
    arg = m.group("arg")
    labels, aliases = [], {}
    for target in m.group("targets").split(","):
        tm = re.match(r"\s*'?([\w #-]+?)'?\s*(?:AS\s+(\w+))?\s*$", target, re.IGNORECASE)
        labels.append(tm.group(1))
        if tm.group(2):
            aliases[tm.group(1)] = tm.group(2)
    agg = (
        aggregate_function(fn, F.col(arg))
        if arg and arg != "*"
        else aggregate_function(fn, F.lit(1))
    )
    out = pivot_op(
        engine.table(m.group("tbl")),
        group_by=part,
        pivot_col=m.group("col"),
        labels=labels,
        agg=agg,
        aliases=aliases or None,
    )
    view = f"__sclera_pivot_{next(_COUNTER)}"
    out.createOrReplaceTempView(view)
    return sql[: m.start()] + f"FROM {view}" + sql[m.end() :]
