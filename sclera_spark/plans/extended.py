"""Sclera extended-clause SQL surface (tokenizer-based from-item parser).

Reference grammar (modules/core/src/main/scala/sql/parser/
SqlQueryParser.scala:163-380, 992-1050):

    from_item := <rel> [alias] [ORDERED BY (cols)] [PARTITION BY cols] op*
    rel       := table_name | ( subquery )
    op        := MATCH 'regex' [ON labeler]
               | ARG (aggspecs) [OVER MATCH 'regex' [ON labeler]]
               | SPLIT (lo, hi) INTO (olo, ohi)
               | PIVOT fn(arg) FOR col IN (v1 [AS a1], ...)
               | UNPIVOT vcol FOR kcol IN (c1 [AS 'l1'], ...)       (:1039)
               | TYPEINFER [(cols [NULLS ('s', ...)] [LIMIT n])]    (:203)
               | CLASSIFIED [WITH] model (outcol)                   (:1016)
               | CLUSTERED [WITH] model (outcol)                    (:1020)
               | IMPUTED [WITH] model (col) [FLAG f] [, IMPUTED ..] (:1024)
               | TEXT [('lang')] [lib.]op ['args'] IN col [TO out]  (:1031)
               | ALIGN rel [alias] [ORDERED BY (cols)]
                       [ON dist_expr [MARGIN n]]                    (:163)
    labeler   := <column> [WHEN v THEN l ... [ELSE l]]
               | LABEL l WHEN pred [, LABEL l2 WHEN pred2 ...]

Lowering strategy: each extended from-item is parsed (literal- and
paren-aware, so derived tables `FROM (SELECT ...) MATCH ...` and join/comma
lists work), the corresponding operator runs (producing a DataFrame
registered as a temp view), and the view name is substituted back — the
rest of the query is plain Spark SQL over that view. Derived-table sources
recurse through the engine's front end, so nested extended clauses
compose. MATCH exposes `match_id` and `match_label` columns, so per-match
aggregation in the outer SELECT is a plain GROUP BY. ORDERED BY supplies
the sequence order (the reference instead inherits its input iterator's
order, which Spark deliberately does not guarantee — SURVEY.md §2.6).
"""

from __future__ import annotations

import itertools
import re

_COUNTER = itertools.count()

_OP_KEYWORDS = {
    "MATCH",
    "SPLIT",
    "ARG",
    "PIVOT",
    "UNPIVOT",
    "TYPEINFER",
    "CLASSIFIED",
    "CLUSTERED",
    "IMPUTED",
    "TEXT",
    "ALIGN",
}

# words that may directly follow a from-item (so they are never aliases)
_RESERVED_AFTER_SOURCE = _OP_KEYWORDS | {
    "ORDERED",
    "PARTITION",
    "WHERE",
    "GROUP",
    "ORDER",
    "HAVING",
    "LIMIT",
    "OFFSET",
    "FETCH",
    "WINDOW",
    "UNION",
    "INTERSECT",
    "EXCEPT",
    "MINUS",
    "JOIN",
    "LEFT",
    "RIGHT",
    "FULL",
    "INNER",
    "CROSS",
    "NATURAL",
    "LATERAL",
    "ON",
    "USING",
    "AS",
}

# top-level keywords that terminate a free-text tail (labeler predicates)
_TAIL_TERMINATORS = _OP_KEYWORDS | {
    "WHERE",
    "GROUP",
    "ORDER",
    "HAVING",
    "LIMIT",
    "OFFSET",
    "FETCH",
    "WINDOW",
    "UNION",
    "INTERSECT",
    "EXCEPT",
    "MINUS",
    "JOIN",
    "LEFT",
    "RIGHT",
    "FULL",
    "INNER",
    "CROSS",
    "NATURAL",
    "ORDERED",
    "PARTITION",
    "OVER",
    "MARGIN",
}

_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)*")
_FROM_RE = re.compile(r"\bFROM\b", re.IGNORECASE)
_NUM_RE = re.compile(r"\d+")


def _skip_ws(text: str, pos: int) -> int:
    n = len(text)
    while pos < n:
        if text[pos].isspace():
            pos += 1
        elif text.startswith("--", pos):
            nl = text.find("\n", pos)
            pos = n if nl < 0 else nl + 1
        else:
            break
    return pos


def _peek_word(text: str, pos: int) -> str | None:
    m = _WORD_RE.match(text, pos)
    return m.group(0).upper() if m else None


def _find_balanced(text: str, start: int) -> int:
    from sclera_spark.plans.frontend import _find_balanced as fb

    return fb(text, start)


def _in_literal(text: str, pos: int) -> bool:
    from sclera_spark.plans.frontend import _in_literal as il

    return il(text, pos)


class _Cursor:
    def __init__(self, text: str, pos: int):
        self.text = text
        self.pos = pos

    def skip_ws(self) -> None:
        self.pos = _skip_ws(self.text, self.pos)

    def peek_word(self) -> str | None:
        self.skip_ws()
        return _peek_word(self.text, self.pos)

    def peek_char(self) -> str:
        self.skip_ws()
        return self.text[self.pos : self.pos + 1]

    def take_kw(self, *kws: str) -> str | None:
        self.skip_ws()
        w = _peek_word(self.text, self.pos)
        if w in kws:
            self.pos += len(w)
            return w
        return None

    def take_ident(self) -> str | None:
        self.skip_ws()
        m = _IDENT_RE.match(self.text, self.pos)
        if not m:
            return None
        self.pos = m.end()
        return m.group(0)

    def take_int(self) -> int | None:
        self.skip_ws()
        m = _NUM_RE.match(self.text, self.pos)
        if not m:
            return None
        self.pos = m.end()
        return int(m.group(0))

    def take_str(self) -> str | None:
        """Single-quoted literal (with '' escape), unquoted."""
        self.skip_ws()
        if self.text[self.pos : self.pos + 1] != "'":
            return None
        i, n = self.pos + 1, len(self.text)
        buf = []
        while i < n:
            if self.text[i] == "'" and i + 1 < n and self.text[i + 1] == "'":
                buf.append("'")
                i += 2
            elif self.text[i] == "'":
                i += 1
                self.pos = i
                return "".join(buf)
            else:
                buf.append(self.text[i])
                i += 1
        raise ValueError("unterminated string literal")

    def take_parens(self) -> str | None:
        """Balanced ( ... ), returning the inner text."""
        self.skip_ws()
        if self.text[self.pos : self.pos + 1] != "(":
            return None
        end = _find_balanced(self.text, self.pos)
        inner = self.text[self.pos + 1 : end - 1]
        self.pos = end
        return inner

    def take_tail(self) -> str:
        """Free text up to the next top-level clause terminator (used for
        labeler specs, whose predicates are arbitrary expressions)."""
        self.skip_ws()
        start = i = self.pos
        text, n = self.text, len(self.text)
        while i < n:
            c = text[i]
            if c == "'":
                i = _skip_literal(text, i)
            elif c == "(":
                i = _find_balanced(text, i)
            elif c == ")":
                break  # closing our enclosing context
            elif c == ",":
                # a comma ends the tail unless it introduces another LABEL arm
                j = _skip_ws(text, i + 1)
                if _peek_word(text, j) == "LABEL":
                    i = j
                else:
                    break
            else:
                m = _WORD_RE.match(text, i)
                if m:
                    if m.group(0).upper() in _TAIL_TERMINATORS:
                        break
                    i = m.end()
                else:
                    i += 1
        self.pos = i
        return text[start:i].strip()


def _skip_literal(text: str, pos: int) -> int:
    i, n = pos + 1, len(text)
    while i < n:
        if text[i] == "'" and i + 1 < n and text[i + 1] == "'":
            i += 2
        elif text[i] == "'":
            return i + 1
        else:
            i += 1
    return n


def _parse_cols(inner: str) -> list[str]:
    return [c.strip() for c in inner.split(",") if c.strip()]


def _parse_source(cur: _Cursor):
    """table name, ( subquery ), EXTERNAL src('params'), or SEQUENCE(n)
    (reference SqlQueryParser.scala:1054-1062); returns (kind, payload,
    start) or None."""
    cur.skip_ws()
    if cur.peek_char() == "(":
        start = cur.pos
        inner = cur.take_parens()
        return ("derived", inner, start)
    start = cur.pos
    w = cur.peek_word()
    if w == "EXTERNAL":
        cur.take_kw("EXTERNAL")
        name = cur.take_ident()
        params = cur.take_parens()
        if name is None:
            raise ValueError("EXTERNAL requires a source name")
        return ("external", (name, params or ""), start)
    if w == "SEQUENCE":
        save = cur.pos
        cur.take_kw("SEQUENCE")
        params = cur.take_parens()
        if params is None:
            cur.pos = save  # a table actually named sequence
        else:
            return ("external", ("SEQUENCE", params), start)
    name = cur.take_ident()
    if name is None or name.upper() in _RESERVED_AFTER_SOURCE:
        return None
    # a '(' right after an identifier means a table-valued function call —
    # not ours to handle
    if cur.peek_char() == "(":
        return None
    return ("table", name, start)


def _parse_alias(cur: _Cursor) -> str | None:
    save = cur.pos
    if cur.take_kw("AS"):
        alias = cur.take_ident()
        if alias:
            return alias
        cur.pos = save
        return None
    w = cur.peek_word()
    if w and w not in _RESERVED_AFTER_SOURCE:
        return cur.take_ident()
    return None


def _parse_ordered_by(cur: _Cursor) -> list[str] | None:
    save = cur.pos
    if not cur.take_kw("ORDERED"):
        return None
    if not cur.take_kw("BY"):
        cur.pos = save
        return None
    inner = cur.take_parens()
    if inner is not None:
        return _parse_cols(inner)
    col = cur.take_ident()
    if col:
        return [col]
    cur.pos = save
    return None


def _parse_partition_by(cur: _Cursor) -> list[str] | None:
    save = cur.pos
    if not cur.take_kw("PARTITION"):
        return None
    if not cur.take_kw("BY"):
        cur.pos = save
        return None
    inner = cur.take_parens()
    if inner is not None:
        return _parse_cols(inner)
    cols = []
    while True:
        c = cur.take_ident()
        if not c:
            break
        cols.append(c)
        save2 = cur.pos
        cur.skip_ws()
        if cur.text[cur.pos : cur.pos + 1] == ",":
            cur.pos += 1
        else:
            cur.pos = save2
            break
    return cols or None


def _parse_op(cur: _Cursor) -> dict | None:
    """One extended relational op at the cursor, or None."""
    w = cur.peek_word()
    if w not in _OP_KEYWORDS:
        return None
    save = cur.pos
    if w == "MATCH":
        cur.take_kw("MATCH")
        pattern = cur.take_str()
        if pattern is None:
            raise ValueError("MATCH requires a quoted pattern")
        labeler = cur.take_tail() if cur.take_kw("ON") else None
        return {"op": "MATCH", "pattern": pattern, "labeler": labeler}
    if w == "SPLIT":
        cur.take_kw("SPLIT")
        bounds = cur.take_parens()
        if bounds is None or not cur.take_kw("INTO"):
            raise ValueError("SPLIT requires (lo, hi) INTO (olo, ohi)")
        outs = cur.take_parens()
        lo, hi = _parse_cols(bounds)
        olo, ohi = _parse_cols(outs)
        return {"op": "SPLIT", "lo": lo, "hi": hi, "olo": olo, "ohi": ohi}
    if w == "ARG":
        cur.take_kw("ARG")
        spec = cur.take_parens()
        if spec is None:
            raise ValueError("ARG requires (MAX(col)) or (MIN(col))")
        pattern = labeler = None
        save2 = cur.pos
        if cur.take_kw("OVER"):
            if not cur.take_kw("MATCH"):
                cur.pos = save2
            else:
                pattern = cur.take_str()
                labeler = cur.take_tail() if cur.take_kw("ON") else None
        return {"op": "ARG", "spec": spec, "pattern": pattern, "labeler": labeler}
    if w == "PIVOT":
        cur.take_kw("PIVOT")
        fn = cur.take_ident()
        if fn is None:
            # `PIVOT (...)` is Spark's native pivot syntax — leave it alone
            cur.pos = save
            return None
        arg = cur.take_parens()
        if arg is None or not cur.take_kw("FOR"):
            raise ValueError("PIVOT requires fn(arg) FOR col IN (...)")
        col = cur.take_ident()
        if not cur.take_kw("IN"):
            raise ValueError("PIVOT requires IN (targets)")
        targets = cur.take_parens()
        return {"op": "PIVOT", "fn": fn, "arg": arg.strip(), "col": col, "targets": targets}
    if w == "UNPIVOT":
        cur.take_kw("UNPIVOT")
        vcol = cur.take_ident()
        if vcol is None:
            # bare `UNPIVOT (...)` is Spark's native form
            cur.pos = save
            return None
        if not cur.take_kw("FOR"):
            raise ValueError("UNPIVOT requires <valcol> FOR <keycol> IN (...)")
        kcol = cur.take_ident()
        if not cur.take_kw("IN"):
            raise ValueError("UNPIVOT requires IN (col [AS 'label'], ...)")
        targets = cur.take_parens()
        return {"op": "UNPIVOT", "vcol": vcol, "kcol": kcol, "targets": targets}
    if w == "TYPEINFER":
        cur.take_kw("TYPEINFER")
        inner = cur.take_parens()
        return {"op": "TYPEINFER", "spec": inner}
    if w in ("CLASSIFIED", "CLUSTERED"):
        cur.take_kw(w)
        cur.take_kw("WITH")
        model = cur.take_ident()
        out = cur.take_parens()
        if model is None or out is None:
            raise ValueError(f"{w} requires [WITH] <model> (<outcol>)")
        return {"op": w, "model": model, "out": out.strip()}
    if w == "IMPUTED":
        specs = []
        while True:
            if not cur.take_kw("IMPUTED"):
                break
            cur.take_kw("WITH")
            model = cur.take_ident()
            col = cur.take_parens()
            if model is None or col is None:
                raise ValueError("IMPUTED requires [WITH] <model> (<col>)")
            flag = cur.take_ident() if cur.take_kw("FLAG") else None
            specs.append({"model": model, "col": col.strip(), "flag": flag})
            save2 = cur.pos
            cur.skip_ws()
            if cur.text[cur.pos : cur.pos + 1] == ",":
                nxt = _skip_ws(cur.text, cur.pos + 1)
                if _peek_word(cur.text, nxt) == "IMPUTED":
                    cur.pos = nxt
                    continue
            cur.pos = save2
            break
        return {"op": "IMPUTED", "specs": specs}
    if w == "TEXT":
        cur.take_kw("TEXT")
        save2 = cur.pos
        lang = None
        inner = cur.take_parens()
        if inner is not None:
            lang = inner.strip().strip("'")
        opname = cur.take_ident()
        if opname is None:
            # a bare `TEXT` that isn't our clause (e.g. a cast target)
            cur.pos = save
            return None
        args = None
        if cur.peek_char() == "(":
            args = cur.take_parens()
        elif cur.peek_char() == "'":
            args = cur.take_str()
        if not cur.take_kw("IN"):
            cur.pos = save
            return None
        incol = cur.take_ident()
        out = None
        if cur.take_kw("TO"):
            inner2 = cur.take_parens()
            out = _parse_cols(inner2) if inner2 is not None else [cur.take_ident()]
        return {
            "op": "TEXT",
            "lang": lang,
            "name": opname,
            "args": args,
            "in": incol,
            "to": out,
        }
    if w == "ALIGN":
        cur.take_kw("ALIGN")
        rhs = _parse_source(cur)
        if rhs is None:
            raise ValueError("ALIGN requires a right-hand relation")
        rhs_alias = _parse_alias(cur)
        rhs_order = _parse_ordered_by(cur)
        on = margin = None
        if cur.take_kw("ON"):
            on = cur.take_tail()
            if cur.take_kw("MARGIN"):
                margin = cur.take_int()
        return {
            "op": "ALIGN",
            "rhs": rhs[:2],
            "rhs_alias": rhs_alias,
            "rhs_order": rhs_order,
            "on": on,
            "margin": margin,
        }
    return None


def _parse_item(sql: str, pos: int) -> dict | None:
    cur = _Cursor(sql, pos)
    src = _parse_source(cur)
    if src is None:
        return None
    kind, text, start = src
    alias = _parse_alias(cur)
    ordered = part = None
    ops: list[dict] = []
    while True:
        o = _parse_ordered_by(cur)
        if o is not None:
            ordered = o
            continue
        p = _parse_partition_by(cur)
        if p is not None:
            part = p
            continue
        op = _parse_op(cur)
        if op is not None:
            ops.append(op)
            continue
        break
    return {
        "kind": kind,
        "source": text,
        "alias": alias,
        "ordered": ordered or [],
        "partition": part or [],
        "ops": ops,
        "start": start,
        "end": cur.pos,
    }


_JOIN_WORDS = {"JOIN", "LEFT", "RIGHT", "FULL", "INNER", "CROSS", "NATURAL"}


def _skip_join_condition(sql: str, pos: int) -> int:
    """Skip an ON <expr> / USING (...) condition to the next top-level
    item boundary."""
    n = len(sql)
    i = pos
    while i < n:
        c = sql[i]
        if c == "'":
            i = _skip_literal(sql, i)
        elif c == "(":
            i = _find_balanced(sql, i)
        elif c == ")" or c == ",":
            return i
        else:
            m = _WORD_RE.match(sql, i)
            if m:
                w = m.group(0).upper()
                if w in _JOIN_WORDS or w in (
                    "WHERE",
                    "GROUP",
                    "ORDER",
                    "HAVING",
                    "LIMIT",
                    "OFFSET",
                    "UNION",
                    "INTERSECT",
                    "EXCEPT",
                ):
                    return i
                i = m.end()
            else:
                i += 1
    return n


def _find_extended_item(sql: str) -> dict | None:
    """First from-item carrying an extended op, scanning FROM clauses,
    comma lists and join chains."""
    for fm in _FROM_RE.finditer(sql):
        if _in_literal(sql, fm.start()):
            continue
        pos = fm.end()
        while True:
            try:
                item = _parse_item(sql, pos)
            except ValueError:
                raise
            if item is None:
                break
            if item["ops"] or item["kind"] == "external":
                return item
            # move to the next item in this FROM clause, if any
            i = _skip_ws(sql, item["end"])
            if sql[i : i + 1] == ",":
                pos = i + 1
                continue
            w = _peek_word(sql, i)
            if w in _JOIN_WORDS:
                # skip join keywords, then parse the joined item; its
                # ON/USING condition is skipped after parsing
                while w in _JOIN_WORDS or w == "OUTER":
                    i += len(w)
                    i = _skip_ws(sql, i)
                    w = _peek_word(sql, i)
                nxt = _parse_item(sql, i)
                if nxt is None:
                    break
                if nxt["ops"] or nxt["kind"] == "external":
                    return nxt
                i = _skip_ws(sql, nxt["end"])
                w2 = _peek_word(sql, i)
                if w2 in ("ON", "USING"):
                    i = _skip_join_condition(sql, i + len(w2))
                pos = i
                # loop: the boundary scanner leaves us at ',' / join word /
                # terminator; re-enter via the comma/join branches
                i2 = _skip_ws(sql, pos)
                if sql[i2 : i2 + 1] == ",":
                    pos = i2 + 1
                    continue
                if _peek_word(sql, i2) in _JOIN_WORDS:
                    continue
                break
            break
    return None


def has_extended_clause(sql: str) -> bool:
    """Cheap pre-filter: any extended keyword outside a literal. The real
    decision is the parse in lower_extended (a column named `text` or
    `match` does not trip it)."""
    for m in re.finditer(
        r"\b(MATCH|SPLIT|ARG|PIVOT|UNPIVOT|TYPEINFER|CLASSIFIED|CLUSTERED|IMPUTED"
        r"|TEXT|ALIGN|EXTERNAL|SEQUENCE|EXPMOVAVG)\b",
        sql,
        re.IGNORECASE,
    ):
        if not _in_literal(sql, m.start()):
            return True
    return False


# ------------------------------------------------------------- lowering


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
    wm = re.match(
        r"(\w+)((?:\s+WHEN\s+.+?\s+THEN\s+\w+)+)(?:\s+ELSE\s+(\w+))?\s*$",
        spec,
        re.IGNORECASE | re.DOTALL,
    )
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


_LABEL_WHEN_RE = re.compile(
    r"LABEL\s+(?P<label>\w+)\s+WHEN\s+(?P<pred>.+?)(?=\s*,?\s*LABEL\s+\w+\s+WHEN|\s*$)",
    re.IGNORECASE | re.DOTALL,
)

_LABELED_FN_RE = re.compile(r"\b(\w+)\.(\w+)\s*\(\s*([^()]*?)\s*\)")

_LABELED_AGGS = {
    "AVG", "SUM", "MIN", "MAX", "COUNT", "STDDEV", "STDDEV_SAMP", "STDDEV_POP",
    "VAR_SAMP", "VAR_POP", "BOOL_AND", "BOOL_OR",
}

# sequence-positional aggregates: need the rows of the label in match
# order, lowered onto an ordered collect (sort_array over structs keyed by
# the ORDERED BY columns — all JVM-side, no window, valid in GROUP BY)
_LABELED_SEQ_FNS = {
    "LAG", "NTH_VALUE", "FIRST", "LAST", "PATH", "STRING_AGG",
    "RANK", "DENSE_RANK", "ROW_NUMBER", "EXISTS",
    "EXPMOVAVG", "MOVAVG", "MOVSUM", "MOVSTDDEV",
}


def _ordered_vals(label: str, expr: str, order_cols: list[str]) -> str:
    """Array of ``expr`` values over the label's rows in sequence order."""
    keys = ", ".join(
        f"{c} AS __o{i}" for i, c in enumerate(order_cols)
    )
    struct = f"struct({keys}, ({expr}) AS __v)"
    collected = (
        f"sort_array(collect_list("
        f"CASE WHEN match_label = '{label}' THEN {struct} END))"
    )
    return f"transform({collected}, __s -> __s.__v)"


_PAIR_AGGS = {
    "CORR", "COVAR_POP", "COVAR_SAMP", "REGR_COUNT", "REGR_AVGX",
    "REGR_AVGY", "REGR_SLOPE", "REGR_INTERCEPT", "REGR_R2",
    "REGR_SXX", "REGR_SYY", "REGR_SXY",
}

# moment-formula aggregates + aliases recognized in label scope (r14:
# SeqAggregate dispatch parity — SKEW/KURTOSIS default to SAMPLE in
# sequence context, EVERY aliases BOOL_AND, VAR/VARIANCE alias
# VAR_SAMP; two-arg AVG/STDDEV/VAR/SKEW/KURTOSIS are the step forms)
_LABELED_MOMENT_FNS = {
    "SKEW", "SKEW_POP", "SKEW_SAMP",
    "KURTOSIS", "KURTOSIS_POP", "KURTOSIS_SAMP",
    "EVERY", "VAR", "VARIANCE",
}


def _labeled_moment_fn(label: str, fn: str, p: str) -> str:
    """Label-scoped SKEW/KURTOSIS via guarded moment averages —
    formulas exactly as SeqSkewAggregate (SeqAggregate.scala:1029-1074)
    and SeqKurtosisAggregate (:1115-1158): population g1/g2 from raw
    moments, sample variants scaled by the reference's bias factors.
    One deliberate deviation: a zero-variance sequence yields NULL for
    the kurtosis POP variant too (the reference's Scala double division
    produces NaN/Infinity there, which SQL result columns cannot carry
    portably; the reference's own SKEW returns NULL on that input)."""
    g = f"CASE WHEN match_label = '{label}' THEN CAST(({p}) AS DOUBLE) END"
    n = f"count({g})"
    ex = f"avg({g})"
    exx = f"avg(power({g}, 2))"
    exxx = f"avg(power({g}, 3))"
    varpop = f"({exx} - power({ex}, 2))"
    if fn.startswith("SKEW"):
        pop = f"(({exxx} - 3 * {ex} * {exx} + 2 * power({ex}, 3)) / power({varpop}, 1.5))"
        if fn == "SKEW_POP":
            body = f"CASE WHEN {varpop} <= 0 THEN CAST(NULL AS DOUBLE) ELSE {pop} END"
        else:  # SKEW / SKEW_SAMP: sample skew (dispatch :1146)
            body = (
                f"CASE WHEN {varpop} <= 0 OR {n} <= 2 THEN CAST(NULL AS DOUBLE) "
                f"ELSE {pop} * sqrt(CAST({n} AS DOUBLE) * ({n} - 1)) / ({n} - 2) END"
            )
        return f"({body})"
    exxxx = f"avg(power({g}, 4))"
    pop = (
        f"((({exxxx} - 4 * {ex} * {exxx} + 6 * power({ex}, 2) * {exx} "
        f"- 3 * power({ex}, 4)) / {varpop}) / {varpop} - 3)"
    )
    if fn == "KURTOSIS_POP":
        body = f"CASE WHEN {varpop} <= 0 THEN CAST(NULL AS DOUBLE) ELSE {pop} END"
    else:  # KURTOSIS / KURTOSIS_SAMP: sample kurt (dispatch :1153)
        body = (
            f"CASE WHEN {varpop} <= 0 OR {n} <= 3 THEN CAST(NULL AS DOUBLE) "
            f"ELSE ({pop} * ({n} + 1) + 6) * CAST({n} - 1 AS DOUBLE) "
            f"/ (({n} - 2) * ({n} - 3)) END"
        )
    return f"({body})"


def _labeled_pair_fn(label: str, fn: str, y: str, x: str) -> str:
    """Label-scoped two-argument aggregates (CORR / COVAR_* / REGR_*)
    from guarded moment sums — formulas exactly as the reference's
    SeqPairUnLabeledAggregate family (SeqAggregate.scala:408-779),
    including its pair-skip rule: a row where EITHER argument is NULL
    contributes nothing (valueAsDoubleOpt None -> skip)."""
    pg = (
        f"match_label = '{label}' AND ({y}) IS NOT NULL "
        f"AND ({x}) IS NOT NULL"
    )

    def s(expr: str) -> str:
        return f"sum(CASE WHEN {pg} THEN CAST(({expr}) AS DOUBLE) END)"

    n = f"count(CASE WHEN {pg} THEN 1 END)"
    sy, sx = s(y), s(x)
    syx = s(f"({y}) * ({x})")
    syy = s(f"({y}) * ({y})")
    sxx = s(f"({x}) * ({x})")
    ey, ex = f"({sy} / {n})", f"({sx} / {n})"
    eyx, eyy, exx = f"({syx} / {n})", f"({syy} / {n})", f"({sxx} / {n})"
    cov = f"({eyx} - {ey} * {ex})"
    varx = f"({exx} - power({ex}, 2))"
    vary = f"({eyy} - power({ey}, 2))"
    if fn == "REGR_COUNT":
        return f"({n})"
    if fn == "REGR_AVGX":
        return f"(CASE WHEN {n} = 0 THEN CAST(NULL AS DOUBLE) ELSE {ex} END)"
    if fn == "REGR_AVGY":
        return f"(CASE WHEN {n} = 0 THEN CAST(NULL AS DOUBLE) ELSE {ey} END)"
    if fn == "CORR":
        sdy, sdx = f"sqrt({vary})", f"sqrt({varx})"
        return (
            f"(CASE WHEN {n} = 0 OR {sdy} = 0 OR {sdx} = 0 THEN "
            f"CAST(NULL AS DOUBLE) ELSE {cov} / ({sdy} * {sdx}) END)"
        )
    if fn == "COVAR_POP":
        return f"(CASE WHEN {n} = 0 THEN CAST(NULL AS DOUBLE) ELSE {cov} END)"
    if fn == "COVAR_SAMP":
        return (
            f"(CASE WHEN {n} <= 1 THEN CAST(NULL AS DOUBLE) "
            f"ELSE {cov} * {n} / ({n} - 1) END)"
        )
    if fn == "REGR_SLOPE":
        return (
            f"(CASE WHEN {n} = 0 OR {varx} = 0 THEN CAST(NULL AS DOUBLE) "
            f"ELSE {cov} / {varx} END)"
        )
    if fn == "REGR_INTERCEPT":
        return (
            f"(CASE WHEN {n} = 0 OR {varx} = 0 THEN CAST(NULL AS DOUBLE) "
            f"ELSE {ey} - {ex} * {cov} / {varx} END)"
        )
    if fn == "REGR_R2":
        # reference order (:660-680): varx == 0 -> NULL; vary == 0 -> 1.0
        return (
            f"(CASE WHEN {n} = 0 OR {varx} = 0 THEN CAST(NULL AS DOUBLE) "
            f"WHEN {vary} = 0 THEN CAST(1.0 AS DOUBLE) "
            f"ELSE ({cov} / {vary}) * ({cov} / {varx}) END)"
        )
    if fn == "REGR_SXX":
        return (
            f"(CASE WHEN {n} = 0 THEN CAST(NULL AS DOUBLE) "
            f"ELSE {sxx} - {n} * power({ex}, 2) END)"
        )
    if fn == "REGR_SYY":
        return (
            f"(CASE WHEN {n} = 0 THEN CAST(NULL AS DOUBLE) "
            f"ELSE {syy} - {n} * power({ey}, 2) END)"
        )
    # REGR_SXY
    return (
        f"(CASE WHEN {n} = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE {syx} - {n} * {ey} * {ex} END)"
    )


def _labeled_step_fn(label: str, fn: str, y: str, x: str) -> str:
    """Label-scoped STEP (weighted) aggregates — AVG/VAR/STDDEV/SKEW/
    KURTOSIS(y, step): each y weighs in by its step x (e.g. a time
    delta), exactly the running weighted moments of
    SeqAvgStepAggregate / SeqStdDevStepAggregate / SeqVarStepAggregate
    / SeqSkewStepAggregate / SeqKurtosisStepAggregate
    (SeqAggregate.scala:880-904,938-966,1000-1028,1075-1114,1159-1199);
    a zero cumulative step yields NULL, and all step variants are
    POPULATION-flavored (the reference defines no sample forms)."""
    pg = (
        f"match_label = '{label}' AND ({y}) IS NOT NULL "
        f"AND ({x}) IS NOT NULL"
    )

    def s(expr: str) -> str:
        return f"sum(CASE WHEN {pg} THEN CAST(({expr}) AS DOUBLE) END)"

    sx = s(x)
    sy = s(f"({x}) * ({y})")
    ey = f"({sy} / {sx})"
    null = "CAST(NULL AS DOUBLE)"
    if fn == "AVG":
        return f"(CASE WHEN {sx} IS NULL OR {sx} = 0 THEN {null} ELSE {ey} END)"
    syy = s(f"({x}) * ({y}) * ({y})")
    eyy = f"({syy} / {sx})"
    varpop = f"({eyy} - power({ey}, 2))"
    if fn in ("VAR", "VARIANCE"):
        return f"(CASE WHEN {sx} IS NULL OR {sx} = 0 THEN {null} ELSE {varpop} END)"
    if fn == "STDDEV":
        return (
            f"(CASE WHEN {sx} IS NULL OR {sx} = 0 THEN {null} "
            f"ELSE sqrt({varpop}) END)"
        )
    syyy = s(f"({x}) * ({y}) * ({y}) * ({y})")
    eyyy = f"({syyy} / {sx})"
    if fn == "SKEW":
        return (
            f"(CASE WHEN {sx} IS NULL OR {sx} = 0 OR {varpop} <= 0 THEN {null} "
            f"ELSE ({eyyy} - 3 * {ey} * {eyy} + 2 * power({ey}, 3)) "
            f"/ power({varpop}, 1.5) END)"
        )
    # KURTOSIS
    syyyy = s(f"({x}) * ({y}) * ({y}) * ({y}) * ({y})")
    eyyyy = f"({syyyy} / {sx})"
    return (
        f"(CASE WHEN {sx} IS NULL OR {sx} = 0 OR {varpop} <= 0 THEN {null} "
        f"ELSE (({eyyyy} - 4 * {ey} * {eyyy} + 6 * power({ey}, 2) * {eyy} "
        f"- 3 * power({ey}, 4)) / {varpop}) / {varpop} - 3 END)"
    )


def _lower_labeled_fn(label: str, fn: str, args: list[str], order_cols: list[str]) -> str:
    """One label-scoped aggregate -> Spark SQL aggregate expression
    (reference analytics/sequence/matcher/aggregate/SeqAggregate.scala:
    1203-1320 for the function-name dispatch and semantics)."""
    guard = f"CASE WHEN match_label = '{label}' THEN"
    # step (weighted) variants take the PAIR branch, not the plain one:
    # AVG(y, x) etc. weight each y by its step x (SeqAvgStepAggregate
    # and friends, SeqAggregate.scala:880-904,938-966,1000-1028,
    # 1075-1114,1159-1199)
    if fn in ("AVG", "STDDEV", "VAR", "VARIANCE", "SKEW", "KURTOSIS") and len(args) == 2:
        return _labeled_step_fn(label, fn, args[0], args[1])
    if fn in _PAIR_AGGS:
        return _labeled_pair_fn(label, fn, args[0], args[1])
    if fn in ("SKEW", "SKEW_POP", "SKEW_SAMP", "KURTOSIS", "KURTOSIS_POP", "KURTOSIS_SAMP"):
        return _labeled_moment_fn(label, fn, args[0])
    if fn == "EVERY":  # pg alias for BOOL_AND (dispatch :1291)
        return f"bool_and({guard} {args[0]} END)"
    if fn in ("VAR", "VARIANCE"):  # one-arg: sample variance (:1339)
        return f"var_samp({guard} CAST(({args[0]}) AS DOUBLE) END)"
    if fn in _LABELED_AGGS:
        inner = args[0] if args and args[0] != "*" else "1"
        return f"{fn.lower()}({guard} {inner} END)"
    if fn in ("COUNT", "ROW_NUMBER"):
        inner = args[0] if args and args[0] != "*" else "1"
        return f"count({guard} {inner} END)"
    if fn == "EXISTS":
        return f"(count({guard} 1 END) > 0)"
    if not order_cols:
        raise ValueError(f"label-scoped {fn} needs ORDERED BY on the MATCH input")
    if fn in ("NTH_VALUE", "FIRST"):
        n = args[1] if fn == "NTH_VALUE" else "1"
        v = _ordered_vals(label, args[0], order_cols)
        out = f"try_element_at({v}, {n})"
        if fn == "NTH_VALUE" and len(args) > 2:
            out = f"coalesce({out}, {args[2]})"
        return out
    if fn in ("LAG", "LAST"):
        # LAG(x, k): k-th value back from the end of the label's rows
        # (SeqIndexLastAggregate); LAST = LAG(x, 0)
        k = args[1] if fn == "LAG" and len(args) > 1 else "0"
        v = _ordered_vals(label, args[0], order_cols)
        out = f"try_element_at({v}, -(({k}) + 1))"
        if fn == "LAG" and len(args) > 2:
            out = f"coalesce({out}, {args[2]})"
        return out
    if fn in ("PATH", "STRING_AGG"):
        # PATH('>') concatenates the label path; STRING_AGG(x[, d]) the
        # values — both bracketed (reference SeqStringAggregate)
        if fn == "PATH":
            delim = args[0] if args else "', '"
            expr = "match_label"
        else:
            expr = args[0]
            delim = args[1] if len(args) > 1 else "', '"
        v = _ordered_vals(label, f"CAST(({expr}) AS STRING)", order_cols)
        return f"concat('[', array_join({v}, {delim}), ']')"
    if fn in ("EXPMOVAVG", "MOVAVG", "MOVSUM", "MOVSTDDEV"):
        # moving/exponential aggregates evaluated at the end of the
        # label's row sequence (SeqExpMovingAvgAggregate:840-859,
        # SeqMovingAvgAggregate:797-813, SeqMovingStdDevAggregate:815-839)
        v = _ordered_vals(label, f"CAST(({args[0]}) AS DOUBLE)", order_cols)
        if fn == "EXPMOVAVG":
            d = args[1]
            return (
                f"aggregate(({v}), CAST(NULL AS DOUBLE), (__a, __x) -> "
                f"CASE WHEN __a IS NULL THEN __x "
                f"ELSE __a * (1 - ({d})) + __x * ({d}) END)"
            )
        n = args[1]
        lastn = f"slice(__vs, greatest(size(__vs) - ({n}) + 1, 1), ({n}))"
        ssum = f"aggregate({lastn}, CAST(0 AS DOUBLE), (__a, __x) -> __a + __x)"
        c = f"size({lastn})"
        if fn == "MOVSUM":
            body = f"CASE WHEN size(__vs) = 0 THEN CAST(NULL AS DOUBLE) ELSE {ssum} END"
        elif fn == "MOVAVG":
            body = (
                f"CASE WHEN size(__vs) = 0 THEN CAST(NULL AS DOUBLE) "
                f"ELSE ({ssum}) / {c} END"
            )
        else:  # MOVSTDDEV: population var of the last n, scaled to sample
            ssq = f"aggregate({lastn}, CAST(0 AS DOUBLE), (__a, __x) -> __a + __x * __x)"
            body = (
                f"CASE WHEN {c} <= 1 THEN CAST(NULL AS DOUBLE) ELSE "
                f"sqrt((({ssq}) / {c} - pow(({ssum}) / {c}, 2)) * {c} / ({c} - 1)) END"
            )
        return "(" + body.replace("__vs", f"({v})") + ")"
    if fn in ("RANK", "DENSE_RANK"):
        # running rank in sequence order, evaluated at the last row
        # (SeqRankAggregate): RANK jumps to the position where the final
        # run of equal values starts; DENSE_RANK counts value changes
        v = _ordered_vals(label, args[0], order_cols)
        size = f"size(__vs)"
        changes = (
            f"zip_with(slice(__vs, 1, {size} - 1), slice(__vs, 2, {size} - 1),"
            f" (__a, __b) -> __a IS DISTINCT FROM __b)"
        )
        if fn == "DENSE_RANK":
            body = f"size(filter({changes}, __c -> __c)) + 1"
        else:
            rev = f"reverse(__vs)"
            revchanges = (
                f"zip_with(slice({rev}, 1, {size} - 1), slice({rev}, 2, {size} - 1),"
                f" (__a, __b) -> __a IS DISTINCT FROM __b)"
            )
            runlen = (
                f"(CASE WHEN array_position({revchanges}, true) = 0 THEN {size} "
                f"ELSE array_position({revchanges}, true) END)"
            )
            body = f"{size} - ({runlen}) + 1"
        # bind the collected array once via a literal lambda application
        return (
            f"(CASE WHEN size({v}) = 0 THEN 0 ELSE "
            f"{body.replace('__vs', f'({v})')} END)"
        )
    raise ValueError(f"unsupported label-scoped function: {fn}")


def rewrite_labeled_functions(
    sql: str, labels: set[str], order_cols: list[str] | None = None
) -> str:
    """`A.avg(x)` -> `avg(CASE WHEN match_label = 'A' THEN x END)`, plus
    the sequence-positional tier (`A.LAG(x, 1)`, `A.NTH_VALUE(x, 2)`,
    `A.PATH('>')`, `A.RANK(x)`, ...) lowered onto ordered collects —
    the label-scoped aggregate surface (reference LabeledFunction,
    sql/expr/scalar/ScalOp.scala:149-154 + SeqAggregate.scala dispatch).
    Applied only for labels of the query's MATCH pattern, so
    table-qualified column refs are untouched. Arguments must be
    paren-free expressions (nested calls need a pre-projected column)."""
    from sclera_spark.plans.frontend import _split_top_commas

    order_cols = order_cols or []

    def sub(m: re.Match) -> str:
        label, fn, arg = m.group(1), m.group(2), m.group(3)
        fn_u = fn.upper()
        if label.upper() not in labels or (
            fn_u not in _LABELED_AGGS and fn_u not in _LABELED_SEQ_FNS
            and fn_u not in _PAIR_AGGS and fn_u not in _LABELED_MOMENT_FNS
            and fn_u != "COUNT"
        ):
            return m.group(0)
        args = [a.strip() for a in _split_top_commas(arg) if a.strip()]
        return _lower_labeled_fn(label.upper(), fn_u, args, order_cols)

    return _LABELED_FN_RE.sub(sub, sql)


def _resolve_source(engine, kind: str, text):
    if kind == "table":
        return engine.table(text)
    if kind == "external":
        # FROM EXTERNAL src('param', ...) / FROM SEQUENCE(n)
        # (reference SqlQueryParser.scala:1054-1062)
        from sclera_spark.plans.frontend import _split_top_commas

        name, params = text
        args = []
        for p in _split_top_commas(params):
            p = p.strip()
            if not p:
                continue
            if p.startswith("'"):
                args.append(p.strip("'"))
            else:
                try:
                    args.append(int(p))
                except ValueError:
                    args.append(p)
        return engine.external_source(name, *args)
    inner = text.strip()
    if not re.match(r"(?is)\s*(SELECT|WITH|VALUES|TABLE)\b", inner):
        inner = "SELECT * FROM " + inner
    return engine.sql(inner)  # recursive: nested extended clauses compose


_DIST_FUNCS = {"abs", "sqrt", "log", "exp", "floor", "ceil", "minimum", "maximum"}
_DIST_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*|\d+\.\d+|\d+|[-+*/(), ]")


def _compile_dist(expr: str, a_cols: list[str], b_cols: list[str]):
    """SQL arithmetic dist expression -> numpy-vectorized callable over the
    two sides' candidate rows (identifiers resolve to column arrays; only
    arithmetic and a small whitelisted function set are admitted)."""
    import numpy as np

    cols = set(a_cols) | set(b_cols)
    out, pos = [], 0
    for m in _DIST_TOKEN_RE.finditer(expr):
        if m.start() != pos:
            raise ValueError(f"unsupported token in ALIGN ON expression: {expr[pos:m.start()]!r}")
        pos = m.end()
        tok = m.group(0)
        low = tok.lower()
        if tok[0].isalpha() or tok[0] == "_":
            if low in _DIST_FUNCS:
                out.append(f"np.{'fabs' if low == 'abs' else low}")
            elif low in ("least", "greatest"):
                out.append("np.minimum" if low == "least" else "np.maximum")
            elif tok in cols:
                out.append(f"__env[{tok!r}]")
            else:
                raise ValueError(f"unknown column in ALIGN ON expression: {tok}")
        else:
            out.append(tok)
    if pos != len(expr.strip()) and expr[pos:].strip():
        raise ValueError(f"unsupported token in ALIGN ON expression: {expr[pos:]!r}")
    code = compile("".join(out), "<align-dist>", "eval")

    def dist(pa, pb):
        env = {c: pa[c].to_numpy() for c in a_cols if c in pa.columns}
        env.update({c: pb[c].to_numpy() for c in b_cols if c in pb.columns})
        return eval(code, {"__builtins__": {}, "np": np, "__env": env})

    return dist


_EMA_RE = re.compile(
    r"\bEXPMOVAVG\s*\(\s*(?P<col>\w+)\s*,\s*(?P<decay>[0-9.]+)\s*\)\s*"
    r"OVER\s*\(\s*(?:PARTITION\s+BY\s+(?P<part>\w+(?:\s*,\s*\w+)*)\s+)?"
    r"ORDER\s+BY\s+(?P<ord>\w+(?:\s*,\s*\w+)*)\s*\)",
    re.IGNORECASE,
)


def _lower_expmovavg_windows(engine, sql: str) -> str:
    """`EXPMOVAVG(x, decay) OVER (PARTITION BY p ORDER BY o)` in a select
    list -> the sequential EXPMOVAVG operator (reference
    SeqExpMovingAvgAggregate; an EMA is a recurrence, inexpressible as a
    framed window). The FROM item must be a plain table or derived table;
    each occurrence adds an EMA column to the source and the call site is
    rewritten to reference it."""
    from sclera_spark.operators import expmovavg

    while True:
        m = _EMA_RE.search(sql)
        if m is None or _in_literal(sql, m.start()):
            return sql
        fm = None
        for cand in _FROM_RE.finditer(sql):
            if not _in_literal(sql, cand.start()):
                fm = cand
                break
        if fm is None:
            raise ValueError("EXPMOVAVG window requires a FROM clause")
        item = _parse_item(sql, fm.end())
        if item is None or item["ops"]:
            raise ValueError(
                "EXPMOVAVG window needs a plain table/derived-table FROM item"
            )
        df = _resolve_source(engine, item["kind"], item["source"])
        out_col = f"__sclera_ema_{next(_COUNTER)}"
        df = expmovavg(
            df,
            m.group("col"),
            decay=float(m.group("decay")),
            partition_by=[c.strip() for c in (m.group("part") or "").split(",") if c.strip()],
            order_by=[c.strip() for c in m.group("ord").split(",")],
            out_col=out_col,
        )
        view = f"__sclera_ext_{next(_COUNTER)}"
        df.createOrReplaceTempView(view)
        repl = view if item["alias"] is None else f"{view} AS {item['alias']}"
        # splice call-site and from-item replacements in text order: the
        # EMA call usually precedes the FROM item (select list) but can
        # follow it (ORDER BY / HAVING) — the old unconditional
        # call-first splice garbled the SQL in that case
        if m.end() <= item["start"]:
            sql = (
                sql[: m.start()]
                + out_col
                + sql[m.end() : item["start"]]
                + repl
                + " "
                + sql[item["end"] :]
            )
        elif m.start() >= item["end"]:
            sql = (
                sql[: item["start"]]
                + repl
                + " "
                + sql[item["end"] : m.start()]
                + out_col
                + sql[m.end() :]
            )
        else:  # pragma: no cover - a call cannot straddle its FROM item
            raise ValueError("EXPMOVAVG window overlaps its FROM item")


def lower_extended(engine, sql: str) -> str:
    """Replace each extended from-item with a temp view over the operator's
    result; returns plain Spark SQL."""
    sql = _lower_expmovavg_windows(engine, sql)
    while True:
        item = _find_extended_item(sql)
        if item is None:
            return sql
        df = _resolve_source(engine, item["kind"], item["source"])
        labels: set[str] | None = None
        for op in item["ops"]:
            df, op_labels = _lower_op(engine, df, op, item)
            labels = op_labels or labels
        view = f"__sclera_ext_{next(_COUNTER)}"
        df.createOrReplaceTempView(view)
        repl = view if item["alias"] is None else f"{view} AS {item['alias']}"
        sql = sql[: item["start"]] + repl + " " + sql[item["end"] :]
        if labels:
            sql = rewrite_labeled_functions(sql, labels, item["ordered"])


def _lower_op(engine, df, op: dict, item: dict):
    """Apply one parsed extended op to a DataFrame; returns (df, labels)."""
    from pyspark.sql import functions as F

    from sclera_spark.operators import (
        align,
        align_zip,
        arg_opt,
        infer_types,
        pivot as pivot_op,
        split_into,
        unpivot as unpivot_op,
    )
    from sclera_spark.operators.match import compile_pattern, match_rows

    order = item["ordered"]
    part = item["partition"]
    kind = op["op"]
    labels: set[str] | None = None

    if kind == "MATCH":
        if not order:
            raise ValueError(
                "MATCH requires ORDERED BY (cols) to fix the row sequence "
                "(Spark makes no input-order guarantee)"
            )
        labeler = _parse_labeler(op["labeler"], op["pattern"])
        df = match_rows(df, op["pattern"], labeler, order_by=order, partition_by=part)
        labels = set(compile_pattern(op["pattern"]).labels)
    elif kind == "SPLIT":
        df = split_into(df, op["lo"], op["hi"], op["olo"], op["ohi"], partition_by=part)
    elif kind == "ARG":
        from sclera_spark.plans.frontend import _split_top_commas

        # the reference grammar takes a LIST of fnspecs
        # (SqlQueryParser.scala:278-298, matchArgSpecOrParList:1067-1069);
        # each spec contributes its own optimum row(s), concatenated
        # (SeqArgOpts.result flatMaps over the aggregates)
        specs: list[tuple[bool, str]] = []
        for spec_text in _split_top_commas(op["spec"]):
            sm = re.match(
                r"(MAX|MIN)\s*\(\s*([\w.]+)\s*\)\s*$", spec_text.strip(), re.IGNORECASE
            )
            if not sm:
                raise ValueError(f"cannot parse ARG spec: {spec_text!r}")
            specs.append((sm.group(1).upper() == "MAX", sm.group(2)))
        if op["pattern"]:
            if not order:
                raise ValueError("ARG OVER MATCH requires ORDERED BY (cols)")
            labeler = _parse_labeler(op["labeler"], op["pattern"])
            matched = match_rows(
                df, op["pattern"], labeler, order_by=order, partition_by=part
            )
            base = matched.drop("match_label")
            outs = [
                arg_opt(
                    base,
                    F.col(opt_col),
                    maximize=maximize,
                    partition_by=part + ["match_id"],
                ).drop("match_id")
                for maximize, opt_col in specs
            ]
        else:
            outs = [
                arg_opt(df, F.col(opt_col), maximize=maximize, partition_by=part)
                for maximize, opt_col in specs
            ]
        df = outs[0]
        for extra in outs[1:]:
            df = df.unionAll(extra)
    elif kind == "PIVOT":
        from sclera_spark.functions import aggregate_function

        labels_list, aliases = [], {}
        for target in op["targets"].split(","):
            tm = re.match(r"\s*'?([\w #-]+?)'?\s*(?:AS\s+(\w+))?\s*$", target, re.IGNORECASE)
            labels_list.append(tm.group(1))
            if tm.group(2):
                aliases[tm.group(1)] = tm.group(2)
        agg = (
            aggregate_function(op["fn"], F.col(op["arg"]))
            if op["arg"] and op["arg"] != "*"
            else aggregate_function(op["fn"], F.lit(1))
        )
        df = pivot_op(
            df,
            group_by=part,
            pivot_col=op["col"],
            labels=labels_list,
            agg=agg,
            aliases=aliases or None,
            # SQL COUNT over zero rows is 0, not the NULL Spark's native
            # pivot emits for an absent label (fuzzer-found)
            empty_value=0 if op["fn"].upper() == "COUNT" else None,
        )
    elif kind == "UNPIVOT":
        value_cols, key_labels = [], {}
        for target in op["targets"].split(","):
            tm = re.match(
                r"\s*(\w+)\s*(?:AS\s+'([^']*)'\s*)?$", target, re.IGNORECASE
            )
            if not tm:
                raise ValueError(f"cannot parse UNPIVOT target: {target!r}")
            value_cols.append(tm.group(1))
            if tm.group(2) is not None:
                key_labels[tm.group(1)] = tm.group(2)
        df = unpivot_op(
            df,
            ids=[c for c in df.columns if c not in value_cols],
            value_cols=value_cols,
            key_col=op["kcol"],
            value_col=op["vcol"],
            labels=key_labels or None,
        )
    elif kind == "TYPEINFER":
        cols: list[str] | None = None
        nulls: list[str] = [""]
        limit = 1000
        spec = op["spec"]
        if spec:
            scur = _Cursor(spec, 0)
            cols = []
            while True:
                w = scur.peek_word()
                if w == "NULLS":
                    scur.take_kw("NULLS")
                    inner = scur.take_parens() or ""
                    nulls = [s.strip().strip("'") for s in inner.split(",")]
                    continue
                if w == "LIMIT":
                    scur.take_kw("LIMIT")
                    limit = scur.take_int() or limit
                    continue
                if scur.peek_char() == "*":
                    scur.pos += 1
                    continue
                c = scur.take_ident()
                if c is None:
                    break
                cols.append(c)
                scur.skip_ws()
                if scur.text[scur.pos : scur.pos + 1] == ",":
                    scur.pos += 1
            cols = cols or None
        df = infer_types(df, cols=cols, nulls=nulls, limit=limit)
    elif kind in ("CLASSIFIED", "CLUSTERED"):
        from sclera_spark.ml import classify, cluster

        fn = classify if kind == "CLASSIFIED" else cluster
        df = fn(engine.ml, df, op["model"], out_col=op["out"])
    elif kind == "IMPUTED":
        from sclera_spark.ml import impute

        for spec in op["specs"]:
            df = impute(
                engine.ml, df, spec["model"], col=spec["col"], flag_col=spec["flag"]
            )
    elif kind == "TEXT":
        from sclera_spark.nlp import nlp_op

        kwargs = {}
        if op["to"]:
            kwargs["out_col"] = op["to"][0]
            if len(op["to"]) > 1:
                # multi-column resCols (only ENTITIES emits a second col)
                kwargs["type_col"] = op["to"][1]
        # annotIdent: optional library qualifier (`TEXT nlp.tokenize IN c`)
        df = nlp_op(op["name"].split(".")[-1], df, op["in"], **kwargs)
    elif kind == "ALIGN":
        rhs = _resolve_source(engine, *op["rhs"])
        if op["on"]:
            a_cols = [c for c in df.columns]
            b_cols = [c for c in rhs.columns]
            dist = _compile_dist(op["on"], a_cols, b_cols)
            df = align(
                df,
                rhs,
                dist=dist,
                margin=op["margin"],
                order_by_a=order,
                order_by_b=op["rhs_order"] or order,
                partition_by=part,
            )
        else:
            if not order or not (op["rhs_order"] or order):
                raise ValueError("ALIGN requires ORDERED BY on both sides")
            df = align_zip(
                df,
                rhs,
                order_by_a=order,
                order_by_b=op["rhs_order"] or order,
                partition_by=part,
            )
    else:  # pragma: no cover
        raise ValueError(f"unknown extended op: {kind}")
    return df, labels
