"""Grammar fuzz: the SQL front end vs DuckDB on generated queries.

Every front-end bug found in rounds 1-4 (quantified-comparison parens,
SIMILAR TO parens, EMA splice, FLOOR typing) was a literal-aware-splicing
edge case. This suite generates structurally gnarly queries over the
rewrite surface (frontend.py: `::` casts, BETWEEN [SYMMETRIC], quantified
comparisons, SIMILAR TO, postfix ISNULL/NOTNULL, DISTINCT ON, `* EXCEPT`,
set ops, subqueries, ordered aggregates) with string literals containing
keywords/parens/quotes, nested parentheses, and rewrites inside derived
tables — then executes each on the engine AND DuckDB and compares
canonically.

The generator is seeded and deterministic: every seed is a reproducible
regression case (`Gen(random.Random(seed))`). Where the two dialects
genuinely differ (SYMMETRIC, `* EXCEPT` vs `* EXCLUDE`, postfix ISNULL),
each grammar node emits a (sclera_text, duck_text) pair so the oracle
stays exact.
"""

from __future__ import annotations

import math
import random

import pytest

from sclera_spark.engine import ScleraEngine

N_SEEDS = 260  # >= 200 generated queries per the round-5 plan

# ---------------------------------------------------------------- fixtures

_ROWS = []
_STRINGS = [
    "apple", "Banana", "FROM (WHERE", "SELECT ' x", "a)b(c", "BETWEEN AND",
    "100%", "un_der", "o'neil", "  pad  ", "ANY (SELECT", None, "", "zz",
]
for i in range(40):
    _ROWS.append(
        (
            i,
            None if i % 9 == 7 else (i * 7) % 5,
            None if i % 11 == 10 else round(i * 1.25 - 20.5, 2),
            _STRINGS[i % len(_STRINGS)],
        )
    )
_UROWS = [(k, "v%d" % k) for k in range(0, 12, 2)] + [(99, None)]


@pytest.fixture(scope="module")
def fuzz_env(spark):
    import pandas as pd

    engine = ScleraEngine(spark)
    tdf = spark.createDataFrame(_ROWS, "i int, j int, f double, s string")
    udf = spark.createDataFrame(_UROWS, "k int, v string")
    engine.add_table("t", tdf)
    engine.add_table("u", udf)

    import duckdb

    duck = duckdb.connect()
    # nullable Int32 keeps DuckDB's column INTEGER (a plain pandas int
    # column with None degrades to float64 -> DOUBLE, which skews CASE
    # branch type unification vs Spark)
    tpd = pd.DataFrame(_ROWS, columns=["i", "j", "f", "s"])
    tpd["i"] = tpd["i"].astype("Int32")
    tpd["j"] = tpd["j"].astype("Int32")
    upd = pd.DataFrame(_UROWS, columns=["k", "v"])
    upd["k"] = upd["k"].astype("Int32")
    duck.register("t", tpd)
    duck.register("u", upd)
    return engine, duck


# ---------------------------------------------------------------- generator


class Gen:
    """Seeded query generator emitting (sclera_sql, duck_sql) pairs."""

    def __init__(self, rng: random.Random):
        self.rng = rng

    def pick(self, seq):
        return self.rng.choice(seq)

    # -- scalar expressions ------------------------------------------------

    def num_expr(self, depth=0) -> tuple[str, str]:
        if depth > 2 or self.rng.random() < 0.35:
            # 2.5e0 not 2.5: a bare decimal literal types as DECIMAL in
            # Spark but feeds DOUBLE paths in DuckDB, so AVG/CEIL chains
            # diverge in scale, not value
            atom = self.pick(["i", "j", "f", "3", "(-7)", "0", "2.5e0", "(1 + 1)"])
            return atom, atom
        kind = self.pick(
            [
                "arith", "case", "coalesce", "nullif", "cast", "paren", "fn",
                "unit", "scale", "tsdiff",
            ]
        )
        a, da = self.num_expr(depth + 1)
        b, db = self.num_expr(depth + 1)
        if kind == "unit":
            # Sclera ms-unit constructors (frontend _SCLERA_SQL_FNS) — the
            # regex splice must fire in any expression position
            mult = {
                "MILLISECONDS": 1, "SECONDS": 1000, "MINUTES": 60_000,
                "HOURS": 3_600_000, "DAYS": 86_400_000,
            }
            fn = self.pick(sorted(mult))
            src = self.pick(["i", "j"])
            return f"{fn}({src})", f"(CAST({src} AS BIGINT) * {mult[fn]})"
        if kind == "scale":
            # SCALE = HALF_UP round cast to double; DuckDB round matches on
            # double ties (away from zero)
            return f"SCALE({a}, 1)", f"round({da}, 1)"
        if kind == "tsdiff":
            # ms-based TIMESTAMP_ADD/_DIFF/_UNIX with a literal containing a
            # space — exercises splicing around quoted timestamps
            src = self.pick(["i", "j"])
            lit = "TIMESTAMP '2021-03-04 05:06:07'"
            if self.rng.random() < 0.5:
                return (
                    f"TIMESTAMP_DIFF(TIMESTAMP_ADD({lit}, MINUTES({src})), {lit})",
                    f"(epoch_ms({lit} + to_milliseconds(CAST({src} AS BIGINT) * 60000))"
                    f" - epoch_ms({lit}))",
                )
            return (
                f"TIMESTAMP_UNIX(TIMESTAMP_ADD({lit}, SECONDS({src})))",
                f"epoch_ms({lit} + to_milliseconds(CAST({src} AS BIGINT) * 1000))",
            )
        if kind == "arith":
            op = self.pick(["+", "-", "*"])
            return f"({a} {op} {b})", f"({da} {op} {db})"
        if kind == "case":
            p, dp = self.pred(depth + 1)
            return (
                f"(CASE WHEN {p} THEN {a} ELSE {b} END)",
                f"(CASE WHEN {dp} THEN {da} ELSE {db} END)",
            )
        if kind == "coalesce":
            return f"COALESCE({a}, {b})", f"COALESCE({da}, {db})"
        if kind == "nullif":
            return f"NULLIF({a}, {b})", f"NULLIF({da}, {db})"
        if kind == "cast":
            # int-up and int->double only: double->int rounds in DuckDB but
            # truncates in Spark/Sclera (SKILL.md gotcha), so never generated
            styp, dtyp = self.pick([("BIGINT", "BIGINT"), ("DOUBLE", "DOUBLE")])
            src = self.pick(["i", "j", "(i + 2)"])
            if self.rng.random() < 0.5:
                return f"({src} :: {styp})", f"({src}::{dtyp})"
            return f"CAST({src} AS {styp})", f"CAST({src} AS {dtyp})"
        if kind == "fn":
            fn = self.pick(["ABS", "FLOOR", "CEIL", "SIGN"])
            dfn = "CEILING" if fn == "CEIL" else fn
            return f"{fn}({a})", f"{dfn}({da})"
        return f"(({a}))", f"(({da}))"

    def str_expr(self, depth=0) -> tuple[str, str]:
        lits = [
            "'FROM (WHERE'", "'a''b'", "')('", "'BETWEEN'", "' AND '",
            "'SELECT ''x'''", "''", "'zz'",
        ]
        if depth > 1 or self.rng.random() < 0.4:
            atom = self.pick(["s", "s", "v"] if depth == -1 else ["s"] + lits)
            return atom, atom
        kind = self.pick(["concat", "fn", "substr", "case", "replace"])
        a, da = self.str_expr(depth + 1)
        if kind == "replace":
            # Sclera REPLACE = literal replace-all (Java String.replace);
            # REPLACEALL = regex replace-all -> duck regexp_replace(..., 'g')
            search, repl = self.pick([("'a'", "'<>'"), ("'e'", "''"), ("' '", "'_'")])
            if self.rng.random() < 0.5:
                return (
                    f"REPLACE({a}, {search}, {repl})",
                    f"replace({da}, {search}, {repl})",
                )
            return (
                f"REPLACEALL({a}, {search}, {repl})",
                f"regexp_replace({da}, {search}, {repl}, 'g')",
            )
        if kind == "concat":
            b, dbs = self.str_expr(depth + 1)
            return f"({a} || {b})", f"({da} || {dbs})"
        if kind == "fn":
            fn = self.pick(["LOWER", "UPPER", "TRIM"])
            return f"{fn}({a})", f"{fn}({da})"
        if kind == "substr":
            return f"SUBSTRING({a}, 2, 3)", f"SUBSTRING({da}, 2, 3)"
        p, dp = self.pred(depth + 1)
        b, dbs = self.str_expr(depth + 1)
        return (
            f"(CASE WHEN {p} THEN {a} ELSE {b} END)",
            f"(CASE WHEN {dp} THEN {da} ELSE {dbs} END)",
        )

    # -- predicates --------------------------------------------------------

    def pred(self, depth=0) -> tuple[str, str]:
        if depth > 2:
            return self.base_pred(depth)
        kind = self.pick(["base", "base", "and", "or", "not", "paren"])
        if kind == "base":
            return self.base_pred(depth)
        a, da = self.pred(depth + 1)
        if kind == "not":
            return f"(NOT {a})", f"(NOT {da})"
        if kind == "paren":
            return f"(({a}))", f"(({da}))"
        b, db = self.pred(depth + 1)
        op = "AND" if kind == "and" else "OR"
        return f"({a} {op} {b})", f"({da} {op} {db})"

    def base_pred(self, depth) -> tuple[str, str]:
        kind = self.pick(
            [
                "cmp", "between", "in_list", "null", "postfix_null", "distinct",
                "like", "ilike", "similar", "quant", "exists", "in_subq",
                "strcmp", "strpos", "quant_str",
            ]
        )
        a, da = self.num_expr(depth + 1)
        b, db = self.num_expr(depth + 1)
        if kind == "strcmp":
            lit = self.pick(["'m'", "'o''neil'", "'FROM (WHERE'", "'  pad  '", "'zz'"])
            form = self.pick(["cmp", "between", "distinct"])
            if form == "cmp":
                op = self.pick(["=", "<>", "<", ">="])
                return f"(s {op} {lit})", f"(s {op} {lit})"
            if form == "between":
                return (
                    f"(s BETWEEN 'A' AND {lit})",
                    f"(s BETWEEN 'A' AND {lit})",
                )
            return f"(s IS DISTINCT FROM {lit})", f"(s IS DISTINCT FROM {lit})"
        if kind == "strpos":
            # STRPOS -> instr rewrite inside a predicate position
            sub = self.pick(["'a'", "'('", "''''"])
            op = self.pick([">", "=", ">="])
            n = self.rng.randint(0, 2)
            return (
                f"(STRPOS(s, {sub}) {op} {n})",
                f"(strpos(s, {sub}) {op} {n})",
            )
        if kind == "quant_str":
            op = self.pick(["=", "<>", "<", ">"])
            q = self.pick(["ANY", "ALL", "SOME"])
            dq = "ANY" if q == "SOME" else q
            w = self.pick(["k < 6", "v IS NOT NULL", "k <> 4"])
            return (
                f"((s) {op} {q} (SELECT v FROM u WHERE {w}))",
                f"((s) {op} {dq} (SELECT v FROM u WHERE {w}))",
            )
        if kind == "cmp":
            op = self.pick(["=", "<>", "<", "<=", ">", ">="])
            return f"({a} {op} {b})", f"({da} {op} {db})"
        if kind == "between":
            lo, dlo = self.num_expr(depth + 1)
            hi, dhi = self.num_expr(depth + 1)
            if self.rng.random() < 0.4:
                # SYMMETRIC: sclera-only keyword; expanded for the oracle
                return (
                    f"({a} BETWEEN SYMMETRIC {lo} AND {hi})",
                    f"(({da} BETWEEN {dlo} AND {dhi}) OR ({da} BETWEEN {dhi} AND {dlo}))",
                )
            return f"({a} BETWEEN {lo} AND {hi})", f"({da} BETWEEN {dlo} AND {dhi})"
        if kind == "in_list":
            vals = self.pick(["1, 3, 5", "0, NULL, 2", "(1), (2), 7"])
            return f"({a} IN ({vals}))", f"({da} IN ({vals}))"
        if kind == "null":
            neg = self.pick(["", "NOT "])
            return f"({a} IS {neg}NULL)", f"({da} IS {neg}NULL)"
        if kind == "postfix_null":
            # sclera/postgres postfix forms; standard forms for the oracle
            form = self.pick([("ISNULL", "IS NULL"), ("NOTNULL", "IS NOT NULL")])
            return f"({a} {form[0]})", f"({da} {form[1]})"
        if kind == "distinct":
            return f"({a} IS DISTINCT FROM {b})", f"({da} IS DISTINCT FROM {db})"
        if kind == "like":
            pat = self.pick(["'%a%'", "'%100!%%' ESCAPE '!'", "'__'", "'%(%'"])
            neg = self.pick(["", "NOT "])
            return f"(s {neg}LIKE {pat})", f"(s {neg}LIKE {pat})"
        if kind == "ilike":
            pat = self.pick(["'%AN%'", "'%b%'", "'A%'"])
            return f"(s ILIKE {pat})", f"(s ILIKE {pat})"
        if kind == "similar":
            # DuckDB's SIMILAR TO takes a raw regex (no %/_ wildcard
            # conversion), unlike the SQL standard — oracle via
            # regexp_full_match on the converted pattern
            pat, rex = self.pick(
                [
                    ("'(a|z)%'", "'(a|z).*'"),
                    ("'%(n|l)'", "'.*(n|l)'"),
                    ("'_a%'", "'.a.*'"),
                    ("'%(''|x)%'", "'.*(''|x).*'"),
                ]
            )
            if self.rng.random() < 0.4:
                return (
                    f"(s NOT SIMILAR TO {pat})",
                    f"(NOT regexp_full_match(s, {rex}))",
                )
            return f"(s SIMILAR TO {pat})", f"(regexp_full_match(s, {rex}))"
        if kind == "quant":
            op = self.pick(["=", "<>", "<", ">", ">=", "<="])
            q = self.pick(["ANY", "ALL", "SOME"])
            sub, dsub = self.subquery_num(depth + 1)
            if self.rng.random() < 0.4:
                # correlated operand (reference punts; we decorrelate via
                # Catalyst — keep the fuzzer honest about it). Correlation
                # predicates chosen so some rows get EMPTY per-row sets
                # (ALL vacuous-TRUE / ANY FALSE corners) and some NULL js
                # make the correlation itself UNKNOWN.
                corr = self.pick(["u.k = t.j", "u.k < t.j", "u.k + 2 = t.i"])
                sub = f"{sub} AND {corr}"
                dsub = f"{dsub} AND {corr}"
            return (
                f"(({a}) {op} {q} ({sub}))",
                f"(({da}) {op} {q} ({dsub}))",
            )
        if kind == "exists":
            neg = self.pick(["", "NOT "])
            return (
                f"({neg}EXISTS (SELECT 1 FROM u WHERE u.k = t.j))",
                f"({neg}EXISTS (SELECT 1 FROM u WHERE u.k = t.j))",
            )
        sub, dsub = self.subquery_num(depth + 1)
        neg = self.pick(["", "NOT "])
        return f"({a} {neg}IN ({sub}))", f"({da} {neg}IN ({dsub}))"

    def subquery_num(self, depth) -> tuple[str, str]:
        w = self.pick(["k < 6", "k > 2", "v IS NOT NULL", "k <> 4"])
        return f"SELECT k FROM u WHERE {w}", f"SELECT k FROM u WHERE {w}"

    # -- whole queries -----------------------------------------------------

    def query(self) -> tuple[str, str]:
        kind = self.pick(
            [
                "project", "project", "agg", "distinct_on", "star_except",
                "setop", "derived", "order_fetch", "join", "having_quant",
                "string_agg", "case_simple", "ordinals", "derived_don",
                "dt_project",
            ]
        )
        p, dp = self.pred()
        if kind == "case_simple":
            e, de = self.num_expr()
            return (
                f"SELECT i, CASE j WHEN 0 THEN {e} WHEN 2 THEN -1 ELSE j END "
                f"AS c FROM t WHERE {p}",
                f"SELECT i, CASE j WHEN 0 THEN {de} WHEN 2 THEN -1 ELSE j END "
                f"AS c FROM t WHERE {dp}",
            )
        if kind == "ordinals":
            # GROUP BY / ORDER BY ordinals + explicit NULLS placement; the
            # full (c DESC, j, i) key is unique so LIMIT is deterministic
            n = self.rng.randint(2, 12)
            q = (
                "SELECT j, i, COUNT(*) AS c FROM t WHERE {w} GROUP BY 1, 2 "
                f"ORDER BY 3 DESC, 1 NULLS FIRST, 2 LIMIT {n}"
            )
            return q.format(w=p), q.format(w=dp)
        if kind == "derived_don":
            # extended clause (DISTINCT ON) in derived-table position
            q = (
                "SELECT d.j, d.i FROM (SELECT DISTINCT ON (j) j, i FROM t "
                "WHERE {w} ORDER BY j, i) AS d WHERE d.i <> 4"
            )
            return q.format(w=p), q.format(w=dp)
        if kind == "dt_project":
            src = self.pick(["i", "j"])
            lit = "TIMESTAMP '2021-03-04 05:06:07'"
            return (
                f"SELECT i, TOTIME('2021-07-08 09:10:11') AS t1, "
                f"TIMESTAMP_UNIX(TIMESTAMP_ADD({lit}, HOURS({src}))) AS ms "
                f"FROM t WHERE {p}",
                f"SELECT i, TIMESTAMP '2021-07-08 09:10:11' AS t1, "
                f"epoch_ms({lit} + to_milliseconds(CAST({src} AS BIGINT) * 3600000)) AS ms "
                f"FROM t WHERE {dp}",
            )
        if kind == "join":
            jt = self.pick(["JOIN", "LEFT JOIN", "JOIN"])
            e, de = self.num_expr()
            return (
                f"SELECT t.i, u.v, {e} AS a FROM t {jt} u ON t.j = u.k WHERE {p}",
                f"SELECT t.i, u.v, {de} AS a FROM t {jt} u ON t.j = u.k WHERE {dp}",
            )
        if kind == "having_quant":
            op = self.pick([">", "<", ">=", "<="])
            q = self.pick(["ANY", "ALL"])
            sub, dsub = self.subquery_num(1)
            return (
                f"SELECT j, SUM(i) AS s FROM t WHERE {p} GROUP BY j "
                f"HAVING SUM(i) {op} {q} ({sub})",
                f"SELECT j, SUM(i) AS s FROM t WHERE {dp} GROUP BY j "
                f"HAVING SUM(i) {op} {q} ({dsub})",
            )
        if kind == "string_agg":
            sep = self.pick(["','", "'; '", "'('"])
            return (
                f"SELECT j, STRING_AGG(s, {sep} ORDER BY i) AS sa "
                f"FROM t WHERE {p} GROUP BY j",
                f"SELECT j, STRING_AGG(s, {sep} ORDER BY i) AS sa "
                f"FROM t WHERE {dp} GROUP BY j",
            )
        if kind == "project":
            e1, de1 = self.num_expr()
            e2, de2 = self.str_expr()
            return (
                f"SELECT i, {e1} AS a, {e2} AS b FROM t WHERE {p}",
                f"SELECT i, {de1} AS a, {de2} AS b FROM t WHERE {dp}",
            )
        if kind == "agg":
            e, de = self.num_expr()
            agg = self.pick(
                [
                    ("SUM({0})", "SUM({0})"),
                    ("AVG({0})", "AVG({0})"),
                    ("MIN({0})", "MIN({0})"),
                    ("COUNT(DISTINCT {0})", "COUNT(DISTINCT {0})"),
                    ("COUNT(*)", "COUNT(*)"),
                ]
            )
            return (
                f"SELECT j, {agg[0].format(e)} AS agg FROM t WHERE {p} "
                f"GROUP BY 1 HAVING COUNT(*) > 1",
                f"SELECT j, {agg[1].format(de)} AS agg FROM t WHERE {dp} "
                f"GROUP BY 1 HAVING COUNT(*) > 1",
            )
        if kind == "distinct_on":
            return (
                f"SELECT DISTINCT ON (j) j, i, s FROM t WHERE {p} ORDER BY j, i",
                f"SELECT DISTINCT ON (j) j, i, s FROM t WHERE {dp} ORDER BY j, i",
            )
        if kind == "star_except":
            return (
                f"SELECT * EXCEPT (f, s) FROM t WHERE {p}",
                f"SELECT * EXCLUDE (f, s) FROM t WHERE {dp}",
            )
        if kind == "setop":
            op = self.pick(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
            p2, dp2 = self.pred()
            return (
                f"SELECT i, j FROM t WHERE {p} {op} SELECT i, j FROM t WHERE {p2}",
                f"SELECT i, j FROM t WHERE {dp} {op} SELECT i, j FROM t WHERE {dp2}",
            )
        if kind == "derived":
            e, de = self.num_expr()
            p2, dp2 = self.pred()
            def deref(x: str) -> str:
                # outer preds may carry correlations into u-subqueries;
                # inside the derived position the outer alias is d
                return x.replace("t.j", "d.j").replace("t.i", "d.i")

            return (
                f"SELECT d.i, d.a FROM (SELECT i, j, s, f, {e} AS a FROM t "
                f"WHERE {p}) AS d WHERE {deref(p2)}",
                f"SELECT d.i, d.a FROM (SELECT i, j, s, f, {de} AS a FROM t "
                f"WHERE {dp}) AS d WHERE {deref(dp2)}",
            )
        n, off = self.rng.randint(1, 15), self.rng.randint(0, 5)
        fetch = self.rng.random() < 0.5
        trail = (
            f"OFFSET {off} FETCH FIRST {n} ROWS ONLY" if fetch
            else f"LIMIT {n} OFFSET {off}"
        )
        return (
            f"SELECT i, j, s FROM t WHERE {p} ORDER BY i {trail}",
            f"SELECT i, j, s FROM t WHERE {dp} ORDER BY i LIMIT {n} OFFSET {off}",
        )


# ---------------------------------------------------------------- compare


def _canon(rows):
    import decimal

    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append("<NULL>")
            elif isinstance(v, bool):
                canon_row.append(str(v).lower())
            elif isinstance(v, float) and v == int(v) and abs(v) < 2**53:
                # exact integer-valued floats print as ints: DuckDB's
                # FLOOR/AVG promote BIGINT to DOUBLE where Spark keeps
                # LONG, and %.9g would truncate epoch-ms magnitudes
                canon_row.append(str(int(v)))
            elif isinstance(v, float):
                canon_row.append(f"{v:.9g}")
            else:
                canon_row.append(str(v))
        out.append(tuple(canon_row))
    return sorted(out)


def _run_one(engine, duck, seed: int):
    gen = Gen(random.Random(seed))
    sclera_sql, duck_sql = gen.query()
    try:
        expected = duck.execute(duck_sql).fetchall()
    except Exception as exc:  # pragma: no cover — oracle-side dialect gap
        pytest.fail(f"seed {seed}: oracle rejected\n  {duck_sql}\n  {exc}")
    try:
        got = [tuple(r) for r in engine.sql(sclera_sql).collect()]
    except Exception as exc:
        pytest.fail(f"seed {seed}: engine rejected\n  {sclera_sql}\n  {exc}")
    assert _canon(got) == _canon(expected), (
        f"seed {seed} diverges\n  sclera: {sclera_sql}\n  duck:   {duck_sql}"
    )


# one test per shard keeps failures attributable without 260 test items
_SHARDS = 13


@pytest.mark.parametrize("shard", range(_SHARDS))
def test_fuzz_shard(fuzz_env, shard):
    engine, duck = fuzz_env
    per = N_SEEDS // _SHARDS
    for seed in range(shard * per, (shard + 1) * per):
        _run_one(engine, duck, seed)
