"""Automatic file-level data skipping for manifest tables.

Delta/Iceberg-style scan pruning, wired into the engine's SQL path:
after a query is lowered to a Spark DataFrame, walk its OPTIMIZED
logical plan for ``Filter`` nodes sitting directly on a
``LogicalRelation`` whose files live in a registered manifest table's
data directory, extract the conservative conjunctive range bounds from
the filter condition, and — when the manifest's per-file min/max stats
(sources/manifest.py) prove some files cannot contain a matching row —
rebuild the query over a pruned file list. At 100 TB this turns a
time-range probe of a sorted/clustered table from "list and open every
parquet footer" into "open the few files the manifest says overlap";
Spark's own row-group pruning still applies inside the surviving files.

The r9 tier on top of the range walk:
- NULL-count skipping (extract_nulls): IS NULL / IS NOT NULL conjuncts
  — including the IsNotNull constraints Catalyst infers — prune
  through per-file null counts; every range bound also implies
  notnull, which soundly drops all-NULL files (they have no min/max).
- DYNAMIC file pruning (_make_deriver): at an equi-join whose one side
  scans a manifest fact table, the other side's key range — and, for
  sparse dims, its exact key set — is evaluated with one gated, cached
  aggregate and descends to the fact scan through row-filter-commuting
  operators only (the star-join probe, Delta's dynamic file pruning).
- Metadata-only aggregates (metadata_agg): bare ungrouped count(*) /
  count(col) / min / max over a manifest scan answer from per-file
  stats with zero jobs, under a strict plan gate.
- A version-keyed lazy-plan cache (plan_cache_key) for all-manifest
  queries, so repeated probes skip the py4j walks and rebuilds.
Equality/IN probes additionally consult per-file Bloom sidecars inside
``files_pruned`` (sources/bloom.py) — the skip for unclustered
columns, where ranges cover everything.

Soundness notes:
- Bounds are read from the TYPED catalyst expression tree via py4j
  (Literal.value()/dataType()), never from plan text — a string literal
  crafted to look like a serialized filter is an opaque value here, and
  date/timestamp literals arrive as epoch days / UTC microseconds, so
  session time zones never enter the comparison.
- Extraction is conservative: only ``And``-reachable conjuncts of the
  shapes ``col <op> literal`` / ``literal <op> col`` / ``col IN
  (literals)`` / ``StartsWith(col, lit)`` contribute; ``Or`` trees,
  casts, UDF calls and everything else are ignored (they can only make
  the true row set SMALLER than the bounds describe — pruning by the
  extracted superset-range stays sound because a pushed-down conjunct
  must hold for every scanned row that survives the filter).
- A table scanned more than once keeps the UNION of each scan's
  surviving files; a scan with no usable bounds keeps every file.
- Any failure (unexpected plan shape, py4j hiccup) falls back to the
  unpruned DataFrame — pruning is an optimization, never a filter.

Reference context: the reference pushes predicates into per-location
SQL (sql/mapper/default/ScleraSqlMapper.scala); for our manifest-format
tables the manifest IS the location, and its stats block is the pushdown
target.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass

_SKIP = object()  # sentinel: value not representable for pruning

_CMP_NODES = {
    "GreaterThan",
    "GreaterThanOrEqual",
    "LessThan",
    "LessThanOrEqual",
    "EqualTo",
    "EqualNullSafe",
}

_NUM_TYPES = {"integer", "long", "short", "byte"}
_FLOAT_TYPES = {"double", "float"}


def _seq(scala_seq):
    return [scala_seq.apply(i) for i in range(scala_seq.size())]


def _cls(obj) -> str:
    return obj.getClass().getSimpleName()


def _lit_value(raw, type_name: str):
    """Convert a catalyst Literal's internal value to the Python form
    manifest stats use (see manifest._canon_stat): ints/floats as-is,
    UTF8String -> str, date days -> ISO string, timestamp[_ntz] micros
    -> fixed-width 'YYYY-MM-DD HH:MM:SS.ffffff' (UTC for adjusted
    timestamps, wall-clock for NTZ — matching how the stats were
    canonicalized for the same column type)."""
    if raw is None:
        return _SKIP
    if type_name in _NUM_TYPES:
        return int(raw)
    if type_name in _FLOAT_TYPES:
        return float(raw)
    if type_name == "string":
        return raw if isinstance(raw, str) else raw.toString()
    if type_name == "date":
        d = datetime.date(1970, 1, 1) + datetime.timedelta(days=int(raw))
        return d.isoformat()
    if type_name in ("timestamp", "timestamp_ntz"):
        dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=int(raw)
        )
        return dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    return _SKIP


def _pv_attr_name(expr):
    """Virtual-partition-column fill pattern (partitioned Delta
    import, manifest.ManifestTable._fill_partition_columns):
    ``Coalesce(col, Cast(__sclera_pv_<col>))`` → ``<col>``. The
    marker prefix plus the matching first-child name make this
    unmistakable — user expressions cannot produce it, since the
    engine never exposes ``__sclera_pv_*`` columns."""
    if _cls(expr) != "Coalesce":
        return None
    kids = _seq(expr.children())
    if len(kids) != 2:
        return None
    a, b = kids
    if _cls(a) != "AttributeReference":
        return None
    if _cls(b) == "Cast":
        b = b.child()
    if _cls(b) != "AttributeReference":
        return None
    n = b.name()
    if not n.startswith("__sclera_pv_"):
        return None
    col = n[len("__sclera_pv_") :]
    return col if a.name() == col else None


def _attr_name(expr):
    """Column name of an attribute-like expression side: a bare
    AttributeReference, or the partition-fill Coalesce pattern."""
    if _cls(expr) == "AttributeReference":
        return expr.name()
    return _pv_attr_name(expr)


def _attr_lit(expr):
    """(column name, literal python value) for a binary comparison with
    exactly one attribute-like side (see _attr_name) and one Literal
    side, plus whether the attribute is on the left; None when the
    shape differs."""
    kids = _seq(expr.children())
    if len(kids) != 2:
        return None
    l, r = kids
    ln = _attr_name(l)
    if ln is not None and _cls(r) == "Literal":
        v = _lit_value(r.value(), r.dataType().typeName())
        return None if v is _SKIP else (ln, v, True)
    rn = _attr_name(r)
    if _cls(l) == "Literal" and rn is not None:
        v = _lit_value(l.value(), l.dataType().typeName())
        return None if v is _SKIP else (rn, v, False)
    return None


def _conjuncts(cond):
    out = []
    stack = [cond]
    while stack:
        e = stack.pop()
        if _cls(e) == "And":
            stack.extend(_seq(e.children()))
        else:
            out.append(e)
    return out


@dataclass
class _Bound:
    lo: object = None
    hi: object = None

    def add_lo(self, v):
        try:
            if self.lo is None or v > self.lo:
                self.lo = v
        except TypeError:
            raise _Incomparable()

    def add_hi(self, v):
        try:
            if self.hi is None or v < self.hi:
                self.hi = v
        except TypeError:
            raise _Incomparable()


class _Incomparable(Exception):
    pass


def extract_ranges(cond) -> dict[str, tuple]:
    """Conservative {column: (lo, hi)} bounds implied by a catalyst
    filter condition (either end None = unbounded). Bounds from
    strict comparisons are kept inclusive — wider, therefore sound."""
    bounds: dict[str, _Bound] = {}
    dead: set[str] = set()

    def bound(col):
        return bounds.setdefault(col, _Bound())

    for e in _conjuncts(cond):
        cn = _cls(e)
        try:
            if cn in _CMP_NODES:
                got = _attr_lit(e)
                if got is None:
                    continue
                col, v, attr_left = got
                if col in dead:
                    continue
                if cn in ("EqualTo", "EqualNullSafe"):
                    bound(col).add_lo(v)
                    bound(col).add_hi(v)
                elif (cn.startswith("GreaterThan")) == attr_left:
                    # col > v / col >= v / v < col / v <= col
                    bound(col).add_lo(v)
                else:
                    bound(col).add_hi(v)
            elif cn == "In":
                kids = _seq(e.children())
                col = _attr_name(kids[0]) if kids else None
                if col is None:
                    continue
                if col in dead:
                    continue
                vals = []
                ok = True
                for lit in kids[1:]:
                    if _cls(lit) != "Literal":
                        ok = False
                        break
                    v = _lit_value(lit.value(), lit.dataType().typeName())
                    if v is _SKIP:
                        ok = False
                        break
                    vals.append(v)
                if ok and vals:
                    bound(col).add_lo(min(vals))
                    bound(col).add_hi(max(vals))
            elif cn == "InSet":
                child = e.child()
                col = _attr_name(child)
                if col is None:
                    continue
                if col in dead:
                    continue
                tn = child.dataType().typeName()
                vals = []
                it = e.hset().iterator()
                while it.hasNext():
                    v = _lit_value(it.next(), tn)
                    if v is _SKIP:
                        vals = []
                        break
                    vals.append(v)
                if vals:
                    bound(col).add_lo(min(vals))
                    bound(col).add_hi(max(vals))
            elif cn == "StartsWith":
                got = _attr_lit(e)
                if got is None or not got[2] or not isinstance(got[1], str):
                    continue
                col, v = got[0], got[1]
                if col not in dead:
                    # s LIKE 'p%'  =>  s >= 'p' (free sound lower bound)
                    bound(col).add_lo(v)
        except _Incomparable:
            dead.add(col)
            bounds.pop(col, None)
        except Exception:
            continue  # any unexpected expression: ignore the conjunct
    return {
        c: (b.lo, b.hi)
        for c, b in bounds.items()
        if b.lo is not None or b.hi is not None
    }


def extract_nulls(cond) -> dict[str, str]:
    """Conservative {column: 'null' | 'notnull'} facts implied by a
    catalyst filter condition's And-reachable conjuncts. ``IsNull(c)``
    means only files with at least one NULL can match; ``IsNotNull(c)``
    (which the optimizer also infers from every comparison on c) means
    an all-NULL file cannot match. Contradictory conjuncts on a column
    (unsatisfiable filter) drop the column — pruning nothing is always
    sound and the optimizer folds such plans to empty anyway."""
    out: dict[str, str] = {}
    dead: set[str] = set()
    for e in _conjuncts(cond):
        cn = _cls(e)
        if cn not in ("IsNull", "IsNotNull"):
            continue
        try:
            child = e.child()
            col = _attr_name(child)
            if col is None:
                continue
            if col in dead:
                continue
            kind = "null" if cn == "IsNull" else "notnull"
            if out.setdefault(col, kind) != kind:
                dead.add(col)
                out.pop(col, None)
        except Exception:
            continue
    return out


def _cond_ranges(cond) -> dict[str, tuple]:
    """extract_ranges over one condition OR a list of ANDed conditions
    (a partition-fill pair carries [outer filter, pushed scan filter]):
    bounds from each conjunct set intersect."""
    if cond is None:
        return {}
    conds = cond if isinstance(cond, list) else [cond]
    out: dict[str, tuple] = {}
    for c in conds:
        for col, (lo, hi) in extract_ranges(c).items():
            cur = out.get(col)
            if cur is None:
                out[col] = (lo, hi)
                continue
            try:
                nlo = lo if cur[0] is None else (
                    cur[0] if lo is None else max(cur[0], lo)
                )
                nhi = hi if cur[1] is None else (
                    cur[1] if hi is None else min(cur[1], hi)
                )
                out[col] = (nlo, nhi)
            except TypeError:
                continue  # incomparable across conds: keep first bound
    return out


def _cond_nulls(cond) -> dict[str, str]:
    """extract_nulls over one condition or a list (see _cond_ranges);
    contradictory facts drop the column (sound: prune nothing)."""
    if cond is None:
        return {}
    conds = cond if isinstance(cond, list) else [cond]
    out: dict[str, str] = {}
    dead: set[str] = set()
    for c in conds:
        for col, kind in extract_nulls(c).items():
            if col in dead:
                continue
            if out.setdefault(col, kind) != kind:
                dead.add(col)
                out.pop(col, None)
    return out


def filter_ranges(df) -> dict[str, tuple]:
    """Conservative {column: (lo, hi)} bounds implied by the single
    filtered parquet scan in ``df``'s optimized plan — the DML probe
    shape (``table.filter(where)``). Used by copy-on-write DML to
    pre-narrow the probe's file list through manifest stats before any
    Spark job runs. Returns {} (no narrowing) unless the plan contains
    EXACTLY ONE scan carrying a pushed-down filter: with several scans
    the bounds could not be attributed to the manifest table's scan
    without per-relation matching, and {} is always sound (the probe
    just reads every file, the pre-r9 behavior)."""
    try:
        if df.isStreaming:
            return {}
        plan = df._jdf.queryExecution().optimizedPlan()
        pairs = []
        for p in _all_plans(plan):
            pairs.extend(_scan_pairs(p))
        if len(pairs) != 1 or pairs[0][0] is None:
            return {}
        return _cond_ranges(pairs[0][0])
    except Exception:
        return {}


def _strip_scheme(path: str) -> str:
    if path.startswith("file:"):
        rest = path[len("file:") :]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    return path


# Nodes a join-derived row constraint may soundly descend through: an
# operator where dropping input rows that the constraint's ORIGIN would
# discard anyway cannot change any surviving row. Filter/Project/Sort/
# Repartition are row-wise 1:1 (or pure reordering); Join is handled
# explicitly in the walk; Aggregate qualifies because a constraint is
# applied only on exprId match, and an Aggregate only outputs an input
# attribute UNCHANGED (same exprId) when it is a bare grouping column —
# filtering whole groups by their grouping key commutes with
# aggregation. Window is deliberately ABSENT: unpartitioned window
# functions (row_number over the table) change value when any row is
# removed, and exprId pass-through cannot prove the key is in the
# partition spec.
_ENV_TRANSPARENT = {
    "Filter",
    "Project",
    "Sort",
    "Repartition",
    "RepartitionByExpression",
    "Aggregate",
}


def _key_side(e):
    """(attribute, cast target SQL type | None) for a join-key side:
    a bare AttributeReference, or a type-coercion Cast over one (the
    analyzer inserts those for e.g. an INT dim key against a BIGINT
    fact key). None when the side is any other expression."""
    if _cls(e) == "AttributeReference":
        return (e, None)
    if _cls(e) in ("Cast", "AnsiCast", "UpCast"):
        child = e.child()
        if _cls(child) == "AttributeReference":
            return (child, e.dataType().sql())
    return None


def _equi_keys(cond):
    """[((attr, cast), (attr, cast))] pairs from the EqualTo conjuncts
    of a join condition; each side is a bare attribute or a cast over
    one (see _key_side). Strict EqualTo only — EqualNullSafe matches
    NULL keys, which min/max ranges cannot see, so deriving a range
    from it would prune files whose NULL rows should match."""
    out = []
    for e in _conjuncts(cond):
        if _cls(e) != "EqualTo":
            continue
        try:
            kids = _seq(e.children())
            if len(kids) != 2:
                continue
            a, b = _key_side(kids[0]), _key_side(kids[1])
            if a is not None and b is not None:
                out.append((a, b))
        except Exception:
            continue
    return out


def _fill_relation(join):
    """(LogicalRelation, pushed filter condition | None) when ``join``
    is a partition-fill lookup join (partitioned Delta import): its
    right subtree outputs the ``__sclera_pv_file`` marker and holds no
    relation (it is the broadcast in-memory lookup), and its left
    subtree reaches exactly ONE LogicalRelation through Project/Filter
    nodes only. None for every other join."""
    try:
        kids = _seq(join.children())
        if len(kids) != 2:
            return None
        left, right = kids
        right_names = [a.name() for a in _seq(right.output())]
        if "__sclera_pv_file" not in right_names:
            return None
        stack = [right]
        while stack:
            n = stack.pop()
            if _cls(n) == "LogicalRelation":
                return None  # a real scan on the lookup side: not ours
            stack.extend(_seq(n.children()))
        rel = None
        cond = None
        stack = [left]
        while stack:
            n = stack.pop()
            cn = _cls(n)
            if cn == "LogicalRelation":
                if rel is not None:
                    return None
                rel = n
            elif cn == "Filter":
                if cond is not None:
                    return None  # two filters: unexpected, bail
                cond = n.condition()
                stack.extend(_seq(n.children()))
            elif cn == "Project":
                stack.extend(_seq(n.children()))
            else:
                return None
        return (rel, cond) if rel is not None else None
    except Exception:
        return None


def _scan_pairs(plan, deriver=None):
    """(filter condition | None, LogicalRelation, env) for every parquet
    relation in the optimized plan — condition present only when the
    Filter sits DIRECTLY on the relation (where the optimizer leaves
    pushable predicates). ``env`` is the list of join-derived range
    constraints [(exprId string, lo, hi)] valid at that scan: at each
    Join, ``deriver`` (when given) may evaluate the OTHER side's
    equi-key range and the constraint then descends toward the scan,
    but only through _ENV_TRANSPARENT operators — any other node drops
    the env (never the walk)."""
    pairs = []

    def walk(node, env):
        cn = _cls(node)
        kids = _seq(node.children())
        if (
            cn == "Filter"
            and len(kids) == 1
            and _cls(kids[0]) == "LogicalRelation"
        ):
            pairs.append((node.condition(), kids[0], env))
            return
        if cn == "Filter" and len(kids) == 1 and _cls(kids[0]) == "Join":
            # partition-fill shape (partitioned Delta import): a
            # predicate on a virtual partition column cannot push below
            # the fill's lookup join, so it sits here — pair it (plus
            # any filter that DID push to the scan) with the single
            # relation under the join's data side
            hit = _fill_relation(kids[0])
            if hit is not None:
                rel, inner = hit
                conds = [node.condition()] + ([inner] if inner else [])
                pairs.append((conds, rel, env))
                return
        if cn == "Join" and len(kids) == 2:
            hit = _fill_relation(node)
            if hit is not None:
                # fill join with no outer filter: the scan-side filter
                # (if any) still pairs; the lookup side never does
                rel, inner = hit
                pairs.append((inner, rel, env))
                return
        if cn == "LogicalRelation":
            pairs.append((None, node, env))
            return
        if cn == "Join" and len(kids) == 2:
            left, right = kids
            env_l: list = []
            env_r: list = []
            if deriver is not None:
                try:
                    jt = node.joinType().toString()
                    # which side may be row-filtered by the other's keys:
                    # Inner/LeftSemi both (semi output = matching left
                    # rows; right rows without a left match are dead
                    # probes); outer joins only their inner side (the
                    # preserved side's rows all survive)
                    prune_left = jt in ("Inner", "LeftSemi", "RightOuter")
                    prune_right = jt in ("Inner", "LeftSemi", "LeftOuter")
                    keys = (
                        _equi_keys(node.condition().get())
                        if (prune_left or prune_right)
                        and node.condition().isDefined()
                        else []
                    )
                    for (a, ac), (b, bc) in keys:
                        ls, rs = left.outputSet(), right.outputSet()
                        if ls.contains(a) and rs.contains(b):
                            la, lc, rb, rc = a, ac, b, bc
                        elif ls.contains(b) and rs.contains(a):
                            la, lc, rb, rc = b, bc, a, ac
                        else:
                            continue
                        # the TARGET (pruned) side's key must be the
                        # bare scan column; the SOURCE side may be
                        # cast-wrapped — the aggregate then evaluates
                        # the cast so bounds land in the compared type
                        if prune_left and lc is None:
                            env_l.extend(deriver(right, rb, rc, left, la))
                        if prune_right and rc is None:
                            env_r.extend(deriver(left, la, lc, right, rb))
                except Exception:
                    env_l, env_r = [], []
            # outer env descends too: a constraint is applied only on
            # exprId match, an attribute belongs to exactly one side,
            # and its origin (an EqualTo / range conjunct) discards the
            # NULL-extended rows an outer join could newly produce
            walk(left, env + env_l)
            walk(right, env + env_r)
            return
        keep = env if cn in _ENV_TRANSPARENT else []
        for k in kids:
            walk(k, keep)

    walk(plan, [])
    return pairs


def _all_plans(plan, max_subqueries: int = 64):
    """The main plan plus every subquery plan, recursively: scalar /
    EXISTS / IN subqueries hang off EXPRESSIONS (not children()), so a
    scan inside one is invisible to a child walk — and a pruned view
    rebuilt for the main scan would be read by the subquery too. Every
    occurrence must therefore contribute to the survivor union. The cap
    bounds pathological nesting; exceeding it raises so the caller
    falls back to no pruning (never to partial coverage)."""
    plans = [plan]
    frontier = [plan]
    while frontier:
        p = frontier.pop()
        subs = p.subqueriesAll()
        for i in range(subs.size()):
            sp = subs.apply(i)
            plans.append(sp)
            frontier.append(sp)
            if len(plans) > max_subqueries:
                raise ValueError("subquery nesting exceeds pruning cap")
    return plans


def _relation_dir(rel) -> str | None:
    """Directory of the relation's first input file (all files of a
    manifest view share one data dir by construction)."""
    try:
        files = rel.relation().location().inputFiles()
        first = files[0] if len(files) else None
    except Exception:
        return None
    if first is None:
        return None
    import os

    return os.path.dirname(_strip_scheme(first))


def _manifest_tables_by_dir(ddl):
    import os

    tables = {}
    for name in ddl.manifest_tables:
        try:
            mt = ddl._manifest(name)
            tables[os.path.abspath(mt.data_dir)] = (name, mt)
        except Exception:
            continue
    return tables


# exact-value extraction from string stats is refused at/after this
# length: parquet writers MAY truncate long binary footer stats
# (parquet.statistics.truncate.length; the smallest default in the
# wild is the 64-byte column-index length), and a truncated bound is
# still a valid BOUND (fine for pruning) but not the exact min/max.
# Spark's own writer keeps string stats exact up to 4096 bytes and
# drops them beyond, but imported foreign files need the paranoia.
_STR_STAT_EXACT_MAX = 64


def _stat_to_python(stored, tag: str, dt, tz_utc: bool):
    """A stored canonical stat value -> the Python value Spark's
    createDataFrame expects for result type ``dt``, or _SKIP when the
    conversion cannot be exact. Floating result types are refused
    outright: parquet min/max are unreliable in the presence of NaN
    (writers exclude or misorder it), and Spark's MIN/MAX order NaN
    above every value — a metadata answer could silently differ."""
    import datetime as _dt

    tn = dt.typeName()
    if tn in ("integer", "long", "short", "byte"):
        return int(stored) if tag == "n" and isinstance(stored, int) else _SKIP
    if tn == "string":
        if tag != "s" or not isinstance(stored, str):
            return _SKIP
        if len(stored.encode("utf-8")) >= _STR_STAT_EXACT_MAX:
            return _SKIP
        return stored
    if tn == "date":
        if tag != "d" or not isinstance(stored, str):
            return _SKIP
        return _dt.date.fromisoformat(stored)
    if tn in ("timestamp", "timestamp_ntz"):
        if tag != "t" or not isinstance(stored, str):
            return _SKIP
        if tn == "timestamp" and not tz_utc:
            # stored canon is UTC wall time; createDataFrame interprets
            # naive datetimes in the SESSION zone — only sound when UTC
            return _SKIP
        return _dt.datetime.strptime(stored, "%Y-%m-%d %H:%M:%S.%f")
    return _SKIP


def metadata_agg(engine, ddl, df):
    """``SELECT count(*) / min(c) / max(c) FROM <manifest table>``
    answered from manifest metadata alone — zero Spark jobs, zero file
    opens at any table size (the Delta metadata-only-query
    optimization). The gate is strict: the WHOLE optimized plan must be
    an ungrouped Aggregate whose every output is ``Count(Literal 1)``,
    ``Min(column)`` or ``Max(column)`` (no DISTINCT, no FILTER clause,
    no subqueries, no expressions over the aggregate) over a bare
    LogicalRelation (a Project in between is fine — the aggregated
    attribute must still resolve to a relation output by exprId, so a
    computed projection bails). Counts sum the RELATION'S OWN input
    files through the per-file row counts recorded across retained
    manifest versions, so the answer matches the snapshot the scan
    would have read (including time-travel views) even if a foreign
    writer advanced the table since view registration. MIN/MAX fold the
    per-file [min, max] stats; a file contributes only when it has a
    TYPE-TAGGED stats entry for the column or is provably all-NULL
    there (null count == row count — such files have no min/max and
    are skipped exactly like SQL MIN/MAX skip NULLs). Any file with
    neither, any non-exactly-convertible stat (floating result types,
    possibly-truncated long strings), or any unexpected plan shape ->
    None (caller runs the real scan). Returns the one-row DataFrame or
    None."""
    import os

    try:
        if df.isStreaming:
            return None
        plan = df._jdf.queryExecution().optimizedPlan()
        if plan.subqueriesAll().size() != 0:
            return None
        if _cls(plan) != "Aggregate":
            return None
        if plan.groupingExpressions().size() != 0:
            return None
        aggs = plan.aggregateExpressions()
        if aggs.size() == 0:
            return None
        # (kind, column exprId | None) per output, gate everything else
        wanted: list[tuple] = []
        for i in range(aggs.size()):
            alias = aggs.apply(i)
            if _cls(alias) != "Alias":
                return None
            agg_expr = alias.child()
            if _cls(agg_expr) != "AggregateExpression":
                return None
            if agg_expr.isDistinct() or agg_expr.filter().isDefined():
                return None
            fn = agg_expr.aggregateFunction()
            fname = _cls(fn)
            fkids = _seq(fn.children())
            if fname == "Count":
                if len(fkids) != 1:
                    return None
                if _cls(fkids[0]) == "Literal":
                    if fkids[0].value() != 1:
                        return None
                    wanted.append(("count", None))
                elif _cls(fkids[0]) == "AttributeReference":
                    # count(col) = total rows - null count, from the
                    # same per-file metadata (a non-nullable column
                    # never reaches here — Catalyst already rewrote it
                    # to count(*))
                    wanted.append(("count_col", fkids[0]))
                else:
                    return None
            elif fname in ("Min", "Max"):
                if len(fkids) != 1 or _cls(fkids[0]) != "AttributeReference":
                    return None
                wanted.append((fname.lower(), fkids[0]))
            else:
                return None
        node = _seq(plan.children())[0]
        if _cls(node) == "Project":
            node = _seq(node.children())[0]
        if _cls(node) != "LogicalRelation":
            return None
        rel_cols = {}  # exprId repr -> column name, for attr resolution
        for attr in _seq(node.output()):
            rel_cols[attr.exprId().toString()] = attr.name()
        d = _relation_dir(node)
        hit = _manifest_tables_by_dir(ddl).get(os.path.abspath(d)) if d else None
        if hit is None:
            return None
        _, mt = hit
        scanned = [
            os.path.basename(_strip_scheme(f))
            for f in node.relation().location().inputFiles()
        ]
        # per-file metadata is immutable with the file; resolve each
        # scanned file through retained versions, newest first
        rows: dict[str, int] = {}
        stats: dict[str, dict] = {}
        nulls: dict[str, dict] = {}
        missing = set(scanned)
        for v in reversed(mt.versions()):
            if not missing:
                break
            got = mt.file_rows(v)
            got_stats = mt.file_stats(v)
            got_nulls = mt.file_nulls(v)
            for n in list(missing):
                if n in got:
                    rows[n] = got[n]
                    stats[n] = got_stats.get(n, {})
                    if n not in got_nulls:
                        return None  # legacy pre-v2 file: no null info
                    nulls[n] = got_nulls[n]
                    missing.discard(n)
        if missing:
            return None
        tz_utc = (
            engine.spark.conf.get("spark.sql.session.timeZone", "") == "UTC"
        )
        out_row = []
        for (kind, attr), field in zip(wanted, df.schema.fields):
            if kind == "count":
                out_row.append(sum(rows[n] for n in scanned))
                continue
            col = rel_cols.get(attr.exprId().toString())
            if col is None:
                return None
            if kind == "count_col":
                total = 0
                for n in scanned:
                    if col not in nulls[n]:
                        return None  # no null info (legacy / absent col)
                    total += rows[n] - nulls[n][col]
                out_row.append(total)
                continue
            acc = None
            for n in scanned:
                entry = stats[n].get(col)
                if not entry or len(entry) < 3:
                    if nulls[n].get(col) == rows[n]:
                        continue  # all-NULL file: MIN/MAX skip it
                    return None  # no stats, rows not provably NULL
                stored = entry[0] if kind == "min" else entry[1]
                v = _stat_to_python(stored, entry[2], field.dataType, tz_utc)
                if v is _SKIP:
                    return None
                if acc is None:
                    acc = v
                else:
                    acc = min(acc, v) if kind == "min" else max(acc, v)
            out_row.append(acc)  # None = every row NULL -> SQL NULL
        return engine.spark.createDataFrame([tuple(out_row)], schema=df.schema)
    except Exception:
        return None


_CACHE_UNSAFE_RE = None


def plan_cache_key(engine, ddl, query: str, df):
    """Cache key for the engine's per-query pruning/metadata work, or
    None when caching would be unsound. A key exists only when EVERY
    relation in the optimized plan (subqueries included) is a manifest
    table — their (name, version) pairs then pin the data: any commit
    bumps a version, vacuum never touches the live version's files, and
    plain/JDBC tables (whose re-registration the key could not see) are
    excluded outright. View definitions and the pruning-related config
    knobs are part of the key. The cached value is the LAZY rebuilt
    DataFrame — each action re-executes it, so nondeterministic
    expressions still re-roll per run; time/rand/model-bearing query
    text is excluded anyway (frozen-at-lowering semantics would
    otherwise leak across engine.sql calls)."""
    import os
    import re

    global _CACHE_UNSAFE_RE
    try:
        if df.isStreaming:
            return None
        if _CACHE_UNSAFE_RE is None:
            _CACHE_UNSAFE_RE = re.compile(
                r"(?i)current_|\bnow\s*\(|\brand\s*\(|\brandn\s*\(|"
                r"\buuid\s*\(|\brandom\b|\b(classified|clustered|imputed)"
                r"\s+with\b"
            )
        if _CACHE_UNSAFE_RE.search(query):
            return None
        plan = df._jdf.queryExecution().optimizedPlan()
        pairs = []
        leaves_ok = True
        for p in _all_plans(plan):
            pairs.extend(_scan_pairs(p))
            # EVERY leaf must be a file relation: a LocalRelation (a
            # registered VALUES view, a folded subplan) carries data
            # frozen at lowering that a later re-registration would not
            # invalidate — the key cannot pin it, so no caching
            stack = [p]
            while stack:
                n = stack.pop()
                kids = _seq(n.children())
                if not kids and _cls(n) not in (
                    "LogicalRelation",
                    "OneRowRelation",
                ):
                    leaves_ok = False
                    break
                stack.extend(kids)
            if not leaves_ok:
                break
        if not pairs or not leaves_ok:
            return None
        tables = _manifest_tables_by_dir(ddl)
        ids = set()
        for _, rel, _ in pairs:
            d = _relation_dir(rel)
            hit = tables.get(os.path.abspath(d)) if d else None
            if hit is None:
                return None  # a non-manifest relation: cannot pin it
            name, mt = hit
            ids.add((name, mt.version()))
        views = tuple(sorted(getattr(ddl, "views", {}).items()))
        confs = tuple(
            sorted(
                (k, v)
                for k, v in engine.config.items()
                if k
                in (
                    "manifest_pruning",
                    "metadata_only_count",
                    "dynamic_file_pruning",
                )
            )
        )
        return (query, tuple(sorted(ids)), views, confs)
    except Exception:
        return None


def _parse_bytes_conf(raw: str) -> int | None:
    """'67108864' / '10485760b' / '10MB' -> bytes, None if unparsable."""
    import re

    m = re.match(r"^\s*(-?\d+)\s*([kmgt]?)b?\s*$", str(raw), re.IGNORECASE)
    if not m:
        return None
    mult = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    return int(m.group(1)) * mult[m.group(2).lower()]


def _subtree_files(node) -> list[str]:
    """Input files of every file relation under ``node`` (dim-side cache
    invalidation: a rewritten table gets new part-file names)."""
    files = []
    stack = [node]
    while stack:
        n = stack.pop()
        if _cls(n) == "LogicalRelation":
            try:
                files.extend(list(n.relation().location().inputFiles()))
            except Exception:
                pass
        stack.extend(_seq(n.children()))
    return sorted(files)


def _subtree_has_manifest_attr(node, attr, manifest_dirs) -> bool:
    """Does the target subtree contain a manifest-table scan that OWNS
    the join key attribute (by exprId)? Cheap pre-check before paying
    the dim-side job."""
    import os

    eid = attr.exprId().toString()
    stack = [node]
    while stack:
        n = stack.pop()
        if _cls(n) == "LogicalRelation":
            try:
                d = _relation_dir(n)
                if d and os.path.abspath(d) in manifest_dirs:
                    for out in _seq(n.output()):
                        if out.exprId().toString() == eid:
                            return True
            except Exception:
                pass
        stack.extend(_seq(n.children()))
    return False


# join-key types a derived bound may take. Floats are fine — the
# bound comes from an EXACT Spark aggregate over the dim rows (not
# parquet stats), and a NaN bound just fails every stats comparison
# (file kept). Timestamp keys never go through collect()'s
# driver-local-zone datetime conversion: the bounds are computed as
# unix_micros on the JVM side and rebuilt as naive UTC datetimes — and
# only when the SESSION zone is UTC (the same soundness gate
# metadata-only MIN/MAX uses), since the stored stats canon is UTC
# wall time and a non-UTC session could mis-zone an NTZ cast.
_DYN_KEY_TYPES = _NUM_TYPES | _FLOAT_TYPES | {"string", "date"}
_DYN_TS_TYPES = {"timestamp", "timestamp_ntz"}


def _us_to_utc(us):
    """Epoch microseconds -> naive UTC datetime, exact to the
    microsecond (the form _canon_bound documents as already-UTC)."""
    if us is None:
        return None
    import datetime as _dt

    return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=int(us))


def _make_deriver(engine, manifest_dirs):
    """Dynamic-file-pruning deriver (Delta's dynamic file pruning; the
    star-join probe shape): at a Join whose one side scans a manifest
    fact table on an equi-key, evaluate the OTHER side's key range
    with one driver-issued aggregate — gated on that side fitting the
    session's broadcast threshold (it is the plan's broadcast side
    anyway, so the rows are about to be collected regardless) — and
    return the range as a constraint on the fact scan. Results are
    cached per (canonical dim plan, key name, dim input files): the
    semanticHash pins the plan shape and literals, the file list pins
    the data, so repeated queries over unchanged dims run ZERO extra
    jobs."""
    spark = engine.spark
    cache = getattr(engine, "_dyn_prune_cache", None)
    if cache is None:
        cache = engine._dyn_prune_cache = {}

    try:
        thr = _parse_bytes_conf(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        )
    except Exception:
        thr = None
    if thr is None or thr <= 0:
        return None  # broadcast disabled: no cheap dim side exists

    def derive(source, s_attr, s_cast, target, t_attr):
        try:
            tn = t_attr.dataType().typeName()
            is_ts = tn in _DYN_TS_TYPES
            if tn not in _DYN_KEY_TYPES and not is_ts:
                return []
            if is_ts and (
                spark.conf.get("spark.sql.session.timeZone", "") != "UTC"
            ):
                return []
            if not _subtree_has_manifest_attr(target, t_attr, manifest_dirs):
                return []
            raw = source.stats().sizeInBytes()
            size = raw if isinstance(raw, int) else int(raw.toString())
            if size > thr:
                return []
            # resolve the attribute to its OUTPUT POSITION before the
            # cache lookup: two same-named columns in one dim subtree
            # (e.g. a self-join on "k") must not share a cache slot —
            # the name alone would serve the first column's bounds for
            # the other and silently over-prune
            idx = None
            for i, out in enumerate(_seq(source.output())):
                if out.exprId().equals(s_attr.exprId()):
                    idx = i
                    break
            if idx is None:
                return []
            key = (
                source.semanticHash(),
                s_attr.name(),
                idx,
                s_cast,
                tn if is_ts else None,  # micros path shapes the value
                tuple(_subtree_files(source)),
            )
            if key in cache:
                cache[key] = cache.pop(key)  # LRU touch
                lohi = cache[key]
            else:
                jds = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                    spark._jsparkSession, source
                )
                from pyspark.sql import DataFrame as _PyDF

                sdf = _PyDF(jds, spark)
                # positional rename dodges duplicate column names
                fresh = [f"_c{i}" for i in range(len(sdf.columns))]
                sdf = sdf.toDF(*fresh)
                kexpr = (
                    f"CAST(_c{idx} AS {s_cast})"
                    if s_cast
                    else f"_c{idx}"
                )
                if is_ts:
                    # epoch-micros on the JVM side: collect() would
                    # route datetimes through the driver's LOCAL zone
                    kexpr = f"unix_micros(CAST({kexpr} AS TIMESTAMP))"
                row = sdf.selectExpr(
                    f"min({kexpr}) AS lo",
                    f"max({kexpr}) AS hi",
                    f"count(DISTINCT {kexpr}) AS nd",
                ).first()
                values = None
                if row[2] is not None and 0 < row[2] <= _DYN_SET_CAP:
                    # sparse key set: the exact values prune files the
                    # straddling [min, max] range cannot (one more tiny
                    # job on the already-broadcast-sized side, cached)
                    values = [
                        r[0]
                        for r in sdf.selectExpr(f"{kexpr} AS k")
                        .where("k IS NOT NULL")
                        .distinct()
                        .collect()
                    ]
                if is_ts:
                    lo = _us_to_utc(row[0])
                    hi = _us_to_utc(row[1])
                    if values is not None:
                        values = [_us_to_utc(v) for v in values]
                    lohi = (lo, hi, values)
                else:
                    lohi = (row[0], row[1], values)
                while len(cache) >= 256:
                    # LRU eviction (insertion-order dict; hits re-insert)
                    # so a steady 256+1-key workload keeps hitting
                    cache.pop(next(iter(cache)))
                cache[key] = lohi
            lo, hi, values = lohi
            if lo is None or hi is None:
                return []  # empty dim / all-NULL keys: no constraint
            return [(t_attr.exprId().toString(), lo, hi, values)]
        except Exception:
            return []

    return derive


# above this many distinct dim keys, only the [min, max] range is used
# (collecting the exact values to the driver stops paying for itself)
_DYN_SET_CAP = 512


def prune_query(engine, ddl, query: str, df, report: dict | None = None):
    """Rebuild ``query`` over pruned manifest views when file-level
    stats prove some files irrelevant. Returns the pruned DataFrame, or
    None when nothing could be (or needed to be) pruned. The full views
    are always restored before returning.

    ``report`` (EXPLAIN FILES): when a dict is passed, it is filled
    with {table: {"kept": n, "total": m}} for every manifest table the
    plan scans — and the function returns None WITHOUT rebuilding
    anything (a pure analysis pass; kept == total means no file could
    be skipped, e.g. an unprunable scan shape)."""
    import os

    from sclera_spark.plans.frontend import lower_sql

    tables = _manifest_tables_by_dir(ddl)  # data_dir -> (name, mt)
    if not tables:
        return None

    try:
        if df.isStreaming:
            return None
        deriver = (
            _make_deriver(engine, set(tables))
            if engine.config.get("dynamic_file_pruning", "on") == "on"
            else None
        )
        plan = df._jdf.queryExecution().optimizedPlan()
        pairs = []
        for p in _all_plans(plan):
            pairs.extend(_scan_pairs(p, deriver))
    except Exception:
        return None
    if not pairs:
        return None

    # per table: None = saw an unprunable scan (keep everything);
    # else the union of per-scan surviving file lists
    survivors: dict[str, set | None] = {}
    mts: dict[str, object] = {}
    for cond, rel, env in pairs:
        d = _relation_dir(rel)
        hit = tables.get(os.path.abspath(d)) if d else None
        if hit is None:
            continue
        name, mt = hit
        mts[name] = mt
        if survivors.get(name, set()) is None:
            continue
        ranges = _cond_ranges(cond)
        nullness = _cond_nulls(cond)
        key_sets: dict[str, list] = {}
        if env:
            # join-derived constraints: applied only to THIS scan
            # occurrence, and only when the key is the relation's own
            # output column (exprId match — a renamed/computed column
            # between join and scan never matches)
            rel_out = {}
            try:
                for out in _seq(rel.output()):
                    rel_out[out.exprId().toString()] = out.name()
            except Exception:
                rel_out = {}
            for eid, lo, hi, values in env:
                col = rel_out.get(eid)
                if col is None:
                    continue
                if values is not None:
                    if col in key_sets:
                        # two independent key sets: intersect
                        key_sets[col] = sorted(
                            set(key_sets[col]) & set(values)
                        )
                    else:
                        key_sets[col] = values
                cur = ranges.get(col)
                if cur is None:
                    ranges[col] = (lo, hi)
                else:
                    try:
                        nlo = lo if cur[0] is None else (
                            cur[0] if lo is None else max(cur[0], lo)
                        )
                        nhi = hi if cur[1] is None else (
                            cur[1] if hi is None else min(cur[1], hi)
                        )
                        ranges[col] = (nlo, nhi)
                    except TypeError:
                        continue  # incomparable: keep the filter bound
        if not ranges and not nullness and not key_sets:
            survivors[name] = None
            continue
        try:
            kept = mt.files_pruned(ranges, nulls=nullness, sets=key_sets)
        except Exception:
            survivors[name] = None
            continue
        survivors[name] = survivors.get(name, set()) | set(kept)

    if report is not None:
        for name, keep in survivors.items():
            try:
                total = len(mts[name].files())
            except Exception:
                continue
            report[name] = {
                "kept": total if keep is None else min(len(keep), total),
                "total": total,
            }
        return None  # analysis-only pass: no rebuild, no registration

    pruned = {}
    for name, keep in survivors.items():
        if keep is None:
            continue
        try:
            total = mts[name].files()
        except Exception:
            continue
        if len(keep) < len(total):
            pruned[name] = sorted(keep)
    if not pruned:
        return None

    spark = engine.spark
    try:
        # pruned snapshot reads are cached per (table, file list): a
        # repeated probe re-registers the SAME DataFrame — no fresh
        # FileIndex, no schema-inference job (the fixed costs that
        # would otherwise eat the skipping win on small probes). The
        # file list IS the invalidation: any commit changes it.
        rcache = getattr(engine, "_pruned_read_cache", None)
        if rcache is None:
            rcache = engine._pruned_read_cache = {}
        for name, files in pruned.items():
            # version in the key: a metadata-only commit (RENAME /
            # DROP COLUMN, widening) changes the read projection
            # without changing the file list — the file tuple alone
            # would serve a stale pre-evolution DataFrame
            key = (name, mts[name].version(), tuple(files))
            df_p = rcache.get(key)
            if df_p is not None:
                rcache[key] = rcache.pop(key)  # LRU touch
            else:
                full = engine.catalog.tables.get(name)
                df_p = mts[name].read(
                    spark,
                    file_paths=files,
                    schema=None if full is None else full.schema,
                )
                while len(rcache) >= 128:
                    rcache.pop(next(iter(rcache)))
                rcache[key] = df_p
            engine.catalog.register(name, df_p)
        _refresh_views(engine, ddl, set(pruned))
        return lower_sql(engine, query)
    except Exception:
        return None
    finally:
        for name in pruned:
            try:
                ddl._register_manifest(name)
            except Exception:
                pass
        try:
            _refresh_views(engine, ddl, set(pruned))
        except Exception:
            pass


def _refresh_views(engine, ddl, affected: set) -> None:
    """Re-lower registered views whose definition (transitively)
    references an affected table name: a view's DataFrame captures the
    table's plan at CREATE VIEW time, so swapping the table's registered
    view (pruned rebuild, then restore) must re-derive dependent views
    or they would keep reading the stale file list. Fixed-point over
    the view registry handles view-on-view chains; a nested view
    re-lowered before its parent in the same pass simply stays less
    pruned (never wrong — it reads the full table)."""
    import re

    from sclera_spark.plans.frontend import lower_sql

    views = getattr(ddl, "views", {})
    affected = set(affected)
    grew = True
    while grew:
        grew = False
        for vname, vquery in views.items():
            if vname in affected:
                continue
            if any(
                re.search(rf"\b{re.escape(n)}\b", vquery, re.IGNORECASE)
                for n in affected
            ):
                df = lower_sql(engine, vquery)
                df.createOrReplaceTempView(vname)
                engine.catalog.tables[vname] = df
                affected.add(vname)
                grew = True
