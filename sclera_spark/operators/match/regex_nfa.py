"""Label-regex compiler: Sclera MATCH pattern -> Glushkov NFA -> match spans.

Surface grammar (parity with the reference's regex parser,
modules/util/regexparser/src/main/scala/RegexParser.scala:66-112):

    anchored := ['^'] regex ['$']
    regex    := cascade ('|' cascade)*
    cascade  := unary (['.'] unary)*        # juxtaposition = concatenation
    unary    := atom ('*' | '+' | '?')*
    atom     := LABEL | '(' regex ')'

Labels are case-insensitive identifiers (upper-cased), string or numeric
literals. The construction is the standard Glushkov position automaton
(one state per symbol occurrence; first/last sets; follow relation) — the
same automaton family the reference uses (modules/util/automata/src/main/
scala/nfa/Nfa.scala:23 "Glushkov automaton"), implemented here from the
textbook construction.

Matching semantics: greedy leftmost non-overlapping — scan each partition's
row sequence; at the earliest row where a match can start, take the LONGEST
match, emit it, resume scanning past its last row (MATCH_RECOGNIZE's
"ONE ROW PER MATCH ... AFTER MATCH SKIP PAST LAST ROW" discipline).
'^' restricts match starts to the first row; '$' requires the match to end
at the last row.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Nfa:
    """Glushkov automaton over label symbols."""

    state_label: dict[int, str] = field(default_factory=dict)
    first: list[int] = field(default_factory=list)
    last: list[int] = field(default_factory=list)
    nxt: dict[int, list[int]] = field(default_factory=dict)
    optional: bool = False

    @staticmethod
    def symbol(label: str, pos: int) -> "Nfa":
        return Nfa({pos: label}, [pos], [pos], {pos: []}, False)

    def alternate(self, other: "Nfa") -> "Nfa":
        return Nfa(
            {**self.state_label, **other.state_label},
            self.first + other.first,
            self.last + other.last,
            {**self.nxt, **other.nxt},
            self.optional or other.optional,
        )

    def cascade(self, follow: "Nfa") -> "Nfa":
        nxt = {**self.nxt, **follow.nxt}
        for s in self.last:
            nxt[s] = nxt.get(s, []) + follow.first
        return Nfa(
            {**self.state_label, **follow.state_label},
            self.first + follow.first if self.optional else list(self.first),
            self.last + follow.last if follow.optional else list(follow.last),
            nxt,
            self.optional and follow.optional,
        )

    def opt(self) -> "Nfa":
        return Nfa(self.state_label, self.first, self.last, self.nxt, True)

    def kleene_plus(self) -> "Nfa":
        nxt = dict(self.nxt)
        for s in self.last:
            merged = nxt.get(s, []) + [t for t in self.first if t not in nxt.get(s, [])]
            nxt[s] = merged
        return Nfa(self.state_label, self.first, self.last, nxt, self.optional)

    def kleene_star(self) -> "Nfa":
        return self.kleene_plus().opt()


@dataclass
class AnchoredNfa:
    nfa: Nfa
    anchored_begin: bool
    anchored_end: bool
    pattern: str

    START = 0

    def __post_init__(self) -> None:
        self.finish: frozenset[int] = frozenset(
            ([self.START] if self.nfa.optional else []) + self.nfa.last
        )
        self.next_map: dict[int, list[int]] = {**self.nfa.nxt, self.START: self.nfa.first}
        self.label_of: dict[int, str] = dict(self.nfa.state_label)

    @property
    def labels(self) -> list[str]:
        seen: list[str] = []
        for lab in self.nfa.state_label.values():
            if lab not in seen:
                seen.append(lab)
        return seen


_TOKEN = re.compile(
    r"\s*(?:(?P<id>[A-Za-z_][A-Za-z0-9_]*|[0-9]+|'[^']*'|\"[^\"]*\")|(?P<op>[\^\$\|\.\*\+\?\(\)]))"
)


def _tokenize(pattern: str) -> list[str]:
    out, i = [], 0
    while i < len(pattern):
        m = _TOKEN.match(pattern, i)
        if not m:
            if pattern[i:].strip() == "":
                break
            raise ValueError(f"bad pattern at {i}: {pattern!r}")
        i = m.end()
        tok = m.group("id") or m.group("op")
        if m.group("id"):
            tok = tok.strip("'\"").upper()
            out.append(("ID", tok))
        else:
            out.append(("OP", tok))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0
        self.pos_counter = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _describe(self) -> str:
        k, v = self.peek()
        return "end of pattern" if k is None else f"{v!r} (position {self.i})"

    def take(self, kind=None, val=None):
        t = self.peek()
        if (kind and t[0] != kind) or (val and t[1] != val):
            raise ValueError(f"expected {val or kind} but found {self._describe()}")
        self.i += 1
        return t

    def parse_anchored(self, pattern: str) -> AnchoredNfa:
        ab = ae = False
        if self.peek() == ("OP", "^"):
            self.take()
            ab = True
        nfa = self.parse_alt()
        if self.peek() == ("OP", "$"):
            self.take()
            ae = True
        if self.i != len(self.toks):
            raise ValueError(
                f"unexpected {self._describe()} after a complete pattern "
                f"(labels are identifiers; operators are | . * + ? ( ) ^ $)"
            )
        return AnchoredNfa(nfa, ab, ae, pattern)

    def parse_alt(self) -> Nfa:
        nfa = self.parse_cascade()
        while self.peek() == ("OP", "|"):
            self.take()
            nfa = nfa.alternate(self.parse_cascade())
        return nfa

    def parse_cascade(self) -> Nfa:
        nfa = self.parse_unary()
        while True:
            k, v = self.peek()
            if (k, v) == ("OP", "."):
                self.take()
                nfa = nfa.cascade(self.parse_unary())
            elif k == "ID" or (k, v) == ("OP", "("):
                nfa = nfa.cascade(self.parse_unary())
            else:
                return nfa

    def parse_unary(self) -> Nfa:
        nfa = self.parse_atom()
        while True:
            k, v = self.peek()
            if k == "OP" and v in "*+?":
                self.take()
                nfa = {"*": nfa.kleene_star, "+": nfa.kleene_plus, "?": nfa.opt}[v]()
            else:
                return nfa

    def parse_atom(self) -> Nfa:
        k, v = self.peek()
        if (k, v) == ("OP", "("):
            self.take()
            nfa = self.parse_alt()
            self.take("OP", ")")
            return nfa
        if k == "ID":
            self.take()
            self.pos_counter += 1
            return Nfa.symbol(v, self.pos_counter)
        raise ValueError(
            f"expected a label or '(' but found {self._describe()} "
            f"(labels are identifiers; operators are | . * + ? ( ) ^ $)"
        )


def compile_pattern(pattern: str) -> AnchoredNfa:
    return _Parser(_tokenize(pattern)).parse_anchored(pattern)


class CompiledMatcher:
    """Bitmask-compiled NFA runner: states are bits of a Python int, one
    transition step is a handful of int ops — ~10-50x faster than set
    algebra for the per-row hot loop inside applyInPandas."""

    def __init__(self, nfa: AnchoredNfa):
        self.nfa = nfa
        states = sorted(set(nfa.next_map) | {t for ts in nfa.next_map.values() for t in ts})
        self.state_index = {s: i for i, s in enumerate(states)}
        self.start_bit = 1 << self.state_index[AnchoredNfa.START]
        self.finish_mask = sum(1 << self.state_index[s] for s in nfa.finish)
        # next_mask[i] = bitmask of states reachable from state i
        self.next_mask = [0] * len(states)
        for s, ts in nfa.next_map.items():
            m = 0
            for t in ts:
                m |= 1 << self.state_index[t]
            self.next_mask[self.state_index[s]] = m
        # label -> bitmask of states consuming that label
        self.label_mask: dict[str, int] = {}
        for s, lab in nfa.label_of.items():
            if s in self.state_index:
                self.label_mask[lab] = self.label_mask.get(lab, 0) | (
                    1 << self.state_index[s]
                )

    def row_masks(self, row_labels) -> list[int]:
        """Precompute, per row, the bitmask of NFA states its labels can
        enter. Accepts str labels (single-label fast path) or iterables."""
        lm = self.label_mask
        out = []
        for labs in row_labels:
            if labs is None:
                out.append(0)
            elif isinstance(labs, str):
                out.append(lm.get(labs, 0))
            else:
                m = 0
                for l in labs:
                    m |= lm.get(l, 0)
                out.append(m)
        return out

    def find_matches(self, row_labels) -> list[tuple[int, int]]:
        """Greedy leftmost non-overlapping match spans [(start, end_excl)].
        Empty (zero-length) matches are skipped."""
        return [(s, e) for s, e, _ in self.find_matches_with_paths(row_labels, False)]

    def scan_open(
        self, row_labels, want_paths: bool = True
    ) -> tuple[list[tuple[int, int, list[str] | None]], int | None]:
        """:meth:`find_matches_with_paths` over a PREFIX of a longer
        input (r12 bounded-memory MATCH): identical greedy
        leftmost-longest loop, except an attempt whose frontier is still
        ALIVE at the end of the given rows is WITHHELD — more input
        could extend or settle it. Returns ``(settled_spans,
        open_start)`` where ``open_start`` is that attempt's start
        index (the caller must re-feed rows from there together with
        the next chunk), or None when every attempt settled within the
        prefix. An anchored-begin pattern whose first attempt settles
        returns open_start=None with nothing further ever matchable —
        the caller's ``dead`` flag covers that."""
        masks = self.row_masks(row_labels)
        n = len(masks)
        next_mask, finish = self.next_mask, self.finish_mask
        anchored_end, anchored_begin = (
            self.nfa.anchored_end,
            self.nfa.anchored_begin,
        )
        start_step = next_mask[self.state_index[AnchoredNfa.START]]
        index_state = {i: s for s, i in self.state_index.items()}
        out: list[tuple[int, int, list[str] | None]] = []
        i = 0
        while i < n:
            cur = start_step & masks[i]
            frontiers = [cur]
            best_end = -1
            j = i
            while cur:
                j += 1
                # NOTE vs find_matches_with_paths: an accept at j == n is
                # NOT final here — the input is a prefix, so an
                # anchored-end accept (or any accept that could extend)
                # stays with the open attempt
                if cur & finish and not anchored_end:
                    best_end = j
                if j >= n:
                    break
                nxt = 0
                m = cur
                while m:
                    b = m & -m
                    nxt |= next_mask[b.bit_length() - 1]
                    m ^= b
                cur = nxt & masks[j]
                frontiers.append(cur)
            if cur:  # alive at prefix end: withhold from i onward
                return out, i
            if best_end > i:
                labels_path = (
                    self._trace_labels(frontiers[: best_end - i], index_state)
                    if want_paths
                    else None
                )
                out.append((i, best_end, labels_path))
                i = best_end
            else:
                i += 1
            if anchored_begin:
                break
        return out, None

    def find_matches_with_paths(
        self, row_labels, want_paths: bool = True
    ) -> list[tuple[int, int, list[str] | None]]:
        """Like find_matches, but each span also carries the per-row label
        sequence of ONE accepting NFA path (recovered by backward traceback
        over the stored frontiers) — this is the row's *matched* label,
        which for multi-label rows can differ from any fixed choice."""
        masks = self.row_masks(row_labels)
        n = len(masks)
        next_mask, finish = self.next_mask, self.finish_mask
        anchored_end, anchored_begin = self.nfa.anchored_end, self.nfa.anchored_begin
        start_step = next_mask[self.state_index[AnchoredNfa.START]]
        index_state = {i: s for s, i in self.state_index.items()}
        out: list[tuple[int, int, list[str] | None]] = []
        i = 0
        while i < n:
            cur = start_step & masks[i]
            frontiers = [cur]  # frontier after consuming row i+k
            best_end = -1
            j = i
            while cur:
                j += 1
                if cur & finish and (not anchored_end or j == n):
                    best_end = j
                if j >= n:
                    break
                nxt = 0
                m = cur
                while m:
                    b = m & -m
                    nxt |= next_mask[b.bit_length() - 1]
                    m ^= b
                cur = nxt & masks[j]
                frontiers.append(cur)
            if best_end > i:
                labels_path = (
                    self._trace_labels(frontiers[: best_end - i], index_state)
                    if want_paths
                    else None
                )
                out.append((i, best_end, labels_path))
                i = best_end
            else:
                i += 1
            if anchored_begin:
                break
        return out

    def _trace_labels(self, frontiers: list[int], index_state: dict[int, int]) -> list[str]:
        """Backward traceback: pick an accepting state in the last frontier,
        then repeatedly pick any predecessor in the previous frontier."""
        L = len(frontiers)
        # accepting state at the end
        last = frontiers[-1] & self.finish_mask
        chosen = (last & -last).bit_length() - 1
        states = [chosen]
        for k in range(L - 2, -1, -1):
            m = frontiers[k]
            pred = None
            while m:
                b = m & -m
                idx = b.bit_length() - 1
                if self.next_mask[idx] & (1 << states[-1]):
                    pred = idx
                    break
                m ^= b
            states.append(pred if pred is not None else (frontiers[k] & -frontiers[k]).bit_length() - 1)
        states.reverse()
        return [self.nfa.label_of[index_state[ix]] for ix in states]


def find_matches(
    nfa: AnchoredNfa, row_labels: list[frozenset[str] | set[str] | str]
) -> list[tuple[int, int]]:
    """Greedy leftmost non-overlapping match spans [(start, end_exclusive)].

    ``row_labels[i]`` is the label (str) or label set of row i. A transition
    into Glushkov state t consumes a row whose labels contain
    ``label_of[t]``. Empty (zero-length) matches are skipped.
    """
    return CompiledMatcher(nfa).find_matches(row_labels)
