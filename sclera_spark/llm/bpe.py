"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, arXiv:1508.07909): learn the ``n_merges`` most frequent adjacent
symbol pairs over a corpus, then encode text with the learned merge
ranks. No reference counterpart (extension tier, like the rest of
``llm/``).

Scale shape — the classic algorithm distributed the way it wants to be:

- the corpus collapses to a WORD-FREQUENCY table first (one shuffle);
  every later iteration runs over vocab-sized data (|distinct words|,
  millions at 100 TB — not the trillions of raw tokens);
- each merge iteration is ONE JVM-side aggregation: split the symbol
  string, explode adjacent pairs weighted by word count, partial-agg to
  the global pair counts, take the max. The only driver traffic is the
  single winning pair per iteration (a 3-field row);
- applying a merge is one ``regexp_replace`` over the symbol strings —
  a narrow map, no shuffle; lineage is truncated by localCheckpoint
  every few iterations so the plan does not grow with n_merges;
- tie-breaks are (freq DESC, pair ASC) — total order, so the learned
  merge list is DETERMINISTIC and layout-independent (tested by
  repartitioning the corpus).

Encoding replays the merge list by rank per word (the standard
tokenizer-runtime algorithm) in an Arrow-batched pandas UDF with
per-word memoization — encode throughput is dominated by DISTINCT words
per batch, not rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def _jq(s: str) -> str:
    """Quote a literal for a Java regex (\\Q...\\E, splitting embedded \\E)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _jrepl(s: str) -> str:
    """Quote a literal for a Java regex REPLACEMENT string."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def word_counts(
    df: DataFrame, text_col: str, lowercase: bool = True
) -> DataFrame:
    """Whitespace-pretokenized word-frequency table — the object every
    BPE iteration runs over. Columns: (word string, cnt long)."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
    return (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# observability for tests/operators: which strategy the last bpe_train
# call took and how many driver round trips (Spark actions) it cost
TRAIN_STATS = {"strategy": None, "driver_rounds": 0}


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Apply one merge to a symbol list: ALL non-overlapping occurrences,
    leftmost-first (the textbook rule, same as the regexp path)."""
    out: list[str] = []
    i, n, ab = 0, len(syms), a + b
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_incremental(
    wc: list[tuple[str, int]], n_merges: int, min_freq: int
) -> list[tuple[str, str, int]]:
    """The exact sequential BPE learner with INCREMENTAL pair statistics
    (Sennrich et al. 2016's learn_bpe shape): pair counts and a
    pair->words occurrence index are maintained by diffing only the
    words a merge touches, and the global argmax is a lazy max-heap
    (stale entries discarded on pop, fresh entries pushed on every
    count change). Semantics are IDENTICAL to re-counting from scratch
    each iteration — 1000 merges cost seconds, zero Spark jobs."""
    import heapq
    from collections import Counter

    words: list[list[str]] = []
    cnts: list[int] = []
    for w, c in wc:
        words.append(list(w) + [_EOW])
        cnts.append(int(c))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        c = cnts[wi]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)

    # heap orders (freq DESC, a ASC, b ASC) — the sequential tie-break
    heap = [(-f, a, b) for (a, b), f in pair_counts.items()]
    heapq.heapify(heap)

    def bump(p: tuple[str, str], delta: int) -> None:
        nf = pair_counts.get(p, 0) + delta
        if nf <= 0:
            pair_counts.pop(p, None)
        else:
            pair_counts[p] = nf
            heapq.heappush(heap, (-nf, p[0], p[1]))

    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        nf, a, b = heapq.heappop(heap)
        f = -nf
        if pair_counts.get((a, b), 0) != f:
            continue  # stale entry — a fresher one is in the heap
        if f < min_freq:
            break  # heap max below threshold: nothing qualifies
        merges.append((a, b, f))
        for wi in sorted(pair_words.get((a, b), ())):
            syms = words[wi]
            c = cnts[wi]
            new_syms = _merge_word(syms, a, b)
            old_pairs = Counter(zip(syms, syms[1:]))
            new_pairs = Counter(zip(new_syms, new_syms[1:]))
            for p in old_pairs.keys() - new_pairs.keys():
                bump(p, -old_pairs[p] * c)
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[p]
            for p in new_pairs.keys() | old_pairs.keys():
                d = new_pairs.get(p, 0) - old_pairs.get(p, 0)
                if p in new_pairs:
                    pair_words.setdefault(p, set()).add(wi)
                    if d:
                        bump(p, d * c)
            words[wi] = new_syms
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 100,
    min_freq: int = 2,
    lowercase: bool = True,
    checkpoint_every: int = 10,
    strategy: str = "auto",
    max_driver_vocab: int = 5_000_000,
) -> list[tuple[str, str, int]]:
    """Learn BPE merges over a corpus; returns [(left, right, freq)] in
    merge order. Each word is seeded as its characters plus an ``</w>``
    end-of-word symbol; each iteration merges the globally most frequent
    adjacent pair (ALL non-overlapping occurrences, leftmost-first — the
    textbook algorithm), stopping early when no pair reaches
    ``min_freq``.

    ``strategy`` (r7, closing the driver-loop caveat):

    - ``'driver'`` — collapse the corpus to its word-frequency table
      (ONE distributed aggregation; the standard tokenizer-training
      shape — Sennrich's learn_bpe and the HF trainers hold exactly
      this table) and run the exact incremental learner on it: total
      driver round trips are O(1) instead of O(n_merges), so a
      50k-merge vocab is seconds of heap updates, not 50k Spark jobs.
      Refuses (loudly) a vocab above ``max_driver_vocab`` rows.
    - ``'distributed'`` — the r5 per-merge aggregation loop: one tiny
      Spark job per merge, vocab never leaves the cluster. The right
      tool only when the DISTINCT-WORD table itself is too big to hold.
    - ``'auto'`` (default) — 'driver' when the vocab row count fits
      ``max_driver_vocab``, else 'distributed'.

    Both strategies produce the IDENTICAL merge list (same algorithm,
    same (freq DESC, pair ASC) tie-break) — pinned in test_bpe.py.

    Why not batched top-k selection per distributed round: a merge can
    CREATE a pair (prev+merged / merged+next) whose count outranks the
    round's remaining candidates, and those counts are unknowable
    without context aggregation — so any top-k batch silently diverges
    from sequential semantics on real text. The word-table collapse
    achieves the round-trip reduction exactly instead."""
    if strategy not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown bpe_train strategy {strategy!r}")
    wc = word_counts(df, text_col, lowercase)
    if strategy != "distributed":
        vocab_rows = wc.count()
        if vocab_rows <= max_driver_vocab:
            TRAIN_STATS["strategy"] = "driver"
            TRAIN_STATS["driver_rounds"] = 2  # count + collect
            rows = wc.collect()
            return _train_incremental(
                [(r["word"], r["cnt"]) for r in rows], n_merges, min_freq
            )
        if strategy == "driver":
            raise ValueError(
                f"bpe_train(strategy='driver'): vocab has {vocab_rows} "
                f"distinct words > max_driver_vocab={max_driver_vocab}; "
                "use strategy='distributed' (per-merge aggregation jobs) "
                "or raise the cap"
            )
    TRAIN_STATS["strategy"] = "distributed"
    TRAIN_STATS["driver_rounds"] = 0
    # " h e l l o </w> " — single-space-delimited symbols with boundary
    # spaces so every symbol occurrence has the same " A B" shape
    syms = F.concat(
        F.lit(" "),
        F.regexp_replace(F.col("word"), "(.)", "$1 "),
        F.lit(_EOW + " "),
    )
    cur = wc.select(syms.alias("syms"), "cnt").localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        toks = F.filter(F.split(F.col("syms"), " "), lambda x: x != "")
        pair_idx = F.sequence(F.lit(0), F.size(toks) - 2)
        pairs = F.transform(
            pair_idx,
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("a"),
                F.element_at(toks, i + 2).alias("b"),
            ),
        )
        top = (
            cur.filter(F.size(toks) >= 2)
            .select(F.explode(pairs).alias("p"), "cnt")
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("freq"))
            .filter(F.col("freq") >= min_freq)
            .orderBy(F.desc("freq"), "a", "b")
            .limit(1)
            .collect()
        )
        TRAIN_STATS["driver_rounds"] += 1
        if not top:
            break
        a, b, freq = top[0].a, top[0].b, int(top[0].freq)
        merges.append((a, b, freq))
        pat = f" {_jq(a)} {_jq(b)}(?= )"
        cur = cur.select(
            F.regexp_replace(F.col("syms"), pat, " " + _jrepl(a + b)).alias(
                "syms"
            ),
            "cnt",
        )
        if (it + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str, int]],
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, apply
    merges in RANK order until none applies (the standard tokenizer
    runtime), emitting the concatenated symbol array for the row.
    Arrow-batched pandas UDF with per-word memoization — cost scales
    with distinct words per batch."""
    from pyspark.sql.functions import pandas_udf

    ranks = {(a, b): i for i, (a, b, _f) in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode(col: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            s = list(w) + [_EOW]
            while len(s) > 1:
                best_rank, best = None, None
                for x, y in zip(s, s[1:]):
                    r = ranks.get((x, y))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best = r, (x, y)
                if best is None:
                    break
                x, y = best
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            cache[w] = s
            return s

        def enc_text(t):
            if t is None:
                return None
            if lowercase:
                t = t.lower()
            toks: list[str] = []
            for w in t.split():
                toks.extend(enc_word(w))
            return toks

        return col.map(enc_text)

    return df.withColumn(out_col, encode(F.col(text_col)))
