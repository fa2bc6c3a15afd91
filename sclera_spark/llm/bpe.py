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


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 100,
    min_freq: int = 2,
    lowercase: bool = True,
    checkpoint_every: int = 10,
) -> list[tuple[str, str, int]]:
    """Learn BPE merges over a corpus; returns [(left, right, freq)] in
    merge order. Each word is seeded as its characters plus an ``</w>``
    end-of-word symbol; each iteration merges the globally most frequent
    adjacent pair (ALL non-overlapping occurrences, leftmost-first — the
    textbook algorithm), stopping early when no pair reaches
    ``min_freq``."""
    wc = word_counts(df, text_col, lowercase)
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
