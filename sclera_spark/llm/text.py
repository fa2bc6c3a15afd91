"""Text analysis operators: token counting, quality scoring, language id,
fingerprinting. All JVM-side expressions (regexp_count / split / array
algebra) — zero Python in the row path, so these run at scan throughput.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# common-word lists for the n-gram/stopword language heuristic; tiny enough
# to inline as literals (no broadcast needed)
_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "un", "des", "dans", "pour", "que", "qui"],
    "es": ["el", "la", "los", "las", "y", "es", "una", "un", "en", "por", "que", "con", "para"],
    "it": ["il", "la", "le", "e", "è", "una", "un", "di", "che", "per", "con", "non", "sono"],
}


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}\s]", " "), r"\s+"),
        lambda t: t != "",
    )


def token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "n_tokens", mode: str = "whitespace"
) -> DataFrame:
    """Token counts. ``whitespace``: split on runs of whitespace.
    ``bpe``: a BPE-ish regex (word pieces + digits + punctuation runs) that
    approximates subword tokenizer counts without a vocab."""
    if mode == "whitespace":
        cnt = F.size(_tokens(F.col(text_col)))
    elif mode == "bpe":
        cnt = F.regexp_count(
            F.col(text_col), F.lit(r"[A-Za-z]{1,8}|[0-9]{1,3}|[^A-Za-z0-9\s]")
        )
    else:
        raise ValueError(f"unknown token mode: {mode}")
    return df.withColumn(out_col, cnt.cast("long"))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features (Gopher/C4-style filters):
    length, mean word length, punctuation/digit/uppercase ratios, stopword
    ratio, repetition ratio. Emitted as columns; thresholding is the
    caller's policy."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    en_stop = F.array(*[F.lit(w) for w in _LANG_STOPWORDS["en"]])
    return (
        df.withColumn("n_chars_q", n_chars.cast("long"))
        .withColumn("n_tokens_q", n_tokens.cast("long"))
        .withColumn(
            "mean_word_len",
            F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast("double") / safe_tokens,
        )
        .withColumn("punct_ratio", F.regexp_count(t, F.lit(r"[^\w\s]")).cast("double") / safe_chars)
        .withColumn("digit_ratio", F.regexp_count(t, F.lit(r"[0-9]")).cast("double") / safe_chars)
        .withColumn("upper_ratio", F.regexp_count(t, F.lit(r"[A-Z]")).cast("double") / safe_chars)
        .withColumn(
            "stopword_ratio",
            F.size(F.filter(toks, lambda x: F.array_contains(en_stop, x))).cast("double")
            / safe_tokens,
        )
        .withColumn(
            "repetition_ratio",
            (n_tokens - F.size(F.array_distinct(toks))).cast("double") / safe_tokens,
        )
    )


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Stopword-vote language identification: score = fraction of tokens
    in each language's common-word list; argmax wins, 'und' (undetermined)
    if no vote. Pure array algebra — one pass, codegen."""
    toks = _tokens(F.col(text_col))

    # (closure, not a second lambda arg: F.filter would treat a two-arg
    # lambda as (element, index))
    def vote(words: list[str]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scores = [vote(words).alias(lang) for lang, words in _LANG_STOPWORDS.items()]
    langs = list(_LANG_STOPWORDS)
    pairs = F.array(
        *[
            F.struct(s.cast("long").alias("score"), F.lit(lang).alias("lang"))
            for lang, s in zip(langs, scores)
        ]
    )
    best = F.array_max(pairs)
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint", winnow_k: int = 8
) -> DataFrame:
    """Document fingerprints: a 64-bit content hash of the normalized text
    plus a winnowing-style sketch (min token-k-gram hash) usable for
    containment checks."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    toks = _tokens(F.col(text_col))
    kgrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - winnow_k, F.lit(0))),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, winnow_k), " ")),
    )
    return df.withColumn(out_col, F.xxhash64(norm)).withColumn(
        f"{out_col}_min_kgram", F.array_min(kgrams)
    )
