"""Text analysis operators: token counting, quality scoring, language id,
fingerprinting. All JVM-side expressions (regexp_count / split / array
algebra) — zero Python in the row path, so these run at scan throughput.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out_col: str = "_start",
    buckets: int | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``val_col`` over the GLOBAL
    ``order_cols`` order, without a single-partition window: two-phase
    distributed carry (range-repartition by the order columns ->
    per-partition window cumsum -> one tiny total row per partition to
    the driver -> broadcast exclusive offsets back). Deterministic and
    layout-independent; driver state is one row per partition — the
    carry pattern shared by sequence packing and the token-budget
    sampler. Output: the input columns plus ``out_col``."""
    spark = df.sparkSession
    # exported surface, called on arbitrary caller frames: refuse
    # loudly on a name collision instead of silently overwriting and
    # then dropping the caller's _pid/_local_end/_off data
    internal = {"_pid", "_local_end", "_off"}
    clash = (internal & set(df.columns)) | (internal & {out_col})
    if clash:
        raise ValueError(
            "global_prefix_sum: input columns collide with internal "
            f"working columns {sorted(clash)}; rename them first"
        )
    n_b = buckets or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cols = [F.col(c) for c in order_cols]
    # materialize the input ONCE before the range shuffle:
    # repartitionByRange first runs a RangePartitioner SAMPLING job that
    # recomputes the entire upstream (for pack_documents that is the
    # full tokenize pass) and then recomputes it again for the real
    # shuffle write. Checkpointing here makes the sample read cheap
    # local blocks instead of re-running the scan+tokenize.
    t = df.localCheckpoint(eager=True)
    t = t.repartitionByRange(n_b, *cols)
    t = t.withColumn("_pid", F.spark_partition_id())
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # localCheckpoint, not cache(): the frame is read twice (totals
    # collect + the offset join) and must be consistent, but a df.cache
    # entry is plan-keyed in the CacheManager and lives until an
    # explicit unpersist — which no caller can issue before its
    # downstream materializes — whereas checkpoint blocks are released
    # by the ContextCleaner when the frame is garbage collected (no
    # per-call storage leak in a long-lived session)
    t = t.withColumn("_local_end", F.sum(val_col).over(w)).localCheckpoint(
        eager=True
    )
    # one row per RANGE partition; range partitions are ordered by key,
    # so the exclusive prefix over pid order is the global carry.
    # SUM of the values, not max(_local_end): a running cumsum over
    # SIGNED values can peak before its end, and max would hand every
    # later partition an inflated carry
    totals = {
        r["_pid"]: r["s"]
        for r in t.groupBy("_pid").agg(F.sum(val_col).alias("s")).collect()
    }
    run = 0
    rows = []
    for pid in range(n_b):
        rows.append((pid, run))
        run += totals.get(pid) or 0
    off = F.broadcast(spark.createDataFrame(rows, ["_pid", "_off"]))
    return (
        t.join(off, "_pid")
        .withColumn(
            out_col, F.col("_off") + F.col("_local_end") - F.col(val_col)
        )
        .drop("_pid", "_local_end", "_off")
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


# -- PII redaction -----------------------------------------------------------

# Conservative patterns shared by Java regex (Spark) and RE2 (DuckDB/most
# scanners): no lookarounds, no backrefs, explicit character classes.
# Order matters: emails before bare domains'-ish things, IPs before phones
# (an IP would otherwise partially match the phone pattern's digit runs).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[0-9A-Za-z._%+-]+@[0-9A-Za-z.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    # no leading \b: '(' and '+' are non-word chars, so a boundary there
    # never matches; the digit-run branch carries its own \b instead
    (r"(?:\+?1[ .-]?)?(?:\([0-9]{3}\)|\b[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}\b", "[PHONE]"),
]


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Redact common PII shapes (emails, IPv4s, SSNs, NANP phone numbers)
    with typed placeholders. A chain of JVM-side ``regexp_replace`` calls —
    codegen'd, zero Python in the row path, runs at scan throughput on a
    100 TB corpus. Patterns avoid lookarounds so the same strings work in
    RE2-based scanners (and the DuckDB test oracle)."""
    col = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col, col)


# -- repetition signals (Gopher-style) --------------------------------------


def repetition_scores(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Within-document repetition signals used by Gopher/Dolma-style
    quality filters, for prose without line structure: the fraction of
    duplicate word n-grams and the share of the single most frequent
    n-gram. Pure array algebra per row; the top-gram count is a single
    max-run scan over the SORTED gram array (O(g log g)) — a nested
    transform-filter count is quadratic per row and measures ~50x slower
    under Spark's interpreted lambda evaluation. No shuffle, no Python."""
    toks = _tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    n_grams = F.size(grams)
    safe = F.greatest(n_grams, F.lit(1)).cast("double")
    distinct = F.array_distinct(grams)
    run_state = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda s, x: F.struct(
            x.alias("prev"),
            F.when(s["prev"].eqNullSafe(x), s["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                s["best"],
                F.when(s["prev"].eqNullSafe(x), s["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_count = F.when(n_grams > 0, run_state["best"])
    return (
        df.withColumn("n_ngrams", n_grams.cast("long"))
        .withColumn(
            "dup_ngram_frac",
            (n_grams - F.size(distinct)).cast("double") / safe,
        )
        .withColumn(
            "top_ngram_frac",
            F.coalesce(top_count.cast("double") / safe, F.lit(0.0)),
        )
    )


# -- benchmark decontamination ----------------------------------------------


def ngram_contamination(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: for each corpus document, the count
    and fraction of its distinct word n-grams that appear anywhere in the
    benchmark set (the standard eval-decontamination test, usually run
    with 8-13-grams on real corpora).

    Scale shape: the benchmark side is eval data — tiny relative to a
    100 TB corpus — so its distinct-n-gram set is BROADCAST; the corpus
    side is one projection + explode + broadcast semi-join + one groupBy
    keyed on ``id_col``. No shuffle of document text, only (id, gram)
    pairs for grams that exist at all, and the gram explode prunes to the
    join early."""
    from pyspark.sql.functions import broadcast

    def gramize(frame: DataFrame, keep_id: bool):
        toks = _tokens(F.col(text_col))
        grams = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
        cols = [F.col(id_col)] if keep_id else []
        return frame.select(*cols, F.explode(grams).alias("gram"))

    bench_grams = gramize(bench, keep_id=False).distinct()
    doc_grams = gramize(df, keep_id=True)
    hits = (
        doc_grams.join(broadcast(bench_grams), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    totals = df.select(
        F.col(id_col),
        F.size(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size(_tokens(F.col(text_col))) - (n - 1), F.lit(0)),
                    ),
                    lambda i: F.array_join(F.slice(_tokens(F.col(text_col)), i, n), " "),
                )
            )
        ).alias("n_grams_distinct"),
    )
    out = (
        totals.join(hits, id_col, "left")
        .withColumn("n_contaminated", F.coalesce(F.col("n_contaminated"), F.lit(0)))
        .withColumn(
            "contamination_ratio",
            F.col("n_contaminated").cast("double")
            / F.greatest(F.col("n_grams_distinct"), F.lit(1)).cast("double"),
        )
    )
    return out


# -- normalization / URL structure -------------------------------------------


def text_normalize(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Canonical text form for dedup keys and downstream filters:
    lowercase, control characters stripped, whitespace runs collapsed to
    single spaces, trimmed. A chain of codegen'd ``regexp_replace`` —
    scan throughput, no Python. (Unicode NFC is intentionally NOT done
    here: Spark has no built-in normalizer, and a pandas-UDF hop is only
    worth it for corpora where composed/decomposed forms actually mix —
    gate that variant behind the multimodal/pandas tier if needed.)
    Patterns stay in the Java-regex/RE2 common subset so the DuckDB test
    oracle runs the same strings."""
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    return df.withColumn(out_col, c)


# URL shape in the Java/RE2 common subset: scheme + host + optional path.
URL_PATTERN = r"https?://[0-9A-Za-z.-]+(?:/[0-9A-Za-z._~%/+&#?=-]*)?"
_DOMAIN_FROM_URL = r"https?://([0-9A-Za-z.-]+)"


def url_extract(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per URL occurrence: (id, url, domain). The corpus-side
    building block for domain-level filtering/weighting (blocklists,
    per-domain caps, source mixing). regexp_extract_all + explode — the
    text never shuffles, only the (id, url) pairs that matched."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    return (
        df.select(F.col(id_col), F.explode(urls).alias("url"))
        .withColumn("domain", F.regexp_extract(F.col("url"), _DOMAIN_FROM_URL, 1))
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 100,
) -> DataFrame:
    """Corpus vocabulary statistics: term frequency and document
    frequency per token, top ``top_n`` by tf (token asc tie-break —
    fully deterministic). The first step of tokenizer/vocab training and
    of idf-weighted quality filters.

    Scale shape: explode emits (id, token) pairs; one groupBy(token)
    with map-side partial aggregation covers tf, and df rides the same
    shuffle via count(DISTINCT id) (Catalyst expands it to a two-stage
    distinct-then-count keyed on token — no second scan). The final
    top-n is a TakeOrdered over the (much smaller) vocabulary, not a
    global sort of the corpus."""
    ex = df.select(
        F.col(id_col).alias("__id"), F.explode(_tokens(F.col(text_col))).alias("token")
    )
    return (
        ex.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("__id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(top_n)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 64,
) -> DataFrame:
    """Token-window chunking with overlap — the standard pre-training /
    RAG preparation step: each document becomes ceil(n/step) chunks of
    up to ``chunk_tokens`` whitespace tokens, consecutive chunks sharing
    ``overlap`` tokens. Deterministic and entirely JVM-side (split +
    sequence + explode + slice — no Python worker), so throughput is
    scan-bound and the op composes with the samplers/dedup tier at any
    scale. Zero-token documents produce zero chunks.

    Output: <id_col>, chunk_id (0-based), start_token, n_tokens,
    chunk_text.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    base = df.select(
        F.col(id_col), toks.alias("__toks")
    ).withColumn("__n", F.size("__toks")).filter(F.col("__n") > 0)
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(step)
    )
    ex = base.withColumn("start_token", F.explode(starts))
    return ex.select(
        id_col,
        (F.col("start_token") / step).cast("int").alias("chunk_id"),
        "start_token",
        F.least(
            F.lit(chunk_tokens), F.col("__n") - F.col("start_token")
        ).alias("n_tokens"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("start_token") + 1, chunk_tokens),
            " ",
        ).alias("chunk_text"),
    )


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 2048,
    buckets: int | None = None,
) -> DataFrame:
    """Concat-and-chunk SEQUENCE PACKING — the GPT-style pretraining
    batching step: documents are (logically) concatenated in ``id_col``
    order and the token stream is cut every ``max_len`` tokens; each
    output row says which token span of which document lands in which
    pack. Deterministic and layout-independent: the global token offset
    of every document is a two-phase distributed prefix sum
    (range-repartition by id -> per-partition window cumsum -> tiny
    per-partition totals to the driver -> broadcast offsets back), so
    no single partition ever holds the corpus and driver state is one
    row per partition — the same carry pattern as the as-of join's
    hot-group split. Everything else is JVM sequence+explode.

    Output: <id_col>, n_tokens (the doc's), pack_id (0-based),
    tok_start / tok_end (span WITHIN the doc, end-exclusive). A
    document spanning a pack boundary emits one row per pack it
    touches; zero-token documents emit nothing.
    """
    if max_len <= 0:
        raise ValueError("max_len must be positive")
    spark = df.sparkSession
    n_b = buckets or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    t = df.select(
        F.col(id_col),
        F.size(_tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    g = global_prefix_sum(
        t, [id_col], "n_tokens", out_col="_start", buckets=n_b
    ).where(F.col("n_tokens") > 0)
    L = F.lit(int(max_len)).cast("long")
    packs = F.sequence(
        (F.col("_start") / L).cast("long"),
        ((F.col("_start") + F.col("n_tokens") - 1) / L).cast("long"),
    )
    ex = g.withColumn("pack_id", F.explode(packs))
    return ex.select(
        id_col,
        "n_tokens",
        "pack_id",
        F.greatest(
            F.col("pack_id") * L - F.col("_start"), F.lit(0).cast("long")
        ).alias("tok_start"),
        F.least(
            (F.col("pack_id") + 1) * L - F.col("_start"),
            F.col("n_tokens"),
        ).alias("tok_end"),
    )
