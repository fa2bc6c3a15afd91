"""Exact duplicated-span detection across documents (substring-level
dedup), the relational re-expression of suffix-array training-data dedup
("Deduplicating Training Data Makes Language Models Better", Lee et al.
2022 — arXiv:2107.06499).

A suffix array is inherently a single-address-space structure; the
100 TB-friendly equivalent is k-gram seeding + diagonal run merging,
entirely in Catalyst-optimizable DataFrame ops:

1. tokenize each document (shared ``_tokens`` regex — pure JVM);
2. fingerprint every word k-gram *position* with ``xxhash64`` (8-byte
   join key instead of the gram text — the shuffle carries
   (id, pos, fp) only);
3. prune fingerprints that cannot seed a cross-doc span: global count
   must be >= 2, and hyper-frequent boilerplate grams above
   ``max_gram_freq`` are dropped (the same guard suffix-dedup
   implementations apply to degenerate repeats — otherwise one viral
   gram contributes count^2 join rows);
4. self-join the surviving seed positions on the fingerprint
   (``id_a < id_b``: cross-document, each pair once);
5. merge seeds lying on the same (pair, pos_a - pos_b) diagonal with a
   gaps-and-islands window: consecutive pos_a runs collapse to one
   maximal span — exactly the maximal duplicated substring the suffix
   array would report, length = run + k - 1 tokens;
6. optional exact verification: join the token arrays back and compare
   the actual slices (drops astronomically-unlikely xxhash64 collisions;
   disable at extreme scale to keep the pair path id-only).

No reference parity — the reference has no substring dedup; this is the
extension tier (BASELINE.json north star).

Scale notes: the only shuffles are the fingerprint count (partial-agg
groupBy), the seed self-join, and the per-pair window; all are keyed by
fingerprint / pair and skew-bounded by ``max_gram_freq``. No driver
state, no collects.

r16 perf: the gram stream (id, pos, fp) is materialized ONCE with an
eager localCheckpoint before fan-out — without it the physical plan
re-ran tokenize 6x and the posexplode+xxhash64 gram derivation 4x (the
eligibility aggregate AND the seed pool were each embedded twice, once
per self-join side; measured plan: 6 parquet scans, 4 Generate nodes).
The checkpointed frame is three narrow longs per token position —
O(corpus tokens) rows but a small constant per row; the executor-local
blocks are freed by the ContextCleaner when the query ends. Like the
engine's other localCheckpoint sites this trades executor-loss
fault-tolerance (job retry instead of lineage recompute) for not
re-reading the corpus — acceptable for a deterministic batch job; a
reliable ``spark.checkpoint.dir``-backed checkpoint restores lineage
durability for long-lived cluster deployments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sclera_spark.llm.text import _tokens


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_span: int | None = None,
    max_gram_freq: int = 1000,
    verify: bool = True,
) -> DataFrame:
    """Maximal duplicated word spans (>= ``k`` tokens) across documents.

    Returns (id_a, id_b, start_a, start_b, span_len): 1-based token
    offsets of a run of ``span_len`` identical tokens appearing in both
    documents. ``min_span`` filters short spans (default: keep all, i.e.
    >= k). ``max_gram_freq`` caps how often a seed gram may occur
    globally before it is treated as boilerplate and skipped.
    """
    min_span = min_span or k

    base = df.select(
        F.col(id_col).alias("__id"), _tokens(F.col(text_col)).alias("__t")
    ).filter(F.size("__t") >= k)

    # one fingerprint per k-gram position, 1-based (posexplode yields the
    # 0-based index into the fingerprint array; +1 realigns with the SQL
    # oracle's generate_series(1, ...))
    grams = (
        base.select(
            "__id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - (k - 1)),
                    lambda i: F.xxhash64(
                        F.concat_ws("\x1f", F.slice("__t", i, k))
                    ),
                )
            ).alias("__p0", "__fp"),
        )
        .select("__id", (F.col("__p0") + 1).alias("__pos"), "__fp")
        # materialize ONCE: grams feeds the eligibility aggregate and
        # BOTH sides of the seed self-join — without this the
        # tokenize+posexplode+xxhash64 subtree executes 4x (and the
        # source is scanned 6x); see module docstring (r16)
        .localCheckpoint(eager=True)
    )

    # seed eligibility: the count prunes the (majority) singleton grams
    # before the join; the cap bounds join fan-out on boilerplate
    elig = (
        grams.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter((F.col("__n") >= 2) & (F.col("__n") <= max_gram_freq))
        .select("__fp")
    )
    seeds_pool = grams.join(elig, "__fp")

    a = seeds_pool.select(
        F.col("__fp"), F.col("__id").alias("id_a"), F.col("__pos").alias("pos_a")
    )
    b = seeds_pool.select(
        F.col("__fp"), F.col("__id").alias("id_b"), F.col("__pos").alias("pos_b")
    )
    seeds = a.join(b, "__fp").where(F.col("id_a") < F.col("id_b"))

    # diagonal gaps-and-islands: within one (pair, diagonal), consecutive
    # pos_a values are one maximal span (pos_b is determined by the
    # diagonal, so the run is unique)
    diag = (F.col("pos_a") - F.col("pos_b")).alias("__diag")
    w = Window.partitionBy("id_a", "id_b", "__diag").orderBy("pos_a")
    isl = seeds.select("id_a", "id_b", "pos_a", "pos_b", diag).withColumn(
        "__grp", F.col("pos_a") - F.row_number().over(w)
    )
    spans = (
        isl.groupBy("id_a", "id_b", "__diag", "__grp")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.max("pos_a") - F.min("pos_a") + k).alias("span_len"),
        )
        .drop("__diag", "__grp")
        .filter(F.col("span_len") >= min_span)
    )

    if verify:
        ta = base.select(F.col("__id").alias("id_a"), F.col("__t").alias("__ta"))
        tb = base.select(F.col("__id").alias("id_b"), F.col("__t").alias("__tb"))
        spans = (
            spans.join(ta, "id_a")
            # project the a-side slice IMMEDIATELY so the second join
            # carries span_len tokens per span instead of the full
            # document array (the full __ta otherwise shuffles by id_b
            # when tb is too big to broadcast) — same slices, same
            # equality filter, only the projection moved earlier (r16)
            .withColumn(
                "__sa", F.slice("__ta", F.col("start_a"), F.col("span_len"))
            )
            .drop("__ta")
            .join(tb, "id_b")
            .filter(
                F.col("__sa")
                == F.slice("__tb", F.col("start_b"), F.col("span_len"))
            )
            .drop("__tb", "__sa")
        )

    return spans.select("id_a", "id_b", "start_a", "start_b", "span_len")


def span_dedup_mask(
    spans: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    min_span: int = 50,
) -> DataFrame:
    """Survivor mask from a span report: drop the *higher-id* document of
    any pair sharing a span of >= ``min_span`` tokens (the Lee et al.
    policy of removing one copy of long duplicated text, applied at
    document granularity). Pure joins — no driver state."""
    losers = (
        spans.filter(F.col("span_len") >= min_span)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return docs.join(losers, id_col, "left_anti")
