"""MATCH — regex row-sequence matching over ordered partitions.

Reference surface: `<input> MATCH 'regex' ON <labeler> [PARTITION BY cols]`
(parser modules/core/src/main/scala/sql/parser/SqlQueryParser.scala:225-256;
expr analytics/sequence/matcher/expr/Match.scala:31-75). The reference
compiles the regex to a Glushkov NFA and delegates matching to the
NFAMATCHER plugin service; matched row sequences feed per-label sequence
aggregates (SeqAggregate.scala).

Spark-first decomposition — the key design choice here:

  1. labeling       -> native `when()`/array Column        (codegen, no UDF)
  2. NFA span walk  -> grouped-map pandas op per partition (the ONLY part
                       that genuinely needs sequential logic; emits
                       match_id + matched label per row)
  3. aggregation    -> native groupBy(partition, match_id) with conditional
                       per-label aggregates (hash agg, map-side partials)

So the sequential custom code touches each row once and everything
heavy (shuffles, aggregation) stays in Catalyst/Tungsten. At scale, work
distributes across partition keys; a single giant partition is the same
degenerate case the single-threaded reference always pays.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructType

from sclera_spark.operators.match.labeler import RowLabeler
from sclera_spark.operators.match.regex_nfa import compile_pattern, find_matches

MATCH_ID = "match_id"
MATCH_LABEL = "match_label"
_LABELS = "__labels"


def match_rows(
    df: DataFrame,
    pattern: str,
    labeler: RowLabeler,
    order_by: Sequence[str],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Return the matched rows: input columns + ``match_id`` (0-based per
    partition) + ``match_label`` (the label under which the row matched).
    Non-matching rows are dropped (greedy leftmost non-overlapping spans).

    Hot-path engineering: labels are computed JVM-side; single-label
    labelers ship one string column through Arrow (not array<string>);
    the NFA is bitmask-compiled (CompiledMatcher) so the per-row step is a
    few int ops; row emission uses numpy take, not pandas iloc loops.
    """
    import numpy as np

    from sclera_spark.operators.match.regex_nfa import CompiledMatcher

    nfa = compile_pattern(pattern)
    matcher = CompiledMatcher(nfa)
    single = labeler.single_label_col(df)
    lab_col = single if single is not None else labeler.label_col(df)
    src = df.withColumn(_LABELS, lab_col)

    out_schema = StructType(
        [f for f in df.schema.fields]
    ).add(MATCH_ID, LongType()).add(MATCH_LABEL, StringType())

    p = list(partition_by)
    o = list(order_by)
    in_cols = list(df.columns)
    is_single = single is not None

    def _match_partition(batches):
        """Process one (hash-partitioned, sorted) partition: all groups
        whose keys landed here, with group boundaries found vectorized.
        One Python call per PARTITION, not per group — with thousands of
        small partition keys the per-group Arrow/invoke overhead would
        dominate otherwise (measured 3x the actual matching cost)."""
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.reset_index(drop=True)
        raw = pdf[_LABELS]
        labels = list(raw) if is_single else [
            frozenset(x) if x is not None else frozenset() for x in raw
        ]
        n = len(pdf)
        # group boundaries over the sorted partition
        if p:
            keys = pdf[p].astype(object)
            shifted = keys.shift()
            # null-safe inequality: NaN == NaN for grouping (the reference
            # groups SqlNull partition values together too)
            change = (
                (keys.ne(shifted) & ~(keys.isna() & shifted.isna())).any(axis=1).to_numpy()
            )
            change[0] = True
            starts = np.flatnonzero(change)
        else:
            starts = np.array([0])
        ends = np.append(starts[1:], n)

        idx_parts: list[np.ndarray] = []
        mid_parts: list[np.ndarray] = []
        path_labels: list[str] = []
        for gs, ge in zip(starts, ends):
            spans = matcher.find_matches_with_paths(labels[gs:ge])
            for mid, (s, e, lab_path) in enumerate(spans):
                idx_parts.append(np.arange(gs + s, gs + e))
                mid_parts.append(np.full(e - s, mid, dtype=np.int64))
                path_labels.extend(lab_path)
        if not idx_parts:
            yield pdf.iloc[0:0][in_cols].assign(
                **{
                    MATCH_ID: pd.Series(dtype="int64"),
                    MATCH_LABEL: pd.Series(dtype="object"),
                }
            )
            return
        idx = np.concatenate(idx_parts)
        mids = np.concatenate(mid_parts)
        out = pdf.take(idx)[in_cols]
        out[MATCH_ID] = mids
        # the label under which each row ACTUALLY matched — recovered from
        # an accepting NFA path (matters for multi-label rows, where any
        # fixed per-row choice can disagree with the path the regex took)
        out[MATCH_LABEL] = path_labels
        yield out

    if p:
        from sclera_spark.scale import keyed_repartition

        arranged = keyed_repartition(src, p).sortWithinPartitions(*p, *o)
    else:
        from sclera_spark.scale import warn_unpartitioned

        warn_unpartitioned("MATCH", "pass partition_by (PARTITION BY in SQL)")
        arranged = src.coalesce(1).sortWithinPartitions(*o)
    return arranged.mapInPandas(_match_partition, out_schema)


def label_agg(label: str, agg_fn, col: Column) -> Column:
    """Label-scoped aggregate: ``A.avg(x)`` == avg(x) over rows matched as A
    (reference LabeledFunction, sql/expr/scalar/ScalOp.scala:149-154)."""
    return agg_fn(F.when(F.col(MATCH_LABEL) == label.upper(), col))


def match_aggregate(
    df: DataFrame,
    pattern: str,
    labeler: RowLabeler,
    order_by: Sequence[str],
    aggregates: dict[str, Column],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """One output row per match: partition cols + the given aggregate
    columns (use :func:`label_agg` for label-scoped ones). This is the
    `SELECT aggs ... MATCH 'regex' ...` surface."""
    matched = match_rows(df, pattern, labeler, order_by, partition_by)
    keys = list(partition_by) + [MATCH_ID]
    aggs = [c.alias(name) for name, c in aggregates.items()]
    return matched.groupBy(*keys).agg(*aggs)
