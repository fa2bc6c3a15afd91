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
    """
    nfa = compile_pattern(pattern)
    lab_col = labeler.label_col(df)
    src = df.withColumn(_LABELS, lab_col)

    out_schema = StructType(
        [f for f in df.schema.fields]
    ).add(MATCH_ID, LongType()).add(MATCH_LABEL, StringType())

    p = list(partition_by)
    o = list(order_by)
    in_cols = list(df.columns)

    def _match_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(o, kind="mergesort").reset_index(drop=True)
        labels = [frozenset(x) if x is not None else frozenset() for x in pdf[_LABELS]]
        spans = find_matches(nfa, labels)
        if not spans:
            return pdf.iloc[0:0][in_cols].assign(
                **{MATCH_ID: pd.Series(dtype="int64"), MATCH_LABEL: pd.Series(dtype="object")}
            )
        idx, mids = [], []
        for mid, (s, e) in enumerate(spans):
            idx.extend(range(s, e))
            mids.extend([mid] * (e - s))
        out = pdf.iloc[idx][in_cols].copy()
        out[MATCH_ID] = pd.Series(mids, index=out.index, dtype="int64")
        # matched label: the single label of the row that is in the NFA's
        # alphabet; for multi-label rows pick the first alphabet label
        alphabet = set(nfa.labels)
        out[MATCH_LABEL] = [
            next((l for l in sorted(labels[i]) if l in alphabet), None) for i in idx
        ]
        return out

    if p:
        return src.groupBy(*p).applyInPandas(lambda _, g: _match_group(g), out_schema)
    return (
        src.coalesce(1)
        .groupBy(F.lit(1))
        .applyInPandas(lambda _, g: _match_group(g), out_schema)
    )


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
