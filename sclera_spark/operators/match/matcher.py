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
    _match_partition = make_partition_matcher(
        matcher, p, in_cols, is_single
    )

    if p:
        from sclera_spark.scale import keyed_repartition

        arranged = keyed_repartition(src, p).sortWithinPartitions(*p, *o)
    else:
        from sclera_spark.scale import warn_unpartitioned

        warn_unpartitioned("MATCH", "pass partition_by (PARTITION BY in SQL)")
        arranged = src.coalesce(1).sortWithinPartitions(*o)
    return arranged.mapInPandas(_match_partition, out_schema)


# Resident-row bound per partition GROUP (r12): a pathological single
# key (100M rows hashed to one worker) used to be concatenated into ONE
# pandas frame. The chunked processor below keeps only the current
# group's OPEN tail (rows a future chunk could still join into a match)
# plus one Arrow batch resident; when an open attempt alone exceeds
# this cap it is settled in place — same bound and same documented
# divergence as the streaming stateful MATCH (streaming/ops.py
# max_attempt_rows): a true match longer than the cap is emitted as
# cap-sized pieces, an accept-less attempt longer than the cap is
# abandoned. Tests lower it to force the path.
MAX_ATTEMPT_ROWS = 1_000_000


def make_partition_matcher(
    matcher, p: list, in_cols: list, is_single: bool,
    max_attempt_rows: int = MAX_ATTEMPT_ROWS,
):
    """The mapInPandas partition processor: all groups whose keys hash
    here, boundaries found vectorized, ONE Python call per partition
    (per-group Arrow/invoke overhead measured 3x the matching cost).
    Chunked and memory-bounded: each Arrow batch is segmented by group,
    completed segments run the vectorized NFA scan immediately, and
    only the open tail of the current group carries over
    (regex_nfa.CompiledMatcher.scan_open withholds the one attempt a
    future chunk could extend). Module-level so tests can drive it
    directly with synthetic chunk streams and assert the memory
    bound."""
    import numpy as np

    def _labels_of(pdf):
        raw = pdf[_LABELS]
        return list(raw) if is_single else [
            frozenset(x) if x is not None else frozenset() for x in raw
        ]

    def _match_partition(batches):
        state = {
            "frames": [],   # open-tail row frames of the current group
            "labels": [],   # their labels
            "mid": 0,       # next match_id within the current group
            "key": None,    # current group key (None-normalized tuple)
            "dead": False,  # anchored-begin: first attempt settled
        }

        def _emit(buf_pdf, spans):
            idx_parts, mid_parts, path_labels = [], [], []
            for s, e, lab_path in spans:
                idx_parts.append(np.arange(s, e))
                mid_parts.append(
                    np.full(e - s, state["mid"], dtype=np.int64)
                )
                path_labels.extend(lab_path)
                state["mid"] += 1
            if not idx_parts:
                return None
            out = buf_pdf.take(np.concatenate(idx_parts))[in_cols]
            out[MATCH_ID] = np.concatenate(mid_parts)
            # the label under which each row ACTUALLY matched —
            # recovered from an accepting NFA path (matters for
            # multi-label rows, where any fixed per-row choice can
            # disagree with the path the regex took)
            out[MATCH_LABEL] = path_labels
            return out

        def _feed(seg_pdf, seg_labels, at_end):
            """Advance the current group by one segment; yields output
            frames. Keeps only the open tail resident afterwards."""
            if state["dead"]:
                if at_end:
                    state["frames"], state["labels"] = [], []
                return
            frames = state["frames"] + (
                [seg_pdf] if len(seg_pdf) else []
            )
            if not frames:
                return
            buf = (
                pd.concat(frames, ignore_index=True)
                if len(frames) > 1
                else frames[0].reset_index(drop=True)
            )
            labels = state["labels"] + seg_labels
            if at_end:
                spans = matcher.find_matches_with_paths(labels)
                open_start = None
            else:
                spans, open_start = matcher.scan_open(labels)
            out = _emit(buf, spans)
            if out is not None:
                yield out
            if at_end:
                state["frames"], state["labels"] = [], []
                return
            if open_start is None:
                state["frames"], state["labels"] = [], []
                if matcher.nfa.anchored_begin:
                    state["dead"] = True
                return
            if len(labels) - open_start >= max_attempt_rows:
                # over-cap open attempt: settle it in place (streaming
                # max_attempt_rows semantics — a longer-than-cap match
                # splits, an accept-less one is abandoned)
                spans2 = matcher.find_matches_with_paths(
                    labels[open_start:]
                )
                tail = buf.iloc[open_start:].reset_index(drop=True)
                out2 = _emit(tail, spans2)
                if out2 is not None:
                    yield out2
                state["frames"], state["labels"] = [], []
                if matcher.nfa.anchored_begin:
                    state["dead"] = True
                return
            state["frames"] = [
                buf.iloc[open_start:].reset_index(drop=True)
            ]
            state["labels"] = labels[open_start:]

        def _norm_key(pdf, row):
            return tuple(
                None if pd.isna(v) else v for v in pdf[p].iloc[row]
            )

        for chunk in batches:
            pdf = chunk.reset_index(drop=True)
            n = len(pdf)
            if n == 0:
                continue
            labels = _labels_of(pdf)
            if p:
                keys = pdf[p].astype(object)
                shifted = keys.shift()
                # null-safe inequality: NaN == NaN for grouping (the
                # reference groups SqlNull partition values together)
                change = (
                    (keys.ne(shifted) & ~(keys.isna() & shifted.isna()))
                    .any(axis=1)
                    .to_numpy()
                )
                change[0] = True
                starts = np.flatnonzero(change)
            else:
                starts = np.array([0])
            ends = np.append(starts[1:], n)
            first_key = _norm_key(pdf, 0) if p else ()
            seg0 = 0
            if state["key"] is not None:
                if first_key == state["key"]:
                    # the carry continues into this chunk's first group
                    if len(starts) > 1:
                        # ... and that group CLOSES here: one whole-
                        # group vectorized scan over carry + segment
                        yield from _feed(
                            pdf.iloc[: ends[0]], labels[: ends[0]],
                            at_end=True,
                        )
                        state["key"] = None
                        state["mid"] = 0
                        state["dead"] = False
                        seg0 = 1
                    else:
                        # chunk is entirely this group: stay open
                        yield from _feed(pdf, labels, at_end=False)
                        continue
                else:
                    yield from _feed(pdf.iloc[0:0], [], at_end=True)
                    state["key"] = None
                    state["mid"] = 0
                    state["dead"] = False
            # CLOSED groups inside this chunk (all but the last): the
            # original one-pass vectorized path — per-group spans, ONE
            # np.take, ONE output frame per chunk (per-group frames
            # measured 3x the matching cost on many-small-key inputs)
            idx_parts: list[np.ndarray] = []
            mid_parts: list[np.ndarray] = []
            path_labels: list[str] = []
            for gs, ge in zip(starts[seg0:-1], ends[seg0:-1]):
                spans = matcher.find_matches_with_paths(labels[gs:ge])
                for mid, (s, e, lab_path) in enumerate(spans):
                    idx_parts.append(np.arange(gs + s, gs + e))
                    mid_parts.append(
                        np.full(e - s, mid, dtype=np.int64)
                    )
                    path_labels.extend(lab_path)
            if idx_parts:
                out = pdf.take(np.concatenate(idx_parts))[in_cols]
                out[MATCH_ID] = np.concatenate(mid_parts)
                out[MATCH_LABEL] = path_labels
                yield out
            # the chunk's LAST group stays open (the next chunk may
            # continue it) — stateful feed with the memory bound. It is
            # always a FRESH group at this point (a carry-continuing
            # chunk either closed above or `continue`d), so the match
            # counter restarts.
            gs, ge = starts[-1], ends[-1]
            state["key"] = _norm_key(pdf, gs) if p else ()
            state["mid"] = 0
            state["dead"] = False
            yield from _feed(
                pdf.iloc[gs:ge].reset_index(drop=True),
                labels[gs:ge],
                at_end=False,
            )
        if state["key"] is not None or state["frames"]:
            yield from _feed(pd.DataFrame(columns=in_cols + [_LABELS]), [], at_end=True)

    return _match_partition


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
