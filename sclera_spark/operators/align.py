"""ALIGN — DTW-style alignment of two ordered streams.

Reference semantics (modules/core/src/main/scala/sql/exec/relational/
AlignTableResult.scala:34-123):

- Inputs: two ordered streams A, B; a distance expression evaluated on the
  concatenated (a-row, b-row) pair; optional MARGIN m bounding lead/lag.
- Fast path: constant distance or MARGIN 0 -> positional zip of the rows.
- General path: let n = min(|A|, |B|); align the length-n *suffixes* of A
  and B (the reference folds over reversed vectors) with the classic DTW
  recurrence D(i,j) = c(i,j) + min(D(i-1,j-1), D(i-1,j), D(i,j-1)),
  restricted to the Sakoe-Chiba band |i-j| <= margin, where
  margin = clamp(|m|, 1, n-1) (n-1 when no margin given).
- Output: the optimal warping path's (a-row, b-row) pairs, in forward
  stream order; columns = A's columns ++ B's columns.

Spark lowering: the DP is inherently sequential per aligned pair of
sequences. Dispatch is side-tagged union -> repartition by key ->
mapInPandas with an in-pandas groupby (the same shape as the MATCH
operator): one Arrow exchange serves every key in a partition, instead
of the per-key cogroup round-trip that dominated wall time with many
small groups (~20 ms/key; 1500 keys at sf0.1 was ~30 s of pure
dispatch). With partition keys, alignment distributes; without keys both
streams collapse to a single group — same asymptotics as the reference's
single thread, but vectorized.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_KEY = "__align_key"


def make_partition_aligner(keys: list, align_group: Callable, out_cols: list):
    """The mapInPandas partition processor for ALIGN: input arrives
    group-contiguous (sortWithinPartitions on the keys), each Arrow chunk
    is segmented by group boundary, every CLOSED group's DP runs and its
    output is emitted eagerly, and only the one OPEN group (the chunk's
    tail, which the next chunk may continue) stays resident.

    Same shape as the r12 MATCH fix (match/matcher.py
    make_partition_matcher): the resident-row bound per task is the
    LARGEST SINGLE GROUP, not the sum of all groups hashed to the task —
    the DTW DP genuinely needs one group's two full sequences, so that is
    the floor. Module-level so tests can drive it with synthetic chunk
    streams and assert the memory bound (test_match_align.py).

    ``align_group(group_pdf)`` takes one complete group's rows (both
    sides, mixed) and returns the aligned output frame or None.
    """

    def _run(batches):
        state: dict = {"frames": [], "key": None}

        def _close():
            frames = state["frames"]
            state["frames"] = []
            state["key"] = None
            if not frames:
                return None
            g = (
                pd.concat(frames, ignore_index=True)
                if len(frames) > 1
                else frames[0]
            )
            return align_group(g)

        def _norm_key(pdf, row):
            return tuple(
                None if pd.isna(v) else v for v in pdf[keys].iloc[row]
            )

        for chunk in batches:
            pdf = chunk.reset_index(drop=True)
            n = len(pdf)
            if n == 0:
                continue
            if keys:
                kf = pdf[keys].astype(object)
                shifted = kf.shift()
                # null-safe inequality: NaN == NaN for grouping (the
                # reference groups SqlNull partition values together)
                change = (
                    (kf.ne(shifted) & ~(kf.isna() & shifted.isna()))
                    .any(axis=1)
                    .to_numpy()
                )
                change[0] = True
                starts = np.flatnonzero(change)
            else:
                starts = np.array([0])
            ends = np.append(starts[1:], n)
            seg0 = 0
            if state["key"] is not None:
                first_key = _norm_key(pdf, 0) if keys else ()
                if first_key == state["key"]:
                    state["frames"].append(pdf.iloc[: ends[0]])
                    if len(starts) == 1:
                        continue  # chunk is entirely the open group
                    out = _close()
                    if out is not None:
                        yield out
                    seg0 = 1
                else:
                    out = _close()
                    if out is not None:
                        yield out
            # closed groups fully inside this chunk
            for gs, ge in zip(starts[seg0:-1], ends[seg0:-1]):
                out = align_group(pdf.iloc[gs:ge].reset_index(drop=True))
                if out is not None:
                    yield out
            # the chunk's last group stays open
            gs = starts[-1]
            if gs != 0 or state["key"] is None:
                state["frames"] = [pdf.iloc[gs:].reset_index(drop=True)]
            state["key"] = _norm_key(pdf, gs) if keys else ()
        out = _close()
        if out is not None:
            yield out

    return _run


def _dtw_pairs(
    na: int, nb: int, cost: Callable[[np.ndarray, np.ndarray], np.ndarray], margin: int | None
) -> tuple[np.ndarray, np.ndarray]:
    """Run the reference's banded DTW over the reversed length-n suffixes;
    return (a_idx, b_idx) index arrays of the optimal path in forward order.

    ``cost(ai, bi)`` takes integer index arrays into the ORIGINAL (forward)
    sequences and returns the per-pair distances.
    """
    n = min(na, nb)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    m = max(1, min(abs(margin), n - 1)) if margin is not None else max(1, n - 1)

    # reversed-suffix index r -> original index: a: na-1-r, b: nb-1-r
    def orig_a(r: np.ndarray) -> np.ndarray:
        return na - 1 - r

    def orig_b(r: np.ndarray) -> np.ndarray:
        return nb - 1 - r

    INF = np.inf
    # enumerate every band cell up front and evaluate ALL costs in one
    # cost() call — per-row callbacks dominated wall time when groups are
    # small (each call slices pandas frames)
    rows_i = np.arange(n)
    starts = np.maximum(0, rows_i - m)
    ends = np.minimum(n - 1, rows_i + m)
    lens = ends - starts + 1
    off = np.concatenate(([0], np.cumsum(lens)))
    I = np.repeat(rows_i, lens)
    J = np.arange(off[-1]) - off[I] + starts[I]
    C = np.asarray(cost(orig_a(I), orig_b(J)), dtype=np.float64)

    # D over band cells; band width 2m+1, row offset k = j - i + m in
    # [0, 2m]. Out-of-band/out-of-range cells stay INF (never written),
    # so shifted reads of the previous row self-handle the boundaries.
    D = np.full((n, 2 * m + 1), INF, dtype=np.float64)

    # one fully-vectorized update per band row (the per-cell Python loop
    # here was the slowest surviving Python path at scale):
    #   t_j = min(D(i-1, j-1), D(i-1, j))          shifted-array minima
    #   d_j = c_j + min(t_j, d_{j-1})              in-row left-move scan
    # The scan unrolls to d_j = min_{k<=j} (t_k + sum_{u=k..j} c_u)
    #                         = S_j + cummin_{k<=j}(t_k - S_{k-1}),
    # i.e. one cumsum + one cumulative min (S = prefix sums of c).
    for i in range(n):
        j_lo = starts[i]
        ci = C[off[i] : off[i + 1]]
        ks_lo = j_lo - i + m
        ks = slice(ks_lo, ks_lo + len(ci))
        S = np.cumsum(ci)
        if i == 0:
            # only left-moves exist in row 0: plain running sum
            D[0, ks] = S
            continue
        prev = D[i - 1]
        diag = prev[ks]  # (i-1, j-1) sits at the SAME offset one row up
        up = np.append(prev, INF)[ks_lo + 1 : ks_lo + 1 + len(ci)]  # (i-1, j)
        t = np.minimum(diag, up)
        D[i, ks] = S + np.minimum.accumulate(t - np.concatenate(([0.0], S[:-1])))

    # trace back from (n-1, n-1); picking argmin over the three stored
    # predecessors reproduces the forward pass's diag > up > left
    # tie-breaking without materializing a predecessor matrix
    def get(i: int, j: int) -> float:
        if i < 0 or j < 0 or abs(i - j) > m or i >= n or j >= n:
            return INF
        return D[i, j - i + m]

    path = []
    i = j = n - 1
    while True:
        path.append((i, j))
        if i == 0 and j == 0:
            break
        k = int(np.argmin((get(i - 1, j - 1), get(i - 1, j), get(i, j - 1))))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    # path is reversed-space from (n-1,n-1) down to (0,0); reversed index
    # n-1 maps to the first row of the suffix, so path order as collected
    # (high r -> low r reversed) ... convert to original forward order:
    ri = np.array([p[0] for p in path])
    rj = np.array([p[1] for p in path])
    ai, bi = orig_a(ri), orig_b(rj)
    order = np.argsort(ai + bi, kind="stable")
    return ai[order], bi[order]


def align(
    df_a: DataFrame,
    df_b: DataFrame,
    dist: Callable[[pd.DataFrame, pd.DataFrame], np.ndarray],
    margin: int | None = None,
    order_by_a: Sequence[str] = (),
    order_by_b: Sequence[str] = (),
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """ALIGN df_a WITH df_b ON dist [MARGIN margin].

    ``dist(pa, pb)`` receives two equal-length pandas frames (the candidate
    a-rows and b-rows, positionally paired) and returns per-pair distances.
    Column-name collisions between the two sides must be resolved by the
    caller (the reference's normalizer does the same via renaming).
    """
    overlap = set(df_a.columns) & set(df_b.columns) - set(partition_by)
    if overlap:
        raise ValueError(f"ALIGN requires disjoint column names; clash: {sorted(overlap)}")

    p = list(partition_by)
    a_cols = [c for c in df_a.columns if c not in p]
    b_cols = [c for c in df_b.columns if c not in p]
    if not p:
        df_a = df_a.withColumn(_KEY, F.lit(1))
        df_b = df_b.withColumn(_KEY, F.lit(1))
        p = [_KEY]

    out_fields = [df_a.schema[c] for c in df_a.columns if c != _KEY] + [
        df_b.schema[c] for c in b_cols
    ]
    out_schema = StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    oa, ob = list(order_by_a), list(order_by_b)

    def _sorted(pdf: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        # np.lexsort is ~10x pandas sort_values on the small frames this
        # operator typically sees (one per key); stable, last key primary
        order = np.lexsort([pdf[k].to_numpy() for k in reversed(keys)])
        return pdf.take(order)

    def _align_group(pa: pd.DataFrame, pb: pd.DataFrame) -> pd.DataFrame | None:
        if len(pa) == 0 or len(pb) == 0:
            return None
        if oa:
            pa = _sorted(pa, oa)
        if ob:
            pb = _sorted(pb, ob)
        pa = pa.reset_index(drop=True)
        pb = pb.reset_index(drop=True)

        def cost(ai: np.ndarray, bi: np.ndarray) -> np.ndarray:
            return np.asarray(
                dist(
                    pa.take(ai).reset_index(drop=True),
                    pb.take(bi).reset_index(drop=True),
                ),
                dtype=np.float64,
            )

        ai, bi = _dtw_pairs(len(pa), len(pb), cost, margin)
        left = pa.take(ai).reset_index(drop=True)
        right = pb.take(bi).reset_index(drop=True)[b_cols]
        out = pd.concat([left, right], axis=1)
        return out[out_cols]

    # side-tagged union so ONE Arrow exchange carries every key of a
    # partition (per-key cogroup cost dominated with many small groups);
    # each side's missing columns are null-padded with the other side's
    # Spark types, and sliced back off before the DP
    side = "__align_side"
    a_keyed = df_a.columns  # keys + a_cols (+ synthetic key)
    b_keyed = df_b.columns
    ta = df_a.select(
        *[F.col(c) for c in a_keyed],
        F.lit(0).alias(side),
        *[F.lit(None).cast(df_b.schema[c].dataType).alias(c) for c in b_cols],
    )
    tb = df_b.select(
        *[F.col(c) for c in p],
        F.lit(1).alias(side),
        *[F.lit(None).cast(df_a.schema[c].dataType).alias(c) for c in a_cols],
        *[F.col(c) for c in b_cols],
    )
    from sclera_spark.scale import keyed_repartition

    # sortWithinPartitions makes groups CONTIGUOUS so the chunked
    # processor can cut each completed group eagerly (r13: the old path
    # concatenated the whole Spark partition into one pandas frame —
    # many large groups hashed to one task were ALL resident at once;
    # the DP only needs one group's two sequences at a time)
    arranged = keyed_repartition(ta.unionByName(tb), p).sortWithinPartitions(*p)
    keys = list(p)

    def _group(g: pd.DataFrame) -> pd.DataFrame | None:
        pa = g.loc[g[side] == 0, list(a_keyed)]
        pb = g.loc[g[side] == 1, list(b_keyed)]
        return _align_group(pa, pb)

    _run = make_partition_aligner(keys, _group, out_cols)
    return arranged.mapInPandas(_run, schema=out_schema)


def align_zip(df_a: DataFrame, df_b: DataFrame, order_by_a, order_by_b, partition_by=()) -> DataFrame:
    """ALIGN fast path (constant distance / MARGIN 0): positional zip
    (reference AlignTableResult.scala:70-74). Lowered to a row_number join —
    pure DataFrame ops, no pandas."""
    from pyspark.sql import Window

    p = list(partition_by)
    wa = (Window.partitionBy(*p) if p else Window.partitionBy()).orderBy(*order_by_a)
    wb = (Window.partitionBy(*p) if p else Window.partitionBy()).orderBy(*order_by_b)
    a = df_a.withColumn("__rn", F.row_number().over(wa))
    b = df_b.withColumn("__rn", F.row_number().over(wb))
    return a.join(b, on=p + ["__rn"], how="inner").drop("__rn")
