"""Structured Streaming tier.

The reference's "streaming" is bounded pull-iterator pipelining over
ordered tables (SURVEY.md §2.12 — no watermarks, no event-time windows,
no incremental state). This module is the Spark-native upgrade: the same
operator surface over `readStream` sources with real late-data handling.

- stateless ops (filter/project/scalar fns) work unchanged on streaming
  DataFrames — nothing to do;
- ordered-prefix aggregations become watermarked event-time window aggs;
- MATCH-style sequence detection becomes a per-key stateful operator via
  applyInPandasWithState (incremental NFA stepping — state is the NFA
  frontier + pending rows, NOT the whole partition history, so state size
  is O(band) per key and survives unbounded streams).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def stream_from_directory(
    spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet", **options
) -> DataFrame:
    """File-source stream (each new file = a micro-batch)."""
    reader = spark.readStream.schema(schema).format(fmt)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    watermark: str,
    window_duration: str,
    aggs: dict[str, Column],
    keys: Sequence[str] = (),
    slide: str | None = None,
) -> DataFrame:
    """Watermarked event-time window aggregation — the streaming analogue
    of the reference's ordered-stream group-by (RelOp.scala:152-167)."""
    wm = stream.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide) if slide else F.window(
        F.col(ts_col), window_duration
    )
    grouped = wm.groupBy(win.alias("win"), *[F.col(k) for k in keys])
    out = grouped.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def sessionize(
    stream: DataFrame,
    ts_col: str,
    watermark: str,
    gap: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Session windows (gap-based) — Spark's native session_window."""
    wm = stream.withWatermark(ts_col, watermark)
    grouped = wm.groupBy(
        F.session_window(F.col(ts_col), gap).alias("win"), *[F.col(k) for k in keys]
    )
    out = grouped.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        *keys,
        *aggs.keys(),
    )


def stream_match_state(
    stream: DataFrame,
    pattern: str,
    label_col: str,
    keys: Sequence[str],
    ts_col: str,
    out_schema: StructType,
    timeout: str = "NoTimeout",
):
    """Incremental MATCH over a keyed stream: per key, an NFA frontier is
    kept in GroupState; each micro-batch advances it over the new rows and
    emits one row per completed match (start/end timestamps + length).

    This is the unbounded-stream version of operators/match — the state is
    the in-progress match (frontier states + matched-row count), so memory
    is O(1) per key regardless of stream length. Caveat: rows must arrive
    in order per key (enforce upstream with a watermark + sort within the
    micro-batch, done here per batch).
    """
    from sclera_spark.operators.match.regex_nfa import compile_pattern

    nfa = compile_pattern(pattern)
    nxt, label_of, finish = nfa.next_map, nfa.label_of, nfa.finish

    def update(key, pdfs, state: GroupState):
        # state tuple: (frontier_states_csv, match_len, start_ts_epoch_us)
        if state.exists:
            frontier_csv, mlen, start_us = state.get
            frontier = set(int(x) for x in frontier_csv.split(",") if x != "")
        else:
            frontier, mlen, start_us = set(), 0, 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for r in pdf.itertuples(index=False):
                lab = str(getattr(r, label_col)).upper()
                ts = getattr(r, ts_col)
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if not frontier:
                    cand = {t for t in nxt[0] if label_of[t] == lab}
                    if cand:
                        frontier, mlen, start_us = cand, 1, ts_us
                    continue
                stepped = {t for s in frontier for t in nxt.get(s, ()) if label_of[t] == lab}
                if stepped:
                    frontier = stepped
                    mlen += 1
                    if stepped & finish:
                        out.append(
                            (
                                *key,
                                pd.Timestamp(start_us * 1000),
                                pd.Timestamp(ts_us * 1000),
                                mlen,
                            )
                        )
                        frontier, mlen, start_us = set(), 0, 0
                else:
                    # restart: maybe this row begins a new match
                    cand = {t for t in nxt[0] if label_of[t] == lab}
                    frontier, mlen, start_us = (cand, 1, ts_us) if cand else (set(), 0, 0)
        state.update((",".join(str(s) for s in sorted(frontier)), mlen, start_us))
        cols = [f.name for f in out_schema.fields]
        yield pd.DataFrame(out, columns=cols)

    return stream.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="frontier string, mlen int, start_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream_df: DataFrame, name: str, timeout_s: int = 60, output_mode: str = "append"
):
    """Test helper: run a streaming query into an in-memory sink until all
    available input is processed. Use output_mode='complete' for
    aggregations whose final windows would otherwise wait on watermark."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
