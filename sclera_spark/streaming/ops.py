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

import functools
import os
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


def _event_time(stream: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; newer Spark infers parquet timestamp
    columns as TIMESTAMP_NTZ, so normalize the event-time column first
    (no-op otherwise; session tz is UTC so the instant is unchanged)."""
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


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
    wm = _event_time(stream, ts_col).withWatermark(ts_col, watermark)
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
    wm = _event_time(stream, ts_col).withWatermark(ts_col, watermark)
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


def stream_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming exact dedup over ``keys`` — the ingest-side twin of the
    batch `dedup_exact` (llm/dedup.py): only the first arrival of each
    key survives. With ``ts_col``+``watermark`` the dedup state is
    dropped once keys age past the watermark (`dropDuplicatesWithinWatermark`),
    which is what keeps state bounded on an endless 100 TB ingest; without
    a watermark, state grows with distinct keys (exact, but bounded only
    by keyspace — opt in knowingly)."""
    if ts_col is not None and watermark is not None:
        wm = _event_time(stream, ts_col).withWatermark(ts_col, watermark)
        return wm.dropDuplicatesWithinWatermark(list(keys))
    return stream.dropDuplicates(list(keys))


def stream_quality_filter(
    stream: DataFrame,
    text_col: str,
    min_len: int = 50,
    max_len: int = 100_000,
    max_punct_ratio: float = 0.3,
    min_word_len: float = 2.0,
    max_word_len: float = 12.0,
) -> DataFrame:
    """Streaming document-quality gate: the batch `quality_scores`
    heuristics (llm/text.py) restated as a stateless row filter, so they
    compose with any watermark/sink. Pure JVM expressions — no Python in
    the stream path."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    avg_word = n_chars / F.greatest(n_words, F.lit(1))
    return stream.filter(
        (n_chars >= min_len)
        & (n_chars <= max_len)
        & (n_words > 0)
        & ((punct / F.greatest(n_chars, F.lit(1))) <= max_punct_ratio)
        & (avg_word >= min_word_len)
        & (avg_word <= max_word_len)
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    keys: Sequence[str],
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time interval condition: rows
    match when all ``keys`` are equal and ``right_ts`` falls in
    ``[left_ts + lower, left_ts + upper]``. Both sides carry watermarks —
    with a time-bounded condition Spark can expire join state once the
    watermark passes the bound, which is what keeps an endless x endless
    join's state finite (an unbounded-condition stream-stream join would
    accumulate forever). ``left_ts``/``right_ts`` must be distinct
    column names (rename before calling); key columns may share names —
    the join is expressed on equal names and de-duplicated."""
    lw = _event_time(left, left_ts).withWatermark(left_ts, watermark)
    rw = _event_time(right, right_ts).withWatermark(right_ts, watermark)
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names")
    overlap = [
        c for c in lw.columns if c in rw.columns and c not in keys
    ]
    if overlap:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {overlap} — rename"
        )
    cond = (
        (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    for k in keys:
        cond = cond & (lw[k] == rw[k])
    out = lw.join(rw, cond, how)
    # keep one copy of each key column
    return out.drop(*[rw[k] for k in keys])


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    static dimension table. The dimension is broadcast by default — it
    ships once per executor and the unbounded stream side never shuffles,
    which is the only join plan that holds up on an endless ingest (a
    shuffled stream-static join would re-exchange every micro-batch).
    Set ``broadcast=False`` only for dimensions too big to broadcast, and
    pre-bucket both sides in that case. Left joins keep unmatched stream
    rows (dimension misses become NULLs — the usual slowly-arriving-dim
    posture); inner drops them."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on=on, how=how)


_UNIT_MS = {
    "millisecond": 1, "milliseconds": 1,
    "second": 1000, "seconds": 1000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
}


def _duration_ms(s: str) -> int:
    n, unit = s.strip().split()
    return int(n) * _UNIT_MS[unit.lower()]


def stream_match_state(
    stream: DataFrame,
    pattern: str,
    label_col: str,
    keys: Sequence[str],
    ts_col: str,
    out_schema: StructType,
    timeout: str = "NoTimeout",
    finalize_gap: str | None = None,
    max_attempt_rows: int = 100_000,
):
    """Incremental MATCH over a keyed stream: per key, an NFA frontier is
    kept in GroupState; each micro-batch advances it over the new rows and
    emits one row per completed match (start/end timestamps + length).

    Semantics match the batch operator (greedy leftmost-LONGEST,
    regex_nfa.CompiledMatcher.find_matches_with_paths): an accepting
    prefix is not emitted until the attempt is settled —

    - immediately, when the accepting frontier has no outgoing
      transitions (the match is provably maximal: e.g. the PURCHASE in
      'VIEW+ PURCHASE');
    - otherwise when a later row kills the extension attempt; the rows
      consumed past the accepted end are then REPLAYED through the
      automaton, exactly like the batch scanner resuming at `best_end`.
      Failed attempts with no accept replay from their second row
      (batch `i += 1`).

    State per key is the current attempt's (label, ts) row buffer —
    bounded by the attempt length, not the stream length (the same
    buffering any streaming CEP engine needs for longest-match). A match
    whose extension never dies (pattern like 'A+' with the stream ending
    on 'A') stays pending until more input arrives — the one inherent
    divergence from the bounded-input batch operator. Pass
    ``finalize_gap`` (e.g. "30 minutes"; requires a watermark on the
    input) to bound it: a pending accept is emitted once the watermark
    passes its end timestamp + gap, i.e. the key has been silent for the
    gap (session-window-style finalization via EventTimeTimeout). Rows
    buffered past the finalized accept are replayed through a fresh
    automaton, exactly like the batch scanner resuming at ``best_end`` —
    they can start or complete a new match after the gap. Rows must
    arrive in order per key (sorted within each micro-batch here; use a
    watermark upstream for cross-batch order).

    ``max_attempt_rows`` bounds per-key state for adversarial inputs
    (pattern 'A+' over an endless run of A's never settles): when an
    attempt's buffer reaches the cap it is settled in place — a pending
    accept is emitted and the tail replayed; an attempt with no accept
    yet resumes from its second row (batch ``i += 1`` semantics). The
    only observable divergence is that a single true match longer than
    the cap is emitted as consecutive cap-sized matches.
    """
    from sclera_spark.operators.match.regex_nfa import compile_pattern

    nfa = compile_pattern(pattern)
    nxt, label_of, finish = nfa.next_map, nfa.label_of, nfa.finish
    gap_ms = _duration_ms(finalize_gap) if finalize_gap else None

    def update(key, pdfs, state: GroupState):
        from collections import deque

        cols = [f.name for f in out_schema.fields]
        out = []

        def scan(work, frontier, start_us, acc_mlen, acc_ts_us, labs, tss):
            """Advance the automaton over ``work`` (a deque), appending
            completed matches to ``out``; returns the surviving attempt."""

            def emit():
                out.append(
                    (
                        *key,
                        pd.Timestamp(start_us * 1000),
                        pd.Timestamp(acc_ts_us * 1000),
                        acc_mlen,
                    )
                )

            while work:
                lab, ts_us = work.popleft()
                if not frontier:
                    cand = {t for t in nxt[0] if label_of[t] == lab}
                    if not cand:
                        continue
                    frontier, labs, tss = cand, [lab], [ts_us]
                    start_us, acc_mlen, acc_ts_us = ts_us, 0, 0
                else:
                    stepped = {
                        t for s in frontier for t in nxt.get(s, ()) if label_of[t] == lab
                    }
                    if not stepped:
                        # attempt dies here: settle it, then replay the
                        # unconsumed suffix (incl. this row) through a fresh
                        # automaton — batch-scanner resume semantics
                        if acc_mlen:
                            emit()
                            replay = list(zip(labs, tss))[acc_mlen:]
                        else:
                            replay = list(zip(labs, tss))[1:]
                        frontier, labs, tss = set(), [], []
                        start_us, acc_mlen, acc_ts_us = 0, 0, 0
                        work.extendleft(reversed(replay + [(lab, ts_us)]))
                        continue
                    frontier = stepped
                    labs.append(lab)
                    tss.append(ts_us)
                if frontier & finish:
                    acc_mlen, acc_ts_us = len(labs), ts_us
                    if not any(nxt.get(s) for s in frontier):
                        # provably maximal: nothing can ever extend it
                        emit()
                        frontier, labs, tss = set(), [], []
                        start_us, acc_mlen, acc_ts_us = 0, 0, 0
                if len(labs) >= max_attempt_rows:
                    # state bound: settle the over-long attempt in place
                    if acc_mlen:
                        emit()
                        replay = list(zip(labs, tss))[acc_mlen:]
                    else:
                        replay = list(zip(labs, tss))[1:]
                    frontier, labs, tss = set(), [], []
                    start_us, acc_mlen, acc_ts_us = 0, 0, 0
                    work.extendleft(reversed(replay))
            return frontier, start_us, acc_mlen, acc_ts_us, labs, tss

        def finalize_past_deadline(frontier, start_us, acc_mlen, acc_ts_us, labs, tss):
            """Emit any pending accept whose gap deadline the watermark
            already passed (a timeout in the past cannot be registered),
            replaying the buffered tail each time — rows consumed past the
            finalized accept may start a new match after the gap."""
            wm = state.getCurrentWatermarkMs()
            while acc_mlen and wm and acc_ts_us // 1000 + gap_ms <= wm:
                out.append(
                    (
                        *key,
                        pd.Timestamp(start_us * 1000),
                        pd.Timestamp(acc_ts_us * 1000),
                        acc_mlen,
                    )
                )
                tail = deque(list(zip(labs, tss))[acc_mlen:])
                frontier, start_us, acc_mlen, acc_ts_us, labs, tss = scan(
                    tail, set(), 0, 0, 0, [], []
                )
            return frontier, start_us, acc_mlen, acc_ts_us, labs, tss

        def save(frontier, start_us, acc_mlen, acc_ts_us, labs, tss):
            state.update(
                (
                    ",".join(str(s) for s in sorted(frontier)),
                    start_us,
                    acc_mlen,
                    acc_ts_us,
                    labs,
                    tss,
                )
            )
            if gap_ms is not None and acc_mlen:
                state.setTimeoutTimestamp(acc_ts_us // 1000 + gap_ms)

        if gap_ms is not None and state.hasTimedOut:
            # watermark passed the pending accept's end + gap: the key has
            # been silent long enough — finalize the longest accept seen,
            # then REPLAY the rows buffered past it (they can begin a new
            # match after the gap; dropping them lost e.g. the trailing A
            # of 'A B A' under '(A B)+')
            if state.exists:
                _, start_us, acc_mlen, acc_ts_us, labs, tss = state.get
                labs = list(labs) if labs is not None else []
                tss = list(tss) if tss is not None else []
                if acc_mlen:
                    out.append(
                        (
                            *key,
                            pd.Timestamp(start_us * 1000),
                            pd.Timestamp(acc_ts_us * 1000),
                            acc_mlen,
                        )
                    )
                    tail = deque(list(zip(labs, tss))[acc_mlen:])
                    st = scan(tail, set(), 0, 0, 0, [], [])
                    st = finalize_past_deadline(*st)
                    if st[0]:
                        save(*st)
                    else:
                        state.remove()
                else:
                    state.remove()
            yield pd.DataFrame(out, columns=cols)
            return

        if state.exists:
            frontier_csv, start_us, acc_mlen, acc_ts_us, labs, tss = state.get
            frontier = set(int(x) for x in frontier_csv.split(",") if x != "")
            labs = list(labs) if labs is not None else []
            tss = list(tss) if tss is not None else []
        else:
            frontier, start_us, acc_mlen, acc_ts_us = set(), 0, 0, 0
            labs, tss = [], []

        work: deque[tuple[str, int]] = deque()
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            ts_vals = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
            for lab, ts_us in zip(pdf[label_col].astype(str).str.upper(), ts_vals):
                work.append((lab, int(ts_us)))

        st = scan(work, frontier, start_us, acc_mlen, acc_ts_us, labs, tss)
        if gap_ms is not None:
            st = finalize_past_deadline(*st)
        save(*st)
        yield pd.DataFrame(out, columns=cols)

    return stream.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=(
            "frontier string, start_us long, acc_mlen int, acc_ts_us long, "
            "labs array<string>, tss array<long>"
        ),
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if gap_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_expmovavg(
    stream: DataFrame,
    value_col: str,
    decay: float,
    keys: Sequence[str],
    ts_col: str,
    out_col: str = "ema",
):
    """Incremental EXPMOVAVG over a keyed stream: every input row is
    emitted with its running exponential moving average, continued across
    micro-batches from O(1) state per key (the carried EMA scalar).

    Exact parity with the batch operator (operators/window_seq.py
    expmovavg — s_0 = x_0; s_i = decay*x_i + (1-decay)*s_{i-1}): the
    carried state is PREPENDED to each batch's value series before the
    same pandas ewm(adjust=False) kernel runs, which reproduces the
    recurrence bit for bit — ewm's first output equals its first input,
    so seeding with s_{prev} makes the next output exactly
    decay*x + (1-decay)*s_{prev}. Rows are processed in ``ts_col`` order
    within each micro-batch (use a watermark upstream for cross-batch
    order, as with stream_match_state)."""
    import numpy as np

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        list(stream.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        (last,) = state.get if state.exists else (None,)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
            vals = pdf[value_col].astype("float64")
            if last is not None and not np.isnan(last):
                seeded = pd.concat(
                    [pd.Series([last], dtype="float64"), vals], ignore_index=True
                )
                ema = seeded.ewm(alpha=decay, adjust=False).mean().iloc[1:]
                ema.index = pdf.index
            else:
                ema = vals.ewm(alpha=decay, adjust=False).mean()
            pdf[out_col] = ema
            tail = ema.dropna()
            if len(tail):
                last = float(tail.iloc[-1])
            yield pdf
        state.update((last,))

    return stream.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="last double",
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


def run_to_files(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_s: int = 120,
):
    """Run a streaming query into a parquet FILE sink with a checkpoint,
    draining all currently-available input (`availableNow`), then return
    the stopped query. This is the production persistence path the
    memory-sink test helper cannot model:

    - **exactly-once output**: the file sink's commit log records which
      part files belong to each epoch; a re-run after failure never
      double-counts a batch;
    - **state recovery**: keyed operator state (`applyInPandasWithState`
      buffers, EMA scalars, dedup sets, window partials) is snapshotted
      in the checkpoint's state store per micro-batch — calling this
      again with the SAME checkpoint after more input arrived resumes
      from the recorded offsets with the recovered state, processing
      only the new data. That restart-resume contract is what makes a
      stateful pipeline operable on an endless ingest: crash, redeploy,
      or pause at any batch boundary and the output stream is the same
      one an uninterrupted run would have produced (pinned by
      tests/test_stream_restart.py against the batch operators).

    Readers consume the sink with ``spark.read.parquet(out_dir)``; Spark
    reads the commit log, so files from aborted epochs are invisible.
    """
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
    return q


def checkpoint_stream_id(checkpoint_dir: str) -> str:
    """A STABLE stream identity stored inside the checkpoint itself, so
    the manifest dedup watermark survives the checkpoint directory being
    moved/renamed (an absolute path would not). Preference order:

    1. ``_sclera_stream_id`` sidecar written by a previous call (the
       durable identity; travels with the checkpoint);
    2. Spark's own ``metadata`` query id for a checkpoint that already
       ran before this function existed (adopted as the sidecar);
    3. a fresh uuid for a brand-new checkpoint.
    """
    os.makedirs(checkpoint_dir, exist_ok=True)
    sid_file = os.path.join(checkpoint_dir, "_sclera_stream_id")
    if os.path.exists(sid_file):
        with open(sid_file) as fh:
            return fh.read().strip()
    sid = None
    meta_file = os.path.join(checkpoint_dir, "metadata")
    if os.path.exists(meta_file):
        try:
            import json

            with open(meta_file) as fh:
                sid = json.load(fh).get("id")
        except (OSError, ValueError):
            sid = None
    if not sid:
        import uuid

        sid = uuid.uuid4().hex
    tmp = sid_file + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(sid)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, sid_file)
    return sid


def manifest_batch_committer(
    table_path: str,
    stream_id: str | None = None,
    legacy_stream_ids: tuple[str, ...] = (),
    cas=None,
):
    """The idempotent per-batch commit used by :func:`stream_to_manifest`
    (exposed so redelivery semantics are directly testable): appends the
    batch as one atomic manifest commit carrying
    ``{"stream_batch": id, "stream_id": sid}`` in the version metadata,
    and makes a REDELIVERED batch (id at or below the recorded watermark
    FOR THE SAME STREAM) a no-op.

    The watermark is scoped to ``stream_id`` (a stable id stored inside
    the checkpoint — :func:`checkpoint_stream_id`): Structured Streaming
    batch ids restart at 0 under a NEW checkpoint, so an unscoped
    watermark would silently discard every batch of a restarted-with-
    fresh-checkpoint stream as a "redelivery". A different stream_id
    resets the watermark instead — the new stream's batch 0 commits
    normally.

    Two upgrade fallbacks keep the SAME-checkpoint resume deduped for
    tables written by older builds (a replayed batch after a crash
    between sink append and checkpoint commit must not append twice):
    a table whose meta carries ``stream_batch`` but NO ``stream_id`` key
    predates stream scoping entirely and is treated as the same stream;
    ``legacy_stream_ids`` lets the caller pass ids an older build would
    have used for this checkpoint (the abspath-derived id)."""
    from sclera_spark.sources.manifest import CasManifestTable, ManifestTable

    def _table():
        # cas: the ingest table commits through the lock-free
        # conditional-put protocol (multi-host object-store shape);
        # batch-id dedup semantics are identical either way
        if cas is not None:
            return CasManifestTable(table_path, cas)
        return ManifestTable(table_path)

    def commit_batch(bdf: DataFrame, batch_id: int) -> None:
        meta = {"stream_batch": batch_id, "stream_id": stream_id}
        if ManifestTable.exists(table_path):
            mt = _table()
            cur = mt.meta()
            cur_id = cur.get("stream_id")
            same_stream = (
                cur_id == stream_id
                or (cur_id is None and "stream_batch" in cur)
                or (cur_id is not None and cur_id in legacy_stream_ids)
            )
            if same_stream and batch_id <= cur.get("stream_batch", -1):
                return  # redelivered batch: already committed atomically
            mt.append(bdf, meta=meta)
            # auto-compaction (opt-in table property): per-batch ingest
            # is the small-file producer — fold the sub-target slice
            # back into target-sized files as its own atomic commit.
            # Change-feed neutral (rewritten rows cancel in the CDF
            # exceptAll) and dedup-safe (meta inherits the watermark).
            try:
                mt.maybe_autocompact(bdf.sparkSession)
            except Exception as exc:
                # compaction is maintenance, never a commit gate —
                # but observable (r11): warn once, record in sidecar
                from sclera_spark.sources.manifest import (
                    warn_autocompact_failure,
                )

                warn_autocompact_failure(mt.path, exc)
            try:
                mt.maybe_export_delta(bdf.sparkSession)
            except Exception as exc:
                from sclera_spark.sources.manifest import (
                    warn_mirror_failure,
                )

                warn_mirror_failure(mt.path, exc)
        elif cas is not None:
            CasManifestTable.create_cas(bdf, table_path, cas, meta=meta)
        else:
            ManifestTable.create(bdf, table_path, meta=meta)

    return commit_batch


def manifest_upsert_committer(
    table_path: str,
    keys: Sequence[str],
    stream_id: str | None = None,
    order_col: str | None = None,
    delete_col: str | None = None,
    file_cap: int = 10_000,
):
    """Per-batch CDC UPSERT into a manifest table (Delta's
    foreachBatch-MERGE pattern): each micro-batch's rows REPLACE the
    table rows sharing their key. Exactly-once exactly like
    :func:`manifest_batch_committer` — the batch-id watermark commits
    atomically with the swap, so a crash-redelivered batch is a no-op.

    Scale shape: the batch's distinct keys broadcast-join against the
    table scan to find HIT FILES (the only files that can hold old
    versions of these keys — on a key-clustered table this is a
    handful, pruned further by footer stats), then ONE atomic
    replace_files commit swaps [hit-file survivors (anti-join)] +
    [batch rows] in while removing the hits. The unbounded table never
    shuffles; only hit files are rewritten. Past ``file_cap`` hit
    files the batch falls back to a full-table rewrite via overwrite
    (same anti-join, one distributed pass).

    Within a batch, ``order_col`` picks the LAST version per key (CDC
    streams carry multiple updates per key per batch); without it,
    duplicate keys in one batch are an error-prone ambiguity and a
    ValueError. ``delete_col`` names a boolean tombstone column: a
    key whose LAST version in the batch is flagged is REMOVED from
    the table instead of upserted (the column itself never lands in
    the table — it is CDC transport, not data), Debezium's
    op='d' shape."""
    from pyspark.sql.window import Window

    from sclera_spark.sources.manifest import ManifestTable

    keys = list(keys)

    def _post_commit(mt, spark) -> None:
        # same maintenance hooks as manifest_batch_committer: never a
        # commit gate, warn-once on failure
        from sclera_spark.sources.manifest import (
            warn_autocompact_failure,
            warn_mirror_failure,
        )

        try:
            mt.maybe_autocompact(spark)
        except Exception as exc:
            warn_autocompact_failure(mt.path, exc)
        try:
            mt.maybe_export_delta(spark)
        except Exception as exc:
            warn_mirror_failure(mt.path, exc)

    def commit_batch(bdf: DataFrame, batch_id: int) -> None:
        meta = {"stream_batch": batch_id, "stream_id": stream_id}
        spark = bdf.sparkSession
        mt = None
        if ManifestTable.exists(table_path):
            # watermark check FIRST: a crash-redelivered batch must be
            # a pure metadata no-op, not pay the dedup jobs below
            mt = ManifestTable(table_path)
            cur = mt.meta()
            if cur.get("stream_id") == stream_id and batch_id <= cur.get(
                "stream_batch", -1
            ):
                return  # redelivered batch: already applied atomically
        if order_col is not None:
            w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
            bdf = (
                bdf.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        # the deduped batch feeds 3-4 actions (guard/bounds agg, probe,
        # survivors write) — persist it once instead of recomputing
        # the source read + dedup window each time
        bdf = bdf.persist()
        try:
            # ONE aggregate pays the persist materialization AND
            # answers both the NULL-key guard and the stats bounds
            # (r16, guide §1.2: the old flow ran a separate
            # limit(1).count() guard job plus a distinct+agg bounds
            # job per batch — three full passes where one suffices)
            null_cond = functools.reduce(
                lambda a, b: a | b,
                [F.col(k).isNull() for k in keys],
            )
            guard = bdf.agg(
                F.count_if(null_cond).alias("__nulls"),
                *[F.min(k).alias(f"__lo_{i}") for i, k in enumerate(keys)],
                *[F.max(k).alias(f"__hi_{i}") for i, k in enumerate(keys)],
            ).first()
            if guard["__nulls"]:
                raise ValueError(
                    "CDC batch carries NULL key values — equality can "
                    "neither match nor replace them (the old row would "
                    "silently survive beside the new one); fix the "
                    "feed or filter NULL-keyed rows upstream"
                )
            if order_col is None:
                dup = (
                    bdf.groupBy(*keys).count().filter("count > 1").limit(1)
                ).count()
                if dup:
                    raise ValueError(
                        "upsert batch carries multiple rows per key and "
                        "no order_col to pick the last one — ambiguous "
                        "CDC apply refused"
                    )
            ins = bdf
            if delete_col is not None:
                # the batch's key set (updates AND deletes) drives the
                # hit probe and the anti-join; only the non-tombstoned
                # rows come back in, stripped of the transport column
                ins = bdf.filter(
                    ~F.coalesce(F.col(delete_col), F.lit(False))
                ).drop(delete_col)
            if mt is None:
                ManifestTable.create(ins, table_path, meta=meta)
                _post_commit(ManifestTable(table_path), spark)
                return
            # keys are distinct by construction at this point (the
            # order_col window kept one row per key, or the dup check
            # above verified it) — a distinct() here would add a
            # shuffle under every broadcast build below
            batch_keys = bdf.select(*keys)
            # stats pre-narrowing (the COW DML pattern): files whose
            # recorded min/max cannot hold any batch key are skipped by
            # the probe scan itself — a key-clustered 100 TB table
            # probes a handful of files per batch, not the table
            ranges = {
                k: (guard[f"__lo_{i}"], guard[f"__hi_{i}"])
                for i, k in enumerate(keys)
                if guard[f"__lo_{i}"] is not None
            }
            cand = mt.files_pruned(ranges) if ranges else mt.files()
            hits: list[str] = []
            if cand:
                base = mt.read(
                    spark, file_paths=cand, file_col="__upsert_file"
                )
                cond = functools.reduce(
                    lambda a, b: a & b,
                    [base[k].eqNullSafe(batch_keys[k]) for k in keys],
                )
                hits = [
                    r[0]
                    for r in base.join(F.broadcast(batch_keys), cond, "inner")
                    .select("__upsert_file")
                    .distinct()
                    .limit(file_cap + 1)
                    .collect()
                ]
            anti = lambda d: d.join(  # noqa: E731 — swap survivors
                F.broadcast(batch_keys), keys, "left_anti"
            )
            from urllib.parse import urlparse

            if len(hits) > file_cap:
                # hot batch touching most of the table: one distributed
                # full pass — still through replace_files so a commit
                # landing between our snapshot and the publish aborts
                # loudly instead of being silently dropped (overwrite
                # would clobber it)
                live = mt.files()
                mt.replace_files(
                    live,
                    anti(mt.read(spark, file_paths=live)).unionByName(ins),
                    meta=meta,
                )
            elif not hits:
                if ins is bdf or not ins.isEmpty():
                    mt.append(ins, meta=meta)
                else:
                    mt.amend_meta(meta)  # delete-only batch hit
                    # nothing: still advance the watermark atomically
            else:
                local = [
                    urlparse(u).path if u.startswith("file:") else u
                    for u in hits
                ]
                survivors = anti(mt.read(spark, file_paths=local))
                mt.replace_files(
                    local, survivors.unionByName(ins), meta=meta
                )
            _post_commit(mt, spark)
        finally:
            bdf.unpersist()

    return commit_batch


def stream_upsert_to_manifest(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    order_col: str | None = None,
    delete_col: str | None = None,
    timeout_s: int = 120,
):
    """Stream a CDC feed into a manifest table with per-batch UPSERT
    semantics (:func:`manifest_upsert_committer`): every micro-batch
    lands as ONE atomic commit that replaces the prior versions of its
    keys — readers see whole batches or nothing, and the usual
    time-travel/OPTIMIZE/mirror machinery applies. Exactly-once across
    restarts via the checkpoint-scoped batch watermark, same contract
    as :func:`stream_to_manifest`. Drains available input
    (availableNow) and returns the stopped query."""
    sid = checkpoint_stream_id(checkpoint_dir)
    q = (
        stream_df.writeStream.foreachBatch(
            manifest_upsert_committer(
                table_path,
                keys,
                stream_id=sid,
                order_col=order_col,
                delete_col=delete_col,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
    return q


def stream_to_manifest(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    timeout_s: int = 120,
    cas=None,
    prior_checkpoint_paths: tuple[str, ...] = (),
):
    """Stream into a MANIFEST table: every micro-batch lands as one
    atomic manifest commit (sources/manifest.py append — readers see
    whole batches or nothing, with time travel and OPTIMIZE/VACUUM
    available on the ingest table from day one).

    Exactly-once: ``foreachBatch`` is at-least-once — after a crash
    between the sink write and the checkpoint commit, Structured
    Streaming REDELIVERS the batch. The sink makes the redelivery a
    no-op by recording the committed batch id in the manifest's own
    version metadata: batch N commits ``{"stream_batch": N}`` atomically
    WITH its files, so "did batch N land?" has the same crash-consistent
    answer as "are its rows visible?". Metadata is inherited across
    commits, so a compaction or DML between batches cannot reset the
    dedup watermark. The watermark is scoped to this checkpoint (see
    :func:`manifest_batch_committer`): restarting with a NEW checkpoint
    against the same table starts a new batch-id sequence and is NOT
    deduped against the old one.

    Drains all currently-available input (availableNow) and returns the
    stopped query — call again with the same checkpoint to resume.

    Upgrade caveat: a pre-upgrade checkpoint identified itself by its
    ABSOLUTE PATH. If such a checkpoint was moved/renamed BEFORE its
    first run under this build, the current abspath matches neither the
    sidecar id nor the table's recorded legacy id, so one crash-replayed
    in-flight batch could append twice. Pass the checkpoint's previous
    location(s) via ``prior_checkpoint_paths`` to keep that batch
    deduped; upgrading and moving in the same step WITHOUT supplying the
    old path forfeits dedup for that single in-flight batch (steady
    state is unaffected — the sidecar id takes over from the first
    post-upgrade commit).
    """
    sid = checkpoint_stream_id(checkpoint_dir)
    q = (
        stream_df.writeStream.foreachBatch(
            manifest_batch_committer(
                table_path,
                stream_id=sid,
                # ids an older build derived for this same checkpoint:
                # its current abspath plus any caller-supplied previous
                # locations (pre-upgrade moves)
                legacy_stream_ids=(
                    os.path.abspath(checkpoint_dir),
                    *(os.path.abspath(p) for p in prior_checkpoint_paths),
                ),
                cas=cas,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
    return q


def crawl_gate_committer(
    sketch_path: str,
    kept_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    stream_id: str | None = None,
    within_batch: bool = True,
):
    """foreachBatch STREAMING crawl gate: each micro-batch of incoming
    documents is (1) near-dup-collapsed within itself (two copies in
    one batch would both pass a corpus-only gate), (2) gated against
    the PERSISTED corpus sketch table (llm/dedup.
    minhash_anti_join_sketched — the corpus text is never re-read),
    then (3) its survivors appended to the kept table and their
    sketches rolled into the sketch table, each as one atomic
    watermarked manifest commit.

    Crash consistency under foreachBatch's at-least-once redelivery:
    the kept table commits FIRST, the sketch table LAST, both scoped
    by the per-stream batch watermark (:func:`manifest_batch_committer`).
    A redelivered batch whose sketch commit already landed no-ops
    outright (the sketch watermark is the done marker — gating such a
    batch against a corpus that already contains its own survivors'
    sketches would reject every one of them as its own duplicate). A
    crash BETWEEN the two commits redelivers into: gate against the
    pre-batch corpus (deterministic, same survivors), kept append
    no-ops on its watermark, sketch append completes. Either way the
    pair converges to exactly-once."""
    from pyspark.sql import functions as F

    from sclera_spark.llm.dedup import (
        minhash_anti_join_sketched,
        minhash_dedup,
        minhash_sketch,
    )
    from sclera_spark.sources.manifest import ManifestTable

    kept_commit = manifest_batch_committer(kept_path, stream_id=stream_id)
    sketch_commit = manifest_batch_committer(
        sketch_path, stream_id=stream_id
    )

    def _foreign_watermark(path: str) -> None:
        """Refuse a table whose batch watermark belongs to ANOTHER
        stream: the gate pair's exactly-once story needs BOTH commits
        scoped by THIS stream's watermark, and the committer's legacy
        same-stream fallbacks (upgrade dedup for single-table sinks)
        could otherwise silently no-op one side of the pair against a
        foreign watermark — kept grows, sketch doesn't, and every
        future near-dup of an already-kept doc is admitted."""
        if not ManifestTable.exists(path):
            return
        meta = ManifestTable(path).meta()
        if "stream_batch" in meta and meta.get("stream_id") != stream_id:
            raise ValueError(
                f"crawl gate table {path} carries a batch watermark "
                f"from stream {meta.get('stream_id')!r} (this stream: "
                f"{stream_id!r}); resume with the ORIGINAL checkpoint, "
                "or point a new checkpoint at fresh tables"
            )

    def commit_batch(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        # watermark checks FIRST: a fully-processed redelivered batch
        # must be a pure metadata no-op, never pay the sketch jobs
        smt = None
        if ManifestTable.exists(sketch_path):
            smt = ManifestTable(sketch_path)
            meta = smt.meta()
            if (
                meta.get("stream_id") == stream_id
                and batch_id <= meta.get("stream_batch", -1)
            ):
                return  # fully processed (sketch commits last)
        _foreign_watermark(sketch_path)
        _foreign_watermark(kept_path)
        batch = bdf.localCheckpoint(eager=True)
        # ONE sketch pass per batch, threaded through dedup, gate and
        # append (each would otherwise re-run the pandas-UDF sketch —
        # the dominant per-batch cost — over the same surviving text)
        sk_batch = (
            minhash_sketch(batch, text_col, num_perm, shingle_k, with_fp=True)
            .select(F.col(id_col).alias("id"), "minhash", "hset", "hset_fp")
            .persist()
        )
        try:
            if within_batch:
                batch = minhash_dedup(
                    batch, id_col, text_col, num_perm, bands, shingle_k,
                    threshold, sketch=sk_batch,
                )
            if smt is not None:
                kept = minhash_anti_join_sketched(
                    batch, smt.read(spark), id_col, text_col, num_perm,
                    bands, shingle_k, threshold,
                    new_sketch=sk_batch.join(
                        batch.select(F.col(id_col).alias("id")), "id",
                        "left_semi",
                    ),
                    # when within_batch dedup ran, BOTH gate sides are
                    # already self-deduped (the corpus by this very
                    # gate, the batch by the dedup above) — skip the
                    # per-batch collapse probes outright; otherwise
                    # let the probe decide
                    collapse=False if within_batch else None,
                )
            else:
                kept = batch  # first batch IS the corpus seed
            kept = kept.localCheckpoint(eager=True)
            kept_commit(kept, batch_id)
            sk = sk_batch.join(
                kept.select(F.col(id_col).alias("id")), "id", "left_semi"
            )
            sketch_commit(sk, batch_id)
        finally:
            sk_batch.unpersist()

    return commit_batch


def stream_crawl_gate(
    stream_df: DataFrame,
    sketch_path: str,
    kept_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    within_batch: bool = True,
    timeout_s: int = 300,
):
    """Stream a document feed through the incremental crawl gate
    (:func:`crawl_gate_committer`): survivors land in the ``kept_path``
    manifest table, the corpus sketch table at ``sketch_path`` grows by
    exactly the survivors' sketches per batch, and the whole pair is
    exactly-once across restarts via the checkpoint-scoped batch
    watermark. Drains available input (availableNow) and returns the
    stopped query — call again with the same checkpoint to resume."""
    sid = checkpoint_stream_id(checkpoint_dir)
    q = (
        stream_df.writeStream.foreachBatch(
            crawl_gate_committer(
                sketch_path,
                kept_path,
                id_col=id_col,
                text_col=text_col,
                num_perm=num_perm,
                bands=bands,
                shingle_k=shingle_k,
                threshold=threshold,
                stream_id=sid,
                within_batch=within_batch,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
    return q


def token_budget_committer(
    kept_path: str,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
    salt: str = "",
    stream_id: str | None = None,
):
    """foreachBatch TOKEN-BUDGET admission gate (r14): the streaming
    form of llm/sample.token_budget_sample — each micro-batch's
    documents are admitted in md5(salt || id) order while the RUNNING
    corpus token total stays under ``budget`` (take-until: the last
    admitted document may overshoot, after which every later batch
    admits nothing), and the admitted rows land as ONE atomic
    watermarked manifest commit whose metadata carries the updated
    running total (``tb_tokens``).

    Crash consistency under at-least-once redelivery: the running
    total advances atomically WITH the rows that consumed it (same
    manifest commit), so a redelivered batch — detected by the
    stream-scoped batch watermark — can never double-count; a crash
    BEFORE the commit replays into the identical deterministic draw
    (md5 order, same remaining budget). A budget-exhausted batch is a
    pure metadata commit (watermark bump, no data jobs beyond an
    empty check).

    r16: the per-batch cut is the same 65536-way bucket carry as the
    batch sampler (llm/sample.token_budget_sample, r15) instead of a
    per-batch range-partitioned prefix sum: one narrow groupBy ships
    per-bucket (sum, count) to the driver, full buckets admit by a
    plain hash predicate, only the straddle bucket runs a window, and
    the batch payload never rides a shuffle or checkpoint. Identical
    cut; the admitted count/total now come from the bucket stats plus
    one tiny straddle aggregate. NULL-id rows follow the sampler's
    pinned contract — never admitted, never counted (the old per-batch
    prefix sum admitted them first in a tie-nondeterministic order)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sclera_spark.llm.sample import (
        _TB_BUCKETS,
        _tb_bucket,
        _tb_bucket_stats,
        _tb_hash,
        _tb_walk_buckets,
    )
    from sclera_spark.llm.text import _tokens
    from sclera_spark.sources.manifest import ManifestTable

    if budget <= 0:
        raise ValueError("budget must be positive")

    def commit_batch(bdf: DataFrame, batch_id: int) -> None:
        done = 0
        mt = None
        if ManifestTable.exists(kept_path):
            mt = ManifestTable(kept_path)
            meta = mt.meta()
            cur_id = meta.get("stream_id")
            same = cur_id == stream_id or (
                cur_id is None and "stream_batch" in meta
            )
            if not same and "stream_batch" in meta:
                raise ValueError(
                    f"token budget table {kept_path} carries a batch "
                    f"watermark from stream {cur_id!r} (this stream: "
                    f"{stream_id!r}); resume with the ORIGINAL "
                    "checkpoint, or point a new checkpoint at a fresh "
                    "table"
                )
            if same and batch_id <= meta.get("stream_batch", -1):
                return  # redelivered: rows + total already committed
            done = int(meta.get("tb_tokens", 0))
        remaining = budget - done
        wm = {"stream_batch": batch_id, "stream_id": stream_id}
        if remaining <= 0:
            # budget filled by an earlier batch: watermark-only commit
            if mt is not None:
                mt.amend_meta(wm)
            return
        # same loud collision contract as the batch sampler
        # (llm/sample.token_budget_sample): caller columns named like
        # the working columns would be silently replaced and PERSISTED
        clash = {"__h", "__n", "__prior"} & set(bdf.columns)
        if clash:
            raise ValueError(
                "token_budget_committer: input columns collide with "
                f"internal working columns {sorted(clash)}; rename "
                "them first"
            )
        cols = list(bdf.columns)
        n = F.coalesce(
            (
                F.col(count_col).cast("long")
                if count_col is not None
                else F.size(_tokens(F.col(text_col))).cast("long")
            ),
            F.lit(0),
        )
        h = _tb_hash(id_col, salt)
        bucket = _tb_bucket(h)
        t = bdf.select(h.alias("__h"), F.col(id_col), n.alias("__n")).withColumn(
            "__b", F.conv(F.substring("__h", 1, 4), 16, 10).cast("int")
        )
        stats = _tb_bucket_stats(t)
        totals = {b: s for b, (s, _c) in stats.items() if b is not None}
        bstar, off_star = _tb_walk_buckets(totals, remaining)
        if bstar is None:
            # the whole batch fits the remaining budget (NULL-bucket
            # rows excluded per the pinned contract)
            admit_rows = sum(c for b, (_s, c) in stats.items() if b is not None)
            admit_toks = off_star
            out = bdf.where(bucket < F.lit(_TB_BUCKETS))
        else:
            st = t.where(F.col("__b") == bstar)
            w = (
                Window.partitionBy("__b")
                .orderBy("__h", id_col)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            # straddle winners: ~1/65536 of the batch, narrow columns;
            # materialized once for the stats agg AND the semi-join
            winners = (
                st.withColumn(
                    "__prior",
                    F.lit(int(off_star)) + F.sum("__n").over(w) - F.col("__n"),
                )
                .where(F.col("__prior") < remaining)
                .select(id_col, "__n")
                .localCheckpoint(eager=True)
            )
            ws = winners.agg(
                F.count(F.lit(1)).alias("c"), F.sum("__n").alias("s")
            ).first()
            admit_rows = (
                sum(
                    c
                    for b, (_s, c) in stats.items()
                    if b is not None and b < bstar
                )
                + int(ws["c"])
            )
            admit_toks = int(off_star) + int(ws["s"] or 0)
            out = bdf.where(bucket < F.lit(bstar)).unionByName(
                bdf.where(bucket == F.lit(bstar)).join(
                    winners.select(id_col), on=id_col, how="left_semi"
                )
            )
        if not admit_rows:
            if mt is not None:
                mt.amend_meta(wm)
            return
        out = out.select(*cols)
        meta = {**wm, "tb_tokens": done + int(admit_toks)}
        if mt is None:
            ManifestTable.create(out, kept_path, meta=meta)
        else:
            mt.append(out, meta=meta)

    return commit_batch


def stream_token_budget(
    stream_df: DataFrame,
    kept_path: str,
    budget: int,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
    salt: str = "",
    timeout_s: int = 300,
):
    """Stream a document feed through the token-budget admission gate
    (:func:`token_budget_committer`): admitted documents land in the
    ``kept_path`` manifest table until the corpus-wide token budget
    fills, exactly-once across restarts via the checkpoint-scoped
    batch watermark. Drains available input (availableNow) and returns
    the stopped query — call again with the same checkpoint to
    resume."""
    sid = checkpoint_stream_id(checkpoint_dir)
    q = (
        stream_df.writeStream.foreachBatch(
            token_budget_committer(
                kept_path,
                budget,
                id_col=id_col,
                text_col=text_col,
                count_col=count_col,
                salt=salt,
                stream_id=sid,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
    return q
