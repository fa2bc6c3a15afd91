"""Fuzz family 8: streaming state vs random micro-batch boundaries.

The stateful streaming operators (EMA continuation, incremental MATCH)
carry per-key state across micro-batches; every bug class specific to
the streaming tier lives at a batch BOUNDARY (an attempt half-buffered
when the trigger fires, an EMA scalar handed to the next batch). The
existing parity tests pin one fixed 3-way split; this family fuzzes the
boundary itself: the same time-ordered event log is cut at RANDOM
positions into files fed one-per-trigger (`maxFilesPerTrigger=1`), and
the streamed output must equal the batch operator bit-for-bit / match-
for-match REGARDLESS of where the cuts fall.

Seeds are deterministic (`random.Random(seed)` picks the cut points);
any failing seed is a reproducible boundary regression. Runtime note:
each seed starts real streaming queries, so the family keeps the seed
count small and the log short — the cut-position space it explores is
the thing the fixed-split tests cannot cover.
"""

from __future__ import annotations

import datetime
import os
import random
import shutil
import tempfile

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from sclera_spark.operators import expmovavg
from sclera_spark.operators.match.regex_nfa import compile_pattern, find_matches
from sclera_spark.streaming import (
    run_to_memory,
    stream_expmovavg,
    stream_from_directory,
    stream_match_state,
)

N_SEEDS = 4  # each seed = 2 real streaming queries; boundary space, not volume

_N_KEYS = 5
_N_PER_KEY = 40

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("lab", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _make_log():
    """Deterministic keyed label/value log, interleaved across keys in
    global time order (the arrival order a real ingest would see)."""
    rng = random.Random(12345)
    rows = []
    eid = 0
    base = datetime.datetime(2024, 3, 1)
    for i in range(_N_KEYS * _N_PER_KEY):
        uid = rng.randrange(_N_KEYS)
        lab = rng.choice(["A", "A", "A", "B", "C"])
        rows.append(
            (
                eid,
                uid,
                base + datetime.timedelta(seconds=i),
                lab,
                round(rng.uniform(-5, 5), 3),
            )
        )
        eid += 1
    return rows


_ROWS = _make_log()


@pytest.fixture(scope="module")
def slog(spark):
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    df.cache().count()
    yield df
    df.unpersist()


def _random_cuts(rng: random.Random, n: int) -> list[int]:
    k = rng.randint(2, 4)
    cuts = sorted(rng.sample(range(1, n), k))
    return [0] + cuts + [n]


def _feed(spark, cuts: list[int]):
    """Write time-ordered slices of the log as one file each; return the
    glob dir (caller removes)."""
    d = tempfile.mkdtemp(prefix="sclera_sfuzz_")
    for i in range(len(cuts) - 1):
        part = _ROWS[cuts[i] : cuts[i + 1]]
        spark.createDataFrame(part, _SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i:02d}")
        )
    return d


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_stream_boundary_fuzz(spark, slog, seed):
    rng = random.Random(seed)
    cuts = _random_cuts(rng, len(_ROWS))
    d = _feed(spark, cuts)
    try:
        stream = stream_from_directory(
            spark, d + "/*", _SCHEMA, maxFilesPerTrigger=1
        )

        # --- EMA continuation: bitwise equality with the batch operator
        ema_batch = {
            r.event_id: r.ema
            for r in expmovavg(
                slog, "value", decay=0.25, partition_by=["user_id"],
                order_by=["ts", "event_id"], out_col="ema",
            ).collect()
        }
        out = stream_expmovavg(
            stream, "value", decay=0.25, keys=["user_id"], ts_col="ts"
        )
        q = run_to_memory(out, f"sfuzz_ema_{seed}")
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        got = {
            r.event_id: r.ema
            for r in spark.sql(
                f"SELECT event_id, ema FROM sfuzz_ema_{seed}"
            ).collect()
        }
        q.stop()
        assert n_batches >= 2, f"seed {seed}: cuts produced {n_batches} batch(es)"
        assert len(got) == len(ema_batch), f"seed {seed}: row count"
        diffs = [k for k in ema_batch if got[k] != ema_batch[k]]
        assert not diffs, (
            f"seed {seed} cuts {cuts}: {len(diffs)} EMA divergences, "
            f"e.g. {diffs[:3]}"
        )

        # --- incremental MATCH: same matches as the batch scanner.
        # 'A+ B' accepts on B with no outgoing edge -> every true match is
        # settled by end of input (no unfinalized pending accept to skew
        # the comparison).
        nfa = compile_pattern("A+ B")
        exp_matches = set()
        per_key: dict[int, list[tuple[int, str]]] = {}
        for eid, uid, ts, lab, _v in _ROWS:
            per_key.setdefault(uid, []).append((eid, lab))
        for uid, seq in per_key.items():
            labs = [lab for _e, lab in seq]
            for (s, e) in find_matches(nfa, labs):
                exp_matches.add((uid, seq[s][0], seq[e - 1][0], e - s))

        out_schema = StructType(
            [
                StructField("user_id", LongType()),
                StructField("match_start", TimestampType()),
                StructField("match_end", TimestampType()),
                StructField("match_len", IntegerType()),
            ]
        )
        stream2 = stream_from_directory(
            spark, d + "/*", _SCHEMA, maxFilesPerTrigger=1
        )
        mout = stream_match_state(
            stream2, pattern="A+ B", label_col="lab", keys=["user_id"],
            ts_col="ts", out_schema=out_schema,
        )
        mq = run_to_memory(mout, f"sfuzz_match_{seed}")
        ts_to_eid = {(uid, ts): eid for eid, uid, ts, _l, _v in _ROWS}
        got_matches = set()
        for r in spark.table(f"sfuzz_match_{seed}").collect():
            got_matches.add(
                (
                    r.user_id,
                    ts_to_eid[(r.user_id, r.match_start)],
                    ts_to_eid[(r.user_id, r.match_end)],
                    r.match_len,
                )
            )
        mq.stop()
        assert got_matches == exp_matches, (
            f"seed {seed} cuts {cuts}: stream matches != batch "
            f"(missing {sorted(exp_matches - got_matches)[:3]}, "
            f"extra {sorted(got_matches - exp_matches)[:3]})"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
