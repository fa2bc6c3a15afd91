"""Checkpoint/restart recovery for the stateful streaming operators.

The boundary-fuzz family (test_fuzz_streaming.py) proves state carries
across micro-batches WITHIN one query run. This suite proves the harder
operational contract: state survives a full QUERY RESTART. Run 1 drains
the input available at start into a checkpointed parquet file sink and
stops; more input lands; run 2 starts from the SAME checkpoint, and the
combined sink must equal what an uninterrupted run would have produced —
per-key EMA scalars and half-buffered MATCH attempts recovered from the
state store, offsets resumed (no reprocessing), file-sink commit log
giving exactly-once output.

The restart cut is placed so state is provably non-trivial at the
boundary: every key has rows on both sides, and for MATCH the log is
arranged so at least one match SPANS the two runs (its 'A's arrive
before the stop, its closing 'B' after).
"""

from __future__ import annotations

import datetime
import os
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
from sclera_spark.streaming import (
    run_to_files,
    stream_expmovavg,
    stream_from_directory,
    stream_match_state,
)

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("lab", StringType()),
        StructField("value", DoubleType()),
    ]
)

# Per-key label scripts, interleaved in global time order. Key 1's match
# 'A A B' is split by the restart cut (its B arrives in phase 2); key 2
# completes one match in phase 1 and starts another finished in phase 2.
_PHASE1 = [
    # (user_id, lab)
    (1, "A"), (2, "A"), (2, "B"), (1, "A"), (3, "C"), (2, "A"), (3, "A"),
]
_PHASE2 = [
    (1, "B"), (3, "B"), (2, "A"), (2, "B"), (1, "A"), (1, "A"), (1, "B"),
]


def _rows(phase, offset):
    base = datetime.datetime(2024, 5, 1)
    out = []
    for i, (uid, lab) in enumerate(phase):
        j = offset + i
        out.append(
            (j, uid, base + datetime.timedelta(seconds=j), lab,
             float((j * 7) % 11) - 5.0)
        )
    return out


_R1 = _rows(_PHASE1, 0)
_R2 = _rows(_PHASE2, len(_PHASE1))
_ALL = _R1 + _R2

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("match_start", TimestampType()),
        StructField("match_end", TimestampType()),
        StructField("match_len", IntegerType()),
    ]
)


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="sclera_restart_")
    d = {
        "in": os.path.join(root, "in"),
        "out_ema": os.path.join(root, "out_ema"),
        "ck_ema": os.path.join(root, "ck_ema"),
        "out_m": os.path.join(root, "out_m"),
        "ck_m": os.path.join(root, "ck_m"),
    }
    os.makedirs(d["in"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def _land(spark, rows, path):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_ema_state_survives_restart(spark, dirs):
    batch = {
        r.event_id: r.ema
        for r in expmovavg(
            spark.createDataFrame(_ALL, _SCHEMA), "value", decay=0.4,
            partition_by=["user_id"], order_by=["ts", "event_id"],
            out_col="ema",
        ).collect()
    }

    def run():
        stream = stream_from_directory(spark, dirs["in"], _SCHEMA)
        out = stream_expmovavg(
            stream, "value", decay=0.4, keys=["user_id"], ts_col="ts"
        )
        run_to_files(out, dirs["out_ema"], dirs["ck_ema"])

    _land(spark, _R1, dirs["in"])
    run()  # run 1: phase-1 rows, then a clean stop
    got1 = spark.read.parquet(dirs["out_ema"])
    assert got1.count() == len(_R1)

    _land(spark, _R2, dirs["in"])
    run()  # run 2: SAME checkpoint — resumes offsets + per-key EMA state
    got = {
        r.event_id: r.ema for r in spark.read.parquet(dirs["out_ema"]).collect()
    }
    assert len(got) == len(_ALL), "exactly-once: no dup/loss across restart"
    diffs = [k for k in batch if got[k] != batch[k]]
    assert not diffs, (
        f"EMA state not recovered across restart: {len(diffs)} divergences "
        f"(e.g. event {diffs[:3]}) — phase-2 rows must continue the "
        f"phase-1 EMA, not restart from their own first value"
    )


def test_match_attempt_survives_restart(spark, dirs):
    # batch ground truth over the whole log, per key
    from sclera_spark.operators.match.regex_nfa import (
        compile_pattern,
        find_matches,
    )

    nfa = compile_pattern("A A B")
    per_key: dict[int, list[tuple[int, str]]] = {}
    for eid, uid, _ts, lab, _v in _ALL:
        per_key.setdefault(uid, []).append((eid, lab))
    expected = set()
    for uid, seq in per_key.items():
        labs = [lab for _e, lab in seq]
        for s, e in find_matches(nfa, labs):
            expected.add((uid, seq[s][0], seq[e - 1][0]))
    # the scenario is only meaningful if some match spans the cut
    cut_eid = len(_PHASE1)
    assert any(s < cut_eid <= e for _u, s, e in expected), (
        "fixture must contain a run-spanning match"
    )

    def run():
        stream = stream_from_directory(spark, dirs["in"], _SCHEMA)
        out = stream_match_state(
            stream, pattern="A A B", label_col="lab", keys=["user_id"],
            ts_col="ts", out_schema=_OUT_SCHEMA,
        )
        run_to_files(out, dirs["out_m"], dirs["ck_m"])

    _land(spark, _R1, dirs["in"])
    run()
    _land(spark, _R2, dirs["in"])
    run()

    ts_to_eid = {(uid, ts): eid for eid, uid, ts, _l, _v in _ALL}
    got = set()
    for r in spark.read.parquet(dirs["out_m"]).collect():
        got.add(
            (
                r.user_id,
                ts_to_eid[(r.user_id, r.match_start)],
                ts_to_eid[(r.user_id, r.match_end)],
            )
        )
    assert got == expected, (
        f"matches across restart diverge from batch: missing "
        f"{sorted(expected - got)}, extra {sorted(got - expected)} — a "
        f"half-buffered attempt must be recovered from the state store"
    )
