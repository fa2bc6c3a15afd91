"""Streaming ingest into manifest tables (stream_to_manifest): atomic
per-batch commits, resume across restarts, and exactly-once under REAL
batch redelivery — the checkpoint's commit marker for the last batch is
deleted so Structured Streaming genuinely re-runs it, and the manifest's
batch-id watermark must make the redelivery a no-op."""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import pytest

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from sclera_spark.sources.manifest import ManifestTable
from sclera_spark.streaming import stream_from_directory, stream_to_manifest

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _rows(lo, hi):
    base = datetime.datetime(2024, 7, 1)
    return [
        (i, base + datetime.timedelta(seconds=i), float(i) / 3.0)
        for i in range(lo, hi)
    ]


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="sclera_smani_")
    d = {
        "in": os.path.join(root, "in"),
        "tbl": os.path.join(root, "tbl"),
        "ck": os.path.join(root, "ck"),
    }
    os.makedirs(d["in"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def _land(spark, rows, path):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _ids(spark, path):
    return sorted(
        r.event_id for r in ManifestTable(path).read(spark).collect()
    )


def _run(spark, d):
    stream = stream_from_directory(
        spark, d["in"], _SCHEMA, maxFilesPerTrigger=1
    )
    stream_to_manifest(stream, d["tbl"], d["ck"])


def test_stream_ingest_and_resume(spark, dirs):
    _land(spark, _rows(0, 50), dirs["in"])
    _land(spark, _rows(50, 80), dirs["in"])
    _run(spark, dirs)
    assert _ids(spark, dirs["tbl"]) == list(range(80))
    mt = ManifestTable(dirs["tbl"])
    v_after_first = mt.version()
    assert mt.meta()["stream_batch"] >= 1  # one commit per micro-batch

    # resume: only the new file is processed, appended atomically
    _land(spark, _rows(80, 100), dirs["in"])
    _run(spark, dirs)
    assert _ids(spark, dirs["tbl"]) == list(range(100))
    assert mt.version() == v_after_first + 1


def test_redelivered_batch_is_not_duplicated(spark, dirs):
    """foreachBatch is at-least-once: after a crash between the sink
    write and the checkpoint commit, Spark re-invokes the committer with
    the SAME batch id and the SAME rows. Replay that contract directly
    against the committer and assert the duplicate is swallowed; a batch
    ABOVE the watermark must still land."""
    from sclera_spark.streaming.ops import (
        checkpoint_stream_id,
        manifest_batch_committer,
    )

    _land(spark, _rows(0, 40), dirs["in"])
    _land(spark, _rows(40, 60), dirs["in"])
    _run(spark, dirs)
    assert _ids(spark, dirs["tbl"]) == list(range(60))
    mt = ManifestTable(dirs["tbl"])
    v0 = mt.version()
    wm = mt.meta()["stream_batch"]

    # same stream identity as the run that recorded the watermark
    commit = manifest_batch_committer(
        dirs["tbl"], stream_id=checkpoint_stream_id(dirs["ck"])
    )
    # redelivery of the last batch (same id, same rows): must be a no-op
    commit(spark.createDataFrame(_rows(40, 60), _SCHEMA), wm)
    assert _ids(spark, dirs["tbl"]) == list(range(60)), (
        "redelivered batch duplicated rows"
    )
    assert mt.version() == v0  # the no-op published nothing
    # a batch above the watermark lands atomically
    commit(spark.createDataFrame(_rows(60, 70), _SCHEMA), wm + 1)
    assert _ids(spark, dirs["tbl"]) == list(range(70))
    assert mt.meta()["stream_batch"] == wm + 1


def test_watermark_survives_compaction(spark, dirs):
    """OPTIMIZE between batches must not reset the dedup watermark
    (metadata is inherited across commits)."""
    _land(spark, _rows(0, 30), dirs["in"])
    _run(spark, dirs)
    mt = ManifestTable(dirs["tbl"])
    wm = mt.meta()["stream_batch"]
    mt.append(
        spark.createDataFrame(_rows(900, 910), _SCHEMA)
    )  # unrelated DML commit
    mt.compact(spark, target_bytes=64 * 1024 * 1024)
    assert mt.meta()["stream_batch"] == wm


def test_stream_id_survives_checkpoint_move(spark, dirs):
    """ADVICE r6: the stream identity is stored INSIDE the checkpoint
    (not derived from its absolute path), so moving the checkpoint
    directory must not defeat redelivery dedup."""
    import shutil

    from sclera_spark.streaming.ops import checkpoint_stream_id

    _land(spark, _rows(0, 30), dirs["in"])
    _run(spark, dirs)
    sid = checkpoint_stream_id(dirs["ck"])
    moved = dirs["ck"] + "_moved"
    shutil.move(dirs["ck"], moved)
    assert checkpoint_stream_id(moved) == sid


def test_legacy_table_without_stream_id_still_dedups(spark, dirs):
    """ADVICE r6: a table written BEFORE stream scoping (meta has
    stream_batch but no stream_id key) must treat the first post-upgrade
    resume on the SAME checkpoint as the same stream — a replayed batch
    (crash between sink append and checkpoint commit) must not append
    twice."""
    from sclera_spark.streaming.ops import manifest_batch_committer

    df = spark.createDataFrame(_rows(0, 20), _SCHEMA)
    ManifestTable.create(df, dirs["tbl"], meta={"stream_batch": 3})
    commit = manifest_batch_committer(dirs["tbl"], stream_id="new-uuid")
    # replay of batch 3 against the legacy watermark: swallowed
    commit(spark.createDataFrame(_rows(0, 20), _SCHEMA), 3)
    assert _ids(spark, dirs["tbl"]) == list(range(20))
    # next batch lands and upgrades the meta to the scoped form
    commit(spark.createDataFrame(_rows(20, 30), _SCHEMA), 4)
    assert _ids(spark, dirs["tbl"]) == list(range(30))
    mt = ManifestTable(dirs["tbl"])
    assert mt.meta()["stream_id"] == "new-uuid"


def test_legacy_abspath_stream_id_still_dedups(spark, dirs):
    """A table whose watermark was recorded under the pre-r7
    abspath-derived stream id dedups when the caller declares that id
    as legacy (stream_to_manifest passes the checkpoint abspath)."""
    from sclera_spark.streaming.ops import manifest_batch_committer

    old_sid = os.path.abspath(dirs["ck"])
    df = spark.createDataFrame(_rows(0, 20), _SCHEMA)
    ManifestTable.create(
        df, dirs["tbl"], meta={"stream_batch": 2, "stream_id": old_sid}
    )
    commit = manifest_batch_committer(
        dirs["tbl"], stream_id="new-uuid", legacy_stream_ids=(old_sid,)
    )
    commit(spark.createDataFrame(_rows(0, 20), _SCHEMA), 2)  # replay
    assert _ids(spark, dirs["tbl"]) == list(range(20))
    commit(spark.createDataFrame(_rows(20, 25), _SCHEMA), 3)
    assert _ids(spark, dirs["tbl"]) == list(range(25))


def test_stream_ingest_to_cas_table(spark, dirs, tmp_path):
    """r7: streaming ingest can land in a CAS-committed table — each
    micro-batch is one lock-free conditional-put commit, and redelivery
    dedup works identically (batch id in the version meta)."""
    from sclera_spark.sources.manifest import CasManifestTable, FileCas
    from sclera_spark.streaming.ops import manifest_batch_committer

    cas = FileCas(str(tmp_path / "cas"))
    tbl = dirs["tbl"] + "_cas"
    commit = manifest_batch_committer(tbl, stream_id="s1", cas=cas)
    commit(spark.createDataFrame(_rows(0, 30), _SCHEMA), 0)
    mt = CasManifestTable(tbl, cas)
    assert mt.version() == 1 and mt.meta()["stream_batch"] == 0
    commit(spark.createDataFrame(_rows(30, 50), _SCHEMA), 1)
    assert mt.version() == 2
    # redelivery of batch 1: swallowed, no version published
    commit(spark.createDataFrame(_rows(30, 50), _SCHEMA), 1)
    assert mt.version() == 2
    assert sorted(r.event_id for r in mt.read(spark).collect()) == list(range(50))


def test_stream_to_manifest_cas_end_to_end(spark, dirs, tmp_path):
    """Full readStream -> foreachBatch -> CAS-committed table path,
    including a checkpointed resume that must process only new files."""
    from sclera_spark.sources.manifest import CasManifestTable, FileCas

    cas = FileCas(str(tmp_path / "cas"))
    tbl = dirs["tbl"] + "_e2e"
    _land(spark, _rows(0, 40), dirs["in"])
    stream = stream_from_directory(spark, dirs["in"], _SCHEMA, maxFilesPerTrigger=1)
    stream_to_manifest(stream, tbl, dirs["ck"], cas=cas)
    mt = CasManifestTable(tbl, cas)
    assert sorted(r.event_id for r in mt.read(spark).collect()) == list(range(40))
    v1 = mt.version()

    _land(spark, _rows(40, 55), dirs["in"])
    stream = stream_from_directory(spark, dirs["in"], _SCHEMA, maxFilesPerTrigger=1)
    stream_to_manifest(stream, tbl, dirs["ck"], cas=cas)
    assert sorted(r.event_id for r in mt.read(spark).collect()) == list(range(55))
    assert mt.version() == v1 + 1  # exactly one new batch committed


def test_prior_checkpoint_paths_dedup_after_move_and_upgrade(spark, dirs):
    """ADVICE r7: a PRE-upgrade checkpoint that was moved/renamed before
    its first run under this build matches neither the sidecar id nor
    the current abspath — the caller supplies the OLD location via
    prior_checkpoint_paths and the in-flight replayed batch stays
    deduped."""
    from sclera_spark.streaming.ops import manifest_batch_committer

    old_ck = dirs["ck"] + "_oldhome"
    old_sid = os.path.abspath(old_ck)  # id the pre-upgrade build derived
    df = spark.createDataFrame(_rows(0, 20), _SCHEMA)
    ManifestTable.create(
        df, dirs["tbl"], meta={"stream_batch": 5, "stream_id": old_sid}
    )
    # what stream_to_manifest(..., prior_checkpoint_paths=(old_ck,))
    # constructs after the move: fresh sidecar id + both abspaths legacy
    commit = manifest_batch_committer(
        dirs["tbl"],
        stream_id="fresh-sidecar-id",
        legacy_stream_ids=(
            os.path.abspath(dirs["ck"]),
            os.path.abspath(old_ck),
        ),
    )
    commit(spark.createDataFrame(_rows(0, 20), _SCHEMA), 5)  # replay
    assert _ids(spark, dirs["tbl"]) == list(range(20))
    commit(spark.createDataFrame(_rows(20, 30), _SCHEMA), 6)
    assert _ids(spark, dirs["tbl"]) == list(range(30))
    # meta upgraded to the durable sidecar identity
    assert ManifestTable(dirs["tbl"]).meta()["stream_id"] == "fresh-sidecar-id"


def test_auto_compact_converges_file_count_with_empty_cdf(spark, tmp_path):
    """Opt-in auto-compaction: a stream of small per-batch commits
    keeps the live-file count bounded (the slice of sub-target files
    is bin-packed after each ingest commit), rows are never lost or
    duplicated, and the compaction commits feed NOTHING into the
    change feed (the exceptAll cancels rewritten rows)."""
    from sclera_spark.streaming.ops import manifest_batch_committer

    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 10).selectExpr("id AS k").repartition(2), path
    )
    mt = ManifestTable(path)
    mt.amend_meta(
        {"auto_compact": {"target_bytes": 64 * 1024 * 1024, "min_files": 3}}
    )
    commit = manifest_batch_committer(path, stream_id="s1")
    for b in range(8):
        commit(
            spark.range(100 * (b + 1), 100 * (b + 1) + 20)
            .selectExpr("id AS k")
            .repartition(2),
            b,
        )
    # without compaction: 2 + 8*2 = 18 files; with it the count stays
    # bounded by min_files + one batch's files
    assert len(mt.files()) <= 5
    got = sorted(r.k for r in mt.read(spark).collect())
    want = sorted(
        list(range(10))
        + [k for b in range(8) for k in range(100 * (b + 1), 100 * (b + 1) + 20)]
    )
    assert got == want  # nothing lost, nothing duplicated
    # the full change feed equals exactly the ingested rows: compaction
    # commits (which add AND remove) contributed zero net changes
    feed = mt.changes(spark, 0)
    ins = feed.filter("_change_type = 'insert'")
    dels = feed.filter("_change_type = 'delete'")
    assert dels.count() == 0
    assert sorted(r.k for r in ins.collect()) == want
    # the batch-id dedup watermark survived the compaction commits
    assert mt.meta().get("stream_batch") == 7


def test_auto_compact_failure_warns_once_and_is_observable(
    spark, tmp_path, monkeypatch
):
    """r11 (verdict #6): a failing auto-compaction must never gate the
    ingest commit — but it must not vanish either. The committer warns
    ONCE per table, the sidecar records last_compact_error, and DESCRIBE
    DETAIL surfaces it; a later successful attempt clears the error."""
    import warnings as _warnings

    import sclera_spark.sources.manifest as man
    from sclera_spark.streaming.ops import manifest_batch_committer

    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 10).selectExpr("id AS k").repartition(2), path
    )
    mt = ManifestTable(path)
    mt.amend_meta(
        {"auto_compact": {"target_bytes": 64 * 1024 * 1024, "min_files": 2}}
    )
    monkeypatch.setattr(
        ManifestTable,
        "compact",
        lambda self, *a, **kw: (_ for _ in ()).throw(
            RuntimeError("disk full (forced)")
        ),
    )
    man._autocompact_warned.discard(mt.path)
    commit = manifest_batch_committer(path, stream_id="s-fail")
    with pytest.warns(UserWarning, match="auto-compaction .* failed"):
        commit(spark.range(100, 120).selectExpr("id AS k"), 0)
    # the ingest commit itself landed despite the compaction failure
    assert sorted(r.k for r in mt.read(spark).collect()) == sorted(
        list(range(10)) + list(range(100, 120))
    )
    state = mt.compact_state()
    assert "disk full (forced)" in state["last_compact_error"]
    assert state["last_compact_at"]
    # warn-once: the second failing batch is silent
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        commit(spark.range(200, 210).selectExpr("id AS k"), 1)
    # DESCRIBE DETAIL surfaces the sidecar
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    ddl = engine.ddl()
    ddl.managed["t_ac"] = path
    ddl.manifest_tables.add("t_ac")
    detail = ddl._describe_detail("t_ac")[0]
    assert "disk full (forced)" in detail["last_compact_error"]
    # recovery: a successful attempt clears the error
    monkeypatch.undo()
    commit(spark.range(300, 310).selectExpr("id AS k"), 2)
    assert mt.compact_state()["last_compact_error"] is None


def test_stream_upsert_applies_cdc_per_batch(spark, tmp_path):
    """r11 CDC upsert (manifest_upsert_committer): each batch's rows
    REPLACE the table rows sharing their key in ONE atomic commit;
    order_col picks the last version per key within a batch; only hit
    files are rewritten; a redelivered batch is a no-op; a keyed
    ambiguity without order_col refuses."""
    from sclera_spark.streaming.ops import manifest_upsert_committer

    path = str(tmp_path / "cdc")
    commit = manifest_upsert_committer(
        path, keys=["k"], stream_id="s1", order_col="seq"
    )

    def rows(*triples):
        return spark.createDataFrame(
            list(triples), "k int, v string, seq int"
        )

    commit(rows((1, "a", 1), (2, "b", 1), (3, "c", 1)), 0)
    mt = ManifestTable(path)
    assert sorted(
        (r.k, r.v) for r in mt.read(spark).collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
    # batch 1: update k=2 twice (last wins), insert k=4 — only the
    # hit file(s) rewrite, every other pre-batch file stays live
    before_files = set(mt.files())
    commit(rows((2, "mid", 1), (2, "new", 2), (4, "d", 1)), 1)
    untouched = before_files & set(mt.files())
    rewritten = before_files - set(mt.files())
    assert rewritten and untouched or len(before_files) == 1
    assert sorted(
        (r.k, r.v) for r in mt.read(spark).collect()
    ) == [(1, "a"), (2, "new"), (3, "c"), (4, "d")]
    # redelivery of batch 1: exactly-once, nothing changes
    v = mt.version()
    commit(rows((2, "GHOST", 9), (4, "GHOST", 9)), 1)
    assert mt.version() == v
    assert sorted(r.v for r in mt.read(spark).collect()) == [
        "a", "c", "d", "new",
    ]
    # append-only batch (no key hits): pure append, no file rewritten
    live_before = set(mt.files())
    commit(rows((9, "z", 1)), 2)
    assert live_before <= set(mt.files())  # nothing swapped out
    assert (9, "z") in {(r.k, r.v) for r in mt.read(spark).collect()}
    # ambiguity refusal without order_col
    amb = manifest_upsert_committer(path, keys=["k"], stream_id="s1")
    with pytest.raises(ValueError, match="order_col"):
        amb(rows((1, "x", 1), (1, "y", 2)), 3)


def test_stream_upsert_end_to_end_with_restart(spark, tmp_path):
    """stream_upsert_to_manifest drives the committer through a REAL
    Structured Streaming checkpoint: two drains of a growing CDC
    directory land upserts exactly once across the restart."""
    from sclera_spark.streaming import (
        stream_from_directory,
        stream_upsert_to_manifest,
    )
    from pyspark.sql.types import IntegerType, StringType

    src = tmp_path / "in"
    src.mkdir()
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")
    schema = StructType(
        [
            StructField("k", IntegerType()),
            StructField("v", StringType()),
            StructField("seq", LongType()),
        ]
    )
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    stream_upsert_to_manifest(
        stream_from_directory(spark, str(src), schema),
        table, ckpt, keys=["k"], order_col="seq",
    )
    mt = ManifestTable(table)
    assert sorted(
        (r.k, r.v) for r in mt.read(spark).collect()
    ) == [(1, "a"), (2, "b")]
    spark.createDataFrame(
        [(2, "b2", 2), (3, "c", 1)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    stream_upsert_to_manifest(
        stream_from_directory(spark, str(src), schema),
        table, ckpt, keys=["k"], order_col="seq",
    )
    assert sorted(
        (r.k, r.v) for r in mt.read(spark).collect()
    ) == [(1, "a"), (2, "b2"), (3, "c")]


def test_stream_upsert_tombstone_deletes(spark, tmp_path):
    """delete_col tombstones (Debezium op='d' shape): a key whose LAST
    batch version is flagged is REMOVED; the transport column never
    lands in the table; a delete-only batch matching nothing still
    advances the watermark atomically."""
    from sclera_spark.streaming.ops import manifest_upsert_committer

    path = str(tmp_path / "cdcd")
    commit = manifest_upsert_committer(
        path, keys=["k"], stream_id="s1", order_col="seq",
        delete_col="deleted",
    )

    def rows(*quads):
        return spark.createDataFrame(
            list(quads), "k int, v string, seq int, deleted boolean"
        )

    commit(rows((1, "a", 1, False), (2, "b", 1, False)), 0)
    mt = ManifestTable(path)
    assert mt.read(spark).columns == ["k", "v", "seq"]  # no transport col
    # delete k=1; update k=2; a delete that is superseded by a later
    # insert in the SAME batch survives (last version wins)
    commit(
        rows(
            (1, "x", 2, True),
            (2, "b2", 2, False),
            (3, "c", 1, True),
            (3, "c", 2, False),
        ),
        1,
    )
    assert sorted((r.k, r.v) for r in mt.read(spark).collect()) == [
        (2, "b2"), (3, "c"),
    ]
    # delete-only batch with no matching keys: watermark still advances
    v = mt.version()
    commit(rows((99, "zz", 1, True)), 2)
    assert mt.version() == v + 1
    commit(rows((99, "GHOST", 9, False)), 2)  # redelivery: no-op
    assert mt.version() == v + 1
    assert sorted((r.k, r.v) for r in mt.read(spark).collect()) == [
        (2, "b2"), (3, "c"),
    ]


_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", __import__("pyspark.sql.types", fromlist=["StringType"]).StringType()),
    ]
)


def _doc(i, body):
    # the body phrase dominates the shingle set (repeated), so two docs
    # are near-dups iff they share the SAME body phrase
    return (i, (" " + body) * 30)


@pytest.fixture()
def gdirs():
    root = tempfile.mkdtemp(prefix="sclera_gate_")
    d = {
        "in": os.path.join(root, "in"),
        "kept": os.path.join(root, "kept"),
        "sketch": os.path.join(root, "sketch"),
        "ck": os.path.join(root, "ck"),
    }
    os.makedirs(d["in"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def _land_docs(spark, rows, path):
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _gate(spark, d):
    from sclera_spark.streaming import stream_crawl_gate

    return stream_crawl_gate(
        stream_from_directory(spark, d["in"], _DOC_SCHEMA),
        d["sketch"],
        d["kept"],
        d["ck"],
        threshold=0.7,
    )


def test_stream_crawl_gate_end_to_end(spark, gdirs):
    """Streaming crawl gate: batch 1 seeds the corpus; batch 2's
    near-copies of batch-1 survivors are rejected, its novel docs are
    admitted, a within-batch duplicate pair collapses to one survivor,
    and the sketch table tracks exactly the kept set."""
    d = gdirs
    _land_docs(
        spark,
        [_doc(1, "alpha wolf"), _doc(2, "beta fish"), _doc(3, "gamma bird")],
        d["in"],
    )
    _gate(spark, d)
    assert _ids_kept(spark, d) == [1, 2, 3]

    # batch 2: near-copy of doc 1, one genuinely new doc, and a
    # within-batch near-dup pair (10, 11)
    near1 = _doc(9, "alpha wolf")
    novel = _doc(8, "delta whale entirely new topic")
    twin_a = _doc(10, "epsilon crab")
    twin_b = _doc(11, "epsilon crab")
    _land_docs(spark, [near1, novel, twin_a, twin_b], d["in"])
    _gate(spark, d)
    assert _ids_kept(spark, d) == [1, 2, 3, 8, 10]
    # the sketch table covers exactly the kept set (incremental append)
    sk_ids = sorted(
        r.id for r in ManifestTable(d["sketch"]).read(spark).collect()
    )
    assert sk_ids == [1, 2, 3, 8, 10]
    # re-running with no new input is a clean no-op
    v_kept = ManifestTable(d["kept"]).version()
    _gate(spark, d)
    assert ManifestTable(d["kept"]).version() == v_kept
    assert _ids_kept(spark, d) == [1, 2, 3, 8, 10]


def _ids_kept(spark, d):
    return sorted(
        r.doc_id for r in ManifestTable(d["kept"]).read(spark).collect()
    )


def test_crawl_gate_committer_redelivery_converges(spark, gdirs, monkeypatch):
    """Crash BETWEEN the kept commit and the sketch commit, then
    redeliver the same batch: the gate re-runs against the pre-batch
    corpus (same survivors), the kept append no-ops on its watermark,
    and the sketch append completes — exactly-once for the pair. A
    redelivery AFTER full success no-ops outright (gating against a
    corpus already holding this batch's sketches would self-reject)."""
    from sclera_spark.streaming.ops import crawl_gate_committer

    d = gdirs
    commit = crawl_gate_committer(
        d["sketch"], d["kept"], stream_id="s1", threshold=0.7
    )
    b0 = spark.createDataFrame(
        [_doc(1, "alpha wolf"), _doc(2, "beta fish")], _DOC_SCHEMA
    )
    commit(b0, 0)
    assert _ids_kept(spark, d) == [1, 2]

    # make the SKETCH append die once, after the kept commit
    orig_append = ManifestTable.append
    state = {"boom": True}

    def dying(self, df, meta=None):
        if state["boom"] and os.path.realpath(self.path) == os.path.realpath(
            d["sketch"]
        ):
            state["boom"] = False
            raise OSError("simulated crash between the pair's commits")
        return orig_append(self, df, meta=meta)

    monkeypatch.setattr(ManifestTable, "append", dying)
    b1 = spark.createDataFrame(
        [_doc(5, "zeta moth new topic"), _doc(9, "alpha wolf")], _DOC_SCHEMA
    )
    with pytest.raises(OSError, match="simulated"):
        commit(b1, 1)
    # kept advanced (survivor 5 admitted, near-copy 9 rejected), sketch
    # did not
    assert _ids_kept(spark, d) == [1, 2, 5]
    assert sorted(
        r.id for r in ManifestTable(d["sketch"]).read(spark).collect()
    ) == [1, 2]
    kept_v = ManifestTable(d["kept"]).version()
    # redelivery: converges without double-appending the kept rows
    commit(b1, 1)
    assert _ids_kept(spark, d) == [1, 2, 5]
    assert ManifestTable(d["kept"]).version() == kept_v
    assert sorted(
        r.id for r in ManifestTable(d["sketch"]).read(spark).collect()
    ) == [1, 2, 5]
    # full-success redelivery: outright no-op (both tables untouched)
    sk_v = ManifestTable(d["sketch"]).version()
    commit(b1, 1)
    assert ManifestTable(d["kept"]).version() == kept_v
    assert ManifestTable(d["sketch"]).version() == sk_v


def test_crawl_gate_refuses_foreign_watermark(spark, gdirs):
    """r13 review: a gate table carrying ANOTHER stream's batch
    watermark must refuse loudly — the committer's legacy same-stream
    fallbacks could otherwise silently no-op ONE side of the pair
    (kept grows, sketch doesn't, future near-dups of kept docs are
    admitted)."""
    from sclera_spark.llm.dedup import minhash_sketch
    from sclera_spark.streaming.ops import crawl_gate_committer

    d = gdirs
    seed = spark.createDataFrame([_doc(1, "alpha wolf")], _DOC_SCHEMA)
    sk = minhash_sketch(seed, "text", 128, 5).selectExpr(
        "doc_id AS id", "minhash", "hset"
    )
    ManifestTable.create(
        sk, d["sketch"], meta={"stream_batch": 3, "stream_id": "other"}
    )
    commit = crawl_gate_committer(
        d["sketch"], d["kept"], stream_id="mine", threshold=0.7
    )
    b = spark.createDataFrame([_doc(2, "beta fish")], _DOC_SCHEMA)
    with pytest.raises(ValueError, match="watermark"):
        commit(b, 0)
    # nothing half-committed
    assert not ManifestTable.exists(d["kept"])


# ---- r14: streaming token-budget admission gate ----


@pytest.fixture()
def tbdirs():
    root = tempfile.mkdtemp(prefix="sclera_tb_")
    d = {
        "in": os.path.join(root, "in"),
        "kept": os.path.join(root, "kept"),
        "ck": os.path.join(root, "ck"),
    }
    os.makedirs(d["in"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def _tb_doc(i, n_tokens):
    return (i, " ".join(f"w{j}" for j in range(n_tokens)))


def test_stream_token_budget_end_to_end(spark, tbdirs):
    """Streaming token-budget gate: batch 1 part-fills the budget in
    md5 order, batch 2 admits only until the budget fills (take-until:
    the last admitted doc may overshoot), batch 3 admits nothing and
    is a pure watermark commit; the running total in the manifest meta
    matches the admitted docs' token sum exactly; rerun with no new
    input is a no-op."""
    from sclera_spark.streaming import stream_token_budget

    d = tbdirs

    def run():
        return stream_token_budget(
            stream_from_directory(spark, d["in"], _DOC_SCHEMA),
            d["kept"],
            budget=100,
            checkpoint_dir=d["ck"],
        )

    # batch 1: 3 docs x 20 tokens = 60 <= 100 -> all admitted
    _land_docs(spark, [_tb_doc(i, 20) for i in (1, 2, 3)], d["in"])
    run()
    mt = ManifestTable(d["kept"])
    assert sorted(r.doc_id for r in mt.read(spark).collect()) == [1, 2, 3]
    assert mt.meta()["tb_tokens"] == 60

    # batch 2: 4 docs x 20 tokens; remaining 40 -> exactly 2 admitted
    # in md5 order; the running total advances by the ADMITTED sum
    _land_docs(spark, [_tb_doc(i, 20) for i in (4, 5, 6, 7)], d["in"])
    run()
    kept2 = sorted(r.doc_id for r in mt.read(spark).collect())
    assert len(kept2) == 5 and kept2[:3] == [1, 2, 3]
    assert mt.meta()["tb_tokens"] == 100
    # the admitted pair is the md5(salt||id) order prefix
    import hashlib

    order = sorted(
        (4, 5, 6, 7), key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )
    assert set(kept2) - {1, 2, 3} == set(order[:2])

    # batch 3: budget full -> nothing admitted, watermark still bumps
    v = mt.version()
    _land_docs(spark, [_tb_doc(8, 5)], d["in"])
    run()
    assert sorted(r.doc_id for r in mt.read(spark).collect()) == kept2
    assert mt.version() == v + 1  # the watermark amend commit
    assert mt.meta()["tb_tokens"] == 100

    # rerun with no new input: clean no-op
    v2 = mt.version()
    run()
    assert mt.version() == v2


def test_token_budget_committer_redelivery_and_overshoot(spark, tbdirs):
    """Direct committer semantics: a redelivered batch (id at/below the
    watermark) is a no-op — the rows AND the running total were
    committed atomically, so replay cannot double-count; take-until
    overshoot is carried into the next batch's remaining budget; a
    foreign-stream watermark refuses."""
    from sclera_spark.streaming.ops import token_budget_committer

    d = tbdirs
    commit = token_budget_committer(d["kept"], budget=50, stream_id="s1")
    b0 = spark.createDataFrame(
        [_tb_doc(1, 30), _tb_doc(2, 30)], _DOC_SCHEMA
    )
    commit(b0, 0)
    mt = ManifestTable(d["kept"])
    # take-until: both docs admitted (second starts at prior 30 < 50),
    # total overshoots to 60
    assert mt.read(spark).count() == 2
    assert mt.meta()["tb_tokens"] == 60
    v = mt.version()
    # redelivery of batch 0: pure no-op (no version, no total change)
    commit(b0, 0)
    assert mt.version() == v and mt.meta()["tb_tokens"] == 60
    # next batch: remaining <= 0 -> watermark-only commit
    commit(spark.createDataFrame([_tb_doc(3, 5)], _DOC_SCHEMA), 1)
    assert mt.read(spark).count() == 2
    assert mt.meta()["tb_tokens"] == 60
    assert mt.meta()["stream_batch"] == 1
    # foreign stream watermark refuses loudly
    import pytest as _pytest

    foreign = token_budget_committer(d["kept"], budget=50, stream_id="s2")
    with _pytest.raises(ValueError, match="watermark"):
        foreign(spark.createDataFrame([_tb_doc(4, 5)], _DOC_SCHEMA), 0)


def test_token_budget_committer_matches_batch_sampler(spark, tbdirs):
    """Equivalence pin: feeding batches through the streaming gate
    admits EXACTLY the documents the batch sampler draws when run on
    the concatenation ordered by (batch, md5) — i.e. the streaming
    form is the batch semantics applied per arrival batch."""
    from sclera_spark.llm import token_budget_sample
    from sclera_spark.streaming.ops import token_budget_committer

    d = tbdirs
    docs = [(i, " ".join("t" for _ in range(7 + (i % 5)))) for i in range(40)]
    batches = [docs[:15], docs[15:30], docs[30:]]
    commit = token_budget_committer(d["kept"], budget=200, stream_id="s")
    for bi, rows in enumerate(batches):
        commit(spark.createDataFrame(rows, _DOC_SCHEMA), bi)
    got = sorted(
        r.doc_id for r in ManifestTable(d["kept"]).read(spark).collect()
    )
    # reference: per-batch take-until with the carried remaining budget
    import hashlib

    want, done = [], 0
    for rows in batches:
        rem = 200 - done
        if rem <= 0:
            break
        order = sorted(
            rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
        )
        acc = 0
        for i, txt in order:
            if acc < rem:
                want.append(i)
                acc += len(txt.split())
        done += acc if acc <= rem else acc  # admitted sum (may overshoot)
    assert got == sorted(want)


def test_token_budget_committer_refuses_column_collision(spark, tbdirs):
    """r14 review pin: a batch whose schema carries __h/__n/__prior
    refuses loudly (same contract as the batch sampler) instead of
    silently persisting the synthetic working values."""
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.types import StringType

    from sclera_spark.streaming.ops import token_budget_committer

    d = tbdirs
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("__h", StringType()),
        ]
    )
    commit = token_budget_committer(d["kept"], budget=50, stream_id="s")
    b = spark.createDataFrame([(1, "a b c", "keepme")], schema)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="__h"):
        commit(b, 0)
