"""Manifest tables as a streaming SOURCE (sources/stream_source.py —
pyspark Python Data Source): version-offset tailing with exactly-once
delivery, Delta-style change-commit refusal, starting_version, and the
vacuumed-gap loud error."""

from __future__ import annotations

import os

import pytest

from sclera_spark.sources.manifest import ManifestTable
from sclera_spark.sources.stream_source import ManifestStreamSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ManifestStreamSource)
    return spark


def _drain(spark, path, cp, sink: list, **opts):
    """Run the stream until every available version is consumed; rows
    land in ``sink`` as (batch_id, sorted rows)."""
    reader = spark.readStream.format("sclera_manifest").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    df = reader.load()

    def feed(bdf, bid):
        sink.append((bid, sorted(tuple(r) for r in bdf.collect())))

    q = (
        df.writeStream.foreachBatch(feed)
        .option("checkpointLocation", cp)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _rows(pairs):
    return sorted(r for _, rows in pairs for r in rows)


def test_stream_tail_is_exactly_once(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    ManifestTable.create(
        spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"), path
    )
    mt = ManifestTable(path)

    got: list = []
    _drain(spark, path, cp, got)
    assert _rows(got) == [(i, 2 * i) for i in range(10)]

    # two more commits; the SAME checkpoint resumes and sees ONLY them
    mt.append(spark.range(10, 15).selectExpr("id AS k", "id * 2 AS v"))
    mt.append(spark.range(15, 18).selectExpr("id AS k", "id * 2 AS v"))
    got2: list = []
    _drain(spark, path, cp, got2)
    assert _rows(got2) == [(i, 2 * i) for i in range(10, 18)]

    # nothing new -> nothing delivered (no replay, no duplicates)
    got3: list = []
    _drain(spark, path, cp, got3)
    assert _rows(got3) == []


def test_change_commit_refused_then_skippable(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 8).selectExpr("id AS k", "id * 2 AS v"), path
    )
    mt = ManifestTable(path)
    # consume v1, then make a REWRITE commit (removes files)
    got: list = []
    _drain(spark, path, str(tmp_path / "cp1"), got)
    mt.overwrite(spark.range(100, 103).selectExpr("id AS k", "id * 2 AS v"))

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="append stream"):
        _drain(spark, path, str(tmp_path / "cp1"), [])

    # skip_change_commits=true streams the version's ADDED files only
    got2: list = []
    _drain(
        spark,
        path,
        str(tmp_path / "cp1"),
        got2,
        skip_change_commits="true",
    )
    assert _rows(got2) == [(i, 2 * i) for i in range(100, 103)]


def test_starting_version_streams_only_future(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 5).selectExpr("id AS k", "id * 2 AS v"), path
    )
    mt = ManifestTable(path)
    v_now = mt.version()
    mt.append(spark.range(5, 7).selectExpr("id AS k", "id * 2 AS v"))
    got: list = []
    _drain(
        spark,
        path,
        str(tmp_path / "cp"),
        got,
        starting_version=str(v_now),
    )
    assert _rows(got) == [(5, 10), (6, 12)]


def test_vacuumed_gap_fails_loudly(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 4).selectExpr("id AS k"), path
    )
    mt = ManifestTable(path)
    mt.append(spark.range(4, 8).selectExpr("id AS k"))
    mt.overwrite(spark.range(8, 12).selectExpr("id AS k"))
    mt.vacuum(keep_versions=1)

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        StreamingQueryException, match="no longer retained"
    ):
        _drain(spark, path, str(tmp_path / "cp"), [])


def test_vacuumed_base_version_fails_instead_of_reingesting(
    registered, tmp_path
):
    """A stream stopped at version N whose BASE (N) is vacuumed while
    N+1 is retained must fail loudly: silently treating prev_files as
    empty would deliver the ENTIRE N+1 snapshot as inserts — a
    duplicate re-ingest that breaks exactly-once."""
    spark = registered
    path = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    ManifestTable.create(
        spark.range(0, 4).selectExpr("id AS k"), path
    )
    mt = ManifestTable(path)
    mt.append(spark.range(4, 6).selectExpr("id AS k"))  # v2
    got: list = []
    _drain(spark, path, cp, got)  # checkpoint committed through v2
    assert _rows(got) == [(i,) for i in range(6)]

    mt.append(spark.range(6, 8).selectExpr("id AS k"))  # v3
    mt.vacuum(keep_versions=1)  # drops v1, v2 — the stream's base

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        StreamingQueryException, match="the batch's base"
    ):
        _drain(spark, path, cp, got)
    # nothing was double-delivered by the failed attempt
    assert _rows(got) == [(i,) for i in range(6)]


def test_schema_prefers_manifest_meta_table_schema(registered, tmp_path):
    """When the manifest meta records the evolved table_schema (ALTER
    TABLE ADD COLUMN), the stream schema comes from THAT — not from
    footer sampling, which can miss a column confined to mid-list
    files after a compaction reorders the snapshot."""
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(spark.range(0, 3).selectExpr("id AS k"), path)
    mt = ManifestTable(path)
    import json as _json

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    evolved = StructType(
        [
            StructField("k", LongType(), True),
            StructField("later", LongType(), True),
        ]
    )
    mt.amend_meta(
        {"table_schema": _json.dumps(evolved.jsonValue())}
    )
    df = (
        spark.readStream.format("sclera_manifest")
        .option("path", path)
        .load()
    )
    assert [f.name for f in df.schema.fields] == ["k", "later"]
    got: list = []
    _drain(spark, path, str(tmp_path / "cp"), got)
    assert _rows(got) == [(0, None), (1, None), (2, None)]


def test_schema_inference_and_missing_column_nulls(registered, tmp_path):
    """Schema comes from the current snapshot; an OLD file lacking a
    column that the current schema carries streams NULLs for it."""
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(spark.range(0, 3).selectExpr("id AS k"), path)
    mt = ManifestTable(path)
    mt.append(
        spark.range(3, 5).selectExpr("id AS k", "id * 2 AS extra")
    )
    got: list = []
    _drain(spark, path, str(tmp_path / "cp"), got)
    rows = _rows(got)
    assert (0, None) in rows and (3, 6) in rows and len(rows) == 5


def test_engine_helper_and_describe_history(spark, tables, tmp_path):
    """engine.stream_from_manifest resolves a REGISTERED table name,
    and DESCRIBE HISTORY shows the per-version operation stamps with
    add/remove deltas, newest first."""
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    engine.execute(
        "CREATE TABLE hist_t AS SELECT o_orderkey, o_totalprice "
        "FROM orders WHERE o_orderkey < 200"
    )
    try:
        engine.execute("ALTER TABLE hist_t SET FORMAT MANIFEST")
        engine.execute(
            "INSERT INTO hist_t SELECT o_orderkey, o_totalprice "
            "FROM orders WHERE o_orderkey BETWEEN 200 AND 400"
        )
        engine.execute("DELETE FROM hist_t WHERE o_orderkey < 5")

        hist = engine.execute("DESCRIBE HISTORY hist_t")
        assert [h["version"] for h in hist] == [3, 2, 1]
        assert hist[-1]["op"] == "convert"
        assert hist[1]["op"] == "append" and hist[1]["removed"] == 0
        assert hist[0]["op"] == "replace" and hist[0]["removed"] >= 1
        assert all(h["ts"] and h["rows"] > 0 for h in hist)

        # the DELETE at v3 is a change commit: the default stream
        # refuses it loudly...
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        df = engine.stream_from_manifest("hist_t")
        q = (
            df.writeStream.foreachBatch(lambda b, i: None)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .start()
        )
        try:
            with pytest.raises(StreamingQueryException, match="append stream"):
                q.processAllAvailable()
        finally:
            q.stop()

        # ...and the skip option streams through it, via the helper
        got: list = []
        df2 = engine.stream_from_manifest(
            "hist_t", skip_change_commits="true"
        )
        q2 = (
            df2.writeStream.foreachBatch(
                lambda b, i: got.append(b.count())
            )
            .option("checkpointLocation", str(tmp_path / "cp2"))
            .start()
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        # delivered = every ADDED file's rows: all of v1 + v2's adds +
        # v3's rewritten file (the change commit's added side only)
        mt = ManifestTable(engine._ddl._path("hist_t"))
        f2 = set(os.path.basename(p) for p in mt.files(2))
        f3 = set(os.path.basename(p) for p in mt.files(3))
        v3_added = sum(mt.file_rows(3)[n] for n in f3 - f2)
        assert sum(got) == mt.row_count(2) + v3_added
    finally:
        engine.execute("DROP TABLE hist_t")


def test_max_versions_per_trigger_paces_batches(registered, tmp_path):
    """Admission control: with max_versions_per_trigger=1 a running
    stream consumes a burst of commits as one micro-batch per commit
    (bounded chunks — the Delta maxFilesPerTrigger shape), never one
    giant batch."""
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 4).selectExpr("id AS k"), path
    )
    mt = ManifestTable(path)
    batches: list = []
    df = (
        spark.readStream.format("sclera_manifest")
        .option("path", path)
        .option("max_versions_per_trigger", "1")
        .load()
    )
    q = (
        df.writeStream.foreachBatch(
            lambda b, i: batches.append(b.count())
        )
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert batches == [4]  # v1
        for j in range(3):  # a burst of three commits
            mt.append(
                spark.range(10 * (j + 1), 10 * (j + 1) + 2).selectExpr(
                    "id AS k"
                )
            )
        q.processAllAvailable()
    finally:
        q.stop()
    # the burst arrived as one batch per version, 2 rows each
    assert batches == [4, 2, 2, 2]


# ------------------------------------------------ change-feed streaming


def test_read_changes_streams_cow_commits(registered, tmp_path):
    """read_changes=true: append commits stream as tagged inserts and a
    COW rewrite streams ONLY the touched rows as delete+insert — the
    carried-over rows of the rewrite cancel multiset-wise. The batch
    TABLE_CHANGES column shape, delivered incrementally."""
    from pyspark.sql import functions as F

    spark = registered
    path = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    ManifestTable.create(
        spark.range(0, 20).selectExpr("id AS k", "id * 2 AS v"), path
    )
    mt = ManifestTable(path)
    victim = mt.files()[0]
    old = spark.read.parquet(victim)
    mt.replace_files(
        [victim],
        old.withColumn(
            "v",
            F.when(F.col("k") < 3, F.col("v") + 100).otherwise(F.col("v")),
        ),
    )
    v_cow = mt.version()
    mt.append(spark.range(100, 103).selectExpr("id AS k", "id AS v"))

    got: list = []
    _drain(spark, path, cp, got, read_changes="true")
    rows = [r for _, batch in got for r in batch]
    # every row carries (k, v, _change_type, _commit_version,
    # _commit_timestamp) — the batch TABLE_CHANGES shape
    assert all(len(r) == 5 for r in rows)
    assert all(r[4] is not None for r in rows)
    ins_v1 = sorted((r[0], r[1]) for r in rows
                    if r[3] == 1 and r[2] == "insert")
    assert ins_v1 == [(i, 2 * i) for i in range(20)]
    cow = sorted((r[2], r[0], r[1]) for r in rows if r[3] == v_cow)
    touched = sorted(r["k"] for r in old.where("k < 3").collect())
    assert cow == (
        [("delete", k, 2 * k) for k in touched]
        + [("insert", k, 2 * k + 100) for k in touched]
    )
    appended = sorted((r[2], r[0]) for r in rows if r[3] == v_cow + 1)
    assert appended == [("insert", k) for k in (100, 101, 102)]


def test_read_changes_respects_change_bytes_cap(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 50).selectExpr("id AS k", "id AS v"), path
    )
    mt = ManifestTable(path)
    victim = mt.files()[0]
    mt.replace_files(
        [victim], spark.read.parquet(victim).where("k % 2 = 0")
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    got: list = []
    with pytest.raises(
        (RuntimeError, StreamingQueryException), match="max_change_bytes"
    ):
        _drain(
            spark, path, str(tmp_path / "cp"), got,
            read_changes="true", max_change_bytes="10",
        )


def test_read_changes_and_skip_change_commits_contradict(
    registered, tmp_path
):
    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(spark.range(3).selectExpr("id AS k"), path)
    with pytest.raises(Exception, match="contradictory"):
        got: list = []
        _drain(
            spark, path, str(tmp_path / "cp"), got,
            read_changes="true", skip_change_commits="true",
        )


def test_cdc_replication_end_to_end(registered, tmp_path):
    """The full incremental-replication shape the change feed exists
    for: a source manifest table takes appends AND COW DML; a stream
    with read_changes=true applies each micro-batch to a replica
    (delete-then-insert per batch, in _commit_version order); after
    drain the replica equals the source snapshot exactly. This is the
    manifest->manifest pipeline WITH updates — the append-only
    exactly-once path extended to CDC."""
    from pyspark.sql import functions as F

    spark = registered
    src_path = str(tmp_path / "src")
    ManifestTable.create(
        spark.range(0, 40).selectExpr("id AS k", "id * 2 AS v"), src_path
    )
    src = ManifestTable(src_path)
    # v2: append
    src.append(spark.range(100, 120).selectExpr("id AS k", "id AS v"))
    # v3: COW update of a slice
    victim = src.files()[0]
    src.replace_files(
        [victim],
        spark.read.parquet(victim).withColumn(
            "v",
            F.when(F.col("k") % 7 == 0, F.col("v") + 1000)
            .otherwise(F.col("v")),
        ),
    )
    # v4: COW delete of a slice
    victim2 = src.files()[-1]
    src.replace_files(
        [victim2], spark.read.parquet(victim2).where("k % 5 != 0")
    )

    replica: dict[int, int] = {}

    def apply(bdf, bid):
        # apply in commit order; deletes before inserts within a commit
        for r in sorted(
            bdf.collect(),
            key=lambda r: (r["_commit_version"], r["_change_type"]),
        ):
            if r["_change_type"] == "delete":
                assert replica.pop(r["k"]) == r["v"]
            else:
                assert r["k"] not in replica
                replica[r["k"]] = r["v"]

    q = (
        spark.readStream.format("sclera_manifest")
        .option("path", src_path)
        .option("read_changes", "true")
        .load()
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {
        r["k"]: r["v"]
        for r in src.read(spark).collect()
    }
    assert replica == want


def test_max_bytes_per_trigger_splits_backfill_commit(
    registered, tmp_path
):
    """A giant backfill commit that lands while the stream is running
    splits across micro-batches at FILE granularity under
    max_bytes_per_trigger — bounded per-batch bytes, exactly-once
    delivery, and a restart resumes from the checkpointed
    {version, file_idx} offset without loss or duplication. (Like
    max_versions_per_trigger, the FIRST batch of a run is unpaced:
    offsets must never regress behind the checkpoint, and a fresh
    reader cannot see the checkpoint position.)"""
    import os as _os

    spark = registered
    path = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    ManifestTable.create(
        spark.range(0, 100).selectExpr("id AS k", "repeat('x', 50) AS pad"),
        path,
    )
    mt = ManifestTable(path)

    batches: list = []

    def feed(bdf, bid):
        batches.append((bid, sorted(r.k for r in bdf.collect())))

    q = (
        spark.readStream.format("sclera_manifest")
        .option("path", path)
        .option("max_bytes_per_trigger", "1")  # placeholder; reset below
        .load()
    )
    # size the cap from the backfill files themselves
    q = None
    backfill = (
        spark.range(1000, 9000)
        .selectExpr("id AS k", "repeat('x', 50) AS pad")
        .repartition(8)
    )
    # stage once to learn per-file sizes, then discard
    scratch, names = mt._stage(backfill)
    sizes = [
        _os.path.getsize(_os.path.join(scratch, n)) for n in names
    ]
    ManifestTable.discard_staged([(scratch, names)])
    cap = int(sum(sizes) / 3)  # force ~3-4 paced batches

    stream = (
        spark.readStream.format("sclera_manifest")
        .option("path", path)
        .option("max_bytes_per_trigger", str(cap))
        .load()
        .writeStream.foreachBatch(feed)
        .option("checkpointLocation", cp)
    )
    q = stream.start()
    try:
        q.processAllAvailable()  # batch 0: the current snapshot
        n_first = len(batches)
        assert sorted(k for _, ks in batches for k in ks) == list(range(100))
        # the backfill commit lands while the run is live: paced
        mt.append(backfill)
        q.processAllAvailable()
    finally:
        q.stop()
    paced = batches[n_first:]
    assert len(paced) >= 3  # the one commit split across batches
    got = sorted(k for _, ks in paced for k in ks)
    assert got == list(range(1000, 9000))  # exactly once, nothing lost
    max_file = max(sizes)
    for _, ks in paced:
        approx = len(ks) / 8000 * sum(sizes)
        assert approx <= cap + max_file + 1

    # restart with more data: same checkpoint, fresh reader — no loss,
    # no dupes (its first batch is unpaced by design)
    mt.append(
        spark.range(9000, 9500)
        .selectExpr("id AS k", "repeat('x', 50) AS pad")
        .repartition(2)
    )
    q = (
        spark.readStream.format("sclera_manifest")
        .option("path", path)
        .option("max_bytes_per_trigger", str(cap))
        .load()
        .writeStream.foreachBatch(feed)
        .option("checkpointLocation", cp)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(k for _, ks in batches for k in ks)
    assert got == list(range(100)) + list(range(1000, 9500))


def test_byte_and_version_caps_anchor_to_delivered(registered, tmp_path):
    """max_versions_per_trigger + max_bytes_per_trigger together: the
    version-pacing anchor must advance to what the byte walk actually
    DELIVERED, not the pre-walk version cap — otherwise max_versions
    stops bounding batches relative to delivered progress."""
    from sclera_spark.sources.stream_source import ManifestStreamReader

    spark = registered
    path = str(tmp_path / "t")
    ManifestTable.create(
        spark.range(0, 10).selectExpr("id AS k", "repeat('x', 100) AS pad"),
        path,
    )
    mt = ManifestTable(path)
    reader = ManifestStreamReader(
        path,
        mt.read(spark).schema,
        {"max_versions_per_trigger": "2", "max_bytes_per_trigger": "1"},
    )
    off0 = reader.latestOffset()  # first batch of a run is unpaced
    assert off0["version"] == 1
    for i in range(5):
        mt.append(
            spark.range(i, i + 5)
            .selectExpr("id AS k", "repeat('x', 100) AS pad")
            .coalesce(1)
        )
    # the 1-byte cap admits exactly one commit's single file per walk
    off1 = reader.latestOffset()
    assert off1["version"] == 2
    assert reader._last_end == 2  # anchored to DELIVERED, not min(6, 3)
    off2 = reader.latestOffset()
    assert off2["version"] == 3
    assert reader._last_end == 3


def test_stream_partitioned_delta_import(registered, tmp_path):
    """Streaming a partitioned Delta import delivers the virtual
    partition columns (per-file constants from the manifest meta), not
    NULLs."""
    import json as _json
    import shutil as _shutil
    import tempfile as _tempfile

    spark = registered
    d = str(tmp_path / "src")
    log = os.path.join(d, "_delta_log")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "g", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }
    adds = []
    for i, g in enumerate(("x", "y")):
        scratch = _tempfile.mkdtemp()
        (
            spark.range(i * 5, i * 5 + 5)
            .selectExpr("id AS k")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(scratch)
        )
        part = next(
            f
            for f in os.listdir(scratch)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        sub = os.path.join(d, f"g={g}")
        os.makedirs(sub, exist_ok=True)
        _shutil.copyfile(
            os.path.join(scratch, part), os.path.join(sub, "f.parquet")
        )
        _shutil.rmtree(scratch)
        adds.append(
            {"add": {"path": f"g={g}/f.parquet", "size": 1,
                     "modificationTime": 0, "dataChange": True,
                     "partitionValues": {"g": g}}}
        )
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"metaData": {
            "id": "s", "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": ["g"], "configuration": {}}}) + "\n")
        for a in adds:
            fh.write(_json.dumps(a) + "\n")
    out = str(tmp_path / "imp")
    ManifestTable.import_delta(d, out)
    sink: list = []
    _drain(spark, out, str(tmp_path / "cp"), sink)
    rows = sorted(r for _, batch in sink for r in batch)
    assert rows == [(k, "x") for k in range(5)] + [
        (k, "y") for k in range(5, 10)
    ]
