"""Per-file Bloom filter indexes (sources/bloom.py + the manifest
wiring): the driver-side XXH64 kernel pinned byte-for-byte against
Spark's xxhash64 (the build/probe split depends on that equality),
then end-to-end equality skipping on UNCLUSTERED columns where min/max
ranges provably cannot prune."""

from __future__ import annotations

import os
import random

import pytest

from pyspark.sql import functions as F

from sclera_spark.engine import ScleraEngine
from sclera_spark.sources.bloom import (
    might_contain,
    spark_hash_pair,
    xxh64_bytes,
    xxh64_int,
    xxh64_long,
)
from sclera_spark.sources.manifest import ManifestTable


@pytest.fixture()
def engine(spark, tables):
    return ScleraEngine(spark)


def test_xxh64_kernel_matches_spark(spark):
    """Fuzz the pure-Python XXH64 against F.xxhash64 for every type
    the bloom tier hashes — including the chained two-argument form
    that produces h2 — over ints spanning widths, IEEE specials, and
    strings crossing the 32-byte stripe boundary."""
    rnd = random.Random(7)
    longs = [0, 1, -1, 2**62, -(2**62), 42] + [
        rnd.randint(-(2**63), 2**63 - 1) for _ in range(30)
    ]
    ints = [0, 1, -1, 2**31 - 1, -(2**31), 7] + [
        rnd.randint(-(2**31), 2**31 - 1) for _ in range(30)
    ]
    doubles = [0.0, -0.0, 1.5, -2.25, 1e300, -1e-300] + [
        rnd.uniform(-1e6, 1e6) for _ in range(20)
    ]
    strings = ["", "a", "hello", "x" * 31, "y" * 32, "z" * 100,
               "héllo wörld ünïcode", "你好" * 20] + [
        "".join(chr(rnd.randint(32, 0x2FFF)) for _ in range(rnd.randint(0, 80)))
        for _ in range(20)
    ]

    def spark_hashes(vals, dtype):
        df = spark.createDataFrame([(v,) for v in vals], f"v {dtype}")
        rows = df.select(
            F.xxhash64("v").alias("h1"),
            F.xxhash64("v", "v").alias("h2"),
            "v",
        ).collect()
        return [(r.h1, r.h2, r.v) for r in rows]

    M = (1 << 64) - 1
    for h1, h2, v in spark_hashes(longs, "long"):
        assert xxh64_long(v) == h1, v
        assert xxh64_long(v, seed=h1 & M) == h2, v
        assert spark_hash_pair(v, "long") == (h1, h2)
    for h1, h2, v in spark_hashes(ints, "int"):
        assert xxh64_int(v) == h1, v
        assert spark_hash_pair(v, "integer") == (h1, h2)
    for h1, h2, v in spark_hashes(doubles, "double"):
        assert spark_hash_pair(v, "double") == (h1, h2), v
    for h1, h2, v in spark_hashes(strings, "string"):
        assert xxh64_bytes(v.encode("utf-8")) == h1, repr(v)
        assert spark_hash_pair(v, "string") == (h1, h2), repr(v)


@pytest.fixture()
def btab(engine, spark):
    """Three commits clustered by k, with cust SCATTERED: every file's
    cust [min, max] spans nearly the full domain (range pruning keeps
    all files) while each cust value lives in exactly one file."""
    for i in range(3):
        df = spark.range(i * 1000, (i + 1) * 1000).selectExpr(
            "id AS k",
            "(id * 2654435761) % 1000000 AS cust",
            "concat('u', (id * 2654435761) % 1000000) AS tag",
        )
        if i == 0:
            engine.catalog.register("seed_bt", df)
            engine.execute("CREATE TABLE bt AS SELECT * FROM seed_bt")
            engine.execute("ALTER TABLE bt SET FORMAT MANIFEST")
        else:
            engine.catalog.register("seed_bt", df)
            engine.execute("INSERT INTO bt SELECT * FROM seed_bt")
    engine.catalog.tables.pop("seed_bt", None)
    yield "bt"
    engine.execute("DROP TABLE bt")


def test_bloom_equality_skipping_end_to_end(engine, btab):
    engine.execute("ALTER TABLE bt SET BLOOM FILTER (cust, tag) FPP 0.001")
    mt = ManifestTable(engine._ddl._path("bt"))
    # backfill happened: every live file has sidecar filters
    assert all(
        mt.file_bloom(os.path.basename(p)) for p in mt.files()
    )
    full = engine.table("bt").inputFiles()
    assert len(full) >= 3

    # a cust value from the middle commit: min/max CANNOT prune (every
    # file's range spans it) — the bloom must
    v = engine.sql("SELECT cust FROM bt WHERE k = 1500").first().cust
    sql = f"SELECT k, cust FROM bt WHERE cust = {v}"
    df = engine.sql(sql)
    kept = df.inputFiles()
    assert len(kept) < len(full)
    got = sorted(tuple(r) for r in df.collect())
    engine.config["manifest_pruning"] = "off"
    try:
        exp = sorted(tuple(r) for r in engine.sql(sql).collect())
    finally:
        engine.config.pop("manifest_pruning", None)
    assert got == exp and got  # non-vacuous: the row IS found

    # string-column probe through the same path
    sqls = f"SELECT k FROM bt WHERE tag = 'u{v}'"
    dfs = engine.sql(sqls)
    assert len(dfs.inputFiles()) < len(full)
    assert dfs.count() >= 1

    # absent value: (almost) everything skipped, empty result
    sql0 = "SELECT k FROM bt WHERE cust = 1000001"
    df0 = engine.sql(sql0)
    assert len(df0.inputFiles()) < len(full)
    assert df0.count() == 0


def test_new_commits_bloom_automatically_and_drop(engine, btab, spark):
    engine.execute("ALTER TABLE bt SET BLOOM FILTER (cust)")
    mt = ManifestTable(engine._ddl._path("bt"))
    n_before = len(os.listdir(mt.bloom_dir()))
    engine.catalog.register(
        "seed_more",
        spark.range(3000, 3500).selectExpr(
            "id AS k", "(id * 2654435761) % 1000000 AS cust",
            "concat('u', id) AS tag"
        ),
    )
    engine.execute("INSERT INTO bt SELECT * FROM seed_more")
    engine.catalog.tables.pop("seed_more", None)
    assert len(os.listdir(mt.bloom_dir())) > n_before  # new files bloomed

    engine.execute("ALTER TABLE bt DROP BLOOM FILTER")
    assert not os.path.isdir(mt.bloom_dir()) or not os.listdir(
        mt.bloom_dir()
    )
    assert mt.meta().get("bloom_columns") is None


def test_vacuum_sweeps_sidecars_of_deleted_files(engine, btab):
    engine.execute("ALTER TABLE bt SET BLOOM FILTER (cust)")
    mt = ManifestTable(engine._ddl._path("bt"))
    engine.execute("DELETE FROM bt WHERE k < 100")  # rewrites a file
    live = {os.path.basename(p) for p in mt.files()}
    mt.vacuum(keep_versions=1)
    side = {
        f[: -len(".json")] for f in os.listdir(mt.bloom_dir())
    }
    assert side <= live  # no sidecar outlives its data file


def test_bloom_false_positive_rate_sane(spark, tmp_path):
    """Build a filter over 5k known values; probe 5k absent values:
    the observed FP rate stays within 5x the configured 1%."""
    from sclera_spark.sources.bloom import build_blooms

    p = str(tmp_path / "d")
    spark.range(5000).selectExpr("id * 7 AS v").coalesce(1).write.parquet(p)
    import glob

    f = glob.glob(p + "/part-*.parquet")[0]
    built = build_blooms(spark, [f], ["v"], 0.01)
    bl = built[os.path.basename(f)]["v"]
    # every present value fires
    assert all(might_contain(bl, i * 7) for i in range(0, 5000, 13))
    # absent values rarely fire
    fps = sum(1 for i in range(5000) if might_contain(bl, i * 7 + 3))
    assert fps < 5000 * 0.05


def test_cow_dml_pre_narrows_through_blooms(engine, btab):
    """filter_ranges -> files_pruned composes with blooms for FREE: a
    keyed UPDATE on the bloom-indexed UNCLUSTERED column rewrites only
    the file that can contain the key (min/max alone would probe every
    file — every file's cust range spans the value)."""
    engine.execute("ALTER TABLE bt SET BLOOM FILTER (cust)")
    mt = ManifestTable(engine._ddl._path("bt"))
    before = {p: os.path.getmtime(p) for p in mt.files()}
    v = engine.sql("SELECT cust FROM bt WHERE k = 1500").first().cust
    n0 = engine.table("bt").count()

    engine.execute(f"UPDATE bt SET tag = 'hit' WHERE cust = {v}")
    after = {p: os.path.getmtime(p) for p in mt.files()}
    survivors = set(before) & set(after)
    # at most one file (plus bloom false positives) was rewritten
    assert len(set(before) - survivors) <= 1
    assert all(before[p] == after[p] for p in survivors)
    assert engine.table("bt").count() == n0
    got = engine.sql(f"SELECT tag FROM bt WHERE cust = {v}").collect()
    assert got and all(r.tag == "hit" for r in got)

    # keyed no-op: a value no file can contain commits nothing
    ver = mt.version()
    engine.execute("DELETE FROM bt WHERE cust = 1000001")
    assert mt.version() == ver


def test_cas_tables_bloom_too(spark, tables, tmp_path):
    """The CAS-committed flavor inherits bloom staging: filters build
    on append and prune equality probes identically (sidecars are
    immutable per file, so no CAS coordination is needed for them)."""
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    engine.execute(
        "CREATE TABLE cbt AS SELECT o_orderkey AS k, "
        "(o_orderkey * 2654435761) % 1000000 AS cust FROM orders "
        "WHERE o_orderkey < 500"
    )
    try:
        engine.execute("ALTER TABLE cbt SET FORMAT MANIFEST CAS")
        engine.execute("ALTER TABLE cbt SET BLOOM FILTER (cust)")
        engine.execute(
            "INSERT INTO cbt SELECT o_orderkey, "
            "(o_orderkey * 2654435761) % 1000000 FROM orders "
            "WHERE o_orderkey >= 500 AND o_orderkey < 1000"
        )
        mt = engine._ddl._manifest("cbt")
        assert all(
            mt.file_bloom(os.path.basename(p)) for p in mt.files()
        )
        v = engine.sql("SELECT cust FROM cbt WHERE k = 700").first().cust
        sql = f"SELECT k FROM cbt WHERE cust = {v}"
        df = engine.sql(sql)
        assert len(df.inputFiles()) < len(engine.table("cbt").inputFiles())
        engine.config["manifest_pruning"] = "off"
        try:
            exp = sorted(r.k for r in engine.sql(sql).collect())
        finally:
            engine.config.pop("manifest_pruning", None)
        assert sorted(r.k for r in df.collect()) == exp and exp
    finally:
        engine.execute("DROP TABLE cbt")


def test_chunked_build_or_merge_equals_single_pass(spark, tmp_path):
    """Bloom insertion is a bitwise OR, so the two-phase build (per-task
    partial bitmaps, grouped OR-merge) must be BYTE-EQUAL no matter how
    the rows are split into Arrow batches. Forcing tiny batches makes
    many partials per file; the merged sidecars must match the
    effectively-single-pass build bit for bit."""
    from sclera_spark.sources.bloom import build_blooms

    df = spark.range(0, 5000).selectExpr(
        "id AS k",
        "CASE WHEN id % 11 = 0 THEN NULL "
        "ELSE concat('v', CAST(id % 997 AS STRING)) END AS s",
    )
    path = str(tmp_path / "p")
    df.coalesce(2).write.parquet(path)
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    ]
    assert len(files) == 2

    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "64")  # many partials per file
        chunked = build_blooms(spark, files, ["k", "s"], 0.01)
        spark.conf.set(conf, "1000000")  # one batch = single pass
        single = build_blooms(spark, files, ["k", "s"], 0.01)
    finally:
        spark.conf.set(conf, old)
    assert chunked == single
    # sanity: the filters actually answer probes
    from sclera_spark.sources.bloom import might_contain

    name = os.path.basename(files[0])
    assert might_contain(chunked[name]["s"], "v1") in (True, False)
    absent = sum(
        1
        for nm in chunked
        for v in ("nope-1", "nope-2", "nope-3")
        if not might_contain(chunked[nm]["s"], v)
    )
    assert absent >= 4  # definitely-absent answers dominate


def test_zero_row_file_gets_all_zero_sidecar(spark, tmp_path):
    """A zero-row part file yields no Arrow batches: it must still get
    a sidecar (all-zero bitmap = every probe prunes it), or backfill
    would re-run forever."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sclera_spark.sources.bloom import build_blooms, might_contain

    empty = str(tmp_path / "empty.parquet")
    pq.write_table(
        pa.table({"k": pa.array([], type=pa.int64())}), empty
    )
    built = build_blooms(spark, [empty], ["k"], 0.01)
    assert "empty.parquet" in built
    assert not might_contain(built["empty.parquet"]["k"], 42)
