"""Schema evolution on manifest tables via column-mapping ids
(sources/manifest.py): RENAME COLUMN / DROP COLUMN / type widening as
pure metadata commits. The invariants under test:

- a rename keeps every skipping structure (footer stats, null counts,
  bloom sidecars) live — files are keyed by PHYSICAL names that never
  change;
- DROP is a tombstone whose physical name stays reserved, so re-adding
  the same logical name can never read the dead column's bytes;
- widening is restricted to in-place parquet promotions and old narrow
  files stay readable;
- time travel shows each version's schema; CDF and the streaming
  source read across evolution commits under the latest names;
- DML after an arbitrary evolution history matches DuckDB running the
  SAME logical statements (stateful fuzz, the test_fuzz_dml harness
  shape)."""

from __future__ import annotations

import random

import pytest

from sclera_spark.engine import ScleraEngine
from sclera_spark.sources.manifest import ManifestTable


@pytest.fixture()
def engine(spark, tables):
    return ScleraEngine(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(engine, name="se"):
    engine.execute(
        f"CREATE TABLE {name} AS SELECT CAST(o_orderkey AS INT) AS k, "
        "o_totalprice AS price, o_orderpriority AS pri "
        "FROM orders WHERE o_orderkey < 300"
    )
    engine.execute(f"ALTER TABLE {name} SET FORMAT MANIFEST")
    return name


def test_rename_is_metadata_only_and_preserves_data(engine):
    _mk(engine)
    before = _rows(engine.sql("SELECT k, price FROM se"))
    mt = engine.ddl()._manifest("se")
    files_before = set(mt.files())
    engine.execute("ALTER TABLE se RENAME COLUMN price TO total")
    assert set(mt.files()) == files_before  # no data file touched
    assert engine.table("se").columns == ["k", "total", "pri"]
    assert _rows(engine.sql("SELECT k, total FROM se")) == before
    # old name is gone
    with pytest.raises(Exception, match="price|resolve"):
        engine.sql("SELECT price FROM se").collect()
    # rename to an existing name refuses
    with pytest.raises(ValueError, match="already exists"):
        engine.execute("ALTER TABLE se RENAME COLUMN total TO pri")
    engine.execute("DROP TABLE se")


def test_rename_keeps_file_skipping_live(engine):
    """The EXPLAIN FILES proof: three disjoint-range commits, pruning
    fires identically before and after renaming the probe column."""
    engine.execute(
        "CREATE TABLE sp AS SELECT CAST(o_orderkey AS INT) AS k, "
        "o_totalprice AS price FROM orders WHERE o_orderkey < 500"
    )
    engine.execute("ALTER TABLE sp SET FORMAT MANIFEST")
    engine.execute(
        "INSERT INTO sp SELECT CAST(o_orderkey AS INT), o_totalprice "
        "FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1000"
    )
    engine.execute(
        "INSERT INTO sp SELECT CAST(o_orderkey AS INT), o_totalprice "
        "FROM orders WHERE o_orderkey >= 1000"
    )
    full = len(engine.table("sp").inputFiles())
    q0 = "SELECT sum(price) AS s FROM sp WHERE k BETWEEN 600 AND 800"
    df0 = engine.sql(q0)
    kept0 = len([f for f in df0.inputFiles() if "/data/" in f])
    s0 = df0.first().s
    assert kept0 < full
    engine.execute("ALTER TABLE sp RENAME COLUMN k TO orderkey")
    q1 = "SELECT sum(price) AS s FROM sp WHERE orderkey BETWEEN 600 AND 800"
    df1 = engine.sql(q1)
    kept1 = len([f for f in df1.inputFiles() if "/data/" in f])
    assert kept1 == kept0 and df1.first().s == s0
    rep = engine.execute(f"EXPLAIN FILES {q1}")
    assert rep[0]["kept_files"] == kept0 and rep[0]["total_files"] == full
    # metadata-only count / min / max still answer through the mapping
    assert engine.sql("SELECT count(*) AS n FROM sp").first().n == 1500
    row = engine.sql(
        "SELECT min(orderkey) AS lo, max(orderkey) AS hi FROM sp"
    ).first()
    assert (row.lo, row.hi) == (0, 1499)
    engine.execute("DROP TABLE sp")


def test_bloom_sidecars_survive_rename(engine):
    """Bloom config and sidecars key on physical names: an equality
    probe on the RENAMED column still consults them."""
    engine.execute(
        "CREATE TABLE sb AS SELECT CAST(o_orderkey AS INT) AS k, "
        "o_orderpriority AS pri FROM orders WHERE o_orderkey < 500"
    )
    engine.execute("ALTER TABLE sb SET FORMAT MANIFEST")
    engine.execute("ALTER TABLE sb SET BLOOM FILTER (pri)")
    engine.execute(
        "INSERT INTO sb SELECT CAST(o_orderkey AS INT), o_orderpriority "
        "FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1000"
    )
    mt = engine.ddl()._manifest("sb")
    import os

    assert all(
        mt.file_bloom(os.path.basename(p)) is not None for p in mt.files()
    )
    engine.execute("ALTER TABLE sb RENAME COLUMN pri TO priority")
    # a probe value absent from the table: blooms must prune EVERY file
    pruned = mt.files_pruned({"pri": ("0-NOSUCH", "0-NOSUCH")})
    assert pruned == []
    # rows written AFTER the rename still get sidecars (physical name)
    engine.execute("INSERT INTO sb VALUES (9999, '9-NEWPRI')")
    assert all(
        mt.file_bloom(os.path.basename(p)) is not None for p in mt.files()
    )
    found = engine.sql(
        "SELECT count(*) AS n FROM sb WHERE priority = '9-NEWPRI'"
    ).first().n
    assert found == 1
    engine.execute("DROP TABLE sb")


def test_drop_column_tombstone_and_reserved_physical(engine):
    _mk(engine)
    engine.execute("INSERT INTO se VALUES (9001, 1.0, 'KEEPME')")
    engine.execute("ALTER TABLE se DROP COLUMN pri")
    assert engine.table("se").columns == ["k", "price"]
    with pytest.raises(Exception):
        engine.sql("SELECT pri FROM se").collect()
    # re-add under the same LOGICAL name: a fresh physical column —
    # the dead column's bytes must never surface
    engine.execute("ALTER TABLE se ADD COLUMN pri STRING")
    assert engine.table("se").columns == ["k", "price", "pri"]
    n = engine.sql("SELECT count(pri) AS c FROM se").first().c
    assert n == 0  # all NULL: 'KEEPME' stayed buried
    mt = engine.ddl()._manifest("se")
    mapping = mt.column_mapping()
    live_pri = [
        e
        for e in mapping
        if not e.get("dropped") and e.get("name") == "pri"
    ]
    assert len(live_pri) == 1 and live_pri[0]["physical"] != "pri"
    dead = [e for e in mapping if e.get("dropped")]
    assert len(dead) == 1 and dead[0]["physical"] == "pri"
    assert dead[0]["name"] is None
    # new writes land in the new physical column and read back
    engine.execute("UPDATE se SET pri = 'fresh' WHERE k = 9001")
    assert (
        engine.sql("SELECT pri FROM se WHERE k = 9001").first().pri
        == "fresh"
    )
    # dropping every column refuses
    engine.execute("ALTER TABLE se DROP COLUMN pri")
    engine.execute("ALTER TABLE se DROP COLUMN price")
    with pytest.raises(ValueError, match="no columns"):
        engine.execute("ALTER TABLE se DROP COLUMN k")
    engine.execute("DROP TABLE se")


def test_widening_reads_old_files_and_rejects_narrowing(engine):
    _mk(engine)
    engine.execute("ALTER TABLE se ALTER COLUMN k TYPE BIGINT")
    assert dict(engine.table("se").dtypes)["k"] == "bigint"
    engine.execute("INSERT INTO se VALUES (5000000000, 1.0, 'X')")
    got = _rows(engine.sql("SELECT k FROM se WHERE k < 3 OR k > 4000000000"))
    assert got == [(0,), (1,), (2,), (5000000000,)]
    # float-family widening
    engine.execute("ALTER TABLE se ALTER COLUMN price TYPE DOUBLE") \
        if dict(engine.table("se").dtypes)["price"] == "float" else None
    # narrowing / lossy retyping refuse
    for bad in ("INT", "STRING", "FLOAT"):
        with pytest.raises(ValueError, match="widening|invalid type"):
            engine.execute(f"ALTER TABLE se ALTER COLUMN k TYPE {bad}")
    with pytest.raises(ValueError, match="widening"):
        # long -> double is lossy: refused
        engine.execute("ALTER TABLE se ALTER COLUMN k TYPE DOUBLE")
    engine.execute("DROP TABLE se")


def test_time_travel_shows_each_versions_schema(engine, spark):
    _mk(engine)
    mt = engine.ddl()._manifest("se")
    v1 = mt.version()
    engine.execute("ALTER TABLE se RENAME COLUMN price TO total")
    engine.execute("ALTER TABLE se DROP COLUMN pri")
    engine.execute("ALTER TABLE se ALTER COLUMN k TYPE BIGINT")
    assert mt.read(spark, version=v1).columns == ["k", "price", "pri"]
    assert dict(mt.read(spark, version=v1).dtypes)["k"] == "int"
    assert engine.table("se").columns == ["k", "total"]
    assert dict(engine.table("se").dtypes)["k"] == "bigint"
    # SQL time travel reads the old names
    old = engine.sql(
        f"SELECT k, price FROM se VERSION AS OF {v1} WHERE k < 3"
    )
    assert old.columns == ["k", "price"] and old.count() == 3
    # RESTORE brings the old schema back as the live one
    engine.execute(f"RESTORE TABLE se TO VERSION AS OF {v1}")
    assert engine.table("se").columns == ["k", "price", "pri"]
    engine.execute("DROP TABLE se")


def test_cdf_reads_under_latest_names_and_evolution_feeds_nothing(
    engine, spark
):
    _mk(engine)
    mt = engine.ddl()._manifest("se")
    v_created = mt.version()
    engine.execute("ALTER TABLE se RENAME COLUMN price TO total")
    v_renamed = mt.version()
    engine.execute("INSERT INTO se VALUES (9001, 5.0, 'NEW')")
    # the rename commit itself feeds NOTHING (file list unchanged)
    none = mt.changes(spark, v_created, v_renamed)
    assert none.count() == 0
    feed = mt.changes(spark, v_renamed)
    assert "total" in feed.columns and "price" not in feed.columns
    rows = feed.collect()
    assert len(rows) == 1 and rows[0]["total"] == 5.0
    assert rows[0]["_change_type"] == "insert"
    engine.execute("DROP TABLE se")


def test_stream_source_maps_physical_names(engine, spark, tmp_path):
    """The streaming source reads a renamed+widened table: logical
    names in the stream schema, physical columns in the files."""
    _mk(engine)
    engine.execute("ALTER TABLE se RENAME COLUMN price TO total")
    engine.execute("ALTER TABLE se ALTER COLUMN k TYPE BIGINT")
    engine.execute("INSERT INTO se VALUES (5000000000, 7.5, 'W')")
    sdf = engine.stream_from_manifest("se")
    assert sdf.columns == ["k", "total", "pri"]
    got: list = []

    def feed(bdf, bid):
        got.extend(tuple(r) for r in bdf.collect())

    q = (
        sdf.writeStream.foreachBatch(feed)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert (5000000000, 7.5, "W") in got
    assert len(got) == 301
    engine.execute("DROP TABLE se")


def test_optimize_compacts_evolved_table(engine):
    """Compaction rewrites through the logical projection: narrow and
    wide files unify, dropped-column bytes are reclaimed, results are
    unchanged, and skipping still works afterwards."""
    _mk(engine)
    engine.execute(
        "INSERT INTO se SELECT CAST(o_orderkey AS INT), o_totalprice, "
        "o_orderpriority FROM orders "
        "WHERE o_orderkey >= 300 AND o_orderkey < 600"
    )
    engine.execute("ALTER TABLE se RENAME COLUMN price TO total")
    engine.execute("ALTER TABLE se ALTER COLUMN k TYPE BIGINT")
    engine.execute("ALTER TABLE se DROP COLUMN pri")
    before = _rows(engine.table("se"))
    engine.execute("OPTIMIZE se TARGET 64 MB SORT BY (k)")
    assert _rows(engine.table("se")) == before
    mt = engine.ddl()._manifest("se")
    import pyarrow.parquet as pq

    cols = pq.ParquetFile(mt.files()[0]).schema_arrow.names
    # physical layout after rewrite: renamed column keeps its physical
    # name; the dropped column's bytes are gone
    assert "price" in cols and "pri" not in cols
    engine.execute("DROP TABLE se")


N_SEQS = 4
SEQ_LEN = 12


def _evo_stmt(rng, state):
    """One random statement legal against the CURRENT logical state.
    ``state`` tracks live columns: dict name -> type ('int'/'bigint'/
    'double'/'varchar'). k is the immutable key column."""
    kind = rng.choice(
        ["insert", "insert", "update", "delete", "rename", "drop",
         "add", "widen"]
    )
    cols = [c for c in state if c != "k" and not c.startswith("__")]
    if kind == "insert":
        vals = ["k := placeholder"]
        k = state["__next_k"]
        state["__next_k"] += 1
        parts = [str(k)]
        for c in cols:
            t = state[c]
            if rng.random() < 0.2:
                parts.append("NULL")
            elif t in ("int", "bigint"):
                parts.append(str(rng.randint(-5, 99)))
            elif t == "double":
                parts.append(f"{rng.randint(0, 50)}.5")
            else:
                parts.append(rng.choice(["'a'", "'b''x'", "'zz'"]))
        return f"INSERT INTO ft VALUES ({', '.join(parts)})"
    if kind == "update" and cols:
        c = rng.choice(cols)
        t = state[c]
        if t in ("int", "bigint"):
            expr = rng.choice([f"{c} + 1", "7", "NULL"])
        elif t == "double":
            expr = rng.choice([f"{c} * 2", "1.5"])
        else:
            expr = rng.choice(["'upd'", "NULL"])
        return (
            f"UPDATE ft SET {c} = {expr} "
            f"WHERE k % {rng.randint(2, 5)} = 0"
        )
    if kind == "delete":
        return f"DELETE FROM ft WHERE k % {rng.randint(3, 7)} = 1"
    if kind == "rename" and cols:
        c = rng.choice(cols)
        new = f"c{state['__next_col']}"
        state["__next_col"] += 1
        state[new] = state.pop(c)
        return f"ALTER TABLE ft RENAME COLUMN {c} TO {new}"
    if kind == "drop" and len(cols) > 1:
        c = rng.choice(cols)
        del state[c]
        return f"ALTER TABLE ft DROP COLUMN {c}"
    if kind == "add":
        new = f"c{state['__next_col']}"
        state["__next_col"] += 1
        t = rng.choice(["int", "double", "varchar"])
        state[new] = t
        sql_t = {"int": "INT", "double": "DOUBLE", "varchar": "VARCHAR(20)"}[t]
        return f"ALTER TABLE ft ADD COLUMN {new} {sql_t}"
    if kind == "widen":
        ints = [c for c in cols if state[c] == "int"]
        if ints:
            c = rng.choice(ints)
            state[c] = "bigint"
            return f"ALTER TABLE ft ALTER COLUMN {c} TYPE BIGINT"
    return None


@pytest.mark.parametrize("seed", range(N_SEQS))
def test_evolution_dml_fuzz_vs_duckdb(spark, seed):
    """Random interleavings of DML and schema evolution, mirrored on
    DuckDB, full-state diff after every statement."""
    import duckdb

    engine = ScleraEngine(spark)
    duck = duckdb.connect()
    engine.execute("CREATE TABLE ft (k INT, v INT, s VARCHAR(20))")
    duck.execute("CREATE TABLE ft (k INTEGER, v INTEGER, s VARCHAR)")
    seeded = "INSERT INTO ft VALUES (1, 1, 'a'), (2, NULL, 'b'), (3, 3, NULL)"
    engine.execute(seeded)
    duck.execute(seeded)
    engine.execute("ALTER TABLE ft SET FORMAT MANIFEST")
    state = {"k": "int", "v": "int", "s": "varchar",
             "__next_k": 100, "__next_col": 1}
    rng = random.Random(seed * 97 + 5)
    try:
        for i in range(SEQ_LEN):
            stmt = _evo_stmt(rng, state)
            if stmt is None:
                continue
            engine.execute(stmt)
            duck.execute(stmt)
            cols = sorted(c for c in state if not c.startswith("__"))
            sel = f"SELECT {', '.join(cols)} FROM ft"
            nullsafe = lambda t: tuple(  # noqa: E731
                (v is None, v) for v in t
            )
            got = sorted(
                (tuple(r) for r in engine.sql(sel).collect()), key=nullsafe
            )
            exp = sorted(
                (tuple(r) for r in duck.execute(sel).fetchall()),
                key=nullsafe,
            )
            assert got == exp, (
                f"seed {seed} diverged after stmt {i}: {stmt}\n"
                f"  engine: {got[:6]}...\n  duck:   {exp[:6]}..."
            )
    finally:
        engine.execute("DROP TABLE ft")
        duck.close()


def test_symlink_export_refused_on_mapped_table(engine):
    """GENERATE SYMLINK MANIFEST on an evolved table would expose the
    files' PHYSICAL schema to external readers — refused loudly
    (Delta's parity behavior for column-mapped tables)."""
    _mk(engine)
    engine.execute("GENERATE SYMLINK MANIFEST FOR se")  # fine pre-evolution
    engine.execute("ALTER TABLE se RENAME COLUMN price TO total")
    with pytest.raises(ValueError, match="PHYSICAL schema"):
        engine.execute("GENERATE SYMLINK MANIFEST FOR se")
    engine.execute("DROP TABLE se")


def test_reorg_purge_reclaims_dropped_column_bytes(engine):
    """r11 (verdict #5): REORG TABLE t PURGE rewrites EXACTLY the files
    whose physical schema carries a dropped column, shrinking the table
    on disk; data is identical before/after; files written AFTER the
    drop (already clean) are untouched; pre-PURGE versions still time
    travel to the dropped column's era."""
    import os

    import pyarrow.parquet as pq

    _mk(engine)
    mt = engine.ddl()._manifest("se")
    engine.execute("ALTER TABLE se DROP COLUMN pri")
    # post-drop data files are clean by construction — must NOT be rewritten
    engine.execute("INSERT INTO se VALUES (9001, 1.5)")
    clean = set(mt.files()) - {
        p
        for p in mt.files()
        if "pri" in set(pq.ParquetFile(p).schema_arrow.names)
    }
    assert clean and clean != set(mt.files())
    before_rows = _rows(engine.sql("SELECT k, price FROM se"))
    before_bytes = sum(os.path.getsize(p) for p in mt.files())
    v_pre = mt.version()

    out = engine.execute("REORG TABLE se PURGE")
    assert out[0]["rewritten_files"] == len(set(mt.files(v_pre)) - clean)
    # clean files survived in place; no live file carries the dead bytes
    assert clean <= set(mt.files())
    for p in mt.files():
        assert "pri" not in set(pq.ParquetFile(p).schema_arrow.names)
    # data identical, table smaller
    assert _rows(engine.sql("SELECT k, price FROM se")) == before_rows
    assert sum(os.path.getsize(p) for p in mt.files()) < before_bytes
    # time travel: the pre-PURGE version still reads the old files
    old = mt.read(engine.spark, version=v_pre)
    assert sorted(r.k for r in old.collect()) == sorted(
        r[0] for r in before_rows
    )
    # ... and an even older version (before the DROP) still serves the
    # dropped column's values out of the un-vacuumed originals
    dropped_era = mt.read(engine.spark, version=1)
    assert "pri" in dropped_era.columns
    assert dropped_era.where("pri IS NOT NULL").count() > 0
    # a second PURGE is a no-op (nothing left to rewrite)
    assert engine.execute("REORG TABLE se PURGE")[0]["rewritten_files"] == 0
    engine.execute("DROP TABLE se")
