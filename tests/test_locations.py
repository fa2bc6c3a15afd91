"""Named locations (data virtualization): JDBC (embedded Derby) with
predicate pushdown, parquet-dir locations, admin statements, and the
CREATE INDEX sorted-rewrite."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from sclera_spark.engine import ScleraEngine

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def engine(spark, tables):
    return ScleraEngine(spark)


@pytest.fixture(scope="module")
def derby_url(engine):
    db = os.path.join(tempfile.mkdtemp(prefix="sclera_derby_"), "db")
    url = f"jdbc:derby:{db};create=true"
    engine.table("nation").write.jdbc(url, "nation_jdbc", mode="overwrite")
    return url


def test_jdbc_location_roundtrip(engine, derby_url):
    engine.execute(f"ADD LOCATION der AS JDBC ('{derby_url}')")
    df = engine.location_table("der", "nation_jdbc")
    assert df.count() == engine.table("nation").count()


def test_jdbc_filter_pushdown(engine, derby_url):
    engine.execute(f"ADD LOCATION der AS JDBC ('{derby_url}')")
    df = engine.location_table("der", "nation_jdbc").filter(
        F.col("n_regionkey") <= 2
    )
    plan = df._jdf.queryExecution().explainString(
        engine.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in plan
    assert "n_regionkey" in plan.lower().split("pushedfilters")[1][:200]
    expected = engine.table("nation").filter(F.col("n_regionkey") <= 2).count()
    assert df.count() == expected


def test_add_table_from_location(engine, derby_url):
    engine.execute(f"ADD LOCATION der AS JDBC ('{derby_url}')")
    engine.execute("ADD TABLE der.nation_jdbc")
    n = engine.sql("SELECT count(*) AS n FROM nation_jdbc").collect()[0].n
    assert n == engine.table("nation").count()
    engine.execute("REMOVE TABLE nation_jdbc")


def test_set_default_location(engine, derby_url):
    engine.execute(f"ADD LOCATION der2 AS JDBC ('{derby_url}')")
    engine.execute("SET DEFAULT LOCATION = der2")
    assert engine.config["default"] == "der2"
    engine.execute("ADD TABLE nation_jdbc")
    assert engine.sql("SELECT count(*) AS n FROM nation_jdbc").collect()[0].n > 0
    engine.execute("REMOVE TABLE nation_jdbc")


def test_parquet_dir_location(engine):
    engine.execute(f"ADD READONLY LOCATION tpch AS PARQUETDIR ('{SF_DIR}')")
    df = engine.location_table("tpch", "region")
    assert df.count() == 5
    assert "tpch" in engine.execute("LIST LOCATIONS")
    engine.execute("REMOVE LOCATION tpch")
    assert "tpch" not in engine.execute("LIST LOCATIONS")


def test_create_index_sorted_rewrite(engine):
    engine.execute("CREATE TABLE idx_t AS SELECT o_orderkey, o_totalprice FROM orders")
    engine.execute("CREATE INDEX idx1 ON idx_t (o_orderkey)")
    df = engine.table("idx_t")
    assert df.count() == engine.table("orders").count()
    # per-partition sortedness: the layout a row-group-skipping scan needs
    import pandas as pd

    def check(it):
        for pdf in it:
            yield pd.DataFrame(
                {"ok": [bool(pdf["o_orderkey"].is_monotonic_increasing)]}
            )

    ok = df.select("o_orderkey").mapInPandas(check, "ok boolean").toPandas()
    assert ok["ok"].all()
    engine.execute("DROP INDEX idx1")
    engine.execute("DROP TABLE idx_t")


def test_native_statement_at_jdbc_location(engine, derby_url):
    engine.execute(f"ADD LOCATION dern AS JDBC ('{derby_url}')")
    # the statement is in the LOCATION's dialect: Derby folds unquoted
    # identifiers to upper case, so the lowercase columns Spark created
    # must be double-quoted — exactly the kind of native-dialect text
    # this passthrough exists for
    df = engine.execute(
        '@dern \'SELECT "n_name", "n_regionkey" FROM nation_jdbc WHERE "n_regionkey" = 0\''
    )
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert set(pdf.columns) == {"n_name", "n_regionkey"}
    assert (pdf["n_regionkey"] == 0).all()


def test_alter_unsupported(engine):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ALTER"):
        engine.execute("ALTER TABLE nation ADD COLUMN x INT")


def test_list_remaining_jdbc(engine, derby_url):
    """LIST REMAINING against a JDBC location: the database's own
    catalog (Derby SYS.SYSTABLES) names tables not yet registered."""
    engine.execute(f"ADD LOCATION der AS JDBC ('{derby_url}')")
    engine.table("region").write.jdbc(derby_url, "region_jdbc", mode="overwrite")
    remaining = engine.execute("LIST REMAINING der")
    names = {n.lower() for _l, n in remaining}
    assert {"nation_jdbc", "region_jdbc"} <= names
    # registering one removes it from the remaining set
    engine.execute("ADD TABLE der.region_jdbc")
    names2 = {n.lower() for _l, n in engine.execute("LIST REMAINING der")}
    assert "region_jdbc" not in names2 and "nation_jdbc" in names2


def test_list_tables_location_forms(engine, derby_url):
    """LIST TABLES loc.* / loc.name / name (SqlAdminParser.scala:114-127)
    and DESCRIBE loc.table."""
    engine.execute(f"ADD LOCATION der AS JDBC ('{derby_url}')")
    engine.execute("ADD TABLE der.nation_jdbc")
    # module-scoped engine: other tests may have added der tables too
    assert "nation_jdbc" in engine.execute("LIST TABLES der.*")
    assert engine.execute("LIST TABLES der.nation_jdbc") == ["nation_jdbc"]
    assert engine.execute("LIST TABLES nation") == ["nation"]
    with pytest.raises(KeyError):
        engine.execute("LIST TABLES der.no_such")
    with pytest.raises(KeyError):
        engine.execute("LIST TABLES nowhere.*")
    # location-qualified DESCRIBE resolves through the location
    cols = dict(engine.execute("DESCRIBE der.nation_jdbc"))
    assert "N_NATIONKEY" in cols or "n_nationkey" in cols


# ----------------------------------------------- credential encryption


def test_location_password_never_stored_plaintext(engine, derby_url):
    """r8 (verdict #5, reference util/encrypt/Encryptor.scala:28-50):
    a JDBC location registered WITH credentials keeps no plaintext
    secret anywhere in catalog state or admin output — the password is
    AES-GCM-wrapped at registration and restored only at connect time."""
    pw = "hunter2-T0pSecret"
    engine.execute(
        f"ADD LOCATION secloc AS JDBC ('{derby_url}', 'user=app', 'password={pw}')"
    )
    try:
        # no plaintext in the catalog entry (deep repr scan)
        assert pw not in repr(engine.locations)
        # ...but the wrapped token is present and self-describing
        info = engine.locations["secloc"]
        assert info["secrets"]["password"].startswith("enc:gcm:")
        # user is NOT a secret: stays a readable param
        assert any(p == "user=app" for p in info["params"])
        # admin output never leaks it
        assert pw not in repr(engine.execute("LIST LOCATIONS"))
        assert pw not in repr(engine.execute("SHOW CONFIG"))
        # connect-time view restores the secret exactly
        url, opts = engine._location_jdbc(info)
        assert opts["password"] == pw and opts["user"] == "app"
        # the location still works end-to-end (Derby ignores the
        # credentials but receives them as JDBC options)
        assert engine.location_table("secloc", "nation_jdbc").count() == 25
    finally:
        engine.execute("REMOVE LOCATION secloc")


def test_url_embedded_password_scrubbed(engine):
    pw = "pg-secret-99"
    engine.add_named_location(
        "pgloc", "JDBC", [f"jdbc:postgresql://h/db?user=u&password={pw}&ssl=true"]
    )
    try:
        info = engine.locations["pgloc"]
        assert pw not in repr(info)
        assert "__SCLERA_ENC__" in info["params"][0]
        url, _ = engine._location_jdbc(info)
        assert url == f"jdbc:postgresql://h/db?user=u&password={pw}&ssl=true"
    finally:
        engine.remove_location("pgloc")


def test_registration_refuses_plaintext_without_crypto(engine, monkeypatch):
    """When the cryptography lib is unavailable the engine must REFUSE
    to store the password (documented EncryptionUnavailable), never
    fall back to plaintext."""
    import sclera_spark.encrypt as enc_mod
    from sclera_spark.encrypt import EncryptionUnavailable

    def _unavailable():
        raise EncryptionUnavailable(
            "refusing to store a plaintext password: the 'cryptography' "
            "library is not installed"
        )

    monkeypatch.setattr(enc_mod, "_aesgcm", _unavailable)
    if hasattr(engine, "_enc"):
        del engine._enc  # drop any cached encryptor
    with pytest.raises(EncryptionUnavailable, match="refusing to store"):
        engine.add_named_location(
            "badloc", "JDBC", ["jdbc:derby:x", "password=pw"]
        )
    assert "badloc" not in engine.locations
    monkeypatch.undo()
    if hasattr(engine, "_enc"):
        del engine._enc


def test_token_tamper_detected(engine):
    from sclera_spark.encrypt import Encryptor

    e = Encryptor()
    tok = e.encrypt("s3cret")
    assert e.decrypt(tok) == "s3cret"
    bad = tok[:-4] + ("AAAA" if not tok.endswith("AAAA") else "BBBB")
    with pytest.raises(Exception):  # GCM tag failure, never garbage
        e.decrypt(bad)


def test_url_password_with_awkward_chars_wrapped_whole(engine):
    """A URL password containing quotes, spaces and percent-escapes is
    wrapped IN FULL — no plaintext tail left in stored params — and the
    restored URL is byte-identical (percent-encoding untouched). Pins
    the r8 ADVICE fix: the old pattern stopped at the first quote or
    space, storing the secret's remainder as plaintext."""
    pw = "p'a ss%26w\"ord%3D!"
    url = f"jdbc:postgresql://h/db?user=u&password={pw}&ssl=true"
    engine.add_named_location("awkpw", "JDBC", [url])
    try:
        info = engine.locations["awkpw"]
        blob = repr(info)
        assert pw not in blob
        # no plaintext SUFFIX of the secret survives either
        assert "ss%26w" not in blob and "ord%3D!" not in blob
        restored, _ = engine._location_jdbc(info)
        assert restored == url
    finally:
        engine.remove_location("awkpw")


def test_two_url_passwords_restore_independently(engine):
    """Indexed placeholders: a URL carrying two password= params (e.g.
    nested proxy conninfo) must restore EACH to its own secret."""
    url = "jdbc:postgresql://h/db?password=outer-pw&proxy=password%3D&password=inner-pw"
    engine.add_named_location("twopw", "JDBC", [url])
    try:
        info = engine.locations["twopw"]
        assert "outer-pw" not in repr(info) and "inner-pw" not in repr(info)
        restored, _ = engine._location_jdbc(info)
        assert restored == url
    finally:
        engine.remove_location("twopw")


def test_locations_persist_across_engine_restart(spark, monkeypatch, tmp_path):
    """r9 persisted catalog: with SCLERA_SPARK_CATALOG_DIR and a durable
    SCLERA_SPARK_KEY, ADD LOCATION state — wrapped credentials included
    — survives an engine restart and decrypts to the same connect URL."""
    import base64 as b64

    from sclera_spark.engine import ScleraEngine

    monkeypatch.setenv("SCLERA_SPARK_CATALOG_DIR", str(tmp_path))
    monkeypatch.setenv(
        "SCLERA_SPARK_KEY", b64.urlsafe_b64encode(b"k" * 32).decode()
    )
    pw = "sup3r-secret"
    url = f"jdbc:postgresql://h/db?user=u&password={pw}"
    e1 = ScleraEngine(spark)
    e1.add_named_location("perloc", "JDBC", [url])
    # the persisted file never carries plaintext
    blob = (tmp_path / "locations.json").read_text()
    assert pw not in blob and "enc:gcm:" in blob

    e2 = ScleraEngine(spark)  # the "restarted" engine
    info = e2.locations["perloc"]
    restored, _ = e2._location_jdbc(info)
    assert restored == url

    # removal persists too
    e2.remove_location("perloc")
    e3 = ScleraEngine(spark)
    assert "perloc" not in e3.locations


def test_persist_refuses_secrets_under_ephemeral_key(
    spark, monkeypatch, tmp_path
):
    """Without SCLERA_SPARK_KEY the wrap key dies with the process: a
    persisted token would be undecryptable garbage after restart, so
    registration refuses LOUDLY (and rolls back) rather than persisting
    a registration that silently cannot survive. Secret-free locations
    persist fine without any key."""
    import pytest as _pytest

    from sclera_spark.engine import ScleraEngine

    monkeypatch.setenv("SCLERA_SPARK_CATALOG_DIR", str(tmp_path))
    monkeypatch.delenv("SCLERA_SPARK_KEY", raising=False)
    e1 = ScleraEngine(spark)
    with _pytest.raises(ValueError, match="SCLERA_SPARK_KEY"):
        e1.add_named_location(
            "badloc", "JDBC", ["jdbc:postgresql://h/db?password=pw"]
        )
    assert "badloc" not in e1.locations  # rolled back, not half-alive

    e1.add_named_location("okloc", "JDBC", ["jdbc:postgresql://h/db"])
    e2 = ScleraEngine(spark)
    assert "okloc" in e2.locations
    e2.remove_location("okloc")


def test_tables_and_views_persist_across_engine_restart(
    spark, tables, monkeypatch, tmp_path
):
    """r9 persisted catalog, table tier: with SCLERA_SPARK_CATALOG_DIR
    set, CREATE TABLE / SET FORMAT MANIFEST / CREATE VIEW registrations
    (and the warehouse parquet itself, now catalog-dir-resident)
    survive an engine restart — manifest tables rebind through the
    snapshot reader with history intact, and DROP persists too."""
    from sclera_spark.engine import ScleraEngine

    monkeypatch.setenv("SCLERA_SPARK_CATALOG_DIR", str(tmp_path))
    e1 = ScleraEngine(spark)
    e1.execute(
        "CREATE TABLE durable_t AS SELECT o_orderkey AS k, "
        "o_totalprice AS p FROM orders LIMIT 100"
    )
    e1.execute("ALTER TABLE durable_t SET FORMAT MANIFEST")
    e1.execute("INSERT INTO durable_t SELECT o_orderkey + 100000, "
               "o_totalprice FROM orders LIMIT 10")
    e1.execute(
        "CREATE VIEW durable_v AS SELECT count(*) AS n FROM durable_t"
    )
    n = e1.table("durable_t").count()
    v = e1.sql("SELECT * FROM durable_v").first().n

    e2 = ScleraEngine(spark)  # the "restarted" engine
    try:
        assert e2.table("durable_t").count() == n
        assert e2.sql("SELECT * FROM durable_v").first().n == v
        # manifest identity survives: DML still commits through the log
        hist = e2.execute("DESCRIBE HISTORY durable_t")
        assert hist[0]["op"] in ("append", "convert", "create")
        e2.execute("DELETE FROM durable_t WHERE k > 100000")
        assert e2.table("durable_t").count() < n
    finally:
        e2.execute("DROP VIEW durable_v")
        e2.execute("DROP TABLE durable_t")
    e3 = ScleraEngine(spark)
    assert "durable_t" not in e3.ddl().managed
    assert "durable_v" not in e3.ddl().views


def test_added_tables_persist_across_engine_restart(
    spark, tables, monkeypatch, tmp_path
):
    """ADD TABLE loc.t provenance (the last process-state catalog
    tier): with SCLERA_SPARK_CATALOG_DIR set, location-table
    registrations re-pull on restart, aliases intact."""
    from sclera_spark.engine import ScleraEngine

    monkeypatch.setenv("SCLERA_SPARK_CATALOG_DIR", str(tmp_path))
    e1 = ScleraEngine(spark)
    e1.add_named_location(
        "tdloc", "PARQUETDIR", ["/root/testdata/sf0.001"]
    )
    e1.add_location_table("tdloc", "region", as_name="reg_alias")
    n = e1.table("reg_alias").count()
    assert n == 5

    e2 = ScleraEngine(spark)
    assert e2.table("reg_alias").count() == n
    assert e2.table_locations.get("reg_alias") == "tdloc"
    e2.remove_location("tdloc")
