"""Wire-server interop against a REAL JDBC client (the reference's own
interop tier: modules/interfaces/jdbc/JDBCTestSuite.scala:24-93 runs its
server through java.sql.DriverManager). The PostgreSQL JDBC driver is
the independent client here — like psql/libpq in test_server_interop.py
it crosses a codec this repo did not write, but additionally exercises
the EXTENDED query protocol the way JDBC actually drives it
(Parse/Bind/Describe/Execute with prepared-statement re-execution),
DatabaseMetaData introspection, identifier/literal quoting, and
close-then-reconnect (the reference repeats its whole suite for this:
RepeatJDBCTestSuite).

The suite needs a pgjdbc jar. This container ships none (checked:
pyspark's jars dir has only derby/hive/spark-connect JDBC drivers, no
~/.ivy2 or ~/.m2 caches exist, and there is no network to fetch one),
so the tests SKIP with that explanation — but the suite is real code:
point SCLERA_PGJDBC_JAR at a postgresql-*.jar (or drop one into any of
the searched locations) and it runs the full JDBCTestSuite mirror over
TLS + SCRAM-SHA-256, driven by `java` in source-file mode (JDK 17, no
javac needed).
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess

import pytest

from sclera_spark.engine import ScleraEngine
from sclera_spark.interfaces import ScleraServer


def _find_pgjdbc_jar() -> str | None:
    env = os.environ.get("SCLERA_PGJDBC_JAR")
    if env and os.path.exists(env):
        return env
    try:
        import pyspark

        spark_jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    except ImportError:
        spark_jars = ""
    patterns = [
        os.path.join(spark_jars, "postgresql-*.jar"),
        os.path.expanduser("~/.ivy2/**/postgresql*.jar"),
        os.path.expanduser("~/.ivy2.5.2/**/postgresql*.jar"),
        os.path.expanduser("~/.m2/repository/org/postgresql/**/*.jar"),
        "/usr/share/java/postgresql*.jar",
    ]
    for pat in patterns:
        hits = sorted(glob.glob(pat, recursive=True))
        if hits:
            return hits[-1]
    return None


_JAR = _find_pgjdbc_jar()
_JAVA = shutil.which("java")

pytestmark = pytest.mark.skipif(
    _JAR is None or _JAVA is None,
    reason=(
        "no PostgreSQL JDBC jar in this container (searched Spark's jars "
        "dir, ~/.ivy2, ~/.m2, /usr/share/java, $SCLERA_PGJDBC_JAR; no "
        "network to fetch one) — psql/libpq interop in "
        "test_server_interop.py is the independent-client ceiling here. "
        "Provide a jar via SCLERA_PGJDBC_JAR to run the full JDBC suite."
    ),
)

# Mirrors JDBCTestSuite.scala:24-93 + RepeatJDBCTestSuite: connection,
# statement, query + ResultSetMetaData (incl. findColumn and the b'ar
# quoting probe), closed-statement/connection errors, reconnect; plus
# the JDBC-specific surface the reference exercises implicitly through
# pgjdbc: DatabaseMetaData.getTables and PreparedStatement re-execution.
_JAVA_SRC = r"""
import java.sql.*;
import java.util.Properties;

public class JdbcInterop {
    public static void main(String[] args) throws Exception {
        String url = "jdbc:postgresql://127.0.0.1:" + args[0]
            + "/sclera?sslmode=require&connectTimeout=10&loginTimeout=10";
        Properties props = new Properties();
        props.setProperty("user", "alice");
        props.setProperty("password", "s3cret-pw");

        for (int round = 0; round < 2; round++) {  // Repeat suite: reconnect
            Connection conn = DriverManager.getConnection(url, props);

            Statement stmt = conn.createStatement(
                ResultSet.TYPE_FORWARD_ONLY, ResultSet.CONCUR_READ_ONLY);
            ResultSet rs = stmt.executeQuery("select 'b''ar' as foo");
            ResultSetMetaData md = rs.getMetaData();
            check(md.getColumnCount() == 1, "column count");
            check(md.getColumnName(1).equalsIgnoreCase("foo"), "column name");
            int t = md.getColumnType(1);
            check(t == Types.VARCHAR || t == Types.CHAR, "column type");
            check(rs.next(), "row present");
            check(rs.getString(1).equals("b'ar"), "value by index");
            check(rs.getString("foo").equals("b'ar"), "value by name");
            check(rs.getString(rs.findColumn("foo")).equals("b'ar"),
                  "value by findColumn");
            check(!rs.next(), "single row");
            rs.close();

            // prepared-statement re-execution (extended protocol reuse)
            PreparedStatement ps = conn.prepareStatement(
                "select r_name from region where r_regionkey = ?");
            for (int k = 0; k < 3; k++) {
                ps.setInt(1, k);
                ResultSet prs = ps.executeQuery();
                check(prs.next(), "prepared row " + k);
                check(prs.getString(1).length() > 0, "prepared value " + k);
                check(!prs.next(), "prepared single row " + k);
                prs.close();
            }
            ps.close();

            // DatabaseMetaData introspection (pg_catalog emulation)
            DatabaseMetaData dbmd = conn.getMetaData();
            ResultSet tabs = dbmd.getTables(null, null, "%", null);
            boolean sawRegion = false;
            while (tabs.next())
                if (tabs.getString("TABLE_NAME").equalsIgnoreCase("region"))
                    sawRegion = true;
            check(sawRegion, "getTables lists region");
            tabs.close();

            // closed statement/connection raise, never hang
            stmt.close();
            try {
                stmt.executeQuery("select 1 as foo");
                check(false, "closed statement must throw");
            } catch (SQLException expected) {}
            conn.close();
            try {
                conn.createStatement();
                check(false, "closed connection must throw");
            } catch (SQLException expected) {}
        }
        System.out.println("JDBC_INTEROP_OK");
    }

    static void check(boolean ok, String what) {
        if (!ok) throw new RuntimeException("FAILED: " + what);
    }
}
"""


@pytest.fixture(scope="module")
def secure_server(spark, tables):
    engine = ScleraEngine(spark)
    for name, df in tables.items():
        engine.add_table(name, df)
    srv = ScleraServer(
        engine, tls="auto", auth={"alice": "s3cret-pw"}
    ).start()
    yield srv
    srv.stop()


def test_jdbc_suite_over_tls_scram(secure_server, tmp_path):
    src = tmp_path / "JdbcInterop.java"
    src.write_text(_JAVA_SRC)
    proc = subprocess.run(
        [_JAVA, "-cp", _JAR, str(src), str(secure_server.port)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert "JDBC_INTEROP_OK" in proc.stdout
