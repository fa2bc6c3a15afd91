"""Client-facing interfaces (reference modules/interfaces/{jdbc,shell}).

The reference ships a JDBC driver and shell REPL so external clients can
reach the engine (interfaces/jdbc/src/main/scala/Statement.scala,
shell/src/main/scala/Repl.scala). Here the same role is played by a
PostgreSQL wire-protocol server (`server.ScleraServer`) — any client that
speaks the public PostgreSQL frontend/backend protocol v3 (psql, psycopg,
the PostgreSQL JDBC driver) can connect, introspect the pg_catalog
emulation, and run Sclera-dialect SQL through the engine.
"""

from sclera_spark.interfaces.server import ScleraServer, WireClient

__all__ = ["ScleraServer", "WireClient"]
