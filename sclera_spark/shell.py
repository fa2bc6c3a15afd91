"""Interactive shell (REPL) over the engine — the last reference
*module* with engine-side semantics (modules/interfaces/shell:
Repl.scala, ReplParser.scala:38-77, ReplCommand.scala:27-45).

Reference behaviors mirrored, Spark-side:

- line editing + persistent history (stdlib readline when a TTY);
- multi-line statement assembly: input is complete when a line ends
  with ``;`` (Repl.scala consoleIter), empty lines and ``--`` comments
  are skipped, several ``;``-separated statements per input run in
  order (ReplParser.commands);
- meta commands (ReplParser.scala:38-67): ``ECHO ON|OFF``,
  ``FORMAT TABLE`` / ``FORMAT CSV [DEFAULT|EXCEL|MYSQL|RFC4180|TDF]``,
  ``TIME <command>`` (prints elapsed ms), ``SOURCE '<file>'``,
  ``RESET``, plus our engine's ``EXPLAIN SCRIPT ON|OFF`` toggle
  (prints each statement's formatted physical plan);
- ``<query> PLOT (...)`` dispatch (DisplayResult): the Vega-Lite spec
  the visual tier produces is written to a JSON file and the path
  printed — the headless analogue of the reference's browser display;
- statement errors are reported and the loop continues
  (handleInputInteractive's per-exception recovery);
- EOF (ctrl-D) or ``\\q``/``QUIT``/``EXIT`` leaves the shell.

Everything routes through ``ScleraEngine.execute`` — the shell owns no
SQL semantics, exactly like the reference shell delegates to its
Processor. Query output is rendered with the same value codec the
pg-wire tier serves to psql (interfaces/server._text_value), so a
value prints identically over both front ends.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time

_PROMPT = "sclera> "
_PART_PROMPT = "   ...> "

# rows fetched for display per query; past this the footer says so
_MAX_ROWS = 1000

_CSV_DIALECTS = {
    None: "excel",
    "DEFAULT": "excel",
    "EXCEL": "excel",
    "RFC4180": "excel",
    "MYSQL": "excel-tab",
    "TDF": "excel-tab",
}


def _text(v) -> str:
    """One value as text — the pg-wire codec, decoded ('NULL' for
    None so table output matches what psql shows)."""
    from sclera_spark.interfaces.server import _text_value

    b = _text_value(v)
    return "NULL" if b is None else b.decode("utf-8", "replace")


def _format_table(cols: list[str], rows: list[list[str]]) -> list[str]:
    """Reference Format.formatResultSet: an aligned text table."""
    widths = [len(c) for c in cols]
    for row in rows:
        for i, v in enumerate(row):
            widths[i] = max(widths[i], len(v))
    sep = "-+-".join("-" * w for w in widths)
    out = [
        " | ".join(c.ljust(w) for c, w in zip(cols, widths)),
        sep,
    ]
    for row in rows:
        out.append(" | ".join(v.ljust(w) for v, w in zip(row, widths)))
    return out


class ScleraShell:
    """One interactive session. ``inp`` is a callable(prompt) -> str
    (raises EOFError at end) so tests can drive the exact line-assembly
    path the terminal uses."""

    def __init__(self, engine, out=None):
        self.engine = engine
        self.out = out if out is not None else sys.stdout
        self.echo = False
        self.csv_dialect: str | None = None  # None = TABLE format
        self.plot_dir = os.getcwd()
        self._plot_n = 0
        self._done = False

    # ------------------------------------------------------------- io
    def _print(self, *lines: str) -> None:
        for ln in lines:
            print(ln, file=self.out)

    # ------------------------------------------- line assembly (REPL)
    def run(self, inp=None) -> None:
        """The consoleIter loop: assemble ';'-terminated input, handle,
        repeat; EOF ends the session."""
        if inp is None:
            inp = input
        partial: list[str] = []
        while not self._done:
            try:
                line = inp(_PART_PROMPT if partial else _PROMPT)
            except EOFError:
                break
            except KeyboardInterrupt:
                partial = []
                self._print("")
                continue
            s = line.strip()
            if not partial and (s == "" or s.startswith("--")):
                continue
            partial.append(line)
            if s.endswith(";") or self._is_meta(s):
                text = "\n".join(partial)
                partial = []
                self.handle_input(text)

    _META_RE = re.compile(
        r"^\s*(\\q|QUIT|EXIT|ECHO\b|FORMAT\b|RESET|SOURCE\b|TIME\b|"
        r"EXPLAIN\s+SCRIPT\b)",
        re.IGNORECASE,
    )

    def _is_meta(self, s: str) -> bool:
        """Meta commands don't need the ';' terminator (the reference
        lexes them as reserved words; '\\q' matches psql habit)."""
        return bool(self._META_RE.match(s))

    # ------------------------------------------------------- commands
    def handle_input(self, text: str) -> None:
        """Split ';'-separated statements (quote-aware — the wire
        tier's splitter) and run each; an error in one statement is
        reported and the REST still run (handleInputInteractive)."""
        from sclera_spark.interfaces.server import _split_statements

        for stmt in _split_statements(text):
            # drop LEADING blank/comment lines only — a '--' line inside
            # a statement body is the SQL parser's business, and a
            # whole-statement skip would swallow the SQL after a
            # comment header in a SOURCE'd script
            lines = stmt.splitlines()
            while lines and (
                lines[0].strip() == "" or lines[0].strip().startswith("--")
            ):
                lines.pop(0)
            stmt = "\n".join(lines).strip()
            if not stmt:
                continue
            try:
                self.handle_command(stmt)
            except SystemExit:
                raise
            except KeyboardInterrupt:
                self._print("Cancelled")
            except Exception as exc:  # error recovery: report, go on
                self._print(f"ERROR: {exc}")

    def handle_command(self, stmt: str) -> None:
        up = stmt.strip().rstrip(";").strip()
        u = up.upper()
        if u in ("\\Q", "QUIT", "EXIT"):
            self._done = True
            return
        if u.startswith("TIME ") or u == "TIME":
            begin = time.perf_counter()
            self.handle_command(up[4:].strip())
            ms = (time.perf_counter() - begin) * 1000.0
            self._print(f"Elapsed time: {ms:.1f} ms")
            return
        if u.startswith("ECHO"):
            self.echo = self._switch(up[4:], "ECHO")
            return
        if u == "RESET":
            # the reference drops temporary objects; our temporaries
            # are cached plans and derived pruning ranges
            try:
                self.engine.spark.catalog.clearCache()
            except Exception:
                pass
            getattr(self.engine, "_dyn_prune_cache", {}).clear()
            return
        if u.startswith("FORMAT"):
            self._set_format(up[6:].strip())
            return
        if u.startswith("SOURCE"):
            self._source(up[6:].strip())
            return
        m = re.match(r"^EXPLAIN\s+SCRIPT\s+(ON|OFF)$", u)
        if m:
            self.engine.config["explain_script"] = m.group(1).lower()
            if m.group(1) == "OFF":
                self.engine.script_explains = []
            return

        if self.echo:
            self._print(up)
        result = self.engine.execute(up)
        self._show(result)
        if self.engine.config.get("explain_script") == "on":
            for q, plan in getattr(self.engine, "script_explains", []):
                self._print(plan)
            self.engine.script_explains = []

    @staticmethod
    def _switch(rest: str, what: str) -> bool:
        v = rest.strip().upper()
        if v == "ON":
            return True
        if v == "OFF":
            return False
        raise ValueError(f"{what} expects ON or OFF, got {rest!r}")

    def _set_format(self, rest: str) -> None:
        v = rest.strip().upper()
        if v in ("", "TABLE"):
            self.csv_dialect = None
            return
        m = re.match(r"^CSV(?:\s+(\w+))?$", v)
        if not m or (m.group(1) or "DEFAULT") not in _CSV_DIALECTS:
            raise ValueError(f"Incorrect format: {rest!r}")
        self.csv_dialect = m.group(1) or "DEFAULT"

    def _source(self, rest: str) -> None:
        m = re.match(r"^'(.*)'$|^\"(.*)\"$|^(\S+)$", rest.strip())
        if not m:
            raise ValueError(f"SOURCE expects a file name, got {rest!r}")
        fname = next(g for g in m.groups() if g is not None)
        with open(fname) as fh:
            self.handle_input(fh.read())

    # ------------------------------------------------------ rendering
    def _show(self, result) -> None:
        from pyspark.sql import DataFrame

        if result is None:
            self._print("OK")
            return
        if isinstance(result, DataFrame):
            if result.columns == ["vega_lite_spec"]:
                self._show_plot(result)
                return
            rows = result.take(_MAX_ROWS + 1)
            truncated = len(rows) > _MAX_ROWS
            rows = rows[:_MAX_ROWS]
            cols = result.columns
            cells = [[_text(v) for v in row] for row in rows]
            self._emit_table(cols, cells, truncated)
            return
        # admin results: lists of tuples/dicts/scalars, or a scalar
        if isinstance(result, dict):
            result = sorted(result.items())
        if isinstance(result, (list, tuple)):
            items = list(result)
            if items and isinstance(items[0], dict):
                cols = list(items[0].keys())
                cells = [[_text(d.get(c)) for c in cols] for d in items]
            elif items and isinstance(items[0], (list, tuple)):
                cols = [f"c{i + 1}" for i in range(len(items[0]))]
                cells = [[_text(v) for v in it] for it in items]
            else:
                cols = ["result"]
                cells = [[_text(v)] for v in items]
            self._emit_table(cols, cells, False)
            return
        self._print(_text(result))

    def _emit_table(self, cols, cells, truncated: bool) -> None:
        if self.csv_dialect is not None:
            import csv

            buf = io.StringIO()
            w = csv.writer(buf, dialect=_CSV_DIALECTS[self.csv_dialect])
            w.writerow(cols)
            w.writerows(cells)
            self._print(buf.getvalue().rstrip("\r\n"))
        else:
            self._print(*_format_table(cols, cells))
        n = len(cells)
        more = f" (first {n} shown)" if truncated else ""
        self._print(f"({n} row{'s' if n != 1 else ''}){more}", "")

    def _show_plot(self, df) -> None:
        """DisplayResult, headless: write the Vega-Lite spec to a file
        next to the shell and print where (the reference submits it to
        a browser display server)."""
        spec = df.first()[0]
        self._plot_n += 1
        path = os.path.join(
            self.plot_dir, f"sclera_plot_{self._plot_n}.vl.json"
        )
        with open(path, "w") as fh:
            json.dump(json.loads(spec), fh, indent=2, sort_keys=True)
        self._print(f"Plot spec written to {path}")


class ShellCompleter:
    """Readline tab completion: SQL/meta keywords plus live catalog
    names (tables, views, manifest tables) — the reference shell's
    JLine completion, stdlib-style. Stateless per keypress: the name
    pool is re-read from the engine so a just-created table completes
    immediately."""

    KEYWORDS = [
        "SELECT", "FROM", "WHERE", "GROUP BY", "ORDER BY", "HAVING",
        "LIMIT", "JOIN", "LEFT JOIN", "INNER JOIN", "UNION", "CREATE",
        "CREATE TABLE", "CREATE VIEW", "INSERT INTO", "UPDATE",
        "DELETE FROM", "DROP TABLE", "DROP VIEW", "ALTER TABLE",
        "DESCRIBE", "DESCRIBE HISTORY", "EXPLAIN", "EXPLAIN SCRIPT",
        "LIST TABLES", "LIST FILES", "LIST LOCATIONS", "SHOW VERSIONS",
        "ADD LOCATION", "ADD TABLE", "OPTIMIZE", "VACUUM",
        "GENERATE SYMLINK MANIFEST FOR", "SET FORMAT MANIFEST",
        "SET BLOOM FILTER", "ECHO", "FORMAT", "TIME", "SOURCE",
        "RESET", "QUIT", "EXIT", "PLOT",
        "RESTORE TABLE", "SHALLOW CLONE", "TABLE_CHANGES",
        "ADD COLUMN", "EXPLAIN FILES", "SHOW CREATE TABLE", "DRY RUN",
        "CLUSTER BY", "TIMESTAMP AS OF", "DESCRIBE DETAIL",
    ]

    def __init__(self, engine):
        self.engine = engine
        self._matches: list[str] = []

    def candidates(self, text: str) -> list[str]:
        names: set[str] = set()
        try:
            names |= set(self.engine.catalog.tables)
            ddl = getattr(self.engine, "_ddl", None)
            if ddl is not None:
                names |= set(ddl.views) | set(ddl.manifest_tables)
            # session temp views registered outside the engine catalog
            names |= {
                t.name for t in self.engine.spark.catalog.listTables()
            }
        except Exception:
            pass
        pool = self.KEYWORDS + sorted(names)
        t = text.lower()
        return [w for w in pool if w.lower().startswith(t)]

    def __call__(self, text: str, state: int):
        if state == 0:
            self._matches = self.candidates(text)
        return self._matches[state] if state < len(self._matches) else None


def _history_file() -> str:
    return os.path.join(
        os.path.expanduser("~"), ".sclera_spark_history"
    )


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m sclera_spark.shell",
        description="Interactive Sclera-on-Spark shell",
    )
    p.add_argument("-c", "--command", help="run this input and exit")
    p.add_argument("-f", "--file", help="run statements from file and exit")
    p.add_argument(
        "--data-dir",
        default=os.environ.get("SCLERA_SHELL_DIR"),
        help="directory of <table>.parquet files to register at startup",
    )
    p.add_argument("--master", default="local[*]")
    args = p.parse_args(argv)

    from sclera_spark.engine import ScleraEngine
    from sclera_spark.session import build_session

    spark = build_session(app_name="sclera-shell", master=args.master)
    engine = ScleraEngine(spark)
    if args.data_dir:
        engine.add_location(args.data_dir)
    shell = ScleraShell(engine)

    if args.command is not None:
        shell.handle_input(args.command)
        return 0
    if args.file is not None:
        shell._source(repr(args.file))
        return 0

    interactive = sys.stdin.isatty()
    if interactive:
        try:
            import readline

            try:
                readline.read_history_file(_history_file())
            except OSError:
                pass
            readline.set_completer(ShellCompleter(engine))
            readline.set_completer_delims(" \t\n;,()")
            readline.parse_and_bind("tab: complete")
            import atexit

            atexit.register(
                lambda: _safe_write_history(readline)
            )
        except ImportError:
            pass
        from sclera_spark import __version__ as _v

        print(f"Welcome to Sclera-on-Spark {_v}")
        print(f"[{os.getcwd()}]")
        shell.run()
        print("Goodbye")
    else:
        # piped input: run everything, exit non-zero only on I/O death
        shell.handle_input(sys.stdin.read())
    return 0


def _safe_write_history(readline_mod) -> None:
    try:
        readline_mod.set_history_length(1000)
        readline_mod.write_history_file(_history_file())
    except OSError:
        pass


if __name__ == "__main__":
    sys.exit(main())
