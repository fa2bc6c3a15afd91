"""Interactive shell (sclera_spark/shell.py) — reference REPL parity
(modules/interfaces/shell Repl.scala / ReplParser.scala:38-77):
multi-line statement assembly, ';'-separated multi-statement input,
statement echo, error recovery without restart, FORMAT TABLE/CSV,
TIME, SOURCE, RESET, EXPLAIN SCRIPT toggle, PLOT dispatch to a
Vega-Lite file, and quit forms. The in-process tests drive the same
``run`` loop the terminal uses; the pexpect test drives the real
``python -m sclera_spark.shell`` TTY entry end-to-end."""

from __future__ import annotations

import io
import json
import os

import pytest

from sclera_spark.engine import ScleraEngine
from sclera_spark.shell import ScleraShell


@pytest.fixture()
def engine(spark, tables):
    return ScleraEngine(spark)


def _drive(engine, lines, tmp_path=None):
    out = io.StringIO()
    sh = ScleraShell(engine, out=out)
    if tmp_path is not None:
        sh.plot_dir = str(tmp_path)
    it = iter(lines)

    def inp(prompt):
        try:
            return next(it)
        except StopIteration:
            raise EOFError

    sh.run(inp)
    return out.getvalue(), sh


def test_multiline_assembly_and_table_output(engine):
    out, _ = _drive(
        engine,
        [
            "SELECT r_name, r_regionkey",  # no ';' -> continuation
            "FROM region",
            "ORDER BY 2 LIMIT 2;",
        ],
    )
    assert "r_name" in out and "AFRICA" in out and "AMERICA" in out
    assert "(2 rows)" in out


def test_multi_statement_input_and_echo(engine):
    out, _ = _drive(
        engine,
        ["ECHO ON", "SELECT 1 AS a; SELECT 2 AS b;"],
    )
    # both statements echoed (ECHO ON) and both ran
    assert "SELECT 1 AS a" in out and "SELECT 2 AS b" in out
    a = out.index("(1 row)")
    assert "(1 row)" in out[a + 1 :]


def test_error_recovery_without_restart(engine):
    """A failing statement reports and the SAME session keeps serving —
    the reference's handleInputInteractive recovery, no reconnect."""
    out, _ = _drive(
        engine,
        [
            "SELECT bogus FROM nowhere;",
            "SELECT 42 AS answer;",
        ],
    )
    assert "ERROR:" in out
    assert "42" in out.split("ERROR:")[1]  # later statement still ran


def test_comments_and_blank_lines_skipped(engine):
    out, _ = _drive(
        engine,
        ["", "-- a comment", "SELECT 7 AS x;"],
    )
    assert "7" in out and "ERROR" not in out


def test_format_csv_variants_and_reset_to_table(engine):
    out, _ = _drive(
        engine,
        [
            "FORMAT CSV",
            "SELECT r_name FROM region ORDER BY 1 LIMIT 2;",
            "FORMAT CSV TDF",
            "SELECT r_name FROM region ORDER BY 1 LIMIT 1;",
            "FORMAT TABLE",
            "SELECT r_name FROM region ORDER BY 1 LIMIT 1;",
        ],
    )
    assert "r_name\r\nAFRICA\r\nAMERICA" in out  # csv DEFAULT
    assert "r_name\tAFRICA".replace("\t", "\t") not in out  # header/rows split by newline
    assert "r_name\r\nAFRICA" in out
    # TABLE format came back: aligned header + separator line
    assert "------" in out
    with pytest.raises(Exception):
        ScleraShell(engine, out=io.StringIO()).handle_command("FORMAT CSV NOPE")


def test_time_wraps_any_command(engine):
    out, _ = _drive(engine, ["TIME SELECT count(*) AS n FROM nation;"])
    assert "Elapsed time:" in out and "ms" in out


def test_source_runs_script_file(engine, tmp_path):
    script = tmp_path / "s.sql"
    script.write_text(
        "-- comment\nSELECT 1 AS one;\nSELECT 2 AS two;\n"
    )
    out, _ = _drive(engine, [f"SOURCE '{script}'"])
    assert out.count("(1 row)") == 2


def test_explain_script_toggle(engine):
    out, _ = _drive(
        engine,
        [
            "EXPLAIN SCRIPT ON",
            "SELECT r_regionkey FROM region WHERE r_regionkey > 1;",
            "EXPLAIN SCRIPT OFF",
            "SELECT 5 AS x;",
        ],
    )
    assert "== Physical Plan ==" in out
    # after OFF, no further plans are printed
    assert "Physical Plan" not in out.split("5")[-1]


def test_plot_dispatch_writes_vega_lite_file(engine, tmp_path):
    out, sh = _drive(
        engine,
        [
            "SELECT r_regionkey AS x, count(*) AS n FROM region "
            "GROUP BY 1 PLOT (GEOM = bar(X = x, Y = n));",
        ],
        tmp_path=tmp_path,
    )
    assert "Plot spec written to" in out
    path = out.split("Plot spec written to ")[1].splitlines()[0].strip()
    spec = json.load(open(path))
    assert spec["mark"] == "bar" and "encoding" in spec


def test_reset_and_quit_forms(engine):
    for quit_cmd in ("\\q", "QUIT", "EXIT"):
        out, sh = _drive(engine, ["RESET", quit_cmd, "SELECT 1 AS x;"])
        assert sh._done  # loop left before the trailing SELECT
        assert "(1 row)" not in out


def test_admin_statements_render(engine):
    out, _ = _drive(engine, ["DESCRIBE region;", "LIST TABLES;"])
    assert "r_regionkey" in out and "region" in out


def test_pexpect_end_to_end(tmp_path):
    """The real ``python -m sclera_spark.shell`` under a pty: banner,
    prompt, statement echo off->on, error recovery, history-capable
    line input, EOF exit — the reference REPL smoke, against a live
    engine in a fresh process."""
    pexpect = pytest.importorskip("pexpect")

    env = dict(os.environ)
    env["HOME"] = str(tmp_path)  # isolate history file
    child = pexpect.spawn(
        "python",
        [
            "-m",
            "sclera_spark.shell",
            "--master",
            "local[2]",
            "--data-dir",
            "/root/testdata/sf0.001",
        ],
        env=env,
        cwd=os.getcwd(),
        encoding="utf-8",
        timeout=180,
    )
    child.expect("Welcome to Sclera-on-Spark")
    child.expect("sclera> ")
    child.sendline("SELECT r_name FROM region ORDER BY 1 LIMIT 1;")
    child.expect("AFRICA")
    child.expect(r"\(1 row\)")
    child.expect("sclera> ")
    # continuation prompt on incomplete input
    child.sendline("SELECT count(*) AS n")
    child.expect(r"\.\.\.> ")
    child.sendline("FROM nation;")
    child.expect("25")
    child.expect("sclera> ")
    # error recovery in the same process
    child.sendline("SELECT nope FROM nowhere;")
    child.expect("ERROR:")
    child.expect("sclera> ")
    child.sendline("TIME SELECT 1 AS one;")
    child.expect("Elapsed time:")
    child.expect("sclera> ")
    child.sendcontrol("d")
    child.expect("Goodbye")
    child.expect(pexpect.EOF)
    child.wait()
    assert child.exitstatus == 0


def test_tab_completer_candidates(engine):
    """Keywords and LIVE catalog names complete, case-insensitively;
    a just-created table appears without re-installing the completer."""
    from sclera_spark.shell import ShellCompleter

    comp = ShellCompleter(engine)
    assert "SELECT" in comp.candidates("sel")
    assert "DESCRIBE HISTORY" in comp.candidates("desc")
    assert "region" in comp.candidates("reg")
    engine.execute("CREATE TABLE compl_t AS SELECT 1 AS x")
    try:
        assert "compl_t" in comp.candidates("compl")
        # readline protocol: state-indexed iteration ends with None
        first = comp("nat", 0)
        assert first == "nation"
        assert comp("nat", 99) is None
    finally:
        engine.execute("DROP TABLE compl_t")
