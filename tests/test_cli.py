"""CLI (sql-query, SURVEY C1) end-to-end through the argv surface."""

from __future__ import annotations

import io
from contextlib import redirect_stdout


def _run(argv: list[str]) -> str:
    from lwetl_spark.cli import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(argv)
    assert rc == 0
    return buf.getvalue()


def test_cli_list(spark):
    out = _run(["-d", "/root/testdata/sf0.001", "list"])
    assert "lineitem" in out and "embeddings" in out


def test_cli_table_shorthand_text(spark):
    out = _run(["-d", "/root/testdata/sf0.001", "-m", "3", "region"])
    assert "r_name" in out.splitlines()[0]
    assert len(out.splitlines()) == 4


def test_cli_multi_statement_csv(spark):
    out = _run(
        ["-d", "/root/testdata/sf0.001", "-f", "csv",
         "SELECT COUNT(*) AS n FROM region; SELECT COUNT(*) AS n FROM nation"]
    )
    lines = [l for l in out.splitlines() if l]
    assert lines == ["n", "5", "n", "25"]


def test_cli_sql_format(spark):
    out = _run(
        ["-d", "/root/testdata/sf0.001", "-f", "sql", "-m", "2", "--table", "R",
         "SELECT r_name FROM region ORDER BY r_name"]
    )
    assert out.splitlines()[0] == "INSERT INTO R (r_name) VALUES ('AFRICA');"
