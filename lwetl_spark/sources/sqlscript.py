"""SQL-script source (SURVEY S7).

Reference: `InputParser` (lwetl/input.py:11-112) — streams `;`-terminated
statements from a file / stdin / string, skipping line comments.  Here the
splitter feeds `spark.sql()` per statement, which makes Spark SQL the
backing engine the way the remote RDBMS was for the reference.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession


def split_statements(text: str) -> Iterator[str]:
    """Yield `;`-terminated statements, honoring single/double quotes and
    `--` line comments (reference lwetl/input.py:81-112 envelope)."""
    buf: list[str] = []
    in_squote = in_dquote = in_comment = False
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        nxt = text[i + 1] if i + 1 < n else ""
        if in_comment:
            if ch == "\n":
                in_comment = False
                buf.append(ch)
            i += 1
            continue
        if not in_squote and not in_dquote and ch == "-" and nxt == "-":
            in_comment = True
            i += 2
            continue
        if ch == "'" and not in_dquote:
            in_squote = not in_squote
        elif ch == '"' and not in_squote:
            in_dquote = not in_dquote
        if ch == ";" and not in_squote and not in_dquote:
            stmt = "".join(buf).strip()
            if stmt:
                yield stmt
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        yield tail


def run_script(spark: SparkSession, script: str) -> list[DataFrame]:
    """Execute every statement of a script with `spark.sql`, returning
    the result DataFrames (the reference buffers up to 20 result sets,
    lwetl/programs/sql_query/main.py:217-219 — no cap needed here since
    DataFrames are lazy)."""
    return [spark.sql(stmt) for stmt in split_statements(script)]
