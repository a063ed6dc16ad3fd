"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lwetl_spark`` (see SURVEY.md §2 for the
operator inventory; each builder cites the reference file:line it
covers).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the repo importable regardless of the driver's cwd
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from lwetl_spark import queries as _catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: lineitem ⋈ orders ⋈
    customer star join + group/agg/having (SURVEY M1)."""
    return _catalog.q1_flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.10 NEW)."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query — EVERY registered key has
    one (non-SQL-portable constructions register value-contract oracles:
    the query emits exact driver-checkable values plus booleans
    asserting the non-portable part's documented property, and the
    oracle pins both)."""
    return _catalog.oracle_sql()
