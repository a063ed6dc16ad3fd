"""Pins the driver's output-shape contract so an r02-class failure cannot
ship again: the real driver canonicalizes every query result through
pandas (`sort_values` over all columns), which hard-fails on (a)
array/map/struct-valued columns and (b) timestamps outside pandas'
datetime64[ns] range, and (c) silently hash-mismatches DecimalType
columns (Spark collects decimal.Decimal, DuckDB renders float64 — equal
values, different hash inputs).  Three r02 queries were mathematically
correct but `err`'d on shapes (a)/(b); three r03 queries were
bit-identical but hash-FAILED on shape (c) (`x_table_checksum`,
`x_incremental_agg`, `k8_orc_roundtrip`).

The driver-facing output dtype whitelist is
**long / double / string / date / timestamp / bool** — nothing else has
proven cross-engine hash behavior.

Three layers of defense:
1. the shared canonicalizer (`tools/driver_canon.py`, also used by
   `tools/driver_sim.py`) provably rejects all three shapes;
2. every registered query's schema is statically whitelist-typed — no
   Array/Map/Struct/Decimal columns can reach the driver;
3. every query with timestamp-typed output columns is executed at
   sf0.001 and its rows pushed through the canonicalizer, so an
   out-of-range sentinel raises here first.
"""

from __future__ import annotations

import datetime
import importlib.util
from pathlib import Path

import pytest
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE

import __spark_entry__ as entry_mod

_spec = importlib.util.spec_from_file_location(
    "driver_canon", Path(__file__).resolve().parent.parent / "tools" / "driver_canon.py"
)
driver_canon = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(driver_canon)

QUERIES = entry_mod.queries()

_NON_PORTABLE = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)


def test_canon_rejects_array_cells():
    with pytest.raises(TypeError):
        driver_canon.canon([(1, [1.0, 2.0]), (2, [3.0, 4.0])], ["a", "b"])


def test_canon_rejects_decimal_cells():
    """decimal.Decimal cells are the r03 failure class: equal values hash
    differently across engines, so the canon must refuse them outright."""
    import decimal

    with pytest.raises(TypeError, match="decimal"):
        driver_canon.canon(
            [(1, decimal.Decimal("10.25")), (2, decimal.Decimal("3.50"))],
            ["a", "b"],
        )


def test_canon_rejects_out_of_range_timestamps():
    rows = [
        (1, datetime.datetime(2024, 1, 1)),
        (2, datetime.datetime(9999, 12, 31)),  # past pandas' 2262-04-11 max
    ]
    with pytest.raises((ValueError, pytest.importorskip("pandas").errors.OutOfBoundsDatetime)):
        driver_canon.canon(rows, ["a", "b"])


def test_canon_accepts_max_inrange_sentinel():
    # the sentinel x_scd2 actually uses must be canonicalizable
    rows = [(1, datetime.datetime(2262, 1, 1)), (2, datetime.datetime(2024, 6, 1))]
    out = driver_canon.records(driver_canon.canon(rows, ["a", "b"]))
    assert out[0][1] == datetime.datetime(2262, 1, 1) or out[1][1] == datetime.datetime(2262, 1, 1)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_schema_is_scalar_typed(name, spark):
    """No registered query may expose array/map/struct columns (the
    driver's pandas canon cannot factorize them — r02 `err`) or decimal
    columns (equal values hash differently across engines — r03
    hash-FAIL).  The driver-facing whitelist is long/double/string/
    date/timestamp/bool.  Schema is available without executing the
    plan."""
    df = QUERIES[name](spark, SF_SMOKE)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _NON_PORTABLE)]
    assert not bad, (
        f"{name} exposes non-portable columns {bad}; the driver-facing "
        "dtype whitelist is long/double/string/date/timestamp/bool — "
        "serialize/posexplode arrays, cast decimals to string or "
        "ROUND(double, n)"
    )


def _timestamp_queries(spark):
    out = []
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, SF_SMOKE)
        if any(
            isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType))
            for f in df.schema.fields
        ):
            out.append((name, df))
    return out


def test_timestamp_outputs_are_pandas_canonicalizable(spark):
    """Execute every timestamp-bearing query at sf0.001 and push its rows
    through the driver canon — an out-of-ns-range sentinel (like r02's
    9999-12-31 in x_scd2) raises here before it can reach the driver."""
    checked = []
    for name, df in _timestamp_queries(spark):
        rows = [tuple(r) for r in df.collect()]
        cols = [c.lower() for c in df.columns]
        try:
            driver_canon.canon(rows, cols)
        except Exception as e:  # noqa: BLE001 - re-raise with query name
            raise AssertionError(f"{name}: driver canon rejected output: {e}") from e
        checked.append(name)
    assert "x_scd2" in checked  # the r02 regression case must be covered


def test_sample_order_is_stale_first():
    """VERDICT r5 #1: the driver samples a 50-key prefix of queries()
    each round. Never/failed keys must surface first (backlog), and the
    already-green tier must rotate STALEST-EVIDENCE-FIRST so old rows
    get refreshed instead of re-checking the same registration prefix
    forever."""
    from lwetl_spark import queries as Q

    green = Q._SAMPLED_GREEN
    assert green, "CORRECTNESS_r*.json artifacts must be parseable"
    order = list(Q.queries().keys())
    # every non-green key precedes every green key
    green_positions = [i for i, k in enumerate(order) if k in green]
    fresh_positions = [i for i, k in enumerate(order) if k not in green]
    if fresh_positions and green_positions:
        assert max(fresh_positions) < min(green_positions)
    # the green tier is non-decreasing in evidence round
    rounds = [green[k] for k in order if k in green]
    assert rounds == sorted(rounds), "green tier must be oldest-evidence-first"
