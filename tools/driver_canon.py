"""The driver's result canonicalizer, replicated for the local gate.

The real spark-graft driver canonicalizes each query result through
pandas before hashing: build a DataFrame, order columns by name, then
`sort_values` over every column.  Two output shapes that plain Python
tuples tolerate are hard FAILURES on that path (both shipped as r02
`err` rows):

- array/map/struct-valued cells — `sort_values` -> `factorize` raises
  ``TypeError: unhashable type: 'list'``;
- timestamps outside pandas' datetime64[ns] range (1677-09-21 ..
  2262-04-11) — coercion raises ``OutOfBoundsDatetime``;
- decimal-valued cells — Spark collects DECIMAL columns as
  ``decimal.Decimal`` objects while DuckDB's pandas conversion renders
  the same values as float64 (or a different object form), so the
  driver's order-insensitive value hash sees two different
  representations of equal numbers: rows_match/schema_match TRUE,
  hash_match FALSE (the r03 failure class: `x_table_checksum`,
  `x_incremental_agg`, `k8_orc_roundtrip`).

The portable driver-facing output dtype whitelist is therefore
**long / double / string / date / timestamp / bool** — nothing else has
proven cross-engine hash behavior.  Queries keep DECIMAL math internal
and cast at the surface: exact big integers -> string, 2-dp money sums
-> ROUND(double, 2).

`tools/driver_sim.py` and `tests/test_driver_contract.py` both import
this module so the local gate is exactly as strict as the driver.
"""
from __future__ import annotations

import datetime
import decimal

import pandas as pd


def canon(rows, cols):
    """Canonicalize collected rows the way the driver does.

    Raises exactly where the driver raises or silently diverges:
    list/dict cells fail inside `sort_values`, out-of-ns-range datetimes
    fail in `pd.to_datetime` (the driver's canon performs the equivalent
    datetime coercion), and `decimal.Decimal` cells raise TypeError here
    because the driver's hash canonicalizes them differently across
    engines (a silent hash mismatch, worse than an error)."""
    df = pd.DataFrame.from_records(rows, columns=cols)
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            sample = next((v for v in df[c] if v is not None), None)
            if isinstance(sample, decimal.Decimal):
                raise TypeError(
                    f"column {c!r} carries decimal.Decimal cells: DECIMAL "
                    "outputs hash differently across engines (r03 failure "
                    "class) — cast to string (exact big ints) or "
                    "ROUND(double, n) at the query surface"
                )
            if isinstance(sample, (datetime.datetime, datetime.date)):
                df[c] = pd.to_datetime(df[c])  # raises OutOfBoundsDatetime
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def records(df: pd.DataFrame) -> list[tuple]:
    """Canonical frame -> comparable tuples: NaN/NaT (the pandas image of
    SQL NULL) map to None so both engines' NULLs compare equal, floats
    normalize -0.0, Timestamps come back as stdlib datetimes."""
    out = []
    for row in df.itertuples(index=False):
        rec = []
        for v in row:
            if v is pd.NaT:
                v = None
            elif isinstance(v, float):
                v = None if v != v else v + 0.0
            elif isinstance(v, pd.Timestamp):
                v = v.to_pydatetime()
            rec.append(v)
        out.append(tuple(rec))
    return out
