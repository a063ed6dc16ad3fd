"""Scalar function surface (SURVEY §2.6).

Everything is a Column-expression builder — JVM-side, inside whole-stage
codegen.  No Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_row_hash(*cols: Column | str, sep: str = ";") -> Column:
    """Row checksum (SURVEY F1): md5 of the ';'-joined non-null values,
    matching the reference idiom
    ``md5(';'.join(str(v) for v in row if v is not None))``
    (reference examples/calc_md5.py:12-16).  `concat_ws` skips nulls, which
    reproduces the `if v is not None` filter exactly.
    """
    as_str = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.md5(F.concat_ws(sep, *as_str))


def epoch_millis(col: Column | str) -> Column:
    """Epoch-millisecond conversion (SURVEY F5): the reference builds
    ``java.sql.Timestamp(epoch_s*1000 + µs//1000)`` (lwetl/uploader.py:516-517).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c)


def grouped_string_agg(col: Column | str, sep: str = "|") -> Column:
    """Grouped string aggregation (SURVEY A8): the reference collects names
    per group and emits ``'|'.join(sorted(set(names)))`` client-side
    (reference examples/usernames.py:312).  Distributed equivalent:
    collect_set → array_sort → array_join, one shuffle, no driver loop.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.collect_set(c)), sep)


def epoch_micros(col: Column | str, data_type=None) -> Column:
    """Epoch microseconds (long).  The ONE place the session-timezone
    caveat lives (ADVICE r1):

    - `data_type=TimestampType` (LTZ): `unix_micros` — a true absolute
      epoch, independent of the session timezone.
    - `data_type=TimestampNTZType` (or None): microsecond diff against
      the NTZ epoch literal (Spark ≥4.1 forbids the direct
      TIMESTAMP_NTZ→DOUBLE cast).  This interprets the wall clock as
      UTC; for an LTZ input column with `data_type=None` the implicit
      NTZ cast uses the SESSION timezone, so it is only an absolute
      epoch under a UTC session (session.get_spark pins UTC).  Callers
      holding a DataFrame should pass `df.schema[col].dataType` to get
      the tz-independent dispatch.
    """
    from pyspark.sql import types as T

    c = F.col(col) if isinstance(col, str) else col
    if isinstance(data_type, T.TimestampType):
        return F.unix_micros(c)
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def epoch_seconds(col: Column | str, data_type=None) -> Column:
    """Epoch seconds (double, microsecond precision) — see `epoch_micros`
    for the timezone dispatch and caveat."""
    return epoch_micros(col, data_type) / F.lit(1000000.0)
