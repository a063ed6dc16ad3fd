"""Type-normalization layer (SURVEY §1.2, M3).

The reference coarsens JDBC types into {number, float, date, str, byte}
(lwetl/jdbc.py:28-32, 104-119) and exposes a user-facing forced-cast surface
(`return_type` / `--cast`, lwetl/jdbc.py:328-355).  Spark is schema-typed, so
the inference machinery disappears; what remains user-visible is:

- column-name normalization + uniquification (lwetl/jdbc.py:105-107,
  lwetl/table_import.py:27-49),
- the cast veneer incl. strptime formats and the multilingual boolean token
  set (lwetl/jdbc.py:332-334),
- the null/empty-string policy (lwetl/utils.py:17-23).

Everything here builds Column expressions (JVM-side, codegen'd) — no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# boolean tokens accepted by the reference's bool cast (lwetl/jdbc.py:332-334)
BOOL_TRUE_TOKENS = ("true", "1", "yes", "si", "y", "s")

#: coarse type model (lwetl/jdbc.py:28-32) → Spark types
COARSE_TO_SPARK = {
    "number": T.LongType(),
    "decimal": T.DecimalType(38, 18),
    "float": T.DoubleType(),
    "date": T.TimestampType(),
    "str": T.StringType(),
    "byte": T.BinaryType(),
}

# date-shaped strings the reference sniffs (lwetl/utils.py:12-14)
RE_IS_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
RE_IS_DATE_TIME = re.compile(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?$")

# strptime directives → Spark datetime pattern letters, for the
# `return_type=<strptime fmt>` cast surface (lwetl/jdbc.py:344-345)
_STRPTIME_TO_SPARK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%p": "a",
    "%I": "hh",
    "%%": "%",
}


def strptime_to_spark(fmt: str) -> str:
    """Translate a Python strptime format to a Spark datetime pattern."""
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            out.append(_STRPTIME_TO_SPARK.get(tok, tok))
            i += 2
        else:
            ch = fmt[i]
            # literal letters must be quoted in Spark datetime patterns
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def normalize_names(df: DataFrame, upper: bool = True) -> DataFrame:
    """Column-name normalization pass: upper-case (lwetl/jdbc.py:105-107)
    and uniquify duplicates / name blanks `C{n}` (lwetl/table_import.py:27-49).
    """
    seen: dict[str, int] = {}
    new = []
    for i, c in enumerate(df.columns):
        name = c.strip() if c else ""
        if upper:
            name = name.upper()
        if not name:
            name = f"C{i}"
        if name in seen:
            # bump the suffix until free — a suffixed name can itself
            # collide with an explicit column (e.g. ['c', '', 'c'] must
            # not produce C1 twice)
            base = name
            while name in seen:
                seen[base] = seen.get(base, 0) + 1
                name = f"{base}{seen[base]}"
        seen[name] = 0
        new.append(name)
    return df.toDF(*new)


def parse_bool(col: Column) -> Column:
    """Multilingual boolean parse (lwetl/jdbc.py:332-334): true/1/yes/si/y/s
    (case-insensitive) → true; null stays null; everything else false.
    """
    return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
        F.lower(F.trim(col.cast("string"))).isin(*BOOL_TRUE_TOKENS)
    )


def is_empty(col: Column) -> Column:
    """NULL/empty-string conflation (lwetl/utils.py:17-23): None or
    whitespace-only string counts as empty."""
    return col.isNull() | (F.trim(col.cast("string")) == F.lit(""))


def cast_column(col: Column, return_type: str) -> Column:
    """The `return_type` / `--cast` veneer (lwetl/jdbc.py:328-355).

    Accepted: 'str' | 'int' | 'bool' | 'float' | 'date' | a strptime
    format | 'any' (no-op).
    """
    rt = return_type.strip()
    if rt in ("any", ""):
        return col
    if rt == "str":
        return col.cast("string")
    if rt == "int":
        return col.cast("long")
    if rt == "float":
        return col.cast("double")
    if rt == "bool":
        return parse_bool(col)
    if rt == "date":
        return F.to_timestamp(col)
    if "%" in rt:  # strptime format
        return F.to_timestamp(col.cast("string"), strptime_to_spark(rt))
    raise ValueError(f"unsupported return_type: {return_type!r}")


def apply_casts(df: DataFrame, casts: list[str]) -> DataFrame:
    """Apply per-leading-column casts, like the CLI `--cast a,b,c`
    (lwetl/programs/sql_query/cmdline.py:129-132): cast i-th listed type to
    the i-th column, remaining columns untouched.
    """
    cols = []
    for i, c in enumerate(df.columns):
        if i < len(casts) and casts[i]:
            cols.append(cast_column(F.col(c), casts[i]).alias(c))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def drop_empty_values(row: dict) -> dict:
    """Presentation-layer replica of dict rows dropping empty values
    (lwetl/jdbc.py:356-361, uploader skip-empties lwetl/uploader.py:329).
    Engine data stays as real nulls; this applies only at the row-dict
    surface."""
    return {
        k: v
        for k, v in row.items()
        if v is not None and not (isinstance(v, str) and v.strip() == "")
    }
