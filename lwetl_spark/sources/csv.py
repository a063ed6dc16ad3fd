"""CSV source (SURVEY S4).

Reference: `CsvImport` (lwetl/table_import.py:120-219) — header-row column
naming, uniquified names, tab default delimiter, rows as dicts, ragged rows
growing `C{n}` columns.

Spark: `spark.read.csv` is distributed and schema-capable; the reference's
quirks that remain user-visible are the name normalization/uniquification
pass and the default tab separator.  Ragged-row growth cannot happen on a
fixed schema — extra fields land in `_corrupt_record` if enabled; the
`C{n}` naming applies when the file has no header.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lwetl_spark.types import normalize_names


def csv_source(
    spark: SparkSession,
    path: str,
    delimiter: str = "\t",
    header: bool = True,
    infer_schema: bool = True,
    upper_names: bool = True,
) -> DataFrame:
    """Read a CSV/TSV with the reference's naming semantics.

    Tab is the reference's default separator (lwetl/table_import.py:129).
    With `header=False` columns become C0, C1, ... like the reference's
    unnamed-column fallback (lwetl/table_import.py:27-49).
    """
    df = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("inferSchema", str(infer_schema).lower())
        # reference strips whitespace around values when parsing numbers
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
        .csv(path)
    )
    if not header:
        df = df.toDF(*[f"C{i}" for i in range(len(df.columns))])
    return normalize_names(df, upper=upper_names)
