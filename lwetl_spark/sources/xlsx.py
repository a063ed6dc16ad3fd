"""XLSX source (SURVEY S5).

Reference: `XlsxImport` (lwetl/table_import.py:378-480) — first or named
sheet, header row, dict-per-row, openpyxl read-only mode.

XLSX is a driver-side format by design (single zip container, no record
splitting) — the reference treats it the same way.  We parse with
openpyxl/pandas if available and distribute via `createDataFrame`;
bounded inputs only (same envelope as the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lwetl_spark.types import normalize_names


def xlsx_source(
    spark: SparkSession,
    path: str,
    sheet: str | int = 0,
    header: bool = True,
    upper_names: bool = True,
) -> DataFrame:
    """Read one worksheet into a DataFrame.  Requires openpyxl or pandas
    with an xlsx engine; raises ImportError with guidance otherwise."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet, header=0 if header else None)
    except ImportError as e:  # pragma: no cover - env without pandas/openpyxl
        raise ImportError(
            "xlsx_source needs pandas+openpyxl; install them or convert the "
            "workbook to CSV and use csv_source"
        ) from e
    if not header:
        pdf.columns = [f"C{i}" for i in range(len(pdf.columns))]
    else:
        pdf.columns = [str(c) for c in pdf.columns]
    # pandas NaN → None so Spark gets real nulls
    pdf = pdf.where(pdf.notna(), None)
    df = spark.createDataFrame(pdf)
    return normalize_names(df, upper=upper_names)
