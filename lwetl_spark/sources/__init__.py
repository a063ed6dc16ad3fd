from lwetl_spark.sources.csv import csv_source
from lwetl_spark.sources.xlsx import xlsx_source
from lwetl_spark.sources.ldif import ldif_source, parse_ldif_text
from lwetl_spark.sources.sqlscript import split_statements, run_script

__all__ = [
    "csv_source",
    "xlsx_source",
    "ldif_source",
    "parse_ldif_text",
    "split_statements",
    "run_script",
]
