from lwetl_spark.sinks.formatter import (
    write_csv,
    format_text_table,
    to_xml_string,
    write_xlsx,
    to_sql_inserts,
)
from lwetl_spark.sinks.uploader import Uploader, WritePolicy, add_pk_column

__all__ = [
    "write_csv",
    "format_text_table",
    "to_xml_string",
    "write_xlsx",
    "to_sql_inserts",
    "Uploader",
    "WritePolicy",
    "add_pk_column",
]
