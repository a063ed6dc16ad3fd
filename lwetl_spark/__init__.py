"""lwetl_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of the
reference ETL toolkit (rene-bakker-it/lwetl): relational operators, file-format
sources and sinks, DML-style write veneers, composite dataflow programs
(sql-query, db-copy, table-cardinality), plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis) that the
reference's single-connection JDBC architecture could never reach.

Design: declare everything as DataFrame / Spark SQL plans and let Catalyst +
Tungsten choose physical strategy.  Python UDFs appear only where built-in
expressions genuinely cannot express the semantics (and then Arrow-batched
pandas UDFs, never row-at-a-time).
"""

from lwetl_spark.session import get_spark, stop_spark
from lwetl_spark.catalog import load_table, register_tables, TABLES

__all__ = ["get_spark", "stop_spark", "load_table", "register_tables", "TABLES"]

__version__ = "0.1.0"
