"""JSONL (newline-delimited JSON) source and sink.

The reference has no JSON table source — its import surface is CSV, XLSX
and LDIF (lwetl/table_import.py) — but JSONL is the lingua franca of
training-data pipelines (every public corpus release ships as
``*.jsonl.{gz,zst}``), so the engine treats it as a first-class format
alongside S4 CSV.

Spark-first notes:

- ``spark.read.json`` IS the distributed JSONL reader (one JSON document
  per line; multiline=false is the default and the scalable path — line
  splitting keeps the format splittable, a multiline JSON array is a
  single unsplittable record).
- **Always pass an explicit schema at scale.** Schema inference is a
  full extra pass over the data before the real read; at 100 TB that
  doubles the scan. ``jsonl_source`` takes ``schema`` and only falls
  back to inference (with ``samplingRatio``) when the caller genuinely
  doesn't know the shape.
- Compression is handled by extension (``.gz``/``.zst``) transparently;
  gzip files are NOT splittable (one task per file) — for large corpora
  prefer many medium files or zstd with a seekable frame, and repartition
  right after read if the file count underfeeds the cluster.
- Parsing happens JVM-side (Jackson) inside the scan — no Python in the
  loop. Corrupt lines land in ``columnNameOfCorruptRecord`` when the
  schema includes it (PERMISSIVE mode), or drop/fail per ``mode``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def jsonl_source(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    mode: str = "PERMISSIVE",
    sampling_ratio: float = 1.0,
) -> DataFrame:
    """Read newline-delimited JSON.  ``schema`` may be a StructType or a
    DDL string ("doc_id LONG, text STRING"); omit it only for ad-hoc
    exploration — inference costs a full extra pass over the files."""
    reader = spark.read.option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("samplingRatio", str(sampling_ratio))
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    ignore_null_fields: bool = False,
) -> None:
    """Write one JSON object per line (Spark's native json sink — each
    task streams its partition, so the write is as parallel as the plan
    above it).  ``ignore_null_fields=False`` keeps explicit ``null``s so
    a round-trip with the same schema is lossless; flip it for compact
    output when consumers treat absent == null."""
    w = df.write.mode("overwrite").option(
        "ignoreNullFields", str(ignore_null_fields).lower()
    )
    if compression:
        w = w.option("compression", compression)
    w.json(path)
