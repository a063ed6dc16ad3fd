"""Named-source catalog.

The reference resolves named logins/aliases to JDBC connections
(lwetl/config_parser.py:53-60, 239-296) and introspects remote schemas with
per-dialect catalog SQL (lwetl/queries.py).  Here a "database" is a directory
of parquet tables; `register_tables` exposes them as temp views so both the
DataFrame API and ``spark.sql`` see the same catalog, and `schema_info`
produces the same (TABLE_NAME, COLUMN_NAME, DATA_TYPE, NULLABLE, ...)
introspection table the reference builds from information_schema
(SURVEY §1.3, lwetl/queries.py:102-154).
"""

from __future__ import annotations

import os

from py4j.protocol import Py4JError
from pyspark.errors import SparkNoSuchElementException
from pyspark.sql import DataFrame, SparkSession

#: tables the driver materializes in /root/testdata/sf*/
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table (SURVEY S1).  Pure `spark.read.parquet`:
    column pruning + predicate pushdown come free from the data source V2
    scan — the reference's 1000-row `fetchmany` batching
    (lwetl/jdbc.py:624-673) has no analog because the scan is columnar.

    The `events` table may carry TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects at schema conversion.  This loader NEVER mutates
    session conf for it (VERDICT r6 nit #1 — the same
    session-global-mutation class `_partwrite` purged from index
    maintenance): engine-built sessions (session.get_spark) opt into
    `nanosAsLong` at session BUILD time, and for foreign sessions (the
    correctness driver owns a vanilla one) a nanos file takes the
    read-scoped fallback below — an explicit long-typed schema from the
    parquet footer, then a microsecond-timestamp rebuild (floor),
    matching what nanosecond-capable engines report at Python datetime
    precision.  (A per-reader `.option("nanosAsLong", ...)` is accepted
    by the API but silently ignored by the schema converter, which
    consults only the SQL conf — verified against pyspark 4.1 — so the
    explicit-schema fallback is the only truly read-scoped form.)
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        df = spark.read.parquet(path)
    except Exception as e:
        # the fallback below is ONLY for the nanos schema-conversion
        # rejection; any other read failure (corrupt file, permissions)
        # must surface as itself, not as a confusing secondary error
        # from the pyarrow path (VERDICT r7 nit #1)
        if name != "events" or "NANOS" not in str(e):
            raise
        # nanos file on a session without the build-time conf: explicit
        # schema from the parquet footer with every timestamp read as
        # raw int64 — scoped to THIS read, no session mutation
        import pyarrow.parquet as pq

        _PA2SPARK = {
            "int32": T.IntegerType(),
            "int64": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "string": T.StringType(),
            "large_string": T.StringType(),
            "bool": T.BooleanType(),
            "date32[day]": T.DateType(),
            "binary": T.BinaryType(),
        }
        fields = []
        for f in pq.read_schema(path):
            t = str(f.type)
            dt = T.LongType() if t.startswith("timestamp") else _PA2SPARK.get(t)
            if dt is None:
                raise
            fields.append(T.StructField(f.name, dt))
        df = spark.read.schema(T.StructType(fields)).parquet(path)
    if name == "events":
        for f in df.schema.fields:
            if f.name == "ts" and isinstance(f.dataType, T.LongType):
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every table in `sf_dir` as a temp view named after it."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)  # not raw read: ns-timestamp handling
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def schema_info(spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
    """Schema-introspection source (SURVEY S8): one row per column, the
    engine-side equivalent of the reference's catalog queries
    (lwetl/queries.py:4-204).  PK/FK metadata does not exist in parquet;
    the db-copy planner accepts it as explicit engine metadata instead
    (lwetl_spark/plans/db_copy.py).
    """
    rows = []
    for tname, df in tables.items():
        for f in df.schema.fields:
            rows.append(
                (tname.upper(), f.name.upper(), f.dataType.simpleString(), bool(f.nullable))
            )
    return spark.createDataFrame(
        rows, "TABLE_NAME string, COLUMN_NAME string, DATA_TYPE string, NULLABLE boolean"
    )


def engine_info(spark: SparkSession) -> DataFrame:
    """Engine/driver metadata source (SURVEY S9): the reference's
    `JdbcInfo` dumps driver version and property info
    (lwetl/jdbc_info.py:7-99); here the engine IS Spark, so the analog is
    the session's version, master, and the confs that shape execution."""
    keys = (
        "spark.master",
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.session.timeZone",
        "spark.sql.execution.arrow.pyspark.enabled",
    )
    rows = [("spark.version", spark.version)]
    for k in keys:
        try:
            rows.append((k, str(spark.conf.get(k))))
        except (SparkNoSuchElementException, Py4JError):
            rows.append((k, None))  # conf unset on this session
    return spark.createDataFrame(rows, "PROPERTY string, VALUE string")
