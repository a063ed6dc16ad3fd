"""JDBC source/sink (SURVEY S1/U1-U5 remote-database form).

Reference: lwetl IS a JDBC client — `Jdbc(login)` opens a JayDeBeApi
connection (lwetl/jdbc.py:405-448), reads stream through
`fetchmany(array_size=1000)` batches (lwetl/jdbc.py:624-673), and writes
go through parameterized `executemany` batches committed every
`commit_nr` rows (lwetl/uploader.py:644-698,
lwetl/programs/db_copy/cmdline.py:77-82).

Spark form: `spark.read.jdbc` / `df.write.jdbc` with the reference's
batching defaults mapped onto Spark's option surface:

- `fetchsize=1000` — the reference's `array_size` read batch
  (lwetl/jdbc.py:626), same meaning: rows per driver round-trip;
- `batchsize=2000` — the reference's db-copy commit interval
  (db_copy/cmdline.py:77-82), Spark's rows-per-`executemany`.

Scale design (100 TB): a single JDBC connection is the reference's
whole world (1 connection, ≤4,000 rec/s, README.rst:31-34); Spark
turns the SAME option dict into a parallel scan when given a partition
spec — `partitionColumn` + `lowerBound`/`upperBound` +
`numPartitions` splits the table into range predicates executed by
independent executor connections.  Rules of thumb encoded here:

- reads: `numPartitions` ≈ min(executors × cores, what the database
  tolerates); stride skew is the database's problem to index, salting
  does not apply (the DB does the scan);
- predicate/column pushdown is on by default (`pushDownPredicate`) —
  filters written on the DataFrame run IN the database;
- writes: Spark opens one connection PER PARTITION — `repartition(n)`
  before `jdbc_sink` to bound connection count; `isolationLevel=NONE`
  for bulk loads where the DB allows it.

Live path exercised end-to-end in tests/test_jdbc.py against embedded
Apache Derby (ships on Spark's own classpath): round-trip write →
partitioned read → transform → write-back, predicate pushdown into the
database, raw-query dispatch, and append batching.  The suite skips
cleanly on classpaths without the Derby driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: reference read batch: array_size=1000 (lwetl/jdbc.py:626)
DEFAULT_FETCHSIZE = 1000
#: reference write batch: db-copy commit interval (db_copy/cmdline.py:77-82)
DEFAULT_BATCHSIZE = 2000


def jdbc_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = DEFAULT_FETCHSIZE,
    options: dict | None = None,
) -> dict[str, str]:
    """Build the Spark JDBC option dict.  Exactly one of `table`
    (→ `dbtable`, may be a `(subquery) alias`) or `query` must be given
    — mirroring the reference's table-name-or-SQL dispatch
    (lwetl/programs/sql_query/main.py:292-307).  A partition spec needs
    all four of column/lower/upper/num (Spark's contract)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    spec = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(v is not None for v in spec) and any(v is None for v in spec):
        raise ValueError(
            "partitioned read needs all of partition_column, lower_bound, "
            "upper_bound, num_partitions"
        )
    if query is not None and partition_column is not None:
        raise ValueError("partition_column requires table=, not query=")
    out: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if table is not None:
        out["dbtable"] = table
    else:
        out["query"] = query  # type: ignore[assignment]
    if partition_column is not None:
        out.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    out.update({k: str(v) for k, v in (options or {}).items()})
    return out


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    **kwargs,
) -> DataFrame:
    """Read a remote table/query over JDBC (S1 remote form).  With a
    partition spec the scan runs as `num_partitions` concurrent range
    queries; without one it is the reference's single-connection read
    (lwetl/jdbc.py:704-720) with `fetchsize` batching."""
    opts = jdbc_options(url, table, query, **kwargs)
    return spark.read.format("jdbc").options(**opts).load()


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    *,
    batchsize: int = DEFAULT_BATCHSIZE,
    isolation_level: str | None = None,
    num_connections: int | None = None,
    options: dict | None = None,
) -> None:
    """Write a DataFrame to a remote table over JDBC (U1/U3 remote
    form): parameterized inserts in `batchsize`-row `executemany`
    batches per partition — the Spark shape of MultiParameterUploader
    (lwetl/uploader.py:644-698).  `num_connections` repartitions first
    to bound concurrent connections (one per partition);
    `isolation_level=NONE` is the bulk-load fast path where supported."""
    if num_connections is not None:
        df = df.repartition(num_connections)
    opts = {"url": url, "dbtable": table, "batchsize": str(batchsize)}
    if isolation_level is not None:
        opts["isolationLevel"] = isolation_level
    opts.update({k: str(v) for k, v in (options or {}).items()})
    df.write.format("jdbc").options(**opts).mode(mode).save()
