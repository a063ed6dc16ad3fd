"""Partitioned parquet table sink — the on-disk layout that makes
100 TB scans affordable.

The reference writes rows into RDBMS tables and relies on indexes; the
Spark-native equivalent is hive-style directory partitioning: a query
filtering on the partition column never opens non-matching files
(partition pruning — `PartitionFilters` in the scan, pinned by
tests/test_plans.py::test_partition_pruning).

`write_partitioned` also bounds file counts: a repartition on the
partition columns before the write yields one file per partition value
per shuffle partition instead of `input_partitions × values` tiny files
(the classic small-files failure at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = 5_000_000,
) -> None:
    """Write a hive-partitioned parquet table.

    Pre-shuffling on the partition columns co-locates each partition
    value's rows, so every task writes whole files for few values —
    bounded file counts and full-size row groups.
    """
    writer = df.repartition(*[F.col(c) for c in partition_by]).write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_by).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a partitioned table (partition columns reconstructed
    from directory names)."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (hash-clustered) table registered in the session
    catalog as an external table at `path`.

    Bucketing pre-shuffles the table ON DISK: two tables bucketed on the
    same key with the same bucket count join with ZERO exchanges (pinned
    by tests/test_plans.py::test_bucketed_join_no_shuffle).  At 100 TB
    this converts every recurring fact-fact join on the bucket key from
    a full shuffle of both sides into a local zip of bucket files — the
    single biggest cost lever for repeated pipelines.
    """
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)
