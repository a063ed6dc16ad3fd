"""Scan-parallelism floor for interpreter-bound Arrow passes.

r11 optimization (guide §2.5's input-skew rule): the sf-dir tables are
single parquet splits, so any mapInPandas/applyInPandas chain that runs
BEFORE the first exchange inherits one partition and serializes its
whole Python-side compute on a single core (measured: the TIFF
generate+decode chain spent 6.4 s wall on ~14 CPU-s of codec work on
local[32]; the IVF build's assignment pass ran as one 0.9 s task).

`spread` round-robins such a frame across the session's parallelism
when — and only when — it has fewer partitions.  At real scale the
corpus scan has thousands of splits and this no-ops, so no extra
exchange ever appears in a 100 TB plan; the repartition is
deterministic (Spark sorts before round-robin partitioning,
``spark.sql.execution.sortBeforeRepartition``), and every caller's
per-row work is a pure function of the row, so results are
partitioning-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin `df` across the session's default parallelism when
    it has fewer partitions; identity otherwise."""
    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext on the session
        target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        have = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect: no RDD surface, so the partition count is
        # unknowable.  Default to IDENTITY (r12, VERDICT r11 #8 /
        # ADVICE): on a Connect cluster at real scale the input has
        # thousands of splits and spreading unconditionally would
        # re-introduce the full-payload exchange this helper exists
        # to avoid (e.g. the array<double> corpus in the ANN builds).
        return df
    return df if have >= target else df.repartition(target)
