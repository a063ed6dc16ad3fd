"""Structured Streaming surface (SURVEY §2.10).

The reference has no streaming; its closest analog is incremental commit
batching (U9).  Here the batch window operators
(lwetl_spark/operators/windows.py) get true streaming counterparts:
`readStream` over a parquet directory → watermarked windowed aggregation →
memory/foreachBatch sink.  The aggregate expressions are shared with the
batch path so batch and streaming results line up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_tumbling(
    spark: SparkSession,
    events_path: str,
    width: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window streaming aggregate over an events
    parquet directory.  `F.window` here (not epoch arithmetic) because
    streaming state management requires the native window column.
    """
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", width), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_to_memory(df: DataFrame, name: str = "stream_out") -> DataFrame:
    """Drive a streaming DataFrame to completion against the available
    input (processAllAvailable) and return the materialized result from
    the memory sink.  Complete mode → every window present once.
    """
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")
