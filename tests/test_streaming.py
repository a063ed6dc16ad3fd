"""Structured Streaming tests: the streaming tumbling-window pipeline must
agree with the batch operator on the same data (SURVEY §2.10)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Re-materialize events with a plain timestamp column (the raw file's
    TIMESTAMP(NANOS) needs load_table's conversion; streaming reads the
    directory directly so we stage a converted copy)."""
    from lwetl_spark.catalog import load_table

    p = str(tmp_path / "events_stream")
    load_table(spark, SF_SMOKE, "events").write.parquet(p)
    return p


def test_stream_matches_batch(spark, events_dir):
    from lwetl_spark.streaming.pipeline import stream_events_tumbling, stream_to_memory

    agg = stream_events_tumbling(spark, events_dir, width="5 minutes")
    got = stream_to_memory(agg, name="t_stream_out")
    stream_rows = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in got.collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .select(F.col("window.start").alias("ws"), "event_type", "n", "v")
    )
    batch_rows = {(r["ws"], r["event_type"]): (r["n"], r["v"]) for r in batch.collect()}
    assert stream_rows == batch_rows
    assert len(stream_rows) > 10


def test_multimodal_decode(spark):
    from pyspark.sql import functions as F2

    from lwetl_spark.catalog import load_table
    from lwetl_spark.streaming.multimodal import decode_binary_features

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id",
        F2.col("text").cast("binary").alias("payload"),
        F2.struct(F2.lit("text/fake-image").alias("mime"), F2.length("text").alias("n_bytes")).alias("meta"),
    )
    out = decode_binary_features(d)
    rows = out.collect()
    assert len(rows) == d.count()
    r = rows[0]
    assert r["mime"] == "text/fake-image"
    assert len(r["feat"]) == 4 and all(0 <= x <= 1 for x in r["feat"])
    assert len(r["digest"]) == 32
