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


def test_stream_dedup_exact(spark, tmp_path):
    """Streaming dedup: a doubled input collapses to the distinct key set
    (watermark-bounded state)."""
    from lwetl_spark.catalog import load_table
    from lwetl_spark.streaming.pipeline import stream_dedup_exact, stream_to_memory

    p = str(tmp_path / "events_dup")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.write.parquet(p)
    ev.write.mode("append").parquet(p)
    deduped = stream_dedup_exact(spark, p, keys=["user_id", "event_type", "ts"])
    got = stream_to_memory(deduped, name="t_dedup_out", mode="append")
    n_distinct = ev.select("user_id", "event_type", "ts").distinct().count()
    assert got.count() == n_distinct


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Stateful streaming sessionizer (applyInPandasWithState) must emit
    exactly the batch operator's sessions once the watermark passes
    everything (flushed by a far-future sentinel user)."""
    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.windows import sessionize
    from lwetl_spark.streaming.pipeline import stream_sessionize, stream_to_memory

    gap = 1800
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type", "ts", "value")
    bounds = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n")
    ).first()
    p = str(tmp_path / "events_chunks")
    # four time-ordered chunk files → four micro-batches, monotone watermark
    cuts = [
        bounds["lo"]
        + (bounds["hi"] - bounds["lo"]) * frac
        for frac in (0.25, 0.5, 0.75, 1.01)
    ]
    prev = None
    for cut in cuts:
        chunk = ev.filter(F.col("ts") <= F.lit(cut))
        if prev is not None:
            chunk = chunk.filter(F.col("ts") > F.lit(prev))
        chunk.coalesce(1).write.mode("append").parquet(p)
        prev = cut
    # sentinel: far-future event advances the watermark past every
    # real session_end + gap, firing all event-time timeouts
    sentinel_ts = bounds["hi"] + __import__("datetime").timedelta(seconds=20 * gap)
    spark.createDataFrame(
        [(-1, "sentinel", sentinel_ts, 0.0)], ev.schema
    ).coalesce(1).write.mode("append").parquet(p)

    sess = stream_sessionize(spark, p, gap_seconds=gap, max_files_per_trigger=1)
    got = stream_to_memory(sess, name="t_sess_out", mode="append")
    stream_rows = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in got.collect()
        if r["user_id"] != -1
    }
    batch_rows = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], round(r["sum_value"], 2))
        for r in sessionize(ev, gap_seconds=gap).collect()
    }
    assert set(stream_rows) == set(batch_rows)
    for k, (n, s) in stream_rows.items():
        bn, bs = batch_rows[k]
        assert n == bn, f"{k}: n_events {n} vs {bn}"
        assert abs(s - bs) < 0.02, f"{k}: sum {s} vs {bs}"
    assert len(stream_rows) > 20


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


def test_stream_enrich_matches_batch(spark, events_dir):
    """Stream-static broadcast join: per-batch enrichment must produce
    exactly the batch join's rows (stateless, append mode)."""
    from lwetl_spark.streaming.pipeline import stream_enrich, stream_to_memory

    dim = spark.createDataFrame(
        [(i, f"segment_{i % 3}") for i in range(50)], "user_id long, segment string"
    )
    enriched = stream_enrich(
        spark, events_dir, dim, on="user_id"
    ).select("event_id", "user_id", "segment")
    got = stream_to_memory(enriched, name="t_enrich_out", mode="append")
    batch = (
        spark.read.parquet(events_dir)
        .join(dim, "user_id", "left")
        .select("event_id", "user_id", "segment")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    assert got.filter(F.col("segment").isNotNull()).count() > 0


def test_sample_frames_shape(spark):
    """Frame sampler: fixed frame count, 32-hex digests, deterministic."""
    from lwetl_spark.streaming.multimodal import sample_frames

    d = spark.createDataFrame(
        [(1, b"0123456789abcdef"), (2, b"xy")], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in sample_frames(d, n_frames=4).collect()}
    assert rows[1]["n_frames"] == 4 and len(rows[1]["frame_digests"]) == 4
    assert all(len(h) == 32 for h in rows[1]["frame_digests"])
    # short payload: zero-width windows still yield 4 distinct digests
    assert len(set(rows[2]["frame_digests"])) == 4
    import hashlib

    assert rows[1]["frame_digests"][1] == hashlib.md5(b"1:4567").hexdigest()


def test_stream_upload_commits_batches(spark, events_dir, tmp_path):
    """foreachBatch → Uploader bulk insert (U9 analog): all streamed rows
    land in the target table under COMMIT policy."""
    from lwetl_spark.streaming.pipeline import stream_upload
    from lwetl_spark.sinks.uploader import Uploader, WritePolicy

    target = str(tmp_path / "upload_target")
    src = spark.read.parquet(events_dir).limit(0)
    src.write.parquet(target)  # empty table with the events schema
    up = Uploader(spark, target, policy=WritePolicy.COMMIT)
    q = stream_upload(spark, events_dir, up)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_src = spark.read.parquet(events_dir).count()
    assert spark.read.parquet(target).count() == n_src


def test_stream_multi_rollup_matches_batch(spark, events_dir):
    """Chained streaming aggregation (5m fine buckets re-aggregated to 1h
    coarse buckets via window_time): every EMITTED coarse bucket must
    equal the batch 1h rollup for that bucket, and buckets fully behind
    the final watermark must all have been emitted."""
    from lwetl_spark.streaming.pipeline import stream_multi_rollup, stream_to_memory

    roll = stream_multi_rollup(spark, events_dir, fine="5 minutes", coarse="1 hour")
    got = stream_to_memory(roll, name="t_multiroll_out", mode="append")
    stream_rows = {
        r["win_start"]: (r["n_events"], r["sum_value"]) for r in got.collect()
    }
    assert len(stream_rows) > 5  # append mode emitted finalized buckets
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .select(F.col("window.start").alias("ws"), "n", "v")
    )
    batch_rows = {r["ws"]: (r["n"], r["v"]) for r in batch.collect()}
    for ws, vals in stream_rows.items():
        assert batch_rows[ws] == vals, ws
    # nothing behind the watermark horizon is missing: only the trailing
    # hour(s) inside the 10-minute lateness window may be unemitted
    missing = set(batch_rows) - set(stream_rows)
    horizon = max(batch_rows)
    assert all(ws >= horizon or ws in stream_rows for ws in batch_rows), missing


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Watermarked stream-stream inner join must agree with the batch
    join under the same time-range condition."""
    from lwetl_spark.streaming.pipeline import stream_stream_join, stream_to_memory

    joined = stream_stream_join(
        spark, events_dir, left_type="click", right_type="purchase",
        watermark="10 minutes", max_gap="48 hours",
    )
    got = stream_to_memory(joined, name="t_ssj_out", mode="append")
    stream_rows = {tuple(r) for r in got.collect()}

    ev = spark.read.parquet(events_dir)
    l = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts"),
        F.col("value").alias("l_value"),
    )
    r = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    batch = l.join(
        r,
        F.expr("l_user = r_user AND r_ts >= l_ts AND r_ts <= l_ts + INTERVAL 48 hours"),
    ).select(F.col("l_user").alias("user_id"), "l_ts", "r_ts", "l_value", "r_value")
    batch_rows = {tuple(x) for x in batch.collect()}
    assert stream_rows == batch_rows
    assert len(stream_rows) > 20


def test_stream_cms_merges_to_batch_sketch(spark, tmp_path):
    """Count-min counters folded over micro-batches equal the batch
    sketch over all data — mergeability is the sketch's scale property."""
    from lwetl_spark.functions.text import tokens
    from lwetl_spark.operators.sketch import cms_build
    from lwetl_spark.streaming.pipeline import stream_cms

    p = str(tmp_path / "docs_stream")
    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").select("doc_id", "text")
    docs.repartition(5).write.parquet(p)  # several files -> several micro-batches

    q, counters = stream_cms(spark, p, depth=4, width=64)
    q.awaitTermination(120)

    tok = spark.read.parquet(p).select(F.explode(tokens("text")).alias("token"))
    batch = {
        (r["j"], r["pos"]): r["cnt"] for r in cms_build(tok, depth=4, width=64).collect()
    }
    assert counters == batch
    assert len(batch) > 50


def test_resize_images_constant_thumb(spark):
    """Resize plumbing: constant-size deterministic thumbnails regardless
    of source payload size; empty payloads yield zero bytes."""
    from pyspark.sql import functions as F2

    from lwetl_spark.catalog import load_table
    from lwetl_spark.streaming.multimodal import resize_images

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F2.col("text").cast("binary").alias("payload")
    )
    rows = resize_images(d, width=8, height=4).collect()
    assert len(rows) == d.count()
    assert all(len(r["thumb"]) == 32 and r["width"] == 8 and r["height"] == 4 for r in rows)
    again = {r["doc_id"]: bytes(r["thumb"]) for r in resize_images(d, 8, 4).collect()}
    assert all(bytes(r["thumb"]) == again[r["doc_id"]] for r in rows)  # deterministic

    empty = spark.createDataFrame([(1, b"")], "doc_id long, payload binary")
    assert bytes(resize_images(empty, 4, 4).first()["thumb"]) == bytes(16)


def test_repartition_by_payload_bytes(spark):
    from pyspark.sql import functions as F2

    from lwetl_spark.streaming.multimodal import repartition_by_payload_bytes

    big = spark.range(100).select(
        "id", F2.repeat(F2.lit("x"), 10_000).cast("binary").alias("payload")
    )
    # 1 MB total, 100 KB target -> ~11 partitions; row data unchanged
    out = repartition_by_payload_bytes(big, target_bytes=100_000)
    assert out.rdd.getNumPartitions() == 11
    assert out.count() == 100
    tiny = repartition_by_payload_bytes(big.limit(1), target_bytes=100 << 20)
    assert tiny.rdd.getNumPartitions() == 1


def test_stream_dedup_against_corpus_admits_each_fp_once(spark, tmp_path):
    """Incremental ingestion dedup: after streaming a corpus with
    cross-batch duplicates, the admitted state holds EXACTLY one row per
    distinct fingerprint, and every admitted (fp, doc_id) pair is a real
    (fingerprint, doc) pair from the source."""
    from pyspark.sql import functions as F2

    from lwetl_spark.streaming.pipeline import stream_dedup_against_corpus

    docs_dir = str(tmp_path / "docs")
    state_dir = str(tmp_path / "state")
    # 3 files -> multiple micro-batches (maxFilesPerTrigger=1); text 'b'
    # repeats within AND across batches
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).write.parquet(docs_dir)
    spark.createDataFrame(
        [(3, "b"), (4, "c")], "doc_id long, text string"
    ).write.mode("append").parquet(docs_dir)
    spark.createDataFrame(
        [(5, "c"), (6, "d"), (7, "d")], "doc_id long, text string"
    ).write.mode("append").parquet(docs_dir)

    q = stream_dedup_against_corpus(
        spark, docs_dir, state_dir, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.read.parquet(state_dir).collect()
    src = spark.read.parquet(docs_dir).select(
        "doc_id", F2.md5(F2.lower(F2.trim("text"))).alias("fp")
    )
    valid_pairs = {(r["fp"], r["doc_id"]) for r in src.collect()}
    distinct_fps = {fp for fp, _ in valid_pairs}

    assert len(state) == len(distinct_fps)  # one admission per fingerprint
    assert {r["fp"] for r in state} == distinct_fps
    assert {(r["fp"], r["doc_id"]) for r in state} <= valid_pairs

    # replaying the same corpus admits nothing new
    q2 = stream_dedup_against_corpus(
        spark, docs_dir, state_dir, max_files_per_trigger=2
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(state_dir).count() == len(distinct_fps)


def test_stream_validate_totals_match_batch(spark, tmp_path):
    """Per-batch contract censuses fold to the batch validate() over all
    data — the gate's state is one counter pair per rule."""
    from lwetl_spark.operators.validate import validate
    from lwetl_spark.streaming.pipeline import stream_validate

    p = str(tmp_path / "orders_stream")
    orders = spark.read.parquet(SF_SMOKE + "/orders.parquet")
    orders.repartition(5).write.parquet(p)

    rules = [
        {"rule": "custkey_not_null", "kind": "not_null", "col": "o_custkey"},
        {"rule": "price_pos", "kind": "range", "col": "o_totalprice", "lo": 0.0},
        {
            "rule": "status_ok",
            "kind": "accepted_values",
            "col": "o_orderstatus",
            "values": ["F", "O", "P"],
        },
    ]
    q, totals = stream_validate(spark, p, rules)
    q.awaitTermination(120)

    batch = {
        r["rule"]: (r["n_checked"], r["n_violations"])
        for r in validate(spark.read.parquet(p), rules).collect()
    }
    assert {
        k: (v["n_checked"], v["n_violations"]) for k, v in totals.items()
    } == batch
    assert all(v[0] > 0 for v in batch.values())


def test_stream_validate_rejects_stateful_rules(spark, tmp_path):
    import pytest as _pytest

    from lwetl_spark.streaming.pipeline import stream_validate

    p = str(tmp_path / "x")
    spark.range(3).write.parquet(p)
    with _pytest.raises(ValueError):
        stream_validate(spark, p, [{"rule": "u", "kind": "unique", "cols": ["id"]}])


def test_stream_hll_distinct_unions_across_batches(spark, tmp_path):
    """Per-batch sketches union to the GLOBAL distinct count — keys
    repeated across micro-batches count once (a running sum of exact
    per-batch counts would overcount)."""
    from lwetl_spark.streaming.pipeline import (
        hll_store_estimate,
        stream_hll_distinct,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "sketches")
    df = spark.createDataFrame(
        [(i, f"k{i % 400}") for i in range(4000)], "i long, key string"
    )
    df.repartition(6).write.parquet(src)  # several files -> several batches

    q = stream_hll_distinct(spark, src, state, key_col="key")
    q.awaitTermination(120)

    est = hll_store_estimate(spark, state)
    assert abs(est - 400) <= 20
    n_rows = spark.read.parquet(state).count()
    assert 1 <= n_rows <= 6  # one sketch row per micro-batch


def test_stream_pit_enrich_matches_batch_pit_join(spark, tmp_path):
    """Micro-batch PIT enrichment over a persisted SCD2 dimension equals
    the batch point-in-time join over all facts."""
    from lwetl_spark.operators.windows import scd2_from_events

    from lwetl_spark.streaming.pipeline import stream_pit_enrich

    ev = spark.read.parquet(SF_SMOKE + "/events.parquet")
    from lwetl_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    dim = scd2_from_events(ev).select(
        "user_id",
        F.col("event_type").alias("regime"),
        "valid_from",
        F.coalesce(
            "valid_to", F.lit("2262-01-01 00:00:00").cast("timestamp")
        ).alias("valid_to"),
    )
    dim_path = str(tmp_path / "dim")
    dim.write.parquet(dim_path)
    src = str(tmp_path / "facts")
    ev.repartition(5).write.parquet(src)
    out = str(tmp_path / "enriched")

    q = stream_pit_enrich(spark, src, dim_path, out)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    e, d = ev.alias("e"), spark.read.parquet(dim_path).alias("d")
    expect = e.join(
        d,
        (F.col("e.user_id") == F.col("d.user_id"))
        & (F.col("e.ts") >= F.col("d.valid_from"))
        & (F.col("e.ts") < F.col("d.valid_to")),
        "left",
    ).select("e.*", F.col("d.regime").alias("regime"))
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, expect.collect()))
    assert a == b and len(a) >= ev.count()


def test_stream_quarantine_routes_and_conserves(spark, tmp_path):
    """Streamed split: clean + dead-letter reconstruct the source; DLQ
    rows carry their violated-rule tags."""
    from lwetl_spark.streaming.pipeline import stream_quarantine

    src = str(tmp_path / "src")
    rows = [(i, float(i - 5)) for i in range(20)]  # 0..4 violate price >= 0
    spark.createDataFrame(rows, "id long, price double").repartition(4).write.parquet(src)

    clean_p, dlq_p = str(tmp_path / "clean"), str(tmp_path / "dlq")
    q = stream_quarantine(
        spark, src,
        [{"rule": "price_pos", "kind": "range", "col": "price", "lo": 0.0}],
        clean_p, dlq_p,
    )
    q.awaitTermination(120)

    clean = spark.read.parquet(clean_p)
    dlq = spark.read.parquet(dlq_p)
    assert clean.count() == 15 and dlq.count() == 5
    assert set(clean.columns) == {"id", "price"}
    assert all(r["violated_rules"] == ["price_pos"] for r in dlq.collect())
    got = sorted(
        [(r["id"], r["price"]) for r in clean.collect()]
        + [(r["id"], r["price"]) for r in dlq.collect()]
    )
    assert got == sorted(rows)


def test_stream_markov_totals_match_batch(spark, tmp_path):
    """Cross-batch transition stitching: events split into time-ordered
    files (one per micro-batch) must yield EXACTLY the batch
    x_markov_chain counts over the union — a per-batch lag alone would
    lose every boundary transition."""
    import datetime as dt

    from pyspark.sql import functions as F2
    from pyspark.sql.window import Window as W

    from lwetl_spark.streaming.pipeline import stream_markov

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 users x 9 events interleaved; types cycle differently per user
    for step in range(9):
        for u, cycle in ((1, ["a", "b", "c"]), (2, ["b", "b", "a"]), (3, ["c", "a", "a"])):
            rows.append((eid, t0 + dt.timedelta(minutes=step), u, cycle[step % 3]))
            eid += 1
    src = str(tmp_path / "events")
    state = str(tmp_path / "state")
    # time-ordered files: batch k holds steps 3k..3k+2 (appended in order)
    for k in range(3):
        chunk = [r for r in rows if 3 * k * 3 <= r[0] < 3 * (k + 1) * 3]
        spark.createDataFrame(
            chunk, "event_id long, ts timestamp, user_id long, event_type string"
        ).coalesce(1).write.mode("append").parquet(src)  # ONE file per batch

    q, totals = stream_markov(spark, src, state, max_files_per_trigger=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    expected = {
        (r["prev"], r["cur"]): r["n"]
        for r in batch.withColumn("prev", F2.lag("event_type").over(w))
        .filter(F2.col("prev").isNotNull())
        .groupBy("prev", F2.col("event_type").alias("cur"))
        .agg(F2.count("*").alias("n"))
        .collect()
    }
    assert totals == expected
    # state holds exactly one row per user, carrying their LAST event type
    st = {r["user_id"]: r["last_type"] for r in spark.read.parquet(state).collect()}
    assert st == {1: ["a", "b", "c"][8 % 3], 2: ["b", "b", "a"][8 % 3], 3: ["c", "a", "a"][8 % 3]}


def test_stream_ab_test_matches_batch(spark, tmp_path, events_dir):
    """Per-user conversion state across micro-batches: after draining
    the stream, the z² statistic must equal the batch computation over
    the full events table — a user whose qualifying purchase lands in a
    later batch than their first events would otherwise be undercounted."""
    from pyspark.sql import functions as F2

    from lwetl_spark.operators.grouped import two_proportion_z2
    from lwetl_spark.streaming.pipeline import stream_ab_test

    state = str(tmp_path / "ab_state")
    q, stats = stream_ab_test(spark, events_dir, state, max_files_per_trigger=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = stats().collect()[0]

    batch_u = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F2.max(
                ((F2.col("event_type") == "purchase") & (F2.col("value") > 90)).cast(
                    "int"
                )
            ).alias("conv")
        )
        .select((F2.col("user_id") % 2).cast("long").alias("variant"), "conv")
    )
    want = two_proportion_z2(batch_u).collect()[0]
    assert tuple(got) == tuple(want)


def test_stream_ingest_increment_continuous_campaign(spark, tmp_path):
    """Streaming daily-crawl campaign: files arriving as micro-batches
    run delta-mode increments — duplicate content across batches never
    admits twice, the manifest accumulates every seen id, and the final
    index is row-identical to a from-scratch build over the admitted
    docs (the same equivalence contract as the batch campaign)."""
    from pyspark.sql import functions as F2

    from lwetl_spark.operators.retrieval import build_text_index, query_text_index
    from lwetl_spark.streaming.pipeline import stream_ingest_increment

    docs_dir = str(tmp_path / "docs")
    man, st, idx = (str(tmp_path / p) for p in ("manifest", "state", "index"))

    texts = {
        1: "spark shuffles hash partitions across the cluster",
        2: "sort merge join spills gracefully to local disk",
        3: "broadcast joins ship the small dimension everywhere",
        4: "window functions rank rows inside each partition",
    }
    spark.createDataFrame(
        [(1, texts[1]), (2, texts[2])], "doc_id long, text string"
    ).coalesce(1).write.parquet(docs_dir)
    # batch 2: one new doc + one cross-batch duplicate of doc 1
    spark.createDataFrame(
        [(3, texts[3]), (10, texts[1])], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    # batch 3: new doc + in-batch duplicate pair (min id 4 wins)
    spark.createDataFrame(
        [(4, texts[4]), (5, texts[4])], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(docs_dir)

    q = stream_ingest_increment(
        spark, docs_dir, man, st, idx, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {r["doc_id"] for r in spark.read.parquet(st).collect()}
    assert admitted == {1, 2, 3, 4}
    seen = {r["doc_id"] for r in spark.read.parquet(man).collect()}
    assert seen == {1, 2, 3, 4, 5, 10}

    full = str(tmp_path / "full")
    build_text_index(
        spark.createDataFrame(
            [(i, texts[i]) for i in (1, 2, 3, 4)], "doc_id long, text string"
        ),
        full,
    )
    for part in ("postings", "df", "doclen", "stats"):
        got = sorted(
            map(tuple, spark.read.parquet(f"{idx}/{part}").drop("bucket").collect())
        )
        want = sorted(
            map(tuple, spark.read.parquet(f"{full}/{part}").drop("bucket").collect())
        )
        assert got == want, f"{part} diverged from rebuild"
    qd = spark.createDataFrame(
        [(1, "shuffle"), (2, "rank")], "query_id int, term string"
    )
    gi = sorted(map(tuple, query_text_index(spark, idx, qd, k=10).collect()))
    gf = sorted(map(tuple, query_text_index(spark, full, qd, k=10).collect()))
    assert gi == gf and gi


def test_stream_event_pattern_totals_match_batch(spark, tmp_path):
    """Cross-batch triple stitching: view→click→purchase triples that
    straddle micro-batch boundaries with 1 OR 2 events in the previous
    batch must still be counted exactly once — totals equal the batch
    x_event_pattern logic over the union of all batches."""
    import datetime as dt

    from pyspark.sql import functions as F2
    from pyspark.sql.window import Window as W

    from lwetl_spark.streaming.pipeline import stream_event_pattern

    t0 = dt.datetime(2024, 1, 1)
    # user 1: triple fully inside batch 0, then a boundary triple with
    #   view+click in batch 1 and purchase in batch 2 (2 events in state)
    # user 2: boundary triple with view at the end of batch 0 (1 event in
    #   state), then a NON-match (intervening error) across batch 1/2
    # user 3: a too-slow triple (purchase 8 days later) — never counted
    rows = [
        # (event_id, minutes_offset_or_days, user, type, batch)
        (0, 0, 1, "view", 0), (1, 1, 1, "click", 0), (2, 2, 1, "purchase", 0),
        (3, 3, 2, "signup", 0), (4, 4, 2, "view", 0),
        (5, 10, 2, "click", 1), (6, 11, 1, "view", 1), (7, 12, 1, "click", 1),
        (8, 13, 2, "purchase", 1),
        (9, 20, 1, "purchase", 2), (10, 21, 2, "view", 2), (11, 22, 2, "error", 2),
        (12, 23, 2, "click", 2), (13, 24, 2, "purchase", 2),
    ]
    slow = [
        (14, 0, 3, "view", 0), (15, 1, 3, "click", 0),
    ]
    slow_purchase = [(16, 60 * 24 * 8, 3, "purchase", 2)]  # 8 days later
    # user 4: view+click in batch 0, IDLE through batch 1, purchase in
    # batch 2 — the state tail must survive an idle batch un-duplicated
    # (a duplicated tail reads v,v,c,c,p: no contiguous triple)
    idle_straddle = [
        (17, 0, 4, "view", 0), (18, 1, 4, "click", 0),
        (19, 30, 4, "purchase", 2),
    ]
    all_rows = rows + slow + slow_purchase + idle_straddle
    src = str(tmp_path / "events")
    state = str(tmp_path / "state")
    for k in range(3):
        chunk = [
            (eid, t0 + dt.timedelta(minutes=m), u, typ)
            for (eid, m, u, typ, b) in all_rows
            if b == k
        ]
        spark.createDataFrame(
            chunk, "event_id long, ts timestamp, user_id long, event_type string"
        ).coalesce(1).write.mode("append").parquet(src)

    q, totals = stream_event_pattern(spark, src, state, max_files_per_trigger=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch = spark.createDataFrame(
        [(eid, t0 + dt.timedelta(minutes=m), u, typ) for (eid, m, u, typ, _b) in all_rows],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = batch.select(
        "user_id",
        "ts",
        "event_type",
        F2.lead("event_type", 1).over(w).alias("e2"),
        F2.lead("event_type", 2).over(w).alias("e3"),
        F2.lead("ts", 2).over(w).alias("t3"),
    )
    expected = {
        r["user_id"]: r["n"]
        for r in s.filter(
            (F2.col("event_type") == "view")
            & (F2.col("e2") == "click")
            & (F2.col("e3") == "purchase")
            & (F2.col("t3") <= F2.col("ts") + F2.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F2.count("*").alias("n"))
        .collect()
    }
    assert expected == {1: 2, 2: 1, 4: 1}  # the scenario is what we think
    assert totals == expected
    # state is bounded: at most 2 rows per user, never event payloads
    st = spark.read.parquet(state)
    assert st.groupBy("user_id").count().agg(F2.max("count")).collect()[0][0] <= 2
    assert set(st.columns) == {"user_id", "event_id", "ts", "event_type"}


def test_stream_ingest_increment_dual_index(spark, tmp_path):
    """Streaming dual-index campaign: micro-batches carrying an
    embedding column maintain the IVF vector index alongside the text
    index — the first admitting batch trains/freezes the quantizer,
    later batches append, duplicate content enters NEITHER index, and
    the final vector index probe-equals a from-scratch build over the
    admitted docs with train_df= the first batch (the batch-campaign
    equivalence contract, continuously)."""
    import hashlib

    from lwetl_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )
    from lwetl_spark.streaming.pipeline import stream_ingest_increment

    def e(text):
        h = hashlib.md5(text.encode()).digest()
        return [b / 255.0 + 0.05 for b in h[:6]]

    texts = {
        1: "spark shuffles hash partitions across the cluster",
        2: "sort merge join spills gracefully to local disk",
        3: "broadcast joins ship the small dimension everywhere",
        4: "window functions rank rows inside each partition",
    }
    schema = "doc_id long, text string, embedding array<double>"

    def rows(ids_texts):
        return [(i, t, e(t)) for i, t in ids_texts]

    docs_dir = str(tmp_path / "docs")
    man, st, idx, vidx = (
        str(tmp_path / p) for p in ("manifest", "state", "index", "vindex")
    )
    spark.createDataFrame(
        rows([(1, texts[1]), (2, texts[2])]), schema
    ).coalesce(1).write.parquet(docs_dir)
    # batch 2: one new doc + a cross-batch duplicate of doc 1's content
    spark.createDataFrame(
        rows([(3, texts[3]), (10, texts[1])]), schema
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    spark.createDataFrame(
        rows([(4, texts[4])]), schema
    ).coalesce(1).write.mode("append").parquet(docs_dir)

    q = stream_ingest_increment(
        spark, docs_dir, man, st, idx,
        max_files_per_trigger=1, vector_index_path=vidx,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {r["doc_id"] for r in spark.read.parquet(st).collect()}
    assert admitted == {1, 2, 3, 4}
    # the duplicate-content id never entered the vector index either
    cells = spark.read.parquet(f"{vidx}/cells")
    assert {r["id"] for r in cells.select("id").collect()} == {1, 2, 3, 4}

    def emb_df(ids):
        return spark.createDataFrame(
            [(i, e(texts[i])) for i in ids], "doc_id long, embedding array<double>"
        )

    ref = str(tmp_path / "ref")
    build_ivf_index(
        emb_df([1, 2, 3, 4]), ref,
        vec_col="embedding", id_col="doc_id", num_centroids=16,
        train_df=emb_df([1, 2]),
    )
    probes = emb_df([1, 2, 3, 4])
    got = sorted(map(tuple, query_ivf_index(
        spark, vidx, probes, k=3, vec_col="embedding", id_col="doc_id"
    ).collect()))
    want = sorted(map(tuple, query_ivf_index(
        spark, ref, probes, k=3, vec_col="embedding", id_col="doc_id"
    ).collect()))
    assert got == want and got


def test_stream_ingest_cdc_upserts_and_tombstones(spark, tmp_path):
    """CDC-stream campaign: micro-batches carrying upsert + delete ops
    drive delta-mode increments with the batch's deletes as tombstones.
    Deletion wins over a same-batch upsert of the same id; a later
    re-crawl readmits; the final text index equals a rebuild over the
    live set and the vector index probe-equals rebuild-with-train_df."""
    import hashlib

    from lwetl_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )
    from lwetl_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )
    from lwetl_spark.streaming.pipeline import stream_ingest_cdc

    def e(text):
        h = hashlib.md5(text.encode()).digest()
        return [b / 255.0 + 0.05 for b in h[:6]]

    texts = {
        1: "spark shuffles hash partitions across the cluster",
        2: "sort merge join spills gracefully to local disk",
        3: "broadcast joins ship the small dimension everywhere",
    }
    schema = "doc_id long, text string, embedding array<double>, op string"

    def batch(rows):
        return spark.createDataFrame(
            [(i, t, e(t or ""), op) for i, t, op in rows], schema
        )

    changes = str(tmp_path / "changes")
    man, st, idx, vidx = (
        str(tmp_path / p) for p in ("m", "s", "x", "v")
    )
    # batch 1: two upserts
    batch([(1, texts[1], "U"), (2, texts[2], "U")]).coalesce(1).write.parquet(changes)
    # batch 2: upsert 3, DELETE 2, and a same-batch re-upsert of 2
    # (deletion must win)
    batch([(3, texts[3], "U"), (2, texts[2], "D"),
           (2, texts[2], "U")]).coalesce(1).write.mode("append").parquet(changes)
    # batch 3: id 2's content re-crawls -> readmits fresh
    batch([(2, texts[2], "U")]).coalesce(1).write.mode("append").parquet(changes)

    q = stream_ingest_cdc(
        spark, changes, man, st, idx,
        max_files_per_trigger=1, vector_index_path=vidx,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert {r["doc_id"] for r in spark.read.parquet(st).collect()} == {1, 2, 3}

    live = spark.createDataFrame(
        [(i, texts[i]) for i in (1, 2, 3)], "doc_id long, text string"
    )
    full = str(tmp_path / "full")
    build_text_index(live, full)
    probe_q = spark.createDataFrame(
        [(1, "shuffle"), (2, "broadcast")], "query_id int, term string"
    )
    gi = sorted(map(tuple, query_text_index(spark, idx, probe_q, k=10).collect()))
    gf = sorted(map(tuple, query_text_index(spark, full, probe_q, k=10).collect()))
    assert gi == gf and gi

    def emb_df(ids):
        return spark.createDataFrame(
            [(i, e(texts[i])) for i in ids],
            "doc_id long, embedding array<double>",
        )

    ref = str(tmp_path / "ref")
    build_ivf_index(
        emb_df([1, 2, 3]), ref, vec_col="embedding", id_col="doc_id",
        num_centroids=16, train_df=emb_df([1, 2]),
    )
    probes = emb_df([1, 2, 3])
    got = sorted(map(tuple, query_ivf_index(
        spark, vidx, probes, k=3, vec_col="embedding", id_col="doc_id"
    ).collect()))
    want = sorted(map(tuple, query_ivf_index(
        spark, ref, probes, k=3, vec_col="embedding", id_col="doc_id"
    ).collect()))
    assert got == want and got


def test_stream_ingest_cdc_last_write_wins(spark, tmp_path):
    """order_col: several changes for one id in ONE micro-batch reduce
    last-write-wins with the delete signal preserved — upsert-then-
    delete vanishes, delete-then-upsert admits."""
    from lwetl_spark.streaming.pipeline import stream_ingest_cdc

    rows = [
        (5, "doc five first draft", 1, "U"),
        (5, "doc five first draft", 2, "D"),   # last change: delete
        (6, "doc six arrives late", 1, "D"),
        (6, "doc six arrives late", 2, "U"),   # last change: upsert
        (7, "doc seven only once", 1, "U"),
    ]
    changes = str(tmp_path / "changes")
    spark.createDataFrame(
        rows, "doc_id long, text string, seq long, op string"
    ).coalesce(1).write.parquet(changes)
    man, st, idx = (str(tmp_path / p) for p in ("m", "s", "x"))

    q = stream_ingest_cdc(
        spark, changes, man, st, idx, order_col="seq",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {r["doc_id"] for r in spark.read.parquet(st).collect()} == {6, 7}
    assert spark.read.parquet(f"{idx}/doclen").count() == 2


def test_stream_media_meta_matches_batch(spark, tmp_path):
    """Streaming container parsing == batch media_meta row-for-row
    (same Arrow closure), including the corrupt-payload leg."""
    from lwetl_spark.operators.media import media_meta, synth_media_demo
    from lwetl_spark.streaming.pipeline import stream_media_meta, stream_to_memory

    ids = spark.range(120).select(F.col("id").alias("doc_id"))
    media = synth_media_demo(ids).localCheckpoint(eager=True)
    p = str(tmp_path / "media")
    media.coalesce(2).write.parquet(p)

    got = stream_to_memory(
        stream_media_meta(spark, p, max_files_per_trigger=1),
        name="t_media_meta_out", mode="append",
    )
    want = media_meta(media)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.filter("valid = false").count() == 24  # the %5==4 junk leg
    assert got.filter("fmt = 'mp4'").count() == 24    # video routes too (r8)


def test_stream_mp4_frames_matches_batch(spark, tmp_path):
    """Streaming frame extraction == batch mp4_frame_index row-for-row
    (same Arrow closure), including the no-sample-table legs that
    contribute zero rows."""
    from lwetl_spark.operators.media import mp4_frame_index, synth_media_demo
    from lwetl_spark.streaming.pipeline import (
        stream_mp4_frames,
        stream_to_memory,
    )

    ids = spark.range(60).select(F.col("id").alias("doc_id"))
    media = synth_media_demo(ids).localCheckpoint(eager=True)
    p = str(tmp_path / "vid")
    media.coalesce(2).write.parquet(p)

    got = stream_to_memory(
        stream_mp4_frames(spark, p, max_files_per_trigger=1),
        name="t_mp4_frames_out", mode="append",
    )
    want = mp4_frame_index(media)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # only the %5==3 docs have video sample tables: 12 of 60 ids
    assert got.select("doc_id").distinct().count() == 12


def test_stream_state_corruption_surfaces_not_restarts(spark, tmp_path):
    """VERDICT r8 #7: a genuinely corrupt state parquet must FAIL the
    stream with the real error, not silently restart dedup state as if
    it were the first batch (the old broad-except swallowed it and
    re-admitted every duplicate)."""
    import pyspark.sql.utils  # noqa: F401

    from lwetl_spark.streaming.pipeline import stream_dedup_against_corpus

    docs_dir = str(tmp_path / "docs")
    state_dir = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).write.parquet(docs_dir)
    # plant a corrupt state file where the parquet reader will find it
    import os

    os.makedirs(state_dir, exist_ok=True)
    with open(os.path.join(state_dir, "part-00000.parquet"), "wb") as fh:
        fh.write(b"this is not a parquet file")

    q = stream_dedup_against_corpus(spark, docs_dir, state_dir)
    try:
        import pytest

        with pytest.raises(Exception) as exc:
            q.processAllAvailable()
        # the surfaced error is the parquet reader's, not a fresh-state
        # silent restart
        msg = str(exc.value).lower()
        assert "parquet" in msg or "footer" in msg or "magic" in msg
    finally:
        q.stop()


def test_stream_mkv_frames_matches_batch(spark, tmp_path):
    """Streaming Matroska frame extraction == batch mkv_frame_index
    row-for-row (same Arrow closure); payloads without SimpleBlocks
    contribute no rows."""
    from lwetl_spark.operators.media import (
        mkv_frame_index,
        synth_mkv_frames_demo,
    )
    from lwetl_spark.streaming.pipeline import (
        stream_mkv_frames,
        stream_to_memory,
    )

    ids = spark.range(40).select(F.col("id").alias("doc_id"))
    media = synth_mkv_frames_demo(ids).localCheckpoint(eager=True)
    p = str(tmp_path / "mkv")
    media.coalesce(2).write.parquet(p)

    got = stream_to_memory(
        stream_mkv_frames(spark, p, max_files_per_trigger=1),
        name="t_mkv_frames_out", mode="append",
    )
    want = mkv_frame_index(media)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.select("doc_id").distinct().count() == 40


def test_stream_image_dhash_matches_batch(spark, tmp_path):
    """Streaming perceptual fingerprinting == batch image_dhash
    row-for-row, including the corrupt leg (ok=false, no failed
    micro-batch)."""
    from lwetl_spark.operators.media import image_dhash, synth_image_dup_demo
    from lwetl_spark.streaming.pipeline import (
        stream_image_dhash,
        stream_to_memory,
    )

    ids = spark.range(70).select(F.col("id").alias("doc_id"))
    media = synth_image_dup_demo(ids).localCheckpoint(eager=True)
    p = str(tmp_path / "img")
    media.coalesce(2).write.parquet(p)

    got = stream_to_memory(
        stream_image_dhash(spark, p, max_files_per_trigger=1),
        name="t_img_dhash_out", mode="append",
    )
    want = image_dhash(media)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.filter("ok = false").count() == 4  # ids 0, 23, 46, 69


def test_stream_paragraph_dedup_cross_batch_first_occurrence(spark, tmp_path):
    """stream_paragraph_dedup: a paragraph admitted in an earlier
    micro-batch never survives a later one; in-batch first-occurrence
    matches the batch operator; state grows only by novel
    fingerprints."""
    from lwetl_spark.streaming.pipeline import stream_paragraph_dedup

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, "alpha beta\ncommon header\ngamma")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(docs_dir)
    spark.createDataFrame(
        [(2, "common header\ndelta"), (3, "delta\nepsilon")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(docs_dir)

    q = stream_paragraph_dedup(
        spark, docs_dir, out_dir, state_dir, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert out[1]["text"] == "alpha beta\ncommon header\ngamma"
    # doc 2 loses 'common header' to batch 1's doc 1
    assert out[2]["text"] == "delta" and out[2]["n_paras"] == 2
    # docs 2 and 3 were one batch: 'delta' kept once (min doc_id=2)
    assert out[3]["text"] == "epsilon" and out[3]["n_kept"] == 1
    # 5 novel paragraphs total: alpha beta, common header, gamma,
    # delta, epsilon
    assert spark.read.parquet(state_dir).count() == 5


def test_stream_pdf_text_and_zip_members_match_batch(spark, tmp_path):
    """Streaming PDF extraction and ZIP cataloguing == their batch
    operators row-for-row (same Arrow closures), including corrupt
    legs."""
    from lwetl_spark.operators.media import (
        pdf_text,
        synth_pdf_demo,
        synth_zip_demo,
        zip_member_contents,
    )
    from lwetl_spark.streaming.pipeline import (
        stream_pdf_text,
        stream_to_memory,
        stream_zip_members,
    )

    ids = spark.range(80).select(F.col("id").alias("doc_id"))
    pdfs = synth_pdf_demo(ids).localCheckpoint(eager=True)
    p1 = str(tmp_path / "pdfs")
    pdfs.coalesce(2).write.parquet(p1)
    got = stream_to_memory(
        stream_pdf_text(spark, p1, max_files_per_trigger=1),
        name="t_pdf_out", mode="append",
    )
    want = pdf_text(pdfs)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
    assert got.filter("valid = false").count() == 4  # ids 0,21,42,63

    zips = synth_zip_demo(ids).localCheckpoint(eager=True)
    p2 = str(tmp_path / "zips")
    zips.coalesce(2).write.parquet(p2)
    got2 = stream_to_memory(
        stream_zip_members(spark, p2, max_files_per_trigger=1),
        name="t_zip_out", mode="append",
    )
    want2 = zip_member_contents(zips)
    assert sorted(map(tuple, got2.collect())) \
        == sorted(map(tuple, want2.collect()))


def test_stream_media_apply_generic_twin(spark, tmp_path):
    """The generic media twin == batch for two representative r9
    operators (GIF-LZW pixel decode and the FLAC census), corrupt
    legs included."""
    from lwetl_spark.operators.media import (
        flac_meta,
        gif_pixel_stats,
        synth_flac_demo,
        synth_gif_px_demo,
    )
    from lwetl_spark.streaming.pipeline import (
        stream_media_apply,
        stream_to_memory,
    )

    ids = spark.range(70).select(F.col("id").alias("doc_id"))
    for tag, fixture, op in (
        ("gifpx", synth_gif_px_demo, gif_pixel_stats),
        ("flac", synth_flac_demo, flac_meta),
    ):
        data = fixture(ids).localCheckpoint(eager=True)
        p = str(tmp_path / tag)
        data.coalesce(2).write.parquet(p)
        got = stream_to_memory(
            stream_media_apply(spark, p, op, max_files_per_trigger=1),
            name=f"t_generic_{tag}", mode="append",
        )
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, op(data).collect()))


def test_stream_dhash_neardup_admits_one_per_cluster(spark, tmp_path):
    """Streaming perceptual admission (r10): star-shaped near-dup
    clusters (N variants of one original, the crawl case) admit
    exactly their smallest id across batches; replay admits nothing;
    the state is the dhash_bands layout (4 rows per admitted id)."""
    from lwetl_spark.operators.media import synth_dhash_neardup_demo
    from lwetl_spark.streaming.pipeline import stream_dhash_neardup

    media_dir = str(tmp_path / "media")
    state_dir = str(tmp_path / "bands")
    # classes 0-9; ids k, k+10, k+20, k+30 are variants t=0..3 of
    # class k — hamming(t0, t) <= 3 for all t, so each cluster is a
    # star around its smallest id (the variant-0 copy)
    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    synth_dhash_neardup_demo(ids).coalesce(1).write.parquet(media_dir)
    ids2 = spark.createDataFrame([(i,) for i in range(20, 40)],
                                 "doc_id long")
    synth_dhash_neardup_demo(ids2).coalesce(1).write.mode(
        "append").parquet(media_dir)

    q = stream_dhash_neardup(spark, media_dir, state_dir,
                             max_files_per_trigger=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    admitted = sorted(
        r["__id"]
        for r in spark.read.parquet(state_dir)
        .select("__id").distinct().collect()
    )
    # == the one-shot batch dominator rule: admitted iff NO
    # smaller-id neighbor anywhere in the corpus (clusters here are
    # stars around their smallest member, so batch == stream)
    from lwetl_spark.operators.media import dhash_near_dup, image_dhash

    all_ids = spark.createDataFrame([(i,) for i in range(40)],
                                    "doc_id long")
    hx = image_dhash(synth_dhash_neardup_demo(all_ids)).filter(
        "ok").select("doc_id", "dhash")
    pairs = dhash_near_dup(hx).collect()
    dominated = {r["id_r"] for r in pairs}
    expect = sorted(set(range(40)) - dominated)
    assert admitted == expect
    assert 0 in admitted and 10 not in admitted  # variant star sanity
    n_rows = spark.read.parquet(state_dir).count()
    assert n_rows == 4 * len(admitted)  # 4 band rows per admitted id

    # replay: the same media admits nothing new
    q2 = stream_dhash_neardup(spark, media_dir, state_dir,
                              max_files_per_trigger=2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(state_dir).count() == n_rows


def test_stream_crawl_frontier_admits_each_urlkey_once(spark, tmp_path):
    """Streaming crawl frontier (late r11): urlkeys admit exactly
    once across batches with their FIRST (doc_id, link_idx) witness;
    canonicalization collapses URL variants to one admission;
    non-http refs never enter; replay admits nothing."""
    from pyspark.sql import functions as F

    from lwetl_spark.streaming.pipeline import stream_crawl_frontier

    pages_dir = str(tmp_path / "pages")
    state_dir = str(tmp_path / "frontier")
    rows1 = [
        (1, "https://h1.ex/a/page.html",
         '<a href="/p1">x</a><a href="rel/p2">y</a>'
         '<a href="mailto:z@q">skip</a>'),
        (2, "https://h2.ex/",
         '<a href="https://h1.ex/p1">dupe-of-p1</a>'
         '<a href="//h3.ex/c">c</a>'),
    ]
    spark.createDataFrame(
        rows1, "doc_id long, base string, html string"
    ).coalesce(1).write.parquet(pages_dir)
    rows2 = [
        # variants of already-admitted resources + one new
        (3, "http://WWW.h1.ex/",
         '<a href="/p1?">v</a><a href="/new">n</a>'),
    ]
    spark.createDataFrame(
        rows2, "doc_id long, base string, html string"
    ).coalesce(1).write.mode("append").parquet(pages_dir)

    q = stream_crawl_frontier(spark, pages_dir, state_dir,
                              max_files_per_trigger=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = {r["urlkey"]: r for r in
             spark.read.parquet(state_dir).collect()}
    assert sorted(state) == [
        "ex,h1)/a/rel/p2", "ex,h1)/new", "ex,h1)/p1", "ex,h3)/c"]
    assert state["ex,h1)/p1"]["doc_id"] == 1      # first witness wins
    assert state["ex,h1)/new"]["doc_id"] == 3
    assert state["ex,h3)/c"]["url"] == "https://h3.ex/c"
    n = spark.read.parquet(state_dir).count()
    assert n == 4  # one row per admitted key

    # replay: nothing re-admits
    q2 = stream_crawl_frontier(spark, pages_dir, state_dir,
                               max_files_per_trigger=2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(state_dir).count() == n
