"""Physical-plan regression tests (SURVEY §4): the optimizations that make
the engine scale must be visible in the executed plan, not assumed.

These assert Catalyst properties the 100 TB design depends on:
- predicate pushdown + column pruning reach the parquet scan,
- dimension joins broadcast (no shuffle of the fact side),
- ORDER BY+LIMIT compiles to TakeOrderedAndProject (no global sort),
- aggregations are partial+final (map-side combine),
- anti/semi joins stay joins (no driver-side sets, unlike the reference's
  client-side existence hash, db_copy/main.py:260-268).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT

from lwetl_spark.queries import QUERIES


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_CORRECT)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_pruning_pushdown(spark):
    plan = _plan(spark, "p2_filter_compare")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # only the 4 projected columns are read
    assert "l_extendedprice" not in scan and "l_shipdate" not in scan
    assert "l_quantity" in scan
    # predicate reaches the scan
    assert "l_quantity" in scan.split("DataFilters")[-1]


def test_flagship_broadcasts_dimensions(spark):
    plan = _plan(spark, "q1_flagship")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_topk_no_global_sort(spark):
    plan = _plan(spark, "o1_orderby_limit")
    assert "TakeOrderedAndProject" in plan


def test_agg_partial_final(spark):
    plan = _plan(spark, "a2_sum_q1")
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_anti_semi_stay_joins(spark):
    anti = _plan(spark, "j6_anti_join")
    semi = _plan(spark, "j7_semi_join")
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi


def test_exact_dedup_shuffles_digest_only(spark):
    """x_dedup_exact must not shuffle document text — only (digest, id)."""
    plan = _plan(spark, "x_dedup_exact")
    exchange_lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchange_lines, "expected a shuffle on the digest"
    assert all("text" not in l for l in exchange_lines)


def test_running_total_single_shuffle(spark):
    """w1 window: one hash-partition exchange on the partition key, sort
    within partitions — no extra shuffles."""
    plan = _plan(spark, "w1_running_total")
    assert plan.count("Exchange hashpartitioning") == 1


def test_corpus_pipeline_two_narrow_shuffles(spark):
    """x_corpus_pipeline: exactly the digest agg + lang agg exchanges, and
    document text never enters a shuffle."""
    plan = _plan(spark, "x_corpus_pipeline")
    exchange_lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(exchange_lines) == 2, plan
    assert all("text" not in l for l in exchange_lines)


def test_salted_join_no_single_hot_partition(spark):
    """salted_join joins on (key, _salt): the shuffle carries the salt so a
    hot key spreads over `salt` reducers."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.skew import salted_join

    big = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    small = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("name"))
    plan = (
        salted_join(big, small, "k", salt=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_salt" in plan


def test_partition_pruning(spark, tmp_path):
    """A filter on the partition column must prune at the scan
    (PartitionFilters), not read-then-filter."""
    import os

    from pyspark.sql import functions as F

    from lwetl_spark.catalog import load_table
    from lwetl_spark.sinks.partitioned import read_partitioned, write_partitioned

    p = str(tmp_path / "events_part")
    ev = load_table(spark, SF_CORRECT, "events").withColumn(
        "day", F.to_date("ts")
    )
    write_partitioned(ev, p, partition_by=["day"])
    days = sorted(os.listdir(p))
    assert sum(d.startswith("day=") for d in days) > 1  # really partitioned

    back = read_partitioned(spark, p)
    one_day = back.filter(F.col("day") == F.lit(ev.agg(F.min("day")).first()[0]))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters" in scan and "day" in scan.split("PartitionFilters")[-1]
    assert one_day.count() > 0


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must join without any
    exchange — the co-located join that makes recurring 100 TB fact-fact
    joins affordable."""
    from pyspark.sql import functions as F

    from lwetl_spark.catalog import load_table
    from lwetl_spark.sinks.partitioned import write_bucketed

    li = load_table(spark, SF_CORRECT, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_CORRECT, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", str(tmp_path / "b_li"), ["l_orderkey"], 8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        str(tmp_path / "b_o"),
        ["l_orderkey"],
        8,
    )
    try:
        joined = (
            spark.table("b_lineitem")
            .hint("merge")  # forbid broadcast so the shuffle question is real
            .join(spark.table("b_orders"), "l_orderkey")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_asof_join_single_shuffle(spark):
    """asof_join = union + one keyed window: exactly one hash exchange,
    no sort-merge join, no cross product."""
    from pyspark.sql import functions as F

    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.joins import asof_join

    ev = load_table(spark, SF_CORRECT, "events")
    l = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    r = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    plan = (
        asof_join(l, r, on="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan


def test_range_join_broadcasts_intervals_no_cross(spark):
    """range_join_banded: the band equi-join broadcasts the small interval
    side; no CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    plan = _plan(spark, "x_range_join")
    assert "BroadcastHashJoin" in plan, plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_multi_rollup_one_scan_one_shuffle(spark):
    """x_multi_rollup (GROUPING SETS): one events scan, Expand feeding
    partial aggregation, a single O(buckets) hash exchange."""
    plan = _plan(spark, "x_multi_rollup")
    assert plan.count("FileScan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Expand" in plan


def test_decontaminate_probe_streams_mapside(spark):
    """x_decontaminate: the benchmark gram set broadcasts, and the corpus
    side flows scan→generate→probe with NO exchange before the join —
    the only shuffle sits above the join (count-distinct over hits)."""
    plan = _plan(spark, "x_decontaminate")
    assert "BroadcastHashJoin" in plan
    join_pos = plan.index("BroadcastHashJoin")
    # the corpus branch is printed after the join operator; its segment up
    # to the BroadcastExchange (benchmark side) must contain no shuffle
    corpus_seg = plan[join_pos : plan.index("BroadcastExchange")]
    assert "Exchange hashpartitioning" not in corpus_seg


def test_repetition_zero_shuffle(spark):
    """x_repetition is row-local: no exchange anywhere in the plan."""
    plan = _plan(spark, "x_repetition")
    assert "Exchange" not in plan
    assert "FileScan parquet" in plan


def test_quantize_zero_shuffle(spark):
    plan = _plan(spark, "x_quantize_embeddings")
    assert "Exchange" not in plan


def test_pack_sequences_bucketed_windows_and_broadcast_offsets(spark):
    """x_pack_sequences: per-bucket windows (hash exchange on _bucket),
    offsets joined via broadcast — and NO global single-partition
    exchange over the data path (the 256-row totals window is the only
    SinglePartition, never the corpus)."""
    plan = _plan(spark, "x_pack_sequences")
    assert "BroadcastHashJoin" in plan
    data_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning(_bucket" in l
    ]
    assert data_exchanges, "expected the bucket-partitioned window exchange"


def test_chunk_documents_zero_shuffle(spark):
    # token-window chunking is row-local: no Exchange anywhere — at
    # 100 TB it rides the scan
    plan = _plan(spark, "x_chunk_docs")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode


def test_scd2_windows_share_one_exchange(spark):
    # change-detect lag() and interval lead() partition identically; the
    # filter preserves distribution+order so the second window inserts
    # no exchange
    plan = _plan(spark, "x_scd2")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 2


def test_bloom_probe_broadcasts_occupied_set(spark):
    # the occupied-bit set broadcasts; the batch side is probed without
    # a shuffle on the probe key
    plan = _plan(spark, "x_bloom_dedup")
    assert "BroadcastHashJoin" in plan


def test_compact_files_merges_without_shuffle(spark, tmp_path):
    from lwetl_spark.sinks.partitioned import compact_files

    p = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(32).write.parquet(p)
    stats = compact_files(spark, p, target_file_bytes=1 << 30)
    assert stats["files_before"] >= 32
    assert stats["files_after"] == 1
    back = spark.read.parquet(p)
    assert back.count() == 10_000
    assert back.agg({"id": "sum"}).first()[0] == 10_000 * 9_999 // 2
    # idempotent / under-threshold: nothing to do
    again = compact_files(spark, p, target_file_bytes=1 << 30)
    assert again["files_after"] == again["files_before"] == 1


def test_zvalue_interleaves_bits(spark):
    from lwetl_spark.operators.zorder import zvalue

    df = spark.createDataFrame([(1, 2), (3, 3), (0, 0)], "x LONG, y LONG")
    got = [r.z for r in df.select(zvalue(["x", "y"], bits=2).alias("z")).collect()]
    # (x=01, y=10) -> z bits: pos0=x0=1, pos1=y0=0, pos2=x1=0, pos3=y1=1 -> 9
    assert got == [9, 15, 0]
    import pytest

    with pytest.raises(ValueError):
        zvalue(["x", "y"], bits=32)


def test_zorder_write_bounds_both_dims(spark, tmp_path):
    """After z-order clustering, every parquet file's footer min/max box
    is tight on BOTH dimensions (the data-skipping contract); a plain
    x-sort leaves the y range at full width in every file."""
    import glob

    import pyarrow.parquet as pq

    from lwetl_spark.operators.zorder import zorder_write
    from pyspark.sql import functions as F

    df = spark.range(128 * 128).select(
        (F.col("id") % 128).alias("x"), (F.col("id") / 128).cast("long").alias("y")
    )
    zp = str(tmp_path / "zord")
    zorder_write(df, zp, ["x", "y"], bits=8, num_files=16)

    def file_ranges(path, col):
        out = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                        hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
            if lo is not None:
                out.append(hi - lo)
        return out

    # ~1024 z-points per file = 32x32 tiles; sampled range boundaries can
    # straddle a major quadrant edge, so assert MOST files are tight on
    # both dims (a straddler spans the full axis) — linear sort has none.
    for col in ("x", "y"):
        ranges = file_ranges(zp, col)
        tight = sum(1 for r in ranges if r <= 63)
        assert tight >= 0.75 * len(ranges), (col, ranges)

    lp = str(tmp_path / "linear")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lp)
    y_ranges = file_ranges(lp, "y")
    assert all(r >= 120 for r in y_ranges)  # x-sort leaves y unbounded


def test_plan_shuffle_count(spark):
    from pyspark.sql import functions as F

    from lwetl_spark.plans.statistics import plan_shuffle_count

    df = spark.range(1000).select((F.col("id") % 10).alias("k"), "id")
    assert plan_shuffle_count(df) == 0
    agg = df.groupBy("k").count()
    assert plan_shuffle_count(agg) == 1
    # reusing the same key partitioning: window over the agg adds NO
    # extra exchange (hash(k) satisfies both)
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("count")
    agg2 = agg.withColumn("rn", F.row_number().over(w))
    assert plan_shuffle_count(agg2) == 1


def test_similarity_default_path_no_full_corpus_collect(spark, monkeypatch):
    """Pin VERDICT r1 item 1: the DEFAULT scoring path of the similarity
    operators never collects the full corpus to the driver.  The blocked
    exact path and the 'join' ANN scorer must run zero DataFrame.collect
    calls; ivf_topk is allowed only its bounded (limit train_sample)
    k-means training collect."""
    from lwetl_spark.operators.similarity import (
        cosine_topk_blocked,
        ivf_topk,
        lsh_ann_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_corpus = emb.count()

    # patch the concrete class (pyspark 4 splits the abstract
    # pyspark.sql.DataFrame from the classic implementation)
    cls = type(emb)
    sizes = []
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)

    assert cosine_topk_blocked(emb, k=3).count() > 0
    assert sizes == [], "blocked exact path must not collect"

    assert lsh_ann_topk(emb, k=3).count() > 0
    assert sizes == [], "default (join) LSH scorer must not collect"

    train = 100
    assert ivf_topk(emb, k=3, train_sample=train).count() > 0
    assert sizes and all(s <= train < n_corpus for s in sizes), (
        "ivf may only collect its bounded training sample",
        sizes,
    )

    sizes.clear()
    from lwetl_spark.operators.similarity import pq_topk

    assert pq_topk(emb, k=3, train_sample=train).count() > 0
    assert sizes and all(s <= train < n_corpus for s in sizes), (
        "pq may only collect its bounded codebook training sample",
        sizes,
    )


def test_cosine_topk_autoswitches_to_blocked_above_threshold(spark):
    """Pin VERDICT r2 #4: cosine_topk itself must not broadcast a corpus
    bigger than max_broadcast_rows — above the threshold it routes to the
    blocked cogroup path (no BroadcastExchange of data rows; the blocked
    plan's only broadcasts are the q_blocks/c_blocks int grids), and the
    two paths agree value-for-value."""
    from lwetl_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    assert n > 10

    routed = cosine_topk(emb, k=3, max_broadcast_rows=10)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan, "expected the blocked cogroup path"

    broadcast_form = cosine_topk(emb, k=3, max_broadcast_rows=None)
    bplan = broadcast_form._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" not in bplan, "opt-out must keep the join form"

    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, broadcast_form.collect())
    )


def test_cosine_topk_blocked_matches_pandas(spark):
    """The distributed blocked exact top-k is value-identical to the
    single-broadcast Arrow path (same float64 matmul, rounding and
    tie-break)."""
    from lwetl_spark.operators.similarity import (
        cosine_topk_blocked,
        cosine_topk_pandas,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, cosine_topk_blocked(emb, k=5).collect()))
    b = sorted(map(tuple, cosine_topk_pandas(emb, k=5).collect()))
    assert a == b


def test_funnel_and_setops_are_single_lazy_plans(spark, monkeypatch):
    """Pin VERDICT r1 item 2: x_funnel and o8_set_ops build ONE lazy plan —
    no .count()/.collect() actions fire during query construction, and the
    plans carry the minimal shuffle count (funnel: hash(user_id) + the
    single-partition final agg; set-ops: the final agg only)."""
    from lwetl_spark.plans.statistics import plan_shuffle_count
    from lwetl_spark.queries import QUERIES

    cls = type(spark.range(1))

    def boom(self, *a, **kw):
        raise AssertionError("eager action during query construction")

    monkeypatch.setattr(cls, "count", boom)
    monkeypatch.setattr(cls, "collect", boom)
    funnel = QUERIES["x_funnel"](spark, "/root/testdata/sf0.001")
    setops = QUERIES["o8_set_ops"](spark, "/root/testdata/sf0.001")
    monkeypatch.undo()

    assert plan_shuffle_count(setops) == 1
    assert plan_shuffle_count(funnel) == 2
    assert setops.count() == 3
    assert funnel.count() == 3


def test_dup_spans_shuffles_fingerprints_only(spark):
    """x_dup_spans: shuffles carry (whash, id) and the per-doc agg — the
    token arrays and document text never enter an exchange."""
    plan = _plan(spark, "x_dup_spans")
    exchange_lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchange_lines
    assert all("text" not in l and "toks" not in l for l in exchange_lines), plan


def test_pit_join_hash_join_on_user_no_nested_loop(spark):
    """x_pit_join: equi-join on user_id with the interval predicate in
    the same stage — never a BroadcastNestedLoopJoin/cartesian (the
    SCD2 dimension grows with users; a range-only join would be O(n²))."""
    plan = _plan(spark, "x_pit_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_entity_resolution_no_cartesian(spark):
    """Blocked fuzzy edges: candidates come only from the brand
    equi-join — no all-pairs stage anywhere in the plan."""
    plan = _plan(spark, "x_entity_resolution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_source_overlap_shuffles_hashes_never_text(spark):
    """x_source_overlap: every hash exchange carries (md5, source)
    pairs — document text dies map-side in the gram projection."""
    plan = _plan(spark, "x_source_overlap")
    exchange_lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchange_lines
    assert all("text" not in l for l in exchange_lines)


def test_grouping_sets_single_expand_single_agg_pair(spark):
    """x_grouping_sets: one scan → one Expand → partial+final agg; the
    three sets must not become three scans."""
    plan = _plan(spark, "x_grouping_sets")
    assert plan.count("Expand") == 1
    assert plan.count("FileScan parquet") == 1


def test_winsorize_band_broadcast_back(spark):
    """x_winsorize: the percentile band table joins back via broadcast —
    the fact table never shuffles for the clip."""
    plan = _plan(spark, "x_winsorize")
    assert "BroadcastHashJoin" in plan


def test_winnowing_shuffles_hashes_never_text(spark):
    """x_winnowing: exchanges carry (doc_id, pos, 8-byte hash) triples
    and fp-keyed aggregates — gram strings and text die map-side."""
    plan = _plan(spark, "x_winnowing")
    exchange_lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchange_lines
    assert all("text" not in l and "gram" not in l for l in exchange_lines), plan


def test_markov_single_user_shuffle_bounded_output(spark):
    """x_markov_chain: the lag window shuffles on user_id; the
    transition agg output is |types|²-bounded.  No joins at all."""
    plan = _plan(spark, "x_markov_chain")
    assert "Join" not in plan
    assert "Exchange hashpartitioning(user_id" in plan


def test_cdc_apply_one_key_shuffle_no_join(spark):
    """x_cdc_apply: last-change-wins is ONE window over the key shuffle
    plus filters — no self-join against a max-ts subquery."""
    plan = _plan(spark, "x_cdc_apply")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_survival_shuffles_user_pairs_only(spark):
    """x_survival: corpus-sized stages shuffle (user_id, ts) aggregates;
    the day-level window runs over the bounded lifetime census."""
    plan = _plan(spark, "x_survival")
    exchange_lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchange_lines
    assert all("event_type" not in l and "props" not in l for l in exchange_lines)


def test_feature_hash_no_join_fixed_width(spark):
    """x_feature_hash: hashing-trick featurization is explode + agg —
    no vocabulary build, no join, no broadcast."""
    plan = _plan(spark, "x_feature_hash")
    assert "Join" not in plan


def test_pmi_no_cartesian_two_phase_topk(spark):
    """x_pmi: the pair stage is a doc_id equi-join over the common
    vocabulary — never an all-pairs product (the one BNLJ in the plan
    is the broadcast of the 1-row doc-count, the BM25 stats idiom) —
    and the top-30 is two-phase salted (no global single-reducer sort
    over every pair)."""
    plan = _plan(spark, "x_pmi")
    assert "CartesianProduct" not in plan
    # two windows: salted partial then ≤64·30-row final
    assert plan.count("Window") >= 2, plan


def test_composed_curate_shuffle_text_ratio_ci_gate():
    """VERDICT r4 #7: the composed-rehearsal shuffle accounting as a CI
    gate.  Runs tools/curate_rehearsal.py (the FULL curate chain incl.
    gopher battery, fluency tail, dup-span filter, exact dedup, 3-gram
    + fuzzy decontamination, quality model, sharded write) at a
    scaled-down 4x/sf0.01 in a subprocess (own UI-enabled session — the
    tuned pytest session disables the status REST API) and pins the
    stage-level shuffle-bytes / corpus-text-bytes ratio.

    Measured envelope: 5.7x at 4x/sf0.01, 6.3x at 16x/sf0.1 (SCALE.md).
    Threshold = 2x the measured envelope: an operator edit that
    reintroduces a corpus-sized broadcast side or puts document text
    back on an exchange (the two failure classes the 16x rehearsal
    caught by hand in round 4) fails HERE instead of waiting for the
    next manual rehearsal."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "curate_rehearsal.py"),
         "4", "/root/testdata/sf0.01"],
        capture_output=True, text=True, timeout=420, cwd=str(repo),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["n_kept"] > 0, out  # the chain must retain documents
    assert out["shuffle_to_text_ratio"] <= 12.0, out
    # text never rides an exchange: shuffle volume is metadata-sized,
    # bounded well below input bytes x chain depth
    assert out["shuffle_write_bytes"] < 4 * out["input_bytes"], out


def test_event_pattern_single_user_shuffle(spark):
    """x_event_pattern: both LEAD windows and the final agg share
    hash(user_id) — the whole pattern scan is ONE wide stage, and
    nothing but user-keyed exchanges appear."""
    plan = _plan(spark, "x_event_pattern")
    exchange_lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(exchange_lines) == 1, plan
    assert "user_id" in exchange_lines[0]


def test_cusum_corpus_stage_is_partial_agg(spark):
    """x_cusum: the only corpus-sized work is the day-keyed partial
    aggregation (map-side combine onto calendar days); the CUSUM windows
    run post-agg.  Partial+final HashAggregate must surround the one
    day-keyed exchange."""
    plan = _plan(spark, "x_cusum")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_weighted_median_premerges_before_window(spark):
    """x_weighted_median: duplicate prices merge in a partial/final agg
    BEFORE the cumulative window, so the per-flag scan runs over
    distinct prices; lineitem's text-free columns are the only scan."""
    plan = _plan(spark, "x_weighted_median")
    # agg exchange on (flag, price) + window exchange on flag
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "l_extendedprice" in plan and "l_comment" not in plan


def test_transitive_root_rounds_are_bounded_joins(spark):
    """transitive_root: converged output for a depth-3 forest contains
    no corpus-sized cartesian stage and resolves within the log bound;
    state never exceeds one row per node (the count IS the node set)."""
    from pyspark.sql import functions as F2

    from lwetl_spark.operators.graph import transitive_root

    edges = spark.range(4, 4096).select(
        F2.col("id").alias("child"), F2.expr("id div 4").alias("parent")
    )
    out = transitive_root(edges, max_iters=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert out.count() == 4095  # nodes 1..4095, exactly once each


def test_dhash_neardup_band_join_never_broadcasts(spark):
    """x_dhash_neardup: both band-join sides grow with the corpus, so
    the join must be shuffled (hinted), never a broadcast of every
    document's bands; and no all-pairs stage exists."""
    import lwetl_spark.queries_etl  # noqa: F401  (registers the key)

    plan = _plan(spark, "x_dhash_neardup")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_neardup_r6_band_join_never_broadcasts(spark):
    """The 8-band radius-6 variant keeps the same scale shape: the
    wider banding doubles band rows, never the join strategy — still
    shuffled, no broadcast, no all-pairs stage."""
    import lwetl_spark.queries_etl  # noqa: F401  (registers the key)

    plan = _plan(spark, "x_dhash_neardup_r6")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_robots_gate_rules_join_never_broadcasts(spark):
    """x_robots_gate (late r11): the rules side grows with the corpus
    (one group set per host), so the urls ⋈ rules join must stay a
    hinted shuffled-hash join — never a corpus-sized broadcast — and
    no all-pairs stage exists; the longest-match pick is a window,
    not a self-join."""
    import lwetl_spark.queries_etl  # noqa: F401  (registers the key)

    plan = _plan(spark, "x_robots_gate")
    assert "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_surt_and_cdx_are_map_only(spark):
    """x_surt_key / x_cdx_parse: pure-expression passes — zero
    exchanges besides none at all; the 100 TB index-keying pass must
    not shuffle a single row."""
    import lwetl_spark.queries_etl  # noqa: F401  (registers the key)

    for key in ("x_surt_key", "x_cdx_parse", "x_link_extract"):
        plan = _plan(spark, key)
        assert "Exchange" not in plan, key
        assert "BroadcastHashJoin" not in plan, key
