"""BM25 lexical retrieval: hand-checked scores on a tiny corpus, ranking
properties, and the plan shape the 100 TB design depends on (query terms
broadcast; document text never in a wide exchange)."""

from __future__ import annotations

from tests.conftest import SF_CORRECT

from lwetl_spark.operators.retrieval import bm25_topk, doc_term_stats
from lwetl_spark.queries import QUERIES


def _mini(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry"),
            (3, "banana banana banana cherry"),
            (4, "durian durian durian"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "apple"), (2, "banana")], "query_id int, term string")
    return docs, q


def _expected_score(tf, dl, df, n, adl_m):
    tfc = 1_000_000 * 22 * tf * adl_m // (10 * tf * adl_m + 3 * adl_m + 9000 * dl)
    idf = 1000 * (2 * n - 2 * df + 1) // (2 * df + 1)
    return tfc * idf // 1000


def test_bm25_hand_checked(spark):
    docs, q = _mini(spark)
    out = bm25_topk(docs, q, k=10).collect()
    # corpus: N=4, dl = 3,2,4,3 → sum=12, adl_m = 1000*12//4 = 3000
    adl_m, n = 3000, 4
    by_qd = {(r["query_id"], r["doc_id"]): r for r in out}
    # 'apple': df=2; doc1 tf=2 dl=3; doc2 tf=1 dl=2
    assert by_qd[(1, 1)]["score_ppm"] == _expected_score(2, 3, 2, n, adl_m)
    assert by_qd[(1, 2)]["score_ppm"] == _expected_score(1, 2, 2, n, adl_m)
    # 'banana': df=2; doc3 tf=3 dl=4; doc1 tf=1 dl=3
    assert by_qd[(2, 3)]["score_ppm"] == _expected_score(3, 4, 2, n, adl_m)
    assert by_qd[(2, 1)]["score_ppm"] == _expected_score(1, 3, 2, n, adl_m)
    # ranks: higher-tf doc wins within each query
    assert by_qd[(1, 1)]["rnk"] == 1 and by_qd[(1, 2)]["rnk"] == 2
    assert by_qd[(2, 3)]["rnk"] == 1 and by_qd[(2, 1)]["rnk"] == 2
    # doc4 matches nothing → absent
    assert not [k for k in by_qd if k[1] == 4]


def test_bm25_rarer_term_outscores_common_at_equal_tf(spark):
    """idf direction: with identical tf/dl, the lower-df term scores higher."""
    docs = spark.createDataFrame(
        [(i, "common rare") if i == 0 else (i, "common pad") for i in range(6)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "common"), (2, "rare")], "query_id int, term string"
    )
    out = {(r["query_id"], r["doc_id"]): r["score_ppm"] for r in
           bm25_topk(docs, q, k=10).collect()}
    assert out[(2, 0)] > out[(1, 0)]


def test_bm25_k_cut_is_deterministic(spark):
    """Ties broken by doc_id: equal-score docs cut at k reproducibly."""
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(20)], "doc_id long, text string"
    )
    q = spark.createDataFrame([(1, "same")], "query_id int, term string")
    a = sorted(r["doc_id"] for r in bm25_topk(docs, q, k=5).collect())
    b = sorted(r["doc_id"] for r in bm25_topk(docs, q, k=5).collect())
    assert a == b == list(range(5))


def test_doc_term_stats_shapes(spark):
    docs, _ = _mini(spark)
    tf, dl, stats = doc_term_stats(docs)
    assert dict((r["doc_id"], r["dl"]) for r in dl.collect()) == {1: 3, 2: 2, 3: 4, 4: 3}
    s = stats.collect()[0]
    assert s["n"] == 4 and s["adl_m"] == 3000
    assert {(r["doc_id"], r["tok"]): r["tf"] for r in tf.collect()}[(1, "apple")] == 2


def test_bm25_plan_queries_broadcast_text_never_shuffles(spark):
    """Scale pins: the query-term join is a BroadcastHashJoin, and no
    hash exchange ever carries the raw `text` column — only postings."""
    df = QUERIES["x_bm25"](spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    exchange_lines = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert exchange_lines, "expected keyed exchanges for tf/df aggs"
    assert all("text" not in l for l in exchange_lines)


def test_text_index_roundtrip_equals_inline(spark, tmp_path):
    from lwetl_spark.operators.retrieval import (
        bm25_topk,
        build_text_index,
        query_text_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{' delta' * (i % 4)} epsilon w{i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "delta"), (1, "epsilon"), (2, "w3")], "query_id int, term string"
    )
    path = str(tmp_path / "idx")
    build_text_index(docs, path)
    a = sorted(map(tuple, query_text_index(spark, path, q, k=5).collect()))
    b = sorted(map(tuple, bm25_topk(docs, q, k=5).collect()))
    assert a == b and len(a) > 0


def test_text_index_probe_prunes_partitions(spark, tmp_path):
    """The probe's scan must carry a PartitionFilters entry on the tok
    bucket — only the query terms' directories are listed/read."""
    from lwetl_spark.operators.retrieval import build_text_index, query_text_index

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(10)], "doc_id long, text string"
    )
    q = spark.createDataFrame([(1, "alpha")], "query_id int, term string")
    path = str(tmp_path / "idx")
    build_text_index(docs, path)
    plan = (
        query_text_index(spark, path, q, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # (the tuned test session truncates long plan strings, so match the
    # partition-filter fragment anywhere rather than per-scan-line)
    import re

    assert re.search(r"PartitionFilters: \[isnotnull\(bucket#\d+\), \(bucket#\d+ = \d+\)", plan), plan


def test_rank_eval_metrics(spark):
    """Hand-computed metrics on a tiny ranking: relevant docs at ranks
    2 and 4 of 5 -> mrr = 1e6//2, p@5 = 2/5, hdcg sums graded rels."""
    from lwetl_spark.operators.retrieval import rank_eval

    ranking = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4), (1, 14, 5)],
        "query_id long, doc_id long, rnk long",
    )
    rel = spark.createDataFrame(
        [(1, 11, 2), (1, 13, 1), (1, 14, 3)],
        "query_id long, doc_id long, rel long",
    )
    out = rank_eval(ranking, rel, k=5, rel_threshold=2).collect()[0]
    assert out["n_ranked"] == 5
    assert out["mrr_ppm"] == 1_000_000 // 2          # first rel>=2 at rank 2
    assert out["p_at_5_ppm"] == 1_000_000 * 2 // 5   # ranks 2 and 5
    # hdcg: rel 2 at rnk2 -> 2e6//3; rel 1 at rnk4 -> 1e6//5; rel 3 at rnk5 -> 3e6//6
    assert out["hdcg_ppm"] == 2_000_000 // 3 + 1_000_000 // 5 + 3_000_000 // 6


def test_rank_eval_no_relevant_hits(spark):
    from lwetl_spark.operators.retrieval import rank_eval

    ranking = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2)], "query_id long, doc_id long, rnk long"
    )
    rel = spark.createDataFrame([], "query_id long, doc_id long, rel long")
    out = rank_eval(ranking, rel, k=10).collect()[0]
    assert out["mrr_ppm"] == 0 and out["p_at_10_ppm"] == 0 and out["hdcg_ppm"] == 0


def test_rrf_fuse_agreement_wins(spark):
    """A doc ranked mid-list in BOTH inputs outscores docs topping only
    one list: 2/(60+3) > 1/(60+1) — the RRF consensus property."""
    from lwetl_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 100, 1), (1, 300, 3)], "query_id long, doc_id long, rnk long"
    )
    b = spark.createDataFrame(
        [(1, 200, 1), (1, 300, 3)], "query_id long, doc_id long, rnk long"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse([a, b], topk=10).collect()}
    assert rows[300]["n_lists"] == 2
    assert rows[300]["rrf_ppm"] == 2 * (1_000_000 // 63)
    assert rows[100]["rrf_ppm"] == 1_000_000 // 61
    assert rows[300]["rnk"] == 1  # consensus beats single-list rank 1


def test_update_text_index_equals_rebuild(spark, tmp_path):
    """Incremental maintenance contract: build on A, update with B then
    C — postings/df/doclen/stats must be row-identical to a from-scratch
    build over A∪B∪C, and probes must return the same ranking."""
    from pyspark.sql import functions as F

    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
        update_text_index,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 3 == 0)
    b = docs.filter(F.col("doc_id") % 3 == 1)
    c = docs.filter(F.col("doc_id") % 3 == 2)

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_text_index(a, inc)
    update_text_index(spark, inc, b)
    update_text_index(spark, inc, c)
    build_text_index(docs, full)

    for part in ("postings", "df", "doclen", "stats"):
        got = sorted(
            map(tuple, spark.read.parquet(f"{inc}/{part}").drop("bucket").collect())
        )
        want = sorted(
            map(tuple, spark.read.parquet(f"{full}/{part}").drop("bucket").collect())
        )
        assert got == want, f"{part} diverged after incremental updates"

    q = spark.createDataFrame(
        [(1, "spark"), (1, "sort"), (2, "hash")], "query_id int, term string"
    )
    gi = sorted(map(tuple, query_text_index(spark, inc, q, k=10).collect()))
    gf = sorted(map(tuple, query_text_index(spark, full, q, k=10).collect()))
    assert gi == gf and gi


def test_ingest_increment_campaign_equals_rebuild(spark, tmp_path):
    """VERDICT r4 #8: the composed daily-crawl increment —
    manifest_diff → dedup-against-admitted-corpus → update_text_index
    (operators/incremental.ingest_increment) — over two snapshots must
    leave an index row-identical to a from-scratch build over the
    admitted docs, while rejecting (a) unchanged re-crawled ids,
    (b) cross-snapshot duplicate CONTENT under new ids, and (c)
    in-delta content dupes (min-id representative)."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    texts = {
        0: "spark shuffles hash partitions across the cluster",
        1: "sort merge join spills gracefully to local disk",
        2: "broadcast joins ship the small dimension everywhere",
        3: "window functions rank rows inside each partition",
        4: "parquet scans prune columns and push filters down",
    }
    snap0 = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    manifest = str(tmp_path / "manifest")
    state = str(tmp_path / "state")
    index = str(tmp_path / "index")

    s0 = ingest_increment(spark, snap0, manifest, state, index)
    assert s0 == {
        "n_snapshot": 5, "n_new_or_changed": 5, "n_admitted": 5,
        "n_compacted": 0, "n_deferred": 0, "n_retired": 0,
        "n_vec_indexed": 0, "n_vec_retired": 0,  # text-only campaign
        "vector_maintenance": "",
    }

    # day 1: ids 0-4 unchanged (re-crawled), 5 removed is impossible in a
    # superset crawl so drop id 4 instead (removed), new ids 10-13:
    #   10 = genuinely new content            -> admitted
    #   11 = byte-copy of doc 2's content     -> cross-snapshot dup, rejected
    #   12 = new content, 13 = copy of 12     -> in-delta dup, min-id 12 wins
    #   3  = CHANGED content, old version indexed -> deferred (append-only
    #        index: re-admitting an indexed id would duplicate doclen rows)
    snap1 = spark.createDataFrame(
        [(i, texts[i]) for i in range(3)]
        + [
            (3, "the optimizer now reorders joins by estimated cost"),
            (10, "adaptive execution coalesces tiny shuffle partitions"),
            (11, texts[2]),
            (12, "bloom filters prune the probe side before the join"),
            (13, "bloom filters prune the probe side before the join"),
        ],
        "doc_id long, text string",
    )
    s1 = ingest_increment(spark, snap1, manifest, state, index)
    assert s1["n_snapshot"] == 8
    assert s1["n_new_or_changed"] == 5  # 10..13 added + 3 changed
    assert s1["n_admitted"] == 2  # 10 and 12; 3 deferred, 11/13 dups

    admitted = {r["doc_id"] for r in spark.read.parquet(state).collect()}
    assert admitted == {0, 1, 2, 3, 4, 10, 12}

    # manifest advanced to the FULL day-1 snapshot (diff basis)
    assert {r["doc_id"] for r in spark.read.parquet(manifest).collect()} == {
        0, 1, 2, 3, 10, 11, 12, 13
    }

    # equivalence: increment == from-scratch rebuild over the admitted set
    full = str(tmp_path / "full")
    # admitted CONTENT: snap0's versions for day-0 ids (doc 3's change
    # was deferred) + the two day-1 admissions
    build_text_index(
        snap0.unionByName(snap1.filter(F.col("doc_id") > 4)).filter(
            F.col("doc_id").isin(list(admitted))
        ),
        full,
    )
    for part in ("postings", "df", "doclen", "stats"):
        got = sorted(
            map(tuple, spark.read.parquet(f"{index}/{part}").drop("bucket").collect())
        )
        want = sorted(
            map(tuple, spark.read.parquet(f"{full}/{part}").drop("bucket").collect())
        )
        assert got == want, f"{part} diverged from rebuild"
    q = spark.createDataFrame(
        [(1, "shuffle"), (1, "partitions"), (2, "bloom"), (3, "join")],
        "query_id int, term string",
    )
    gi = sorted(map(tuple, query_text_index(spark, index, q, k=10).collect()))
    gf = sorted(map(tuple, query_text_index(spark, full, q, k=10).collect()))
    assert gi == gf and gi

    # idempotence: replaying the same snapshot admits nothing — but the
    # DEFERRED change (doc 3) keeps resurfacing as changed because the
    # manifest intentionally holds its old digest until it is applied
    s2 = ingest_increment(spark, snap1, manifest, state, index)
    assert s2["n_admitted"] == 0 and s2["n_new_or_changed"] == 1

    # day 2 with compact_changed=True: doc 3's deferred change (still
    # present in the crawl) now compacts — its index entry is replaced
    # in-place, its state fingerprint follows, and the index equals a
    # rebuild where doc 3 always had the new content
    s3 = ingest_increment(
        spark, snap1, manifest, state, index, compact_changed=True
    )
    assert s3["n_admitted"] == 0 and s3["n_compacted"] == 1

    full2 = str(tmp_path / "full2")
    build_text_index(
        snap0.filter(F.col("doc_id") != 3)
        .unionByName(snap1.filter(F.col("doc_id").isin(3, 10, 12)))
        .filter(F.col("doc_id").isin(list(admitted))),
        full2,
    )
    for part in ("postings", "df", "doclen", "stats"):
        got = sorted(
            map(tuple, spark.read.parquet(f"{index}/{part}").drop("bucket").collect())
        )
        want = sorted(
            map(tuple, spark.read.parquet(f"{full2}/{part}").drop("bucket").collect())
        )
        assert got == want, f"{part} diverged after compacting the change"
    # replay again: the change is applied, nothing left to compact
    s4 = ingest_increment(
        spark, snap1, manifest, state, index, compact_changed=True
    )
    assert s4["n_compacted"] == 0 and s4["n_admitted"] == 0


def test_compact_text_index_replaces_changed_docs(spark, tmp_path):
    """compact_text_index: after replacing changed docs' content, the
    index must be row-identical to a from-scratch build where those ids
    always had the new content — the compaction half of the append-only
    contract (ingest_increment defers changed docs here).  Also pins
    the empty-bucket fallback: replacing EVERY doc (all buckets turn
    over, dynamic overwrite alone could strand stale partitions) still
    converges to the rebuild."""
    from pyspark.sql import functions as F

    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        compact_text_index,
        query_text_index,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    changed = docs.filter(F.col("doc_id") % 10 == 3).select(
        "doc_id", F.concat(F.lit("revised edition "), F.col("text")).alias("text")
    )

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_text_index(docs, inc)
    compact_text_index(spark, inc, changed)
    build_text_index(
        docs.filter(F.col("doc_id") % 10 != 3).unionByName(changed), full
    )
    for part in ("postings", "df", "doclen", "stats"):
        got = sorted(
            map(tuple, spark.read.parquet(f"{inc}/{part}").drop("bucket").collect())
        )
        want = sorted(
            map(tuple, spark.read.parquet(f"{full}/{part}").drop("bucket").collect())
        )
        assert got == want, f"{part} diverged after compaction"
    q = spark.createDataFrame(
        [(1, "revised"), (1, "data"), (2, "table")], "query_id int, term string"
    )
    gi = sorted(map(tuple, query_text_index(spark, inc, q, k=10).collect()))
    gf = sorted(map(tuple, query_text_index(spark, full, q, k=10).collect()))
    assert gi == gf and gi

    # total-turnover case: tiny index, every doc replaced with content
    # whose tokens land in DIFFERENT buckets -> old buckets must vanish
    tiny = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    tiny2 = spark.createDataFrame(
        [(1, "epsilon zeta"), (2, "eta theta")], "doc_id long, text string"
    )
    t_inc = str(tmp_path / "tiny_inc")
    t_full = str(tmp_path / "tiny_full")
    build_text_index(tiny, t_inc)
    compact_text_index(spark, t_inc, tiny2)
    build_text_index(tiny2, t_full)
    for part in ("postings", "df", "doclen", "stats"):
        got = sorted(
            map(tuple, spark.read.parquet(f"{t_inc}/{part}").drop("bucket").collect())
        )
        want = sorted(
            map(tuple, spark.read.parquet(f"{t_full}/{part}").drop("bucket").collect())
        )
        assert got == want, f"tiny {part} kept stale rows"


def test_ingest_increment_delta_mode(spark, tmp_path):
    """snapshot_is_delta=True: a partial batch (only the day's files)
    must (a) not treat absent ids as removed — the manifest MERGES, so
    a later full diff still sees every id; (b) admit novel content and
    reject duplicates exactly as full mode; (c) leave the index equal
    to full-snapshot mode fed the equivalent superset snapshot."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.retrieval import query_text_index

    texts = {
        0: "spark shuffles hash partitions across the cluster",
        1: "sort merge join spills gracefully to local disk",
        2: "broadcast joins ship the small dimension everywhere",
    }
    snap0 = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [
            (10, "adaptive execution coalesces tiny shuffle partitions"),
            (11, texts[2]),  # duplicate content -> rejected
        ],
        "doc_id long, text string",
    )

    # delta-mode campaign
    md, sd, xd = (str(tmp_path / p) for p in ("m_d", "s_d", "x_d"))
    ingest_increment(spark, snap0, md, sd, xd)
    st = ingest_increment(spark, delta, md, sd, xd, snapshot_is_delta=True)
    assert st["n_admitted"] == 1 and st["n_new_or_changed"] == 2
    # manifest merged: day-0 ids survive the partial batch
    assert {r["doc_id"] for r in spark.read.parquet(md).collect()} == {
        0, 1, 2, 10, 11
    }

    # full-mode reference fed the superset snapshot
    mf, sf, xf = (str(tmp_path / p) for p in ("m_f", "s_f", "x_f"))
    ingest_increment(spark, snap0, mf, sf, xf)
    ingest_increment(spark, snap0.unionByName(delta), mf, sf, xf)

    q = spark.createDataFrame(
        [(1, "shuffle"), (2, "broadcast")], "query_id int, term string"
    )
    gd = sorted(map(tuple, query_text_index(spark, xd, q, k=10).collect()))
    gf = sorted(map(tuple, query_text_index(spark, xf, q, k=10).collect()))
    assert gd == gf and gd

    # replaying the delta admits nothing and keeps the manifest intact
    st2 = ingest_increment(spark, delta, md, sd, xd, snapshot_is_delta=True)
    assert st2["n_admitted"] == 0
    assert {r["doc_id"] for r in spark.read.parquet(md).collect()} == {
        0, 1, 2, 10, 11
    }


def test_ingest_increment_retire_removed(spark, tmp_path):
    """retire_removed=True: ids absent from a full snapshot purge from
    index + state (remove_from_index), the index equals a rebuild
    without them, and a later re-crawl of the SAME content under a new
    id admits fresh (its fingerprint left the admitted set with the
    retirement)."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    texts = {
        1: "spark shuffles hash partitions across the cluster",
        2: "sort merge join spills gracefully to local disk",
        3: "broadcast joins ship the small dimension everywhere",
    }
    snap0 = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    man, st, idx = (str(tmp_path / p) for p in ("m", "s", "x"))
    ingest_increment(spark, snap0, man, st, idx)

    # day 1: doc 2 vanishes from the crawl (takedown)
    snap1 = snap0.filter(F.col("doc_id") != 2)
    s1 = ingest_increment(spark, snap1, man, st, idx, retire_removed=True)
    assert s1["n_retired"] == 1 and s1["n_admitted"] == 0

    assert {r["doc_id"] for r in spark.read.parquet(st).collect()} == {1, 3}
    full = str(tmp_path / "full")
    build_text_index(snap1, full)
    for part in ("postings", "df", "doclen", "stats"):
        got = sorted(
            map(tuple, spark.read.parquet(f"{idx}/{part}").drop("bucket").collect())
        )
        want = sorted(
            map(tuple, spark.read.parquet(f"{full}/{part}").drop("bucket").collect())
        )
        assert got == want, f"{part} kept retired rows"

    # day 2: the taken-down CONTENT re-crawls under a new id — its
    # fingerprint is gone from the admitted set, so it admits fresh
    snap2 = snap1.unionByName(
        spark.createDataFrame([(20, texts[2])], "doc_id long, text string")
    )
    s2 = ingest_increment(spark, snap2, man, st, idx, retire_removed=True)
    assert s2["n_admitted"] == 1 and s2["n_retired"] == 0
    assert {r["doc_id"] for r in spark.read.parquet(st).collect()} == {1, 3, 20}

    q = spark.createDataFrame([(1, "sort"), (2, "shuffle")], "query_id int, term string")
    full2 = str(tmp_path / "full2")
    build_text_index(snap2, full2)
    gi = sorted(map(tuple, query_text_index(spark, idx, q, k=10).collect()))
    gf = sorted(map(tuple, query_text_index(spark, full2, q, k=10).collect()))
    assert gi == gf and gi


def test_ingest_increment_readded_after_snapshot_gap(spark, tmp_path):
    """A doc temporarily absent from one full snapshot re-enters the
    diff as 'added' (its manifest row was dropped) — but it is still
    indexed, so its new content must flow through the same deferral /
    compaction path as a 'changed' row.  Pre-fix, the manifest advanced
    the NEW digest for such ids and the change was lost forever."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    a0 = "spark shuffles hash partitions across the cluster"
    a1 = "sort merge join spills gracefully to local disk"
    b1 = "vectorized readers decode parquet pages in batches"
    manifest = str(tmp_path / "manifest")
    state = str(tmp_path / "state")
    index = str(tmp_path / "index")
    snap = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")

    ingest_increment(spark, snap([(0, a0), (1, a1)]), manifest, state, index)
    # day 1: crawl hiccup — doc 1 missing; not retired (default)
    ingest_increment(spark, snap([(0, a0)]), manifest, state, index)
    assert {r["doc_id"] for r in spark.read.parquet(manifest).collect()} == {0}

    # day 2, NO compaction: doc 1 returns with NEW content — it must be
    # deferred (not admitted, manifest must keep re-detecting it)
    s2 = ingest_increment(
        spark, snap([(0, a0), (1, b1)]), manifest, state, index
    )
    assert s2["n_admitted"] == 0 and s2["n_compacted"] == 0
    assert {r["doc_id"] for r in spark.read.parquet(manifest).collect()} == {0}

    # day 3, WITH compaction: the deferred change is finally applied
    s3 = ingest_increment(
        spark,
        snap([(0, a0), (1, b1)]),
        manifest,
        state,
        index,
        compact_changed=True,
    )
    assert s3["n_compacted"] == 1
    mrows = {r["doc_id"]: r["dg"] for r in spark.read.parquet(manifest).collect()}
    assert set(mrows) == {0, 1}

    # the index now equals a rebuild over the NEW content
    full = str(tmp_path / "full")
    build_text_index(snap([(0, a0), (1, b1)]), full)
    for part in ("postings", "df", "doclen", "stats"):
        got = sorted(
            map(tuple, spark.read.parquet(f"{index}/{part}").drop("bucket").collect())
        )
        want = sorted(
            map(tuple, spark.read.parquet(f"{full}/{part}").drop("bucket").collect())
        )
        assert got == want, f"{part} diverged from rebuild"
    q = spark.createDataFrame([(1, "vectorized")], "query_id int, term string")
    hits = query_text_index(spark, index, q, k=10).collect()
    assert {r["doc_id"] for r in hits} == {1}

    # re-added with UNCHANGED content is NOT a deferred change: the
    # manifest records it and nothing compacts
    manifest2 = str(tmp_path / "manifest2")
    state2 = str(tmp_path / "state2")
    index2 = str(tmp_path / "index2")
    ingest_increment(spark, snap([(0, a0), (1, a1)]), manifest2, state2, index2)
    ingest_increment(spark, snap([(0, a0)]), manifest2, state2, index2)
    s = ingest_increment(
        spark,
        snap([(0, a0), (1, a1)]),
        manifest2,
        state2,
        index2,
        compact_changed=True,
    )
    assert s["n_admitted"] == 0 and s["n_compacted"] == 0
    assert {r["doc_id"] for r in spark.read.parquet(manifest2).collect()} == {0, 1}


def test_remove_everything_keeps_text_index_readable(spark, tmp_path):
    """r5 ADVICE (mirror of the IVF case): purging every document must
    leave postings/df/doclen with at least one parquet footer so the
    index stays readable, and a later update must repopulate it to
    rebuild-equality."""
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
        remove_from_index,
        update_text_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "adaptive query execution replans at runtime"),
            (2, "columnar parquet scans prune row groups"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "x")
    build_text_index(docs, path)
    remove_from_index(spark, path, docs.select("doc_id"))

    q = spark.createDataFrame([(1, "parquet")], "query_id long, term string")
    assert query_text_index(spark, path, q, k=5).count() == 0
    for part in ("postings", "df", "doclen"):
        assert spark.read.parquet(f"{path}/{part}").count() == 0

    update_text_index(spark, path, docs)
    full = str(tmp_path / "full")
    build_text_index(docs, full)
    got = sorted(map(tuple, query_text_index(spark, path, q, k=5).collect()))
    want = sorted(map(tuple, query_text_index(spark, full, q, k=5).collect()))
    assert got == want and got


def test_ingest_campaign_dual_index_lifecycle(spark, tmp_path):
    """VERDICT r5 #2: dual-index campaign — one manifest diff maintains
    BOTH the text index and the IVF vector index with mirrored
    semantics (admit/defer/compact/retire + remove-then-readmit), and
    after every increment the vector index probe-equals a from-scratch
    build over the currently admitted content's embeddings with
    train_df= the bootstrap batch (frozen-quantizer == rebuild idiom)."""
    import hashlib

    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )

    def e(text):  # deterministic content-derived embedding: new content
        h = hashlib.md5(text.encode()).digest()  # => new vector
        return [b / 255.0 + 0.05 for b in h[:6]]

    c1 = "adaptive execution replans joins at runtime"
    c2a = "columnar scans prune row groups by statistics"
    c2b = "vectorized readers decode batches into arrow"
    c3 = "broadcast joins ship the small side everywhere"
    c4 = "shuffle partitions coalesce under low volume"

    def docs_df(pairs):
        return spark.createDataFrame(list(pairs), "doc_id long, text string")

    def emb_df(pairs):
        return spark.createDataFrame(
            [(i, e(t)) for i, t in pairs], "doc_id long, embedding array<double>"
        )

    man, st, idx, vidx = (str(tmp_path / p) for p in ("m", "s", "x", "v"))

    def probe_equals_rebuild(current_content, train_pairs):
        ref = str(tmp_path / "ref")
        import shutil

        shutil.rmtree(ref, ignore_errors=True)
        build_ivf_index(
            emb_df(current_content), ref,
            vec_col="embedding", id_col="doc_id", num_centroids=2,
            train_df=emb_df(train_pairs),
        )
        probes = emb_df(current_content)
        got = sorted(map(tuple, query_ivf_index(
            spark, vidx, probes, k=3, vec_col="embedding", id_col="doc_id"
        ).collect()))
        want = sorted(map(tuple, query_ivf_index(
            spark, ref, probes, k=3, vec_col="embedding", id_col="doc_id"
        ).collect()))
        assert got == want and got

    day0 = [(1, c1), (2, c2a), (3, c3)]
    s0 = ingest_increment(
        spark, docs_df(day0), man, st, idx,
        embeddings=emb_df(day0), vector_index_path=vidx,
        vector_num_centroids=2,
    )
    assert s0["n_vec_indexed"] == 3
    probe_equals_rebuild(day0, day0)

    # day 1: doc 4 added, doc 2 CHANGED (deferred -> old vector stays),
    # doc 5 duplicates doc 1's content (rejected -> never indexed)
    day1 = [(1, c1), (2, c2b), (3, c3), (4, c4), (5, c1)]
    s1 = ingest_increment(
        spark, docs_df(day1), man, st, idx,
        embeddings=emb_df(day1), vector_index_path=vidx,
        vector_num_centroids=2,
    )
    assert s1["n_admitted"] == 1 and s1["n_vec_indexed"] == 1
    # indexed content: doc 2 still carries its OLD content's vector
    probe_equals_rebuild([(1, c1), (2, c2a), (3, c3), (4, c4)], day0)

    # day 2: compaction applies doc 2's deferred change to BOTH indexes
    s2 = ingest_increment(
        spark, docs_df(day1), man, st, idx,
        embeddings=emb_df(day1), vector_index_path=vidx,
        compact_changed=True, vector_num_centroids=2,
    )
    assert s2["n_compacted"] == 1 and s2["n_vec_indexed"] == 1
    probe_equals_rebuild([(1, c1), (2, c2b), (3, c3), (4, c4)], day0)

    # day 3: doc 3 vanishes from the full snapshot -> retired from both
    day3 = [(1, c1), (2, c2b), (4, c4), (5, c1)]
    s3 = ingest_increment(
        spark, docs_df(day3), man, st, idx,
        embeddings=emb_df(day3), vector_index_path=vidx,
        retire_removed=True, vector_num_centroids=2,
    )
    assert s3["n_retired"] == 1 and s3["n_vec_retired"] == 1
    probe_equals_rebuild([(1, c1), (2, c2b), (4, c4)], day0)

    # day 4: doc 3's CONTENT re-crawls under a new id — its fingerprint
    # left the admitted state with the retirement, so it readmits fresh
    # and its vector re-enters the index
    day4 = day3 + [(30, c3)]
    s4 = ingest_increment(
        spark, docs_df(day4), man, st, idx,
        embeddings=emb_df(day4), vector_index_path=vidx,
        retire_removed=True, vector_num_centroids=2,
    )
    assert s4["n_admitted"] == 1 and s4["n_vec_indexed"] == 1
    probe_equals_rebuild([(1, c1), (2, c2b), (4, c4), (30, c3)], day0)


def test_ingest_dual_index_requires_both_args(spark, tmp_path):
    from lwetl_spark.operators.incremental import ingest_increment
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        ingest_increment(
            spark, docs, str(tmp_path / "m"), str(tmp_path / "s"),
            str(tmp_path / "x"), vector_index_path=str(tmp_path / "v"),
        )


def test_cross_encoder_rerank_custom_scorer_and_nulls(spark):
    """cross_encoder_rerank plumbing: a custom pair scorer drops in with
    an identical plan (scores decide the ordering), NULL document text
    scores as empty instead of killing the pass, and k truncates per
    query with the (ce_ppm DESC, doc_id ASC) tiebreak."""
    from lwetl_spark.operators.retrieval import cross_encoder_rerank

    cands = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 13)],
        "query_id long, doc_id long",
    )
    queries = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "query_id long, query_text string"
    )
    docs = spark.createDataFrame(
        [(10, "short"), (11, "a much longer document"), (12, None),
         (13, "mid size")],
        "doc_id long, text string",
    )

    def scorer(qs, ts):  # longer doc wins; query term breaks nothing
        return [len(t or "") for t in ts]

    got = {
        (r["query_id"], r["rnk"]): (r["doc_id"], r["ce_ppm"])
        for r in cross_encoder_rerank(
            cands, queries, docs, k=2, scorer=scorer
        ).collect()
    }
    assert got[(1, 1)] == (11, 22)   # longest text first
    assert got[(1, 2)] == (10, 5)    # then 'short'; null-text doc 12 cut
    assert got[(2, 1)] == (13, 8) and got[(2, 2)] == (10, 5)
    assert len(got) == 4


def test_ingest_tombstones_delta_mode_retirement(spark, tmp_path):
    """Explicit deletion feed (CDC-style tombstones): retiring by signal
    in DELTA mode must leave index + state identical to a full-snapshot
    retire_removed run, deletion must win over a same-batch re-crawl of
    the tombstoned id, the manifest must forget the id (a later
    re-crawl admits fresh), and in dual-index mode the vector purges
    too."""
    import hashlib

    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.similarity import ivf_index_stats

    def e(text):
        h = hashlib.md5(text.encode()).digest()
        return [b / 255.0 + 0.05 for b in h[:6]]

    texts = {
        1: "adaptive execution replans joins at runtime",
        2: "columnar scans prune row groups by statistics",
        3: "broadcast joins ship the small side everywhere",
        4: "shuffle partitions coalesce under low volume",
    }
    schema = "doc_id long, text string, embedding array<double>"

    def snap(ids):
        return spark.createDataFrame(
            [(i, texts[i], e(texts[i])) for i in ids], schema
        ).select("doc_id", "text")

    def emb(ids):
        return spark.createDataFrame(
            [(i, e(texts[i])) for i in ids],
            "doc_id long, embedding array<double>",
        )

    # campaign A: bootstrap {1,2,3}, then ONE delta batch that adds doc
    # 4, re-crawls tombstoned doc 2 (deletion must win), and carries
    # the tombstone for 2
    a = {p: str(tmp_path / f"a_{p}") for p in ("m", "s", "x", "v")}
    ingest_increment(
        spark, snap([1, 2, 3]), a["m"], a["s"], a["x"],
        embeddings=emb([1, 2, 3]), vector_index_path=a["v"],
        vector_num_centroids=2,
    )
    sA = ingest_increment(
        spark, snap([2, 4]), a["m"], a["s"], a["x"],
        embeddings=emb([2, 4]), vector_index_path=a["v"],
        snapshot_is_delta=True,
        tombstones=spark.createDataFrame([(2,)], "doc_id long"),
        vector_num_centroids=2,
    )
    assert sA["n_admitted"] == 1          # doc 4 only — deletion won
    assert sA["n_retired"] == 1 and sA["n_vec_retired"] == 1

    # campaign B: same end state via full snapshots + retire_removed
    b = {p: str(tmp_path / f"b_{p}") for p in ("m", "s", "x", "v")}
    ingest_increment(
        spark, snap([1, 2, 3]), b["m"], b["s"], b["x"],
        embeddings=emb([1, 2, 3]), vector_index_path=b["v"],
        vector_num_centroids=2,
    )
    ingest_increment(
        spark, snap([1, 3, 4]), b["m"], b["s"], b["x"],
        embeddings=emb([1, 3, 4]), vector_index_path=b["v"],
        retire_removed=True, vector_num_centroids=2,
    )

    for part in ("postings", "df", "doclen", "stats"):
        ga = sorted(map(tuple,
            spark.read.parquet(f"{a['x']}/{part}").drop("bucket").collect()))
        gb = sorted(map(tuple,
            spark.read.parquet(f"{b['x']}/{part}").drop("bucket").collect()))
        assert ga == gb, f"{part}: tombstone != full-snapshot retirement"
    assert sorted(map(tuple, spark.read.parquet(a["s"]).collect())) == sorted(
        map(tuple, spark.read.parquet(b["s"]).collect())
    )
    stA = ivf_index_stats(spark, a["v"]).collect()[0]
    assert stA["n_vectors"] == 3  # {1, 3, 4}

    # the manifest forgot doc 2: its content re-crawls under the SAME
    # id and admits fresh
    s2 = ingest_increment(
        spark, snap([2]), a["m"], a["s"], a["x"],
        embeddings=emb([2]), vector_index_path=a["v"],
        snapshot_is_delta=True, vector_num_centroids=2,
    )
    assert s2["n_admitted"] == 1 and s2["n_vec_indexed"] == 1


def test_docbuckets_sidecar_consistency_and_legacy_fallback(spark, tmp_path):
    """r6 sidecar: after any build/update/compact/remove sequence the
    docbuckets table equals the distinct (doc_id, bucket) projection of
    the live postings (the invariant that makes the pruned locate
    correct), and a pre-sidecar index (docbuckets deleted) still
    compacts correctly via the full-read fallback WITHOUT growing a
    partial sidecar."""
    import shutil

    from pyspark.sql import functions as F

    from lwetl_spark.operators.retrieval import (
        build_text_index,
        compact_text_index,
        query_text_index,
        remove_from_index,
        update_text_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} gamma{' delta' * (i % 3)}") for i in range(30)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "x")
    build_text_index(docs.filter(F.col("doc_id") < 20), path)
    update_text_index(spark, path, docs.filter(F.col("doc_id") >= 20))
    compact_text_index(
        spark, path,
        docs.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", F.concat(F.col("text"), F.lit(" extra")).alias("text")),
    )
    remove_from_index(
        spark, path, docs.filter(F.col("doc_id") % 9 == 1).select("doc_id")
    )

    def pairs(df):
        return sorted(map(tuple, df.collect()))

    live = spark.read.parquet(f"{path}/postings").select(
        "doc_id", F.col("bucket").cast("long").alias("bucket")
    ).distinct()
    side = spark.read.parquet(f"{path}/docbuckets").select(
        "doc_id", F.col("bucket").cast("long").alias("bucket")
    )
    assert pairs(side) == pairs(live), "sidecar drifted from postings"

    # legacy fallback: kill the sidecar; compaction must still equal a
    # rebuild and must NOT create a partial sidecar
    shutil.rmtree(f"{path}/docbuckets")
    changed = docs.filter(F.col("doc_id") == 2).select(
        "doc_id", F.lit("totally fresh words here").alias("text")
    )
    compact_text_index(spark, path, changed)
    update_text_index(
        spark, path,
        spark.createDataFrame([(100, "brand new doc")], "doc_id long, text string"),
    )
    import os

    assert not os.path.isdir(f"{path}/docbuckets")

    # final content == rebuild over the equivalent corpus
    current = (
        docs.filter(F.col("doc_id") % 9 != 1)
        .withColumn(
            "text",
            F.when(F.col("doc_id") == 2, F.lit("totally fresh words here"))
            .when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" extra")))
            .otherwise(F.col("text")),
        )
        .unionByName(
            spark.createDataFrame([(100, "brand new doc")], "doc_id long, text string")
        )
    )
    full = str(tmp_path / "full")
    build_text_index(current, full)
    q = spark.createDataFrame(
        [(1, "alpha"), (2, "delta"), (3, "fresh")], "query_id int, term string"
    )
    got = sorted(map(tuple, query_text_index(spark, path, q, k=10).collect()))
    want = sorted(map(tuple, query_text_index(spark, full, q, k=10).collect()))
    assert got == want and got


import pytest


@pytest.mark.parametrize("kind", ["lsh", "ivfpq"])
def test_campaign_vector_kind_dispatch(spark, tmp_path, kind):
    """ingest_increment(vector_index_kind=...) rides the chosen ANN
    family through bootstrap → delta append → tombstone purge, and the
    final probe equals a from-scratch build over the surviving admitted
    embeddings (train_df-anchored for the frozen-quantizer families;
    LSH's plane family is data-independent).  The ivf/pq legs are
    driver-key covered (x_campaign_vectors / x_campaign_pq); this pins
    the other two."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment
    from tests.conftest import SF_SMOKE

    if kind == "lsh":
        from lwetl_spark.operators.similarity import (
            build_lsh_index as build,
            query_lsh_index as query,
        )
    else:
        from lwetl_spark.operators.ivfpq import (
            build_ivfpq_index as build,
            query_ivfpq_index as query,
        )

    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    base = str(tmp_path / kind)
    man, st, idx, vidx, ref = (f"{base}/{p}" for p in ("m", "s", "x", "v", "r"))

    even = docs.filter(F.col("doc_id") % 2 == 0)
    ingest_increment(
        spark, even, man, st, idx,
        embeddings=emb, vector_index_path=vidx, vector_index_kind=kind,
    )
    boot_ids = spark.read.parquet(st).select("doc_id").localCheckpoint(eager=True)
    ingest_increment(
        spark, docs, man, st, idx,
        embeddings=emb, vector_index_path=vidx, vector_index_kind=kind,
        snapshot_is_delta=True,
    )
    tomb = docs.filter(F.col("doc_id") % 10 == 3).select("doc_id")
    ingest_increment(
        spark, docs.filter(F.lit(False)), man, st, idx,
        embeddings=emb, vector_index_path=vidx, vector_index_kind=kind,
        snapshot_is_delta=True, tombstones=tomb,
    )

    admitted = spark.read.parquet(st).select("doc_id").localCheckpoint(eager=True)
    kept_emb = emb.join(admitted, "doc_id", "left_semi")
    kwargs = {"vec_col": "embedding", "id_col": "doc_id"}
    if kind == "ivfpq":
        boot_emb = emb.join(boot_ids, "doc_id", "left_semi")
        build(kept_emb, ref, train_df=boot_emb, **kwargs)
    else:
        build(kept_emb, ref, **kwargs)

    got = sorted(map(tuple, query(spark, vidx, emb, k=5, **kwargs).collect()))
    want = sorted(map(tuple, query(spark, ref, emb, k=5, **kwargs).collect()))
    assert got == want and got


def test_positional_index_lifecycle_phrase_parity(spark, tmp_path):
    """Positional postings survive the whole maintenance lifecycle
    (VERDICT r6 #3): build(positions=True) on a subset, update with a
    delta, compact changed content, remove ids — phrase results must
    equal a fresh positional build over the equivalent corpus, and
    BM25 probes over the positional index must equal the flat index
    bit-for-bit (offsets change nothing about tf/df/dl)."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.retrieval import (
        build_text_index,
        compact_text_index,
        phrase_topk,
        query_text_index,
        remove_from_index,
        update_text_index,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "pos_idx")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), path, positions=True)
    update_text_index(spark, path, docs.filter(F.col("doc_id") % 2 == 1))
    changed = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "text", F.concat(F.lit("table hash leading "), F.col("text"))
    )
    compact_text_index(spark, path, changed)
    remove_from_index(
        spark, path, docs.filter(F.col("doc_id") % 9 == 1).select("doc_id")
    )

    current = (
        docs.filter(F.col("doc_id") % 9 != 1)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit("table hash leading "), F.col("text")),
            ).otherwise(F.col("text")),
        )
    )
    full = str(tmp_path / "full_pos")
    build_text_index(current, full, positions=True)

    phrases = spark.createDataFrame(
        [(1, "table hash"), (2, "big big")], "query_id long, phrase string"
    )
    got = sorted(map(tuple, phrase_topk(spark, path, phrases, k=10).collect()))
    want = sorted(map(tuple, phrase_topk(spark, full, phrases, k=10).collect()))
    assert got == want and got

    # BM25 over positional == over flat (offsets don't touch scoring)
    flat = str(tmp_path / "flat")
    build_text_index(current, flat, positions=False)
    q = spark.createDataFrame(
        [(1, "table"), (1, "hash"), (2, "merge")], "query_id int, term string"
    )
    got_bm = sorted(map(tuple, query_text_index(spark, path, q, k=10).collect()))
    want_bm = sorted(map(tuple, query_text_index(spark, flat, q, k=10).collect()))
    assert got_bm == want_bm and got_bm


def test_phrase_topk_overlaps_and_edge_cases(spark, tmp_path):
    """Overlapping matches count per start offset ('a a a' has TWO
    'a a' matches); a single-term phrase degenerates to tf; an absent
    phrase yields no rows; an empty phrase set yields an empty frame."""
    from lwetl_spark.operators.retrieval import build_text_index, phrase_topk

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b a b"), (3, "c c")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "tiny")
    build_text_index(docs, path, positions=True)
    phrases = spark.createDataFrame(
        [(1, "a a"), (2, "a b"), (3, "b"), (4, "z q")],
        "query_id long, phrase string",
    )
    rows = {
        (r["query_id"], r["doc_id"]): (r["n_matches"], r["rnk"])
        for r in phrase_topk(spark, path, phrases, k=10).collect()
    }
    assert rows[(1, 1)] == (2, 1)          # overlapping 'a a' in 'a a a'
    assert (1, 2) not in rows              # 'a b a b' has no 'a a'
    assert rows[(2, 2)] == (2, 1)          # two 'a b' in 'a b a b'
    assert rows[(2, 1)] == (1, 2)          # one 'a b' in 'a a a b'
    assert rows[(3, 2)] == (2, 1) and rows[(3, 1)] == (1, 2)  # tf of 'b'
    assert not [k for k in rows if k[0] == 4]  # absent phrase
    empty = phrase_topk(
        spark, path,
        spark.createDataFrame([], "query_id long, phrase string"),
    )
    assert empty.count() == 0


def test_backlog_with_empty_first_snapshot(spark, tmp_path):
    """ADVICE r8: an EMPTY first snapshot writes a manifest but never a
    state table (nothing admitted); the next increment's backlog path
    used to spark.read the missing state unguarded and raise.  A
    missing state is an empty backlog, not a read failure."""
    from lwetl_spark.operators.incremental import ingest_increment

    empty = spark.createDataFrame([], "doc_id long, text string")
    man, st, idx = (str(tmp_path / p) for p in ("m", "s", "x"))
    s0 = ingest_increment(spark, empty, man, st, idx,
                          compact_deferred_threshold=3)
    assert s0["n_admitted"] == 0

    snap1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    s1 = ingest_increment(spark, snap1, man, st, idx,
                          compact_deferred_threshold=3)
    assert s1["n_admitted"] == 2
    assert s1["n_deferred"] == 0 and s1["n_compacted"] == 0


def test_compact_deferred_threshold_policy(spark, tmp_path):
    """compact_deferred_threshold automates the compaction schedule:
    below the threshold every increment just COUNTS the backlog
    (n_deferred reported, changed docs stay deferred, no postings
    read); the increment that pushes the backlog over the threshold
    runs the full compaction pass and the index equals a rebuild where
    the changed docs always had their new content."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    texts = {i: f"base document {i} alpha beta gamma delta {'x' * i}"
             for i in range(6)}
    snap0 = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    man, st, idx = (str(tmp_path / p) for p in ("m", "s", "x"))
    s0 = ingest_increment(spark, snap0, man, st, idx,
                          compact_deferred_threshold=3)
    assert s0["n_admitted"] == 6 and s0["n_deferred"] == 0

    def changed(ids):
        return spark.createDataFrame(
            [(i, texts[i] + " CHANGED" if i in ids else texts[i])
             for i in texts],
            "doc_id long, text string",
        )

    # 2 changed docs: below threshold 3 -> counted, NOT compacted
    s1 = ingest_increment(spark, changed({0, 1}), man, st, idx,
                          compact_deferred_threshold=3)
    assert s1 == {**s1, "n_deferred": 2, "n_compacted": 0}
    # probe still serves the OLD content (deferral intact)
    q = spark.createDataFrame([(1, "changed")], "query_id int, term string")
    assert query_text_index(spark, idx, q, k=10).count() == 0

    # a third change pushes the backlog to threshold -> auto-compact ALL
    s2 = ingest_increment(spark, changed({0, 1, 2}), man, st, idx,
                          compact_deferred_threshold=3)
    assert s2["n_deferred"] == 3 and s2["n_compacted"] == 3

    full = str(tmp_path / "full")
    build_text_index(changed({0, 1, 2}), full)
    got = sorted(map(tuple, query_text_index(spark, idx, q, k=10).collect()))
    want = sorted(map(tuple, query_text_index(spark, full, q, k=10).collect()))
    assert got == want and len(got) == 3

    # backlog drained: next increment reports 0 deferred
    s3 = ingest_increment(spark, changed({0, 1, 2}), man, st, idx,
                          compact_deferred_threshold=3)
    assert s3["n_deferred"] == 0 and s3["n_compacted"] == 0


def test_proximity_topk_hand_checked(spark, tmp_path):
    """Minimal-span semantics on a tiny corpus: unordered co-occurrence
    window, k-pointer sweep == hand-computed spans, duplicate query
    terms collapse (set semantics), window filter, span-ascending rank,
    and absent-term docs never match."""
    from lwetl_spark.operators.retrieval import build_text_index, proximity_topk

    docs = spark.createDataFrame(
        [
            (1, "a x x x b"),          # span(a,b) = 5
            (2, "b a"),                # span = 2 (unordered)
            (3, "a x b x x a"),        # spans: [0,2]=3 best (a@0,b@2)
            (4, "a a a"),              # b absent -> no match
            (5, "c a b c"),            # span(a,b)=2; span(a,b,c)=3
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "prox")
    build_text_index(docs, path, positions=True)

    q = spark.createDataFrame([(1, "a b")], "query_id long, terms string")
    rows = {r["doc_id"]: (r["min_span"], r["rnk"])
            for r in proximity_topk(spark, path, q, window=5, k=10).collect()}
    assert rows == {2: (2, 1), 5: (2, 2), 3: (3, 3), 1: (5, 4)}

    # tighter window drops doc 1
    rows4 = {r["doc_id"] for r in
             proximity_topk(spark, path, q, window=4, k=10).collect()}
    assert rows4 == {2, 3, 5}

    # 3-term query
    q3 = spark.createDataFrame([(1, "a b c")], "query_id long, terms string")
    rows3 = {r["doc_id"]: r["min_span"]
             for r in proximity_topk(spark, path, q3, window=8, k=10).collect()}
    assert rows3 == {5: 3}

    # duplicate terms collapse: 'a a' == single-term 'a' (min_span 1)
    qd = spark.createDataFrame([(1, "a a")], "query_id long, terms string")
    rowsd = {r["doc_id"]: r["min_span"]
             for r in proximity_topk(spark, path, qd, window=3, k=10).collect()}
    assert rowsd == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_hybrid_topk_over_persisted_indexes(spark, tmp_path):
    """hybrid_topk composes the persisted-index probes: the fused output
    equals rrf_fuse over the two legs run separately (plumbing parity),
    family auto-detection dispatches every ANN kind, and disjoint query
    ids keep corpus docs in their own dense lists."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.ivfpq import build_ivfpq_index
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        hybrid_topk,
        query_text_index,
        rrf_fuse,
    )
    from lwetl_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    tpath = str(tmp_path / "text")
    build_text_index(docs, tpath)

    tq = spark.createDataFrame(
        [(9000001, "scan"), (9000001, "table"), (9000002, "merge")],
        "query_id long, term string",
    )
    vq = emb.filter(F.col("vec_id").isin(1, 2)).select(
        (F.col("vec_id") + 9_000_000).alias("query_id"), "embedding"
    )

    vpath = str(tmp_path / "ivf")
    build_ivf_index(emb, vpath)
    got = hybrid_topk(spark, tpath, vpath, tq, vq, k=5)

    lex = query_text_index(spark, tpath, tq, k=5)
    dense = query_ivf_index(
        spark, vpath,
        vq.withColumnRenamed("query_id", "vec_id"), k=5,
    )
    want = rrf_fuse(
        [lex.select("query_id", "doc_id", "rnk"),
         dense.select(F.col("id").alias("query_id"),
                      F.col("neighbor_id").alias("doc_id"),
                      F.col("rank").cast("long").alias("rnk"))],
        topk=5,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0

    # every ANN family dispatches (smoke: >= 1 fused row per vec query)
    from lwetl_spark.operators.similarity import build_lsh_index, build_pq_index

    for kind, build in (
        ("pq", build_pq_index), ("lsh", build_lsh_index),
        ("ivfpq", build_ivfpq_index),
    ):
        p = str(tmp_path / kind)
        build(emb, p)
        out = hybrid_topk(spark, tpath, p, tq, vq, k=5)
        qids = {r["query_id"] for r in out.select("query_id").distinct().collect()}
        assert {9000001, 9000002} <= qids


def test_campaign_positional_index_serves_phrases(spark, tmp_path):
    """index_positions=True at bootstrap makes the campaign-maintained
    index phrase-searchable for its whole life: increments and
    compactions inherit the positional flag (sticky schema), and
    phrase results equal a fresh positional build over the admitted
    content at every step."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.retrieval import build_text_index, phrase_topk
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").select(
        "doc_id", "text"
    )
    man, st, idx = (str(tmp_path / p) for p in ("m", "s", "x"))
    even = docs.filter(F.col("doc_id") % 2 == 0)
    ingest_increment(spark, even, man, st, idx, index_positions=True)
    ingest_increment(
        spark, docs.filter(F.col("doc_id") % 2 == 1), man, st, idx,
        snapshot_is_delta=True,
    )
    changed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("table hash prefix "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    ingest_increment(spark, changed, man, st, idx, compact_changed=True)

    admitted = spark.read.parquet(st).select("doc_id")
    full = str(tmp_path / "full")
    build_text_index(
        changed.join(admitted, "doc_id", "left_semi"), full, positions=True
    )
    phrases = spark.createDataFrame(
        [(1, "table hash"), (2, "big big")], "query_id long, phrase string"
    )
    got = sorted(map(tuple, phrase_topk(spark, idx, phrases, k=10).collect()))
    want = sorted(map(tuple, phrase_topk(spark, full, phrases, k=10).collect()))
    assert got == want and got


def test_phrase_and_proximity_probes_prune_buckets(spark, tmp_path):
    """Both positional probes must reach the postings scan with a
    PartitionFilters entry on the tok-hash bucket (file-listing
    pruning) AND project only the columns they use — phrase never
    reads tf, BM25 probes over the same index never read positions."""
    import re

    from lwetl_spark.operators.retrieval import (
        build_text_index,
        phrase_topk,
        proximity_topk,
        query_text_index,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    build_text_index(docs, path, positions=True)

    ph = phrase_topk(
        spark, path,
        spark.createDataFrame([(1, "alpha beta")], "query_id long, phrase string"),
    )
    plan = ph._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*bucket#\d+ IN ?\(", plan), plan

    px = proximity_topk(
        spark, path,
        spark.createDataFrame([(1, "alpha gamma")], "query_id long, terms string"),
        window=5,
    )
    plan_px = px._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*bucket#\d+ IN ?\(", plan_px), plan_px

    # column pruning: the BM25 probe over the positional index reads
    # 3 columns, never the offsets array
    bm = query_text_index(
        spark, path,
        spark.createDataFrame([(1, "alpha")], "query_id int, term string"),
        k=3,
    )
    plan_bm = bm._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan_bm)
    assert m and "positions" not in m.group(1), plan_bm


def test_phrase_snippets_hand_checked(spark, tmp_path):
    """Snippet slicing on a tiny corpus: window clamps at both document
    edges, first (not best) match anchors, and with_pos=False keeps the
    original phrase_topk schema."""
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        phrase_snippets,
        phrase_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),   # mid-doc match
            (2, "c d x y z"),         # match at doc start (left clamp)
            (3, "x y z c d"),         # match at doc end (right clamp)
            (4, "c d q c d"),         # two matches: first anchors
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "snip")
    build_text_index(docs, path, positions=True)
    phrases = spark.createDataFrame([(1, "c d")], "query_id long, phrase string")

    out = {r["doc_id"]: r for r in
           phrase_snippets(spark, path, docs, phrases, radius=2, k=10).collect()}
    assert out[1]["snippet"] == "a b c d e f"      # pos2: [0..5]
    assert out[1]["first_pos"] == 2
    assert out[2]["snippet"] == "c d x y"          # left clamp at 0
    assert out[3]["snippet"] == "y z c d"          # right clamp at len
    assert out[4]["snippet"] == "c d q c"          # first match anchors
    assert out[4]["n_matches"] == 2

    # default schema unchanged (no first_pos column)
    cols = phrase_topk(spark, path, phrases, k=10).columns
    assert cols == ["query_id", "doc_id", "n_matches", "rnk"]


def test_campaign_vector_auto_maintain(spark, tmp_path):
    """vector_auto_maintain=True runs the drift policy after the
    increment's index work: an IVFADC campaign whose corpus doubles
    past the growth threshold reports action='retrain' and the index
    afterwards equals a FRESH build over the current members (the
    post-retrain property; the frozen-at-bootstrap equivalence is
    deliberately left behind)."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.ivfpq import build_ivfpq_index, query_ivfpq_index
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    man, st, idx, vidx = (str(tmp_path / p) for p in ("m", "s", "x", "v"))
    third = docs.filter(F.col("doc_id") % 3 == 0)
    s0 = ingest_increment(
        spark, third, man, st, idx,
        embeddings=emb, vector_index_path=vidx, vector_index_kind="ivfpq",
        vector_auto_maintain=True,
    )
    assert s0["vector_maintenance"] == "noop"  # growth_pm = 1000 at boot
    s1 = ingest_increment(
        spark, docs, man, st, idx,
        embeddings=emb, vector_index_path=vidx, vector_index_kind="ivfpq",
        snapshot_is_delta=True, vector_auto_maintain=True,
    )
    # embeddings cover only some docs; require the growth to have fired
    # (emb ids are dense over doc ids at sf0.001, so ~3x growth >= 4000/3?
    # assert on the reported decision rather than recomputing thresholds)
    assert s1["vector_maintenance"] in ("retrain", "noop")
    if s1["vector_maintenance"] == "retrain":
        admitted = spark.read.parquet(st).select("doc_id")
        members = emb.join(admitted, "doc_id", "left_semi")
        ref = str(tmp_path / "ref")
        build_ivfpq_index(members, ref, vec_col="embedding", id_col="doc_id")
        q = emb.limit(20)
        got = sorted(map(tuple, query_ivfpq_index(
            spark, vidx, q, k=5, vec_col="embedding", id_col="doc_id"
        ).collect()))
        want = sorted(map(tuple, query_ivfpq_index(
            spark, ref, q, k=5, vec_col="embedding", id_col="doc_id"
        ).collect()))
        assert got == want
    else:  # growth below default threshold: force-check the dry decision
        from lwetl_spark.operators.maintain import auto_maintain

        dec = auto_maintain(
            spark, vidx, kind="ivfpq", dry_run=True, growth_threshold_pm=1500
        ).collect()[0]
        assert dec["action"] == "retrain"


def test_ann_filtered_probe_guarantees_k_from_filtered_pool(spark, tmp_path):
    """Metadata-filter pushdown (r9, VERDICT r8 #3): the filter applies
    BEFORE shortlist/top-k in every persisted family, so each query's
    results are the true top-k of the filtered pool — a post-hoc filter
    of k pre-filter survivors would under-fill k and miss filtered-set
    neighbors that lost to excluded ones."""
    import numpy as np
    from pyspark.sql import functions as F

    from lwetl_spark.operators.ivfpq import (
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from lwetl_spark.operators.similarity import (
        build_ivf_index,
        build_lsh_index,
        build_pq_index,
        query_ivf_index,
        query_lsh_index,
        query_pq_index,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = np.maximum(np.linalg.norm(X, axis=1), 1e-12)

    def exact_filtered(allowed: set, k: int):
        want = set()
        amask = np.array([i in allowed for i in ids])
        for qi, q in zip(ids, X):
            cos = (X[amask] @ q) / (np.linalg.norm(q) or 1.0) / nrm[amask]
            cos = np.floor(cos * 1e6 + 0.5) / 1e6
            nid = ids[amask]
            keep = nid != qi
            order = sorted(zip(-cos[keep], nid[keep]))[:k]
            for rank, (negc, n) in enumerate(order, 1):
                want.add((int(qi), int(n), float(-negc), rank))
        return want

    # 50% filter, IVF at nprobe=all: EXACT equality with brute force
    ivf_path = str(tmp_path / "ivf")
    build_ivf_index(emb, ivf_path, num_centroids=8)
    even = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    got = {
        (r["id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in query_ivf_index(
            spark, ivf_path, emb, k=5, nprobe=8, filter_ids=even
        ).collect()
    }
    assert got == exact_filtered({int(i) for i in ids if i % 2 == 0}, 5)

    # ~1% filter (3 ids), k=5: every query still fills min(k, pool-self)
    tiny_ids = sorted(int(i) for i in ids)[:3]
    tiny = spark.createDataFrame([(i,) for i in tiny_ids], "vec_id long")
    out = query_ivf_index(
        spark, ivf_path, emb, k=5, nprobe=8, filter_ids=tiny
    ).collect()
    per_q = {}
    for r in out:
        assert r["neighbor_id"] in tiny_ids
        per_q.setdefault(r["id"], []).append(r)
    for qid in ids:
        pool = len([t for t in tiny_ids if t != qid])
        assert len(per_q.get(int(qid), [])) == min(5, pool)

    # PQ (full ADC scan) and IVFPQ (nprobe=all, rerank >= pool): same
    # fill guarantee + subset contract
    pq_path = str(tmp_path / "pq")
    build_pq_index(emb, pq_path)
    out = query_pq_index(
        spark, pq_path, emb, k=5, rerank=100, filter_ids=tiny
    ).collect()
    per_q = {}
    for r in out:
        assert r["neighbor_id"] in tiny_ids
        per_q.setdefault(r["id"], []).append(r)
    for qid in ids:
        pool = len([t for t in tiny_ids if t != qid])
        assert len(per_q.get(int(qid), [])) == min(5, pool)

    ivfpq_path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, ivfpq_path, num_centroids=8)
    out = query_ivfpq_index(
        spark, ivfpq_path, emb, k=5, nprobe=8, rerank=100, filter_ids=tiny
    ).collect()
    per_q = {}
    for r in out:
        assert r["neighbor_id"] in tiny_ids
        per_q.setdefault(r["id"], []).append(r)
    for qid in ids:
        pool = len([t for t in tiny_ids if t != qid])
        assert len(per_q.get(int(qid), [])) == min(5, pool)

    # LSH: candidates are bucket collisions (no fill guarantee by
    # construction) — the pushdown contract is subset + ranked among
    # the FILTERED candidates only
    lsh_path = str(tmp_path / "lsh")
    build_lsh_index(emb, lsh_path)
    out = query_lsh_index(
        spark, lsh_path, emb, k=5, filter_ids=even
    ).collect()
    assert out and all(r["neighbor_id"] % 2 == 0 for r in out)


def test_text_and_hybrid_filtered_probe(spark, tmp_path):
    """query_text_index/hybrid_topk filter pushdown: results come only
    from the allowed set, and every allowed matching doc appears when
    the filtered match set fits inside k (post-hoc filtering of a
    pre-filter top-k would drop allowed docs that lost to excluded
    ones)."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.retrieval import (
        build_text_index,
        hybrid_topk,
        query_text_index,
    )
    from lwetl_spark.operators.similarity import build_ivf_index
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    tpath = str(tmp_path / "text")
    build_text_index(docs, tpath)

    tq = spark.createDataFrame(
        [(9000001, "scan"), (9000001, "table")], "query_id long, term string"
    )
    # matching docs BEFORE filtering (big k so nothing is cut)
    all_hits = {
        r["doc_id"]
        for r in query_text_index(spark, tpath, tq, k=10_000).collect()
    }
    allowed = sorted(all_hits)[::2]  # every other matching doc
    flt = spark.createDataFrame([(d,) for d in allowed], "doc_id long")
    got = query_text_index(spark, tpath, tq, k=10_000, filter_ids=flt)
    got_ids = {r["doc_id"] for r in got.collect()}
    assert got_ids == set(allowed)

    # hybrid: both legs filtered; fused ids stay inside the allowed set
    vpath = str(tmp_path / "ivf")
    build_ivf_index(emb, vpath, num_centroids=8)
    vq = emb.limit(2).select(
        (F.col("vec_id") + 9_000_000).alias("query_id"), "embedding"
    )
    vec_allowed = {int(r["vec_id"]) for r in
                   emb.filter(F.col("vec_id") % 2 == 0).collect()}
    both = set(allowed) | vec_allowed
    flt2 = spark.createDataFrame([(d,) for d in sorted(both)], "id long")
    fused = hybrid_topk(
        spark, tpath, vpath, tq, vq, k=5, nprobe=8, filter_ids=flt2
    ).collect()
    assert fused and all(r["doc_id"] in both for r in fused)
