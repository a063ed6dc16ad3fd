#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed to full materialization (count of collected rows) —
no caching between queries beyond the shared SparkSession/JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline suite — one per operator family (scan+join+agg, window, hash,
#: dedup exact/minhash, similarity, json, time windows, sessionization)
HEADLINE = [
    "q1_flagship",
    "a2_sum_q1",
    "a4_groupby_having",
    "j4_derived_join",
    "o1_orderby_limit",
    "w1_running_total",
    "f1_md5_row_hash",
    "x_dedup_exact",
    "x_dedup_minhash",
    "x_cosine_topk",
    "x_json_extract",
    "x_tumbling_window",
    "x_sessionize",
    "x_corpus_pipeline",
]


def _minhash_pairs(spark, sf_dir):
    """Bench surface for x_dedup_minhash: the raw MinHash+LSH pair
    operator.  The queries() entry of the same name wraps this in a
    recall contract (it also brute-forces the exact pair set for the
    oracle) — benching that would time the verification harness, not
    the engine; this override keeps the benched workload identical to
    BASELINE's."""
    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        num_hashes=32,
        bands=8,
        shingle_n=3,
        threshold=0.3,
    )


#: extended suite (VERDICT r4 #3) — the heavy r3/r4 operators whose
#: regressions would matter at 100 TB and which the r01-frozen HEADLINE
#: can't see: lexical retrieval, PQ-ANN, dup-clustering (CC), blocked
#: fuzzy join, IRLS quality model, and the composed curate chain.
#: Timed under the same best-of-N protocol; reported under "extended"
#: in the same JSON line so BENCH_rN archives both, round-comparable.
EXTENDED = [
    "x_bm25",
    "x_ann_pq",
    "x_dedup_clusters",
    "x_fuzzy_join",
    "x_quality_logreg",
    "curate_chain",
    # retrieve -> fuse -> re-rank composition (r6): BM25 + dense legs,
    # RRF, cross-encoder-style pair scoring — the full hybrid pipeline
    "x_rerank",
    # incremental-campaign spine (VERDICT r5 #3): the lifecycle costs a
    # daily-crawl deployment actually pays, tracked round-over-round
    # like the heavy queries instead of living only in SCALE.md probes.
    # All three run the DUAL-index form (text + IVF vector index).
    "campaign_bootstrap",
    "campaign_increment",
    "campaign_compact",
    # r7 additions: the composed IVFADC probe path and the
    # auto-maintenance retrain pass (drifted-index template, hardlink
    # copy per run — the campaign-row protocol)
    "x_ann_ivfpq",
    "auto_maintain",
    # r7: persisted-index PROBE costs (build-once templates outside the
    # timed window — these rows time what a serving deployment pays per
    # query batch, not the amortized build)
    "phrase_probe",
    "hybrid_probe",
    # r7: the media family's end-to-end pass (synthesize real containers
    # + parse/validate them — generation and decode are both Arrow work,
    # so the row tracks the multimodal ingest gate's throughput).  r8:
    # the fixture gained the MP4 leg, so this row now times the video
    # census too — expect a one-round step-up, explained here.
    "x_media_meta",
    # r8: baseline JPEG entropy decode (the slowest per-item media pass:
    # bit-serial Huffman + IDCT per image) and the corpus bigram-LM
    # perplexity scorer (hash-keyed exchanges, feeds --ppl-filter)
    "x_jpeg_pixels",
    "x_doc_ppl",
    # r9: chroma-subsampled (4:2:0) color decode — 6 blocks per MCU, so
    # per-image cost is ~1.5x the 4:4:4 path at equal pixel count; the
    # EBML census (cheap varint walk, the mp4_meta analog); and the
    # metadata-filtered IVF probe (build + filtered nprobe=all probe —
    # times the semi-join pushdown against the exact-probe baseline)
    "x_jpeg_420",
    "x_mkv_meta",
    "x_ann_filtered",
    # r9 late additions: multi-scan progressive decode (the slowest
    # JPEG path: 4 entropy scans per image) and sub-document dedup
    # with reassembly (two corpus-keyed shuffles)
    "x_jpeg_progressive",
    "x_paragraph_dedup",
    # r9 format-ledger closers: GIF-LZW frame decode (bit-serial like
    # the JPEG rows, × n_frames), 16-bit PNG (double-width scanlines),
    # PDF text extraction (zlib inflate + content-stream parse), and
    # ZIP member extraction (inflate + CRC per member)
    "x_gif_pixels",
    "x_png_16bit",
    "x_pdf_text",
    "x_zip_extract",
    # r10 additions: the LAION-style WARC pair mine (census gate ->
    # decode -> dhash collapse -> caption campaign, the flagship
    # composition), banded perceptual near-dup pairs, PDF embedded-
    # image decode (DCT + Flate rasters), and the widened TIFF decode
    # (multi-strip / LZW / PackBits / predictor)
    "x_imgtext_pairs",
    "x_dhash_neardup",
    "x_pdf_images",
    "x_tiff_pixels",
    # r11: the 8-band radius-6 perceptual variant (2x band rows vs the
    # 4-band row above — tracks the wider-radius candidate fan-in)
    "x_dhash_neardup_r6",
    # late r11: the crawl-frontier chain — href harvest + RFC 3986
    # resolution + SURT keying (one map-only codegen pass) into the
    # per-urlkey first-witness dedup window (the one inherent shuffle)
    "x_crawl_frontier",
]

#: VERDICT r8 "what's wrong" #3: when a fixture generator (or the
#: operator behind an existing bench name) changes the WORKLOAD timed
#: under that name, list the name here for one round so round-over-round
#: regression triage stays mechanical.  r11: x_pdf_text gained the
#: modern xref-stream/ObjStm legs (id%5==2 now pays an extra inflate
#: + ObjStm walk), x_tiff_pixels gained 1-bit CCITT G4 pages
#: ((id+p)%4==3 — pure-Python MMR decode, expect a step-up),
#: x_pdf_images gained the CCITT leg ((id+k)%8==4) — both later also
#: the mixed 2-D G3 (/K>0, T4Options) legs — and
#: x_imgtext_pairs routes HTML through the charset sniffer with
#: rotating cp1252/gb18030 fixture encodings.  Late-r11: x_zip_extract's
#: member-method rotation widened from %3 to %4 adding REAL zstd
#: members (Arrow's bundled libzstd); x_warc_records (not a bench
#: row) also gained a .warc.zst framing leg.
FIXTURE_CHANGED: list[str] = [
    "x_pdf_text", "x_tiff_pixels", "x_pdf_images", "x_imgtext_pairs",
    "x_zip_extract",
]


#: text (positional) + IVF index templates for the probe rows, built
#: once per sf_dir outside the timed window
_RETR_TEMPLATES: dict[str, str] = {}


def _retr_template(spark, sf_dir) -> str:
    import tempfile

    key = os.path.realpath(sf_dir)
    if key not in _RETR_TEMPLATES:
        from lwetl_spark.catalog import load_table
        from lwetl_spark.operators.retrieval import build_text_index
        from lwetl_spark.operators.similarity import build_ivf_index

        base = tempfile.mkdtemp(prefix="bench_retr_tmpl_")
        build_text_index(
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
            f"{base}/text", positions=True,
        )
        build_ivf_index(load_table(spark, sf_dir, "embeddings"), f"{base}/vec")
        _RETR_TEMPLATES[key] = base
    return _RETR_TEMPLATES[key]


def _phrase_probe(spark, sf_dir):
    """Serving cost of exact-phrase search: bucket-pruned positional
    postings fetch + offset-array adjacency fold + salted top-k."""
    from lwetl_spark.operators.retrieval import phrase_topk

    base = _retr_template(spark, sf_dir)
    phrases = spark.createDataFrame(
        [(1, "table hash"), (2, "merge group"), (3, "big big"),
         (4, "fast order group")],
        "query_id long, phrase string",
    )
    return phrase_topk(spark, f"{base}/text", phrases, k=10)


def _hybrid_probe(spark, sf_dir):
    """Serving cost of hybrid retrieval: BM25 bucket-pruned probe +
    IVF nprobe cell probe + RRF fusion, per query batch."""
    from pyspark.sql import functions as F

    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.retrieval import hybrid_topk

    base = _retr_template(spark, sf_dir)
    tq = spark.createDataFrame(
        [(9000001, "scan"), (9000001, "table"),
         (9000002, "merge"), (9000002, "sort"), (9000002, "window"),
         (9000003, "hash"), (9000003, "part")],
        "query_id long, term string",
    )
    vq = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isin(1, 2, 3))
        .select((F.col("vec_id") + 9_000_000).alias("query_id"), "embedding")
    )
    return hybrid_topk(spark, f"{base}/text", f"{base}/vec", tq, vq, k=10)


def _ivfpq_ann(spark, sf_dir):
    """Bench surface for x_ann_ivfpq: the raw composed-index top-k at
    the contract setting.  The queries() entry wraps it in a recall
    contract that ALSO runs the brute-force exact top-k (the
    verification harness) — benching that would time the oracle, not
    the engine."""
    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.ivfpq import ivfpq_topk

    return ivfpq_topk(
        load_table(spark, sf_dir, "embeddings"), k=5, nprobe=8, rerank=200
    )


#: drifted-IVFADC template for the auto_maintain row, keyed by sf_dir —
#: built once OUTSIDE the timed window (the campaign-template protocol)
_MAINT_TEMPLATES: dict[str, str] = {}


def _maint_template(spark, sf_dir) -> str:
    import tempfile

    key = os.path.realpath(sf_dir)
    if key not in _MAINT_TEMPLATES:
        from pyspark.sql import functions as F

        from lwetl_spark.catalog import load_table
        from lwetl_spark.operators.ivfpq import (
            build_ivfpq_index,
            update_ivfpq_index,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        base = tempfile.mkdtemp(prefix="bench_maint_tmpl_")
        build_ivfpq_index(emb.filter(F.col("vec_id") % 2 == 0), f"{base}/v")
        update_ivfpq_index(
            spark, f"{base}/v", emb.filter(F.col("vec_id") % 2 == 1)
        )
        _MAINT_TEMPLATES[key] = base
    return _MAINT_TEMPLATES[key]


def _auto_maintain(spark, sf_dir):
    """Maintenance-policy cost: stats read + decision + the fired
    IVFADC retrain (full re-train + re-encode over current members) on
    a hardlink copy of a 2×-grown index — the pass a deployment pays
    when the drift thresholds trip."""
    import glob
    import shutil
    import tempfile

    from lwetl_spark.operators.maintain import auto_maintain

    for stale in glob.glob(tempfile.gettempdir() + "/bench_maint_run_*"):
        shutil.rmtree(stale, ignore_errors=True)
    run = tempfile.mkdtemp(prefix="bench_maint_run_")
    shutil.copytree(
        f"{_maint_template(spark, sf_dir)}/v", f"{run}/v",
        copy_function=os.link,
    )
    return auto_maintain(spark, f"{run}/v", growth_threshold_pm=1500)


def _dedup_clusters(spark, sf_dir):
    """Bench surface for x_dedup_clusters: MinHash-LSH candidate pairs →
    connected components — the pairs→clusters composition a 100 TB run
    executes.  The queries() entry instead lists EXACT 1-gram Jaccard
    pairs (portable, DuckDB-reproducible oracle), which is inherently
    quadratic-output on the template-heavy synthetic corpus (~3M pairs
    at sf0.1, 128 s) — benching that times the oracle workload, not the
    engine's scale path."""
    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    ).select("id_a", "id_b")
    return connected_components(pairs)


def _pq_ann(spark, sf_dir):
    """Bench surface for x_ann_pq: the raw PQ top-k operator.  The
    queries() entry wraps it in a recall contract that ALSO runs the
    brute-force exact top-k (the verification harness) — benching that
    would time the oracle, not the engine."""
    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.similarity import pq_topk

    return pq_topk(load_table(spark, sf_dir, "embeddings"), k=5)


def _curate_chain(spark, sf_dir):
    """Composed curation chain (cli_curate.curate: token floor + gopher
    battery + exact dedup + fuzzy near-dedup) writing curated parquet to
    a scratch dir — the end-to-end pipeline a 100 TB campaign runs, as
    one timed unit.  Returns the curated output for the row count."""
    import glob
    import shutil
    import tempfile

    from lwetl_spark.cli_curate import curate

    # reclaim earlier repeats' scratch dirs (one per timed run otherwise
    # accumulates in /tmp across warmup + best-of-N + rounds)
    for stale in glob.glob(tempfile.gettempdir() + "/bench_curate_*"):
        shutil.rmtree(stale, ignore_errors=True)
    out = tempfile.mkdtemp(prefix="bench_curate_") + "/out"
    curate(
        spark,
        sf_dir,
        out,
        min_tokens=10,
        max_dup_fraction=0.5,
        dedup=True,
        gopher=True,
        # the synthetic corpus has no English stopwords; vowels keep the
        # stopword rule live without dropping 100% (see curate_rehearsal)
        gopher_min_words=20,
        gopher_stops=["a", "e", "i", "o", "u"],
        gopher_min_stops=1,
    )
    return spark.read.parquet(out)


def _campaign_tables(spark, sf_dir):
    from pyspark.sql import functions as F

    from lwetl_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    return docs, emb


#: bootstrap-once template state for the increment/compact rows, keyed
#: by sf_dir (warmup builds a sf0.001 one, timed runs a sf0.1 one).
#: Built OUTSIDE the timed window; each timed run gets a hardlink copy
#: (parquet files are never modified in place — appends create new
#: files, overwrites unlink+recreate — so hardlinks are safe and the
#: per-run copy is metadata-only).
_CAMPAIGN_TEMPLATES: dict[str, str] = {}


def _campaign_template(spark, sf_dir) -> str:
    import tempfile

    key = os.path.realpath(sf_dir)
    if key not in _CAMPAIGN_TEMPLATES:
        from pyspark.sql import functions as F

        from lwetl_spark.operators.incremental import ingest_increment

        docs, emb = _campaign_tables(spark, sf_dir)
        base = tempfile.mkdtemp(prefix="bench_campaign_tmpl_")
        seed = docs.filter(F.col("doc_id") % 10 != 7)  # delta tail held out
        ingest_increment(
            spark, seed, f"{base}/m", f"{base}/s", f"{base}/x",
            embeddings=emb, vector_index_path=f"{base}/v",
        )
        _CAMPAIGN_TEMPLATES[key] = base
    return _CAMPAIGN_TEMPLATES[key]


def _campaign_scratch(template: str) -> str:
    """Fresh per-run working copy of the template state (hardlinks)."""
    import glob
    import shutil
    import tempfile

    for stale in glob.glob(tempfile.gettempdir() + "/bench_campaign_run_*"):
        shutil.rmtree(stale, ignore_errors=True)
    run = tempfile.mkdtemp(prefix="bench_campaign_run_")
    for part in ("m", "s", "x", "v"):
        shutil.copytree(f"{template}/{part}", f"{run}/{part}",
                        copy_function=os.link)
    return run


def _campaign_bootstrap(spark, sf_dir):
    """Day-0 cost: manifest bootstrap + content dedup + text index build
    + IVF build (quantizer train) over the full corpus, as one unit."""
    import glob
    import shutil
    import tempfile

    from lwetl_spark.operators.incremental import ingest_increment

    for stale in glob.glob(tempfile.gettempdir() + "/bench_campaign_boot_*"):
        shutil.rmtree(stale, ignore_errors=True)
    docs, emb = _campaign_tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="bench_campaign_boot_")
    ingest_increment(
        spark, docs, f"{base}/m", f"{base}/s", f"{base}/x",
        embeddings=emb, vector_index_path=f"{base}/v",
    )
    return spark.read.parquet(f"{base}/s")


def _campaign_increment(spark, sf_dir):
    """Steady-state daily cost: one O(delta) partial-batch increment
    (snapshot_is_delta) admitting the held-out 10% tail into both
    indexes of a hardlink copy of the bootstrap template."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment

    docs, emb = _campaign_tables(spark, sf_dir)
    run = _campaign_scratch(_campaign_template(spark, sf_dir))
    delta = docs.filter(F.col("doc_id") % 10 == 7)
    ingest_increment(
        spark, delta, f"{run}/m", f"{run}/s", f"{run}/x",
        embeddings=emb, vector_index_path=f"{run}/v",
        snapshot_is_delta=True,
    )
    return spark.read.parquet(f"{run}/s")


def _campaign_compact(spark, sf_dir):
    """Maintenance-pass cost: a full snapshot with ~10% changed content
    runs defer-then-compact in one call (compact_changed=True) — one
    postings read, affected-bucket rewrites, vector remove/re-add."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import ingest_increment

    docs, emb = _campaign_tables(spark, sf_dir)
    run = _campaign_scratch(_campaign_template(spark, sf_dir))
    seed = docs.filter(F.col("doc_id") % 10 != 7)
    changed = seed.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 5,
            F.concat(F.col("text"), F.lit(" refreshed content marker")),
        ).otherwise(F.col("text")),
    )
    ingest_increment(
        spark, changed, f"{run}/m", f"{run}/s", f"{run}/x",
        embeddings=emb, vector_index_path=f"{run}/v",
        compact_changed=True,
    )
    return spark.read.parquet(f"{run}/s")


BENCH_OVERRIDES = {
    "x_dedup_minhash": _minhash_pairs,
    "x_dedup_clusters": _dedup_clusters,
    "x_ann_pq": _pq_ann,
    "curate_chain": _curate_chain,
    "campaign_bootstrap": _campaign_bootstrap,
    "campaign_increment": _campaign_increment,
    "campaign_compact": _campaign_compact,
    "x_ann_ivfpq": _ivfpq_ann,
    "auto_maintain": _auto_maintain,
    "phrase_probe": _phrase_probe,
    "hybrid_probe": _hybrid_probe,
}


def _calibration(spark) -> "object":
    """Fixed synthetic workload for the calibration row (VERDICT r6
    #6): generate → hash → shuffle-agg → sort over 30M rows, zero I/O,
    constant plan across rounds.  Its wall time moves with BOX LOAD
    only (this machine swings >2× under concurrent jobs — the r3/r6
    judges both hit it), so BENCH_rN readers can divide any query's
    time by the same round's calibration to separate load drift from
    code regressions."""
    from pyspark.sql import functions as F

    return (
        spark.range(30_000_000)
        .select(F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("g"),
                F.col("id"))
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
        .orderBy(F.desc("n"), "g")
        .limit(1000)
    )


def main() -> None:
    from lwetl_spark.session import get_spark
    import lwetl_spark.queries_etl  # noqa: F401 — registers the ETL-half
    # of the catalog into QUERIES (x_media_meta lives there)
    from lwetl_spark.queries import QUERIES

    spark = get_spark(app_name="lwetl_spark_bench")
    # Warm-up: run every headline plan once at sf0.001 so the timed runs
    # measure steady-state engine throughput, not one-time JVM/codegen
    # compilation per plan shape (which amortizes to zero at scale).
    # (Measured: warming at sf0.01 is net-worse — the extra warmup work
    # costs more GC pressure than the closer AQE plan shapes save.)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(SF_DIR):
        for name in HEADLINE + EXTENDED:
            try:
                (BENCH_OVERRIDES.get(name) or QUERIES[name])(spark, warm_dir).count()
            except Exception as e:  # pragma: no cover - warmup is best-effort
                print(f"# warmup {name} failed: {e}", file=sys.stderr)
        # drop warmup-persisted tables (minhash signatures etc.) so the
        # timed runs don't inherit cache pressure
        spark.catalog.clearCache()
    else:
        spark.range(1000).selectExpr("sum(id)").collect()

    # Per-query time = MIN over `repeats` back-to-back runs: the minimum
    # estimates steady-state engine throughput and is robust to one-off
    # GC/JIT/compaction hiccups AND to concurrent box load (the r03
    # judge measured the same suite at 8.3s idle vs 17.4s loaded — this
    # machine swings >2x, and repeats=2 cannot average that out, so
    # VERDICT r3 #4 raised the default to best-of-5).  clearCache
    # between queries keeps persist()-ing queries (minhash) from
    # subsidizing later ones.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5")))
    # the historically volatile rows get best-of-7 (VERDICT r9 task 7 /
    # r10 task 5: x_fuzzy_join swung 2.62→1.79→2.38 s and
    # x_quality_logreg +28% / x_dedup_clusters +10% r9→r10 on
    # byte-identical code) — best-of-7 for EVERY extended row was
    # tried first and blew the suite past a 10-minute wall
    volatile = {"x_fuzzy_join", "curate_chain", "x_quality_logreg",
                "x_dedup_clusters"}
    repeats_hot = max(repeats, int(
        os.environ.get("SPARK_GRAFT_BENCH_REPEATS_HOT", "7")))

    #: per-row repeat statistics (VERDICT r10 task 5: emit stddev so
    #: the judge can separate box-load noise from real regressions
    #: mechanically) — {name: {min, med, sd, n}}
    row_stats: dict[str, dict[str, float]] = {}

    def run_suite(names: list[str]) -> tuple[dict[str, float], float]:
        import statistics

        timings: dict[str, float] = {}
        total = 0.0
        for name in names:
            fn = BENCH_OVERRIDES.get(name) or QUERIES[name]
            times: list[float] = []
            n = 0
            for _ in range(repeats_hot if name in volatile else repeats):
                spark.catalog.clearCache()
                t0 = time.time()
                n = fn(spark, SF_DIR).count()
                times.append(time.time() - t0)
            best = min(times)
            timings[name] = round(best, 3)
            row_stats[name] = {
                "min": round(best, 3),
                "med": round(statistics.median(times), 3),
                "sd": round(statistics.pstdev(times), 3),
                "n": len(times),
            }
            total += best
            print(f"# {name}: {best:.2f}s ({n} rows, "
                  f"sd {row_stats[name]['sd']:.2f})", file=sys.stderr)
        return timings, total

    # calibration row FIRST (VERDICT r6 #6): a pinned zero-I/O workload
    # whose wall time moves with box load only — divide any query by it
    # to separate load drift from code regressions round-over-round
    cal_best = float("inf")
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.time()
        _calibration(spark).count()
        cal_best = min(cal_best, time.time() - t0)
    print(f"# calibration: {cal_best:.2f}s", file=sys.stderr)

    timings, total = run_suite(HEADLINE)
    # extended suite is additive evidence: its total is reported
    # separately so "value" stays comparable to BENCH_r01-r04
    ext_timings, ext_total = run_suite(EXTENDED)

    def _norm(t: dict[str, float]) -> dict[str, float]:
        return {k: round(v / cal_best, 2) for k, v in t.items()}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # r12 measurement fix (VERDICT r11 #2a, NOT a methodology change —
    # the timing protocol above is untouched): r11's single JSON line
    # outgrew the driver's 2000-char tail once row_stats landed, so the
    # archived BENCH tail lost `value`/`calibration_sec`/the headline
    # dict.  A COMPACT contract line (metric/value/queries/extended/
    # calibration, well under 2000 chars) now prints FIRST; the full
    # r11-format line (same fields + normalized + row_stats — the shape
    # the r11 driver parsed successfully) follows, so first-line,
    # any-line, and full-stdout parsers all recover the contract.
    compact = {
        "metric": "headline_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "extended": ext_timings,
        "extended_wall": round(ext_total, 3),
        "calibration_sec": round(cal_best, 3),
        "calibration_workload": "range30M-hash-shuffleagg-sort",
        "fixture_changed": FIXTURE_CHANGED,
        "repeats": repeats,
        "sf": sf_val,
    }
    print(json.dumps(compact))
    full = dict(compact)
    full["normalized"] = _norm(timings)
    full["extended_normalized"] = _norm(ext_timings)
    full["row_stats"] = row_stats
    print(json.dumps(full))


if __name__ == "__main__":
    main()
