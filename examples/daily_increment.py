"""Engine addition (no reference analog): the daily-crawl increment
campaign — the incremental spine of a 100 TB training-data pipeline,
composed end-to-end (VERDICT r4 #8):

    day-N snapshot
      │ manifest_diff          (id, digest) vs persisted manifest —
      │                        only added/changed ids continue
      │ dedup vs admitted set  fingerprint anti-join against the
      │                        persisted (fp, id) state: re-crawled or
      │                        duplicated CONTENT never admits twice
      │ update_text_index      postings append into hash buckets; only
      ▼                        affected df buckets dynamic-overwrite
    searchable index == from-scratch rebuild over the admitted union
    (row-identical; pinned by tests/test_retrieval.py::
     test_ingest_increment_campaign_equals_rebuild)

Every stage is delta-vs-state keyed on ids/digests: document text never
shuffles, never re-tokenizes beyond the delta, and the daily cost is
O(delta), not O(corpus) — the property that makes a daily crawl over a
100 TB archive a minutes-job instead of a rebuild.

This demo simulates three crawl days over the sf documents table:
day 0 bootstraps, day 1 adds new docs + re-crawls (nothing re-admits),
day 2 adds a batch containing cross-day duplicate content (rejected).

Run: python examples/daily_increment.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from lwetl_spark.catalog import load_table  # noqa: E402
from lwetl_spark.operators.incremental import ingest_increment  # noqa: E402
from lwetl_spark.operators.retrieval import query_text_index  # noqa: E402
from lwetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="daily_increment_example")
    work = tempfile.mkdtemp(prefix="daily_increment_")
    manifest, state, index = (
        f"{work}/manifest",
        f"{work}/state",
        f"{work}/index",
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # day 0: the first crawl bootstraps manifest + admitted state + index
    day0 = docs.filter(F.col("doc_id") % 3 == 0)
    s0 = ingest_increment(spark, day0, manifest, state, index)
    print(f"day 0: {s0}")

    # day 1: everything from day 0 re-crawls (unchanged) + a new slice
    day1 = docs.filter((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 3 == 1))
    s1 = ingest_increment(spark, day1, manifest, state, index)
    print(f"day 1: {s1}  (re-crawled ids admit nothing)")

    # day 2: the last slice, plus byte-copies of day-0 content under new
    # ids — duplicate content is rejected by the admitted-state anti-join
    dupes = day0.limit(50).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    day2 = day1.unionByName(
        docs.filter(F.col("doc_id") % 3 == 2)
    ).unionByName(dupes)
    s2 = ingest_increment(spark, day2, manifest, state, index)
    print(f"day 2: {s2}  (50 duplicate-content ids rejected)")

    admitted = spark.read.parquet(state)
    print(f"admitted corpus: {admitted.count()} docs "
          f"(== {docs.count()} distinct-content source docs or fewer)")

    # the incrementally-maintained index is immediately searchable
    q = spark.createDataFrame(
        [(1, "data"), (1, "table"), (2, "sort")], "query_id int, term string"
    )
    query_text_index(spark, index, q, k=5).show(15, truncate=False)

    # ---- dual-index campaign: the SAME manifest diff can maintain an
    # IVF vector index (crawl + embed the delta arrive together).  A
    # fresh campaign over docs that carry embeddings:
    from lwetl_spark.catalog import load_table as _lt
    from lwetl_spark.operators.similarity import query_ivf_index

    emb = _lt(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    work2 = tempfile.mkdtemp(prefix="daily_increment_dual_")
    m2, s2p, x2, v2 = (f"{work2}/{p}" for p in ("m", "s", "x", "v"))
    sv0 = ingest_increment(
        spark, docs.filter(F.col("doc_id") % 2 == 0), m2, s2p, x2,
        embeddings=emb, vector_index_path=v2,
    )
    print(f"dual day 0: {sv0}  (vector index built, quantizer frozen)")
    sv1 = ingest_increment(
        spark, docs, m2, s2p, x2,
        embeddings=emb, vector_index_path=v2,
    )
    print(f"dual day 1: {sv1}  (both indexes extended from one diff)")
    # a takedown feed (CDC tombstones) retires from BOTH indexes — no
    # full snapshot needed
    tomb = docs.filter(F.col("doc_id") % 50 == 7).select("doc_id")
    sv2 = ingest_increment(
        spark, docs.limit(0), m2, s2p, x2,
        embeddings=emb, vector_index_path=v2,
        snapshot_is_delta=True, tombstones=tomb,
    )
    print(f"dual day 2: {sv2}  (tombstoned ids purged from text + vectors)")
    probes = emb.limit(3)
    query_ivf_index(
        spark, v2, probes, k=3, vec_col="embedding", id_col="doc_id"
    ).show(9, truncate=False)
    shutil.rmtree(work2, ignore_errors=True)

    # no spark.stop(): get_spark() shares the session (test harness runs
    # examples in-process); standalone runs clean up at process exit
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
