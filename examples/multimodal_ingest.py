"""Engine addition (no reference analog): the r8 multimodal ingest
front door, end to end — synthesize a mixed crawl batch of REAL
containers (PNG / entropy-coded JPEG / WAV / MP4-with-frames / junk),
then run the gate a 100 TB pipeline runs:

  1. sniff the format with one JVM CASE (zero Python),
  2. parse container metadata in one Arrow pass (media_meta),
  3. normalize JPEG geometry through the EXIF orientation tag,
  4. curate: drop corrupt / tiny / sub-second payloads,
  5. walk the surviving MP4s' sample tables to exact frame ranges,
  6. dedup videos by frame-content fingerprint (container-blind).

Every stage is either a pure JVM expression chain or a zero-shuffle
mapInPandas — payload bytes never ride an exchange.

Run: python examples/multimodal_ingest.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from lwetl_spark.catalog import load_table  # noqa: E402
from lwetl_spark.operators.media import (  # noqa: E402
    exif_meta,
    media_meta,
    mp4_frame_index,
    sniff_format,
    synth_media_demo,
    video_fingerprint,
)
from lwetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="multimodal_ingest_example")
    docs = load_table(spark, sf_dir, "documents")
    media = synth_media_demo(docs).localCheckpoint(eager=True)

    # 1. route by sniffed format (JVM CASE, whole-stage codegen)
    routed = media.select(sniff_format("payload").alias("fmt"))
    print("== sniffed formats ==")
    for r in routed.groupBy("fmt").count().orderBy("fmt").collect():
        print(f"  {r['fmt']:>8}  {r['count']}")

    # 2-3. container census + EXIF-normalized image geometry
    meta = media_meta(media)
    exif = exif_meta(media).select(
        "doc_id", F.col("norm_width").alias("_nw"),
        F.col("norm_height").alias("_nh"),
        F.col("valid").alias("_exif_ok"),
    )
    normed = meta.join(exif.hint("shuffle_hash"), "doc_id").select(
        "doc_id", "fmt", "valid", "duration_ms",
        F.when((F.col("fmt") == "jpeg") & F.col("_exif_ok"), F.col("_nw"))
        .otherwise(F.col("width")).alias("width"),
        F.when((F.col("fmt") == "jpeg") & F.col("_exif_ok"), F.col("_nh"))
        .otherwise(F.col("height")).alias("height"),
    )

    # 4. the curation gate
    kept = normed.filter(
        F.col("valid")
        & (F.col("width") >= 4) & (F.col("height") >= 4)
        & (
            F.col("fmt").isin("png", "jpeg")
            | ((F.col("fmt") == "mp4") & (F.col("duration_ms") >= 1000))
        )
    )
    print(f"== curate: kept {kept.count()} of {media.count()} payloads ==")

    # 5. frame index over the surviving videos
    vids = media.join(
        kept.filter(F.col("fmt") == "mp4").select("doc_id"),
        "doc_id", "left_semi",
    )
    frames = mp4_frame_index(vids)
    stats = frames.agg(
        F.count("*").alias("n"),
        F.count_if("is_key").alias("keys"),
    ).collect()[0]
    print(f"== frames: {stats['n']} total, {stats['keys']} keyframes ==")

    # 6. container-blind video dedup
    fp = video_fingerprint(vids)
    groups = fp.groupBy("fingerprint").count().filter("count > 1")
    print(f"== video dup groups: {groups.count()} ==")


if __name__ == "__main__":
    main()
