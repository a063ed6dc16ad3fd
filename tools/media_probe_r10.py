#!/usr/bin/env python
"""r10 scaling probe: the widened TIFF decode (multi-strip LZW /
PackBits / predictor), PDF embedded-image extraction (DCT + Flate),
the WARC image-text pair-mine core (gate → decode → dhash → collapse,
campaign leg excluded — its O(delta) model is probed by the campaign
rows), and the banded dhash near-dup join at CONSTANT cluster size
(clusters per corpus scale with n, members stay 40 — the crawl-shaped
load; a fixed class count would grow output quadratically and measure
the pair LISTING, not the operator).

Decode families claim FLAT per-item wall as ids scale (zero-shuffle
Arrow passes); the near-dup join claims LINEAR output and near-flat
wall (banded equi-join, no all-pairs).

Usage: python tools/media_probe_r10.py [n_base]   (default 1000)
Writes one JSON line per (operator, scale).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from lwetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    spark = get_spark(app_name="media_probe_r10")
    from lwetl_spark.operators.media import (
        dhash_near_dup,
        image_dhash,
        media_meta,
        pdf_image_stats,
        synth_pdf_img_demo,
        synth_tiff_px_demo,
        synth_warc_imgtext_demo,
        tiff_pixel_stats,
        warc_payloads,
    )

    def ids(n: int):
        return spark.range(n).select(F.col("id").alias("doc_id"))

    def imgtext_core(docs):
        recs = warc_payloads(synth_warc_imgtext_demo(docs))
        recs = recs.localCheckpoint(eager=True)
        imgs = recs.filter(
            ~F.col("target_uri").startswith("http://site")
            & (F.col("rec_type") == "response")
        ).select(
            (F.col("doc_id") * 1000 + F.col("rec_idx")).alias("doc_id"),
            "payload",
        )
        gate = media_meta(imgs).filter(
            F.col("valid") & (F.col("width") >= 16)
            & (F.col("height") >= 16)
        ).select("doc_id")
        hx = image_dhash(
            imgs.join(gate, "doc_id", "left_semi")
        ).filter("ok")
        return hx.groupBy("dhash").agg(F.count("*").alias("n"))

    ops = {
        "tiff_px_widened": lambda d: tiff_pixel_stats(
            synth_tiff_px_demo(d)),
        "pdf_images": lambda d: pdf_image_stats(synth_pdf_img_demo(d)),
        "imgtext_core": imgtext_core,
    }
    for name, fn in ops.items():
        for mult in (1, 4, 16):
            n = n_base * mult
            docs = ids(n)
            t0 = time.time()
            cnt = fn(docs).count()
            wall = time.time() - t0
            print(json.dumps({
                "op": name, "scale": mult, "n_items": n,
                "rows": cnt, "wall_sec": round(wall, 2),
            }))
            sys.stdout.flush()

    # near-dup at constant cluster size: id//40 clusters of 40; the
    # cluster base is xxhash64-spread over 64 bits (cross-cluster
    # hamming far above the radius; ANSI-safe, unlike a golden-ratio
    # multiply) and member bit id%4 flips — every cluster contributes
    # the same 780-pair set, so output is LINEAR in n and the banded
    # join's wall should track it
    flip = F.expr(
        "CASE CAST(id % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 2"
        " WHEN 2 THEN 4 ELSE 8 END").cast("long")
    for mult in (1, 4, 16):
        n = n_base * mult
        hx = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.format_string(
                "%016x",
                F.xxhash64((F.col("id") / 40).cast("long"))
                .bitwiseXOR(flip),
            ).alias("dhash"),
        )
        t0 = time.time()
        cnt = dhash_near_dup(hx).count()
        wall = time.time() - t0
        print(json.dumps({
            "op": "dhash_neardup_join", "scale": mult, "n_items": n,
            "rows": cnt, "wall_sec": round(wall, 2),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
