#!/usr/bin/env python
"""r11 scaling probe: the CCITT fax decode family (G4 MMR + 1-D
MH/G3 over strip- and tile-framed 1-bit TIFF pages), the modern-PDF
census (xref-stream + ObjStm inflation), the raw-AAC ADTS walk, the
HTTP-split + charset-sniff ingest pass, and the 8-band wide-radius
dhash join at CONSTANT cluster size (the r10 near-dup protocol: 40
members per cluster, clusters scale with n — crawl-shaped load).

Decode families claim FLAT per-item wall as ids scale (zero-shuffle
Arrow passes); the 8-band join claims LINEAR output and near-flat
wall (banded equi-join, 2x band rows vs 4-band, no all-pairs).

Usage: python tools/media_probe_r11.py [n_base]   (default 1000)
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
    spark = get_spark(app_name="media_probe_r11")
    from lwetl_spark.operators.media import (
        aac_meta,
        dhash_near_dup,
        http_response_parts,
        pdf_text,
        sniff_decode_html,
        synth_aac_demo,
        synth_http_demo,
        synth_pdf_demo,
        synth_tiff_px_demo,
        tiff_pixel_stats,
    )

    def ids(n: int):
        return spark.range(n).select(F.col("id").alias("doc_id"))

    def fax_ids(n: int):
        # doc_id ≡ 3 mod 4 with p=0 makes EVERY first page a fax page
        # ((id+p)%4==3) — the fax-heavy slice of the pixel fixture
        return spark.range(n).select(
            (F.col("id") * 4 + 3).alias("doc_id"))

    def http_ingest(docs):
        parts = http_response_parts(synth_http_demo(docs))
        return sniff_decode_html(
            parts.select("doc_id", "body", "content_type"),
            payload_col="body", content_type_col="content_type")

    ops = {
        "tiff_fax": lambda d: tiff_pixel_stats(synth_tiff_px_demo(d)),
        "pdf_modern": lambda d: pdf_text(synth_pdf_demo(d)),
        "aac_adts": lambda d: aac_meta(synth_aac_demo(d)),
        "http_sniff": http_ingest,
    }
    for name, fn in ops.items():
        for mult in (1, 4, 16):
            n = n_base * mult
            docs = fax_ids(n) if name == "tiff_fax" else ids(n)
            t0 = time.time()
            cnt = fn(docs).count()
            wall = time.time() - t0
            print(json.dumps({
                "op": name, "scale": mult, "n_items": n,
                "rows": cnt, "wall_sec": round(wall, 2),
            }))
            sys.stdout.flush()

    # 8-band wide-radius join at constant cluster size (the r10
    # protocol verbatim, radius 6 / n_bands 8): member bit flips stay
    # within the radius, cluster bases are xxhash64-spread
    flip = F.expr(
        "CASE CAST(id % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 6"
        " WHEN 2 THEN 20 ELSE 40 END").cast("long")
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
        cnt = dhash_near_dup(hx, max_hamming=6, n_bands=8).count()
        wall = time.time() - t0
        print(json.dumps({
            "op": "dhash_neardup_8band", "scale": mult, "n_items": n,
            "rows": cnt, "wall_sec": round(wall, 2),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
