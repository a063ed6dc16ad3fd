#!/usr/bin/env python
"""r9 addendum-5 media-operator scaling probe: GIF-LZW frame decode,
16-bit PNG decode, PDF text extraction, ZIP member extraction, the
FLAC/Ogg/TIFF/AVI censuses, and the pure-JVM SRT cue parse at
1x/4x/16x synthetic-id corpora.  All are zero-shuffle passes (Arrow
or codegen), so the claim under test is FLAT per-item throughput as
ids scale (the SCALE.md media idiom).

Usage: python tools/media_probe_r9b.py [n_base]   (default 1000)
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
    spark = get_spark(app_name="media_probe_r9b")
    from lwetl_spark.operators.media import (
        avi_meta,
        flac_meta,
        gif_pixel_stats,
        ogg_meta,
        pdf_text,
        png_pixel_stats,
        srt_cues,
        synth_avi_demo,
        synth_flac_demo,
        synth_gif_px_demo,
        synth_ogg_demo,
        synth_pdf_demo,
        synth_png16_demo,
        synth_srt_demo,
        synth_tiff_demo,
        synth_zip_demo,
        tiff_pages,
        zip_member_contents,
    )

    probes = [
        ("gif_lzw_decode", synth_gif_px_demo, gif_pixel_stats),
        ("png16_decode", synth_png16_demo, png_pixel_stats),
        ("pdf_text", synth_pdf_demo, pdf_text),
        ("zip_extract", synth_zip_demo, zip_member_contents),
        ("flac_census", synth_flac_demo, flac_meta),
        ("ogg_census", synth_ogg_demo, ogg_meta),
        ("tiff_census", synth_tiff_demo, tiff_pages),
        ("avi_census", synth_avi_demo, avi_meta),
        ("srt_cues", synth_srt_demo, srt_cues),
    ]
    for scale in (1, 4, 16):
        n = n_base * scale
        ids = spark.range(n).select(F.col("id").alias("doc_id"))
        ids = ids.repartition(32).localCheckpoint(eager=True)
        for name, fixture, op in probes:
            spark.catalog.clearCache()
            t0 = time.time()
            rows = op(fixture(ids)).count()
            dt = time.time() - t0
            print(json.dumps({
                "op": name, "scale": scale, "items": n,
                "rows": rows, "sec": round(dt, 2),
                "items_per_sec": int(n / dt),
            }), flush=True)


if __name__ == "__main__":
    main()
