#!/usr/bin/env python
"""r9 media-operator scaling probe: mkv census, 4:2:0 JPEG pixel
decode, Matroska SimpleBlock frame walk, and the cross-container video
fingerprint at 1x/4x/16x synthetic-id corpora.  All four are
zero-shuffle Arrow passes, so the claim under test is FLAT per-item
throughput as ids scale (the SCALE.md media idiom).

Usage: python tools/media_probe_r9.py [n_base]   (default 1000)
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
    spark = get_spark(app_name="media_probe_r9")
    from lwetl_spark.operators.media import (
        jpeg_pixel_stats,
        mkv_frame_index,
        mkv_meta,
        synth_jpeg420_demo,
        synth_mkv_demo,
        synth_mkv_frames_demo,
        synth_video_dup_xc_demo,
        video_fingerprint,
    )

    probes = [
        ("mkv_meta", synth_mkv_demo, mkv_meta),
        ("jpeg420_decode", synth_jpeg420_demo, jpeg_pixel_stats),
        ("mkv_frame_walk", synth_mkv_frames_demo, mkv_frame_index),
        ("video_dedup_xc", synth_video_dup_xc_demo, video_fingerprint),
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
