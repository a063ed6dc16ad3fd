#!/usr/bin/env python
"""Pure-Python (no Spark) profiling harness for the media codec hot
paths behind the heavy bench rows (guide §1: measure first; §4.2 the
per-task work is interpreter-bound, so profile the actual closures).

Trick: the media operators are all `df.mapInPandas(run, schema)` with
self-contained closures — a fake DataFrame that records `run` lets the
REAL closure be driven with plain pandas batches, no Spark session.

Usage: python tools/profile_media_r11.py <op> [N] [--time-only]
  ops: tiff_px imgtext_gen png16 pdf_text pdf_images gif jpeg jpeg420 zip
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pandas as pd  # noqa: E402


class FakeDF:
    """Records the closure an operator passes to mapInPandas and
    applies it eagerly to one pandas batch."""

    def __init__(self, pdf: pd.DataFrame):
        self.pdf = pdf

    # --- plumbing the operators use before/after the Arrow pass ---
    def select(self, *cols):
        # operators only ever select/alias existing cols before the
        # Arrow pass; emulate the common forms
        names = []
        for c in cols:
            s = str(c)
            if "AS" in s:  # Column alias repr: Column<'x AS y'>
                names.append(s.split("AS")[-1].strip(" '>"))
            else:
                names.append(s.strip("Column<>'"))
        have = [n for n in names if n in self.pdf.columns]
        if len(have) == len(names):
            return FakeDF(self.pdf[have])
        # alias case: doc_id AS doc_id etc. — single column rename
        if len(names) == 1:
            src = self.pdf.columns[0]
            return FakeDF(self.pdf[[src]].rename(columns={src: names[0]}))
        return self

    def mapInPandas(self, fn, schema):
        out = pd.concat(list(fn(iter([self.pdf]))), ignore_index=True)
        return FakeDF(out)

    def withColumn(self, name, col):  # pragma: no cover - unused paths
        raise NotImplementedError


def profile(label: str, fn, time_only: bool = False):
    if time_only:
        t0 = time.time()
        r = fn()
        print(f"{label}: {time.time() - t0:.2f}s")
        return r
    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    r = fn()
    pr.disable()
    print(f"\n===== {label}: {time.time() - t0:.2f}s =====")
    st = pstats.Stats(pr)
    st.sort_stats("tottime").print_stats(16)
    return r


class DummyCol:
    def __init__(self, name):
        self.name = name

    def alias(self, name):
        return DummyCol(f"{self.name} AS {name}")

    def __str__(self):
        return self.name


def main():
    from lwetl_spark.operators import media

    # F.col needs a live SparkContext in classic pyspark — stub the two
    # forms the fixture plumbing uses before its Arrow pass
    media.F.col = DummyCol  # type: ignore[assignment]
    media._spread = lambda df: df  # type: ignore[assignment] — no Spark

    which = sys.argv[1] if len(sys.argv) > 1 else "tiff_px"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    time_only = "--time-only" in sys.argv
    ids = FakeDF(pd.DataFrame({"doc_id": range(n)}))

    if which == "tiff_px":
        gen = profile(f"synth_tiff_px_demo x{n}",
                      lambda: media.synth_tiff_px_demo(ids), time_only)
        profile(f"tiff_pixel_stats x{n}",
                lambda: media.tiff_pixel_stats(gen), time_only)
    elif which == "png16":
        gen = profile(f"synth_png16 x{n}",
                      lambda: media.synth_png_16bit_demo(ids), time_only)
        profile(f"png_pixel_stats x{n}",
                lambda: media.png_pixel_stats(gen), time_only)
    elif which == "gif":
        gen = profile(f"synth_gif x{n}",
                      lambda: media.synth_gif_demo(ids), time_only)
        profile(f"gif_pixel_stats x{n}",
                lambda: media.gif_pixel_stats(gen), time_only)
    elif which == "jpeg":
        gen = profile(f"synth_jpeg x{n}",
                      lambda: media.synth_jpeg_demo(ids), time_only)
        profile(f"jpeg_pixel_stats x{n}",
                lambda: media.jpeg_pixel_stats(gen), time_only)
    elif which == "pdf_text":
        gen = profile(f"synth_pdf x{n}",
                      lambda: media.synth_pdf_demo(ids), time_only)
        profile(f"pdf text x{n}",
                lambda: media.pdf_text_extract(gen), time_only)
    else:
        raise SystemExit(f"unknown target {which}")


if __name__ == "__main__":
    main()
