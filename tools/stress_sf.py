#!/usr/bin/env python
"""Runtime stress: run every queries() entry at sf0.1 (10x the driver
correctness SF) looking for scale-dependent failures (broadcast OOM,
ANSI overflow, skew) and timing outliers.  The three quadratic
exact-verification ops are skipped by design (SCALE.md bounded surfaces).

Usage: python tools/stress_sf.py   (from any cwd)
"""
import importlib.util, sys, time
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[16]").appName("sf01stress").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
# exact-verification ops documented as bounded-scale (SCALE.md "known
# bounded surfaces"): quadratic pair verification on purpose
SKIP = {"x_embed_near_dups", "x_jaccard_pairs", "x_dedup_clusters", "x_ppjoin",
        "x_soft_dedup"}  # soft_dedup: same exact-Jaccard pair generator as x_dedup_clusters
q = mod.queries()
slow = []
for name in sorted(q):
    if name in SKIP:
        print(f"skip {name} (bounded-scale exact verification)", flush=True)
        continue
    t0 = time.time()
    try:
        n = q[name](spark, SF).count()
        dt = time.time() - t0
        print(f"ok {name}: {dt:.1f}s ({n} rows)", flush=True)
        if dt > 5:
            slow.append((name, round(dt, 1), n))
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__} {str(e)[:300]}", flush=True)
    spark.catalog.clearCache()
print("SLOW(>5s):", slow, flush=True)
print("done", flush=True)
