"""Engine addition (no reference analog): a full TRAINING-DATA RELEASE
in one composed run — the publish step that follows the daily-crawl
campaign (examples/daily_increment.py):

    documents
      │ curate            token floor + Gopher battery + exact dedup +
      │                   span filter + IRLS quality-model tail drop
      │                   (cli_curate.curate — one Catalyst plan per
      │                   stage, text never shuffles)
      │ shard export      deterministic md5 shards, shard=N/ parquet
      ▼                   partitions (operators/sampling)
    release card          one-line per-release summary: the per-stage
                          survivor funnel (in PIPELINE order — drops
                          attribute by differencing adjacent stages),
                          tokens, sources, shard balance — the artifact
                          a dataset consumer reads first

Every number in the card is derived from the SAME stats dict the
curate CLI emits plus one bounded agg over the released shards, so the
card always matches what was actually shipped.  Token counts reuse
functions.text.token_count — the same definition the min-token gate
applied, so the card can never diverge from the gate that produced it.

Run: python examples/dataset_release.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from lwetl_spark.cli_curate import curate
    from lwetl_spark.functions.text import token_count
    from lwetl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="lwetl_spark_release_")
    )
    own_tmp = len(sys.argv) <= 2
    spark = get_spark(app_name="dataset_release")

    try:
        # the synthetic corpus has no English stopwords; vowels keep the
        # stopword rule live without dropping 100% (see curate_rehearsal)
        stats = curate(
            spark,
            sf_dir,
            f"{out_dir}/curated",
            min_tokens=10,
            max_dup_fraction=0.5,
            dedup=True,
            gopher=True,
            gopher_min_words=20,
            gopher_stops=["a", "e", "i", "o", "u"],
            gopher_min_stops=1,
            quality_model=True,
            quality_tail=0.05,
            n_shards=8,
            attribution=True,
        )

        # release card: the curate stats (funnel attribution, already in
        # pipeline order in the stats dict) + one bounded agg over what
        # actually shipped.  An aggressively-filtered corpus can release
        # ZERO docs — a valid outcome (curate itself records n_kept=0),
        # so the card must not assume readable shard files.
        funnel = [
            {"stage": k[len("n_after_"):], "n_after": v}
            for k, v in stats.items()
            if k.startswith("n_after_")
        ]
        card = {
            "release": "documents",
            "input_docs": stats["n_input"],
            "kept": stats["n_kept"],
            "dropped": stats["n_dropped"],
            "funnel": funnel,
        }
        if stats["n_kept"]:
            released = spark.read.parquet(f"{out_dir}/curated")
            agg = released.agg(
                F.count("*").alias("n_docs"),
                F.sum(token_count("text")).cast("long").alias("n_tokens"),
                F.countDistinct("source").alias("n_sources"),
                F.countDistinct("lang").alias("n_langs"),
            ).collect()[0]
            shard_sizes = [
                r["n"]
                for r in released.groupBy("shard")
                .agg(F.count("*").alias("n"))
                .collect()
            ]
            card.update(
                released_docs=agg["n_docs"],
                released_tokens=agg["n_tokens"],
                sources=agg["n_sources"],
                langs=agg["n_langs"],
                n_shards=len(shard_sizes),
                shard_min=min(shard_sizes),
                shard_max=max(shard_sizes),
            )
        print(json.dumps(card))
    finally:
        if own_tmp:
            shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
