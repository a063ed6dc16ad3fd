#!/usr/bin/env python
"""Late-r11 scaling probe: the crawl-index layer at 1x/4x/16x ids.

- frontier: html synth -> html_links -> resolve_url -> surt_key ->
  first-witness-per-urlkey window (claim: wall flat per item; the one
  exchange carries only (urlkey, url, id) rows)
- redirects: %8 chain fixture -> resolve_redirects (claim: bounded
  hop joins, frontier shrinking each hop, wall flat per item)
- gate+schedule: hosts = n/50, ~50 urls/host -> robots_gate ->
  fetch_schedule (claim: rule-side reduces before the host join,
  wall flat per item)

Usage: python tools/crawl_probe_r11.py [n_base]   (default 20000)
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
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    spark = get_spark(app_name="crawl_probe_r11")
    from lwetl_spark.functions.text import (
        html_links,
        resolve_url,
        surt_key,
    )
    from lwetl_spark.operators.crawl import (
        fetch_schedule,
        resolve_redirects,
        robots_gate,
        robots_rules,
    )
    from pyspark.sql import Window

    def ids(n: int):
        return spark.range(n).select(F.col("id").alias("doc_id"))

    def frontier(n: int) -> int:
        i = F.col("doc_id")
        base = F.format_string(
            "https://WWW.h%d.Example/dir%d/sub/page.html",
            i % 997, i % 4)
        link = F.format_string(
            '<a href="/r/%d/x"></a><a href="rel%d/y"></a>'
            '<a href="../up%d"></a><a href="a/./b/../c%d"></a>',
            i % 31, i % 7, i % 13, i % 5)
        pages = ids(n).select(
            "doc_id", base.alias("base"),
            F.posexplode(html_links(link)).alias("link_idx", "ref"))
        res = resolve_url(F.col("base"), F.col("ref"))
        cand = pages.select(
            "doc_id", "link_idx", res.alias("url"),
            surt_key(res).alias("urlkey"))
        wk = Window.partitionBy("urlkey").orderBy("doc_id", "link_idx")
        return (cand.withColumn("_rn", F.row_number().over(wk))
                .filter("_rn = 1").count())

    def redirects(n: int) -> int:
        i = F.col("doc_id")
        p = i % 8
        status = F.when(p == 0, 200).otherwise(301)
        target = F.when(p == 0, F.lit(None).cast("string")) \
            .otherwise(F.format_string("k%d", i - 1))
        recs = ids(n).select(
            F.format_string("k%d", i).alias("urlkey"),
            status.alias("status"), target.alias("redirect_key"))
        return resolve_redirects(recs, max_hops=5).count()

    def gated(n: int) -> int:
        n_hosts = max(n // 50, 1)
        hh = F.col("doc_id") % n_hosts
        robots = (spark.range(n_hosts)
                  .select(F.col("id").alias("doc_id"),
                          F.format_string(
                              "User-agent: Bot\nDisallow: /d%d/\n"
                              "Allow: /d%d/ok*\nCrawl-delay: %d\n",
                              F.col("id"), F.col("id"),
                              1 + F.col("id") % 5).alias("robots")))
        rules = robots_rules(robots).withColumn(
            "host", F.format_string("h%d", F.col("doc_id")))
        urls = ids(n).select(
            F.format_string("h%d", hh).alias("host"),
            F.format_string("/d%d/ok%d", hh, F.col("doc_id"))
            .alias("url"))
        allowed = robots_gate(urls, rules, agent="Bot") \
            .filter("allowed").select("url", "host")
        return fetch_schedule(allowed, rules, agent="Bot").count()

    for name, fn in (("frontier", frontier), ("redirects", redirects),
                     ("gate_schedule", gated)):
        for mult in (1, 4, 16):
            n = n_base * mult
            t0 = time.time()
            rows = fn(n)
            print(json.dumps({
                "op": name, "scale": mult, "n_items": n, "rows": rows,
                "wall_sec": round(time.time() - t0, 2),
            }))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
