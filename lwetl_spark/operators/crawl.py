"""Crawl-INDEX operators (late r11): the selection layer in front of
the WARC ingest loops — CDX-J record parsing and robots.txt rule
extraction + URL gating.

A 100 TB crawl pipeline reads the INDEX first: it picks (urlkey,
offset, length) ranges out of the CDX and checks robots rules BEFORE
touching a single WARC byte, because the index is ~1/1000th the size
of the payload.  These operators supply that layer for the engine's
media.warc_payloads → campaign loops (reference parity: lwetl's query
surface has no crawl side at all — this extends the SURVEY §2.10
ingest story the same way the WARC/PDF loops did).

Everything here is pure Catalyst — string/JSON expressions and
equi-joins, no Python in any hot path (the SRT/`bmp_dims` precedent:
text-structured formats parse as expressions, not Arrow passes).
Scale shapes:
- `cdx_records` is map-only; one CDX line never meets another.
- `robots_gate` joins urls ⋈ rules on host — a shuffle equi-join
  where BOTH sides grow with the corpus (never broadcast); rules per
  host are bounded (dozens), so per-pair wildcard matching is O(1)
  and AQE handles mega-host skew on the url side.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cdx_records", "robots_rules", "robots_gate",
           "sitemap_entries", "fetch_schedule", "resolve_redirects"]


#: struct schema of the CDX-J JSON payload (all strings in the wire
#: format; numeric casts happen after the parse)
_CDX_JSON = ("url string, mime string, status string, digest string,"
             " length string, offset string, filename string")


def cdx_records(df: DataFrame, line_col: str = "line",
                id_col: str = "doc_id") -> DataFrame:
    """Parse CDX-J index lines (the Common Crawl `cdx-*.gz` record
    shape): `<urlkey> <14-digit timestamp> <JSON>` per line, the JSON
    carrying url/mime/status/digest and the (filename, offset,
    length) triple that addresses the WARC range — exactly what an
    ingest loop fetches INSTEAD of scanning whole shards.

    Emits (id, urlkey, ts, url, mime, status, length, offset,
    filename, valid): `status` int, `length`/`offset` long (NULL when
    non-numeric), `valid` false when the line head is malformed, the
    timestamp is not 14 digits, or the JSON does not parse / lacks a
    url (from_json yields null fields on malformed input).  Pure
    Catalyst — regexp splits + from_json, map-only at any scale."""
    line = F.col(line_col)
    urlkey = F.regexp_extract(line, r"^(\S+) ", 1)
    ts = F.regexp_extract(line, r"^\S+ (\d{14}) ", 1)
    js = F.regexp_extract(line, r"^\S+ \S+ (\{.*\})\s*$", 1)
    p = F.from_json(js, _CDX_JSON)
    valid = (urlkey != "") & (ts != "") & p["url"].isNotNull()
    return df.select(
        F.col(id_col),
        F.when(valid, urlkey).alias("urlkey"),
        F.when(valid, ts).alias("ts"),
        p["url"].alias("url"),
        p["mime"].alias("mime"),
        p["status"].try_cast("int").alias("status"),
        p["length"].try_cast("long").alias("length"),
        p["offset"].try_cast("long").alias("offset"),
        p["filename"].alias("filename"),
        valid.alias("valid"),
    )


def robots_rules(df: DataFrame, text_col: str = "robots",
                 id_col: str = "doc_id") -> DataFrame:
    """Parse robots.txt bodies (RFC 9309) into one row per
    (agent, rule): lines split, comments stripped, groups formed the
    REP way — consecutive `User-agent:` lines open a group shared by
    all named agents, the `Allow:`/`Disallow:` lines that follow
    belong to that group until the next agent run.  `Sitemap:` lines
    are group-independent and emitted with agent NULL; `Crawl-delay:`
    lines (the de-facto politeness extension) bind to their group
    like allow/disallow — `fetch_schedule` consumes them.

    Emits (id, agent, directive, pattern, rule_idx) — directive in
    ('allow', 'disallow', 'crawl-delay', 'sitemap'), `rule_idx` the
    line order (stable tiebreak), empty-pattern rows dropped (an
    empty Disallow imposes no restriction, per the RFC).  Pure
    Catalyst: split + posexplode + two window passes over
    (id, line order) — map-side except the per-document windows,
    which shuffle only (id, line) rows, never the corpus."""
    w = Window.partitionBy("_id").orderBy("_pos")
    lines = (
        df.select(F.col(id_col).alias("_id"),
                  F.posexplode(F.split(F.col(text_col), "\r?\n"))
                  .alias("_pos", "_raw"))
        .select(
            "_id", "_pos",
            F.trim(F.regexp_replace("_raw", "#.*$", "")).alias("_ln"))
        .withColumn("_ua", F.regexp_extract(
            "_ln", r"(?i)^user-agent\s*:\s*(\S+)", 1))
        .withColumn("_dir", F.lower(F.regexp_extract(
            "_ln", r"(?i)^(allow|disallow|sitemap|crawl-delay)\s*:",
            1)))
        .withColumn("_val", F.trim(F.regexp_extract(
            "_ln",
            r"(?i)^(?:allow|disallow|sitemap|crawl-delay)\s*:\s*(\S*)",
            1)))
        .filter((F.col("_ua") != "") | (F.col("_dir") != ""))
    )
    # a user-agent line starts a NEW group iff the previous
    # significant line was not itself a user-agent line
    grouped = (
        lines
        .withColumn("_prev_ua", F.lag(
            (F.col("_ua") != "").cast("int"), 1, 0).over(w))
        .withColumn("_start", ((F.col("_ua") != "")
                               & (F.col("_prev_ua") == 0)).cast("int"))
        .withColumn("_grp", F.sum("_start").over(w))
    )
    agents = (
        grouped.filter(F.col("_ua") != "")
        .groupBy("_id", "_grp")
        .agg(F.collect_set(F.lower("_ua")).alias("_agents"))
    )
    rules = (
        grouped.filter(
            F.col("_dir").isin("allow", "disallow", "crawl-delay")
            & (F.col("_val") != ""))
        .join(agents, ["_id", "_grp"])
        .select("_id", F.explode("_agents").alias("agent"),
                F.col("_dir").alias("directive"),
                F.col("_val").alias("pattern"),
                F.col("_pos").cast("long").alias("rule_idx"))
    )
    sitemaps = (
        grouped.filter(F.col("_dir") == "sitemap")
        .select("_id", F.lit(None).cast("string").alias("agent"),
                F.lit("sitemap").alias("directive"),
                F.col("_val").alias("pattern"),
                F.col("_pos").cast("long").alias("rule_idx"))
    )
    return (rules.unionByName(sitemaps)
            .withColumnRenamed("_id", id_col))


def _rep_regex(pattern: Column) -> Column:
    """RFC 9309 wildcard pattern → Java/RE2 regex (both engines agree
    on this ASCII subset): regex specials escaped, `*` → `.*`, a
    TRAILING `$` anchors end-of-url, always anchored at the start."""
    ends = pattern.endswith("$")
    body = F.when(ends, pattern.substr(
        F.lit(1), F.length(pattern) - 1)).otherwise(pattern)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    esc = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), esc,
                    F.when(ends, F.lit("$")).otherwise(F.lit("")))


def robots_gate(urls: DataFrame, rules: DataFrame, agent: str = "*",
                url_col: str = "url", host_col: str = "host"
                ) -> DataFrame:
    """Gate URLs against parsed robots rules for one crawler agent
    (RFC 9309 §2.2.2): per host the MATCHING group is the one naming
    the agent, falling back to `*`; among matching rules the most
    specific (longest pattern) wins, ties break least-restrictive
    (allow); no matching rule — or no rules at all for the host —
    means allowed.

    `urls` carries (url_col, host_col) with url_col the PATH+QUERY
    part rules match against; `rules` is `robots_rules` output plus a
    host_col column.  Emits (url_col, host_col, allowed,
    matched_pattern, matched_directive).

    Scale shape: group selection reduces rules per (host, agent)
    FIRST (rule-side only — small), then ONE shuffle equi-join on
    host where both sides grow with the corpus (hash join, never
    broadcast); per-url matching is a bounded loop over that host's
    rules, and the longest-match pick is a per-url window over
    matched candidates only."""
    my = rules.filter(F.col("directive").isin("allow", "disallow")) \
        .withColumn("_spec", F.when(
            F.col("agent") == agent.lower(), 2).when(
            F.col("agent") == "*", 1))
    my = my.filter(F.col("_spec").isNotNull())
    best = my.groupBy(host_col).agg(F.max("_spec").alias("_best"))
    picked = (my.join(best, host_col)
              .filter(F.col("_spec") == F.col("_best"))
              .withColumn("_rx", _rep_regex(F.col("pattern"))))
    # rules grow with the corpus (one group set per host) — Catalyst
    # UNDERESTIMATES the exploded rule side, so pin the hash join
    # rather than risk a corpus-sized broadcast at scale
    cand = (urls.join(picked.hint("shuffle_hash"), host_col, "left")
            .withColumn("_m", F.expr(f"{url_col} rlike _rx")))
    # rank: matched rules first, then longest pattern, allow on
    # ties, line order as the stable tail
    wm = Window.partitionBy(host_col, url_col).orderBy(
        F.col("_m").desc_nulls_last(),
        F.length("pattern").desc_nulls_last(),
        F.when(F.col("directive") == "allow", 0).otherwise(1),
        F.col("rule_idx").asc_nulls_last())
    return (cand.withColumn("_rn", F.row_number().over(wm))
            .filter(F.col("_rn") == 1)
            .select(
                url_col, host_col,
                F.when(F.col("_m"), F.col("directive") == "allow")
                .otherwise(F.lit(True)).alias("allowed"),
                F.when(F.col("_m"), F.col("pattern"))
                .alias("matched_pattern"),
                F.when(F.col("_m"), F.col("directive"))
                .alias("matched_directive"),
            ))


def sitemap_entries(df: DataFrame, xml_col: str = "xml",
                    id_col: str = "doc_id") -> DataFrame:
    """Parse sitemap XML (sitemaps.org protocol — the discovery layer
    robots.txt `Sitemap:` lines point at): `<urlset>` documents yield
    one row per `<url>` entry (loc / lastmod / changefreq /
    priority), `<sitemapindex>` documents one row per child
    `<sitemap>` (loc / lastmod) with kind='index' so the caller can
    recurse.  Machine-generated sitemap XML is regular enough for
    expression parsing (the SRT/`bmp_dims` precedent): complete
    `<url>…</url>` blocks extract via regexp_extract_all, so a
    TRUNCATED document naturally keeps the entries closed before the
    cut (partial census; valid=false flags a payload with no
    recognized root).  Entries missing `<loc>` are dropped — loc is
    the protocol's one required field.  Pure Catalyst, map-only; one
    sitemap never meets another."""
    xml = F.col(xml_col)
    kind = F.when(xml.rlike("(?s)<\\s*urlset[\\s>]"), "urlset") \
        .when(xml.rlike("(?s)<\\s*sitemapindex[\\s>]"), "index") \
        .otherwise("invalid")
    blocks = F.when(
        kind == "urlset",
        F.regexp_extract_all(xml, F.lit(r"(?s)<url>(.*?)</url>"), 1),
    ).when(
        kind == "index",
        F.regexp_extract_all(
            xml, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(
        F.col(id_col), kind.alias("kind"),
        F.posexplode_outer(blocks).alias("entry_idx", "_b"))
    b = F.col("_b")
    loc = F.regexp_extract(b, r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    return (base.select(
        id_col, "kind", F.col("entry_idx").cast("long").alias("entry_idx"),
        loc.alias("loc"),
        F.regexp_extract(b, r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1)
        .alias("lastmod"),
        F.regexp_extract(
            b, r"(?s)<changefreq>\s*(.*?)\s*</changefreq>", 1)
        .alias("changefreq"),
        F.regexp_extract(b, r"(?s)<priority>\s*(.*?)\s*</priority>", 1)
        .alias("priority"),
        (F.col("kind") != "invalid").alias("valid"))
        .filter((F.col("loc") != "") | F.col("loc").isNull()
                | (F.col("kind") == "invalid")))


def fetch_schedule(urls: DataFrame, rules: DataFrame,
                   agent: str = "*", default_delay_s: int = 1,
                   url_col: str = "url", host_col: str = "host"
                   ) -> DataFrame:
    """Per-host politeness scheduling (the fetch layer after
    `robots_gate`): each host's delay is its matching group's
    `Crawl-delay` (agent-specific beats `*`, same precedence as the
    gate; `default_delay_s` when absent or non-numeric), and the
    host's URLs get consecutive fetch slots — url k of a host fetches
    at `k * delay_s * 1000` ms.  Slot order is `url_col` ascending
    (deterministic under any partitioning).

    Emits (url_col, host_col, delay_s, slot, fetch_at_ms).  Scale
    shape: the delay lookup reduces rules to ONE row per host before
    the join (hinted shuffle-hash — hosts grow with the corpus), and
    slot assignment is a per-host window: a mega-host's million URLs
    shuffle to one partition ONCE to be sequenced — inherent to
    politeness (the slots ARE a per-host total order), and the rows
    carried are (host, url) only."""
    cd = rules.filter(F.col("directive") == "crawl-delay") \
        .withColumn("_spec", F.when(
            F.col("agent") == agent.lower(), 2).when(
            F.col("agent") == "*", 1))
    cd = cd.filter(F.col("_spec").isNotNull())
    wd = Window.partitionBy(host_col).orderBy(
        F.col("_spec").desc(), F.col("rule_idx").asc())
    delays = (cd.withColumn("_rn", F.row_number().over(wd))
              .filter(F.col("_rn") == 1)
              .select(host_col,
                      F.coalesce(
                          F.col("pattern").try_cast("long"),
                          F.lit(int(default_delay_s)))
                      .alias("delay_s")))
    ws = Window.partitionBy(host_col).orderBy(url_col)
    return (urls.join(delays.hint("shuffle_hash"), host_col, "left")
            .withColumn("delay_s", F.coalesce(
                F.col("delay_s"), F.lit(int(default_delay_s))))
            .withColumn("slot",
                        (F.row_number().over(ws) - 1).cast("long"))
            .select(url_col, host_col, "delay_s", "slot",
                    (F.col("slot") * F.col("delay_s") * 1000)
                    .cast("long").alias("fetch_at_ms")))


def resolve_redirects(records: DataFrame, max_hops: int = 5,
                      key_col: str = "urlkey",
                      status_col: str = "status",
                      redirect_col: str = "redirect_key") -> DataFrame:
    """Follow CDX redirect chains to their landing record (the
    Common Crawl index stores a 3xx record's Location target as a
    `redirect` urlkey): starting from EVERY record, hop
    `redirect_col` → `key_col` while the current record is a 3xx
    with a target, up to ``max_hops`` joins.  Emits one row per
    start record — (key_col, final_key, final_status, hops,
    outcome) with outcome
    'ok'        landed on a non-3xx record,
    'dangling'  the target key has no record in the snapshot,
    'loop'      the chain revisited a key (cycle),
    'cap'       still redirecting after max_hops.

    Input cardinality: ONE record per urlkey — a real CDX holds
    multiple captures per key, so reduce to the chosen capture
    (latest timestamp, the usual policy) BEFORE resolving; duplicate
    keys would fan the hop joins out multiplicatively.

    Scale shape: ``max_hops`` bounded equi-joins on urlkey (the
    record side re-used each hop, hinted shuffle-hash — both sides
    are index-sized); only rows STILL redirecting re-join, so hop
    k's frontier is the (shrinking) 3xx tail; the visited-key array
    carried for loop detection is ≤ max_hops entries."""
    rec = records.select(
        F.col(key_col).alias("_k"),
        F.col(status_col).cast("int").alias("_s"),
        F.col(redirect_col).alias("_r"),
    ).hint("shuffle_hash")
    is3xx = (F.col("_s") >= 300) & (F.col("_s") < 400) \
        & F.col("_r").isNotNull()
    cur = records.select(
        F.col(key_col).alias("start"),
        F.col(key_col).alias("_k"),
        F.col(status_col).cast("int").alias("_s"),
        F.col(redirect_col).alias("_r"),
        F.lit(0).alias("hops"),
        F.array(F.col(key_col)).alias("_seen"),
        F.lit(None).cast("string").alias("outcome"),
    )
    done_parts = []
    for _ in range(max_hops):
        settled = cur.filter(F.col("outcome").isNotNull() | ~is3xx) \
            .withColumn("outcome", F.coalesce(F.col("outcome"),
                                              F.lit("ok")))
        done_parts.append(settled)
        frontier = cur.filter(F.col("outcome").isNull() & is3xx)
        stepped = (frontier.alias("f")
                   .join(rec.alias("t"),
                         F.col("f._r") == F.col("t._k"), "left")
                   .select(
                       F.col("f.start").alias("start"),
                       F.coalesce(F.col("t._k"), F.col("f._r"))
                       .alias("_k"),
                       F.col("t._s").alias("_s"),
                       F.col("t._r").alias("_r"),
                       (F.col("f.hops") + 1).alias("hops"),
                       F.array_append(F.col("f._seen"), F.col("f._r"))
                       .alias("_seen"),
                       F.when(F.col("t._k").isNull(), "dangling")
                       .when(F.array_contains(F.col("f._seen"),
                                              F.col("f._r")), "loop")
                       .alias("outcome"),
                   ))
        cur = stepped
    done_parts.append(cur.withColumn(
        "outcome",
        F.coalesce(F.col("outcome"),
                   F.when(is3xx, "cap").otherwise("ok"))))
    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    return out.select(
        F.col("start").alias(key_col),
        F.col("_k").alias("final_key"),
        F.col("_s").cast("long").alias("final_status"),
        F.col("hops").cast("long").alias("hops"),
        "outcome",
    )
