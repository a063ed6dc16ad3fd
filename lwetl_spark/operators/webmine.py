"""Content mining over crawled HTML (late r11): structured-data
extraction the text pipeline drops.

`html_text` deliberately flattens markup away; tables are the one
structure training pipelines mine SEPARATELY (table corpora,
fact-extraction, markdown-style linearization), so `html_tables`
lifts them into relational (table, row, col, cell) rows before the
flattening pass.  Pure Catalyst regexp over complete blocks — the
sitemap/SRT precedent — so extraction is a map-only codegen pass and
a truncated document keeps the tables closed before the cut.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lwetl_spark.functions.text import html_text

__all__ = ["html_tables", "feed_entries"]


def html_tables(df: DataFrame, html_col: str = "html",
                id_col: str = "doc_id") -> DataFrame:
    """One row per table CELL across a page's `<table>` blocks:
    (id, table_idx, row_idx, col_idx, is_header, cell) — cell text
    runs through the same `html_text` strip/entity/whitespace chain
    as the page pipeline, `is_header` marks `<th>` cells.  `<tr>` and
    `<t[dh]>` blocks match case-insensitively with attributes
    tolerated; a document with no tables yields no rows (census
    callers count per id).  NESTED tables are out of scope by
    construction — the non-greedy block match closes the outer table
    at the first `</table>`, so inner tables surface as their own
    (partial) blocks rather than recursively; flat data tables (the
    overwhelming crawl population) extract exactly.  Three
    posexplode stages, zero joins, zero Python — map-only at any
    scale."""
    tables = F.regexp_extract_all(
        F.col(html_col), F.lit(r"(?is)<table[^>]*>(.*?)</table>"), 1)
    t = df.select(
        F.col(id_col),
        F.posexplode(tables).alias("table_idx", "_tbl"))
    rows = F.regexp_extract_all(
        F.col("_tbl"), F.lit(r"(?is)<tr[^>]*>(.*?)</tr>"), 1)
    r = t.select(
        id_col, "table_idx",
        F.posexplode(rows).alias("row_idx", "_row"))
    cells = F.regexp_extract_all(
        F.col("_row"), F.lit(r"(?is)(<t[dh][^>]*>.*?</t[dh]>)"), 1)
    c = r.select(
        id_col, "table_idx", "row_idx",
        F.posexplode(cells).alias("col_idx", "_cell"))
    return c.select(
        id_col,
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.col("col_idx").cast("long").alias("col_idx"),
        F.col("_cell").rlike(r"(?i)^<th").alias("is_header"),
        html_text(F.col("_cell")).alias("cell"),
    )


def feed_entries(df: DataFrame, xml_col: str = "xml",
                 id_col: str = "doc_id") -> DataFrame:
    """Parse syndication feeds — RSS 2.0 `<item>` blocks and Atom
    `<entry>` blocks — into one row per entry: (id, kind, entry_idx,
    title, link, updated, guid, valid).  The crawl-discovery sibling
    of `sitemap_entries`: feeds are how update-driven recrawl finds
    fresh URLs without re-walking sites.  RSS links are element text
    (`<link>url</link>`, `updated` from `<pubDate>`, `guid` from
    `<guid>`); Atom links are the `href` attribute (the
    rel="alternate" or first `<link>`), `updated` from `<updated>`,
    `guid` from `<id>`.  Titles strip markup/entities through the
    page chain.  A payload with neither root yields one invalid
    sentinel row; complete blocks before a truncation survive (the
    sitemap contract).  Pure Catalyst, map-only."""
    xml = F.col(xml_col)
    kind = F.when(xml.rlike(r"(?is)<\s*rss[\s>]"), "rss") \
        .when(xml.rlike(r"(?is)<\s*feed[\s>]"), "atom") \
        .otherwise("invalid")
    blocks = F.when(
        kind == "rss",
        F.regexp_extract_all(xml, F.lit(r"(?s)<item>(.*?)</item>"), 1),
    ).when(
        kind == "atom",
        F.regexp_extract_all(
            xml, F.lit(r"(?s)<entry>(.*?)</entry>"), 1),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(
        F.col(id_col), kind.alias("kind"),
        F.posexplode_outer(blocks).alias("entry_idx", "_b"))
    b = F.col("_b")
    rss_link = F.regexp_extract(b, r"(?s)<link>\s*(.*?)\s*</link>", 1)
    atom_link = F.coalesce(
        F.nullif(F.regexp_extract(
            b, r"(?is)<link[^>]*rel=[\"']alternate[\"'][^>]*"
               r"href=[\"']([^\"']*)[\"']", 1), F.lit("")),
        F.regexp_extract(
            b, r"(?is)<link[^>]*href=[\"']([^\"']*)[\"']", 1))
    updated = F.when(
        F.col("kind") == "rss",
        F.regexp_extract(b, r"(?s)<pubDate>\s*(.*?)\s*</pubDate>", 1),
    ).otherwise(F.regexp_extract(
        b, r"(?s)<updated>\s*(.*?)\s*</updated>", 1))
    guid = F.when(
        F.col("kind") == "rss",
        F.regexp_extract(b, r"(?s)<guid[^>]*>\s*(.*?)\s*</guid>", 1),
    ).otherwise(F.regexp_extract(b, r"(?s)<id>\s*(.*?)\s*</id>", 1))
    return base.select(
        id_col, "kind",
        F.col("entry_idx").cast("long").alias("entry_idx"),
        html_text(F.regexp_extract(
            b, r"(?s)<title[^>]*>(.*?)</title>", 1)).alias("title"),
        F.when(F.col("kind") == "rss", rss_link)
        .otherwise(atom_link).alias("link"),
        updated.alias("updated"),
        guid.alias("guid"),
        (F.col("kind") != "invalid").alias("valid"),
    )


def page_meta(df: DataFrame, html_col: str = "html",
              id_col: str = "doc_id") -> DataFrame:
    """Page-metadata census — the head fields crawl curation filters
    on BEFORE reading body text: `<title>`, the description and
    robots `<meta name=...>` values, OpenGraph `og:title` /
    `og:image` (`<meta property=...>`), and the `<link
    rel="canonical">` href.  Attribute order varies in the wild, so
    each field matches both name-first and content-first forms; the
    robots value lowercases (a `noindex` there is an admission-gate
    signal with legal weight); absent fields are empty strings.
    One row per document, pure Catalyst, map-only."""
    h = F.col(html_col)

    def meta(attr: str, key: str):
        a = F.regexp_extract(h, rf"""(?is)<meta\s[^>]*{attr}\s*=\s*["']{key}["'][^>]*content\s*=\s*["']([^"']*)["']""", 1)
        b = F.regexp_extract(h, rf"""(?is)<meta\s[^>]*content\s*=\s*["']([^"']*)["'][^>]*{attr}\s*=\s*["']{key}["']""", 1)
        return F.coalesce(F.nullif(a, F.lit("")), F.nullif(b, F.lit("")),
                          F.lit(""))

    canonical = F.coalesce(
        F.nullif(F.regexp_extract(
            h, r"""(?is)<link\s[^>]*rel\s*=\s*["']canonical["'][^>]*href\s*=\s*["']([^"']*)["']""", 1), F.lit("")),
        F.nullif(F.regexp_extract(
            h, r"""(?is)<link\s[^>]*href\s*=\s*["']([^"']*)["'][^>]*rel\s*=\s*["']canonical["']""", 1), F.lit("")),
        F.lit(""))
    return df.select(
        F.col(id_col),
        html_text(F.regexp_extract(
            h, r"(?is)<title[^>]*>(.*?)</title>", 1)).alias("title"),
        meta("name", "description").alias("description"),
        F.lower(meta("name", "robots")).alias("robots"),
        meta("property", "og:title").alias("og_title"),
        meta("property", "og:image").alias("og_image"),
        canonical.alias("canonical"),
    )


def jsonld_blocks(df: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """Extract schema.org JSON-LD — the structured-data channel
    (`<script type="application/ld+json">`) product/article/event
    miners read: one row per block with its `@type`, `name`, and
    `url` top-level fields plus the raw block for downstream
    from_json with richer schemas.  `parsed` is false for blocks
    whose JSON is malformed (fields null) — never a crash.  Pure
    Catalyst (regexp + from_json), map-only; documents without
    blocks yield no rows."""
    blocks = F.regexp_extract_all(
        F.col(html_col),
        F.lit(r"""(?is)<script[^>]*type\s*=\s*["']application/ld\+json["'][^>]*>(.*?)</script>"""), 1)
    base = df.select(
        F.col(id_col),
        F.posexplode(blocks).alias("block_idx", "_raw"))
    p = F.from_json(
        F.col("_raw"), "`@type` string, name string, url string")
    return base.select(
        id_col,
        F.col("block_idx").cast("long").alias("block_idx"),
        p["@type"].alias("ld_type"),
        p["name"].alias("name"),
        p["url"].alias("url"),
        p["@type"].isNotNull().alias("parsed"),
        F.trim(F.col("_raw")).alias("raw"),
    )
