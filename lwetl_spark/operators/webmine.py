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

__all__ = ["html_tables"]


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
