"""table-cardinality CLI (SURVEY C3).

Reference: lwetl/programs/table_cardinality — per-column profile
(non-null / distinct / duplicate counts) for one table or all tables,
duplicate histograms per column, multi-sheet XLSX or text output.

    python -m lwetl_spark.cli_cardinality [-d SF_DIR] [TABLE]
        [--histogram COLUMN] [-m MAX_ROWS] [-o report.xlsx] [--approx]
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lwetl-spark-cardinality",
        description="per-column cardinality profile over parquet tables",
    )
    p.add_argument("table", nargs="?", help="table name (default: every table)")
    p.add_argument("-d", "--data-dir", default=None, help="parquet table directory")
    p.add_argument("--histogram", metavar="COLUMN", help="duplicate histogram for one column")
    p.add_argument("-m", "--max-rows", type=int, default=50, help="histogram cap (reference 50)")
    p.add_argument("-o", "--output", help="write XLSX report instead of text")
    p.add_argument(
        "--approx", action="store_true",
        help="HLL distinct counts (the 100 TB mode) instead of exact",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from lwetl_spark.catalog import DEFAULT_SF_DIR, register_tables
    from lwetl_spark.operators.cardinality import column_cardinality, table_cardinality
    from lwetl_spark.session import get_spark
    from lwetl_spark.sinks.formatter import format_text_table

    spark = get_spark(app_name="lwetl_spark_cardinality")
    tables = register_tables(spark, args.data_dir or DEFAULT_SF_DIR)
    names = [args.table] if args.table else sorted(tables)

    reports = []
    for t in names:
        if t not in tables:
            print(f"unknown table {t!r}")
            return 1
        if args.histogram:
            df = column_cardinality(tables[t], args.histogram, max_rows=args.max_rows)
        else:
            df = table_cardinality(tables[t], exact=not args.approx)
        reports.append((t, df))

    if args.output:
        # multi-sheet XLSX like the reference's report (main.py:88-91)
        from lwetl_spark.sinks.formatter import write_xlsx_sheets

        write_xlsx_sheets(reports, args.output, max_rows=10_000)
        print(f"wrote {args.output}")
        return 0

    for t, df in reports:
        print(f"== {t}")
        print(format_text_table(df, max_rows=args.max_rows), end="")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
