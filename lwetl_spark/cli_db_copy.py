"""db-copy CLI (SURVEY C2).

Reference: lwetl/programs/db_copy/cmdline.py — copy/sync every common
table between two databases with modes empty|new|update|sync, a plan-only
flag (-l), and rollback-by-default unless activated (-a).

    python -m lwetl_spark.cli_db_copy SRC_DIR TRG_DIR -m new \
        [--pk table=col ...] [-l] [-a] [--fk child=parent ...]
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lwetl-spark-db-copy",
        description="copy/sync parquet table directories (reference db-copy)",
    )
    p.add_argument("src", help="source table directory")
    p.add_argument("trg", help="target table directory")
    p.add_argument(
        "-m", "--mode", default="new", choices=["empty", "new", "update", "sync"],
        help="copy mode (reference db_copy/cmdline.py:19-28)",
    )
    p.add_argument(
        "--pk", action="append", default=[], metavar="TABLE=COL",
        help="primary key per table (repeatable); tables without one are skipped",
    )
    p.add_argument(
        "--fk", action="append", default=[], metavar="CHILD=PARENT",
        help="FK dependency for topological copy order (repeatable)",
    )
    p.add_argument(
        "-l", "--list", action="store_true",
        help="print the copy plan and exit (reference -l)",
    )
    p.add_argument(
        "-a", "--activate", action="store_true",
        help="actually write; default stages only (reference rollback default)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from lwetl_spark.plans.db_copy import db_copy, plan_copy
    from lwetl_spark.session import get_spark

    pks = dict(kv.split("=", 1) for kv in args.pk)
    fks: dict[str, set[str]] = {}
    for kv in args.fk:
        child, parent = kv.split("=", 1)
        fks.setdefault(child, set()).add(parent)

    spark = get_spark(app_name="lwetl_spark_db_copy")
    if args.list:
        plan = plan_copy(spark, args.src, args.trg, fks)
        print("order:", " ".join(plan.order))
        for t, (n_src, n_trg) in sorted(plan.counts.items()):
            tag = "missing" if t in plan.missing_in_target else "common"
            print(f"{t}: src={n_src} trg={n_trg} [{tag}]")
        return 0

    stats = db_copy(
        spark, args.src, args.trg, pks=pks, mode=args.mode, fks=fks, activate=args.activate
    )
    for t, st in stats.items():
        line = " ".join(f"{k}={v}" for k, v in st.items() if v)
        print(f"{t}: {line or 'no-op'}")
    if not args.activate:
        print("# staged only — rerun with -a/--activate to write (reference rollback default)")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
