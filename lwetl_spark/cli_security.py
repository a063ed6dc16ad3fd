"""lwetl-security CLI (SURVEY C4).

Reference: lwetl/programs/lwetl_security/main.py — four commands over
config credentials: `encrypt` / `decrypt` config passwords with a
Fernet key held in the OS keyring (lwetl/security.py), plus `test`
(connectivity probe: connect and count tables).

Spark form over the named-source registry (`config.py`):

    python -m lwetl_spark.cli_security keygen [-o ~/.lwetl_spark.key]
    python -m lwetl_spark.cli_security encrypt VALUE
    python -m lwetl_spark.cli_security decrypt ENC:...
    python -m lwetl_spark.cli_security test SOURCE [-c config.yml]

The key comes from $LWETL_SPARK_KEY or ~/.lwetl_spark.key (the
headless-cluster equivalent of the reference's keyring); `test` opens
the named source and prints per-table row counts — the reference's
table-count probe.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lwetl-spark-security",
        description="config-secret utility + source connectivity probe",
    )
    sub = p.add_subparsers(dest="command", required=True)

    kg = sub.add_parser("keygen", help="generate a Fernet key")
    kg.add_argument("-o", "--output", help="persist key to file (chmod 0600)")

    en = sub.add_parser("encrypt", help="encrypt a value -> ENC:<token>")
    en.add_argument("value")

    de = sub.add_parser("decrypt", help="decrypt an ENC:<token> value")
    de.add_argument("value")

    te = sub.add_parser("test", help="connectivity probe for a named source")
    te.add_argument("source")
    te.add_argument("-c", "--config", action="append", help="config file path(s)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from lwetl_spark.config import (
        SecurityError,
        UnknownSourceError,
        decrypt_value,
        encrypt_value,
        generate_key,
    )

    try:
        if args.command == "keygen":
            key = generate_key(args.output)
            print(args.output if args.output else key)
            return 0
        if args.command == "encrypt":
            print(encrypt_value(args.value))
            return 0
        if args.command == "decrypt":
            print(decrypt_value(args.value))
            return 0
        # test: open the source, print table -> row count (reference's
        # connectivity + table-count probe)
        from lwetl_spark.config import load_config, probe
        from lwetl_spark.session import get_spark

        cfg = load_config(args.config)
        spark = get_spark(app_name="lwetl_spark_security_test")
        for table, n in sorted(probe(spark, cfg, args.source).items()):
            print(f"{table}\t{n}")
        return 0
    except (SecurityError, UnknownSourceError) as e:
        print(f"error: {e}")
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
