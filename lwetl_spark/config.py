"""Named-source config registry (SURVEY §1.1 / §3.1 step 2).

Reference: lwetl/config_parser.py — YAML configs merged from a lookup
chain (module dir → /etc/lwetl → ~/.lwetl → cwd, later wins), defining
named drivers/servers/logins plus string aliases; `Jdbc(login)` resolves
a name through the alias chain to a connection.

Spark form: a "connection" is a named data source — a parquet table
directory (the common case), or a single file in any supported format.
The YAML shape:

    sources:
      prod:   {path: /data/prod, format: parquet_dir}
      events: {path: /data/ev.csv, format: csv, options: {delimiter: ","}}
    alias:
      default: prod

No credentials exist (file-system permissions replace logins), so the
reference's Fernet password encryption (C4, lwetl/security.py) has no
analog in the data plane; the `test` connectivity probe survives as
`probe()` (table count, like lwetl_security's table-count check).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: lookup chain, later entries override earlier (config_parser.py:53-60)
DEFAULT_LOCATIONS = (
    "/etc/lwetl_spark/config.yml",
    "~/.lwetl_spark.yml",
    "./lwetl_spark.yml",
)


def load_config(paths: list[str] | None = None) -> dict:
    """Merge YAML configs along the lookup chain; later files override
    earlier ones key-by-key within `sources` and `alias` (the reference
    merges section-wise, config_parser.py:190-226)."""
    import yaml

    merged: dict = {"sources": {}, "alias": {}}
    for p in paths if paths is not None else DEFAULT_LOCATIONS:
        p = os.path.expanduser(p)
        if not os.path.isfile(p):
            continue
        with open(p, encoding="utf-8") as fh:
            doc = yaml.safe_load(fh) or {}
        merged["sources"].update(doc.get("sources") or {})
        merged["alias"].update(doc.get("alias") or {})
    return merged


class UnknownSourceError(KeyError):
    """Reference parity: unknown service names raise a typed error
    (tests/test.py:70-91)."""


def resolve_source(cfg: dict, name: str) -> dict:
    """Follow the alias chain to a source definition (cycle-safe, like
    the reference's credential alias resolve, config_parser.py:86-146)."""
    seen: set[str] = set()
    while name in cfg.get("alias", {}):
        if name in seen:
            raise UnknownSourceError(f"alias cycle at {name!r}")
        seen.add(name)
        name = cfg["alias"][name]
    src = cfg.get("sources", {}).get(name)
    if src is None:
        raise UnknownSourceError(name)
    if "path" not in src:
        raise UnknownSourceError(f"source {name!r} has no path")
    return dict(src)


def open_source(
    spark: SparkSession, cfg: dict, name: str
) -> dict[str, DataFrame] | DataFrame:
    """Open a named source: a parquet directory registers every table as
    a view (returns {table: DataFrame}); a single-file source returns one
    DataFrame."""
    src = resolve_source(cfg, name)
    fmt = src.get("format", "parquet_dir")
    opts = resolve_options(src.get("options") or {})
    if fmt == "parquet_dir":
        from lwetl_spark.catalog import register_tables

        return register_tables(spark, src["path"])
    if fmt == "parquet":
        return spark.read.options(**opts).parquet(src["path"])
    if fmt == "csv":
        from lwetl_spark.sources.csv import csv_source

        return csv_source(spark, src["path"], delimiter=opts.get("delimiter", "\t"))
    if fmt == "ldif":
        from lwetl_spark.sources.ldif import ldif_source

        return ldif_source(spark, src["path"], separator=opts.get("separator", "|"))
    if fmt == "xlsx":
        from lwetl_spark.sources.xlsx import xlsx_source

        return xlsx_source(spark, src["path"], sheet=opts.get("sheet"))
    if fmt == "jdbc":
        # path = JDBC URL; options carry dbtable/query + credentials.
        # ENC:-prefixed options (e.g. password) were already decrypted by
        # resolve_options above — the reference's encrypted-credential
        # store (lwetl/config_parser.py:86-146) in Spark form.
        from lwetl_spark.sources.jdbc import jdbc_source

        table = opts.pop("dbtable", None)
        query = opts.pop("query", None)
        return jdbc_source(spark, src["path"], table=table, query=query, options=opts)
    raise UnknownSourceError(f"source {name!r}: unknown format {fmt!r}")


def probe(spark: SparkSession, cfg: dict, name: str) -> dict[str, int]:
    """Connectivity probe (lwetl-security `test` command analog,
    lwetl/programs/lwetl_security/main.py): open the source and count
    tables/rows cheaply."""
    out = open_source(spark, cfg, name)
    if isinstance(out, dict):
        return {t: df.count() for t, df in out.items()}
    return {"rows": out.count()}


# -- C4: secret handling (lwetl-security analog) ---------------------------

SECRET_PREFIX = "ENC:"
_KEY_ENV = "LWETL_SPARK_KEY"
_KEY_FILE = "~/.lwetl_spark.key"


class SecurityError(RuntimeError):
    """Typed error for missing/invalid encryption keys (reference parity:
    lwetl/security.py raises on absent keyring entries)."""


#: OS-keyring coordinates, matching the reference's storage
#: (lwetl/security.py uses the system keyring for the Fernet key)
_KEYRING_SERVICE = "lwetl_spark"
_KEYRING_USER = "fernet_key"


def _keyring_key() -> str | None:
    """Reference-parity keyring lookup (lwetl/security.py), gated behind
    an import-try: headless clusters rarely have a keyring backend, so
    absence of the module or of a backend is silent and the env-var /
    key-file chain takes over."""
    try:
        import keyring
    except ImportError:
        return None
    try:
        return keyring.get_password(_KEYRING_SERVICE, _KEYRING_USER)
    except keyring.errors.KeyringError:  # no backend / locked store
        return None


def _fernet(key: str | bytes | None = None):
    from cryptography.fernet import Fernet

    if key is None:
        key = os.environ.get(_KEY_ENV)
    if key is None:
        key = _keyring_key()
    if key is None:
        kf = os.path.expanduser(_KEY_FILE)
        if os.path.isfile(kf):
            with open(kf, "rb") as fh:
                key = fh.read().strip()
    if not key:
        raise SecurityError(
            f"no encryption key: set ${_KEY_ENV}, store one in the OS "
            f"keyring ({_KEYRING_SERVICE}/{_KEYRING_USER}), or create {_KEY_FILE}"
        )
    try:
        return Fernet(key)
    except Exception as e:  # invalid key material
        raise SecurityError(f"invalid Fernet key: {e}") from e


def generate_key(path: str | None = None) -> str:
    """Generate a Fernet key; optionally persist it 0600 (the reference
    stores its key in the OS keyring, lwetl/security.py — a key file is
    the headless-cluster equivalent)."""
    from cryptography.fernet import Fernet

    key = Fernet.generate_key().decode()
    if path:
        p = os.path.expanduser(path)
        with open(p, "w", encoding="utf-8") as fh:
            fh.write(key)
        os.chmod(p, 0o600)
    return key


def encrypt_value(value: str, key: str | bytes | None = None) -> str:
    """Encrypt a config option value → ``ENC:<token>`` (the reference's
    `encrypt` command over config passwords,
    lwetl/programs/lwetl_security/main.py)."""
    return SECRET_PREFIX + _fernet(key).encrypt(value.encode()).decode()


def decrypt_value(value: str, key: str | bytes | None = None) -> str:
    """Decrypt an ``ENC:``-prefixed value; plaintext passes through
    (like the reference, which only decrypts marked passwords)."""
    if not value.startswith(SECRET_PREFIX):
        return value
    from cryptography.fernet import InvalidToken

    try:
        return _fernet(key).decrypt(value[len(SECRET_PREFIX):].encode()).decode()
    except InvalidToken as e:
        raise SecurityError("secret does not decrypt with this key") from e


def resolve_options(options: dict, key: str | bytes | None = None) -> dict:
    """Decrypt every ``ENC:`` option value at source-resolve time — the
    shape credentials take when a source is a JDBC/S3 location in a real
    deployment (options dicts feed spark.read.options verbatim)."""
    return {
        k: decrypt_value(v, key) if isinstance(v, str) else v
        for k, v in options.items()
    }
