"""Config registry tests (SURVEY §1.1 — lwetl/config_parser.py parity):
merge order, alias chains, typed unknown-source errors, source opening."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture()
def cfg_files(tmp_path):
    a = tmp_path / "a.yml"
    b = tmp_path / "b.yml"
    a.write_text(
        f"""
sources:
  smoke: {{path: {SF_SMOKE}, format: parquet_dir}}
  other: {{path: /nonexistent, format: parquet_dir}}
alias:
  default: smoke
  d2: default
"""
    )
    b.write_text(
        """
sources:
  other: {path: /still/nowhere, format: parquet_dir}
alias:
  loop_a: loop_b
  loop_b: loop_a
"""
    )
    return [str(a), str(b)]


def test_merge_later_wins(cfg_files):
    from lwetl_spark.config import load_config

    cfg = load_config(cfg_files)
    assert cfg["sources"]["other"]["path"] == "/still/nowhere"  # b overrides a
    assert cfg["sources"]["smoke"]["path"] == SF_SMOKE  # a survives


def test_alias_chain_and_errors(cfg_files):
    from lwetl_spark.config import UnknownSourceError, load_config, resolve_source

    cfg = load_config(cfg_files)
    assert resolve_source(cfg, "d2")["path"] == SF_SMOKE  # d2 -> default -> smoke
    with pytest.raises(UnknownSourceError):
        resolve_source(cfg, "nope")
    with pytest.raises(UnknownSourceError):
        resolve_source(cfg, "loop_a")


def test_open_source_and_probe(spark, cfg_files):
    from lwetl_spark.config import load_config, open_source, probe

    cfg = load_config(cfg_files)
    tables = open_source(spark, cfg, "default")
    assert "region" in tables and tables["region"].count() == 5
    counts = probe(spark, cfg, "smoke")
    assert counts["region"] == 5 and counts["nation"] == 25


def test_open_csv_source(spark, tmp_path):
    from lwetl_spark.config import load_config, open_source

    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    cfgf = tmp_path / "c.yml"
    cfgf.write_text(f"sources:\n  t: {{path: {csv}, format: csv, options: {{delimiter: ','}}}}\n")
    df = open_source(spark, load_config([str(cfgf)]), "t")
    assert df.count() == 2 and df.columns == ["A", "B"]  # normalized names


def test_secret_roundtrip_and_passthrough(monkeypatch):
    from lwetl_spark.config import (
        SecurityError,
        decrypt_value,
        encrypt_value,
        generate_key,
        resolve_options,
    )

    key = generate_key()
    token = encrypt_value("s3cret", key=key)
    assert token.startswith("ENC:") and "s3cret" not in token
    assert decrypt_value(token, key=key) == "s3cret"
    assert decrypt_value("plaintext", key=key) == "plaintext"  # passthrough
    opts = resolve_options({"password": token, "user": "bob", "n": 3}, key=key)
    assert opts == {"password": "s3cret", "user": "bob", "n": 3}
    # wrong key → typed error (reference parity: typed auth errors)
    import pytest as _pytest

    with _pytest.raises(SecurityError):
        decrypt_value(token, key=generate_key())
    # env-chain: key resolvable from $LWETL_SPARK_KEY
    monkeypatch.setenv("LWETL_SPARK_KEY", key)
    assert decrypt_value(token) == "s3cret"


def test_secret_missing_key_raises(monkeypatch, tmp_path):
    from lwetl_spark import config as C

    monkeypatch.delenv("LWETL_SPARK_KEY", raising=False)
    monkeypatch.setattr(C, "_KEY_FILE", str(tmp_path / "nokey"))
    import pytest as _pytest

    with _pytest.raises(C.SecurityError):
        C.encrypt_value("x")


def test_keyring_key_lookup(monkeypatch):
    """Reference parity (lwetl/security.py): the Fernet key resolves from
    the OS keyring when a backend exists, between the env var and the
    key file; module/backend absence falls through silently."""
    import sys
    import types

    from cryptography.fernet import Fernet

    from lwetl_spark import config as cfg

    key = Fernet.generate_key().decode()
    fake = types.ModuleType("keyring")
    calls = []

    def get_password(service, user):
        calls.append((service, user))
        return key

    fake.get_password = get_password
    monkeypatch.setitem(sys.modules, "keyring", fake)
    monkeypatch.delenv("LWETL_SPARK_KEY", raising=False)

    token = cfg.encrypt_value("s3cret")
    assert cfg.decrypt_value(token) == "s3cret"
    assert calls and calls[0] == ("lwetl_spark", "fernet_key")

    # env var wins over keyring
    calls.clear()
    monkeypatch.setenv("LWETL_SPARK_KEY", key)
    cfg.decrypt_value(token)
    assert calls == []
