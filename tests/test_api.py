"""Programmatic API facade tests (SURVEY §3.3 — the reference's md5
read-transform-write example and the Jdbc probe surface)."""

from __future__ import annotations

from collections import OrderedDict

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def etl(spark):
    from lwetl_spark.api import SparkEtl

    return SparkEtl(SF_SMOKE, spark=spark)


def test_query_rows_tuple(etl):
    rows = list(etl.query("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"))
    assert rows[0] == (0, "AFRICA") and len(rows) == 5


def test_query_rows_dict_drops_empty(etl):
    rows = list(
        etl.query(
            "SELECT r_regionkey, NULLIF(r_name, 'AFRICA') AS maybe FROM region ORDER BY r_regionkey",
            return_type=OrderedDict,
        )
    )
    assert "maybe" not in rows[0]  # None dropped (reference dict-row semantics)
    assert rows[1]["maybe"] == "AMERICA"


def test_query_max_rows(etl):
    assert len(list(etl.query("SELECT * FROM nation", max_rows=7))) == 7


def test_parameterized_named(etl):
    n = etl.get_int(
        "SELECT COUNT(*) FROM customer WHERE c_mktsegment = :seg", {"seg": "BUILDING"}
    )
    assert n > 0


def test_parameterized_positional(etl):
    got = etl.query_single_value(
        "SELECT r_name FROM region WHERE r_regionkey = ?", [2]
    )
    assert got == "ASIA"


def test_single_probes(etl):
    assert etl.query_single("SELECT 1 AS a, 2 AS b") == (1, 2)
    assert etl.query_single("SELECT 1 WHERE 1=0") is None
    assert etl.query_single_value("SELECT 42") == 42
    assert etl.get_int("SELECT NULL") == 0
    assert etl.get_int("SELECT MAX(o_orderkey) FROM orders") > 0


def test_get_columns(etl):
    cols = etl.get_columns("region")
    assert list(cols) == ["R_REGIONKEY", "R_NAME"]


def test_md5_readme_example(etl, spark):
    """The reference's flagship README example (README.rst:99-115): add an
    md5 row-hash column — one expression instead of a cursor loop."""
    from pyspark.sql import functions as F

    from lwetl_spark.functions.scalars import md5_row_hash

    df = etl.tables["customer"]
    out = df.withColumn("HASH_VALUE", md5_row_hash(*[F.col(c) for c in df.columns]))
    row = out.take(1)[0]
    assert len(row["HASH_VALUE"]) == 32


def test_engine_info(spark):
    """S9: driver/engine metadata dump (reference JdbcInfo, jdbc_info.py:7-99)."""
    from lwetl_spark.catalog import engine_info

    rows = {r["PROPERTY"]: r["VALUE"] for r in engine_info(spark).collect()}
    assert rows["spark.version"] == spark.version
    assert rows["spark.sql.adaptive.enabled"] == "true"
