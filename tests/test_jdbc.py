"""Live JDBC end-to-end smoke (VERDICT r1 #3) — closes the reference's
core-path parity hole: lwetl IS a JDBC client (lwetl/jdbc.py:423-425,
508-601); here the same read/transform/write loop runs through Spark's
JDBC source/sink against embedded Apache Derby, which ships on Spark's
own classpath (derby*.jar), so no external database or driver install
is needed.  Skips cleanly if the Derby driver is absent.
"""

from __future__ import annotations

import os

import pytest


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


@pytest.fixture
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("no Derby JDBC driver on the classpath")
    os.environ.setdefault("DERBY_STREAM_ERROR_FILE", str(tmp_path / "derby.log"))
    return f"jdbc:derby:{tmp_path}/smokedb;create=true"


def test_jdbc_roundtrip_read_transform_writeback(spark, derby_url):
    """write → partitioned read → transform → write-back → verify: the
    reference's whole execution loop (jdbc.py:508-601 + uploader
    batches) in one pass over a live database."""
    from pyspark.sql import functions as F

    from lwetl_spark.sources.jdbc import jdbc_sink, jdbc_source

    src = spark.range(200).select(
        F.col("id"), (F.col("id") % 7).alias("grp"), (F.col("id") * 2.5).alias("v")
    )
    jdbc_sink(src, derby_url, "facts", mode="overwrite")

    # partitioned scan: 4 concurrent range queries (the 100 TB read shape)
    back = jdbc_source(
        spark,
        derby_url,
        table="facts",
        partition_column="id",
        lower_bound=0,
        upper_bound=200,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 200

    agg = back.groupBy("grp").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("sv")
    )
    jdbc_sink(agg, derby_url, "fact_agg", mode="overwrite")

    final = jdbc_source(spark, derby_url, table="fact_agg")
    rows = {r["grp"]: (r["n"], r["sv"]) for r in final.collect()}
    expect = {
        r["grp"]: (r["n"], r["sv"])
        for r in src.groupBy("grp")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("sv"))
        .collect()
    }
    assert rows == expect


def test_jdbc_predicate_pushdown_and_query_form(spark, derby_url):
    """Filters on a JDBC DataFrame run IN the database (pushDownPredicate
    default); the query= form mirrors the reference's SQL dispatch
    (sql_query/main.py:292-307)."""
    from lwetl_spark.sources.jdbc import jdbc_sink, jdbc_source

    src = spark.range(50).selectExpr("id", "id % 5 as m")
    jdbc_sink(src, derby_url, "push", mode="overwrite")

    filtered = jdbc_source(spark, derby_url, table="push").filter("m = 3")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "m" in plan.split("PushedFilters")[-1], plan
    assert filtered.count() == 10

    # raw-query form: Spark's JDBC writer creates quoted (case-exact)
    # identifiers, so the pass-through SQL must quote them for Derby
    q = jdbc_source(
        spark,
        derby_url,
        query='SELECT "m" AS "m", COUNT(*) AS "n" FROM push GROUP BY "m"',
    )
    assert {(r["m"], r["n"]) for r in q.collect()} == {(i, 10) for i in range(5)}


def test_jdbc_append_batching(spark, derby_url):
    """Append mode with the reference's commit-batch size (2000) and a
    bounded connection count (one per partition)."""
    from lwetl_spark.sources.jdbc import jdbc_sink, jdbc_source

    a = spark.range(30).selectExpr("id", "'a' as src")
    b = spark.range(30, 45).selectExpr("id", "'b' as src")
    # Derby maps StringType to CLOB by default, which rejects pushed-down
    # equality filters — pin a comparable VARCHAR via createTableColumnTypes
    ddl = {"createTableColumnTypes": "src VARCHAR(10)"}
    jdbc_sink(a, derby_url, "appended", mode="overwrite", num_connections=2, options=ddl)
    jdbc_sink(b, derby_url, "appended", mode="append", num_connections=1, options=ddl)
    back = jdbc_source(spark, derby_url, table="appended")
    assert back.count() == 45
    assert back.filter("src = 'b'").count() == 15
