"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle is run on Spark AND DuckDB at sf0.01 and compared
order-insensitively (row count + column names + values).

Float columns are compared exactly — the catalog rounds every float
aggregate on both sides, so exact equality is the contract (this predicts
the driver's value-hash check).
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_CORRECT

import __spark_entry__ as entry_mod


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        # driver-style canonicalization: exact value, but -0.0 == 0.0
        return val + 0.0
    return val


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck):
    sdf = QUERIES[name](spark, SF_CORRECT)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    d_cols = [c.lower() for c in [d[0] for d in res.description]]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    s_set = _rows_to_set(s_cols, s_rows)
    d_set = _rows_to_set(d_cols, d_rows)
    if s_set != d_set:
        diff_s = [r for r in s_set if r not in d_set][:5]
        diff_d = [r for r in d_set if r not in s_set][:5]
        raise AssertionError(f"{name}: value mismatch\nspark-only: {diff_s}\nduck-only: {diff_d}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    sdf = QUERIES[name](spark, SF_CORRECT)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_table_checksum_detects_single_row_change(spark):
    from pyspark.sql import functions as F

    from lwetl_spark.operators.cardinality import table_checksum

    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(100)], "id LONG, name STRING"
    )
    base = table_checksum(df).first()
    # same rows, different order -> same checksum
    shuffled = table_checksum(df.orderBy(F.rand(7))).first()
    assert (base.n_rows, base.checksum) == (shuffled.n_rows, shuffled.checksum)
    # one changed value -> different checksum, same count
    mutated = df.withColumn(
        "name", F.when(F.col("id") == 50, F.lit("NAMEX")).otherwise(F.col("name"))
    )
    mut = table_checksum(mutated).first()
    assert mut.n_rows == base.n_rows and mut.checksum != base.checksum


def test_merge_partial_aggs_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from lwetl_spark.operators.incremental import merge_partial_aggs

    full = spark.createDataFrame(
        [(i % 5, i % 3, i) for i in range(1000)], "a LONG, b LONG, v LONG"
    )
    base = full.filter("v < 700")
    delta = full.filter("v >= 700")
    state = base.groupBy("a", "b").agg(
        F.count("*").alias("n"), F.sum("v").alias("v")
    )
    merged = merge_partial_aggs(state, delta, ["a", "b"], ["v"])
    exp = full.groupBy("a", "b").agg(F.count("*").alias("n"), F.sum("v").alias("v"))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, exp.collect()))
    # delta containing brand-new groups (not in state)
    new_delta = spark.createDataFrame([(99, 99, 1), (99, 99, 2)], "a LONG, b LONG, v LONG")
    m2 = merge_partial_aggs(merged, new_delta, ["a", "b"], ["v"])
    row = m2.filter("a = 99").collect()[0]
    assert (row.n, row.v) == (2, 3)
