"""Incremental aggregate maintenance (materialized-view upkeep).

Keeps a grouped aggregate table current as delta batches arrive WITHOUT
recomputing the base: the delta is aggregated alone (tiny), then merged
into the state table group-by-group.  Works for any MERGEABLE
aggregate — sums, counts, min/max — and derived values computable from
them (avg = sum/count); non-mergeable exact aggregates (median,
count-distinct) need sketches instead (t-digest / HLL, see
x_approx_quantile / a5_approx_distinct).

Scale design (100 TB state, GB deltas): the delta aggregates map-side
to one row per TOUCHED group; the merge is a full-outer join of that
small set against the state — hash-partitioned on the group key, so
only the state partitions holding touched groups do row work.  If the
state table is stored bucketed on the key (write_bucketed), the merge
is exchange-free on the state side: the delta shuffles, the 100 TB
doesn't.  The recompute-from-scratch alternative scans the full base
every batch — the whole point of incremental maintenance is replacing
a base-sized scan with a delta-sized one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_partial_aggs(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Merge a (keys, n, sums...) state table with a RAW delta batch:
    aggregate the delta to the same shape, full-outer join on the keys,
    coalesce-add every mergeable column.  Result is identical to
    re-aggregating base ∪ delta from scratch (the oracle pins this)."""
    d = delta.groupBy(*keys).agg(
        F.count("*").alias(count_col),
        *[F.sum(c).alias(c) for c in sum_cols],
    )
    merged = state.alias("s").join(d.alias("d"), keys, "full_outer")
    out_cols = [F.col(k) for k in keys]
    for c in [count_col, *sum_cols]:
        out_cols.append(
            (
                F.coalesce(F.col(f"s.{c}"), F.lit(0))
                + F.coalesce(F.col(f"d.{c}"), F.lit(0))
            ).alias(c)
        )
    return merged.select(*out_cols)


def apply_changelog(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change log to produce the current snapshot: for every
    key, the LAST change in ``order_cols`` order wins; keys whose last
    change is a delete vanish.  The standard upsert-log → table
    materialization (Debezium/outbox replay; the reference's nearest
    surface is U4/U5 row DML, lwetl/uploader.py:572-636 — this is the
    set-based form that replaces per-row apply loops).

    Semantics are pure SQL (one keyed window + a filter), so the
    result is engine-exact and the x_cdc_apply oracle rebuilds it
    verbatim.  ``order_cols`` must totally order changes within a key
    (ts + a unique sequence id — the log-shipping contract).

    Scale: ONE shuffle on the key columns; the window keeps only the
    row_number-1 row per key, so state per reducer is a single row at
    a time (no per-key buffering of history).  For continuous apply,
    pair with a streaming foreachBatch that merges per-batch winners
    into the snapshot (the stream_markov persisted-state shape).
    """
    if not key_cols or not order_cols:
        raise ValueError("apply_changelog needs key_cols and order_cols")
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("_rn")
    )
