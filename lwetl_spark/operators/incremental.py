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

from pyspark.sql import DataFrame
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
