"""Time-window operators over the `events` table (SURVEY §2.10 NEW).

The reference has no time-series operators; its closest analog is the
commit-batch interval.  These are the batch forms; the streaming forms
(watermarked) live in lwetl_spark/streaming/pipeline.py and reuse the same
aggregate expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width_seconds: int = 300,
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregate: floor(ts / width) buckets.

    Uses integer epoch arithmetic (not F.window) so the bucket boundary
    is engine-independent and exactly reproducible in the oracle SQL;
    window_start is the bucket's opening timestamp.
    """
    keys = keys or ["event_type"]
    bucket = (F.unix_timestamp(F.col(ts_col)) / width_seconds).cast("long")
    return (
        df.withColumn("win_start", F.timestamp_seconds(bucket * width_seconds))
        .groupBy("win_start", *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Sessionization: per-user sessions split on gaps > `gap_seconds`.

    lag + cumulative-sum-of-gap-flags — two window passes over the same
    (user, ts) partitioning, so Spark shuffles once and reuses the sort.
    Returns one row per session with start/end/count.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_flag = (
        F.when(
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
            > gap_seconds,
            1,
        )
        .otherwise(0)
    )
    sess = df.withColumn("new_sess", gap_flag).withColumn(
        "session_idx", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def scd2_from_events(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) builder: collapse a per-key
    event stream into validity intervals — one row per attribute CHANGE,
    carrying [valid_from, valid_to) and an is_current flag.  (Warehouse
    op, NEW — the reference's closest analog is the diff-based dimension
    maintenance of examples/usernames.py, C6, which keeps only the
    latest value; SCD2 keeps the full history.)

    Change detection is lag() over (key ORDER BY ts, tiebreak) — the
    tiebreak column makes the interval set deterministic when timestamps
    collide.  valid_to = lead(valid_from) over the surviving change
    rows; NULL (open interval) marks the current row.

    Scale design (100 TB): both windows hash-partition by key only —
    thousands of events per key sort in-memory per task, and the second
    window reuses the first's partitioning (same key ⇒ no second
    shuffle; the filter between them preserves distribution and order).
    No global sort, no driver state.  Skewed hot keys are bounded by
    per-key event counts, not corpus size; a key with millions of
    events should be pre-bucketed by time range first.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = events.withColumn("_prev", F.lag(attr_col).over(w)).filter(
        ~F.col("_prev").eqNullSafe(F.col(attr_col))
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    nxt = F.lead(ts_col).over(w2)
    return changes.select(
        key_col,
        attr_col,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width_seconds: int = 3600,
    slide_seconds: int = 1800,
    keys: list[str] | None = None,
) -> DataFrame:
    """Sliding (hopping) window aggregate via the native ``F.window``
    with a slide: each event lands in ``ceil(width/slide)`` overlapping
    windows (Spark materializes the per-event window list and explodes —
    the input amplification factor IS width/slide, the inherent cost of
    hopping windows; keep the ratio small at scale or switch to
    multi-resolution rollups, x_multi_rollup, which aggregate each tier
    once instead).  Window starts are epoch-aligned multiples of the
    slide, so the oracle reproduces them with integer arithmetic."""
    keys = keys or ["event_type"]
    w = F.window(
        F.col(ts_col), f"{width_seconds} seconds", f"{slide_seconds} seconds"
    )
    return (
        df.groupBy(w.alias("win"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )
