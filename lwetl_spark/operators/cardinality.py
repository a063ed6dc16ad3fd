"""table-cardinality program (SURVEY C3, A4, A7).

Reference: lwetl/programs/table_cardinality/main.py — per-column duplicate
histograms (`SELECT c, COUNT(*) AS N ... GROUP BY c HAVING COUNT(*) > 1
ORDER BY COUNT(*) DESC, c`, :40-42) plus per-column distinct/non-null
totals, written to a multi-sheet XLSX.

Spark design: the reference issues 2 queries per column sequentially; here
the summary for ALL columns is one job — a single pass with
count/count_distinct per column — and per-column histograms reuse one
cached scan.  At 100 TB the summary swaps count_distinct for
approx_count_distinct (`exact=False`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_cardinality(df: DataFrame, column: str, min_count: int = 2, max_rows: int | None = 50) -> DataFrame:
    """Duplicate histogram for one column (reference
    table_cardinality/main.py:40-42 verbatim semantics)."""
    out = (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count("*").alias("N"))
        .filter(F.col("N") >= min_count)
        .orderBy(F.desc("N"), F.asc(column))
    )
    # the reference caps cardinality sheets at 50 rows (main.py:88-91)
    return out.limit(max_rows) if max_rows else out


def table_cardinality(df: DataFrame, exact: bool = True) -> DataFrame:
    """Per-column profile: non-null count + distinct count + duplicate
    mass, all columns in ONE aggregation job (vs the reference's
    2-queries-per-column loop, table_cardinality/main.py:47-67).

    No driver-side collect: the single aggregate row is unpivoted with
    `stack`, so the whole profile is one lazy plan.  At 100 TB pass
    `exact=False` to swap count_distinct (one shuffle per column under
    the hood via expand) for HLL approx_count_distinct (single pass).
    """
    aggs = []
    for c in df.columns:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nonnull"))
        if exact:
            aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__distinct"))
    one_row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nonnull`, `{c}__distinct`" for c in df.columns
    )
    return one_row.selectExpr(
        f"stack({len(df.columns)}, {stack_args}) as (column_name, n_nonnull, n_distinct)"
    ).withColumn("n_duplicated", F.col("n_nonnull") - F.col("n_distinct"))


def equi_width_histogram(df: DataFrame, column: str, width: float) -> DataFrame:
    """Equi-width histogram: bucket = floor(col / width), with per-bucket
    count and actual min/max.  One map-side-combinable aggregation (the
    profiling companion of `table_cardinality`); bucket arithmetic is a
    single float division + floor, identical IEEE ops in any engine, so
    the oracle is exact.  Returns (bucket, n, lo, hi)."""
    b = F.floor(F.col(column) / F.lit(float(width))).cast("long")
    return (
        df.groupBy(b.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min(column).alias("lo"),
            F.max(column).alias("hi"),
        )
    )


def table_checksum(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Order-insensitive whole-table checksum: SUM over rows of the
    15-hex-digit prefix of md5(concat_ws('|', cols)) as DECIMAL(38,0),
    plus the row count.  Any engine reproduces it bit-for-bit (the md5
    family trick), so source and target of a copy can be checked WITHOUT
    moving either table — each side computes one number locally and only
    the numbers travel.  That is the 100 TB story: validation cost is
    one scan + a 2-value exchange, versus db-copy's row-set diff when
    you need to know WHICH rows differ.

    Callers must pre-format float columns deterministically (cast to
    DECIMAL / round) — raw double→string rendering is engine-specific.
    NULLs: concat_ws skips nulls, which conflates NULL with '' — pass
    pre-coalesced columns where that distinction matters.
    """
    cols = columns or df.columns
    fp = F.conv(
        F.substring(F.md5(F.concat_ws("|", *[F.col(c) for c in cols])), 1, 15), 16, 10
    ).cast("decimal(38,0)")
    return df.agg(
        F.count("*").alias("n_rows"),
        F.sum(fp).cast("decimal(38,0)").alias("checksum"),
    )


def drift_chi2(
    df_ref: DataFrame,
    df_cur: DataFrame,
    value_col: str,
    width: float,
    digits: int = 6,
) -> DataFrame:
    """Distribution-drift detection between a reference and a current
    batch of the same column: equi-width binning on both, then the
    per-bucket chi-square contribution (obs − exp)²/exp where exp is
    the reference count scaled to the current batch size.  The monitor
    sums `chi2_term` driver-side and compares to a χ² critical value;
    per-bucket terms are returned (not pre-summed) so the output is
    bit-exact across engines — counts are integers, the scale factor
    and each term are one fixed-order float expression per bucket, no
    order-dependent float summation anywhere.  (NEW — data-quality op;
    the profiling companion of equi_width_histogram at pipeline scale.)

    Scale: two map-side-combinable count aggregations (one per batch)
    plus a full-outer join on ~#buckets rows — the data is never
    shuffled beyond the bucket counts.  Returns
    (bucket, n_ref, n_cur, expected, chi2_term).
    """
    def counts(d: DataFrame, name: str) -> DataFrame:
        return (
            d.select(
                F.floor(F.col(value_col) / F.lit(float(width))).cast("long").alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias(name))
        )

    ref = counts(df_ref, "n_ref")
    cur = counts(df_cur, "n_cur")
    tot_ref = df_ref.count()
    tot_cur = df_cur.count()
    scale = float(tot_cur) / float(tot_ref) if tot_ref else 0.0
    j = (
        ref.join(cur, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    expected = F.col("n_ref").cast("double") * F.lit(scale)
    term = F.when(
        F.col("n_ref") > 0,
        (F.col("n_cur").cast("double") - expected)
        * (F.col("n_cur").cast("double") - expected)
        / expected,
    ).otherwise(F.lit(None).cast("double"))
    return j.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round(expected, digits).alias("expected"),
        F.round(term, digits).alias("chi2_term"),
    )


def skew_profile(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Join/aggregation-key skew diagnostics: the heaviest `top_n` keys
    with their share of the table and the salting factor that would
    level them.  (NEW — scale-tuning op; the reference's cardinality
    report, `lwetl/utils.py` count loop, answers "how many per key" but
    not "is this key distribution safe to shuffle on".)

    For each heavy key: `skew_x100` = how many times the mean key load
    this key carries (×100, integer), and `suggested_salt` =
    ceil(cnt / mean) — the number of salt buckets that splits the key
    down to average load (feed to `operators/joins.salted_join`).  All
    integer arithmetic, so the DuckDB oracle hash-matches.  The mean is
    the FLOORED `n_rows DIV n_keys` (≥ 1 since every key has a row):
    ratios against it avoid the `cnt · n_keys` product, which overflows
    int64 (ANSI error at scale) once keys × heavy-key-count passes
    ~9·10¹⁸ — real at 100 TB cardinalities.

    Scale: one map-side-combinable count agg over the key, a 2-long
    totals row broadcast, and a TakeOrdered top-n (per-partition heaps,
    no global sort).  The table itself never shuffles — only (key, cnt).
    """
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    counts = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count("*").alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            key_col,
            "cnt",
            F.expr("cnt * 100 DIV (n_rows DIV n_keys)").alias("skew_x100"),
            F.expr(
                "(cnt + (n_rows DIV n_keys) - 1) DIV (n_rows DIV n_keys)"
            ).alias("suggested_salt"),
        )
        .orderBy(F.desc("cnt"), F.col(key_col))
        .limit(top_n)
    )


def join_size_estimate(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    buckets: int = 64,
) -> DataFrame:
    """Histogram-based equi-join output-size estimation — the classic
    optimizer technique (per-bucket |A_b|·|B_b| / max(d_A_b, d_B_b)
    under uniformity within a bucket), exposed as a diagnostics operator
    so a pipeline can PREDICT a join's cost before paying it (the
    planning companion to `skew_profile`: that one locates hot keys,
    this one sizes the output).

    Keys hash into `buckets` md5-derived buckets (portable — the DuckDB
    oracle rebuilds the identical histogram); each side reduces to
    `buckets` rows of (n_rows, n_distinct), so the estimate costs two
    count aggregations and a 64-row join REGARDLESS of table size —
    this is what makes it usable as a pre-flight check at 100 TB.
    Returns one row: (est_rows, n_left, n_right).  On an FK join (child
    keys ⊆ unique parent keys) the estimate is exact by construction —
    the pinned test case; correlated skew within a bucket degrades it
    like any histogram estimator.
    """
    def side(df: DataFrame, key: str, tag: str) -> DataFrame:
        b = F.conv(
            F.substring(
                F.md5(F.concat(F.col("_k").cast("string"), F.lit("jse"))), 1, 4
            ),
            16,
            10,
        ).cast("int") % buckets
        return (
            df.select(F.col(key).alias("_k"))
            .filter(F.col("_k").isNotNull())
            .withColumn("_b", b)
            .groupBy("_b")
            .agg(
                F.count("*").alias(f"n_{tag}"),
                F.countDistinct("_k").alias(f"d_{tag}"),
            )
        )
    a = side(left, left_key, "a")
    bb = side(right, right_key, "b")
    per_bucket = a.join(bb, "_b", "inner").select(
        F.expr("n_a * n_b div greatest(d_a, d_b)").alias("est_b"),
        "n_a",
        "n_b",
    )
    totals_a = a.agg(F.coalesce(F.sum("n_a"), F.lit(0)).alias("n_left"))
    totals_b = bb.agg(F.coalesce(F.sum("n_b"), F.lit(0)).alias("n_right"))
    est = per_bucket.agg(F.coalesce(F.sum("est_b"), F.lit(0)).alias("est_rows"))
    return (
        est.crossJoin(totals_a)
        .crossJoin(totals_b)
        .select(
            F.col("est_rows").cast("long"),
            F.col("n_left").cast("long"),
            F.col("n_right").cast("long"),
        )
    )


def equi_depth_histogram(
    df: DataFrame,
    column: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Equi-DEPTH histogram: bucket boundaries at the exact
    percentile_disc quantiles (actual data values — hash-stable
    cross-engine, the percentile_filter rule), with per-bucket counts.
    The optimizer-statistics companion of `equi_width_histogram`: equal
    POPULATION per bucket instead of equal width, which is what
    selectivity estimation and `join_size_estimate`-style reasoning
    want on skewed columns (a width histogram puts 99% of a power-law
    column in one bucket).

    Plan: one percentile aggregation for the ≤ n_buckets−1 boundaries
    (broadcast back as a single row), one conditional-count pass.
    Rows equal to a boundary fall in the LOWER bucket (<= boundary),
    so bucket membership is deterministic in any engine.  Returns
    (bucket, n, lo_bound, hi_bound) with NULL lo/hi on the open ends.
    """
    if n_buckets < 2:
        raise ValueError(f"need >= 2 buckets, got {n_buckets}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        *[
            F.expr(
                f"percentile_disc({q!r}) WITHIN GROUP (ORDER BY {column})"
            ).alias(f"_q{i}")
            for i, q in enumerate(qs)
        ]
    )
    j = df.select(column).crossJoin(F.broadcast(bounds))
    bucket = None
    for i in range(len(qs)):
        cond = F.col(column) <= F.col(f"_q{i}")
        bucket = F.when(cond, i) if bucket is None else bucket.when(cond, i)
    bucket = bucket.otherwise(len(qs))
    out = (
        j.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    bound_cols = [F.col(f"_q{i}") for i in range(len(qs))]
    # bucket i spans (q_{i-1}, q_i]; the open ends carry NULL bounds
    lo = None
    for i in range(1, len(qs) + 1):
        c = F.col("bucket") == i
        lo = F.when(c, bound_cols[i - 1]) if lo is None else lo.when(c, bound_cols[i - 1])
    hi = None
    for i in range(len(qs)):
        c = F.col("bucket") == i
        hi = F.when(c, bound_cols[i]) if hi is None else hi.when(c, bound_cols[i])
    return out.crossJoin(F.broadcast(bounds)).select(
        "bucket",
        "n",
        lo.alias("lo_bound"),
        hi.alias("hi_bound"),
    )
