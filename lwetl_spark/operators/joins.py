"""Temporal / range join operators (SURVEY §2.3 "not present" gaps, NEW).

The reference emits only equi/theta joins (lwetl/queries.py:23-91) and has
no time-series joins at all.  These two close the gap Spark itself leaves
open — neither as-of nor interval joins exist as built-in DataFrame ops —
using *compositions of existing operators* so Catalyst/AQE still own the
physical plan (SURVEY §2 custom-operator rule (a): composition before UDF).

- `asof_join`: the classic "most recent fact at or before each probe time"
  join.  Implemented as union → single (key)-partitioned window →
  last(ignorenulls) — ONE shuffle on the join key, no point-vs-fact cross
  product, no per-key pandas.  This is the optimal distributed as-of
  algorithm: at 100 TB both sides shuffle once on the key and each
  partition does a linear merge (the in-partition sort is spillable).
  A hot key serializes its window — pre-aggregate the right side per
  (key, ts) (cheap, map-side combinable) and salt the left if a single
  key exceeds one executor's slice.

- `range_join_banded`: point-in-interval join without the O(n·m) cross
  join: quantize both sides to fixed-width bands, equi-join on the band
  id, then apply the exact residual predicate.  Each interval lands in
  ceil(width/band)+1 bands, so candidate pairs stay ~|matches| when
  band_width ≈ typical interval width.  The band join is an ordinary
  equi-join: broadcast when the interval side is small, shuffle-hash
  when both sides are large — Catalyst decides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with
    the greatest ``right_ts <= left_ts`` within the same key group
    (ties at equal ts match, like DuckDB/pandas ``ASOF``).

    Right rows must be unique per (key, right_ts) — pre-aggregate the
    right side if not, or the matched row is engine-dependent.

    ``how``: 'inner' drops unmatched left rows; 'left' keeps them with
    nulls.  ``tolerance_seconds`` additionally voids matches older than
    the tolerance.  Right payload columns keep their names unless they
    collide with a left column, then get ``suffix``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    l_payload = [c for c in left.columns if c not in keys]
    r_payload = [c for c in right.columns if c not in keys and c != right_ts]

    lstruct = F.struct(*[F.col(c) for c in l_payload])
    rstruct = F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in r_payload])
    ltype = left.select(lstruct.alias("s")).schema["s"].dataType.simpleString()
    rtype = right.select(rstruct.alias("s")).schema["s"].dataType.simpleString()

    l2 = left.select(
        *keys,
        F.col(left_ts).alias("__ord"),
        F.lit(1).alias("__side"),
        lstruct.alias("__l"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("__ord"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(ltype).alias("__l"),
        rstruct.alias("__r"),
    )
    # (ts, side) order puts a right row before a left row at the same ts,
    # so last(..., ignorenulls) implements ">= with ties matching".
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ord", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = (
        l2.unionByName(r2)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        # Spark ≥4.1 forbids TIMESTAMP_NTZ→DOUBLE casts; diff timestamps
        # natively, DATE by day difference, numerics by subtraction.
        # Dispatch on the resolved dataType (not dtypes strings — DATE is
        # not a "timestamp*" prefix and dtypes re-analyzes the built plan).
        from pyspark.sql import types as T

        ord_type = left.schema[left_ts].dataType
        if isinstance(ord_type, (T.TimestampType, T.TimestampNTZType)):
            gap = F.timestamp_diff(
                "MICROSECOND", F.col("__m.__rts"), F.col("__ord")
            ) / F.lit(1000000.0)
        elif isinstance(ord_type, T.DateType):
            gap = F.datediff(F.col("__ord"), F.col("__m.__rts")).cast(
                "double"
            ) * F.lit(86400.0)
        else:
            gap = F.col("__ord").cast("double") - F.col("__m.__rts").cast("double")
        in_tol = gap <= float(tolerance_seconds)
        m = m.withColumn("__m", F.when(in_tol, F.col("__m")))
    if how == "inner":
        m = m.filter(F.col("__m").isNotNull())

    def _rname(c: str) -> str:
        return c + suffix if c in left.columns or c in keys else c

    out = [
        *[F.col(k) for k in keys],
        *[F.col(f"__l.{c}").alias(c) for c in l_payload],
        F.col("__m.__rts").alias(_rname(right_ts)),
        *[F.col(f"__m.{c}").alias(_rname(c)) for c in r_payload],
    ]
    return m.select(*out)


def range_join_banded(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band_width: float,
    closed: str = "left",
) -> DataFrame:
    """Inner join of points to every interval containing them
    (``lo <= p < hi`` for closed='left', ``lo <= p <= hi`` for 'both'),
    as band-equi-join + exact residual filter.  Overlapping intervals
    yield one output row per containing interval.
    """
    if band_width <= 0:
        raise ValueError("band_width must be positive")

    def band(c: Column) -> Column:
        return F.floor(c / F.lit(float(band_width))).cast("long")

    p = points.withColumn("__band", band(F.col(point_col)))
    iv = intervals.withColumn(
        "__band", F.explode(F.sequence(band(F.col(lo_col)), band(F.col(hi_col))))
    )
    residual = F.col(point_col) >= F.col(lo_col)
    residual &= (
        F.col(point_col) <= F.col(hi_col)
        if closed == "both"
        else F.col(point_col) < F.col(hi_col)
    )
    return p.join(iv, on="__band", how="inner").filter(residual).drop("__band")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    band_width: float,
) -> DataFrame:
    """Interval-interval overlap join (half-open: ``l_lo < r_hi AND
    r_lo < l_hi``) via band quantization.  Both sides explode into the
    bands they span; a pair overlapping several bands would match once
    per shared band, so the residual keeps only the CANONICAL band — the
    one containing ``greatest(l_lo, r_lo)`` (the overlap's start, which
    by construction lies in both intervals' band ranges) — making the
    output exactly one row per overlapping pair with no distinct-shuffle.
    Equi-join on the band id: broadcast or shuffle, Catalyst decides;
    band_width ≈ typical interval width bounds candidate fan-out.
    """
    if band_width <= 0:
        raise ValueError("band_width must be positive")

    def band(c: Column) -> Column:
        return F.floor(c / F.lit(float(band_width))).cast("long")

    lb = left.withColumn(
        "__band", F.explode(F.sequence(band(F.col(l_lo)), band(F.col(l_hi))))
    )
    rb = right.withColumn(
        "__band", F.explode(F.sequence(band(F.col(r_lo)), band(F.col(r_hi))))
    )
    overlap = (F.col(l_lo) < F.col(r_hi)) & (F.col(r_lo) < F.col(l_hi))
    canonical = F.col("__band") == band(F.greatest(F.col(l_lo), F.col(r_lo)))
    return lb.join(rb, on="__band", how="inner").filter(overlap & canonical).drop("__band")


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    left_id: str | None = None,
    right_order: str | None = None,
    best_only: bool = True,
) -> DataFrame:
    """Record linkage: edit-distance match within blocking groups (NEW —
    no reference analog; the classic dirty-dimension reconciliation step
    in front of db_copy/dimension sync).

    Candidate pairs come ONLY from an equi-join on `block_cols` — the
    standard blocking trick that turns the O(|L|·|R|) all-pairs string
    comparison into per-block products (same family as
    sorted-neighborhood dedup, which blocks by sort-key window instead).
    `levenshtein` is a JVM built-in, evaluated once per candidate inside
    whole-stage codegen; candidates above `max_dist` die in the same
    stage — only matches reach the (optional) best-match window.

    With `best_only`, ties are broken (dist, `right_order`) so the
    selected match is deterministic under any partitioning.

    Scale: a hash join on the block key; hot blocks are the skew risk —
    pick block keys with bounded fan-out (brand, zip, sort-key prefix),
    or salt the block column first (operators/skew.py) and union the
    residue.  No all-pairs stage exists at any scale.
    """
    if best_only and (left_id is None or right_order is None):
        raise ValueError("best_only requires left_id and right_order")
    l = left.select(
        *[F.col(c) for c in block_cols],
        *[F.col(c) for c in left.columns if c not in block_cols],
    )
    r_payload = [c for c in right.columns if c not in block_cols]
    r = right.select(
        *[F.col(c) for c in block_cols],
        *[F.col(c).alias(f"r_{c}") for c in r_payload],
    )
    # Two cost cuts inside the block product, both JVM-side:
    # 1. length-band prefilter — |len(a)−len(b)| > max_dist can never be
    #    within distance, and the length compare is O(1) vs lev's
    #    O(len²); it prunes most of a dense block before the real work.
    #    (Pushing the band INTO the join key — ±1 exploded buckets of
    #    width max_dist+1 — was measured SLOWER here: real name columns
    #    concentrate in a handful of length values, so the explode
    #    triples the build side and prunes nothing.)
    # 2. thresholded levenshtein — Spark's 3-arg form early-exits a row
    #    as soon as the running distance exceeds max_dist (returns −1),
    #    bounding per-pair work by O(len·max_dist) instead of O(len²).
    lc, rc = F.col(left_col), F.col(f"r_{right_col}")

    def _fuzzy_cand(lf: DataFrame) -> DataFrame:
        # lengths are PRE-projected per row (r10): inside the join the
        # band filter runs as a pure int compare per candidate pair —
        # leaving F.length() in the filter re-walks both strings
        # O(len) per PAIR (codegen does not CSE across the join
        # condition), which at a dense block's |L|·|R| pairs was the
        # dominant cost after levenshtein itself
        return (
            lf.withColumn("__llen", F.length(lc))
            .join(r.withColumn("__rlen", F.length(rc)),
                  on=block_cols, how="inner")
            .filter(F.abs(F.col("__llen") - F.col("__rlen")) <= max_dist)
            .withColumn("dist", F.levenshtein(lc, rc, max_dist).cast("long"))
            .filter(F.col("dist") >= 0)
            .drop("__llen", "__rlen")
        )

    if not best_only:
        return _fuzzy_cand(l)
    # Exact-first short circuit: a distance-0 match always wins the
    # (dist, order) ranking, so lefts with an equi-match on the name
    # resolve in ONE hash join (their window runs over the tiny dist-0
    # candidate set) and only the residue pays the block product — on
    # real linkage inputs most records are clean, so this removes most
    # of the quadratic work without changing a single output row.
    exact = (
        l.withColumn("__name", lc)
        .join(r.withColumn("__name", rc), on=block_cols + ["__name"], how="inner")
        .drop("__name")
        .withColumn("dist", F.lit(0).cast("long"))
    )
    matched_ids = exact.select(left_id).distinct()
    residue = l.join(matched_ids, left_id, "left_anti")
    # Round-robin re-spread BEFORE the block product (r10, the real
    # x_fuzzy_join regression): AQE coalesces the anti-join's output
    # by BYTES, and a few thousand residue rows are one partition's
    # worth of bytes but millions of candidate pairs' worth of
    # levenshtein — the expensive probe stage was running on ONE
    # core.  Cost model: a full shuffle of the residue is O(residue
    # rows), noise next to the per-pair work it parallelizes; with a
    # broadcast catalog side the probe inherits exactly this
    # partitioning.
    spark = residue.sparkSession
    try:
        n_spread = spark.sparkContext.defaultParallelism
    except Exception:
        # Spark Connect: no sparkContext on the session.  Fall back to
        # the shuffle width, which the probe stage would inherit anyway.
        n_spread = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    residue = residue.repartition(n_spread)
    cand = exact.unionByName(_fuzzy_cand(residue))
    w = Window.partitionBy(left_id).orderBy(F.asc("dist"), F.asc(f"r_{right_order}"))
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
