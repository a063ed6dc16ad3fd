"""Grouped analytical operators: per-group recursive/statistical passes.

Two deliberately different execution strategies, chosen by what the
math allows:

- `group_ols` — closed-form least squares from sufficient statistics:
  ONE JVM-side aggregation (map-side combinable, one shuffle of five
  longs per group).  When an algorithm has a sufficient-statistics
  form, the Spark-first answer is an `agg`, never a UDF.
- `grouped_ewma` — exponential moving average, a true recursion
  (y_t depends on y_{t-1}): not expressible as a window/agg, so it is
  the canonical `groupBy().applyInPandas` case — Arrow ships each
  group to Python once, the recursion runs in-process, results come
  back columnar.

Scale notes (100 TB): `group_ols` is bounded by the groupBy shuffle of
5 numbers per group — effectively free.  `grouped_ewma` shuffles each
group's rows to one task (inherent: the recursion is sequential per
group) — fine when groups are users/sessions (millions of small
groups, perfectly parallel), wrong for a handful of giant groups; for
those, segment the series and carry the boundary state like
pack_sequences' two-phase prefix pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-group simple linear regression y ≈ a·x + b, computed from
    EXACT integer sufficient statistics (inputs are floored to ints, so
    Σx, Σy, Σxy, Σx² are exact BIGINTs in any engine; slope/intercept
    are then one identical float division — bit-reproducible, the same
    determinism trick as quantize_int8's floor form).

    Returns (group, n, slope, intercept) rounded to ``digits``.
    """
    x = F.floor(F.col(x_col)).cast("long")
    y = F.floor(F.col(y_col)).cast("long")
    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    num = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    den = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    slope = num.cast("double") / den.cast("double")
    intercept = (agg["sy"].cast("double") - slope * agg["sx"].cast("double")) / agg[
        "n"
    ].cast("double")
    return agg.select(
        group_col,
        "n",
        F.round(slope, digits).alias("slope"),
        F.round(intercept, digits).alias("intercept"),
    )


def group_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-group Pearson correlation from EXACT sufficient statistics.

    Same determinism strategy as :func:`group_ols`: inputs are floored
    to integers, the five sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    Σy²) accumulate exactly as DECIMAL(38,0) (BIGINT would overflow at
    ~1e18 — price² sums cross that near sf1), and the only float ops
    are one fixed-order tail: cast→sqrt→multiply→divide, identical IEEE
    doubles in any engine.  ``F.corr`` exists but accumulates in
    floating point with engine-specific order — unusable for a
    bit-exact cross-engine oracle.

    One map-side-combinable aggregation: six numbers per group through
    the shuffle, scale-free at 100 TB.
    """
    x = F.floor(F.col(x_col)).cast("decimal(38,0)")
    y = F.floor(F.col(y_col)).cast("decimal(38,0)")
    agg = df.groupBy(group_col).agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    num = (agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]).cast("double")
    dx = (agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]).cast("double")
    dy = (agg["n"] * agg["syy"] - agg["sy"] * agg["sy"]).cast("double")
    corr = num / (F.sqrt(dx) * F.sqrt(dy))
    return agg.select(
        group_col,
        agg["n"].cast("long").alias("n"),
        F.round(corr, digits).alias("corr"),
    )


def group_zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: list[str],
    k: float = 2.0,
    digits: int = 4,
) -> DataFrame:
    """Per-group z-score outlier detection: flag rows with
    |x − μ_g| > k·σ_g (population σ), the standard anomaly gate in a
    data-quality pipeline.

    Determinism: values are scaled to centi-units and floored
    (floor(x·100) — the same ops in any engine give the same integer,
    even where x·100 rounds oddly in IEEE), sufficient statistics
    accumulate exactly in DECIMAL(38,0), and μ, σ, z are one fixed-order
    float tail — so the FLAGGED SET is bit-identical across engines,
    including rows sitting next to the k·σ boundary.

    Scale: one stats agg (3 numbers per group) + a broadcast join back
    → map-side filter; the data shuffles zero times.  Returns the
    outlier rows as (id_cols…, group, value, z).
    """
    x = F.floor(F.col(value_col) * 100).cast("decimal(38,0)")
    stats = df.groupBy(group_col).agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    mean = stats["sx"].cast("double") / stats["n"].cast("double")
    var = (stats["n"] * stats["sxx"] - stats["sx"] * stats["sx"]).cast("double") / (
        stats["n"].cast("double") * stats["n"].cast("double")
    )
    st = stats.select(
        group_col, mean.alias("_mean"), F.sqrt(var).alias("_std")
    )
    z = (x.cast("double") - F.col("_mean")) / F.col("_std")
    return (
        df.join(F.broadcast(st), group_col)
        .filter(F.abs(z) > F.lit(float(k)))
        .select(*id_cols, group_col, value_col, F.round(z, digits).alias("z"))
    )


def grouped_ewma(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-group exponential moving average y_t = α·x_t + (1−α)·y_{t−1}
    (y_0 = x_0), ordered by ``order_cols`` within each group.

    A true recursion — each output depends on the previous OUTPUT — so
    no window frame or aggregate expresses it; this is the canonical
    grouped-map (`applyInPandas`) case.  The recursion is written as an
    explicit per-row loop with a fixed operation order
    (α·x + (1−α)·y, IEEE doubles), so any engine replaying the same
    order reproduces it bit-for-bit — the DuckDB oracle does, via a
    recursive CTE (x_grouped_ewma).

    Output: group, order cols, value, ewma.
    """
    out_fields = [group_col, *order_cols, value_col]
    schema_src = df.select(*out_fields).schema
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema_src)
    schema += ", ewma double"
    a = float(alpha)

    def fn(pdf):  # pragma: no cover - executed on workers
        pdf = pdf.sort_values(order_cols).reset_index(drop=True)
        vals = pdf[value_col].astype("float64").tolist()
        out, y = [], None
        for x in vals:
            y = x if y is None else a * x + (1.0 - a) * y
            out.append(y)
        pdf = pdf[out_fields].copy()
        pdf["ewma"] = out
        return pdf

    return df.select(*out_fields).groupBy(group_col).applyInPandas(fn, schema)


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-group MAD (median-absolute-deviation) outlier census — the
    ROBUST companion to `group_zscore_outliers`: median and MAD ignore
    the very outliers being hunted, so a single 10⁶× corrupt value
    cannot widen the gate around itself (which it does to μ/σ).

    Both medians use `percentile_disc` (actual data values, no
    interpolation) so med, MAD, and the flagged set are bit-identical
    across engines; the k·MAD comparison is the same IEEE multiply
    everywhere.  Returns one row per group:
    (group, n_rows, med, mad, n_outliers).

    Plan: two group aggs with a broadcast join between (median pass,
    then MAD-of-deviation pass) and a final count agg — the data
    shuffles zero times; each agg ships 1 value per (group, row).
    Beyond ~10^8 rows per group, swap percentile_disc for
    approx_percentile (percentile_filter's caveat).
    """
    med = df.groupBy(group_col).agg(
        F.expr(
            f"percentile_disc(0.5) WITHIN GROUP (ORDER BY {value_col})"
        ).alias("_med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_dev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _dev)").alias("_mad")
    )
    flagged = dev.join(F.broadcast(mad), group_col)
    return flagged.groupBy(group_col, "_med", "_mad").agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(F.col("_dev") > F.lit(float(k)) * F.col("_mad"), 1).otherwise(0)
        ).alias("n_outliers"),
    ).select(
        group_col,
        "n_rows",
        F.col("_med").alias("med"),
        F.col("_mad").alias("mad"),
        "n_outliers",
    )


def grouped_holt(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
) -> DataFrame:
    """Per-group Holt linear (double) exponential smoothing — level +
    trend, the next step up from `grouped_ewma` when series drift:

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}       (l_0 = x_0, b_0 = 0)

    A doubly-recursive map — both states feed the next step — so like
    the EWMA it is the canonical `applyInPandas` grouped-map case, and
    like the EWMA the operation ORDER is fixed (dyadic α/β on IEEE
    doubles, l_t computed before b_t), so a recursive CTE replaying the
    same order reproduces it bit-for-bit: x_holt_trend carries an EXACT
    float oracle, no tolerance band.

    Output: group, order cols, value, level, trend (one-step-ahead
    forecast = level + trend).  Scale: one shuffle on the group key;
    per-group state during the scan is two doubles.
    """
    out_fields = [group_col, *order_cols, value_col]
    schema_src = df.select(*out_fields).schema
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema_src)
    schema += ", level double, trend double"
    a, b_ = float(alpha), float(beta)

    def fn(pdf):  # pragma: no cover - executed on workers
        pdf = pdf.sort_values(order_cols).reset_index(drop=True)
        vals = pdf[value_col].astype("float64").tolist()
        levels, trends = [], []
        l = b = None
        for x in vals:
            if l is None:
                l, b = x, 0.0
            else:
                l_new = a * x + (1.0 - a) * (l + b)
                b = b_ * (l_new - l) + (1.0 - b_) * b
                l = l_new
            levels.append(l)
            trends.append(b)
        pdf = pdf[out_fields].copy()
        pdf["level"] = levels
        pdf["trend"] = trends
        return pdf

    return df.select(*out_fields).groupBy(group_col).applyInPandas(fn, schema)


def two_proportion_z2(per_user: DataFrame) -> DataFrame:
    """Pooled two-proportion z² from a per-user (variant, conv) frame
    (variant ∈ {0,1}, conv ∈ {0,1}): one row
    (n0, k0, n1, k1, rate_diff, z_squared), z² > 3.84 ⇔ p < .05.
    Every float input derives from exact integer aggregates and the
    expression tree is fixed, so ROUND(·, 6) is hash-stable across
    engines (the group_ols sufficient-statistics idiom).  Shared by the
    batch x_ab_test query and the streaming stream_ab_test state reader.
    ``z_squared`` is NULL when the pooled rate is 0 or 1 (the variance
    vanishes — a raw division would be an ANSI divide-by-zero on
    saturated arms) and no row is returned unless both variants exist.
    """
    v = per_user.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("conv").alias("k")
    )
    a = v.filter(F.col("variant") == 0).select(
        F.col("n").cast("long").alias("n0"), F.col("k").cast("long").alias("k0")
    )
    b = v.filter(F.col("variant") == 1).select(
        F.col("n").cast("long").alias("n1"), F.col("k").cast("long").alias("k1")
    )
    w = a.crossJoin(F.broadcast(b))
    p0 = F.col("k0").cast("double") / F.col("n0")
    p1 = F.col("k1").cast("double") / F.col("n1")
    pp = (F.col("k0") + F.col("k1")).cast("double") / (F.col("n0") + F.col("n1"))
    return w.select(
        "n0", "k0", "n1", "k1",
        F.round(p0 - p1, 6).alias("rate_diff"),
        F.when(
            (pp > 0) & (pp < 1),
            F.round(
                (p0 - p1) * (p0 - p1)
                / (
                    pp
                    * (F.lit(1) - pp)
                    * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
                ),
                6,
            ),
        ).alias("z_squared"),
    )
