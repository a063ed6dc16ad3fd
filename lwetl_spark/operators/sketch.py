"""Count-min sketch over a token stream (NEW — streaming-friendly
frequency estimation; complements the exact heavy-hitters top-k and the
HLL/t-digest sketches already in the catalog).

Design: d hash rows × w counters.  Positions come from the md5 family
(`('0x'+md5(tok‖salt_j))[:8] mod w`) — the same portability trick as the
MinHash/Bloom operators, so any engine reproduces the sketch EXACTLY,
bit for bit.  The sketch build is one map-side-combinable aggregation of
d·tokens (j, pos) pairs; the result is d·w counters regardless of corpus
size — the whole point of a sketch at 100 TB: mergeable across
partitions/batches (counter-wise add), constant size, one-sided error
(estimate ≥ true count, overestimation bounded by n/w per row with
probability 1−(1/2)^d).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pos(tok, j: int, width: int):
    h = F.md5(F.concat(tok, F.lit(f"cms{j}")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast("int")


def cms_build(
    tokens_df: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch: (j, pos, cnt) — d·w counters max.

    One explode of d positions per token occurrence, one groupBy; the
    shuffle carries only (j, pos) pairs.
    """
    tok = F.col(token_col)
    positions = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _pos(tok, j, width).alias("pos"))
            for j in range(depth)
        ]
    )
    return (
        tokens_df.select(F.explode(positions).alias("jp"))
        .groupBy(F.col("jp.j").alias("j"), F.col("jp.pos").alias("pos"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each probe token: min over the d row
    counters at the token's positions.  Missing counters read as 0 (the
    min is then 0 — token never seen).  Probe side is tiny → d broadcast
    joins, no shuffle of the sketch.
    """
    est = None
    out = probes
    for j in range(depth):
        s_j = sketch.filter(F.col("j") == j).select(
            F.col("pos").alias(f"pos{j}"), F.col("cnt").alias(f"cnt{j}")
        )
        out = out.withColumn(f"pos{j}", _pos(F.col(token_col), j, width)).join(
            F.broadcast(s_j), f"pos{j}", "left"
        )
        c = F.coalesce(F.col(f"cnt{j}"), F.lit(0))
        est = c if est is None else F.least(est, c)
    return out.select(token_col, est.cast("long").alias("cms_est"))
