"""Skew-handling operators (SURVEY §4 — 100 TB design).

AQE's skew-join splitting covers sort-merge joins; these utilities cover
the cases it cannot:

- `salted_join`: a skewed equi-join where the build side is too large to
  broadcast.  The big side gets a deterministic salt in [0, salt); the
  small side is replicated `salt` times; the join key becomes
  (key, salt), so a hot key's rows spread over `salt` reducers instead
  of one.
- `salted_topk_per_group`: per-group top-k where one group holds a large
  share of all rows.  Phase 1 ranks within (group, salt) partitions and
  keeps k per salt; phase 2 merges the ≤ salt·k survivors per group.
  Output is identical to the single-pass window (same deterministic
  tie-break), but no reducer ever sees more than ~|group|/salt rows.

Both produce results identical to their unsalted forms — tests assert
exact equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int, exclude: list[str] | None = None):
    """Deterministic salt in [0, salt): hash of the row's columns — stable
    under retries (unlike rand()/monotonically_increasing_id)."""
    cols = [c for c in df.columns if c not in (exclude or [])] or df.columns
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small
    side across all salt values, join on (key..., _salt).

    Equivalent to ``big.join(small, on, how)`` for inner/left joins.
    The small side is shuffled `salt`× (it is small); the big side's hot
    keys fan out over `salt` reducers.  Right/full joins are rejected:
    the replicated small side would null-extend once per salt value.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn("_salt", _salt_col(big, salt, exclude=keys))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, on=keys + ["_salt"], how=how)
    return out.drop("_salt")


def salted_topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str,
    salt: int = 16,
    descending: bool = True,
) -> DataFrame:
    """Two-phase per-group top-k (O5 at scale).

    A plain ``row_number().over(partitionBy(group))`` funnels every row of
    a hot group through one reducer; here phase 1 keeps k rows per
    (group, salt) and phase 2 ranks the ≤ salt·k survivors.  The
    tie-break column must be unique within a group so both phases order
    deterministically and match the unsalted result exactly.
    """
    ordering = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(tiebreak_col).asc(),
    ]
    staged = df.withColumn("_salt", _salt_col(df, salt, exclude=[group_col]))
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*ordering)
    survivors = (
        staged.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy(*ordering)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )
