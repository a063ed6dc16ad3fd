"""Z-order (Morton-curve) clustering — multi-dimensional data layout.

A table sorted on one column gives tight per-file min/max statistics on
THAT column only; a range predicate on any other column prunes nothing.
Interleaving the bits of k columns into one sort key (the Z/Morton
curve) makes files cover small k-dimensional tiles, so min/max stats
prune scans for box predicates on ANY clustered column — the layout
trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` (this is the
format-free Spark-native equivalent).

Scale design (100 TB):
- The z-value is a pure integer expression (static shift/mask terms,
  whole-stage codegen — shift counts must be Python ints, so the terms
  are built in a Python loop, never a fold over a bit column).
- The write is ``repartitionByRange(z)`` (one range-exchange — the same
  shuffle a global sort would pay) + ``sortWithinPartitions`` so each
  output task writes whole z-tiles; parquet row-group stats then carry
  tight bounds on every clustered dimension.
- Columns are first reduced to ``bits``-bit lattice coordinates by
  masking (`col & (2^bits - 1)`): rank-based normalization would need a
  global quantile pass; masking is free and adequate for id-like keys.
  For heavily skewed real-valued columns, bucketize to ranks first and
  z-order the rank columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton z-value interleaving the low ``bits`` bits of each column
    (column j contributes bit b to output position ``b*k + j``).
    k * bits must fit in 63 bits.  Bit-identical in any engine with
    shift/mask integer ops (see ``zvalue_sql`` for the oracle form)."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed 64-bit z-value")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    mask = (1 << bits) - 1
    terms = [
        F.shiftleft(
            F.shiftright(c.bitwiseAND(F.lit(mask)), b).bitwiseAND(F.lit(1)),
            b * k + j,
        )
        for b in range(bits)
        for j, c in enumerate(cs)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def zvalue_sql(cols: list[str], bits: int = 16) -> str:
    """The identical z-value as portable SQL text (for oracles / other
    engines): same static shift/mask terms the Spark expression uses."""
    k = len(cols)
    mask = (1 << bits) - 1
    terms = [
        f"(((({c} & {mask}) >> {b}) & 1) << {b * k + j})"
        for b in range(bits)
        for j, c in enumerate(cols)
    ]
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the z-curve of ``cols``: one range
    shuffle on the z-value, in-task sort, tight row-group stats on every
    clustered column."""
    z = zvalue(cols, bits).alias("_z")
    tagged = df.withColumn("_z", z)
    parted = (
        tagged.repartitionByRange(num_files, "_z")
        if num_files
        else tagged.repartitionByRange("_z")
    )
    parted.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(path)
