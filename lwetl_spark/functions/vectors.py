"""Vector math over `array<float>` embedding columns.

Pure higher-order-function expressions (JVM-side).  All arithmetic is done
in double after an explicit element cast, with a strict left-to-right fold —
so results are bit-reproducible and match any engine that folds the same way
(the DuckDB oracles mirror this exact formula).

A pandas_udf variant (`cosine_topk_pandas`) exists for the
brute-force-top-k hot path: Arrow-batched numpy matmul beats per-row
HOF evaluation when the candidate set fits in a broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a[i]·b[i] — sequential fold, double precision."""
    prods = F.zip_with(_as_double(_col(a)), _as_double(_col(b)), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    v = _as_double(_col(a))
    return F.sqrt(F.aggregate(F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖), null-safe on zero vectors."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(None).cast("double"))


def max_abs(a: Column | str) -> Column:
    """max |a[i]| in double — the symmetric-quantization scale basis."""
    return F.array_max(F.transform(_as_double(_col(a)), F.abs))


def quantize_int8(a: Column | str) -> Column:
    """Symmetric int8 quantization: q[i] = floor((x*127)/max|x|), the
    embedding-compression step of a vector-store ingest (4x smaller than
    float32, 8x smaller than float64 on the wire and in ANN state).

    floor (not round) and the exact (x*127)/m association are chosen
    because both are bit-reproducible across engines on identical IEEE
    doubles — the DuckDB oracle mirrors the formula term-for-term.
    Zero vectors quantize to zeros.  Row-local, codegen'd, zero shuffle.
    """
    v = _as_double(_col(a))
    m = F.array_max(F.transform(v, F.abs))
    q = F.transform(v, lambda x: F.floor((x * F.lit(127.0)) / m).cast("int"))
    return F.when(m > 0, q).otherwise(F.transform(v, lambda x: F.lit(0)))


def standardize_embeddings(df: "DataFrame", col: str = "embedding") -> "DataFrame":
    """Per-dimension z-score standardization of an embedding column —
    the feature-scaling step in front of clustering / quantization /
    similarity training.  (Training-pipeline op, NEW — no reference
    analog.)

    Scale design (100 TB): per-dim stats come from ONE aggregation over
    posexplode(dim, v) — d groups only, so map-side partial aggregation
    reduces each partition to d rows and the shuffle carries
    O(partitions · d), not O(rows · d).  The d-row result is collected
    and folded back as two literal arrays (a broadcast of 2·d doubles),
    so the normalization itself is a row-local pair of zip_with's —
    zero shuffle, no join, no second pass over the data.  Degenerate
    dimensions (stddev 0) divide by 1, leaving the centered value.

    Adds `<col>_z` (array<double>); leaves every input column intact.
    """
    from pyspark.sql import functions as F

    stats = (
        df.select(F.posexplode(col).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.avg("v").alias("m"), F.stddev_pop("v").alias("s"))
        .collect()
    )
    by_dim = {r["dim"]: r for r in stats}
    means = F.array(*[F.lit(float(by_dim[i]["m"])) for i in sorted(by_dim)])
    stds = F.array(
        *[F.lit(float(by_dim[i]["s"]) if by_dim[i]["s"] else 1.0) for i in sorted(by_dim)]
    )
    centered = F.zip_with(F.col(col), means, lambda v, mm: v - mm)
    return df.withColumn(col + "_z", F.zip_with(centered, stds, lambda c, s: c / s))
