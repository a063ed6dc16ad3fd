"""Similarity search over embedding columns (SURVEY §2.10 NEW).

- `cosine_topk`: brute-force exact top-k — the correctness baseline.
  Join is broadcast (candidate set ships once per executor); per-pair
  cosine is a JVM-side fold; ranking is one window per query id.
- `cosine_topk_pandas`: same semantics, Arrow-batched numpy matmul —
  the fast path when candidates fit in memory (they ship as a plain
  broadcast variable).  ~50× less per-pair overhead than HOF eval.
- `lsh_ann_topk`: the 100 TB path — random-hyperplane LSH buckets
  (deterministic seeded planes), candidates only within bucket, then
  exact re-rank.  Recall < 1 by construction; `num_tables` trades
  recall for fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lwetl_spark.functions.vectors import cosine_similarity


def cosine_topk(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every row (excluding self).

    Returns (id, neighbor_id, cos, rank), rank 1..k, ties broken by
    neighbor id ascending for determinism.
    """
    q = (queries or df).select(F.col(id_col).alias("id"), F.col(vec_col).alias("qv"))
    c = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.join(F.broadcast(c), F.col("id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine_similarity("qv", "cv"), 6))
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "neighbor_id", "cos", "rank")
    )


def cosine_topk_pandas(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Arrow-batched exact top-k: candidate matrix broadcast to executors,
    per-batch numpy matmul, heap-free argpartition top-k.

    Same output contract as `cosine_topk`.  The candidate set must fit in
    executor memory (fine up to ~10M × 64d float32 ≈ 2.5 GB); beyond that
    use `lsh_ann_topk`.
    """
    import numpy as np
    import pandas as pd

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def topk_batches(it):
        cids, cmat, cnorms = b_ids.value, b_mat.value, b_norms.value
        for pdf in it:
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0] = 1.0
            sims = (q @ cmat.T) / qn[:, None] / cnorms[None, :]
            out_id, out_nb, out_cos, out_rank = [], [], [], []
            for row_i, qid in enumerate(pdf[id_col].to_numpy()):
                s = sims[row_i].copy()
                self_mask = cids == qid
                s[self_mask] = -np.inf
                # deterministic: sort by (-cos, neighbor_id)
                order = np.lexsort((cids, -np.round(s, 6)))
                order = order[~np.isin(order, np.flatnonzero(self_mask))][:k]
                for rank, j in enumerate(order, start=1):
                    out_id.append(qid)
                    out_nb.append(cids[j])
                    out_cos.append(round(float(sims[row_i, j]), 6))
                    out_rank.append(rank)
            yield pd.DataFrame(
                {"id": out_id, "neighbor_id": out_nb, "cos": out_cos, "rank": out_rank}
            )

    return df.select(id_col, vec_col).mapInPandas(
        topk_batches, schema="id long, neighbor_id long, cos double, rank int"
    )


def lsh_ann_topk(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    num_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Deterministic hyperplanes: plane (t, p) component j =
    sin(1 + t*10007 + p*101 + j) — fixed, engine-version-stable, no RNG
    state.  Sign pattern of the `num_planes` projections forms the bucket
    key per table; exact cosine re-rank runs within buckets only.
    """
    import math

    planes = [
        [
            [math.sin(1.0 + t * 10007 + p * 101 + j) for j in range(dim)]
            for p in range(num_planes)
        ]
        for t in range(num_tables)
    ]

    def bucket_expr(table_idx: int):
        tbl = planes[table_idx]
        bits = []
        for p_idx, plane in enumerate(tbl):
            arr = F.array(*[F.lit(x) for x in plane])
            proj = F.aggregate(
                F.zip_with(F.transform(F.col(vec_col), lambda x: x.cast("double")), arr, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit(1 << p_idx)).otherwise(F.lit(0)))
        key = bits[0]
        for b in bits[1:]:
            key = key + b
        return key

    buckets = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(F.array(*[bucket_expr(t) for t in range(num_tables)])).alias(
            "table_idx", "bucket"
        ),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id"),
            F.col(f"b.{id_col}").alias("neighbor_id"),
            F.col(f"a.{vec_col}").alias("qv"),
            F.col(f"b.{vec_col}").alias("cv"),
        )
        .dropDuplicates(["id", "neighbor_id"])
    )
    scored = cand.withColumn("cos", F.round(cosine_similarity("qv", "cv"), 6))
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "neighbor_id", "cos", "rank")
    )
