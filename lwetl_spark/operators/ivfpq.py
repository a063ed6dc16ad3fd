"""IVFADC: the composed IVF + PQ index (VERDICT r6 #1) — the standard
billion-vector ANN layout (Jégou et al. 2011, "Product quantization for
nearest neighbor search", §IV):

    coarse quantizer  →  cell-pruned scan of PACKED PQ CODES
                      →  ADC shortlist  →  exact re-rank

The repo's two halves each solve one scale problem and leave the other:
IVF cells (`similarity.build_ivf_index`) prune the SCAN but store full
float vectors (storage-bound at 10⁹+ vectors); flat PQ
(`similarity.build_pq_index`) compresses rows to 16 B but every probe
scans ALL codes (scan-bound).  IVFADC composes them: the probe reads
only its `nprobe` cells' directories, and what it reads is packed
int64 codes — cell-pruned AND 32× compressed.

Encoding is RESIDUAL (the classic choice, documented per VERDICT r6
#1): each normalized vector is quantized to its nearest cell centroid
and the PQ codebooks are trained on — and encode — the residual
``vn − C[cell]``.  Residuals are centered near zero with far smaller
spread than raw vectors, so the same (m, ksub) budget quantizes them
more finely; ADC reconstructs ``qn·vn ≈ qn·C[cell] + qn·recon(r)`` —
one per-(query, cell) constant plus m table lookups per candidate.

Determinism matches the family conventions exactly: the bounded
partitioning-invariant training sample and fixed-seed k-means are the
SHARED matrix-level trainers from `operators/similarity`
(`_spherical_kmeans_from_matrix`, `_pq_codebooks_from_matrix`), scores
round HALF_UP to 6 dp, ties break by neighbor id — so inline and
persisted paths are bit-identical (x_ivfpq_index_roundtrip) and the
frozen-quantizer incremental lifecycle equals a rebuild
(x_ivfpq_incremental).

No reference analog (lwetl is a JDBC ETL tool); the nearest public
designs are FAISS's IndexIVFPQ and the paper above.
"""

from __future__ import annotations

from py4j.protocol import Py4JError
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lwetl_spark.operators import _parallel as _pl
from lwetl_spark.operators import _partwrite as _pw
from lwetl_spark.operators._fsutil import path_exists as _path_exists
from lwetl_spark.operators._parallel import spread as _spread

from lwetl_spark.operators.similarity import (
    _PQ_BUCKETS,
    _ann_filter_semi,
    _make_assign_cells,
    _pq_codebooks_from_matrix,
    _score_candidates,
    _spherical_kmeans_from_matrix,
    _train_sample_matrix,
)

#: pinned on-disk schemas (r12, guide §6): fixed by this module's build
#: declarations — reads skip the footer-inference job (see
#: similarity.py's r12 note; partition cols parse as the pinned ints).
_IVFPQ_CODES_DDL = "id long, code long, cell int"
_IVFPQ_VECTORS_DDL = "id long, vec array<double>, bucket int"
_IVFPQ_CENTROIDS_DDL = "cell int, centroid array<double>"
_IVFPQ_CODEBOOKS_DDL = "subspace int, code int, centroid array<double>"
_IVFPQ_ROTATION_DDL = "row int, basis array<double>"


def _opq_rotation(Rres, m: int):
    """Parametric OPQ rotation (Ge et al. 2013, "Optimized Product
    Quantization", CVPR — the eigenvalue-allocation variant): PCA-align
    the residual cloud, then permute the principal directions into m
    contiguous sub-blocks whose eigenvalue LOG-PRODUCTS balance
    (greedy: descending eigenvalues into the lightest non-full bucket).
    For near-Gaussian residuals this provably minimizes the product
    quantizer's distortion bound among rotations — one d×d eigh on the
    ALREADY-COLLECTED training sample, d² driver floats, no extra
    passes.  Eigenvector signs canonicalize (largest-|component| entry
    positive) so retrains are deterministic.  Returns the d×d
    orthogonal matrix whose rows are the bucket-ordered basis."""
    import numpy as np

    d = Rres.shape[1]
    if d % m:
        # ADVICE r8: fail with the same explicit error as
        # _pq_codebooks_from_matrix — an indivisible dim otherwise
        # surfaces as an opaque "min() arg is an empty sequence" from
        # the bucket allocator below
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    cov = (Rres.T @ Rres) / max(len(Rres), 1)
    lam, U = np.linalg.eigh(cov)
    order = np.argsort(-lam)
    lam, U = lam[order], U[:, order]
    for j in range(d):
        k = int(np.abs(U[:, j]).argmax())
        if U[k, j] < 0:
            U[:, j] = -U[:, j]
    logs = np.log(np.maximum(lam, 1e-12))
    buckets: list[list[int]] = [[] for _ in range(m)]
    loads = [0.0] * m
    for j in range(d):
        free = [b for b in range(m) if len(buckets[b]) < sub]
        b = min(free, key=lambda x: (loads[x], x))
        buckets[b].append(j)
        loads[b] += float(logs[j])
    perm = [j for bucket in buckets for j in bucket]
    return U[:, perm].T


def _train_ivfpq(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    num_centroids: int,
    m: int,
    ksub: int,
    train_sample: int,
    iters: int,
    opq: bool = False,
):
    """Train the composed quantizer pair on ONE bounded sample collect:
    spherical k-means for the coarse cells (bit-identical to a
    standalone IVF trained on the same sample — shared matrix core),
    then per-subspace k-means codebooks on the sample's RESIDUALS —
    optionally OPQ-rotated first (r8): the codebooks then quantize the
    rotation's balanced sub-blocks.  Returns (C, books, Rot):
    (num_centroids × dim, m × ksub × dim/m, d×d orthogonal or None)."""
    Xn = _train_sample_matrix(df, vec_col, id_col, train_sample)
    C = _spherical_kmeans_from_matrix(Xn, num_centroids, iters)
    assign = (Xn @ C.T).argmax(axis=1)
    R = Xn - C[assign]
    Rot = _opq_rotation(R, m) if opq else None
    if Rot is not None:
        R = R @ Rot.T
    books = _pq_codebooks_from_matrix(R, m, ksub, iters)
    return C, books, Rot


def _make_ivfpq_encode(b_C, b_books, b_R=None):
    """mapInPandas generator: (id, v) → (id, cell, code) — assign each
    row to its nearest cell, pack the RESIDUAL's m sub-codes into one
    int64 (OPQ indexes rotate the residual first — `b_R`).  Shared by
    `ivfpq_topk`, `build_ivfpq_index` and `update_ivfpq_index` so
    inline and persisted codes are bit-identical.  Closure captures
    the broadcasts only."""

    def encode(it):
        import numpy as np  # noqa: F811 — pickled by value for workers
        import pandas as pd

        C = b_C.value
        B = b_books.value
        Rot = b_R.value if b_R is not None else None
        mm, _, sub = B.shape
        for pdf in it:
            if not len(pdf):
                continue
            v = np.array(pdf["v"].tolist(), dtype=np.float64)
            vn = v / np.maximum(np.linalg.norm(v, axis=1), 1e-12)[:, None]
            cell = (vn @ C.T).argmax(axis=1)
            R = vn - C[cell]
            if Rot is not None:
                R = R @ Rot.T
            code = np.zeros(len(pdf), dtype=np.int64)
            for j in range(mm):
                S = R[:, j * sub : (j + 1) * sub]
                d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                code |= d2.argmin(axis=1).astype(np.int64) << (8 * j)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "cell": cell.astype("int32"),
                    "code": code,
                }
            )

    return encode


def _make_ivfpq_adc(b_C, b_books, shortlist_n: int, b_R=None):
    """Cell-local ADC scorer (cogroup callback): full-precision queries
    probing a cell × that cell's PACKED CODES → per-(query, cell)
    shortlist of `shortlist_n` candidate pairs with ADC scores.

    Per query the work is one (m × ksub) dot table against the
    broadcast residual codebooks plus the scalar ``qn·C[cell]`` cell
    constant; per candidate it is m int lookups — no float vector is
    ever materialized for a candidate.  OPQ indexes (`b_R`) rotate the
    QUERY for the table part: the rotation is orthogonal, so
    qn·r = (R·qn)·(R·r) exactly and the stored codes approximate R·r —
    same lookup count, zero per-candidate overhead.  HALF_UP 6-dp
    rounding + position-order tie-break, the family determinism rules,
    so inline and persisted probes agree bit-for-bit."""
    import numpy as np
    import pandas as pd

    def local_adc(qpdf: "pd.DataFrame", cpdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"id": [], "neighbor_id": [], "score": []})
        if not len(qpdf) or not len(cpdf):
            return empty
        C = b_C.value
        B = b_books.value
        Rot = b_R.value if b_R is not None else None
        mm, _, sub = B.shape
        cell = int(cpdf["cell"].iloc[0])  # cogroup key: constant per call
        cids = cpdf["id"].to_numpy(np.int64)
        order = np.argsort(cids, kind="stable")  # position order == id order
        cids = cids[order]
        code = cpdf["code"].to_numpy(np.int64)[order]
        sub_codes = np.empty((len(cids), mm), dtype=np.int64)
        for j in range(mm):
            sub_codes[:, j] = (code >> (8 * j)) & 0xFF
        qids = qpdf["id"].to_numpy(np.int64)
        qmat = np.array(qpdf["v"].tolist(), dtype=np.float64)
        qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1), 1e-12)[:, None]
        # ADC: cell constant + m residual-table lookups per candidate
        scores = np.repeat((qn @ C[cell])[:, None], len(cids), axis=1)
        qt = qn if Rot is None else qn @ Rot.T  # rotate query, not codes
        for j in range(mm):
            T = qt[:, j * sub : (j + 1) * sub] @ B[j].T  # (nq, ksub)
            scores += T[:, sub_codes[:, j]]
        scores = np.floor(scores * 1e6 + 0.5) / 1e6  # HALF_UP like F.round
        n = len(cids)
        keys = (-np.rint(scores * 1e6).astype(np.int64)) * n + np.arange(n)[None, :]
        kk = min(shortlist_n + 1, n)  # +1 headroom for the self row
        part = np.argpartition(keys, kk - 1, axis=1)[:, :kk]
        part_keys = np.take_along_axis(keys, part, axis=1)
        topk = np.take_along_axis(part, np.argsort(part_keys, axis=1), axis=1)
        out = pd.DataFrame(
            {
                "id": np.repeat(qids, kk),
                "neighbor_id": cids[topk].ravel(),
                "score": np.take_along_axis(scores, topk, axis=1).ravel(),
            }
        )
        return out[out["id"] != out["neighbor_id"]]

    return local_adc


def _ivfpq_shortlist(
    probe_v: DataFrame,
    codes: DataFrame,
    b_C,
    b_books,
    shortlist_n: int,
    b_R=None,
) -> DataFrame:
    """Probes (id, cell, v) cogroup with codes (id, cell, code) per cell;
    per-cell ADC shortlists merge into one per-QUERY shortlist via a
    window (a candidate lives in exactly ONE cell, so no pair dedup)."""
    local = (
        probe_v.groupBy("cell")
        .cogroup(codes.groupBy("cell"))
        .applyInPandas(
            _make_ivfpq_adc(b_C, b_books, shortlist_n, b_R),
            "id long, neighbor_id long, score double",
        )
    )
    w_adc = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        local.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= shortlist_n)
        .select("id", "neighbor_id")
    )


def ivfpq_topk(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 16,
    nprobe: int = 6,
    m: int = 8,
    ksub: int = 64,
    train_sample: int = 10_000,
    iters: int = 8,
    rerank: int = 100,
    opq: bool = False,
) -> DataFrame:
    """Approximate top-k via inline IVFADC — cell-pruned ADC over packed
    residual codes + exact re-rank of the per-query shortlist.
    ``opq=True`` trains the parametric OPQ rotation on the residual
    cloud first (see `_opq_rotation`) — same code budget, better-
    conditioned subspaces; measured recall@5 delta vs plain IVFADC is
    documented in SCALE.md's OPQ row.

    Compute per query is ``|corpus|·nprobe/num_centroids`` ADC lookups
    (16 B/candidate) instead of |corpus| float-vector cosines; only
    ``rerank`` exact pairs per query re-join vectors.  Recall stacks the
    two approximations: the probed cells bound it above (IVF leg) and
    the residual codes select within them (ADC leg) — measured recall@5
    vs exact on the test corpora: 0.61-0.73 at (nprobe=6, rerank=100),
    0.77-0.83 at (nprobe=8, rerank=200) — raise ``rerank`` with
    expected neighbor-list density and ``nprobe`` with cell count, not
    corpus size (the x_ann_ivfpq contract probes at the latter
    setting).

    Returns (id, neighbor_id, cos, rank) — the family output contract;
    driver-checked by the x_ann_ivfpq recall band."""
    if ksub > 256:
        raise ValueError("ksub > 256 cannot pack into 8-bit sub-codes")
    C, books, Rot = _train_ivfpq(
        df, vec_col, id_col, num_centroids, m, ksub, train_sample, iters,
        opq=opq,
    )
    spark = df.sparkSession
    b_C = spark.sparkContext.broadcast(C)
    b_books = spark.sparkContext.broadcast(books)
    b_R = spark.sparkContext.broadcast(Rot) if Rot is not None else None
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    codes = base.mapInPandas(
        _make_ivfpq_encode(b_C, b_books, b_R), "id long, cell int, code long"
    )
    probe_n = min(nprobe, len(C))
    probe_v = base.mapInPandas(
        _make_assign_cells(b_C, probe_n, carry_v=True),
        "id long, cell int, v array<double>",
    )
    shortlist = _ivfpq_shortlist(
        probe_v, codes, b_C, b_books, max(rerank, k), b_R
    )
    scored = _score_candidates(df, shortlist, vec_col, id_col, "join")
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "neighbor_id", "cos", "rank")
    )


def build_ivfpq_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 16,
    m: int = 8,
    ksub: int = 64,
    train_sample: int = 10_000,
    iters: int = 8,
    train_df: DataFrame | None = None,
    opq: bool = False,
) -> None:
    """Persist an IVFADC index — the layout you'd deploy at 10⁹+
    vectors:

    - `{path}/centroids`: (cell, centroid) — the coarse quantizer;
    - `{path}/codebooks`: (subspace, code, centroid) — the RESIDUAL
      codebooks;
    - `{path}/rotation` (OPQ builds only, r8): the d×d orthogonal OPQ
      matrix, row-major — its PRESENCE marks the index as OPQ, so
      probes/appends/retrains dispatch without a params migration;
    - `{path}/params`: quantizer family + `n_at_train` (the corpus size
      the quantizers were trained against — `auto_maintain`'s growth
      signal);
    - `{path}/codes/cell=*/`: (id, code) packed int64 rows,
      HIVE-PARTITIONED BY CELL — a probe's parquet scan prunes to its
      nprobe directories AND reads 16 B/row (vs the IVF index's full
      vectors and the flat PQ index's full-table scan);
    - `{path}/vectors/bucket=*/`: (id, vec) hash-bucketed — touched
      only by the per-query exact re-rank join and by removals.

    ``train_df`` anchors the incremental equivalence contract exactly
    as in `build_ivf_index`/`build_pq_index`: a build over A then
    updated with B equals a build over A∪B with ``train_df=A``, because
    appends never move either quantizer."""
    if ksub > 256:
        raise ValueError("ksub > 256 cannot pack into 8-bit sub-codes")
    C, books, Rot = _train_ivfpq(
        df if train_df is None else train_df,
        vec_col, id_col, num_centroids, m, ksub, train_sample, iters,
        opq=opq,
    )
    spark = df.sparkSession
    b_C = spark.sparkContext.broadcast(C)
    b_books = spark.sparkContext.broadcast(books)
    b_R = spark.sparkContext.broadcast(Rot) if Rot is not None else None
    if Rot is not None:
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(Rot)],
            "row int, basis array<double>",
        ).write.mode("overwrite").parquet(f"{path}/rotation")
    else:
        # a non-OPQ rebuild over a previously-OPQ path must retire the
        # stale rotation, or every later probe would mis-rotate
        try:
            jvm = spark._jvm
            hp = jvm.org.apache.hadoop.fs.Path(f"{path}/rotation")
            fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(hp):
                fs.delete(hp, True)
        except (AttributeError, Py4JError):
            pass  # non-classic session without a JVM gateway
            # (AttributeError: no _jvm on Connect; Py4JError: gateway
            # call failed) — the loud _path_exists post-check below
            # still catches a delete that silently did not take
        # ADVICE r8: _load_quantizers uses rotation-presence as the OPQ
        # marker, so a silently no-op'd delete (Spark Connect has no
        # gateway) would make every later query mis-rotate residuals
        # against non-rotated codebooks with no error.  Verify the
        # delete actually took; if not, fail loudly now.
        if _path_exists(spark, f"{path}/rotation"):
            raise RuntimeError(
                f"stale OPQ rotation at {path}/rotation could not be"
                " deleted (no JVM filesystem gateway on this session);"
                " remove it manually or rebuild with opq=True"
            )
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(C)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (j, c, [float(x) for x in books[j, c]])
            for j in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "subspace int, code int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    base = _spread(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))
    # n_at_train records the corpus the QUANTIZERS saw, not the corpus
    # indexed (ADVICE r7): a rebuild-with-train_df anchor must carry the
    # same growth baseline as the incrementally maintained index it is
    # contract-equal to, or growth_pm drift readings diverge
    n_at_train = (df if train_df is None else train_df).count()
    spark.createDataFrame(
        [(
            int(num_centroids), int(m), int(ksub), int(train_sample),
            int(iters), int(n_at_train),
        )],
        "num_centroids int, m int, ksub int, train_sample int,"
        " iters int, n_at_train long",
    ).write.mode("overwrite").parquet(f"{path}/params")
    # r12 (guide §2.6): the codes and vectors writes are independent —
    # both pure functions of `df`, disjoint output tables — so they run
    # as concurrent job groups (the vectors copy hides under the encode)
    def _codes_leg():
        # repartition("cell") before the partitioned write (the
        # build_text_index idiom): without it every task writes a sliver
        # file into every cell it holds — num_centroids × tasks tiny
        # files whose parquet footers dominate probe bytes (measured
        # 109 B/row vs 16 B of payload at 256 cells).  The shuffle
        # moves 16-byte rows.
        base.mapInPandas(
            _make_ivfpq_encode(b_C, b_books, b_R),
            "id long, cell int, code long",
        ).repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(f"{path}/codes")

    def _vectors_leg():
        # r11: cluster by the partition column when the input is
        # many-split (the codes-write idiom above, made conditional) —
        # without it a many-split corpus writes tasks × buckets sliver
        # files, and the retrain path re-reads ALL of them; a 1-split
        # local build skips the array<double> exchange (measured
        # +0.4 s on x_ann_pq)
        _pw.cluster_for_write(
            df.select(
                F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
            ).withColumn(
                "bucket", F.pmod(F.xxhash64("id"), F.lit(_PQ_BUCKETS))
            ),
            "bucket",
        ).write.mode("overwrite").partitionBy("bucket").parquet(
            f"{path}/vectors"
        )

    _pl.overlap_all(_codes_leg, _vectors_leg)


def _load_quantizers(spark, path: str):
    """The bounded driver reads of the IVFADC family: the
    num_centroids × dim coarse matrix, the m × ksub × dim/m residual
    codebooks, and (OPQ indexes) the d×d rotation — its presence on
    disk is the OPQ marker."""
    import numpy as np

    cent_rows = spark.read.schema(_IVFPQ_CENTROIDS_DDL).parquet(f"{path}/centroids").collect()
    C = np.array(
        [r["centroid"] for r in sorted(cent_rows, key=lambda r: r["cell"])],
        dtype=np.float64,
    )
    cb = spark.read.schema(_IVFPQ_CODEBOOKS_DDL).parquet(f"{path}/codebooks").collect()
    mm = max(r["subspace"] for r in cb) + 1
    kk = max(r["code"] for r in cb) + 1
    sub = len(cb[0]["centroid"])
    books = np.empty((mm, kk, sub))
    for r in cb:
        books[r["subspace"], r["code"]] = r["centroid"]
    Rot = None
    if _path_exists(spark, f"{path}/rotation"):
        rows = spark.read.schema(_IVFPQ_ROTATION_DDL).parquet(f"{path}/rotation").collect()
        Rot = np.array(
            [r["basis"] for r in sorted(rows, key=lambda r: r["row"])],
            dtype=np.float64,
        )
    return C, books, Rot


def query_ivfpq_index(
    spark,
    path: str,
    queries_df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 6,
    rerank: int = 100,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Probe a persisted IVFADC index: load the two quantizers (bounded
    driver reads), assign ONLY the queries to their `nprobe` cells,
    prune the codes scan to the probed cells (literal partition filter —
    the r6 IVF pruned-scan idiom, pinned by
    test_ivfpq_probe_prunes_cells), ADC-score cell-locally, exact
    re-rank each query's shortlist against the stored vectors.

    At 100 TB the probe reads nprobe/num_centroids of the CODES table
    (16 B/row) — cell-pruned AND compressed, the property neither half
    has alone.  Same output contract as `ivfpq_topk` (self-matches
    excluded when a query id is indexed)."""
    C, books, Rot = _load_quantizers(spark, path)
    b_C = spark.sparkContext.broadcast(C)
    b_books = spark.sparkContext.broadcast(books)
    b_R = spark.sparkContext.broadcast(Rot) if Rot is not None else None
    probe_n = min(nprobe, len(C))
    # NO spread here (r12, VERDICT r11 #1): a probe batch is small at
    # EVERY scale — it never grows with the corpus — so a round-robin
    # exchange + wide Arrow stage per probe batch is permanent overhead
    # (x_ann_ivfpq +13% normalized when this was spread in r11).
    q_base = queries_df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    probe_v = q_base.mapInPandas(
        _make_assign_cells(b_C, probe_n, carry_v=True),
        "id long, cell int, v array<double>",
        # eager: feeds both the probed-cell collect and the cogroup
    ).localCheckpoint(eager=True)
    probed = [r["cell"] for r in probe_v.select("cell").distinct().collect()]
    codes = (
        spark.read.schema(_IVFPQ_CODES_DDL).parquet(f"{path}/codes")
        .filter(F.col("cell").isin(probed))
        .select("id", "cell", "code")
    )
    # metadata-filter pushdown (r9, VERDICT r8 #3): restrict the
    # 16-byte code rows BEFORE the ADC shortlist, so the rerank pool
    # is drawn from the filtered set and k is guaranteed from it
    codes = _ann_filter_semi(codes, filter_ids, "id")
    shortlist = _ivfpq_shortlist(
        probe_v, codes, b_C, b_books, max(rerank, k), b_R
    )
    # exact re-rank vectors: stored corpus ∪ the query batch (same ids
    # carry identical vectors, so the union is conflict-free)
    vectors = (
        spark.read.schema(_IVFPQ_VECTORS_DDL).parquet(f"{path}/vectors")
        .select("id", "vec")
        .unionByName(
            queries_df.select(
                F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
            )
        )
        .dropDuplicates(["id"])
    )
    scored = _score_candidates(vectors, shortlist, "vec", "id", "join")
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "neighbor_id", "cos", "rank")
    )


def update_ivfpq_index(
    spark,
    path: str,
    delta_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incrementally add vectors to a persisted IVFADC index — the
    composed counterpart of `update_ivf_index`/`update_pq_index`.
    ``delta_df`` ids must be disjoint from the indexed set (the ingest
    contract).  Every stage is delta-sized: two bounded driver reads
    (both quantizers — FROZEN; appends never move them, which makes
    `== rebuild with train_df=` exact), one Arrow assign+encode pass
    over the delta, cell-partition APPENDS into codes and hash-bucket
    APPENDS into vectors."""
    C, books, Rot = _load_quantizers(spark, path)
    b_C = spark.sparkContext.broadcast(C)
    b_books = spark.sparkContext.broadcast(books)
    b_R = spark.sparkContext.broadcast(Rot) if Rot is not None else None
    base = delta_df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    # r12 (guide §2.6): independent appends to disjoint tables — run
    # as concurrent job groups
    def _codes_leg():
        base.mapInPandas(
            _make_ivfpq_encode(b_C, b_books, b_R),
            "id long, cell int, code long",
        ).write.mode("append").partitionBy("cell").parquet(f"{path}/codes")

    def _vectors_leg():
        delta_df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        ).withColumn(
            "bucket", F.pmod(F.xxhash64("id"), F.lit(_PQ_BUCKETS))
        ).write.mode("append").partitionBy("bucket").parquet(
            f"{path}/vectors"
        )

    _pl.overlap_all(_codes_leg, _vectors_leg)


def remove_from_ivfpq_index(spark, path: str, ids: DataFrame) -> None:
    """Purge vectors from a persisted IVFADC index.  Codes rewrite
    prunes to the AFFECTED CELLS (located via an (id, cell)-only
    semi-join — 16-byte rows, vectors never shuffle); vectors rewrite
    prunes to the affected hash buckets.  Per-write dynamic overwrite +
    dir-delete retirement + remove-everything readability — the
    `_partwrite` contract shared with the other three index families."""
    from lwetl_spark.operators import _partwrite as _pw

    ids_n = (
        ids.select(F.col(ids.columns[0]).alias("id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    codes_tbl = spark.read.schema(_IVFPQ_CODES_DDL).parquet(f"{path}/codes")
    vectors_tbl = spark.read.schema(_IVFPQ_VECTORS_DDL).parquet(f"{path}/vectors")
    for tbl, frame, part in (
        ("codes", codes_tbl, "cell"),
        ("vectors", vectors_tbl, "bucket"),
    ):
        affected = [
            r[part]
            for r in frame.select("id", part)
            .join(ids_n, "id", "left_semi")
            .select(part)
            .distinct()
            .collect()
        ]  # bounded: ≤ num_centroids cells / ≤ _PQ_BUCKETS buckets
        if not affected:
            continue
        kept = (
            frame.filter(F.col(part).isin(affected))
            .join(ids_n, "id", "left_anti")
            # eager: the overwrite below must not race its own scan
            .localCheckpoint(eager=True)
        )
        present = {r[part] for r in kept.select(part).distinct().collect()}
        emptied = set(affected) - present
        if emptied:
            # collect BEFORE any write: the frame's file listing is a
            # read-time snapshot and the overwrite deletes old files
            survivors = {
                r[part] for r in frame.select(part).distinct().collect()
            } - emptied
        if present:
            _pw.dynamic_overwrite(kept, f"{path}/{tbl}", part)
        if emptied:
            _pw.delete_partition_dirs(
                spark, f"{path}/{tbl}", part, sorted(emptied)
            )
            if not survivors:
                _pw.write_empty_partition(
                    spark, f"{path}/{tbl}", part, min(emptied),
                    kept.drop(part).schema,
                )


def ivfpq_index_stats(spark, path: str) -> DataFrame:
    """Census of a persisted IVFADC index — the `auto_maintain` input:
    cell balance (the IVF drift signal: appends freeze the quantizer,
    so a drifting delta distribution shows up as `imbalance_pm` =
    1000·max·cells/total), code/vector row-count consistency, and
    `growth_pm` = 1000·n_codes/n_at_train (the PQ-side drift signal:
    codebooks trained against a corpus the index has since outgrown).
    One (cell)-keyed count + one vectors count + the 1-row params read
    → a single bounded output row; exact integers only."""
    per_cell = (
        spark.read.schema(_IVFPQ_CODES_DDL).parquet(f"{path}/codes")
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )
    n_vec = spark.read.schema(_IVFPQ_VECTORS_DDL).parquet(f"{path}/vectors").agg(
        F.count("*").cast("long").alias("n_vectors")
    )
    params = spark.read.parquet(f"{path}/params").select("n_at_train")
    return (
        per_cell.agg(
            F.count("*").alias("n_cells"),
            # coalesce: a removed-everything index has zero cells, and
            # its census must report exact zeros, not NULLs
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_codes"),
            F.coalesce(F.max("n"), F.lit(0)).alias("max_cell"),
            F.coalesce(F.min("n"), F.lit(0)).alias("min_cell"),
            F.coalesce(
                F.expr("1000 * max(n) * count(*) div sum(n)"), F.lit(0)
            ).alias("imbalance_pm"),
        )
        .crossJoin(n_vec)
        .crossJoin(params)
        .select(
            "n_cells", "n_codes", "n_vectors", "max_cell", "min_cell",
            "imbalance_pm",
            F.expr("1000 * n_codes div greatest(n_at_train, 1)")
            .cast("long").alias("growth_pm"),
            (F.col("n_codes") == F.col("n_vectors")).alias("consistent"),
        )
    )


def retrain_ivfpq_index(
    spark,
    path: str,
    num_centroids: int | None = None,
    m: int | None = None,
    ksub: int | None = None,
    train_sample: int | None = None,
    iters: int | None = None,
) -> None:
    """Re-train BOTH quantizers over the CURRENT vectors and re-encode —
    the maintenance pass that repays append drift (`update_ivfpq_index`
    freezes them by design).  Geometry defaults to the INDEX'S OWN
    family from `{path}/params` (the retrain_ivf/pq_index contract: a
    maintenance pass must not silently change the quantizer family);
    explicit args override."""
    need = (num_centroids is None or m is None or ksub is None
            or train_sample is None or iters is None)
    if need:
        p = spark.read.parquet(f"{path}/params").collect()[0]
        num_centroids = num_centroids if num_centroids is not None else p["num_centroids"]
        m = m if m is not None else p["m"]
        ksub = ksub if ksub is not None else p["ksub"]
        train_sample = train_sample if train_sample is not None else p["train_sample"]
        iters = iters if iters is not None else p["iters"]
    members = (
        spark.read.schema(_IVFPQ_VECTORS_DDL).parquet(f"{path}/vectors")
        .select("id", "vec")
        .localCheckpoint(eager=True)
    )
    build_ivfpq_index(
        members, path, vec_col="vec", id_col="id",
        num_centroids=num_centroids, m=m, ksub=ksub,
        train_sample=train_sample, iters=iters,
        # OPQ-ness is part of the index family (the rotation marker on
        # disk), and a maintenance pass must never silently change the
        # family — re-derive a fresh rotation from the current residuals
        opq=_path_exists(spark, f"{path}/rotation"),
    )
