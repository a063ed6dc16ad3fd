#!/usr/bin/env python
"""Scaling probe: run the training-data operators on 1x/4x/16x copies of
the documents corpus and report wall time + throughput.  Copies are
de-correlated (per-copy vowel rotation) so near-dup structure — and thus
output size — stays proportional to corpus size, isolating the engine's
scaling behavior from workload blow-up.

Usage: python tools/scale_probe.py [sf_dir]   (default /root/testdata/sf0.1)
Writes one JSON line per (operator, scale).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from itertools import permutations

#: 24 distinct vowel permutations (every permutation keeps vowels
#: vowels, so stopword/fluency statistics survive the rotation)
ROTS = ["".join(p) for p in permutations("aeiou")][:24]

#: VERDICT r4 #5: a SECOND independent transform family so copies past
#: 24x stay textually distinct — per-copy consonant permutations over
#: 'bcdfg'.  120 permutations x 24 vowel rotations = 2880 distinct
#: (vowel, consonant) combos, enough for a 256x (and beyond) rehearsal
#: with meaningful dedup retention.  permutations() yields the identity
#: first, so copies 0-23 are byte-identical to the pre-r5 generator
#: (probe rows stay comparable).  Both families are char->char
#: translates: length, token boundaries, punctuation, alpha ratio, and
#: word-length distributions are all preserved — only the token
#: identities change, which is exactly what de-correlates near-dup
#: structure without perturbing the quality statistics under test.
CROTS = ["".join(p) for p in permutations("bcdfg")]


def _decorrelate(text_col, i: int):
    """Per-copy deterministic de-correlation: vowel rotation i%24 +
    consonant rotation (i//24)%120 — unique combo for i < 2880."""
    rotated = F.translate(text_col, "aeiou", ROTS[i % len(ROTS)])
    ci = (i // len(ROTS)) % len(CROTS)
    if ci:
        rotated = F.translate(rotated, "bcdfg", CROTS[ci])
    return rotated


def scaled_docs(spark, sf_dir: str, scale: int):
    from lwetl_spark.catalog import load_table

    base = load_table(spark, sf_dir, "documents")
    n = base.count()
    parts = []
    for i in range(scale):
        parts.append(
            base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                _decorrelate(F.col("text"), i).alias("text"),
                "lang",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df, n * scale


def scaled_docs_src(spark, sf_dir: str, scale: int):
    """scaled_docs + the source column (constant source set across
    copies — group count stays fixed while the corpus grows)."""
    from lwetl_spark.catalog import load_table

    base = load_table(spark, sf_dir, "documents")
    n = base.count()
    parts = []
    for i in range(scale):
        parts.append(
            base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                _decorrelate(F.col("text"), i).alias("text"),
                "lang",
                "source",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df, n * scale


def _fuzzy_probe(d):
    from lwetl_spark.operators.decontaminate import fuzzy_contamination_hits
    from lwetl_spark.operators.sampling import split_by_key

    corpus, bench = split_by_key(d, "doc_id", 0.04, salt="bench")
    return fuzzy_contamination_hits(corpus, bench).count()


def _corpus_pipeline(d):
    """quality gate → digest dedup → per-lang stats (x_corpus_pipeline shape)."""
    from lwetl_spark.functions.text import quality_features

    feats = quality_features("text")
    scored = d.select(
        "doc_id",
        "lang",
        F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))).alias("digest"),
        feats["n_tokens"].alias("n_tokens"),
    )
    return (
        scored.filter(F.col("n_tokens") >= 10)
        .groupBy("digest")
        .agg(F.min("lang").alias("lang"), F.max("n_tokens").alias("n_tokens"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("sum_tokens"))
        .collect()
    )


def scaled_events(spark, sf_dir: str, scale: int):
    """Copies with shifted user_ids: key cardinality grows with scale,
    as it does when a real event stream grows."""
    from lwetl_spark.catalog import load_table

    base = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    n = base.count()
    parts = [
        base.withColumn("user_id", F.col("user_id") + i * 10_000_000)
        .withColumn("event_id", F.col("event_id") + i * 1_000_000_000)
        for i in range(scale)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df, n * scale


def _asof_probe(ev):
    from lwetl_spark.operators.joins import asof_join

    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.sum("value").alias("v"))
    )
    return asof_join(clicks, purchases, on="user_id").count()


def _cluster_probe(d):
    """minhash pairs → connected components (the full pairs→clusters path)."""
    from lwetl_spark.operators.dedup import connected_components, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(d, threshold=0.5).select("id_a", "id_b")
    return connected_components(pairs).count()


def main() -> None:
    from lwetl_spark.operators.dedup import exact_dedup_normalized, minhash_lsh_pairs
    from lwetl_spark.queries import QUERIES  # noqa: F401 (session warm path)
    from lwetl_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = None
    cli_scales = None  # NB: 'scales' is rebound by the emb_ops loop below
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        if a.startswith("--scales="):
            cli_scales = tuple(int(x) for x in a.split("=", 1)[1].split(","))
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale_probe")

    event_ops = {"asof_join": _asof_probe}
    for op_name, fn in event_ops.items():
        if only and op_name not in only:
            continue
        for scale in (1, 4, 16):
            df, n_rows = scaled_events(spark, sf_dir, scale)
            df = df.persist()
            df.count()
            t0 = time.time()
            fn(df)
            dt = time.time() - t0
            df.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {
                        "op": op_name,
                        "scale": scale,
                        "rows": n_rows,
                        "sec": round(dt, 2),
                        "rows_per_sec": int(n_rows / dt),
                    }
                )
            )

    # round-2 ops over scaled embeddings: copies get rotated vectors
    # (norm-preserving, decorrelates neighbors) and shifted ids
    def scaled_embeddings(scale: int):
        from lwetl_spark.catalog import load_table

        base = load_table(spark, sf_dir, "embeddings")
        n = base.count()
        parts = []
        for i in range(scale):
            rot = (i * 7) % 64
            parts.append(
                base.select(
                    (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                    F.expr(
                        f"concat(slice(embedding, {rot + 1}, {64 - rot}),"
                        f" slice(embedding, 1, {rot}))"
                    ).alias("embedding"),
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df, n * scale

    from lwetl_spark.operators.similarity import (
        cosine_topk_blocked,
        has_near_duplicate,
        lsh_ann_topk,
        pq_topk,
        semantic_dedup,
    )

    import math

    # LSH planes and k-means cells must grow with the corpus so buckets /
    # cells keep constant size (see lsh_ann_topk docstring: fixed planes
    # -> quadratic candidates); blocks likewise keep per-task memory flat
    emb_ops = {
        "ann_lsh_join": (
            lambda d, s: lsh_ann_topk(
                d, k=5, num_planes=4 + int(math.log2(s)), num_tables=12
            ).count(),
            (1, 4, 16),
        ),
        "semantic_dedup": (
            lambda d, s: semantic_dedup(
                d, threshold=0.4, nprobe=2, num_centroids=16 * s
            ).count(),
            (1, 4, 16),
        ),
        "has_near_dup_exact": (
            lambda d, s: has_near_duplicate(
                d, 0.4, q_blocks=4 * s, c_blocks=4
            ).count(),
            (1, 4, 16),
        ),
        # inherently O(n^2): probe 1x/4x only, expect ~16x time at 4x
        "exact_topk_blocked": (
            lambda d, s: cosine_topk_blocked(
                d, k=5, q_blocks=4 * s, c_blocks=4
            ).count(),
            (1, 4),
        ),
        # PQ: the O(n^2) ADC scan runs on 16-byte (id, code) rows, not
        # 512-byte vectors — blocks scale like exact_topk but each cell
        # moves/holds 32x less data; re-rank joins only n*rerank pairs
        "ann_pq": (
            lambda d, s: pq_topk(d, k=5, q_blocks=4 * s, c_blocks=4).count(),
            (1, 4, 16),
        ),
    }
    for op_name, (fn, scales) in emb_ops.items():
        if only and op_name not in only:
            continue
        for scale in scales:
            df, n_vecs = scaled_embeddings(scale)
            df = df.persist()
            df.count()
            t0 = time.time()
            fn(df, scale)
            dt = time.time() - t0
            df.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {
                        "op": op_name,
                        "scale": scale,
                        "vecs": n_vecs,
                        "sec": round(dt, 2),
                        "vecs_per_sec": int(n_vecs / dt),
                    }
                ),
                flush=True,
            )

    # IVF lifecycle: the CLAIM is that update cost is DELTA-sized (one
    # bounded centroid read + delta-only assignment + appends) and that
    # removal cost is locate (an (id, cell)-pruned scan) + bounded cell
    # rewrites — so a FIXED delta/removal set against a growing index
    # must stay near-flat.  Cells grow with the corpus (constant cell
    # size), mirroring a real deployment.
    if only is None or "ivf_update" in only:
        import shutil
        import tempfile

        from lwetl_spark.operators.similarity import (
            build_ivf_index,
            ivf_index_stats,
            remove_from_ivf_index,
            update_ivf_index,
        )

        for scale in cli_scales or (1, 4, 16):
            df, n_vecs = scaled_embeddings(scale)
            df = df.persist()
            df.count()
            # FIXED delta across scales: the base table under shifted ids
            # (2k vecs at sf0.1) — a flat row below means the lifecycle
            # pays for its delta, not for the index it lands in
            base_emb, n_delta = scaled_embeddings(1)
            delta = base_emb.select(
                (F.col("vec_id") + 900_000_000).alias("vec_id"), "embedding"
            ).localCheckpoint(eager=True)
            removed = (
                delta.filter(F.col("vec_id") % 4 == 1)
                .select("vec_id")
                .localCheckpoint(eager=True)
            )
            n_removed = removed.count()
            work = tempfile.mkdtemp(prefix="lwetl_spark_ivfprobe_")
            path = work + "/index"
            t0 = time.time()
            build_ivf_index(df, path, num_centroids=16 * scale)
            t_build = time.time() - t0
            t0 = time.time()
            update_ivf_index(spark, path, delta)
            t_update = time.time() - t0
            t0 = time.time()
            remove_from_ivf_index(spark, path, removed)
            t_remove = time.time() - t0
            t0 = time.time()
            st = ivf_index_stats(spark, path).collect()[0]
            t_stats = time.time() - t0
            assert st["n_vectors"] == n_vecs + n_delta - n_removed, st
            df.unpersist()
            spark.catalog.clearCache()
            shutil.rmtree(work, ignore_errors=True)
            print(
                json.dumps(
                    {
                        "op": "ivf_update",
                        "scale": scale,
                        "vecs": n_vecs,
                        "delta": n_delta,
                        "removed": n_removed,
                        "build_sec": round(t_build, 2),
                        "update_sec": round(t_update, 2),
                        "remove_sec": round(t_remove, 2),
                        "stats_sec": round(t_stats, 2),
                        "imbalance_pm": st["imbalance_pm"],
                    }
                ),
                flush=True,
            )

    # persisted IVF index: build once (timed) then probe with a 1k query
    # batch (timed separately) — the build-once/probe-many amortization
    # story.  Cells grow with the corpus (16·s) so per-cell membership —
    # and thus per-probe candidate volume — stays constant.
    import shutil
    import tempfile

    from lwetl_spark.operators.similarity import build_ivf_index, query_ivf_index

    for scale in () if (only and "ivf_index" not in only) else (1, 4, 16):
        df, n_vecs = scaled_embeddings(scale)
        df = df.persist()
        df.count()
        path = tempfile.mkdtemp(prefix="ivfidx_probe_") + "/index"
        t0 = time.time()
        build_ivf_index(df, path, num_centroids=16 * scale)
        t_build = time.time() - t0
        qbatch = df.orderBy(F.xxhash64("vec_id")).limit(1000)
        t0 = time.time()
        query_ivf_index(spark, path, qbatch, k=5).count()
        t_probe = time.time() - t0
        df.unpersist()
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "op": "ivf_index",
                    "scale": scale,
                    "vecs": n_vecs,
                    "build_sec": round(t_build, 2),
                    "probe_1k_sec": round(t_probe, 2),
                }
            ),
            flush=True,
        )
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)

    ops = {
        "dup_spans": lambda d: __import__(
            "lwetl_spark.operators.dedup", fromlist=["duplicate_spans"]
        ).duplicate_spans(d).count(),
        "dedup_clusters": _cluster_probe,
        "exact_dedup": lambda d: exact_dedup_normalized(d).count(),
        "minhash_lsh": lambda d: minhash_lsh_pairs(d, threshold=0.5).count(),
        "token_stats": lambda d: d.select(
            F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n")
        )
        .agg(F.sum("n"), F.avg("n"))
        .collect(),
        "corpus_pipeline": _corpus_pipeline,
        # r3: corpus-frequency fluency scoring — the vocab agg + vocab
        # join is the scale surface; bucket distribution consumed so the
        # threshold join isn't pruned
        "fluency_buckets": lambda d: __import__(
            "lwetl_spark.operators.sampling", fromlist=["fluency_buckets"]
        ).fluency_buckets(d).groupBy("bucket").count().collect(),
        # r3: fuzzy decontamination of the corpus against a 4% bench
        # split — signature MIN agg is the only corpus shuffle
        "fuzzy_decon": _fuzzy_probe,
    }
    for op_name, fn in ops.items():
        if only and op_name not in only:
            continue
        for scale in (1, 4, 16):
            df, n_docs = scaled_docs(spark, sf_dir, scale)
            df = df.persist()
            df.count()  # materialize input outside the timing
            t0 = time.time()
            fn(df)
            dt = time.time() - t0
            df.unpersist()
            # the dedup operators persist their signature tables (the
            # at-scale contract is "write to storage"); between probe
            # points we drop everything so runs don't compound
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {
                        "op": op_name,
                        "scale": scale,
                        "docs": n_docs,
                        "sec": round(dt, 2),
                        "docs_per_sec": int(n_docs / dt),
                    }
                )
            )

    # ------------------------------------------------------------------
    # round-3 additions: retrieval, graph census, record linkage, PCA,
    # corpus overlap, robust stats — same 1x/4x/16x protocol
    # ------------------------------------------------------------------
    def _bm25_probe(spark_, d):
        from lwetl_spark.operators.retrieval import bm25_topk

        q = spark_.createDataFrame(
            [(1, "scan"), (1, "table"), (2, "merge"), (2, "sort"),
             (2, "window"), (3, "hash"), (3, "part")],
            "query_id int, term string",
        )
        return bm25_topk(d, q, k=10).count()

    def _overlap_probe(spark_, d):
        from lwetl_spark.operators.decontaminate import corpus_overlap_matrix

        return corpus_overlap_matrix(d, group_col="source", gram_n=5).count()

    doc_ops_r3 = {"bm25_topk": _bm25_probe, "source_overlap": _overlap_probe}
    for op_name, fn in doc_ops_r3.items():
        if only and op_name not in only:
            continue
        for scale in (1, 4, 16):
            df, n_docs = scaled_docs_src(spark, sf_dir, scale)
            df = df.persist()
            df.count()
            t0 = time.time()
            fn(spark, df)
            dt = time.time() - t0
            df.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {"op": op_name, "scale": scale, "docs": n_docs,
                     "sec": round(dt, 2), "docs_per_sec": int(n_docs / dt)}
                ),
                flush=True,
            )

    # persisted text index: build once, probe many (bm25 analog of the
    # ivf_index probe) — probe cost must stay near-flat as the corpus
    # grows because postings prune to the query terms' hash buckets
    if not only or "text_index" in only:
        import shutil
        import tempfile

        from lwetl_spark.operators.retrieval import (
            build_text_index,
            query_text_index,
        )

        for scale in (1, 4, 16):
            df, n_docs = scaled_docs_src(spark, sf_dir, scale)
            df = df.persist()
            df.count()
            path = tempfile.mkdtemp(prefix="textidx_probe_") + "/index"
            qset = spark.createDataFrame(
                [(1, "scan"), (1, "table"), (2, "merge"), (2, "sort"),
                 (2, "window"), (3, "hash"), (3, "part")],
                "query_id int, term string",
            )
            t0 = time.time()
            build_text_index(df, path)
            t_build = time.time() - t0
            t0 = time.time()
            query_text_index(spark, path, qset, k=10).count()
            t_probe = time.time() - t0
            df.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {"op": "text_index", "scale": scale, "docs": n_docs,
                     "build_sec": round(t_build, 2),
                     "probe_sec": round(t_probe, 2)}
                ),
                flush=True,
            )
            shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)

    # graph census over scaled co-purchase edges: copies shift BOTH key
    # spaces, so components stay disconnected and edges grow linearly —
    # the probe isolates the engine's joins from workload blow-up
    if not only or "triangle_count" in only:
        from lwetl_spark.catalog import load_table
        from lwetl_spark.operators.graph import triangle_stats

        li = load_table(spark, sf_dir, "lineitem")
        pp0 = li.select("l_orderkey", "l_partkey").distinct()
        for scale in (1, 4, 16):
            parts = [
                pp0.select(
                    (F.col("l_orderkey") + i * 100_000_000).alias("l_orderkey"),
                    (F.col("l_partkey") + i * 100_000_000).alias("l_partkey"),
                )
                for i in range(scale)
            ]
            pp = parts[0]
            for prt in parts[1:]:
                pp = pp.unionByName(prt)
            x, y = pp.alias("x"), pp.alias("y")
            edges = (
                x.join(
                    y,
                    (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
                    & (F.col("x.l_partkey") < F.col("y.l_partkey")),
                )
                .groupBy(
                    F.col("x.l_partkey").alias("a"),
                    F.col("y.l_partkey").alias("b"),
                )
                .agg(F.count("*").alias("w"))
                .filter(F.col("w") >= 2)
                .select("a", "b")
                .persist()
            )
            n_edges = edges.count()
            t0 = time.time()
            triangle_stats(edges).collect()
            dt = time.time() - t0
            edges.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {"op": "triangle_count", "scale": scale, "edges": n_edges,
                     "sec": round(dt, 2)}
                ),
                flush=True,
            )

    # record linkage: block COUNT scales (brand x copy), block SIZE
    # constant — the honest blocked-join scaling design (growing the
    # blocks instead would be quadratic per block, the documented skew
    # caveat in fuzzy_join_blocked)
    if not only or "fuzzy_join" in only:
        from lwetl_spark.catalog import load_table
        from lwetl_spark.operators.joins import fuzzy_join_blocked

        part0 = load_table(spark, sf_dir, "part")
        for scale in (1, 4, 16):
            parts = [
                part0.select(
                    (F.col("p_partkey") + i * 100_000_000).alias("p_partkey"),
                    "p_name",
                    F.concat(F.col("p_brand"), F.lit(f"#c{i}")).alias("p_brand"),
                )
                for i in range(scale)
            ]
            pt = parts[0]
            for prt in parts[1:]:
                pt = pt.unionByName(prt)
            pt = pt.persist()
            n_parts = pt.count()
            dirty = pt.select(
                F.col("p_partkey").alias("d_id"),
                F.when(
                    F.col("p_partkey") % 3 == 0,
                    F.expr("substring(p_name, 1, length(p_name) - 1)"),
                ).otherwise(F.col("p_name")).alias("d_name"),
                "p_brand",
            )
            t0 = time.time()
            fuzzy_join_blocked(
                dirty, pt.select("p_brand", "p_partkey", "p_name"),
                block_cols=["p_brand"], left_col="d_name", right_col="p_name",
                max_dist=2, left_id="d_id", right_order="p_partkey",
            ).count()
            dt = time.time() - t0
            pt.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {"op": "fuzzy_join", "scale": scale, "parts": n_parts,
                     "sec": round(dt, 2), "parts_per_sec": int(n_parts / dt)}
                ),
                flush=True,
            )

    # PCA: two map-only corpus passes around a d^2 combine — expect
    # near-linear wall in the corpus with flat shuffle volume
    if not only or "pca_project" in only:
        from lwetl_spark.operators.projection import pca_project

        for scale in (1, 4, 16):
            df, n_vecs = scaled_embeddings(scale)
            df = df.persist()
            df.count()
            t0 = time.time()
            pca_project(df, k=8).select(F.sum(F.element_at("proj", 1))).collect()
            dt = time.time() - t0
            df.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {"op": "pca_project", "scale": scale, "vecs": n_vecs,
                     "sec": round(dt, 2), "vecs_per_sec": int(n_vecs / dt)}
                ),
                flush=True,
            )

    # point-in-time join: the DIMENSION grows with users (scd2 regime
    # history), so the join must stay a keyed hash/sort join — this
    # probe would blow up if anything tried to broadcast the dim
    if not only or "pit_join" in only:
        from lwetl_spark.operators.windows import scd2_from_events

        for scale in (1, 4, 16):
            ev, n_rows = scaled_events(spark, sf_dir, scale)
            ev = ev.persist()
            ev.count()
            dim = scd2_from_events(ev).select(
                "user_id",
                F.col("event_type").alias("regime"),
                "valid_from",
                F.coalesce(
                    "valid_to", F.lit("2262-01-01 00:00:00").cast("timestamp")
                ).alias("valid_to"),
            )
            e, d = ev.alias("e"), dim.alias("d")
            t0 = time.time()
            (
                e.join(
                    d,
                    (F.col("e.user_id") == F.col("d.user_id"))
                    & (F.col("e.ts") >= F.col("d.valid_from"))
                    & (F.col("e.ts") < F.col("d.valid_to")),
                )
                .groupBy(F.col("d.regime"), F.col("e.event_type"))
                .agg(F.count("*"), F.sum("e.value"))
                .collect()
            )
            dt = time.time() - t0
            ev.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {"op": "pit_join", "scale": scale, "rows": n_rows,
                     "sec": round(dt, 2), "rows_per_sec": int(n_rows / dt)}
                ),
                flush=True,
            )

    # k-means corpus segmentation: bounded driver train + one Arrow
    # assignment pass — expect near-linear wall; centroids grow with the
    # corpus (16·s) like the IVF sizing rule
    if not only or "kmeans" in only:
        from lwetl_spark.operators.similarity import kmeans_cluster

        for scale in (1, 4, 16):
            df, n_vecs = scaled_embeddings(scale)
            df = df.persist()
            df.count()
            t0 = time.time()
            kmeans_cluster(df, k=16 * scale).groupBy("cluster_id").count().collect()
            dt = time.time() - t0
            df.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {"op": "kmeans", "scale": scale, "vecs": n_vecs,
                     "sec": round(dt, 2), "vecs_per_sec": int(n_vecs / dt)}
                ),
                flush=True,
            )

    # ------------------------------------------------------------------
    # round-4 additions: winnowing (window-min selection), PMI
    # (common-vocab pair fan-out — THE blow-up surface to watch),
    # IRLS logreg (8 passes over a cached feature frame), Markov
    # transitions + survival table (event-keyed windows/aggs)
    # ------------------------------------------------------------------
    def _winnow_probe(d):
        from lwetl_spark.operators.dedup import winnow_fingerprints

        return winnow_fingerprints(d).groupBy("doc_id").count().count()

    def _pmi_probe(d):
        # mirror of x_pmi without the top-30 cut: measures the full
        # common-vocab pair aggregation.  min_df is RELATIVE (1% of
        # docs) — the production scale rule: an absolute threshold
        # loosens 16x at 16x corpus, letting the common vocabulary (and
        # thus per-doc pair fan-out) grow with scale (first probe run
        # measured 2.6->16.0s at fixed df>=50; relative is near-flat)
        n_docs_in = d.count()
        td = d.select(
            "doc_id",
            F.explode(
                F.expr(r"filter(split(lower(trim(text)), '\\s+'), x -> x <> '')")
            ).alias("tok"),
        ).distinct()
        common = td.groupBy("tok").agg(F.count("*").alias("df")).filter(
            F.col("df") >= max(50, n_docs_in // 100)
        )
        tc = td.join(common, "tok").select("doc_id", "tok")
        a = tc.select("doc_id", F.col("tok").alias("ta"))
        b = tc.select("doc_id", F.col("tok").alias("tb"))
        return (
            a.join(b, "doc_id")
            .filter(F.col("ta") < F.col("tb"))
            .groupBy("ta", "tb")
            .count()
            .count()
        )

    def _logreg_probe(d):
        from lwetl_spark.functions.text import quality_features
        from lwetl_spark.operators.classifier import logreg_train

        q = quality_features("text")
        feats = d.select(
            q["n_tokens"].cast("double").alias("f1"),
            q["mean_token_len"].cast("double").alias("f2"),
            (F.length("text") >= 300).cast("long").alias("label"),
        ).localCheckpoint(eager=True)
        return logreg_train(feats, ["f1", "f2"], "label", iterations=8)

    def _cdc_probe(d):
        from lwetl_spark.operators.dedup import cdc_chunks

        return cdc_chunks(d).groupBy("doc_id").count().count()

    def _pretok_probe(d):
        pat = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+| +"
        return (
            d.select(F.expr(f"size(regexp_extract_all(text, {pat!r}, 0))").alias("n"))
            .agg(F.sum("n"))
            .collect()
        )

    doc_ops_r4 = {
        "winnowing": _winnow_probe,
        "pmi_pairs": _pmi_probe,
        "logreg_irls8": _logreg_probe,
        "cdc_chunking": _cdc_probe,
        "pretokenize": _pretok_probe,
    }
    for op_name, fn in doc_ops_r4.items():
        if only and op_name not in only:
            continue
        for scale in (1, 4, 16):
            df, n_docs = scaled_docs(spark, sf_dir, scale)
            df = df.persist()
            df.count()
            t0 = time.time()
            fn(df)
            dt = time.time() - t0
            df.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {"op": op_name, "scale": scale, "docs": n_docs,
                     "sec": round(dt, 2), "docs_per_sec": int(n_docs / dt)}
                ),
                flush=True,
            )

    def _markov_probe(ev):
        from pyspark.sql.window import Window as W

        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            ev.withColumn("prev", F.lag("event_type").over(w))
            .filter(F.col("prev").isNotNull())
            .groupBy("prev", "event_type")
            .count()
            .collect()
        )

    def _survival_probe(ev):
        u = ev.groupBy("user_id").agg(
            F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
        )
        return u.select(
            F.datediff("last_ts", "first_ts").alias("dur")
        ).groupBy("dur").count().collect()

    if not only or "ingest_increment" in only:
        campaign_probe(spark, sf_dir, scales=cli_scales or (1, 4, 16))

    if not only or "campaign_vectors" in only:
        campaign_vectors_probe(spark, sf_dir, scales=cli_scales or (1, 4, 16))

    if not only or "ann_maintenance" in only:
        ann_maintenance_probe(spark, sf_dir, scales=cli_scales or (1, 4, 16))

    # hierarchy flattening: pointer doubling must scale ~linearly in
    # NODES while rounds grow only with log(depth).  Synthetic forest:
    # parent = id div 8 (depth grows log8(n) with scale, so a flat
    # per-node cost here demonstrates both claims at once).
    if not only or "transitive_root" in only:
        from lwetl_spark.operators.graph import transitive_root

        for scale in (1, 4, 16):
            n = 200_000 * scale
            edges = (
                spark.range(8, n)
                .select(
                    F.col("id").alias("child"),
                    F.expr("id div 8").alias("parent"),
                )
                .persist()
            )
            edges.count()
            t0 = time.time()
            n_out = transitive_root(edges, max_iters=10).count()
            dt = time.time() - t0
            edges.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {"op": "transitive_root", "scale": scale, "nodes": n,
                     "resolved": n_out, "sec": round(dt, 2),
                     "nodes_per_sec": int(n / dt)}
                ),
                flush=True,
            )

    # VERDICT r4 #2: bpe_train carries incremental segmented state and
    # applies only the newest merge per iteration, so per-merge cost must
    # be near-CONSTANT in n_merges (the old form re-applied all i-1
    # merges per iteration: O(n_merges^2) per word).  Probe: train 50 vs
    # 200 merges on the 16x corpus vocabulary — linear per-iteration
    # cost means sec(200)/sec(50) ~ 4, quadratic would show ~16.
    if not only or "bpe_train" in only:
        from lwetl_spark.operators.bpe import bpe_train, word_vocab

        df16, n_docs = scaled_docs(spark, sf_dir, 16)
        vocab = word_vocab(df16).persist()
        n_words = vocab.count()
        for n_merges in (50, 200):
            t0 = time.time()
            merges = bpe_train(vocab, n_merges=n_merges, min_freq=2)
            dt = time.time() - t0
            print(
                json.dumps(
                    {"op": "bpe_train", "scale": 16, "docs": n_docs,
                     "vocab_words": n_words, "merges": len(merges),
                     "sec": round(dt, 2),
                     "sec_per_merge": round(dt / max(len(merges), 1), 3)}
                ),
                flush=True,
            )
        vocab.unpersist()
        spark.catalog.clearCache()

    event_ops_r4 = {"markov_chain": _markov_probe, "survival_agg": _survival_probe}
    for op_name, fn in event_ops_r4.items():
        if only and op_name not in only:
            continue
        for scale in (1, 4, 16):
            df, n_rows = scaled_events(spark, sf_dir, scale)
            df = df.persist()
            df.count()
            t0 = time.time()
            fn(df)
            dt = time.time() - t0
            df.unpersist()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {"op": op_name, "scale": scale, "rows": n_rows,
                     "sec": round(dt, 2), "rows_per_sec": int(n_rows / dt)}
                ),
                flush=True,
            )


def campaign_probe(spark, sf_dir: str, scales=(1, 4, 16)) -> None:
    """VERDICT r4 #8 follow-through: the daily-crawl increment's cost
    must be O(delta), not O(corpus).  Protocol: bootstrap the campaign
    state on a 1x/4x/16x corpus, then ingest the SAME fixed ~2k-doc
    delta into each — increment wall time should stay near-flat as the
    pre-existing corpus grows 16x (the whole point of incremental
    maintenance; a rebuild-shaped implementation would scale with the
    corpus instead)."""
    import shutil
    import tempfile

    from lwetl_spark.operators.incremental import ingest_increment

    for scale in scales:
        base, n_docs = scaled_docs(spark, sf_dir, scale)
        base = base.select("doc_id", "text")
        # fixed-size delta: 2k new docs de-correlated from every corpus
        # copy (rotation combos past the ≤64× corpus range; the id
        # offset must clear i·10M for any probed scale — +90e9 does,
        # +900M collided with copy 90 at 256× in the dual probe)
        delta_src, _ = scaled_docs(spark, sf_dir, 1)
        delta = (
            delta_src.select(
                (F.col("doc_id") + 90_000_000_000).alias("doc_id"),
                F.translate(
                    F.translate("text", "aeiou", ROTS[23]), "bcdfg", CROTS[119]
                ).alias("text"),
            )
            .orderBy("doc_id")
            .limit(2000)
        )
        work = tempfile.mkdtemp(prefix="campaign_probe_")
        man, st, idx = f"{work}/manifest", f"{work}/state", f"{work}/index"
        t0 = time.time()
        ingest_increment(spark, base, man, st, idx)
        t_boot = time.time() - t0
        # full-snapshot mode: the crawl re-delivers everything — the
        # increment must fingerprint the whole snapshot just to diff it
        snapshot2 = base.unionByName(delta)
        t0 = time.time()
        stats = ingest_increment(spark, snapshot2, man, st, idx)
        t_full = time.time() - t0
        shutil.rmtree(work, ignore_errors=True)
        # delta-only mode: the crawl ships just the day's files — the
        # whole increment is O(delta) and must stay flat across scales
        work = tempfile.mkdtemp(prefix="campaign_probe_")
        man, st, idx = f"{work}/manifest", f"{work}/state", f"{work}/index"
        ingest_increment(spark, base, man, st, idx)
        t0 = time.time()
        stats_d = ingest_increment(
            spark, delta, man, st, idx, snapshot_is_delta=True
        )
        t_delta = time.time() - t0
        shutil.rmtree(work, ignore_errors=True)
        # maintenance pass: compact a FIXED 500-doc changed set — cost is
        # the one postings read (grows with the index) + bounded bucket
        # rewrites; this is the documented trade vs the flat delta path
        from lwetl_spark.operators.retrieval import compact_text_index

        work = tempfile.mkdtemp(prefix="campaign_probe_")
        man, st, idx = f"{work}/manifest", f"{work}/state", f"{work}/index"
        ingest_increment(spark, base, man, st, idx)
        changed = (
            base.orderBy("doc_id")
            .limit(500)
            .select("doc_id", F.concat(F.lit("rev2 "), F.col("text")).alias("text"))
        )
        t0 = time.time()
        compact_text_index(spark, idx, changed)
        t_compact = time.time() - t0
        shutil.rmtree(work, ignore_errors=True)
        spark.catalog.clearCache()
        print(
            json.dumps(
                {"op": "ingest_increment", "scale": scale, "corpus_docs": n_docs,
                 "delta_docs": 2000, "bootstrap_sec": round(t_boot, 2),
                 "full_snapshot_sec": round(t_full, 2),
                 "delta_only_sec": round(t_delta, 2),
                 "compact_500_sec": round(t_compact, 2),
                 "n_admitted": stats["n_admitted"],
                 "n_admitted_delta": stats_d["n_admitted"]}
            ),
            flush=True,
        )


def _hash_embeddings(docs, dims: int = 16):
    """Deterministic JVM-side synthetic embeddings keyed by doc_id —
    the probe only needs the vector LEG's cost shape (assign + append /
    remove), not semantic vectors, and a hash expression keeps the
    probe corpus generator shuffle- and Python-free."""
    cols = [
        (
            F.pmod(F.xxhash64(F.col("doc_id") * F.lit(i + 1)), F.lit(1000))
            / 1000.0
            + 0.001
        )
        for i in range(dims)
    ]
    return docs.select("doc_id", F.array(*cols).alias("embedding"))


def campaign_vectors_probe(spark, sf_dir: str, scales=(1, 4, 16)) -> None:
    """Dual-index campaign cost shape (VERDICT r5 #2 follow-through):
    with the IVF vector leg attached, the delta-mode increment must
    STAY O(delta) — the leg adds one bounded centroid read, one
    delta-sized Arrow assign, and cell-partition appends; none of that
    may scale with the pre-existing corpus.  Protocol mirrors
    campaign_probe: bootstrap dual-index state on a 1x/4x/16x corpus,
    ingest the SAME fixed ~2k-doc delta (docs + embeddings), then
    retire a fixed 500-id set (bounded locates + affected-partition
    rewrites on BOTH indexes)."""
    import shutil
    import tempfile

    from lwetl_spark.operators.incremental import ingest_increment

    for scale in scales:
        base, n_docs = scaled_docs(spark, sf_dir, scale)
        base = base.select("doc_id", "text")
        delta_src, _ = scaled_docs(spark, sf_dir, 1)
        # delta must be novel vs EVERY corpus copy at ANY scale, in BOTH
        # id and content: copies shift ids by i·10M (i < scale), so the
        # +900M offset COLLIDED with copy 90's id range at 256× (the
        # diff called the delta 'changed' and deferred it — the probe
        # silently measured the wrong path); +90e9 clears any scale,
        # and the per-doc unique suffix replaces the rotation-combo
        # trick whose combo space 256 copies exhausted
        delta = (
            delta_src.select(
                (F.col("doc_id") + 90_000_000_000).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" uq"), F.col("doc_id").cast("string")
                ).alias("text"),
            )
            .orderBy("doc_id")
            .limit(2000)
        )
        base_emb = _hash_embeddings(base)
        delta_emb = _hash_embeddings(delta)

        work = tempfile.mkdtemp(prefix="campaignv_probe_")
        man, st, idx, vidx = (
            f"{work}/manifest", f"{work}/state", f"{work}/index",
            f"{work}/vindex",
        )
        t0 = time.time()
        ingest_increment(
            spark, base, man, st, idx,
            embeddings=base_emb, vector_index_path=vidx,
        )
        t_boot = time.time() - t0
        t0 = time.time()
        stats_d = ingest_increment(
            spark, delta, man, st, idx,
            embeddings=delta_emb, vector_index_path=vidx,
            snapshot_is_delta=True,
        )
        t_delta = time.time() - t0
        # weekly full snapshot retiring a fixed 500-id set from BOTH
        # indexes (bounded locate collects + affected-partition rewrites)
        retired_ids = base.select("doc_id").orderBy("doc_id").limit(500)
        retire_snapshot = base.unionByName(delta).join(
            retired_ids, "doc_id", "left_anti"
        )
        t0 = time.time()
        stats_r = ingest_increment(
            spark, retire_snapshot, man, st, idx,
            embeddings=_hash_embeddings(retire_snapshot),
            vector_index_path=vidx, retire_removed=True,
        )
        t_retire = time.time() - t0
        shutil.rmtree(work, ignore_errors=True)
        spark.catalog.clearCache()
        print(
            json.dumps(
                {"op": "campaign_vectors", "scale": scale,
                 "corpus_docs": n_docs, "delta_docs": 2000,
                 "bootstrap_sec": round(t_boot, 2),
                 "delta_only_sec": round(t_delta, 2),
                 "retire_500_sec": round(t_retire, 2),
                 "n_admitted_delta": stats_d["n_admitted"],
                 "n_vec_delta": stats_d["n_vec_indexed"],
                 "n_retired": stats_r["n_retired"]}
            ),
            flush=True,
        )


def ann_maintenance_probe(spark, sf_dir: str, scales=(1, 4, 16)) -> None:
    """Maintenance cost shape of the three persisted ANN indexes: a
    FIXED 500-vector update and a FIXED 500-id removal against a
    1x/4x/16x index.  The update must be flat (delta-sized assign/
    encode/bucketize + appends); the removal locates via bounded
    collects and rewrites only affected partitions — with hash-bucketed
    layouts a random 500-id set touches most partitions, so removal is
    bounded by the AFFECTED-PARTITION volume (≈ the table at these toy
    sizes, a vanishing fraction at 100 TB with num_centroids/buckets
    sized to the corpus); the probe's job is catching super-linear
    regressions, not proving O(delta) removal."""
    import shutil
    import tempfile

    from lwetl_spark.operators.similarity import (
        build_ivf_index,
        build_lsh_index,
        build_pq_index,
        remove_from_ivf_index,
        remove_from_lsh_index,
        remove_from_pq_index,
        update_ivf_index,
        update_lsh_index,
        update_pq_index,
    )

    from lwetl_spark.catalog import load_table

    def scaled_emb(scale: int):
        base = load_table(spark, sf_dir, "embeddings")
        n = base.count()
        parts = []
        for i in range(scale):
            rot = (i * 7) % 64
            parts.append(
                base.select(
                    (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                    F.expr(
                        f"concat(slice(embedding, {rot + 1}, {64 - rot}),"
                        f" slice(embedding, 1, {rot}))"
                    ).alias("embedding"),
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df, n * scale

    builders = {
        "ivf": (build_ivf_index, update_ivf_index, remove_from_ivf_index),
        "pq": (build_pq_index, update_pq_index, remove_from_pq_index),
        "lsh": (build_lsh_index, update_lsh_index, remove_from_lsh_index),
    }
    for scale in scales:
        emb, n = scaled_emb(scale)
        emb = emb.localCheckpoint(eager=True)
        delta = emb.orderBy("vec_id").limit(500).select(
            (F.col("vec_id") + 800_000_000).alias("vec_id"), "embedding"
        )
        removed = emb.orderBy("vec_id").limit(500).select("vec_id")
        row = {"op": "ann_maintenance", "scale": scale, "vectors": n}
        for name, (build, update, remove) in builders.items():
            work = tempfile.mkdtemp(prefix=f"annmaint_{name}_")
            path = f"{work}/idx"
            t0 = time.time()
            build(emb, path)
            row[f"{name}_build_sec"] = round(time.time() - t0, 2)
            t0 = time.time()
            update(spark, path, delta)
            row[f"{name}_update_500_sec"] = round(time.time() - t0, 2)
            t0 = time.time()
            remove(spark, path, removed)
            row[f"{name}_remove_500_sec"] = round(time.time() - t0, 2)
            shutil.rmtree(work, ignore_errors=True)
        spark.catalog.clearCache()
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
