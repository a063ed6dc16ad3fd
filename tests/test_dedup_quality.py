"""Semantic quality checks for the rows-only dedup operators: the driver
only row-counts these, so pytest pins what the rows MEAN — planted
near-duplicates must be found, unrelated docs must not pair, and reported
similarities must match Python-computed ground truth."""

from __future__ import annotations

import pytest


def _mk_docs(spark):
    """20 clearly-distinct base docs + 3 planted near-dup mutations."""
    base = [
        " ".join(f"w{i}_{j} tok{(i * 31 + j) % 97}" for j in range(40)) for i in range(20)
    ]
    docs = [(i, t) for i, t in enumerate(base)]
    # near-dups: copy doc 0/1/2 and mutate one token near the end
    for off, src in enumerate((0, 1, 2)):
        words = base[src].split()
        words[-3] = "MUTATED"
        docs.append((100 + off, " ".join(words)))
    return spark.createDataFrame(docs, "doc_id long, text string")


def _true_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_minhash_finds_planted_near_dups(spark):
    from lwetl_spark.operators.dedup import minhash_lsh_pairs

    df = _mk_docs(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(df, threshold=0.5).collect()
    }
    assert (0, 100) in pairs and (1, 101) in pairs and (2, 102) in pairs
    # no cross-pairs between distinct base docs
    assert all(b - a >= 100 for a, b in pairs)
    # reported jaccard equals true shingle-set jaccard (hashed sets are
    # collision-free at this size)
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    for (a, b), j in pairs.items():
        assert j == pytest.approx(_true_jaccard(texts[a], texts[b]), abs=1e-6)


def test_ngram_jaccard_exact_values(spark):
    from lwetl_spark.operators.dedup import ngram_jaccard_pairs

    df = _mk_docs(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, shingle_n=3, threshold=0.5).collect()
    }
    assert set(pairs) == {(0, 100), (1, 101), (2, 102)}
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    for (a, b), j in pairs.items():
        assert j == pytest.approx(_true_jaccard(texts[a], texts[b]), abs=1e-6)


def test_simhash_buckets_near_dups_collide(spark):
    from lwetl_spark.operators.dedup import simhash_buckets

    df = _mk_docs(spark)
    buckets = simhash_buckets(df).collect()
    together = set()
    for r in buckets:
        ids = r["ids"]
        for a in ids:
            for b in ids:
                if a < b:
                    together.add((a, b))
    # one-token mutations are Hamming-close → must share ≥1 band bucket
    assert {(0, 100), (1, 101), (2, 102)} <= together


def test_embedding_near_dups_threshold(spark):
    import math

    from lwetl_spark.operators.dedup import embedding_near_dups

    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (4, [0.0, 0.999, 0.01, 0.0]),  # near-dup of 3
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dups(df, threshold=0.95).collect()
    }
    assert set(pairs) == {(1, 2), (3, 4)}
    expected = (0.999) / math.sqrt(0.999**2 + 0.01**2)
    assert pairs[(1, 2)] == pytest.approx(expected, abs=1e-6)


def test_connected_components_chain_and_clusters(spark):
    """Min-label propagation must cross a 5-node chain (multi-round) and
    keep disjoint components separate."""
    from lwetl_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_two_phase_cc_matches_label_propagation(spark):
    """large-star/small-star must agree with min-label propagation on
    seeded random graphs."""
    import random

    from lwetl_spark.operators.dedup import (
        connected_components,
        connected_components_two_phase,
    )

    for seed in (3, 17, 42):
        rng = random.Random(seed)
        edges = [
            (rng.randint(0, 60), rng.randint(0, 60)) for _ in range(50)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        lp = {(r["node"], r["cluster_id"]) for r in connected_components(df).collect()}
        tp = {
            (r["node"], r["cluster_id"])
            for r in connected_components_two_phase(df).collect()
        }
        assert lp == tp, seed


def test_two_phase_cc_long_chain(spark):
    """A 300-node chain (diameter 299) finishes in O(log n) rounds —
    the shape min-label propagation cannot afford."""
    from lwetl_spark.operators.dedup import connected_components_two_phase

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "id_a long, id_b long"
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components_two_phase(chain).collect()}
    assert len(got) == 300 and set(got.values()) == {0}


def test_dedup_lines_drops_cross_doc_boilerplate(spark):
    from lwetl_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "keep one\nCOPYRIGHT FOOTER\nkeep two"),
            (2, "COPYRIGHT FOOTER\nunique line"),
            (3, "COPYRIGHT FOOTER"),  # all-boilerplate -> empty, not dropped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.text, r.n_lines_kept) for r in dedup_lines(df).collect()}
    assert out == {
        1: ("keep one\nkeep two", 2),
        2: ("unique line", 1),
        3: ("", 0),
    }


def test_dedup_lines_max_doc_freq_threshold(spark):
    from lwetl_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc"), (3, "a\nb")],
        "doc_id long, text string",
    )
    # 'a' in 3 docs, 'b' in 2: with max_doc_freq=2 only 'a' is dropped
    out = {r.doc_id: r.text for r in dedup_lines(df, max_doc_freq=2).collect()}
    assert out == {1: "b", 2: "c", 3: "b"}


def test_bloom_dedup_no_false_negatives(spark):
    from lwetl_spark.operators.dedup import bloom_filter_dedup

    corpus = spark.createDataFrame(
        [(i, f"fp{i % 40}") for i in range(0, 200, 2)], ["doc_id", "fp"]
    )
    # batch: half share corpus fingerprints, half are new
    batch = spark.createDataFrame(
        [(i, f"fp{(i - 1) % 40}" if i % 4 == 1 else f"new{i}") for i in range(1, 200, 2)],
        ["doc_id", "fp"],
    )
    out = bloom_filter_dedup(corpus, batch, fp_col="fp", id_col="doc_id").collect()
    assert len(out) == batch.count()
    dups = [r for r in out if r.is_dup]
    assert dups, "planted duplicates must be detected"
    # Bloom invariant: every true duplicate is flagged
    assert all(r.might_contain for r in dups)


def test_bloom_dedup_deterministic_flags(spark):
    from lwetl_spark.operators.dedup import bloom_filter_dedup

    corpus = spark.createDataFrame(
        [(i, f"c{i}") for i in range(0, 100, 2)], ["doc_id", "fp"]
    )
    batch = spark.createDataFrame(
        [(i, f"b{i}") for i in range(1, 100, 2)], ["doc_id", "fp"]
    )
    a = {r.doc_id: r.might_contain
         for r in bloom_filter_dedup(corpus, batch).collect()}
    b = {r.doc_id: r.might_contain
         for r in bloom_filter_dedup(corpus, batch).collect()}
    assert a == b  # md5 positions: same filter, same flags, every run


def test_bloom_pruned_join_equals_plain_join(spark):
    import pytest
    from pyspark.sql import functions as F

    from lwetl_spark.operators.dedup import bloom_pruned_join

    big = spark.range(0, 2000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("payload")
    )
    small = spark.range(0, 50).select(
        (F.col("id") * 7).alias("k"), (F.col("id") + 1000).alias("dim")
    )
    got = sorted(tuple(r) for r in bloom_pruned_join(big, small, "k").collect())
    exp = sorted(tuple(r) for r in big.join(small, "k").collect())
    assert got == exp and len(exp) > 0
    semi = sorted(
        tuple(r) for r in bloom_pruned_join(big, small, "k", how="left_semi").collect()
    )
    exp_semi = sorted(tuple(r) for r in big.join(small, "k", "left_semi").collect())
    assert semi == exp_semi
    with pytest.raises(ValueError):
        bloom_pruned_join(big, small, "k", how="left")


def test_bloom_pruned_join_prefilter_is_broadcast_only(spark):
    """The pre-filter stage must contain only broadcast joins — no
    exchange of the big side before the final join."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.dedup import bloom_pruned_join

    big = spark.range(0, 1000).select((F.col("id") % 100).alias("k"), "id")
    small = spark.range(0, 10).select((F.col("id") * 3).alias("k"))
    plan = (
        bloom_pruned_join(big, small, "k", how="left_semi")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all semi probes are BroadcastHashJoin; the big side never shuffles
    assert plan.count("BroadcastHashJoin") >= 4  # 3 bloom probes + final semi
    assert "ShuffledHashJoin" not in plan and "SortMergeJoin" not in plan


def test_sorted_neighborhood_finds_near_identical_docs(spark):
    from lwetl_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumps!"),  # same block, len diff 1
        (3, "zz completely different subject matter here"),
        (4, "the quick brown fox jumps over everything else entirely " + "x" * 100),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    pairs = {(r.id_a, r.id_b) for r in sorted_neighborhood_pairs(df, window=4).collect()}
    assert (1, 2) in pairs          # neighbours in the same block
    assert all(a < 0 or True for a, _ in pairs)
    # doc 4 is in a different length bucket -> never paired with 1/2
    assert not any(4 in p for p in pairs)


def test_priority_sample_deterministic_and_sized(spark):
    from lwetl_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(
        [(i, 1 + (i % 10)) for i in range(500)], "k LONG, w LONG"
    )
    a = priority_sample(df, "k", "w", k=50).collect()
    b = priority_sample(df.repartition(13), "k", "w", k=50).collect()
    assert len(a) == 50
    assert {r.k for r in a} == {r.k for r in b}  # partitioning-invariant
    # weighted: the sampled mean weight must exceed the population mean
    pop_mean = 5.5
    assert sum(r.w for r in a) / 50 > pop_mean


def test_ppjoin_equals_naive_jaccard(spark):
    """PPJoin prefix filtering is LOSSLESS: output equals the naive
    all-pairs token-set Jaccard join at the same threshold."""
    from lwetl_spark.operators.dedup import ngram_jaccard_pairs, ppjoin_pairs

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "a completely different sentence entirely here now"),
            (4, "the quick brown fox leaps over a lazy dog"),
            (5, "quick brown dog"),
        ],
        "doc_id long, text string",
    )
    for t in (0.5, 0.7, 0.9):
        pp = sorted(map(tuple, ppjoin_pairs(df, threshold=t).collect()))
        naive = sorted(
            map(tuple, ngram_jaccard_pairs(df, shingle_n=1, threshold=t).collect())
        )
        assert pp == naive, t


def test_countmin_overestimates_and_exact_on_sparse(spark):
    """CMS invariants: estimate >= true count always; with far fewer
    distinct tokens than counters the estimate is exact."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.sketch import cms_build, cms_estimate

    rows = [(f"tok{i % 13}",) for i in range(500)]
    tok = spark.createDataFrame(rows, "token string")
    sketch = cms_build(tok, depth=4, width=256)
    probes = tok.distinct()
    est = {r["token"]: r["cms_est"] for r in cms_estimate(sketch, probes).collect()}
    true = {
        r["token"]: r["n"]
        for r in tok.groupBy("token").agg(F.count("*").alias("n")).collect()
    }
    assert all(est[t] >= n for t, n in true.items())
    # 13 distinct tokens in 256*4 counters: collisions virtually absent
    assert est == true
    # unseen token estimates 0 (or a collision's count, never negative)
    miss = cms_estimate(
        sketch, spark.createDataFrame([("neverseen",)], "token string")
    ).first()["cms_est"]
    assert miss >= 0


def test_duplicate_spans_exact_windows(spark):
    """Span-dedup stats on hand-built docs: shared 3-token windows count,
    short docs are excluded, fractions are exact."""
    from lwetl_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),     # windows: abc bcd cde
            (2, "x a b c d y"),   # windows: xab abc bcd cdy
            (3, "p q r"),         # windows: pqr (unique)
            (4, "t u"),           # too short -> excluded
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(df, window=3).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_windows"], out[1]["n_dup_windows"]) == (3, 2)  # abc, bcd shared
    assert (out[2]["n_windows"], out[2]["n_dup_windows"]) == (4, 2)
    assert (out[3]["n_windows"], out[3]["n_dup_windows"]) == (1, 0)
    assert out[1]["dup_fraction"] == round(2 / 3, 6)


def test_dsir_weights_target_ranks_higher(spark):
    """DSIR importance weights: documents drawn from the target domain
    must score higher on average than off-target documents, the score is
    partitioning-invariant, and hand-computable on a toy corpus."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.sampling import dsir_weights

    # toy corpus: target docs speak 'aa bb', off-target speak 'zz yy'
    df = spark.createDataFrame(
        [
            (1, "aa bb aa", "t"),
            (2, "bb aa bb", "t"),
            (3, "zz yy zz", "o"),
            (4, "aa zz", "o"),
        ],
        "doc_id long, text string, src string",
    )
    out = {r["doc_id"]: r for r in dsir_weights(df, F.col("src") == "t").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_grams"] == 3
    # pure-target docs outweigh pure-off-target; mixed lands between
    assert out[1]["weight_ppm"] > out[4]["weight_ppm"] > out[3]["weight_ppm"]
    assert out[2]["weight_ppm"] > out[3]["weight_ppm"]

    again = {
        r["doc_id"]: r
        for r in dsir_weights(df.repartition(7), F.col("src") == "t").collect()
    }
    assert {(k, v["sum_score"]) for k, v in out.items()} == {
        (k, v["sum_score"]) for k, v in again.items()
    }

    # real corpus: en (target) mean weight above non-en mean weight
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = dsir_weights(docs, F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["t"]: r["m"]
        for r in w.groupBy((F.col("lang") == "en").alias("t"))
        .agg(F.avg("weight_ppm").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_fluency_buckets_split_and_invariance(spark):
    """CCNet-style buckets: common-word docs land in head, gibberish in
    tail; each language splits ~25/50/25; scores are partitioning-
    invariant integers."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.sampling import fluency_buckets

    rows = [(i, "the and of to the a in", "en") for i in range(8)]  # fluent
    rows += [(100 + i, f"qzx{i} wvb{i} jkl{i}", "en") for i in range(8)]  # gibberish
    rows += [(200 + i, "common words only here", "fr") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    out = {r["doc_id"]: r for r in fluency_buckets(df).collect()}
    assert len(out) == 20
    # every fluent en doc outranks every gibberish en doc
    flu = [out[i]["fluency_ppm"] for i in range(8)]
    gib = [out[100 + i]["fluency_ppm"] for i in range(8)]
    assert min(flu) > max(gib)
    # fluent docs tie at the 0.75 cut -> head; gibberish docs tie AT the
    # 0.25 cut (score == t_lo, not < t_lo) -> middle, never head
    assert all(out[i]["bucket"] == "head" for i in range(8))
    assert all(out[100 + i]["bucket"] == "middle" for i in range(8))
    # fr is bucketed within fr only: identical docs -> identical score,
    # score == threshold on both cuts -> all head
    assert {out[200 + i]["bucket"] for i in range(4)} == {"head"}

    again = {r["doc_id"]: r for r in fluency_buckets(df.repartition(11)).collect()}
    assert {(k, v["fluency_ppm"], v["bucket"]) for k, v in out.items()} == {
        (k, v["fluency_ppm"], v["bucket"]) for k, v in again.items()
    }


def test_unimax_allocation_caps_and_conserves(spark):
    """UniMax: small groups cap at max_epochs, the freed budget re-splits
    over larger groups, nothing over-allocates, and the total never
    exceeds the budget."""
    from lwetl_spark.operators.sampling import unimax_allocation

    df = spark.createDataFrame(
        [("a", 10), ("a", 10), ("b", 100), ("c", 1000)],
        "g string, w long",
    )
    out = {r["g"]: r for r in unimax_allocation(df, "g", "w", budget=900, max_epochs=3).collect()}
    # sizes: a=20, b=100, c=1000; shares: a: 900//3=300 -> capped 60;
    # b: 840//2=420 -> capped 300; c: 540//1=540 (budget-bound)
    assert (out["a"]["quota"], out["b"]["quota"], out["c"]["quota"]) == (60, 300, 540)
    assert sum(r["quota"] for r in out.values()) == 900
    assert out["a"]["epochs_ppm"] == 3_000_000
    assert out["c"]["epochs_ppm"] == 540_000
    with pytest.raises(ValueError):
        unimax_allocation(df, "g", "w", budget=0)


def test_soft_dedup_weights_cluster_sizes(spark):
    """SoftDeDup: clustered docs share weight 1e6/|cluster|; singletons
    keep full weight; every input id appears exactly once."""
    from lwetl_spark.operators.dedup import soft_dedup_weights

    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in soft_dedup_weights(ids, pairs).collect()}
    assert len(out) == 6
    assert all(out[i]["cluster_size"] == 3 and out[i]["weight_ppm"] == 333_333
               for i in (0, 1, 2))
    assert all(out[i]["cluster_size"] == 2 and out[i]["weight_ppm"] == 500_000
               for i in (3, 4))
    assert out[5]["cluster_size"] == 1 and out[5]["weight_ppm"] == 1_000_000


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing THEOREM (Schleimer et al. 2003): any shared token
    run of length >= window + gram_n - 1 between two documents must
    yield at least one shared SELECTED fingerprint.  Two docs share a
    12-token run (>= 5 + 3 - 1 = 7) embedded in different contexts."""
    from lwetl_spark.operators.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    df = spark.createDataFrame(
        [
            (1, "xx yy zz " + shared + " q r s"),
            (2, "completely different prefix words " + shared),
            (3, "no overlap here at all just some other tokens entirely"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(df, gram_n=3, window=5)
    sets = {
        r["doc_id"]: {x["fp"] for x in rows}
        for r in fp.select("doc_id").distinct().collect()
        for rows in [fp.filter(fp.doc_id == r["doc_id"]).collect()]
    }
    assert sets[1] & sets[2], "shared 12-token run must share a fingerprint"
    assert not (sets[1] & sets[3]), "unrelated doc must share nothing with doc 1"
    assert not (sets[2] & sets[3]), "unrelated doc must share nothing with doc 2"
    # density: selected positions are a strict subset of gram positions
    per = fp.groupBy("doc_id").count().collect()
    for r in per:
        n_toks = len(df.filter(df.doc_id == r["doc_id"]).collect()[0]["text"].split())
        assert r["count"] < n_toks - 2, "winnowing must select a strict subset"


def test_winnowing_deterministic_under_repartition(spark):
    from lwetl_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(i, f"tok{i} " * 3 + "common run of words here now " + f"tail{i}") for i in range(20)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, winnow_fingerprints(df).collect()))
    b = sorted(map(tuple, winnow_fingerprints(df.repartition(7)).collect()))
    assert a == b


def test_cdc_chunks_shift_invariance_and_reassembly(spark):
    """The CDC property: prepending text to a document perturbs only the
    chunks up to the first content-defined boundary after the edit —
    the tail chunks keep their digests (fixed-size blocks would lose
    every digest).  Also: chunk lengths must sum back to the doc."""
    import hashlib

    from lwetl_spark.operators.dedup import cdc_chunks

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while seventeen pelicans argue about checksum boundaries near "
        "the harbor wall during an unusually content defined afternoon "
    ) * 6
    shifted = "PREFIX INSERTED HERE " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id long, text string"
    )
    rows = cdc_chunks(df, window=8, mask=64).collect()
    by_doc = {1: [], 2: []}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc[r["doc_id"]].append((r["chunk_md5"], r["chunk_len"]))
    # reassembly: lengths sum to the normalized doc length
    assert sum(l for _, l in by_doc[1]) == len(base.lower().strip())
    assert sum(l for _, l in by_doc[2]) == len(shifted.lower().strip())
    # shift invariance: most of doc 1's chunk digests survive in doc 2
    d1 = {h for h, _ in by_doc[1]}
    d2 = {h for h, _ in by_doc[2]}
    assert len(d1) > 3, "base doc must split into several chunks"
    shared = len(d1 & d2) / len(d1)
    assert shared >= 0.5, f"only {shared:.0%} of chunks survived the shift"
    # determinism under repartition
    again = cdc_chunks(df.repartition(5), window=8, mask=64).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # single-chunk short doc
    short = spark.createDataFrame([(9, "tiny")], "doc_id long, text string")
    out = cdc_chunks(short).collect()
    assert len(out) == 1 and out[0]["chunk_len"] == 4
    assert out[0]["chunk_md5"] == hashlib.md5(b"tiny").hexdigest()


def test_paragraph_dedup_first_occurrence_and_reassembly(spark):
    """paragraph_dedup keeps each paragraph's FIRST corpus occurrence
    (min doc_id, then min position), passes whitespace-only paragraphs
    through, rewrites documents from survivors in original order, and
    empties a document whose every paragraph already appeared."""
    from lwetl_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha beta\ncommon header\ngamma"),
        (2, "common header\ndelta"),          # loses the header to doc 1
        (3, "common header"),                 # loses everything
        (4, "alpha beta\n \nepsilon"),        # blank line passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["text"] == "alpha beta\ncommon header\ngamma"
    assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 3
    assert out[2]["text"] == "delta" and out[2]["n_kept"] == 1
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0
    # doc 4: 'alpha beta' lost to doc 1; the whitespace line survives
    assert out[4]["text"] == " \nepsilon" and out[4]["n_kept"] == 2
