"""Decontamination operator semantics (word n-grams, hit counting,
anti-join removal)."""

import pytest

from lwetl_spark.operators.decontaminate import (
    contamination_hits,
    decontaminate,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_basic_and_short_docs(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d"),  # 2 trigrams
            (2, "a b"),  # shorter than n -> no rows
            (3, "  X  y   Z "),  # normalization: lower + whitespace runs
        ],
    )
    got = {(r.doc_id, r.gram) for r in word_ngrams(df, 3).collect()}
    assert got == {(1, "a b c"), (1, "b c d"), (3, "x y z")}


def test_contamination_hits_counts_distinct_shared_grams(spark):
    corpus = _docs(
        spark,
        [
            (10, "the quick brown fox jumps"),  # shares 2 trigrams w/ bench
            (11, "totally unrelated words here"),
            (12, "quick brown fox quick brown fox"),  # dup grams count once
        ],
    )
    bench = _docs(spark, [(99, "the quick brown fox sleeps")])
    hits = {r.doc_id: r.n_hits for r in contamination_hits(corpus, bench, n=3).collect()}
    assert hits == {10: 2, 12: 1}  # 10: "the quick brown","quick brown fox"; 12: distinct-once


def test_decontaminate_removes_only_flagged(spark):
    corpus = _docs(
        spark,
        [(10, "the quick brown fox jumps"), (11, "totally unrelated words here")],
    )
    bench = _docs(spark, [(99, "the quick brown fox sleeps")])
    kept = sorted(r.doc_id for r in decontaminate(corpus, bench, n=3).collect())
    assert kept == [11]
    # empty benchmark keeps everything
    empty = _docs(spark, []).limit(0)
    assert decontaminate(corpus, empty, n=3).count() == 2


def test_hash_grams_matches_string_grams(spark):
    corpus = _docs(
        spark,
        [
            (10, "the quick brown fox jumps"),
            (11, "totally unrelated words here"),
            (12, "quick brown fox quick brown fox"),
        ],
    )
    bench = _docs(spark, [(99, "the quick brown fox sleeps")])
    a = sorted(map(tuple, contamination_hits(corpus, bench, n=3).collect()))
    b = sorted(
        map(tuple, contamination_hits(corpus, bench, n=3, hash_grams=True).collect())
    )
    assert a == b


def test_blocklist_filter_domains_and_subdomains(spark):
    from lwetl_spark.operators.decontaminate import blocklist_filter

    rows = [
        (1, "https://www.good.com/a"),
        (2, "https://bad.com/x"),
        (3, "https://ads.tracker.bad.com/y"),      # subdomain of blocked domain
        (4, "https://news.site.org/z?q=1"),
        (5, "https://BAD.COM/upper"),              # case-insensitive
        (6, "https://goodbad.com/r"),              # NOT bad.com — must survive
    ]
    df = spark.createDataFrame(rows, "id LONG, url STRING")
    kept = blocklist_filter(df, "url", ["bad.com"])
    assert sorted(r.id for r in kept.collect()) == [1, 4, 6]
    # DataFrame blocklist form + audit columns
    bl = spark.createDataFrame([("site.org",)], "d STRING")
    audited = blocklist_filter(df, "url", bl, keep_audit_cols=True)
    got = {r.id: (r._host, r._domain) for r in audited.collect()}
    assert 4 not in got
    assert got[3] == ("ads.tracker.bad.com", "bad.com")


def test_blocklist_filter_plan_is_broadcast_anti(spark):
    from lwetl_spark.operators.decontaminate import blocklist_filter

    df = spark.createDataFrame([(1, "https://a.com/x")], "id LONG, url STRING")
    plan = blocklist_filter(df, "url", ["b.com"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_fuzzy_contamination_catches_paraphrase(spark):
    """A corpus doc that shares most shingles with a benchmark doc must
    band-collide; an unrelated doc must not; the anti-join removes
    exactly the flagged docs; results are partitioning-invariant."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators.decontaminate import (
        fuzzy_contamination_hits,
        fuzzy_decontaminate,
    )

    bench = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # near-copy: last word swapped -> 8 of 9 shingles shared
            # (md5 family is fixed: this pair collides in band 2, forever)
            (1, "the quick brown fox jumps over the lazy dog now"),
            # unrelated
            (2, "completely different words about spark query planning"),
            # exact copy
            (3, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["n_bench_hits"] for r in
            fuzzy_contamination_hits(corpus, bench).collect()}
    assert hits.get(3) == 1  # exact copy collides in every band
    assert 2 not in hits
    assert hits.get(1) == 1  # paraphrase shares a band

    clean = fuzzy_decontaminate(corpus, bench)
    assert {r["doc_id"] for r in clean.select("doc_id").collect()} == {2}

    again = {r["doc_id"]: r["n_bench_hits"] for r in
             fuzzy_contamination_hits(corpus.repartition(5), bench).collect()}
    assert hits == again


def test_fuzzy_contamination_rejects_bad_bands(spark):
    from lwetl_spark.operators.decontaminate import fuzzy_contamination_hits

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError):
        fuzzy_contamination_hits(df, df, n_perm=8, bands=3).collect()


def test_corpus_overlap_matrix_hand_checked(spark):
    from lwetl_spark.operators.decontaminate import corpus_overlap_matrix

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", "s1"),       # grams(3): abc bcd cde def
            (2, "a b c d e f", "s2"),       # identical -> jaccard 1
            (3, "x y z w v u", "s3"),       # disjoint
            (4, "a b c d q r", "s4"),       # shares abc bcd with s1
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["src_a"], r["src_b"]): r
        for r in corpus_overlap_matrix(docs, gram_n=3).collect()
    }
    assert out[("s1", "s2")]["jaccard_ppm"] == 1_000_000
    assert ("s1", "s3") not in out  # zero overlap pairs absent
    r = out[("s1", "s4")]
    assert (r["n_a"], r["n_b"], r["n_common"]) == (4, 4, 2)
    assert r["jaccard_ppm"] == 1_000_000 * 2 // 6
