"""Decontamination operator semantics (word n-grams, hit counting,
anti-join removal)."""

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
