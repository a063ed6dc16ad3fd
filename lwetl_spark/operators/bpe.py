"""Byte-pair-encoding train/apply as first-class vocabulary operators
(Sennrich et al. 2016, arXiv:1508.07909 — the tokenizer-training
primitive; NEW, no reference analog: lwetl has no text processing).

Spark-first shape — the ONLY corpus-sized stage is the (word, count)
aggregation in :func:`word_vocab`.  Everything after runs over the far
smaller vocabulary:

- **train**: a driver loop of ``n_merges`` vocabulary-sized jobs.  Each
  iteration re-segments the vocab with the merges learned so far (pure
  string expressions, row-local), explodes adjacent unit pairs weighted
  by word count, and takes the single most frequent pair — exactly the
  pagerank/k-means bounded-driver-loop pattern (per-iteration driver
  state = one (pair, freq) row).
- **apply**: ``functools.reduce`` folds the merge list over
  ``F.replace`` — left-to-right non-overlapping replace IS BPE's greedy
  merge order, the whole segmentation is one row-local whole-stage-
  codegen expression, and encoding 100 TB of text costs one vocab agg
  plus a broadcast join of segmentations back to tokens, never
  per-document merge loops.

Both halves use the same space-separated symbol representation
(``'table' -> 't a b l e' -> 'ta ble'``), so ``bpe_apply(words,
bpe_train(words, n))`` composes as one pipeline (pinned by
tests/test_functions.py::test_bpe_train_apply_composed).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, wc) vocabulary: lowercase whitespace tokens with
    frequencies.  The one corpus-sized aggregation in the BPE pipeline."""
    return (
        docs.select(
            F.explode(
                F.expr(
                    rf"filter(split(lower(trim({text_col})), '\\s+'), x -> x <> '')"
                ).alias("word")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def bpe_segment_col(word_col, merges: list[tuple[str, str]]):
    """Column expression: segment a word with a trained merge list.

    Starts from the character representation (every char separated by a
    space) and folds each merge ``(a, b)`` as the string replace
    ``'a b' -> 'ab'`` — sequential, in training order, which is BPE's
    greedy application.  Pure built-in expressions: stays inside
    whole-stage codegen, no Python in the loop.
    """
    base = F.trim(F.regexp_replace(word_col, "(.)", "$1 "))
    return reduce(
        lambda seg, m: F.replace(seg, F.lit(f"{m[0]} {m[1]}"), F.lit(f"{m[0]}{m[1]}")),
        merges,
        base,
    )


def bpe_train(
    words: DataFrame, n_merges: int, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, wc) vocabulary.

    Driver loop of vocab-sized jobs: per iteration, segment with the
    merges so far, count adjacent unit pairs weighted by wc, take the
    top pair (ties broken lexicographically for determinism — the same
    (freq DESC, pair ASC) order x_bpe_merge_step pins), stop early when
    the best pair's frequency drops below ``min_freq``.  Driver state
    per iteration is ONE row; the vocab never leaves the cluster.
    """
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        seg = (
            words.select(bpe_segment_col(F.col("word"), merges).alias("seg"), "wc")
            # materialize units as a real column FIRST: interpreted HOF
            # lambdas re-evaluate embedded subtrees once per element
            .select(F.split("seg", " ").alias("u"), "wc")
            .filter(F.size("u") >= 2)
        )
        pairs = seg.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(u) - 1), "
                    "i -> concat(element_at(u, i), ' ', element_at(u, i + 1)))"
                )
            ).alias("pair"),
            "wc",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("wc").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("pair"))
            .first()
        )
        if top is None or top["freq"] < min_freq:
            break
        a, b = top["pair"].split(" ", 1)
        merges.append((a, b))
    return merges


def bpe_apply(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a trained merge list to a (word, wc) vocabulary.

    Returns (word, wc, segmented, n_units, n_chars) — the segmentation
    table a tokenizer broadcast-joins back onto the token stream."""
    seg = bpe_segment_col(F.col("word"), merges)
    return words.withColumn("segmented", seg).select(
        "word",
        "wc",
        "segmented",
        (
            F.length("segmented")
            - F.length(F.replace(F.col("segmented"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("n_units"),
        F.length("word").cast("long").alias("n_chars"),
    )
