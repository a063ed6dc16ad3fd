"""Batch model inference over a text column (NEW — no reference analog;
the quality-classifier / reward-model scoring stage of a training-data
pipeline, e.g. fasttext quality filters or LLM-judge scoring at corpus
scale).

The Spark-side plumbing is the real deliverable — the same shape you'd
wrap around any real model:

- Arrow `mapInPandas`: the model sees COLUMNS (a pandas batch), not
  rows, so vectorized scorers (numpy / onnxruntime / torch on CPU) run
  at batch granularity with one Python↔JVM transfer per batch;
- `batch_rows` caps the Arrow batch via
  `spark.sql.execution.arrow.maxRecordsPerBatch` semantics at the
  operator level (re-chunking inside the iterator) so model memory is
  bounded regardless of partition size;
- the closure is self-contained (nested fns + local imports) so
  cloudpickle ships it BY VALUE — workers never import this package;
- scores land as a plain column: downstream filtering/thresholding
  stays JVM-side, and the scorer runs ONCE per row even when several
  consumers read the score (project, then reference).

The default scorer is a deterministic md5 stub (model libs absent in
this environment — the multimodal-decode convention): score_ppm =
first-8-hex-digits(md5(text)) mod 1e6.  Being md5, the stub is
PORTABLE: the DuckDB oracle reproduces it exactly, so the whole
batch-inference path is value-checked end to end, not just smoke-run.
A real model drops in by passing `scorer` (pandas Series → iterable of
ints) — the plumbing is unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame


def batch_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_rows: int = 1024,
    scorer: Callable[["object"], Iterable[int]] | None = None,
) -> DataFrame:
    """(id, score_ppm) — model scores for every row, Arrow-batched.

    With the default md5 stub the output is engine-portable and
    oracle-checkable; any custom `scorer` keeps the identical plan.
    """

    def run(batches):
        import hashlib as _hashlib

        import pandas as _pd

        def default_scorer(texts):
            # NULL text scores as empty string — a worker crash on one
            # null row is the wrong failure mode for a corpus pass
            return [
                int(
                    _hashlib.md5((t or "").encode("utf-8")).hexdigest()[:8], 16
                )
                % 1_000_000
                for t in texts
            ]

        fn = scorer or default_scorer
        for pdf in batches:
            # re-chunk: model memory bounded by batch_rows, not by
            # whatever partition/Arrow batch size arrived
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                yield _pd.DataFrame(
                    {
                        "id": chunk[id_col],
                        "score_ppm": list(fn(chunk[text_col])),
                    }
                )

    out_id_type = dict(df.dtypes)[id_col]
    return (
        df.select(id_col, text_col)
        .mapInPandas(run, schema=f"id {out_id_type}, score_ppm long")
        .withColumnRenamed("id", id_col)
    )
