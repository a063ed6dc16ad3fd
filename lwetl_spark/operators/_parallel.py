"""Scan-parallelism floor for interpreter-bound Arrow passes.

r11 optimization (guide §2.5's input-skew rule): the sf-dir tables are
single parquet splits, so any mapInPandas/applyInPandas chain that runs
BEFORE the first exchange inherits one partition and serializes its
whole Python-side compute on a single core (measured: the TIFF
generate+decode chain spent 6.4 s wall on ~14 CPU-s of codec work on
local[32]; the IVF build's assignment pass ran as one 0.9 s task).

`spread` round-robins such a frame across the session's parallelism
when — and only when — it has fewer partitions.  At real scale the
corpus scan has thousands of splits and this no-ops, so no extra
exchange ever appears in a 100 TB plan; the repartition is
deterministic (Spark sorts before round-robin partitioning,
``spark.sql.execution.sortBeforeRepartition``), and every caller's
per-row work is a pure function of the row, so results are
partitioning-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: r12 (guide §2.6): overlap independent maintenance legs.  Checked at
#: call time so an A/B harness can monkeypatch it to reproduce the
#: sequential (pre-r12) execution order without a code change.
OVERLAP_MAINTENANCE = True


def overlap_legs(background, foreground):
    """Run two INDEPENDENT maintenance legs as concurrent Spark job
    groups (guide §2.6: actions are only sequential because driver code
    calls them sequentially; FIFO scheduling back-fills executors freed
    by one leg's stragglers with the other leg's tasks).

    ``background`` runs on a helper thread, ``foreground`` on the
    caller's thread; returns ``foreground()``'s result after BOTH legs
    complete.  Callers must guarantee independence: the legs read only
    frames that are already checkpoint-materialized and write disjoint
    paths, so execution order cannot change any result (the sequential
    fallback when ``OVERLAP_MAINTENANCE`` is false runs background
    first — the pre-r12 order — and is behavior-identical).

    Failure semantics: the background leg is always joined; its
    exception propagates unless the foreground leg also raised (then
    the foreground's wins, as in sequential execution).
    """
    if not OVERLAP_MAINTENANCE:
        background()
        return foreground()
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(background)
        try:
            out = foreground()
        except BaseException:
            fut.exception()  # join; foreground's exception wins
            raise
        exc = fut.exception()
        if exc is not None:
            raise exc
        return out


def overlap_all(*legs) -> None:
    """N-way :func:`overlap_legs`: run all but the last leg on helper
    threads, the last on the caller's thread, and join every leg before
    returning.  Same independence contract (legs read only
    already-materialized frames / disjoint tables and write disjoint
    paths, so execution order cannot change any result).  When
    ``OVERLAP_MAINTENANCE`` is false, runs the legs sequentially in
    declaration order — callers declare them in the pre-r12 order, so
    the fallback is behavior-identical.  The first helper-leg exception
    propagates unless the caller's leg also raised (then the caller's
    wins, as in sequential execution)."""
    if not OVERLAP_MAINTENANCE or len(legs) <= 1:
        for leg in legs:
            leg()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(legs) - 1) as pool:
        futs = [pool.submit(leg) for leg in legs[:-1]]
        try:
            legs[-1]()
        except BaseException:
            for f in futs:
                f.exception()  # join; the caller leg's exception wins
            raise
        first_exc = None
        for f in futs:
            exc = f.exception()
            if first_exc is None and exc is not None:
                first_exc = exc
        if first_exc is not None:
            raise first_exc


def spread(df: DataFrame) -> DataFrame:
    """Round-robin `df` across the session's default parallelism when
    it has fewer partitions; identity otherwise."""
    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext on the session
        target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        have = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect: no RDD surface, so the partition count is
        # unknowable.  Default to IDENTITY (r12, VERDICT r11 #8 /
        # ADVICE): on a Connect cluster at real scale the input has
        # thousands of splits and spreading unconditionally would
        # re-introduce the full-payload exchange this helper exists
        # to avoid (e.g. the array<double> corpus in the ANN builds).
        return df
    return df if have >= target else df.repartition(target)
