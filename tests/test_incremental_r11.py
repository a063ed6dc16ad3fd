"""r11 optimization pins for operators/incremental.py.

The ingest_increment checkpoints were switched from eager to lazy where —
and ONLY where — a ``.count()`` is the very next action on the frame: the
count materializes the checkpoint blocks in ONE job (eager ran its own
internal count and then ours, i.e. two jobs + two plan analyses per
site).  The race-avoidance contract (state/manifest appends must never
race their own scans) survives because the count always runs BEFORE the
dependent write.  This test pins the pairing so a future edit cannot
leave a lazy checkpoint whose first action is a write.
"""
import inspect
import re

from lwetl_spark.operators import incremental


def test_every_lazy_checkpoint_is_materialized_by_an_adjacent_count():
    src = inspect.getsource(incremental)
    lines = src.splitlines()
    lazy_sites = [i for i, ln in enumerate(lines)
                  if "localCheckpoint(eager=False)" in ln]
    assert lazy_sites, "expected the r11 lazy-checkpoint sites to exist"
    for i in lazy_sites:
        # a .count() call must appear within the next few source lines,
        # before any write/save/append on the checkpointed frame
        window = "\n".join(lines[i + 1:i + 8])
        m = re.search(r"\.count\(\)", window)
        assert m, (
            f"lazy localCheckpoint at incremental.py:{i + 1} has no "
            f"adjacent .count() materializer — either make it eager or "
            f"restore the count"
        )
        before_count = window[: m.start()]
        assert not re.search(r"\.(write|save|parquet)\b", before_count), (
            f"lazy checkpoint at line {i + 1}: a write runs before the "
            f"materializing count"
        )


def test_eager_checkpoints_remain_where_no_count_follows():
    # the overwrite-vs-scan guards (merged-frame writes) must stay eager:
    # their first consumer is a WRITE, not a count
    src = inspect.getsource(incremental)
    assert "localCheckpoint(eager=True)" in src, (
        "the write-guard eager checkpoints must not be converted to lazy"
    )


def test_cluster_for_write_is_conditional(spark):
    """_partwrite.cluster_for_write: a many-split frame clusters by the
    partition column (one file per value at scale), a few-split frame
    passes through untouched (no array-payload exchange on local
    builds); rows are identical either way."""
    from pyspark.sql import functions as F

    from lwetl_spark.operators._partwrite import cluster_for_write

    few = spark.range(100).withColumn("b", F.pmod("id", F.lit(4))).coalesce(2)
    assert cluster_for_write(few, "b") is few

    many = spark.range(100).withColumn(
        "b", F.pmod("id", F.lit(4))
    ).repartition(16)
    out = cluster_for_write(many, "b")
    assert out is not many
    # clustered: each b value lives in exactly ONE partition, so a
    # partitionBy write emits one file per value, not one per task
    per_part = out.rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, b) for b in {r["b"] for r in it}]
    ).collect()
    partitions_per_value: dict = {}
    for i, b in per_part:
        partitions_per_value.setdefault(b, set()).add(i)
    assert all(len(ps) == 1 for ps in partitions_per_value.values())
    assert sorted(r["id"] for r in out.collect()) == list(range(100))
