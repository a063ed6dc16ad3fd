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


def _assignment_target(lines, i):
    """Walk back from the checkpoint line to the statement head and
    return the assigned name — or None for a ``return`` expression."""
    j = i
    while j >= 0:
        m = re.match(r"^\s*(\w+)\s*=\s*\(?", lines[j])
        if m and "==" not in lines[j]:
            return m.group(1)
        if re.match(r"^\s*return\b", lines[j]):
            return None
        j -= 1
    return None


def test_every_lazy_checkpoint_is_materialized_by_an_adjacent_count():
    """r12 (ADVICE r11): match the materializing ``.count()`` to the
    CHECKPOINTED NAME, not to any count inside a fixed line window —
    the old 7-line window could be satisfied by an unrelated frame's
    count (or broken by a reformat)."""
    src = inspect.getsource(incremental)
    lines = src.splitlines()
    lazy_sites = [i for i, ln in enumerate(lines)
                  if "localCheckpoint(eager=False)" in ln]
    assert lazy_sites, "expected the r11 lazy-checkpoint sites to exist"
    for i in lazy_sites:
        name = _assignment_target(lines, i)
        if name is None:
            # return-expression site (_vec_delta_for): every caller
            # must count the returned frame before any other action
            fn = None
            for j in range(i, -1, -1):
                m = re.match(r"\s*def (\w+)", lines[j])
                if m:
                    fn = m.group(1)
                    break
            assert fn, f"no enclosing def for checkpoint at line {i + 1}"
            callers = [
                (k, re.match(rf"^\s*(\w+)\s*=\s*{fn}\(", ln))
                for k, ln in enumerate(lines)
            ]
            callers = [(k, m) for k, m in callers if m]
            assert callers, f"return-site checkpoint in {fn} never called"
            for k, m in callers:
                var = m.group(1)
                window = "\n".join(lines[k + 1:k + 6])
                assert re.search(rf"\b{var}\.count\(\)", window), (
                    f"{fn}() result '{var}' at line {k + 1} is not "
                    f"counted right after — the lazy checkpoint inside "
                    f"{fn} would go unmaterialized"
                )
            continue
        # named site: the NEXT action on that name must be .count()
        window = "\n".join(lines[i + 1:i + 16])
        mc = re.search(rf"\b(?:\w+\s*=\s*)?{name}\.count\(\)", window)
        assert mc, (
            f"lazy localCheckpoint assigned to '{name}' at "
            f"incremental.py:{i + 1} has no adjacent {name}.count() "
            f"materializer — either make it eager or restore the count"
        )
        before = window[: mc.start()]
        assert not re.search(rf"\b{name}\.(write|save|parquet)\b", before), (
            f"lazy checkpoint '{name}' at line {i + 1}: a write on it "
            f"runs before the materializing count"
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
