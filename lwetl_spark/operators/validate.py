"""Declarative data-contract validation (NEW — no reference analog;
lwetl's nearest surfaces are the table/column cardinality probes,
`/root/reference/lwetl/table_cardinality/main.py`, which COUNT but never
judge).  The dbt-test / Great-Expectations shape: a table plus a list of
rules, out comes one row per rule with its violation census — the gate a
100 TB ingest runs before publishing a partition.

Rule kinds:

- ``not_null``:        col IS NULL counts as a violation
- ``range``:           col outside [lo, hi] (either bound optional)
- ``accepted_values``: col NOT IN (…)
- ``regex``:           col does not rlike pattern
- ``unique``:          duplicate occurrences of a key tuple (violations
                       = rows beyond the first per key; NULL-keyed rows
                       never violate and are excluded from n_checked,
                       the SQL-standard UNIQUE convention)
- ``foreign_key``:     rows whose key has no match in a parent table

Scale design: every ROW-LOCAL rule (not_null/range/accepted/regex)
compiles into ONE conditional-count aggregation over a single scan —
adding rules adds columns to the agg, not passes over the data (the
o8_set_ops single-plan trick).  ``unique`` adds one keyed agg;
``foreign_key`` adds one join pruned to the key columns (broadcast when
the parent is dimension-sized).  The result is a handful of single-row
aggregates unioned — collect-free, composable into an assertion or a
quarantine filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate(
    df: DataFrame,
    rules: list[dict],
    parents: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Run a rule list against ``df``; returns (rule, kind, n_checked,
    n_violations) — one row per rule, n_checked = total rows evaluated.

    Each rule is a dict: ``{"rule": name, "kind": ..., "col": ...}``
    plus kind-specific keys (``lo``/``hi``, ``values``, ``pattern``,
    ``cols`` for unique, ``parent``/``parent_col`` for foreign_key —
    the parent DataFrame is looked up in ``parents`` by name).
    """
    parents = parents or {}
    row_aggs: list = []
    row_names: list[tuple[str, str]] = []
    extra: list[DataFrame] = []

    for r in rules:
        kind = r["kind"]
        name = r["rule"]
        if kind == "not_null":
            viol = F.col(r["col"]).isNull()
        elif kind == "range":
            conds = []
            if "lo" in r:
                conds.append(F.col(r["col"]) < F.lit(r["lo"]))
            if "hi" in r:
                conds.append(F.col(r["col"]) > F.lit(r["hi"]))
            if not conds:
                raise ValueError(f"range rule {name!r} needs lo and/or hi")
            viol = conds[0]
            for c in conds[1:]:
                viol = viol | c
            # NULL never violates a range rule (not_null owns nullness)
            viol = F.col(r["col"]).isNotNull() & viol
        elif kind == "accepted_values":
            viol = F.col(r["col"]).isNotNull() & ~F.col(r["col"]).isin(
                list(r["values"])
            )
        elif kind == "regex":
            viol = F.col(r["col"]).isNotNull() & ~F.col(r["col"]).rlike(
                r["pattern"]
            )
        elif kind == "unique":
            # SQL-standard UNIQUE semantics: NULL keys never violate
            # uniqueness (and are excluded from n_checked), so N
            # NULL-keyed rows contribute 0 violations — this also matches
            # the DuckDB oracle idiom COUNT(col) - COUNT(DISTINCT col),
            # both of which skip NULLs.  Oracles exercising nullable keys
            # must use that form, NOT COUNT(*) - COUNT(DISTINCT col).
            cols = list(r["cols"])
            keyed = df
            for c in cols:
                keyed = keyed.filter(F.col(c).isNotNull())
            dup = (
                keyed.groupBy(*cols)
                .agg(F.count("*").alias("_n"))
                .agg(
                    F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias(
                        "n_violations"
                    ),
                    F.coalesce(F.sum("_n"), F.lit(0)).alias("n_checked"),
                )
                .select(
                    F.lit(name).alias("rule"),
                    F.lit(kind).alias("kind"),
                    F.col("n_checked").cast("long"),
                    F.col("n_violations").cast("long"),
                )
            )
            extra.append(dup)
            continue
        elif kind == "functional_dependency":
            # X → Y holds iff every X-group carries exactly one distinct
            # (non-NULL) Y; violations count the ROWS of broken groups —
            # the data-profiling check behind "is this column derivable"
            lhs = list(r["determinant"])
            rhs = r["dependent"]
            fd = (
                df.groupBy(*lhs)
                .agg(
                    F.countDistinct(rhs).alias("_d"),
                    F.count("*").alias("_n"),
                )
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("_d") > 1, F.col("_n"))), F.lit(0)
                    ).alias("n_violations"),
                    F.coalesce(F.sum("_n"), F.lit(0)).alias("n_checked"),
                )
                .select(
                    F.lit(name).alias("rule"),
                    F.lit(kind).alias("kind"),
                    F.col("n_checked").cast("long"),
                    F.col("n_violations").cast("long"),
                )
            )
            extra.append(fd)
            continue
        elif kind == "foreign_key":
            parent = parents[r["parent"]]
            child_key = df.select(F.col(r["col"]).alias("_k"))
            parent_key = parent.select(
                F.col(r["parent_col"]).alias("_k")
            ).distinct()
            orphans = child_key.filter(F.col("_k").isNotNull()).join(
                parent_key, "_k", "left_anti"
            )
            fk = orphans.agg(F.count("*").alias("n_violations")).crossJoin(
                df.agg(F.count("*").alias("n_checked"))
            ).select(
                F.lit(name).alias("rule"),
                F.lit(kind).alias("kind"),
                F.col("n_checked").cast("long"),
                F.col("n_violations").cast("long"),
            )
            extra.append(fk)
            continue
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        row_aggs.append(F.sum(F.when(viol, 1).otherwise(0)).alias(f"_v{len(row_aggs)}"))
        row_names.append((name, kind))

    outs: list[DataFrame] = []
    if row_aggs:
        # one agg row exploded to one row per rule — k projections of
        # the same agg would make Catalyst re-plan the scan per union
        # branch; the explode keeps all row-local rules on ONE scan.
        one = df.agg(F.count("*").alias("_n"), *row_aggs)
        structs = F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.lit(kind).alias("kind"),
                    F.col("_n").cast("long").alias("n_checked"),
                    F.col(f"_v{i}").cast("long").alias("n_violations"),
                )
                for i, (name, kind) in enumerate(row_names)
            ]
        )
        outs.append(
            one.select(F.explode(structs).alias("r")).select(
                "r.rule", "r.kind", "r.n_checked", "r.n_violations"
            )
        )
    outs.extend(extra)
    if not outs:
        raise ValueError("validate needs at least one rule")
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def quarantine(
    df: DataFrame,
    rules: list[dict],
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (clean, quarantined) under the ROW-LOCAL rules —
    the operational form of `validate` (whose output is the census):
    clean rows flow on to the pipeline, quarantined rows carry a
    `violated_rules` array naming every rule they broke, ready for a
    dead-letter sink.

    Only row-local kinds (not_null/range/accepted_values/regex) apply —
    uniqueness and referential checks are table-level verdicts that
    cannot tag an individual row without cross-row state (run them via
    `validate` on the published table, the stream_validate rule).

    Both outputs derive from ONE flag projection (a when/array column) —
    filters push into the scan; persist the flagged frame first when
    consuming both sides of a wide input twice matters.
    """
    flags = []
    for r in rules:
        kind = r["kind"]
        name = r["rule"]
        if kind == "not_null":
            viol = F.col(r["col"]).isNull()
        elif kind == "range":
            conds = []
            if "lo" in r:
                conds.append(F.col(r["col"]) < F.lit(r["lo"]))
            if "hi" in r:
                conds.append(F.col(r["col"]) > F.lit(r["hi"]))
            if not conds:
                raise ValueError(f"range rule {name!r} needs lo and/or hi")
            viol = conds[0]
            for c in conds[1:]:
                viol = viol | c
            viol = F.col(r["col"]).isNotNull() & viol
        elif kind == "accepted_values":
            viol = F.col(r["col"]).isNotNull() & ~F.col(r["col"]).isin(
                list(r["values"])
            )
        elif kind == "regex":
            viol = F.col(r["col"]).isNotNull() & ~F.col(r["col"]).rlike(
                r["pattern"]
            )
        else:
            raise ValueError(
                f"rule {name!r}: {kind} is table-level — quarantine takes "
                "row-local rules only (run it through validate instead)"
            )
        flags.append(F.when(viol, F.lit(name)))
    if not flags:
        raise ValueError("quarantine needs at least one rule")
    flagged = df.withColumn(
        "violated_rules",
        F.array_compact(F.array(*flags)),
    )
    clean = flagged.filter(F.size("violated_rules") == 0).drop("violated_rules")
    bad = flagged.filter(F.size("violated_rules") > 0)
    return clean, bad
