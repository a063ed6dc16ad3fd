"""Data-contract validation: per-kind hand-checked censuses and the
one-scan plan pin for row-local rules."""

from __future__ import annotations

import pytest

from lwetl_spark.operators.validate import validate


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "F", "a@x.com"),
            (2, -5.0, "O", "bad-email"),
            (2, None, "Z", None),
            (None, 3.0, "P", "c@y.org"),
        ],
        "k int, price double, status string, email string",
    )


def test_validate_row_local_rules(spark):
    out = {
        r["rule"]: r
        for r in validate(
            _df(spark),
            [
                {"rule": "k_not_null", "kind": "not_null", "col": "k"},
                {"rule": "price_pos", "kind": "range", "col": "price", "lo": 0.0},
                {
                    "rule": "status_ok",
                    "kind": "accepted_values",
                    "col": "status",
                    "values": ["F", "O", "P"],
                },
                {
                    "rule": "email_fmt",
                    "kind": "regex",
                    "col": "email",
                    "pattern": r"^[^@]+@[^@]+\.[^@]+$",
                },
            ],
        ).collect()
    }
    assert out["k_not_null"]["n_violations"] == 1
    assert out["price_pos"]["n_violations"] == 1  # NULL price not counted
    assert out["status_ok"]["n_violations"] == 1
    assert out["email_fmt"]["n_violations"] == 1  # NULL email not counted
    assert all(r["n_checked"] == 4 for r in out.values())


def test_validate_unique_and_fk(spark):
    df = _df(spark)
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    out = {
        r["rule"]: r
        for r in validate(
            df,
            [
                {"rule": "k_unique", "kind": "unique", "cols": ["k"]},
                {
                    "rule": "k_fk",
                    "kind": "foreign_key",
                    "col": "k",
                    "parent": "p",
                    "parent_col": "pk",
                },
            ],
            parents={"p": parent},
        ).collect()
    }
    # k values: 1, 2, 2, NULL -> one duplicate beyond first (2), NULL its own key
    assert out["k_unique"]["n_violations"] == 1
    # FK: NULL k skipped; 1 and 2 match -> 0 orphans
    assert out["k_fk"]["n_violations"] == 0


def test_validate_range_both_bounds(spark):
    df = _df(spark)
    r = validate(
        df, [{"rule": "band", "kind": "range", "col": "price", "lo": 0.0, "hi": 5.0}]
    ).collect()[0]
    assert r["n_violations"] == 2  # -5 below, 10 above; NULL skipped


def test_validate_row_rules_single_scan(spark):
    """All row-local rules must share ONE aggregation over one scan —
    adding a rule must not add a pass over the data."""
    plan = (
        validate(
            _df(spark),
            [
                {"rule": "a", "kind": "not_null", "col": "k"},
                {"rule": "b", "kind": "range", "col": "price", "lo": 0.0},
                {"rule": "c", "kind": "accepted_values", "col": "status",
                 "values": ["F"]},
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one partial+final agg pair, one scan source
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1


def test_validate_errors(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        validate(df, [{"rule": "r", "kind": "range", "col": "price"}])
    with pytest.raises(ValueError):
        validate(df, [{"rule": "r", "kind": "nope", "col": "price"}])
    with pytest.raises(ValueError):
        validate(df, [])


def test_quarantine_split(spark):
    from lwetl_spark.operators.validate import quarantine

    df = _df(spark)
    clean, bad = quarantine(
        df,
        [
            {"rule": "k_not_null", "kind": "not_null", "col": "k"},
            {"rule": "price_pos", "kind": "range", "col": "price", "lo": 0.0},
        ],
    )
    assert clean.count() + bad.count() == 4
    assert clean.columns == df.columns  # tag column dropped on the clean side
    tags = {tuple(r["violated_rules"]) for r in bad.collect()}
    assert ("price_pos",) in tags and ("k_not_null",) in tags
    # multi-violation rows list every broken rule
    both = quarantine(
        spark.createDataFrame([(None, -1.0)], "k int, price double"),
        [
            {"rule": "k_not_null", "kind": "not_null", "col": "k"},
            {"rule": "price_pos", "kind": "range", "col": "price", "lo": 0.0},
        ],
    )[1].collect()[0]["violated_rules"]
    assert sorted(both) == ["k_not_null", "price_pos"]


def test_quarantine_rejects_table_level_rules(spark):
    from lwetl_spark.operators.validate import quarantine

    with pytest.raises(ValueError):
        quarantine(_df(spark), [{"rule": "u", "kind": "unique", "cols": ["k"]}])


def test_validate_functional_dependency(spark):
    from lwetl_spark.operators.validate import validate

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "c")],
        "x int, y string",
    )
    r = validate(
        df,
        [{"rule": "fd", "kind": "functional_dependency",
          "determinant": ["x"], "dependent": "y"}],
    ).collect()[0]
    # group x=2 is multi-valued (2 rows); groups 1 and 3 hold
    assert (r["n_checked"], r["n_violations"]) == (5, 2)
