"""SCD2 dimension builder: interval tiling and determinism invariants."""

from datetime import datetime

from lwetl_spark.operators.windows import scd2_from_events


def _events(spark):
    rows = [
        # user 1: A A B A  (consecutive repeat collapses)
        (1, datetime(2024, 1, 1, 0), 1, "A"),
        (2, datetime(2024, 1, 1, 1), 1, "A"),
        (3, datetime(2024, 1, 1, 2), 1, "B"),
        (4, datetime(2024, 1, 1, 3), 1, "A"),
        # user 2: timestamp tie broken by event_id: B (id 5) then A (id 6)
        (5, datetime(2024, 1, 2, 0), 2, "B"),
        (6, datetime(2024, 1, 2, 0), 2, "A"),
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])


def test_scd2_intervals(spark):
    out = scd2_from_events(_events(spark)).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for v in by_user.values():
        v.sort(key=lambda r: r.valid_from)

    u1 = [(r.event_type, r.valid_from, r.valid_to, r.is_current) for r in by_user[1]]
    assert [t[0] for t in u1] == ["A", "B", "A"]
    # intervals tile: each valid_to == next valid_from; only last is open
    for cur, nxt in zip(u1, u1[1:]):
        assert cur[2] == nxt[1] and not cur[3]
    assert u1[-1][2] is None and u1[-1][3]

    u2 = [(r.event_type, r.is_current) for r in by_user[2]]
    assert u2 == [("B", False), ("A", True)]  # tie resolved by event_id


def test_scd2_deterministic(spark):
    a = sorted(map(tuple, scd2_from_events(_events(spark)).collect()))
    b = sorted(map(tuple, scd2_from_events(_events(spark)).collect()))
    assert a == b


def test_sliding_agg_each_event_in_two_windows(spark):
    from pyspark.sql import functions as F

    from lwetl_spark.catalog import load_table
    from lwetl_spark.operators.windows import sliding_agg
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    out = sliding_agg(ev, width_seconds=3600, slide_seconds=1800)
    # total event-window memberships = 2x event count (width/slide = 2)
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == 2 * ev.count()
    # window starts align to the slide
    starts = [r.win_start for r in out.select("win_start").distinct().collect()]
    assert all(s.minute in (0, 30) and s.second == 0 for s in starts)
