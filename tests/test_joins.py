"""As-of join semantics: inclusive at-equal-ts, null on no-match,
deterministic tie-break, and the single-shuffle plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from ahnlich_spark.operators.joins import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01T10:00:00")),  # after two rights
            (101, 1, _ts("2024-01-01T08:00:00")),  # exactly at a right ts
            (102, 1, _ts("2024-01-01T01:00:00")),  # before every right
            (103, 2, _ts("2024-01-01T12:00:00")),  # key with no rights
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T05:00:00")),
            (2, 1, _ts("2024-01-01T08:00:00")),
            (3, 1, _ts("2024-01-01T08:00:00")),  # same ts as id=2: tie
        ],
        "event_id long, user_id long, ts timestamp",
    )
    return left, right


def test_asof_backward_inclusive_and_null(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r.asDict()
        for r in asof_join(
            left, right, on="user_id", tiebreak="event_id",
            right_cols=["event_id"],
        ).collect()
    }
    # latest right before 10:00 is the 08:00 pair; tie -> greatest id (3)
    assert out[100]["asof_event_id"] == 3
    # exactly-at ts is inclusive
    assert out[101]["asof_event_id"] == 3
    # left before all rights -> null
    assert out[102]["asof_event_id"] is None
    assert out[102]["asof_ts"] is None
    # key with no right rows at all -> null
    assert out[103]["asof_event_id"] is None
    # left columns survive untouched
    assert out[100]["user_id"] == 1


def test_asof_join_single_shuffle(spark):
    """Scale shape: union + one window = exactly one Exchange; no join
    node (the quadratic range-join formulation) anywhere."""
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", tiebreak="event_id",
                    right_cols=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
