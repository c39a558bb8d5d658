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


# ------------------------------------------------ window_count_join --

from ahnlich_spark.operators.joins import window_count_join


def _wcj_frames(spark):
    left = spark.createDataFrame(
        [
            (100, 1, 10_000_000),  # window [10s-5s, 10s): rights at 6s, 9s
            (101, 1, 5_000_000),   # window [0s, 5s): right at 4s only
            (102, 1, 6_000_000),   # right at exactly 6s NOT counted (strict past)
            (103, 2, 10_000_000),  # key with no rights
        ],
        "event_id long, user_id long, ts_us long",
    )
    right = spark.createDataFrame(
        [
            (1, 4_000_000, 10),
            (1, 6_000_000, 20),
            (1, 9_000_000, 30),
        ],
        "user_id long, ts_us long, v long",
    )
    return left, right


def test_window_count_join_semantics(spark):
    left, right = _wcj_frames(spark)
    out = {
        r["event_id"]: r.asDict()
        for r in window_count_join(
            left, right, on="user_id", window_us=5_000_000,
            sum_col="v", count_col="n", sum_out="s",
        ).collect()
    }
    assert (out[100]["n"], out[100]["s"]) == (2, 50.0)  # 6s + 9s
    assert (out[101]["n"], out[101]["s"]) == (1, 10.0)  # 4s only (>= 0s)
    # a right row at exactly the left ts is excluded; 4s is within [1s, 6s)
    assert (out[102]["n"], out[102]["s"]) == (1, 10.0)
    assert (out[103]["n"], out[103]["s"]) == (0, 0.0)
    # every left row survives exactly once
    assert sorted(out) == [100, 101, 102, 103]


def test_window_count_join_single_shuffle(spark):
    """Scale shape: union + one range-frame window = ONE Exchange and no
    join node — the naive range join would materialize |L| x density
    intermediate pairs."""
    left, right = _wcj_frames(spark)
    out = window_count_join(left, right, on="user_id", window_us=5_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# ------------------------------------------------------ salted_join --

from ahnlich_spark.operators.joins import salted_join


def test_salted_join_matches_plain_join(spark):
    """Salting only changes routing: result multiset == plain join,
    including a hot key carrying most rows."""
    left = spark.createDataFrame(
        [(i, 1 if i < 80 else i % 5) for i in range(100)], "row_id long, k long"
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "c")], "k long, tag string"
    )
    plain = sorted(
        (r["row_id"], r["tag"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["row_id"], r["tag"])
        for r in salted_join(left, right, on="k", n_salts=4).collect()
    )
    assert salted == plain and len(plain) > 80


def test_salted_join_key_is_composite(spark):
    """The physical join key must include the salt — that IS the skew
    split; and the left side must NOT be exploded (only the small right
    side replicates)."""
    left = spark.createDataFrame([(i, i % 3) for i in range(50)], "row_id long, k long")
    right = spark.createDataFrame([(0, "x"), (1, "y")], "k long, tag string")
    out = salted_join(left, right, on="k", n_salts=4, salt_source="row_id")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan
    assert plan.count("Generate explode") == 1  # right side only


# ------------------------------------ time-sliced skew decomposition --

def _skewed_events(spark, seed=3):
    """One hot key (90% of rows) + several cold keys; ts microseconds."""
    import random

    rng = random.Random(seed)
    rows = []
    eid = 0
    for _ in range(2000):
        key = "hot" if rng.random() < 0.9 else f"cold{rng.randint(0, 5)}"
        ts = rng.randint(0, 10_000_000)
        rows.append((eid, key, ts, rng.randint(1, 100)))
        eid += 1
    return spark.createDataFrame(rows, "eid long, k string, tus long, v long")


def test_asof_sliced_identical_to_plain(spark):
    """VERDICT r02 #8: the opt-in (key, time-slice) decomposition must
    return byte-identical results to the plain per-key window on a
    skewed fixture — slicing only changes row routing."""
    from ahnlich_spark.operators.joins import asof_join

    ev = _skewed_events(spark).withColumn("ts", F.timestamp_micros(F.col("tus")))
    left = ev.filter(F.col("eid") % 3 == 0).select("eid", "k", "ts")
    right = ev.filter(F.col("eid") % 3 != 0).select("k", "ts", "v", "eid")

    plain = asof_join(left, right, on="k", right_cols=["v"], tiebreak="eid")
    sliced = asof_join(left, right, on="k", right_cols=["v"], tiebreak="eid",
                       slice_us=1_000_000)
    key = lambda r: (r["eid"], r["k"])
    a = {key(r): (r["asof_ts"], r["asof_v"], r["asof_eid"]) for r in plain.collect()}
    b = {key(r): (r["asof_ts"], r["asof_v"], r["asof_eid"]) for r in sliced.collect()}
    assert a == b and len(a) == left.count()


def test_window_count_sliced_identical_to_plain(spark):
    from ahnlich_spark.operators.joins import window_count_join

    ev = _skewed_events(spark, seed=9)
    left = ev.filter(F.col("eid") % 2 == 0).select("eid", "k", F.col("tus").alias("ts_us"))
    right = ev.filter(F.col("eid") % 2 == 1).select("k", F.col("tus").alias("ts_us"), "v")

    kw = dict(on="k", window_us=500_000, sum_col="v")
    plain = window_count_join(left, right, **kw)
    sliced = window_count_join(left, right, sliced=True, **kw)
    key = lambda r: r["eid"]
    a = {key(r): (r["n_right"], r["sum_right"]) for r in plain.collect()}
    b = {key(r): (r["n_right"], r["sum_right"]) for r in sliced.collect()}
    assert a == b and len(a) == left.count()


def test_sliced_paths_shuffle_on_key_and_slice(spark):
    """The decomposition's point: the window partitions on (key, slice)
    so a hot key spreads across reducers."""
    from ahnlich_spark.operators.joins import asof_join, window_count_join

    ev = _skewed_events(spark).withColumn("ts", F.timestamp_micros(F.col("tus")))
    left = ev.select("eid", "k", "ts")
    right = ev.select("k", "ts", "v")
    out = asof_join(left, right, on="k", right_cols=["v"], slice_us=1_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__slc" in plan


# -------------------------------------------------- range lookup --

def test_range_lookup_join_matches_theta_join(spark):
    from ahnlich_spark.operators.joins import range_lookup_join

    facts = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 5, 9, 10, 17, 25, 99, 100, 250])],
        "fid long, v long",
    )
    bands = spark.createDataFrame(
        [("a", 0, 10), ("b", 10, 50), ("c", 100, 200)],
        "band string, lo long, hi long",
    )
    got = sorted(
        (r["fid"], r["band"])
        for r in range_lookup_join(facts, bands, "v").collect()
    )
    naive = sorted(
        (r["fid"], r["band"])
        for r in facts.join(
            bands, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
        ).collect()
    )
    assert got == naive
    # boundary discipline: v=10 joins band b (lo inclusive), not a
    # (hi exclusive); v=250 matches nothing
    assert (3, "b") in got and all(fid != 8 for fid, _ in got)


def test_range_lookup_join_beyond_double_precision(spark):
    """Bucket keys are exact integer floor division: 64-bit values at or
    above 2^53 (where doubles round) must land in their true band, and
    negatives must floor (not truncate toward zero)."""
    from ahnlich_spark.operators.joins import range_lookup_join

    big = 1 << 60
    facts = spark.createDataFrame(
        [(1, big + 1), (2, big + 2), (3, -5)], "fid long, v long"
    )
    bands = spark.createDataFrame(
        [("in", big, big + 2), ("out", big + 2, big + 4), ("neg", -7, -2)],
        "band string, lo long, hi long",
    )
    got = sorted(
        (r["fid"], r["band"])
        for r in range_lookup_join(facts, bands, "v", granularity=3).collect()
    )
    assert got == [(1, "in"), (2, "out"), (3, "neg")]


def test_range_lookup_join_left_and_overlap(spark):
    from ahnlich_spark.operators.joins import range_lookup_join

    facts = spark.createDataFrame([(1, 5), (2, 500)], "fid long, v long")
    bands = spark.createDataFrame(
        [("x", 0, 10), ("y", 3, 8)], "band string, lo long, hi long"
    )
    got = sorted(
        (r["fid"], r["band"])
        for r in range_lookup_join(facts, bands, "v", how="left").collect()
    )
    # overlapping bands both match; the unmatched fact survives with NULL
    assert got == [(1, "x"), (1, "y"), (2, None)]


def test_range_lookup_join_plans_hash_join(spark):
    from ahnlich_spark.operators.joins import range_lookup_join
    from tests.test_plans import plan_of

    facts = spark.createDataFrame(
        [(i, i * 7 % 1000) for i in range(100)], "fid long, v long"
    )
    bands = spark.createDataFrame(
        [(f"b{i}", i * 100, (i + 1) * 100) for i in range(10)],
        "band string, lo long, hi long",
    )
    plan = plan_of(range_lookup_join(facts, bands, "v", granularity=100))
    # the whole point: an equi hash join on the bucket key, NOT the
    # nested-loop theta join (O(|bands|) predicate evals per fact row)
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_range_lookup_join_derives_granularity(spark):
    from ahnlich_spark.operators.joins import range_lookup_join

    facts = spark.createDataFrame([(1, 42), (2, 170)], "fid long, v long")
    bands = spark.createDataFrame(
        [("narrow", 40, 45), ("wide", 100, 200)],
        "band string, lo long, hi long",
    )
    got = sorted(
        (r["fid"], r["band"])
        for r in range_lookup_join(facts, bands, "v").collect()
    )
    assert got == [(1, "narrow"), (2, "wide")]


# ----------------------------------------------- rolling features --

def test_rolling_window_features_counts(spark):
    from ahnlich_spark.operators.joins import rolling_window_features

    rows = [
        # user 1: ts 0, 50, 100, 210 — window 100 us inclusive both ends
        (1, 1, 0, 10), (2, 1, 50, 20), (3, 1, 100, 30), (4, 1, 210, 40),
        # user 2: one event
        (5, 2, 60, 5),
        # user 1: tie timestamps are frame PEERS (both count at t=300)
        (6, 1, 300, 1), (7, 1, 300, 2),
    ]
    df = spark.createDataFrame(rows, "eid long, uid long, t long, v long")
    got = {
        r["eid"]: (r["n_window"], r["sum_window"])
        for r in rolling_window_features(df, "uid", "t", 100, sum_col="v").collect()
    }
    assert got[1] == (1, 10)
    assert got[2] == (2, 30)
    assert got[3] == (3, 60)      # 0, 50, 100 all within [0, 100]
    assert got[4] == (1, 40)      # 110..210: only itself
    assert got[5] == (1, 5)
    # peers see each other, and event 4 (t=210) is inside [200, 300]
    assert got[6] == (3, 43) and got[7] == (3, 43)


def test_rolling_window_single_shuffle(spark):
    from ahnlich_spark.operators.joins import rolling_window_features
    from tests.test_plans import n_exchanges, plan_of

    df = spark.createDataFrame(
        [(i, i % 5, i * 10, i) for i in range(100)], "eid long, uid long, t long, v long"
    )
    plan = plan_of(rolling_window_features(df, "uid", "t", 50, sum_col="v"))
    assert n_exchanges(plan) == 1, plan


# ---------------------------------------------------- skew profile --

def test_skew_profile_exact_counts_and_salts(spark):
    from ahnlich_spark.operators.joins import skew_profile

    rows = [("hot",)] * 95 + [("warm",)] * 21 + [(f"cold{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "k string")
    got = {r["key"]: (r["cnt"], r["n_salts"])
           for r in skew_profile(df, "k", target_rows_per_task=10).collect()}
    assert got == {"hot": (95, 10), "warm": (21, 3)}
