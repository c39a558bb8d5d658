"""One-scan table profiler: exact counts, null handling, single-scan
plan shape."""

from pyspark.sql import functions as F

from ahnlich_spark.operators.profiling import profile_table


def test_profile_exact_counts_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.5), (3, None, 1.5), (4, "b", None)],
        "id long, s string, v double",
    )
    got = {r["column"]: (r["n_rows"], r["n_null"], r["n_distinct"])
           for r in profile_table(df).collect()}
    assert got == {
        "id": (4, 0, 4),
        "s": (4, 1, 2),
        "v": (4, 2, 1),
    }


def test_profile_is_one_scan_one_exchange(spark):
    from tests.test_plans import n_exchanges, plan_of

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("a"), (F.col("id") % 3).alias("b")
    )
    p = plan_of(profile_table(df))
    assert p.count("Scan") <= 1 or p.count("Range") == 1, p
    assert "Expand" in p, p          # the multi-distinct single-pass plan
    assert n_exchanges(p) <= 2, p    # partial + final agg exchanges only


def test_fk_audit_counts(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (7,), (7,), (7,), (None,)], "k long"
    )
    parent = spark.createDataFrame([(1,), (2,), (2,), (3,)], "pk long")
    row = __import__("ahnlich_spark.operators.profiling", fromlist=["fk_audit"]) \
        .fk_audit(child, parent, "k", "pk").collect()[0]
    assert (row["n_child"], row["n_null_keys"], row["n_orphans"], row["n_orphan_keys"]) \
        == (7, 1, 3, 1)
