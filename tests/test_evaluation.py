"""Evaluation-suite operators: hard-negative mining and matryoshka
prefix-dimension recall."""

# ------------------------------------------------- hard-negative mining --

def test_hard_negatives_excludes_same_label_and_ranks(spark):
    """Negatives never share the anchor's label; ranking is cosine-desc
    with id-asc tie-break; k bounds each anchor's list."""
    from pyspark.sql import functions as F

    from ahnlich_spark.operators.evaluation import hard_negatives

    rows = [
        (0, [1.0, 0.0], 0),          # anchor
        (1, [0.99, 0.14], 0),        # same label: NEVER a negative
        (2, [0.95, 0.31], 1),        # closest other-label
        (3, [0.7, 0.7], 1),
        (4, [0.0, 1.0], 2),
        (5, [0.95, 0.31], 2),        # cosine tie with 2 -> id asc
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = hard_negatives(df.filter(F.col("vec_id") == 0), df, k=3).collect()
    assert [r["vec_id"] for r in got] == [2, 5, 3]
    assert [r["rank_n"] for r in got] == [1, 2, 3]
    assert all(r["qid"] == 0 for r in got)


def test_hard_negatives_plan_one_scan_broadcast(spark):
    """Anchors broadcast; the corpus scans once (no corpus self-join,
    no exchange on the corpus side before the window)."""
    from pyspark.sql import functions as F

    from ahnlich_spark.operators.evaluation import hard_negatives
    from tests.test_plans import plan_of

    df = spark.createDataFrame(
        [(i, [float(i % 7), 1.0], i % 3) for i in range(100)],
        "vec_id long, embedding array<float>, label int",
    )
    plan = plan_of(hard_negatives(df.filter(F.col("vec_id") < 2), df, k=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


# -------------------------------------------------- matryoshka recall --

def test_matryoshka_recall_full_prefix_is_perfect(spark):
    """Using the FULL dimension as the 'prefix' must recover the whole
    top-k (sanity: the metric and ranking pipeline agree with
    themselves), and a 1-dim prefix can only do worse or equal."""
    import numpy as np

    from pyspark.sql import functions as F

    from ahnlich_spark.operators.evaluation import matryoshka_recall

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist(), 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r["prefix_dim"]: r["n_hits"] for r in matryoshka_recall(
        df, df.filter(F.col("vec_id") < 3), [1, 8], k=5).collect()}
    assert got[8] == 3 * 5          # full prefix == full ranking
    assert 0 <= got[1] <= got[8]


def test_matryoshka_single_pipeline_plan(spark):
    """All prefix rankings ride ONE scan + one anchor-key exchange (+
    the single-partition final agg) — a per-prefix union would
    re-execute the whole pipeline per prefix."""
    import numpy as np

    from pyspark.sql import functions as F

    from ahnlich_spark.operators.evaluation import matryoshka_recall

    rng = np.random.RandomState(3)
    df = spark.createDataFrame(
        [(i, v.tolist(), 0) for i, v in
         enumerate(rng.normal(size=(40, 8)).astype(np.float32))],
        "vec_id long, embedding array<float>, label int",
    )
    plan = matryoshka_recall(
        df, df.filter(F.col("vec_id") < 2), [2, 4], k=5
    )._jdf.queryExecution().executedPlan().toString()
    n_ex = sum(1 for l in plan.split("\n")
               if "Exchange" in l and "Broadcast" not in l)
    assert n_ex <= 2, plan
