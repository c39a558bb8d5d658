"""Misra-Gries heavy hitters: exactness vs the exhaustive groupBy,
survival guarantee under real pruning, and certificate refusal.

The operator's claim is sharp — *provably exact* top-k with O(capacity)
memory per partition — so the tests force the regime where the summary
actually prunes (distinct >> capacity) and compare against the
full-shuffle answer, then force the regime where no proof is possible
(flat counts, tiny capacity) and demand a refusal instead of a wrong
answer."""

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.operators.sketches import (
    heavy_hitter_candidates,
    heavy_hitters,
    mg_summary_merge,
)


def _zipf_df(spark, n_head=8, head_count=400, n_tail=3000):
    """A skewed value stream: a few very hot head values + a long tail
    of near-singletons, shuffled across 8 partitions."""
    head = [(f"hot_{i}",) for i in range(n_head) for _ in range(head_count - 10 * i)]
    tail = [(f"tail_{i}",) for i in range(n_tail) for _ in range(1 + i % 3)]
    df = spark.createDataFrame(head + tail, "value string")
    return df.repartition(8, F.xxhash64("value"))


def _exhaustive_topk(df, k):
    return (
        df.groupBy("value")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("value"))
        .limit(k)
        .collect()
    )


def test_mg_merge_undercount_bound():
    """Pure-summary property: after folding n items through capacity c,
    every value's estimate undercounts its true count by at most
    n/(c+1), and any value with true count > n/(c+1) survives."""
    import random

    rng = random.Random(11)
    stream = [rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(5000)]
    stream += ["HH"] * 400  # one genuine heavy hitter
    rng.shuffle(stream)
    true = {}
    for v in stream:
        true[v] = true.get(v, 0) + 1
    cap = 8
    counter = {}
    for i in range(0, len(stream), 250):  # arbitrary batch boundaries
        batch = {}
        for v in stream[i : i + 250]:
            batch[v] = batch.get(v, 0) + 1
        counter = mg_summary_merge(counter, batch.items(), cap)
    assert len(counter) <= cap
    bound = len(stream) / (cap + 1)
    for v, est in counter.items():
        assert true[v] - est <= bound + 1e-9
    for v, c in true.items():
        if c > bound:
            assert v in counter, f"heavy value {v} (count {c}) pruned"


def test_heavy_hitters_exact_under_pruning(spark):
    """capacity 64 << ~3000 distinct values: the per-partition summaries
    genuinely prune, yet the certified top-k equals the exhaustive
    groupBy top-k, counts included."""
    df = _zipf_df(spark)
    cand = heavy_hitter_candidates(df, "value", capacity=64)
    stats = cand.agg(F.max("pruned").alias("p"), F.count(F.lit(1)).alias("rows")).first()
    assert stats["p"] is True, "fixture too small: summaries never pruned"
    assert stats["rows"] <= 64 * df.rdd.getNumPartitions() + 8
    got = heavy_hitters(df, "value", k=8, capacity=64, verify=True).collect()
    want = _exhaustive_topk(df, 8)
    assert [(r["value"], r["cnt"]) for r in got] == [
        (r["value"], r["cnt"]) for r in want
    ]


def test_heavy_hitters_merged_candidates_path(spark):
    """max_broadcast_candidates=1 forces the tree-merge path: the
    candidate set collapses to ONE <= capacity summary (broadcastable at
    any partition count) and the certified top-k still equals the
    exhaustive answer — the merge DAG keeps the N/(capacity+1) bound."""
    from ahnlich_spark.operators.sketches import merge_summaries

    df = _zipf_df(spark)
    got = heavy_hitters(df, "value", k=8, capacity=64, verify=True,
                        max_broadcast_candidates=1).collect()
    want = _exhaustive_topk(df, 8)
    assert [(r["value"], r["cnt"]) for r in got] == [
        (r["value"], r["cnt"]) for r in want
    ]
    cand = heavy_hitter_candidates(df, "value", capacity=64)
    merged = merge_summaries(cand, 64).collect()
    assert len(merged) <= 64
    assert any(r["pruned"] for r in merged)  # ~3000 distinct through cap 64
    hot = {r["value"] for r in merged}
    assert {f"hot_{i}" for i in range(8)} <= hot  # heavy head survives the DAG


def test_heavy_hitters_matches_without_verify(spark):
    got = heavy_hitters(_zipf_df(spark), "value", k=5, capacity=64,
                        verify=False).collect()
    want = _exhaustive_topk(_zipf_df(spark), 5)
    assert [(r["value"], r["cnt"]) for r in got] == [
        (r["value"], r["cnt"]) for r in want
    ]


def test_heavy_hitters_refuses_uncertifiable(spark):
    """Flat distribution + capacity far below distinct: rank-k cannot
    clear the N/(capacity+1) ceiling, so verify must raise (naming a
    sufficient capacity) instead of returning an unproven head."""
    flat = spark.createDataFrame(
        [(f"v{i}",) for i in range(800) for _ in range(3)], "value string"
    ).repartition(8, F.xxhash64("value"))
    with pytest.raises(ValueError, match="capacity >= "):
        heavy_hitters(flat, "value", k=10, capacity=16, verify=True)


def test_heavy_hitters_no_pruning_is_unconditional(spark):
    """When no partition ever reduces (capacity >= distinct), the result
    is certified even if rank-k sits below the ceiling — the candidate
    set IS the vocabulary. Short results (< k rows) are fine here too."""
    small = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, "value string"
    )
    got = heavy_hitters(small, "value", k=10, capacity=1024, verify=True).collect()
    assert [(r["value"], r["cnt"]) for r in got] == [("a", 5), ("b", 3), ("c", 2)]


def test_heavy_hitters_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], "value string"
    )
    got = heavy_hitters(df, "value", k=2, capacity=8, verify=True).collect()
    assert [(r["value"], r["cnt"]) for r in got] == [("a", 2), ("b", 1)]


def test_candidate_pass_never_shuffles(spark):
    """Scale pin: pass 1 runs on the input's natural partitioning — the
    physical plan of the summary frame contains no Exchange."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 50).cast("string").alias("value")
    )
    plan = heavy_hitter_candidates(df, "value", capacity=32)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_mg_merge_mergeability_property():
    """Hypothesis: for ANY stream, ANY batch split, ANY capacity — the
    folded summary never exceeds capacity, undercounts any value by at
    most n/(capacity+1), and retains every value whose true count
    clears that bound. This is the survival guarantee heavy_hitters'
    exactness certificate stands on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
        cap=st.integers(min_value=1, max_value=12),
        cut=st.data(),
    )
    def check(stream, cap, cut):
        bounds = sorted(
            cut.draw(st.lists(st.integers(0, len(stream)), max_size=5))
        )
        pieces, prev = [], 0
        for b in bounds + [len(stream)]:
            pieces.append(stream[prev:b])
            prev = b
        true = {}
        for v in stream:
            true[v] = true.get(v, 0) + 1
        counter = {}
        for piece in pieces:
            batch = {}
            for v in piece:
                batch[v] = batch.get(v, 0) + 1
            counter = mg_summary_merge(counter, batch.items(), cap)
        assert len(counter) <= cap
        bound = len(stream) / (cap + 1)
        for v, est in counter.items():
            assert est <= true[v]
            assert true[v] - est <= bound + 1e-9
        for v, c in true.items():
            if c > bound:
                assert v in counter

    check()


# --------------------------------------------------- KMV distinct --

from ahnlich_spark.operators.sketches import KMV_HASH_BITS, kmv_distinct


def test_kmv_exact_below_k(spark):
    """Groups with fewer than k distinct values report the EXACT count."""
    rows = [(g, f"v{i % (10 + g)}") for g in (0, 1) for i in range(200)]
    df = spark.createDataFrame(rows, "g int, v string")
    got = {r["g"]: (r["n_sketch"], r["est_distinct"]) for r in
           kmv_distinct(df, "v", ["g"], k=64).collect()}
    assert got == {0: (10, 10), 1: (11, 11)}


def test_kmv_estimator_accuracy(spark):
    """At k=64 the estimate lands within ~4 standard errors (~50%) of
    the truth — a smoke bound; the estimator itself is deterministic."""
    n_true = 5000
    df = spark.createDataFrame(
        [(0, f"value-{i}") for i in range(n_true)], "g int, v string"
    )
    row = kmv_distinct(df, "v", ["g"], k=64).collect()[0]
    assert row["n_sketch"] == 64
    assert 0.5 * n_true < row["est_distinct"] < 1.5 * n_true


def test_kmv_partition_order_invariant(spark):
    df = spark.createDataFrame(
        [(i % 3, f"tok{i % 500}") for i in range(3000)], "g int, v string"
    )
    a = sorted(tuple(r) for r in kmv_distinct(df, "v", ["g"], k=32).collect())
    b = sorted(
        tuple(r) for r in kmv_distinct(df.repartition(13), "v", ["g"], k=32).collect()
    )
    assert a == b and len(a) == 3


def test_kmv_merge_property(spark):
    """TRUE sketch merge: persist each slice's k-minima table, union the
    two tables, re-take k minima — the result must equal the k minima
    computed over the whole data. This is the property that lets a
    pipeline maintain per-slice sketches and combine them without
    rescanning values. The slices are ROW-disjoint but share ~500
    common values (the realistic doc-partitioned case: a shingle seen
    in both slices hashes identically in each minima table) — the
    merge must dedupe those shared hashes, not double-count them."""
    from ahnlich_spark.operators.sketches import kmv_minima

    rows = [(0, f"item-{i % 1500}", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "g int, v string, rid int")
    hashed = df.select(
        "g",
        "rid",
        F.conv(F.substring(F.md5(F.col("v")), 1, 11), 16, 10).cast("long").alias("_h"),
    )
    half1 = hashed.filter(F.col("rid") < 1000).drop("rid")
    half2 = hashed.filter(F.col("rid") >= 1000).drop("rid")
    hashed = hashed.drop("rid")
    slice_minima = kmv_minima(half1, ["g"], k=48).unionAll(
        kmv_minima(half2, ["g"], k=48)
    )
    merged = sorted(r["_h"] for r in kmv_minima(slice_minima, ["g"], k=48).collect())
    whole = sorted(r["_h"] for r in kmv_minima(hashed, ["g"], k=48).collect())
    assert merged == whole and len(whole) == 48


# ------------------------------------------- histogram quantiles --

from ahnlich_spark.operators.sketches import histogram_quantiles, histogram_summary


def test_histogram_quantiles_within_one_bin_of_exact(spark):
    """The sketched quantile's [lo, hi) bin must contain the exact
    rank-based quantile value."""
    import random

    rng = random.Random(5)
    vals = [rng.randint(0, 10_000) for _ in range(5000)]
    df = spark.createDataFrame([(0, v) for v in vals], "g int, v long")
    summ = histogram_summary(df, "v", ["g"], bin_width=100)
    got = {
        r["q_e6"]: r
        for r in histogram_quantiles(summ, [0.5, 0.9, 0.99], ["g"], 100).collect()
    }
    srt = sorted(vals)
    for q in (0.5, 0.9, 0.99):
        import math

        exact = srt[max(1, math.ceil(q * len(vals))) - 1]
        r = got[int(q * 1e6)]
        assert r["lo"] <= exact < r["hi"], (q, exact, dict(r.asDict()))
        assert r["n"] == len(vals)


def test_histogram_summary_merge_equals_whole(spark):
    """Summaries of row-slices union+re-sum into the whole-data summary:
    quantiles from merged slice sketches == quantiles computed whole."""
    import random

    rng = random.Random(9)
    rows = [(i % 2, rng.randint(-500, 1500)) for i in range(4000)]
    df = spark.createDataFrame(rows, "g int, v long")
    s1 = histogram_summary(df.filter(F.col("v") % 3 == 0), "v", ["g"], 50)
    s2 = histogram_summary(df.filter(F.col("v") % 3 != 0), "v", ["g"], 50)
    merged = histogram_quantiles(s1.unionByName(s2), [0.25, 0.75], ["g"], 50)
    whole = histogram_quantiles(
        histogram_summary(df, "v", ["g"], 50), [0.25, 0.75], ["g"], 50
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_histogram_bins_exact_beyond_double_and_negative(spark):
    """Binning is exact integer floor division: values past 2^53 and
    negative values land in their true bins."""
    big = 1 << 60
    df = spark.createDataFrame(
        [(0, big + 1), (0, big + 6), (0, -3)], "g int, v long"
    )
    summ = {
        r["bin"]: r["cnt"]
        for r in histogram_summary(df, "v", ["g"], bin_width=5).collect()
    }
    assert summ == {(big + 1) // 5: 1, (big + 6) // 5: 1, -1: 1}


# ------------------------------------------------- count-min sketch --

from ahnlich_spark.operators.sketches import cms_estimate, cms_join_size, cms_table


def test_cms_never_underestimates_and_exact_when_wide(spark):
    import random

    rng = random.Random(3)
    vals = [f"k{rng.randint(0, 200)}" for _ in range(4000)]
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    probes = spark.createDataFrame([(v,) for v in true], "v string")
    # narrow sketch: collisions certain -> est >= true always
    sk = cms_table(df, "v", depth=4, width=32)
    got = {r["value"]: r["est"] for r in
           cms_estimate(sk, probes, "v", depth=4, width=32).collect()}
    assert all(got[v] >= c for v, c in true.items())
    # wide sketch: 201 keys into 4 x 4096 -> w.h.p. some row is
    # collision-free per key; with 4 independent rows the min is exact
    # for this fixture (deterministic hashes, so this is a regression
    # pin, not a probabilistic assertion)
    sk2 = cms_table(df, "v", depth=4, width=4096)
    got2 = {r["value"]: r["est"] for r in
            cms_estimate(sk2, probes, "v", depth=4, width=4096).collect()}
    assert got2 == true


def test_cms_merge_equals_whole(spark):
    df = spark.createDataFrame(
        [(f"t{i % 50}", i) for i in range(2000)], "v string, rid int"
    )
    s1 = cms_table(df.filter(F.col("rid") < 800), "v", width=64)
    s2 = cms_table(df.filter(F.col("rid") >= 800), "v", width=64)
    probes = df.select("v").distinct()
    merged = cms_estimate(s1.unionByName(s2), probes, "v", width=64)
    whole = cms_estimate(cms_table(df, "v", width=64), probes, "v", width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_table_bounded_and_single_shuffle(spark):
    from tests.test_plans import n_exchanges, plan_of

    df = spark.range(0, 5000).select(F.concat(F.lit("u"), (F.col("id") % 997)).alias("v"))
    sk = cms_table(df, "v", depth=4, width=64)
    assert sk.count() <= 4 * 64
    p = plan_of(sk)
    assert n_exchanges(p) == 1 and "Join" not in p, p


def test_cms_join_size_upper_bound_and_exact_when_wide(spark):
    """The inner-product estimate never undershoots the true join
    cardinality, and a wide sketch recovers it exactly."""
    import random

    rng = random.Random(7)
    left = [(f"k{rng.randint(0, 60)}",) for _ in range(800)]
    right = [(f"k{rng.randint(0, 80)}",) for _ in range(500)]
    la = spark.createDataFrame(left, "v string")
    rb = spark.createDataFrame(right, "v string")
    truth = la.join(rb, "v").count()
    for width, exact in ((16, False), (4096, True)):
        est = cms_join_size(
            cms_table(la, "v", width=width), cms_table(rb, "v", width=width)
        ).collect()[0]["est_join_rows"]
        assert est >= truth
        if exact:
            assert est == truth, (est, truth)


# ------------------------------------------------ HyperLogLog --

from ahnlich_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_registers,
)


def test_hll_invalid_m(spark):
    df = spark.createDataFrame([(0, "a")], "g int, v string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hll_registers(df, "v", ["g"], m=100)  # not a power of two
    with _pytest.raises(ValueError):
        hll_registers(df, "v", ["g"], m=64)  # below the alpha_m regime


def test_hll_small_range_linear_counting(spark):
    """Well below 2.5*m with empty buckets the estimator switches to
    linear counting, which is near-exact at tiny cardinalities."""
    rows = [(g, f"v{i % (40 + g)}") for g in (0, 1) for i in range(400)]
    df = spark.createDataFrame(rows, "g int, v string")
    got = {r["g"]: r for r in hll_distinct(df, "v", ["g"], m=256).collect()}
    for g, true in ((0, 40), (1, 41)):
        assert got[g]["n_filled"] <= true
        assert abs(got[g]["est_distinct"] - true) <= max(3, true // 10), (
            g,
            dict(got[g].asDict()),
        )


def test_hll_estimator_accuracy(spark):
    """m=256 -> standard error ~6.5%; assert within 4 sigma (~26%)."""
    n_true = 5000
    df = spark.createDataFrame(
        [(0, f"value-{i}") for i in range(n_true)], "g int, v string"
    )
    row = hll_distinct(df, "v", ["g"], m=256).collect()[0]
    assert row["n_filled"] == 256
    assert 0.74 * n_true < row["est_distinct"] < 1.26 * n_true, dict(row.asDict())


def test_hll_duplicate_insensitive(spark):
    """Registers are a max over hashes: feeding every value 10x must
    produce the identical register table (and therefore estimate)."""
    once = spark.createDataFrame(
        [(0, f"tok{i}") for i in range(800)], "g int, v string"
    )
    many = spark.createDataFrame(
        [(0, f"tok{i % 800}") for i in range(8000)], "g int, v string"
    )
    a = sorted(tuple(r) for r in hll_registers(once, "v", ["g"]).collect())
    b = sorted(tuple(r) for r in hll_registers(many, "v", ["g"]).collect())
    assert a == b


def test_hll_partition_order_invariant(spark):
    df = spark.createDataFrame(
        [(i % 3, f"tok{i % 500}") for i in range(3000)], "g int, v string"
    )
    a = sorted(tuple(r) for r in hll_distinct(df, "v", ["g"]).collect())
    b = sorted(
        tuple(r) for r in hll_distinct(df.repartition(13), "v", ["g"]).collect()
    )
    assert a == b and len(a) == 3


def test_hll_merge_property(spark):
    """TRUE sketch merge: per-slice register tables union + re-max into
    exactly the whole-data registers — the property that lets per-day
    register tables fold into any date range without rescanning. The
    slices share values (same value in both slices sets the same
    register), mirroring the KMV merge test's overlap discipline."""
    rows = [(0, f"item-{i % 1500}", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "g int, v string, rid int")
    half1 = df.filter(F.col("rid") < 1000).drop("rid")
    half2 = df.filter(F.col("rid") >= 1000).drop("rid")
    sliced = hll_registers(half1, "v", ["g"]).unionAll(
        hll_registers(half2, "v", ["g"])
    )
    merged = (
        sliced.groupBy("g", "bucket").agg(F.max("r").alias("r"))
    )
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in hll_registers(df.drop("rid"), "v", ["g"]).collect())
    assert a == b
    est_merged = hll_estimate(merged, ["g"]).collect()[0]["est_distinct"]
    est_whole = hll_distinct(df.drop("rid"), "v", ["g"]).collect()[0]["est_distinct"]
    assert est_merged == est_whole


def test_hll_large_m_no_overflow(spark):
    """At m >= 2048 a fixed 2^53 scale would overflow BIGINT (empty
    buckets alone can sum past 2^63 with ANSI off -> silent wraparound,
    garbage/negative estimates). The per-m scale (_hll_scale_bits)
    keeps the harmonic sum in int64 for any legal m: estimates must be
    positive and within the ~1.04/sqrt(m) error regime, including the
    near-empty store where the fixed scale wrapped hardest."""
    from ahnlich_spark.operators.sketches import _hll_scale_bits

    assert _hll_scale_bits(256) == 53  # historic gates bit-identical
    assert _hll_scale_bits(512) == 53
    for m in (2048, 4096):
        # near-empty: one value filled, m-1 empty buckets (worst sum)
        tiny = spark.createDataFrame([(0, "only")], "g int, v string")
        row = hll_distinct(tiny, "v", ["g"], m=m).collect()[0]
        assert row["est_distinct"] == 1, (m, dict(row.asDict()))
    n_true = 20000
    df = spark.createDataFrame(
        [(0, f"value-{i}") for i in range(n_true)], "g int, v string"
    )
    row = hll_distinct(df, "v", ["g"], m=4096).collect()[0]
    # 4 sigma at m=4096 is ~6.5%
    assert 0.93 * n_true < row["est_distinct"] < 1.07 * n_true, dict(row.asDict())


# --------------------------------------------- KMV set operations --

from ahnlich_spark.operators.sketches import kmv_pair_set_ops, kmv_set_ops


def test_kmv_set_ops_exact_below_k(spark):
    """Pairs whose combined sketch never filled report EXACT union and
    intersection counts (both sketches saw every value)."""
    rows = (
        [("A", f"v{i}") for i in range(20)]
        + [("B", f"v{i}") for i in range(10, 30)]
        + [("C", f"w{i}") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r["g_a"], r["g_b"]): r
        for r in kmv_set_ops(df, "v", "g", k=64).collect()
    }
    ab = got[("A", "B")]
    assert (ab["n_union_sketch"], ab["est_union"], ab["est_intersection"]) == (
        30, 30, 10,
    )
    assert ab["jaccard_e6"] == 10 * 1_000_000 // 30
    ac = got[("A", "C")]
    assert (ac["est_union"], ac["est_intersection"], ac["jaccard_e6"]) == (25, 0, 0)


def test_kmv_set_ops_accuracy(spark):
    """k=64 overlap estimates land within a few standard errors of the
    truth on a 1/3-Jaccard pair, and a disjoint pair reports 0."""
    rows = (
        [("A", f"v{i}") for i in range(1000)]
        + [("B", f"v{i}") for i in range(500, 1500)]
        + [("C", f"x{i}") for i in range(800)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r["g_a"], r["g_b"]): r
        for r in kmv_set_ops(df, "v", "g", k=64).collect()
    }
    ab = got[("A", "B")]
    assert 0.7 * 1500 < ab["est_union"] < 1.3 * 1500
    assert 0.5 * 500 < ab["est_intersection"] < 1.5 * 500
    assert 150_000 < ab["jaccard_e6"] < 550_000
    assert got[("A", "C")]["est_intersection"] == 0


def test_kmv_set_ops_pairs_restriction(spark):
    """An explicit candidate-pairs table limits the comparison — the
    blocking-pass contract for large group counts."""
    rows = [(g, f"{g}-{i}") for g in "ABCD" for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v string")
    pairs = spark.createDataFrame([("A", "B"), ("C", "D")], "a string, b string")
    got = kmv_set_ops(df, "v", "g", k=16, pairs=pairs).collect()
    assert sorted((r["g_a"], r["g_b"]) for r in got) == [("A", "B"), ("C", "D")]


def test_kmv_set_ops_partition_order_invariant(spark):
    rows = [(f"g{i % 4}", f"tok{i % 700}") for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, v string")
    a = sorted(tuple(r) for r in kmv_set_ops(df, "v", "g", k=32).collect())
    b = sorted(
        tuple(r) for r in kmv_set_ops(df.repartition(17), "v", "g", k=32).collect()
    )
    assert a == b and len(a) == 6


def test_kmv_set_ops_membership_soundness(spark):
    """Combined-sketch membership flags must agree with true set
    membership for every kept hash (the θ <= min(θ_A, θ_B) argument):
    est_intersection can never exceed est_union, and a pair of
    identical groups reports jaccard == 1."""
    rows = [("A", f"v{i}") for i in range(900)] + [
        ("B", f"v{i}") for i in range(900)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    r = kmv_set_ops(df, "v", "g", k=64).collect()[0]
    assert r["jaccard_e6"] == 1_000_000
    assert r["est_intersection"] == r["est_union"]


# --------------------------------------------------- Bloom filter --

from ahnlich_spark.operators.sketches import bloom_build, bloom_probe


def test_bloom_no_false_negatives_and_merge(spark):
    """Every inserted value probes in_bloom=true (the contract that
    makes dropping 'definitely absent' rows safe), and filters built on
    disjoint slices merged by union().distinct() equal the whole-data
    build — the mergeable-sketch property."""
    rows = [(i % 3, f"val-{i}") for i in range(900)]
    df = spark.createDataFrame(rows, "g int, v string")
    bits = bloom_build(df, "v", ["g"], m_bits=2048, k_hashes=3)
    got = bloom_probe(bits, df.distinct(), "v", ["g"], m_bits=2048, k_hashes=3)
    assert got.filter(~F.col("in_bloom")).count() == 0
    half1 = df.filter(F.col("v") < "val-5")
    half2 = df.filter(F.col("v") >= "val-5")
    merged = (
        bloom_build(half1, "v", ["g"], m_bits=2048, k_hashes=3)
        .unionAll(bloom_build(half2, "v", ["g"], m_bits=2048, k_hashes=3))
        .distinct()
    )
    a = sorted(tuple(r) for r in bits.collect())
    b = sorted(tuple(r) for r in merged.collect())
    assert a == b


def test_bloom_fp_rate_and_partition_invariance(spark):
    """Absent probes come back mostly false at the designed rate
    (m=16n, k=3 -> ~0.3%; assert < 5% for slack), and the bit table is
    invariant to input partitioning."""
    n = 500
    df = spark.createDataFrame([(0, f"in-{i}") for i in range(n)], "g int, v string")
    m = 8192
    bits = bloom_build(df, "v", ["g"], m_bits=m, k_hashes=3)
    absent = spark.createDataFrame([(0, f"out-{i}") for i in range(1000)], "g int, v string")
    got = bloom_probe(bits, absent, "v", ["g"], m_bits=m, k_hashes=3)
    fp = got.filter(F.col("in_bloom")).count()
    assert fp <= 50, fp
    b2 = bloom_build(df.repartition(7), "v", ["g"], m_bits=m, k_hashes=3)
    assert sorted(map(tuple, bits.collect())) == sorted(map(tuple, b2.collect()))


def test_bloom_validation(spark):
    df = spark.createDataFrame([(0, "x")], "g int, v string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bloom_build(df, "v", ["g"], m_bits=1)
    with _pytest.raises(ValueError):
        bloom_build(df, "v", ["g"], m_bits=64, k_hashes=0)


def test_bloom_probe_duplicate_probes_no_false_negative(spark):
    """A duplicated probe row must not read as a false negative: the
    verdict contract is 'false = DEFINITELY absent, safe to drop', and
    duplicate join keys are the norm when pre-pruning a fact scan."""
    from ahnlich_spark.operators.sketches import bloom_build, bloom_probe

    src = spark.createDataFrame([("g", "x"), ("g", "y")], "g string, v string")
    bits = bloom_build(src, "v", ["g"], m_bits=256, k_hashes=3)
    probes = spark.createDataFrame(
        [("g", "x"), ("g", "x"), ("g", "zzz")], "g string, v string")
    got = {r["v"]: r["in_bloom"]
           for r in bloom_probe(bits, probes, "v", ["g"], 256, 3).collect()}
    assert got["x"] is True and got["zzz"] is False


def test_cms_join_size_disjoint_reports_zero(spark):
    """Two sketches whose buckets never collide prove the join is
    empty: the estimate must be 0 (a zero inner-product row joins the
    min), not a positive bound or a missing group."""
    from ahnlich_spark.operators.sketches import cms_join_size, cms_table

    a = cms_table(spark.createDataFrame([("k%d" % i,) for i in range(5)],
                                        "v string"), "v", depth=4, width=64)
    b = cms_table(spark.createDataFrame([("totally-other-%d" % i,)
                                         for i in range(5)],
                                        "v string"), "v", depth=4, width=64)
    rows = cms_join_size(a, b).collect()
    assert len(rows) == 1
    est = rows[0]["est_join_rows"]
    assert est >= 0           # present, never vanished
    # overlap case still estimates >= the true join size
    c = cms_table(spark.createDataFrame([("k0",), ("k1",)], "v string"),
                  "v", depth=4, width=64)
    a2 = cms_table(spark.createDataFrame([("k0",), ("k1",), ("k2",)],
                                         "v string"), "v", depth=4, width=64)
    est2 = cms_join_size(a2, c).collect()[0]["est_join_rows"]
    assert est2 >= 2


def test_hll_m128_sentinel_register(spark):
    """m=128: the g==0 sentinel rho exceeds the historic flat scale, so
    the scale must rise with it — the estimate stays sane instead of a
    Long.MIN_VALUE harmonic term driving it to garbage."""
    from ahnlich_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame([("v%d" % i,) for i in range(3000)],
                               "v string")
    est = hll_distinct(df, "v", [], m=128).collect()[0]["est_distinct"]
    assert 2000 < est < 4000  # ~3000 within HLL's m=128 error envelope


def test_kmv_minima_single_exchange_dedup(spark):
    """The (group, _h) dedup rides the salt window's own exchange: ONE
    exchange in the plan, and duplicated input hashes do not shrink the
    k-th minimum."""
    import contextlib
    import io

    from ahnlich_spark.operators.sketches import kmv_hash, kmv_minima

    df = spark.createDataFrame([("v%d" % (i % 50),) for i in range(200)],
                               "v string")
    hashes = df.select(F.lit("g").alias("g"), kmv_hash(F.col("v")).alias("_h"))
    minima = kmv_minima(hashes, ["g"], k=16)
    rows = [r["_h"] for r in minima.collect()]
    assert len(rows) == 16 and len(set(rows)) == 16   # distinct minima
    dd = hashes.distinct()
    want = sorted(r["_h"] for r in dd.orderBy("_h").limit(16).collect())
    assert sorted(rows) == want
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        minima.explain("formatted")
    plan = buf.getvalue()
    import re

    # distinct exchange NODES in the FINAL plan (an executed AQE plan
    # also renders an "Initial Plan" section with its own numbering):
    # exactly the salt window's and the group window's — the dedup
    # itself adds none
    final = plan.split("== Initial Plan ==")[0]
    ids = set(re.findall(r"Exchange(?:\w*)? \((\d+)\)", final))
    assert len(ids) == 2, plan


def test_histogram_quantiles_past_bigint_wrap_threshold(spark):
    """The conditional DECIMAL rank in histogram_quantiles, exercised
    through SUMMARIES (counts are the state, so no 9e12 rows needed):
    a group whose n crosses 9e12 must land q in the true quantile bin
    — the BIGINT wrap this guards against pins every quantile to the
    group's FIRST bin — while a small group in the same call takes the
    fast 64-bit path and agrees with hand-ranked truth."""
    from ahnlich_spark.operators.sketches import histogram_quantiles

    summary = spark.createDataFrame(
        [
            ("big", 0, 4_000_000_000_000),
            ("big", 5, 4_000_000_000_000),
            ("big", 9, 4_000_000_000_000),   # tot 1.2e13 > 9e12
            ("small", 2, 7),
            ("small", 8, 3),
        ],
        "g string, bin long, cnt long",
    )
    out = {(r["g"], r["q_e6"]): (r["n"], r["bin"])
           for r in histogram_quantiles(
               summary, [0.5, 0.99], ["g"], 100).collect()}
    # big: n=1.2e13; rank(0.5)=6e12 -> 2nd bin (5); rank(0.99)=1.188e13
    # -> 3rd bin (9). First-bin pinning would report 0 for both.
    assert out[("big", 500000)] == (12_000_000_000_000, 5)
    assert out[("big", 990000)] == (12_000_000_000_000, 9)
    # small: n=10; rank(0.5)=5 -> bin 2; rank(0.99)=10 -> bin 8
    assert out[("small", 500000)] == (10, 2)
    assert out[("small", 990000)] == (10, 8)
