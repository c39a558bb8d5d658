"""Deterministic sampling, sequence packing, decontamination, repetition."""

from pyspark.sql import functions as F

from ahnlich_spark.operators.contamination import contaminated_docs
from ahnlich_spark.operators.sampling import (
    hash_sample,
    pack_sequences,
    stratified_sample,
)
from ahnlich_spark.functions.text import repetition_table


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )


def test_hash_sample_rate_and_determinism(spark):
    df = _docs(spark)
    a = {r.doc_id for r in hash_sample(df, 0.3, salt="s").collect()}
    b = {r.doc_id for r in hash_sample(df, 0.3, salt="s").collect()}
    assert a == b  # pure function of (id, salt, rate)
    assert 0.15 < len(a) / 400 < 0.45
    # different salt draws an independent sample
    c = {r.doc_id for r in hash_sample(df, 0.3, salt="t").collect()}
    assert c != a


def test_hash_sample_nested_across_rates(spark):
    df = _docs(spark)
    small = {r.doc_id for r in hash_sample(df, 0.1, salt="s").collect()}
    big = {r.doc_id for r in hash_sample(df, 0.5, salt="s").collect()}
    assert small <= big


def test_stratified_sample_rates_per_stratum(spark):
    df = _docs(spark)
    out = stratified_sample(
        df, {"0": 1.0, "1": 0.0}, strata_col="lang", default_rate=0.5, salt="x"
    )
    per = {r.lang: r.c for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert per.get("0") == 100  # rate 1.0 keeps everything
    assert "1" not in per  # rate 0.0 keeps nothing
    assert 20 < per.get("2", 0) < 80 and 20 < per.get("3", 0) < 80


def test_pack_sequences_budget_property(spark):
    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("s").alias("source"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
    )
    out = pack_sequences(df, budget=10, token_col="n_tokens").collect()
    # with max_doc=7 <= budget: batch ids are contiguous from 0 and
    # every batch total lies within budget +/- (max_doc - 1)
    by_batch = {}
    for r in out:
        by_batch.setdefault(r.batch_id, []).append(r)
    assert sorted(by_batch) == list(range(len(by_batch)))
    totals = {b: sum(r.n_tok for r in rows) for b, rows in by_batch.items()}
    last = max(by_batch)
    for b, tot in totals.items():
        if b != last:
            assert tot >= 10 - (7 - 1)
        assert tot <= 10 + 7 - 1
    # boundary law: a doc starts a new batch iff its preceding cumsum
    # crossed a budget multiple
    rows = sorted(out, key=lambda r: r.doc_id)
    before = 0
    for r in rows:
        assert r.batch_id == before // 10
        before += r.n_tok
    # seq_in_batch is 1..k in doc order
    for rows in by_batch.values():
        rows.sort(key=lambda r: r.doc_id)
        assert [r.seq_in_batch for r in rows] == list(range(1, len(rows) + 1))


def test_contaminated_docs_exact_hits(spark):
    bench = spark.createDataFrame(
        [(100, "a b c d e f g h")], "doc_id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "x a b c d e f g h y"),  # contains two 8-grams that hit once
            (2, "totally different words here with no overlap at all"),
            (3, "a b c d e f g h"),  # exact benchmark text
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.n_shared_grams for r in contaminated_docs(corpus, bench, n=8).collect()}
    assert got == {1: 1, 3: 1}  # the shared gram is 'a b c d e f g h'


def test_repetition_table_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "u v w x"), (3, "")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in repetition_table(df, n=2).collect()}
    # doc 1 grams: [a b, b a, a b, b a, a b] -> 5 total, 2 distinct, top 3
    assert (got[1].n_grams, got[1].n_distinct, got[1].top_gram_count) == (5, 2, 3)
    assert got[1].dup_ratio_e4 == (5 - 2) * 10000 // 5
    assert (got[2].n_grams, got[2].n_distinct, got[2].top_gram_count) == (3, 3, 1)
    assert got[2].dup_ratio_e4 == 0
    # empty doc shingles to one empty gram
    assert (got[3].n_grams, got[3].n_distinct) == (1, 1)


def test_train_test_split_disjoint_exhaustive_nested(spark):
    from ahnlich_spark.operators.sampling import train_test_split

    docs = spark.range(5000).selectExpr("id AS doc_id")
    s5 = train_test_split(docs, test_rate=0.05, salt="s")
    counts = {r["split"]: r["n"] for r in
              s5.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5000  # exhaustive, disjoint
    assert 0 < counts.get("test", 0) < counts["train"]
    # determinism
    a = {r["doc_id"] for r in s5.filter("split = 'test'").collect()}
    b = {r["doc_id"] for r in
         train_test_split(docs, 0.05, salt="s").filter("split='test'").collect()}
    assert a == b
    # nesting: the 5% test set is a subset of the 10% one
    t10 = {r["doc_id"] for r in
           train_test_split(docs, 0.10, salt="s").filter("split='test'").collect()}
    assert a <= t10 and len(t10) > len(a)


def test_exact_ntile_matches_window_ntile(spark):
    """The distributed formulation must equal NTILE(n) OVER (ORDER BY
    value, id) exactly — including tie splitting and the base/remainder
    group sizes — on a fixture with heavy ties and n not divisible by
    the tile count."""
    import random

    from ahnlich_spark.operators.sampling import exact_ntile

    rng = random.Random(11)
    rows = [(i, rng.randint(0, 7)) for i in range(103)]  # 103 % 10 = 3
    df = spark.createDataFrame(rows, "doc_id long, v long")
    got = {r["doc_id"]: r["tile"]
           for r in exact_ntile(df, 10, "v", "doc_id").collect()}
    want = {
        r["doc_id"]: r["t"]
        for r in df.selectExpr(
            "doc_id", "ntile(10) OVER (ORDER BY v, doc_id) AS t"
        ).collect()
    }
    assert got == want
    # plan: the BIG side's window partitions by value (distributed);
    # the only single-partition exchange feeds the tiny per-value
    # count table (<= score cardinality rows), never the data table
    plan = exact_ntile(df, 10, "v", "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "hashpartitioning(v#" in plan, plan


def test_exact_ntile_fewer_rows_than_tiles(spark):
    from ahnlich_spark.operators.sampling import exact_ntile

    df = spark.createDataFrame([(1, 5), (2, 5), (3, 1)], "doc_id long, v long")
    got = {r["doc_id"]: r["tile"] for r in exact_ntile(df, 10, "v", "doc_id").collect()}
    assert got == {3: 1, 1: 2, 2: 3}


def test_exact_ntile_keeps_null_values(spark):
    """NULL-valued rows must survive the tiling (an equi-join would
    silently drop them while n counted them) and rank FIRST, exactly
    like NTILE(n) OVER (ORDER BY value ASC NULLS FIRST, id)."""
    from ahnlich_spark.operators.sampling import exact_ntile

    rows = [(i, None if i % 5 == 0 else i % 3) for i in range(23)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    out = exact_ntile(df, 4, "v", "doc_id").collect()
    assert len(out) == 23, "no row may vanish"
    got = {r["doc_id"]: r["tile"] for r in out}
    want = {
        r["doc_id"]: r["t"]
        for r in df.selectExpr(
            "doc_id",
            "ntile(4) OVER (ORDER BY v ASC NULLS FIRST, doc_id) AS t",
        ).collect()
    }
    assert got == want


def test_rebalance_to_mixture_binding_group_and_shares(spark):
    """The binding group survives whole; others thin toward the target
    ratio; absent target groups raise; non-target groups are dropped."""
    import pytest

    from ahnlich_spark.operators.sampling import rebalance_to_mixture

    rows = (
        [(i, "a", 10) for i in range(100)]          # weight 1000
        + [(1000 + i, "b", 10) for i in range(900)] # weight 9000
        + [(5000 + i, "junk", 10) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = rebalance_to_mixture(
        df, {"a": 1, "b": 1}, weight_col="n_chars"
    ).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in out}
    assert set(got) == {"a", "b"}, got          # junk dropped
    assert got["a"] == 100                       # binding group intact
    # b thinned to ~ a's weight: hash variance around 100 rows
    assert 60 <= got["b"] <= 140, got
    # deterministic: the same call returns identical rows
    ids1 = sorted(r["doc_id"] for r in rebalance_to_mixture(
        df, {"a": 1, "b": 1}, weight_col="n_chars").collect())
    ids2 = sorted(r["doc_id"] for r in rebalance_to_mixture(
        df, {"a": 1, "b": 1}, weight_col="n_chars").collect())
    assert ids1 == ids2
    with pytest.raises(ValueError, match="no available data"):
        rebalance_to_mixture(df, {"a": 1, "nope": 1}, weight_col="n_chars")
    with pytest.raises(ValueError, match="positive"):
        rebalance_to_mixture(df, {"a": 0}, weight_col="n_chars")


def test_mixture_thresholds_binding_group_whole_on_nondivisible():
    """The binding group's threshold must be EXACTLY _SCALE even when
    floor(a*W/w)*w does not divide back cleanly — the 'kept whole'
    contract cannot leak rows to floor-division remainders."""
    from ahnlich_spark.operators.sampling import _SCALE, mixture_thresholds

    # a*W/w_a = 10*10/7 -> T = 14; old floor formula gave 980000
    thr = mixture_thresholds({"a": 10, "b": 5000}, {"a": 7, "b": 3})
    assert thr["a"] == _SCALE
    assert thr["b"] < _SCALE
    # divisible case unchanged; ALL groups binding when symmetric
    thr = mixture_thresholds({"a": 100, "b": 100}, {"a": 1, "b": 1})
    assert thr == {"a": _SCALE, "b": _SCALE}
    # non-binding thresholds keep proportionality: b thinned toward
    # a's achievable total
    thr = mixture_thresholds({"a": 1000, "b": 9000}, {"a": 1, "b": 1})
    assert thr["a"] == _SCALE and abs(thr["b"] - _SCALE * 1000 / 9000) <= 1


# ------------------------------------------- semantic contamination --

def test_semantic_contaminated_hits_and_scope(spark):
    from ahnlich_spark.operators.contamination import semantic_contaminated

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),      # exact match of bench 100
            (2, [0.9, 0.1, 0.0]),      # close to bench 100
            (3, [0.0, 0.0, 1.0]),      # orthogonal to all bench
            (4, [0.7, 0.7, 0.0]),      # close to 100 AND 101
        ],
        "id long, key array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        "id long, key array<double>",
    )
    got = {
        r["id"]: (r["n_hits"], round(r["max_cos"], 6))
        for r in semantic_contaminated(corpus, bench, threshold=0.6).collect()
    }
    assert set(got) == {1, 2, 4}          # 3 is clean and absent
    assert got[1] == (1, 1.0)
    assert got[2][0] == 1
    assert got[4][0] == 2                 # hit both benchmark vectors


def test_semantic_contaminated_null_and_ragged_vectors(spark):
    """NULL vectors on either side are not hits (the old BNLJ plan
    evaluated a null cosine and emitted nothing — the dense-GEMM path
    must not crash on them); ragged lengths raise a clear ValueError
    instead of an opaque executor numpy failure."""
    import pytest

    from ahnlich_spark.operators.contamination import semantic_contaminated

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, None), (3, [0.9, 0.1, 0.0])],
        "id long, key array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, None)],
        "id long, key array<double>",
    )
    got = {r["id"] for r in
           semantic_contaminated(corpus, bench, threshold=0.6).collect()}
    assert got == {1, 3}  # the null corpus row is silently not a hit
    # ragged benchmark: caught at the driver with a clear message
    ragged_bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [1.0, 0.0])],
        "id long, key array<double>",
    )
    with pytest.raises(ValueError, match="share one dimension"):
        semantic_contaminated(corpus, ragged_bench, threshold=0.6)
    # ragged corpus: caught in the scan with a clear message
    ragged_corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0])],
        "id long, key array<double>",
    )
    with pytest.raises(Exception, match="benchmark\\s+dimension"):
        semantic_contaminated(ragged_corpus, bench, threshold=0.6).collect()


def test_semantic_contaminated_zero_shuffle_and_exact(spark):
    """The GEMM-prefilter path is ONE mapInPandas over the corpus —
    no join, no exchange: each row's (n_hits, max_cos) completes inside
    its own scan partition. Values must equal the expression-fold
    (broadcast-nested-loop) formulation bit-for-bit, because only
    prefiltering moved to GEMM — the decision and the reported cosine
    are the same sequential fold."""
    from pyspark.sql import functions as FF

    from ahnlich_spark.functions import similarity as S
    from ahnlich_spark.operators.contamination import semantic_contaminated
    from tests.test_plans import plan_of

    corpus = spark.createDataFrame(
        [(i, [float(i % 7) + 0.25, 1.0, float(i % 3)]) for i in range(80)]
        + [(999, [0.0, 0.0, 0.0])],  # zero vector: NaN cosine, never a hit
        "id long, key array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.5, 0.0]), (101, [0.2, 1.0, 0.9]), (102, [0.0, 0.0, 0.0])],
        "id long, key array<double>",
    )
    got = semantic_contaminated(corpus, bench, threshold=0.9)
    plan = plan_of(got)
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    # reference: the old expression-fold BNLJ formulation (which, under
    # ANSI, cannot even evaluate the zero vectors — exclude them there;
    # the mapInPandas path must drop them, pinned by `999 not in g`)
    b = bench.filter(FF.col("id") != 102).select(
        FF.col("id").alias("_bid"), FF.col("key").alias("_bvec")
    )
    cos = S.cosine_similarity(FF.col("key"), FF.col("_bvec"), "double")
    want = (
        corpus.filter(FF.col("id") != 999).join(FF.broadcast(b), cos >= FF.lit(0.9))
        .select("id", cos.alias("_cos"))
        .groupBy("id")
        .agg(FF.count(FF.lit(1)).alias("n_hits"), FF.max("_cos").alias("max_cos"))
    )
    g = {r["id"]: (r["n_hits"], r["max_cos"]) for r in got.collect()}
    w = {r["id"]: (r["n_hits"], r["max_cos"]) for r in want.collect()}
    assert g == w and len(g) > 0 and 999 not in g


def test_group_keyed_split_never_straddles(spark):
    """Splitting on a GROUP key (near-dup cluster id) puts every member
    of a group on the same side — the leakage-safety property the
    split_leakage_safe gate composes with real LSH clusters."""
    from ahnlich_spark.operators.sampling import train_test_split

    df = spark.createDataFrame(
        [(i, i // 3) for i in range(300)], "doc_id long, cluster_id long"
    )
    out = train_test_split(df, test_rate=0.3, id_col="cluster_id", salt="leak")
    per_cluster = out.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("ns")
    ).collect()
    assert all(r["ns"] == 1 for r in per_cluster)
    assert {r["split"] for r in out.select("split").distinct().collect()} == {
        "train",
        "test",
    }


def test_exact_ntile_grouped_matches_window_ntile(spark):
    """Per-group tiling == NTILE(n) OVER (PARTITION BY g ORDER BY v, id),
    including uneven group sizes, ties, NULL values and a NULL group."""
    import random

    from ahnlich_spark.operators.sampling import exact_ntile

    rng = random.Random(13)
    rows = [
        (i, ["en", "fr", "de", None][i % 4] if i % 17 else None,
         rng.randint(0, 30) if i % 11 else None)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, v long")
    got = {
        (r["doc_id"]): r["tile"]
        for r in exact_ntile(df, 4, "v", "doc_id", group_cols=["g"]).collect()
    }
    want = {
        r["doc_id"]: r["t"]
        for r in df.selectExpr(
            "doc_id", "ntile(4) OVER (PARTITION BY g ORDER BY v, doc_id) AS t"
        ).collect()
    }
    assert got == want and len(got) == 500


# ---------------------------------------------------- epoch upsampling --


def test_epoch_factors_integer_plan():
    """The pure planner: upsampled groups get whole + fractional
    copies, clamped groups exactly max_epochs with no fraction,
    under-share groups degenerate to a plain downsample."""
    from ahnlich_spark.operators.sampling import epoch_factors

    avail = {"a": 25, "b": 25, "c": 25, "d": 25}
    weights = {"a": 6, "b": 2, "c": 1, "d": 1}
    # total=100, W=10: f_a=2.4, f_b=0.8, f_c=f_d=0.4
    f = epoch_factors(avail, weights, 100, max_epochs=4)
    assert f == {"a": (2, 400_000), "b": (0, 800_000),
                 "c": (0, 400_000), "d": (0, 400_000)}
    f2 = epoch_factors(avail, weights, 100, max_epochs=2)
    assert f2["a"] == (2, 0)                     # clamped: no fraction


def test_upsample_to_mixture_deterministic_epochs(spark):
    """Emission matches the plan exactly: every kept row appears with
    contiguous epochs 0..c-1, the per-group copy counts equal the
    integer plan replayed per id, and the op is deterministic."""
    from ahnlich_spark.operators.sampling import (
        _SCALE, _hash_unit, epoch_factors, upsample_to_mixture)

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    weights = {"g0": 5, "g1": 1, "g2": 1}        # f: g0=3*60/(7*20)... 
    out = upsample_to_mixture(df, weights, max_epochs=3, salt="t")
    rows = [(r["doc_id"], r["source"], r["epoch"]) for r in out.collect()]
    again = [(r["doc_id"], r["source"], r["epoch"])
             for r in upsample_to_mixture(
                 df, weights, max_epochs=3, salt="t").collect()]
    assert sorted(rows) == sorted(again)
    factors = epoch_factors({"g0": 20, "g1": 20, "g2": 20}, weights,
                            60, 3)
    hashes = {
        r["doc_id"]: r["h"] for r in df.select(
            "doc_id", _hash_unit(F.col("doc_id"), "t").alias("h")).collect()
    }
    by_doc = {}
    for d, g, e in rows:
        by_doc.setdefault((d, g), []).append(e)
    for i in range(60):
        g = f"g{i % 3}"
        nf, thr = factors[g]
        want = nf + (1 if hashes[i] < thr else 0)
        got = sorted(by_doc.get((i, g), []))
        assert got == list(range(want)), (i, g, want, got)


def test_upsample_validations(spark):
    import pytest

    from ahnlich_spark.operators.sampling import upsample_to_mixture

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="at least one"):
        upsample_to_mixture(df, {})
    with pytest.raises(ValueError, match="positive"):
        upsample_to_mixture(df, {"a": 0})
    with pytest.raises(ValueError, match="max_epochs"):
        upsample_to_mixture(df, {"a": 1}, max_epochs=0)
    with pytest.raises(ValueError, match="no available data"):
        upsample_to_mixture(df, {"a": 1, "ghost": 1})


def test_epoch_factors_share_identity():
    """Property of the integer plan (pure function, hypothesis-driven):
    each unclamped group's expected emitted weight a_g*(n_full +
    thr/SCALE) reproduces its exact target share total*w_g/W to within
    the 1/SCALE quantization, clamped groups emit exactly
    max_epochs*a_g, and factors are monotone in the group's weight."""
    from hypothesis import given, settings, strategies as st

    from ahnlich_spark.operators.sampling import _SCALE, epoch_factors

    @settings(max_examples=200, deadline=None)
    @given(
        avail=st.lists(st.integers(min_value=1, max_value=10**6),
                       min_size=1, max_size=6),
        weights=st.data(),
        total=st.integers(min_value=1, max_value=10**7),
        max_epochs=st.integers(min_value=1, max_value=8),
    )
    def check(avail, weights, total, max_epochs):
        groups = {f"g{i}": a for i, a in enumerate(avail)}
        w = {g: weights.draw(st.integers(min_value=1, max_value=100),
                             label=g) for g in groups}
        W = sum(w.values())
        f = epoch_factors(groups, w, total, max_epochs)
        for g, (nf, thr) in f.items():
            assert 0 <= thr < _SCALE and 0 <= nf <= max_epochs
            ideal_num, ideal_den = total * w[g], W * groups[g]
            if nf == max_epochs:
                assert thr == 0
                assert ideal_num >= max_epochs * ideal_den
            else:
                # nf + thr/SCALE == floor(ideal * SCALE) / SCALE
                scaled = ideal_num * _SCALE // ideal_den
                assert nf * _SCALE + thr == scaled

    check()


def test_integer_root_and_temperature_weights():
    """integer_root is the exact floor q-th root (property-checked:
    r^q <= x < (r+1)^q), temperature_weights reproduces natural
    proportions at alpha=1, compresses ratios at alpha=1/2 (the
    flattening that IS temperature sampling), floors at 1, and
    validates alpha."""
    import pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ahnlich_spark.operators.sampling import (
        integer_root,
        temperature_weights,
    )

    @settings(max_examples=300, deadline=None)
    @given(x=st.integers(min_value=0, max_value=10**30),
           q=st.integers(min_value=1, max_value=6))
    def check(x, q):
        r = integer_root(x, q)
        assert r ** q <= x < (r + 1) ** q

    check()
    assert integer_root(10**12, 2) == 10**6
    assert integer_root(10**12 - 1, 2) == 10**6 - 1
    with pytest.raises(ValueError):
        integer_root(-1, 2)

    avail = {"big": 1_000_000, "small": 10_000}
    w1 = temperature_weights(avail, alpha=(1, 1))
    assert w1["big"] / w1["small"] == 100          # natural at alpha=1
    w2 = temperature_weights(avail, alpha=(1, 2))
    assert w2["big"] / w2["small"] == 10           # sqrt-flattened
    assert temperature_weights({"tiny": 1}, alpha=(1, 2))["tiny"] >= 1
    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(avail, alpha=(3, 2))
    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(avail, alpha=(0, 2))


def test_temperature_mixture_shares_flatten(spark):
    """temperature_mixture moves the emitted mix toward flat: the
    scarce source's share strictly rises vs its natural share and the
    abundant one's falls, with repetition bounded by max_epochs and
    every emitted row carrying a valid 0-based epoch."""
    from ahnlich_spark.operators.sampling import temperature_mixture

    rows = ([(i, "big") for i in range(900)]
            + [(1000 + i, "rare") for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture(df, alpha=(1, 2), max_epochs=4).cache()
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    tot = sum(by.values())
    assert by["rare"] / tot > 0.1                  # boosted above natural
    assert by["big"] / tot < 0.9
    eps = out.groupBy("source").agg(F.max("epoch").alias("m")).collect()
    assert all(0 <= r["m"] < 4 for r in eps)
    assert by["rare"] <= 4 * 100                   # repetition capped


def test_temperature_mixture_emission_plan_is_scan_local(spark):
    """The temperature emission plan contains NO exchange and NO join:
    weights are driver-side literals (exact integer roots over one tiny
    planning agg), so the 100 TB-side work is a pure narrow
    map+explode — the plan shape the docstring promises."""
    import contextlib
    import io

    from ahnlich_spark.operators.sampling import temperature_mixture

    df = spark.createDataFrame(
        [(i, "s" + str(i % 3)) for i in range(60)],
        "doc_id long, source string")
    out = temperature_mixture(df, alpha=(1, 2), max_epochs=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan and "Join" not in plan, plan
