"""Property-based tests (hypothesis): randomized inputs checked against
pure-Python reference evaluators and algebraic invariants. The
reference repo ships none of these (SURVEY.md §5 "no property-based
tests"); they exist here because the engine's semantics — predicate
algebra over missing keys, dedup partitioning, nested sampling,
token-budget packing, quantization bounds — are exactly the kind of
edge-case surface example-based tests under-cover.

Spark-job economy: every property evaluates ALL hypothesis examples it
needs from ONE collected DataFrame (rows are collected once per module,
predicates are evaluated as extra columns in a single job per example
batch), so the suite stays seconds-fast despite full-plan execution.
"""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from ahnlich_spark.operators.predicates import (
    And, Equals, In, NotEquals, NotIn, Or, compile_predicate,
)

# ------------------------------------------------------------ fixtures --

KEYS = ["a", "b", "c"]
VALUES = ["x", "y", "z"]


@pytest.fixture(scope="module")
def meta_rows(spark):
    """All meta maps over KEYS x (VALUES | missing) — the full truth
    domain for 3 keys and 3 values, 64 rows — as one cached DataFrame
    plus the plain-python copies."""
    import itertools

    rows = []
    for combo in itertools.product([None, *VALUES], repeat=len(KEYS)):
        d = {k: v for k, v in zip(KEYS, combo) if v is not None}
        rows.append(d)
    df = spark.createDataFrame(
        [(i, {k: ("raw_string", v, None) for k, v in d.items()}) for i, d in enumerate(rows)],
        "id long, meta map<string, struct<kind string, s string, bin binary>>",
    )
    df = df.cache()
    df.count()
    return df, rows


# --------------------------------------------- predicate tree property --

def pred_trees(depth=0):
    leaf = st.one_of(
        st.builds(Equals, st.sampled_from(KEYS), st.sampled_from(VALUES)),
        st.builds(NotEquals, st.sampled_from(KEYS), st.sampled_from(VALUES)),
        st.builds(
            In,
            st.sampled_from(KEYS),
            st.lists(st.sampled_from(VALUES), max_size=3).map(tuple),
        ),
        st.builds(
            NotIn,
            st.sampled_from(KEYS),
            st.lists(st.sampled_from(VALUES), max_size=3).map(tuple),
        ),
    )
    if depth >= 2:
        return leaf
    sub = pred_trees(depth + 1)
    return st.one_of(leaf, st.builds(And, sub, sub), st.builds(Or, sub, sub))


def eval_py(pred, d: dict):
    """Reference evaluator: the documented scan semantics, in plain
    Python over a plain dict."""
    if isinstance(pred, Equals):
        return pred.key in d and d[pred.key] == pred.value.s
    if isinstance(pred, NotEquals):
        return pred.key not in d or d[pred.key] != pred.value.s
    if isinstance(pred, NotIn):  # NotIn subclasses In: check it first
        vals = {v.s for v in pred.values}
        return pred.key not in d or d[pred.key] not in vals
    if isinstance(pred, In):
        vals = {v.s for v in pred.values}
        return pred.key in d and d[pred.key] in vals
    if isinstance(pred, And):
        return eval_py(pred.left, d) and eval_py(pred.right, d)
    if isinstance(pred, Or):
        return eval_py(pred.left, d) or eval_py(pred.right, d)
    raise TypeError(pred)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=pred_trees())
def test_predicate_tree_matches_reference(meta_rows, tree):
    df, rows = meta_rows
    got = {
        r["id"]
        for r in df.filter(compile_predicate(tree, F.col("meta"))).select("id").collect()
    }
    want = {i for i, d in enumerate(rows) if eval_py(tree, d)}
    assert got == want, f"{tree}: spark={sorted(got)} python={sorted(want)}"


# ------------------------------------------------ dedup partitioning --

texts = st.lists(
    st.text(alphabet="ab \n\t", min_size=0, max_size=12), min_size=1, max_size=12
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ts=texts)
def test_exact_dedup_partitions_corpus(spark, ts):
    """Groups partition the rows: group sizes sum to n; every keep_id is
    the minimum id of a whitespace-normalized equality class."""
    from ahnlich_spark.operators.dedup import exact_dedup_groups

    df = spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
    out = exact_dedup_groups(df).collect()
    assert sum(r["n_dups"] for r in out) == len(ts)

    def norm(t):
        return " ".join(t.strip().split())

    groups = {}
    for i, t in enumerate(ts):
        groups.setdefault(norm(t), []).append(i)
    want = {(min(v), len(v)) for v in groups.values()}
    assert {(r["keep_id"], r["n_dups"]) for r in out} == want


# ------------------------------------------------- nested sampling --

@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    r1=st.floats(min_value=0.0, max_value=1.0),
    r2=st.floats(min_value=0.0, max_value=1.0),
    salt=st.text(alphabet="abc", max_size=3),
)
def test_hash_sample_nested_and_deterministic(spark, r1, r2, salt):
    from ahnlich_spark.operators.sampling import hash_sample

    lo, hi = sorted([r1, r2])
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    s_lo = {r["doc_id"] for r in hash_sample(df, lo, salt=salt).collect()}
    s_hi = {r["doc_id"] for r in hash_sample(df, hi, salt=salt).collect()}
    assert s_lo <= s_hi  # nested across rates
    # deterministic: pure function of (salt, id, rate)
    again = {r["doc_id"] for r in hash_sample(df, lo, salt=salt).collect()}
    assert again == s_lo
    # matches the documented md5 derivation
    want = {
        i for i in range(300)
        if int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:15], 16) % 1_000_000
        < round(lo * 1_000_000)
    }
    assert s_lo == want


# ------------------------------------------------ sequence packing --

@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    toks=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
    budget=st.integers(min_value=41, max_value=120),
)
def test_pack_sequences_budget_bound(spark, toks, budget):
    """When no doc exceeds the budget, every batch total is < budget +
    max_doc_tokens; ids within a batch are contiguous in sort order and
    batches cover all docs exactly once."""
    from ahnlich_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(toks)],
        "doc_id long, source string, n_tokens long",
    )
    out = pack_sequences(df, budget).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(toks)))
    per_batch = {}
    for r in out:
        per_batch.setdefault(r["batch_id"], []).append(r)
    mx = max(toks)
    for rows in per_batch.values():
        total = sum(r["n_tok"] for r in rows)
        assert total < budget + mx
    # batch ids are the prefix-sum chunking: doc order preserved
    order = [r["doc_id"] for r in sorted(out, key=lambda r: (r["batch_id"], r["seq_in_batch"]))]
    assert order == sorted(order)


# ------------------------------------------------ quantization bound --

@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vec=st.lists(
        st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, width=32),
        min_size=1, max_size=16,
    )
)
def test_int8_quantize_error_bound(spark, vec):
    """|dequant - v| <= max|v| / 254 (+eps) for every component, any
    input — including all-zero vectors."""
    from ahnlich_spark.functions import quantize as Q

    df = spark.createDataFrame([(vec,)], "embedding array<float>")
    s = Q.maxabs(F.col("embedding"))
    codes = Q.int8_codes(F.col("embedding"), s)
    err = F.array_max(
        F.zip_with(
            Q.dequantize(codes, s),
            F.col("embedding"),
            lambda d, v: F.abs(d - v.cast("double")),
        )
    )
    r = df.select(s.alias("s"), err.alias("e")).first()
    assert r["e"] <= r["s"] / 254.0 + 1e-9


# -------------------------------------------- temporal join properties --

events_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=50),     # ts (coarse -> collisions)
        st.integers(min_value=0, max_value=9),      # payload
    ),
    min_size=0, max_size=20,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ls=events_lists, rs=events_lists, w=st.integers(min_value=1, max_value=10))
def test_window_count_join_matches_bruteforce(spark, ls, rs, w):
    """The RANGE-frame formulation equals the naive quadratic range
    join: count/sum right rows with same key and ts in [lt - w, lt),
    for arbitrary keys, duplicate timestamps, and empty sides."""
    from ahnlich_spark.operators.joins import window_count_join

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t, _p) in enumerate(ls)] or [(0, -1, 0)],
        "row_id long, k long, ts_us long",
    )
    right = spark.createDataFrame(
        [(k, t, p) for (k, t, p) in rs] or [(-2, 0, 0)],
        "k long, ts_us long, v long",
    )
    out = {
        r["row_id"]: (r["n"], r["s"])
        for r in window_count_join(
            left, right, on="k", window_us=w, sum_col="v",
            count_col="n", sum_out="s",
        ).collect()
    }
    for i, (k, t, _p) in enumerate(ls):
        want_rows = [p for (rk, rt, p) in rs if rk == k and t - w <= rt < t]
        assert out[i] == (len(want_rows), float(sum(want_rows))), (i, k, t)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ls=events_lists, rs=events_lists)
def test_asof_join_matches_bruteforce(spark, ls, rs):
    """asof_join equals the naive 'latest right at-or-before, greatest
    tiebreak wins' rule for arbitrary keys and tied timestamps."""
    import datetime as dt

    from ahnlich_spark.operators.joins import asof_join

    base = dt.datetime(2024, 1, 1)

    def ts(t):
        return base + dt.timedelta(seconds=t)

    left = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t, _p) in enumerate(ls)] or [(0, -1, ts(0))],
        "row_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(j, k, ts(t)) for j, (k, t, _p) in enumerate(rs)] or [(0, -2, ts(0))],
        "rid long, k long, ts timestamp",
    )
    out = {
        r["row_id"]: r["asof_rid"]
        for r in asof_join(
            left, right, on="k", tiebreak="rid", right_cols=["rid"]
        ).collect()
    }
    for i, (k, t, _p) in enumerate(ls):
        matches = [(rt, j) for j, (rk, rt, _q) in enumerate(rs) if rk == k and rt <= t]
        want = max(matches)[1] if matches else None
        assert out[i] == want, (i, k, t, matches)


def test_gate_cosine_threshold_margins_are_safe():
    """Gates that compare cosine >= threshold across engines
    (embedding_near_dup @0.45, semantic_dedup @0.45) rely on no pair
    sitting ON the boundary: numpy-BLAS and DuckDB chain summation can
    disagree by ~1e-13 in the last ulps. Guard the fixture margin at
    >= 1e-6 so a future testdata change that narrows it fails HERE with
    a diagnosis instead of as an opaque hash mismatch."""
    import numpy as np
    import pyarrow.parquet as pq

    for sf in ("0.001", "0.01", "0.1"):
        t = pq.read_table(f"/root/testdata/sf{sf}/embeddings.parquet").to_pandas()
        X = np.stack(t.embedding.map(lambda v: np.asarray(v, dtype=np.float64)))
        n = np.linalg.norm(X, axis=1, keepdims=True)
        C = (X @ X.T) / (n @ n.T)
        vals = C[np.triu_indices(len(X), 1)]
        for thr in (0.45,):
            margin = np.abs(vals - thr).min()
            assert margin >= 1e-6, (sf, thr, margin)


@given(
    na=st.integers(min_value=1, max_value=10**6),
    nb=st.integers(min_value=1, max_value=10**6),
    t_milli=st.integers(min_value=1, max_value=999),
)
@settings(max_examples=300, deadline=None)
def test_jaccard_size_bucket_covers_all_threshold_pairs(na, nb, t_milli):
    """The size-filtering contract behind the composite LSH band keys
    (operators/blocking.jaccard_size_bucket): any pair whose set sizes
    are within a factor 1/t of each other lands within +-1 log-ratio
    bucket, so 3-bucket probing is lossless for the threshold. Pure
    Python twin of the Column math (floor(ln n / ln(1/t)))."""
    import math

    t = t_milli / 1000.0
    lo, hi = min(na, nb), max(na, nb)
    if lo < hi * t:
        return  # pair not eligible under the threshold: no promise made
    width = math.log(1.0 / t)
    ba = math.floor(math.log(na) / width)
    bb = math.floor(math.log(nb) / width)
    assert abs(ba - bb) <= 1, (na, nb, t, ba, bb)


# ------------------------------------------------------- BPE training --
#
# Pure-Python reference trainer: the exact Sennrich loop with the
# engine's determinism contract (overlapping pair counts weighted by
# word frequency, argmax count-desc/left/right, greedy left-to-right
# merge, terminal </w>). Both engines must replay it bit-for-bit.

def _py_bpe_train(texts, n_merges):
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in (t or "").strip().split():
            if w:
                words[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


_bpe_words = st.text(alphabet="ab¢中.", min_size=0, max_size=4)
_bpe_texts = st.lists(
    st.lists(_bpe_words, min_size=0, max_size=6).map(" ".join),
    min_size=1, max_size=4,
)


@settings(max_examples=40, deadline=None)
@given(texts=_bpe_texts, n=st.integers(min_value=1, max_value=4))
def test_bpe_oracle_sql_matches_python_reference(texts, n):
    """The DuckDB gate oracle replays the reference BPE loop exactly —
    overlapping counts, tie order, greedy replace, multibyte symbols,
    early exhaustion — on arbitrary corpora (no Spark in the loop, so
    hypothesis can afford real coverage)."""
    import duckdb
    import pandas as pd

    from ahnlich_spark.entry_queries import _bpe_train_sql

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = sorted(map(tuple, con.sql(_bpe_train_sql(n)).fetchall()))
    want = sorted(_py_bpe_train(texts, n))
    assert got == want, (texts, n)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_bpe_texts, n=st.integers(min_value=1, max_value=3))
def test_bpe_spark_trainer_matches_python_reference(spark, texts, n):
    """BOTH Spark trainer paths — driver-local (default below the vocab
    bound) and per-round jobs (forced with driver_vocab_bound=0) —
    implement the same loop bit-for-bit (few examples — each costs real
    Spark jobs; the oracle-vs-reference property above carries the
    breadth)."""
    from ahnlich_spark.operators.bpe import train_merges

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got_driver = sorted(
        tuple(r) for r in train_merges(df, n_merges=n).collect()
    )
    got_jobs = sorted(
        tuple(r)
        for r in train_merges(df, n_merges=n, driver_vocab_bound=0).collect()
    )
    want = sorted(_py_bpe_train(texts, n))
    assert got_driver == want, (texts, n)
    assert got_jobs == want, (texts, n)


# -------------------------------------------------- join IVM property --

_jmut_ops = st.lists(
    st.tuples(
        st.sampled_from(["a_set", "a_del", "b_set", "b_del"]),
        st.integers(min_value=0, max_value=4),    # entity index
        st.integers(min_value=0, max_value=3),    # join-key index
    ),
    min_size=1, max_size=4,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_jmut_ops)
def test_join_ivm_random_mutations_match_recompute(spark, ops):
    """Model check of the bilinear join-delta identity: ANY interleaved
    mutation sequence on both sides (fact moves/deletes, dim regroup/
    deletes — including keys that never existed and same-window changes
    to both stores) folds to exactly the re-join of the final
    snapshots (few examples — each costs a real engine; the dedicated
    tests in test_ivm.py pin the named edge cases)."""
    import tempfile as tf

    from ahnlich_spark import Engine
    from ahnlich_spark.operators import ivm as IVM

    eng = Engine(spark, tf.mkdtemp(prefix="ahnlich_jprop_"))
    eng.create_store("pa", dimension=2, predicates=["k"])
    eng.create_store("pb", dimension=2, predicates=["k", "w"])
    eng.set("pa", [([float(e), 1.0], {"k": f"k{e % 3}"})
                   for e in range(3)])                       # base A v1
    eng.set("pb", [([10.0 + k, 0.0], {"k": f"k{k}", "w": str(k % 2)})
                   for k in range(3)])                       # base B v1
    ja, jb = F.col("a_meta")["k"]["s"], F.col("b_meta")["k"]["s"]
    grp = F.col("b_meta")["w"]["s"]
    meas = {"e2": (F.element_at("a_key", 1) * 100).cast("long")}
    view = IVM.full_join_agg(
        eng, "pa", eng, "pb", ja, jb, grp, meas,
        version_a=1, segments_a=0, version_b=1, segments_b=0,
    ).localCheckpoint()
    for op, e, k in ops:
        if op == "a_set":
            eng.set("pa", [([float(e), 1.0], {"k": f"k{k}"})])
        elif op == "a_del":
            eng.del_key("pa", [[float(e), 1.0]])
        elif op == "b_set":
            eng.set("pb", [([10.0 + k, 0.0], {"k": f"k{k}",
                                              "w": str(e % 3)})])
        else:
            eng.del_key("pb", [[10.0 + k, 0.0]])
    delta = IVM.cdf_join_agg_delta(
        eng, "pa", (1, 0), eng, "pb", (1, 0), ja, jb, grp, meas,
    )
    got = sorted(
        tuple(r) for r in IVM.apply_agg_delta(view, delta, ["e2"]).collect()
    )
    want = sorted(
        tuple(r) for r in IVM.full_join_agg(
            eng, "pa", eng, "pb", ja, jb, grp, meas,
        ).collect()
    )
    assert got == want, (ops, got, want)
