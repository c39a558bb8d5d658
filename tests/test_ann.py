"""ANN recall validation, mirroring the reference's SIFT-style contract
(ahnlich/similarity/src/tests/sift_dataset_validation.rs:97-113): the
approximate path must reach recall > 0.90 @ k=50 against in-test exact
ground truth; stores at or below the brute-force threshold must be
EXACT (recall 1.0, the reference's <=4096 accept-list shortcut)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ahnlich_spark.functions import similarity as S
from ahnlich_spark.operators.ann import lsh_top_k
from ahnlich_spark.operators.topk import top_k_similar

DIM = 64
N_CLUSTERED = 6000  # > BRUTE_FORCE_THRESHOLD so the LSH path engages
K = 50


def _clustered_vectors(n, dim, n_clusters=120, seed=11):
    """SIFT-like structure: points scattered around cluster centers, so
    near neighbors are genuinely close (the regime ANN is built for)."""
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1.0, size=(n_clusters, dim))
    assign = rng.randint(0, n_clusters, size=n)
    return (centers[assign] + rng.normal(0, 0.15, size=(n, dim))).astype(np.float32)


@pytest.fixture(scope="module")
def big_store(spark):
    vecs = _clustered_vectors(N_CLUSTERED, DIM)
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("key", T.ArrayType(T.FloatType(), True), False),
            ]
        ),
    ).repartition(8).cache()
    df.count()
    yield df, vecs
    df.unpersist()


def _recall(df, vecs, metric, query, k=K):
    approx = {r["id"] for r in lsh_top_k(df, query, metric=metric, k=k).collect()}
    exact = {r["id"] for r in top_k_similar(df, query, metric, k).collect()}
    return len(approx & exact) / k


@pytest.mark.parametrize("metric", [S.COSINE, S.EUCLIDEAN, S.DOT])
def test_lsh_recall_above_090_at_k50(big_store, metric):
    df, vecs = big_store
    # average over a few queries, as the reference's SIFT check does
    rng = np.random.RandomState(3)
    qidx = rng.choice(len(vecs), size=5, replace=False)
    recalls = [_recall(df, vecs, metric, vecs[i].tolist()) for i in qidx]
    avg = sum(recalls) / len(recalls)
    assert avg > 0.90, f"{metric}: avg recall {avg:.3f} ({recalls})"


@pytest.mark.parametrize("metric", [S.COSINE, S.EUCLIDEAN])
def test_ivf_recall_above_090_at_k50(big_store, metric):
    from ahnlich_spark.operators.ann import assign_buckets, ivf_top_k, train_centroids

    df, vecs = big_store
    cents = train_centroids(df, DIM)
    indexed = assign_buckets(df, cents).cache()
    indexed.count()
    try:
        rng = np.random.RandomState(4)
        recalls = []
        for i in rng.choice(len(vecs), size=5, replace=False):
            q = vecs[i].tolist()
            approx = {r["id"] for r in
                      ivf_top_k(indexed, q, metric=metric, k=K, centroids=cents).collect()}
            exact = {r["id"] for r in top_k_similar(df, q, metric, K).collect()}
            recalls.append(len(approx & exact) / K)
        avg = sum(recalls) / len(recalls)
        assert avg > 0.90, f"{metric}: avg recall {avg:.3f} ({recalls})"
    finally:
        indexed.unpersist()


def test_small_store_is_exact(spark):
    vecs = _clustered_vectors(500, DIM, seed=5)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "id long, key array<float>",
    )
    q = vecs[7].tolist()
    approx = [r["id"] for r in lsh_top_k(df, q, metric=S.COSINE, k=10).collect()]
    exact = [r["id"] for r in top_k_similar(df, q, S.COSINE, 10).collect()]
    assert approx == exact  # brute-force shortcut: identical, ordered


def test_recall_at_k_counts(spark):
    """recall_at_k: per-probe intersection counts, exact-side base —
    identical sets give n_hits == n_exact, disjoint give 0, and an
    approx side MISSING a probe entirely still reports that probe."""
    from ahnlich_spark.operators.evaluation import recall_at_k

    exact = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 7), (1, 8), (2, 4)],
        "qid long, id long",
    )
    approx = spark.createDataFrame(
        [(0, 2), (0, 3), (0, 99), (1, 5), (1, 6)],  # probe 2 absent
        "qid long, id long",
    )
    rows = {r["qid"]: (r["n_exact"], r["n_hits"])
            for r in recall_at_k(exact, approx).collect()}
    assert rows == {0: (3, 2), 1: (2, 0), 2: (1, 0)}
