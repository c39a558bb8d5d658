"""SIFT-shaped recall validation at the reference's dataset scale.

The reference asserts recall@50 > 0.9 on SIFT10k (10,000 vectors x 128
dims) for ALL THREE metrics under its default index configs
(ahnlich/similarity/src/tests/sift_dataset_validation.rs:97-113); the
repo's other recall floors are pinned on smaller fixtures (6k x 32).
This file reproduces the contract at the reference's shape: a
deterministic 10k x 128 clustered dataset (SIFT descriptors are
cluster-structured, not uniform — uniform data is the known worst case
where NO sublinear method reaches 0.9), default index configs with only
``distance`` overridden, and recall@50 >= 0.9 for both the LSH (hnsw)
path and the residual IVF-PQ composition under cosine / euclidean /
dot, probes drawn from the dataset like SIFT's query set.
"""

import numpy as np
import pytest

from ahnlich_spark.functions import similarity as S
from ahnlich_spark.operators.topk import top_k_similar

N, DIM = 10_000, 128


def _sift_shaped(n=N, dim=DIM, seed=29, n_clusters=200):
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1.0, size=(n_clusters, dim))
    assign = rng.randint(0, n_clusters, size=n)
    return (centers[assign]
            + rng.normal(0, 0.15, size=(n, dim))).astype(np.float32)


VECS = _sift_shaped()

METRICS = [
    ("cosine_similarity", S.COSINE),
    ("euclidean_distance", S.EUCLIDEAN),
    ("dot_product", S.DOT),
]


@pytest.fixture(scope="module", params=METRICS, ids=[m for m, _ in METRICS])
def sift_engine(request, spark, tmp_path_factory):
    """One 10k x 128 store per metric, indexed with the DEFAULT hnsw /
    ivf / residual-pq configs (only the metric is set — the same knobs
    a user gets out of the box)."""
    from ahnlich_spark import Engine

    dist, metric = request.param
    eng = Engine(spark, str(tmp_path_factory.mktemp(f"sift_{metric}")))
    eng.create_store("sift", dimension=DIM)
    eng.set("sift", [(v.tolist(), {"i": str(i)})
                     for i, v in enumerate(VECS)])
    eng.create_non_linear_algorithm_index(
        "sift", ["hnsw"], config={"distance": dist})
    eng.create_non_linear_algorithm_index(
        "sift", ["ivf"], config={"distance": dist})
    eng.create_non_linear_algorithm_index(
        "sift", ["pq"], config={"distance": dist, "residual": True})
    return eng, metric


@pytest.mark.parametrize("algo", ["hnsw", "pq"])
def test_sift10k_recall_floor(sift_engine, algo):
    """recall@50 >= 0.9 at 10k x 128 under default configs — the LSH
    path (hnsw) and the residual IVF-PQ composition (pq over the ivf
    coarse quantizer), per metric via the module fixture."""
    eng, metric = sift_engine
    store = eng.store_df("sift")
    rng = np.random.RandomState(5)
    recalls = []
    for i in rng.choice(N, size=4, replace=False):
        q = VECS[i].tolist()
        approx = {r["id"] for r in
                  eng.get_sim_n("sift", q, 50, algorithm=algo).collect()}
        exact = {r["id"] for r in
                 top_k_similar(store, q, metric, 50).collect()}
        recalls.append(len(approx & exact) / 50)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.9, f"{metric}/{algo}: recall@50 {avg:.3f} ({recalls})"
