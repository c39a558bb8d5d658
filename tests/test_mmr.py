"""MMR re-ranking invariants: first pick is the relevance argmax, every
later pick maximizes the marginal objective, lambda=1 degenerates to
plain top-k, low lambda diversifies."""

import numpy as np
from pyspark.sql import functions as F

from ahnlich_spark.operators.mmr import _cos_matrix, mmr_rerank, mmr_select


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _query(spark, sf_dir):
    return [
        float(x)
        for x in _emb(spark, sf_dir).filter(F.col("vec_id") == 0).first()["embedding"]
    ]


def test_greedy_objective_is_maximized():
    rng = np.random.RandomState(0)
    X = rng.normal(size=(30, 8))
    rel = rng.uniform(size=30)
    sim = _cos_matrix(X)
    ids = list(range(30))
    lam = 0.5
    picks = mmr_select(ids, rel, sim, k=8, lam=lam)
    chosen = []
    for pid, score in picks:
        # recompute the objective for every remaining candidate
        best = None
        for c in ids:
            if c in chosen:
                continue
            if chosen:
                obj = lam * rel[c] - (1 - lam) * max(sim[c][s] for s in chosen)
            else:
                obj = rel[c]
            if best is None or obj > best[1] or (obj == best[1] and c < best[0]):
                best = (c, obj)
        assert pid == best[0]
        assert abs(score - best[1]) < 1e-12
        chosen.append(pid)


def test_lambda_one_is_plain_topk(spark, sf_dir):
    q = _query(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    out = [r["vec_id"] for r in mmr_rerank(emb, q, k=5, candidates=30, lam=1.0)
           .orderBy("rank_n").collect()]
    # plain exact cosine top-5
    from ahnlich_spark.functions import similarity as S

    top = [
        r["vec_id"]
        for r in emb.select(
            "vec_id",
            S.score_expr(S.COSINE, F.col("embedding"),
                         F.array(*[F.lit(x) for x in q]), "double").alias("s"),
        ).orderBy(F.desc("s"), F.asc("vec_id")).limit(5).collect()
    ]
    assert out == top


def test_low_lambda_diversifies(spark, sf_dir):
    """With heavy diversity weight the picked set's mean pairwise
    similarity must drop vs plain top-k."""
    q = _query(spark, sf_dir)
    emb = _emb(spark, sf_dir)

    def mean_pairwise(ids):
        rows = emb.filter(F.col("vec_id").isin(ids)).collect()
        X = np.stack([np.asarray(list(r["embedding"]), dtype=np.float64) for r in rows])
        sim = _cos_matrix(X)
        iu = np.triu_indices(len(ids), 1)
        return float(sim[iu].mean())

    plain = [r["vec_id"] for r in mmr_rerank(emb, q, k=8, candidates=40, lam=1.0).collect()]
    diverse = [r["vec_id"] for r in mmr_rerank(emb, q, k=8, candidates=40, lam=0.2).collect()]
    assert plain != diverse
    assert mean_pairwise(diverse) < mean_pairwise(plain)


def test_deterministic(spark, sf_dir):
    q = _query(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    a = [(r["vec_id"], r["rank_n"]) for r in mmr_rerank(emb, q, k=6, candidates=30).collect()]
    b = [(r["vec_id"], r["rank_n"]) for r in mmr_rerank(emb, q, k=6, candidates=30).collect()]
    assert a == b
