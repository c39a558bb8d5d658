"""Maximal Marginal Relevance (MMR) diverse re-ranking for similarity
search results — the standard retrieval post-pass that trades raw
relevance for coverage (Carbonell & Goldstein, SIGIR'98):

    pick argmax over remaining c of
        lambda * rel(c) - (1 - lambda) * max_{s in selected} sim(c, s)

Two-stage shape, like every production implementation:

1. The DISTRIBUTED stage: exact cosine top-``candidates`` over the full
   store (TakeOrderedAndProject — the linear GetSimN plan, no shuffle).
2. The greedy stage: sequential by definition (each pick depends on the
   previous picks), so it runs driver-side over the BOUNDED candidate
   set with numpy — candidates is a knob like IVF's n_probe, never the
   corpus size. 50-500 candidates x 10 picks is microseconds.

Determinism: scores are float64 with a fixed evaluation order; ties
break to the lowest id at both stages.

Reference parity: extension — the reference returns raw closeness-
ordered top-N (ahnlich/db/src/algorithm/mod.rs:47-75) with no
diversification pass.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cos_matrix(X: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    U = X / norms
    return U @ U.T


def mmr_select(
    ids: Sequence[int],
    rel: np.ndarray,
    sim: np.ndarray,
    k: int,
    lam: float = 0.5,
) -> list:
    """Greedy MMR over a candidate set: returns [(id, mmr_score)] in
    pick order. ``rel`` is the relevance per candidate, ``sim`` the
    candidate-candidate similarity matrix."""
    n = len(ids)
    k = min(k, n)
    selected: list = []
    chosen = np.zeros(n, dtype=bool)
    max_sim = np.full(n, -np.inf)
    for _ in range(k):
        if selected:
            obj = lam * rel - (1.0 - lam) * max_sim
        else:
            obj = rel.copy()
        obj[chosen] = -np.inf
        # argmax with lowest-id tie-break: ids are pre-sorted ascending,
        # and np.argmax returns the FIRST maximum
        pick = int(np.argmax(obj))
        selected.append((ids[pick], float(obj[pick])))
        chosen[pick] = True
        max_sim = np.maximum(max_sim, sim[:, pick])
    return selected


def mmr_rerank(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    candidates: int = 50,
    lam: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, rank_n, mmr_score) — top-``k`` diverse results for ``query``.
    Stage 1 collects the exact cosine top-``candidates`` (distributed,
    bounded); stage 2 runs greedy MMR driver-side."""
    from ahnlich_spark.functions import similarity as S

    q = [float(x) for x in query]
    scored = df.select(
        F.col(id_col),
        F.col(vec_col),
        S.score_expr(S.COSINE, F.col(vec_col), F.array(*[F.lit(x) for x in q]),
                     "double").alias("_rel"),
    )
    rows = (
        scored.orderBy(F.desc("_rel"), F.asc(id_col))
        .limit(candidates)
        .collect()
    )
    # re-sort by id so argmax's first-max rule = lowest-id tie-break
    rows = sorted(rows, key=lambda r: r[id_col])
    ids = [r[id_col] for r in rows]
    rel = np.array([float(r["_rel"]) for r in rows])
    X = np.stack([np.asarray(list(r[vec_col]), dtype=np.float64) for r in rows])
    picks = mmr_select(ids, rel, _cos_matrix(X), k, lam)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(i), n + 1, float(s)) for n, (i, s) in enumerate(picks)],
        f"{id_col} long, rank_n long, mmr_score double",
    )
