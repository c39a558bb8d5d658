"""Retrieval-quality evaluation: recall@k of an approximate (pruned)
search path against the exact scan, computed as a distributed join.

Every ANN deployment needs this loop — FAISS ships it as a benchmark
harness, the reference pins it in its SIFT validation suite
(ahnlich/dsl & db sift_dataset_validation.rs:97-188, which asserts
recall >= 0.9 for tuned HNSW) — and at 100 TB it must run as a plan,
not a driver loop: both result sets are (probe, id) tables, recall is
one broadcast-sized join + aggregate per evaluation batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    probe_col: str = "qid",
    id_col: str = "id",
) -> DataFrame:
    """Per-probe recall counts: how many of each probe's EXACT top-k ids
    the approximate path also returned.

    ``exact`` and ``approx`` are (probe, id, ...) result frames — e.g.
    two ``Engine.get_sim_n_batch`` outputs, one linear and one pruned —
    with k rows per probe. Returns one row per probe:
    (probe, n_exact, n_hits); recall@k = n_hits / n_exact, left as an
    exact integer pair so callers (and cross-engine hash compares)
    never touch a float.

    Plan shape: the exact side left-joins the approximate side on
    (probe, id) — both are k*|batch| rows, tiny relative to any store —
    then one aggregate on probe. No store scan happens here at all;
    evaluation cost is independent of corpus size.
    """
    e = exact.select(F.col(probe_col).alias("_p"), F.col(id_col).alias("_i"))
    # distinct: a duplicated (probe, id) on the approx side (e.g. a
    # union of chunked result frames) must not fan out the join and
    # inflate both counts
    a = (
        approx.select(F.col(probe_col).alias("_p"), F.col(id_col).alias("_i"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        e.join(a, ["_p", "_i"], "left")
        .groupBy("_p")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
        )
        .select(F.col("_p").alias(probe_col), "n_exact", "n_hits")
    )


def dim_means_e9(
    df: DataFrame, vec_col: str = "embedding", group_col=None
) -> DataFrame:
    """Per-dimension mean of an embedding column, e9-scaled integer —
    (group?, dim, n, mean_e9). Components are e9-rounded BEFORE the
    integer sum, so the result is exact under any aggregation order and
    bit-identical across engines (a raw double mean is neither).

    Scale shape: posexplode is a scan-local map-stage expansion (dim x
    rows) that map-side combine collapses to per-partition per-dim
    partials before the shuffle — the exchange carries O(dims x
    partitions) rows whatever the corpus size. Integer headroom: e9
    components of unit-normalized embeddings sum safely past 1e9 rows
    per dimension (5e8 x 1e9 < 2^63 x 0.06)."""
    keys = [group_col] if group_col else []
    # explicit double: comp is FLOAT in the parquet, and float x int
    # promotes to FLOAT in both engines — f32 multiply rounds before
    # the e9 round does, off-by-one vs the double path
    comp_e9 = F.round(F.col("comp").cast("double") * 1_000_000_000).cast("long")
    return (
        df.select(
            *keys, F.posexplode(F.col(vec_col)).alias("dim", "comp")
        )
        .select(*keys, "dim", comp_e9.alias("c"))
        .groupBy(*keys, "dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("sum(c) div count(1)").cast("long").alias("mean_e9"),
        )
    )


def embedding_drift(
    slice_a: DataFrame,
    slice_b: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension distribution drift between two corpus slices
    (yesterday's crawl vs today's, one source vs another) — the
    monitoring signal that catches an upstream embedding-model change
    or a content shift before it contaminates similarity search.
    Returns (dim, mean_a_e9, mean_b_e9, drift_e9 = |mean_a - mean_b|),
    one row per dimension; sum drift_e9 for a corpus-level L1 score.

    Both slices reduce to dims-sized tables before they meet, so the
    comparison join is metadata-scale regardless of slice sizes."""
    a = dim_means_e9(slice_a, vec_col).select(
        "dim", F.col("mean_e9").alias("mean_a_e9")
    )
    b = dim_means_e9(slice_b, vec_col).select(
        "dim", F.col("mean_e9").alias("mean_b_e9")
    )
    return a.join(b, "dim").select(
        F.col("dim").cast("long").alias("dim"),
        "mean_a_e9",
        "mean_b_e9",
        F.abs(F.col("mean_a_e9") - F.col("mean_b_e9")).cast("long").alias("drift_e9"),
    )


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every anchor
    the ``k`` most-cosine-similar corpus rows with a DIFFERENT label —
    the near-miss negatives that teach a retrieval model the decision
    boundary (random negatives are trivially separable; in-batch
    negatives are distribution-biased). Returns
    (qid, {id_col}, rank_n, cos) ranked cosine-desc, id-asc.

    Scale shape (100 TB): the anchor batch broadcasts (bounded by
    contract — mine in batches like GetSimN batch probes), the corpus
    scans ONCE with the label-mismatch filter applied before any
    scoring, and per-anchor ranking is a WindowGroupLimit on the
    anchor key — no corpus self-join, no global sort. For anchor sets
    past broadcast size, pre-prune with the LSH bucket machinery of
    ``dedup.embedding_near_dup_pairs`` and rescore candidates only."""
    from ahnlich_spark import functions as _  # noqa: F401 (package init)
    from ahnlich_spark.functions import similarity as S
    from pyspark.sql import Window

    a = anchors.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("_qv"),
        F.col(label_col).alias("_qlabel"),
    )
    score = S.score_expr(S.COSINE, F.col(vec_col), F.col("_qv"), "double")
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        corpus.select(F.col(id_col), F.col(vec_col), F.col(label_col))
        .crossJoin(F.broadcast(a))
        .filter(F.col(label_col) != F.col("_qlabel"))
        .withColumn("cos", score)
        .withColumn("rank_n", F.row_number().over(w))
        .filter(F.col("rank_n") <= int(k))
        .select("qid", id_col, "rank_n", "cos")
    )


def matryoshka_recall(
    corpus: DataFrame,
    anchors: DataFrame,
    prefix_dims,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka-style truncation evaluation: for each prefix length
    ``p`` (Kusupati et al. 2022 — embeddings whose leading dimensions
    carry the signal), how many of the FULL-dimension cosine top-k
    does ranking by only the first ``p`` dimensions keep? Returns
    (prefix_dim, n_hits) with n_hits summed over anchors — the
    evidence for whether a 4x-cheaper truncated index is safe.

    Scale shape: ONE corpus scan computes every prefix's cosine as a
    column (slices of the same array read), all rankings share the
    anchor-key exchange (same partitioning -> one shuffle, several
    sorts), and the intersection joins are k x anchors rows."""
    from ahnlich_spark.functions import similarity as S
    from pyspark.sql import Window

    prefix_dims = [int(p) for p in prefix_dims]
    a = anchors.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("_qv")
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(a)
    )
    full = S.score_expr(S.COSINE, F.col(vec_col), F.col("_qv"), "double")
    scored = scored.withColumn("_cos_full", full)
    for p in prefix_dims:
        cp = S.score_expr(
            S.COSINE,
            F.slice(F.col(vec_col), 1, p),
            F.slice(F.col("_qv"), 1, p),
            "double",
        )
        scored = scored.withColumn(f"_cos_{p}", cp)
    w_full = Window.partitionBy("qid").orderBy(
        F.desc("_cos_full"), F.asc(id_col)
    )
    ranked = scored.withColumn("_rk_full", F.row_number().over(w_full))
    for p in prefix_dims:
        wp = Window.partitionBy("qid").orderBy(
            F.desc(f"_cos_{p}"), F.asc(id_col)
        )
        ranked = ranked.withColumn(f"_rk_{p}", F.row_number().over(wp))
    hits = [
        F.sum(
            ((F.col(f"_rk_{p}") <= k) & (F.col("_rk_full") <= k)).cast("int")
        ).alias(f"h{p}")
        for p in prefix_dims
    ]
    # ONE aggregation row unpivoted with stack — a per-prefix union of
    # selects would re-execute the whole scan+rank pipeline per prefix
    row = ranked.agg(*hits)
    stack = ", ".join(
        f"CAST({p} AS BIGINT), CAST(h{p} AS BIGINT)" for p in prefix_dims
    )
    return row.select(
        F.expr(f"stack({len(prefix_dims)}, {stack}) AS (prefix_dim, n_hits)")
    )


def knn_label_confusion(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """k-NN classification audit: each anchor is classified by the
    MAJORITY label of its ``k`` cosine-nearest corpus rows (itself
    excluded), and the result is the confusion matrix
    (true_label, pred_label, n) — the standard label-quality /
    embedding-quality probe run before trusting labels for filtering.
    Majority ties break (count desc, label asc) — deterministic on any
    engine.

    Scale shape: broadcast anchors x ONE corpus scan, per-anchor
    ranking is a WindowGroupLimit, the vote and argmax act on
    k x anchors rows, and the confusion matrix is label-cardinality
    sized."""
    from pyspark.sql import Window

    from ahnlich_spark.functions import similarity as S

    a = anchors.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("_qv"),
        F.col(label_col).alias("true_label"),
    )
    score = S.score_expr(S.COSINE, F.col(vec_col), F.col("_qv"), "double")
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.asc(id_col))
    neigh = (
        corpus.select(F.col(id_col), F.col(vec_col), F.col(label_col))
        .crossJoin(F.broadcast(a.select("qid", "_qv")))
        .filter(F.col(id_col) != F.col("qid"))
        .withColumn("_cos", score)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(k))
    )
    votes = neigh.groupBy("qid", label_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    wv = Window.partitionBy("qid").orderBy(
        F.desc("_n"), F.asc(label_col)
    )
    pred = (
        votes.withColumn("_vr", F.row_number().over(wv))
        .filter(F.col("_vr") == 1)
        .select("qid", F.col(label_col).alias("pred_label"))
    )
    return (
        pred.join(a.select("qid", "true_label"), "qid")
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
