"""Benchmark decontamination: flag training docs that share word
n-grams with an evaluation/benchmark set.

Standard LLM-pipeline hygiene (the GPT-3/PaLM papers decontaminate on
8-13-gram collisions): any training document sharing at least
``min_hits`` distinct word n-grams with any benchmark document is
flagged (and typically dropped or split).

Reference parity: part of this repo's training-data-pipeline extension
surface; the reference engine (deven96/ahnlich) has no corpus ops.

Scale notes (100 TB):
- Both sides explode to (gram, doc) pairs; the join key is the md5 of
  the gram string (unhex'd to 16 binary bytes), so long grams never
  shuffle — 16 bytes per edge.
- The "distinct grams per document" semantics is enforced SCAN-LOCALLY
  with ``array_distinct`` on the shingle array BEFORE the explode — a
  per-row operation, NOT a global ``distinct()`` (which would shuffle
  every (doc, gram) pair; at 100 TB that hidden shuffle dwarfs the join).
- The benchmark side is small by construction (eval sets are MBs, the
  corpus is TBs): ``F.broadcast`` keeps the corpus un-shuffled — the
  whole operator is scan + broadcast-hash-join + partial-agg groupBy,
  and the only corpus shuffle is the final tiny per-doc hit count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ahnlich_spark.functions import text as X


def _gram_table(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    return (
        df.select(
            F.col(id_col).alias("did"),
            F.explode(
                F.array_distinct(X.word_shingles(F.col(text_col), n))
            ).alias("g"),
        )
        .select("did", F.unhex(F.md5("g")).alias("gh"))
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shared_grams) for every corpus doc sharing >=
    ``min_hits`` distinct word ``n``-grams with the benchmark set."""
    train = _gram_table(corpus, n, text_col, id_col)
    bench = _gram_table(benchmark, n, text_col, id_col).select("gh").distinct()
    return (
        train.join(F.broadcast(bench), "gh")
        .groupBy("did")
        .agg(F.count("*").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_hits)
        .select(F.col("did").alias("doc_id"), "n_shared_grams")
    )


def semantic_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.8,
    id_col: str = "id",
    vec_col: str = "key",
    precision: str = "double",
) -> DataFrame:
    """Embedding-level decontamination: flag corpus rows whose vector is
    cosine-similar (>= threshold) to ANY benchmark vector — catching the
    paraphrased/translated eval leakage n-gram matching misses (the
    SemDeDup / D4 companion step to ``contaminated_docs``).

    Returns (id, n_hits, max_cos) for contaminated rows only.

    Scale shape: the benchmark side is small by construction (eval sets
    are thousands of vectors), so it BROADCASTS and the corpus never
    shuffles for the comparison — a broadcast nested-loop join whose
    predicate is the codegen'd cosine fold, emitting ONLY matching
    pairs. The per-doc aggregation then shuffles just the matches
    (contamination is rare by definition), not the corpus. For a large
    benchmark side, pre-prune with the LSH machinery of
    ``dedup.embedding_near_dup_pairs`` instead.
    """
    from ahnlich_spark.functions import similarity as S

    b = benchmark.select(
        F.col(id_col).alias("_bid"), F.col(vec_col).alias("_bvec")
    )
    cos = S.cosine_similarity(F.col(vec_col), F.col("_bvec"), precision)
    # project the cosine ONCE in the join output: the BNLJ predicate
    # already paid for it; re-evaluating the 3-fold inside the agg would
    # double the array traversals and drag _bvec through the shuffle
    hits = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(b), cos >= F.lit(threshold))
        .select(id_col, cos.alias("_cos"))
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.max("_cos").alias("max_cos"),
        )
    )
