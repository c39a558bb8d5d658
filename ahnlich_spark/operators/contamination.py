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
    # tokens staged through a projection boundary so the per-gram slice
    # lambda reads a materialized array (see text.ngrams_of)
    return (
        df.select(
            F.col(id_col).alias("did"),
            X.tokens(F.col(text_col)).alias("_toks"),
        )
        .select(
            "did",
            F.explode(X.shingles_of(F.col("_toks"), n)).alias("g"),
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
    are thousands of vectors), so it ships to every task in the UDF
    closure (same memory class as a broadcast) and the corpus NEVER
    shuffles — each corpus row's full answer (n_hits, max_cos) is
    complete inside its own scan partition, so the operator is one
    mapInPandas over the corpus with zero exchanges. Per Arrow batch a
    float64 GEMM (corpus_chunk @ bench.T) PREFILTERS candidate pairs at
    ``threshold - margin``; only those (rare by definition) are
    re-scored with the exact sequential fold — bit-for-bit the
    ``functions.similarity.cosine_similarity`` / DuckDB
    ``list_cosine_similarity`` operation order — which decides the
    actual ``>= threshold``. The GEMM's pairwise-summation error
    (~1e-13 at thousands of dims) is orders below the margin, so no
    true hit is ever missed; answers are identical to the old
    broadcast-nested-loop plan at ~20x less CPU (the interpreted
    higher-order-function fold ran on EVERY pair; now only on hits).
    For a benchmark side too big to ship, pre-prune with the LSH
    machinery of ``dedup.embedding_near_dup_pairs`` instead.
    """
    import math

    import numpy as np
    import pandas as pd

    if precision not in ("double", "float"):
        raise ValueError(f"precision must be double|float, got {precision!r}")
    # NULL vectors are not hits (the old broadcast-nested-loop plan
    # evaluated a null cosine and emitted nothing) — filter them BEFORE
    # densifying, on both sides, so they can't poison the np.array
    # build; ragged lengths get a clear error instead of an opaque
    # executor numpy failure.
    bench_rows = (
        benchmark.select(F.col(id_col), F.col(vec_col))
        .filter(F.col(vec_col).isNotNull())
        .collect()
    )
    spark = corpus.sparkSession
    id_type = corpus.schema[id_col].dataType.simpleString()
    cos_type = "double" if precision == "double" else "float"
    out_schema = f"{id_col} {id_type}, n_hits long, max_cos {cos_type}"
    if not bench_rows:
        return spark.createDataFrame([], out_schema)
    dims = {len(r[1]) for r in bench_rows}
    if len(dims) != 1:
        raise ValueError(
            f"benchmark vectors must share one dimension, got {sorted(dims)}"
        )
    dim = dims.pop()
    B = np.array([list(r[1]) for r in bench_rows], dtype=np.float64)
    Bn64 = np.sqrt((B * B).sum(axis=1))
    # exact fold error vs float64 GEMM: ~d*eps per accumulator — 1e-6
    # (double) / 1e-3 (f32 fold) dwarfs it at any realistic dimension
    margin = 1e-6 if precision == "double" else 1e-3
    thr = float(threshold)
    acc = np.float64 if precision == "double" else np.float32

    def _exact_cos(a, b):
        # the sequential left-associative fold of cosine_similarity():
        # sum(a_i*b_i) / (sqrt(sum a_i^2) * sqrt(sum b_i^2)), every op
        # in the accumulator precision, same order as the SQL aggregate
        dot = acc(0.0)
        na = acc(0.0)
        nb = acc(0.0)
        for x, y in zip(a, b):
            x = acc(x)
            y = acc(y)
            dot = dot + x * y
            na = na + x * x
            nb = nb + y * y
        denom = math.sqrt(float(na)) * math.sqrt(float(nb))
        if denom == 0.0:
            return None  # 0/0 -> NaN in SQL: never passes >= threshold
        return float(dot) / denom if precision == "double" else float(
            np.float32(float(dot) / denom)
        )

    def _scan(batches):
        for pdf in batches:
            vecs = pdf[vec_col].tolist()
            if not vecs:
                continue
            lens = {len(v) for v in vecs}
            if lens != {dim}:
                # checked BEFORE np.array: ragged lists would otherwise
                # die inside numpy with an inhomogeneous-shape error
                raise ValueError(
                    f"corpus vectors must all have the benchmark "
                    f"dimension {dim}; got lengths {sorted(lens)}"
                )
            V = np.array(vecs, dtype=np.float64)
            Vn = np.sqrt((V * V).sum(axis=1))
            denom = np.outer(Vn, Bn64)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(denom > 0, (V @ B.T) / denom, -np.inf)
            rows_i, cols_i = np.nonzero(sims >= thr - margin)
            if len(rows_i) == 0:
                continue
            out_ids, out_n, out_max = [], [], []
            for ri in np.unique(rows_i):
                a = vecs[ri]
                hits = [
                    c
                    for c in (
                        _exact_cos(a, B[ci]) for ci in cols_i[rows_i == ri]
                    )
                    if c is not None and c >= thr
                ]
                if hits:
                    out_ids.append(pdf[id_col].iloc[ri])
                    out_n.append(len(hits))
                    out_max.append(max(hits))
            if out_ids:
                yield pd.DataFrame(
                    {id_col: out_ids, "n_hits": out_n, "max_cos": out_max}
                )

    return (
        corpus.select(F.col(id_col), F.col(vec_col))
        # null vectors are not hits (old BNLJ plan: null cosine, no
        # row) — drop them JVM-side so the dense batch build never
        # sees them
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(_scan, out_schema)
    )
