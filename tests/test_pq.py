"""Product quantization: deterministic codebooks, encode semantics,
ADC recall vs exact ground truth, and the scan-local plan shape."""

import numpy as np
from pyspark.sql import functions as F

from ahnlich_spark.operators import pq as P


def test_codebooks_deterministic():
    a = P.train_codebooks()
    b = P.train_codebooks()
    assert a.shape == (8, 16, 8)
    assert np.array_equal(a, b)


def test_encode_nearest_centroid(spark):
    """Codes match a numpy argmin re-computation exactly (incl. the
    first-match tie-break)."""
    books = P.train_codebooks()
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    got = {
        r["vec_id"]: r["codes"]
        for r in emb.select(
            "vec_id", P.encode_expr(F.col("embedding"), books).alias("codes")
        ).collect()
    }
    for r in emb.collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        want = []
        for j in range(8):
            sub = v[j * 8 : (j + 1) * 8]
            d2 = ((books[j] - sub[None, :]) ** 2).sum(axis=1)
            want.append(int(d2.argmin()))
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_pq_recall_vs_exact(spark, sf_dir):
    """recall@10 >= 0.8 against brute-force exact euclidean top-10 —
    mirrors the reference's SIFT recall assertion for its approximate
    mode (sift_dataset_validation.rs)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    books = P.train_codebooks()
    approx = {r["vec_id"] for r in P.pq_top_k(emb, q, books, k=10, candidates=128).collect()}

    exact_d = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(x) for x in q]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    exact = {
        r["vec_id"]
        for r in emb.select("vec_id", exact_d.alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id")).limit(10).collect()
    }
    assert len(approx & exact) >= 8


def test_pq_candidate_plan_scan_local(spark):
    """Encode + ADC ranking is a single scan into a bounded top-k: no
    Exchange hashpartitioning (only the TakeOrdered gather), no
    BatchEvalPython, no Join."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = P.train_codebooks()
    q = [0.0] * 64
    out = P.pq_top_k(emb, q, books, k=10, candidates=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
