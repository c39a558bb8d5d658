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
            "vec_id", P.encode_expr("embedding", books).alias("codes")
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


def test_pq_batch_matches_single(spark, sf_dir):
    """Batch ADC with one probe reproduces the single-probe pq_top_k id
    ranking exactly (same codebooks, candidates, tie-breaks)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = P.train_codebooks()
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    single = [r["vec_id"] for r in P.pq_top_k(emb, q, books, k=10, candidates=64).collect()]
    batch = P.pq_top_k_batch(
        emb, [(0, q)], books, k=10, candidates=64,
        metric="euclidean_distance",
    )
    got = [r["vec_id"] for r in batch.orderBy("rank_n").collect()]
    assert got == single


def test_pq_batch_multi_probe_self_rank1(spark, sf_dir):
    """Every probe's rank-1 under euclidean ADC+rescore is itself."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = P.train_codebooks()
    probes = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 6).collect()
    ]
    out = P.pq_top_k_batch(emb, probes, books, k=3, candidates=64)
    top1 = {r["qid"]: r["vec_id"] for r in out.collect() if r["rank_n"] == 1}
    assert top1 == {pid: pid for pid, _ in probes}


def test_engine_batch_pq(spark, tmp_path_factory, sf_dir):
    """Engine batch path over the persisted code artifact."""
    from ahnlich_spark import Engine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(300)
    rows = emb.collect()
    eng = Engine(spark, str(tmp_path_factory.mktemp("pq_batch_wh")))
    eng.create_store("v", dimension=64)
    eng.set("v", [(list(r["embedding"]), {"i": str(r["vec_id"])}) for r in rows])
    eng.create_non_linear_algorithm_index("v", ["pq"])
    probes = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows[:4]]
    out = eng.get_sim_n_batch("v", probes, closest_n=2, algorithm="pq").collect()
    assert len(out) == 8
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["qid"], []).append(r)
    for qid, rs in by_probe.items():
        rk1 = [r for r in rs if r["rank_n"] == 1][0]
        # rank-1 is the probe's own row (similarity/distance 0)
        assert abs(rk1["similarity"]) < 1e-5


def test_ivfpq_residual_full_probe_is_exact(spark, sf_dir):
    """With every bucket probed and an unbounded candidate stage the
    residual pipeline must return the exact top-k — any deviation means
    the residual encode/ADC chain itself is broken, not the pruning."""
    import numpy as np
    from pyspark.sql import functions as F

    from ahnlich_spark.operators.pq import (
        ivfpq_residual_top_k,
        train_codebooks,
        train_codebooks_residual,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    cents = train_codebooks(m=1, k=32, sample=512, iters=10)[0]
    books = train_codebooks_residual(cents)
    got = [r["vec_id"] for r in ivfpq_residual_top_k(
        emb, q, cents, books, k=10, n_probe=len(cents), candidates=10**6
    ).collect()]
    qlit = F.array(*[F.lit(x) for x in q])
    exact = [r["vec_id"] for r in emb.select(
        "vec_id",
        F.sqrt(F.aggregate(
            F.zip_with(F.col("embedding").cast("array<double>"), qlit,
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v)).alias("d"),
    ).orderBy("d", "vec_id").limit(10).collect()]
    assert got == exact


def test_ivfpq_residual_recall_floor(spark, sf_dir):
    """Pruned config (n_probe=8/32, 128 candidates): recall@10 holds a
    floor on the fixture — the quality contract of the composition."""
    import numpy as np
    from pyspark.sql import functions as F

    from ahnlich_spark.operators.pq import (
        ivfpq_residual_top_k,
        train_codebooks,
        train_codebooks_residual,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_codebooks(m=1, k=32, sample=512, iters=10)[0]
    books = train_codebooks_residual(cents)
    hits = total = 0
    for probe_id in (0, 7, 23):
        q = [float(x) for x in
             emb.filter(F.col("vec_id") == probe_id).first()["embedding"]]
        got = {r["vec_id"] for r in ivfpq_residual_top_k(
            emb, q, cents, books, k=10, n_probe=8, candidates=128).collect()}
        qlit = F.array(*[F.lit(x) for x in q])
        exact = {r["vec_id"] for r in emb.select(
            "vec_id",
            F.sqrt(F.aggregate(
                F.zip_with(F.col("embedding").cast("array<double>"), qlit,
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, v: acc + v)).alias("d"),
        ).orderBy("d", "vec_id").limit(10).collect()}
        hits += len(got & exact)
        total += 10
    assert hits / total >= 0.7, hits / total


def test_residual_codebooks_deterministic_and_distinct():
    """Residual training is a pure function of (corpus, centroids) and
    genuinely differs from raw-vector codebooks."""
    import numpy as np

    from ahnlich_spark.operators.pq import (
        train_codebooks,
        train_codebooks_residual,
    )

    cents = train_codebooks(m=1, k=32, sample=512, iters=10)[0]
    a = train_codebooks_residual(cents)
    b = train_codebooks_residual(cents)
    assert np.array_equal(a, b)
    raw = train_codebooks()
    assert a.shape == raw.shape and not np.array_equal(a, raw)
