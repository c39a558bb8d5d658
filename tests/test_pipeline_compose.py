"""The composed training-data pipeline gate
(entry_queries.pipeline_dedup_quality_pack): stage semantics hold
through the composition, and the whole lineage keeps the shuffle
budget its docstring promises — the property that only shows up
composed, not in the per-stage gates."""

import re

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.entry_queries import QUERIES, _t
from ahnlich_spark.functions import text as X


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    return QUERIES["pipeline_dedup_quality_pack"](spark, sf_dir)


def test_pipeline_plan_shuffle_budget(packed):
    """~5 shuffles end to end: wordset window, gram dedup + doc rollup,
    the decontamination anti-join's probe side, and the pack window —
    the benchmark gram side and the contaminated-id side must both be
    BROADCAST, never shuffled. A 100x corpus scales the scan, not the
    exchange count."""
    plan = packed._jdf.queryExecution().executedPlan().toString()
    shuffles = re.findall(r"Exchange hashpartitioning", plan)
    assert len(shuffles) <= 5, plan
    assert plan.count("BroadcastExchange") >= 1, plan


def test_pipeline_output_respects_every_stage(spark, sf_dir, packed):
    """Every packed doc survives each upstream stage's own rule: it is
    its wordset group's keep-best representative, passes the quality
    subset, is not benchmark-contaminated, and comes from a target
    mixture source."""
    out = packed.collect()
    assert out, "pipeline produced no batches"
    ids = {r["doc_id"] for r in out}
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    kept = docs.filter(F.col("doc_id").isin(list(ids)))
    assert {r["source"] for r in out} <= {"src1", "src2", "src3"}
    # quality subset holds on every survivor
    bad = kept.filter(
        ~(
            (X.token_count(t) >= 5)
            & X.mean_token_len_e2(t).between(300, 1000)
            & ~t.contains("{")
            & (X.distinct_token_ratio_e4(t) >= 3000)
        )
    ).count()
    assert bad == 0
    # keep-best: no two survivors share a wordset fingerprint
    fps = kept.select(X.wordset_fingerprint(t).alias("fp"))
    assert fps.count() == fps.distinct().count()
    # decontamination: no survivor shares an 8-gram with src0
    from ahnlich_spark.operators.contamination import contaminated_docs

    n_contam = (
        contaminated_docs(kept, docs.filter(F.col("source") == "src0"), n=8)
        .count()
    )
    assert n_contam == 0


def test_incremental_agg_refresh_equals_full_recompute(spark, sf_dir):
    """The CDF-maintained aggregate equals a full recompute over the
    current store — the O(changes)-refresh contract, row for row."""
    out = QUERIES["incremental_agg_refresh"](spark, sf_dir)
    from ahnlich_spark.entry_queries import _MUT_FIXTURES
    import os as _os

    eng, _, _ = _MUT_FIXTURES[
        (id(spark.sparkContext), _os.path.abspath(sf_dir), "ivm")
    ]
    lab = F.col("meta")["label"]["s"]
    k0 = (
        F.round(F.element_at("key", 1).cast("double") * 1_000_000)
        .cast("long")
    )
    full = eng.store_df("ivm").groupBy(lab.alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(k0).cast("long").alias("k0_e6_sum"),
    )
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want and got


def test_pipeline_batches_respect_token_budget(packed):
    """Prefix-sum packing: every batch's token total stays under
    budget + (max doc tokens - 1), docs are never split, and
    seq_in_batch is dense from 1 within each batch."""
    rows = packed.collect()
    budget = 256
    max_doc = max(r["n_tok"] for r in rows)
    batches = {}
    for r in rows:
        batches.setdefault((r["source"], r["batch_id"]), []).append(r)
    for (_, _), members in batches.items():
        assert sum(m["n_tok"] for m in members) <= budget + max_doc - 1
        seqs = sorted(m["seq_in_batch"] for m in members)
        assert seqs == list(range(1, len(members) + 1))


@pytest.fixture(scope="module")
def cluster_packed(spark, sf_dir):
    return QUERIES["pipeline_cluster_dedup_pack"](spark, sf_dir)


def test_cluster_pipeline_plan_shuffle_budget(cluster_packed):
    """The cluster-keyed composition's FINAL plan stays within one
    exchange of the wordset gate's budget: the near-dup component table
    is BROADCAST into the corpus scan (the corpus is never shuffled
    before the cluster-keyed keep-best window), then the shared tail.
    The LSH pair pipeline's own shuffles run once inside
    connected_components' bounded edge materialization and never appear
    in this lineage."""
    import re

    plan = cluster_packed._jdf.queryExecution().executedPlan().toString()
    shuffles = re.findall(r"Exchange hashpartitioning", plan)
    assert len(shuffles) <= 6, plan
    # the component join must be broadcast, never a shuffled join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan


def test_cluster_pipeline_keeps_cluster_best(spark, sf_dir, cluster_packed):
    """Every packed doc is its near-dup CLUSTER's keep-best
    representative: no two survivors share a cluster, and each survivor
    scores >= every clustermate (ties broken by lowest doc_id)."""
    from ahnlich_spark.entry_queries import D
    from ahnlich_spark.operators.cluster import dedup_clusters

    out = cluster_packed.collect()
    assert out, "cluster pipeline produced no batches"
    ids = {r["doc_id"] for r in out}
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup_pairs(docs, threshold=0.5)
    clusters = dedup_clusters(docs.select("doc_id"), pairs.select("i", "j"))
    t = F.col("text")
    member = clusters.join(
        docs.select("doc_id", X.distinct_token_ratio_e4(t).alias("s")),
        "doc_id",
    )
    rows = member.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    seen_clusters = set()
    for r in rows:
        if r["doc_id"] not in ids:
            continue
        cid = r["cluster_id"]
        assert cid not in seen_clusters  # one survivor per cluster
        seen_clusters.add(cid)
        best = min(by_cluster[cid], key=lambda m: (-m["s"], m["doc_id"]))
        assert r["doc_id"] == best["doc_id"], (cid, r["doc_id"])
