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
