"""Physical-plan quality gates.

Correctness tests prove the operators compute the right answer at small
SF; these tests pin the PLAN PROPERTIES that decide whether the same
code survives a 1000-executor / 100 TB run:

- predicate pushdown + column pruning reach the parquet scan,
- small-side joins broadcast instead of shuffling the big side,
- shuffle (Exchange) counts stay at the algebraic minimum,
- per-row Python never appears in queries built from native expressions.

A regression here won't change any result — it would silently turn a
scan-local plan into a full-table shuffle at scale, which is exactly the
class of bug row-count tests can't catch.
"""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.functions import similarity as S
from ahnlich_spark.functions import text as X


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(plan: str) -> int:
    # "formatted" prints each operator once in the tree ("+- Exchange (4)")
    # and once in the detail list ("(4) Exchange"); count detail entries
    # so every physical Exchange is counted exactly once.
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ------------------------------------------------------------ pushdown --

def test_filter_pushdown_reaches_parquet_scan(docs):
    plan = plan_of(docs.filter(F.col("lang") == "en").select("doc_id"))
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan


def test_column_pruning_reaches_parquet_scan(docs):
    plan = plan_of(docs.select("doc_id", X.token_count(F.col("text")).alias("n")))
    m = re.search(r"ReadSchema: (struct<[^\n]*)", plan)
    assert m, plan
    read = m.group(1)
    assert "doc_id" in read and "text" in read, read
    # untouched columns must NOT be read off disk
    assert "source" not in read and "n_chars" not in read, read


def test_topk_needs_no_join_or_shuffle_of_the_store(emb):
    """GetSimN linear scan: score is a scan-local expression; top-k is
    TakeOrderedAndProject (bounded heap per partition + driver merge) —
    the whole plan must be joinless and exchange-free."""
    from ahnlich_spark.operators.topk import top_k_similar

    q = [0.1] * 64
    store = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("key"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    plan = plan_of(top_k_similar(store, q, S.COSINE, 10))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    assert n_exchanges(plan) == 0, plan


def test_exact_dedup_is_single_shuffle_with_partial_agg(docs):
    from ahnlich_spark.operators.dedup import exact_dedup_groups

    plan = plan_of(exact_dedup_groups(docs))
    # map-side partial aggregation before the one hash exchange
    assert plan.count("HashAggregate") >= 2, plan
    assert n_exchanges(plan) == 1, plan


def test_minhash_signatures_stay_jvm_side(docs):
    """The signature aggregation must be pure codegen (no Python workers,
    no interpreted higher-order folds in the aggregate)."""
    from ahnlich_spark.operators.dedup import minhash_signature_table

    plan = plan_of(minhash_signature_table(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # one shuffle (the did groupBy) with map-side partial aggregation
    assert plan.count("HashAggregate") >= 2, plan
    assert n_exchanges(plan) <= 2, plan  # groupBy + optional fan-out repartition


def test_get_pred_is_scan_plus_filter_only(engine, spark, sf_dir):
    """GetPred compiles to scan->filter->project: no shuffle, no join,
    regardless of whether the predicate key is 'indexed' (the reference's
    index-vs-scan dispatch is free in Spark; SURVEY 2.2)."""
    from ahnlich_spark.operators.predicates import Equals

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50).collect()
    engine.create_store("plans_pred", dimension=64, predicates=["label"])
    engine.set(
        "plans_pred",
        [(list(r["embedding"]), {"label": str(r["label"])}) for r in emb],
    )
    plan = plan_of(engine.get_pred("plans_pred", Equals("label", "1")))
    assert "Join" not in plan, plan
    assert n_exchanges(plan) == 0, plan


def test_engine_set_probes_store_with_broadcast_batch(engine, spark, sf_dir):
    """Two scale contracts of SET into a populated store: (a) the
    counting join must broadcast the (small) batch and stream the
    (100 TB) store side — a shuffled store here would be the single
    worst scaling bug the engine could have; (b) the write must be an
    O(batch) delta segment whose plan never touches the base files."""
    captured = {}
    import ahnlich_spark.sources.store_io as sio

    orig_delta = sio.write_delta

    def spy_delta(spark_, catalog, meta, upserts=None, tombstone_ids=None):
        captured["delta_plan"] = plan_of(upserts)
        return orig_delta(spark_, catalog, meta, upserts, tombstone_ids)

    DataFrame = type(spark.range(1))  # the concrete (classic) class
    orig_first = DataFrame.first

    def spy_first(self):
        captured.setdefault("count_plan", plan_of(self))
        return orig_first(self)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(40).collect()
    engine.create_store("plans_set", dimension=64)
    batch = [(list(r["embedding"]), {}) for r in emb]
    engine.set("plans_set", batch)  # base version
    captured.clear()
    sio.write_delta, DataFrame.first = spy_delta, spy_first
    try:
        engine.set("plans_set", [(list(emb[0]["embedding"]), {"k": "v"})])
    finally:
        sio.write_delta, DataFrame.first = orig_delta, orig_first
    count_plan = captured["count_plan"]
    assert "BroadcastHashJoin" in count_plan, count_plan
    assert "SortMergeJoin" not in count_plan, count_plan
    # the delta write is batch-only: no join, no base parquet scan
    meta = engine.catalog.get_store("plans_set")
    delta_plan = captured["delta_plan"]
    assert "Join" not in delta_plan, delta_plan
    assert engine.catalog.store_path(meta) not in delta_plan, delta_plan


def test_multimodal_ops_add_no_shuffle(docs):
    """Media bytes must never leave their scan partition (mapInPandas is
    narrow); only extracted features may flow onward."""
    from ahnlich_spark.operators import multimodal as MM

    media = MM.media_table_from_documents(docs)
    for out in (MM.image_metadata(media), MM.audio_metadata(media)):
        assert n_exchanges(plan_of(out)) == 0, plan_of(out)


def test_text_analysis_is_pure_scan_local_codegen(docs):
    """Every text-analysis scalar is a scan-local native expression:
    no Python eval, no exchange, one codegen span over scan+project."""
    out = docs.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tokens"),
        X.lang_id(F.col("text")).alias("lang_pred"),
        X.fingerprint_md5(F.col("text")).alias("fp"),
    )
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert n_exchanges(plan) == 0, plan


# --------------------------------------------- sampling / hygiene ops --

def test_hash_sample_is_scan_local_no_shuffle(docs):
    from ahnlich_spark.operators.sampling import hash_sample

    plan = plan_of(hash_sample(docs.select("doc_id", "lang"), 0.25, salt="s"))
    assert n_exchanges(plan) == 0, plan
    assert "codegen id" in plan, plan  # filter runs inside WholeStageCodegen
    # only the two projected columns reach the scan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan, plan


def test_stratified_sample_is_scan_local_no_shuffle(docs):
    from ahnlich_spark.operators.sampling import stratified_sample

    plan = plan_of(
        stratified_sample(docs.select("doc_id", "lang"), {"en": 0.5}, default_rate=0.1)
    )
    assert n_exchanges(plan) == 0, plan


def test_pack_sequences_is_single_shuffle(spark, docs):
    from ahnlich_spark.functions import text as X
    from ahnlich_spark.operators.sampling import pack_sequences

    df = docs.withColumn("n_tokens", X.token_count(F.col("text")))
    plan = plan_of(pack_sequences(df, budget=256))
    # one exchange on the pack key serves both windows (batch assignment
    # and seq_in_batch share the source partitioning)
    assert n_exchanges(plan) == 1, plan


def test_contamination_broadcasts_benchmark_side(docs):
    from ahnlich_spark.operators.contamination import contaminated_docs

    out = contaminated_docs(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=8,
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the per-doc gram dedup is array_distinct BEFORE the explode —
    # scan-local, so the only exchanges are the (small) benchmark-side
    # distinct and the final per-doc hit count; a global distinct on
    # corpus (doc, gram) pairs would add a third
    assert n_exchanges(plan) <= 2, plan


def test_regional_revenue_single_wide_shuffle(spark):
    """The Q5-shaped multi-join must shuffle ONLY the fact-fact join
    (lineitem x orders): every dimension join is a BroadcastHashJoin,
    and the post-join aggregate adds at most the final (tiny) exchange."""
    from ahnlich_spark.entry_queries import QUERIES

    df = QUERIES["regional_revenue"](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan
    # fact-fact exchange (x2 sides) + one aggregate exchange at most
    assert n_exchanges(plan) <= 3, plan
    # the date filter reaches the orders parquet scan
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("orders")[1]


def test_new_scanlocal_ops_add_no_keyed_shuffle(spark, sf_dir):
    """Round-3 scan-local operators never shuffle BY KEY: the split is
    pure map work (zero exchanges); the sliding chunker allows only the
    parallelism-restoring ROUND-ROBIN fan-out (layout.fan_out re-spreads
    a few-file input before the explode — routing, not a keyed
    exchange; on a well-partitioned 100 TB input it's a no-op)."""
    from ahnlich_spark.operators.dedup import sliding_chunk_table
    from ahnlich_spark.operators.sampling import train_test_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    split_plan = plan_of(train_test_split(docs.select("doc_id"), test_rate=0.05))
    assert n_exchanges(split_plan) == 0, split_plan
    chunk_plan = plan_of(sliding_chunk_table(docs, chunk_tokens=32, stride=16))
    assert "hashpartitioning" not in chunk_plan, chunk_plan
    assert n_exchanges(chunk_plan) <= 1, chunk_plan


def test_subquery_gates_join_strategies(spark):
    """The round-4 subquery-algebra gates keep their intended physical
    shapes: EXISTS runs as a semi join with the date window pushed to
    the orders scan; NOT EXISTS as an anti join with the recency filter
    pushed to orders; the Q17 aggregate-join broadcasts both the brand
    part list and the per-part aggregate (no sort-merge join anywhere —
    the only exchanges are aggregations)."""
    from ahnlich_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"

    q4 = plan_of(QUERIES["order_priority_exists"](spark, sf))
    assert "LeftSemi" in q4, q4
    assert "o_orderdate" in q4.split("PushedFilters")[1].split("\n")[0], q4

    q22 = plan_of(QUERIES["dormant_rich_customers"](spark, sf))
    assert "LeftAnti" in q22, q22
    assert "o_orderdate" in q22[q22.index("orders"):].split("PushedFilters")[1].split(
        "\n"
    )[0], q22

    q17 = plan_of(QUERIES["small_quantity_revenue"](spark, sf))
    assert q17.count("BroadcastHashJoin") >= 3, q17
    assert "SortMergeJoin" not in q17, q17
    assert "p_brand" in q17, q17


def test_rebalance_filter_is_scan_local(spark, sf_dir):
    """Mixture rebalancing: after the one tiny planning aggregation the
    kept-rows filter is pure map work — literal-map threshold lookup +
    hash compare, zero exchanges, no join."""
    from ahnlich_spark.operators.sampling import rebalance_to_mixture

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    out = rebalance_to_mixture(
        docs, {"src0": 5, "src1": 3, "src2": 2}, weight_col="n_chars"
    )
    plan = plan_of(out)
    assert n_exchanges(plan) == 0, plan
    assert "Join" not in plan, plan


def test_tpch_completion_gates_plan_shapes(spark, sf_dir):
    """The round-4 warehouse-algebra completion set: each query's
    scale-critical plan property, pinned. At this SF AQE may broadcast
    even the fact-fact joins, so pins assert pushdown + exchange BOUNDS
    + broadcast floors rather than exact join physics."""
    from ahnlich_spark.entry_queries import QUERIES

    sf = sf_dir

    # Q6: pure filter-agg — predicates reach the scan, no join at all.
    q6 = plan_of(QUERIES["forecast_revenue_change"](spark, sf))
    pushed = q6.split("PushedFilters")[1].split("\n")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed, q6
    assert "Join" not in q6, q6
    assert n_exchanges(q6) <= 1, q6

    # Q7: all four dimensions broadcast; at most the one fact-fact
    # exchange pair plus the final tiny agg.
    q7 = plan_of(QUERIES["volume_shipping"](spark, sf))
    assert q7.count("BroadcastHashJoin") >= 4, q7
    assert n_exchanges(q7) <= 3, q7

    # Q8: part's type filter is pushed into ITS scan (prunes lineitem
    # through the broadcast join before the wide shuffle).
    q8 = plan_of(QUERIES["nation_market_share"](spark, sf))
    assert "EqualTo(p_type,PROMO)" in q8, q8
    assert "o_orderdate" in q8, q8
    assert q8.count("BroadcastHashJoin") >= 5, q8
    assert n_exchanges(q8) <= 3, q8

    # Q12: ship-year filter pushed into the lineitem scan.
    q12 = plan_of(QUERIES["late_shipment_priority"](spark, sf))
    assert "GreaterThanOrEqual(l_shipdate,1997-01-01" in q12, q12
    assert n_exchanges(q12) <= 3, q12

    # Q13: the fact side aggregates BEFORE the outer join (the
    # HashAggregate on o_custkey sits below the join in the tree), and
    # the priority exclusion reaches the orders scan.
    q13 = plan_of(QUERIES["customer_order_distribution"](spark, sf))
    assert "Not(EqualTo(o_orderpriority,5-LOW))" in q13, q13
    assert n_exchanges(q13) <= 3, q13

    # Q15: ONE scan of lineitem (the scalar max must not recompute the
    # aggregate lineage), no fact-sized sort.
    q15 = plan_of(QUERIES["top_supplier_revenue"](spark, sf))
    assert len(re.findall(r"^\(\d+\) Scan parquet", q15, re.MULTILINE)) == 2, q15  # lineitem + supplier
    assert n_exchanges(q15) <= 3, q15

    # Q18: the quantity rollup's shuffle partitioning is REUSED by the
    # orders join — one exchange total on the fact chain.
    q18 = plan_of(QUERIES["large_volume_customers"](spark, sf))
    assert n_exchanges(q18) <= 2, q18

    # Q21: the EXISTS/NOT-EXISTS pair compiles to window aggregates over
    # the join's own orderkey partitioning — NOT two more self-joins of
    # lineitem: exactly one lineitem scan, bounded exchanges.
    q21 = plan_of(QUERIES["sole_return_supplier"](spark, sf))
    # 3 parquet scans total — lineitem, orders, supplier — so lineitem
    # is read exactly once (a self-join rewrite would make it 5).
    assert len(re.findall(r"^\(\d+\) Scan parquet", q21, re.MULTILINE)) == 3, q21
    assert "Window" in q21, q21
    assert n_exchanges(q21) <= 4, q21
    assert "EqualTo(o_orderstatus,F)" in q21, q21

    # CUBE: one Expand + one exchange — all four grouping sets in a
    # single aggregation pass.
    qc = plan_of(QUERIES["events_rollup_cube"](spark, sf))
    assert "Expand" in qc, qc
    assert n_exchanges(qc) <= 1, qc


# ------------------------------------------- round-4 session ops --

def test_duplicate_spans_no_pairwise_join(docs):
    """The exact-substring span pipeline must stay linear: fp-keyed
    aggregation + join-back + one doc window — never a pairwise or
    nested-loop join, and the document text must not appear in any
    exchange (only ids/positions/fingerprints shuffle)."""
    from ahnlich_spark.operators.dedup import duplicate_spans

    plan = plan_of(duplicate_spans(docs, window_tokens=16))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # occurrence explode -> stats agg (2 exchanges incl. partial) ->
    # fp join-back -> doc window; allow the AQE-planned minimum
    assert n_exchanges(plan) <= 4, plan


def test_knn_graph_bucket_join_only(emb):
    """Candidate generation must be the bucket-key equi self-join —
    no all-pairs (cartesian / nested-loop) stage anywhere."""
    from ahnlich_spark.operators.cluster import knn_graph

    plan = plan_of(knn_graph(emb, k=3, n_sign_bits=8))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # projection + bucketing are scan-local: no exchange may appear
    # below the self-join's own bucket-key exchanges
    assert "PythonUDF" not in plan, plan


def test_incremental_dedup_corpus_reshingles_candidates_only(spark, sf_dir):
    """The corpus text scan on the verify side must be semi-join
    pruned to candidate ids — visible as a left_semi join in the plan —
    and the corpus side must never self-join."""
    from ahnlich_spark.operators.dedup import minhash_lsh_incremental_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    plan = plan_of(minhash_lsh_incremental_pairs(batch, corpus, threshold=0.5))
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kmv_distinct_two_window_levels(docs):
    """The sketch must dedupe on (group, hash) with partial map-side
    aggregation and take minima through the salted window level — no
    single global-order window over a whole group's distinct set."""
    from ahnlich_spark.operators.sketches import kmv_distinct

    sh = docs.select("source", F.explode(X.word_shingles(F.col("text"), 3)).alias("sh"))
    plan = plan_of(kmv_distinct(sh, "sh", ["source"], k=64))
    # both window levels present: the salted partitioning and the final
    # per-group one
    assert plan.count("RunningWindowFunction") >= 2 or plan.count("Window") >= 2, plan
    assert "HashAggregate" in plan, plan


def test_histogram_sketch_single_shuffle_summary(spark):
    """The histogram summary is ONE hash aggregation with map-side
    partials (bins computed scan-locally, no window, no join); the
    quantile extraction broadcasts the q table so the only joins are
    broadcast ones over the grid-bounded summary."""
    from ahnlich_spark.operators.sketches import (
        histogram_quantiles,
        histogram_summary,
    )

    df = spark.range(0, 10_000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") * 37 % 9973).alias("v")
    )
    summ = histogram_summary(df, "v", ["g"], bin_width=100)
    p = plan_of(summ)
    assert n_exchanges(p) == 1, p
    assert "Join" not in p and "Window" not in p, p
    pq = plan_of(histogram_quantiles(summ, [0.5, 0.9], ["g"], 100))
    assert "BroadcastNestedLoopJoin" in pq, pq  # the tiny q cross join
    assert "SortMergeJoin" not in pq and "CartesianProduct" not in pq, pq


def test_triangle_count_no_cartesian(spark):
    """Triangle counting must stay keyed joins end-to-end: no
    CartesianProduct / BroadcastNestedLoopJoin even on a hub-heavy
    graph (the degree-ordered orientation exists precisely so the hub
    never self-joins)."""
    from ahnlich_spark.operators.graph import triangle_count

    df = spark.range(0, 500).select(
        (F.col("id") % 97).alias("src"), ((F.col("id") * 31 + 7) % 97).alias("dst")
    )
    p = plan_of(triangle_count(df))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_classifier_and_dsir_plan_shapes(docs):
    """The linear classifier's only non-broadcast joins may be the two
    corpus-scaling ones (doc-id label join, vocab term join — both
    sides grow with the corpus, so SMJ is the CORRECT strategy); class
    totals and the doc prior ride in as 1-row broadcasts, and no
    Python ever appears. DSIR's scoring join must BROADCAST the
    fixed-4096-row bucket-weight table — the hashing trick exists so
    the profile join never shuffles the corpus."""
    from ahnlich_spark.operators.textstats import (
        dsir_select,
        log_odds_classifier_scores,
    )

    p = plan_of(log_odds_classifier_scores(docs, F.col("lang") == "en"))
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert n_exchanges(p) <= 6, p

    q = plan_of(dsir_select(docs, F.col("source") == "src0"))
    assert "BroadcastHashJoin" in q, q
    assert "SortMergeJoin" not in q, q
    assert "CartesianProduct" not in q, q
    assert n_exchanges(q) <= 4, q


def test_hll_registers_single_shuffle_no_window(docs):
    """HLL registers are ONE hash aggregation keyed (group, bucket) with
    map-side partial max — the value stream never crosses the shuffle
    (at most m rows of state per group do), and unlike KMV there is no
    window at all; the estimate adds only a second agg over the
    m-bounded register table."""
    from ahnlich_spark.operators.sketches import hll_distinct

    sh = docs.select("source", F.explode(X.word_shingles(F.col("text"), 3)).alias("sh"))
    plan = plan_of(hll_distinct(sh, "sh", ["source"], m=256))
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert n_exchanges(plan) == 2, plan
    assert "partial_max" in plan, plan


def test_kmv_set_ops_sketch_level_joins(docs):
    """The pairwise stage runs on sketch STATE only: the candidate-pair
    table is broadcast into every join (no SortMergeJoin anywhere) and
    there is no value-level cartesian product — the only non-equi join
    is the G x G pair enumeration over two distinct group lists."""
    from ahnlich_spark.operators.sketches import kmv_set_ops

    sh = docs.select("source", F.explode(X.word_shingles(F.col("text"), 3)).alias("sh"))
    plan = plan_of(kmv_set_ops(sh, "sh", "source", k=64))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


# ------------------------------------------------- round-8 plan pins --

def test_join_ivm_delta_broadcasts_both_delta_sides(engine):
    """cdf_join_agg_delta's two terms keep the BASE relation as the
    scanned side: both delta probes execute as BroadcastHashJoin (the
    explicit hint, not a size accident — pinned in the formatted plan),
    and the fold never sort-merge-joins the snapshots."""
    from ahnlich_spark.operators import ivm as IVM
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("pja", dimension=2, predicates=["k"])
    engine.create_store("pjb", dimension=2, predicates=["k", "w"])
    engine.set("pja", [([1.0, 0.0], {"k": "p"})])
    engine.set("pjb", [([5.0, 0.0], {"k": "p", "w": "2"})])
    engine.set("pja", [([2.0, 0.0], {"k": "p"})])
    engine.del_pred("pjb", Equals("w", "9"))        # no-op delta on B
    delta = IVM.cdf_join_agg_delta(
        engine, "pja", (1, 0), engine, "pjb", (1, 0),
        F.col("a_meta")["k"]["s"], F.col("b_meta")["k"]["s"],
        F.col("b_meta")["w"]["s"], {},
    )
    plan = plan_of(delta)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_keyed_mview_read_prunes_touched_buckets(spark, tmp_path):
    """The keyed sink's per-trigger read of current group values is
    partition-pruned: filtering the bucket column of a
    partitionBy('_vb') part leaves exactly the touched-bucket rows and
    the scan's partition count in the plan reflects the pruning."""
    df = spark.range(64).selectExpr(
        "cast(id as string) as group", "id as n",
        "cast(pmod(id, 8) as int) as _vb")
    path = str(tmp_path / "kv_part")
    df.write.mode("overwrite").partitionBy("_vb").parquet(path)
    rd = spark.read.parquet(path).filter(F.col("_vb").isin([3, 5]))
    plan = plan_of(rd)
    assert "PartitionFilters" in plan and "_vb" in plan, plan
    assert rd.count() == 16


def test_keyed_mview_struct_group_prunes_and_hashes_stably(spark, tmp_path):
    """The keyed sink's bucket recipe works unchanged when the group is
    a STRUCT (the distinct/quantile pair state): pmod(xxhash64(struct),
    buckets) is deterministic between writer and reader — a probe
    struct's bucket filter partition-prunes the part to exactly the
    matching pair's rows."""
    df = spark.range(64).selectExpr(
        "named_struct('g', cast(pmod(id, 4) as string), 'v', id) as group",
        "1 as n",
    ).withColumn(
        "_vb", F.pmod(F.xxhash64(F.col("group")), F.lit(8)).cast("int"))
    path = str(tmp_path / "kv_struct_part")
    df.write.mode("overwrite").partitionBy("_vb").parquet(path)
    # field TYPES must match the stored struct exactly: xxhash64 hashes
    # by physical type, so an int probe against a bigint field lands in
    # the wrong bucket (the sink never hits this — delta and parts
    # derive _vb from the same column expression)
    probe = F.struct(F.lit("2").alias("g"),
                     F.lit(14).cast("long").alias("v"))
    rd = (
        spark.read.parquet(path)
        .filter(F.col("_vb")
                == F.pmod(F.xxhash64(probe), F.lit(8)).cast("int"))
    )
    plan = plan_of(rd)
    assert "PartitionFilters" in plan and "_vb" in plan, plan
    hit = rd.filter(F.col("group").eqNullSafe(probe)).collect()
    assert len(hit) == 1 and hit[0]["group"]["v"] == 14
