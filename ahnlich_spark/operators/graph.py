"""Iterative graph algorithms over edge DataFrames.

The near-dup clustering operator (operators/cluster.py) already covers
connected components; this module adds importance propagation —
PageRank — the canonical *iterative* analytics shape: a fixed number of
join + aggregate rounds where round N's output is round N+1's input.

Scale shape: each iteration is ONE shuffle (contributions grouped by
destination). Ranks are |V|-sized — the small side of every join — and
are broadcast when ``broadcast_ranks=True`` (the default, right
whenever |V| fits an executor); for graphs whose node table outgrows
the broadcast limit pass ``broadcast_ranks=False`` and the joins run
keyed, letting AQE pick the strategy per stage (an explicit broadcast
hint is honored unconditionally by Spark, so it must be OFF, not
demoted, at that scale). The edge list is materialized once up front
(localCheckpoint) so the iterative lineage references the stored edges,
not a re-execution of however expensive a pipeline produced them.

Determinism discipline (cross-engine oracle contract): all rank math is
scaled-integer with floor division — contribution = rank div out_degree,
next = teleport + damping * sum(contributions) div 100 — so Spark and
any ANSI-SQL engine produce bit-identical BIGINT ranks at every
iteration; no float ever enters the loop. Bound: ``damping_e2 *
received`` must stay under 2^63, i.e. total rank mass below ~1e17
(about 1e8 nodes all feeding one hub) — far past any real corpus, but
past it DuckDB errors loudly while non-ANSI Spark would wrap, so runs
at that scale should set spark.sql.ansi.enabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000  # ranks are e9 fixed-point BIGINTs


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_e2: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Unnormalized integer PageRank over a directed edge list.

    Every node starts at RANK_SCALE; each round every node sends
    ``rank div out_degree`` along each out-edge and is re-scored as
    ``RANK_SCALE * (100 - damping_e2) div 100  +
    damping_e2 * sum(received) div 100``. Nodes with no out-edges
    (dangling) keep only the teleport term — callers who need the
    classic redistribution should symmetrize the edge list first
    (undirected graphs have no dangling nodes by construction).

    Returns (node, rank_e9). The iteration count is fixed and small by
    contract (importance ranking converges geometrically; pipelines run
    3-10 rounds), so the plan is ``iterations`` chained shuffles — each
    round one groupBy(dst) — with the out-degree table computed once.

    ``broadcast_ranks`` hints the |V|-sized rank/degree/contribution
    tables into broadcast joins; set it False for graphs whose node
    table exceeds executor broadcast limits and the joins run keyed.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not (0 < damping_e2 < 100):
        raise ValueError("damping_e2 must be in (0, 100)")

    # materialize the edge list once: the iterative lineage references
    # these stored rows `iterations`-plus times (contrib each round,
    # nodes, outdeg) — without this, an expensive upstream pipeline
    # (a fact-fact join, a dedup pass) would re-execute per reference
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    small = F.broadcast if broadcast_ranks else (lambda df: df)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # exact Python-int teleport mass — never a float division
    teleport = (RANK_SCALE * (100 - damping_e2)) // 100

    ranks = nodes.select("node", F.lit(RANK_SCALE).cast("long").alias("rank_e9"))
    for _ in range(iterations):
        contrib = (
            e.join(small(ranks), e["src"] == ranks["node"])
            .join(small(outdeg), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_e9 div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("received"))
        )
        ranks = (
            nodes.join(small(contrib), "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.expr(
                        f"({damping_e2} * coalesce(received, 0L)) div 100"
                    ).cast("long")
                ).alias("rank_e9"),
            )
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    broadcast_labels: bool = True,
) -> DataFrame:
    """Synchronous label propagation (semi-supervised classification
    over a graph): seed nodes carry fixed labels; every round, each
    node adopts the MODE of its out-neighbors' current labels (vote
    count desc, then smallest label — fully deterministic), seeds never
    change, and nodes whose neighbors are all unlabeled keep their
    current label. After ``iterations`` rounds, returns (node, label)
    for every node of the graph or seed set (label NULL if never
    reached).

    The training-data use: spread trusted quality/domain/topic labels
    from a small audited seed set across the near-dup or k-NN graph —
    e.g. ``cluster.knn_graph`` edges — to label the whole corpus.

    Scale shape: each round is one join of the edge list against the
    |V|-sized label table (broadcast by default, keyed when
    ``broadcast_labels=False``) + one (node, label) vote aggregation
    with map-side combine + one |V|-bounded argmax window. The label
    table is localCheckpoint'd per round so the lineage stays flat.
    Votes are integer counts — any SQL engine replays every round
    bit-for-bit."""
    from pyspark.sql import Window

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    small = F.broadcast if broadcast_labels else (lambda df: df)
    s = seeds.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("_seed")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(s.select("node"))
        .distinct()
    )
    labels = nodes.join(small(s), "node", "left").select(
        "node", F.col("_seed").alias("lab")
    ).localCheckpoint()
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lab").asc())
    for _ in range(iterations):
        votes = (
            e.join(
                small(labels.filter(F.col("lab").isNotNull())),
                e["dst"] == F.col("node"),
            )
            .groupBy(F.col("src").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", F.col("lab").alias("_best"))
        )
        labels = (
            labels.join(small(best), "node", "left")
            .join(small(s), "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_seed"), F.col("_best"), F.col("lab")).alias("lab"),
            )
            .localCheckpoint()
        )
    return labels.select("node", F.col("lab").alias(label_col))


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact per-node triangle participation over an undirected edge
    list — the clustering-coefficient / community-density primitive
    (spam rings in link graphs, tightly-knit source clusters in a crawl
    corpus). Input edges may be directed/duplicated; they are
    canonicalized (a < b, distinct, self-loops dropped) first.

    Algorithm: degree-ordered orientation (compact-forward). Each
    undirected edge points from the endpoint that is SMALLER under
    (degree, id) order to the larger, so every wedge (u -> v, u -> w)
    is generated at its lowest-degree corner — per-node fan-out is
    bounded by out-degree <= O(sqrt(m)) on any graph, the classic fix
    for the hub blow-up an id-ordered a<b<c join suffers (a low-id hub
    would pair all its neighbors). One join closes each wedge against
    the oriented edge (v, w). Every triangle is counted exactly once,
    then credited to all three corners.

    Scale shape: degree table = one aggregation of the edge list; the
    wedge join and the closing join shuffle on single node keys; no
    CartesianProduct anywhere. Pure integer/comparison algebra — any
    SQL engine replays it row-for-row (gate ``graph_triangles``).

    Returns (node, n_tri), one row per node in >= 1 triangle.
    """
    a, b = F.col(src), F.col(dst)
    # materialize the canonical edge list once: it is referenced by the
    # degree aggregation and both sides of the orientation join, and the
    # caller's edge pipeline (e.g. the full minhash near-dup pass) must
    # not re-execute per reference
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("degb"))
    lower_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    o = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("dega")).otherwise(F.col("degb")).alias("du"),
            F.when(lower_first, F.col("degb")).otherwise(F.col("dega")).alias("dv"),
        )
    )
    o = o.localCheckpoint(eager=False)  # read 3x: both wedge sides + closure
    e1 = o.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    e2 = o.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedge_order = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2"))
    )
    wedges = e1.join(e2, "u").filter(wedge_order)
    tri = wedges.join(
        o.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"],
        "left_semi",
    ).select("u", "v1", "v2")
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v1").alias("node")))
        .unionAll(tri.select(F.col("v2").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri")
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping_e2: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Personalized PageRank: identical propagation to ``pagerank`` but
    ALL teleport mass returns to the ``seeds`` set — ranks measure
    proximity to the seeds rather than global importance. The
    graph-expansion primitive: seed with a query's known-relevant nodes
    (docs, suppliers, domains) and the top non-seed ranks are the
    related entities a plain similarity lookup misses.

    Seeds start at RANK_SCALE, everything else at 0; each round
    ``rank = (seed ? teleport : 0) + damping * received div 100`` —
    the same e9 fixed-point floor-division discipline as ``pagerank``,
    bit-identical across engines and partitionings. Returns
    (node, rank_e9) for ALL nodes (non-seed nodes unreachable from the
    seeds hold rank 0).

    Scale shape: one shuffle per round; the seed flag joins onto the
    |V|-sized node table once up front."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not (0 < damping_e2 < 100):
        raise ValueError("damping_e2 must be in (0, 100)")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    small = F.broadcast if broadcast_ranks else (lambda df: df)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    sd = seeds.select(F.col(seed_col).alias("node")).distinct().withColumn(
        "is_seed", F.lit(1)
    )
    nodes = nodes.join(small(sd), "node", "left").select(
        "node", F.coalesce("is_seed", F.lit(0)).alias("is_seed")
    ).localCheckpoint()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    teleport = (RANK_SCALE * (100 - damping_e2)) // 100

    ranks = nodes.select(
        "node",
        (F.col("is_seed") * RANK_SCALE).cast("long").alias("rank_e9"),
    )
    for _ in range(iterations):
        contrib = (
            e.join(small(ranks), e["src"] == ranks["node"])
            .join(small(outdeg), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_e9 div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("received"))
        )
        ranks = (
            nodes.join(small(contrib), "node", "left")
            .select(
                "node",
                (
                    (F.col("is_seed") * teleport).cast("long")
                    + F.expr(
                        f"({damping_e2} * coalesce(received, 0L)) div 100"
                    ).cast("long")
                ).alias("rank_e9"),
            )
        )
    return ranks


def kcore(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_survivors: bool = True,
) -> DataFrame:
    """Fixed-round k-core peel over a SYMMETRIZED edge list: each round
    drops every node whose current degree is below ``k`` together with
    its edges, and keeps peeling the remainder. Returns
    (node, degree) for the nodes still alive after ``rounds`` rounds,
    with their degree inside the surviving subgraph.

    The k-core is the classic density filter of web/citation-graph
    cleaning (peel the tail of weakly-connected pages before computing
    authority); peel DEPTH — not graph size — bounds the rounds needed,
    and real graphs peel in a handful of rounds. The round count is a
    fixed contract (like ``pagerank``'s iterations) so the result is a
    pure function of (edges, k, rounds) on any engine: an un-converged
    peel is the same un-converged peel everywhere. Callers who need
    proof of convergence compare ``rounds`` and ``rounds + 1`` outputs
    — equal frames certify the true k-core.

    Scale shape: each round is ONE degree aggregation (map-side
    combined) plus two semi joins against the |V|-sized survivor set
    (broadcast by default; pass ``broadcast_survivors=False`` past
    executor broadcast limits and AQE picks the strategy). The edge
    frame is re-checkpointed every round so the iterative lineage stays
    O(1)-deep instead of re-running all prior rounds per reference.

    Directed callers: pass the symmetrized union (as ``graph_pagerank``
    builds) — degree here means total incident edges of the undirected
    graph, counted once per (src, dst) direction row.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")

    small = F.broadcast if broadcast_survivors else (lambda df: df)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(F.col("src").alias("node"))
        e = (
            e.join(small(keep), e["src"] == keep["node"], "left_semi")
            .join(small(keep), e["dst"] == keep["node"], "left_semi")
            .localCheckpoint()
        )
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )


def adamic_adar_links(
    edges: DataFrame,
    top_n: int = 100,
    max_degree: int = 1_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Link prediction over an undirected graph: for every NON-adjacent
    pair sharing >= 1 neighbor, the common-neighbor count and the
    Adamic-Adar score [Adamic & Adar 2003] — sum over shared neighbors
    z of 1/ln(deg(z)), the classic friends-of-friends ranking that
    discounts promiscuous hubs. Returns the top ``top_n`` rows
    (a, b, n_common, aa_e6) ordered (aa_e6 desc, n_common desc, a, b).

    Determinism: each neighbor's weight is e6-rounded ONCE from the
    exact double 1e6/ln(deg) — ln of an integer degree is the same
    double on any engine — and scores are integer SUMS of those
    weights, so ranking ties break identically everywhere. deg(z) >= 2
    for any common neighbor, so ln never hits zero.

    Scale shape: wedges are generated by ONE self-join of the neighbor
    table on z — each z fans out deg(z)*(deg(z)-1)/2 pairs, so z's
    with deg > ``max_degree`` are EXCLUDED up front (the standard hub
    cut; a hub's 1/ln(deg) weight is the smallest signal in the score
    and every pair it would propose is quadratic cost). The worst case
    is therefore ``max_degree^2 / 2`` wedge rows PER NODE AT THE CAP:
    the default 1_000 bounds any single z at ~500k rows — one task's
    worth — where 10_000 would allow 5*10^7 per hub and stall the
    stage on a handful of keys (same posture as the other capped
    operators, e.g. SIG_HISTOGRAM_MAX_PLANES). Raise it only with a
    measured degree histogram in hand. Existing edges leave via one
    left_anti on the (small) edge set; the final ordering is a bounded
    TakeOrdered, never a global sort."""
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbr = und.select(F.col("a").alias("n"), F.col("b").alias("z")).unionAll(
        und.select(F.col("b").alias("n"), F.col("a").alias("z"))
    )
    deg = nbr.groupBy(F.col("z").alias("zz")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    wz = (
        deg.filter((F.col("deg") >= 2) & (F.col("deg") <= int(max_degree)))
        .select(
            "zz",
            F.round(F.lit(1_000_000.0) / F.log(F.col("deg").cast("double")))
            .cast("long")
            .alias("w_e6"),
        )
    )
    # neighbor rows keyed by z, restricted to weight-eligible z's
    nz = nbr.join(wz, nbr["z"] == wz["zz"]).select("n", "z", "w_e6")
    l, r = nz.alias("l"), nz.alias("r")
    wedges = (
        l.join(r, (F.col("l.z") == F.col("r.z")) & (F.col("l.n") < F.col("r.n")))
        .groupBy(F.col("l.n").alias("a"), F.col("r.n").alias("b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum(F.col("l.w_e6")).cast("long").alias("aa_e6"),
        )
    )
    fresh = wedges.join(und, ["a", "b"], "left_anti")
    return fresh.orderBy(
        F.desc("aa_e6"), F.desc("n_common"), F.asc("a"), F.asc("b")
    ).limit(int(top_n))
