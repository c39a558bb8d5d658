"""Near-duplicate clustering: connected components over a pair table.

The last stage of every large-scale dedup pipeline: candidate pairs
(from MinHash-LSH / SimHash / embedding pruning) form an undirected
graph; each connected component is one duplicate cluster and the
pipeline keeps a single representative per cluster.

Reference parity: the reference engine stops at pairwise similarity
(``ahnlich/similarity/``); clustering is part of this repo's
training-data-pipeline extension surface.

Algorithm: iterative min-label propagation. ``label(v)`` starts as
``v`` and each round becomes ``min(label(v), min over neighbors
label(u))``; a fixpoint is reached after ``diameter(G)`` rounds, at
which point every vertex carries the smallest vertex id in its
component. Dedup graphs are near-cliques (a cluster of near-identical
docs collides in MOST bands), so the diameter — and the round count —
is tiny in practice; `max_iter` bounds the worst case.

Scale notes (100 TB):
- Each round is one shuffle: edges join labels on dst (both sorted by
  the same key across rounds — AQE reuses the exchange layout) plus a
  groupBy-min with map-side partial aggregation.
- ``localCheckpoint`` after every round truncates the lineage so the
  plan does not grow linearly with iterations (on a real cluster use
  ``checkpoint()`` to reliable storage instead — flag ``reliable=True``).
- The convergence check is a count() per round — one tiny job; the
  alternating large-star/small-star algorithm (Kiveris et al., "CC in
  MapReduce and Beyond") would cut round count to O(log^2 n) for
  pathological chain graphs; min-propagation is the better constant
  for the near-clique graphs dedup produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "i",
    dst: str = "j",
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """(node, component) for every node that appears in ``pairs``;
    ``component`` is the smallest node id in its connected component.

    ``pairs`` is undirected: (i, j) and (j, i) are the same edge and
    only one needs to be present."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # edges participates in EVERY round's join — materialize once so the
    # (possibly expensive) upstream pair pipeline is not recomputed per
    # round. Near-dup edge tables are tiny relative to the corpus.
    edges = _persist(edges, reliable)
    # Half the labels never improve via in-edges (the component minimum
    # itself), so seed every endpoint with its own id once up front.
    labels = edges.select(F.col("a").alias("n")).distinct().select(
        "n", F.col("n").alias("lbl")
    )
    labels = _persist(labels, reliable)
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges["b"] == labels["n"])
            .groupBy("a")
            .agg(F.min("lbl").alias("nb_min"))
        )
        nxt = (
            labels.join(prop, labels["n"] == prop["a"], "left")
            .select(
                "n",
                "lbl",
                F.least(F.col("lbl"), F.coalesce("nb_min", "lbl")).alias("nlbl"),
            )
        )
        nxt = _persist(nxt, reliable)
        changed = nxt.filter(F.col("nlbl") < F.col("lbl")).count()
        labels = nxt.select("n", F.col("nlbl").alias("lbl"))
        if changed == 0:
            break
    return labels.select(F.col("n").alias("node"), F.col("lbl").alias("component"))


def _persist(df: DataFrame, reliable: bool) -> DataFrame:
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "i",
    dst: str = "j",
) -> DataFrame:
    """(doc_id, cluster_id, is_rep) over ALL docs: docs joined to their
    near-dup component, singletons forming their own cluster. The
    representative (``is_rep``) is the smallest doc_id in the cluster —
    a dedup pipeline keeps exactly the ``is_rep`` rows.

    The component table is tiny relative to the corpus (only docs with
    at least one near-dup appear), so the join back to ``docs`` is a
    broadcast — the corpus itself is never shuffled."""
    comp = connected_components(pairs, src, dst)
    out = docs.join(
        F.broadcast(comp), docs[id_col] == comp["node"], "left"
    ).select(
        docs[id_col].alias("doc_id"),
        F.coalesce("component", docs[id_col]).alias("cluster_id"),
    )
    return out.withColumn(
        "is_rep", (F.col("doc_id") == F.col("cluster_id")).cast("int")
    )
