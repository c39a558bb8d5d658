"""Product quantization (PQ) with asymmetric-distance (ADC) search —
the canonical 100 TB ANN compression: each d-dim f32 vector becomes m
one-byte codes (one k-way codebook per d/m-dim subspace), a 32x storage
and shuffle shrink at d=64/m=8, and queries rank candidates from a tiny
per-query lookup table without touching the raw vectors.

Determinism discipline (the repo-wide cross-engine contract):

- Codebooks are trained ONCE, driver-side, on a bounded sample read in
  vec_id order with plain numpy float64 Lloyd iterations seeded by the
  lowest-id sample rows — a pure function of the training parquet, so
  the Spark expressions and the DuckDB oracle can share the SAME
  centroid literals (the pattern functions/projection.py established
  for its sign matrix). Training on a fixed sample corpus then encoding
  the full corpus is how PQ is deployed in practice (FAISS trains on a
  sample, not the index set).
- Every distance is a sequential left-associative fold — bit-identical
  to SQL ``+`` chains and ``list_sum(list_transform(...))`` (verified
  by the projection gates).
- Code assignment ties break to the LOWEST centroid index in both
  engines (``array_position`` / ``list_position`` return the first
  match of the exact minimum double).

Scale notes:
- Encoding is scan-local whole-stage codegen: m*k compact folds per row
  (foldable literal centroid arrays), zero shuffle, zero Python.
- ADC search is a scan-local m-term chain over the code column plus a
  bounded TakeOrderedAndProject — same shape as the linear GetSimN
  scan, but reading 8 bytes per row instead of 256. The exact-rescore
  stage touches only ``candidates`` full vectors.
- At true scale, persist the (id, codes) table once (it IS the index
  artifact) and scan it instead of re-encoding per query; the engine's
  ANN artifact machinery (plans/engine.create_non_linear_algorithm_index)
  shows the layout.

Reference parity: the reference's approximate mode is HNSW/KD-tree
(ahnlich/similarity/src/hnsw, kdtree.rs) over raw f32 vectors; PQ is
this repo's scale-path extension for the same GetSimN contract.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ahnlich_spark.functions import local_rows_df

# The fixed training corpus: PQ codebooks are a pure function of this
# parquet (bounded sample, deterministic Lloyd), shared verbatim by the
# Spark expressions and the DuckDB oracle literals.
PQ_TRAIN_DIR = os.environ.get("AHNLICH_PQ_TRAIN_DIR", "/root/testdata/sf0.001")

_CODEBOOK_CACHE: dict = {}


def train_codebooks(
    train_parquet: str | None = None,
    m: int = 8,
    k: int = 16,
    sample: int = 512,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """(m, k, dsub) float64 codebooks from deterministic Lloyd on the
    first ``sample`` vectors (by id) of the training parquet. No RNG:
    init = the k lowest-id sample subvectors; empty clusters keep their
    previous centroid; fixed iteration count."""
    path = train_parquet or os.path.join(PQ_TRAIN_DIR, "embeddings.parquet")
    key = (os.path.abspath(path), m, k, sample, iters)
    if key in _CODEBOOK_CACHE:
        return _CODEBOOK_CACHE[key]

    import pyarrow.parquet as pq_mod

    tbl = pq_mod.read_table(path, columns=[id_col, vec_col])
    pdf = tbl.to_pandas().sort_values(id_col).head(sample)
    X = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
    books = lloyd_codebooks(X, m, k, iters)
    _CODEBOOK_CACHE[key] = books
    return books


def lloyd_codebooks(X: np.ndarray, m: int, k: int, iters: int) -> np.ndarray:
    """Deterministic per-subspace Lloyd: init = the first k sample
    subvectors (caller supplies rows in a stable order), argmin ties to
    the lowest centroid index, empty clusters keep their centroid."""
    d = X.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        cent = sub[:k].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # lowest index on ties
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def train_codebooks_df(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    sample: int = 4096,
    iters: int = 10,
    vec_col: str = "key",
    id_col: str = "id",
) -> np.ndarray | None:
    """Codebooks from a bounded deterministic sample of a store
    DataFrame — the engine's index-build path. The sample is
    HASH-ORDERED by xxhash64(id) (tie-broken by id, so fully
    deterministic): ids are assigned in ingest order, so a first-N-by-id
    sample is exactly the disk-clustered slice that biases a quantizer
    at scale. orderBy+limit is TakeOrdered (per-partition top-N, no
    shuffle). Returns None when the store is empty or smaller than k."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)), F.asc(id_col))
        .limit(sample)
        .collect()
    )
    if len(rows) < k:
        return None
    X = np.stack([np.asarray(list(r[vec_col]), dtype=np.float64) for r in rows])
    return lloyd_codebooks(X, m, k, iters)


def _lit_doubles(values: Sequence[float]) -> Column:
    """Foldable double-array literal (split-of-string; repr round-trips
    doubles exactly) — keeps the expression tree compact."""
    return F.split(F.lit(",".join(repr(float(v)) for v in values)), ",").cast(
        "array<double>"
    )


def _sql_lit_arr(vals: Sequence[float]) -> str:
    """Foldable double-array literal in SQL text (same split-of-string
    shape as ``_lit_doubles``)."""
    return (
        "CAST(split('"
        + ",".join(repr(float(v)) for v in vals)
        + "', ',') AS ARRAY<DOUBLE>)"
    )


def encode_expr(vec_name: str, books: np.ndarray) -> Column:
    """ARRAY<INT>[m] of PQ codes for the column named ``vec_name``: per
    subspace, the index (0-based) of the nearest centroid, first-match
    tie-break.

    Expression-tree economy, learned the hard way: the literal m*k
    fold tree costs ~800 py4j round-trips to BUILD through the Column
    API (~7 s driver time per query) and, even parsed from SQL text,
    ~15k expression nodes for Catalyst to walk every optimization pass
    (~3 s more). This version is a few DOZEN nodes: the whole codebook
    rides in as one constant-folded ``from_json`` literal and the
    per-subspace distance arrays are nested ``transform`` lambdas —
    the distance array binds to a lambda variable, so the
    array_position/array_min pair reads it without duplicating the
    subtree. Same math, same fold order, bit-identical codes (the
    encode unit test pins numpy-exact agreement; the gate's DuckDB
    oracle pins cross-engine equality)."""
    import json

    m, k, dsub = books.shape
    bjson = json.dumps([[list(map(float, c)) for c in books[j]] for j in range(m)])
    b_lit = f"from_json('{bjson}', 'array<array<array<double>>>')"
    dists = (
        f"transform(sequence(0, {m - 1}), j -> "
        f"transform(element_at({b_lit}, j + 1), cent -> "
        f"aggregate(zip_with(CAST(slice({vec_name}, j * {dsub} + 1, {dsub}) AS ARRAY<DOUBLE>), "
        f"cent, (x, cc) -> (x - cc) * (x - cc)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))"
    )
    return F.expr(
        f"transform({dists}, darr -> CAST(array_position(darr, array_min(darr)) - 1 AS INT))"
    )


def adc_lut(query: Sequence[float], books: np.ndarray) -> List[List[float]]:
    """Per-query lookup table lut[j][c] = ||q_sub_j - centroid_jc||^2,
    computed with the SAME sequential fold order as the executors (plain
    Python float = IEEE double)."""
    m, k, dsub = books.shape
    lut: List[List[float]] = []
    for j in range(m):
        row = []
        for c in range(k):
            acc = 0.0
            for i in range(dsub):
                diff = float(query[j * dsub + i]) - float(books[j][c][i])
                acc = acc + diff * diff
            row.append(acc)
        lut.append(row)
    return lut


def adc_dist_expr(codes: Column, lut: List[List[float]]) -> Column:
    """Approximate squared distance: left-associative sum over
    lut[j][codes[j]] — an m-term chain of array lookups, scan-local."""
    acc: Column = F.lit(0.0)
    for j, row in enumerate(lut):
        acc = acc + F.element_at(_lit_doubles(row), F.element_at(codes, j + 1) + 1)
    return acc


def pq_top_k(
    df: DataFrame,
    query: Sequence[float],
    books: np.ndarray,
    k: int = 10,
    candidates: int = 128,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage PQ/ADC search: encode scan-locally (or scan a persisted
    code table), rank by ADC distance (bounded TakeOrderedAndProject),
    exact-rescore the survivors in the original space. Returns (id,
    dist) ascending, id tie-break."""
    q = [float(x) for x in query]
    codes = encode_expr(vec_col, books)
    lut = adc_lut(q, books)
    approx = adc_dist_expr(codes, lut)

    cand = (
        df.select(F.col(id_col), F.col(vec_col), approx.alias("_adc"))
        .orderBy(F.asc("_adc"), F.asc(id_col))
        .limit(candidates)
    )
    exact = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            _lit_doubles(q),
            lambda x, qq: (x - qq) * (x - qq),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cand.select(F.col(id_col), F.sqrt(exact).alias("dist"))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(k)
    )


def pq_top_k_batch(
    df: DataFrame,
    probes: Sequence[tuple],
    books: np.ndarray,
    k: int = 10,
    candidates: int = 128,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: Optional[str] = None,
    metric: str = "euclidean_distance",
    precision: str = "double",
    rank_col: str = "rank_n",
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Batch PQ/ADC search: top-k per probe for a whole batch in ONE
    plan. ``probes`` is a list of (probe_id, vector); each probe's ADC
    lookup table is computed driver-side (m*k doubles — tiny) and rides
    into the plan as broadcast DATA, so the store-side cost per probe is
    m array lookups over the code column instead of a d-dim kernel — at
    d=64/m=8 the candidate stage does 8 lookups per (row, probe) where
    the linear batch does 64 multiply-adds, and reads 8 bytes per row
    instead of 256.

    Stages: broadcast (qid, lut, qkey) x code scan -> ADC via one
    zip_with fold -> WindowGroupLimit keeps ``candidates`` per probe ->
    exact rescore of survivors under ``metric`` -> top-k per probe.
    The store never shuffles; the only wide exchange carries
    O(#probes * candidates) rows.

    ``code_col`` names a precomputed code column (the engine's persisted
    ``_ann_pqcode`` artifact); when absent the codes are encoded
    scan-locally from ``vec_col``."""
    from ahnlich_spark.functions import similarity as S
    from pyspark.sql import Window

    spark = df.sparkSession
    rows = []
    for pid, vec in probes:
        q = [float(x) for x in vec]
        rows.append((int(pid), q, adc_lut(q, books)))
    # bounded probe list: one slice, not #cores near-empty slices
    probes_df = local_rows_df(
        spark, rows, "qid long, qkey array<double>, lut array<array<double>>"
    )

    codes = F.col(code_col) if code_col else encode_expr(vec_col, books)
    # carry_cols ride through candidates to the output (e.g. the store's
    # meta column, so the engine's batch pq answers carry the same store
    # columns as every other get_sim_n_batch path)
    base = df.select(F.col(id_col), F.col(vec_col),
                     *[F.col(c) for c in carry_cols],
                     codes.alias("_codes"))
    joined = base.crossJoin(F.broadcast(probes_df))
    adc = F.aggregate(
        F.zip_with(
            F.col("_codes"),
            F.col("lut"),
            lambda c, row: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wc = Window.partitionBy("qid").orderBy(F.asc("_adc"), F.asc(id_col))
    cand = (
        joined.withColumn("_adc", adc)
        .withColumn("_crank", F.row_number().over(wc))
        .filter(F.col("_crank") <= candidates)
        .drop("_adc", "_crank", "_codes", "lut")
    )
    score = S.score_expr(metric, F.col(vec_col), F.col("qkey"), precision)
    wr = Window.partitionBy("qid").orderBy(
        S.closeness(metric, F.col("_score")).desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("_score", score)
        .withColumn(rank_col, F.row_number().over(wr))
        .filter(F.col(rank_col) <= k)
        .select(F.col("qid"), F.col(id_col), F.col(vec_col),
                *[F.col(c) for c in carry_cols],
                F.col("qkey").cast("array<float>").alias("qkey"),
                F.col(rank_col), F.col("_score").alias("similarity"))
    )


# ------------------------------------------- residual IVF-PQ (FAISS) --

def train_codebooks_residual(
    centroids: np.ndarray,
    train_parquet: str | None = None,
    m: int = 8,
    k: int = 16,
    sample: int = 512,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Codebooks trained on coarse-quantizer RESIDUALS (x - c_bucket(x))
    — the FAISS IVFPQ recipe: within a bucket, residuals concentrate
    near the origin with far less variance than raw vectors, so the
    same m x k code budget quantizes them with lower error and ADC
    ranks candidates more faithfully. Deterministic like
    ``train_codebooks``: fixed sample by id, assignment by the same
    cnorm - 2 x.c argmin rule the scan-side ``ann.assign_buckets``
    uses, Lloyd with lowest-id init."""
    path = train_parquet or os.path.join(PQ_TRAIN_DIR, "embeddings.parquet")
    cents = np.asarray(centroids, dtype=np.float64)
    key = ("resid", os.path.abspath(path), cents.tobytes(), m, k, sample, iters)
    if key in _CODEBOOK_CACHE:
        return _CODEBOOK_CACHE[key]
    import pyarrow.parquet as pq_mod

    tbl = pq_mod.read_table(path, columns=[id_col, vec_col])
    pdf = tbl.to_pandas().sort_values(id_col).head(sample)
    X = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
    cnorm = (cents * cents).sum(axis=1)
    assign = (cnorm[None, :] - 2.0 * (X @ cents.T)).argmin(axis=1)
    books = lloyd_codebooks(X - cents[assign], m, k, iters)
    _CODEBOOK_CACHE[key] = books
    return books


def _probe_buckets(query: Sequence[float], centroids: np.ndarray, n_probe: int):
    """The query's ``n_probe`` nearest buckets, ordered (distance,
    bucket) with the EXACT left-associative (q_i - c_i)^2 fold the SQL
    oracle's chains use — python float IS IEEE double, so engines can
    never disagree on the probe set."""
    picked = []
    for b in range(len(centroids)):
        acc = 0.0
        for i, qi in enumerate(query):
            diff = float(qi) - float(centroids[b][i])
            acc = acc + diff * diff
        picked.append((acc, b))
    picked.sort()
    return [b for _d, b in picked[:n_probe]]


def ivfpq_residual_top_k(
    df: DataFrame,
    query: Sequence[float],
    centroids: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    candidates: int = 128,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Residual IVF-PQ search: probe the ``n_probe`` nearest buckets,
    ADC-rank ONLY their rows using residual codes (encode against the
    row's own bucket centroid; the per-bucket query LUTs ride in as one
    constant-folded literal), exact-rescore the survivors. Composes the
    two classic 100 TB levers — IVF partition pruning and 8-byte-per-row
    ADC scans — with the residual trick that keeps recall close to a
    raw-vector scan at the same code budget.

    Expression economy: bucket->LUT dispatch is ONE ``F.expr`` —
    array_position over the picked-bucket literal picks the LUT slot,
    zip_with(lut_row, codes) + aggregate sums the m lookups — so the
    driver builds a handful of expression nodes, not n_probe * m
    Column-API calls."""
    import json

    q = [float(x) for x in query]
    cents = np.asarray(centroids, dtype=np.float64)
    picked = _probe_buckets(q, cents, n_probe)

    from ahnlich_spark.operators.ann import assign_buckets

    dfb = assign_buckets(df, cents, key_col=vec_col).filter(
        F.col("bucket").isin([int(b) for b in picked])
    )
    cents_json = json.dumps([[float(x) for x in c] for c in cents])
    cents_lit = f"from_json('{cents_json}', 'array<array<double>>')"
    resid_sql = (
        f"zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), "
        f"element_at({cents_lit}, bucket + 1), (x, c) -> x - c)"
    )
    codes = encode_expr(resid_sql, books)
    adc = residual_adc_expr(
        q, cents, books, codes_col="_codes", bucket_col="bucket",
        buckets=picked,
    )

    cand = (
        dfb.withColumn("_codes", codes)
        .select(F.col(id_col), F.col(vec_col), adc.alias("_adc"))
        .orderBy(F.asc("_adc"), F.asc(id_col))
        .limit(candidates)
    )
    exact = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            _lit_doubles(q),
            lambda x, qq: (x - qq) * (x - qq),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cand.select(F.col(id_col), F.sqrt(exact).alias("dist"))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(k)
    )


def train_codebooks_residual_df(
    df: DataFrame,
    centroids: np.ndarray,
    m: int = 8,
    k: int = 16,
    sample: int = 4096,
    iters: int = 10,
    vec_col: str = "key",
    id_col: str = "id",
) -> np.ndarray | None:
    """Residual codebooks from a store DataFrame — the engine's
    index-build path for ``{"pq": {"residual": true}}``. Same
    hash-ordered deterministic sample as ``train_codebooks_df``; each
    sample vector is assigned to its coarse bucket (the cnorm - 2 x.c
    rule ``ann.assign_buckets`` applies at scan time) and the Lloyd
    trainer sees x - c_bucket(x). Returns None below k rows."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)), F.asc(id_col))
        .limit(sample)
        .collect()
    )
    if len(rows) < k:
        return None
    X = np.stack([np.asarray(list(r[vec_col]), dtype=np.float64) for r in rows])
    cents = np.asarray(centroids, dtype=np.float64)
    cnorm = (cents * cents).sum(axis=1)
    assign = (cnorm[None, :] - 2.0 * (X @ cents.T)).argmin(axis=1)
    return lloyd_codebooks(X - cents[assign], m, k, iters)


def residual_encode_expr(
    vec_name: str,
    centroids: np.ndarray,
    books: np.ndarray,
    bucket_col: str = "_ann_bucket",
) -> Column:
    """PQ codes of the RESIDUAL (vector - its own bucket centroid):
    the centroid table rides in as one constant-folded literal indexed
    by the bucket column, so encode stays scan-local whole-stage
    codegen with zero joins."""
    import json

    cents_json = json.dumps([[float(x) for x in c] for c in np.asarray(centroids)])
    cents_lit = f"from_json('{cents_json}', 'array<array<double>>')"
    resid = (
        f"zip_with(CAST({vec_name} AS ARRAY<DOUBLE>), "
        f"element_at({cents_lit}, {bucket_col} + 1), (x, c) -> x - c)"
    )
    return encode_expr(resid, books)


def residual_luts(
    query: Sequence[float],
    centroids: np.ndarray,
    books: np.ndarray,
    buckets: Sequence[int],
) -> List[List[List[float]]]:
    """One ADC lookup table per bucket, for the query's RESIDUAL
    against that bucket's centroid — the single construction both the
    single-probe literal dispatch (residual_adc_expr) and the batch
    broadcast table (pq_top_k_batch_residual) share, so the two faces
    can never drift on fold order or dtype."""
    cents = np.asarray(centroids, dtype=np.float64)
    q = [float(x) for x in query]
    luts = []
    for b in buckets:
        qr = [q[i] - float(cents[int(b)][i]) for i in range(len(q))]
        luts.append(adc_lut(qr, books))
    return luts


def residual_adc_expr(
    query: Sequence[float],
    centroids: np.ndarray,
    books: np.ndarray,
    codes_col: str = "_ann_pqcode",
    bucket_col: str = "_ann_bucket",
    buckets: Optional[Sequence[int]] = None,
) -> Column:
    """Approximate distance for residual codes: the query's per-bucket
    LUT table rides in as ONE literal; each row picks its bucket's LUT
    by index and sums the m code lookups. With ``buckets`` (a pruned
    scan's probe set) only those LUTs ship — n_probe x m x k doubles —
    and rows dispatch by position in the probe list; without it the
    full n_buckets table ships so any row's bucket resolves. Callers
    passing ``buckets`` must have filtered the scan to exactly that
    set (a stray bucket would index slot 0 and error out loudly)."""
    import json

    cents = np.asarray(centroids, dtype=np.float64)
    blist = list(range(len(cents))) if buckets is None else [int(b) for b in buckets]
    luts = residual_luts(query, cents, books, blist)
    lut_json = json.dumps(luts)
    lut_lit = f"from_json('{lut_json}', 'array<array<array<double>>>')"
    if buckets is None:
        slot = f"{bucket_col} + 1"
    else:
        picked_lit = f"from_json('{json.dumps(blist)}', 'array<int>')"
        slot = f"CAST(array_position({picked_lit}, {bucket_col}) AS INT)"
    return F.expr(
        f"aggregate(zip_with(element_at({lut_lit}, {slot}), "
        f"{codes_col}, (lrow, cd) -> element_at(lrow, cd + 1)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def pq_top_k_batch_residual(
    df: DataFrame,
    probes: Sequence[tuple],
    centroids: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    candidates: int = 128,
    vec_col: str = "key",
    id_col: str = "id",
    code_col: str = "_ann_pqcode",
    bucket_col: str = "_ann_bucket",
    metric: str = "euclidean_distance",
    precision: str = "double",
    rank_col: str = "rank_n",
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Batch residual-IVF-PQ search: top-k per probe in ONE plan over a
    store carrying residual codes (codes taken against each row's own
    bucket centroid).

    ``probes`` is a list of (probe_id, vector, picked_buckets): each
    probe ships its OWN per-bucket LUT table (len(picked) x m x k
    doubles) as broadcast data, and the join condition restricts every
    probe to exactly its picked bucket set — so per-probe results are
    IDENTICAL to the single-probe pruned path (the non-residual batch
    widens pools to the bucket union; residual dispatch can't, and
    therefore doesn't). The caller prunes the scan to the union of all
    picked sets and bounds the batch so the LUT payload stays a
    broadcast-sized artifact (the engine chunks by total bucket count).

    Stages: broadcast (qid, qkey, buckets, luts) x bucket-pruned code
    scan -> join on array_contains(buckets, bucket) -> ADC as one
    zip_with fold against the bucket's LUT slot -> per-probe candidate
    window -> exact rescore under ``metric`` -> top-k per probe. The
    store side reads 8-byte codes + a bucket int per row, never
    shuffles, and is scanned once for the whole batch.
    """
    from pyspark.sql import Window

    from ahnlich_spark.functions import similarity as S

    spark = df.sparkSession
    cents = np.asarray(centroids, dtype=np.float64)
    rows = []
    for pid, vec, picked in probes:
        blist = [int(b) for b in picked]
        rows.append((
            int(pid), [float(x) for x in vec], blist,
            residual_luts(vec, cents, books, blist),
        ))
    # bounded probe list: one slice, not #cores near-empty slices
    probes_df = local_rows_df(
        spark, rows,
        "qid long, qkey array<double>, buckets array<int>, "
        "luts array<array<array<double>>>",
    )

    base = df.select(
        F.col(id_col), F.col(vec_col),
        *[F.col(c) for c in carry_cols],
        F.col(code_col).alias("_codes"),
        F.col(bucket_col).cast("int").alias("_bkt"),
    )
    joined = base.join(
        F.broadcast(probes_df),
        F.array_contains(F.col("buckets"), F.col("_bkt")),
    )
    lut_row = F.element_at(
        F.col("luts"), F.array_position(F.col("buckets"), F.col("_bkt")).cast("int")
    )
    adc = F.aggregate(
        F.zip_with(lut_row, F.col("_codes"), lambda row, c: F.element_at(row, c + 1)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wc = Window.partitionBy("qid").orderBy(F.asc("_adc"), F.asc(id_col))
    cand = (
        joined.withColumn("_adc", adc)
        .withColumn("_crank", F.row_number().over(wc))
        .filter(F.col("_crank") <= candidates)
        .drop("_adc", "_crank", "_codes", "_bkt", "buckets", "luts")
    )
    score = S.score_expr(metric, F.col(vec_col), F.col("qkey"), precision)
    wr = Window.partitionBy("qid").orderBy(
        S.closeness(metric, F.col("_score")).desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("_score", score)
        .withColumn(rank_col, F.row_number().over(wr))
        .filter(F.col(rank_col) <= k)
        .select(
            F.col("qid"), F.col(id_col), F.col(vec_col),
            *[F.col(c) for c in carry_cols],
            F.col("qkey").cast("array<float>").alias("qkey"),
            F.col(rank_col),
            F.col("_score").alias("similarity"),
        )
    )
