"""Deduplication operators for training-data pipelines.

Five strategies, each with a different cost/recall point at 100 TB:

- exact          — hash-groupBy on a normalized fingerprint. One shuffle
                   on a short string key; partial aggregation map-side.
- wordset        — order-insensitive bag-of-words fingerprint groupBy.
- ngram_jaccard  — exact pairwise Jaccard via shingle-explode self-join;
                   quadratic in the worst case, use LSH to pre-prune.
- minhash_lsh    — MinHash signatures banded into buckets; only bucket
                   collisions are verified exactly (the classic
                   shingle -> minhash -> band -> bucket-join pipeline).
- simhash        — 64-bit SimHash fingerprint; near-dups = small Hamming
                   distance (bit_count(xor)).
- embedding      — cosine over an embedding column (see ann/topk for the
                   scaled variant).

All set algebra is integer-exact: Jaccard thresholds compare
``c * denom_scale >= threshold_num * (na + nb - c)`` in BIGINT so that a
duckdb oracle reproduces results bit-for-bit with no float boundaries.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ahnlich_spark.functions import text as X
from ahnlich_spark.functions import similarity as S


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(keep_id, n_dups) per exact-content group: keep the smallest id.
    One shuffle on the md5 fingerprint; map-side partial agg."""
    return (
        df.select(F.col(id_col), X.fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("keep_id", "n_dups")
    )


def wordset_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive duplicate groups (same distinct-word set)."""
    return (
        df.select(F.col(id_col), X.wordset_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("keep_id", "n_dups")
    )


from ahnlich_spark.plans.layout import fan_out as _fan_out


def _shingle_table(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # NOTE: the pairwise pipelines reference this subtree more than once
    # (sizes, join side A, join side B). Measured on local[32] the
    # recompute is cheaper than persist() — tokenize+explode is pure
    # codegen'd map work, and caching costs a materialization barrier
    # plus block-manager traffic. At true 100 TB scale, stage shingles /
    # signatures to a table once and let each pass scan parquet.
    # tokens staged through a projection boundary: shingles_of slices
    # the materialized array per gram instead of re-running the
    # tokenizer per gram position (10x on this, the hottest scan of
    # every minhash/jaccard pipeline)
    return _fan_out(df).select(
        F.col(id_col).alias("did"),
        X.tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "did",
        F.explode(X.shingles_of(F.col("_toks"), n)).alias("sh"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs (i < j) with word-n-gram Jaccard >= threshold.
    Returns (i, j, inter, ni, nj) — integers only, so the comparison
    ``inter/(ni+nj-inter) >= threshold`` is evaluated as exact integer
    cross-multiplication (no float boundary).

    Plan shape: explode shingles -> prune unshared shingles -> self-join
    on shingle (one shuffle on the shingle key) -> groupBy pair ->
    integer filter. At scale, run minhash_lsh_candidate_pairs first and
    verify only candidates.

    The prune is semantics-free and load-bearing: a shingle held by only
    ONE document cannot contribute to any pairwise intersection, and in
    a real corpus the overwhelming majority of shingles are unshared —
    the df >= 2 semi-filter costs one extra aggregation over the shingle
    table but shrinks BOTH self-join inputs to the shared slice (~50x
    fewer join rows measured at sf0.1). Doc sizes (``nsh``) are counted
    BEFORE pruning, so Jaccard denominators are unchanged."""
    sh = _shingle_table(df, text_col, id_col, n)
    sizes = sh.groupBy("did").agg(F.count(F.lit(1)).alias("nsh"))
    shared = sh.join(
        sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_sh")).filter(F.col("df_sh") >= 2).select("sh"),
        "sh",
    )
    a, b = shared.alias("a"), shared.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.did") < F.col("b.did")))
        .groupBy(F.col("a.did").alias("i"), F.col("b.did").alias("j"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    frac = Fraction(threshold).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    return (
        inter.join(sizes.withColumnRenamed("did", "i").withColumnRenamed("nsh", "ni"), "i")
        .join(sizes.withColumnRenamed("did", "j").withColumnRenamed("nsh", "nj"), "j")
        # inter/(ni+nj-inter) >= num/den  <=>  den*inter >= num*(ni+nj-inter)
        .filter(F.lit(den) * F.col("inter") >= F.lit(num) * (F.col("ni") + F.col("nj") - F.col("inter")))
        .select("i", "j", "inter", "ni", "nj")
    )


def minhash_signature_table(
    df: DataFrame,
    n_hashes: int = 16,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(did, nsh, h0..h{n-1}) MinHash signatures + shingle count, in ONE
    aggregation over the exploded shingle table. Identical output to
    ``text.minhash_signature``: one md5-derived BIGINT base hash per
    shingle feeds all ``n_hashes`` universal-hash minima — 1 md5/row
    instead of n_hashes, LONG minima instead of 32-char-string minima,
    all inside whole-stage codegen with map-side partial aggregation
    (the higher-order-function fold is interpreted per-element and
    ~20x slower at document scale)."""
    sh = _shingle_table(df, text_col, id_col, shingle_n)
    return _signature_aggregate(sh, n_hashes)


def _signature_aggregate(sh: DataFrame, n_hashes: int) -> DataFrame:
    a, b = X.minhash_coeffs(n_hashes)
    hb = X.minhash_base_hash(F.col("sh"))
    aggs = [
        F.min((F.lit(a[i]) * hb + F.lit(b[i])) % X.MINHASH_P).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("did").agg(F.count(F.lit(1)).alias("nsh"), *aggs)


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: Optional[int] = None,
) -> DataFrame:
    """Candidate pairs (i < j) sharing at least one MinHash LSH band.
    shingle -> minhash -> band -> bucket self-join: the only shuffle is
    on the band key, and bucket sizes bound the join fan-out (no
    quadratic blow-up unless a bucket is genuinely hot)."""
    sig = minhash_signature_table(df, n_hashes, shingle_n, text_col, id_col)
    return _band_candidates(sig, n_bands, rows_per_band, max_bucket_size)


def drop_hot_buckets(
    bands: DataFrame, key_cols, max_bucket_size: Optional[int]
) -> DataFrame:
    """Anti-skew guard for LSH bucket self-joins: a bucket of size B
    yields B^2/2 candidate pairs, so one hot key (boilerplate shingles,
    empty-ish docs) can dominate the whole job at corpus scale. Buckets
    over ``max_bucket_size`` are excluded — the standard cap in
    large-scale dedup pipelines (members that frequent are near-dups of
    ALMOST everything in the bucket; handle them with exact dedup
    first). The hot-key list is tiny by construction -> broadcast
    anti-join, no extra shuffle of the band table."""
    if max_bucket_size is None:
        return bands
    hot = (
        bands.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > max_bucket_size)
        .select(*key_cols)
    )
    return bands.join(F.broadcast(hot), list(key_cols), "left_anti")


def _band_table(
    sig: DataFrame, n_bands: int, rows_per_band: int, extra: tuple = ()
) -> DataFrame:
    """(did, [*extra,] band) LSH band keys from a signature table."""
    band_cols = [
        F.concat_ws(
            "|",
            F.lit(str(b)),
            *[
                F.col(f"h{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ],
        )
        for b in range(n_bands)
    ]
    return sig.select(
        "did", *extra, F.explode(F.array(*band_cols)).alias("band")
    )


def _sized_band_table(
    sig: DataFrame,
    n_bands: int,
    rows_per_band: int,
    threshold: float,
    probe: bool,
) -> DataFrame:
    """(did, band, sb) composite (LSH band, Jaccard size bucket) keys
    — the degenerate-vocabulary guard (operators/blocking): when
    near-identical short texts collide on every band, the size bucket
    splits the hot bucket without losing any pair the threshold could
    accept. The probing side emits the 3 adjacent buckets (size
    filtering puts a qualifying pair within +-1), the build side one.
    """
    from ahnlich_spark.operators.blocking import jaccard_size_bucket

    bt = _band_table(sig, n_bands, rows_per_band, extra=("nsh",))
    sb = jaccard_size_bucket(F.col("nsh"), threshold)
    if not probe or float(threshold) == 1.0:
        # t=1 means exact set-size equality (the bucket IS the size):
        # adjacent-bucket probing would only admit size-mismatched
        # candidates that verification must discard
        return bt.select("did", "band", sb.alias("sb"))
    return (
        bt.select(
            "did", "band", F.explode(F.array(sb - 1, sb, sb + 1)).alias("sb")
        )
        # sb >= 0 always on the build side (nsh >= 1 -> ln >= 0), so a
        # probe's sb-1 = -1 row can never match: drop it instead of
        # shuffling a phantom key
        .filter(F.col("sb") >= 0)
    )


def _band_candidates(
    sig: DataFrame,
    n_bands: int,
    rows_per_band: int,
    max_bucket_size: Optional[int] = None,
) -> DataFrame:
    bands = _band_table(sig, n_bands, rows_per_band)
    bands = drop_hot_buckets(bands, ("band",), max_bucket_size)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.did") < F.col("b.did")))
        .select(F.col("a.did").alias("i"), F.col("b.did").alias("j"))
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 16,
    n_bands: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: Optional[int] = None,
) -> DataFrame:
    """LSH candidates verified by exact integer Jaccard: the scalable
    near-dup pipeline (candidates only, never all pairs). The signature
    aggregation also yields the per-doc shingle counts, so sizes need no
    extra pass over the corpus."""
    sh = _shingle_table(df, text_col, id_col, shingle_n)
    sig = _signature_aggregate(sh, n_hashes)
    cands = _band_candidates(sig, n_bands, rows_per_band, max_bucket_size)
    sizes = sig.select("did", "nsh")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        cands.join(a, cands["i"] == F.col("a.did"))
        .join(b, (cands["j"] == F.col("b.did")) & (F.col("a.sh") == F.col("b.sh")))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    frac = Fraction(threshold).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    return (
        inter.join(sizes.withColumnRenamed("did", "i").withColumnRenamed("nsh", "ni"), "i")
        .join(sizes.withColumnRenamed("did", "j").withColumnRenamed("nsh", "nj"), "j")
        .filter(F.lit(den) * F.col("inter") >= F.lit(num) * (F.col("ni") + F.col("nj") - F.col("inter")))
        .select("i", "j", "inter", "ni", "nj")
    )


def minhash_lsh_incremental_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 16,
    n_bands: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: Optional[int] = None,
    corpus_sig: Optional[DataFrame] = None,
    size_blocking: bool = False,
    new_sig: Optional[DataFrame] = None,
) -> DataFrame:
    """Incremental near-dup: an incoming BATCH checked against the
    HISTORICAL corpus (and against itself) — the production ingest
    shape. Candidates are batch x corpus and batch x batch band
    collisions only; the corpus is NEVER self-joined, so each ingest
    costs O(batch) shingling + a band join, not a corpus-wide rerun.

    ``size_blocking=True`` composes each band key with a Jaccard size
    bucket (operators/blocking.jaccard_size_bucket) — the guard for
    degenerate vocabularies where near-identical short texts collide
    on every band and one bucket holds the whole corpus. Lossless for
    the threshold (size filtering: a qualifying pair's shingle counts
    are within a factor 1/t, i.e. +-1 bucket, and the batch side
    probes the 3 adjacent buckets); ``max_bucket_size`` then counts
    per composite key. Opt-in: the default keys are unchanged.

    Ids must be disjoint across the two inputs. Returns
    (i, j, j_in_corpus, inter, ni, nj): ``i`` is always a batch doc,
    ``j`` is the matched corpus doc (``j_in_corpus`` = 1) or a batch
    peer with ``i < j`` (= 0); Jaccard >= threshold verified by exact
    integer cross-multiplication like ``minhash_lsh_dedup_pairs``.

    Scale design: pass ``corpus_sig`` (the persisted output of
    ``minhash_signature_table`` for the corpus — the artifact a real
    pipeline maintains across ingests) and the corpus TEXT is scanned
    only to re-shingle the candidate docs (semi-join on the tiny
    candidate id set); without it the corpus is signature-scanned once.
    The exact-verify join therefore touches batch shingles + candidate
    corpus shingles only."""
    sh_new = _shingle_table(new_df, text_col, id_col, shingle_n)
    # ``new_sig`` mirrors ``corpus_sig`` for the BATCH side: a caller
    # that already materialized the batch's signature table (the
    # streaming ingest sink persists it as a state part anyway) passes
    # it here so the shingle+minhash aggregation of the batch is not
    # re-derived for the band keys — the shingle table itself is still
    # needed for the exact-Jaccard verify join.
    sig_new = new_sig if new_sig is not None \
        else _signature_aggregate(sh_new, n_hashes)
    if corpus_sig is None:
        corpus_sig = minhash_signature_table(
            corpus_df, n_hashes, shingle_n, text_col, id_col
        )
    if size_blocking:
        bands_new = _sized_band_table(
            sig_new, n_bands, rows_per_band, threshold, probe=True
        ).withColumn("_new", F.lit(1))
        bands_old = _sized_band_table(
            corpus_sig, n_bands, rows_per_band, threshold, probe=False
        ).withColumn("_new", F.lit(0))
        key_cols = ("band", "sb")
    else:
        bands_new = _band_table(sig_new, n_bands, rows_per_band).withColumn(
            "_new", F.lit(1)
        )
        bands_old = _band_table(corpus_sig, n_bands, rows_per_band).withColumn(
            "_new", F.lit(0)
        )
        key_cols = ("band",)
    bands_all = drop_hot_buckets(
        bands_new.unionByName(bands_old), key_cols, max_bucket_size
    )
    a = bands_all.filter(F.col("_new") == 1).alias("a")
    b = bands_all.alias("b")
    join_cond = (F.col("a.band") == F.col("b.band")) & (
        (F.col("b._new") == 0) | (F.col("a.did") < F.col("b.did"))
    )
    if size_blocking:
        join_cond = join_cond & (F.col("a.sb") == F.col("b.sb"))
    cands = (
        a.join(b, join_cond)
        .select(
            F.col("a.did").alias("i"),
            F.col("b.did").alias("j"),
            (F.lit(1) - F.col("b._new")).cast("long").alias("j_in_corpus"),
        )
        .distinct()
    )
    # re-shingle ONLY the corpus docs that actually collided: the
    # candidate id set is tiny, so the semi-join prunes the corpus scan
    # down to the handful of docs the verify join needs.
    cand_old_ids = cands.filter(F.col("j_in_corpus") == 1).select(
        F.col("j").alias(id_col)
    ).distinct()
    sh_old_cand = _shingle_table(
        corpus_df.join(cand_old_ids, id_col, "left_semi"),
        text_col, id_col, shingle_n,
    )
    sh_verify = sh_new.unionByName(sh_old_cand)
    av, bv = sh_new.alias("av"), sh_verify.alias("bv")
    inter = (
        cands.join(av, cands["i"] == F.col("av.did"))
        .join(bv, (cands["j"] == F.col("bv.did")) & (F.col("av.sh") == F.col("bv.sh")))
        .groupBy("i", "j", "j_in_corpus")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes_new = sig_new.select(F.col("did"), F.col("nsh"))
    sizes_all = sizes_new.unionByName(corpus_sig.select("did", "nsh"))
    frac = Fraction(threshold).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    return (
        inter.join(sizes_new.withColumnRenamed("did", "i").withColumnRenamed("nsh", "ni"), "i")
        .join(sizes_all.withColumnRenamed("did", "j").withColumnRenamed("nsh", "nj"), "j")
        .filter(F.lit(den) * F.col("inter") >= F.lit(num) * (F.col("ni") + F.col("nj") - F.col("inter")))
        .select("i", "j", "j_in_corpus", "inter", "ni", "nj")
    )


def simhash_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(did, fp) SimHash fingerprints, identical bit-for-bit to
    ``text.simhash64`` but computed as 64 vote-sum aggregates over the
    exploded token table (whole-stage codegen + map-side combine)
    instead of the interpreted per-token higher-order fold — the same
    rewrite that made minhash 10x faster. NULL text coerces to the
    empty-document fingerprint (-1) rather than NULL.

    Token-hash bits come from md5 hex slices (one md5 per token row,
    60 low + 4 high bits — ``text.simhash_token_hash_lo/hi``), so the
    fingerprints are engine-portable and the duckdb oracle reproduces
    them bit-for-bit."""
    # explode_outer keeps token-less (empty text) docs as one NULL-token
    # row, so EVERY doc survives the aggregation and no second scan /
    # join is needed to restore them
    toks = _fan_out(df).select(
        F.col(id_col).alias("did"),
        F.explode_outer(X.tokens(F.col(text_col))).alias("tok"),
    ).select(
        "did",
        "tok",
        X.simhash_token_hash_lo(F.col("tok")).alias("hlo"),
        X.simhash_token_hash_hi(F.col("tok")).alias("hhi"),
    )
    # ones-count per bit instead of +-1 votes: vote_b >= 0 is exactly
    # 2*ones_b >= n_tokens, and SUM of a bare bit is ~2.5x cheaper per
    # row than SUM(CASE WHEN ... THEN 1 ELSE -1) across 64 aggregates.
    # count(tok)/sum skip the NULL row: an empty doc aggregates to
    # ntok=0, ones=0 -> 0 >= 0 on every bit -> fp = -1, matching
    # text.simhash64's fold over an empty array.
    votes = toks.groupBy("did").agg(
        F.count(F.col("tok")).alias("ntok"),
        *[
            F.coalesce(
                F.sum(
                    X.simhash_token_bit(F.col("hlo"), F.col("hhi"), b)
                ),
                F.lit(0),
            ).alias(f"o{b}")
            for b in range(64)
        ],
    )
    bit = lambda b: F.when(
        F.lit(2) * F.col(f"o{b}") >= F.col("ntok"),
        F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    fp_col = bit(0)
    for b in range(1, 64):
        fp_col = fp_col.bitwiseOR(bit(b))
    return votes.select("did", fp_col.alias("fp"))


def simhash_chunk_bounds(max_hamming: int) -> list:
    """(start, width) of the ``max_hamming + 1`` bit-chunks the 64-bit
    fingerprint is split into. Pigeonhole: a pair with <= max_hamming
    differing bits leaves at least one chunk untouched, so chunk-equality
    blocking has GUARANTEED 100% recall (not heuristic prefix blocking)."""
    n_chunks = max_hamming + 1
    base, extra = divmod(64, n_chunks)
    bounds, start = [], 0
    for c in range(n_chunks):
        width = base + (1 if c < extra else 0)
        bounds.append((start, width))
        start += width
    return bounds


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    stage: bool = True,
    max_bucket_size: Optional[int] = None,
) -> DataFrame:
    """EXACT near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale path: split the 64-bit fingerprint into ``max_hamming + 1``
    chunks and block on (chunk_index, chunk_value) — by pigeonhole every
    qualifying pair shares at least one whole chunk, so the self-join is
    per-bucket yet misses nothing (the multi-index scheme from the
    Google SimHash paper, Manku et al. WWW'07). Candidates are verified
    with the real bit_count(xor) so the result is EXACTLY the Hamming
    ball — duckdb-reproducible. Returns (i, j, hamming).

    ``stage=True`` materializes the fingerprint table once
    (localCheckpoint here; a parquet stage on a real cluster) — the
    64-aggregate subtree would otherwise be recomputed on both sides of
    the self-join."""
    fp = simhash_table(df, text_col, id_col)
    if stage:
        fp = fp.localCheckpoint(eager=False)
    def _chunk_val(start, width):
        shifted = F.shiftrightunsigned(F.col("fp"), start)
        if width >= 64:
            # max_hamming=0: ONE chunk spans the whole fingerprint and
            # (1 << 64) - 1 does not fit a LongType literal — the
            # unmasked shift IS the value
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    chunk_structs = [
        F.struct(F.lit(c).alias("c"), _chunk_val(start, width).alias("v"))
        for c, (start, width) in enumerate(simhash_chunk_bounds(max_hamming))
    ]
    ch = fp.select(
        "did", "fp", F.explode(F.array(*chunk_structs)).alias("ck")
    ).select("did", "fp", F.col("ck.c").alias("c"), F.col("ck.v").alias("v"))
    # opt-in skew cap: exact recall is guaranteed only without it
    ch = drop_hot_buckets(ch, ("c", "v"), max_bucket_size)
    a, b = ch.alias("a"), ch.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.did") < F.col("b.did")),
        )
        # a pair can collide on several chunks -> dedup BEFORE the
        # (cheap) hamming compute; fp is functionally dependent on did
        # so including it in the distinct keeps the join self-contained
        .select(
            F.col("a.did").alias("i"),
            F.col("b.did").alias("j"),
            F.col("a.fp").alias("fpi"),
            F.col("b.fp").alias("fpj"),
        )
        .distinct()
        .select(
            "i",
            "j",
            F.bit_count(F.col("fpi").bitwiseXOR(F.col("fpj"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    precision: str = "double",
    block_size: int = 1024,
    exact: Optional[bool] = None,
    brute_force_threshold: int = 8192,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 7,
    max_bucket_size: Optional[int] = 1024,
) -> DataFrame:
    """Pairs (i < j) with cosine >= threshold over an embedding column.
    Returns (i, j, cos_e4) with cos_e4 = round-half-up(cos * 10^4).

    DEFAULT (scale path): **LSH-pruned candidates** — random-projection
    signatures (one Arrow matmul per batch), banded into ``n_bands``
    buckets; only bucket collisions are cosine-verified. Work is
    O(candidates), never all-pairs. Recall for genuine near-dups
    (cos >= 0.9) is ~(1-(1-p^r)^b) with p = 1 - theta/pi, asserted
    >= 0.9 in tests/test_dedup.py.

    Corpora at or below ``brute_force_threshold`` rows (and ``exact=True``
    opt-in) run the **blocked all-pairs matmul** instead — exact at any
    threshold, quadratic work: rows hash into B = ceil(n/block_size)
    blocks, each unordered block pair is one task computing a float64
    GEMM over Arrow batches. Each row is replicated ~B+1 times through
    ONE shuffle; bound memory by block_size. (Low thresholds make LSH
    pruning meaningless — use exact=True there.)

    ``max_bucket_size`` caps LSH band buckets (drop_hot_buckets): a
    degenerate corpus (many near-identical or zero vectors) lands one
    giant bucket whose self-join is quadratic — the cap bounds candidate
    fan-out to ~max_bucket_size^2/2 per bucket. Recall note: members of
    a dropped bucket collide on SOME band with almost everything in it —
    such mass-duplicate groups should be collapsed by exact dedup first;
    pass ``max_bucket_size=None`` to disable the guard.

    ``id_col`` must be an integral column (ids are block-hashed and
    pair-ordered numerically); a string id would cast to NULL and
    silently drop every pair, so non-integral types refuse at plan
    time. Rows with a NULL embedding are excluded up front (a NULL
    vector has no cosine). ``precision`` picks the verify arithmetic:
    'double' (default) or 'float' (f32 GEMM — matches f32-normalized
    reference scores near the threshold boundary)."""
    from pyspark.sql import types as T

    if precision not in ("float", "double"):
        raise ValueError(f"precision must be float|double, got {precision!r}")
    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (T.LongType, T.IntegerType,
                                T.ShortType, T.ByteType)):
        raise ValueError(
            f"{id_col} must be an integral column (got {id_type}); a "
            f"non-numeric id casts to NULL and would silently drop "
            f"every pair"
        )
    df = df.filter(F.col(vec_col).isNotNull())
    n = df.count() if exact is not False else None
    if exact is None:
        exact = n <= brute_force_threshold
    if not exact:
        # the scale path never pays a corpus count for an explicit
        # exact=False — its work is O(candidates) by construction
        return _embedding_pruned_pairs(
            df, threshold, vec_col, id_col, n_planes, n_bands, seed,
            max_bucket_size, precision,
        )
    return _embedding_all_pairs(df, threshold, vec_col, id_col, block_size,
                                n, precision)


def _embedding_all_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str,
    id_col: str,
    block_size: int,
    n: int,
    precision: str = "double",
) -> DataFrame:
    import math

    import numpy as np
    import pandas as pd

    dtype = np.float32 if precision == "float" else np.float64
    n_blocks = max(1, math.ceil(n / block_size))
    base = df.select(
        F.col(id_col).cast("long").alias("rid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(n_blocks)).alias("blk"),
    )
    # Side A covers (blk, j>=blk); side B covers (i<=blk, blk): every
    # unordered block pair sees both members exactly once.
    a_pairs = F.transform(
        F.sequence(F.col("blk"), F.lit(n_blocks - 1).cast("long")),
        lambda j: F.struct(F.col("blk").alias("bi"), j.alias("bj"), F.lit("a").alias("side")),
    )
    # side B stops BELOW the diagonal: the diagonal block computes
    # against itself from its side-'a' copy alone, so emitting a 'b'
    # copy for (blk, blk) would shuffle one dead row per input row
    b_pairs = F.filter(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.col("blk")),
            lambda i: F.struct(i.alias("bi"), F.col("blk").alias("bj"),
                               F.lit("b").alias("side")),
        ),
        lambda s: s["bi"] != s["bj"],
    )
    tagged = base.select(
        "rid", "vec", F.explode(F.concat(a_pairs, b_pairs)).alias("bp")
    ).select("rid", "vec", "bp.bi", "bp.bj", "bp.side")

    thr = float(threshold)

    def block_cosine(pdf: pd.DataFrame) -> pd.DataFrame:
        diag = pdf["bi"].iat[0] == pdf["bj"].iat[0]
        asub = pdf[pdf["side"] == "a"]
        bsub = asub if diag else pdf[pdf["side"] == "b"]
        if not len(asub) or not len(bsub):
            return pd.DataFrame({"i": [], "j": [], "cos_e4": []}).astype(
                {"i": "int64", "j": "int64", "cos_e4": "int64"}
            )
        am = np.stack(asub["vec"].to_numpy()).astype(dtype)
        bm = am if diag else np.stack(bsub["vec"].to_numpy()).astype(dtype)
        an = np.linalg.norm(am, axis=1, keepdims=True)
        bn = an if diag else np.linalg.norm(bm, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = (am @ bm.T) / (an @ bn.T)
        ai = asub["rid"].to_numpy()
        bi = bsub["rid"].to_numpy()
        # orient every pair as (smaller id, larger id); diagonal blocks
        # keep i<j only once, cross blocks orient per element
        ii, jj = np.meshgrid(ai, bi, indexing="ij")
        keep = (cos >= thr) & (ii != jj)
        lo = np.minimum(ii[keep], jj[keep])
        hi = np.maximum(ii[keep], jj[keep])
        c = cos[keep]
        if diag:  # each unordered pair appears twice (i,j) and (j,i)
            first = ii[keep] < jj[keep]
            lo, hi, c = lo[first], hi[first], c[first]
        # round HALF_UP away from zero (Spark round / duckdb round)
        e4 = (np.sign(c) * np.floor(np.abs(c) * 10000 + 0.5)).astype(np.int64)
        return pd.DataFrame({"i": lo, "j": hi, "cos_e4": e4})

    return tagged.groupBy("bi", "bj").applyInPandas(
        block_cosine, "i long, j long, cos_e4 long"
    )


def _embedding_pruned_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str,
    id_col: str,
    n_planes: int,
    n_bands: int,
    seed: int,
    max_bucket_size: Optional[int] = 1024,
    precision: str = "double",
) -> DataFrame:
    """LSH-banded candidate generation + vectorized cosine verify.

    Plan shape (the one that survives 100 TB):
    1. signature: one Arrow-batched matmul adds a ``sig`` BIGINT per row
       (cheap, scan-local);
    2. bands: explode n_bands (band, bits) keys — the ONLY shuffle moves
       (rid, band-key) pairs, never vectors; buckets over
       ``max_bucket_size`` are dropped (drop_hot_buckets) so a
       degenerate corpus cannot turn one bucket quadratic;
    3. candidates: per-bucket self-join, distinct (i, j);
    4. verify: join the two vectors back by rid and compute the exact
       cosine row-wise in numpy (mapInPandas) — work is O(candidates).
    """
    import numpy as np
    import pandas as pd

    from ahnlich_spark.operators.ann import hyperplanes

    dtype = np.float32 if precision == "float" else np.float64
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame([], "i long, j long, cos_e4 long")
    planes = hyperplanes(len(first[0]), n_planes, seed).astype(np.float64)

    def sign_sig(batches):
        for keys in batches:
            mat = np.stack(keys.map(lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
            bits = (mat @ planes.T) >= 0
            sig = bits @ (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.Series(sig)

    from typing import Iterator

    sign_sig.__annotations__ = {
        "batches": Iterator[pd.Series], "return": Iterator[pd.Series]
    }
    from pyspark.sql import types as T

    sig_udf = F.pandas_udf(T.LongType())(sign_sig)

    base = _fan_out(df).select(
        F.col(id_col).cast("long").alias("rid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    sigd = base.select("rid", sig_udf(F.col("vec")).alias("sig"))
    r = max(1, n_planes // n_bands)
    band_keys = [
        F.struct(
            F.lit(b).alias("b"),
            F.shiftrightunsigned(F.col("sig"), b * r)
            .bitwiseAND(F.lit((1 << r) - 1))
            .alias("v"),
        )
        for b in range(n_bands)
    ]
    bands = sigd.select("rid", F.explode(F.array(*band_keys)).alias("bk")).select(
        "rid", F.col("bk.b").alias("b"), F.col("bk.v").alias("v")
    )
    bands = drop_hot_buckets(bands, ["b", "v"], max_bucket_size)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(F.col("a.rid").alias("i"), F.col("b.rid").alias("j"))
        .distinct()
    )
    pairs = (
        cand.join(base.select(F.col("rid").alias("i"), F.col("vec").alias("vi")), "i")
        .join(base.select(F.col("rid").alias("j"), F.col("vec").alias("vj")), "j")
    )
    thr = float(threshold)

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vi = np.stack(pdf["vi"].map(lambda v: np.asarray(v, dtype=dtype)).to_numpy())
            vj = np.stack(pdf["vj"].map(lambda v: np.asarray(v, dtype=dtype)).to_numpy())
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (vi * vj).sum(axis=1) / (
                    np.linalg.norm(vi, axis=1) * np.linalg.norm(vj, axis=1)
                )
            keep = cos >= thr
            c = cos[keep]
            e4 = (np.sign(c) * np.floor(np.abs(c) * 10000 + 0.5)).astype(np.int64)
            yield pd.DataFrame(
                {"i": pdf["i"].to_numpy()[keep], "j": pdf["j"].to_numpy()[keep], "cos_e4": e4}
            )

    return pairs.mapInPandas(verify, "i long, j long, cos_e4 long")


# ------------------------------------------------- cross-doc chunk dedup --


def doc_chunk_table(
    df: DataFrame,
    chunk_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(did, fp): md5 fingerprint of every ALIGNED ``chunk_tokens``-token
    passage of each document (tail shorter than a full chunk included).
    Whitespace-only documents contribute no rows.

    The chunking is pure scan-local array work (tokens -> sequence ->
    slice -> md5) inside whole-stage codegen — the text itself never
    shuffles, only 32-char fingerprints do."""
    # stage the token array: the per-chunk lambda slices a materialized
    # column instead of re-tokenizing per chunk (see text.ngrams_of)
    toks = F.col("_toks")
    k = F.size(toks)
    n_chunks = F.ceil(k / F.lit(chunk_tokens)).cast("int")
    idx = F.when(k > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        idx,
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens))),
    )
    return _fan_out(df).select(
        F.col(id_col).alias("did"), X.tokens(F.col(text_col)).alias("_toks")
    ).select(
        "did", F.explode(chunks).alias("fp")
    )


def sliding_chunk_table(
    df: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping sliding-window chunks — the RAG/embedding-ingest
    shape (stride < width keeps boundary context in two chunks, unlike
    the ALIGNED chunks of doc_chunk_table). Emits one row per window:
    (doc_id, chunk_idx, n_tokens, fp) where fp = md5 of the
    space-joined window and chunk_idx counts windows from 0 at stride
    steps; the final window starts at the last stride multiple below
    len(tokens) so the tail is always covered. Whitespace-only docs
    contribute no rows.

    Scan-local array work inside whole-stage codegen: text never
    shuffles; only (id, idx, 32-char fp) rows flow to the sink — the
    chunker of a 100 TB corpus is pure map work."""
    toks = F.col("_toks")  # staged below; see text.ngrams_of
    k = F.size(toks)
    n = F.when(
        k <= 0, F.lit(0)
    ).when(
        k <= chunk_tokens, F.lit(1)
    ).otherwise(
        F.floor((k - chunk_tokens + stride - 1) / F.lit(stride)).cast("int") + 1
    )
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    win = lambda i: F.slice(toks, i * stride + 1, chunk_tokens)
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("ci"),
            F.size(win(i)).alias("nt"),
            F.md5(F.concat_ws(" ", win(i))).alias("fp"),
        ),
    )
    return (
        _fan_out(df)
        .select(F.col(id_col).alias("doc_id"),
                X.tokens(F.col(text_col)).alias("_toks"))
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.ci").cast("long").alias("chunk_idx"),
            F.col("c.nt").cast("long").alias("n_tokens"),
            F.col("c.fp").alias("fp"),
        )
    )


def chunk_dup_stats(
    df: DataFrame,
    chunk_tokens: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_chunks, n_dup_chunks, dup_ratio_e4): the RefinedWeb /
    CCNet-style CROSS-document duplicated-passage fraction — how much of
    each document consists of aligned token chunks that also appear in
    at least ``min_docs - 1`` OTHER documents. (``doc_repetition`` is
    the within-doc complement.)

    Plan shape at 100 TB: two-level aggregation over the chunk table —
    (fp, did) partial counts absorb within-doc repeats map-side, then a
    per-fp distinct-doc count; the fp-keyed join back is the only other
    shuffle, and it carries fingerprints, not text. No pairwise join
    anywhere: cost is linear in corpus size."""
    ch = doc_chunk_table(df, chunk_tokens, text_col, id_col)
    per = ch.groupBy("fp", "did").agg(F.count(F.lit(1)).alias("c"))
    docs_per_fp = per.groupBy("fp").agg(F.count(F.lit(1)).alias("nd"))
    dup_c = F.when(F.col("nd") >= min_docs, F.col("c")).otherwise(F.lit(0))
    return (
        per.join(docs_per_fp, "fp")
        .groupBy("did")
        .agg(
            F.sum("c").cast("long").alias("n_chunks"),
            F.sum(dup_c).cast("long").alias("n_dup_chunks"),
        )
        .select(
            F.col("did").alias("doc_id"),
            "n_chunks",
            "n_dup_chunks",
            F.round(F.col("n_dup_chunks") * 10000.0 / F.col("n_chunks"))
            .cast("long")
            .alias("dup_ratio_e4"),
        )
    )


def duplicate_window_occurrences(
    df: DataFrame,
    window_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(did, pos, fp): md5 fingerprint of EVERY stride-1
    ``window_tokens``-token window of each document (``pos`` is the
    0-based token index of the window start). Documents shorter than one
    window emit no rows — they cannot contain a duplicated span of that
    length.

    Unlike ``doc_chunk_table`` (aligned chunks, a statistics primitive),
    the stride-1 table sees every token-aligned passage, so a substring
    duplicated ACROSS documents is caught regardless of where it starts —
    the primitive behind exact-substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better": remove
    repeated >=50-token spans; the reference corpus here uses 16).

    Scale shape: one output row per token (the stride-1 fan-out is a
    constant factor, not quadratic), produced scan-locally inside
    whole-stage codegen; only (id, pos, 32-char fp) rows ever leave the
    scan — the text itself never shuffles."""
    toks = F.col("_toks")  # staged below; see text.ngrams_of
    k = F.size(toks)
    w = window_tokens
    starts = F.when(k >= w, F.sequence(F.lit(0), k - w)).otherwise(
        F.array().cast("array<int>")
    )
    wins = F.transform(
        starts,
        lambda p: F.struct(
            p.alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(toks, p + 1, w))).alias("fp"),
        ),
    )
    return (
        _fan_out(df)
        .select(F.col(id_col).alias("did"),
                X.tokens(F.col(text_col)).alias("_toks"))
        .select("did", F.explode(wins).alias("o"))
        .select("did", F.col("o.pos").cast("long").alias("pos"), F.col("o.fp").alias("fp"))
    )


def duplicate_spans(
    df: DataFrame,
    window_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated token spans with first-occurrence retention —
    the distributed ExactSubstr shape: every stride-1 window whose
    fingerprint occurs >= 2 times corpus-wide is a duplicate occurrence,
    EXCEPT the canonical one (the lexicographically smallest (doc_id,
    pos) occurrence keeps its copy). Consecutive duplicate window starts
    within a doc merge into one maximal span.

    Returns (doc_id, span_start, span_end, n_windows): token indices,
    ``span_end`` exclusive (= last duplicate window start + window
    size). Spans from DIFFERENT runs may overlap when duplicate starts
    are separated by a gap < window_tokens; ``strip_duplicate_spans``
    handles that with per-position coverage.

    Plan shape at 100 TB: the occurrence table (linear in token count)
    shuffles once on fp for the duplicate-stats aggregation, joins back
    on fp (skinny 32-char keys), and the surviving duplicate occurrences
    — a tiny fraction of the corpus — take one (doc)-keyed window pass
    for the run merge. No pairwise join anywhere."""
    occ = duplicate_window_occurrences(df, window_tokens, text_col, id_col)
    stats = occ.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct(F.col("did"), F.col("pos"))).alias("m"),
    )
    removable = (
        occ.join(stats, "fp")
        .filter(
            (F.col("n_occ") >= 2)
            & ~((F.col("did") == F.col("m.did")) & (F.col("pos") == F.col("m.pos")))
        )
        .select("did", "pos")
    )
    w_doc = Window.partitionBy("did").orderBy("pos")
    runs = removable.withColumn(
        "_new_run",
        F.when(F.lag("pos").over(w_doc) == F.col("pos") - 1, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn("_run", F.sum("_new_run").over(w_doc))
    return (
        runs.groupBy("did", "_run")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(window_tokens)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("did").alias(id_col),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            F.col("n_windows").cast("long").alias("n_windows"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    window_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every duplicated span and return the cleaned corpus:
    (id, n_tokens, n_removed, clean_text). A token is removed iff it is
    covered by at least one removable span — overlapping spans from
    gap-separated runs are handled by per-position coverage, so the
    same token is never double-counted.

    Retention is per-WINDOW, not per-passage: each duplicated window's
    canonical (corpus-wide first) occurrence is never itself removable,
    but its tokens can still be stripped when a DIFFERENT removable
    window's span overlaps them — so a passage whose canonical
    occurrences interlock with removable ones may survive nowhere
    intact (the standard ExactSubstr caveat — Lee et al. 2022's
    original even strips EVERY copy, canonical included). The
    guarantee that does hold: a canonical window whose tokens no
    removable span covers survives verbatim.

    Scale shape: the span table (tiny — duplicated passages only) is
    aggregated to one array per affected doc and joined back by id;
    Spark plans that as a broadcast join when the span side is small
    (the common case). Token filtering is scan-local array work — the
    corpus text still never shuffles."""
    spans = duplicate_spans(df, window_tokens, text_col, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))).alias(
            "_spans"
        )
    )
    covered = lambda i: F.exists(
        F.col("_spans"), lambda sp: (sp["s"] <= i) & (i < sp["e"])
    )
    # staged twice: _toks so the tokenizer runs once (it is referenced
    # by size + the filter), then _kept so the per-token exists() scan
    # runs once (it is referenced by size + concat_ws)
    out = (
        df.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            X.tokens(F.col(text_col)).alias("_toks"),
            F.coalesce(
                F.col("_spans"),
                F.array().cast("array<struct<s:long,e:long>>"),
            ).alias("_spans"),
        )
        .select(
            F.col(id_col),
            F.size("_toks").cast("long").alias("n_tokens"),
            F.filter(
                F.col("_toks"), lambda _x, i: ~covered(i.cast("long"))
            ).alias("_kept"),
        )
    )
    return out.select(
        F.col(id_col),
        "n_tokens",
        (F.col("n_tokens") - F.size("_kept")).cast("long").alias("n_removed"),
        F.concat_ws(" ", F.col("_kept")).alias("clean_text"),
    )


def keep_best_representative(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str = "doc_id",
    count_col: str = "n_dups",
) -> DataFrame:
    """One row per duplicate group: the member with the HIGHEST score,
    ties broken by lowest id — the retention policy a real training-data
    pipeline wants (keep the cleanest duplicate, not the first-seen
    one), generalizing the keep-lowest-id rule of the *_dedup_groups
    functions. Adds ``count_col`` with the group size.

    Scale shape: ONE shuffle on the group key serves both window
    functions (the rank and the group count share the partitioning);
    no join back to the input, no second pass."""
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w_grp = Window.partitionBy(group_col)
    return (
        df.withColumn("_rn", F.row_number().over(w_rank))
        .withColumn(count_col, F.count(F.lit(1)).over(w_grp))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# -------------------------------------------------------- winnowing --

def winnowing_fingerprints(
    df: DataFrame,
    k: int = 8,
    t: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    mod_p: Optional[int] = None,
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): per document, hash every character ``k``-gram of the
    whitespace-normalized text and select the MINIMUM hash in each
    sliding window of ``w = t - k + 1`` consecutive positions. The
    selected set is a POSITIONAL guarantee MinHash cannot give: any
    substring match of length >= ``t`` between two documents shares at
    least one fingerprint, and no match shorter than ``k`` creates one.

    Plan shape: one narrow position-explode (codegen'd substring + one
    md5 per k-gram — the md5-slice BIGINT idiom every oracle
    reproduces), then ONE shuffle of skinny (id, pos, hash) triples for
    the per-document window min; text itself never shuffles. Returns
    distinct (id_col, fp) pairs. Documents shorter than ``k``
    normalized chars yield no fingerprints (nothing to guarantee).

    ``mod_p`` switches to the paper's 0-mod-p SAMPLING scheme (the
    winnowing predecessor, SIGMOD'03 §2): keep exactly the k-gram
    hashes with ``h % p == 0`` — no window, so the per-document
    (id, pos, hash) shuffle (~1 row per character, the dominant
    shuffle of this pipeline at corpus scale) disappears entirely; the
    only shuffle left is the distinct over the ~1/p sampled pairs.
    The GUARANTEE RELAXES from positional to probabilistic: a shared
    substring of length L >= t is detected only if it contains a
    selected k-gram — probability ~ 1 - (1 - 1/p)^(L-k+1), NOT 1 —
    and there is no density floor, so two sampled documents can share
    long text yet zero fingerprints. Use it when winnowing is the hot
    path and a bounded miss rate is acceptable; leave ``mod_p=None``
    for the MOSS guarantee."""
    if not k < t:
        raise ValueError(f"need k < t (got k={k}, t={t})")
    if mod_p is not None and mod_p < 2:
        raise ValueError(f"mod_p must be >= 2 (got {mod_p})")
    w = t - k + 1
    nt = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    pos = df.select(
        F.col(id_col),
        nt.alias("_nt"),
        (F.length(nt) - F.lit(k - 1)).alias("_np"),
    ).filter(F.col("_np") >= 1).select(
        id_col, "_nt", "_np",
        F.explode(F.sequence(F.lit(1), F.col("_np"))).alias("pos"),
    )
    h = pos.select(
        id_col, "pos", "_np",
        F.conv(
            F.substring(F.md5(F.col("_nt").substr(F.col("pos"), F.lit(k))),
                        1, 12), 16, 10,
        ).cast("long").alias("h"),
    )
    if mod_p is not None:
        # sampled path: the selection predicate is scan-local, so the
        # filter sits BELOW the only remaining exchange (the distinct)
        # and the window shuffle never exists
        return (
            h.filter(F.pmod(F.col("h"), F.lit(mod_p)) == 0)
            .select(F.col(id_col), F.col("h").alias("fp"))
            .distinct()
        )
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    return (
        h.withColumn("_wmin", F.min("h").over(win))
        # only full windows select: a document with fewer than w
        # positions winnows its single partial window (paper semantics:
        # min over what exists)
        .filter((F.col("pos") <= F.col("_np") - F.lit(w - 1))
                | (F.col("pos") == 1))
        .select(F.col(id_col), F.col("_wmin").alias("fp"))
        .distinct()
    )


def winnowing_overlap_pairs(
    df: DataFrame,
    k: int = 8,
    t: int = 16,
    min_shared: int = 5,
    max_doc_freq: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    mod_p: Optional[int] = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints —
    the MOSS overlap report. Fingerprints appearing in more than
    ``max_doc_freq`` documents are dropped FIRST (boilerplate k-grams:
    the standard MOSS noise rule, and the hot-bucket cap that keeps the
    self-join linear — without it one ubiquitous fingerprint joins
    quadratically at corpus scale). Returns (i, j, shared) with i < j.

    Scale shape: the fingerprint lineage (explode + window) is computed
    ONCE — a self-join would re-derive it per side and a third time for
    the frequency filter. One groupBy(fp) collects each bucket's sorted
    id list, the doc-frequency cap bounds it at ``max_doc_freq`` ids,
    and the i<j pairs are expanded IN the bucket (a HOF over a <=
    max_doc_freq array — bounded, never quadratic in the corpus); one
    more shuffle counts shared fingerprints per pair.

    ``mod_p`` selects the sampled 0-mod-p fingerprints instead (see
    ``winnowing_fingerprints``): expected shared counts scale by ~1/p,
    so lower ``min_shared`` accordingly — and the report becomes
    probabilistic (a real overlap can be missed), which is the
    documented trade for deleting the per-character window shuffle."""
    fps = winnowing_fingerprints(
        df, k=k, t=t, text_col=text_col, id_col=id_col, mod_p=mod_p
    )
    # ONE evaluation of the fingerprint lineage: the doc-frequency cap
    # is a COUNT window over fp — the window's exchange clusters the
    # pairs by fp, and the following groupBy(fp) REUSES that
    # partitioning, so cap + bucket collection cost one exchange of the
    # skinny (id, fp) pairs in total. The previous COUNT-then-join
    # formulation evaluated the whole explode + per-k-gram-hash +
    # window-min lineage TWICE (once for the count, once for the join
    # probe) — the dominant cost of this pipeline. Buffer discipline is
    # preserved: WindowExec buffers each fp group in a spillable sorted
    # run (never an in-memory agg buffer), and collect_list still only
    # ever sees groups the cap already bounded at max_doc_freq ids.
    wfp = Window.partitionBy("fp")
    buckets = (
        fps.withColumn("_df", F.count(F.lit(1)).over(wfp))
        .filter((F.col("_df") >= 2) & (F.col("_df") <= max_doc_freq))
        .groupBy("fp")
        .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
    )
    pairs = buckets.select(F.explode(F.expr(
        "flatten(transform(_ids, (x, i) -> "
        "transform(slice(_ids, i + 2, size(_ids)), y -> (x, y))))"
    )).alias("_p"))
    return (
        pairs.select(F.col("_p.x").alias("i"), F.col("_p.y").alias("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def winnowing_incremental_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    k: int = 8,
    t: int = 16,
    min_shared: int = 5,
    max_doc_freq: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_fps: Optional[DataFrame] = None,
    mod_p: Optional[int] = None,
) -> DataFrame:
    """Incremental winnowing overlap: an incoming BATCH checked against
    the HISTORICAL corpus (and against itself) — the ingest-time
    plagiarism/boilerplate guard with the positional guarantee (any
    shared substring >= ``t`` chars shares a fingerprint). Candidates
    are batch x corpus and batch x batch fingerprint collisions ONLY;
    the corpus is never self-joined, so each ingest costs O(batch)
    fingerprinting + one bucketed join against the corpus fingerprint
    table.

    Scale design: pass ``corpus_fps`` (the persisted output of
    ``winnowing_fingerprints`` for the corpus — the artifact a real
    pipeline maintains across ingests, appending each accepted batch's
    fingerprints) and the corpus TEXT is never touched; without it the
    corpus is fingerprinted once. The doc-frequency noise cap counts
    across corpus + batch together, exactly like the one-shot
    ``winnowing_overlap_pairs`` would on the union — so accept/reject
    decisions match a from-scratch run.

    Ids must be disjoint across the two inputs. Returns
    (i, j, j_in_corpus, shared): ``i`` is always a batch doc, ``j`` a
    corpus doc (``j_in_corpus`` = 1) or a batch peer with i < j (= 0),
    ``shared`` the count of rare fingerprints in common
    (>= ``min_shared``)."""
    if corpus_fps is None:
        corpus_fps = winnowing_fingerprints(
            corpus_df, k=k, t=t, text_col=text_col, id_col=id_col,
            mod_p=mod_p,
        )
    elif mod_p is not None:
        # a persisted fps table built under the WINDOW scheme mixed
        # with 0-mod-p batch fingerprints would silently collapse
        # shared counts toward zero (window minima need not satisfy
        # h % p == 0) and wave contaminated batches through — probe a
        # bounded sample and refuse loudly instead. (The reverse mixup
        # — sampled corpus under mod_p=None — is not detectable this
        # way; persist the scheme with the artifact.)
        bad = (
            corpus_fps.filter(F.pmod(F.col("fp"), F.lit(mod_p)) != 0)
            .limit(1).count()
        )
        if bad:
            raise ValueError(
                f"corpus_fps contains fingerprints with fp % {mod_p} != 0 "
                f"— it was not built with mod_p={mod_p}; regenerate the "
                f"corpus artifact under the same scheme as the batch"
            )
    new_fps = winnowing_fingerprints(
        new_df, k=k, t=t, text_col=text_col, id_col=id_col, mod_p=mod_p
    )
    both = (
        new_fps.select("fp", F.col(id_col).alias("_id"),
                       F.lit(0).alias("_c"))
        .unionByName(corpus_fps.select(
            "fp", F.col(id_col).alias("_id"), F.lit(1).alias("_c")))
    )
    # noise cap over the UNION's doc frequency, applied BEFORE any
    # list is collected (same buffer-bounding discipline as the
    # one-shot face); only buckets holding at least one batch doc can
    # produce a pair, so the corpus-only majority never collects
    # either. Both cap statistics ride ONE count/sum window over fp —
    # the union's fingerprint lineages (batch AND corpus) evaluate
    # once, and the groupBy(fp) below reuses the window's exchange
    # (the previous agg+join formulation re-evaluated the union per
    # side). WindowExec buffers per-fp sorted runs that spill, so a
    # boilerplate fingerprint never lands in an in-memory agg buffer.
    wfp = Window.partitionBy("fp")
    filtered = (
        both.withColumn("_df", F.count(F.lit(1)).over(wfp))
        .withColumn("_nbk", F.sum(F.lit(1) - F.col("_c")).over(wfp))
        .filter((F.col("_df") <= max_doc_freq) & (F.col("_nbk") >= 1))
    )
    buckets = (
        filtered
        .groupBy("fp")
        .agg(
            F.sort_array(F.collect_list(F.struct("_c", "_id"))).alias("_m"),
            F.sum(F.lit(1) - F.col("_c")).alias("_nb"),
        )
    )
    # batch docs sort first (_c = 0): pair every batch doc with every
    # LATER member — batch x batch emits i < j once, batch x corpus
    # emits (batch, corpus) once; corpus x corpus never pairs
    pairs = buckets.select(F.explode(F.expr(
        "flatten(transform(slice(_m, 1, cast(_nb as int)), (x, i) -> "
        "transform(slice(_m, i + 2, size(_m)), "
        "y -> struct(x._id AS bi, y._id AS oj, y._c AS jc))))"
    )).alias("_p"))
    return (
        pairs.select(
            F.col("_p.bi").alias("i"), F.col("_p.oj").alias("j"),
            F.col("_p.jc").alias("j_in_corpus"),
        )
        .groupBy("i", "j", "j_in_corpus")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
