"""Dedup operator semantics: SimHash spec equivalence, guaranteed
recall of the pigeonhole chunk blocking, empty-doc handling."""

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.functions import text as X
from ahnlich_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, ""),  # empty
        (4, None),  # null
        (5, "völlig unrelated 文字 content here"),
        (6, "a"),
        (7, "the quick brown fox leaps over the lazy dog"),  # near-dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_table_matches_hof_spec(docs):
    """The 64-aggregate explode path must be bit-identical to the
    per-row higher-order-function spec (text.simhash64)."""
    fast = D.simhash_table(docs).withColumnRenamed("fp", "fp_fast")
    # simhash_table documents NULL-text -> -1 (empty-doc fingerprint);
    # the per-row spec propagates NULL, so align with coalesce
    spec = docs.select(
        F.col("doc_id").alias("did"),
        F.coalesce(X.simhash64(F.col("text")), F.lit(-1)).alias("fp_spec"),
    )
    joined = fast.join(spec, "did").collect()
    assert len(joined) == 8
    for r in joined:
        assert r["fp_fast"] == r["fp_spec"], f"did={r['did']}"


def test_simhash_empty_and_null_docs_fingerprint_to_minus_one(docs):
    fps = {r["did"]: r["fp"] for r in D.simhash_table(docs).collect()}
    assert fps[3] == -1
    assert fps[4] == -1


def test_simhash_near_dup_blocking_is_exhaustive(docs):
    """Chunk blocking (pigeonhole) must return EXACTLY the pairs a
    brute-force all-pairs Hamming scan returns."""
    fp = D.simhash_table(docs)
    a, b = fp.alias("a"), fp.alias("b")
    brute = {
        (r["i"], r["j"], r["h"])
        for r in a.join(b, F.col("a.did") < F.col("b.did"))
        .select(
            F.col("a.did").alias("i"),
            F.col("b.did").alias("j"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    blocked = {
        (r["i"], r["j"], r["hamming"])
        for r in D.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    assert blocked == brute


def test_simhash_chunk_bounds_cover_64_bits():
    for mh in (1, 2, 3, 5, 7):
        bounds = D.simhash_chunk_bounds(mh)
        assert len(bounds) == mh + 1
        assert sum(w for _, w in bounds) == 64
        pos = 0
        for start, width in bounds:
            assert start == pos and width >= 1
            pos += width


def test_simhash_exact_dups_have_hamming_zero(docs):
    pairs = {
        (r["i"], r["j"]): r["hamming"]
        for r in D.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 2)] == 0  # identical docs
    assert (3, 4) in pairs and pairs[(3, 4)] == 0  # empty & null both -1


def test_embedding_near_dup_pruned_matches_exact(spark):
    """Above the brute-force threshold the DEFAULT path is LSH-pruned;
    its pairs must be a subset of the exact all-pairs result with
    recall >= 0.9 on genuine near-dups (cos >= 0.95 here)."""
    import numpy as np

    rng = np.random.RandomState(7)
    n_base, dim = 5000, 32
    base = rng.normal(size=(n_base, dim))
    # 400 planted near-dup partners: tiny perturbations (cos ~ 0.99)
    partners = base[:400] + rng.normal(0, 0.02, size=(400, dim))
    vecs = np.vstack([base, partners]).astype(np.float32)  # 5400 < 8192
    # tile to clear the 8192 brute-force threshold without new dups
    far = rng.normal(10.0, 0.1, size=(4000, dim)).astype(np.float32)
    allv = np.vstack([vecs, far])
    rows = [(i, v.tolist()) for i, v in enumerate(allv)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # cap disabled here: the 'far' filler is itself a mass near-identical
    # cluster, which the default hot-bucket guard (rightly) drops — this
    # test measures raw LSH recall; the guard has its own test below
    pruned = {
        (r["i"], r["j"]): r["cos_e4"]
        for r in D.embedding_near_dup_pairs(
            df, threshold=0.95, max_bucket_size=None
        ).collect()
    }
    exact = {
        (r["i"], r["j"]): r["cos_e4"]
        for r in D.embedding_near_dup_pairs(df, threshold=0.95, exact=True).collect()
    }
    assert set(pruned) <= set(exact), "pruned path emitted a non-pair"
    for k, v in pruned.items():
        assert exact[k] == v, f"cosine mismatch for {k}"
    assert len(exact) >= 400  # the planted pairs are present
    recall = len(pruned) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} ({len(pruned)}/{len(exact)})"


def test_embedding_near_dup_small_input_is_exact_by_default(spark):
    """At or below the threshold the default is the exact blocked GEMM
    (low thresholds would defeat LSH pruning anyway)."""
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    vecs[10] = vecs[4] * 1.5  # exact-direction dup, cos = 1
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = {(r["i"], r["j"]): r["cos_e4"] for r in
           D.embedding_near_dup_pairs(df, threshold=0.99).collect()}
    assert got.get((4, 10)) == 10000


def test_lang_id_table_matches_per_row_spec(spark, sf_dir):
    from ahnlich_spark.functions import text as X
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fast = {r["doc_id"]: r["pred_lang"] for r in X.lang_id_table(docs).collect()}
    spec = {
        r["doc_id"]: r["l"]
        for r in docs.select("doc_id", X.lang_id(F.col("text")).alias("l")).collect()
    }
    assert fast == spec
    # empty/None text -> 'und'
    edge = spark.createDataFrame([(0, ""), (1, None)], "doc_id long, text string")
    assert {r["pred_lang"] for r in X.lang_id_table(edge).collect()} == {"und"}


def test_hot_bucket_cap_bounds_join_fanout(spark):
    """max_bucket_size drops oversized LSH buckets (anti-skew): a block
    of identical docs stops producing quadratic candidates while normal
    near-dup pairs are still found; default (None) is unchanged."""
    hot = [(i, "the same boilerplate text repeated everywhere") for i in range(40)]
    normal = [
        (100, "a unique document about rivers and mountains in spring"),
        (101, "a unique document about rivers and mountains in winter"),
    ]
    df = spark.createDataFrame(hot + normal, "doc_id long, text string")
    uncapped = D.minhash_lsh_candidate_pairs(df)
    capped = D.minhash_lsh_candidate_pairs(df, max_bucket_size=10)
    n_un = uncapped.count()
    got = {(r["i"], r["j"]) for r in capped.collect()}
    assert n_un >= 40 * 39 // 2  # quadratic blow-up without the cap
    assert (100, 101) in got  # normal pairs survive
    assert not any(i < 100 and j < 100 for i, j in got)  # hot block dropped


# ---------------------------------------------- cross-doc chunk dedup --

from ahnlich_spark.operators.dedup import chunk_dup_stats


def test_chunk_dup_stats_cross_doc(spark):
    # chunk size 3: doc 1 = [A B C][D E F], doc 2 shares aligned chunk
    # "A B C", doc 3 shares nothing, doc 4 is whitespace-only
    df = spark.createDataFrame(
        [
            (1, "A B C D E F"),
            (2, "A B C x y z"),
            (3, "q w e r t y"),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in chunk_dup_stats(df, chunk_tokens=3).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_dup_chunks"] == 1
    assert out[1]["dup_ratio_e4"] == 5000
    assert out[2]["n_chunks"] == 2 and out[2]["n_dup_chunks"] == 1
    assert out[3]["n_chunks"] == 2 and out[3]["n_dup_chunks"] == 0
    assert 4 not in out  # no tokens -> no chunks -> absent


def test_chunk_dup_stats_within_doc_repeat_not_cross(spark):
    # the same chunk twice WITHIN one doc is not a cross-doc dup
    df = spark.createDataFrame(
        [(1, "A B C A B C"), (2, "u v w x y z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in chunk_dup_stats(df, chunk_tokens=3).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_dup_chunks"] == 0


def test_chunk_dup_tail_chunk_counts(spark):
    # 4 tokens at chunk size 3 -> chunks [A B C] and tail [D]; the tail
    # matches another doc's aligned first chunk only if identical text
    df = spark.createDataFrame(
        [(1, "A B C D"), (2, "D x y")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in chunk_dup_stats(df, chunk_tokens=3).collect()}
    assert out[1]["n_chunks"] == 2
    # tail "D" vs doc2's first chunk "D x y": different -> no dup
    assert out[1]["n_dup_chunks"] == 0


@pytest.mark.parametrize("seed", [0, 5])
def test_embedding_pruned_hot_bucket_cap(spark, seed):
    """Adversarial corpus (VERDICT r02 #3): a mass-duplicate group whose
    band buckets would each self-join quadratically. With the default
    hot-bucket cap the degenerate group contributes ZERO candidate
    pairs (its buckets are dropped), while ordinary near-dup pairs in
    cool buckets are still found."""
    import numpy as np

    rng = np.random.RandomState(seed)
    hot = rng.normal(size=64)
    planted = rng.normal(size=(20, 64))
    rows = [(i, (hot + rng.normal(0, 1e-4, 64)).tolist()) for i in range(300)]
    pid = 1000
    planted_pairs = []
    for p in planted:
        rows.append((pid, p.tolist()))
        rows.append((pid + 1, (p + rng.normal(0, 1e-3, 64)).tolist()))
        planted_pairs.append((pid, pid + 1))
        pid += 2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {
        (r["i"], r["j"])
        for r in D.embedding_near_dup_pairs(
            df, threshold=0.95, exact=False, max_bucket_size=50
        ).collect()
    }
    hot_pairs = {p for p in got if p[0] < 300 and p[1] < 300}
    assert hot_pairs == set(), f"hot bucket leaked {len(hot_pairs)} pairs"
    found = sum(1 for p in planted_pairs if p in got)
    assert found >= len(planted_pairs) * 0.6, (found, len(planted_pairs))

    # cap disabled -> the degenerate group floods the output (the bug
    # the cap exists to prevent); sanity that the guard is load-bearing
    uncapped = D.embedding_near_dup_pairs(
        df, threshold=0.95, exact=False, max_bucket_size=None
    )
    assert uncapped.filter("i < 300 AND j < 300").count() > 40_000


def test_sliding_chunk_table_coverage_and_overlap(spark):
    """Every token position is covered; consecutive windows overlap by
    chunk_tokens - stride; the tail window is included."""
    rows = [(1, " ".join(f"t{i}" for i in range(50))), (2, "a b"), (3, "  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.sliding_chunk_table(df, chunk_tokens=32, stride=16).collect()
    d1 = sorted((r["chunk_idx"], r["n_tokens"]) for r in out if r["doc_id"] == 1)
    # 50 tokens, w=32, s=16 -> starts 0, 16, 32 (ceil((50-32)/16)+1 = 3)
    assert d1 == [(0, 32), (1, 32), (2, 18)]
    d2 = [(r["chunk_idx"], r["n_tokens"]) for r in out if r["doc_id"] == 2]
    assert d2 == [(0, 2)]  # short doc -> one whole-doc window
    assert not [r for r in out if r["doc_id"] == 3]  # whitespace-only
    # identical windows of identical docs fingerprint identically
    fp0 = {r["fp"] for r in out if r["doc_id"] == 1 and r["chunk_idx"] == 0}
    assert len(fp0) == 1


def test_keep_best_representative_policy(spark):
    """Highest score wins its group; ties break to the lowest id; the
    group size rides along — all from one group-key shuffle."""
    from ahnlich_spark.operators.dedup import keep_best_representative

    df = spark.createDataFrame(
        [(1, "g1", 50), (2, "g1", 90), (3, "g1", 90),
         (4, "g2", 10), (5, "g3", 0), (6, "g3", 0)],
        "doc_id long, fp string, score long",
    )
    got = {
        r["fp"]: (r["doc_id"], r["n_dups"], r["score"])
        for r in keep_best_representative(df, "fp", "score").collect()
    }
    assert got == {"g1": (2, 3, 90), "g2": (4, 1, 10), "g3": (5, 2, 0)}


# ------------------------------------------------- duplicate spans --

@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        (0, "a b c d e f g h"),          # canonical copy of everything
        (1, "x x c d e f y z"),          # shares the "c d e f" window
        (2, "q w e r"),                  # unique 4-token doc
        (3, "a b c d e f g h"),          # exact dup of 0 -> fully removable
        (4, ""),                         # empty
        (5, "one two"),                  # shorter than one window
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_first_occurrence_kept(span_docs):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in D.duplicate_spans(span_docs, window_tokens=4).collect()
    }
    # doc 0 is canonical for every window it holds -> no spans; doc 3 is
    # a full duplicate (5 consecutive removable starts -> one maximal
    # span covering all 8 tokens); doc 1 duplicates exactly one window.
    assert got == {(1, 2, 6, 1), (3, 0, 8, 5)}


def test_strip_duplicate_spans_reconstruction(span_docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in D.strip_duplicate_spans(span_docs, window_tokens=4).collect()
    }
    assert got[0] == (8, 0, "a b c d e f g h")
    assert got[1] == (8, 4, "x x y z")
    assert got[2] == (4, 0, "q w e r")
    assert got[3] == (8, 8, "")
    assert got[4] == (0, 0, "")
    assert got[5] == (2, 0, "one two")


def test_duplicate_spans_overlapping_runs_cover_once(spark):
    # Removable starts 0 and 2 (gap < window) -> two spans (0,4) and
    # (2,6) that OVERLAP; stripping must count covered positions once.
    rows = [
        (1, "p q r s z1 z2 z3 z4"),      # canonical "p q r s"
        (2, "r s t u k1 k2 k3 k4"),      # canonical "r s t u"
        (9, "p q r s t u v w x y"),      # duplicates both, at 0 and 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in D.duplicate_spans(df, window_tokens=4).collect()
    }
    assert spans == {(9, 0, 4), (9, 2, 6)}
    stripped = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in D.strip_duplicate_spans(df, window_tokens=4).collect()
    }
    assert stripped[9] == (6, "v w x y")
    assert stripped[1] == (0, "p q r s z1 z2 z3 z4")
    assert stripped[2] == (0, "r s t u k1 k2 k3 k4")


def test_duplicate_spans_partition_order_invariant(span_docs):
    base = sorted(
        tuple(r) for r in D.duplicate_spans(span_docs, window_tokens=4).collect()
    )
    shuffled = sorted(
        tuple(r)
        for r in D.duplicate_spans(
            span_docs.repartition(7), window_tokens=4
        ).collect()
    )
    assert base == shuffled and len(base) == 2


# -------------------------------------------- incremental minhash --

@pytest.fixture(scope="module")
def incr_corpus(spark):
    rows = [
        (100, "the quick brown fox jumps over the lazy dog tonight again"),
        (101, "completely different corpus content about spark shuffles"),
        (102, "the quick brown fox jumps over the lazy dog tonight again"),  # corpus-internal dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def incr_batch(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight again"),   # dup of 100/102
        (2, "the quick brown fox jumps over the lazy dog tonight maybe"),   # near-dup of 1
        (3, "unrelated incoming document with fresh tokens only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_pairs_scope(incr_batch, incr_corpus):
    got = {
        (r["i"], r["j"], r["j_in_corpus"])
        for r in D.minhash_lsh_incremental_pairs(
            incr_batch, incr_corpus, threshold=0.5
        ).collect()
    }
    # batch x corpus hits for both corpus copies; batch x batch with
    # i < j; the corpus-internal pair (100, 102) must NOT appear.
    assert (1, 100, 1) in got and (1, 102, 1) in got
    assert (1, 2, 0) in got
    assert all(i in (1, 2, 3) for i, _, _ in got)
    assert (100, 102, 1) not in got and (100, 102, 0) not in got


def test_incremental_pairs_size_blocking_identity(incr_batch, incr_corpus):
    """The composite (band, Jaccard-size-bucket) keys are LOSSLESS for
    the threshold: the verified result set equals the plain band-key
    run (size filtering only removes pairs the threshold already
    excludes)."""
    base = {
        tuple(r)
        for r in D.minhash_lsh_incremental_pairs(
            incr_batch, incr_corpus, threshold=0.5
        ).collect()
    }
    sized = {
        tuple(r)
        for r in D.minhash_lsh_incremental_pairs(
            incr_batch, incr_corpus, threshold=0.5, size_blocking=True
        ).collect()
    }
    assert base == sized and len(base) >= 3


def test_size_blocking_splits_degenerate_vocab_buckets(spark):
    """The degenerate-vocabulary worst case, distilled: every doc has
    the IDENTICAL MinHash signature (boilerplate-dominated minima) so
    plain band keys put the whole corpus in one bucket — but shingle
    counts spread over orders of magnitude, so the size bucket splits
    it. Candidate pairs drop sharply; no pair within the threshold's
    size ratio is lost (probe side covers +-1 bucket)."""
    cols = "did long, nsh long, " + ", ".join(f"h{i} long" for i in range(16))
    sig_old = spark.createDataFrame(
        [tuple([100 + i, 2 ** (i % 9)] + list(range(16))) for i in range(40)],
        cols,
    )
    sig_new = spark.createDataFrame(
        [tuple([i, 2 ** (i % 9)] + list(range(16))) for i in range(10)],
        cols,
    )

    def n_cands(size_blocking):
        if size_blocking:
            bn = D._sized_band_table(sig_new, 8, 2, 0.5, probe=True)
            bo = D._sized_band_table(sig_old, 8, 2, 0.5, probe=False)
            cond = (F.col("a.band") == F.col("b.band")) & (
                F.col("a.sb") == F.col("b.sb")
            )
        else:
            bn = D._band_table(sig_new, 8, 2)
            bo = D._band_table(sig_old, 8, 2)
            cond = F.col("a.band") == F.col("b.band")
        a, b = bn.alias("a"), bo.alias("b")
        return (
            a.join(b, cond)
            .select(F.col("a.did"), F.col("b.did").alias("j"))
            .distinct()
            .count()
        )

    plain, sized = n_cands(False), n_cands(True)
    assert plain == 10 * 40          # one bucket holds everything
    assert sized < plain / 2, (plain, sized)
    # losslessness on real text end-to-end is pinned by
    # test_incremental_pairs_size_blocking_identity; here pin that no
    # size-compatible pair was cut: every (i, j) with nsh ratio >= 0.5
    # still collides under the composite keys.
    bn = D._sized_band_table(sig_new, 8, 2, 0.5, probe=True).alias("a")
    bo = D._sized_band_table(sig_old, 8, 2, 0.5, probe=False).alias("b")
    kept = {
        (r["did"], r["j"])
        for r in bn.join(
            bo,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sb") == F.col("b.sb")),
        )
        .select(F.col("a.did"), F.col("b.did").alias("j"))
        .distinct()
        .collect()
    }
    sizes_new = {r["did"]: r["nsh"] for r in sig_new.collect()}
    sizes_old = {r["did"]: r["nsh"] for r in sig_old.collect()}
    for i, ni in sizes_new.items():
        for j, nj in sizes_old.items():
            if min(ni, nj) * 2 >= max(ni, nj):   # ratio >= threshold 0.5
                assert (i, j) in kept, (i, j, ni, nj)


def test_incremental_pairs_with_persisted_signatures(incr_batch, incr_corpus):
    """Passing the persisted corpus signature artifact must give the
    identical result set (the production path: corpus text is only
    re-shingled for colliding candidate docs)."""
    sig = D.minhash_signature_table(incr_corpus)
    base = sorted(
        tuple(r)
        for r in D.minhash_lsh_incremental_pairs(
            incr_batch, incr_corpus, threshold=0.5
        ).collect()
    )
    with_sig = sorted(
        tuple(r)
        for r in D.minhash_lsh_incremental_pairs(
            incr_batch, incr_corpus, threshold=0.5, corpus_sig=sig
        ).collect()
    )
    assert base == with_sig and len(base) >= 3


# ---------------------------------------------------------- winnowing --


def test_winnowing_guarantee_and_window_semantics(spark):
    """The winnowing guarantee: two documents sharing a substring of
    length >= t share at least one fingerprint; a document shorter than
    k normalized chars yields none; one with fewer than w positions
    winnows its single partial window to exactly one fingerprint."""
    from ahnlich_spark.operators import dedup as D

    shared = "the quick brown fox jumps over it"   # 33 chars >= t=16
    docs = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " BBBB"),
            (2, "cccc dddd " + shared + " eeee"),
            (3, "zzzzz"),                          # < k=8 chars
            (4, "0123456789"),                     # np=3 < w=9: 1 window
            (5, "wxyz!@#$%^&*()_+[]"),             # disjoint chars
        ],
        "doc_id long, text string",
    )
    fps = D.winnowing_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]                   # guarantee holds
    assert 3 not in by_doc
    assert len(by_doc[4]) == 1
    assert not (by_doc[1] & by_doc[5])
    with pytest.raises(ValueError, match="k < t"):
        D.winnowing_fingerprints(docs, k=16, t=16)


def test_winnowing_overlap_pairs_and_hot_cap(spark):
    """Overlap pairs require min_shared common fingerprints, i < j
    ordering holds, and the max_doc_freq boilerplate cap removes
    fingerprints every document shares (MOSS noise rule)."""
    from ahnlich_spark.operators import dedup as D

    boiler = "COPYRIGHT HEADER ALWAYS THE SAME EVERYWHERE"
    body = "some genuinely shared long passage of text here"
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique alpha " + body),
            (2, boiler + " unique beta " + body),
            (3, boiler + " gamma totally different tail 12345"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["i"], r["j"]): r["shared"]
        for r in D.winnowing_overlap_pairs(
            docs, min_shared=2, max_doc_freq=2).collect()
    }
    assert (1, 2) in pairs                         # body overlap survives
    # the boilerplate fingerprints (in all 3 docs) were capped away:
    # doc 3 shares ONLY boilerplate with 1 and 2
    assert (1, 3) not in pairs and (2, 3) not in pairs
    assert all(i < j for (i, j) in pairs)


def test_winnowing_incremental_matches_from_scratch(spark):
    """Batch-vs-corpus incremental overlap equals the from-scratch run
    on the union restricted to batch-touching pairs; the persisted
    corpus-fingerprint path is identical; corpus docs never pair with
    each other."""
    from ahnlich_spark.operators import dedup as D

    body = "a long shared passage that certainly exceeds the threshold"
    docs = spark.createDataFrame(
        [
            (1, "corpus one " + body),
            (2, "corpus two " + body),
            (3, "corpus unrelated entirely 000111222333"),
            (10, "batch alpha " + body),
            (11, "batch beta " + body),
            (12, "batch unrelated zzzyyyxxxwww"),
        ],
        "doc_id long, text string",
    )
    corpus = docs.filter(F.col("doc_id") < 10)
    batch = docs.filter(F.col("doc_id") >= 10)
    inc = sorted(
        tuple(r) for r in D.winnowing_incremental_pairs(
            batch, corpus, min_shared=2, max_doc_freq=10).collect()
    )
    want = []
    for r in D.winnowing_overlap_pairs(
            docs, min_shared=2, max_doc_freq=10).collect():
        i, j, s = r["i"], r["j"], r["shared"]
        if i >= 10 and j >= 10:
            want.append((i, j, 0, s))
        elif j >= 10:
            want.append((j, i, 1, s))
        elif i >= 10:
            want.append((i, j, 1, s))
    assert inc == sorted(want) and inc
    assert all(i >= 10 for i, *_ in inc)           # i is always batch
    assert any(jc == 1 for _, _, jc, _ in inc)     # corpus matches exist
    assert (10, 11, 0) in {(i, j, jc) for i, j, jc, _ in inc}
    # persisted corpus fingerprints: same answer, corpus text untouched
    fps = D.winnowing_fingerprints(corpus)
    inc2 = sorted(
        tuple(r) for r in D.winnowing_incremental_pairs(
            batch, corpus.limit(0), corpus_fps=fps,
            min_shared=2, max_doc_freq=10).collect()
    )
    assert inc2 == inc


def test_winnowing_mod_p_sampled_variant(spark):
    """The 0-mod-p sampled scheme: every selected fingerprint satisfies
    h % p == 0, the sampled set is exactly the 0-mod-p subset of the
    full k-gram hash set (so a long planted overlap is found whenever
    it contains a selected gram), and the plan drops the per-document
    window — no Window exchange survives, the shuffle the sampling
    exists to delete."""
    import contextlib
    import io

    from ahnlich_spark.operators import dedup as D

    shared = ("a genuinely long shared passage of text that contains "
              "many distinct character eight grams to sample from")
    docs = spark.createDataFrame(
        [(1, "xxxx " + shared + " yyyy"), (2, "qqqq " + shared + " rrrr"),
         (3, "completely different content with its own wording")],
        "doc_id long, text string",
    )
    p = 4
    fps = D.winnowing_fingerprints(docs, mod_p=p)
    rows = fps.collect()
    assert rows and all(r["fp"] % p == 0 for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]            # the planted overlap samples
    assert not (by_doc.get(3, set()) & by_doc[1])
    # no window in the sampled plan (the full path has exactly one)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fps.explain("formatted")
    assert "Window" not in buf.getvalue()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        D.winnowing_fingerprints(docs).explain("formatted")
    assert "Window" in buf.getvalue()
    # overlap pairs thread the sampling through; expected counts ~1/p
    pairs = D.winnowing_overlap_pairs(docs, min_shared=2, mod_p=p).collect()
    assert [(r["i"], r["j"]) for r in pairs] == [(1, 2)]
    with pytest.raises(ValueError, match="mod_p"):
        D.winnowing_fingerprints(docs, mod_p=1)


def test_winnowing_incremental_scheme_mismatch_refuses(spark):
    """A persisted corpus fingerprint table built under the WINDOW
    scheme cannot be silently mixed with 0-mod-p batch fingerprints
    (shared counts would collapse toward zero and contaminated batches
    would pass) — the bounded probe refuses loudly."""
    from ahnlich_spark.operators import dedup as D

    text = "a long enough shared passage of text for fingerprints here"
    corpus = spark.createDataFrame([(1, text)], "doc_id long, text string")
    batch = spark.createDataFrame([(100, text)], "doc_id long, text string")
    window_fps = D.winnowing_fingerprints(corpus)          # window scheme
    with pytest.raises(ValueError, match="not built with mod_p"):
        D.winnowing_incremental_pairs(
            batch, corpus, corpus_fps=window_fps, mod_p=64,
            min_shared=1).collect()
    # matching schemes pass through
    ok = D.winnowing_incremental_pairs(
        batch, corpus,
        corpus_fps=D.winnowing_fingerprints(corpus, mod_p=4),
        mod_p=4, min_shared=1).collect()
    assert [(r["i"], r["j"]) for r in ok] == [(100, 1)]


def test_simhash_exact_match_blocking(spark):
    """max_hamming=0 (exact-fingerprint match) works: the single chunk
    spans all 64 bits, where a (1 << 64) - 1 mask literal would
    overflow LongType."""
    from ahnlich_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(1, "identical text body here"), (2, "identical text body here"),
         (3, "something else entirely different")],
        "doc_id long, text string",
    )
    out = D.simhash_near_dup_pairs(docs, max_hamming=0).collect()
    assert [(r["i"], r["j"], r["hamming"]) for r in out] == [(1, 2, 0)]


def test_embedding_near_dup_guards(spark):
    """Non-integral ids refuse at plan time (a string id casts to NULL
    and silently drops every pair), bad precision refuses, and NULL
    embeddings are excluded instead of crashing the signature UDF."""
    from ahnlich_spark.operators import dedup as D

    s = spark.createDataFrame(
        [("doc_1", [1.0, 0.0]), ("doc_2", [1.0, 0.0])],
        "vec_id string, embedding array<float>",
    )
    with pytest.raises(ValueError, match="integral"):
        D.embedding_near_dup_pairs(s)
    ok = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, None)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="precision"):
        D.embedding_near_dup_pairs(ok, precision="f32")
    pairs = D.embedding_near_dup_pairs(ok, threshold=0.9).collect()
    assert [(r["i"], r["j"]) for r in pairs] == [(1, 2)]   # NULL ignored
    # float verify arithmetic accepted and matching here
    pf = D.embedding_near_dup_pairs(ok, threshold=0.9,
                                    precision="float").collect()
    assert [(r["i"], r["j"]) for r in pf] == [(1, 2)]
