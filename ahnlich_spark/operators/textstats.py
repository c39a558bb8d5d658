"""Corpus-level text statistics: vocabulary building, TF-IDF scoring,
C4-style quality filtering, and PII scrubbing.

These are the corpus-wide complements to the per-document scalar
functions in ``functions/text.py`` — a training-data pipeline builds a
vocabulary before fitting a tokenizer, ranks salient terms before
topic-balancing a mixture, rule-filters junk documents (the C4/Gopher
recipe), and scrubs PII before anything ships.

Reference parity: part of this repo's training-data-pipeline extension
surface (the reference engine, deven96/ahnlich, stops at store/query
primitives).

Scale notes (100 TB):
- ``vocab_table`` is the canonical two-level aggregation: (term, doc)
  partial counts first — map-side combine soaks up the per-document
  repetition before anything shuffles — then a second combine by term.
  Both aggregations are codegen'd HashAggregates; no Python, no
  distinct over the raw token stream.
- ``tfidf_top_terms`` joins per-doc term counts against the term
  document-frequency table ON TERM. The join is skewed exactly where
  idf is lowest (stopwords), so AQE skew-join splitting handles the
  heavy keys and the WindowGroupLimit rank prune keeps only k rows per
  document out of the window sort.
- ``c4_quality_flags`` and ``pii_scrub`` are scan-local map expressions
  (regex + higher-order array functions, all JVM-side): zero shuffle,
  pushed column pruning, safe to run inline in an ingest pass.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ahnlich_spark.functions import text as X

# ------------------------------------------------------------ vocabulary --


def term_doc_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, cnt): lowercased whitespace terms with per-document
    counts. The groupBy's map-side partial aggregation collapses each
    document's repeated terms before the shuffle — the exploded token
    stream itself never crosses the wire."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(X.tokens(F.col(text_col))).alias("tok"),
    )
    return (
        toks.select("doc_id", F.lower(F.col("tok")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def vocab_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, tf, doc_freq): corpus term frequency and document
    frequency. Second-level combine over ``term_doc_counts`` — one more
    single-key aggregation, still fully codegen'd."""
    return term_doc_counts(df, text_col, id_col).groupBy("term").agg(
        F.sum("cnt").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
    )


def vocab_top_terms(
    df: DataFrame, n: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-n vocabulary by corpus frequency (ties broken by term asc) —
    a bounded TakeOrderedAndProject over the vocab aggregate."""
    return vocab_table(df, text_col, id_col).orderBy(
        F.desc("tf"), F.asc("term")
    ).limit(n)


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tf: int = 1,
) -> DataFrame:
    """(doc_id, term, rank_n, tfidf_e4): the k most salient terms per
    document by tf * ln(N / doc_freq), rank ties broken by term asc.

    N is the full document count (computed as a 1-row aggregate and
    broadcast into the expression — no driver collect of data rows).
    Scores are emitted e4-scaled so the cross-engine hash cannot be
    flipped by float formatting."""
    per_doc = term_doc_counts(df, text_col, id_col)
    dfreq = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))

    scored = (
        per_doc.filter(F.col("cnt") >= min_tf)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("cnt").cast("double")
            * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank_n", F.row_number().over(w))
        .filter(F.col("rank_n") <= k)
        .select(
            "doc_id",
            "term",
            F.col("rank_n").cast("long").alias("rank_n"),
            F.round(F.col("tfidf") * 10000).cast("long").alias("tfidf_e4"),
        )
    )


def unigram_logprob_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, mean_logprob_e6): per-document mean unigram
    log-probability under the corpus's own unigram distribution — the
    CCNet-style LM quality proxy (docs full of corpus-typical words
    score high; gibberish and boilerplate-with-rare-junk score low).

    Determinism discipline: each (doc, term) contribution
    ``cnt * ln(tf_term / total_tf)`` is rounded to an e6-scaled BIGINT
    BEFORE summation, so the per-document total is an integer sum —
    exact under any aggregation order, hash-identical across engines
    (a raw double SUM's order varies per run and per engine).

    Scale: reuses the two-level ``term_doc_counts`` aggregation; the
    per-term probability join is term-keyed (AQE splits stopword skew);
    the final per-doc combine has map-side partial aggregation. The
    1-row corpus total rides in as a broadcast."""
    per_doc = term_doc_counts(df, text_col, id_col)
    vocab = per_doc.groupBy("term").agg(F.sum("cnt").alias("tf"))
    total = vocab.select(F.sum("tf").alias("total_tf"))

    contrib = (
        per_doc.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lp_e6",
            F.round(
                F.col("cnt")
                * F.log(F.col("tf").cast("double") / F.col("total_tf"))
                * 1_000_000
            ).cast("long"),
        )
    )
    # integer `div` (truncation toward zero): contributions are
    # negative, and BIGINT // in DuckDB also truncates — measured, both
    # engines agree on div, not on floor
    return contrib.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.expr("sum(lp_e6) div sum(cnt)").cast("long").alias("mean_logprob_e6"),
    )


# ------------------------------------------------------ C4-style filter --

# Rule thresholds follow the C4 cleaning recipe (Raffel et al. 2020,
# "Exploring the Limits of Transfer Learning", appendix C) adapted to
# whole-document granularity, plus Gopher's repetition rule
# (Rae et al. 2021, table A1).
C4_MIN_TOKENS = 5
C4_MEAN_TOKEN_LEN_RANGE = (300, 1000)  # e2-scaled: 3.0 .. 10.0 chars
C4_MIN_DISTINCT_RATIO_E4 = 3000  # Gopher-style repetition cutoff


def c4_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, f_short, f_word_len, f_no_terminal, f_brace, f_lorem,
    f_repetitive, keep): one INT flag per C4/Gopher rejection rule and
    the final keep decision (1 = survives every rule). All flags are
    emitted — a pipeline tuning its thresholds wants the rejection
    histogram, not just the survivor set."""
    text = F.col(text_col)
    n_tok = X.token_count(text)
    mlen = X.mean_token_len_e2(text)
    dratio = X.distinct_token_ratio_e4(text)

    f_short = (n_tok < C4_MIN_TOKENS).cast("int")
    lo, hi = C4_MEAN_TOKEN_LEN_RANGE
    f_word_len = ((mlen < lo) | (mlen > hi)).cast("int")
    f_no_terminal = (~F.trim(text).rlike(r'[.!?"]$')).cast("int")
    f_brace = text.contains("{").cast("int")
    f_lorem = F.lower(text).contains("lorem ipsum").cast("int")
    f_repetitive = (dratio < C4_MIN_DISTINCT_RATIO_E4).cast("int")

    flags = [f_short, f_word_len, f_no_terminal, f_brace, f_lorem, f_repetitive]
    keep = F.lit(1)
    for f in flags:
        keep = keep * (1 - f)

    return df.select(
        F.col(id_col).alias("doc_id"),
        f_short.alias("f_short"),
        f_word_len.alias("f_word_len"),
        f_no_terminal.alias("f_no_terminal"),
        f_brace.alias("f_brace"),
        f_lorem.alias("f_lorem"),
        f_repetitive.alias("f_repetitive"),
        keep.cast("int").alias("keep"),
    )


# ------------------------------------------------------------ PII scrub --

# Deliberately simple, RE2-compatible patterns (no lookarounds, no
# backrefs) so the same regex runs in Spark (java.util.regex) and any
# RE2-based oracle engine.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kinds: Optional[Sequence[str]] = None,
) -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_phone, clean_text): count and redact
    PII-shaped substrings; each match is replaced with ``<KIND>``.
    Pure scan-local regex work inside whole-stage codegen."""
    kinds = list(kinds or PII_PATTERNS)
    text = F.col(text_col)
    cols = [F.col(id_col).alias("doc_id")]
    clean = text
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        cols.append(
            F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{kind}")
        )
        clean = F.regexp_replace(clean, pat, f"<{kind.upper()}>")
    cols.append(clean.alias("clean_text"))
    return df.select(*cols)


# ------------------------------------------------------------- BM25 --


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score) BM25 relevance of every matching document for a
    literal multi-term query — the classic lexical-retrieval scorer
    (Robertson-Sparck Jones; the BM25+ idf ``ln(1 + (N - df + .5)/(df
    + .5))``, never negative).

    Plan economy for a bounded query (the only kind a search box
    sends): NO explode, NO per-term join. Each term's tf is a
    scan-local ``size(filter(tokens, w = term))`` column; corpus stats
    (N, avgdl, per-term df) are ONE 1-row aggregate broadcast back; the
    score is a left-associative chain over the terms. The whole plan is
    scan -> 1-row agg -> broadcast -> scan -> top-k: two passes over
    the corpus, zero shuffles of it.

    Returns only docs containing at least one query term."""
    toks = F.col("_toks")  # staged: tokenizer runs once per row, not
    dl = F.size(toks).cast("double")  # once per query term
    tf_cols = [
        F.size(F.filter(toks, lambda w: w == F.lit(t))).cast("double").alias(f"tf{i}")
        for i, t in enumerate(query_terms)
    ]
    base = df.select(
        F.col(id_col).alias("doc_id"),
        X.tokens(F.lower(F.col(text_col))).alias("_toks"),
    ).select("doc_id", dl.alias("dl"), *tf_cols)

    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("double")).alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    score: Column = F.lit(0.0)
    any_hit: Column = F.lit(False)
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5)) / (F.col(f"df{i}") + F.lit(0.5))
        )
        score = score + idf * (
            F.col(f"tf{i}") * F.lit(k1 + 1.0) / (F.col(f"tf{i}") + norm)
        )
        any_hit = any_hit | (F.col(f"tf{i}") > 0)
    return scored.filter(any_hit).select("doc_id", score.alias("score"))


def bm25_top_k(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    **kw,
) -> DataFrame:
    """(doc_id, rank_n, score_e6): bounded BM25 top-k, score-desc with
    doc_id tie-break, e6-scaled for cross-engine hashing."""
    scored = bm25_scores(df, query_terms, **kw)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank_n", F.row_number().over(w).cast("long"))
        .select(
            "doc_id",
            "rank_n",
            F.round(F.col("score") * 1_000_000).cast("long").alias("score_e6"),
        )
    )


def vocab_growth(
    df: DataFrame,
    bucket_docs: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary growth curve (the Heaps-law saturation measurement):
    ingest the corpus in ``id_col`` order, bucketed ``bucket_docs``
    documents at a time, and report how much NEW vocabulary each bucket
    contributes — the marginal-novelty signal that tells a curation
    pipeline when additional crawl slices stop paying for themselves.

    Exact formulation without any iterative prefix scan: a term's
    contribution lands entirely in the bucket of its FIRST occurrence
    (min doc id per term), so new-terms-per-bucket is ONE vocabulary
    aggregation, and the cumulative curve is a running sum over the
    tiny bucket table. Buckets use exact integer floor division of the
    id — portable to any engine.

    Returns (bucket, n_docs, new_terms, cum_terms): bucket =
    id div bucket_docs, ``n_docs`` the documents in it, ``new_terms``
    first-occurrence vocabulary, ``cum_terms`` the distinct-vocabulary
    size after the bucket. Buckets with docs but no new terms still
    appear (n_docs > 0, new_terms = 0).

    Scale shape: the term aggregation is the unavoidable vocabulary
    shuffle (exact first-occurrence needs it — for an approximate curve
    at extreme scale feed bucket slices to ``sketches.kmv_distinct``
    and difference the estimates); everything after operates on
    O(buckets) rows. The doc-count aggregation is scan-local-keyed and
    cheap."""
    w = int(bucket_docs)
    if w < 1:
        raise ValueError("bucket_docs must be >= 1")
    c = F.col(id_col).cast("long")
    bucket = F.call_function(
        "div", c - F.pmod(c, F.lit(w)), F.lit(w)
    ).alias("bucket")
    firsts = (
        df.select(c.alias("_id"), F.explode(X.tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.min("_id").alias("first_id"))
    )
    fc = F.col("first_id")
    new_terms = (
        firsts.select(
            F.call_function("div", fc - F.pmod(fc, F.lit(w)), F.lit(w)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
    )
    docs_per = df.select(bucket).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    wcum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        docs_per.join(new_terms, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_docs",
            F.coalesce("new_terms", F.lit(0)).cast("long").alias("new_terms"),
        )
        .withColumn("cum_terms", F.sum("new_terms").over(wcum).cast("long"))
    )


def bigram_logprob_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_bigrams, mean_logprob_e6): per-document mean CONDITIONAL
    bigram log-probability ``ln P(w2 | w1)`` under the corpus's own
    2-gram counts — the next step up from ``unigram_logprob_scores``:
    word-salad whose words are individually corpus-typical but never
    co-occur scores low here while passing the unigram proxy.

    Same determinism discipline: each (doc, bigram) contribution
    ``cnt * ln(bigram_count / context_count)`` is e6-rounded to BIGINT
    BEFORE summation; the per-doc mean is integer ``div`` (truncation,
    matching DuckDB's BIGINT ``//``). Documents with fewer than two
    tokens have no bigrams and emit no row.

    Scale shape: bigram extraction is scan-local array work; the three
    aggregations (per-doc, per-bigram, per-context) are map-side
    combined. The context join runs between the two AGGREGATE tables
    (per-bigram x per-context) so the per-doc fact table shuffles only
    once — for the bigram-keyed probability join (AQE splits
    stopword-pair skew); no corpus rescan."""
    toks = F.col("_toks")  # staged below; see text.ngrams_of
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_doc = (
        df.select(
            F.col(id_col).alias("doc_id"),
            X.tokens(F.col(text_col)).alias("_toks"),
        )
        .select("doc_id", F.explode(grams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # read 3x (bigram totals, context totals, the contribution join)
        # — materialize so the corpus is tokenized once
        .localCheckpoint(eager=False)
    )
    bgc = per_doc.groupBy("bg").agg(F.sum("cnt").alias("bf"))
    ctx = bgc.select(
        F.split(F.col("bg"), " ", 2).getItem(0).alias("w1"), "bf"
    ).groupBy("w1").agg(F.sum("bf").alias("cf"))
    # per-bigram probability table: |bigrams| rows joined to |contexts|
    # rows — both aggregates, both far smaller than the per-doc fact
    lp = (
        bgc.withColumn("w1", F.split(F.col("bg"), " ", 2).getItem(0))
        .join(ctx, "w1")
        .select("bg", "bf", "cf")
    )
    contrib = (
        per_doc.join(lp, "bg")
        .withColumn(
            "lp_e6",
            F.round(
                F.col("cnt")
                * F.log(F.col("bf").cast("double") / F.col("cf"))
                * 1_000_000
            ).cast("long"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        F.expr("sum(lp_e6) div sum(cnt)").cast("long").alias("mean_logprob_e6"),
    )


def log_odds_classifier_scores(
    df: DataFrame,
    positive: Column,
    train_rate: float = 500_000,  # e6-scaled; 500_000 = 50%
    salt: str = "clf",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, is_train, y, n_tokens, score_e6, predicted): a
    fastText-style LINEAR text classifier trained and applied in two
    corpus scans — the workhorse quality/language filter of LLM data
    pipelines (CCNet's fastText lang-id, the quality classifiers of
    GPT-3/LLaMA data work) re-expressed as pure DataFrame algebra.

    Training IS an aggregation: multinomial naive Bayes log-odds
    ``w(t) = ln( (tf_pos(t)+1) / (T_pos+V) ) - ln( (tf_neg(t)+1) /
    (T_neg+V) )`` needs only per-class term counts, computed on a
    deterministic md5 half-split (same derivation as
    ``sampling.hash_sample`` — reproducible across engines and cluster
    sizes). Scoring is the usual e6-integer discipline: each
    (doc, term) contribution ``cnt * w_e6`` is an exact BIGINT product
    (w_e6 rounded once per term), so per-doc sums are order-exact.
    ``predicted`` = 1 iff prior + sum > 0. Terms unseen in training
    contribute the smoothing-only weight ``ln((T_neg+V)/(T_pos+V))``
    via the left join's COALESCE — no silent drop of novel vocabulary.

    Scale shape (100 TB): the tokenize+count pass is the shared
    two-level ``term_doc_counts`` aggregation; class totals are a 1-row
    broadcast; the weight join is term-keyed (vocab-sized right side,
    AQE splits stopword skew). The log-ratio is evaluated as ONE ln of
    an exact bigint-product ratio — both factors stay below 2^53 up to
    ~90M-token classes; beyond that split into two ln() calls (noted
    here so the overflow point is explicit).
    """
    from ahnlich_spark.operators.sampling import _hash_unit

    labels = df.select(
        F.col(id_col).alias("doc_id"),
        positive.cast("int").alias("y"),
        (_hash_unit(F.col(id_col), salt) < int(train_rate)).cast("int").alias(
            "is_train"
        ),
    )
    per_doc = (
        term_doc_counts(df, text_col, id_col)
        .join(labels, "doc_id")
        # read twice (class counts, scoring join) — materialize so the
        # corpus is tokenized once
        .localCheckpoint(eager=False)
    )

    train = per_doc.filter(F.col("is_train") == 1)
    by_term = train.groupBy("term").agg(
        F.sum(F.when(F.col("y") == 1, F.col("cnt")).otherwise(0)).alias("tf_pos"),
        F.sum(F.when(F.col("y") == 0, F.col("cnt")).otherwise(0)).alias("tf_neg"),
    )
    totals = by_term.select(
        F.sum("tf_pos").alias("t_pos"),
        F.sum("tf_neg").alias("t_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    doc_totals = labels.filter(F.col("is_train") == 1).select(
        F.sum(F.col("y")).alias("n_pos"),
        F.sum(F.lit(1) - F.col("y")).alias("n_neg"),
    )

    contrib = (
        per_doc.join(by_term, "term", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "w_e6",
            F.round(
                F.log(
                    ((F.coalesce(F.col("tf_pos"), F.lit(0)) + 1)
                     * (F.col("t_neg") + F.col("v"))).cast("double")
                    / ((F.coalesce(F.col("tf_neg"), F.lit(0)) + 1)
                       * (F.col("t_pos") + F.col("v"))).cast("double")
                )
                * 1_000_000
            ).cast("long"),
        )
    )
    scored = contrib.groupBy("doc_id", "is_train", "y").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.col("cnt") * F.col("w_e6")).cast("long").alias("sum_e6"),
    )
    return (
        scored.crossJoin(F.broadcast(doc_totals))
        .withColumn(
            "score_e6",
            (
                F.col("sum_e6")
                + F.round(
                    F.log(
                        (F.col("n_pos") + 1).cast("double")
                        / (F.col("n_neg") + 1).cast("double")
                    )
                    * 1_000_000
                ).cast("long")
            ),
        )
        .select(
            "doc_id",
            F.col("is_train").cast("long").alias("is_train"),
            F.col("y").cast("long").alias("y"),
            "n_tokens",
            "score_e6",
            (F.col("score_e6") > 0).cast("long").alias("predicted"),
        )
    )


def dsir_select(
    df: DataFrame,
    target: Column,
    n: int = 50,
    n_buckets: int = 4096,
    salt: str = "dsir",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(rank_n, doc_id, n_tokens, weight_e6): Data Selection via
    Importance Resampling (Xie et al. 2023) — pick the ``n`` raw
    documents whose HASHED unigram profile looks most like a target
    subset. The importance weight of a doc is
    ``sum_b cnt_b * ln( p_target(b) / p_raw(b) )`` over md5-hashed
    token buckets with add-1 smoothing; top-``n`` by weight, ties by
    doc_id asc. Docs already IN the target set are excluded from
    selection (they defined the distribution).

    The hashing trick is the scale lever that distinguishes this from
    the vocab-keyed classifier above: both distributions live in a
    FIXED ``n_buckets``-row table regardless of corpus size, so the
    per-doc scoring join is a broadcast hash join — no vocab-sized
    shuffle, no stopword skew, and the target profile of a 100 TB
    corpus is ~4096 rows of driver-free state. Per-(doc, bucket)
    contributions are e6-rounded BIGINTs before the sum (order-exact);
    selection is a bounded TakeOrderedAndProject.
    """
    from ahnlich_spark.operators.sampling import _hash_unit

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        target.cast("int").alias("is_target"),
        F.explode(X.tokens(F.col(text_col))).alias("tok"),
    ).select(
        "doc_id",
        "is_target",
        (_hash_unit(F.lower(F.col("tok")), salt) % n_buckets).alias("bucket"),
    )
    per_doc = (
        toks.groupBy("doc_id", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # read twice (bucket profile, scoring join) — tokenize once
        .localCheckpoint(eager=False)
    )
    by_bucket = per_doc.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target") == 1, F.col("cnt")).otherwise(0)).alias(
            "tf_t"
        ),
        F.sum("cnt").alias("tf_r"),
    )
    totals = by_bucket.select(
        F.sum("tf_t").alias("t_t"), F.sum("tf_r").alias("t_r")
    )
    weights = by_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log(
                ((F.col("tf_t") + 1) * (F.col("t_r") + n_buckets)).cast("double")
                / ((F.col("tf_r") + 1) * (F.col("t_t") + n_buckets)).cast("double")
            )
            * 1_000_000
        ).cast("long").alias("w_e6"),
    )
    scored = (
        per_doc.filter(F.col("is_target") == 0)
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("w_e6")).cast("long").alias("weight_e6"),
        )
    )
    w = Window.orderBy(F.desc("weight_e6"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("weight_e6"), F.asc("doc_id"))
        .limit(n)
        .withColumn("rank_n", F.row_number().over(w).cast("long"))
        .select("rank_n", "doc_id", "n_tokens", "weight_e6")
    )


def postings_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional inverted-index postings (term, doc_id, pos) — the
    persisted artifact repeated phrase/proximity queries read INSTEAD of
    rescanning corpus text, the same build-once/query-many contract as
    the ANN index columns. ``pos`` is 1-based token position.

    Scale shape: one scan-local posexplode; write the result
    partitioned/bucketed by term and a phrase query touches only its
    terms' posting lists."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(X.tokens(F.col(text_col))).alias("pos0", "term"),
    ).select("term", "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"))


def phrase_match(postings: DataFrame, phrases) -> DataFrame:
    """Exact phrase occurrence counts from a postings table: a phrase
    of m terms matches where its m posting rows align at consecutive
    positions — the classic positional-index phrase join. Returns
    (phrase, doc_id, n_occ), one row per document containing the
    phrase at least once.

    Scale shape: per phrase, m-1 joins keyed on (doc_id, pos); each
    side is pre-filtered to ONE term's posting list, so join input is
    the term's document frequency, not the corpus — and the plan never
    touches text. Multi-word phrases whose terms contain whitespace are
    rejected (they could not have been tokenized that way)."""
    out = None
    for phrase in phrases:
        terms = phrase.split()
        if not terms:
            raise ValueError("empty phrase")
        cur = postings.filter(F.col("term") == terms[0]).select(
            "doc_id", F.col("pos").alias("p0")
        )
        for i, t in enumerate(terms[1:], start=1):
            nxt = postings.filter(F.col("term") == t).select(
                F.col("doc_id").alias("_d"), F.col("pos").alias("_p")
            )
            cur = cur.join(
                nxt,
                (F.col("doc_id") == F.col("_d")) & (F.col("_p") == F.col("p0") + i),
            ).drop("_d", "_p")
        hit = cur.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_occ")
        ).select(F.lit(phrase).alias("phrase"), "doc_id", "n_occ")
        out = hit if out is None else out.unionByName(hit)
    return out


def hashed_tf_vectors(
    df: DataFrame,
    dim: int = 1 << 18,
    text_col: str = "text",
    id_col: str = "doc_id",
    signed: bool = True,
    lowercase: bool = True,
) -> DataFrame:
    """Feature hashing ("the hashing trick", Weinberger et al., ICML
    2009): every token maps to bucket ``md5(tok) % dim``; per-document
    bucket values are SIGNED term-frequency sums (a second md5 bit
    gives each token +-1, so colliding tokens cancel in expectation
    instead of biasing upward). The fixed-dimension text featurizer of
    large-scale linear models — no vocabulary table, no fit pass, any
    engine reproduces the exact same buckets.

    Returns SPARSE rows (doc_id, bucket, tf) — zero buckets absent, tf
    an exact BIGINT. Densify per consumer if a model needs arrays; the
    sparse form is what survives 100 TB (a dense dim-wide array per doc
    multiplies the corpus by dim/avg_tokens).

    Scale shape: tokenize + bucket/sign hashing is scan-local; the ONE
    aggregation keys (doc, bucket) with map-side combine — output rows
    are min(tokens, dim) per doc. No vocabulary ever crosses the wire
    (contrast ``vocab_table``/``tfidf_top_terms``, which shuffle terms)."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(X.tokens(src)).alias("tok")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        % int(dim)
    )
    if signed:
        sign_bit = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("sg|"), F.col("tok"))), 1, 15),
                16, 10,
            ).cast("long") % 2
        )
        val = F.lit(1) - 2 * sign_bit  # 0 -> +1, 1 -> -1
    else:
        val = F.lit(1)
    return (
        toks.select("doc_id", bucket.alias("bucket"), val.cast("long").alias("_v"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("_v").cast("long").alias("tf"))
        .filter(F.col("tf") != 0)
    )
