"""Text-analysis scalar functions for large-scale training-data
pipelines — token counting, quality scoring, language-ID, document
fingerprinting, shingling, minhash.

Everything here is native ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen). No Python runs per row: at 100 TB these are
scan-local map expressions with zero shuffle.

Cross-engine determinism note: functions used by the duckdb-oracle
gate avoid engine-specific hashes — minhash derives a BIGINT base hash
from md5 (identical everywhere) and applies integer universal hashing;
simhash derives its 64 token-hash bits from md5 hex slices (60 low bits
+ 4 high bits, each < 2^60 so no engine hits signed-overflow), making
the fingerprints bit-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- tokens --

def tokens(text: Column) -> Column:
    """Whitespace tokenization (ARRAY<STRING>); empty text -> empty array."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex (words / numbers / punct)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0))
    )


# ---------------------------------------------------------------- quality --

def distinct_token_ratio_e4(text: Column) -> Column:
    """10000 * distinct/total tokens, as BIGINT (0 for empty docs)."""
    toks = tokens(text)
    n = F.size(toks)
    d = F.size(F.array_distinct(toks))
    return F.when(n == 0, F.lit(0)).otherwise(
        F.round(d * F.lit(10000.0) / n).cast("long")
    )


def punct_ratio_e4(text: Column) -> Column:
    """10000 * punctuation-chars/total-chars, as BIGINT."""
    total = F.length(text)
    punct = total - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(total == 0, F.lit(0)).otherwise(
        F.round(punct * F.lit(10000.0) / total).cast("long")
    )


def mean_token_len_e2(text: Column) -> Column:
    """100 * mean token length, as BIGINT."""
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n == 0, F.lit(0)).otherwise(
        F.round(total * F.lit(100.0) / n).cast("long")
    )


STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def stopword_ratio_e4(text: Column, stopwords=STOPWORDS_EN) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(n == 0, F.lit(0)).otherwise(
        F.round(sw * F.lit(10000.0) / n).cast("long")
    )


# ---------------------------------------------------------------- lang id --

# Marker stopwords per language; scoring = total occurrences of the
# language's markers among the tokens; argmax wins, ties broken by the
# fixed order below (deterministic, SQL-replicable).
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "les", "et", "des", "une"),
    "de": ("der", "die", "und", "das", "ein", "nicht"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}
LANG_ORDER = ("en", "es", "fr", "de", "zh")


def _marker_hits(toks: Column, markers) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def _lang_winner(score_of) -> Column:
    """Argmax over LANG_ORDER given a lang -> score-Column accessor;
    earlier languages win ties, 'und' when nothing scores."""
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in reversed(LANG_ORDER):
        score = score_of(lang).cast("long")
        take = score >= best_score
        best_lang = F.when((score > 0) & take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return best_lang


def lang_id(text: Column) -> Column:
    """Heuristic n-gram/stopword language ID: most marker hits wins;
    'und' (undetermined) when no marker fires at all. Per-row spec —
    the scaled path is ``lang_id_table`` (identical output)."""
    toks = tokens(text)
    hits = {lang: _marker_hits(toks, LANG_MARKERS[lang]) for lang in LANG_ORDER}
    return _lang_winner(lambda lang: hits[lang])


def lang_id_table(df, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, pred_lang) via explode + ONE codegen'd aggregation: the
    per-row higher-order ``filter`` lambdas in ``lang_id`` are
    interpreted per element; conditional SUMs over the exploded token
    table run inside whole-stage codegen with map-side combine (the
    same rewrite that made minhash/simhash ~10x faster). explode_outer
    keeps token-less docs, which aggregate to all-zero scores -> 'und'."""
    from ahnlich_spark.plans.layout import fan_out

    toks = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
    )
    aggs = [
        F.coalesce(
            F.sum(F.col("tok").isin(*LANG_MARKERS[lang]).cast("int")), F.lit(0)
        ).alias(f"_s_{lang}")
        for lang in LANG_ORDER
    ]
    scores = toks.groupBy("doc_id").agg(*aggs)
    return scores.select(
        "doc_id", _lang_winner(lambda lang: F.col(f"_s_{lang}")).alias("pred_lang")
    )


# ----------------------------------------------------------- fingerprints --

def fingerprint_md5(text: Column) -> Column:
    """Whitespace-normalized md5 fingerprint (portable across engines).
    Collapse runs FIRST, then trim: SQL trim strips only spaces, so
    trimming first would leave leading/trailing tabs/newlines behind as
    a stray edge space ('b' vs '\\nb' fingerprinting differently — found
    by the hypothesis dedup property, tests/test_properties.py)."""
    return F.md5(F.trim(F.regexp_replace(text, r"\s+", " ")))


def rolling_hash(text: Column, base: int = 257, mod: int = 1_000_000_007) -> Column:
    """Karp-Rabin polynomial rolling hash over character codes, computed
    with exact integer arithmetic (JVM-side fold over the char array)."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.coalesce(F.ascii(c), F.lit(0))) % mod,
    )


def wordset_fingerprint(text: Column) -> Column:
    """Order-insensitive bag-of-distinct-words fingerprint: md5 of the
    sorted distinct token list."""
    return F.md5(F.concat_ws("\x1f", F.array_sort(F.array_distinct(tokens(text)))))


# --------------------------------------------------------------- shingles --

def ngrams_of(toks: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (ARRAY<STRING>) from a token-array
    column; docs shorter than n tokens yield the whole document as one
    gram.

    Pass a MATERIALIZED column reference, not a tokenizer expression:
    ``toks`` is referenced inside per-gram HOF lambdas, and Catalyst
    re-evaluates a substituted expression tree per element — the
    tokenizer would re-run O(len) times per row (measured 10x on
    gram-heavy scans; stage ``tokens(text)`` through a select first —
    CollapseProject keeps the boundary because the alias is non-cheap
    and multiply-referenced)."""
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.when(k >= n, grams).otherwise(whole)


def word_ngrams_with_multiplicity(text: Column, n: int = 2) -> Column:
    """Text-input convenience wrapper over ``ngrams_of`` — fine for
    one-off expressions; hot scans should stage the token array and
    call ``ngrams_of`` directly (see its docstring)."""
    return ngrams_of(tokens(text), n)


def repetition_table(df, n: int = 2, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style intra-document repetition stats: per doc, the word
    n-gram multiset's total / distinct / top counts and the duplicate-
    gram ratio (scaled e4, exact integer division — hash-portable).
    Heavily repetitive documents (dup_ratio high, top_gram_count high)
    are boilerplate/spam and get dropped by quality filters.

    Scale: entirely SCAN-LOCAL — the multiset stats of one document
    depend only on that document's grams, so there is nothing to
    shuffle: sort the gram array per row and fold the sorted runs
    (top_gram_count = longest run). The earlier explode -> two-level
    groupBy formulation shuffled every (doc, gram) pair twice; per-row
    higher-order ops cost O(g log g) interpreted steps on ~100-gram
    docs — orders of magnitude below one gram-row exchange."""
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        F.array_sort(ngrams_of(F.col("_toks"), n)).alias("sg"),
    )
    # ONE fold over the sorted grams yields run count (= distinct) and
    # longest run (= top multiplicity) together
    run_state = F.aggregate(
        F.col("sg"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
            F.lit(0).cast("long").alias("runs"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
            (acc["runs"] + F.when(x == acc["prev"], 0).otherwise(1)).alias("runs"),
        ),
    )
    return (
        staged.select(
            "doc_id",
            F.size("sg").cast("long").alias("n_grams"),
            run_state.alias("_rs"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("_rs.runs").alias("n_distinct"),
            F.col("_rs.best").alias("top_gram_count"),
        )
        .withColumn(
            "dup_ratio_e4",
            F.expr("(n_grams - n_distinct) * 10000 div n_grams"),
        )
    )


def shingles_of(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (ARRAY<STRING>) from a token-array
    column; docs shorter than n tokens shingle to the whole document.
    Same staging contract as ``ngrams_of``: pass a materialized column,
    not a tokenizer expression."""
    return F.array_distinct(ngrams_of(toks, n))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Text-input convenience wrapper over ``shingles_of`` — fine for
    one-off expressions; hot scans should stage the token array and
    call ``shingles_of`` directly (see ``ngrams_of``)."""
    return shingles_of(tokens(text), n)


# ---------------------------------------------------------------- minhash --

MINHASH_P = 1_000_000_007


def minhash_coeffs(n_hashes: int):
    """Deterministic universal-hash coefficients (a_i, b_i), engine-
    independent: h_i(x) = (a_i * x + b_i) mod P over a base hash x < P.
    One md5 per shingle feeds all n_hashes functions — a 16x cut in
    cryptographic-hash work vs hashing per (seed, shingle)."""
    a = [((2 * i + 1) * 2654435761) % MINHASH_P for i in range(n_hashes)]
    b = [(i * 40503 + 17) % MINHASH_P for i in range(n_hashes)]
    return a, b


def minhash_base_hash(shingle: Column) -> Column:
    """Base hash < P from the first 15 md5 hex chars (60 bits), portable:
    Spark ``conv(substr(md5,1,15),16,10)`` == duckdb
    ``('0x'||substring(md5,1,15))::BIGINT``."""
    return (
        F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long") % MINHASH_P
    )


def minhash_signature(shingles: Column, n_hashes: int = 16) -> Column:
    """MinHash signature as ARRAY<LONG>: element i is the MIN over
    shingles of (a_i * base_hash(s) + b_i) mod P. a_i,b_i < P and
    base < P keep every product under 2^60 — exact in BIGINT on any
    engine (no float, no overflow)."""
    a, b = minhash_coeffs(n_hashes)
    hb = F.transform(shingles, minhash_base_hash)
    return F.array(
        *[
            F.array_min(F.transform(hb, lambda x, i=i: (F.lit(a[i]) * x + F.lit(b[i])) % MINHASH_P))
            for i in range(n_hashes)
        ]
    )


def minhash_bands(signature: Column, n_bands: int = 8, rows_per_band: int = 2) -> Column:
    """Band keys for LSH bucketing: ARRAY<STRING> of length n_bands, each
    'band_index|h1|h2|...' — docs sharing ANY band key are candidates."""
    return F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[
                    F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(n_bands)
        ]
    )


# --------------------------------------------------------------- simhash --

def simhash_token_hash_lo(tok: Column) -> Column:
    """Bits 0..59 of the portable 64-bit token hash: md5 hex chars 2-16
    as a 60-bit BIGINT. Portable: Spark ``conv(substr(md5,2,15),16,10)``
    == duckdb ``('0x'||substring(md5,2,15))::BIGINT``. Staying under 61
    bits keeps every value positive on both engines."""
    return F.conv(F.substring(F.md5(tok), 2, 15), 16, 10).cast("long")


def simhash_token_hash_hi(tok: Column) -> Column:
    """Bits 60..63 of the portable token hash: the first md5 hex char."""
    return F.conv(F.substring(F.md5(tok), 1, 1), 16, 10).cast("long")


def simhash_token_bit(lo: Column, hi: Column, b: int) -> Column:
    """Bit ``b`` (0..63) of the portable token hash, as 0/1 LONG."""
    src, sh = (lo, b) if b < 60 else (hi, b - 60)
    return F.shiftright(src, sh).bitwiseAND(F.lit(1))


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens; token-hash bits derived
    from md5 hex slices (engine-portable, duckdb-reproducible).
    Per-bit vote: +1 if the token's hash bit is set else -1; fingerprint
    bit = 1 where the vote sum is >= 0 (empty doc -> all bits -> -1).

    This is the per-row higher-order-function SPEC; the scaled path is
    ``operators.dedup.simhash_table`` (same output, explode+aggregate)."""
    toks = tokens(text)
    hashes = F.transform(
        toks,
        lambda t: F.struct(
            simhash_token_hash_lo(t).alias("lo"), simhash_token_hash_hi(t).alias("hi")
        ),
    )
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(63)),
            lambda a, b: a
            + F.when(
                F.call_function(
                    "shiftright",
                    F.when(b < 60, h["lo"]).otherwise(h["hi"]),
                    F.when(b < 60, b).otherwise(b - 60),
                ).bitwiseAND(F.lit(1))
                == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(63)),
            lambda v, b: F.when(
                v >= 0, F.call_function("shiftleft", F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
