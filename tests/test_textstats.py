"""Semantic tests for corpus text statistics: vocabulary, TF-IDF,
C4-style quality filtering, PII scrubbing."""

import math

from pyspark.sql import functions as F

from ahnlich_spark.operators.textstats import (
    c4_quality_flags,
    pii_scrub,
    tfidf_top_terms,
    vocab_table,
    vocab_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_counts_tf_and_df(spark):
    docs = _docs(
        spark,
        [
            (1, "apple apple banana"),
            (2, "Apple cherry"),
            (3, ""),
        ],
    )
    vocab = {r["term"]: (r["tf"], r["doc_freq"]) for r in vocab_table(docs).collect()}
    # lowercased: 'apple' appears 3x over 2 docs; empty doc contributes nothing
    assert vocab["apple"] == (3, 2)
    assert vocab["banana"] == (1, 1)
    assert vocab["cherry"] == (1, 1)
    assert len(vocab) == 3


def test_vocab_top_terms_order_and_tiebreak(spark):
    docs = _docs(spark, [(1, "b b a a c")])
    rows = vocab_top_terms(docs, n=2).collect()
    # tf ties (a=2, b=2) break alphabetically
    assert [r["term"] for r in rows] == ["a", "b"]


def test_tfidf_ranks_distinctive_terms_first(spark):
    # 'shared' is in every doc (idf = ln(1) = 0); 'rare' only in doc 1
    docs = _docs(
        spark,
        [
            (1, "shared rare rare"),
            (2, "shared other"),
            (3, "shared thing"),
        ],
    )
    top = tfidf_top_terms(docs, k=1).collect()
    by_doc = {r["doc_id"]: r for r in top}
    assert by_doc[1]["term"] == "rare"
    want = round(2 * math.log(3 / 1) * 10000)
    assert by_doc[1]["tfidf_e4"] == want
    # every doc got exactly one row
    assert sorted(by_doc) == [1, 2, 3]


def test_c4_flags_truth_table(spark):
    good = "this sentence has plenty of reasonable looking english words inside it."
    docs = _docs(
        spark,
        [
            (1, good),
            (2, "too short."),                       # < 5 tokens
            (3, good[:-1]),                          # no terminal punctuation
            (4, "code block { return x } inside it all day long today."),  # brace
            (5, "Lorem ipsum dolor sit amet consectetur adipiscing elit today."),
            (6, "word word word word word word word word word word."),     # repetitive
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in c4_quality_flags(docs).collect()}
    assert rows[1]["keep"] == 1
    assert rows[2]["f_short"] == 1 and rows[2]["keep"] == 0
    assert rows[3]["f_no_terminal"] == 1 and rows[3]["keep"] == 0
    assert rows[4]["f_brace"] == 1 and rows[4]["keep"] == 0
    assert rows[5]["f_lorem"] == 1 and rows[5]["keep"] == 0
    assert rows[6]["f_repetitive"] == 1 and rows[6]["keep"] == 0


def test_pii_scrub_redacts_and_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail me at jane.doe+x@example.co or 555-123-4567 from 10.0.0.1"),
            (2, "clean text with no identifiers at all"),
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in pii_scrub(docs).collect()}
    r1 = rows[1]
    assert (r1["n_email"], r1["n_phone"], r1["n_ipv4"]) == (1, 1, 1)
    assert "<EMAIL>" in r1["clean_text"]
    assert "<PHONE>" in r1["clean_text"]
    assert "<IPV4>" in r1["clean_text"]
    assert "jane.doe" not in r1["clean_text"]
    r2 = rows[2]
    assert (r2["n_email"], r2["n_phone"], r2["n_ipv4"]) == (0, 0, 0)
    assert r2["clean_text"] == "clean text with no identifiers at all"


def test_vocab_plan_is_two_hash_aggregates(spark):
    """Scale shape: the vocab aggregation must be HashAggregate pairs
    (map-side partial + final), never a distinct over raw tokens."""
    docs = _docs(spark, [(1, "a b c"), (2, "a b")])
    plan = vocab_table(docs)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Expand" not in plan  # no distinct-expansion


def test_tfidf_plan_prunes_window_topk(spark):
    """Scale shape: the per-doc top-k must plan as a WindowGroupLimit
    (rank prune before the full window sort materializes)."""
    docs = _docs(spark, [(1, "a b c a"), (2, "b c d")])
    plan = (
        tfidf_top_terms(docs, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_unigram_logprob_ranks_typical_docs_higher(spark):
    from ahnlich_spark.operators.textstats import unigram_logprob_scores

    # 'common common' docs dominate the corpus; doc 4 is all-rare
    docs = _docs(
        spark,
        [
            (1, "common common common words here"),
            (2, "common common words here too"),
            (3, "common words here again now"),
            (4, "zxqv wkjh pqrs tuvw xyzab"),
        ],
    )
    rows = {r["doc_id"]: r for r in unigram_logprob_scores(docs).collect()}
    # every doc scored, token counts exact
    assert rows[1]["n_tokens"] == 5 and rows[4]["n_tokens"] == 5
    # corpus-typical docs score strictly higher (less negative)
    assert rows[1]["mean_logprob_e6"] > rows[4]["mean_logprob_e6"]
    assert all(r["mean_logprob_e6"] < 0 for r in rows.values())


# ---------------------------------------------------- vocab growth --

def test_vocab_growth_exact_prefix_parity(spark):
    """Each bucket's cum_terms must equal the brute-force distinct
    vocabulary of the id-ordered prefix; empty-novelty buckets appear
    with new_terms = 0."""
    from ahnlich_spark.operators.textstats import vocab_growth

    rows = [
        (0, "a b c"), (1, "a b"), (2, "c d"),   # bucket 0: {a,b,c,d}
        (3, "a a b"), (4, "d c"),               # bucket 1: nothing new
        (6, "e f a"), (7, "g"),                 # bucket 3 (gap at 2): e f g
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["bucket"]: (r["n_docs"], r["new_terms"], r["cum_terms"])
           for r in vocab_growth(df, bucket_docs=2).collect()}
    assert got == {0: (2, 3, 3), 1: (2, 1, 4), 2: (1, 0, 4), 3: (2, 3, 7)}


def test_vocab_growth_partition_order_invariant(spark):
    from ahnlich_spark.operators.textstats import vocab_growth

    df = spark.createDataFrame(
        [(i, f"w{i % 37} w{(i * 7) % 91} common") for i in range(400)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, vocab_growth(df, 50).collect()))
    b = sorted(map(tuple, vocab_growth(df.repartition(13), 50).collect()))
    assert a == b
    # cumulative total equals the true distinct vocabulary
    truth = df.selectExpr("explode(split(text, ' ')) AS t").select("t").distinct().count()
    assert a[-1][3] == truth


# ---------------------------------------------------- bigram logprob --

def test_bigram_logprob_matches_hand_computation(spark):
    """Tiny corpus against a by-hand conditional model, plus the
    short-doc exclusion (no bigrams -> no row)."""
    import math

    from ahnlich_spark.operators.textstats import bigram_logprob_scores

    rows = [(0, "a b a b"), (1, "a b"), (2, "a c"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["mean_logprob_e6"])
           for r in bigram_logprob_scores(df).collect()}
    # bigram counts: "a b"x3 (doc0 x2, doc1), "b a"x1, "a c"x1
    # contexts: a->4, b->1
    lp = {"a b": math.log(3 / 4), "b a": math.log(1 / 1), "a c": math.log(1 / 4)}
    def e6(x):
        return round(x * 1_000_000)
    d0 = (e6(2 * lp["a b"]) + e6(1 * lp["b a"]))
    assert 3 not in got  # single-token doc excluded
    assert got[0] == (3, int(d0 / 3) if d0 >= 0 else -((-d0) // 3))
    assert got[1] == (1, e6(lp["a b"]))
    assert got[2] == (1, e6(lp["a c"]))


def test_bigram_ranks_word_salad_below_natural_pairs(spark):
    """Docs repeating corpus-frequent PAIRS outscore docs of the same
    words in never-seen orders — the separation unigram scoring lacks."""
    from ahnlich_spark.operators.textstats import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    natural = " ".join(["the cat sat"] * 10)
    salad = " ".join(["cat the", "sat cat", "the sat"] * 5)
    df = spark.createDataFrame(
        [(0, natural), (1, salad)] + [(i, natural) for i in range(2, 8)],
        "doc_id long, text string",
    )
    bg = {r["doc_id"]: r["mean_logprob_e6"] for r in bigram_logprob_scores(df).collect()}
    ug = {r["doc_id"]: r["mean_logprob_e6"] for r in unigram_logprob_scores(df).collect()}
    assert bg[1] < bg[0], bg
    # same unigram composition: unigram proxy cannot separate them
    assert abs(ug[1] - ug[0]) < 30000, ug


# ---------------------------------------------------- phrase search --

def test_phrase_match_counts_and_overlaps(spark):
    """Occurrence counting against hand-counted fixtures, including
    overlapping matches ('a a a' contains 'a a' twice) and a phrase
    absent from the corpus."""
    from ahnlich_spark.operators.textstats import phrase_match, postings_table

    rows = [(0, "a a a b"), (1, "x a a y a a"), (2, "b c"), (3, "a b c a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    post = postings_table(df)
    got = {
        (r["phrase"], r["doc_id"]): r["n_occ"]
        for r in phrase_match(post, ["a a", "a b c", "zz qq"]).collect()
    }
    assert got == {
        ("a a", 0): 2,
        ("a a", 1): 2,
        ("a b c", 3): 1,
    }
