"""Byte-pair-encoding merge training over a distributed corpus.

Reference algorithm: Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units" (ACL 2016) — the count-pairs /
pick-argmax / merge loop every subword tokenizer trainer runs.
Re-expressed for Spark's execution model:

- The corpus is scanned ONCE, into a (word, count) vocabulary — by
  Heaps' law the vocab is sublinear in corpus size, and it is the only
  state the training loop ever touches. This is how production
  trainers work too (word-count first, then iterate on the vocab), and
  it is what makes BPE training feasible at 100 TB: the 100 TB scan
  happens once; the n_merges iterations run on megabytes.
- A word's symbol sequence is ONE string with every symbol wrapped in
  a \\x1f sentinel ("abc" -> "\\x1fa\\x1f\\x1fb\\x1f\\x1fc\\x1f..."), so the
  merge step is a plain ``replace(seq, '<L><R>', '<LR>')`` — a native
  JVM expression, no Python, no array fold. Because every symbol is
  fully wrapped, consecutive matches never share characters, which
  makes SQL replace's non-overlapping left-to-right semantics EXACTLY
  greedy BPE ("aaa" + merge(a,a) -> [aa, a]); the same primitive
  exists verbatim in other engines, which is what lets the DuckDB
  oracle replay training bit-for-bit.
- Each round is one tiny job over the vocab: pair counts with map-side
  partial aggregation, then an ORDER BY count DESC, left, right LIMIT 1
  argmax (the deterministic tie rule). The chosen pair is the only
  thing that returns to the driver. Vocab state is localCheckpoint'd
  per round so round r+1 never replays rounds 1..r.

Pair counting matches the reference: overlapping occurrences all count
("aaa" contributes (a,a) twice), weighted by word frequency, and each
word carries a terminal ``</w>`` end-of-word symbol so suffix merges
("e</w>") can be learned.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ahnlich_spark.functions import text as X

SEP = "\x1f"
EOW = "</w>"


def word_vocab(
    df: DataFrame, text_col: str = "text", max_vocab: Optional[int] = None
) -> DataFrame:
    """(seq, cnt) vocabulary: whitespace words counted corpus-wide, each
    rendered as its wrapped initial symbol sequence (characters +
    ``</w>``). ``max_vocab`` keeps the top-V words by (count desc,
    word) — a deterministic cap that bounds training state when the
    long tail doesn't matter (its pair counts are dominated anyway)."""
    words = df.select(F.explode(X.tokens(F.col(text_col))).alias("w")).filter(
        F.col("w") != ""
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    if max_vocab is not None:
        vocab = vocab.orderBy(F.desc("cnt"), "w").limit(int(max_vocab))
    seq = F.concat(
        F.regexp_replace(F.col("w"), "(.)", f"{SEP}$1{SEP}"),
        F.lit(f"{SEP}{EOW}{SEP}"),
    )
    return vocab.select(seq.alias("seq"), "cnt")


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count) over a wrapped-sequence vocab —
    every adjacent position, overlapping included, weighted by word
    count. One aggregation with map-side partials; the symbol explosion
    never leaves its scan partition before being pre-summed."""
    syms = F.split(
        F.expr("substring(seq, 2, length(seq) - 2)"), SEP + SEP
    ).alias("_syms")
    pairs = F.expr(
        "transform(sequence(1, size(_syms) - 1), "
        "i -> struct(element_at(_syms, i) AS l, element_at(_syms, i + 1) AS r))"
    )
    return (
        vocab.select(syms, "cnt")
        # a fully-merged word is ONE symbol and contributes no pairs —
        # and must be dropped BEFORE the transform: sequence(1, 0) is
        # descending [1, 0], so the expression would index past the
        # array instead of producing an empty list
        .filter(F.size("_syms") >= 2)
        .select(F.explode(pairs).alias("_p"), "cnt")
        .groupBy(
            F.col("_p.l").alias("left_sym"), F.col("_p.r").alias("right_sym")
        )
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
    )


def merge_expr(left: str, right: str):
    """The merge step as a native replace over the wrapped encoding."""
    return F.replace(
        F.col("seq"),
        F.lit(f"{SEP}{left}{SEP}{SEP}{right}{SEP}"),
        F.lit(f"{SEP}{left}{right}{SEP}"),
    )


def train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    max_vocab: Optional[int] = None,
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merges. Returns (merge_rank,
    left_sym, right_sym, pair_count) in training order; ties on count
    break by (left_sym, right_sym) binary order, so training is
    deterministic across partitionings, runs, and engines."""
    spark = df.sparkSession
    vocab = word_vocab(df, text_col, max_vocab).localCheckpoint()
    merges: List[Tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["left_sym"], top[0]["right_sym"], top[0]["pair_count"]
        merges.append((rank, l, r, int(c)))
        vocab = vocab.withColumn("seq", merge_expr(l, r)).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string, pair_count long",
    )


def segment_tokens(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned merges (in rank order) to a corpus: each document's
    words are segmented into subword symbols and returned exploded as
    (id, sym). Encoding is the same wrapped-replace chain as training —
    a single narrow projection per merge, all JVM-side, so tokenizing
    100 TB is one scan with no shuffle before the caller's aggregation."""
    seq = F.concat(
        F.regexp_replace(F.col("_w"), "(.)", f"{SEP}$1{SEP}"),
        F.lit(f"{SEP}{EOW}{SEP}"),
    )
    out = (
        df.select(F.col(id_col), F.explode(X.tokens(F.col(text_col))).alias("_w"))
        .filter(F.col("_w") != "")
        .select(id_col, seq.alias("seq"))
    )
    for l, r in merges:
        out = out.withColumn("seq", merge_expr(l, r))
    syms = F.split(F.expr("substring(seq, 2, length(seq) - 2)"), SEP + SEP)
    return out.select(id_col, F.explode(syms).alias("sym"))
