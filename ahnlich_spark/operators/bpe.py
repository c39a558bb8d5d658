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
- Below ``DRIVER_VOCAB_BOUND`` distinct words the vocabulary is
  collected ONCE and the merge loop runs driver-side (indexed
  incremental pair counts + a lazy-invalidation heap) — O(1) Spark
  jobs regardless of n_merges. One job per merge round does not
  survive a realistic 16k-32k-merge vocabulary (tens of thousands of
  sequential jobs is a driver wall-clock scale-killer even when each
  job is tiny); the vocab itself is Heaps-law-small (a 100 TB corpus'
  distinct-word table is tens of MB), so the collect is the cheap
  part. Both paths implement the identical argmax contract
  (count desc, then (left, right) UTF-8 binary ascending — Python
  code-point order equals UTF-8 byte order by construction) and are
  hypothesis-pinned bit-identical.
- Above the bound, each round is one tiny job over the vocab: pair
  counts with map-side partial aggregation, then an ORDER BY count
  DESC, left, right LIMIT 1 argmax (the deterministic tie rule). The
  chosen pair is the only thing that returns to the driver. Vocab
  state is localCheckpoint'd per round so round r+1 never replays
  rounds 1..r.

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

# vocab sizes at or below this train driver-side in O(1) Spark jobs;
# 2M rows of (short word, count) is tens of MB at the driver — far
# below any executor partition budget, and Heaps' law keeps real
# corpora under it (English web text plateaus around 10^6-10^7 forms;
# raise the bound or pass max_vocab for pathological token soups)
DRIVER_VOCAB_BOUND = 2_000_000


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


def _train_merges_driver(
    word_syms: List[List[str]], counts: List[int], n_merges: int
) -> List[Tuple[int, str, str, int]]:
    """The Sennrich merge loop on a collected vocabulary: indexed
    incremental pair counts (only words containing the chosen pair are
    re-segmented per round) plus a lazy-invalidation heap for the
    argmax, so n_merges rounds cost O(touched words), not
    O(vocab x n_merges). Heap entries are (-count, left, right): tuple
    order gives count desc then (left, right) code-point ascending —
    identical to the Spark path's ORDER BY count DESC, left, right in
    UTF-8 binary order, because UTF-8 preserves code-point order."""
    import heapq
    from collections import Counter, defaultdict

    pair_cnt: Counter = Counter()
    where = defaultdict(set)  # pair -> word idx (may go stale; re-checked)
    for wi, syms in enumerate(word_syms):
        c = counts[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_cnt[p] += c
            where[p].add(wi)
    heap = [(-c, p[0], p[1]) for p, c in pair_cnt.items()]
    heapq.heapify(heap)
    merges: List[Tuple[int, str, str, int]] = []
    rank = 1
    while rank <= n_merges and heap:
        negc, l, r = heapq.heappop(heap)
        if pair_cnt.get((l, r), 0) != -negc or negc == 0:
            continue  # stale entry: the pair's count moved since push
        merges.append((rank, l, r, -negc))
        rank += 1
        touched: Counter = Counter()
        for wi in where.pop((l, r), ()):
            syms = word_syms[wi]
            out, i, hit = [], 0, False
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                    hit = True
                else:
                    out.append(syms[i])
                    i += 1
            if not hit:
                continue  # stale index entry
            c = counts[wi]
            for i in range(len(syms) - 1):
                touched[(syms[i], syms[i + 1])] -= c
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                touched[p] += c
                where[p].add(wi)
            word_syms[wi] = out
        for p, d in touched.items():
            if d:
                pair_cnt[p] += d
                heapq.heappush(heap, (-pair_cnt[p], p[0], p[1]))
    return merges


def train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    max_vocab: Optional[int] = None,
    driver_vocab_bound: Optional[int] = DRIVER_VOCAB_BOUND,
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merges. Returns (merge_rank,
    left_sym, right_sym, pair_count) in training order; ties on count
    break by (left_sym, right_sym) binary order, so training is
    deterministic across partitionings, runs, and engines.

    Vocabularies at or below ``driver_vocab_bound`` distinct words
    train driver-side in O(1) Spark jobs (see module docstring);
    larger ones fall back to one tiny vocab-table job per round. Both
    paths are bit-identical (hypothesis-pinned). Pass
    ``driver_vocab_bound=0``/``None`` to force the per-round path."""
    spark = df.sparkSession
    vocab = word_vocab(df, text_col, max_vocab).localCheckpoint()
    schema = (
        "merge_rank long, left_sym string, right_sym string, pair_count long"
    )
    if driver_vocab_bound and vocab.count() <= driver_vocab_bound:
        rows = vocab.collect()
        merges = _train_merges_driver(
            [r["seq"][1:-1].split(SEP + SEP) for r in rows],
            [int(r["cnt"]) for r in rows],
            n_merges,
        )
        return spark.createDataFrame(merges, schema)
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
    return spark.createDataFrame(merges, schema)


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
