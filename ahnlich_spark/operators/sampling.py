"""Deterministic corpus sampling and sequence packing.

Training-data pipelines downsample and re-mix corpora constantly; doing
it with ``rand()`` makes every run irreproducible and every retry a
different dataset. These operators derive the keep/assign decision from
a stable hash of the row id, so the sample is a pure function of
(id, salt, rate) — reproducible across runs, engines and cluster sizes.

Reference parity: sampling/packing is part of this repo's
training-data-pipeline extension surface (the reference engine,
deven96/ahnlich, stops at store/query primitives).

Scale notes (100 TB):
- ``hash_sample`` / ``stratified_sample`` are narrow scan-local filters
  (md5 + modulo on projected columns) — no shuffle, no UDF; Catalyst
  pushes the surviving-column projection to the parquet scan and the
  filter runs inside WholeStageCodegen.
- ``pack_sequences`` is one shuffle (window partitioned by the pack
  key); each partition's packing is independent, so skew is bounded by
  the largest single key — pick a pack key with cluster-sized groups
  (source/shard/date), not a global ordering.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60 bits of md5 (15 hex chars) — portable: Spark conv(,16,10) == DuckDB
# ('0x'||...)::BIGINT. Same derivation as text.minhash_base_hash.
_SCALE = 1_000_000


def _hash_unit(col: Column, salt: str) -> Column:
    """Deterministic value in [0, _SCALE) from (salt, id)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return h % _SCALE


def hash_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows: row survives iff
    md5(salt || id) mod 1e6 < rate * 1e6. Changing ``salt`` draws an
    independent sample; the same (salt, rate) always returns the same
    rows, and a rate increase strictly grows the sample (nested
    samples — handy for scaling-law subsets)."""
    return df.filter(_hash_unit(F.col(id_col), salt) < int(round(rate * _SCALE)))


def train_test_split(
    df: DataFrame,
    test_rate: float = 0.05,
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic held-out split: every row gets a ``split`` column
    ('test' iff md5(salt || id) mod 1e6 < test_rate * 1e6, else
    'train'). Disjoint and exhaustive by construction; the SAME (salt,
    test_rate) always yields the same split on any cluster, and growing
    ``test_rate`` only MOVES rows train -> test (nested splits — a 5%
    test set is a subset of the 10% one). Scan-local, zero shuffle —
    the split of 100 TB costs one pass."""
    thr = int(round(test_rate * _SCALE))
    return df.withColumn(
        split_col,
        F.when(_hash_unit(F.col(id_col), salt) < thr, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_sample(
    df: DataFrame,
    rates: Dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (corpus re-mixing: e.g. keep
    100% of wiki, 10% of crawl). ``rates`` maps stratum value -> keep
    rate; unlisted strata fall back to ``default_rate``. The threshold
    map is a literal CASE expression — scan-local, no join."""
    thr: Column = F.lit(int(round(default_rate * _SCALE)))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(round(rate * _SCALE)))
        ).otherwise(thr)
    return df.filter(_hash_unit(F.col(id_col), salt) < thr)


def weighted_hash_sample(
    df: DataFrame,
    rate_e6: Column,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-row deterministic Bernoulli keep with row-specific
    probability ``rate_e6 / 1e6`` (quality-proportional resampling: keep
    high-quality docs with certainty, downsample junk): row survives iff
    md5(salt || id) mod 1e6 < rate_e6. Pure integers, scan-local, no
    shuffle; the same (salt, id) draws ONE uniform shared by every
    weighting, so raising a row's rate can only ADD it (monotone, like
    the nested fixed-rate samples)."""
    return df.filter(_hash_unit(F.col(id_col), salt) < rate_e6)


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    pack_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget training batches by
    prefix-sum chunking: within each ``pack_col`` group, docs are laid
    out in ``id_col`` order and a doc starts a new batch exactly when
    the tokens before it have crossed a multiple of ``budget`` —
    ``batch_id = floor((cumsum(tokens) - tokens) / budget)``.

    Batch boundaries sit at budget multiples of the group's token
    prefix sum, so when no document exceeds the budget every batch
    total lies within budget +/- (max_doc_tokens - 1) — documents are
    never split, batches never drift from the budget. The assignment is
    deterministic and packing is embarrassingly parallel across pack
    groups: one shuffle, no iteration.

    Output: (id, pack group, batch_id, seq_in_batch, token count).
    """
    w = Window.partitionBy(pack_col).orderBy(id_col)
    tok = F.col(token_col).cast("long")
    before = F.sum(tok).over(w) - tok
    out = df.select(
        F.col(id_col),
        F.col(pack_col),
        tok.alias("n_tok"),
        F.floor(before / F.lit(budget)).alias("batch_id"),
    )
    w2 = Window.partitionBy(pack_col, "batch_id").orderBy(id_col)
    return out.withColumn("seq_in_batch", F.row_number().over(w2))


def exact_ntile(
    df: DataFrame,
    n_tiles: int,
    value_col: str,
    id_col: str,
    out_col: str = "tile",
    group_cols=None,
) -> DataFrame:
    """Exact SQL NTILE over the total order (value, id) WITHOUT a
    global sort — the quality-binning / curriculum-mixing primitive
    (bin a corpus into quality deciles, then re-mix per bin). With
    ``group_cols`` the tiling is per group, exactly
    ``NTILE(n) OVER (PARTITION BY group ORDER BY value, id)`` — the
    per-language quality-threshold shape, where a window formulation
    would put EACH WHOLE GROUP through one task (English = half the
    corpus = half the corpus in one sort).

    A window-NTILE serializes the whole table (or group) through one
    partition; at corpus scale that is the job's wall clock. This
    formulation is distributed end-to-end for BOUNDED-cardinality
    values (integer quality scores, e4-scaled ratios — the scores
    pipelines actually bin on):

    1. per-(group, value) counts (one map-side-combined shuffle,
       <= cardinality rows), cumulative-smaller + group total via
       windows over that TINY table;
    2. rank(row) = cum_smaller(value) + row_number within its value
       (a window partitioned BY (group, VALUE) — distributed);
    3. tile from rank with the standard NTILE base/remainder rule —
       pure integer arithmetic (ceil via (a+b-1) div b), scan-local.

    Ties split by ``id_col`` order. NULL values rank first (Spark's ASC
    NULLS FIRST window order) and are kept — the count, the cumulative
    table, and the join all treat NULL as one ordinary (lowest) value,
    so no row vanishes and tile sizes stay exact.

    The input is evaluated twice (per-value counts, the ranked join),
    so it is lazily localCheckpoint'd first: expression-heavy inputs
    (tokenized quality scores) pay their scan once and the re-read hits
    the materialized blocks — at sf0.1 this cut the quality-decile
    gate ~3x."""
    group_cols = list(group_cols or [])
    df = df.localCheckpoint(eager=False)
    gc = [F.col(c) for c in group_cols]
    counts = df.groupBy(*gc, value_col).count()
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy(*group_cols)
    cum = counts.select(
        *[F.col(c).alias(f"_ntile_g_{c}") for c in group_cols],
        F.col(value_col).alias("_ntile_val"),
        F.coalesce(F.sum("count").over(wcum), F.lit(0)).alias("_cum"),
        F.sum("count").over(wtot).alias("_n"),
    )
    wv = Window.partitionBy(*group_cols, value_col).orderBy(id_col)
    # eqNullSafe throughout: a NULL value (or NULL group key) must still
    # find its cumulative row — a plain equi-join would silently drop
    # those rows while _n counted them, skewing every tile boundary.
    cond = F.col(value_col).eqNullSafe(F.col("_ntile_val"))
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_ntile_g_{c}"))
    ranked = (
        df.join(F.broadcast(cum), cond)
        .drop("_ntile_val", *[f"_ntile_g_{c}" for c in group_cols])
        .withColumn("_rank", F.col("_cum") + F.row_number().over(wv))
    )

    def _idiv(a, b):
        return F.call_function("div", a, b)

    base = _idiv(F.col("_n"), F.lit(int(n_tiles)))
    rem = F.col("_n") % n_tiles
    big = rem * (base + 1)
    r = F.col("_rank")
    tile = F.when(base == 0, r).otherwise(  # fewer rows than tiles
        F.when(r <= big, _idiv(r + base, base + 1)).otherwise(
            rem + _idiv(r - big + base - 1, base)
        )
    )
    return ranked.withColumn(out_col, tile.cast("long")).drop("_cum", "_rank", "_n")


def rebalance_to_mixture(
    df: DataFrame,
    weights: dict,
    group_col: str = "source",
    weight_col: Optional[str] = None,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Downsample a corpus to TARGET mixture shares — the consumer of
    the `corpus_mixture` report: given integer target parts per group
    (e.g. {web: 5, code: 3, wiki: 2}), keep a deterministic hash-sample
    of each group sized so the kept groups' expected weight shares are
    proportional to the targets. Groups absent from ``weights`` are
    dropped; no group is ever UPsampled — the binding group (the one
    whose availability runs out first relative to its target) is kept
    whole and every other group is thinned to match it.

    All rate math is integer-exact and cluster-invariant: with
    W = sum(weights), a_g = available weight of group g (row count, or
    ``weight_col`` summed — e.g. token counts for token-share targets),

        T        = min_g floor(a_g * W / w_g)        (achievable total)
        thr_g    = 10^6 for binding groups (those attaining T — kept
                   whole by construction, not merely up to the floor
                   division's remainder), else
                   floor(T * w_g * 10^6 / (W * a_g))

    and a row survives iff md5(salt || id) mod 10^6 < thr_g — the same
    nested-sample hash unit as ``hash_sample``, so rebalanced corpora
    are reproducible on any cluster and across engines (the gate's
    DuckDB oracle re-derives the identical thresholds in HUGEINT).

    Scale shape: ONE tiny aggregation (len(weights) rows) plans the
    thresholds; the filter itself is scan-local (a literal-map lookup +
    hash compare, no shuffle, no join). Realized shares fluctuate
    around the target with hash-sampling variance O(1/sqrt(rows)) per
    group — at corpus scale that is the noise floor, and determinism is
    what the downstream run needs."""
    if not weights:
        raise ValueError("weights must name at least one group")
    if any(int(w) <= 0 for w in weights.values()):
        raise ValueError("target weights must be positive integers")
    wsum = sum(int(w) for w in weights.values())
    wt = F.lit(1) if weight_col is None else F.col(weight_col)
    avail = {
        r["g"]: int(r["a"])
        for r in df.filter(F.col(group_col).isin(list(weights)))
        .select(F.col(group_col).alias("g"), wt.cast("long").alias("a"))
        .groupBy("g")
        .agg(F.sum("a").alias("a"))
        .collect()
    }
    empty = sorted(set(weights) - set(avail))
    if empty:
        raise ValueError(
            f"target groups with no available data: {empty} — a mixture "
            "containing them is unachievable without upsampling"
        )
    thr = mixture_thresholds(avail, weights)
    lookup = F.create_map(
        *[F.lit(x) for pair in thr.items() for x in pair]
    )[F.col(group_col)]
    return df.filter(_hash_unit(F.col(id_col), salt) < lookup)


def mixture_thresholds(avail: dict, weights: dict) -> dict:
    """Per-group keep thresholds (units of 1/_SCALE) for
    ``rebalance_to_mixture``: T = min_g floor(a_g*W/w_g) is the
    achievable total; a BINDING group (one attaining that min) gets
    threshold _SCALE exactly — kept whole by contract, not merely up to
    the floor division's remainder — and every other group gets
    floor(T*w_g*_SCALE / (W*a_g)), which is strictly below _SCALE.
    Pure integer function shared with the gate oracle's HUGEINT
    arithmetic and unit-tested directly on non-divisible cases."""
    wsum = sum(int(w) for w in weights.values())
    total = min(avail[g] * wsum // int(w) for g, w in weights.items())
    return {
        g: (
            _SCALE
            if avail[g] * wsum // int(w) == total
            else (total * int(w) * _SCALE) // (wsum * avail[g])
        )
        for g, w in weights.items()
    }


def epoch_factors(avail: dict, weights: dict, total: int,
                  max_epochs: int) -> dict:
    """Per-group (n_full, frac_thr) repeat plan for
    ``upsample_to_mixture``: the ideal repeat factor is
    f_g = total * w_g / (W * a_g) — how many epochs of group g hit its
    target share of ``total`` — clamped to ``max_epochs``. Emitted as
    integers: ``n_full`` whole copies per row plus one extra copy for
    rows whose hash unit falls below ``frac_thr`` (units of 1/_SCALE).
    A clamped group's frac_thr is 0 (exactly max_epochs copies);
    f_g < 1 degenerates to a plain downsample (n_full = 0). Pure
    integer function shared with the gate oracle's arithmetic."""
    wsum = sum(int(w) for w in weights.values())
    out = {}
    for g, w in weights.items():
        num, den = int(total) * int(w), wsum * int(avail[g])
        n_full = num // den
        if n_full >= max_epochs:
            out[g] = (max_epochs, 0)
        else:
            out[g] = (n_full, num * _SCALE // den - n_full * _SCALE)
    return out


def integer_root(x: int, q: int) -> int:
    """floor(x ** (1/q)) in EXACT integer arithmetic (Newton on ints —
    no float crosses the computation), so temperature weights are
    bit-identical on any host and reproducible by an oracle that
    corrects a double estimate with integer comparisons."""
    if x < 0 or q < 1:
        raise ValueError("integer_root needs x >= 0, q >= 1")
    if x in (0, 1) or q == 1:
        return x
    r = 1 << ((x.bit_length() + q - 1) // q)  # upper-bound seed
    while True:
        nr = ((q - 1) * r + x // r ** (q - 1)) // q
        if nr >= r:
            return r
        r = nr


def temperature_weights(avail: dict, alpha=(1, 2),
                        scale: int = 1000) -> dict:
    """TEMPERATURE-sampling weights w_g = floor(a_g^(p/q) * scale) —
    the T5/mT5 mixture recipe (probability ∝ availability^alpha,
    alpha = p/q in (0, 1]): alpha=1 reproduces natural proportions,
    alpha -> 0 flattens toward uniform, and the usual 0.3-0.7 range
    boosts scarce sources without letting a huge one drown the mix.
    Computed as integer_root(a^p * scale^q, q) — pure integers, so the
    weights (and everything the mixture plans from them) are
    cross-engine exact; a group's weight floors at 1 so no available
    source silently vanishes. Keep a^p * scale^q within the oracle
    engine's HUGEINT (~1.7e38) when choosing scale/alpha."""
    p, q = int(alpha[0]), int(alpha[1])
    if not 0 < p <= q:
        raise ValueError(f"alpha {p}/{q} must satisfy 0 < p/q <= 1")
    return {
        g: max(integer_root(int(a) ** p * scale ** q, q), 1)
        for g, a in avail.items()
    }


def temperature_mixture(
    df: DataFrame,
    alpha=(1, 2),
    total: Optional[int] = None,
    max_epochs: int = 4,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "tempmix",
) -> DataFrame:
    """Resample a corpus to TEMPERATURE-flattened source shares with
    repetition: one tiny aggregation reads per-group availability, the
    target weights are a_g^alpha (``temperature_weights``), and the
    epoch plan + scan-local emission are ``upsample_to_mixture``'s —
    scarce sources repeat up to ``max_epochs`` epochs toward their
    flattened share, abundant ones thin, everything integer-exact and
    shuffle-free after the planning agg. This is the standard LM
    data-mixture knob (T5 alpha=1/2, mT5 alpha=0.3) expressed over the
    engine's deterministic hash-unit machinery."""
    avail = {
        r["g"]: int(r["a"])
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("a")).collect()
    }
    if not avail:
        raise ValueError("empty corpus: nothing to resample")
    weights = temperature_weights(avail, alpha=alpha)
    return upsample_to_mixture(
        df, weights, total=total, max_epochs=max_epochs,
        group_col=group_col, id_col=id_col, salt=salt,
    )


def upsample_to_mixture(
    df: DataFrame,
    weights: dict,
    total: Optional[int] = None,
    max_epochs: int = 4,
    group_col: str = "source",
    weight_col: Optional[str] = None,
    id_col: str = "doc_id",
    salt: str = "epochmix",
) -> DataFrame:
    """Resample a corpus to target mixture shares WITH REPETITION — the
    upsampling complement of ``rebalance_to_mixture`` and the shape
    real LM data mixtures use (a scarce high-quality source repeats for
    several epochs while an abundant one is thinned). Each surviving
    row is emitted ``n_full`` times plus once more iff
    md5(salt || id) mod _SCALE < frac_thr (``epoch_factors``), with an
    0-based ``epoch`` column distinguishing copies; ``max_epochs`` caps
    repetition (a clamped group undershoots its share — the documented
    trade real pipelines make rather than looping a tiny source
    forever). ``total`` defaults to the target groups' available weight
    (reshape at constant size); groups absent from ``weights`` drop.

    Everything is integer-exact and cluster-invariant: one tiny
    aggregation (len(weights) rows) plans the factors, then emission is
    SCAN-LOCAL — a literal-map lookup, one hash compare, and a bounded
    sequence-explode; no shuffle, no join, reproducible on any cluster
    and across engines (the gate's DuckDB oracle re-derives the
    identical plan)."""
    if not weights:
        raise ValueError("weights must name at least one group")
    if any(int(w) <= 0 for w in weights.values()):
        raise ValueError("target weights must be positive integers")
    if max_epochs < 1:
        raise ValueError("max_epochs must be >= 1")
    wt = F.lit(1) if weight_col is None else F.col(weight_col)
    avail = {
        r["g"]: int(r["a"])
        for r in df.filter(F.col(group_col).isin(list(weights)))
        .select(F.col(group_col).alias("g"), wt.cast("long").alias("a"))
        .groupBy("g")
        .agg(F.sum("a").alias("a"))
        .collect()
    }
    empty = sorted(set(weights) - set(avail))
    if empty:
        raise ValueError(
            f"target groups with no available data: {empty} — no number "
            "of epochs of nothing reaches a share"
        )
    if total is None:
        total = sum(avail.values())
    factors = epoch_factors(avail, weights, int(total), max_epochs)
    nf = F.create_map(
        *[F.lit(x) for g, (n, _) in factors.items() for x in (g, n)]
    )[F.col(group_col)]
    thr = F.create_map(
        *[F.lit(x) for g, (_, t) in factors.items() for x in (g, t)]
    )[F.col(group_col)]
    copies = nf + (_hash_unit(F.col(id_col), salt) < thr).cast("int")
    return (
        df.filter(F.col(group_col).isin(list(weights)))
        .withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .select(
            *df.columns,
            F.explode(
                F.sequence(F.lit(0), F.col("_copies") - F.lit(1))
            ).alias("epoch"),
        )
    )
