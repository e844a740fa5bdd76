"""Deterministic stratified sampling for training-data pipelines.

Down-sampling over-represented strata (languages, domains, sources) is
a standard corpus-curation step. Doing it with `rand()` is wrong at
scale twice over: the sample is not reproducible across retries /
resumed partitions (breaking checkpoint idempotency — a re-run of a
failed partition would keep DIFFERENT rows), and it cannot be replayed
by an external verifier.

Instead each row's fate is a pure function of its key: a 32-bit slice
of md5(key) taken modulo 10_000 yields a near-uniform bucket in
[0, 10000) — 32 bits, not 16: 2^16 % 10000 = 5536 leaves low buckets
with 7/65536 mass vs 6/65536, a +6.8% relative bias on every rate
<= 0.5536; at 32 bits the residual bias is 1 part in ~4.3e5. The row
survives iff bucket < rate·10000. Deterministic, independent of
partitioning and row order, stable under resume, and replayable in
any engine with md5 (DuckDB: ('0x' || substr(md5(k), 1, 8))::BIGINT %
10000). NULL keys hash via coalesce-to-'' — all NULL-key rows share
one fixed bucket rather than being silently dropped. Per-stratum
rates compile to ONE native CASE expression — no shuffle, no UDF; the
filter runs inside the scan's codegen stage and combines with
predicate pushdown on the stratum column.
"""

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, functions as F

BUCKETS = 10_000


def hash_bucket(key_col: str) -> Column:
    """Near-uniform deterministic bucket in [0, 10000) from the shared
    md5-slice kernel (functions/hashing; see module docstring for the
    bias arithmetic). NULL keys coalesce to '' — one shared,
    deterministic bucket."""
    from .hashing import md5_mod
    key = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    return md5_mod(key, BUCKETS)


def stratified_sample(df: DataFrame, strata_col: str, key_col: str,
                      rates: Dict[str, float],
                      default_rate: float = 1.0,
                      bucket_alias: Optional[str] = None) -> DataFrame:
    """Keep each row of stratum s with probability rates[s] (exact,
    deterministic in ``key_col``). Strata absent from ``rates`` use
    ``default_rate``. ``bucket_alias`` additionally exposes the bucket
    column (useful for audits / the correctness oracle)."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} out of [0,1]: {r}")
    thr = F.lit(int(round(default_rate * BUCKETS)))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == s,
                     F.lit(int(round(r * BUCKETS)))).otherwise(thr)
    out = df.where(hash_bucket(key_col) < thr)
    if bucket_alias:
        out = out.withColumn(bucket_alias, hash_bucket(key_col))
    return out


def quantile_cut(df: DataFrame, strata_col: str, score_col: str,
                 keep_frac: float, tiebreak_col: str,
                 ascending: bool = False) -> DataFrame:
    """Keep the best ``keep_frac`` of each stratum by ``score_col``
    (descending by default — 'top 40% by quality score per language',
    the standard perplexity/quality percentile cut). percent_rank over
    a (stratum)-partitioned window; ``tiebreak_col`` (a unique key)
    makes the ordering total, so the cut is deterministic and
    engine-replayable — never rand()-sampled.

    One shuffle on the stratum column. Skewed strata (one language
    owning most of the corpus) should pre-pass salted_repartition or
    rely on AQE; the window itself cannot salt (rank is global per
    stratum by definition) — at 1e12 docs use ``quantile_cut_approx``,
    which replaces the rank window with a per-stratum approx_percentile
    sketch threshold: a map-side-combined aggregate (bytes per
    stratum, immune to stratum skew) broadcast back as a filter. The
    cut then lands within the sketch's rank error of keep_frac rather
    than exactly on it, score TIES at the threshold are all kept (no
    tiebreak ordering exists without the window), and NULL strata are
    DROPPED by its inner join (here they form their own window
    partition and are kept per keep_frac) — filter NULL strata first
    if the two renderings must agree.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac out of (0,1]: {keep_frac}")
    from pyspark.sql import Window
    order = [F.asc(score_col) if ascending else F.desc(score_col),
             F.asc(tiebreak_col)]
    w = Window.partitionBy(strata_col).orderBy(*order)
    return (df.withColumn("_pr", F.percent_rank().over(w))
              .where(F.col("_pr") <= F.lit(keep_frac))
              .drop("_pr"))


def quantile_cut_approx(df: DataFrame, strata_col: str, score_col: str,
                        keep_frac: float, ascending: bool = False,
                        accuracy: int = 10_000) -> DataFrame:
    """Sketch-threshold rendering of quantile_cut for skew-proof scale
    (see quantile_cut docstring). Deterministic: Spark's
    approx_percentile sketch (Greenwald-Khanna) is a deterministic
    function of the input multiset at fixed accuracy."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac out of (0,1]: {keep_frac}")
    q = keep_frac if ascending else 1.0 - keep_frac
    thr = (df.groupBy(strata_col)
             .agg(F.percentile_approx(score_col, q, accuracy)
                  .alias("_thr")))
    keep = (F.col(score_col) <= F.col("_thr") if ascending
            else F.col(score_col) >= F.col("_thr"))
    return (df.join(F.broadcast(thr), strata_col)
              .where(keep)
              .drop("_thr"))


def per_key_cap(df: DataFrame, key_col: str, cap: int,
                order_col: str) -> DataFrame:
    """At most ``cap`` rows per key, chosen deterministically by
    ``order_col`` (e.g. md5-bucket order for an unbiased pick, or a
    quality score for a biased one) — the 'max N pages per domain'
    crawl-curation rule. row_number over a per-key window; same skew
    caveat as quantile_cut."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1: {cap}")
    from pyspark.sql import Window
    w = Window.partitionBy(key_col).orderBy(F.asc(order_col))
    return (df.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= cap)
              .drop("_rn"))


def mixture_sample(df: DataFrame, strata_col: str, key_col: str,
                   shares: dict, budget: int) -> DataFrame:
    """Assemble a fixed-budget corpus with target per-stratum
    proportions — the dataset-MIXING step (Pile/Dolma-style source
    weighting) that follows quality filtering: for each stratum s in
    ``shares``, take the floor(shares[s]·budget) rows with the
    smallest md5(key) — a deterministic uniform-without-replacement
    pick, resume-stable and engine-replayable like every sampler in
    this module. Strata not in ``shares`` are dropped; an
    under-populated stratum contributes ALL its rows (the shortfall is
    visible in the output counts — no silent reflow to other strata,
    which would change the mixture semantics).

    One per-stratum window (row_number over md5 order, key tiebreak)
    + a literal CASE quota — no joins, one shuffle on the stratum key.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1: {budget}")
    if not shares:
        raise ValueError("shares must be non-empty")
    from pyspark.sql import Window
    quota = None
    for s, share in shares.items():
        q = int(share * budget)
        cond = F.col(strata_col) == s
        quota = (F.when(cond, q) if quota is None
                 else quota.when(cond, q))
    quota = quota.otherwise(F.lit(0))
    h = F.md5(F.coalesce(F.col(key_col).cast("string"), F.lit("")))
    w = (Window.partitionBy(strata_col)
               .orderBy(F.asc(h), F.asc(key_col)))
    return (df.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= quota)
              .drop("_rn"))


def weighted_sample(df: DataFrame, key_col: str,
                    weight_col: str) -> DataFrame:
    """Importance sampling: keep each row with probability equal to
    its weight in [0,1] (quality-weighted corpus downsampling — keep
    high-quality docs with certainty, junk proportionally). The
    acceptance draw is the shared md5 kernel scaled to [0,1)
    (functions/hashing), so the decision is a pure function of the
    key: deterministic, resume-stable, partitioning-independent, and
    engine-replayable — `u < w` replays as
    ``(md5-slice % 10000)/10000.0 < w`` on any engine. Weights are
    clamped to [0,1]; granularity is 1/10000 (same bucket arithmetic
    + bias note as stratified_sample)."""
    u = hash_bucket(key_col) / F.lit(float(BUCKETS))
    w = F.least(F.greatest(F.col(weight_col).cast("double"),
                           F.lit(0.0)), F.lit(1.0))
    return df.where(u < w)
