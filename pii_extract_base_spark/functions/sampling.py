"""Deterministic stratified sampling for training-data pipelines.

Down-sampling over-represented strata (languages, domains, sources) is
a standard corpus-curation step. Doing it with `rand()` is wrong at
scale twice over: the sample is not reproducible across retries /
resumed partitions (breaking checkpoint idempotency — a re-run of a
failed partition would keep DIFFERENT rows), and it cannot be replayed
by an external verifier.

Instead each row's fate is a pure function of its key: a 16-bit slice
of md5(key) taken modulo 10_000 yields a uniform bucket in [0, 10000);
the row survives iff bucket < rate·10000. Deterministic, independent
of partitioning and row order, stable under resume, and replayable in
any engine with md5 (DuckDB: ('0x' || substr(md5(k), 1, 4))::BIGINT %
10000). Per-stratum rates compile to ONE native CASE expression — no
shuffle, no UDF; the filter runs inside the scan's codegen stage and
combines with predicate pushdown on the stratum column.
"""

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, functions as F

BUCKETS = 10_000


def hash_bucket(key_col: str) -> Column:
    """Uniform deterministic bucket in [0, 10000) from md5(key)."""
    h = F.md5(F.col(key_col).cast("string"))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % BUCKETS


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
