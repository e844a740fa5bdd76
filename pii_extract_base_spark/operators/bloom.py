"""Broadcast Bloom-filter pruning — the constant-memory membership
prefilter for huge-blocklist anti-joins (URL blocklists, seen-before
fingerprints, decontamination probes) at 100 TB.

Why not just semi-join?  A shuffle semi-join against a billion-key
blocklist moves the corpus; a Bloom filter compresses the blocklist to
a fixed bitset that BROADCASTS, so the membership test is a map-side
scan with zero shuffle, and only the (tiny) bloom-positive fraction
continues to the exact verify join.  This is the same role Spark's own
runtime-bloom-pruning (spark.sql.optimizer.runtime.bloomFilter.*)
plays inside joins; here it is an explicit, composable operator with a
DETERMINISTIC portable hash family (md5-slice), so the DuckDB oracle
replays the exact bitset and the exact false-positive set bit-for-bit.

Layout: ``n_bits`` bits stored as 32-bit words in BIGINTs (word =
pos // 32, bit = pos % 32) — word values stay below 2^32 so no
signed-overflow divergence between engines.  k hash probes per key:
h_i(key) = int(md5(i || '#' || key)[:8], 16) % n_bits.

False positives are inherent (rate ~ (1 - e^(-k*n/m))^k); callers
follow with an exact semi-join on the bloom-positive subset when
exactness is required — the filter's job is to shrink that join's
input by orders of magnitude.
"""

from typing import List

from pyspark.sql import Column, DataFrame, functions as F


def _probe(key: Column, i: int, n_bits: int) -> Column:
    """Position of hash probe i for a key (functions/hashing kernel)."""
    from ..functions.hashing import md5_mod
    return md5_mod(key, n_bits, salt=f"{i}#")


def bloom_build(df: DataFrame, key_col: str, n_bits: int = 4096,
                k: int = 3) -> DataFrame:
    """Aggregate a key column into a Bloom bitset: one row per 32-bit
    word that has any bit set — (word int, bits long).  One explode
    (k rows per key) + one hash aggregate on ≤ n_bits/32 groups; the
    result is a few KB regardless of blocklist size."""
    key = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    pos = (df.select(F.explode(F.array(
               *[_probe(key, i, n_bits) for i in range(k)])).alias("pos")))
    return (pos.select(F.floor(F.col("pos") / 32).cast("int").alias("word"),
                       F.expr("shiftleft(1L, cast(pos % 32 as int))")
                        .alias("bitval"))
               .groupBy("word")
               .agg(F.bit_or("bitval").alias("bits")))


def bloom_might_contain(df: DataFrame, bloom: DataFrame, key_col: str,
                        n_bits: int = 4096, k: int = 3,
                        out_col: str = "bloom_hit") -> DataFrame:
    """Adds ``out_col`` (boolean): all k probe bits set in the bloom.
    k broadcast LEFT joins on the word index — zero shuffle, the test
    is entirely map-side; a missing word row means bits=0."""
    out = df
    conds: List[Column] = []
    key = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    for i in range(k):
        b = bloom.select(F.col("word").alias(f"_w{i}"),
                         F.col("bits").alias(f"_b{i}"))
        out = out.withColumn(f"_p{i}", _probe(key, i, n_bits))
        out = out.join(
            F.broadcast(b),
            F.floor(F.col(f"_p{i}") / 32).cast("int") == F.col(f"_w{i}"),
            "left")
        bit = F.expr(f"shiftright(coalesce(_b{i}, 0L), "
                     f"cast(_p{i} % 32 as int))").bitwiseAND(F.lit(1))
        conds.append(bit == 1)
    hit = conds[0]
    for c in conds[1:]:
        hit = hit & c
    drop = [c for i in range(k) for c in (f"_p{i}", f"_w{i}", f"_b{i}")]
    return out.withColumn(out_col, hit).drop(*drop)


def bloom_prune_antijoin(df: DataFrame, blocklist: DataFrame,
                         key_col: str, block_key: str,
                         n_bits: int = 4096, k: int = 3) -> DataFrame:
    """EXACT anti-join accelerated by bloom pruning: rows whose key is
    definitely absent (bloom-negative) pass through with no join at
    all; only bloom-positive rows (true hits + the small FP fraction)
    take the exact anti-join.  Output == plain anti-join, cost ==
    bloom scan + anti-join on the positive sliver."""
    bloom = bloom_build(blocklist.select(F.col(block_key)), block_key,
                        n_bits, k)
    tagged = bloom_might_contain(df, bloom, key_col, n_bits, k)
    clean = tagged.where(~F.col("bloom_hit")).drop("bloom_hit")
    suspect = (tagged.where(F.col("bloom_hit")).drop("bloom_hit")
                     .join(blocklist.select(
                               F.col(block_key).alias(key_col)).distinct(),
                           key_col, "left_anti"))
    return clean.unionByName(suspect)
