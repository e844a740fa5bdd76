"""Count-min sketch: fixed-memory frequency estimation over unbounded
key sets (Cormode & Muthukrishnan, J. Algorithms 2005).

At 100 TB the exact token→count table is itself a big-data object; the
CMS compresses it to depth×width counters (a few KB) that (a) build in
ONE map-side-combinable aggregate pass, (b) broadcast for map-side
frequency lookups (heavy-hitter screens, per-token downweighting à la
word2vec subsampling), and (c) merge across partitions/streams by
plain addition — the property exact dictionaries lack.  Estimates
overcount only: est(x) >= true(x), with error <= 2N/width at
probability 1 - (1/2)^depth.

The hash family is the repo's portable md5-slice (row r probe =
int(md5(r || ':' || item)[:8], 16) % width) so a DuckDB oracle replays
the sketch — including its collision overcounts — bit-for-bit.
"""

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(item: Column, r: int, width: int) -> Column:
    from ..functions.hashing import md5_mod
    return md5_mod(item, width, salt=f"{r}:")


def cms_build(df: DataFrame, item_col: str, depth: int = 3,
              width: int = 1024,
              count_col: Optional[str] = None) -> DataFrame:
    """Sketch rows (row, bucket, c).  ``count_col`` feeds pre-counted
    items (weighted build — identical result to one row per
    occurrence, one aggregate cheaper).  depth×width output rows."""
    item = F.coalesce(F.col(item_col).cast("string"), F.lit(""))
    cnt = (F.col(count_col).cast("long") if count_col
           else F.lit(1).cast("long"))
    probes = F.array(*[
        F.struct(F.lit(r).cast("int").alias("row"),
                 _bucket(item, r, width).alias("bucket"))
        for r in range(depth)])
    return (df.select(cnt.alias("_c"), F.explode(probes).alias("p"))
              .groupBy(F.col("p.row").alias("row"),
                       F.col("p.bucket").alias("bucket"))
              .agg(F.sum("_c").alias("c")))


def cms_lookup(df: DataFrame, sketch: DataFrame, item_col: str,
               depth: int = 3, width: int = 1024,
               out_col: str = "cms_est") -> DataFrame:
    """Adds ``out_col`` = min over rows of the sketch counters at the
    item's probe positions.  The sketch broadcasts (depth×width rows);
    lookup is explode → broadcast join → min, keyed on the input's
    columns (which must uniquely identify rows)."""
    item = F.coalesce(F.col(item_col).cast("string"), F.lit(""))
    probes = F.array(*[
        F.struct(F.lit(r).cast("int").alias("row"),
                 _bucket(item, r, width).alias("bucket"))
        for r in range(depth)])
    keys = df.columns
    exploded = (df.withColumn("_p", F.explode(probes))
                  .select(*keys, F.col("_p.row").alias("_row"),
                          F.col("_p.bucket").alias("_bucket")))
    joined = exploded.join(
        F.broadcast(sketch),
        (F.col("_row") == F.col("row"))
        & (F.col("_bucket") == F.col("bucket")), "left")
    return (joined.groupBy(*keys)
                  .agg(F.min(F.coalesce(F.col("c"),
                                        F.lit(0).cast("long")))
                        .alias(out_col)))
