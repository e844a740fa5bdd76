"""Bucketed managed tables: co-located joins without a shuffle.

At 100 TB the biggest repeated cost is re-shuffling fact tables on the
same join key for every query. Bucketing pre-shuffles ONCE at write
time: both sides of a join bucketed by the same key into the same
bucket count scan matching buckets directly — `.explain` shows a
SortMergeJoin with NO Exchange on either side (asserted in
tests/test_bucketed.py). This is Spark's native analogue of the
reference's build-once memoization, applied to data layout.

Scale guidance: pick n_buckets so a bucket of the LARGER table is
~128-512 MB (e.g. 100 TB lineitem-like facts → 262144 buckets);
include sortBy(key) so the merge join skips its sort entirely.
"""

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) by ``key``."""
    writer = (df.write.mode(mode).format("parquet")
                .bucketBy(n_buckets, key))
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str,
                   right_table: str, key: str,
                   how: str = "inner") -> DataFrame:
    """Join two same-key/same-bucket-count tables; with bucketing
    enabled (default) Catalyst plans the join with zero Exchange
    nodes. The MERGE hint pins SortMergeJoin — on small eval corpora
    Catalyst would otherwise broadcast one side, which hides the
    co-located layout this helper exists to exploit (at fact-x-fact
    scale SMJ is what it picks anyway)."""
    return (spark.table(left_table).hint("merge")
            .join(spark.table(right_table), key, how))


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
