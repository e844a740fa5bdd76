"""Training-shard packing: assign ordered documents to fixed
token-budget shards (the "make N-token training files" step that
follows curation in an LLM data pipeline).

Semantics: docs are laid out in ``order_cols`` order and the shard id
is `floor(tokens_before_doc / budget)` — the parallel prefix-sum
binning used at scale (a doc spanning a budget boundary lands in the
shard its FIRST token falls in).  This is deliberately NOT the
sequential greedy rule ("close the shard when the next doc would
overflow"): greedy is inherently serial, prefix-binning is one scan,
and the only difference is that boundary docs may straddle (shards are
±1 doc around budget, which training-data sharding tolerates).

The prefix sum itself is the textbook two-phase distributed scan — NO
single-partition global window (the usual `Window.orderBy(id)` without
a partitionBy collapses 100 TB onto one task):

 1. range-repartition by the order key (equal keys co-located,
    partition i holds strictly smaller keys than partition i+1),
 2. per-partition local cumulative sums,
 3. per-partition totals (tiny: one row per partition) scanned on a
    single partition — thousands of rows, not documents,
 4. offsets broadcast-joined back and added to the local sums.

The result is invariant to where the range boundaries fall, so the
sampling inside repartitionByRange never changes the answer.
"""

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import token_count


def distributed_prefix_sum(df: DataFrame, val_col: str,
                           order_cols: Union[str, Sequence[str]],
                           out_col: str = "cum",
                           num_partitions: Optional[int] = None
                           ) -> DataFrame:
    """Adds ``out_col`` = inclusive cumulative sum of ``val_col`` over
    the total order defined by ``order_cols`` (must be unique keys).
    Two-phase scan: only per-partition windows plus one tiny
    (#partitions-row) global window."""
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    order_cols = list(order_cols)
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *order_cols)
    else:
        part = df.repartitionByRange(*order_cols)
    part = part.withColumn("_pid", F.spark_partition_id())
    # _pid MUST mean the same partition in both consumers below (the
    # local-cumsum window and the totals aggregate).  Normally Spark's
    # exchange reuse guarantees that by executing the range shuffle
    # once — but if reuse is defeated (spark.sql.exchange.reuse=false,
    # or a plan rewrite breaking canonical matching), each consumer
    # re-runs the shuffle and RangePartitioner re-SAMPLES boundaries
    # with a fresh RDD-id seed, so the two sides can disagree near
    # partition edges and corrupt the sums.  localCheckpoint pins one
    # materialization both consumers read (lazy: it materializes
    # inside the first job, not as an extra one).  On a multi-executor
    # cluster, executor loss invalidates local checkpoints — use a
    # bucketed/sorted input table (sources/bucketed.py) to get stable
    # partitioning without the checkpoint instead.
    part = part.localCheckpoint(eager=False)

    local_w = (Window.partitionBy("_pid").orderBy(*order_cols)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = part.withColumn("_local_cum", F.sum(val_col).over(local_w))

    # per-partition totals: one row per partition, scanned globally
    # (single-partition window over ~thousands of rows is fine)
    totals = part.groupBy("_pid").agg(F.sum(val_col).alias("_ptotal"))
    off_w = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_ptotal").over(off_w),
                   F.lit(0).cast("long")).alias("_offset"))

    return (local.join(F.broadcast(offsets), "_pid")
                 .withColumn(out_col,
                             F.col("_local_cum") + F.col("_offset"))
                 .drop("_pid", "_local_cum", "_offset"))


def token_budget_shards(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", budget: int = 100_000,
                        num_partitions: Optional[int] = None
                        ) -> DataFrame:
    """Per-doc shard assignment: (id, n_tokens, tokens_before, shard)
    with shard = floor(tokens_before / budget), docs ordered by id."""
    toks = df.select(F.col(id_col),
                     token_count(text_col).cast("long").alias("n_tokens"))
    cum = distributed_prefix_sum(toks, "n_tokens", id_col,
                                 out_col="_cum",
                                 num_partitions=num_partitions)
    return cum.select(
        id_col, "n_tokens",
        (F.col("_cum") - F.col("n_tokens")).alias("tokens_before"),
        F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(budget))
         .cast("long").alias("shard"))


def shard_manifest(assign: DataFrame, id_col: str = "doc_id"
                   ) -> DataFrame:
    """Shard-level rollup of a `token_budget_shards` assignment:
    (shard, n_docs, n_tokens, first_doc, last_doc)."""
    return (assign.groupBy("shard")
                  .agg(F.count("*").alias("n_docs"),
                       F.sum("n_tokens").alias("n_tokens"),
                       F.min(id_col).alias("first_doc"),
                       F.max(id_col).alias("last_doc")))
