"""Structured Streaming variant of the quality pipeline.

The north rule is a batch job (SURVEY.md §2.4: checkpoint/resume covers
recovery), but the same stage functions compose unchanged over
readStream — pandas UDFs and native rule expressions are
execution-mode agnostic. This module wires:

  file-source stream of pages parquet
    → QualityPipeline stages (same UDFs)
    → watermarked 1-minute windowed keep/entity counts
    → sink (memory/parquet), with checkpointLocation for exactly-once

Use trigger(availableNow=True) for deterministic drain-the-source runs
(how tests/test_streaming.py exercises it).
"""

from pyspark.sql import DataFrame, functions as F

from ..functions.quality import rules_struct_column
from ..functions.decision import decision_columns
from ..operators.detect import make_detect_udf
from ..operators.score import make_score_udf
from ..sources.pages import PAGES_SCHEMA


def stream_pages(spark, input_dir: str) -> DataFrame:
    return (spark.readStream
            .schema(PAGES_SCHEMA)
            .parquet(input_dir))


def apply_pipeline_stream(pages: DataFrame,
                          languages=("en", "es", "fr", "de")) -> DataFrame:
    """Same stages as pipeline.QualityPipeline, over a streaming DF."""
    score_udf = make_score_udf()
    detect_udf = make_detect_udf(tuple(languages))
    df = (pages
          .withColumn("score", score_udf(F.col("text")))
          .withColumn("rules", rules_struct_column("text", "lang"))
          .withColumn("detect", detect_udf(F.col("text"), F.col("lang"),
                                           F.col("url"))))
    keep, reasons = decision_columns("rules", "lang", "score")
    return (df.withColumn("keep", keep)
              .withColumn("reasons", reasons)
              .select("url", "warc_ts", "lang",
                      F.col("detect.n_entities").alias("n_entities"),
                      F.col("detect.scrubbed_text").alias("scrubbed_text"),
                      "keep"))


def windowed_keep_counts(scored: DataFrame,
                         watermark: str = "10 minutes",
                         window: str = "1 minute") -> DataFrame:
    """Watermarked tumbling-window aggregation (late rows beyond the
    watermark are dropped; state is bounded)."""
    return (scored
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), "lang", "keep")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_entities").alias("n_entities"))
            .select(F.col("w.start").alias("window_start"), "lang",
                    "keep", "n_docs", "n_entities"))


def run_stream(spark, input_dir: str, checkpoint_dir: str,
               query_name: str = "quality_stream"):
    """Drain all available input once (availableNow) into a memory sink.

    complete output mode: append would hold back windows newer than the
    watermark at drain time (they'd only flush on a later trigger);
    complete emits full state, which is what a drain-once run wants.
    """
    scored = apply_pipeline_stream(stream_pages(spark, input_dir))
    agg = windowed_keep_counts(scored)
    return (agg.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
