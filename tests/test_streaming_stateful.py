"""Stateful streaming operators: bounded-state exact dedup
(dropDuplicatesWithinWatermark) and applyInPandasWithState
sessionization."""

import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_streaming_exact_dedup(spark, tmp_path):
    from pii_extract_base_spark.sources.pages import synth_pages
    from pii_extract_base_spark.streaming.quality_stream import stream_pages
    from pii_extract_base_spark.streaming.stateful import (
        streaming_exact_dedup)

    # input: every page duplicated (union with itself)
    pages = synth_pages(spark, SF_DIR).limit(50).cache()
    dup_dir = str(tmp_path / "in")
    pages.union(pages).write.parquet(dup_dir)

    stream = stream_pages(spark, dup_dir)
    deduped = streaming_exact_dedup(stream)
    q = (deduped.writeStream.format("memory").queryName("dedup_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    _drain(q)
    out = spark.sql("select * from dedup_t")
    n_unique = pages.select(F.md5("text")).distinct().count()
    assert out.count() == n_unique
    assert out.select("url").distinct().count() == n_unique


def test_sessionize_events_stateful(spark, tmp_path):
    from pii_extract_base_spark.streaming.stateful import (
        sessionize_events, SESSION_SCHEMA)

    rows = []
    base = 1_700_000_000  # seconds
    # user 7: two sessions (3 events, gap 2h, 2 events); user 8: one
    for dt in (0, 60, 120, 7800, 7860):
        rows.append((7, base + dt))
    for dt in (0, 300):
        rows.append((8, base + dt))
    in_dir = str(tmp_path / "ev")
    (spark.createDataFrame(rows, "user_id long, epoch long")
          .select("user_id", F.timestamp_seconds("epoch").alias("ts"))
          .write.parquet(in_dir))

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .parquet(in_dir))
    sessions = sessionize_events(stream)
    assert sessions.schema == SESSION_SCHEMA
    q = (sessions.writeStream.format("memory").queryName("sess_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    _drain(q)
    got = {(r.user_id, r.n_events)
           for r in spark.sql("select * from sess_t").collect()}
    # only CLOSED sessions are emitted in a single drain: user 7's
    # first session (3 events) closed when the 2h gap appeared; the
    # trailing sessions stay open in state
    assert got == {(7, 3)}
