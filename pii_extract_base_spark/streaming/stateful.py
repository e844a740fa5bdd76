"""Custom stateful streaming operators (SURVEY §2.4 streaming row:
watermark / session / state).

Two operators a streaming training-data intake needs beyond windowed
aggregation (both bounded-state by watermark):

 - streaming_exact_dedup: drop re-crawled duplicate pages across
   micro-batches via dropDuplicatesWithinWatermark on the content
   fingerprint — state holds one fingerprint per doc within the
   watermark horizon, so it is bounded regardless of stream length.
 - sessionize_events: session windows per user with a gap timeout,
   implemented with applyInPandasWithState (GroupState) — the
   canonical custom-stateful-operator shape (per-group state carries
   the open session; the watermark expires idle groups through state
   timeouts).

Both compose with the quality stages in quality_stream.py.
"""

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import (GroupState,
                                         GroupStateTimeout)
from pyspark.sql.types import (LongType, StructField, StructType,
                               StringType, TimestampType)


def streaming_exact_dedup(pages: DataFrame,
                          text_col: str = "text",
                          ts_col: str = "warc_ts",
                          watermark: str = "30 minutes") -> DataFrame:
    """Exact-duplicate suppression over a stream: keep the first page
    per md5(text) fingerprint within the watermark horizon.

    dropDuplicatesWithinWatermark (not plain dropDuplicates) bounds the
    dedup state: fingerprints older than the watermark are evicted, so
    at 100 TB/day ingest the state is (rate x horizon) keys, not the
    full corpus. A second-level batch dedup (operators/dedup.py) runs
    downstream for the full-corpus guarantee.
    """
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    return (pages
            .withColumn("_fp", fp)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_fp"])
            .drop("_fp"))


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("start_ms", LongType()),
    StructField("last_ms", LongType()),
    StructField("n", LongType()),
])


def _session_fn(key, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterable[pd.DataFrame]:
    """Per-user session accumulator: events extend the open session;
    a processing-time timeout (the stream's gap proxy) closes it."""
    gap_ms = 30 * 60 * 1000
    if state.hasTimedOut:
        (start_ms, last_ms, n) = state.get
        state.remove()
        yield pd.DataFrame({
            "user_id": [key[0]],
            "session_start": [pd.Timestamp(start_ms, unit="ms")],
            "session_end": [pd.Timestamp(last_ms, unit="ms")],
            "n_events": [n],
        })
        return

    start_ms = last_ms = None
    n = 0
    if state.exists:
        start_ms, last_ms, n = state.get
    closed = []
    for pdf in pdfs:
        for ts in sorted(pdf["ts"]):
            ms = int(pd.Timestamp(ts).value // 1_000_000)
            if last_ms is None:
                start_ms = last_ms = ms
                n = 1
            elif ms - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n))
                start_ms = last_ms = ms
                n = 1
            else:
                last_ms = ms
                n += 1
    state.update((start_ms, last_ms, n))
    state.setTimeoutDuration(gap_ms)
    if closed:
        yield pd.DataFrame({
            "user_id": [key[0]] * len(closed),
            "session_start": [pd.Timestamp(s, unit="ms")
                              for s, _, _ in closed],
            "session_end": [pd.Timestamp(e, unit="ms")
                            for _, e, _ in closed],
            "n_events": [c for _, _, c in closed],
        })


def sessionize_events(events: DataFrame) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState: emits a row
    per CLOSED session (gap > 30 min splits; idle state times out)."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_fn,
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
