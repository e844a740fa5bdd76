"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the LATEST right row whose timestamp is
at-or-before the left timestamp within the same key group (the
standard attribution / slowly-changing-dimension lookup; DuckDB and
kdb expose it as ASOF JOIN, which is exactly how the driver oracle
replays it).

Spark rendering (composition of built-ins, SURVEY.md custom-operator
rule (a)): tag and UNION the two streams, ONE shuffle on the key +
ONE sort on (ts, side), then `last(ignorenulls)` over an unbounded-
preceding row frame forward-fills each left row with the most recent
right payload. This is the sort-merge ASOF plan — no per-row range
probe, no range cross-join, no window self-join; cost is one shuffle
of (|L| + |R|) narrow rows regardless of time-range density, which is
the shape that survives 100 TB (a naive `L JOIN R ON l.key = r.key
AND r.ts <= l.ts` + max() explodes quadratically inside hot keys).

Tie rules: a right row at EXACTLY the left timestamp matches (<=,
right sorts before left at equal ts); two right rows tied on
(key, ts) resolve to their sort order — callers needing stronger
determinism should dedup right to one row per (key, ts) first.
NULL-valued right payload columns are carried faithfully (the fill
moves one whole right ROW as a struct, so a NULL field never falls
through to an older row).
"""

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F

ASOF_SUFFIX = "_asof"


def asof_join(left: DataFrame, right: DataFrame, by: str,
              left_ts: str, right_ts: str,
              right_cols: Optional[List[str]] = None,
              how: str = "left") -> DataFrame:
    """left.* plus ``<col>_asof`` for every ``right_cols`` entry,
    carrying the latest right value with right_ts <= left_ts per `by`
    group. how="left" keeps unmatched left rows (NULL payload);
    how="inner" drops them.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (by, right_ts)]
    if how not in ("left", "inner"):
        raise ValueError(f"unsupported how: {how!r}")

    payload = [f"{c}{ASOF_SUFFIX}" for c in right_cols]
    # matched-marker: the right timestamp itself, always carried
    marker = f"{right_ts}{ASOF_SUFFIX}__m"
    r_types = dict(zip(right.columns, [f.dataType for f in right.schema]))

    left_cols = list(left.columns)
    # a right row with a NULL timestamp can match nothing ("ts <= left
    # ts" is never satisfied) — but it would sort NULLS FIRST into the
    # fill window and pollute every left row after it, so drop it here.
    # Likewise a NULL join KEY never matches under equality semantics
    # (ASOF JOIN ON l.k = r.k: NULL = NULL is not a match — the q43
    # DuckDB oracle agrees), but partitionBy groups NULLs together and
    # would fill across them; drop NULL-key right rows so NULL-key
    # left rows come back unmatched instead of spuriously joined
    r = right.where(F.col(right_ts).isNotNull()
                    & F.col(by).isNotNull()).select(
        F.col(by),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(marker),
        *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c != by],
    )
    l = left.select(
        F.col(by),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_types[right_ts]).alias(marker),
        *[F.lit(None).cast(r_types[c]).alias(p)
          for c, p in zip(right_cols, payload)],
        *[F.col(c) for c in left_cols if c != by],
    )
    w = (Window.partitionBy(by).orderBy("_ats", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # forward-fill ONE struct per row (not per-column last(): a right
    # payload column that is legitimately NULL must not fall through to
    # an OLDER right row — the struct is non-null for every right row,
    # so the fill always stops at the most recent one)
    pack = F.when(F.col("_side") == 0,
                  F.struct(F.col(marker).alias("_m"),
                           *[F.col(p) for p in payload]))
    filled = (r.unionByName(l)
               .withColumn("_pack", F.last(pack, ignorenulls=True).over(w)))
    out = filled.where(F.col("_side") == 1)
    if how == "inner":
        out = out.where(F.col("_pack").isNotNull())
    return out.select(*left_cols,
                      *[F.col(f"_pack.{p}").alias(p) for p in payload])
