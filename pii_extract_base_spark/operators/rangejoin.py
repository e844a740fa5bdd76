"""Range (interval) join — an operator Spark lacks natively at scale.

`point in [lo, hi)` joins written naively (`ON p >= lo AND p < hi`)
have no equi-key, so Spark plans BroadcastNestedLoopJoin — O(points ×
ranges) compares, fine for a broadcast dim but fatal when the ranges
side is large (IP-to-geo tables run millions of CIDR ranges).

The scale path here is the classic domain-chunking rewrite: pick a
chunk width, explode each range onto every chunk it overlaps, map each
point to its single chunk, equi-join on the chunk id, then re-apply the
exact bound predicate. Cost: one shuffle on the chunk key; the fan-out
per range is ceil(span/chunk)+2, so choose `chunk` near the median
range span. Overlapping ranges are fully supported (a point matches
every covering range, same as the naive join).

Chunk ids are computed with floor(x / chunk); the ranges side is padded
by one chunk on each end so floating-point boundary rounding can never
drop a (point, range) pair — the exact predicate then discards the
padding's false candidates. Correctness therefore never depends on fp
behavior of the chunk assignment.

No reference counterpart (pii-extract-base has no relational engine);
this generalizes the bucketed-join strategy of `sources/bucketed.py`
to inequality predicates.
"""

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def range_join(points: DataFrame, ranges: DataFrame, point_col: str,
               lo_col: str, hi_col: str, chunk: float,
               range_cols: Optional[List[str]] = None,
               closed_hi: bool = False) -> DataFrame:
    """Join each point row to every range row with lo <= point < hi
    (or <= hi when `closed_hi`). Equi-join on floor(x/chunk) chunk ids;
    ranges exploded onto [floor(lo/chunk)-1, floor(hi/chunk)+1].

    Returns all `points` columns plus `range_cols` (default: all
    non-bound columns of `ranges`). Inner-join semantics: points in no
    range are dropped.
    """
    if chunk <= 0:
        raise ValueError("chunk must be positive")
    if range_cols is None:
        range_cols = [c for c in ranges.columns if c not in (lo_col, hi_col)]

    cid = lambda c: F.floor(F.col(c) / F.lit(float(chunk)))  # noqa: E731
    r = (ranges
         .withColumn("__chunk",
                     F.explode(F.sequence(cid(lo_col) - 1, cid(hi_col) + 1)))
         .select("__chunk", lo_col, hi_col, *range_cols))
    p = points.withColumn("__chunk", cid(point_col))
    hi_ok = (F.col(point_col) <= F.col(hi_col) if closed_hi
             else F.col(point_col) < F.col(hi_col))
    return (p.join(r, "__chunk")
             .where((F.col(point_col) >= F.col(lo_col)) & hi_ok)
             .select(*points.columns, *range_cols))
