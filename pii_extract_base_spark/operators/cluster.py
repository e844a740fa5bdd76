"""Embedding clustering: distributed Lloyd k-means over an
`array<float>` column — the trainer that produces the centroid lists
`similarity.ivf_topk` probes (IVF coarse quantizer), and a corpus-
curation primitive in its own right (cluster-balanced sampling,
near-dup cluster seeding, topic bucketing).

Spark-first shape (mirrors MLlib's KMeans driver loop, reimplemented
native so the whole assign step stays inside codegen):

 - ASSIGN is one narrow projection — the k×dim centroids are inlined
   as literals (broadcast state), each point computes k unrolled
   squared-L2 distances and takes the (dist, cid) struct minimum.
   No shuffle, no UDF, no vector re-materialization.
 - UPDATE is one map-side-combinable hash aggregation to k×dim
   averages; only k rows ever reach the driver (the standard iterative
   -ML contract: collected state is O(k·dim), never O(rows)).
 - Determinism: init = the k smallest-id vectors (total order, no
   rand()), updated centroid components rounded to ``round_dp``
   decimals — so a re-run, a resumed job, and an external SQL engine
   (the driver's DuckDB oracle replays both Lloyd rounds as CTEs)
   produce IDENTICAL assignments. Distances are left-fold sums of
   doubles, identical evaluation order on both engines.

At 1e12-doc scale: each iteration reads the embedding table once,
shuffles only the k×dim partial sums, and the iteration count is a
fixed small constant — the cost profile is iters × (scan + tiny agg).
"""

from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F


def _sq_dist(vec_col, centroid: List[float]):
    """Unrolled left-to-right squared-L2 sum: (v[0]-c0)² + … — the
    explicit fold order is what makes the oracle replay bit-exact."""
    d = None
    for i, ci in enumerate(centroid):
        t = (vec_col[i] - F.lit(float(ci)))
        t = t * t
        d = t if d is None else d + t
    return F.round(d, 9)


def kmeans_assign(emb: DataFrame, centroids: List[Tuple[int, List[float]]],
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  out_col: str = "cluster") -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2; ties
    break to the smallest cid via struct-lexicographic minimum)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = F.array_min(F.array(*[
        F.struct(_sq_dist(v, c).alias("dist"),
                 F.lit(int(cid)).alias("cid"))
        for cid, c in centroids]))
    return emb.select(F.col(id_col), best["cid"].alias(out_col))


def kmeans(emb: DataFrame, k: int = 4, iters: int = 2,
           id_col: str = "vec_id", vec_col: str = "embedding",
           dim: int = None, round_dp: int = 4):
    """Lloyd k-means: returns (assignments DataFrame(id, cluster),
    final centroids [(cid, [floats])]). ``dim`` is required — the
    centroids are inlined as plan literals, and inferring the width
    would need a mid-plan driver scan (same contract as the LSH ops).

    Init: the ``k`` vectors with the smallest ids (deterministic,
    replayable; production would k-means|| a sample — the loop below
    is init-agnostic). Empty clusters simply drop out of the centroid
    list, matching the SQL replay's GROUP BY semantics.
    """
    if dim is None:
        raise ValueError("dim is required: centroids are plan literals")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), v.alias("v"))

    # init: k smallest ids — a k-row collect of aggregated state,
    # NOT a corpus collect (the iterative-ML driver-loop contract)
    init_rows = (base.orderBy(id_col).limit(k).collect())
    centroids = [(i, list(r["v"])) for i, r in enumerate(init_rows)]

    assigned = None
    for _ in range(iters):
        assigned = kmeans_assign(base.select(id_col, F.col("v")
                                             .alias(vec_col)),
                                 centroids, id_col, vec_col)
        upd = (assigned.join(base, id_col)
                       .groupBy("cluster")
                       .agg(*[F.round(F.avg(F.col("v")[i]), round_dp)
                              .alias(f"c{i}") for i in range(dim)])
                       .collect())
        centroids = [(int(r["cluster"]),
                      [float(r[f"c{i}"]) for i in range(dim)])
                     for r in sorted(upd, key=lambda r: r["cluster"])]
    # final hardening pass so the returned labels reflect the
    # returned centroids
    assigned = kmeans_assign(base.select(id_col,
                                         F.col("v").alias(vec_col)),
                             centroids, id_col, vec_col)
    return assigned, centroids


def kmeans_grouped(df: DataFrame, groups: List[int], k: int = 4,
                   iters: int = 2, group_col: str = "sub",
                   id_col: str = "vec_id", vec_col: str = "v",
                   dim: int = None, round_dp: int = 4):
    """Lloyd k-means fitted PER GROUP in ONE shared driver loop — the
    trainer shape product quantization needs: M subquantizers are M
    independent k-means problems over the M subvector slices, and
    running M separate `kmeans` loops costs M·iters driver round-trips
    (at M=16 production subquantizers that is ~50 Spark jobs).  Here
    every round is ONE job: a single per-group CASE assignment
    projection (all groups' centroids inlined as literals) and a
    single groupBy(group, cluster) aggregate collecting k·|groups|
    rows.  Driver state stays O(|groups|·k·dim).

    Arithmetic is IDENTICAL per group to `kmeans` (same smallest-id
    init, same left-fold rounded distances, same struct-min tie-break,
    same round_dp centroid rounding), so a per-group replay — e.g. the
    q73/q74 DuckDB oracles' per-subspace Lloyd chains — reproduces the
    same codes.  Returns (assignments DF(group, id, cluster),
    {group: [(cid, centroid)]})."""
    if dim is None:
        raise ValueError("dim is required: centroids are plan literals")
    from pyspark.sql import Window

    base = df.select(F.col(group_col).alias("g"), F.col(id_col),
                     F.col(vec_col).alias("v"))

    w = Window.partitionBy("g").orderBy(id_col)
    init_rows = (base.withColumn("_rn", F.row_number().over(w))
                     .where(F.col("_rn") <= k).collect())
    cents = {g: [] for g in groups}
    for r in sorted(init_rows, key=lambda r: (r["g"], r[id_col])):
        cents[r["g"]].append((len(cents[r["g"]]), list(r["v"])))

    def assign_col():
        expr = None
        for g in groups:
            best = F.array_min(F.array(*[
                F.struct(_sq_dist(F.col("v"), c).alias("dist"),
                         F.lit(int(cid)).alias("cid"))
                for cid, c in cents[g]]))
            cond = F.col("g") == g
            expr = (F.when(cond, best) if expr is None
                    else expr.when(cond, best))
        return expr

    for _ in range(iters):
        assigned = base.withColumn("_b", assign_col()) \
                       .withColumn("cluster", F.col("_b")["cid"])
        upd = (assigned.groupBy("g", "cluster")
                       .agg(*[F.round(F.avg(F.col("v")[i]), round_dp)
                              .alias(f"c{i}") for i in range(dim)])
                       .collect())
        cents = {g: [] for g in groups}
        for r in sorted(upd, key=lambda r: (r["g"], r["cluster"])):
            cents[r["g"]].append(
                (int(r["cluster"]),
                 [float(r[f"c{i}"]) for i in range(dim)]))
    assigned = (base.withColumn("_b", assign_col())
                    .select(F.col("g").alias(group_col), F.col(id_col),
                            F.col("_b")["cid"].alias("cluster")))
    return assigned, cents
