"""Similarity search over embedding columns (array<float>).

 - brute-force cosine top-k: the exactness baseline. Queries are
   broadcast (small side), corpus streams — no shuffle of the corpus,
   one window per query for ranking.
 - LSH-bucketed variant (random-hyperplane signs): the scale path —
   at 10^9+ vectors the crossJoin is replaced by a bucket equi-join;
   recall is tunable via n_planes/n_tables.

Dot products run as native `aggregate`/`zip_with` expressions —
JVM-side, no Python crossing.
"""

import math
from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                include_self: bool = False) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Plan: broadcast(queries) × corpus → native dot/norm → per-query
    row_number window. Output: (q_id, neighbor_id, rank) — integer
    columns only, so results are engine-portable for the oracle.
    """
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.where(F.col("neighbor_id") != F.col("q_id"))
    qv = F.transform(F.col("q_vec"), lambda x: x.cast("double"))
    cv = F.transform(F.col("c_vec"), lambda x: x.cast("double"))
    sim = _dot(qv, cv) / (_norm(qv) * _norm(cv))
    scored = joined.select("q_id", "neighbor_id",
                           F.round(sim, 6).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"),
                                           F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("q_id", "neighbor_id", "rank"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    """Deterministic pseudo-random hyperplanes (LCG; no numpy RNG state)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 8, dim: Optional[int] = None) -> DataFrame:
    """Approximate top-k: random-hyperplane sign buckets → equi-join on
    bucket → exact cosine rerank within bucket. At corpus scale this
    replaces the crossJoin with a shuffle on a 1-byte-per-plane key."""
    if dim is None:
        raise ValueError(
            "dim is required: the hyperplanes are inlined into the plan "
            "as literals, and inferring the dimension would need a "
            "driver-side head() action (a scan barrier mid-plan at "
            "corpus scale)")
    planes = _hyperplanes(dim, n_planes)

    def bucket(vec):
        v = F.transform(vec, lambda x: x.cast("double"))
        bits = []
        for p_i, plane in enumerate(planes):
            arr = F.array(*[F.lit(x) for x in plane])
            d = _dot(v, arr)
            bits.append(F.when(d >= 0, F.lit(1 << p_i)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"),
                      bucket(F.col(vec_col)).alias("bucket"))
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).alias("q_vec"),
                       bucket(F.col(vec_col)).alias("bucket"))
    joined = (c.join(F.broadcast(q), "bucket")
               .where(F.col("neighbor_id") != F.col("q_id")))
    qv = F.transform(F.col("q_vec"), lambda x: x.cast("double"))
    cv = F.transform(F.col("c_vec"), lambda x: x.cast("double"))
    sim = _dot(qv, cv) / (_norm(qv) * _norm(cv))
    scored = joined.select("q_id", "neighbor_id",
                           F.round(sim, 6).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"),
                                           F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("q_id", "neighbor_id", "rank"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroid_stride: int = 25, nprobe: int = 3) -> DataFrame:
    """IVF-style ANN: a deterministic coarse quantizer (every
    `centroid_stride`-th corpus vector is a centroid — stands in for an
    offline k-means; same plan shape) partitions the corpus into
    inverted lists; each query probes its `nprobe` nearest centroids
    and exact-reranks only those lists.

    Plan: centroids are broadcast twice (assignment of corpus rows,
    probe selection for queries); the list search is an equi-join on
    `centroid_id` — the cross-join disappears, and at 1e9+ vectors the
    corpus-side assignment is a map-only pass over the scan. Output
    (q_id, neighbor_id, rank) is integer-only for the oracle.
    """
    cents = corpus.where(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))

    def cosine(a, b):
        av = F.transform(a, lambda x: x.cast("double"))
        bv = F.transform(b, lambda x: x.cast("double"))
        return _dot(av, bv) / (_norm(av) * _norm(bv))

    # inverted lists: every corpus vector -> nearest centroid
    w_assign = Window.partitionBy("cid").orderBy(
        F.desc("cent_cos"), F.asc("cent_id"))
    assigned = (corpus.select(F.col(id_col).alias("cid"),
                              F.col(vec_col).alias("c_vec"))
                .join(F.broadcast(cents))
                .select("cid", "c_vec", "cent_id",
                        cosine(F.col("c_vec"),
                               F.col("cent_vec")).alias("cent_cos"))
                .withColumn("rn", F.row_number().over(w_assign))
                .where(F.col("rn") == 1)
                .select("cid", "c_vec", "cent_id"))

    # probe lists: each query -> its nprobe nearest centroids
    w_probe = Window.partitionBy("q_id").orderBy(
        F.desc("probe_cos"), F.asc("cent_id"))
    probes = (queries.select(F.col(id_col).alias("q_id"),
                             F.col(vec_col).alias("q_vec"))
              .join(F.broadcast(cents))
              .select("q_id", "q_vec", "cent_id",
                      cosine(F.col("q_vec"),
                             F.col("cent_vec")).alias("probe_cos"))
              .withColumn("rn", F.row_number().over(w_probe))
              .where(F.col("rn") <= nprobe)
              .select("q_id", "q_vec", "cent_id"))

    # search only the probed inverted lists
    cand = (assigned.join(F.broadcast(probes), "cent_id")
            .where(F.col("cid") != F.col("q_id")))
    scored = cand.select(
        "q_id", F.col("cid").alias("neighbor_id"),
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"))
    # a vector can appear via several probed centroids only if lists
    # overlapped — they don't (rn==1 assignment), so no distinct needed
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"),
                                           F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("q_id", "neighbor_id", "rank"))
