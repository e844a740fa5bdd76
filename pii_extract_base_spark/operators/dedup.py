"""Deduplication operators for training-data pipelines.

 - exact_duplicates: md5-fingerprint groupBy (one shuffle on a 32-char
   key; at 100 TB this is the cheapest possible dedup pass)
 - minhash_signatures / lsh_candidate_pairs: MinHash + banded LSH.
   Hash family is md5-based (h_i(s) = md5(i || '|' || s), hex compared
   lexicographically) — chosen deliberately over xxhash64 so DuckDB can
   replay the EXACT signature for the driver's correctness oracle.
 - simhash_fingerprint: 64-bit SimHash over word unigrams (xxhash64 bit
   votes), native SQL end-to-end.
 - ngram_jaccard_pairs: exact Jaccard over shingle sets for candidate
   pairs (verification step after LSH).

Scale notes (100 TB): signatures are tiny (num_perm × 32 B) so the LSH
band explode+groupBy shuffles signature rows, never documents; the
final verify join pulls shingle sets only for candidate pairs (a ~1e-5
fraction). Skewed buckets (boilerplate pages) are broken by AQE.
"""

from typing import List

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import fingerprint, shingles


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: fingerprint, group size,
    representative (min id) — `n_dups > 1` rows are the duplicates."""
    return (df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
              .groupBy("fp")
              .agg(F.count("*").alias("n_dups"),
                   F.min(id_col).alias("representative")))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 5,
                       num_perm: int = 8,
                       family: str = "md5slice") -> DataFrame:
    """MinHash signatures via explode → hash-once-per-shingle →
    map-side-combined groupBy(min) — each shingle is hashed exactly once
    (a naive per-permutation `array_min(transform(...))` re-evaluates
    the whole shingle expression tree num_perm times).

    Hash families:
     - "md5slice": one md5 per shingle; permutation i = hex slice
       [4i, 4i+4) of the digest (independent uniform 16-bit values).
       Cross-engine replayable (DuckDB has the same md5) — this is the
       family the driver's oracle verifies. Coarse minima are fine for
       LSH candidate generation because ngram_jaccard_pairs verifies.
     - "xxhash64": sig[i] = min xxhash64(i, shingle) — full 64-bit
       family for production scale (1e12 docs), Spark-only.

    Docs with no shingles (< k words) are omitted, matching the oracle.
    """
    sh = (df.select(F.col(id_col),
                    F.explode(shingles(text_col, k)).alias("s")))
    if family == "md5slice":
        assert num_perm <= 8, "md5 has 32 hex chars = 8 slices of 4"
        h = F.md5("s")
        aggs = [F.min(F.substring(h, 4 * i + 1, 4)).alias(f"h{i}")
                for i in range(num_perm)]
    elif family == "xxhash64":
        aggs = [F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"h{i}")
                for i in range(num_perm)]
    else:
        raise ValueError(f"unknown minhash family: {family}")
    grouped = sh.groupBy(id_col).agg(*aggs)
    return grouped.select(
        id_col,
        F.array(*[F.col(f"h{i}").cast("string")
                  for i in range(num_perm)]).alias("sig"))


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5,
                        num_perm: int = 8, band_size: int = 2,
                        family: str = "xxhash64") -> DataFrame:
    """Banded LSH: documents sharing any full band of their MinHash
    signature become a candidate pair (a, b) with a < b.

    Only signature rows shuffle (num_perm small values per doc), never
    document text; the band groupBy is the one shuffle that matters at
    corpus scale, on a short composite key.
    """
    sigs = minhash_signatures(df, text_col, id_col, k, num_perm, family)
    n_bands = num_perm // band_size
    bands = sigs.select(
        id_col,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws("#", *[F.col("sig")[b * band_size + j]
                                        for j in range(band_size)])
                     .alias("bkey"))
            for b in range(n_bands)
        ])).alias("bb")
    ).select(id_col, "bb.band", "bb.bkey")

    a = bands.alias("a")
    b = bands.alias("b")
    return (a.join(b, ["band", "bkey"])
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
             .distinct())


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 5) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (LSH verify step)."""
    sh = df.select(F.col(id_col), shingles(text_col, k).alias("sh"))
    out = (pairs
           .join(sh.withColumnRenamed(id_col, "id_a")
                   .withColumnRenamed("sh", "sh_a"), "id_a")
           .join(sh.withColumnRenamed(id_col, "id_b")
                   .withColumnRenamed("sh", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(0.0)
    return out.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.4,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             method: str = "exact",
                             n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine)
    with cosine >= threshold.

    method="exact": self cross-join with native dot products — the
    correctness baseline (O(n^2), only for eval-scale corpora).
    method="lsh": random-hyperplane sign buckets (same family as
    similarity.lsh_bucket_topk) turn the cross-join into an equi-join
    on an n_planes-bit key, then exact cosine verifies inside buckets —
    the 1e9+ vector scale path (recall grows with multi-probe /
    fewer planes; each pair is still exactly verified, so precision
    is 1.0 by construction).
    """
    from .similarity import _dot, _norm, _hyperplanes

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"),
                      _norm(v).alias("nrm"))
    if method == "lsh":
        dim = len(emb.select(vec_col).first()[0])
        planes = _hyperplanes(dim, n_planes)
        bits = [F.when(_dot(F.col("v"), F.array(*[F.lit(x) for x in p]))
                       >= 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i, p in enumerate(planes)]
        bucket = bits[0]
        for b in bits[1:]:
            bucket = bucket + b
        base = base.withColumn("bucket", bucket)
        a, b = base.alias("a"), base.alias("b")
        joined = (a.join(b, "bucket")
                   .where(F.col("a.id") < F.col("b.id")))
    else:
        a, b = base.alias("a"), base.alias("b")
        joined = a.crossJoin(b).where(F.col("a.id") < F.col("b.id"))
    cos = (_dot(F.col("a.v"), F.col("b.v"))
           / (F.col("a.nrm") * F.col("b.nrm")))
    return (joined.select(F.col("a.id").alias("id_a"),
                          F.col("b.id").alias("id_b"),
                          F.round(cos, 6).alias("cosine"))
                  .where(F.col("cosine") >= threshold))


def simhash_col(text_col: str = "text", bits: int = 64) -> F.Column:
    """64-bit SimHash over word unigrams: for each bit, sum votes
    (+1/-1 by the word-hash bit) and set the bit if positive. Native
    SQL via aggregate over the words array."""
    from ..functions.textstats import words_col
    w = words_col(text_col)
    hashes = F.transform(w, lambda x: F.xxhash64(x))
    bit_cols = []
    for b in range(bits):
        mask = F.lit(1 << b).cast("long")
        votes = F.aggregate(
            hashes, F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(
                h.bitwiseAND(mask) != 0,
                F.lit(1)).otherwise(F.lit(-1)))
        bit_cols.append(
            F.when(votes > 0, mask).otherwise(F.lit(0).cast("long")))
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out


def simhash_fingerprints(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         bits: int = 16) -> DataFrame:
    """SimHash fingerprints (default 16 bits keeps the plan small; 64
    for production near-dup hamming search)."""
    return df.select(F.col(id_col),
                     simhash_col(text_col, bits).alias("simhash"))
