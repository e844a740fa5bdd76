"""DSIR-style data-selection importance weights (Xie et al. 2023,
arXiv:2302.03169, "Data Selection for Language Models via Importance
Resampling") — the standard pretraining-curation stage that up-weights
raw-corpus documents that LOOK LIKE a small trusted target corpus
(Wikipedia/books), computed as a per-document log-likelihood ratio
between two bag-of-words language models:

    w(doc) = (1/n) * sum over tokens  log2 p_target(tok) / p_raw(tok)

with add-one smoothing over the SHARED vocabulary (the paper uses
hashed n-grams; word unigrams are the same estimator on a vocabulary
this size and keep the query exactly SQL-replayable).  Positive means
"more target-like than the raw corpus"; the sampler then keeps the
top mass (quantile_cut / weighted_sample consume the weight column).

Plan shape at 100 TB (mirrors ppl_sql's distinct-vocabulary
memoization):
  * both LMs are ONE hash aggregate each over the exploded token
    relation — counts, not text, shuffle;
  * the per-word log-ratio is computed once per DISTINCT word (web
    corpora repeat vocabulary millions of times) on the joined count
    relations, then occurrences re-join their word's finished ratio —
    a broadcast when the vocabulary fits (it does: even 10^12 docs of
    web text hold ~10^8 distinct lowercased words), a shuffle join
    otherwise;
  * scalar normalizers (token totals, vocab size) enter the plan via
    a 1-row cross join, never a driver round-trip.

Float contract (the q63 precedent): counts are exact integers on both
engines; each per-word log-ratio rounds to 9 dp before the per-doc
average, and the average rounds to 5 dp — summation-order noise is
~1e-13, so boundary-collision odds are negligible.
"""

from pyspark.sql import DataFrame, functions as F

from .textstats import words_col


def dsir_weights(df: DataFrame, is_target,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document DSIR importance weight of every doc in ``df``
    against the target subset selected by the ``is_target`` boolean
    Column (evaluated over ``df`` itself — the usual setup where the
    trusted corpus ships inside the lake as a source/label).

    Returns (id_col, n_words, dsir_logratio) with one row per input
    document; docs with no words get weight 0.0 (no evidence either
    way).  ``dsir_logratio`` is the mean per-token log2 ratio,
    rounded to 5 dp.
    """
    occ = (df.select(F.col(id_col), is_target.alias("_tgt"),
                     F.explode(words_col(text_col)).alias("word"))
             .withColumn("word", F.lower(F.col("word"))))

    # one hash aggregate builds BOTH LMs: per-word raw count and
    # target count (conditional sum) in the same pass
    counts = (occ.groupBy("word")
                 .agg(F.count("*").alias("c_raw"),
                      F.sum(F.when(F.col("_tgt"), 1).otherwise(0))
                       .alias("c_tgt")))

    # scalar normalizers as a 1-row relation (no driver round-trip):
    # total raw tokens, total target tokens, shared vocabulary size
    totals = counts.agg(F.sum("c_raw").alias("n_raw"),
                        F.sum("c_tgt").alias("n_tgt"),
                        F.count("*").alias("v"))

    lr = (counts.crossJoin(F.broadcast(totals))
                .select(
        "word",
        F.round(
            F.log2((F.col("c_tgt") + F.lit(1.0))
                   / (F.col("n_tgt") + F.col("v")))
            - F.log2((F.col("c_raw") + F.lit(1.0))
                     / (F.col("n_raw") + F.col("v"))), 9).alias("lr")))

    per_doc = (occ.join(lr, "word")
                  .groupBy(id_col)
                  .agg(F.count("*").alias("n_words"),
                       F.round(F.avg("lr"), 5).alias("_w")))
    base = df.select(F.col(id_col))
    return (base.join(per_doc, id_col, "left")
                .select(id_col,
                        F.coalesce("n_words", F.lit(0).cast("long"))
                         .alias("n_words"),
                        F.coalesce(F.col("_w"), F.lit(0.0))
                         .alias("dsir_logratio")))


def dsir_select_topk(df: DataFrame, is_target, k: int,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """The RESAMPLING half of DSIR (Xie et al. 2023 §2: importance
    resampling without replacement) that ``dsir_weights``' docstring
    promises: sample ``k`` documents with probability proportional to
    exp(dsir_logratio) via the Gumbel-top-k identity (Vieira 2014;
    Kool et al. 2019, arXiv:1903.06059) — ``argtop_k(w_i + G_i)`` with
    i.i.d. Gumbel noise G is an exact sample-without-replacement from
    softmax(w).

    The Gumbel draw must be deterministic and engine-replayable, so
    the uniform comes from the shared md5 kernel rather than rand():
    ``u = (md5_mod(id, 10^8) + 0.5) / 10^8`` ∈ (0,1) exactly on both
    engines (integer + exact dyadic arithmetic), and
    ``G = −ln(−ln u)``. The selection key rounds to 6 dp (the repo
    float contract: libm ln may differ in the last bit cross-engine;
    6-dp rounding with the id tiebreak absorbs it) and the top-k is
    a total order (key desc, id asc).

    Plan shape: dsir_weights' two hash aggregates + the vocabulary
    re-join, then ONE TakeOrderedAndProject — per-partition top-k
    heaps merged on the driver, never a global sort. k rows of driver
    state; corpus order/partitioning irrelevant.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    from .hashing import md5_mod
    U = 100_000_000
    w = dsir_weights(df, is_target, text_col=text_col, id_col=id_col)
    u = ((md5_mod(F.col(id_col).cast("string"), U) + F.lit(0.5))
         / F.lit(float(U)))
    key = F.round(F.col("dsir_logratio") - F.log(-F.log(u)), 6)
    return (w.withColumn("gumbel_key", key)
             .orderBy(F.desc("gumbel_key"), F.asc(id_col))
             .limit(int(k)))


def dsir_oracle_sql(target_pred_sql: str,
                    table: str = "documents",
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    final_select: str = None) -> str:
    """DuckDB replay of dsir_weights: same add-one estimator, same
    9-dp per-word / 5-dp per-doc rounding.  ``target_pred_sql`` is a
    boolean SQL expression over the table's columns.
    ``final_select`` overrides the trailing SELECT; it may reference
    the ``dsir`` CTE (the default output relation) — used by the
    resampling replay (q98)."""
    words = (f"list_filter(string_split_regex(coalesce({text_col},''), "
             f"'\\s+'), w -> w <> '')")
    return f"""
WITH occ AS (
    SELECT {id_col}, ({target_pred_sql}) AS tgt, lower(u.word) AS word
    FROM {table}, unnest({words}) AS u(word)
),
counts AS (
    SELECT word, count(*) AS c_raw,
           sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_tgt
    FROM occ GROUP BY word
),
totals AS (
    SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt, count(*) AS v
    FROM counts
),
lr AS (
    SELECT word,
           round(log2((c_tgt + 1.0) / (n_tgt + v))
                 - log2((c_raw + 1.0) / (n_raw + v)), 9) AS lr
    FROM counts CROSS JOIN totals
),
per_doc AS (
    SELECT occ.{id_col}, count(*) AS n_words, round(avg(lr.lr), 5) AS w
    FROM occ JOIN lr USING (word)
    GROUP BY occ.{id_col}
),
dsir AS (
    SELECT d.{id_col},
           coalesce(p.n_words, 0) AS n_words,
           coalesce(p.w, 0.0) AS dsir_logratio
    FROM {table} d LEFT JOIN per_doc p USING ({id_col})
)
{final_select or f"SELECT * FROM dsir"}
"""


def dsir_select_topk_oracle_sql(target_pred_sql: str, k: int,
                                table: str = "documents",
                                text_col: str = "text",
                                id_col: str = "doc_id") -> str:
    """DuckDB replay of dsir_select_topk: the dsir CTEs plus the same
    md5-uniform Gumbel key (6-dp rounded) and total-order LIMIT k."""
    from .hashing import md5_mod_sql
    b = md5_mod_sql(f"{id_col}::VARCHAR", 100_000_000)
    key = (f"round(dsir_logratio - ln(-ln(({b} + 0.5) / 100000000.0)),"
           f" 6)")
    final = f"""SELECT {id_col}, n_words, dsir_logratio,
       {key} AS gumbel_key
FROM dsir
ORDER BY gumbel_key DESC, {id_col} ASC
LIMIT {int(k)}"""
    return dsir_oracle_sql(target_pred_sql, table=table,
                           text_col=text_col, id_col=id_col,
                           final_select=final)
