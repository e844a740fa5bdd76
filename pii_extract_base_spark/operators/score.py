"""Fused langid + perplexity Spark stage (north-star N1+N2).

One Arrow pandas UDF wrapping functions/scoring.score_batch — language
ID and perplexity share a single batched n-gram hash pass, one
JVM↔Python crossing, only the `text` column shipped.
"""

SCORE_RESULT_SCHEMA = ("struct<lang_pred:string,lang_conf:double,"
                       "logppl:double>")


def make_score_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.scoring import score_batch

    @pandas_udf(SCORE_RESULT_SCHEMA)
    def score_udf(text: pd.Series) -> pd.DataFrame:
        preds, confs, ppls = score_batch(text.tolist())
        return pd.DataFrame({
            "lang_pred": preds,
            "lang_conf": confs,
            "logppl": ppls,
        })

    return score_udf


def routed_langid(df, text_col: str = "text", id_col: str = "doc_id",
                  margin_threshold: int = 200_000):
    """Cascaded language ID for langid-only stages (routing a crawl by
    language before heavier per-language processing): the declarative
    stopword scorer (functions/langid_sql — broadcast join, zero
    Python) decides every doc whose top1−top2 integer margin clears
    ``margin_threshold``; ONLY the ambiguous remainder crosses into the
    Arrow n-gram kernel.  At web scale the easy fraction dominates, so
    the expensive crossing sees a sliver of the corpus — the classic
    cheap-filter→expensive-model cascade.

    Returns (id, lang_pred, route) with route ∈ {'sql', 'kernel'}.
    Disagreement between the two models on the EASY side is the
    trade-off being bought; `tests/test_operators_extra.py` pins the
    routing contract (easy docs = SQL's answer, ambiguous = kernel's).

    Note this is NOT a replacement for the fused langid+ppl stage
    (pipeline.py): when perplexity is needed anyway, every doc crosses
    regardless and the cascade saves nothing — use it where language
    alone gates the next stage.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.langid_sql import doc_lang_scores

    # the canonical lexicon scoring (same tokenization + weights as
    # stopword_langid — shared first stage, not a re-implementation)
    sc = doc_lang_scores(df, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("score"),
                                           F.asc("lex_lang"))
    ranked = (sc.withColumn("rn", F.row_number().over(w))
                .withColumn("margin",
                            F.col("score")
                            - F.coalesce(F.lead("score").over(w),
                                         F.lit(0))))
    best = (ranked.where(F.col("rn") == 1)
                  .select(id_col, F.col("lex_lang").alias("_sql_pred"),
                          "margin"))
    tagged = (df.select(F.col(id_col), F.col(text_col))
                .join(best, id_col, "left"))
    easy = (tagged.where(F.col("margin") >= margin_threshold)
                  .select(id_col, F.col("_sql_pred").alias("lang_pred"),
                          F.lit("sql").alias("route")))
    hard = tagged.where(F.col("margin").isNull()
                        | (F.col("margin") < margin_threshold))
    kernel = (hard.withColumn("_s", make_score_udf()(F.col(text_col)))
                  .select(id_col,
                          F.col("_s.lang_pred").alias("lang_pred"),
                          F.lit("kernel").alias("route")))
    return easy.unionByName(kernel)
