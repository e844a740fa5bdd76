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
