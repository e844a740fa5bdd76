"""Declarative (pure-SQL) KenLM-style perplexity under a FIXED
language model — the relational twin of the fused Arrow kernel's ppl
half (functions/scoring.py), exactly as langid_sql is the twin of its
langid half.

Same model, same formula, zero Python crossings: the word-unigram and
char-bigram probability tables built deterministically at import by
`scoring._build_models` are joined as ~200-row broadcast relations,
and the Kneser-Ney-lite interpolation

    lp(w) = -7                                  if w contains a digit
    lp(w) = log2(max(0.6·p_uni(w)
                     + 0.4·2^char_lp(w), 1e-12))   otherwise
    char_lp(w) = mean over bigrams of ' w ' of log2(p_bg or 1e-6)
    logppl(doc) = -mean over words of lp(w)     (99.0 if no words)

is evaluated in whole-stage codegen.  Differences vs the kernel path
(documented, deliberate): scores the WHOLE text, not the 1200-char
snippet, and takes the LM language as a parameter instead of the
langid prediction — this is the rendering for "score everything under
lang X" passes (e.g. after routed_langid partitioned the corpus).

Plan shape at 100 TB: per-word cost is paid once per DISTINCT word
(one hash aggregate), not once per occurrence — web corpora repeat
their vocabulary thousands of times, so the bigram explode+join runs
on the vocabulary relation, and occurrences just re-join their word's
finished logprob (same memoization the kernel does with a dict, here
expressed relationally so Catalyst distributes it).

Float caveat: log2/pow differ between engines in the last ulp; per-doc
averages accumulate ~1e-13 of engine-dependent noise, so the driver
query rounds to 5 decimals (boundary-collision odds ~1e-8/doc).
"""

from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from .textstats import words_col

UNK_BIGRAM = 1e-6
BACKOFF_LAMBDA = 0.4
P_FLOOR = 1e-12
LP_NUM = -7.0          # log2(2^-7): digit-bearing tokens bin to <num>
EMPTY_PPL = 99.0


def unigram_rows(lang: str) -> List[Tuple[str, float]]:
    from .scoring import _UNIGRAM
    return sorted(_UNIGRAM[lang].items())


def bigram_rows(lang: str) -> List[Tuple[str, float]]:
    from .scoring import _BIGRAM
    return sorted(_BIGRAM[lang].items())


def _uni_df(spark: SparkSession, lang: str) -> DataFrame:
    return spark.createDataFrame(unigram_rows(lang),
                                 "word string, p_uni double")


def _bg_df(spark: SparkSession, lang: str) -> DataFrame:
    return spark.createDataFrame(bigram_rows(lang),
                                 "bg string, p_bg double")


def ppl_sql(df: DataFrame, lang: str = "en", text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(id, n_words, logppl) under ``lang``'s LM, fully declarative."""
    spark = df.sparkSession
    occ = (df.select(F.col(id_col),
                     F.explode(words_col(text_col)).alias("word"))
             .withColumn("word", F.lower(F.col("word"))))
    vocab = occ.select("word").distinct()

    token = F.concat(F.lit(" "), F.col("word"), F.lit(" "))
    bgs = vocab.select(
        "word",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length(token) - 1),
            lambda i: token.substr(i, F.lit(2))
        )).alias("bg"))
    bg_lp = (bgs.join(F.broadcast(_bg_df(spark, lang)), "bg", "left")
                .groupBy("word")
                .agg((F.sum(F.log2(F.coalesce(F.col("p_bg"),
                                              F.lit(UNK_BIGRAM))))
                      / F.count("*")).alias("char_lp")))
    word_lp = (bg_lp.join(F.broadcast(_uni_df(spark, lang)), "word", "left")
                    .select(
        "word",
        F.when(F.col("word").rlike("[0-9]"), F.lit(LP_NUM))
         .otherwise(F.log2(F.greatest(
             F.lit(1.0 - BACKOFF_LAMBDA)
             * F.coalesce(F.col("p_uni"), F.lit(0.0))
             + F.lit(BACKOFF_LAMBDA) * F.pow(F.lit(2.0), F.col("char_lp")),
             F.lit(P_FLOOR)))).alias("lp")))

    per_doc = (occ.join(word_lp, "word")
                  .groupBy(id_col)
                  .agg(F.count("*").alias("n_words"),
                       (-F.avg("lp")).alias("_ppl")))
    base = df.select(F.col(id_col))
    return (base.join(per_doc, id_col, "left")
                .select(id_col,
                        F.coalesce("n_words", F.lit(0).cast("long"))
                         .alias("n_words"),
                        F.coalesce(F.col("_ppl"), F.lit(EMPTY_PPL))
                         .alias("logppl")))


def lm_values_sql(lang: str) -> Tuple[str, str]:
    """(unigram, bigram) VALUES literals for the DuckDB oracle —
    repr() round-trips doubles exactly, so both engines parse the
    identical probability; single quotes doubled (apostrophe words)."""
    def q(s: str) -> str:
        return s.replace("'", "''")
    uni = ", ".join(f"('{q(w)}', {p!r})" for w, p in unigram_rows(lang))
    bg = ", ".join(f"('{q(b)}', {p!r})" for b, p in bigram_rows(lang))
    return (f"(VALUES {uni}) AS uni(word, p_uni)",
            f"(VALUES {bg}) AS bgt(bg, p_bg)")
