"""Declarative (pure-SQL) language identification by weighted
stopword/seed-word overlap.

This is the fully-relational rendering of language ID: score(lang) =
sum over token occurrences of an integer rank weight from the same
embedded seed vocabulary that trains the fused n-gram model
(functions/langdata.py), predict the argmax.  It trades the n-gram
model's robustness for a plan with NO Python crossing at all — one
explode, one broadcast join against a ~240-row lexicon, one hash
aggregate, one per-doc argmax window — and for exact cross-engine
replayability (integer weights ⇒ order-independent sums ⇒ the DuckDB
oracle hash-matches bit-for-bit, which the hashed-ngram kernel cannot,
its uint64-wraparound hashing having no portable SQL rendering).

The two renderings are complementary, not redundant: the Arrow-kernel
scorer (operators/score.py) is the production path (handles OOV text
via char n-grams); this one is the driver-verifiable twin and the
cheap first-pass filter — at 100 TB a broadcast-join prefilter that
routes only low-margin docs to the Python kernel cuts the Arrow
crossing volume by whatever fraction of the corpus is easy.

Weight scheme: weight(word at rank r) = round(1e6 / (r + 10)) — the
same Zipf-ish 1/(rank+10) shape `scoring._build_models` uses, scaled
to an integer so distributed summation order cannot perturb the score.
Docs with zero lexicon hits predict 'und' with score 0.
"""

from typing import List, Tuple

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .langdata import SEED_WORDS
from .textstats import words_col

UND = "und"


def lexicon_rows() -> List[Tuple[str, str, int]]:
    """(lang, word, int_weight) rows — identical data to the SQL
    literal `lexicon_values_sql` emits, single source of truth."""
    rows = []
    for lang, words in SEED_WORDS.items():
        for rank, w in enumerate(words):
            rows.append((lang, w, round(1e6 / (rank + 10.0))))
    return rows


def lexicon_values_sql() -> str:
    """The lexicon as a SQL VALUES literal for the DuckDB oracle
    (single quotes doubled — fr/es stopword lists commonly carry
    apostrophes like d'un)."""
    def q(s: str) -> str:
        return s.replace("'", "''")
    vals = ", ".join(f"('{q(lang)}', '{q(word)}', {wt})"
                     for lang, word, wt in lexicon_rows())
    return f"(VALUES {vals}) AS lex(lex_lang, word, wt)"


def lexicon_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        lexicon_rows(), "lex_lang string, word string, wt long")


def doc_lang_scores(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, candidate-lang) integer scores — the shared first
    stage of `stopword_langid` and `operators.score.routed_langid`
    (ONE canonical tokenization + weight scheme; don't re-inline it).
    Plan: explode tokens -> broadcast hash join on the lexicon ->
    (id, lang) hash agg with map-side-combinable integer sums."""
    spark = df.sparkSession
    toks = (df.select(F.col(id_col),
                      F.explode(words_col(text_col)).alias("word"))
              .withColumn("word", F.lower(F.col("word"))))
    return (toks.join(F.broadcast(lexicon_df(spark)), "word")
                .groupBy(id_col, "lex_lang")
                .agg(F.sum("wt").alias("score"),
                     F.count("*").alias("n_hits")))


def stopword_langid(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document prediction: (id, lang_pred, score, n_hits,
    n_tokens).  doc_lang_scores -> row_number argmax window
    partitioned by id -> left join back so zero-hit docs survive as
    'und'.  The only shuffles are the (id, lang) aggregate and the
    per-id window — both on the id key."""
    scores = doc_lang_scores(df, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("score"),
                                           F.asc("lex_lang"))
    best = (scores.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") == 1)
                  .select(id_col, F.col("lex_lang").alias("lang_pred"),
                          "score", "n_hits"))
    base = df.select(F.col(id_col),
                     F.size(words_col(text_col)).alias("n_tokens"))
    return (base.join(best, id_col, "left")
                .select(id_col,
                        F.coalesce("lang_pred", F.lit(UND))
                         .alias("lang_pred"),
                        F.coalesce("score", F.lit(0).cast("long"))
                         .alias("score"),
                        F.coalesce("n_hits", F.lit(0).cast("long"))
                         .alias("n_hits"),
                        "n_tokens"))


def langid_sql_margin(scores: DataFrame, id_col: str = "doc_id") -> Column:
    """Top1−top2 integer score margin per doc (routing signal: docs
    below a margin threshold go to the full n-gram kernel)."""
    w = Window.partitionBy(id_col).orderBy(F.desc("score"))
    return (F.col("score")
            - F.coalesce(F.lead("score").over(w), F.lit(0))).alias("margin")
